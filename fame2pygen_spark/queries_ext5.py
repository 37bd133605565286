"""Round-4 extension queries, second batch (x158+): readability
screens, rank-based inference, link prediction, distributional
privacy, and symbolic time-series indexing — the remaining
curation/audit surface a 100 TB training-data pipeline leans on.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_ext import _read_events

EXT5_QUERIES: dict = {}
EXT5_ORACLES: dict = {}


# ------------------------------- x158: readability quality screen


def q_x158_readability(spark, sf_dir):
    """Per-source readability profile (operators/text.py:
    readability_profile): Flesch-Kincaid grade + ARI from integer
    word/sentence/syllable counts, aggregated per source with
    decimal-cast sums plus the share of grade>12 documents — the
    cheap pre-LM quality screen."""
    from .operators.text import readability_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = readability_profile(docs, "text")
    n = F.count(F.lit(1))
    return (
        d.groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("fk_grade").cast("decimal(38,6)")).cast(
                    "double"
                )
                / n,
                6,
            ).alias("avg_fk"),
            F.round(
                F.sum(F.col("ari").cast("decimal(38,6)")).cast("double")
                / n,
                6,
            ).alias("avg_ari"),
            F.round(
                F.sum(
                    F.when(F.col("fk_grade") > 12.0, 1).otherwise(0)
                ).cast("double")
                / n,
                6,
            ).alias("hard_share"),
        )
        .orderBy("source")
    )


SQL_X158 = """
WITH w AS (
  SELECT source,
         regexp_extract_all(text, '[A-Za-z]+') AS ws,
         greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
           AS n_sents
  FROM documents
),
m AS (
  SELECT source, n_sents,
         len(ws)::BIGINT AS n_words,
         list_reduce(
           list_transform(ws, x -> greatest(1,
             len(regexp_extract_all(x, '[aeiouyAEIOUY]+')))::BIGINT),
           (a, b) -> a + b) AS n_syll,
         list_reduce(list_transform(ws, x -> length(x)::BIGINT),
                     (a, b) -> a + b) AS n_let
  FROM w WHERE len(ws) > 0
),
d AS (
  SELECT source,
    ROUND(0.39 * (n_words::DOUBLE / n_sents::DOUBLE)
          + 11.8 * (n_syll::DOUBLE / n_words::DOUBLE) - 15.59, 6) AS fk,
    ROUND(4.71 * (n_let::DOUBLE / n_words::DOUBLE)
          + 0.58 * (n_words::DOUBLE / n_sents::DOUBLE) - 21.43, 6) AS ari
  FROM m
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       ROUND(SUM(fk::DECIMAL(38,6))::DOUBLE / count(*), 6) AS avg_fk,
       ROUND(SUM(ari::DECIMAL(38,6))::DOUBLE / count(*), 6) AS avg_ari,
       ROUND(SUM(CASE WHEN fk > 12.0 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS hard_share
FROM d GROUP BY source ORDER BY source
"""


EXT5_QUERIES.update({"x158_readability": q_x158_readability})
EXT5_ORACLES.update({"x158_readability": SQL_X158})


# ------------------------- x159: Mann-Whitney U rank-sum A/B test


def q_x159_mann_whitney(spark, sf_dir):
    """Mann-Whitney U (operators/sketch.py:mann_whitney_u):
    purchase-vs-click value distributions per hour-of-day stratum —
    the non-parametric twin of x66's t-test, exact integer midranks
    over the collapsed distinct-value support."""
    from .operators.sketch import mann_whitney_u

    ev = _read_events(spark, sf_dir)
    ev = ev.withColumn(
        "hr",
        (
            (F.col("ts_us") - (F.col("ts_us") % F.lit(3_600_000_000)))
            / F.lit(3_600_000_000)
        ).cast("long")
        % 24,
    )
    out = mann_whitney_u(
        ev, "value", "event_type", "purchase", "click",
        partition_cols=("hr",),
    )
    return out.orderBy("hr")


SQL_X159 = """
WITH b AS (
  SELECT ((epoch_us(ts) - (epoch_us(ts) % 3600000000))
          / 3600000000)::BIGINT % 24 AS hr,
         value AS v, event_type AS g
  FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
),
pv AS (
  SELECT hr, v,
         SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS ca,
         SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM b GROUP BY hr, v
),
r AS (
  SELECT hr, ca, cb,
         2 * COALESCE(SUM(ca + cb) OVER (
               PARTITION BY hr ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (ca + cb) + 1 AS r2
  FROM pv
),
a AS (
  SELECT hr, SUM(ca)::BIGINT AS n_a, SUM(cb)::BIGINT AS n_b,
         SUM(ca * r2)::BIGINT AS r2a
  FROM r GROUP BY hr
)
SELECT hr, n_a, n_b,
  ROUND(r2a::DOUBLE / 2.0 - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0, 1)
    AS u_a,
  ROUND((r2a::DOUBLE / 2.0 - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0
         - n_a::DOUBLE * n_b::DOUBLE / 2.0)
        / sqrt(n_a::DOUBLE * n_b::DOUBLE
               * (n_a::DOUBLE + n_b::DOUBLE + 1.0) / 12.0), 6) AS z,
  ROUND((r2a::DOUBLE / 2.0 - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0)
        / (n_a::DOUBLE * n_b::DOUBLE), 6) AS effect
FROM a ORDER BY hr
"""


EXT5_QUERIES.update({"x159_mann_whitney": q_x159_mann_whitney})
EXT5_ORACLES.update({"x159_mann_whitney": SQL_X159})


# --------------------------- x160: Adamic-Adar link prediction


def q_x160_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction (operators/graph.py:adamic_adar)
    on the part co-purchase graph (same x156 edge rule: parts sharing
    >= 2 orders): top 100 non-adjacent pairs by hub-discounted
    common-neighbor score."""
    from .operators.graph import adamic_adar

    ls = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = ls.alias("a"), ls.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
        .select("src", "dst")
    )
    out = adamic_adar(pairs, max_degree=1000, top_n=100)
    return out.select(
        F.col("u").cast("long").alias("u"),
        F.col("w").cast("long").alias("w"),
        "n_common",
        "aa_score",
    )


SQL_X160 = """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem
),
canon AS (
  SELECT u, v FROM (
    SELECT a.s AS u, b.s AS v, count(*) AS w
    FROM ls a JOIN ls b ON a.o = b.o AND a.s < b.s
    GROUP BY a.s, b.s
  ) WHERE w >= 2
),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT u AS node FROM canon UNION ALL SELECT v AS node FROM canon
  ) GROUP BY node
),
sym AS (SELECT u, v FROM canon UNION ALL SELECT v AS u, u AS v FROM canon),
inc AS (
  SELECT e.v AS mid, e.u AS leaf, d.deg
  FROM sym e JOIN deg d ON d.node = e.v
  WHERE d.deg <= 1000
),
pairs AS (
  SELECT a.leaf AS u, b.leaf AS w,
         (1.0 / ln(a.deg::DOUBLE))::DECIMAL(38,18) AS term
  FROM inc a JOIN inc b ON a.mid = b.mid AND a.leaf < b.leaf
),
scored AS (
  SELECT u, w, count(*)::BIGINT AS n_common, SUM(term) AS s
  FROM pairs GROUP BY u, w
)
SELECT CAST(sc.u AS BIGINT) AS u, CAST(sc.w AS BIGINT) AS w,
       sc.n_common, ROUND(sc.s::DOUBLE, 6) AS aa_score
FROM scored sc
LEFT JOIN canon c ON c.u = sc.u AND c.v = sc.w
WHERE c.u IS NULL
ORDER BY aa_score DESC, u ASC, w ASC
LIMIT 100
"""


EXT5_QUERIES.update({"x160_adamic_adar": q_x160_adamic_adar})
EXT5_ORACLES.update({"x160_adamic_adar": SQL_X160})


# ------------------------------- x161: t-closeness privacy audit


def q_x161_t_closeness(spark, sf_dir):
    """t-closeness (operators/quality.py:t_closeness), completing the
    k-anonymity (x103) / l-diversity (x144) release-gate trio:
    account-balance distribution skew per (market segment, nation)
    class vs the global decile distribution, ordinal EMD."""
    from .operators.quality import t_closeness

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = t_closeness(
        cust,
        ["c_mktsegment", "c_nationkey"],
        "c_acctbal",
        n_bins=10,
        threshold=0.2,
    )
    return out.select(
        "c_mktsegment",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "group_size",
        "t",
        F.col("breach").cast("int").cast("long").alias("breach"),
    ).orderBy("c_mktsegment", "c_nationkey")


SQL_X161 = """
WITH base AS (
  SELECT c_mktsegment, c_nationkey, c_acctbal::DOUBLE AS s
  FROM customer WHERE c_acctbal IS NOT NULL
),
mm AS (
  SELECT min(s) AS lo, max(s) AS hi, count(*)::BIGINT AS n FROM base
),
binned AS (
  SELECT c_mktsegment, c_nationkey,
         least(9, floor((s - mm.lo) / ((mm.hi - mm.lo) / 10.0))::BIGINT)
           AS bin,
         mm.n AS n
  FROM base, mm
),
per AS (
  SELECT c_mktsegment, c_nationkey, bin, count(*)::BIGINT AS c,
         max(n) AS n
  FROM binned GROUP BY c_mktsegment, c_nationkey, bin
),
gbin AS (
  SELECT r.bin, COALESCE(g.g, 0)::BIGINT AS g
  FROM (SELECT range AS bin FROM range(10)) r
  LEFT JOIN (SELECT bin, count(*)::BIGINT AS g FROM binned GROUP BY bin) g
  ON g.bin = r.bin
),
classes AS (
  SELECT c_mktsegment, c_nationkey, SUM(c)::BIGINT AS group_size,
         max(n) AS n
  FROM per GROUP BY c_mktsegment, c_nationkey
),
spine AS (
  SELECT cl.c_mktsegment, cl.c_nationkey, cl.group_size, cl.n,
         gl.bin, gl.g, COALESCE(p.c, 0)::BIGINT AS c
  FROM classes cl CROSS JOIN gbin gl
  LEFT JOIN per p ON p.c_mktsegment = cl.c_mktsegment
    AND p.c_nationkey = cl.c_nationkey AND p.bin = gl.bin
),
gaps AS (
  SELECT c_mktsegment, c_nationkey, group_size,
         abs(
           (SUM(c) OVER (PARTITION BY c_mktsegment, c_nationkey
                         ORDER BY bin
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )::DOUBLE / group_size::DOUBLE
           - (SUM(g) OVER (PARTITION BY c_mktsegment, c_nationkey
                           ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              )::DOUBLE / n::DOUBLE
         )::DECIMAL(38,18) AS gap
  FROM spine
),
agg AS (
  SELECT c_mktsegment, c_nationkey, group_size, SUM(gap) AS tsum
  FROM gaps GROUP BY c_mktsegment, c_nationkey, group_size
)
SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
       group_size,
       ROUND(tsum::DOUBLE / 9.0, 6) AS t,
       CAST(CASE WHEN ROUND(tsum::DOUBLE / 9.0, 6) > 0.2
            THEN 1 ELSE 0 END AS BIGINT) AS breach
FROM agg ORDER BY c_mktsegment, c_nationkey
"""


EXT5_QUERIES.update({"x161_t_closeness": q_x161_t_closeness})
EXT5_ORACLES.update({"x161_t_closeness": SQL_X161})


# ------------------------------ x162: SAX symbolic series words


def q_x162_sax_words(spark, sf_dir):
    """SAX words (operators/temporal.py:sax_words): every user's
    event-value series z-normalized, PAA-averaged into 8 segments,
    mapped to a 4-letter word at the N(0,1) equiprobable breakpoints
    — the motif/novelty index for millions of series."""
    from .operators.temporal import sax_words

    ev = _read_events(spark, sf_dir)
    ev = ev.withColumn("ts_ord", F.col("ts_us"))
    out = sax_words(
        ev,
        entity_col="user_id",
        ts_col="ts_ord",
        value_col="value",
        order_cols=("event_id",),
        n_segments=8,
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "n_obs",
        "sax_word",
    ).orderBy("user_id")


SQL_X162 = """
WITH base AS (
  SELECT user_id AS e, epoch_us(ts)::BIGINT AS tso, event_id,
         value::DOUBLE AS v
  FROM events WHERE value IS NOT NULL
),
st AS (
  SELECT e, count(*)::BIGINT AS n,
         SUM(v::DECIMAL(38,12)) AS sx,
         SUM((v * v)::DECIMAL(38,12)) AS sxx
  FROM base GROUP BY e
),
st2 AS (
  SELECT e, n,
         sx::DOUBLE / n::DOUBLE AS mu,
         sqrt(greatest(
           sxx::DOUBLE / n::DOUBLE
           - (sx::DOUBLE / n::DOUBLE) * (sx::DOUBLE / n::DOUBLE),
           0.0)) AS sd
  FROM st
),
seq AS (
  SELECT b.e, st2.n, st2.mu, st2.sd, b.v,
         ROW_NUMBER() OVER (PARTITION BY b.e ORDER BY b.tso, b.event_id)
           AS rn
  FROM base b JOIN st2 ON b.e = st2.e
),
zz AS (
  SELECT e, n,
         floor(8 * (rn - 1) / n)::BIGINT AS seg,
         (CASE WHEN sd > 0 THEN (v - mu) / sd ELSE 0.0
          END)::DECIMAL(38,12) AS z
  FROM seq
),
paa AS (
  SELECT e, n, seg, SUM(z)::DOUBLE / count(*) AS paa
  FROM zz GROUP BY e, n, seg
),
sym AS (
  SELECT e, n, seg,
         CASE WHEN paa < -0.6745 THEN 'a'
              WHEN paa < 0.0 THEN 'b'
              WHEN paa < 0.6745 THEN 'c'
              ELSE 'd' END AS s
  FROM paa
)
SELECT CAST(e AS BIGINT) AS user_id, n AS n_obs,
       string_agg(s, '' ORDER BY seg) AS sax_word
FROM sym GROUP BY e, n ORDER BY user_id
"""


EXT5_QUERIES.update({"x162_sax_words": q_x162_sax_words})
EXT5_ORACLES.update({"x162_sax_words": SQL_X162})


# ----------------------- x163: retrospective change-point scan


def q_x163_changepoint(spark, sf_dir):
    """Most-likely change point per event type (operators/
    temporal.py:changepoint): binary-segmentation scan statistic over
    the daily-total series — the retrospective twin of x69's
    sequential CUSUM."""
    from .operators.temporal import changepoint

    ev = _read_events(spark, sf_dir)
    ev = ev.withColumn(
        "ts_day",
        F.to_date(
            F.timestamp_micros(F.col("ts_us"))
        ),
    )
    out = changepoint(
        ev, entity_col="event_type", ts_col="ts_day", value_col="value"
    )
    return out.select(
        "event_type",
        "n_days",
        F.col("break_day").cast("string").alias("break_day"),
        "score",
        "mean_before",
        "mean_after",
    ).orderBy("event_type")


SQL_X163 = """
WITH daily AS (
  SELECT event_type AS e, CAST(ts AS DATE) AS d,
         SUM(value::DECIMAL(38,9)) AS dv
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, CAST(ts AS DATE)
),
seq AS (
  SELECT e, d, dv,
         ROW_NUMBER() OVER (PARTITION BY e ORDER BY d) AS k,
         SUM(dv) OVER (PARTITION BY e ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS ck,
         count(*) OVER (PARTITION BY e)::BIGINT AS n,
         SUM(dv) OVER (PARTITION BY e) AS cn,
         LEAD(d, 1) OVER (PARTITION BY e ORDER BY d) AS next_d
  FROM daily
),
sc AS (
  SELECT e, n, next_d,
         ck::DOUBLE / k::DOUBLE AS ml,
         (cn - ck)::DOUBLE / (n::DOUBLE - k::DOUBLE) AS mr,
         abs(ck::DOUBLE / k::DOUBLE
             - (cn - ck)::DOUBLE / (n::DOUBLE - k::DOUBLE))
           * sqrt(k::DOUBLE * (n::DOUBLE - k::DOUBLE) / n::DOUBLE)
           AS score
  FROM seq WHERE k < n
),
pick AS (
  SELECT e, n, next_d, ml, mr, score,
         ROW_NUMBER() OVER (PARTITION BY e
                            ORDER BY score DESC, next_d ASC) AS p
  FROM sc
)
SELECT e AS event_type, n AS n_days,
       CAST(next_d AS VARCHAR) AS break_day,
       ROUND(score, 6) AS score,
       ROUND(ml, 6) AS mean_before,
       ROUND(mr, 6) AS mean_after
FROM pick WHERE p = 1 ORDER BY event_type
"""


EXT5_QUERIES.update({"x163_changepoint": q_x163_changepoint})
EXT5_ORACLES.update({"x163_changepoint": SQL_X163})


# ----------------------- x164: Kendall tau-b rank concordance


def q_x164_kendall_tau(spark, sf_dir):
    """Kendall tau-b (operators/sketch.py:kendall_tau): concordance
    of customer account balance vs realized order spend per market
    segment — exact integer pair counts, capped pair join."""
    from .operators.sketch import kendall_tau

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,9)"))
        .cast("double")
        .alias("spend")
    )
    j = cust.join(
        spend, cust["c_custkey"] == spend["o_custkey"]
    ).select("c_mktsegment", "c_custkey", "c_acctbal", "spend")
    out = kendall_tau(
        j,
        "c_acctbal",
        "spend",
        id_col="c_custkey",
        group_cols=("c_mktsegment",),
    )
    return out.orderBy("c_mktsegment")


SQL_X164 = """
WITH spend AS (
  SELECT o_custkey, SUM(o_totalprice::DECIMAL(38,9))::DOUBLE AS spend
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT c.c_mktsegment AS g, c.c_custkey AS id,
         c.c_acctbal::DOUBLE AS x, s.spend AS y
  FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
  WHERE c.c_acctbal IS NOT NULL AND s.spend IS NOT NULL
),
pairs AS (
  SELECT a.g,
         CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS c,
         CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS d,
         CASE WHEN a.x - b.x = 0 THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.y - b.y = 0 THEN 1 ELSE 0 END AS ty
  FROM base a JOIN base b ON a.g = b.g AND a.id < b.id
),
cnt AS (SELECT g, count(*)::BIGINT AS n_rows FROM base GROUP BY g),
agg AS (
  SELECT g, count(*)::BIGINT AS n_pairs,
         SUM(c)::BIGINT AS concordant, SUM(d)::BIGINT AS discordant,
         SUM(tx)::BIGINT AS n1, SUM(ty)::BIGINT AS n2
  FROM pairs GROUP BY g
)
SELECT a.g AS c_mktsegment, cnt.n_rows, a.n_pairs,
       a.concordant, a.discordant,
       ROUND((a.concordant - a.discordant)::DOUBLE
             / (sqrt(a.n_pairs::DOUBLE - a.n1::DOUBLE)
                * sqrt(a.n_pairs::DOUBLE - a.n2::DOUBLE)), 6) AS tau_b
FROM agg a JOIN cnt ON cnt.g = a.g
ORDER BY c_mktsegment
"""


EXT5_QUERIES.update({"x164_kendall_tau": q_x164_kendall_tau})
EXT5_ORACLES.update({"x164_kendall_tau": SQL_X164})


# ------------------- x165: per-class average precision (PR summary)


def q_x165_average_precision(spark, sf_dir):
    """Average precision per label class (operators/quality.py:
    average_precision): vectors ranked by cosine to the corpus mean
    embedding, AP of each class's members — which classes cluster
    near the centroid, the PR-curve companion to x146's AUC."""
    from .operators.quality import average_precision

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "vec_id", "label", "pos", F.col("val").cast("double").alias("val")
    )
    meanv = ex.groupBy("pos").agg(
        (
            F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mval")
    )
    dec = "decimal(38,18)"
    dots = (
        ex.join(F.broadcast(meanv), "pos")
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("val") * F.col("mval")).cast(dec)).alias(
                "__dot"
            ),
            F.sum((F.col("val") * F.col("val")).cast(dec)).alias("__v2"),
            F.sum((F.col("mval") * F.col("mval")).cast(dec)).alias(
                "__m2"
            ),
        )
    )
    scored = dots.select(
        "vec_id",
        "label",
        (
            F.col("__dot").cast("double")
            / (
                F.sqrt(F.col("__v2").cast("double"))
                * F.sqrt(F.col("__m2").cast("double"))
            )
        ).alias("score"),
    )
    out = average_precision(scored, "score", "label", "vec_id")
    return out.select(
        F.col("label").cast("long").alias("label"),
        "n_pos",
        "best_rank",
        "ap",
    ).orderBy("label")


SQL_X165 = """
WITH ex AS (
  SELECT vec_id, label, u.d AS pos, CAST(embedding[u.d] AS DOUBLE) AS val
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(d)
),
meanv AS (
  SELECT pos, SUM(val::DECIMAL(38,12))::DOUBLE / count(*) AS mval
  FROM ex GROUP BY pos
),
dots AS (
  SELECT e.vec_id, e.label,
         SUM((e.val * m.mval)::DECIMAL(38,18)) AS dot,
         SUM((e.val * e.val)::DECIMAL(38,18)) AS v2,
         SUM((m.mval * m.mval)::DECIMAL(38,18)) AS m2
  FROM ex e JOIN meanv m ON m.pos = e.pos
  GROUP BY e.vec_id, e.label
),
scored AS (
  SELECT vec_id, label,
         dot::DOUBLE / (sqrt(v2::DOUBLE) * sqrt(m2::DOUBLE)) AS score
  FROM dots
),
ranked AS (
  SELECT label, vec_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, vec_id ASC) AS rnk
  FROM scored
),
hits AS (
  SELECT label, rnk,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY rnk) AS k
  FROM ranked
)
SELECT CAST(label AS BIGINT) AS label,
       count(*)::BIGINT AS n_pos,
       min(rnk)::BIGINT AS best_rank,
       ROUND(SUM((k::DOUBLE / rnk::DOUBLE)::DECIMAL(38,18))::DOUBLE
             / count(*)::DOUBLE, 6) AS ap
FROM hits GROUP BY label ORDER BY label
"""


EXT5_QUERIES.update({"x165_average_precision": q_x165_average_precision})
EXT5_ORACLES.update({"x165_average_precision": SQL_X165})


# --------------- x166: lead-lag cross-correlation between series


def q_x166_xcorr(spark, sf_dir):
    """Lagged cross-correlation scan (operators/temporal.py:
    cross_correlation): best lead/lag in [-7, +7] days between every
    ordered pair of event-type daily-total series."""
    from .operators.temporal import cross_correlation

    ev = _read_events(spark, sf_dir)
    ev = ev.withColumn(
        "ts_day", F.to_date(F.timestamp_micros(F.col("ts_us")))
    )
    out = cross_correlation(
        ev,
        entity_col="event_type",
        ts_col="ts_day",
        value_col="value",
        max_lag=7,
        min_overlap=30,
    )
    return out.orderBy("entity_a", "entity_b")


SQL_X166 = """
WITH daily AS (
  SELECT event_type AS e, CAST(ts AS DATE) AS d,
         SUM(value::DECIMAL(38,9))::DOUBLE AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, CAST(ts AS DATE)
),
lags AS (SELECT CAST(range AS INTEGER) AS lag FROM range(-7, 8)),
j AS (
  SELECT a.e AS ea, b.e AS eb, l.lag, a.v AS va, b.v AS vb
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON b.d = a.d + l.lag AND a.e <> b.e
),
m AS (
  SELECT ea, eb, lag, count(*)::BIGINT AS n,
         SUM(va::DECIMAL(38,12)) AS sx, SUM(vb::DECIMAL(38,12)) AS sy,
         SUM((va * vb)::DECIMAL(38,12)) AS sxy,
         SUM((va * va)::DECIMAL(38,12)) AS sxx,
         SUM((vb * vb)::DECIMAL(38,12)) AS syy
  FROM j GROUP BY ea, eb, lag
),
c AS (
  SELECT ea, eb, lag, n,
         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
         / NULLIF(sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                  * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE),
                  0) AS corr
  FROM m WHERE n >= 30
),
pick AS (
  SELECT ea, eb, lag, n, corr,
         ROW_NUMBER() OVER (PARTITION BY ea, eb
                            ORDER BY abs(corr) DESC, lag ASC) AS p
  FROM c WHERE corr IS NOT NULL
)
SELECT ea AS entity_a, eb AS entity_b,
       CAST(lag AS BIGINT) AS best_lag, n AS n_days,
       ROUND(corr, 6) AS xcorr
FROM pick WHERE p = 1 ORDER BY entity_a, entity_b
"""


EXT5_QUERIES.update({"x166_xcorr": q_x166_xcorr})
EXT5_ORACLES.update({"x166_xcorr": SQL_X166})


# --------------- x167: vocabulary coverage (Chao1 / Good-Turing)


def q_x167_vocab_coverage(spark, sf_dir):
    """Vocabulary saturation per source (operators/text.py:
    vocab_coverage): hapax/dis counts, the Chao1 unseen-vocab floor,
    and Good-Turing sample coverage — 'is another crawl round worth
    it' per source."""
    from .operators.text import vocab_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocab_coverage(docs, "text", ("source",)).orderBy("source")


SQL_X167 = """
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS term
  FROM documents
),
tc AS (
  SELECT source, term, count(*)::BIGINT AS c
  FROM tok GROUP BY source, term
),
agg AS (
  SELECT source, SUM(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
         SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
         SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
  FROM tc GROUP BY source
)
SELECT source, n_tokens, vocab, f1, f2,
       ROUND(vocab::DOUBLE + f1::DOUBLE * (f1::DOUBLE - 1.0)
             / (2.0 * (f2::DOUBLE + 1.0)), 6) AS chao1,
       ROUND(1.0 - f1::DOUBLE / n_tokens::DOUBLE, 6) AS coverage
FROM agg ORDER BY source
"""


EXT5_QUERIES.update({"x167_vocab_coverage": q_x167_vocab_coverage})
EXT5_ORACLES.update({"x167_vocab_coverage": SQL_X167})


# ------------------------ x168: Burrows' Delta provenance audit


def q_x168_burrows_delta(spark, sf_dir):
    """Burrows' Delta stylometry (operators/text.py:burrows_delta):
    mean |z| distance over the corpus top-30 terms between every
    source pair — near-zero pairs are the same upstream generator."""
    from .operators.text import burrows_delta

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return burrows_delta(docs, "text", "source", top_k=30)


SQL_X168 = """
WITH tok AS (
  SELECT source AS g,
         unnest(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS term
  FROM documents
),
tc AS (
  SELECT g, term, count(*)::BIGINT AS c FROM tok GROUP BY g, term
),
top AS (
  SELECT term FROM (
    SELECT term, SUM(c)::BIGINT AS tot FROM tc GROUP BY term
  ) ORDER BY tot DESC, term ASC LIMIT 30
),
gtot AS (SELECT g, SUM(c)::BIGINT AS gn FROM tc GROUP BY g),
freq AS (
  SELECT gt.g, t.term,
         COALESCE(tc.c, 0)::DOUBLE / gt.gn::DOUBLE AS f
  FROM gtot gt CROSS JOIN top t
  LEFT JOIN tc ON tc.g = gt.g AND tc.term = t.term
),
mom AS (
  SELECT term, count(*)::BIGINT AS k,
         SUM(f::DECIMAL(38,18)) AS sf,
         SUM((f * f)::DECIMAL(38,18)) AS sff
  FROM freq GROUP BY term
),
mom2 AS (
  SELECT term,
         sf::DOUBLE / k::DOUBLE AS mu,
         sqrt(greatest(sff::DOUBLE / k::DOUBLE
              - (sf::DOUBLE / k::DOUBLE) * (sf::DOUBLE / k::DOUBLE),
              0.0)) AS sd
  FROM mom
),
z AS (
  SELECT f.g, f.term, (f.f - m.mu) / m.sd AS z
  FROM freq f JOIN mom2 m ON m.term = f.term
  WHERE m.sd > 0
),
pairs AS (
  SELECT a.g AS source_a, b.g AS source_b,
         (abs(a.z - b.z))::DECIMAL(38,18) AS dz
  FROM z a JOIN z b ON a.term = b.term AND a.g < b.g
)
SELECT source_a, source_b, count(*)::BIGINT AS n_terms,
       ROUND(SUM(dz)::DOUBLE / count(*)::DOUBLE, 6) AS delta
FROM pairs GROUP BY source_a, source_b
ORDER BY delta ASC, source_a ASC, source_b ASC
"""


EXT5_QUERIES.update({"x168_burrows_delta": q_x168_burrows_delta})
EXT5_ORACLES.update({"x168_burrows_delta": SQL_X168})


# --------------- x169: empirical-Bayes shrunk rate leaderboard


def q_x169_eb_rates(spark, sf_dir):
    """Empirical-Bayes return-rate shrinkage per part (operators/
    sketch.py:eb_shrink_rates): beta-binomial method-of-moments prior
    pulls small-sample parts toward the corpus rate — the honest
    defect leaderboard."""
    from .operators.sketch import eb_shrink_rates

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = eb_shrink_rates(
        li, "l_partkey", F.col("l_returnflag") == "R", min_n=5
    )
    return out.select(
        F.col("l_partkey").cast("long").alias("l_partkey"),
        "n",
        "x",
        "raw_rate",
        "alpha",
        "beta",
        "shrunk_rate",
    ).orderBy("l_partkey")


SQL_X169 = """
WITH per AS (
  SELECT l_partkey, count(*)::BIGINT AS n,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS x
  FROM lineitem GROUP BY l_partkey
),
rated AS (SELECT *, x::DOUBLE / n::DOUBLE AS r FROM per),
prior0 AS (
  SELECT count(*)::BIGINT AS k,
         SUM(r::DECIMAL(38,18)) AS sr,
         SUM((r * r)::DECIMAL(38,18)) AS srr
  FROM rated WHERE n >= 5
),
prior AS (
  SELECT
    CASE WHEN (srr::DOUBLE / k::DOUBLE
               - (sr::DOUBLE / k::DOUBLE) * (sr::DOUBLE / k::DOUBLE)) > 0
          AND ((sr::DOUBLE / k::DOUBLE) * (1.0 - sr::DOUBLE / k::DOUBLE)
               / (srr::DOUBLE / k::DOUBLE
                  - (sr::DOUBLE / k::DOUBLE) * (sr::DOUBLE / k::DOUBLE))
               - 1.0) > 0
    THEN (sr::DOUBLE / k::DOUBLE)
         * ((sr::DOUBLE / k::DOUBLE) * (1.0 - sr::DOUBLE / k::DOUBLE)
            / (srr::DOUBLE / k::DOUBLE
               - (sr::DOUBLE / k::DOUBLE) * (sr::DOUBLE / k::DOUBLE))
            - 1.0)
    ELSE NULL END AS alpha,
    CASE WHEN (srr::DOUBLE / k::DOUBLE
               - (sr::DOUBLE / k::DOUBLE) * (sr::DOUBLE / k::DOUBLE)) > 0
          AND ((sr::DOUBLE / k::DOUBLE) * (1.0 - sr::DOUBLE / k::DOUBLE)
               / (srr::DOUBLE / k::DOUBLE
                  - (sr::DOUBLE / k::DOUBLE) * (sr::DOUBLE / k::DOUBLE))
               - 1.0) > 0
    THEN (1.0 - sr::DOUBLE / k::DOUBLE)
         * ((sr::DOUBLE / k::DOUBLE) * (1.0 - sr::DOUBLE / k::DOUBLE)
            / (srr::DOUBLE / k::DOUBLE
               - (sr::DOUBLE / k::DOUBLE) * (sr::DOUBLE / k::DOUBLE))
            - 1.0)
    ELSE NULL END AS beta
  FROM prior0
)
SELECT CAST(r.l_partkey AS BIGINT) AS l_partkey, r.n, r.x,
       ROUND(r.r, 6) AS raw_rate,
       ROUND(p.alpha, 6) AS alpha,
       ROUND(p.beta, 6) AS beta,
       ROUND((r.x::DOUBLE + p.alpha)
             / (r.n::DOUBLE + p.alpha + p.beta), 6) AS shrunk_rate
FROM rated r CROSS JOIN prior p
ORDER BY l_partkey
"""


EXT5_QUERIES.update({"x169_eb_rates": q_x169_eb_rates})
EXT5_ORACLES.update({"x169_eb_rates": SQL_X169})
