"""Round-6 extension queries (x248+): join planning and factorization
— AMS tug-of-war join-size estimation, an ALS recommendation
superstep, k-means|| oversampling, Mantel–Haenszel stratified odds,
Kneser–Ney continuation counts, and signed feature hashing.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_ext import _read_events

EXT11_QUERIES: dict = {}
EXT11_ORACLES: dict = {}


# ----------------------------- x248: AMS join-size estimate


def q_x248_ams_join_size(spark, sf_dir):
    """Pre-flight |orders ⋈ lineitem| gauge (operators/sketch.py:
    ams_join_size) — nine ±1 tug-of-war counters per side, median of
    the per-row products, with the exact distinct-key-count join as
    the realized-error check at this SF."""
    from .operators.sketch import ams_join_size

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return ams_join_size(orders, "o_orderkey", lineitem, "l_orderkey", rows=9)


SQL_X248 = """
WITH rr AS (SELECT r FROM range(9) t(r)),
sa AS (
  SELECT r,
         SUM(1 - 2 * (('0x' || substr(md5('ams:' || CAST(r AS VARCHAR)
             || ':' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 2)) AS xa
  FROM orders CROSS JOIN rr WHERE o_orderkey IS NOT NULL GROUP BY r
),
sb AS (
  SELECT r,
         SUM(1 - 2 * (('0x' || substr(md5('ams:' || CAST(r AS VARCHAR)
             || ':' || CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT % 2)) AS xb
  FROM lineitem CROSS JOIN rr WHERE l_orderkey IS NOT NULL GROUP BY r
),
prod AS (
  SELECT CAST(CAST(xa AS DECIMAL(38,0)) * CAST(xb AS DECIMAL(38,0))
              AS DOUBLE) AS p
  FROM sa JOIN sb USING (r)
),
med AS (SELECT list_sort(list(p))[5] AS est FROM prod),
ca AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k, COUNT(*) AS na
  FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1
),
cb AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS k, COUNT(*) AS nb
  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
),
ex AS (SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS exact
       FROM ca JOIN cb USING (k))
SELECT CAST(9 AS BIGINT) AS rows,
       est AS est_join_size,
       exact AS exact_join_size,
       ROUND((est - exact) / NULLIF(exact, 0), 6) AS rel_err
FROM med CROSS JOIN ex
"""

EXT11_QUERIES.update({"x248_ams_join_size": q_x248_ams_join_size})
EXT11_ORACLES.update({"x248_ams_join_size": SQL_X248})


# ----------------------------- x249: ALS-WR user superstep


def q_x249_als_step(spark, sf_dir):
    """One ALS-WR user-factor solve (operators/similarity.py:
    als_user_step) on the customer × part quantity matrix — the
    embarrassingly-parallel per-user ridge systems that make ALS the
    canonical distributed factorization; item factors md5-pinned so
    the superstep is exactly oracle-checkable."""
    from .operators.similarity import als_user_step

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ratings = lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        lineitem["l_orderkey"] == orders["o_orderkey"],
    ).select("o_custkey", "l_partkey", "l_quantity")
    return als_user_step(ratings, "o_custkey", "l_partkey", "l_quantity")


SQL_X249 = """
WITH pair AS (
  SELECT CAST(o_custkey AS BIGINT) AS u, CAST(l_partkey AS BIGINT) AS i,
         CAST(ROUND(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
                               AS DOUBLE) / COUNT(*), 6) * 1e6)
              AS BIGINT) AS rm
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL
        AND l_quantity IS NOT NULL
  GROUP BY 1, 2
),
y AS (
  SELECT i,
         500 + (('0x' || substr(md5('alsy1:' || CAST(i AS VARCHAR)), 1, 8))
                ::BIGINT % 1000) AS y1m,
         500 + (('0x' || substr(md5('alsy2:' || CAST(i AS VARCHAR)), 1, 8))
                ::BIGINT % 1000) AS y2m
  FROM (SELECT DISTINCT i FROM pair)
),
s AS (
  SELECT u, COUNT(*) AS n,
         SUM(y1m * y1m) AS s11, SUM(y1m * y2m) AS s12,
         SUM(y2m * y2m) AS s22,
         SUM(rm * y1m) AS sb1, SUM(rm * y2m) AS sb2
  FROM pair JOIN y USING (i) GROUP BY u
),
f AS (
  SELECT u, n,
         s11 * 1e-6 + 0.1 * n AS a11,
         s12 * 1e-6 AS a12,
         s22 * 1e-6 + 0.1 * n AS a22,
         sb1 * 1e-9 AS b1, sb2 * 1e-9 AS b2
  FROM s
)
SELECT u AS "user", CAST(n AS BIGINT) AS n_items,
       ROUND((a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12), 6) AS x1,
       ROUND((a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12), 6) AS x2
FROM f
"""

EXT11_QUERIES.update({"x249_als_step": q_x249_als_step})
EXT11_ORACLES.update({"x249_als_step": SQL_X249})


# ----------------------------- x250: k-means|| oversampling round


def q_x250_kmeanspp(spark, sf_dir):
    """One scalable-k-means++ oversampling round
    (operators/similarity.py:kmeanspp_oversample) against centers
    pinned to the ``vec_id < 4`` embeddings (the x75 idiom) — ℓ·D²/φ
    admission derandomized through the md5 uniform, so the sampled
    candidate pool is exactly oracle-checkable."""
    from .operators.similarity import kmeanspp_oversample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 4)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    return kmeanspp_oversample(emb, centers=cents, l=8.0)


SQL_X250 = """
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT id AS cid, v AS cv FROM e WHERE id < 4),
dists AS (
  SELECT e.id, cent.cid,
         list_reduce(list_transform(range(1, 65),
           i -> (e.v[CAST(i AS INTEGER)] - cent.cv[CAST(i AS INTEGER)])
                * (e.v[CAST(i AS INTEGER)] - cent.cv[CAST(i AS INTEGER)])),
           (a, x) -> a + x) AS d2
  FROM e CROSS JOIN cent
),
asg AS (
  SELECT id, cid AS near, d2 FROM (
    SELECT id, cid, d2,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
    FROM dists
  ) WHERE rn = 1
),
q AS (
  SELECT id, near, d2,
         CAST(floor(d2 * 1048576.0) AS BIGINT) AS d2q
  FROM asg
),
phi AS (
  SELECT CAST(SUM(CAST(d2q AS DECIMAL(38,0))) AS DOUBLE) AS phi FROM q
)
SELECT CAST(id AS BIGINT) AS id,
       CAST(near AS BIGINT) AS near,
       ROUND(d2, 6) AS d2,
       ROUND(8.0 * d2q / phi, 6) AS p
FROM q CROSS JOIN phi
WHERE ('0x' || substr(md5('kpp:' || CAST(id AS VARCHAR)), 1, 8))::BIGINT
      / 4294967296.0 < 8.0 * d2q / phi
"""

EXT11_QUERIES.update({"x250_kmeanspp": q_x250_kmeanspp})
EXT11_ORACLES.update({"x250_kmeanspp": SQL_X250})


# ----------------------------- x251: Mantel–Haenszel stratified odds


def q_x251_mantel_haenszel(spark, sf_dir):
    """Stratified conversion-odds audit (operators/behavior.py:
    mantel_haenszel): user×weekday unit cells, the x66 hash split as
    the exposure, purchase-that-weekday as the outcome — MH common
    odds ratio vs the pooled ratio (the Simpson check) with the CMH
    1-dof chi-square on an A/A split."""
    from .operators.behavior import mantel_haenszel
    from .operators.sketch import _hash64

    ev = _read_events(spark, sf_dir)
    unit = (
        ev.groupBy(
            F.col("user_id"),
            F.expr("(ts_us div 86400000000) % 7").cast("long").alias("dow"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("outcome")
        )
        .withColumn(
            "arm",
            F.when(
                _hash64(F.col("user_id"), "ab") / F.lit(4294967296.0)
                < F.lit(0.5),
                1,
            ).otherwise(0),
        )
    )
    return mantel_haenszel(unit, "dow", "arm", "outcome")


def _sql_x251() -> str:
    from .queries_ext9 import _normal_p_two_sided_sql

    chi2 = (
        "((CAST(sa AS DOUBLE) - se) * (CAST(sa AS DOUBLE) - se) / sv)"
    )
    return f"""
WITH unit AS (
  SELECT user_id, (epoch_us(ts) // 86400000000) % 7 AS dow,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS outcome,
         CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 1 ELSE 0 END AS arm
  FROM events GROUP BY 1, 2
),
cells AS (
  SELECT dow,
         SUM(arm * outcome) AS a,
         SUM(arm * (1 - outcome)) AS b,
         SUM((1 - arm) * outcome) AS c,
         SUM((1 - arm) * (1 - outcome)) AS d,
         COUNT(*) AS n
  FROM unit GROUP BY dow HAVING COUNT(*) >= 2
),
terms AS (
  SELECT a, b, c, d, n,
    CAST(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
         AS DECIMAL(38,12)) AS num,
    CAST(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
         AS DECIMAL(38,12)) AS den,
    CAST((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
         * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE)) / CAST(n AS DOUBLE)
         AS DECIMAL(38,12)) AS e,
    CAST((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
         * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))
         * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
         * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
            * (CAST(n AS DOUBLE) - 1.0))
         AS DECIMAL(38,12)) AS v
  FROM cells
),
agg AS (
  SELECT COUNT(*) AS n_strata, SUM(n) AS n_units,
         SUM(a) AS sa, SUM(b) AS sb, SUM(c) AS sc, SUM(d) AS sd,
         CAST(SUM(num) AS DOUBLE) AS snum,
         CAST(SUM(den) AS DOUBLE) AS sden,
         CAST(SUM(e) AS DOUBLE) AS se,
         CAST(SUM(v) AS DOUBLE) AS sv
  FROM terms
)
SELECT CAST(n_strata AS BIGINT) AS n_strata,
       CAST(n_units AS BIGINT) AS n_units,
       ROUND(snum / sden, 6) AS or_mh,
       ROUND(CAST(sa AS DOUBLE) * sd / (CAST(sb AS DOUBLE) * sc), 6)
         AS or_pooled,
       ROUND({chi2}, 6) AS chi2,
       ROUND({_normal_p_two_sided_sql(f"sqrt({chi2})")}, 6) AS p_value
FROM agg
"""


EXT11_QUERIES.update({"x251_mantel_haenszel": q_x251_mantel_haenszel})
EXT11_ORACLES.update({"x251_mantel_haenszel": _sql_x251()})


# ----------------------------- x252: Kneser–Ney continuation


def q_x252_kn_continuation(spark, sf_dir):
    """Continuation-probability vs raw-frequency table
    (operators/text.py:kn_continuation) for the 25 most frequent
    corpus words — the Kneser–Ney type-count view that separates
    genuinely productive vocabulary from collocation-bound and
    template words."""
    from .operators.text import kn_continuation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return kn_continuation(docs, "text", "doc_id", top_n=25)


SQL_X252 = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '') AS tk
  FROM documents
),
uni AS (SELECT unnest(tk) AS w FROM toks),
big AS (
  SELECT DISTINCT b.w1, b.w2
  FROM (
    SELECT unnest(list_transform(range(1, len(tk)),
             i -> {'w1': tk[CAST(i AS INTEGER)],
                   'w2': tk[CAST(i AS INTEGER) + 1]})) AS b
    FROM toks
  )
),
nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_types FROM big),
tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_tok FROM uni),
ctx AS (SELECT w2 AS word, COUNT(*) AS n_contexts FROM big GROUP BY 1),
freq AS (SELECT w AS word, COUNT(*) AS n_tokens FROM uni GROUP BY 1),
top AS (
  SELECT f.word, f.n_tokens, COALESCE(c.n_contexts, 0) AS n_contexts
  FROM freq f LEFT JOIN ctx c ON f.word = c.word
  ORDER BY f.n_tokens DESC, f.word ASC LIMIT 25
)
SELECT word,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_contexts AS BIGINT) AS n_contexts,
       ROUND(n_tokens / n_tok, 6) AS p_unigram,
       ROUND(n_contexts / n_types, 6) AS p_continuation
FROM top CROSS JOIN nt CROSS JOIN tt
"""

EXT11_QUERIES.update({"x252_kn_continuation": q_x252_kn_continuation})
EXT11_ORACLES.update({"x252_kn_continuation": SQL_X252})


# ----------------------------- x253: signed feature hashing


def q_x253_feature_hashing(spark, sf_dir):
    """Hashing-trick corpus profile (operators/text.py:
    hashed_features): 64-dim signed-tf document vectors, audited per
    dimension — nonzero support, signed mass, and second moment are
    exact integers, so the whole hashed matrix is oracle-pinned
    without materializing 50k×64 rows in the comparison."""
    from .operators.text import hashed_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = hashed_features(docs, "text", "doc_id", dim=64)
    return feats.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("nnz_docs"),
        F.sum("value").cast("long").alias("sum_value"),
        F.sum(F.col("value") * F.col("value")).cast("long").alias("sum_sq"),
    )


SQL_X253 = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS t
  FROM documents
),
cells AS (
  SELECT doc_id,
         ('0x' || substr(md5('fh:' || t), 1, 8))::BIGINT % 64 AS dim,
         SUM(1 - 2 * (('0x' || substr(md5('fhs:' || t), 1, 8))::BIGINT % 2))
           AS value
  FROM toks GROUP BY 1, 2
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS nnz_docs,
       CAST(SUM(value) AS BIGINT) AS sum_value,
       CAST(SUM(value * value) AS BIGINT) AS sum_sq
FROM cells WHERE value <> 0 GROUP BY 1
"""

EXT11_QUERIES.update({"x253_feature_hashing": q_x253_feature_hashing})
EXT11_ORACLES.update({"x253_feature_hashing": SQL_X253})


# ----------------------------- x254: Cook's distance influence


def q_x254_cooks_distance(spark, sf_dir):
    """Trend-influence audit (operators/temporal.py:cooks_distance):
    the 3 most influential days per event type for the x65/x229 daily
    mean-value trend fit — e²h/(p·s²(1−h)²) from one closed-form
    moments pass; D ≈ 1 on a single day means the slope is that day,
    not a trend."""
    from .operators.temporal import cooks_distance

    ev = _read_events(spark, sf_dir)
    day = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("ts_us div 86400000000").cast("long").alias("day"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("x")
        )
    )
    out = cooks_distance(day, ["event_type"], "day", "x", top_n=3)
    return out.orderBy("event_type", "rank")


SQL_X254 = """
WITH day AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(day) AS DOUBLE) AS sx,
         CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(day * x AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(SUM(day * day) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM day GROUP BY 1 HAVING COUNT(*) >= 4
),
fit AS (
  SELECT event_type, n,
         sx / n AS xbar,
         sxx - sx * sx / n AS stt,
         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
         (sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n AS icept,
         ((syy - sy * sy / n)
          - (sxy - sx * sy / n) / (sxx - sx * sx / n)
            * (sxy - sx * sy / n)) / (n - 2.0) AS s2
  FROM m
),
scored AS (
  SELECT d.event_type,
         CAST(d.day AS BIGINT) AS x,
         ROUND(d.x - (f.icept + f.slope * d.day), 6) AS resid,
         ROUND(1.0 / f.n + (d.day - f.xbar) * (d.day - f.xbar) / f.stt,
               6) AS leverage,
         ROUND((d.x - (f.icept + f.slope * d.day))
               * (d.x - (f.icept + f.slope * d.day))
               * (1.0 / f.n + (d.day - f.xbar) * (d.day - f.xbar) / f.stt)
               / (2.0 * f.s2
                  * (1.0 - (1.0 / f.n
                            + (d.day - f.xbar) * (d.day - f.xbar) / f.stt))
                  * (1.0 - (1.0 / f.n
                            + (d.day - f.xbar) * (d.day - f.xbar) / f.stt))),
               6) AS cooks_d
  FROM day d JOIN fit f ON d.event_type = f.event_type
)
SELECT event_type, x, resid, leverage, cooks_d,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY cooks_d DESC, x ASC) AS rank
  FROM scored WHERE cooks_d IS NOT NULL
) WHERE rank <= 3
ORDER BY event_type, rank
"""

EXT11_QUERIES.update({"x254_cooks_distance": q_x254_cooks_distance})
EXT11_ORACLES.update({"x254_cooks_distance": SQL_X254})


# ----------------------------- x255: Hill tail index


def q_x255_hill_tail(spark, sf_dir):
    """Per-source document-length tail heaviness (operators/sketch.py:
    hill_tail_index): Pareto exponent from the top-200 order
    statistics — the partition-sizing answer skew_profile's head view
    doesn't give: does the length tail decay fast enough for uniform
    maxPartitionBytes splits at 100 TB."""
    from .operators.sketch import hill_tail_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hill_tail_index(docs, "n_chars", k=200, group_cols=["source"])


SQL_X255 = """
WITH base AS (
  SELECT source, n_chars FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
),
top AS (
  SELECT source, n_chars FROM (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC)
             AS rn
    FROM base
  ) WHERE rn <= 200
),
agg AS (
  SELECT source, COUNT(*) AS k,
         MIN(CAST(n_chars AS DOUBLE)) AS x_k,
         CAST(SUM(CAST(ln(CAST(n_chars AS DOUBLE)) AS DECIMAL(38,12)))
              AS DOUBLE) AS slx
  FROM top GROUP BY 1
)
SELECT source, CAST(k AS BIGINT) AS k,
       ROUND(x_k, 6) AS x_k,
       ROUND(CASE WHEN slx / CAST(k AS DOUBLE) - ln(x_k) > 0
                  THEN 1.0 / (slx / CAST(k AS DOUBLE) - ln(x_k)) END,
             6) AS alpha
FROM agg
"""

EXT11_QUERIES.update({"x255_hill_tail": q_x255_hill_tail})
EXT11_ORACLES.update({"x255_hill_tail": SQL_X255})


# ----------------------------- x256: always-valid mSPRT monitor


def q_x256_msprt(spark, sf_dir):
    """Daily always-valid p-value sequence per event type
    (operators/behavior.py:msprt_monitor) on the x66 hash A/A split —
    the peek-proof monitor: p is monotone non-increasing by
    construction and should stay high on a null split."""
    from .operators.behavior import msprt_monitor
    from .operators.sketch import _hash64

    ev = _read_events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.expr("ts_us div 86400000000").cast("long").alias("day"),
        F.when(
            _hash64(F.col("user_id"), "ab") / F.lit(4294967296.0)
            < F.lit(0.5),
            "a",
        )
        .otherwise("b")
        .alias("arm"),
        "value",
    )
    out = msprt_monitor(base, ["event_type"], "day", "arm", "value", tau=1.0)
    return out.orderBy("event_type", "day")


SQL_X256 = """
WITH base AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 'a' ELSE 'b' END AS arm,
         CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL
),
daily AS (
  SELECT event_type, day,
         SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS na,
         SUM(CAST(CASE WHEN arm = 'a' THEN v ELSE 0.0 END
             AS DECIMAL(28,6))) AS sa,
         SUM(CAST(CASE WHEN arm = 'a' THEN v * v ELSE 0.0 END
             AS DECIMAL(38,12))) AS ssa,
         SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS nb,
         SUM(CAST(CASE WHEN arm = 'b' THEN v ELSE 0.0 END
             AS DECIMAL(28,6))) AS sb,
         SUM(CAST(CASE WHEN arm = 'b' THEN v * v ELSE 0.0 END
             AS DECIMAL(38,12))) AS ssb
  FROM base GROUP BY 1, 2
),
cum AS (
  SELECT event_type, day,
         CAST(SUM(na) OVER w AS BIGINT) AS cna,
         CAST(SUM(sa) OVER w AS DOUBLE) AS csa,
         CAST(SUM(ssa) OVER w AS DOUBLE) AS cssa,
         CAST(SUM(nb) OVER w AS BIGINT) AS cnb,
         CAST(SUM(sb) OVER w AS DOUBLE) AS csb,
         CAST(SUM(ssb) OVER w AS DOUBLE) AS cssb
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
scored AS (
  SELECT event_type, day, cna AS n_a, cnb AS n_b,
         ROUND(csa / CAST(cna AS DOUBLE) - csb / CAST(cnb AS DOUBLE), 6)
           AS delta,
         CASE WHEN cna >= 2 AND cnb >= 2
                   AND ((cssa - csa * csa / CAST(cna AS DOUBLE))
                        + (cssb - csb * csb / CAST(cnb AS DOUBLE)))
                       / (CAST(cna AS DOUBLE) + CAST(cnb AS DOUBLE) - 2.0)
                       > 0
         THEN
           LEAST(sqrt(
             (((cssa - csa * csa / CAST(cna AS DOUBLE))
               + (cssb - csb * csb / CAST(cnb AS DOUBLE)))
              / (CAST(cna AS DOUBLE) + CAST(cnb AS DOUBLE) - 2.0)
              * (1.0 / CAST(cna AS DOUBLE) + 1.0 / CAST(cnb AS DOUBLE)))
             / ((((cssa - csa * csa / CAST(cna AS DOUBLE))
                  + (cssb - csb * csb / CAST(cnb AS DOUBLE)))
                 / (CAST(cna AS DOUBLE) + CAST(cnb AS DOUBLE) - 2.0)
                 * (1.0 / CAST(cna AS DOUBLE) + 1.0 / CAST(cnb AS DOUBLE)))
                + 1.0))
           * exp((csa / CAST(cna AS DOUBLE) - csb / CAST(cnb AS DOUBLE))
                 * (csa / CAST(cna AS DOUBLE) - csb / CAST(cnb AS DOUBLE))
                 * 1.0
                 / (2.0
                    * (((cssa - csa * csa / CAST(cna AS DOUBLE))
                        + (cssb - csb * csb / CAST(cnb AS DOUBLE)))
                       / (CAST(cna AS DOUBLE) + CAST(cnb AS DOUBLE) - 2.0)
                       * (1.0 / CAST(cna AS DOUBLE)
                          + 1.0 / CAST(cnb AS DOUBLE)))
                    * ((((cssa - csa * csa / CAST(cna AS DOUBLE))
                         + (cssb - csb * csb / CAST(cnb AS DOUBLE)))
                        / (CAST(cna AS DOUBLE) + CAST(cnb AS DOUBLE) - 2.0)
                        * (1.0 / CAST(cna AS DOUBLE)
                           + 1.0 / CAST(cnb AS DOUBLE)))
                       + 1.0))), 1000000.0)
         END AS lam
  FROM cum
)
SELECT event_type, CAST(day AS BIGINT) AS day,
       n_a, n_b, delta,
       ROUND(lam, 6) AS lam,
       ROUND(CASE WHEN mx IS NOT NULL
                  THEN LEAST(1.0, 1.0 / mx) END, 6) AS p_always
FROM (
  SELECT *, MAX(lam) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx
  FROM scored
)
ORDER BY event_type, day
"""

EXT11_QUERIES.update({"x256_msprt": q_x256_msprt})
EXT11_ORACLES.update({"x256_msprt": SQL_X256})


# ----------------------------- x257: Good–Turing unseen mass


def q_x257_good_turing(spark, sf_dir):
    """Count-of-counts vocabulary profile (operators/text.py:
    good_turing_profile): the r=1 row's token share is the
    Good–Turing unseen-word mass — the distribution-free 'how open is
    this corpus's vocabulary' estimate next to Heaps' law (x194)."""
    from .operators.text import good_turing_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return good_turing_profile(docs, "text", max_r=5)


SQL_X257 = """
WITH toks AS (
  SELECT unnest(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS w
  FROM documents
),
wc AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1),
nr AS (SELECT c AS r, COUNT(*) AS n_r FROM wc GROUP BY 1),
tot AS (SELECT CAST(SUM(r * n_r) AS DOUBLE) AS n FROM nr)
SELECT CAST(a.r AS BIGINT) AS r,
       CAST(a.n_r AS BIGINT) AS n_r,
       ROUND(CAST(a.r AS DOUBLE) * a.n_r / t.n, 6) AS token_share,
       ROUND(CAST(a.r + 1 AS DOUBLE) * b.n_r / a.n_r, 6) AS r_star
FROM (SELECT * FROM nr ORDER BY r LIMIT 5) a
LEFT JOIN nr b ON b.r = a.r + 1
CROSS JOIN tot t
"""

EXT11_QUERIES.update({"x257_good_turing": q_x257_good_turing})
EXT11_ORACLES.update({"x257_good_turing": SQL_X257})


# ----------------------------- x258: capture–recapture coverage


def q_x258_capture_recapture(spark, sf_dir):
    """Chapman–Lincoln–Petersen population estimate per source pair
    (operators/dedup.py:capture_recapture) over distinct 30-char
    passage shingles — treating sources as independent captures of
    the passage population: how many distinct passages exist, and
    what share do two sources jointly hold; the coverage question
    x52's overlap matrix can't answer."""
    from .operators.dedup import capture_recapture

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return capture_recapture(
        docs, "text", "doc_id", "source", shingle_n=30
    )


SQL_X258 = """
WITH docs AS (
  SELECT source AS src,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
fps AS (
  SELECT DISTINCT d.src, md5(substr(d.t, CAST(i.i AS INTEGER), 30)) AS fp
  FROM docs d,
       LATERAL (SELECT unnest(range(1, greatest(length(d.t) - 29, 0) + 1))
                AS i) i
  WHERE length(d.t) >= 30
),
totals AS (SELECT src, COUNT(*) AS n FROM fps GROUP BY 1),
pairs AS (
  SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS m
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.src < b.src
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b,
       CAST(ta.n AS BIGINT) AS n_a,
       CAST(tb.n AS BIGINT) AS n_b,
       CAST(p.m AS BIGINT) AS m,
       ROUND(CAST(ta.n + 1 AS DOUBLE) * CAST(tb.n + 1 AS DOUBLE)
             / CAST(p.m + 1 AS DOUBLE) - 1.0, 6) AS n_hat,
       ROUND(CAST(ta.n + tb.n - p.m AS DOUBLE)
             / (CAST(ta.n + 1 AS DOUBLE) * CAST(tb.n + 1 AS DOUBLE)
                / CAST(p.m + 1 AS DOUBLE) - 1.0), 6) AS coverage_union
FROM pairs p
JOIN totals ta ON ta.src = p.source_a
JOIN totals tb ON tb.src = p.source_b
"""

EXT11_QUERIES.update({"x258_capture_recapture": q_x258_capture_recapture})
EXT11_ORACLES.update({"x258_capture_recapture": SQL_X258})


# ----------------------------- x259: MASE seasonal screen


def q_x259_mase(spark, sf_dir):
    """Seasonal-naive vs naive forecastability screen
    (operators/temporal.py:forecast_mase) on the daily mean event
    value per type — mase < 1 means the weekly pattern is real; the
    scale-free gate before fitting x150/x186 to every entity."""
    from .operators.temporal import forecast_mase

    ev = _read_events(spark, sf_dir)
    day = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("ts_us div 86400000000").cast("long").alias("day"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("x")
        )
    )
    return forecast_mase(day, ["event_type"], "day", "x", season=7).orderBy(
        "event_type"
    )


SQL_X259 = """
WITH day AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, day, x,
         LAG(x, 1) OVER w AS y1, LAG(day, 1) OVER w AS t1,
         LAG(x, 7) OVER w AS ym, LAG(day, 7) OVER w AS tm
  FROM day
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
agg AS (
  SELECT event_type,
         COUNT(CASE WHEN day - t1 = 1 THEN 1 END) AS n_naive,
         COUNT(CASE WHEN day - tm = 7 THEN 1 END) AS n_seasonal,
         CAST(SUM(CASE WHEN day - t1 = 1
                  THEN CAST(ABS(x - y1) AS DECIMAL(28,6)) END)
              AS DOUBLE) AS s1,
         CAST(SUM(CASE WHEN day - tm = 7
                  THEN CAST(ABS(x - ym) AS DECIMAL(28,6)) END)
              AS DOUBLE) AS sm
  FROM lagged GROUP BY 1
)
SELECT event_type,
       CAST(n_naive AS BIGINT) AS n_naive,
       CAST(n_seasonal AS BIGINT) AS n_seasonal,
       ROUND(s1 / CAST(n_naive AS DOUBLE), 6) AS mae_naive,
       ROUND(sm / CAST(n_seasonal AS DOUBLE), 6) AS mae_seasonal,
       ROUND(CASE WHEN s1 / CAST(n_naive AS DOUBLE) > 0
                  THEN (sm / CAST(n_seasonal AS DOUBLE))
                       / (s1 / CAST(n_naive AS DOUBLE)) END, 6) AS mase
FROM agg
ORDER BY event_type
"""

EXT11_QUERIES.update({"x259_mase": q_x259_mase})
EXT11_ORACLES.update({"x259_mase": SQL_X259})


# ----------------------------- x260: video shot boundaries


def q_x260_shot_boundaries(spark, sf_dir):
    """Cut detection through the REAL video path
    (operators/multimodal.py:shot_boundaries after frame_sample_y4m):
    each document renders a 4-frame Y4M clip whose pixels sit in a
    wrap-free mid-gray band with a planted +120 luma cut entering
    frame 2; the container is genuinely parsed frame by frame, and
    the detector must find exactly that one cut per document.  The oracle
    re-derives frame luma arithmetically from the generation formula
    (the x93 idiom), so the full decode→detect pipeline is
    value-checked."""
    from .operators.multimodal import frame_sample_y4m, shot_boundaries
    from .queries_ext2 import (
        _Y4M_FRAME_MARK_HEX,
        _Y4M_HEADER_HEX,
        _ahash_pixel_counts_spark,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nt = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), nt.alias("__nt")
    )
    counts = _ahash_pixel_counts_spark(F.col("__nt"))
    frame_hexes = []
    for f in range(4):
        shift = f + (120 if f >= 2 else 0)
        # wrap-free mid-gray remap: 40 + (c mod 64) + shift <= 226,
        # so the +120 cut moves EVERY pixel by exactly +120 and each
        # doc detects exactly one boundary at frame 2
        y_hex = F.concat_ws(
            "",
            *[
                F.lpad(F.hex(F.lit(40) + (c % 64) + shift), 2, "0")
                for c in counts
            ],
        )
        frame_hexes.append(
            F.concat(F.lit(_Y4M_FRAME_MARK_HEX), y_hex, F.lit("80" * 32))
        )
    payload = F.unhex(F.concat(F.lit(_Y4M_HEADER_HEX), *frame_hexes))
    clips = staged.select("doc_id", payload.alias("payload"))
    frames = frame_sample_y4m(clips, "doc_id", "payload", every=1)
    return shot_boundaries(
        frames, "doc_id", "frame_idx", "luma_mean", threshold=30.0
    )


def _sql_x260() -> str:
    from .queries_ext2 import _AHASH_LETTERS

    cols = []
    for j in range(64):
        if j < 26:
            ch = _AHASH_LETTERS[j]
            cols.append(
                f"(length(nt) - length(replace(nt, '{ch}', ''))) % 256"
            )
        else:
            cols.append(f"(length(nt) * {j + 1}) % 256")
    px = ",\n           ".join(cols)
    frames = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {f} AS frame_idx, px FROM c" for f in range(4)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\\\s+', ' ', 'g')) AS nt
  FROM documents
), c AS (
  SELECT doc_id,
         list_value(
           {px}) AS px
  FROM t
), f AS (
  {frames}
), luma AS (
  SELECT doc_id, frame_idx,
         ROUND(CAST(list_reduce(list_transform(px,
                 x -> 40 + (x % 64) + frame_idx
                      + CASE WHEN frame_idx >= 2 THEN 120 ELSE 0 END),
                 (a, x) -> a + x) AS DOUBLE) / 64, 6) AS luma_mean
  FROM f
), lagged AS (
  SELECT doc_id, frame_idx, luma_mean,
         LAG(luma_mean) OVER (PARTITION BY doc_id ORDER BY frame_idx)
           AS prev
  FROM luma
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       ROUND(prev, 6) AS luma_prev,
       ROUND(luma_mean, 6) AS luma,
       ROUND(luma_mean - prev, 6) AS delta
FROM lagged
WHERE prev IS NOT NULL AND ABS(luma_mean - prev) >= 30.0
"""


EXT11_QUERIES.update({"x260_shot_boundaries": q_x260_shot_boundaries})
EXT11_ORACLES.update({"x260_shot_boundaries": _sql_x260()})


# ----------------------------- x261: Naive Bayes label audit


def q_x261_nb_confusion(spark, sf_dir):
    """In-sample multinomial NB confusion over stored language labels
    (operators/text.py:naive_bayes_confusion) — the trained
    label-quality audit next to the heuristic x113: classes NB cannot
    separate in sample are label noise or duplicate strata."""
    from .operators.text import naive_bayes_confusion

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return naive_bayes_confusion(docs, "text", "doc_id", "lang")


SQL_X261 = """
WITH base AS (
  SELECT doc_id AS doc, lang AS label,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '') AS tk
  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
),
dw AS (
  SELECT doc, label, w, COUNT(*) AS cnt
  FROM (SELECT doc, label, unnest(tk) AS w FROM base)
  GROUP BY 1, 2, 3
),
wc AS (SELECT w, label AS cls, SUM(cnt) AS cwl FROM dw GROUP BY 1, 2),
ct AS (SELECT cls, SUM(cwl) AS tl FROM wc GROUP BY 1),
vocab AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v FROM dw),
nd AS (SELECT label AS cls, COUNT(*) AS nd FROM base GROUP BY 1),
nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nt FROM base),
classes AS (
  SELECT ct.cls, CAST(ct.tl AS DOUBLE) AS tl, v.v,
         ln(nd.nd / nt.nt) AS lprior
  FROM ct JOIN nd ON nd.cls = ct.cls CROSS JOIN vocab v CROSS JOIN nt
),
scored AS (
  SELECT dw.doc, dw.label, c.cls,
         ROUND(ANY_VALUE(c.lprior)
               + CAST(SUM(CAST(CAST(dw.cnt AS DOUBLE)
                     * ln(CAST(COALESCE(wc.cwl, 0) + 1 AS DOUBLE)
                          / (c.tl + c.v))
                     AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
  FROM dw CROSS JOIN classes c
  LEFT JOIN wc ON wc.w = dw.w AND wc.cls = c.cls
  GROUP BY dw.doc, dw.label, c.cls
),
pred AS (
  SELECT doc, label, cls AS predicted FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc ORDER BY score DESC, cls ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT label, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2
"""

EXT11_QUERIES.update({"x261_nb_confusion": q_x261_nb_confusion})
EXT11_ORACLES.update({"x261_nb_confusion": SQL_X261})


# ----------------------------- x262: Markov next-event eval


def q_x262_markov_eval(spark, sf_dir):
    """Time-split top-1 next-event accuracy per state
    (operators/behavior.py:markov_prediction_eval) — the x34
    transition matrix finally gets an eval protocol: train on the
    first half of the range, predict argmax on the second, split by
    TIME (the x125 leakage rule)."""
    from .operators.behavior import markov_prediction_eval

    ev = _read_events(spark, sf_dir)
    out = markov_prediction_eval(
        ev, "user_id", "event_type", "ts_us", "event_id"
    )
    return out.orderBy("state")


SQL_X262 = """
WITH trans AS (
  SELECT user_id AS u, event_type AS t2, epoch_us(ts) AS ts_us,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS t1
  FROM events
),
base AS (SELECT * FROM trans WHERE t1 IS NOT NULL),
span AS (
  SELECT CAST(MIN(epoch_us(ts))
              + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 2 AS BIGINT)
           AS cut
  FROM events
),
tagged AS (
  SELECT b.*, b.ts_us >= s.cut AS is_eval FROM base b CROSS JOIN span s
),
counts AS (
  SELECT t1, t2, COUNT(*) AS n FROM tagged WHERE NOT is_eval GROUP BY 1, 2
),
model AS (
  SELECT t1, t2 AS predicted, CAST(n AS BIGINT) AS n_train FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY t1 ORDER BY n DESC, t2 ASC) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT e.t1 AS state, m.predicted, m.n_train,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN e.t2 = m.predicted THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       ROUND(SUM(CASE WHEN e.t2 = m.predicted THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM tagged e LEFT JOIN model m ON m.t1 = e.t1
WHERE e.is_eval
GROUP BY 1, 2, 3
ORDER BY state
"""

EXT11_QUERIES.update({"x262_markov_eval": q_x262_markov_eval})
EXT11_ORACLES.update({"x262_markov_eval": SQL_X262})


# ----------------------------- x263: period mix-shift decomposition


def q_x263_mix_shift(spark, sf_dir):
    """Why did mean event value move between the first and second half
    of the range (operators/behavior.py:mix_shift_decomposition):
    within-type rate movement vs event-type mix movement, summing to
    the observed delta by identity — the Kitagawa/Oaxaca answer to
    every period-over-period review."""
    from .operators.behavior import mix_shift_decomposition

    ev = _read_events(spark, sf_dir)
    span = ev.agg(
        F.min("ts_us").alias("__mn"), F.max("ts_us").alias("__mx")
    ).select(
        ((F.col("__mn") + (F.col("__mx") - F.col("__mn")) / F.lit(2)))
        .cast("long")
        .alias("__cut")
    )
    tagged = ev.crossJoin(F.broadcast(span)).withColumn(
        "period",
        F.when(F.col("ts_us") >= F.col("__cut"), "h2").otherwise("h1"),
    )
    return mix_shift_decomposition(
        tagged, "event_type", "period", "value", group_a="h2", group_b="h1"
    )


SQL_X263 = """
WITH span AS (
  SELECT CAST(MIN(epoch_us(ts))
              + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 2 AS BIGINT)
           AS cut
  FROM events
),
base AS (
  SELECT event_type AS s,
         CASE WHEN epoch_us(ts) >= span.cut THEN 'h2' ELSE 'h1' END AS g,
         CAST(value AS DOUBLE) AS v
  FROM events CROSS JOIN span
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
cells AS (
  SELECT s,
         SUM(CASE WHEN g = 'h2' THEN 1 ELSE 0 END) AS na,
         SUM(CAST(CASE WHEN g = 'h2' THEN v ELSE 0.0 END
             AS DECIMAL(28,6))) AS sa,
         SUM(CASE WHEN g = 'h1' THEN 1 ELSE 0 END) AS nb,
         SUM(CAST(CASE WHEN g = 'h1' THEN v ELSE 0.0 END
             AS DECIMAL(28,6))) AS sb
  FROM base GROUP BY 1
),
tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM cells),
terms AS (
  SELECT t.ta, t.tb, c.sa, c.sb,
    CAST((CAST(c.nb AS DOUBLE) / CAST(t.tb AS DOUBLE))
         * ((CASE WHEN c.na > 0
                  THEN CAST(c.sa AS DOUBLE) / CAST(c.na AS DOUBLE)
                  ELSE 0.0 END)
            - (CASE WHEN c.nb > 0
                    THEN CAST(c.sb AS DOUBLE) / CAST(c.nb AS DOUBLE)
                    ELSE 0.0 END)) AS DECIMAL(38,12)) AS rate_t,
    CAST((CASE WHEN c.na > 0
               THEN CAST(c.sa AS DOUBLE) / CAST(c.na AS DOUBLE)
               ELSE 0.0 END)
         * (CAST(c.na AS DOUBLE) / CAST(t.ta AS DOUBLE)
            - CAST(c.nb AS DOUBLE) / CAST(t.tb AS DOUBLE))
         AS DECIMAL(38,12)) AS mix_t
  FROM cells c CROSS JOIN tot t
),
agg AS (
  SELECT ta, tb,
         CAST(SUM(sa) AS DOUBLE) AS tsa,
         CAST(SUM(sb) AS DOUBLE) AS tsb,
         CAST(SUM(rate_t) AS DOUBLE) AS re,
         CAST(SUM(mix_t) AS DOUBLE) AS me
  FROM terms GROUP BY 1, 2
)
SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
       ROUND(tsa / CAST(ta AS DOUBLE), 6) AS mean_a,
       ROUND(tsb / CAST(tb AS DOUBLE), 6) AS mean_b,
       ROUND(tsa / CAST(ta AS DOUBLE) - tsb / CAST(tb AS DOUBLE), 6)
         AS delta,
       ROUND(re, 6) AS rate_effect,
       ROUND(me, 6) AS mix_effect
FROM agg
"""

EXT11_QUERIES.update({"x263_mix_shift": q_x263_mix_shift})
EXT11_ORACLES.update({"x263_mix_shift": SQL_X263})


# ----------------------------- x264: reducer-load prediction


def q_x264_reducer_loads(spark, sf_dir):
    """Predicted shuffle-task histogram for keying lineitem by
    orderkey at P ∈ {32, 256} (operators/sketch.py:
    reducer_load_profile) — the max/mean reducer ratio that decides
    between plain repartitioning and salting before the real job
    runs."""
    from .operators.sketch import reducer_load_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return reducer_load_profile(
        li, ["l_orderkey"], partitions=(32, 256)
    ).orderBy("p")


SQL_X264 = """
WITH counts AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS key, COUNT(*) AS n
  FROM lineitem GROUP BY 1
),
loads AS (
  SELECT p,
         ('0x' || substr(md5('rl:' || key), 1, 8))::BIGINT % p AS r,
         SUM(n) AS load, COUNT(*) AS k
  FROM counts CROSS JOIN (SELECT unnest([32, 256]) AS p)
  GROUP BY 1, 2
)
SELECT CAST(p AS BIGINT) AS p,
       CAST(SUM(load) AS BIGINT) AS n_rows,
       CAST(SUM(k) AS BIGINT) AS n_keys,
       ROUND(CAST(SUM(load) AS DOUBLE) / CAST(p AS DOUBLE), 6)
         AS mean_load,
       CAST(MAX(load) AS BIGINT) AS max_load,
       ROUND(MAX(load) / (CAST(SUM(load) AS DOUBLE) / CAST(p AS DOUBLE)),
             6) AS skew_ratio,
       CAST(COUNT(*) AS BIGINT) AS nonempty
FROM loads GROUP BY p
ORDER BY p
"""

EXT11_QUERIES.update({"x264_reducer_loads": q_x264_reducer_loads})
EXT11_ORACLES.update({"x264_reducer_loads": SQL_X264})


# ----------------------------- x265: upper-tail dependence


def q_x265_tail_dependence(spark, sf_dir):
    """Do extreme order prices and extreme line quantities co-occur
    (operators/sketch.py:tail_dependence): λ_U at q=0.9 between
    o_totalprice and the order's total quantity, per order priority —
    the copula tail question x53's linear correlation can't answer."""
    from .operators.sketch import tail_dependence

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)"))
        .cast("double")
        .alias("total_qty")
    )
    base = orders.join(
        qty, orders["o_orderkey"] == qty["l_orderkey"]
    ).select("o_orderpriority", "o_totalprice", "total_qty")
    return tail_dependence(
        base,
        "o_totalprice",
        "total_qty",
        ["o_orderpriority"],
        q=0.9,
    ).orderBy("o_orderpriority")


SQL_X265 = """
WITH qty AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
           AS total_qty
  FROM lineitem GROUP BY 1
),
base AS (
  SELECT o_orderpriority AS g,
         CAST(o_totalprice AS DOUBLE) AS x,
         total_qty AS y
  FROM orders JOIN qty ON o_orderkey = l_orderkey
  WHERE o_totalprice IS NOT NULL AND total_qty IS NOT NULL
),
tx AS (
  SELECT g, x AS x_q FROM (
    SELECT g, x,
           ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
           COUNT(*) OVER (PARTITION BY g) AS nn
    FROM base
  ) WHERE rn = CAST(CEIL(0.9 * nn) AS INTEGER)
),
ty AS (
  SELECT g, y AS y_q FROM (
    SELECT g, y,
           ROW_NUMBER() OVER (PARTITION BY g ORDER BY y) AS rn,
           COUNT(*) OVER (PARTITION BY g) AS nn
    FROM base
  ) WHERE rn = CAST(CEIL(0.9 * nn) AS INTEGER)
),
agg AS (
  SELECT b.g, COUNT(*) AS n,
         ANY_VALUE(tx.x_q) AS x_q, ANY_VALUE(ty.y_q) AS y_q,
         SUM(CASE WHEN b.x > tx.x_q THEN 1 ELSE 0 END) AS n_x,
         SUM(CASE WHEN b.y > ty.y_q THEN 1 ELSE 0 END) AS n_y,
         SUM(CASE WHEN b.x > tx.x_q AND b.y > ty.y_q
                  THEN 1 ELSE 0 END) AS n_xy
  FROM base b JOIN tx ON tx.g = b.g JOIN ty ON ty.g = b.g
  GROUP BY b.g
)
SELECT g AS o_orderpriority,
       CAST(n AS BIGINT) AS n,
       ROUND(x_q, 6) AS x_q, ROUND(y_q, 6) AS y_q,
       CAST(n_x AS BIGINT) AS n_x, CAST(n_y AS BIGINT) AS n_y,
       CAST(n_xy AS BIGINT) AS n_xy,
       ROUND(CAST(n_xy AS DOUBLE) / n_x, 6) AS lambda_u,
       ROUND((CAST(n_xy AS DOUBLE) / n_x)
             / (CAST(n_y AS DOUBLE) / n), 6) AS lift
FROM agg
ORDER BY o_orderpriority
"""

EXT11_QUERIES.update({"x265_tail_dependence": q_x265_tail_dependence})
EXT11_ORACLES.update({"x265_tail_dependence": SQL_X265})


# ----------------------------- x266: PACF AR-order diagnosis


def q_x266_pacf(spark, sf_dir):
    """Lag 1-3 partial autocorrelations of the daily mean event value
    per type (operators/temporal.py:pacf_profile) — where does the
    memory stop: the AR-order license check behind x236's AR(1)
    assumption."""
    from .operators.temporal import pacf_profile

    ev = _read_events(spark, sf_dir)
    day = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("ts_us div 86400000000").cast("long").alias("day"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("x")
        )
    )
    return pacf_profile(day, ["event_type"], "day", "x").orderBy(
        "event_type"
    )


SQL_X266 = """
WITH day AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mu
  FROM day GROUP BY 1
),
lagged AS (
  SELECT d.event_type, m.n, d.x - m.mu AS c,
         CASE WHEN d.day - LAG(d.day, 1) OVER w = 1
              THEN LAG(d.x, 1) OVER w - m.mu END AS c1,
         CASE WHEN d.day - LAG(d.day, 2) OVER w = 2
              THEN LAG(d.x, 2) OVER w - m.mu END AS c2,
         CASE WHEN d.day - LAG(d.day, 3) OVER w = 3
              THEN LAG(d.x, 3) OVER w - m.mu END AS c3
  FROM day d JOIN m ON m.event_type = d.event_type
  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)
),
agg AS (
  SELECT event_type, ANY_VALUE(n) AS n,
         CAST(SUM(CAST(c * c AS DECIMAL(38,12))) AS DOUBLE) AS s0,
         CAST(SUM(CAST(c * c1 AS DECIMAL(38,12))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c * c2 AS DECIMAL(38,12))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(c * c3 AS DECIMAL(38,12))) AS DOUBLE) AS s3
  FROM lagged GROUP BY 1
),
r AS (
  SELECT event_type, n,
         s1 / s0 AS r1, s2 / s0 AS r2, s3 / s0 AS r3
  FROM agg
),
p AS (
  SELECT event_type, n, r1, r2, r3,
         r1 AS p11,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
  FROM r
),
p2 AS (
  SELECT *, p11 - p22 * p11 AS p21 FROM p
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(r1, 6) AS r1, ROUND(r2, 6) AS r2, ROUND(r3, 6) AS r3,
       ROUND(p11, 6) AS pacf1,
       ROUND(p22, 6) AS pacf2,
       ROUND((r3 - p21 * r2 - p22 * r1)
             / (1.0 - p21 * r1 - p22 * r2), 6) AS pacf3
FROM p2
ORDER BY event_type
"""

EXT11_QUERIES.update({"x266_pacf": q_x266_pacf})
EXT11_ORACLES.update({"x266_pacf": SQL_X266})


# ----------------------------- x267: Holm FWER step-down


def q_x267_holm(spark, sf_dir):
    """Holm step-down over the same 24 hour-of-day Mann-Whitney
    tests as x195 (operators/quality.py:holm_bonferroni) — the
    familywise-error gate for ship/no-ship decisions, beside BH's
    screening-rate gate; identical p family, stricter guarantee."""
    from .operators.quality import holm_bonferroni, normal_p_two_sided
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
    mw = mann_whitney_u(
        ev, "value", "event_type", "purchase", "click",
        partition_cols=("hr",),
    )
    tests = mw.select(
        "hr", normal_p_two_sided(F.col("z")).alias("p")
    ).where(F.col("p").isNotNull())
    return holm_bonferroni(tests, "p", ("hr",), alpha=0.05)


def _sql_x267() -> str:
    from .queries_ext8 import SQL_X195

    s = SQL_X195
    old_step = "p * m::DOUBLE / rank::DOUBLE AS s"
    new_step = "p * (m - rank + 1)::DOUBLE AS s"
    assert old_step in s
    s = s.replace(old_step, new_step)
    old_adj = """LEAST(1.0, MIN(s) OVER (ORDER BY rank DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS pa"""
    new_adj = """LEAST(1.0, MAX(s) OVER (ORDER BY rank ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS pa"""
    assert old_adj in s
    s = s.replace(old_adj, new_adj)
    assert "pa <= 0.05 AS significant" in s
    s = s.replace("pa <= 0.05 AS significant", "pa < 0.05 AS significant")
    return s


EXT11_QUERIES.update({"x267_holm": q_x267_holm})
EXT11_ORACLES.update({"x267_holm": _sql_x267()})


# ----------------------------- x268: segmented (broken-stick) trend


def q_x268_segmented_trend(spark, sf_dir):
    """Where did the daily mean-value trend BEND per event type
    (operators/temporal.py:segmented_trend) — exhaustive one-knot
    broken-stick search from a single cumulative-moment pass; the
    slope-change complement to x163's level changepoint."""
    from .operators.temporal import segmented_trend

    ev = _read_events(spark, sf_dir)
    day = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("ts_us div 86400000000").cast("long").alias("day"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("x")
        )
    )
    return segmented_trend(day, ["event_type"], "day", "x").orderBy(
        "event_type"
    )


SQL_X268 = """
WITH day AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS t,
         CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pre AS (
  SELECT event_type, t,
         COUNT(*) OVER w AS cn,
         CAST(SUM(t) OVER w AS DOUBLE) AS ct,
         CAST(SUM(CAST(x AS DECIMAL(28,6))) OVER w AS DOUBLE) AS cy,
         CAST(SUM(t * t) OVER w AS DOUBLE) AS ctt,
         CAST(SUM(CAST(t * x AS DECIMAL(28,6))) OVER w AS DOUBLE) AS cty,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) OVER w AS DOUBLE) AS cyy
  FROM day
  WINDOW w AS (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (
  SELECT event_type, COUNT(*) AS tn,
         CAST(SUM(t) AS DOUBLE) AS tt,
         CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS ty,
         CAST(SUM(t * t) AS DOUBLE) AS ttt,
         CAST(SUM(CAST(t * x AS DECIMAL(28,6))) AS DOUBLE) AS tty,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS tyy
  FROM day GROUP BY 1
),
scored AS (
  SELECT p.event_type, p.t AS knot, p.cn AS n_left,
         o.tn - p.cn AS n_right,
         ROUND((p.cty - p.ct * p.cy / p.cn)
               / (p.ctt - p.ct * p.ct / p.cn), 6) AS slope_left,
         ROUND(((o.tty - p.cty) - (o.tt - p.ct) * (o.ty - p.cy)
                / (o.tn - p.cn))
               / ((o.ttt - p.ctt) - (o.tt - p.ct) * (o.tt - p.ct)
                  / (o.tn - p.cn)), 6) AS slope_right,
         ROUND(
           ((p.cyy - p.cy * p.cy / p.cn)
            - (p.cty - p.ct * p.cy / p.cn) * (p.cty - p.ct * p.cy / p.cn)
              / (p.ctt - p.ct * p.ct / p.cn))
           + (((o.tyy - p.cyy) - (o.ty - p.cy) * (o.ty - p.cy)
               / (o.tn - p.cn))
              - ((o.tty - p.cty) - (o.tt - p.ct) * (o.ty - p.cy)
                 / (o.tn - p.cn))
                * ((o.tty - p.cty) - (o.tt - p.ct) * (o.ty - p.cy)
                   / (o.tn - p.cn))
                / ((o.ttt - p.ctt) - (o.tt - p.ct) * (o.tt - p.ct)
                   / (o.tn - p.cn))), 6) AS sse_split,
         o.tn, o.tt, o.ty, o.ttt, o.tty, o.tyy
  FROM pre p JOIN tot o ON o.event_type = p.event_type
  WHERE p.cn >= 3 AND o.tn - p.cn >= 3
),
best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY sse_split ASC, knot ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT event_type,
       CAST(knot AS BIGINT) AS knot,
       CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       slope_left, slope_right,
       ROUND((tyy - ty * ty / tn)
             - (tty - tt * ty / tn) * (tty - tt * ty / tn)
               / (ttt - tt * tt / tn), 6) AS sse_single,
       sse_split,
       ROUND(1.0 - sse_split
             / ROUND((tyy - ty * ty / tn)
                     - (tty - tt * ty / tn) * (tty - tt * ty / tn)
                       / (ttt - tt * tt / tn), 6), 6) AS improvement
FROM best
ORDER BY event_type
"""

EXT11_QUERIES.update({"x268_segmented_trend": q_x268_segmented_trend})
EXT11_ORACLES.update({"x268_segmented_trend": SQL_X268})


# ----------------------------- x269: bounded-horizon hitting prob


def q_x269_hitting_prob(spark, sf_dir):
    """Conversion-within-5-actions probability per current state
    (operators/behavior.py:hitting_probability) under the empirical
    transition matrix — the planning question the fixed-path funnel
    (x31) doesn't answer."""
    from .operators.behavior import hitting_probability

    ev = _read_events(spark, sf_dir)
    return hitting_probability(
        ev, "user_id", "event_type", "ts_us", "event_id",
        target="purchase", horizon=5,
    ).orderBy("state")


def _sql_x269() -> str:
    base = """
WITH trans AS (
  SELECT event_type AS t2,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS t1
  FROM events
),
counts AS (
  SELECT t1, t2, COUNT(*) AS n FROM trans WHERE t1 IS NOT NULL
  GROUP BY 1, 2
),
totals AS (SELECT t1, SUM(n) AS tot FROM counts GROUP BY 1),
p AS (
  SELECT c.t1, c.t2, CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
  FROM counts c JOIN totals t ON t.t1 = c.t1
),
states AS (SELECT DISTINCT t1 AS state FROM p),
h0 AS (
  SELECT s.state, ROUND(COALESCE(d.p, 0.0), 12) AS h
  FROM states s
  LEFT JOIN (SELECT t1, p FROM p WHERE t2 = 'purchase') d
    ON d.t1 = s.state
)"""
    steps = []
    for k in range(1, 5):
        prev = f"h{k - 1}"
        steps.append(f""",
h{k} AS (
  SELECT d.state, ROUND(d.h + COALESCE(e.ex, 0.0), 12) AS h
  FROM h0 d
  LEFT JOIN (
    SELECT p.t1 AS state,
           CAST(SUM(CAST(p.p * h.h AS DECIMAL(38,18))) AS DOUBLE) AS ex
    FROM p JOIN {prev} h ON h.state = p.t2
    WHERE p.t2 <> 'purchase'
    GROUP BY 1
  ) e ON e.state = d.state
)""")
    final = """
SELECT h0.state,
       ROUND(h0.h, 6) AS p_direct,
       ROUND(CASE WHEN h0.state = 'purchase' THEN 1.0 ELSE h4.h END, 6)
         AS p_hit
FROM h0 JOIN h4 ON h4.state = h0.state
ORDER BY h0.state
"""
    return base + "".join(steps) + final


EXT11_QUERIES.update({"x269_hitting_prob": q_x269_hitting_prob})
EXT11_ORACLES.update({"x269_hitting_prob": _sql_x269()})


# ----------------------------- x270: Brier decomposition


def q_x270_brier(spark, sf_dir):
    """Murphy decomposition of a value-based conversion forecast
    (operators/quality.py:brier_decomposition): logistic score from
    each user's mean event value vs whether they purchased —
    separating miscalibration from lack of discrimination, the
    summary the x170 calibration curve doesn't give."""
    from .operators.quality import brier_decomposition

    ev = _read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
            / F.count(F.col("value"))
        ).alias("vbar"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
        ).alias("y"),
    )
    scored = per_user.select(
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("vbar") - F.lit(50.0)) / F.lit(10.0)))
        ).alias("p"),
        "y",
    )
    return brier_decomposition(scored, "p", "y", n_bins=10)


SQL_X270 = """
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE)
           / COUNT(value) AS vbar,
         MAX(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS y
  FROM events GROUP BY 1
),
scored AS (
  SELECT 1.0 / (1.0 + exp(-(vbar - 50.0) / 10.0)) AS p, y
  FROM per_user
),
base AS (
  SELECT p, y, LEAST(CAST(FLOOR(p * 10.0) AS INTEGER), 9) AS b
  FROM scored WHERE p IS NOT NULL AND y IS NOT NULL
),
bins AS (
  SELECT b, COUNT(*) AS n,
         CAST(SUM(CAST(p AS DECIMAL(38,12))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST((p - y) * (p - y) AS DECIMAL(38,12))) AS DOUBLE)
           AS sq
  FROM base GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(CAST(sy AS DECIMAL(38,12))) AS DOUBLE) AS ty,
         CAST(SUM(CAST(sq AS DECIMAL(38,12))) AS DOUBLE) AS tsq
  FROM bins
),
terms AS (
  SELECT t.n, t.ty, t.tsq,
    CAST(CAST(b.n AS DOUBLE)
         * (b.sp / b.n - b.sy / b.n) * (b.sp / b.n - b.sy / b.n)
         AS DECIMAL(38,12)) AS relt,
    CAST(CAST(b.n AS DOUBLE)
         * (b.sy / b.n - t.ty / t.n) * (b.sy / b.n - t.ty / t.n)
         AS DECIMAL(38,12)) AS rest
  FROM bins b CROSS JOIN tot t
),
agg AS (
  SELECT n, ty, tsq,
         CAST(SUM(relt) AS DOUBLE) AS srel,
         CAST(SUM(rest) AS DOUBLE) AS sres
  FROM terms GROUP BY 1, 2, 3
)
SELECT n,
       ROUND(ty / n, 6) AS base_rate,
       ROUND(tsq / n, 6) AS brier,
       ROUND(srel / n, 6) AS reliability,
       ROUND(sres / n, 6) AS resolution,
       ROUND((ty / n) * (1.0 - ty / n), 6) AS uncertainty,
       ROUND(tsq / n - (srel / n - sres / n
             + (ty / n) * (1.0 - ty / n)), 6) AS wbv
FROM agg
"""

EXT11_QUERIES.update({"x270_brier": q_x270_brier})
EXT11_ORACLES.update({"x270_brier": SQL_X270})


# ----------------------------- x271: inverse-variance meta-analysis


def q_x271_meta_analysis(spark, sf_dir):
    """Pooled weekday-stratum A/A effect with heterogeneity license
    (operators/behavior.py:meta_analysis): per-weekday Welch effects
    and variances reduced first (the x221 discipline), then the
    Cochran/Higgins fixed-effect pool — Q and I² say whether one
    pooled number was legitimate at all."""
    from .operators.behavior import meta_analysis
    from .operators.sketch import _hash64

    ev = _read_events(spark, sf_dir)
    arm = F.when(
        _hash64(F.col("user_id"), "ab") / F.lit(4294967296.0) < F.lit(0.5),
        "a",
    ).otherwise("b")
    v = F.col("value").cast("double")
    cells = (
        ev.where(v.isNotNull())
        .select(
            F.expr("(ts_us div 86400000000) % 7").cast("long").alias("dow"),
            arm.alias("arm"),
            v.alias("v"),
        )
        .groupBy("dow")
        .agg(
            F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).alias("na"),
            F.sum(
                F.when(F.col("arm") == "a", F.col("v"))
                .otherwise(0.0)
                .cast("decimal(28,6)")
            ).alias("sa"),
            F.sum(
                F.when(F.col("arm") == "a", F.col("v") * F.col("v"))
                .otherwise(0.0)
                .cast("decimal(38,12)")
            ).alias("ssa"),
            F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).alias("nb"),
            F.sum(
                F.when(F.col("arm") == "b", F.col("v"))
                .otherwise(0.0)
                .cast("decimal(28,6)")
            ).alias("sb"),
            F.sum(
                F.when(F.col("arm") == "b", F.col("v") * F.col("v"))
                .otherwise(0.0)
                .cast("decimal(38,12)")
            ).alias("ssb"),
        )
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    csa, cssa = F.col("sa").cast("double"), F.col("ssa").cast("double")
    csb, cssb = F.col("sb").cast("double"), F.col("ssb").cast("double")
    eff = cells.select(
        "dow",
        (csa / na - csb / nb).alias("effect"),
        (
            ((cssa - csa * csa / na) / (na - F.lit(1.0))) / na
            + ((cssb - csb * csb / nb) / (nb - F.lit(1.0))) / nb
        ).alias("var"),
    )
    return meta_analysis(eff, "effect", "var", ["dow"])


def _sql_x271() -> str:
    from .queries_ext9 import _normal_sf_sql

    wh = (
        "(exp(ln(q / df2) / 3.0) - (1.0 - 2.0 / (9.0 * df2)))"
        " / sqrt(2.0 / (9.0 * df2))"
    )
    return f"""
WITH cells AS (
  SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
         SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS na,
         SUM(CAST(CASE WHEN arm = 'a' THEN v ELSE 0.0 END
             AS DECIMAL(28,6))) AS sa,
         SUM(CAST(CASE WHEN arm = 'a' THEN v * v ELSE 0.0 END
             AS DECIMAL(38,12))) AS ssa,
         SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS nb,
         SUM(CAST(CASE WHEN arm = 'b' THEN v ELSE 0.0 END
             AS DECIMAL(28,6))) AS sb,
         SUM(CAST(CASE WHEN arm = 'b' THEN v * v ELSE 0.0 END
             AS DECIMAL(38,12))) AS ssb
  FROM (
    SELECT ts,
           CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                      1, 8))::BIGINT / 4294967296.0 < 0.5
                THEN 'a' ELSE 'b' END AS arm,
           CAST(value AS DOUBLE) AS v
    FROM events WHERE value IS NOT NULL
  ) GROUP BY 1
),
eff AS (
  SELECT dow,
         CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
           - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS effect,
         ((CAST(ssa AS DOUBLE)
           - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
          / (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE)
         + ((CAST(ssb AS DOUBLE)
             - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
            / (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE) AS var
  FROM cells
),
base AS (
  SELECT effect AS e, 1.0 / var AS w FROM eff
  WHERE effect IS NOT NULL AND var IS NOT NULL AND var > 0
),
tot AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(CAST(w AS DECIMAL(38,12))) AS DOUBLE) AS sw,
         CAST(SUM(CAST(w * e AS DECIMAL(38,12))) AS DOUBLE) AS swe
  FROM base
),
qq AS (
  SELECT t.k, t.sw, t.swe,
         CAST(SUM(CAST(b.w * (b.e - t.swe / t.sw) * (b.e - t.swe / t.sw)
              AS DECIMAL(38,12))) AS DOUBLE) AS q
  FROM base b CROSS JOIN tot t GROUP BY 1, 2, 3
),
fin AS (
  SELECT k, sw, swe, q, CAST(k - 1 AS DOUBLE) AS df2 FROM qq
)
SELECT CAST(k AS BIGINT) AS k,
       ROUND(swe / sw, 6) AS theta,
       ROUND(sqrt(1.0 / sw), 6) AS se,
       ROUND((swe / sw) / sqrt(1.0 / sw), 6) AS z,
       ROUND(q, 6) AS q_stat,
       CAST(k - 1 AS BIGINT) AS df,
       ROUND(CASE WHEN k > 1 AND q > 0
                  THEN GREATEST(0.0, (q - df2) / q) ELSE 0.0 END, 6) AS i2,
       ROUND(CASE WHEN k <= 1 THEN NULL
                  WHEN q <= 0 THEN 1.0
                  ELSE {_normal_sf_sql(wh)} END, 6) AS p_homogeneity
FROM fin
"""


EXT11_QUERIES.update({"x271_meta_analysis": q_x271_meta_analysis})
EXT11_ORACLES.update({"x271_meta_analysis": _sql_x271()})


# ----------------------------- x272: operating-point selection


def q_x272_threshold_sweep(spark, sf_dir):
    """Deployment-threshold pick for the x270 conversion forecast
    (operators/quality.py:threshold_sweep) — Youden-J and F1-optimal
    operating points from one bounded-grid cumulative sweep; AUC
    ranks, this one ships."""
    from .operators.quality import threshold_sweep

    ev = _read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
            / F.count(F.col("value"))
        ).alias("vbar"),
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 2,
            1.0,
        )
        .otherwise(0.0)
        .alias("y"),
    )
    scored = per_user.select(
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("vbar") - F.lit(50.0)) / F.lit(10.0)))
        ).alias("p"),
        "y",
    )
    return threshold_sweep(scored, "p", "y", grid_decimals=3)


SQL_X272 = """
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE)
           / COUNT(value) AS vbar,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 2 THEN 1.0 ELSE 0.0 END AS y
  FROM events GROUP BY 1
),
scored AS (
  SELECT ROUND(1.0 / (1.0 + exp(-(vbar - 50.0) / 10.0)), 3) AS t, y
  FROM per_user
),
cells AS (
  SELECT t,
         SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS pos,
         SUM(CASE WHEN y > 0 THEN 0 ELSE 1 END) AS neg
  FROM scored GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(neg) AS BIGINT) AS n
  FROM cells
),
cum AS (
  SELECT t,
         CAST(SUM(pos) OVER w AS BIGINT) AS tp,
         CAST(SUM(neg) OVER w AS BIGINT) AS fp
  FROM cells
  WINDOW w AS (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
scoredrows AS (
  SELECT c.t, c.tp, c.fp,
         CAST(o.p - c.tp AS BIGINT) AS fn,
         CAST(o.n - c.fp AS BIGINT) AS tn,
         ROUND(c.tp / CAST(o.p AS DOUBLE), 6) AS tpr,
         ROUND(c.fp / CAST(o.n AS DOUBLE), 6) AS fpr,
         ROUND(CAST(c.tp AS DOUBLE) / CAST(c.tp + c.fp AS DOUBLE), 6)
           AS precision,
         ROUND(2.0 * CAST(c.tp AS DOUBLE)
               / CAST(2.0 * c.tp + c.fp + o.p - c.tp AS DOUBLE), 6) AS f1,
         ROUND(c.tp / CAST(o.p AS DOUBLE) - c.fp / CAST(o.n AS DOUBLE), 6)
           AS j
  FROM cum c CROSS JOIN tot o
)
SELECT 'youden' AS criterion, t AS threshold, tp, fp, fn, tn,
       tpr, fpr, precision, f1, j
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY j DESC, t ASC) AS rn
      FROM scoredrows) WHERE rn = 1
UNION ALL
SELECT 'f1' AS criterion, t AS threshold, tp, fp, fn, tn,
       tpr, fpr, precision, f1, j
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY f1 DESC, t ASC) AS rn
      FROM scoredrows) WHERE rn = 1
"""

EXT11_QUERIES.update({"x272_threshold_sweep": q_x272_threshold_sweep})
EXT11_ORACLES.update({"x272_threshold_sweep": SQL_X272})


# ----------------------------- x273: Schnabel multi-list census


def q_x273_schnabel(spark, sf_dir):
    """All-sources Schnabel census of the passage population
    (operators/dedup.py:schnabel_estimate over 30-char shingles) —
    the k-list generalization of x258 that uses every recapture, not
    one pair at a time."""
    from .operators.dedup import schnabel_estimate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return schnabel_estimate(
        docs, "text", "doc_id", "source", shingle_n=30
    )


SQL_X273 = """
WITH docs AS (
  SELECT source AS src,
         trim(regexp_replace(lower(text), '\\\\s+', ' ', 'g')) AS t
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
units AS (
  SELECT DISTINCT d.src, md5(substr(d.t, CAST(i.i AS INTEGER), 30)) AS fp
  FROM docs d,
       LATERAL (SELECT unnest(range(1, greatest(length(d.t) - 29, 0) + 1))
                AS i) i
  WHERE length(d.t) >= 30
),
first AS (SELECT fp, MIN(src) AS fsrc FROM units GROUP BY 1),
tagged AS (
  SELECT u.src, CASE WHEN u.src > f.fsrc THEN 1 ELSE 0 END AS recap
  FROM units u JOIN first f ON f.fp = u.fp
),
occ AS (
  SELECT src, COUNT(*) AS c, SUM(recap) AS r,
         SUM(1 - recap) AS newu
  FROM tagged GROUP BY 1
),
terms AS (
  SELECT src, c, r,
         COALESCE(SUM(newu) OVER (ORDER BY src
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS m
  FROM occ
),
agg AS (
  SELECT COUNT(*) AS k_sources,
         SUM(c) AS sumc,
         SUM(c * m) AS sum_cm,
         SUM(r) AS sum_r,
         SUM(c) - SUM(r) AS n_units_seen
  FROM terms
)
SELECT CAST(k_sources AS BIGINT) AS k_sources,
       CAST(n_units_seen AS BIGINT) AS n_units_seen,
       CAST(sum_cm AS BIGINT) AS sum_cm,
       CAST(sum_r AS BIGINT) AS sum_r,
       ROUND(CAST(sum_cm AS DOUBLE) / CAST(sum_r AS DOUBLE), 6) AS n_hat,
       ROUND(CAST(n_units_seen AS DOUBLE)
             / (CAST(sum_cm AS DOUBLE) / CAST(sum_r AS DOUBLE)), 6)
         AS coverage
FROM agg
"""

EXT11_QUERIES.update({"x273_schnabel": q_x273_schnabel})
EXT11_ORACLES.update({"x273_schnabel": SQL_X273})


# ----------------------------- x274: TextTiling topic boundaries


def q_x274_text_tiling(spark, sf_dir):
    """Vocabulary-shift chunk boundaries per document
    (operators/text.py:text_tiling_boundaries): 20-token blocks,
    adjacent-block cosine, boundaries where cohesion drops a full
    standard deviation below the doc mean — where retrieval chunks
    SHOULD be cut, vs x27's fixed-size cuts."""
    from .operators.text import text_tiling_boundaries

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_tiling_boundaries(
        docs, "text", "doc_id", block_tokens=20, z_cut=1.0
    )


SQL_X274 = """
WITH toks AS (
  SELECT doc_id, (i - 1) // 20 AS block, tk[CAST(i AS INTEGER)] AS w
  FROM (
    SELECT doc_id,
           list_filter(string_split(
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
             t -> t <> '') AS tk
    FROM documents
  ), LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) i
),
tc AS (
  SELECT doc_id, block, w, COUNT(*) AS c FROM toks GROUP BY 1, 2, 3
),
norms AS (
  SELECT doc_id, block, SUM(c * c) AS n2 FROM tc GROUP BY 1, 2
),
dots AS (
  SELECT a.doc_id, a.block + 1 AS gap, SUM(a.c * b.c) AS dot
  FROM tc a JOIN tc b
    ON a.doc_id = b.doc_id AND a.w = b.w AND b.block = a.block + 1
  GROUP BY 1, 2
),
scored AS (
  SELECT l.doc_id, l.gap,
         ROUND(CAST(COALESCE(d.dot, 0) AS DOUBLE)
               / (sqrt(CAST(l.n2l AS DOUBLE)) * sqrt(CAST(r.n2 AS DOUBLE))),
               6) AS cos_sim
  FROM (SELECT doc_id, block + 1 AS gap, n2 AS n2l FROM norms) l
  JOIN norms r ON r.doc_id = l.doc_id AND r.block = l.gap
  LEFT JOIN dots d ON d.doc_id = l.doc_id AND d.gap = l.gap
),
stats AS (
  SELECT doc_id, gap, cos_sim,
         COUNT(*) OVER wd AS k,
         CAST(SUM(CAST(cos_sim AS DECIMAL(28,6))) OVER wd AS DOUBLE)
           / COUNT(*) OVER wd AS mu,
         CAST(SUM(CAST(cos_sim * cos_sim AS DECIMAL(38,12))) OVER wd
              AS DOUBLE) / COUNT(*) OVER wd AS m2
  FROM scored
  WINDOW wd AS (PARTITION BY doc_id)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(gap AS BIGINT) AS gap,
       cos_sim,
       ROUND((cos_sim - mu)
             / NULLIF(sqrt(GREATEST(m2 - mu * mu, 0.0)), 0.0), 6) AS z,
       (cos_sim - mu)
         / NULLIF(sqrt(GREATEST(m2 - mu * mu, 0.0)), 0.0) < -1.0
         AS is_boundary
FROM stats WHERE k >= 2
"""

EXT11_QUERIES.update({"x274_text_tiling": q_x274_text_tiling})
EXT11_ORACLES.update({"x274_text_tiling": SQL_X274})


# ----------------------------- x275: trend/seasonal strength


def q_x275_strength(spark, sf_dir):
    """Per-region trend and seasonal strength of monthly revenue
    (operators/temporal.py:decomposition_strength over the x186
    decomposition) — the two numbers that triage a million series:
    how much variance the trend and the period actually explain."""
    from .operators.temporal import (
        decomposition_strength, seasonal_decompose,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    base = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
    )
    monthly = base.groupBy(
        F.col("r_name"),
        F.trunc(F.col("o_orderdate"), "month").alias("month"),
    ).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)")).cast(
                "double"
            ),
            6,
        ).alias("rev")
    )
    dec = seasonal_decompose(monthly, "month", "rev", ("r_name",), period=12)
    return decomposition_strength(dec, ("r_name",)).orderBy("r_name")


def _sql_x275() -> str:
    from .queries_ext8 import _sql_x186

    inner = _sql_x186().strip()
    tail = "ORDER BY d.r_name, d.ts"
    assert inner.endswith(tail)
    inner = inner[: -len(tail)].strip()
    return f"""
WITH dec AS (
{inner}
),
agg AS (
  SELECT r_name, COUNT(*) AS n,
    CAST(SUM(CAST(resid AS DECIMAL(38,12))) AS DOUBLE) AS sr,
    CAST(SUM(CAST(resid * resid AS DECIMAL(38,12))) AS DOUBLE) AS qr,
    CAST(SUM(CAST(trend + resid AS DECIMAL(38,12))) AS DOUBLE) AS st,
    CAST(SUM(CAST((trend + resid) * (trend + resid) AS DECIMAL(38,12)))
         AS DOUBLE) AS qt,
    CAST(SUM(CAST(seasonal + resid AS DECIMAL(38,12))) AS DOUBLE) AS ss,
    CAST(SUM(CAST((seasonal + resid) * (seasonal + resid)
         AS DECIMAL(38,12))) AS DOUBLE) AS qs
  FROM dec
  WHERE trend IS NOT NULL AND seasonal IS NOT NULL AND resid IS NOT NULL
  GROUP BY 1
)
SELECT r_name, CAST(n AS BIGINT) AS n,
  ROUND(CASE WHEN qt / n - (st / n) * (st / n) > 0
    THEN GREATEST(0.0, 1.0 - (qr / n - (sr / n) * (sr / n))
                        / (qt / n - (st / n) * (st / n))) END, 6)
    AS trend_strength,
  ROUND(CASE WHEN qs / n - (ss / n) * (ss / n) > 0
    THEN GREATEST(0.0, 1.0 - (qr / n - (sr / n) * (sr / n))
                        / (qs / n - (ss / n) * (ss / n))) END, 6)
    AS seasonal_strength
FROM agg
ORDER BY r_name
"""


EXT11_QUERIES.update({"x275_strength": q_x275_strength})
EXT11_ORACLES.update({"x275_strength": _sql_x275()})


# ----------------------------- x276: circular block bootstrap


def q_x276_block_bootstrap(spark, sf_dir):
    """Autocorrelation-honest SE of the daily mean value per event
    type (operators/temporal.py:block_bootstrap_se): 200 derandomized
    circular length-7-block replicates; inflation = se_block/se_iid
    is the effective-sample deflation x192's iid bootstrap misses."""
    from .operators.temporal import block_bootstrap_se

    ev = _read_events(spark, sf_dir)
    day = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("ts_us div 86400000000").cast("long").alias("day"),
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("x")
        )
    )
    return block_bootstrap_se(
        day, ["event_type"], "day", "x", block_len=7, n_boot=200
    ).orderBy("event_type")


SQL_X276 = """
WITH day AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE)
               / COUNT(*), 6) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
arr AS (
  SELECT event_type,
         list(x ORDER BY day) AS v,
         COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM day GROUP BY 1 HAVING COUNT(*) >= 14
),
grid AS (
  SELECT a.event_type, a.v, a.n, a.sy, a.syy, b.b, j.j,
         CAST(CEIL(a.n / 7.0) AS INTEGER) AS nb
  FROM arr a
  CROSS JOIN (SELECT unnest(range(200)) AS b) b,
  LATERAL (SELECT unnest(range(CAST(CEIL(a.n / 7.0) AS INTEGER))) AS j) j
),
blocks AS (
  SELECT event_type, n, sy, syy, b,
    CAST(list_reduce(list_transform(
      range(0, CASE WHEN j < nb - 1 THEN 7 ELSE n - (nb - 1) * 7 END),
      i -> v[CAST((((('0x' || substr(md5('bb:' || event_type || ':'
                || CAST(b AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8))
                ::BIGINT % n) + i) % n) + 1 AS INTEGER)]),
      (acc, x) -> acc + x) AS DECIMAL(38,12)) AS bs
  FROM grid
),
reps AS (
  SELECT event_type, n, sy, syy, b,
         CAST(SUM(bs) AS DOUBLE) / CAST(n AS DOUBLE) AS m
  FROM blocks GROUP BY 1, 2, 3, 4, 5
),
boot AS (
  SELECT event_type, n, sy, syy,
         COUNT(*) AS n_boot,
         CAST(SUM(CAST(m AS DECIMAL(38,12))) AS DOUBLE) AS sm,
         CAST(SUM(CAST(m * m AS DECIMAL(38,12))) AS DOUBLE) AS smm
  FROM reps GROUP BY 1, 2, 3, 4
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(n_boot AS BIGINT) AS n_boot,
       ROUND(sy / CAST(n AS DOUBLE), 6) AS mean,
       ROUND(sqrt(GREATEST((smm - sm * sm / n_boot)
             / CAST(n_boot - 1 AS DOUBLE), 0.0)), 6) AS se_block,
       ROUND(sqrt(GREATEST((syy - sy * sy / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0), 0.0) / CAST(n AS DOUBLE)), 6)
         AS se_iid,
       ROUND(sqrt(GREATEST((smm - sm * sm / n_boot)
             / CAST(n_boot - 1 AS DOUBLE), 0.0))
             / sqrt(GREATEST((syy - sy * sy / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0), 0.0) / CAST(n AS DOUBLE)), 6)
         AS inflation
FROM boot
ORDER BY event_type
"""

EXT11_QUERIES.update({"x276_block_bootstrap": q_x276_block_bootstrap})
EXT11_ORACLES.update({"x276_block_bootstrap": SQL_X276})


# ----------------------------- x277: Yuen trimmed-mean A/B


def q_x277_yuen(spark, sf_dir):
    """Robust A/A readout on per-user mean value
    (operators/behavior.py:yuen_trimmed_test, 10% trim): trimmed
    means with winsorized variances — the heavy-tail-proof companion
    to the raw Welch test (x237)."""
    from .operators.behavior import yuen_trimmed_test
    from .operators.sketch import _hash64

    ev = _read_events(spark, sf_dir)
    per_user = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("y")
        )
        .select(
            F.when(
                _hash64(F.col("user_id"), "ab") / F.lit(4294967296.0)
                < F.lit(0.5),
                "a",
            )
            .otherwise("b")
            .alias("arm"),
            "y",
        )
    )
    return yuen_trimmed_test(per_user, "arm", "y", trim=0.1)


def _sql_x277() -> str:
    from .queries_ext9 import _normal_p_two_sided_sql

    return f"""
WITH per_user AS (
  SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 'a' ELSE 'b' END AS arm,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE)
               / COUNT(*), 6) AS v
  FROM events WHERE value IS NOT NULL GROUP BY user_id
),
ranked AS (
  SELECT arm, v,
         ROW_NUMBER() OVER (PARTITION BY arm ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY arm) AS n
  FROM per_user
),
gstage AS (
  SELECT *, CAST(FLOOR(0.1 * n) AS BIGINT) AS g FROM ranked
),
bounds AS (
  SELECT arm,
         MAX(CASE WHEN rn = g + 1 THEN v END) AS lo,
         MAX(CASE WHEN rn = n - g THEN v END) AS hi
  FROM gstage GROUP BY arm
),
per_arm AS (
  SELECT s.arm, ANY_VALUE(s.n) AS n, ANY_VALUE(s.g) AS g,
    CAST(SUM(CAST(CASE WHEN s.rn > s.g AND s.rn <= s.n - s.g
              THEN s.v END AS DECIMAL(28,6))) AS DOUBLE) AS st,
    CAST(SUM(CAST(LEAST(GREATEST(s.v, b.lo), b.hi) AS DECIMAL(28,6)))
         AS DOUBLE) AS sw,
    CAST(SUM(CAST(LEAST(GREATEST(s.v, b.lo), b.hi)
              * LEAST(GREATEST(s.v, b.lo), b.hi) AS DECIMAL(38,12)))
         AS DOUBLE) AS sww
  FROM gstage s JOIN bounds b ON b.arm = s.arm
  GROUP BY s.arm
),
flat AS (
  SELECT arm, n,
         CAST(n - 2 * g AS DOUBLE) AS h,
         st / CAST(n - 2 * g AS DOUBLE) AS mt,
         (sww - sw * sw / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
           AS sw2
  FROM per_arm
),
j AS (
  SELECT a.n AS n_a, b.n AS n_b, a.h AS ha, b.h AS hb,
         a.mt AS ma, b.mt AS mb,
         -- Yuen (1974): d = (n-1)*s2_w/(h*(h-1)); trim=0 -> Welch s2/n
         (CAST(a.n AS DOUBLE) - 1.0) * a.sw2 / (a.h * (a.h - 1.0)) AS da,
         (CAST(b.n AS DOUBLE) - 1.0) * b.sw2 / (b.h * (b.h - 1.0)) AS db
  FROM (SELECT * FROM flat WHERE arm = 'a') a
  CROSS JOIN (SELECT * FROM flat WHERE arm = 'b') b
),
fin AS (
  SELECT *, (ma - mb) / sqrt(da + db) AS traw FROM j
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(ha AS BIGINT) AS h_a, CAST(hb AS BIGINT) AS h_b,
       ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
       ROUND(ma - mb, 6) AS delta,
       ROUND(sqrt(da + db), 6) AS se,
       ROUND(traw, 6) AS t,
       ROUND((da + db) * (da + db)
             / (da * da / (ha - 1.0) + db * db / (hb - 1.0)), 6) AS df,
       ROUND({_normal_p_two_sided_sql("traw")}, 6) AS p_value
FROM fin
"""


EXT11_QUERIES.update({"x277_yuen": q_x277_yuen})
EXT11_ORACLES.update({"x277_yuen": _sql_x277()})
