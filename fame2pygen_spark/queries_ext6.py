"""Round-4 extension queries, third batch (x170+): classifier
calibration, multi-rater agreement, embedding-space anisotropy,
conformal filtering thresholds, and stratified-labeling budgets —
the model-in-the-loop QC surface of a training-data pipeline.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .queries_ext import _read_events

EXT6_QUERIES: dict = {}
EXT6_ORACLES: dict = {}


# ------------------------------ x170: classifier calibration audit


def q_x170_calibration(spark, sf_dir):
    """ECE + Brier calibration audit (operators/quality.py:
    calibration_report): treat each customer's min-max-normalized
    account balance as a pseudo-probability that the customer places
    an urgent order, and score the calibration of that 'model' per
    market segment — the audit run on quality-classifier scores
    before they drive corpus filtering."""
    from .operators.quality import calibration_report

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    mm = cust.agg(
        F.min(F.col("c_acctbal").cast("double")).alias("__lo"),
        F.max(F.col("c_acctbal").cast("double")).alias("__hi"),
    )
    urgent = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    base = (
        cust.crossJoin(F.broadcast(mm))
        .join(urgent, cust["c_custkey"] == urgent["o_custkey"], "left")
        .select(
            "c_mktsegment",
            F.try_divide(
                F.col("c_acctbal").cast("double") - F.col("__lo"),
                F.col("__hi") - F.col("__lo"),
            ).alias("score"),
            F.col("o_custkey").isNotNull().alias("lbl"),
        )
    )
    out = calibration_report(base, "score", "lbl", ("c_mktsegment",), n_bins=10)
    return out.orderBy("c_mktsegment")


SQL_X170 = """
WITH mm AS (
  SELECT MIN(c_acctbal::DOUBLE) AS lo, MAX(c_acctbal::DOUBLE) AS hi
  FROM customer
),
urgent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
b AS (
  SELECT c.c_mktsegment,
         LEAST(GREATEST((c.c_acctbal::DOUBLE - mm.lo) / (mm.hi - mm.lo),
                        0.0), 1.0) AS s,
         CASE WHEN u.o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END AS y
  FROM customer c
  CROSS JOIN mm
  LEFT JOIN urgent u ON c.c_custkey = u.o_custkey
),
binned AS (
  SELECT c_mktsegment, LEAST(CAST(FLOOR(s * 10) AS INT), 9) AS bb, s, y
  FROM b
),
bins AS (
  SELECT c_mktsegment, bb, COUNT(*)::BIGINT AS nb,
         SUM(s::DECIMAL(38,18)) AS ss,
         SUM(y::DECIMAL(38,18)) AS sy,
         SUM(((s - y) * (s - y))::DECIMAL(38,18)) AS sq
  FROM binned GROUP BY c_mktsegment, bb
),
agg AS (
  SELECT c_mktsegment, SUM(nb)::BIGINT AS n,
         COUNT(*)::BIGINT AS n_bins_used,
         SUM(sq) AS tsq,
         SUM((nb::DOUBLE * ABS(ss::DOUBLE / nb::DOUBLE
                               - sy::DOUBLE / nb::DOUBLE))::DECIMAL(38,18))
           AS te
  FROM bins GROUP BY c_mktsegment
)
SELECT c_mktsegment, n, n_bins_used,
       ROUND(tsq::DOUBLE / n::DOUBLE, 6) AS brier,
       ROUND(te::DOUBLE / n::DOUBLE, 6) AS ece
FROM agg ORDER BY c_mktsegment
"""


EXT6_QUERIES.update({"x170_calibration": q_x170_calibration})
EXT6_ORACLES.update({"x170_calibration": SQL_X170})


# -------------------------- x171: Krippendorff multi-rater agreement


def q_x171_krippendorff(spark, sf_dir):
    """Krippendorff's alpha (operators/quality.py:
    krippendorff_alpha): split each user's timeline into three
    position-parity thirds, take the modal event type of each third
    as an independent 'annotation' of the user's behavioral label,
    and measure chance-corrected agreement across all rater pairs —
    the multi-rater, missing-tolerant upgrade of x131's kappa (users
    with fewer than two thirds populated drop out, no alignment
    step)."""
    from .operators.quality import krippendorff_alpha

    ev = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).withColumn("rater", F.col("rn") % 3)
    counts = seq.groupBy("user_id", "rater", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wm = Window.partitionBy("user_id", "rater").orderBy(
        F.desc("c"), F.asc("event_type")
    )
    modal = (
        counts.withColumn("mr", F.row_number().over(wm))
        .where(F.col("mr") == 1)
        .select("user_id", "rater", "event_type")
    )
    return krippendorff_alpha(modal, "user_id", "rater", "event_type")


SQL_X171 = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id) AS rn
  FROM e
),
cnt AS (
  SELECT user_id, rn % 3 AS rater, event_type, COUNT(*) AS c
  FROM seq GROUP BY user_id, rn % 3, event_type
),
modal AS (
  SELECT user_id, rater, event_type FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, rater
                                 ORDER BY c DESC, event_type ASC) AS mr
    FROM cnt
  ) WHERE mr = 1
),
uc AS (
  SELECT user_id AS u, event_type AS lc, COUNT(*)::BIGINT AS n
  FROM modal GROUP BY user_id, event_type
),
m AS (SELECT u, SUM(n)::BIGINT AS mu FROM uc GROUP BY u),
dis AS (
  SELECT uc.u, uc.lc, uc.n, m.mu,
         ((uc.n * (m.mu - uc.n))::DOUBLE
          / (m.mu - 1)::DOUBLE)::DECIMAL(38,18) AS dd
  FROM uc JOIN m ON uc.u = m.u WHERE m.mu >= 2
),
marg AS (SELECT lc, SUM(n)::BIGINT AS nc FROM dis GROUP BY lc),
tot AS (
  SELECT COUNT(DISTINCT u)::BIGINT AS n_units,
         SUM(n)::BIGINT AS n_ratings, SUM(dd) AS dosum
  FROM dis
),
mt AS (
  SELECT COUNT(*)::BIGINT AS n_labels, SUM(nc * nc)::BIGINT AS sc2
  FROM marg
)
SELECT n_units, n_ratings, n_labels,
       ROUND(1.0 - ((n_ratings::DOUBLE - 1.0) * dosum::DOUBLE)
             / (n_ratings::DOUBLE * n_ratings::DOUBLE - sc2::DOUBLE),
             6) AS alpha
FROM tot, mt
"""


EXT6_QUERIES.update({"x171_krippendorff": q_x171_krippendorff})
EXT6_ORACLES.update({"x171_krippendorff": SQL_X171})


# ------------------- x172: embedding anisotropy via power iteration


def q_x172_embedding_pc(spark, sf_dir):
    """Top principal direction + anisotropy (operators/similarity.py:
    embedding_top_pc): four deterministic power-iteration supersteps
    from the normalized all-ones start, then per-label PC1 projection
    stats and the global λ₁/trace anisotropy share — the
    'all-but-the-top' audit run before cosine-threshold dedup."""
    from .operators.similarity import embedding_top_pc

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_top_pc(
        emb, "embedding", "vec_id", "label", n_iter=4
    )
    return out.orderBy("label")


def _pc_iteration_sql(i: int) -> str:
    prev = f"v{i - 1}"
    return f"""
s{i} AS (
  SELECT vec_id, SUM((c * v)::DECIMAL(38,18))::DOUBLE AS s
  FROM c JOIN {prev} USING (d) GROUP BY vec_id
),
u{i} AS (
  SELECT d, SUM((c * s)::DECIMAL(38,18))::DOUBLE AS u
  FROM c JOIN s{i} USING (vec_id) GROUP BY d
),
n{i} AS (
  SELECT sqrt(SUM((u * u)::DECIMAL(38,18))::DOUBLE) AS nm FROM u{i}
),
v{i} AS (SELECT d, u / nm AS v FROM u{i}, n{i})"""


SQL_X172 = (
    """
WITH e AS (
  SELECT vec_id, label, u.d AS d, embedding[u.d]::DOUBLE AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(d)
  WHERE embedding IS NOT NULL
),
mu AS (
  SELECT d, SUM(x::DECIMAL(38,18))::DOUBLE / COUNT(*)::DOUBLE AS mu
  FROM e GROUP BY d
),
c AS (
  SELECT e.vec_id, e.label, e.d, e.x - mu.mu AS c
  FROM e JOIN mu ON e.d = mu.d
),
k AS (SELECT COUNT(*)::DOUBLE AS k FROM mu),
v0 AS (SELECT d, 1.0 / sqrt(k) AS v FROM mu, k),"""
    + ",".join(_pc_iteration_sql(i) for i in (1, 2, 3, 4))
    + """,
proj AS (
  SELECT c.vec_id, c.label,
         SUM((c.c * v4.v)::DECIMAL(38,18))::DOUBLE AS s
  FROM c JOIN v4 USING (d) GROUP BY c.vec_id, c.label
),
tr AS (SELECT SUM((c * c)::DECIMAL(38,18))::DOUBLE AS tr FROM c),
l1 AS (SELECT SUM((s * s)::DECIMAL(38,18))::DOUBLE AS l1 FROM proj),
an AS (SELECT ROUND(l1 / tr, 6) AS anisotropy FROM l1, tr),
per AS (
  SELECT label, COUNT(*)::BIGINT AS n,
         SUM(s::DECIMAL(38,18)) AS ss,
         SUM((s * s)::DECIMAL(38,18)) AS sss
  FROM proj GROUP BY label
)
SELECT label, n,
       ROUND(ss::DOUBLE / n::DOUBLE, 6) AS mean_proj,
       ROUND(sqrt(GREATEST(sss::DOUBLE / n::DOUBLE
                           - (ss::DOUBLE / n::DOUBLE)
                             * (ss::DOUBLE / n::DOUBLE), 0.0)),
             6) AS sd_proj,
       anisotropy
FROM per, an ORDER BY label
"""
)


EXT6_QUERIES.update({"x172_embedding_pc": q_x172_embedding_pc})
EXT6_ORACLES.update({"x172_embedding_pc": SQL_X172})


# ----------------------- x173: split-conformal filtering threshold


def q_x173_conformal(spark, sf_dir):
    """Split-conformal threshold + coverage (operators/quality.py:
    conformal_threshold): per language, calibrate a document-length
    nonconformity cutoff on a deterministic hash half and audit the
    finite-sample coverage guarantee on the held-out half — how a
    corpus filter gets a cutoff with a stated miss rate instead of a
    folklore constant."""
    from .operators.quality import conformal_threshold

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        "lang", "doc_id", F.col("n_chars").cast("double").alias("score")
    )
    out = conformal_threshold(
        base, "score", "doc_id", ("lang",),
        alpha=0.1, calib_frac=0.5, salt="conformal",
    )
    return out.orderBy("lang")


SQL_X173 = """
WITH b AS (
  SELECT lang, doc_id, n_chars::DOUBLE AS s,
         (('0x' || substr(md5('conformal:' || CAST(doc_id AS VARCHAR)),
                          1, 8))::BIGINT / 4294967296.0) < 0.5 AS cal
  FROM documents WHERE n_chars IS NOT NULL
),
nc AS (
  SELECT lang, COUNT(*)::BIGINT AS n_calib,
         LEAST(CAST(CEIL((COUNT(*) + 1) * 0.9) AS BIGINT),
               COUNT(*)::BIGINT) AS k
  FROM b WHERE cal GROUP BY lang
),
ranked AS (
  SELECT lang, s,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY s ASC, doc_id ASC) AS rn
  FROM b WHERE cal
),
thr AS (
  SELECT r.lang, nc.n_calib, r.s AS thr
  FROM ranked r JOIN nc ON r.lang = nc.lang AND r.rn = nc.k
),
ev AS (
  SELECT b.lang, t.n_calib, t.thr,
         COUNT(*)::BIGINT AS n_eval,
         SUM(CASE WHEN b.s <= t.thr THEN 1 ELSE 0 END)::BIGINT AS cov
  FROM b JOIN thr t ON b.lang = t.lang
  WHERE NOT b.cal GROUP BY b.lang, t.n_calib, t.thr
)
SELECT lang, n_calib, n_eval, ROUND(thr, 6) AS threshold,
       0.9 AS target,
       ROUND(cov::DOUBLE / n_eval::DOUBLE, 6) AS coverage
FROM ev ORDER BY lang
"""


EXT6_QUERIES.update({"x173_conformal": q_x173_conformal})
EXT6_ORACLES.update({"x173_conformal": SQL_X173})


# ------------------------- x174: Neyman-optimal labeling allocation


def q_x174_neyman(spark, sf_dir):
    """Neyman allocation (operators/mixing.py: neyman_allocation):
    split a 10,000-row inspection budget across order priorities by
    N_h·σ_h of total price — the planning table that decides where
    annotation effort buys the most variance reduction, with
    proportional allocation as the baseline column."""
    from .operators.mixing import neyman_allocation

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = orders.select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("price")
    )
    out = neyman_allocation(base, "price", ("o_orderpriority",), budget=10000)
    return out.orderBy("o_orderpriority")


SQL_X174 = """
WITH per AS (
  SELECT o_orderpriority, COUNT(*)::BIGINT AS n_rows,
         SUM((o_totalprice::DOUBLE)::DECIMAL(38,18)) AS sv,
         SUM((o_totalprice::DOUBLE * o_totalprice::DOUBLE)
             ::DECIMAL(38,18)) AS svv
  FROM orders WHERE o_totalprice IS NOT NULL
  GROUP BY o_orderpriority
),
w AS (
  SELECT o_orderpriority, n_rows,
         sqrt(GREATEST(svv::DOUBLE / n_rows::DOUBLE
                       - (sv::DOUBLE / n_rows::DOUBLE)
                         * (sv::DOUBLE / n_rows::DOUBLE), 0.0)) AS sd
  FROM per
),
ww AS (SELECT *, n_rows::DOUBLE * sd AS wgt FROM w),
tot AS (
  SELECT SUM(wgt::DECIMAL(38,18)) AS tw, SUM(n_rows)::BIGINT AS tn
  FROM ww
)
SELECT o_orderpriority, n_rows, ROUND(sd, 6) AS sd,
       ROUND(wgt / tw::DOUBLE, 6) AS neyman_share,
       ROUND(wgt / tw::DOUBLE * 10000.0, 6) AS alloc_neyman,
       ROUND(n_rows::DOUBLE / tn::DOUBLE * 10000.0, 6) AS alloc_prop
FROM ww, tot ORDER BY o_orderpriority
"""


EXT6_QUERIES.update({"x174_neyman": q_x174_neyman})
EXT6_ORACLES.update({"x174_neyman": SQL_X174})


# --------------------------- x175: MMR diverse exemplar selection


def q_x175_mmr_select(spark, sf_dir):
    """Maximal Marginal Relevance (operators/similarity.py:
    mmr_select): pick 5 exemplars relevant to vector 0 but mutually
    diverse (λ=0.7) from a 50-candidate relevance heap — the
    diverse few-shot/eval-set picker.  The query vector is the
    stored embedding of vec_id 0 (1-row bounded collect, the x05c
    pinned-literal precedent)."""
    from .operators.similarity import mmr_select

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = mmr_select(
        emb.where(F.col("vec_id") != 0),
        "embedding",
        "vec_id",
        query_vec=[float(x) for x in qv],
        k=5,
        lam=0.7,
        n_candidates=50,
    )
    return out


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, 65), "
        f"i -> {a}[CAST(i AS INTEGER)] * {b}[CAST(i AS INTEGER)]), "
        f"(acc, x) -> acc + x)"
    )


def _mmr_step_sql(i: int) -> str:
    prev = f"sel{i - 1}"
    sim = f"ROUND({_dot_sql('c.cv', 's.cv')} / (c.nv * s.nv), 6)"
    return f"""
ms{i} AS (
  SELECT c.vec_id, c.rel, MAX({sim}) AS ms
  FROM cand c JOIN {prev} s ON TRUE
  WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
  GROUP BY c.vec_id, c.rel
),
p{i} AS (
  SELECT c.vec_id, c.cv, c.nv, c.rel, m.ms AS max_sim,
         ROUND(0.7 * c.rel - 0.3 * m.ms, 6) AS mmr
  FROM cand c JOIN ms{i} m ON c.vec_id = m.vec_id
  ORDER BY mmr DESC, c.vec_id ASC LIMIT 1
),
sel{i} AS (
  SELECT vec_id, cv, nv FROM {prev}
  UNION ALL SELECT vec_id, cv, nv FROM p{i}
)"""


SQL_X175 = (
    f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
),
c0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
  WHERE embedding IS NOT NULL AND vec_id <> 0
),
scored AS (
  SELECT c0.vec_id, c0.cv,
         sqrt({_dot_sql('c0.cv', 'c0.cv')}) AS nv,
         ROUND({_dot_sql('c0.cv', 'q.qv')}
               / (sqrt({_dot_sql('c0.cv', 'c0.cv')})
                  * sqrt({_dot_sql('q.qv', 'q.qv')})), 6) AS rel
  FROM c0 CROSS JOIN q
),
cand AS (
  SELECT * FROM scored ORDER BY rel DESC, vec_id ASC LIMIT 50
),
p1 AS (
  SELECT vec_id, cv, nv, rel FROM cand
  ORDER BY rel DESC, vec_id ASC LIMIT 1
),
sel1 AS (SELECT vec_id, cv, nv FROM p1),"""
    + ",".join(_mmr_step_sql(i) for i in (2, 3, 4, 5))
    + """
SELECT CAST(vec_id AS BIGINT) AS vec_id, 1::BIGINT AS rank, rel,
       CAST(NULL AS DOUBLE) AS max_sim, CAST(NULL AS DOUBLE) AS mmr
FROM p1
UNION ALL SELECT vec_id, 2, rel, max_sim, mmr FROM p2
UNION ALL SELECT vec_id, 3, rel, max_sim, mmr FROM p3
UNION ALL SELECT vec_id, 4, rel, max_sim, mmr FROM p4
UNION ALL SELECT vec_id, 5, rel, max_sim, mmr FROM p5
ORDER BY rank
"""
)


EXT6_QUERIES.update({"x175_mmr_select": q_x175_mmr_select})
EXT6_ORACLES.update({"x175_mmr_select": SQL_X175})


# ----------------------------------- x176: TextRank corpus keywords


def q_x176_textrank(spark, sf_dir):
    """TextRank keywords (operators/text.py: textrank_keywords):
    PageRank over the window-2 word co-occurrence graph of content
    terms (length >= 4), three supersteps, top-20 heap — the
    training-free keyphrase surface of the corpus."""
    from .operators.text import textrank_keywords

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textrank_keywords(
        docs, "text", "doc_id", window=2, min_len=4, n_iter=3, top_n=20
    )


def _tr_iter_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
c{i} AS (
  SELECT e.dst AS node,
         CAST({prev}.r * (CAST(e.w AS DOUBLE) / o.wout)
              AS DECIMAL(28,18)) AS c
  FROM edges e
  JOIN outw o ON e.src = o.src
  JOIN {prev} ON {prev}.node = e.src
),
s{i} AS (
  SELECT node, tp.t + 0.85 * CAST(sum(c) AS DOUBLE) AS r
  FROM c{i}, tp GROUP BY node, tp.t
),
r{i} AS (
  SELECT nodes.node, COALESCE(s{i}.r, tp.t) AS r
  FROM nodes LEFT JOIN s{i} ON nodes.node = s{i}.node, tp
)"""


SQL_X176 = (
    """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, u.p AS p, toks[u.p] AS term
  FROM t, unnest(range(1, len(toks) + 1)) AS u(p)
),
content AS (
  SELECT doc_id, term,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS rp
  FROM pos WHERE length(term) >= 4
),
raw AS (
  SELECT a.term AS src, b.term AS dst
  FROM content a JOIN content b
    ON a.doc_id = b.doc_id
   AND b.rp - a.rp BETWEEN 1 AND 2
   AND a.term <> b.term
),
sym AS (
  SELECT src, dst FROM raw
  UNION ALL SELECT dst AS src, src AS dst FROM raw
),
edges AS (
  SELECT src, dst, count(*)::BIGINT AS w FROM sym GROUP BY src, dst
),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
n AS (SELECT COUNT(*)::DOUBLE AS n_nodes FROM nodes),
tp AS (SELECT 0.15 / n_nodes AS t FROM n),
outw AS (SELECT src, SUM(w)::BIGINT AS wout FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / n_nodes AS r FROM nodes, n),"""
    + ",".join(_tr_iter_sql(i) for i in (1, 2, 3))
    + """
SELECT term, ROUND(r, 6) AS score,
       CAST(ROW_NUMBER() OVER (ORDER BY r DESC, term ASC) AS BIGINT) AS pos
FROM (SELECT node AS term, r FROM r3)
QUALIFY pos <= 20
ORDER BY pos
"""
)


EXT6_QUERIES.update({"x176_textrank": q_x176_textrank})
EXT6_ORACLES.update({"x176_textrank": SQL_X176})


# -------------------- x177: Markov stationary session distribution


def q_x177_stationary(spark, sf_dir):
    """Markov stationary distribution (operators/behavior.py:
    stationary_distribution): four π←πP supersteps over the
    empirical event-type transition chain — where sessions spend
    their long-run time, the companion ranking to x34's raw
    transition matrix."""
    from .operators.behavior import stationary_distribution

    ev = _read_events(spark, sf_dir)
    out = stationary_distribution(
        ev, user_col="user_id", type_col="event_type",
        ts_col="ts_us", id_col="event_id", n_iter=4,
    )
    return out.orderBy("pos")


def _pi_iter_sql(i: int) -> str:
    prev = f"pi{i - 1}"
    return f"""
c{i} AS (
  SELECT p.to_type AS state,
         ({prev}.prob * p.p)::DECIMAL(38,18) AS c
  FROM p JOIN {prev} ON p.from_type = {prev}.state
),
s{i} AS (SELECT state, SUM(c)::DOUBLE AS prob FROM c{i} GROUP BY state),
pi{i} AS (
  SELECT states.state, COALESCE(s{i}.prob, 0.0) AS prob
  FROM states LEFT JOIN s{i} ON states.state = s{i}.state
)"""


SQL_X177 = (
    """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
seq AS (
  SELECT user_id, event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS from_type
  FROM e
),
trans AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM seq WHERE from_type IS NOT NULL GROUP BY from_type, to_type
),
states AS (SELECT DISTINCT from_type AS state FROM trans),
kept AS (
  SELECT t.* FROM trans t JOIN states s ON t.to_type = s.state
),
tot AS (
  SELECT from_type, SUM(n)::BIGINT AS tot FROM kept GROUP BY from_type
),
p AS (
  SELECT k.from_type, k.to_type, k.n::DOUBLE / tot.tot::DOUBLE AS p
  FROM kept k JOIN tot ON k.from_type = tot.from_type
),
ns AS (SELECT COUNT(*)::DOUBLE AS ns FROM states),
pi0 AS (SELECT state, 1.0 / ns AS prob FROM states, ns),"""
    + ",".join(_pi_iter_sql(i) for i in (1, 2, 3, 4))
    + """
SELECT state AS event_type, ROUND(prob, 6) AS stationary,
       CAST(ROW_NUMBER() OVER (ORDER BY prob DESC, state ASC) AS BIGINT)
         AS pos
FROM pi4 ORDER BY pos
"""
)


EXT6_QUERIES.update({"x177_stationary": q_x177_stationary})
EXT6_ORACLES.update({"x177_stationary": SQL_X177})


# --------------------------- x178: train/held-out memorization audit


def q_x178_memorization(spark, sf_dir):
    """Held-out 8-gram memorization audit (operators/text.py:
    memorization_audit): hash-split 90/10, build the train-side
    distinct gram set, and report per source how novel the held-out
    docs actually are — the Lee-2022 overlap gate on eval
    contamination by memorization."""
    from .operators.text import memorization_audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = memorization_audit(
        docs, "text", "doc_id", ("source",),
        n=8, train_frac=0.9, salt="memsplit",
    )
    return out.orderBy("source")


SQL_X178 = """
WITH t AS (
  SELECT doc_id, source,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT DISTINCT source, doc_id,
         array_to_string(toks[i : i + 7], ' ') AS gg
  FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
  WHERE len(toks) >= 8
),
m AS (
  SELECT *,
         (('0x' || substr(md5('memsplit:' || CAST(doc_id AS VARCHAR)),
                          1, 8))::BIGINT / 4294967296.0) < 0.9 AS train
  FROM g
),
tr AS (SELECT DISTINCT gg FROM m WHERE train),
te AS (SELECT * FROM m WHERE NOT train),
pd AS (
  SELECT te.source, te.doc_id, COUNT(*)::BIGINT AS ng,
         COUNT(tr.gg)::BIGINT AS seen
  FROM te LEFT JOIN tr ON te.gg = tr.gg
  GROUP BY te.source, te.doc_id
),
agg AS (
  SELECT source, COUNT(*)::BIGINT AS n_test_docs,
         SUM((1.0 - seen::DOUBLE / ng::DOUBLE)::DECIMAL(38,18)) AS sn,
         SUM(CASE WHEN seen = ng THEN 1 ELSE 0 END)::BIGINT AS mem
  FROM pd GROUP BY source
)
SELECT source, n_test_docs,
       ROUND(sn::DOUBLE / n_test_docs::DOUBLE, 6) AS mean_novelty,
       ROUND(mem::DOUBLE / n_test_docs::DOUBLE, 6) AS memorized_share
FROM agg ORDER BY source
"""


EXT6_QUERIES.update({"x178_memorization": q_x178_memorization})
EXT6_ORACLES.update({"x178_memorization": SQL_X178})


# ------------------- x179: temperature-based multilingual sampling


def q_x179_temperature(spark, sf_dir):
    """Temperature sampling shares (operators/mixing.py:
    temperature_mixture): per-language token masses tempered at
    α=0.3 against a 1M-token budget — the XLM-R rebalance table,
    with the epochs column flagging languages the budget forces to
    repeat."""
    from .operators.mixing import temperature_mixture
    from .operators.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        "lang", token_count(F.col("text")).alias("n_tokens")
    )
    out = temperature_mixture(
        base, "n_tokens", ("lang",), alpha=0.3, token_budget=1000000
    )
    return out.orderBy("lang")


SQL_X179 = """
WITH d AS (
  SELECT lang,
         len(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '')) AS nt
  FROM documents
),
per AS (
  SELECT lang, SUM((nt::DOUBLE)::DECIMAL(38,9))::DOUBLE AS w
  FROM d WHERE nt IS NOT NULL GROUP BY lang
),
pw AS (
  SELECT lang, w, exp(0.3 * ln(w)) AS wa FROM per WHERE w > 0
),
tot AS (
  SELECT SUM(w::DECIMAL(38,18)) AS tw, SUM(wa::DECIMAL(38,18)) AS twa
  FROM pw
)
SELECT lang, CAST(w AS BIGINT) AS tokens,
       ROUND(w / tw::DOUBLE, 6) AS natural_share,
       ROUND(wa / twa::DOUBLE, 6) AS sampled_share,
       ROUND(wa / twa::DOUBLE * 1000000.0, 6) AS sampled_tokens,
       ROUND(wa / twa::DOUBLE * 1000000.0 / w, 6) AS epochs
FROM pw, tot ORDER BY lang
"""


EXT6_QUERIES.update({"x179_temperature": q_x179_temperature})
EXT6_ORACLES.update({"x179_temperature": SQL_X179})
