"""Round-4 extension queries, sixth batch (x210+): Page-Hinkley
sequential drift detection, ranked-retrieval evaluation (MAP / MRR /
NDCG) for the ANN stack, and the multi-dimension drift dashboard.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_ext import _X58_CUTOFF_US, _read_events

EXT9_QUERIES: dict = {}
EXT9_ORACLES: dict = {}


# ----------------------------- x210: Page-Hinkley drift detector


_X210_DELTA = 1.0
_X210_LAM = 8.0


def q_x210_page_hinkley(spark, sf_dir):
    """Sequential mean-shift monitoring (operators/temporal.py:
    page_hinkley) on the per-day mean event value per event type —
    the online complement to the retrospective CUSUM scan (x65): PH
    answers "has this metric drifted up, and on which day did the
    alarm first fire?"."""
    from .operators.temporal import page_hinkley

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
    out = page_hinkley(
        day, "event_type", "day", "x", delta=_X210_DELTA, lam=_X210_LAM
    )
    return out.orderBy("event_type")


SQL_X210 = f"""
WITH day AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
seq AS (
  SELECT event_type, day, x,
         ROW_NUMBER() OVER w AS i,
         SUM(CAST(x AS DECIMAL(38,18))) OVER w AS cumx
  FROM day
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
dev AS (
  SELECT event_type, day,
         x - CAST(cumx AS DOUBLE) / i - {_X210_DELTA!r} AS d
  FROM seq
),
m AS (
  SELECT event_type, day,
         SUM(CAST(d AS DECIMAL(38,18))) OVER w AS mt
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ph AS (
  SELECT event_type, day,
         ROUND(CAST(mt - MIN(mt) OVER w AS DOUBLE), 6) AS ph
  FROM m
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MAX(ph), 6) AS ph_max,
       MAX(CASE WHEN ph > {_X210_LAM!r} THEN 1 ELSE 0 END) = 1 AS alarmed,
       MIN(CASE WHEN ph > {_X210_LAM!r} THEN day END) AS alarm_at
FROM ph
GROUP BY event_type
ORDER BY event_type
"""

EXT9_QUERIES.update({"x210_page_hinkley": q_x210_page_hinkley})
EXT9_ORACLES.update({"x210_page_hinkley": SQL_X210})


# ----------------------------- x211: ranked-retrieval evaluation


def q_x211_retrieval_eval(spark, sf_dir):
    """MAP / MRR / NDCG@10 for the exact cosine ranker
    (operators/similarity.py:retrieval_eval over cosine_topk):
    queries are vec_id < 20, ground truth is same-label membership —
    the regression gate an ANN index change (nbits, nlist, k) is
    scored against before it ships."""
    from .operators.similarity import cosine_topk, retrieval_eval

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("__ql"),
    )
    ranked = cosine_topk(
        emb, queries.select("query_id", "query_vec"), k=10
    )
    rel = (
        queries.select("query_id", "__ql")
        .join(
            emb.select(
                F.col("vec_id").alias("item_id"), F.col("label").alias("__cl")
            ),
            F.col("__ql") == F.col("__cl"),
        )
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id")
    )
    out = retrieval_eval(ranked, rel, k=10)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        "n_rel",
        "hits",
        "precision",
        "recall",
        "rr",
        "ap",
        "ndcg",
    ).orderBy("query_id")


SQL_X211 = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
  FROM embeddings WHERE vec_id < 20
),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label AS cl
      FROM embeddings),
scored AS (
  SELECT q.query_id, c.neighbor_id, c.cl, q.ql,
         ROUND(
           list_reduce(list_transform(range(1, 65),
                       i -> cv[CAST(i AS INTEGER)] * qv[CAST(i AS INTEGER)]),
                       (acc, x) -> acc + x)
           / (sqrt(list_reduce(list_transform(range(1, 65),
                        i -> cv[CAST(i AS INTEGER)] * cv[CAST(i AS INTEGER)]),
                        (acc, x) -> acc + x))
              * sqrt(list_reduce(list_transform(range(1, 65),
                        i -> qv[CAST(i AS INTEGER)] * qv[CAST(i AS INTEGER)]),
                        (acc, x) -> acc + x))), 6) AS score
  FROM c CROSS JOIN q
  WHERE c.neighbor_id <> q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rk
  FROM scored
),
nrel AS (
  SELECT q.query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
  FROM q JOIN c ON c.cl = q.ql AND c.neighbor_id <> q.query_id
  GROUP BY q.query_id
),
flagged AS (
  SELECT query_id, rk,
         CASE WHEN cl = ql THEN 1 ELSE 0 END AS rel
  FROM ranked WHERE rk <= 10
),
cum AS (
  SELECT query_id, rk, rel,
         SUM(rel) OVER (PARTITION BY query_id ORDER BY rk
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumrel
  FROM flagged
),
terms AS (
  SELECT query_id, rel,
         CAST(rel * (CAST(cumrel AS DOUBLE) / rk) AS DECIMAL(38,18))
           AS ap_t,
         CAST(rel / log2(CAST(rk AS DOUBLE) + 1.0) AS DECIMAL(38,18))
           AS dcg_t,
         CASE WHEN rel = 1 THEN CAST(1.0 AS DOUBLE) / rk
              ELSE CAST(0.0 AS DOUBLE) END AS rr_t
  FROM cum
),
perq AS (
  SELECT query_id,
         CAST(SUM(rel) AS BIGINT) AS hits,
         SUM(ap_t) AS ap_sum,
         SUM(dcg_t) AS dcg,
         MAX(rr_t) AS rr
  FROM terms GROUP BY query_id
)
SELECT CAST(p.query_id AS BIGINT) AS query_id,
       n.n_rel,
       p.hits,
       ROUND(p.hits / 10.0, 6) AS precision,
       ROUND(p.hits / CAST(n.n_rel AS DOUBLE), 6) AS recall,
       ROUND(p.rr, 6) AS rr,
       ROUND(CAST(p.ap_sum AS DOUBLE)
             / CAST(LEAST(n.n_rel, 10) AS DOUBLE), 6) AS ap,
       ROUND(CAST(p.dcg AS DOUBLE)
             / list_reduce(list_transform(range(1, LEAST(n.n_rel, 10) + 1),
                 i -> CAST(1.0 AS DOUBLE)
                      / log2(CAST(i AS DOUBLE) + 1.0)),
                 (acc, x) -> acc + x), 6) AS ndcg
FROM perq p JOIN nrel n USING (query_id)
ORDER BY query_id
"""

EXT9_QUERIES.update({"x211_retrieval_eval": q_x211_retrieval_eval})
EXT9_ORACLES.update({"x211_retrieval_eval": SQL_X211})


# ----------------------------- x212: multi-dimension drift dashboard


_X212_LO, _X212_HI, _X212_BINS = 0.0, 500.0, 20
_X212_W = (_X212_HI - _X212_LO) / _X212_BINS


def q_x212_drift_dashboard(spark, sf_dir):
    """Every-slice × every-metric drift panel (operators/sketch.py:
    drift_dashboard): PSI + binned KS + binned W1 between the first
    and second half of the event month, per event type and for the
    ``__all__`` roll-up — the monitoring dashboard that x58/x64/x193
    compute one cell at a time."""
    from .operators.sketch import drift_dashboard

    ev = _read_events(spark, sf_dir)
    a = ev.where(F.col("ts_us") < _X58_CUTOFF_US)
    b = ev.where(F.col("ts_us") >= _X58_CUTOFF_US)
    out = drift_dashboard(
        a, b, "event_type", "value",
        lo=_X212_LO, hi=_X212_HI, bins=_X212_BINS,
    )
    return out.orderBy("dimension")


SQL_X212 = f"""
WITH tagged AS (
  SELECT CASE WHEN epoch_us(ts) < {_X58_CUTOFF_US} THEN 0 ELSE 1 END
           AS side,
         event_type AS dim, value AS v
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
per AS (
  SELECT dim, side,
         CAST(LEAST(GREATEST(FLOOR((v - {_X212_LO!r}) / {_X212_W!r}), 0),
                    {_X212_BINS - 1}) AS BIGINT) AS bin,
         COUNT(*) AS n
  FROM tagged GROUP BY 1, 2, 3
),
counts AS (
  SELECT * FROM per
  UNION ALL
  SELECT '__all__' AS dim, side, bin, SUM(n) AS n
  FROM per GROUP BY 2, 3
),
dims AS (SELECT DISTINCT dim FROM counts),
spine AS (
  SELECT dim, unnest(range(0, {_X212_BINS})) AS bin FROM dims
),
grid AS (
  SELECT s.dim, s.bin,
         COALESCE(SUM(CASE WHEN c.side = 0 THEN c.n END), 0) AS n_a,
         COALESCE(SUM(CASE WHEN c.side = 1 THEN c.n END), 0) AS n_b
  FROM spine s LEFT JOIN counts c ON c.dim = s.dim AND c.bin = s.bin
  GROUP BY 1, 2
),
g AS (
  SELECT dim, bin, n_a, n_b,
         SUM(n_a) OVER (PARTITION BY dim) AS ta,
         SUM(n_b) OVER (PARTITION BY dim) AS tb,
         SUM(n_a) OVER wc AS ca,
         SUM(n_b) OVER wc AS cb
  FROM grid
  WINDOW wc AS (PARTITION BY dim ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
terms AS (
  SELECT dim, ta, tb,
         CAST((GREATEST(n_a / ta, 1e-6) - GREATEST(n_b / tb, 1e-6))
              * ln(GREATEST(n_a / ta, 1e-6) / GREATEST(n_b / tb, 1e-6))
              AS DECIMAL(38,18)) AS psi_t,
         ABS(ca / ta - cb / tb) AS gap,
         CAST(ABS(ca / ta - cb / tb) * {_X212_W!r} AS DECIMAL(38,18))
           AS w1_t
  FROM g
)
SELECT dim AS dimension,
       CAST(MAX(ta) AS BIGINT) AS n_a,
       CAST(MAX(tb) AS BIGINT) AS n_b,
       ROUND(CAST(SUM(psi_t) AS DOUBLE), 6) AS psi,
       ROUND(MAX(gap), 6) AS ks,
       ROUND(CAST(SUM(w1_t) AS DOUBLE), 6) AS w1
FROM terms
GROUP BY dim
ORDER BY dimension
"""

EXT9_QUERIES.update({"x212_drift_dashboard": q_x212_drift_dashboard})
EXT9_ORACLES.update({"x212_drift_dashboard": SQL_X212})
