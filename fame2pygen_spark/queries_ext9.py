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


# ----------------------------- shared SQL: A&S normal tails


def _erf_sql(z: str) -> str:
    """DuckDB mirror of quality._AS_ERF / normal_* helpers: the
    Abramowitz-Stegun 7.1.26 erf polynomial applied to |z|/sqrt(2),
    injected from the SAME constants the Spark operators use."""
    from .operators.quality import _AS_ERF, _AS_P, _INV_SQRT2

    x = f"(abs({z}) * {_INV_SQRT2!r})"
    t = f"(1.0 / (1.0 + {_AS_P!r} * {x}))"
    a1, a2, a3, a4, a5 = (repr(c) for c in _AS_ERF)
    poly = (
        f"(((({a5} * {t} + ({a4})) * {t} + {a3}) * {t} + ({a2}))"
        f" * {t} + {a1}) * {t}"
    )
    return f"(1.0 - {poly} * exp(-({x} * {x})))"


def _normal_p_two_sided_sql(z: str) -> str:
    return f"(2.0 * (1.0 - 0.5 * (1.0 + {_erf_sql(z)})))"


def _normal_sf_sql(z: str) -> str:
    upper = f"(0.5 * (1.0 - {_erf_sql(z)}))"
    return (
        f"(CASE WHEN {z} >= 0 THEN {upper} ELSE 1.0 - {upper} END)"
    )


# ----------------------------- x213: chi-square independence


def q_x213_chi_square(spark, sf_dir):
    """Event-mix × day-of-week independence screen (operators/
    sketch.py: chi_square_test): is the event-type mix stable across
    weekdays, with Cramér's V effect size and a Wilson–Hilferty
    p-value — the p-value-carrying complement to the lang×source
    association audit (x145, chi_square_independence), on a different
    table and pairing so the two registry rows exercise different
    scans."""
    from .operators.sketch import chi_square_test

    ev = _read_events(spark, sf_dir)
    d = ev.withColumn(
        "dow", F.expr("(ts_us div 86400000000) % 7").cast("long")
    )
    return chi_square_test(d, "event_type", "dow")


def _sql_x213() -> str:
    chi2 = "chi2"
    dof = "CAST((r - 1) * (c - 1) AS DOUBLE)"
    wh_z = (
        f"((exp(ln({chi2} / {dof}) / 3.0)"
        f" - (1.0 - 2.0 / (9.0 * {dof})))"
        f" / sqrt(2.0 / (9.0 * {dof})))"
    )
    return f"""
WITH joint AS (
  SELECT event_type AS a,
         (epoch_us(ts) // 86400000000) % 7 AS b,
         COUNT(*) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
grid AS (
  SELECT da.a, db.b, COALESCE(j.n, 0) AS n
  FROM (SELECT DISTINCT a FROM joint) da
  CROSS JOIN (SELECT DISTINCT b FROM joint) db
  LEFT JOIN joint j ON j.a = da.a AND j.b = db.b
),
tot AS (
  SELECT SUM(n) AS N, COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c
  FROM grid
),
cells AS (
  SELECT g.n,
         SUM(g.n) OVER (PARTITION BY g.a) AS ra,
         SUM(g.n) OVER (PARTITION BY g.b) AS cb
  FROM grid g
),
terms AS (
  SELECT n, ra, cb,
         CAST(n AS DOUBLE) AS nd,
         CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
           / (SELECT CAST(N AS DOUBLE) FROM tot) AS e
  FROM cells
),
agg AS (
  SELECT (SELECT N FROM tot) AS n,
         (SELECT r FROM tot) AS r,
         (SELECT c FROM tot) AS c,
         CAST(SUM(CAST((nd - e) * (nd - e) / e AS DECIMAL(38,18)))
              AS DOUBLE) AS chi2
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(r AS BIGINT) AS r,
       CAST(c AS BIGINT) AS c,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       ROUND(chi2, 6) AS chi2,
       ROUND(sqrt(chi2 / (CAST(n AS DOUBLE)
                          * CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 6)
         AS cramers_v,
       ROUND(CASE WHEN chi2 <= 0 THEN 1.0
                  ELSE {_normal_sf_sql(wh_z)} END, 6) AS p_value
FROM agg
"""


EXT9_QUERIES.update({"x213_chi_square": q_x213_chi_square})
EXT9_ORACLES.update({"x213_chi_square": _sql_x213()})


# ----------------------------- x214: one-way ANOVA


def q_x214_anova(spark, sf_dir):
    """Document-length ANOVA across sources (operators/sketch.py:
    oneway_anova): F statistic + eta-squared from exact decimal
    moments — does mean document length differ by source, the
    k-group mean screen SMD (x197) answers only pairwise."""
    from .operators.sketch import oneway_anova

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return oneway_anova(docs, "source", "n_chars")


SQL_X214 = """
WITH g AS (
  SELECT source,
         COUNT(*) AS n,
         SUM(CAST(n_chars AS DECIMAL(19,0))) AS s1,
         SUM(CAST(n_chars AS DECIMAL(19,0))
             * CAST(n_chars AS DECIMAL(19,0))) AS s2
  FROM documents
  WHERE n_chars IS NOT NULL AND source IS NOT NULL
  GROUP BY 1
),
per AS (
  SELECT n, s1, s2,
         CAST((CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              / CAST(n AS DOUBLE) AS DECIMAL(38,18)) AS b_t,
         CAST(CAST(s2 AS DOUBLE)
              - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                / CAST(n AS DOUBLE) AS DECIMAL(38,18)) AS w_t
  FROM g
),
agg AS (
  SELECT COUNT(*) AS k,
         SUM(n) AS n,
         SUM(s1) AS S1,
         SUM(s2) AS S2,
         CAST(SUM(b_t) AS DOUBLE) AS bsum,
         CAST(SUM(w_t) AS DOUBLE) AS ssw
  FROM per
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n,
       ROUND(bsum - CAST(S1 AS DOUBLE) * CAST(S1 AS DOUBLE)
                    / CAST(n AS DOUBLE), 6) AS ss_between,
       ROUND(ssw, 6) AS ss_within,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(n - k AS BIGINT) AS df2,
       ROUND(((bsum - CAST(S1 AS DOUBLE) * CAST(S1 AS DOUBLE)
                      / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
             / (ssw / CAST(n - k AS DOUBLE)), 6) AS f_stat,
       ROUND((bsum - CAST(S1 AS DOUBLE) * CAST(S1 AS DOUBLE)
                     / CAST(n AS DOUBLE))
             / (CAST(S2 AS DOUBLE) - CAST(S1 AS DOUBLE)
                * CAST(S1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS eta_sq
FROM agg
"""

EXT9_QUERIES.update({"x214_anova": q_x214_anova})
EXT9_ORACLES.update({"x214_anova": SQL_X214})


# ----------------------------- x215: log-rank test


def q_x215_logrank(spark, sf_dir):
    """Two-cohort log-rank test on time-to-first-purchase
    (operators/behavior.py:logrank_test): users split by id parity,
    durations in whole days from first activity, administratively
    censored at the mid-month cutoff — do the cohorts' conversion
    survival curves differ (the inferential companion to the
    Kaplan–Meier estimator, x*kaplan)."""
    from .operators.behavior import logrank_test

    ev = _read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("__fe"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("__fp"),
    )
    cut = F.lit(_X58_CUTOFF_US)
    obs = per_user.where(F.col("__fe") < cut)
    event = F.col("__fp").isNotNull() & (F.col("__fp") < cut)
    durations = obs.select(
        (F.col("user_id") % 2).cast("int").alias("cohort"),
        F.when(event, F.expr("(__fp - __fe) div 86400000000"))
        .otherwise(
            F.expr(f"({_X58_CUTOFF_US} - __fe) div 86400000000")
        )
        .cast("long")
        .alias("t"),
        F.when(event, F.lit(0)).otherwise(F.lit(1)).alias("censored"),
    )
    return logrank_test(durations)


def _sql_x215() -> str:
    return f"""
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS fe,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS fp
  FROM events GROUP BY 1
),
durations AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS cohort,
         CASE WHEN fp IS NOT NULL AND fp < {_X58_CUTOFF_US}
              THEN (fp - fe) // 86400000000
              ELSE ({_X58_CUTOFF_US} - fe) // 86400000000 END AS t,
         CASE WHEN fp IS NOT NULL AND fp < {_X58_CUTOFF_US}
              THEN 0 ELSE 1 END AS censored
  FROM per_user WHERE fe < {_X58_CUTOFF_US}
),
per_t AS (
  SELECT CAST(t AS BIGINT) AS t,
         SUM(cohort) AS m1,
         SUM(1 - cohort) AS m0,
         SUM(cohort * (1 - censored)) AS d1,
         SUM((1 - cohort) * (1 - censored)) AS d0
  FROM durations GROUP BY 1
),
tot AS (SELECT SUM(m1) AS T1, SUM(m0) AS T0 FROM per_t),
risk AS (
  SELECT p.*,
         (SELECT T1 FROM tot)
           - COALESCE(SUM(m1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n1,
         (SELECT T0 FROM tot)
           - COALESCE(SUM(m0) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n0
  FROM per_t p
),
ev AS (SELECT * FROM risk WHERE d1 + d0 > 0),
agg AS (
  SELECT (SELECT T1 FROM tot) AS n1_subj,
         (SELECT T0 FROM tot) AS n0_subj,
         SUM(d1) AS events1,
         SUM(d0) AS events0,
         CAST(SUM(CAST(CAST(d1 AS DOUBLE)
             - CAST(d1 + d0 AS DOUBLE) * CAST(n1 AS DOUBLE)
               / CAST(n1 + n0 AS DOUBLE) AS DECIMAL(38,18)))
           AS DOUBLE) AS oe,
         CAST(SUM(CAST(COALESCE(
             CAST(d1 + d0 AS DOUBLE)
             * (CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
             * (1.0 - CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
             * (CAST(n1 + n0 AS DOUBLE) - CAST(d1 + d0 AS DOUBLE))
             / NULLIF(CAST(n1 + n0 AS DOUBLE) - 1.0, 0.0), 0.0)
           AS DECIMAL(38,18))) AS DOUBLE) AS v
  FROM ev
)
SELECT CAST(n1_subj AS BIGINT) AS n1,
       CAST(n0_subj AS BIGINT) AS n0,
       CAST(events1 AS BIGINT) AS events1,
       CAST(events0 AS BIGINT) AS events0,
       ROUND(oe, 6) AS o_minus_e,
       ROUND(v, 6) AS var_sum,
       ROUND(oe * oe / v, 6) AS chi2,
       ROUND({_normal_p_two_sided_sql("sqrt(oe * oe / v)")}, 6)
         AS p_value
FROM agg
"""


EXT9_QUERIES.update({"x215_logrank": q_x215_logrank})
EXT9_ORACLES.update({"x215_logrank": _sql_x215()})


# ----------------------------- x216: Poisson rate test


def q_x216_poisson_rates(spark, sf_dir):
    """Weekend vs weekday event-rate comparison per event type
    (operators/sketch.py:poisson_rate_test): exact-conditional
    binomial z on counts with distinct-day exposures — did the
    arrival RATE change between the two exposure windows (the
    dispersion audit x208 asks a different question: is it Poisson
    at all)."""
    from .operators.sketch import poisson_rate_test

    ev = _read_events(spark, sf_dir)
    day = F.expr("ts_us div 86400000000")
    wknd = ((day + 3) % 7).isin(5, 6)
    counts = ev.groupBy("event_type").agg(
        F.sum(F.when(wknd, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(wknd, 0).otherwise(1)).alias("__cb"),
    )
    days = (
        ev.select(day.cast("long").alias("__day"))
        .distinct()
        .agg(
            F.sum(
                F.when(((F.col("__day") + 3) % 7).isin(5, 6), 1).otherwise(0)
            ).alias("__ta"),
            F.sum(
                F.when(((F.col("__day") + 3) % 7).isin(5, 6), 0).otherwise(1)
            ).alias("__tb"),
        )
    )
    prepared = counts.crossJoin(F.broadcast(days))
    out = poisson_rate_test(
        prepared,
        ["event_type"],
        count_a_col="__ca",
        count_b_col="__cb",
        exposure_a_col="__ta",
        exposure_b_col="__tb",
    )
    return out.orderBy("event_type")


def _sql_x216() -> str:
    z = (
        "((CAST(ca AS DOUBLE) - (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))"
        " * (CAST(ta AS DOUBLE) / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))))"
        " / sqrt((CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))"
        " * (CAST(ta AS DOUBLE) / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))"
        " * (1.0 - CAST(ta AS DOUBLE)"
        " / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))))"
    )
    return f"""
WITH base AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
counts AS (
  SELECT event_type,
         SUM(CASE WHEN (day + 3) % 7 IN (5, 6) THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN (day + 3) % 7 IN (5, 6) THEN 0 ELSE 1 END) AS cb
  FROM base GROUP BY 1
),
expo AS (
  SELECT SUM(CASE WHEN (day + 3) % 7 IN (5, 6) THEN 1 ELSE 0 END) AS ta,
         SUM(CASE WHEN (day + 3) % 7 IN (5, 6) THEN 0 ELSE 1 END) AS tb
  FROM (SELECT DISTINCT day FROM base)
)
SELECT event_type,
       CAST(ca AS BIGINT) AS c_a,
       CAST(cb AS BIGINT) AS c_b,
       ROUND(CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE), 6) AS rate_a,
       ROUND(CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE), 6) AS rate_b,
       ROUND((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
             / (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE)), 6)
         AS rate_ratio,
       ROUND({z}, 6) AS z,
       ROUND(CASE WHEN CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE) > 0
                  THEN {_normal_p_two_sided_sql(z)} END, 6) AS p_value
FROM counts CROSS JOIN expo
ORDER BY event_type
"""


EXT9_QUERIES.update({"x216_poisson_rates": q_x216_poisson_rates})
EXT9_ORACLES.update({"x216_poisson_rates": _sql_x216()})


# ----------------------------- x217: Kruskal-Wallis H


def q_x217_kruskal_wallis(spark, sf_dir):
    """Document-length Kruskal-Wallis across languages (operators/
    sketch.py: kruskal_wallis): the k-group rank test — does at least
    one language's length distribution dominate — robust to the
    heavy-tailed lengths where the ANOVA mean screen (x214, which
    tests sources) chases the tail.  Doubled-integer midranks over
    the distinct-length support keep every rank sum exact."""
    from .operators.sketch import kruskal_wallis

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return kruskal_wallis(docs, "n_chars", "lang")


def _sql_x217() -> str:
    dof = "CAST(k - 1 AS DOUBLE)"
    wh_z = (
        f"((exp(ln(h_adj / {dof}) / 3.0)"
        f" - (1.0 - 2.0 / (9.0 * {dof})))"
        f" / sqrt(2.0 / (9.0 * {dof})))"
    )
    return f"""
WITH lvl AS (
  SELECT n_chars AS v, lang AS g, COUNT(*) AS c
  FROM documents
  WHERE n_chars IS NOT NULL AND lang IS NOT NULL
  GROUP BY 1, 2
),
vt AS (SELECT v, SUM(c) AS cv FROM lvl GROUP BY v),
rk AS (
  SELECT v, cv,
         2 * COALESCE(SUM(cv) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cv + 1 AS r2
  FROM vt
),
pg AS (
  SELECT l.g, SUM(l.c) AS ng, SUM(l.c * r.r2) AS r2g
  FROM lvl l JOIN rk r ON l.v = r.v
  GROUP BY l.g
),
ga AS (
  SELECT COUNT(*) AS k, SUM(ng) AS n,
         CAST(SUM(CAST((CAST(r2g AS DOUBLE) / 2.0)
                       * (CAST(r2g AS DOUBLE) / 2.0)
                       / CAST(ng AS DOUBLE) AS DECIMAL(38,12)))
              AS DOUBLE) AS rsum
  FROM pg
),
tt AS (SELECT SUM(cv * cv * cv - cv) AS t3 FROM vt),
m1 AS (
  SELECT k, CAST(n AS DOUBLE) AS nd, n, rsum, t3,
         12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * rsum
           - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h,
         1.0 - CAST(t3 AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS c_tie
  FROM ga CROSS JOIN tt
),
m2 AS (SELECT *, h / c_tie AS h_adj FROM m1)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n,
       CASE WHEN k >= 2 AND c_tie > 0 THEN ROUND(h, 6) END AS h,
       CASE WHEN k >= 2 AND c_tie > 0 THEN ROUND(h_adj, 6) END AS h_adj,
       CASE WHEN k >= 2 AND c_tie > 0
            THEN ROUND(CASE WHEN h_adj <= 0 THEN 1.0
                            ELSE {_normal_sf_sql(wh_z)} END, 6)
       END AS p_value
FROM m2
"""


EXT9_QUERIES.update({"x217_kruskal_wallis": q_x217_kruskal_wallis})
EXT9_ORACLES.update({"x217_kruskal_wallis": _sql_x217()})


# ----------------------------- x218: Mann-Kendall trend test


def q_x218_mann_kendall(spark, sf_dir):
    """Per-event-type Mann-Kendall monotone-trend test on the daily
    mean value series (operators/temporal.py: mann_kendall) — the
    significance companion to the Theil-Sen slope (x78): S counts
    concordant-minus-discordant day pairs, tie-corrected variance,
    continuity-corrected z, A&S two-sided p."""
    from .operators.temporal import mann_kendall

    ev = _read_events(spark, sf_dir)
    daily = (
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
    out = mann_kendall(daily, "event_type", "day", "x", max_points=60)
    return out.withColumnRenamed("entity", "event_type").orderBy(
        "event_type"
    )


def _sql_x218() -> str:
    z = (
        "(CASE WHEN s_stat > 0"
        " THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)"
        " WHEN s_stat < 0"
        " THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)"
        " ELSE 0.0 END)"
    )
    return f"""
WITH daily AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE)
               / COUNT(*), 6) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
s AS (
  SELECT a.event_type,
         SUM(CASE WHEN b.x > a.x THEN 1
                  WHEN b.x < a.x THEN -1 ELSE 0 END) AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
),
cnt AS (SELECT event_type, COUNT(*) AS n_points FROM daily GROUP BY 1),
ties AS (
  SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tsum
  FROM (SELECT event_type, x, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
),
m AS (
  SELECT c.event_type, c.n_points,
         COALESCE(s.s_stat, 0) AS s_stat,
         (CAST(c.n_points AS DOUBLE) * (CAST(c.n_points AS DOUBLE) - 1.0)
          * (2.0 * CAST(c.n_points AS DOUBLE) + 5.0)
          - CAST(t.tsum AS DOUBLE)) / 18.0 AS var_s
  FROM cnt c LEFT JOIN s ON s.event_type = c.event_type
  JOIN ties t ON t.event_type = c.event_type
)
SELECT event_type,
       CAST(n_points AS BIGINT) AS n_points,
       CAST(s_stat AS BIGINT) AS s_stat,
       CASE WHEN n_points >= 2 THEN ROUND(var_s, 6) END AS var_s,
       CASE WHEN n_points >= 2 AND var_s > 0
            THEN ROUND({z}, 6) END AS z,
       CASE WHEN n_points >= 2 AND var_s > 0
            THEN ROUND({_normal_p_two_sided_sql(z)}, 6) END AS p_value
FROM m
ORDER BY event_type
"""


EXT9_QUERIES.update({"x218_mann_kendall": q_x218_mann_kendall})
EXT9_ORACLES.update({"x218_mann_kendall": _sql_x218()})


# ----------------------------- x219: Cochran-Armitage trend


_X219_THRESH = 50.0


def q_x219_cochran_armitage(spark, sf_dir):
    """Weekly high-value-share trend per event type (operators/
    behavior.py: cochran_armitage_trend): dose = calendar week
    (ordered), outcome = event value above the alert threshold — the
    one-dof ordered-trend test that x213's any-association chi-square
    has no power for.  One keyed aggregation to the (type, week)
    dose table; the test is column algebra on those rows."""
    from .operators.behavior import cochran_armitage_trend

    ev = _read_events(spark, sf_dir)
    counts = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("ts_us div 604800000000").cast("long").alias("week"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum(
                F.when(F.col("value") > F.lit(_X219_THRESH), 1).otherwise(0)
            ).cast("long").alias("succ"),
        )
    )
    out = cochran_armitage_trend(
        counts, "week", "succ", "total", ["event_type"]
    )
    return out.orderBy("event_type")


def _sql_x219() -> str:
    z = "(t_stat / sqrt(var_t))"
    return f"""
WITH counts AS (
  SELECT event_type,
         epoch_us(ts) // 604800000000 AS week,
         COUNT(*) AS total,
         SUM(CASE WHEN value > {_X219_THRESH!r} THEN 1 ELSE 0 END) AS succ
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         COUNT(*) AS n_levels,
         SUM(total) AS n,
         SUM(succ) AS n_success,
         SUM(week * succ) AS sx,
         SUM(week * total) AS sn,
         SUM(week * week * total) AS s2n
  FROM counts
  GROUP BY 1
),
m AS (
  SELECT event_type, n_levels, n, n_success,
         CAST(sx AS DOUBLE)
           - (CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE))
             * CAST(sn AS DOUBLE) AS t_stat,
         (CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE))
           * (1.0 - CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(s2n AS DOUBLE)
              - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                / CAST(n AS DOUBLE)) AS var_t
  FROM agg
)
SELECT event_type,
       CAST(n_levels AS BIGINT) AS n_levels,
       CAST(n AS BIGINT) AS n,
       CAST(n_success AS BIGINT) AS n_success,
       CASE WHEN n_levels >= 2 AND var_t > 0
            THEN ROUND({z}, 6) END AS z,
       CASE WHEN n_levels >= 2 AND var_t > 0
            THEN ROUND({_normal_p_two_sided_sql(z)}, 6) END AS p_value
FROM m
ORDER BY event_type
"""


EXT9_QUERIES.update({"x219_cochran_armitage": q_x219_cochran_armitage})
EXT9_ORACLES.update({"x219_cochran_armitage": _sql_x219()})


# ----------------------------- x220: McNemar paired flip test


_X220_CUT_DAY = 19738  # 2024-01-16 — midpoint of the 30-day window


def q_x220_mcnemar(spark, sf_dir):
    """Before/after user-activity flips per event type (operators/
    behavior.py: mcnemar_test): subject = user, pre/post = any
    activity of the type in each half of the window — the paired
    test that removes between-user variance from "did the same users
    keep doing this".  Subjects are the full user x type grid
    (broadcast type side) so concordant-absent pairs count in n."""
    from .operators.behavior import mcnemar_test

    ev = _read_events(spark, sf_dir)
    day = F.expr("ts_us div 86400000000")
    flags = ev.groupBy("user_id", "event_type").agg(
        F.max(
            F.when(day < F.lit(_X220_CUT_DAY), 1).otherwise(0)
        ).alias("pre_raw"),
        F.max(
            F.when(day >= F.lit(_X220_CUT_DAY), 1).otherwise(0)
        ).alias("post_raw"),
    )
    grid = ev.select("user_id").distinct().crossJoin(
        F.broadcast(ev.select("event_type").distinct())
    )
    subj = grid.join(flags, on=["user_id", "event_type"], how="left").select(
        "user_id",
        "event_type",
        F.coalesce(F.col("pre_raw"), F.lit(0)).alias("pre"),
        F.coalesce(F.col("post_raw"), F.lit(0)).alias("post"),
    )
    out = mcnemar_test(
        subj, ["user_id"], "pre", "post", ["event_type"]
    )
    return out.orderBy("event_type")


def _sql_x220() -> str:
    chi2 = (
        "(GREATEST(ABS(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0, 0.0)"
        " * GREATEST(ABS(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0, 0.0)"
        " / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)))"
    )
    return f"""
WITH ev2 AS (
  SELECT user_id, event_type,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
flags AS (
  SELECT user_id, event_type,
         MAX(CASE WHEN day < {_X220_CUT_DAY} THEN 1 ELSE 0 END) AS pre,
         MAX(CASE WHEN day >= {_X220_CUT_DAY} THEN 1 ELSE 0 END) AS post
  FROM ev2
  GROUP BY 1, 2
),
subj AS (
  SELECT u.user_id, t.event_type,
         COALESCE(f.pre, 0) AS pre, COALESCE(f.post, 0) AS post
  FROM (SELECT DISTINCT user_id FROM ev2) u
  CROSS JOIN (SELECT DISTINCT event_type FROM ev2) t
  LEFT JOIN flags f
    ON f.user_id = u.user_id AND f.event_type = t.event_type
),
agg AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(pre) AS n_pre,
         SUM(post) AS n_post,
         SUM(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END) AS c
  FROM subj
  GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(n_pre AS BIGINT) AS n_pre,
       CAST(n_post AS BIGINT) AS n_post,
       CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c,
       CASE WHEN b + c > 0 THEN ROUND({chi2}, 6) END AS chi2,
       CASE WHEN b + c > 0
            THEN ROUND({_normal_p_two_sided_sql(f"sqrt({chi2})")}, 6)
       END AS p_value
FROM agg
ORDER BY event_type
"""


EXT9_QUERIES.update({"x220_mcnemar": q_x220_mcnemar})
EXT9_ORACLES.update({"x220_mcnemar": _sql_x220()})


# ----------------------------- x221: bucketed jackknife ratio SE


def q_x221_jackknife(spark, sf_dir):
    """User-clustered jackknife SE of mean event value per type
    (operators/sketch.py: jackknife_ratio_se): 32 deterministic
    md5 buckets over users, leave-one-bucket-out ratios from totals
    minus bucket sums — the production-shape uncertainty for ratio
    metrics whose rows are correlated within users (the row
    bootstrap x192 understates this)."""
    from .operators.sketch import jackknife_ratio_se

    ev = _read_events(spark, sf_dir).withColumn("one", F.lit(1))
    out = jackknife_ratio_se(
        ev, "value", "one", "user_id", ["event_type"]
    )
    return out.orderBy("event_type")


def _sql_x221() -> str:
    z = repr(1.959964)
    return f"""
WITH pu AS (
  SELECT event_type, user_id AS u,
         SUM(CAST(value AS DECIMAL(25,12))) AS yu,
         SUM(CAST(1 AS DECIMAL(25,12))) AS du
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pb AS (
  SELECT event_type,
         CAST(('0x' || substr(md5('jk:' || CAST(u AS VARCHAR)), 1, 8))
              AS BIGINT) % 32 AS b,
         COUNT(*) AS ku, SUM(yu) AS yb, SUM(du) AS db_
  FROM pu
  GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(ku) AS n_units, COUNT(*) AS bused,
         SUM(yb) AS yt, SUM(db_) AS dt
  FROM pb
  GROUP BY 1
),
rep AS (
  SELECT p.event_type, t.n_units, t.bused, t.yt, t.dt,
         CAST(t.yt - p.yb AS DOUBLE) / CAST(t.dt - p.db_ AS DOUBLE) AS r
  FROM pb p JOIN tot t USING (event_type)
),
agg AS (
  SELECT event_type,
         MAX(n_units) AS n_units, MAX(bused) AS bused,
         MAX(yt) AS yt, MAX(dt) AS dt,
         CAST(SUM(CAST(r AS DECIMAL(38,18))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(r * r AS DECIMAL(38,18))) AS DOUBLE) AS s2,
         COUNT(r) AS kr
  FROM rep
  GROUP BY 1
),
m AS (
  SELECT event_type, n_units, bused, kr,
         CAST(yt AS DOUBLE) / CAST(dt AS DOUBLE) AS ratio,
         sqrt(GREATEST(
           (CAST(kr AS DOUBLE) - 1.0) / CAST(kr AS DOUBLE)
           * (s2 - s1 * s1 / CAST(kr AS DOUBLE)), 0.0)) AS se
  FROM agg
)
SELECT event_type,
       CAST(n_units AS BIGINT) AS n_units,
       CAST(bused AS BIGINT) AS n_buckets_used,
       ROUND(ratio, 6) AS ratio,
       CASE WHEN kr >= 2 THEN ROUND(se, 6) END AS se_jk,
       CASE WHEN kr >= 2 THEN ROUND(ratio - {z} * se, 6) END AS ci_lo,
       CASE WHEN kr >= 2 THEN ROUND(ratio + {z} * se, 6) END AS ci_hi
FROM m
ORDER BY event_type
"""


EXT9_QUERIES.update({"x221_jackknife": q_x221_jackknife})
EXT9_ORACLES.update({"x221_jackknife": _sql_x221()})


# ----------------------------- x222: delta-method ratio CI


def q_x222_delta_method(spark, sf_dir):
    """Closed-form delta-method SE for the same user-clustered
    mean-value-per-event metric as x221 (operators/behavior.py:
    delta_method_ratio) — no replicates, one pass of decimal
    moments; agreeing with the jackknife within a few percent is
    the standing health check on both."""
    from .operators.behavior import delta_method_ratio

    ev = _read_events(spark, sf_dir).withColumn("one", F.lit(1))
    out = delta_method_ratio(
        ev, "value", "one", "user_id", ["event_type"]
    )
    return out.orderBy("event_type")


def _sql_x222() -> str:
    z = repr(1.959964)
    return f"""
WITH pu AS (
  SELECT event_type, user_id AS u,
         CAST(SUM(CAST(value AS DECIMAL(15,8))) AS DECIMAL(15,8)) AS yu,
         CAST(SUM(CAST(1 AS DECIMAL(15,8))) AS DECIMAL(15,8)) AS nu
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         COUNT(*) AS n_units,
         CAST(SUM(yu) AS DOUBLE) AS sy,
         CAST(SUM(nu) AS DOUBLE) AS sn,
         CAST(SUM(CAST(yu AS DECIMAL(20,8)) * yu) AS DOUBLE) AS syy,
         CAST(SUM(CAST(nu AS DECIMAL(20,8)) * nu) AS DOUBLE) AS snn,
         CAST(SUM(CAST(yu AS DECIMAL(20,8)) * nu) AS DOUBLE) AS syn
  FROM pu
  GROUP BY 1
),
m AS (
  SELECT event_type, n_units, sy, sn,
         sy / sn AS r,
         sn / CAST(n_units AS DOUBLE) AS nbar,
         (syy - sy * sy / CAST(n_units AS DOUBLE))
           / (CAST(n_units AS DOUBLE) - 1.0) AS e_yy,
         (snn - sn * sn / CAST(n_units AS DOUBLE))
           / (CAST(n_units AS DOUBLE) - 1.0) AS e_nn,
         (syn - sy * sn / CAST(n_units AS DOUBLE))
           / (CAST(n_units AS DOUBLE) - 1.0) AS e_yn
  FROM agg
),
v AS (
  SELECT event_type, n_units, sn, r,
         sqrt(GREATEST(
           (e_yy - 2.0 * r * e_yn + r * r * e_nn)
           / (CAST(n_units AS DOUBLE) * nbar * nbar), 0.0)) AS se
  FROM m
)
SELECT event_type,
       CAST(n_units AS BIGINT) AS n_units,
       ROUND(r, 6) AS ratio,
       CASE WHEN n_units >= 2 AND sn <> 0.0
            THEN ROUND(se, 6) END AS se,
       CASE WHEN n_units >= 2 AND sn <> 0.0
            THEN ROUND(r - {z} * se, 6) END AS ci_lo,
       CASE WHEN n_units >= 2 AND sn <> 0.0
            THEN ROUND(r + {z} * se, 6) END AS ci_hi
FROM v
ORDER BY event_type
"""


EXT9_QUERIES.update({"x222_delta_method": q_x222_delta_method})
EXT9_ORACLES.update({"x222_delta_method": _sql_x222()})


# ----------------------------- x223: minimum detectable effect


def q_x223_mde(spark, sf_dir):
    """Pre-experiment MDE feasibility per event type (operators/
    behavior.py: mde_table): the absolute/relative lift a 50/50
    split on per-user total value could detect at alpha=.05 /
    power=.80 with today's traffic — the dashboard row every A/B
    program checks before committing a segment."""
    from .operators.behavior import mde_table

    ev = _read_events(spark, sf_dir)
    return mde_table(ev, "value", "user_id", ["event_type"]).orderBy(
        "event_type"
    )


def _sql_x223() -> str:
    zsum = repr(1.959964 + 0.841621)
    return f"""
WITH pu AS (
  SELECT event_type, user_id AS u,
         CAST(SUM(CAST(value AS DECIMAL(15,8))) AS DECIMAL(15,8)) AS yu
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         COUNT(*) AS n_units,
         CAST(SUM(yu) AS DOUBLE) AS sy,
         CAST(SUM(CAST(yu AS DECIMAL(20,8)) * yu) AS DOUBLE) AS syy
  FROM pu
  GROUP BY 1
),
m AS (
  SELECT event_type, n_units,
         sy / CAST(n_units AS DOUBLE) AS mean,
         (syy - sy * sy / CAST(n_units AS DOUBLE))
           / (CAST(n_units AS DOUBLE) - 1.0) AS var,
         n_units // 2 AS n_arm
  FROM agg
),
d AS (
  SELECT event_type, n_units, n_arm, mean, var,
         {zsum} * sqrt(2.0 * var / CAST(n_arm AS DOUBLE)) AS mde
  FROM m
)
SELECT event_type,
       CAST(n_units AS BIGINT) AS n_units,
       CAST(n_arm AS BIGINT) AS n_per_arm,
       ROUND(mean, 6) AS mean,
       CASE WHEN n_units >= 2 THEN ROUND(sqrt(var), 6) END AS sd,
       CASE WHEN n_units >= 4 AND var > 0
            THEN ROUND(mde, 6) END AS mde_abs,
       CASE WHEN n_units >= 4 AND var > 0
            THEN ROUND(mde / mean, 6) END AS mde_rel
FROM d
ORDER BY event_type
"""


EXT9_QUERIES.update({"x223_mde": q_x223_mde})
EXT9_ORACLES.update({"x223_mde": _sql_x223()})


# ----------------------------- x224: cumulative gains / lift table


def q_x224_gains(spark, sf_dir):
    """Gains/lift deciles for a length-based English screen
    (operators/quality.py: gains_table): score = n_chars, outcome =
    lang = 'en' — the budget-cutoff view (top-k capture and lift)
    that AUC (x146) compresses away.  Tie-group binning over the
    distinct-score support, no row-level global ntile."""
    from .operators.quality import gains_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.where(F.col("lang").isNotNull()).withColumn(
        "is_en", F.col("lang") == F.lit("en")
    )
    return gains_table(d, "n_chars", "is_en", n_bins=10)


SQL_X224 = """
WITH cells AS (
  SELECT ROUND(CAST(n_chars AS DOUBLE), 6) AS s,
         COUNT(*) AS n,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1
),
b AS (
  SELECT s, n, p,
         COALESCE(SUM(n) OVER (ORDER BY s DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prior,
         SUM(n) OVER () AS tot,
         SUM(p) OVER () AS totp
  FROM cells
),
pb AS (
  SELECT 1 + (prior * 10) // tot AS bin,
         SUM(n) AS n, SUM(p) AS n_pos,
         MAX(tot) AS tot, MAX(totp) AS totp
  FROM b
  GROUP BY 1
),
cum AS (
  SELECT bin, n, n_pos, tot, totp,
         SUM(n) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         SUM(n_pos) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
  FROM pb
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos,
       ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
       ROUND((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(totp AS DOUBLE) / CAST(tot AS DOUBLE)), 6) AS lift,
       CAST(cn AS BIGINT) AS cum_n,
       CAST(cp AS BIGINT) AS cum_pos,
       ROUND(CAST(cp AS DOUBLE) / CAST(totp AS DOUBLE), 6)
         AS cum_capture,
       ROUND((CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
             / (CAST(totp AS DOUBLE) / CAST(tot AS DOUBLE)), 6)
         AS cum_lift
FROM cum
ORDER BY bin
"""

EXT9_QUERIES.update({"x224_gains": q_x224_gains})
EXT9_ORACLES.update({"x224_gains": SQL_X224})
