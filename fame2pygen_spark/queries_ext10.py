"""Round-5 extension queries, first batch (x225+): assumption checks
and design diagnostics for the experimentation stack — variance
homogeneity (Brown–Forsythe), clustering strength (ICC), composite
reliability (Cronbach's alpha), distribution-free randomization
inference, residual serial correlation (Durbin–Watson), and trig-free
dominant-period detection.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_ext import _read_events

EXT10_QUERIES: dict = {}
EXT10_ORACLES: dict = {}


# ----------------------------- x225: Brown–Forsythe variance test


def q_x225_brown_forsythe(spark, sf_dir):
    """Variance-homogeneity screen (operators/sketch.py:
    brown_forsythe) on event value across event types — the
    equal-spread assumption the mean-comparison ANOVA (x214) and the
    pooled-variance A/B tests silently make; median-centered so
    heavy tails don't masquerade as unequal variance."""
    from .operators.sketch import brown_forsythe

    ev = _read_events(spark, sf_dir)
    return brown_forsythe(
        ev.where(F.col("value").isNotNull()), "event_type", "value"
    )


SQL_X225 = """
WITH base AS (
  SELECT event_type AS g, value AS x
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
ranked AS (
  SELECT g, x,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS nn
  FROM base
),
med AS (SELECT g, x AS med FROM ranked WHERE rn = (nn + 1) // 2),
z AS (
  SELECT b.g, ABS(b.x - m.med) AS z
  FROM base b JOIN med m ON b.g = m.g
),
grp AS (
  SELECT g, COUNT(*) AS n,
         SUM(CAST(z AS DECIMAL(28,6))) AS s1,
         SUM(CAST(z * z AS DECIMAL(28,6))) AS s2
  FROM z GROUP BY 1
),
per AS (
  SELECT n, s1,
         CAST(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(n AS DOUBLE) AS DECIMAL(38,18)) AS b_t,
         CAST(CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n AS DOUBLE) AS DECIMAL(38,18)) AS w_t
  FROM grp
),
agg AS (
  SELECT COUNT(*) AS k, SUM(n) AS n, SUM(s1) AS S1,
         CAST(SUM(b_t) AS DOUBLE) AS bsum,
         CAST(SUM(w_t) AS DOUBLE) AS ssw
  FROM per
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n,
       ROUND(((bsum - CAST(S1 AS DOUBLE) * CAST(S1 AS DOUBLE)
                      / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
             / (ssw / CAST(n - k AS DOUBLE)), 6) AS f_stat,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(n - k AS BIGINT) AS df2
FROM agg
"""

EXT10_QUERIES.update({"x225_brown_forsythe": q_x225_brown_forsythe})
EXT10_ORACLES.update({"x225_brown_forsythe": SQL_X225})


# ----------------------------- x226: intraclass correlation ICC(1)


def q_x226_icc(spark, sf_dir):
    """Clustering-strength diagnostic (operators/sketch.py:
    icc_oneway): ICC(1) of daily event counts clustered by user —
    "how much of day-to-day volume variance is user identity", the
    number that justifies (or waives) the per-unit collapse the
    jackknife (x221) and delta-method (x222) SEs require."""
    from .operators.sketch import icc_oneway

    ev = _read_events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.expr("ts_us div 86400000000").alias("__day")
    ).agg(F.count(F.lit(1)).alias("n_day"))
    return icc_oneway(daily, "user_id", "n_day")


SQL_X226 = """
WITH daily AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS n_day
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT user_id,
         COUNT(*) AS n,
         SUM(CAST(n_day AS DECIMAL(19,0))) AS s1,
         SUM(CAST(n_day AS DECIMAL(19,0))
             * CAST(n_day AS DECIMAL(19,0))) AS s2
  FROM daily GROUP BY 1
),
per AS (
  SELECT n, s1,
         CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) AS n2,
         CAST(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(n AS DOUBLE) AS DECIMAL(38,18)) AS b_t,
         CAST(CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n AS DOUBLE) AS DECIMAL(38,18)) AS w_t
  FROM g
),
agg AS (
  SELECT COUNT(*) AS k, SUM(n) AS n, SUM(n2) AS sn2, SUM(s1) AS S1,
         CAST(SUM(b_t) AS DOUBLE) AS bsum,
         CAST(SUM(w_t) AS DOUBLE) AS ssw
  FROM per
),
fin AS (
  SELECT k, n,
         (bsum - CAST(S1 AS DOUBLE) * CAST(S1 AS DOUBLE)
                 / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE) AS msb,
         ssw / CAST(n - k AS DOUBLE) AS msw,
         (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))
           / CAST(k - 1 AS DOUBLE) AS k0
  FROM agg
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n,
       ROUND(k0, 6) AS k0,
       ROUND(msb, 6) AS msb,
       ROUND(msw, 6) AS msw,
       ROUND((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
FROM fin
"""

EXT10_QUERIES.update({"x226_icc": q_x226_icc})
EXT10_ORACLES.update({"x226_icc": SQL_X226})


# ----------------------------- x227: Cronbach's alpha


def q_x227_cronbach(spark, sf_dir):
    """Composite reliability (operators/quality.py:cronbach_alpha):
    treating the k event types as k items scored by per-user event
    counts — do the channels move together enough that a single
    "activity score" summing them is internally consistent."""
    from .operators.quality import cronbach_alpha

    ev = _read_events(spark, sf_dir)
    return cronbach_alpha(ev, "user_id", "event_type")


SQL_X227 = """
WITH cell AS (
  SELECT user_id AS s, event_type AS i,
         SUM(CAST(1 AS DECIMAL(19,0))) AS x
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
ns AS (SELECT COUNT(DISTINCT s) AS n_subjects FROM cell),
items AS (
  SELECT n_subjects,
         COUNT(*) AS k_items,
         CAST(SUM(var_i) AS DOUBLE) AS sum_var
  FROM (
    SELECT ns.n_subjects,
           CAST(CAST(s2 AS DOUBLE) / CAST(ns.n_subjects AS DOUBLE)
                - (CAST(s1 AS DOUBLE) / CAST(ns.n_subjects AS DOUBLE))
                  * (CAST(s1 AS DOUBLE) / CAST(ns.n_subjects AS DOUBLE))
                AS DECIMAL(38,18)) AS var_i
    FROM (
      SELECT i, SUM(x) AS s1, SUM(x * x) AS s2 FROM cell GROUP BY 1
    ) CROSS JOIN ns
  ) GROUP BY 1
),
tot AS (
  SELECT CAST(t2 AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(t1 AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(t1 AS DOUBLE) / CAST(n AS DOUBLE)) AS tot_var
  FROM (
    SELECT COUNT(*) AS n, SUM(t) AS t1, SUM(t * t) AS t2
    FROM (SELECT s, SUM(x) AS t FROM cell GROUP BY 1)
  )
)
SELECT CAST(k_items AS BIGINT) AS k_items,
       CAST(n_subjects AS BIGINT) AS n_subjects,
       ROUND(sum_var, 6) AS sum_item_var,
       ROUND(tot_var, 6) AS total_var,
       ROUND(CAST(k_items AS DOUBLE) / CAST(k_items - 1 AS DOUBLE)
             * (1 - sum_var / tot_var), 6) AS alpha
FROM items CROSS JOIN tot
"""

EXT10_QUERIES.update({"x227_cronbach": q_x227_cronbach})
EXT10_ORACLES.update({"x227_cronbach": SQL_X227})


# ----------------------------- x228: hash-randomization test


_X228_NPERM = 100


def q_x228_randomization(spark, sf_dir):
    """Distribution-free inference (operators/behavior.py:
    randomization_test): the x66 A/A split's per-user total value,
    re-randomized 100 times by salted hash — the p-value that needs
    no normality, the cross-check for heavy-tailed revenue metrics
    where the z-test's pooled SE misleads."""
    from .operators.behavior import randomization_test

    ev = _read_events(spark, sf_dir)
    units = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(25,12)"))
            .cast("double")
            .alias("y")
        )
        .select(
            "user_id",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("ab:"),
                                F.col("user_id").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                / F.lit(4294967296.0)
                < 0.5,
                F.lit("a"),
            )
            .otherwise(F.lit("b"))
            .alias("variant"),
            "y",
        )
    )
    return randomization_test(
        units, "user_id", "variant", "y", n_perm=_X228_NPERM, salt="perm"
    )


SQL_X228 = f"""
WITH units AS (
  SELECT CAST(user_id AS VARCHAR) AS u,
         CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 'a' ELSE 'b' END AS v,
         CAST(CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE)
              AS DECIMAL(28,6)) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
obs AS (
  SELECT COUNT(*) AS n_units,
         SUM(CASE WHEN v = 'a' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN v = 'b' THEN 1 ELSE 0 END) AS n_b,
         CAST(SUM(CASE WHEN v = 'a' THEN y END) AS DOUBLE)
           / SUM(CASE WHEN v = 'a' THEN 1 ELSE 0 END)
         - CAST(SUM(CASE WHEN v = 'b' THEN y END) AS DOUBLE)
           / SUM(CASE WHEN v = 'b' THEN 1 ELSE 0 END) AS d_obs
  FROM units
),
rep AS (
  SELECT u, y, b.b AS b,
         ('0x' || substr(md5('perm:' || CAST(b.b AS VARCHAR) || ':' || u),
          1, 8))::BIGINT % 2 AS arm
  FROM units CROSS JOIN
       (SELECT unnest(generate_series(0, {_X228_NPERM - 1})) AS b) b
),
per_b AS (
  SELECT b,
         CAST(SUM(CASE WHEN arm = 0 THEN y END) AS DOUBLE)
           / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
         - CAST(SUM(CASE WHEN arm = 1 THEN y END) AS DOUBLE)
           / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS d
  FROM rep GROUP BY 1
)
SELECT CAST(o.n_units AS BIGINT) AS n_units,
       CAST(o.n_a AS BIGINT) AS n_a,
       CAST(o.n_b AS BIGINT) AS n_b,
       CAST({_X228_NPERM} AS BIGINT) AS n_perm,
       ROUND(o.d_obs, 6) AS diff_obs,
       CAST(SUM(CASE WHEN ABS(p.d) >= ABS(o.d_obs) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_as_extreme,
       ROUND((SUM(CASE WHEN ABS(p.d) >= ABS(o.d_obs) THEN 1 ELSE 0 END)
              + 1) / CAST({_X228_NPERM + 1} AS DOUBLE), 6) AS p_value
FROM per_b p CROSS JOIN obs o
GROUP BY o.n_units, o.n_a, o.n_b, o.d_obs
"""

EXT10_QUERIES.update({"x228_randomization": q_x228_randomization})
EXT10_ORACLES.update({"x228_randomization": SQL_X228})


# ----------------------------- x229: Durbin–Watson residual test


def q_x229_durbin_watson(spark, sf_dir):
    """Residual serial correlation (operators/temporal.py:
    durbin_watson) of the per-day mean event value per event type
    after a linear trend fit — are the trend's (x65) leftovers
    independent, or is its SE lying; the residual-side companion to
    the raw-series autocorrelation (x70)."""
    from .operators.temporal import durbin_watson

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
    out = durbin_watson(day, ["event_type"], "day", "x")
    return out.orderBy("event_type")


SQL_X229 = """
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
         CAST(SUM(day * day) AS DOUBLE) AS sxx
  FROM day GROUP BY 1
),
fit AS (
  SELECT event_type, n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
           AS icept
  FROM m
),
resid AS (
  SELECT d.event_type, f.n, f.slope, d.day,
         d.x - (f.icept + f.slope * d.day) AS e
  FROM day d JOIN fit f ON d.event_type = f.event_type
),
terms AS (
  SELECT event_type, n, slope,
         CAST(e * e AS DECIMAL(38,12)) AS e2,
         CASE WHEN el IS NOT NULL
              THEN CAST((e - el) * (e - el) AS DECIMAL(38,12)) END AS d2
  FROM (
    SELECT *, LAG(e) OVER (PARTITION BY event_type ORDER BY day) AS el
    FROM resid
  )
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       ROUND(slope, 6) AS slope,
       ROUND(CAST(SUM(d2) AS DOUBLE) / CAST(SUM(e2) AS DOUBLE), 6) AS dw,
       ROUND(1 - CAST(SUM(d2) AS DOUBLE) / CAST(SUM(e2) AS DOUBLE) / 2,
             6) AS rho1
FROM terms
GROUP BY event_type, n, slope
ORDER BY event_type
"""

EXT10_QUERIES.update({"x229_durbin_watson": q_x229_durbin_watson})
EXT10_ORACLES.update({"x229_durbin_watson": SQL_X229})


# ----------------------------- x230: trig-free periodicity scan


_X230_PERIODS = (2, 3, 4, 5, 6, 7, 10, 14)


def q_x230_periodicity(spark, sf_dir):
    """Dominant-period detection (operators/temporal.py:
    periodicity_scan) on daily event counts per event type: the
    variance-ratio periodogram — which cycle length (2..14 days)
    explains the most volume variance, found without a single libm
    cos() so both engines agree to the last bit."""
    from .operators.temporal import periodicity_scan

    ev = _read_events(spark, sf_dir)
    day = ev.groupBy(
        "event_type",
        F.expr("ts_us div 86400000000").cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    out = periodicity_scan(
        day, ["event_type"], "day", "n_ev", periods=_X230_PERIODS
    )
    return out.orderBy("event_type")


SQL_X230 = f"""
WITH day AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS n_ev
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(n_ev AS DECIMAL(28,6))) AS s1,
         SUM(CAST(n_ev * n_ev AS DECIMAL(28,6))) AS s2
  FROM day GROUP BY 1
),
ph AS (
  SELECT event_type, p,
         CAST(SUM(bt) AS DOUBLE) AS bsum
  FROM (
    SELECT event_type, p.p AS p, day % p.p AS phase,
           CAST(CAST(SUM(CAST(n_ev AS DECIMAL(28,6))) AS DOUBLE)
                * CAST(SUM(CAST(n_ev AS DECIMAL(28,6))) AS DOUBLE)
                / COUNT(*) AS DECIMAL(38,12)) AS bt
    FROM day CROSS JOIN
         (SELECT unnest({list(_X230_PERIODS)}) AS p) p
    GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
),
scored AS (
  SELECT t.event_type, t.n, p.p,
         ROUND((p.bsum - CAST(t.s1 AS DOUBLE) * CAST(t.s1 AS DOUBLE)
                         / CAST(t.n AS DOUBLE))
               / (CAST(t.s2 AS DOUBLE)
                  - CAST(t.s1 AS DOUBLE) * CAST(t.s1 AS DOUBLE)
                    / CAST(t.n AS DOUBLE)), 6) AS r2
  FROM ph p JOIN tot t ON p.event_type = t.event_type
),
best AS (
  SELECT event_type, n, r2, p,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY r2 DESC, p ASC) AS rk
  FROM scored
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_points,
       CAST(p AS BIGINT) AS best_period,
       r2 AS strength
FROM best WHERE rk = 1
ORDER BY event_type
"""

EXT10_QUERIES.update({"x230_periodicity": q_x230_periodicity})
EXT10_ORACLES.update({"x230_periodicity": SQL_X230})


# ----------------------------- x231: cluster quality scores


def q_x231_cluster_quality(spark, sf_dir):
    """Simplified silhouette + Davies–Bouldin per label cluster
    (operators/similarity.py:cluster_quality) over the embeddings
    table — the acceptance gate for any clustering the pipeline
    produces (IVF nlist, semdedup groups): tight-and-separated or
    not, without an O(n²) pairwise join."""
    from .operators.similarity import cluster_quality

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cluster_quality(emb, "embedding", "label", "vec_id")
    return out.select(
        F.col("label").cast("long").alias("label"),
        "n",
        "silhouette",
        "scatter",
        "davies_bouldin",
    ).orderBy("label")


SQL_X231 = """
WITH ex AS (
  SELECT vec_id AS id, label AS g, u.d AS d,
         CAST(embedding[u.d] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(d)
  WHERE embedding IS NOT NULL AND label IS NOT NULL
),
cent AS (
  SELECT g AS h, d,
         CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS m
  FROM ex GROUP BY 1, 2
),
d2 AS (
  SELECT e.id, e.g, c.h,
         CAST(sum(CAST((e.x - c.m) * (e.x - c.m) AS DECIMAL(38,12)))
              AS DOUBLE) AS d2
  FROM ex e JOIN cent c ON e.d = c.d
  GROUP BY 1, 2, 3
),
pp AS (
  SELECT id, g,
         sqrt(max(CASE WHEN h = g THEN d2 END)) AS a,
         sqrt(min(CASE WHEN h <> g THEN d2 END)) AS b
  FROM d2 GROUP BY 1, 2
),
per AS (
  SELECT g, count(*) AS n,
         CAST(sum(CAST((b - a) / greatest(a, b) AS DECIMAL(38,12)))
              AS DOUBLE) / count(*) AS sil,
         CAST(sum(CAST(a AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS scat
  FROM pp GROUP BY 1
),
cd AS (
  SELECT a.h AS g, b.h AS h2,
         sqrt(CAST(sum(CAST((a.m - b.m) * (a.m - b.m)
                            AS DECIMAL(38,12))) AS DOUBLE)) AS dc
  FROM cent a JOIN cent b ON a.d = b.d AND a.h <> b.h
  GROUP BY 1, 2
),
db AS (
  SELECT c.g,
         max(round((p1.scat + p2.scat) / c.dc, 6)) AS davies_bouldin
  FROM cd c
  JOIN per p1 ON p1.g = c.g
  JOIN per p2 ON p2.g = c.h2
  GROUP BY 1
)
SELECT CAST(p.g AS BIGINT) AS label,
       CAST(p.n AS BIGINT) AS n,
       round(p.sil, 6) AS silhouette,
       round(p.scat, 6) AS scatter,
       d.davies_bouldin
FROM per p LEFT JOIN db d ON d.g = p.g
ORDER BY label
"""

EXT10_QUERIES.update({"x231_cluster_quality": q_x231_cluster_quality})
EXT10_ORACLES.update({"x231_cluster_quality": SQL_X231})


# ----------------------------- x232: bounded-depth BFS horizon


def q_x232_bfs_horizon(spark, sf_dir):
    """3-hop influence horizon (operators/graph.py:bfs_depths) on the
    sparsified supplier co-occurrence graph (x148's edge rule:
    suppliers tied by ≥2 common orders) from the suppkey%25 == 0
    watchlist — which suppliers are within 3 ties of the seeds, at
    what minimum distance; the reach query a full shortest-paths
    pass over-serves."""
    from .operators.graph import bfs_depths

    ls = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = ls.alias("a"), ls.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
    )
    seeds = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .where(F.col("s_suppkey") % 25 == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    out = bfs_depths(pairs, seeds, max_depth=3)
    return out.select(
        F.col("node").cast("long").alias("node"), "depth"
    ).orderBy("node")


SQL_X232 = """
WITH RECURSIVE ls AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
),
pairs AS (
  SELECT a.s AS u, b.s AS v FROM ls a JOIN ls b
  ON a.o = b.o AND a.s < b.s
),
canon AS (
  SELECT u, v FROM (
    SELECT u, v, count(*) AS w FROM pairs GROUP BY 1, 2
  ) WHERE w >= 2
),
sym AS (
  SELECT u AS s, v AS d FROM canon
  UNION
  SELECT v AS s, u AS d FROM canon
),
seeds AS (
  SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 25 = 0
),
walk(node, depth) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT sym.d, w.depth + 1
  FROM walk w JOIN sym ON sym.s = w.node
  WHERE w.depth < 3
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(min(depth) AS BIGINT) AS depth
FROM walk GROUP BY node ORDER BY node
"""

EXT10_QUERIES.update({"x232_bfs_horizon": q_x232_bfs_horizon})
EXT10_ORACLES.update({"x232_bfs_horizon": SQL_X232})


# ----------------------------- x233: encoding-health audit


def q_x233_byte_anomaly(spark, sf_dir):
    """Per-source encoding-health scan (operators/text.py:
    byte_anomaly_profile): multibyte ratio, control characters,
    U+FFFD incidence — the mojibake tripwire that catches a
    mislabeled-charset feed at ingest (this corpus is clean ASCII,
    which is exactly what the audit should report)."""
    from .operators.text import byte_anomaly_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return byte_anomaly_profile(docs, "text", ["source"]).orderBy("source")


SQL_X233 = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(strlen(text) - length(text)) AS BIGINT) AS multibyte_chars,
       round(CAST(sum(strlen(text) - length(text)) AS DOUBLE)
             / CAST(sum(length(text)) AS DOUBLE), 6) AS multibyte_ratio,
       CAST(sum(length(text) - length(regexp_replace(text,
            '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')))
            AS BIGINT) AS control_chars,
       CAST(sum(CASE WHEN strlen(text) > length(text) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_nonascii,
       CAST(sum(CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_replacement
FROM documents
WHERE text IS NOT NULL
GROUP BY source
ORDER BY source
"""

EXT10_QUERIES.update({"x233_byte_anomaly": q_x233_byte_anomaly})
EXT10_ORACLES.update({"x233_byte_anomaly": SQL_X233})


# ----------------------------- x234: within-doc repetition


def q_x234_repetition(spark, sf_dir):
    """Gopher-family repetition screen (operators/text.py:
    word_repetition_profile): duplicate-word fraction, top-word and
    top-bigram share per document — catches template spam and
    decoding loops that are globally unique (so every dedup pass
    keeps them) yet internally degenerate."""
    from .operators.text import word_repetition_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return word_repetition_profile(docs, "text", "doc_id").orderBy("doc_id")


SQL_X234 = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '') AS tk
  FROM documents
),
toks2 AS (SELECT * FROM toks WHERE len(tk) > 0),
words AS (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS nd, max(c) AS topw
  FROM (
    SELECT doc_id, w, count(*) AS c
    FROM (SELECT doc_id, unnest(tk) AS w FROM toks2)
    GROUP BY 1, 2
  ) GROUP BY 1
),
bigr AS (
  SELECT doc_id, sum(c) AS nb, max(c) AS topb
  FROM (
    SELECT doc_id, b.w1, b.w2, count(*) AS c
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
               i -> {'w1': tk[CAST(i AS INTEGER)],
                     'w2': tk[CAST(i AS INTEGER) + 1]})) AS b
      FROM toks2 WHERE len(tk) >= 2
    ) GROUP BY 1, 2, 3
  ) GROUP BY 1
)
SELECT CAST(w.doc_id AS BIGINT) AS doc_id,
       CAST(w.n_tokens AS BIGINT) AS n_tokens,
       round(1 - CAST(w.nd AS DOUBLE) / CAST(w.n_tokens AS DOUBLE), 6)
         AS dup_word_frac,
       round(CAST(w.topw AS DOUBLE) / CAST(w.n_tokens AS DOUBLE), 6)
         AS top_word_share,
       round(CAST(b.topb AS DOUBLE) / CAST(b.nb AS DOUBLE), 6)
         AS top_bigram_share
FROM words w LEFT JOIN bigr b ON b.doc_id = w.doc_id
ORDER BY doc_id
"""

EXT10_QUERIES.update({"x234_repetition": q_x234_repetition})
EXT10_ORACLES.update({"x234_repetition": SQL_X234})


# ----------------------------- x235: personalized PageRank


def q_x235_ppr(spark, sf_dir):
    """Random-walk-with-restart proximity (operators/graph.py:
    personalized_pagerank) from the suppkey%25 watchlist over the
    x148 co-occurrence graph — the weighted refinement of the hard
    3-hop horizon (x232): not just who is within reach, but how
    strongly each node is tied to the seeds."""
    from .operators.graph import personalized_pagerank

    ls = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = ls.alias("a"), ls.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
    )
    seeds = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .where(F.col("s_suppkey") % 25 == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    out = personalized_pagerank(
        pairs, seeds, n_iter=3, damping=0.85, restart=0.15
    )
    return out.select(
        F.col("node").cast("long").alias("node"), "rank"
    ).orderBy("node")


def _ppr_sql(n_iter: int = 3) -> str:
    head = """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
),
pairs AS (
  SELECT a.s AS u, b.s AS v FROM ls a JOIN ls b
  ON a.o = b.o AND a.s < b.s
),
canon AS (
  SELECT u, v, count(*) AS w FROM pairs GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT u AS s, v AS d, CAST(w AS DOUBLE) AS w FROM canon
  UNION ALL
  SELECT v AS s, u AS d, CAST(w AS DOUBLE) AS w FROM canon
),
outw AS (SELECT s, SUM(w) AS wo FROM sym GROUP BY 1),
adj AS (
  SELECT sym.s, sym.d, sym.w / outw.wo AS p
  FROM sym JOIN outw ON outw.s = sym.s
),
seeds AS (
  SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 25 = 0
),
prior AS (
  SELECT node, 1.0 / (SELECT COUNT(*) FROM seeds) AS pr FROM seeds
),
r0 AS (SELECT node, pr AS rank FROM prior)"""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(f""",
c{i} AS (
  SELECT a.d AS node,
         CAST(SUM(CAST(r.rank * a.p AS DECIMAL(28,18))) AS DOUBLE) AS m
  FROM r{i - 1} r JOIN adj a ON a.s = r.node GROUP BY 1
),
r{i} AS (
  SELECT COALESCE(p.node, c.node) AS node,
         0.15 * COALESCE(p.pr, 0) + 0.85 * COALESCE(c.m, 0) AS rank
  FROM prior p FULL OUTER JOIN c{i} c ON c.node = p.node
)""")
    tail = f"""
SELECT CAST(node AS BIGINT) AS node, ROUND(rank, 6) AS rank
FROM r{n_iter} ORDER BY node
"""
    return head + "".join(steps) + tail


SQL_X235 = _ppr_sql(3)

EXT10_QUERIES.update({"x235_ppr": q_x235_ppr})
EXT10_ORACLES.update({"x235_ppr": SQL_X235})


# ----------------------------- x236: AR(1) persistence / half-life


def q_x236_ar1(spark, sf_dir):
    """Shock persistence (operators/temporal.py:ar1_halflife): lag-1
    autoregression of the per-day mean event value per event type
    over consecutive days — the mean-reversion half-life that turns
    the autocorrelation scan (x70) and residual check (x229) into a
    forecastable horizon."""
    from .operators.temporal import ar1_halflife

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
    return ar1_halflife(day, ["event_type"], "day", "x").orderBy(
        "event_type"
    )


SQL_X236 = """
WITH day AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pairs AS (
  SELECT event_type, x AS y, yl
  FROM (
    SELECT event_type, day, x,
           LAG(x) OVER w AS yl,
           LAG(day) OVER w AS xl
    FROM day
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
  )
  WHERE yl IS NOT NULL AND day = xl + 1
),
m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(yl AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(yl * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(yl * yl AS DECIMAL(28,6))) AS DOUBLE) AS sxx
  FROM pairs GROUP BY 1
),
fit AS (
  SELECT event_type, n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS rho,
         sy, sx
  FROM m
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND(rho, 6) AS rho,
       ROUND((sy - rho * sx) / n, 6) AS intercept,
       ROUND(CASE WHEN rho > 0 AND rho < 1
                  THEN ln(2.0) / -ln(rho) END, 6) AS half_life
FROM fit
ORDER BY event_type
"""

EXT10_QUERIES.update({"x236_ar1": q_x236_ar1})
EXT10_ORACLES.update({"x236_ar1": SQL_X236})


# ----------------------------- x237: Welch's unequal-variance t


def q_x237_welch(spark, sf_dir):
    """Welch's t on the x66 hash split's per-user total value
    (operators/behavior.py:welch_t) — the mean test that doesn't
    assume equal arm variances; its p should agree with the
    randomization test (x228) on this A/A split."""
    from .operators.behavior import welch_t

    ev = _read_events(spark, sf_dir)
    units = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(25,12)"))
            .cast("double")
            .alias("y")
        )
        .select(
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("ab:"),
                                F.col("user_id").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                / F.lit(4294967296.0)
                < 0.5,
                F.lit("a"),
            )
            .otherwise(F.lit("b"))
            .alias("variant"),
            "y",
        )
    )
    return welch_t(units, "variant", "y")


def _sql_x237() -> str:
    from .queries_ext9 import _normal_p_two_sided_sql

    t = "((sa / n_a - sb / n_b) / sqrt(va / n_a + vb / n_b))"
    return f"""
WITH units AS (
  SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 'a' ELSE 'b' END AS v,
         CAST(CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE)
              AS DECIMAL(28,6)) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id
),
agg AS (
  SELECT CAST(SUM(CASE WHEN v = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN v = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN v = 'a' THEN y END) AS DOUBLE) AS sa,
         CAST(SUM(CASE WHEN v = 'b' THEN y END) AS DOUBLE) AS sb,
         CAST(SUM(CASE WHEN v = 'a' THEN y * y END) AS DOUBLE) AS qa,
         CAST(SUM(CASE WHEN v = 'b' THEN y * y END) AS DOUBLE) AS qb
  FROM units
),
vv AS (
  SELECT n_a, n_b, sa, sb,
         (qa - sa * sa / n_a) / (n_a - 1.0) AS va,
         (qb - sb * sb / n_b) / (n_b - 1.0) AS vb
  FROM agg
)
SELECT n_a, n_b,
       ROUND(sa / n_a, 6) AS mean_a,
       ROUND(sb / n_b, 6) AS mean_b,
       ROUND({t}, 6) AS t_stat,
       ROUND((va / n_a + vb / n_b) * (va / n_a + vb / n_b)
             / (va * va / (n_a * n_a * (n_a - 1.0))
                + vb * vb / (n_b * n_b * (n_b - 1.0))), 6) AS df,
       ROUND({_normal_p_two_sided_sql(t)}, 6) AS p_value
FROM vv
"""


SQL_X237 = _sql_x237()

EXT10_QUERIES.update({"x237_welch": q_x237_welch})
EXT10_ORACLES.update({"x237_welch": SQL_X237})


# ----------------------------- x238: sampled overlap estimator


_X238_MOD = 4


def q_x238_sampled_overlap(spark, sf_dir):
    """Fingerprint-space-sampled cross-source overlap estimate
    (operators/dedup.py:sampled_overlap_estimate) on the recrawl
    corpus — the 1/m-cost screen that decides which source pairs
    deserve the exact matrix (x52); sampling by fingerprint keeps
    both sides of every duplicate together, so the scaled count is
    unbiased."""
    from .operators.dedup import sampled_overlap_estimate

    from .queries_ext import _docs_with_recrawls

    docs = _docs_with_recrawls(spark, sf_dir)
    out = sampled_overlap_estimate(
        docs, "text", "source", sample_mod=_X238_MOD, salt="ovl"
    )
    return out.orderBy("group_a", "group_b")


def _sql_x238() -> str:
    from .queries_ext import SQL_RECRAWL_DOCS

    return f"""
WITH sets AS (
  SELECT DISTINCT source AS g,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM {SQL_RECRAWL_DOCS} d
),
sampled AS (
  SELECT g, fp FROM sets
  WHERE ('0x' || substr(md5('ovl:' || fp), 1, 8))::BIGINT
        % {_X238_MOD} = 0
),
sizes AS (SELECT g, COUNT(*) AS n FROM sampled GROUP BY g),
common AS (
  SELECT a.g AS group_a, b.g AS group_b, COUNT(*) AS nc
  FROM sampled a JOIN sampled b ON a.fp = b.fp AND a.g < b.g
  GROUP BY 1, 2
)
SELECT c.group_a, c.group_b,
       CAST(sa.n AS BIGINT) AS n_a_sampled,
       CAST(sb.n AS BIGINT) AS n_b_sampled,
       CAST(c.nc AS BIGINT) AS n_common_sampled,
       CAST(c.nc * {_X238_MOD} AS BIGINT) AS est_n_common,
       ROUND({_X238_MOD}.0 * sqrt(CAST(c.nc AS DOUBLE)), 6) AS se_est
FROM common c
JOIN sizes sa ON c.group_a = sa.g
JOIN sizes sb ON c.group_b = sb.g
ORDER BY c.group_a, c.group_b
"""


SQL_X238 = _sql_x238()

EXT10_QUERIES.update({"x238_sampled_overlap": q_x238_sampled_overlap})
EXT10_ORACLES.update({"x238_sampled_overlap": SQL_X238})


# ----------------------------- x239: difference-in-differences


def q_x239_did(spark, sf_dir):
    """Observational launch-impact estimate (operators/behavior.py:
    diff_in_diff): per-user pre/post total value around the x58
    cutoff, arms from the x66 hash split relabeled t/c — the
    parallel-trends estimator for rollouts that weren't randomized;
    on this A/A-like split the DID should be statistically flat."""
    from .operators.behavior import diff_in_diff
    from .queries_ext import _X58_CUTOFF_US

    ev = _read_events(spark, sf_dir)
    cut = F.lit(_X58_CUTOFF_US)
    per = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts_us") < cut,
                    F.col("value").cast("decimal(25,12)"),
                )
            )
            .cast("double")
            .alias("pre"),
            F.sum(
                F.when(
                    F.col("ts_us") >= cut,
                    F.col("value").cast("decimal(25,12)"),
                )
            )
            .cast("double")
            .alias("post"),
        )
    )
    units = per.select(
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ab:"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            / F.lit(4294967296.0)
            < 0.5,
            F.lit("t"),
        )
        .otherwise(F.lit("c"))
        .alias("variant"),
        "pre",
        "post",
    )
    return diff_in_diff(units, "variant", "pre", "post")


def _sql_x239() -> str:
    from .queries_ext import _X58_CUTOFF_US
    from .queries_ext9 import _normal_p_two_sided_sql

    z = "((dt / n_t - dc / n_c) / sqrt(vt / n_t + vc / n_c))"
    return f"""
WITH per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN epoch_us(ts) < {_X58_CUTOFF_US}
                  THEN CAST(value AS DECIMAL(25,12)) END) AS DOUBLE)
           AS pre,
         CAST(SUM(CASE WHEN epoch_us(ts) >= {_X58_CUTOFF_US}
                  THEN CAST(value AS DECIMAL(25,12)) END) AS DOUBLE)
           AS post
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id
),
units AS (
  SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 't' ELSE 'c' END AS v,
         CAST(pre AS DECIMAL(28,6)) AS pre,
         CAST(post AS DECIMAL(28,6)) AS post,
         CAST(post - pre AS DECIMAL(28,6)) AS d
  FROM per
  WHERE pre IS NOT NULL AND post IS NOT NULL
),
agg AS (
  SELECT CAST(SUM(CASE WHEN v = 't' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN v = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN v = 't' THEN pre END) AS DOUBLE) AS pt,
         CAST(SUM(CASE WHEN v = 't' THEN post END) AS DOUBLE) AS ot,
         CAST(SUM(CASE WHEN v = 'c' THEN pre END) AS DOUBLE) AS pc,
         CAST(SUM(CASE WHEN v = 'c' THEN post END) AS DOUBLE) AS oc,
         CAST(SUM(CASE WHEN v = 't' THEN d END) AS DOUBLE) AS dt,
         CAST(SUM(CASE WHEN v = 'c' THEN d END) AS DOUBLE) AS dc,
         CAST(SUM(CASE WHEN v = 't' THEN d * d END) AS DOUBLE) AS qt,
         CAST(SUM(CASE WHEN v = 'c' THEN d * d END) AS DOUBLE) AS qc
  FROM units
),
vv AS (
  SELECT n_t, n_c, pt, ot, pc, oc, dt, dc,
         (qt - dt * dt / n_t) / (n_t - 1.0) AS vt,
         (qc - dc * dc / n_c) / (n_c - 1.0) AS vc
  FROM agg
)
SELECT n_t, n_c,
       ROUND(pt / n_t, 6) AS pre_t,
       ROUND(ot / n_t, 6) AS post_t,
       ROUND(pc / n_c, 6) AS pre_c,
       ROUND(oc / n_c, 6) AS post_c,
       ROUND(dt / n_t - dc / n_c, 6) AS did,
       ROUND(sqrt(vt / n_t + vc / n_c), 6) AS se,
       ROUND({z}, 6) AS z,
       ROUND({_normal_p_two_sided_sql(z)}, 6) AS p_value
FROM vv
"""


SQL_X239 = _sql_x239()

EXT10_QUERIES.update({"x239_did": q_x239_did})
EXT10_ORACLES.update({"x239_did": SQL_X239})


# ----------------------------- x240: Mahalanobis joint outliers


def q_x240_mahalanobis(spark, sf_dir):
    """Joint-tail outlier ranking (operators/sketch.py:
    mahalanobis_outliers): top-20 (quantity, extendedprice) rows per
    returnflag by closed-form 2x2 Mahalanobis distance — the
    correlation-breaking rows the per-column screens (x37, x51)
    cannot see."""
    from .operators.sketch import mahalanobis_outliers

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = mahalanobis_outliers(
        li,
        ["l_returnflag"],
        "l_quantity",
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        top_n=20,
    )
    return out.select(
        "l_returnflag",
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "x",
        "y",
        "d2",
        "rank",
    ).orderBy("l_returnflag", "rank")


SQL_X240 = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))
              AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice
                       AS DECIMAL(28,6))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6)))
              AS DOUBLE) AS sxy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1
),
stats AS (
  SELECT l_returnflag,
         sx / n AS mx, sy / n AS my,
         sxx / n - (sx / n) * (sx / n) AS vxx,
         syy / n - (sy / n) * (sy / n) AS vyy,
         sxy / n - (sx / n) * (sy / n) AS vxy,
         (sxx / n - (sx / n) * (sx / n))
           * (syy / n - (sy / n) * (sy / n))
           - (sxy / n - (sx / n) * (sy / n))
             * (sxy / n - (sx / n) * (sy / n)) AS det
  FROM m
),
scored AS (
  SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber,
         l.l_quantity AS x, l.l_extendedprice AS y,
         ROUND((s.vyy * (l.l_quantity - s.mx) * (l.l_quantity - s.mx)
                - 2.0 * s.vxy * (l.l_quantity - s.mx)
                      * (l.l_extendedprice - s.my)
                + s.vxx * (l.l_extendedprice - s.my)
                        * (l.l_extendedprice - s.my)) / s.det,
               6) AS d2
  FROM lineitem l JOIN stats s
  ON l.l_returnflag = s.l_returnflag AND s.det > 0
  WHERE l.l_quantity IS NOT NULL AND l.l_extendedprice IS NOT NULL
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY d2 DESC, l_orderkey, l_linenumber) AS rank
  FROM scored
)
SELECT l_returnflag,
       CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       x, y, d2,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 20
ORDER BY l_returnflag, rank
"""

EXT10_QUERIES.update({"x240_mahalanobis": q_x240_mahalanobis})
EXT10_ORACLES.update({"x240_mahalanobis": SQL_X240})


# ----------------------------- x241: green-list watermark screen


def q_x241_watermark(spark, sf_dir):
    """Synthetic-text watermark screen (operators/text.py:
    watermark_screen): per-doc green-token excess z under the
    Kirchenbauer-style hash green list — the recycled-model-output
    tripwire; on organic text green_rate sits at 1/2 and nothing
    flags."""
    from .operators.text import watermark_screen

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return watermark_screen(docs, "text", "doc_id").orderBy("doc_id")


SQL_X241 = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '') AS tk
  FROM documents
),
per AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         SUM(('0x' || substr(md5('wm:' || w), 1, 8))::BIGINT % 2)
           AS n_green
  FROM (SELECT doc_id, unnest(tk) AS w FROM toks WHERE len(tk) > 0)
  GROUP BY 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_green AS BIGINT) AS n_green,
       ROUND(CAST(n_green AS DOUBLE) / n_tokens, 6) AS green_rate,
       ROUND((n_green - n_tokens / 2.0) / sqrt(n_tokens / 4.0), 6) AS z,
       ROUND((n_green - n_tokens / 2.0) / sqrt(n_tokens / 4.0), 6)
         >= 4.0 AS flagged
FROM per
ORDER BY doc_id
"""

EXT10_QUERIES.update({"x241_watermark": q_x241_watermark})
EXT10_ORACLES.update({"x241_watermark": SQL_X241})


# ----------------------------- x242: join-key hash-width audit


_X242_WIDTHS = (16, 24, 32, 40)


def q_x242_hash_widths(spark, sf_dir):
    """Surrogate-key truncation audit (operators/quality.py:
    hash_width_audit) over lineitem order keys: exact colliding-key
    counts per candidate bit width next to the birthday expectation
    — the measurement that licenses a narrow shuffle key at 100 TB."""
    from .operators.quality import hash_width_audit

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return hash_width_audit(
        li, "l_orderkey", bit_widths=_X242_WIDTHS, salt="hw"
    ).orderBy("bits")


def _sql_x242() -> str:
    parts = []
    for b in _X242_WIDTHS:
        parts.append(f"""
  SELECT CAST({b} AS BIGINT) AS bits,
         CAST(SUM(c) AS BIGINT) AS n_keys,
         CAST(SUM(c - 1) AS BIGINT) AS n_colliding
  FROM (
    SELECT substr(h, 1, {b // 4}) AS bkt, COUNT(*) AS c
    FROM keys GROUP BY 1
  )""")
    body = "\n  UNION ALL\n".join(parts)
    return f"""
WITH keys AS (
  SELECT md5('hw:' || CAST(l_orderkey AS VARCHAR)) AS h
  FROM (SELECT DISTINCT l_orderkey FROM lineitem
        WHERE l_orderkey IS NOT NULL)
),
w AS ({body})
SELECT bits, n_keys, n_colliding,
       ROUND(CAST(n_colliding AS DOUBLE) / n_keys, 6) AS collision_rate,
       ROUND(CAST(n_keys AS DOUBLE) * n_keys
             / pow(2.0, CAST(bits + 1 AS DOUBLE)), 6) AS birthday_expected
FROM w
ORDER BY bits
"""


SQL_X242 = _sql_x242()

EXT10_QUERIES.update({"x242_hash_widths": q_x242_hash_widths})
EXT10_ORACLES.update({"x242_hash_widths": SQL_X242})


# ----------------------------- x243: Bloom filter FPR audit


_X243_M, _X243_K = 4096, 3


def q_x243_bloom_fpr(spark, sf_dir):
    """Bloom pre-filter sizing gauge (operators/bloom.py:
    bloom_fpr_audit): even part keys build the filter, odd keys probe
    it — measured false-positive rate next to the fill-based
    expectation, the audit that sizes (m, k) before x87's semi-join
    trusts the filter."""
    from .operators.bloom import bloom_fpr_audit

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    members = part.where(F.col("p_partkey") % 2 == 0)
    probes = part.where(F.col("p_partkey") % 2 == 1)
    return bloom_fpr_audit(
        members, probes, "p_partkey", "p_partkey",
        m=_X243_M, k=_X243_K, salt="bloom",
    )


def _sql_x243() -> str:
    m, k = _X243_M, _X243_K
    pos_arms = "\n  UNION\n".join(
        f"""  SELECT ('0x' || substr(md5('bloom:{i}:' || CAST(k AS VARCHAR)),
         1, 8))::BIGINT % {m} AS pos FROM mem"""
        for i in range(k)
    )
    probe_cols = ", ".join(
        f"""('0x' || substr(md5('bloom:{i}:' || CAST(k AS VARCHAR)),
         1, 8))::BIGINT % {m}"""
        for i in range(k)
    )
    fill = " * ".join(["(CAST(f.bits_set AS DOUBLE) / {m})".format(m=m)] * k)
    return f"""
WITH mem AS (
  SELECT DISTINCT p_partkey AS k FROM part
  WHERE p_partkey % 2 = 0 AND p_partkey IS NOT NULL
),
pos AS (
{pos_arms}
),
f AS (SELECT COUNT(*) AS bits_set FROM pos),
nm AS (SELECT COUNT(*) AS n_members FROM mem),
pr AS (
  SELECT DISTINCT p_partkey AS k FROM part
  WHERE p_partkey % 2 = 1 AND p_partkey IS NOT NULL
    AND p_partkey NOT IN (SELECT k FROM mem)
),
pp AS (
  SELECT k, list_distinct([{probe_cols}]) AS plist FROM pr
),
hits AS (
  SELECT p.k, len(p.plist) AS np, COUNT(*) AS nhit
  FROM (SELECT k, plist, unnest(plist) AS pos FROM pp) p
  JOIN pos ON pos.pos = p.pos
  GROUP BY p.k, len(p.plist)
),
fp AS (
  SELECT COUNT(*) AS n_false_pos FROM hits WHERE nhit = np
),
npr AS (SELECT COUNT(*) AS n_probes FROM pr)
SELECT CAST({m} AS BIGINT) AS m,
       CAST({k} AS BIGINT) AS k,
       CAST(nm.n_members AS BIGINT) AS n_members,
       CAST(f.bits_set AS BIGINT) AS bits_set,
       ROUND(CAST(f.bits_set AS DOUBLE) / {m}, 6) AS fill_ratio,
       CAST(npr.n_probes AS BIGINT) AS n_probes,
       CAST(fp.n_false_pos AS BIGINT) AS n_false_pos,
       ROUND(CAST(fp.n_false_pos AS DOUBLE) / npr.n_probes, 6)
         AS fpr_measured,
       ROUND({fill}, 6) AS fpr_expected
FROM nm CROSS JOIN f CROSS JOIN npr CROSS JOIN fp
"""


SQL_X243 = _sql_x243()

EXT10_QUERIES.update({"x243_bloom_fpr": q_x243_bloom_fpr})
EXT10_ORACLES.update({"x243_bloom_fpr": SQL_X243})


# ----------------------------- x244: session gap-threshold sweep


_X244_THS = (900_000_000, 1_800_000_000, 3_600_000_000, 7_200_000_000)


def q_x244_gap_sweep(spark, sf_dir):
    """Sessionization calibration (operators/behavior.py:
    session_gap_sweep): session counts at four candidate inactivity
    gaps from ONE lag pass — the table consulted before the 30-minute
    default is hard-coded into the x11 sessionizer."""
    from .operators.behavior import session_gap_sweep

    ev = _read_events(spark, sf_dir)
    return session_gap_sweep(
        ev, entity_col="user_id", ts_col="ts_us",
        thresholds_us=_X244_THS,
    ).orderBy("threshold_us")


def _sql_x244() -> str:
    arms = "\n  UNION ALL\n".join(
        f"""  SELECT CAST({t} AS BIGINT) AS threshold_us,
         n_users, n_events,
         CAST(n_users + b_{t} AS BIGINT) AS n_sessions
  FROM agg"""
        for t in _X244_THS
    )
    counters = ",\n         ".join(
        f"SUM(CASE WHEN gap > {t} THEN 1 ELSE 0 END) AS b_{t}"
        for t in _X244_THS
    )
    return f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
  FROM events
),
agg AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         {counters}
  FROM gaps
),
sw AS (
{arms}
)
SELECT threshold_us, n_users, n_events, n_sessions,
       ROUND(CAST(n_events AS DOUBLE) / n_sessions, 6)
         AS events_per_session
FROM sw ORDER BY threshold_us
"""


SQL_X244 = _sql_x244()

EXT10_QUERIES.update({"x244_gap_sweep": q_x244_gap_sweep})
EXT10_ORACLES.update({"x244_gap_sweep": SQL_X244})


# ----------------------------- x245: PQ asymmetric-distance search


def q_x245_pq_search(spark, sf_dir):
    """IVF-PQ's scoring half (operators/similarity.py:pq_topk):
    top-10 neighbors per query scored entirely from one-byte PQ
    codes via ADC lookup tables — the memory-compressed search that
    completes the x114 encoder and the x05c coarse quantizer into
    the full IVF-PQ stack.  Codebooks pinned to the vec_id<8 slices
    (the x114 rule); queries are vec_id<5."""
    from .operators.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pinned = (
        emb.where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    cents = [
        [
            [float(x) for x in r["embedding"][s * 16 : (s + 1) * 16]]
            for r in pinned
        ]
        for s in range(4)
    ]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = pq_topk(
        emb, queries, centroids=cents, sub_dims=16, k=10
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("id").cast("long").alias("id"),
        "adist",
        "rank",
    ).orderBy("query_id", "rank")


SQL_X245 = """
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT id AS code, v AS cv FROM e WHERE id < 8),
subd AS (
  SELECT e.id, s.s, cent.code,
         list_reduce(list_transform(range(1, 17),
           i -> (e.v[CAST(s.s * 16 + i AS INTEGER)]
                 - cent.cv[CAST(s.s * 16 + i AS INTEGER)])
                * (e.v[CAST(s.s * 16 + i AS INTEGER)]
                   - cent.cv[CAST(s.s * 16 + i AS INTEGER)])),
           (a, x) -> a + x) AS d2
  FROM e CROSS JOIN cent, range(0, 4) AS s(s)
),
codes AS (
  SELECT id, s, code FROM (
    SELECT id, s, code,
           ROW_NUMBER() OVER (PARTITION BY id, s ORDER BY d2, code) AS rn
    FROM subd
  ) WHERE rn = 1
),
q AS (SELECT id AS qid, v FROM e WHERE id < 5),
lut AS (
  SELECT q.qid, s.s, cent.code,
         list_reduce(list_transform(range(1, 17),
           i -> (q.v[CAST(s.s * 16 + i AS INTEGER)]
                 - cent.cv[CAST(s.s * 16 + i AS INTEGER)])
                * (q.v[CAST(s.s * 16 + i AS INTEGER)]
                   - cent.cv[CAST(s.s * 16 + i AS INTEGER)])),
           (a, x) -> a + x) AS d2
  FROM q CROSS JOIN cent, range(0, 4) AS s(s)
),
adc AS (
  SELECT l.qid, c.id,
         max(CASE WHEN c.s = 0 THEN l.d2 END)
           + max(CASE WHEN c.s = 1 THEN l.d2 END)
           + max(CASE WHEN c.s = 2 THEN l.d2 END)
           + max(CASE WHEN c.s = 3 THEN l.d2 END) AS total
  FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
  GROUP BY l.qid, c.id
),
ranked AS (
  SELECT qid, id, ROUND(total, 6) AS adist,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY ROUND(total, 6), id) AS rank
  FROM adc
)
SELECT CAST(qid AS BIGINT) AS query_id,
       CAST(id AS BIGINT) AS id,
       adist,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""

EXT10_QUERIES.update({"x245_pq_search": q_x245_pq_search})
EXT10_ORACLES.update({"x245_pq_search": SQL_X245})


# ----------------------------- x246: full IVF-PQ search


def q_x246_ivfpq(spark, sf_dir):
    """The assembled IVF-PQ stack (operators/similarity.py:
    ivf_pq_topk): coarse cells pinned to vec_id 8..15 prune the
    lists (nprobe=2), PQ codebooks pinned to vec_id<8 slices score
    candidates from one-byte codes via ADC — touch nprobe/n_cells of
    the corpus and never the original floats; x05c (exact re-rank)
    and x245 (full-scan ADC) are its two halves."""
    from .operators.similarity import ivf_pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pinned = (
        emb.where(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    pq_cents = [
        [
            [float(x) for x in r["embedding"][s * 16 : (s + 1) * 16]]
            for r in pinned
            if r["vec_id"] < 8
        ]
        for s in range(4)
    ]
    coarse = [
        [float(x) for x in r["embedding"]]
        for r in pinned
        if r["vec_id"] >= 8
    ]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = ivf_pq_topk(
        emb, queries,
        coarse_centroids=coarse, pq_centroids=pq_cents,
        sub_dims=16, nprobe=2, k=10,
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("id").cast("long").alias("id"),
        "cell",
        "adist",
        "rank",
    ).orderBy("query_id", "rank")


SQL_X246 = """
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
pqcent AS (SELECT id AS code, v AS cv FROM e WHERE id < 8),
coarse AS (
  SELECT id - 8 AS cid, v AS cv,
         list_reduce(list_transform(range(1, 65),
             i -> v[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)]),
             (a, x) -> a + x) AS c2
  FROM e WHERE id >= 8 AND id < 16
),
cdists AS (
  SELECT e.id, coarse.cid,
         list_reduce(list_transform(range(1, 65),
             i -> e.v[CAST(i AS INTEGER)] * e.v[CAST(i AS INTEGER)]),
             (a, x) -> a + x)
         - 2.0 * list_reduce(list_transform(range(1, 65),
             i -> e.v[CAST(i AS INTEGER)] * coarse.cv[CAST(i AS INTEGER)]),
             (a, x) -> a + x)
         + coarse.c2 AS d2
  FROM e CROSS JOIN coarse
),
cells AS (
  SELECT id, cid AS cell FROM (
    SELECT id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
    FROM cdists
  ) WHERE rn = 1
),
qprobe AS (
  SELECT id AS qid, cid AS cell FROM (
    SELECT id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
    FROM cdists WHERE id < 5
  ) WHERE rn <= 2
),
subd AS (
  SELECT e.id, s.s, pqcent.code,
         list_reduce(list_transform(range(1, 17),
           i -> (e.v[CAST(s.s * 16 + i AS INTEGER)]
                 - pqcent.cv[CAST(s.s * 16 + i AS INTEGER)])
                * (e.v[CAST(s.s * 16 + i AS INTEGER)]
                   - pqcent.cv[CAST(s.s * 16 + i AS INTEGER)])),
           (a, x) -> a + x) AS d2
  FROM e CROSS JOIN pqcent, range(0, 4) AS s(s)
),
codes AS (
  SELECT id, s, code FROM (
    SELECT id, s, code,
           ROW_NUMBER() OVER (PARTITION BY id, s ORDER BY d2, code) AS rn
    FROM subd
  ) WHERE rn = 1
),
lut AS (
  SELECT q.id AS qid, s.s, pqcent.code,
         list_reduce(list_transform(range(1, 17),
           i -> (q.v[CAST(s.s * 16 + i AS INTEGER)]
                 - pqcent.cv[CAST(s.s * 16 + i AS INTEGER)])
                * (q.v[CAST(s.s * 16 + i AS INTEGER)]
                   - pqcent.cv[CAST(s.s * 16 + i AS INTEGER)])),
           (a, x) -> a + x) AS d2
  FROM (SELECT id, v FROM e WHERE id < 5) q
  CROSS JOIN pqcent, range(0, 4) AS s(s)
),
cand AS (
  SELECT p.qid, c.id, p.cell
  FROM qprobe p JOIN cells c ON c.cell = p.cell
),
adc AS (
  SELECT cd.qid, cd.id, cd.cell,
         max(CASE WHEN k.s = 0 THEN l.d2 END)
           + max(CASE WHEN k.s = 1 THEN l.d2 END)
           + max(CASE WHEN k.s = 2 THEN l.d2 END)
           + max(CASE WHEN k.s = 3 THEN l.d2 END) AS total
  FROM cand cd
  JOIN codes k ON k.id = cd.id
  JOIN lut l ON l.qid = cd.qid AND l.s = k.s AND l.code = k.code
  GROUP BY cd.qid, cd.id, cd.cell
),
ranked AS (
  SELECT qid, id, cell, ROUND(total, 6) AS adist,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY ROUND(total, 6), id) AS rank
  FROM adc
)
SELECT CAST(qid AS BIGINT) AS query_id,
       CAST(id AS BIGINT) AS id,
       CAST(cell AS BIGINT) AS cell,
       adist,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""

EXT10_QUERIES.update({"x246_ivfpq": q_x246_ivfpq})
EXT10_ORACLES.update({"x246_ivfpq": SQL_X246})


# ----------------------------- x247: sampled self-BLEU diversity


def q_x247_self_bleu(spark, sf_dir):
    """Corpus homogeneity audit (operators/text.py:self_bleu_sample):
    modified bigram precision over hash-bucketed adjacent doc pairs —
    the across-doc template alarm that exact dedup can't raise
    (distinct fingerprints can still be 90% the same phrasing)."""
    from .operators.text import self_bleu_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return self_bleu_sample(docs, "text", "doc_id", n_buckets=32)


SQL_X247 = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '') AS tk
  FROM documents
),
toks2 AS (SELECT * FROM toks WHERE len(tk) >= 2),
grams AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(tk)),
             i -> tk[CAST(i AS INTEGER)] || ' '
                  || tk[CAST(i AS INTEGER) + 1])) AS g
    FROM toks2
  ) GROUP BY 1, 2
),
pairs AS (
  SELECT doc_id AS a, partner AS p FROM (
    SELECT doc_id,
           LEAD(doc_id) OVER (
             PARTITION BY ('0x' || substr(md5('sb:' ||
               CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 32
             ORDER BY doc_id) AS partner
    FROM toks2
  ) WHERE partner IS NOT NULL
),
per_pair AS (
  SELECT ROUND(CAST(SUM(LEAST(ga.c, COALESCE(gb.c, 0))) AS DOUBLE)
               / SUM(ga.c), 6) AS p2
  FROM pairs
  JOIN grams ga ON ga.doc_id = pairs.a
  LEFT JOIN grams gb ON gb.doc_id = pairs.p AND gb.g = ga.g
  GROUP BY pairs.a, pairs.p
),
nd AS (SELECT COUNT(*) AS n_docs FROM toks2)
SELECT CAST(nd.n_docs AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(p2 AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 6) AS mean_p2,
       ROUND(CAST(SUM(CASE WHEN p2 > 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS share_high
FROM per_pair CROSS JOIN nd
GROUP BY nd.n_docs
"""

EXT10_QUERIES.update({"x247_self_bleu": q_x247_self_bleu})
EXT10_ORACLES.update({"x247_self_bleu": SQL_X247})
