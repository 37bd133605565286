"""Round-7 extension queries (x278+): storage-layout economics and
decision statistics — zone-map skip audits, differentially-private
release gauges, propensity-weighted effects, posterior A/B readouts.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_ext import _read_events

EXT12_QUERIES: dict = {}
EXT12_ORACLES: dict = {}


# ----------------------------- x278: zone-map skip audit


def q_x278_zone_map(spark, sf_dir):
    """Data-skipping audit (operators/layout.py:zone_map_skip_audit):
    replay eight 90-day range predicates against per-file min/max day
    stats of three candidate orders layouts — hash-scattered,
    key-range, and date-clustered 64-file manifests.  The date layout
    should skip ~7/8 of files per predicate; the hash layout ~0 —
    measured, not assumed, before choosing a table's clustering."""
    from .operators.layout import zone_map_skip_audit
    from .operators.sketch import _hash64

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = orders.where(
        F.col("o_orderkey").isNotNull() & F.col("o_orderdate").isNotNull()
    ).select(
        F.col("o_orderkey").alias("k"),
        F.expr(
            "CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400"
        ).alias("day"),
    )
    mm = base.agg(
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
    )
    wb = base.join(F.broadcast(mm))
    tagged = (
        wb.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("hash").alias("layout"),
                        (_hash64(F.col("k"), "zm") % 64)
                        .cast("long")
                        .alias("file"),
                    ),
                    F.struct(
                        F.lit("key").alias("layout"),
                        F.expr("((k - min_k) * 64) div (max_k - min_k + 1)")
                        .cast("long")
                        .alias("file"),
                    ),
                    F.struct(
                        F.lit("date").alias("layout"),
                        F.expr(
                            "((day - min_day) * 64)"
                            " div (max_day - min_day + 1)"
                        )
                        .cast("long")
                        .alias("file"),
                    ),
                )
            ).alias("lf"),
            "day",
        )
        .select(
            F.col("lf.layout").alias("layout"),
            F.col("lf.file").alias("file"),
            "day",
        )
    )
    fs = tagged.groupBy("layout", "file").agg(
        F.min("day").alias("min_v"),
        F.max("day").alias("max_v"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    preds = spark.range(8).join(F.broadcast(mm)).select(
        F.col("id").cast("long").alias("pred_id"),
        (F.col("min_day") + F.col("id") * 90).alias("lo"),
        (F.col("min_day") + F.col("id") * 90 + 89).alias("hi"),
    )
    return zone_map_skip_audit(fs, preds).orderBy("layout", "pred_id")


SQL_X278 = """
WITH base AS (
  SELECT o_orderkey AS k,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL
),
mm AS (
  SELECT MIN(k) AS min_k, MAX(k) AS max_k,
         MIN(day) AS min_day, MAX(day) AS max_day
  FROM base
),
tagged AS (
  SELECT 'hash' AS layout,
         ('0x' || substr(md5('zm:' || CAST(k AS VARCHAR)), 1, 8))::BIGINT
           % 64 AS file,
         day
  FROM base
  UNION ALL
  SELECT 'key', ((k - mm.min_k) * 64) // (mm.max_k - mm.min_k + 1), day
  FROM base, mm
  UNION ALL
  SELECT 'date',
         ((day - mm.min_day) * 64) // (mm.max_day - mm.min_day + 1), day
  FROM base, mm
),
fs AS (
  SELECT layout, file, MIN(day) AS min_v, MAX(day) AS max_v,
         COUNT(*) AS n_rows
  FROM tagged GROUP BY layout, file
),
preds AS (
  SELECT r AS pred_id, mm.min_day + r * 90 AS lo,
         mm.min_day + r * 90 + 89 AS hi
  FROM range(8) t(r), mm
),
j AS (
  SELECT f.layout, p.pred_id,
         CASE WHEN NOT (f.max_v < p.lo OR f.min_v > p.hi)
              THEN 1 ELSE 0 END AS hit,
         f.n_rows
  FROM fs f CROSS JOIN preds p
)
SELECT layout, CAST(pred_id AS BIGINT) AS pred_id,
       CAST(COUNT(*) AS BIGINT) AS files_total,
       CAST(SUM(hit) AS BIGINT) AS files_hit,
       ROUND(1.0 - CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
             6) AS skip_frac,
       CAST(SUM(hit * n_rows) AS BIGINT) AS rows_bound
FROM j
GROUP BY layout, pred_id
ORDER BY layout, pred_id
"""

EXT12_QUERIES.update({"x278_zone_map": q_x278_zone_map})
EXT12_ORACLES.update({"x278_zone_map": SQL_X278})


# ----------------------------- x279: DP noisy counts


def q_x279_dp_counts(spark, sf_dir):
    """Laplace-mechanism utility gauge (operators/quality.py:
    dp_noisy_counts) on documents (source, lang) counts at
    epsilon in {0.1, 1, 10}: how much count accuracy each privacy
    budget costs — derandomized draws, measured on release-shaped
    non-sensitive data."""
    from .operators.quality import dp_noisy_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dp_noisy_counts(
        docs.where(
            F.col("source").isNotNull() & F.col("lang").isNotNull()
        ),
        ["source", "lang"],
        epsilons=(0.1, 1.0, 10.0),
    )
    return out.orderBy("source", "lang", "epsilon")


SQL_X279 = """
WITH counts AS (
  SELECT source, lang, COUNT(*) AS n_true
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY source, lang
),
eps AS (
  SELECT * FROM (VALUES (0, 0.1), (1, 1.0), (2, 10.0)) e(ei, epsilon)
),
j AS (
  SELECT c.source, c.lang, c.n_true, e.ei, e.epsilon,
         (('0x' || substr(md5('dp:' || CAST(e.ei AS VARCHAR) || ':'
             || c.source || '|' || c.lang), 1, 8))::BIGINT + 0.5)
           / 4294967296.0 AS u
  FROM counts c CROSS JOIN eps e
),
n AS (
  SELECT *,
         -(1.0 / epsilon)
           * (CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END)
           * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
  FROM j
),
rel AS (
  SELECT source, lang, epsilon, n_true,
         CAST(GREATEST(0.0, ROUND(n_true + noise, 0)) AS BIGINT)
           AS n_released
  FROM n
)
SELECT source, lang, epsilon, n_true,
       n_released,
       CAST(ABS(n_released - n_true) AS BIGINT) AS abs_err,
       ROUND(CAST(ABS(n_released - n_true) AS DOUBLE)
             / CAST(n_true AS DOUBLE), 6) AS rel_err
FROM rel
ORDER BY source, lang, epsilon
"""

EXT12_QUERIES.update({"x279_dp_counts": q_x279_dp_counts})
EXT12_ORACLES.update({"x279_dp_counts": SQL_X279})


# ----------------------------- x280: IPW average treatment effect


def q_x280_ipw_ate(spark, sf_dir):
    """Propensity-corrected treatment contrast (operators/behavior.py:
    ipw_ate) on a planted confounded take-up: treatment probability
    rises with user activity x = ln(1+n_events) while the outcome
    (total value) also rises with x, so the raw contrast is selection
    bias — the stabilized-IPW readout is the corrected one."""
    from .operators.behavior import ipw_ate
    from .operators.mixing import uniform_hash01

    ev = _read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.round(
            F.sum(F.col("value").cast("decimal(25,12)")).cast("double"),
            6,
        ).alias("y"),
    )
    x = F.log(F.lit(1.0) + F.col("n_ev").cast("double"))
    take_p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(x - F.lit(3.0)))
    )
    units = per_user.where(F.col("y").isNotNull()).select(
        x.alias("x"),
        "y",
        F.when(
            uniform_hash01(F.col("user_id"), "ipw") < take_p, F.lit(1.0)
        )
        .otherwise(F.lit(0.0))
        .alias("t"),
    )
    return ipw_ate(units, treat_col="t", outcome_col="y", covariate_col="x")


SQL_X280 = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_ev,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE), 6)
           AS y
  FROM events GROUP BY user_id
),
units AS (
  SELECT ln(1.0 + CAST(n_ev AS DOUBLE)) AS x, y,
         CASE WHEN ('0x' || substr(md5('ipw:' || CAST(user_id AS
                VARCHAR)), 1, 8))::BIGINT / 4294967296.0
              < 1.0 / (1.0 + exp(-(ln(1.0 + CAST(n_ev AS DOUBLE))
                                   - 3.0)))
              THEN 1.0 ELSE 0.0 END AS t
  FROM per_user WHERE y IS NOT NULL
),
mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(t AS DECIMAL(38,12))) AS DOUBLE) AS st,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * (t - 0.5) AS DECIMAL(38,12))) AS DOUBLE)
           AS sg1
  FROM units
),
params AS (
  SELECT n, st,
         4.0 * (sxx * (st - 0.5 * n) - sx * sg1)
           / (n * sxx - sx * sx) AS b0,
         4.0 * (n * sg1 - sx * (st - 0.5 * n))
           / (n * sxx - sx * sx) AS b1,
         st / n AS pbar
  FROM mom
),
scored AS (
  SELECT u.t, u.x, u.y, p.b0, p.b1, p.pbar,
         GREATEST(0.01, LEAST(0.99,
           1.0 / (1.0 + exp(-GREATEST(-30.0, LEAST(30.0,
                p.b0 + p.b1 * u.x)))))) AS pc
  FROM units u CROSS JOIN params p
),
ww AS (
  SELECT *, CASE WHEN t > 0.5 THEN pbar / pc
                 ELSE (1.0 - pbar) / (1.0 - pc) END AS w
  FROM scored
),
fin AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(t AS DECIMAL(38,12))) AS BIGINT) AS n_treat,
         MAX(b0) AS b0r, MAX(b1) AS b1r,
         CAST(SUM(CAST(y * t AS DECIMAL(38,12))) AS DOUBLE) AS syt,
         CAST(SUM(CAST(y * (1 - t) AS DECIMAL(38,12))) AS DOUBLE)
           AS syc,
         CAST(SUM(CAST(w * y * t AS DECIMAL(38,12))) AS DOUBLE)
           AS swyt,
         CAST(SUM(CAST(w * t AS DECIMAL(38,12))) AS DOUBLE) AS swt,
         CAST(SUM(CAST(w * y * (1 - t) AS DECIMAL(38,12))) AS DOUBLE)
           AS swyc,
         CAST(SUM(CAST(w * (1 - t) AS DECIMAL(38,12))) AS DOUBLE)
           AS swc,
         CAST(SUM(CAST(w * w * t AS DECIMAL(38,12))) AS DOUBLE)
           AS swwt,
         CAST(SUM(CAST(w * w * (1 - t) AS DECIMAL(38,12))) AS DOUBLE)
           AS swwc
  FROM ww
)
SELECT n, n_treat,
       ROUND(b0r, 6) AS b0, ROUND(b1r, 6) AS b1,
       ROUND(syt / CAST(n_treat AS DOUBLE)
             - syc / (CAST(n AS DOUBLE) - CAST(n_treat AS DOUBLE)), 6)
         AS ate_raw,
       ROUND(swyt / swt - swyc / swc, 6) AS ate_ipw,
       ROUND(swt * swt / swwt, 6) AS ess_treat,
       ROUND(swc * swc / swwc, 6) AS ess_ctrl
FROM fin
"""

EXT12_QUERIES.update({"x280_ipw_ate": q_x280_ipw_ate})
EXT12_ORACLES.update({"x280_ipw_ate": SQL_X280})


# ----------------------------- x281: Bayesian Beta-Binomial A/B


def q_x281_bayes_ab(spark, sf_dir):
    """Posterior decision readout (operators/behavior.py:
    bayes_ab_binomial) on per-user purchase conversion under the
    deterministic 50/50 hash split: P(p_b > p_a) and both expected
    losses from a shared 400-point log-space grid — the ship/hold
    quantities, no incomplete beta required."""
    from .operators.behavior import bayes_ab_binomial
    from .operators.mixing import uniform_hash01

    ev = _read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    arms = per_user.select(
        F.when(uniform_hash01(F.col("user_id"), "ab") < 0.5, "a")
        .otherwise("b")
        .alias("arm"),
        "conv",
    ).groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("s"),
    )
    return bayes_ab_binomial(arms, grid=400)


SQL_X281 = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv
  FROM events GROUP BY user_id
),
arms0 AS (
  SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS
              VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 'a' ELSE 'b' END AS arm,
         conv
  FROM per_user
),
arms AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS s FROM arms0
         GROUP BY arm),
lab AS (SELECT MIN(arm) AS arm_a, MAX(arm) AS arm_b FROM arms),
tagged AS (
  SELECT CASE WHEN a.arm = l.arm_a THEN 'a' ELSE 'b' END AS side,
         CAST(a.n AS DOUBLE) AS n, CAST(a.s AS DOUBLE) AS s
  FROM arms a CROSS JOIN lab l
),
grid AS (SELECT r AS j, (2.0 * r + 1.0) / 800.0 AS p
         FROM range(400) t(r)),
gw AS (
  SELECT side, n, s, j, p,
         (s + 0.0) * ln(p) + (n - s + 0.0) * ln(1.0 - p) AS lw
  FROM tagged CROSS JOIN grid
),
sw AS (
  SELECT *, ROUND(exp(ROUND(lw - MAX(lw) OVER (PARTITION BY side),
                            9)), 12) AS w
  FROM gw
),
nm AS (
  SELECT *, w / CAST(SUM(CAST(w AS DECIMAL(38,18)))
                     OVER (PARTITION BY side) AS DOUBLE) AS pnorm
  FROM sw
),
a_side AS (SELECT j, p, n AS na, s AS sa, pnorm AS pa FROM nm
           WHERE side = 'a'),
b_side AS (SELECT j, n AS nb, s AS sb, pnorm AS pb FROM nm
           WHERE side = 'b'),
ab AS (
  SELECT a.j, a.p, a.na, a.sa, b.nb, b.sb, a.pa, b.pb
  FROM a_side a JOIN b_side b USING (j)
),
pre AS (
  SELECT *,
    COALESCE(CAST(SUM(CAST(pa AS DECIMAL(38,18))) OVER wprev
                  AS DOUBLE), 0.0) AS fa_prev,
    COALESCE(CAST(SUM(CAST(pb AS DECIMAL(38,18))) OVER wprev
                  AS DOUBLE), 0.0) AS fb_prev,
    COALESCE(CAST(SUM(CAST(pa * p AS DECIMAL(38,18))) OVER wprev
                  AS DOUBLE), 0.0) AS sa_prev,
    COALESCE(CAST(SUM(CAST(pb * p AS DECIMAL(38,18))) OVER wprev
                  AS DOUBLE), 0.0) AS sb_prev
  FROM ab
  WINDOW wprev AS (ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
fin AS (
  SELECT ANY_VALUE(na) AS na, ANY_VALUE(sa) AS sa,
         ANY_VALUE(nb) AS nb, ANY_VALUE(sb) AS sb,
    CAST(SUM(CAST(pb * (fa_prev + 0.5 * pa) AS DECIMAL(38,18)))
         AS DOUBLE) AS gt,
    CAST(SUM(CAST(pb * (p * fa_prev - sa_prev) AS DECIMAL(38,18)))
         AS DOUBLE) AS la,
    CAST(SUM(CAST(pa * (p * fb_prev - sb_prev) AS DECIMAL(38,18)))
         AS DOUBLE) AS lb
  FROM pre
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(sa AS BIGINT) AS s_a,
       CAST(nb AS BIGINT) AS n_b, CAST(sb AS BIGINT) AS s_b,
       ROUND((sa + 1.0) / (na + 2.0), 6) AS post_mean_a,
       ROUND((sb + 1.0) / (nb + 2.0), 6) AS post_mean_b,
       ROUND(gt, 6) AS p_b_gt_a,
       ROUND(la, 6) AS exp_loss_a,
       ROUND(lb, 6) AS exp_loss_b
FROM fin
"""

EXT12_QUERIES.update({"x281_bayes_ab": q_x281_bayes_ab})
EXT12_ORACLES.update({"x281_bayes_ab": SQL_X281})


# ----------------------------- x282: JL projection distortion audit


def q_x282_jl_audit(spark, sf_dir):
    """Random-projection distortion certificate (operators/
    similarity.py:jl_projection_audit): 64-dim embeddings down to
    k=16 via derandomized Rademacher signs, squared-distance ratios
    measured on the 5% hash sample's pairs — the go/no-go gauge
    before committing the cheap representation downstream."""
    from .operators.similarity import jl_projection_audit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return jl_projection_audit(
        emb, "embedding", "vec_id", dims=64, k=16, sample_frac=0.05
    )


SQL_X282 = """
WITH samp AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE ('0x' || substr(md5('jlp:' || CAST(vec_id AS VARCHAR)), 1, 8))
          ::BIGINT / 4294967296.0 < 0.05
),
coords AS (
  SELECT vec_id, CAST(t.i - 1 AS BIGINT) AS d,
         CAST(embedding[CAST(t.i AS INTEGER)] AS DOUBLE) AS x
  FROM samp, range(1, 65) t(i)
),
signs AS (
  SELECT dd.r AS d, kk.r AS kk,
         CAST(1 - 2 * (('0x' || substr(md5('jl:' || CAST(dd.r AS
             VARCHAR) || ':' || CAST(kk.r AS VARCHAR)), 1, 8))
             ::BIGINT % 2) AS DOUBLE) AS sgn
  FROM range(64) dd(r) CROSS JOIN range(16) kk(r)
),
proj AS (
  SELECT c.vec_id, s.kk,
         CAST(SUM(CAST(c.x * s.sgn AS DECIMAL(38,12))) AS DOUBLE)
           / 4.0 AS y
  FROM coords c JOIN signs s ON s.d = c.d
  GROUP BY c.vec_id, s.kk
),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib
  FROM samp a JOIN samp b ON a.vec_id < b.vec_id
),
d_orig AS (
  SELECT p.ia, p.ib,
         CAST(SUM(CAST((ca.x - cb.x) * (ca.x - cb.x)
                       AS DECIMAL(38,12))) AS DOUBLE) AS d2o
  FROM pairs p
  JOIN coords ca ON ca.vec_id = p.ia
  JOIN coords cb ON cb.vec_id = p.ib AND cb.d = ca.d
  GROUP BY p.ia, p.ib
),
d_proj AS (
  SELECT p.ia, p.ib,
         CAST(SUM(CAST((pa.y - pb.y) * (pa.y - pb.y)
                       AS DECIMAL(38,12))) AS DOUBLE) AS d2p
  FROM pairs p
  JOIN proj pa ON pa.vec_id = p.ia
  JOIN proj pb ON pb.vec_id = p.ib AND pb.kk = pa.kk
  GROUP BY p.ia, p.ib
),
r AS (
  SELECT o.d2o, pj.d2p, pj.d2p / o.d2o AS ratio
  FROM d_orig o JOIN d_proj pj ON pj.ia = o.ia AND pj.ib = o.ib
  WHERE o.d2o > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(ratio AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_ratio,
       ROUND(MIN(ratio), 6) AS min_ratio,
       ROUND(MAX(ratio), 6) AS max_ratio,
       ROUND(CAST(SUM(CASE WHEN ratio BETWEEN 0.5 AND 1.5
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS frac_within_50pct
FROM r
"""

EXT12_QUERIES.update({"x282_jl_audit": q_x282_jl_audit})
EXT12_ORACLES.update({"x282_jl_audit": SQL_X282})


# ----------------------------- x283: Dirichlet query likelihood

_QL_TERMS = ["data", "query", "table"]
_QL_MU = 2000.0
_QL_TOPN = 10


def q_x283_query_likelihood(spark, sf_dir):
    """Dirichlet-smoothed LM retrieval (operators/text.py:
    query_likelihood_rank): top-10 documents for a 3-term query under
    the Zhai-Lafferty model — the probabilistic twin of x33's BM25,
    oracle recomputing collection stats and scoring fully in SQL."""
    from .operators.text import query_likelihood_rank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return query_likelihood_rank(
        docs, "text", "doc_id", _QL_TERMS, mu=_QL_MU, top_n=_QL_TOPN
    )


def _sql_x283() -> str:
    mu = _QL_MU
    tf_exprs = ",\n         ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(_QL_TERMS)
    )
    ctf_exprs = ", ".join(
        f"SUM(tf_{i}) AS ctf_{i}" for i in range(len(_QL_TERMS))
    )
    score_terms = " + ".join(
        f"ln((CAST(tf_{i} AS DOUBLE) + {mu!r} * (CAST(ctf_{i} AS DOUBLE)"
        f" / CAST(GREATEST(total_tokens, 1) AS DOUBLE)))"
        f" / (CAST(dl AS DOUBLE) + {mu!r}))"
        for i in range(len(_QL_TERMS))
    )
    any_tf = " OR ".join(
        f"tf_{i} > 0" for i in range(len(_QL_TERMS))
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), ta AS (
  SELECT doc_id,
         CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS toks
  FROM t
), per_doc AS (
  SELECT doc_id, len(toks) AS dl,
         {tf_exprs}
  FROM ta
), stats AS (
  SELECT SUM(dl) AS total_tokens, {ctf_exprs} FROM per_doc
)
SELECT doc_id, dl, {', '.join(f'tf_{i}' for i in range(len(_QL_TERMS)))},
       ROUND({score_terms}, 6) AS score
FROM per_doc CROSS JOIN stats
WHERE {any_tf}
ORDER BY score DESC, doc_id ASC LIMIT {_QL_TOPN}
"""


EXT12_QUERIES.update({"x283_query_likelihood": q_x283_query_likelihood})
EXT12_ORACLES.update({"x283_query_likelihood": _sql_x283()})


# ----------------------------- x284: sharp regression discontinuity


def q_x284_rdd(spark, sf_dir):
    """Sharp-RD boundary contrast (operators/behavior.py:rdd_sharp)
    on per-user mean value with activity (event count) as the running
    variable, cutoff 67, bandwidth 30 — an A/A-shaped audit: nothing
    switches at 67, so the honest readout is a small jump with a
    non-significant t."""
    from .operators.behavior import rdd_sharp

    ev = _read_events(spark, sf_dir)
    per_user = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.round(
                F.sum(F.col("value").cast("decimal(25,12)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("y"),
        )
    )
    units = per_user.select(
        F.col("n_ev").cast("double").alias("x"), "y"
    )
    return rdd_sharp(
        units, running_col="x", outcome_col="y", cutoff=67.0,
        bandwidth=30.0,
    )


SQL_X284 = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_ev,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(25,12))) AS DOUBLE)
               / COUNT(*), 6) AS y
  FROM events WHERE value IS NOT NULL GROUP BY user_id
),
base AS (
  SELECT CAST(n_ev AS DOUBLE) - 67.0 AS x, y,
         CASE WHEN CAST(n_ev AS DOUBLE) - 67.0 < 0
              THEN 'l' ELSE 'r' END AS side
  FROM per_user
  WHERE CAST(n_ev AS DOUBLE) - 67.0 >= -30.0
    AND CAST(n_ev AS DOUBLE) - 67.0 < 30.0
    AND y IS NOT NULL
),
mom AS (
  SELECT side,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM base GROUP BY side
),
coef AS (
  SELECT side, n,
         CASE WHEN n >= 3 AND n * sxx - sx * sx > 0
              THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS b,
         sx, sy, sxx, sxy, syy,
         n * sxx - sx * sx AS det
  FROM mom
),
coef2 AS (
  SELECT side, n, b, det, sxx, sy, sxy,
         CASE WHEN b IS NOT NULL THEN (sy - b * sx) / n END AS a
  FROM coef
),
coef3 AS (
  SELECT side, n, a, b, det, sxx,
         CASE WHEN b IS NOT NULL THEN
           GREATEST(syy - a * sy - b * sxy, 0.0) / (n - 2)
         END AS sigma2
  FROM coef2 JOIN (SELECT side AS s2, syy FROM mom) m
    ON m.s2 = coef2.side
),
sides AS (
  SELECT side, CAST(n AS BIGINT) AS n_side, a, b,
         CASE WHEN b IS NOT NULL THEN sigma2 * sxx / det END AS va
  FROM coef3
),
fin AS (
  SELECT
    MAX(CASE WHEN side = 'l' THEN n_side END) AS n_left,
    MAX(CASE WHEN side = 'r' THEN n_side END) AS n_right,
    MAX(CASE WHEN side = 'l' THEN a END) AS al,
    MAX(CASE WHEN side = 'l' THEN b END) AS bl,
    MAX(CASE WHEN side = 'l' THEN va END) AS val,
    MAX(CASE WHEN side = 'r' THEN a END) AS ar,
    MAX(CASE WHEN side = 'r' THEN b END) AS br,
    MAX(CASE WHEN side = 'r' THEN va END) AS var_
  FROM sides
)
SELECT n_left, n_right,
       ROUND(al, 6) AS a_left, ROUND(bl, 6) AS b_left,
       ROUND(ar, 6) AS a_right, ROUND(br, 6) AS b_right,
       ROUND(ar - al, 6) AS tau,
       ROUND(sqrt(var_ + val), 6) AS se,
       ROUND((ar - al) / sqrt(var_ + val), 6) AS t
FROM fin
"""

EXT12_QUERIES.update({"x284_rdd": q_x284_rdd})
EXT12_ORACLES.update({"x284_rdd": SQL_X284})


# ----------------------------- x285: energy VAD segments


def q_x285_vad(spark, sf_dir):
    """Voice-activity segmentation through the real PCM decode path
    (operators/multimodal.py:vad_segments): every document renders
    the deterministic 64-sample WAV (the x102 payload), frames of 8
    samples are thresholded at half the max frame RMS, and adjacent
    active frames merge into segments.  The oracle re-derives frame
    RMS arithmetically from the sample formula — dyadic-exact — and
    replays the threshold + islands logic in SQL."""
    from .queries_ext3 import _WAV_SAMPLE_HEX, _wav_header_hex
    from .operators.multimodal import vad_segments

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.concat(
        F.unhex(F.lit(_wav_header_hex())),
        F.unhex(F.concat_ws("", F.expr(_WAV_SAMPLE_HEX))),
    )
    staged = docs.select(
        F.col("doc_id").cast("long").alias("asset_id"),
        payload.alias("payload"),
    )
    return vad_segments(staged, frame=8, threshold_frac=0.5).orderBy(
        "asset_id", "seg_id"
    )


SQL_X285 = """
WITH fr AS (
  SELECT d.doc_id AS asset_id, t.i // 8 AS j,
         SUM(((d.doc_id * 31 + t.i * 17) % 2001 - 1000)
             * ((d.doc_id * 31 + t.i * 17) % 2001 - 1000)) AS ssq
  FROM documents d, range(0, 64) AS t(i)
  GROUP BY d.doc_id, t.i // 8
),
r AS (
  SELECT asset_id, j,
         sqrt(CAST(ssq AS DOUBLE) / 8589934592.0) AS rms
  FROM fr
),
thr AS (
  SELECT asset_id, 0.5 * MAX(rms) AS thr FROM r GROUP BY asset_id
),
act AS (
  SELECT r.asset_id, r.j, r.rms
  FROM r JOIN thr ON thr.asset_id = r.asset_id
  WHERE r.rms >= thr.thr
),
isl AS (
  SELECT asset_id, j, rms,
         j - ROW_NUMBER() OVER (PARTITION BY asset_id ORDER BY j)
           AS grp
  FROM act
),
seg AS (
  SELECT asset_id, grp,
         MIN(j) AS start_frame, MAX(j) AS end_frame,
         COUNT(*) AS n_frames,
         SUM(CAST(FLOOR(rms * 1000000.0 + 0.5) AS BIGINT))
           AS rms_micro_sum
  FROM isl GROUP BY asset_id, grp
)
SELECT CAST(asset_id AS BIGINT) AS asset_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY asset_id
                               ORDER BY start_frame) - 1 AS BIGINT)
         AS seg_id,
       CAST(start_frame AS BIGINT) AS start_frame,
       CAST(end_frame AS BIGINT) AS end_frame,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(rms_micro_sum AS BIGINT) AS rms_micro_sum
FROM seg
ORDER BY asset_id, seg_id
"""

EXT12_QUERIES.update({"x285_vad": q_x285_vad})
EXT12_ORACLES.update({"x285_vad": SQL_X285})


# ----------------------------- x286: randomized-response local DP


def q_x286_rr_gauge(spark, sf_dir):
    """Warner randomized-response utility gauge (operators/quality.py:
    randomized_response_gauge) on the per-user purchase-conversion
    bit at p_truth in {0.6, 0.75, 0.9}: the local-DP companion to
    x279 — reports are flipped per respondent BEFORE collection,
    the debiased population rate is compared to truth."""
    from .operators.quality import randomized_response_gauge

    ev = _read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    return randomized_response_gauge(per_user, "user_id", "conv")


SQL_X286 = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv
  FROM events GROUP BY user_id
),
rungs AS (
  SELECT ri, CAST(p_truth AS DOUBLE) AS p_truth
  FROM (VALUES (0, 0.6), (1, 0.75), (2, 0.9)) e(ri, p_truth)
),
expl AS (
  SELECT u.user_id, CAST(u.conv > 0 AS BIGINT) AS v,
         r.ri, r.p_truth,
         (('0x' || substr(md5('rr:' || CAST(r.ri AS VARCHAR) || ':'
             || CAST(u.user_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
           / 4294967296.0 AS u
  FROM per_user u CROSS JOIN rungs r
),
agg AS (
  SELECT ri, p_truth, COUNT(*) AS n, SUM(v) AS n_true,
         SUM(CASE WHEN u < p_truth THEN v ELSE 1 - v END) AS n_obs
  FROM expl GROUP BY ri, p_truth
)
SELECT p_truth,
       ROUND(ln(p_truth / (1.0 - p_truth)), 6) AS epsilon,
       CAST(n AS BIGINT) AS n,
       ROUND(CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS true_rate,
       ROUND(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS observed_rate,
       ROUND((CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
              - (1.0 - p_truth)) / (2.0 * p_truth - 1.0), 6)
         AS est_rate,
       ROUND(ABS((CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
                  - (1.0 - p_truth)) / (2.0 * p_truth - 1.0)
                 - CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         AS abs_err
FROM agg
ORDER BY p_truth
"""

EXT12_QUERIES.update({"x286_rr_gauge": q_x286_rr_gauge})
EXT12_ORACLES.update({"x286_rr_gauge": SQL_X286})


# ----------------------------- x287: rolling-origin backtest


def q_x287_backtest(spark, sf_dir):
    """Out-of-sample baseline shootout (operators/temporal.py:
    rolling_origin_backtest): naive vs seasonal-naive one-step
    forecasts of daily per-type event volume at the last 28 observed
    origins — the measured floor a heavier forecaster must beat
    (x259's MASE is the in-sample screen; this is the held-out
    verdict)."""
    from .operators.temporal import rolling_origin_backtest

    ev = _read_events(spark, sf_dir)
    day = ev.groupBy(
        "event_type",
        F.expr("ts_us div 86400000000").cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    out = rolling_origin_backtest(
        day, ["event_type"], "day", "n_ev", season=7, n_origins=28
    )
    return out.orderBy("event_type", "method")


SQL_X287 = """
WITH day AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS n_ev
  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
),
staged AS (
  SELECT event_type, day, CAST(n_ev AS DOUBLE) AS y,
         LAG(CAST(n_ev AS DOUBLE), 1) OVER w AS fc_naive,
         LAG(CAST(n_ev AS DOUBLE), 7) OVER w AS fc_snaive,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY day DESC) AS recency
  FROM day
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
expl AS (
  SELECT event_type, y, 'naive' AS method, fc_naive AS fc
  FROM staged WHERE recency <= 28 AND fc_naive IS NOT NULL
  UNION ALL
  SELECT event_type, y, 'snaive', fc_snaive
  FROM staged WHERE recency <= 28 AND fc_snaive IS NOT NULL
)
SELECT event_type, method,
       CAST(COUNT(*) AS BIGINT) AS n_evals,
       ROUND(CAST(SUM(CAST(ABS(fc - y) AS DECIMAL(38,12)))
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mae,
       ROUND(CAST(SUM(CAST(fc - y AS DECIMAL(38,12)))
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS bias
FROM expl
GROUP BY event_type, method
ORDER BY event_type, method
"""

EXT12_QUERIES.update({"x287_backtest": q_x287_backtest})
EXT12_ORACLES.update({"x287_backtest": SQL_X287})


# ----------------------------- x288: span-corruption mask plan


def q_x288_span_corruption(spark, sf_dir):
    """T5 span-corruption planning audit (operators/text.py:
    span_corruption_plan): deterministic 15%-budget mean-3 spans over
    every document's token grid, overlap-merged — per-doc span and
    coverage profile, reproducible from (salt, doc_id) alone."""
    from .operators.text import span_corruption_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = span_corruption_plan(
        docs, "text", "doc_id", mask_rate=0.15, mean_span=3
    )
    return out.orderBy("doc_id")


SQL_X288 = """
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
),
ta AS (
  SELECT doc_id,
         CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS toks
  FROM t
),
base AS (
  SELECT doc_id, len(toks) AS n_tokens FROM ta WHERE len(toks) > 0
),
grid AS (
  SELECT doc_id, n_tokens,
         unnest(range(0, n_tokens)) AS i
  FROM base
),
cand AS (
  SELECT doc_id, n_tokens, i,
         CASE WHEN ('0x' || substr(md5('t5:' || CAST(doc_id AS
                VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 8))
                ::BIGINT / 4294967296.0 < 0.05
              THEN LEAST(i + 3, n_tokens) END AS end_
  FROM grid
),
cov AS (
  SELECT *,
         CASE WHEN end_ IS NOT NULL
                OR COALESCE(MAX(end_) OVER (PARTITION BY doc_id
                     ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), -1) > i
              THEN 1 ELSE 0 END AS covered
  FROM cand
),
op AS (
  SELECT *,
         CASE WHEN covered = 1
                AND COALESCE(LAG(covered) OVER (PARTITION BY doc_id
                      ORDER BY i), 0) = 0
              THEN 1 ELSE 0 END AS opens
  FROM cov
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(SUM(opens) AS BIGINT) AS n_spans,
       CAST(SUM(covered) AS BIGINT) AS n_masked,
       ROUND(CAST(SUM(covered) AS DOUBLE)
             / CAST(n_tokens AS DOUBLE), 6) AS mask_frac
FROM op
GROUP BY doc_id, n_tokens
ORDER BY doc_id
"""

EXT12_QUERIES.update({"x288_span_corruption": q_x288_span_corruption})
EXT12_ORACLES.update({"x288_span_corruption": SQL_X288})


# ----------------------------- x289: per-file Bloom skipping audit

_X289_PROBES = [1, 2, 3, 5, 8, 13, -7, 999999999]


def q_x289_bloom_skip(spark, sf_dir):
    """Point-lookup data-skipping audit (operators/layout.py:
    bloom_skip_audit): 1024-bit, 3-hash Bloom filters per synthetic
    orders file (o_orderkey % 128), replayed against an 8-key
    customer-id probe workload including two absent keys — measured
    skip fraction and false-positive files, the evidence for paying
    the filter-write cost that zone maps (x278) can't earn on
    equality probes."""
    from .operators.layout import bloom_skip_audit

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = orders.where(
        F.col("o_orderkey").isNotNull() & F.col("o_custkey").isNotNull()
    ).select(
        (F.col("o_orderkey") % 128).alias("file"),
        F.col("o_custkey").alias("key"),
    )
    probes = spark.createDataFrame(
        [(v,) for v in _X289_PROBES], "probe_key long"
    )
    out = bloom_skip_audit(
        base, "file", "key", probes, m_bits=1024, k_hashes=3
    )
    return out.orderBy("probe_key")


SQL_X289 = """
WITH base AS (
  SELECT o_orderkey % 128 AS file, o_custkey AS key
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
),
hh AS (SELECT r AS hi FROM range(3) t(r)),
bits AS (
  SELECT b.file, b.key, h.hi,
         ('0x' || substr(md5('bf' || CAST(h.hi AS VARCHAR) || ':'
             || CAST(b.key AS VARCHAR)), 1, 8))::BIGINT % 1024 AS bit
  FROM base b CROSS JOIN hh h
),
fb AS (
  SELECT file, bit // 32 AS word,
         bit_or(1::BIGINT << CAST(bit % 32 AS INTEGER)) AS bloom
  FROM bits GROUP BY file, bit // 32
),
probes AS (
  SELECT CAST(probe_key AS BIGINT) AS probe_key
  FROM (VALUES (1), (2), (3), (5), (8), (13), (-7), (999999999))
    p(probe_key)
),
pb AS (
  SELECT p.probe_key, h.hi,
         ('0x' || substr(md5('bf' || CAST(h.hi AS VARCHAR) || ':'
             || CAST(p.probe_key AS VARCHAR)), 1, 8))::BIGINT % 1024
           AS bit
  FROM probes p CROSS JOIN hh h
),
files AS (SELECT DISTINCT file FROM fb),
cand AS (
  SELECT f.file, p.probe_key, p.bit // 32 AS word,
         1::BIGINT << CAST(p.bit % 32 AS INTEGER) AS mask
  FROM files f CROSS JOIN pb p
),
hit AS (
  SELECT c.probe_key, c.file,
         CASE WHEN fb.bloom IS NOT NULL
                AND (fb.bloom & c.mask) = c.mask
              THEN 1 ELSE 0 END AS bit_set
  FROM cand c LEFT JOIN fb ON fb.file = c.file AND fb.word = c.word
),
per_pf AS (
  SELECT probe_key, file,
         CASE WHEN SUM(bit_set) = 3 THEN 1 ELSE 0 END AS maybe
  FROM hit GROUP BY probe_key, file
),
truth AS (SELECT DISTINCT file, key AS probe_key FROM base),
joined AS (
  SELECT p.probe_key, p.file, p.maybe,
         CASE WHEN t.probe_key IS NOT NULL THEN 1 ELSE 0 END AS actual
  FROM per_pf p
  LEFT JOIN truth t
    ON t.probe_key = p.probe_key AND t.file = p.file
)
SELECT probe_key,
       CAST(COUNT(*) AS BIGINT) AS files_total,
       CAST(SUM(actual) AS BIGINT) AS files_actual,
       CAST(SUM(maybe) AS BIGINT) AS files_maybe,
       CAST(COUNT(*) - SUM(maybe) AS BIGINT) AS files_skipped,
       CAST(SUM(CASE WHEN maybe = 1 AND actual = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS fp_files,
       ROUND((CAST(COUNT(*) AS DOUBLE) - CAST(SUM(maybe) AS DOUBLE))
             / CAST(COUNT(*) AS DOUBLE), 6) AS skip_frac
FROM joined
GROUP BY probe_key
ORDER BY probe_key
"""

EXT12_QUERIES.update({"x289_bloom_skip": q_x289_bloom_skip})
EXT12_ORACLES.update({"x289_bloom_skip": SQL_X289})


# ----------------------------- x290: corrected prevalence


def q_x290_corrected_prevalence(spark, sf_dir):
    """Rogan-Gladen prevalence tracking (operators/quality.py:
    corrected_prevalence): the marker-ratio lang-ID (x113's detector)
    predicts 'en' per document; sensitivity/specificity calibrate on
    src0+src1's labels, and every other source's English share is
    corrected for the detector's error rates — label-shift-safe
    prevalence from a classifier you only trust enough to calibrate."""
    from .operators.quality import corrected_prevalence
    from .operators.text import detect_language

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = docs.select(
        "source",
        (detect_language(F.col("text")) == "en").cast("long").alias(
            "pred_en"
        ),
        (F.col("lang") == "en").cast("long").alias("is_en"),
        F.col("source").isin("src0", "src1").alias("is_calib"),
    )
    out = corrected_prevalence(
        staged, ["source"], "pred_en", "is_en", "is_calib"
    )
    return out.orderBy("source")


def _sql_x290() -> str:
    from .queries_ext import _sql_profile_ctes

    return f"""
WITH {_sql_profile_ctes()},
rg_base AS (
  SELECT d.source,
         CASE WHEN p.lang_pred = 'en' THEN 1 ELSE 0 END AS pred,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS truth,
         d.source IN ('src0', 'src1') AS cal
  FROM prof p JOIN documents d USING (doc_id)
),
cal AS (
  SELECT CAST(SUM(pred * truth) AS DOUBLE)
           / CAST(SUM(truth) AS DOUBLE) AS sens,
         CAST(SUM((1 - pred) * (1 - truth)) AS DOUBLE)
           / CAST(SUM(1 - truth) AS DOUBLE) AS spec
  FROM rg_base WHERE cal
),
tgt AS (
  SELECT source, COUNT(*) AS n, SUM(pred) AS np
  FROM rg_base WHERE NOT cal GROUP BY source
),
j AS (
  SELECT t.source, t.n,
         CAST(t.np AS DOUBLE) / CAST(t.n AS DOUBLE) AS apparent,
         c.sens, c.spec, c.sens + c.spec - 1.0 AS youden
  FROM tgt t CROSS JOIN cal c
)
SELECT source, CAST(n AS BIGINT) AS n,
       ROUND(apparent, 6) AS apparent,
       ROUND(sens, 6) AS sens, ROUND(spec, 6) AS spec,
       ROUND(CASE WHEN youden > 0 THEN
         LEAST(1.0, GREATEST(0.0, (apparent + spec - 1.0) / youden))
       END, 6) AS corrected,
       ROUND(CASE WHEN youden > 0 THEN
         sqrt(apparent * (1.0 - apparent) / n) / youden
       END, 6) AS se
FROM j
ORDER BY source
"""


EXT12_QUERIES.update({"x290_corrected_prevalence": q_x290_corrected_prevalence})
EXT12_ORACLES.update({"x290_corrected_prevalence": _sql_x290()})


# ----------------------------- x291: chained Törnqvist price index


def q_x291_tornqvist(spark, sf_dir):
    """Chained Törnqvist price index (functions/econ.py:
    tornqvist_index) over the lineitem panel — 25 synthetic items
    (partkey buckets) × ship-month, unit price = Σ price / Σ qty,
    matched-item share-weighted geometric mean of price relatives
    chained to a 100-based level.  The superlative complement to the
    reference's Laspeyres chain (s12) and Fisher volume (s13)."""
    from .functions.econ import tornqvist_index

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    panel = (
        li.where(
            F.col("l_partkey").isNotNull()
            & F.col("l_shipdate").isNotNull()
            & F.col("l_extendedprice").isNotNull()
            & (F.col("l_quantity") > 0)
        )
        .groupBy(
            (F.col("l_partkey") % 25).alias("item"),
            (
                F.year("l_shipdate") * 12 + F.month("l_shipdate")
            ).alias("midx"),
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,12)"))
            .cast("double")
            .alias("val"),
            F.sum(F.col("l_quantity").cast("decimal(38,12)"))
            .cast("double")
            .alias("qty"),
        )
        .select(
            "item",
            "midx",
            "val",
            (F.col("val") / F.col("qty")).alias("p"),
        )
    )
    out = tornqvist_index(
        panel, item_col="item", t_col="midx", price_col="p",
        value_col="val",
    )
    return out.select(
        F.col("midx").cast("long").alias("midx"), "n_items", "tq_index"
    )


def _sql_x291() -> str:
    return """
WITH t291_panel AS (
  SELECT l_partkey % 25 AS item,
         year(l_shipdate) * 12 + month(l_shipdate) AS midx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE)
           AS val,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_quantity > 0
  GROUP BY 1, 2
),
t291_p AS (SELECT item, midx, val, val / qty AS p FROM t291_panel),
t291_lag AS (
  SELECT item, midx, p, val,
         LAG(midx) OVER w AS tprev,
         LAG(p) OVER w AS pprev,
         LAG(val) OVER w AS vprev
  FROM t291_p WINDOW w AS (PARTITION BY item ORDER BY midx)
),
t291_m AS (
  SELECT * FROM t291_lag
  WHERE tprev = midx - 1 AND pprev IS NOT NULL AND pprev > 0 AND p > 0
),
t291_sh AS (
  SELECT midx,
         0.5 * (vprev / CAST(SUM(CAST(vprev AS DECIMAL(38,12)))
                               OVER wt AS DOUBLE)
              + val / CAST(SUM(CAST(val AS DECIMAL(38,12)))
                             OVER wt AS DOUBLE))
             * ln(p / pprev) AS term
  FROM t291_m WINDOW wt AS (PARTITION BY midx)
),
t291_l AS (
  SELECT midx, CAST(COUNT(*) AS BIGINT) AS n_items,
         ROUND(CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DOUBLE), 12)
           AS lnl
  FROM t291_sh GROUP BY midx
),
t291_per AS (SELECT DISTINCT midx FROM t291_p),
t291_c AS (
  SELECT per.midx,
         CAST(COALESCE(l.n_items, 0) AS BIGINT) AS n_items,
         SUM(CAST(COALESCE(l.lnl, 0.0) AS DECIMAL(28,16)))
           OVER (ORDER BY per.midx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t291_per per LEFT JOIN t291_l l ON l.midx = per.midx
)
SELECT CAST(midx AS BIGINT) AS midx, n_items,
       ROUND(100.0 * exp(CAST(cum AS DOUBLE)), 6) AS tq_index
FROM t291_c
ORDER BY midx
"""


# ----------------------------- x292: Henderson 13-term trend


def q_x292_henderson(spark, sf_dir):
    """Henderson 13-term trend filter (operators/temporal.py:
    henderson_trend) over monthly order revenue per order priority —
    the X-11 trend-cycle smoother with exact closed-form weights,
    complete-window-only semantics (edge months emit nothing)."""
    from .operators.temporal import henderson_trend

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    panel = (
        o.where(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
            & F.col("o_orderpriority").isNotNull()
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).alias("midx"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
            .cast("double")
            .alias("v")
        )
    )
    out = henderson_trend(
        panel, entity_col="priority", t_col="midx", value_col="v",
        terms=13,
    )
    return out.select(
        "priority", F.col("midx").cast("long").alias("midx"), "value",
        "trend",
    )


def _sql_x292() -> str:
    from .operators.temporal import henderson_weights

    ws = henderson_weights(13)
    terms = []
    for idx, j in enumerate(range(-6, 7)):
        if j < 0:
            t = f"LEAD(v, {-j}) OVER w"
        elif j > 0:
            t = f"LAG(v, {j}) OVER w"
        else:
            t = "v"
        terms.append(f"{ws[idx]!r} * {t}")
    acc = terms[0]
    for t in terms[1:]:
        acc = f"({acc} + {t})"
    return f"""
WITH t292_panel AS (
  SELECT o_orderpriority AS priority,
         year(o_orderdate) * 12 + month(o_orderdate) AS midx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12))) AS DOUBLE) AS v
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
),
t292_f AS (
  SELECT priority, midx, ROUND(v, 6) AS value,
         CASE WHEN LAG(midx, 6) OVER w = midx - 6
               AND LEAD(midx, 6) OVER w = midx + 6
              THEN ROUND({acc}, 6) END AS trend
  FROM t292_panel WINDOW w AS (PARTITION BY priority ORDER BY midx)
)
SELECT priority, CAST(midx AS BIGINT) AS midx, value, trend
FROM t292_f
WHERE trend IS NOT NULL
ORDER BY priority, midx
"""


# ----------------------------- x293: growth contributions


def q_x293_growth_contrib(spark, sf_dir):
    """Additive contribution-to-growth decomposition (functions/
    econ.py: growth_contributions): which market segment drove each
    month's aggregate order-revenue growth — per-segment contributions
    that sum exactly to the matched-set total growth rate.  Dimension
    join is an explicit broadcast (customer is the small side at any
    scale that matters here)."""
    from .functions.econ import growth_contributions

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = o.where(
        F.col("o_orderdate").isNotNull()
        & F.col("o_totalprice").isNotNull()
        & F.col("o_custkey").isNotNull()
    ).join(
        F.broadcast(
            c.where(F.col("c_mktsegment").isNotNull()).select(
                "c_custkey", "c_mktsegment"
            )
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    panel = j.groupBy(
        F.col("c_mktsegment").alias("segment"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
            "midx"
        ),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
        .cast("double")
        .alias("v")
    )
    out = growth_contributions(
        panel, entity_col="segment", t_col="midx", value_col="v"
    )
    return out.select(
        F.col("midx").cast("long").alias("midx"), "segment", "value",
        "contrib", "total_growth",
    )


def _sql_x293() -> str:
    return """
WITH t293_panel AS (
  SELECT c.c_mktsegment AS segment,
         year(o.o_orderdate) * 12 + month(o.o_orderdate) AS midx,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,12))) AS DOUBLE)
           AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate IS NOT NULL AND o.o_totalprice IS NOT NULL
    AND o.o_custkey IS NOT NULL AND c.c_mktsegment IS NOT NULL
  GROUP BY 1, 2
),
t293_lag AS (
  SELECT segment, midx, v,
         LAG(midx) OVER w AS tprev, LAG(v) OVER w AS vprev
  FROM t293_panel WINDOW w AS (PARTITION BY segment ORDER BY midx)
),
t293_m AS (
  SELECT * FROM t293_lag WHERE tprev = midx - 1
),
t293_tot AS (
  SELECT segment, midx, v, vprev,
         CAST(SUM(CAST(v AS DECIMAL(38,12))) OVER wt AS DOUBLE) AS vt,
         CAST(SUM(CAST(vprev AS DECIMAL(38,12))) OVER wt AS DOUBLE)
           AS vtprev
  FROM t293_m WINDOW wt AS (PARTITION BY midx)
)
SELECT CAST(midx AS BIGINT) AS midx, segment,
       ROUND(v, 6) AS value,
       ROUND((v - vprev) / vtprev, 6) AS contrib,
       ROUND((vt - vtprev) / vtprev, 6) AS total_growth
FROM t293_tot
ORDER BY midx, segment
"""


EXT12_QUERIES.update({
    "x291_tornqvist": q_x291_tornqvist,
    "x292_henderson": q_x292_henderson,
    "x293_growth_contrib": q_x293_growth_contrib,
})
EXT12_ORACLES.update({
    "x291_tornqvist": _sql_x291(),
    "x292_henderson": _sql_x292(),
    "x293_growth_contrib": _sql_x293(),
})


# ----------------------------- x294: Ljung-Box white-noise test


def q_x294_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau test (operators/temporal.py: ljung_box)
    over the daily event-value series per event type, m=8 lags — "is
    anything autocorrelated left", the portmanteau complement to the
    single-lag ACF (x70), PACF (x266) and Durbin-Watson (x229)."""
    from .operators.temporal import ljung_box

    ev = _read_events(spark, sf_dir)
    daily = (
        ev.where(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .groupBy(
            "event_type",
            (F.col("ts_us") - (F.col("ts_us") % F.lit(86_400_000_000)))
            .cast("long")
            .alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(38,12)"))
            .cast("double")
            .alias("x")
        )
    )
    return ljung_box(
        daily, entity_col="event_type", t_col="day", value_col="x",
        lags=8,
    )


def _sql_x294() -> str:
    from .queries_ext9 import _normal_sf_sql

    lags = 8
    lagcols = ",\n         ".join(
        f"LAG(d, {k}) OVER w AS d{k}" for k in range(1, lags + 1)
    )
    nums = ",\n         ".join(
        f"CAST(SUM(CAST(d * d{k} AS DECIMAL(38,18))) AS DOUBLE)"
        f" AS num{k}"
        for k in range(1, lags + 1)
    )
    # fixed-order left fold of the Q pieces, identical to the Spark
    # column composition
    pieces = [
        f"(num{k} / den) * (num{k} / den) / (CAST(n AS DOUBLE) - {float(k)!r})"
        for k in range(1, lags + 1)
    ]
    acc = pieces[0]
    for p in pieces[1:]:
        acc = f"({acc} + {p})"
    q = f"CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * {acc}"
    dof = f"{float(lags)!r}"
    wh_z = (
        f"((exp(ln(q / {dof}) / 3.0)"
        f" - (1.0 - 2.0 / (9.0 * {dof})))"
        f" / sqrt(2.0 / (9.0 * {dof})))"
    )
    return f"""
WITH t294_daily AS (
  SELECT event_type,
         epoch_us(ts) - (epoch_us(ts) % 86400000000) AS day,
         CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS x
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL
  GROUP BY 1, 2
),
t294_mean AS (
  SELECT event_type,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS xbar
  FROM t294_daily GROUP BY 1
),
t294_d AS (
  SELECT d.event_type, d.day, d.x - m.xbar AS d
  FROM t294_daily d JOIN t294_mean m ON d.event_type = m.event_type
),
t294_lags AS (
  SELECT event_type, d,
         {lagcols}
  FROM t294_d
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
t294_m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(d * d AS DECIMAL(38,18))) AS DOUBLE) AS den,
         {nums}
  FROM t294_lags GROUP BY 1
),
t294_q AS (
  SELECT event_type, CAST(n AS BIGINT) AS n, den, num1,
         {q} AS q,
         (n > 9 AND den > 0) AS ok
  FROM t294_m
)
SELECT event_type, n,
       ROUND(CASE WHEN ok THEN num1 / den END, 6) AS rho1,
       ROUND(CASE WHEN ok THEN q END, 6) AS q_stat,
       CAST({lags} AS BIGINT) AS dof,
       ROUND(CASE WHEN ok THEN
         CASE WHEN q <= 0 THEN 1.0 ELSE {_normal_sf_sql("q_wh")} END
       END, 6) AS p_value
FROM (SELECT *, {wh_z} AS q_wh FROM t294_q)
ORDER BY event_type
"""


# ----------------------------- x295: Chao1 / ACE vocabulary richness


def q_x295_vocab_richness(spark, sf_dir):
    """Chao1 and ACE unseen-vocabulary estimators (operators/text.py:
    vocab_richness) over the documents corpus — how many word types
    the corpus hasn't shown yet, from singleton/doubleton counts; the
    forward-looking complement to Heaps'-law (x194) and Good-Turing
    (x257)."""
    from .operators.text import vocab_richness

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocab_richness(docs, "text")


def _sql_x295() -> str:
    return """
WITH t295_toks AS (
  SELECT unnest(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS term
  FROM documents
),
t295_counts AS (SELECT term, COUNT(*) AS c FROM t295_toks GROUP BY 1),
t295_fof AS (SELECT c, COUNT(*) AS f FROM t295_counts GROUP BY 1),
t295_agg AS (
  SELECT CAST(SUM(f) AS BIGINT) AS s_obs,
         CAST(SUM(c * f) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN c = 1 THEN f ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN f ELSE 0 END) AS BIGINT) AS f2,
         CAST(SUM(CASE WHEN c <= 10 THEN f ELSE 0 END) AS BIGINT)
           AS s_rare,
         CAST(SUM(CASE WHEN c <= 10 THEN c * f ELSE 0 END) AS BIGINT)
           AS n_rare,
         CAST(SUM(CASE WHEN c <= 10 THEN c * (c - 1) * f ELSE 0 END)
              AS BIGINT) AS kk1
  FROM t295_fof
)
SELECT s_obs, n_tokens, f1, f2,
       ROUND(CAST(s_obs AS DOUBLE)
             + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
               / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6) AS chao1,
       ROUND(CASE WHEN n_rare > 1
                   AND 1.0 - CAST(f1 AS DOUBLE) / CAST(n_rare AS DOUBLE) > 0
             THEN CAST(s_obs - s_rare AS DOUBLE)
                  + CAST(s_rare AS DOUBLE)
                    / (1.0 - CAST(f1 AS DOUBLE) / CAST(n_rare AS DOUBLE))
                  + CAST(f1 AS DOUBLE)
                    * GREATEST(0.0,
                        CAST(s_rare AS DOUBLE) * CAST(kk1 AS DOUBLE)
                        / ((1.0 - CAST(f1 AS DOUBLE)
                                  / CAST(n_rare AS DOUBLE))
                           * CAST(n_rare AS DOUBLE)
                           * (CAST(n_rare AS DOUBLE) - 1.0))
                        - 1.0)
                    / (1.0 - CAST(f1 AS DOUBLE) / CAST(n_rare AS DOUBLE))
             END, 6) AS ace
FROM t295_agg
"""


# ----------------------------- x296: Wald-Wolfowitz runs test


def q_x296_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test (operators/sketch.py: runs_test) on
    the daily order-revenue series per order priority — sign-pattern
    randomness about the mean, the distribution-free companion to
    Durbin-Watson (x229) and Ljung-Box (x294)."""
    from .operators.sketch import runs_test

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = (
        o.where(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
            & F.col("o_orderpriority").isNotNull()
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.expr(
                "CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT)"
                " div 86400"
            )
            .cast("long")
            .alias("day"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
            .cast("double")
            .alias("x")
        )
    )
    return runs_test(
        daily, entity_col="priority", t_col="day", value_col="x"
    )


def _sql_x296() -> str:
    from .queries_ext9 import _normal_p_two_sided_sql

    return f"""
WITH t296_daily AS (
  SELECT o_orderpriority AS priority,
         epoch(o_orderdate) // 86400 AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12))) AS DOUBLE) AS x
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
),
t296_mean AS (
  SELECT priority,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS xbar
  FROM t296_daily GROUP BY 1
),
t296_s AS (
  SELECT d.priority, d.day, d.x > m.xbar AS s
  FROM t296_daily d JOIN t296_mean m ON d.priority = m.priority
  WHERE d.x <> m.xbar
),
t296_lag AS (
  SELECT priority, s, LAG(s) OVER w AS sprev
  FROM t296_s WINDOW w AS (PARTITION BY priority ORDER BY day)
),
t296_m AS (
  SELECT priority,
         CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS n2,
         CAST(1 + SUM(CASE WHEN sprev IS NOT NULL AND s <> sprev
                           THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM t296_lag GROUP BY 1
),
t296_z AS (
  SELECT priority, n1, n2, runs,
         CAST(n1 AS DOUBLE) AS d1, CAST(n2 AS DOUBLE) AS d2,
         (CAST(runs AS DOUBLE)
          - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
         / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                   - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                   * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                   * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))
           AS z,
         (n1 > 0 AND n2 > 0
          AND 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)) > 0) AS ok
  FROM t296_m
)
SELECT priority, n1, n2, runs,
       ROUND(CASE WHEN ok THEN z END, 6) AS z,
       ROUND(CASE WHEN ok THEN {_normal_p_two_sided_sql("z")} END, 6)
         AS p_value
FROM t296_z
ORDER BY priority
"""


EXT12_QUERIES.update({
    "x294_ljung_box": q_x294_ljung_box,
    "x295_vocab_richness": q_x295_vocab_richness,
    "x296_runs_test": q_x296_runs_test,
})
EXT12_ORACLES.update({
    "x294_ljung_box": _sql_x294(),
    "x295_vocab_richness": _sql_x295(),
    "x296_runs_test": _sql_x296(),
})


# ----------------------------- x297: Cochran's Q test


def q_x297_cochran_q(spark, sf_dir):
    """Cochran's Q (operators/sketch.py: cochran_q_test): do the event
    types have the same per-user adoption rate when every user is its
    own control — the k-treatment generalization of McNemar (x220),
    on the positive (user, event_type) pairs only."""
    from .operators.sketch import cochran_q_test

    ev = _read_events(spark, sf_dir)
    return cochran_q_test(
        ev, subject_col="user_id", treatment_col="event_type"
    )


def _sql_x297() -> str:
    from .queries_ext9 import _normal_sf_sql

    return f"""
WITH t297_pairs AS (
  SELECT DISTINCT user_id AS s, event_type AS tr
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
t297_rows AS (SELECT s, COUNT(*) AS r FROM t297_pairs GROUP BY 1),
t297_rm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
         CAST(SUM(r) AS BIGINT) AS n_pos,
         CAST(SUM(r * r) AS BIGINT) AS r2
  FROM t297_rows
),
t297_cols AS (SELECT tr, COUNT(*) AS c FROM t297_pairs GROUP BY 1),
t297_cm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS b,
         CAST(SUM(c * c) AS BIGINT) AS c2
  FROM t297_cols
),
t297_q AS (
  SELECT b, n_subjects, n_pos,
         CAST(b AS DOUBLE) * (CAST(b AS DOUBLE) - 1.0)
           * (CAST(c2 AS DOUBLE)
              - CAST(n_pos AS DOUBLE) * CAST(n_pos AS DOUBLE)
                / CAST(b AS DOUBLE))
           / (CAST(b AS DOUBLE) * CAST(n_pos AS DOUBLE)
              - CAST(r2 AS DOUBLE)) AS q,
         (b > 1 AND CAST(b AS DOUBLE) * CAST(n_pos AS DOUBLE)
                    - CAST(r2 AS DOUBLE) > 0) AS ok,
         CAST(b AS DOUBLE) - 1.0 AS dofd
  FROM t297_rm CROSS JOIN t297_cm
),
t297_z AS (
  SELECT *,
         ((exp(ln(q / dofd) / 3.0) - (1.0 - 2.0 / (9.0 * dofd)))
          / sqrt(2.0 / (9.0 * dofd))) AS q_wh
  FROM t297_q
)
SELECT b, n_subjects, n_pos,
       ROUND(CASE WHEN ok THEN q END, 6) AS q_stat,
       CAST(b - 1 AS BIGINT) AS dof,
       ROUND(CASE WHEN ok THEN
         CASE WHEN q <= 0 THEN 1.0 ELSE {_normal_sf_sql("q_wh")} END
       END, 6) AS p_value
FROM t297_z
"""


# ----------------------------- x298: Bartlett variance homogeneity


def q_x298_bartlett(spark, sf_dir):
    """Bartlett's variance-homogeneity test (operators/sketch.py:
    bartlett_test) of account balances across market segments — the
    parametric counterpart of Brown-Forsythe (x225) on the same kind
    of grouping, from one decimal-moment aggregation."""
    from .operators.sketch import bartlett_test

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return bartlett_test(
        c, group_col="c_mktsegment", value_col="c_acctbal"
    )


def _sql_x298() -> str:
    from .queries_ext9 import _normal_sf_sql

    return f"""
WITH t298_g AS (
  SELECT c_mktsegment AS g,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(CAST(c_acctbal AS DOUBLE)
                       * CAST(c_acctbal AS DOUBLE)
                       AS DECIMAL(38,12))) AS DOUBLE) AS sxx
  FROM customer
  WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
  GROUP BY 1
),
t298_v AS (
  SELECT g, n,
         (sxx - sx * sx / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0) AS var
  FROM t298_g
),
t298_f AS (SELECT * FROM t298_v WHERE n >= 2 AND var > 0),
t298_m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(CAST((CAST(n AS DOUBLE) - 1.0) * var
                       AS DECIMAL(38,18))) AS DOUBLE) AS ssw,
         CAST(SUM(CAST((CAST(n AS DOUBLE) - 1.0) * ln(var)
                       AS DECIMAL(38,18))) AS DOUBLE) AS slnv,
         CAST(SUM(CAST(1.0 / (CAST(n AS DOUBLE) - 1.0)
                       AS DECIMAL(38,18))) AS DOUBLE) AS sinv
  FROM t298_f
),
t298_t AS (
  SELECT k, n,
         ((CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
            * ln(ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
          - slnv)
         / (1.0 + (sinv - 1.0 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                  / (3.0 * (CAST(k AS DOUBLE) - 1.0))) AS t,
         CAST(k AS DOUBLE) - 1.0 AS dofd,
         k > 1 AS ok
  FROM t298_m
),
t298_z AS (
  SELECT *,
         ((exp(ln(t / dofd) / 3.0) - (1.0 - 2.0 / (9.0 * dofd)))
          / sqrt(2.0 / (9.0 * dofd))) AS t_wh
  FROM t298_t
)
SELECT k, n,
       ROUND(CASE WHEN ok THEN t END, 6) AS t_stat,
       CAST(k - 1 AS BIGINT) AS dof,
       ROUND(CASE WHEN ok THEN
         CASE WHEN t <= 0 THEN 1.0 ELSE {_normal_sf_sql("t_wh")} END
       END, 6) AS p_value
FROM t298_z
"""


EXT12_QUERIES.update({
    "x297_cochran_q": q_x297_cochran_q,
    "x298_bartlett": q_x298_bartlett,
})
EXT12_ORACLES.update({
    "x297_cochran_q": _sql_x297(),
    "x298_bartlett": _sql_x298(),
})


# ----------------------------- x299: Friedman rank test


def q_x299_friedman(spark, sf_dir):
    """Friedman repeated-measures rank test (operators/sketch.py:
    friedman_test): do event types differ in per-user mean value when
    each complete user scores all of them — the rank-based member of
    the within-subject family next to Cochran's Q (x297)."""
    from .operators.sketch import friedman_test

    ev = _read_events(spark, sf_dir)
    cells = (
        ev.where(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
        )
        .groupBy("user_id", "event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(38,12)"))
                .cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("v")
        )
    )
    return friedman_test(
        cells, subject_col="user_id", treatment_col="event_type",
        value_col="v",
    )


def _sql_x299() -> str:
    from .queries_ext9 import _normal_sf_sql

    return f"""
WITH t299_cells AS (
  SELECT user_id AS s, event_type AS tr,
         CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS v
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2
),
t299_b AS (
  SELECT CAST(COUNT(DISTINCT tr) AS BIGINT) AS b FROM t299_cells
),
t299_comp AS (
  SELECT c.s, c.tr, c.v, bb.b
  FROM (SELECT *, COUNT(*) OVER (PARTITION BY s) AS nt
        FROM t299_cells) c
  CROSS JOIN t299_b bb
  WHERE c.nt = bb.b
),
t299_rank AS (
  SELECT s, tr, b,
         CAST(RANK() OVER (PARTITION BY s ORDER BY v) AS DOUBLE)
         + (CAST(COUNT(*) OVER (PARTITION BY s, v) AS DOUBLE) - 1.0)
           / 2.0 AS r
  FROM t299_comp
),
t299_sums AS (
  SELECT tr, MAX(b) AS b, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(r * 2.0 AS BIGINT)) AS BIGINT) AS r2x
  FROM t299_rank GROUP BY 1
),
t299_m AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(b) AS BIGINT) AS b,
         SUM(CAST(r2x AS DOUBLE) * CAST(r2x AS DOUBLE)) AS sr2_4x
  FROM t299_sums
),
t299_t AS (
  SELECT n, b,
         12.0 / (CAST(n AS DOUBLE) * CAST(b AS DOUBLE)
                 * (CAST(b AS DOUBLE) + 1.0))
           * (sr2_4x / 4.0)
         - 3.0 * CAST(n AS DOUBLE) * (CAST(b AS DOUBLE) + 1.0) AS chi2,
         CAST(b AS DOUBLE) - 1.0 AS dofd,
         (b > 1 AND n > 0) AS ok
  FROM t299_m
),
t299_z AS (
  SELECT *,
         ((exp(ln(chi2 / dofd) / 3.0) - (1.0 - 2.0 / (9.0 * dofd)))
          / sqrt(2.0 / (9.0 * dofd))) AS c_wh
  FROM t299_t
)
SELECT n, b,
       ROUND(CASE WHEN ok THEN chi2 END, 6) AS chi2,
       CAST(b - 1 AS BIGINT) AS dof,
       ROUND(CASE WHEN ok THEN
         CASE WHEN chi2 <= 0 THEN 1.0 ELSE {_normal_sf_sql("c_wh")} END
       END, 6) AS p_value
FROM t299_z
"""


EXT12_QUERIES.update({"x299_friedman": q_x299_friedman})
EXT12_ORACLES.update({"x299_friedman": _sql_x299()})
