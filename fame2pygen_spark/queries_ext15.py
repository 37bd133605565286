"""Round-7 extension queries (x326+): the record-linkage evaluation
family (blocking audit, unsupervised EM weights, Jaro-Winkler
comparator) and the round's statistical additions.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

EXT15_QUERIES: dict = {}
EXT15_ORACLES: dict = {}


# ----------------------------- x326: blocking-scheme quality audit


def q_x326_blocking_quality(spark, sf_dir):
    """Blocking audit (operators/linkage.py:blocking_quality):
    customer-supplier blocked on nationkey, ground truth = pairs
    whose names share their last two characters with account
    balances within 500 — the truth set deliberately crosses blocks,
    so pairs_completeness measures what nationkey blocking loses.
    Candidate volume is computed from per-block counts (never
    materialized), reduction_ratio from the full |L|*|R| space."""
    from .operators.linkage import blocking_quality

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    truth = (
        cust.select(
            F.col("c_custkey").cast("long").alias("cust_id"),
            F.substring("c_name", -2, 2).alias("__sfx"),
            F.col("c_acctbal").cast("double").alias("__cb"),
        )
        .join(
            supp.select(
                F.col("s_suppkey").cast("long").alias("supp_id"),
                F.substring("s_name", -2, 2).alias("__sfx"),
                F.col("s_acctbal").cast("double").alias("__sb"),
            ),
            on="__sfx",
        )
        .where(F.abs(F.col("__cb") - F.col("__sb")) < 500.0)
        .select("cust_id", "supp_id")
    )
    return blocking_quality(
        cust.select(
            F.col("c_custkey").cast("long").alias("cust_id"),
            F.col("c_nationkey").alias("nation"),
        ),
        supp.select(
            F.col("s_suppkey").cast("long").alias("supp_id"),
            F.col("s_nationkey").alias("nation"),
        ),
        truth,
        left_id="cust_id",
        right_id="supp_id",
        left_block=F.col("nation").cast("long"),
        right_block=F.col("nation").cast("long"),
    )


SQL_X326 = """
WITH x326_truth AS (
  SELECT CAST(c_custkey AS BIGINT) AS cust_id,
         CAST(s_suppkey AS BIGINT) AS supp_id,
         CAST(c_nationkey AS BIGINT) AS bkl,
         CAST(s_nationkey AS BIGINT) AS bkr
  FROM customer JOIN supplier
    ON substr(c_name, -2, 2) = substr(s_name, -2, 2)
  WHERE abs(CAST(c_acctbal AS DOUBLE) - CAST(s_acctbal AS DOUBLE))
        < 500.0
), x326_lc AS (
  SELECT CAST(c_nationkey AS BIGINT) AS bk, COUNT(*) AS lc
  FROM customer GROUP BY 1
), x326_rc AS (
  SELECT CAST(s_nationkey AS BIGINT) AS bk, COUNT(*) AS rc
  FROM supplier GROUP BY 1
), x326_cand AS (
  SELECT SUM(CAST(lc * rc AS DECIMAL(38,0))) AS cand,
         MAX(lc * rc) AS maxprod
  FROM x326_lc JOIN x326_rc USING (bk)
), x326_lt AS (
  SELECT COUNT(*) AS nl, COUNT(DISTINCT c_nationkey) AS kbl
  FROM customer
), x326_rt AS (
  SELECT COUNT(*) AS nr, COUNT(DISTINCT s_nationkey) AS kbr
  FROM supplier
), x326_tb AS (
  SELECT COUNT(*) AS nt,
         SUM(CASE WHEN bkl = bkr THEN 1 ELSE 0 END) AS ntb
  FROM x326_truth
)
SELECT nl AS n_left, nr AS n_right,
       kbl AS n_blocks_left, kbr AS n_blocks_right,
       CAST(COALESCE(cand, 0) AS DOUBLE) AS cand_pairs,
       CAST(nl AS DOUBLE) * CAST(nr AS DOUBLE) AS total_pairs,
       ROUND((1.0 - CAST(COALESCE(cand, 0) AS DOUBLE)
              / (CAST(nl AS DOUBLE) * CAST(nr AS DOUBLE)))
             * 1000000.0) / 1000000.0 AS reduction_ratio,
       CAST(COALESCE(maxprod, 0) AS BIGINT) AS max_block_product,
       CAST(nt AS BIGINT) AS n_true,
       CAST(COALESCE(ntb, 0) AS BIGINT) AS n_true_blocked,
       ROUND((CAST(COALESCE(ntb, 0) AS DOUBLE) / CAST(nt AS DOUBLE))
             * 1000000.0) / 1000000.0 AS pairs_completeness
FROM x326_cand, x326_lt, x326_rt, x326_tb
"""

EXT15_QUERIES.update({"x326_blocking_quality": q_x326_blocking_quality})
EXT15_ORACLES.update({"x326_blocking_quality": SQL_X326})


# ----------------------------- x327: EM-estimated Fellegi-Sunter weights

_X327_FIELDS = ["agree_area", "agree_bal", "agree_namelen"]
_X327_ITER = 5


def _x327_pairs(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return (
        cust.select(
            F.col("c_custkey").cast("long").alias("cust_id"),
            F.col("c_nationkey").alias("nation"),
            F.col("c_acctbal").cast("double").alias("c_bal"),
            "c_name",
        )
        .join(
            supp.select(
                F.col("s_suppkey").cast("long").alias("supp_id"),
                F.col("s_nationkey").alias("nation"),
                F.col("s_acctbal").cast("double").alias("s_bal"),
                "s_name",
            ),
            on="nation",
        )
        .select(
            (
                F.substring("c_name", -1, 1)
                == F.substring("s_name", -1, 1)
            ).alias("agree_area"),
            (F.abs(F.col("c_bal") - F.col("s_bal")) < 1000.0).alias(
                "agree_bal"
            ),
            (
                F.length("c_name") % 2 == F.length("s_name") % 2
            ).alias("agree_namelen"),
        )
    )


def q_x327_fs_em_weights(spark, sf_dir):
    """Unsupervised EM estimation of Fellegi-Sunter m/u weights
    (operators/linkage.py:fs_em_weights): the same x325 candidate
    pairs and agreement fields, but the per-field probabilities are
    LEARNED by 5 EM iterations over the 2^3-pattern table instead of
    supplied — the standard Winkler 1988 parameterization pass that
    runs before fellegi_sunter_score in an unlabeled pipeline."""
    from .operators.linkage import fs_em_weights

    return fs_em_weights(
        _x327_pairs(spark, sf_dir),
        _X327_FIELDS,
        init_m=0.9,
        init_u=0.1,
        init_p=0.1,
        n_iter=_X327_ITER,
    )


def _sql_x327() -> str:
    f = len(_X327_FIELDS)
    gs = [f"g{i}" for i in range(f)]
    pat_cols = ",\n         ".join(
        f"COALESCE(CAST({c} AS BOOLEAN), FALSE) AS {g}"
        for c, g in zip(
            [
                "substr(c_name, -1, 1) = substr(s_name, -1, 1)",
                "abs(CAST(c_acctbal AS DOUBLE) - CAST(s_acctbal AS "
                "DOUBLE)) < 1000.0",
                "length(c_name) % 2 = length(s_name) % 2",
            ],
            gs,
        )
    )
    parts = [
        f"""x327_pat AS (
  SELECT {pat_cols},
         COUNT(*) AS n
  FROM customer JOIN supplier ON c_nationkey = s_nationkey
  GROUP BY {", ".join(str(i + 1) for i in range(f))}
), x327_s0 AS (
  SELECT CAST(0.1 AS DOUBLE) AS p,
         {", ".join(f"CAST(0.9 AS DOUBLE) AS m{i}" for i in range(f))},
         {", ".join(f"CAST(0.1 AS DOUBLE) AS u{i}" for i in range(f))}
)"""
    ]
    for t in range(1, _X327_ITER + 1):
        a = "p"
        b = "(1.0 - p)"
        for i in range(f):
            a += f" * (CASE WHEN {gs[i]} THEN m{i} ELSE 1.0 - m{i} END)"
            b += f" * (CASE WHEN {gs[i]} THEN u{i} ELSE 1.0 - u{i} END)"
        sums = [
            "SUM(CAST(ROUND(w * CAST(n AS DOUBLE), 9) "
            "AS DECIMAL(38,9))) AS sw",
            "SUM(CAST(ROUND((1.0 - w) * CAST(n AS DOUBLE), 9) "
            "AS DECIMAL(38,9))) AS swc",
            "SUM(n) AS nn",
        ]
        for i in range(f):
            gi = f"(CASE WHEN {gs[i]} THEN 1.0 ELSE 0.0 END)"
            sums.append(
                f"SUM(CAST(ROUND(w * CAST(n AS DOUBLE) * {gi}, 9) "
                f"AS DECIMAL(38,9))) AS swg{i}"
            )
            sums.append(
                f"SUM(CAST(ROUND((1.0 - w) * CAST(n AS DOUBLE) * {gi}, "
                f"9) AS DECIMAL(38,9))) AS swcg{i}"
            )
        news = [
            "CAST(sw AS DOUBLE) / CAST(nn AS DOUBLE) AS p",
        ]
        for i in range(f):
            news.append(
                f"CAST(swg{i} AS DOUBLE) / CAST(sw AS DOUBLE) AS m{i}"
            )
        for i in range(f):
            news.append(
                f"CAST(swcg{i} AS DOUBLE) / CAST(swc AS DOUBLE) AS u{i}"
            )
        parts.append(
            f""", x327_w{t} AS (
  SELECT {", ".join(gs)}, n, __a / (__a + __b) AS w
  FROM (
    SELECT {", ".join(gs)}, n,
           {a} AS __a,
           {b} AS __b
    FROM x327_pat CROSS JOIN x327_s{t - 1}
  )
), x327_a{t} AS (
  SELECT {", ".join(sums)}
  FROM x327_w{t}
), x327_s{t} AS (
  SELECT {", ".join(news)}
  FROM x327_a{t}
)"""
        )
    eps = "CAST(0.000001 AS DOUBLE)"
    rows = []
    for i, c in enumerate(_X327_FIELDS):
        m = f"GREATEST({eps}, LEAST(1.0 - {eps}, m{i}))"
        u = f"GREATEST({eps}, LEAST(1.0 - {eps}, u{i}))"
        rows.append(
            f"""SELECT '{c}' AS field,
       ROUND({m} * 1000000.0) / 1000000.0 AS m,
       ROUND({u} * 1000000.0) / 1000000.0 AS u,
       ROUND(ROUND(log2({m} / {u}), 12) * 1000000.0)
         / 1000000.0 AS w_agree,
       ROUND(ROUND(log2((1.0 - {m}) / (1.0 - {u})), 12) * 1000000.0)
         / 1000000.0 AS w_disagree,
       ROUND(p * 1000000.0) / 1000000.0 AS match_prevalence
FROM x327_s{_X327_ITER}"""
        )
    return (
        "WITH "
        + "".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(rows)
        + "\nORDER BY field"
    )


SQL_X327 = _sql_x327()

EXT15_QUERIES.update({"x327_fs_em_weights": q_x327_fs_em_weights})
EXT15_ORACLES.update({"x327_fs_em_weights": SQL_X327})


# ----------------------------- x328: Jaro-Winkler name comparator

_X328_CUT = 0.75


def q_x328_jaro_winkler(spark, sf_dir):
    """Jaro-Winkler name similarity over nationkey-blocked
    customer-supplier candidates (operators/linkage.py:
    jaro_winkler_scores): the classic string comparator, Arrow-batched
    and fuzz-verified bit-equal to DuckDB's builtin — pairs at
    jw >= 0.75 with ids and the 6-dp score."""
    from .operators.linkage import jaro_winkler_scores

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("cust_id"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_name").alias("c_name"),
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").cast("long").alias("supp_id"),
        F.col("s_nationkey").alias("nation"),
        F.col("s_name").alias("s_name"),
    )
    pairs = cust.join(supp, on="nation").select(
        "cust_id", "supp_id", "c_name", "s_name"
    )
    scored = jaro_winkler_scores(pairs, "c_name", "s_name")
    return (
        scored.where(F.col("jw_score") >= F.lit(_X328_CUT))
        .select("cust_id", "supp_id", "jw_score")
        .orderBy("cust_id", "supp_id")
    )


SQL_X328 = f"""
WITH x328_scored AS (
  SELECT CAST(c_custkey AS BIGINT) AS cust_id,
         CAST(s_suppkey AS BIGINT) AS supp_id,
         ROUND(jaro_winkler_similarity(c_name, s_name) * 1000000.0)
           / 1000000.0 AS jw_score
  FROM customer JOIN supplier ON c_nationkey = s_nationkey
)
SELECT cust_id, supp_id, jw_score
FROM x328_scored
WHERE jw_score >= {_X328_CUT!r}
ORDER BY cust_id, supp_id
"""

EXT15_QUERIES.update({"x328_jaro_winkler": q_x328_jaro_winkler})
EXT15_ORACLES.update({"x328_jaro_winkler": SQL_X328})


# ----------------------------- x329: deterministic RANSAC line fit

_X329_TOL = 5000.0
_X329_H = 16


def q_x329_ransac(spark, sf_dir):
    """Deterministic-sampling RANSAC line fit (operators/quality.py:
    ransac_line): lineitem quantity -> extendedprice, whose unit-price
    fan makes plain OLS chase the expensive parts — RANSAC picks the
    densest price band.  Hypothesis points come from the smallest
    md5(id) hashes (engine-portable sampling), so both engines fit
    the identical line."""
    from .operators.quality import ransac_line

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_orderkey").cast("long") * 10
         + F.col("l_linenumber").cast("long")).alias("rid"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    return ransac_line(
        li, "rid", "qty", "price",
        tol=_X329_TOL, n_hypotheses=_X329_H,
    )


SQL_X329 = f"""
WITH x329_base AS (
  SELECT CAST(l_orderkey AS BIGINT) * 10
           + CAST(l_linenumber AS BIGINT) AS rid,
         CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
), x329_seed AS (
  SELECT x, y,
         ('0x' || substr(md5('ransac' || ':' || CAST(rid AS VARCHAR)),
                         1, 8))::BIGINT AS h,
         rid
  FROM x329_base
  ORDER BY h, rid LIMIT {2 * _X329_H}
), x329_rank AS (
  SELECT x, y, ROW_NUMBER() OVER (ORDER BY h, rid) AS rn
  FROM x329_seed
), x329_hyp0 AS (
  SELECT (rn - 1) // 2 AS hyp,
         MAX(CASE WHEN rn % 2 = 1 THEN x END) AS x1,
         MAX(CASE WHEN rn % 2 = 1 THEN y END) AS y1,
         MAX(CASE WHEN rn % 2 = 0 THEN x END) AS x2,
         MAX(CASE WHEN rn % 2 = 0 THEN y END) AS y2
  FROM x329_rank GROUP BY 1
), x329_hyp1 AS (
  SELECT hyp, x1, y1, (y2 - y1) / (x2 - x1) AS slope
  FROM x329_hyp0
  WHERE x2 IS NOT NULL AND x2 <> x1
), x329_hyp AS (
  SELECT hyp, slope, y1 - slope * x1 AS icept FROM x329_hyp1
), x329_cnt AS (
  SELECT hyp, slope, icept, COUNT(*) AS ninl
  FROM x329_base CROSS JOIN x329_hyp
  WHERE abs(y - (slope * x + icept)) <= CAST({_X329_TOL!r} AS DOUBLE)
  GROUP BY 1, 2, 3
), x329_best AS (
  SELECT * FROM x329_cnt ORDER BY ninl DESC, hyp ASC LIMIT 1
), x329_refit AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(x, 9) AS DECIMAL(38,9))) AS sx,
         SUM(CAST(ROUND(y, 9) AS DECIMAL(38,9))) AS sy,
         SUM(CAST(ROUND(x * y, 9) AS DECIMAL(38,9))) AS sxy,
         SUM(CAST(ROUND(x * x, 9) AS DECIMAL(38,9))) AS sxx
  FROM x329_base CROSS JOIN x329_best
  WHERE abs(y - (slope * x + icept)) <= CAST({_X329_TOL!r} AS DOUBLE)
), x329_np AS (
  SELECT COUNT(*) AS np FROM x329_base
)
SELECT hyp AS best_hyp,
       np AS n_points,
       ninl AS n_inliers,
       ROUND((CAST(ninl AS DOUBLE) / CAST(np AS DOUBLE)) * 1000000.0)
         / 1000000.0 AS inlier_rate,
       ROUND(slope * 1000000.0) / 1000000.0 AS hyp_slope,
       ROUND(icept * 1000000.0) / 1000000.0 AS hyp_intercept,
       ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * 1000000.0) / 1000000.0 AS refit_slope,
       ROUND(((CAST(sy AS DOUBLE)
               - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * CAST(sx AS DOUBLE))
              / CAST(n AS DOUBLE))
             * 1000000.0) / 1000000.0 AS refit_intercept
FROM x329_best CROSS JOIN x329_refit CROSS JOIN x329_np
"""

EXT15_QUERIES.update({"x329_ransac": q_x329_ransac})
EXT15_ORACLES.update({"x329_ransac": SQL_X329})


# ----------------------------- x330: Hodges-Lehmann location


def q_x330_hodges_lehmann(spark, sf_dir):
    """Per-nation Hodges-Lehmann robust location of customer account
    balances (operators/sketch.py:hodges_lehmann): the median of the
    64-representative Walsh-average grid — the signed-rank robust
    mean beside the MAD spread (x51)."""
    from .operators.sketch import hodges_lehmann

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    return hodges_lehmann(cust, ["nation"], "bal", max_values=64)


SQL_X330 = """
WITH x330_base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         CAST(c_acctbal AS DOUBLE) AS v
  FROM customer WHERE c_acctbal IS NOT NULL
), x330_kept AS (
  SELECT nation, v, rn FROM (
    SELECT nation, v,
           ROW_NUMBER() OVER (
             PARTITION BY nation
             ORDER BY ('0x' || substr(
                 md5('hl' || ':' || CAST(v AS VARCHAR)), 1, 8
               ))::BIGINT, v
           ) AS rn
    FROM x330_base
  ) WHERE rn <= 64
)
SELECT a.nation AS nation,
       CAST(MAX(b.rn) AS BIGINT) AS n_used,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(quantile_cont((a.v + b.v) / 2.0, 0.5) * 1000000.0)
         / 1000000.0 AS hl_estimate
FROM x330_kept a JOIN x330_kept b
  ON a.nation = b.nation AND a.rn <= b.rn
GROUP BY 1
ORDER BY 1
"""

EXT15_QUERIES.update({"x330_hodges_lehmann": q_x330_hodges_lehmann})
EXT15_ORACLES.update({"x330_hodges_lehmann": SQL_X330})


# ----------------------------- x331: Gumbel block-maxima return levels

_X331_RP = (30, 365)


def q_x331_gumbel(spark, sf_dir):
    """Per-event-type extreme-value return levels from daily block
    maxima (operators/temporal.py:gumbel_block_maxima): the
    method-of-moments Gumbel fit with literal-pinned gamma / sqrt6/pi
    / quantile factors — daily peaks exceeded once-a-month and
    once-a-year."""
    from .operators.temporal import gumbel_block_maxima
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    return gumbel_block_maxima(
        ev, entity_col="event_type", ts_col="ts_us",
        value_col="value", return_periods=_X331_RP,
    )


def _sql_x331() -> str:
    import math

    g = 0.5772156649015329
    s6p = 0.7796968012336761
    rl_cols = []
    for t in _X331_RP:
        q = -math.log(-math.log(1.0 - 1.0 / t))
        rl_cols.append(
            f"ROUND((mu + beta * CAST({q!r} AS DOUBLE)) * 1000000.0)"
            f" / 1000000.0 AS rl_{t}"
        )
    return f"""
WITH x331_blocks AS (
  SELECT event_type AS entity,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS b,
         MAX(CAST(value AS DOUBLE)) AS m
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), x331_mom AS (
  SELECT entity, COUNT(*) AS n,
         SUM(CAST(ROUND(m, 9) AS DECIMAL(38,9))) AS s1,
         SUM(CAST(ROUND(m * m, 9) AS DECIMAL(38,9))) AS s2
  FROM x331_blocks GROUP BY 1
  HAVING COUNT(*) >= 5
), x331_fit AS (
  SELECT entity, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         sqrt(GREATEST(
           (CAST(s2 AS DOUBLE)
            - CAST(n AS DOUBLE)
              * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
           / (CAST(n AS DOUBLE) - 1.0), 0.0)) AS std
  FROM x331_mom
), x331_p AS (
  SELECT entity, n, mean, std,
         std * CAST({s6p!r} AS DOUBLE) AS beta,
         mean - CAST({g!r} AS DOUBLE)
              * (std * CAST({s6p!r} AS DOUBLE)) AS mu
  FROM x331_fit
)
SELECT entity, CAST(n AS BIGINT) AS n_blocks,
       ROUND(mean * 1000000.0) / 1000000.0 AS max_mean,
       ROUND(std * 1000000.0) / 1000000.0 AS max_std,
       ROUND(mu * 1000000.0) / 1000000.0 AS gumbel_mu,
       ROUND(beta * 1000000.0) / 1000000.0 AS gumbel_beta,
       {", ".join(rl_cols)}
FROM x331_p
ORDER BY entity
"""


SQL_X331 = _sql_x331()

EXT15_QUERIES.update({"x331_gumbel": q_x331_gumbel})
EXT15_ORACLES.update({"x331_gumbel": SQL_X331})


# ----------------------------- x332: perceptual DCT hash (pHash)


def q_x332_image_phash(spark, sf_dir):
    """REAL-decode perceptual DCT hashing end to end
    (operators/multimodal.py:image_phash): the x84 BMP fingerprint
    payloads go through the real decode -> 8x8 thumbnail -> integer
    Q14 DCT -> 63-AC-median threshold.  The oracle never sees the
    bytes: it replays the identical integer transform from the pixel
    formula and the shared literal cosine table — an exact match
    proves the whole frequency-domain pipeline bit-correct."""
    from .operators.multimodal import image_phash
    from .queries_ext2 import _BMP88_HEADER_HEX, _ahash_pixel_counts_spark

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nt = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), nt.alias("__nt")
    )
    counts = _ahash_pixel_counts_spark(F.col("__nt"))
    pixel_hex = F.concat_ws(
        "",
        *[F.repeat(F.lpad(F.hex(c), 2, "0"), 3) for c in counts],
    )
    payload = F.concat(
        F.unhex(F.lit(_BMP88_HEADER_HEX)), F.unhex(pixel_hex)
    )
    return image_phash(
        staged.select("doc_id", payload.alias("payload")),
        "doc_id",
        "payload",
    )


def _sql_x332() -> str:
    from .operators.multimodal import phash_dct_table
    from .queries_ext2 import _AHASH_LETTERS

    ql = [v for row in phash_dct_table() for v in row]
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
    kidx = "[" + ", ".join(str(k) for k in range(64)) + "]"
    qlit = "[" + ", ".join(str(v) for v in ql) + "]"
    hi = " + ".join(
        f"CASE WHEN cf[{k + 1}] > med THEN {1 << (31 - k)} ELSE 0 END"
        for k in range(32)
    )
    lo = " + ".join(
        f"CASE WHEN cf[{k + 1}] > med THEN {1 << (63 - k)} ELSE 0 END"
        for k in range(32, 64)
    )
    return f"""
WITH x332_t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), x332_c AS (
  SELECT doc_id,
         list_value(
           {px}) AS px
  FROM x332_t
), x332_d AS (
  SELECT doc_id,
         list_transform({kidx}, k ->
           list_reduce(list_transform({kidx}, m ->
             CAST({qlit}[(k // 8) * 8 + (m // 8) + 1] AS BIGINT)
             * CAST({qlit}[(k % 8) * 8 + (m % 8) + 1] AS BIGINT)
             * CAST(px[m + 1] AS BIGINT)
           ), (a, x) -> a + x)
         ) AS cf
  FROM x332_c
), x332_m AS (
  SELECT doc_id, cf, list_sort(cf[2:64])[32] AS med FROM x332_d
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(8 AS INTEGER) AS h,
       CAST(8 AS INTEGER) AS w,
       lpad(lower(hex({hi})), 8, '0') ||
       lpad(lower(hex({lo})), 8, '0') AS phash
FROM x332_m
"""


SQL_X332 = _sql_x332()

EXT15_QUERIES.update({"x332_image_phash": q_x332_image_phash})
EXT15_ORACLES.update({"x332_image_phash": SQL_X332})


# ----------------------------- x333: audio spectral profile

_X333_NFFT = 64
_X333_NBINS = 8


def q_x333_spectral(spark, sf_dir):
    """REAL-decode spectral profiling end to end
    (operators/multimodal.py:audio_spectral_profile): the x102
    deterministic 64-sample PCM WAV payloads through the real RIFF
    decode and the Q7 integer DFT — dominant bin, spectral centroid
    and peak ratio, all integer until the two final divisions.  The
    oracle replays the DFT from the sample formula and the shared
    literal tables without ever seeing the bytes."""
    from .operators.multimodal import audio_spectral_profile
    from .queries_ext3 import _WAV_SAMPLE_HEX, _wav_header_hex

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.concat(
        F.unhex(F.lit(_wav_header_hex())),
        F.unhex(F.concat_ws("", F.expr(_WAV_SAMPLE_HEX))),
    )
    staged = docs.select(
        F.col("doc_id").cast("long").alias("asset_id"),
        payload.alias("payload"),
    )
    return audio_spectral_profile(
        staged, n_fft=_X333_NFFT, n_bins=_X333_NBINS
    ).orderBy("asset_id")


def _sql_x333() -> str:
    from .operators.multimodal import spectral_tables

    nf, nb = _X333_NFFT, _X333_NBINS
    cos_t, sin_t = spectral_tables(nf, nb)
    iidx = "[" + ", ".join(str(i) for i in range(nf)) + "]"
    ab = []
    for k in range(nb):
        cl = "[" + ", ".join(str(v) for v in cos_t[k]) + "]"
        sl = "[" + ", ".join(str(v) for v in sin_t[k]) + "]"
        ab.append(
            f"list_reduce(list_transform({iidx}, i -> "
            f"CAST({cl}[i + 1] AS BIGINT) * sm[i + 1]), "
            f"(a, x) -> a + x) AS a{k + 1}"
        )
        ab.append(
            f"list_reduce(list_transform({iidx}, i -> "
            f"CAST({sl}[i + 1] AS BIGINT) * sm[i + 1]), "
            f"(a, x) -> a + x) AS b{k + 1}"
        )
    pw = ", ".join(
        f"a{k + 1} * a{k + 1} + b{k + 1} * b{k + 1}"
        for k in range(nb)
    )
    wsum = " + ".join(f"{k + 1} * pw[{k + 1}]" for k in range(nb))
    abx = ",\n         ".join(ab)
    return f"""
WITH x333_s AS (
  SELECT CAST(doc_id AS BIGINT) AS asset_id,
         list_transform({iidx}, i ->
           CAST((doc_id * 31 + i * 17) % 2001 - 1000 AS BIGINT)
         ) AS sm
  FROM documents
), x333_ab AS (
  SELECT asset_id,
         {abx}
  FROM x333_s
), x333_p AS (
  SELECT asset_id, [{pw}] AS pw FROM x333_ab
), x333_f AS (
  SELECT asset_id, pw,
         list_reduce(pw, (a, x) -> a + x) AS total,
         list_max(pw) AS pmax,
         list_position(pw, list_max(pw)) AS kdom
  FROM x333_p
)
SELECT asset_id,
       CAST({nf} AS BIGINT) AS n_samples,
       CAST(kdom AS INTEGER) AS dominant_bin,
       CAST(pmax AS BIGINT) AS p_dominant,
       CAST(total AS BIGINT) AS p_total,
       CASE WHEN total > 0 THEN
         ROUND((CAST({wsum} AS DOUBLE) / CAST(total AS DOUBLE))
               * 1000000.0) / 1000000.0 END AS centroid,
       CASE WHEN total > 0 THEN
         ROUND((CAST(pmax AS DOUBLE) / CAST(total AS DOUBLE))
               * 1000000.0) / 1000000.0 END AS peak_ratio
FROM x333_f
ORDER BY asset_id
"""


SQL_X333 = _sql_x333()

EXT15_QUERIES.update({"x333_spectral": q_x333_spectral})
EXT15_ORACLES.update({"x333_spectral": SQL_X333})
