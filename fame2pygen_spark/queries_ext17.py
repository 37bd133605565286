"""Round-7 extension queries, second session (x335+): econometric
filter family — band-pass cycle extraction, exact Hodrick–Prescott
trend/cycle, Chow structural-break testing — then the round's later
operator families.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

EXT17_QUERIES: dict = {}
EXT17_ORACLES: dict = {}

_US_PER_DAY = 86_400_000_000


# ------------------ x335: Baxter–King band-pass business-cycle filter


def q_x335_bandpass(spark, sf_dir):
    """Baxter–King band-pass cycle (operators/temporal.py:
    bandpass_filter) of monthly order revenue per market segment —
    the 25-term zero-sum literal-weight filter passing 6–32-month
    cycles, complete-window-only (edge months and gap neighbours emit
    nothing).  The deviation-cycle companion to x292's Henderson
    trend; customer is the broadcast dimension side."""
    from .operators.temporal import bandpass_filter

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    panel = (
        o.where(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
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
    out = bandpass_filter(
        panel, entity_col="segment", t_col="midx", value_col="v",
        low=6, high=32, k=12,
    )
    return out.select(
        "segment", F.col("midx").cast("long").alias("midx"), "value",
        "cycle",
    )


def _sql_x335() -> str:
    from .operators.temporal import baxter_king_weights

    ws = baxter_king_weights(6, 32, 12)
    terms = []
    for idx, j in enumerate(range(-12, 13)):
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
WITH t335_panel AS (
  SELECT c_mktsegment AS segment,
         year(o_orderdate) * 12 + month(o_orderdate) AS midx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12))) AS DOUBLE) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
),
t335_f AS (
  SELECT segment, midx, ROUND(v, 6) AS value,
         CASE WHEN LAG(midx, 12) OVER w = midx - 12
               AND LEAD(midx, 12) OVER w = midx + 12
              THEN ROUND({acc}, 6) END AS cycle
  FROM t335_panel WINDOW w AS (PARTITION BY segment ORDER BY midx)
)
SELECT segment, CAST(midx AS BIGINT) AS midx, value, cycle
FROM t335_f
WHERE cycle IS NOT NULL
ORDER BY segment, midx
"""


EXT17_QUERIES.update({"x335_bandpass": q_x335_bandpass})
EXT17_ORACLES.update({"x335_bandpass": _sql_x335()})


# --------------------- x336: exact Hodrick–Prescott trend/cycle


def q_x336_hp_filter(spark, sf_dir):
    """Exact Hodrick–Prescott decomposition (operators/temporal.py:
    hp_filter) of each event type's daily value series: the SPD
    pentadiagonal system ``(I + 1600 D'D) tau = y`` solved exactly by
    an LDL' recursion inside ONE Arrow-batched mapInPandas stage.
    The oracle replays the identical factorization / forward /
    back-substitution recurrences as two recursive CTEs carrying the
    factor lists (the x323 DTW wavefront idiom applied to a linear
    solve), so both engines produce bit-equal IEEE doubles before the
    tie-safe 6 dp round."""
    from .operators.temporal import hp_filter
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    panel = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type"),
            F.expr(f"ts_us div {_US_PER_DAY}").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    return hp_filter(
        panel, entity_col="event_type", t_col="day", value_col="v",
        lam=1600.0,
    )


def _sql_x336() -> str:
    lam = "1600.0"
    # pentadiagonal coefficients of I + lam*D'D at 1-based position s
    # (mirrors operators/temporal.py:_hp_coeffs exactly)
    dcoef = (
        f"(CAST(1.0 AS DOUBLE) + CAST({lam} AS DOUBLE) * "
        "(CASE WHEN s = 1 OR s = n THEN 1 "
        "WHEN s = 2 OR s = n - 1 THEN 5 ELSE 6 END))"
    )
    ecoef = (
        f"(CASE WHEN s = 2 OR s = n THEN CAST(-2.0 AS DOUBLE) * {lam} "
        f"ELSE CAST(-4.0 AS DOUBLE) * {lam} END)"
    )
    return f"""
WITH RECURSIVE x336_daily AS (
  SELECT event_type AS e,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY} AS t,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
), x336_arr AS (
  SELECT e, list(t ORDER BY t) AS ts, list(v ORDER BY t) AS ys,
         CAST(count(*) AS INTEGER) AS n
  FROM x336_daily GROUP BY e
), x336_fwd AS (
  -- LDL' forward recursion, one list element per step:
  -- Ds = pivots, L1s/L2s = unit-lower factors, Zs = L z = y solve
  SELECT e, ts, ys, n, CAST(1 AS INTEGER) AS i,
         [CAST(1.0 AS DOUBLE) + CAST({lam} AS DOUBLE) * 1] AS Ds,
         [CAST(0.0 AS DOUBLE)] AS L1s,
         [CAST(0.0 AS DOUBLE)] AS L2s,
         [ys[1]] AS Zs
  FROM x336_arr
  UNION ALL
  SELECT e, ts, ys, n, s AS i,
         list_append(Ds, {dcoef} - l1 * l1 * d1 - l2 * l2 * d2) AS Ds,
         list_append(L1s, l1) AS L1s,
         list_append(L2s, l2) AS L2s,
         list_append(Zs,
           ys[s] - l1 * Zs[CAST(s - 1 AS INTEGER)]
                 - l2 * COALESCE(Zs[CAST(s - 2 AS INTEGER)],
                                 CAST(0.0 AS DOUBLE))) AS Zs
  FROM (
    SELECT e, ts, ys, n, s, Ds, L1s, L2s, Zs, d1, d2, l2,
           ({ecoef} - l2 * d2 * L1s[CAST(s - 1 AS INTEGER)]) / d1 AS l1
    FROM (
      SELECT e, ts, ys, n, s, Ds, L1s, L2s, Zs, d1, d2,
             CASE WHEN s >= 3 THEN CAST({lam} AS DOUBLE) / d2
                  ELSE CAST(0.0 AS DOUBLE) END AS l2
      FROM (
        SELECT e, ts, ys, n, CAST(i + 1 AS INTEGER) AS s,
               Ds, L1s, L2s, Zs,
               Ds[i] AS d1,
               COALESCE(Ds[CAST(i - 1 AS INTEGER)],
                        CAST(0.0 AS DOUBLE)) AS d2
        FROM x336_fwd WHERE i < n
      )
    )
  )
), x336_bwd AS (
  -- back substitution L' tau = z / D, descending from i = n
  SELECT e, ts, ys, n, Ds, L1s, L2s, Zs, n AS i,
         [Zs[n] / Ds[n] - CAST(0.0 AS DOUBLE) - CAST(0.0 AS DOUBLE)]
           AS taus
  FROM x336_fwd WHERE i = n
  UNION ALL
  SELECT e, ts, ys, n, Ds, L1s, L2s, Zs, CAST(i - 1 AS INTEGER) AS i,
         list_prepend(
           Zs[CAST(i - 1 AS INTEGER)] / Ds[CAST(i - 1 AS INTEGER)]
           - L1s[i] * taus[1]
           - CASE WHEN i + 1 <= n
                  THEN L2s[CAST(i + 1 AS INTEGER)] * taus[2]
                  ELSE CAST(0.0 AS DOUBLE) END,
           taus) AS taus
  FROM x336_bwd WHERE i > 1
), x336_rows AS (
  SELECT e AS entity, UNNEST(ts) AS t, UNNEST(ys) AS value,
         UNNEST(taus) AS trend
  FROM x336_bwd WHERE i = 1
)
SELECT entity, CAST(t AS BIGINT) AS t,
       ROUND(value * 1000000.0) / 1000000.0 AS value,
       ROUND(trend * 1000000.0) / 1000000.0 AS trend,
       ROUND((value - trend) * 1000000.0) / 1000000.0 AS cycle
FROM x336_rows
ORDER BY entity, t
"""


EXT17_QUERIES.update({"x336_hp_filter": q_x336_hp_filter})
EXT17_ORACLES.update({"x336_hp_filter": _sql_x336()})


# ------------------------- x337: Chow structural-break test


def q_x337_chow_break(spark, sf_dir):
    """Chow structural-break F-test (operators/temporal.py:
    chow_break_test) on each event type's daily value series, split
    at the deterministic midpoint of the observed day range — did the
    level/trend regime change between the two halves of the month?
    One decimal-exact groupBy pass; all OLS algebra closed-form on
    the sufficient statistics."""
    from .operators.temporal import chow_break_test
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    panel = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type"),
            F.expr(f"ts_us div {_US_PER_DAY}").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    return chow_break_test(
        panel, entity_col="event_type", t_col="day", value_col="v",
        f_crit=3.0,
    )


def _sql_x337() -> str:
    dec = "DECIMAL(38,12)"

    def seg_sums(cond: str, tag: str) -> str:
        td = f"(CASE WHEN {cond} THEN CAST(t AS DOUBLE) END)"
        yd = f"(CASE WHEN {cond} THEN y END)"
        return f"""
         CAST(COUNT(CASE WHEN {cond} THEN 1 END) AS DOUBLE) AS n{tag},
         CAST(SUM(CAST({td} AS {dec})) AS DOUBLE) AS st{tag},
         CAST(SUM(CAST({yd} AS {dec})) AS DOUBLE) AS sy{tag},
         CAST(SUM(CAST({td} * CAST(t AS DOUBLE) AS {dec})) AS DOUBLE)
           AS stt{tag},
         CAST(SUM(CAST({td} * y AS {dec})) AS DOUBLE) AS sty{tag},
         CAST(SUM(CAST({yd} * y AS {dec})) AS DOUBLE) AS syy{tag}"""

    def ssr(tag: str) -> str:
        # mirrors chow_break_test's ssr(): left-to-right double
        # algebra, fully parenthesized so the expansion composes
        return (
            f"((syy{tag} - sy{tag} * sy{tag} / n{tag})"
            f" - (sty{tag} - st{tag} * sy{tag} / n{tag})"
            f" * (sty{tag} - st{tag} * sy{tag} / n{tag})"
            f" / (stt{tag} - st{tag} * st{tag} / n{tag}))"
        )

    def sxx(tag: str) -> str:
        return f"(stt{tag} - st{tag} * st{tag} / n{tag})"

    fstat = (
        f"(({ssr('')} - {ssr('1')} - {ssr('2')}) / 2.0)"
        f" / (({ssr('1')} + {ssr('2')}) / (n - 4.0))"
    )
    ok = (
        f"n1 >= 3 AND n2 >= 3 AND {sxx('')} > 0"
        f" AND {sxx('1')} > 0 AND {sxx('2')} > 0"
        f" AND ({ssr('1')} + {ssr('2')}) > 0"
    )
    return f"""
WITH x337_daily AS (
  SELECT event_type AS e,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY} AS t,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
), x337_lim AS (
  SELECT e, CAST(floor((MIN(t) + MAX(t)) / 2) AS BIGINT) AS break_t
  FROM x337_daily GROUP BY e
), x337_agg AS (
  SELECT d.e, l.break_t,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(CAST(t AS DOUBLE) AS {dec})) AS DOUBLE) AS st,
         CAST(SUM(CAST(y AS {dec})) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) AS {dec}))
              AS DOUBLE) AS stt,
         CAST(SUM(CAST(CAST(t AS DOUBLE) * y AS {dec})) AS DOUBLE)
           AS sty,
         CAST(SUM(CAST(y * y AS {dec})) AS DOUBLE) AS syy,
         {seg_sums('t <= l.break_t', '1')},
         {seg_sums('t > l.break_t', '2')}
  FROM x337_daily d JOIN x337_lim l ON d.e = l.e
  GROUP BY d.e, l.break_t
)
SELECT e AS entity,
       CAST(n1 AS BIGINT) AS n1,
       CAST(n2 AS BIGINT) AS n2,
       break_t,
       CASE WHEN {ok}
            THEN ROUND(({fstat}) * 1000000.0) / 1000000.0 END AS f_stat,
       CASE WHEN {ok}
            THEN CAST(({fstat}) > 3.0 AS INTEGER) END AS break_flag
FROM x337_agg
ORDER BY entity
"""


EXT17_QUERIES.update({"x337_chow_break": q_x337_chow_break})
EXT17_ORACLES.update({"x337_chow_break": _sql_x337()})


# ------------------------------ x338: Hurst exponent (R/S analysis)


def q_x338_hurst(spark, sf_dir):
    """Rescaled-range Hurst exponent (operators/temporal.py:hurst_rs)
    of monthly order revenue per market segment — long-memory readout
    over the same panel as x335's band-pass cycle.  Decimal-exact
    block moments, pinned cumulative-deviation order, literal ln n,
    3-point log-log slope."""
    from .operators.temporal import hurst_rs

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    panel = (
        o.where(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
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
    return hurst_rs(panel, entity_col="segment", t_col="midx", value_col="v")


def _sql_x338() -> str:
    from .operators.temporal import _HURST_LN_N

    lx = (
        "CASE bs "
        + " ".join(
            f"WHEN {n} THEN CAST({_HURST_LN_N[n]!r} AS DOUBLE)"
            for n in (8, 16, 32)
        )
        + " END"
    )
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    slope = (
        f"({sd('lx * lz')} - {sd('lx')} * {sd('lz')} / 3.0)"
        f" / ({sd('lx * lx')} - {sd('lx')} * {sd('lx')} / 3.0)"
    )
    mrs = "ROUND(MAX(CASE WHEN bs = {n} THEN mean_rs END) * 1000000.0) / 1000000.0 AS mean_rs_{n}"
    return f"""
WITH x338_panel AS (
  SELECT c_mktsegment AS e,
         year(o_orderdate) * 12 + month(o_orderdate) AS midx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12))) AS DOUBLE) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), x338_rn AS (
  SELECT e, v,
         ROW_NUMBER() OVER (PARTITION BY e ORDER BY midx) - 1 AS rn
  FROM x338_panel
), x338_np AS (
  SELECT e, CAST(COUNT(*) AS BIGINT) AS n_points FROM x338_rn GROUP BY e
), x338_blocks AS (
  SELECT e, rn, v, bs, floor(rn / bs) AS blk
  FROM x338_rn CROSS JOIN (VALUES (8), (16), (32)) AS s(bs)
), x338_enriched AS (
  SELECT e, bs, blk, rn, v,
         CAST(SUM(CAST(v AS DECIMAL(38,12)))
              OVER (PARTITION BY e, bs, blk) AS DOUBLE) / bs AS bmean,
         COUNT(*) OVER (PARTITION BY e, bs, blk) AS bn
  FROM x338_blocks
), x338_cum AS (
  SELECT e, bs, blk, v, bmean,
         SUM(v - bmean) OVER (PARTITION BY e, bs, blk ORDER BY rn
                              ROWS UNBOUNDED PRECEDING) AS cumdev
  FROM x338_enriched WHERE bn = bs
), x338_per_block AS (
  SELECT e, bs, blk,
         MAX(cumdev) - MIN(cumdev) AS r,
         sqrt(CAST(SUM(CAST((v - bmean) * (v - bmean)
                            AS DECIMAL(38,12))) AS DOUBLE) / bs) AS s
  FROM x338_cum GROUP BY e, bs, blk
), x338_per_n AS (
  SELECT e, bs,
         CAST(SUM(CAST(r / s AS DECIMAL(38,12))) AS DOUBLE)
           / COUNT(*) AS mean_rs
  FROM x338_per_block WHERE s > 0 GROUP BY e, bs
), x338_lt AS (
  SELECT e, bs, mean_rs, ROUND(ln(mean_rs), 6) AS lz, {lx} AS lx
  FROM x338_per_n
), x338_fit AS (
  SELECT e,
         {mrs.format(n=8)},
         {mrs.format(n=16)},
         {mrs.format(n=32)},
         CASE WHEN COUNT(*) = 3
              THEN ROUND(({slope}) * 1000000.0) / 1000000.0
         END AS hurst
  FROM x338_lt GROUP BY e
)
SELECT f.e AS entity, np.n_points, mean_rs_8, mean_rs_16, mean_rs_32,
       hurst
FROM x338_fit f JOIN x338_np np ON f.e = np.e
ORDER BY entity
"""


EXT17_QUERIES.update({"x338_hurst": q_x338_hurst})
EXT17_ORACLES.update({"x338_hurst": _sql_x338()})


# ---------------------------- x339: permutation entropy (order 3)


def q_x339_perm_entropy(spark, sf_dir):
    """Order-3 permutation entropy (operators/temporal.py:
    permutation_entropy) of each event type's daily value series —
    rank-based dynamics complexity, the monotone-invariant companion
    to x338.  Integer pattern counts; the only float step is p·ln p
    on exact rationals."""
    from .operators.temporal import permutation_entropy
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    panel = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type"),
            F.expr(f"ts_us div {_US_PER_DAY}").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    return permutation_entropy(
        panel, entity_col="event_type", t_col="day", value_col="v"
    )


def _sql_x339() -> str:
    return f"""
WITH x339_daily AS (
  SELECT event_type AS e,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY} AS t,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
), x339_tri AS (
  SELECT e,
         CAST(a > b AS INTEGER) * 4 + CAST(b > v AS INTEGER) * 2
           + CAST(a > v AS INTEGER) AS pat
  FROM (
    SELECT e, v, LAG(v, 2) OVER w AS a, LAG(v, 1) OVER w AS b
    FROM x339_daily WINDOW w AS (PARTITION BY e ORDER BY t)
  ) WHERE a IS NOT NULL
), x339_per_pat AS (
  SELECT e, pat, CAST(COUNT(*) AS DOUBLE) AS c
  FROM x339_tri GROUP BY e, pat
), x339_tot AS (
  SELECT e, pat, c, SUM(c) OVER (PARTITION BY e) AS tot
  FROM x339_per_pat
)
SELECT e AS entity,
       CAST(MAX(tot) AS BIGINT) AS n_triples,
       CAST(COUNT(*) AS BIGINT) AS n_patterns,
       ROUND(((-(CAST(SUM(CAST((c / tot) * ln(c / tot)
                              AS DECIMAL(38,12))) AS DOUBLE)))
              / CAST(1.791759469228055 AS DOUBLE)) * 1000000.0)
         / 1000000.0 AS perm_entropy
FROM x339_tot GROUP BY e
ORDER BY entity
"""


EXT17_QUERIES.update({"x339_perm_entropy": q_x339_perm_entropy})
EXT17_ORACLES.update({"x339_perm_entropy": _sql_x339()})


# --------------------------------- x340: sample entropy (m=2)


def q_x340_sampen(spark, sf_dir):
    """Sample entropy (operators/temporal.py:sample_entropy, m=2,
    r=0.2·std) of each event type's daily value series — template
    regularity in the value metric, closing the x338–x340 complexity
    triple.  Entity-keyed quadratic pair frame under the loud-fail
    length cap; exact integer match counts."""
    from .operators.temporal import sample_entropy
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    panel = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type"),
            F.expr(f"ts_us div {_US_PER_DAY}").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    return sample_entropy(
        panel, entity_col="event_type", t_col="day", value_col="v",
        r_frac=0.2,
    )


def _sql_x340() -> str:
    return f"""
WITH x340_daily AS (
  SELECT event_type AS e,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY} AS t,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
), x340_rn AS (
  SELECT e, v, ROW_NUMBER() OVER (PARTITION BY e ORDER BY t) AS rn
  FROM x340_daily
), x340_stats AS (
  SELECT e, COUNT(*) AS n,
         CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) AS sv,
         CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS svv
  FROM x340_rn GROUP BY e
), x340_tol AS (
  SELECT e, CAST(n AS BIGINT) AS n_points,
         CAST(0.2 AS DOUBLE)
           * sqrt(greatest(svv / n - (sv / n) * (sv / n),
                           CAST(0.0 AS DOUBLE))) AS r
  FROM x340_stats
), x340_seq AS (
  SELECT * FROM (
    SELECT e, rn AS i, v AS x0,
           LEAD(v, 1) OVER w AS x1, LEAD(v, 2) OVER w AS x2
    FROM x340_rn WINDOW w AS (PARTITION BY e ORDER BY rn)
  ) WHERE x2 IS NOT NULL
), x340_pairs AS (
  SELECT a.e, t.n_points, t.r,
         a.x2 AS xa2, b.x2 AS xb2
  FROM x340_seq a
  JOIN x340_seq b ON a.e = b.e AND a.i < b.i
  JOIN x340_tol t ON a.e = t.e
  WHERE abs(a.x0 - b.x0) <= t.r AND abs(a.x1 - b.x1) <= t.r
), x340_counts AS (
  SELECT e, n_points,
         CAST(COUNT(*) AS BIGINT) AS b_pairs,
         CAST(COUNT(CASE WHEN abs(xa2 - xb2) <= r THEN 1 END)
              AS BIGINT) AS a_pairs
  FROM x340_pairs GROUP BY e, n_points
)
SELECT t.e AS entity, t.n_points,
       COALESCE(c.b_pairs, 0) AS b_pairs,
       COALESCE(c.a_pairs, 0) AS a_pairs,
       CASE WHEN COALESCE(c.a_pairs, 0) > 0
            THEN ROUND((-ln(c.a_pairs / c.b_pairs)) * 1000000.0)
                   / 1000000.0
       END AS sampen
FROM x340_tol t LEFT JOIN x340_counts c
  ON t.e = c.e AND t.n_points = c.n_points
ORDER BY entity
"""


EXT17_QUERIES.update({"x340_sampen": q_x340_sampen})
EXT17_ORACLES.update({"x340_sampen": _sql_x340()})


# --------------------------- x341: grid-bucketed LOF density outliers


def q_x341_lof(spark, sf_dir):
    """Local Outlier Factor (operators/ml.py:lof_grid, k=5) over the
    first two embedding components — the density-ratio outlier score
    on the 2-D projection, grid-bucketed so the kNN join is one
    equi-join on the packed cell id.  FLOAT→DOUBLE widening is exact,
    so both engines score identical coordinates."""
    from .operators.ml import lof_grid

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pts = emb.select(
        F.col("vec_id").cast("long").alias("vid"),
        F.element_at("embedding", 1).cast("double").alias("ex"),
        F.element_at("embedding", 2).cast("double").alias("ey"),
    ).where(F.col("ex").isNotNull() & F.col("ey").isNotNull())
    return lof_grid(
        pts, id_col="vid", x_col="ex", y_col="ey", k=5, cell=0.2
    )


def _sql_x341() -> str:
    k = 5
    offs = ", ".join(
        f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    return f"""
WITH x341_pts AS (
  SELECT CAST(vec_id AS BIGINT) AS pid,
         CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
  WHERE embedding[1] IS NOT NULL AND embedding[2] IS NOT NULL
    AND vec_id IS NOT NULL
), x341_cells AS (
  SELECT pid, x, y,
         CAST(floor(x / CAST(0.2 AS DOUBLE)) AS BIGINT) AS cx,
         CAST(floor(y / CAST(0.2 AS DOUBLE)) AS BIGINT) AS cy
  FROM x341_pts
), x341_probes AS (
  SELECT pid AS a_id, x AS ax, y AS ay,
         cx + dx AS jx, cy + dy AS jy
  FROM x341_cells CROSS JOIN (VALUES {offs}) AS o(dx, dy)
), x341_pairs AS (
  SELECT p.a_id, b.pid AS b_id,
         sqrt((p.ax - b.x) * (p.ax - b.x)
              + (p.ay - b.y) * (p.ay - b.y)) AS dist
  FROM x341_probes p JOIN x341_cells b
    ON p.jx = b.cx AND p.jy = b.cy AND p.a_id <> b.pid
), x341_edges AS (
  SELECT a_id, b_id, dist FROM (
    SELECT a_id, b_id, dist,
           ROW_NUMBER() OVER (PARTITION BY a_id
                              ORDER BY dist, b_id) AS rk
    FROM x341_pairs
  ) WHERE rk <= {k}
), x341_per_pt AS (
  SELECT a_id, CAST(COUNT(*) AS BIGINT) AS n_cand,
         MAX(dist) AS k_dist
  FROM x341_edges GROUP BY a_id
), x341_kdist AS (
  SELECT a_id AS b_id, k_dist AS kd_b
  FROM x341_per_pt WHERE n_cand = {k}
), x341_reach AS (
  SELECT e.a_id, e.b_id, greatest(kd.kd_b, e.dist) AS rd
  FROM x341_edges e JOIN x341_kdist kd ON e.b_id = kd.b_id
), x341_lrd AS (
  SELECT a_id,
         CASE WHEN COUNT(*) = {k}
               AND CAST(SUM(CAST(rd AS DECIMAL(38,12))) AS DOUBLE) > 0
              THEN CAST({float(k)!r} AS DOUBLE)
                   / CAST(SUM(CAST(rd AS DECIMAL(38,12))) AS DOUBLE)
         END AS lrd
  FROM x341_reach GROUP BY a_id
), x341_lof AS (
  SELECT e.a_id, COUNT(*) AS n_l,
         CAST(SUM(CAST(nl.lrd AS DECIMAL(38,12))) AS DOUBLE) AS s_l
  FROM x341_edges e
  JOIN x341_lrd nl ON e.b_id = nl.a_id
  WHERE nl.lrd IS NOT NULL
  GROUP BY e.a_id
)
SELECT p.pid AS id,
       COALESCE(pp.n_cand, 0) AS n_cand,
       ROUND(CASE WHEN pp.n_cand = {k} THEN pp.k_dist END
             * 1000000.0) / 1000000.0 AS k_dist,
       ROUND(l.lrd * 1000000.0) / 1000000.0 AS lrd,
       ROUND(CASE WHEN l.lrd IS NOT NULL AND lo.n_l = {k}
                  THEN (lo.s_l / CAST({float(k)!r} AS DOUBLE)) / l.lrd
             END * 1000000.0) / 1000000.0 AS lof
FROM x341_pts p
LEFT JOIN x341_per_pt pp ON p.pid = pp.a_id
LEFT JOIN x341_lrd l ON p.pid = l.a_id
LEFT JOIN x341_lof lo ON p.pid = lo.a_id
ORDER BY id
"""


EXT17_QUERIES.update({"x341_lof": q_x341_lof})
EXT17_ORACLES.update({"x341_lof": _sql_x341()})


# ------------------------------- x342: GMM EM step (two components)


def q_x342_gmm_step(spark, sf_dir):
    """One exact EM step of a two-component Gaussian mixture
    (operators/ml.py:gmm_em_step) on customer account balances per
    nation, from literal init (mu 0 / 5000, sigma 3000, pi 1/2) —
    the E-step is one logistic per row, the M-step decimal-exact
    weighted moments in a single groupBy."""
    from .operators.ml import gmm_em_step

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = c.select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_acctbal").alias("bal"),
    )
    return gmm_em_step(
        base, group_col="nation", value_col="bal",
        mu1=0.0, mu2=5000.0, sigma=3000.0, pi2=0.5,
    )


def _sql_x342() -> str:
    two_s2 = 2.0 * 3000.0 * 3000.0
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    g = (
        "(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp("
        "((v - 5000.0) * (v - 5000.0) - (v - 0.0) * (v - 0.0))"
        f" / CAST({two_s2!r} AS DOUBLE) + CAST(0.0 AS DOUBLE))))"
    )
    return f"""
WITH x342_base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS grp,
         CAST(c_acctbal AS DOUBLE) AS v
  FROM customer WHERE c_acctbal IS NOT NULL
), x342_g AS (
  SELECT grp, v, {g} AS g FROM x342_base
), x342_agg AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         {sd('g')} AS sg, {sd('g * v')} AS sgx,
         {sd('g * v * v')} AS sgxx,
         {sd('CAST(1.0 AS DOUBLE) - g')} AS sh,
         {sd('(CAST(1.0 AS DOUBLE) - g) * v')} AS shx,
         {sd('(CAST(1.0 AS DOUBLE) - g) * v * v')} AS shxx
  FROM x342_g GROUP BY grp
)
SELECT grp AS "group", n,
       ROUND((sg / n) * 1000000.0) / 1000000.0 AS pi2_new,
       ROUND(CASE WHEN sh > 0 THEN shx / sh END * 1000000.0)
         / 1000000.0 AS mu1_new,
       ROUND(CASE WHEN sg > 0 THEN sgx / sg END * 1000000.0)
         / 1000000.0 AS mu2_new,
       ROUND(CASE WHEN sh > 0
                  THEN shxx / sh - (shx / sh) * (shx / sh)
             END * 1000000.0) / 1000000.0 AS var1_new,
       ROUND(CASE WHEN sg > 0
                  THEN sgxx / sg - (sgx / sg) * (sgx / sg)
             END * 1000000.0) / 1000000.0 AS var2_new
FROM x342_agg
ORDER BY "group"
"""


EXT17_QUERIES.update({"x342_gmm_step": q_x342_gmm_step})
EXT17_ORACLES.update({"x342_gmm_step": _sql_x342()})


# ---------------------- x343: histogram decision stump split search


def q_x343_stump(spark, sf_dir):
    """Histogram decision-stump split (operators/ml.py:
    decision_stump_hist): the Gini-optimal price threshold separating
    urgent/high-priority orders, found LightGBM-style — 20 fixed
    25k-wide bins, one groupBy, ordered scan over the ≤20 histogram
    rows only."""
    from .operators.ml import decision_stump_hist

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("y"),
        F.col("o_totalprice").cast("double").alias("f"),
    )
    return decision_stump_hist(
        base, label_col="y", feature_col="f", bin_width=25000.0,
        n_bins=20,
    )


def _sql_x343() -> str:
    gini = (
        "(CAST(1.0 AS DOUBLE) - ({p} / {n}) * ({p} / {n})"
        " - (CAST(1.0 AS DOUBLE) - {p} / {n})"
        " * (CAST(1.0 AS DOUBLE) - {p} / {n}))"
    )
    g_split = (
        "((nl / n) * " + gini.format(p="pl", n="nl")
        + " + (nr / n) * " + gini.format(p="pr_cnt", n="nr") + ")"
    )
    g_root = gini.format(p="pos", n="n")
    return f"""
WITH x343_base AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y,
         CAST(o_totalprice AS DOUBLE) AS f
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
), x343_binned AS (
  SELECT y,
         least(greatest(CAST(floor(f / CAST(25000.0 AS DOUBLE))
                             AS BIGINT), 0), 19) AS bin
  FROM x343_base
), x343_hist AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(y) AS BIGINT) AS pos_b
  FROM x343_binned GROUP BY bin
), x343_cum AS (
  SELECT bin,
         SUM(n_b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS nl,
         SUM(pos_b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS pl,
         SUM(n_b) OVER () AS n,
         SUM(pos_b) OVER () AS pos
  FROM x343_hist
), x343_splits AS (
  SELECT bin, nl, pl, n, pos, n - nl AS nr, pos - pl AS pr_cnt
  FROM x343_cum WHERE nl > 0 AND nl < n
), x343_scored AS (
  SELECT *, {g_split} AS gini_split FROM x343_splits
), x343_best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY gini_split, bin) AS rk
    FROM x343_scored
  ) WHERE rk = 1
)
SELECT CAST(bin AS BIGINT) AS best_bin,
       ROUND((bin + 1) * CAST(25000.0 AS DOUBLE) * 1000000.0)
         / 1000000.0 AS threshold,
       nl AS n_left, nr AS n_right, pl AS pos_left,
       pr_cnt AS pos_right,
       ROUND({g_root} * 1000000.0) / 1000000.0 AS gini_root,
       ROUND(gini_split * 1000000.0) / 1000000.0 AS gini_split,
       ROUND(({g_root} - gini_split) * 1000000.0) / 1000000.0 AS gain
FROM x343_best
"""


EXT17_QUERIES.update({"x343_stump": q_x343_stump})
EXT17_ORACLES.update({"x343_stump": _sql_x343()})


# -------------------- x344: logistic regression first Newton step


def q_x344_logistic_newton(spark, sf_dir):
    """Closed-form first Newton step of logistic regression
    (operators/ml.py:logistic_newton_step): priority-urgency as a
    function of binned order price and order date — nine decimal-exact
    sufficient statistics, one 3×3 adjugate solve, no iteration.
    Features are INTEGER-quantized (price in 1024-dollar bins, date in
    64-day bins): integer features make every sufficient statistic an
    exact integer/half-integer, so the DECIMAL→DOUBLE handoff is exact
    in both engines and the cubic determinant algebra cannot amplify a
    conversion ulp (raw 7-dp features showed exactly that: DuckDB's
    decimal→double conversion differs from the JVM's by 1 ulp on
    15-digit sums, and det() magnified it past the 6 dp round)."""
    from .operators.ml import logistic_newton_step

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.where(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_totalprice").isNotNull()
        & F.col("o_orderdate").isNotNull()
    ).select(
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("y"),
        F.floor(F.col("o_totalprice") / F.lit(1024.0))
        .cast("double")
        .alias("xp"),
        F.floor(
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
            / F.lit(64.0)
        )
        .cast("double")
        .alias("xd"),
    )
    return logistic_newton_step(
        base, label_col="y", f1_col="xp", f2_col="xd"
    )


def _sql_x344() -> str:
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731

    def det3(a, b, c, d, e, f, g, h, i):
        return (
            f"({a} * ({e} * {i} - {f} * {h})"
            f" - {b} * ({d} * {i} - {f} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g}))"
        )

    det = det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    d0 = det3("g0", "s1", "s2", "g1", "s11", "s12", "g2", "s12", "s22")
    d1 = det3("n", "g0", "s2", "s1", "g1", "s12", "s2", "g2", "s22")
    d2 = det3("n", "s1", "g0", "s1", "s11", "g1", "s2", "s12", "g2")
    return f"""
WITH x344_base AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE)
         END AS y,
         CAST(floor(CAST(o_totalprice AS DOUBLE)
                    / CAST(1024.0 AS DOUBLE)) AS DOUBLE) AS x1,
         CAST(floor(date_diff('day', DATE '1992-01-01', o_orderdate)
                    / CAST(64.0 AS DOUBLE)) AS DOUBLE) AS x2
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    AND o_orderdate IS NOT NULL
), x344_agg AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {sd('x1')} AS s1, {sd('x2')} AS s2,
         {sd('x1 * x1')} AS s11, {sd('x2 * x2')} AS s22,
         {sd('x1 * x2')} AS s12,
         {sd('y - CAST(0.5 AS DOUBLE)')} AS g0,
         {sd('x1 * (y - CAST(0.5 AS DOUBLE))')} AS g1,
         {sd('x2 * (y - CAST(0.5 AS DOUBLE))')} AS g2
  FROM x344_base
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND({det} * 1000000.0) / 1000000.0 AS det,
       ROUND(CASE WHEN abs({det}) > 0
                  THEN CAST(4.0 AS DOUBLE) * {d0} / {det} END
             * 1000000.0) / 1000000.0 AS w0,
       ROUND(CASE WHEN abs({det}) > 0
                  THEN CAST(4.0 AS DOUBLE) * {d1} / {det} END
             * 1000000.0) / 1000000.0 AS w1,
       ROUND(CASE WHEN abs({det}) > 0
                  THEN CAST(4.0 AS DOUBLE) * {d2} / {det} END
             * 1000000.0) / 1000000.0 AS w2
FROM x344_agg
"""


EXT17_QUERIES.update({"x344_logistic_newton": q_x344_logistic_newton})
EXT17_ORACLES.update({"x344_logistic_newton": _sql_x344()})


# ------------------- x345: Unicode script-mixing / confusable audit

_CYR_A = chr(0x0430)   # Cyrillic small a — the classic homoglyph
_ZWSP = chr(0x200B)    # zero-width space


def q_x345_script_mixing(spark, sf_dir):
    """Script-mixing / confusable-spoofing audit (operators/text.py:
    script_mixing_audit) over documents with deterministically
    injected homoglyph poison: every third document has ASCII 'a'
    swapped for Cyrillic а (translate — char-for-char in both
    engines), every fifth gets a leading zero-width space.  The
    synthesis-then-audit pattern of x334: the corpus is clean ASCII,
    so the adversarial variants are fabricated identically in both
    engines and the audit must recover exactly which documents were
    poisoned and how much."""
    from .operators.text import script_mixing_audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.coalesce(F.col("text"), F.lit(""))
    poisoned = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.translate(t, "a", _CYR_A),
        )
        .otherwise(t)
        .alias("t2"),
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(_ZWSP), F.col("t2")),
        )
        .otherwise(F.col("t2"))
        .alias("text"),
    )
    return script_mixing_audit(
        poisoned, id_col="doc_id", text_col="text"
    )


def _sql_x345() -> str:
    from .operators.text import (
        _CYRILLIC_CLASS,
        _GREEK_CLASS,
        _INVISIBLE_CLASS,
    )

    cnt = lambda pat: (  # noqa: E731
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
    )
    return f"""
WITH x345_poison AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         CASE WHEN doc_id % 5 = 0 THEN '{_ZWSP}' || t2 ELSE t2 END
           AS text
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN translate(COALESCE(text, ''), 'a', '{_CYR_A}')
                ELSE COALESCE(text, '') END AS t2
    FROM documents
  )
), x345_counts AS (
  SELECT id,
         {cnt('[A-Za-z]')} AS n_latin,
         {cnt(_CYRILLIC_CLASS)} AS n_cyrillic,
         {cnt(_GREEK_CLASS)} AS n_greek,
         {cnt('[0-9]')} AS n_digit,
         {cnt(_INVISIBLE_CLASS)} AS n_invisible
  FROM x345_poison
)
SELECT id, n_latin, n_cyrillic, n_greek, n_digit, n_invisible,
       CAST(n_latin > 0 AND (n_cyrillic + n_greek) > 0 AS INTEGER)
         AS mixed_script,
       ROUND(CASE WHEN n_latin + n_cyrillic + n_greek > 0
                  THEN CAST(n_cyrillic + n_greek AS DOUBLE)
                       / (n_latin + n_cyrillic + n_greek)
             END * 1000000.0) / 1000000.0 AS confusable_frac
FROM x345_counts
ORDER BY id
"""


EXT17_QUERIES.update({"x345_script_mixing": q_x345_script_mixing})
EXT17_ORACLES.update({"x345_script_mixing": _sql_x345()})


# ----------------------------- x346: code-vs-prose routing score


def q_x346_code_prose(spark, sf_dir):
    """Code-vs-prose detection (operators/text.py:code_prose_score)
    with deterministic code synthesis: every fourth document is
    wrapped into a function body (keywords, indentation, snake_case,
    symbols) by identical concat algebra in both engines — the audit
    must route exactly those documents to the code mixer."""
    from .operators.text import code_prose_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.coalesce(F.col("text"), F.lit(""))
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("def fn():\n    x_val = ("),
                F.translate(t, " ", "_"),
                F.lit(");\n    return x_val;"),
            ),
        )
        .otherwise(t)
        .alias("text"),
    )
    return code_prose_score(staged, id_col="doc_id", text_col="text")


def _sql_x346() -> str:
    from .operators.text import (
        _CAMEL,
        _CODE_KEYWORDS,
        _CODE_SYMBOLS,
        _INDENT_LINES,
        _SNAKE,
    )

    # DuckDB standard strings do NOT process backslash escapes, so the
    # single-backslash regex source strings embed verbatim; only
    # quotes need doubling
    esc = lambda p: p.replace("'", "''")  # noqa: E731
    cnt = lambda pat: (  # noqa: E731
        f"CAST(len(regexp_extract_all(text, '{esc(pat)}')) AS BIGINT)"
    )
    return f"""
WITH x346_staged AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         CASE WHEN doc_id % 4 = 0
              THEN 'def fn():' || chr(10) || '    x_val = ('
                   || translate(COALESCE(text, ''), ' ', '_')
                   || ');' || chr(10) || '    return x_val;'
              ELSE COALESCE(text, '') END AS text
  FROM documents
), x346_counts AS (
  SELECT id,
         CAST(length(text) AS BIGINT) AS n_chars,
         {cnt(_CODE_SYMBOLS)} AS sym_count,
         {cnt(_CODE_KEYWORDS)} AS kw_count,
         {cnt(_INDENT_LINES)} AS indent_count,
         {cnt(_SNAKE)} AS snake_count,
         {cnt(_CAMEL)} AS camel_count
  FROM x346_staged
)
SELECT id, n_chars, sym_count, kw_count, indent_count, snake_count,
       camel_count,
       ROUND((CAST(4.0 AS DOUBLE) * sym_count
              / CAST(greatest(n_chars, 1) AS DOUBLE)
              + CAST(0.05 AS DOUBLE) * kw_count
              + CAST(0.03 AS DOUBLE) * indent_count
              + CAST(0.02 AS DOUBLE) * snake_count
              + CAST(0.02 AS DOUBLE) * camel_count) * 1000000.0)
         / 1000000.0 AS code_score,
       CAST((CAST(4.0 AS DOUBLE) * sym_count
             / CAST(greatest(n_chars, 1) AS DOUBLE)
             + CAST(0.05 AS DOUBLE) * kw_count
             + CAST(0.03 AS DOUBLE) * indent_count
             + CAST(0.02 AS DOUBLE) * snake_count
             + CAST(0.02 AS DOUBLE) * camel_count)
            > CAST(0.5 AS DOUBLE) AS INTEGER) AS is_code
FROM x346_counts
ORDER BY id
"""


EXT17_QUERIES.update({"x346_code_prose": q_x346_code_prose})
EXT17_ORACLES.update({"x346_code_prose": _sql_x346()})


# --------------------------- x347: fill-in-the-middle span planning


def q_x347_fim_spans(spark, sf_dir):
    """Deterministic FIM span planning (operators/text.py:
    fim_span_plan): md5-derived prefix/middle/suffix cuts with
    alternating PSM/SPM format and per-segment md5 digests — the
    replayable fill-in-the-middle transform, certified byte-exact by
    the digests."""
    from .operators.text import fim_span_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return fim_span_plan(docs, id_col="doc_id", text_col="text")


def _sql_x347() -> str:
    u = lambda tag: (  # noqa: E731
        "(CAST(CAST(('0x' || substr(md5('fim-" + tag + ":' ||"
        " CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)"
        " / CAST(4294967296.0 AS DOUBLE))"
    )
    return f"""
WITH x347_base AS (
  SELECT CAST(doc_id AS BIGINT) AS id, COALESCE(text, '') AS t
  FROM documents
), x347_cuts AS (
  SELECT id, t, CAST(length(t) AS BIGINT) AS n,
         CAST(1 + floor({u('a')}
              * CAST(length(t) - 2 AS DOUBLE)) AS BIGINT) AS p_end
  FROM x347_base
), x347_cuts2 AS (
  SELECT id, t, n, p_end,
         CAST(p_end + 1 + floor({u('b')}
              * CAST(n - p_end - 1 AS DOUBLE)) AS BIGINT) AS m_end
  FROM x347_cuts
)
SELECT id, n AS n_chars,
       CASE WHEN n >= 8 THEN
         CASE WHEN id % 2 = 0 THEN 'psm' ELSE 'spm' END END
         AS fim_format,
       CASE WHEN n >= 8 THEN p_end END AS prefix_len,
       CASE WHEN n >= 8 THEN m_end - p_end END AS middle_len,
       CASE WHEN n >= 8 THEN n - m_end END AS suffix_len,
       CASE WHEN n >= 8
            THEN substr(md5(substr(t, 1, CAST(p_end AS INTEGER))),
                        1, 8) END AS prefix_md5,
       CASE WHEN n >= 8
            THEN substr(md5(substr(t, CAST(p_end + 1 AS INTEGER),
                                   CAST(m_end - p_end AS INTEGER))),
                        1, 8) END AS middle_md5,
       CASE WHEN n >= 8
            THEN substr(md5(substr(t, CAST(m_end + 1 AS INTEGER),
                                   CAST(n - m_end AS INTEGER))),
                        1, 8) END AS suffix_md5
FROM x347_cuts2
ORDER BY id
"""


EXT17_QUERIES.update({"x347_fim_spans": q_x347_fim_spans})
EXT17_ORACLES.update({"x347_fim_spans": _sql_x347()})


# --------------------- x348: CUBE grouping-sets revenue summary


def q_x348_cube_revenue(spark, sf_dir):
    """CUBE grouping-sets summary (operators/olap.py:cube_summary):
    order revenue and counts over every subset of
    {priority, segment} — 4 grouping sets in ONE pass via Spark's
    native cube (partial aggregation per set, no union of
    re-scans); ``grouping_id`` disambiguates subtotal levels with
    the same bit convention both engines share."""
    from .operators.olap import cube_summary

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").alias("price"),
    )
    out = cube_summary(
        base,
        ["priority", "segment"],
        {
            "n_orders": F.count(F.lit(1)).cast("long"),
            "revenue": F.round(
                F.sum(F.col("price").cast("decimal(38,12)")).cast(
                    "double"
                ),
                2,
            ),
        },
    )
    return out.select(
        "priority", "segment", "grouping_id", "n_orders", "revenue"
    ).orderBy("grouping_id", "priority", "segment")


def _sql_x348() -> str:
    return """
SELECT o_orderpriority AS priority, c_mktsegment AS segment,
       CAST(GROUPING(o_orderpriority, c_mktsegment) AS BIGINT)
         AS grouping_id,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12)))
                  AS DOUBLE), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE(o_orderpriority, c_mktsegment)
ORDER BY grouping_id, priority, segment
"""


EXT17_QUERIES.update({"x348_cube_revenue": q_x348_cube_revenue})
EXT17_ORACLES.update({"x348_cube_revenue": _sql_x348()})


# ----------------------- x349: native unpivot (wide→long round trip)

_X349_PRIOS = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


def q_x349_unpivot(spark, sf_dir):
    """Native wide→long unpivot (sources/reshape.py:wide_to_long —
    Spark's JVM-side ``melt``, no UDF, no explode hand-rolling):
    pivot per-nation order counts into five explicit priority
    columns, then melt them back to (nation, priority, n).  The
    round trip certifies the reshape pair is lossless; the oracle
    reproduces the long form directly."""
    from .sources.reshape import wide_to_long

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("o_orderpriority").alias("prio"),
    )
    wide = (
        base.groupBy("nation")
        .pivot("prio", _X349_PRIOS)
        .agg(F.count(F.lit(1)))
    )
    long = wide_to_long(
        wide,
        _X349_PRIOS,
        date_col="nation",
        entity_col="priority",
        value_col="n",
    )
    return long.select(
        "nation",
        "priority",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    ).orderBy("nation", "priority")


def _sql_x349() -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT nation, '{p}' AS priority,"
        f" CAST(COALESCE(\"{p}\", 0) AS BIGINT) AS n FROM x349_wide"
        for p in _X349_PRIOS
    )
    cols = ",\n         ".join(
        f"COUNT(CASE WHEN o_orderpriority = '{p}' THEN 1 END)"
        f' AS "{p}"'
        for p in _X349_PRIOS
    )
    return f"""
WITH x349_wide AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         {cols}
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
)
{arms}
ORDER BY nation, priority
"""


EXT17_QUERIES.update({"x349_unpivot": q_x349_unpivot})
EXT17_ORACLES.update({"x349_unpivot": _sql_x349()})


# ------------------------------ x350: k-truss edge support peel


def q_x350_ktruss(spark, sf_dir):
    """k-truss peeling pass (operators/graph.py:ktruss_edges, k=4)
    on the supplier co-occurrence graph (same sparsified graph as
    x148's triangle census): per-edge triangle support and the
    keep/drop verdict — edge-centric cohesion strictly stronger than
    k-core.  Top 50 edges by (support desc, u, v) keeps the output
    stable and bounded."""
    from .operators.graph import ktruss_edges

    ls = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = ls.alias("a"), ls.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"),
        F.col("b.l_suppkey").alias("dst"),
    )
    out = ktruss_edges(pairs, k=4, min_weight=2)
    return (
        out.orderBy(F.desc("support"), "u", "v")
        .limit(50)
        .select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            "support",
            "keep",
        )
    )


def _sql_x350() -> str:
    return """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
),
pairs AS (
  SELECT a.s AS u, b.s AS v FROM ls a JOIN ls b
  ON a.o = b.o AND a.s < b.s
),
canon AS (
  SELECT u, v FROM (
    SELECT u, v, count(*) AS w FROM pairs GROUP BY u, v
  ) WHERE w >= 2
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT u AS node FROM canon UNION ALL SELECT v AS node FROM canon
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b,
         CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS db
  FROM (
    SELECT c.u, c.v, d1.degree AS du, d2.degree AS dv
    FROM canon c
    JOIN deg d1 ON d1.node = c.u
    JOIN deg d2 ON d2.node = c.v
  )
),
wedges AS (
  SELECT e1.a AS p, e1.b AS x, e2.b AS y
  FROM oriented e1 JOIN oriented e2 ON e1.a = e2.a
  WHERE e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b)
),
tri AS (
  SELECT w.p, w.x, w.y
  FROM wedges w JOIN oriented c ON c.a = w.x AND c.b = w.y
),
tri_edges AS (
  SELECT least(p, x) AS u, greatest(p, x) AS v FROM tri
  UNION ALL
  SELECT least(p, y) AS u, greatest(p, y) AS v FROM tri
  UNION ALL
  SELECT least(x, y) AS u, greatest(x, y) AS v FROM tri
),
support AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support
  FROM tri_edges GROUP BY u, v
)
SELECT CAST(c.u AS BIGINT) AS u, CAST(c.v AS BIGINT) AS v,
       COALESCE(s.support, 0) AS support,
       CAST(COALESCE(s.support, 0) >= 2 AS INTEGER) AS keep
FROM canon c LEFT JOIN support s ON c.u = s.u AND c.v = s.v
ORDER BY support DESC, u, v
LIMIT 50
"""


EXT17_QUERIES.update({"x350_ktruss": q_x350_ktruss})
EXT17_ORACLES.update({"x350_ktruss": _sql_x350()})


# --------------------- x351: pairwise one-lag Granger causality

_X351_DAILY = f"""
  SELECT event_type AS e,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY} AS t,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
"""


def _daily_panel(spark, sf_dir):
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    return (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type"),
            F.expr(f"ts_us div {_US_PER_DAY}").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )


def q_x351_granger(spark, sf_dir):
    """Pairwise one-lag Granger causality (operators/temporal.py:
    granger_1lag) between event types' daily value series — does one
    stream's yesterday improve another's today beyond its own
    autoregression?  Closed-form 3×3 adjugate on decimal-exact
    sufficient statistics; NULL-propagating guards on singular
    designs."""
    from .operators.temporal import granger_1lag

    return granger_1lag(
        _daily_panel(spark, sf_dir),
        entity_col="event_type", t_col="day", value_col="v",
        f_crit=3.9,
    )


def _sql_x351() -> str:
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731

    def det3(a, b, c, d, e, f, g, h, i):
        return (
            f"({a} * ({e} * {i} - {f} * {h})"
            f" - {b} * ({d} * {i} - {f} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g}))"
        )

    det_u = det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    det_us = f"(CASE WHEN abs({det_u}) > 0 THEN {det_u} END)"
    b0 = det3("sy", "s1", "s2", "sy1", "s11", "s12", "sy2", "s12", "s22")
    b1 = det3("n", "sy", "s2", "s1", "sy1", "s12", "s2", "sy2", "s22")
    b2 = det3("n", "s1", "sy", "s1", "s11", "sy1", "s2", "s12", "sy2")
    ssr_u = (
        f"(syy - (({b0} / {det_us}) * sy + ({b1} / {det_us}) * sy1"
        f" + ({b2} / {det_us}) * sy2))"
    )
    det_r = "(n * s11 - s1 * s1)"
    det_rs = f"(CASE WHEN abs({det_r}) > 0 THEN {det_r} END)"
    ssr_r = (
        f"(syy - (((sy * s11 - s1 * sy1) / {det_rs}) * sy"
        f" + ((n * sy1 - s1 * sy) / {det_rs}) * sy1))"
    )
    fstat = (
        f"(CASE WHEN n >= 8 AND {ssr_u} > 0 THEN"
        f" ({ssr_r} - {ssr_u}) / ({ssr_u} / (n - 3.0)) END)"
    )
    return f"""
WITH x351_daily AS ({_X351_DAILY}),
x351_rows AS (
  SELECT a.e AS ey, bl.e AS ex, a.v AS y, al.v AS ylag, bl.v AS xlag
  FROM x351_daily a
  JOIN x351_daily al ON al.e = a.e AND al.t = a.t - 1
  JOIN x351_daily bl ON bl.t = a.t - 1 AND bl.e <> a.e
), x351_agg AS (
  SELECT ey, ex, CAST(COUNT(*) AS DOUBLE) AS n,
         {sd('ylag')} AS s1, {sd('xlag')} AS s2,
         {sd('ylag * ylag')} AS s11, {sd('xlag * xlag')} AS s22,
         {sd('ylag * xlag')} AS s12,
         {sd('y')} AS sy, {sd('ylag * y')} AS sy1,
         {sd('xlag * y')} AS sy2, {sd('y * y')} AS syy
  FROM x351_rows GROUP BY ey, ex
)
SELECT ey AS entity_y, ex AS entity_x, CAST(n AS BIGINT) AS n,
       ROUND({fstat} * 1000000.0) / 1000000.0 AS f_stat,
       CASE WHEN {fstat} IS NOT NULL
            THEN CAST({fstat} > 3.9 AS INTEGER) END AS causes
FROM x351_agg
ORDER BY entity_y, entity_x
"""


EXT17_QUERIES.update({"x351_granger": q_x351_granger})
EXT17_ORACLES.update({"x351_granger": _sql_x351()})


# ------------------ x352: Engle–Granger cointegration screen


def q_x352_coint(spark, sf_dir):
    """Engle–Granger cointegration screen (operators/temporal.py:
    engle_granger_step) over event-type daily value pairs: closed-form
    cointegrating OLS, residuals pinned at 6 dp, then the no-constant
    Dickey–Fuller t on the residuals — mean-reverting spread =
    cointegrated pair."""
    from .operators.temporal import engle_granger_step

    return engle_granger_step(
        _daily_panel(spark, sf_dir),
        entity_col="event_type", t_col="day", value_col="v",
    )


def _sql_x352() -> str:
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x352_daily AS ({_X351_DAILY}),
x352_rows AS (
  SELECT a.e AS ey, b.e AS ex, a.t, a.v AS y, b.v AS x
  FROM x352_daily a JOIN x352_daily b ON a.t = b.t AND b.e <> a.e
), x352_fit AS (
  SELECT ey, ex, CAST(COUNT(*) AS DOUBLE) AS n,
         {sd('x')} AS sx, {sd('y')} AS sy,
         {sd('x * x')} AS sxx, {sd('x * y')} AS sxy
  FROM x352_rows GROUP BY ey, ex
), x352_coef AS (
  SELECT ey, ex, n,
         (n * sxy - sx * sy)
           / (CASE WHEN abs(n * sxx - sx * sx) > 0
                   THEN n * sxx - sx * sx END) AS beta,
         (sy * sxx - sx * sxy)
           / (CASE WHEN abs(n * sxx - sx * sx) > 0
                   THEN n * sxx - sx * sx END) AS alpha
  FROM x352_fit
), x352_resid AS (
  SELECT r.ey, r.ex, r.t, c.n, c.beta,
         ROUND((r.y - c.alpha - c.beta * r.x) * 1000000.0)
           / 1000000.0 AS res
  FROM x352_rows r JOIN x352_coef c ON r.ey = c.ey AND r.ex = c.ex
  WHERE c.beta IS NOT NULL
), x352_lag AS (
  SELECT * FROM (
    SELECT ey, ex, n, beta, res,
           LAG(res) OVER (PARTITION BY ey, ex ORDER BY t) AS elag
    FROM x352_resid
  ) WHERE elag IS NOT NULL
), x352_st2 AS (
  SELECT ey, ex, n, beta, CAST(COUNT(*) AS DOUBLE) AS nd,
         {sd('elag * (res - elag)')} AS sed,
         {sd('elag * elag')} AS see,
         {sd('(res - elag) * (res - elag)')} AS sdd
  FROM x352_lag GROUP BY ey, ex, n, beta
), x352_out AS (
  SELECT ey, ex, n, beta, nd, sed, sdd,
         CASE WHEN see > 0 AND nd >= 8 THEN see END AS see_safe
  FROM x352_st2
), x352_stats AS (
  SELECT ey, ex, n, beta,
         sed / see_safe AS gamma,
         (sed / see_safe)
           / sqrt((CASE WHEN (sdd - sed * sed / see_safe)
                             / (CASE WHEN nd > 1 THEN nd - 1.0 END) > 0
                        THEN (sdd - sed * sed / see_safe)
                             / (CASE WHEN nd > 1 THEN nd - 1.0 END)
                   END) / see_safe) AS df_t
  FROM x352_out
)
SELECT ey AS entity_y, ex AS entity_x, CAST(n AS BIGINT) AS n,
       ROUND(beta * 1000000.0) / 1000000.0 AS beta,
       ROUND(gamma * 1000000.0) / 1000000.0 AS gamma,
       ROUND(df_t * 1000000.0) / 1000000.0 AS df_t,
       CASE WHEN df_t IS NOT NULL
            THEN CAST(df_t < -3.34 AS INTEGER) END AS cointegrated
FROM x352_stats
ORDER BY entity_y, entity_x
"""


EXT17_QUERIES.update({"x352_coint": q_x352_coint})
EXT17_ORACLES.update({"x352_coint": _sql_x352()})


# ---------------------- x353: Breusch–Pagan heteroskedasticity


def q_x353_breusch_pagan(spark, sf_dir):
    """Breusch–Pagan LM heteroskedasticity test (operators/
    temporal.py:breusch_pagan) per event type's daily value trend —
    is the variance itself drifting over the month?  Residuals and
    their squares pinned at 6 dp so stage-2 decimal casts are
    exact."""
    from .operators.temporal import breusch_pagan

    return breusch_pagan(
        _daily_panel(spark, sf_dir),
        entity_col="event_type", t_col="day", value_col="v",
    )


def _sql_x353() -> str:
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x353_daily AS ({_X351_DAILY}),
x353_fit AS (
  SELECT e, CAST(COUNT(*) AS DOUBLE) AS n,
         {sd('CAST(t AS DOUBLE)')} AS st, {sd('v')} AS sy,
         {sd('CAST(t AS DOUBLE) * CAST(t AS DOUBLE)')} AS stt,
         {sd('CAST(t AS DOUBLE) * v')} AS sty
  FROM x353_daily GROUP BY e
), x353_coef AS (
  SELECT e, n,
         (n * sty - st * sy)
           / (CASE WHEN abs(n * stt - st * st) > 0
                   THEN n * stt - st * st END) AS b,
         (sy * stt - st * sty)
           / (CASE WHEN abs(n * stt - st * st) > 0
                   THEN n * stt - st * st END) AS a
  FROM x353_fit
), x353_resid AS (
  SELECT d.e, c.n, d.t,
         ROUND((ROUND((d.v - c.a - c.b * CAST(d.t AS DOUBLE))
                      * 1000000.0) / 1000000.0)
               * (ROUND((d.v - c.a - c.b * CAST(d.t AS DOUBLE))
                        * 1000000.0) / 1000000.0) * 1000000.0)
           / 1000000.0 AS u
  FROM x353_daily d JOIN x353_coef c ON d.e = c.e
  WHERE c.b IS NOT NULL
), x353_aux AS (
  SELECT e, n,
         {sd('CAST(t AS DOUBLE)')} AS st, {sd('u')} AS su,
         {sd('CAST(t AS DOUBLE) * CAST(t AS DOUBLE)')} AS stt,
         {sd('CAST(t AS DOUBLE) * u')} AS stu,
         {sd('u * u')} AS suu
  FROM x353_resid GROUP BY e, n
)
SELECT e AS entity, CAST(n AS BIGINT) AS n,
       CASE WHEN (stt - st * st / n) > 0
             AND (suu - su * su / n) > 0
            THEN ROUND(n * (((stu - st * su / n) * (stu - st * su / n)
                             / (stt - st * st / n))
                            / (suu - su * su / n)) * 1000000.0)
                 / 1000000.0
       END AS lm_stat,
       CASE WHEN (stt - st * st / n) > 0
             AND (suu - su * su / n) > 0
            THEN CAST(n * (((stu - st * su / n) * (stu - st * su / n)
                            / (stt - st * st / n))
                           / (suu - su * su / n)) > 3.841459
                      AS INTEGER)
       END AS heteroskedastic
FROM x353_aux
ORDER BY entity
"""


EXT17_QUERIES.update({"x353_breusch_pagan": q_x353_breusch_pagan})
EXT17_ORACLES.update({"x353_breusch_pagan": _sql_x353()})


# ----------------------------- x354: Jarque–Bera normality test


def q_x354_jarque_bera(spark, sf_dir):
    """Jarque–Bera normality test (operators/quality.py:jarque_bera)
    of customer account balances per nation — skewness and kurtosis
    from integer-rounded central deviations (exact decimal folds in
    both engines), JB ~ χ²(2).  TPC-H balances are uniform, so every
    nation should reject normality via the platykurtic branch."""
    from .operators.quality import jarque_bera

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return jarque_bera(
        c.select(
            F.col("c_nationkey").cast("long").alias("nation"),
            F.col("c_acctbal").alias("bal"),
        ),
        group_col="nation",
        value_col="bal",
    )


def _sql_x354() -> str:
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x354_base AS (
  SELECT CAST(CAST(c_nationkey AS BIGINT) AS VARCHAR) AS g,
         CAST(c_acctbal AS DOUBLE) AS v
  FROM customer WHERE c_acctbal IS NOT NULL
), x354_means AS (
  SELECT g, CAST(COUNT(*) AS DOUBLE) AS n,
         {sd('v')} / COUNT(*) AS mean
  FROM x354_base GROUP BY g
), x354_dev AS (
  SELECT b.g, m.n, ROUND(b.v - m.mean) AS d
  FROM x354_base b JOIN x354_means m ON b.g = m.g
), x354_mom AS (
  SELECT g, n,
         {sd('d * d')} AS s2, {sd('d * d * d')} AS s3,
         {sd('d * d * d * d')} AS s4
  FROM x354_dev GROUP BY g, n
), x354_stats AS (
  SELECT g, n, s2,
         (s3 / n) / ((s2 / n) * sqrt(s2 / n)) AS skew,
         (s4 / n) / ((s2 / n) * (s2 / n)) AS kurt
  FROM x354_mom WHERE s2 > 0 AND n >= 8
)
SELECT m.g AS "group", CAST(m.n AS BIGINT) AS n,
       ROUND(s.skew * 1000000.0) / 1000000.0 AS skewness,
       ROUND(s.kurt * 1000000.0) / 1000000.0 AS kurtosis,
       ROUND((m.n / 6.0 * (s.skew * s.skew
              + (s.kurt - 3.0) * (s.kurt - 3.0) / 4.0)) * 1000000.0)
         / 1000000.0 AS jb_stat,
       CASE WHEN s.skew IS NOT NULL
            THEN CAST((m.n / 6.0 * (s.skew * s.skew
                       + (s.kurt - 3.0) * (s.kurt - 3.0) / 4.0))
                      > 5.991465 AS INTEGER) END AS non_normal
FROM x354_mom m LEFT JOIN x354_stats s ON m.g = s.g
ORDER BY "group"
"""


EXT17_QUERIES.update({"x354_jarque_bera": q_x354_jarque_bera})
EXT17_ORACLES.update({"x354_jarque_bera": _sql_x354()})


# ------------------------- x355: Kalman local-level filter


def q_x355_kalman(spark, sf_dir):
    """Local-level Kalman filter (operators/temporal.py:kalman_level,
    q=4, r=16, p0=100) over each event type's daily value series —
    the adaptive-gain level tracker; the recursion runs in one
    Arrow-batched mapInPandas stage and the oracle replays it as a
    recursive CTE in identical pinned float order (the x336
    idiom with a scalar recursion)."""
    from .operators.temporal import kalman_level

    return kalman_level(
        _daily_panel(spark, sf_dir),
        entity_col="event_type", t_col="day", value_col="v",
        q=4.0, r=16.0, p0=100.0,
    )


def _sql_x355() -> str:
    q, r, p0 = "CAST(4.0 AS DOUBLE)", "CAST(16.0 AS DOUBLE)", \
        "CAST(100.0 AS DOUBLE)"
    return f"""
WITH RECURSIVE x355_daily AS ({_X351_DAILY}),
x355_arr AS (
  SELECT e, list(t ORDER BY t) AS ts, list(v ORDER BY t) AS ys,
         CAST(count(*) AS INTEGER) AS n
  FROM x355_daily GROUP BY e
), x355_rec AS (
  SELECT e, ts, ys, n, CAST(1 AS INTEGER) AS i,
         ys[1] AS x, {p0} AS p,
         [ys[1]] AS levels, [CAST(0.0 AS DOUBLE)] AS gains
  FROM x355_arr
  UNION ALL
  SELECT e, ts, ys, n, CAST(i + 1 AS INTEGER) AS i,
         x + k * (ys[CAST(i + 1 AS INTEGER)] - x) AS x,
         (CAST(1.0 AS DOUBLE) - k) * pp AS p,
         list_append(levels,
           x + k * (ys[CAST(i + 1 AS INTEGER)] - x)) AS levels,
         list_append(gains, k) AS gains
  FROM (
    SELECT e, ts, ys, n, i, x, levels, gains, pp,
           pp / (pp + {r}) AS k
    FROM (
      SELECT e, ts, ys, n, i, x, levels, gains, p + {q} AS pp
      FROM x355_rec WHERE i < n
    )
  )
), x355_rows AS (
  SELECT e AS entity, UNNEST(ts) AS t, UNNEST(ys) AS value,
         UNNEST(levels) AS level, UNNEST(gains) AS gain
  FROM x355_rec WHERE i = n
)
SELECT entity, CAST(t AS BIGINT) AS t,
       ROUND(value * 1000000.0) / 1000000.0 AS value,
       ROUND(level * 1000000.0) / 1000000.0 AS level,
       ROUND(gain * 1000000.0) / 1000000.0 AS gain
FROM x355_rows
ORDER BY entity, t
"""


EXT17_QUERIES.update({"x355_kalman": q_x355_kalman})
EXT17_ORACLES.update({"x355_kalman": _sql_x355()})


# ---------------- x356: smooth annual→quarterly disaggregation


def q_x356_smooth_disagg(spark, sf_dir):
    """Smooth temporal disaggregation (operators/temporal.py:
    smooth_disagg): annual order revenue per market segment split
    into minimal-curvature quarters with the Boot–Feibes–Lisman
    literal kernel — the no-indicator CONVERT-down companion the
    reference's spline path doesn't cover.  Interior years only;
    quarters re-sum to the annual value to float eps."""
    from .operators.temporal import smooth_disagg

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    panel = (
        o.where(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
            .cast("double")
            .alias("a")
        )
    )
    return smooth_disagg(
        panel, entity_col="segment", year_col="yr", value_col="a"
    )


def _sql_x356() -> str:
    from .operators.temporal import smooth_disagg_weights

    W = smooth_disagg_weights()
    # weights MUST be spelled in exponent notation so DuckDB types the
    # literal DOUBLE: a plain 18-digit literal parses as DECIMAL(19,18)
    # and BOTH the decimal×double path and CAST(decimal AS DOUBLE)
    # (int128/10^18 in float arithmetic) land up to 2 ulps away from
    # the IEEE double the Spark side (F.lit) uses — enough to flip the
    # 6-dp round on boundary rows (r10 inherited-state fix; verified
    # bitwise: {w:.17e} * DOUBLE == Python/Spark l2r on the failing row)
    arms = " ".join(
        f"WHEN {qi + 1} THEN {W[qi][0]:.17e} * ap"
        f" + {W[qi][1]:.17e} * a"
        f" + {W[qi][2]:.17e} * an"
        for qi in range(4)
    )
    return f"""
WITH x356_panel AS (
  SELECT c_mktsegment AS e, year(o_orderdate) AS yr,
         -- VARCHAR-staged cast: DuckDB's direct DECIMAL(38,12)->DOUBLE
         -- double-rounds (int128->double, then /1e12) and can land 1 ulp
         -- off Spark's correctly-rounded decimal cast; the string parse
         -- is correctly rounded (r10 inherited-state fix)
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12))) AS VARCHAR)
              AS DOUBLE) AS a
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), x356_win AS (
  SELECT e, yr, a,
         LAG(a) OVER w AS ap, LEAD(a) OVER w AS an,
         LAG(yr) OVER w AS yp, LEAD(yr) OVER w AS yn
  FROM x356_panel WINDOW w AS (PARTITION BY e ORDER BY yr)
), x356_mid AS (
  SELECT e, yr, a, ap, an FROM x356_win
  WHERE yp = yr - 1 AND yn = yr + 1
)
SELECT e AS entity, CAST(yr AS BIGINT) AS year,
       CAST(qi AS BIGINT) AS quarter,
       ROUND(a * 1000000.0) / 1000000.0 AS annual,
       ROUND((CASE qi {arms} END) * 1000000.0) / 1000000.0 AS q_value
FROM x356_mid CROSS JOIN (VALUES (1), (2), (3), (4)) AS s(qi)
ORDER BY entity, year, quarter
"""


EXT17_QUERIES.update({"x356_smooth_disagg": q_x356_smooth_disagg})
EXT17_ORACLES.update({"x356_smooth_disagg": _sql_x356()})


# ------------------------------- x357: Theta-method forecast


def q_x357_theta(spark, sf_dir):
    """Theta-method forecast (operators/temporal.py:theta_forecast,
    alpha = 1/2 exactly): 4-step-ahead daily forecasts per event
    type — trend extrapolation averaged with a dyadic-weight SES of
    the theta=2 line, every smoothing weight an exact power of two."""
    from .operators.temporal import theta_forecast

    return theta_forecast(
        _daily_panel(spark, sf_dir),
        entity_col="event_type", t_col="day", value_col="v",
        horizons=4,
    )


def _sql_x357() -> str:
    # scale-4 sums: exact for the 2-dp panel AND below the 2^53
    # decimal->double conversion cliff (see theta_forecast docstring)
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,4))) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x357_daily AS ({_X351_DAILY}),
x357_rn AS (
  SELECT e, t, v,
         ROW_NUMBER() OVER (PARTITION BY e ORDER BY t) AS rn
  FROM x357_daily
), x357_fit AS (
  SELECT e, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(MAX(t) AS DOUBLE) AS tmax,
         {sd('CAST(t AS DOUBLE)')} AS st, {sd('v')} AS sy,
         {sd('CAST(t AS DOUBLE) * CAST(t AS DOUBLE)')} AS stt,
         {sd('CAST(t AS DOUBLE) * v')} AS sty
  FROM x357_rn GROUP BY e
), x357_coef AS (
  SELECT e, n, tmax,
         (n * sty - st * sy)
           / (CASE WHEN abs(n * stt - st * st) > 0
                   THEN n * stt - st * st END) AS b,
         (sy * stt - st * sty)
           / (CASE WHEN abs(n * stt - st * st) > 0
                   THEN n * stt - st * st END) AS a
  FROM x357_fit
), x357_theta AS (
  SELECT r.e, c.n, r.rn, c.tmax, c.a, c.b,
         ROUND((CAST(2.0 AS DOUBLE) * r.v
                - (c.a + c.b * CAST(r.t AS DOUBLE))) * 1000000.0)
           / 1000000.0 AS yth
  FROM x357_rn r JOIN x357_coef c ON r.e = c.e
  WHERE c.b IS NOT NULL
), x357_acc AS (
  SELECT e, tmax, a, b, rn, n,
         SUM(pow(CAST(0.5 AS DOUBLE), n - rn + 1) * yth
             + CASE WHEN rn = 1
                    THEN pow(CAST(0.5 AS DOUBLE), n) * yth
                    ELSE CAST(0.0 AS DOUBLE) END)
           OVER (PARTITION BY e ORDER BY rn
                 ROWS UNBOUNDED PRECEDING) AS lacc
  FROM x357_theta
), x357_lvl AS (
  SELECT e, tmax, a, b, lacc AS l FROM x357_acc WHERE rn = n
)
SELECT e AS entity, CAST(h AS BIGINT) AS h,
       ROUND((CAST(0.5 AS DOUBLE) * (a + b * (tmax + h))
              + CAST(0.5 AS DOUBLE) * l) * 1000000.0)
         / 1000000.0 AS forecast
FROM x357_lvl CROSS JOIN (VALUES (1), (2), (3), (4)) AS s(h)
ORDER BY entity, h
"""


EXT17_QUERIES.update({"x357_theta": q_x357_theta})
EXT17_ORACLES.update({"x357_theta": _sql_x357()})


# ---------------------- x358: chat/instruction format detection


def q_x358_chat_detect(spark, sf_dir):
    """Chat-format routing audit (operators/text.py:
    chat_template_detect) with deterministic synthesis: documents are
    wrapped into ChatML / [INST] / role-line / JSON-role shapes by
    doc_id stratum (identical concat algebra in both engines) and the
    audit must recover exactly which format each document carries."""
    from .operators.text import chat_template_detect

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.coalesce(F.col("text"), F.lit(""))
    m = F.col("doc_id") % 5
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            m == 1,
            F.concat(
                F.lit("<|im_start|>user\n"), t, F.lit("<|im_end|>")
            ),
        )
        .when(m == 2, F.concat(F.lit("[INST] "), t, F.lit(" [/INST]")))
        .when(
            m == 3,
            F.concat(F.lit("system: be brief\nuser: "), t),
        )
        .when(
            m == 4,
            F.concat(
                F.lit('{"role": "user", "content": "'), t, F.lit('"}')
            ),
        )
        .otherwise(t)
        .alias("text"),
    )
    return chat_template_detect(staged, id_col="doc_id", text_col="text")


def _sql_x358() -> str:
    from .operators.text import (
        _CHATML_MARK,
        _INST_MARK,
        _JSON_ROLE,
        _ROLE_LINE,
    )

    esc = lambda p: p.replace("'", "''")  # noqa: E731
    cnt = lambda pat: (  # noqa: E731
        f"CAST(len(regexp_extract_all(text, '{esc(pat)}')) AS BIGINT)"
    )
    return f"""
WITH x358_staged AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         CASE doc_id % 5
           WHEN 1 THEN '<|im_start|>user' || chr(10)
                       || COALESCE(text, '') || '<|im_end|>'
           WHEN 2 THEN '[INST] ' || COALESCE(text, '') || ' [/INST]'
           WHEN 3 THEN 'system: be brief' || chr(10) || 'user: '
                       || COALESCE(text, '')
           WHEN 4 THEN '{{"role": "user", "content": "'
                       || COALESCE(text, '') || '"}}'
           ELSE COALESCE(text, '')
         END AS text
  FROM documents
), x358_counts AS (
  SELECT id,
         {cnt(_CHATML_MARK)} AS chatml_count,
         {cnt(_INST_MARK)} AS inst_count,
         {cnt(_ROLE_LINE)} AS role_line_count,
         {cnt(_JSON_ROLE)} AS json_role_count
  FROM x358_staged
)
SELECT id, chatml_count, inst_count, role_line_count, json_role_count,
       CAST(chatml_count > 0 OR inst_count > 0 OR role_line_count > 0
            OR json_role_count > 0 AS INTEGER) AS is_chat,
       CASE WHEN chatml_count > 0 OR inst_count > 0
              OR role_line_count > 0 OR json_role_count > 0
            THEN CASE greatest(chatml_count, inst_count,
                               role_line_count, json_role_count)
                   WHEN chatml_count THEN 'chatml'
                   WHEN inst_count THEN 'inst'
                   WHEN role_line_count THEN 'role_lines'
                   ELSE 'json_roles'
                 END
       END AS chat_format
FROM x358_counts
ORDER BY id
"""


EXT17_QUERIES.update({"x358_chat_detect": q_x358_chat_detect})
EXT17_ORACLES.update({"x358_chat_detect": _sql_x358()})


# ---------------------- x359: word2vec negative-sampling plan


def q_x359_neg_sampling(spark, sf_dir):
    """Deterministic unigram^(3/4) negative-sampling plan
    (operators/text.py:negative_sampling_plan, 5 draws/doc):
    cnt^(3/4) via two IEEE sqrts, order-pinned cumulative lattice,
    integer md5 draws, bucketed interval join (range_join_points) —
    the replayable skip-gram negative sampler."""
    from .operators.text import negative_sampling_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return negative_sampling_plan(
        docs, id_col="doc_id", text_col="text", n_neg=5
    )


def _sql_x359() -> str:
    w = 65536
    return rf"""
WITH x359_toks AS (
  SELECT UNNEST(string_split(
           trim(regexp_replace(lower(COALESCE(text, '')), '\s+', ' ')),
           ' ')) AS w
  FROM documents
), x359_vocab AS (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM x359_toks WHERE w <> '' GROUP BY w
), x359_cum AS (
  SELECT w,
         SUM(sqrt(sqrt(cnt * cnt * cnt)))
           OVER (ORDER BY w ROWS UNBOUNDED PRECEDING) AS cum
  FROM x359_vocab
), x359_lattice AS (
  SELECT w,
         COALESCE(CAST(ROUND((LAG(cum) OVER (ORDER BY w)) * 1000000.0)
                       AS BIGINT), 0) AS lo,
         CAST(ROUND(cum * 1000000.0) AS BIGINT) AS hi
  FROM x359_cum
), x359_total AS (
  SELECT MAX(hi) AS total FROM x359_lattice
), x359_draws AS (
  SELECT CAST(d.doc_id AS BIGINT) AS id, k.k,
         CAST(('0x' || substr(md5('neg:' || CAST(d.doc_id AS VARCHAR)
               || ':' || CAST(k.k AS VARCHAR)), 1, 8)) AS BIGINT)
           % t.total AS target
  FROM documents d
  CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS k(k)
  CROSS JOIN x359_total t
), x359_iv AS (
  SELECT w, lo, hi,
         UNNEST(range(lo // {w}, ((hi - 1) // {w}) + 1)) AS b
  FROM x359_lattice WHERE hi > lo
)
SELECT d.id, CAST(d.k AS BIGINT) AS k, i.w AS neg_word
FROM x359_draws d
JOIN x359_iv i
  ON d.target // {w} = i.b
 AND i.lo <= d.target AND d.target < i.hi
ORDER BY id, k
"""


EXT17_QUERIES.update({"x359_neg_sampling": q_x359_neg_sampling})
EXT17_ORACLES.update({"x359_neg_sampling": _sql_x359()})


# ------------------------ x360: propensity-score matching (ATT)


def q_x360_psm_match(spark, sf_dir):
    """1-NN-with-replacement propensity matching (operators/
    behavior.py:psm_match): BUILDING-segment customers matched to
    non-BUILDING controls on account balance within a ±50 caliper;
    ATT on total order spend.  Bucketed candidate join (the
    lof_grid/geo cell pattern), deterministic tie-break, match rate
    reported."""
    from .operators.behavior import psm_match

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
        .cast("double")
        .alias("spend")
    )
    base = c.join(
        spend, c["c_custkey"] == spend["o_custkey"], "left"
    ).select(
        F.col("c_custkey").alias("cust"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
        F.coalesce(F.col("spend"), F.lit(0.0)).alias("spend"),
    )
    treated = base.where(F.col("seg") == "BUILDING")
    controls = base.where(F.col("seg") != "BUILDING")
    return psm_match(
        treated, controls,
        id_col="cust", score_col="bal", outcome_col="spend",
        caliper=50.0,
    )


def _sql_x360() -> str:
    return """
WITH x360_spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12)))
                         AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
), x360_base AS (
  SELECT CAST(c_custkey AS BIGINT) AS cust, c_mktsegment AS seg,
         CAST(c_acctbal AS DOUBLE) AS bal,
         COALESCE(s.spend, CAST(0.0 AS DOUBLE)) AS spend
  FROM customer c LEFT JOIN x360_spend s ON c.c_custkey = s.o_custkey
), x360_t AS (
  SELECT cust AS tid, bal AS ts, spend AS ty FROM x360_base
  WHERE seg = 'BUILDING' AND bal IS NOT NULL AND spend IS NOT NULL
), x360_c AS (
  SELECT cust AS cid, bal AS cs, spend AS cy,
         CAST(floor(cs / CAST(50.0 AS DOUBLE)) AS BIGINT) AS b
  FROM x360_base
  WHERE seg <> 'BUILDING' AND bal IS NOT NULL AND spend IS NOT NULL
), x360_probes AS (
  SELECT tid, ts, ty,
         CAST(floor(ts / CAST(50.0 AS DOUBLE)) AS BIGINT) + off AS b
  FROM x360_t CROSS JOIN (VALUES (-1), (0), (1)) AS o(off)
), x360_pairs AS (
  SELECT * FROM (
    SELECT p.tid, p.ts, p.ty, c.cid, c.cs, c.cy,
           ROW_NUMBER() OVER (PARTITION BY p.tid
                              ORDER BY abs(p.ts - c.cs), c.cid) AS rk
    FROM x360_probes p JOIN x360_c c ON p.b = c.b
    WHERE abs(p.ts - c.cs) <= CAST(50.0 AS DOUBLE)
  ) WHERE rk = 1
), x360_nt AS (SELECT COUNT(*) AS n_treated FROM x360_t)
SELECT CAST(nt.n_treated AS BIGINT) AS n_treated,
       CAST(COUNT(a.tid) AS BIGINT) AS n_matched,
       ROUND((COUNT(a.tid) / CAST(greatest(nt.n_treated, 1) AS DOUBLE))
             * 1000000.0) / 1000000.0 AS match_rate,
       ROUND(CASE WHEN COUNT(a.tid) > 0
                  THEN CAST(SUM(CAST(a.ty - a.cy AS DECIMAL(38,12)))
                            AS DOUBLE) / COUNT(a.tid) END
             * 1000000.0) / 1000000.0 AS att,
       ROUND(CASE WHEN COUNT(a.tid) > 0
                  THEN CAST(SUM(CAST(abs(a.ts - a.cs)
                                     AS DECIMAL(38,12))) AS DOUBLE)
                       / COUNT(a.tid) END
             * 1000000.0) / 1000000.0 AS mean_abs_score_gap
FROM x360_nt nt LEFT JOIN x360_pairs a ON TRUE
GROUP BY nt.n_treated
"""


EXT17_QUERIES.update({"x360_psm_match": q_x360_psm_match})
EXT17_ORACLES.update({"x360_psm_match": _sql_x360()})


# ----------------------- x361: sharp regression discontinuity


def q_x361_rdd(spark, sf_dir):
    """Sharp RD at the mid-month cutoff (operators/behavior.py:
    reg_discontinuity): local-linear level jump in each event type's
    daily value at day 19737, bandwidth ±15 — the assignment-threshold
    estimand the x337 Chow test doesn't measure."""
    from .operators.behavior import reg_discontinuity

    return reg_discontinuity(
        _daily_panel(spark, sf_dir),
        group_col="event_type", running_col="day", outcome_col="v",
        cutoff=19737.0, bandwidth=15.0,
    )


def _sql_x361() -> str:
    dec = "DECIMAL(38,12)"

    def side(cond, tag):
        xd = f"(CASE WHEN {cond} THEN x END)"
        yd = f"(CASE WHEN {cond} THEN y END)"
        return f"""
         CAST(COUNT(CASE WHEN {cond} THEN 1 END) AS DOUBLE) AS n{tag},
         CAST(SUM(CAST({xd} AS {dec})) AS DOUBLE) AS sx{tag},
         CAST(SUM(CAST({yd} AS {dec})) AS DOUBLE) AS sy{tag},
         CAST(SUM(CAST({xd} * x AS {dec})) AS DOUBLE) AS sxx{tag},
         CAST(SUM(CAST({xd} * y AS {dec})) AS DOUBLE) AS sxy{tag}"""

    def fit(tag):
        det = f"(n{tag} * sxx{tag} - sx{tag} * sx{tag})"
        det_s = (
            f"(CASE WHEN n{tag} >= 3 AND abs({det}) > 0"
            f" THEN {det} END)"
        )
        b = f"((n{tag} * sxy{tag} - sx{tag} * sy{tag}) / {det_s})"
        a = f"((sy{tag} * sxx{tag} - sx{tag} * sxy{tag}) / {det_s})"
        return a, b

    al, bl = fit("l")
    ar, br = fit("r")
    return f"""
WITH x361_daily AS ({_X351_DAILY}),
x361_base AS (
  SELECT e AS g, CAST(t AS DOUBLE) - CAST(19737.0 AS DOUBLE) AS x,
         v AS y
  FROM x361_daily
  WHERE abs(CAST(t AS DOUBLE) - CAST(19737.0 AS DOUBLE))
        <= CAST(15.0 AS DOUBLE)
), x361_agg AS (
  SELECT g, {side('x < 0', 'l')}, {side('x >= 0', 'r')}
  FROM x361_base GROUP BY g
)
SELECT g AS "group",
       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
       ROUND(({ar} - {al}) * 1000000.0) / 1000000.0 AS tau,
       ROUND({bl} * 1000000.0) / 1000000.0 AS slope_left,
       ROUND({br} * 1000000.0) / 1000000.0 AS slope_right
FROM x361_agg
ORDER BY "group"
"""


EXT17_QUERIES.update({"x361_rdd": q_x361_rdd})
EXT17_ORACLES.update({"x361_rdd": _sql_x361()})


# ------------------- x362: two-way fixed-effects within estimator


def q_x362_twfe(spark, sf_dir):
    """Two-way FE within estimator (operators/behavior.py:
    twfe_within): the quantity→extended-price slope inside the
    supplier × ship-month panel, absorbing both fixed effects by
    double demeaning — the N×T generalization of x109's DiD."""
    from .operators.behavior import twfe_within

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.where(
        F.col("l_shipdate").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    ).select(
        F.col("l_suppkey").alias("supp"),
        (
            F.year("l_shipdate") * 12 + F.month("l_shipdate")
        ).alias("midx"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )
    return twfe_within(
        base, unit_col="supp", time_col="midx",
        x_col="qty", y_col="price",
    )


def _sql_x362() -> str:
    dec = "DECIMAL(38,12)"
    sd = lambda x: f"CAST(SUM(CAST({x} AS {dec})) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x362_base AS (
  SELECT CAST(CAST(l_suppkey AS BIGINT) AS VARCHAR) AS i,
         year(l_shipdate) * 12 + month(l_shipdate) AS t,
         CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND l_quantity IS NOT NULL
    AND l_extendedprice IS NOT NULL
), x362_mi AS (
  SELECT i, {sd('x')} / COUNT(*) AS mx_i, {sd('y')} / COUNT(*) AS my_i
  FROM x362_base GROUP BY i
), x362_mt AS (
  SELECT t, {sd('x')} / COUNT(*) AS mx_t, {sd('y')} / COUNT(*) AS my_t
  FROM x362_base GROUP BY t
), x362_mg AS (
  SELECT {sd('x')} / COUNT(*) AS mx_g, {sd('y')} / COUNT(*) AS my_g,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT i) AS BIGINT) AS n_units,
         CAST(COUNT(DISTINCT t) AS BIGINT) AS n_times
  FROM x362_base
), x362_rows AS (
  SELECT g.n, g.n_units, g.n_times,
         ROUND((b.x - i.mx_i - t.mx_t + g.mx_g) * 1000000.0)
           / 1000000.0 AS xt,
         ROUND((b.y - i.my_i - t.my_t + g.my_g) * 1000000.0)
           / 1000000.0 AS yt
  FROM x362_base b
  JOIN x362_mi i ON b.i = i.i
  JOIN x362_mt t ON b.t = t.t
  CROSS JOIN x362_mg g
), x362_agg AS (
  SELECT n, n_units, n_times,
         {sd('xt * yt')} AS sxy, {sd('xt * xt')} AS sxx,
         {sd('yt * yt')} AS syy
  FROM x362_rows GROUP BY n, n_units, n_times
)
SELECT n, n_units, n_times,
       ROUND((sxy / (CASE WHEN sxx > 0 THEN sxx END)) * 1000000.0)
         / 1000000.0 AS beta,
       ROUND(sqrt((CASE WHEN (syy - sxy * sxy
                              / (CASE WHEN sxx > 0 THEN sxx END)) > 0
                        THEN syy - sxy * sxy
                             / (CASE WHEN sxx > 0 THEN sxx END)
                   END)
                  / (CASE WHEN (CAST(n AS DOUBLE)
                                - CAST(n_units AS DOUBLE)
                                - CAST(n_times AS DOUBLE) + 1.0) > 0
                          THEN CAST(n AS DOUBLE)
                               - CAST(n_units AS DOUBLE)
                               - CAST(n_times AS DOUBLE) + 1.0 END)
                  / (CASE WHEN sxx > 0 THEN sxx END)) * 1000000.0)
         / 1000000.0 AS se_naive
FROM x362_agg
"""


EXT17_QUERIES.update({"x362_twfe": q_x362_twfe})
EXT17_ORACLES.update({"x362_twfe": _sql_x362()})


# ------------------------- x363: Oaxaca–Blinder decomposition


def q_x363_oaxaca(spark, sf_dir):
    """Two-fold Oaxaca–Blinder decomposition (operators/behavior.py:
    oaxaca_blinder): the AUTOMOBILE-vs-FURNITURE gap in mean customer
    spend split into the part explained by account-balance endowments
    and the unexplained coefficient gap."""
    from .operators.behavior import oaxaca_blinder

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
        .cast("double")
        .alias("spend")
    )
    base = c.join(
        spend, c["c_custkey"] == spend["o_custkey"], "left"
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
        F.coalesce(F.col("spend"), F.lit(0.0)).alias("spend"),
    )
    return oaxaca_blinder(
        base, group_col="seg", x_col="bal", y_col="spend",
        group_a="AUTOMOBILE", group_b="FURNITURE",
    )


def _sql_x363() -> str:
    dec = "DECIMAL(38,12)"

    def side(name, tag):
        cond = f"g = '{name}'"
        xd = f"(CASE WHEN {cond} THEN x END)"
        yd = f"(CASE WHEN {cond} THEN y END)"
        return f"""
         CAST(COUNT(CASE WHEN {cond} THEN 1 END) AS DOUBLE) AS n{tag},
         CAST(SUM(CAST({xd} AS {dec})) AS DOUBLE) AS sx{tag},
         CAST(SUM(CAST({yd} AS {dec})) AS DOUBLE) AS sy{tag},
         CAST(SUM(CAST({xd} * x AS {dec})) AS DOUBLE) AS sxx{tag},
         CAST(SUM(CAST({xd} * y AS {dec})) AS DOUBLE) AS sxy{tag}"""

    def fit(tag):
        det = f"(n{tag} * sxx{tag} - sx{tag} * sx{tag})"
        det_s = (
            f"(CASE WHEN n{tag} >= 3 AND abs({det}) > 0"
            f" THEN {det} END)"
        )
        b = f"((n{tag} * sxy{tag} - sx{tag} * sy{tag}) / {det_s})"
        a = f"((sy{tag} * sxx{tag} - sx{tag} * sxy{tag}) / {det_s})"
        mx = f"(sx{tag} / (CASE WHEN n{tag} > 0 THEN n{tag} END))"
        my = f"(sy{tag} / (CASE WHEN n{tag} > 0 THEN n{tag} END))"
        return a, b, mx, my

    aa, ba, mxa, mya = fit("a")
    ab, bb, mxb, myb = fit("b")
    return f"""
WITH x363_spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12)))
                         AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
), x363_base AS (
  SELECT c_mktsegment AS g, CAST(c_acctbal AS DOUBLE) AS x,
         COALESCE(s.spend, CAST(0.0 AS DOUBLE)) AS y
  FROM customer c LEFT JOIN x363_spend s ON c.c_custkey = s.o_custkey
  WHERE c_acctbal IS NOT NULL
    AND c_mktsegment IN ('AUTOMOBILE', 'FURNITURE')
), x363_agg AS (
  SELECT {side('AUTOMOBILE', 'a')}, {side('FURNITURE', 'b')}
  FROM x363_base
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ROUND(({mya} - {myb}) * 1000000.0) / 1000000.0 AS gap,
       ROUND((({mxa} - {mxb}) * {bb}) * 1000000.0) / 1000000.0
         AS explained,
       ROUND(({mxa} * ({ba} - {bb}) + ({aa} - {ab})) * 1000000.0)
         / 1000000.0 AS unexplained
FROM x363_agg
"""


EXT17_QUERIES.update({"x363_oaxaca": q_x363_oaxaca})
EXT17_ORACLES.update({"x363_oaxaca": _sql_x363()})


# ---------------------------- x364: Gini / Lorenz inequality


def q_x364_gini(spark, sf_dir):
    """Gini coefficient + top-decile share (operators/sketch.py:
    gini_lorenz) of customer order spend per market segment — the
    Lorenz-curve inequality x71's Herfindahl can't see.  Group-keyed
    rank window, decimal-exact rank-weight folds."""
    from .operators.sketch import gini_lorenz

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
        .cast("double")
        .alias("spend")
    )
    base = c.join(
        spend, c["c_custkey"] == spend["o_custkey"], "left"
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.coalesce(F.col("spend"), F.lit(0.0)).alias("spend"),
    )
    return gini_lorenz(base, ["segment"], "spend")


def _sql_x364() -> str:
    return """
WITH x364_spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12)))
                         AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
), x364_base AS (
  SELECT c_mktsegment AS segment,
         COALESCE(s.spend, CAST(0.0 AS DOUBLE)) AS w
  FROM customer c LEFT JOIN x364_spend s ON c.c_custkey = s.o_custkey
  WHERE COALESCE(s.spend, CAST(0.0 AS DOUBLE)) >= 0
), x364_ranked AS (
  SELECT segment, w,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY w) AS i,
         COUNT(*) OVER (PARTITION BY segment) AS n
  FROM x364_base
), x364_agg AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS total,
         CAST(SUM(CAST(CAST(i AS DOUBLE) * w AS DECIMAL(38,6)))
              AS DOUBLE) AS siw,
         CAST(SUM(CAST(CASE WHEN i > n - CAST(ceil(n / 10.0) AS BIGINT)
                            THEN w END AS DECIMAL(38,6)))
              AS DOUBLE) AS wtop
  FROM x364_ranked GROUP BY segment
)
SELECT segment, n_members,
       ROUND(total * 1000000.0) / 1000000.0 AS total,
       ROUND((CAST(2.0 AS DOUBLE) * siw
              / (CAST(n_members AS DOUBLE)
                 * (CASE WHEN total > 0 THEN total END))
              - (CAST(n_members AS DOUBLE) + 1.0)
                / CAST(n_members AS DOUBLE)) * 1000000.0)
         / 1000000.0 AS gini,
       ROUND((COALESCE(wtop, CAST(0.0 AS DOUBLE))
              / (CASE WHEN total > 0 THEN total END)) * 1000000.0)
         / 1000000.0 AS top10_share
FROM x364_agg
ORDER BY segment
"""


EXT17_QUERIES.update({"x364_gini": q_x364_gini})
EXT17_ORACLES.update({"x364_gini": _sql_x364()})


# ----------------------- x365: two-sample Cramér–von Mises


def q_x365_cvm(spark, sf_dir):
    """Pairwise Cramér–von Mises distribution distance (operators/
    sketch.py:cramer_von_mises) between event types' daily values —
    the integrated CDF gap that accumulates shifts x99's KS supremum
    misses.  Exact integer rank algebra, pair-keyed windows."""
    from .operators.sketch import cramer_von_mises

    return cramer_von_mises(
        _daily_panel(spark, sf_dir),
        sample_col="event_type", order_col="day", value_col="v",
    )


def _sql_x365() -> str:
    return f"""
WITH x365_daily AS ({_X351_DAILY}),
x365_names AS (SELECT DISTINCT e FROM x365_daily),
x365_pooled AS (
  SELECT a.e AS sa, nb.e AS sb, a.v, a.t AS o, 0 AS side
  FROM x365_daily a JOIN x365_names nb ON a.e < nb.e
  UNION ALL
  SELECT na.e AS sa, b.e AS sb, b.v, b.t AS o, 1 AS side
  FROM x365_daily b JOIN x365_names na ON na.e < b.e
), x365_ranked AS (
  SELECT sa, sb, side,
         ROW_NUMBER() OVER (PARTITION BY sa, sb
                            ORDER BY v, side, o) AS r,
         ROW_NUMBER() OVER (PARTITION BY sa, sb, side
                            ORDER BY v, side, o) AS i
  FROM x365_pooled
), x365_agg AS (
  SELECT sa, sb,
         CAST(COUNT(CASE WHEN side = 0 THEN 1 END) AS DOUBLE) AS n,
         CAST(COUNT(CASE WHEN side = 1 THEN 1 END) AS DOUBLE) AS m,
         CAST(SUM(CAST(CASE WHEN side = 0
                            THEN CAST(r - i AS DOUBLE)
                                 * CAST(r - i AS DOUBLE) END
                       AS DECIMAL(38,6))) AS DOUBLE) AS da,
         CAST(SUM(CAST(CASE WHEN side = 1
                            THEN CAST(r - i AS DOUBLE)
                                 * CAST(r - i AS DOUBLE) END
                       AS DECIMAL(38,6))) AS DOUBLE) AS db
  FROM x365_ranked GROUP BY sa, sb
)
SELECT sa AS entity_a, sb AS entity_b,
       CAST(n AS BIGINT) AS n_a, CAST(m AS BIGINT) AS n_b,
       ROUND(((n * da + m * db)
              / (CASE WHEN n > 0 AND m > 0
                      THEN n * m * (n + m) END)
              - (CAST(4.0 AS DOUBLE) * n * m - 1.0)
                / (CAST(6.0 AS DOUBLE) * (n + m))) * 1000000.0)
         / 1000000.0 AS cvm_t,
       CASE WHEN n > 0 AND m > 0
            THEN CAST(((n * da + m * db) / (n * m * (n + m))
                       - (CAST(4.0 AS DOUBLE) * n * m - 1.0)
                         / (CAST(6.0 AS DOUBLE) * (n + m)))
                      > CAST(0.461 AS DOUBLE) AS INTEGER) END
         AS shifted
FROM x365_agg
ORDER BY entity_a, entity_b
"""


EXT17_QUERIES.update({"x365_cvm": q_x365_cvm})
EXT17_ORACLES.update({"x365_cvm": _sql_x365()})


# --------------------------- x366: rank-biased overlap


def q_x366_rbo(spark, sf_dir):
    """Rank-biased overlap (operators/sketch.py:rank_biased_overlap,
    p = 1/2, depth 50) between two supplier rankings — by total
    lineitem revenue vs by total shipped quantity: do the two
    business lenses agree at the top?  Dyadic weights, order-pinned
    fold, metadata-scale depth frame."""
    from .operators.sketch import rank_biased_overlap

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,12)"))
        .cast("double")
        .alias("rev"),
        F.sum(F.col("l_quantity").cast("decimal(38,12)"))
        .cast("double")
        .alias("qty"),
    )
    by_rev = per_supp.select(
        F.col("l_suppkey").alias("item"),
        F.row_number()
        .over(Window.orderBy(F.desc("rev"), F.asc("l_suppkey")))
        .alias("rk"),
    )
    by_qty = per_supp.select(
        F.col("l_suppkey").alias("item"),
        F.row_number()
        .over(Window.orderBy(F.desc("qty"), F.asc("l_suppkey")))
        .alias("rk"),
    )
    return rank_biased_overlap(
        by_rev, by_qty, item_col="item", rank_col="rk",
        depth=50, p=0.5,
    )


def _sql_x366() -> str:
    return """
WITH x366_supp AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,12)))
              AS DOUBLE) AS rev,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE)
           AS qty
  FROM lineitem GROUP BY l_suppkey
), x366_ra AS (
  SELECT l_suppkey AS item,
         ROW_NUMBER() OVER (ORDER BY rev DESC, l_suppkey) AS ra
  FROM x366_supp
), x366_rb AS (
  SELECT l_suppkey AS item,
         ROW_NUMBER() OVER (ORDER BY qty DESC, l_suppkey) AS rb
  FROM x366_supp
), x366_common AS (
  SELECT a.item, greatest(a.ra, b.rb) AS dmin
  FROM x366_ra a JOIN x366_rb b ON a.item = b.item
  WHERE a.ra <= 50 AND b.rb <= 50
), x366_perd AS (
  SELECT d, CAST(COUNT(*) AS DOUBLE) AS x
  FROM (
    SELECT UNNEST(range(dmin, 51)) AS d FROM x366_common
  ) GROUP BY d
), x366_acc AS (
  SELECT d,
         SUM(pow(CAST(0.5 AS DOUBLE), d - 1) * x / CAST(d AS DOUBLE))
           OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS lacc,
         ROW_NUMBER() OVER (ORDER BY d DESC) AS rk
  FROM x366_perd
)
SELECT CAST(50 AS INTEGER) AS depth,
       CAST((SELECT COUNT(*) FROM x366_common) AS INTEGER)
         AS n_common_items,
       ROUND((CAST(0.5 AS DOUBLE) * COALESCE(
                (SELECT lacc FROM x366_acc WHERE rk = 1),
                CAST(0.0 AS DOUBLE))) * 1000000.0) / 1000000.0 AS rbo,
       ROUND(CAST(8.881784197001252e-16 AS DOUBLE) * 1000000.0)
         / 1000000.0 AS residual
"""


EXT17_QUERIES.update({"x366_rbo": q_x366_rbo})
EXT17_ORACLES.update({"x366_rbo": _sql_x366()})


# ------------------------------ x367: IV Wald estimator

_X367_U = (
    lambda tag: (
        "(CAST(CAST(('0x' || substr(md5('" + tag + ":' ||"
        " CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)"
        " / CAST(4294967296.0 AS DOUBLE))"
    )
)


def q_x367_iv_wald(spark, sf_dir):
    """IV Wald estimator (operators/behavior.py:iv_wald) on a
    deterministically synthesized confounded design over customers:
    instrument z = custkey parity, confounder u1 (md5-uniform) drives
    BOTH the treatment x = 2z + 3u1 and the outcome
    y = 4x + 8u1 + u2 — OLS is biased upward by the confounder, the
    instrument recovers the true slope 4 (the synthesis-then-audit
    x345 pattern applied to causal identification)."""
    from .operators.behavior import iv_wald

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def u01(tag):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(tag),
                            F.col("c_custkey").cast("string"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            )
            .cast("long")
            .cast("double")
            / F.lit(4294967296.0)
        )

    z = (F.col("c_custkey") % 2).cast("double")
    u1 = u01("cf")
    u2 = u01("n2")
    x = F.lit(2.0) * z + F.lit(3.0) * u1
    y = F.lit(4.0) * x + F.lit(8.0) * u1 + u2
    staged = c.select(
        z.alias("z"), x.alias("x"), y.alias("y")
    )
    return iv_wald(
        staged, instrument_col="z", treatment_col="x",
        outcome_col="y",
    )


def _sql_x367() -> str:
    u1 = _X367_U("cf")
    u2 = _X367_U("n2")
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x367_staged AS (
  SELECT z, x,
         CAST(4.0 AS DOUBLE) * x + CAST(8.0 AS DOUBLE) * u1 + u2 AS y
  FROM (
    SELECT z, u1, {u2} AS u2,
           CAST(2.0 AS DOUBLE) * z + CAST(3.0 AS DOUBLE) * u1 AS x
    FROM (
      SELECT CAST(c_custkey % 2 AS DOUBLE) AS z, {u1} AS u1, c_custkey
      FROM customer
    )
  )
), x367_agg AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {sd('z')} AS sz, {sd('x')} AS sx, {sd('y')} AS sy,
         {sd('z * x')} AS szx, {sd('z * y')} AS szy,
         {sd('z * z')} AS szz, {sd('x * x')} AS sxx,
         {sd('x * y')} AS sxy
  FROM x367_staged
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(((szx - sz * sx / n)
              / (CASE WHEN (szz - sz * sz / n) > 0
                      THEN szz - sz * sz / n END)) * 1000000.0)
         / 1000000.0 AS first_stage,
       ROUND(((sxy - sx * sy / n)
              / (CASE WHEN (sxx - sx * sx / n) > 0
                      THEN sxx - sx * sx / n END)) * 1000000.0)
         / 1000000.0 AS beta_ols,
       ROUND(((szy - sz * sy / n)
              / (CASE WHEN abs(szx - sz * sx / n) > 0
                      THEN szx - sz * sx / n END)) * 1000000.0)
         / 1000000.0 AS beta_iv
FROM x367_agg
"""


EXT17_QUERIES.update({"x367_iv_wald": q_x367_iv_wald})
EXT17_ORACLES.update({"x367_iv_wald": _sql_x367()})


# --------------------- x368: 2-D orthogonal Procrustes alignment


def q_x368_procrustes(spark, sf_dir):
    """Planar Procrustes alignment (operators/similarity.py:
    procrustes_2d): the embedding 2-D projection vs the SAME cloud
    rotated by the exact 3-4-5 angle (cos 0.8, sin 0.6) and
    translated — the operator must recover the rotation and drive
    the after-alignment residual to ~0, certifying the closed form
    end to end on real data (the embedding-migration drill)."""
    from .operators.similarity import procrustes_2d

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pts = emb.select(
        F.col("vec_id").cast("long").alias("pid"),
        F.element_at("embedding", 1).cast("double").alias("px"),
        F.element_at("embedding", 2).cast("double").alias("py"),
    )
    rotated = pts.select(
        "pid",
        (
            F.lit(0.8) * F.col("px") - F.lit(0.6) * F.col("py")
            + F.lit(0.05)
        ).alias("px"),
        (
            F.lit(0.6) * F.col("px") + F.lit(0.8) * F.col("py")
            - F.lit(0.02)
        ).alias("py"),
    )
    return procrustes_2d(
        pts, rotated, id_col="pid", x_col="px", y_col="py"
    )


def _sql_x368() -> str:
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x368_a AS (
  SELECT CAST(vec_id AS BIGINT) AS pid,
         CAST(embedding[1] AS DOUBLE) AS ax,
         CAST(embedding[2] AS DOUBLE) AS ay
  FROM embeddings
), x368_b AS (
  SELECT pid,
         CAST(0.8 AS DOUBLE) * ax - CAST(0.6 AS DOUBLE) * ay
           + CAST(0.05 AS DOUBLE) AS bx,
         CAST(0.6 AS DOUBLE) * ax + CAST(0.8 AS DOUBLE) * ay
           - CAST(0.02 AS DOUBLE) AS by
  FROM x368_a
), x368_rows AS (
  SELECT a.ax, a.ay, b.bx, b.by
  FROM x368_a a JOIN x368_b b ON a.pid = b.pid
  WHERE a.ax IS NOT NULL AND a.ay IS NOT NULL
    AND b.bx IS NOT NULL AND b.by IS NOT NULL
), x368_agg AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {sd('ax')} AS sax, {sd('ay')} AS say,
         {sd('bx')} AS sbx, {sd('by')} AS sby,
         {sd('ax * bx')} AS sxx, {sd('ay * by')} AS syy,
         {sd('ax * by')} AS sxy, {sd('ay * bx')} AS syx,
         {sd('ax * ax + ay * ay')} AS saa,
         {sd('bx * bx + by * by')} AS sbb,
         {sd('ax * bx + ay * by')} AS sab
  FROM x368_rows
), x368_stats AS (
  SELECT n,
         ((sxx - sax * sbx / n) + (syy - say * sby / n)) AS A,
         ((sxy - sax * sby / n) - (syx - say * sbx / n)) AS B,
         (saa - (sax * sax + say * say) / n) AS caa,
         (sbb - (sbx * sbx + sby * sby) / n) AS cbb,
         (sab - (sax * sbx + say * sby) / n) AS cab
  FROM x368_agg
), x368_fin AS (
  SELECT n, A, B, caa, cbb, cab, sqrt(A * A + B * B) AS hyp
  FROM x368_stats
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       ROUND((A / (CASE WHEN hyp > 0 THEN hyp END)) * 1000000.0)
         / 1000000.0 AS cos_theta,
       ROUND((B / (CASE WHEN hyp > 0 THEN hyp END)) * 1000000.0)
         / 1000000.0 AS sin_theta,
       ROUND(sqrt(greatest(caa + cbb - CAST(2.0 AS DOUBLE) * cab,
                           CAST(0.0 AS DOUBLE))
                  / (CASE WHEN n > 0 THEN n END)) * 1000000.0)
         / 1000000.0 AS rms_residual_before,
       ROUND(sqrt(greatest(caa + cbb - CAST(2.0 AS DOUBLE) * hyp,
                           CAST(0.0 AS DOUBLE))
                  / (CASE WHEN n > 0 THEN n END)) * 1000000.0)
         / 1000000.0 AS rms_residual_after
FROM x368_fin
"""


EXT17_QUERIES.update({"x368_procrustes": q_x368_procrustes})
EXT17_ORACLES.update({"x368_procrustes": _sql_x368()})


# ---------------------- x369: Matryoshka truncation audit


def q_x369_matryoshka(spark, sf_dir):
    """Matryoshka truncation audit (operators/similarity.py:
    matryoshka_audit): exact cosine top-10 under the full 64 dims vs
    the first 16, per query (vec_id < 16), Jaccard overlap — the
    go/no-go for serving the 4× cheaper prefix index."""
    from .operators.similarity import matryoshka_audit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return matryoshka_audit(
        emb, qs,
        id_col="vec_id", vec_col="embedding",
        query_id_col="qid", query_vec_col="qv",
        dim=64, prefix_dim=16, k=10,
    )


def _sql_x369() -> str:
    def cos(nt):
        dot = (
            f"list_reduce(list_transform(range(1, {nt + 1}),"
            " i -> CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)"
            " * CAST(qv[CAST(i AS INTEGER)] AS DOUBLE)),"
            " (acc, x) -> acc + x)"
        )
        nc = (
            f"sqrt(list_reduce(list_transform(range(1, {nt + 1}),"
            " i -> CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)"
            " * CAST(cv[CAST(i AS INTEGER)] AS DOUBLE)),"
            " (acc, x) -> acc + x))"
        )
        nq = (
            f"sqrt(list_reduce(list_transform(range(1, {nt + 1}),"
            " i -> CAST(qv[CAST(i AS INTEGER)] AS DOUBLE)"
            " * CAST(qv[CAST(i AS INTEGER)] AS DOUBLE)),"
            " (acc, x) -> acc + x))"
        )
        return (
            f"({dot} / (CASE WHEN {nc} * {nq} > 0"
            f" THEN {nc} * {nq} END))"
        )

    return f"""
WITH x369_q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings
  WHERE vec_id < 16
), x369_c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
), x369_scored AS (
  SELECT CAST(q.qid AS BIGINT) AS qid, CAST(c.cid AS BIGINT) AS cid,
         {cos(64)} AS cos_full,
         {cos(16)} AS cos_pfx
  FROM x369_c c CROSS JOIN x369_q q
  WHERE c.cid <> q.qid
), x369_ranked AS (
  SELECT qid, cid,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos_full DESC, cid ASC) AS rf,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos_pfx DESC, cid ASC) AS rp
  FROM x369_scored
)
SELECT qid AS query_id, CAST(10 AS BIGINT) AS k,
       CAST(COUNT(CASE WHEN rf <= 10 AND rp <= 10 THEN 1 END)
            AS BIGINT) AS n_overlap,
       ROUND((COUNT(CASE WHEN rf <= 10 AND rp <= 10 THEN 1 END)
              / CAST(20 - COUNT(CASE WHEN rf <= 10 AND rp <= 10
                                     THEN 1 END) AS DOUBLE))
             * 1000000.0) / 1000000.0 AS jaccard
FROM x369_ranked
WHERE rf <= 10 OR rp <= 10
GROUP BY qid
ORDER BY query_id
"""


EXT17_QUERIES.update({"x369_matryoshka": q_x369_matryoshka})
EXT17_ORACLES.update({"x369_matryoshka": _sql_x369()})


# ---------------- x370: Aalen–Johansen competing-risks incidence


def q_x370_competing_risks(spark, sf_dir):
    """Aalen–Johansen cumulative incidence (operators/behavior.py:
    competing_risks_cif): users race toward first PURCHASE (risk 1)
    vs first ERROR (risk 2) from their first activity day; neither =
    censored at the observation span.  The estimator under which
    cif1 + cif2 + survival = 1 exactly at every step — a per-cause
    Kaplan–Meier would overstate both causes."""
    from .operators.behavior import competing_risks_cif
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    day = F.expr(f"ts_us div {_US_PER_DAY}")
    per_user = ev.groupBy("user_id").agg(
        F.min(day).alias("fd"),
        F.max(day).alias("ld"),
        F.min(
            F.when(F.col("event_type") == "purchase", day)
        ).alias("pd"),
        F.min(F.when(F.col("event_type") == "error", day)).alias("ed"),
    )
    big = F.lit(1 << 60)
    pd_f = F.coalesce(F.col("pd"), big)
    ed_f = F.coalesce(F.col("ed"), big)
    durations = per_user.select(
        F.when(
            F.least(pd_f, ed_f) < big,
            F.least(pd_f, ed_f) - F.col("fd"),
        )
        .otherwise(F.col("ld") - F.col("fd"))
        .alias("t"),
        F.when(F.least(pd_f, ed_f) >= big, F.lit(0))
        .when(pd_f <= ed_f, F.lit(1))
        .otherwise(F.lit(2))
        .alias("risk"),
    )
    return competing_risks_cif(durations)


def _sql_x370() -> str:
    big = 1 << 60
    return f"""
WITH x370_pu AS (
  SELECT user_id,
         min(epoch_us(ts) // {_US_PER_DAY}) AS fd,
         max(epoch_us(ts) // {_US_PER_DAY}) AS ld,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) // {_US_PER_DAY} END) AS pd,
         min(CASE WHEN event_type = 'error'
                  THEN epoch_us(ts) // {_US_PER_DAY} END) AS ed
  FROM events GROUP BY user_id
), x370_lifed AS (
  SELECT CASE WHEN least(coalesce(pd, {big}), coalesce(ed, {big}))
                   < {big}
              THEN least(coalesce(pd, {big}), coalesce(ed, {big})) - fd
              ELSE ld - fd END AS t,
         CASE WHEN least(coalesce(pd, {big}), coalesce(ed, {big}))
                   >= {big} THEN 0
              WHEN coalesce(pd, {big}) <= coalesce(ed, {big}) THEN 1
              ELSE 2 END AS risk
  FROM x370_pu
), x370_per_t AS (
  SELECT t, count(*) AS n_t,
         sum(CASE WHEN risk = 1 THEN 1 ELSE 0 END) AS d1,
         sum(CASE WHEN risk = 2 THEN 1 ELSE 0 END) AS d2,
         sum(CASE WHEN risk = 0 THEN 1 ELSE 0 END) AS n_censored
  FROM x370_lifed GROUP BY t
), x370_tot AS (SELECT sum(n_t) AS N FROM x370_per_t),
x370_risked AS (
  SELECT p.t, p.d1, p.d2, p.n_censored,
         CAST(t0.N - coalesce(sum(p.n_t) OVER (
           ORDER BY p.t ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
  FROM x370_per_t p CROSS JOIN x370_tot t0
), x370_surv AS (
  SELECT t, n_at_risk, d1, d2, n_censored,
         max(CASE WHEN d1 + d2 >= n_at_risk THEN 1 ELSE 0 END)
           OVER wc AS zflag,
         coalesce(max(CASE WHEN d1 + d2 >= n_at_risk THEN 1 ELSE 0
                      END) OVER wp, 0) AS zflag_prev,
         CAST(sum(CASE WHEN d1 + d2 < n_at_risk
             THEN CAST(ln(1.0 - CAST(d1 + d2 AS DOUBLE)
                              / CAST(n_at_risk AS DOUBLE))
                       AS DECIMAL(28,18))
             ELSE CAST(0 AS DECIMAL(28,18)) END) OVER wc AS DOUBLE)
           AS lsum,
         CAST(coalesce(sum(CASE WHEN d1 + d2 < n_at_risk
             THEN CAST(ln(1.0 - CAST(d1 + d2 AS DOUBLE)
                              / CAST(n_at_risk AS DOUBLE))
                       AS DECIMAL(28,18))
             ELSE CAST(0 AS DECIMAL(28,18)) END) OVER wp,
             CAST(0 AS DECIMAL(28,18))) AS DOUBLE) AS lsum_prev
  FROM x370_risked
  WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW),
         wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING)
), x370_terms AS (
  SELECT t, n_at_risk, d1, d2, n_censored, zflag, lsum,
         ROUND((CASE WHEN zflag_prev = 1 THEN 0.0
                     ELSE exp(lsum_prev) END
                * CAST(d1 AS DOUBLE) / CAST(n_at_risk AS DOUBLE))
               * 1000000.0) / 1000000.0 AS term1,
         ROUND((CASE WHEN zflag_prev = 1 THEN 0.0
                     ELSE exp(lsum_prev) END
                * CAST(d2 AS DOUBLE) / CAST(n_at_risk AS DOUBLE))
               * 1000000.0) / 1000000.0 AS term2
  FROM x370_surv
)
SELECT CAST(t AS BIGINT) AS t, n_at_risk,
       CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
       CAST(n_censored AS BIGINT) AS n_censored,
       ROUND(CASE WHEN zflag = 1 THEN 0.0 ELSE exp(lsum) END, 6)
         AS survival,
       ROUND(sum(term1) OVER wc * 1000000.0) / 1000000.0 AS cif1,
       ROUND(sum(term2) OVER wc * 1000000.0) / 1000000.0 AS cif2
FROM x370_terms
WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW)
QUALIFY d1 + d2 > 0
ORDER BY t
"""


EXT17_QUERIES.update({"x370_competing_risks": q_x370_competing_risks})
EXT17_ORACLES.update({"x370_competing_risks": _sql_x370()})


# ----------------------------- x371: newsvendor provisioning


def q_x371_newsvendor(spark, sf_dir):
    """Newsvendor optimal provisioning (operators/behavior.py:
    newsvendor_stock, cu=2, co=1): per event type, the daily-demand
    quantile at the 2/3 critical ratio plus the expected cost at
    that stock — the capacity-planning readout on top of exact
    quantiles."""
    from .operators.behavior import newsvendor_stock
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    demand = ev.groupBy(
        "event_type", F.expr(f"ts_us div {_US_PER_DAY}").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    return newsvendor_stock(
        demand, group_col="event_type", demand_col="n",
        underage_cost=2.0, overage_cost=1.0,
    )


def _sql_x371() -> str:
    ratio = 2.0 / 3.0
    return f"""
WITH x371_demand AS (
  SELECT event_type AS g,
         CAST(COUNT(*) AS DOUBLE) AS d
  FROM events
  GROUP BY event_type, epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY}
), x371_stock AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_periods,
         ROUND(quantile_cont(d, CAST({ratio!r} AS DOUBLE))
               * 1000000.0) / 1000000.0 AS stock
  FROM x371_demand GROUP BY g
), x371_cost AS (
  SELECT d.g, s.n_periods, s.stock,
         CAST(SUM(CAST(CAST(2.0 AS DOUBLE)
                       * greatest(d.d - s.stock, CAST(0.0 AS DOUBLE))
                       + CAST(1.0 AS DOUBLE)
                       * greatest(s.stock - d.d, CAST(0.0 AS DOUBLE))
                       AS DECIMAL(38,12))) AS DOUBLE)
           / s.n_periods AS ec
  FROM x371_demand d JOIN x371_stock s ON d.g = s.g
  GROUP BY d.g, s.n_periods, s.stock
)
SELECT g AS "group", n_periods,
       ROUND(CAST({ratio!r} AS DOUBLE) * 1000000.0) / 1000000.0
         AS critical_ratio,
       stock,
       ROUND(ec * 1000000.0) / 1000000.0 AS expected_cost
FROM x371_cost
ORDER BY "group"
"""


EXT17_QUERIES.update({"x371_newsvendor": q_x371_newsvendor})
EXT17_ORACLES.update({"x371_newsvendor": _sql_x371()})


# ---------------------- x372: Haar wavelet energy decomposition


def q_x372_haar(spark, sf_dir):
    """Haar multi-resolution energy budget (operators/temporal.py:
    haar_energy, 3 levels): where each event type's daily variance
    lives — 2-day noise vs 4-day vs 8-day structure.  Dyadic-exact
    pyramid, 6-dp-pinned details, decimal-exact energies."""
    from .operators.temporal import haar_energy

    return haar_energy(
        _daily_panel(spark, sf_dir),
        entity_col="event_type", t_col="day", value_col="v",
        levels=3,
    )


def _sql_x372() -> str:
    lvl = """
x372_p{l} AS (
  SELECT e, blk AS rn,
         (v0 + v1) / CAST(2.0 AS DOUBLE) AS v,
         ROUND(((v0 - v1) / CAST(2.0 AS DOUBLE)) * 1000000.0)
           / 1000000.0 AS d
  FROM (
    SELECT e, rn // 2 AS blk, count(*) AS np,
           sum(CASE WHEN rn % 2 = 0 THEN v END) AS v0,
           sum(CASE WHEN rn % 2 = 1 THEN v END) AS v1
    FROM {src} GROUP BY e, rn // 2
  ) WHERE np = 2
), x372_e{l} AS (
  SELECT e, CAST({l} AS BIGINT) AS level,
         CAST(COUNT(*) AS BIGINT) AS n_details,
         CAST(SUM(CAST(d * d AS DECIMAL(38,12))) AS DOUBLE) AS energy
  FROM x372_p{l} GROUP BY e
)"""
    return f"""
WITH x372_daily AS ({_X351_DAILY}),
x372_rn AS (
  SELECT e, v,
         ROW_NUMBER() OVER (PARTITION BY e ORDER BY t) - 1 AS rn
  FROM x372_daily
),{lvl.format(l=1, src="x372_rn")},{lvl.format(l=2, src="x372_p1")},{lvl.format(l=3, src="x372_p2")},
x372_all AS (
  SELECT * FROM x372_e1
  UNION ALL SELECT * FROM x372_e2
  UNION ALL SELECT * FROM x372_e3
), x372_tot AS (
  SELECT e, level, n_details, energy,
         CAST(SUM(CAST(energy AS DECIMAL(38,6)))
              OVER (PARTITION BY e) AS DOUBLE) AS tot
  FROM x372_all
)
SELECT e AS entity, level, n_details,
       ROUND(energy * 1000000.0) / 1000000.0 AS energy,
       ROUND((energy / (CASE WHEN tot > 0 THEN tot END)) * 1000000.0)
         / 1000000.0 AS energy_share
FROM x372_tot
ORDER BY entity, level
"""


EXT17_QUERIES.update({"x372_haar": q_x372_haar})
EXT17_ORACLES.update({"x372_haar": _sql_x372()})


# ------------------- x373: exact Shapley R² feature attribution


def q_x373_shapley_r2(spark, sf_dir):
    """Exact LMG/Shapley decomposition of R² (operators/ml.py:
    shapley_r2_3): how much of binned order value is explained by
    date, priority urgency, and customer balance — all seven subset
    fits from one sufficient-statistic pass, Shapley-averaged.
    Features and outcome integer-quantized (the x344 parity
    discipline)."""
    from .operators.ml import shapley_r2_3

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .where(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
            & F.col("c_acctbal").isNotNull()
        )
        .select(
            F.floor(
                F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
                / F.lit(64.0)
            )
            .cast("double")
            .alias("f1"),
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .cast("int")
            .cast("double")
            .alias("f2"),
            F.floor((F.col("c_acctbal") + F.lit(1000.0)) / F.lit(64.0))
            .cast("double")
            .alias("f3"),
            F.floor(F.col("o_totalprice") / F.lit(256.0))
            .cast("double")
            .alias("yq"),
        )
    )
    return shapley_r2_3(
        base, f1_col="f1", f2_col="f2", f3_col="f3", y_col="yq"
    )


def _sql_x373() -> str:
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    third = repr(1.0 / 3.0)
    sixth = repr(1.0 / 6.0)
    cm = lambda a, b: f"(s_{a}{b} - s_{a} * s_{b} / n)"  # noqa: E731
    cyy_s = f"(CASE WHEN {cm('y','y')} > 0 THEN {cm('y','y')} END)"

    def v1(i):
        cii, ciy = cm(i, i), cm(i, "y")
        return (
            f"(({ciy} * {ciy}"
            f" / (CASE WHEN {cii} > 0 THEN {cii} END)) / {cyy_s})"
        )

    def v2(i, j):
        cii, cjj, cij = cm(i, i), cm(j, j), cm(i, j)
        ciy, cjy = cm(i, "y"), cm(j, "y")
        det2 = f"({cii} * {cjj} - {cij} * {cij})"
        det2_s = f"(CASE WHEN abs({det2}) > 0 THEN {det2} END)"
        expl = (
            f"(({ciy} * ({cjj} * {ciy} - {cij} * {cjy})"
            f" + {cjy} * ({cii} * {cjy} - {cij} * {ciy}))"
            f" / {det2_s})"
        )
        return f"({expl} / {cyy_s})"

    def det3(a, b, c_, d, e, f, g, h, i):
        return (
            f"({a} * ({e} * {i} - {f} * {h})"
            f" - {b} * ({d} * {i} - {f} * {g})"
            f" + {c_} * ({d} * {h} - {e} * {g}))"
        )

    c11, c22, c33 = cm("x1", "x1"), cm("x2", "x2"), cm("x3", "x3")
    c12, c13, c23 = cm("x1", "x2"), cm("x1", "x3"), cm("x2", "x3")
    g1, g2, g3 = cm("x1", "y"), cm("x2", "y"), cm("x3", "y")
    detC = det3(c11, c12, c13, c12, c22, c23, c13, c23, c33)
    detC_s = f"(CASE WHEN abs({detC}) > 0 THEN {detC} END)"
    b1 = f"({det3(g1, c12, c13, g2, c22, c23, g3, c23, c33)} / {detC_s})"
    b2 = f"({det3(c11, g1, c13, c12, g2, c23, c13, g3, c33)} / {detC_s})"
    b3 = f"({det3(c11, c12, g1, c12, c22, g2, c13, c23, g3)} / {detC_s})"
    vabc = f"((({g1} * {b1} + {g2} * {b2} + {g3} * {b3})) / {cyy_s})"
    va, vb, vc = v1("x1"), v1("x2"), v1("x3")
    vab, vac, vbc = v2("x1", "x2"), v2("x1", "x3"), v2("x2", "x3")
    T = f"CAST({third} AS DOUBLE)"
    S = f"CAST({sixth} AS DOUBLE)"
    shap1 = (
        f"({T} * va + {S} * ((vab - vb) + (vac - vc))"
        f" + {T} * (vabc - vbc))"
    )
    shap2 = (
        f"({T} * vb + {S} * ((vab - va) + (vbc - vc))"
        f" + {T} * (vabc - vac))"
    )
    shap3 = (
        f"({T} * vc + {S} * ((vac - va) + (vbc - vb))"
        f" + {T} * (vabc - vab))"
    )
    return f"""
WITH x373_base AS (
  SELECT CAST(floor(date_diff('day', DATE '1992-01-01', o_orderdate)
                    / CAST(64.0 AS DOUBLE)) AS DOUBLE) AS x1,
         CAST(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END AS DOUBLE) AS x2,
         CAST(floor((CAST(c_acctbal AS DOUBLE)
                     + CAST(1000.0 AS DOUBLE))
                    / CAST(64.0 AS DOUBLE)) AS DOUBLE) AS x3,
         CAST(floor(CAST(o_totalprice AS DOUBLE)
                    / CAST(256.0 AS DOUBLE)) AS DOUBLE) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    AND c_acctbal IS NOT NULL
), x373_sums AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {sd('x1')} AS s_x1, {sd('x2')} AS s_x2,
         {sd('x3')} AS s_x3, {sd('y')} AS s_y,
         {sd('x1 * x1')} AS s_x1x1, {sd('x1 * x2')} AS s_x1x2,
         {sd('x1 * x3')} AS s_x1x3, {sd('x1 * y')} AS s_x1y,
         {sd('x2 * x2')} AS s_x2x2, {sd('x2 * x3')} AS s_x2x3,
         {sd('x2 * y')} AS s_x2y, {sd('x3 * x3')} AS s_x3x3,
         {sd('x3 * y')} AS s_x3y, {sd('y * y')} AS s_yy
  FROM x373_base
), x373_vals AS (
  SELECT n,
         {va} AS va, {vb} AS vb, {vc} AS vc,
         {vab} AS vab, {vac} AS vac, {vbc} AS vbc,
         {vabc} AS vabc
  FROM x373_sums
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(vabc * 1000000.0) / 1000000.0 AS r2_full,
       ROUND({shap1} * 1000000.0) / 1000000.0 AS shap1,
       ROUND({shap2} * 1000000.0) / 1000000.0 AS shap2,
       ROUND({shap3} * 1000000.0) / 1000000.0 AS shap3
FROM x373_vals
"""


EXT17_QUERIES.update({"x373_shapley_r2": q_x373_shapley_r2})
EXT17_ORACLES.update({"x373_shapley_r2": _sql_x373()})


# -------------------- x374: content-defined chunk dedup profile

_X374_BOILER = (
    "standard corporate disclaimer the contents of this document are "
    "provided as is without warranty of any kind for internal use only"
)


def q_x374_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup (operators/text.py:
    cdc_chunk_dedup): every document gets the SAME literal
    boilerplate paragraph prepended (the header/footer pattern), so
    the boilerplate chunks dedup corpus-wide while body chunks stay
    unique — the audit must report a dup_word_frac concentrated at
    the boilerplate share, which whole-doc MinHash would dilute."""
    from .operators.text import cdc_chunk_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.lit(_X374_BOILER), F.lit(" "),
            F.coalesce(F.col("text"), F.lit("")),
        ).alias("text"),
    )
    return cdc_chunk_dedup(
        staged, id_col="doc_id", text_col="text", boundary_mod=8
    )


def _sql_x374() -> str:
    return rf"""
WITH x374_staged AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         '{_X374_BOILER}' || ' ' || COALESCE(text, '') AS t
  FROM documents
), x374_arr AS (
  SELECT id,
         string_split(trim(regexp_replace(lower(t), '\s+', ' ')),
                      ' ') AS a
  FROM x374_staged
), x374_words AS (
  SELECT id, pos - 1 AS pos, w
  FROM (
    SELECT id, UNNEST(range(1, len(a) + 1)) AS pos, UNNEST(a) AS w
    FROM x374_arr
  ) WHERE w <> ''
), x374_flagged AS (
  SELECT id, pos, w,
         CAST(CAST(('0x' || substr(md5('cdc:' || w), 1, 8)) AS BIGINT)
              % 8 = 0 AS BIGINT) AS f
  FROM x374_words
), x374_chunked AS (
  SELECT id, pos, w,
         SUM(f) OVER (PARTITION BY id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) - f AS chunk
  FROM x374_flagged
), x374_chunks AS (
  SELECT id, chunk, CAST(COUNT(*) AS BIGINT) AS c_words,
         substr(md5(string_agg(w, ' ' ORDER BY pos)), 1, 8) AS h
  FROM x374_chunked GROUP BY id, chunk
), x374_corpus AS (
  SELECT h, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs
  FROM x374_chunks GROUP BY h
), x374_tagged AS (
  SELECT c.id, c.c_words, co.n_docs
  FROM x374_chunks c JOIN x374_corpus co ON c.h = co.h
)
SELECT id,
       CAST(SUM(c_words) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(CASE WHEN n_docs > 1 THEN 1 END) AS BIGINT)
         AS dup_chunks,
       ROUND((CAST(SUM(CASE WHEN n_docs > 1 THEN c_words ELSE 0 END)
                   AS DOUBLE) / CAST(SUM(c_words) AS DOUBLE))
             * 1000000.0) / 1000000.0 AS dup_word_frac
FROM x374_tagged
GROUP BY id
ORDER BY id
"""


EXT17_QUERIES.update({"x374_cdc_chunks": q_x374_cdc_chunks})
EXT17_ORACLES.update({"x374_cdc_chunks": _sql_x374()})


# ----------------- x375: Gorilla delta/DoD compression audit


def q_x375_delta_bits(spark, sf_dir):
    """Gorilla-style compression audit (operators/layout.py:
    delta_compression_audit): would each event type's daily value
    series compress better as deltas or delta-of-deltas?  Exact
    integer bit accounting via binary-string lengths — no libm log2
    anywhere."""
    from .operators.layout import delta_compression_audit

    return delta_compression_audit(
        _daily_panel(spark, sf_dir),
        entity_col="event_type", t_col="day", value_col="v",
        scale=100,
    )


def _sql_x375() -> str:
    zz = lambda c: (  # noqa: E731
        f"(CASE WHEN {c} >= 0 THEN {c} * 2 ELSE -{c} * 2 - 1 END)"
    )
    bits = lambda c: (  # noqa: E731
        f"(CASE WHEN {c} IS NULL THEN 64"
        f" WHEN {c} = 0 THEN 1"
        f" ELSE length(bin({zz(c)})) + 2 END)"
    )
    return f"""
WITH x375_daily AS ({_X351_DAILY}),
x375_int AS (
  SELECT e, t,
         CAST(ROUND(v * 100) AS BIGINT) AS v
  FROM x375_daily
), x375_d1 AS (
  SELECT e, t, v, v - LAG(v) OVER w AS d1
  FROM x375_int WINDOW w AS (PARTITION BY e ORDER BY t)
), x375_lag AS (
  SELECT e, v, d1, d1 - LAG(d1) OVER w AS d2
  FROM x375_d1 WINDOW w AS (PARTITION BY e ORDER BY t)
), x375_agg AS (
  SELECT e, CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST(COUNT(*) * 64 AS BIGINT) AS raw_bits,
         CAST(SUM({bits('d1')}) AS BIGINT) AS delta_bits,
         CAST(SUM({bits('d2')}) AS BIGINT) AS dod_bits
  FROM x375_lag GROUP BY e
)
SELECT e AS entity, n_points, raw_bits, delta_bits, dod_bits,
       CASE WHEN dod_bits <= delta_bits AND dod_bits <= raw_bits
            THEN 'delta_of_delta'
            WHEN delta_bits <= raw_bits THEN 'delta'
            ELSE 'raw' END AS best_encoding,
       ROUND((CAST(raw_bits - least(raw_bits, delta_bits, dod_bits)
                   AS DOUBLE) / CAST(raw_bits AS DOUBLE))
             * 1000000.0) / 1000000.0 AS savings_pct
FROM x375_agg
ORDER BY entity
"""


EXT17_QUERIES.update({"x375_delta_bits": q_x375_delta_bits})
EXT17_ORACLES.update({"x375_delta_bits": _sql_x375()})


# ------------------------ x376: roaring container census


def q_x376_roaring(spark, sf_dir):
    """Roaring-bitmap container census (operators/layout.py:
    roaring_container_census): per event type, the daily-active-user
    id set spread across 2¹⁶ containers (ids deterministically
    widened so multiple container classes appear) — array vs bitmap
    vs run byte-accounting against the naive 4-byte list."""
    from .operators.layout import roaring_container_census
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    staged = ev.select(
        F.col("event_type").alias("g"),
        (
            (F.col("user_id") * F.lit(7919)) % F.lit(1 << 20)
        ).alias("wide_id"),
    )
    return roaring_container_census(
        staged, group_col="g", id_col="wide_id"
    )


def _sql_x376() -> str:
    return f"""
WITH x376_base AS (
  SELECT DISTINCT event_type AS g,
         (user_id * 7919) % {1 << 20} AS i
  FROM events WHERE user_id IS NOT NULL AND user_id >= 0
), x376_cont AS (
  SELECT g, i, CAST(i // 65536 AS BIGINT) AS c
  FROM x376_base WHERE i >= 0
), x376_runs AS (
  SELECT g, c,
         CASE WHEN LAG(i) OVER w IS NULL OR LAG(i) OVER w <> i - 1
              THEN 1 ELSE 0 END AS newrun
  FROM x376_cont WINDOW w AS (PARTITION BY g, c ORDER BY i)
), x376_per_c AS (
  SELECT g, c, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(newrun) AS BIGINT) AS nr
  FROM x376_runs GROUP BY g, c
), x376_sized AS (
  SELECT g, n,
         least(CASE WHEN n <= 4096 THEN n * 2 ELSE {1 << 30} END,
               8192, 2 + nr * 4) AS bytes,
         CASE WHEN (CASE WHEN n <= 4096 THEN n * 2
                         ELSE {1 << 30} END)
                   = least(CASE WHEN n <= 4096 THEN n * 2
                                ELSE {1 << 30} END, 8192, 2 + nr * 4)
              THEN 'array'
              WHEN (2 + nr * 4)
                   = least(CASE WHEN n <= 4096 THEN n * 2
                                ELSE {1 << 30} END, 8192, 2 + nr * 4)
              THEN 'run'
              ELSE 'bitmap' END AS cls
  FROM x376_per_c
)
SELECT g AS "group",
       CAST(SUM(n) AS BIGINT) AS n_ids,
       CAST(COUNT(*) AS BIGINT) AS n_containers,
       CAST(COUNT(CASE WHEN cls = 'array' THEN 1 END) AS BIGINT)
         AS n_array,
       CAST(COUNT(CASE WHEN cls = 'bitmap' THEN 1 END) AS BIGINT)
         AS n_bitmap,
       CAST(COUNT(CASE WHEN cls = 'run' THEN 1 END) AS BIGINT)
         AS n_run,
       CAST(SUM(bytes) AS BIGINT) AS roaring_bytes,
       CAST(SUM(n) * 4 AS BIGINT) AS naive_bytes,
       ROUND((CAST(SUM(n) * 4 AS DOUBLE)
              / CAST(SUM(bytes) AS DOUBLE)) * 1000000.0)
         / 1000000.0 AS compression_ratio
FROM x376_sized
GROUP BY g
ORDER BY "group"
"""


EXT17_QUERIES.update({"x376_roaring": q_x376_roaring})
EXT17_ORACLES.update({"x376_roaring": _sql_x376()})


# ------------------- x377: Savitzky–Golay smoothing + derivative


def q_x377_savgol(spark, sf_dir):
    """Savitzky–Golay smooth + derivative (operators/temporal.py:
    savgol_smooth, 11-point cubic) over monthly order revenue per
    segment — the peak-preserving smoother with its slope readout,
    literal kernel weights derived from the least-squares closed
    form."""
    from .operators.temporal import savgol_smooth

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    panel = (
        o.where(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
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
    out = savgol_smooth(
        panel, entity_col="segment", t_col="midx", value_col="v",
        window=11, degree=3,
    )
    return out.select(
        "segment", F.col("midx").cast("long").alias("midx"),
        "value", "smooth", "deriv",
    )


def _sql_x377() -> str:
    from .operators.temporal import savgol_weights

    ws, wd = savgol_weights(11, 3)

    def fold(weights):
        # offset j -> value at t + j (see savgol_smooth: the
        # derivative kernel is antisymmetric, orientation matters)
        terms = []
        for idx, j in enumerate(range(-5, 6)):
            if j < 0:
                t = f"LAG(v, {-j}) OVER w"
            elif j > 0:
                t = f"LEAD(v, {j}) OVER w"
            else:
                t = "v"
            terms.append(f"{weights[idx]!r} * {t}")
        acc = terms[0]
        for t in terms[1:]:
            acc = f"({acc} + {t})"
        return acc

    return f"""
WITH x377_panel AS (
  SELECT c_mktsegment AS segment,
         year(o_orderdate) * 12 + month(o_orderdate) AS midx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12))) AS DOUBLE) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), x377_f AS (
  SELECT segment, midx, ROUND(v, 6) AS value,
         CASE WHEN LAG(midx, 5) OVER w = midx - 5
               AND LEAD(midx, 5) OVER w = midx + 5
              THEN ROUND({fold(ws)}, 6) END AS smooth,
         CASE WHEN LAG(midx, 5) OVER w = midx - 5
               AND LEAD(midx, 5) OVER w = midx + 5
              THEN ROUND({fold(wd)}, 6) END AS deriv
  FROM x377_panel WINDOW w AS (PARTITION BY segment ORDER BY midx)
)
SELECT segment, CAST(midx AS BIGINT) AS midx, value, smooth, deriv
FROM x377_f
WHERE smooth IS NOT NULL
ORDER BY segment, midx
"""


EXT17_QUERIES.update({"x377_savgol": q_x377_savgol})
EXT17_ORACLES.update({"x377_savgol": _sql_x377()})


# --------------------- x378: Goertzel weekly-bin spectral power

_X378_COEFF = 1.2469796037174672  # 2*cos(2*pi/7), literal-pinned


def q_x378_goertzel(spark, sf_dir):
    """Goertzel single-bin power at the weekly frequency
    (operators/temporal.py:goertzel_power): O(n) recursion per event
    type over mean-removed daily values — "how much weekly rhythm"
    without a full DFT.  Recursive-CTE oracle (the x355 idiom)."""
    from .operators.temporal import goertzel_power

    return goertzel_power(
        _daily_panel(spark, sf_dir),
        entity_col="event_type", t_col="day", value_col="v",
        coeff=_X378_COEFF,
    )


def _sql_x378() -> str:
    c = f"CAST({_X378_COEFF!r} AS DOUBLE)"
    return f"""
WITH RECURSIVE x378_daily AS ({_X351_DAILY}),
x378_arr AS (
  SELECT e, list(v ORDER BY t) AS raw,
         CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / count(*)
           AS mean,
         CAST(count(*) AS INTEGER) AS n
  FROM x378_daily GROUP BY e
), x378_pinned AS (
  SELECT e, n,
         list_transform(raw,
           x -> ROUND((x - mean) * 1000000.0) / 1000000.0) AS ys
  FROM x378_arr
), x378_rec AS (
  SELECT e, ys, n, CAST(0 AS INTEGER) AS i,
         CAST(0.0 AS DOUBLE) AS s1, CAST(0.0 AS DOUBLE) AS s2
  FROM x378_pinned
  UNION ALL
  SELECT e, ys, n, CAST(i + 1 AS INTEGER) AS i,
         ys[CAST(i + 1 AS INTEGER)] + {c} * s1 - s2 AS s1,
         s1 AS s2
  FROM x378_rec WHERE i < n
)
SELECT e AS entity, CAST(n AS BIGINT) AS n,
       ROUND((s1 * s1 + s2 * s2 - {c} * s1 * s2) * 1000000.0)
         / 1000000.0 AS power,
       ROUND(((s1 * s1 + s2 * s2 - {c} * s1 * s2)
              / CAST(n AS DOUBLE)) * 1000000.0) / 1000000.0
         AS power_per_point
FROM x378_rec WHERE i = n
ORDER BY entity
"""


EXT17_QUERIES.update({"x378_goertzel": q_x378_goertzel})
EXT17_ORACLES.update({"x378_goertzel": _sql_x378()})


# ------------------- x379: Weisfeiler–Leman color refinement


def q_x379_wl(spark, sf_dir):
    """1-WL color refinement (operators/graph.py:wl_refinement, 2
    rounds) of the supplier co-occurrence graph — the structural
    fingerprint sequence (distinct colors per round) behind WL graph
    kernels; a stabilized round means further rounds buy nothing."""
    from .operators.graph import wl_refinement

    ls = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = ls.alias("a"), ls.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"),
        F.col("b.l_suppkey").alias("dst"),
    )
    return wl_refinement(pairs, iterations=2, min_weight=2)


def _sql_x379() -> str:
    recolor = """
x379_c{o} AS (
  SELECT cur.node,
         substr(md5(cur.color || '|' ||
                    string_agg(nc.color, ',' ORDER BY nc.color)),
                1, 12) AS color
  FROM x379_c{i} cur
  JOIN x379_und u ON u.u = cur.node
  JOIN x379_c{i} nc ON nc.node = u.v
  GROUP BY cur.node, cur.color
)"""
    census = (
        "SELECT CAST({it} AS BIGINT) AS iteration,"
        " CAST(COUNT(*) AS BIGINT) AS n_colors,"
        " CAST(MAX(cc) AS BIGINT) AS max_color_class"
        " FROM (SELECT color, COUNT(*) AS cc FROM x379_c{src}"
        " GROUP BY color)"
    )
    return f"""
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
), pairs AS (
  SELECT a.s AS u, b.s AS v FROM ls a JOIN ls b
  ON a.o = b.o AND a.s < b.s
), x379_canon AS (
  SELECT u, v FROM (
    SELECT u, v, count(*) AS w FROM pairs GROUP BY u, v
  ) WHERE w >= 2
), x379_und AS (
  SELECT u, v FROM x379_canon
  UNION ALL SELECT v AS u, u AS v FROM x379_canon
), x379_c0 AS (
  SELECT u AS node, CAST(COUNT(*) AS VARCHAR) AS color
  FROM x379_und GROUP BY u
),{recolor.format(o=1, i=0)},{recolor.format(o=2, i=1)}
{census.format(it=0, src=0)}
UNION ALL
{census.format(it=1, src=1)}
UNION ALL
{census.format(it=2, src=2)}
ORDER BY iteration
"""


EXT17_QUERIES.update({"x379_wl": q_x379_wl})
EXT17_ORACLES.update({"x379_wl": _sql_x379()})


# ----------------------- x380: Soundex phonetic blocking audit


def q_x380_soundex(spark, sf_dir):
    """Phonetic blocking audit (operators/linkage.py:
    phonetic_block_stats): Soundex-code part names' first words and
    profile the top blocks — the record-linkage key proposal that
    pairs with x328's Jaro–Winkler verifier.  Portable pure-column
    Soundex (translate + literal collapse regexes; RE2 has no
    backreferences, so no ``(\\d)\\1``)."""
    from .operators.linkage import phonetic_block_stats

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return phonetic_block_stats(
        part, id_col="p_partkey", name_col="p_name", top_k=50
    )


def _sql_x380() -> str:
    from .operators.linkage import _SOUNDEX_ALPHABET, _SOUNDEX_MAP

    collapse = "digits"
    for d in "0123456":
        collapse = f"regexp_replace({collapse}, '{d}{d}+', '{d}', 'g')"
    return f"""
WITH x380_base AS (
  SELECT p_partkey AS i, w,
         CASE WHEN length(w) > 0 THEN
           upper(substr(w, 1, 1))
           || rpad(substr(regexp_replace(substr({collapse}, 2, 1000),
                                         '0', '', 'g'),
                          1, 3), 3, '0')
         END AS sx
  FROM (
    SELECT p_partkey,
           lower(regexp_extract(p_name, '[A-Za-z]+', 0)) AS w,
           translate(lower(regexp_extract(p_name, '[A-Za-z]+', 0)),
                     '{_SOUNDEX_ALPHABET}', '{_SOUNDEX_MAP}') AS digits
    FROM part
  )
), x380_agg AS (
  SELECT sx AS soundex,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct_names
  FROM x380_base WHERE sx IS NOT NULL
  GROUP BY sx
)
SELECT soundex, n_items, n_distinct_names,
       CAST(n_items * (n_items - 1) / 2 AS BIGINT) AS pair_budget
FROM x380_agg
ORDER BY n_items DESC, soundex
LIMIT 50
"""


EXT17_QUERIES.update({"x380_soundex": q_x380_soundex})
EXT17_ORACLES.update({"x380_soundex": _sql_x380()})


# ---------------------- x381: robots.txt longest-match gate

_X381_RULES = [
    ("/src0/", 0),
    ("/src0/en/", 1),
    ("/admin", 0),
    ("/", 1),
]


def q_x381_robots(spark, sf_dir):
    """robots.txt longest-match evaluation (operators/web.py:
    robots_rules_eval, RFC 9309 semantics): URLs synthesized
    deterministically from document metadata run against a literal
    ruleset — /src0/ disallowed EXCEPT /src0/en/, /admin always
    blocked, everything else allowed; the most specific rule wins."""
    from .operators.web import robots_rules_eval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = docs.select(
        F.concat(
            F.lit("/"), F.col("source"), F.lit("/"), F.col("lang"),
            F.lit("/doc"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("/admin"))
            .otherwise(F.lit("")),
        ).alias("url")
    )
    rules = docs.sparkSession.createDataFrame(
        _X381_RULES, "path string, allow int"
    )
    return robots_rules_eval(
        urls, rules, url_col="url", path_col="path",
        allow_col="allow",
    )


def _sql_x381() -> str:
    vals = ", ".join(f"('{p}', {a})" for p, a in _X381_RULES)
    return f"""
WITH x381_urls AS (
  SELECT '/' || source || '/' || lang || '/doc'
         || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 7 = 0 THEN '/admin' ELSE '' END AS url
  FROM documents
), x381_rules AS (
  SELECT * FROM (VALUES {vals}) AS r(rp, ra)
), x381_cand AS (
  SELECT u.url, r.rp, r.ra
  FROM x381_urls u LEFT JOIN x381_rules r
    ON starts_with(u.url, r.rp)
)
SELECT url, rp AS matched_rule,
       COALESCE(ra, 1) AS allowed
FROM (
  SELECT url, rp, ra,
         ROW_NUMBER() OVER (
           PARTITION BY url
           ORDER BY length(COALESCE(rp, '')) DESC,
                    COALESCE(ra, 1) DESC) AS rk
  FROM x381_cand
) WHERE rk = 1
ORDER BY url
"""


EXT17_QUERIES.update({"x381_robots": q_x381_robots})
EXT17_ORACLES.update({"x381_robots": _sql_x381()})


# ----------------- x382: X-11 M-statistics seasonal-adjustment QA


def q_x382_sa_quality(spark, sf_dir):
    """X-11 M-statistics (operators/temporal.py:sa_quality_m) over
    the classical decomposition of monthly segment revenue: I/C
    movement ratio, stable/moving seasonality F tests from the
    phase×year two-way ANOVA of the SI values, and the combined
    M7 < 1 go/no-go for publishing the adjusted series — the
    quality gate downstream of x186/x292."""
    from .operators.temporal import sa_quality_m, seasonal_decompose

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    monthly = (
        o.where(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).alias("midx"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("o_totalprice").cast("decimal(38,12)")
                ).cast("double"),
                6,
            ).alias("rev")
        )
    )
    dec = seasonal_decompose(
        monthly, "midx", "rev", ("segment",), period=12
    )
    return sa_quality_m(
        dec, group_cols=["segment"], ts_col="ts", period=12
    )


def _sql_x382() -> str:
    over = "OVER (PARTITION BY segment ORDER BY midx)"
    terms = [f"lag(y, 6) {over} * 0.5"]
    terms += [f"lag(y, {i}) {over}" for i in range(5, 0, -1)]
    terms += ["y"]
    terms += [f"lead(y, {i}) {over}" for i in range(1, 6)]
    terms += [f"lead(y, 6) {over} * 0.5"]
    ma = " + ".join(terms)
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x382_monthly AS (
  SELECT c_mktsegment AS segment,
         year(o_orderdate) * 12 + month(o_orderdate) AS midx,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12)))
                    AS DOUBLE), 6) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), x382_staged AS (
  SELECT segment, midx AS ts, y,
         (ROW_NUMBER() {over} - 1) % 12 AS phase,
         ROUND(({ma}) / 12.0, 6) AS trend
  FROM x382_monthly
), x382_detr AS (SELECT *, y - trend AS d FROM x382_staged),
x382_ph AS (
  SELECT segment, phase,
         ROUND({sd('d')} / CAST(COUNT(*) AS DOUBLE), 6) AS sraw
  FROM x382_detr WHERE d IS NOT NULL GROUP BY segment, phase
), x382_center AS (
  SELECT segment,
         ROUND({sd('sraw')} / CAST(COUNT(*) AS DOUBLE), 6) AS c
  FROM x382_ph GROUP BY segment
), x382_seas AS (
  SELECT p.segment, p.phase, ROUND(p.sraw - ce.c, 6) AS seasonal
  FROM x382_ph p JOIN x382_center ce USING (segment)
), x382_dec AS (
  SELECT d.segment, d.ts, ROUND(d.y, 6) AS y, d.trend, s.seasonal,
         ROUND(d.y - d.trend - s.seasonal, 6) AS resid
  FROM x382_detr d LEFT JOIN x382_seas s
    ON s.segment = d.segment AND s.phase = d.phase
), x382_base AS (
  SELECT segment, ts,
         ROUND((y - trend) * 1000000.0) / 1000000.0 AS si,
         trend, resid,
         ts % 12 AS ph, ts // 12 AS yr
  FROM x382_dec
  WHERE trend IS NOT NULL AND resid IS NOT NULL
), x382_moves AS (
  SELECT segment,
         abs(ROUND((resid - LAG(resid) OVER ws) * 1000000.0)
             / 1000000.0) AS di,
         abs(ROUND((trend - LAG(trend) OVER ws) * 1000000.0)
             / 1000000.0) AS dt
  FROM x382_base
  WINDOW ws AS (PARTITION BY segment ORDER BY ts)
), x382_ic AS (
  SELECT segment,
         {sd('di')} / (CASE WHEN {sd('dt')} > 0
                            THEN {sd('dt')} END) AS ic_ratio
  FROM x382_moves WHERE di IS NOT NULL GROUP BY segment
), x382_cell0 AS (
  SELECT segment, ph, yr, MAX(si) AS si
  FROM x382_base GROUP BY segment, ph, yr
), x382_full_years AS (
  SELECT segment, yr FROM x382_cell0
  GROUP BY segment, yr HAVING COUNT(*) = 12
), x382_cell AS (
  SELECT c.segment, c.ph, c.yr, c.si
  FROM x382_cell0 c JOIN x382_full_years f
    ON c.segment = f.segment AND c.yr = f.yr
), x382_tot AS (
  SELECT segment, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(COUNT(DISTINCT ph) AS DOUBLE) AS p,
         CAST(COUNT(DISTINCT yr) AS DOUBLE) AS q,
         {sd('si')} AS s, {sd('si * si')} AS ss
  FROM x382_cell GROUP BY segment
), x382_phm AS (
  SELECT segment, ph, CAST(COUNT(*) AS DOUBLE) AS np,
         {sd('si')} AS sp
  FROM x382_cell GROUP BY segment, ph
), x382_phss AS (
  SELECT segment, {sd('sp * sp / np')} AS ssp
  FROM x382_phm GROUP BY segment
), x382_yrm AS (
  SELECT segment, yr, CAST(COUNT(*) AS DOUBLE) AS nq,
         {sd('si')} AS sq
  FROM x382_cell GROUP BY segment, yr
), x382_yrss AS (
  SELECT segment, {sd('sq * sq / nq')} AS ssq
  FROM x382_yrm GROUP BY segment
), x382_j AS (
  SELECT t.segment, t.n, t.p, t.q,
         (t.ss - t.s * t.s / t.n) AS ss_tot,
         (ps.ssp - t.s * t.s / t.n) AS ss_ph,
         (ys.ssq - t.s * t.s / t.n) AS ss_yr,
         i.ic_ratio
  FROM x382_tot t
  JOIN x382_phss ps ON t.segment = ps.segment
  JOIN x382_yrss ys ON t.segment = ys.segment
  LEFT JOIN x382_ic i ON t.segment = i.segment
), x382_f AS (
  SELECT segment, n, p, q, ic_ratio,
         (ss_tot - ss_ph - ss_yr) AS ss_res,
         (p - 1.0) AS df_ph, (q - 1.0) AS df_yr,
         (p - 1.0) * (q - 1.0) AS df_res,
         ss_ph, ss_yr
  FROM x382_j
), x382_stats AS (
  SELECT segment, n, ic_ratio,
         p >= 2 AND q >= 2 AND ss_res > 0 AND df_ph > 0
           AND df_yr > 0 AND df_res > 0 AS ok,
         (ss_ph / (CASE WHEN df_ph > 0 THEN df_ph END))
           / (CASE WHEN (ss_res / (CASE WHEN df_res > 0
                                        THEN df_res END)) > 0
                   THEN ss_res / (CASE WHEN df_res > 0
                                       THEN df_res END) END) AS f_s,
         (ss_yr / (CASE WHEN df_yr > 0 THEN df_yr END))
           / (CASE WHEN (ss_res / (CASE WHEN df_res > 0
                                        THEN df_res END)) > 0
                   THEN ss_res / (CASE WHEN df_res > 0
                                       THEN df_res END) END) AS f_m
  FROM x382_f
)
SELECT segment, CAST(n AS BIGINT) AS n,
       ROUND(ic_ratio * 1000000.0) / 1000000.0 AS ic_ratio,
       ROUND(CASE WHEN ok THEN f_s END * 1000000.0) / 1000000.0
         AS f_stable,
       ROUND(CASE WHEN ok THEN f_m END * 1000000.0) / 1000000.0
         AS f_moving,
       ROUND(CASE WHEN ok THEN
               sqrt(CAST(0.5 AS DOUBLE)
                    * (CAST(3.0 AS DOUBLE)
                       / (CASE WHEN f_s > 0 THEN f_s END)
                       + CAST(7.0 AS DOUBLE) * f_m
                         / (CASE WHEN f_s > 0 THEN f_s END)))
             END * 1000000.0) / 1000000.0 AS m7,
       CASE WHEN ok THEN
         CAST(sqrt(CAST(0.5 AS DOUBLE)
                   * (CAST(3.0 AS DOUBLE)
                      / (CASE WHEN f_s > 0 THEN f_s END)
                      + CAST(7.0 AS DOUBLE) * f_m
                        / (CASE WHEN f_s > 0 THEN f_s END)))
              < CAST(1.0 AS DOUBLE) AS INTEGER) END AS seasonal_ok
FROM x382_stats
ORDER BY segment
"""


EXT17_QUERIES.update({"x382_sa_quality": q_x382_sa_quality})
EXT17_ORACLES.update({"x382_sa_quality": _sql_x382()})


# ---------------------- x383: item-item collaborative filtering


def q_x383_item_cf(spark, sf_dir):
    """Item–item co-occurrence cosine recommendations
    (operators/similarity.py:item_item_cf, k=5, min co-occurrence 2):
    "customers who bought this part also bought" over the
    customer×part baskets — the memory-light recsys workhorse beside
    x151's ALS step and the x05 embedding ANN family."""
    from .operators.similarity import item_item_cf

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    baskets = o.join(
        li, o["o_orderkey"] == li["l_orderkey"]
    ).select(
        F.col("o_custkey").alias("cust"),
        F.col("l_partkey").alias("part"),
    )
    return item_item_cf(
        baskets, user_col="cust", item_col="part",
        k=5, min_cooccur=2,
    )


def _sql_x383() -> str:
    return """
WITH x383_base AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u,
         CAST(l_partkey AS BIGINT) AS it
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL
), x383_pop AS (
  SELECT it, CAST(COUNT(*) AS BIGINT) AS n FROM x383_base GROUP BY it
), x383_cooc AS (
  SELECT a.it AS ia, b.it AS ib, CAST(COUNT(*) AS BIGINT) AS c
  FROM x383_base a JOIN x383_base b
    ON a.u = b.u AND a.it < b.it
  GROUP BY a.it, b.it
  HAVING COUNT(*) >= 2
), x383_sym AS (
  SELECT ia, ib, c FROM x383_cooc
  UNION ALL SELECT ib AS ia, ia AS ib, c FROM x383_cooc
), x383_scored AS (
  SELECT s.ia, s.ib, s.c,
         CAST(s.c AS DOUBLE)
           / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)) AS cos
  FROM x383_sym s
  JOIN x383_pop na ON s.ia = na.it
  JOIN x383_pop nb ON s.ib = nb.it
)
SELECT ia AS item, ib AS neighbor, c AS cooccur,
       ROUND(cos * 1000000.0) / 1000000.0 AS cosine,
       CAST(rk AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY ia
                               ORDER BY cos DESC, ib ASC) AS rk
  FROM x383_scored
) WHERE rk <= 5
ORDER BY item, rank
"""


EXT17_QUERIES.update({"x383_item_cf": q_x383_item_cf})
EXT17_ORACLES.update({"x383_item_cf": _sql_x383()})


# ------------------ x384: elementary price indices (CPI bottom level)


def q_x384_elementary_idx(spark, sf_dir):
    """Jevons/Dutot/Carli elementary indices (functions/econ.py:
    elementary_price_indices) over matched monthly unit prices per
    part brand — the CPI bottom level below the aggregate
    Törnqvist/Fisher pair (x291/s13); the Carli−Jevons gap is the
    chain-drift early warning."""
    from .functions.econ import elementary_price_indices

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    monthly = (
        li.where(
            F.col("l_shipdate").isNotNull()
            & F.col("l_extendedprice").isNotNull()
            & (F.col("l_quantity") > 0)
        )
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_partkey").alias("part"),
            (
                F.year("l_shipdate") * 12 + F.month("l_shipdate")
            ).alias("midx"),
        )
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice") / F.col("l_quantity")
                    ).cast("decimal(38,12)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("price")
        )
    )
    return elementary_price_indices(
        monthly, group_col="brand", item_col="part",
        period_col="midx", price_col="price",
    )


def _sql_x384() -> str:
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x384_monthly AS (
  SELECT p_brand AS g, l_partkey AS i,
         year(l_shipdate) * 12 + month(l_shipdate) AS t,
         {sd('CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)')}
           / COUNT(*) AS p
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_quantity > 0
  GROUP BY 1, 2, 3
), x384_matched AS (
  SELECT c.g, c.i, c.t, c.p, pr.p AS p0
  FROM x384_monthly c
  JOIN x384_monthly pr
    ON pr.g = c.g AND pr.i = c.i AND pr.t = c.t - 1
  WHERE c.p IS NOT NULL AND c.p > 0 AND pr.p IS NOT NULL AND pr.p > 0
), x384_agg AS (
  SELECT g, t, CAST(COUNT(*) AS BIGINT) AS n_matched,
         {sd('ROUND(ln(p / p0) * 1000000.0) / 1000000.0')} AS slr,
         {sd('ROUND((p / p0) * 1000000.0) / 1000000.0')} AS srr,
         {sd('p')} AS sp, {sd('p0')} AS sp0
  FROM x384_matched GROUP BY g, t
)
SELECT g AS "group", t AS period, n_matched,
       ROUND(exp(slr / CAST(n_matched AS DOUBLE)) * 1000000.0)
         / 1000000.0 AS jevons,
       ROUND((sp / (CASE WHEN sp0 > 0 THEN sp0 END)) * 1000000.0)
         / 1000000.0 AS dutot,
       ROUND((srr / CAST(n_matched AS DOUBLE)) * 1000000.0)
         / 1000000.0 AS carli
FROM x384_agg
ORDER BY "group", period
"""


EXT17_QUERIES.update({"x384_elementary_idx": q_x384_elementary_idx})
EXT17_ORACLES.update({"x384_elementary_idx": _sql_x384()})


# --------------------- x385: Simpson's-paradox amalgamation scan


def q_x385_simpsons(spark, sf_dir):
    """Simpson's-paradox scan (operators/behavior.py:
    simpsons_paradox_scan): pooled vs per-segment vs within-strata
    slope of customer spend on account balance — the one-row audit
    for whether the pooled trend is composition or signal."""
    from .operators.behavior import simpsons_paradox_scan

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,12)"))
        .cast("double")
        .alias("spend")
    )
    base = c.join(
        spend, c["c_custkey"] == spend["o_custkey"], "left"
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
        F.coalesce(F.col("spend"), F.lit(0.0)).alias("spend"),
    )
    return simpsons_paradox_scan(
        base, stratum_col="seg", x_col="bal", y_col="spend"
    )


def _sql_x385() -> str:
    sd = lambda x: f"CAST(SUM(CAST({x} AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    return f"""
WITH x385_spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,12)))
                         AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
), x385_base AS (
  SELECT c_mktsegment AS s, CAST(c_acctbal AS DOUBLE) AS x,
         COALESCE(sp.spend, CAST(0.0 AS DOUBLE)) AS y
  FROM customer c LEFT JOIN x385_spend sp
    ON c.c_custkey = sp.o_custkey
  WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
), x385_per_s AS (
  SELECT s, CAST(COUNT(*) AS DOUBLE) AS n,
         {sd('x')} AS sx, {sd('y')} AS sy,
         {sd('x * x')} AS sxx, {sd('x * y')} AS sxy
  FROM x385_base GROUP BY s
), x385_enr AS (
  SELECT n, sx, sy, sxx, sxy,
         (sxx - sx * sx / n) AS cxx,
         (sxy - sx * sy / n) AS cxy,
         (sxy - sx * sy / n)
           / (CASE WHEN (sxx - sx * sx / n) > 0
                   THEN sxx - sx * sx / n END) AS b_s
  FROM x385_per_s
), x385_tot AS (
  SELECT {sd('n')} AS N, {sd('sx')} AS SX, {sd('sy')} AS SY,
         {sd('sxx')} AS SXX, {sd('sxy')} AS SXY,
         {sd('cxx')} AS WXX, {sd('cxy')} AS WXY,
         CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(COUNT(CASE WHEN b_s > 0 THEN 1 END) AS BIGINT) AS n_pos,
         CAST(COUNT(CASE WHEN b_s < 0 THEN 1 END) AS BIGINT) AS n_neg
  FROM x385_enr
), x385_f AS (
  SELECT N, n_strata, n_pos, n_neg,
         (SXY - SX * SY / N)
           / (CASE WHEN (SXX - SX * SX / N) > 0
                   THEN SXX - SX * SX / N END) AS pooled,
         WXY / (CASE WHEN WXX > 0 THEN WXX END) AS within
  FROM x385_tot
)
SELECT CAST(N AS BIGINT) AS n, n_strata,
       ROUND(pooled * 1000000.0) / 1000000.0 AS pooled_slope,
       ROUND(within * 1000000.0) / 1000000.0 AS within_slope,
       CASE WHEN pooled > 0 THEN n_neg
            WHEN pooled < 0 THEN n_pos END AS reversal_strata,
       CASE WHEN pooled IS NOT NULL AND within IS NOT NULL
            THEN CAST((pooled > 0 AND within < 0)
                      OR (pooled < 0 AND within > 0) AS INTEGER) END
         AS pooled_vs_within
FROM x385_f
"""


EXT17_QUERIES.update({"x385_simpsons": q_x385_simpsons})
EXT17_ORACLES.update({"x385_simpsons": _sql_x385()})


# -------------------- x386: Kleinberg 2-state burst detection


def q_x386_bursts(spark, sf_dir):
    """Kleinberg burst segmentation (operators/temporal.py:
    kleinberg_bursts, s=2, gamma=1): which event types burst above
    their own share of the daily stream, which days, and for how
    long — the trending-topics primitive x188's burstiness index
    can't segment.  Viterbi + backtrace per entity in mapInPandas;
    the oracle replays the DP as recursive CTEs carrying costs and
    predecessor flags, then gaps-and-islands the path."""
    from .operators.temporal import kleinberg_bursts
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    day = F.expr(f"ts_us div {_US_PER_DAY}")
    per_type = ev.groupBy(
        F.col("event_type"), day.alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("d"))
    totals = ev.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    joined = per_type.join(F.broadcast(totals), "day")
    return kleinberg_bursts(
        joined, entity_col="event_type", t_col="day",
        hits_col="d", total_col="nt", s=2.0, gamma=1.0,
    )


def _sql_x386() -> str:
    emit = lambda p: (  # noqa: E731
        "ROUND(-(CAST(d AS DOUBLE) * ln({p})"
        " + CAST(nt - d AS DOUBLE) * ln(CAST(1.0 AS DOUBLE) - {p}))"
        " * 1000000.0) / 1000000.0"
    ).format(p=p)
    e_arr = lambda p, idx: (  # noqa: E731
        "ROUND(-(CAST(ds[{i}] AS DOUBLE) * ln({p})"
        " + CAST(ns[{i}] - ds[{i}] AS DOUBLE)"
        " * ln(CAST(1.0 AS DOUBLE) - {p}))"
        " * 1000000.0) / 1000000.0"
    ).format(p=p, i=idx)
    return f"""
WITH RECURSIVE x386_pt AS (
  SELECT event_type AS e,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY} AS t,
         CAST(COUNT(*) AS BIGINT) AS d
  FROM events GROUP BY 1, 2
), x386_tot AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY} AS t,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM events GROUP BY 1
), x386_rows AS (
  SELECT p.e, p.t, p.d, tt.nt
  FROM x386_pt p JOIN x386_tot tt ON p.t = tt.t
  WHERE p.d <= tt.nt AND tt.nt > 0
), x386_arr AS (
  SELECT e, list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
         list(nt ORDER BY t) AS ns,
         CAST(count(*) AS INTEGER) AS nd,
         ROUND(greatest(least(CAST(SUM(d) AS DOUBLE)
                              / CAST(SUM(nt) AS DOUBLE),
                              CAST(0.999999 AS DOUBLE)),
                        CAST(0.000000001 AS DOUBLE)) * 1000000.0)
           / 1000000.0 AS p0,
         CASE WHEN count(*) > 1
              THEN ROUND(CAST(1.0 AS DOUBLE)
                         * ln(CAST(count(*) AS DOUBLE)) * 1000000.0)
                   / 1000000.0
              ELSE CAST(1.0 AS DOUBLE) END AS gcost
  FROM x386_rows GROUP BY e
), x386_p AS (
  SELECT *, least(CAST(2.0 AS DOUBLE) * p0,
                  CAST(0.999999 AS DOUBLE)) AS p1
  FROM x386_arr
), x386_fwd AS (
  SELECT e, ts, ds, ns, nd, p0, p1, gcost, CAST(1 AS INTEGER) AS i,
         {e_arr('p0', 1)} AS c0,
         {e_arr('p1', 1)} + gcost AS c1,
         [false] AS F0s, [false] AS F1s
  FROM x386_p
  UNION ALL
  SELECT e, ts, ds, ns, nd, p0, p1, gcost, s AS i,
         CASE WHEN c1 < c0 THEN c1 + e0 ELSE c0 + e0 END AS c0,
         CASE WHEN c0 + gcost < c1 THEN (c0 + gcost) + e1
              ELSE c1 + e1 END AS c1,
         list_append(F0s, c0 + gcost < c1) AS F0s,
         list_append(F1s, c1 < c0) AS F1s
  FROM (
    SELECT e, ts, ds, ns, nd, p0, p1, gcost,
           CAST(i + 1 AS INTEGER) AS s, c0, c1, F0s, F1s,
           (SELECT ROUND(-(CAST(x.ds[CAST(x.i + 1 AS INTEGER)]
                                AS DOUBLE) * ln(x.p0)
                 + CAST(x.ns[CAST(x.i + 1 AS INTEGER)]
                        - x.ds[CAST(x.i + 1 AS INTEGER)] AS DOUBLE)
                   * ln(CAST(1.0 AS DOUBLE) - x.p0)) * 1000000.0)
               / 1000000.0) AS e0,
           (SELECT ROUND(-(CAST(x.ds[CAST(x.i + 1 AS INTEGER)]
                                AS DOUBLE) * ln(x.p1)
                 + CAST(x.ns[CAST(x.i + 1 AS INTEGER)]
                        - x.ds[CAST(x.i + 1 AS INTEGER)] AS DOUBLE)
                   * ln(CAST(1.0 AS DOUBLE) - x.p1)) * 1000000.0)
               / 1000000.0) AS e1
    FROM x386_fwd x WHERE i < nd
  )
), x386_bwd AS (
  SELECT e, ts, nd, F0s, F1s, nd AS i,
         CASE WHEN c1 < c0 THEN 1 ELSE 0 END AS state,
         [CASE WHEN c1 < c0 THEN 1 ELSE 0 END] AS path
  FROM x386_fwd WHERE i = nd
  UNION ALL
  SELECT e, ts, nd, F0s, F1s, CAST(i - 1 AS INTEGER) AS i,
         CASE WHEN state = 1
              THEN CASE WHEN F0s[i] THEN 0 ELSE 1 END
              ELSE CASE WHEN F1s[i] THEN 1 ELSE 0 END END AS state,
         list_prepend(
           CASE WHEN state = 1
                THEN CASE WHEN F0s[i] THEN 0 ELSE 1 END
                ELSE CASE WHEN F1s[i] THEN 1 ELSE 0 END END,
           path) AS path
  FROM x386_bwd WHERE i > 1
), x386_path AS (
  SELECT e, UNNEST(range(1, nd + 1)) AS idx,
         UNNEST(ts) AS t, UNNEST(path) AS st
  FROM x386_bwd WHERE i = 1
), x386_runs AS (
  SELECT e, t, idx,
         idx - ROW_NUMBER() OVER (PARTITION BY e
                                  ORDER BY idx) AS grp
  FROM x386_path WHERE st = 1
), x386_islands AS (
  SELECT e, grp, CAST(COUNT(*) AS BIGINT) AS len,
         MIN(t) AS t0
  FROM x386_runs GROUP BY e, grp
), x386_stats AS (
  SELECT e, CAST(SUM(len) AS BIGINT) AS burst_days,
         CAST(COUNT(*) AS BIGINT) AS n_bursts,
         CAST(MAX(len) AS BIGINT) AS longest_burst,
         CAST(MIN(t0) AS BIGINT) AS first_burst_t
  FROM x386_islands GROUP BY e
)
SELECT a.e AS entity, CAST(a.nd AS BIGINT) AS n_days,
       ROUND(a.p0 * 1000000.0) / 1000000.0 AS base_rate,
       COALESCE(s.burst_days, 0) AS burst_days,
       COALESCE(s.n_bursts, 0) AS n_bursts,
       COALESCE(s.longest_burst, 0) AS longest_burst,
       s.first_burst_t
FROM x386_arr a LEFT JOIN x386_stats s ON a.e = s.e
ORDER BY entity
"""


EXT17_QUERIES.update({"x386_bursts": q_x386_bursts})
EXT17_ORACLES.update({"x386_bursts": _sql_x386()})
