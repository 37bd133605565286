"""Index-number operators: chain-linked volume, Fisher volume, backcast.

The reference delegates all three to the closed-source ``polars_econ``
package (its mock returns ``lit(1.0)``,
``/root/reference/fame2pygen/polars_econ_mock.py:9-40``), so the math
here is our published definition, implemented from the standard
national-accounts literature (annual-overlap chain linking and the
Fisher ideal index, as in the IMF Quarterly National Accounts manual):

chain (``$chain("a - b + c", "2020")``)
    annual-overlap chain-linked Laspeyres volume index.  With signed
    quantity terms q_i (price column ``P``+name by the reference's
    pairing convention, ``formulas_generator.py:613-620``):

    * annual averages  p̄_{i,y}, q̄_{i,y}  (one groupBy per year)
    * annual link      L_y = Σ s_i·p̄_{i,y-1}·q̄_{i,y} / Σ s_i·p̄_{i,y-1}·q̄_{i,y-1}
    * chained level    C_y = Π_{s≤y} L_s  (exp-sum-log over the tiny
      per-year frame), rebased so the base year = 100
    * period values    idx_t = 100·(C_{y-1}/C_base) ·
      Σ s_i·p̄_{i,y-1}·q_{i,t} / Σ s_i·p̄_{i,y-1}·q̄_{i,y-1}

    First year (no previous-year prices) is null.

fishvol (``fishvol_rebase({v},{p}, 2020)``)
    Fisher ideal volume index of each period vs the base year:
    Las_t = Σ p̄_b·v_t / Σ p̄_b·v̄_b,  Paa_t = Σ p_t·v_t / Σ p_t·v̄_b,
    F_t = 100·√(Las_t·Paa_t); base-year aggregates are a one-row frame
    broadcast-joined back (no shuffle of the big side).

backcast (SHIFT_PCT_BACKWARDS, ``formulas_generator.py:1358-1418``)
    ``v[t] = v[t+1] / (1 + pct(p[t+1])/100)`` walked backwards from a
    fixed window telescopes to the closed form
    ``v_new[t] = v_ref · p[t] / p_ref`` (the growth factors
    p[s+1]/p[s] cancel), where *ref* is the first row after the window.
    The closed form is shuffle-free per row — no recursive cum-product
    needed — and is exactly equal to the reference's descending
    cum-product whenever p is non-null and non-zero inside the window.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, Window, functions as F

from ..parser.expressions import column_name


def chain_index(
    df: DataFrame,
    terms: tuple[tuple[int, str], ...],
    base_year: int,
    out_col: str,
    *,
    date_col: str = "DATE",
    entity_cols: tuple[str, ...] = (),
    price_prefix: str = "P",
) -> DataFrame:
    """Append the chain-linked volume index column *out_col*."""
    pairs = [
        (sign, column_name(name), column_name(price_prefix + name))
        for sign, name in terms
    ]

    year = F.year(F.col(date_col)).alias("__y")
    aggs = []
    for _, qcol, pcol in pairs:
        aggs.append(F.avg(qcol).alias(f"__qb_{qcol}"))
        aggs.append(F.avg(pcol).alias(f"__pb_{pcol}"))
    yearly = df.groupBy(*entity_cols, year).agg(*aggs)

    wy = Window.partitionBy(*entity_cols).orderBy("__y")
    # previous-year average prices
    lagged = yearly.select(
        *entity_cols,
        "__y",
        *[F.col(f"__qb_{q}") for _, q, _ in pairs],
        *[F.lag(f"__pb_{p}", 1).over(wy).alias(f"__pprev_{p}") for _, _, p in pairs],
        *[F.lag(f"__qb_{q}", 1).over(wy).alias(f"__qprev_{q}") for _, q, _ in pairs],
    )

    num = None
    den = None
    for sign, q, p in pairs:
        n = F.lit(sign) * F.col(f"__pprev_{p}") * F.col(f"__qb_{q}")
        d = F.lit(sign) * F.col(f"__pprev_{p}") * F.col(f"__qprev_{q}")
        num = n if num is None else num + n
        den = d if den is None else den + d
    links = lagged.withColumn("__link", F.try_divide(num, den))

    # chained level C_y = Π links (log-cumsum; first-year link missing → 1)
    wcum = (
        Window.partitionBy(*entity_cols)
        .orderBy("__y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    links = links.withColumn(
        "__level", F.exp(F.sum(F.log(F.col("__link"))).over(wcum))
    )
    wfull = (
        Window.partitionBy(*entity_cols)
        .orderBy("__y")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    links = links.withColumn(
        "__base_level",
        F.max(
            F.when(F.col("__y") == base_year, F.coalesce("__level", F.lit(1.0)))
        ).over(wfull),
    ).withColumn(
        "__prev_level",
        F.coalesce(F.lag("__level", 1).over(wy), F.lit(1.0)),
    )

    keep = [
        "__y", "__base_level", "__prev_level",
        *[f"__pprev_{p}" for _, _, p in pairs],
        *[f"__qprev_{q}" for _, q, _ in pairs],
    ]
    year_info = links.select(*entity_cols, *keep)

    joined = df.withColumn("__y", F.year(F.col(date_col))).join(
        F.broadcast(year_info), on=[*entity_cols, "__y"], how="left"
    )

    qnum = None
    qden = None
    for sign, q, p in pairs:
        n = F.lit(sign) * F.col(f"__pprev_{p}") * F.col(q)
        d = F.lit(sign) * F.col(f"__pprev_{p}") * F.col(f"__qprev_{q}")
        qnum = n if qnum is None else qnum + n
        qden = d if qden is None else qden + d

    idx = (
        F.lit(100.0)
        * F.try_divide(F.col("__prev_level"), F.col("__base_level"))
        * F.try_divide(qnum, qden)
    )
    return joined.withColumn(out_col, idx).drop(*keep)


def fisher_volume(
    df: DataFrame,
    pairs: tuple[tuple[str, str], ...],
    base_year: int,
    out_col: str,
    *,
    date_col: str = "DATE",
    entity_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Append the Fisher ideal volume index column *out_col* (=100 in
    the base year on average)."""
    cols = [(column_name(v), column_name(p)) for v, p in pairs]

    base_aggs = []
    for v, p in cols:
        base_aggs.append(F.avg(v).alias(f"__vb_{v}"))
        base_aggs.append(F.avg(p).alias(f"__pb_{p}"))
    base = (
        df.where(F.year(F.col(date_col)) == base_year)
        .groupBy(*entity_cols)
        .agg(*base_aggs)
    )

    if entity_cols:
        joined = df.join(F.broadcast(base), on=list(entity_cols), how="left")
    else:
        joined = df.crossJoin(F.broadcast(base))

    las_n = las_d = paa_n = paa_d = None
    for v, p in cols:
        ln = F.col(f"__pb_{p}") * F.col(v)
        ld = F.col(f"__pb_{p}") * F.col(f"__vb_{v}")
        pn = F.col(p) * F.col(v)
        pd_ = F.col(p) * F.col(f"__vb_{v}")
        las_n = ln if las_n is None else las_n + ln
        las_d = ld if las_d is None else las_d + ld
        paa_n = pn if paa_n is None else paa_n + pn
        paa_d = pd_ if paa_d is None else paa_d + pd_

    fisher = F.lit(100.0) * F.sqrt(F.try_divide(las_n, las_d) * F.try_divide(paa_n, paa_d))
    drop = [f"__vb_{v}" for v, _ in cols] + [f"__pb_{p}" for _, p in cols]
    return joined.withColumn(out_col, fisher).drop(*drop)


def backcast(
    df: DataFrame,
    pairs: list[tuple[str, str]],
    window_start: _date,
    window_end: _date,
    *,
    date_col: str = "DATE",
    entity_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Batched SHIFT_PCT_BACKWARDS over (target, pct_source) column pairs.

    Rewrites each target inside [window_end, window_start] using the
    telescoped closed form (see module docstring).  All pairs share one
    pass — mirrors the reference's batching
    (``fame2py_converter.py:263-273,319-328``) without its per-pair
    joins.
    """
    if not pairs:
        return df
    wfull = (
        Window.partitionBy(*entity_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ref_date = F.min(
        F.when(F.col(date_col) > F.lit(window_start), F.col(date_col))
    ).over(wfull)
    out = df.withColumn("__ref_date", ref_date)

    anchor_cols = {}
    for tgt, pct in pairs:
        anchor_cols[f"__ref_{tgt}"] = F.max(
            F.when(F.col(date_col) == F.col("__ref_date"), F.col(tgt))
        ).over(wfull)
        anchor_cols[f"__ref_{pct}"] = F.max(
            F.when(F.col(date_col) == F.col("__ref_date"), F.col(pct))
        ).over(wfull)
    out = out.withColumns(anchor_cols)

    in_window = F.col(date_col).between(F.lit(window_end), F.lit(window_start))
    updates = {}
    for tgt, pct in pairs:
        updates[tgt] = F.when(
            in_window,
            F.try_divide(F.col(f"__ref_{tgt}") * F.col(pct), F.col(f"__ref_{pct}")),
        ).otherwise(F.col(tgt))
    out = out.withColumns(updates)
    return out.drop("__ref_date", *anchor_cols.keys())
