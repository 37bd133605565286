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


def tornqvist_index(
    panel: DataFrame,
    *,
    item_col: str = "item",
    t_col: str = "midx",
    price_col: str = "p",
    value_col: str = "v",
) -> DataFrame:
    """Chained Törnqvist price index over an (item, period) panel —
    the superlative index the reference's econ family (chain/fishvol,
    ``formulas_generator.py:613-620``) stops short of: a
    share-weighted geometric mean of matched-item price relatives,
    exact for translog preferences (Diewert 1976).

    Per consecutive period pair (t-1, t) and the MATCHED item set
    (present in both periods):

    * shares   s_{i,t} = v_{i,t} / Σ_matched v_{·,t}  (and s_{i,t-1})
    * link     ln L_t = Σ_i ½(s_{i,t-1} + s_{i,t}) · ln(p_{i,t}/p_{i,t-1})
    * level    T_t = 100 · exp(Σ_{s ≤ t} ln L_s),  first period = 100.

    Matching requires t_prev == t-1 (an item re-entering after a gap
    contributes nothing that period — no spurious multi-period
    relatives).  Cross-engine exactness: the per-period log link is a
    decimal(38,18) sum rounded to 12 dp, and the cumulative sum runs
    over decimals, so ``exp`` sees bit-identical arguments in any
    partitioning and in the DuckDB oracle.

    Scale shape: one lag window partitioned by item, two share
    windows partitioned by period, one bounded groupBy(period), and a
    final single-partition cumsum over #periods rows (dozens, not
    data-sized).  No shuffle touches row-level data more than once.

    Output: one row per period ``(t_col, n_items, tq_index)``.
    """
    wi = Window.partitionBy(item_col).orderBy(t_col)
    lagged = panel.select(
        F.col(item_col).alias("__it"),
        F.col(t_col).alias("__t"),
        F.col(price_col).cast("double").alias("__p"),
        F.col(value_col).cast("double").alias("__v"),
        F.lag(t_col, 1).over(wi).alias("__tprev"),
        F.lag(price_col, 1).over(wi).cast("double").alias("__pprev"),
        F.lag(value_col, 1).over(wi).cast("double").alias("__vprev"),
    )
    matched = lagged.where(
        (F.col("__tprev") == F.col("__t") - 1)
        & F.col("__pprev").isNotNull()
        & (F.col("__pprev") > 0)
        & (F.col("__p") > 0)
    )
    wt = Window.partitionBy("__t")
    shared = matched.select(
        "__t",
        (
            F.lit(0.5)
            * (
                F.col("__vprev")
                / F.sum(F.col("__vprev").cast("decimal(38,12)"))
                .over(wt)
                .cast("double")
                + F.col("__v")
                / F.sum(F.col("__v").cast("decimal(38,12)"))
                .over(wt)
                .cast("double")
            )
            * F.log(F.col("__p") / F.col("__pprev"))
        ).alias("__term"),
    )
    links = shared.groupBy("__t").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(
            F.sum(F.col("__term").cast("decimal(38,18)")).cast("double"),
            12,
        ).alias("__lnl"),
    )
    periods = panel.select(F.col(t_col).alias("__t")).distinct()
    wc = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        periods.join(links, on="__t", how="left")
        .withColumn(
            "__cum",
            F.sum(
                F.coalesce(F.col("__lnl"), F.lit(0.0)).cast(
                    "decimal(28,16)"
                )
            ).over(wc),
        )
        .select(
            F.col("__t").alias(t_col),
            F.coalesce(F.col("n_items"), F.lit(0)).cast("long").alias(
                "n_items"
            ),
            F.round(
                F.lit(100.0) * F.exp(F.col("__cum").cast("double")), 6
            ).alias("tq_index"),
        )
    )
    return out


def growth_contributions(
    panel: DataFrame,
    *,
    entity_col: str = "entity",
    t_col: str = "midx",
    value_col: str = "v",
) -> DataFrame:
    """Additive contribution-to-growth decomposition — the standard
    national-accounts readout (who drove this period's growth):
    ``contrib_{i,t} = (v_{i,t} − v_{i,t−1}) / V_{t−1}`` with
    ``V = Σ_i v``; both V's are computed over the MATCHED entity set
    (present in t−1 and t with consecutive period index), so the
    per-entity contributions sum EXACTLY to the reported
    ``total_growth`` by construction — an entity appearing or
    vanishing mid-series narrows the matched set rather than silently
    breaking the additivity the decomposition exists to provide.

    Cross-engine exactness: period totals are decimal(38,12) sums, so
    V_t is bit-identical in any partitioning and in the oracle.

    Scale shape: one lag window per entity, one total window per
    period — both shuffle the (entity × period) frame the caller
    already aggregated, never raw rows.

    Output: ``(t_col, entity_col, value, contrib, total_growth)``,
    one row per (period, entity) with a complete previous period.
    """
    we = Window.partitionBy(entity_col).orderBy(t_col)
    lagged = panel.select(
        F.col(entity_col).alias("__e"),
        F.col(t_col).alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
        F.lag(t_col, 1).over(we).alias("__tprev"),
        F.lag(value_col, 1).over(we).cast("double").alias("__vprev"),
    ).where(F.col("__tprev") == F.col("__t") - 1)
    wt = Window.partitionBy("__t")
    tot = lagged.select(
        "__e",
        "__t",
        "__v",
        "__vprev",
        F.sum(F.col("__v").cast("decimal(38,12)"))
        .over(wt)
        .cast("double")
        .alias("__tot_v"),
        F.sum(F.col("__vprev").cast("decimal(38,12)"))
        .over(wt)
        .cast("double")
        .alias("__tot_vprev"),
    )
    return tot.select(
        F.col("__t").alias(t_col),
        F.col("__e").alias(entity_col),
        F.round(F.col("__v"), 6).alias("value"),
        F.round(
            (F.col("__v") - F.col("__vprev")) / F.col("__tot_vprev"), 6
        ).alias("contrib"),
        F.round(
            (F.col("__tot_v") - F.col("__tot_vprev"))
            / F.col("__tot_vprev"),
            6,
        ).alias("total_growth"),
    )


def elementary_price_indices(
    df: DataFrame,
    *,
    group_col: str,
    item_col: str,
    period_col: str,
    price_col: str,
) -> DataFrame:
    """Elementary (unweighted) price indices per group and adjacent
    period pair — the lowest level of a CPI aggregation, where no
    expenditure weights exist yet (ILO CPI manual ch. 20):

        Jevons  J = exp(mean ln(p_t/p_{t-1}))   (geometric — the
                    standard, transitive, no formula bias)
        Dutot   D = mean(p_t) / mean(p_{t-1})
        Carli   C = mean(p_t / p_{t-1})          (arithmetic — upward
                    biased; C >= J always, the gap IS the dispersion)

    over the MATCHED sample (items priced in both periods).  The
    C−J gap per period is the chain-drift early warning the
    aggregate Törnqvist/Fisher pair (x291/s13) can't see at their
    level.  Log ratios pin at 6 dp before the decimal-exact fold
    (the shared-libm x-ln discipline); means of matched prices are
    decimal-exact.

    Output: ``(group, period, n_matched, jevons, dutot, carli)`` at
    6 dp, ordered by (group, period); periods with no matched items
    emit nothing.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(item_col).alias("i"),
        F.col(period_col).cast("long").alias("t"),
        F.col(price_col).cast("double").alias("p"),
    ).where(F.col("p").isNotNull() & (F.col("p") > 0))
    prev = base.select(
        "g", "i", (F.col("t") + 1).alias("t"),
        F.col("p").alias("p0"),
    )
    matched = base.join(prev, ["g", "i", "t"])
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    lr = r6(F.log(F.col("p") / F.col("p0")))
    rr = r6(F.col("p") / F.col("p0"))
    agg = matched.groupBy("g", "t").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        dec(lr).alias("slr"),
        dec(rr).alias("srr"),
        dec(F.col("p")).alias("sp"),
        dec(F.col("p0")).alias("sp0"),
    )
    n = F.col("n_matched").cast("double")
    return agg.select(
        F.col("g").alias("group"),
        F.col("t").alias("period"),
        "n_matched",
        r6(F.exp(F.col("slr") / n)).alias("jevons"),
        r6(
            F.col("sp") / F.when(F.col("sp0") > 0, F.col("sp0"))
        ).alias("dutot"),
        r6(F.col("srr") / n).alias("carli"),
    ).orderBy("group", "period")


def ols_reconcile_one_level(
    bottom: "DataFrame",
    *,
    series_col: str,
    yhat_col: str,
    top_yhat,
) -> "DataFrame":
    """One-level hierarchical forecast reconciliation (Hyndman et al.
    2011, OLS / MinT-identity): bottom-series forecasts plus an
    independently-made total forecast rarely cohere; the OLS
    projection onto the coherent subspace has, for k bottom series
    under S = [I_k; 1'], the Sherman-Morrison CLOSED FORM

        b̃_i = ŷ_i + (ŷ_top − Σ_j ŷ_j) / (k + 1)

    — the aggregate discrepancy distributes equally, and the
    reconciled total is exactly Σ b̃ (coherence by construction, no
    matrix literals, no solver).  This is the statistical-agency /
    demand-planning primitive for publishing internally consistent
    forecasts.

    Scale shape: ONE aggregate over the bottom frame (broadcast
    back), map-side algebra; at 100 TB reconcile per hierarchy node
    by keying the aggregate on the parent.  Exactness: Σŷ through
    decimal(27,6); the shared closed-form expression evaluates
    identically in the SQL oracle.

    Output: ``(series, yhat, reconciled, adjustment)`` plus one
    ``__total__`` row carrying (ŷ_top, Σb̃, ŷ_top − Σŷ).
    """
    top = float(top_yhat)
    base = bottom.select(
        F.col(series_col).cast("string").alias("series"),
        F.col(yhat_col).cast("double").alias("yhat"),
    )
    tot = base.agg(
        F.sum(F.col("yhat").cast("decimal(27,6)"))
        .cast("double")
        .alias("sum_y"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    adj = (F.lit(top) - F.col("sum_y")) / (F.col("k") + 1)
    recon = (
        base.crossJoin(F.broadcast(tot))
        .select(
            "series",
            r6(F.col("yhat")).alias("yhat"),
            r6(F.col("yhat") + adj).alias("reconciled"),
            r6(adj).alias("adjustment"),
        )
    )
    total_row = tot.select(
        F.lit("__total__").alias("series"),
        r6(F.lit(top)).alias("yhat"),
        r6(
            F.col("sum_y")
            + (F.lit(top) - F.col("sum_y"))
            * F.col("k")
            / (F.col("k") + 1)
        ).alias("reconciled"),
        r6(F.lit(top) - F.col("sum_y")).alias("adjustment"),
    )
    return recon.unionByName(total_row).orderBy("series")
