"""Frequency conversion (FAME ``convert``) — Spark-native resampler.

Reference surface: ``/root/reference/fame2pygen/formulas_generator.py:154-218``
(argument space) and ``fame2py_converter.py:283-409`` (frequency-bridge
codegen); the actual math lives in the closed ``polars_econ`` package
(mocked at ``polars_econ_mock.py:13-36``), so the semantics here are our
published definition:

Downsampling (target coarser than source)
    one ``groupBy(period_start)`` aggregation; the *observed* convention
    picks the aggregate: average→avg, sum→sum, first/beginning→value at
    earliest date, last/end→value at latest date, high→max, low→min.
    Map-side partial aggregation means a single shuffle keyed by the
    period bucket — at 100 TB this is the minimal-shuffle plan, and the
    bucket key is dense/ordered so AQE coalesces post-shuffle partitions.

Upsampling (target finer than source)
    a lazily-generated target calendar (``sequence`` + ``explode`` —
    no driver collect) left-joined with the source, then the
    *technique* fills gaps: constant/discrete → forward-fill
    (``last(ignorenulls)`` over an unbounded-preceding window), linear →
    slope interpolation between the surrounding observations, cubic →
    not implemented (raises).  The calendar frame is tiny relative to
    data (one row per target period) so Catalyst broadcast-joins it.

Business frequency
    daily grid filtered to Mon–Fri (``dayofweek BETWEEN 2 AND 6``);
    holiday calendars can be layered with an anti-join if supplied.

Output column naming follows the reference's suffix table
(``formulas_generator.py:58-65``): SOURCE + ``_DD/_BUSD/_WK/_MON/_QTRLY/_ANN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..parser.grammar import FREQ_INFO, ConvertMeta

#: interval step per canonical frequency for calendar generation
_INTERVAL = {
    "daily": "interval 1 day",
    "business": "interval 1 day",
    "weekly": "interval 7 day",
    "monthly": "interval 1 month",
    "quarterly": "interval 3 month",
    "annual": "interval 1 year",
}

_WEEKDAY_INDEX = {  # Spark dayofweek(): Sunday=1 … Saturday=7
    "sunday": 1, "monday": 2, "tuesday": 3, "wednesday": 4,
    "thursday": 5, "friday": 6, "saturday": 7,
}


def freq_ordinal(freq: str) -> int:
    """Fineness ordinal: annual=1 … daily=6.  Bigger = finer."""
    info = FREQ_INFO.get(freq)
    if info is None:
        raise ValueError(f"unknown frequency {freq!r}")
    return info[1]


def period_start(date_col, freq: str, start_by: str | None = None):
    """Column expr: start date of the *freq* period containing date_col."""
    d = F.to_date(date_col)
    if freq == "annual":
        return F.date_trunc("year", d).cast("date")
    if freq == "quarterly":
        return F.date_trunc("quarter", d).cast("date")
    if freq == "monthly":
        return F.date_trunc("month", d).cast("date")
    if freq == "weekly":
        idx = _WEEKDAY_INDEX.get((start_by or "monday").lower(), 2)
        return F.date_sub(d, (F.dayofweek(d) - F.lit(idx) + F.lit(7)) % F.lit(7))
    if freq in ("daily", "business"):
        return d
    raise ValueError(f"unknown frequency {freq!r}")


def business_day_filter(date_col):
    """Mon–Fri predicate — Spark has no ``is_business_day`` (the
    reference uses Polars' ``dt.is_business_day()``,
    ``fame2py_converter.py:402``)."""
    return F.dayofweek(date_col).between(2, 6)


def exclude_holidays(
    df: DataFrame, holidays: DataFrame, *, date_col: str = "DATE"
) -> DataFrame:
    """Drop rows on holiday dates via a broadcast anti-join.

    *holidays* is a one-column frame of dates (any column name — the
    first column is used).  Holiday tables are small and static, so the
    anti-join broadcasts: no shuffle of the data side at any scale.
    """
    hcol = holidays.columns[0]
    h = F.broadcast(holidays.select(F.col(hcol).cast("date").alias("__h")))
    return df.join(
        h, on=F.col(date_col) == F.col("__h"), how="left_anti"
    )


_OBSERVED_AGG = {
    "average": lambda v, d: F.avg(v),
    "sum": lambda v, d: F.sum(v),
    "first": lambda v, d: F.min_by(v, d),
    "beginning": lambda v, d: F.min_by(v, d),
    "last": lambda v, d: F.max_by(v, d),
    "end": lambda v, d: F.max_by(v, d),
    "high": lambda v, d: F.max(v),
    "low": lambda v, d: F.min(v),
    # annualized ≈ average here; documented divergence (reference math is
    # closed-source polars_econ)
    "annualized": lambda v, d: F.avg(v),
    # FAME's observed=formula delegates to a user-supplied aggregation;
    # the reference accepts the spelling as a first-class convention
    # (formulas_generator.py:114) but its math lives in closed
    # polars_econ.  Documented engine semantics: geometric mean of the
    # in-period observations — the conventional formula-observed choice
    # for index/ratio series — with null when any observation is
    # non-positive (log domain), matching the null-propagation style of
    # the other conventions.  The log sum goes through decimal(28,18)
    # (the corr_pairs moment idiom) so the mean is accumulation-order
    # insensitive: a double Σln differs across engines/partitionings by
    # an ulp that can straddle the 6-dp ROUND boundary after exp().
    "formula": lambda v, d: F.when(F.min(v) <= 0, F.lit(None)).otherwise(
        F.exp(
            F.sum(F.when(v > 0, F.log(v)).cast("decimal(28,18)")).cast(
                "double"
            )
            / F.count(F.when(v > 0, v))
        )
    ),
}


def _modal_gap_frame(
    df: DataFrame, date_col: str, entity_cols: tuple[str, ...]
) -> DataFrame:
    """(g, count) ordered by modal-first — the plan behind
    :func:`infer_frequency`, split out so tests can assert its shape."""
    if entity_cols:
        w = Window.partitionBy(*entity_cols).orderBy(date_col)
    else:
        # wide mode: one series per frame — bounded by the calendar, so
        # the single-partition sort is a few thousand rows at most
        w = Window.orderBy(date_col)
    return (
        df.select(F.datediff(F.col(date_col), F.lag(date_col, 1).over(w)).alias("g"))
        .where(F.col("g").isNotNull())
        .groupBy("g")
        .count()
        .orderBy(F.desc("count"), F.asc("g"))
    )


def infer_frequency(
    df: DataFrame,
    date_col: str = "DATE",
    entity_cols: tuple[str, ...] = (),
) -> str:
    """Infer the frame's native frequency from the modal date gap.

    Driver action on a two-column aggregate — O(rows) scan, tiny result.
    With *entity_cols* the lag window partitions per entity (gaps are
    only meaningful within a series) and the mode is taken over all
    per-entity gaps — no single-partition global sort ever runs on a
    panel frame.  Ties break toward the smaller gap, deterministically.
    """
    gaps = _modal_gap_frame(df, date_col, entity_cols).limit(1).collect()
    if not gaps:
        return "monthly"
    gap = gaps[0]["g"]
    if gap <= 1:
        return "daily"
    if gap <= 5:
        return "business"
    if gap <= 7:
        return "weekly"
    if gap <= 31:
        return "monthly"
    if gap <= 92:
        return "quarterly"
    return "annual"


def convert_series(
    df: DataFrame,
    meta: ConvertMeta,
    date_col: str = "DATE",
    source_freq: str | None = None,
    entity_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Convert one series to *meta.target_freq*.

    Returns a frame ``[*entity_cols, date_col, meta.out_column]`` on the
    target calendar, ready to be full-outer-joined back onto the wide
    frame (reference joins at ``fame2py_converter.py:409``).
    """
    from ..parser.expressions import column_name

    src_col = column_name(meta.source)
    out_col = meta.out_column
    target = meta.target_freq
    if target not in FREQ_INFO:
        raise ValueError(f"convert: unknown target frequency {target!r}")

    if source_freq is None:
        source_freq = infer_frequency(df, date_col, entity_cols)

    src_ord = freq_ordinal(source_freq)
    tgt_ord = freq_ordinal(target)

    keys = [*entity_cols, date_col]
    base = df.select(*entity_cols, date_col, F.col(src_col).alias(out_col)).where(
        F.col(out_col).isNotNull()
    )

    if tgt_ord == src_ord:
        return base.select(*keys, out_col)

    if tgt_ord < src_ord:
        return _downsample(base, out_col, target, meta, date_col, entity_cols)
    return _upsample(base, out_col, target, meta, date_col, entity_cols)


def convert_series_multi(
    df: DataFrame,
    metas: list[ConvertMeta],
    date_col: str = "DATE",
    source_freq: str | None = None,
    entity_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Convert a GROUP of series sharing (target_freq, technique,
    observed, start_by) in one pass — the reference's frequency-bridge
    batching (``fame2py_converter.py:283-301``) done properly for
    Spark: one groupBy (downsample) or one calendar join + window fills
    (upsample) for the whole group, instead of one aggregation + join
    per series.

    Returns ``[*entity_cols, date_col, out_col…]``.  Semantics match
    per-series :func:`convert_series` exactly: null-skipping aggregates
    via null-keyed ``min_by``/``max_by``, and per-series calendar
    bounds so no series is filled beyond its own observed range.
    """
    from ..parser.expressions import column_name

    if len(metas) == 1:
        return convert_series(
            df, metas[0], date_col=date_col, source_freq=source_freq,
            entity_cols=entity_cols,
        )
    head = metas[0]
    target = head.target_freq
    if target not in FREQ_INFO:
        raise ValueError(f"convert: unknown target frequency {target!r}")
    if source_freq is None:
        source_freq = infer_frequency(df, date_col, entity_cols)
    src_ord, tgt_ord = freq_ordinal(source_freq), freq_ordinal(target)
    pairs = [(column_name(m.source), m.out_column) for m in metas]

    base = df.select(
        *entity_cols, date_col,
        *[F.col(s).alias(o) for s, o in pairs],
    )

    if tgt_ord == src_ord:
        return base

    d = F.col(date_col)
    if tgt_ord < src_ord:
        if target == "business":
            return base.where(business_day_filter(d))
        observed = head.observed or "average"
        nn_key = {o: F.when(F.col(o).isNotNull(), d) for _, o in pairs}
        agg_multi = {
            "average": lambda o: F.avg(o),
            "sum": lambda o: F.sum(o),
            "first": lambda o: F.min_by(o, nn_key[o]),
            "beginning": lambda o: F.min_by(o, nn_key[o]),
            "last": lambda o: F.max_by(o, nn_key[o]),
            "end": lambda o: F.max_by(o, nn_key[o]),
            "high": lambda o: F.max(o),
            "low": lambda o: F.min(o),
            "annualized": lambda o: F.avg(o),
            # geometric mean via order-insensitive decimal log sums;
            # MUST stay formula-identical to _OBSERVED_AGG["formula"]
            # (the bridge test compares batched vs single bit-for-bit)
            "formula": lambda o: F.when(
                F.min(o) <= 0, F.lit(None)
            ).otherwise(
                F.exp(
                    F.sum(
                        F.when(F.col(o) > 0, F.log(o)).cast("decimal(28,18)")
                    ).cast("double")
                    / F.count(F.when(F.col(o) > 0, F.col(o)))
                )
            ),
        }.get(observed)
        if agg_multi is None:
            raise ValueError(f"convert: unknown observed convention {observed!r}")
        bucket = period_start(d, target, head.start_by).alias(date_col)
        return base.groupBy(*entity_cols, bucket).agg(
            *[agg_multi(o).alias(o) for _, o in pairs]
        )

    # upsample: shared calendar over the union range, per-series masks
    bound_aggs = [F.min(d).alias("__lo"), F.max(d).alias("__hi")]
    for _, o in pairs:
        nn = F.when(F.col(o).isNotNull(), d)
        bound_aggs += [F.min(nn).alias(f"__lo_{o}"), F.max(nn).alias(f"__hi_{o}")]
    bounds = _align_weekly_lo(
        base.groupBy(*entity_cols).agg(*bound_aggs), target, head.start_by
    )
    step = _INTERVAL[target]
    calendar = bounds.select(
        *entity_cols,
        *[F.col(c) for c in bounds.columns if c.startswith("__lo_") or c.startswith("__hi_")],
        F.explode(F.expr(f"sequence(__lo, __hi, {step})")).alias(date_col),
    )
    if target == "business":
        calendar = calendar.where(business_day_filter(d))
    joined = calendar.join(base, on=[*entity_cols, date_col], how="left")

    technique = head.technique or "constant"
    outs = []
    for _, o in pairs:
        single = _fill_one(joined, o, technique, date_col, entity_cols)
        masked = F.when(
            d.between(F.col(f"__lo_{o}"), F.col(f"__hi_{o}")), single
        )
        outs.append(masked.alias(o))
    return joined.select(*entity_cols, date_col, *outs)


def _fill_one(
    joined: DataFrame,
    out_col: str,
    technique: str,
    date_col: str,
    entity_cols: tuple[str, ...],
):
    """Gap-fill Column for one series on the shared calendar frame
    (constant/discrete forward fill or linear interpolation; cubic goes
    through the per-series path)."""
    w_past = (
        Window.partitionBy(*entity_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if technique in ("constant", "discrete"):
        return F.last(out_col, ignorenulls=True).over(w_past)
    if technique == "linear":
        w_future = (
            Window.partitionBy(*entity_cols)
            .orderBy(date_col)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        known_date = F.when(F.col(out_col).isNotNull(), F.col(date_col))
        prev_v = F.last(out_col, ignorenulls=True).over(w_past)
        prev_d = F.last(known_date, ignorenulls=True).over(w_past)
        next_v = F.first(out_col, ignorenulls=True).over(w_future)
        next_d = F.first(known_date, ignorenulls=True).over(w_future)
        span = F.datediff(next_d, prev_d)
        frac = F.datediff(F.col(date_col), prev_d) / span
        return (
            F.when(F.col(out_col).isNotNull(), F.col(out_col))
            .when(
                prev_v.isNotNull() & next_v.isNotNull() & (span > 0),
                prev_v + (next_v - prev_v) * frac,
            )
            .otherwise(F.lit(None))
        )
    raise ValueError(f"convert: technique {technique!r} not groupable")


def _downsample(
    base: DataFrame,
    out_col: str,
    target: str,
    meta: ConvertMeta,
    date_col: str,
    entity_cols: tuple[str, ...],
) -> DataFrame:
    # daily → business is a pure filter, not an aggregation
    if target == "business":
        return base.where(business_day_filter(F.col(date_col))).select(
            *entity_cols, date_col, out_col
        )
    observed = meta.observed or "average"
    agg_fn = _OBSERVED_AGG.get(observed)
    if agg_fn is None:
        raise ValueError(f"convert: unknown observed convention {observed!r}")
    bucket = period_start(F.col(date_col), target, meta.start_by).alias(date_col)
    return (
        base.groupBy(*entity_cols, bucket)
        .agg(agg_fn(F.col(out_col), F.col(date_col)).alias(out_col))
    )


def _align_weekly_lo(bounds: DataFrame, target: str, start_by: str | None):
    """Shift a weekly upsample calendar's start forward to the
    requested weekday (``w(wed)`` grids must land on Wednesdays)."""
    if target != "weekly" or not start_by:
        return bounds
    idx = _WEEKDAY_INDEX.get(start_by.lower(), 2)
    shift = (F.lit(idx) - F.dayofweek("__lo") + F.lit(7)) % F.lit(7)
    return bounds.withColumn("__lo", F.date_add(F.col("__lo"), shift))


def _upsample(
    base: DataFrame,
    out_col: str,
    target: str,
    meta: ConvertMeta,
    date_col: str,
    entity_cols: tuple[str, ...],
) -> DataFrame:
    technique = meta.technique or "constant"

    # lazily build the target calendar spanning the source range — one
    # row per target period, no driver collect
    bounds = base.groupBy(*entity_cols).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    bounds = _align_weekly_lo(bounds, target, meta.start_by)
    step = _INTERVAL[target]
    calendar = bounds.select(
        *entity_cols,
        F.explode(F.expr(f"sequence(__lo, __hi, {step})")).alias(date_col),
    )
    if target == "business":
        calendar = calendar.where(business_day_filter(F.col(date_col)))

    if technique == "cubic":
        # neighbor knots computed on the (small) knot frame before the
        # calendar join, then window-filled onto calendar rows
        wk = Window.partitionBy(*entity_cols).orderBy(date_col)
        base = base.select(
            *entity_cols, date_col, out_col,
            F.lag(out_col).over(wk).alias("__v_m1"),
            F.lag(date_col).over(wk).alias("__d_m1"),
            F.lead(out_col).over(wk).alias("__v_p1"),
            F.lead(date_col).over(wk).alias("__d_p1"),
        )

    joined = calendar.join(base, on=[*entity_cols, date_col], how="left")

    w_past = (
        Window.partitionBy(*entity_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    if technique in ("constant", "discrete"):
        filled = F.last(out_col, ignorenulls=True).over(w_past)
        return joined.select(*entity_cols, date_col, filled.alias(out_col))

    if technique == "linear":
        w_future = (
            Window.partitionBy(*entity_cols)
            .orderBy(date_col)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        known_date = F.when(F.col(out_col).isNotNull(), F.col(date_col))
        prev_v = F.last(out_col, ignorenulls=True).over(w_past)
        prev_d = F.last(known_date, ignorenulls=True).over(w_past)
        next_v = F.first(out_col, ignorenulls=True).over(w_future)
        next_d = F.first(known_date, ignorenulls=True).over(w_future)
        span = F.datediff(next_d, prev_d)
        frac = F.datediff(F.col(date_col), prev_d) / span
        interp = (
            F.when(F.col(out_col).isNotNull(), F.col(out_col))
            .when(
                prev_v.isNotNull() & next_v.isNotNull() & (span > 0),
                prev_v + (next_v - prev_v) * frac,
            )
            .otherwise(F.lit(None))
        )
        return joined.select(*entity_cols, date_col, interp.alias(out_col))

    if technique == "cubic":
        return _cubic_interp(joined, out_col, date_col, entity_cols)

    raise ValueError(f"convert: unknown technique {technique!r}")


def _cubic_interp(
    joined: DataFrame,
    out_col: str,
    date_col: str,
    entity_cols: tuple[str, ...],
) -> DataFrame:
    """Piecewise cubic Hermite (Catmull-Rom with finite-difference
    tangents on non-uniform knots).

    The reference's cubic lives in closed-source ``polars_econ``
    (mock returns the input, ``polars_econ_mock.py:13-36``), so this is
    our published definition: passes through every knot, C¹ at interior
    knots, falls back to the secant slope at the boundary knots.  Pure
    column algebra — two window fills carrying knot structs.
    """
    w_past = (
        Window.partitionBy(*entity_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_future = (
        Window.partitionBy(*entity_cols)
        .orderBy(date_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    knot = F.when(
        F.col(out_col).isNotNull(),
        F.struct(
            F.col(date_col).alias("d"), F.col(out_col).alias("v"),
            F.col("__d_m1").alias("dm"), F.col("__v_m1").alias("vm"),
            F.col("__d_p1").alias("dp"), F.col("__v_p1").alias("vp"),
        ),
    )
    k1 = F.last(knot, ignorenulls=True).over(w_past)
    k2 = F.first(knot, ignorenulls=True).over(w_future)

    x, x1, x2 = F.col(date_col), k1["d"], k2["d"]
    v1, v2 = k1["v"], k2["v"]
    h = F.datediff(x2, x1).cast("double")
    t = F.try_divide(F.datediff(x, x1).cast("double"), h)

    # tangents: centered finite difference where a neighbor knot exists,
    # else the secant slope of the bracketing interval
    secant = F.try_divide(v2 - v1, h)
    m1 = F.when(
        k1["dm"].isNotNull(),
        F.try_divide(v2 - k1["vm"], F.datediff(x2, k1["dm"]).cast("double")),
    ).otherwise(secant)
    m2 = F.when(
        k2["dp"].isNotNull(),
        F.try_divide(k2["vp"] - v1, F.datediff(k2["dp"], x1).cast("double")),
    ).otherwise(secant)

    t2, t3 = t * t, t * t * t
    hermite = (
        (F.lit(2) * t3 - F.lit(3) * t2 + F.lit(1)) * v1
        + (t3 - F.lit(2) * t2 + t) * h * m1
        + (F.lit(-2) * t3 + F.lit(3) * t2) * v2
        + (t3 - t2) * h * m2
    )
    interp = (
        F.when(F.col(out_col).isNotNull(), F.col(out_col))
        .when(v1.isNotNull() & v2.isNotNull() & (h > 0), hermite)
        .otherwise(F.lit(None))
    )
    return joined.select(*entity_cols, date_col, interp.alias(out_col))
