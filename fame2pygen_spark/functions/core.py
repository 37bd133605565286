"""Core column-algebra helpers shared across the engine.

Everything here is pure ``pyspark.sql.functions`` composition — JVM-side,
whole-stage-codegen friendly, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, functions as F


def ordered_window(date_col: str = "DATE", entity_cols: tuple[str, ...] = ()):
    return Window.partitionBy(*entity_cols).orderBy(date_col)


def full_window(date_col: str = "DATE", entity_cols: tuple[str, ...] = ()):
    return (
        Window.partitionBy(*entity_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )


def pct_change(col: Column, k: int = 1, *, date_col: str = "DATE",
               entity_cols: tuple[str, ...] = ()) -> Column:
    """FAME ``pct``: percent change vs k periods ago × 100
    (reference ``formulas_generator.py:1285-1292``)."""
    prev = F.lag(col, k).over(ordered_window(date_col, entity_cols))
    return F.try_divide(col - prev, prev) * F.lit(100)


def diff(col: Column, k: int = 1, *, date_col: str = "DATE",
         entity_cols: tuple[str, ...] = ()) -> Column:
    """First difference (reference ``formulas_generator.py:880``)."""
    return col - F.lag(col, k).over(ordered_window(date_col, entity_cols))


def lsum(*cols: Column) -> Column:
    """Null-safe sum — nulls count as 0 (reference LSUM helper,
    ``formulas_generator.py:1299-1307``)."""
    if not cols:
        return F.lit(0)
    out = F.coalesce(cols[0], F.lit(0))
    for c in cols[1:]:
        out = out + F.coalesce(c, F.lit(0))
    return out


def cumulative_product(col: Column, w) -> Column:
    """Cumulative product over window *w* via exp-sum-log with sign and
    zero handling (Spark has no cum_prod; see SURVEY §4 item 2).

    Nulls are skipped (treated as 1), matching ``sum``'s null handling;
    a zero anywhere in the prefix forces 0 from that row on; sign is
    tracked by counting negatives.
    """
    zeros = F.sum(F.when(col == 0, 1).otherwise(0)).over(w)
    negatives = F.sum(F.when(col < 0, 1).otherwise(0)).over(w)
    magnitude = F.exp(F.sum(F.log(F.abs(F.nullif(col, F.lit(0))))).over(w))
    sign = F.when(negatives % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.when(zeros > 0, F.lit(0.0)).otherwise(sign * magnitude)


def forward_fill(col: Column, *, date_col: str = "DATE",
                 entity_cols: tuple[str, ...] = ()) -> Column:
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return F.last(col, ignorenulls=True).over(w)


def first_value(col: Column, *, date_col: str = "DATE",
                entity_cols: tuple[str, ...] = ()) -> Column:
    """First non-null value of the series, broadcast to every row
    (reference FIRSTVALUE, ``formulas_generator.py:1314-1317``)."""
    return F.first(col, ignorenulls=True).over(full_window(date_col, entity_cols))


def last_value(col: Column, *, date_col: str = "DATE",
               entity_cols: tuple[str, ...] = ()) -> Column:
    """Last non-null value of the series (reference LASTVALUE,
    ``formulas_generator.py:1319-1322``)."""
    return F.last(col, ignorenulls=True).over(full_window(date_col, entity_cols))


def salted_agg(
    df,
    keys: list[str],
    aggs: dict[str, Column],
    *,
    salt_buckets: int = 16,
):
    """Two-stage aggregation for skewed keys: pre-aggregate on
    (key, salt) — spreading one hot key over *salt_buckets* reducers —
    then combine the partials on the key alone.

    Only valid for decomposable aggregates; the ``aggs`` mapping gives
    the PARTIAL expression per output name, and the combine stage picks
    the matching merge function by the partial's name prefix
    (``sum_``/``count_`` → sum, ``min_`` → min, ``max_`` → max).
    AQE's skew-join handling covers joins; this covers groupBys with a
    pathological key distribution (e.g. one user generating 30% of
    events) where even map-side combine leaves one reducer hot.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )

    def combine(name: str) -> Column:
        if name.startswith(("sum_", "count_", "n_")):
            return F.sum(name)
        if name.startswith("min_"):
            return F.min(name)
        if name.startswith("max_"):
            return F.max(name)
        raise ValueError(
            f"salted_agg: cannot infer combiner for {name!r}; use a "
            f"sum_/count_/n_/min_/max_ prefix"
        )

    return partial.groupBy(*keys).agg(
        *[combine(n).alias(n) for n in aggs]
    )


def last_observed_date(col: Column, *, date_col: str = "DATE",
                       entity_cols: tuple[str, ...] = ()) -> Column:
    """Real DATEOF(series, *, contain, end) semantics: the date of the
    last non-null observation (the reference stubs this with a sentinel,
    ``formulas_generator.py:1324-1338``)."""
    return F.max(
        F.when(col.isNotNull(), F.col(date_col))
    ).over(full_window(date_col, entity_cols))
