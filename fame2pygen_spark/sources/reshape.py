"""Wide ↔ long reshaping: the bridge between the reference's data model
and the scale layout.

The reference operates on ONE wide frame (DATE + one column per series,
SURVEY §1.1); the engine's 100 TB mode wants long format
``(entity, DATE, value)`` partitioned by entity.  These helpers move
between the two:

* ``wide_to_long`` — unpivot via the built-in ``melt`` (JVM-side
  generator, no shuffle; the output is ready for
  ``repartition(entity)`` + ``run_script(..., entity_cols=...)``)
* ``long_to_wide`` — pivot back for reference-parity consumption of a
  bounded series set (pivot requires the column list; pass it
  explicitly at scale to avoid the discovery pass)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def wide_to_long(
    df: DataFrame,
    series_cols: list[str],
    *,
    date_col: str = "DATE",
    entity_col: str = "SERIES",
    value_col: str = "VALUE",
) -> DataFrame:
    """Unpivot series columns into ``(date, entity, value)`` rows."""
    return df.melt(
        ids=[date_col],
        values=series_cols,
        variableColumnName=entity_col,
        valueColumnName=value_col,
    )


def long_to_wide(
    df: DataFrame,
    *,
    date_col: str = "DATE",
    entity_col: str = "SERIES",
    value_col: str = "VALUE",
    series: list[str] | None = None,
) -> DataFrame:
    """Pivot a long panel back to one column per series.

    Pass ``series`` explicitly when known — it skips the distinct-scan
    Spark otherwise runs to discover pivot values, and bounds the
    output width (a pivot over millions of entities is a modeling
    error, not a query).
    """
    p = df.groupBy(date_col).pivot(entity_col, series)
    return p.agg(F.first(value_col))


def pivot_table(
    df,
    row_cols,
    pivot_col: str,
    pivot_values,
    value_col: str | None = None,
    *,
    agg: str = "count",
):
    """Cross-tabulation with an EXPLICIT pivot-value list: one output
    column per value in *pivot_values* (``<pivot_col>_<value>``), one
    row per *row_cols* group.

    ``agg``: ``count`` (rows matching the pivot value) or ``sum`` (of
    *value_col*, decimal-cast for order-insensitive float stability).

    Passing the value list explicitly matters twice at scale: the
    output schema is static (no schema-inference pass over the data —
    Spark's ``pivot()`` without values runs a distinct job first), and
    the plan is a single hash aggregation with one conditional
    aggregate per column — no Expand, no second shuffle.  Unlisted
    pivot values are ignored (add an 'other' bucket explicitly if
    needed).
    """
    from pyspark.sql import functions as F

    row_cols = list(row_cols)
    cols = []
    for v in pivot_values:
        name = f"{pivot_col}_{v}"
        match = F.col(pivot_col) == v
        if agg == "count":
            c = F.sum(F.when(match, 1).otherwise(0)).cast("long")
        elif agg == "sum":
            c = F.round(
                F.sum(
                    F.when(match, F.col(value_col).cast("decimal(18,6)"))
                ).cast("double"),
                6,
            )
        else:
            raise ValueError(f"unsupported agg: {agg}")
        cols.append(c.alias(name))
    return df.groupBy(*row_cols).agg(*cols)
