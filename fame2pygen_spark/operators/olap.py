"""OLAP summary operators: hierarchical rollup / cube aggregation.

Classic multidimensional reporting over a star schema — subtotals at
every prefix of the dimension hierarchy (ROLLUP) or every dimension
subset (CUBE), computed in one pass.

Scale shape: Spark expands rollup/cube into a single Expand + hash
aggregation — one shuffle keyed by (grouping-set id, dims), NOT one
job per level; dimension tables join broadcast before the expansion so
the fact scan is the only large input.  Subtotal rows carry NULL in
the rolled-up dimensions plus an explicit ``grouping_id`` so they are
distinguishable from genuine NULL dimension values (the ANSI
GROUPING() semantics — engine-portable).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["rollup_summary", "cube_summary"]


def _summarize(
    grouped, measures: Mapping[str, Column], dims: Sequence[str]
) -> DataFrame:
    aggs = [c.alias(name) for name, c in measures.items()]
    return grouped.agg(
        F.grouping_id(*dims).cast("long").alias("grouping_id"), *aggs
    )


def rollup_summary(
    df: DataFrame,
    dims: Sequence[str],
    measures: Mapping[str, Column],
) -> DataFrame:
    """Hierarchical subtotals: one row per group at every prefix level
    of *dims* (full detail → per-first-dim → grand total).

    *measures* maps output column name → aggregate Column expression.
    Output: *dims* (NULL where rolled up) + ``grouping_id`` + measures.
    """
    dims = list(dims)
    return _summarize(df.rollup(*dims), measures, dims)


def cube_summary(
    df: DataFrame,
    dims: Sequence[str],
    measures: Mapping[str, Column],
) -> DataFrame:
    """Subtotals for EVERY subset of *dims* (2^n grouping sets) — same
    output contract as :func:`rollup_summary`."""
    dims = list(dims)
    return _summarize(df.cube(*dims), measures, dims)
