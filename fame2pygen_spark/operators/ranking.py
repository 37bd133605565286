"""Windowed ranking / empirical-CDF operators.

ANSI analytic functions over per-group value orderings —
``percent_rank`` (rank-1)/(n-1), ``cume_dist`` (empirical CDF), and
decile assignment.  All three have identical definitions in Spark and
DuckDB, so results are oracle-checkable value-for-value.

Scale shape: one shuffle on the group key; within a group the sort is
the cost (Spark's window sort spills gracefully).  ``percent_rank`` and
``cume_dist`` are tie-stable (equal values share a rank); ``ntile``
depends on row ORDER, so the ordering includes a caller-supplied
unique tie-break column — without it decile boundaries would be
nondeterministic across engines and across runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["group_ranks"]


def group_ranks(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    *,
    buckets: int = 10,
) -> DataFrame:
    """Append ``pct_rank`` ((rank−1)/(n−1), 6 dp), ``cdf``
    (``cume_dist``, 6 dp) and ``bucket`` (``ntile(buckets)``) of
    *value_col* within each *group_cols* group, ordered by
    ``(value, tiebreak)``.  Null values sort first (ANSI default) and
    receive ranks like any other value.
    """
    if buckets < 1:
        raise ValueError("buckets must be positive")
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc(), F.col(tiebreak_col).asc()
    )
    # percent_rank / cume_dist tie-groups are defined by the FULL order
    # key; restrict them to the value alone so equal values share ranks
    wv = Window.partitionBy(*group_cols).orderBy(F.col(value_col).asc())
    return df.withColumns(
        {
            "pct_rank": F.round(F.percent_rank().over(wv), 6),
            "cdf": F.round(F.cume_dist().over(wv), 6),
            "bucket": F.ntile(buckets).over(w).cast("long"),
        }
    )


def pareto_frontier_2d(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    maximize_col: str,
    minimize_col: str,
) -> DataFrame:
    """Per-group 2-D Pareto frontier (skyline): rows not dominated by
    any other row of the group — no other row is simultaneously >= on
    *maximize_col* and <= on *minimize_col* with at least one strict
    ("largest part at every price point").

    Spark-first formulation, NO pairwise dominance join (the naive
    NOT EXISTS plans O(n²)):

    1. reduce to one candidate per distinct maximize-value — the
       group's min *minimize_col* there (anything above that min at
       the same maximize-value is dominated);
    2. over the per-group distinct-value frame (bounded by |distinct
       maximize values|, not rows), sort maximize desc and keep
       candidates whose minimize value strictly undercuts the running
       minimum of everything sorted before — a single keyed window;
    3. semi-join the frontier (maximize, minimize) points back to
       recover all co-equal rows (exact ties are mutually
       non-dominated and all survive).

    Two keyed shuffles + one bounded window; the full table is never
    self-joined.  Returns the frontier rows with original columns.
    """
    groups = list(group_cols)
    per_x = df.groupBy(*groups, maximize_col).agg(
        F.min(minimize_col).alias("__besty")
    )
    wd = (
        Window.partitionBy(*groups)
        .orderBy(F.col(maximize_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    front = per_x.withColumn(
        "__prior", F.min("__besty").over(wd)
    ).where(
        F.col("__prior").isNull() | (F.col("__besty") < F.col("__prior"))
    )
    return df.join(
        front.select(*groups, maximize_col, "__besty"),
        on=[*groups, maximize_col],
    ).where(F.col(minimize_col) == F.col("__besty")).drop("__besty")
