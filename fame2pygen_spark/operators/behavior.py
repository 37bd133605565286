"""User-behavior analytics over event tables: ordered funnels and
cohort retention.

Not present in the reference — north-star training/product-analytics
surface (the published formulations: ordered funnel via sequential
conditional minima, cohort retention via first-activity bucketing —
both standard SQL-era analytics, no proprietary semantics).

Scale shape: every aggregation and join in this module is keyed by the
user id — a uniform high-cardinality key — so each operator is a small
fixed number of co-partitioned user-keyed shuffles.  Event-type
filters sit directly on the scan (predicate pushdown), and the final
per-step / per-cohort outputs are tiny (≤ steps, ≤ cohorts×offsets
rows).  No driver-side actions, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["funnel_conversion", "cohort_retention", "event_transitions"]

#: one day in microseconds — the default cohort/retention bucket
DAY_US = 86_400_000_000


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion counts: one row per step —
    ``(step_idx, step, n_users, pct_of_first)``.

    A user reaches step *i* when an event of type ``steps[i]`` occurs
    strictly after their step *i-1* time (classic ordered-funnel
    semantics: step times are the sequential conditional minima —
    ``t1 = min ts of step-1 events``, ``t_i = min ts of step-i events
    with ts > t_{i-1}``).  With *within_us* set, every subsequent step
    must additionally land within that window of the user's funnel
    start (``ts - t1 <= within_us``).

    Plan shape: step 1 is one user-keyed groupBy over the type-filtered
    scan; each later step joins the reached-users frame (shrinking,
    user-keyed) with the next type-filtered event subset and reduces
    with a conditional min — all shuffles hash the same uniform user
    key, so AQE coalesces them and nothing is quadratic.  The final
    frame is a union of per-step single-row aggregates with a
    window-computed conversion ratio over ≤ len(steps) rows.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    user, ts = F.col(user_col), F.col(ts_col)

    reached = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("t1"))
        .withColumn("t_prev", F.col("t1"))
    )
    per_step = [reached]
    for step in steps[1:]:
        nxt = events.where(F.col(type_col) == step).select(
            user, ts.alias("__ts")
        )
        cond = F.col("__ts") > F.col("t_prev")
        if within_us is not None:
            cond = cond & (F.col("__ts") - F.col("t1") <= F.lit(within_us))
        reached = (
            reached.join(nxt, on=user_col)
            .groupBy(user_col)
            .agg(
                F.max("t1").alias("t1"),
                F.min(F.when(cond, F.col("__ts"))).alias("t_prev"),
            )
            .where(F.col("t_prev").isNotNull())
        )
        per_step.append(reached)

    counts = None
    for i, (step, frame) in enumerate(zip(steps, per_step), start=1):
        row = frame.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)

    w = Window.orderBy("step_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return counts.withColumn(
        "pct_of_first",
        F.round(
            F.try_divide(
                F.col("n_users").cast("double"),
                F.first("n_users").over(w).cast("double"),
            ),
            6,
        ),
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    offsets: Sequence[int] = (0, 1, 7),
    bucket_us: int = DAY_US,
) -> DataFrame:
    """Cohort retention matrix: ``(cohort_day, day_offset, n_active,
    n_cohort, retention)``.

    Users are cohorted by the bucket (default: day) of their first
    event; ``n_active`` counts cohort members with any activity exactly
    *offset* buckets later, ``retention`` is the ratio to cohort size.

    Plan shape: distinct ``(user, day)`` activity is one user+day-keyed
    reduce; the cohort (min day per user) is a user-keyed reduce over
    that already-reduced frame; the activity↔cohort join is
    co-partitioned on the user key.  The remaining aggregations group
    by ``(cohort_day, offset)`` / ``cohort_day`` — tiny result sets.
    Offsets filter before the final shuffle, so state is bounded by
    cohorts × |offsets|.
    """
    day = (F.col(ts_col) - (F.col(ts_col) % F.lit(bucket_us))) / F.lit(
        bucket_us
    )
    activity = events.select(
        F.col(user_col).alias("user"), day.cast("long").alias("day")
    ).distinct()
    cohort = activity.groupBy("user").agg(F.min("day").alias("cohort_day"))

    per = (
        activity.join(cohort, on="user")
        .withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .where(F.col("day_offset").isin(*[int(o) for o in offsets]))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("n_cohort")
    )
    return per.join(sizes, on="cohort_day").withColumn(
        "retention",
        F.round(
            F.try_divide(
                F.col("n_active").cast("double"),
                F.col("n_cohort").cast("double"),
            ),
            6,
        ),
    )


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str | None = "event_id",
) -> DataFrame:
    """First-order path transitions: for each consecutive event pair in
    a user's timeline, ``(from_type, to_type, n, p)`` where ``p`` is
    the row-normalized transition probability (the empirical Markov
    chain over event types).

    Plan shape: one user-keyed window (``lag`` over the per-user
    timeline — the single shuffle), then an aggregation to the
    |types|² transition matrix, which is tiny; the normalizing row sum
    is a window over that tiny frame.  *id_col* breaks timestamp ties
    deterministically (same-µs events would otherwise make ``lag``
    nondeterministic across engines); pass ``None`` if the timestamp
    is already unique per user.
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(
            F.col(user_col),
            *([F.col(id_col)] if id_col else []),
            F.col(ts_col),
            F.col(type_col).alias("to_type"),
        )
        .withColumn("from_type", F.lag("to_type").over(w))
        .where(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    row = Window.partitionBy("from_type")
    return counts.withColumn(
        "p",
        F.round(
            F.try_divide(
                F.col("n").cast("double"),
                F.sum("n").over(row).cast("double"),
            ),
            6,
        ),
    )
