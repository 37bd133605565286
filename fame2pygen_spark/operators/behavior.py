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

    Plan shape — single pass, no per-step recompute: step 1 is one
    user-keyed groupBy over the type-filtered scan; each later step
    LEFT-joins the next type-filtered subset and reduces with a
    conditional min, so a user who stalls keeps a row with a null step
    time (a null ``t_prev`` nulls the strictly-after condition, so
    later steps stay null too — no refiltering needed).  All shuffles
    hash the same uniform user key.  The per-step counts then come
    from ONE aggregation over the final per-user frame
    (``count(t_i)`` skips nulls) unpivoted into rows — the naive
    union-of-per-step-aggregates would re-execute the k-stage join
    chain once per step (k² stages, 12 scans at k=3 in the measured
    plan); this shape executes it once.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    user, ts = F.col(user_col), F.col(ts_col)

    reached = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("t1"))
    )
    prev = "t1"
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == step).select(
            user, ts.alias("__ts")
        )
        cond = F.col("__ts") > F.col(prev)
        if within_us is not None:
            cond = cond & (F.col("__ts") - F.col("t1") <= F.lit(within_us))
        carried = [f"t{j}" for j in range(1, i)]
        reached = (
            reached.join(nxt, on=user_col, how="left")
            .groupBy(user_col)
            .agg(
                *[F.max(c).alias(c) for c in carried],
                F.min(F.when(cond, F.col("__ts"))).alias(f"t{i}"),
            )
        )
        prev = f"t{i}"

    totals = reached.agg(
        *[
            F.count(f"t{i}").cast("long").alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"n{i}").alias("n_users"),
                F.round(
                    F.try_divide(
                        F.col(f"n{i}").cast("double"),
                        F.col("n1").cast("double"),
                    ),
                    6,
                ).alias("pct_of_first"),
            )
            for i, step in enumerate(steps, start=1)
        ]
    )
    return totals.select(F.explode(rows).alias("s")).select("s.*")


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
