"""User-behavior analytics over event tables: ordered funnels, cohort
retention, Markov path transitions, outlier flagging, and
inter-arrival statistics.

Not present in the reference — north-star training/product-analytics
surface (the published formulations: ordered funnel via sequential
conditional minima, cohort retention via first-activity bucketing,
first-order transition matrices, z-score outliers — all standard
SQL-era analytics, no proprietary semantics).

Scale shape: every large aggregation, window, and join in this module
is keyed by the user id — a uniform high-cardinality key — so each
operator is a small fixed number of co-partitioned user-keyed
shuffles (plus broadcast joins of tiny per-group statistics).
Event-type filters sit directly on the scan (predicate pushdown), and
the final outputs are tiny (≤ steps, ≤ cohorts×offsets, ≤ |types|²
rows).  No driver-side actions, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "funnel_conversion", "cohort_retention", "event_transitions",
    "value_outliers", "inter_arrival_quantiles",
    "last_touch_attribution", "top_session_paths",
    "activity_streaks", "ab_conversion_test", "survival_curve",
]

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


def value_outliers(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier flagging: appends ``z`` (population
    z-score of *value_col* within its group, 6 dp) and ``is_outlier``
    (``|z| > z_threshold``; false where the group is constant).

    Plan shape: one tiny per-group aggregate (mean + population
    stddev — |groups| rows), broadcast-joined back onto the stream;
    the score itself is row-local arithmetic inside the scan stage.
    Population stddev (``stddev_pop``) rather than sample: its
    definition is engine-identical, so the oracle reproduces it
    bit-for-bit.
    """
    stats = events.groupBy(group_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sigma"),
    )
    z = F.round(
        F.try_divide(F.col(value_col) - F.col("__mu"), F.col("__sigma")), 6
    )
    return (
        events.join(F.broadcast(stats), on=group_col)
        .withColumn("z", z)
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("z")) > F.lit(float(z_threshold)),
                       F.lit(False)),
        )
        .drop("__mu", "__sigma")
    )


def inter_arrival_quantiles(
    events: DataFrame,
    probs: Sequence[float] = (0.5, 0.9),
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str | None = "event_id",
) -> DataFrame:
    """Distribution of same-user inter-arrival gaps per event type:
    for each type, nearest-rank (type-1) quantiles (µs) of the gap
    between a user's consecutive events of that type, plus the gap
    count.

    Nearest-rank, not interpolated, deliberately: gaps are integral
    microseconds at ~10¹¹–10¹² magnitude, where double ulp (~1e-4)
    exceeds what ROUND(..., 6) can stabilize — interpolated quantiles
    are not engine-reproducible there, while element selection at rank
    ``ceil(p·n)`` is exact BIGINT end to end.  The rank itself is
    computed as ``ceil`` of a double product, the identical IEEE
    expression the SQL oracle uses, so both engines pick the same
    element even when ``p·n`` carries float noise near an integer.

    Plan shape: one (user, type)-keyed lag window (the single big
    shuffle), then a type-keyed rank window over the gap stream and
    one conditional aggregation — |types| output rows.  Exact ranks
    buffer each type's gaps on one executor's sort partition; for
    >10⁸ gaps per type switch to ``group_quantiles(approx=True)``.
    *id_col* breaks same-µs ties deterministically.
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(user_col, type_col).orderBy(*order)
    gaps = (
        events.select(
            F.col(user_col), F.col(type_col).alias("event_type"),
            *([F.col(id_col)] if id_col else []), F.col(ts_col),
        )
        .withColumn(
            "gap_us", F.col(ts_col) - F.lag(ts_col).over(w)
        )
        .where(F.col("gap_us").isNotNull())
    )
    rank_w = Window.partitionBy("event_type").orderBy(F.col("gap_us").asc())
    ranked = gaps.select("event_type", "gap_us").withColumn(
        "__rn", F.row_number().over(rank_w)
    ).withColumn(
        "__n", F.count("*").over(Window.partitionBy("event_type"))
    )
    aggs = [F.max("__n").cast("long").alias("n")]
    for p in probs:
        name = f"p{p * 100:g}".replace(".", "_")
        rank = F.ceil(F.lit(float(p)) * F.col("__n")).cast("long")
        aggs.append(
            F.max(F.when(F.col("__rn") == rank, F.col("gap_us")))
            .cast("long")
            .alias(name)
        )
    return ranked.groupBy("event_type").agg(*aggs)


def last_touch_attribution(
    events: DataFrame,
    *,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    lookback_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: each conversion event is credited to the
    same user's most recent *touch_type* event at-or-before it, when
    that touch falls within *lookback_us*; ``attributed`` is false (and
    the touch columns null) otherwise.

    Composition of :func:`~fame2pygen_spark.operators.temporal.
    asof_join` (the union+window zero-candidate-pairs formulation) over
    the two type-filtered event subsets — one user-keyed shuffle, O(1)
    per-key state, no pair materialization.  Because the as-of picks
    the LATEST prior touch, applying the lookback afterwards is
    lossless: if the latest touch is too old, every earlier touch is
    older still.

    Output: *user_col*, ``conversion_id``, ``conv_ts_us``,
    ``touch_id``, ``touch_ts_us``, ``attributed``.
    """
    from .temporal import asof_join

    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col),
    )
    touch = events.where(F.col(type_col) == touch_type).select(
        F.col(user_col),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col),
    )
    j = asof_join(
        conv,
        touch,
        on=[user_col],
        left_time=ts_col,
        right_time=ts_col,
        value_cols=["touch_id"],
        right_order="touch_id",
        suffix="_touch",
    )
    in_window = (
        F.col(f"{ts_col}_touch").isNotNull()
        & (F.col(ts_col) - F.col(f"{ts_col}_touch") <= F.lit(lookback_us))
    )
    return j.select(
        F.col(user_col),
        F.col("conversion_id"),
        F.col(ts_col).alias("conv_ts_us"),
        F.when(in_window, F.col("touch_id_touch")).alias("touch_id"),
        F.when(in_window, F.col(f"{ts_col}_touch")).alias("touch_ts_us"),
        in_window.alias("attributed"),
    )


def top_session_paths(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    gap_us: int = 30 * 60 * 1_000_000,
    max_steps: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Most common session-opening paths: sessionize by inactivity gap
    (the lag + running-sum formulation), render each session's first
    *max_steps* event types as a ``'a>b>c'`` path string, and count —
    ``(path, n_sessions)`` ranked by count (path as tie-break).

    Plan shape: one user-keyed window pass assigns session ids; the
    per-session path is a sort_array over the session's collected
    (ts, id, type) structs TRUNCATED to *max_steps* — session row
    groups are bounded by real user activity, and the slice bounds the
    rendered path.  Path counting is a uniform hash aggregation and
    the ranking a top-n heap.  Deterministic: (ts, id) orders events
    inside a session identically in both engines.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    new_session = F.when(
        F.lag(ts_col).over(w).isNull()
        | ((F.col(ts_col) - F.lag(ts_col).over(w)) > gap_us),
        1,
    ).otherwise(0)
    sess = events.withColumn("__sid", F.sum(new_session).over(w))
    paths = (
        sess.groupBy(user_col, "__sid")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(id_col).alias("i"),
                        F.col(type_col).alias("e"),
                    )
                )
            ).alias("__evs")
        )
        .select(
            F.concat_ws(
                ">",
                F.transform(
                    F.slice(F.col("__evs"), 1, max_steps), lambda s: s["e"]
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(int(top_n))
    )


def activity_streaks(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    day_us: int = DAY_US,
) -> DataFrame:
    """Longest run of consecutive active days per user — the
    gaps-and-islands pattern: ``(user, n_active_days, n_streaks,
    longest_streak, current_streak_end)``.

    Island id = ``day − dense-index(day)`` per user (consecutive days
    share it, any gap shifts it) — one user-keyed window over the
    distinct (user, day) frame, one reduce per island, one per user.
    State is bounded by active days, not events.
    """
    day = (F.col(ts_col) - (F.col(ts_col) % F.lit(day_us))) / F.lit(day_us)
    days = events.select(
        F.col(user_col).alias("user"), day.cast("long").alias("day")
    ).distinct()
    w = Window.partitionBy("user").orderBy("day")
    islands = days.withColumn(
        "__island", F.col("day") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user", "__island").agg(
        F.count("*").cast("long").alias("len"),
        F.max("day").alias("end_day"),
    )
    return streaks.groupBy("user").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.max("end_day").cast("long").alias("current_streak_end"),
    )


def ab_conversion_test(
    events: DataFrame,
    *,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    salt: str = "ab",
) -> DataFrame:
    """Two-proportion conversion comparison over a deterministic 50/50
    hash split of users: one row — ``(n_a, n_b, conv_a, conv_b,
    rate_a, rate_b, z)`` with the pooled two-proportion z-statistic
    ``(p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))``.

    The assignment is ``uniform_hash01(user) < 0.5`` — the same
    deterministic membership primitive as
    :func:`~fame2pygen_spark.operators.mixing.split_corpus`, so the
    split is reproducible across engines and runs (a hash-based A/A
    test; supply real assignments by pre-computing a variant column
    and grouping on it for production use).

    Plan shape: one user-keyed reduce (per-user converted flag), one
    tiny per-variant aggregate, row-local arithmetic.
    """
    from .mixing import uniform_hash01

    per_user = events.groupBy(user_col).agg(
        F.max(
            (F.col(type_col) == conversion_type).cast("int")
        ).alias("__conv")
    ).select(
        F.when(
            uniform_hash01(F.col(user_col), salt) < 0.5, F.lit("a")
        ).otherwise(F.lit("b")).alias("__variant"),
        "__conv",
    )
    is_a = (F.col("__variant") == "a").cast("long")
    is_b = (F.col("__variant") == "b").cast("long")
    agg = per_user.agg(
        F.sum(is_a).alias("a_n"),
        F.sum(is_b).alias("b_n"),
        F.sum(is_a * F.col("__conv")).alias("a_conv"),
        F.sum(is_b * F.col("__conv")).alias("b_conv"),
    )
    n_a, n_b = F.col("a_n").cast("double"), F.col("b_n").cast("double")
    c_a, c_b = F.col("a_conv").cast("double"), F.col("b_conv").cast("double")
    p_a, p_b = c_a / n_a, c_b / n_b
    pooled = (c_a + c_b) / (n_a + n_b)
    z = F.try_divide(
        p_a - p_b,
        F.sqrt(pooled * (1.0 - pooled) * (1.0 / n_a + 1.0 / n_b)),
    )
    return agg.select(
        F.col("a_n").cast("long").alias("n_a"),
        F.col("b_n").cast("long").alias("n_b"),
        F.col("a_conv").cast("long").alias("conv_a"),
        F.col("b_conv").cast("long").alias("conv_b"),
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z"),
    )


def survival_curve(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    max_days: int = 30,
    day_us: int = DAY_US,
) -> DataFrame:
    """Activity survival function: for each day offset d in
    ``0..max_days``, the fraction of users whose observed lifetime
    (last activity day − first activity day) is at least *d* —
    ``(day_offset, n_surviving, survival)``.  ``S(0) = 1`` by
    definition; the curve is the retention complement to
    :func:`cohort_retention` (which measures exact-day returns, not
    lifetime).

    Plan shape: one user-keyed reduce to per-user lifetimes, then one
    1-row conditional aggregate with ``max_days+1`` counters unpivoted
    via ``explode`` — the same tiny-output shape as the funnel.
    """
    day = (F.col(ts_col) - (F.col(ts_col) % F.lit(day_us))) / F.lit(day_us)
    lifetimes = events.select(
        F.col(user_col).alias("user"), day.cast("long").alias("day")
    ).groupBy("user").agg(
        (F.max("day") - F.min("day")).alias("lifetime")
    )
    counters = lifetimes.agg(
        F.count("*").cast("long").alias("__total"),
        *[
            F.sum((F.col("lifetime") >= d).cast("long")).alias(f"__s{d}")
            for d in range(max_days + 1)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("day_offset"),
                F.col(f"__s{d}").cast("long").alias("n_surviving"),
                F.round(
                    F.try_divide(
                        F.col(f"__s{d}").cast("double"),
                        F.col("__total").cast("double"),
                    ),
                    6,
                ).alias("survival"),
            )
            for d in range(max_days + 1)
        ]
    )
    return counters.select(F.explode(rows).alias("s")).select("s.*")


def multi_touch_attribution(
    events: DataFrame,
    *,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    lookback_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every touch
    inside the lookback window before a conversion receives credit —
    40% to the first touch, 40% to the last, the middle 20% split
    evenly — generalizing :func:`last_touch_attribution` (which is the
    degenerate all-credit-to-last rule).

    Plan shape: a user-keyed equi-join of the two type-filtered
    subsets with the window predicate as a post-filter — candidate
    pairs are bounded by per-user activity (touches × conversions for
    ONE user), never cross users, so the join scales with users like
    every behavior operator here.  Position and touch count come from
    conversion-partitioned windows over those bounded groups.

    Credit fractions are exact decimal arithmetic (1.0, 0.5, 0.4,
    0.2/(n-2)) rounded to 6 dp — engine-reproducible.

    Output: ``(user, conversion_id, touch_id, position, n_touches,
    credit)``, one row per attributed (conversion, touch) pair.
    """
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("__cts"),
    )
    touch = events.where(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("__tts"),
    )
    pairs = conv.join(touch, on="user").where(
        (F.col("__tts") <= F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - F.lit(int(lookback_us)))
    )
    w = Window.partitionBy("user", "conversion_id").orderBy(
        "__tts", "touch_id"
    )
    wn = Window.partitionBy("user", "conversion_id")
    pairs = pairs.withColumn("position", F.row_number().over(w)).withColumn(
        "n_touches", F.count("*").over(wn)
    )
    n = F.col("n_touches")
    pos = F.col("position")
    credit = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when((pos == 1) | (pos == n), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - F.lit(2)).cast("double"))
    )
    return pairs.select(
        F.col("user"),
        "conversion_id",
        "touch_id",
        F.col("position").cast("long").alias("position"),
        F.col("n_touches").cast("long").alias("n_touches"),
        F.round(credit, 6).alias("credit"),
    )


def cuped_lift(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    cutoff,
    salt: str = "ab",
) -> DataFrame:
    """CUPED variance-reduced A/B comparison (Deng et al. 2013): each
    user's post-period metric ``y`` is adjusted by their PRE-period
    covariate ``x`` — ``y' = y − θ(x − x̄)`` with
    ``θ = cov(x,y)/var(x)`` pooled across arms — which removes the
    between-user variance the experiment randomized over, typically
    shrinking confidence intervals 30-50% at zero bias (the covariate
    predates assignment, so E[x|arm] is equal by construction).

    *cutoff* (same units as *ts_col*) splits pre/post; users with no
    pre-period activity take ``x = 0`` (the constant-imputation
    convention — any constant is unbiased).  Assignment is the
    deterministic ``uniform_hash01`` 50/50 split (an A/A harness; feed
    a real variant column for production use).

    Plan shape: one user-keyed reduce builds (x, y); θ and x̄ come
    from ONE 1-row decimal-moment aggregate broadcast back; the final
    per-arm reduce is decimal-cast.  Three aggregations total, no
    windows, nothing keyed wider than the user.

    Returns one row per variant: ``(variant, n_users, mean_y,
    mean_y_cuped, var_y, var_y_cuped)`` at 6 dp — the variance
    columns demonstrate the reduction.
    """
    from .mixing import uniform_hash01

    dec = "decimal(38,12)"
    pre = F.when(
        F.col(ts_col) < F.lit(cutoff), F.col(value_col)
    ).otherwise(F.lit(0.0))
    post = F.when(
        F.col(ts_col) >= F.lit(cutoff), F.col(value_col)
    ).otherwise(F.lit(0.0))
    per_user = events.groupBy(user_col).agg(
        F.sum(pre.cast(dec)).cast("double").alias("x"),
        F.sum(post.cast(dec)).cast("double").alias("y"),
    ).select(
        F.when(
            uniform_hash01(F.col(user_col), salt) < 0.5, F.lit("a")
        )
        .otherwise(F.lit("b"))
        .alias("variant"),
        "x",
        "y",
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("__sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("__sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec))
        .cast("double")
        .alias("__sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec))
        .cast("double")
        .alias("__sxx"),
    )
    adj = per_user.crossJoin(F.broadcast(mom))
    mean_x = F.col("__sx") / F.col("__n")
    theta = F.try_divide(
        F.col("__sxy") / F.col("__n") - mean_x * (F.col("__sy") / F.col("__n")),
        F.col("__sxx") / F.col("__n") - mean_x * mean_x,
    )
    y_adj = F.col("y") - F.coalesce(theta, F.lit(0.0)) * (
        F.col("x") - mean_x
    )
    scored = adj.withColumn("y_cuped", y_adj)
    out = scored.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("__ty"),
        F.sum(F.col("y_cuped").cast(dec)).cast("double").alias("__tc"),
        F.sum((F.col("y") * F.col("y")).cast(dec))
        .cast("double")
        .alias("__tyy"),
        F.sum((F.col("y_cuped") * F.col("y_cuped")).cast(dec))
        .cast("double")
        .alias("__tcc"),
    )
    n = F.col("n_users").cast("double")
    return out.select(
        "variant",
        "n_users",
        F.round(F.col("__ty") / n, 6).alias("mean_y"),
        F.round(F.col("__tc") / n, 6).alias("mean_y_cuped"),
        F.round(
            F.col("__tyy") / n - (F.col("__ty") / n) * (F.col("__ty") / n),
            6,
        ).alias("var_y"),
        F.round(
            F.col("__tcc") / n - (F.col("__tc") / n) * (F.col("__tc") / n),
            6,
        ).alias("var_y_cuped"),
    )


def calibration_curve(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Model-calibration curve: rows bucketed into equal-population
    score bins (exact-quantile boundaries), each bin reporting its
    mean score vs. observed outcome rate — a well-calibrated scorer
    tracks the diagonal.  The standard acceptance gate for quality
    classifiers feeding curation thresholds (x16's Gopher filter &c.).

    Mechanics: boundary array from ONE exact-percentile aggregate
    (1 row, broadcast; the x88 equi-depth idiom with the same
    ``percentile`` ↔ ``quantile_cont`` engine pairing); bin assignment
    is a strict-``>`` fold over that literal-sized array inside the
    scan; one hash aggregation with decimal sums finishes.  Swap
    approx_percentile at extreme scale.

    Returns ``(bin, n, mean_score, outcome_rate)``, 6 dp.
    """
    probs = [i / n_bins for i in range(1, n_bins)]
    bounds = df.agg(
        F.array(
            *[
                F.expr(f"percentile(`{score_col}`, {p!r})")
                for p in probs
            ]
        ).alias("__b")
    )
    dec = "decimal(38,12)"
    binned = df.crossJoin(F.broadcast(bounds)).withColumn(
        "bin",
        F.aggregate(
            F.col("__b"),
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(score_col) > b, 1).otherwise(0),
        ).cast("long"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.col(score_col).cast(dec)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_score"),
            F.round(
                F.sum(F.col(outcome_col).cast("int").cast(dec))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("outcome_rate"),
        )
        .orderBy("bin")
    )


def kaplan_meier(
    durations: DataFrame,
    *,
    t_col: str = "t",
    censored_col: str = "censored",
) -> DataFrame:
    """Kaplan–Meier survival estimator with right-censoring over a
    prepared (duration, censored) frame: one row per subject, integer
    duration and a 0/1 censoring flag (1 = still event-free when
    observation ended; leaves the risk set without counting as an
    event).  The statistically correct upgrade of
    :func:`survival_curve`, which treats every observed lifetime as
    complete and biases survival low.

    ``S(t) = Π_{tᵢ<=t} (1 − dᵢ/nᵢ)`` over event times, with nᵢ the
    at-risk count (duration >= tᵢ).  Callers shape the analysis:
    time-to-conversion (duration = first purchase − first activity,
    censored = never purchased), churn (lifetime vs observation end),
    hardware survival, &c.

    Plan shape: one aggregation keyed by duration (output bounded by
    the duration range, not subjects); risk-set and product
    cumulations are windows over THOSE bounded rows — the product via
    ``exp(Σ ln(1−d/n))`` with decimal-cast log sums (the S12
    chain-index idiom), so the curve is accumulation-order-
    insensitive; an all-event day forces S = 0 downstream via a
    cumulative zero flag rather than ln(0).

    Returns ``(t, n_at_risk, d_events, n_censored, survival)`` for
    event times only (KM steps), survival at 6 dp.
    """
    lifed = durations.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(censored_col).cast("int").alias("censored"),
    )
    per_t = lifed.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("__n_t"),
        F.sum(1 - F.col("censored")).cast("long").alias("d_events"),
        F.sum("censored").cast("long").alias("n_censored"),
    )
    w_ord = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = per_t.agg(F.sum("__n_t").alias("__N"))
    risked = per_t.crossJoin(F.broadcast(total)).withColumn(
        "n_at_risk",
        (
            F.col("__N") - F.coalesce(F.sum("__n_t").over(w_ord), F.lit(0))
        ).cast("long"),
    )
    frac = F.try_divide(
        F.col("d_events").cast("double"), F.col("n_at_risk").cast("double")
    )
    log_term = F.when(
        F.col("d_events") < F.col("n_at_risk"),
        F.log(F.lit(1.0) - frac).cast("decimal(28,18)"),
    ).otherwise(F.lit(0).cast("decimal(28,18)"))
    zero_flag = F.max(
        (F.col("d_events") >= F.col("n_at_risk")).cast("int")
    ).over(w_cum)
    surv = F.when(zero_flag == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(log_term).over(w_cum).cast("double"))
    )
    return (
        risked.withColumn("survival", F.round(surv, 6))
        .where(F.col("d_events") > 0)
        .select("t", "n_at_risk", "d_events", "n_censored", "survival")
        .orderBy("t")
    )


def funnel_step_latency(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    probs: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Time-to-convert distribution per funnel transition: for users
    who reach step *i*, quantiles of ``t_i − t_{i−1}`` under the same
    sequential-conditional-minimum semantics as
    :func:`funnel_conversion` — the "how long does each step take"
    companion to its "how many make it".

    Quantiles are NEAREST-RANK (exact element selection at rank
    ``ceil(p·n)``), not interpolated — gaps are integral microseconds
    at ~10¹¹ magnitude where interpolation arithmetic differs across
    engines by an ulp that truncation then amplifies to a full unit
    (the x38 lesson, applied before the bug this time).  Everything
    stays BIGINT end to end.

    Plan shape: the same single-pass k−1 join chain as the funnel
    (all shuffles on the user key); gap streams unpivot into one
    (transition)-keyed frame, ranks come from a transition-keyed
    window (each transition's gaps sort on one partition — switch to
    approx quantiles beyond ~10⁸ converting users per step).

    Returns ``(step_idx, step, n_users, p50_us, p90_us)`` for
    transitions (step_idx >= 2).
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
        reached = (
            reached.join(nxt, on=user_col, how="left")
            .groupBy(user_col, *[f"t{j}" for j in range(1, i)])
            .agg(
                F.min(
                    F.when(F.col("__ts") > F.col(prev), F.col("__ts"))
                ).alias(f"t{i}")
            )
        )
        prev = f"t{i}"

    gap_selects = []
    for i, step in enumerate(steps[1:], start=2):
        gap_selects.append(
            reached.where(F.col(f"t{i}").isNotNull()).select(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                (F.col(f"t{i}") - F.col(f"t{i-1}"))
                .cast("long")
                .alias("gap_us"),
            )
        )
    gaps = gap_selects[0]
    for g in gap_selects[1:]:
        gaps = gaps.unionByName(g)

    wr = Window.partitionBy("step_idx").orderBy("gap_us")
    wn = Window.partitionBy("step_idx")
    ranked = gaps.withColumn("__rn", F.row_number().over(wr)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    aggs = [
        F.max("step").alias("step"),
        F.max("__n").cast("long").alias("n_users"),
    ]
    for p in probs:
        target = F.ceil(F.lit(float(p)) * F.col("__n").cast("double"))
        aggs.append(
            F.max(
                F.when(F.col("__rn") == target, F.col("gap_us"))
            )
            .cast("long")
            .alias(f"p{int(p * 100)}_us")
        )
    return (
        ranked.groupBy("step_idx").agg(*aggs)
        .select("step_idx", "step", "n_users",
                *[f"p{int(p * 100)}_us" for p in probs])
        .orderBy("step_idx")
    )


def rfm_segments(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    n_tiles: int = 3,
    day_us: int = DAY_US,
) -> DataFrame:
    """RFM segmentation — the classic lifecycle taxonomy: each user
    scored 1..*n_tiles* on Recency (days since last activity, lower is
    better), Frequency (event count), and Monetary (value sum), cut at
    exact corpus quantiles, then rolled up per R-F-M cell.

    Plan shape: one user-keyed reduce to (r, f, m); the 3×(n_tiles−1)
    cut points come from ONE exact-percentile aggregate (1 row,
    broadcast — the x88 idiom); scoring is a strict-``>`` fold over
    each literal-sized boundary array; one final cell-keyed reduce
    (output bounded by n_tiles³).  Monetary sums are decimal-cast.

    Returns ``(r_score, f_score, m_score, n_users, total_value)``,
    value at 6 dp.  Recency scores INVERT (freshest activity = highest
    score), matching the marketing convention.
    """
    dec = "decimal(38,12)"
    ref = events.agg(F.max(F.col(ts_col)).alias("__ref"))
    per_user = (
        events.crossJoin(F.broadcast(ref))
        .groupBy(user_col)
        .agg(
            F.expr(f"(first(__ref) - max(`{ts_col}`)) div {day_us}")
            .cast("long")
            .alias("r"),
            F.count(F.lit(1)).cast("long").alias("f"),
            F.sum(F.col(value_col).cast(dec))
            .cast("double")
            .alias("m"),
        )
    )
    probs = [i / n_tiles for i in range(1, n_tiles)]
    cuts = per_user.agg(
        *[
            F.array(
                *[F.expr(f"percentile(`{c}`, {p!r})") for p in probs]
            ).alias(f"__b_{c}")
            for c in ("r", "f", "m")
        ]
    )

    def score(col: str) -> F.Column:
        return (
            F.aggregate(
                F.col(f"__b_{col}"),
                F.lit(1),
                lambda acc, b: acc
                + F.when(F.col(col) > b, 1).otherwise(0),
            )
        ).cast("long")

    scored = per_user.crossJoin(F.broadcast(cuts)).select(
        user_col,
        # recency: fewer days since last activity = better = higher
        (F.lit(n_tiles + 1) - score("r")).alias("r_score"),
        score("f").alias("f_score"),
        score("m").alias("m_score"),
        "m",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(
                F.sum(F.col("m").cast(dec)).cast("double"), 6
            ).alias("total_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def bradley_terry(
    pairs: DataFrame,
    item_a_col: str,
    item_b_col: str,
    wins_a_col: str,
    wins_b_col: str,
) -> DataFrame:
    """Two fixed minorization–maximization iterations of the
    Bradley–Terry preference-strength model (Bradley & Terry 1952;
    MM update of Hunter 2004: ``s_i ← W_i / Σ_j n_ij/(s_i+s_j)``)
    over an aggregated pairwise-comparison table — the standard fit
    behind preference-data QC for reward models: are the comparisons
    consistent enough that a single strength scale explains them?

    Input: one row per unordered item pair with win totals
    (``item_a, item_b, wins_a, wins_b``).  Two MM steps from the
    uniform start (s=1) are computed exactly — the first reduces to
    ``s1_i = 2·W_i / N_i``; the second uses the mutual term
    ``n_ij/(s1_i + s1_j)``.  Strengths are gauge-free (the model is
    invariant to a global scale; no normalization is applied), so
    compare RATIOS.  Iterating to convergence = re-feeding the
    output, one aggregation per step.

    Scale shape: the comparison table is |items|²-bounded (already
    aggregated — the caller reduces raw comparisons, which is where
    the data volume lives); each MM step is one symmetric edge
    expansion + one map-side-combinable groupBy(item) + one join of
    per-item strengths back onto edges.  Engine-exactness: every
    cross-edge float sum goes through ``decimal(28,18)``; W/N are
    integer sums.

    Output: ``item, wins, n_comparisons, s1, s2`` (6 dp), one row
    per item appearing in any comparison.  An item pair with both
    win counts zero contributes nothing (no comparisons happened).
    """
    ia, ib = F.col(item_a_col), F.col(item_b_col)
    wa = F.col(wins_a_col).cast("long")
    wb = F.col(wins_b_col).cast("long")
    base = pairs.where((wa + wb) > 0).select(
        ia.alias("__a"), ib.alias("__b"), wa.alias("__wa"), wb.alias("__wb")
    )
    edges = base.select(
        F.col("__a").alias("i"), F.col("__b").alias("j"),
        F.col("__wa").alias("w"), (F.col("__wa") + F.col("__wb")).alias("n"),
    ).unionAll(
        base.select(
            F.col("__b").alias("i"), F.col("__a").alias("j"),
            F.col("__wb").alias("w"),
            (F.col("__wa") + F.col("__wb")).alias("n"),
        )
    )
    per = edges.groupBy("i").agg(
        F.sum("w").alias("wins"), F.sum("n").alias("n_comparisons")
    )
    s1 = per.select(
        "i",
        (
            F.lit(2.0) * F.col("wins").cast("double")
            / F.col("n_comparisons")
        ).alias("s1"),
    )
    denom = (
        edges.join(s1.select(F.col("i"), F.col("s1").alias("si")), on="i")
        .join(
            s1.select(F.col("i").alias("j"), F.col("s1").alias("sj")),
            on="j",
        )
        .groupBy("i")
        .agg(
            F.sum(
                (
                    F.col("n").cast("double")
                    / (F.col("si") + F.col("sj"))
                ).cast("decimal(28,18)")
            )
            .cast("double")
            .alias("__d")
        )
    )
    return (
        per.join(s1, on="i")
        .join(denom, on="i")
        .select(
            F.col("i").alias("item"),
            "wins",
            "n_comparisons",
            F.round("s1", 6).alias("s1"),
            F.round(
                F.try_divide(F.col("wins").cast("double"), F.col("__d")), 6
            ).alias("s2"),
        )
    )


def stationary_distribution(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str | None = "event_id",
    n_iter: int = 4,
) -> DataFrame:
    """Fixed-round Markov stationary distribution over the empirical
    event-type chain (the long-run occupancy vector of the
    :func:`event_transitions` matrix): π ← πP from the uniform start,
    *n_iter* times — where users actually spend their sessions once
    transients wash out, the ranking that orders funnel investment.

    States are the types observed as transition SOURCES; transitions
    into never-source (absorbing, last-event-only) types are dropped
    and rows renormalized over the kept mass, so P is a proper
    stochastic matrix and the iterate stays a distribution.  Fixed
    iteration count keeps it deterministic and oracle-replayable.

    Scale shape: one user-keyed lag window builds the pair list (the
    x34 shape), after which everything runs on the ≤|types|² matrix:
    each superstep is one broadcast join + one keyed aggregation with
    decimal-cast mass sums.

    Output per state: ``(event_type, stationary, pos)`` (6 dp, pos
    by stationary desc / type asc).
    """
    states, pmat = _renormalized_chain(
        events, user_col=user_col, type_col=type_col, ts_col=ts_col,
        id_col=id_col,
    )
    pi = _stationary_pi(states, pmat, n_iter)
    pos = F.row_number().over(
        Window.orderBy(F.desc("prob"), F.asc("state"))
    )
    return pi.select(
        F.col("state").alias(type_col),
        F.round(F.col("prob"), 6).alias("stationary"),
        pos.cast("long").alias("pos"),
    )


def _renormalized_chain(
    events: DataFrame,
    *,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str | None,
):
    """Shared chain construction for :func:`stationary_distribution`
    and :func:`entropy_rate`: states = types observed as transition
    sources, transitions into never-source types dropped and rows
    renormalized — returns ``(states(state), pmat(from_type, to_type,
    __p))``, both materialized."""
    trans = event_transitions(
        events,
        user_col=user_col,
        type_col=type_col,
        ts_col=ts_col,
        id_col=id_col,
    ).select("from_type", "to_type", "n")
    states = trans.select(
        F.col("from_type").alias("state")
    ).distinct().localCheckpoint(eager=True)
    kept = trans.join(
        states.select(F.col("state").alias("to_type")), "to_type"
    )
    tot = kept.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("__tot")
    )
    pmat = kept.join(tot, "from_type").select(
        "from_type",
        "to_type",
        (F.col("n").cast("double") / F.col("__tot").cast("double")).alias(
            "__p"
        ),
    ).localCheckpoint(eager=True)
    return states, pmat


def _stationary_pi(states, pmat, n_iter: int):
    """π ← πP fixed supersteps from the uniform start (decimal-cast
    mass sums each round); returns ``(state, prob)`` unrounded."""
    dec = "decimal(38,18)"
    n_states = float(states.count())
    pi = states.withColumn("prob", F.lit(1.0 / n_states))
    for _ in range(int(n_iter)):
        contribs = pmat.join(
            F.broadcast(pi.select(F.col("state").alias("from_type"), "prob")),
            "from_type",
        ).select(
            F.col("to_type").alias("state"),
            (F.col("prob") * F.col("__p")).cast(dec).alias("__c"),
        )
        stepped = contribs.groupBy("state").agg(
            F.sum("__c").cast("double").alias("prob")
        )
        pi = (
            states.join(stepped, "state", "left")
            .select(
                "state", F.coalesce("prob", F.lit(0.0)).alias("prob")
            )
            .localCheckpoint(eager=True)
        )
    return pi


def entropy_rate(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str | None = "event_id",
    n_iter: int = 4,
) -> DataFrame:
    """Entropy rate of the empirical session Markov chain:
    ``H = −Σ_i π_i Σ_j p_ij log₂ p_ij`` (bits/event) — how
    PREDICTABLE the behavior stream is in the long run: H → 0 means
    the next event is nearly determined (bots, rigid funnels), H near
    log₂|types| means a near-uniform wander.  The single-number
    summary on top of x34's matrix and x177's occupancy vector, and
    a behavioral-drift tripwire (a falling H often precedes a bot
    wave).

    π is the same fixed-superstep iterate as
    :func:`stationary_distribution` (shared construction — no copy),
    ROUNDED to 6 dp before weighting so both engines weight identical
    values; per-state conditional entropies and the final Σ are
    decimal-cast sums.

    Scale shape: the x34 pair window, then everything on the
    ≤|types|² matrix.

    Output per state: ``(event_type, stationary, h_state, contrib,
    entropy_rate)`` — the chain-level H repeated per row (6 dp).
    """
    dec = "decimal(38,18)"
    states, pmat = _renormalized_chain(
        events, user_col=user_col, type_col=type_col, ts_col=ts_col,
        id_col=id_col,
    )
    pi = _stationary_pi(states, pmat, n_iter)
    h = pmat.groupBy(F.col("from_type").alias("state")).agg(
        F.sum(
            (-(F.col("__p") * F.log2(F.col("__p")))).cast(dec)
        ).alias("__h")
    )
    terms = (
        pi.select("state", F.round(F.col("prob"), 6).alias("__pi"))
        .join(h, on="state")
        .select(
            "state",
            "__pi",
            F.col("__h").cast("double").alias("__hs"),
            (F.col("__pi") * F.col("__h").cast("double")).alias("__ct"),
        )
    )
    tot = terms.agg(
        F.sum(F.col("__ct").cast(dec)).cast("double").alias("__hr")
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .select(
            F.col("state").alias(type_col),
            F.col("__pi").alias("stationary"),
            F.round(F.col("__hs"), 6).alias("h_state"),
            F.round(F.col("__ct"), 6).alias("contrib"),
            F.round(F.col("__hr"), 6).alias("entropy_rate"),
        )
    )


def burstiness(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str | None = "event_id",
) -> DataFrame:
    """Burstiness coefficient of same-user inter-arrival gaps per
    event type (Goh & Barabási 2008): ``B = (σ − μ)/(σ + μ)`` over the
    gap distribution — ``−1`` for a perfectly periodic stream, ``0``
    for Poisson, ``→ +1`` for heavy-tailed bursts.  The single-number
    companion to x38's gap quantiles: quantiles show WHERE the mass
    sits, B says whether the process is clocklike, random, or bursty —
    the signal that picks sessionization timeouts and bot heuristics.

    Engine-exactness: gaps are integral microseconds; power sums use
    exact DECIMAL accumulation (``Σg`` at (38,0) and ``Σg²`` via a
    (19,0)×(19,0)→(38,0) product — gap² ≈ 10²³ overflows BIGINT, the
    x38 magnitude lesson) so both engines see identical integers; μ,
    σ = √(m₂) (IEEE-exact sqrt) and B are one double composition.

    Plan shape: one (user, type)-keyed lag window — the same single
    shuffle as inter_arrival_quantiles — then a type-keyed hash agg;
    |types| output rows, no rank window at all (cheaper than x38).

    Output: ``(event_type, n_gaps, mean_gap_us, std_gap_us,
    burstiness)`` (6 dp).
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(user_col, type_col).orderBy(*order)
    gaps = (
        events.select(
            F.col(user_col), F.col(type_col).alias("event_type"),
            *([F.col(id_col)] if id_col else []), F.col(ts_col),
        )
        .withColumn("gap_us", F.col(ts_col) - F.lag(ts_col).over(w))
        .where(F.col("gap_us").isNotNull())
    )
    gd = F.col("gap_us").cast("decimal(19,0)")
    sums = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(gd).alias("s1"),
        F.sum(gd * gd).alias("s2"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mu * mu
    sd = F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0))
    b = F.try_divide(sd - mu, sd + mu)
    return sums.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(mu, 6).alias("mean_gap_us"),
        F.round(sd, 6).alias("std_gap_us"),
        F.round(b, 6).alias("burstiness"),
    )


def session_step_flow(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    gap_us: int = 30 * 60 * 1_000_000,
    max_steps: int = 5,
) -> DataFrame:
    """Step-indexed session transition counts — the Sankey-diagram
    frame: for each step position 1..*max_steps* within a session,
    how many sessions moved ``from_type → to_type`` at that step.
    The positional refinement of x34's global transition matrix (which
    marginalizes steps away) and x49's whole-path strings (which
    explode combinatorially past a few steps): step-indexed edges stay
    |steps|·|types|² no matter how long sessions get.

    Sessionization is the same lag + running-sum formulation as
    :func:`top_session_paths` (inactivity gap *gap_us*); events inside
    a session are ordered by (ts, id) — deterministic in both engines.

    Scale shape: one user-keyed window pass (sessions + step index +
    lead), then a (step, from, to) hash aggregation — no joins, no
    per-session collect.

    Output: ``(step, from_type, to_type, n_sessions)``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    new_session = F.when(
        F.lag(ts_col).over(w).isNull()
        | ((F.col(ts_col) - F.lag(ts_col).over(w)) > gap_us),
        1,
    ).otherwise(0)
    sess = events.withColumn("__sid", F.sum(new_session).over(w))
    ws = Window.partitionBy(user_col, "__sid").orderBy(ts_col, id_col)
    steps = sess.select(
        F.row_number().over(ws).alias("step"),
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(ws).alias("to_type"),
    ).where(
        F.col("to_type").isNotNull() & (F.col("step") <= max_steps)
    )
    return steps.groupBy("step", "from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    ).select(
        F.col("step").cast("long").alias("step"),
        "from_type", "to_type", "n_sessions",
    )


def sprt_decision(
    events: DataFrame,
    success: Column,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    *,
    p0: float = 0.45,
    p1: float = 0.55,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> DataFrame:
    """Sequential probability ratio test (Wald 1945) per group: walk
    the event stream in order, accumulate the Bernoulli log-likelihood
    ratio for H1: p = *p1* vs H0: p = *p0*, and report the FIRST
    boundary crossing — the experimentation-platform primitive that
    stops tests early with guaranteed error rates (α, β) instead of
    peeking at a fixed-horizon test (x66/x159) and inflating false
    positives.

    Engine-exactness: the running LLR is reconstructed from exact
    integer running success/failure counts (``cs·ln(p1/p0) +
    cf·ln((1−p1)/(1−p0))``) — never a float running sum, so
    accumulation order cannot drift; boundary constants ``ln((1−β)/α)``
    / ``ln(β/(1−α))`` are driver-side literals.

    Scale shape: one group-keyed ordered window for the running
    counts, then one hash agg with conditional-min crossing ranks —
    no joins, |groups| output rows.

    Output: ``(*group_cols, n_total, n_success, decision
    ('accept_h1' | 'accept_h0' | 'continue'), n_at_decision,
    llr_final)`` (6 dp; n_at_decision null while 'continue').
    """
    import math

    g = list(group_cols)
    l1 = math.log(p1 / p0)
    l0 = math.log((1.0 - p1) / (1.0 - p0))
    ln_a = math.log((1.0 - beta) / alpha)
    ln_b = math.log(beta / (1.0 - alpha))
    w = Window.partitionBy(*g).orderBy(*[F.col(c) for c in order_cols])
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    staged = events.select(
        *g, *order_cols, success.cast("long").alias("__s")
    ).select(
        *g,
        F.row_number().over(w).alias("__rn"),
        F.sum("__s").over(run).alias("__cs"),
        (
            F.row_number().over(w) - F.sum("__s").over(run)
        ).alias("__cf"),
    )
    llr = (
        F.col("__cs").cast("double") * F.lit(l1)
        + F.col("__cf").cast("double") * F.lit(l0)
    )
    marked = staged.select(
        *g,
        "__rn",
        "__cs",
        F.when(llr >= F.lit(ln_a), F.col("__rn")).alias("__h1"),
        F.when(llr <= F.lit(ln_b), F.col("__rn")).alias("__h0"),
    )
    agg = marked.groupBy(*g).agg(
        F.max("__rn").cast("long").alias("n_total"),
        F.max("__cs").cast("long").alias("n_success"),
        F.min("__h1").alias("__r1"),
        F.min("__h0").alias("__r0"),
    )
    decision = (
        F.when(F.col("__r1").isNull() & F.col("__r0").isNull(),
               F.lit("continue"))
        .when(
            F.col("__r0").isNull()
            | (F.col("__r1").isNotNull() & (F.col("__r1") <= F.col("__r0"))),
            F.lit("accept_h1"),
        )
        .otherwise(F.lit("accept_h0"))
    )
    llr_final = (
        F.col("n_success").cast("double") * F.lit(l1)
        + (F.col("n_total") - F.col("n_success")).cast("double") * F.lit(l0)
    )
    return agg.select(
        *g,
        "n_total",
        "n_success",
        decision.alias("decision"),
        F.least(F.col("__r1"), F.col("__r0")).cast("long").alias(
            "n_at_decision"
        ),
        F.round(llr_final, 6).alias("llr_final"),
    )


#: two-sided Pocock critical values for K equally-spaced looks, α=0.05
#: (Pocock 1977, table 2)
POCOCK_BOUNDS = {1: 1.960, 2: 2.178, 3: 2.289, 4: 2.361, 5: 2.413}


def group_sequential_looks(
    events: DataFrame,
    success: Column,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    *,
    p0: float = 0.5,
    n_looks: int = 5,
) -> DataFrame:
    """Group-sequential interim analysis with Pocock boundaries
    (Pocock 1977): split each group's event stream into *n_looks*
    equally-sized interim looks, compute the one-sample proportion
    z-statistic against H0: p = *p0* at each look, and flag
    boundary crossings — the scheduled-peeking counterpart to the
    continuous SPRT monitor (x196): SPRT decides per event, this
    decides at K planned looks with the constant Pocock critical
    value holding family-wise α at 0.05.

    Engine-exactness: look assignment is integer arithmetic on the
    within-group rank against the exact total (``ceil(rn·K/N)``);
    z is one double composition over exact cumulative counts.

    Scale shape: one group-keyed ordered window (rank + running
    successes), a 1-row-per-group total joined back on the group key,
    and a (group, look) max — |groups|·K output rows.

    Output: ``(*group_cols, look, n_at_look, successes, z, crossed,
    bound)`` — *crossed* per look; the first true look is where a
    monitored experiment stops.
    """
    if n_looks not in POCOCK_BOUNDS:
        raise ValueError(f"no Pocock bound tabulated for K={n_looks}")
    bound = POCOCK_BOUNDS[n_looks]
    g = list(group_cols)
    w = Window.partitionBy(*g).orderBy(*[F.col(c) for c in order_cols])
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    staged = events.select(
        *g, *order_cols, success.cast("long").alias("__s")
    ).select(
        *g,
        F.row_number().over(w).alias("__rn"),
        F.sum("__s").over(run).alias("__cs"),
    )
    totals = staged.groupBy(*g).agg(F.max("__rn").alias("__n"))
    # look k contains ranks in (N·(k−1)/K, N·k/K]: assignment is
    # ceil(rn·K/N) via integer arithmetic — exact in both engines
    looked = staged.join(totals, on=g).withColumn(
        "look",
        # integer DIV, not float /: exact ceil for any stream length
        F.expr(f"(__rn * {int(n_looks)} + __n - 1) DIV __n").cast("long"),
    )
    per_look = looked.groupBy(*g, "look").agg(
        F.max(F.struct("__rn", "__cs")).alias("__last"),
    )
    n_at = F.col("__last.__rn").cast("double")
    phat = F.col("__last.__cs").cast("double") / n_at
    z = (
        (phat - F.lit(float(p0)))
        * F.sqrt(n_at)
        / F.sqrt(F.lit(float(p0) * (1.0 - float(p0))))
    )
    return per_look.select(
        *g,
        F.col("look").cast("long").alias("look"),
        F.col("__last.__rn").cast("long").alias("n_at_look"),
        F.col("__last.__cs").cast("long").alias("successes"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > F.lit(bound)).alias("crossed"),
        F.lit(bound).alias("bound"),
    )


def logrank_test(
    durations: DataFrame,
    *,
    group_col: str = "cohort",
    t_col: str = "t",
    censored_col: str = "censored",
) -> DataFrame:
    """Two-group log-rank test over right-censored durations — "do
    these two survival curves differ", the inferential companion to
    the Kaplan–Meier estimator (behavior.kaplan_meier): same input
    shape (one row per subject, integer duration, 0/1 censoring
    flag) plus a binary 0/1 *group_col*.

    At each event time: observed group-1 events ``d1`` vs expected
    ``E1 = d·n1/n`` under the null (hypergeometric draw from the
    pooled risk set), variance ``V = d·(n1/n)·(1−n1/n)·(n−d)/(n−1)``;
    ``χ² = (Σ(d1−E1))² / ΣV`` with 1 df, so the p-value is exactly
    ``2·(1−Φ(√χ²))`` via the shared A&S tail — no chi-square
    approximation needed.

    Plan shape (the kaplan_meier contract): ONE aggregation keyed by
    duration bounds everything after it by the distinct-duration
    count; risk sets come from exclusive cumulative sums over those
    bounded rows, totals from a broadcast 1-row agg, and the two
    score sums are decimal(38,18)-cast.  The windows on the bounded
    t-table are unpartitioned BY DESIGN — |rows| = distinct
    durations (the monitoring grain, e.g. days), not subjects.

    Output: one row ``(n1, n0, events1, events0, o_minus_e, var_sum,
    chi2, p_value)``.
    """
    from .quality import normal_p_two_sided

    g1 = F.col(group_col).cast("int")
    ev = F.lit(1) - F.col(censored_col).cast("int")
    per_t = (
        durations.groupBy(F.col(t_col).cast("long").alias("__t"))
        .agg(
            F.sum(g1).alias("__m1"),
            F.sum(F.lit(1) - g1).alias("__m0"),
            F.sum(g1 * ev).alias("__d1"),
            F.sum((F.lit(1) - g1) * ev).alias("__d0"),
        )
    )
    tot = per_t.agg(
        F.sum("__m1").cast("long").alias("__T1"),
        F.sum("__m0").cast("long").alias("__T0"),
    )
    w_excl = (
        Window.orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        per_t.withColumn(
            "__c1", F.coalesce(F.sum("__m1").over(w_excl), F.lit(0))
        )
        .withColumn(
            "__c0", F.coalesce(F.sum("__m0").over(w_excl), F.lit(0))
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("__n1", F.col("__T1") - F.col("__c1"))
        .withColumn("__n0", F.col("__T0") - F.col("__c0"))
        .where((F.col("__d1") + F.col("__d0")) > 0)
    )
    n1 = F.col("__n1").cast("double")
    n = (F.col("__n1") + F.col("__n0")).cast("double")
    d = (F.col("__d1") + F.col("__d0")).cast("double")
    e1 = d * n1 / n
    v = F.try_divide(
        d * (n1 / n) * (F.lit(1.0) - n1 / n) * (n - d), n - F.lit(1.0)
    )
    agg = risk.groupBy().agg(
        F.max("__T1").alias("n1"),
        F.max("__T0").alias("n0"),
        F.sum("__d1").cast("long").alias("events1"),
        F.sum("__d0").cast("long").alias("events0"),
        F.sum((F.col("__d1").cast("double") - e1).cast("decimal(38,18)"))
        .cast("double")
        .alias("__oe"),
        F.sum(F.coalesce(v, F.lit(0.0)).cast("decimal(38,18)"))
        .cast("double")
        .alias("__v"),
    )
    chi2 = F.try_divide(F.col("__oe") * F.col("__oe"), F.col("__v"))
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n0").cast("long").alias("n0"),
        "events1",
        "events0",
        F.round(F.col("__oe"), 6).alias("o_minus_e"),
        F.round(F.col("__v"), 6).alias("var_sum"),
        F.round(chi2, 6).alias("chi2"),
        F.round(normal_p_two_sided(F.sqrt(chi2)), 6).alias("p_value"),
    )


def cochran_armitage_trend(
    counts: DataFrame,
    score_col: str,
    success_col: str,
    total_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Cochran–Armitage trend test (Cochran 1954, Armitage 1955) on a
    pre-aggregated dose table: is a binary outcome's success rate
    monotonically trending across ORDERED exposure levels — the
    categorical-trend complement to the two-group rate tests (x66,
    x216): chi-square asks "any association", this asks "a trend in
    the stated order", with one dof and correspondingly more power.

    Input is one row per (group, level): an integer *score_col*
    (the level's order/dose), *success_col* successes out of
    *total_col* trials.  ``T = Σsᵢx₁ᵢ − (N₁/N)Σsᵢnᵢ``,
    ``Var(T) = p̄(1−p̄)·[Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N]``, ``z = T/√Var``,
    two-sided A&S p-value.  Every sum is over the BOUNDED level rows
    (integers until the final z), so the statistic is engine-exact.

    Scale shape: pure column algebra on the counts frame — callers
    produce it with ONE keyed aggregation over the fact table; this
    adds one tiny groupBy over |levels| rows per group.

    Output per group: ``(*group_cols, n_levels, n, n_success, z,
    p_value)`` — null z/p for degenerate tables (one level, or
    all-success/all-failure).
    """
    from .quality import normal_p_two_sided

    g = list(group_cols)
    s = F.col(score_col).cast("long")
    x1 = F.col(success_col).cast("long")
    nt = F.col(total_col).cast("long")
    agg = counts.groupBy(*[F.col(c) for c in g]).agg(
        F.count(F.lit(1)).cast("long").alias("n_levels"),
        F.sum(nt).cast("long").alias("n"),
        F.sum(x1).cast("long").alias("n_success"),
        F.sum(s * x1).cast("long").alias("__sx"),
        F.sum(s * nt).cast("long").alias("__sn"),
        F.sum(s * s * nt).cast("long").alias("__s2n"),
    )
    nd = F.col("n").cast("double")
    n1 = F.col("n_success").cast("double")
    pbar = n1 / nd
    t_stat = (
        F.col("__sx").cast("double") - pbar * F.col("__sn").cast("double")
    )
    var_t = (
        pbar
        * (F.lit(1.0) - pbar)
        * (
            F.col("__s2n").cast("double")
            - F.col("__sn").cast("double")
            * F.col("__sn").cast("double")
            / nd
        )
    )
    z = F.try_divide(t_stat, F.sqrt(var_t))
    ok = (F.col("n_levels") >= 2) & (var_t > 0)
    return agg.select(
        *g,
        "n_levels",
        "n",
        "n_success",
        F.round(F.when(ok, z), 6).alias("z"),
        F.round(F.when(ok, normal_p_two_sided(z)), 6).alias("p_value"),
    )


def mcnemar_test(
    df: DataFrame,
    id_cols: Sequence[str],
    pre_col: str,
    post_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """McNemar paired-proportion test (McNemar 1947): did a binary
    per-subject state flip between two paired observations — the
    within-subject counterpart to the independent-groups A/B test
    (x66), and the right test for before/after questions (did the
    same users keep purchasing after a change) where pairing removes
    between-user variance.

    Input: one row per subject (*id_cols*) with boolean/0-1 *pre_col*
    and *post_col*.  Only the discordant cells carry information:
    ``b = #(1→0)``, ``c = #(0→1)``,
    ``χ² = (|b−c|−1)²/(b+c)`` (Edwards continuity correction), and
    the 1-dof chi-square tail is computed EXACTLY as
    ``p = 2·Φ̄(√χ²)`` — an identity, not an approximation, so the
    only inexactness is the shared A&S erf polynomial.

    Scale shape: one hash aggregation over subjects per group —
    counts only, no pairwise anything; subjects arrive pre-collapsed
    by the caller's keyed aggregation.

    Output per group: ``(*group_cols, n, n_pre, n_post, b, c, chi2,
    p_value)`` — null chi2/p when b + c = 0 (no discordant pairs).
    """
    from .quality import normal_p_two_sided

    g = list(group_cols)
    pre = F.col(pre_col).cast("boolean")
    post = F.col(post_col).cast("boolean")
    agg = df.groupBy(*[F.col(c) for c in g]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(pre, 1).otherwise(0)).cast("long").alias("n_pre"),
        F.sum(F.when(post, 1).otherwise(0)).cast("long").alias("n_post"),
        F.sum(F.when(pre & ~post, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~pre & post, 1).otherwise(0)).cast("long").alias("c"),
    )
    bd = F.col("b").cast("double")
    cd = F.col("c").cast("double")
    num = (F.abs(bd - cd) - F.lit(1.0))
    chi2 = F.try_divide(
        F.greatest(num, F.lit(0.0)) * F.greatest(num, F.lit(0.0)),
        bd + cd,
    )
    ok = (F.col("b") + F.col("c")) > 0
    return agg.select(
        *g,
        "n",
        "n_pre",
        "n_post",
        "b",
        "c",
        F.round(F.when(ok, chi2), 6).alias("chi2"),
        F.round(
            F.when(ok, normal_p_two_sided(F.sqrt(chi2))), 6
        ).alias("p_value"),
    )


def delta_method_ratio(
    df: DataFrame,
    num_col: str,
    den_col: str,
    unit_col: str,
    group_cols: Sequence[str] = (),
    *,
    z: float = 1.959964,
) -> DataFrame:
    """Closed-form delta-method variance of a ratio-of-sums metric
    with unit-level clustering (Deng, Knoblich & Lu 2018, "Applying
    the Delta Method in Metric Analytics"): for ``R = ΣY_u / ΣN_u``
    over units u,

    ``Var(R) ≈ (s_yy − 2R·s_yn + R²·s_nn) / (k · n̄²)``

    with s_* the sample (co)variances of the per-unit pairs
    ``(Y_u, N_u)`` and ``n̄`` the mean denominator.  The analytic
    counterpart to the bucketed jackknife (``sketch.
    jackknife_ratio_se``): no replicates at all, one pass of decimal
    moments — the two should (and in the registry do) agree to a few
    percent, which is itself a useful health check on either.

    Engine-exactness: per-unit sums use decimal(15,8); moment
    products are the asymmetric (20,8)x(15,8) pairing — the width
    that is exact in BOTH engines (a symmetric square trips DuckDB's
    int64 fast path at runtime); all cross-unit sums are decimal;
    the variance composition is one double expression over those
    exact totals.

    Scale shape: one keyed agg to units, one keyed agg to groups —
    nothing else.

    Output: ``(*group_cols, n_units, ratio, se, ci_lo, ci_hi)``
    (6 dp); se null when k < 2 or the denominator total is 0.
    """
    g = list(group_cols)
    dec = "decimal(15,8)"
    wide = "decimal(20,8)"
    per_unit = (
        df.where(F.col(num_col).isNotNull() & F.col(den_col).isNotNull())
        .groupBy(*g, F.col(unit_col).alias("__u"))
        .agg(
            F.sum(F.col(num_col).cast(dec)).cast(dec).alias("__yu"),
            F.sum(F.col(den_col).cast(dec)).cast(dec).alias("__nu"),
        )
    )
    # (20,8)x(15,8): the one decimal product width that is exact in
    # BOTH engines (Spark 36, DuckDB 35; a symmetric (18,6)^2 trips
    # DuckDB's int64 fast path at runtime)
    agg = per_unit.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("__yu").cast("double").alias("__sy"),
        F.sum("__nu").cast("double").alias("__sn"),
        F.sum(F.col("__yu").cast(wide) * F.col("__yu"))
        .cast("double").alias("__syy"),
        F.sum(F.col("__nu").cast(wide) * F.col("__nu"))
        .cast("double").alias("__snn"),
        F.sum(F.col("__yu").cast(wide) * F.col("__nu"))
        .cast("double").alias("__syn"),
    )
    k = F.col("n_units").cast("double")
    r = F.try_divide(F.col("__sy"), F.col("__sn"))
    nbar = F.col("__sn") / k
    s_yy = (F.col("__syy") - F.col("__sy") * F.col("__sy") / k) / (k - 1.0)
    s_nn = (F.col("__snn") - F.col("__sn") * F.col("__sn") / k) / (k - 1.0)
    s_yn = (F.col("__syn") - F.col("__sy") * F.col("__sn") / k) / (k - 1.0)
    var = F.try_divide(
        s_yy - 2.0 * r * s_yn + r * r * s_nn, k * nbar * nbar
    )
    se = F.sqrt(F.greatest(var, F.lit(0.0)))
    ok = (F.col("n_units") >= 2) & (F.col("__sn") != 0.0)
    return agg.select(
        *g,
        "n_units",
        F.round(r, 6).alias("ratio"),
        F.round(F.when(ok, se), 6).alias("se"),
        F.round(F.when(ok, r - F.lit(float(z)) * se), 6).alias("ci_lo"),
        F.round(F.when(ok, r + F.lit(float(z)) * se), 6).alias("ci_hi"),
    )


def mde_table(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    group_cols: Sequence[str] = (),
    *,
    alpha_z: float = 1.959964,
    power_z: float = 0.841621,
) -> DataFrame:
    """Minimum detectable effect at current traffic: for each group,
    the absolute and relative lift a 50/50 two-arm experiment on the
    per-unit metric could detect at two-sided α (z_{α/2} =
    *alpha_z*) and power 1−β (z_β = *power_z*):

    ``MDE = (z_{α/2} + z_β) · sqrt(2·s² / (k/2))``

    with s² the sample variance of per-unit values and k the unit
    count — the pre-experiment feasibility readout every A/B
    program keeps on a dashboard ("can this segment even detect a
    2% move?").  Normal-quantile constants are injected as literals
    (neither engine exposes an inverse normal CDF; the defaults are
    α = 0.05, power = 0.80).

    Engine-exactness: decimal(15,8) per-unit sums and the
    (20,8)x(15,8) moment product (the ``delta_method_ratio``
    discipline); the MDE is one double composition over exact
    totals.

    Scale shape: one keyed agg to units, one to groups.

    Output: ``(*group_cols, n_units, n_per_arm, mean, sd, mde_abs,
    mde_rel)`` (6 dp); null MDE when k < 4 or zero variance.
    """
    g = list(group_cols)
    dec = "decimal(15,8)"
    per_unit = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*g, F.col(unit_col).alias("__u"))
        .agg(F.sum(F.col(value_col).cast(dec)).cast(dec).alias("__yu"))
    )
    agg = per_unit.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("__yu").cast("double").alias("__sy"),
        F.sum(F.col("__yu").cast("decimal(20,8)") * F.col("__yu"))
        .cast("double").alias("__syy"),
    )
    k = F.col("n_units").cast("double")
    mean = F.col("__sy") / k
    var = (F.col("__syy") - F.col("__sy") * F.col("__sy") / k) / (k - 1.0)
    n_arm = F.floor(F.col("n_units") / 2).cast("long")
    mde = (
        F.lit(float(alpha_z) + float(power_z))
        * F.sqrt(2.0 * var / n_arm.cast("double"))
    )
    ok = (F.col("n_units") >= 4) & (var > 0)
    return agg.select(
        *g,
        "n_units",
        n_arm.alias("n_per_arm"),
        F.round(mean, 6).alias("mean"),
        F.round(F.when(F.col("n_units") >= 2, F.sqrt(var)), 6).alias("sd"),
        F.round(F.when(ok, mde), 6).alias("mde_abs"),
        F.round(F.when(ok, F.try_divide(mde, mean)), 6).alias("mde_rel"),
    )


def randomization_test(
    units: DataFrame,
    unit_col: str,
    variant_col: str,
    y_col: str,
    *,
    n_perm: int = 100,
    salt: str = "perm",
) -> DataFrame:
    """Hash-randomization test for a difference in unit-level means:
    the observed ``mean_a − mean_b`` is ranked against *n_perm*
    pseudo-random reassignments of units to arms, and the p-value is
    the fraction of reassignments at least as extreme —
    ``p = (1 + #{|Δ_b| ≥ |Δ_obs|}) / (n_perm + 1)`` (Monte-Carlo
    randomization inference, Edgington 1969 / Fisher's exact logic
    without any normality or variance assumption — the
    distribution-free cross-check on the z/t screens x66/x222 for
    heavy-tailed metrics where CLT-based SEs lie).

    Reassignment b for unit u is the parity of a salted md5 hash of
    ``(salt, b, u)`` — fully deterministic, replayable in ANSI SQL,
    and independent across b.  (This is RANDOMIZATION inference —
    arms are re-drawn 50/50 per unit, Binomial sizes — not the
    fixed-margin permutation variant, which would need a global
    shuffle-sort per replicate; at n_units → ∞ the two coincide.)

    Engine-exactness: y is quantized at decimal(28,6) (the
    ``corr_pairs`` idiom) so every per-arm sum is exact; each Δ_b is
    then one double expression, and the ≥ comparison is on exact
    doubles — replicate accumulation order cannot flip the count.

    Scale shape: the *n_perm*-fold explode replicates the UNIT table
    (already collapsed from the event grain), not the fact table:
    cost is O(n_units · n_perm) rows into ONE map-side-combinable
    hash agg of 2·n_perm cells.  No global sorts, no windows.

    Output: one row ``(n_units, n_a, n_b, n_perm, diff_obs,
    n_as_extreme, p_value)`` (6 dp).
    """
    n_perm = int(n_perm)
    dec = "decimal(28,6)"
    u = units.where(
        F.col(unit_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(unit_col).cast("string").alias("__u"),
        F.col(variant_col).alias("__v"),
        F.col(y_col).cast(dec).alias("__y"),
    )
    obs = u.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(F.when(F.col("__v") == "a", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("__v") == "b", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("__v") == "a", F.col("__y"))).alias("__sa"),
        F.sum(F.when(F.col("__v") == "b", F.col("__y"))).alias("__sb"),
    )
    d_obs = (
        F.col("__sa").cast("double") / F.col("n_a").cast("double")
        - F.col("__sb").cast("double") / F.col("n_b").cast("double")
    )
    obs = obs.select(
        "n_units", "n_a", "n_b", d_obs.alias("__d_obs")
    )
    rep = u.select(
        "__u",
        "__y",
        F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("__b"),
    )
    parity = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col("__b").cast("string"),
                        F.col("__u"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    per_b = (
        rep.withColumn("__arm", parity)
        .groupBy("__b")
        .agg(
            F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("__na"),
            F.sum(F.when(F.col("__arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("__nb"),
            F.sum(F.when(F.col("__arm") == 0, F.col("__y"))).alias("__pa"),
            F.sum(F.when(F.col("__arm") == 1, F.col("__y"))).alias("__pb"),
        )
        .select(
            (
                F.col("__pa").cast("double") / F.col("__na").cast("double")
                - F.col("__pb").cast("double") / F.col("__nb").cast("double")
            ).alias("__d")
        )
    )
    ranked = per_b.crossJoin(F.broadcast(obs)).groupBy(
        "n_units", "n_a", "n_b", "__d_obs"
    ).agg(
        F.sum(
            F.when(F.abs(F.col("__d")) >= F.abs(F.col("__d_obs")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_as_extreme")
    )
    return ranked.select(
        "n_units",
        "n_a",
        "n_b",
        F.lit(n_perm).cast("long").alias("n_perm"),
        F.round(F.col("__d_obs"), 6).alias("diff_obs"),
        "n_as_extreme",
        F.round(
            (F.col("n_as_extreme") + 1).cast("double")
            / F.lit(float(n_perm + 1)),
            6,
        ).alias("p_value"),
    )


def welch_t(
    units: DataFrame,
    variant_col: str,
    y_col: str,
) -> DataFrame:
    """Welch's unequal-variance t-test on unit-level means (Welch
    1947): ``t = (m_a − m_b)/√(v_a/n_a + v_b/n_b)`` with the
    Welch–Satterthwaite effective df — the default two-sample mean
    test when arms differ in size or spread, sitting between the
    conversion z-test (x66, binary) and the randomization test
    (x228, assumption-free but 100× the compute).  The p-value uses
    the normal tail (the x213/x195 A&S polynomial) — indistinguishable
    from the t tail at unit counts where Spark is involved; gate on
    |t| against t-table criticals below n ≈ 30.

    Engine-exactness: the per-arm power sums quantize y at
    decimal(28,6) (the ``corr_pairs`` idiom); means, SAMPLE variances
    (n−1), t, and df are then one double expression mirrored in the
    oracle.

    Scale shape: ONE map-side-combinable hash aggregation over the
    unit frame; output is a single row.

    Output: ``(n_a, n_b, mean_a, mean_b, t_stat, df, p_value)``
    (6 dp; null t when either arm has < 2 units or zero variance
    in both).
    """
    from .quality import normal_p_two_sided

    dec = "decimal(28,6)"
    y = F.col(y_col).cast(dec)
    is_a = F.col(variant_col) == "a"
    is_b = F.col(variant_col) == "b"
    agg = units.where(F.col(y_col).isNotNull()).groupBy().agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, y)).alias("__sa"),
        F.sum(F.when(is_b, y)).alias("__sb"),
        F.sum(F.when(is_a, y * y)).alias("__qa"),
        F.sum(F.when(is_b, y * y)).alias("__qb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa = F.col("__sa").cast("double")
    sb = F.col("__sb").cast("double")
    qa = F.col("__qa").cast("double")
    qb = F.col("__qb").cast("double")
    ma = sa / na
    mb = sb / nb
    va = F.try_divide(qa - sa * sa / na, na - 1.0)
    vb = F.try_divide(qb - sb * sb / nb, nb - 1.0)
    se2 = va / na + vb / nb
    t = F.try_divide(ma - mb, F.sqrt(se2))
    df = F.try_divide(
        se2 * se2,
        F.try_divide(va * va, na * na * (na - 1.0))
        + F.try_divide(vb * vb, nb * nb * (nb - 1.0)),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("df"),
        F.round(normal_p_two_sided(t), 6).alias("p_value"),
    )


def diff_in_diff(
    units: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """Two-period difference-in-differences on unit-level outcomes:
    ``DID = (post_t − pre_t) − (post_c − pre_c)`` with the SE from the
    unit-level per-arm variance of the within-unit change Δ = post −
    pre (Bertrand et al. 2004's unit-collapse prescription — serial
    correlation within a unit is absorbed into Δ, so the SE is honest
    where a pooled four-cell variance is not).  The launch-impact
    estimator when assignment wasn't randomized but both arms share a
    pre-period trend; CUPED (x108) adjusts a randomized experiment,
    DID de-biases an observational rollout.

    *units* must already be one row per unit with its pre-period and
    post-period outcome (the x221/x222 unit-collapse discipline);
    units missing either period are excluded (Δ undefined).

    Engine-exactness: Δ is one IEEE subtraction; per-arm power sums
    quantize Δ at decimal(28,6) (the ``corr_pairs`` idiom); the DID,
    Welch-style SE, z, and the A&S normal p are one double
    composition.

    Scale shape: ONE map-side-combinable hash aggregation; single
    output row.

    Output: ``(n_t, n_c, pre_t, post_t, pre_c, post_c, did, se, z,
    p_value)`` (6 dp).
    """
    from .quality import normal_p_two_sided

    dec = "decimal(28,6)"
    base = units.where(
        F.col(pre_col).isNotNull() & F.col(post_col).isNotNull()
    ).select(
        F.col(variant_col).alias("__v"),
        F.col(pre_col).cast(dec).alias("__pre"),
        F.col(post_col).cast(dec).alias("__post"),
        (F.col(post_col) - F.col(pre_col)).cast(dec).alias("__d"),
    )
    is_t = F.col("__v") == "t"
    is_c = F.col("__v") == "c"
    agg = base.groupBy().agg(
        F.sum(F.when(is_t, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(is_c, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(is_t, F.col("__pre"))).alias("__pt"),
        F.sum(F.when(is_t, F.col("__post"))).alias("__ot"),
        F.sum(F.when(is_c, F.col("__pre"))).alias("__pc"),
        F.sum(F.when(is_c, F.col("__post"))).alias("__oc"),
        F.sum(F.when(is_t, F.col("__d"))).alias("__dt"),
        F.sum(F.when(is_c, F.col("__d"))).alias("__dc"),
        F.sum(F.when(is_t, F.col("__d") * F.col("__d"))).alias("__qt"),
        F.sum(F.when(is_c, F.col("__d") * F.col("__d"))).alias("__qc"),
    )
    nt = F.col("n_t").cast("double")
    nc = F.col("n_c").cast("double")
    dt = F.col("__dt").cast("double")
    dc = F.col("__dc").cast("double")
    qt = F.col("__qt").cast("double")
    qc = F.col("__qc").cast("double")
    vt = F.try_divide(qt - dt * dt / nt, nt - 1.0)
    vc = F.try_divide(qc - dc * dc / nc, nc - 1.0)
    did = dt / nt - dc / nc
    se = F.sqrt(vt / nt + vc / nc)
    z = F.try_divide(did, se)
    return agg.select(
        "n_t",
        "n_c",
        F.round(F.col("__pt").cast("double") / nt, 6).alias("pre_t"),
        F.round(F.col("__ot").cast("double") / nt, 6).alias("post_t"),
        F.round(F.col("__pc").cast("double") / nc, 6).alias("pre_c"),
        F.round(F.col("__oc").cast("double") / nc, 6).alias("post_c"),
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(z, 6).alias("z"),
        F.round(normal_p_two_sided(z), 6).alias("p_value"),
    )


def session_gap_sweep(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts_us",
    thresholds_us: Sequence[int] = (
        900_000_000,
        1_800_000_000,
        3_600_000_000,
        7_200_000_000,
    ),
) -> DataFrame:
    """Session-count sensitivity sweep: how many sessions (and events
    per session) the corpus yields at EACH candidate inactivity gap —
    from ONE pass.  A session count is Σ_users (1 + #gaps > T), so
    after the single lag-window gap table every threshold is one
    conditional counter in the same hash aggregation; the naive
    approach re-sessionizes (re-shuffles, re-windows) per threshold.
    This is the calibration table consulted BEFORE the 30-minute
    industry default gets hard-coded into x11's sessionizer.

    Everything is integer counting — engine-exact by construction.

    Output per threshold: ``(threshold_us, n_users, n_events,
    n_sessions, events_per_session)`` (6 dp).
    """
    ths = sorted({int(t) for t in thresholds_us})
    w = Window.partitionBy("__u").orderBy("__ts")
    gaps = events.select(
        F.col(entity_col).alias("__u"), F.col(ts_col).alias("__ts")
    ).withColumn("__gap", F.col("__ts") - F.lag("__ts").over(w))
    agg = gaps.groupBy().agg(
        F.countDistinct("__u").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        *[
            F.sum(F.when(F.col("__gap") > t, 1).otherwise(0))
            .cast("long")
            .alias(f"__breaks_{t}")
            for t in ths
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).cast("long").alias("threshold_us"),
                (F.col("n_users") + F.col(f"__breaks_{t}"))
                .cast("long")
                .alias("n_sessions"),
            )
            for t in ths
        ]
    )
    return (
        agg.select("n_users", "n_events", F.explode(rows).alias("__r"))
        .select(
            F.col("__r.threshold_us").alias("threshold_us"),
            "n_users",
            "n_events",
            F.col("__r.n_sessions").alias("n_sessions"),
            F.round(
                F.col("n_events").cast("double")
                / F.col("__r.n_sessions").cast("double"),
                6,
            ).alias("events_per_session"),
        )
    )


def mantel_haenszel(
    df: DataFrame,
    stratum_col: str,
    arm_col: str,
    outcome_col: str,
) -> DataFrame:
    """Mantel–Haenszel common odds ratio + Cochran–Mantel–Haenszel
    1-dof chi-square (Mantel & Haenszel 1959, JNCI) over per-stratum
    2×2 tables, with the collapsed (pooled) odds ratio alongside —
    the stratified-vs-pooled pair IS the Simpson's-paradox audit: when
    ``or_pooled`` sits on the other side of 1 from ``or_mh``, the
    strata are confounding the marginal table.

    Input: ONE ROW PER UNIT — ``stratum, arm ∈ {0,1},
    outcome ∈ {0,1}`` (callers collapse to unit grain first, the
    x221/x226 discipline).  Cells, margins, and every MH term
    (``a·d/n``, ``b·c/n``, ``E_s = n1·m1/n``,
    ``V_s = n1·n0·m1·m0/(n²(n−1))``) come from ONE stratum-keyed hash
    agg; the cross-stratum reduce is a second 1-row agg of
    decimal(38,12)-quantized terms (order-insensitive), so both
    engines produce identical doubles.  Strata with n < 2 are dropped
    (V undefined).

    χ²_CMH = (Σa − ΣE)²/ΣV, uncorrected; its exact 1-dof tail is
    ``p = 2·Φ̄(√χ²)`` via the shared A&S polynomial.

    Output (single row): ``n_strata, n_units, or_mh, or_pooled,
    chi2, p_value`` (6 dp; ORs null when a zero margin empties the
    denominator sum).
    """
    from .quality import normal_p_two_sided

    arm = F.col(arm_col).cast("long")
    out = F.col(outcome_col).cast("long")
    cells = (
        df.groupBy(F.col(stratum_col).alias("__s"))
        .agg(
            F.sum(arm * out).alias("a"),
            F.sum(arm * (1 - out)).alias("b"),
            F.sum((1 - arm) * out).alias("c"),
            F.sum((1 - arm) * (1 - out)).alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    a, b, c, d = (F.col(x).cast("double") for x in "abcd")
    n1, n0 = a + b, c + d
    m1, m0 = a + c, b + d
    dec = "decimal(38,12)"
    terms = cells.select(
        F.col("a").alias("__a"),
        F.col("b").alias("__b"),
        F.col("c").alias("__c"),
        F.col("d").alias("__d"),
        F.col("n").alias("__n"),
        (a * d / nd).cast(dec).alias("__num"),
        (b * c / nd).cast(dec).alias("__den"),
        (n1 * m1 / nd).cast(dec).alias("__e"),
        (n1 * n0 * m1 * m0 / (nd * nd * (nd - F.lit(1.0))))
        .cast(dec)
        .alias("__v"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("__n").cast("long").alias("n_units"),
        F.sum("__a").cast("long").alias("__sa"),
        F.sum("__b").cast("long").alias("__sb"),
        F.sum("__c").cast("long").alias("__sc"),
        F.sum("__d").cast("long").alias("__sd"),
        F.sum("__num").cast("double").alias("__snum"),
        F.sum("__den").cast("double").alias("__sden"),
        F.sum("__e").cast("double").alias("__se"),
        F.sum("__v").cast("double").alias("__sv"),
    )
    chi2 = F.try_divide(
        (F.col("__sa") - F.col("__se")) * (F.col("__sa") - F.col("__se")),
        F.col("__sv"),
    )
    return agg.select(
        "n_strata",
        "n_units",
        F.round(F.try_divide(F.col("__snum"), F.col("__sden")), 6).alias(
            "or_mh"
        ),
        F.round(
            F.try_divide(
                F.col("__sa").cast("double") * F.col("__sd"),
                F.col("__sb").cast("double") * F.col("__sc"),
            ),
            6,
        ).alias("or_pooled"),
        F.round(chi2, 6).alias("chi2"),
        F.round(normal_p_two_sided(F.sqrt(chi2)), 6).alias("p_value"),
    )


def msprt_monitor(
    df: DataFrame,
    group_cols: Sequence[str],
    day_col: str,
    arm_col: str,
    value_col: str,
    *,
    tau: float = 1.0,
) -> DataFrame:
    """Always-valid mixture-SPRT monitor (Johari, Koomen, Pekelis &
    Walsh 2017/2022, "Peeking at A/B tests"): per look *n*, the
    mixture likelihood ratio against a N(0, τ²) effect prior,

    ``Λ_n = √(V_n/(V_n+τ²)) · exp(δ̂_n²·τ² / (2·V_n·(V_n+τ²)))``

    with ``V_n = σ̂²·(1/n_a + 1/n_b)``, and the ALWAYS-VALID p-value
    ``p_n = min(1, 1/max_{m≤n} Λ_m)`` — monotone non-increasing, so
    stakeholders can peek every day without inflating type-I error
    (the fixed-boundary alternative to the x202 Pocock looks; x196's
    simple SPRT needs a point alternative, the mixture doesn't).

    Scale shape: one (group, day) hash agg of exact decimal per-arm
    moments, then TWO group-keyed cumulative windows (running moment
    sums; running max of Λ) — day cardinality per group is bounded, so
    the windows are short; every cross-day reduce is over exact
    decimals, and Λ is a single IEEE expression both engines evaluate
    identically.

    Output per (group, day): ``(*group_cols, day, n_a, n_b, delta,
    lam, p_always)`` — null Λ until both arms have ≥2 units and
    σ̂² > 0.
    """
    g = list(group_cols)
    t2 = float(tau) * float(tau)
    arm = F.col(arm_col).cast("string")
    v = F.col(value_col).cast("double")
    dec6, dec12 = "decimal(28,6)", "decimal(38,12)"
    daily = df.where(v.isNotNull()).groupBy(
        *g, F.col(day_col).alias("day")
    ).agg(
        F.sum(F.when(arm == "a", 1).otherwise(0)).alias("__na"),
        F.sum(F.when(arm == "a", v).otherwise(0.0).cast(dec6)).alias("__sa"),
        F.sum(F.when(arm == "a", v * v).otherwise(0.0).cast(dec12)).alias(
            "__ssa"
        ),
        F.sum(F.when(arm == "b", 1).otherwise(0)).alias("__nb"),
        F.sum(F.when(arm == "b", v).otherwise(0.0).cast(dec6)).alias("__sb"),
        F.sum(F.when(arm == "b", v * v).otherwise(0.0).cast(dec12)).alias(
            "__ssb"
        ),
    )
    wc = (
        Window.partitionBy(*g)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        *g,
        "day",
        F.sum("__na").over(wc).cast("long").alias("cna"),
        F.sum("__sa").over(wc).cast("double").alias("csa"),
        F.sum("__ssa").over(wc).cast("double").alias("cssa"),
        F.sum("__nb").over(wc).cast("long").alias("cnb"),
        F.sum("__sb").over(wc).cast("double").alias("csb"),
        F.sum("__ssb").over(wc).cast("double").alias("cssb"),
    )
    na, nb = F.col("cna").cast("double"), F.col("cnb").cast("double")
    delta = F.col("csa") / na - F.col("csb") / nb
    s2 = (
        (F.col("cssa") - F.col("csa") * F.col("csa") / na)
        + (F.col("cssb") - F.col("csb") * F.col("csb") / nb)
    ) / (na + nb - F.lit(2.0))
    vn = s2 * (F.lit(1.0) / na + F.lit(1.0) / nb)
    a_ = vn + F.lit(t2)
    # Λ is capped at 1e6 (p floors at a decisive 1e-6): beyond that
    # magnitude the exp() implementations of different engines differ
    # in the last ulp by more than the 6-dp rounding can absorb, and
    # the always-valid decision is identical either way
    lam = F.when(
        (F.col("cna") >= 2) & (F.col("cnb") >= 2) & (s2 > 0),
        F.least(
            F.sqrt(vn / a_)
            * F.exp(delta * delta * F.lit(t2) / (F.lit(2.0) * vn * a_)),
            F.lit(1e6),
        ),
    )
    scored = cum.select(
        *g, "day",
        F.col("cna").alias("n_a"),
        F.col("cnb").alias("n_b"),
        F.round(delta, 6).alias("delta"),
        lam.alias("__lam"),
    )
    wmax = (
        Window.partitionBy(*g)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return scored.withColumn(
        "__mx", F.max("__lam").over(wmax)
    ).select(
        *g, "day", "n_a", "n_b", "delta",
        F.round(F.col("__lam"), 6).alias("lam"),
        F.round(
            F.when(
                F.col("__mx").isNotNull(),
                F.least(F.lit(1.0), F.lit(1.0) / F.col("__mx")),
            ),
            6,
        ).alias("p_always"),
    )


def markov_prediction_eval(
    df: DataFrame,
    user_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
    *,
    day_us: int = 86_400_000_000,
) -> DataFrame:
    """Temporally-split evaluation of the first-order Markov
    next-event predictor: train the x34 transition matrix on the
    FIRST half of the time range, predict ``argmax P(next|prev)`` on
    the SECOND half, and report per-state top-1 accuracy.  This is
    the eval protocol the transition matrix itself never gets — and
    the protocol matters: an in-sample argmax overstates accuracy
    exactly when behavior drifts (compare with x58's drift view).
    The split is BY TIME, not by user — the x125 leakage rule: a
    random row split would train on a user's later events and eval
    on their earlier ones.

    Scale shape: one user-keyed lag window builds transitions tagged
    by eval-side; the cutoff is a 1-row (min+max)/2 summary broadcast
    back; the model is a train-side (prev, next) count agg argmaxed
    per prev (count desc, next asc — deterministic); eval joins the
    broadcast-small model on prev and reduces per prev.

    Output per prev state: ``state, predicted, n_train, n_eval,
    n_correct, accuracy`` (6 dp) — states with no eval transitions
    are omitted; eval transitions whose prev state was never seen in
    training predict nothing and count as wrong (cold-start honesty).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    trans = (
        df.select(
            F.col(user_col).alias("__u"),
            F.col(state_col).alias("__to"),
            F.col(ts_col).alias("__ts"),
            F.lag(F.col(state_col)).over(w).alias("__from"),
        )
        .where(F.col("__from").isNotNull())
    )
    span = df.agg(
        F.min(F.col(ts_col)).alias("__mn"), F.max(F.col(ts_col)).alias("__mx")
    ).select(
        (
            (F.col("__mn") + (F.col("__mx") - F.col("__mn")) / F.lit(2))
        )
        .cast("long")
        .alias("__cut")
    )
    tagged = trans.crossJoin(F.broadcast(span)).withColumn(
        "__is_eval", F.col("__ts") >= F.col("__cut")
    )
    counts = (
        tagged.where(~F.col("__is_eval"))
        .groupBy("__from", "__to")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    wm = Window.partitionBy("__from").orderBy(
        F.desc("__n"), F.asc("__to")
    )
    model = (
        counts.withColumn("__rn", F.row_number().over(wm))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__from"),
            F.col("__to").alias("predicted"),
            F.col("__n").cast("long").alias("n_train"),
        )
    )
    ev = tagged.where(F.col("__is_eval")).join(
        F.broadcast(model), "__from", "left"
    )
    return (
        ev.groupBy(
            F.col("__from").alias("state"),
            F.col("predicted"),
            F.col("n_train"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(
                F.when(F.col("__to") == F.col("predicted"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .withColumn(
            "accuracy",
            F.round(
                F.col("n_correct") / F.col("n_eval").cast("double"), 6
            ),
        )
    )


def mix_shift_decomposition(
    df: DataFrame,
    stratum_col: str,
    group_col: str,
    metric_col: str,
    *,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-fold Oaxaca–Blinder / mix-shift decomposition (Kitagawa
    1955; Oaxaca 1973; Blinder 1973) of a mean metric difference:

    ``Δ = Σ_s w_b(s)·(r_a(s) − r_b(s))  +  Σ_s r_a(s)·(w_a(s) − w_b(s))``
            └──────── rate effect ────────┘  └──────── mix effect ────────┘

    — did the metric move because WITHIN-stratum rates moved, or
    because the stratum MIX moved?  The first question every
    period-over-period metric review asks, answered exactly: the two
    effects sum to Δ by identity (strata absent from one group take
    rate 0 and weight 0 there, which preserves the identity).

    Scale shape: ONE (stratum, group) hash agg of exact decimal
    count/sum moments; everything after is arithmetic on a
    |strata|-row frame with decimal(38,12)-quantized term sums.

    Output (single row): ``n_a, n_b, mean_a, mean_b, delta,
    rate_effect, mix_effect`` (6 dp) — ``rate_effect + mix_effect``
    reproduces ``delta`` to rounding.
    """
    dec6 = "decimal(28,6)"
    dec12 = "decimal(38,12)"
    grp = F.col(group_col).cast("string")
    v = F.col(metric_col).cast("double")
    cells = (
        df.where(
            v.isNotNull()
            & F.col(stratum_col).isNotNull()
            & grp.isin(str(group_a), str(group_b))
        )
        .groupBy(F.col(stratum_col).alias("__s"))
        .agg(
            F.sum(F.when(grp == str(group_a), 1).otherwise(0)).alias("__na"),
            F.sum(
                F.when(grp == str(group_a), v).otherwise(0.0).cast(dec6)
            ).alias("__sa"),
            F.sum(F.when(grp == str(group_b), 1).otherwise(0)).alias("__nb"),
            F.sum(
                F.when(grp == str(group_b), v).otherwise(0.0).cast(dec6)
            ).alias("__sb"),
        )
    )
    tot = cells.agg(
        F.sum("__na").cast("long").alias("ta"),
        F.sum("__nb").cast("long").alias("tb"),
    )
    t = cells.crossJoin(F.broadcast(tot))
    ra = F.when(
        F.col("__na") > 0,
        F.col("__sa").cast("double") / F.col("__na").cast("double"),
    ).otherwise(F.lit(0.0))
    rb = F.when(
        F.col("__nb") > 0,
        F.col("__sb").cast("double") / F.col("__nb").cast("double"),
    ).otherwise(F.lit(0.0))
    wa = F.col("__na").cast("double") / F.col("ta").cast("double")
    wb = F.col("__nb").cast("double") / F.col("tb").cast("double")
    terms = t.select(
        "ta",
        "tb",
        F.col("__sa"),
        F.col("__sb"),
        (wb * (ra - rb)).cast(dec12).alias("__rate"),
        (ra * (wa - wb)).cast(dec12).alias("__mix"),
    )
    agg = terms.groupBy("ta", "tb").agg(
        F.sum("__sa").cast("double").alias("__tsa"),
        F.sum("__sb").cast("double").alias("__tsb"),
        F.sum("__rate").cast("double").alias("__re"),
        F.sum("__mix").cast("double").alias("__me"),
    )
    mean_a = F.try_divide(F.col("__tsa"), F.col("ta").cast("double"))
    mean_b = F.try_divide(F.col("__tsb"), F.col("tb").cast("double"))
    return agg.select(
        F.col("ta").alias("n_a"),
        F.col("tb").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(mean_a - mean_b, 6).alias("delta"),
        F.round(F.col("__re"), 6).alias("rate_effect"),
        F.round(F.col("__me"), 6).alias("mix_effect"),
    )


def hitting_probability(
    df: DataFrame,
    user_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
    *,
    target: str,
    horizon: int = 5,
) -> DataFrame:
    """Finite-horizon hitting probability over the empirical event
    Markov chain (the bounded form of absorbing-chain absorption,
    Kemeny & Snell 1960 ch. 3): ``h_k(s) = P(s,T) + Σ_{s'≠T}
    P(s,s')·h_{k−1}(s')`` — the probability a user in state *s*
    reaches *target* within *horizon* steps under the x34 transition
    matrix.  The funnel (x31) asks "did the fixed sequence happen";
    this asks the planning question: from HERE, how likely is
    conversion in the next k actions, with no fixed path assumed.

    Scale shape: transitions are one user-keyed lag window + one
    (from, to) count agg — the |states|² model table is tiny
    thereafter, so the *horizon* supersteps are joins on a frame that
    never touches the raw events again.  Each superstep's expected
    value is a decimal(38,18) product sum rounded to 12 dp — the
    fixpoint iteration stays bit-identical across engines and
    partitionings.

    Output per state: ``state, p_direct, p_hit`` — one-step and
    *horizon*-step probabilities (6 dp), target row included
    (``p_hit = 1`` trivially, stated explicitly for dashboards).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    trans = (
        df.select(
            F.col(state_col).alias("__to"),
            F.lag(F.col(state_col)).over(w).alias("__from"),
        )
        .where(F.col("__from").isNotNull())
        .groupBy("__from", "__to")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    totals = trans.groupBy("__from").agg(F.sum("__n").alias("__tot"))
    p = trans.join(totals, "__from").select(
        "__from",
        "__to",
        (F.col("__n").cast("double") / F.col("__tot").cast("double")).alias(
            "__p"
        ),
    )
    direct = (
        p.where(F.col("__to") == str(target))
        .select(F.col("__from").alias("state"), F.col("__p").alias("h"))
    )
    states = p.select(F.col("__from").alias("state")).distinct()
    h = states.join(direct, "state", "left").select(
        "state", F.round(F.coalesce(F.col("h"), F.lit(0.0)), 12).alias("h")
    )
    p_direct = h
    for _ in range(int(horizon) - 1):
        step = (
            p.where(F.col("__to") != str(target))
            .join(h.withColumnRenamed("state", "__to"), "__to")
            .groupBy(F.col("__from").alias("state"))
            .agg(
                F.sum((F.col("__p") * F.col("h")).cast("decimal(38,18)"))
                .cast("double")
                .alias("__exp")
            )
        )
        h = (
            p_direct.withColumnRenamed("h", "__d")
            .join(step, "state", "left")
            .select(
                "state",
                F.round(
                    F.col("__d") + F.coalesce(F.col("__exp"), F.lit(0.0)),
                    12,
                ).alias("h"),
            )
        )
    return (
        p_direct.withColumnRenamed("h", "__pd")
        .join(h, "state")
        .select(
            "state",
            F.round(F.col("__pd"), 6).alias("p_direct"),
            F.round(
                F.when(F.col("state") == str(target), F.lit(1.0)).otherwise(
                    F.col("h")
                ),
                6,
            ).alias("p_hit"),
        )
    )


def meta_analysis(
    effects: DataFrame,
    effect_col: str,
    var_col: str,
    id_cols: Sequence[str],
) -> DataFrame:
    """Fixed-effect inverse-variance meta-analysis with Cochran's Q
    heterogeneity and Higgins' I² (Cochran 1954; Higgins & Thompson
    2002): pooled effect ``θ̂ = Σwθ/Σw`` (w = 1/var), its standard
    error ``√(1/Σw)``, and the heterogeneity pair that says whether
    pooling was legitimate — ``Q = Σw(θ−θ̂)²`` against k−1 dof
    (Wilson–Hilferty tail, the shared x213 approximation) and
    ``I² = max(0, (Q − df)/Q)``, the share of between-stratum
    variance that is NOT sampling noise.  The aggregation layer for
    any per-stratum effect family (x237 Welch deltas, x239 DID
    units, per-source lifts): one pooled number, plus the license to
    quote it.

    Input: one row per stratum with its effect and variance
    (callers reduce raw data first — the x221 discipline).  Strata
    with null or non-positive variance are dropped.

    Scale shape: two 1-row aggs over the k-row effect table with
    decimal(38,12) term sums; θ̂ broadcasts back for Q.  k is
    dashboard-sized by construction.

    Output (single row): ``k, theta, se, z, q_stat, df, i2,
    p_homogeneity`` (6 dp).
    """
    from .quality import normal_sf

    dec12 = "decimal(38,12)"
    eff = F.col(effect_col).cast("double")
    var = F.col(var_col).cast("double")
    base = effects.where(
        eff.isNotNull() & var.isNotNull() & (var > 0)
    ).select(
        *id_cols,
        eff.alias("__e"),
        (F.lit(1.0) / var).alias("__w"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("__w").cast(dec12)).cast("double").alias("__sw"),
        F.sum((F.col("__w") * F.col("__e")).cast(dec12))
        .cast("double")
        .alias("__swe"),
    )
    theta = F.col("__sw_t") / F.col("__sw_w")
    q = base.crossJoin(
        F.broadcast(
            tot.select(
                "k",
                F.col("__sw").alias("__sw_w"),
                F.col("__swe").alias("__sw_t"),
            )
        )
    ).select(
        "k",
        "__sw_w",
        "__sw_t",
        (
            F.col("__w")
            * (F.col("__e") - theta)
            * (F.col("__e") - theta)
        )
        .cast(dec12)
        .alias("__qt"),
    )
    agg = q.groupBy("k", "__sw_w", "__sw_t").agg(
        F.sum("__qt").cast("double").alias("__q")
    )
    th = F.col("__sw_t") / F.col("__sw_w")
    se = F.sqrt(F.lit(1.0) / F.col("__sw_w"))
    qs = F.col("__q")
    dof = (F.col("k") - 1).cast("double")
    i2 = F.when(
        (F.col("k") > 1) & (qs > 0),
        F.greatest(F.lit(0.0), (qs - dof) / qs),
    ).otherwise(F.lit(0.0))
    wh_z = (
        F.exp(F.log(qs / dof) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dof))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof))
    p_hom = F.when(F.col("k") <= 1, F.lit(None).cast("double")).otherwise(
        F.when(qs <= 0, F.lit(1.0)).otherwise(normal_sf(wh_z))
    )
    return agg.select(
        "k",
        F.round(th, 6).alias("theta"),
        F.round(se, 6).alias("se"),
        F.round(F.try_divide(th, se), 6).alias("z"),
        F.round(qs, 6).alias("q_stat"),
        (F.col("k") - 1).cast("long").alias("df"),
        F.round(i2, 6).alias("i2"),
        F.round(p_hom, 6).alias("p_homogeneity"),
    )


def yuen_trimmed_test(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    *,
    trim: float = 0.1,
) -> DataFrame:
    """Yuen's trimmed-mean two-sample test (Yuen 1974, Biometrika):
    Welch's t computed on γ-trimmed means with WINSORIZED variances —
    the robust A/B readout for heavy-tailed metrics, where the raw
    Welch test (x237) hands a single whale user the whole verdict and
    winsorizing alone (x44) biases the SE.  Trimmed mean + winsorized
    variance is the matched pair with known asymptotics; Yuen's df is
    the Satterthwaite form on effective sizes ``h = n − 2g``.

    Per arm: one keyed rank window (value asc, the exact-order-
    statistic idiom) marks the g-th and (n−g+1)-th order statistics;
    values clamp to them for the winsorized moments, rows inside the
    window feed the trimmed mean — both from ONE pass after the rank;
    all means/variances from decimal-quantized sums.

    Output (single row): ``n_a, n_b, h_a, h_b, mean_a, mean_b,
    delta, se, t, df, p_value`` (6 dp; the p uses the shared A&S
    normal tail — exact enough at the h this test needs anyway).
    """
    from .quality import normal_p_two_sided

    dec6, dec12 = "decimal(28,6)", "decimal(38,12)"
    gam = float(trim)
    v = F.col(value_col).cast("double")
    arm = F.col(arm_col).cast("string")
    base = df.where(v.isNotNull() & arm.isin("a", "b")).select(
        arm.alias("__arm"), v.alias("__v")
    )
    w = Window.partitionBy("__arm").orderBy("__v")
    wn = Window.partitionBy("__arm")
    ranked = base.select(
        "__arm",
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    ).withColumn("__g", F.floor(F.lit(gam) * F.col("__n")).cast("long"))
    lo = F.max(
        F.when(F.col("__rn") == F.col("__g") + 1, F.col("__v"))
    ).over(wn)
    hi = F.max(
        F.when(F.col("__rn") == F.col("__n") - F.col("__g"), F.col("__v"))
    ).over(wn)
    staged = ranked.select(
        "__arm",
        "__v",
        "__rn",
        "__n",
        "__g",
        lo.alias("__lo"),
        hi.alias("__hi"),
    )
    wins = F.least(F.greatest(F.col("__v"), F.col("__lo")), F.col("__hi"))
    inside = (F.col("__rn") > F.col("__g")) & (
        F.col("__rn") <= F.col("__n") - F.col("__g")
    )
    per_arm = staged.groupBy("__arm").agg(
        F.first("__n").alias("n"),
        F.first("__g").alias("g"),
        F.sum(F.when(inside, F.col("__v")).cast(dec6))
        .cast("double")
        .alias("__st"),
        F.sum(wins.cast(dec6)).cast("double").alias("__sw"),
        F.sum((wins * wins).cast(dec12)).cast("double").alias("__sww"),
    )
    h = (F.col("n") - 2 * F.col("g")).cast("double")
    nd = F.col("n").cast("double")
    mt = F.col("__st") / h
    sw2 = (
        F.col("__sww") - F.col("__sw") * F.col("__sw") / nd
    ) / (nd - F.lit(1.0))
    flat = per_arm.select(
        "__arm",
        F.col("n").cast("long").alias("n"),
        h.alias("__h"),
        mt.alias("__mt"),
        sw2.alias("__sw2"),
    )
    a = flat.where(F.col("__arm") == "a").select(
        F.col("n").alias("n_a"),
        F.col("__h").alias("__ha"),
        F.col("__mt").alias("__ma"),
        F.col("__sw2").alias("__va"),
    )
    b = flat.where(F.col("__arm") == "b").select(
        F.col("n").alias("n_b"),
        F.col("__h").alias("__hb"),
        F.col("__mt").alias("__mb"),
        F.col("__sw2").alias("__vb"),
    )
    j = a.crossJoin(b)
    # Yuen (1974)/Wilcox: d = (n-1) * s2_w / (h*(h-1)) — the winsorized
    # sample variance is rescaled to the winsorized SSD over h(h-1).
    # At trim=0 (h=n) this reduces to Welch's s2/n.
    da = (F.col("n_a").cast("double") - F.lit(1.0)) * F.col("__va") / (
        F.col("__ha") * (F.col("__ha") - F.lit(1.0))
    )
    db = (F.col("n_b").cast("double") - F.lit(1.0)) * F.col("__vb") / (
        F.col("__hb") * (F.col("__hb") - F.lit(1.0))
    )
    se = F.sqrt(da + db)
    t = F.try_divide(F.col("__ma") - F.col("__mb"), se)
    dfree = F.try_divide(
        (da + db) * (da + db),
        da * da / (F.col("__ha") - F.lit(1.0))
        + db * db / (F.col("__hb") - F.lit(1.0)),
    )
    return j.select(
        "n_a",
        "n_b",
        F.col("__ha").cast("long").alias("h_a"),
        F.col("__hb").cast("long").alias("h_b"),
        F.round(F.col("__ma"), 6).alias("mean_a"),
        F.round(F.col("__mb"), 6).alias("mean_b"),
        F.round(F.col("__ma") - F.col("__mb"), 6).alias("delta"),
        F.round(se, 6).alias("se"),
        F.round(t, 6).alias("t"),
        F.round(dfree, 6).alias("df"),
        F.round(normal_p_two_sided(t), 6).alias("p_value"),
    )


def ipw_ate(
    units: DataFrame,
    *,
    treat_col: str = "t",
    outcome_col: str = "y",
    covariate_col: str = "x",
    clip: tuple = (0.01, 0.99),
) -> DataFrame:
    """Inverse-propensity-weighted ATE (Horvitz-Thompson 1952 /
    Rosenbaum-Rubin 1983, Hajek form): when treatment take-up is
    CONFOUNDED with a covariate, the raw treated-vs-control mean
    difference is selection bias, not effect — reweighting each unit
    by ``1/P(T=t|x)`` recovers the population contrast.

    The propensity model is one closed-form Newton step of logistic
    regression from ``beta = 0`` (where ``p = 1/2`` uniformly, so the
    Hessian is exactly ``X'X/4`` and the step is
    ``beta = 4 (X'X)^{-1} X'(T - 1/2)`` — a deterministic 2x2 solve,
    no iterative fitting to seed-drift across engines).  One step
    captures the monotone confounding direction, which is what the
    reweighting needs; it is NOT a converged MLE and the docvalue is
    the audit contrast, not the coefficients.

    Propensities are clipped to *clip* (overlap trimming) and weights
    are STABILIZED (``pbar/p`` and ``(1-pbar)/(1-p)``), the standard
    variance guard.  ``ess_treat``/``ess_ctrl`` report Kish effective
    sample sizes ``(sum w)^2 / sum w^2`` — an IPW readout whose ESS
    collapsed is a failed overlap diagnostic, not an estimate.

    Plan shape: two 1-row decimal-moment aggregates (Newton step;
    final contrast) with a broadcast join between them — no windows,
    no per-unit state, partition-invariant by decimal staging.

    Input: one row per unit with ``treat_col`` in {0,1},
    ``outcome_col`` and ``covariate_col`` numeric.  Returns one row:
    ``(n, n_treat, b0, b1, ate_raw, ate_ipw, ess_treat, ess_ctrl)``.
    """
    dec = "decimal(38,12)"
    t = F.col(treat_col).cast("double")
    x = F.col(covariate_col).cast("double")
    y = F.col(outcome_col).cast("double")
    base = units.select(
        t.alias("__t"), x.alias("__x"), y.alias("__y")
    ).where(
        F.col("__t").isNotNull()
        & F.col("__x").isNotNull()
        & F.col("__y").isNotNull()
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(F.col("__t").cast(dec)).cast("double").alias("__st"),
        F.sum(F.col("__x").cast(dec)).cast("double").alias("__sx"),
        F.sum((F.col("__x") * F.col("__x")).cast(dec))
        .cast("double")
        .alias("__sxx"),
        F.sum(
            (F.col("__x") * (F.col("__t") - F.lit(0.5))).cast(dec)
        )
        .cast("double")
        .alias("__sg1"),
    )
    det = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    g0 = F.col("__st") - F.lit(0.5) * F.col("__n")
    b0 = F.lit(4.0) * F.try_divide(
        F.col("__sxx") * g0 - F.col("__sx") * F.col("__sg1"), det
    )
    b1 = F.lit(4.0) * F.try_divide(
        F.col("__n") * F.col("__sg1") - F.col("__sx") * g0, det
    )
    params = mom.select(
        "__n",
        "__st",
        b0.alias("__b0"),
        b1.alias("__b1"),
        (F.col("__st") / F.col("__n")).alias("__pbar"),
    )
    scored = base.crossJoin(F.broadcast(params))
    z = F.greatest(
        F.lit(-30.0),
        F.least(
            F.lit(30.0), F.col("__b0") + F.col("__b1") * F.col("__x")
        ),
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    p_c = F.greatest(
        F.lit(float(clip[0])), F.least(F.lit(float(clip[1])), p)
    )
    w = F.when(
        F.col("__t") > 0.5, F.col("__pbar") / p_c
    ).otherwise((F.lit(1.0) - F.col("__pbar")) / (F.lit(1.0) - p_c))
    ww = scored.withColumn("__w", w)
    fin = ww.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__t").cast(dec)).cast("long").alias("n_treat"),
        F.max("__b0").alias("b0r"),
        F.max("__b1").alias("b1r"),
        F.sum((F.col("__y") * F.col("__t")).cast(dec))
        .cast("double")
        .alias("syt"),
        F.sum((F.col("__y") * (1 - F.col("__t"))).cast(dec))
        .cast("double")
        .alias("syc"),
        F.sum((F.col("__w") * F.col("__y") * F.col("__t")).cast(dec))
        .cast("double")
        .alias("swyt"),
        F.sum((F.col("__w") * F.col("__t")).cast(dec))
        .cast("double")
        .alias("swt"),
        F.sum(
            (F.col("__w") * F.col("__y") * (1 - F.col("__t"))).cast(dec)
        )
        .cast("double")
        .alias("swyc"),
        F.sum((F.col("__w") * (1 - F.col("__t"))).cast(dec))
        .cast("double")
        .alias("swc"),
        F.sum(
            (F.col("__w") * F.col("__w") * F.col("__t")).cast(dec)
        )
        .cast("double")
        .alias("swwt"),
        F.sum(
            (F.col("__w") * F.col("__w") * (1 - F.col("__t"))).cast(dec)
        )
        .cast("double")
        .alias("swwc"),
    )
    nt = F.col("n_treat").cast("double")
    nc = F.col("n").cast("double") - nt
    return fin.select(
        "n",
        "n_treat",
        F.round(F.col("b0r"), 6).alias("b0"),
        F.round(F.col("b1r"), 6).alias("b1"),
        F.round(
            F.try_divide(F.col("syt"), nt)
            - F.try_divide(F.col("syc"), nc),
            6,
        ).alias("ate_raw"),
        F.round(
            F.try_divide(F.col("swyt"), F.col("swt"))
            - F.try_divide(F.col("swyc"), F.col("swc")),
            6,
        ).alias("ate_ipw"),
        F.round(
            F.try_divide(
                F.col("swt") * F.col("swt"), F.col("swwt")
            ),
            6,
        ).alias("ess_treat"),
        F.round(
            F.try_divide(
                F.col("swc") * F.col("swc"), F.col("swwc")
            ),
            6,
        ).alias("ess_ctrl"),
    )


def bayes_ab_binomial(
    arms: DataFrame,
    *,
    arm_col: str = "arm",
    n_col: str = "n",
    s_col: str = "s",
    grid: int = 400,
    prior_a: float = 1.0,
    prior_b: float = 1.0,
) -> DataFrame:
    """Bayesian A/B readout for binomial conversion: posterior
    ``P(p_b > p_a)`` and the expected loss of shipping either arm —
    the decision quantities a Beta-Binomial analysis (e.g. VWO/Chris
    Stucchio's "Bayesian A/B testing" formulation) reports instead of
    a p-value.  Expected loss caps regret: ship B when
    ``E[max(p_a - p_b, 0)]`` is below the cost you can tolerate.

    Posteriors are ``Beta(s + prior_a, n - s + prior_b)``, evaluated
    on a shared midpoint grid ``p_j = (2j+1)/(2*grid)`` in log space
    and self-normalized — no incomplete-beta special function, so both
    engines compute it from ``ln``/``exp`` alone.  Cross-engine bit
    discipline: log-weights are max-shifted and rounded at 9 dp
    BEFORE ``exp``, weights rounded at 12 dp AFTER — a 1-ulp ``ln``
    divergence (~1e-13) dies at the 9 dp gate instead of straddling
    the final 6 dp round.  All grid reductions are decimal-cast;
    prefix sums run over the deterministic grid order.

    ``P(B>A) = sum_j P_B(j) (F_A(j-) + P_A(j)/2)`` (half-tie rule for
    the shared discretization);
    ``loss_b = sum_j P_A(j) (p_j F_B(j-) - S_B(j-))`` via the same
    one-pass prefix moments, and symmetrically for ``loss_a``.

    Scale shape: *arms* is a 2-row aggregate; the grid is metadata
    (``grid`` rows per arm, constant in data size), so every window
    here is bounded by ``grid``, never by the data.  Returns one row:
    ``(n_a, s_a, n_b, s_b, post_mean_a, post_mean_b, p_b_gt_a,
    exp_loss_a, exp_loss_b)``.
    """
    dec = "decimal(38,18)"
    spark = arms.sparkSession
    # loud-fail on arm cardinality: with >2 arms, every arm that isn't
    # min(arm) would silently collapse into side 'b' and the per-side
    # grid normalization would mix distinct posteriors into one
    # meaningless result.  *arms* is a tiny aggregate (one row per
    # arm), so this is a bounded 1-row pin, not a data-sized collect.
    card = arms.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col(arm_col)).alias("k"),
    ).first()
    if card["k"] != 2:
        raise ValueError(
            f"bayes_ab_binomial needs exactly 2 distinct arms, got {card['k']}"
        )
    if card["n_rows"] != card["k"]:
        # duplicate rows per arm would pass the distinct check but each
        # (arm, j) grid point then appears multiple times through the
        # crossJoin, silently mixing both rows' Beta weights into one
        # corrupted posterior — fail loud instead.
        raise ValueError(
            "bayes_ab_binomial needs exactly one row per arm, got "
            f"{card['n_rows']} rows over {card['k']} arms — aggregate "
            "n/s per arm first"
        )
    g = spark.range(int(grid)).select(F.col("id").alias("j"))
    p = (F.lit(2.0) * F.col("j").cast("double") + F.lit(1.0)) / F.lit(
        2.0 * grid
    )
    lab = arms.select(
        F.min(arm_col).alias("__arm_a"), F.max(arm_col).alias("__arm_b")
    )
    tagged = arms.crossJoin(F.broadcast(lab)).select(
        F.when(F.col(arm_col) == F.col("__arm_a"), F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("side"),
        F.col(arm_col).alias("arm"),
        F.col(n_col).cast("double").alias("n"),
        F.col(s_col).cast("double").alias("s"),
    )
    gridded = tagged.crossJoin(F.broadcast(g)).withColumn("p", p)
    lw = (
        (F.col("s") + F.lit(float(prior_a) - 1.0)) * F.log(F.col("p"))
        + (
            F.col("n")
            - F.col("s")
            + F.lit(float(prior_b) - 1.0)
        )
        * F.log(F.lit(1.0) - F.col("p"))
    )
    w_arm = Window.partitionBy("side")
    shifted = gridded.withColumn("__lw", lw).withColumn(
        "__w",
        F.round(
            F.exp(
                F.round(
                    F.col("__lw") - F.max("__lw").over(w_arm), 9
                )
            ),
            12,
        ),
    )
    normed = shifted.withColumn(
        "__P",
        F.col("__w")
        / F.sum(F.col("__w").cast(dec)).over(w_arm).cast("double"),
    )
    a_side = normed.where(F.col("side") == "a").select(
        "j",
        "p",
        F.col("arm").alias("arm_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("__P").alias("pa"),
    )
    b_side = normed.where(F.col("side") == "b").select(
        "j",
        F.col("arm").alias("arm_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("__P").alias("pb"),
    )
    both = a_side.join(b_side, "j")
    w_prev = (
        Window.orderBy("j").rowsBetween(Window.unboundedPreceding, -1)
    )
    fa_prev = F.coalesce(
        F.sum(F.col("pa").cast(dec)).over(w_prev).cast("double"),
        F.lit(0.0),
    )
    fb_prev = F.coalesce(
        F.sum(F.col("pb").cast(dec)).over(w_prev).cast("double"),
        F.lit(0.0),
    )
    sa_prev = F.coalesce(
        F.sum((F.col("pa") * F.col("p")).cast(dec))
        .over(w_prev)
        .cast("double"),
        F.lit(0.0),
    )
    sb_prev = F.coalesce(
        F.sum((F.col("pb") * F.col("p")).cast(dec))
        .over(w_prev)
        .cast("double"),
        F.lit(0.0),
    )
    terms = both.select(
        "na",
        "sa",
        "nb",
        "sb",
        (
            F.col("pb") * (fa_prev + F.lit(0.5) * F.col("pa"))
        ).alias("__t_gt"),
        (
            F.col("pb") * (F.col("p") * fa_prev - sa_prev)
        ).alias("__t_loss_a"),
        (
            F.col("pa") * (F.col("p") * fb_prev - sb_prev)
        ).alias("__t_loss_b"),
    )
    out = terms.groupBy("na", "sa", "nb", "sb").agg(
        F.sum(F.col("__t_gt").cast(dec)).cast("double").alias("__gt"),
        F.sum(F.col("__t_loss_a").cast(dec))
        .cast("double")
        .alias("__la"),
        F.sum(F.col("__t_loss_b").cast(dec))
        .cast("double")
        .alias("__lb"),
    )
    pa0, pb0 = float(prior_a), float(prior_b)
    return out.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("sa").cast("long").alias("s_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("sb").cast("long").alias("s_b"),
        F.round(
            (F.col("sa") + F.lit(pa0))
            / (F.col("na") + F.lit(pa0 + pb0)),
            6,
        ).alias("post_mean_a"),
        F.round(
            (F.col("sb") + F.lit(pa0))
            / (F.col("nb") + F.lit(pa0 + pb0)),
            6,
        ).alias("post_mean_b"),
        F.round(F.col("__gt"), 6).alias("p_b_gt_a"),
        F.round(F.col("__la"), 6).alias("exp_loss_a"),
        F.round(F.col("__lb"), 6).alias("exp_loss_b"),
    )


def rdd_sharp(
    units: DataFrame,
    *,
    running_col: str = "x",
    outcome_col: str = "y",
    cutoff: float,
    bandwidth: float,
) -> DataFrame:
    """Sharp regression-discontinuity estimate (Thistlethwaite-
    Campbell 1960 / Imbens-Lemieux 2008): when treatment switches ON
    deterministically at ``running_col >= cutoff``, the causal jump is
    the difference of the two boundary intercepts from separate local
    linear fits on either side of the cutoff within *bandwidth* — the
    design that identifies an effect with NO overlap assumption, where
    IPW (ipw_ate) cannot.

    Each side fits OLS ``y ~ 1 + (x - cutoff)`` on its window by
    closed-form moment algebra; the estimate is
    ``tau = a_right - a_left`` with the homoskedastic intercept SEs
    combined as ``se = sqrt(se_r^2 + se_l^2)`` (the conventional
    parametric-RD readout; bandwidth sensitivity is the caller's
    robustness axis).  A side with fewer than 3 points or zero
    variance in ``x`` yields NULL coefficients rather than a fake
    zero-SE estimate.

    Plan shape: ONE grouped decimal-moment aggregate over the two
    window sides (5 sums each), then pure 1-row column algebra — no
    windows, no iteration, partition-invariant by decimal staging.

    Returns one row: ``(n_left, n_right, a_left, b_left, a_right,
    b_right, tau, se, t)`` at 6 dp.
    """
    dec = "decimal(38,12)"
    c = float(cutoff)
    h = float(bandwidth)
    xc = F.col(running_col).cast("double") - F.lit(c)
    y = F.col(outcome_col).cast("double")
    base = units.select(
        xc.alias("__x"), y.alias("__y")
    ).where(
        F.col("__x").isNotNull()
        & F.col("__y").isNotNull()
        & (F.col("__x") >= -h)
        & (F.col("__x") < h)
    ).withColumn(
        "side",
        F.when(F.col("__x") < 0, F.lit("l")).otherwise(F.lit("r")),
    )
    mom = base.groupBy("side").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("__x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("__y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("__x") * F.col("__x")).cast(dec))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("__x") * F.col("__y")).cast(dec))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("__y") * F.col("__y")).cast(dec))
        .cast("double")
        .alias("syy"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ok = (F.col("n") >= 3) & (det > 0)
    b = F.when(
        ok,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / det,
    )
    a = F.when(
        ok, (F.col("sy") - b * F.col("sx")) / F.col("n")
    )
    # residual SS = syy - a*sy - b*sxy ; sigma2 = SS/(n-2)
    ss = F.col("syy") - a * F.col("sy") - b * F.col("sxy")
    sigma2 = F.when(ok, F.greatest(ss, F.lit(0.0)) / (F.col("n") - 2))
    # Var(intercept) = sigma2 * sxx / det
    va = F.when(ok, sigma2 * F.col("sxx") / det)
    sides = mom.select(
        "side",
        F.col("n").cast("long").alias("n_side"),
        a.alias("__a"),
        b.alias("__b"),
        va.alias("__va"),
    )
    left = sides.where(F.col("side") == "l").select(
        F.col("n_side").alias("n_left"),
        F.col("__a").alias("al"),
        F.col("__b").alias("bl"),
        F.col("__va").alias("val"),
    )
    right = sides.where(F.col("side") == "r").select(
        F.col("n_side").alias("n_right"),
        F.col("__a").alias("ar"),
        F.col("__b").alias("br"),
        F.col("__va").alias("var_"),
    )
    j = left.crossJoin(right)
    tau = F.col("ar") - F.col("al")
    se = F.sqrt(F.col("var_") + F.col("val"))
    return j.select(
        "n_left",
        "n_right",
        F.round(F.col("al"), 6).alias("a_left"),
        F.round(F.col("bl"), 6).alias("b_left"),
        F.round(F.col("ar"), 6).alias("a_right"),
        F.round(F.col("br"), 6).alias("b_right"),
        F.round(tau, 6).alias("tau"),
        F.round(se, 6).alias("se"),
        F.round(F.try_divide(tau, se), 6).alias("t"),
    )


def qini_curve(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    score_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Qini curve for uplift targeting (Radcliffe 2007): rank units by
    a targeting score descending, cut into *n_bins*, and at each
    cumulative prefix compare treated conversions against the
    control conversions RESCALED to the treated exposure —
    ``qini_k = Y_T(k) − Y_C(k)·N_T(k)/N_C(k)``.  The incremental-
    impact answer ("how many conversions did TARGETING cause at this
    budget?") that the classifier-only gains table (gains_table)
    cannot give, and the curve whose area picks between uplift
    models.

    Binning discipline is gains_table's: collapse to the distinct
    6-dp score support, integer prior-count bins so a tie group lands
    in one bin, no per-row global ntile (the skew_profile lesson).
    Cumulatives run over ≤*n_bins* rows.  ``qini_random`` is the
    straight line to the overall effect — the no-model baseline the
    curve must clear.

    Output per bin: ``(bin, n_treat_cum, n_ctrl_cum, y_treat_cum,
    y_ctrl_cum, qini, qini_random)`` (6 dp; *qini* null while the
    control prefix is empty).
    """
    b = int(n_bins)
    if b < 1:
        raise ValueError("n_bins must be >= 1")
    dec = "decimal(38,12)"
    score = F.round(F.col(score_col).cast("double"), 6)
    t = F.col(treat_col).cast("int")
    y = F.col(outcome_col).cast("double")
    cells = (
        df.where(score.isNotNull() & t.isNotNull() & y.isNotNull())
        .groupBy(score.alias("__s"))
        .agg(
            F.sum(t).cast("long").alias("__nt"),
            F.sum(1 - t).cast("long").alias("__nc"),
            F.sum(F.when(t == 1, y).otherwise(0.0).cast(dec)).alias("__yt"),
            F.sum(F.when(t == 0, y).otherwise(0.0).cast(dec)).alias("__yc"),
        )
    )
    wd = Window.orderBy(F.col("__s").desc())
    prior = F.coalesce(
        F.sum(F.col("__nt") + F.col("__nc")).over(
            wd.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    total = cells.agg(
        F.sum(F.col("__nt") + F.col("__nc")).alias("__n")
    )
    binned = (
        cells.crossJoin(F.broadcast(total))
        .withColumn("__prior", prior)
        .withColumn(
            "bin",
            # integer div, not double-divide-then-cast: Spark truncates
            # a double→long cast while DuckDB rounds it (gains_table
            # idiom)
            (F.lit(1) + F.expr(f"(__prior * {b}) div __n")).cast("long"),
        )
        .groupBy("bin")
        .agg(
            F.sum("__nt").cast("long").alias("__bnt"),
            F.sum("__nc").cast("long").alias("__bnc"),
            F.sum(F.col("__yt").cast(dec)).alias("__byt"),
            F.sum(F.col("__yc").cast(dec)).alias("__byc"),
        )
    )
    wb = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = binned.select(
        "bin",
        F.sum("__bnt").over(wb).cast("long").alias("n_treat_cum"),
        F.sum("__bnc").over(wb).cast("long").alias("n_ctrl_cum"),
        F.sum(F.col("__byt").cast(dec)).over(wb).alias("__YT"),
        F.sum(F.col("__byc").cast(dec)).over(wb).alias("__YC"),
        F.sum("__bnt").over(wall).cast("long").alias("__NT"),
        F.sum("__bnc").over(wall).cast("long").alias("__NC"),
        F.sum(F.col("__byt").cast(dec)).over(wall).alias("__YTT"),
        F.sum(F.col("__byc").cast(dec)).over(wall).alias("__YCT"),
    )
    nt = F.col("n_treat_cum").cast("double")
    nc = F.col("n_ctrl_cum").cast("double")
    qini = F.col("__YT").cast("double") - F.try_divide(
        F.col("__YC").cast("double") * nt, nc
    )
    overall = F.col("__YTT").cast("double") - F.try_divide(
        F.col("__YCT").cast("double") * F.col("__NT").cast("double"),
        F.col("__NC").cast("double"),
    )
    frac = (nt + nc) / (F.col("__NT") + F.col("__NC")).cast("double")
    # qini / qini_random are RAW doubles (try_divide over decimal-sum
    # casts) — round via the explicit *1e6 multiply so the rounding
    # input double is identical cross-engine near a 6-dp tie (same
    # idiom as theil_sen, operators/temporal.py:640).
    return cum.select(
        "bin",
        "n_treat_cum",
        "n_ctrl_cum",
        F.round(F.col("__YT").cast("double"), 6).alias("y_treat_cum"),
        F.round(F.col("__YC").cast("double"), 6).alias("y_ctrl_cum"),
        (F.round(qini * F.lit(1e6)) / F.lit(1e6)).alias("qini"),
        (F.round(overall * frac * F.lit(1e6)) / F.lit(1e6)).alias(
            "qini_random"
        ),
    ).orderBy("bin")


def ucb_allocation(
    df: DataFrame,
    arm_col: str,
    reward_col: str,
    *,
    c: float = 2.0,
) -> DataFrame:
    """UCB1 bandit allocation audit (Auer, Cesa-Bianchi & Fischer
    2002): from logged per-arm pull counts and mean rewards, compute
    each arm's upper confidence bound ``mean_i + sqrt(c·ln N / n_i)``,
    WHICH arm a UCB policy would pull next (max bound, ties to the
    lexicographically first arm), and each arm's contribution to
    realized regret against the best empirical arm — the adaptive-
    experiment counterpart of the fixed-split A/B readouts (x31/x108):
    run it on yesterday's log to see whether the live allocator is
    still exploring or has converged, and what the exploration cost.

    Plan shape: one grouped decimal-moment aggregation to ≤|arms|
    rows, a 1-row broadcast of (N, best mean), row-local algebra —
    no windows, no joins beyond the broadcast.  ln at 9 dp; the final
    raw-double rounds use the explicit *1e6 multiply (tie-safe across
    engines, the theil_sen idiom).

    Output per arm: ``(arm, n, mean_reward, bonus, ucb, play_next,
    regret_contrib)``, ordered by arm.
    """
    dec = "decimal(38,12)"
    r6 = lambda col: F.round(col * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    per_arm = (
        df.where(F.col(reward_col).isNotNull())
        .groupBy(F.col(arm_col).cast("string").alias("arm"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(reward_col).cast("double").cast(dec)).alias("__s"),
        )
        .withColumn(
            "__mean",
            F.col("__s").cast("double") / F.col("n").cast("double"),
        )
    )
    tot = per_arm.agg(
        F.sum("n").cast("long").alias("__N"),
        F.max("__mean").alias("__best"),
    )
    j = per_arm.crossJoin(F.broadcast(tot))
    bonus = F.sqrt(
        F.lit(float(c))
        * F.round(F.log(F.col("__N").cast("double")), 9)
        / F.col("n").cast("double")
    )
    scored = j.select(
        "arm",
        "n",
        r6(F.col("__mean")).alias("mean_reward"),
        r6(bonus).alias("bonus"),
        r6(F.col("__mean") + bonus).alias("ucb"),
        r6(
            (F.col("__best") - F.col("__mean")) * F.col("n").cast("double")
        ).alias("regret_contrib"),
    )
    # argmax via a broadcast of the max bound (≤|arms| rows each side)
    mu = scored.agg(F.max("ucb").alias("__mu"))
    with_max = scored.crossJoin(F.broadcast(mu))
    first_best = with_max.where(F.col("ucb") == F.col("__mu")).agg(
        F.min("arm").alias("__ba")
    )
    return (
        with_max.crossJoin(F.broadcast(first_best))
        .select(
            "arm",
            "n",
            "mean_reward",
            "bonus",
            "ucb",
            (F.col("arm") == F.col("__ba")).alias("play_next"),
            "regret_contrib",
        )
        .orderBy("arm")
    )


def best_arm_probability(
    arms: DataFrame,
    *,
    arm_col: str = "arm",
    n_col: str = "n",
    s_col: str = "s",
    grid: int = 400,
    prior_a: float = 1.0,
    prior_b: float = 1.0,
    max_arms: int = 8,
) -> DataFrame:
    """Posterior probability that each of k arms is THE best —
    the k-arm generalization of :func:`bayes_ab_binomial` (which it
    reduces to at k=2): independent ``Beta(s+a, n-s+b)`` posteriors
    evaluated on the shared midpoint grid, and
    ``P(best=i) = Σ_j P_i(j) · Π_{k≠i} (F_k(j⁻) + P_k(j)/2)``
    (the same half-tie rule, applied per competitor).  The quantity a
    Thompson-sampling allocator actually needs — pairwise
    ``p_b_gt_a`` readouts do not compose into "probability best"
    when k > 2.

    Same cross-engine bit discipline as x281: log-weights max-shifted
    and 9-dp-rounded before ``exp``, 12 dp after, decimal
    normalization and prefix sums; the per-grid-point competitor
    product folds an arm-sorted array in deterministic order; final
    terms are 15-dp-quantized decimal sums and the output rounds via
    the tie-safe ``*1e6`` multiply.

    Scale shape: *arms* is one row per arm (≤*max_arms*, loud-fail
    otherwise — beyond that the grid product loses its bounded-array
    guarantee); every window is arm-keyed over *grid* rows; the
    product stage groups the grid into ≤*grid* bounded arrays.

    Output per arm: ``(arm, n, s, post_mean, p_best)``, ordered by
    arm; ``Σ p_best = 1`` up to grid discretization.
    """
    dec = "decimal(38,18)"
    spark = arms.sparkSession
    card = arms.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col(arm_col)).alias("k"),
    ).first()
    k = card["k"]
    if k < 2 or k > int(max_arms):
        raise ValueError(
            f"best_arm_probability needs 2..{max_arms} distinct arms, "
            f"got {k}"
        )
    if card["n_rows"] != k:
        # same failure mode as bayes_ab_binomial: duplicate rows per
        # arm duplicate every (arm, j) grid point through the crossJoin
        # and the per-arm normalization/CDF mixes both rows' weights.
        raise ValueError(
            "best_arm_probability needs exactly one row per arm, got "
            f"{card['n_rows']} rows over {k} arms — aggregate n/s per "
            "arm first"
        )
    g = spark.range(int(grid)).select(F.col("id").alias("j"))
    p = (F.lit(2.0) * F.col("j").cast("double") + F.lit(1.0)) / F.lit(
        2.0 * grid
    )
    base = arms.select(
        F.col(arm_col).cast("string").alias("arm"),
        F.col(n_col).cast("double").alias("n"),
        F.col(s_col).cast("double").alias("s"),
    )
    gridded = base.crossJoin(F.broadcast(g)).withColumn("p", p)
    lw = (
        (F.col("s") + F.lit(float(prior_a) - 1.0)) * F.log(F.col("p"))
        + (F.col("n") - F.col("s") + F.lit(float(prior_b) - 1.0))
        * F.log(F.lit(1.0) - F.col("p"))
    )
    w_arm = Window.partitionBy("arm")
    shifted = gridded.withColumn("__lw", lw).withColumn(
        "__w",
        F.round(
            F.exp(F.round(F.col("__lw") - F.max("__lw").over(w_arm), 9)),
            12,
        ),
    )
    normed = shifted.withColumn(
        "__P",
        F.col("__w")
        / F.sum(F.col("__w").cast(dec)).over(w_arm).cast("double"),
    )
    w_prev = Window.partitionBy("arm").orderBy("j").rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = normed.withColumn(
        "__G",
        F.coalesce(
            F.sum(F.col("__P").cast(dec)).over(w_prev).cast("double"),
            F.lit(0.0),
        )
        + F.lit(0.5) * F.col("__P"),
    )
    per_j = staged.groupBy("j").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("arm").alias("arm"),
                    F.col("__P").alias("pp"),
                    F.col("__G").alias("gg"),
                )
            )
        ).alias("__arr")
    )
    me = per_j.select("j", "__arr", F.explode("__arr").alias("__me"))
    prod_others = F.aggregate(
        F.filter(
            F.col("__arr"),
            lambda x: x["arm"] != F.col("__me.arm"),
        ),
        F.lit(1.0),
        lambda acc, x: acc * x["gg"],
    )
    terms = me.select(
        F.col("__me.arm").alias("arm"),
        F.round(F.col("__me.pp") * prod_others, 15)
        .cast(dec)
        .alias("__t"),
    )
    summed = terms.groupBy("arm").agg(
        F.sum("__t").cast("double").alias("__pb")
    )
    pa0, pb0 = float(prior_a), float(prior_b)
    r6 = lambda col: F.round(col * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return (
        base.join(summed, "arm")
        .select(
            "arm",
            F.col("n").cast("long").alias("n"),
            F.col("s").cast("long").alias("s"),
            r6(
                (F.col("s") + F.lit(pa0))
                / (F.col("n") + F.lit(pa0 + pb0))
            ).alias("post_mean"),
            r6(F.col("__pb")).alias("p_best"),
        )
        .orderBy("arm")
    )


def hoeffding_racing(
    df: DataFrame,
    arm_col: str,
    reward_col: str,
    *,
    delta: float = 0.05,
    reward_range: float = 1.0,
) -> DataFrame:
    """Racing-algorithm elimination audit (Maron & Moore 1994;
    successive elimination, Even-Dar et al. 2006): per arm, a
    Hoeffding confidence interval ``mean ± range·sqrt(ln(2/delta) /
    (2n))``, and the elimination verdict — an arm is OUT when its
    upper bound falls below the best lower bound.  The
    distribution-free companion to the Bayesian x315 readout: no
    prior, no grid, just a bound — the check a scheduler runs between
    batches to stop spending traffic on provably-worse variants.
    *delta* is per-arm (apply your own union-bound division for
    family-wise control); ``ln`` is evaluated once in Python, so both
    engines fold identical literals.

    Plan shape: ONE groupBy(arm) over the reward log with map-side
    partial aggregation (count + decimal sum), then an unpartitioned
    max over the <= #arms aggregate rows — bounded metadata, the same
    class as the KM/bin windows.  No driver collect, no grid join.

    Output per arm: ``(arm, n, mean_reward, lcb, ucb, eliminated,
    is_leader)`` at 6 dp (tie-safe), ordered by arm; *is_leader*
    marks the arm(s) attaining the best lcb.
    """
    d = float(delta)
    if not (0.0 < d < 1.0):
        raise ValueError("delta must be in (0, 1)")
    rng = float(reward_range)
    if rng <= 0:
        raise ValueError("reward_range must be positive")
    import math as _math

    log_term = _math.log(2.0 / d)
    dec = "decimal(38,9)"

    per_arm = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col(reward_col).cast("double"), 9).cast(dec))
        .alias("__s"),
    )
    mean = F.col("__s").cast("double") / F.col("n").cast("double")
    radius = F.lit(rng) * F.sqrt(
        F.lit(log_term) / (F.lit(2.0) * F.col("n").cast("double"))
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = per_arm.select(
        "arm",
        "n",
        mean.alias("__m"),
        (mean - radius).alias("__lcb"),
        (mean + radius).alias("__ucb"),
    ).select(
        "*", F.max("__lcb").over(wall).alias("__best_lcb")
    )

    def _r6(x):
        return F.round(x * F.lit(1e6)) / F.lit(1e6)

    return staged.select(
        "arm",
        "n",
        _r6(F.col("__m")).alias("mean_reward"),
        _r6(F.col("__lcb")).alias("lcb"),
        _r6(F.col("__ucb")).alias("ucb"),
        (F.col("__ucb") < F.col("__best_lcb")).alias("eliminated"),
        (F.col("__lcb") == F.col("__best_lcb")).alias("is_leader"),
    ).orderBy("arm")


def seq_pattern_support(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    *,
    top_types: int = 4,
    min_support: int = 1,
) -> DataFrame:
    """Support counting for ordered 3-event SUBSEQUENCE patterns —
    the candidate-evaluation core of sequential pattern mining
    (GSP/PrefixSpan, Srikant & Agrawal 1996; Pei et al. 2001),
    bounded to the ``top_types``³ candidate grid so the pass stays
    relational.  Unlike :func:`event_transitions` (ADJACENT pairs)
    or funnels (ONE fixed pattern), this scores every ordered triple
    (a, b, c) over the candidate alphabet by the number of users
    whose history contains a < b < c at strictly increasing
    timestamps, gaps allowed.

    Earliest-first greedy chaining (optimal for subsequence
    existence) in three keyed stages:

    1. per (user, a): earliest a-timestamp — one groupBy;
    2. per (user, a, b): earliest b STRICTLY AFTER stage 1 — the one
       events×|alphabet| join, user-keyed;
    3. per (user, a, b, c): c exists after stage 2 ⟺ the user's LAST
       c-timestamp is later — joins stage 2 against a per-(user, c)
       max, so the third level never rescans events.

    Timestamp ties never chain (strict inequalities throughout).
    Scale shape: every stage shuffles on the user key; intermediate
    width is |alphabet| (stage 2 probe) and |alphabet|² rows per user
    (stage 3 metadata), both bounded by *top_types* ≤ 8; the final
    support count is one |alphabet|³-group aggregation.

    Output: ``(a, b, c, n_users, support_rate)`` (6 dp, tie-safe) for
    triples with ``n_users >= min_support``, ordered by n_users desc,
    then (a, b, c); ``support_rate`` divides by the total distinct
    non-null users in *df* (not just candidate-active ones — and
    NULL user ids are excluded entirely, matching SQL
    ``COUNT(DISTINCT u)`` semantics so cross-engine parity holds on
    data containing null users).
    """
    m = int(top_types)
    if not (1 <= m <= 8):
        raise ValueError("top_types must be in 1..8")
    base = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(type_col).cast("string").alias("e"),
    ).where(
        F.col("t").isNotNull()
        & F.col("e").isNotNull()
        & F.col("u").isNotNull()
    )
    n_users = base.select("u").distinct().count()
    if n_users == 0:
        raise ValueError("seq_pattern_support: input has no users")
    cand = (
        base.groupBy("e")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("e").asc())
        .limit(m)
        .select("e")
    )
    ev = base.join(F.broadcast(cand), on="e").select("u", "t", "e")
    # stage 1: earliest occurrence per (user, a)
    t1 = ev.groupBy("u", F.col("e").alias("a")).agg(
        F.min("t").alias("__t1")
    )
    # stage 2: earliest b strictly after t1(a) — the events×m join
    t2 = (
        ev.select("u", F.col("e").alias("b"), F.col("t").alias("__tb"))
        .join(t1, on="u")
        .where(F.col("__tb") > F.col("__t1"))
        .groupBy("u", "a", "b")
        .agg(F.min("__tb").alias("__t2"))
    )
    # stage 3: c exists after t2 ⟺ last c-timestamp > t2
    tmax = ev.groupBy("u", F.col("e").alias("c")).agg(
        F.max("t").alias("__tc")
    )
    hits = (
        t2.join(tmax, on="u")
        .where(F.col("__tc") > F.col("__t2"))
        .select("u", "a", "b", "c")
    )
    return (
        hits.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .where(F.col("n_users") >= int(min_support))
        .select(
            "a",
            "b",
            "c",
            "n_users",
            (
                F.round(
                    F.col("n_users").cast("double")
                    / F.lit(float(n_users))
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("support_rate"),
        )
        .orderBy(F.col("n_users").desc(), "a", "b", "c")
    )


def event_study(
    df: DataFrame,
    unit_col: str,
    period_col: str,
    outcome_col: str,
    treated_col: str,
    *,
    event_period: int,
    pre: int = 4,
    post: int = 4,
) -> DataFrame:
    """Difference-in-differences event study (the dynamic-effects
    companion to the single-coefficient DiD): for each relative
    period ``k = period − event_period`` in ``[−pre, +post]``, the
    means-based coefficient

    ``att_k = (ȳ_T,k − ȳ_T,−1) − (ȳ_C,k − ȳ_C,−1)``

    with k = −1 as the omitted base — the standard pre-trend /
    dynamic-treatment readout plotted around a launch.  Significant
    att at k < −1 is the pre-trend warning; k ≥ 0 traces the effect
    as it phases in.

    Plan shape: ONE groupBy((treated, k)) over the panel with
    map-side decimal partial sums — the result is ≤ 2·(pre+post+1)
    rows; base-period means attach via a window over that bounded
    aggregate (never the panel).  Cells missing a base mean get null
    att.

    Output per k: ``(rel_period, n_treat, n_ctrl, mean_treat,
    mean_ctrl, att)`` (6 dp, tie-safe), ordered by rel_period;
    ``att = 0`` at k = −1 by construction.
    """
    p, q = int(pre), int(post)
    if p < 1 or q < 0:
        raise ValueError("need pre >= 1 (the base period) and post >= 0")
    dec = "decimal(38,9)"
    k = (F.col(period_col).cast("long") - F.lit(int(event_period))).alias(
        "__k"
    )
    base = df.select(
        k,
        F.col(treated_col).cast("boolean").alias("__t"),
        F.col(outcome_col).cast("double").alias("__y"),
    ).where(
        (F.col("__k") >= -p)
        & (F.col("__k") <= q)
        & F.col("__y").isNotNull()
        & F.col("__t").isNotNull()
    )
    cells = base.groupBy("__k", "__t").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.round(F.col("__y"), 9).cast(dec)).alias("__s"),
    )
    mean = F.col("__s").cast("double") / F.col("__n").cast("double")
    wgrp = Window.partitionBy("__t")
    staged = cells.select(
        "__k",
        "__t",
        "__n",
        mean.alias("__m"),
        F.max(F.when(F.col("__k") == -1, mean)).over(wgrp).alias("__mb"),
    )
    t = staged.where(F.col("__t")).select(
        "__k",
        F.col("__n").alias("n_treat"),
        F.col("__m").alias("__mt"),
        F.col("__mb").alias("__mbt"),
    )
    c = staged.where(~F.col("__t")).select(
        "__k",
        F.col("__n").alias("n_ctrl"),
        F.col("__m").alias("__mc"),
        F.col("__mb").alias("__mbc"),
    )

    def _r6(x):
        return F.round(x * F.lit(1e6)) / F.lit(1e6)

    return (
        t.join(c, on="__k", how="full")
        .select(
            F.col("__k").alias("rel_period"),
            F.coalesce("n_treat", F.lit(0)).alias("n_treat"),
            F.coalesce("n_ctrl", F.lit(0)).alias("n_ctrl"),
            _r6(F.col("__mt")).alias("mean_treat"),
            _r6(F.col("__mc")).alias("mean_ctrl"),
            _r6(
                (F.col("__mt") - F.col("__mbt"))
                - (F.col("__mc") - F.col("__mbc"))
            ).alias("att"),
        )
        .orderBy("rel_period")
    )


def psm_match(
    treated: DataFrame,
    controls: DataFrame,
    *,
    id_col: str,
    score_col: str,
    outcome_col: str,
    caliper: float,
) -> DataFrame:
    """Propensity-score matching, 1-nearest-control WITH replacement
    (Rosenbaum & Rubin 1983): every treated unit matches the control
    with the closest score within *caliper* (deterministic tie-break
    on the control id), and the matched-pair differences average into
    the ATT.  With-replacement matching is the formulation that
    parallelizes: each treated unit's match is independent, so the
    search is a bucketed join — greedy without-replacement matching
    is inherently sequential and does NOT belong on a cluster (run it
    on the matched subset driver-side if the design demands it; the
    standard errors differ, not the estimand).

    The candidate join buckets both sides at *caliper* width and
    probes own+adjacent buckets (the geo_radius/lof_grid cell
    pattern), so candidates are exactly the units within one caliper
    — never a score cross product.  Unmatched treated units (no
    control within the caliper) are reported, not silently dropped:
    the match RATE is part of the estimand's honesty.

    Output: ONE row ``(n_treated, n_matched, match_rate, att,
    mean_abs_score_gap)`` at 6 dp — decimal-exact sums over the
    matched pairs; ATT NULL when nothing matches.
    """
    c = float(caliper)
    if c <= 0:
        raise ValueError("psm_match: caliper must be positive")
    t = treated.select(
        F.col(id_col).cast("long").alias("tid"),
        F.col(score_col).cast("double").alias("ts"),
        F.col(outcome_col).cast("double").alias("ty"),
    ).where(F.col("ts").isNotNull() & F.col("ty").isNotNull())
    u = controls.select(
        F.col(id_col).cast("long").alias("cid"),
        F.col(score_col).cast("double").alias("cs"),
        F.col(outcome_col).cast("double").alias("cy"),
    ).where(F.col("cs").isNotNull() & F.col("cy").isNotNull())
    probes = t.select(
        "tid", "ts", "ty",
        F.explode(
            F.array(F.lit(-1), F.lit(0), F.lit(1))
        ).alias("off"),
    ).select(
        "tid", "ts", "ty",
        (F.floor(F.col("ts") / F.lit(c)).cast("long")
         + F.col("off")).alias("b"),
    )
    cands = u.withColumn(
        "b", F.floor(F.col("cs") / F.lit(c)).cast("long")
    )
    pairs = (
        probes.join(cands, "b")
        .where(F.abs(F.col("ts") - F.col("cs")) <= F.lit(c))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("tid").orderBy(
                    F.abs(F.col("ts") - F.col("cs")), F.col("cid")
                )
            ),
        )
        .where(F.col("rk") == 1)
    )
    dec = lambda col: F.sum(col.cast("decimal(38,12)")).cast("double")  # noqa: E731
    n_treated = t.count()
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        dec(F.col("ty") - F.col("cy")).alias("sdiff"),
        dec(F.abs(F.col("ts") - F.col("cs"))).alias("sgap"),
    )
    r6 = lambda col: F.round(col * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        F.lit(int(n_treated)).alias("n_treated"),
        F.col("n_matched"),
        r6(
            F.col("n_matched") / F.lit(float(max(n_treated, 1)))
        ).alias("match_rate"),
        r6(
            F.when(
                F.col("n_matched") > 0,
                F.col("sdiff") / F.col("n_matched"),
            )
        ).alias("att"),
        r6(
            F.when(
                F.col("n_matched") > 0,
                F.col("sgap") / F.col("n_matched"),
            )
        ).alias("mean_abs_score_gap"),
    )


def reg_discontinuity(
    df: DataFrame,
    *,
    group_col: str,
    running_col: str,
    outcome_col: str,
    cutoff: float,
    bandwidth: float,
) -> DataFrame:
    """Sharp regression discontinuity per group (Thistlethwaite &
    Campbell 1960; local-linear form): fit ``y ~ a + b(x - cutoff)``
    separately on each side of the cutoff within ±*bandwidth* and
    report the jump ``tau = a_right - a_left`` — the treatment effect
    at the threshold.  The x337 Chow machinery pointed at a different
    estimand: Chow asks "did the regime change", RD measures the
    LEVEL step exactly at an assignment cutoff.

    One decimal-exact conditional aggregation (the x337 pattern:
    per-side sufficient statistics in a single groupBy); closed-form
    side fits; NULL tau when either side is degenerate (< 3 points
    or zero running-variable variance).

    Output: ``(group, n_left, n_right, tau, slope_left,
    slope_right)`` at 6 dp, ordered by group.
    """
    bw = float(bandwidth)
    if bw <= 0:
        raise ValueError("reg_discontinuity: bandwidth must be positive")
    cut = float(cutoff)
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        (F.col(running_col).cast("double") - F.lit(cut)).alias("x"),
        F.col(outcome_col).cast("double").alias("y"),
    ).where(
        F.col("x").isNotNull()
        & F.col("y").isNotNull()
        & (F.abs(F.col("x")) <= F.lit(bw))
    )
    dec = lambda col: F.sum(col.cast("decimal(38,12)")).cast("double")  # noqa: E731

    def side(cond, tag):
        xd = F.when(cond, F.col("x"))
        yd = F.when(cond, F.col("y"))
        return [
            F.count(F.when(cond, F.lit(1))).cast("double").alias(
                f"n{tag}"
            ),
            dec(xd).alias(f"sx{tag}"),
            dec(yd).alias(f"sy{tag}"),
            dec(xd * F.col("x")).alias(f"sxx{tag}"),
            dec(xd * F.col("y")).alias(f"sxy{tag}"),
        ]

    agg = base.groupBy("g").agg(
        *side(F.col("x") < 0, "l"),
        *side(F.col("x") >= 0, "r"),
    )

    def fit(tag):
        n = F.col(f"n{tag}")
        sx, sy = F.col(f"sx{tag}"), F.col(f"sy{tag}")
        sxx, sxy = F.col(f"sxx{tag}"), F.col(f"sxy{tag}")
        det = n * sxx - sx * sx
        det_safe = F.when((n >= 3) & (F.abs(det) > 0), det)
        b = (n * sxy - sx * sy) / det_safe
        a = (sy * sxx - sx * sxy) / det_safe
        return a, b

    al, bl = fit("l")
    ar, br = fit("r")
    r6 = lambda col: F.round(col * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        F.col("g").alias("group"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        r6(ar - al).alias("tau"),
        r6(bl).alias("slope_left"),
        r6(br).alias("slope_right"),
    ).orderBy("group")


def twfe_within(
    df: DataFrame,
    *,
    unit_col: str,
    time_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Two-way fixed-effects within estimator (the panel workhorse):
    ``beta = Σ x̃ ỹ / Σ x̃²`` over the double-demeaned variables
    ``z̃ = z - z̄_unit - z̄_time + z̄`` — absorbing unit and time
    fixed effects without materializing a dummy for each (the
    Frisch–Waugh–Lovell projection for the two-way design).

    Three decimal-exact mean frames (unit, time, grand) broadcast
    onto the rows; the demeaned products are pinned at 6 dp before
    the final decimal fold (the x344/x352 discipline — the means are
    full-precision ratios).  Completes the causal family around
    x109's DiD: DiD is the 2×2 special case, this handles the full
    N×T panel.

    Output: ONE row ``(n, n_units, n_times, beta, se_naive)`` at
    6 dp; NULL beta on zero within-variance.
    """
    base = df.select(
        F.col(unit_col).cast("string").alias("i"),
        F.col(time_col).cast("long").alias("t"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).where(
        F.col("i").isNotNull()
        & F.col("t").isNotNull()
        & F.col("x").isNotNull()
        & F.col("y").isNotNull()
    )
    dec = lambda col: F.sum(col.cast("decimal(38,12)")).cast("double")  # noqa: E731
    mean_of = lambda keys, tag: base.groupBy(*keys).agg(  # noqa: E731
        (dec(F.col("x")) / F.count(F.lit(1))).alias(f"mx_{tag}"),
        (dec(F.col("y")) / F.count(F.lit(1))).alias(f"my_{tag}"),
    )
    mi = mean_of(["i"], "i")
    mt = mean_of(["t"], "t")
    mg = base.agg(
        (dec(F.col("x")) / F.count(F.lit(1))).alias("mx_g"),
        (dec(F.col("y")) / F.count(F.lit(1))).alias("my_g"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("i").cast("long").alias("n_units"),
        F.countDistinct("t").cast("long").alias("n_times"),
    )
    r6 = lambda col: F.round(col * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    xt = r6(
        F.col("x") - F.col("mx_i") - F.col("mx_t") + F.col("mx_g")
    )
    yt = r6(
        F.col("y") - F.col("my_i") - F.col("my_t") + F.col("my_g")
    )
    rows = (
        base.join(F.broadcast(mi), "i")
        .join(F.broadcast(mt), "t")
        .join(F.broadcast(mg))
        .select(
            F.col("n"), F.col("n_units"), F.col("n_times"),
            xt.alias("xt"), yt.alias("yt"),
        )
    )
    agg = rows.groupBy("n", "n_units", "n_times").agg(
        dec(F.col("xt") * F.col("yt")).alias("sxy"),
        dec(F.col("xt") * F.col("xt")).alias("sxx"),
        dec(F.col("yt") * F.col("yt")).alias("syy"),
    )
    sxx_safe = F.when(F.col("sxx") > 0, F.col("sxx"))
    beta = F.col("sxy") / sxx_safe
    dof = (
        F.col("n").cast("double")
        - F.col("n_units").cast("double")
        - F.col("n_times").cast("double")
        + F.lit(1.0)
    )
    ssr = F.col("syy") - F.col("sxy") * F.col("sxy") / sxx_safe
    se = F.sqrt(
        F.when(ssr > 0, ssr) / F.when(dof > 0, dof) / sxx_safe
    )
    return agg.select(
        "n", "n_units", "n_times",
        r6(beta).alias("beta"),
        r6(se).alias("se_naive"),
    )


def oaxaca_blinder(
    df: DataFrame,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-fold Oaxaca–Blinder decomposition (Oaxaca 1973; Blinder
    1973), single regressor, B-coefficients reference: the A−B gap in
    mean outcomes splits into

        explained   = (x̄_A − x̄_B) · b_B      (endowment difference)
        unexplained = x̄_A·(b_A − b_B) + (a_A − a_B)

    with each group's ``y ~ a + b x`` fit closed-form from
    decimal-exact sums in ONE conditional aggregation pass (the x337
    shape).  The canonical audit for "is the metric gap between two
    cohorts composition or treatment?" — the distribution-level
    sibling of x109 DiD and x360 matching.

    Output: ONE row ``(n_a, n_b, gap, explained, unexplained)`` at
    6 dp; NULL decomposition when either side's fit is degenerate.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).where(
        F.col("x").isNotNull()
        & F.col("y").isNotNull()
        & F.col("g").isin(str(group_a), str(group_b))
    )
    dec = lambda col: F.sum(col.cast("decimal(38,12)")).cast("double")  # noqa: E731

    def side(name, tag):
        cond = F.col("g") == name
        xd = F.when(cond, F.col("x"))
        yd = F.when(cond, F.col("y"))
        return [
            F.count(F.when(cond, F.lit(1))).cast("double").alias(
                f"n{tag}"
            ),
            dec(xd).alias(f"sx{tag}"),
            dec(yd).alias(f"sy{tag}"),
            dec(xd * F.col("x")).alias(f"sxx{tag}"),
            dec(xd * F.col("y")).alias(f"sxy{tag}"),
        ]

    agg = base.agg(*side(str(group_a), "a"), *side(str(group_b), "b"))

    def fit(tag):
        n = F.col(f"n{tag}")
        sx, sy = F.col(f"sx{tag}"), F.col(f"sy{tag}")
        sxx, sxy = F.col(f"sxx{tag}"), F.col(f"sxy{tag}")
        det = n * sxx - sx * sx
        det_safe = F.when((n >= 3) & (F.abs(det) > 0), det)
        b = (n * sxy - sx * sy) / det_safe
        a = (sy * sxx - sx * sxy) / det_safe
        return a, b, sx / F.when(n > 0, n), sy / F.when(n > 0, n)

    aa, ba, mxa, mya = fit("a")
    ab, bb, mxb, myb = fit("b")
    gap = mya - myb
    explained = (mxa - mxb) * bb
    unexplained = mxa * (ba - bb) + (aa - ab)
    r6 = lambda col: F.round(col * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        r6(gap).alias("gap"),
        r6(explained).alias("explained"),
        r6(unexplained).alias("unexplained"),
    )


def iv_wald(
    df: DataFrame,
    *,
    instrument_col: str,
    treatment_col: str,
    outcome_col: str,
) -> DataFrame:
    """Instrumental-variables Wald estimator (the 2SLS closed form
    for one binary-or-continuous instrument):

        ``beta_iv = cov(z, y) / cov(z, x)``

    — consistent when OLS is confounded, identified by the exclusion
    restriction.  Reported alongside the naive OLS slope so the
    confounding bias is visible in one row, plus the first-stage
    slope cov(z,x)/var(z) (a weak instrument shows up here, not in a
    crash).  One decimal-exact aggregation; all covariances from the
    same sufficient-statistic pass.  Completes the x109/x360–x363
    causal family with the endogeneity case.

    Output: ONE row ``(n, first_stage, beta_ols, beta_iv)`` at 6 dp;
    NULL beta_iv when cov(z,x) = 0 (irrelevant instrument), NULL
    first_stage when var(z) = 0.
    """
    base = df.select(
        F.col(instrument_col).cast("double").alias("z"),
        F.col(treatment_col).cast("double").alias("x"),
        F.col(outcome_col).cast("double").alias("y"),
    ).where(
        F.col("z").isNotNull()
        & F.col("x").isNotNull()
        & F.col("y").isNotNull()
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    agg = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("z")).alias("sz"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("z") * F.col("x")).alias("szx"),
        dec(F.col("z") * F.col("y")).alias("szy"),
        dec(F.col("z") * F.col("z")).alias("szz"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    cov_zy = F.col("szy") - F.col("sz") * F.col("sy") / n
    cov_zx = F.col("szx") - F.col("sz") * F.col("sx") / n
    var_z = F.col("szz") - F.col("sz") * F.col("sz") / n
    cov_xy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    var_x = F.col("sxx") - F.col("sx") * F.col("sx") / n
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        n.cast("long").alias("n"),
        r6(cov_zx / F.when(var_z > 0, var_z)).alias("first_stage"),
        r6(cov_xy / F.when(var_x > 0, var_x)).alias("beta_ols"),
        r6(
            cov_zy / F.when(F.abs(cov_zx) > 0, cov_zx)
        ).alias("beta_iv"),
    )


def competing_risks_cif(
    durations: DataFrame,
    *,
    t_col: str = "t",
    risk_col: str = "risk",
) -> DataFrame:
    """Aalen–Johansen cumulative incidence for two competing risks
    (Aalen & Johansen 1978): with per-time all-cause survival
    ``S(t⁻)`` (the x57 Kaplan–Meier product, exp-of-decimal-log-sum
    idiom) and cause-specific event counts ``d_k(t)``,

        ``CIF_k(t) = Σ_{s<=t} S(s⁻) · d_k(s) / n(s)``

    — the probability of failing FROM cause k by t while the other
    cause competes.  Naively running a separate KM per cause and
    taking 1−S overstates every cause (the competing event removes
    subjects KM would count as censored-at-random); AJ is the
    estimator that makes the causes sum correctly:
    ``CIF_1 + CIF_2 + S = 1`` at every step (asserted in tests).

    Input: one row per subject — integer duration and ``risk`` ∈
    {0 = censored, 1, 2}.  Plan shape exactly KM's: one duration-
    keyed aggregation (bounded by the time range), then ordered
    windows over those bounded rows; the CIF cumulations are
    order-pinned running sums.

    Output: ``(t, n_at_risk, d1, d2, n_censored, survival, cif1,
    cif2)`` for event times, 6 dp, ordered by t.
    """
    lifed = durations.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(risk_col).cast("int").alias("risk"),
    ).where(F.col("t").isNotNull() & F.col("risk").isin(0, 1, 2))
    per_t = lifed.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("__n_t"),
        F.sum((F.col("risk") == 1).cast("int")).cast("long").alias("d1"),
        F.sum((F.col("risk") == 2).cast("int")).cast("long").alias("d2"),
        F.sum((F.col("risk") == 0).cast("int"))
        .cast("long")
        .alias("n_censored"),
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = per_t.agg(F.sum("__n_t").alias("__N"))
    risked = per_t.crossJoin(F.broadcast(total)).withColumn(
        "n_at_risk",
        (
            F.col("__N")
            - F.coalesce(F.sum("__n_t").over(w_prev), F.lit(0))
        ).cast("long"),
    )
    d_all = (F.col("d1") + F.col("d2")).cast("double")
    n_risk = F.col("n_at_risk").cast("double")
    frac = F.try_divide(d_all, n_risk)
    log_term = F.when(
        F.col("d1") + F.col("d2") < F.col("n_at_risk"),
        F.log(F.lit(1.0) - frac).cast("decimal(28,18)"),
    ).otherwise(F.lit(0).cast("decimal(28,18)"))
    zero_flag = F.max(
        (
            F.col("d1") + F.col("d2") >= F.col("n_at_risk")
        ).cast("int")
    ).over(w_cum)
    s_prev = F.coalesce(
        F.when(
            F.max(
                (
                    F.col("d1") + F.col("d2") >= F.col("n_at_risk")
                ).cast("int")
            ).over(w_prev)
            == 1,
            F.lit(0.0),
        ).otherwise(
            F.exp(
                F.coalesce(
                    F.sum(log_term).over(w_prev),
                    F.lit(0).cast("decimal(28,18)"),
                ).cast("double")
            )
        ),
        F.lit(1.0),
    )
    surv = F.when(zero_flag == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(log_term).over(w_cum).cast("double"))
    )
    # order-pinned running CIF sums over the bounded time rows; the
    # per-term hazard share is pinned at 6 dp so both engines fold
    # identical doubles (the x357 discipline)
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    term1 = r6(
        s_prev * F.try_divide(F.col("d1").cast("double"), n_risk)
    )
    term2 = r6(
        s_prev * F.try_divide(F.col("d2").cast("double"), n_risk)
    )
    out = (
        risked.withColumn("survival", F.round(surv, 6))
        .withColumn("cif1", r6(F.sum(term1).over(w_cum)))
        .withColumn("cif2", r6(F.sum(term2).over(w_cum)))
        .where(F.col("d1") + F.col("d2") > 0)
    )
    return out.select(
        "t", "n_at_risk", "d1", "d2", "n_censored", "survival",
        "cif1", "cif2",
    ).orderBy("t")


def newsvendor_stock(
    df: DataFrame,
    *,
    group_col: str,
    demand_col: str,
    underage_cost: float,
    overage_cost: float,
) -> DataFrame:
    """Newsvendor optimal stocking per group (Arrow–Harris–Marschak
    1951): the cost-minimizing stock is the demand quantile at the
    critical ratio ``cu/(cu+co)``; reported with the expected
    per-period cost at that stock,

        ``E[cost] = mean(cu·max(d−S, 0) + co·max(S−d, 0))``

    — the decision-theoretic readout on top of the x39 quantile
    machinery: not "what is the distribution" but "how much to
    provision" (works unchanged for compute capacity / cache sizing
    from demand histories).  The quantile is Spark's exact
    ``percentile`` (linear interpolation, identical to DuckDB's
    quantile_cont — the x39 parity pair); the stock pins to 6 dp so
    every cost term is an exact ≤6-dp rational and the cost fold is
    decimal-exact.

    Output: ``(group, n_periods, critical_ratio, stock,
    expected_cost)`` at 6 dp, ordered by group.
    """
    cu, co = float(underage_cost), float(overage_cost)
    if cu <= 0 or co <= 0:
        raise ValueError(
            "newsvendor_stock: costs must be positive"
        )
    ratio = cu / (cu + co)
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(demand_col).cast("double").alias("d"),
    ).where(F.col("d").isNotNull())
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    stocks = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        r6(
            F.expr(f"percentile(d, {ratio!r})")
        ).alias("stock"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    cost = (
        F.lit(cu)
        * F.greatest(F.col("d") - F.col("stock"), F.lit(0.0))
        + F.lit(co)
        * F.greatest(F.col("stock") - F.col("d"), F.lit(0.0))
    )
    joined = base.join(F.broadcast(stocks), "g")
    agg = joined.groupBy("g", "n_periods", "stock").agg(
        (dec(cost) / F.col("n_periods")).alias("ec")
    )
    return agg.select(
        F.col("g").alias("group"),
        "n_periods",
        r6(F.lit(ratio)).alias("critical_ratio"),
        "stock",
        r6(F.col("ec")).alias("expected_cost"),
    ).orderBy("group")


def simpsons_paradox_scan(
    df: DataFrame,
    *,
    stratum_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Simpson's-paradox (amalgamation-reversal) scan: compare the
    POOLED OLS slope of y on x against every stratum's own slope and
    the within-strata (stratum-demeaned) slope — the one-row audit
    that catches the classic failure where every subgroup trends one
    way and the aggregate trends the other (Simpson 1951; the
    Berkeley-admissions shape).  Flags:

    * ``reversal_strata`` — strata whose slope sign opposes the
      pooled slope's (sign(0) never counts);
    * ``pooled_vs_within`` — 1 when the pooled and within slopes
      disagree in sign: the amalgamation is doing the work, so any
      causal read of the pooled slope must go through the x362 TWFE
      / x360 matching machinery instead.

    One conditional-aggregation pass for the per-stratum sufficient
    statistics (decimal-exact); pooled and within slopes are algebra
    over the same frame — no second scan.

    Output: ONE row ``(n, n_strata, pooled_slope, within_slope,
    reversal_strata, pooled_vs_within)`` at 6 dp.
    """
    base = df.select(
        F.col(stratum_col).cast("string").alias("s"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).where(
        F.col("s").isNotNull()
        & F.col("x").isNotNull()
        & F.col("y").isNotNull()
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    per_s = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
    )
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    slope_s = sxy_c / F.when(sxx_c > 0, sxx_c)
    enriched = per_s.select(
        "n", "sx", "sy", "sxx", "sxy",
        sxx_c.alias("cxx"), sxy_c.alias("cxy"),
        slope_s.alias("b_s"),
    )
    tot = enriched.agg(
        dec(F.col("n")).alias("N"),
        dec(F.col("sx")).alias("SX"),
        dec(F.col("sy")).alias("SY"),
        dec(F.col("sxx")).alias("SXX"),
        dec(F.col("sxy")).alias("SXY"),
        dec(F.col("cxx")).alias("WXX"),
        dec(F.col("cxy")).alias("WXY"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.count(
            F.when(F.col("b_s").isNotNull(), F.lit(1))
        ).alias("n_sloped"),
        # reversal counting needs the pooled sign — fold the per-sign
        # counts and resolve after the pooled slope is known
        F.count(F.when(F.col("b_s") > 0, F.lit(1)))
        .cast("long")
        .alias("n_pos"),
        F.count(F.when(F.col("b_s") < 0, F.lit(1)))
        .cast("long")
        .alias("n_neg"),
    )
    pooled_num = F.col("SXY") - F.col("SX") * F.col("SY") / F.col("N")
    pooled_den = F.col("SXX") - F.col("SX") * F.col("SX") / F.col("N")
    pooled = pooled_num / F.when(pooled_den > 0, pooled_den)
    within = F.col("WXY") / F.when(F.col("WXX") > 0, F.col("WXX"))
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    reversal = F.when(pooled > 0, F.col("n_neg")).when(
        pooled < 0, F.col("n_pos")
    )
    return tot.select(
        F.col("N").cast("long").alias("n"),
        "n_strata",
        r6(pooled).alias("pooled_slope"),
        r6(within).alias("within_slope"),
        reversal.alias("reversal_strata"),
        F.when(
            pooled.isNotNull() & within.isNotNull(),
            (
                (pooled > 0) & (within < 0)
                | ((pooled < 0) & (within > 0))
            ).cast("int"),
        ).alias("pooled_vs_within"),
    )


#: O'Brien-Fleming two-sided z boundaries for K=4 equally-spaced
#: looks at overall alpha 0.05 (Pocock/OBF tables — public spec
#: constants, injected as literals into BOTH engines).
OBF_4LOOK_BOUNDS = (4.049, 2.863, 2.337, 2.024)


def group_sequential_obf(
    events: DataFrame,
    *,
    salt: str = "gs",
    target_event: str = "purchase",
) -> DataFrame:
    """Group-sequential two-proportion monitoring with O'Brien-
    Fleming boundaries (O'Brien & Fleming 1979; the interim-analysis
    discipline that lets an experiment peek K times while holding
    overall α — the fixed-boundary complement to x256's always-valid
    mSPRT): users enter at their first event; four equally-spaced
    calendar looks accumulate each variant's converters; each look's
    pooled two-proportion z compares against its OBF bound, and the
    decision is the FIRST crossing look (or 'continue').

    Fully declarative: one per-user aggregate (first timestamp,
    converted flag, md5 hash variant — the x66 split), a broadcast
    time-range frame, one bounded 4-row cumulative window
    (metadata-scale by construction, the x343 precedent), literal
    boundaries.  Integer counts → identical z floats in the oracle.

    Output per look: ``look, n_a, n_b, conv_a, conv_b, z, bound,
    reject, decision``.
    """
    from .mixing import uniform_hash01

    per_user = events.groupBy(
        F.col("user_id").cast("long").alias("u")
    ).agg(
        F.min("ts_us").alias("first_ts"),
        F.max(
            F.when(F.col("event_type") == target_event, 1).otherwise(0)
        ).alias("conv"),
    )
    rng = per_user.agg(
        F.min("first_ts").alias("lo"), F.max("first_ts").alias("hi")
    )
    assigned = per_user.crossJoin(F.broadcast(rng)).select(
        "u",
        "conv",
        F.when(
            uniform_hash01(F.col("u"), salt) < 0.5, F.lit("a")
        )
        .otherwise(F.lit("b"))
        .alias("variant"),
        F.least(
            F.lit(4),
            (
                1
                + F.floor(
                    (F.col("first_ts") - F.col("lo"))
                    * 4
                    / (F.col("hi") - F.col("lo") + 1)
                )
            ).cast("int"),
        ).alias("look"),
    )
    per_look = assigned.groupBy("look", "variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("cv"),
    )
    looks = events.sparkSession.range(1, 5).select(
        F.col("id").cast("int").alias("look")
    )
    grid = (
        looks.join(
            per_look.where(F.col("variant") == "a").select(
                "look", F.col("n").alias("na_i"), F.col("cv").alias("ca_i")
            ),
            on="look",
            how="left",
        )
        .join(
            per_look.where(F.col("variant") == "b").select(
                "look", F.col("n").alias("nb_i"), F.col("cv").alias("cb_i")
            ),
            on="look",
            how="left",
        )
        .fillna(0)
    )
    w = Window.orderBy("look").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grid.select(
        "look",
        F.sum("na_i").over(w).cast("long").alias("n_a"),
        F.sum("nb_i").over(w).cast("long").alias("n_b"),
        F.sum("ca_i").over(w).cast("long").alias("conv_a"),
        F.sum("cb_i").over(w).cast("long").alias("conv_b"),
    )
    bounds = F.element_at(
        F.array(*[F.lit(b) for b in OBF_4LOOK_BOUNDS]), F.col("look")
    )
    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    # degenerate looks (pooled rate 0 or 1, or an empty arm) have no
    # z: try_divide yields NULL, matching the oracle's NULL division
    z = F.try_divide(
        pa - pb,
        F.sqrt(
            pp * (1.0 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    scored = cum.select(
        F.col("look").cast("long").alias("look"),
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        r6(z).alias("z"),
        bounds.alias("bound"),
        F.coalesce(
            (F.abs(r6(z)) >= bounds).cast("int"), F.lit(0)
        ).cast("long").alias("reject"),
    )
    w_dec = Window.orderBy("look").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return scored.select(
        "*",
        F.when(F.sum("reject").over(w_dec) > 0, F.lit("stop"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    ).orderBy("look")
