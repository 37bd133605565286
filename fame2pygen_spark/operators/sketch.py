"""Sketch-style summary operators: KMV distinct-count estimation and
per-group quantiles.

BASELINE.json north-star extensions.  Exact ``COUNT(DISTINCT x)`` per
group is a full shuffle of every distinct value; at 100 TB the scale
path is a bounded-state sketch.  Spark's built-in
``approx_count_distinct`` (HLL++) is engine-internal and cannot be
replicated by an external oracle, so alongside it this module provides
a KMV (k-minimum-values / bottom-k) sketch whose every intermediate is
deterministic column algebra — md5-based uniform hashing, a distinct
pass, a bottom-k window — and therefore value-for-value reproducible in
ANSI SQL.  The estimator is the classic bottom-k one (Bar-Yossef et
al., "Counting distinct elements in a data stream", RANDOM 2002):
with ``kth`` the k-th smallest of distinct uniform hashes on [0, R),
``D ≈ (k-1) * R / kth``.

Quantiles: ``group_quantiles`` uses Spark's exact ``percentile``
(linear interpolation at ``p*(n-1)``, identical definition to DuckDB's
``quantile_cont``) — exact answers shuffle every value per group, the
right default below ~10⁸ rows per group; the operator takes
``approx=True`` to switch to ``approx_percentile`` (t-digest, bounded
state) as the 100 TB path, at the cost of oracle-checkability.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "kmv_distinct", "group_quantiles", "countmin_sketch",
    "countmin_estimate", "group_histogram", "winsorize",
    "mad_outliers", "corr_pairs", "skew_profile",
    "group_entropy", "distribution_drift",
    "mutual_information", "benford_profile",
    "weighted_quantiles", "ks_statistic", "trimmed_mean",
    "concentration_index", "chi_square_independence",
    "quantile_normalize",
    "quantile_sketch",
]

#: 2^32 — range of the 8-hex-digit md5-prefix hash (same construction
#: as mixing.uniform_hash01; DuckDB spells the hash
#: ``('0x' || substr(md5(s), 1, 8))::BIGINT``)
_HASH_RANGE = 4_294_967_296


def _hash64(col: Column, salt: str) -> Column:
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group distinct-count estimate via a bottom-k (KMV) sketch.

    Pipeline: hash each value to a uniform 32-bit integer (md5 prefix —
    deterministic, engine-portable), dedupe ``(group, hash)``, keep the
    k smallest hashes per group (``row_number`` window), and estimate
    ``(k-1) * 2^32 / kth_hash``.  Groups with fewer than *k* distinct
    hashes report their exact count.

    Output: *group_cols* + ``n_kept`` (= min(distinct, k)),
    ``n_hash_distinct`` (exact count of distinct hashes — the
    collision-limited truth the sketch targets), ``est_distinct``
    (rounded to 6 dp; exact when ``n_kept < k``).

    Scale shape: the dedupe is one shuffle on ``(group, hash)`` with
    map-side partial aggregation absorbing duplicate-heavy corpora;
    the bottom-k window then shuffles only *distinct hashes* — already
    collision-bounded at ~2^32 rows per group worst case, and both the
    per-group count and the window are over that reduced set.  No
    per-group state ever exceeds the distinct-hash count, and the
    sketch itself is k values — mergeable across partitions, shards,
    or days (union the bottom-k sets, re-take the bottom k).  The
    32-bit hash caps resolvable cardinality at ~2^32; widen the prefix
    for more (the estimator is unchanged).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    group_cols = list(group_cols)

    hashed = df.select(
        *group_cols, _hash64(F.col(value_col), salt).alias("__h")
    )
    distinct = hashed.distinct()

    w = Window.partitionBy(*group_cols).orderBy("__h")
    bottom_k = (
        distinct.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("__h").alias("__kth"),
        )
    )
    totals = distinct.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_hash_distinct")
    )

    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(_HASH_RANGE)) / F.col("__kth"),
            6,
        )
    )
    return (
        bottom_k.join(totals, on=group_cols)
        .withColumn("est_distinct", est)
        .drop("__kth")
    )


def group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float],
    *,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles of *value_col* at each probability in
    *probs*, as columns ``p<prob*100>`` (dots stripped: p25, p50, p99,
    p99_9), plus ``n`` — rounded to 6 dp.

    ``approx=False`` (default): Spark's exact ``percentile`` — linear
    interpolation at ``p*(n-1)``, the same definition as DuckDB
    ``quantile_cont``, so results are oracle-checkable.  Exact
    quantiles buffer each group's values on the aggregating executor;
    fine to ~10⁸ rows per group.

    ``approx=True``: ``approx_percentile`` with *accuracy* — bounded
    state, the 100 TB path; same output schema, not bitwise
    oracle-reproducible (pytest bounds its error vs exact instead).
    """
    group_cols = list(group_cols)
    cols = []
    for p in probs:
        name = f"p{p * 100:g}".replace(".", "_")
        if approx:
            q = F.expr(
                f"approx_percentile(`{value_col}`, {float(p)}, {int(accuracy)})"
            )
            cols.append(F.round(q, 6).alias(name))
        else:
            q = F.expr(f"percentile(`{value_col}`, {float(p)})")
            # tie-safe cross-engine round for a RAW interpolated
            # double: explicit *1e6 so Spark and the quantile_cont
            # oracles round the identical double (see theil_sen)
            cols.append((F.round(q * F.lit(1e6)) / F.lit(1e6)).alias(name))
    return df.groupBy(*group_cols).agg(
        F.count(value_col).cast("long").alias("n"), *cols
    )


def countmin_sketch(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 3,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch of a value stream (Cormode & Muthukrishnan,
    J. Algorithms 2005): a ``depth × width`` counter table
    ``(r, bucket, c)`` where row *r* hashes each value with an
    independent md5-derived function and counts per bucket.

    Deterministic column algebra end-to-end (md5-prefix hashing, one
    explode into *depth* (r, bucket) keys, one groupBy) — so, unlike
    engine-internal sketches, every counter is reproducible in ANSI
    SQL.  The sketch is ``depth × width`` cells regardless of input
    size, mergeable by cell-wise addition across partitions, shards,
    or days; the build is one uniform-key shuffle of *depth* rows per
    input value with map-side partial aggregation absorbing the
    duplicate-heavy mass.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    cells = [
        F.struct(
            F.lit(r).alias("r"),
            (_hash64(F.col(value_col), f"{salt}:{r}") % width)
            .cast("long")
            .alias("bucket"),
        )
        for r in range(depth)
    ]
    return (
        df.select(F.explode(F.array(*cells)).alias("cell"))
        .groupBy(
            F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.count("*").cast("long").alias("c"))
    )


def countmin_estimate(
    df: DataFrame,
    value_col: str,
    probes: Sequence[str],
    *,
    depth: int = 3,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-min frequency estimates for *probes*: ``(term, true_n,
    est_n)`` with the sketch guarantee ``est_n >= true_n`` (collisions
    only ever add).

    The probe side is a literal frame of |probes| × depth (r, bucket)
    keys; the sketch (``depth × width`` rows — KBs) joins broadcast,
    and the estimate is the min counter across rows.  True counts come
    from one filtered aggregation of the same stream — included so the
    estimate is self-auditing; at 100 TB you would keep only the
    sketch path (bounded state) and drop the exact pass.
    """
    probes = [str(p) for p in probes]
    sketch = countmin_sketch(
        df, value_col, depth=depth, width=width, salt=salt
    )
    spark = df.sparkSession
    probe_df = spark.createDataFrame(
        [(p,) for p in probes], f"term string"
    )
    keys = probe_df.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (_hash64(F.col("term"), f"{salt}:{r}") % width)
                        .cast("long")
                        .alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("term", F.col("cell.r").alias("r"),
             F.col("cell.bucket").alias("bucket"))

    from pyspark.sql.functions import broadcast

    est = (
        keys.join(broadcast(sketch), on=["r", "bucket"], how="left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
    )
    true_n = (
        df.where(F.col(value_col).isin(probes))
        .groupBy(F.col(value_col).alias("term"))
        .agg(F.count("*").cast("long").alias("true_n"))
    )
    return (
        est.join(true_n, on="term", how="left")
        .select(
            "term",
            F.coalesce("true_n", F.lit(0)).cast("long").alias("true_n"),
            F.col("est_n").cast("long").alias("est_n"),
        )
    )


def group_histogram(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Per-group equi-width histogram over [*lo*, *hi*): ``(group,
    bin, bin_lo, bin_hi, n)`` with ``bin = floor((v - lo) / width)``,
    values below *lo* clamped into bin 0 and values ≥ *hi* into the
    last bin (so every non-null value is counted exactly once and the
    bin count is fixed).

    The bin edges are caller-supplied constants, so the histogram is
    one map-side bin assignment plus one hash aggregation bounded by
    |groups| × *bins* — no data-dependent statistics pass, no driver
    action, deterministic across engines.  Empty bins emit no row
    (sparse output; densify by joining a ``sequence`` frame if a
    fixed-shape vector is needed).
    """
    if bins < 1:
        raise ValueError("bins must be positive")
    if not hi > lo:
        raise ValueError("hi must exceed lo")
    group_cols = list(group_cols)
    width = (float(hi) - float(lo)) / bins
    raw = F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("long")
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("bin"))
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn(
            "bin_lo", F.round(F.lit(float(lo)) + F.col("bin") * width, 6)
        )
        .withColumn(
            "bin_hi", F.round(F.lit(float(lo)) + (F.col("bin") + 1) * width, 6)
        )
        .select(*group_cols, "bin", "bin_lo", "bin_hi", "n")
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lower_p: float = 0.01,
    upper_p: float = 0.99,
) -> DataFrame:
    """Per-group quantile clipping (winsorization): appends
    ``<value>_w`` (the value clipped into the group's
    [*lower_p*, *upper_p*] exact quantiles, 6 dp) and ``clipped``
    (whether the row was moved).

    Standard robust preprocessing before scaling-sensitive models.
    Plan shape: one exact-percentile aggregate per group (|groups|
    rows — see :func:`group_quantiles` for the exact-vs-t-digest
    trade-off), broadcast back onto the stream; clipping is row-local
    arithmetic inside the scan stage.  Null values pass through
    unclipped.
    """
    if not 0.0 <= lower_p < upper_p <= 1.0:
        raise ValueError("need 0 <= lower_p < upper_p <= 1")
    group_cols = list(group_cols)
    bounds = df.groupBy(*group_cols).agg(
        F.expr(f"percentile(`{value_col}`, {float(lower_p)})").alias("__lo"),
        F.expr(f"percentile(`{value_col}`, {float(upper_p)})").alias("__hi"),
    )
    v = F.col(value_col)
    # explicit null passthrough: Spark's greatest/least SKIP nulls, so
    # a bare least(greatest(v, lo), hi) would clip null to lo
    clipped = F.when(
        v.isNotNull(),
        F.round(F.least(F.greatest(v, F.col("__lo")), F.col("__hi")), 6),
    )
    return (
        df.join(F.broadcast(bounds), on=group_cols)
        .withColumn(f"{value_col}_w", clipped)
        .withColumn(
            "clipped",
            F.when(v.isNull(), F.lit(False)).otherwise(
                (v < F.col("__lo")) | (v > F.col("__hi"))
            ),
        )
        .drop("__lo", "__hi")
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier flagging via the median absolute
    deviation: appends ``robust_z`` (``0.6745·(v − median)/MAD``, the
    consistency-scaled score of Iglewicz & Hoaglin's modified z-test,
    6 dp) and ``is_outlier`` (``|robust_z| > threshold``; false when
    MAD is 0 or the value is null).

    Unlike the mean/stddev z-score (:func:`~fame2pygen_spark.
    operators.behavior.value_outliers`), the breakdown point is 50% —
    a contaminated tail cannot mask itself.  Two exact-percentile
    aggregates (group medians, then medians of absolute deviations —
    both |groups|-sized, broadcast back); scoring is row-local.
    """
    group_cols = list(group_cols)
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile(`{value_col}`, 0.5)").alias("__med")
    )
    dev = df.join(F.broadcast(med), on=group_cols).withColumn(
        "__ad", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.expr("percentile(`__ad`, 0.5)").alias("__mad"),
        F.max("__med").alias("__med"),
    )
    z = F.round(
        F.lit(0.6745)
        * F.try_divide(F.col(value_col) - F.col("__med"), F.col("__mad")),
        6,
    )
    return (
        df.join(F.broadcast(mad), on=group_cols)
        .withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.coalesce(
                F.abs(F.col("robust_z")) > F.lit(float(threshold)),
                F.lit(False),
            ),
        )
        .drop("__med", "__mad")
    )


def corr_pairs(
    df: DataFrame,
    group_cols: Sequence[str],
    cols: Sequence[str],
) -> DataFrame:
    """Per-group Pearson correlation for every unordered pair of
    *cols*: ``(group, col_x, col_y, n, corr)`` (6 dp).

    Built from exact decimal moment sums — n, Σx, Σy, Σxy, Σx², Σy² —
    rather than the engine's ``corr`` aggregate: float aggregates
    depend on accumulation order, so ``corr()`` is not bitwise
    reproducible across partitionings or engines, while decimal sums
    are order-insensitive (the repo's x10 idiom applied to second
    moments).  One hash aggregation computes every moment for every
    pair; rows where either value is null are excluded per pair
    (pairwise deletion).  ``corr`` is null for constant columns.
    """
    group_cols = list(group_cols)
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("need at least 2 columns")
    dec = "decimal(28,6)"
    aggs = []
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    for x, y in pairs:
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        cx = F.when(both, F.col(x))
        cy = F.when(both, F.col(y))
        tag = f"{x}__{y}"
        # every moment must use the pair-filtered columns: a raw y*y
        # would include rows where only x is null and skew syy
        aggs += [
            F.count(F.when(both, 1)).cast("long").alias(f"__n_{tag}"),
            F.sum(cx.cast(dec)).alias(f"__sx_{tag}"),
            F.sum(cy.cast(dec)).alias(f"__sy_{tag}"),
            F.sum((cx * cy).cast(dec)).alias(f"__sxy_{tag}"),
            F.sum((cx * cx).cast(dec)).alias(f"__sxx_{tag}"),
            F.sum((cy * cy).cast(dec)).alias(f"__syy_{tag}"),
        ]
    m = df.groupBy(*group_cols).agg(*aggs)

    rows = []
    for x, y in pairs:
        tag = f"{x}__{y}"
        n = F.col(f"__n_{tag}").cast("double")
        sx = F.col(f"__sx_{tag}").cast("double")
        sy = F.col(f"__sy_{tag}").cast("double")
        sxy = F.col(f"__sxy_{tag}").cast("double")
        sxx = F.col(f"__sxx_{tag}").cast("double")
        syy = F.col(f"__syy_{tag}").cast("double")
        corr = F.try_divide(
            n * sxy - sx * sy,
            F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
        )
        rows.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.col(f"__n_{tag}").alias("n"),
                F.round(corr, 6).alias("corr"),
            )
        )
    return m.select(
        *group_cols, F.explode(F.array(*rows)).alias("s")
    ).select(*group_cols, "s.*")


def skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    top_k: int = 10,
    gini_buckets: int = 1024,
) -> DataFrame:
    """Key-distribution skew diagnostic for a prospective shuffle key:
    the *top_k* heaviest keys with their shares, plus distribution-wide
    concentration stats repeated on every row — ``(rank, key, n,
    share, n_keys, gini)``.

    ``gini`` is the EXACT Gini coefficient of the per-key count
    distribution (0 = perfectly uniform keys, → 1 = one key dominates),
    i.e. the sorted-index formula ``G = 2·Σ(i·cᵢ)/(K·Σc) − (K+1)/K``
    over counts sorted ascending.  Run this before keying a 100 TB
    join or aggregation: a high gini or a top-key share over a few
    percent is the signal to salt (``functions.core.salted_agg``) or
    isolate hot keys.

    Plan shape — deliberately NO unpartitioned window (this is the
    very diagnostic you run when |keys| is 10⁹, so it must not
    single-partition-sort the keys it profiles):

    - top-k via ``orderBy().limit()`` → TakeOrderedAndProject (a
      per-partition heap + driver merge of k·P rows); ranks for the
      surviving ≤k rows come from a k² broadcast self-join.
    - Σ i·cᵢ never materializes per-key ranks.  Keys tied on the same
      count contribute ``c·(m·s + m(m+1)/2)`` regardless of intra-tie
      order (s = #keys with smaller count, m = tie size), so the sum
      decomposes over the DISTINCT COUNT VALUES: group counts by
      value (|V| ≤ |keys|, typically ≪), bucket values by fixed-width
      range into ≤*gini_buckets* buckets, compute cross-bucket prefix
      offsets with a bounded bucket²-pair broadcast join and
      within-bucket prefixes with a bucket-PARTITIONED window, then
      one decimal-exact aggregation.  Every per-key / per-value stage
      is hash-partitioned; only ≤gini_buckets-row frames are ever
      driver-bounded.
    """
    key_cols = list(key_cols)
    counts = df.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n")
    ).withColumn(
        "__key", F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    )

    # --- distribution summary: exact Gini via tie-block decomposition
    vals = counts.groupBy("n").agg(F.count("*").cast("long").alias("m"))
    mx = vals.agg(F.max("n").alias("__mx"))  # 1 row
    width = F.greatest(
        F.ceil(F.col("__mx") / F.lit(int(gini_buckets))).cast("long"),
        F.lit(1).cast("long"),
    )
    vals = vals.crossJoin(F.broadcast(mx)).withColumn(
        "__b", ((F.col("n") - 1) / width).cast("long")
    ).drop("__mx")
    bsum = vals.groupBy("__b").agg(F.sum("m").alias("__mb"))
    lower = bsum.select(
        F.col("__b").alias("__b2"), F.col("__mb").alias("__mb2")
    )
    off = (
        bsum.join(F.broadcast(lower), F.col("__b2") < F.col("__b"), "left")
        .groupBy("__b")
        .agg(F.coalesce(F.sum("__mb2"), F.lit(0)).alias("__off"))
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(F.col("n").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        vals.join(off, on="__b")
        .withColumn(
            "__start",
            F.col("__off") + F.coalesce(F.sum("m").over(w_in), F.lit(0)),
        )
    )
    # c·(m·s + m(m+1)/2): inner products fit long to ~3e9 keys; the
    # outer product and the sum go through decimal(38,0) (exact, and
    # matching DuckDB's exact HUGEINT SUM(i*n) after the double cast)
    inner = F.col("m") * F.col("__start") + F.expr("m * (m + 1) div 2")
    term = F.col("n").cast("decimal(38,0)") * inner.cast("decimal(38,0)")
    summary = staged.agg(
        F.sum("m").cast("long").alias("n_keys"),
        F.sum((F.col("n") * F.col("m")).cast("decimal(38,0)"))
        .cast("double")
        .alias("__tot"),
        F.sum(term).cast("double").alias("__iw"),
    ).select(
        "n_keys",
        "__tot",
        F.round(
            F.lit(2.0)
            * F.col("__iw")
            / (F.col("n_keys") * F.col("__tot"))
            - (F.col("n_keys") + 1.0) / F.col("n_keys"),
            6,
        ).alias("gini"),
    )

    # --- top-k: TakeOrderedAndProject, then rank by bounded self-join
    top = counts.orderBy(F.col("n").desc(), F.col("__key").asc()).limit(
        int(top_k)
    )
    better = top.select(
        F.col("__key").alias("__k2"), F.col("n").alias("__n2")
    )
    ranked = (
        top.join(
            F.broadcast(better),
            (F.col("__n2") > F.col("n"))
            | ((F.col("__n2") == F.col("n")) & (F.col("__k2") < F.col("__key"))),
            "left",
        )
        .groupBy("__key", "n")
        .agg((F.count("__k2") + 1).cast("long").alias("rank"))
    )
    return ranked.crossJoin(F.broadcast(summary)).select(
        "rank",
        F.col("__key").alias("key"),
        "n",
        F.round(F.col("n") / F.col("__tot"), 6).alias("share"),
        "n_keys",
        "gini",
    )


def group_entropy(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Shannon entropy (bits) of the categorical *value_col*
    distribution within each group: ``(group, n, n_distinct,
    entropy)`` — the diversity metric behind "does this user/source
    do one thing or many" questions; 0 for single-valued groups,
    ``log2(k)`` for k uniform categories.

    Two stacked uniform-key aggregations — (group, value) counts,
    then ``−Σ p·log2 p`` per group — all column algebra, no window.
    Null values count as their own category is avoided: nulls are
    excluded (entropy of observed categories).
    """
    group_cols = list(group_cols)
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count("*").alias("__c"))
    )
    tot = Window.partitionBy(*group_cols)
    p = F.col("__c") / F.sum("__c").over(tot)
    return (
        counts.withColumn("__plp", -p * F.log2(p))
        .groupBy(*group_cols)
        .agg(
            F.sum("__c").cast("long").alias("n"),
            F.count("*").cast("long").alias("n_distinct"),
            F.round(F.sum("__plp"), 6).alias("entropy"),
        )
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two samples of a numeric
    column: one row — ``(n_a, n_b, psi)`` with
    ``PSI = Σ (pₐ−p_b)·ln(pₐ/p_b)`` over shared equi-width bins
    (clamped at the boundaries, so every value lands in a bin).

    The standard drift gate between a reference window and a fresh
    batch (rule of thumb: <0.1 stable, >0.25 shifted).  *epsilon*
    floors empty-bin shares so the log stays finite — the same
    smoothing both engines reproduce exactly.

    Plan shape: each side is one bounded histogram aggregation
    (≤ |bins| rows); the bin join, the broadcast of the 1-row totals,
    and the final reduce all run over those few rows.
    """
    # union + conditional aggregation, NOT a full outer bin join: full
    # outer cannot broadcast, so the join form sort-merges even over
    # <= |bins| rows; the tagged union needs no join at all
    tagged = df_a.select(
        F.lit(0).alias("__side"), F.col(value_col)
    ).unionByName(df_b.select(F.lit(1).alias("__side"), F.col(value_col)))
    h = group_histogram(tagged, ["__side"], value_col, lo=lo, hi=hi,
                        bins=bins)
    j = h.groupBy("bin").agg(
        F.coalesce(F.sum(F.when(F.col("__side") == 0, F.col("n"))),
                   F.lit(0)).alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("__side") == 1, F.col("n"))),
                   F.lit(0)).alias("n_b"),
    )
    tot = j.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    x = j.crossJoin(F.broadcast(tot))
    eps = F.lit(float(epsilon))
    pa = F.greatest(F.col("n_a") / F.col("ta"), eps)
    pb = F.greatest(F.col("n_b") / F.col("tb"), eps)
    return x.groupBy().agg(
        F.max("ta").alias("n_a"),
        F.max("tb").alias("n_b"),
        F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
    )


def mutual_information(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Mutual information (bits) between two categorical columns: one
    row — ``(n, h_a, h_b, h_ab, mi, nmi)`` with ``MI = H(a) + H(b) −
    H(a,b)`` and ``nmi = MI / max(H(a), H(b))`` (0 when either margin
    is constant) — the dependence screen for feature/label pairs that
    correlation cannot see (it is order-free and nonlinear-safe).

    Plan shape: ONE (a, b) joint-count aggregation (the only shuffle
    over data); both margins reduce from the joint counts, and the
    three entropies are sums over the joint/margin frames (≤ |a|·|b|
    rows).  Null in either column drops the row (observed-pairs MI).
    """
    pairs = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count("*").alias("c"))
    )

    def _entropy(counts, out):
        tot = counts.agg(F.sum("c").alias("t"))
        x = counts.crossJoin(F.broadcast(tot))
        p = F.col("c") / F.col("t")
        return x.agg(
            F.max("t").alias(f"__n_{out}"),
            F.sum(-p * F.log2(p)).alias(out),
        )

    h_ab = _entropy(pairs, "h_ab")
    h_a = _entropy(pairs.groupBy("a").agg(F.sum("c").alias("c")), "h_a")
    h_b = _entropy(pairs.groupBy("b").agg(F.sum("c").alias("c")), "h_b")
    j = h_ab.crossJoin(F.broadcast(h_a)).crossJoin(F.broadcast(h_b))
    mi = F.col("h_a") + F.col("h_b") - F.col("h_ab")
    return j.select(
        F.col("__n_h_ab").cast("long").alias("n"),
        F.round("h_a", 6).alias("h_a"),
        F.round("h_b", 6).alias("h_b"),
        F.round("h_ab", 6).alias("h_ab"),
        F.round(mi, 6).alias("mi"),
        F.round(
            F.coalesce(
                F.try_divide(mi, F.greatest(F.col("h_a"), F.col("h_b"))),
                F.lit(0.0),
            ),
            6,
        ).alias("nmi"),
    )


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law: one row
    per digit 1–9 — ``(digit, n, share, expected, deviation)`` with
    ``expected = log10(1 + 1/d)`` and ``deviation = share − expected``.

    The classic fabricated-data / unit-mixing screen for positive
    numeric columns spanning orders of magnitude.  The first
    significant digit comes from the decimal string of ``abs(value)``
    stripped of zeros and the point — pure string algebra, identical
    in both engines (no float-log edge cases at powers of ten).
    Zero/null values are excluded.  One bounded (≤9-row) aggregation.
    """
    digit = F.substring(
        F.regexp_replace(
            F.format_number(F.abs(F.col(value_col)), 10), r"[0.,]", ""
        ),
        1,
        1,
    ).cast("long")
    counts = (
        df.where(F.col(value_col).isNotNull() & (F.col(value_col) != 0))
        .select(digit.alias("digit"))
        .where(F.col("digit").isNotNull() & (F.col("digit") > 0))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("t"))
    x = counts.crossJoin(F.broadcast(tot))
    share = F.col("n") / F.col("t")
    expected = F.log10(1.0 + F.try_divide(F.lit(1.0), F.col("digit")))
    return x.select(
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        F.round(expected, 6).alias("expected"),
        F.round(share - expected, 6).alias("deviation"),
    )


def weighted_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    probs: Sequence[float],
) -> DataFrame:
    """Per-group weight-aware quantiles: for each probability *p* the
    smallest value whose cumulative weight reaches ``p · Σw`` (the
    lower-bound rule — exact, deterministic, and engine-portable,
    unlike interpolating weighted-percentile variants that differ by
    library).  Columns ``p<prob*100>`` plus ``n`` and ``w_total``.

    The estimator for "median document length in TOKENS" style
    questions where each row should count by its weight, not once.
    Rows with null or non-positive weight are excluded.

    Plan shape: one group-keyed sort window for the running weight,
    then a min-conditional aggregation per probability — a single
    shuffle, no per-group collect.
    """
    group_cols = list(group_cols)
    filtered = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        & F.col(value_col).isNotNull()
    )
    # windows order by the STAGED column — referencing value_col after
    # the rename would fail analysis (cf. time_weighted_avg)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    staged = filtered.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.col(weight_col).alias("__w"),
    ).withColumn("__cw", F.sum("__w").over(w)).withColumn(
        "__tw", F.sum("__w").over(tot)
    )
    # outputs are cast to double explicitly: with integral value/weight
    # columns F.round preserves LONG while a SQL oracle's ROUND yields
    # DOUBLE, and the stringified hash compare fails on type alone
    # (7949 vs 7949.0)
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.round(F.max("__tw"), 6).cast("double").alias("w_total"),
    ]
    for p in probs:
        name = f"p{p * 100:g}".replace(".", "_")
        aggs.append(
            F.round(
                F.min(
                    F.when(
                        F.col("__cw") >= F.lit(float(p)) * F.col("__tw"),
                        F.col("__v"),
                    )
                ),
                6,
            ).cast("double").alias(name)
        )
    return staged.groupBy(*group_cols).agg(*aggs)


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    bins: int | None = None,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic: one row — ``(n_a, n_b,
    ks)`` with ``ks = max |ECDF_a(v) − ECDF_b(v)|`` — the
    nonparametric complement to the binned PSI
    (:func:`distribution_drift`).

    ``bins=None`` (default) is EXACT: per-sample value counts reduce
    each side to its distinct support, and running sums over the
    pooled values give both ECDFs at every support point (a missing
    side carries its last value forward via the running sum of
    zero-filled counts).  The sort window runs over |distinct values|
    rows — for continuous columns that approaches |rows| in a single
    partition, so the exact path is the small/categorical-data choice.

    ``bins=K`` is the SCALE path (the shared-equi-width shape of
    :func:`distribution_drift`): values bucket into K clamped bins
    over [*lo*, *hi*] (derived from the pooled min/max via a 1-row
    broadcast when not given), ECDFs are evaluated at bin upper
    edges, and the only window runs over ≤K rows — bounded regardless
    of data size.  Binned KS is a lower bound on exact KS and
    converges from below as K grows (error ≤ the largest probability
    mass inside one bin); ``tests/test_extensions.py`` pins
    binned-vs-exact agreement on a planted shift.
    """
    # tagged union + one conditional aggregation — the full-outer
    # support join would sort-merge (full outer cannot broadcast)
    tagged = (
        df_a.where(F.col(value_col).isNotNull())
        .select(F.lit(0).alias("__side"), F.col(value_col).alias("v"))
        .unionByName(
            df_b.where(F.col(value_col).isNotNull())
            .select(F.lit(1).alias("__side"), F.col(value_col).alias("v"))
        )
    )
    if bins is not None:
        if lo is None or hi is None:
            rng = tagged.agg(
                F.min("v").cast("double").alias("__lo"),
                F.max("v").cast("double").alias("__hi"),
            )
            tagged = tagged.crossJoin(F.broadcast(rng))
            c_lo, c_hi = F.col("__lo"), F.col("__hi")
        else:
            c_lo, c_hi = F.lit(float(lo)), F.lit(float(hi))
        width = (c_hi - c_lo) / F.lit(int(bins))
        # try_divide: a constant column (hi == lo → width 0) yields
        # null, and every value lands in bin 0 via the coalesce
        raw = F.floor(F.try_divide(F.col("v") - c_lo, width)).cast("long")
        bucket = F.coalesce(
            F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1)),
            F.lit(0),
        )
        pooled = tagged.groupBy(bucket.alias("v")).agg(
            F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("nb"),
        )
    else:
        pooled = tagged.groupBy("v").agg(
            F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("nb"),
        )
    tot = pooled.agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ecdf = pooled.select(
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
    ).crossJoin(F.broadcast(tot))
    return ecdf.agg(
        F.max("ta").cast("long").alias("n_a"),
        F.max("tb").cast("long").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb")
                )
            ),
            6,
        ).alias("ks"),
    )


def trimmed_mean(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lower_p: float = 0.05,
    upper_p: float = 0.95,
) -> DataFrame:
    """Per-group trimmed mean: the mean of values INSIDE the group's
    exact [*lower_p*, *upper_p*] quantile band (inclusive) —
    ``(group, n, n_kept, trimmed_mean)``.  The dropping counterpart to
    :func:`winsorize` (which clips): robust location that discards the
    tails entirely.

    One exact-percentile aggregate broadcast back, then a filtered
    decimal-sum mean (order-insensitive, the x10 idiom).
    """
    if not 0.0 <= lower_p < upper_p <= 1.0:
        raise ValueError("need 0 <= lower_p < upper_p <= 1")
    group_cols = list(group_cols)
    bounds = df.groupBy(*group_cols).agg(
        F.expr(f"percentile(`{value_col}`, {float(lower_p)})").alias("__lo"),
        F.expr(f"percentile(`{value_col}`, {float(upper_p)})").alias("__hi"),
    )
    v = F.col(value_col)
    inside = v.isNotNull() & (v >= F.col("__lo")) & (v <= F.col("__hi"))
    return (
        df.join(F.broadcast(bounds), on=group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(value_col).cast("long").alias("n"),
            F.sum(inside.cast("long")).alias("n_kept"),
            F.round(
                F.try_divide(
                    F.sum(F.when(inside, v).cast("decimal(28,6)"))
                    .cast("double"),
                    F.sum(inside.cast("long")).cast("double"),
                ),
                6,
            ).alias("trimmed_mean"),
        )
    )


def concentration_index(
    df: DataFrame,
    group_cols: Sequence[str],
    member_col: str,
    weight_col,
) -> DataFrame:
    """Herfindahl–Hirschman concentration of *weight_col* across the
    members of each group: ``(group, n_members, hhi, top_share)`` with
    ``hhi = Σ shareᵢ²`` over per-member weight shares (1/n for perfect
    uniformity → 1.0 for a single dominant member) — the classic
    market-concentration index, here the "is this nation's revenue one
    supplier or many" diagnostic.

    *weight_col* may be a column name or a Column expression.  Two
    stacked aggregations: (group, member) weight sums — decimal-cast
    so shares are order-insensitive — then the share moments per
    group.  Shares are a single double division of exact decimal sums,
    and the second moment Σs² goes through decimal(28,18) (corr_pairs
    idiom) so hhi is accumulation-order insensitive — a plain double
    F.sum differs across engines in the 6th decimal.  Output is
    |groups| rows.
    """
    group_cols = list(group_cols)
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    per_member = df.groupBy(*group_cols, member_col).agg(
        F.sum(w.cast("decimal(28,6)")).alias("__w")
    )
    tot = Window.partitionBy(*group_cols)
    share = F.col("__w").cast("double") / F.sum("__w").over(tot).cast(
        "double"
    )
    return (
        per_member.withColumn("__s", share)
        .groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.round(
                F.sum(
                    (F.col("__s") * F.col("__s")).cast("decimal(28,18)")
                ).cast("double"),
                6,
            ).alias("hhi"),
            F.round(F.max("__s"), 6).alias("top_share"),
        )
    )


# ------------------------------------------------------------ HyperLogLog


def hll_register_cols(
    value_col: str, *, b: int = 6, salt: str = "hll"
) -> tuple[Column, Column]:
    """The one shared HLL hashing definition: ``(register_index,
    rank)`` Columns for *value_col* — md5 first byte (mod 2^b) picks
    the register, the next 32 bits give the rank (``33 −
    bit_length``, pure integer/string ops).  Every HLL producer
    (:func:`hll_distinct`, :func:`hll_merge_rollup`,
    ``streaming.core.streaming_hll_registers``) builds registers
    through THIS function, so merge/finalize equivalence is enforced
    structurally, not by copy discipline.
    """
    m = 1 << b
    hexd = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(value_col).cast("string"))
    )
    w_hex = F.substring(hexd, 3, 8)
    w = F.conv(w_hex, 16, 10).cast("long")
    rank = F.when(w == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.conv(w_hex, 16, 2))
    )
    idx = F.conv(F.substring(hexd, 1, 2), 16, 10).cast("long") % m
    return idx, rank


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    b: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Per-group distinct-count estimate via HyperLogLog registers
    (Flajolet et al. 2007) — the mergeable, fixed-size counterpart to
    the bottom-k KMV sketch (:func:`kmv_distinct`).

    ``m = 2^b`` registers.  Each value hashes to an md5 digest; the
    first byte (mod m — exact uniform, 256 % 64 == 0) picks a register
    and the next 32 bits give the rank (number of leading zeros + 1,
    computed as ``33 - bit_length`` via base-2 string conversion —
    pure integer/string ops, no libm, so DuckDB reproduces every
    register exactly).  The raw HLL estimate ``alpha_m * m^2 /
    sum(2^-M_j)`` is also engine-exact: every ``2^-M_j`` is an exact
    power of two from an integer shift, their sum spans < 53 mantissa
    bits (ranks are 1..33), and IEEE division is deterministic.

    Scale shape: ONE shuffle to ``(group, register)`` with map-side
    max partial aggregation, then a tiny per-group rollup — state is
    exactly m integers per group no matter how many rows, and two
    register sets merge by pairwise max (shard/day/stream mergeable).
    ``exact_distinct`` (a count-distinct, i.e. a full dedupe shuffle)
    is included for accuracy display at test SF; drop it at 100 TB.

    Output: *group_cols* + ``m``, ``n_zero_regs``, ``est_distinct``
    (raw HLL, no small-range correction — the linear-counting branch
    needs ``ln`` whose last ulp is libm-specific), ``exact_distinct``,
    ``rel_err``.
    """
    m = 1 << b
    group_cols = list(group_cols)
    alpha = 0.7213 / (1.0 + 1.079 / m)

    idx, rank = hll_register_cols(value_col, b=b, salt=salt)
    hashed = df.select(
        *group_cols,
        idx.alias("__idx"),
        rank.cast("int").alias("__rank"),
    )
    regs = hashed.groupBy(*group_cols, "__idx").agg(
        F.max("__rank").alias("__reg")
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("__n_present"),
        F.sum(
            F.expr("1.0 / shiftleft(cast(1 as bigint), __reg)")
        ).alias("__s_present"),
    )
    sum_inv = (
        F.col("__s_present")
        + (F.lit(m) - F.col("__n_present")).cast("double")
    )
    est = F.round(F.lit(alpha * m * m) / sum_inv, 6)

    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).cast("long").alias("exact_distinct")
    )
    out = per_group.join(exact, on=group_cols)
    return out.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("__n_present")).cast("long").alias("n_zero_regs"),
        est.alias("est_distinct"),
        "exact_distinct",
        F.round(
            F.abs(est - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: int = 64,
    salt: str = "kmvset",
) -> DataFrame:
    """Pairwise distinct-set algebra between groups from MERGED bottom-k
    (KMV) sketches (Beyer et al., SIGMOD'07): for every group pair,
    estimate ``|A ∪ B|``, the Jaccard similarity, and ``|A ∩ B|``
    without ever joining the raw data across groups.

    Mechanism: each group keeps its k smallest value hashes (the same
    engine-portable md5 family as :func:`kmv_distinct`).  For a pair,
    the union sketch is the k smallest of the two sketches' union —
    computable from the SKETCHES alone (this is what makes KMV
    mergeable under set union).  With ``K = kth smallest`` of the
    merged sketch, ``est_union = (k-1) * 2^32 / K``; the fraction
    ``rho`` of merged-sketch hashes present in BOTH input sketches is
    an unbiased Jaccard estimate, and ``est_intersection = rho *
    est_union``.  When the merged sketch holds fewer than k hashes
    both input sketches were complete, so union/Jaccard are exact.

    Scale shape: one distinct + one bottom-k window per group (the
    :func:`kmv_distinct` plan), then ALL pair math happens on G
    k-length arrays (G = group count) — the pair stage is a broadcast
    self-join of G summary rows, independent of data volume.
    ``exact_union`` / ``exact_intersection`` (a raw pairwise join) are
    included for accuracy display at test SF; drop them at 100 TB.

    Output: ``(group_a, group_b, k, n_merged, est_union, est_jaccard,
    est_intersection, exact_union, exact_intersection)``.
    """
    hashed = df.select(
        F.col(group_col).alias("g"),
        _hash64(F.col(value_col), salt).alias("__h"),
    ).distinct()
    w = Window.partitionBy("g").orderBy("__h")
    sketches = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("__h")).alias("arr"))
    )
    a = sketches.select(
        F.col("g").alias("group_a"), F.col("arr").alias("__arr_a")
    )
    b = sketches.select(
        F.col("g").alias("group_b"), F.col("arr").alias("__arr_b")
    )
    pairs = a.join(
        F.broadcast(b), F.col("group_a") < F.col("group_b")
    )
    merged = F.slice(
        F.array_sort(F.array_union("__arr_a", "__arr_b")), 1, k
    )
    pairs = pairs.withColumn("__m", merged).withColumn(
        "__n_merged", F.size("__m")
    )
    in_both = F.size(
        F.array_intersect(
            F.array_intersect("__m", "__arr_a"), "__arr_b"
        )
    )
    # greatest(kth, 1): the k-th smallest hash is 0 only when a value
    # md5-hashes to exactly 0 (p = 2^-32 per distinct value) — rare but
    # a guaranteed ANSI division-by-zero crash at 100 TB scale.  The
    # oracle guards identically, so parity is unaffected.
    kth = F.greatest(F.element_at("__m", k), F.lit(1))
    complete = F.col("__n_merged") < k
    est_union = F.when(
        complete, F.col("__n_merged").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(float(_HASH_RANGE)) / kth, 6)
    )
    denom = F.when(complete, F.col("__n_merged")).otherwise(F.lit(k))
    est_jacc = F.round(in_both.cast("double") / denom, 6)

    exact_pairs = (
        hashed.select(F.col("g").alias("group_a"), "__h")
        .join(
            hashed.select(F.col("g").alias("group_b"), "__h"),
            on="__h",
        )
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").cast("long").alias("exact_intersection"))
    )
    sizes = hashed.groupBy("g").agg(F.count("*").cast("long").alias("n"))
    out = (
        pairs.join(exact_pairs, on=["group_a", "group_b"], how="left")
        .join(
            F.broadcast(
                sizes.select(
                    F.col("g").alias("group_a"), F.col("n").alias("__na")
                )
            ),
            on="group_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("g").alias("group_b"), F.col("n").alias("__nb")
                )
            ),
            on="group_b",
        )
        .withColumn(
            "exact_intersection",
            F.coalesce("exact_intersection", F.lit(0)).cast("long"),
        )
    )
    return out.select(
        "group_a",
        "group_b",
        F.lit(k).cast("long").alias("k"),
        F.col("__n_merged").cast("long").alias("n_merged"),
        est_union.alias("est_union"),
        est_jacc.alias("est_jaccard"),
        F.round(est_jacc * est_union, 6).alias("est_intersection"),
        (F.col("__na") + F.col("__nb") - F.col("exact_intersection"))
        .cast("long")
        .alias("exact_union"),
        "exact_intersection",
    )


def table_stats(
    df: DataFrame,
    canon: "dict[str, Column]",
    *,
    b: int = 6,
) -> DataFrame:
    """ANALYZE-style per-column table statistics — the inputs a
    cost-based optimizer needs to pick join orders and strategies:
    row count, null count/fraction, and NDV (distinct values) per
    column, with NDV estimated by the mergeable HyperLogLog registers
    of :func:`hll_distinct` so the scan stays one pass + bounded state
    per column at any scale.

    *canon* maps column name -> canonical STRING expression (the NDV
    hash input).  Canonicalization is what makes the profile engine-
    portable: doubles go through ``decimal(28,6)`` (identical
    rendering in Spark and DuckDB, unlike raw double-to-string),
    timestamps through dates, integers/strings verbatim.

    Shape: one explode stacks the columns into ``(column, value)``
    rows — a single scan feeding one (column, register) aggregation;
    state is m registers + 2 counters per column.  ``exact_distinct``
    / ``rel_err`` come from :func:`hll_distinct`'s accuracy-display
    join (drop at 100 TB).

    Output: ``column, n_rows, n_nulls, null_frac, m, n_zero_regs,
    est_distinct, exact_distinct, rel_err``.
    """
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("column"),
                        expr.cast("string").alias("v"),
                    )
                    for name, expr in canon.items()
                ]
            )
        ).alias("s")
    ).select("s.*")
    counts = stacked.groupBy("column").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("v").isNull().cast("long")).cast("long").alias(
            "n_nulls"
        ),
    )
    ndv = hll_distinct(
        stacked.where(F.col("v").isNotNull()), ["column"], "v", b=b
    )
    return counts.join(ndv, on="column").select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(
            F.col("n_nulls").cast("double") / F.col("n_rows"), 6
        ).alias("null_frac"),
        "m",
        "n_zero_regs",
        "est_distinct",
        "exact_distinct",
        "rel_err",
    )


# ----------------------------------- incremental aggregate maintenance


def partial_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    distinct_col: str,
    *,
    b: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Mergeable per-group partial-aggregate state: ``n``, a decimal
    ``sum`` (order-insensitive), ``vmin``/``vmax``, and the HLL
    register array for distinct-``distinct_col`` — every component an
    element of a commutative monoid, which is the whole trick of
    incremental view maintenance: yesterday's state plus today's delta
    merges in O(|keys|) with :func:`merge_profiles`, no re-scan of
    history.
    """
    m = 1 << b
    group_cols = list(group_cols)
    hexd = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(distinct_col).cast("string"))
    )
    w_hex = F.substring(hexd, 3, 8)
    w = F.conv(w_hex, 16, 10).cast("long")
    rank = F.when(w == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.conv(w_hex, 16, 2))
    )
    idx = F.conv(F.substring(hexd, 1, 2), 16, 10).cast("long") % m
    hashed = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        idx.alias("__idx"),
        rank.cast("int").alias("__rank"),
    )
    regs = (
        hashed.groupBy(*group_cols, "__idx")
        .agg(F.max("__rank").alias("__reg"))
        .groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct("__idx", "__reg"))
                )
            ).alias("__regmap")
        )
        .select(
            *group_cols,
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda i: F.coalesce(
                    F.element_at("__regmap", i.cast("long")), F.lit(0)
                ),
            ).alias("regs"),
        )
    )
    base = df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("vsum"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )
    return base.join(regs, on=group_cols)


def merge_profiles(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Merge two :func:`partial_profile` states: counts/sums add,
    min/max take least/greatest, HLL registers take pairwise max.
    Full outer join on the keys — O(|keys|), independent of the row
    volume either state summarizes."""
    group_cols = list(group_cols)
    an = a.select(
        *group_cols,
        *[F.col(c).alias(f"__a_{c}") for c in ("n", "vsum", "vmin", "vmax", "regs")],
    )
    bn = b.select(
        *group_cols,
        *[F.col(c).alias(f"__b_{c}") for c in ("n", "vsum", "vmin", "vmax", "regs")],
    )
    m = an.join(bn, on=group_cols, how="full")
    zero_regs = F.transform(
        F.sequence(F.lit(0), F.lit(63)), lambda _: F.lit(0)
    )
    return m.select(
        *group_cols,
        (
            F.coalesce("__a_n", F.lit(0)) + F.coalesce("__b_n", F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("__a_vsum"), F.lit(0).cast("decimal(28,6)"))
            + F.coalesce(F.col("__b_vsum"), F.lit(0).cast("decimal(28,6)"))
        ).cast("decimal(28,6)").alias("vsum"),
        F.least(
            F.coalesce("__a_vmin", "__b_vmin"),
            F.coalesce("__b_vmin", "__a_vmin"),
        ).alias("vmin"),
        F.greatest(
            F.coalesce("__a_vmax", "__b_vmax"),
            F.coalesce("__b_vmax", "__a_vmax"),
        ).alias("vmax"),
        F.zip_with(
            F.coalesce("__a_regs", zero_regs),
            F.coalesce("__b_regs", zero_regs),
            lambda x, y: F.greatest(x, y),
        ).alias("regs"),
    )


def profile_estimates(df: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Render a profile state (from :func:`partial_profile` /
    :func:`merge_profiles`) into reportable statistics — the raw HLL
    estimate uses the same libm-free harmonic sum as
    :func:`hll_distinct`."""
    group_cols = list(group_cols)
    m = 64
    alpha_m2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    exploded = df.select(
        *group_cols, "n", "vsum", "vmin", "vmax",
        F.posexplode("regs").alias("__i", "__r"),
    )
    per_group = exploded.groupBy(
        *group_cols, "n", "vsum", "vmin", "vmax"
    ).agg(
        F.sum(
            F.when(
                F.col("__r") > 0,
                F.expr("1.0 / shiftleft(cast(1 as bigint), __r)"),
            ).otherwise(F.lit(1.0))
        ).alias("__sum_inv"),
        F.sum((F.col("__r") == 0).cast("long")).alias("__nzero"),
    )
    return per_group.select(
        *group_cols,
        "n",
        F.round(F.col("vsum").cast("double"), 6).alias("total"),
        F.round(F.col("vmin"), 6).alias("vmin"),
        F.round(F.col("vmax"), 6).alias("vmax"),
        F.col("__nzero").cast("long").alias("n_zero_regs"),
        F.round(F.lit(alpha_m2) / F.col("__sum_inv"), 6).alias(
            "est_distinct"
        ),
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    *,
    n_buckets: int = 8,
) -> DataFrame:
    """Equi-depth (equi-height) histogram: bucket boundaries at the
    exact ``k/n`` quantiles, so every bucket holds ~the same row count
    — the histogram form CBOs prefer for skewed columns, where
    equi-width (:func:`group_histogram`) wastes resolution on empty
    ranges.  Companion to :func:`table_stats` (the two together are
    the classic ANALYZE output).

    Shape: ONE exact-percentile aggregate produces the boundary array
    (1 row, broadcast); bucket assignment is a fold over that literal-
    sized array inside the scan; one hash aggregation counts per
    bucket.  Exact percentiles buffer the column once (the x30
    trade-off); swap approx_percentile for the sketch path at extreme
    scale.  Quantile interpolation is the engine-paired
    ``percentile`` ↔ ``quantile_cont`` definition, so boundaries are
    bitwise identical and bucket assignment (strict ``>``) cannot
    disagree.

    Output: ``bucket, lo, hi, n_rows`` — lo/hi are the observed
    min/max inside the bucket (6 dp), n_rows the exact count.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.array(
            *[
                F.expr(f"percentile(`{value_col}`, {p!r})")
                for p in probs
            ]
        ).alias("__bounds")
    )
    with_b = df.where(F.col(value_col).isNotNull()).join(
        F.broadcast(bounds)
    )
    idx = F.aggregate(
        F.col("__bounds"),
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col(value_col) > b, F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        with_b.withColumn("bucket", idx.cast("long"))
        .groupBy("bucket")
        .agg(
            F.round(F.min(value_col), 6).alias("lo"),
            F.round(F.max(value_col), 6).alias("hi"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


def spearman_corr(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation: Pearson over mid-rank
    (tie-averaged) transforms — the robust, monotonicity-sensitive
    complement to :func:`corr_pairs`, immune to outliers and to any
    monotone rescaling of either column.

    Ranks are the classical average-of-ties: ``min_rank +
    (tie_count − 1)/2`` from a per-group ``rank()`` window plus a
    per-(group, value) tie count — both keyed by the group, so
    partitions are group-sized, never global (ranking inherently
    sorts each group; shard groups, not the ranking).  The rank pairs
    then flow through the exact decimal-moment Pearson (the
    ``corr_pairs`` idiom), so the coefficient is accumulation-order-
    insensitive and engine-reproducible.

    Returns ``(group_cols..., n, spearman)`` at 6 dp; null for
    constant columns.
    """
    group_cols = list(group_cols)
    both = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    base = df.where(both).select(
        *group_cols, F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    )

    def midrank(col: str, out: str) -> DataFrame:
        nonlocal base
        wr = Window.partitionBy(*group_cols).orderBy(col)
        ties = Window.partitionBy(*group_cols, col)
        base = base.withColumn(
            out,
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(ties).cast("double") - 1.0) / 2.0,
        )
        return base

    midrank("__x", "__rx")
    midrank("__y", "__ry")

    dec = "decimal(38,12)"
    m = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__rx").cast(dec)).alias("__sx"),
        F.sum(F.col("__ry").cast(dec)).alias("__sy"),
        F.sum((F.col("__rx") * F.col("__ry")).cast(dec)).alias("__sxy"),
        F.sum((F.col("__rx") * F.col("__rx")).cast(dec)).alias("__sxx"),
        F.sum((F.col("__ry") * F.col("__ry")).cast(dec)).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    num = sxy - sx * sy / n
    den = F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return m.select(
        *group_cols,
        "n",
        (F.round(F.try_divide(num, den), 6) + F.lit(0.0)).alias(
            "spearman"
        ),
    )


def chi_square_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V effect size — the standard audit for
    "is attribute A associated with attribute B" (e.g. is language
    independent of source in a crawl, a core stratification check
    before fixing a corpus mixture).

    The reference engine has no categorical-association surface; this
    is the distribution-drift companion for two-way tables (drift =
    one-way, :func:`distribution_drift`).

    Shape: one hash aggregation to the ``(row, col)`` contingency
    cells — the only pass over the data.  The grid is then COMPLETED
    (row margins × col margins within each group, left-joined back to
    the observed cells) because unobserved combinations still carry an
    ``E > 0`` expectation that the statistic must charge — a
    groupBy-only table silently drops them (scipy charges them too).
    Every post-scan step runs over ≤ |rows|×|cols| rows, never the
    fact table.  Each cell's ``(O−E)²/E`` term is a deterministic
    double expression; the cross-cell sum is decimal-cast
    (order-insensitive, the ``corr_pairs`` idiom) so the statistic is
    reproducible across partitionings and engines.  Nulls in either
    column are excluded (complete-case, scipy's crosstab convention).

    Output, one row per group: ``(*group_cols, n, n_rows, n_cols,
    dof, chi2, cramers_v)`` (6 dp).  Groups whose table is degenerate
    (a single row or column level — dof = 0) return null chi2/V.
    """
    group_cols = list(group_cols)
    cells = (
        df.where(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
        .groupBy(*group_cols, row_col, col_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
    )
    # cells feeds both margins AND the completed-grid join-back; the
    # "one pass over the data" claim holds only if the fact-table
    # aggregation is materialized once (6 fact scans without this)
    cells = cells.localCheckpoint(eager=True)
    rmarg = cells.groupBy(*group_cols, row_col).agg(
        F.sum("__o").alias("__rt")
    )
    cmarg = cells.groupBy(*group_cols, col_col).agg(
        F.sum("__o").alias("__ct")
    )
    grid = (
        rmarg.join(cmarg, on=group_cols) if group_cols
        else rmarg.crossJoin(cmarg)
    )
    full = grid.join(
        cells, on=[*group_cols, row_col, col_col], how="left"
    ).withColumn("__o", F.coalesce(F.col("__o"), F.lit(0)))
    wg = (
        Window.partitionBy(*group_cols) if group_cols
        else Window.partitionBy()
    )
    with_m = full.withColumn(
        "__n", F.sum(F.col("__o")).over(wg)
    )
    e = (
        F.col("__rt").cast("double")
        * F.col("__ct").cast("double")
        / F.col("__n").cast("double")
    )
    term = (
        (F.col("__o").cast("double") - e) * (F.col("__o").cast("double") - e)
        / e
    ).cast("decimal(38,12)")
    agg = with_m.groupBy(*group_cols).agg(
        F.max("__n").cast("long").alias("n"),
        F.countDistinct(F.col(row_col)).cast("long").alias("n_rows"),
        F.countDistinct(F.col(col_col)).cast("long").alias("n_cols"),
        F.sum(term).alias("__chi2"),
    )
    dof = (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
    chi2 = F.col("__chi2").cast("double")
    vmin = F.least(F.col("n_rows"), F.col("n_cols")) - 1
    v = F.sqrt(
        F.try_divide(chi2, F.col("n").cast("double") * vmin.cast("double"))
    )
    return agg.select(
        *group_cols,
        "n",
        "n_rows",
        "n_cols",
        dof.cast("long").alias("dof"),
        F.when(dof > 0, F.round(chi2, 6)).alias("chi2"),
        F.when(dof > 0, F.round(v, 6)).alias("cramers_v"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    n_bins: int = 20,
) -> DataFrame:
    """Cross-group quantile normalization (the microarray/batch-effect
    classic, Bolstad et al. 2003, at bin resolution): each value is
    replaced by the GLOBAL distribution's representative at its
    within-group quantile, so every group ends up with the same
    marginal distribution — the corpus-curation use is making
    per-source quality scores comparable before applying one global
    threshold (a fixed cutoff otherwise over-prunes sources whose
    scorer runs hot).

    Shape: one hash aggregation to per-(group, value) counts — the
    only pass over the data — then mid-rank quantiles
    ``q = (below + cnt/2)/n`` via a cumulative window over each
    group's DISTINCT values (the x146 AUC discipline: quantize
    continuous scores first so the support stays bounded).  The global
    quantile function is evaluated once as ``n_bins`` exact
    percentiles (one ``percentile(value, array(...))`` pass —
    identical interpolation to DuckDB's ``quantile_cont``) and
    broadcast back by bin index.  No full-table sort anywhere.

    Output: one row per distinct ``(group, value)``: ``(group, value,
    n, q, bin, norm_value)`` (q and norm_value 6 dp).
    """
    b = int(n_bins)
    if b < 2:
        raise ValueError("n_bins must be >= 2")
    per = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wcum = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    wg = Window.partitionBy(group_col)
    q = (
        (F.sum("n").over(wcum) - F.col("n")).cast("double")
        + F.col("n").cast("double") / 2.0
    ) / F.sum("n").over(wg).cast("double")
    binned = per.withColumn("__q", q).withColumn(
        "bin",
        F.least(F.floor(F.col("__q") * b), F.lit(b - 1)).cast("long"),
    )
    fracs = ", ".join(f"{(k + 0.5) / b!r}D" for k in range(b))
    reps = (
        df.where(F.col(value_col).isNotNull())
        .agg(
            F.expr(
                f"percentile({value_col}, array({fracs}))"
            ).alias("__reps")
        )
        .select(
            F.posexplode("__reps").alias("bin", "__rep")
        )
        .withColumn("bin", F.col("bin").cast("long"))
    )
    return binned.join(F.broadcast(reps), "bin").select(
        group_col,
        value_col,
        "n",
        F.round(F.col("__q"), 6).alias("q"),
        "bin",
        F.round(F.col("__rep"), 6).alias("norm_value"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947) between two
    treatment groups, one test per ``partition_cols`` stratum — the
    non-parametric complement to the t-test A/B operator
    (behavior.py:ab_test): robust to the heavy-tailed value
    distributions where mean comparisons mislead.

    Scale shape: rows collapse to ``(stratum, value) -> (cnt_a,
    cnt_b)`` FIRST (one shuffle), so the rank window runs over the
    distinct-value support per stratum, not the raw rows — the same
    bounded-support discipline as ``distribution_drift``.  Tied ranks
    use the midrank convention, carried as DOUBLED integer ranks
    (``2*prior + cnt + 1``) so every sum is exact integer arithmetic;
    the only float math is the final z/effect division from integer
    totals — engine-exact.

    Output per stratum: ``n_a``, ``n_b``, ``u_a`` (U statistic of
    group A, 1 dp of exactness guaranteed by construction), ``z``
    (normal approximation, no tie correction, 6 dp), ``effect``
    (common-language effect size U/(n_a*n_b), 6 dp).
    """
    parts = [F.col(c) for c in partition_cols]
    v = F.col(value_col)
    g = F.col(group_col)
    base = df.where(g.isin([group_a, group_b])).where(v.isNotNull())
    per_val = base.groupBy(*parts, v.alias("__v")).agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).cast("long").alias("__ca"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).cast("long").alias("__cb"),
    )
    w = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(
        "__v"
    )
    cnt = F.col("__ca") + F.col("__cb")
    prior = F.coalesce(
        F.sum(cnt).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    # doubled midrank: 2*avg_rank = 2*prior + cnt + 1 (exact integer)
    ranked = per_val.withColumn("__r2", 2 * prior + cnt + 1)
    agg = ranked.groupBy(*parts).agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum("__cb").cast("long").alias("n_b"),
        F.sum(F.col("__ca") * F.col("__r2")).cast("long").alias("__r2a"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    # U_A = R_A - nA(nA+1)/2, with R_A = __r2a / 2
    u_a = F.col("__r2a").cast("double") / 2.0 - na * (na + 1.0) / 2.0
    mu = na * nb / 2.0
    sigma = F.sqrt(na * nb * (na + nb + 1.0) / 12.0)
    return agg.select(
        *partition_cols,
        "n_a",
        "n_b",
        F.round(u_a, 1).alias("u_a"),
        F.round(F.try_divide(u_a - mu, sigma), 6).alias("z"),
        F.round(F.try_divide(u_a, na * nb), 6).alias("effect"),
    )


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    id_col: str,
    group_cols: Sequence[str] = (),
    max_rows: int = 20000,
) -> DataFrame:
    """Kendall tau-b rank correlation (Kendall 1938) per group — the
    concordance-based complement to Spearman (x119): robust to
    monotone transforms AND exact under heavy ties, at the price of a
    pairwise count.  tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)) with
    n0 = n(n-1)/2, n1/n2 = tied pairs in x/y.

    Scale shape: the O(n²) pair join is bounded per group by
    ``max_rows`` — groups larger than the cap keep the lowest
    *max_rows* ids (deterministic, documented truncation; at 100 TB
    run it on a stratified sample, the estimator converges at ~10⁴
    pairs).  All counts are integers, so tau is engine-exact.

    Output per group: ``n_rows, n_pairs, concordant, discordant,
    tau_b`` (6 dp; null when either tie term degenerates).
    """
    parts = [F.col(c) for c in group_cols]
    base = df.select(
        *parts,
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    rn = F.row_number().over(
        Window.partitionBy(*parts).orderBy("__id")
    )
    capped = (
        base.withColumn("__rn", rn)
        .where(F.col("__rn") <= int(max_rows))
        .drop("__rn")
    ).localCheckpoint(eager=True)
    a, b = capped.alias("a"), capped.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    for c in group_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    dx = F.col("a.__x") - F.col("b.__x")
    dy = F.col("a.__y") - F.col("b.__y")
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{c}").alias(c) for c in group_cols],
        F.when((dx * dy) > 0, 1).otherwise(0).alias("__c"),
        F.when((dx * dy) < 0, 1).otherwise(0).alias("__d"),
        F.when(dx == 0, 1).otherwise(0).alias("__tx"),
        F.when(dy == 0, 1).otherwise(0).alias("__ty"),
    )
    cnt = capped.groupBy(*parts).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    agg = pairs.groupBy(*parts).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("__c").cast("long").alias("concordant"),
        F.sum("__d").cast("long").alias("discordant"),
        F.sum("__tx").cast("long").alias("__n1"),
        F.sum("__ty").cast("long").alias("__n2"),
    )
    j = agg.join(cnt, list(group_cols)) if group_cols else agg.crossJoin(
        F.broadcast(cnt)
    )
    n0 = F.col("n_pairs").cast("double")
    tau = F.try_divide(
        (F.col("concordant") - F.col("discordant")).cast("double"),
        F.sqrt(n0 - F.col("__n1").cast("double"))
        * F.sqrt(n0 - F.col("__n2").cast("double")),
    )
    return j.select(
        *group_cols,
        "n_rows",
        "n_pairs",
        "concordant",
        "discordant",
        F.round(tau, 6).alias("tau_b"),
    )


def eb_shrink_rates(
    df: DataFrame,
    key_col: str,
    success_col,
    *,
    min_n: int = 5,
) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-key success
    rates (Robbins 1956; the method-of-moments prior of Morris 1983):
    small-sample keys get pulled toward the corpus prior, so a 2/3
    defect rate stops outranking a stable 400/1000 — the standard fix
    for rate leaderboards over heavy-tailed key frequencies.

    Prior: keys with ``n >= min_n`` give rate mean m and variance v;
    alpha + beta = m(1-m)/v - 1 (method of moments), shrunk rate =
    (x + alpha)/(n + alpha + beta).  Degenerate priors (v = 0 or
    v >= m(1-m)) yield null shrunk rates rather than a fabricated
    prior.

    Scale shape: one key aggregation, one 1-row prior aggregate
    broadcast back — two shuffles total, moment sums decimal-cast
    (order-insensitive).

    Output per key: ``n, x, raw_rate, alpha, beta, shrunk_rate``
    (6 dp).
    """
    s = success_col if not isinstance(success_col, str) else F.col(
        success_col
    )
    per = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(s, 1).otherwise(0)).cast("long").alias("x"),
    )
    rate = F.col("x").cast("double") / F.col("n").cast("double")
    rated = per.withColumn("__r", rate)
    dec = "decimal(38,18)"
    prior = rated.where(F.col("n") >= int(min_n)).agg(
        F.count(F.lit(1)).cast("long").alias("__k"),
        F.sum(F.col("__r").cast(dec)).alias("__sr"),
        F.sum((F.col("__r") * F.col("__r")).cast(dec)).alias("__srr"),
    )
    kk = F.col("__k").cast("double")
    m = F.col("__sr").cast("double") / kk
    v = F.col("__srr").cast("double") / kk - m * m
    ab = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    prior = prior.select(
        F.when((v > 0) & (ab > 0), m * ab).alias("__alpha"),
        F.when((v > 0) & (ab > 0), (F.lit(1.0) - m) * ab).alias(
            "__beta"
        ),
    )
    j = rated.crossJoin(F.broadcast(prior))
    shrunk = (F.col("x").cast("double") + F.col("__alpha")) / (
        F.col("n").cast("double") + F.col("__alpha") + F.col("__beta")
    )
    return j.select(
        F.col(key_col),
        "n",
        "x",
        F.round(F.col("__r"), 6).alias("raw_rate"),
        F.round(F.col("__alpha"), 6).alias("alpha"),
        F.round(F.col("__beta"), 6).alias("beta"),
        F.round(shrunk, 6).alias("shrunk_rate"),
    )


def hll_merge_rollup(
    df: DataFrame,
    fine_col: str,
    coarse_col: str,
    value_col: str,
    *,
    b: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """HLL register rollup across time grains — the DAU→WAU/MAU
    pattern: build per-*fine* (e.g. daily) HyperLogLog registers once,
    then MERGE them by pairwise register max into each *coarse* (e.g.
    weekly) estimate, and prove the merge lossless by computing the
    coarse registers directly from the raw rows too.  At 100 TB this
    is why sketches beat count-distinct: yesterday's registers never
    need the raw rows again, yet every coarser rollup is exact-as-if-
    direct (max is associative/commutative/idempotent).

    Register/hash/estimate math is byte-identical to
    :func:`hll_distinct` (md5 first-byte register, 33−bit_length rank,
    exact power-of-two inverse sums) so the oracle reproduces every
    register.

    Scale shape: one shuffle to (fine, register) with map-side max,
    a (coarse, register) re-max — |fine grains|·m rows, trivial — and
    the verification path's own (coarse, register) agg; the exact
    count-distinct column is test-SF display only, drop it at scale.

    Output: ``(coarse, n_fine_units, m, est_merged, est_direct,
    merge_consistent, exact_distinct)`` — *merge_consistent* must be
    true everywhere; a false is a broken merge, not noise.
    """
    m = 1 << b

    idx, rank = hll_register_cols(value_col, b=b, salt=salt)
    hashed = df.select(
        F.col(fine_col).alias("fine"),
        F.col(coarse_col).alias("coarse"),
        idx.alias("__idx"),
        rank.cast("int").alias("__rank"),
        F.col(value_col).alias("__v"),
    )
    hashed = hashed.localCheckpoint(eager=True)

    def estimate(regs: DataFrame, label: str) -> DataFrame:
        est = hll_estimate_from_registers(regs, ["coarse"], b=b)
        return est.select("coarse", F.col("est_distinct").alias(label))

    fine_regs = hashed.groupBy("fine", "coarse", "__idx").agg(
        F.max("__rank").alias("__reg")
    )
    merged = fine_regs.groupBy("coarse", "__idx").agg(
        F.max("__reg").alias("__reg")
    )
    direct = hashed.groupBy("coarse", "__idx").agg(
        F.max("__rank").alias("__reg")
    )
    est_m = estimate(merged, "est_merged")
    est_d = estimate(direct, "est_direct")
    meta = hashed.groupBy("coarse").agg(
        F.countDistinct("fine").cast("long").alias("n_fine_units"),
        F.countDistinct("__v").cast("long").alias("exact_distinct"),
    )
    return (
        meta.join(est_m, on="coarse")
        .join(est_d, on="coarse")
        .select(
            "coarse",
            "n_fine_units",
            F.lit(m).cast("long").alias("m"),
            "est_merged",
            "est_direct",
            (F.col("est_merged") == F.col("est_direct")).alias(
                "merge_consistent"
            ),
            "exact_distinct",
        )
    )


#: cumulative Poisson(1) pmf — deterministic-bootstrap weight cutoffs
_POIS1_CDF = (
    0.36787944117144233,  # k = 0
    0.7357588823428847,   # k = 1
    0.9196986029286058,   # k = 2
    0.9810118431238462,   # k = 3
    0.9963401531726563,   # k = 4
    0.9994058151824183,   # k = 5
)


def bootstrap_se(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: Sequence[str] = (),
    *,
    n_boot: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """Deterministic Poisson-bootstrap standard error of a per-group
    mean (the Chamandy et al. 2012 "Estimating Uncertainty for
    Massive Data Streams" construction): each (replicate, row) draws a
    Poisson(1)-distributed resample weight by inverting the Poisson
    CDF at ``uniform_hash01(b ':' id)`` — fully deterministic, so both
    engines build the SAME *n_boot* resamples, embarrassingly parallel
    (no shared RNG state, the property that makes bootstrap feasible
    on a cluster at all), and weights beyond k = 6 are truncated
    (mass 6×10⁻⁵).

    SE = sample std-dev of the replicate means; the normal-theory
    95% interval ``mean ± 1.96·SE`` is attached for dashboard use.

    Engine-exactness: resample weights are exact integers from literal
    CDF cutoffs; weighted sums are decimal-cast; replicate means and
    the moment-based SE are one double composition over decimal-exact
    sums (σ via ``sqrt`` only — IEEE-exact).

    Scale shape: the ×*n_boot* expansion is a row-local explode (no
    shuffle); one (group, replicate) hash agg, one group-level
    combine over *n_boot* rows per group, one broadcast-sized join
    with the point estimate.

    Output: ``(*group_cols, n, mean, boot_se, ci_lo, ci_hi)`` (6 dp).
    """
    from .mixing import uniform_hash01

    g = list(group_cols)
    # null values carry no information but would still draw resample
    # weights — inflating denominators and fabricating replicate
    # variance — so they are excluded up front
    df = df.where(F.col(value_col).isNotNull())
    # (25,12): the (25,12)×(4,0) weight product is (30,12) in Spark
    # and (29,12) in DuckDB — exact in both; a (38,12) operand would
    # overflow DuckDB's width-additive multiply
    xdec = F.col(value_col).cast("decimal(25,12)")
    point = df.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.try_divide(
                F.sum(xdec).cast("double"),
                F.count(F.lit(1)).cast("double"),
            ),
            6,
        ).alias("mean"),
    )
    rep = df.select(
        *g,
        F.col(id_col).alias("__id"),
        xdec.alias("__x"),
        F.explode(F.sequence(F.lit(0), F.lit(int(n_boot) - 1))).alias("__b"),
    )
    u = uniform_hash01(
        F.concat_ws(":", F.col("__b").cast("string"), F.col("__id").cast("string")),
        salt,
    )
    wexpr = F.lit(len(_POIS1_CDF)).cast("int")
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        wexpr = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(wexpr)
    weighted = rep.withColumn("__w", wexpr.cast("long")).where(
        F.col("__w") > 0
    )
    rep_means = weighted.groupBy(*g, "__b").agg(
        F.try_divide(
            F.sum(
                F.col("__x") * F.col("__w").cast("decimal(4,0)")
            ).cast("double"),
            F.sum("__w").cast("double"),
        ).alias("__rm")
    )
    # (20,8)×(15,8) → (35,16): inside precision 38 in BOTH engines so
    # the product is exact, and the width-20 operand forces DuckDB
    # onto its int128 multiply path ((15,8)² overflows its int64
    # fast path); (38,18)² would trip precision-loss rounding
    rmd = F.col("__rm").cast("decimal(15,8)")
    rmd_w = F.col("__rm").cast("decimal(20,8)")
    moments = rep_means.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__nb"),
        F.sum(rmd).alias("__s1"),
        F.sum(rmd_w * rmd).alias("__s2"),
    )
    nb = F.col("__nb").cast("double")
    mu_b = F.col("__s1").cast("double") / nb
    var_pop = F.col("__s2").cast("double") / nb - mu_b * mu_b
    se = F.when(
        (F.col("__nb") > 1) & (var_pop > 0),
        F.sqrt(var_pop * nb / (nb - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    stats = moments.select(*g, F.round(se, 6).alias("boot_se"))
    out = point.join(stats, on=g or None) if g else point.crossJoin(
        F.broadcast(stats)
    )
    return out.select(
        *g,
        "n",
        "mean",
        "boot_se",
        F.round(F.col("mean") - F.lit(1.96) * F.col("boot_se"), 6).alias(
            "ci_lo"
        ),
        F.round(F.col("mean") + F.lit(1.96) * F.col("boot_se"), 6).alias(
            "ci_hi"
        ),
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: Sequence[str], *, b: int = 6
) -> DataFrame:
    """Finalize HLL registers — ``(*group_cols, __idx, __reg)`` rows
    from :func:`hll_distinct`'s internals, :func:`hll_merge_rollup`,
    or the streaming twin (``streaming.core.streaming_hll_registers``)
    — into per-group raw estimates: ``(*group_cols, m, n_zero_regs,
    est_distinct)``.  Identical estimate math to :func:`hll_distinct`
    (exact power-of-two inverse sums, no libm), so batch, merged, and
    streamed register sets all finalize to the same number.
    """
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    g = list(group_cols)
    per = regs.groupBy(*g).agg(
        F.count("*").cast("long").alias("__np"),
        F.sum(
            F.expr("1.0 / shiftleft(cast(1 as bigint), __reg)")
        ).alias("__sp"),
    )
    sum_inv = F.col("__sp") + (F.lit(m) - F.col("__np")).cast("double")
    return per.select(
        *g,
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("__np")).cast("long").alias("n_zero_regs"),
        F.round(F.lit(alpha * m * m) / sum_inv, 6).alias("est_distinct"),
    )


def wasserstein1(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between two
    empirical distributions, per group: ``W₁ = ∫ |F_a − F_b| dx``
    summed over the gaps of the pooled distinct support.  The drift
    metric that, unlike PSI/JS (bin-share based) and KS (sup-norm),
    weighs HOW FAR mass moved — a corpus whose length distribution
    shifted by 5 tokens scores 5× one that shifted by 1, where KS can
    score them identically.

    Engine-exactness: ECDF steps are exact integer cumulative counts
    over the support order; each term is ``|ca/na − cb/nb| · gap``
    composed identically and decimal-cast before the final sum.

    Scale shape: rows collapse to ``(group, value) → (cnt_a, cnt_b)``
    first, so the cumulative window runs over the per-group DISTINCT
    support — the same bounded-support discipline as
    ``mann_whitney_u``/``ks_statistic``; for continuous columns with
    corpus-scale support, quantize (round/bin) the value first — the
    6-dp-rounded support is bounded by construction.

    Output: ``(*group_cols, n_a, n_b, w1)`` (6 dp).
    """
    g = list(group_cols)
    tagged = df_a.select(
        *g, F.lit(1).alias("__a"), F.lit(0).alias("__b"),
        F.col(value_col).alias("__v"),
    ).unionByName(
        df_b.select(
            *g, F.lit(0).alias("__a"), F.lit(1).alias("__b"),
            F.col(value_col).alias("__v"),
        )
    ).where(F.col("__v").isNotNull())
    per_val = tagged.groupBy(*g, "__v").agg(
        F.sum("__a").cast("long").alias("__ca"),
        F.sum("__b").cast("long").alias("__cb"),
    )
    w = (
        Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    ).orderBy("__v")
    cum_a = F.sum("__ca").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_b = F.sum("__cb").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = F.lead("__v").over(w)
    tot = (
        Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    )
    na = F.sum("__ca").over(tot)
    nb = F.sum("__cb").over(tot)
    term = (
        F.abs(
            cum_a.cast("double") / na.cast("double")
            - cum_b.cast("double") / nb.cast("double")
        )
        * (nxt.cast("double") - F.col("__v").cast("double"))
    ).cast("decimal(38,12)")
    stepped = per_val.select(
        *g,
        na.alias("__na"),
        nb.alias("__nb"),
        F.when(nxt.isNotNull(), term).alias("__t"),
    )
    agg = stepped.groupBy(*g).agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.sum("__t").alias("__w1"),
    )
    # a group present on only one side has no defined distance — the
    # NaN ECDF terms must surface as null, never be coalesced to
    # "zero drift"
    w1 = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.round(F.coalesce(F.col("__w1"), F.lit(0)).cast("double"), 6),
    )
    return agg.select(*g, "n_a", "n_b", w1.alias("w1"))


def quantile_treatment_effects(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    partition_cols: Sequence[str] = (),
    *,
    probs: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Quantile treatment effects (Doksum 1974): per stratum and
    probability p, ``QTE(p) = Q_b(p) − Q_a(p)`` — WHERE in the
    distribution the treatment moved mass.  The distributional
    companion to the mean/rank tests (x66/x159): a treatment that
    only lifts the tail shows QTE ≈ 0 at the median and large at
    p = 0.9, which a t-test averages away and MWU only flags as
    "different".

    Built on :func:`group_quantiles` (exact interpolated quantiles —
    same definition as DuckDB ``quantile_cont``); effects are
    differences of the 6-dp-rounded quantiles, deterministic by
    construction.

    Scale shape: two per-(stratum, arm) quantile aggregations, one
    stratum-keyed join, a row-local stack to long form — |strata|·|p|
    output rows.

    Output: ``(*partition_cols, p, n_a, n_b, q_a, q_b, qte)``.
    """
    parts = list(partition_cols)
    base = df.where(F.col(group_col).isin([group_a, group_b]))
    qa = group_quantiles(
        base.where(F.col(group_col) == group_a), parts, value_col, probs
    )
    qb = group_quantiles(
        base.where(F.col(group_col) == group_b), parts, value_col, probs
    )

    def pcol(p: float) -> str:
        return "p" + str(p * 100).rstrip("0").rstrip(".").replace(".", "_")

    qa = qa.select(
        *parts, F.col("n").alias("n_a"),
        *[F.col(pcol(p)).alias(f"__a{i}") for i, p in enumerate(probs)],
    )
    qb = qb.select(
        *parts, F.col("n").alias("n_b"),
        *[F.col(pcol(p)).alias(f"__b{i}") for i, p in enumerate(probs)],
    )
    j = qa.join(qb, on=parts or None) if parts else qa.crossJoin(qb)
    stack_args = []
    for i, p in enumerate(probs):
        stack_args += [
            F.lit(float(p)), F.col(f"__a{i}"), F.col(f"__b{i}"),
        ]
    long = j.select(
        *parts, "n_a", "n_b",
        F.stack(F.lit(len(probs)), *stack_args).alias("p", "q_a", "q_b"),
    )
    return long.select(
        *parts,
        "p",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "q_a",
        "q_b",
        F.round(F.col("q_b") - F.col("q_a"), 6).alias("qte"),
    )


def partial_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """First-order partial correlation per group: the x–y association
    with the confounder z held fixed, ``r_xy·z = (r_xy − r_xz·r_yz) /
    √((1−r_xz²)(1−r_yz²))`` — the difference between "wealth
    correlates with spend" and "wealth correlates with spend beyond
    what order volume already explains"; the confounder check run
    before any correlation is reported as signal.

    Rows are LISTWISE-complete (all three columns non-null) — partial
    correlation is undefined on pairwise-complete moments.

    Engine-exactness: the 9 power sums use the ``corr_pairs`` decimal
    idiom (values quantized at (28,6) identically in both engines,
    sums exact); the three r's and the partial composition are one
    double expression mirrored in the oracle.

    Scale shape: ONE hash aggregation (map-side combinable) per
    group — same cost as a single correlation.

    Output: ``(*group_cols, n, r_xy, r_xz, r_yz, r_xy_given_z)``
    (6 dp; null when any marginal correlation is degenerate).
    """
    g = list(group_cols)
    dec = "decimal(28,6)"
    base = df.where(
        F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(z_col).isNotNull()
    )
    cx, cy, cz = F.col(x_col), F.col(y_col), F.col(z_col)
    m = base.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(cx.cast(dec)).alias("__sx"),
        F.sum(cy.cast(dec)).alias("__sy"),
        F.sum(cz.cast(dec)).alias("__sz"),
        F.sum((cx * cy).cast(dec)).alias("__sxy"),
        F.sum((cx * cz).cast(dec)).alias("__sxz"),
        F.sum((cy * cz).cast(dec)).alias("__syz"),
        F.sum((cx * cx).cast(dec)).alias("__sxx"),
        F.sum((cy * cy).cast(dec)).alias("__syy"),
        F.sum((cz * cz).cast(dec)).alias("__szz"),
    )
    n = F.col("__n").cast("double")

    def mom(name: str):
        return F.col(f"__{name}").cast("double")

    def corr(sab, sa, sb, saa, sbb):
        return F.try_divide(
            n * sab - sa * sb,
            F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
        )

    r_xy = corr(mom("sxy"), mom("sx"), mom("sy"), mom("sxx"), mom("syy"))
    r_xz = corr(mom("sxz"), mom("sx"), mom("sz"), mom("sxx"), mom("szz"))
    r_yz = corr(mom("syz"), mom("sy"), mom("sz"), mom("syy"), mom("szz"))
    partial = F.try_divide(
        r_xy - r_xz * r_yz,
        F.sqrt(
            (F.lit(1.0) - r_xz * r_xz) * (F.lit(1.0) - r_yz * r_yz)
        ),
    )
    return m.select(
        *g,
        F.col("__n").cast("long").alias("n"),
        F.round(r_xy, 6).alias("r_xy"),
        F.round(r_xz, 6).alias("r_xz"),
        F.round(r_yz, 6).alias("r_yz"),
        F.round(partial, 6).alias("r_xy_given_z"),
    )


def weight_diagnostics(
    df: DataFrame,
    weight_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Survey-weight health report per group (Kish 1965): effective
    sample size ``ESS = (Σw)²/Σw²``, design effect ``deff = n/ESS``,
    and the weight coefficient of variation — read IMMEDIATELY after
    raking (x199): weights that fixed the marginals at deff = 3 have
    silently cut the split's statistical power to a third, which is
    usually a worse problem than the drift was.

    Engine-exactness: Σw and Σw² use the exact (20,8)×(15,8) decimal
    product (the x192 width rule); the ratios are one double
    composition.  Null or non-positive weights are excluded (a
    negative weight is an upstream bug, not a design choice).

    Scale shape: one map-side-combinable hash aggregation.

    Output: ``(*group_cols, n, sum_w, ess, deff, cv_w)`` (6 dp).
    """
    g = list(group_cols)
    base = df.where(F.col(weight_col) > 0)
    wn = F.col(weight_col).cast("decimal(15,8)")
    ww = F.col(weight_col).cast("decimal(20,8)")
    m = base.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(wn).alias("__s1"),
        F.sum(ww * wn).alias("__s2"),
    )
    n = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    ess = F.try_divide(s1 * s1, s2)
    mu = s1 / n
    var = s2 / n - mu * mu
    cv = F.when(var > 0, F.sqrt(var) / mu).otherwise(F.lit(0.0))
    return m.select(
        *g,
        F.col("__n").cast("long").alias("n"),
        F.round(s1, 6).alias("sum_w"),
        F.round(ess, 6).alias("ess"),
        F.round(F.try_divide(n, ess), 6).alias("deff"),
        F.round(cv, 6).alias("cv_w"),
    )


def theil_decomposition(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Theil T inequality index with its exact within/between
    decomposition (Theil 1967) — the property Gini lacks: total
    inequality splits ADDITIVELY into within-group and between-group
    parts, answering "is doc-length (or cost, or token-budget)
    inequality driven by differences AMONG sources or WITHIN them?"

    ``T = Σ yᵢ·ln(yᵢ/μ) / Y`` computed per group and pooled;
    ``T_total = Σ_g s_g·T_g + Σ_g s_g·ln(μ_g/μ)`` with ``s_g`` the
    group's value share.  Only positive values enter (ln).

    Engine-exactness: the only data-scale sums are N, Y = Σy and
    Σ y·ln y per group (y·ln y decimal-cast — accumulation-order
    free); every T and share is then one double composition over
    those sums; group-level combines are decimal-cast again.

    Scale shape: one group-keyed hash agg over the rows, a 1-row
    broadcast global, |groups| output rows.

    Output: one row per group: ``(group, n, total, mean, share,
    theil_within_g, between_term, theil_total, theil_within,
    theil_between)`` — the three totals repeated per row (6 dp).
    """
    base = df.where(F.col(value_col) > 0).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("__y"),
    )
    ylny = (F.col("__y") * F.log(F.col("__y"))).cast("decimal(38,18)")
    per = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__y").cast("decimal(25,12)")).alias("__Y"),
        F.sum(ylny).alias("__sylny"),
    )
    # __ntot/__ytot, NOT __N/__Y: Spark resolution is case-insensitive
    tot = per.agg(
        F.sum("__n").alias("__ntot"),
        F.sum("__Y").alias("__ytot"),
    )
    j = per.crossJoin(F.broadcast(tot))
    yg = F.col("__Y").cast("double")
    ng = F.col("__n").cast("double")
    yt = F.col("__ytot").cast("double")
    nt = F.col("__ntot").cast("double")
    mu_g = yg / ng
    mu = yt / nt
    t_g = F.col("__sylny").cast("double") / yg - F.log(mu_g)
    share = yg / yt
    between_term = share * F.log(mu_g / mu)
    out = j.select(
        F.col("grp").alias(group_col),
        F.col("__n").cast("long").alias("n"),
        F.round(yg, 6).alias("total"),
        F.round(mu_g, 6).alias("mean"),
        F.round(share, 6).alias("share"),
        F.round(t_g, 6).alias("theil_within_g"),
        F.round(between_term, 6).alias("between_term"),
        (share * t_g).cast("decimal(38,18)").alias("__wterm"),
        between_term.cast("decimal(38,18)").alias("__bterm"),
    )
    wsum = Window.partitionBy(F.lit(1))
    return out.select(
        group_col,
        "n",
        "total",
        "mean",
        "share",
        "theil_within_g",
        "between_term",
        F.round(
            (F.sum("__wterm").over(wsum) + F.sum("__bterm").over(wsum))
            .cast("double"),
            6,
        ).alias("theil_total"),
        F.round(F.sum("__wterm").over(wsum).cast("double"), 6).alias(
            "theil_within"
        ),
        F.round(F.sum("__bterm").over(wsum).cast("double"), 6).alias(
            "theil_between"
        ),
    )


def dispersion_index(
    df: DataFrame,
    count_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Count-dispersion audit per group: variance-to-mean ratio (the
    index of dispersion — 1 for Poisson counts) and the
    method-of-moments negative-binomial overdispersion
    ``alpha = (σ² − μ)/μ²`` — the check run on per-bucket event/error
    counts before any Poisson-assuming alert threshold or sample-size
    formula is trusted (real traffic is almost always VMR >> 1).

    Engine-exactness: counts are integers, so Σc and Σc² are exact
    decimal sums ((19,0)² product — the burstiness width rule); VMR
    and alpha are one double composition.

    Scale shape: one map-side-combinable hash aggregation.

    Output: ``(*group_cols, n_buckets, mean_count, vmr, nb_alpha,
    overdispersed)`` (6 dp; alpha clamped at 0).
    """
    g = list(group_cols)
    cd = F.col(count_col).cast("decimal(19,0)")
    m = df.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(cd).alias("__s1"),
        F.sum(cd * cd).alias("__s2"),
    )
    n = F.col("__n").cast("double")
    mu = F.col("__s1").cast("double") / n
    var = F.col("__s2").cast("double") / n - mu * mu
    vmr = F.try_divide(var, mu)
    alpha = F.greatest(F.lit(0.0), F.try_divide(var - mu, mu * mu))
    return m.select(
        *g,
        F.col("__n").cast("long").alias("n_buckets"),
        F.round(mu, 6).alias("mean_count"),
        F.round(vmr, 6).alias("vmr"),
        F.round(alpha, 6).alias("nb_alpha"),
        (vmr > F.lit(1.0)).alias("overdispersed"),
    )


def drift_dashboard(
    df_a: DataFrame,
    df_b: DataFrame,
    group_col: str,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Multi-dimension drift dashboard: PSI, binned KS distance, and
    binned Wasserstein-1 between a reference sample and a fresh batch,
    computed per *group_col* value AND for the ``__all__`` roll-up —
    the one-query drift panel (distribution_drift x58, ks_statistic
    x64, wasserstein x193 give the same numbers one metric and one
    slice at a time; monitoring wants every slice × every metric in a
    single pass).

    All three metrics come from the SAME shared-equi-width-bin
    histogram (clamped to [*lo*, *hi*), bin rule identical to
    group_histogram): PSI with *epsilon*-floored shares, KS as the
    max |ECDF_a − ECDF_b| over bin boundaries, W1 as
    Σ |ECDF_a − ECDF_b| · bin_width (the right-Riemann ECDF-gap
    integral).  Binned KS/W1 are the scale-path variants — exact up
    to bin resolution, one bounded aggregation instead of a global
    sort over the distinct support.

    Scale shape: ONE hash aggregation over the tagged union bounded
    by |dims| × 2 × *bins* rows; the roll-up, spine completion,
    cumulative windows, and metric reduces all run on that bounded
    table.  No global windows, no joins on raw rows.

    Engine exactness: bin counts are integral; cumulative sums run
    over integers ordered by bin; the PSI/W1 term sums are
    decimal(38,18)-cast so the ≤|bins|-term float additions cannot
    reorder; KS is a max (order-free).

    Output: ``(dimension, n_a, n_b, psi, ks, w1)`` — one row per
    group value plus ``__all__``, 6 dp.
    """
    if bins < 1:
        raise ValueError("bins must be positive")
    if not hi > lo:
        raise ValueError("hi must exceed lo")
    width = (float(hi) - float(lo)) / bins
    tagged = df_a.select(
        F.lit(0).alias("__side"),
        F.col(group_col).cast("string").alias("__dim"),
        F.col(value_col).cast("double").alias("__v"),
    ).unionByName(
        df_b.select(
            F.lit(1).alias("__side"),
            F.col(group_col).cast("string").alias("__dim"),
            F.col(value_col).cast("double").alias("__v"),
        )
    ).where(F.col("__v").isNotNull() & F.col("__dim").isNotNull())
    raw = F.floor((F.col("__v") - F.lit(float(lo))) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("long")
    per = tagged.groupBy(F.col("__dim"), F.col("__side"), b.alias("__bin")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    allup = per.groupBy("__side", "__bin").agg(F.sum("__n").alias("__n"))
    counts = per.unionByName(
        allup.select(F.lit("__all__").alias("__dim"), "__side", "__bin", "__n")
    )
    dims = counts.select("__dim").distinct()
    spine = dims.crossJoin(
        F.broadcast(
            counts.sparkSession.range(bins).select(
                F.col("id").cast("long").alias("__bin")
            )
        )
    )
    grid = (
        spine.join(
            counts.groupBy("__dim", "__bin").agg(
                F.coalesce(
                    F.sum(F.when(F.col("__side") == 0, F.col("__n"))), F.lit(0)
                ).alias("n_a"),
                F.coalesce(
                    F.sum(F.when(F.col("__side") == 1, F.col("__n"))), F.lit(0)
                ).alias("n_b"),
            ),
            on=["__dim", "__bin"],
            how="left",
        )
        .withColumn("n_a", F.coalesce(F.col("n_a"), F.lit(0)))
        .withColumn("n_b", F.coalesce(F.col("n_b"), F.lit(0)))
    )
    wdim = Window.partitionBy("__dim")
    wcum = wdim.orderBy("__bin").rowsBetween(Window.unboundedPreceding, 0)
    eps = F.lit(float(epsilon))
    g = (
        grid.withColumn("__ta", F.sum("n_a").over(wdim))
        .withColumn("__tb", F.sum("n_b").over(wdim))
        .withColumn("__ca", F.sum("n_a").over(wcum))
        .withColumn("__cb", F.sum("n_b").over(wcum))
    )
    pa = F.greatest(F.col("n_a") / F.col("__ta"), eps)
    pb = F.greatest(F.col("n_b") / F.col("__tb"), eps)
    gap = F.abs(
        F.col("__ca") / F.col("__ta") - F.col("__cb") / F.col("__tb")
    )
    terms = g.select(
        "__dim",
        "__ta",
        "__tb",
        ((pa - pb) * F.log(pa / pb)).cast("decimal(38,18)").alias("__psi_t"),
        gap.alias("__gap"),
        (gap * F.lit(width)).cast("decimal(38,18)").alias("__w1_t"),
    )
    return (
        terms.groupBy(F.col("__dim").alias("dimension"))
        .agg(
            F.max("__ta").cast("long").alias("n_a"),
            F.max("__tb").cast("long").alias("n_b"),
            F.round(F.sum("__psi_t").cast("double"), 6).alias("psi"),
            F.round(F.max("__gap"), 6).alias("ks"),
            F.round(F.sum("__w1_t").cast("double"), 6).alias("w1"),
        )
    )


def chi_square_test(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, with Cramér's V effect size and a Wilson–Hilferty normal
    approximation p-value — the p-value-carrying single-table variant
    of :func:`chi_square_independence` (which is group-capable but
    reports no p; distinct names keep both callable — a same-name
    redefinition here once shadowed the grouped one and silently broke
    its registered query's schema).

    Mechanics: contingency counts, expected ``e = row·col/N``,
    ``χ² = Σ (o−e)²/e`` over the COMPLETE r×c grid (zero-observed
    cells contribute their expected mass — dropping them understates
    χ²), ``V = sqrt(χ²/(N·min(r−1, c−1)))``.  The p-value uses the
    Wilson–Hilferty cube-root normalization
    ``z = ((χ²/ν)^⅓ − (1 − 2/9ν)) / sqrt(2/9ν)`` with the cube root
    as ``exp(ln(x)/3)`` (pow is not engine-portable) and the shared
    A&S normal tail (quality.normal_sf) — accurate to ~1e-3 in p for
    ν ≥ 1, far inside any decision threshold.

    Scale shape: ONE hash aggregation over the raw rows bounded by
    r×c cells; grid completion, marginals, and the final reduce run
    on those bounded rows (broadcast 1-row totals, decimal-cast term
    sums — order-insensitive).

    Output: one row ``(n, r, c, dof, chi2, cramers_v, p_value)``.
    """
    from .quality import normal_sf

    joint = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(
            F.col(col_a).cast("string").alias("__a"),
            F.col(col_b).cast("string").alias("__b"),
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    grid = (
        joint.select("__a")
        .distinct()
        .crossJoin(F.broadcast(joint.select("__b").distinct()))
        .join(joint, on=["__a", "__b"], how="left")
        .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
    )
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    tot = grid.agg(
        F.sum("__n").cast("long").alias("__tot"),
        F.count_distinct(F.col("__a")).alias("__nr"),
        F.count_distinct(F.col("__b")).alias("__nc"),
    )
    cells = (
        grid.withColumn("__ra", F.sum("__n").over(wa))
        .withColumn("__cb", F.sum("__n").over(wb))
        .crossJoin(F.broadcast(tot))
    )
    e = (
        F.col("__ra").cast("double")
        * F.col("__cb").cast("double")
        / F.col("__tot").cast("double")
    )
    term = F.try_divide(
        (F.col("__n").cast("double") - e) * (F.col("__n").cast("double") - e),
        e,
    )
    agg = cells.groupBy().agg(
        F.max("__tot").alias("n"),
        F.max("__nr").alias("r"),
        F.max("__nc").alias("c"),
        F.sum(term.cast("decimal(38,18)")).cast("double").alias("__chi2"),
    )
    dof = ((F.col("r") - 1) * (F.col("c") - 1)).cast("double")
    chi2 = F.col("__chi2")
    v = F.sqrt(
        chi2
        / (
            F.col("n").cast("double")
            * F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
        )
    )
    wh_z = (
        F.exp(F.log(chi2 / dof) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dof))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof))
    p = F.when(chi2 <= 0, F.lit(1.0)).otherwise(normal_sf(wh_z))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("r"),
        F.col("c").cast("long").alias("c"),
        dof.cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
        F.round(p, 6).alias("p_value"),
    )


def oneway_anova(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-way ANOVA over an integer-valued measure: F statistic and
    eta² effect size for "does the group mean differ across k groups"
    — the k-group generalization the two-sample screens (SMD x197,
    Mann-Whitney) can't answer in one pass.

    Sums of squares from per-group exact decimal moments (the
    dispersion_index (19,0)² idiom): ``SSW = Σ_g (S2_g − S1_g²/n_g)``,
    ``SSB = Σ_g S1_g²/n_g − S1²/N``, ``SST = S2 − S1²/N``;
    ``F = (SSB/(k−1)) / (SSW/(N−k))``, ``η² = SSB/SST``.  The
    per-group double terms are decimal(38,18)-cast before the final
    k-term sum, so group accumulation order cannot shift the output.
    No p-value: the F tail needs the incomplete beta, which neither
    engine exposes and no 6-dp-stable polynomial covers across (df1,
    df2) — gate on F against a looked-up critical value instead.

    Scale shape: one keyed hash agg (k rows) + one k-row reduce.

    Output: one row ``(k, n, ss_between, ss_within, df1, df2, f_stat,
    eta_sq)``.
    """
    cd = F.col(value_col).cast("decimal(19,0)")
    g = (
        df.where(F.col(value_col).isNotNull()
                 & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(cd).alias("__s1"),
            F.sum(cd * cd).alias("__s2"),
        )
    )
    ng = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    per = g.select(
        F.col("__n"),
        F.col("__s1"),
        F.col("__s2"),
        ((s1 * s1) / ng).cast("decimal(38,18)").alias("__b_t"),
        (s2 - (s1 * s1) / ng).cast("decimal(38,18)").alias("__w_t"),
    )
    agg = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__n").cast("long").alias("n"),
        F.sum("__s1").alias("__S1"),
        F.sum("__s2").alias("__S2"),
        F.sum("__b_t").cast("double").alias("__bsum"),
        F.sum("__w_t").cast("double").alias("__ssw"),
    )
    N = F.col("n").cast("double")
    grand = (
        F.col("__S1").cast("double") * F.col("__S1").cast("double") / N
    )
    ssb = F.col("__bsum") - grand
    sst = F.col("__S2").cast("double") - grand
    df1 = (F.col("k") - 1).cast("double")
    df2 = (F.col("n") - F.col("k")).cast("double")
    fstat = F.try_divide(ssb / df1, F.col("__ssw") / df2)
    return agg.select(
        "k",
        "n",
        F.round(ssb, 6).alias("ss_between"),
        F.round(F.col("__ssw"), 6).alias("ss_within"),
        df1.cast("long").alias("df1"),
        df2.cast("long").alias("df2"),
        F.round(fstat, 6).alias("f_stat"),
        F.round(F.try_divide(ssb, sst), 6).alias("eta_sq"),
    )


def poisson_rate_test(
    counts: DataFrame,
    group_cols: Sequence[str],
    *,
    count_a_col: str,
    count_b_col: str,
    exposure_a_col: str,
    exposure_b_col: str,
) -> DataFrame:
    """Two-sample Poisson rate comparison on a prepared per-group
    count/exposure frame: rate ratio plus the exact-conditional
    binomial test (given ``n = c_a + c_b``, under H₀ ``c_a ~
    Binomial(n, t_a/(t_a+t_b))``) with a normal approximation and the
    shared A&S two-sided tail — "did the event rate change between
    two exposure windows", per group, in one row-local pass.

    The caller aggregates raw events to ``(group, c_a, c_b, t_a,
    t_b)`` (counts + exposures per condition); this operator is pure
    column algebra on that bounded frame — no shuffle of its own, so
    it composes with whatever keyed aggregation produced the counts.

    Output: ``(*group_cols, c_a, c_b, rate_a, rate_b, rate_ratio, z,
    p_value)`` (6 dp); z/p null when either count is zero-exposure or
    n = 0.
    """
    from .quality import normal_p_two_sided

    g = list(group_cols)
    ca = F.col(count_a_col).cast("double")
    cb = F.col(count_b_col).cast("double")
    ta = F.col(exposure_a_col).cast("double")
    tb = F.col(exposure_b_col).cast("double")
    n = ca + cb
    p0 = ta / (ta + tb)
    z = F.try_divide(ca - n * p0, F.sqrt(n * p0 * (F.lit(1.0) - p0)))
    return counts.select(
        *g,
        F.col(count_a_col).cast("long").alias("c_a"),
        F.col(count_b_col).cast("long").alias("c_b"),
        F.round(F.try_divide(ca, ta), 6).alias("rate_a"),
        F.round(F.try_divide(cb, tb), 6).alias("rate_b"),
        F.round(F.try_divide(F.try_divide(ca, ta), F.try_divide(cb, tb)), 6)
        .alias("rate_ratio"),
        F.round(z, 6).alias("z"),
        F.round(
            F.when(n > 0, normal_p_two_sided(z)), 6
        ).alias("p_value"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Kruskal–Wallis H test (Kruskal & Wallis 1952): the k-group
    rank-sum generalization of Mann–Whitney (x159) and the
    non-parametric complement to one-way ANOVA (x214) — does at least
    one group's value distribution sit above the others, without
    assuming normality.  The corpus-curation use: heavy-tailed
    document lengths / quality scores across k sources or languages,
    where ANOVA's mean comparison is dominated by the tail.

    Mechanics: pooled midranks with the same DOUBLED-integer-rank
    trick as ``mann_whitney_u`` (``2·avg_rank = 2·prior + cnt + 1`` —
    exact integer arithmetic through every rank sum), then
    ``H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)``, tie-corrected by
    ``C = 1 − Σ(t³−t)/(N³−N)`` (``H_adj = H/C``), p-value via the
    Wilson–Hilferty chi-square tail with k−1 dof (the x213 pairing).

    Scale shape: rows collapse to ``(stratum, value, group) → cnt``
    FIRST, the rank window runs over the distinct-value support per
    stratum (the ``distribution_drift`` bounded-support discipline —
    quantize continuous metrics before calling, rank tests are
    invariant to the monotone binning).  Per-group R_g² terms are
    decimal-cast before the cross-group sum (order-insensitive).
    Tie cubes stay in BIGINT — exact while N < 2²¹ per stratum;
    quantized supports at 100 TB keep per-value counts inside that.

    Output per stratum: ``(*partition_cols, k, n, h, h_adj,
    p_value)`` (6 dp; null h/p when k < 2 or every value ties).
    """
    from .quality import normal_sf

    parts = [F.col(c) for c in partition_cols]
    v, g = F.col(value_col), F.col(group_col)
    base = df.where(v.isNotNull() & g.isNotNull())
    lvl = base.groupBy(*parts, v.alias("__v"), g.alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    lvl = lvl.localCheckpoint(eager=True)  # feeds val_tot AND join-back
    val_tot = lvl.groupBy(*parts, "__v").agg(
        F.sum("__c").cast("long").alias("__cv")
    )
    w = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(
        "__v"
    )
    prior = F.coalesce(
        F.sum("__cv").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    ranked = val_tot.withColumn("__r2", 2 * prior + F.col("__cv") + 1)
    per_group = (
        lvl.join(ranked, on=[*partition_cols, "__v"])
        .groupBy(*parts, "__g")
        .agg(
            F.sum("__c").cast("long").alias("__ng"),
            F.sum(F.col("__c") * F.col("__r2")).cast("long").alias("__r2g"),
        )
    )
    # R_g = __r2g/2; term_g = R_g²/n_g, decimal-cast for the k-sum
    term = (
        (F.col("__r2g").cast("double") / F.lit(2.0))
        * (F.col("__r2g").cast("double") / F.lit(2.0))
        / F.col("__ng").cast("double")
    ).cast("decimal(38,12)")
    gagg = per_group.groupBy(*parts).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__ng").cast("long").alias("n"),
        F.sum(term).cast("double").alias("__rsum"),
    )
    ties = val_tot.groupBy(*parts).agg(
        F.sum(
            F.col("__cv") * F.col("__cv") * F.col("__cv") - F.col("__cv")
        ).cast("long").alias("__t3")
    )
    both = (
        gagg.join(ties, on=list(partition_cols))
        if partition_cols
        else gagg.crossJoin(F.broadcast(ties))
    )
    nd = F.col("n").cast("double")
    h = F.lit(12.0) / (nd * (nd + 1.0)) * F.col("__rsum") - 3.0 * (nd + 1.0)
    c_tie = F.lit(1.0) - F.col("__t3").cast("double") / (nd * nd * nd - nd)
    h_adj = F.try_divide(h, c_tie)
    dof = (F.col("k") - 1).cast("double")
    wh_z = (
        F.exp(F.log(F.try_divide(h_adj, dof)) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dof))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof))
    p = F.when(h_adj <= 0, F.lit(1.0)).otherwise(normal_sf(wh_z))
    ok = (F.col("k") >= 2) & (c_tie > 0)
    return both.select(
        *partition_cols,
        "k",
        "n",
        F.round(F.when(ok, h), 6).alias("h"),
        F.round(F.when(ok, h_adj), 6).alias("h_adj"),
        F.round(F.when(ok, p), 6).alias("p_value"),
    )


def jackknife_ratio_se(
    df: DataFrame,
    num_col: str,
    den_col: str,
    unit_col: str,
    group_cols: Sequence[str] = (),
    *,
    n_buckets: int = 32,
    salt: str = "jk",
    z: float = 1.959964,
) -> DataFrame:
    """Delete-one-bucket jackknife standard error of a ratio metric
    (the production technique for cluster-correlated ratio metrics —
    Google's "bucketed jackknife", cf. Chamandy et al. 2012): units
    are hashed into *n_buckets* deterministic buckets, the ratio is
    recomputed leaving each bucket out (cheap: totals minus the
    bucket's sums — no second pass), and
    ``SE² = (B−1)/B · Σ_b (R₍b₎ − R̄)²``.  The clustered complement
    to the row-bootstrap (``bootstrap_se``): per-unit collapse first
    means repeated events of one unit move between replicates
    TOGETHER, which is what makes the SE honest under within-unit
    correlation.

    Mechanics: (1) one keyed agg to per-unit (num, den) decimal sums;
    (2) bucket = md5-prefix(salt ':' unit) mod B (the
    ``uniform_hash01`` integer idiom — engine-portable, so both
    engines build identical buckets); (3) per-bucket decimal sums;
    (4) leave-one-out ratios from broadcast totals — decimal
    subtraction keeps them exact before the one double division;
    (5) moment-form SS with decimal-cast replicate terms
    (order-insensitive).  Empty buckets simply don't appear: B_eff =
    buckets actually hit (standard practice when k < B).

    Scale shape: two keyed aggs (unit, then bucket) + a B-row reduce
    per group; nothing grows with raw row count past the first agg.

    Output: ``(*group_cols, n_units, n_buckets_used, ratio, se_jk,
    ci_lo, ci_hi)`` (6 dp); SE null when fewer than 2 buckets are hit.
    """
    g = list(group_cols)
    dec = "decimal(25,12)"
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("__u").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % int(n_buckets)
    )
    per_unit = (
        df.where(F.col(num_col).isNotNull() & F.col(den_col).isNotNull())
        .groupBy(*g, F.col(unit_col).alias("__u"))
        .agg(
            F.sum(F.col(num_col).cast(dec)).alias("__yu"),
            F.sum(F.col(den_col).cast(dec)).alias("__du"),
        )
        .withColumn("__b", bucket)
    )
    per_bucket = per_unit.groupBy(*g, "__b").agg(
        F.count(F.lit(1)).cast("long").alias("__ku"),
        F.sum("__yu").alias("__yb"),
        F.sum("__du").alias("__db"),
    )
    totals = per_bucket.groupBy(*g).agg(
        F.sum("__ku").cast("long").alias("n_units"),
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.sum("__yb").alias("__yt"),
        F.sum("__db").alias("__dt"),
    )
    joined = (
        per_bucket.join(totals, on=g)
        if g
        else per_bucket.crossJoin(F.broadcast(totals))
    )
    loo = F.try_divide(
        (F.col("__yt") - F.col("__yb")).cast("double"),
        (F.col("__dt") - F.col("__db")).cast("double"),
    )
    rep = joined.select(
        *g,
        "n_units",
        "n_buckets_used",
        F.col("__yt"),
        F.col("__dt"),
        loo.alias("__r"),
    )
    agg = rep.groupBy(*g).agg(
        F.max("n_units").alias("n_units"),
        F.max("n_buckets_used").alias("bused"),
        F.max("__yt").alias("__yt"),
        F.max("__dt").alias("__dt"),
        F.sum(F.col("__r").cast("decimal(38,18)")).cast("double").alias(
            "__s1"
        ),
        F.sum(
            (F.col("__r") * F.col("__r")).cast("decimal(38,18)")
        ).cast("double").alias("__s2"),
        F.count(F.col("__r")).cast("long").alias("__kr"),
    )
    bd = F.col("__kr").cast("double")
    ss = F.col("__s2") - F.col("__s1") * F.col("__s1") / bd
    se = F.sqrt(
        F.greatest((bd - 1.0) / bd * ss, F.lit(0.0))
    )
    ratio = F.try_divide(
        F.col("__yt").cast("double"), F.col("__dt").cast("double")
    )
    ok = F.col("__kr") >= 2
    return agg.select(
        *g,
        "n_units",
        F.col("bused").alias("n_buckets_used"),
        F.round(ratio, 6).alias("ratio"),
        F.round(F.when(ok, se), 6).alias("se_jk"),
        F.round(F.when(ok, ratio - F.lit(float(z)) * se), 6).alias("ci_lo"),
        F.round(F.when(ok, ratio + F.lit(float(z)) * se), 6).alias("ci_hi"),
    )


def brown_forsythe(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test: one-way ANOVA F
    computed on ``z = |x − median_g|`` — "do these k groups have the
    same SPREAD", the assumption check that should run before the
    mean-comparison ANOVA (x214) is trusted (Brown & Forsythe 1974;
    the median-centered Levene variant, robust to non-normality).

    Engine-exactness: the group center is the LOWER median (the
    element at rank ``(n+1) div 2`` of the group's sort order) — an
    order statistic both engines select identically, with none of
    interpolation's float averaging; z is then a single IEEE double
    subtraction (deterministic), and the z-moments use the
    ``partial_correlation`` (28,6) quantized-decimal sums so group
    accumulation order cannot move the F statistic.

    Scale shape: one keyed rank window for the medians (same shape as
    ``weighted_quantiles``), a k-row broadcast join back, then ONE
    hash aggregation.  No global windows.

    Output: one row ``(k, n, f_stat, df1, df2)`` (6 dp).
    """
    base = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), F.col(value_col).alias("__x"))
    # row_number ties among equal values are assignment-arbitrary, but
    # the VALUE at any rank is unique — the order statistic is stable
    ranked = base.withColumn(
        "__rn", F.row_number().over(Window.partitionBy("__g").orderBy("__x"))
    ).withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("__g")))
    med = (
        ranked.where(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select("__g", F.col("__x").alias("__med"))
    )
    z = base.join(F.broadcast(med), "__g").select(
        "__g", F.abs(F.col("__x") - F.col("__med")).alias("__z")
    )
    dec = "decimal(28,6)"
    cz = F.col("__z")
    g = z.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(cz.cast(dec)).alias("__s1"),
        F.sum((cz * cz).cast(dec)).alias("__s2"),
    )
    ng = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    per = g.select(
        "__n",
        "__s1",
        "__s2",
        ((s1 * s1) / ng).cast("decimal(38,18)").alias("__b_t"),
        (s2 - (s1 * s1) / ng).cast("decimal(38,18)").alias("__w_t"),
    )
    agg = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__n").cast("long").alias("n"),
        F.sum("__s1").alias("__S1"),
        F.sum("__b_t").cast("double").alias("__bsum"),
        F.sum("__w_t").cast("double").alias("__ssw"),
    )
    N = F.col("n").cast("double")
    grand = F.col("__S1").cast("double") * F.col("__S1").cast("double") / N
    ssb = F.col("__bsum") - grand
    df1 = (F.col("k") - 1).cast("double")
    df2 = (F.col("n") - F.col("k")).cast("double")
    fstat = F.try_divide(ssb / df1, F.col("__ssw") / df2)
    return agg.select(
        "k",
        "n",
        F.round(fstat, 6).alias("f_stat"),
        df1.cast("long").alias("df1"),
        df2.cast("long").alias("df2"),
    )


def icc_oneway(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-way intraclass correlation ICC(1): the share of total
    variance that lives BETWEEN groups — "how much does knowing the
    user tell you about the next value", the clustering-strength
    number that decides whether per-unit collapse (the jackknife
    x221 / delta-method x222 prerequisite) is actually necessary.

    ICC(1) = (MSB − MSW) / (MSB + (k₀−1)·MSW) with the unbalanced
    correction k₀ = (N − Σn_g²/N)/(G−1) (Donner 1986).  All moments
    are the exact (19,0)² integer-decimal sums of ``oneway_anova``;
    Σn_g² is an exact BIGINT-as-decimal sum, so nothing depends on
    accumulation order.

    Scale shape: ONE keyed hash aggregation (G rows) + one G-row
    reduce — identical cost to the ANOVA it extends.

    Output: one row ``(k, n, k0, msb, msw, icc1)`` (6 dp).
    """
    cd = F.col(value_col).cast("decimal(19,0)")
    g = (
        df.where(F.col(value_col).isNotNull()
                 & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(cd).alias("__s1"),
            F.sum(cd * cd).alias("__s2"),
        )
    )
    ng = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    per = g.select(
        "__n",
        "__s1",
        "__s2",
        (F.col("__n") * F.col("__n")).cast("decimal(38,0)").alias("__n2"),
        ((s1 * s1) / ng).cast("decimal(38,18)").alias("__b_t"),
        (s2 - (s1 * s1) / ng).cast("decimal(38,18)").alias("__w_t"),
    )
    agg = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__n").cast("long").alias("n"),
        F.sum("__n2").alias("__sn2"),
        F.sum("__s1").alias("__S1"),
        F.sum("__b_t").cast("double").alias("__bsum"),
        F.sum("__w_t").cast("double").alias("__ssw"),
    )
    N = F.col("n").cast("double")
    G = F.col("k").cast("double")
    grand = F.col("__S1").cast("double") * F.col("__S1").cast("double") / N
    ssb = F.col("__bsum") - grand
    msb = F.try_divide(ssb, G - 1.0)
    msw = F.try_divide(F.col("__ssw"), N - G)
    k0 = F.try_divide(
        N - F.col("__sn2").cast("double") / N, G - 1.0
    )
    icc = F.try_divide(msb - msw, msb + (k0 - 1.0) * msw)
    return agg.select(
        "k",
        "n",
        F.round(k0, 6).alias("k0"),
        F.round(msb, 6).alias("msb"),
        F.round(msw, 6).alias("msw"),
        F.round(icc, 6).alias("icc1"),
    )


def mahalanobis_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    id_cols: Sequence[str],
    *,
    top_n: int = 20,
) -> DataFrame:
    """Bivariate Mahalanobis outlier ranking per group: ``D² = δᵀΣ⁻¹δ``
    with the 2×2 covariance inverted in CLOSED FORM — the joint-tail
    screen the per-column z/MAD scans (x37/x51) can't do: a row can be
    unremarkable on every margin and still be a correlation-breaking
    outlier (high quantity at a low price), and D² is exactly the
    statistic that sees it.

    Two passes: ONE keyed hash aggregation for the five (28,6)
    quantized power sums (population covariance, exact up to the
    final double division), then a scan that scores every row with a
    single deterministic double expression and keeps the per-group
    top-*top_n* via ``row_number`` over (D² desc, id) — rank on the
    6-dp-ROUNDED D² so an ulp cannot reorder engines; the id
    tiebreak makes ties deterministic.  Degenerate covariance
    (|Σ| ≤ 0, a constant or perfectly collinear group) yields no
    rows for that group rather than fake distances.

    Output: ``(*group_cols, *id_cols, x, y, d2, rank)``.
    """
    g = list(group_cols)
    ids = list(id_cols)
    dec = "decimal(28,6)"
    cx, cy = F.col(x_col), F.col(y_col)
    base = df.where(cx.isNotNull() & cy.isNotNull())
    m = base.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(cx.cast(dec)).alias("__sx"),
        F.sum(cy.cast(dec)).alias("__sy"),
        F.sum((cx * cx).cast(dec)).alias("__sxx"),
        F.sum((cy * cy).cast(dec)).alias("__syy"),
        F.sum((cx * cy).cast(dec)).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    mx = F.col("__sx").cast("double") / n
    my = F.col("__sy").cast("double") / n
    vxx = F.col("__sxx").cast("double") / n - mx * mx
    vyy = F.col("__syy").cast("double") / n - my * my
    vxy = F.col("__sxy").cast("double") / n - mx * my
    det = vxx * vyy - vxy * vxy
    stats = m.select(
        *g,
        mx.alias("__mx"),
        my.alias("__my"),
        vxx.alias("__vxx"),
        vyy.alias("__vyy"),
        vxy.alias("__vxy"),
        det.alias("__det"),
    ).where(F.col("__det") > 0)
    scored = base.join(F.broadcast(stats), g).select(
        *g,
        *ids,
        cx.alias("x"),
        cy.alias("y"),
        F.round(
            (
                F.col("__vyy")
                * (cx - F.col("__mx"))
                * (cx - F.col("__mx"))
                - 2.0
                * F.col("__vxy")
                * (cx - F.col("__mx"))
                * (cy - F.col("__my"))
                + F.col("__vxx")
                * (cy - F.col("__my"))
                * (cy - F.col("__my"))
            )
            / F.col("__det"),
            6,
        ).alias("d2"),
    )
    w = Window.partitionBy(*g).orderBy(
        F.desc("d2"), *[F.asc(c) for c in ids]
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(top_n))
        .select(*g, *ids, "x", "y", "d2", F.col("rank").cast("long").alias("rank"))
    )


def ams_join_size(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    *,
    rows: int = 9,
    salt: str = "ams",
    exact: bool = True,
) -> DataFrame:
    """AMS tug-of-war join-size estimate (Alon–Matias–Szegedy 1996,
    STOC; the two-table inner-product form of the F2 sketch): each key
    draws a deterministic ±1 sign per sketch row, each side folds to
    ``X_r = Σ sign_r(key)`` in ONE map-side-combinable hash agg, and
    ``X_r^A · X_r^B`` is an unbiased estimate of
    ``|A ⋈ B| = Σ_k n_A(k)·n_B(k)``.  The median over an odd number of
    rows tames the heavy-tailed single-row variance.

    This is the pre-flight gauge for the 100 TB join: two full scans
    that reduce to *rows* signed counters each — no shuffle wider than
    a 1-row summary — tell you whether the join you are about to key
    will produce 10⁹ or 10¹⁵ rows (the same question
    ``hash_width_audit`` answers for key truncation and
    ``skew_profile`` for per-key hotspots).  Set ``exact=False`` at
    scale: the exact term is a distinct-key count join provided here
    so small-data runs can report the estimator's realized error.

    Signs come from the engine-portable md5 family (`_hash64`), so a
    SQL oracle reproduces the estimate bit-for-bit: products are
    decimal(38,0)-cast before the double conversion (X_r can reach
    ±|rows(A)| — the product overflows BIGINT at petabyte row counts),
    and the median is the explicit middle element of the sorted
    product array, not an interpolating quantile.

    Output (single row): ``rows, est_join_size, exact_join_size,
    rel_err`` (the last two only when *exact*).

    Reference parity: the reference has no sketch tier; this extends
    the x29/x35/x73 mergeable-summary family to join planning.
    """
    R = int(rows)
    if R % 2 == 0 or R < 1:
        raise ValueError("rows must be odd and positive")

    both = ams_sign_counters(df_a, key_a, rows=R, salt=salt, side="a").crossJoin(
        ams_sign_counters(df_b, key_b, rows=R, salt=salt, side="b")
    )
    prods = F.array(
        *[
            (
                F.col(f"__x{r}a").cast("decimal(38,0)")
                * F.col(f"__x{r}b").cast("decimal(38,0)")
            ).cast("double")
            for r in range(R)
        ]
    )
    est = F.element_at(F.array_sort(prods), (R + 1) // 2)
    out = both.select(
        F.lit(R).cast("long").alias("rows"),
        est.alias("est_join_size"),
    )
    if not exact:
        return out
    ca = (
        df_a.where(F.col(key_a).isNotNull())
        .groupBy(F.col(key_a).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__na"))
    )
    cb = (
        df_b.where(F.col(key_b).isNotNull())
        .groupBy(F.col(key_b).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__nb"))
    )
    ex = ca.join(cb, "__k").agg(
        F.coalesce(F.sum(F.col("__na") * F.col("__nb")), F.lit(0))
        .cast("long")
        .alias("exact_join_size")
    )
    # try_divide: disjoint key sets give exact_join_size = 0 — rel_err
    # must be NULL there, not IEEE Inf/NaN (matches sibling sketch ops)
    return out.crossJoin(ex).withColumn(
        "rel_err",
        F.round(
            F.try_divide(
                F.col("est_join_size") - F.col("exact_join_size"),
                F.col("exact_join_size"),
            ),
            6,
        ),
    )


def ams_sign_counters(
    df: DataFrame,
    key_col: str,
    *,
    rows: int = 9,
    salt: str = "ams",
    side: str = "a",
) -> DataFrame:
    """The per-side reduction of :func:`ams_join_size`, factored out
    so the streaming twin (``streaming/core.streaming_ams_counters``)
    is STRUCTURALLY the same computation: one hash agg folding every
    record into *rows* signed ±1 counters (columns
    ``__x{r}{side}``).  Signed sums are additive and mergeable —
    micro-batch splits and map-side combines cannot change them — but
    NOT idempotent: an at-least-once replay double-counts (same caveat
    as the count-min twin, streaming/stateful.py); pair the streaming
    form with an idempotent sink keyed by batch id.
    """
    aggs = []
    for r in range(int(rows)):
        bit = _hash64(F.col(key_col), f"{salt}:{r}") % 2
        sign = (F.lit(1) - F.lit(2) * bit).cast("long")
        aggs.append(F.sum(sign).alias(f"__x{r}{side}"))
    return df.where(F.col(key_col).isNotNull()).agg(*aggs)


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 200,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Hill tail-index estimator (Hill 1975, Annals of Statistics):
    ``α̂ = [ (1/k)·Σ_{i=1..k} ln X_(i) − ln X_(k) ]⁻¹`` over the top-k
    order statistics — the standard measure of HOW heavy a
    heavy-tailed distribution is (Pareto exponent; α ≤ 2 means
    infinite variance).  The sizing companion to ``skew_profile``:
    skew tells you the head keys, Hill tells you whether the
    doc-length / per-key-volume tail decays fast enough for fixed
    ``maxPartitionBytes`` partitions, or whether the top percentile
    will dominate task time at 100 TB no matter how you split.

    Scale shape: per group ONE TakeOrdered heap (top-k by value desc
    with a stable tiebreak — k·P rows to the driver-side merge, never
    a global sort), then a k-row aggregate of decimal(38,12)-quantized
    logs.  Values must be positive; non-positive rows are dropped.

    Output per group: ``(*group_cols, k, x_k, alpha)`` — threshold
    order statistic and tail index (6 dp; null alpha when all top-k
    values are equal — zero log spread).
    """
    g = list(group_cols)
    kk = int(k)
    base = df.where(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
    if g:
        w = Window.partitionBy(*g).orderBy(F.desc(value_col))
        top = (
            base.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= kk)
        )
    else:
        top = (
            base.orderBy(F.desc(value_col))
            .limit(kk)
            .withColumn("__rn", F.lit(0))
        )
    logs = top.select(
        *g,
        F.col(value_col).cast("double").alias("__x"),
        F.log(F.col(value_col).cast("double"))
        .cast("decimal(38,12)")
        .alias("__lx"),
    )
    agg = logs.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.min("__x").alias("x_k"),
        F.sum("__lx").cast("double").alias("__slx"),
    )
    mean_lx = F.col("__slx") / F.col("k").cast("double")
    gap = mean_lx - F.log(F.col("x_k"))
    return agg.select(
        *g,
        "k",
        F.round(F.col("x_k"), 6).alias("x_k"),
        F.round(
            F.when(gap > 0, F.lit(1.0) / gap), 6
        ).alias("alpha"),
    )


def reducer_load_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    partitions: Sequence[int] = (32, 256),
    salt: str = "rl",
) -> DataFrame:
    """Predicted reducer-load profile for a shuffle on *key_cols*:
    assign every key to its reducer under a P-way hash partitioning
    (engine-portable md5 hash, so the prediction is oracle-checkable)
    and report the realized load distribution per candidate P — the
    balls-into-weighted-bins answer to "what does the slowest reducer
    get if I shuffle on this key with P partitions".  ``skew_ratio =
    max/mean`` near 1 means the shuffle balances; a ratio that stays
    high as P grows is the signature of a single hot key that only
    salting (``salted_agg``) or AQE skew splitting will fix —
    re-partitioning can't.  Complements ``skew_profile`` (which keys)
    and ``ams_join_size`` (how many rows): this one predicts the
    actual task histogram.

    Scale shape: ONE key-count aggregation (the same shuffle the real
    job would pay, done once), then per candidate P a reducer-keyed
    re-aggregation of the |keys|-row count table — map-side
    combinable, output P rows each.

    Output per P: ``p, n_rows, n_keys, mean_load, max_load,
    skew_ratio, nonempty`` (6 dp).
    """
    key_cols = list(key_cols)
    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    ).select(
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in key_cols]
        ).alias("__key"),
        "__n",
    )
    outs = []
    for p in partitions:
        p = int(p)
        red = (_hash64(F.col("__key"), salt) % p).alias("__r")
        loads = (
            counts.groupBy(red)
            .agg(
                F.sum("__n").alias("__load"),
                F.count(F.lit(1)).alias("__k"),
            )
            .agg(
                F.lit(p).cast("long").alias("p"),
                F.sum("__load").cast("long").alias("n_rows"),
                F.sum("__k").cast("long").alias("n_keys"),
                F.max("__load").cast("long").alias("max_load"),
                F.count(F.lit(1)).cast("long").alias("nonempty"),
            )
        )
        outs.append(loads)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    mean_load = F.col("n_rows").cast("double") / F.col("p").cast("double")
    return out.select(
        "p",
        "n_rows",
        "n_keys",
        F.round(mean_load, 6).alias("mean_load"),
        "max_load",
        F.round(F.col("max_load") / mean_load, 6).alias("skew_ratio"),
        "nonempty",
    )


def tail_dependence(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    *,
    q: float = 0.9,
) -> DataFrame:
    """Empirical upper-tail dependence coefficient (Joe 1997, ch. 2;
    the copula diagnostic): ``λ_U(q) = P(Y > y_q | X > x_q)`` at the
    shared quantile level *q* — do EXTREMES co-occur, which linear
    correlation (x53) systematically understates (a Gaussian copula
    has λ_U = 0 at any ρ < 1).  The risk question for pipelines: when
    doc length blows out, does processing cost blow out WITH it on
    the same rows, or independently (the answer decides whether the
    long tail needs its own partition strategy).

    Thresholds are per-group EXACT order statistics from one keyed
    rank window — the lower-median idiom of ``brown_forsythe``
    generalized to rank ``ceil(q·n)`` (the selected VALUE is
    tie-invariant even though row_number is not; strictly-greater
    comparison, so ties at the threshold count as non-exceedance in
    both engines).  Counting is then one keyed hash agg.

    Output per group: ``(*group_cols, n, x_q, y_q, n_x, n_y, n_xy,
    lambda_u, lift)`` — lambda_u = n_xy/n_x, lift = λ_U / P(Y > y_q)
    (lift ≈ 1 ⇒ tail-independent) (6 dp).
    """
    g = list(group_cols)
    base = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *g,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    qq = float(q)

    def thresh(col: str, alias: str) -> DataFrame:
        w = Window.partitionBy(*g).orderBy(F.col(col))
        ranked = base.select(
            *g,
            F.col(col),
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(Window.partitionBy(*g)).alias("__nn"),
        )
        return ranked.where(
            F.col("__rn") == F.ceil(F.lit(qq) * F.col("__nn")).cast("int")
        ).select(*g, F.col(col).alias(alias))

    tx = thresh("__x", "x_q")
    ty = thresh("__y", "y_q")
    joined = (
        base.join(F.broadcast(tx), g) if g else base.crossJoin(F.broadcast(tx))
    )
    joined = (
        joined.join(F.broadcast(ty), g)
        if g
        else joined.crossJoin(F.broadcast(ty))
    )
    agg = joined.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("x_q").alias("x_q"),
        F.first("y_q").alias("y_q"),
        F.sum(F.when(F.col("__x") > F.col("x_q"), 1).otherwise(0))
        .cast("long")
        .alias("n_x"),
        F.sum(F.when(F.col("__y") > F.col("y_q"), 1).otherwise(0))
        .cast("long")
        .alias("n_y"),
        F.sum(
            F.when(
                (F.col("__x") > F.col("x_q")) & (F.col("__y") > F.col("y_q")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_xy"),
    )
    lam = F.try_divide(F.col("n_xy").cast("double"), F.col("n_x"))
    py = F.try_divide(F.col("n_y").cast("double"), F.col("n"))
    return agg.select(
        *g,
        "n",
        F.round(F.col("x_q"), 6).alias("x_q"),
        F.round(F.col("y_q"), 6).alias("y_q"),
        "n_x",
        "n_y",
        "n_xy",
        F.round(lam, 6).alias("lambda_u"),
        F.round(F.try_divide(lam, py), 6).alias("lift"),
    )


def runs_test(
    df: DataFrame,
    *,
    entity_col: str,
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Wald–Wolfowitz runs test per entity: is the sequence of
    above/below-mean signs random, or does it cluster (trend /
    positive autocorrelation → too few runs) or alternate (negative
    autocorrelation → too many)?  The distribution-free companion to
    Durbin–Watson (x229) and Ljung–Box (x294) — it sees ANY
    sign-pattern departure, not just linear lag-1 structure.

    Mechanics: signs ``s_t = x_t > x̄`` over the ordered series with
    exact-mean ties dropped (the standard treatment), run count
    ``R = 1 + Σ 1[s_t ≠ s_{t−1}]``, and the normal approximation
    ``μ = 2n₁n₂/(n₁+n₂) + 1``,
    ``σ² = 2n₁n₂(2n₁n₂−n₁−n₂) / ((n₁+n₂)²(n₁+n₂−1))``,
    two-sided p from the shared A&S tail (quality.normal_p_two_sided).
    No continuity correction (both engines would apply it
    identically, but the uncorrected form is the textbook default).

    Cross-engine exactness: x̄ is a decimal-sum mean, signs are exact
    double comparisons against it, and R/n₁/n₂ are integers — the
    z-score is the only float expression and both engines evaluate
    the identical composition.

    Scale shape: one bounded mean agg joined back on the entity key,
    one entity-keyed lag window, one final agg — same shape as every
    entity-series diagnostic here.  Entities with n₁=0 or n₂=0
    report null z/p (the test is undefined on one-sided data).

    Output: ``(entity_col, n1, n2, runs, z, p_value)``.
    """
    from .quality import normal_p_two_sided

    base = df.where(
        F.col(value_col).isNotNull() & F.col(t_col).isNotNull()
    ).select(
        F.col(entity_col).alias("__e"),
        F.col(t_col).alias("__t"),
        F.col(value_col).cast("double").alias("__x"),
    )
    mean = base.groupBy("__e").agg(
        (
            F.sum(F.col("__x").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__xbar")
    )
    w = Window.partitionBy("__e").orderBy("__t")
    signs = (
        base.join(mean, on="__e")
        .where(F.col("__x") != F.col("__xbar"))
        .select(
            "__e",
            "__t",
            (F.col("__x") > F.col("__xbar")).alias("__s"),
        )
        .withColumn("__sprev", F.lag("__s", 1).over(w))
    )
    m = signs.groupBy("__e").agg(
        F.sum(F.when(F.col("__s"), 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("__s"), 0).otherwise(1))
        .cast("long")
        .alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("__sprev").isNotNull()
                    & (F.col("__s") != F.col("__sprev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    nn = n1 + n2
    mu = F.lit(2.0) * n1 * n2 / nn + F.lit(1.0)
    var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / (nn * nn * (nn - F.lit(1.0)))
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0) & (var > 0)
    z = (F.col("runs").cast("double") - mu) / F.sqrt(var)
    return m.select(
        F.col("__e").alias(entity_col),
        "n1",
        "n2",
        "runs",
        F.round(F.when(ok, z), 6).alias("z"),
        F.round(F.when(ok, normal_p_two_sided(z)), 6).alias("p_value"),
    )


def cochran_q_test(
    df: DataFrame,
    *,
    subject_col: str,
    treatment_col: str,
) -> DataFrame:
    """Cochran's Q test (1950) for k correlated binary outcomes: do
    the k treatments have the same success rate when every subject is
    its own control?  The k-treatment generalization of McNemar
    (x220), as Kruskal–Wallis (x217) generalizes Mann–Whitney.  Input
    is the POSITIVE (subject, treatment) pairs — a subject–treatment
    pair present means success, absent means failure; the full grid is
    never materialized.

    With b treatments, column totals C_j, row totals R_i, N = ΣR_i:

    ``Q = b(b−1) Σ_j (C_j − N/b)² / (b·N − ΣR_i²)``,  chi-square(b−1)
    via the shared Wilson–Hilferty tail.

    Everything is integer until the closing division — C_j, N, ΣR_i²
    are exact counts, so both engines see identical operands.

    Scale shape: one distinct + two keyed count aggs (subject-keyed
    and treatment-keyed), then 1-row + b-row combines — no windows,
    no grid completion (absent cells are zeros by construction).

    Output: one row ``(b, n_subjects, n_pos, q_stat, dof, p_value)``.
    """
    from .quality import normal_sf

    pairs = df.where(
        F.col(subject_col).isNotNull() & F.col(treatment_col).isNotNull()
    ).select(
        F.col(subject_col).alias("__s"),
        F.col(treatment_col).alias("__tr"),
    ).distinct()
    rows = pairs.groupBy("__s").agg(F.count(F.lit(1)).alias("__r"))
    row_m = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum("__r").cast("long").alias("n_pos"),
        F.sum(F.col("__r") * F.col("__r")).cast("long").alias("__r2"),
    )
    cols = pairs.groupBy("__tr").agg(F.count(F.lit(1)).alias("__c"))
    b_ct = cols.agg(F.count(F.lit(1)).cast("long").alias("b"))
    # Σ (C_j − N/b)² expands to Σ C_j² − N²/b: integer moments only,
    # so the treatment frame reduces without carrying N around
    col_m = cols.agg(
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__c2")
    )
    j = row_m.crossJoin(F.broadcast(b_ct)).crossJoin(F.broadcast(col_m))
    b = F.col("b").cast("double")
    n = F.col("n_pos").cast("double")
    num = b * (b - 1.0) * (
        F.col("__c2").cast("double") - n * n / b
    )
    den = b * n - F.col("__r2").cast("double")
    q = F.try_divide(num, den)
    dof = b - F.lit(1.0)
    wh_z = (
        F.exp(F.log(q / dof) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dof))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof))
    ok = (F.col("b") > 1) & (den > 0)
    p = F.when(q <= 0, F.lit(1.0)).otherwise(normal_sf(wh_z))
    return j.select(
        "b",
        "n_subjects",
        "n_pos",
        F.round(F.when(ok, q), 6).alias("q_stat"),
        (F.col("b") - 1).cast("long").alias("dof"),
        F.round(F.when(ok, p), 6).alias("p_value"),
    )


def bartlett_test(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Bartlett's test (1937) of variance homogeneity across k groups
    — the parametric sharp-nosed counterpart of Brown–Forsythe
    (x225): more powerful under normality, sensitive to heavy tails
    (run both; disagreement is itself the signal).

    Per group: unbiased variance from decimal moments
    ``s² = (Σx² − (Σx)²/n)/(n−1)``; then with N = Σnᵢ and pooled
    ``sp² = Σ(nᵢ−1)sᵢ²/(N−k)``:

    ``T = [(N−k)·ln sp² − Σ(nᵢ−1)·ln sᵢ²] /
          [1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1))]``,

    chi-square(k−1) via the shared Wilson–Hilferty tail.  Groups with
    n < 2 or zero variance are excluded (their log is undefined), and
    the test reports null with fewer than 2 surviving groups.

    Scale shape: ONE decimal-moment hash agg over the raw rows, then
    every remaining step on the k-row group frame (decimal-cast k-row
    sums so the combine is order-insensitive too).  No windows.

    Output: one row ``(k, n, t_stat, dof, p_value)``.
    """
    from .quality import normal_sf

    dec = "decimal(38,12)"
    g = (
        df.where(
            F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.col(value_col).cast(dec)).cast("double").alias("__sx"),
            F.sum(
                (
                    F.col(value_col).cast("double")
                    * F.col(value_col).cast("double")
                ).cast(dec)
            )
            .cast("double")
            .alias("__sxx"),
        )
        .withColumn(
            "__var",
            (
                F.col("__sxx")
                - F.col("__sx") * F.col("__sx") / F.col("__n").cast("double")
            )
            / (F.col("__n").cast("double") - 1.0),
        )
        .where((F.col("__n") >= 2) & (F.col("__var") > 0))
    )
    dec18 = "decimal(38,18)"
    m = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__n").cast("long").alias("n"),
        F.sum(
            ((F.col("__n").cast("double") - 1.0) * F.col("__var")).cast(
                dec18
            )
        )
        .cast("double")
        .alias("__ssw"),
        F.sum(
            (
                (F.col("__n").cast("double") - 1.0) * F.log(F.col("__var"))
            ).cast(dec18)
        )
        .cast("double")
        .alias("__slnv"),
        F.sum(
            (F.lit(1.0) / (F.col("__n").cast("double") - 1.0)).cast(dec18)
        )
        .cast("double")
        .alias("__sinv"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    sp2 = F.col("__ssw") / (nd - kd)
    t_num = (nd - kd) * F.log(sp2) - F.col("__slnv")
    t_den = F.lit(1.0) + (
        F.col("__sinv") - F.lit(1.0) / (nd - kd)
    ) / (F.lit(3.0) * (kd - 1.0))
    t = t_num / t_den
    dof = kd - F.lit(1.0)
    wh_z = (
        F.exp(F.log(t / dof) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dof))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof))
    ok = F.col("k") > 1
    p = F.when(t <= 0, F.lit(1.0)).otherwise(normal_sf(wh_z))
    return m.select(
        "k",
        "n",
        F.round(F.when(ok, t), 6).alias("t_stat"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.round(F.when(ok, p), 6).alias("p_value"),
    )


def friedman_test(
    cells: DataFrame,
    *,
    subject_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman rank test (1937) for k repeated measures: do the k
    treatments differ when every subject scores ALL of them?  The
    rank-based member of the within-subject family — Cochran's Q
    (x297) for its binary case, Kruskal–Wallis (x217) for the
    independent-groups case.

    Only COMPLETE blocks enter (subjects with all b treatments — an
    incomplete block would bias its ranks low), midranks break ties,
    and with column rank sums R_j over n complete subjects:

    ``χ²_F = 12/(n·b(b+1)) · Σ R_j² − 3n(b+1)``  (no ties-correction
    denominator — cell values here are continuous aggregates where
    exact ties are measure-zero; both engines rank identically either
    way), chi-square(b−1) via the shared Wilson–Hilferty tail.

    Cross-engine exactness: midrank = RANK() + (|equal|−1)/2 from two
    portable windows, rank sums are exact halves (×2 stays integer),
    and the closing formula is a fixed composition of those integers.

    Scale shape: subject-keyed rank windows (frame bounded by b),
    one treatment-keyed sum, b-row algebra — no global window, no
    grid completion beyond the complete-block filter.

    Output: one row ``(n, b, chi2, dof, p_value)``.
    """
    from .quality import normal_sf

    base = cells.where(
        F.col(subject_col).isNotNull()
        & F.col(treatment_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(subject_col).alias("__s"),
        F.col(treatment_col).alias("__tr"),
        F.col(value_col).cast("double").alias("__v"),
    )
    b_ct = base.agg(
        F.count_distinct(F.col("__tr")).cast("long").alias("b")
    )
    ws = Window.partitionBy("__s")
    complete = (
        base.withColumn("__nt", F.count(F.lit(1)).over(ws))
        .crossJoin(F.broadcast(b_ct))
        .where(F.col("__nt") == F.col("b"))
    )
    wr = Window.partitionBy("__s").orderBy("__v")
    weq = Window.partitionBy("__s", "__v")
    ranked = complete.select(
        "__s",
        "__tr",
        "b",
        (
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(weq).cast("double") - 1.0) / 2.0
        ).alias("__r"),
    )
    sums = ranked.groupBy("__tr").agg(
        F.max("b").alias("b"),
        F.count(F.lit(1)).cast("long").alias("__n"),
        # ×2 keeps midrank sums integer-exact across engines
        F.sum((F.col("__r") * 2.0).cast("long")).cast("long").alias("__r2x"),
    )
    m = sums.agg(
        F.max("__n").cast("long").alias("n"),
        F.max("b").cast("long").alias("b"),
        F.sum(
            F.col("__r2x").cast("double") * F.col("__r2x").cast("double")
        ).alias("__sr2_4x"),
    )
    nd = F.col("n").cast("double")
    bd = F.col("b").cast("double")
    chi2 = (
        F.lit(12.0)
        / (nd * bd * (bd + 1.0))
        * (F.col("__sr2_4x") / 4.0)
        - 3.0 * nd * (bd + 1.0)
    )
    dof = bd - F.lit(1.0)
    wh_z = (
        F.exp(F.log(chi2 / dof) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dof))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof))
    ok = (F.col("b") > 1) & (F.col("n") > 0)
    p = F.when(chi2 <= 0, F.lit(1.0)).otherwise(normal_sf(wh_z))
    return m.select(
        "n",
        "b",
        F.round(F.when(ok, chi2), 6).alias("chi2"),
        (F.col("b") - 1).cast("long").alias("dof"),
        F.round(F.when(ok, p), 6).alias("p_value"),
    )


def energy_distance(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    quantize: int = 6,
) -> DataFrame:
    """Two-sample energy distance (Székely & Rizzo 2004, V-statistic
    form): ``D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|`` — zero iff the
    distributions coincide, metric-sensitive to BOTH location and
    shape differences where KS (:func:`ks_statistic`) saturates at the
    max ECDF gap and PSI needs bins.  The drift gauge to reach for
    when "how far apart" matters, not just "are they different".

    Exact in one pass over the value support: all three pairwise-mean
    terms have closed forms on the value-aggregated frame.  With per-
    value counts ``c_v`` and running (RANGE) sums ``CntLe/SumLe`` over
    the pooled support, ``Σ_pairs |x−x'| = 2·Σ_v c_v·(v·CntLt −
    SumLt)`` per side and the cross term analogously — no quadratic
    pair stage anywhere.

    Scale shape: values quantize to *quantize* dp (decimal-exact
    arithmetic thereafter), one groupBy reduces the data to its
    distinct support, and the only ordered window runs over the
    support — the KS/ECDF-class bound (distinct quantized values, not
    rows).  Output one row: ``(n_a, n_b, e_cross, e_within_a,
    e_within_b, energy_dist)`` at 6 dp.
    """
    q = int(quantize)
    dec = "decimal(38,12)"
    v = F.round(F.col(value_col).cast("double"), q)
    tagged = (
        df_a.where(F.col(value_col).isNotNull())
        .select(v.alias("v"), F.lit(1).alias("__a"), F.lit(0).alias("__b"))
        .unionByName(
            df_b.where(F.col(value_col).isNotNull()).select(
                v.alias("v"), F.lit(0).alias("__a"), F.lit(1).alias("__b")
            )
        )
    )
    support = tagged.groupBy("v").agg(
        F.sum("__a").cast("long").alias("ca"),
        F.sum("__b").cast("long").alias("cb"),
    )
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    vd = F.col("v").cast("decimal(28,6)")
    run = support.select(
        "v",
        "ca",
        "cb",
        F.sum("ca").over(w).alias("__cale"),
        F.sum("cb").over(w).alias("__cble"),
        F.sum((vd * F.col("ca")).cast(dec)).over(w).alias("__sale"),
        F.sum((vd * F.col("cb")).cast(dec)).over(w).alias("__sble"),
    )
    # strictly-below cumulative = at-or-below minus own mass
    ca_lt = F.col("__cale") - F.col("ca")
    cb_lt = F.col("__cble") - F.col("cb")
    sa_lt = (F.col("__sale") - (vd * F.col("ca")).cast(dec)).cast(dec)
    sb_lt = (F.col("__sble") - (vd * F.col("cb")).cast(dec)).cast(dec)
    gaps = run.select(
        "ca",
        "cb",
        # Σ over ordered pairs (one direction) of |x − x'| etc.;
        # decimal all the way — order-insensitive exact sums
        ((vd * F.col("ca")).cast(dec) * ca_lt - sa_lt * F.col("ca"))
        .cast(dec)
        .alias("__aa"),
        ((vd * F.col("cb")).cast(dec) * cb_lt - sb_lt * F.col("cb"))
        .cast(dec)
        .alias("__bb"),
        # cross: this side's value against the OTHER side's lower mass
        (
            (vd * F.col("cb")).cast(dec) * ca_lt
            - sa_lt * F.col("cb")
            + (vd * F.col("ca")).cast(dec) * cb_lt
            - sb_lt * F.col("ca")
        )
        .cast(dec)
        .alias("__ab"),
    )
    tot = gaps.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.col("__aa").cast(dec)).cast("double").alias("__saa"),
        F.sum(F.col("__bb").cast(dec)).cast("double").alias("__sbb"),
        F.sum(F.col("__ab").cast(dec)).cast("double").alias("__sab"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    e_cross = F.try_divide(F.col("__sab"), na * nb)
    e_a = F.try_divide(F.lit(2.0) * F.col("__saa"), na * na)
    e_b = F.try_divide(F.lit(2.0) * F.col("__sbb"), nb * nb)
    return tot.select(
        "n_a",
        "n_b",
        F.round(e_cross, 6).alias("e_cross"),
        F.round(e_a, 6).alias("e_within_a"),
        F.round(e_b, 6).alias("e_within_b"),
        F.round(F.lit(2.0) * e_cross - e_a - e_b, 6).alias("energy_dist"),
    )


def countsketch_estimate(
    df: DataFrame,
    value_col: str,
    probes: Sequence[str],
    *,
    depth: int = 5,
    width: int = 64,
    salt: str = "csk",
) -> DataFrame:
    """Count-sketch frequency estimates (Charikar, Chen &
    Farach-Colton 2002): like :func:`countmin_estimate` but each
    counter adds a ±1 sign per value, so collisions cancel in
    expectation instead of only inflating — the estimate is the
    MEDIAN over rows of ``sign·counter``, unbiased where count-min is
    one-sided.  The right sketch when under-counting is as bad as
    over-counting (e.g. frequency-threshold dedup decisions).

    Same deterministic md5 column algebra as the count-min build: one
    explode into *depth* (r, bucket, sign) keys, one groupBy to a
    ``depth × width`` signed counter table (bounded state, mergeable
    cell-wise), probe side joined broadcast.  Median of *depth* values
    via ``array_sort`` over the collected row estimates — *depth* is a
    literal constant, never data-sized.

    Output per probe: ``(term, true_n, est_n)``.
    """
    probes = [str(p) for p in probes]
    if depth < 1 or depth % 2 == 0:
        raise ValueError("depth must be odd and positive (median of rows)")
    sign = lambda col, r: (  # noqa: E731
        F.lit(1) - F.lit(2) * (_hash64(col, f"{salt}s:{r}") % 2)
    ).cast("long")
    cells = [
        F.struct(
            F.lit(r).alias("r"),
            (_hash64(F.col(value_col), f"{salt}:{r}") % width)
            .cast("long")
            .alias("bucket"),
            sign(F.col(value_col), r).alias("s"),
        )
        for r in range(depth)
    ]
    sketch = (
        df.select(F.explode(F.array(*cells)).alias("cell"))
        .groupBy(
            F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.sum("cell.s").cast("long").alias("c"))
    )
    spark = df.sparkSession
    probe_df = spark.createDataFrame([(p,) for p in probes], "term string")
    keys = probe_df.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (_hash64(F.col("term"), f"{salt}:{r}") % width)
                        .cast("long")
                        .alias("bucket"),
                        sign(F.col("term"), r).alias("s"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(
        "term",
        F.col("cell.r").alias("r"),
        F.col("cell.bucket").alias("bucket"),
        F.col("cell.s").alias("s"),
    )
    est = (
        keys.join(F.broadcast(sketch), on=["r", "bucket"], how="left")
        .groupBy("term")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.col("s") * F.coalesce(F.col("c"), F.lit(0))
                )
            ).alias("__ests")
        )
        .select(
            "term",
            F.element_at(F.col("__ests"), depth // 2 + 1)
            .cast("long")
            .alias("est_n"),
        )
    )
    truth = (
        df.select(F.col(value_col).cast("string").alias("term"))
        .where(F.col("term").isin(probes))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("true_n"))
    )
    return (
        est.join(F.broadcast(truth), "term", "left")
        .select(
            "term",
            F.coalesce("true_n", F.lit(0)).cast("long").alias("true_n"),
            "est_n",
        )
        .orderBy("term")
    )


def hodges_lehmann(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    max_values: int = 64,
) -> DataFrame:
    """Per-group Hodges–Lehmann location estimate (Hodges & Lehmann
    1963): the median of all Walsh averages ``(x_i + x_j)/2`` over
    ``i <= j`` — the location estimator the Wilcoxon signed-rank test
    inverts to, ~29% breakdown like the median but with much higher
    Gaussian efficiency (0.955 vs 0.64), the natural "robust mean"
    readout beside the MAD spread (x51) and Theil–Sen slope (x78).

    Scale containment mirrors ``theil_sen_trend``: each group keeps
    its *max_values* largest-hash representative values (md5-ranked
    row_number window, group-partitioned — deterministic on both
    engines), bounding the Walsh-pair stage at ``k(k+1)/2`` ≤ 2080
    rows per group regardless of group size; the pair join is a
    group-keyed equi-join, co-partitioned, no cross-group traffic.
    The median uses the exact ``percentile`` aggregate (↔ DuckDB
    ``quantile_cont``).

    Output per group: ``(*group_cols, n_used, n_pairs, hl_estimate)``
    (6 dp, tie-safe).
    """
    k = int(max_values)
    if not (2 <= k <= 256):
        raise ValueError("max_values must be in 2..256")
    gs = list(group_cols)
    base = df.select(
        *gs, F.col(value_col).cast("double").alias("__v")
    ).where(F.col("__v").isNotNull())
    w = Window.partitionBy(*gs).orderBy(
        _hash64(F.col("__v"), "hl"), F.col("__v")
    )
    kept = (
        base.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )
    a = kept.select(
        *gs, F.col("__v").alias("__va"), F.col("__rn").alias("__ra")
    )
    b = kept.select(
        *gs, F.col("__v").alias("__vb"), F.col("__rn").alias("__rb")
    )
    walsh = a.join(b, on=gs).where(F.col("__ra") <= F.col("__rb"))
    return (
        walsh.groupBy(*gs)
        .agg(
            F.max("__rb").alias("n_used"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr(
                "percentile((__va + __vb) / 2.0, 0.5)"
            ).alias("__hl"),
        )
        .select(
            *gs,
            F.col("n_used").cast("long").alias("n_used"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            (F.round(F.col("__hl") * F.lit(1e6)) / F.lit(1e6)).alias(
                "hl_estimate"
            ),
        )
        .orderBy(*gs)
    )


def gini_lorenz(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col,
) -> DataFrame:
    """Gini coefficient + Lorenz summary per group — the
    rank-weighted inequality measure the x71 Herfindahl index
    doesn't capture (HHI reads squared shares; Gini reads the whole
    Lorenz curve: a market of 100 equal minnows and 2 whales can
    share an HHI with very different Ginis).  Non-negative weights
    sorted ascending with the deterministic tie-break (value, member
    order via row_number):

        ``G = 2·Σ i·w_(i) / (n·Σw) − (n+1)/n``

    plus the top-decile share (share of the largest ceil(n/10)
    members).  The rank window is group-keyed; all folds are
    decimal-exact (integer ranks × ≤6-dp weights), so the statistic
    is partitioning-invariant by construction.

    Output: ``(group_cols…, n_members, total, gini, top10_share)``
    at 6 dp; NULL gini for groups with zero total.
    """
    group_cols = list(group_cols)
    w = (
        value_col
        if isinstance(value_col, Column)
        else F.col(value_col)
    )
    base = df.select(
        *group_cols, w.cast("double").alias("__w")
    ).where(F.col("__w").isNotNull() & (F.col("__w") >= 0))
    win = Window.partitionBy(*group_cols).orderBy("__w")
    ranked = base.withColumn("__i", F.row_number().over(win))
    dec = lambda c: F.sum(c.cast("decimal(38,6)")).cast("double")  # noqa: E731
    nwin = Window.partitionBy(*group_cols)
    ranked = ranked.withColumn("__n", F.count(F.lit(1)).over(nwin))
    topk = F.ceil(F.col("__n") / F.lit(10)).cast("long")
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        dec(F.col("__w")).alias("total"),
        dec(F.col("__i").cast("double") * F.col("__w")).alias("siw"),
        dec(
            F.when(
                F.col("__i") > F.col("__n") - topk, F.col("__w")
            )
        ).alias("wtop"),
    )
    n = F.col("n_members").cast("double")
    tot_safe = F.when(F.col("total") > 0, F.col("total"))
    gini = (
        F.lit(2.0) * F.col("siw") / (n * tot_safe)
        - (n + F.lit(1.0)) / n
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        *group_cols,
        "n_members",
        r6(F.col("total")).alias("total"),
        r6(gini).alias("gini"),
        r6(F.coalesce(F.col("wtop"), F.lit(0.0)) / tot_safe).alias(
            "top10_share"
        ),
    ).orderBy(*group_cols)


def cramer_von_mises(
    df: DataFrame,
    *,
    sample_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Cramér–von Mises statistic for every ordered pair
    of samples within an entity frame (Anderson 1962 rank form):
    with pooled ranks ``r_i`` of sample A (sizes n, m),

        ``U = n·Σ(r_i − i)² + m·Σ(s_j − j)²``
        ``T = U/(n·m·(n+m)) − (4·n·m − 1)/(6·(n+m))``

    — the INTEGRATED distribution distance that weights the whole
    CDF gap, where x99's KS reads only the supremum (KS misses
    distributed small shifts CvM accumulates).  Ranks break ties
    deterministically by (value, sample, intra-rank), making the
    statistic engine-exact integer algebra end to end; the pair
    frame and both rank windows key on the (entity, pair) so the
    shuffles stay pair-local.

    Output: ``(entity_a, entity_b, n_a, n_b, cvm_t, shifted)``
    (``shifted`` = T above the 5 % critical value 0.461) ordered by
    (entity_a, entity_b).
    """
    base = df.select(
        F.col(sample_col).cast("string").alias("s"),
        F.col(value_col).cast("double").alias("v"),
        F.col(order_col).alias("ord0"),
    ).where(F.col("v").isNotNull())
    a = base.select(
        F.col("s").alias("sa"), F.col("v").alias("va"),
        F.col("ord0").alias("oa"),
    )
    b = base.select(
        F.col("s").alias("sb"), F.col("v").alias("vb"),
        F.col("ord0").alias("ob"),
    )
    pairs_a = (
        a.join(
            b.select("sb").distinct(),
            F.col("sa") < F.col("sb"),
        )
        .select("sa", "sb", F.col("va").alias("v"),
                F.col("oa").alias("o"), F.lit(0).alias("side"))
    )
    pairs_b = (
        b.join(
            a.select("sa").distinct(),
            F.col("sa") < F.col("sb"),
        )
        .select("sa", "sb", F.col("vb").alias("v"),
                F.col("ob").alias("o"), F.lit(1).alias("side"))
    )
    pooled = pairs_a.unionByName(pairs_b)
    wp = Window.partitionBy("sa", "sb").orderBy(
        "v", "side", "o"
    )
    ws = Window.partitionBy("sa", "sb", "side").orderBy(
        "v", "side", "o"
    )
    ranked = pooled.withColumn(
        "r", F.row_number().over(wp)
    ).withColumn("i", F.row_number().over(ws))
    d = (F.col("r") - F.col("i")).cast("double")
    agg = ranked.groupBy("sa", "sb").agg(
        F.count(F.when(F.col("side") == 0, F.lit(1)))
        .cast("double")
        .alias("n"),
        F.count(F.when(F.col("side") == 1, F.lit(1)))
        .cast("double")
        .alias("m"),
        F.sum(
            F.when(F.col("side") == 0, d * d).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("da"),
        F.sum(
            F.when(F.col("side") == 1, d * d).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("db"),
    )
    n, m = F.col("n"), F.col("m")
    u = n * F.col("da") + m * F.col("db")
    nm_safe = F.when((n > 0) & (m > 0), n * m * (n + m))
    t = u / nm_safe - (F.lit(4.0) * n * m - F.lit(1.0)) / (
        F.lit(6.0) * (n + m)
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        F.col("sa").alias("entity_a"),
        F.col("sb").alias("entity_b"),
        n.cast("long").alias("n_a"),
        m.cast("long").alias("n_b"),
        r6(t).alias("cvm_t"),
        F.when(t.isNotNull(), (t > F.lit(0.461)).cast("int")).alias(
            "shifted"
        ),
    ).orderBy("entity_a", "entity_b")


def rank_biased_overlap(
    left: DataFrame,
    right: DataFrame,
    *,
    item_col: str,
    rank_col: str,
    depth: int = 50,
    p: float = 0.5,
) -> DataFrame:
    """Rank-biased overlap of two rankings (Webber, Moffat & Zobel
    2010), truncated at *depth*:

        ``RBO@D = (1−p) · Σ_{d=1..D} p^(d−1) · |A_d ∩ B_d| / d``

    plus the residual mass ``p^D`` bounding what deeper prefixes
    could add — the top-weighted agreement measure for comparing two
    rankers WITHOUT relevance labels (x230's retrieval_eval needs
    judgments; RBO compares the rankers directly).  Default
    ``p = 1/2`` keeps every weight an exact dyadic (the theta/x357
    discipline — pass 0.9 only when you accept libm pow variance).

    Mechanism: inner-join the two rank frames on the item, explode
    each item into the depths ``max(rank_a, rank_b) ≤ d ≤ D`` it is
    common at (a bounded sequence — the item contributes to every
    deeper prefix), ONE groupBy over d, and the weighted fold over
    ≤D aggregate rows (metadata-scale, the x343 precedent).

    Output: ONE row ``(depth, n_common_items, rbo, residual)`` at
    6 dp.
    """
    if not (0.0 < p < 1.0):
        raise ValueError("rank_biased_overlap: p must be in (0, 1)")
    if depth < 1:
        raise ValueError("rank_biased_overlap: depth must be >= 1")
    D = int(depth)
    la = left.select(
        F.col(item_col).alias("item"),
        F.col(rank_col).cast("long").alias("ra"),
    ).where(F.col("ra") <= D)
    lb = right.select(
        F.col(item_col).alias("item"),
        F.col(rank_col).cast("long").alias("rb"),
    ).where(F.col("rb") <= D)
    common = la.join(lb, "item").select(
        "item", F.greatest("ra", "rb").alias("dmin")
    )
    n_common = common.count()
    per_d = (
        common.select(
            F.explode(
                F.sequence(F.col("dmin"), F.lit(D))
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    pw = F.pow(F.lit(float(p)), F.col("d") - 1)
    # ORDER-PINNED fold over the <=D aggregate rows (ascending d):
    # dyadic-weight terms land exactly on decimal rounding boundaries
    # where engine tie rules differ (the x357 lesson), so the fold is
    # a running window sum, not a decimal cast
    wacc = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fold = (
        per_d.withColumn(
            "lacc",
            F.sum(pw * F.col("x") / F.col("d").cast("double")).over(
                wacc
            ),
        )
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("d"))),
        )
        .where(F.col("rk") == 1)
        .select(F.col("lacc").alias("s"), F.lit(1).alias("__one"))
    )
    # disjoint top lists leave the fold empty — anchor the summary on
    # a literal one-row frame so the operator always emits its row
    anchor = left.sparkSession.range(1).select(
        F.lit(1).alias("__one")
    )
    agg = anchor.join(F.broadcast(fold), "__one", "left")
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        F.lit(D).alias("depth"),
        F.lit(int(n_common)).alias("n_common_items"),
        r6(
            F.lit(1.0 - float(p)) * F.coalesce(F.col("s"), F.lit(0.0))
        ).alias("rbo"),
        r6(F.lit(float(p) ** D)).alias("residual"),
    )


def quantile_sketch(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    *,
    k: int = 8,
    probs: tuple = (0.25, 0.5, 0.9),
    max_len: int = 8192,
) -> DataFrame:
    """Mergeable bounded-memory quantile sketch per group — a
    DETERMINISTIC KLL/MRL-style compactor ladder (Karnin-Lang-Liberty
    2016 with the randomized coin replaced by a fixed odd-index rule,
    Manku-Rajagopalan-Lindsay 1998 lineage): values stream in *t*
    order into a level-0 buffer of capacity *k*; a full level sorts
    and keeps its 1-based ODD-index half at double weight on the next
    level, cascading.  Memory is O(k·log(n/k)) per group versus the
    exact path's O(n) (see :func:`group_quantiles` for the trade),
    and two sketches merge by concatenating levels and re-compacting
    — the shuffle-free path for 100 TB per-partition pre-aggregation.

    The fixed compaction rule makes the whole structure a pure
    function of the (group, t-ordered) value sequence: the oracle
    replays insert/compact as a recursive-CTE state machine (ONE
    insert or ONE lowest-full-level compaction per step — the x390
    PAV idiom with a compactor ladder for state), and the streaming
    twin (``streaming/stateful.py:streaming_quantile_sketch``) holds
    the identical ladder per key, so batch, oracle, and stream agree
    bitwise.  Estimate for probability p: the smallest value whose
    cumulative weight (2^level per element) reaches p·W.

    Output: one row per (group, p): ``est`` (6 dp), ``n`` processed,
    ``summary_size`` (elements retained across levels).
    """
    if k < 2 or k % 2:
        raise ValueError("quantile_sketch: k must be even and >= 2")
    per_grp = (
        df.select(
            F.col(group_col).cast("string").alias("g"),
            F.col(t_col).cast("long").alias("o"),
            F.col(value_col).cast("double").alias("v"),
        )
        .where(F.col("o").isNotNull() & F.col("v").isNotNull())
        .groupBy("g")
        .agg(F.sort_array(F.collect_list(F.struct("o", "v"))).alias("ovs"))
    )
    stats = per_grp.agg(
        F.count(F.lit(1)).alias("ng"), F.max(F.size("ovs")).alias("ml")
    ).first()
    if stats["ng"] == 0:
        raise ValueError("quantile_sketch: input is empty")
    if stats["ml"] > int(max_len):
        raise ValueError(
            f"quantile_sketch: longest group ({stats['ml']}) exceeds "
            f"max_len={max_len} — pre-aggregate or raise consciously"
        )
    kk = int(k)
    ps = [float(p) for p in probs]

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            out = {"g": [], "p": [], "est": [], "n": [], "size": []}
            for g, ovs in zip(pdf["g"], pdf["ovs"]):
                levels: list = [[]]
                n = 0
                for s in ovs:
                    levels[0].append(float(s["v"]))
                    n += 1
                    lev = 0
                    while len(levels[lev]) >= kk:
                        buf = sorted(levels[lev])
                        keep = buf[0::2]  # 1-based odd indices
                        levels[lev] = []
                        if lev + 1 == len(levels):
                            levels.append([])
                        levels[lev + 1].extend(keep)
                        lev += 1
                weighted = sorted(
                    (v, 1 << ell)
                    for ell, buf in enumerate(levels)
                    for v in buf
                )
                total = sum(w for _, w in weighted)
                size = len(weighted)
                for p in ps:
                    target = p * total
                    cum = 0
                    est = weighted[-1][0]
                    for v, w_ in weighted:
                        cum += w_
                        if cum >= target:
                            est = v
                            break
                    out["g"].append(g)
                    out["p"].append(p)
                    out["est"].append(est)
                    out["n"].append(n)
                    out["size"].append(size)
            yield pd.DataFrame(
                {
                    "g": pd.Series(out["g"], dtype="object"),
                    "p": pd.Series(out["p"], dtype="float64"),
                    "est": pd.Series(out["est"], dtype="float64"),
                    "n": pd.Series(out["n"], dtype="int64"),
                    "size": pd.Series(out["size"], dtype="int64"),
                }
            )

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("g", StringType()),
            StructField("p", DoubleType()),
            StructField("est", DoubleType()),
            StructField("n", LongType()),
            StructField("size", LongType()),
        ]
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return (
        per_grp.mapInPandas(compute, schema=schema)
        .select(
            F.col("g").alias("grp"),
            r6(F.col("p")).alias("p"),
            r6(F.col("est")).alias("est"),
            F.col("n"),
            F.col("size").alias("summary_size"),
        )
        .orderBy("grp", "p")
    )
