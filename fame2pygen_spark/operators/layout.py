"""Data-layout operators: space-filling-curve clustering for
multi-dimensional scan pruning.

At 100 TB the cheapest query is the one that never reads the data:
parquet row-group (and partition) pruning works off per-file min/max
statistics, which a single-column sort only makes tight for ONE
predicate column.  Interleaving the bits of several columns' bin
numbers (a Z-order / Morton curve) and range-partitioning + sorting by
that key makes the min/max envelopes tight on EVERY interleaved column
at once — the same technique Delta Lake's ``OPTIMIZE ZORDER BY`` and
ClickHouse's ``mortonEncode`` use.

Everything here is integer column algebra (fixed-width bins from
global min/max, shifts and masks) — engine-reproducible and
whole-stage-codegen friendly; no UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _bin_col(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Fixed-width bin number in [0, 2^bits):
    ``floor((x - min) * 2^bits / (max - min + 1))``.

    The quotient goes through double division; floor is exact while
    ``(x - min) * 2^bits * (max - min + 1) < 2^53`` — i.e. value
    ranges up to ~2^45 at bits=4 — far past any bin-key use.  Both
    engines produce the identical double, so bins agree bitwise."""
    nbins = 1 << bits
    span = (cmax - cmin + F.lit(1)).cast("long")
    return F.floor(
        (col.cast("long") - cmin.cast("long")) * F.lit(nbins) / span
    ).cast("long")


def zorder_key(
    bin_cols: Sequence[Column], *, bits: int = 8
) -> Column:
    """Morton interleave of *bin_cols* (each already a bin number in
    ``[0, 2^bits)``): bit *i* of column *j* lands at position
    ``i * n_cols + j``.  Shift-and-mask only — no UDF, stays inside
    whole-stage codegen."""
    ncols = len(bin_cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(bin_cols):
        for i in range(bits):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * ncols + j)
    return z


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Physically cluster *df* along the Z-order curve of *cols*:
    compute the Morton key from fixed-width bins (bin edges from a
    1-row global min/max aggregate, broadcast — the repo's scalar
    pattern), then ``repartitionByRange`` + ``sortWithinPartitions``
    on it.  Writing the result gives parquet files whose min/max
    stats are tight on every clustered column, so predicates on ANY
    of them prune row groups — not just the leading sort column.

    The range partitioner samples the z-key distribution, so skewed
    dimensions still yield balanced files.  Adds a ``__z`` column
    (drop after write)."""
    cols = list(cols)
    mins_maxs = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    with_stats = df.join(F.broadcast(mins_maxs))
    bins = [
        _bin_col(
            F.col(c),
            F.col(f"__min_{c}"),
            F.col(f"__max_{c}"),
            bits,
        )
        for c in cols
    ]
    keyed = with_stats.withColumn("__z", zorder_key(bins, bits=bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, "__z")
    else:
        keyed = keyed.repartitionByRange("__z")
    return keyed.sortWithinPartitions("__z")


def zorder_extent_profile(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 4,
) -> DataFrame:
    """Pruning-quality diagnostic: bucket rows by their Z-order key
    (``bits`` per dimension) and report each bucket's row count plus
    the min/max envelope and span fraction of every dimension — the
    exact statistics a reader would consult to skip the bucket.  Tight
    span fractions (≪ 1) on all dimensions are what Z-ordering buys
    over a single-column sort (tight on one, ~1.0 on the rest).

    One global 1-row min/max aggregate (broadcast) + one groupBy on
    the z key — integer math throughout, oracle-reproducible."""
    cols = list(cols)
    mins_maxs = df.agg(
        *[F.min(c).cast("long").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"__max_{c}") for c in cols],
    )
    with_stats = df.join(F.broadcast(mins_maxs))
    bins = [
        _bin_col(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits)
        for c in cols
    ]
    keyed = with_stats.withColumn("zbucket", zorder_key(bins, bits=bits))
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).cast("long").alias(f"min_{c}"),
            F.max(c).cast("long").alias(f"max_{c}"),
            F.round(
                (F.max(c) - F.min(c) + F.lit(1)).cast("double")
                / (
                    F.max(f"__max_{c}") - F.max(f"__min_{c}") + F.lit(1)
                ).cast("double"),
                6,
            ).alias(f"span_frac_{c}"),
        ]
    return keyed.groupBy("zbucket").agg(*aggs)


def compaction_plan(
    files: DataFrame,
    *,
    partition_cols: Sequence[str],
    file_col: str,
    size_col: str,
    target_size: int,
) -> DataFrame:
    """Small-file compaction planning: within each table partition,
    assign files (ordered by *file_col* for determinism) to compaction
    groups of ~*target_size* bytes via exclusive-cumulative-sum
    bucketing — the table-maintenance step that turns a
    million-small-files partition back into scan-efficient objects.

    ``group = floor(cumsum_before / target)``: each group closes as
    soon as it reaches the target, so every group except a partition's
    last is >= target only when single files exceed it — the same
    one-pass rule Delta/Iceberg compactors use (greedy by declared
    order, not true bin packing, which is NP-hard and order-unstable).

    Scale shape: this operates on FILE METADATA (one row per file),
    orders of magnitude smaller than the data; the window partitions
    by table partition, so no global sort.  All arithmetic is integer
    — exact everywhere.

    Returns one row per ``(partition_cols..., compaction_group)``:
    ``n_files, total_bytes, reaches_target``.
    """
    if target_size <= 0:
        raise ValueError("target_size must be positive")
    parts = list(partition_cols)
    w = (
        Window.partitionBy(*parts)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(
        F.sum(F.col(size_col).cast("long")).over(w), F.lit(0)
    )
    grouped = (
        files.withColumn("__before", before)
        .withColumn(
            "compaction_group",
            F.expr(f"__before div {int(target_size)}").cast("long"),
        )
    )
    return grouped.groupBy(*parts, "compaction_group").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.col(size_col).cast("long")).cast("long").alias(
            "total_bytes"
        ),
        (
            F.sum(F.col(size_col).cast("long")) >= F.lit(int(target_size))
        ).alias("reaches_target"),
    )


def zone_map_skip_audit(
    file_stats: DataFrame,
    predicates: DataFrame,
    *,
    layout_cols: Sequence[str] = ("layout",),
    min_col: str = "min_v",
    max_col: str = "max_v",
    rows_col: str = "n_rows",
    pred_id_col: str = "pred_id",
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Zone-map pruning audit: replay a predicate workload against a
    file manifest's per-file min/max statistics and report, per
    (layout, predicate), how many files a stats-aware reader would
    SKIP without opening them — the number that decides whether a
    100 TB scan touches 100 TB or 1 TB.

    A file is *hit* by ``[lo, hi]`` iff its envelope overlaps:
    ``NOT (max < lo OR min > hi)`` — the exact test parquet readers
    (and Delta/Iceberg data skipping) apply to row-group / file
    statistics.  ``rows_bound`` is the upper bound on rows read (sum
    of hit files' row counts): the honest cost model for a layout,
    since a reader cannot skip inside a hit file without page stats.

    Run it on candidate layouts side by side (hash-scattered vs
    key-sorted vs predicate-column-sorted manifests) before choosing
    a table's clustering: the layout whose ``skip_frac`` stays near 1
    under the real workload is the one to ship.

    Scale shape: the manifest is metadata (one row per file — a 100 TB
    table is ~10^5 files), the workload is tiny and broadcast, so the
    audit is a broadcast nested-loop over metadata only — it never
    touches the data files themselves.  Integer column algebra
    throughout; the single ratio is a ratio of integers rounded at 6.
    """
    parts = [F.col(c) for c in layout_cols]
    joined = file_stats.join(F.broadcast(predicates))
    hit = ~(
        (F.col(max_col) < F.col(lo_col))
        | (F.col(min_col) > F.col(hi_col))
    )
    return (
        joined.withColumn("__hit", hit.cast("long"))
        .groupBy(*parts, F.col(pred_id_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.sum("__hit").cast("long").alias("files_hit"),
            F.round(
                F.lit(1.0)
                - F.sum("__hit").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("skip_frac"),
            F.sum(
                F.col("__hit") * F.col(rows_col).cast("long")
            ).cast("long").alias("rows_bound"),
        )
    )


def _bloom_bits(col: Column, m_bits: int, k_hashes: int, salt: str) -> Column:
    from .sketch import _hash64  # local import, no cycle

    return F.array(
        *[
            (_hash64(col.cast("string"), f"{salt}{i}") % int(m_bits))
            .cast("long")
            for i in range(int(k_hashes))
        ]
    )


def bloom_build(
    df: DataFrame,
    file_col: str,
    key_col: str,
    *,
    m_bits: int = 1024,
    k_hashes: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Per-file Bloom filters as ``(file, word, bloom)`` 32-bit-word
    rows (bit ``md5(salt+i : key) % m``, ``bit_or`` packed) — the
    construction half of :func:`bloom_skip_audit`, exposed so
    incremental paths (cf. streaming.stateful.streaming_bloom_filter)
    can prove word-for-word agreement with the batch build."""
    word = F.expr("bit div 32")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))")
    return (
        df.select(
            F.col(file_col).alias("file"),
            F.explode(
                _bloom_bits(F.col(key_col), m_bits, k_hashes, salt)
            ).alias("bit"),
        )
        .select("file", word.alias("word"), mask.alias("mask"))
        .groupBy("file", "word")
        .agg(F.bit_or("mask").alias("bloom"))
    )


def bloom_skip_audit(
    df: DataFrame,
    file_col: str,
    key_col: str,
    probes: DataFrame,
    *,
    probe_col: str = "probe_key",
    m_bits: int = 1024,
    k_hashes: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """File-level Bloom-filter skipping audit — the point-lookup
    companion to :func:`zone_map_skip_audit`: zone maps prune RANGE
    predicates, but an equality probe on a high-cardinality column
    (user id, join key) hits every file whose min/max straddles it;
    per-file Bloom filters (Parquet bloom_filter columns, Delta
    BLOOMFILTER indexes) are the structure that skips those.

    Builds one *m_bits*-bit filter per file (bit positions
    ``md5(salt+i : key) % m``, *k_hashes* probes, stored as 32-bit
    words under ``bit_or`` — shifts stay < 32 so the word algebra is
    portable), then replays a probe-key workload: a file is a MAYBE
    only when all k bits are set, and joining truth back in splits
    maybes into genuine hits and false positives — the measured FPR
    at this (m, k, rows/file) before you pay to write the filters.

    Scale shape: filter construction is one explode (k rows per data
    row) into a (file, word) ``bit_or`` aggregate — map-side
    combinable integers; the replay is (probes x files) against
    metadata only.  Everything is integer-exact.

    Returns one row per probe: ``(probe_key, files_total,
    files_actual, files_maybe, files_skipped, fp_files, skip_frac)``.
    """
    kf = int(k_hashes)
    fb = bloom_build(
        df, file_col, key_col, m_bits=m_bits, k_hashes=kf, salt=salt
    )
    files = fb.select("file").distinct()
    word = F.expr("bit div 32")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))")
    # distinct up front: duplicate probe rows would multiply the bit
    # rows, breaking both the sum(__bit_set)==k membership test and the
    # downstream per-probe file counts
    pb = (
        probes.select(F.col(probe_col).alias("probe_key"))
        .distinct()
        .select(
            "probe_key",
            F.explode(
                _bloom_bits(F.col("probe_key"), m_bits, kf, salt)
            ).alias("bit"),
        )
        .select("probe_key", word.alias("word"), mask.alias("mask"))
    )
    cand = files.crossJoin(F.broadcast(pb))
    hit = cand.join(fb, ["file", "word"], "left").withColumn(
        "__bit_set",
        (
            F.col("bloom").isNotNull()
            & (
                F.expr("bloom & mask") == F.col("mask")
            )
        ).cast("long"),
    )
    per_pf = hit.groupBy("probe_key", "file").agg(
        (F.sum("__bit_set") == F.lit(kf)).cast("long").alias("maybe")
    )
    truth = (
        df.select(
            F.col(file_col).alias("file"),
            F.col(key_col).alias("probe_key"),
        )
        .distinct()
        .withColumn("actual", F.lit(1).cast("long"))
    )
    # per_pf already carries exactly the (deduped) probe keys — no
    # re-join against the raw probes frame (duplicate probe_key rows
    # there would multiply per-file rows and inflate every count)
    joined = per_pf.join(truth, ["probe_key", "file"], "left")
    return (
        joined.groupBy("probe_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.sum(F.coalesce(F.col("actual"), F.lit(0)))
            .cast("long")
            .alias("files_actual"),
            F.sum("maybe").cast("long").alias("files_maybe"),
            (F.count(F.lit(1)) - F.sum("maybe"))
            .cast("long")
            .alias("files_skipped"),
            F.sum(
                F.when(
                    (F.col("maybe") == 1)
                    & F.col("actual").isNull(),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("fp_files"),
            F.round(
                (
                    F.count(F.lit(1)).cast("double")
                    - F.sum("maybe").cast("double")
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("skip_frac"),
        )
    )


def delta_compression_audit(
    df: DataFrame,
    *,
    entity_col: str,
    t_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Gorilla-style TSDB compression audit per series (Pelkonen et
    al., VLDB 2015): how many bits would delta and delta-of-delta
    encoding spend on this series vs raw 64-bit storage?  Values
    quantize to integers at *scale* (matching the store's actual
    resolution), then per timestep

        ``bits(x) = 1              if x = 0   (the '0' control bit)
                  = msb(zigzag(x)) + 2  otherwise``

    with ``msb`` taken from the EXACT binary-string length
    (``length(bin(n))`` — integer algebra, no libm log2 anywhere),
    zigzag folding signs the way protobuf/Gorilla do.  The verdict
    column picks the cheapest encoding per series — the "should this
    metric family use DoD" input to a storage plan, sibling to the
    zone-map and compaction audits in this module.

    One entity-keyed lag window, integer-exact sums.

    Output: ``(entity, n_points, raw_bits, delta_bits, dod_bits,
    best_encoding, savings_pct)`` ordered by entity.
    """
    if scale < 1:
        raise ValueError("delta_compression_audit: scale must be >= 1")
    w = Window.partitionBy("e").orderBy("o")
    base = (
        df.select(
            F.col(entity_col).cast("string").alias("e"),
            F.col(t_col).alias("o"),
            F.round(F.col(value_col).cast("double") * F.lit(int(scale)))
            .cast("long")
            .alias("v"),
        )
        .where(F.col("o").isNotNull() & F.col("v").isNotNull())
        .withColumn("d1", F.col("v") - F.lag("v").over(w))
        .withColumn("d2", F.col("d1") - F.lag("d1").over(w))
    )

    def zz(c):
        # zigzag: 2x for x>=0, -2x-1 for x<0 — exact long algebra
        return F.when(c >= 0, c * 2).otherwise(-c * 2 - 1)

    def bits(c):
        # NULL (no predecessor) -> stored raw: 64 bits
        return F.when(c.isNull(), F.lit(64)).otherwise(
            F.when(c == 0, F.lit(1)).otherwise(
                F.length(F.bin(zz(c))) + F.lit(2)
            )
        )

    agg = base.groupBy("e").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        (F.count(F.lit(1)) * 64).cast("long").alias("raw_bits"),
        F.sum(bits(F.col("d1"))).cast("long").alias("delta_bits"),
        F.sum(bits(F.col("d2"))).cast("long").alias("dod_bits"),
    )
    best = (
        F.when(
            (F.col("dod_bits") <= F.col("delta_bits"))
            & (F.col("dod_bits") <= F.col("raw_bits")),
            F.lit("delta_of_delta"),
        )
        .when(F.col("delta_bits") <= F.col("raw_bits"), F.lit("delta"))
        .otherwise(F.lit("raw"))
    )
    mn = F.least("raw_bits", "delta_bits", "dod_bits")
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        F.col("e").alias("entity"),
        "n_points", "raw_bits", "delta_bits", "dod_bits",
        best.alias("best_encoding"),
        r6(
            (F.col("raw_bits") - mn).cast("double")
            / F.col("raw_bits").cast("double")
        ).alias("savings_pct"),
    ).orderBy("entity")


def roaring_container_census(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Roaring-bitmap container planning per group (Chambi, Lemire
    et al. 2016): partition each group's distinct 32-bit ids into
    2¹⁶-value containers and, per container, pick the cheapest
    physical representation by the ACTUAL serialized sizes

        ``array  = 2·n`` bytes (16-bit values, n ≤ 4096 only)
        ``bitmap = 8192`` bytes
        ``run    = 2 + 4·runs`` bytes

    (runs counted exactly via an id-ordered lag within the
    container).  The census answers "what will this id set cost as a
    roaring index, and which containers are run-friendly" — the
    bitmap-index sibling of this module's zone-map/Bloom planning,
    and the audit behind choosing roaring vs Bloom for a semi-join
    column.  Ties in size break array > run > bitmap (roaring's own
    preference for the static form).

    Integer-exact throughout; windows key on (group, container).

    Output: ``(group, n_ids, n_containers, n_array, n_bitmap, n_run,
    roaring_bytes, naive_bytes, compression_ratio)`` ordered by
    group.
    """
    base = (
        df.select(
            F.col(group_col).cast("string").alias("g"),
            F.col(id_col).cast("long").alias("i"),
        )
        .where(F.col("i").isNotNull() & (F.col("i") >= 0))
        .distinct()
        .withColumn("c", (F.col("i") / F.lit(65536)).cast("long"))
    )
    w = Window.partitionBy("g", "c").orderBy("i")
    runs = base.withColumn(
        "newrun",
        F.when(
            F.lag("i").over(w).isNull()
            | (F.lag("i").over(w) != F.col("i") - 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    per_c = runs.groupBy("g", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("newrun").cast("long").alias("nr"),
    )
    sz_array = F.when(F.col("n") <= 4096, F.col("n") * 2)
    sz_bitmap = F.lit(8192)
    sz_run = F.lit(2) + F.col("nr") * 4
    best_sz = F.least(
        F.coalesce(sz_array, F.lit(1 << 30)), sz_bitmap, sz_run
    )
    cls = (
        F.when(F.coalesce(sz_array, F.lit(1 << 30)) == best_sz,
               F.lit("array"))
        .when(sz_run == best_sz, F.lit("run"))
        .otherwise(F.lit("bitmap"))
    )
    sized = per_c.select(
        "g", "n", best_sz.alias("bytes"), cls.alias("cls")
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    agg = sized.groupBy("g").agg(
        F.sum("n").cast("long").alias("n_ids"),
        F.count(F.lit(1)).cast("long").alias("n_containers"),
        F.count(F.when(F.col("cls") == "array", 1))
        .cast("long")
        .alias("n_array"),
        F.count(F.when(F.col("cls") == "bitmap", 1))
        .cast("long")
        .alias("n_bitmap"),
        F.count(F.when(F.col("cls") == "run", 1))
        .cast("long")
        .alias("n_run"),
        F.sum("bytes").cast("long").alias("roaring_bytes"),
    )
    return agg.select(
        F.col("g").alias("group"),
        "n_ids", "n_containers", "n_array", "n_bitmap", "n_run",
        "roaring_bytes",
        (F.col("n_ids") * 4).alias("naive_bytes"),
        r6(
            (F.col("n_ids") * 4).cast("double")
            / F.col("roaring_bytes").cast("double")
        ).alias("compression_ratio"),
    ).orderBy("group")


def rendezvous_reshard_audit(
    df: DataFrame,
    key_col: str,
    *,
    shards_before: int,
    shards_after: int,
    salt: str = "hrw",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment audit
    (Thaler & Ravishankar 1998 — the consistent-placement scheme
    behind cache/shard routing): each key goes to the shard with the
    highest ``md5(salt:key:shard)`` weight, so growing the ring from
    *shards_before* to *shards_after* moves ONLY the keys whose new
    winner is one of the added shards (expected n·(after−before)/after
    — the minimal-disruption property this audit MEASURES instead of
    assuming; contrast hash-mod partitioning, which moves ~all keys).

    Declarative shape: distinct keys explode over the after-ring once
    (bounded ×shards_after), ONE groupBy(key) picks both argmax
    assignments via ``max_by`` on a total (weight, −shard) order, one
    bounded per-shard rollup.  The md5 weight rule is engine-portable
    (the ``uniform_hash01`` idiom), so the oracle replays assignments
    exactly.

    Output, one row per after-shard: ``n_before`` (keys routed here
    under the old ring; 0 for new shards), ``n_after``, ``gained``,
    ``lost``, ``stayed``.
    """
    kb, ka = int(shards_before), int(shards_after)
    if not 1 <= kb <= ka:
        raise ValueError(
            "rendezvous_reshard_audit: need 1 <= shards_before <= "
            "shards_after"
        )
    if ka > 128:
        # the tie-fold below packs the shard id under a 56-bit md5
        # weight: 2^56 * 128 + 127 is exactly long-max, so 128 shards
        # is the largest ring the single-long total order supports
        raise ValueError(
            "rendezvous_reshard_audit: shards_after must be <= 128 "
            "(56-bit weight x shard tie-fold overflows a long beyond)"
        )
    fold = 16
    while fold < ka:
        fold *= 2
    keys = df.select(
        F.col(key_col).cast("long").alias("k")
    ).where(F.col("k").isNotNull()).distinct()
    cand = keys.select(
        "k",
        F.explode(
            F.sequence(F.lit(0), F.lit(ka - 1))
        ).alias("s"),
    ).withColumn(
        # 56-bit md5 weight with the shard id folded into the low
        # bits as a total tie order (weight desc, shard asc) — the
        # fold width is the next power of two >= shards_after (min
        # 16), so ids never collide or go negative; portable to the
        # oracle without struct-ordered argmax
        "w",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("k"), F.col("s")
                    )
                ),
                1,
                14,
            ),
            16,
            10,
        ).cast("long")
        * fold
        + (F.lit(fold - 1) - F.col("s")),
    )
    assign = cand.groupBy("k").agg(
        F.max_by(F.col("s"), F.col("w")).alias("after"),
        F.max_by(
            F.when(F.col("s") < kb, F.col("s")),
            F.when(F.col("s") < kb, F.col("w")),
        ).alias("before"),
    )
    shards = df.sparkSession.range(ka).select(
        F.col("id").cast("long").alias("shard")
    )
    per_after = assign.groupBy(F.col("after").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum(
            F.when(F.col("before") != F.col("after"), 1).otherwise(0)
        ).cast("long").alias("gained"),
        F.sum(
            F.when(F.col("before") == F.col("after"), 1).otherwise(0)
        ).cast("long").alias("stayed"),
    )
    per_before = assign.groupBy(F.col("before").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(
            F.when(F.col("before") != F.col("after"), 1).otherwise(0)
        ).cast("long").alias("lost"),
    )
    return (
        shards.join(F.broadcast(per_before), on="shard", how="left")
        .join(F.broadcast(per_after), on="shard", how="left")
        .select(
            "shard",
            F.coalesce("n_before", F.lit(0)).alias("n_before"),
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
            F.coalesce("gained", F.lit(0)).alias("gained"),
            F.coalesce("lost", F.lit(0)).alias("lost"),
            F.coalesce("stayed", F.lit(0)).alias("stayed"),
        )
        .orderBy("shard")
    )


def merkle_tree(
    df: DataFrame,
    key_col: str,
    value_cols: "Sequence[str]",
    *,
    n_leaves: int = 64,
    fanout: int = 4,
    salt: str = "mrk",
) -> DataFrame:
    """Merkle digest tree over a keyed table — the anti-entropy /
    snapshot-integrity primitive (Merkle 1987; the Cassandra-repair /
    rsync construction): rows land in ``key % n_leaves`` buckets
    whose digest is the XOR of per-row md5 digests (XOR is
    commutative, so the leaf is order- and partitioning-insensitive
    with NO sort), and each parent hashes its children's digests in
    index order, up to a single root.  Comparing two snapshots' trees
    localizes every difference to its leaf in O(log) node
    comparisons instead of a full-table diff — the 100 TB story is
    one scan per snapshot plus metadata-sized tree algebra.

    Output: ``(level, idx, digest)`` for every node; level 0 = leaves
    (absent buckets carry digest '0'), the root at the top level.
    """
    import math

    nl, fo = int(n_leaves), int(fanout)
    if nl < 1 or fo < 2:
        raise ValueError("merkle_tree: need n_leaves >= 1, fanout >= 2")
    row_digest = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(salt),
                    F.col(key_col).cast("string"),
                    *[F.col(c).cast("string") for c in value_cols],
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    leaves = (
        df.select(
            (F.col(key_col).cast("long") % nl).alias("idx"),
            row_digest.alias("h"),
        )
        .groupBy("idx")
        .agg(F.expr("bit_xor(h)").alias("hx"))
    )
    spark = df.sparkSession
    all_leaves = (
        spark.range(nl)
        .select(F.col("id").alias("idx"))
        .join(F.broadcast(leaves), on="idx", how="left")
        .select(
            F.lit(0).alias("level"),
            F.col("idx").cast("long").alias("idx"),
            F.coalesce(F.col("hx").cast("string"), F.lit("0")).alias(
                "digest"
            ),
        )
    )
    levels = [all_leaves]
    width = nl
    lvl = 0
    while width > 1:
        width = math.ceil(width / fo)
        lvl += 1
        child = levels[-1]
        parent = (
            child.groupBy(
                (F.col("idx") / fo).cast("long").alias("idx")
            )
            .agg(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.sort_array(
                                    F.collect_list(
                                        F.struct("idx", "digest")
                                    )
                                ),
                                lambda s: s["digest"],
                            ),
                        )
                    ),
                    1,
                    16,
                ).alias("digest")
            )
            .select(
                F.lit(lvl).alias("level"),
                F.col("idx"),
                "digest",
            )
        )
        levels.append(parent)
    out = levels[0]
    for p in levels[1:]:
        out = out.unionByName(p)
    return out.orderBy("level", "idx")
