"""Portable Bloom-filter semi-join pre-filtering.

The 100 TB situation: a fact table joins a tiny dimension subset, and
most fact rows will not match — but the fact side must still be fully
shuffled (or at least scanned into the join) to find out.  Engines
solve this with runtime Bloom filters (Spark's
``spark.sql.optimizer.runtime.bloomFilter.enabled``); this module
builds the same mechanism from engine-portable column algebra (the
md5 hash family every oracle-checked sketch here uses), so the filter
itself is verifiable value-for-value by an external engine.

Representation: instead of packed bit words, the filter is the SET of
set-bit positions (``k * |keys|`` distinct ints at most — broadcast
sized precisely when a Bloom filter is the right tool).  Membership
is "all k probe positions present", semantically identical to the
packed form, with zero false negatives by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sketch import _hash64


def bloom_positions(
    small: DataFrame,
    key_col: str,
    *,
    m: int = 1024,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """The filter: distinct hash positions of the small side's keys
    (``k`` md5-derived positions per key in ``[0, m)``)."""
    probes = F.array(
        *[
            (_hash64(F.col(key_col), f"{salt}:{i}") % m).cast("int")
            for i in range(k)
        ]
    )
    return (
        small.select(F.explode(probes).alias("pos")).distinct()
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    *,
    big_key: str,
    small_key: str,
    id_cols: list[str],
    m: int = 1024,
    k: int = 3,
    salt: str = "bloom",
) -> tuple[DataFrame, DataFrame]:
    """Bloom-prefiltered exact semi-join: returns ``(candidates,
    matches)`` — *candidates* are big-side rows passing the Bloom
    membership test (every true match plus a deterministic, bounded
    set of false positives), *matches* is the exact semi-join of the
    candidates against the small side.

    Scale shape: the filter is built by one tiny aggregation and
    broadcast; the membership test is an explode(k) + broadcast join +
    count==k — map-side work that eliminates the non-matching bulk of
    the fact table BEFORE the real join shuffles anything.  False
    positives cost only wasted candidate rows, never wrong answers —
    the exact join removes them.
    """
    positions = bloom_positions(small, small_key, m=m, k=k, salt=salt)
    probes = F.array(
        *[
            (_hash64(F.col(big_key), f"{salt}:{i}") % m).cast("int")
            for i in range(k)
        ]
    )
    probed = big.select(
        *id_cols,
        F.col(big_key).alias("__bk"),
        F.explode(F.array_distinct(probes)).alias("pos"),
    )
    # a key's k probes may collide with each other: require all of the
    # DISTINCT probe positions present, counting them per row
    probe_counts = big.select(
        *id_cols,
        F.col(big_key).alias("__bk"),
        F.size(F.array_distinct(probes)).alias("__np"),
    )
    hits = (
        probed.join(F.broadcast(positions), on="pos")
        .groupBy(*id_cols, "__bk")
        .agg(F.count("*").alias("__nhit"))
    )
    candidates = (
        probe_counts.join(hits, on=[*id_cols, "__bk"])
        .where(F.col("__nhit") == F.col("__np"))
        .select(*id_cols, F.col("__bk").alias(big_key))
    )
    small_keys = small.select(
        F.col(small_key).alias(big_key)
    ).distinct()
    matches = candidates.join(F.broadcast(small_keys), on=big_key)
    return candidates, matches


def bloom_fpr_audit(
    members: DataFrame,
    probes: DataFrame,
    member_key: str,
    probe_key: str,
    *,
    m: int = 1024,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Measured false-positive rate of the Bloom pre-filter against
    a DISJOINT probe population — the sizing audit run before
    ``bloom_semi_join`` ships: theory gives the fill-based estimate
    ``(bits_set/m)^k``; this measures the real thing on real keys, so
    an (m, k) choice is a measurement, not a formula guess.  At
    100 TB an under-sized filter silently turns the pre-filter into a
    pass-through and the join pays full freight — this is the gauge.

    True members are anti-joined out of the probe set first (a probe
    that IS a member is a true positive, not a false one), so the
    caller may pass overlapping populations.  The fill-based
    expectation multiplies k times instead of calling pow — exact in
    both engines.

    Scale shape: the filter build and the bits-set count are one tiny
    aggregation (broadcast); probing is the ``bloom_semi_join``
    explode(k) + broadcast-join + count==k shape over the probe set.

    Output: one row ``(m, k, n_members, bits_set, fill_ratio,
    n_probes, n_false_pos, fpr_measured, fpr_expected)`` (6 dp).
    """
    m, k = int(m), int(k)
    positions = bloom_positions(members, member_key, m=m, k=k, salt=salt)
    filt = positions.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("bits_set")
    )
    nm = (
        members.select(F.col(member_key).alias("__k"))
        .where(F.col("__k").isNotNull())
        .distinct()
        .groupBy()
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    )
    pr = (
        probes.select(F.col(probe_key).alias("__k"))
        .where(F.col("__k").isNotNull())
        .distinct()
        .join(
            members.select(F.col(member_key).alias("__k")).distinct(),
            "__k",
            "left_anti",
        )
    )
    probe_arr = F.array_distinct(
        F.array(
            *[
                (_hash64(F.col("__k"), f"{salt}:{i}") % m).cast("int")
                for i in range(k)
            ]
        )
    )
    probed = pr.select("__k", F.size(probe_arr).alias("__np"),
                       F.explode(probe_arr).alias("pos"))
    hits = (
        probed.join(F.broadcast(positions), on="pos")
        .groupBy("__k", "__np")
        .agg(F.count(F.lit(1)).alias("__nhit"))
    )
    fp = hits.where(F.col("__nhit") == F.col("__np")).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_false_pos")
    )
    n_probes = pr.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_probes")
    )
    out = (
        nm.crossJoin(F.broadcast(filt))
        .crossJoin(F.broadcast(n_probes))
        .crossJoin(F.broadcast(fp))
    )
    fill = F.col("bits_set").cast("double") / F.lit(float(m))
    expected = fill
    for _ in range(k - 1):
        expected = expected * fill
    return out.select(
        F.lit(m).cast("long").alias("m"),
        F.lit(k).cast("long").alias("k"),
        "n_members",
        "bits_set",
        F.round(fill, 6).alias("fill_ratio"),
        "n_probes",
        F.coalesce(F.col("n_false_pos"), F.lit(0)).alias("n_false_pos"),
        F.round(
            F.try_divide(
                F.coalesce(F.col("n_false_pos"), F.lit(0)).cast("double"),
                F.col("n_probes").cast("double"),
            ),
            6,
        ).alias("fpr_measured"),
        F.round(expected, 6).alias("fpr_expected"),
    )
