"""Sink-side behavior: partitioned layout, partition pruning, dynamic
partition overwrite, and ORC interchange.

A 100 TB table lives or dies by its write layout: hive-partitioned
directories mean a predicate on the partition column prunes at the
FILE LISTING level (never opens the files), and dynamic overwrite
makes daily re-loads idempotent per partition instead of
truncate-and-reload.  These tests pin that the engine's output is
laid out so those mechanisms actually engage.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_at_listing_level(spark, tmp_path):
    src = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("pk"),
        (F.col("id") * 2.0).alias("v"),
    )
    path = str(tmp_path / "ptable")
    src.write.partitionBy("pk").parquet(path)

    back = spark.read.parquet(path)
    q = back.where(F.col("pk") == "2")
    plan = _plan(q)
    # the predicate must appear as a partition filter (listing-level
    # prune), NOT as a data filter evaluated per row
    assert "PartitionFilters" in plan
    assert "pk" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert q.count() == 250


def test_dynamic_partition_overwrite_is_per_partition(spark, tmp_path):
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "dynamic"
    )
    try:
        path = str(tmp_path / "dyn")
        day1 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, pk string"
        )
        day1.write.partitionBy("pk").parquet(path)
        # overwrite ONLY partition a; b must survive
        fix = spark.createDataFrame([(99, "a")], "id long, pk string")
        fix.write.mode("overwrite").partitionBy("pk").parquet(path)
        rows = {
            (r["pk"], r["id"])
            for r in spark.read.parquet(path).collect()
        }
        assert rows == {("a", 99), ("b", 2)}
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


def test_orc_round_trip_preserves_values(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "x", 1.5, [0.25, 0.5]), (2, None, -2.0, [])],
        "id long, s string, v double, a array<double>",
    )
    path = str(tmp_path / "orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert sorted(back.collect()) == sorted(src.collect())
    # ORC scans still push predicates
    plan = _plan(back.where(F.col("id") == 2))
    assert "PushedFilters" in plan


def test_range_partitioned_write_bounds_file_count(spark, tmp_path):
    import os

    src = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    path = str(tmp_path / "ranged")
    src.repartitionByRange(4, "id").write.parquet(path)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 4
    # range partitioning means file min/max id ranges are disjoint ->
    # a range predicate touches a subset of files via rowgroup stats
    back = spark.read.parquet(path).where(F.col("id") < 2500)
    assert back.count() == 2500


def test_idempotent_batch_writer_replay_safe(spark, tmp_path):
    """Replaying a batch id (foreachBatch at-least-once) must REPLACE
    its partition, not append — and other batches stay untouched."""
    from fame2pygen_spark.streaming.sinks import idempotent_batch_writer

    path = str(tmp_path / "sink")
    write = idempotent_batch_writer(path)

    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b1 = spark.createDataFrame([(3, "c")], "id long, v string")
    write(b0, 0)
    write(b1, 1)
    assert spark.read.parquet(path).count() == 3

    # replay batch 0 — same id, possibly different physical attempt
    write(b0, 0)
    got = spark.read.parquet(path)
    assert got.count() == 3  # NOT 5: replay replaced, never appended
    assert sorted(
        r["batch"] for r in got.select("batch").distinct().collect()
    ) == [0, 1]

    # replay with a CHANGED recomputation still converges to one copy
    b0_fixed = spark.createDataFrame([(1, "a2")], "id long, v string")
    write(b0_fixed, 0)
    got2 = spark.read.parquet(path)
    assert got2.where("batch = 0").count() == 1
    assert got2.where("batch = 1").count() == 1
