"""Choosing a table layout BEFORE writing 100 TB — the data-skipping
measurements chained in decision order:

1. Zone-map skip audit (x278) — replay the range-predicate workload
   against per-file min/max manifests of the candidate layouts
   (hash-scattered vs predicate-column-clustered).  The layout whose
   skip fraction stays near 1 wins the RANGE workload.
2. Bloom skip audit (x289) — range stats cannot prune equality probes
   on a high-cardinality column; measure what per-file Bloom filters
   (m bits, k hashes) buy, including the realized false-positive
   file count, before paying the filter-write cost.
3. Compaction plan (x105) — whatever layout wins, small files erase
   the benefit: group the manifest back into ~target-size objects.
4. The decision: cluster column, bloom column, compaction groups —
   printed as a one-row verdict.

Run standalone: ``python examples/storage_planning.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fame2pygen_spark.operators.layout import (
    bloom_skip_audit, compaction_plan, zone_map_skip_audit,
)


def _manifest(spark: SparkSession) -> DataFrame:
    # 10k fact rows: day 0..99, user 0..499; files = 32 per layout
    return spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("day"),
        ((F.col("id") * 131) % 500).alias("user_id"),
        F.col("id").alias("rowid"),
    )


def main(spark: SparkSession) -> DataFrame:
    fact = _manifest(spark)

    # 1. candidate layouts -> per-file min/max(day) stats
    tagged = fact.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hash").alias("layout"),
                    (F.col("rowid") % 32).alias("file"),
                ),
                F.struct(
                    F.lit("day").alias("layout"),
                    (F.col("day") * 32 / 100).cast("long").alias("file"),
                ),
            )
        ).alias("lf"),
        "day",
    ).select("lf.layout", "lf.file", "day")
    stats = tagged.groupBy("layout", "file").agg(
        F.min("day").alias("min_v"),
        F.max("day").alias("max_v"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    preds = spark.createDataFrame(
        [(i, 10 * i, 10 * i + 9) for i in range(10)],
        "pred_id long, lo long, hi long",
    )
    zm = zone_map_skip_audit(stats, preds)
    per_layout = (
        zm.groupBy("layout")
        .agg(F.round(F.avg("skip_frac"), 3).alias("avg_skip"))
        .collect()
    )
    skips = {r["layout"]: r["avg_skip"] for r in per_layout}
    print(f"1. zone maps: avg skip_frac by layout = {skips}")

    # 2. equality probes on user_id: zone maps are blind, blooms not
    day_files = fact.select(
        (F.col("day") * 32 / 100).cast("long").alias("file"), "user_id"
    )
    probes = spark.createDataFrame(
        [(7,), (123,), (999_999,)], "probe_key long"
    )
    bl = bloom_skip_audit(
        day_files, "file", "user_id", probes, m_bits=4096, k_hashes=3
    ).collect()
    for r in sorted(bl, key=lambda r: r["probe_key"]):
        print(
            f"2. bloom probe {r['probe_key']}: maybe {r['files_maybe']}"
            f"/{r['files_total']} files (actual {r['files_actual']},"
            f" fp {r['fp_files']}, skip {r['skip_frac']})"
        )

    # 3. compact the winning layout's manifest to ~1200-row objects
    groups = compaction_plan(
        stats.where(F.col("layout") == "day").select(
            "file", F.col("n_rows").alias("bytes")
        ),
        partition_cols=[],
        file_col="file",
        size_col="bytes",
        target_size=1200,
    )
    n_groups = groups.count()
    print(f"3. compaction: 32 day-files -> {n_groups} target-size groups")

    best = max(skips, key=skips.get)
    print(f"4. verdict: cluster by day ({best} layout wins), bloom on"
          " user_id, compact to target-size objects")
    return spark.createDataFrame(
        [(best, float(skips[best]), int(n_groups))],
        "cluster_layout string, avg_skip double, n_compaction_groups long",
    )


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("storage_planning")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    main(spark).show(truncate=False)
    spark.stop()
