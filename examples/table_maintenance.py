"""Warehouse table maintenance on a toy fact table — the engine-
infrastructure side of the repo: ANALYZE-style statistics (NDV/nulls,
equi-depth histogram, most-common values feed a CBO), Z-order
clustering (multi-dimensional scan pruning), and a Bloom-prefiltered
semi-join (runtime filter) — chained the way a nightly maintenance +
query job would run them.

Run standalone: ``python examples/table_maintenance.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _fact(spark: SparkSession) -> DataFrame:
    rows = [
        (i, i % 37, (i * 7) % 53, float((i * 13) % 997) / 10.0)
        for i in range(4000)
    ]
    return spark.createDataFrame(
        rows, "row_id long, part_id long, supp_id long, price double"
    )


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.bloom import bloom_semi_join
    from fame2pygen_spark.operators.layout import (
        cluster_by_zorder, zorder_extent_profile,
    )
    from fame2pygen_spark.operators.sketch import (
        equidepth_histogram, table_stats,
    )

    fact = _fact(spark)

    # 1. ANALYZE: per-column NDV/null statistics from one stacked scan
    stats = table_stats(
        fact,
        {
            "part_id": F.col("part_id"),
            "supp_id": F.col("supp_id"),
            "price": F.col("price").cast("decimal(28,6)"),
        },
    )

    # 2. selectivity histogram for the predicate column
    hist = equidepth_histogram(fact, "price", n_buckets=4)

    # 3. physical layout: cluster along the (part_id, supp_id) curve
    #    so min/max stats prune on BOTH columns
    clustered = cluster_by_zorder(
        fact, ["part_id", "supp_id"], bits=4, num_partitions=4
    )
    profile = zorder_extent_profile(fact, ["part_id", "supp_id"], bits=2)

    # 4. query time: Bloom runtime filter before the dimension join
    dim = spark.createDataFrame([(3,), (17,), (29,)], "part_id long")
    cand, matches = bloom_semi_join(
        fact, dim, big_key="part_id", small_key="part_id",
        id_cols=["row_id"],
    )

    # summarize each maintenance artifact into one report frame
    return (
        stats.select(
            F.lit("analyze").alias("artifact"),
            F.col("column").alias("detail"),
            F.col("est_distinct").alias("metric"),
        )
        .unionByName(
            hist.select(
                F.lit("histogram").alias("artifact"),
                F.col("bucket").cast("string").alias("detail"),
                F.col("n_rows").cast("double").alias("metric"),
            )
        )
        .unionByName(
            profile.groupBy().agg(
                F.lit("zorder").alias("artifact"),
                F.lit("mean_span_frac").alias("detail"),
                F.round(F.avg("span_frac_part_id"), 4).alias("metric"),
            )
        )
        .unionByName(
            cand.groupBy().agg(
                F.lit("bloom").alias("artifact"),
                F.lit("candidates").alias("detail"),
                F.count("*").cast("double").alias("metric"),
            )
        )
        .unionByName(
            matches.groupBy().agg(
                F.lit("bloom").alias("artifact"),
                F.lit("matches").alias("detail"),
                F.count("*").cast("double").alias("metric"),
            )
        )
        .orderBy("artifact", "detail")
    )


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from _data import demo_spark

    main(demo_spark()).show(30, truncate=False)
