"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant join cost is shuffling the fact table. Writing
both sides bucketed by the join key (same bucket count) lets Spark's
SortMergeJoin read bucket i of each side on the same task — the
Exchange disappears from the plan entirely. This module wraps the
saveAsTable bucketing API (bucket metadata only exists for catalog
tables, not bare parquet paths).

Usage::

    write_bucketed(orders, "orders_b", buckets=64, bucket_cols=["o_custkey"])
    write_bucketed(customer, "customer_b", buckets=64, bucket_cols=["c_custkey"])
    j = spark.table("orders_b").join(
        spark.table("customer_b"),
        F.col("o_custkey") == F.col("c_custkey"))
    # j's plan: SortMergeJoin with NO Exchange on either side
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist *df* as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally removes the Sort from
    SortMergeJoin — bucket files stream directly into the merge.
    """
    w = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left: str, right: str, on_left: str, on_right: str
) -> bool:
    """True when joining the two bucketed tables produces a plan with
    no Exchange on either input — the verification hook for tests and
    for auditing production layouts."""
    from pyspark.sql import functions as F

    j = spark.table(left).join(
        spark.table(right), F.col(on_left) == F.col(on_right)
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
