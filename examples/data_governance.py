"""Data-governance pass over a toy customer snapshot — the round-3
warehouse-infrastructure operators chained the way a nightly
governance job would run them: declarative quality expectations, CDC
snapshot maintenance, a k-anonymity release gate, and a compaction
plan for the table's file layout.

Run standalone: ``python examples/data_governance.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _snapshot(spark: SparkSession) -> DataFrame:
    rows = [
        (i, float((i * 17) % 900) - 50.0, ["gold", "silver", "bronze"][i % 3],
         i % 7)
        for i in range(600)
    ]
    return spark.createDataFrame(
        rows, "cust_id long, balance double, tier string, region int"
    )


def _changelog(spark: SparkSession) -> DataFrame:
    rows = []
    for i in range(0, 600, 3):  # every third customer has changes
        rows.append((i, 1, "U", float(i % 500), "gold"))
        if i % 30 == 0:  # some get a later delete
            rows.append((i, 2, "D", 0.0, "gold"))
    return spark.createDataFrame(
        rows, "cust_id long, seq long, op string, balance double, tier string"
    )


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.layout import compaction_plan
    from fame2pygen_spark.operators.quality import (
        dq_report, k_anonymity, standard_rules,
    )
    from fame2pygen_spark.operators.temporal import cdc_apply

    snap = _snapshot(spark)

    # 1. quality gate: N expectations, ONE scan
    rules = standard_rules(
        not_null=["balance"],
        domains={"tier": ["gold", "silver", "bronze"]},
    )
    rules["balance_not_negative"] = (
        F.lit(True),
        F.coalesce(F.col("balance") < 0, F.lit(True)),
    )
    report = dq_report(snap, rules)

    # 2. apply the day's CDC changelog (latest-wins upsert/delete)
    current = cdc_apply(
        snap.select("cust_id", "balance", "tier"),
        _changelog(spark),
        key_cols=["cust_id"],
        val_cols=["balance", "tier"],
        op_col="op",
        seq_cols=["seq"],
    )

    # 3. privacy release gate on the maintained snapshot
    anon = k_anonymity(
        current.join(snap.select("cust_id", "region"), "cust_id"),
        ["tier", "region"],
        k=5,
    )
    n_at_risk = (
        anon.where("violates_k")
        .agg(F.coalesce(F.sum("group_size"), F.lit(0)))
        .first()[0]
    )

    # 4. file-layout maintenance: plan compaction groups from the
    #    table's (simulated) file metadata
    files = current.groupBy(
        "tier", (F.col("cust_id") % 20).alias("file_id")
    ).agg((F.count("*") * 1024).cast("long").alias("size_bytes"))
    plan = compaction_plan(
        files,
        partition_cols=["tier"],
        file_col="file_id",
        size_col="size_bytes",
        target_size=8192,
    )

    print("quality report:")
    report.show(truncate=False)
    print(f"rows in QI groups below k=5: {n_at_risk}")
    print("compaction plan:")
    plan.show()
    return report


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        main(spark)
    finally:
        spark.stop()
