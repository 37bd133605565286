"""Shared demo inputs."""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession


def demo_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[4]")
        .appName("fame2pygen_spark-examples")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def monthly_frame(spark: SparkSession, months: int = 36) -> DataFrame:
    rows = []
    for i in range(months):
        d = date(2019 + i // 12, i % 12 + 1, 1)
        rows.append((d, 100.0 + 3.0 * i, 50.0 + (i * 7) % 23))
    return spark.createDataFrame(rows, "DATE date, MONTHLY_GDP double, CPI double")
