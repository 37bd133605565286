"""Parquet sources for the driver's TPC-H-ish star schema + helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; column pruning and predicate pushdown reach the
    parquet scan because this returns the raw reader output."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def wide_ts_frame(
    df: DataFrame,
    date_expr,
    measures: dict[str, object],
    *,
    date_col: str = "DATE",
) -> DataFrame:
    """Project an event/fact table into the engine's wide TS frame:
    one row per period, one column per series (SURVEY §1.1)."""
    return df.groupBy(F.to_date(date_expr).alias(date_col)).agg(
        *[m.alias(name) for name, m in measures.items()]
    )


def write_parquet(df: DataFrame, path: str, *, partition_by=None, mode="overwrite"):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
