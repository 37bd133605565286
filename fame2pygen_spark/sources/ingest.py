"""Raw-corpus ingestion: schema-enforced JSONL / CSV readers with
corrupt-record quarantine.

A 100 TB text corpus never arrives clean: truncated JSON lines,
mis-quoted CSV rows, schema drift.  Failing the job on row 10^11 is
not an option, and silently dropping rows is worse — the ingestion
contract here is PERMISSIVE parsing with every unparseable line
captured in a quarantine column, so the pipeline proceeds AND the
damage is measurable (and re-processable) afterwards.

Both readers return ``(good, bad)`` DataFrames: *good* rows match the
declared schema with the quarantine column dropped; *bad* rows carry
the raw offending line.  Counting *bad* is the data-quality metric a
production ingest reports per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(
        [*schema.fields, StructField(CORRUPT, StringType())]
    )


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSON-lines reader.

    PERMISSIVE mode parses what it can; rows that fail land in the
    quarantine column with the raw line preserved.  The declared
    schema is authoritative — extra fields in the data are ignored,
    missing fields are null (which is what lets old readers survive
    schema drift in a long-lived corpus).
    """
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .json(path)
    )
    # Spark requires caching/materialization before filtering on the
    # corrupt column of a JSON scan (referencing it alone is disallowed)
    df = df.cache()
    good = df.where(F.col(CORRUPT).isNull()).drop(CORRUPT)
    bad = df.where(F.col(CORRUPT).isNotNull()).select(
        F.col(CORRUPT).alias("raw_line")
    )
    return good, bad


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced CSV reader with the same quarantine contract."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    df = df.cache()
    good = df.where(F.col(CORRUPT).isNull()).drop(CORRUPT)
    bad = df.where(F.col(CORRUPT).isNotNull()).select(
        F.col(CORRUPT).alias("raw_line")
    )
    return good, bad
