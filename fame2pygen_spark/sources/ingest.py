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


def extract_json_props(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    *,
    keep_raw: bool = False,
) -> DataFrame:
    """Typed extraction of scalar fields from a JSON string column.

    *fields* maps field name -> Spark SQL type (``{"k": "bigint"}``).
    One ``from_json`` per row parses the document ONCE for all fields
    (N ``get_json_object`` calls would re-parse N times); malformed
    JSON yields nulls for every field plus ``json_valid = false`` so
    damage is measurable, matching the quarantine contract of the
    readers above.

    Everything is JVM-side Catalyst (``JsonToStructs``) — no Python in
    the row path, so the extraction rides whole-stage codegen and is
    safe in a 100 TB scan.  Column pruning still applies to every
    other column; only *json_col* is materialized for parsing.
    """
    # PERMISSIVE from_json yields a struct of nulls for malformed
    # input, indistinguishable from valid-but-null fields — the
    # corrupt-record column disambiguates (same contract as the
    # quarantining readers above).
    schema = ", ".join(f"`{k}` {t}" for k, t in fields.items())
    schema += f", `{CORRUPT}` string"
    parsed = F.from_json(
        F.col(json_col),
        schema,
        {"columnNameOfCorruptRecord": CORRUPT},
    )
    out = df.withColumn("__p", parsed)
    for k in fields:
        out = out.withColumn(k, F.col(f"__p.{k}"))
    out = out.withColumn(
        "json_valid",
        F.col(json_col).isNotNull()
        & F.col(f"__p.{CORRUPT}").isNull(),
    ).drop("__p")
    if not keep_raw:
        out = out.drop(json_col)
    return out
