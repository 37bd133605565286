"""Round-3 extension queries (x72+): additional large-scale
training-data-pipeline operators, each with a full-mechanism DuckDB
oracle, registered after the driver-checked first-50 window.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is a
``(spark, sf_dir) -> DataFrame`` callable whose column names/types
match its ANSI-SQL oracle exactly (the driver's compare is an exact
stringified value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import dedup as dd


# --------------------------------------- x72: prefix-filtered Jaccard join


def q_x72_prefix_jaccard(spark, sf_dir):
    """Exact global set-similarity self-join with AllPairs prefix
    filtering (operators/dedup.py:prefix_jaccard_join) — the
    deterministic, zero-recall-loss counterpart to the probabilistic
    MinHash-LSH (x03) and SimHash (x04) paths.  The oracle is the
    brute-force O(n^2) pairwise Jaccard, which the prefix join must
    reproduce exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dd.prefix_jaccard_join(
        docs, "text", "doc_id", n=3, threshold=0.35
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


SQL_X72 = """
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 0) + 1),
           i -> toks[CAST(i AS INTEGER)] || ' ' ||
                toks[CAST(i AS INTEGER) + 1] || ' ' ||
                toks[CAST(i AS INTEGER) + 2])) AS ng
  FROM (
    SELECT doc_id,
           list_filter(string_split(
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
             t -> t <> '') AS toks
    FROM documents
  )
), gg AS (
  SELECT doc_id, ng FROM g WHERE len(ng) > 0
)
SELECT CAST(a.doc_id AS BIGINT) AS id_a,
       CAST(b.doc_id AS BIGINT) AS id_b,
       ROUND(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
             / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
             6) AS jaccard
FROM gg a JOIN gg b ON a.doc_id < b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
            / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
            6) >= 0.35
"""


EXT2_QUERIES = {
    "x72_prefix_jaccard": q_x72_prefix_jaccard,
}

EXT2_ORACLES = {
    "x72_prefix_jaccard": SQL_X72,
}
