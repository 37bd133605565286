"""Round-6 extension queries (x248+): join planning and factorization
— AMS tug-of-war join-size estimation, an ALS recommendation
superstep, k-means|| oversampling, Mantel–Haenszel stratified odds,
Kneser–Ney continuation counts, and signed feature hashing.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_ext import _read_events

EXT11_QUERIES: dict = {}
EXT11_ORACLES: dict = {}


# ----------------------------- x248: AMS join-size estimate


def q_x248_ams_join_size(spark, sf_dir):
    """Pre-flight |orders ⋈ lineitem| gauge (operators/sketch.py:
    ams_join_size) — nine ±1 tug-of-war counters per side, median of
    the per-row products, with the exact distinct-key-count join as
    the realized-error check at this SF."""
    from .operators.sketch import ams_join_size

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return ams_join_size(orders, "o_orderkey", lineitem, "l_orderkey", rows=9)


SQL_X248 = """
WITH rr AS (SELECT r FROM range(9) t(r)),
sa AS (
  SELECT r,
         SUM(1 - 2 * (('0x' || substr(md5('ams:' || CAST(r AS VARCHAR)
             || ':' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 2)) AS xa
  FROM orders CROSS JOIN rr WHERE o_orderkey IS NOT NULL GROUP BY r
),
sb AS (
  SELECT r,
         SUM(1 - 2 * (('0x' || substr(md5('ams:' || CAST(r AS VARCHAR)
             || ':' || CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT % 2)) AS xb
  FROM lineitem CROSS JOIN rr WHERE l_orderkey IS NOT NULL GROUP BY r
),
prod AS (
  SELECT CAST(CAST(xa AS DECIMAL(38,0)) * CAST(xb AS DECIMAL(38,0))
              AS DOUBLE) AS p
  FROM sa JOIN sb USING (r)
),
med AS (SELECT list_sort(list(p))[5] AS est FROM prod),
ca AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k, COUNT(*) AS na
  FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1
),
cb AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS k, COUNT(*) AS nb
  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
),
ex AS (SELECT CAST(SUM(na * nb) AS BIGINT) AS exact FROM ca JOIN cb USING (k))
SELECT CAST(9 AS BIGINT) AS rows,
       est AS est_join_size,
       exact AS exact_join_size,
       ROUND((est - exact) / exact, 6) AS rel_err
FROM med CROSS JOIN ex
"""

EXT11_QUERIES.update({"x248_ams_join_size": q_x248_ams_join_size})
EXT11_ORACLES.update({"x248_ams_join_size": SQL_X248})
