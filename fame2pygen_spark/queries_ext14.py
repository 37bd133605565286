"""Round-6 extension queries (x316+): spatial grid operators and the
round's new statistical families.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).

The test tables carry no coordinates, so the spatial queries derive
deterministic pseudo lat/lon from the engine-portable md5 hash idiom
(same construction as the sampling/minhash families): both engines
compute identical uniforms, so the geometry is bit-identical too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

EXT14_QUERIES: dict = {}
EXT14_ORACLES: dict = {}


_U32 = 4294967296.0


def _pseudo_coord(col, salt: str, span: float, offset: float):
    """Uniform pseudo-coordinate in [offset, offset+span) from an
    md5-derived 32-bit hash — Spark side of the shared idiom."""
    from .operators.sketch import _hash64

    return (
        _hash64(col, salt).cast("double") / F.lit(_U32)
    ) * F.lit(span) + F.lit(offset)


def _sql_coord(expr: str, salt: str, span: float, offset: float) -> str:
    return (
        f"(('0x' || substr(md5('{salt}:' || CAST({expr} AS VARCHAR)), 1, 8))"
        f"::BIGINT / {_U32!r}) * {span!r} + {offset!r}"
    )


# ----------------------------- x316: spatial grid-cell stats

_X316_CELL_DEG = 15.0


def q_x316_geo_cells(spark, sf_dir):
    """Grid-cell spatial density/value summary
    (operators/spatial.py:geo_cell_stats): customers placed at
    hash-derived pseudo coordinates (lat in [-60, 60), lon in [-180,
    180)), aggregated into 15-degree cells — count, centroid and
    account-balance sum/mean per cell.  One cell-keyed shuffle; the
    result is broadcastable metadata for cell sizing and skew
    decisions in x317's radius join."""
    from .operators.spatial import geo_cell_stats

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = cust.select(
        _pseudo_coord(F.col("c_custkey"), "geolat", 120.0, -60.0).alias(
            "lat"
        ),
        _pseudo_coord(F.col("c_custkey"), "geolon", 360.0, -180.0).alias(
            "lon"
        ),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    return geo_cell_stats(
        pts, "lat", "lon", "bal", cell_deg=_X316_CELL_DEG
    )


def _sql_x316() -> str:
    cd = _X316_CELL_DEG
    import math

    nx = int(math.ceil(360.0 / cd)) + 1
    lat = _sql_coord("c_custkey", "geolat", 120.0, -60.0)
    lon = _sql_coord("c_custkey", "geolon", 360.0, -180.0)
    return f"""
WITH x316_pts AS (
  SELECT {lat} AS lat, {lon} AS lon,
         CAST(c_acctbal AS DOUBLE) AS bal
  FROM customer
), x316_cells AS (
  SELECT CAST(FLOOR((lat + 90.0) / {cd!r}) * {nx}
              + FLOOR((lon + 180.0) / {cd!r}) AS BIGINT) AS cell_id,
         COUNT(*)::BIGINT AS n,
         SUM(CAST(ROUND(lat, 9) AS DECIMAL(38,9))) AS slat,
         SUM(CAST(ROUND(lon, 9) AS DECIMAL(38,9))) AS slon,
         SUM(CAST(ROUND(bal, 9) AS DECIMAL(38,9))) AS sv
  FROM x316_pts
  GROUP BY 1
)
SELECT cell_id,
       ROUND((CAST(cell_id // {nx} AS DOUBLE) * {cd!r} - 90.0)
             * 1000000.0) / 1000000.0 AS cell_lat,
       ROUND((CAST(cell_id % {nx} AS DOUBLE) * {cd!r} - 180.0)
             * 1000000.0) / 1000000.0 AS cell_lon,
       n,
       ROUND(CAST(slat AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
         / 1000000.0 AS centroid_lat,
       ROUND(CAST(slon AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
         / 1000000.0 AS centroid_lon,
       ROUND(CAST(sv AS DOUBLE) * 1000000.0) / 1000000.0 AS value_sum,
       ROUND(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
         / 1000000.0 AS value_mean
FROM x316_cells
ORDER BY cell_id
"""


SQL_X316 = _sql_x316()

EXT14_QUERIES.update({"x316_geo_cells": q_x316_geo_cells})
EXT14_ORACLES.update({"x316_geo_cells": SQL_X316})


# ----------------------------- x317: spatial radius join

_X317_RADIUS_KM = 500.0
_X317_REF_LAT = 45.0


def q_x317_geo_radius(spark, sf_dir):
    """Grid-bucketed spatial radius join
    (operators/spatial.py:geo_radius_join): every (customer, supplier)
    pair within 500 km under the trig-free local equirectangular
    metric, both sides at hash-derived pseudo coordinates.  The
    oracle is the INDEPENDENT ground truth — a brute-force all-pairs
    distance scan — so a hash match proves the neighbor-cell cover
    loses no pairs and invents none."""
    from .operators.spatial import geo_radius_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("cust_id"),
        _pseudo_coord(F.col("c_custkey"), "geolat", 120.0, -60.0).alias(
            "lat"
        ),
        _pseudo_coord(F.col("c_custkey"), "geolon", 360.0, -180.0).alias(
            "lon"
        ),
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").cast("long").alias("supp_id"),
        _pseudo_coord(F.col("s_suppkey"), "slat", 120.0, -60.0).alias(
            "lat"
        ),
        _pseudo_coord(F.col("s_suppkey"), "slon", 360.0, -180.0).alias(
            "lon"
        ),
    )
    return geo_radius_join(
        cust,
        supp,
        left_id="cust_id",
        right_id="supp_id",
        radius_km=_X317_RADIUS_KM,
        ref_lat_deg=_X317_REF_LAT,
    )


def _sql_x317() -> str:
    import math

    r = _X317_RADIUS_KM
    k = math.cos(math.radians(_X317_REF_LAT))
    km = 111.32
    clat = _sql_coord("c_custkey", "geolat", 120.0, -60.0)
    clon = _sql_coord("c_custkey", "geolon", 360.0, -180.0)
    slat = _sql_coord("s_suppkey", "slat", 120.0, -60.0)
    slon = _sql_coord("s_suppkey", "slon", 360.0, -180.0)
    return f"""
WITH x317_c AS (
  SELECT CAST(c_custkey AS BIGINT) AS cust_id,
         {clat} AS lat, {clon} AS lon
  FROM customer
), x317_s AS (
  SELECT CAST(s_suppkey AS BIGINT) AS supp_id,
         {slat} AS lat, {slon} AS lon
  FROM supplier
), x317_pairs AS (
  SELECT c.cust_id, s.supp_id,
         (c.lat - s.lat) * {km!r} AS dlat,
         (c.lon - s.lon) * {km * k!r} AS dlon
  FROM x317_c c, x317_s s
)
SELECT cust_id, supp_id,
       ROUND(sqrt(dlat * dlat + dlon * dlon) * 1000000.0)
         / 1000000.0 AS dist_km
FROM x317_pairs
WHERE dlat * dlat + dlon * dlon <= {r * r!r}
ORDER BY cust_id, supp_id
"""


SQL_X317 = _sql_x317()

EXT14_QUERIES.update({"x317_geo_radius": q_x317_geo_radius})
EXT14_ORACLES.update({"x317_geo_radius": SQL_X317})
