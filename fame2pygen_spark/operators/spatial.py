"""Spatial grid operators: cell aggregation and radius joins.

The reference engine (botlhale/Fame2PyGen) has no spatial surface;
these extend the repo's 100 TB curation toolkit with the two spatial
primitives a large-scale pipeline actually needs — density summaries
and bounded-radius pair finding — using the grid-cell (geohash-style)
bucketing strategy, the spatial analog of the LSH band join in
``operators/dedup.py``: shuffle once on a cell key, compare only
within a bounded neighborhood, never all pairs.

Cross-engine determinism: there is NO trigonometry in any Spark or
SQL expression.  Distances use the local equirectangular metric with
a FIXED reference-latitude longitude scale ``k = cos(ref_lat)``
computed driver-side in Python and embedded as a literal, so both
engines evaluate identical IEEE double polynomials (libm sin/cos drift
is the one class of expression this registry bans from hash-checked
paths — see the trig-free periodogram note in operators/temporal.py).
The equirectangular metric is the standard small-radius approximation
(error < 0.5 % of distance at radius ≤ ~500 km and |lat − ref_lat|
within a few degrees); for global exactness swap in haversine at the
cost of oracle-grade reproducibility.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window  # noqa: F401
from pyspark.sql import functions as F

__all__ = ["KM_PER_DEG", "geo_cell_stats", "geo_radius_join"]

#: mean meridian kilometres per degree of latitude (WGS-84 mean)
KM_PER_DEG = 111.32


def _cell_id(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Pack (lat, lon) into one BIGINT grid-cell id.

    ``y = floor((lat + 90) / cell_deg)``, ``x = floor((lon + 180) /
    cell_deg)``, ``id = y * nx + x`` with ``nx = ceil(360 /
    cell_deg)`` — a flat row-major geohash.  floor() is exact on both
    engines (no double→long cast truncation mismatch).
    """
    nx = int(math.ceil(360.0 / cell_deg)) + 1
    y = F.floor((lat + F.lit(90.0)) / F.lit(float(cell_deg)))
    x = F.floor((lon + F.lit(180.0)) / F.lit(float(cell_deg)))
    return (y * F.lit(nx) + x).cast("long")


def geo_cell_stats(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    value_col: str | None = None,
    *,
    cell_deg: float = 1.0,
    min_count: int = 1,
) -> DataFrame:
    """Grid-cell density / value summary — the spatial GROUP BY.

    One shuffle on the packed cell id (map-side partial aggregation
    absorbs dense cells before the exchange), emitting per cell:
    point count, centroid (mean lat/lon) and, when *value_col* is
    given, its sum and mean.  At 100 TB this is the first pass of any
    spatial workload: the ≤(360/cell_deg)·(180/cell_deg)-row result is
    broadcastable metadata that drives cell-keyed partitioning, skew
    salting decisions, and :func:`geo_radius_join` cell sizing.

    Rows with null/out-of-range coordinates (|lat| > 90, |lon| > 180)
    are excluded.  Output: ``(cell_id, cell_lat, cell_lon, n,
    centroid_lat, centroid_lon[, value_sum, value_mean])`` ordered by
    cell_id; cell_lat/cell_lon are the cell's southwest corner in
    degrees.  Floats round via the tie-safe ``*1e6`` multiply.
    """
    cd = float(cell_deg)
    if not (0.0 < cd <= 90.0):
        raise ValueError("cell_deg must be in (0, 90]")
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    base = df.where(
        lat.isNotNull()
        & lon.isNotNull()
        & (F.abs(lat) <= 90.0)
        & (F.abs(lon) <= 180.0)
    ).select(
        _cell_id(lat, lon, cd).alias("cell_id"),
        lat.alias("__lat"),
        lon.alias("__lon"),
        *(
            [F.col(value_col).cast("double").alias("__v")]
            if value_col
            else []
        ),
    )
    dec = "decimal(38,9)"

    def _r6(x: Column) -> Column:
        return F.round(x * F.lit(1e6)) / F.lit(1e6)

    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("__lat"), 9).cast(dec)).alias("__slat"),
        F.sum(F.round(F.col("__lon"), 9).cast(dec)).alias("__slon"),
    ]
    if value_col:
        aggs += [F.sum(F.round(F.col("__v"), 9).cast(dec)).alias("__sv")]
    per_cell = base.groupBy("cell_id").agg(*aggs)
    nx = int(math.ceil(360.0 / cd)) + 1
    cols = [
        "cell_id",
        _r6(
            F.expr(f"cell_id div {nx}").cast("double") * F.lit(cd)
            - F.lit(90.0)
        ).alias("cell_lat"),
        _r6(
            (F.col("cell_id") % F.lit(nx)).cast("double") * F.lit(cd)
            - F.lit(180.0)
        ).alias("cell_lon"),
        "n",
        _r6(
            F.col("__slat").cast("double") / F.col("n").cast("double")
        ).alias("centroid_lat"),
        _r6(
            F.col("__slon").cast("double") / F.col("n").cast("double")
        ).alias("centroid_lon"),
    ]
    if value_col:
        cols += [
            _r6(F.col("__sv").cast("double")).alias("value_sum"),
            _r6(
                F.col("__sv").cast("double") / F.col("n").cast("double")
            ).alias("value_mean"),
        ]
    return (
        per_cell.where(F.col("n") >= int(min_count))
        .select(*cols)
        .orderBy("cell_id")
    )


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str = "left_id",
    right_id: str = "right_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    radius_km: float,
    ref_lat_deg: float = 0.0,
    cell_deg: float | None = None,
    max_neighbor_cells: int = 49,
) -> DataFrame:
    """All (left, right) pairs within *radius_km* — the spatial join.

    Grid-cell strategy (the LSH-band pattern applied to geometry):
    both sides bucket into ``cell_deg`` grid cells; each LEFT point
    expands map-side to its (2·Ry+1)×(2·Rx+1) neighbor-cell block
    (Ry/Rx derived from the radius, bounded by *max_neighbor_cells* —
    loud-fail beyond, that means the cell size is wrong for the
    radius); ONE equi-join on cell id co-locates candidates; an O(1)
    per-pair polynomial distance filter keeps true hits.  No cartesian
    product, no cross join — cost is Σ per-cell |L|·|R| over occupied
    neighborhoods, the spatial analog of the capped LSH bucket join.
    At 100 TB: both sides shuffle once on cell id; dense-city skew is
    handled upstream by choosing *cell_deg* from a
    :func:`geo_cell_stats` density profile (smaller cells in the same
    join, identical semantics) or AQE skew-join splitting.

    Distance is the local equirectangular metric: ``d² =
    (111.32·Δlat)² + (111.32·k·Δlon)²`` with ``k = cos(ref_lat_deg)``
    computed once in PYTHON and shipped as a literal — the Spark plan
    and the SQL oracle evaluate the same trig-free IEEE polynomial, so
    results hash-match bit-exactly (see module docstring; < 0.5 %
    metric error for small radii near the reference band).

    Output: ``(left_id, right_id, dist_km)`` (6 dp, tie-safe round),
    dist_km ≤ radius_km, ordered by (left_id, right_id).
    """
    r = float(radius_km)
    if r <= 0:
        raise ValueError("radius_km must be positive")
    if left_id == right_id:
        raise ValueError(
            "left_id and right_id must name distinct output columns "
            f"(both are {left_id!r}) — rename one side first"
        )
    k = math.cos(math.radians(float(ref_lat_deg)))
    if k <= 0.05:
        raise ValueError(
            "ref_lat_deg too close to a pole for the equirectangular "
            "metric (cos(ref_lat) <= 0.05)"
        )
    cd = float(cell_deg) if cell_deg is not None else r / (KM_PER_DEG * k)
    if not (0.0 < cd <= 90.0):
        raise ValueError("cell_deg must be in (0, 90]")
    # neighbor reach in whole cells, per axis
    ry = int(math.ceil(r / (KM_PER_DEG * cd)))
    rx = int(math.ceil(r / (KM_PER_DEG * k * cd)))
    n_cells = (2 * ry + 1) * (2 * rx + 1)
    if n_cells > int(max_neighbor_cells):
        raise ValueError(
            f"radius {r} km needs a {2 * ry + 1}x{2 * rx + 1} neighbor "
            f"block ({n_cells} cells) at cell_deg={cd:.6g} — raise "
            "cell_deg or max_neighbor_cells"
        )
    nx = int(math.ceil(360.0 / cd)) + 1

    def prep(df: DataFrame, id_col: str, tag: str) -> DataFrame:
        lat = F.col(lat_col).cast("double")
        lon = F.col(lon_col).cast("double")
        return df.where(
            lat.isNotNull()
            & lon.isNotNull()
            & (F.abs(lat) <= 90.0)
            & (F.abs(lon) <= 180.0)
        ).select(
            F.col(id_col).alias(f"__{tag}_id"),
            lat.alias(f"__{tag}_lat"),
            lon.alias(f"__{tag}_lon"),
            F.floor((lat + F.lit(90.0)) / F.lit(cd)).alias(f"__{tag}_cy"),
            F.floor((lon + F.lit(180.0)) / F.lit(cd)).alias(f"__{tag}_cx"),
        )

    ny = int(math.ceil(180.0 / cd)) + 1
    lf = prep(left, left_id, "l")
    rf = prep(right, right_id, "r")
    # map-side neighbor expansion of the left side (bounded explode);
    # out-of-grid probe cells are dropped BEFORE packing — a shifted
    # x outside [0, nx) would alias a neighboring row's packed id and
    # surface the same true pair twice (once via the aliased cell,
    # once via the proper one), so the range filter is what keeps the
    # output duplicate-free without a distinct shuffle.  Pairs across
    # the antimeridian are out of scope for the local metric anyway.
    dy = F.explode(
        F.array(*[F.lit(i) for i in range(-ry, ry + 1)])
    ).alias("__dy")
    lf = lf.select("*", dy)
    dx = F.explode(
        F.array(*[F.lit(i) for i in range(-rx, rx + 1)])
    ).alias("__dx")
    lf = lf.select("*", dx)
    py = F.col("__l_cy") + F.col("__dy")
    px = F.col("__l_cx") + F.col("__dx")
    lf = lf.where(
        (py >= 0) & (py < ny) & (px >= 0) & (px < nx)
    ).select(
        "__l_id",
        "__l_lat",
        "__l_lon",
        (py * F.lit(nx) + px).cast("long").alias("__cell"),
    )
    rf = rf.select(
        "__r_id",
        "__r_lat",
        "__r_lon",
        (F.col("__r_cy") * F.lit(nx) + F.col("__r_cx"))
        .cast("long")
        .alias("__cell"),
    )
    dlat = (F.col("__l_lat") - F.col("__r_lat")) * F.lit(KM_PER_DEG)
    dlon = (F.col("__l_lon") - F.col("__r_lon")) * F.lit(KM_PER_DEG * k)
    d2 = dlat * dlat + dlon * dlon
    pairs = (
        lf.join(rf, on="__cell")
        .where(d2 <= F.lit(r * r))
        .select(
            F.col("__l_id").alias(left_id),
            F.col("__r_id").alias(right_id),
            (F.round(F.sqrt(d2) * F.lit(1e6)) / F.lit(1e6)).alias(
                "dist_km"
            ),
        )
    )
    return pairs.orderBy(left_id, right_id)
