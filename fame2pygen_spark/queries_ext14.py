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


# ----------------------------- x318: isotonic regression (binned PAVA)

_X318_BINS = 16


def q_x318_isotonic(spark, sf_dir):
    """Weighted isotonic regression of order finality on price
    (operators/quality.py:isotonic_fit): the monotone calibration map
    from o_totalprice to P(o_orderstatus = 'F'), fitted over 16
    equal-width price bins via the minimax identity — one data
    shuffle, then bounded <= bins^3 metadata algebra.  The oracle
    recomputes the same math from prefix sums through independent SQL
    joins."""
    from .operators.quality import isotonic_fit

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    scored = orders.select(
        F.col("o_totalprice").cast("double").alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1.0)
        .otherwise(0.0)
        .alias("label"),
    )
    return isotonic_fit(scored, "score", "label", bins=_X318_BINS)


def _sql_x318() -> str:
    b = _X318_BINS
    return f"""
WITH x318_base AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS s,
         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
  FROM orders
), x318_rng AS (
  SELECT MIN(s) AS lo, MAX(s) AS hi FROM x318_base
), x318_binned AS (
  SELECT CAST(CASE WHEN hi = lo THEN 0
              ELSE LEAST({b - 1}, CAST(FLOOR((s - lo)
                   / ((hi - lo) / {float(b)!r})) AS BIGINT))
              END AS BIGINT) AS bin,
         lo, hi, y
  FROM x318_base, x318_rng
), x318_per_bin AS (
  SELECT bin, COUNT(*)::BIGINT AS n,
         SUM(CAST(ROUND(y, 9) AS DECIMAL(38,9))) AS sy,
         MIN(lo) AS lo, MIN(hi) AS hi
  FROM x318_binned GROUP BY bin
), x318_pref AS (
  SELECT bin, n, sy, lo, hi,
         CAST(SUM(n) OVER w AS BIGINT) AS cn,
         SUM(CAST(sy AS DECIMAL(38,9))) OVER w AS cs
  FROM x318_per_bin
  WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), x318_blocks AS (
  SELECT lo_end.bin AS ba, hi_end.bin AS bb,
         CAST(hi_end.cs - (lo_end.cs - lo_end.sy) AS DOUBLE)
           / CAST(hi_end.cn - (lo_end.cn - lo_end.n) AS DOUBLE) AS bm
  FROM x318_pref lo_end
  JOIN x318_pref hi_end ON lo_end.bin <= hi_end.bin
), x318_inner AS (
  SELECT i.bin AS bi, blk.ba, MIN(blk.bm) AS minb
  FROM x318_pref i
  JOIN x318_blocks blk ON blk.ba <= i.bin AND blk.bb >= i.bin
  GROUP BY 1, 2
), x318_iso AS (
  SELECT bi AS bin, MAX(minb) AS isov FROM x318_inner GROUP BY 1
)
SELECT p.bin,
       ROUND((CASE WHEN p.hi = p.lo THEN p.lo
              ELSE p.lo + CAST(p.bin AS DOUBLE)
                   * ((p.hi - p.lo) / {float(b)!r}) END)
             * 1000000.0) / 1000000.0 AS bin_lo,
       p.n,
       ROUND(CAST(p.sy AS DOUBLE) / CAST(p.n AS DOUBLE) * 1000000.0)
         / 1000000.0 AS raw_mean,
       ROUND(i.isov * 1000000.0) / 1000000.0 AS iso_mean
FROM x318_pref p
JOIN x318_iso i ON p.bin = i.bin
ORDER BY p.bin
"""


SQL_X318 = _sql_x318()

EXT14_QUERIES.update({"x318_isotonic": q_x318_isotonic})
EXT14_ORACLES.update({"x318_isotonic": SQL_X318})


# ----------------------------- x319: trigram stupid-backoff LM score

_X319_ALPHA = 0.4


def q_x319_stupid_backoff(spark, sf_dir):
    """Cross-corpus trigram stupid-backoff scoring
    (operators/text.py:stupid_backoff_score): even-doc_id documents
    are the reference counts, odd-doc_id documents are scored — the
    split is what makes the backoff ladder live (self-scoring never
    leaves the trigram level).  Bottom-20 mean log10 score = the most
    unusual held-out docs, plus per-level backoff tallies."""
    from .operators.text import stupid_backoff_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    sc = docs.where(F.col("doc_id") % 2 == 1)
    out = stupid_backoff_score(ref, sc, "text", "doc_id", alpha=_X319_ALPHA)
    return (
        out.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_scored",
            "n_tri_hits",
            "n_bi_backoffs",
            "n_uni_backoffs",
            "mean_log10_score",
        )
        .orderBy("mean_log10_score", "doc_id")
        .limit(20)
    )


def _sql_x319() -> str:
    a = _X319_ALPHA
    return f"""
WITH x319_toks AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '') AS tk
  FROM documents
), x319_ref AS (
  SELECT * FROM x319_toks WHERE doc_id % 2 = 0
), x319_sc AS (
  SELECT * FROM x319_toks WHERE doc_id % 2 = 1
), x319_runi AS (
  SELECT unnest(tk) AS w3 FROM x319_ref
), x319_nv AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_total,
         CAST(COUNT(DISTINCT w3) AS DOUBLE) AS vocab
  FROM x319_runi
), x319_c1 AS (
  SELECT w3, COUNT(*)::BIGINT AS c1 FROM x319_runi GROUP BY 1
), x319_rbi AS (
  SELECT b.w2 AS w2, b.w3 AS w3
  FROM (
    SELECT unnest(list_transform(range(1, len(tk)),
             i -> {{'w2': tk[CAST(i AS INTEGER)],
                    'w3': tk[CAST(i AS INTEGER) + 1]}})) AS b
    FROM x319_ref
  )
), x319_c2 AS (
  SELECT w2, w3, COUNT(*)::BIGINT AS c2 FROM x319_rbi GROUP BY 1, 2
), x319_c2ctx AS (
  SELECT w2, CAST(SUM(c2) AS BIGINT) AS c2ctx FROM x319_c2 GROUP BY 1
), x319_rtri AS (
  SELECT t.w1 AS w1, t.w2 AS w2, t.w3 AS w3
  FROM (
    SELECT unnest(list_transform(range(1, len(tk) - 1),
             i -> {{'w1': tk[CAST(i AS INTEGER)],
                    'w2': tk[CAST(i AS INTEGER) + 1],
                    'w3': tk[CAST(i AS INTEGER) + 2]}})) AS t
    FROM x319_ref
  )
), x319_c3 AS (
  SELECT w1, w2, w3, COUNT(*)::BIGINT AS c3
  FROM x319_rtri GROUP BY 1, 2, 3
), x319_c3ctx AS (
  SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c3ctx
  FROM x319_c3 GROUP BY 1, 2
), x319_stream AS (
  SELECT doc_id, t.w1 AS w1, t.w2 AS w2, t.w3 AS w3
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(tk) - 1),
             i -> {{'w1': tk[CAST(i AS INTEGER)],
                    'w2': tk[CAST(i AS INTEGER) + 1],
                    'w3': tk[CAST(i AS INTEGER) + 2]}})) AS t
    FROM x319_sc
  )
), x319_probed AS (
  SELECT s.doc_id,
         CASE WHEN c3.c3 IS NOT NULL THEN 3
              WHEN c2.c2 IS NOT NULL THEN 2 ELSE 1 END AS lvl,
         CAST(ROUND(log10(
           CASE
             WHEN c3.c3 IS NOT NULL THEN
               CAST(c3.c3 AS DOUBLE) / CAST(x3.c3ctx AS DOUBLE)
             WHEN c2.c2 IS NOT NULL THEN
               {a!r} * CAST(c2.c2 AS DOUBLE) / CAST(x2.c2ctx AS DOUBLE)
             ELSE
               {a * a!r} * (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 1.0)
               / (nv.n_total + nv.vocab)
           END), 9) AS DECIMAL(38,9)) AS lg
  FROM x319_stream s
  LEFT JOIN x319_c3 c3
    ON s.w1 = c3.w1 AND s.w2 = c3.w2 AND s.w3 = c3.w3
  LEFT JOIN x319_c3ctx x3 ON s.w1 = x3.w1 AND s.w2 = x3.w2
  LEFT JOIN x319_c2 c2 ON s.w2 = c2.w2 AND s.w3 = c2.w3
  LEFT JOIN x319_c2ctx x2 ON s.w2 = x2.w2
  LEFT JOIN x319_c1 c1 ON s.w3 = c1.w3
  CROSS JOIN x319_nv nv
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       COUNT(*)::BIGINT AS n_scored,
       CAST(SUM(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tri_hits,
       CAST(SUM(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bi_backoffs,
       CAST(SUM(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_uni_backoffs,
       ROUND(CAST(SUM(lg) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             * 1000000.0) / 1000000.0 AS mean_log10_score
FROM x319_probed
GROUP BY doc_id
ORDER BY mean_log10_score, doc_id
LIMIT 20
"""


SQL_X319 = _sql_x319()

EXT14_QUERIES.update({"x319_stupid_backoff": q_x319_stupid_backoff})
EXT14_ORACLES.update({"x319_stupid_backoff": SQL_X319})


# ----------------------------- x320: Croston intermittent demand

_X320_ALPHA = 0.2
_X320_HORIZON = 12


def q_x320_croston(spark, sf_dir):
    """Croston intermittent-demand forecast
    (operators/temporal.py:croston_forecast): weekly large-order
    (qty >= 30) demand per part from lineitem — a genuinely sparse
    series — smoothed into per-part demand size, inter-demand
    interval, and forecast rate with horizon-truncated adjusted
    EWMAs whose weights are Python literals on both engines."""
    from .operators.temporal import croston_forecast

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    demand = (
        li.where(F.col("l_quantity") >= 30)
        .groupBy(
            F.col("l_partkey").cast("long").alias("part"),
            F.expr("datediff(l_shipdate, DATE '1992-01-01') div 7")
            .cast("long")
            .alias("week"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,2)"))
            .cast("double")
            .alias("qty")
        )
    )
    return croston_forecast(
        demand, "part", "week", "qty",
        alpha=_X320_ALPHA, horizon=_X320_HORIZON,
    )


def _sql_x320() -> str:
    a, h = _X320_ALPHA, _X320_HORIZON
    beta = 1.0 - a
    wlist = ", ".join(repr(beta**j) for j in range(h))
    return f"""
WITH x320_demand AS (
  SELECT CAST(l_partkey AS BIGINT) AS entity,
         CAST(date_diff('day', DATE '1992-01-01',
                        CAST(l_shipdate AS DATE)) AS BIGINT) // 7
           AS period,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS size
  FROM lineitem
  WHERE l_quantity >= 30
  GROUP BY 1, 2
), x320_staged AS (
  SELECT entity, period, size,
         CAST(period - LAG(period) OVER
              (PARTITION BY entity ORDER BY period) AS DOUBLE)
           AS itv,
         ROW_NUMBER() OVER
           (PARTITION BY entity ORDER BY period DESC) AS rk
  FROM x320_demand
  WHERE size IS NOT NULL AND size > 0
), x320_recent AS (
  SELECT entity, size, itv, ([{wlist}])[rk] AS w
  FROM x320_staged
  WHERE rk <= {h}
), x320_folded AS (
  SELECT entity,
         SUM(CAST(ROUND(w * size, 9) AS DECIMAL(38,9))) AS zn,
         SUM(CAST(ROUND(w, 9) AS DECIMAL(38,9))) AS zd,
         SUM(CAST(CASE WHEN itv IS NOT NULL
                  THEN ROUND(w * itv, 9) END AS DECIMAL(38,9))) AS pn,
         SUM(CAST(CASE WHEN itv IS NOT NULL
                  THEN ROUND(w, 9) END AS DECIMAL(38,9))) AS pd
  FROM x320_recent
  GROUP BY entity
), x320_n AS (
  SELECT entity, COUNT(*)::BIGINT AS n_demands
  FROM x320_staged GROUP BY entity
)
SELECT f.entity,
       n.n_demands,
       ROUND(CAST(zn AS DOUBLE) / CAST(zd AS DOUBLE) * 1000000.0)
         / 1000000.0 AS z_size,
       ROUND(CAST(pn AS DOUBLE) / NULLIF(CAST(pd AS DOUBLE), 0)
             * 1000000.0) / 1000000.0 AS p_interval,
       ROUND((CAST(zn AS DOUBLE) / CAST(zd AS DOUBLE))
             / NULLIF(CAST(pn AS DOUBLE) / NULLIF(CAST(pd AS DOUBLE), 0),
                      0) * 1000000.0) / 1000000.0 AS forecast_rate
FROM x320_folded f
JOIN x320_n n ON f.entity = n.entity
ORDER BY f.entity
"""


SQL_X320 = _sql_x320()

EXT14_QUERIES.update({"x320_croston": q_x320_croston})
EXT14_ORACLES.update({"x320_croston": SQL_X320})


# ----------------------------- x321: Hoeffding racing elimination

_X321_DELTA = 0.05


def q_x321_hoeffding_racing(spark, sf_dir):
    """Distribution-free racing elimination audit
    (operators/behavior.py:hoeffding_racing): event types as arms,
    value clipped to [0, 1] as reward — per-arm Hoeffding bounds and
    the eliminated/leader verdicts a bandit scheduler applies between
    batches.  One keyed aggregation plus a bounded arm-row window."""
    from .operators.behavior import hoeffding_racing
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    rewards = ev.select(
        F.col("event_type").alias("arm"),
        F.least(
            F.lit(1.0),
            F.greatest(F.lit(0.0), F.col("value").cast("double") / 100.0),
        ).alias("reward"),
    )
    return hoeffding_racing(rewards, "arm", "reward", delta=_X321_DELTA)


def _sql_x321() -> str:
    import math

    lt = math.log(2.0 / _X321_DELTA)
    return f"""
WITH x321_rewards AS (
  SELECT event_type AS arm,
         LEAST(1.0, GREATEST(0.0, CAST(value AS DOUBLE) / 100.0))
           AS reward
  FROM events
), x321_arms AS (
  SELECT arm, COUNT(*)::BIGINT AS n,
         SUM(CAST(ROUND(reward, 9) AS DECIMAL(38,9))) AS s
  FROM x321_rewards GROUP BY arm
), x321_staged AS (
  SELECT arm, n,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
           - sqrt({lt!r} / (2.0 * CAST(n AS DOUBLE))) AS lcb,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
           + sqrt({lt!r} / (2.0 * CAST(n AS DOUBLE))) AS ucb
  FROM x321_arms
), x321_best AS (
  SELECT arm, n, m, lcb, ucb, MAX(lcb) OVER () AS best_lcb
  FROM x321_staged
)
SELECT arm, n,
       ROUND(m * 1000000.0) / 1000000.0 AS mean_reward,
       ROUND(lcb * 1000000.0) / 1000000.0 AS lcb,
       ROUND(ucb * 1000000.0) / 1000000.0 AS ucb,
       ucb < best_lcb AS eliminated,
       lcb = best_lcb AS is_leader
FROM x321_best
ORDER BY arm
"""


SQL_X321 = _sql_x321()

EXT14_QUERIES.update({"x321_hoeffding_racing": q_x321_hoeffding_racing})
EXT14_ORACLES.update({"x321_hoeffding_racing": SQL_X321})


# ----------------------------- x322: sequential 3-pattern support

_X322_TOP_TYPES = 4


def q_x322_seq_patterns(spark, sf_dir):
    """Ordered 3-event subsequence support mining
    (operators/behavior.py:seq_pattern_support): every ordered triple
    over the 4 most frequent event types, scored by the number of
    users whose history contains it with gaps allowed — earliest-
    first greedy chaining in three user-keyed stages, never a
    per-pattern pass."""
    from .operators.behavior import seq_pattern_support
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    return seq_pattern_support(
        ev, "user_id", "ts_us", "event_type",
        top_types=_X322_TOP_TYPES,
    )


def _sql_x322() -> str:
    m = _X322_TOP_TYPES
    return f"""
WITH x322_base AS (
  SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         CAST(event_type AS VARCHAR) AS e
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
    AND user_id IS NOT NULL
), x322_nu AS (
  SELECT CAST(COUNT(DISTINCT u) AS DOUBLE) AS n_users FROM x322_base
), x322_cand AS (
  SELECT e FROM x322_base GROUP BY e
  ORDER BY COUNT(*) DESC, e ASC LIMIT {m}
), x322_ev AS (
  SELECT b.u, b.t, b.e FROM x322_base b JOIN x322_cand c ON b.e = c.e
), x322_t1 AS (
  SELECT u, e AS a, MIN(t) AS t1 FROM x322_ev GROUP BY u, e
), x322_t2 AS (
  SELECT ev.u, t1.a, ev.e AS b, MIN(ev.t) AS t2
  FROM x322_ev ev JOIN x322_t1 t1 ON ev.u = t1.u
  WHERE ev.t > t1.t1
  GROUP BY ev.u, t1.a, ev.e
), x322_tmax AS (
  SELECT u, e AS c, MAX(t) AS tc FROM x322_ev GROUP BY u, e
), x322_hits AS (
  SELECT t2.u, t2.a, t2.b, tm.c
  FROM x322_t2 t2 JOIN x322_tmax tm ON t2.u = tm.u
  WHERE tm.tc > t2.t2
)
SELECT a, b, c, COUNT(*)::BIGINT AS n_users,
       ROUND(CAST(COUNT(*) AS DOUBLE) / nu.n_users * 1000000.0)
         / 1000000.0 AS support_rate
FROM x322_hits CROSS JOIN x322_nu nu
GROUP BY a, b, c, nu.n_users
HAVING COUNT(*) >= 1
ORDER BY n_users DESC, a, b, c
"""


SQL_X322 = _sql_x322()

EXT14_QUERIES.update({"x322_seq_patterns": q_x322_seq_patterns})
EXT14_ORACLES.update({"x322_seq_patterns": SQL_X322})


# ----------------------------- x323: dynamic time warping pairs

_X323_USERS = 12
_US_PER_DAY = 86_400_000_000


def q_x323_dtw(spark, sf_dir):
    """All-pairs DTW distance between users' daily-activity series
    (operators/temporal.py:dtw_pairs): 12 users' per-day event counts
    aligned elastically — the bounded-pair Pandas-path operator with
    an exact full DP (band=None).  The oracle replays the identical
    DP as a diagonal-wavefront recursive CTE carrying each
    anti-diagonal as a list, so both engines fold the same
    +/abs/min chain (integer-valued costs — exact)."""
    from .operators.temporal import dtw_pairs
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    daily = (
        ev.where(F.col("user_id") < _X323_USERS)
        .groupBy(
            F.col("user_id").cast("string").alias("user"),
            F.expr(f"ts_us div {_US_PER_DAY}").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n_events"))
    )
    return dtw_pairs(daily, "user", "day", "n_events")


def _sql_x323() -> str:
    return f"""
WITH RECURSIVE x323_daily AS (
  SELECT CAST(user_id AS VARCHAR) AS e,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY} AS day,
         CAST(COUNT(*) AS DOUBLE) AS v
  FROM events
  WHERE user_id < {_X323_USERS}
  GROUP BY 1, 2
), x323_arr AS (
  SELECT e, list(v ORDER BY day, v) AS vs
  FROM x323_daily GROUP BY e
), x323_pairs AS (
  SELECT a.e AS ea, b.e AS eb, a.vs AS x, b.vs AS y,
         len(a.vs) AS n, len(b.vs) AS m
  FROM x323_arr a JOIN x323_arr b ON a.e < b.e
), x323_dp AS (
  SELECT ea, eb, x, y, n, m, 2 AS d,
         list_transform(range(1, n + 1),
           i -> CASE WHEN i = 1 THEN abs(x[1] - y[1]) END) AS cur,
         list_transform(range(1, n + 1),
           i -> CAST(NULL AS DOUBLE)) AS prev
  FROM x323_pairs
  UNION ALL
  SELECT ea, eb, x, y, n, m, d + 1,
         list_transform(range(1, n + 1),
           i -> CASE WHEN d + 1 - i BETWEEN 1 AND m
                      AND i BETWEEN 1 AND n THEN
                  abs(x[CAST(i AS INTEGER)]
                      - y[CAST(d + 1 - i AS INTEGER)])
                  + least(
                      cur[CAST(i AS INTEGER)],
                      CASE WHEN i > 1
                           THEN cur[CAST(i - 1 AS INTEGER)] END,
                      CASE WHEN i > 1
                           THEN prev[CAST(i - 1 AS INTEGER)] END)
                END) AS cur,
         cur AS prev
  FROM x323_dp
  WHERE d < n + m
)
SELECT ea AS entity_a, eb AS entity_b,
       CAST(n AS BIGINT) AS n_a, CAST(m AS BIGINT) AS n_b,
       ROUND(cur[CAST(n AS INTEGER)] * 1000000.0) / 1000000.0 AS dtw
FROM x323_dp
WHERE d = n + m
ORDER BY ea, eb
"""


SQL_X323 = _sql_x323()

EXT14_QUERIES.update({"x323_dtw": q_x323_dtw})
EXT14_ORACLES.update({"x323_dtw": SQL_X323})


# ----------------------------- x324: DiD event study

_X324_EVENT_DAY = 19738  # 2024-01-16 as an epoch-day index


def q_x324_event_study(spark, sf_dir):
    """Difference-in-differences event study
    (operators/behavior.py:event_study): per-user daily mean value as
    the panel, odd user_ids as the treated group, 2024-01-16 as the
    event — att_k for k in [-4, +4] with k = -1 omitted, the standard
    pre-trend / dynamic-effect readout.  One panel shuffle; the base
    means attach over the bounded (group, k) aggregate."""
    from .operators.behavior import event_study
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    panel = ev.groupBy(
        F.col("user_id").alias("user"),
        F.expr(f"ts_us div {_US_PER_DAY}").cast("long").alias("day"),
    ).agg(
        (
            F.sum(F.round(F.col("value").cast("double"), 9).cast(
                "decimal(38,9)"
            )).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("y")
    ).withColumn("treated", F.col("user") % 2 == 1)
    return event_study(
        panel, "user", "day", "y", "treated",
        event_period=_X324_EVENT_DAY, pre=4, post=4,
    )


def _sql_x324() -> str:
    e = _X324_EVENT_DAY
    return f"""
WITH x324_panel AS (
  SELECT user_id AS u,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_US_PER_DAY} AS day,
         CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 9)
                  AS DECIMAL(38,9))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS y,
         user_id % 2 = 1 AS t
  FROM events
  GROUP BY 1, 2, 4
), x324_cells AS (
  SELECT day - {e} AS k, t,
         COUNT(*)::BIGINT AS n,
         SUM(CAST(ROUND(y, 9) AS DECIMAL(38,9))) AS s
  FROM x324_panel
  WHERE day - {e} BETWEEN -4 AND 4 AND y IS NOT NULL
  GROUP BY 1, 2
), x324_staged AS (
  SELECT k, t, n,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         MAX(CASE WHEN k = -1
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END)
           OVER (PARTITION BY t) AS mb
  FROM x324_cells
), x324_t AS (
  SELECT k, n AS n_treat, m AS mt, mb AS mbt FROM x324_staged WHERE t
), x324_c AS (
  SELECT k, n AS n_ctrl, m AS mc, mb AS mbc
  FROM x324_staged WHERE NOT t
)
SELECT COALESCE(tt.k, cc.k) AS rel_period,
       COALESCE(n_treat, 0) AS n_treat,
       COALESCE(n_ctrl, 0) AS n_ctrl,
       ROUND(mt * 1000000.0) / 1000000.0 AS mean_treat,
       ROUND(mc * 1000000.0) / 1000000.0 AS mean_ctrl,
       ROUND(((mt - mbt) - (mc - mbc)) * 1000000.0) / 1000000.0 AS att
FROM x324_t tt FULL JOIN x324_c cc ON tt.k = cc.k
ORDER BY rel_period
"""


SQL_X324 = _sql_x324()

EXT14_QUERIES.update({"x324_event_study": q_x324_event_study})
EXT14_ORACLES.update({"x324_event_study": SQL_X324})


# ----------------------------- x325: Fellegi-Sunter linkage scoring

_X325_M = [0.95, 0.80, 0.70]
_X325_U = [0.30, 0.40, 0.45]


def q_x325_fellegi_sunter(spark, sf_dir):
    """Fellegi-Sunter probabilistic linkage scoring
    (operators/linkage.py:fellegi_sunter_score): customer-supplier
    candidate pairs blocked on nationkey, three deterministic field
    agreements (phone area prefix, balance proximity, name-length
    parity), per-field log2 m/u weights folded map-side into the
    classic match / possible / non_match bands."""
    from .operators.linkage import fellegi_sunter_score

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("cust_id"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_acctbal").cast("double").alias("c_bal"),
        F.col("c_name").alias("c_name"),
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").cast("long").alias("supp_id"),
        F.col("s_nationkey").alias("nation"),
        F.col("s_acctbal").cast("double").alias("s_bal"),
        F.col("s_name").alias("s_name"),
    )
    pairs = cust.join(supp, on="nation").select(
        "cust_id",
        "supp_id",
        (
            F.substring(F.col("c_name"), -1, 1)
            == F.substring(F.col("s_name"), -1, 1)
        ).alias("agree_area"),
        (F.abs(F.col("c_bal") - F.col("s_bal")) < 1000.0).alias(
            "agree_bal"
        ),
        (
            F.length("c_name") % 2 == F.length("s_name") % 2
        ).alias("agree_namelen"),
    )
    return fellegi_sunter_score(
        pairs,
        ["agree_area", "agree_bal", "agree_namelen"],
        _X325_M,
        _X325_U,
        upper=2.0,
        lower=0.0,
    ).orderBy("cust_id", "supp_id")


def _sql_x325() -> str:
    import math

    ws = [
        (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))
        for m, u in zip(_X325_M, _X325_U)
    ]
    score = " + ".join(
        f"(CASE WHEN {col} THEN CAST({wa!r} AS DOUBLE)"
        f" ELSE CAST({wd!r} AS DOUBLE) END)"
        for col, (wa, wd) in zip(
            ["agree_area", "agree_bal", "agree_namelen"], ws
        )
    )
    return f"""
WITH x325_pairs AS (
  SELECT CAST(c_custkey AS BIGINT) AS cust_id,
         CAST(s_suppkey AS BIGINT) AS supp_id,
         substr(c_name, -1, 1) = substr(s_name, -1, 1) AS agree_area,
         abs(CAST(c_acctbal AS DOUBLE) - CAST(s_acctbal AS DOUBLE))
           < 1000.0 AS agree_bal,
         length(c_name) % 2 = length(s_name) % 2 AS agree_namelen
  FROM customer JOIN supplier ON c_nationkey = s_nationkey
), x325_scored AS (
  SELECT *, {score} AS raw_score FROM x325_pairs
)
SELECT cust_id, supp_id, agree_area, agree_bal, agree_namelen,
       ROUND(raw_score * 1000000.0) / 1000000.0 AS fs_score,
       CASE WHEN raw_score >= 2.0 THEN 'match'
            WHEN raw_score >= 0.0 THEN 'possible'
            ELSE 'non_match' END AS fs_decision
FROM x325_scored
ORDER BY cust_id, supp_id
"""


SQL_X325 = _sql_x325()

EXT14_QUERIES.update({"x325_fellegi_sunter": q_x325_fellegi_sunter})
EXT14_ORACLES.update({"x325_fellegi_sunter": SQL_X325})
