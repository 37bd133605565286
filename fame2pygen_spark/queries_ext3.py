"""Round-3 extension queries, third block (x94+): semi-structured
extraction, calendarization, data-quality auditing, and recency
weighting — warehouse-infrastructure operators a 100 TB pipeline
needs around the analytical core.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import quality as qy
from .operators import temporal as tp
from .sources.ingest import extract_json_props


# ----------------------------------------- x94: typed JSON extraction


def q_x94_json_props(spark, sf_dir):
    """Typed JSON field extraction (sources/ingest.py:
    extract_json_props) over the events ``props`` column, then an
    aggregate profile per event type — the semi-structured path every
    event pipeline starts with.  One JVM-side ``from_json`` parse per
    row (not one re-parse per field); malformed documents surface as
    ``json_valid = false`` instead of nulls-without-provenance."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ex = extract_json_props(ev, "props", {"k": "bigint"}, keep_raw=True)
    return (
        ex.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count(F.when(F.col("json_valid"), 1))
            .cast("long")
            .alias("n_valid"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.countDistinct("k").cast("long").alias("distinct_k"),
            F.round(
                F.try_divide(
                    F.sum("k").cast("double"),
                    F.count(F.when(F.col("k").isNotNull(), 1)).cast(
                        "double"
                    ),
                ),
                6,
            ).alias("avg_k"),
        )
        .orderBy("event_type")
    )


SQL_X94 = """
WITH ex AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k,
         (props IS NOT NULL AND json_valid(props)) AS ok
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT)                        AS n_events,
       CAST(count(CASE WHEN ok THEN 1 END) AS BIGINT)  AS n_valid,
       CAST(sum(k) AS BIGINT)                          AS sum_k,
       CAST(min(k) AS BIGINT)                          AS min_k,
       CAST(max(k) AS BIGINT)                          AS max_k,
       CAST(count(DISTINCT k) AS BIGINT)               AS distinct_k,
       ROUND(CAST(sum(k) AS DOUBLE)
             / CAST(count(CASE WHEN k IS NOT NULL THEN 1 END) AS DOUBLE),
             6)                                        AS avg_k
FROM ex
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------- x95: calendarized proration


def q_x95_prorate(spark, sf_dir):
    """Calendarized proration (operators/temporal.py:
    prorate_intervals): each order's total price is spread across the
    calendar months overlapped by its 30-day fulfillment interval,
    proportional to overlap days — integer day arithmetic, row-local
    month explode (no join), decimal-cast allocations so the per-month
    sums are accumulation-order-insensitive."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    iv = orders.select(
        F.col("o_orderdate").cast("date").alias("start_d"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("end_d"),
        "o_totalprice",
    )
    out = tp.prorate_intervals(
        iv, start_col="start_d", end_col="end_d", amount_col="o_totalprice"
    )
    return out.select(
        F.col("month").cast("date").alias("month"),
        "n_intervals",
        "alloc_amount",
    ).orderBy("month")


SQL_X95 = """
WITH iv AS (
  SELECT CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS e,
         o_totalprice AS amt
  FROM orders
), ex AS (
  SELECT s, CAST(e AS DATE) AS e, amt,
         CAST(unnest(generate_series(
           CAST(date_trunc('month', s) AS TIMESTAMP),
           CAST(date_trunc('month', CAST(e AS DATE) - INTERVAL 1 DAY)
                AS TIMESTAMP),
           INTERVAL 1 MONTH)) AS DATE) AS month
  FROM iv
), calc AS (
  SELECT month,
         CAST(amt AS DOUBLE)
           * CAST(date_diff('day',
               greatest(s, month),
               least(e, CAST(month + INTERVAL 1 MONTH AS DATE)))
             AS DOUBLE)
           / CAST(date_diff('day', s, e) AS DOUBLE) AS alloc
  FROM ex
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_intervals,
       ROUND(CAST(sum(CAST(alloc AS DECIMAL(38,12))) AS DOUBLE), 6)
         AS alloc_amount
FROM calc
GROUP BY month
ORDER BY month
"""


# ------------------------------------------- x96: data-quality audit


def q_x96_dq_report(spark, sf_dir):
    """Declarative data-quality report (operators/quality.py:
    dq_report): five expectations — completeness, positivity, value
    domain, cross-table temporal ordering, and FK orphan detection —
    evaluated as conditional counters in ONE stacked scan of
    lineitem joined to orders (N rules never cost N scans)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
    has_order = F.col("o_orderkey").isNotNull()
    rules = {
        "quantity_positive": (
            F.lit(True),
            F.coalesce(F.col("l_quantity") <= 0, F.lit(True)),
        ),
        "discount_in_range": (
            F.lit(True),
            F.coalesce(
                ~F.col("l_discount").between(0.0, 0.1), F.lit(True)
            ),
        ),
        "returnflag_domain": (
            F.lit(True),
            F.coalesce(
                ~F.col("l_returnflag").isin("A", "N", "R"), F.lit(True)
            ),
        ),
        "ship_after_order": (
            has_order,
            F.col("l_shipdate") < F.col("o_orderdate"),
        ),
        "orderkey_fk": (F.lit(True), ~has_order),
    }
    return qy.dq_report(joined, rules)


SQL_X96 = """
WITH j AS (
  SELECT l.*, o.o_orderkey AS ok_match, o.o_orderdate
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
), agg AS (
  SELECT
    count(*) AS c_all,
    count(CASE WHEN coalesce(l_quantity <= 0, TRUE) THEN 1 END)
      AS v_qty,
    count(CASE WHEN coalesce(NOT (l_discount BETWEEN 0.0 AND 0.1), TRUE)
               THEN 1 END) AS v_disc,
    count(CASE WHEN coalesce(l_returnflag NOT IN ('A','N','R'), TRUE)
               THEN 1 END) AS v_flag,
    count(CASE WHEN ok_match IS NOT NULL THEN 1 END) AS c_ship,
    count(CASE WHEN ok_match IS NOT NULL AND l_shipdate < o_orderdate
               THEN 1 END) AS v_ship,
    count(CASE WHEN ok_match IS NULL THEN 1 END) AS v_fk
  FROM j
)
SELECT rule,
       CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       ROUND(CAST(n_violations AS DOUBLE) / CAST(n_checked AS DOUBLE), 6)
         AS violation_rate
FROM (
  SELECT 'quantity_positive' AS rule, c_all AS n_checked,
         v_qty AS n_violations FROM agg
  UNION ALL
  SELECT 'discount_in_range', c_all, v_disc FROM agg
  UNION ALL
  SELECT 'returnflag_domain', c_all, v_flag FROM agg
  UNION ALL
  SELECT 'ship_after_order', c_ship, v_ship FROM agg
  UNION ALL
  SELECT 'orderkey_fk', c_all, v_fk FROM agg
)
ORDER BY rule
"""


# ------------------------------------------ x97: time-decayed sums


def q_x97_decayed_agg(spark, sf_dir):
    """Recency-weighted aggregation (operators/temporal.py:
    decayed_sum): per event type, values weighted by
    ``0.5 ** (age_days / 7)`` against the global max event date — the
    cliff-free alternative to trailing-window sums.  Reference date is
    a 1-row broadcast; weighted terms are decimal-cast before the sum
    so results are partitioning-independent."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return tp.decayed_sum(
        ev, ["event_type"], "ts", "value", half_life_days=7
    ).orderBy("event_type")


SQL_X97 = """
WITH ref AS (
  SELECT max(CAST(ts AS DATE)) AS ref_d FROM events
), t AS (
  SELECT e.event_type, e.value,
         CAST(e.value AS DOUBLE)
           * power(0.5,
               CAST(date_diff('day', CAST(e.ts AS DATE), r.ref_d)
                    AS DOUBLE) / 7.0) AS term
  FROM events e CROSS JOIN ref r
)
SELECT event_type,
       CAST(count(CASE WHEN value IS NOT NULL THEN 1 END) AS BIGINT)
         AS n,
       ROUND(CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6)
         AS decayed_sum_value,
       ROUND(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE), 6)
         AS plain_sum_value
FROM t
GROUP BY event_type
ORDER BY event_type
"""


EXT3_QUERIES = {
    "x94_json_props": q_x94_json_props,
    "x95_prorate": q_x95_prorate,
    "x96_dq_report": q_x96_dq_report,
    "x97_decayed_agg": q_x97_decayed_agg,
}

EXT3_ORACLES = {
    "x94_json_props": SQL_X94,
    "x95_prorate": SQL_X95,
    "x96_dq_report": SQL_X96,
    "x97_decayed_agg": SQL_X97,
}
