"""Round-4 extension queries, fifth batch (x185+): market-basket
association rules, classical seasonal decomposition, WOE/IV feature
binning, and inter-arrival burstiness.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .queries_ext import _read_events

EXT8_QUERIES: dict = {}
EXT8_ORACLES: dict = {}


# -------------------------------- x185: association rules


def q_x185_assoc_rules(spark, sf_dir):
    """Brand co-purchase association rules (operators/olap.py:
    association_rules): baskets are orders, items the part brands they
    contain; top-30 rules by lift — the support-pruned basket-level
    co-occurrence miner that complements window-level PMI (x39)."""
    from .operators.olap import association_rules

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    baskets = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select(
        F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item")
    )
    out = association_rules(
        baskets, "basket", "item", min_pair_count=50, max_items_per_basket=32
    )
    return out.orderBy(F.desc("lift"), "antecedent", "consequent").limit(30)


SQL_X185 = """
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
capped AS (
  SELECT basket, item FROM (
    SELECT basket, item,
           ROW_NUMBER() OVER (PARTITION BY basket ORDER BY item) AS rn
    FROM items
  ) WHERE rn <= 32
),
nb AS (SELECT COUNT(DISTINCT basket) AS nbk FROM capped),
marg AS (SELECT item, COUNT(*) AS ni FROM capped GROUP BY item),
pr AS (
  SELECT a.item AS ia, b.item AS ib, COUNT(*) AS nab
  FROM capped a JOIN capped b USING (basket)
  WHERE a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= 50
),
rules AS (
  SELECT ia AS antecedent, ib AS consequent, nab FROM pr
  UNION ALL
  SELECT ib AS antecedent, ia AS consequent, nab FROM pr
),
j AS (
  SELECT r.antecedent, r.consequent, r.nab, ma.ni AS na, mc.ni AS nc, nb.nbk
  FROM rules r
  JOIN marg ma ON ma.item = r.antecedent
  JOIN marg mc ON mc.item = r.consequent
  CROSS JOIN nb
)
SELECT antecedent, consequent,
       CAST(nab AS BIGINT) AS n_both,
       CAST(na AS BIGINT) AS n_ante,
       CAST(nc AS BIGINT) AS n_cons,
       ROUND(nab::DOUBLE / nbk::DOUBLE, 6) AS support,
       ROUND(nab::DOUBLE / na::DOUBLE, 6) AS confidence,
       ROUND((nab::DOUBLE / na::DOUBLE)
             / (nc::DOUBLE / nbk::DOUBLE), 6) AS lift
FROM j
ORDER BY lift DESC, antecedent, consequent
LIMIT 30
"""

EXT8_QUERIES.update({"x185_assoc_rules": q_x185_assoc_rules})
EXT8_ORACLES.update({"x185_assoc_rules": SQL_X185})


# ------------------------- x186: classical seasonal decomposition


def q_x186_decompose(spark, sf_dir):
    """Classical additive decomposition (operators/temporal.py:
    seasonal_decompose) of monthly order revenue per region: centered
    2×12 moving-average trend, zero-centered monthly seasonal
    component, residual — the descriptive complement to Holt–Winters
    forecasting (x150)."""
    from .operators.temporal import seasonal_decompose

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    base = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
    )
    monthly = base.groupBy(
        F.col("r_name"),
        F.trunc(F.col("o_orderdate"), "month").alias("month"),
    ).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,12)")).cast(
                "double"
            ),
            6,
        ).alias("rev")
    )
    out = seasonal_decompose(monthly, "month", "rev", ("r_name",), period=12)
    return out.orderBy("r_name", "ts")


def _sql_x186() -> str:
    over = "OVER (PARTITION BY r_name ORDER BY month)"
    terms = [f"lag(y, 6) {over} * 0.5"]
    terms += [f"lag(y, {i}) {over}" for i in range(5, 0, -1)]
    terms += ["y"]
    terms += [f"lead(y, {i}) {over}" for i in range(1, 6)]
    terms += [f"lead(y, 6) {over} * 0.5"]
    ma = "\n             + ".join(terms)
    return f"""
WITH monthly AS (
  SELECT r.r_name,
         date_trunc('month', o.o_orderdate)::DATE AS month,
         ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,12))) AS DOUBLE),
               6) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, date_trunc('month', o.o_orderdate)::DATE
),
staged AS (
  SELECT r_name, month AS ts, y,
         (ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY month) - 1) % 12
           AS phase,
         ROUND(({ma}) / 12.0, 6) AS trend
  FROM monthly
),
detr AS (SELECT *, y - trend AS d FROM staged),
ph AS (
  SELECT r_name, phase,
         ROUND(CAST(SUM(CAST(d AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS sraw
  FROM detr WHERE d IS NOT NULL
  GROUP BY r_name, phase
),
center AS (
  SELECT r_name,
         ROUND(CAST(SUM(CAST(sraw AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS c
  FROM ph GROUP BY r_name
),
seas AS (
  SELECT ph.r_name, ph.phase, ROUND(ph.sraw - center.c, 6) AS seasonal
  FROM ph JOIN center USING (r_name)
)
SELECT d.r_name, d.ts,
       ROUND(d.y, 6) AS y,
       d.trend,
       s.seasonal,
       ROUND(d.y - d.trend - s.seasonal, 6) AS resid
FROM detr d JOIN seas s ON s.r_name = d.r_name AND s.phase = d.phase
ORDER BY d.r_name, d.ts
"""


EXT8_QUERIES.update({"x186_decompose": q_x186_decompose})
EXT8_ORACLES.update({"x186_decompose": _sql_x186()})


# ----------------------------------- x187: WOE / IV binning


def q_x187_woe_iv(spark, sf_dir):
    """Weight-of-Evidence / Information-Value audit (operators/
    quality.py:woe_iv): account-balance deciles per market segment
    scored against the urgent-order label — the monotonic-signal
    check run on any quality score before it drives corpus
    filtering."""
    from .operators.quality import woe_iv

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    urgent = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    base = cust.join(
        urgent, cust["c_custkey"] == urgent["o_custkey"], "left"
    ).select(
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("score"),
        "c_custkey",
        F.col("o_custkey").isNotNull().alias("label"),
    )
    out = woe_iv(
        base, "score", "label", "c_custkey", ("c_mktsegment",), n_bins=10
    )
    return out.orderBy("c_mktsegment", "bin")


SQL_X187 = """
WITH urgent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
b AS (
  SELECT c.c_mktsegment, c.c_acctbal::DOUBLE AS s, c.c_custkey,
         CASE WHEN u.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
  FROM customer c LEFT JOIN urgent u ON c.c_custkey = u.o_custkey
),
nt AS (
  SELECT c_mktsegment, y,
         NTILE(10) OVER (PARTITION BY c_mktsegment ORDER BY s, c_custkey)
           AS bin
  FROM b
),
per AS (
  SELECT c_mktsegment, bin, COUNT(*) AS n, SUM(y) AS ng,
         COUNT(*) - SUM(y) AS nbd
  FROM nt GROUP BY c_mktsegment, bin
),
tot AS (
  SELECT c_mktsegment, SUM(ng) AS g, SUM(nbd) AS bb
  FROM per GROUP BY c_mktsegment
),
j AS (
  SELECT per.c_mktsegment, per.bin, per.n, per.ng, per.nbd, tot.g, tot.bb,
         (per.ng::DOUBLE + 0.5) / (tot.g::DOUBLE + 5.0) AS gs,
         (per.nbd::DOUBLE + 0.5) / (tot.bb::DOUBLE + 5.0) AS bs
  FROM per JOIN tot USING (c_mktsegment)
)
SELECT c_mktsegment,
       CAST(bin AS BIGINT) AS bin,
       CAST(n AS BIGINT) AS n,
       CAST(ng AS BIGINT) AS n_good,
       CAST(nbd AS BIGINT) AS n_bad,
       ROUND(gs, 6) AS good_share,
       ROUND(bs, 6) AS bad_share,
       ROUND(ln(gs / bs), 6) AS woe,
       ROUND(CAST(SUM(CAST((gs - bs) * ln(gs / bs) AS DECIMAL(38,18)))
                  OVER (PARTITION BY c_mktsegment) AS DOUBLE), 6)
         AS iv_total
FROM j
ORDER BY c_mktsegment, bin
"""

EXT8_QUERIES.update({"x187_woe_iv": q_x187_woe_iv})
EXT8_ORACLES.update({"x187_woe_iv": SQL_X187})


# ------------------------------------------ x188: burstiness


def q_x188_burstiness(spark, sf_dir):
    """Goh–Barabási burstiness coefficient per event type (operators/
    behavior.py:burstiness): B = (σ−μ)/(σ+μ) of same-user
    inter-arrival gaps — the clocklike/Poisson/bursty classifier that
    complements x38's gap quantiles and picks sessionization
    timeouts."""
    from .operators.behavior import burstiness

    ev = _read_events(spark, sf_dir)
    return burstiness(ev).orderBy("event_type")


SQL_X188 = """
WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events
),
g AS (
  SELECT event_type,
         ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts_us, event_id) AS gap
  FROM e
),
gg AS (
  SELECT event_type, CAST(gap AS DECIMAL(19,0)) AS gd
  FROM g WHERE gap IS NOT NULL
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(gd) AS s1, SUM(gd * gd) AS s2
  FROM gg GROUP BY event_type
),
t AS (
  SELECT event_type, n,
         s1::DOUBLE / n::DOUBLE AS mu,
         CASE WHEN s2::DOUBLE / n::DOUBLE
                   - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE) > 0
              THEN sqrt(s2::DOUBLE / n::DOUBLE
                        - (s1::DOUBLE / n::DOUBLE)
                          * (s1::DOUBLE / n::DOUBLE))
              ELSE 0.0 END AS sd
  FROM s
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       ROUND(mu, 6) AS mean_gap_us,
       ROUND(sd, 6) AS std_gap_us,
       ROUND(CASE WHEN sd + mu = 0 THEN NULL
                  ELSE (sd - mu) / (sd + mu) END, 6) AS burstiness
FROM t
ORDER BY event_type
"""

EXT8_QUERIES.update({"x188_burstiness": q_x188_burstiness})
EXT8_ORACLES.update({"x188_burstiness": SQL_X188})
