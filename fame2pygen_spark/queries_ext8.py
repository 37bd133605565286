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
FROM detr d LEFT JOIN seas s ON s.r_name = d.r_name AND s.phase = d.phase
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


# --------------------------------- x189: lexicon category flags


def q_x189_lexicon_flags(spark, sf_dir):
    """Category-lexicon screening rates (operators/text.py:
    lexicon_category_rates): per (source, category) document flag
    rates against three wordlists — the blocklist triage pass a
    corpus pipeline runs per source before model-based review."""
    from .operators.text import lexicon_category_rates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lex = {
        "infra": ["spark", "table", "join", "shuffle"],
        "perf": ["slow", "fast", "latency"],
        "data": ["row", "value", "key"],
    }
    out = lexicon_category_rates(docs, "text", "doc_id", ("source",), lex)
    return out.orderBy("source", "category")


SQL_X189 = """
WITH toks AS (
  SELECT source, doc_id,
         unnest(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS term
  FROM documents
),
lex(term, category) AS (
  VALUES ('join','infra'),('shuffle','infra'),('spark','infra'),
         ('table','infra'),
         ('fast','perf'),('latency','perf'),('slow','perf'),
         ('key','data'),('row','data'),('value','data')
),
hits AS (
  SELECT t.source, l.category, t.doc_id, COUNT(*) AS h
  FROM toks t JOIN lex l USING (term)
  GROUP BY t.source, l.category, t.doc_id
),
per AS (
  SELECT source, category, COUNT(*) AS dflag, SUM(h) AS th
  FROM hits GROUP BY source, category
),
grp AS (SELECT source, COUNT(*) AS nd FROM documents GROUP BY source),
cats AS (SELECT DISTINCT category FROM lex),
spine AS (SELECT g.source, g.nd, c.category FROM grp g CROSS JOIN cats c)
SELECT s.source, s.category,
       CAST(s.nd AS BIGINT) AS n_docs,
       CAST(COALESCE(p.dflag, 0) AS BIGINT) AS docs_flagged,
       ROUND(COALESCE(p.dflag, 0)::DOUBLE / s.nd::DOUBLE, 6) AS flag_rate,
       CAST(COALESCE(p.th, 0) AS BIGINT) AS total_hits,
       ROUND(COALESCE(p.th, 0)::DOUBLE / s.nd::DOUBLE, 6) AS hits_per_doc
FROM spine s
LEFT JOIN per p ON p.source = s.source AND p.category = s.category
ORDER BY s.source, s.category
"""

EXT8_QUERIES.update({"x189_lexicon_flags": q_x189_lexicon_flags})
EXT8_ORACLES.update({"x189_lexicon_flags": SQL_X189})


# ------------------------------- x190: step-indexed session flow


def q_x190_step_flow(spark, sf_dir):
    """Sankey frame (operators/behavior.py:session_step_flow):
    session transition counts indexed by step position 1..5 — the
    positional refinement of x34's global transition matrix, bounded
    at |steps|·|types|² rows however long sessions get."""
    from .operators.behavior import session_step_flow

    ev = _read_events(spark, sf_dir)
    return session_step_flow(ev, max_steps=5).orderBy(
        "step", "from_type", "to_type"
    )


SQL_X190 = """
WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events
),
s AS (
  SELECT *,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sid AS (
  SELECT *,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS sess
  FROM s
),
st AS (
  SELECT ROW_NUMBER() OVER ws AS step,
         event_type AS from_type,
         LEAD(event_type) OVER ws AS to_type
  FROM sid
  WINDOW ws AS (PARTITION BY user_id, sess ORDER BY ts_us, event_id)
)
SELECT CAST(step AS BIGINT) AS step, from_type, to_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM st
WHERE to_type IS NOT NULL AND step <= 5
GROUP BY step, from_type, to_type
ORDER BY step, from_type, to_type
"""

EXT8_QUERIES.update({"x190_step_flow": q_x190_step_flow})
EXT8_ORACLES.update({"x190_step_flow": SQL_X190})


# ------------------------------------ x191: HLL register rollup


def q_x191_hll_rollup(spark, sf_dir):
    """DAU→WAU HLL register rollup (operators/sketch.py:
    hll_merge_rollup): daily active-user registers merged by register
    max into weekly estimates, verified exactly equal to the
    direct-from-rows weekly registers — the mergeability identity
    that lets yesterday's sketch replace yesterday's raw rows at
    100 TB."""
    from .operators.sketch import hll_merge_rollup

    ev = _read_events(spark, sf_dir).select(
        F.expr("ts_us div 86400000000").alias("day"),
        F.expr("(ts_us div 86400000000) div 7").alias("week"),
        "user_id",
    )
    out = hll_merge_rollup(ev, "day", "week", "user_id", b=6)
    return out.withColumnRenamed("coarse", "week").orderBy("week")


_HLL_A = repr(0.7213 / (1.0 + 1.079 / 64) * 64 * 64)

SQL_X191 = f"""
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events
),
h AS (
  SELECT ts_us // 86400000000 AS fine,
         (ts_us // 86400000000) // 7 AS coarse,
         user_id,
         md5('hll:' || CAST(user_id AS VARCHAR)) AS hx
  FROM e
),
r AS (
  SELECT fine, coarse, user_id,
         ('0x' || substr(hx, 1, 2))::BIGINT % 64 AS idx,
         CASE WHEN ('0x' || substr(hx, 3, 8))::BIGINT = 0 THEN 33
              ELSE 33 - length(bin(('0x' || substr(hx, 3, 8))::BIGINT))
         END AS rank
  FROM h
),
fr AS (
  SELECT fine, coarse, idx, MAX(rank) AS reg
  FROM r GROUP BY fine, coarse, idx
),
mg AS (SELECT coarse, idx, MAX(reg) AS reg FROM fr GROUP BY coarse, idx),
dr AS (SELECT coarse, idx, MAX(rank) AS reg FROM r GROUP BY coarse, idx),
em AS (
  SELECT coarse, COUNT(*) AS np, SUM(1.0 / (1::BIGINT << reg)) AS sp
  FROM mg GROUP BY coarse
),
ed AS (
  SELECT coarse, COUNT(*) AS np, SUM(1.0 / (1::BIGINT << reg)) AS sp
  FROM dr GROUP BY coarse
),
mt AS (
  SELECT coarse, COUNT(DISTINCT fine) AS nf,
         COUNT(DISTINCT user_id) AS ex
  FROM r GROUP BY coarse
)
SELECT mt.coarse AS week,
       CAST(mt.nf AS BIGINT) AS n_fine_units,
       CAST(64 AS BIGINT) AS m,
       ROUND({_HLL_A} / (em.sp + (64 - em.np)), 6) AS est_merged,
       ROUND({_HLL_A} / (ed.sp + (64 - ed.np)), 6) AS est_direct,
       ROUND({_HLL_A} / (em.sp + (64 - em.np)), 6)
         = ROUND({_HLL_A} / (ed.sp + (64 - ed.np)), 6)
         AS merge_consistent,
       CAST(mt.ex AS BIGINT) AS exact_distinct
FROM mt JOIN em USING (coarse) JOIN ed USING (coarse)
ORDER BY week
"""

EXT8_QUERIES.update({"x191_hll_rollup": q_x191_hll_rollup})
EXT8_ORACLES.update({"x191_hll_rollup": SQL_X191})


# ----------------------------- x192: deterministic bootstrap SE


def q_x192_bootstrap_se(spark, sf_dir):
    """Deterministic Poisson-bootstrap standard errors (operators/
    sketch.py:bootstrap_se): mean event value per event type with a
    32-replicate hash-seeded bootstrap SE and normal 95% interval —
    uncertainty for massive data without shared RNG state."""
    from .operators.sketch import bootstrap_se

    ev = _read_events(spark, sf_dir)
    return bootstrap_se(
        ev, "value", "event_id", ("event_type",), n_boot=32
    ).orderBy("event_type")


SQL_X192 = """
WITH base AS (
  SELECT event_type, event_id, CAST(value AS DECIMAL(25,12)) AS x
  FROM events WHERE value IS NOT NULL
),
point AS (
  SELECT event_type, COUNT(*) AS n,
         ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS mean
  FROM base GROUP BY event_type
),
rep AS (
  SELECT event_type, event_id, x, unnest(range(0, 32)) AS b FROM base
),
uu AS (
  SELECT event_type, b, x,
         ('0x' || substr(md5('boot:' || CAST(b AS VARCHAR) || ':'
                             || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM rep
),
wt AS (
  SELECT event_type, b, x,
         CASE WHEN u < 0.36787944117144233 THEN 0
              WHEN u < 0.7357588823428847 THEN 1
              WHEN u < 0.9196986029286058 THEN 2
              WHEN u < 0.9810118431238462 THEN 3
              WHEN u < 0.9963401531726563 THEN 4
              WHEN u < 0.9994058151824183 THEN 5
              ELSE 6 END AS w
  FROM uu
),
rm AS (
  SELECT event_type, b,
         CAST(SUM(x * CAST(w AS DECIMAL(4,0))) AS DOUBLE)
           / CAST(SUM(w) AS DOUBLE) AS m
  FROM wt WHERE w > 0
  GROUP BY event_type, b
),
mo AS (
  SELECT event_type, COUNT(*) AS nb,
         SUM(CAST(m AS DECIMAL(15,8))) AS s1,
         SUM(CAST(m AS DECIMAL(20,8)) * CAST(m AS DECIMAL(15,8))) AS s2
  FROM rm GROUP BY event_type
),
se AS (
  SELECT event_type,
         ROUND(
           CASE WHEN nb > 1
                     AND s2::DOUBLE / nb::DOUBLE
                         - (s1::DOUBLE / nb::DOUBLE)
                           * (s1::DOUBLE / nb::DOUBLE) > 0
                THEN sqrt((s2::DOUBLE / nb::DOUBLE
                           - (s1::DOUBLE / nb::DOUBLE)
                             * (s1::DOUBLE / nb::DOUBLE))
                          * nb::DOUBLE / (nb::DOUBLE - 1.0))
                ELSE 0.0 END, 6) AS boot_se
  FROM mo
)
SELECT p.event_type,
       CAST(p.n AS BIGINT) AS n,
       p.mean,
       se.boot_se,
       ROUND(p.mean - 1.96 * se.boot_se, 6) AS ci_lo,
       ROUND(p.mean + 1.96 * se.boot_se, 6) AS ci_hi
FROM point p JOIN se USING (event_type)
ORDER BY p.event_type
"""

EXT8_QUERIES.update({"x192_bootstrap_se": q_x192_bootstrap_se})
EXT8_ORACLES.update({"x192_bootstrap_se": SQL_X192})


# ----------------------------- x193: 1-Wasserstein drift


def q_x193_wasserstein(spark, sf_dir):
    """Exact earth-mover distance (operators/sketch.py:wasserstein1)
    between even- and odd-user value distributions per event type —
    the drift metric that weighs HOW FAR mass moved, complementing
    PSI (x58), JS (x61), and KS (x64) which only see share or
    sup-norm changes."""
    from .operators.sketch import wasserstein1

    ev = _read_events(spark, sf_dir).where(F.col("value").isNotNull())
    a = ev.where(F.col("user_id") % 2 == 0).select("event_type", "value")
    b = ev.where(F.col("user_id") % 2 == 1).select("event_type", "value")
    return wasserstein1(a, b, "value", ("event_type",)).orderBy(
        "event_type"
    )


SQL_X193 = """
WITH e AS (
  SELECT event_type, user_id, value AS v FROM events
  WHERE value IS NOT NULL
),
t AS (
  SELECT event_type,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a,
         CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS b,
         v
  FROM e
),
pv AS (
  SELECT event_type, v, SUM(a)::BIGINT AS ca, SUM(b)::BIGINT AS cb
  FROM t WHERE a = 1 OR b = 1 GROUP BY event_type, v
),
win AS (
  SELECT event_type, v, ca, cb,
         SUM(ca) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cuma,
         SUM(cb) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cumb,
         LEAD(v) OVER (PARTITION BY event_type ORDER BY v) AS nv,
         SUM(ca) OVER (PARTITION BY event_type) AS na,
         SUM(cb) OVER (PARTITION BY event_type) AS nb
  FROM pv
)
SELECT event_type,
       CAST(MAX(na) AS BIGINT) AS n_a,
       CAST(MAX(nb) AS BIGINT) AS n_b,
       CASE WHEN MAX(na) > 0 AND MAX(nb) > 0 THEN
         ROUND(CAST(COALESCE(SUM(
           CASE WHEN nv IS NOT NULL THEN
             CAST(abs(cuma::DOUBLE / na::DOUBLE - cumb::DOUBLE / nb::DOUBLE)
                  * (nv::DOUBLE - v::DOUBLE) AS DECIMAL(38,12))
           END), 0) AS DOUBLE), 6)
       END AS w1
FROM win
GROUP BY event_type
ORDER BY event_type
"""

EXT8_QUERIES.update({"x193_wasserstein": q_x193_wasserstein})
EXT8_ORACLES.update({"x193_wasserstein": SQL_X193})


# ------------------------------ x194: Heaps'-law vocab growth


def q_x194_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary growth fit (operators/text.py:heaps_law):
    cumulative vocabulary vs cumulative tokens over ten ingestion
    slices with the OLS log-log β — the scaling-law twin of the Zipf
    fit (x147) and the tokenizer-vocab sizing projection."""
    from .operators.text import heaps_law

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return heaps_law(docs, "text", "doc_id", n_buckets=10).orderBy("bucket")


SQL_X194 = """
WITH mm AS (
  SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents
),
toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS term
  FROM documents
),
tb AS (
  SELECT LEAST(9, CAST(FLOOR((t.doc_id - mm.lo)::DOUBLE * 10.0
                             / (mm.hi - mm.lo + 1)::DOUBLE) AS INT))
           AS bucket,
         t.term
  FROM toks t CROSS JOIN mm
),
per_tok AS (SELECT bucket, COUNT(*) AS ntok FROM tb GROUP BY bucket),
first_b AS (SELECT term, MIN(bucket) AS bucket FROM tb GROUP BY term),
per_new AS (SELECT bucket, COUNT(*) AS nnew FROM first_b GROUP BY bucket),
docs_b AS (
  SELECT LEAST(9, CAST(FLOOR((d.doc_id - mm.lo)::DOUBLE * 10.0
                             / (mm.hi - mm.lo + 1)::DOUBLE) AS INT))
           AS bucket,
         COUNT(*) AS n_docs
  FROM documents d CROSS JOIN mm
  GROUP BY 1
),
base AS (
  SELECT d.bucket, d.n_docs,
         COALESCE(pt.ntok, 0) AS ntok, COALESCE(pn.nnew, 0) AS nnew
  FROM docs_b d
  LEFT JOIN per_tok pt ON pt.bucket = d.bucket
  LEFT JOIN per_new pn ON pn.bucket = d.bucket
),
cum AS (
  SELECT bucket, n_docs,
         CAST(SUM(ntok) OVER (ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens,
         CAST(SUM(nnew) OVER (ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_vocab
  FROM base
),
pts AS (
  SELECT bucket, n_docs, cum_tokens, cum_vocab,
         CAST(ln(cum_tokens::DOUBLE) AS DECIMAL(38,18)) AS x,
         CAST(ln(cum_vocab::DOUBLE) AS DECIMAL(38,18)) AS y,
         CAST(ln(cum_tokens::DOUBLE) * ln(cum_vocab::DOUBLE)
              AS DECIMAL(38,18)) AS xy,
         CAST(ln(cum_tokens::DOUBLE) * ln(cum_tokens::DOUBLE)
              AS DECIMAL(38,18)) AS xx,
         CAST(ln(cum_vocab::DOUBLE) * ln(cum_vocab::DOUBLE)
              AS DECIMAL(38,18)) AS yy
  FROM cum WHERE cum_tokens > 0 AND cum_vocab > 0
),
mo AS (
  SELECT COUNT(*)::DOUBLE AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(xy) AS DOUBLE) AS sxy, CAST(SUM(xx) AS DOUBLE) AS sxx,
         CAST(SUM(yy) AS DOUBLE) AS syy
  FROM pts
)
SELECT CAST(p.bucket AS BIGINT) AS bucket,
       CAST(p.n_docs AS BIGINT) AS n_docs,
       p.cum_tokens, p.cum_vocab,
       ROUND((mo.n * mo.sxy - mo.sx * mo.sy)
             / (mo.n * mo.sxx - mo.sx * mo.sx), 6) AS beta,
       ROUND(exp((mo.sy - (mo.n * mo.sxy - mo.sx * mo.sy)
                          / (mo.n * mo.sxx - mo.sx * mo.sx) * mo.sx)
                 / mo.n), 6) AS k,
       ROUND((mo.n * mo.sxy - mo.sx * mo.sy)
             * (mo.n * mo.sxy - mo.sx * mo.sy)
             / ((mo.n * mo.sxx - mo.sx * mo.sx)
                * (mo.n * mo.syy - mo.sy * mo.sy)), 6) AS r2
FROM pts p CROSS JOIN mo
ORDER BY bucket
"""

EXT8_QUERIES.update({"x194_heaps_law": q_x194_heaps_law})
EXT8_ORACLES.update({"x194_heaps_law": SQL_X194})


# --------------------------------- x195: Benjamini–Hochberg FDR


def q_x195_fdr(spark, sf_dir):
    """Benjamini–Hochberg FDR over x159's Mann-Whitney family
    (operators/quality.py:bh_fdr + normal_p_two_sided): 24
    hour-of-day purchase-vs-click tests, normal p-values via the
    engine-portable Abramowitz–Stegun erf, ranked and
    step-up-adjusted — the multiple-testing guard an experimentation
    platform applies before declaring any segment significant."""
    from .operators.quality import bh_fdr, normal_p_two_sided
    from .operators.sketch import mann_whitney_u

    ev = _read_events(spark, sf_dir)
    ev = ev.withColumn(
        "hr",
        (
            (F.col("ts_us") - (F.col("ts_us") % F.lit(3_600_000_000)))
            / F.lit(3_600_000_000)
        ).cast("long")
        % 24,
    )
    mw = mann_whitney_u(
        ev, "value", "event_type", "purchase", "click",
        partition_cols=("hr",),
    )
    tests = mw.select(
        "hr", normal_p_two_sided(F.col("z")).alias("p")
    ).where(F.col("p").isNotNull())
    return bh_fdr(tests, "p", ("hr",), q=0.05)


SQL_X195 = """
WITH b AS (
  SELECT ((epoch_us(ts) - (epoch_us(ts) % 3600000000))
          / 3600000000)::BIGINT % 24 AS hr,
         value AS v, event_type AS g
  FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
),
pv AS (
  SELECT hr, v,
         SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS ca,
         SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM b GROUP BY hr, v
),
r AS (
  SELECT hr, ca, cb,
         2 * COALESCE(SUM(ca + cb) OVER (
               PARTITION BY hr ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (ca + cb) + 1 AS r2
  FROM pv
),
a AS (
  SELECT hr, SUM(ca)::BIGINT AS n_a, SUM(cb)::BIGINT AS n_b,
         SUM(ca * r2)::BIGINT AS r2a
  FROM r GROUP BY hr
),
zt AS (
  SELECT hr,
         ROUND((r2a::DOUBLE / 2.0 - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0
                - n_a::DOUBLE * n_b::DOUBLE / 2.0)
               / sqrt(n_a::DOUBLE * n_b::DOUBLE
                      * (n_a::DOUBLE + n_b::DOUBLE + 1.0) / 12.0), 6) AS z
  FROM a
),
pp AS (
  SELECT hr,
         2.0 * (1.0 - 0.5 * (1.0 + (1.0
           - ((((1.061405429
                 * (1.0 / (1.0 + 0.3275911 * (abs(z) * 0.7071067811865476)))
                 + (-1.453152027))
                * (1.0 / (1.0 + 0.3275911 * (abs(z) * 0.7071067811865476)))
                + 1.421413741)
               * (1.0 / (1.0 + 0.3275911 * (abs(z) * 0.7071067811865476)))
               + (-0.284496736))
              * (1.0 / (1.0 + 0.3275911 * (abs(z) * 0.7071067811865476)))
              + 0.254829592)
             * (1.0 / (1.0 + 0.3275911 * (abs(z) * 0.7071067811865476)))
             * exp(-((abs(z) * 0.7071067811865476)
                     * (abs(z) * 0.7071067811865476)))))) AS p
  FROM zt WHERE z IS NOT NULL
),
ranked AS (
  SELECT hr, p,
         ROW_NUMBER() OVER (ORDER BY p ASC, hr ASC) AS rank,
         COUNT(*) OVER () AS m
  FROM pp
),
stepped AS (
  SELECT *, p * m::DOUBLE / rank::DOUBLE AS s FROM ranked
),
adj AS (
  SELECT *,
         LEAST(1.0, MIN(s) OVER (ORDER BY rank DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS pa
  FROM stepped
)
SELECT hr,
       ROUND(p, 6) AS p_value,
       CAST(rank AS BIGINT) AS rank,
       CAST(m AS BIGINT) AS m,
       ROUND(pa, 6) AS p_adjusted,
       pa <= 0.05 AS significant
FROM adj
ORDER BY rank
"""

EXT8_QUERIES.update({"x195_fdr": q_x195_fdr})
EXT8_ORACLES.update({"x195_fdr": SQL_X195})


# ------------------------------------ x196: SPRT sequential test


def q_x196_sprt(spark, sf_dir):
    """Wald SPRT early-stopping decision per event type (operators/
    behavior.py:sprt_decision): walk each type's event stream in time
    order testing H1: P(value>500) = 0.55 vs H0: 0.45 at α = β = 0.05
    — the sequential-testing primitive that stops experiments early
    with controlled error instead of peeking at fixed-horizon tests."""
    from .operators.behavior import sprt_decision

    ev = _read_events(spark, sf_dir).where(F.col("value").isNotNull())
    out = sprt_decision(
        ev,
        F.col("value") > 500.0,
        ("event_type",),
        ("ts_us", "event_id"),
        p0=0.45, p1=0.55, alpha=0.05, beta=0.05,
    )
    return out.orderBy("event_type")


def _sql_x196() -> str:
    import math

    l1 = repr(math.log(0.55 / 0.45))
    l0 = repr(math.log(0.45 / 0.55))
    ln_a = repr(math.log(0.95 / 0.05))
    ln_b = repr(math.log(0.05 / 0.95))
    return f"""
WITH e AS (
  SELECT event_type, event_id, value,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events WHERE value IS NOT NULL
),
st AS (
  SELECT event_type,
         ROW_NUMBER() OVER w AS rn,
         SUM(CASE WHEN value > 500 THEN 1 ELSE 0 END) OVER (
           PARTITION BY event_type ORDER BY ts_us, event_id
           ROWS UNBOUNDED PRECEDING) AS cs
  FROM e
  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)
),
mk AS (
  SELECT event_type, rn, cs,
         cs::DOUBLE * {l1} + (rn - cs)::DOUBLE * {l0} AS llr
  FROM st
),
ag AS (
  SELECT event_type, MAX(rn) AS n_total, MAX(cs) AS n_success,
         MIN(CASE WHEN llr >= {ln_a} THEN rn END) AS r1,
         MIN(CASE WHEN llr <= {ln_b} THEN rn END) AS r0
  FROM mk GROUP BY event_type
)
SELECT event_type,
       CAST(n_total AS BIGINT) AS n_total,
       CAST(n_success AS BIGINT) AS n_success,
       CASE WHEN r1 IS NULL AND r0 IS NULL THEN 'continue'
            WHEN r0 IS NULL OR (r1 IS NOT NULL AND r1 <= r0)
              THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       CAST(LEAST(COALESCE(r1, r0), COALESCE(r0, r1)) AS BIGINT)
         AS n_at_decision,
       ROUND(n_success::DOUBLE * {l1}
             + (n_total - n_success)::DOUBLE * {l0}, 6) AS llr_final
FROM ag
ORDER BY event_type
"""


EXT8_QUERIES.update({"x196_sprt": q_x196_sprt})
EXT8_ORACLES.update({"x196_sprt": _sql_x196()})


# ------------------------------ x197: SMD covariate balance


def q_x197_smd_balance(spark, sf_dir):
    """Standardized-mean-difference randomization audit (operators/
    quality.py:smd_balance): account balance and nation key between
    the even/odd customer-key split — the covariate balance check
    read BEFORE any treatment effect (|SMD| > 0.1 means the split
    explains differences, not the treatment)."""
    from .operators.quality import smd_balance

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumn(
        "grp",
        F.when(F.col("c_custkey") % 2 == 0, F.lit("a")).otherwise(
            F.lit("b")
        ),
    )
    out = smd_balance(
        cust, "grp", "a", "b", ("c_acctbal", "c_nationkey")
    )
    return out.orderBy("covariate")


SQL_X197 = """
WITH m AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
         'c_acctbal' AS cov, c_acctbal::DOUBLE AS v
  FROM customer
  UNION ALL
  SELECT CASE WHEN c_custkey % 2 = 0 THEN 'a' ELSE 'b' END AS g,
         'c_nationkey' AS cov, c_nationkey::DOUBLE AS v
  FROM customer
),
f AS (SELECT * FROM m WHERE v IS NOT NULL),
per AS (
  SELECT cov, g, COUNT(*) AS n,
         SUM(CAST(v AS DECIMAL(25,12))) AS s1,
         SUM(CAST(v AS DECIMAL(25,12)) * CAST(v AS DECIMAL(12,6))) AS s2
  FROM f GROUP BY cov, g
),
sided AS (
  SELECT cov,
         MAX(CASE WHEN g = 'a' THEN n END) AS na,
         MAX(CASE WHEN g = 'b' THEN n END) AS nb,
         MAX(CASE WHEN g = 'a'
                  THEN s1::DOUBLE / n::DOUBLE END) AS ma,
         MAX(CASE WHEN g = 'b'
                  THEN s1::DOUBLE / n::DOUBLE END) AS mb,
         MAX(CASE WHEN g = 'a'
                  THEN s2::DOUBLE / n::DOUBLE
                       - (s1::DOUBLE / n::DOUBLE)
                         * (s1::DOUBLE / n::DOUBLE) END) AS va,
         MAX(CASE WHEN g = 'b'
                  THEN s2::DOUBLE / n::DOUBLE
                       - (s1::DOUBLE / n::DOUBLE)
                         * (s1::DOUBLE / n::DOUBLE) END) AS vb
  FROM per GROUP BY cov
)
SELECT cov AS covariate,
       CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       ROUND(ma, 6) AS mean_a,
       ROUND(mb, 6) AS mean_b,
       ROUND(sqrt((va + vb) / 2.0), 6) AS sd_pooled,
       ROUND(CASE WHEN sqrt((va + vb) / 2.0) = 0 THEN NULL
                  ELSE (ma - mb) / sqrt((va + vb) / 2.0) END, 6) AS smd,
       CASE WHEN sqrt((va + vb) / 2.0) = 0 THEN NULL
            ELSE abs((ma - mb) / sqrt((va + vb) / 2.0)) <= 0.1
       END AS balanced
FROM sided
ORDER BY covariate
"""

EXT8_QUERIES.update({"x197_smd_balance": q_x197_smd_balance})
EXT8_ORACLES.update({"x197_smd_balance": SQL_X197})


# --------------------------------- x198: padding-waste report


def q_x198_padding_waste(spark, sf_dir):
    """Length-bucketed padding-waste comparison (operators/mixing.py:
    padding_waste): document token lengths padded under a quantized
    {32,64,128,256} bucket scheme vs a single 256 cap — the number
    the sequence-bucketing decision is made on before training batch
    assembly."""
    from .operators.mixing import padding_waste
    from .operators.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(tokens(F.col("text"))).alias("len")
    )
    a = padding_waste(docs, "len", [32, 64, 128, 256], scheme="quantized")
    b = padding_waste(docs, "len", [256], scheme="single_cap")
    return a.unionByName(b).orderBy("scheme", "cap")


SQL_X198 = """
WITH lens AS (
  SELECT doc_id,
         len(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS l
  FROM documents
),
q AS (
  SELECT 'quantized' AS scheme,
         CASE WHEN l <= 32 THEN 32
              WHEN l <= 64 THEN 64
              WHEN l <= 128 THEN 128
              ELSE 256 END AS cap,
         LEAST(l, 256) AS kept,
         l - LEAST(l, 256) AS trunc
  FROM lens
  UNION ALL
  SELECT 'single_cap', 256, LEAST(l, 256), l - LEAST(l, 256) FROM lens
),
per AS (
  SELECT scheme, cap, COUNT(*) AS n_seqs, SUM(kept) AS real_tokens,
         SUM(trunc) AS trunc_tokens
  FROM q GROUP BY scheme, cap
)
SELECT scheme,
       CAST(cap AS BIGINT) AS cap,
       CAST(n_seqs AS BIGINT) AS n_seqs,
       CAST(real_tokens AS BIGINT) AS real_tokens,
       CAST(n_seqs * cap AS BIGINT) AS padded_tokens,
       CAST(n_seqs * cap - real_tokens AS BIGINT) AS pad_waste,
       CAST(trunc_tokens AS BIGINT) AS trunc_tokens,
       ROUND((n_seqs * cap - real_tokens)::DOUBLE
             / (n_seqs * cap)::DOUBLE, 6) AS waste_share
FROM per
ORDER BY scheme, cap
"""

EXT8_QUERIES.update({"x198_padding_waste": q_x198_padding_waste})
EXT8_ORACLES.update({"x198_padding_waste": SQL_X198})


# ---------------------------------- x199: IPF raking weights


def q_x199_raking(spark, sf_dir):
    """Two-way IPF raking (operators/mixing.py:raking_weights): a 20%
    hash-drawn eval split reweighted so its (lang × source) marginals
    match the full corpus — the survey-statistics repair applied
    before reading any benchmark number off a drifted split."""
    from .operators.mixing import raking_weights, uniform_hash01

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sample = docs.where(
        uniform_hash01(F.col("doc_id"), "ipf") < 0.2
    ).select("lang", "source")
    pop = docs.select("lang", "source")
    out = raking_weights(sample, pop, "lang", "source", iters=2)
    return out.orderBy("lang", "source")


SQL_X199 = """
WITH s AS (
  SELECT lang, source FROM documents
  WHERE ('0x' || substr(md5('ipf:' || CAST(doc_id AS VARCHAR)), 1, 8))
          ::BIGINT / 4294967296.0 < 0.2
),
cells AS (SELECT lang, source, COUNT(*) AS n_cell FROM s GROUP BY lang, source),
ns AS (SELECT SUM(n_cell) AS nsamp FROM cells),
pa AS (SELECT lang, COUNT(*) AS pa FROM documents GROUP BY lang),
pb AS (SELECT source, COUNT(*) AS pb FROM documents GROUP BY source),
np AS (SELECT COUNT(*) AS np FROM documents),
ta AS (
  SELECT pa.lang,
         pa.pa::DOUBLE * ns.nsamp::DOUBLE / np.np::DOUBLE AS ta
  FROM pa CROSS JOIN np CROSS JOIN ns
),
tb AS (
  SELECT pb.source,
         pb.pb::DOUBLE * ns.nsamp::DOUBLE / np.np::DOUBLE AS tb
  FROM pb CROSS JOIN np CROSS JOIN ns
),
w0 AS (SELECT lang, source, n_cell, n_cell::DOUBLE AS w FROM cells),
r1 AS (SELECT lang, SUM(CAST(w AS DECIMAL(28,12))) AS ra FROM w0 GROUP BY lang),
w1 AS (
  SELECT w0.lang, w0.source, w0.n_cell,
         w0.w * ta.ta / CAST(r1.ra AS DOUBLE) AS w
  FROM w0 JOIN r1 USING (lang) JOIN ta USING (lang)
),
c1 AS (SELECT source, SUM(CAST(w AS DECIMAL(28,12))) AS rb FROM w1 GROUP BY source),
w2 AS (
  SELECT w1.lang, w1.source, w1.n_cell,
         w1.w * tb.tb / CAST(c1.rb AS DOUBLE) AS w
  FROM w1 JOIN c1 USING (source) JOIN tb USING (source)
),
r2 AS (SELECT lang, SUM(CAST(w AS DECIMAL(28,12))) AS ra FROM w2 GROUP BY lang),
w3 AS (
  SELECT w2.lang, w2.source, w2.n_cell,
         w2.w * ta.ta / CAST(r2.ra AS DOUBLE) AS w
  FROM w2 JOIN r2 USING (lang) JOIN ta USING (lang)
),
c2 AS (SELECT source, SUM(CAST(w AS DECIMAL(28,12))) AS rb FROM w3 GROUP BY source),
w4 AS (
  SELECT w3.lang, w3.source, w3.n_cell,
         w3.w * tb.tb / CAST(c2.rb AS DOUBLE) AS w
  FROM w3 JOIN c2 USING (source) JOIN tb USING (source)
)
SELECT lang, source,
       CAST(n_cell AS BIGINT) AS n_cell,
       ROUND(w / n_cell::DOUBLE, 6) AS weight,
       ROUND(w, 6) AS cell_weight
FROM w4
ORDER BY lang, source
"""

EXT8_QUERIES.update({"x199_raking": q_x199_raking})
EXT8_ORACLES.update({"x199_raking": SQL_X199})


# ----------------------- x200: vocabulary coverage (GT / Chao1)


def q_x200_vocab_coverage(spark, sf_dir):
    """Good-Turing unseen mass + Chao1 richness per source
    (operators/text.py:vocabulary_coverage): is each source's
    vocabulary nearly exhausted (P₀ → 0) or barely sampled? — the
    coverage answer Heaps' β (x194) only trends toward."""
    from .operators.text import vocabulary_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocabulary_coverage(docs, "text", "doc_id", ("source",)).orderBy(
        "source"
    )


SQL_X200 = """
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS term
  FROM documents
),
per AS (
  SELECT source, term, COUNT(*) AS c FROM toks GROUP BY source, term
),
agg AS (
  SELECT source,
         SUM(c) AS n_tokens,
         COUNT(*) AS n_types,
         SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS n2
  FROM per GROUP BY source
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(n1 AS BIGINT) AS n_singletons,
       CAST(n2 AS BIGINT) AS n_doubletons,
       ROUND(n1::DOUBLE / n_tokens::DOUBLE, 6) AS p_unseen,
       ROUND(n_types::DOUBLE
             + n1::DOUBLE * (n1::DOUBLE - 1.0)
               / (2.0 * (n2::DOUBLE + 1.0)), 6) AS chao1_types
FROM agg
ORDER BY source
"""

EXT8_QUERIES.update({"x200_vocab_coverage": q_x200_vocab_coverage})
EXT8_ORACLES.update({"x200_vocab_coverage": SQL_X200})


# ------------------------------ x201: quantile treatment effects


def q_x201_qte(spark, sf_dir):
    """Quantile treatment effects (operators/sketch.py:
    quantile_treatment_effects): per event type, the even-vs-odd-user
    value distribution difference at five quantiles — WHERE the
    distribution moved, the readout the mean test (x66) averages away
    and MWU (x159) only flags."""
    from .operators.sketch import quantile_treatment_effects

    ev = _read_events(spark, sf_dir).where(F.col("value").isNotNull())
    ev = ev.withColumn(
        "arm",
        F.when(F.col("user_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")),
    )
    out = quantile_treatment_effects(
        ev, "value", "arm", "a", "b", ("event_type",),
        probs=(0.1, 0.25, 0.5, 0.75, 0.9),
    )
    return out.orderBy("event_type", "p")


SQL_X201 = """
WITH e AS (
  SELECT event_type,
         CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
         value
  FROM events WHERE value IS NOT NULL
),
q AS (
  SELECT event_type, arm,
         COUNT(value) AS n,
         ROUND(quantile_cont(value, 0.1) * 1000000.0) / 1000000.0 AS q10,
         ROUND(quantile_cont(value, 0.25) * 1000000.0) / 1000000.0 AS q25,
         ROUND(quantile_cont(value, 0.5) * 1000000.0) / 1000000.0 AS q50,
         ROUND(quantile_cont(value, 0.75) * 1000000.0) / 1000000.0 AS q75,
         ROUND(quantile_cont(value, 0.9) * 1000000.0) / 1000000.0 AS q90
  FROM e GROUP BY event_type, arm
),
w AS (
  SELECT event_type,
         MAX(CASE WHEN arm = 'a' THEN n END) AS n_a,
         MAX(CASE WHEN arm = 'b' THEN n END) AS n_b,
         MAX(CASE WHEN arm = 'a' THEN q10 END) AS a10,
         MAX(CASE WHEN arm = 'b' THEN q10 END) AS b10,
         MAX(CASE WHEN arm = 'a' THEN q25 END) AS a25,
         MAX(CASE WHEN arm = 'b' THEN q25 END) AS b25,
         MAX(CASE WHEN arm = 'a' THEN q50 END) AS a50,
         MAX(CASE WHEN arm = 'b' THEN q50 END) AS b50,
         MAX(CASE WHEN arm = 'a' THEN q75 END) AS a75,
         MAX(CASE WHEN arm = 'b' THEN q75 END) AS b75,
         MAX(CASE WHEN arm = 'a' THEN q90 END) AS a90,
         MAX(CASE WHEN arm = 'b' THEN q90 END) AS b90
  FROM q GROUP BY event_type
),
long AS (
  SELECT event_type, 0.1 AS p, n_a, n_b, a10 AS q_a, b10 AS q_b FROM w
  UNION ALL
  SELECT event_type, 0.25, n_a, n_b, a25, b25 FROM w
  UNION ALL
  SELECT event_type, 0.5, n_a, n_b, a50, b50 FROM w
  UNION ALL
  SELECT event_type, 0.75, n_a, n_b, a75, b75 FROM w
  UNION ALL
  SELECT event_type, 0.9, n_a, n_b, a90, b90 FROM w
)
SELECT event_type,
       CAST(p AS DOUBLE) AS p,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       q_a, q_b,
       ROUND(q_b - q_a, 6) AS qte
FROM long
ORDER BY event_type, p
"""

EXT8_QUERIES.update({"x201_qte": q_x201_qte})
EXT8_ORACLES.update({"x201_qte": SQL_X201})


# --------------------- x202: group-sequential Pocock interim looks


def q_x202_group_sequential(spark, sf_dir):
    """Group-sequential interim analysis (operators/behavior.py:
    group_sequential_looks): five planned Pocock looks per event type
    testing P(value > 500) = 0.5 — the scheduled-peeking counterpart
    to x196's continuous SPRT, with family-wise α held at 0.05 by the
    constant 2.413 critical value."""
    from .operators.behavior import group_sequential_looks

    ev = _read_events(spark, sf_dir).where(F.col("value").isNotNull())
    out = group_sequential_looks(
        ev,
        F.col("value") > 500.0,
        ("event_type",),
        ("ts_us", "event_id"),
        p0=0.5,
        n_looks=5,
    )
    return out.orderBy("event_type", "look")


def _sql_x202() -> str:
    v = repr(0.5 * (1.0 - 0.5))
    return f"""
WITH e AS (
  SELECT event_type, event_id, value,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events WHERE value IS NOT NULL
),
st AS (
  SELECT event_type,
         ROW_NUMBER() OVER w AS rn,
         SUM(CASE WHEN value > 500 THEN 1 ELSE 0 END) OVER (
           PARTITION BY event_type ORDER BY ts_us, event_id
           ROWS UNBOUNDED PRECEDING) AS cs
  FROM e
  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)
),
tot AS (SELECT event_type, MAX(rn) AS n FROM st GROUP BY event_type),
lk AS (
  SELECT st.event_type, st.rn, st.cs,
         (st.rn * 5 + tot.n - 1) // tot.n AS look
  FROM st JOIN tot USING (event_type)
),
per AS (
  SELECT event_type, look,
         MAX(rn) AS n_at_look,
         max_by(cs, rn) AS successes
  FROM lk GROUP BY event_type, look
)
SELECT event_type,
       CAST(look AS BIGINT) AS look,
       CAST(n_at_look AS BIGINT) AS n_at_look,
       CAST(successes AS BIGINT) AS successes,
       ROUND((successes::DOUBLE / n_at_look::DOUBLE - 0.5)
             * sqrt(n_at_look::DOUBLE) / sqrt({v}), 6) AS z,
       abs((successes::DOUBLE / n_at_look::DOUBLE - 0.5)
           * sqrt(n_at_look::DOUBLE) / sqrt({v})) > 2.413 AS crossed,
       2.413 AS bound
FROM per
ORDER BY event_type, look
"""


EXT8_QUERIES.update({"x202_group_sequential": q_x202_group_sequential})
EXT8_ORACLES.update({"x202_group_sequential": _sql_x202()})


# ------------------------------- x203: partial correlation


def q_x203_partial_corr(spark, sf_dir):
    """Partial correlation (operators/sketch.py:partial_correlation):
    per market segment, does account balance correlate with total
    spend BEYOND what order count already explains — the confounder
    check run before any correlation ships as signal."""
    from .operators.sketch import partial_correlation

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend"),
    )
    base = cust.join(
        per_cust, cust["c_custkey"] == per_cust["ck"]
    ).select(
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("bal"),
        "spend",
        "n_orders",
    )
    out = partial_correlation(
        base, "bal", "spend", "n_orders", ("c_mktsegment",)
    )
    return out.orderBy("c_mktsegment")


SQL_X203 = """
WITH per_cust AS (
  SELECT o_custkey AS ck,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
),
b AS (
  SELECT c.c_mktsegment,
         c.c_acctbal::DOUBLE AS x, p.spend AS y, p.n_orders AS z
  FROM customer c JOIN per_cust p ON c.c_custkey = p.ck
  WHERE c.c_acctbal IS NOT NULL AND p.spend IS NOT NULL
        AND p.n_orders IS NOT NULL
),
m AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(28,6))) AS sx,
         SUM(CAST(y AS DECIMAL(28,6))) AS sy,
         SUM(CAST(z AS DECIMAL(28,6))) AS sz,
         SUM(CAST(x * y AS DECIMAL(28,6))) AS sxy,
         SUM(CAST(x * z AS DECIMAL(28,6))) AS sxz,
         SUM(CAST(y * z AS DECIMAL(28,6))) AS syz,
         SUM(CAST(x * x AS DECIMAL(28,6))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(28,6))) AS syy,
         SUM(CAST(z * z AS DECIMAL(28,6))) AS szz
  FROM b GROUP BY c_mktsegment
),
r AS (
  SELECT c_mktsegment, n,
         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
           / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                  * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
           AS rxy,
         (n::DOUBLE * sxz::DOUBLE - sx::DOUBLE * sz::DOUBLE)
           / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                  * (n::DOUBLE * szz::DOUBLE - sz::DOUBLE * sz::DOUBLE))
           AS rxz,
         (n::DOUBLE * syz::DOUBLE - sy::DOUBLE * sz::DOUBLE)
           / sqrt((n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
                  * (n::DOUBLE * szz::DOUBLE - sz::DOUBLE * sz::DOUBLE))
           AS ryz
  FROM m
)
SELECT c_mktsegment,
       CAST(n AS BIGINT) AS n,
       ROUND(rxy, 6) AS r_xy,
       ROUND(rxz, 6) AS r_xz,
       ROUND(ryz, 6) AS r_yz,
       ROUND((rxy - rxz * ryz)
             / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
         AS r_xy_given_z
FROM r
ORDER BY c_mktsegment
"""

EXT8_QUERIES.update({"x203_partial_corr": q_x203_partial_corr})
EXT8_ORACLES.update({"x203_partial_corr": SQL_X203})


# -------------------------- x204: raking weight diagnostics


def q_x204_weight_diag(spark, sf_dir):
    """Kish weight diagnostics (operators/sketch.py:
    weight_diagnostics) on the x199 raking output: effective sample
    size, design effect, and weight CV per language — the health
    check that catches marginal-matching weights quietly destroying
    the split's statistical power."""
    from .operators.mixing import raking_weights, uniform_hash01
    from .operators.sketch import weight_diagnostics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sample = docs.where(
        uniform_hash01(F.col("doc_id"), "ipf") < 0.2
    ).select("lang", "source")
    pop = docs.select("lang", "source")
    cells = raking_weights(sample, pop, "lang", "source", iters=2)
    # expand cell weights to per-row weights: n_cell rows at `weight`
    rows = cells.select(
        "lang",
        F.col("weight"),
        F.explode(F.sequence(F.lit(1), F.col("n_cell"))).alias("__i"),
    )
    return weight_diagnostics(rows, "weight", ("lang",)).orderBy("lang")


SQL_X204 = """
WITH s AS (
  SELECT lang, source FROM documents
  WHERE ('0x' || substr(md5('ipf:' || CAST(doc_id AS VARCHAR)), 1, 8))
          ::BIGINT / 4294967296.0 < 0.2
),
cells AS (SELECT lang, source, COUNT(*) AS n_cell FROM s GROUP BY lang, source),
ns AS (SELECT SUM(n_cell) AS nsamp FROM cells),
pa AS (SELECT lang, COUNT(*) AS pa FROM documents GROUP BY lang),
pb AS (SELECT source, COUNT(*) AS pb FROM documents GROUP BY source),
np AS (SELECT COUNT(*) AS np FROM documents),
ta AS (
  SELECT pa.lang,
         pa.pa::DOUBLE * ns.nsamp::DOUBLE / np.np::DOUBLE AS ta
  FROM pa CROSS JOIN np CROSS JOIN ns
),
tb AS (
  SELECT pb.source,
         pb.pb::DOUBLE * ns.nsamp::DOUBLE / np.np::DOUBLE AS tb
  FROM pb CROSS JOIN np CROSS JOIN ns
),
w0 AS (SELECT lang, source, n_cell, n_cell::DOUBLE AS w FROM cells),
r1 AS (SELECT lang, SUM(CAST(w AS DECIMAL(28,12))) AS ra FROM w0 GROUP BY lang),
w1 AS (
  SELECT w0.lang, w0.source, w0.n_cell,
         w0.w * ta.ta / CAST(r1.ra AS DOUBLE) AS w
  FROM w0 JOIN r1 USING (lang) JOIN ta USING (lang)
),
c1 AS (SELECT source, SUM(CAST(w AS DECIMAL(28,12))) AS rb FROM w1 GROUP BY source),
w2 AS (
  SELECT w1.lang, w1.source, w1.n_cell,
         w1.w * tb.tb / CAST(c1.rb AS DOUBLE) AS w
  FROM w1 JOIN c1 USING (source) JOIN tb USING (source)
),
r2 AS (SELECT lang, SUM(CAST(w AS DECIMAL(28,12))) AS ra FROM w2 GROUP BY lang),
w3 AS (
  SELECT w2.lang, w2.source, w2.n_cell,
         w2.w * ta.ta / CAST(r2.ra AS DOUBLE) AS w
  FROM w2 JOIN r2 USING (lang) JOIN ta USING (lang)
),
c2 AS (SELECT source, SUM(CAST(w AS DECIMAL(28,12))) AS rb FROM w3 GROUP BY source),
w4 AS (
  SELECT w3.lang, w3.source, w3.n_cell,
         w3.w * tb.tb / CAST(c2.rb AS DOUBLE) AS w
  FROM w3 JOIN c2 USING (source) JOIN tb USING (source)
),
perrow AS (
  SELECT lang, ROUND(w / n_cell::DOUBLE, 6) AS rw, n_cell FROM w4
),
expanded AS (
  SELECT lang, rw FROM (
    SELECT lang, rw, unnest(range(1, n_cell + 1)) AS i FROM perrow
  )
),
m AS (
  SELECT lang, COUNT(*) AS n,
         SUM(CAST(rw AS DECIMAL(15,8))) AS s1,
         SUM(CAST(rw AS DECIMAL(20,8)) * CAST(rw AS DECIMAL(15,8))) AS s2
  FROM expanded WHERE rw > 0
  GROUP BY lang
)
SELECT lang,
       CAST(n AS BIGINT) AS n,
       ROUND(CAST(s1 AS DOUBLE), 6) AS sum_w,
       ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
             / CAST(s2 AS DOUBLE), 6) AS ess,
       ROUND(n::DOUBLE / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                          / CAST(s2 AS DOUBLE)), 6) AS deff,
       ROUND(CASE WHEN CAST(s2 AS DOUBLE) / n::DOUBLE
                       - (CAST(s1 AS DOUBLE) / n::DOUBLE)
                         * (CAST(s1 AS DOUBLE) / n::DOUBLE) > 0
                  THEN sqrt(CAST(s2 AS DOUBLE) / n::DOUBLE
                            - (CAST(s1 AS DOUBLE) / n::DOUBLE)
                              * (CAST(s1 AS DOUBLE) / n::DOUBLE))
                       / (CAST(s1 AS DOUBLE) / n::DOUBLE)
                  ELSE 0.0 END, 6) AS cv_w
FROM m
ORDER BY lang
"""

EXT8_QUERIES.update({"x204_weight_diag": q_x204_weight_diag})
EXT8_ORACLES.update({"x204_weight_diag": SQL_X204})


# ----------------------- x205: Theil inequality decomposition


def q_x205_theil(spark, sf_dir):
    """Theil T inequality with exact within/between decomposition
    (operators/sketch.py:theil_decomposition) of document lengths
    across sources — is length inequality driven by differences AMONG
    sources or WITHIN them, the additive split Gini (x55) cannot
    give."""
    from .operators.sketch import theil_decomposition

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return theil_decomposition(docs, "n_chars", "source").orderBy("source")


SQL_X205 = """
WITH base AS (
  SELECT source AS grp, n_chars::DOUBLE AS y
  FROM documents WHERE n_chars > 0
),
per AS (
  SELECT grp, COUNT(*) AS n,
         SUM(CAST(y AS DECIMAL(25,12))) AS yg,
         SUM(CAST(y * ln(y) AS DECIMAL(38,18))) AS sylny
  FROM base GROUP BY grp
),
tot AS (SELECT SUM(n) AS nt, SUM(yg) AS yt FROM per),
j AS (
  SELECT per.grp, per.n,
         per.yg::DOUBLE AS yg, per.sylny::DOUBLE AS sylny,
         per.n::DOUBLE AS ng, tot.nt::DOUBLE AS nt, tot.yt::DOUBLE AS yt
  FROM per CROSS JOIN tot
),
terms AS (
  SELECT grp, n, yg, ng, yt, nt,
         sylny / yg - ln(yg / ng) AS tg,
         yg / yt AS share,
         (yg / yt) * ln((yg / ng) / (yt / nt)) AS bterm
  FROM j
),
sums AS (
  SELECT SUM(CAST(share * tg AS DECIMAL(38,18))) AS wsum,
         SUM(CAST(bterm AS DECIMAL(38,18))) AS bsum
  FROM terms
)
SELECT t.grp AS source,
       CAST(t.n AS BIGINT) AS n,
       ROUND(t.yg, 6) AS total,
       ROUND(t.yg / t.ng, 6) AS mean,
       ROUND(t.share, 6) AS share,
       ROUND(t.tg, 6) AS theil_within_g,
       ROUND(t.bterm, 6) AS between_term,
       ROUND((s.wsum + s.bsum)::DOUBLE, 6) AS theil_total,
       ROUND(s.wsum::DOUBLE, 6) AS theil_within,
       ROUND(s.bsum::DOUBLE, 6) AS theil_between
FROM terms t CROSS JOIN sums s
ORDER BY source
"""

EXT8_QUERIES.update({"x205_theil": q_x205_theil})
EXT8_ORACLES.update({"x205_theil": SQL_X205})


# ------------------------------- x206: Wilson rate intervals


def q_x206_wilson(spark, sf_dir):
    """Wilson score intervals (operators/quality.py:wilson_intervals)
    for the high-value rate per event type — the boundary-safe rate
    CI a dashboard shows instead of the naive normal interval."""
    from .operators.quality import wilson_intervals

    ev = _read_events(spark, sf_dir).where(F.col("value").isNotNull())
    return wilson_intervals(
        ev, F.col("value") > 50.0, ("event_type",)
    ).orderBy("event_type")


SQL_X206 = """
WITH a AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS s
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(s AS BIGINT) AS successes,
       ROUND(s::DOUBLE / n::DOUBLE, 6) AS rate,
       ROUND((s::DOUBLE / n::DOUBLE + 3.841458881296 / (2.0 * n::DOUBLE))
             / (1.0 + 3.841458881296 / n::DOUBLE)
             - 1.959964 * sqrt(s::DOUBLE / n::DOUBLE
                               * (1.0 - s::DOUBLE / n::DOUBLE) / n::DOUBLE
                               + 3.841458881296
                                 / (4.0 * n::DOUBLE * n::DOUBLE))
               / (1.0 + 3.841458881296 / n::DOUBLE), 6) + 0.0 AS ci_lo,
       ROUND((s::DOUBLE / n::DOUBLE + 3.841458881296 / (2.0 * n::DOUBLE))
             / (1.0 + 3.841458881296 / n::DOUBLE)
             + 1.959964 * sqrt(s::DOUBLE / n::DOUBLE
                               * (1.0 - s::DOUBLE / n::DOUBLE) / n::DOUBLE
                               + 3.841458881296
                                 / (4.0 * n::DOUBLE * n::DOUBLE))
               / (1.0 + 3.841458881296 / n::DOUBLE), 6) + 0.0 AS ci_hi
FROM a
ORDER BY event_type
"""

EXT8_QUERIES.update({"x206_wilson": q_x206_wilson})
EXT8_ORACLES.update({"x206_wilson": SQL_X206})


# ------------------------------------ x207: graph modularity


def q_x207_modularity(spark, sf_dir):
    """Newman modularity (operators/graph.py:modularity) of the
    3-round LPA communities (x151) on the customer–supplier trade
    graph — the single number that says whether the detected
    communities beat a degree-preserving random graph (Q ≈ 0 ⇒
    noise)."""
    from .operators.graph import label_propagation, modularity

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("w"))
    )
    labels = label_propagation(edges, n_iter=3)
    return modularity(edges, labels)


SQL_X207 = """
WITH RECURSIVE base AS (
  SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst,
         count(*) AS w
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
sym AS (
  SELECT src AS u, dst AS v, w FROM base
  UNION ALL
  SELECT dst AS u, src AS v, w FROM base
),
st AS (
  SELECT 0 AS i, node, node AS label
  FROM (SELECT DISTINCT u AS node FROM sym)
  UNION ALL
  SELECT i + 1, u AS node,
         (min({'nw': -sw, 'lab': label})).lab AS label
  FROM (
    SELECT st.i, sym.u, st.label, sum(sym.w) AS sw
    FROM sym JOIN st ON st.node = sym.v
    GROUP BY st.i, sym.u, st.label
  ) GROUP BY i, u HAVING i < 3
),
lab AS (SELECT node, label FROM st WHERE i = 3),
tagged AS (
  SELECT s.u, s.v, s.w, lu.label AS cu, lv.label AS cv
  FROM sym s
  JOIN lab lu ON lu.node = s.u
  JOIN lab lv ON lv.node = s.v
),
per_c AS (
  SELECT cu, SUM(w) AS deg,
         SUM(CASE WHEN cu = cv THEN w END) AS inw
  FROM tagged GROUP BY cu
),
tot AS (SELECT SUM(deg) AS m2 FROM per_c)
SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
       CAST(MAX(tot.m2) AS BIGINT) AS total_weight2,
       ROUND(CAST(SUM(CAST(
         COALESCE(inw, 0)::DOUBLE / tot.m2::DOUBLE
         - (deg::DOUBLE / tot.m2::DOUBLE) * (deg::DOUBLE / tot.m2::DOUBLE)
         AS DECIMAL(38,18))) AS DOUBLE), 6) AS q
FROM per_c CROSS JOIN tot
"""

EXT8_QUERIES.update({"x207_modularity": q_x207_modularity})
EXT8_ORACLES.update({"x207_modularity": SQL_X207})


# -------------------------------- x208: count dispersion audit


def q_x208_dispersion(spark, sf_dir):
    """Count-dispersion audit (operators/sketch.py:dispersion_index):
    variance-to-mean ratio and NB overdispersion of DAILY event
    counts per type — the Poisson-assumption check run before alert
    thresholds or sample-size formulas are trusted."""
    from .operators.sketch import dispersion_index

    ev = _read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.expr("ts_us div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return dispersion_index(daily, "c", ("event_type",)).orderBy(
        "event_type"
    )


SQL_X208 = """
WITH daily AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         COUNT(*) AS c
  FROM events GROUP BY event_type, day
),
m AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(c AS DECIMAL(19,0))) AS s1,
         SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS s2
  FROM daily GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_buckets,
       ROUND(s1::DOUBLE / n::DOUBLE, 6) AS mean_count,
       ROUND((s2::DOUBLE / n::DOUBLE
              - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
             / (s1::DOUBLE / n::DOUBLE), 6) AS vmr,
       ROUND(GREATEST(0.0,
             (s2::DOUBLE / n::DOUBLE
              - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
              - s1::DOUBLE / n::DOUBLE)
             / ((s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))),
             6) AS nb_alpha,
       (s2::DOUBLE / n::DOUBLE
        - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
       / (s1::DOUBLE / n::DOUBLE) > 1.0 AS overdispersed
FROM m
ORDER BY event_type
"""

EXT8_QUERIES.update({"x208_dispersion": q_x208_dispersion})
EXT8_ORACLES.update({"x208_dispersion": SQL_X208})


# --------------------------- x209: session-chain entropy rate


def q_x209_entropy_rate(spark, sf_dir):
    """Markov entropy rate (operators/behavior.py:entropy_rate):
    bits/event of the empirical session chain — H → 0 means the next
    event is nearly determined (bots, rigid funnels); the
    predictability summary over x34's matrix and x177's occupancy."""
    from .operators.behavior import entropy_rate

    ev = _read_events(spark, sf_dir)
    return entropy_rate(ev, n_iter=4).orderBy("event_type")


def _pi_iter_sql209(i: int) -> str:
    prev = f"pi{i - 1}"
    return f"""
c{i} AS (
  SELECT p.to_type AS state,
         ({prev}.prob * p.p)::DECIMAL(38,18) AS c
  FROM p JOIN {prev} ON p.from_type = {prev}.state
),
s{i} AS (SELECT state, SUM(c)::DOUBLE AS prob FROM c{i} GROUP BY state),
pi{i} AS (
  SELECT states.state, COALESCE(s{i}.prob, 0.0) AS prob
  FROM states LEFT JOIN s{i} ON states.state = s{i}.state
)"""


SQL_X209 = (
    """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
seq AS (
  SELECT user_id, event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS from_type
  FROM e
),
trans AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM seq WHERE from_type IS NOT NULL GROUP BY from_type, to_type
),
states AS (SELECT DISTINCT from_type AS state FROM trans),
kept AS (
  SELECT t.* FROM trans t JOIN states s ON t.to_type = s.state
),
tot AS (
  SELECT from_type, SUM(n)::BIGINT AS tot FROM kept GROUP BY from_type
),
p AS (
  SELECT k.from_type, k.to_type, k.n::DOUBLE / tot.tot::DOUBLE AS p
  FROM kept k JOIN tot ON k.from_type = tot.from_type
),
ns AS (SELECT COUNT(*)::DOUBLE AS ns FROM states),
pi0 AS (SELECT state, 1.0 / ns AS prob FROM states, ns),"""
    + ",".join(_pi_iter_sql209(i) for i in (1, 2, 3, 4))
    + """,
h AS (
  SELECT from_type AS state,
         SUM(CAST(-(p * log2(p)) AS DECIMAL(38,18))) AS hsum
  FROM p GROUP BY from_type
),
terms AS (
  SELECT pi4.state, ROUND(pi4.prob, 6) AS pi,
         h.hsum::DOUBLE AS hs,
         ROUND(pi4.prob, 6) * h.hsum::DOUBLE AS ct
  FROM pi4 JOIN h USING (state)
),
hr AS (SELECT SUM(CAST(ct AS DECIMAL(38,18)))::DOUBLE AS hr FROM terms)
SELECT t.state AS event_type,
       t.pi AS stationary,
       ROUND(t.hs, 6) AS h_state,
       ROUND(t.ct, 6) AS contrib,
       ROUND(hr.hr, 6) AS entropy_rate
FROM terms t CROSS JOIN hr
ORDER BY event_type
"""
)

EXT8_QUERIES.update({"x209_entropy_rate": q_x209_entropy_rate})
EXT8_ORACLES.update({"x209_entropy_rate": SQL_X209})
