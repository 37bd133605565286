"""Panel-mode query registry: the 100 TB scale path.

The reference operates on ONE global time series (a single wide frame,
``/root/reference/fame2py_converter.py:312-313``), so every ordered
window in reference-parity mode is ``Window.orderBy(DATE)`` — a single
partition.  That is correct but cannot scale.  The engine's
``entity_cols`` mode (SURVEY §1.3) runs the *same* FAME script over a
long-format panel — one independent series per entity — and every
window/groupBy gains ``partitionBy(entity)``:

* no single-partition stage anywhere in the plan;
* per-entity windows shuffle once on the entity key and then stream;
* at 1000 executors the panel partitions by entity hash — adding data
  adds entities, not rows-per-partition.

These queries prove the mode end-to-end against DuckDB oracles using
``PARTITION BY`` windows: the per-nation panel here is a stand-in for a
millions-of-entities panel at full scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import run_script


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def nation_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format panel: one monthly (REV, CNT) series per nation.

    Join strategy (scale-aware): nation is a fixed 25-row dimension →
    explicit ``broadcast``; orders⋈customer is fact⋈dimension where the
    dimension grows with SF → left to AQE, which broadcasts while small
    and shuffle-joins at scale.
    """
    orders = _read(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("NATION"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("DATE"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("REV"),
            F.count("*").cast("double").alias("CNT"),
        )
    )


SQL_PANEL_BASE = """
WITH base AS (
  SELECT n_name AS NATION,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS DATE,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS REV,
         CAST(COUNT(*) AS DOUBLE) AS CNT
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
"""


def _finish_panel(df: DataFrame, *cols: str) -> DataFrame:
    return df.select(
        F.col("NATION"),
        F.col("DATE"),
        *[F.round(F.col(c).cast("double"), 6).alias(c) for c in cols],
    )


def q_p01_panel_pct(spark, sf_dir):
    """E1/E6/E7/S16 in panel mode: every window is
    ``partitionBy(NATION).orderBy(DATE)`` — lags never cross an entity
    boundary and the plan has no single-partition exchange."""
    base = nation_monthly(spark, sf_dir)
    res = run_script(
        base,
        [
            "g = pct(rev)",
            "d1 = diff(rev)",
            "level = rev / firstvalue(rev) * 100",
        ],
        entity_cols=("NATION",),
    )
    return _finish_panel(res.df, "G", "D1", "LEVEL")


SQL_P01 = SQL_PANEL_BASE + """
SELECT NATION, DATE,
       ROUND((REV - LAG(REV) OVER w) / LAG(REV) OVER w * 100, 6) AS G,
       ROUND(REV - LAG(REV) OVER w, 6) AS D1,
       ROUND(REV / FIRST_VALUE(REV) OVER wf * 100, 6) AS LEVEL
FROM base
WINDOW w AS (PARTITION BY NATION ORDER BY DATE),
       wf AS (PARTITION BY NATION ORDER BY DATE
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_p02_panel_convert(spark, sf_dir):
    """S14 in panel mode: the convert bridge groups by
    ``(NATION, quarter)`` and joins back on ``(NATION, DATE)`` — the
    downsample aggregation is per-entity, shuffle keyed on the panel
    key, never a global single-group pass."""
    base = nation_monthly(spark, sf_dir)
    res = run_script(
        base,
        [
            "freq m",
            "qc = convert(cnt, q, disc, sum)",
            "qr = convert(rev, q, disc, ave)",
        ],
        entity_cols=("NATION",),
    )
    out = res.df.where(F.col("CNT_QTRLY").isNotNull())
    return _finish_panel(out, "CNT_QTRLY", "REV_QTRLY")


SQL_P02 = SQL_PANEL_BASE + """
SELECT NATION, CAST(date_trunc('quarter', DATE) AS DATE) AS DATE,
       ROUND(SUM(CNT), 6) AS CNT_QTRLY,
       ROUND(AVG(REV), 6) AS REV_QTRLY
FROM base GROUP BY 1, 2
"""


def q_p03_panel_date_window(spark, sf_dir):
    """S7/S8 in panel mode: date-window scoping and conditionals apply
    per row, so they compose with entity partitioning unchanged."""
    base = nation_monthly(spark, sf_dir)
    res = run_script(
        base,
        [
            "date 1995-01-01 to 1996-12-31",
            "boom = rev",
            "date *",
            "flag = if exists(boom) and cnt gt 20 then 1 else 0",
        ],
        entity_cols=("NATION",),
    )
    return _finish_panel(res.df, "BOOM", "FLAG")


SQL_P03 = SQL_PANEL_BASE + """
SELECT NATION, DATE,
       ROUND(CASE WHEN DATE BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
                  THEN REV END, 6) AS BOOM,
       ROUND(CASE WHEN (DATE BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
                   AND CNT > 20 THEN 1 ELSE 0 END, 6) AS FLAG
FROM base
"""


def q_p04_panel_backcast(spark, sf_dir):
    """S11 backcast (batched telescoped closed form) in panel mode:
    the reversed-recursion window and the reference-point lookup both
    gain ``PARTITION BY NATION`` — each entity backcasts from its own
    reference observation, and the plan stays entity-parallel (no
    global window), which is what makes a million-entity backfill one
    shuffle instead of a sequential scan."""
    from datetime import date

    from .engine import FameEngine

    base = nation_monthly(spark, sf_dir)
    eng = FameEngine(
        backcast_window=(date(1999, 12, 1), date(1995, 1, 1)),
        entity_cols=("NATION",),
    )
    res = eng.run(base, ["set rev[t] = rev[t+1]/(1+(pct(cnt[t+1])/100))"])
    return _finish_panel(res.df, "REV", "CNT")


SQL_P04 = SQL_PANEL_BASE + """
SELECT NATION, DATE,
       ROUND(CASE WHEN DATE BETWEEN DATE '1995-01-01' AND DATE '1999-12-01'
                  THEN rev_ref * CNT / cnt_ref
                  ELSE REV END, 6) AS REV,
       ROUND(CNT, 6) AS CNT
FROM (
  SELECT *,
         MAX(CASE WHEN DATE = ref_date THEN REV END)
           OVER (PARTITION BY NATION) AS rev_ref,
         MAX(CASE WHEN DATE = ref_date THEN CNT END)
           OVER (PARTITION BY NATION) AS cnt_ref
  FROM (
    SELECT *,
           MIN(CASE WHEN DATE > DATE '1999-12-01' THEN DATE END)
             OVER (PARTITION BY NATION) AS ref_date
    FROM base
  )
)
"""


PANEL_QUERIES = {
    "p01_panel_pct": q_p01_panel_pct,
    "p02_panel_convert": q_p02_panel_convert,
    "p03_panel_date_window": q_p03_panel_date_window,
    "p04_panel_backcast": q_p04_panel_backcast,
}

PANEL_ORACLES = {
    "p01_panel_pct": SQL_P01,
    "p02_panel_convert": SQL_P02,
    "p03_panel_date_window": SQL_P03,
    "p04_panel_backcast": SQL_P04,
}


def region_monthly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain/Fisher panel input: monthly A/R quantity + unit price per
    REGION (supplier → nation → region lineage; region and nation are
    fixed tiny dimensions → explicit broadcast)."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_returnflag",
        "l_quantity", "l_extendedprice",
    )
    supp = _read(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = _read(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = _read(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    month = F.date_trunc("month", F.col("l_shipdate")).cast("date").alias(
        "DATE"
    )

    def agg_for(flag: str, qname: str, pname: str):
        cond = F.col("l_returnflag") == flag
        qty = F.sum(F.when(cond, F.col("l_quantity")).cast("decimal(18,2)"))
        rev = F.sum(
            F.when(cond, F.col("l_extendedprice")).cast("decimal(18,2)")
        )
        return [
            qty.cast("double").alias(qname),
            (rev.cast("double") / qty.cast("double")).alias(pname),
        ]

    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("REGION"), month)
        .agg(*agg_for("A", "A", "PA"), *agg_for("R", "R", "PR"))
    )


SQL_PANEL_FLAGS = """
WITH base AS (
  SELECT r_name AS REGION,
         CAST(date_trunc('month', l_shipdate) AS DATE) AS DATE,
         CAST(SUM(CASE WHEN l_returnflag='A'
                       THEN CAST(l_quantity AS DECIMAL(18,2)) END)
              AS DOUBLE) AS A,
         CAST(SUM(CASE WHEN l_returnflag='A'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
              AS DOUBLE)
           / CAST(SUM(CASE WHEN l_returnflag='A'
                           THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                  AS DOUBLE) AS PA,
         CAST(SUM(CASE WHEN l_returnflag='R'
                       THEN CAST(l_quantity AS DECIMAL(18,2)) END)
              AS DOUBLE) AS R,
         CAST(SUM(CASE WHEN l_returnflag='R'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
              AS DOUBLE)
           / CAST(SUM(CASE WHEN l_returnflag='R'
                           THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                  AS DOUBLE) AS PR
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
"""


def q_p05_panel_chain(spark, sf_dir):
    """S12 chain-linked volume index in panel mode: the full
    annual-overlap machinery (yearly averages, linking factors,
    exp-sum-log cumulation, base-year rebasing) with every window
    ``partitionBy(REGION)`` — the hardest econ operator at the 100 TB
    layout, proven against a PARTITION BY oracle."""
    base = region_monthly_flags(spark, sf_dir)
    res = run_script(
        base,
        ['vol = $chain("a + r", "1997")'],
        entity_cols=("REGION",),
    )
    return res.df.select(
        "REGION", "DATE",
        F.round(F.col("VOL").cast("double"), 6).alias("VOL"),
    )


SQL_P05 = SQL_PANEL_FLAGS + """
, yearly AS (
  SELECT REGION, year(DATE) AS y,
         AVG(A) AS qa, AVG(PA) AS pa, AVG(R) AS qr, AVG(PR) AS pr
  FROM base GROUP BY 1, 2
),
links AS (
  SELECT REGION, y, qa, qr,
         LAG(pa) OVER wy AS pap, LAG(pr) OVER wy AS prp,
         LAG(qa) OVER wy AS qap, LAG(qr) OVER wy AS qrp,
         (LAG(pa) OVER wy * qa + LAG(pr) OVER wy * qr)
           / (LAG(pa) OVER wy * LAG(qa) OVER wy
              + LAG(pr) OVER wy * LAG(qr) OVER wy) AS link
  FROM yearly WINDOW wy AS (PARTITION BY REGION ORDER BY y)
),
levels AS (
  SELECT *,
         exp(SUM(ln(link)) OVER (PARTITION BY REGION ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS lvl
  FROM links
),
year_info AS (
  SELECT REGION, y, pap, prp, qap, qrp,
         COALESCE(LAG(lvl) OVER (PARTITION BY REGION ORDER BY y), 1.0)
           AS prev_lvl,
         MAX(CASE WHEN y = 1997 THEN COALESCE(lvl, 1.0) END)
           OVER (PARTITION BY REGION) AS base_lvl
  FROM levels
)
SELECT b.REGION, b.DATE,
       ROUND(100.0 * (yi.prev_lvl / yi.base_lvl)
             * ((yi.pap * b.A + yi.prp * b.R)
                / (yi.pap * yi.qap + yi.prp * yi.qrp)), 6) AS VOL
FROM base b
JOIN year_info yi ON b.REGION = yi.REGION AND year(b.DATE) = yi.y
"""


PANEL_QUERIES.update({"p05_panel_chain": q_p05_panel_chain})
PANEL_ORACLES.update({"p05_panel_chain": SQL_P05})


def q_p06_panel_statespace(spark, sf_dir):
    """State-space smoothers in panel mode (r7 verdict #7): the exact
    Hodrick-Prescott decomposition (operators/temporal.py:hp_filter,
    lam=1600) AND the local-level Kalman filter (kalman_level, q=4,
    r=16, p0=100) over each nation's monthly revenue series — 25
    independent entities proving the multi-entity path of the
    entity-keyed ``mapInPandas`` lane end-to-end under the driver
    contract.  Both operators shuffle ONCE on the entity key into
    bounded per-series arrays; the sequential recursions (LDL'
    pentadiagonal solve, adaptive-gain scalar recursion) run inside
    Arrow batches, one series per loop step — at 100 TB the unit of
    parallelism is the entity, so millions of series stream through
    independently with per-task state bounded by ``max_len``.  The
    final join is keyed on (entity, t): an entity-hash shuffle join
    of two already-entity-partitioned frames.  The oracle replays
    both pinned-order float recursions as recursive CTEs with
    ``GROUP BY`` on the nation key — bit-equal IEEE doubles per
    entity before the tie-safe 6 dp round."""
    from .operators.temporal import hp_filter, kalman_level

    base = nation_monthly(spark, sf_dir).select(
        "NATION",
        F.datediff(F.col("DATE"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("T"),
        "REV",
    )
    hp = hp_filter(
        base, entity_col="NATION", t_col="T", value_col="REV", lam=1600.0
    ).select(
        F.col("entity").alias("NATION"),
        F.col("t").alias("T"),
        F.col("value").alias("REV"),
        F.col("trend").alias("HP_TREND"),
        F.col("cycle").alias("HP_CYCLE"),
    )
    kf = kalman_level(
        base,
        entity_col="NATION",
        t_col="T",
        value_col="REV",
        q=4.0,
        r=16.0,
        p0=100.0,
    ).select(
        F.col("entity").alias("NATION"),
        F.col("t").alias("T"),
        F.col("level").alias("KF_LEVEL"),
        F.col("gain").alias("KF_GAIN"),
    )
    return hp.join(kf, ["NATION", "T"])


def _sql_p06() -> str:
    lam = "1600.0"
    q, r, p0 = (
        "CAST(4.0 AS DOUBLE)",
        "CAST(16.0 AS DOUBLE)",
        "CAST(100.0 AS DOUBLE)",
    )
    # pentadiagonal coefficients of I + lam*D'D at 1-based position s
    # (mirrors operators/temporal.py:_hp_coeffs exactly — the x336
    # oracle applied to the nation-monthly panel)
    dcoef = (
        f"(CAST(1.0 AS DOUBLE) + CAST({lam} AS DOUBLE) * "
        "(CASE WHEN s = 1 OR s = n THEN 1 "
        "WHEN s = 2 OR s = n - 1 THEN 5 ELSE 6 END))"
    )
    ecoef = (
        f"(CASE WHEN s = 2 OR s = n THEN CAST(-2.0 AS DOUBLE) * {lam} "
        f"ELSE CAST(-4.0 AS DOUBLE) * {lam} END)"
    )
    return f"""
WITH RECURSIVE p06_base AS (
  SELECT n_name AS e,
         CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
              - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), p06_arr AS (
  SELECT e, list(t ORDER BY t) AS ts, list(v ORDER BY t) AS ys,
         CAST(count(*) AS INTEGER) AS n
  FROM p06_base GROUP BY e
), p06_fwd AS (
  SELECT e, ts, ys, n, CAST(1 AS INTEGER) AS i,
         [CAST(1.0 AS DOUBLE) + CAST({lam} AS DOUBLE) * 1] AS Ds,
         [CAST(0.0 AS DOUBLE)] AS L1s,
         [CAST(0.0 AS DOUBLE)] AS L2s,
         [ys[1]] AS Zs
  FROM p06_arr
  UNION ALL
  SELECT e, ts, ys, n, s AS i,
         list_append(Ds, {dcoef} - l1 * l1 * d1 - l2 * l2 * d2) AS Ds,
         list_append(L1s, l1) AS L1s,
         list_append(L2s, l2) AS L2s,
         list_append(Zs,
           ys[s] - l1 * Zs[CAST(s - 1 AS INTEGER)]
                 - l2 * COALESCE(Zs[CAST(s - 2 AS INTEGER)],
                                 CAST(0.0 AS DOUBLE))) AS Zs
  FROM (
    SELECT e, ts, ys, n, s, Ds, L1s, L2s, Zs, d1, d2, l2,
           ({ecoef} - l2 * d2 * L1s[CAST(s - 1 AS INTEGER)]) / d1 AS l1
    FROM (
      SELECT e, ts, ys, n, s, Ds, L1s, L2s, Zs, d1, d2,
             CASE WHEN s >= 3 THEN CAST({lam} AS DOUBLE) / d2
                  ELSE CAST(0.0 AS DOUBLE) END AS l2
      FROM (
        SELECT e, ts, ys, n, CAST(i + 1 AS INTEGER) AS s,
               Ds, L1s, L2s, Zs,
               Ds[i] AS d1,
               COALESCE(Ds[CAST(i - 1 AS INTEGER)],
                        CAST(0.0 AS DOUBLE)) AS d2
        FROM p06_fwd WHERE i < n
      )
    )
  )
), p06_bwd AS (
  SELECT e, ts, ys, n, Ds, L1s, L2s, Zs, n AS i,
         [Zs[n] / Ds[n] - CAST(0.0 AS DOUBLE) - CAST(0.0 AS DOUBLE)]
           AS taus
  FROM p06_fwd WHERE i = n
  UNION ALL
  SELECT e, ts, ys, n, Ds, L1s, L2s, Zs, CAST(i - 1 AS INTEGER) AS i,
         list_prepend(
           Zs[CAST(i - 1 AS INTEGER)] / Ds[CAST(i - 1 AS INTEGER)]
           - L1s[i] * taus[1]
           - CASE WHEN i + 1 <= n
                  THEN L2s[CAST(i + 1 AS INTEGER)] * taus[2]
                  ELSE CAST(0.0 AS DOUBLE) END,
           taus) AS taus
  FROM p06_bwd WHERE i > 1
), p06_hp AS (
  SELECT e, UNNEST(ts) AS t, UNNEST(ys) AS v, UNNEST(taus) AS trend
  FROM p06_bwd WHERE i = 1
), p06_kf_rec AS (
  SELECT e, ts, ys, n, CAST(1 AS INTEGER) AS i,
         ys[1] AS x, {p0} AS p,
         [ys[1]] AS levels, [CAST(0.0 AS DOUBLE)] AS gains
  FROM p06_arr
  UNION ALL
  SELECT e, ts, ys, n, CAST(i + 1 AS INTEGER) AS i,
         x + k * (ys[CAST(i + 1 AS INTEGER)] - x) AS x,
         (CAST(1.0 AS DOUBLE) - k) * pp AS p,
         list_append(levels,
           x + k * (ys[CAST(i + 1 AS INTEGER)] - x)) AS levels,
         list_append(gains, k) AS gains
  FROM (
    SELECT e, ts, ys, n, i, x, levels, gains, pp,
           pp / (pp + {r}) AS k
    FROM (
      SELECT e, ts, ys, n, i, x, levels, gains, p + {q} AS pp
      FROM p06_kf_rec WHERE i < n
    )
  )
), p06_kf AS (
  SELECT e, UNNEST(ts) AS t, UNNEST(levels) AS level,
         UNNEST(gains) AS gain
  FROM p06_kf_rec WHERE i = n
)
SELECT h.e AS NATION, CAST(h.t AS BIGINT) AS T,
       ROUND(h.v * 1000000.0) / 1000000.0 AS REV,
       ROUND(h.trend * 1000000.0) / 1000000.0 AS HP_TREND,
       ROUND((h.v - h.trend) * 1000000.0) / 1000000.0 AS HP_CYCLE,
       ROUND(k.level * 1000000.0) / 1000000.0 AS KF_LEVEL,
       ROUND(k.gain * 1000000.0) / 1000000.0 AS KF_GAIN
FROM p06_hp h
JOIN p06_kf k ON h.e = k.e AND h.t = k.t
ORDER BY 1, 2
"""


PANEL_QUERIES.update({"p06_panel_statespace": q_p06_panel_statespace})
PANEL_ORACLES.update({"p06_panel_statespace": _sql_p06()})


# ------------- p07: per-source (entity-scoped) MinHash-LSH dedup


def q_p07_panel_dedup(spark, sf_dir):
    """The dedup family in panel mode (r8 verdict item #7): MinHash-LSH
    near-dup pairs with every band bucket scoped to its ``lang``
    entity (operators/dedup.py:minhash_lsh_pairs_keyed) — the band
    shuffle keys on (lang, band, bh), the bucket cap windows
    PARTITION BY (lang, band, bh), and no candidate pair ever
    crosses a language.  At 100 TB this is per-corpus / per-tenant
    dedup: adding entities adds partitions, not bucket width.  The
    oracle replays the identical md5 shingle hashes, affine MinHash
    family, entity-keyed banding, and exact Jaccard verify."""
    from .operators.dedup import minhash_lsh_pairs_keyed

    docs = _read(spark, sf_dir, "documents")
    out = minhash_lsh_pairs_keyed(
        docs, "text", "doc_id", "lang",
        n=5, num_hashes=64, bands=16, threshold=0.6,
    )
    return out.select(
        "lang",
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


def _sql_p07() -> str:
    from .operators.dedup import (
        MERSENNE_31,
        _affine_params,
        min_sig_matches,
    )

    params = _affine_params(64, seed=42)
    values = ", ".join(
        f"({j}, {a}::BIGINT, {b}::BIGINT)"
        for j, (a, b) in enumerate(params)
    )
    min_match = min_sig_matches(0.6, 64)
    return f"""
WITH docs AS (
  SELECT doc_id, lang AS pk,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
shingles AS (
  SELECT DISTINCT d.doc_id, substr(d.t, CAST(i.i AS INTEGER), 5) AS sh
  FROM docs d,
       LATERAL (SELECT unnest(range(1, greatest(length(d.t) - 4, 0) + 1)) AS i) i
  WHERE length(d.t) >= 5
),
hashed AS (
  SELECT doc_id, sh, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h
  FROM shingles
),
params(j, a, b) AS (VALUES {values}),
minh AS (
  SELECT h.doc_id, p.j, MIN((p.a * h.h + p.b) % {MERSENNE_31}) AS mh
  FROM hashed h CROSS JOIN params p
  GROUP BY 1, 2
),
sigs AS (
  SELECT doc_id, list(mh ORDER BY j) AS sig FROM minh GROUP BY 1
),
bands AS (
  SELECT s.doc_id, d.pk, b.band,
         md5(array_to_string(s.sig[b.band * 4 + 1 : b.band * 4 + 4], ',')) AS bh
  FROM sigs s
  JOIN docs d ON d.doc_id = s.doc_id,
       LATERAL (SELECT unnest(range(0, 16)) AS band) b
  QUALIFY row_number() OVER (PARTITION BY d.pk, b.band, bh ORDER BY s.doc_id)
          <= 1000
),
cand AS (
  SELECT DISTINCT l.pk, l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l
  JOIN bands r ON l.pk = r.pk AND l.band = r.band AND l.bh = r.bh
  WHERE l.doc_id < r.doc_id
),
pref AS (
  SELECT c.pk, c.id_a, c.id_b
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.id_a
  JOIN sigs sb ON sb.doc_id = c.id_b
  WHERE len(list_filter(range(1, 65),
            i -> sa.sig[CAST(i AS INTEGER)] = sb.sig[CAST(i AS INTEGER)]))
        >= {min_match}
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY 1)
SELECT c.pk AS lang,
       CAST(c.id_a AS BIGINT) AS id_a,
       CAST(c.id_b AS BIGINT) AS id_b,
       ROUND(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS jaccard
FROM pref c
JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE ROUND(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) >= 0.6
"""


PANEL_QUERIES.update({"p07_panel_dedup": q_p07_panel_dedup})
PANEL_ORACLES.update({"p07_panel_dedup": _sql_p07()})


# -------------- p08: entity-scoped exact ANN (similarity panel lane)


def q_p08_panel_ann(spark, sf_dir):
    """The similarity family in panel mode: exact top-3 cosine
    neighbors per query vector scoped to the query's ``label`` entity
    (operators/similarity.py:cosine_topk_keyed) — the score join is
    key-equi on the entity, so the pair space is per-entity blocks and
    the rank windows PARTITION BY (entity, query).  Queries are the
    deterministic vec_id % 25 slice; the oracle replays the identical
    double-fold cosine with a label-equi join and PARTITION BY
    ranking."""
    from .operators.similarity import cosine_topk_keyed

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 25 == 0).select(
        "label",
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk_keyed(emb, queries, "label", k=3)
    return out.select(
        F.col("label").cast("long").alias("label"),
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "score",
    )


SQL_P08 = """
WITH q AS (
  SELECT label, vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 25 = 0
),
c AS (
  SELECT label, vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
  FROM embeddings
),
scored AS (
  SELECT q.label, q.query_id, c.neighbor_id,
         ROUND(
           list_reduce(list_transform(range(1, 65),
                       i -> cv[CAST(i AS INTEGER)] * qv[CAST(i AS INTEGER)]),
                       (acc, x) -> acc + x)
           / (sqrt(list_reduce(list_transform(range(1, 65),
                        i -> cv[CAST(i AS INTEGER)] * cv[CAST(i AS INTEGER)]),
                        (acc, x) -> acc + x))
              * sqrt(list_reduce(list_transform(range(1, 65),
                        i -> qv[CAST(i AS INTEGER)] * qv[CAST(i AS INTEGER)]),
                        (acc, x) -> acc + x))), 6) AS score
  FROM c JOIN q ON c.label = q.label
  WHERE c.neighbor_id <> q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label, query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 3
"""


PANEL_QUERIES.update({"p08_panel_ann": q_p08_panel_ann})
PANEL_ORACLES.update({"p08_panel_ann": SQL_P08})


# ------------- p09: per-source vocabulary growth (text panel lane)


def q_p09_panel_vocab(spark, sf_dir):
    """The text family in panel mode: per-source Heaps-law vocabulary
    growth (operators/text.py:vocab_growth) — each source's documents
    in id order accumulate distinct-token counts through a PARTITION
    BY source cumulative window; token first-appearances are one
    (source, token) min-aggregate, so nothing iterates per entity.
    The oracle replays the identical tokenization, first-appearance
    min, and partitioned cumsum."""
    from .operators.text import vocab_growth

    docs = _read(spark, sf_dir, "documents")
    return vocab_growth(docs, "text", "doc_id", "source")


SQL_P09 = """
WITH t AS (
  SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents
), tok AS (
  SELECT source, doc_id, unnest(toks) AS tok FROM t
), firsts AS (
  SELECT source, MIN(doc_id) AS doc_id, tok
  FROM tok GROUP BY source, tok
), n_new AS (
  SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM firsts GROUP BY source, doc_id
), per_doc AS (
  SELECT t.source, t.doc_id,
         CAST(len(t.toks) AS BIGINT) AS n_tokens,
         CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new
  FROM t LEFT JOIN n_new n
    ON n.source = t.source AND n.doc_id = t.doc_id
)
SELECT source, doc_id, n_tokens, n_new,
       CAST(SUM(n_new) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS vocab_cum
FROM per_doc
ORDER BY source, doc_id
"""


PANEL_QUERIES.update({"p09_panel_vocab": q_p09_panel_vocab})
PANEL_ORACLES.update({"p09_panel_vocab": SQL_P09})


# ---------- p10: per-source co-occurrence PageRank (graph panel lane)


def q_p10_panel_graph(spark, sf_dir):
    """The graph family in panel mode (r9 verdict item #8): 3
    supersteps of entity-scoped PageRank
    (operators/graph.py:pagerank_keyed) over each source's token
    bigram graph — every superstep join, message aggregate, and
    teleport constant is keyed by ``source``, so rank mass never
    crosses a source and each entity's n_e/teleport are its own.
    At 100 TB this is per-corpus graph analytics: the per-superstep
    shuffles key on (source, node), adding sources adds partitions.
    Contributions combine in decimal(28,18), so the oracle — a
    WITH RECURSIVE CTE whose recursive term replays the exact
    superstep (entity-keyed message join + GROUP BY + teleport
    fallback via zero-weight self-edges) — matches every iteration
    bitwise.  Output: top-5 tokens per source by final rank
    (PARTITION BY source rank window over the ≤|vocab| rank frame)."""
    from pyspark.sql import Window

    from .operators.dedup import normalized_text
    from .operators.graph import pagerank_keyed

    docs = _read(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(normalized_text(F.col("text")), " "),
        lambda t: t != F.lit(""),
    )
    with_toks = docs.select("source", toks.alias("__toks")).where(
        F.size("__toks") >= 2
    )
    # consecutive-token pairs: zip the array with its own tail — the
    # trailing (last, null) pair is filtered out
    pairs = F.filter(
        F.zip_with(
            F.col("__toks"),
            F.slice(
                F.col("__toks"), 2, F.greatest(F.size("__toks") - 1, F.lit(1))
            ),
            lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
        ),
        lambda p: p["dst"].isNotNull(),
    )
    edges = (
        with_toks.select("source", F.explode(pairs).alias("p"))
        .groupBy(
            "source",
            F.col("p.src").alias("src"),
            F.col("p.dst").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ranks = pagerank_keyed(
        edges, partition_col="source", n_iter=3
    )
    w5 = Window.partitionBy("source").orderBy(
        F.desc("rank"), F.asc("node")
    )
    return (
        ranks.withColumn("pos", F.row_number().over(w5))
        .where(F.col("pos") <= 5)
        .select(
            "source",
            F.col("node").alias("token"),
            F.round("rank", 6).alias("pagerank"),
            F.col("pos").cast("long").alias("pos"),
        )
        .orderBy("source", "pos")
    )


SQL_P10 = """
WITH RECURSIVE t AS (
  SELECT source,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents
), edges AS (
  SELECT source,
         toks[CAST(i.i AS INTEGER)] AS src,
         toks[CAST(i.i AS INTEGER) + 1] AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) i
  WHERE len(toks) >= 2
  GROUP BY 1, 2, 3
), nodes AS (
  -- the UNION nests in a subquery: inside a WITH RECURSIVE block
  -- DuckDB treats any CTE with a TOP-LEVEL set operation as
  -- self-recursive, which silently duplicates the row set
  SELECT DISTINCT source, node FROM (
    SELECT source, src AS node FROM edges
    UNION ALL
    SELECT source, dst FROM edges
  )
), tp AS (
  SELECT source,
         0.15 / CAST(COUNT(*) AS DOUBLE) AS tp,
         1.0 / CAST(COUNT(*) AS DOUBLE) AS r0
  FROM nodes GROUP BY source
), outw AS (
  SELECT source, src, CAST(SUM(w) AS BIGINT) AS wout
  FROM edges GROUP BY source, src
), aug AS (
  -- real edges plus a zero-weight self-edge per node, so every node
  -- appears as a message destination each superstep (the teleport
  -- fallback the Spark side expresses as a left join + coalesce);
  -- nested for the same top-level-set-operation reason as nodes
  SELECT * FROM (
    SELECT source, src, dst, w FROM edges
    UNION ALL
    SELECT source, node, node, 0 FROM nodes
  )
), ranks AS (
  SELECT 0 AS iter, n.source, n.node, t2.r0 AS rank
  FROM nodes n JOIN tp t2 ON t2.source = n.source
  UNION ALL
  SELECT m.iter + 1, m.source, m.node,
         t3.tp + 0.85 * COALESCE(CAST(m.s AS DOUBLE), 0.0) AS rank
  FROM (
    SELECT r.iter AS iter, a.source, a.dst AS node,
           SUM(CAST(r.rank * (CAST(a.w AS DOUBLE) / o.wout)
                    AS DECIMAL(28,18))) AS s
    FROM ranks r
    JOIN aug a ON a.source = r.source AND a.src = r.node
    LEFT JOIN outw o ON o.source = a.source AND o.src = a.src
    WHERE r.iter < 3
    GROUP BY r.iter, a.source, a.dst
  ) m
  JOIN tp t3 ON t3.source = m.source
)
SELECT source, node AS token,
       ROUND(rank, 6) AS pagerank,
       CAST(ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY rank DESC, node ASC)
            AS BIGINT) AS pos
FROM ranks
WHERE iter = 3
QUALIFY pos <= 5
ORDER BY source, pos
"""


PANEL_QUERIES.update({"p10_panel_graph": q_p10_panel_graph})
PANEL_ORACLES.update({"p10_panel_graph": SQL_P10})


# ----- p11: per-source quality survivor election (curation lane)


def q_p11_panel_survivors(spark, sf_dir):
    """The curation family in panel mode: near-dup survivor election
    scoped to ``source`` (operators/curation.py:quality_survivors_keyed)
    — pair generation is the entity-keyed LSH (p07's machinery, so no
    candidate pair ever crosses a source), components are entity-local
    BY EDGE CONSTRUCTION (the star rounds run unkeyed on purpose —
    keyed pairs cannot connect entities, and re-keying the iteration
    would add a shuffle column for no semantic gain), and each
    (source, cluster) keeps its highest-quality member.  At 100 TB
    this is per-tenant dedup policy: one tenant's boilerplate can
    never elect a survivor in another tenant's corpus.  The oracle
    rebuilds the whole chain — keyed MinHash-LSH, recursive-CTE
    closure, text_profile quality, PARTITION BY election — in SQL."""
    from .operators.curation import quality_survivors_keyed

    docs = _read(spark, sf_dir, "documents")
    return quality_survivors_keyed(docs, "text", "doc_id", "source")


def _sql_p11() -> str:
    from .operators.dedup import (
        MERSENNE_31,
        _affine_params,
        min_sig_matches,
    )
    from .queries_ext import _SQL_COMPONENT_CTES, _sql_profile_ctes

    params = _affine_params(64, seed=42)
    values = ", ".join(
        f"({j}, {a}::BIGINT, {b}::BIGINT)"
        for j, (a, b) in enumerate(params)
    )
    min_match = min_sig_matches(0.6, 64)
    return f"""
WITH RECURSIVE {_sql_profile_ctes()},
kdocs AS (
  SELECT doc_id, source AS pk,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
kshingles AS (
  SELECT DISTINCT d.doc_id, substr(d.t, CAST(i.i AS INTEGER), 5) AS sh
  FROM kdocs d,
       LATERAL (SELECT unnest(range(1, greatest(length(d.t) - 4, 0) + 1)) AS i) i
  WHERE length(d.t) >= 5
),
khashed AS (
  SELECT doc_id, sh, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h
  FROM kshingles
),
kparams(j, a, b) AS (VALUES {values}),
kminh AS (
  SELECT h.doc_id, p.j, MIN((p.a * h.h + p.b) % {MERSENNE_31}) AS mh
  FROM khashed h CROSS JOIN kparams p
  GROUP BY 1, 2
),
ksigs AS (
  SELECT doc_id, list(mh ORDER BY j) AS sig FROM kminh GROUP BY 1
),
kbands AS (
  SELECT s.doc_id, d.pk, b.band,
         md5(array_to_string(s.sig[b.band * 4 + 1 : b.band * 4 + 4], ',')) AS bh
  FROM ksigs s
  JOIN kdocs d ON d.doc_id = s.doc_id,
       LATERAL (SELECT unnest(range(0, 16)) AS band) b
  QUALIFY row_number() OVER (PARTITION BY d.pk, b.band, bh ORDER BY s.doc_id)
          <= 1000
),
kcand AS (
  SELECT DISTINCT l.pk, l.doc_id AS id_a, r.doc_id AS id_b
  FROM kbands l
  JOIN kbands r ON l.pk = r.pk AND l.band = r.band AND l.bh = r.bh
  WHERE l.doc_id < r.doc_id
),
kpref AS (
  SELECT c.pk, c.id_a, c.id_b
  FROM kcand c
  JOIN ksigs sa ON sa.doc_id = c.id_a
  JOIN ksigs sb ON sb.doc_id = c.id_b
  WHERE len(list_filter(range(1, 65),
            i -> sa.sig[CAST(i AS INTEGER)] = sb.sig[CAST(i AS INTEGER)]))
        >= {min_match}
),
kinter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM kshingles a JOIN kshingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
ksizes AS (SELECT doc_id, COUNT(*) AS n FROM kshingles GROUP BY 1),
lsh_pairs AS (
  SELECT c.id_a, c.id_b
  FROM kpref c
  JOIN kinter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN ksizes sa ON sa.doc_id = c.id_a
  JOIN ksizes sb ON sb.doc_id = c.id_b
  WHERE ROUND(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6)
        >= 0.6
),
{_SQL_COMPONENT_CTES},
p11_ranked AS (
  SELECT k.pk, s.doc, s.component, p.quality,
         COUNT(*) OVER (PARTITION BY s.component) AS cluster_size,
         ROW_NUMBER() OVER (PARTITION BY s.component
                            ORDER BY p.quality DESC, s.doc ASC) AS rn
  FROM comp s
  JOIN prof p ON p.doc_id = s.doc
  JOIN kdocs k ON k.doc_id = s.doc
)
SELECT pk AS source,
       CAST(component AS BIGINT) AS component,
       CAST(doc AS BIGINT) AS survivor,
       quality AS survivor_quality,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(cluster_size - 1 AS BIGINT) AS dropped
FROM p11_ranked WHERE rn = 1
ORDER BY 1, 2
"""


PANEL_QUERIES.update({"p11_panel_survivors": q_p11_panel_survivors})
PANEL_ORACLES.update({"p11_panel_survivors": _sql_p11()})


# -------- p12: entity-scoped IVF ANN (the keyed similarity SCALE path)


def q_p12_panel_ivf(spark, sf_dir):
    """The similarity family's SCALE lane in panel mode
    (operators/similarity.py:ivf_topk_keyed): IVF approximate top-3
    per query with ONE shared coarse quantizer (centroids pinned to
    the vec_id<16 embeddings — the x05c rule, so the oracle
    reproduces them from the same view) and the candidate join keyed
    on (label, cell) — a query scores only its own entity's vectors
    in its nprobe probed cells, so no cross-entity candidate is ever
    generated and the pair space is per-entity cell blocks.  p08 is
    the exact twin; this is what actually runs at 100 TB."""
    from .operators.similarity import ivf_topk_keyed

    emb = _read(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 16)
        .select("vec_id", "embedding").orderBy("vec_id").collect()
    ]
    queries = emb.where(F.col("vec_id") % 25 == 0).select(
        "label",
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = ivf_topk_keyed(
        emb, queries, "label", dim=64, k=3, nprobe=4, centroids=cents
    )
    return out.select(
        F.col("label").cast("long").alias("label"),
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "score",
    )


SQL_P12 = """
WITH e AS (
  SELECT label, vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT id AS cid, v AS cv,
         list_reduce(list_transform(range(1, 65),
             i -> v[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)]),
             (a, x) -> a + x) AS c2
  FROM e WHERE id < 16
),
dists AS (
  SELECT e.label, e.id, cent.cid,
         list_reduce(list_transform(range(1, 65),
             i -> e.v[CAST(i AS INTEGER)] * e.v[CAST(i AS INTEGER)]),
             (a, x) -> a + x)
         - 2.0 * list_reduce(list_transform(range(1, 65),
             i -> e.v[CAST(i AS INTEGER)] * cent.cv[CAST(i AS INTEGER)]),
             (a, x) -> a + x)
         + cent.c2 AS d2
  FROM e CROSS JOIN cent
),
cells AS (
  SELECT label, id, cid AS cell FROM (
    SELECT label, id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
    FROM dists
  ) WHERE rn = 1
),
qprobe AS (
  SELECT label, id AS query_id, cid AS cell FROM (
    SELECT label, id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
    FROM dists WHERE id % 25 = 0
  ) WHERE rn <= 4
),
cand AS (
  SELECT q.label, q.query_id, c.id AS neighbor_id
  FROM qprobe q
  JOIN cells c ON c.cell = q.cell AND c.label = q.label
  WHERE c.id <> q.query_id
),
scored AS (
  SELECT cd.label, cd.query_id, cd.neighbor_id,
         ROUND(
           list_reduce(list_transform(range(1, 65),
               i -> a.v[CAST(i AS INTEGER)] * b.v[CAST(i AS INTEGER)]),
               (acc, x) -> acc + x)
           / (sqrt(list_reduce(list_transform(range(1, 65),
                   i -> b.v[CAST(i AS INTEGER)] * b.v[CAST(i AS INTEGER)]),
                   (acc, x) -> acc + x))
              * sqrt(list_reduce(list_transform(range(1, 65),
                   i -> a.v[CAST(i AS INTEGER)] * a.v[CAST(i AS INTEGER)]),
                   (acc, x) -> acc + x))), 6) AS score
  FROM cand cd
  JOIN e a ON a.id = cd.query_id
  JOIN e b ON b.id = cd.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label, query_id
                               ORDER BY score DESC, neighbor_id ASC)
            AS rank
  FROM scored
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 3
"""


PANEL_QUERIES.update({"p12_panel_ivf": q_p12_panel_ivf})
PANEL_ORACLES.update({"p12_panel_ivf": SQL_P12})
