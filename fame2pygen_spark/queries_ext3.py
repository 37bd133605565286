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
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
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
    from .queries_ext import _read_events

    # date from integer µs (ts physical type varies by generation —
    # never read events.ts raw; see _read_events)
    ev = _read_events(spark, sf_dir).withColumn(
        "__d",
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.expr("int(ts_us div 86400000000)"),
        ),
    )
    return tp.decayed_sum(
        ev, ["event_type"], "__d", "value", half_life_days=7
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


# ------------------------------------------ x98: bigram LM surprisal


def q_x98_bigram_surprisal(spark, sf_dir):
    """Add-k-smoothed bigram surprisal (operators/text.py:
    bigram_surprisal) over documents, top-20 most-surprising docs —
    the contextual fluency signal that catches shuffled/stuffed text
    the unigram model (x50) cannot.  Bigrams come from a lead window
    over (doc, position) — row-linear, no token self-join; per-bigram
    surprisals are decimal-cast before the per-doc mean."""
    from .operators.text import bigram_surprisal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bigram_surprisal(docs, "text", "doc_id", k=0.5)
    return (
        out.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_bigrams",
            "mean_surprisal",
        )
        .orderBy(F.col("mean_surprisal").desc(), "doc_id")
        .limit(20)
    )


SQL_X98 = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '') AS tk
  FROM documents
), uni AS (
  SELECT unnest(tk) AS w FROM toks
), big AS (
  SELECT doc_id, b.w1, b.w2
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(tk)),
             i -> {'w1': tk[CAST(i AS INTEGER)],
                   'w2': tk[CAST(i AS INTEGER) + 1]})) AS b
    FROM toks
  )
), v AS (
  SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vocab FROM uni
), cb AS (
  SELECT w1, w2, count(*) AS cbn FROM big GROUP BY w1, w2
), cw AS (
  SELECT w1, sum(cbn) AS cwn FROM cb GROUP BY w1
), scored AS (
  SELECT g.doc_id,
         CAST(-log2((cb.cbn + 0.5)
                    / (CAST(cw.cwn AS DOUBLE) + 0.5 * v.vocab))
              AS DECIMAL(38,12)) AS s
  FROM big g
  JOIN cb ON g.w1 = cb.w1 AND g.w2 = cb.w2
  JOIN cw ON g.w1 = cw.w1
  CROSS JOIN v
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS mean_surprisal
FROM scored
GROUP BY doc_id
ORDER BY mean_surprisal DESC, doc_id
LIMIT 20
"""


# ------------------------------------------------- x99: CDC apply


def q_x99_cdc_apply(spark, sf_dir):
    """Latest-wins CDC snapshot maintenance (operators/temporal.py:
    cdc_apply): the customer table is the base snapshot, orders act as
    a changelog on the customer key ((o_orderdate, o_orderkey)
    sequence; finalized orders with key % 10 == 0 are deletes, the
    rest upsert balance + priority segment).  The oracle rebuilds the
    same merge with a SQL window — the aggregated final snapshot must
    match exactly, proving winner selection, delete, upsert, and
    passthrough semantics."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = cust.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    changes = orders.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderdate").alias("seq_ts"),
        F.col("o_orderkey").alias("seq_id"),
        F.when(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_orderkey") % 10 == 0),
            F.lit("D"),
        )
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("o_totalprice").alias("acctbal"),
        F.col("o_orderpriority").alias("segment"),
    )
    snap = tp.cdc_apply(
        base,
        changes,
        key_cols=["cust_key"],
        val_cols=["acctbal", "segment"],
        op_col="op",
        seq_cols=["seq_ts", "seq_id"],
    )
    return (
        snap.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.round(
                F.sum(F.col("acctbal").cast("decimal(38,12)")).cast(
                    "double"
                ),
                6,
            ).alias("sum_acctbal"),
        )
        .orderBy("segment")
    )


SQL_X99 = """
WITH changes AS (
  SELECT o_custkey AS cust_key, o_orderdate AS seq_ts,
         o_orderkey AS seq_id,
         CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 0
              THEN 'D' ELSE 'U' END AS op,
         o_totalprice AS acctbal, o_orderpriority AS segment
  FROM orders
), latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY cust_key ORDER BY seq_ts DESC, seq_id DESC) AS rn
    FROM changes
  ) WHERE rn = 1
), snap AS (
  SELECT c.c_custkey AS cust_key, c.c_acctbal AS acctbal,
         c.c_mktsegment AS segment
  FROM customer c
  WHERE c.c_custkey NOT IN (SELECT cust_key FROM latest)
  UNION ALL
  SELECT cust_key, acctbal, segment FROM latest WHERE op <> 'D'
)
SELECT segment,
       CAST(count(*) AS BIGINT) AS n_keys,
       ROUND(CAST(sum(CAST(acctbal AS DECIMAL(38,12))) AS DOUBLE), 6)
         AS sum_acctbal
FROM snap
GROUP BY segment
ORDER BY segment
"""


# -------------------------------------------- x100: seasonal profile


def q_x100_seasonal(spark, sf_dir):
    """Month-of-year seasonal decomposition (operators/temporal.py:
    seasonal_profile) of event values per event type: month means and
    multiplicative seasonal indices from one decimal-moment hash
    aggregation; the normalizing overall mean is a window over the
    <=12 aggregated rows per key, never the fact table."""
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir).withColumn(
        "__d",
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.expr("int(ts_us div 86400000000)"),
        ),
    )
    return tp.seasonal_profile(
        ev, ["event_type"], "__d", "value"
    ).orderBy("event_type", "month")


SQL_X100 = """
WITH m AS (
  SELECT event_type,
         month(CAST(to_timestamp(epoch_us(ts) // 86400000000 * 86400)
                    AS DATE)) AS month,
         count(*) AS n,
         sum(CAST(value AS DECIMAL(38,12))) AS s
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(month AS BIGINT) AS month,
       CAST(n AS BIGINT) AS n,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS month_avg,
       ROUND((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(sum(s) OVER (PARTITION BY event_type) AS DOUBLE)
                / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)),
             6) AS seasonal_index
FROM m
ORDER BY event_type, month
"""


# ------------------------------------- x101: embedding covariance


def q_x101_embedding_cov(spark, sf_dir):
    """Exact covariance of the leading 16 embedding dimensions
    (operators/similarity.py:embedding_covariance): posexplode +
    rowid self-join to d(d+1)/2 product terms, decimal moment sums —
    the PCA/whitening input computed the order-insensitive way."""
    from .operators.similarity import embedding_covariance

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_covariance(
        emb, "embedding", "vec_id", dims=16
    ).orderBy(
        "i", "j"
    )


SQL_X101 = """
WITH comp AS (
  SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS i,
         CAST(embedding[CAST(t.i AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings, range(1, 17) AS t(i)
), pairs AS (
  SELECT a.i AS i, b.i AS j, a.x AS x, b.x AS y
  FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.i <= b.i
), m AS (
  SELECT i, j, count(*) AS n,
         sum(CAST(x AS DECIMAL(38,12))) AS sx,
         sum(CAST(y AS DECIMAL(38,12))) AS sy,
         sum(CAST(x * y AS DECIMAL(38,12))) AS sxy
  FROM pairs GROUP BY i, j
)
SELECT i, j, CAST(n AS BIGINT) AS n,
       ROUND(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)),
             6) + 0.0 AS cov
FROM m
ORDER BY i, j
"""


# ------------------------------------------- x102: audio features


def _wav_header_hex() -> str:
    """RIFF/WAVE header for 64-sample 16-bit mono PCM @ 8 kHz."""
    import struct

    hdr = (
        b"RIFF"
        + struct.pack("<I", 164)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", 128)
    )
    return hdr.hex()


_WAV_SAMPLE_HEX = (
    "transform(sequence(0, 63), i -> concat("
    "substring(lpad(hex(((doc_id * 31 + i * 17) % 2001 - 1000 + 65536)"
    " % 65536), 4, '0'), 3, 2), "
    "substring(lpad(hex(((doc_id * 31 + i * 17) % 2001 - 1000 + 65536)"
    " % 65536), 4, '0'), 1, 2)))"
)


def q_x102_audio_features(spark, sf_dir):
    """REAL-decode audio feature extraction end to end
    (operators/multimodal.py:audio_features): each document renders a
    deterministic 64-sample 16-bit PCM WAV payload in pure column
    algebra (RIFF header literal + little-endian sample hex), the
    operator parses the RIFF chunks and computes RMS with numpy inside
    mapInPandas.  The oracle never sees the bytes — it derives RMS
    arithmetically from the sample formula (all addends are dyadic
    rationals, so the float sum is exact in any order), proving the
    encode -> chunk-walk -> decode -> feature pipeline is bit-correct."""
    from .operators.multimodal import audio_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.concat(
        F.unhex(F.lit(_wav_header_hex())),
        F.unhex(F.concat_ws("", F.expr(_WAV_SAMPLE_HEX))),
    )
    staged = docs.select(
        F.col("doc_id").cast("long").alias("asset_id"),
        payload.alias("payload"),
    )
    return audio_features(staged).orderBy("asset_id")


SQL_X102 = """
WITH sq AS (
  SELECT d.doc_id,
         sum(CAST(((d.doc_id * 31 + t.i * 17) % 2001 - 1000)
                  * ((d.doc_id * 31 + t.i * 17) % 2001 - 1000)
                  AS DOUBLE)) AS ssq
  FROM documents d, range(0, 64) AS t(i)
  GROUP BY d.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS asset_id,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(64 AS BIGINT) AS n_samples,
       CAST(8 AS BIGINT) AS duration_ms,
       printf('%.6f', sqrt(ssq / 68719476736.0)) AS rms,
       'ok' AS decoded
FROM sq
ORDER BY asset_id
"""

EXT3_QUERIES.update({
    "x98_bigram_surprisal": q_x98_bigram_surprisal,
    "x99_cdc_apply": q_x99_cdc_apply,
    "x100_seasonal": q_x100_seasonal,
    "x101_embedding_cov": q_x101_embedding_cov,
    "x102_audio_features": q_x102_audio_features,
})

EXT3_ORACLES.update({
    "x98_bigram_surprisal": SQL_X98,
    "x99_cdc_apply": SQL_X99,
    "x100_seasonal": SQL_X100,
    "x101_embedding_cov": SQL_X101,
    "x102_audio_features": SQL_X102,
})


# --------------------------------------------- x103: k-anonymity


def q_x103_k_anonymity(spark, sf_dir):
    """k-anonymity privacy audit (operators/quality.py:k_anonymity)
    over the (market segment, nation) quasi-identifier pair, rolled up
    per segment: how many equivalence classes fall below k=3 and how
    many individuals sit in them — the pre-release gate complementing
    content-level PII scrubbing (x20)."""
    from .operators.quality import k_anonymity

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    groups = k_anonymity(
        cust, ["c_mktsegment", "c_nationkey"], k=3
    )
    return (
        groups.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.count(F.when(F.col("violates_k"), 1))
            .cast("long")
            .alias("n_violating"),
            F.sum(
                F.when(F.col("violates_k"), F.col("group_size")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_rows_at_risk"),
            F.min("group_size").cast("long").alias("min_group_size"),
        )
        .orderBy("segment")
    )


SQL_X103 = """
WITH g AS (
  SELECT c_mktsegment AS segment, c_nationkey,
         count(*) AS group_size,
         count(*) < 3 AS violates_k
  FROM customer GROUP BY 1, 2
)
SELECT segment,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(CASE WHEN violates_k THEN 1 END) AS BIGINT)
         AS n_violating,
       CAST(sum(CASE WHEN violates_k THEN group_size ELSE 0 END)
            AS BIGINT) AS n_rows_at_risk,
       CAST(min(group_size) AS BIGINT) AS min_group_size
FROM g
GROUP BY segment
ORDER BY segment
"""


# --------------------------------------- x104: seasonal anomalies


def q_x104_seasonal_anomaly(spark, sf_dir):
    """Seasonality-adjusted robust outliers (operators/temporal.py:
    seasonal_anomalies = seasonal_profile ∘ mad_outliers): event
    values minus their type's month-of-year mean, flagged by the MAD
    modified z-test — December spikes in December-spiking series stay
    quiet; off-season drifts fire."""
    from .queries_ext import _read_events
    from .operators.temporal import seasonal_anomalies

    ev = _read_events(spark, sf_dir).withColumn(
        "__d",
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.expr("int(ts_us div 86400000000)"),
        ),
    )
    return seasonal_anomalies(
        ev,
        ["event_type"],
        "__d",
        "value",
        threshold=3.5,
        keep_cols=["event_id"],
    ).orderBy("event_id")


SQL_X104 = """
WITH e AS (
  SELECT event_id, event_type, value,
         month(CAST(to_timestamp(epoch_us(ts) // 86400000000 * 86400)
                    AS DATE)) AS month
  FROM events
), prof AS (
  SELECT event_type, month,
         ROUND(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS month_avg
  FROM e WHERE value IS NOT NULL GROUP BY 1, 2
), r AS (
  SELECT e.event_id, e.event_type, e.month, e.value,
         e.value - p.month_avg AS residual
  FROM e JOIN prof p USING (event_type, month)
), med AS (
  SELECT event_type, quantile_cont(residual, 0.5) AS med
  FROM r GROUP BY event_type
), mad AS (
  SELECT r.event_type, med.med,
         quantile_cont(abs(r.residual - med.med), 0.5) AS mad
  FROM r JOIN med USING (event_type)
  GROUP BY r.event_type, med.med
), z AS (
  SELECT r.event_id, r.event_type, r.month, r.value, r.residual,
         ROUND(0.6745 * (r.residual - mad.med) / mad.mad, 6) AS robust_z
  FROM r JOIN mad USING (event_type)
  WHERE r.residual IS NOT NULL AND mad.mad > 0
)
SELECT event_id, event_type, CAST(month AS BIGINT) AS month, value,
       ROUND(residual, 6) AS residual, robust_z
FROM z
WHERE abs(robust_z) > 3.5
ORDER BY event_id
"""


# --------------------------------------- x105: compaction planning


def q_x105_compaction(spark, sf_dir):
    """Small-file compaction planning (operators/layout.py:
    compaction_plan): synthetic file metadata — one file per
    (returnflag, ship month) with a deterministic integer size — is
    binned into ~8-file compaction groups by exclusive-cumsum
    bucketing, the greedy one-pass rule lakehouse compactors use.
    Pure integer metadata math: exact at any scale."""
    from .operators.layout import compaction_plan

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    files = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        (
            F.year(F.col("l_shipdate")) * 100
            + F.month(F.col("l_shipdate"))
        )
        .cast("long")
        .alias("file_id"),
    ).agg((F.count(F.lit(1)) * 4096).cast("long").alias("size_bytes"))
    plan = compaction_plan(
        files,
        partition_cols=["rf"],
        file_col="file_id",
        size_col="size_bytes",
        target_size=8_000_000,
    )
    return plan.orderBy("rf", "compaction_group")


SQL_X105 = """
WITH files AS (
  SELECT l_returnflag AS rf,
         CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
           AS file_id,
         CAST(count(*) * 4096 AS BIGINT) AS size_bytes
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT rf, file_id, size_bytes,
         coalesce(sum(size_bytes) OVER (
           PARTITION BY rf ORDER BY file_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before
  FROM files
)
SELECT rf,
       CAST(before // 8000000 AS BIGINT) AS compaction_group,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
       sum(size_bytes) >= 8000000 AS reaches_target
FROM cum
GROUP BY rf, CAST(before // 8000000 AS BIGINT)
ORDER BY rf, compaction_group
"""


# ------------------------------------------ x106: RAKE keywords


def q_x106_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (operators/text.py:rake_keywords):
    stopword-split candidate phrases via the gaps-and-islands window
    (no HOF lambda over documents), degree/frequency word scores, and
    decimal-summed phrase scores — corpus top-20."""
    from .operators.text import rake_keywords

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return rake_keywords(docs, "text", "doc_id", top_n=20)


def _sql_x106() -> str:
    from .operators.text import RAKE_STOPWORDS

    stop = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, u['pos'] AS pos, u['w'] AS w
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(tk) + 1),
             i -> {{'pos': i - 1,
                    'w': tk[CAST(i AS INTEGER)]}})) AS u
    FROM (
      SELECT doc_id,
             list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '') AS tk
      FROM documents
    )
  )
), nonstop AS (
  SELECT doc_id, pos, w,
         pos - row_number() OVER (
           PARTITION BY doc_id ORDER BY pos) AS grp
  FROM toks WHERE w NOT IN ({stop})
), inst AS (
  SELECT doc_id, grp,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen
  FROM nonstop GROUP BY doc_id, grp
  HAVING count(*) <= 4
), words AS (
  SELECT doc_id, grp, plen, unnest(string_split(phrase, ' ')) AS w
  FROM inst
), stats AS (
  SELECT w, count(*) AS freq, sum(plen) AS deg FROM words GROUP BY w
), inst_scores AS (
  SELECT wo.doc_id, wo.grp,
         CAST(sum(CAST(CAST(s.deg AS DOUBLE) / CAST(s.freq AS DOUBLE)
                       AS DECIMAL(38,12))) AS DOUBLE) AS ps
  FROM words wo JOIN stats s USING (w)
  GROUP BY wo.doc_id, wo.grp
), phrases AS (
  SELECT i.phrase,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         ROUND(max(sc.ps), 6) AS score
  FROM inst i JOIN inst_scores sc
    ON i.doc_id = sc.doc_id AND i.grp = sc.grp
  GROUP BY i.phrase
)
SELECT phrase, n_occurrences, score
FROM phrases
ORDER BY score DESC, phrase ASC
LIMIT 20
"""


# ------------------------------------- x107: late-data accounting


def q_x107_late_data(spark, sf_dir):
    """Watermark sizing report (operators/temporal.py:
    late_data_profile): replay events in arrival order (event_id) per
    type and count rows a 1-second streaming watermark WOULD drop,
    plus the worst event-time lag — the number that decides
    withWatermark() before deployment.  Exact integer µs arithmetic."""
    from .queries_ext import _read_events
    from .operators.temporal import late_data_profile

    ev = _read_events(spark, sf_dir)
    return late_data_profile(
        ev,
        ["event_type"],
        "ts_us",
        "event_id",
        watermark=1_000_000,
    ).orderBy("event_type")


SQL_X107 = """
WITH s AS (
  SELECT event_type,
         greatest(coalesce(
           max(epoch_us(ts)) OVER (
             PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - epoch_us(ts), 0), 0) AS lag
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(CASE WHEN lag > 1000000 THEN 1 END) AS BIGINT)
         AS n_late,
       CAST(max(lag) AS BIGINT) AS max_lateness
FROM s
GROUP BY event_type
ORDER BY event_type
"""


EXT3_QUERIES.update({
    "x103_k_anonymity": q_x103_k_anonymity,
    "x104_seasonal_anomaly": q_x104_seasonal_anomaly,
    "x105_compaction": q_x105_compaction,
    "x106_rake_keywords": q_x106_rake_keywords,
    "x107_late_data": q_x107_late_data,
})

EXT3_ORACLES.update({
    "x103_k_anonymity": SQL_X103,
    "x104_seasonal_anomaly": SQL_X104,
    "x105_compaction": SQL_X105,
    "x106_rake_keywords": _sql_x106(),
    "x107_late_data": SQL_X107,
})


# ---------------------------------------------- x108: CUPED A/B


def q_x108_cuped(spark, sf_dir):
    """CUPED variance-reduced experiment readout
    (operators/behavior.py:cuped_lift): pre-period user value sums as
    the covariate, post-period sums as the metric (cutoff = midpoint
    of the observed time range, integer µs), deterministic hash A/A
    split.  var_y_cuped < var_y is the whole point — the oracle
    rebuilds θ, the adjustment, and both variances exactly."""
    from .queries_ext import _read_events
    from .operators.behavior import cuped_lift

    ev = _read_events(spark, sf_dir)
    mm = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    cutoff = (mm[0] + mm[1]) // 2
    return cuped_lift(
        ev, ts_col="ts_us", value_col="value", cutoff=cutoff
    ).orderBy("variant")


SQL_X108 = """
WITH cut AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS c FROM events
), pu AS (
  SELECT user_id,
         CAST(sum(CAST(CASE WHEN epoch_us(ts) < cut.c THEN value
                        ELSE 0.0 END AS DECIMAL(38,12))) AS DOUBLE) AS x,
         CAST(sum(CAST(CASE WHEN epoch_us(ts) >= cut.c THEN value
                        ELSE 0.0 END AS DECIMAL(38,12))) AS DOUBLE) AS y
  FROM events CROSS JOIN cut
  GROUP BY user_id, cut.c
), v AS (
  SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 'a' ELSE 'b' END AS variant,
         x, y
  FROM pu
), mom AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
  FROM v
), adj AS (
  SELECT v.variant, v.y,
         v.y - coalesce(
           (m.sxy / m.n - (m.sx / m.n) * (m.sy / m.n))
           / NULLIF(m.sxx / m.n - (m.sx / m.n) * (m.sx / m.n), 0.0),
           0.0) * (v.x - m.sx / m.n) AS yc
  FROM v CROSS JOIN mom m
)
SELECT variant,
       CAST(count(*) AS BIGINT) AS n_users,
       ROUND(CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mean_y,
       ROUND(CAST(sum(CAST(yc AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mean_y_cuped,
       ROUND(CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)
             - (CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                / CAST(count(*) AS DOUBLE))
               * (CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE)), 6) AS var_y,
       ROUND(CAST(sum(CAST(yc * yc AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)
             - (CAST(sum(CAST(yc AS DECIMAL(38,12))) AS DOUBLE)
                / CAST(count(*) AS DOUBLE))
               * (CAST(sum(CAST(yc AS DECIMAL(38,12))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE)), 6) AS var_y_cuped
FROM adj
GROUP BY variant
ORDER BY variant
"""


# ------------------------------------- x109: calibration curve


def q_x109_calibration(spark, sf_dir):
    """Score-calibration curve (operators/behavior.py:
    calibration_curve): event value as the score, purchase as the
    outcome, ten equal-population bins from exact-quantile boundaries
    (the engine-paired percentile ↔ quantile_cont definition), one
    decimal-moment aggregation."""
    from .queries_ext import _read_events
    from .operators.behavior import calibration_curve

    ev = _read_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.withColumn(
        "outcome", (F.col("event_type") == "purchase").cast("int")
    )
    return calibration_curve(scored, "value", "outcome", n_bins=10)


SQL_X109 = """
WITH src AS (
  SELECT value AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS outcome
  FROM events WHERE value IS NOT NULL
), b AS (
  SELECT [quantile_cont(score, 0.1), quantile_cont(score, 0.2),
          quantile_cont(score, 0.3), quantile_cont(score, 0.4),
          quantile_cont(score, 0.5), quantile_cont(score, 0.6),
          quantile_cont(score, 0.7), quantile_cont(score, 0.8),
          quantile_cont(score, 0.9)] AS bounds
  FROM src
), binned AS (
  SELECT CAST(len(list_filter(b.bounds, x -> s.score > x)) AS BIGINT)
           AS bin,
         s.score, s.outcome
  FROM src s CROSS JOIN b
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(CAST(sum(CAST(score AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mean_score,
       ROUND(CAST(sum(CAST(outcome AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS outcome_rate
FROM binned
GROUP BY bin
ORDER BY bin
"""


# --------------------------------- x110: PCA power iteration


def q_x110_pca_power(spark, sf_dir):
    """Leading-eigenvector power iteration (operators/similarity.py:
    pca_power_step) over the exact 16-dim embedding covariance (x101):
    two matvec supersteps with broadcast vector joins and decimal
    product sums — distributed dense linear algebra in the x91
    Pregel-as-DataFrames shape."""
    from .operators.similarity import (
        embedding_covariance,
        pca_power_step,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cov = embedding_covariance(emb, "embedding", "vec_id", dims=16)
    return pca_power_step(cov, dims=16, steps=2).orderBy("i")


SQL_X110 = """
WITH comp AS (
  SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS i,
         CAST(embedding[CAST(t.i AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings, range(1, 17) AS t(i)
), pairs AS (
  SELECT a.i AS i, b.i AS j, a.x AS x, b.x AS y
  FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.i <= b.i
), mo AS (
  SELECT i, j, count(*) AS n,
         sum(CAST(x AS DECIMAL(38,12))) AS sx,
         sum(CAST(y AS DECIMAL(38,12))) AS sy,
         sum(CAST(x * y AS DECIMAL(38,12))) AS sxy
  FROM pairs GROUP BY i, j
), covu AS (
  SELECT i, j,
         ROUND(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)),
               6) + 0.0 AS cov
  FROM mo
), cf AS (
  SELECT i, j, cov FROM covu
  UNION ALL
  SELECT j AS i, i AS j, cov FROM covu WHERE i <> j
), w1 AS (
  SELECT i, CAST(sum(CAST(cov AS DECIMAL(38,12))) AS DOUBLE) AS w
  FROM cf GROUP BY i
), n1 AS (
  SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE))
           AS nrm
  FROM w1
), v1 AS (
  SELECT w1.i, w1.w / NULLIF(n1.nrm, 0.0) AS v
  FROM w1 CROSS JOIN n1
), w2 AS (
  SELECT cf.i,
         CAST(sum(CAST(cf.cov * v1.v AS DECIMAL(38,12))) AS DOUBLE)
           AS w
  FROM cf JOIN v1 ON cf.j = v1.i
  GROUP BY cf.i
), n2 AS (
  SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE))
           AS nrm
  FROM w2
)
SELECT w2.i, ROUND(w2.w / NULLIF(n2.nrm, 0.0), 6) AS v
FROM w2 CROSS JOIN n2
ORDER BY w2.i
"""


# ---------------------------------------- x111: corpus novelty


def q_x111_novelty(spark, sf_dir):
    """Ingest novelty monitoring (operators/dedup.py:novelty_rate):
    per synthetic ingest day (doc_id mod 28 + 1), the fraction of
    documents whose content fingerprint debuts that day — the crawl
    health signal that catches staleness collapse and source
    switches."""
    from .operators.dedup import novelty_rate, text_fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = docs.select(
        text_fingerprint(F.col("text")).alias("fp"),
        (F.col("doc_id") % 28 + 1).cast("long").alias("ingest_day"),
    )
    return novelty_rate(staged, "fp", "ingest_day")


SQL_X111 = """
WITH fp AS (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         CAST(doc_id % 28 + 1 AS BIGINT) AS day
  FROM documents
), first AS (
  SELECT fp, min(day) AS first_day FROM fp GROUP BY fp
)
SELECT f.day,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN f.day = fi.first_day THEN 1 END) AS BIGINT)
         AS n_novel,
       ROUND(CAST(count(CASE WHEN f.day = fi.first_day THEN 1 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS novelty_rate
FROM fp f JOIN first fi USING (fp)
GROUP BY f.day
ORDER BY f.day
"""


EXT3_QUERIES.update({
    "x108_cuped": q_x108_cuped,
    "x109_calibration": q_x109_calibration,
    "x110_pca_power": q_x110_pca_power,
    "x111_novelty": q_x111_novelty,
})

EXT3_ORACLES.update({
    "x108_cuped": SQL_X108,
    "x109_calibration": SQL_X109,
    "x110_pca_power": SQL_X110,
    "x111_novelty": SQL_X111,
})


# --------------------------------- x112: entity-resolution clusters


def q_x112_er_clusters(spark, sf_dir):
    """End-to-end entity resolution: blocked fuzzy matching (x43's
    operators/linkage.py:fuzzy_self_pairs) feeds alternating-star
    connected components (x09's operators/dedup.py:
    connected_components) — near-identical part names collapse into
    clusters with a canonical (minimum-id) representative.  The
    oracle rebuilds the pair list AND the transitive closure via a
    recursive CTE, proving the two operators compose correctly."""
    from .operators.dedup import connected_components
    from .operators.linkage import fuzzy_self_pairs

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    pairs = fuzzy_self_pairs(
        part.select("p_partkey", "p_name"), "p_name", "p_partkey",
        max_distance=3,
    )
    cc = connected_components(
        pairs.select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
        )
    )
    clusters = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    named = clusters.join(
        part.select(
            F.col("p_partkey").cast("long").alias("component"),
            F.col("p_name").alias("canonical_name"),
        ),
        on="component",
    )
    return named.select(
        F.col("component").cast("long").alias("component"),
        "n_members",
        "canonical_name",
    ).orderBy("component")


SQL_X112 = """
WITH RECURSIVE base AS (
  SELECT p_partkey AS id, p_name AS text,
         regexp_extract(lower(p_name), '[^ ]+$') AS bk,
         length(p_name) AS len
  FROM part
), capped AS (
  SELECT id, text, bk, len FROM (
    SELECT id, text, bk, len,
           ROW_NUMBER() OVER (PARTITION BY bk ORDER BY id) AS rn
    FROM base
  ) WHERE rn <= 1000
), lsh_pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM capped a JOIN capped b
    ON a.bk = b.bk AND a.id < b.id AND abs(a.len - b.len) <= 3
  WHERE levenshtein(a.text, b.text) <= 3
), edges AS (
  SELECT id_a AS u, id_b AS v FROM lsh_pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM lsh_pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
),
comp AS (
  SELECT u AS doc, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
)
SELECT CAST(c.component AS BIGINT) AS component,
       CAST(count(*) AS BIGINT) AS n_members,
       p.p_name AS canonical_name
FROM comp c JOIN part p ON p.p_partkey = c.component
GROUP BY c.component, p.p_name
ORDER BY component
"""


EXT3_QUERIES.update({"x112_er_clusters": q_x112_er_clusters})
EXT3_ORACLES.update({"x112_er_clusters": SQL_X112})


# --------------------------------- x113: language confusion matrix


def q_x113_lang_confusion(spark, sf_dir):
    """Language-ID evaluation: confusion matrix of the declared
    ``lang`` column against the marker-ratio detector
    (operators/text.py:detect_language) — per (declared, predicted)
    cell, count and share of the declared language.  The eval-harness
    side of x06's lang-ID: a production pipeline tracks this matrix
    to catch detector drift when the corpus mix shifts."""
    from .operators.text import detect_language

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = docs.select(
        F.col("lang").alias("declared_lang"),
        detect_language(F.col("text")).alias("predicted_lang"),
    )
    cells = pred.groupBy("declared_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from pyspark.sql import Window

    wd = Window.partitionBy("declared_lang")
    return cells.select(
        "declared_lang",
        "predicted_lang",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(wd).cast("double"),
            6,
        ).alias("share_of_declared"),
    ).orderBy("declared_lang", "predicted_lang")


def _sql_x113() -> str:
    from .queries_ext import _sql_profile_ctes

    return f"""
WITH {_sql_profile_ctes()}
SELECT d.lang AS declared_lang,
       p.lang_pred AS predicted_lang,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(CAST(count(*) AS DOUBLE)
             / CAST(sum(count(*)) OVER (PARTITION BY d.lang) AS DOUBLE),
             6) AS share_of_declared
FROM prof p JOIN documents d USING (doc_id)
GROUP BY d.lang, p.lang_pred
ORDER BY declared_lang, predicted_lang
"""


EXT3_QUERIES.update({"x113_lang_confusion": q_x113_lang_confusion})
EXT3_ORACLES.update({"x113_lang_confusion": _sql_x113()})


# ------------------------------------- x114: product quantization


def q_x114_pq_encode(spark, sf_dir):
    """Product-quantization encoding (operators/similarity.py:
    pq_encode): 64-dim embeddings → 4 subspace codes (8-entry
    codebooks pinned to the vec_id<8 slices, the x75/x05c rule) plus
    exact reconstruction error.  Row-local, zero shuffle; every
    distance is the sequential index-order fold, so the oracle
    reproduces codes and errors bitwise."""
    from .operators.similarity import pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pinned = (
        emb.where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    cents = [
        [
            [float(x) for x in r["embedding"][s * 16 : (s + 1) * 16]]
            for r in pinned
        ]
        for s in range(4)
    ]
    out = pq_encode(
        emb, centroids=cents, sub_dims=16
    )
    return out.select(
        F.col("id").cast("long").alias("id"),
        "c0", "c1", "c2", "c3", "recon_err",
    ).orderBy("id")


SQL_X114 = """
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT id AS code, v AS cv FROM e WHERE id < 8),
subd AS (
  SELECT e.id, s.s, cent.code,
         list_reduce(list_transform(range(1, 17),
           i -> (e.v[CAST(s.s * 16 + i AS INTEGER)]
                 - cent.cv[CAST(s.s * 16 + i AS INTEGER)])
                * (e.v[CAST(s.s * 16 + i AS INTEGER)]
                   - cent.cv[CAST(s.s * 16 + i AS INTEGER)])),
           (a, x) -> a + x) AS d2
  FROM e CROSS JOIN cent, range(0, 4) AS s(s)
),
best AS (
  SELECT id, s, code, d2 FROM (
    SELECT id, s, code, d2,
           ROW_NUMBER() OVER (PARTITION BY id, s ORDER BY d2, code) AS rn
    FROM subd
  ) WHERE rn = 1
),
pivoted AS (
  SELECT id,
         CAST(max(CASE WHEN s = 0 THEN code END) AS INTEGER) AS c0,
         CAST(max(CASE WHEN s = 1 THEN code END) AS INTEGER) AS c1,
         CAST(max(CASE WHEN s = 2 THEN code END) AS INTEGER) AS c2,
         CAST(max(CASE WHEN s = 3 THEN code END) AS INTEGER) AS c3,
         max(CASE WHEN s = 0 THEN d2 END)
           + max(CASE WHEN s = 1 THEN d2 END)
           + max(CASE WHEN s = 2 THEN d2 END)
           + max(CASE WHEN s = 3 THEN d2 END) AS err
  FROM best GROUP BY id
)
SELECT CAST(id AS BIGINT) AS id, c0, c1, c2, c3,
       ROUND(err, 6) AS recon_err
FROM pivoted
ORDER BY id
"""


EXT3_QUERIES.update({"x114_pq_encode": q_x114_pq_encode})
EXT3_ORACLES.update({"x114_pq_encode": SQL_X114})


# ------------------------------- x115: asymmetric containment join


def q_x115_containment(spark, sf_dir):
    """Exact asymmetric containment self-join (operators/dedup.py:
    prefix_containment_join): ordered pairs where >= 60% of A's
    3-gram set appears in B — the quote/subset detector Jaccard-based
    dedup (x03/x72) structurally misses.  Probe-side-only prefix
    filtering, complete index side, no length filter (small-inside-
    large is the target).  Oracle: brute-force ordered pairs on the
    same hashed grams."""
    from .operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dd.prefix_containment_join(
        docs, "text", "doc_id", n=3, threshold=0.6
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "containment",
    ).orderBy("id_a", "id_b")


SQL_X115 = """
WITH g AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
           list_transform(
             range(1, greatest(len(toks) - 2, 0) + 1),
             i -> toks[CAST(i AS INTEGER)] || ' ' ||
                  toks[CAST(i AS INTEGER) + 1] || ' ' ||
                  toks[CAST(i AS INTEGER) + 2]),
           x -> ('0x' || substr(md5(x), 1, 15))::BIGINT))) AS ng
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
             / CAST(len(a.ng) AS DOUBLE), 6) AS containment
FROM gg a JOIN gg b ON a.doc_id <> b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
            / CAST(len(a.ng) AS DOUBLE), 6) >= 0.6
ORDER BY id_a, id_b
"""


EXT3_QUERIES.update({"x115_containment": q_x115_containment})
EXT3_ORACLES.update({"x115_containment": SQL_X115})


# --------------------------------- x116: Kaplan-Meier survival


def q_x116_kaplan_meier(spark, sf_dir):
    """Right-censored Kaplan-Meier time-to-conversion
    (operators/behavior.py:kaplan_meier): duration = days from a
    user's first activity to their first purchase; users who never
    purchase are CENSORED at their observation span (they leave the
    risk set without counting as conversions) — the estimator the
    naive conversion curve biases low.  Product via exp of
    decimal-cast log sums; all cumulations over day-bounded aggregate
    rows."""
    from .queries_ext import _read_events
    from .operators.behavior import kaplan_meier

    ev = _read_events(spark, sf_dir)
    DAY = 86_400_000_000
    per_user = ev.groupBy("user_id").agg(
        F.min(F.expr("ts_us div 86400000000")).alias("__fd"),
        F.max(F.expr("ts_us div 86400000000")).alias("__ld"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("ts_us div 86400000000"),
            )
        ).alias("__pd"),
    )
    durations = per_user.select(
        F.coalesce(
            F.col("__pd") - F.col("__fd"),
            F.col("__ld") - F.col("__fd"),
        ).alias("t"),
        F.col("__pd").isNull().cast("int").alias("censored"),
    )
    return kaplan_meier(durations)


SQL_X116 = """
WITH pu AS (
  SELECT user_id,
         min(epoch_us(ts) // 86400000000) AS fd,
         max(epoch_us(ts) // 86400000000) AS ld,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) // 86400000000 END) AS pd
  FROM events GROUP BY user_id
), lifed AS (
  SELECT coalesce(pd - fd, ld - fd) AS t,
         CASE WHEN pd IS NULL THEN 1 ELSE 0 END AS censored
  FROM pu
), per_t AS (
  SELECT t, count(*) AS n_t,
         sum(1 - censored) AS d_events,
         sum(censored) AS n_censored
  FROM lifed GROUP BY t
), tot AS (
  SELECT sum(n_t) AS N FROM per_t
), risked AS (
  SELECT p.t, p.d_events, p.n_censored,
         CAST(tot.N - coalesce(sum(p.n_t) OVER (
           ORDER BY p.t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS n_at_risk
  FROM per_t p CROSS JOIN tot
), surv AS (
  SELECT t, n_at_risk, d_events, n_censored,
         max(CASE WHEN d_events >= n_at_risk THEN 1 ELSE 0 END) OVER wc
           AS zflag,
         CAST(sum(CASE WHEN d_events < n_at_risk
             THEN CAST(ln(1.0 - CAST(d_events AS DOUBLE)
                              / CAST(n_at_risk AS DOUBLE))
                       AS DECIMAL(28,18))
             ELSE CAST(0 AS DECIMAL(28,18)) END) OVER wc AS DOUBLE)
           AS lsum
  FROM risked
  WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW)
)
SELECT CAST(t AS BIGINT) AS t,
       n_at_risk,
       CAST(d_events AS BIGINT) AS d_events,
       CAST(n_censored AS BIGINT) AS n_censored,
       ROUND(CASE WHEN zflag = 1 THEN 0.0 ELSE exp(lsum) END, 6)
         AS survival
FROM surv
WHERE d_events > 0
ORDER BY t
"""


EXT3_QUERIES.update({"x116_kaplan_meier": q_x116_kaplan_meier})
EXT3_ORACLES.update({"x116_kaplan_meier": SQL_X116})


# ------------------------------------ x117: LSH quality evaluation


def q_x117_lsh_eval(spark, sf_dir):
    """Probabilistic-dedup audit: MinHash-LSH pairs (x03's
    operators/dedup.py:minhash_lsh_pairs) scored against the EXACT
    all-pairs shingle-Jaccard ground truth at the same threshold —
    pair counts, precision, recall in one row.  Because the LSH
    pipeline verifies true Jaccard after banding, precision is 1.0 by
    construction and recall isolates banding misses — the number that
    justifies (or indicts) the band/row parameters before a 100 TB
    run.  The exact side is an eval harness, quadratic in shingle
    document frequency — both sides run on the same deterministic
    1-in-5 sample (doc_id % 5 == 0), the way LSH quality is audited
    in production: exactly on a sample, probabilistically on the
    corpus."""
    from .operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") % 5 == 0
    )
    lsh = dd.minhash_lsh_pairs(
        docs, "text", "doc_id", n=5, num_hashes=64, bands=16,
        threshold=0.6,
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )

    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    staged = docs.select(F.col("doc_id").cast("long").alias("id"), norm.alias("t"))
    sh = staged.where(F.length("t") >= 5).select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("t") - F.lit(4)),
                    lambda i: F.substring(F.col("t"), i, F.lit(5)),
                )
            )
        ).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    inter = (
        a.join(b, on="sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    exact = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), on="id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), on="id_b")
        .withColumn(
            "j",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ),
        )
        .where(F.col("j") >= 0.6)
        .select("id_a", "id_b")
    )
    common = exact.join(lsh, on=["id_a", "id_b"]).select("id_a")
    n_exact = exact.count()
    n_lsh = lsh.count()
    n_common = common.count()
    row = [(
        int(n_exact), int(n_lsh), int(n_common),
        round(n_common / n_lsh, 6) if n_lsh else None,
        round(n_common / n_exact, 6) if n_exact else None,
    )]
    return spark.createDataFrame(
        row,
        "n_exact long, n_lsh long, n_common long, "
        "precision double, recall double",
    )


def _sql_x117() -> str:
    from .queries_ext import _sql_x03_ctes

    sample = "(SELECT * FROM documents WHERE doc_id % 5 = 0)"
    return f"""
WITH {_sql_x03_ctes(source=sample)},
exact AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE ROUND(CAST(i.n_inter AS DOUBLE)
              / (sa.n + sb.n - i.n_inter), 6) >= 0.6
),
common AS (
  SELECT e.id_a FROM exact e
  JOIN lsh_pairs l ON l.id_a = e.id_a AND l.id_b = e.id_b
),
c AS (
  SELECT (SELECT count(*) FROM exact) AS n_exact,
         (SELECT count(*) FROM lsh_pairs) AS n_lsh,
         (SELECT count(*) FROM common) AS n_common
)
SELECT CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_lsh AS BIGINT) AS n_lsh,
       CAST(n_common AS BIGINT) AS n_common,
       ROUND(CAST(n_common AS DOUBLE) / CAST(n_lsh AS DOUBLE), 6)
         AS precision,
       ROUND(CAST(n_common AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
         AS recall
FROM c
"""


EXT3_QUERIES.update({"x117_lsh_eval": q_x117_lsh_eval})
EXT3_ORACLES.update({"x117_lsh_eval": _sql_x117()})


# ----------------------------------- x118: interval overlap join


def q_x118_interval_overlap(spark, sf_dir):
    """General interval × interval overlap join (operators/
    temporal.py:interval_overlap_join): per-user daily activity
    intervals of 'error' events joined to overlapping 'purchase'
    intervals of OTHER users — bucketed cells, responsibility-cell
    emission (no distinct pass), exact integer-µs overlap.  The
    oracle is the brute-force inequality join."""
    from .queries_ext import _read_events
    from .operators.temporal import interval_overlap_join

    ev = _read_events(spark, sf_dir)

    def spans(etype, ida, s, e):
        return (
            ev.where(F.col("event_type") == etype)
            .groupBy(F.col("user_id").alias(ida))
            .agg(
                F.min("ts_us").cast("long").alias(s),
                (F.max("ts_us") + 1).cast("long").alias(e),
            )
        )

    err = spans("error", "user_a", "s_a", "e_a")
    pur = spans("purchase", "user_b", "s_b", "e_b")
    out = interval_overlap_join(
        err, pur,
        left_start="s_a", left_end="e_a",
        right_start="s_b", right_end="e_b",
        bucket_width=7 * 86_400_000_000,
    ).where(F.col("user_a") != F.col("user_b"))
    return (
        out.groupBy("user_a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlaps"),
            F.sum("overlap").cast("long").alias("total_overlap_us"),
        )
        .orderBy("user_a")
    )


SQL_X118 = """
WITH err AS (
  SELECT user_id AS user_a,
         min(epoch_us(ts)) AS s_a, max(epoch_us(ts)) + 1 AS e_a
  FROM events WHERE event_type = 'error' GROUP BY user_id
), pur AS (
  SELECT user_id AS user_b,
         min(epoch_us(ts)) AS s_b, max(epoch_us(ts)) + 1 AS e_b
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), pairs AS (
  SELECT e.user_a,
         least(e.e_a, p.e_b) - greatest(e.s_a, p.s_b) AS ov
  FROM err e JOIN pur p
    ON e.s_a < p.e_b AND p.s_b < e.e_a AND e.user_a <> p.user_b
)
SELECT CAST(user_a AS BIGINT) AS user_a,
       CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(sum(ov) AS BIGINT) AS total_overlap_us
FROM pairs
GROUP BY user_a
ORDER BY user_a
"""


# ------------------------------------- x119: Spearman correlation


def q_x119_spearman(spark, sf_dir):
    """Per-type Spearman rank correlation (operators/sketch.py:
    spearman_corr) between event value and the JSON props field k
    (extracted via x94's typed path) — the monotonicity-sensitive
    robust complement to Pearson (x53), exact mid-rank ties and
    decimal-moment Pearson over ranks."""
    from .queries_ext import _read_events
    from .operators.sketch import spearman_corr
    from .sources.ingest import extract_json_props

    ev = _read_events(spark, sf_dir)
    ex = extract_json_props(ev, "props", {"k": "bigint"})
    return spearman_corr(
        ex, ["event_type"], "value", "k"
    ).orderBy("event_type")


SQL_X119 = """
WITH src AS (
  SELECT event_type, value AS x,
         CAST(json_extract(props, '$.k') AS BIGINT) AS y
  FROM events
  WHERE value IS NOT NULL AND json_extract(props, '$.k') IS NOT NULL
), ranked AS (
  SELECT event_type,
         CAST(rank() OVER (PARTITION BY event_type ORDER BY x)
              AS DOUBLE)
           + (CAST(count(*) OVER (PARTITION BY event_type, x)
                   AS DOUBLE) - 1.0) / 2.0 AS rx,
         CAST(rank() OVER (PARTITION BY event_type ORDER BY y)
              AS DOUBLE)
           + (CAST(count(*) OVER (PARTITION BY event_type, y)
                   AS DOUBLE) - 1.0) / 2.0 AS ry
  FROM src
), m AS (
  SELECT event_type,
         count(*) AS n,
         sum(CAST(rx AS DECIMAL(38,12))) AS sx,
         sum(CAST(ry AS DECIMAL(38,12))) AS sy,
         sum(CAST(rx * ry AS DECIMAL(38,12))) AS sxy,
         sum(CAST(rx * rx AS DECIMAL(38,12))) AS sxx,
         sum(CAST(ry * ry AS DECIMAL(38,12))) AS syy
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       ROUND(
         (CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt((CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                   / CAST(n AS DOUBLE))
                * (CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                     / CAST(n AS DOUBLE))),
         6) + 0.0 AS spearman
FROM m
ORDER BY event_type
"""


EXT3_QUERIES.update({
    "x118_interval_overlap": q_x118_interval_overlap,
    "x119_spearman": q_x119_spearman,
})
EXT3_ORACLES.update({
    "x118_interval_overlap": SQL_X118,
    "x119_spearman": SQL_X119,
})


# ------------------------------------- x120: funnel step latency


def q_x120_funnel_latency(spark, sf_dir):
    """Time-to-convert quantiles per funnel transition
    (operators/behavior.py:funnel_step_latency): signup → click →
    purchase under the x31 sequential-conditional-minimum semantics,
    with nearest-rank p50/p90 (exact BIGINT selection — the x38 ulp
    lesson applied up front)."""
    from .queries_ext import _read_events
    from .operators.behavior import funnel_step_latency

    ev = _read_events(spark, sf_dir)
    return funnel_step_latency(ev, ["signup", "click", "purchase"])


SQL_X120 = """
WITH s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT s1.user_id, s1.t1,
         min(CASE WHEN epoch_us(e.ts) > s1.t1
                  THEN epoch_us(e.ts) END) AS t2
  FROM s1 LEFT JOIN events e
    ON e.user_id = s1.user_id AND e.event_type = 'click'
  GROUP BY s1.user_id, s1.t1
), s3 AS (
  SELECT s2.user_id, s2.t1, s2.t2,
         min(CASE WHEN epoch_us(e.ts) > s2.t2
                  THEN epoch_us(e.ts) END) AS t3
  FROM s2 LEFT JOIN events e
    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
  GROUP BY s2.user_id, s2.t1, s2.t2
), gaps AS (
  SELECT CAST(2 AS BIGINT) AS step_idx, 'click' AS step,
         t2 - t1 AS gap_us FROM s3 WHERE t2 IS NOT NULL
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'purchase', t3 - t2
  FROM s3 WHERE t3 IS NOT NULL
), ranked AS (
  SELECT step_idx, step, gap_us,
         ROW_NUMBER() OVER (PARTITION BY step_idx ORDER BY gap_us)
           AS rn,
         COUNT(*) OVER (PARTITION BY step_idx) AS n
  FROM gaps
)
SELECT step_idx,
       MAX(step) AS step,
       CAST(MAX(n) AS BIGINT) AS n_users,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(CAST(0.5 AS DOUBLE)
                * CAST(n AS DOUBLE)) AS BIGINT)
                THEN gap_us END) AS BIGINT) AS p50_us,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(CAST(0.9 AS DOUBLE)
                * CAST(n AS DOUBLE)) AS BIGINT)
                THEN gap_us END) AS BIGINT) AS p90_us
FROM ranked
GROUP BY step_idx
ORDER BY step_idx
"""


# -------------------------------------------- x121: RFM segments


def q_x121_rfm(spark, sf_dir):
    """RFM lifecycle segmentation (operators/behavior.py:
    rfm_segments): recency/frequency/monetary tercile scores cut at
    exact corpus quantiles (one broadcast boundary aggregate),
    rolled up per R-F-M cell with decimal value sums."""
    from .queries_ext import _read_events
    from .operators.behavior import rfm_segments

    ev = _read_events(spark, sf_dir).where(F.col("value").isNotNull())
    return rfm_segments(ev)


SQL_X121 = """
WITH ref AS (
  SELECT max(epoch_us(ts)) AS r FROM events WHERE value IS NOT NULL
), pu AS (
  SELECT e.user_id,
         (ref.r - max(epoch_us(e.ts))) // 86400000000 AS r,
         count(*) AS f,
         CAST(sum(CAST(e.value AS DECIMAL(38,12))) AS DOUBLE) AS m
  FROM events e CROSS JOIN ref
  WHERE e.value IS NOT NULL
  GROUP BY e.user_id, ref.r
), cuts AS (
  SELECT [quantile_cont(r, 1.0/3), quantile_cont(r, 2.0/3)] AS br,
         [quantile_cont(f, 1.0/3), quantile_cont(f, 2.0/3)] AS bf,
         [quantile_cont(m, 1.0/3), quantile_cont(m, 2.0/3)] AS bm
  FROM pu
), scored AS (
  SELECT 4 - (1 + len(list_filter(c.br, b -> pu.r > b))) AS r_score,
         1 + len(list_filter(c.bf, b -> pu.f > b)) AS f_score,
         1 + len(list_filter(c.bm, b -> pu.m > b)) AS m_score,
         pu.m
  FROM pu CROSS JOIN cuts c
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       ROUND(CAST(sum(CAST(m AS DECIMAL(38,12))) AS DOUBLE), 6)
         AS total_value
FROM scored
GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
"""


EXT3_QUERIES.update({
    "x120_funnel_latency": q_x120_funnel_latency,
    "x121_rfm": q_x121_rfm,
})
EXT3_ORACLES.update({
    "x120_funnel_latency": SQL_X120,
    "x121_rfm": SQL_X121,
})


# ---------------------------------------- x122: snapshot diff


def q_x122_snapshot_diff(spark, sf_dir):
    """Keyed table reconciliation (operators/quality.py:
    snapshot_diff): the customer table diffed against a derived
    second snapshot (balances bumped for a deterministic subset, some
    keys dropped, some added) — change-type counts per type with
    null-safe column comparison.  The load-validation counterpart to
    CDC apply (x99)."""
    from .operators.quality import snapshot_diff

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    new = (
        cust.where(F.col("c_custkey") % 11 != 0)  # removals
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0
            ).otherwise(F.col("c_acctbal")),
        )
    )
    added = cust.select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        "c_acctbal",
        "c_mktsegment",
    ).where(F.col("c_custkey") % 97 == 0)
    new = new.unionByName(added)
    d = snapshot_diff(
        cust,
        new,
        key_cols=["c_custkey"],
        compare_cols=["c_acctbal", "c_mktsegment"],
    )
    return (
        d.groupBy("change_type", "changed_cols")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("change_type", "changed_cols")
    )


SQL_X122 = """
WITH old AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
), new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 11 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, c_acctbal, c_mktsegment
  FROM customer WHERE (c_custkey + 1000000) % 97 = 0
), j AS (
  SELECT coalesce(n.c_custkey, o.c_custkey) AS k,
         CASE WHEN o.c_custkey IS NULL THEN 'added'
              WHEN n.c_custkey IS NULL THEN 'removed'
              WHEN NOT (o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal)
                OR NOT (o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
              THEN 'changed' ELSE 'unchanged' END AS change_type,
         CASE WHEN o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
              THEN array_to_string(list_sort(list_filter([
                     CASE WHEN NOT (o.c_acctbal IS NOT DISTINCT FROM
                                    n.c_acctbal)
                          THEN 'c_acctbal' END,
                     CASE WHEN NOT (o.c_mktsegment IS NOT DISTINCT FROM
                                    n.c_mktsegment)
                          THEN 'c_mktsegment' END],
                     x -> x IS NOT NULL)), ',')
              ELSE '' END AS cc
  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
)
SELECT change_type,
       CASE WHEN change_type = 'changed' THEN cc ELSE '' END
         AS changed_cols,
       CAST(count(*) AS BIGINT) AS n
FROM j
GROUP BY 1, 2
ORDER BY change_type, changed_cols
"""


# --------------------------------------- x123: Pareto frontier


def q_x123_pareto(spark, sf_dir):
    """Per-brand 2-D skyline (operators/ranking.py:
    pareto_frontier_2d): parts not dominated on (size max, retail
    price min) — the distinct-value window formulation, never a
    pairwise dominance join.  Oracle: the NOT EXISTS dominance
    definition, feasible at oracle scale only."""
    from .operators.ranking import pareto_frontier_2d

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = pareto_frontier_2d(
        part.select("p_partkey", "p_brand", "p_size", "p_retailprice"),
        ["p_brand"],
        maximize_col="p_size",
        minimize_col="p_retailprice",
    )
    return out.select(
        "p_brand",
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.col("p_size").cast("long").alias("p_size"),
        "p_retailprice",
    ).orderBy("p_brand", "p_partkey")


SQL_X123 = """
SELECT p_brand,
       CAST(p_partkey AS BIGINT) AS p_partkey,
       CAST(p_size AS BIGINT) AS p_size,
       p_retailprice
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_brand = a.p_brand
    AND b.p_size >= a.p_size
    AND b.p_retailprice <= a.p_retailprice
    AND (b.p_size > a.p_size OR b.p_retailprice < a.p_retailprice)
)
ORDER BY p_brand, p_partkey
"""


EXT3_QUERIES.update({
    "x122_snapshot_diff": q_x122_snapshot_diff,
    "x123_pareto": q_x123_pareto,
})
EXT3_ORACLES.update({
    "x122_snapshot_diff": SQL_X122,
    "x123_pareto": SQL_X123,
})


# --------------------------------- x124: corpus health scorecard


def q_x124_source_scorecard(spark, sf_dir):
    """Per-source corpus health scorecard — the capstone composition a
    crawl-operations dashboard polls: document counts, mean quality
    (x06's profile), exact-duplicate rate (x01's fingerprints over the
    planted re-crawl corpus), English share (x06's lang-ID), and mean
    token length, in one result.  Every metric reuses the exact
    mechanism of its standalone operator, so the oracle is assembled
    from the same SQL building blocks (profile CTEs + recrawl union)."""
    from .operators.text import text_profile
    from .queries_ext import _docs_with_recrawls

    docs = _docs_with_recrawls(spark, sf_dir)
    prof = text_profile(docs, "text")
    dupc = prof.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("__g")
    )
    j = prof.join(dupc, on="fingerprint")
    dec = "decimal(38,12)"
    n = F.count(F.lit(1)).cast("double")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("quality").cast(dec)).cast("double") / n, 6
            ).alias("mean_quality"),
            F.round(
                F.count(F.when(F.col("__g") > 1, 1)).cast("double") / n,
                6,
            ).alias("dup_rate"),
            F.round(
                F.count(F.when(F.col("lang_pred") == "en", 1)).cast(
                    "double"
                )
                / n,
                6,
            ).alias("en_share"),
            F.round(
                F.sum(F.col("n_tokens").cast("long")).cast("double") / n,
                6,
            ).alias("mean_tokens"),
        )
        .orderBy("source")
    )


def _sql_x124() -> str:
    from .queries_ext import SQL_RECRAWL_DOCS, _sql_profile_ctes

    return f"""
WITH {_sql_profile_ctes(source=SQL_RECRAWL_DOCS + " rd")},
src AS (
  SELECT doc_id, source FROM {SQL_RECRAWL_DOCS} rd2
), dupc AS (
  SELECT fingerprint, count(*) AS g FROM prof GROUP BY fingerprint
), j AS (
  SELECT s.source, p.quality, p.lang_pred, p.n_tokens, d.g
  FROM prof p
  JOIN src s USING (doc_id)
  JOIN dupc d USING (fingerprint)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       ROUND(CAST(sum(CAST(quality AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mean_quality,
       ROUND(CAST(count(CASE WHEN g > 1 THEN 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS dup_rate,
       ROUND(CAST(count(CASE WHEN lang_pred = 'en' THEN 1 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS en_share,
       ROUND(CAST(sum(n_tokens) AS DOUBLE) / CAST(count(*) AS DOUBLE),
             6) AS mean_tokens
FROM j
GROUP BY source
ORDER BY source
"""


EXT3_QUERIES.update({"x124_source_scorecard": q_x124_source_scorecard})
EXT3_ORACLES.update({"x124_source_scorecard": _sql_x124()})


# ------------------------------- x125: train/val split-leakage audit


def q_x125_split_leakage(spark, sf_dir):
    """Train/val split-leakage audit: assign every document to a
    deterministic hash split (the ``split_corpus`` draw, salt
    ``split``), find near-duplicate pairs with the x03 MinHash-LSH
    mechanism over the planted re-crawl corpus, and report every val
    document that has a near-duplicate *in train* — the contamination
    that silently inflates eval scores when a re-crawl of a val page
    lands in the training set.

    Distinct from x19 (decontamination = exact-gram probe against a
    known benchmark) and x117 (LSH precision/recall eval): this audits
    the *split boundary* itself.  Scale shape: the split is a pure
    column expression of ``doc_id`` (no join against a membership
    table — zero extra shuffles on top of the pair generation), and
    the final per-val-doc rollup is one map-side-combinable groupBy.
    """
    from .operators import dedup as dd
    from .operators.mixing import uniform_hash01
    from .queries_ext import _docs_with_recrawls

    docs = _docs_with_recrawls(spark, sf_dir)
    pairs = dd.minhash_lsh_pairs(
        docs, "text", "doc_id", n=5, num_hashes=64, bands=16, threshold=0.6
    )

    def split_of(c):
        return F.when(
            uniform_hash01(c, "split") < 0.8, F.lit("train")
        ).otherwise(F.lit("val"))

    sa, sb = split_of(F.col("id_a")), split_of(F.col("id_b"))
    leaks = pairs.where(sa != sb).select(
        F.when(sa == "val", F.col("id_a")).otherwise(F.col("id_b")).alias("val_doc"),
        F.when(sa == "val", F.col("id_b")).otherwise(F.col("id_a")).alias("train_doc"),
        "jaccard",
    )
    return leaks.groupBy("val_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_train_matches"),
        F.min("train_doc").cast("long").alias("example_train_doc"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
    ).select(
        F.col("val_doc").cast("long").alias("val_doc"),
        "n_train_matches",
        "example_train_doc",
        "max_jaccard",
    )


def _sql_x125() -> str:
    from .queries_ext import SQL_RECRAWL_DOCS, _sql_x03_ctes

    split = (
        "CASE WHEN ('0x' || substr(md5('split:' || CAST({c} AS VARCHAR)), 1, 8))"
        "::BIGINT / 4294967296.0 < 0.8 THEN 'train' ELSE 'val' END"
    )
    sa, sb = split.format(c="id_a"), split.format(c="id_b")
    return f"""
WITH {_sql_x03_ctes(source=SQL_RECRAWL_DOCS + " rd")},
leaks AS (
  SELECT CASE WHEN {sa} = 'val' THEN id_a ELSE id_b END AS val_doc,
         CASE WHEN {sa} = 'val' THEN id_b ELSE id_a END AS train_doc,
         jaccard
  FROM lsh_pairs
  WHERE {sa} <> {sb}
)
SELECT CAST(val_doc AS BIGINT) AS val_doc,
       CAST(count(*) AS BIGINT) AS n_train_matches,
       CAST(min(train_doc) AS BIGINT) AS example_train_doc,
       ROUND(max(jaccard), 6) AS max_jaccard
FROM leaks
GROUP BY val_doc
"""


EXT3_QUERIES.update({"x125_split_leakage": q_x125_split_leakage})
EXT3_ORACLES.update({"x125_split_leakage": _sql_x125()})


# ------------------------------ x126: incremental ingest dedup probe


def q_x126_incremental_dedup(spark, sf_dir):
    """Daily-increment dedup probe (dedup.incremental_lsh_pairs): every
    verified near-dup pair the day's 'recrawl' batch introduces —
    new-vs-corpus and new-vs-new — WITHOUT re-pairing the existing
    corpus against itself.  The batch x03 answers "what duplicates
    exist"; this answers the operational question "what did today's
    ingest duplicate", with candidate work proportional to the probe
    side.  The oracle runs the full-batch pair chain and restricts to
    pairs touching the batch — the incremental path must reproduce it
    exactly."""
    from .operators import dedup as dd
    from .queries_ext import _docs_with_recrawls

    docs = _docs_with_recrawls(spark, sf_dir)
    pairs = dd.incremental_lsh_pairs(
        docs, "text", "doc_id", F.col("source") == "recrawl",
        n=5, num_hashes=64, bands=16, threshold=0.6,
    )
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


def _sql_x126() -> str:
    from .queries_ext import SQL_RECRAWL_DOCS, _sql_x03_ctes

    return f"""
WITH {_sql_x03_ctes(source=SQL_RECRAWL_DOCS + " rd")},
newdocs AS (
  SELECT doc_id FROM {SQL_RECRAWL_DOCS} rd2 WHERE source = 'recrawl'
)
SELECT id_a, id_b, jaccard
FROM lsh_pairs
WHERE id_a IN (SELECT doc_id FROM newdocs)
   OR id_b IN (SELECT doc_id FROM newdocs)
"""


EXT3_QUERIES.update({"x126_incremental_dedup": q_x126_incremental_dedup})
EXT3_ORACLES.update({"x126_incremental_dedup": _sql_x126()})


# -------------------------------- x127: M4 dashboard downsampling


def q_x127_m4_downsample(spark, sf_dir):
    """M4 visualization downsampling (temporal.m4_downsample, Jugel et
    al. VLDB 2014) of the events value series per event type: 24
    equal-width time buckets, min/max/first/last point of each — the
    error-free point set a dashboard renders instead of shipping the
    raw series.  One partitioned window for the extent + one
    map-side-combinable groupBy; no join-back, no per-bucket sort."""
    from .operators.temporal import m4_downsample
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir).where(F.col("value").isNotNull())
    out = m4_downsample(
        ev, "ts_us", "value", ["event_type"], n_buckets=24
    )
    return out.select(
        "event_type",
        "bucket",
        "role",
        F.col("ts_us").cast("long").alias("ts_us"),
        F.round("value", 6).alias("value"),
    )


def _sql_x127() -> str:
    return """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS ts_us, value
  FROM events WHERE value IS NOT NULL
), ext AS (
  SELECT *,
         min(ts_us) OVER (PARTITION BY event_type) AS tmin,
         max(ts_us) OVER (PARTITION BY event_type) AS tmax
  FROM e
), bkt AS (
  SELECT event_type, ts_us, value,
         ((ts_us - tmin) * 24) // (tmax - tmin + 1) AS bucket
  FROM ext
), agg AS (
  SELECT event_type, bucket,
         min(value) AS vmin, max(value) AS vmax,
         min(ts_us) AS tsf, max(ts_us) AS tsl
  FROM bkt GROUP BY 1, 2
), j AS (
  SELECT b.*, a.vmin, a.vmax, a.tsf, a.tsl
  FROM bkt b JOIN agg a USING (event_type, bucket)
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket, 'vmin' AS role,
       CAST(min(ts_us) AS BIGINT) AS ts_us, ROUND(min(value), 6) AS value
FROM j WHERE value = vmin GROUP BY 1, 2
UNION ALL
SELECT event_type, CAST(bucket AS BIGINT), 'vmax',
       CAST(max(ts_us) AS BIGINT), ROUND(max(value), 6)
FROM j WHERE value = vmax GROUP BY 1, 2
UNION ALL
SELECT event_type, CAST(bucket AS BIGINT), 'first',
       CAST(tsf AS BIGINT), ROUND(min(value), 6)
FROM j WHERE ts_us = tsf GROUP BY 1, 2, tsf
UNION ALL
SELECT event_type, CAST(bucket AS BIGINT), 'last',
       CAST(tsl AS BIGINT), ROUND(max(value), 6)
FROM j WHERE ts_us = tsl GROUP BY 1, 2, tsl
"""


EXT3_QUERIES.update({"x127_m4_downsample": q_x127_m4_downsample})
EXT3_ORACLES.update({"x127_m4_downsample": _sql_x127()})
