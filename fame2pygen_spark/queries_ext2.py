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
             / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
             6) AS jaccard
FROM gg a JOIN gg b ON a.doc_id < b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
            / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
            6) >= 0.35
"""


# ------------------------------------------------- x73: HyperLogLog


def q_x73_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct users per event type
    (operators/sketch.py:hll_distinct) — fixed-size mergeable
    registers; full-mechanism oracle rebuilds every register in SQL
    (md5-byte register index, leading-zero rank via base-2 strings,
    integer-shift harmonic sum — no libm anywhere)."""
    from .queries_ext import _read_events
    from .operators.sketch import hll_distinct

    ev = _read_events(spark, sf_dir)
    return hll_distinct(ev, ["event_type"], "user_id", b=6).orderBy(
        "event_type"
    )


_HLL_ALPHA_M2 = repr(0.7213 / (1.0 + 1.079 / 64) * 64 * 64)

SQL_X73 = f"""
WITH h AS (
  SELECT event_type,
         md5('hll:' || CAST(user_id AS VARCHAR)) AS hx
  FROM events
), r AS (
  SELECT event_type,
         ('0x' || substr(hx, 1, 2))::BIGINT % 64 AS idx,
         CASE WHEN ('0x' || substr(hx, 3, 8))::BIGINT = 0 THEN 33
              ELSE 33 - length(bin(('0x' || substr(hx, 3, 8))::BIGINT))
         END AS rank
  FROM h
), regs AS (
  SELECT event_type, idx, max(rank) AS reg
  FROM r GROUP BY event_type, idx
), agg AS (
  SELECT event_type,
         count(*) AS n_present,
         sum(1.0 / (1::BIGINT << reg)) AS s_present
  FROM regs GROUP BY event_type
), ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT a.event_type,
       CAST(64 AS BIGINT) AS m,
       CAST(64 - a.n_present AS BIGINT) AS n_zero_regs,
       ROUND({_HLL_ALPHA_M2} / (a.s_present + (64 - a.n_present)), 6)
         AS est_distinct,
       CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
       ROUND(abs(ROUND({_HLL_ALPHA_M2}
                       / (a.s_present + (64 - a.n_present)), 6)
                 - ex.exact_distinct) / ex.exact_distinct, 6) AS rel_err
FROM agg a JOIN ex USING (event_type)
ORDER BY event_type
"""


# --------------------------------------- x74: duplicated n-gram spans


def q_x74_dup_spans(spark, sf_dir):
    """Cross-document duplicated 13-gram span fraction per document
    (operators/text.py:dup_span_profile) — the ExactSubstr signal of
    Lee et al. 2022 at token granularity."""
    from .operators.text import dup_span_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dup_span_profile(docs, "text", "doc_id", n=13).select(
        F.col("doc").cast("long").alias("doc_id"),
        "n_positions",
        "n_dup_positions",
        "dup_frac",
    )


SQL_X74 = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents
), p AS (
  SELECT doc_id, array_to_string(toks[i : i + 12], ' ') AS g
  FROM t, unnest(range(1, len(toks) - 13 + 2)) AS u(i)
  WHERE len(toks) >= 13
), pg AS (
  SELECT doc_id, g, count(*) AS n_pos_g FROM p GROUP BY doc_id, g
), gd AS (
  SELECT g, count(*) AS n_docs FROM pg GROUP BY g
)
SELECT CAST(pg.doc_id AS BIGINT) AS doc_id,
       CAST(sum(pg.n_pos_g) AS BIGINT) AS n_positions,
       CAST(sum(CASE WHEN gd.n_docs >= 2 THEN pg.n_pos_g ELSE 0 END)
            AS BIGINT) AS n_dup_positions,
       ROUND(CAST(sum(CASE WHEN gd.n_docs >= 2 THEN pg.n_pos_g ELSE 0 END)
                  AS DOUBLE) / sum(pg.n_pos_g), 6) AS dup_frac
FROM pg JOIN gd USING (g)
GROUP BY pg.doc_id
"""


# ------------------------------------------------ x75: k-means step


def q_x75_kmeans_step(spark, sf_dir):
    """One Lloyd iteration (operators/similarity.py:kmeans_step)
    against centroids pinned to the embeddings of ``vec_id < 8`` — a
    rule the oracle reproduces from the same view (the x05c idiom), so
    assignment, counts, inertia, and centroid shift are deterministic
    at any SF.  Every float reduction is a sequential index-order fold
    or a floor-scaled integer sum, so the SQL engine matches bitwise."""
    from .operators.similarity import kmeans_step

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    return kmeans_step(emb, centroids=cents).orderBy("cluster")


SQL_X75 = """
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
dists AS (
  SELECT e.id, cent.cid,
         list_reduce(list_transform(range(1, 65),
           i -> (e.v[CAST(i AS INTEGER)] - cent.cv[CAST(i AS INTEGER)])
                * (e.v[CAST(i AS INTEGER)] - cent.cv[CAST(i AS INTEGER)])),
           (a, x) -> a + x) AS d2
  FROM e CROSS JOIN cent
),
asg AS (
  SELECT id, cid AS cluster, d2 FROM (
    SELECT id, cid, d2,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
    FROM dists
  ) WHERE rn = 1
),
percl AS (
  SELECT cluster, count(*) AS n,
         sum(CAST(floor(d2 * 1048576.0) AS DECIMAL(38,0))) AS inertia_s
  FROM asg GROUP BY cluster
),
dims AS (
  SELECT a.cluster, i AS dim, e.v[CAST(i AS INTEGER)] AS val
  FROM asg a JOIN e ON e.id = a.id, unnest(range(1, 65)) AS u(i)
),
ds AS (
  SELECT cluster, dim, count(*) AS n,
         sum(CAST(floor(val * 1073741824.0) AS DECIMAL(38,0))) AS s
  FROM dims GROUP BY cluster, dim
),
cd AS (
  SELECT cid AS cluster, i AS dim, cv[CAST(i AS INTEGER)] AS cval
  FROM cent, unnest(range(1, 65)) AS u(i)
),
sh AS (
  SELECT ds.cluster,
         sum(CAST(floor(
           ((CAST(ds.s AS DOUBLE) / 1073741824.0) / ds.n - cd.cval)
           * ((CAST(ds.s AS DOUBLE) / 1073741824.0) / ds.n - cd.cval)
           * 1099511627776.0) AS DECIMAL(38,0))) AS shift_s
  FROM ds JOIN cd ON cd.cluster = ds.cluster AND cd.dim = ds.dim
  GROUP BY ds.cluster
)
SELECT CAST(p.cluster AS BIGINT) AS cluster,
       CAST(p.n AS BIGINT) AS n,
       ROUND((CAST(p.inertia_s AS DOUBLE) / 1048576.0) / p.n, 6) AS msd,
       ROUND(sqrt(CAST(sh.shift_s AS DOUBLE) / 1099511627776.0), 6)
         AS shift
FROM percl p JOIN sh USING (cluster)
ORDER BY cluster
"""


# ------------------------------------------ x76: hybrid-retrieval RRF


def q_x76_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of lexical and dense retrieval
    (operators/similarity.py:rrf_fuse): BM25 top-20 for the x33 query
    terms fused with cosine top-20 around the ``vec_id = 0`` embedding
    (embeddings align 1:1 with documents).  Only ranks cross the
    fusion boundary, so the oracle needs rank parity (already pinned
    by x33/x05's 6-dp round + id tie-break), not score parity."""
    from pyspark.sql import Window

    from .operators.similarity import cosine_topk, rrf_fuse
    from .operators.text import bm25_rank
    from .queries_ext import _BM25_B, _BM25_K1, _BM25_TERMS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    bm = bm25_rank(
        docs, "text", "doc_id", _BM25_TERMS, k1=_BM25_K1, b=_BM25_B,
        top_n=20,
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ),
    )

    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    cos = cosine_topk(emb, q, k=20).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )

    fused = rrf_fuse([bm, cos], id_col="doc_id", k=60, top_n=20)
    return fused.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("rank_1").alias("bm25_rank"),
        F.col("rank_2").alias("cos_rank"),
        "rrf",
        "fused_rank",
    )


def _sql_x76() -> str:
    from .queries_ext import _BM25_B, _BM25_K1, _BM25_TERMS

    k1, b = _BM25_K1, _BM25_B
    tf_exprs = ",\n         ".join(
        f"len(list_filter(string_split(nt, ' '), x -> x = '{t}'))"
        f" AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_exprs = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    score_terms = " + ".join(
        f"ln(1 + (st.n - st.df_{i} + 0.5) / (st.df_{i} + 0.5))"
        f" * (d.tf_{i} * {k1 + 1.0})"
        f" / (d.tf_{i} + {k1} * ({1.0 - b} + {b} * d.dl / st.avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), d AS (
  SELECT doc_id,
         CASE WHEN nt = '' THEN 0
              ELSE len(string_split(nt, ' ')) END AS dl,
         {tf_exprs}
  FROM t
), st AS (
  SELECT COUNT(*) AS n, AVG(dl) AS avgdl, {df_exprs} FROM d
), bm AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank_1
  FROM (
    SELECT d.doc_id, ROUND({score_terms}, 6) AS score
    FROM d, st
  ) WHERE score > 0
  ORDER BY score DESC, doc_id ASC LIMIT 20
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), cos AS (
  SELECT neighbor_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, neighbor_id ASC)
           AS rank_2
  FROM (
    SELECT c.vec_id AS neighbor_id,
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
    FROM (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) c
    CROSS JOIN q
    WHERE c.vec_id <> 0
  ) ORDER BY score DESC, neighbor_id ASC LIMIT 20
), fused AS (
  SELECT COALESCE(bm.doc_id, cos.doc_id) AS doc_id,
         bm.rank_1, cos.rank_2,
         ROUND(COALESCE(1.0 / (60.0 + bm.rank_1), 0.0)
               + COALESCE(1.0 / (60.0 + cos.rank_2), 0.0), 6) AS rrf
  FROM bm FULL OUTER JOIN cos ON bm.doc_id = cos.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rank_1 AS BIGINT) AS bm25_rank,
       CAST(rank_2 AS BIGINT) AS cos_rank,
       rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT)
         AS fused_rank
FROM fused
QUALIFY fused_rank <= 20
"""


SQL_X76 = _sql_x76()


# ----------------------------------------------- x77: Z-order layout


def q_x77_zorder_layout(spark, sf_dir):
    """Z-order (Morton) clustering diagnostic
    (operators/layout.py:zorder_extent_profile): bucket lineitem by
    the interleaved (l_partkey, l_suppkey) bin key and report each
    bucket's min/max envelope + span fraction per dimension — the
    statistics a parquet reader consults for row-group pruning.  The
    write path is cluster_by_zorder (repartitionByRange + sort on the
    same key, pytest-verified); this query checks the curve math."""
    from .operators.layout import zorder_extent_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return zorder_extent_profile(
        li, ["l_partkey", "l_suppkey"], bits=4
    )


SQL_X77 = """
WITH st AS (
  SELECT CAST(min(l_partkey) AS BIGINT) AS minp,
         CAST(max(l_partkey) AS BIGINT) AS maxp,
         CAST(min(l_suppkey) AS BIGINT) AS mins,
         CAST(max(l_suppkey) AS BIGINT) AS maxs
  FROM lineitem
), b AS (
  SELECT l_partkey, l_suppkey, minp, maxp, mins, maxs,
         CAST(floor((l_partkey - minp) * 16 / (maxp - minp + 1))
              AS BIGINT) AS bp,
         CAST(floor((l_suppkey - mins) * 16 / (maxs - mins + 1))
              AS BIGINT) AS bs
  FROM lineitem, st
), z AS (
  SELECT *,
         (((bp >> 0) & 1) << 0) + (((bs >> 0) & 1) << 1)
       + (((bp >> 1) & 1) << 2) + (((bs >> 1) & 1) << 3)
       + (((bp >> 2) & 1) << 4) + (((bs >> 2) & 1) << 5)
       + (((bp >> 3) & 1) << 6) + (((bs >> 3) & 1) << 7) AS zbucket
  FROM b
)
SELECT CAST(zbucket AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(l_partkey) AS BIGINT) AS min_l_partkey,
       CAST(max(l_partkey) AS BIGINT) AS max_l_partkey,
       ROUND(CAST(max(l_partkey) - min(l_partkey) + 1 AS DOUBLE)
             / (max(maxp) - max(minp) + 1), 6) AS span_frac_l_partkey,
       CAST(min(l_suppkey) AS BIGINT) AS min_l_suppkey,
       CAST(max(l_suppkey) AS BIGINT) AS max_l_suppkey,
       ROUND(CAST(max(l_suppkey) - min(l_suppkey) + 1 AS DOUBLE)
             / (max(maxs) - max(mins) + 1), 6) AS span_frac_l_suppkey
FROM z
GROUP BY zbucket
"""


# ------------------------------------------- x78: Theil-Sen robust trend


def q_x78_theil_sen(spark, sf_dir):
    """Per-user Theil-Sen robust slope over daily mean values
    (operators/temporal.py:theil_sen_trend) — median-of-pairwise-
    slopes companion to x65's OLS fit; pair stage bounded at
    max_days^2/2 per entity regardless of event volume."""
    from .queries_ext import _read_events
    from .operators.temporal import theil_sen_trend

    ev = _read_events(spark, sf_dir)
    return theil_sen_trend(ev, max_days=40).withColumnRenamed(
        "entity", "user_id"
    )


SQL_X78 = """
WITH s AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS d, value AS y
  FROM events WHERE value IS NOT NULL
), daily AS (
  SELECT user_id, d,
         CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS ym
  FROM s GROUP BY user_id, d
), recent AS (
  SELECT user_id, d, ym FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d DESC)
      AS rn
    FROM daily
  ) WHERE rn <= 40
), pairs AS (
  SELECT a.user_id, (b.ym - a.ym) / CAST(b.d - a.d AS DOUBLE) AS slope
  FROM recent a JOIN recent b
    ON a.user_id = b.user_id AND a.d < b.d
), sl AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         -- explicit *1e6 round: identical rounding input double on
         -- both engines, tie-safe (see operators/temporal.py)
         ROUND(quantile_cont(slope, 0.5) * 1000000.0) / 1000000.0
           AS ts_slope
  FROM pairs GROUP BY user_id
), dc AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM recent GROUP BY user_id
)
SELECT sl.user_id, dc.n_days, sl.n_pairs, sl.ts_slope
FROM sl JOIN dc USING (user_id)
"""


# --------------------------------------- x79: BPE pre-tokenizer profile


def q_x79_bpe_pretokens(spark, sf_dir):
    """GPT-2-style BPE pre-tokenization profile per document
    (operators/text.py:bpe_pretoken_profile) — token-budget accounting
    with the exact Radford et al. pre-tokenizer regex; ordered
    alternation reproduces identically under Java regex and RE2."""
    from .operators.text import bpe_pretoken_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_pretoken_profile(docs, "text", "doc_id")


# the pre-tokenizer pattern as a DuckDB SQL string literal
# (apostrophes doubled)
_SQL_BPE_PAT = (
    "''s|''t|''re|''ve|''m|''ll|''d"
    "| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"
)

SQL_X79 = f"""
WITH p AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '')) AS n_ws_tokens,
         regexp_extract_all(text, '{_SQL_BPE_PAT}') AS pieces
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_ws_tokens AS BIGINT) AS n_ws_tokens,
       CAST(len(list_filter(pieces, x -> trim(x) <> '')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(len(list_filter(pieces, x -> x LIKE '''%')) AS BIGINT)
         AS n_contractions,
       ROUND(CAST(n_chars AS DOUBLE)
             / NULLIF(len(list_filter(pieces, x -> trim(x) <> '')), 0),
             6) AS chars_per_bpe_token
FROM p
"""


# --------------------------------------- x80: KMV sketch set algebra


def q_x80_kmv_set_ops(spark, sf_dir):
    """Pairwise source-overlap estimates from MERGED bottom-k sketches
    (operators/sketch.py:kmv_set_ops) — union size, Jaccard, and
    intersection size for every source pair computed from the k-length
    sketches alone (Beyer et al. SIGMOD'07), never joining raw data
    across sources.  Oracle rebuilds sketches, merge, and estimators."""
    from .operators.dedup import text_fingerprint
    from .operators.sketch import kmv_set_ops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = docs.select(
        "source", text_fingerprint(F.col("text")).alias("fp")
    )
    return kmv_set_ops(fps, "source", "fp", k=64).orderBy(
        "group_a", "group_b"
    )


SQL_X80 = """
WITH fp AS (
  SELECT source AS g,
         ('0x' || substr(md5('kmvset:' ||
            md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
            1, 8))::BIGINT AS h
  FROM documents
), d AS (
  SELECT DISTINCT g, h FROM fp
), sk AS (
  SELECT g, list_sort(list(h)) AS arr FROM (
    SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM d
  ) WHERE rn <= 64 GROUP BY g
), pairs AS (
  SELECT a.g AS group_a, b.g AS group_b, a.arr AS aa, b.arr AS bb,
         list_sort(list_distinct(list_concat(a.arr, b.arr)))[1:64] AS mm
  FROM sk a JOIN sk b ON a.g < b.g
), est AS (
  SELECT group_a, group_b,
         len(mm) AS n_merged,
         len(list_intersect(list_intersect(mm, aa), bb)) AS in_both,
         CASE WHEN len(mm) < 64 THEN CAST(len(mm) AS DOUBLE)
              ELSE ROUND(63 * 4294967296.0 / greatest(mm[64], 1), 6) END AS est_union,
         ROUND(CAST(len(list_intersect(list_intersect(mm, aa), bb))
                    AS DOUBLE)
               / (CASE WHEN len(mm) < 64 THEN len(mm) ELSE 64 END), 6)
           AS est_jaccard
  FROM pairs
), ex AS (
  SELECT a.g AS group_a, b.g AS group_b,
         count(*) AS exact_intersection
  FROM d a JOIN d b ON a.h = b.h AND a.g < b.g
  GROUP BY a.g, b.g
), sizes AS (
  SELECT g, count(*) AS n FROM d GROUP BY g
)
SELECT e.group_a, e.group_b,
       CAST(64 AS BIGINT) AS k,
       CAST(e.n_merged AS BIGINT) AS n_merged,
       e.est_union,
       e.est_jaccard,
       ROUND(e.est_jaccard * e.est_union, 6) AS est_intersection,
       CAST(sa.n + sb.n - COALESCE(ex.exact_intersection, 0) AS BIGINT)
         AS exact_union,
       CAST(COALESCE(ex.exact_intersection, 0) AS BIGINT)
         AS exact_intersection
FROM est e
LEFT JOIN ex ON ex.group_a = e.group_a AND ex.group_b = e.group_b
JOIN sizes sa ON sa.g = e.group_a
JOIN sizes sb ON sb.g = e.group_b
ORDER BY e.group_a, e.group_b
"""


# --------------------------------------- x81: ANALYZE-style table stats


def q_x81_table_stats(spark, sf_dir):
    """Per-column CBO statistics for lineitem
    (operators/sketch.py:table_stats): row/null counts and HLL NDV
    from one stacked scan.  Doubles canonicalize through
    decimal(28,6), the timestamp through its date — renderings both
    engines produce byte-identically."""
    from .operators.sketch import table_stats

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = "decimal(28,6)"
    canon = {
        "l_orderkey": F.col("l_orderkey"),
        "l_partkey": F.col("l_partkey"),
        "l_suppkey": F.col("l_suppkey"),
        "l_linenumber": F.col("l_linenumber"),
        "l_quantity": F.col("l_quantity").cast(dec),
        "l_extendedprice": F.col("l_extendedprice").cast(dec),
        "l_discount": F.col("l_discount").cast(dec),
        "l_tax": F.col("l_tax").cast(dec),
        "l_returnflag": F.col("l_returnflag"),
        "l_linestatus": F.col("l_linestatus"),
        "l_shipdate": F.col("l_shipdate").cast("date"),
    }
    return table_stats(li, canon).orderBy("column")


def _sql_x81() -> str:
    canon_sql = {
        "l_orderkey": "CAST(l_orderkey AS VARCHAR)",
        "l_partkey": "CAST(l_partkey AS VARCHAR)",
        "l_suppkey": "CAST(l_suppkey AS VARCHAR)",
        "l_linenumber": "CAST(l_linenumber AS VARCHAR)",
        "l_quantity": "CAST(CAST(l_quantity AS DECIMAL(28,6)) AS VARCHAR)",
        "l_extendedprice":
            "CAST(CAST(l_extendedprice AS DECIMAL(28,6)) AS VARCHAR)",
        "l_discount": "CAST(CAST(l_discount AS DECIMAL(28,6)) AS VARCHAR)",
        "l_tax": "CAST(CAST(l_tax AS DECIMAL(28,6)) AS VARCHAR)",
        "l_returnflag": "l_returnflag",
        "l_linestatus": "l_linestatus",
        "l_shipdate": "CAST(CAST(l_shipdate AS DATE) AS VARCHAR)",
    }
    stacked = "\n  UNION ALL\n  ".join(
        f"SELECT '{name}' AS \"column\", {expr} AS v FROM lineitem"
        for name, expr in canon_sql.items()
    )
    return f"""
WITH stacked AS (
  {stacked}
), counts AS (
  SELECT "column",
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls
  FROM stacked GROUP BY "column"
), h AS (
  SELECT "column", md5('hll:' || v) AS hx
  FROM stacked WHERE v IS NOT NULL
), r AS (
  SELECT "column",
         ('0x' || substr(hx, 1, 2))::BIGINT % 64 AS idx,
         CASE WHEN ('0x' || substr(hx, 3, 8))::BIGINT = 0 THEN 33
              ELSE 33 - length(bin(('0x' || substr(hx, 3, 8))::BIGINT))
         END AS rank
  FROM h
), regs AS (
  SELECT "column", idx, max(rank) AS reg
  FROM r GROUP BY "column", idx
), agg AS (
  SELECT "column",
         count(*) AS n_present,
         sum(1.0 / (1::BIGINT << reg)) AS s_present
  FROM regs GROUP BY "column"
), ex AS (
  SELECT "column", count(DISTINCT v) AS exact_distinct
  FROM stacked WHERE v IS NOT NULL GROUP BY "column"
)
SELECT c."column",
       c.n_rows,
       c.n_nulls,
       ROUND(CAST(c.n_nulls AS DOUBLE) / c.n_rows, 6) AS null_frac,
       CAST(64 AS BIGINT) AS m,
       CAST(64 - a.n_present AS BIGINT) AS n_zero_regs,
       ROUND({_HLL_ALPHA_M2} / (a.s_present + (64 - a.n_present)), 6)
         AS est_distinct,
       CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
       ROUND(abs(ROUND({_HLL_ALPHA_M2}
                       / (a.s_present + (64 - a.n_present)), 6)
                 - ex.exact_distinct) / ex.exact_distinct, 6) AS rel_err
FROM counts c
JOIN agg a USING ("column")
JOIN ex USING ("column")
ORDER BY c."column"
"""


SQL_X81 = _sql_x81()


# ------------------------------------------------ x82: EWMA smoothing


def q_x82_ewma(spark, sf_dir):
    """Per-user finite-horizon EWMA of event values
    (operators/temporal.py:ewma_smooth, pandas ewm-adjusted semantics
    truncated at 16 terms).  alpha = 0.5 makes every weight an exact
    power of two, so the fixed left-to-right weighted chain is
    engine-exact before rounding."""
    from .queries_ext import _read_events
    from .operators.temporal import ewma_smooth

    ev = _read_events(spark, sf_dir)
    return ewma_smooth(
        ev, alpha=0.5, horizon=16
    ).withColumnRenamed("entity", "user_id")


def _sql_x82(horizon: int = 16) -> str:
    over = "OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"
    num_terms, den_terms = [], []
    for j in range(horizon):
        wgt = repr(0.5 ** j)
        lag = "value" if j == 0 else f"lag(value, {j}) {over}"
        t = f"CASE WHEN {lag} IS NOT NULL THEN {lag} * {wgt} END"
        d = f"CASE WHEN {lag} IS NOT NULL THEN {wgt} END"
        if j == 0:
            num_terms.append(t)
            den_terms.append(d)
        else:
            num_terms.append(f"COALESCE({t}, 0.0)")
            den_terms.append(f"COALESCE({d}, 0.0)")
    num = "\n           + ".join(num_terms)
    den = "\n           + ".join(den_terms)
    return f"""
SELECT user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       event_id,
       value,
       ROUND(({num})
             / ({den}), 6) AS ewma
FROM events
"""


SQL_X82 = _sql_x82()


# ------------------------------- x83: incremental aggregate maintenance


def q_x83_incremental_agg(spark, sf_dir):
    """Incremental view maintenance (operators/sketch.py:
    partial_profile / merge_profiles / profile_estimates): the events
    table is split into a 'state' half and a 'delta' half (even/odd
    event_id), each reduced to mergeable per-key partial aggregates
    (count, decimal sum, min/max, HLL registers), then MERGED in
    O(|keys|).  The oracle aggregates the FULL table directly — the
    comparison is the IVM correctness proof: merge(partial(A),
    partial(B)) must equal aggregate(A ∪ B) exactly, because every
    component is a commutative monoid."""
    from .queries_ext import _read_events
    from .operators.sketch import (
        merge_profiles, partial_profile, profile_estimates,
    )

    ev = _read_events(spark, sf_dir)
    state = ev.where(F.col("event_id") % 2 == 0)
    delta = ev.where(F.col("event_id") % 2 == 1)
    keys = ["event_type"]
    merged = merge_profiles(
        partial_profile(state, keys, "value", "user_id"),
        partial_profile(delta, keys, "value", "user_id"),
        keys,
    )
    return profile_estimates(merged, keys).orderBy("event_type")


SQL_X83 = f"""
WITH h AS (
  SELECT event_type,
         md5('hll:' || CAST(user_id AS VARCHAR)) AS hx
  FROM events
), r AS (
  SELECT event_type,
         ('0x' || substr(hx, 1, 2))::BIGINT % 64 AS idx,
         CASE WHEN ('0x' || substr(hx, 3, 8))::BIGINT = 0 THEN 33
              ELSE 33 - length(bin(('0x' || substr(hx, 3, 8))::BIGINT))
         END AS rank
  FROM h
), regs AS (
  SELECT event_type, idx, max(rank) AS reg
  FROM r GROUP BY event_type, idx
), agg AS (
  SELECT event_type,
         count(*) AS n_present,
         sum(1.0 / (1::BIGINT << reg)) AS s_present
  FROM regs GROUP BY event_type
), base AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         ROUND(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
           AS total,
         ROUND(min(value), 6) AS vmin,
         ROUND(max(value), 6) AS vmax
  FROM events GROUP BY event_type
)
SELECT b.event_type, b.n, b.total, b.vmin, b.vmax,
       CAST(64 - a.n_present AS BIGINT) AS n_zero_regs,
       ROUND({_HLL_ALPHA_M2} / (a.s_present + (64 - a.n_present)), 6)
         AS est_distinct
FROM base b JOIN agg a USING (event_type)
ORDER BY b.event_type
"""


# --------------------------------- x84: real-decode perceptual hashing

#: fixed 54-byte header of an 8x8 24bpp top-down BMP (height = -8)
_BMP88_HEADER_HEX = (
    "424d" "f6000000" "00000000" "36000000"          # BITMAPFILEHEADER
    "28000000" "08000000" "f8ffffff" "0100" "1800"   # BITMAPINFOHEADER
    "00000000" "c0000000" + "00000000" * 4
)

_AHASH_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _ahash_pixel_counts_spark(nt):
    """The 64 deterministic grayscale bytes both engines derive from a
    document: letter-occurrence counts (mod 256) for bytes 0..25, a
    length-seeded filler for 26..63."""
    counts = []
    for j in range(64):
        if j < 26:
            ch = _AHASH_LETTERS[j]
            c = (
                F.length(nt) - F.length(F.replace(nt, F.lit(ch), F.lit("")))
            ) % 256
        else:
            c = (F.length(nt) * (j + 1)) % 256
        counts.append(c.cast("int"))
    return counts


def q_x84_image_ahash(spark, sf_dir):
    """REAL-decode perceptual hashing end to end
    (operators/multimodal.py:image_ahash): each document renders a
    deterministic 8x8 grayscale fingerprint image as a genuine BMP
    byte payload (pure column algebra — header literal + hex-encoded
    pixel rows), the operator DECODES those bytes with the real BMP
    parser inside mapInPandas and computes the integer-threshold
    average-hash.  The oracle never sees the bytes: it derives the
    same hash arithmetically from the pixel definition — so an exact
    match proves the encode → decode → thumbnail → hash pipeline is
    lossless and bit-correct."""
    from .operators.multimodal import image_ahash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nt = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), nt.alias("__nt")
    )
    counts = _ahash_pixel_counts_spark(F.col("__nt"))
    pixel_hex = F.concat_ws(
        "",
        *[
            F.repeat(F.lpad(F.hex(c), 2, "0"), 3)  # gray -> BGR triplet
            for c in counts
        ],
    )
    payload = F.concat(
        F.unhex(F.lit(_BMP88_HEADER_HEX)), F.unhex(pixel_hex)
    )
    with_img = staged.select("doc_id", payload.alias("payload"))
    return image_ahash(with_img, "doc_id", "payload")


def _sql_x84() -> str:
    cols = []
    for j in range(64):
        if j < 26:
            ch = _AHASH_LETTERS[j]
            cols.append(
                f"(length(nt) - length(replace(nt, '{ch}', ''))) % 256"
            )
        else:
            cols.append(f"(length(nt) * {j + 1}) % 256")
    px = ",\n           ".join(cols)
    hi = " + ".join(
        f"CASE WHEN px[{j + 1}] * 64 >= s THEN {1 << (31 - j)} ELSE 0 END"
        for j in range(32)
    )
    lo = " + ".join(
        f"CASE WHEN px[{j + 1}] * 64 >= s THEN {1 << (63 - j)} ELSE 0 END"
        for j in range(32, 64)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), c AS (
  SELECT doc_id,
         list_value(
           {px}) AS px
  FROM t
), s AS (
  SELECT doc_id, px,
         list_reduce(px, (a, x) -> a + x) AS s
  FROM c
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(8 AS INTEGER) AS h,
       CAST(8 AS INTEGER) AS w,
       lpad(lower(hex({hi})), 8, '0') ||
       lpad(lower(hex({lo})), 8, '0') AS ahash
FROM s
"""


SQL_X84 = _sql_x84()


# --------------------------------------- x85: sliding-window rates


def q_x85_sliding_windows(spark, sf_dir):
    """Sliding 1-hour windows every 15 minutes
    (streaming/core.py:sliding_event_counts_batch — the batch twin of
    windowed_event_counts(window, slide)): every event lands in
    exactly 4 overlapping windows via integer-µs math, then one
    (window, type) aggregation."""
    from .queries_ext import _read_events
    from .streaming.core import sliding_event_counts_batch

    ev = _read_events(spark, sf_dir)
    return sliding_event_counts_batch(
        ev, window_us=3_600_000_000, slide_us=900_000_000
    )


SQL_X85 = """
WITH e AS (
  SELECT event_type, value, epoch_us(ts) AS ts_us FROM events
), x AS (
  SELECT event_type, value, ts_us,
         (ts_us // 900000000) * 900000000 - j * 900000000
           AS window_start_us
  FROM e, unnest(range(0, 4)) AS u(j)
)
SELECT CAST(window_start_us AS BIGINT) AS window_start_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS sum_value
FROM x
WHERE ts_us >= window_start_us
  AND ts_us < window_start_us + 3600000000
GROUP BY window_start_us, event_type
"""


# --------------------------------------- x86: salted skew aggregation


def q_x86_salted_agg(spark, sf_dir):
    """Two-stage salted aggregation (functions/core.py:salted_agg):
    partials on (key, salt) spread a hot key over 16 reducers, then
    combine on the key alone.  The oracle is the DIRECT aggregation —
    equality holds for ANY salt assignment because every aggregate is
    decomposable and the value sum runs in decimal (order-insensitive),
    which is exactly the property that makes salting safe at 100 TB."""
    from .functions.core import salted_agg
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": F.count("*").cast("long"),
            "sum_value": F.sum(F.col("value").cast("decimal(18,6)")),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    ).orderBy("event_type")


SQL_X86 = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS sum_value,
       ROUND(min(value), 6) AS min_value,
       ROUND(max(value), 6) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------- x87: Bloom semi-join prefilter


def q_x87_bloom_semijoin(spark, sf_dir):
    """Bloom-prefiltered exact semi-join (operators/bloom.py):
    lineitem against the p_size=1 part subset.  The filter (k=3
    md5-derived positions in m=1024) is broadcast and eliminates the
    non-matching bulk map-side; the exact join removes the bounded,
    fully deterministic false-positive set.  Single-row stats prove
    zero false negatives (n_matches equals the plain semi-join count
    in the oracle) and quantify the candidate reduction."""
    from .operators.bloom import bloom_positions, bloom_semi_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").where(
        F.col("p_size") == 1
    )
    candidates, matches = bloom_semi_join(
        li, part, big_key="l_partkey", small_key="p_partkey",
        id_cols=["l_orderkey", "l_linenumber"],
    )
    stats = (
        part.agg(
            F.countDistinct("p_partkey").cast("long").alias("n_small_keys")
        )
        .crossJoin(
            bloom_positions(part, "p_partkey").agg(
                F.count("*").cast("long").alias("n_bits_set")
            )
        )
        .crossJoin(
            li.agg(F.count("*").cast("long").alias("n_big_rows"))
        )
        .crossJoin(
            candidates.agg(
                F.count("*").cast("long").alias("n_candidates")
            )
        )
        .crossJoin(
            matches.agg(F.count("*").cast("long").alias("n_matches"))
        )
    )
    return stats.select(
        "n_small_keys",
        "n_bits_set",
        "n_big_rows",
        "n_candidates",
        "n_matches",
        (F.col("n_candidates") - F.col("n_matches")).alias(
            "n_false_positives"
        ),
    )


SQL_X87 = """
WITH sk AS (
  SELECT DISTINCT p_partkey FROM part WHERE p_size = 1
), pos AS (
  SELECT DISTINCT
         ('0x' || substr(md5('bloom:' || i || ':' ||
            CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT % 1024 AS pos
  FROM sk, unnest(range(0, 3)) AS u(i)
), probes AS (
  SELECT l_orderkey, l_linenumber, l_partkey,
         list_distinct(list_transform(range(0, 3),
           i -> ('0x' || substr(md5('bloom:' || i || ':' ||
                  CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT % 1024))
           AS pp
  FROM lineitem
), pr AS (
  SELECT l_orderkey, l_linenumber, l_partkey, len(pp) AS np,
         unnest(pp) AS pos
  FROM probes
), hits AS (
  SELECT pr.l_orderkey, pr.l_linenumber, pr.l_partkey,
         max(pr.np) AS np, count(*) AS nhit
  FROM pr JOIN pos USING (pos)
  GROUP BY pr.l_orderkey, pr.l_linenumber, pr.l_partkey
), cand AS (
  SELECT * FROM hits WHERE nhit = np
), stats AS (
  SELECT
    (SELECT count(*) FROM sk) AS n_small_keys,
    (SELECT count(*) FROM pos) AS n_bits_set,
    (SELECT count(*) FROM lineitem) AS n_big_rows,
    (SELECT count(*) FROM cand) AS n_candidates,
    (SELECT count(*) FROM cand JOIN sk ON cand.l_partkey = sk.p_partkey)
      AS n_matches
)
SELECT CAST(n_small_keys AS BIGINT) AS n_small_keys,
       CAST(n_bits_set AS BIGINT) AS n_bits_set,
       CAST(n_big_rows AS BIGINT) AS n_big_rows,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_matches AS BIGINT) AS n_matches,
       CAST(n_candidates - n_matches AS BIGINT) AS n_false_positives
FROM stats
"""


# --------------------------------------- x88: equi-depth histogram


def q_x88_equidepth_hist(spark, sf_dir):
    """Equi-depth histogram of l_extendedprice
    (operators/sketch.py:equidepth_histogram): boundaries at exact
    octile quantiles (percentile <-> quantile_cont pairing), bucket
    assignment by fold over the broadcast boundary array — the ANALYZE
    histogram a CBO consults for selectivity on skewed columns."""
    from .operators.sketch import equidepth_histogram

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return equidepth_histogram(li, "l_extendedprice", n_buckets=8)


_X88_PROBS = [i / 8 for i in range(1, 8)]

SQL_X88 = f"""
WITH b AS (
  SELECT [{", ".join(f"quantile_cont(l_extendedprice, {p!r})" for p in _X88_PROBS)}]
    AS bounds
  FROM lineitem
), v AS (
  SELECT l_extendedprice AS v, bounds
  FROM lineitem, b
  WHERE l_extendedprice IS NOT NULL
)
SELECT CAST(len(list_filter(bounds, x -> v > x)) AS BIGINT) AS bucket,
       ROUND(min(v), 6) AS lo,
       ROUND(max(v), 6) AS hi,
       CAST(count(*) AS BIGINT) AS n_rows
FROM v
GROUP BY 1
"""


# ------------------------------------------------ x89: SCD2 dimension merge


def q_x89_scd2_merge(spark, sf_dir):
    """Type-2 slowly-changing-dimension merge
    (operators/temporal.py:scd2_merge): the customer dimension as
    version-1 history, a deterministic update snapshot (every 7th key
    changes balance, every 13th sends a no-op, every 97th inserts an
    unknown key), applied effective 1996-01-01.  The oracle implements
    the same full-outer-join merge in SQL — no-op suppression, closing
    rows, and first-version inserts all checked exactly."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    history = cust.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal"), 6).alias("acctbal"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    changed = cust.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", "c_nationkey",
        F.round(F.col("c_acctbal") * 1.1, 6).alias("acctbal"),
    )
    noop = cust.where(
        (F.col("c_custkey") % 13 == 0) & (F.col("c_custkey") % 7 != 0)
    ).select(
        "c_custkey", "c_nationkey",
        F.round(F.col("c_acctbal"), 6).alias("acctbal"),
    )
    inserted = cust.where(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.lit(0).cast("long").alias("c_nationkey"),
        F.lit(0.0).alias("acctbal"),
    )
    updates = (
        changed.unionByName(noop)
        .unionByName(inserted)
        .withColumn("eff", F.lit("1996-01-01").cast("date"))
    )

    from .operators.temporal import scd2_merge

    out = scd2_merge(
        history, updates,
        key_cols=["c_custkey"],
        attr_cols=["c_nationkey", "acctbal"],
        effective="eff",
    )
    return out.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "acctbal",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
    )


SQL_X89 = """
WITH hist AS (
  SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 6) AS acctbal,
         DATE '1990-01-01' AS valid_from,
         CAST(NULL AS DATE) AS valid_to
  FROM customer
), upd AS (
  SELECT c_custkey, c_nationkey, ROUND(c_acctbal * 1.1, 6) AS acctbal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 6)
  FROM customer WHERE c_custkey % 13 = 0 AND c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, 0, 0.0
  FROM customer WHERE c_custkey % 97 = 0
), j AS (
  SELECT COALESCE(h.c_custkey, u.c_custkey) AS c_custkey,
         h.c_nationkey AS h_nat, h.acctbal AS h_bal,
         h.valid_from, h.valid_to,
         u.c_nationkey AS u_nat, u.acctbal AS u_bal,
         CASE WHEN u.c_custkey IS NOT NULL
              THEN DATE '1996-01-01' END AS eff,
         h.c_custkey IS NOT NULL AS has_cur,
         u.c_custkey IS NOT NULL AS has_upd,
         NOT (h.c_nationkey IS NOT DISTINCT FROM u.c_nationkey
              AND h.acctbal IS NOT DISTINCT FROM u.acctbal) AS differs
  FROM hist h FULL OUTER JOIN upd u ON h.c_custkey = u.c_custkey
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(h_nat AS BIGINT) AS c_nationkey, h_bal AS acctbal,
       CAST(valid_from AS VARCHAR) AS valid_from,
       CAST(valid_to AS VARCHAR) AS valid_to
FROM j WHERE has_cur AND (NOT has_upd OR NOT differs)
UNION ALL
SELECT CAST(c_custkey AS BIGINT), CAST(h_nat AS BIGINT), h_bal,
       CAST(valid_from AS VARCHAR), CAST(eff AS VARCHAR)
FROM j WHERE has_cur AND has_upd AND differs
UNION ALL
SELECT CAST(c_custkey AS BIGINT), CAST(u_nat AS BIGINT), u_bal,
       CAST(eff AS VARCHAR), CAST(NULL AS VARCHAR)
FROM j WHERE has_upd AND (NOT has_cur OR differs)
"""


# --------------------------------------- x90: most-common-value stats


def q_x90_mcv_stats(spark, sf_dir):
    """Most-common-value statistics (the third classic ANALYZE output
    beside x81's NDV/nulls and x88's equi-depth histogram): top-5
    values per profiled column with frequency fractions, from one
    stacked scan — (column, value) counts with map-side combine, then
    a two-phase salted top-k (phase 1 per (column, salt-of-value),
    phase 2 over the pruned remainder) so no single task ever sorts a
    whole column's distinct values."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    stacked = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in (
                        "l_returnflag", "l_linestatus", "l_suppkey",
                    )
                ]
            )
        ).alias("s")
    ).select("s.*")
    total = li.count()
    counts = stacked.groupBy("column", "value").agg(
        F.count("*").cast("long").alias("n_rows")
    )
    # two-phase top-k: partitionBy(column) alone has only 3 partition
    # keys, so at scale every distinct value of a column funnels into
    # ONE task's sort (the x55 skew rule).  Phase 1 prunes to the
    # top-5 per (column, salt-of-value) — each value lives in exactly
    # one salt group, so the global top-5 always survive and the salt
    # function never affects the result; phase 2 ranks the ≤
    # 3·32·5-row remainder with the original window.
    w1 = Window.partitionBy("column", "__salt").orderBy(
        F.desc("n_rows"), F.asc("value")
    )
    pruned = (
        counts.withColumn("__salt", F.pmod(F.xxhash64("value"), F.lit(32)))
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= 5)
        .drop("__salt", "__r1")
    )
    w = Window.partitionBy("column").orderBy(
        F.desc("n_rows"), F.asc("value")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "column",
            "value",
            "n_rows",
            F.round(F.col("n_rows") / F.lit(float(total)), 6).alias(
                "freq"
            ),
            F.col("rank").cast("long").alias("rank"),
        )
    )


SQL_X90 = """
WITH stacked AS (
  SELECT 'l_returnflag' AS "column", CAST(l_returnflag AS VARCHAR) AS value
  FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
), counts AS (
  SELECT "column", value, CAST(count(*) AS BIGINT) AS n_rows
  FROM stacked GROUP BY "column", value
), total AS (
  SELECT CAST(count(*) AS DOUBLE) AS t FROM lineitem
)
SELECT "column", value, n_rows,
       ROUND(n_rows / t, 6) AS freq,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY "column"
                               ORDER BY n_rows DESC, value ASC) AS rank
  FROM counts
), total
WHERE rank <= 5
"""


# ------------------------------------------- x91: PageRank iteration


def q_x91_pagerank_step(spark, sf_dir):
    """One weighted PageRank power-iteration step on the bipartite
    customer→supplier trade graph (edges = order lineitems joining
    the two, weight = lineitem count).  Iterative graph algorithms
    beyond connected components (x09): rank mass flows along
    out-degree-normalized edges with damping 0.85 — one edge-keyed
    join + one destination-keyed aggregation per iteration, the plan
    GraphX/Pregel would run, expressed as DataFrames.  Contributions
    sum in decimal (order-insensitive), so the oracle matches the
    iteration bitwise.  Returns the top-20 suppliers by rank after
    the step."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            F.col("l_suppkey").alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("w"))
    )
    from .operators.graph import pagerank_step

    n_cust = edges.select("src").distinct().count()
    n_supp = edges.select("dst").distinct().count()
    n_nodes = float(n_cust + n_supp)
    uniform = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "rank", F.lit(1.0 / n_nodes)
    )
    stepped = pagerank_step(edges, uniform, n_nodes=n_nodes)
    # top-20 via orderBy().limit() (TakeOrderedAndProject) FIRST, so
    # the global row_number window only ever sees 20 rows — never a
    # single-partition sort over all nodes (the x55 skew_profile rule)
    top = stepped.orderBy(F.desc("rank"), F.asc("node")).limit(20)
    w = Window.orderBy(F.desc("rank"), F.asc("node"))
    return (
        top.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= 20)
        .select(
            F.col("node").cast("long").alias("supplier"),
            F.round("rank", 6).alias("pagerank"),
            F.col("pos").cast("long").alias("pos"),
        )
    )


SQL_X91 = """
WITH edges AS (
  SELECT o_custkey AS src, l_suppkey AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_suppkey
), n AS (
  SELECT (SELECT count(DISTINCT src) FROM edges)
         + (SELECT count(DISTINCT dst) FROM edges) AS n_nodes
), outw AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src
), contribs AS (
  SELECT e.dst,
         CAST((1.0 / n.n_nodes)
              * (CAST(e.w AS DOUBLE) / o.wout)
              AS DECIMAL(28,18)) AS c
  FROM edges e JOIN outw o ON e.src = o.src, n
), ranks AS (
  SELECT dst,
         0.15 / (SELECT n_nodes FROM n)
           + 0.85 * CAST(sum(c) AS DOUBLE) AS r
  FROM contribs GROUP BY dst
)
SELECT CAST(dst AS BIGINT) AS supplier,
       ROUND(r, 6) AS pagerank,
       CAST(ROW_NUMBER() OVER (ORDER BY r DESC, dst ASC) AS BIGINT)
         AS pos
FROM ranks
QUALIFY pos <= 20
"""


# ------------------------------------- x92: multi-touch attribution


def q_x92_multi_touch(spark, sf_dir):
    """Position-based (U-shaped) multi-touch attribution
    (operators/behavior.py:multi_touch_attribution): clicks within a
    7-day lookback before each purchase share credit 40/20/40 —
    the generalization of x47's last-touch rule, with the same
    user-keyed plan shape."""
    from .queries_ext import _read_events
    from .operators.behavior import multi_touch_attribution

    ev = _read_events(spark, sf_dir)
    return multi_touch_attribution(
        ev, lookback_us=7 * 86_400_000_000
    ).withColumnRenamed("user", "user_id")


SQL_X92 = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), conv AS (
  SELECT user_id, event_id AS conversion_id, ts_us AS cts
  FROM e WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, event_id AS touch_id, ts_us AS tts
  FROM e WHERE event_type = 'click'
), pairs AS (
  SELECT c.user_id, c.conversion_id, t.touch_id, t.tts,
         ROW_NUMBER() OVER (PARTITION BY c.user_id, c.conversion_id
                            ORDER BY t.tts, t.touch_id) AS position,
         COUNT(*) OVER (PARTITION BY c.user_id, c.conversion_id)
           AS n_touches
  FROM conv c JOIN touch t ON c.user_id = t.user_id
  WHERE t.tts <= c.cts AND t.tts >= c.cts - 604800000000
)
SELECT user_id, conversion_id, touch_id,
       CAST(position AS BIGINT) AS position,
       CAST(n_touches AS BIGINT) AS n_touches,
       ROUND(CASE WHEN n_touches = 1 THEN 1.0
                  WHEN n_touches = 2 THEN 0.5
                  WHEN position = 1 OR position = n_touches THEN 0.4
                  ELSE 0.2 / CAST(n_touches - 2 AS DOUBLE) END, 6)
         AS credit
FROM pairs
"""


# ------------------------------------- x93: real video frame sampling

_Y4M_HEADER_HEX = (
    "YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420jpeg\n".encode().hex()
)
_Y4M_FRAME_MARK_HEX = "FRAME\n".encode().hex()
_Y4M_N_FRAMES = 4


def q_x93_frame_sample(spark, sf_dir):
    """REAL video frame sampling end to end
    (operators/multimodal.py:frame_sample_y4m): each document renders
    a deterministic 4-frame 8x8 YUV4MPEG2 clip as genuine container
    bytes (header + FRAME markers + raw 4:2:0 planes, pure column
    algebra), the operator parses the container inside mapInPandas and
    samples every 2nd frame's luma mean.  The oracle derives the same
    statistics arithmetically from the frame-generation formula — an
    exact match proves the video container round trip, like x84 does
    for images."""
    from .operators.multimodal import frame_sample_y4m

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nt = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), nt.alias("__nt")
    )
    counts = _ahash_pixel_counts_spark(F.col("__nt"))
    frame_hexes = []
    for f in range(_Y4M_N_FRAMES):
        y_hex = F.concat_ws(
            "",
            *[
                F.lpad(F.hex((c + f * 17) % 256), 2, "0")
                for c in counts
            ],
        )
        frame_hexes.append(
            F.concat(F.lit(_Y4M_FRAME_MARK_HEX), y_hex, F.lit("80" * 32))
        )
    payload = F.unhex(
        F.concat(F.lit(_Y4M_HEADER_HEX), *frame_hexes)
    )
    with_vid = staged.select("doc_id", payload.alias("payload"))
    return frame_sample_y4m(with_vid, "doc_id", "payload", every=2)


def _sql_x93() -> str:
    cols = []
    for j in range(64):
        if j < 26:
            ch = _AHASH_LETTERS[j]
            cols.append(
                f"(length(nt) - length(replace(nt, '{ch}', ''))) % 256"
            )
        else:
            cols.append(f"(length(nt) * {j + 1}) % 256")
    px = ",\n           ".join(cols)
    frames = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {f} AS frame_idx, px FROM c"
        for f in range(0, _Y4M_N_FRAMES, 2)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), c AS (
  SELECT doc_id,
         list_value(
           {px}) AS px
  FROM t
), f AS (
  {frames}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST({_Y4M_N_FRAMES} AS BIGINT) AS n_frames,
       ROUND(CAST(list_reduce(list_transform(px,
               x -> (x + frame_idx * 17) % 256),
               (a, x) -> a + x) AS DOUBLE) / 64, 6) AS luma_mean
FROM f
"""


SQL_X93 = _sql_x93()


EXT2_QUERIES = {
    "x72_prefix_jaccard": q_x72_prefix_jaccard,
    "x73_hll_distinct": q_x73_hll_distinct,
    "x74_dup_spans": q_x74_dup_spans,
    "x75_kmeans_step": q_x75_kmeans_step,
    "x76_rrf_fusion": q_x76_rrf_fusion,
    "x77_zorder_layout": q_x77_zorder_layout,
    "x78_theil_sen": q_x78_theil_sen,
    "x79_bpe_pretokens": q_x79_bpe_pretokens,
    "x80_kmv_set_ops": q_x80_kmv_set_ops,
    "x81_table_stats": q_x81_table_stats,
    "x82_ewma": q_x82_ewma,
    "x83_incremental_agg": q_x83_incremental_agg,
    "x84_image_ahash": q_x84_image_ahash,
    "x85_sliding_windows": q_x85_sliding_windows,
    "x86_salted_agg": q_x86_salted_agg,
    "x87_bloom_semijoin": q_x87_bloom_semijoin,
    "x88_equidepth_hist": q_x88_equidepth_hist,
    "x89_scd2_merge": q_x89_scd2_merge,
    "x90_mcv_stats": q_x90_mcv_stats,
    "x91_pagerank_step": q_x91_pagerank_step,
    "x92_multi_touch": q_x92_multi_touch,
    "x93_frame_sample": q_x93_frame_sample,
}

EXT2_ORACLES = {
    "x72_prefix_jaccard": SQL_X72,
    "x73_hll_distinct": SQL_X73,
    "x74_dup_spans": SQL_X74,
    "x75_kmeans_step": SQL_X75,
    "x76_rrf_fusion": SQL_X76,
    "x77_zorder_layout": SQL_X77,
    "x78_theil_sen": SQL_X78,
    "x79_bpe_pretokens": SQL_X79,
    "x80_kmv_set_ops": SQL_X80,
    "x81_table_stats": SQL_X81,
    "x82_ewma": SQL_X82,
    "x83_incremental_agg": SQL_X83,
    "x84_image_ahash": SQL_X84,
    "x85_sliding_windows": SQL_X85,
    "x86_salted_agg": SQL_X86,
    "x87_bloom_semijoin": SQL_X87,
    "x88_equidepth_hist": SQL_X88,
    "x89_scd2_merge": SQL_X89,
    "x90_mcv_stats": SQL_X90,
    "x91_pagerank_step": SQL_X91,
    "x92_multi_touch": SQL_X92,
    "x93_frame_sample": SQL_X93,
}
