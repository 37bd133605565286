"""Round-4 extension queries, fourth batch (x180+): corpus-dedup
evaluation and filtering surface — winnowing fingerprints (MOSS),
ARI clustering agreement, ROUGE-N pair overlap, CCNet-style
per-language perplexity buckets, and embedding-space hubness.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

EXT7_QUERIES: dict = {}
EXT7_ORACLES: dict = {}


# ----------------------------------- x180: winnowing fingerprints


def q_x180_winnowing(spark, sf_dir):
    """Winnowing near-dup candidate pairs (operators/dedup.py:
    winnowing_pairs — Schleimer et al. 2003, the MOSS fingerprinter):
    word-3-gram hashes, window-4 rightmost-min selection, pairs by
    shared fingerprints with the standard frequent-bucket cap.  The
    guarantee plain i-th-gram sampling lacks: any shared run of
    ≥ w+k−1 = 6 tokens WILL share a fingerprint."""
    from .operators.dedup import winnowing_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = winnowing_pairs(
        docs, "text", "doc_id", k=3, w=4, max_bucket=50, min_shared=2
    )
    return (
        out.select(
            F.col("doc_a").cast("long").alias("doc_a"),
            F.col("doc_b").cast("long").alias("doc_b"),
            "n_shared",
        )
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
        .limit(50)
    )


SQL_X180 = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         tk[CAST(i AS INTEGER)] || ' ' || tk[CAST(i AS INTEGER) + 1]
           || ' ' || tk[CAST(i AS INTEGER) + 2] AS g
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i FROM toks)
  WHERE i - 1 < 67108864
),
keyed AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(g), 1, 8))::BIGINT * 67108864
           + (67108863 - pos) AS key
  FROM grams
),
picked AS (
  SELECT doc_id,
         MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
         COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS nn
  FROM keyed
),
fps AS (
  SELECT DISTINCT doc_id AS doc, sel // 67108864 AS fp
  FROM picked WHERE nn = 4
),
sizes AS (SELECT fp, COUNT(*) AS b FROM fps GROUP BY fp),
kept AS (
  SELECT f.doc, f.fp FROM fps f JOIN sizes s USING (fp) WHERE s.b <= 50
),
pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_shared
  FROM kept a JOIN kept b USING (fp)
  WHERE a.doc < b.doc
  GROUP BY a.doc, b.doc
)
SELECT CAST(doc_a AS BIGINT) AS doc_a,
       CAST(doc_b AS BIGINT) AS doc_b,
       CAST(n_shared AS BIGINT) AS n_shared
FROM pairs
WHERE n_shared >= 2
ORDER BY n_shared DESC, doc_a, doc_b
LIMIT 50
"""

EXT7_QUERIES.update({"x180_winnowing": q_x180_winnowing})
EXT7_ORACLES.update({"x180_winnowing": SQL_X180})


# --------------------------- x181: ARI clustering agreement (langid)


def q_x181_ari_langid(spark, sf_dir):
    """Adjusted Rand Index (operators/quality.py:clustering_agreement)
    between the declared ``lang`` labels and the marker-ratio
    detector's predicted clusters, per source — the chance-corrected
    single-number summary of x113's confusion matrix, and the same
    operator that scores LSH-bucket clusterings against
    exact-duplicate groups before trusting a cheap dedup key."""
    from .operators.quality import clustering_agreement
    from .operators.text import detect_language

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        "source",
        F.col("lang").alias("declared"),
        detect_language(F.col("text")).alias("predicted"),
    )
    out = clustering_agreement(base, "declared", "predicted", ("source",))
    return out.orderBy("source")


def _sql_x181() -> str:
    from .queries_ext import _sql_profile_ctes

    return f"""
WITH {_sql_profile_ctes()},
lab AS (
  SELECT d.source, d.lang AS a, p.lang_pred AS b
  FROM prof p JOIN documents d USING (doc_id)
),
cells AS (
  SELECT source, a, b, COUNT(*) AS nij FROM lab GROUP BY source, a, b
),
idx AS (
  SELECT source, SUM(nij * (nij - 1)) AS idx2, SUM(nij) AS n
  FROM cells GROUP BY source
),
ma AS (
  SELECT source, SUM(ai * (ai - 1)) AS a2, COUNT(*) AS nca
  FROM (SELECT source, a, COUNT(*) AS ai FROM lab GROUP BY source, a)
  GROUP BY source
),
mb AS (
  SELECT source, SUM(bj * (bj - 1)) AS b2, COUNT(*) AS ncb
  FROM (SELECT source, b, COUNT(*) AS bj FROM lab GROUP BY source, b)
  GROUP BY source
)
SELECT i.source,
       CAST(i.n AS BIGINT) AS n,
       CAST(ma.nca AS BIGINT) AS n_clusters_a,
       CAST(mb.ncb AS BIGINT) AS n_clusters_b,
       ROUND(
         CASE WHEN (ma.a2 + mb.b2)::DOUBLE / 2.0
                   - (ma.a2::DOUBLE * mb.b2) / (i.n * (i.n - 1))::DOUBLE = 0
              THEN NULL
              ELSE (i.idx2::DOUBLE
                    - (ma.a2::DOUBLE * mb.b2) / (i.n * (i.n - 1))::DOUBLE)
                   / ((ma.a2 + mb.b2)::DOUBLE / 2.0
                      - (ma.a2::DOUBLE * mb.b2) / (i.n * (i.n - 1))::DOUBLE)
         END, 6) AS ari
FROM idx i JOIN ma USING (source) JOIN mb USING (source)
ORDER BY i.source
"""


EXT7_QUERIES.update({"x181_ari_langid": q_x181_ari_langid})
EXT7_ORACLES.update({"x181_ari_langid": _sql_x181()})


# ------------------------------------- x182: ROUGE-2 pair overlap


def q_x182_rouge(spark, sf_dir):
    """ROUGE-2 overlap (operators/text.py:rouge_ngram_scores) between
    adjacent documents of the same (source, lang) — clipped bigram
    precision/recall/F1, top-40 most-overlapping pairs: the
    template-churn detector that catches documents sharing phrasing
    that exact and MinHash dedup both miss."""
    from .operators.text import rouge_ngram_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source", "lang").orderBy("doc_id")
    pairs = (
        docs.select(
            "doc_id", F.lead("doc_id").over(w).alias("cand_id")
        )
        .where(F.col("cand_id").isNotNull())
        .select(F.col("doc_id").alias("ref_id"), "cand_id")
    )
    out = rouge_ngram_scores(docs, "text", "doc_id", pairs, n=2)
    return (
        out.select(
            F.col("ref_id").cast("long").alias("ref_id"),
            F.col("cand_id").cast("long").alias("cand_id"),
            "n_match", "n_ref", "n_cand", "precision", "recall", "f1",
        )
        .orderBy(F.desc_nulls_last("f1"), "ref_id", "cand_id")
        .limit(40)
    )


SQL_X182 = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           t -> t <> '') AS tk
  FROM documents
),
big AS (
  SELECT doc_id,
         tk[CAST(i AS INTEGER)] || ' ' || tk[CAST(i AS INTEGER) + 1] AS g
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM toks)
),
counts AS (SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY doc_id, g),
totals AS (SELECT doc_id, SUM(c) AS tot FROM counts GROUP BY doc_id),
pairs AS (
  SELECT doc_id AS ref_id,
         LEAD(doc_id) OVER (PARTITION BY source, lang ORDER BY doc_id)
           AS cand_id
  FROM documents
  QUALIFY cand_id IS NOT NULL
),
m AS (
  SELECT p.ref_id, p.cand_id, SUM(LEAST(r.c, c2.c)) AS n_match
  FROM pairs p
  JOIN counts r ON r.doc_id = p.ref_id
  JOIN counts c2 ON c2.doc_id = p.cand_id AND c2.g = r.g
  GROUP BY p.ref_id, p.cand_id
),
o AS (
  SELECT p.ref_id, p.cand_id,
         COALESCE(m.n_match, 0) AS n_match,
         COALESCE(tr.tot, 0) AS n_ref,
         COALESCE(tc.tot, 0) AS n_cand
  FROM pairs p
  LEFT JOIN m ON m.ref_id = p.ref_id AND m.cand_id = p.cand_id
  LEFT JOIN totals tr ON tr.doc_id = p.ref_id
  LEFT JOIN totals tc ON tc.doc_id = p.cand_id
),
r AS (
  SELECT *,
         CASE WHEN n_cand = 0 THEN NULL
              ELSE n_match::DOUBLE / n_cand::DOUBLE END AS prec,
         CASE WHEN n_ref = 0 THEN NULL
              ELSE n_match::DOUBLE / n_ref::DOUBLE END AS rec
  FROM o
)
SELECT CAST(ref_id AS BIGINT) AS ref_id,
       CAST(cand_id AS BIGINT) AS cand_id,
       CAST(n_match AS BIGINT) AS n_match,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cand AS BIGINT) AS n_cand,
       ROUND(prec, 6) AS precision,
       ROUND(rec, 6) AS recall,
       ROUND(CASE WHEN prec IS NULL OR rec IS NULL OR prec + rec = 0
                  THEN NULL
                  ELSE 2.0 * prec * rec / (prec + rec) END, 6) AS f1
FROM r
ORDER BY f1 DESC NULLS LAST, ref_id, cand_id
LIMIT 40
"""

EXT7_QUERIES.update({"x182_rouge": q_x182_rouge})
EXT7_ORACLES.update({"x182_rouge": SQL_X182})


# ----------------------- x183: CCNet-style perplexity buckets


def q_x183_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity bucketing (operators/text.py:
    perplexity_buckets — Wenzek et al. 2020): every document ranked
    WITHIN its language by bigram surprisal, split into three
    equal-depth buckets; per (lang, bucket) the count, within-language
    share, and mean surprisal.  Per-language ranking is the point — a
    global fluency threshold would drop entire low-resource
    languages."""
    from .operators.text import perplexity_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = perplexity_buckets(
        docs, "text", "doc_id", "lang", n_buckets=3, k=0.5
    )
    return out.orderBy("lang", "bucket")


SQL_X183 = """
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
), perdoc AS (
  SELECT doc_id,
         ROUND(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS ms
  FROM scored GROUP BY doc_id
), lab AS (
  SELECT p.doc_id, p.ms, d.lang FROM perdoc p JOIN documents d USING (doc_id)
), nt AS (
  SELECT lang, doc_id, ms,
         NTILE(3) OVER (PARTITION BY lang ORDER BY ms, doc_id) AS bucket
  FROM lab
), per AS (
  SELECT lang, bucket, COUNT(*) AS n_docs,
         SUM(CAST(ms AS DECIMAL(38,12))) AS ss
  FROM nt GROUP BY lang, bucket
), tot AS (SELECT lang, SUM(n_docs) AS lt FROM per GROUP BY lang)
SELECT per.lang,
       CAST(bucket AS BIGINT) AS bucket,
       CASE WHEN bucket = 1 THEN 'head'
            WHEN bucket = 3 THEN 'tail'
            ELSE 'middle' END AS bucket_name,
       CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(n_docs::DOUBLE / lt::DOUBLE, 6) AS share,
       ROUND(CAST(ss AS DOUBLE) / n_docs::DOUBLE, 6) AS mean_surprisal
FROM per JOIN tot USING (lang)
ORDER BY lang, bucket
"""

EXT7_QUERIES.update({"x183_ppl_buckets": q_x183_ppl_buckets})
EXT7_ORACLES.update({"x183_ppl_buckets": SQL_X183})


# ------------------------------------------- x184: hubness audit


def q_x184_hubness(spark, sf_dir):
    """Embedding-space hubness audit (operators/similarity.py:
    hubness_profile — Radovanović et al. 2010): the k-occurrence
    distribution of exact cosine 5-NN over the embeddings table —
    max occupancy, moment skewness, antihub share.  Right-skew here
    means kNN-derived dedup/retrieval signals are concentrating on a
    few hub vectors; run it before trusting x05/x07/x140 outputs."""
    from .operators.similarity import hubness_profile

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return hubness_profile(emb, k=5)


SQL_X184 = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.neighbor_id,
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
  FROM c CROSS JOIN q
  WHERE c.neighbor_id <> q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
),
occ AS (
  SELECT neighbor_id, COUNT(*) AS c FROM ranked WHERE rank <= 5
  GROUP BY neighbor_id
),
pp AS (
  SELECT COALESCE(o.c, 0) AS occ
  FROM embeddings e LEFT JOIN occ o ON o.neighbor_id = e.vec_id
),
s AS (
  SELECT COUNT(*) AS n, MAX(occ) AS mx, SUM(occ) AS s1,
         SUM(occ * occ) AS s2, SUM(occ * occ * occ) AS s3,
         SUM(CASE WHEN occ = 0 THEN 1 ELSE 0 END) AS nz
  FROM pp
)
SELECT CAST(n AS BIGINT) AS n_points,
       CAST(5 AS BIGINT) AS k,
       CAST(mx AS BIGINT) AS max_occ,
       ROUND(s1::DOUBLE / n::DOUBLE, 6) AS mean_occ,
       ROUND(
         CASE WHEN s2::DOUBLE / n::DOUBLE
                   - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE) > 0
              THEN (s3::DOUBLE / n::DOUBLE
                    - 3.0 * (s1::DOUBLE / n::DOUBLE) * s2::DOUBLE / n::DOUBLE
                    + 2.0 * (s1::DOUBLE / n::DOUBLE)
                          * (s1::DOUBLE / n::DOUBLE)
                          * (s1::DOUBLE / n::DOUBLE))
                   / ((s2::DOUBLE / n::DOUBLE
                       - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
                      * sqrt(s2::DOUBLE / n::DOUBLE
                             - (s1::DOUBLE / n::DOUBLE)
                               * (s1::DOUBLE / n::DOUBLE)))
              ELSE NULL END, 6) AS skewness,
       ROUND(nz::DOUBLE / n::DOUBLE, 6) AS zero_frac
FROM s
"""

EXT7_QUERIES.update({"x184_hubness": q_x184_hubness})
EXT7_ORACLES.update({"x184_hubness": SQL_X184})
