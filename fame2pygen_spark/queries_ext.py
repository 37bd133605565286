"""Extension query registry: dedup / similarity / text / events /
multimodal queries with DuckDB oracles.

These cover the BASELINE.json north-star operators over the
``documents``, ``embeddings`` and ``events`` tables.  Oracle design
follows queries.py's determinism rules; hash-bearing pipelines (MinHash)
use engine-portable hash construction (md5-hex → int64, affine mod
Mersenne-31) so DuckDB reproduces signatures bit-exactly — the oracle
replicates the *mechanism*, not just the intent.

Mapping to the task checklist:
  dedup exact          x01_dedup_exact
  dedup near (charset) x02_dedup_near_charset
  dedup MinHash-LSH    x03_dedup_minhash_lsh  (full SQL oracle)
  dedup SimHash        x04_simhash_signatures (signature-level oracle)
  similarity top-k     x05_similarity_topk (brute force, SQL oracle)
  similarity LSH       x05b_similarity_lsh (full oracle, planes injected)
  similarity IVF       x05c_similarity_ivf (full oracle, pinned centroids)
  text analysis        x06_text_profile (tokens/quality/langid/fingerprint)
  stateful cumulative  x15_running_totals (batch twin of the
                       applyInPandasWithState operator, window oracle)
  streaming analog     x10_events_hourly, x11_events_sessions (the same
                       expressions run under Structured Streaming in
                       streaming/core.py)
  multimodal           x12_multimodal_binary (binary payload plumbing)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .operators import dedup as dd
from .operators import similarity as sim
from .operators import text as tx
from .operators.dedup import MERSENNE_31, _affine_params, min_sig_matches

# --------------------------------------------------------------- dedup


def _docs_with_recrawls(spark, sf_dir):
    """Documents plus deterministic re-crawl copies (every 10th doc
    re-emitted under a new id and the 'recrawl' source).  The round-3
    testdata generation produces no exact/near duplicates at sf0.01,
    which made the dedup-family oracles trivially green on empty
    results — this staging plants a KNOWN duplicate structure both
    engines construct identically, so the operators have real signal
    to find and the oracles verify they find exactly it."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        F.lit("recrawl").alias("source"),
        "n_chars",
    )
    return docs.unionByName(copies)


#: DuckDB mirror of ``_docs_with_recrawls``
SQL_RECRAWL_DOCS = """(
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang, 'recrawl', n_chars
  FROM documents WHERE doc_id % 10 = 0
)"""


def q_x01_dedup_exact(spark, sf_dir):
    docs = _docs_with_recrawls(spark, sf_dir)
    out = dd.exact_duplicates(docs, "text", "doc_id")
    return out.select(
        "fingerprint",
        F.col("keep_id").cast("long").alias("keep_id"),
        F.col("dup_count").cast("long").alias("dup_count"),
    )


SQL_X01 = f"""
WITH fp AS (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
         doc_id
  FROM {SQL_RECRAWL_DOCS} d
)
SELECT fingerprint,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS dup_count
FROM fp GROUP BY 1 HAVING COUNT(*) > 1
"""


def q_x02_dedup_near_charset(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dd.charset_jaccard_pairs(
        docs, "text", "doc_id", block_cols=["source"], threshold=0.9
    ).select(
        "source",
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


SQL_X02 = """
SELECT a.source,
       CAST(a.doc_id AS BIGINT) AS id_a,
       CAST(b.doc_id AS BIGINT) AS id_b,
       ROUND(jaccard(a.text, b.text), 6) AS jaccard
FROM documents a JOIN documents b
  ON a.source = b.source AND a.doc_id < b.doc_id
WHERE ROUND(jaccard(a.text, b.text), 6) >= 0.9
"""


def q_x03_dedup_minhash_lsh(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dd.minhash_lsh_pairs(
        docs, "text", "doc_id", n=5, num_hashes=64, bands=16, threshold=0.6
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


def _sql_x03_ctes(source: str = "documents") -> str:
    """CTE chain replicating the MinHash-LSH pipeline in SQL — same
    shingles, same md5-derived integers, same affine hash family, same
    banding.  Ends with ``lsh_pairs(id_a, id_b, jaccard)``; reused by
    the x03 oracle directly and the x09/x14 clustering oracles as the
    edge source (*source* must expose ``doc_id, text``)."""
    params = _affine_params(64, seed=42)
    values = ", ".join(f"({j}, {a}::BIGINT, {b}::BIGINT)" for j, (a, b) in enumerate(params))
    min_match = min_sig_matches(0.6, 64)
    return f"""docs AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM {source}
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
  SELECT s.doc_id, b.band,
         md5(array_to_string(s.sig[b.band * 4 + 1 : b.band * 4 + 4], ',')) AS bh
  FROM sigs s, LATERAL (SELECT unnest(range(0, 16)) AS band) b
  QUALIFY row_number() OVER (PARTITION BY b.band, bh ORDER BY s.doc_id) <= 1000
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh
  WHERE l.doc_id < r.doc_id
),
pref AS (
  SELECT c.id_a, c.id_b
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
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY 1),
lsh_pairs AS (
  SELECT CAST(c.id_a AS BIGINT) AS id_a,
         CAST(c.id_b AS BIGINT) AS id_b,
         ROUND(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS jaccard
  FROM pref c
  JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  WHERE ROUND(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) >= 0.6
)"""


def _sql_x03() -> str:
    return f"WITH {_sql_x03_ctes()}\nSELECT id_a, id_b, jaccard FROM lsh_pairs"


#: transitive closure of ``lsh_pairs`` → ``comp(doc, component)`` —
#: append after a chain ending in lsh_pairs, under WITH RECURSIVE
_SQL_COMPONENT_CTES = """edges AS (
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
)"""


def _sql_x09() -> str:
    """Connected components of the x03 LSH pairs via recursive CTE
    (transitive closure — feasible at oracle scale only; the Spark side
    runs alternating large-star/small-star)."""
    return f"""
WITH RECURSIVE {_sql_x03_ctes()},
{_SQL_COMPONENT_CTES}
SELECT CAST(doc AS BIGINT) AS doc,
       CAST(component AS BIGINT) AS component,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
       doc = component AS is_canonical
FROM comp
"""


def q_x09_dedup_clusters(spark, sf_dir):
    """Near-dup cluster resolution: LSH pairs → connected components →
    canonical survivor per cluster.  The iterative large-star/small-star
    runs on Spark; the oracle closes the same edge set with a recursive
    CTE."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.minhash_lsh_pairs(
        docs, "text", "doc_id", n=5, num_hashes=64, bands=16, threshold=0.6
    )
    return dd.duplicate_clusters(pairs).select(
        F.col("doc").cast("long").alias("doc"),
        F.col("component").cast("long").alias("component"),
        "cluster_size",
        "is_canonical",
    )


def q_x04_simhash_signatures(spark, sf_dir):
    """SimHash signatures (not pairs) — signature math is fully
    column-side but xxhash64 is Spark-specific, so the oracle checks
    the *shape*: per-doc token counts and the self-distance-0 property
    via the exact-duplicate groups sharing a signature."""
    docs = _docs_with_recrawls(spark, sf_dir)
    out = dd.simhash_signatures(docs, "text", "doc_id")
    # signature-level invariant, oracle-checkable: identical normalized
    # text ⇒ identical signature.  Emit (fingerprint, n_distinct_sigs).
    return (
        out.join(
            docs.select(
                F.col("doc_id").alias("doc"),
                dd.text_fingerprint(F.col("text")).alias("fingerprint"),
            ),
            on="doc",
        )
        .groupBy("fingerprint")
        .agg(F.count_distinct("sig").cast("long").alias("n_sigs"),
             F.count("*").cast("long").alias("n_docs"))
        .where(F.col("n_docs") > 1)
        .select("fingerprint", "n_sigs", "n_docs")
    )


SQL_X04 = f"""
WITH fp AS (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM {SQL_RECRAWL_DOCS} d
)
SELECT fingerprint,
       CAST(1 AS BIGINT) AS n_sigs,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM fp GROUP BY 1 HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------- similarity


def q_x05_similarity_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = sim.cosine_topk(emb, queries, k=5)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "score",
    )


SQL_X05 = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 10
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
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 5
"""


def q_x05b_similarity_lsh(spark, sf_dir):
    """Hyperplane-LSH ANN — full oracle: the seeded planes are
    driver-side constants, so the DuckDB side reproduces bucketing,
    multiprobe, and the exact re-rank literal-for-literal."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = sim.hyperplane_lsh_topk(emb, queries, dim=64, k=5, nbits=6)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "score",
    )


def _sql_x05b() -> str:
    """Replicates hyperplane_lsh_topk(nbits=6, k=5, multiprobe=True):
    same seeded planes (literal-injected, cf. _sql_x07), same sign-bit
    bucket, Hamming-1 multiprobe via xor, cosine re-rank with the
    (score desc, neighbor_id) tie-break."""
    nbits = 6
    planes = sim._hyperplanes(64, nbits, 42)

    def dot_sql(vec: str, plane: list[float]) -> str:
        arr = ", ".join(repr(w) for w in plane)
        return (f"list_reduce(list_transform(range(1, 65), "
                f"i -> {vec}[CAST(i AS INTEGER)] * ([{arr}])[CAST(i AS INTEGER)]), "
                f"(a, x) -> a + x)")

    bucket = " + ".join(
        f"(CASE WHEN {dot_sql('v', plane)} >= 0 THEN {1 << b} ELSE 0 END)"
        for b, plane in enumerate(planes)
    )
    probes = "\n  UNION ALL\n".join(
        f"  SELECT query_id, xor(b0, {1 << b}) AS bucket FROM q"
        for b in range(nbits)
    )
    return f"""
WITH e AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
         {bucket} AS bucket
  FROM embeddings
),
q AS (SELECT id AS query_id, bucket AS b0 FROM e WHERE id < 10),
probes AS (
  SELECT query_id, b0 AS bucket FROM q
  UNION ALL
{probes}
),
cand AS (
  SELECT DISTINCT p.query_id, c.id AS neighbor_id
  FROM probes p JOIN e c ON c.bucket = p.bucket
  WHERE c.id <> p.query_id
),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
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
  FROM cand cd JOIN e a ON a.id = cd.query_id JOIN e b ON b.id = cd.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 5
"""


def q_x07_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, banded-hyperplane blocked; the
    oracle reproduces the seeded planes as literals and the same
    band/cap mechanism."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return sim.embedding_neardup_pairs(
        emb, dim=64, threshold=0.4, nbits=4, bands=2, max_bucket=1000
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "score",
    )


def _sql_x07() -> str:
    nbits, bands, max_bucket = 4, 2, 1000
    planes = sim._hyperplanes(64, nbits * bands, 42)

    def dot_sql(vec: str, plane: list[float]) -> str:
        arr = ", ".join(repr(w) for w in plane)
        return (f"list_reduce(list_transform(range(1, 65), "
                f"i -> {vec}[CAST(i AS INTEGER)] * ([{arr}])[CAST(i AS INTEGER)]), "
                f"(a, x) -> a + x)")

    def band_key(b: int) -> str:
        return " + ".join(
            f"(CASE WHEN {dot_sql('v', planes[b * nbits + j])} >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(nbits)
        )

    key_cols = ",\n         ".join(
        f"{band_key(b)} AS key{b}" for b in range(bands)
    )
    band_union = "\n  UNION ALL\n".join(
        f"  SELECT id, {b} AS band, key{b} AS key FROM e" for b in range(bands)
    )
    cos = """ROUND(
         list_reduce(list_transform(range(1, 65),
             i -> a.v[CAST(i AS INTEGER)] * b.v[CAST(i AS INTEGER)]),
             (acc, x) -> acc + x)
         / (sqrt(list_reduce(list_transform(range(1, 65),
                 i -> a.v[CAST(i AS INTEGER)] * a.v[CAST(i AS INTEGER)]),
                 (acc, x) -> acc + x))
            * sqrt(list_reduce(list_transform(range(1, 65),
                 i -> b.v[CAST(i AS INTEGER)] * b.v[CAST(i AS INTEGER)]),
                 (acc, x) -> acc + x))), 6)"""
    return f"""
WITH e AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
         {key_cols}
  FROM embeddings
),
banded AS (
  SELECT id, band, key FROM (
    SELECT id, band, key,
           row_number() OVER (PARTITION BY band, key ORDER BY id) AS rn
    FROM (
{band_union}
    )
  ) WHERE rn <= {max_bucket}
),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM banded l JOIN banded r ON l.band = r.band AND l.key = r.key
  WHERE l.id < r.id
)
SELECT CAST(c.id_a AS BIGINT) AS id_a,
       CAST(c.id_b AS BIGINT) AS id_b,
       {cos} AS score
FROM cand c JOIN e a ON a.id = c.id_a JOIN e b ON b.id = c.id_b
WHERE {cos} >= 0.4
"""


def q_x08_ngram_jaccard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dd.word_ngram_jaccard_pairs(
        docs, "text", "doc_id", block_cols=["source"], n=3, threshold=0.5
    ).select(
        "source",
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


SQL_X08 = """
WITH g AS (
  SELECT source, doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 0) + 1),
           i -> toks[CAST(i AS INTEGER)] || ' ' ||
                toks[CAST(i AS INTEGER) + 1] || ' ' ||
                toks[CAST(i AS INTEGER) + 2])) AS ng
  FROM (
    SELECT source, doc_id,
           list_filter(string_split(
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
             t -> t <> '') AS toks
    FROM documents
  )
)
SELECT a.source,
       CAST(a.doc_id AS BIGINT) AS id_a,
       CAST(b.doc_id AS BIGINT) AS id_b,
       ROUND(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
             / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
             6) AS jaccard
FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
            / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
            6) >= 0.5
"""


# ----------------------------------------------------------------- text


def q_x05c_similarity_ivf(spark, sf_dir):
    """IVF ANN (coarse quantizer + nprobe cell probing + exact
    re-rank) — full oracle: the quantizer here is the precomputed
    ``centroids=`` path (``ivf_topk`` accepts any centroid list; the
    ML-trained ``ivf_centroids`` variant is pytest-recall-checked).
    Centroids are pinned to the embeddings of ``vec_id < 16`` — a rule
    the oracle reproduces from the same view, so cell assignment,
    probing, and re-rank are deterministic at any SF."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 16)
        .select("vec_id", "embedding").orderBy("vec_id").collect()
    ]
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = sim.ivf_topk(
        emb, queries, dim=64, k=5, n_clusters=16, nprobe=4, centroids=cents
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "score",
    )


#: Replicates ivf_topk(nprobe=4, k=5) with centroids = embeddings of
#: vec_id<16.  Distances use the identical float expression shape as
#: ``similarity._centroid_dists`` — d² = v·v − 2·(v·c) + c·c with
#: sequential-fold dots — ties broken by centroid id, probe order by
#: (dist, cid), re-rank by (score desc, neighbor_id).
SQL_X05C = """
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (
  SELECT id AS cid, v AS cv,
         list_reduce(list_transform(range(1, 65),
             i -> v[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)]),
             (a, x) -> a + x) AS c2
  FROM e WHERE id < 16
),
dists AS (
  SELECT e.id, cent.cid,
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
  SELECT id, cid AS cell FROM (
    SELECT id, cid, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
    FROM dists
  ) WHERE rn = 1
),
qprobe AS (
  SELECT id AS query_id, cid AS cell FROM (
    SELECT id, cid, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
    FROM dists WHERE id < 10
  ) WHERE rn <= 4
),
cand AS (
  SELECT q.query_id, c.id AS neighbor_id
  FROM qprobe q JOIN cells c ON c.cell = q.cell
  WHERE c.id <> q.query_id
),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
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
  FROM cand cd JOIN e a ON a.id = cd.query_id JOIN e b ON b.id = cd.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 5
"""


def q_x06_text_profile(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tx.text_profile(docs, "text")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_word_tokens").cast("long").alias("n_word_tokens"),
        F.col("n_punct").cast("long").alias("n_punct"),
        "stopword_ratio", "repetition_ratio", "mean_token_len", "quality",
        "lang_pred", "fingerprint",
    )


def _sql_profile_ctes(source: str = "documents") -> str:
    """CTE chain replicating text_profile in SQL; ends with
    ``prof(doc_id, text, norm, n_tokens, …, quality, lang_pred,
    fingerprint)``.  Reused by the x06 oracle and the x14 curation
    oracle."""

    def hits(words: tuple[str, ...]) -> str:
        arr = ", ".join(f"'{w}'" for w in words)
        return f"len(list_filter(toks, t -> list_contains([{arr}], t)))"

    lang_score = {
        lang: f"(CASE WHEN n > 0 THEN {hits(words)} / n ELSE 0.0 END)"
        for lang, words in tx.LANG_MARKERS.items()
    }
    # argmax by score, ties to the lexicographically largest language
    # code (matches array_max over (score, lang) structs on Spark)
    langs_desc = sorted(lang_score, reverse=True)
    best = "CASE " + " ".join(
        f"WHEN {lang_score[lang]} >= greatest({', '.join(lang_score.values())}) "
        f"THEN CASE WHEN {lang_score[lang]} >= 0.01 THEN '{lang}' ELSE 'und' END"
        for lang in langs_desc
    ) + " ELSE 'und' END"
    sw = lang_score["en"]
    return f"""base AS (
  SELECT doc_id, text,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM {source}
),
tok AS (
  SELECT doc_id, text, norm,
         list_filter(string_split(norm, ' '), t -> t <> '') AS toks
  FROM base
),
m AS (
  SELECT doc_id, text, norm, toks, len(toks) AS n,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS nw,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS np,
         CASE WHEN len(toks) > 0
              THEN 1.0 - len(list_distinct(toks)) / len(toks) ELSE 0.0 END AS rep,
         CASE WHEN len(toks) > 0
              THEN list_reduce(list_transform(toks, t -> len(t)), (a, x) -> a + x) / len(toks)
              ELSE 0.0 END AS mlen
  FROM tok
),
prof AS (
  SELECT doc_id, text, norm,
         CAST(n AS BIGINT) AS n_tokens,
         CAST(nw AS BIGINT) AS n_word_tokens,
         CAST(np AS BIGINT) AS n_punct,
         ROUND(CASE WHEN n > 0 THEN {sw} ELSE 0.0 END, 6) AS stopword_ratio,
         ROUND(rep, 6) AS repetition_ratio,
         ROUND(mlen, 6) AS mean_token_len,
         ROUND(0.25 * least(1.0, (CASE WHEN n > 0 THEN {sw} ELSE 0.0 END) * 5)
             + 0.25 * (1 - (CASE WHEN n > 0 THEN least(1.0, np / n) ELSE 1.0 END))
             + 0.25 * (1 - rep)
             + 0.25 * least(1.0, greatest(0.0, (mlen - 1) / 6)), 6) AS quality,
         {best} AS lang_pred,
         md5(norm) AS fingerprint
  FROM m
)"""


def _sql_x06() -> str:
    return f"""
WITH {_sql_profile_ctes()}
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens, n_word_tokens,
       n_punct, stopword_ratio, repetition_ratio, mean_token_len,
       quality, lang_pred, fingerprint
FROM prof
"""


def q_x13_tfidf_top_terms(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tx.tfidf_top_terms(docs, "text", "doc_id", k=3).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        F.col("rank").cast("long").alias("rank"),
        F.col("tf").cast("long").alias("tf"),
        "tfidf",
    )


SQL_X13 = """
WITH nt AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(list_filter(string_split(t, ' '), x -> x <> '')) AS term
  FROM nt
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         ROUND(t.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1), 6) AS tfidf
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term,
       CAST(rank AS BIGINT) AS rank, CAST(tf AS BIGINT) AS tf, tfidf
FROM ranked WHERE rank <= 3
"""


def q_x14_curation_pipeline(spark, sf_dir):
    """Full corpus-curation flow: quality+language filter → exact dedup
    → LSH near-dup clusters → canonical survivors only."""
    from .operators.curation import curate_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curate_documents(
        docs, "text", "doc_id", min_quality=0.55, languages=("en",)
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "quality", "lang_pred"
    )


def _sql_x14() -> str:
    """The curation pipeline end-to-end in SQL: profile CTEs → filter →
    window exact-dedup → LSH CTEs over the surviving docs → recursive
    component closure → anti-join of non-canonical members."""
    return f"""
WITH RECURSIVE {_sql_profile_ctes()},
passed AS (
  SELECT doc_id, text, norm, quality, lang_pred FROM prof
  WHERE quality >= 0.55 AND lang_pred = 'en'
),
exact_kept AS (
  SELECT doc_id, text, quality, lang_pred FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(norm)) AS keep_id
    FROM passed
  ) WHERE doc_id = keep_id
),
{_sql_x03_ctes(source="exact_kept")},
{_SQL_COMPONENT_CTES}
SELECT CAST(k.doc_id AS BIGINT) AS doc_id, k.quality, k.lang_pred
FROM exact_kept k
WHERE k.doc_id NOT IN (SELECT doc FROM comp WHERE doc <> component)
"""


# ---------------------------------------------------------------- events


def _read_events(spark, sf_dir):
    """Expose a microsecond-epoch ``ts_us`` column both engines agree
    on exactly, across testdata generations: events.ts has been parquet
    TIMESTAMP(NANOS) (Spark 4 rejects it unless nanos are read as
    int64) and TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ), so adapt to
    whichever type the scan yields."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        # nanos-as-long: integer division (`div`), not `/` — float
        # division rounds the µs value at ~1.7e15 where double ULP is
        # 0.25, drifting ±1µs from DuckDB's truncating epoch_us
        ts_us = F.expr("ts div 1000")
    else:
        # TIMESTAMP_NTZ µs: session tz is UTC, so the NTZ→TZ cast is
        # identity and unix_micros matches DuckDB's epoch_us
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.withColumn("ts_us", ts_us.cast("long"))


def q_x10_events_hourly(spark, sf_dir):
    ev = _read_events(spark, sf_dir)
    hour_us = F.col("ts_us") - (F.col("ts_us") % F.lit(3_600_000_000))
    return (
        ev.groupBy(
            hour_us.cast("long").alias("window_start_us"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
            ).alias("sum_value"),
        )
    )


SQL_X10 = """
SELECT CAST(epoch_us(ts) - epoch_us(ts) % 3600000000 AS BIGINT) AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_x11_events_sessions(spark, sf_dir):
    """Batch sessionization: 30-min-gap sessions via lag + running sum —
    the SQL-expressible formulation (the streaming path uses
    session_window over the same grouping, streaming/core.py)."""
    ev = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_session = F.when(
        F.lag("ts_us").over(w).isNull()
        | ((F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us),
        1,
    ).otherwise(0)
    sess = ev.withColumn("session_id", F.sum(new_session).over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").cast("long").alias("session_start_us"),
            F.max("ts_us").cast("long").alias("session_end_us"),
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("session_id").cast("long").alias("session_id"),
            "session_start_us", "session_end_us", "n_events", "sum_value",
        )
    )


SQL_X11 = """
WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
flagged AS (
  SELECT *,
         CASE WHEN LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
       CAST(MAX(ts_us) AS BIGINT) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM sess GROUP BY 1, 2
"""


# ------------------------------------------------------------ multimodal


def q_x15_running_totals(spark, sf_dir):
    """Batch equivalent of the arbitrary-stateful streaming operator
    (streaming/stateful.py:running_user_totals): per-event cumulative
    (count, sum, max) per user.  Row i of a user's time-ordered stream
    is exactly the state the streaming operator emits after event i —
    a pytest bridges the two; this query makes the cumulative math
    oracle-checked."""
    from .streaming.stateful import running_user_totals_batch

    ev = _read_events(spark, sf_dir)
    out = running_user_totals_batch(ev)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
        "max_value",
    )


SQL_X15 = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6)
         AS sum_value,
       ROUND(MAX(value) OVER w, 6) AS max_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_x12_multimodal_binary(spark, sf_dir):
    """Binary-column plumbing over synthesized payloads (testdata has no
    media blobs): encode text → binary, JVM-side magic sniffing +
    metadata — the exact pipeline a real image column would take."""
    from .operators.multimodal import attach_media_metadata

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jpeg_magic = bytes.fromhex("ffd8ff")
    with_payload = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(jpeg_magic), F.encode("text", "utf-8")),
        )
        .otherwise(F.encode("text", "utf-8"))
        .alias("payload"),
    )
    out = attach_media_metadata(with_payload, "payload")
    return out.select(
        "doc_id",
        F.col("media.kind").alias("kind"),
        F.col("media.mime").alias("mime"),
        F.col("media.n_bytes").alias("n_bytes"),
        F.md5(F.hex("payload")).alias("payload_md5"),
    )


SQL_X12 = """
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN '\\xFF\\xD8\\xFF'::BLOB || encode(text)
              ELSE encode(text) END AS payload
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'unknown' END AS kind,
       CASE WHEN doc_id % 2 = 0 THEN 'image/jpeg'
            ELSE 'application/octet-stream' END AS mime,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       md5(hex(payload)) AS payload_md5
FROM p
"""



# ----------------------------------------------- repetition / mixing


def q_x16_gopher_filter(spark, sf_dir):
    """Gopher-style within-document repetition filter
    (operators/text.py:repetition_profile / gopher_filter): top-2gram
    char fraction, duplicate-5gram fraction, symbol/word ratio,
    token-count and mean-token-length bounds -> boolean keep."""
    from .operators.text import gopher_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = gopher_filter(docs, "text", "doc_id")
    return out.select(
        F.col("doc").cast("long").alias("doc_id"),
        F.col("n_chars_norm").cast("long").alias("n_chars_norm"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_token_len",
        "symbol_word_ratio",
        F.coalesce(F.col("top_gram"), F.lit("")).alias("top_gram"),
        F.coalesce(F.col("top_gram_count"), F.lit(0)).cast("long").alias(
            "top_gram_count"
        ),
        "top_2gram_char_frac",
        "dup_5gram_frac",
        F.col("keep").cast("int").cast("long").alias("keep"),
    )


SQL_X16 = """
WITH t AS (
  SELECT doc_id, text,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), ta AS (
  SELECT doc_id, text, nt,
         CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS toks
  FROM t
), base AS (
  SELECT doc_id,
         CAST(length(nt) AS BIGINT) AS n_chars_norm,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         ROUND(CASE WHEN len(toks) > 0
               THEN (length(nt) - (len(toks) - 1)) * 1.0 / len(toks)
               ELSE 0.0 END, 6) AS mean_token_len,
         ROUND(CASE WHEN len(toks) > 0
               THEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / len(toks)
               ELSE 0.0 END, 6) AS symbol_word_ratio
  FROM ta
), g2 AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
  FROM ta, unnest(generate_series(1, len(toks) - 1)) AS u(i)
), g2c AS (
  SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2
), top1 AS (
  SELECT doc_id, g AS top_gram, c AS top_gram_count
  FROM (SELECT doc_id, g, c,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, g ASC) AS rn
        FROM g2c)
  WHERE rn = 1
), g5 AS (
  SELECT doc_id, array_to_string(toks[i:i + 4], ' ') AS g
  FROM ta, unnest(generate_series(1, len(toks) - 4)) AS u(i)
), dup5 AS (
  SELECT doc_id,
         ROUND(1.0 - COUNT(DISTINCT g) * 1.0 / COUNT(*), 6) AS dup_5gram_frac
  FROM g5 GROUP BY 1
), prof AS (
  SELECT b.doc_id, b.n_chars_norm, b.n_tokens, b.mean_token_len,
         b.symbol_word_ratio,
         COALESCE(t1.top_gram, '') AS top_gram,
         CAST(COALESCE(t1.top_gram_count, 0) AS BIGINT) AS top_gram_count,
         ROUND(COALESCE(t1.top_gram_count * length(t1.top_gram) * 1.0
                        / b.n_chars_norm, 0.0), 6) AS top_2gram_char_frac,
         COALESCE(d5.dup_5gram_frac, 0.0) AS dup_5gram_frac
  FROM base b
  LEFT JOIN top1 t1 USING (doc_id)
  LEFT JOIN dup5 d5 USING (doc_id)
)
SELECT *,
       CAST(CASE WHEN n_tokens >= 25 AND n_tokens <= 100000
                  AND mean_token_len >= 3.0 AND mean_token_len <= 10.0
                  AND symbol_word_ratio <= 0.1
                  AND top_2gram_char_frac <= 0.08
                  AND dup_5gram_frac <= 0.15
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM prof
"""


def q_x17_corpus_mixing(spark, sf_dir):
    """Deterministic data-mixing sample + disjoint splits
    (operators/mixing.py): per-source keep rates via an md5-hash draw,
    then train/val/test ranges over a second independent draw.  Both
    draws are pure functions of the doc id, so the oracle reproduces
    the exact membership."""
    from .operators.mixing import split_corpus, stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {
        f"src{i}": (0.9 if i < 5 else 0.5 if i < 10 else 0.2)
        for i in range(20)
    }
    out = stratified_sample(docs, "source", rates, "doc_id", salt="mix")
    out = split_corpus(
        out, "doc_id",
        fractions={"train": 0.5, "val": 0.25, "test": 0.25}, salt="split",
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "split"
    )


SQL_X17 = """
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS hm,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS hs
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CASE WHEN hs < 0.5 THEN 'train'
            WHEN hs < 0.75 THEN 'val'
            ELSE 'test' END AS split
FROM h
WHERE hm < CASE
  WHEN source IN ('src0', 'src1', 'src2', 'src3', 'src4') THEN 0.9
  WHEN source IN ('src5', 'src6', 'src7', 'src8', 'src9') THEN 0.5
  ELSE 0.2 END
"""


def q_x18_token_shards(spark, sf_dir):
    """Token-budget sharding (operators/mixing.py:assign_token_shards):
    greedy in-order packing of documents into ~500-token shards,
    windowed per source so the cumsum distributes."""
    from .operators.mixing import assign_token_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = assign_token_shards(
        docs, "text", "doc_id", shard_tokens=500, partition_col="source"
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("shard").cast("long").alias("shard"),
    )


SQL_X18 = """
WITH t AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), tok AS (
  SELECT doc_id, source,
         CASE WHEN nt = '' THEN 0 ELSE len(string_split(nt, ' ')) END
           AS n_tokens
  FROM t
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM tok
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR((cum - n_tokens) / 500.0) AS BIGINT) AS shard
FROM c
"""


def q_x19_decontamination(spark, sf_dir):
    """Benchmark decontamination (operators/decontam.py): documents
    sharing any distinct normalized word 8-gram with a held-out
    "benchmark" slice (doc_id % 97 == 0) are flagged.  The benchmark
    n-gram set is broadcast; the corpus probe is map-side."""
    from .operators.decontam import contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    out = contamination(train, bench, "text", "doc_id", n=8)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_contaminated_ngrams",
        F.col("contaminated").cast("int").cast("long").alias("contaminated"),
    )


SQL_X19 = """
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), ta AS (
  SELECT doc_id,
         CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS toks
  FROM t
), bench AS (
  SELECT DISTINCT array_to_string(toks[i:i + 7], ' ') AS g
  FROM ta, unnest(generate_series(1, len(toks) - 7)) AS u(i)
  WHERE doc_id % 97 = 0
), docg AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i + 7], ' ') AS g
  FROM ta, unnest(generate_series(1, len(toks) - 7)) AS u(i)
  WHERE doc_id % 97 <> 0
), cnt AS (
  SELECT doc_id, COUNT(*) AS c FROM docg JOIN bench USING (g) GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(c.c, 0) AS BIGINT) AS n_contaminated_ngrams,
       CAST(CASE WHEN COALESCE(c.c, 0) >= 1 THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN cnt c USING (doc_id)
"""


def q_x20_pii_scrub(spark, sf_dir):
    """PII scrub (operators/pii.py): the corpus text is decorated with
    deterministic synthetic PII (emails/IPs/SSNs/phones derived from
    doc_id — the raw corpus is PII-free word soup), then counted and
    redacted.  Both engines build the identical input, so redaction is
    compared byte-for-byte."""
    from .operators.pii import scrub_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    decorated = docs.select(
        d.cast("long").alias("doc_id"),
        F.concat(
            F.col("text"),
            F.when(
                d % 3 == 0,
                F.concat(F.lit(" contact user"), d.cast("string"),
                         F.lit("@example.com now")),
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.concat(F.lit(" from 192.168."), (d % 256).cast("string"),
                         F.lit("."), (d % 100).cast("string")),
            ).otherwise(F.lit("")),
            F.when(d % 7 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
            F.when(d % 11 == 0, F.lit(" ssn 123-45-6789")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return scrub_pii(decorated, "text").select(
        "doc_id", "text", "n_pii_email", "n_pii_ipv4", "n_pii_ssn",
        "n_pii_phone", "n_pii",
    )


SQL_X20 = r"""
WITH dec AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com now' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789' ELSE '' END
           AS text
  FROM documents
), counted AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_pii_email,
         CAST(len(regexp_extract_all(text,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
           AS n_pii_ipv4,
         CAST(len(regexp_extract_all(text,
           '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_pii_ssn,
         CAST(len(regexp_extract_all(text,
           '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_pii_phone
  FROM dec
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
         '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
         '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS text,
       n_pii_email, n_pii_ipv4, n_pii_ssn, n_pii_phone,
       n_pii_email + n_pii_ipv4 + n_pii_ssn + n_pii_phone AS n_pii
FROM counted
"""


def q_x21_passage_dedup(spark, sf_dir):
    """Passage-level exact dedup (operators/dedup.py:passage_dedup):
    20-token windows, globally-first survivor, reassembled text."""
    from .operators.dedup import passage_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = passage_dedup(docs, "text", "doc_id", passage_tokens=20)
    return out.select(
        F.col("doc").cast("long").alias("doc_id"),
        "text",
        "n_passages",
        "n_kept",
    )


SQL_X21 = """
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), ta AS (
  SELECT doc_id, string_split(nt, ' ') AS toks FROM t WHERE nt <> ''
), pw AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i * 20 + 1 : i * 20 + 20], ' ') AS passage
  FROM ta, unnest(generate_series(
         0, CAST(ceil(len(toks) / 20.0) AS INT) - 1)) AS u(i)
), fl AS (
  SELECT doc_id, pos, passage,
         CASE WHEN row_number() OVER (PARTITION BY passage
                                      ORDER BY doc_id, pos) = 1
              THEN 1 ELSE 0 END AS keep
  FROM pw
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       COALESCE(string_agg(passage, ' ' ORDER BY pos)
                  FILTER (WHERE keep = 1), '') AS text,
       CAST(COUNT(*) AS BIGINT) AS n_passages,
       CAST(SUM(keep) AS BIGINT) AS n_kept
FROM fl
GROUP BY doc_id
"""


def q_x22_embedding_quantize(spark, sf_dir):
    """Per-vector symmetric int8 quantization
    (operators/similarity.py:quantize_embeddings): scale, quantized
    components (comma-joined for engine-portable compare), worst
    per-row reconstruction error."""
    from .operators.similarity import quantize_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = quantize_embeddings(emb, "embedding", "vec_id", bits=8)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "scale",
        F.array_join(F.col("q"), ",").alias("q_str"),
        "max_abs_err",
    )


SQL_X22 = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings
), s AS (
  SELECT vec_id, vd,
         list_max(list_transform(vd, x -> abs(x))) / 127.0 AS scale
  FROM v
), q AS (
  SELECT vec_id, vd, scale,
         list_transform(
           vd,
           x -> CASE WHEN scale > 0
                THEN CAST(floor(x / scale + 0.5) AS INT)
                ELSE 0 END) AS qv
  FROM s
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       ROUND(scale, 6) AS scale,
       array_to_string(qv, ',') AS q_str,
       ROUND(list_max(list_transform(
         list_zip(qv, vd),
         p -> abs(CAST(p[1] AS DOUBLE) * scale - p[2]))), 6) AS max_abs_err
FROM q
"""


def q_x23_url_domains(spark, sf_dir):
    """URL extraction + domain blocklist (operators/web.py): corpus
    text is decorated with deterministic synthetic URLs (the raw
    corpus has none), then URLs are extracted, reduced to domains and
    checked against a blocklist."""
    from .operators.web import doc_domains, extract_urls, flag_blocked_domains

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    decorated = docs.select(
        d.cast("long").alias("doc_id"),
        F.concat(
            F.col("text"),
            F.when(
                d % 4 == 0,
                F.concat(F.lit(" visit https://www.site"),
                         (d % 5).cast("string"), F.lit(".com/a")),
            ).otherwise(F.lit("")),
            F.when(
                d % 6 == 0, F.lit(" ref http://tracker.badsite.net/x?q=1")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    flagged = flag_blocked_domains(
        decorated, "text", ["tracker.badsite.net"]
    )
    return flagged.select(
        "doc_id",
        F.size(extract_urls(F.col("text"))).cast("long").alias("n_urls"),
        F.array_join(
            F.array_sort(doc_domains(F.col("text"))), ","
        ).alias("domains_str"),
        "n_blocked_domains",
        F.col("blocked").cast("int").cast("long").alias("blocked"),
    )


SQL_X23 = r"""
WITH dec AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         text
         || CASE WHEN doc_id % 4 = 0
                 THEN ' visit https://www.site' || CAST(doc_id % 5 AS VARCHAR)
                      || '.com/a' ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN ' ref http://tracker.badsite.net/x?q=1' ELSE '' END
           AS text
  FROM documents
), u AS (
  SELECT doc_id,
         regexp_extract_all(text,
           'https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\s]*)?', 0) AS urls
  FROM dec
), dom AS (
  SELECT doc_id, urls,
         list_sort(list_distinct(list_transform(urls,
           x -> lower(regexp_extract(x, 'https?://([A-Za-z0-9.-]+)', 1)))))
           AS domains
  FROM u
)
SELECT doc_id,
       CAST(len(urls) AS BIGINT) AS n_urls,
       COALESCE(array_to_string(domains, ','), '') AS domains_str,
       CAST(len(list_intersect(domains, ['tracker.badsite.net'])) AS BIGINT)
         AS n_blocked_domains,
       CAST(CASE WHEN len(list_intersect(domains,
         ['tracker.badsite.net'])) > 0 THEN 1 ELSE 0 END AS BIGINT) AS blocked
FROM dom
"""


def q_x24_stream_join(spark, sf_dir):
    """Batch twin of the watermarked stream-stream attribution join
    (streaming/core.py:join_streams): purchases within 30 minutes of a
    click by the same user.  The streaming path runs the identical
    expression tree with watermarks and the range bound inside the
    join condition (state-bounded)."""
    from .streaming.core import join_streams

    ev = _read_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts_us"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us", "value"
    )
    out = join_streams(
        clicks, purchases, on="user_id", ts_col="ts_us", max_delay_sec=1800
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("click_id"),
        F.col("ts_us").cast("long").alias("click_ts_us"),
        F.col("r_event_id").cast("long").alias("purchase_id"),
        F.col("r_ts_us").cast("long").alias("purchase_ts_us"),
        F.round(F.col("r_value"), 6).alias("value"),
    )


SQL_X24 = """
SELECT CAST(l.user_id AS BIGINT) AS user_id,
       CAST(l.event_id AS BIGINT) AS click_id,
       CAST(epoch_us(l.ts) AS BIGINT) AS click_ts_us,
       CAST(r.event_id AS BIGINT) AS purchase_id,
       CAST(epoch_us(r.ts) AS BIGINT) AS purchase_ts_us,
       ROUND(r.value, 6) AS value
FROM events l
JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'click' AND r.event_type = 'purchase'
 AND epoch_us(r.ts) >= epoch_us(l.ts)
 AND epoch_us(r.ts) <= epoch_us(l.ts) + 1800000000
"""


def q_x25_asof_join(spark, sf_dir):
    """As-of join (operators/temporal.py:asof_join): each click gets
    the user's most recent purchase at or before it.  Union + keyed
    window — one shuffle, no candidate pairs (vs x24's bounded range
    join, which materializes pairs)."""
    from .operators.temporal import asof_join

    ev = _read_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us", "value"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_us").alias("p_ts_us"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_time="ts_us",
        right_time="p_ts_us",
        value_cols=["p_value"],
        suffix="",
        right_order="p_event_id",
    )
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts_us").cast("long").alias("ts_us"),
        "value",
        F.col("p_ts_us").cast("long").alias("p_ts_us"),
        "p_value",
    )


SQL_X25 = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
  FROM events
), u AS (
  SELECT event_id, user_id, ts_us, value, 1 AS is_left,
         NULL::BIGINT AS ro, NULL::BIGINT AS r_ts, NULL::DOUBLE AS r_val
  FROM ev WHERE event_type = 'click'
  UNION ALL
  SELECT NULL, user_id, ts_us, NULL, 0, event_id, ts_us, value
  FROM ev WHERE event_type = 'purchase'
), c AS (
  SELECT *,
         LAST_VALUE(r_ts IGNORE NULLS) OVER w AS p_ts_us,
         LAST_VALUE(r_val IGNORE NULLS) OVER w AS p_value
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts_us, is_left, ro ASC NULLS LAST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(ts_us AS BIGINT) AS ts_us, value,
       CAST(p_ts_us AS BIGINT) AS p_ts_us, p_value
FROM c WHERE is_left = 1
"""


def q_x26_range_join(spark, sf_dir):
    """Keyless point-in-interval join (operators/temporal.py:
    range_join_points): lineitems shipped inside the 7-day window after
    a high-value order's date, bucketed at the interval width so the
    plan is an equi-join on bucket, never a cross product."""
    from .operators.temporal import range_join_points

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    iv = orders.where(F.col("o_totalprice") > 494000).select(
        "o_orderkey",
        F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400").alias("start_day"),
        (F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400") + 7).alias("end_day"),
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.expr("CAST(CAST(l_shipdate AS TIMESTAMP) AS BIGINT) div 86400").alias("ship_day"),
        "l_quantity",
    )
    pairs = range_join_points(
        li, iv,
        point_col="ship_day", start_col="start_day", end_col="end_day",
        bucket_width=7,
    )
    return pairs.groupBy(F.col("o_orderkey").cast("long").alias("o_orderkey")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"), 6
        ).alias("sum_qty"),
    )


SQL_X26 = """
WITH iv AS (
  SELECT o_orderkey, epoch_us(o_orderdate) // 86400000000 AS start_day
  FROM orders WHERE o_totalprice > 494000
), li AS (
  SELECT epoch_us(l_shipdate) // 86400000000 AS ship_day, l_quantity
  FROM lineitem
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS sum_qty
FROM iv JOIN li
  ON li.ship_day >= iv.start_day AND li.ship_day < iv.start_day + 7
GROUP BY 1
"""


def q_x27_doc_chunks(spark, sf_dir):
    """Fixed-size overlapping character chunking for embedding /
    retrieval pipelines (operators/text.py:chunk_documents) — row-local
    sequence+posexplode+substring, zero shuffles."""
    from .operators.text import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ch = chunk_documents(docs, "text", "doc_id", chunk_chars=200, stride=150)
    return ch.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "chunk_idx",
        "chunk_start",
        "chunk_len",
        F.md5("chunk_text").alias("chunk_md5"),
    )


SQL_X27 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST((cs - 1) // 150 AS BIGINT) AS chunk_idx,
       CAST(cs AS BIGINT) AS chunk_start,
       CAST(length(substr(text, CAST(cs AS BIGINT), 200)) AS BIGINT)
         AS chunk_len,
       md5(substr(text, CAST(cs AS BIGINT), 200)) AS chunk_md5
FROM (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), 150)) AS cs
  FROM documents
)
"""


def q_x28_context_windows(spark, sf_dir):
    """Sequence packing into fixed token context windows
    (operators/mixing.py:pack_context_windows): documents straddle
    window boundaries; one row per (doc, window touched) with the token
    span.  Per-source cumsum window + bounded explode."""
    from .operators.mixing import pack_context_windows

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_context_windows(
        docs, "text", "doc_id", window_tokens=100, partition_col="source"
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("window_id").cast("long").alias("window_id"),
        "tok_offset",
        "win_tok",
    )


SQL_X28 = """
WITH t AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), tok AS (
  SELECT doc_id, source,
         CASE WHEN nt = '' THEN 0 ELSE len(string_split(nt, ' ')) END
           AS n_tokens
  FROM t
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS e
  FROM tok
), b AS (
  SELECT doc_id, source, n_tokens, CAST(e AS BIGINT) AS e,
         CAST(e - n_tokens AS BIGINT) AS s FROM c
), x AS (
  SELECT doc_id, source, n_tokens, s, e,
         unnest(generate_series(CAST(s // 100 AS BIGINT),
                                CAST(greatest(e - 1, s) // 100 AS BIGINT)))
           AS window_id
  FROM b
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(window_id AS BIGINT) AS window_id,
       CAST(greatest(s, window_id * 100) - s AS BIGINT) AS tok_offset,
       CAST(least(e, window_id * 100 + 100) - greatest(s, window_id * 100)
            AS BIGINT) AS win_tok
FROM x
"""


def q_x29_kmv_distinct(spark, sf_dir):
    """KMV bottom-k distinct sketch (operators/sketch.py:kmv_distinct):
    per-source distinct-token estimate.  Every intermediate — md5
    uniform hash, distinct pass, bottom-k window, (k-1)*R/kth
    estimator — is deterministic column algebra, so the oracle
    replicates the full mechanism, not just the answer."""
    from .operators.sketch import kmv_distinct
    from .operators.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("word")
    )
    return kmv_distinct(words, ["source"], "word", k=64)


SQL_X29 = """
WITH t AS (
  SELECT source,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), words AS (
  SELECT source, unnest(string_split(nt, ' ')) AS word
  FROM t WHERE nt <> ''
), h AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5('kmv:' || word), 1, 8))::BIGINT AS hh
  FROM words
), r AS (
  SELECT source, hh,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh) AS rn
  FROM h
), bk AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(hh) AS kth
  FROM r WHERE rn <= 64 GROUP BY source
), tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_hash_distinct
  FROM h GROUP BY source
)
SELECT bk.source, bk.n_kept, tot.n_hash_distinct,
       CASE WHEN bk.n_kept < 64 THEN CAST(bk.n_kept AS DOUBLE)
            ELSE ROUND(63.0 * 4294967296.0 / kth, 6) END AS est_distinct
FROM bk JOIN tot ON bk.source = tot.source
"""


def q_x30_group_quantiles(spark, sf_dir):
    """Exact per-group quantiles (operators/sketch.py:group_quantiles):
    event value distribution per event_type.  Spark `percentile` and
    DuckDB `quantile_cont` share the p*(n-1) linear-interpolation
    definition; the approx_percentile scale path is pytest-bounded
    against this exact one."""
    from .operators.sketch import group_quantiles

    ev = _read_events(spark, sf_dir)
    return group_quantiles(
        ev, ["event_type"], "value", [0.25, 0.5, 0.9, 0.99]
    )


SQL_X30 = """
SELECT event_type,
       CAST(COUNT(value) AS BIGINT) AS n,
       ROUND(quantile_cont(value, 0.25) * 1000000.0) / 1000000.0 AS p25,
       ROUND(quantile_cont(value, 0.5) * 1000000.0) / 1000000.0 AS p50,
       ROUND(quantile_cont(value, 0.9) * 1000000.0) / 1000000.0 AS p90,
       ROUND(quantile_cont(value, 0.99) * 1000000.0) / 1000000.0 AS p99
FROM events GROUP BY event_type
"""


def q_x31_funnel(spark, sf_dir):
    """Ordered funnel (operators/behavior.py:funnel_conversion):
    signup → click → purchase within 7 days of the signup.  The oracle
    replicates the sequential-conditional-minimum mechanism step by
    step, not just the counts."""
    from .operators.behavior import funnel_conversion

    ev = _read_events(spark, sf_dir)
    return funnel_conversion(
        ev,
        ["signup", "click", "purchase"],
        within_us=7 * 86_400_000_000,
    )


SQL_X31 = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), s1 AS (
  SELECT user_id, MIN(ts_us) AS t1
  FROM e WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MAX(s1.t1) AS t1,
         MIN(CASE WHEN e.ts_us > s1.t1
                   AND e.ts_us - s1.t1 <= 604800000000
                  THEN e.ts_us END) AS t2
  FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
  GROUP BY e.user_id
  HAVING MIN(CASE WHEN e.ts_us > s1.t1
                   AND e.ts_us - s1.t1 <= 604800000000
                  THEN e.ts_us END) IS NOT NULL
), s3 AS (
  SELECT e.user_id,
         MIN(CASE WHEN e.ts_us > s2.t2
                   AND e.ts_us - s2.t1 <= 604800000000
                  THEN e.ts_us END) AS t3
  FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
  HAVING MIN(CASE WHEN e.ts_us > s2.t2
                   AND e.ts_us - s2.t1 <= 604800000000
                  THEN e.ts_us END) IS NOT NULL
), counts AS (
  SELECT 1 AS step_idx, 'signup' AS step, COUNT(*) AS n_users FROM s1
  UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
)
SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
       CAST(n_users AS BIGINT) AS n_users,
       ROUND(CAST(n_users AS DOUBLE)
             / FIRST_VALUE(CAST(n_users AS DOUBLE))
               OVER (ORDER BY step_idx), 6) AS pct_of_first
FROM counts
"""


def q_x32_cohort_retention(spark, sf_dir):
    """Cohort retention (operators/behavior.py:cohort_retention):
    day-bucketed first-activity cohorts, retention at offsets 0/1/7."""
    from .operators.behavior import cohort_retention

    ev = _read_events(spark, sf_dir)
    return cohort_retention(ev, offsets=(0, 1, 7))


SQL_X32 = """
WITH a AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS day
  FROM events
), c AS (
  SELECT u, MIN(day) AS cohort_day FROM a GROUP BY u
), per AS (
  SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
         CAST(COUNT(*) AS BIGINT) AS n_active
  FROM a JOIN c USING (u)
  WHERE a.day - c.cohort_day IN (0, 1, 7)
  GROUP BY 1, 2
), s AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
  FROM c GROUP BY 1
)
SELECT per.cohort_day, per.day_offset, per.n_active, s.n_cohort,
       ROUND(CAST(per.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
FROM per JOIN s USING (cohort_day)
"""


#: x33 query terms + BM25 parameters (shared by query and oracle)
_BM25_TERMS = ["spark", "join", "window"]
_BM25_K1, _BM25_B, _BM25_TOPN = 1.2, 0.75, 10


def q_x33_bm25(spark, sf_dir):
    """BM25 ranked retrieval (operators/text.py:bm25_rank): top-10
    documents for a 3-term query.  The oracle recomputes the entire
    mechanism in SQL — per-doc tf via list_filter, corpus stats (N,
    avgdl, df) as a CTE aggregate, the Lucene ln(1+(N-df+.5)/(df+.5))
    idf, and the (k1, b) normalization — no literal injection."""
    from .operators.text import bm25_rank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_rank(
        docs, "text", "doc_id", _BM25_TERMS,
        k1=_BM25_K1, b=_BM25_B, top_n=_BM25_TOPN,
    )


def _sql_x33() -> str:
    tf_exprs = ",\n         ".join(
        f"len(list_filter(string_split(nt, ' '), x -> x = '{t}'))"
        f" AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_exprs = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    k1, b = _BM25_K1, _BM25_B
    score_terms = " + ".join(
        f"ln(1 + (st.n - st.df_{i} + 0.5) / (st.df_{i} + 0.5))"
        f" * (d.tf_{i} * {k1 + 1.0})"
        f" / (d.tf_{i} + {k1} * ({1.0 - b} + {b} * d.dl / st.avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    tf_cols = ", ".join(
        f"CAST(d.tf_{i} AS BIGINT) AS tf_{i}"
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
  SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
         {df_exprs}
  FROM d
), sc AS (
  SELECT d.doc_id, CAST(d.dl AS BIGINT) AS dl, {tf_cols},
         ROUND({score_terms}, 6) AS score
  FROM d, st
)
SELECT * FROM sc WHERE score > 0
ORDER BY score DESC, doc_id ASC LIMIT {_BM25_TOPN}
"""


SQL_X33 = _sql_x33()


def q_x34_event_transitions(spark, sf_dir):
    """Empirical Markov transition matrix over per-user event paths
    (operators/behavior.py:event_transitions), event_id as the
    deterministic same-µs tie-break."""
    from .operators.behavior import event_transitions

    ev = _read_events(spark, sf_dir)
    return event_transitions(ev)


SQL_X34 = """
WITH p AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS from_type
  FROM events
), c AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM p WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM c
"""


#: x35 probe terms + CMS parameters (shared by query and oracle)
_CMS_PROBES = ["spark", "table", "the", "vector", "query", "zzz_absent"]
_CMS_DEPTH, _CMS_WIDTH = 3, 1024


def q_x35_countmin(spark, sf_dir):
    """Count-min frequency estimates (operators/sketch.py): token
    stream over documents, 3×1024 sketch, probe terms incl. an absent
    one.  Every counter is md5-derived column algebra, so the oracle
    rebuilds the full sketch in SQL."""
    from .operators.sketch import countmin_estimate
    from .operators.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(F.explode(tokens(F.col("text"))).alias("word"))
    return countmin_estimate(
        words, "word", _CMS_PROBES, depth=_CMS_DEPTH, width=_CMS_WIDTH
    )


def _sql_x35() -> str:
    w = _CMS_WIDTH

    def bucket(expr: str, r: int) -> str:
        return (
            f"('0x' || substr(md5('cms:{r}:' || {expr}), 1, 8))::BIGINT"
            f" % {w}"
        )

    cell_rows = "\n  UNION ALL ".join(
        f"SELECT {r} AS r, {bucket('word', r)} AS bucket FROM words"
        for r in range(_CMS_DEPTH)
    )
    key_rows = "\n  UNION ALL ".join(
        f"SELECT term, {r} AS r, {bucket('term', r)} AS bucket FROM probes"
        for r in range(_CMS_DEPTH)
    )
    probe_list = ", ".join(f"'{p}'" for p in _CMS_PROBES)
    return f"""
WITH t AS (
  SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), words AS (
  SELECT unnest(string_split(nt, ' ')) AS word FROM t WHERE nt <> ''
), cells AS (
  {cell_rows}
), sk AS (
  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM cells GROUP BY 1, 2
), probes AS (
  SELECT unnest([{probe_list}]) AS term
), keys AS (
  {key_rows}
), est AS (
  SELECT term, MIN(COALESCE(sk.c, 0)) AS est_n
  FROM keys LEFT JOIN sk USING (r, bucket) GROUP BY term
), tr AS (
  SELECT word AS term, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM words WHERE word IN ({probe_list}) GROUP BY 1
)
SELECT est.term,
       CAST(COALESCE(tr.true_n, 0) AS BIGINT) AS true_n,
       CAST(est.est_n AS BIGINT) AS est_n
FROM est LEFT JOIN tr ON est.term = tr.term
"""


SQL_X35 = _sql_x35()


def q_x36_group_sample(spark, sf_dir):
    """Exactly-k-per-group deterministic sample
    (operators/mixing.py:sample_per_group): 20 documents per source by
    md5-hash rank — the mergeable bottom-k equivalent of per-group
    reservoir sampling."""
    from .operators.mixing import sample_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_per_group(
        docs.select("doc_id", "source"), ["source"], "doc_id", k=20
    )


SQL_X36 = """
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS hm
  FROM documents
), r AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY hm ASC, doc_id ASC
         ) AS BIGINT) AS sample_rank
  FROM h
)
SELECT doc_id, source, sample_rank FROM r WHERE sample_rank <= 20
"""


def q_x37_value_outliers(spark, sf_dir):
    """Per-type z-score outlier flagging
    (operators/behavior.py:value_outliers) — only the flagged rows, so
    the result is small and the broadcast-join + row-local arithmetic
    mechanism is what the oracle checks."""
    from .operators.behavior import value_outliers

    ev = _read_events(spark, sf_dir)
    out = value_outliers(ev, z_threshold=3.0)
    return out.where(F.col("is_outlier")).select(
        "event_id", "event_type", "value", "z", "is_outlier"
    )


SQL_X37 = """
WITH s AS (
  SELECT event_type, AVG(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY event_type
), z AS (
  SELECT e.event_id, e.event_type, e.value,
         ROUND((e.value - s.mu) / s.sigma, 6) AS z
  FROM events e JOIN s USING (event_type)
)
SELECT event_id, event_type, value, z, TRUE AS is_outlier
FROM z WHERE abs(z) > 3.0
"""


def q_x38_inter_arrival(spark, sf_dir):
    """Same-user inter-arrival gap quantiles per event type
    (operators/behavior.py:inter_arrival_quantiles): one
    (user, type)-keyed lag window feeding exact group quantiles."""
    from .operators.behavior import inter_arrival_quantiles

    ev = _read_events(spark, sf_dir)
    return inter_arrival_quantiles(ev, (0.5, 0.9))


# nearest-rank quantiles via explicit ceil(p*n) element selection —
# the IDENTICAL float expression the Spark operator uses, so both
# engines pick the same element; interpolated quantile_cont at
# ~4e11 µs magnitudes is not engine-reproducible (double ulp there
# exceeds the 6-dp rounding step)
SQL_X38 = """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts), event_id
         ) AS gap_us
  FROM events
), r AS (
  SELECT event_type, gap_us,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY gap_us ASC
         ) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM g WHERE gap_us IS NOT NULL
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(CAST(0.5 AS DOUBLE) * n)
                AS BIGINT) THEN gap_us END) AS BIGINT) AS p50,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(CAST(0.9 AS DOUBLE) * n)
                AS BIGINT) THEN gap_us END) AS BIGINT) AS p90
FROM r GROUP BY event_type
"""


def q_x39_term_pmi(spark, sf_dir):
    """Document-level PMI term associations
    (operators/text.py:term_cooccurrence_pmi): bounded per-doc pair
    generation (distinct terms capped at 50 by in-doc frequency),
    min_count=5 tail pruning, top-100 by PMI."""
    from .operators.text import term_cooccurrence_pmi

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return term_cooccurrence_pmi(
        docs, "text", "doc_id", min_count=5, max_terms_per_doc=50,
        top_n=100,
    )


SQL_X39 = """
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT doc_id, unnest(string_split(nt, ' ')) AS term
  FROM t WHERE nt <> ''
), pd AS (
  SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY 1, 2
), kept AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, term,
           ROW_NUMBER() OVER (
             PARTITION BY doc_id ORDER BY c DESC, term ASC
           ) AS rn
    FROM pd
  ) WHERE rn <= 50
), uni AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY 1
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
)
SELECT p.term_a, p.term_b, p.n_ab,
       ua.n AS n_a, ub.n AS n_b,
       ROUND(ln((SELECT COUNT(*) FROM documents) * p.n_ab
                / (ua.n * ub.n)), 6) AS pmi
FROM pairs p
JOIN uni ua ON p.term_a = ua.term
JOIN uni ub ON p.term_b = ub.term
ORDER BY pmi DESC, p.term_a ASC, p.term_b ASC LIMIT 100
"""


def q_x40_revenue_rollup(spark, sf_dir):
    """Hierarchical revenue rollup over the star schema
    (operators/olap.py:rollup_summary): lineitem facts with
    broadcast-joined supplier→nation→region dims, subtotals at
    (region, nation) / (region) / grand total in ONE Expand+hash-agg
    pass.  Decimal-cast sum for order-insensitive float stability
    (the x10 idiom)."""
    from .operators.olap import rollup_summary

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    na = spark.read.parquet(f"{sf_dir}/nation.parquet")
    re = spark.read.parquet(f"{sf_dir}/region.parquet")
    fact = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .withColumn(
            "__rev",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            ),
        )
    )
    return rollup_summary(
        fact,
        ["r_name", "n_name"],
        {
            "n_rows": F.count("*").cast("long"),
            "revenue": F.round(F.sum("__rev").cast("double"), 6),
        },
    )


SQL_X40 = """
SELECT r_name, n_name,
       CAST(GROUPING(r_name, n_name) AS BIGINT) AS grouping_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_x41_weighted_sample(spark, sf_dir):
    """Weighted k-per-group sample (operators/mixing.py:
    weighted_sample_per_group, Efraimidis-Spirakis keys): 15 docs per
    source weighted by n_chars.  The oracle recomputes the
    -ln(u)/w key exactly."""
    from .operators.mixing import weighted_sample_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return weighted_sample_per_group(
        docs.select("doc_id", "source", "n_chars"),
        ["source"], "doc_id", "n_chars", k=15,
    )


SQL_X41 = """
WITH h AS (
  SELECT doc_id, source, n_chars,
         -ln(('0x' || substr(md5('wmix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             / 4294967296.0 + 0.5 / 4294967296.0) / n_chars AS key
  FROM documents WHERE n_chars > 0
), r AS (
  SELECT doc_id, source, n_chars,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY key ASC, doc_id ASC
         ) AS BIGINT) AS sample_rank
  FROM h
)
SELECT doc_id, source, n_chars, sample_rank
FROM r WHERE sample_rank <= 15
"""


def q_x42_histogram(spark, sf_dir):
    """Per-type equi-width histogram of event values
    (operators/sketch.py:group_histogram): 20 bins over [0, 1000) with
    boundary clamping — one map-side bin assignment + one bounded
    hash aggregation."""
    from .operators.sketch import group_histogram

    ev = _read_events(spark, sf_dir)
    return group_histogram(
        ev, ["event_type"], "value", lo=0.0, hi=1000.0, bins=20
    )


SQL_X42 = """
WITH b AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 50.0), 0), 19)
              AS BIGINT) AS bin
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, bin,
       ROUND(0.0 + bin * 50.0, 6) AS bin_lo,
       ROUND(0.0 + (bin + 1) * 50.0, 6) AS bin_hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1, 2
"""


def q_x43_fuzzy_match(spark, sf_dir):
    """Blocked fuzzy self-match on part names
    (operators/linkage.py:fuzzy_self_pairs): head-noun blocking,
    length-band prune, Levenshtein ≤ 3."""
    from .operators.linkage import fuzzy_self_pairs

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return fuzzy_self_pairs(
        part.select("p_partkey", "p_name"), "p_name", "p_partkey",
        max_distance=3,
    )


SQL_X43 = """
WITH base AS (
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
)
SELECT a.id AS id_a, b.id AS id_b,
       a.text AS text_a, b.text AS text_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS distance
FROM capped a JOIN capped b
  ON a.bk = b.bk AND a.id < b.id AND abs(a.len - b.len) <= 3
WHERE levenshtein(a.text, b.text) <= 3
"""


def q_x44_winsorize(spark, sf_dir):
    """Per-type quantile winsorization (operators/sketch.py:
    winsorize): clip event values into [p01, p99]; only clipped rows
    returned so the result is small."""
    from .operators.sketch import winsorize

    ev = _read_events(spark, sf_dir)
    out = winsorize(ev, ["event_type"], "value")
    return out.where(F.col("clipped")).select(
        "event_id", "event_type", "value", "value_w", "clipped"
    )


SQL_X44 = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS lo,
         quantile_cont(value, 0.99) AS hi
  FROM events GROUP BY event_type
), w AS (
  SELECT e.event_id, e.event_type, e.value,
         ROUND(LEAST(GREATEST(e.value, b.lo), b.hi), 6) AS value_w,
         (e.value < b.lo OR e.value > b.hi) AS clipped
  FROM events e JOIN b USING (event_type)
  WHERE e.value IS NOT NULL
)
SELECT event_id, event_type, value, value_w, clipped
FROM w WHERE clipped
"""


def q_x45_gap_fill(spark, sf_dir):
    """Dense per-user daily grid with forward fill
    (operators/temporal.py:fill_gaps_daily): scaffold each user's
    activity span, carry the day-close value across gap days."""
    from .operators.temporal import fill_gaps_daily

    ev = _read_events(spark, sf_dir)
    return fill_gaps_daily(ev).withColumnRenamed("entity", "user_id")


SQL_X45 = """
WITH e AS (
  SELECT user_id, event_id, value,
         epoch_us(ts) AS ts_us,
         epoch_us(ts) // 86400000000 AS day
  FROM events
), closing AS (
  SELECT user_id, day, value AS day_close FROM (
    SELECT user_id, day, value,
           ROW_NUMBER() OVER (
             PARTITION BY user_id, day
             ORDER BY ts_us DESC, event_id DESC
           ) AS rn
    FROM e
  ) WHERE rn = 1
), span AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM e GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM span
)
SELECT g.user_id, g.day,
       LAST_VALUE(c.day_close IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_filled,
       c.day_close IS NOT NULL AS is_observed
FROM grid g LEFT JOIN closing c
  ON g.user_id = c.user_id AND g.day = c.day
"""


def q_x46_pivot(spark, sf_dir):
    """Explicit-value cross-tab (sources/reshape.py:pivot_table):
    per-weekday event counts and value sums per event type — one hash
    aggregation, static schema, no pivot-inference job."""
    from .sources.reshape import pivot_table

    ev = _read_events(spark, sf_dir)
    # ISO weekday 1..7 from the µs epoch (1970-01-01 was a Thursday=4)
    ev = ev.withColumn(
        "weekday", (F.expr("ts_us div 86400000000") + 3) % 7 + 1
    )
    counts = pivot_table(
        ev, ["event_type"], "weekday", [1, 2, 3, 4, 5, 6, 7]
    )
    sums = pivot_table(
        ev, ["event_type"], "weekday", [6, 7], "value", agg="sum"
    )
    sums = sums.select(
        "event_type",
        F.col("weekday_6").alias("wknd_sat_value"),
        F.col("weekday_7").alias("wknd_sun_value"),
    )
    return counts.join(sums, on="event_type")


SQL_X46 = """
WITH e AS (
  SELECT event_type, value,
         (epoch_us(ts) // 86400000000 + 3) % 7 + 1 AS weekday
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN weekday = 1 THEN 1 ELSE 0 END) AS BIGINT) AS weekday_1,
       CAST(SUM(CASE WHEN weekday = 2 THEN 1 ELSE 0 END) AS BIGINT) AS weekday_2,
       CAST(SUM(CASE WHEN weekday = 3 THEN 1 ELSE 0 END) AS BIGINT) AS weekday_3,
       CAST(SUM(CASE WHEN weekday = 4 THEN 1 ELSE 0 END) AS BIGINT) AS weekday_4,
       CAST(SUM(CASE WHEN weekday = 5 THEN 1 ELSE 0 END) AS BIGINT) AS weekday_5,
       CAST(SUM(CASE WHEN weekday = 6 THEN 1 ELSE 0 END) AS BIGINT) AS weekday_6,
       CAST(SUM(CASE WHEN weekday = 7 THEN 1 ELSE 0 END) AS BIGINT) AS weekday_7,
       ROUND(CAST(SUM(CASE WHEN weekday = 6
                           THEN CAST(value AS DECIMAL(18,6)) END)
                  AS DOUBLE), 6) AS wknd_sat_value,
       ROUND(CAST(SUM(CASE WHEN weekday = 7
                           THEN CAST(value AS DECIMAL(18,6)) END)
                  AS DOUBLE), 6) AS wknd_sun_value
FROM e GROUP BY event_type
"""


def q_x47_attribution(spark, sf_dir):
    """Last-touch attribution (operators/behavior.py:
    last_touch_attribution, composed from temporal.asof_join):
    purchases credited to the same user's most recent click within
    3 days."""
    from .operators.behavior import last_touch_attribution

    ev = _read_events(spark, sf_dir)
    return last_touch_attribution(ev, lookback_us=3 * 86_400_000_000)


SQL_X47 = """
WITH c AS (
  SELECT user_id, event_id AS conversion_id, epoch_us(ts) AS conv_ts_us
  FROM events WHERE event_type = 'purchase'
), k AS (
  SELECT user_id, event_id AS touch_id, epoch_us(ts) AS touch_ts_us
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT c.user_id, c.conversion_id, c.conv_ts_us,
         k.touch_id, k.touch_ts_us,
         ROW_NUMBER() OVER (
           PARTITION BY c.conversion_id
           ORDER BY k.touch_ts_us DESC NULLS LAST,
                    k.touch_id DESC NULLS LAST
         ) AS rn
  FROM c LEFT JOIN k
    ON c.user_id = k.user_id
   AND k.touch_ts_us <= c.conv_ts_us
   AND c.conv_ts_us - k.touch_ts_us <= 259200000000
)
SELECT user_id, conversion_id, conv_ts_us, touch_id, touch_ts_us,
       touch_id IS NOT NULL AS attributed
FROM j WHERE rn = 1
"""


def q_x48_group_ranks(spark, sf_dir):
    """Per-type percent-rank / empirical CDF / deciles
    (operators/ranking.py:group_ranks) over event values, event_id as
    the ntile tie-break."""
    from .operators.ranking import group_ranks

    ev = _read_events(spark, sf_dir)
    return group_ranks(
        ev.select("event_id", "event_type", "value"),
        ["event_type"], "value", "event_id",
    )


SQL_X48 = """
SELECT event_id, event_type, value,
       ROUND(PERCENT_RANK() OVER (
         PARTITION BY event_type ORDER BY value ASC
       ), 6) AS pct_rank,
       ROUND(CUME_DIST() OVER (
         PARTITION BY event_type ORDER BY value ASC
       ), 6) AS cdf,
       CAST(NTILE(10) OVER (
         PARTITION BY event_type ORDER BY value ASC, event_id ASC
       ) AS BIGINT) AS bucket
FROM events
"""


def q_x49_session_paths(spark, sf_dir):
    """Top session-opening paths (operators/behavior.py:
    top_session_paths): 30-min-gap sessions, first 5 event types as a
    '>'-joined path, top 50 by frequency."""
    from .operators.behavior import top_session_paths

    ev = _read_events(spark, sf_dir)
    return top_session_paths(ev)


SQL_X49 = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
  FROM events
), s AS (
  SELECT user_id, event_id, event_type, ts_us,
         CASE WHEN LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sid AS (
  SELECT user_id, event_id, event_type, ts_us,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM s
), paths AS (
  SELECT array_to_string(
           (list(event_type ORDER BY ts_us, event_id))[1:5], '>'
         ) AS path
  FROM sid GROUP BY user_id, session_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC LIMIT 50
"""


def q_x50_surprisal(spark, sf_dir):
    """Per-document mean unigram surprisal
    (operators/text.py:unigram_surprisal) — the self-contained
    perplexity-style curation signal."""
    from .operators.text import unigram_surprisal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return unigram_surprisal(docs, "text", "doc_id")


SQL_X50 = """
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT doc_id, unnest(string_split(nt, ' ')) AS term
  FROM t WHERE nt <> ''
), freq AS (
  SELECT term, COUNT(*) AS n FROM toks GROUP BY term
), tot AS (
  SELECT SUM(n) AS total FROM freq
)
SELECT toks.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(-log2(freq.n / tot.total)), 6) AS mean_surprisal
FROM toks JOIN freq USING (term), tot
GROUP BY toks.doc_id
"""


def q_x51_mad_outliers(spark, sf_dir):
    """Robust MAD outlier flagging (operators/sketch.py:mad_outliers):
    modified z-test per event type; only flagged rows returned."""
    from .operators.sketch import mad_outliers

    ev = _read_events(spark, sf_dir)
    out = mad_outliers(ev, ["event_type"], "value", threshold=3.5)
    return out.where(F.col("is_outlier")).select(
        "event_id", "event_type", "value", "robust_z", "is_outlier"
    )


SQL_X51 = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, med.med,
         quantile_cont(abs(e.value - med.med), 0.5) AS mad
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type, med.med
), z AS (
  SELECT e.event_id, e.event_type, e.value,
         ROUND(0.6745 * (e.value - mad.med) / mad.mad, 6) AS robust_z
  FROM events e JOIN mad USING (event_type)
  WHERE e.value IS NOT NULL AND mad.mad > 0
)
SELECT event_id, event_type, value, robust_z, TRUE AS is_outlier
FROM z WHERE abs(robust_z) > 3.5
"""


def q_x52_source_overlap(spark, sf_dir):
    """Cross-source duplicate-overlap matrix
    (operators/dedup.py:source_overlap): pairwise Jaccard/containment
    of distinct content fingerprints between sources."""
    from .operators.dedup import source_overlap

    docs = _docs_with_recrawls(spark, sf_dir)
    return source_overlap(docs, "text", "source")


SQL_X52 = f"""
WITH sets AS (
  SELECT DISTINCT source AS g,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM {SQL_RECRAWL_DOCS} d
), sizes AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM sets GROUP BY g
), common AS (
  SELECT a.g AS group_a, b.g AS group_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sets a JOIN sets b ON a.fp = b.fp AND a.g < b.g
  GROUP BY 1, 2
)
SELECT c.group_a, c.group_b, sa.n AS n_a, sb.n AS n_b, c.n_common,
       ROUND(CAST(c.n_common AS DOUBLE)
             / (sa.n + sb.n - c.n_common), 6) AS jaccard,
       ROUND(CAST(c.n_common AS DOUBLE) / sa.n, 6) AS containment_a,
       ROUND(CAST(c.n_common AS DOUBLE) / sb.n, 6) AS containment_b
FROM common c
JOIN sizes sa ON c.group_a = sa.g
JOIN sizes sb ON c.group_b = sb.g
"""


def q_x53_corr(spark, sf_dir):
    """Per-returnflag Pearson correlations over lineitem numerics
    (operators/sketch.py:corr_pairs) via order-insensitive decimal
    moment sums."""
    from .operators.sketch import corr_pairs

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return corr_pairs(
        li, ["l_returnflag"], ["l_quantity", "l_extendedprice", "l_discount"]
    )


SQL_X53 = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(l_quantity AS DECIMAL(28,6))) AS s_q,
         SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS s_p,
         SUM(CAST(l_discount AS DECIMAL(28,6))) AS s_d,
         SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS s_qp,
         SUM(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS s_qd,
         SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS s_pd,
         SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS s_qq,
         SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS s_pp,
         SUM(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS s_dd
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, n,
       ROUND((n * s_qp::DOUBLE - s_q::DOUBLE * s_p::DOUBLE)
             / sqrt((n * s_qq::DOUBLE - s_q::DOUBLE * s_q::DOUBLE)
                    * (n * s_pp::DOUBLE - s_p::DOUBLE * s_p::DOUBLE)), 6)
         AS corr
FROM m
UNION ALL
SELECT l_returnflag, 'l_quantity', 'l_discount', n,
       ROUND((n * s_qd::DOUBLE - s_q::DOUBLE * s_d::DOUBLE)
             / sqrt((n * s_qq::DOUBLE - s_q::DOUBLE * s_q::DOUBLE)
                    * (n * s_dd::DOUBLE - s_d::DOUBLE * s_d::DOUBLE)), 6)
FROM m
UNION ALL
SELECT l_returnflag, 'l_extendedprice', 'l_discount', n,
       ROUND((n * s_pd::DOUBLE - s_p::DOUBLE * s_d::DOUBLE)
             / sqrt((n * s_pp::DOUBLE - s_p::DOUBLE * s_p::DOUBLE)
                    * (n * s_dd::DOUBLE - s_d::DOUBLE * s_d::DOUBLE)), 6)
FROM m
"""


def q_x54_time_weighted_avg(spark, sf_dir):
    """Per-user time-weighted average event value under hold-last
    semantics (operators/temporal.py:time_weighted_avg)."""
    from .operators.temporal import time_weighted_avg

    ev = _read_events(spark, sf_dir)
    return time_weighted_avg(ev).withColumnRenamed("entity", "user_id")


SQL_X54 = """
WITH w AS (
  SELECT user_id, value,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) - epoch_us(ts) AS dt
  FROM events
)
SELECT user_id,
       CAST(COUNT(dt) AS BIGINT) AS n_intervals,
       CAST(COALESCE(SUM(dt), 0) AS BIGINT) AS span_us,
       ROUND(CAST(SUM(CAST(value * dt AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(SUM(CAST(dt AS DECIMAL(28,6))) AS DOUBLE), 6) AS twa
FROM w GROUP BY user_id
"""


def q_x55_skew_profile(spark, sf_dir):
    """Shuffle-key skew diagnostic (operators/sketch.py:skew_profile):
    top suppliers by lineitem count + Gini concentration of the full
    key distribution."""
    from .operators.sketch import skew_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return skew_profile(li, ["l_suppkey"], top_k=10)


SQL_X55 = """
WITH counts AS (
  SELECT CAST(l_suppkey AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
), idx AS (
  SELECT key, n, ROW_NUMBER() OVER (ORDER BY n ASC, key ASC) AS i
  FROM counts
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(n) AS DOUBLE) AS tot,
         ROUND(2.0 * CAST(SUM(i * n) AS DOUBLE)
                 / (COUNT(*) * CAST(SUM(n) AS DOUBLE))
               - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
  FROM idx
), top AS (
  SELECT key, n,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key ASC) AS BIGINT)
           AS rank
  FROM counts
)
SELECT top.rank, top.key, top.n,
       ROUND(top.n / g.tot, 6) AS share, g.n_keys, g.gini
FROM top, g WHERE top.rank <= 10
"""


def q_x56_canonical_urls(spark, sf_dir):
    """Canonical-URL reference counts
    (operators/web.py:canonical_url_counts): scheme/www/port/tracking-
    param/fragment-insensitive outbound-link dedup, top 100.  The
    round-3 corpus carries no URLs, so each document gets a
    deterministic outbound link (source-keyed host, id-keyed page,
    alternating tracking params) — canonicalization must collapse the
    utm variants onto one canonical per (source, page)."""
    from .operators.web import canonical_url_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    linked = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" https://www."),
            F.col("source"),
            F.lit(".example.com/page/"),
            (F.col("doc_id") % 5).cast("string"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("?utm_source=feed")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return canonical_url_counts(linked, "text", top_n=100)


SQL_X56 = """
WITH linked AS (
  SELECT text || ' https://www.' || source || '.example.com/page/'
           || CAST(doc_id % 5 AS VARCHAR)
           || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed'
                   ELSE '' END AS text
  FROM documents
), u AS (
  SELECT unnest(regexp_extract_all(
           text, 'https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\\s]*)?', 0
         )) AS url
  FROM linked
), parts AS (
  SELECT
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, 'https?://([^/?#]+)', 1)),
        '^www\\.', ''),
      ':(80|443)$', '') AS host,
    regexp_replace(
      regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1), '/+$', ''
    ) AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM u
), canon AS (
  SELECT host || path ||
         CASE WHEN len(list_filter(string_split(query, '&'),
                p -> p <> '' AND NOT regexp_matches(
                  p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid)='))) > 0
              THEN '?' || array_to_string(
                list_filter(string_split(query, '&'),
                  p -> p <> '' AND NOT regexp_matches(
                    p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid)=')), '&')
              ELSE '' END AS canonical_url
  FROM parts
)
SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_refs
FROM canon WHERE canonical_url <> ''
GROUP BY canonical_url
ORDER BY n_refs DESC, canonical_url ASC LIMIT 100
"""


def q_x57_entropy(spark, sf_dir):
    """Per-user event-type Shannon entropy
    (operators/sketch.py:group_entropy) — behavioral diversity."""
    from .operators.sketch import group_entropy

    ev = _read_events(spark, sf_dir)
    return group_entropy(ev, ["user_id"], "event_type")


SQL_X57 = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
), t AS (
  SELECT user_id, SUM(c) AS tot FROM c GROUP BY 1
)
SELECT c.user_id, CAST(t.tot AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(SUM(-(c.c / t.tot) * log2(c.c / t.tot)), 6) AS entropy
FROM c JOIN t USING (user_id) GROUP BY c.user_id, t.tot
"""


#: x58 cutoff — 2024-01-16 00:00 UTC in epoch µs (events span January)
_X58_CUTOFF_US = 1_705_363_200_000_000


def q_x58_drift(spark, sf_dir):
    """Value-distribution drift (operators/sketch.py:
    distribution_drift): PSI between the first and second half of the
    event month over the x42 histogram bins."""
    from .operators.sketch import distribution_drift

    ev = _read_events(spark, sf_dir)
    a = ev.where(F.col("ts_us") < _X58_CUTOFF_US)
    b = ev.where(F.col("ts_us") >= _X58_CUTOFF_US)
    return distribution_drift(a, b, "value", lo=0.0, hi=1000.0, bins=10)


SQL_X58 = f"""
WITH ha AS (
  SELECT CAST(LEAST(GREATEST(FLOOR(value / 100.0), 0), 9) AS BIGINT)
           AS bin, COUNT(*) AS n_a
  FROM events
  WHERE value IS NOT NULL AND epoch_us(ts) < {_X58_CUTOFF_US}
  GROUP BY 1
), hb AS (
  SELECT CAST(LEAST(GREATEST(FLOOR(value / 100.0), 0), 9) AS BIGINT)
           AS bin, COUNT(*) AS n_b
  FROM events
  WHERE value IS NOT NULL AND epoch_us(ts) >= {_X58_CUTOFF_US}
  GROUP BY 1
), j AS (
  SELECT COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
  FROM ha FULL JOIN hb USING (bin)
), t AS (
  SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM j
)
SELECT CAST(t.ta AS BIGINT) AS n_a, CAST(t.tb AS BIGINT) AS n_b,
       ROUND(SUM((GREATEST(j.n_a / t.ta, 1e-6)
                  - GREATEST(j.n_b / t.tb, 1e-6))
                 * ln(GREATEST(j.n_a / t.ta, 1e-6)
                      / GREATEST(j.n_b / t.tb, 1e-6))), 6) AS psi
FROM j, t GROUP BY t.ta, t.tb
"""


def q_x59_mutual_info(spark, sf_dir):
    """Mutual information between event type and weekday
    (operators/sketch.py:mutual_information) — nonlinear dependence
    screen from one joint-count aggregation."""
    from .operators.sketch import mutual_information

    ev = _read_events(spark, sf_dir)
    ev = ev.withColumn(
        "weekday", (F.expr("ts_us div 86400000000") + 3) % 7 + 1
    )
    return mutual_information(ev, "event_type", "weekday")


SQL_X59 = """
WITH pairs AS (
  SELECT event_type AS a,
         (epoch_us(ts) // 86400000000 + 3) % 7 + 1 AS b,
         COUNT(*) AS c
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
), tot AS (SELECT SUM(c) AS t FROM pairs),
hab AS (
  SELECT SUM(-(c / tot.t) * log2(c / tot.t)) AS h_ab FROM pairs, tot
), ma AS (SELECT a, SUM(c) AS c FROM pairs GROUP BY a),
ha AS (SELECT SUM(-(c / tot.t) * log2(c / tot.t)) AS h_a FROM ma, tot),
mb AS (SELECT b, SUM(c) AS c FROM pairs GROUP BY b),
hb AS (SELECT SUM(-(c / tot.t) * log2(c / tot.t)) AS h_b FROM mb, tot)
SELECT CAST(tot.t AS BIGINT) AS n,
       ROUND(ha.h_a, 6) AS h_a, ROUND(hb.h_b, 6) AS h_b,
       ROUND(hab.h_ab, 6) AS h_ab,
       ROUND(ha.h_a + hb.h_b - hab.h_ab, 6) AS mi,
       ROUND((ha.h_a + hb.h_b - hab.h_ab)
             / GREATEST(ha.h_a, hb.h_b), 6) AS nmi
FROM tot, ha, hb, hab
"""


def q_x60_benford(spark, sf_dir):
    """Benford first-digit profile of lineitem extended prices
    (operators/sketch.py:benford_profile)."""
    from .operators.sketch import benford_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return benford_profile(li, "l_extendedprice")


SQL_X60 = """
WITH d AS (
  SELECT CAST(substr(
           regexp_replace(printf('%.10f', abs(l_extendedprice)),
                          '[0.]', '', 'g'), 1, 1) AS BIGINT) AS digit
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_extendedprice <> 0
), counts AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
  FROM d WHERE digit IS NOT NULL AND digit > 0 GROUP BY digit
), tot AS (SELECT SUM(n) AS t FROM counts)
SELECT digit, n,
       ROUND(n / tot.t, 6) AS share,
       ROUND(log10(1.0 + 1.0 / digit), 6) AS expected,
       ROUND(n / tot.t - log10(1.0 + 1.0 / digit), 6) AS deviation
FROM counts, tot
"""


def q_x61_js_divergence(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between sources' unigram
    distributions (operators/text.py:source_js_divergence)."""
    from .operators.text import source_js_divergence

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return source_js_divergence(docs, "text", "source")


SQL_X61 = """
WITH t AS (
  SELECT source AS g,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT g, unnest(string_split(nt, ' ')) AS term FROM t WHERE nt <> ''
), c AS (
  SELECT g, term, COUNT(*) AS c FROM toks GROUP BY 1, 2
), tot AS (
  SELECT g, SUM(c) AS t FROM c GROUP BY 1
), sh AS (
  SELECT c.g, c.term, c.c / tot.t AS p FROM c JOIN tot USING (g)
), pairs AS (
  SELECT a.g AS group_a, b.g AS group_b, a.p AS pa, b.p AS pb
  FROM sh a JOIN sh b ON a.term = b.term AND a.g < b.g
)
SELECT group_a, group_b,
       ROUND(SUM(0.5 * pa * log2(pa / ((pa + pb) / 2))
                 + 0.5 * pb * log2(pb / ((pa + pb) / 2)))
             + 0.5 * (1 - SUM(pa)) + 0.5 * (1 - SUM(pb)), 6) AS jsd
FROM pairs GROUP BY group_a, group_b
"""


def q_x62_streaks(spark, sf_dir):
    """Longest consecutive-active-day streaks per user
    (operators/behavior.py:activity_streaks, gaps-and-islands)."""
    from .operators.behavior import activity_streaks

    ev = _read_events(spark, sf_dir)
    return activity_streaks(ev).withColumnRenamed("user", "user_id")


SQL_X62 = """
WITH days AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS day
  FROM events
), isl AS (
  SELECT u, day,
         day - ROW_NUMBER() OVER (PARTITION BY u ORDER BY day)
           AS island
  FROM days
), streaks AS (
  SELECT u, island, CAST(COUNT(*) AS BIGINT) AS len,
         MAX(day) AS end_day
  FROM isl GROUP BY u, island
)
SELECT u AS user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(MAX(end_day) AS BIGINT) AS current_streak_end
FROM streaks GROUP BY u
"""


def q_x63_weighted_quantiles(spark, sf_dir):
    """Token-weighted document-length quantiles per source
    (operators/sketch.py:weighted_quantiles): n_chars weighted by
    itself — 'the char count of the char-median document'."""
    from .operators.sketch import weighted_quantiles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return weighted_quantiles(
        docs, ["source"], "n_chars", "n_chars", [0.5, 0.9]
    )


SQL_X63 = """
WITH f AS (
  SELECT source, n_chars AS v, n_chars AS w
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
), s AS (
  SELECT source, v, w,
         SUM(w) OVER (
           PARTITION BY source ORDER BY v ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cw,
         SUM(w) OVER (PARTITION BY source) AS tw
  FROM f
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(MAX(tw), 6) AS DOUBLE) AS w_total,
       CAST(ROUND(MIN(CASE WHEN cw >= 0.5 * tw THEN v END), 6)
            AS DOUBLE) AS p50,
       CAST(ROUND(MIN(CASE WHEN cw >= 0.9 * tw THEN v END), 6)
            AS DOUBLE) AS p90
FROM s GROUP BY source
"""


def q_x64_ks(spark, sf_dir):
    """Two-sample KS statistic (operators/sketch.py:ks_statistic)
    between first- and second-half-of-month event values — the
    binless complement to the x58 PSI."""
    from .operators.sketch import ks_statistic

    ev = _read_events(spark, sf_dir)
    a = ev.where(F.col("ts_us") < _X58_CUTOFF_US)
    b = ev.where(F.col("ts_us") >= _X58_CUTOFF_US)
    return ks_statistic(a, b, "value")


SQL_X64 = f"""
WITH ca AS (
  SELECT value AS v, COUNT(*) AS na FROM events
  WHERE value IS NOT NULL AND epoch_us(ts) < {_X58_CUTOFF_US}
  GROUP BY 1
), cb AS (
  SELECT value AS v, COUNT(*) AS nb FROM events
  WHERE value IS NOT NULL AND epoch_us(ts) >= {_X58_CUTOFF_US}
  GROUP BY 1
), pooled AS (
  SELECT v, COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
  FROM ca FULL JOIN cb USING (v)
), ecdf AS (
  SELECT SUM(na) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
         SUM(nb) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb
  FROM pooled
), tot AS (
  SELECT SUM(na) AS ta, SUM(nb) AS tb FROM pooled
)
SELECT CAST(tot.ta AS BIGINT) AS n_a, CAST(tot.tb AS BIGINT) AS n_b,
       ROUND(MAX(abs(ecdf.cca / tot.ta - ecdf.ccb / tot.tb)), 6) AS ks
FROM ecdf, tot GROUP BY tot.ta, tot.tb
"""


def q_x65_trend(spark, sf_dir):
    """Per-user linear value trend over day index
    (operators/temporal.py:group_trend, exact decimal moments)."""
    from .operators.temporal import group_trend

    ev = _read_events(spark, sf_dir)
    return group_trend(ev).withColumnRenamed("entity", "user_id")


SQL_X65 = """
WITH s AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS x, value AS y
  FROM events WHERE value IS NOT NULL
), m AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy
  FROM s GROUP BY user_id
)
SELECT user_id, n,
       ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6)
         AS slope_per_day,
       ROUND((sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)
                   * sx) / n, 6) AS intercept,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6)
         AS r2
FROM m
"""


def q_x66_ab_test(spark, sf_dir):
    """Hash-split two-proportion conversion z-test
    (operators/behavior.py:ab_conversion_test) — an A/A test on the
    deterministic 50/50 user split."""
    from .operators.behavior import ab_conversion_test

    ev = _read_events(spark, sf_dir)
    return ab_conversion_test(ev)


SQL_X66 = """
WITH pu AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), v AS (
  SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT / 4294967296.0 < 0.5
              THEN 'a' ELSE 'b' END AS variant,
         conv
  FROM pu
), agg AS (
  SELECT SUM(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN variant = 'a' THEN conv ELSE 0 END) AS conv_a,
         SUM(CASE WHEN variant = 'b' THEN conv ELSE 0 END) AS conv_b
  FROM v
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
       ROUND(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
       ROUND(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
       ROUND((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
             / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z
FROM agg
"""


def q_x67_survival(spark, sf_dir):
    """Lifetime survival function over 0..30 day offsets
    (operators/behavior.py:survival_curve)."""
    from .operators.behavior import survival_curve

    ev = _read_events(spark, sf_dir)
    return survival_curve(ev, max_days=30)


SQL_X67 = """
WITH lt AS (
  SELECT user_id,
         MAX(epoch_us(ts) // 86400000000)
           - MIN(epoch_us(ts) // 86400000000) AS lifetime
  FROM events GROUP BY user_id
), t AS (
  SELECT COUNT(*) AS total FROM lt
), d AS (
  SELECT unnest(generate_series(0, 30)) AS day_offset
)
SELECT d.day_offset,
       CAST(SUM(CASE WHEN lt.lifetime >= d.day_offset THEN 1 ELSE 0 END)
            AS BIGINT) AS n_surviving,
       ROUND(SUM(CASE WHEN lt.lifetime >= d.day_offset THEN 1 ELSE 0 END)
             / CAST(t.total AS DOUBLE), 6) AS survival
FROM d CROSS JOIN lt CROSS JOIN t
GROUP BY d.day_offset, t.total
"""


def q_x68_trimmed_mean(spark, sf_dir):
    """Per-type 5–95% trimmed mean of event values
    (operators/sketch.py:trimmed_mean)."""
    from .operators.sketch import trimmed_mean

    ev = _read_events(spark, sf_dir)
    return trimmed_mean(ev, ["event_type"], "value")


SQL_X68 = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(e.value) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN e.value >= b.lo AND e.value <= b.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(CAST(SUM(CASE WHEN e.value >= b.lo AND e.value <= b.hi
                           THEN CAST(e.value AS DECIMAL(28,6)) END)
                  AS DOUBLE)
             / SUM(CASE WHEN e.value >= b.lo AND e.value <= b.hi
                        THEN 1 ELSE 0 END), 6) AS trimmed_mean
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type
"""


def q_x69_cusum(spark, sf_dir):
    """Per-user CUSUM changepoint scan
    (operators/temporal.py:cusum_scan)."""
    from .operators.temporal import cusum_scan

    ev = _read_events(spark, sf_dir)
    return cusum_scan(ev).withColumnRenamed("entity", "user_id")


SQL_X69 = """
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE value IS NOT NULL
), mu AS (
  SELECT user_id, AVG(value) AS mu FROM s GROUP BY user_id
), cur AS (
  SELECT s.user_id, s.ts_us,
         ROW_NUMBER() OVER w AS idx,
         SUM(s.value - mu.mu) OVER (
           PARTITION BY s.user_id ORDER BY s.ts_us, s.event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cusum,
         COUNT(*) OVER (PARTITION BY s.user_id) AS n
  FROM s JOIN mu USING (user_id)
  WINDOW w AS (PARTITION BY s.user_id ORDER BY s.ts_us, s.event_id)
), peak AS (
  SELECT user_id, n, ts_us, idx, cusum,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY abs(cusum) DESC, idx ASC
         ) AS rn
  FROM cur
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       ROUND(abs(cusum), 6) AS max_abs_cusum,
       CAST(idx AS BIGINT) AS change_idx,
       CAST(ts_us AS BIGINT) AS change_ts
FROM peak WHERE rn = 1
"""


def q_x70_autocorr(spark, sf_dir):
    """Per-user lag-1 autocorrelation of event values
    (operators/temporal.py:autocorrelation, exact decimal moments)."""
    from .operators.temporal import autocorrelation

    ev = _read_events(spark, sf_dir)
    return autocorrelation(ev, lag=1).withColumnRenamed(
        "entity", "user_id"
    )


SQL_X70 = """
WITH s AS (
  SELECT user_id,
         value AS y,
         LAG(value) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS x
  FROM events WHERE value IS NOT NULL
), p AS (
  SELECT user_id, x, y FROM s WHERE x IS NOT NULL
), m AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy
  FROM p GROUP BY user_id
)
SELECT user_id, n_pairs,
       ROUND((n_pairs * sxy - sx * sy)
             / NULLIF(sqrt((n_pairs * sxx - sx * sx)
                           * (n_pairs * syy - sy * sy)), 0), 6) AS acf
FROM m
"""


def q_x71_concentration(spark, sf_dir):
    """Supplier revenue concentration per nation
    (operators/sketch.py:concentration_index): HHI over supplier
    revenue shares, dims broadcast onto the lineitem facts."""
    from .operators.sketch import concentration_index

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    na = spark.read.parquet(f"{sf_dir}/nation.parquet")
    fact = li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey).join(
        F.broadcast(na), su.s_nationkey == na.n_nationkey
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return concentration_index(fact, ["n_name"], "s_suppkey", rev)


SQL_X71 = """
WITH pm AS (
  SELECT n_name, s_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(28,6))) AS w
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2
), sh AS (
  SELECT n_name,
         CAST(w AS DOUBLE)
           / CAST(SUM(w) OVER (PARTITION BY n_name) AS DOUBLE) AS s
  FROM pm
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       ROUND(CAST(SUM(CAST(s * s AS DECIMAL(28,18))) AS DOUBLE), 6) AS hhi,
       ROUND(MAX(s), 6) AS top_share
FROM sh GROUP BY n_name
"""


EXT_QUERIES = {
    "x01_dedup_exact": q_x01_dedup_exact,
    "x02_dedup_near_charset": q_x02_dedup_near_charset,
    "x03_dedup_minhash_lsh": q_x03_dedup_minhash_lsh,
    "x04_simhash_signatures": q_x04_simhash_signatures,
    "x05_similarity_topk": q_x05_similarity_topk,
    "x05b_similarity_lsh": q_x05b_similarity_lsh,
    "x05c_similarity_ivf": q_x05c_similarity_ivf,
    "x06_text_profile": q_x06_text_profile,
    "x07_embedding_neardup": q_x07_embedding_neardup,
    "x08_ngram_jaccard": q_x08_ngram_jaccard,
    "x09_dedup_clusters": q_x09_dedup_clusters,
    "x10_events_hourly": q_x10_events_hourly,
    "x11_events_sessions": q_x11_events_sessions,
    "x12_multimodal_binary": q_x12_multimodal_binary,
    "x13_tfidf_top_terms": q_x13_tfidf_top_terms,
    "x14_curation_pipeline": q_x14_curation_pipeline,
    "x15_running_totals": q_x15_running_totals,
    "x16_gopher_filter": q_x16_gopher_filter,
    "x17_corpus_mixing": q_x17_corpus_mixing,
    "x18_token_shards": q_x18_token_shards,
    "x19_decontamination": q_x19_decontamination,
    "x20_pii_scrub": q_x20_pii_scrub,
    "x21_passage_dedup": q_x21_passage_dedup,
    "x22_embedding_quantize": q_x22_embedding_quantize,
    "x23_url_domains": q_x23_url_domains,
    "x24_stream_join": q_x24_stream_join,
    "x25_asof_join": q_x25_asof_join,
    "x26_range_join": q_x26_range_join,
    "x27_doc_chunks": q_x27_doc_chunks,
    "x28_context_windows": q_x28_context_windows,
    "x29_kmv_distinct": q_x29_kmv_distinct,
    "x30_group_quantiles": q_x30_group_quantiles,
    "x31_funnel": q_x31_funnel,
    "x32_cohort_retention": q_x32_cohort_retention,
    "x33_bm25": q_x33_bm25,
    "x34_event_transitions": q_x34_event_transitions,
    "x35_countmin": q_x35_countmin,
    "x36_group_sample": q_x36_group_sample,
    "x37_value_outliers": q_x37_value_outliers,
    "x38_inter_arrival": q_x38_inter_arrival,
    "x39_term_pmi": q_x39_term_pmi,
    "x40_revenue_rollup": q_x40_revenue_rollup,
    "x41_weighted_sample": q_x41_weighted_sample,
    "x42_histogram": q_x42_histogram,
    "x43_fuzzy_match": q_x43_fuzzy_match,
    "x44_winsorize": q_x44_winsorize,
    "x45_gap_fill": q_x45_gap_fill,
    "x46_pivot": q_x46_pivot,
    "x47_attribution": q_x47_attribution,
    "x48_group_ranks": q_x48_group_ranks,
    "x49_session_paths": q_x49_session_paths,
    "x50_surprisal": q_x50_surprisal,
    "x51_mad_outliers": q_x51_mad_outliers,
    "x52_source_overlap": q_x52_source_overlap,
    "x53_corr": q_x53_corr,
    "x54_time_weighted_avg": q_x54_time_weighted_avg,
    "x55_skew_profile": q_x55_skew_profile,
    "x56_canonical_urls": q_x56_canonical_urls,
    "x57_entropy": q_x57_entropy,
    "x58_drift": q_x58_drift,
    "x59_mutual_info": q_x59_mutual_info,
    "x60_benford": q_x60_benford,
    "x61_js_divergence": q_x61_js_divergence,
    "x62_streaks": q_x62_streaks,
    "x63_weighted_quantiles": q_x63_weighted_quantiles,
    "x64_ks": q_x64_ks,
    "x65_trend": q_x65_trend,
    "x66_ab_test": q_x66_ab_test,
    "x67_survival": q_x67_survival,
    "x68_trimmed_mean": q_x68_trimmed_mean,
    "x69_cusum": q_x69_cusum,
    "x70_autocorr": q_x70_autocorr,
    "x71_concentration": q_x71_concentration,
}

EXT_ORACLES = {
    "x01_dedup_exact": SQL_X01,
    "x02_dedup_near_charset": SQL_X02,
    "x03_dedup_minhash_lsh": _sql_x03(),
    "x04_simhash_signatures": SQL_X04,
    "x05_similarity_topk": SQL_X05,
    "x05b_similarity_lsh": _sql_x05b(),
    "x05c_similarity_ivf": SQL_X05C,
    "x06_text_profile": _sql_x06(),
    "x07_embedding_neardup": _sql_x07(),
    "x08_ngram_jaccard": SQL_X08,
    "x09_dedup_clusters": _sql_x09(),
    "x10_events_hourly": SQL_X10,
    "x11_events_sessions": SQL_X11,
    "x12_multimodal_binary": SQL_X12,
    "x13_tfidf_top_terms": SQL_X13,
    "x14_curation_pipeline": _sql_x14(),
    "x15_running_totals": SQL_X15,
    "x16_gopher_filter": SQL_X16,
    "x17_corpus_mixing": SQL_X17,
    "x18_token_shards": SQL_X18,
    "x19_decontamination": SQL_X19,
    "x20_pii_scrub": SQL_X20,
    "x21_passage_dedup": SQL_X21,
    "x22_embedding_quantize": SQL_X22,
    "x23_url_domains": SQL_X23,
    "x24_stream_join": SQL_X24,
    "x25_asof_join": SQL_X25,
    "x26_range_join": SQL_X26,
    "x27_doc_chunks": SQL_X27,
    "x28_context_windows": SQL_X28,
    "x29_kmv_distinct": SQL_X29,
    "x30_group_quantiles": SQL_X30,
    "x31_funnel": SQL_X31,
    "x32_cohort_retention": SQL_X32,
    "x33_bm25": SQL_X33,
    "x34_event_transitions": SQL_X34,
    "x35_countmin": SQL_X35,
    "x36_group_sample": SQL_X36,
    "x37_value_outliers": SQL_X37,
    "x38_inter_arrival": SQL_X38,
    "x39_term_pmi": SQL_X39,
    "x40_revenue_rollup": SQL_X40,
    "x41_weighted_sample": SQL_X41,
    "x42_histogram": SQL_X42,
    "x43_fuzzy_match": SQL_X43,
    "x44_winsorize": SQL_X44,
    "x45_gap_fill": SQL_X45,
    "x46_pivot": SQL_X46,
    "x47_attribution": SQL_X47,
    "x48_group_ranks": SQL_X48,
    "x49_session_paths": SQL_X49,
    "x50_surprisal": SQL_X50,
    "x51_mad_outliers": SQL_X51,
    "x52_source_overlap": SQL_X52,
    "x53_corr": SQL_X53,
    "x54_time_weighted_avg": SQL_X54,
    "x55_skew_profile": SQL_X55,
    "x56_canonical_urls": SQL_X56,
    "x57_entropy": SQL_X57,
    "x58_drift": SQL_X58,
    "x59_mutual_info": SQL_X59,
    "x60_benford": SQL_X60,
    "x61_js_divergence": SQL_X61,
    "x62_streaks": SQL_X62,
    "x63_weighted_quantiles": SQL_X63,
    "x64_ks": SQL_X64,
    "x65_trend": SQL_X65,
    "x66_ab_test": SQL_X66,
    "x67_survival": SQL_X67,
    "x68_trimmed_mean": SQL_X68,
    "x69_cusum": SQL_X69,
    "x70_autocorr": SQL_X70,
    "x71_concentration": SQL_X71,
}
