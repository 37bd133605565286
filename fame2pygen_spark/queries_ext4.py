"""Round-4 extension queries (x128+): training-data curation
operators from the 2023-era LLM data literature — semantic dedup
(SemDeDup), hashed-n-gram importance resampling (DSIR), per-source
boilerplate n-gram detection, label-agreement auditing (Cohen's
kappa), and preference-strength fitting (Bradley–Terry) for
RLHF-style comparison data.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import functions as F

EXT4_QUERIES: dict = {}
EXT4_ORACLES: dict = {}


# ------------------------------------------- x128: SemDeDup

#: sequential-fold dot product over the 64 dims, DuckDB side
_SQL_DOT = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> {a}[CAST(i AS INTEGER)] * {b}[CAST(i AS INTEGER)]), "
    "(acc, x) -> acc + x)"
)


def q_x128_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (operators/similarity.py:semdedup,
    Abbas et al. 2023): nearest-centroid assignment against centroids
    pinned to the embeddings of ``vec_id < 8`` (the x75 rule, so the
    oracle reproduces them from the same view), then within-cluster
    cosine ≥ 0.35 marks every vector with a lower-id semantic twin as
    a duplicate.  Scale shape: map-only assignment over broadcast
    literal centroids, one cluster-keyed shuffle for the capped
    self-join — the paper's O(Σ|cell|²) bound instead of O(n²)."""
    from .operators.similarity import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    out = semdedup(emb, centroids=cents, threshold=0.35)
    return out.select(
        F.col("id").cast("long").alias("vec_id"),
        "cluster",
        F.col("keep").cast("int").cast("long").alias("keep"),
        F.col("dup_of").cast("long").alias("dup_of"),
        "n_dups",
        "max_cos",
    )


def _sql_x128() -> str:
    dot_vv = _SQL_DOT.format(a="v", b="v")
    dot_vc = _SQL_DOT.format(a="e.v", b="cent.cv")
    dot_ee = _SQL_DOT.format(a="e.v", b="e.v")
    dot_ab = _SQL_DOT.format(a="a.v", b="b.v")
    dot_aa = _SQL_DOT.format(a="a.v", b="a.v")
    dot_bb = _SQL_DOT.format(a="b.v", b="b.v")
    return f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (
  SELECT id AS cid, v AS cv, {dot_vv} AS c2
  FROM e WHERE id < 8
),
dists AS (
  SELECT e.id, cent.cid,
         {dot_ee} - 2.0 * {dot_vc} + cent.c2 AS d2
  FROM e CROSS JOIN cent
),
asg AS (
  SELECT id, cid AS cluster FROM (
    SELECT id, cid, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
    FROM dists
  ) WHERE rn = 1
),
m AS (SELECT a.id, a.cluster, e.v FROM asg a JOIN e ON e.id = a.id),
edges AS (
  SELECT * FROM (
    SELECT a.id AS id_a, b.id AS id_b,
           ROUND({dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})), 6) AS score
    FROM m a JOIN m b ON a.cluster = b.cluster AND a.id < b.id
  ) WHERE score >= 0.35
),
verdict AS (
  SELECT id_b AS id, min(id_a) AS dup_of, count(*) AS n_dups,
         max(score) AS max_cos
  FROM edges GROUP BY id_b
)
SELECT CAST(m.id AS BIGINT) AS vec_id,
       CAST(m.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN v.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(v.dup_of AS BIGINT) AS dup_of,
       CAST(coalesce(v.n_dups, 0) AS BIGINT) AS n_dups,
       v.max_cos
FROM m LEFT JOIN verdict v ON v.id = m.id
"""


EXT4_QUERIES.update({"x128_semdedup": q_x128_semdedup})
EXT4_ORACLES.update({"x128_semdedup": _sql_x128()})


# --------------------------- x129: DSIR importance resampling weights


def q_x129_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators/mixing.py:dsir_logweights,
    Xie et al. 2023): score every document by the log-likelihood ratio
    of its hashed-bigram features under the target domain
    (``lang = 'en'``) vs the full raw corpus — the selection signal
    for carving a domain-matched pretraining subset from a crawl.
    Model = two counts over 256 md5-hashed buckets (fixed-width,
    vocabulary-independent, broadcast back); scoring = one
    groupBy(doc, bucket) + broadcast join + decimal-summed groupBy."""
    from .operators.mixing import dsir_logweights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dsir_logweights(
        docs, "text", "doc_id", F.col("lang") == "en", n_buckets=256
    )
    return out.select(
        F.col("doc").cast("long").alias("doc_id"), "n_grams", "logw"
    )


SQL_X129 = """
WITH t AS (
  SELECT doc_id AS doc, (lang = 'en') AS tgt,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT doc, tgt, array_to_string(toks[i : i + 1], ' ') AS g
  FROM t, unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
), gb AS (
  SELECT doc, tgt,
         ('0x' || substr(md5('dsir:' || g), 1, 8))::BIGINT % 256 AS b
  FROM g
), model AS (
  SELECT b, count(*) AS n_raw,
         count(*) FILTER (WHERE tgt) AS n_t
  FROM gb GROUP BY b
), tot AS (
  SELECT sum(n_raw) AS nn_raw, sum(n_t) AS nn_t FROM model
), lr AS (
  SELECT b,
         ln((n_t + 0.5) / (nn_t + 128.0))
         - ln((n_raw + 0.5) / (nn_raw + 128.0)) AS lr
  FROM model CROSS JOIN tot
), per AS (
  SELECT doc, b, count(*) AS n FROM gb GROUP BY doc, b
)
SELECT CAST(per.doc AS BIGINT) AS doc_id,
       CAST(sum(per.n) AS BIGINT) AS n_grams,
       ROUND(CAST(sum(CAST(per.n * lr.lr AS DECIMAL(28,18))) AS DOUBLE), 6)
         AS logw
FROM per JOIN lr ON lr.b = per.b
GROUP BY per.doc
"""


EXT4_QUERIES.update({"x129_dsir_weights": q_x129_dsir_weights})
EXT4_ORACLES.update({"x129_dsir_weights": SQL_X129})


# ----------------------- x130: per-source boilerplate n-gram profile


def q_x130_boilerplate(spark, sf_dir):
    """Group-relative boilerplate detection (operators/text.py:
    boilerplate_profile): bigrams occurring in ≥20% (and ≥2) of a
    source's documents are template chrome; per-doc output is the
    distinct-gram count, boilerplate-gram count, and contamination
    fraction a curation filter thresholds on."""
    from .operators.text import boilerplate_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = boilerplate_profile(
        docs, "text", "doc_id", "source", n=2, min_frac=0.2, min_docs=2
    )
    return out.select(
        "source",
        F.col("doc").cast("long").alias("doc_id"),
        "n_grams_distinct",
        "n_boiler",
        "boiler_frac",
    )


SQL_X130 = """
WITH t AS (
  SELECT doc_id, source,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents
), pd AS (
  SELECT DISTINCT source, doc_id,
         array_to_string(toks[i : i + 1], ' ') AS g
  FROM t, unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
), sz AS (
  SELECT source, count(DISTINCT doc_id) AS n_group_docs
  FROM documents GROUP BY source
), gc AS (
  SELECT source, g, count(*) AS nd FROM pd GROUP BY source, g
), bl AS (
  SELECT gc.source, gc.g
  FROM gc JOIN sz ON sz.source = gc.source
  WHERE gc.nd >= 2 AND gc.nd >= 0.2 * sz.n_group_docs
)
SELECT pd.source,
       CAST(pd.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_grams_distinct,
       CAST(count(*) FILTER (WHERE bl.g IS NOT NULL) AS BIGINT) AS n_boiler,
       ROUND(CAST(count(*) FILTER (WHERE bl.g IS NOT NULL) AS DOUBLE)
             / count(*), 6) AS boiler_frac
FROM pd LEFT JOIN bl ON bl.source = pd.source AND bl.g = pd.g
GROUP BY pd.source, pd.doc_id
"""


EXT4_QUERIES.update({"x130_boilerplate": q_x130_boilerplate})
EXT4_ORACLES.update({"x130_boilerplate": SQL_X130})


# ------------------------- x131: inter-rater agreement (Cohen kappa)


def q_x131_rater_kappa(spark, sf_dir):
    """Chance-corrected label agreement (operators/quality.py:
    cohens_kappa): treat each user's modal event type over the odd
    vs the even positions of their timeline as two independent
    'annotations' of the same behavioral label and compute Cohen's
    kappa across users — the split-half label-stability audit run on
    annotation pipelines before labels feed a reward model.  Users
    with events on only one side are not co-labeled and drop out."""
    from pyspark.sql import Window
    from .operators.quality import cohens_kappa
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).withColumn("parity", F.col("rn") % 2)
    counts = seq.groupBy("user_id", "parity", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wm = Window.partitionBy("user_id", "parity").orderBy(
        F.desc("c"), F.asc("event_type")
    )
    modal = (
        counts.withColumn("mr", F.row_number().over(wm))
        .where(F.col("mr") == 1)
        .select("user_id", "parity", "event_type")
    )
    paired = (
        modal.where(F.col("parity") == 1)
        .select("user_id", F.col("event_type").alias("label_a"))
        .join(
            modal.where(F.col("parity") == 0).select(
                "user_id", F.col("event_type").alias("label_b")
            ),
            on="user_id",
        )
    )
    return cohens_kappa(paired, "label_a", "label_b")


SQL_X131 = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
  FROM events
), seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id) % 2 AS parity
  FROM e
), counts AS (
  SELECT user_id, parity, event_type, count(*) AS c
  FROM seq GROUP BY user_id, parity, event_type
), modal AS (
  SELECT user_id, parity, event_type FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, parity
                                 ORDER BY c DESC, event_type ASC) AS mr
    FROM counts
  ) WHERE mr = 1
), paired AS (
  SELECT a.user_id, a.event_type AS label_a, b.event_type AS label_b
  FROM modal a JOIN modal b
    ON a.user_id = b.user_id AND a.parity = 1 AND b.parity = 0
), totals AS (
  SELECT count(*) AS n,
         count(*) FILTER (WHERE label_a = label_b) AS agree
  FROM paired
), ma AS (SELECT label_a AS lbl, count(*) AS na FROM paired GROUP BY 1),
mb AS (SELECT label_b AS lbl, count(*) AS nb FROM paired GROUP BY 1),
crossm AS (
  SELECT sum(na * nb) AS x FROM ma JOIN mb ON ma.lbl = mb.lbl
)
SELECT CAST(n AS BIGINT) AS n_items,
       ROUND(CAST(agree AS DOUBLE) / n, 6) AS po,
       ROUND(CAST(coalesce(x, 0) AS DOUBLE) / (n * n), 6) AS pe,
       ROUND((CAST(agree AS DOUBLE) / n
              - CAST(coalesce(x, 0) AS DOUBLE) / (n * n))
             / (1.0 - CAST(coalesce(x, 0) AS DOUBLE) / (n * n)), 6) AS kappa
FROM totals CROSS JOIN crossm
"""


EXT4_QUERIES.update({"x131_rater_kappa": q_x131_rater_kappa})
EXT4_ORACLES.update({"x131_rater_kappa": SQL_X131})


# -------------------- x132: Bradley–Terry preference strengths


def q_x132_bradley_terry(spark, sf_dir):
    """Preference-strength fit (operators/behavior.py:bradley_terry):
    every user who performed both of two event types casts one
    comparison — the type they performed more often wins (ties
    abstain) — and two exact Bradley–Terry MM iterations turn the
    win matrix into per-type strengths.  The shape of reward-model
    preference-data QC: raw pairwise labels → aggregated win table →
    strength scale + consistency check."""
    from .operators.behavior import bradley_terry
    from .queries_ext import _read_events

    ev = _read_events(spark, sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = counts.select(
        "user_id", F.col("event_type").alias("x"), F.col("c").alias("cx")
    )
    b = counts.select(
        "user_id", F.col("event_type").alias("y"), F.col("c").alias("cy")
    )
    agg = (
        a.join(b, on="user_id")
        .where(F.col("x") < F.col("y"))
        .groupBy(F.col("x").alias("item_a"), F.col("y").alias("item_b"))
        .agg(
            F.count(F.when(F.col("cx") > F.col("cy"), 1)).alias("wins_a"),
            F.count(F.when(F.col("cy") > F.col("cx"), 1)).alias("wins_b"),
        )
    )
    out = bradley_terry(agg, "item_a", "item_b", "wins_a", "wins_b")
    return out.select(
        F.col("item").alias("event_type"), "wins", "n_comparisons",
        "s1", "s2",
    )


SQL_X132 = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type
), pc AS (
  SELECT a.event_type AS x, b.event_type AS y, a.c AS cx, b.c AS cy
  FROM counts a JOIN counts b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
), agg AS (
  SELECT x AS item_a, y AS item_b,
         count(*) FILTER (WHERE cx > cy) AS wins_a,
         count(*) FILTER (WHERE cy > cx) AS wins_b
  FROM pc GROUP BY x, y
), base AS (
  SELECT * FROM agg WHERE wins_a + wins_b > 0
), edges AS (
  SELECT item_a AS i, item_b AS j, wins_a AS w, wins_a + wins_b AS n
  FROM base
  UNION ALL
  SELECT item_b AS i, item_a AS j, wins_b AS w, wins_a + wins_b AS n
  FROM base
), per AS (
  SELECT i, sum(w) AS wins, sum(n) AS n_comparisons
  FROM edges GROUP BY i
), s1 AS (
  SELECT i, 2.0 * CAST(wins AS DOUBLE) / n_comparisons AS s1 FROM per
), denom AS (
  SELECT e.i,
         CAST(sum(CAST(CAST(e.n AS DOUBLE) / (si.s1 + sj.s1)
                       AS DECIMAL(28,18))) AS DOUBLE) AS d
  FROM edges e
  JOIN s1 si ON si.i = e.i
  JOIN s1 sj ON sj.i = e.j
  GROUP BY e.i
)
SELECT per.i AS event_type,
       CAST(per.wins AS BIGINT) AS wins,
       CAST(per.n_comparisons AS BIGINT) AS n_comparisons,
       ROUND(s1.s1, 6) AS s1,
       ROUND(CAST(per.wins AS DOUBLE) / denom.d, 6) AS s2
FROM per JOIN s1 ON s1.i = per.i JOIN denom ON denom.i = per.i
"""


EXT4_QUERIES.update({"x132_bradley_terry": q_x132_bradley_terry})
EXT4_ORACLES.update({"x132_bradley_terry": SQL_X132})


# ---------------- x133: quality-priority dedup survivor election


def q_x133_priority_dedup(spark, sf_dir):
    """Best-copy dedup (operators/dedup.py:canonical_by_priority): the
    x09 near-dup clusters re-elect their survivor by text_profile
    quality (ties → lowest id) instead of lowest id — production
    dedup keeps the best copy, not the first crawl.  One doc-id join
    + one component-keyed min-struct window on top of the cluster
    frame; comparisons only, no float accumulation."""
    from .operators import dedup as dd
    from .operators.text import text_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.minhash_lsh_pairs(
        docs, "text", "doc_id", n=5, num_hashes=64, bands=16, threshold=0.6
    )
    clusters = dd.duplicate_clusters(pairs)
    prof = text_profile(docs, "text").select(
        F.col("doc_id").alias("doc"), "quality"
    )
    out = dd.canonical_by_priority(clusters, prof, "quality")
    return out.select(
        F.col("doc").cast("long").alias("doc"),
        F.col("component").cast("long").alias("component"),
        "cluster_size",
        "quality",
        F.col("canonical_doc").cast("long").alias("canonical_doc"),
        F.col("is_canonical").cast("int").cast("long").alias("is_canonical"),
    )


def _sql_x133() -> str:
    from .queries_ext import (
        _SQL_COMPONENT_CTES, _sql_profile_ctes, _sql_x03_ctes,
    )

    return f"""
WITH RECURSIVE {_sql_x03_ctes()},
{_SQL_COMPONENT_CTES},
{_sql_profile_ctes()},
member AS (
  SELECT c.doc, c.component,
         COUNT(*) OVER (PARTITION BY c.component) AS cluster_size,
         p.quality
  FROM comp c JOIN prof p ON p.doc_id = c.doc
), elect AS (
  SELECT *, FIRST_VALUE(doc) OVER (
           PARTITION BY component
           ORDER BY coalesce(-quality, 'infinity'::DOUBLE), doc
         ) AS canonical_doc
  FROM member
)
SELECT CAST(doc AS BIGINT) AS doc,
       CAST(component AS BIGINT) AS component,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       quality,
       CAST(canonical_doc AS BIGINT) AS canonical_doc,
       CAST(CASE WHEN doc = canonical_doc THEN 1 ELSE 0 END AS BIGINT)
         AS is_canonical
FROM elect
"""


EXT4_QUERIES.update({"x133_priority_dedup": q_x133_priority_dedup})
EXT4_ORACLES.update({"x133_priority_dedup": _sql_x133()})


# -------------------- x134: contrastive hard-negative mining


def q_x134_hard_negatives(spark, sf_dir):
    """Hard-negative mining (operators/similarity.py:hard_negatives,
    ANCE-style): for each query vector (``vec_id < 10``) the 5 most
    cosine-similar corpus vectors with a DIFFERENT label — the
    near-miss negatives contrastive retriever training pairs against
    each query.  Label filter below the rank window; corpus streams
    once past the broadcast query set."""
    from .operators.similarity import hard_negatives

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    out = hard_negatives(emb, queries, k=5)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "score",
        F.col("neighbor_label").cast("long").alias("neighbor_label"),
    )


def _sql_x134() -> str:
    dot_ab = _SQL_DOT.format(a="c.v", b="q.qv")
    dot_cc = _SQL_DOT.format(a="c.v", b="c.v")
    dot_qq = _SQL_DOT.format(a="q.qv", b="q.qv")
    return f"""
WITH e AS (
  SELECT vec_id AS id, label, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT id AS query_id, label AS ql, v AS qv FROM e WHERE id < 10
), c AS (SELECT id AS neighbor_id, label AS nl, v FROM e),
scored AS (
  SELECT q.query_id, c.neighbor_id, c.nl,
         ROUND({dot_ab} / (sqrt({dot_cc}) * sqrt({dot_qq})), 6) AS score
  FROM c CROSS JOIN q
  WHERE c.neighbor_id <> q.query_id AND c.nl <> q.ql
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rank AS BIGINT) AS rank, score,
       CAST(nl AS BIGINT) AS neighbor_label
FROM ranked WHERE rank <= 5
"""


EXT4_QUERIES.update({"x134_hard_negatives": q_x134_hard_negatives})
EXT4_ORACLES.update({"x134_hard_negatives": _sql_x134()})


# ------------------ x135: per-language adaptive quality cutoff


def q_x135_quality_cutoff(spark, sf_dir):
    """Language-relative quality filtering (text_profile +
    sketch.group_quantiles composition): drop each language's worst
    quartile instead of applying one global threshold — a global
    cutoff tuned on the majority language guts low-resource languages
    whose score distribution sits lower (the per-language
    calibration step in multilingual curation).  Per-lang p25 is a
    tiny broadcast joined back as the floor; output is the per-lang
    audit row (docs, cutoff, kept, kept fraction)."""
    from .operators.sketch import group_quantiles
    from .operators.text import text_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = text_profile(docs, "text").select(
        F.col("doc_id"), F.col("lang_pred"), F.col("quality")
    )
    cuts = group_quantiles(prof, ["lang_pred"], "quality", [0.25]).select(
        "lang_pred", F.col("p25").alias("cutoff")
    )
    return (
        prof.join(F.broadcast(cuts), on="lang_pred")
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("cutoff").alias("cutoff"),
            F.count(F.when(F.col("quality") >= F.col("cutoff"), 1))
            .cast("long")
            .alias("n_kept"),
        )
        .withColumn(
            "kept_frac",
            F.round(F.col("n_kept").cast("double") / F.col("n_docs"), 6),
        )
    )


def _sql_x135() -> str:
    from .queries_ext import _sql_profile_ctes

    return f"""
WITH {_sql_profile_ctes()},
cuts AS (
  SELECT lang_pred, ROUND(quantile_cont(quality, 0.25) * 1000000.0) / 1000000.0 AS cutoff
  FROM prof GROUP BY lang_pred
)
SELECT p.lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs,
       max(c.cutoff) AS cutoff,
       CAST(count(*) FILTER (WHERE p.quality >= c.cutoff) AS BIGINT)
         AS n_kept,
       ROUND(CAST(count(*) FILTER (WHERE p.quality >= c.cutoff) AS DOUBLE)
             / count(*), 6) AS kept_frac
FROM prof p JOIN cuts c ON c.lang_pred = p.lang_pred
GROUP BY p.lang_pred
"""


EXT4_QUERIES.update({"x135_quality_cutoff": q_x135_quality_cutoff})
EXT4_ORACLES.update({"x135_quality_cutoff": _sql_x135()})


# ------------------- x136: code-switching language-span profile


def q_x136_lang_spans(spark, sf_dir):
    """Span-level language mixture (operators/text.py:
    lang_span_profile): language-id every 10-token window and report
    each doc's span count, language count, dominant language + share,
    and adjacent-span switch count — the mixed-language filter signal
    a doc-level langid threshold misses."""
    from .operators.text import lang_span_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = lang_span_profile(docs, "text", "doc_id", span_tokens=10)
    return out.select(
        F.col("doc").cast("long").alias("doc_id"),
        "n_spans", "n_langs", "dominant_lang", "dominant_frac", "switches",
    )


def _sql_x136() -> str:
    from .operators.text import LANG_MARKERS

    per_lang = "\nUNION ALL\n".join(
        f"""  SELECT doc, pos, '{lang}' AS l,
         CAST(len(list_filter(span, x -> list_contains(
           [{', '.join(repr(w) for w in words)}], x))) AS DOUBLE)
           / len(span) AS s
  FROM sp"""
        for lang, words in LANG_MARKERS.items()
    )
    return f"""
WITH t AS (
  SELECT doc_id AS doc,
         list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents
), nz AS (SELECT * FROM t WHERE len(toks) > 0),
sp AS (
  SELECT doc, i AS pos, toks[i * 10 + 1 : i * 10 + 10] AS span
  FROM nz, unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS u(i)
),
scored AS (
{per_lang}
),
best AS (
  SELECT doc, pos,
         CASE WHEN s >= 0.01 THEN l ELSE 'und' END AS lang
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc, pos
                                 ORDER BY s DESC, l DESC) AS rn
    FROM scored
  ) WHERE rn = 1
),
seq AS (
  SELECT *, lag(lang) OVER (PARTITION BY doc ORDER BY pos) AS prev
  FROM best
),
per_doc AS (
  SELECT doc,
         count(*) AS n_spans,
         count(DISTINCT CASE WHEN lang <> 'und' THEN lang END) AS n_langs,
         count(*) FILTER (WHERE prev IS NOT NULL AND lang <> prev)
           AS switches
  FROM seq GROUP BY doc
),
modal AS (
  SELECT doc, lang AS dominant_lang, c AS cm FROM (
    SELECT doc, lang, count(*) AS c,
           ROW_NUMBER() OVER (PARTITION BY doc
                              ORDER BY count(*) DESC, lang ASC) AS r
    FROM best GROUP BY doc, lang
  ) WHERE r = 1
)
SELECT CAST(p.doc AS BIGINT) AS doc_id,
       CAST(p.n_spans AS BIGINT) AS n_spans,
       CAST(p.n_langs AS BIGINT) AS n_langs,
       m.dominant_lang,
       ROUND(CAST(m.cm AS DOUBLE) / p.n_spans, 6) AS dominant_frac,
       CAST(p.switches AS BIGINT) AS switches
FROM per_doc p JOIN modal m ON m.doc = p.doc
"""


EXT4_QUERIES.update({"x136_lang_spans": q_x136_lang_spans})
EXT4_ORACLES.update({"x136_lang_spans": _sql_x136()})


# ------------------------ x137: label-propagation superstep


def q_x137_lpa_step(spark, sf_dir):
    """One LPA community-detection superstep (operators/graph.py:
    label_propagation_step) on the customer–supplier trade graph (the
    x91 edge set, node ids disjoint via even/odd encoding): every
    node adopts its neighbors' heaviest label, ties to the smallest —
    integer weights end to end, so the superstep is engine-exact.
    Returns the 50 heaviest adoptions for a bounded result."""
    from .operators.graph import label_propagation_step

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
    out = label_propagation_step(edges)
    return (
        out.orderBy(
            F.desc("label_weight"), F.asc("node"), F.asc("label")
        )
        .limit(50)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("label").cast("long").alias("label"),
            F.col("label_weight").cast("long").alias("label_weight"),
        )
    )


SQL_X137 = """
WITH base AS (
  SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst,
         count(*) AS w
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), sym AS (
  SELECT src AS u, dst AS v, w FROM base
  UNION ALL
  SELECT dst AS u, src AS v, w FROM base
), votes AS (
  SELECT u AS node, v AS label, sum(w) AS label_weight
  FROM sym GROUP BY u, v
), adopted AS (
  SELECT node, label, label_weight FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY node
                                 ORDER BY label_weight DESC, label ASC) AS r
    FROM votes
  ) WHERE r = 1
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(label AS BIGINT) AS label,
       CAST(label_weight AS BIGINT) AS label_weight
FROM adopted
ORDER BY label_weight DESC, node ASC, label ASC
LIMIT 50
"""


EXT4_QUERIES.update({"x137_lpa_step": q_x137_lpa_step})
EXT4_ORACLES.update({"x137_lpa_step": SQL_X137})


# ------------------------------ x138: BPE merge training steps


def q_x138_bpe_merges(spark, sf_dir):
    """Three byte-pair-encoding merge-training iterations
    (operators/text.py:bpe_init_seqs + bpe_merge_step, Sennrich et
    al. 2016) over the documents word table: each step learns the
    most frequent adjacent symbol pair and merges it greedily
    left-to-right in every word.  The iteration state is the
    word-frequency table, not the corpus — the reason BPE training
    scales; steps are checkpointed like every iterative operator
    here.  Output: the word table after 3 merges plus the third
    learned pair."""
    from .operators.text import bpe_init_seqs, bpe_merge_step

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = bpe_init_seqs(docs, "text").localCheckpoint(eager=True)
    for _ in range(3):
        s = bpe_merge_step(s).localCheckpoint(eager=True)
        last = s
        s = s.select("word", "freq", "seq")
    return last.select(
        "word", "freq",
        F.replace(F.col("seq"), F.lit("\x1f"), F.lit(" ")).alias("seq"),
        "pair_a", "pair_b", "pair_count",
    )


def _sql_x138() -> str:
    steps = []
    prev = "s0"
    for i in (1, 2, 3):
        steps.append(f"""p{i} AS (
  SELECT arr[i] AS a, arr[i + 1] AS b, sum(freq) AS pair_count
  FROM (SELECT freq, string_split(seq, chr(31)) AS arr FROM {prev}),
       unnest(range(1, len(arr))) AS u(i)
  GROUP BY 1, 2
), b{i} AS (
  SELECT a, b, pair_count FROM p{i}
  ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1
), s{i} AS (
  SELECT word, freq,
         list_reduce(string_split(seq, chr(31)), (acc, t) -> CASE WHEN string_split(acc, chr(31))[-1] = a AND t = b THEN acc || t ELSE acc || chr(31) || t END) AS seq
  FROM {prev} CROSS JOIN b{i}
)""")
        prev = f"s{i}"
    chain = ",\n".join(steps)
    return f"""
WITH words AS (
  SELECT w AS word, count(*) AS freq
  FROM (
    SELECT unnest(list_filter(string_split(
      trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
      x -> x <> '')) AS w
    FROM documents
  ) WHERE NOT contains(w, chr(31)) GROUP BY w
), s0 AS (
  SELECT word, freq,
         regexp_replace(regexp_replace(word, '(.)', '\\1' || chr(31), 'g'),
                        chr(31) || '$', '') AS seq
  FROM words
),
{chain}
SELECT s3.word, CAST(s3.freq AS BIGINT) AS freq,
       replace(s3.seq, chr(31), ' ') AS seq,
       b3.a AS pair_a, b3.b AS pair_b,
       CAST(b3.pair_count AS BIGINT) AS pair_count
FROM s3 CROSS JOIN b3
"""


EXT4_QUERIES.update({"x138_bpe_merges": q_x138_bpe_merges})
EXT4_ORACLES.update({"x138_bpe_merges": _sql_x138()})


# ----------------- x139: BPE encoding fertility per document


def q_x139_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility audit (operators/text.py:
    bpe_encode_profile): learn 5 BPE merges on the corpus word table
    (x138's iteration), encode every document with them — merges
    applied in learned order to the DISTINCT vocabulary, occurrences
    joined back — and report words, subwords, and fertility
    (subwords/word) per doc: the context-length tax a vocab charges
    each document."""
    from .operators.text import (
        bpe_encode_profile, bpe_init_seqs, bpe_merge_step,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = bpe_init_seqs(docs, "text").localCheckpoint(eager=True)
    merges = []
    for _ in range(5):
        # checkpoint BEFORE reading the learned pair — first() on the
        # raw step output would run the pair aggregation a second time
        s = bpe_merge_step(s).localCheckpoint(eager=True)
        row = s.select("pair_a", "pair_b").first()
        merges.append((row["pair_a"], row["pair_b"]))
        s = s.select("word", "freq", "seq")
    out = bpe_encode_profile(docs, "text", "doc_id", merges)
    return out.select(
        F.col("doc").cast("long").alias("doc_id"),
        "n_words", "n_subwords", "fertility",
    )


def _sql_x139() -> str:
    steps = []
    prev = "s0"
    for i in (1, 2, 3, 4, 5):
        steps.append(f"""p{i} AS (
  SELECT arr[i] AS a, arr[i + 1] AS b, sum(freq) AS pair_count
  FROM (SELECT freq, string_split(seq, chr(31)) AS arr FROM {prev}),
       unnest(range(1, len(arr))) AS u(i)
  GROUP BY 1, 2
), b{i} AS (
  SELECT a, b FROM p{i}
  ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1
), s{i} AS (
  SELECT word, freq,
         list_reduce(string_split(seq, chr(31)), (acc, t) -> CASE WHEN string_split(acc, chr(31))[-1] = a AND t = b THEN acc || t ELSE acc || chr(31) || t END) AS seq
  FROM {prev} CROSS JOIN b{i}
)""")
        prev = f"s{i}"
    chain = ",\n".join(steps)
    return f"""
WITH occ0 AS (
  SELECT doc_id AS doc,
         unnest(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '')) AS word
  FROM documents
), occ AS (
  SELECT * FROM occ0 WHERE NOT contains(word, chr(31))
), words AS (
  SELECT word, count(*) AS freq FROM occ GROUP BY word
), s0 AS (
  SELECT word, freq,
         regexp_replace(regexp_replace(word, '(.)', '\\1' || chr(31), 'g'),
                        chr(31) || '$', '') AS seq
  FROM words
),
{chain},
encoded AS (
  SELECT word, len(string_split(seq, chr(31))) AS n_sub FROM s5
)
SELECT CAST(o.doc AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(e.n_sub) AS BIGINT) AS n_subwords,
       ROUND(CAST(sum(e.n_sub) AS DOUBLE) / count(*), 6) AS fertility
FROM occ o JOIN encoded e ON e.word = o.word
GROUP BY o.doc
"""


EXT4_QUERIES.update({"x139_bpe_fertility": q_x139_bpe_fertility})
EXT4_ORACLES.update({"x139_bpe_fertility": _sql_x139()})


# -------------------- x140: reciprocal k-NN (mutual) pairs


def q_x140_mutual_knn(spark, sf_dir):
    """Reciprocal k-NN pairs (operators/similarity.py:
    mutual_knn_pairs): banded-hyperplane candidates (the x07
    mechanism), per-node top-5 ranks, pair kept only when BOTH sides
    rank each other within k — the hubness-robust edge set graph
    clustering builds on instead of raw near-dup pairs."""
    from .operators.similarity import mutual_knn_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = mutual_knn_pairs(
        emb, dim=64, k=5, nbits=4, bands=2, max_bucket=1000
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "score",
        F.col("rank_ab").cast("long").alias("rank_ab"),
        F.col("rank_ba").cast("long").alias("rank_ba"),
    )


def _sql_x140() -> str:
    from .operators import similarity as sim

    nbits, bands, max_bucket, k = 4, 2, 1000, 5
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
),
scored AS (
  SELECT c.id_a, c.id_b, {cos} AS score
  FROM cand c JOIN e a ON a.id = c.id_a JOIN e b ON b.id = c.id_b
),
directed AS (
  SELECT id_a AS node, id_b AS nbr, score FROM scored
  UNION ALL
  SELECT id_b AS node, id_a AS nbr, score FROM scored
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY node
                               ORDER BY score DESC, nbr ASC) AS r
  FROM directed
),
ab AS (
  SELECT node AS id_a, nbr AS id_b, score, r AS rank_ab
  FROM ranked WHERE node < nbr
),
ba AS (
  SELECT nbr AS id_a, node AS id_b, r AS rank_ba
  FROM ranked WHERE node > nbr
)
SELECT CAST(ab.id_a AS BIGINT) AS id_a,
       CAST(ab.id_b AS BIGINT) AS id_b,
       ab.score,
       CAST(ab.rank_ab AS BIGINT) AS rank_ab,
       CAST(ba.rank_ba AS BIGINT) AS rank_ba
FROM ab JOIN ba ON ba.id_a = ab.id_a AND ba.id_b = ab.id_b
WHERE ab.rank_ab <= {k} AND ba.rank_ba <= {k}
"""


EXT4_QUERIES.update({"x140_mutual_knn": q_x140_mutual_knn})
EXT4_ORACLES.update({"x140_mutual_knn": _sql_x140()})


# ---------------------- x141: token-budget mixture planning


def q_x141_mixture_plan(spark, sf_dir):
    """Pretraining mixture planning (operators/mixing.py:mixture_plan):
    per-source token inventories vs a target mixture (3× weight on
    src0-src2) at a 50% token budget — sampling rate, planned tokens,
    and the repeat factor that flags sources whose target share
    exceeds their unique supply (the data-constrained epoching
    regime).  One aggregate over the corpus; the plan feeds
    stratified_sample for the actual draw."""
    from .operators.mixing import mixture_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {f"src{i}": (3.0 if i < 3 else 1.0) for i in range(20)}
    return mixture_plan(
        docs, "source", "text", weights=weights, budget_frac=0.5
    ).withColumnRenamed("group", "source")


SQL_X141 = """
WITH per AS (
  SELECT source,
         count(*) AS n_docs,
         sum(len(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> ''))) AS tokens,
         CASE WHEN source IN ('src0', 'src1', 'src2')
              THEN 3.0 ELSE 1.0 END AS w
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(tokens) AS total,
         CAST(sum(CAST(w AS DECIMAL(28,18))) AS DOUBLE) AS wsum
  FROM per
), x AS (
  SELECT per.*, tot.total, tot.wsum,
         CAST(floor((w / wsum) * floor(0.5 * total)) AS BIGINT)
           AS planned_tokens
  FROM per CROSS JOIN tot
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(tokens AS BIGINT) AS tokens,
       ROUND(w / wsum, 6) AS target_share,
       planned_tokens,
       ROUND(least(1.0, CAST(planned_tokens AS DOUBLE) / tokens), 6)
         AS rate,
       ROUND(CAST(planned_tokens AS DOUBLE) / tokens, 6) AS repeat_factor,
       CAST(least(planned_tokens, tokens) AS BIGINT) AS expected_tokens
FROM x
"""


EXT4_QUERIES.update({"x141_mixture_plan": q_x141_mixture_plan})
EXT4_ORACLES.update({"x141_mixture_plan": SQL_X141})


# ------------------- x142: DSIR importance resampling draw


def q_x142_dsir_resample(spark, sf_dir):
    """The DSIR loop closed (operators/mixing.py:importance_resample
    over dsir_logweights): score every document's target-likeness,
    then keep each with probability ∝ its importance weight at an
    expected 30% sample — deterministic md5 membership, so the drawn
    subset is identical across reruns, retries, and the oracle."""
    from .operators.mixing import dsir_logweights, importance_resample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lw = dsir_logweights(
        docs, "text", "doc_id", F.col("lang") == "en", n_buckets=256
    )
    out = importance_resample(lw, "doc", "logw", target_frac=0.3)
    return out.select(
        F.col("doc").cast("long").alias("doc_id"), "logw", "p", "kept"
    )


def _sql_x142() -> str:
    split_hash = (
        "('0x' || substr(md5('dsir-rs:' || CAST(doc_id AS VARCHAR)), 1, 8))"
        "::BIGINT / 4294967296.0"
    )
    return f"""
WITH w AS (
  SELECT * FROM ({SQL_X129}) x129
), tot AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(exp(logw) AS DECIMAL(38,18))) AS DOUBLE) AS z
  FROM w
), drawn AS (
  SELECT w.doc_id, w.logw,
         least(1.0, 0.3 * tot.n * exp(w.logw) / tot.z) AS p
  FROM w CROSS JOIN tot
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       logw,
       ROUND(p, 6) AS p,
       CAST(CASE WHEN {split_hash} < p THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM drawn
"""


EXT4_QUERIES.update({"x142_dsir_resample": q_x142_dsir_resample})
EXT4_ORACLES.update({"x142_dsir_resample": _sql_x142()})


# ---------------------- x143: content-addressed corpus manifest


def q_x143_corpus_manifest(spark, sf_dir):
    """Data-versioning attestation (operators/quality.py:
    corpus_manifest): per-source doc counts, char totals, and
    order-insensitive md5-sum checksums (id-bound and text-only) —
    the manifest row that makes 'same manifest ⇒ same corpus' checkable
    across reruns and engines at the cost of a count."""
    from .operators.quality import corpus_manifest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_manifest(docs, "text", "doc_id", group_cols=("source",))


SQL_X143 = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(text)) AS BIGINT) AS n_chars,
       CAST(CAST(sum(CAST(('0x' || substr(
           md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15))::BIGINT
           AS DECIMAL(38,0))) AS DECIMAL(38,0))
           % 9223372036854775783 AS BIGINT) AS content_sum,
       CAST(CAST(sum(CAST(('0x' || substr(md5(text), 1, 15))::BIGINT
           AS DECIMAL(38,0))) AS DECIMAL(38,0))
           % 9223372036854775783 AS BIGINT) AS text_sum
FROM documents
GROUP BY source
"""


EXT4_QUERIES.update({"x143_corpus_manifest": q_x143_corpus_manifest})
EXT4_ORACLES.update({"x143_corpus_manifest": SQL_X143})


# -------------------------- x144: l-diversity privacy audit


def q_x144_l_diversity(spark, sf_dir):
    """l-diversity audit (operators/quality.py:l_diversity) over the
    x103 quasi-identifier pair (market segment, nation) with the
    account-balance band as the sensitive attribute: classes where
    fewer than l=3 distinct bands occur leak the attribute even when
    k-anonymity holds — the homogeneity gap k alone misses.  Rolled
    up per segment."""
    from .operators.quality import l_diversity

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 2000).cast("long")
    )
    groups = l_diversity(
        cust, ["c_mktsegment", "c_nationkey"], "bal_band", l=3
    )
    return (
        groups.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.count(F.when(F.col("violates_l"), 1))
            .cast("long")
            .alias("n_violating"),
            F.min("n_sensitive").cast("long").alias("min_diversity"),
            F.sum(F.when(F.col("violates_l"), F.col("group_size")))
            .cast("long")
            .alias("individuals_at_risk"),
        )
        .withColumn(
            "individuals_at_risk",
            F.coalesce(F.col("individuals_at_risk"), F.lit(0)),
        )
    )


SQL_X144 = """
WITH g AS (
  SELECT c_mktsegment, c_nationkey,
         count(*) AS group_size,
         count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT))
           AS n_sensitive
  FROM customer
  GROUP BY c_mktsegment, c_nationkey
)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE n_sensitive < 3) AS BIGINT)
         AS n_violating,
       CAST(min(n_sensitive) AS BIGINT) AS min_diversity,
       CAST(coalesce(sum(group_size) FILTER (WHERE n_sensitive < 3), 0)
            AS BIGINT) AS individuals_at_risk
FROM g GROUP BY c_mktsegment
"""


EXT4_QUERIES.update({"x144_l_diversity": q_x144_l_diversity})
EXT4_ORACLES.update({"x144_l_diversity": SQL_X144})


# ------------------- x145: chi-square independence (lang × source)


def q_x145_chi2_independence(spark, sf_dir):
    """Categorical-association audit (operators/sketch.py:
    chi_square_independence): Pearson chi² + Cramér's V for the
    lang × source two-way table over the document corpus — the check
    that a crawl's language mix is (or is not) uniform across sources
    before fixing per-source mixture weights.  One groupBy to the
    contingency cells; margins are window sums over the cells only;
    the (O−E)²/E sum is decimal-cast for order-insensitivity."""
    from .operators.sketch import chi_square_independence

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chi_square_independence(docs, "lang", "source")


SQL_X145 = """
WITH cells AS (
  SELECT lang, source, count(*) AS o
  FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY lang, source
),
rmarg AS (SELECT lang, sum(o) AS rt FROM cells GROUP BY lang),
cmarg AS (SELECT source, sum(o) AS ct FROM cells GROUP BY source),
m AS (
  SELECT coalesce(c.o, 0) AS o, r.rt, cm.ct,
         sum(coalesce(c.o, 0)) OVER () AS n
  FROM rmarg r CROSS JOIN cmarg cm
  LEFT JOIN cells c ON c.lang = r.lang AND c.source = cm.source
),
agg AS (
  SELECT max(n) AS n,
         (SELECT count(DISTINCT lang) FROM cells) AS n_rows,
         (SELECT count(DISTINCT source) FROM cells) AS n_cols,
         sum((((o::DOUBLE - rt::DOUBLE * ct::DOUBLE / n::DOUBLE)
               * (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / n::DOUBLE))
              / (rt::DOUBLE * ct::DOUBLE / n::DOUBLE))::DECIMAL(38,12))
           AS chi2d
  FROM m
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_cols AS BIGINT) AS n_cols,
       CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
       CASE WHEN (n_rows - 1) * (n_cols - 1) > 0
            THEN round(chi2d::DOUBLE, 6) END AS chi2,
       CASE WHEN (n_rows - 1) * (n_cols - 1) > 0
            THEN round(sqrt(chi2d::DOUBLE
                 / (n::DOUBLE * (least(n_rows, n_cols) - 1)::DOUBLE)), 6)
            END AS cramers_v
FROM agg
"""


EXT4_QUERIES.update({"x145_chi2_independence": q_x145_chi2_independence})
EXT4_ORACLES.update({"x145_chi2_independence": SQL_X145})


# ---------------------- x146: Mann-Whitney AUC of a filter score


def q_x146_auc(spark, sf_dir):
    """Ranker audit (operators/quality.py:auc_rank): per-source
    Mann–Whitney AUC of raw document length as a predictor of
    ``lang = 'en'`` — the one-number check run on any candidate
    quality score before it becomes a corpus filter threshold.
    Integer-exact end to end: per-(source, length) pos/neg counts,
    a cumulative window over each source's distinct lengths, and a
    single integer rank-sum divided once at the end."""
    from .operators.quality import auc_rank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "score", F.length("text").cast("long")
    )
    return auc_rank(
        docs, "score", F.col("lang") == "en", group_cols=["source"]
    )


SQL_X146 = """
WITH per AS (
  SELECT source, len(text) AS s,
         count(*) FILTER (WHERE lang = 'en') AS pos,
         count(*) FILTER (WHERE NOT (lang = 'en')) AS neg
  FROM documents
  WHERE text IS NOT NULL
  GROUP BY source, len(text)
),
cum AS (
  SELECT source, pos, neg,
         sum(neg) OVER (PARTITION BY source ORDER BY s ASC) - neg
           AS neg_below
  FROM per
),
agg AS (
  SELECT source, sum(pos) AS n_pos, sum(neg) AS n_neg,
         sum(pos * (2 * neg_below + neg)) AS num2
  FROM cum GROUP BY source
)
SELECT source,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN round(num2::DOUBLE
                 / (2.0 * n_pos::DOUBLE * n_neg::DOUBLE), 6) END AS auc
FROM agg
"""


EXT4_QUERIES.update({"x146_auc": q_x146_auc})
EXT4_ORACLES.update({"x146_auc": SQL_X146})


# --------------------------- x147: Zipf rank-frequency fit


def q_x147_zipf_fit(spark, sf_dir):
    """Corpus-health fit (operators/text.py:zipf_fit): OLS of
    ln(freq) on ln(rank) over the 500 most frequent terms — slope
    ≈ −1 is the Zipf signature of natural text; departures flag
    template floods or tokenizer breakage.  Top-500 cut is
    TakeOrderedAndProject (heap, no global sort); the OLS moments run
    over ≤500 rows with decimal-cast sums."""
    from .operators.text import zipf_fit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return zipf_fit(docs, "text", top_n=500)


SQL_X147 = """
WITH nt AS (
  SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
tok AS (
  SELECT unnest(list_filter(string_split(t, ' '), x -> x <> '')) AS term
  FROM nt
),
counts AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
total AS (SELECT sum(freq) AS total_tokens FROM counts),
top AS (
  SELECT term, freq FROM counts ORDER BY freq DESC, term ASC LIMIT 500
),
ranked AS (
  SELECT ln((ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC))::DOUBLE)
           AS x,
         ln(freq::DOUBLE) AS y
  FROM top
),
m AS (
  SELECT count(*) AS n_terms,
         sum(x::DECIMAL(38,12)) AS sx, sum(y::DECIMAL(38,12)) AS sy,
         sum((x * y)::DECIMAL(38,12)) AS sxy,
         sum((x * x)::DECIMAL(38,12)) AS sxx,
         sum((y * y)::DECIMAL(38,12)) AS syy
  FROM ranked
)
SELECT CAST(n_terms AS BIGINT) AS n_terms,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       round((n_terms::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (n_terms::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE),
             6) AS slope,
       round((sy::DOUBLE - ((n_terms::DOUBLE * sxy::DOUBLE
                              - sx::DOUBLE * sy::DOUBLE)
             / (n_terms::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
             * sx::DOUBLE) / n_terms::DOUBLE, 6) AS intercept,
       round(((n_terms::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
              * (n_terms::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE))
             / ((n_terms::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * (n_terms::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
             6) AS r2
FROM m CROSS JOIN total
"""


EXT4_QUERIES.update({"x147_zipf_fit": q_x147_zipf_fit})
EXT4_ORACLES.update({"x147_zipf_fit": SQL_X147})


# -------------------- x148: triangle census of a co-supply graph


def q_x148_triangles(spark, sf_dir):
    """Triangle census (operators/graph.py:triangle_count) of the
    supplier co-occurrence graph — suppliers tied when they appear in
    ≥2 common orders (min_weight sparsification).  Degree-ordered
    wedge enumeration keeps the pivot fan-out O(√m) under hub skew;
    every count is an integer.  Top 30 nodes by triangle count."""
    from .operators.graph import triangle_count

    ls = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = ls.alias("a"), ls.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"),
        F.col("b.l_suppkey").alias("dst"),
    )
    out = triangle_count(pairs, min_weight=2)
    return (
        out.orderBy(F.desc("triangles"), F.asc("node"))
        .limit(30)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("degree").cast("long").alias("degree"),
            F.col("triangles").cast("long").alias("triangles"),
            "clustering",
        )
    )


SQL_X148 = """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
),
pairs AS (
  SELECT a.s AS u, b.s AS v FROM ls a JOIN ls b
  ON a.o = b.o AND a.s < b.s
),
canon AS (
  SELECT u, v FROM (
    SELECT u, v, count(*) AS w FROM pairs GROUP BY u, v
  ) WHERE w >= 2
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT u AS node FROM canon UNION ALL SELECT v AS node FROM canon
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b,
         CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS db
  FROM (
    SELECT c.u, c.v, d1.degree AS du, d2.degree AS dv
    FROM canon c
    JOIN deg d1 ON d1.node = c.u
    JOIN deg d2 ON d2.node = c.v
  )
),
wedges AS (
  SELECT e1.a AS p, e1.b AS x, e2.b AS y
  FROM oriented e1 JOIN oriented e2 ON e1.a = e2.a
  WHERE e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b)
),
tri AS (
  SELECT w.p, w.x, w.y
  FROM wedges w JOIN oriented o ON o.a = w.x AND o.b = w.y
),
per_node AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT p AS node FROM tri
    UNION ALL SELECT x AS node FROM tri
    UNION ALL SELECT y AS node FROM tri
  ) GROUP BY node
)
SELECT CAST(d.node AS BIGINT) AS node,
       CAST(d.degree AS BIGINT) AS degree,
       CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.degree >= 2
            THEN round(2.0 * coalesce(t.triangles, 0)
                 / (d.degree * (d.degree - 1.0)), 6) END AS clustering
FROM deg d LEFT JOIN per_node t ON t.node = d.node
ORDER BY triangles DESC, node ASC
LIMIT 30
"""


EXT4_QUERIES.update({"x148_triangles": q_x148_triangles})
EXT4_ORACLES.update({"x148_triangles": SQL_X148})


# ------------------------ x149: HITS hubs and authorities step


def q_x149_hits(spark, sf_dir):
    """One HITS superstep (operators/graph.py:hits_step) on the
    customer→supplier purchase graph (even/odd node encoding, the
    x91/x137 edge set): authorities = suppliers weighted by purchase
    volume, hubs = customers weighted by the authority of who they
    buy from.  Integer sums until the two final normalizations.
    Top 30 nodes by max(auth, hub)."""
    from .operators.graph import hits_step

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
    out = hits_step(edges, weight_col="w")
    return (
        out.orderBy(
            F.desc(F.greatest("auth", "hub")), F.asc("node")
        )
        .limit(30)
        .select(F.col("node").cast("long").alias("node"), "auth", "hub")
    )


SQL_X149 = """
WITH base AS (
  SELECT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v,
         count(*) AS w
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
auth_raw AS (SELECT v AS node, sum(w) AS a FROM base GROUP BY v),
hub_raw AS (
  SELECT b.u AS node, sum(b.w * ar.a) AS h
  FROM base b JOIN auth_raw ar ON ar.node = b.v
  GROUP BY b.u
),
tot AS (
  SELECT (SELECT sum(a) FROM auth_raw) AS ta,
         (SELECT sum(h) FROM hub_raw) AS th
),
joined AS (
  SELECT coalesce(ar.node, hr.node) AS node,
         coalesce(ar.a, 0) AS a, coalesce(hr.h, 0) AS h
  FROM auth_raw ar FULL OUTER JOIN hub_raw hr ON ar.node = hr.node
)
SELECT CAST(node AS BIGINT) AS node,
       round(a::DOUBLE / ta::DOUBLE, 6) AS auth,
       round(h::DOUBLE / th::DOUBLE, 6) AS hub
FROM joined CROSS JOIN tot
ORDER BY greatest(round(a::DOUBLE / ta::DOUBLE, 6),
                  round(h::DOUBLE / th::DOUBLE, 6)) DESC, node ASC
LIMIT 30
"""


EXT4_QUERIES.update({"x149_hits": q_x149_hits})
EXT4_ORACLES.update({"x149_hits": SQL_X149})


# ---------------- x150: Holt-Winters seasonal smoothing + forecast


def q_x150_holt_winters(spark, sf_dir):
    """Additive Holt–Winters smoothing (operators/temporal.py:
    holt_winters) of the monthly revenue series per region, period 12,
    alpha = beta = gamma = 0.5: final level/trend state plus the next
    four monthly forecasts.  The smoothing recursion is one
    left-to-right array fold per entity (sequential in time, parallel
    across entities — the BPE-fold contract), so both engines replay
    the identical IEEE op sequence; the input series itself is built
    from decimal sums for order-insensitivity."""
    from .operators.temporal import holt_winters

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    series = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("entity"),
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).alias("ym"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("v")
        )
    )
    return holt_winters(
        series,
        entity_col="entity",
        order_col="ym",
        value_col="v",
        alpha=0.5,
        beta=0.5,
        gamma=0.5,
        period=12,
        horizon=4,
    )


# NOTE: the oracle replays the smoothing recursion as a RECURSIVE CTE,
# one row per (entity, step), rather than a struct-accumulator
# list_reduce: DuckDB evaluates struct-literal lambda fields
# sequentially against a mutating accumulator (after 'l' is assigned,
# acc.l is already the NEW level when 'b' evaluates), which silently
# breaks any recurrence whose update uses the previous level.  The CTE
# computes l_new once in a derived table and is plain ANSI SQL.
SQL_X150 = """
WITH RECURSIVE series AS (
  SELECT r.r_name AS entity,
         date_part('year', o.o_orderdate) * 12
           + date_part('month', o.o_orderdate) AS ym,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS v
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
),
arr AS (
  SELECT entity, list(v ORDER BY ym) AS vals
  FROM series GROUP BY entity HAVING count(*) >= 24
),
ini AS (
  SELECT entity, vals, len(vals) AS n,
         list_reduce(vals[1:12], (acc, x) -> acc + x) / 12 AS l0
  FROM arr
),
st AS (
  SELECT entity, vals, n, CAST(12 AS BIGINT) AS i, l0 AS l,
         (list_reduce(vals[13:24], (acc, x) -> acc + x) / 12 - l0) / 12
           AS b,
         list_transform(vals[1:12], v -> v - l0) AS s
  FROM ini
  UNION ALL
  SELECT entity, vals, n, i + 1, ln,
         0.5 * (ln - l) + 0.5 * b,
         s[2:] || [0.5 * (y - ln) + 0.5 * s[1]]
  FROM (
    SELECT entity, vals, n, i, l, b, s, vals[i + 1] AS y,
           0.5 * (vals[i + 1] - s[1]) + 0.5 * (l + b) AS ln
    FROM st WHERE i < n
  )
)
SELECT entity, CAST(n AS BIGINT) AS n_obs,
       round(l, 6) AS level, round(b, 6) AS trend,
       round(l + 1 * b + s[1], 6) AS fc_1,
       round(l + 2 * b + s[2], 6) AS fc_2,
       round(l + 3 * b + s[3], 6) AS fc_3,
       round(l + 4 * b + s[4], 6) AS fc_4
FROM st WHERE i = n
"""


EXT4_QUERIES.update({"x150_holt_winters": q_x150_holt_winters})
EXT4_ORACLES.update({"x150_holt_winters": SQL_X150})


# ------------------ x151: LPA communities after three supersteps


def q_x151_lpa_communities(spark, sf_dir):
    """Community detection (operators/graph.py:label_propagation):
    three synchronous LPA supersteps over the customer–supplier trade
    graph (x137's edge set), then the 20 largest communities by
    member count.  Fixed round count in BOTH engines — synchronous
    LPA can oscillate on bipartite structure, so 'run to convergence'
    is not a cross-engine contract; integer weights keep each round
    engine-exact."""
    from .operators.graph import label_propagation

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
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(20)
        .select(F.col("label").cast("long").alias("label"), "size")
    )


SQL_X151 = """
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
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS size
FROM st WHERE i = 3
GROUP BY label
ORDER BY size DESC, label ASC
LIMIT 20
"""


EXT4_QUERIES.update({"x151_lpa_communities": q_x151_lpa_communities})
EXT4_ORACLES.update({"x151_lpa_communities": SQL_X151})


# -------------- x152: cross-source quantile normalization


def q_x152_quantile_normalize(spark, sf_dir):
    """Batch-effect correction (operators/sketch.py:
    quantile_normalize): per-source document lengths mapped onto the
    global length distribution at 20-bin resolution, so one global
    threshold treats every source fairly.  One pass to (source,
    value) counts; mid-rank quantiles over distinct values only; the
    global quantile function is a single broadcast percentile array."""
    from .operators.sketch import quantile_normalize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "value", F.length("text").cast("long")
    )
    out = quantile_normalize(docs, "value", "source", n_bins=20)
    return out.select(
        "source", "value", "n", "q", "bin", "norm_value"
    )


def _sql_x152() -> str:
    fracs = ", ".join(repr((k + 0.5) / 20) for k in range(20))
    return f"""
WITH per AS (
  SELECT source, len(text) AS value, count(*) AS n
  FROM documents WHERE text IS NOT NULL
  GROUP BY source, len(text)
),
q AS (
  SELECT source, value, n,
         ((sum(n) OVER (PARTITION BY source ORDER BY value ASC)
           - n)::DOUBLE + n::DOUBLE / 2.0)
         / (sum(n) OVER (PARTITION BY source))::DOUBLE AS qv
  FROM per
),
binned AS (
  SELECT source, value, n, qv,
         least(CAST(floor(qv * 20) AS BIGINT), 19) AS bin
  FROM q
),
reps AS (
  SELECT CAST(u.i - 1 AS BIGINT) AS bin, t.l[u.i] AS rep
  FROM (SELECT quantile_cont(len(text), [{fracs}]) AS l
        FROM documents WHERE text IS NOT NULL) t,
       unnest(range(1, len(t.l) + 1)) AS u(i)
)
SELECT b.source, CAST(b.value AS BIGINT) AS value,
       CAST(b.n AS BIGINT) AS n, round(b.qv, 6) AS q, b.bin,
       round(r.rep, 6) AS norm_value
FROM binned b JOIN reps r ON r.bin = b.bin
"""


EXT4_QUERIES.update({"x152_quantile_normalize": q_x152_quantile_normalize})
EXT4_ORACLES.update({"x152_quantile_normalize": _sql_x152()})


# ------------------- x153: per-group embedding centroid drift


def q_x153_centroid_drift(spark, sf_dir):
    """Embedding-space source fingerprint (operators/similarity.py:
    centroid_drift): each label group's mean vector vs the corpus
    mean, by cosine and L2 — the encoder-skew audit run before
    vectors feed cosine-threshold dedup.  One posexplode + decimal
    (group, dim) aggregation; everything after runs on
    |groups|×64 rows."""
    from .operators.similarity import centroid_drift

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = centroid_drift(emb, "embedding", "label")
    return out.select(
        F.col("label").cast("long").alias("label"),
        "n",
        "cos_global",
        "l2_dist",
    )


SQL_X153 = """
WITH ex AS (
  SELECT label AS grp, u.d AS d, CAST(embedding[u.d] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(d)
  WHERE embedding IS NOT NULL
),
sums AS (
  SELECT grp, d, sum(CAST(x AS DECIMAL(38,12))) AS sx, count(*) AS n
  FROM ex GROUP BY grp, d
),
gtot AS (SELECT d, sum(sx) AS gx, sum(n) AS gn FROM sums GROUP BY d),
m AS (
  SELECT s.grp, s.n,
         s.sx::DOUBLE / s.n::DOUBLE AS mg,
         g.gx::DOUBLE / g.gn::DOUBLE AS mbig
  FROM sums s JOIN gtot g ON g.d = s.d
),
agg AS (
  SELECT grp, max(n) AS n,
         sum((mg * mbig)::DECIMAL(38,12)) AS dot,
         sum((mg * mg)::DECIMAL(38,12)) AS aa,
         sum((mbig * mbig)::DECIMAL(38,12)) AS bb,
         sum(((mg - mbig) * (mg - mbig))::DECIMAL(38,12)) AS d2
  FROM m GROUP BY grp
)
SELECT CAST(grp AS BIGINT) AS label, CAST(n AS BIGINT) AS n,
       round(dot::DOUBLE / (sqrt(aa::DOUBLE) * sqrt(bb::DOUBLE)), 6)
         AS cos_global,
       round(sqrt(d2::DOUBLE), 6) AS l2_dist
FROM agg
"""


EXT4_QUERIES.update({"x153_centroid_drift": q_x153_centroid_drift})
EXT4_ORACLES.update({"x153_centroid_drift": SQL_X153})


# ------------------------ x154: stratified split balance audit


def q_x154_split_audit(spark, sf_dir):
    """Split release gate (operators/mixing.py:split_audit): the
    deterministic 80/10/10 hash-band split (x-family membership
    discipline: pure function of doc_id, no RNG state) audited per
    language — achieved rate vs target per (lang, split), the check
    that catches a small stratum landing lopsided before training.
    Assignment is a map-side CASE in the scan stage; the audit is one
    bounded aggregation."""
    from .operators.mixing import split_audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return split_audit(
        docs,
        "doc_id",
        ["lang"],
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )


SQL_X154 = """
WITH h AS (
  SELECT lang,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
          1, 8))::BIGINT::DOUBLE / 4294967296.0 AS hv
  FROM documents
),
asg AS (
  SELECT lang,
         CASE WHEN hv >= 0.0 AND hv < 0.8 THEN 'train'
              WHEN hv >= 0.8 AND hv < 0.9 THEN 'val'
              WHEN hv >= 0.9 AND hv < 1.0 THEN 'test' END AS split
  FROM h
),
counts AS (
  SELECT lang, split, count(*) AS n FROM asg GROUP BY lang, split
),
tot AS (
  SELECT lang, split, n, sum(n) OVER (PARTITION BY lang)
           AS stratum_total
  FROM counts
)
SELECT lang, split, CAST(n AS BIGINT) AS n,
       CAST(stratum_total AS BIGINT) AS stratum_total,
       round(n::DOUBLE / stratum_total::DOUBLE, 6) AS rate,
       CASE WHEN split = 'train' THEN 0.8
            WHEN split = 'val' THEN 0.1
            WHEN split = 'test' THEN 0.1 END AS target_rate,
       round(round(n::DOUBLE / stratum_total::DOUBLE, 6)
             - CASE WHEN split = 'train' THEN 0.8
                    WHEN split = 'val' THEN 0.1
                    WHEN split = 'test' THEN 0.1 END, 6) AS rate_gap
FROM tot
"""


EXT4_QUERIES.update({"x154_split_audit": q_x154_split_audit})
EXT4_ORACLES.update({"x154_split_audit": SQL_X154})


# ------------------ x155: cross-source LM cross-entropy matrix


def q_x155_source_cross_entropy(spark, sf_dir):
    """Domain-similarity matrix (operators/text.py:
    source_cross_entropy): add-0.5-smoothed unigram cross-entropy of
    every source under every other source's LM — the table
    model-based data selection starts from.  Absent-vocabulary mass
    folds in analytically, so the term join is INNER on shared terms
    only; per-term products are decimal-summed."""
    from .operators.text import source_cross_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return source_cross_entropy(docs, "text", "source", alpha=0.5)


SQL_X155 = """
WITH nt AS (
  SELECT source, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
tok AS (
  SELECT source AS grp,
         unnest(list_filter(string_split(t, ' '), x -> x <> '')) AS term
  FROM nt
),
counts AS (SELECT grp, term, count(*) AS cnt FROM tok GROUP BY grp, term),
totals AS (SELECT grp, sum(cnt) AS n_tok FROM counts GROUP BY grp),
v AS (SELECT count(DISTINCT term) AS vocab FROM counts),
pair AS (
  SELECT cs.grp AS p_source, ct.grp AS q_source,
         count(*) AS n_shared_terms,
         sum(cs.cnt) AS cov,
         sum((cs.cnt::DOUBLE * ln(ct.cnt::DOUBLE + 0.5))::DECIMAL(38,12))
           AS slq
  FROM counts cs JOIN counts ct ON cs.term = ct.term
  GROUP BY 1, 2
),
scored AS (
  SELECT p_source, q_source, n_shared_terms,
         cov::DOUBLE / tp.n_tok::DOUBLE AS p_mass,
         ln(tq.n_tok::DOUBLE + 0.5 * v.vocab::DOUBLE)
           - slq::DOUBLE / tp.n_tok::DOUBLE
           - (1.0 - cov::DOUBLE / tp.n_tok::DOUBLE) * ln(0.5) AS ce
  FROM pair
  JOIN totals tp ON tp.grp = p_source
  JOIN totals tq ON tq.grp = q_source
  CROSS JOIN v
)
SELECT p_source, q_source,
       CAST(n_shared_terms AS BIGINT) AS n_shared_terms,
       round(p_mass, 6) AS p_mass_covered,
       round(ce, 6) AS cross_entropy,
       round(exp(ce), 6) AS perplexity
FROM scored
"""


EXT4_QUERIES.update({"x155_source_cross_entropy": q_x155_source_cross_entropy})
EXT4_ORACLES.update({"x155_source_cross_entropy": SQL_X155})


# -------------------------- x156: k-core of the co-purchase graph


def q_x156_kcore(spark, sf_dir):
    """k-core peeling (operators/graph.py:kcore): the 2-core of the
    part co-purchase graph (parts sharing >= 2 orders), eight fixed
    peels — idempotent at the fixpoint, so the fixed-round oracle
    replays it exactly.  The 100 heaviest surviving nodes by in-core
    degree."""
    from .operators.graph import kcore

    ls = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = ls.alias("a"), ls.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
        .select("src", "dst")
    )
    out = kcore(pairs, k=2, n_iter=8)
    return (
        out.orderBy(F.desc("core_degree"), F.asc("node"))
        .limit(100)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("core_degree").cast("long").alias("core_degree"),
        )
    )


SQL_X156 = """
WITH RECURSIVE ls AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem
),
pairs AS (
  SELECT a.s AS u, b.s AS v FROM ls a JOIN ls b
  ON a.o = b.o AND a.s < b.s
),
canon AS (
  SELECT u, v FROM (
    SELECT u, v, count(*) AS w FROM pairs GROUP BY u, v
  ) WHERE w >= 2
),
sym AS (SELECT u, v FROM canon UNION ALL SELECT v AS u, u AS v FROM canon),
st AS (
  SELECT 0 AS i, (SELECT list(DISTINCT u) FROM sym) AS members
  UNION ALL
  SELECT i + 1,
         (SELECT list(t.u) FROM (
            SELECT e.u FROM sym e
            WHERE list_contains(st.members, e.u)
              AND list_contains(st.members, e.v)
            GROUP BY e.u HAVING count(*) >= 2) t)
  FROM st WHERE i < 7
),
fin AS (SELECT members FROM st WHERE i = 7)
SELECT CAST(e.u AS BIGINT) AS node,
       CAST(count(*) AS BIGINT) AS core_degree
FROM sym e, fin
WHERE list_contains(fin.members, e.u) AND list_contains(fin.members, e.v)
GROUP BY e.u HAVING count(*) >= 2
ORDER BY core_degree DESC, node ASC
LIMIT 100
"""


EXT4_QUERIES.update({"x156_kcore": q_x156_kcore})
EXT4_ORACLES.update({"x156_kcore": SQL_X156})


# --------------------- x157: degree assortativity fingerprint


def q_x157_assortativity(spark, sf_dir):
    """Degree-mixing fingerprint (operators/graph.py:
    degree_assortativity): Newman's assortativity coefficient of the
    part co-purchase graph — one Pearson correlation of endpoint
    degrees over the symmetric edge list, decimal moment sums,
    broadcast degree lookups."""
    from .operators.graph import degree_assortativity

    ls = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = ls.alias("a"), ls.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
        .select("src", "dst")
    )
    return degree_assortativity(pairs)


SQL_X157 = """
WITH ls AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem
),
pairs AS (
  SELECT a.s AS u, b.s AS v FROM ls a JOIN ls b
  ON a.o = b.o AND a.s < b.s
),
canon AS (
  SELECT u, v FROM (
    SELECT u, v, count(*) AS w FROM pairs GROUP BY u, v
  ) WHERE w >= 2
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM canon UNION ALL SELECT v AS node FROM canon
  ) GROUP BY node
),
sym AS (SELECT u, v FROM canon UNION ALL SELECT v AS u, u AS v FROM canon),
ed AS (
  SELECT du.deg AS dx, dv.deg AS dy
  FROM sym JOIN deg du ON du.node = sym.u JOIN deg dv ON dv.node = sym.v
),
m AS (
  SELECT count(*) AS n,
         sum(dx::DECIMAL(38,6)) AS sx, sum(dy::DECIMAL(38,6)) AS sy,
         sum((dx::DOUBLE * dy::DOUBLE)::DECIMAL(38,6)) AS sxy,
         sum((dx::DOUBLE * dx::DOUBLE)::DECIMAL(38,6)) AS sxx,
         sum((dy::DOUBLE * dy::DOUBLE)::DECIMAL(38,6)) AS syy
  FROM ed
)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM canon) AS BIGINT) AS n_edges,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
             6) AS assortativity
FROM m
"""


EXT4_QUERIES.update({"x157_assortativity": q_x157_assortativity})
EXT4_ORACLES.update({"x157_assortativity": SQL_X157})
