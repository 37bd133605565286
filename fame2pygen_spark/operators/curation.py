"""End-to-end training-data curation pipeline.

Composes the scale extensions into the filter → exact-dedup →
near-dedup flow a 100 TB corpus actually runs (the reference has no
analog — this is BASELINE.json north-star surface):

1. profile every document (quality score, language id — pure column
   algebra, one scan);
2. drop low-quality and out-of-language docs *first*, so every later
   stage works on the reduced corpus (filter before shuffle);
3. exact dedup: min-id survivor per md5 fingerprint (one shuffle);
4. near dedup: MinHash-LSH candidate pairs → connected components →
   drop every non-canonical cluster member.

Each stage is the operator documented in its own module; this is pure
composition, and the whole pipeline stays oracle-checkable because each
stage is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dedup_exact, duplicate_clusters, minhash_lsh_pairs
from .text import text_profile


def curate_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_quality: float = 0.55,
    languages: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.6,
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Curated corpus: quality/language-passed, exact- and near-deduped.

    Returns the surviving rows of *df* extended with ``quality`` and
    ``lang_pred``.  Near-dup survivors are the minimum-id member of
    each LSH cluster (see :func:`~.dedup.duplicate_clusters`).

    Scale shape: stage 2's filter cuts the corpus before any shuffle;
    stage 3 shuffles once on the 128-bit fingerprint (uniform); stage 4
    runs LSH banding on the already-deduped corpus and the component
    iterations only touch the pair list (tiny relative to the corpus).
    The final removal is a broadcastable left-anti join on doc id.
    """
    prof = text_profile(df, text_col)
    passed = prof.where(
        (F.col("quality") >= F.lit(min_quality))
        & F.col("lang_pred").isin(*languages)
    )
    exact_kept = dedup_exact(passed, text_col, id_col)
    # the reduced corpus feeds the LSH stage (itself several plan
    # branches: signatures, verify shingles, participants) AND the
    # final anti-join left side — without materialization each branch
    # re-runs the profile (the tokenization regexes dominate) and the
    # fingerprint window.  One checkpoint of the already-filtered,
    # already-deduped corpus replaces them all; duplicate_clusters
    # checkpoints its own iterations anyway, so this adds the only
    # remaining redundant subtree.  (Cluster: prefer checkpoint() with
    # a reliable dir if executor loss matters.)
    exact_kept = exact_kept.localCheckpoint(eager=True)
    pairs = minhash_lsh_pairs(
        exact_kept,
        text_col,
        id_col,
        n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=near_dup_threshold,
    )
    drop = (
        duplicate_clusters(pairs)
        .where(~F.col("is_canonical"))
        .select(F.col("doc").alias(id_col))
    )
    return exact_kept.join(F.broadcast(drop), on=id_col, how="left_anti")


def quality_survivors(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    near_dup_threshold: float = 0.6,
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-dup clusters resolved with a QUALITY-aware survivor policy
    (r9): instead of :func:`~.dedup.duplicate_clusters`' min-id
    canonical, each cluster keeps its highest-``quality`` member
    (ties → smaller id) — the policy a production corpus actually
    wants, since near-dup groups usually contain one clean copy and
    several boilerplate-damaged ones.

    Scale shape: the LSH pair list is tiny relative to the corpus, so
    the survivor election is one ``max_by`` over a (quality, −id)
    total order per component plus one broadcastable profile join —
    no new wide shuffle beyond the x03/x09 machinery it composes.

    Output, one row per CLUSTER: ``component, survivor,
    survivor_quality, cluster_size, dropped``.
    """
    from .dedup import duplicate_clusters, minhash_lsh_pairs
    from .text import text_profile

    prof = text_profile(df, text_col).select(
        F.col(id_col).alias("doc"), "quality"
    )
    pairs = minhash_lsh_pairs(
        df, text_col, id_col,
        n=shingle_n, num_hashes=num_hashes, bands=bands,
        threshold=near_dup_threshold,
    )
    clusters = duplicate_clusters(pairs)
    scored = clusters.join(prof, on="doc")
    return (
        scored.groupBy("component")
        .agg(
            F.max_by(
                F.col("doc"),
                F.struct(F.col("quality"), -F.col("doc")),
            ).cast("long").alias("survivor"),
            F.max("quality").alias("survivor_quality"),
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            (F.count(F.lit(1)) - 1).cast("long").alias("dropped"),
        )
        .select(
            F.col("component").cast("long").alias("component"),
            "survivor", "survivor_quality", "cluster_size", "dropped",
        )
        .orderBy("component")
    )


def quality_survivors_keyed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    partition_col: str,
    *,
    near_dup_threshold: float = 0.6,
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Entity-scoped survivor election (the curation panel lane):
    :func:`quality_survivors` with the pair generation keyed by
    *partition_col* (:func:`~.dedup.minhash_lsh_pairs_keyed`), so a
    document can only be deduplicated against its own entity — the
    per-tenant / per-source policy a multi-corpus ingest needs, where
    the same boilerplate in two tenants' corpora must NOT elect one
    tenant's copy over the other's.

    The component machinery runs UNKEYED on purpose: keyed pairs never
    cross an entity, so connected components are entity-local by edge
    construction and re-keying the star rounds would add a shuffle
    column for no semantic gain — the entity re-attaches at election
    time via the unique (id, entity) map the keyed pair stage already
    asserted in-plan.

    Output, one row per (entity, cluster): ``partition_col, component,
    survivor, survivor_quality, cluster_size, dropped``.
    """
    from .dedup import duplicate_clusters, minhash_lsh_pairs_keyed
    from .text import text_profile

    prof = text_profile(df, text_col).select(
        F.col(id_col).alias("doc"), "quality"
    )
    pairs = minhash_lsh_pairs_keyed(
        df, text_col, id_col, partition_col,
        n=shingle_n, num_hashes=num_hashes, bands=bands,
        threshold=near_dup_threshold,
    )
    clusters = duplicate_clusters(pairs.select("id_a", "id_b"))
    keys = df.select(
        F.col(id_col).alias("doc"), F.col(partition_col).alias("__pk")
    ).dropDuplicates(["doc"])
    scored = clusters.join(prof, on="doc").join(keys, on="doc")
    return (
        scored.groupBy("__pk", "component")
        .agg(
            F.max_by(
                F.col("doc"),
                F.struct(F.col("quality"), -F.col("doc")),
            ).cast("long").alias("survivor"),
            F.max("quality").alias("survivor_quality"),
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            (F.count(F.lit(1)) - 1).cast("long").alias("dropped"),
        )
        .select(
            F.col("__pk").alias(partition_col),
            F.col("component").cast("long").alias("component"),
            "survivor", "survivor_quality", "cluster_size", "dropped",
        )
        .orderBy(partition_col, "component")
    )
