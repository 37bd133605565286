"""Similarity search over embedding columns (array<float>).

BASELINE.json north-star extension — approximate nearest neighbor over
an embedding column, designed Spark-first:

cosine_topk (exact baseline)
    broadcast the (small) query set against the corpus, compute cosine
    with pure column algebra (``zip_with`` + sequential ``aggregate``
    fold — deterministic summation order, reproducible in an external
    oracle), rank per query with a window.  At 100 TB the corpus side
    streams through executors once; the only shuffle is the per-query
    top-k (keyed by query id, k rows per partition survive).

hyperplane_lsh_topk (scale path)
    random-hyperplane LSH: sign-bit bucket per document (seeded,
    deterministic planes), candidates = same bucket (plus optional
    multi-probe neighbors at Hamming distance 1), exact re-rank inside
    the bucket.  Converts the all-pairs scan into an equi-join on the
    bucket key — the standard IVF/LSH trade: recall vs. candidate count
    (``nbits`` tunes bucket granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — deterministic order (index 0..n)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def prenormed_cosine(
    v: Column, q: Column, nv: Column, nq: Column
) -> Column:
    """6-dp cosine from PREcomputed norms — the shared per-pair score
    of every scorer here (norms are hoisted to once-per-row before the
    join; a dim-element fold per pair would triple the hot-path cost).
    One definition on purpose: the oracles depend on every scorer
    producing float-identical values."""
    return F.round(dot(v, q) / (nv * nq), 6)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, rank, score) with score rounded to
    6dp and rank = dense position by (score desc, neighbor_id) — fully
    deterministic even under score ties.
    """
    # norms hoisted below the join: the cross join evaluates |Q| score
    # expressions per corpus row, and each l2_norm is a dim-element
    # fold — computing them once per row (not once per pair) is the
    # same float value (identical fold) at 1/|Q| the corpus-side cost
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).withColumn("__nv", l2_norm(F.col("__v")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("__q"),
    ).withColumn("__nq", l2_norm(F.col("__q")))
    scored = c.join(F.broadcast(q))
    if not include_self:
        scored = scored.where(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn(
        "score",
        prenormed_cosine(
                F.col("__v"), F.col("__q"),
                F.col("__nv"), F.col("__nq"),
            ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def cosine_topk_keyed(
    corpus: DataFrame,
    queries: DataFrame,
    partition_col: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Entity-scoped exact top-k cosine neighbors (the panel lane of
    :func:`cosine_topk`, r9): both sides carry *partition_col* and the
    score join is KEY-EQUI on it — never a global broadcast cross — so
    each entity's query×corpus block computes independently and the
    pair space is Σ_e |Q_e|·|C_e| instead of |Q|·|C|.  At 100 TB this
    is per-tenant / per-shard retrieval: the join shuffles once on the
    entity hash, adding entities adds partitions, and a hot entity is
    bounded by its own block, not the corpus.

    Output: (partition_col, query_id, neighbor_id, rank, score) with
    the same 6-dp deterministic (score desc, neighbor_id) rank order
    as the global operator.
    """
    c = corpus.select(
        F.col(partition_col).alias("__pk"),
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).withColumn("__nv", l2_norm(F.col("__v")))
    q = queries.select(
        F.col(partition_col).alias("__pk"),
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("__q"),
    ).withColumn("__nq", l2_norm(F.col("__q")))
    scored = c.join(q, on="__pk")
    if not include_self:
        scored = scored.where(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn(
        "score",
        prenormed_cosine(
            F.col("__v"), F.col("__q"), F.col("__nv"), F.col("__nq")
        ),
    )
    w = Window.partitionBy("__pk", "query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__pk").alias(partition_col),
            "query_id", "neighbor_id", "rank", "score",
        )
    )


def _hyperplanes(dim: int, nbits: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side constants)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)]


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of *vec* against the hyperplanes (int64)."""
    out = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(w) for w in plane]))
        out = out + F.when(
            proj >= 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return out


def ivf_centroids(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
) -> list[list[float]]:
    """Train the IVF coarse quantizer (k-means) and return centroids.

    Driver-side constants afterwards — the index is the centroid list
    plus the cluster-id column, no ANN library required.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(_as_double(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=k, seed=seed, initMode="k-means||").fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _centroid_dists(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<dist,cid>> of squared L2 distances to each centroid."""
    items = []
    for cid, c in enumerate(centroids):
        carr = F.array(*[F.lit(w) for w in c])
        c2 = sum(w * w for w in c)
        d2 = dot(vec, vec) - F.lit(2.0) * dot(vec, carr) + F.lit(c2)
        items.append(F.struct(d2.alias("dist"), F.lit(cid).alias("cid")))
    return F.array(*items)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    include_self: bool = False,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer, queries probe
    their *nprobe* nearest cells, exact cosine re-rank inside the cells.

    The corpus shuffles once on the cell id (in production the list
    file is pre-partitioned/bucketed by cell); queries explode into
    nprobe rows and broadcast — candidates = corpus rows in probed
    cells only, ~nprobe/n_clusters of the data.
    """
    if centroids is None:
        centroids = ivf_centroids(
            corpus, vec_col=vec_col, k=n_clusters, seed=seed
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).withColumn(
        "__cell", F.array_min(_centroid_dists(F.col("__v"), centroids))["cid"]
    ).withColumn("__nv", l2_norm(F.col("__v")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("__q"),
    ).withColumn("__nq", l2_norm(F.col("__q"))).withColumn(
        "__cell",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_centroid_dists(F.col("__q"), centroids)),
                    1, nprobe,
                ),
                lambda s: s["cid"],
            )
        ),
    )
    cand = c.join(F.broadcast(q), on="__cell")
    if not include_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    # per-row (not per-pair) norms, cf. cosine_topk
    cand = cand.withColumn(
        "score",
        prenormed_cosine(
                F.col("__v"), F.col("__q"),
                F.col("__nv"), F.col("__nq"),
            ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    nbits: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, banded-hyperplane blocked.

    The all-pairs O(n²) cosine space is cut to an equi-join on banded
    sign-bit keys (the MinHash-LSH shape, ``dedup.minhash_lsh_pairs``):
    *bands* independent signatures of *nbits* hyperplane sign bits
    each; a pair is a candidate iff it agrees on ≥1 full band.  Vectors
    within angle θ agree on one hyperplane with probability 1−θ/π, so
    recall for a pair at angle θ is 1−(1−p^nbits)^bands with p=1−θ/π —
    banding restores the recall a single fine signature gives up, while
    2^nbits keys per band keep buckets small.  Each bucket is further
    capped at *max_bucket* members (deterministic ``row_number`` by id,
    same guard as ``minhash_lsh_pairs``) so degenerate corpora — many
    identical vectors — cannot make the in-bucket self-join quadratic.
    Only (id, band, key) rows are shuffled into the join; embedding
    arrays are joined back for exact scoring on the surviving
    candidates alone.

    Everything is deterministic (seeded planes, sequential-fold dot
    products, id-ordered cap), so an external oracle reproduces the
    exact pair set.

    Output: (id_a, id_b, score) with id_a < id_b, score = cosine 6dp.
    """
    planes = _hyperplanes(dim, nbits * bands, seed)
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("__v")
    )
    band_keys = [
        F.struct(
            F.lit(b).alias("band"),
            hyperplane_bucket(
                F.col("__v"), planes[b * nbits : (b + 1) * nbits]
            ).alias("key"),
        )
        for b in range(bands)
    ]
    banded = base.select(
        "id", F.explode(F.array(*band_keys)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    # cap bucket membership to bound the self-join (cf. dedup.py
    # minhash max_bucket guard)
    wb = Window.partitionBy("band", "key").orderBy("id")
    banded = (
        banded.withColumn("__rn", F.row_number().over(wb))
        .where(F.col("__rn") <= max_bucket)
        .drop("__rn")
    )

    left = banded.select("band", "key", F.col("id").alias("id_a"))
    right = banded.select("band", "key", F.col("id").alias("id_b"))
    cand = (
        left.join(right, on=["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # per-row (not per-pair) norms, cf. cosine_topk
    withn = base.withColumn("__n", l2_norm(F.col("__v")))
    return (
        cand.join(withn.select(F.col("id").alias("id_a"),
                               F.col("__v").alias("__va"),
                               F.col("__n").alias("__na")), on="id_a")
        .join(withn.select(F.col("id").alias("id_b"),
                           F.col("__v").alias("__vb"),
                           F.col("__n").alias("__nb")), on="id_b")
        .withColumn(
            "score",
            prenormed_cosine(
                F.col("__va"), F.col("__vb"),
                F.col("__na"), F.col("__nb"),
            ),
        )
        .where(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
    nbits: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k: bucket by random hyperplane signs, exact
    re-rank within the shared bucket (equi-join on bucket id).

    ``multiprobe`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (nbits+1 probes per query) —
    near-neighbors that straddle a single hyperplane are recovered at
    the cost of ~nbits× more candidate rows on the (small, broadcast)
    query side only.
    """
    planes = _hyperplanes(dim, nbits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).withColumn(
        "__bucket", hyperplane_bucket(F.col("__v"), planes)
    ).withColumn("__nv", l2_norm(F.col("__v")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("__q"),
    ).withColumn(
        "__b0", hyperplane_bucket(F.col("__q"), planes)
    ).withColumn("__nq", l2_norm(F.col("__q")))
    if multiprobe:
        probes = F.array(
            F.col("__b0"),
            *[
                F.col("__b0").bitwiseXOR(
                    F.shiftleft(F.lit(1).cast("long"), b)
                )
                for b in range(nbits)
            ],
        )
        q = q.withColumn("__bucket", F.explode(probes)).drop("__b0")
    else:
        q = q.withColumnRenamed("__b0", "__bucket")

    cand = c.join(F.broadcast(q), on="__bucket").dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    if not include_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    # per-row (not per-pair) norms, cf. cosine_topk
    cand = cand.withColumn(
        "score",
        prenormed_cosine(
                F.col("__v"), F.col("__q"),
                F.col("__nv"), F.col("__nq"),
            ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


# -------------------------------------------- embedding quantization


def quantize_embeddings(
    df: DataFrame, vec_col: str, id_col: str, *, bits: int = 8
) -> DataFrame:
    """Per-vector symmetric scalar quantization of an embedding column
    (the faiss ``SQ8``-style storage cut: float32 → int8 is 4×).

    ``scale = max(|v_i|) / (2^(bits-1) − 1)``; each component becomes
    ``floor(v_i / scale + 0.5)`` (explicit half-up — Spark's and
    DuckDB's ``round`` disagree on negative halves, ``floor(x+0.5)``
    does not).  Zero vectors quantize to zeros with scale 0.

    Everything is row-local column algebra — the operator is a pure
    map, NO shuffle at any scale; it rides inside the scan stage.
    (Per-dimension global-minmax quantization would need a corpus
    aggregate; the per-vector variant is what similarity search
    actually uses, since dequantization needs only the row's scale.)

    Returns ``(id, scale, q  array<int>, max_abs_err)`` where
    ``max_abs_err`` is the row's worst reconstruction error
    ``max |dequant − v|`` (rounded 6dp) — the quality metric a
    pipeline monitors when deciding bits.
    """
    qmax = float(2 ** (bits - 1) - 1)
    v = _as_double(F.col(vec_col))
    scale = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    ) / F.lit(qmax)
    out = df.select(
        F.col(id_col),
        v.alias("__v"),
        scale.alias("scale"),
    )
    q = F.transform(
        F.col("__v"),
        lambda x: F.when(F.col("scale") > 0, F.floor(x / F.col("scale") + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    out = out.withColumn("q", q)
    err = F.aggregate(
        F.zip_with(
            F.col("__v"),
            F.col("q"),
            lambda x, qi: F.abs(qi.cast("double") * F.col("scale") - x),
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
    # err is staged BEFORE the select that re-aliases "scale" to its
    # rounded form: Spark's lateral column alias resolution would
    # otherwise bind err's `scale` reference to the rounded alias
    # defined earlier in the same select list (measured: max_abs_err
    # drifts by ~2e-6 against the oracle)
    out = out.withColumn("max_abs_err", F.round(err, 6))
    return out.select(
        id_col,
        F.round(F.col("scale"), 6).alias("scale"),
        "q",
        "max_abs_err",
    )


def _fold_sq_dist(vec: Column, carr: Column) -> Column:
    """Squared L2 distance as a SEQUENTIAL left fold over dims (index
    order) — bitwise reproducible by any engine that folds a list left
    to right (DuckDB ``list_reduce``), unlike a tree-reduced sum."""
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_step(
    df: DataFrame,
    *,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    inertia_bits: int = 20,
    mean_bits: int = 30,
    shift_bits: int = 40,
) -> DataFrame:
    """ONE Lloyd iteration of k-means against pinned *centroids*:
    assign every vector to its nearest centroid (squared L2, ties to
    the lowest cluster id), then report per cluster the member count,
    the mean squared distance (inertia / n), and how far the recomputed
    mean moved from the old centroid.

    Distributed shape — the iteration is two narrow aggregations:
    ``groupBy(cluster)`` for n/inertia and ``groupBy(cluster, dim)``
    for the per-dimension mean (posexplode, map-side partial sums).
    Centroids are broadcast literals; nothing driver-side grows with
    the data, so the same plan is the 100 TB plan (k·dim aggregate
    cells).  Iterating to convergence = re-invoking with the new
    means; each step is one job.

    Engine-exactness: every float reduction is either a sequential
    left fold in index order (:func:`_fold_sq_dist`) or a sum of
    ``floor(x * 2^bits)`` integers (multiplying by a power of two is
    exact, ``floor`` is exact, integer sums are order-insensitive) —
    so a SQL engine reproduces n, msd, and shift to the last bit.
    The scaled sums stay exact in double below 2^53 (document counts
    ~10^12 at 100 TB: keep ``mean_bits`` ≤ 40 and they still fit
    decimal(38,0) with room).

    Output: ``cluster, n, msd, shift`` (6 dp).
    """
    v = _as_double(F.col(vec_col))
    items = []
    for cid, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(w)) for w in c])
        items.append(
            F.struct(
                _fold_sq_dist(v, carr).alias("dist"),
                F.lit(cid).alias("cid"),
            )
        )
    best = F.array_min(F.array(*items))
    assigned = df.select(
        F.col(id_col).alias("id"),
        v.alias("__v"),
        best["cid"].alias("cluster"),
        best["dist"].alias("__d2"),
    )

    dec = "decimal(38,0)"
    per_cluster = assigned.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.floor(F.col("__d2") * F.lit(float(1 << inertia_bits))).cast(dec)
        ).alias("__inertia_s"),
    )

    dims = assigned.select(
        "cluster", F.posexplode("__v").alias("dim0", "val")
    ).select(
        "cluster", (F.col("dim0") + 1).alias("dim"), F.col("val")
    )
    dim_sums = dims.groupBy("cluster", "dim").agg(
        F.count("*").cast("long").alias("__n"),
        F.sum(
            F.floor(F.col("val") * F.lit(float(1 << mean_bits))).cast(dec)
        ).alias("__s"),
    )

    spark = df.sparkSession
    cent_rows = [
        (cid, d + 1, float(c[d]))
        for cid, c in enumerate(centroids)
        for d in range(len(c))
    ]
    cent_df = spark.createDataFrame(
        cent_rows, "cluster int, dim int, cval double"
    )

    mean_d = (
        F.col("__s").cast("double") / F.lit(float(1 << mean_bits))
    ) / F.col("__n")
    shifts = (
        dim_sums.join(F.broadcast(cent_df), on=["cluster", "dim"])
        .withColumn("__diff", mean_d - F.col("cval"))
        .groupBy("cluster")
        .agg(
            F.sum(
                F.floor(
                    F.col("__diff") * F.col("__diff")
                    * F.lit(float(1 << shift_bits))
                ).cast(dec)
            ).alias("__shift_s")
        )
    )

    return (
        per_cluster.join(shifts, on="cluster")
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            "n",
            F.round(
                (
                    F.col("__inertia_s").cast("double")
                    / F.lit(float(1 << inertia_bits))
                )
                / F.col("n"),
                6,
            ).alias("msd"),
            F.round(
                F.sqrt(
                    F.col("__shift_s").cast("double")
                    / F.lit(float(1 << shift_bits))
                ),
                6,
            ).alias("shift"),
        )
    )


def rrf_fuse(
    ranked: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    retrieval lists: ``score(d) = sum_i 1 / (k + rank_i(d))`` over the
    lists where *d* appears.  The standard way to combine lexical
    (BM25) and dense (embedding) retrieval without score calibration —
    only RANKS cross the fusion boundary, so the lists' scoring scales
    never have to be commensurable.

    Each input must have (*id_col*, *rank_col*).  Fusion is an N-way
    full outer join on the id (each list is already top-n sized — tiny
    — so at scale these are broadcast joins of bounded row counts no
    matter the corpus size; the heavy lifting happened inside each
    retriever).  The RRF sum adds terms in list order — a fixed
    expression shape any engine reproduces bitwise.

    Output: ``(id, rank_1..rank_N (null where absent), rrf,
    fused_rank)`` limited to *top_n* by (rrf desc, id).
    """
    if len(ranked) < 2:
        raise ValueError("need at least 2 ranked lists")
    out = None
    terms = []
    for i, df in enumerate(ranked, start=1):
        part = df.select(
            F.col(id_col).alias("id"),
            F.col(rank_col).cast("long").alias(f"rank_{i}"),
        )
        out = part if out is None else out.join(part, on="id", how="full")
        terms.append(
            F.coalesce(
                F.lit(1.0) / (F.lit(float(k)) + F.col(f"rank_{i}")),
                F.lit(0.0),
            )
        )
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    out = out.withColumn("rrf", F.round(score, 6))
    w = Window.orderBy(F.desc("rrf"), F.asc("id"))
    # unpartitioned window, but over |lists| * top_n rows only
    return (
        out.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= top_n)
        .select(
            "id",
            *[f"rank_{i}" for i in range(1, len(ranked) + 1)],
            "rrf",
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )


def embedding_covariance(
    df: DataFrame, vec_col: str, id_col: str, *, dims: int | None = None
) -> DataFrame:
    """Exact covariance matrix of the leading *dims* embedding
    dimensions: ``(i, j, n, cov)`` for every ``i <= j`` (0-indexed,
    population covariance, 6 dp) — the input to PCA whitening,
    anisotropy diagnostics, and Mahalanobis outlier scoring over an
    embedding corpus.

    *id_col* must uniquely identify rows; the pair stage self-joins on
    it.  (A generated ``monotonically_increasing_id`` is NOT usable
    here: Catalyst's self-join attribute dedup collapses a join keyed
    on a nondeterministic synthetic id from shared lineage into the
    degenerate row-with-itself pairing.)

    Mechanism (exact path): each vector posexplodes to its leading
    components; the component table self-joins on the row id with
    ``i <= j``, so one row becomes ``d(d+1)/2`` product terms; moments
    ``n, Σx_i, Σx_j, Σx_i·x_j`` accumulate in one hash aggregation
    with decimal-cast sums (accumulation-order-insensitive — the
    ``corr_pairs`` idiom).  ``cov = Σxy/n − (Σx/n)(Σy/n)`` over exact
    moments.

    Scale note: the exact path shuffles O(rows · d²/2) product terms —
    acceptable for d ≤ 32 slices; for full-width production runs the
    right plan is per-partition float64 outer-product partials via
    ``mapInPandas`` (one d×d matrix per partition, tiny combine),
    which this function intentionally does not hide behind the same
    name because its float sums are not bitwise reproducible across
    partitionings.  Float32 inputs upcast to float64 exactly, so both
    paths agree to float64 ulp.
    """
    d = int(dims) if dims else None
    comps = df.select(
        F.col(id_col).alias("__rid"),
        F.posexplode(
            F.slice(F.col(vec_col), 1, d) if d else F.col(vec_col)
        ).alias("i", "x"),
    ).select("__rid", "i", F.col("x").cast("double").alias("x"))
    b = comps.select(
        F.col("__rid"),
        F.col("i").alias("j"),
        F.col("x").alias("y"),
    )
    dec = "decimal(38,12)"
    pairs = comps.join(b, on="__rid").where(F.col("i") <= F.col("j"))
    m = pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("__sx"),
        F.sum(F.col("y").cast(dec)).alias("__sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    cov = F.try_divide(F.col("__sxy").cast("double"), n) - (
        F.try_divide(F.col("__sx").cast("double"), n)
        * F.try_divide(F.col("__sy").cast("double"), n)
    )
    # + 0.0 canonicalizes IEEE negative zero (round(-1e-9, 6) is -0.0,
    # which stringifies differently from 0.0 in the driver's hash)
    return m.select(
        "i", "j", "n", (F.round(cov, 6) + F.lit(0.0)).alias("cov")
    )


def pca_power_step(
    cov: DataFrame,
    *,
    dims: int,
    steps: int = 2,
) -> DataFrame:
    """Leading-eigenvector power iteration over a covariance matrix in
    upper-triangle form (the :func:`embedding_covariance` output):
    ``v ← normalize(C·v)`` from ``v₀ = 1⃗``, *steps* times — the PC1
    direction used for whitening, anisotropy correction, and
    dominant-axis pruning of an embedding corpus.

    Pregel-as-DataFrames, the x91 PageRank shape applied to dense
    linear algebra: the matrix stays distributed (one row per ``i<=j``
    entry, mirrored on the fly), the d-element vector rides a
    broadcast join, each matvec is one keyed aggregation with
    decimal-cast product sums, and the norm is a 1-row aggregate
    folded back in.  Every step is deterministic double arithmetic
    over exact sums, so iterates are engine-reproducible bitwise.

    Returns ``(i, v)`` — the unit-norm iterate, 6 dp.
    """
    full = cov.select("i", "j", "cov").unionByName(
        cov.where(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    )
    dec = "decimal(38,12)"
    vec = None  # None means v0 = all-ones
    for _ in range(int(steps)):
        if vec is None:
            prod = full.select("i", F.col("cov").alias("__p"))
        else:
            prod = full.join(
                F.broadcast(vec.select(F.col("i").alias("j"), "v")),
                on="j",
            ).select("i", (F.col("cov") * F.col("v")).alias("__p"))
        w = prod.groupBy("i").agg(
            F.sum(F.col("__p").cast(dec)).cast("double").alias("w")
        )
        norm = w.agg(
            F.sqrt(
                F.sum((F.col("w") * F.col("w")).cast(dec)).cast("double")
            ).alias("__norm")
        )
        vec = w.crossJoin(F.broadcast(norm)).select(
            "i",
            F.try_divide(F.col("w"), F.col("__norm")).alias("v"),
        )
        # truncate lineage: an iterative plan without checkpoints
        # deepens exponentially in the optimizer (the graph.pagerank
        # lesson) — the vector is d rows, checkpointing is free
        vec = vec.localCheckpoint(eager=True)
    return vec.select("i", F.round(F.col("v"), 6).alias("v"))


def pq_encode(
    df: DataFrame,
    *,
    centroids: list[list[list[float]]],
    sub_dims: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encoding: split each vector into
    ``len(centroids)`` contiguous subspaces of *sub_dims* dims, assign
    each slice to its nearest subspace centroid (squared L2, ties to
    the lowest code), and report the total reconstruction error — the
    memory-side compression ANN systems (IVF-PQ) pair with the x05c
    coarse quantizer: 64 float32 dims collapse to ``m`` one-byte
    codes, a 32× shrink at recall governed by codebook quality.

    Engine-exactness: slice distances are sequential index-order folds
    (:func:`_fold_sq_dist` — the x75 idiom), the per-vector error is
    the fixed-order sum of the ``m`` subspace minima, so every code
    and error is bitwise reproducible in SQL.  Centroids are broadcast
    literals; encoding is row-local (zero shuffle) — the 100 TB plan
    is the scan itself.

    Returns ``(id, c0..c{m-1}, recon_err)`` with the error at 6 dp.
    """
    m = len(centroids)
    v = _as_double(F.col(vec_col))
    cols = [F.col(id_col).alias("id")]
    err = None
    for s, cset in enumerate(centroids):
        sub = F.slice(v, s * sub_dims + 1, sub_dims)
        items = []
        for code, c in enumerate(cset):
            carr = F.array(*[F.lit(float(w)) for w in c])
            items.append(
                F.struct(
                    _fold_sq_dist(sub, carr).alias("dist"),
                    F.lit(code).alias("code"),
                )
            )
        best = F.array_min(F.array(*items))
        cols.append(best["code"].cast("int").alias(f"c{s}"))
        err = best["dist"] if err is None else err + best["dist"]
    cols.append(F.round(err, 6).alias("recon_err"))
    return df.select(*cols)


def semdedup(
    df: DataFrame,
    *,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_cluster: int = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication scoped to k-means clusters.  Assign every vector to
    its nearest centroid (squared L2, ties to the lowest cluster id —
    the ``kmeans_step``/``ivf_topk`` assignment rule), then inside each
    cluster mark a vector a DUPLICATE iff some lower-id cluster member
    has cosine ≥ *threshold*; the lowest-id member of every semantic
    group survives.

    Why cluster-scoped: the paper's point is that the all-pairs cosine
    matrix is intractable at web scale, but near-duplicates land in the
    same k-means cell, so the quadratic term drops from O(n²) to
    O(Σ|cell|²) with |cell| ≈ n/k — the same bound the IVF index uses
    for search.  Distributed shape: assignment is a map-only pass over
    broadcast literal centroids (zero shuffles), then ONE shuffle keyed
    by cluster feeds both the deterministic size cap (``row_number`` by
    id, the ``max_bucket`` guard of ``minhash_lsh_pairs``) and the
    in-cluster self-join; the per-vector verdict is a groupBy on the
    higher id.  Nothing driver-side grows with the data.

    Engine-exactness: sequential-fold dot products, scores rounded to
    6 dp BEFORE thresholding, witness = min id / max score (both
    order-insensitive) — an external SQL oracle reproduces the exact
    keep set.

    Output: one row per (capped) vector —
    ``id, cluster, keep, dup_of, n_dups, max_cos`` where *dup_of* is
    the lowest-id duplicate witness (null when kept) and *max_cos* the
    best lower-id score at-or-above threshold (null when kept).
    """
    v = _as_double(F.col(vec_col))
    assigned = df.select(
        F.col(id_col).alias("id"), v.alias("__v")
    ).withColumn(
        "cluster", F.array_min(_centroid_dists(F.col("__v"), centroids))["cid"]
    )
    wc = Window.partitionBy("cluster").orderBy("id")
    members = (
        assigned.withColumn("__rn", F.row_number().over(wc))
        .where(F.col("__rn") <= max_cluster)
        .drop("__rn")
    )
    # norms once per member, not once per pair: the in-cluster join
    # evaluates O(|cell|²) score expressions and each l2_norm is a
    # 64-element fold — same float values (identical fold), 3× less
    # per-pair work
    members = members.withColumn("__nrm", l2_norm(F.col("__v")))
    # three plan branches consume members (both self-join sides + the
    # final verdict join-back); the differing column pruning per branch
    # defeats exchange reuse, so without materialization the scan +
    # centroid assignment + cap window run three times — checkpoint
    # once instead (on a cluster prefer checkpoint() with a reliable
    # dir if executor loss matters, cf. connected_components)
    members = members.localCheckpoint(eager=True)
    lo = members.select(
        "cluster", F.col("id").alias("id_a"),
        F.col("__v").alias("__va"), F.col("__nrm").alias("__na"),
    )
    hi = members.select(
        "cluster", F.col("id").alias("id_b"),
        F.col("__v").alias("__vb"), F.col("__nrm").alias("__nb"),
    )
    edges = (
        lo.join(hi, on="cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "score",
            prenormed_cosine(
                F.col("__va"), F.col("__vb"),
                F.col("__na"), F.col("__nb"),
            ),
        )
        .where(F.col("score") >= threshold)
    )
    verdict = edges.groupBy(F.col("id_b").alias("id")).agg(
        F.min("id_a").alias("dup_of"),
        F.count("*").alias("n_dups"),
        F.max("score").alias("max_cos"),
    )
    return (
        members.select("id", "cluster")
        .join(verdict, on="id", how="left")
        .select(
            "id",
            F.col("cluster").cast("long").alias("cluster"),
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
            "max_cos",
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    query_label_col: str = "query_label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the in-batch /
    ANCE-style negative selection step, Xiong et al. 2021,
    arXiv:2007.00808): for each query, the *k* most cosine-similar
    corpus items with a DIFFERENT label — the near-misses that teach
    a retriever the decision boundary, where random negatives are
    trivially easy.

    The label filter sits BELOW the rank window (a same-label
    neighbor must not occupy a top-k slot), and both it and the
    self-exclusion ride the broadcast-join output before any shuffle.
    Plan: corpus streams once past the broadcast query set; the only
    shuffle is the per-query top-k (``cosine_topk``'s shape) — k rows
    per query survive.  Per-row (not per-pair) norms, cf.
    ``cosine_topk``.

    Output: ``query_id, neighbor_id, rank, score, neighbor_label``.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).withColumn("__nv", l2_norm(F.col("__v")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_label_col).alias("__ql"),
        _as_double(F.col(query_vec_col)).alias("__q"),
    ).withColumn("__nq", l2_norm(F.col("__q")))
    cand = (
        c.join(F.broadcast(q))
        .where(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("neighbor_label") != F.col("__ql"))
        )
        .withColumn(
            "score",
            prenormed_cosine(
                F.col("__v"), F.col("__q"),
                F.col("__nv"), F.col("__nq"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score", "neighbor_label")
    )


def mutual_knn_pairs(
    df: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nbits: int = 4,
    bands: int = 2,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Reciprocal (mutual) k-nearest-neighbor pairs over the banded-
    hyperplane candidate graph: a pair survives iff each side ranks
    the other within its own top-*k* candidates.  RNN filtering is the
    density-aware edge pruning graph clustering and SNN-style dedup
    use: a hub vector that is "near everything" holds one-sided
    edges into sparse regions, and requiring reciprocity removes
    exactly those — the standard cure for hubness in high dimensions
    (Radovanović et al. 2010).

    Candidates and exact scores come from the same blocked mechanism
    as :func:`embedding_neardup_pairs` (bands × nbits sign-bit keys,
    deterministic ``max_bucket`` cap) — at 100 TB the rank windows
    run over each node's CANDIDATES (bucket-bounded), never over the
    corpus.  Ranks are per-node ``row_number`` by (score desc, id),
    so ties are deterministic and an external oracle reproduces the
    exact pair set.

    Output: ``id_a < id_b, score, rank_ab, rank_ba`` (a's rank of b,
    b's rank of a), both ≤ k.
    """
    scored = embedding_neardup_pairs(
        df, dim=dim, id_col=id_col, vec_col=vec_col, threshold=-1.0,
        nbits=nbits, bands=bands, seed=seed, max_bucket=max_bucket,
    )
    directed = scored.select(
        F.col("id_a").alias("node"), F.col("id_b").alias("nbr"), "score"
    ).unionAll(
        scored.select(
            F.col("id_b").alias("node"), F.col("id_a").alias("nbr"), "score"
        )
    )
    wr = Window.partitionBy("node").orderBy(F.desc("score"), F.asc("nbr"))
    ranked = directed.withColumn("__r", F.row_number().over(wr))
    ab = ranked.where(F.col("node") < F.col("nbr")).select(
        F.col("node").alias("id_a"), F.col("nbr").alias("id_b"),
        "score", F.col("__r").alias("rank_ab"),
    )
    ba = ranked.where(F.col("node") > F.col("nbr")).select(
        F.col("nbr").alias("id_a"), F.col("node").alias("id_b"),
        F.col("__r").alias("rank_ba"),
    )
    return (
        ab.join(ba, on=["id_a", "id_b"])
        .where((F.col("rank_ab") <= k) & (F.col("rank_ba") <= k))
        .select("id_a", "id_b", "score", "rank_ab", "rank_ba")
    )


def centroid_drift(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Embedding-space fingerprint per group: each group's mean vector
    compared to the corpus mean by cosine and L2 distance — the drift
    audit run per source/shard/snapshot to catch an encoder version
    skew or a topical collapse before the vectors feed dedup and ANN
    (a source whose centroid swings away from the corpus mean gets
    systematically under-linked in cosine-threshold dedup).

    Shape: one ``posexplode`` + (group, dim) hash aggregation over
    decimal sums — order-insensitive, so the centroids are engine-
    exact — then all remaining math runs on |groups|×dim rows.  The
    global centroid is the weighted combine of the group sums (no
    second pass over the vectors); per-group cosine/L2 are decimal-
    summed dim folds.

    Output per group: ``(group, n, cos_global, l2_dist)`` (6 dp).
    """
    dec = "decimal(38,12)"
    ex = df.where(F.col(vec_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col)).alias("d", "__x"),
    ).select("grp", "d", F.col("__x").cast("double").alias("__x"))
    sums = ex.groupBy("grp", "d").agg(
        F.sum(F.col("__x").cast(dec)).alias("__sx"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    # sums feeds the global combine AND the per-group join — one
    # explode pass only if materialized (it is |groups|x dim rows)
    sums = sums.localCheckpoint(eager=True)
    glob = sums.groupBy("d").agg(
        F.sum("__sx").alias("__gx"), F.sum("__n").alias("__gn")
    )
    m = sums.join(F.broadcast(glob), "d").select(
        "grp",
        "d",
        "__n",
        (F.col("__sx").cast("double") / F.col("__n").cast("double")).alias(
            "__mgrp"
        ),
        (F.col("__gx").cast("double") / F.col("__gn").cast("double")).alias(
            "__mglob"
        ),
    )
    agg = m.groupBy("grp").agg(
        F.max("__n").alias("n"),
        F.sum((F.col("__mgrp") * F.col("__mglob")).cast(dec)).alias("__dot"),
        F.sum((F.col("__mgrp") * F.col("__mgrp")).cast(dec)).alias("__aa"),
        F.sum((F.col("__mglob") * F.col("__mglob")).cast(dec)).alias("__bb"),
        F.sum(
            (
                (F.col("__mgrp") - F.col("__mglob"))
                * (F.col("__mgrp") - F.col("__mglob"))
            ).cast(dec)
        ).alias("__d2"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n",
        F.round(
            F.try_divide(
                F.col("__dot").cast("double"),
                F.sqrt(F.col("__aa").cast("double"))
                * F.sqrt(F.col("__bb").cast("double")),
            ),
            6,
        ).alias("cos_global"),
        F.round(F.sqrt(F.col("__d2").cast("double")), 6).alias("l2_dist"),
    )


def embedding_top_pc(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    group_col: str = "label",
    *,
    n_iter: int = 4,
) -> DataFrame:
    """Top principal direction of the embedding cloud by fixed-round
    power iteration (Mises 1929), plus the anisotropy audit of Mu
    2018 ("all-but-the-top"): contextual embedding spaces concentrate
    in a few rogue directions, which inflates every cosine and blinds
    threshold dedup — this measures how much (anisotropy = λ₁ share
    of total variance) and where each group sits along PC1.

    Scale shape: one ``posexplode`` + centering against a broadcast
    per-dim mean; each of the *n_iter* supersteps is two keyed
    aggregations (scores per row, loadings per dim) with the 64-row
    direction vector broadcast back — never a dim×dim Gram matrix.
    Fixed iteration count keeps the result deterministic and
    oracle-replayable (the x149 HITS contract); the start vector is
    the normalized all-ones.  All float sums decimal-cast.

    Output per group: ``(group, n, mean_proj, sd_proj, anisotropy)``
    — anisotropy is global, repeated per row (6 dp).
    """
    dec = "decimal(38,18)"
    ex = (
        df.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.col(group_col).alias("grp"),
            F.posexplode(F.col(vec_col)).alias("__p", "__x"),
        )
        .select(
            "__id",
            "grp",
            (F.col("__p") + 1).alias("d"),
            F.col("__x").cast("double").alias("__x"),
        )
    )
    mu = ex.groupBy("d").agg(
        (
            F.sum(F.col("__x").cast(dec)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__mu")
    )
    cent = (
        ex.join(F.broadcast(mu), "d")
        .select("__id", "grp", "d", (F.col("__x") - F.col("__mu")).alias("__c"))
        .localCheckpoint(eager=True)
    )
    dim = mu.select(F.count(F.lit(1)).alias("k"))
    v = (
        mu.crossJoin(F.broadcast(dim))
        .select("d", (F.lit(1.0) / F.sqrt(F.col("k").cast("double"))).alias("__v"))
    )
    for _ in range(int(n_iter)):
        s = (
            cent.join(F.broadcast(v), "d")
            .groupBy("__id")
            .agg(F.sum((F.col("__c") * F.col("__v")).cast(dec)).cast("double").alias("__s"))
        )
        u = (
            cent.join(s, "__id")
            .groupBy("d")
            .agg(F.sum((F.col("__c") * F.col("__s")).cast(dec)).cast("double").alias("__u"))
        )
        nrm = u.agg(
            F.sqrt(F.sum((F.col("__u") * F.col("__u")).cast(dec)).cast("double")).alias("__nm")
        )
        v = (
            u.crossJoin(F.broadcast(nrm))
            .select("d", F.try_divide(F.col("__u"), F.col("__nm")).alias("__v"))
            .localCheckpoint(eager=True)
        )
    proj = (
        cent.join(F.broadcast(v), "d")
        .groupBy("__id", "grp")
        .agg(F.sum((F.col("__c") * F.col("__v")).cast(dec)).cast("double").alias("__s"))
    ).localCheckpoint(eager=True)
    trace = cent.agg(
        F.sum((F.col("__c") * F.col("__c")).cast(dec)).cast("double").alias("__tr")
    )
    lam = proj.agg(
        F.sum((F.col("__s") * F.col("__s")).cast(dec)).cast("double").alias("__l1")
    )
    aniso = lam.crossJoin(F.broadcast(trace)).select(
        F.round(F.try_divide(F.col("__l1"), F.col("__tr")), 6).alias("anisotropy")
    )
    per = proj.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__s").cast(dec)).alias("__ss"),
        F.sum((F.col("__s") * F.col("__s")).cast(dec)).alias("__sss"),
    )
    n = F.col("n").cast("double")
    m = F.col("__ss").cast("double") / n
    sd = F.sqrt(
        F.greatest(F.col("__sss").cast("double") / n - m * m, F.lit(0.0))
    )
    return per.crossJoin(F.broadcast(aniso)).select(
        F.col("grp").alias(group_col),
        "n",
        F.round(m, 6).alias("mean_proj"),
        F.round(sd, 6).alias("sd_proj"),
        "anisotropy",
    )


def mmr_select(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    query_vec,
    k: int = 5,
    lam: float = 0.7,
    n_candidates: int = 50,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998): greedily pick *k* items maximizing ``λ·rel − (1−λ)·max
    sim-to-selected`` — relevant to the query but not redundant with
    each other.  The standard diverse-exemplar picker for few-shot
    prompts, eval sets, and dedup-aware retrieval.

    Scale shape: ONE distributed pass scores relevance against the
    broadcast query vector and a TakeOrdered heap cuts the candidate
    pool to *n_candidates*; the k−1 greedy supersteps then run on
    that bounded pool (≤ n_candidates×k sim pairs, every score the
    shared :func:`prenormed_cosine` fold, norms hoisted once).  Fixed
    greedy order is deterministic — ties break by id — so the whole
    trajectory is oracle-replayable.

    Output per pick: ``(vec_id, rank, rel, max_sim, mmr)`` (6 dp;
    rank 1 is pure relevance, its ``max_sim``/``mmr`` are null).
    """
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    lam = float(lam)
    cand = (
        df.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            _as_double(F.col(vec_col)).alias("__v"),
        )
        .withColumn("__nv", l2_norm(F.col("__v")))
        .withColumn(
            "rel",
            prenormed_cosine(F.col("__v"), qlit, F.col("__nv"), l2_norm(qlit)),
        )
        .orderBy(F.desc("rel"), F.asc("__id"))
        .limit(int(n_candidates))
        .localCheckpoint(eager=True)
    )
    first = (
        cand.orderBy(F.desc("rel"), F.asc("__id"))
        .limit(1)
        .select(
            "__id",
            "__v",
            "__nv",
            "rel",
            F.lit(1).cast("long").alias("rank"),
            F.lit(None).cast("double").alias("max_sim"),
            F.lit(None).cast("double").alias("mmr"),
        )
    )
    selected = first.localCheckpoint(eager=True)
    for step in range(2, int(k) + 1):
        sel = selected.select(
            F.col("__id").alias("__sid"),
            F.col("__v").alias("__sv"),
            F.col("__nv").alias("__snv"),
        )
        remaining = cand.join(
            selected.select(F.col("__id").alias("__sid")),
            cand["__id"] == F.col("__sid"),
            "left_anti",
        )
        ms = (
            remaining.crossJoin(F.broadcast(sel))
            .withColumn(
                "__sim",
                prenormed_cosine(
                    F.col("__v"), F.col("__sv"), F.col("__nv"), F.col("__snv")
                ),
            )
            .groupBy("__id", "__v", "__nv", "rel")
            .agg(F.max("__sim").alias("max_sim"))
        )
        pick = (
            ms.withColumn(
                "mmr",
                F.round(
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("max_sim"),
                    6,
                ),
            )
            .orderBy(F.desc("mmr"), F.asc("__id"))
            .limit(1)
            .select(
                "__id",
                "__v",
                "__nv",
                "rel",
                F.lit(step).cast("long").alias("rank"),
                "max_sim",
                "mmr",
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select(
        F.col("__id").alias(id_col), "rank", "rel", "max_sim", "mmr"
    ).orderBy("rank")


# ------------------------------------------------- hubness audit


def hubness_profile(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Hubness audit of an embedding space (Radovanović et al. 2010):
    the distribution of k-occurrences ``N_k(x)`` — how many other
    points count *x* among their *k* nearest neighbors.  High-dim
    embedding spaces grow "hubs" (points in everyone's neighbor list)
    and antihubs (in no one's); a right-skewed ``N_k`` distribution
    degrades retrieval diversity, kNN-based dedup recall, and RAG
    index quality, so this is the pre-flight check before trusting
    any kNN-derived signal on a corpus.

    Output: ONE row — ``(n_points, k, max_occ, mean_occ, skewness,
    zero_frac)``; ``skewness`` is the moment skewness
    ``g1 = m3 / m2^1.5`` of ``N_k`` (the standard hubness score),
    ``zero_frac`` the antihub share.

    Engine-exactness: occurrence counts are exact integers, so the raw
    power sums Σx, Σx², Σx³ are exact BIGINTs; μ and the central
    moments are one double composition over them, identical in the
    oracle.  Scale shape: built on :func:`cosine_topk`'s exact
    pairwise scores — an AUDIT on a bounded sample (the broadcast
    query side caps it); for full-corpus hubness feed ANN neighbor
    lists (lsh_topk / ivf_topk) into the same occurrence aggregation.
    """
    pts = emb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    topk = cosine_topk(emb, pts, id_col=id_col, vec_col=vec_col, k=k)
    occ = topk.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).alias("occ")
    )
    per_point = (
        emb.select(F.col(id_col).alias("neighbor_id"))
        .join(occ, on="neighbor_id", how="left")
        .select(
            F.coalesce(F.col("occ"), F.lit(0)).cast("long").alias("occ")
        )
    )
    sums = per_point.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("occ").alias("mx"),
        F.sum("occ").alias("s1"),
        F.sum(F.col("occ") * F.col("occ")).alias("s2"),
        F.sum(F.col("occ") * F.col("occ") * F.col("occ")).alias("s3"),
        F.sum((F.col("occ") == 0).cast("long")).alias("nz"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mu * mu
    m3 = (
        F.col("s3").cast("double") / n
        - F.lit(3.0) * mu * F.col("s2").cast("double") / n
        + F.lit(2.0) * mu * mu * mu
    )
    # m2·sqrt(m2), not pow(m2, 1.5): sqrt is IEEE-754-exact (correctly
    # rounded) in every engine, pow is libm-dependent
    skew = F.when(m2 > 0, F.try_divide(m3, m2 * F.sqrt(m2)))
    return sums.select(
        F.col("n").cast("long").alias("n_points"),
        F.lit(int(k)).cast("long").alias("k"),
        F.col("mx").cast("long").alias("max_occ"),
        F.round(mu, 6).alias("mean_occ"),
        F.round(skew, 6).alias("skewness"),
        F.round(F.col("nz").cast("double") / n, 6).alias("zero_frac"),
    )


def retrieval_eval(
    ranked: DataFrame,
    relevance: DataFrame,
    *,
    k: int = 10,
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
    rank_col: str = "rank",
    rel_item_col: str = "item_id",
) -> DataFrame:
    """Ranked-retrieval quality metrics per query — the evaluation
    harness for the ANN stack (cosine_topk / hyperplane_lsh_topk /
    ivf_topk): given a ranked candidate list and a ground-truth
    relevance set, score each query with the standard IR metrics so
    an index change (nbits, nlist, k) can be regression-gated on
    recall instead of eyeballed.

    *ranked*: ``(query_id, neighbor_id, rank)`` with rank 1..k per
    query (the output shape of every scorer in this module).
    *relevance*: ``(query_id, item_id)`` relevant pairs; queries with
    zero relevant items are dropped (their metrics are undefined).

    Metrics at cutoff *k* (binary gain):
    ``hits`` — relevant retrieved; ``precision`` — hits/k; ``recall``
    — hits/n_rel; ``rr`` — 1/rank of first hit (0 when none, MRR
    numerator); ``ap`` — sum of precision@i at hit positions i,
    normalized by min(n_rel, k) (MAP numerator); ``ndcg`` — DCG with
    1/log2(i+1) discounts over IDCG of the ideal min(n_rel, k) hits.

    Engine exactness: per-position terms are double arithmetic on
    identical operands; the per-query sums (ap, dcg) are
    decimal(38,18)-cast so grouped-sum order cannot shift the 6-dp
    output; IDCG is a sequential ``aggregate`` fold over
    ``sequence(1, min(n_rel, k))`` — deterministic order, mirrored by
    an oracle ``list_reduce``.

    Scale shape: one broadcast-join of the ranked lists (|Q|·k rows)
    against the relevance pairs, one window cumsum keyed by query,
    one hash agg — the corpus itself is never touched; n_rel comes
    from a pre-aggregated count on the relevance side.

    Output: ``(query_id, n_rel, hits, precision, recall, rr, ap,
    ndcg)`` (6 dp).
    """
    kk = int(k)
    q = F.col(query_id_col)
    rel_pairs = relevance.select(
        q.alias("__q"), F.col(rel_item_col).alias("__item")
    ).dropDuplicates(["__q", "__item"])
    n_rel = rel_pairs.groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    r = ranked.where(F.col(rank_col) <= kk).select(
        q.alias("__q"),
        F.col(neighbor_id_col).alias("__item"),
        F.col(rank_col).cast("long").alias("__rk"),
    )
    flagged = r.join(
        rel_pairs.withColumn("__rel", F.lit(1)), on=["__q", "__item"], how="left"
    ).withColumn("__rel", F.coalesce(F.col("__rel"), F.lit(0)))
    w = Window.partitionBy("__q").orderBy("__rk")
    scored = (
        flagged.withColumn("__cum", F.sum("__rel").over(w))
        .withColumn(
            "__ap_t",
            (
                F.col("__rel")
                * (F.col("__cum").cast("double") / F.col("__rk"))
            ).cast("decimal(38,18)"),
        )
        .withColumn(
            "__dcg_t",
            (
                F.col("__rel") / F.log2(F.col("__rk").cast("double") + 1.0)
            ).cast("decimal(38,18)"),
        )
        .withColumn(
            "__rr_t",
            F.when(
                F.col("__rel") == 1, F.lit(1.0) / F.col("__rk")
            ).otherwise(F.lit(0.0)),
        )
    )
    per_q = scored.groupBy("__q").agg(
        F.sum("__rel").cast("long").alias("hits"),
        F.sum("__ap_t").alias("__ap_sum"),
        F.sum("__dcg_t").alias("__dcg"),
        F.max("__rr_t").alias("__rr"),
    )
    out = per_q.join(n_rel, on="__q")
    denom = F.least(F.col("n_rel"), F.lit(kk)).cast("double")
    idcg = F.expr(
        f"aggregate(sequence(1, int(least(n_rel, {kk}))), cast(0.0 as double),"
        " (acc, i) -> acc + 1.0 / log2(cast(i as double) + 1.0))"
    )
    return out.select(
        F.col("__q").alias(query_id_col),
        "n_rel",
        "hits",
        F.round(F.col("hits") / F.lit(float(kk)), 6).alias("precision"),
        F.round(F.col("hits") / F.col("n_rel").cast("double"), 6).alias(
            "recall"
        ),
        F.round(F.col("__rr"), 6).alias("rr"),
        F.round(F.col("__ap_sum").cast("double") / denom, 6).alias("ap"),
        F.round(F.col("__dcg").cast("double") / idcg, 6).alias("ndcg"),
    )


def cluster_quality(
    df: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster quality scores for ANY assignment (labels, k-means
    output, LSH buckets): the simplified silhouette (Hruschka et al.
    2004 — distances to CENTROIDS, not the O(n²) pairwise original)
    and the Davies–Bouldin ratio (Davies & Bouldin 1979) — "are these
    clusters tight and separated", the acceptance gate for an IVF
    nlist choice or a semdedup threshold, scored without a single
    pairwise point join.

    Per point: a = ‖x − c_own‖, b = min over other centroids of
    ‖x − c_h‖, s = (b − a)/max(a, b) ∈ [−1, 1].  Per cluster g:
    silhouette = mean s, scatter S_g = mean a, and
    ``DB_g = max_{h≠g} (S_g + S_h)/‖c_g − c_h‖`` (lower is better;
    the classic index is the mean of DB_g over g).

    Scale shape: centroids from ONE posexplode + (cluster, dim)
    decimal aggregation (the ``centroid_drift`` pass, k·dim rows,
    then broadcast); point-to-centroid terms at (point, dim) × k via
    the broadcast join — O(n·dim·k) row fragments into a map-side
    combinable sum, never an n×n join.  k (clusters) is the fan-out
    knob: this is for dashboard-sized k (≤10³), not k ~ n.

    Engine-exactness: centroid means are exact-decimal-sum ratios;
    every squared-difference term and every per-cluster mean term is
    decimal(38,12)-cast before summing, so neither dim order nor row
    order moves a digit.  Clusters of one score s = 1 when another
    cluster exists (a = 0); with a single cluster overall, silhouette
    and DB are null.

    Output: ``(cluster_col, n, silhouette, scatter, davies_bouldin)``
    (6 dp).
    """
    dec = "decimal(38,12)"
    ex = (
        df.where(F.col(vec_col).isNotNull() & F.col(cluster_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.col(cluster_col).alias("__g"),
            F.posexplode(F.col(vec_col)).alias("__d", "__x"),
        )
        .select(
            "__id", "__g", "__d", F.col("__x").cast("double").alias("__x")
        )
    )
    cent = (
        ex.groupBy("__g", "__d")
        .agg(
            F.sum(F.col("__x").cast(dec)).alias("__sx"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            F.col("__g").alias("__h"),
            "__d",
            (F.col("__sx").cast("double") / F.col("__n").cast("double"))
            .alias("__m"),
        )
        .localCheckpoint(eager=True)
    )
    d2 = (
        ex.join(F.broadcast(cent), "__d")
        .groupBy("__id", "__g", "__h")
        .agg(
            F.sum(
                (
                    (F.col("__x") - F.col("__m"))
                    * (F.col("__x") - F.col("__m"))
                ).cast(dec)
            )
            .cast("double")
            .alias("__d2")
        )
    )
    per_point = d2.groupBy("__id", "__g").agg(
        F.max(F.when(F.col("__h") == F.col("__g"), F.col("__d2"))).alias(
            "__a2"
        ),
        F.min(F.when(F.col("__h") != F.col("__g"), F.col("__d2"))).alias(
            "__b2"
        ),
    )
    a = F.sqrt("__a2")
    b = F.sqrt("__b2")
    pp = per_point.select(
        "__g",
        a.alias("__a"),
        F.try_divide(b - a, F.greatest(a, b)).alias("__s"),
    )
    per_cluster = pp.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__s").cast(dec)).alias("__ssum"),
        F.sum(F.col("__a").cast(dec)).alias("__asum"),
    ).select(
        "__g",
        "n",
        (F.col("__ssum").cast("double") / F.col("n").cast("double")).alias(
            "__sil"
        ),
        (F.col("__asum").cast("double") / F.col("n").cast("double")).alias(
            "__scat"
        ),
    )
    ca, cb = cent.alias("ca"), cent.alias("cb")
    cdist = (
        ca.join(cb, (F.col("ca.__d") == F.col("cb.__d"))
                & (F.col("ca.__h") != F.col("cb.__h")))
        .groupBy(
            F.col("ca.__h").alias("__g"), F.col("cb.__h").alias("__h2")
        )
        .agg(
            F.sqrt(
                F.sum(
                    (
                        (F.col("ca.__m") - F.col("cb.__m"))
                        * (F.col("ca.__m") - F.col("cb.__m"))
                    ).cast(dec)
                ).cast("double")
            ).alias("__dc")
        )
    )
    sg = per_cluster.select("__g", "__scat")
    db = (
        cdist.join(sg, "__g")
        .join(
            sg.select(
                F.col("__g").alias("__h2"), F.col("__scat").alias("__scat2")
            ),
            "__h2",
        )
        .groupBy("__g")
        .agg(
            F.max(
                F.round(
                    F.try_divide(
                        F.col("__scat") + F.col("__scat2"), F.col("__dc")
                    ),
                    6,
                )
            ).alias("davies_bouldin")
        )
    )
    out = per_cluster.join(db, "__g", "left")
    return out.select(
        F.col("__g").alias(cluster_col),
        "n",
        F.round(F.col("__sil"), 6).alias("silhouette"),
        F.round(F.col("__scat"), 6).alias("scatter"),
        "davies_bouldin",
    )


def pq_topk(
    base: DataFrame,
    queries: DataFrame,
    *,
    centroids: list[list[list[float]]],
    sub_dims: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Asymmetric-distance PQ search (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search" §IV): the base side is
    held ONLY as its PQ codes (the 32×-compressed form ``pq_encode``
    produces), and each query's distance to a base vector is the sum
    of per-subspace lookup-table entries ``LUT_s[code_s(x)] =
    ‖q_s − centroid_s[code]‖²`` — the search path that pairs with the
    x05c IVF coarse quantizer to complete the IVF-PQ stack: x05c
    prunes WHICH vectors to score, this scores them WITHOUT ever
    touching the original floats.

    Scale shape: the per-query LUT is m code-indexed ARRAY columns
    built row-locally from broadcast centroid literals; the ADC
    distance of every (base, query) pair is a ROW-LOCAL fixed-order
    sum of m array lookups under one broadcast of the query-sized LUT
    frame (r10: replaces the melt + broadcast-LUT-join + groupBy
    pivot, which shuffled O(|base|·m·|queries|) narrow rows — same
    doubles, same addition order, zero scoring shuffles); top-k per
    query is a query-keyed rank window on the 6-dp-rounded distance
    with an id tiebreak (engine-stable).

    Engine-exactness: every LUT entry is the sequential index-order
    fold (the x75/x114 idiom); the m-term ADC sum keeps the FIXED
    left-to-right addition order, so no aggregation order exists to
    drift.

    Output: ``(query_id, id, adist, rank)`` for rank ≤ k.
    """
    m = len(centroids)
    codes = pq_encode(
        base, centroids=centroids, sub_dims=sub_dims,
        vec_col=vec_col, id_col=id_col,
    )
    qv = _as_double(F.col(query_vec_col))
    lut_arrays = queries.select(
        F.col(query_id_col).alias("qid"),
        *[
            F.array(
                *[
                    _fold_sq_dist(
                        F.slice(qv, s * sub_dims + 1, sub_dims),
                        F.array(*[F.lit(float(w)) for w in c]),
                    )
                    for c in cset
                ]
            ).alias(f"__lut{s}")
            for s, cset in enumerate(centroids)
        ],
    )
    withlut = codes.crossJoin(F.broadcast(lut_arrays))
    total = F.element_at(F.col("__lut0"), F.col("c0") + 1)
    for s in range(1, m):
        total = total + F.element_at(F.col(f"__lut{s}"), F.col(f"c{s}") + 1)
    scored = withlut.select(
        F.col("qid").alias(query_id_col),
        "id",
        F.round(total, 6).alias("adist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adist"), F.asc("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            query_id_col, "id", "adist",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivf_pq_topk(
    base: DataFrame,
    queries: DataFrame,
    *,
    coarse_centroids: list[list[float]],
    pq_centroids: list[list[list[float]]],
    sub_dims: int,
    nprobe: int = 2,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """The full IVF-PQ stack in one operator (Jégou 2011 §V, the
    non-residual "IVFADC-flat" variant — codes are of the raw
    vectors, documented so the recall comparison to residual-coded
    systems is honest): the coarse quantizer prunes WHICH inverted
    lists each query visits (*nprobe* of them), and ADC lookup
    tables score ONLY those candidates from their one-byte PQ codes.
    x05c does the pruning with exact re-rank; x245 does ADC over
    everything; this is the shape that serves 100 TB of vectors —
    touch nprobe/n_cells of the corpus, never the original floats.

    Scale shape: base assigns to cells and PQ-encodes in the scan
    (row-local, broadcast centroid literals); the probe table
    (|queries|·nprobe rows) and the per-query LUT arrays broadcast;
    candidates = one equi-join on the cell id, then the ADC distance
    is a ROW-LOCAL fixed-order sum of m array lookups (r10: replaces
    the melt + broadcast-LUT-join + groupBy pivot, which shuffled
    |candidates|·m rows per scoring pass — same doubles, same
    addition order, zero scoring shuffles) and a query-keyed rank
    window.

    Output: ``(query_id, id, cell, adist, rank)`` for rank ≤ k.
    """
    m = len(pq_centroids)
    codes = pq_encode(
        base, centroids=pq_centroids, sub_dims=sub_dims,
        vec_col=vec_col, id_col=id_col,
    )
    cells = base.select(
        F.col(id_col).alias("id"),
        F.array_min(
            _centroid_dists(_as_double(F.col(vec_col)), coarse_centroids)
        )["cid"].alias("cell"),
    )
    coded = codes.join(cells, "id")
    qv = _as_double(F.col(query_vec_col))
    qcells = queries.select(
        F.col(query_id_col).alias("qid"),
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_centroid_dists(qv, coarse_centroids)),
                    1,
                    int(nprobe),
                ),
                lambda s: s["cid"],
            )
        ).alias("cell"),
    )
    # Per-query ADC lookup tables as m code-indexed ARRAY columns
    # (entry `code` of `__lut{s}` = the same sequential-fold
    # ‖q_s − centroid_s[code]‖² the previous melted LUT computed).
    # The previous shape melted every candidate into m (qid, s, code)
    # rows, broadcast-joined the exploded LUT, and re-aggregated with
    # a groupBy pivot — a full shuffle of |candidates|·m narrow rows
    # per scoring pass.  Array lookups keep the scoring ROW-LOCAL:
    # one broadcast equi-join on qid attaches the m arrays, and the
    # ADC sum is m element_at's added in the same fixed left-to-right
    # order the pivoted sum used, so every double is bit-identical
    # (guide §2.3 "aggregate before you shuffle" / §2.4 remove
    # shuffles outright — here the pivot shuffle disappears).
    lut_arrays = queries.select(
        F.col(query_id_col).alias("qid"),
        *[
            F.array(
                *[
                    _fold_sq_dist(
                        F.slice(qv, s * sub_dims + 1, sub_dims),
                        F.array(*[F.lit(float(w)) for w in c]),
                    )
                    for c in cset
                ]
            ).alias(f"__lut{s}")
            for s, cset in enumerate(pq_centroids)
        ],
    )
    cand = coded.join(F.broadcast(qcells), "cell")
    withlut = cand.join(F.broadcast(lut_arrays), "qid")
    total = F.element_at(F.col("__lut0"), F.col("c0") + 1)
    for s in range(1, m):
        total = total + F.element_at(F.col(f"__lut{s}"), F.col(f"c{s}") + 1)
    scored = withlut.select(
        F.col("qid").alias(query_id_col),
        "id",
        F.col("cell").cast("long").alias("cell"),
        F.round(total, 6).alias("adist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adist"), F.asc("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            query_id_col, "id", "cell", "adist",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def als_user_step(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    *,
    lam: float = 0.1,
    salt: str = "als",
) -> DataFrame:
    """One ALS-WR user-side half-step (Zhou, Wilkinson, Schreiber &
    Pan 2008, "Large-Scale Parallel Collaborative Filtering for the
    Netflix Prize"): with item factors Y held fixed, every user's
    rank-2 factor solves its own ridge system
    ``x_u = (Yᵀ_u Y_u + λ n_u I)⁻¹ Yᵀ_u r_u`` — embarrassingly
    parallel across users, which is exactly why ALS (not SGD) is the
    classic Spark factorization.  The 2×2 system is inverted in closed
    form, the same determinant idiom as ``sketch.mahalanobis_outliers``.

    Scale shape: one pair-grain hash agg (mean rating per user×item),
    one broadcast-sized join of the item-factor table, one user-keyed
    hash agg of five integer power sums, then row-local algebra — no
    window, no driver loop.  A full ALS run is this operator alternated
    user/item; a single audited superstep is what an oracle can check
    exactly.

    Determinism: item factors are md5-derived milli-unit INTEGERS
    (``y = (500 + h % 1000)/1000 ∈ [0.5, 1.5)``) carried unscaled, and
    ratings are quantized to micro-units after a decimal-sum mean, so
    every per-user sum is an exact BIGINT in both engines; floats only
    appear in the final closed-form solve (identical IEEE ops on
    identical inputs).

    Output: ``user, n_items, x1, x2`` — rounded factor coordinates per
    user; ``n_items`` is the user's observed-item count that weights
    the regularizer (the "-WR" in ALS-WR).
    """
    from .sketch import _hash64

    lam = float(lam)
    pair = (
        ratings.where(
            F.col(user_col).isNotNull()
            & F.col(item_col).isNotNull()
            & F.col(rating_col).isNotNull()
        )
        .groupBy(
            F.col(user_col).cast("long").alias("__u"),
            F.col(item_col).cast("long").alias("__i"),
        )
        .agg(
            F.round(
                F.try_divide(
                    F.sum(F.col(rating_col).cast("decimal(28,6)")).cast(
                        "double"
                    ),
                    F.count(F.lit(1)),
                ),
                6,
            ).alias("__r")
        )
        .withColumn("__rm", F.round(F.col("__r") * F.lit(1e6)).cast("long"))
    )
    items = pair.select("__i").distinct()
    y = items.select(
        "__i",
        (F.lit(500) + _hash64(F.col("__i"), f"{salt}y1") % 1000)
        .cast("long")
        .alias("__y1m"),
        (F.lit(500) + _hash64(F.col("__i"), f"{salt}y2") % 1000)
        .cast("long")
        .alias("__y2m"),
    )
    sums = (
        pair.join(F.broadcast(y), "__i")
        .groupBy("__u")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("__y1m") * F.col("__y1m")).alias("__s11"),
            F.sum(F.col("__y1m") * F.col("__y2m")).alias("__s12"),
            F.sum(F.col("__y2m") * F.col("__y2m")).alias("__s22"),
            F.sum(F.col("__rm") * F.col("__y1m")).alias("__b1"),
            F.sum(F.col("__rm") * F.col("__y2m")).alias("__b2"),
        )
    )
    a11 = F.col("__s11") * F.lit(1e-6) + F.lit(lam) * F.col("__n")
    a12 = F.col("__s12") * F.lit(1e-6)
    a22 = F.col("__s22") * F.lit(1e-6) + F.lit(lam) * F.col("__n")
    b1 = F.col("__b1") * F.lit(1e-9)
    b2 = F.col("__b2") * F.lit(1e-9)
    det = a11 * a22 - a12 * a12
    return sums.select(
        F.col("__u").alias("user"),
        F.col("__n").cast("long").alias("n_items"),
        F.round(F.try_divide(a22 * b1 - a12 * b2, det), 6).alias("x1"),
        F.round(F.try_divide(a11 * b2 - a12 * b1, det), 6).alias("x2"),
    )


def kmeanspp_oversample(
    df: DataFrame,
    *,
    centers: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    l: float = 8.0,
    salt: str = "kpp",
    d2_bits: int = 20,
) -> DataFrame:
    """One k-means|| oversampling round (Bahmani, Moseley, Vattani,
    Kumar & Vassilvitskii 2012, "Scalable k-means++", VLDB): given the
    current center set C, every point is admitted to the candidate
    pool with probability ``min(1, ℓ·d²(x,C)/φ_X(C))`` — the
    oversampled parallel analogue of k-means++'s sequential D²
    sampling.  O(log n) such rounds replace n sequential seeding
    passes; the pooled candidates then get weighted and reclustered
    (``kmeans_step`` on the pool).

    Scale shape: centers are broadcast literals, d² is a row-local
    fold, φ is ONE map-side-combinable integer sum crossJoin-broadcast
    back (1-row summary), and admission is a scan-stage filter — no
    shuffle beyond the 1-row φ exchange, so the round costs one pass
    regardless of |X|.

    Determinism: the Bernoulli draw is derandomized with the engine-
    portable md5 uniform (``u(id) = h64(id)/2³²``) — the mechanism an
    oracle replays exactly — and φ is summed as ``floor(d²·2^bits)``
    integers (the ``kmeans_step`` idiom), so the admission threshold
    is bit-identical across engines and partitionings.

    Output: admitted candidates ``id, near, d2, p`` (nearest current
    center, squared distance 6 dp, admission probability 6 dp);
    expected pool growth ≈ ℓ per round.
    """
    from .sketch import _hash64

    v = _as_double(F.col(vec_col))
    items = []
    for cid, c in enumerate(centers):
        carr = F.array(*[F.lit(float(w)) for w in c])
        items.append(
            F.struct(
                _fold_sq_dist(v, carr).alias("dist"),
                F.lit(cid).alias("cid"),
            )
        )
    best = F.array_min(F.array(*items))
    scored = df.select(
        F.col(id_col).alias("id"),
        best["cid"].alias("near"),
        best["dist"].alias("__d2"),
    ).withColumn(
        "__d2q",
        F.floor(F.col("__d2") * F.lit(float(1 << d2_bits))).cast("long"),
    )
    phi = scored.agg(
        F.sum(F.col("__d2q").cast("decimal(38,0)"))
        .cast("double")
        .alias("__phi")
    )
    p = F.try_divide(F.lit(float(l)) * F.col("__d2q"), F.col("__phi"))
    u = _hash64(F.col("id"), salt) / F.lit(4294967296.0)
    return (
        scored.crossJoin(F.broadcast(phi))
        .where(u < p)
        .select(
            F.col("id").cast("long").alias("id"),
            F.col("near").cast("long").alias("near"),
            F.round(F.col("__d2"), 6).alias("d2"),
            F.round(p, 6).alias("p"),
        )
    )


def jl_projection_audit(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    dims: int,
    k: int = 16,
    sample_frac: float = 0.05,
    salt: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss projection with a measured distortion
    certificate: project *dims*-dim embeddings to *k* dims with a
    derandomized +/-1 sign matrix (Achlioptas 2003 — database-friendly
    random projections need only Rademacher signs, no Gaussians) and
    report how well squared pairwise distances survive on a
    deterministic vector sample.

    The JL lemma guarantees ratios concentrate near 1 with spread
    ~sqrt(2/k); the audit MEASURES it for your data and your k before
    you commit the cheap k-dim representation to a 100 TB ANN or
    clustering pipeline: ``mean_ratio`` far from 1 or a wide
    min..max band says this k loses the geometry.

    Derandomization: sign(d, j) = 1 - 2*(md5(salt:d:j) % 2);
    the audit sample is the ``uniform_hash01 < sample_frac`` slice —
    both reproducible across engines and partitionings.

    Plan shape: projection = posexplode (rows x dims) joined to the
    broadcast dims x k sign grid, one (id, j) hash aggregate with
    decimal sums — embarrassingly parallel, never wider than one
    vector's coordinates.  The PAIRWISE stage is deliberately bounded:
    only the hash sample self-joins (|sample|^2/2 pairs), never the
    full corpus — the full-corpus analogue is the LSH/IVF stack, not
    this audit.  Returns one row: ``(n_pairs, mean_ratio, min_ratio,
    max_ratio, frac_within_50pct)``.
    """
    from .mixing import uniform_hash01
    from .sketch import _hash64

    dec = "decimal(38,12)"
    spark = emb.sparkSession
    samp = emb.where(
        uniform_hash01(F.col(id_col), salt + "p") < F.lit(float(sample_frac))
    ).select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    coords = samp.select(
        "vid", F.posexplode("v").alias("d", "xf")
    ).where(F.col("d") < int(dims)).select(
        "vid",
        F.col("d").cast("long").alias("d"),
        F.col("xf").cast("double").alias("x"),
    )
    dgrid = spark.range(int(dims)).select(F.col("id").alias("d"))
    kgrid = spark.range(int(k)).select(F.col("id").alias("kk"))
    signs = dgrid.crossJoin(kgrid).select(
        "d",
        "kk",
        (
            F.lit(1)
            - F.lit(2)
            * (
                _hash64(
                    F.concat_ws(
                        ":",
                        F.col("d").cast("string"),
                        F.col("kk").cast("string"),
                    ),
                    salt,
                )
                % 2
            )
        ).cast("double").alias("sgn"),
    )
    import math

    proj = (
        coords.join(F.broadcast(signs), "d")
        .groupBy("vid", "kk")
        .agg(
            (
                F.sum((F.col("x") * F.col("sgn")).cast(dec)).cast(
                    "double"
                )
                / F.lit(math.sqrt(float(k)))
            ).alias("y")
        )
    )
    ids_a = samp.select(F.col("vid").alias("ia"))
    ids_b = samp.select(F.col("vid").alias("ib"))
    pairs = ids_a.join(ids_b, F.col("ia") < F.col("ib"))
    ca = coords.select(
        F.col("vid").alias("ia"), "d", F.col("x").alias("xa")
    )
    cb = coords.select(
        F.col("vid").alias("ib"), "d", F.col("x").alias("xb")
    )
    d_orig = (
        pairs.join(ca, "ia")
        .join(cb, ["ib", "d"])
        .groupBy("ia", "ib")
        .agg(
            F.sum(
                (
                    (F.col("xa") - F.col("xb"))
                    * (F.col("xa") - F.col("xb"))
                ).cast(dec)
            )
            .cast("double")
            .alias("d2o")
        )
    )
    pa = proj.select(
        F.col("vid").alias("ia"), "kk", F.col("y").alias("ya")
    )
    pb = proj.select(
        F.col("vid").alias("ib"), "kk", F.col("y").alias("yb")
    )
    d_proj = (
        pairs.join(pa, "ia")
        .join(pb, ["ib", "kk"])
        .groupBy("ia", "ib")
        .agg(
            F.sum(
                (
                    (F.col("ya") - F.col("yb"))
                    * (F.col("ya") - F.col("yb"))
                ).cast(dec)
            )
            .cast("double")
            .alias("d2p")
        )
    )
    ratios = (
        d_orig.join(d_proj, ["ia", "ib"])
        .where(F.col("d2o") > 0)
        .select((F.col("d2p") / F.col("d2o")).alias("ratio"))
    )
    return ratios.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.col("ratio").cast(dec)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_ratio"),
        F.round(F.min("ratio"), 6).alias("min_ratio"),
        F.round(F.max("ratio"), 6).alias("max_ratio"),
        F.round(
            F.sum(
                F.when(
                    (F.col("ratio") >= 0.5) & (F.col("ratio") <= 1.5),
                    1,
                )
                .otherwise(0)
                .cast("double")
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("frac_within_50pct"),
    )


def rff_planes(
    dim: int, n_features: int, *, gamma: float = 0.5, seed: int = 7
) -> tuple:
    """Deterministic random-Fourier-feature parameters for an RBF
    kernel ``k(x,y) = exp(-gamma·|x-y|²)``: *n_features* pseudo-
    Gaussian direction vectors (scaled by ``sqrt(2·gamma)``) and
    uniform phase offsets in [0, 2π), generated with a seeded
    Mersenne generator so the Spark plan and a SQL oracle embed the
    SAME literals (the x07 seeded-plane idiom).  Values rounded to 6
    dp so the literals survive any float→text→float round trip."""
    import math
    import random

    rng = random.Random(int(seed))
    scale = math.sqrt(2.0 * float(gamma))
    planes = [
        [round(rng.gauss(0.0, 1.0) * scale, 6) for _ in range(int(dim))]
        for _ in range(int(n_features))
    ]
    phases = [
        round(rng.random() * 2.0 * math.pi, 6) for _ in range(int(n_features))
    ]
    return planes, phases


def mmd_rff(
    df_a: DataFrame,
    df_b: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_features: int = 8,
    gamma: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """Kernel MMD² between two embedding samples via random Fourier
    features (Gretton et al. 2012 §6; Rahimi & Recht 2007): map every
    vector to ``z_j(x) = cos(w_j·x + b_j)`` for *n_features* seeded
    planes, and ``MMD² ≈ (2/D)·Σ_j (mean_A z_j − mean_B z_j)²`` —
    the embedding-space drift gauge between two corpus slices
    (yesterday vs today, source A vs source B) that a mean-vector
    diff misses whenever the shift is in shape, not location.

    Why RFF at 100 TB: exact kernel MMD is O(n²) pairwise; the
    feature map is one map-side pass (planes are broadcast literals)
    plus ONE 2-group aggregation — no pair stage, no shuffle beyond
    the final 2-row agg, trivially streamable.

    Engine-exactness: the plane dot is the sequential fold every
    scorer here uses, ``cos`` is rounded at 9 dp before the decimal
    sum (1-ulp libm divergence dies at the gate), means divide exact
    decimal sums, and the output rounds at 6 dp.

    Output one row: ``(n_a, n_b, mmd2)``.
    """
    planes, phases = rff_planes(dim, n_features, gamma=gamma, seed=seed)
    dec = "decimal(38,12)"
    v = _as_double(F.col(vec_col))
    tagged = (
        df_a.select(F.lit("a").alias("__side"), v.alias("__v"))
        .unionByName(df_b.select(F.lit("b").alias("__side"), v.alias("__v")))
    )
    feats = []
    for j, (w, ph) in enumerate(zip(planes, phases)):
        wlit = F.array(*[F.lit(float(x)) for x in w])
        feats.append(
            F.round(
                F.cos(dot(F.col("__v"), wlit) + F.lit(float(ph))), 9
            )
            .cast(dec)
            .alias(f"__z{j}")
        )
    z = tagged.select("__side", *feats)
    agg = z.groupBy("__side").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(f"__z{j}").alias(f"__s{j}") for j in range(n_features)],
    )
    a = agg.where(F.col("__side") == "a").select(
        F.col("__n").alias("n_a"),
        *[F.col(f"__s{j}").alias(f"__sa{j}") for j in range(n_features)],
    )
    b = agg.where(F.col("__side") == "b").select(
        F.col("__n").alias("n_b"),
        *[F.col(f"__s{j}").alias(f"__sb{j}") for j in range(n_features)],
    )
    j2 = a.crossJoin(b)
    diffs = [
        (
            F.col(f"__sa{j}").cast("double") / F.col("n_a").cast("double")
            - F.col(f"__sb{j}").cast("double") / F.col("n_b").cast("double")
        )
        for j in range(n_features)
    ]
    sq = diffs[0] * diffs[0]
    for d in diffs[1:]:
        sq = sq + d * d
    return j2.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.lit(2.0 / float(n_features)) * sq, 6).alias("mmd2"),
    )


def kcenter_greedy(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985; the facility-
    location step of Sener & Savarese 2018 active learning): start
    from the minimum-id vector, then *k−1* times pick the point
    FARTHEST from the chosen set (max-min squared L2, ties to the
    lowest id) — a 2-approximation of the optimal k-center cover and
    the standard "most diverse k exemplars" pass over an embedding
    corpus before expensive human/model inspection.

    Distributed shape: each round is one map-side min-distance update
    against the (≤k, literal-broadcast) chosen set plus ONE
    TakeOrderedAndProject argmax — k bounded driver pins of one row
    each (the ≤16-row centroid-pin policy; k defaults to 8), never a
    data-sized collect.  Distances re-derive from literals each
    round, so the plan stays stateless and partition-invariant.

    Output k rows: ``(round, center_id, cover_radius)`` where
    *cover_radius* is the max-min squared distance at selection time
    (round 0 = seed, radius of the full set to it), 6 dp.
    """
    kk = int(k)
    if kk < 1 or kk > 16:
        raise ValueError("k must be in 1..16 (bounded driver pins)")
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("__v")
    )

    def sqdist_to(lit_vec: list) -> Column:
        arr = F.array(*[F.lit(float(x)) for x in lit_vec])
        return F.round(
            F.aggregate(
                F.zip_with(F.col("__v"), arr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            9,
        )

    seed = base.orderBy(F.col("id").asc()).limit(1).collect()
    if not seed:
        raise ValueError("kcenter_greedy: input is empty — nothing to select")
    seed_row = seed[0]
    chosen = [(0, seed_row["id"], [float(x) for x in seed_row["__v"]])]
    scored = base.withColumn("__d", sqdist_to(chosen[0][2]))
    out_rows = []
    for rnd in range(1, kk):
        far = (
            scored.orderBy(F.col("__d").desc(), F.col("id").asc())
            .limit(1)
            .collect()[0]
        )
        out_rows.append((rnd - 1, chosen[-1][1], float(far["__d"])))
        chosen.append((rnd, far["id"], [float(x) for x in far["__v"]]))
        scored = scored.withColumn(
            "__d", F.least(F.col("__d"), sqdist_to(chosen[-1][2]))
        )
    last = (
        scored.orderBy(F.col("__d").desc(), F.col("id").asc())
        .limit(1)
        .collect()[0]
    )
    out_rows.append((kk - 1, chosen[-1][1], float(last["__d"])))
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(r), int(c), float(d)) for r, c, d in out_rows],
        "round long, center_id long, cover_radius double",
    ).select(
        "round", "center_id", F.round("cover_radius", 6).alias("cover_radius")
    )


def procrustes_2d(
    left: DataFrame,
    right: DataFrame,
    *,
    id_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Orthogonal Procrustes alignment of two 2-D point clouds paired
    by id (Schönemann 1966, rotation-only planar case): the rotation
    minimizing Σ‖R·aᵢ − bᵢ‖² has the closed form

        ``cos θ = A/√(A²+B²),  sin θ = B/√(A²+B²)``
        with ``A = Σ(ax·bx + ay·by)``, ``B = Σ(ax·by − ay·bx)``

    after centering both clouds — sqrt is IEEE-exact, so no libm
    atan2 enters the parity surface (the x184 discipline).  The
    embedding-migration primitive: when a model upgrade re-embeds the
    corpus, the residual AFTER the best rotation separates "same
    geometry, rotated basis" (cheap re-index) from genuine drift
    (x129's centroid_drift reads shift; this reads shape).

    One decimal-exact aggregation over the paired rows for means and
    cross-moments; residual = Σ‖a‖² + Σ‖b‖² − 2√(A²+B²) evaluated on
    the centered moments (no second pass over the data).

    Output: ONE row ``(n_pairs, cos_theta, sin_theta,
    rms_residual_before, rms_residual_after)`` at 6 dp; NULL rotation
    when the clouds are degenerate (A = B = 0).
    """
    a = left.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("double").alias("ax"),
        F.col(y_col).cast("double").alias("ay"),
    )
    b = right.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("double").alias("bx"),
        F.col(y_col).cast("double").alias("by"),
    )
    rows = a.join(b, "pid").where(
        F.col("ax").isNotNull()
        & F.col("ay").isNotNull()
        & F.col("bx").isNotNull()
        & F.col("by").isNotNull()
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    agg = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("ax")).alias("sax"),
        dec(F.col("ay")).alias("say"),
        dec(F.col("bx")).alias("sbx"),
        dec(F.col("by")).alias("sby"),
        dec(F.col("ax") * F.col("bx")).alias("sxx"),
        dec(F.col("ay") * F.col("by")).alias("syy"),
        dec(F.col("ax") * F.col("by")).alias("sxy"),
        dec(F.col("ay") * F.col("bx")).alias("syx"),
        dec(
            F.col("ax") * F.col("ax") + F.col("ay") * F.col("ay")
        ).alias("saa"),
        dec(
            F.col("bx") * F.col("bx") + F.col("by") * F.col("by")
        ).alias("sbb"),
        dec(
            F.col("ax") * F.col("bx") + F.col("ay") * F.col("by")
        ).alias("sab"),
    )
    n = F.col("n")
    # centered cross-moments
    A = (
        (F.col("sxx") - F.col("sax") * F.col("sbx") / n)
        + (F.col("syy") - F.col("say") * F.col("sby") / n)
    )
    B = (
        (F.col("sxy") - F.col("sax") * F.col("sby") / n)
        - (F.col("syx") - F.col("say") * F.col("sbx") / n)
    )
    caa = F.col("saa") - (
        F.col("sax") * F.col("sax") + F.col("say") * F.col("say")
    ) / n
    cbb = F.col("sbb") - (
        F.col("sbx") * F.col("sbx") + F.col("sby") * F.col("sby")
    ) / n
    cab = F.col("sab") - (
        F.col("sax") * F.col("sbx") + F.col("say") * F.col("sby")
    ) / n
    hyp = F.sqrt(A * A + B * B)
    hyp_safe = F.when(hyp > 0, hyp)
    rss_before = caa + cbb - F.lit(2.0) * cab
    rss_after = caa + cbb - F.lit(2.0) * hyp
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    rms = lambda ss: F.sqrt(  # noqa: E731
        F.greatest(ss, F.lit(0.0)) / F.when(n > 0, n)
    )
    return agg.select(
        n.cast("long").alias("n_pairs"),
        r6(A / hyp_safe).alias("cos_theta"),
        r6(B / hyp_safe).alias("sin_theta"),
        r6(rms(rss_before)).alias("rms_residual_before"),
        r6(rms(rss_after)).alias("rms_residual_after"),
    )


def matryoshka_audit(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    dim: int,
    prefix_dim: int,
    k: int = 10,
) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022): how much
    retrieval quality survives truncating embeddings to their first
    *prefix_dim* components?  For each query, the exact cosine top-k
    under the FULL dimension and under the PREFIX are compared by
    Jaccard overlap; the corpus-level mean is the go/no-go for
    serving the cheaper index.  Exact brute-force scoring on both
    lanes (this is an audit — run it on a sampled query set, the
    x05-family ANN operators are the serving path).

    Broadcast query side, one scoring pass computing BOTH dot
    products (the prefix fold is a prefix of the full fold — one
    data read), two keyed rank windows, exact integer overlap
    counts.  Ranking ties break on the candidate id, so the top-k
    sets are engine-deterministic.

    Output: ``(query_id, k, n_overlap, jaccard)`` per query plus the
    ordering column, ordered by query_id.
    """
    if not (1 <= prefix_dim < dim):
        raise ValueError(
            "matryoshka_audit: need 1 <= prefix_dim < dim"
        )
    if k < 1:
        raise ValueError("matryoshka_audit: k must be >= 1")
    cand = df.select(
        F.col(id_col).cast("long").alias("cid"),
        F.col(vec_col).alias("cv"),
    )
    qs = queries.select(
        F.col(query_id_col).cast("long").alias("qid"),
        F.col(query_vec_col).alias("qv"),
    )
    pairs = cand.join(F.broadcast(qs))

    def dot(n_terms):
        acc = None
        for i in range(1, n_terms + 1):
            term = (
                F.element_at("cv", i).cast("double")
                * F.element_at("qv", i).cast("double")
            )
            acc = term if acc is None else acc + term
        return acc

    def norm(col, n_terms):
        acc = None
        for i in range(1, n_terms + 1):
            term = (
                F.element_at(col, i).cast("double")
                * F.element_at(col, i).cast("double")
            )
            acc = term if acc is None else acc + term
        return F.sqrt(acc)

    scored = pairs.select(
        "qid",
        "cid",
        (
            dot(int(dim))
            / F.when(
                norm("cv", int(dim)) * norm("qv", int(dim)) > 0,
                norm("cv", int(dim)) * norm("qv", int(dim)),
            )
        ).alias("cos_full"),
        (
            dot(int(prefix_dim))
            / F.when(
                norm("cv", int(prefix_dim))
                * norm("qv", int(prefix_dim))
                > 0,
                norm("cv", int(prefix_dim))
                * norm("qv", int(prefix_dim)),
            )
        ).alias("cos_pfx"),
    ).where(F.col("qid") != F.col("cid"))
    wf = Window.partitionBy("qid").orderBy(
        F.desc("cos_full"), F.asc("cid")
    )
    wp = Window.partitionBy("qid").orderBy(
        F.desc("cos_pfx"), F.asc("cid")
    )
    ranked = scored.select(
        "qid",
        "cid",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wp).alias("rp"),
    ).where((F.col("rf") <= k) | (F.col("rp") <= k))
    agg = ranked.groupBy("qid").agg(
        F.count(
            F.when((F.col("rf") <= k) & (F.col("rp") <= k), F.lit(1))
        )
        .cast("long")
        .alias("n_overlap")
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    kk = F.lit(int(k))
    return agg.select(
        F.col("qid").alias("query_id"),
        kk.cast("long").alias("k"),
        "n_overlap",
        r6(
            F.col("n_overlap")
            / (kk * 2 - F.col("n_overlap")).cast("double")
        ).alias("jaccard"),
    ).orderBy("query_id")


def item_item_cf(
    baskets: DataFrame,
    *,
    user_col: str,
    item_col: str,
    k: int = 5,
    min_cooccur: int = 2,
    max_basket: int = 512,
) -> DataFrame:
    """Item–item collaborative filtering by co-occurrence cosine
    (Sarwar et al., WWW 2001 — the Amazon "customers also bought"
    workhorse): with binary baskets, the similarity between items i
    and j is ``cooc(i,j) / sqrt(n_i · n_j)``, computed by the
    user-keyed basket self-join — each user contributes their
    basket's item pairs, so the cost is Σ_u |basket_u|² bounded by
    the *max_basket* loud-fail (a pathological power-user is a data
    bug, not a reason to square the catalog).  *min_cooccur* prunes
    coincidence pairs before ranking; top-*k* per item with the
    (similarity desc, neighbor id) total order.

    All counts are exact integers; cosine = integer / sqrt(integer ·
    integer) is engine-exact.  At 100 TB the shuffles key on user
    (pair generation) then item pair (counting) then item (ranking) —
    never the catalog cross product; this is the memory-light
    complement to x151's ALS step (model-based) and the x05 ANN
    family (embedding-based).

    Output: ``(item, neighbor, cooccur, cosine, rank)`` ordered by
    (item, rank), ≤ k rows per item.
    """
    if k < 1:
        raise ValueError("item_item_cf: k must be >= 1")
    if min_cooccur < 1:
        raise ValueError("item_item_cf: min_cooccur must be >= 1")
    base = (
        baskets.select(
            F.col(user_col).cast("long").alias("u"),
            F.col(item_col).cast("long").alias("it"),
        )
        .where(F.col("u").isNotNull() & F.col("it").isNotNull())
        .distinct()
    )
    sizes = base.groupBy("u").agg(F.count(F.lit(1)).alias("bs"))
    worst = sizes.agg(F.max("bs").alias("mx")).first()
    if worst["mx"] is None:
        raise ValueError("item_item_cf: input is empty")
    if worst["mx"] > int(max_basket):
        raise ValueError(
            f"item_item_cf: largest basket ({worst['mx']}) exceeds "
            f"max_basket={max_basket} — cap or sample power users "
            "upstream"
        )
    pop = base.groupBy(F.col("it")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = base.select("u", F.col("it").alias("ia"))
    b = base.select("u", F.col("it").alias("ib"))
    cooc = (
        a.join(b, "u")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") >= int(min_cooccur))
    )
    # symmetrize once so each item ranks over ALL its neighbors
    sym = cooc.select("ia", "ib", "c").unionByName(
        cooc.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "c"
        )
    )
    na = pop.select(F.col("it").alias("ia"), F.col("n").alias("na"))
    nb = pop.select(F.col("it").alias("ib"), F.col("n").alias("nb"))
    scored = (
        sym.join(na, "ia")
        .join(nb, "ib")
        .select(
            "ia", "ib", "c",
            (
                F.col("c").cast("double")
                / F.sqrt(
                    F.col("na").cast("double")
                    * F.col("nb").cast("double")
                )
            ).alias("cos"),
        )
    )
    wr = Window.partitionBy("ia").orderBy(
        F.desc("cos"), F.asc("ib")
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= int(k))
        .select(
            F.col("ia").alias("item"),
            F.col("ib").alias("neighbor"),
            F.col("c").alias("cooccur"),
            r6(F.col("cos")).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("item", "rank")
    )


def ivf_topk_keyed(
    corpus: DataFrame,
    queries: DataFrame,
    partition_col: str,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
    n_clusters: int = 16,
    seed: int = 42,
    include_self: bool = False,
) -> DataFrame:
    """Entity-scoped IVF approximate top-k — the SCALE path of the
    keyed similarity family (:func:`cosine_topk_keyed` is the exact
    lane, p08): one SHARED coarse quantizer for every entity (the
    multi-tenant vector-store design — per-tenant codebooks would
    retrain k-means per tenant and shatter the cell-partitioned list
    files), with the candidate join keyed on ``(entity, cell)`` so a
    query only ever scores ITS OWN entity's vectors in its probed
    cells.

    At 100 TB the list file is bucketed by (entity, cell): adding
    tenants adds partitions, probing stays ~nprobe/n_clusters of ONE
    tenant's data, and no cross-tenant candidate is ever generated —
    the same never-generate guarantee as the keyed LSH lane (contrast
    post-filtering a global candidate list).

    Output: ``(partition_col, query_id, neighbor_id, rank, score)``.
    """
    pk = partition_col
    if centroids is None:
        centroids = ivf_centroids(
            corpus, vec_col=vec_col, k=n_clusters, seed=seed
        )
    c = corpus.select(
        pk,
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).withColumn(
        "__cell", F.array_min(_centroid_dists(F.col("__v"), centroids))["cid"]
    ).withColumn("__nv", l2_norm(F.col("__v")))
    q = queries.select(
        pk,
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("__q"),
    ).withColumn("__nq", l2_norm(F.col("__q"))).withColumn(
        "__cell",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_centroid_dists(F.col("__q"), centroids)),
                    1, nprobe,
                ),
                lambda s: s["cid"],
            )
        ),
    )
    cand = c.join(F.broadcast(q), on=[pk, "__cell"])
    if not include_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    cand = cand.withColumn(
        "score",
        prenormed_cosine(
            F.col("__v"), F.col("__q"), F.col("__nv"), F.col("__nq")
        ),
    )
    w = Window.partitionBy(pk, "query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(pk, "query_id", "neighbor_id", "rank", "score")
    )
