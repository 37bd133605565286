"""Data-mixing operators: deterministic stratified sampling and
token-budget sharding for training-corpus assembly.

Not present in the reference (its data model is one wide TS frame) —
BASELINE.json north-star extensions.  A pretraining mix is defined by
per-source sampling rates ("2 parts web, 1 part code, 0.1 parts
forums"); the sampler here is *deterministic* — membership is a pure
function of (salt, doc id), not an RNG state — so

* reruns and retried tasks select the identical subset (critical for
  resumable 100 TB jobs: Spark's ``sample()`` changes membership on
  task retry, this does not);
* an external engine (the DuckDB oracle) reproduces the exact sample;
* disjoint splits fall out for free (different salts, or disjoint
  hash ranges for train/val/test).

Scale shape: sampling is a map-side filter — zero shuffles, predicate
evaluated inside the scan stage.  Shard assignment windows per
*partition column* (source/domain), never globally: a global ordered
cumsum would be a single-partition sort at 100 TB and is refused.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import _parallelize_input
from .text import token_count, token_ngrams, tokens

#: 2^32 — range of the 8-hex-digit md5 prefix used as the uniform hash
_HASH_RANGE = 4_294_967_296


def uniform_hash01(id_col: Column, salt: str = "mix") -> Column:
    """Deterministic uniform [0, 1) from ``md5(salt ':' id)``.

    First 8 hex chars of the digest → int64 / 2^32.  Engine-portable:
    DuckDB spells it ``('0x' || substr(md5(s), 1, 8))::BIGINT``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h / F.lit(float(_HASH_RANGE))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    *,
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep probability in [0, 1]; strata
    absent from the map use *default_rate*.  Membership is
    ``uniform_hash01(id) < rate`` — a map-side filter with the rate
    table inlined as a literal ``map`` expression (no join, no
    shuffle; the predicate rides inside the scan's WholeStageCodegen).

    For rate tables too large to inline (thousands of strata) use
    :func:`stratified_sample_join`.
    """
    entries: list[Column] = []
    for k, v in rates.items():
        entries.extend([F.lit(k), F.lit(float(v))])
    rate = F.coalesce(
        F.create_map(*entries)[F.col(strata_col)] if entries else F.lit(None),
        F.lit(float(default_rate)),
    )
    return df.where(uniform_hash01(F.col(id_col), salt) < rate)


def stratified_sample_join(
    df: DataFrame,
    rates_df: DataFrame,
    strata_col: str,
    id_col: str,
    *,
    salt: str = "mix",
) -> DataFrame:
    """Sampler variant for large rate tables: broadcast-join
    ``rates_df`` (columns ``(strata_col, rate)``) onto *df*; rows whose
    stratum has no rate row are dropped (rate 0).
    """
    joined = df.join(F.broadcast(rates_df), on=strata_col, how="inner")
    return joined.where(
        uniform_hash01(F.col(id_col), salt) < F.col("rate")
    ).drop("rate")


def sample_per_group(
    df: DataFrame,
    group_cols: "Sequence[str]",
    id_col: str,
    *,
    k: int,
    salt: str = "mix",
) -> DataFrame:
    """Exactly-k-per-group deterministic uniform sample: rank rows
    inside each group by their md5 hash (a uniform random order that
    every engine and every rerun agrees on) and keep the k smallest.

    Distributionally equivalent to per-group reservoir sampling, but
    stateless and mergeable: the bottom-k of a union is the bottom-k
    of the per-shard bottom-k's, so shards/days can be sampled
    independently and re-reduced.  One shuffle on the group key; the
    rank window never holds more than a partition's rows, and groups
    with fewer than k rows pass through whole.  Output adds
    ``sample_rank`` (1-based hash rank).

    For probability (rate-based) sampling use
    :func:`stratified_sample`; this is the fixed-quota variant.
    """
    if k < 1:
        raise ValueError("k must be positive")
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(
        uniform_hash01(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: "Sequence[str]",
    id_col: str,
    weight_col: str,
    *,
    k: int,
    salt: str = "wmix",
) -> DataFrame:
    """Weighted k-per-group sample without replacement — the
    Efraimidis-Spirakis A-ES scheme (IPL 2006): each row draws key
    ``-ln(u) / w`` from its deterministic uniform ``u`` and weight
    ``w``; the k SMALLEST keys per group are the sample, giving each
    row inclusion probability proportional to its weight at every
    prefix.

    Same scale/mergeability contract as :func:`sample_per_group` (the
    key is row-local, so shard-wise bottom-k then re-reduce is exact);
    ``u`` is offset by half a hash step so it is never 0 and the key
    stays finite.  Rows with null or non-positive weight are excluded
    — a zero-weight row must never be sampled.  Output adds
    ``sample_rank``.
    """
    if k < 1:
        raise ValueError("k must be positive")
    group_cols = list(group_cols)
    u = uniform_hash01(F.col(id_col), salt) + F.lit(0.5 / _HASH_RANGE)
    key = -F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*group_cols).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )


def split_corpus(


    df: DataFrame,
    id_col: str,
    *,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Disjoint train/val/test-style splits from one hash draw.

    ``fractions`` maps split name → fraction (must sum to ≤ 1); rows
    falling past the last boundary get NULL (dropped by convention).
    Adds a ``split`` column; same determinism contract as
    :func:`stratified_sample` — and because membership is by disjoint
    hash *ranges* of the same draw, the splits cannot overlap even
    across separate runs or engines.
    """
    h = uniform_hash01(F.col(id_col), salt)
    expr: Column = F.lit(None).cast("string")
    bounds: list[tuple[str, float, float]] = []
    lo = 0.0
    for name, frac in fractions.items():
        bounds.append((name, lo, lo + float(frac)))
        lo += float(frac)
    for name, a, b in reversed(bounds):
        expr = F.when((h >= F.lit(a)) & (h < F.lit(b)), F.lit(name)).otherwise(
            expr
        )
    return df.withColumn("split", expr)


def assign_token_shards(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shard_tokens: int,
    partition_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Greedy in-order token-budget sharding: within each
    *partition_col* group, documents (ordered by *order_col*, default
    the id) are packed into consecutive shards of ~*shard_tokens*
    whitespace tokens; a document starts a new shard when the running
    total before it has crossed the budget.

    ``shard = floor((cumsum_inclusive − n_tokens) / shard_tokens)``
    — i.e. the shard a document *starts* in.  Deterministic, and the
    window is keyed by *partition_col*: the sort is per-source, so the
    operator distributes (a global ordered cumsum would serialize onto
    one partition at 100 TB, which is why *partition_col* is
    mandatory).  Returns *df* plus ``n_tokens`` and ``shard``.
    """
    order_col = order_col or id_col
    # tokenize before the keyed exchange, on >= defaultParallelism
    # partitions (no-op at real scale; see dedup._parallelize_input)
    out = _parallelize_input(df).withColumn(
        "n_tokens", F.size(tokens(F.col(text_col)))
    )
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return out.withColumn(
        "shard",
        F.floor((cum - F.col("n_tokens")) / F.lit(float(shard_tokens))).cast(
            "long"
        ),
    )


def pack_context_windows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    window_tokens: int,
    partition_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Sequence packing: concatenate documents (ordered by *order_col*,
    default the id) within each *partition_col* group into a virtual
    token stream and cut it into fixed *window_tokens* context windows.
    Documents straddle window boundaries — exactly what a pretraining
    packer does — so the output has one row per (document, window it
    touches): ``window_id``, the document's token offset where that
    window starts (``tok_offset``), and how many of its tokens land in
    the window (``win_tok``).  ``SUM(win_tok)`` over a document always
    equals its ``n_tokens``.

    Same scale contract as :func:`assign_token_shards`: the cumsum
    window is keyed by *partition_col* (a global ordered cumsum would
    serialize at 100 TB); the explode emits ``ceil(n_tokens/W)+1``
    rows per document at most, O(total_tokens / W) overall.

    Zero-token documents occupy no window span but are still emitted
    (one row, ``win_tok = 0``) so packing never silently drops a row.
    """
    if window_tokens <= 0:
        raise ValueError("window_tokens must be positive")
    order_col = order_col or id_col
    wlit = F.lit(int(window_tokens))

    out = _parallelize_input(df).withColumn(
        "n_tokens", F.size(tokens(F.col(text_col)))
    )
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("__end", F.sum("n_tokens").over(w))
    out = out.withColumn("__start", F.col("__end") - F.col("n_tokens"))
    # windows floor(start/W) .. floor((end-1)/W); greatest() keeps the
    # empty-document case (end-1 < start) at exactly one window
    out = out.withColumn(
        "window_id",
        F.explode(
            F.sequence(
                F.floor(F.col("__start") / wlit),
                F.floor(F.greatest(F.col("__end") - 1, F.col("__start")) / wlit),
            )
        ),
    )
    win_lo = F.col("window_id") * wlit
    win_hi = win_lo + wlit
    clip_lo = F.greatest(F.col("__start"), win_lo)
    return (
        out.withColumn("tok_offset", (clip_lo - F.col("__start")).cast("long"))
        .withColumn(
            "win_tok",
            (F.least(F.col("__end"), win_hi) - clip_lo).cast("long"),
        )
        .drop("__start", "__end")
    )


def dsir_logweights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    *,
    n_buckets: int = 256,
    alpha: float = 0.5,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every raw document by how target-like its hashed-bigram
    distribution is — ``log w(x) = Σ_features log p̂_target(f)/p̂_raw(f)``
    — the standard recipe for carving a domain-matched pretraining
    subset out of a web crawl (resample raw docs ∝ w).

    Features are word bigrams hashed into *n_buckets* buckets
    (md5-prefix hash, engine-portable like ``uniform_hash01``), so the
    feature model is a fixed-width table independent of vocabulary
    size: both unigram/bigram estimators collapse to two
    ``groupBy(bucket)`` counts — target docs (the *target* predicate)
    and all docs — Laplace-smoothed by *alpha*.  Distributed shape:
    one explode + two map-side-combinable aggregates build the model
    (2·n_buckets cells, broadcast back as a 1-row-per-bucket join);
    per-doc scoring is one groupBy(doc, bucket) + one broadcast join +
    one groupBy(doc).  Nothing scales with vocabulary; only the
    explode scales with tokens.

    Engine-exactness: per-(doc, bucket) term = n · (ln p_t − ln p_r)
    is a deterministic double product; the per-doc sum goes through
    ``decimal(28,18)`` (the ``convert`` log-sum idiom) so accumulation
    order cannot straddle the 6-dp ROUND boundary.

    Output: ``doc, n_grams, logw`` (6 dp) — one row per document with
    ≥1 bigram; docs with no in-vocabulary features have no estimate
    and are omitted (a selector treats them as weight 1).
    """
    df = _parallelize_input(df)
    n_buckets = int(n_buckets)
    toks = tokens(F.col(text_col))
    grams = df.select(
        F.col(id_col).alias("doc"),
        target.alias("__t"),
        F.explode(token_ngrams(toks, 2)).alias("g"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col("g"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    ).alias("b")
    # gb feeds two aggregations with different keys (the model and the
    # per-doc counts) — materialize once or the tokenize+explode+md5
    # subtree runs twice (the semdedup/curation lesson)
    gb = grams.select("doc", "__t", bucket).localCheckpoint(eager=True)
    model = gb.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(F.when(F.col("__t"), 1)).alias("n_t"),
    )
    tot = model.agg(
        F.sum("n_raw").alias("nn_raw"), F.sum("n_t").alias("nn_t")
    )
    a, bmod = float(alpha), float(alpha) * n_buckets
    lr = model.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("n_t") + F.lit(a)) / (F.col("nn_t") + F.lit(bmod)))
            - F.log(
                (F.col("n_raw") + F.lit(a)) / (F.col("nn_raw") + F.lit(bmod))
            )
        ).alias("lr"),
    )
    per_db = gb.groupBy("doc", "b").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_db.join(F.broadcast(lr), on="b")
        .groupBy("doc")
        .agg(
            F.sum("n").cast("long").alias("n_grams"),
            F.round(
                F.sum(
                    (F.col("n") * F.col("lr")).cast("decimal(28,18)")
                ).cast("double"),
                6,
            ).alias("logw"),
        )
    )


def mixture_plan(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    weights: dict[str, float] | None = None,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Token-budget mixture planning: given per-source token inventories
    and target mixture *weights*, compute each source's sampling rate,
    expected token yield, and repeat (epoch) factor — the planning
    table a pretraining run derives before any sampling happens
    (and the data-constrained regime of Muennighoff et al. 2023,
    arXiv:2305.16264: a repeat factor > 1 means the target share
    exceeds the unique supply and the source must be epoched).

    ``budget = floor(budget_frac · total_tokens)`` and each source's
    planned allocation is ``floor(w_s · budget)`` — integer floors so
    both engines agree exactly.  *weights* defaults to uniform over
    the observed sources; weights are normalized over the sources
    PRESENT (a target for an absent source is dead weight the caller
    should know about — it is dropped, and normalization makes the
    remaining shares honest).

    Scale shape: ONE map-side-combinable aggregate over the corpus
    (token counting rides the scan), a 1-row broadcast total, and a
    |sources|-row output — nothing else touches the data.  Feed the
    ``rate`` column to :func:`stratified_sample` for the actual draw.

    Output per source: ``group, n_docs, tokens, target_share,
    planned_tokens, rate, repeat_factor, expected_tokens`` (6 dp).
    """
    g = F.col(group_col)
    per = df.groupBy(g.alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("tokens"),
    )
    if weights is not None:
        entries: list[Column] = []
        for k, v in weights.items():
            entries.extend([F.lit(k), F.lit(float(v))])
        raw_w = F.create_map(*entries)[F.col("group")]
    else:
        raw_w = F.lit(1.0)
    per = per.withColumn("__w", raw_w).where(F.col("__w").isNotNull())
    tot = per.agg(
        F.sum("tokens").alias("__total"),
        F.sum(F.col("__w").cast("decimal(28,18)"))
        .cast("double")
        .alias("__wsum"),
    )
    planned = F.floor(
        (F.col("__w") / F.col("__wsum"))
        * F.floor(F.lit(float(budget_frac)) * F.col("__total"))
    ).cast("long")
    out = per.crossJoin(F.broadcast(tot)).withColumn(
        "planned_tokens", planned
    )
    share = F.round(F.col("__w") / F.col("__wsum"), 6)
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.col("planned_tokens").cast("double") / F.col("tokens"),
        ),
        6,
    )
    repeat = F.round(
        F.col("planned_tokens").cast("double") / F.col("tokens"), 6
    )
    return out.select(
        "group",
        "n_docs",
        "tokens",
        share.alias("target_share"),
        "planned_tokens",
        rate.alias("rate"),
        repeat.alias("repeat_factor"),
        F.least(F.col("planned_tokens"), F.col("tokens")).alias(
            "expected_tokens"
        ),
    )


def importance_resample(
    weights: DataFrame,
    id_col: str,
    logw_col: str,
    *,
    target_frac: float = 0.3,
    salt: str = "dsir-rs",
) -> DataFrame:
    """Deterministic importance resampling over log-weights (the draw
    that closes the DSIR loop: :func:`dsir_logweights` scores, this
    selects): each doc is kept with probability
    ``p = min(1, n·target_frac · w / Σw)`` — expected sample size
    ``n·target_frac`` with inclusion ∝ importance — using the same
    md5-hash membership as :func:`stratified_sample`, so reruns,
    retries, and the external oracle select the identical subset.

    Engine-exactness: Σw goes through ``decimal(38,18)``
    (order-insensitive); each doc's p is a deterministic scalar
    expression of its own weight and the two broadcast totals.

    Scale shape: one aggregate for (n, Σw), broadcast back, map-side
    keep decision — the draw adds zero wide shuffles on top of the
    scoring pass.

    Output: ``doc, logw, p, kept`` (p at 6 dp, kept ∈ {0, 1}).
    """
    w = F.exp(F.col(logw_col))
    base = weights.select(
        F.col(id_col).alias("doc"),
        F.col(logw_col).alias("logw"),
        w.alias("__w"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__w").cast("decimal(38,18)"))
        .cast("double")
        .alias("__z"),
    )
    p = F.least(
        F.lit(1.0),
        F.lit(float(target_frac))
        * F.col("__n")
        * F.col("__w")
        / F.col("__z"),
    )
    return (
        base.crossJoin(F.broadcast(tot))
        .withColumn("__p", p)
        .select(
            "doc",
            "logw",
            F.round("__p", 6).alias("p"),
            (uniform_hash01(F.col("doc"), salt) < F.col("__p"))
            .cast("int")
            .cast("long")
            .alias("kept"),
        )
    )


def split_audit(
    df: DataFrame,
    id_col: str,
    strata_cols: "Sequence[str]",
    *,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Per-stratum balance audit of the deterministic
    :func:`split_corpus` assignment: for every (stratum, split) the
    achieved count and rate vs the target fraction — the release gate
    that catches a skewed split BEFORE training (hash splits are
    uniform corpus-wide, but a small language or source can land
    lopsided; this is where that surfaces, alongside the leakage
    check in x125 which re-derives membership from ids alone).

    Shape: the assignment is the same row-local hash-band CASE as
    ``split_corpus`` (map-side, no shuffle); the audit is one hash
    aggregation keyed by (strata, split) plus a window over that
    bounded aggregate.  Re-runs, retries, and the DuckDB oracle all
    assign identical splits — no RNG state anywhere.

    Output: ``(*strata_cols, split, n, stratum_total, rate,
    target_rate, rate_gap)`` (6 dp), one row per observed pair.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    strata = list(strata_cols)
    assigned = split_corpus(
        df, id_col, fractions=fractions, salt=salt
    )
    counts = (
        assigned.groupBy(*strata, "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wg = Window.partitionBy(*strata)
    target_expr = None
    for name, f in fractions.items():
        c = F.col("split") == name
        target_expr = (
            F.when(c, F.lit(float(f)))
            if target_expr is None
            else target_expr.when(c, F.lit(float(f)))
        )
    out = counts.withColumn(
        "stratum_total", F.sum("n").over(wg).cast("long")
    ).withColumn(
        "rate",
        F.round(
            F.col("n").cast("double")
            / F.col("stratum_total").cast("double"),
            6,
        ),
    ).withColumn("target_rate", target_expr)
    return out.withColumn(
        "rate_gap", F.round(F.col("rate") - F.col("target_rate"), 6)
    )


def neyman_allocation(
    df: DataFrame,
    value_col: str,
    strata_cols: Sequence[str],
    *,
    budget: int = 10000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934):
    given a total annotation/inspection budget, each stratum gets
    n_h ∝ N_h·σ_h — big AND internally-varied strata get the labels,
    homogeneous ones are measured cheaply — the planning step before
    ``stratified_sample`` draws the actual rows.  Proportional
    allocation is reported alongside as the naive baseline.

    Scale shape: one stratum aggregation (decimal moments, population
    σ), one 1-row broadcast total — two shuffles, no sort.

    Output per stratum: ``n_rows, sd, neyman_share, alloc_neyman,
    alloc_prop`` (6 dp; zero-variance strata get share 0 — they need
    one look, not a sample, and the caller can floor allocations).
    """
    dec = "decimal(38,18)"
    v = F.col(value_col).cast("double")
    parts = [F.col(c) for c in strata_cols]
    per = (
        df.where(v.isNotNull())
        .groupBy(*parts)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(v.cast(dec)).alias("__sv"),
            F.sum((v * v).cast(dec)).alias("__svv"),
        )
    )
    n = F.col("n_rows").cast("double")
    mean = F.col("__sv").cast("double") / n
    var = F.greatest(
        F.col("__svv").cast("double") / n - mean * mean, F.lit(0.0)
    )
    per = per.withColumn("__sd", F.sqrt(var)).withColumn(
        "__w", n * F.col("__sd")
    )
    tot = per.agg(
        F.sum(F.col("__w").cast(dec)).alias("__tw"),
        F.sum("n_rows").cast("long").alias("__tn"),
    )
    j = per.crossJoin(F.broadcast(tot))
    share = F.try_divide(F.col("__w"), F.col("__tw").cast("double"))
    prop = F.col("n_rows").cast("double") / F.col("__tn").cast("double")
    b = F.lit(float(int(budget)))
    return j.select(
        *strata_cols,
        "n_rows",
        F.round(F.col("__sd"), 6).alias("sd"),
        F.round(share, 6).alias("neyman_share"),
        F.round(share * b, 6).alias("alloc_neyman"),
        F.round(prop * b, 6).alias("alloc_prop"),
    )


def temperature_mixture(
    df: DataFrame,
    weight_col: str,
    group_cols: Sequence[str] = ("lang",),
    *,
    alpha: float = 0.3,
    token_budget: int = 1000000,
) -> DataFrame:
    """Temperature-based sampling shares (the multilingual rebalance
    rule of Conneau 2019, XLM-R: p_l ∝ w_l^α): exponentiating the
    natural token shares flattens the head and boosts the tail, so
    low-resource groups are seen more than their raw share without
    drowning the high-resource ones.  α=1 is natural sampling, α→0
    uniform.

    Scale shape: one group aggregation (decimal token sums), one
    1-row broadcast total for both the natural and the tempered
    normalizer — two shuffles, no sort.  ``epochs`` > 1 flags groups
    the budget would force to repeat — the overfitting warning the
    rule exists to surface.

    Output per group: ``tokens, natural_share, sampled_share,
    sampled_tokens, epochs`` (6 dp).
    """
    dec = "decimal(38,18)"
    parts = [F.col(c) for c in group_cols]
    w = F.col(weight_col).cast("double")
    per = (
        df.where(w.isNotNull())
        .groupBy(*parts)
        .agg(F.sum(w.cast("decimal(38,9)")).cast("double").alias("__w"))
        .where(F.col("__w") > 0)
        # exp(a*ln(w)), not pow(w, a): both engines then evaluate the
        # SAME exp/ln composition (the convert-formula precedent) --
        # platform pow() implementations are only 1-ulp-correct and
        # disagree across engines more often than exp/ln do
        .withColumn("__wa", F.exp(F.lit(float(alpha)) * F.log(F.col("__w"))))
    )
    tot = per.agg(
        F.sum(F.col("__w").cast(dec)).alias("__tw"),
        F.sum(F.col("__wa").cast(dec)).alias("__twa"),
    )
    j = per.crossJoin(F.broadcast(tot))
    nat = F.col("__w") / F.col("__tw").cast("double")
    smp = F.col("__wa") / F.col("__twa").cast("double")
    budget = F.lit(float(int(token_budget)))
    return j.select(
        *group_cols,
        F.col("__w").cast("long").alias("tokens"),
        F.round(nat, 6).alias("natural_share"),
        F.round(smp, 6).alias("sampled_share"),
        F.round(smp * budget, 6).alias("sampled_tokens"),
        F.round(F.try_divide(smp * budget, F.col("__w")), 6).alias("epochs"),
    )


def padding_waste(
    df: DataFrame,
    length_col: str,
    boundaries: Sequence[int],
    *,
    scheme: str = "scheme",
) -> DataFrame:
    """Length-bucketed padding-waste report for training batch
    assembly: given bucket *boundaries* (ascending caps; sequences
    longer than the last cap are truncated to it), every sequence
    pads to its bucket cap — the report quantifies the padding the
    boundary choice costs, the number the sequence-bucketing /
    packing decision (x27/x28) is made on.

    ``waste = Σ (cap − min(len, cap))`` per bucket;
    ``truncated = Σ max(len − last_cap, 0)`` tokens lost to the final
    cap.  Compare schemes by unioning reports (each tagged with
    *scheme*).

    Engine-exactness and scale: pure integer row-local bucketing
    (a CASE ladder over the literal boundaries — no join, no window)
    into one hash agg; |buckets| output rows.

    Output: ``(scheme, cap, n_seqs, real_tokens, padded_tokens,
    pad_waste, trunc_tokens, waste_share)`` (6 dp).
    """
    caps = sorted(int(b) for b in boundaries)
    if not caps:
        raise ValueError("need at least one boundary")
    ln = F.col(length_col).cast("long")
    cap_expr = F.lit(caps[-1])
    for c in reversed(caps[:-1]):
        cap_expr = F.when(ln <= F.lit(c), F.lit(c)).otherwise(cap_expr)
    kept = F.least(ln, F.lit(caps[-1]))
    staged = df.select(
        F.lit(scheme).alias("scheme"),
        cap_expr.cast("long").alias("cap"),
        kept.alias("__kept"),
        (ln - kept).alias("__trunc"),
    )
    per = staged.groupBy("scheme", "cap").agg(
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
        F.sum("__kept").cast("long").alias("real_tokens"),
        F.sum("__trunc").cast("long").alias("trunc_tokens"),
    )
    return per.select(
        "scheme",
        "cap",
        "n_seqs",
        "real_tokens",
        (F.col("n_seqs") * F.col("cap")).cast("long").alias("padded_tokens"),
        (F.col("n_seqs") * F.col("cap") - F.col("real_tokens"))
        .cast("long")
        .alias("pad_waste"),
        "trunc_tokens",
        F.round(
            (F.col("n_seqs") * F.col("cap") - F.col("real_tokens")).cast(
                "double"
            )
            / (F.col("n_seqs") * F.col("cap")).cast("double"),
            6,
        ).alias("waste_share"),
    )


def raking_weights(
    sample: DataFrame,
    population: DataFrame,
    dim_a: str,
    dim_b: str,
    *,
    iters: int = 2,
) -> DataFrame:
    """Two-way raking / iterative proportional fitting (Deming &
    Stephan 1940): reweight a sample's (dim_a × dim_b) cells so both
    marginals match the population's — the survey-statistics repair
    for a hash-drawn eval split whose (lang × source) mix drifted
    from the corpus, applied before any benchmark number is read.

    Each iteration scales cell weights to the dim_a marginal targets
    then the dim_b targets (targets = population marginals scaled to
    the sample size); *iters* is fixed and unrolled — the oracle
    replays every superstep.

    Engine-exactness: initial weights and all targets are exact
    integer counts; every marginal sum along the way is decimal-cast
    (order-insensitive) and each scaling is one double ratio composed
    identically in both engines.

    Scale shape: the raw tables reduce to cell/marginal counts first
    (one keyed agg each); the supersteps run on the |dim_a|·|dim_b|
    cell frame with broadcast marginal joins — dashboard-sized by
    construction.

    Output: ``(dim_a, dim_b, n_cell, weight, cell_weight)`` — *weight*
    is per-ROW (``cell_weight / n_cell``; 1.0 ⇒ unadjusted), 6 dp.
    """
    cells = (
        sample.groupBy(dim_a, dim_b)
        .agg(F.count(F.lit(1)).alias("n_cell"))
        .localCheckpoint(eager=True)
    )
    n_samp = cells.agg(F.sum("n_cell").alias("__ns"))
    pop_a = population.groupBy(dim_a).agg(
        F.count(F.lit(1)).alias("__pa")
    ).localCheckpoint(eager=True)
    pop_b = population.groupBy(dim_b).agg(F.count(F.lit(1)).alias("__pb"))
    # total from the already-computed marginal — not a third scan
    n_pop = pop_a.agg(F.sum("__pa").alias("__np"))
    targ_a = pop_a.crossJoin(F.broadcast(n_pop)).crossJoin(
        F.broadcast(n_samp)
    ).select(
        dim_a,
        (
            F.col("__pa").cast("double")
            * F.col("__ns").cast("double")
            / F.col("__np").cast("double")
        ).alias("__ta"),
    )
    targ_b = pop_b.crossJoin(F.broadcast(n_pop)).crossJoin(
        F.broadcast(n_samp)
    ).select(
        dim_b,
        (
            F.col("__pb").cast("double")
            * F.col("__ns").cast("double")
            / F.col("__np").cast("double")
        ).alias("__tb"),
    )
    w = cells.withColumn("__w", F.col("n_cell").cast("double"))
    for _ in range(int(iters)):
        row_sum = w.groupBy(dim_a).agg(
            F.sum(F.col("__w").cast("decimal(28,12)")).cast("double").alias(
                "__ra"
            )
        )
        w = (
            w.join(F.broadcast(row_sum), on=dim_a)
            .join(F.broadcast(targ_a), on=dim_a)
            .withColumn(
                "__w", F.col("__w") * F.col("__ta") / F.col("__ra")
            )
            .drop("__ra", "__ta")
        )
        col_sum = w.groupBy(dim_b).agg(
            F.sum(F.col("__w").cast("decimal(28,12)")).cast("double").alias(
                "__rb"
            )
        )
        w = (
            w.join(F.broadcast(col_sum), on=dim_b)
            .join(F.broadcast(targ_b), on=dim_b)
            .withColumn(
                "__w", F.col("__w") * F.col("__tb") / F.col("__rb")
            )
            .drop("__rb", "__tb")
        )
        # the scaling frame feeds BOTH next-iteration marginal sums
        # AND the next w — without materialization each superstep
        # replays the whole prior chain twice (the graph-superstep
        # localCheckpoint discipline; the frame is |dims|² rows)
        w = w.localCheckpoint(eager=True)
    return w.select(
        dim_a,
        dim_b,
        F.col("n_cell").cast("long").alias("n_cell"),
        F.round(
            F.col("__w") / F.col("n_cell").cast("double"), 6
        ).alias("weight"),
        F.round(F.col("__w"), 6).alias("cell_weight"),
    )


def cv_fold_stats(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    *,
    k: int = 5,
    salt: str = "cv",
) -> DataFrame:
    """Deterministic k-fold cross-validation plumbing: assign every
    UNIT (user, document — never raw rows, so all rows of a unit land
    in one fold and no leakage crosses the boundary) to fold
    ``hash(unit) % k``, then report per-fold ``(n_units, n_rows,
    mean_value)`` plus the leave-one-fold-out complement mean — the
    two numbers a training pipeline needs to (a) split shards and
    (b) sanity-check that no fold drifted from the rest before
    spending a training run on it.

    Plan shape: one hash (no shuffle) + one groupBy to ≤k rows; the
    LOO complement comes from a 1-row grand-total broadcast, not a
    second scan.  Decimal-exact sums throughout.

    Output: one row per fold — ``(fold, n_units, n_rows, fold_mean,
    loo_mean)`` at 6 dp, ordered by fold.
    """
    kk = int(k)
    if kk < 2:
        raise ValueError("k must be >= 2")
    dec = "decimal(38,12)"
    from .sketch import _hash64

    fold = (_hash64(F.col(unit_col), salt) % kk).cast("long")
    rows = df.where(F.col(value_col).isNotNull()).select(
        fold.alias("fold"),
        F.col(unit_col).alias("__u"),
        F.col(value_col).cast("double").alias("__v"),
    )
    per_fold = rows.groupBy("fold").agg(
        F.countDistinct("__u").cast("long").alias("n_units"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("__v").cast(dec)).alias("__s"),
    )
    grand = per_fold.agg(
        F.sum("n_rows").alias("__tn"), F.sum(F.col("__s").cast(dec)).alias("__ts")
    )
    out = per_fold.crossJoin(F.broadcast(grand))
    loo = F.try_divide(
        (F.col("__ts") - F.col("__s")).cast("double"),
        (F.col("__tn") - F.col("n_rows")).cast("double"),
    )
    return out.select(
        "fold",
        "n_units",
        "n_rows",
        F.round(
            F.try_divide(
                F.col("__s").cast("double"), F.col("n_rows").cast("double")
            ),
            6,
        ).alias("fold_mean"),
        F.round(loo, 6).alias("loo_mean"),
    ).orderBy("fold")


def unimax_plan(
    df: DataFrame,
    source_col: str,
    size_col: str,
    *,
    budget: float,
    max_epochs: float = 4.0,
) -> DataFrame:
    """UniMax corpus-mixing allocation (Chung et al. 2023,
    arXiv:2304.09151): split a total token *budget* across sources as
    uniformly as possible subject to a per-source repeat cap — no
    source is sampled beyond ``max_epochs`` passes over its
    ``size_col`` tokens.  The principled alternative to ad-hoc
    mixture weights when low-resource sources must not be memorized
    into the model by over-repetition.

    Closed form, no iteration: with per-source caps ``cap_i =
    size_i · max_epochs`` sorted ascending, the shared water level is
    ``λ = max_r (budget − Σ_{j<r} cap_j) / (n − r + 1)`` — candidate
    *r* assumes the *r−1* smallest sources saturate their caps and
    splits the remainder uniformly; the valid segment is exactly the
    largest candidate — and the allocation is ``min(cap_i, max(λ,
    0))``.  One ranked window pass over ≤|sources| rows (sources are
    a handful at any scale; the per-source sizes arrive from one
    groupBy of the corpus).

    Output per source: ``(source, n_tokens, cap, alloc, epochs,
    budget_frac)`` at 6 dp, ordered by source.
    """
    b = float(budget)
    e = float(max_epochs)
    if b <= 0 or e <= 0:
        raise ValueError("budget and max_epochs must be positive")
    dec = "decimal(38,6)"

    # Tie-safe 6-dp round for RAW (unstaged) doubles: do the *1e6
    # multiply explicitly on both engines so the rounding input is the
    # identical double — F.round(x, 6) is exact-binary HALF_UP while
    # DuckDB ROUND(x, 6) is round(x*1e6)/1e6 in doubles, and near a
    # 6-dp tie (…4999999) they flip the final digit (see theil_sen,
    # operators/temporal.py:640).
    def _r6(x):
        return F.round(x * F.lit(1e6)) / F.lit(1e6)

    per_src = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(size_col).cast("decimal(28,2)"))
        .cast("double")
        .alias("n_tokens")
    )
    cap = _r6(F.col("n_tokens") * F.lit(e))
    sized = per_src.select("source", "n_tokens", cap.alias("cap"))
    word = Window.orderBy(F.col("cap").asc(), F.col("source").asc())
    ranked = sized.select(
        "source",
        "n_tokens",
        "cap",
        F.row_number().over(word).alias("__i"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__n"),
        F.coalesce(
            F.sum(F.col("cap").cast(dec)).over(
                word.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast(dec),
        ).alias("__prefix"),
    )
    share = _r6(
        (F.lit(b) - F.col("__prefix").cast("double"))
        / (F.col("__n") - F.col("__i") + 1).cast("double")
    )
    stepped = ranked.select(
        "source",
        "n_tokens",
        "cap",
        F.max(share).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__share"),
    )
    alloc = _r6(F.least(F.col("cap"), F.greatest(F.col("__share"), F.lit(0.0))))
    return stepped.select(
        "source",
        F.round("n_tokens", 6).alias("n_tokens"),
        F.round("cap", 6).alias("cap"),
        alloc.alias("alloc"),
        _r6(F.try_divide(alloc, F.col("n_tokens"))).alias("epochs"),
        _r6(alloc / F.lit(b)).alias("budget_frac"),
    ).orderBy("source")


def pps_systematic(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    size_col: str,
    *,
    n_per_stratum: int,
    size_decimals: int = 2,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling per
    stratum (Madow 1949 — the official-statistics πps workhorse, and
    the size-weighted document sampler a corpus pipeline uses when
    "sample 1k docs per source ∝ token count" must be reproducible):
    units in pinned *id* order accumulate their integer-scaled sizes;
    selection points sit at ``(2k+1)·T/(2n)`` for k = 0..n−1 (the
    fixed mid-interval start — no RNG, documented), and unit i is hit
    once per point falling in its cumulative span.  Units larger than
    one interval are certainty units with multiple hits.

    Everything is 64-bit integer arithmetic (sizes scaled by
    10^*size_decimals*, the point condition cross-multiplied, the
    interval bounds via integer ceil-division ``(X+T-1) DIV T`` — no
    floating point until the reported inclusion expectation), so both
    engines agree exactly and partitioning cannot change the sample.
    The cumulative window is STRATUM-keyed: at 100 TB each stratum's
    cumsum streams independently; never run this with one global
    stratum.

    Output per unit: ``stratum, id, size_scaled, cum, hits, pi``
    (expected inclusions ``n·size/T`` at 6 dp), ordered.
    """
    n = int(n_per_stratum)
    if n < 1:
        raise ValueError("pps_systematic: n_per_stratum must be >= 1")
    scale = 10 ** int(size_decimals)
    base = df.select(
        F.col(stratum_col).cast("string").alias("stratum"),
        F.col(id_col).cast("long").alias("id"),
        F.round(F.col(size_col).cast("double") * scale)
        .cast("long")
        .alias("sz"),
    ).where(F.col("sz") > 0)
    w_cum = (
        Window.partitionBy("stratum")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("stratum")
    cum = base.withColumn("cum", F.sum("sz").over(w_cum)).withColumn(
        "tot", F.sum("sz").over(w_tot)
    )
    # odd o in [1, 2n-1] with o*T >= A (A = 2n*cumprev) and o*T < B
    # (B = 2n*cum): lo = ceil(A/T), hi = ceil(B/T) - 1, clamped; the
    # count of odds <= x is (x+1) div 2.  ceil is pure 64-bit integer
    # arithmetic ((X + T - 1) DIV T) — a float -floor(-X/T) loses
    # exactness once 2n*cum exceeds 2^53
    t = F.col("tot")
    cum = cum.withColumn(
        "__a1", 2 * n * (F.col("cum") - F.col("sz")) + t - 1
    ).withColumn("__b1", 2 * n * F.col("cum") + t - 1)
    lo = F.greatest(F.expr("__a1 DIV tot").cast("long"), F.lit(1))
    hi = F.least(
        (F.expr("__b1 DIV tot") - 1).cast("long"), F.lit(2 * n - 1)
    )
    odds_leq = lambda x: F.floor((x + 1) / 2).cast("long")  # noqa: E731
    hits = F.when(
        hi >= lo, odds_leq(hi) - odds_leq(lo - 1)
    ).otherwise(F.lit(0))
    return cum.select(
        "stratum",
        "id",
        F.col("sz").alias("size_scaled"),
        "cum",
        hits.cast("long").alias("hits"),
        F.round(
            F.lit(n) * F.col("sz").cast("double") / F.col("tot"), 6
        ).alias("pi"),
    ).orderBy("stratum", "id")
