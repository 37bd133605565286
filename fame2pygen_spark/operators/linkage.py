"""Record-linkage operators: blocked fuzzy matching on edit distance.

Not present in the reference — north-star entity-resolution surface.
The published design (standard blocking-based record linkage): an
all-pairs edit-distance comparison is O(n²); instead rows are grouped
by a cheap deterministic BLOCK KEY (default: the last whitespace token
of the lower-cased text), candidate pairs form only within a block,
and two lossless prunes run before the Levenshtein evaluation:

* length band — ``|len(a) − len(b)| ≤ max_distance`` (edit distance is
  bounded below by the length difference), expressed in the join
  condition so it prunes during the probe;
* per-block cap — ``row_number`` over the block key (same guard as
  ``dedup.minhash_lsh_pairs``'s ``max_bucket``) so a degenerate block
  (every record sharing the key) cannot go quadratic.

Scale shape: one shuffle on the block key, in-block equi-join on 3
narrow columns, Levenshtein only on surviving candidates.  Both Spark
``levenshtein`` and DuckDB ``levenshtein`` implement the plain
(unit-cost) edit distance, so results are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "fuzzy_self_pairs",
    "default_block_key",
    "fellegi_sunter_score",
    "blocking_quality",
    "fs_em_weights",
    "jaro_winkler_scores",
]


def default_block_key(col: Column) -> Column:
    """Last whitespace-delimited token of the lower-cased text — for
    "modifier head-noun" style names the head noun is the stable part,
    so true matches rarely cross blocks."""
    return F.regexp_extract(F.lower(col), "[^ ]+$", 0)


def fuzzy_self_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_distance: int = 2,
    block: Column | None = None,
    max_block: int = 1000,
) -> DataFrame:
    """Near-match pairs ``(id_a, id_b, text_a, text_b, distance)`` with
    ``id_a < id_b`` and ``levenshtein(text_a, text_b) ≤ max_distance``,
    found via block-key candidate generation (see module docstring).

    *block* overrides the blocking expression; recall is bounded by the
    blocker (pairs whose block keys differ are never compared — the
    standard blocking trade-off, measured by the pytest's planted
    cross-block pair).
    """
    if max_distance < 0:
        raise ValueError("max_distance must be non-negative")
    key = block if block is not None else default_block_key(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        key.alias("__bk"),
        F.length(text_col).alias("__len"),
    )
    wb = Window.partitionBy("__bk").orderBy("id")
    base = (
        base.withColumn("__rn", F.row_number().over(wb))
        .where(F.col("__rn") <= max_block)
        .drop("__rn")
    )
    a = base.select(
        F.col("__bk"),
        F.col("id").alias("id_a"),
        F.col("text").alias("text_a"),
        F.col("__len").alias("__len_a"),
    )
    b = base.select(
        F.col("__bk"),
        F.col("id").alias("id_b"),
        F.col("text").alias("text_b"),
        F.col("__len").alias("__len_b"),
    )
    cand = a.join(
        b,
        on=[
            a["__bk"] == b["__bk"],
            F.col("id_a") < F.col("id_b"),
            F.abs(F.col("__len_a") - F.col("__len_b")) <= max_distance,
        ],
    )
    return (
        cand.withColumn(
            "distance",
            F.levenshtein(F.col("text_a"), F.col("text_b")).cast("long"),
        )
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "text_a", "text_b", "distance")
    )


def fellegi_sunter_score(
    pairs: DataFrame,
    agreement_cols: "list[str]",
    m_probs: "list[float]",
    u_probs: "list[float]",
    *,
    upper: float = 3.0,
    lower: float = 0.0,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring (Fellegi &
    Sunter 1969): each candidate pair accumulates per-field log2
    likelihood-ratio weights — ``log2(m_i/u_i)`` when field *i*
    agrees, ``log2((1−m_i)/(1−u_i))`` when it disagrees — where
    ``m_i``/``u_i`` are the field's agreement probabilities among
    true matches / non-matches (estimate them from labeled pairs or
    EM; supplied here as parameters).  The decision rule is the
    classic three-band cut: ``match`` at ``score >= upper``,
    ``possible`` in between, ``non_match`` below *lower*.

    Pure map-side column algebra over an already-blocked candidate
    frame (build one with a blocking equi-join or
    :func:`fuzzy_self_pairs`) — no shuffle, no window, and every
    log2 weight is a PYTHON literal, so both engines fold identical
    doubles.  Null agreement values count as disagreement (the
    conservative convention).

    Output: the input columns plus ``fs_score`` (6 dp, tie-safe) and
    ``fs_decision``.
    """
    if not agreement_cols:
        raise ValueError("agreement_cols must be non-empty")
    if not (len(agreement_cols) == len(m_probs) == len(u_probs)):
        raise ValueError("agreement_cols, m_probs, u_probs lengths differ")
    import math as _math

    for m, u in zip(m_probs, u_probs):
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                "each field needs 0 < u < m < 1 (agreement must be "
                "more likely among matches)"
            )
    if float(upper) < float(lower):
        raise ValueError("upper must be >= lower")
    score = None
    for col, m, u in zip(agreement_cols, m_probs, u_probs):
        w_agree = _math.log2(m / u)
        w_disagree = _math.log2((1.0 - m) / (1.0 - u))
        term = F.when(
            F.col(col).cast("boolean") == F.lit(True), F.lit(w_agree)
        ).otherwise(F.lit(w_disagree))
        score = term if score is None else score + term
    decision = (
        F.when(score >= F.lit(float(upper)), F.lit("match"))
        .when(score >= F.lit(float(lower)), F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    return pairs.select(
        "*",
        (F.round(score * F.lit(1e6)) / F.lit(1e6)).alias("fs_score"),
        decision.alias("fs_decision"),
    )


def blocking_quality(
    left: DataFrame,
    right: DataFrame,
    truth_pairs: DataFrame,
    *,
    left_id: str,
    right_id: str,
    left_block: Column,
    right_block: Column,
) -> DataFrame:
    """Blocking-scheme evaluation (the standard pre-linkage audit,
    Christen 2012 ch. 4): before running any comparator over blocked
    candidates, measure what the blocker costs and what it loses —

    * ``reduction_ratio``  = 1 − |candidates| / (|L|·|R|) — how much of
      the quadratic pair space the blocker prunes;
    * ``pairs_completeness`` = |true ∩ candidates| / |true| — recall of
      a labeled ground-truth pair set against the blocks.

    The candidate count is NEVER materialized as pairs: it is
    ``Σ_b |L_b|·|R_b|`` over per-block counts — two keyed aggregations
    and one equi-join on the block key, all integer-exact, so the
    audit itself stays linear even when the blocker under audit would
    go quadratic (``max_block_product`` flags exactly such a block).
    *truth_pairs* (columns *left_id*, *right_id*) attaches its block
    keys via two id-keyed joins.

    Output (ONE row): ``(n_left, n_right, n_blocks_left,
    n_blocks_right, cand_pairs, total_pairs, reduction_ratio,
    max_block_product, n_true, n_true_blocked, pairs_completeness)``
    (ratios 6 dp, tie-safe).
    """
    lb = left.select(
        F.col(left_id).alias("__lid"), left_block.alias("__bk")
    )
    rb = right.select(
        F.col(right_id).alias("__rid"), right_block.alias("__bk")
    )
    lcnt = lb.groupBy("__bk").agg(F.count(F.lit(1)).alias("__lc"))
    rcnt = rb.groupBy("__bk").agg(F.count(F.lit(1)).alias("__rc"))
    cand = lcnt.join(rcnt, on="__bk").agg(
        F.sum(
            (F.col("__lc") * F.col("__rc")).cast("decimal(38,0)")
        ).alias("__cand"),
        F.max(F.col("__lc") * F.col("__rc")).alias("__maxprod"),
    )
    lt = lb.agg(
        F.count(F.lit(1)).alias("__nl"),
        F.countDistinct("__bk").alias("__kbl"),
    )
    rt = rb.agg(
        F.count(F.lit(1)).alias("__nr"),
        F.countDistinct("__bk").alias("__kbr"),
    )
    truth = truth_pairs.select(
        F.col(left_id).alias("__tlid"), F.col(right_id).alias("__trid")
    )
    tb = (
        truth.join(
            lb.select(F.col("__lid"), F.col("__bk").alias("__bkl")),
            truth["__tlid"] == F.col("__lid"),
        )
        .join(
            rb.select(F.col("__rid"), F.col("__bk").alias("__bkr")),
            F.col("__trid") == F.col("__rid"),
        )
        .agg(
            F.count(F.lit(1)).alias("__nt"),
            F.sum(
                F.when(F.col("__bkl") == F.col("__bkr"), 1).otherwise(0)
            ).alias("__ntb"),
        )
    )

    def _r6(x):
        return F.round(x * F.lit(1e6)) / F.lit(1e6)

    total = F.col("__nl").cast("double") * F.col("__nr").cast("double")
    return (
        cand.crossJoin(lt)
        .crossJoin(rt)
        .crossJoin(tb)
        .select(
            F.col("__nl").alias("n_left"),
            F.col("__nr").alias("n_right"),
            F.col("__kbl").alias("n_blocks_left"),
            F.col("__kbr").alias("n_blocks_right"),
            F.coalesce(F.col("__cand"), F.lit(0))
            .cast("double")
            .alias("cand_pairs"),
            total.alias("total_pairs"),
            _r6(
                F.lit(1.0)
                - F.coalesce(F.col("__cand"), F.lit(0)).cast("double")
                / total
            ).alias("reduction_ratio"),
            F.coalesce(F.col("__maxprod"), F.lit(0))
            .cast("long")
            .alias("max_block_product"),
            F.col("__nt").cast("long").alias("n_true"),
            F.coalesce(F.col("__ntb"), F.lit(0))
            .cast("long")
            .alias("n_true_blocked"),
            _r6(
                F.coalesce(F.col("__ntb"), F.lit(0)).cast("double")
                / F.col("__nt").cast("double")
            ).alias("pairs_completeness"),
        )
    )


def fs_em_weights(
    pairs: DataFrame,
    agreement_cols: "list[str]",
    *,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.1,
    n_iter: int = 5,
    eps: float = 1e-6,
) -> DataFrame:
    """Unsupervised EM estimation of the Fellegi–Sunter m/u
    probabilities (Winkler 1988, the standard way to parameterize
    :func:`fellegi_sunter_score` without labeled pairs) under the
    conditional-independence model: each candidate pair is a latent
    match with prior *p*; field *i* agrees with probability m_i among
    matches, u_i among non-matches.

    The E/M steps never touch the pair table after ONE pass: pairs
    collapse to the ≤ 2^f agreement-PATTERN table (f ≤ 6, loud-fail),
    checkpointed once; every EM iteration is then a broadcast
    cross-join of that metadata-sized table with the 1-row parameter
    state plus one decimal-staged aggregation — f·n_iter tiny stages,
    zero additional data shuffles, which is what makes the estimator
    run unchanged on 10^12 candidate pairs.  Per-pattern weights
    ``w_γ = p·Π m / (p·Π m + (1−p)·Π u)`` use a fixed field-order
    multiplication chain and all pattern sums stage at 9 dp into
    DECIMAL(38,9) — accumulation-order-insensitive, so both engines
    walk bit-identical EM trajectories.  Null agreement values count
    as disagreement (matching :func:`fellegi_sunter_score`).

    Output per field (f rows, field order): ``(field, m, u, w_agree,
    w_disagree, match_prevalence)`` — m/u clamped to [eps, 1−eps]
    before the log2 weights so degenerate fields stay finite; all
    floats 6 dp tie-safe.
    """
    f = len(agreement_cols)
    if not (1 <= f <= 6):
        raise ValueError("need 1..6 agreement fields (pattern table is 2^f)")
    if not (1 <= int(n_iter) <= 10):
        raise ValueError("n_iter must be in 1..10")
    for v, nm in [(init_m, "init_m"), (init_u, "init_u"), (init_p, "init_p")]:
        if not (0.0 < v < 1.0):
            raise ValueError(f"{nm} must be in (0, 1)")
    if init_u >= init_m:
        raise ValueError("need init_u < init_m to break label symmetry")
    dec = "decimal(38,9)"
    gs = [f"__g{i}" for i in range(f)]
    pat = (
        pairs.select(
            *[
                F.coalesce(F.col(c).cast("boolean"), F.lit(False)).alias(g)
                for c, g in zip(agreement_cols, gs)
            ]
        )
        .groupBy(*gs)
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    spark = pairs.sparkSession
    state = spark.createDataFrame(
        [
            tuple(
                [float(init_p)]
                + [float(init_m)] * f
                + [float(init_u)] * f
            )
        ],
        ", ".join(
            ["__p double"]
            + [f"__m{i} double" for i in range(f)]
            + [f"__u{i} double" for i in range(f)]
        ),
    )
    nd = F.col("__n").cast("double")
    for _ in range(int(n_iter)):
        a = F.col("__p")
        b = F.lit(1.0) - F.col("__p")
        for i in range(f):
            a = a * F.when(
                F.col(gs[i]), F.col(f"__m{i}")
            ).otherwise(F.lit(1.0) - F.col(f"__m{i}"))
            b = b * F.when(
                F.col(gs[i]), F.col(f"__u{i}")
            ).otherwise(F.lit(1.0) - F.col(f"__u{i}"))
        pw = pat.crossJoin(F.broadcast(state)).select(
            *gs, "__n", (a / (a + b)).alias("__w")
        )
        aggs = [
            F.sum(F.round(F.col("__w") * nd, 9).cast(dec)).alias("__sw"),
            F.sum(
                F.round((F.lit(1.0) - F.col("__w")) * nd, 9).cast(dec)
            ).alias("__swc"),
            F.sum("__n").alias("__nn"),
        ]
        for i in range(f):
            gi = F.when(F.col(gs[i]), F.lit(1.0)).otherwise(F.lit(0.0))
            aggs.append(
                F.sum(
                    F.round(F.col("__w") * nd * gi, 9).cast(dec)
                ).alias(f"__swg{i}")
            )
            aggs.append(
                F.sum(
                    F.round(
                        (F.lit(1.0) - F.col("__w")) * nd * gi, 9
                    ).cast(dec)
                ).alias(f"__swcg{i}")
            )
        tot = pw.agg(*aggs)
        state = tot.select(
            (
                F.col("__sw").cast("double")
                / F.col("__nn").cast("double")
            ).alias("__p"),
            *[
                (
                    F.col(f"__swg{i}").cast("double")
                    / F.col("__sw").cast("double")
                ).alias(f"__m{i}")
                for i in range(f)
            ],
            *[
                (
                    F.col(f"__swcg{i}").cast("double")
                    / F.col("__swc").cast("double")
                ).alias(f"__u{i}")
                for i in range(f)
            ],
        )

    def _clamp(x):
        return F.greatest(
            F.lit(float(eps)), F.least(F.lit(1.0 - float(eps)), x)
        )

    def _r6(x):
        return F.round(x * F.lit(1e6)) / F.lit(1e6)

    out = None
    for i, c in enumerate(agreement_cols):
        m = _clamp(F.col(f"__m{i}"))
        u = _clamp(F.col(f"__u{i}"))
        row = state.select(
            F.lit(c).alias("field"),
            _r6(m).alias("m"),
            _r6(u).alias("u"),
            _r6(F.log2(m / u)).alias("w_agree"),
            _r6(
                F.log2((F.lit(1.0) - m) / (F.lit(1.0) - u))
            ).alias("w_disagree"),
            _r6(F.col("__p")).alias("match_prevalence"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("field")


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Reference Jaro–Winkler (Winkler 1990): matching window
    ``max(|s1|,|s2|)//2 − 1``, transpositions = half the out-of-order
    matched characters, +0.1·prefix·(1−jaro) boost for up to 4 shared
    leading characters when jaro > 0.7.  Empty strings score 0 (even
    against each other) — fuzz-verified bit-equal to DuckDB's
    ``jaro_winkler_similarity`` over 3000 random cases, which is what
    makes the operator oracle-checkable."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    if md < 0:
        md = 0
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if j > 0.7:
        pl = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pl += 1
        j = j + pl * 0.1 * (1.0 - j)
    return j


def jaro_winkler_scores(
    pairs: DataFrame,
    left_text: str,
    right_text: str,
    *,
    out_col: str = "jw_score",
) -> DataFrame:
    """Append the Jaro–Winkler similarity of (*left_text*,
    *right_text*) to an already-blocked candidate-pair frame — the
    classic name comparator feeding :func:`fellegi_sunter_score`
    agreement fields (``jw >= 0.9`` is the conventional "agrees" cut).

    Row-local string work with no shuffle of its own: ONE
    Arrow-batched ``mapInPandas`` stage (the per-pair DP is
    character-sequential, the same reasoning as ``dtw_pairs``), so
    cost is linear in candidate pairs and the blocked join upstream
    stays the only exchange.  Null strings score null; scores are
    6 dp tie-safe.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    in_schema = pairs.schema
    schema = StructType(
        list(in_schema.fields) + [StructField(out_col, DoubleType())]
    )
    lt, rt = left_text, right_text

    def run(batches):
        for pdf in batches:
            scores = [
                None
                if a is None or b is None
                else _jaro_winkler_py(str(a), str(b))
                for a, b in zip(pdf[lt], pdf[rt])
            ]
            pdf = pdf.copy()
            pdf[out_col] = scores
            yield pdf

    out = pairs.mapInPandas(run, schema=schema)
    return out.withColumn(
        out_col, F.round(F.col(out_col) * F.lit(1e6)) / F.lit(1e6)
    )


#: simplified-Soundex consonant classes for a-z (Russell core:
#: vowels+hwy→0, bfpv→1, cgjkqsxz→2, dt→3, l→4, mn→5, r→6) — the
#: SAME literal translate table in both engines
_SOUNDEX_MAP = "01230120022455012623010202"
_SOUNDEX_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def soundex_code(col: Column) -> Column:
    """Simplified Soundex of the FIRST word (Russell 1918 core, no
    H/W-separator refinement): initial letter + the first three
    consonant-class digits after collapsing adjacent duplicates and
    dropping vowels, zero-padded.  Pure portable column algebra —
    ``translate`` + six literal repeat-collapse regexes (RE2 has no
    backreferences, so ``(\\d)\\1+`` is NOT portable; six explicit
    patterns are).  The phonetic blocking key that pairs with x328's
    Jaro–Winkler: block on sound, verify on edit similarity.
    """
    w = F.lower(F.regexp_extract(col, r"[A-Za-z]+", 0))
    digits = F.translate(w, _SOUNDEX_ALPHABET, _SOUNDEX_MAP)
    collapsed = digits
    for d in "0123456":
        collapsed = F.regexp_replace(collapsed, f"{d}{d}+", d)
    tail = F.regexp_replace(
        F.substring(collapsed, 2, 1000), "0", ""
    )
    return F.when(
        F.length(w) > 0,
        F.concat(
            F.upper(F.substring(w, 1, 1)),
            F.rpad(F.substring(tail, 1, 3), 3, "0"),
        ),
    )


def phonetic_block_stats(
    df: DataFrame,
    *,
    id_col: str,
    name_col: str,
    top_k: int = 50,
) -> DataFrame:
    """Phonetic blocking audit: Soundex-code each name's first word
    and profile the resulting blocks — size, distinct surface forms,
    and the block's pair budget (C(n,2), what a within-block
    verifier would score).  The record-linkage planning companion to
    x326's blocking-quality audit: THAT one scores a chosen key,
    this one proposes the phonetic key and shows what it costs.
    Top-*top_k* blocks by (size desc, code) keeps output bounded and
    deterministic.

    Output: ``(soundex, n_items, n_distinct_names, pair_budget)``
    ordered by (n_items desc, soundex), ≤ top_k rows.
    """
    if top_k < 1:
        raise ValueError("phonetic_block_stats: top_k must be >= 1")
    base = df.select(
        F.col(id_col).alias("i"),
        F.lower(
            F.regexp_extract(F.col(name_col), r"[A-Za-z]+", 0)
        ).alias("w"),
        soundex_code(F.col(name_col)).alias("sx"),
    ).where(F.col("sx").isNotNull())
    agg = base.groupBy("sx").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.countDistinct("w").cast("long").alias("n_distinct_names"),
    )
    return (
        agg.select(
            F.col("sx").alias("soundex"),
            "n_items",
            "n_distinct_names",
            (
                F.col("n_items") * (F.col("n_items") - 1) / F.lit(2)
            )
            .cast("long")
            .alias("pair_budget"),
        )
        .orderBy(F.desc("n_items"), "soundex")
        .limit(int(top_k))
    )
