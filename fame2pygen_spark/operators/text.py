"""Text-analysis operators for training-data pipelines.

BASELINE.json north-star extensions — all pure column algebra (JVM-side,
whole-stage codegen; no Python in the hot path):

* tokenization + token counting (whitespace and word-regex)
* quality scoring (length / punctuation / stopword / repetition ratios)
* language identification (stopword-hit heuristic over a fixed
  marker-word table — deterministic, oracle-reproducible)
* document fingerprinting (md5 of normalized text; k-gram min-hash
  sketch for robust fingerprints)

Every function is also expressible in ANSI SQL so the DuckDB oracle can
verify results value-for-value.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import (  # noqa: F401  (normalized_text/fingerprint re-exported)
    _parallelize_input,
    normalized_text,
    text_fingerprint,
)

__all__ = [
    "tokens", "token_count", "word_token_count", "char_count",
    "punct_count", "stopword_ratio", "quality_score", "language_scores",
    "detect_language", "normalized_text", "text_fingerprint",
    "text_profile", "tfidf_top_terms", "chunk_documents", "bm25_rank",
    "term_cooccurrence_pmi", "unigram_surprisal",
    "source_js_divergence", "zipf_fit", "stupid_backoff_score",
]

#: small deterministic stopword tables per language (marker words)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit", "den", "von"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con", "para", "es"),
}

EN_STOPWORDS = LANG_MARKERS["en"]


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text (array<string>, no empties)."""
    return F.filter(F.split(normalized_text(col), " "), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_token_count(col: Column) -> Column:
    """BPE-ish word/number/punct token count via regex extraction."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0))


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordlist, t)))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    return F.when(n > 0, _hits(toks, stopwords) / n).otherwise(F.lit(0.0))


def repetition_ratio(col: Column) -> Column:
    """1 - distinct_tokens/tokens — high values flag degenerate text."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(toks)) / n
    ).otherwise(F.lit(0.0))


def mean_token_length(col: Column) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]: rewards stopword presence and sane
    token lengths, penalizes punctuation soup and repetition.

    score = 0.25·min(1, stopword_ratio·5)
          + 0.25·(1 − min(1, punct_count/tokens))
          + 0.25·(1 − repetition_ratio)
          + 0.25·clamp((mean_len − 1)/6)
    """
    toks = tokens(col)
    n = F.size(toks)
    sw = F.least(F.lit(1.0), stopword_ratio(col) * 5)
    punct = F.when(n > 0, F.least(F.lit(1.0), punct_count(col) / n)).otherwise(
        F.lit(1.0)
    )
    rep = repetition_ratio(col)
    mlen = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), (mean_token_length(col) - 1) / 6)
    )
    return 0.25 * sw + 0.25 * (1 - punct) + 0.25 * (1 - rep) + 0.25 * mlen


def language_scores(col: Column) -> dict[str, Column]:
    """Marker-hit ratio per language."""
    toks = tokens(col)
    n = F.size(toks)
    return {
        lang: F.when(n > 0, _hits(toks, words) / n).otherwise(F.lit(0.0))
        for lang, words in LANG_MARKERS.items()
    }


def detect_language(col: Column, min_score: float = 0.01) -> Column:
    """argmax language by marker ratio; 'und' when nothing scores."""
    scores = language_scores(col)
    pairs = F.array(
        *[
            F.struct(score.alias("s"), F.lit(lang).alias("l"))
            for lang, score in scores.items()
        ]
    )
    best = F.array_max(pairs)  # struct compare: by s, tie-break by l
    return F.when(best["s"] >= min_score, best["l"]).otherwise(F.lit("und"))


#: rolling-hash parameters (Rabin–Karp polynomial over code points)
ROLL_BASE = 257
ROLL_MOD = 1_000_000_007


def rolling_hash(col: Column) -> Column:
    """Polynomial rolling hash of the normalized text (Rabin–Karp:
    ``h = Σ code(c_i)·B^(n-1-i) mod P``) — an order-sensitive integer
    fingerprint, cheaper to compare/join than md5 strings and the
    building block for windowed content-defined chunking.

    One ``aggregate`` pass over the char array; the lambda body touches
    only the accumulator and element (no invariant subtrees — see the
    HOF note in dedup.py).
    """
    chars = F.filter(F.split(normalized_text(col), ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + F.ascii(c)) % F.lit(ROLL_MOD),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, *, k: int = 3
) -> DataFrame:
    """Top-*k* TF-IDF terms per document: ``(doc_id, term, rank, tf,
    tfidf)``.

    tf is the raw in-document term count; idf is the smoothed variant
    ``ln((N+1)/(df+1)) + 1`` (strictly positive, as in scikit-learn's
    TfidfTransformer defaults).  Bulk formulation: normalization staged
    once per doc, tokens exploded once, then two hash aggregations —
    (doc, term) counts and term doc-frequency — joined back on ``term``.
    The doc-frequency side has one row per distinct term, so the join
    broadcasts for real vocabularies; Zipf-hot terms fan out on the
    probe side only (no build-side skew), and ranking shuffles by
    ``doc`` — uniform.  Ranks are computed on the 6dp-rounded score
    with ``term`` as tie-break so ordering is reproducible across
    engines.
    """
    from pyspark.sql import Window

    n_docs = df.count()
    df = _parallelize_input(df)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        normalized_text(F.col(text_col)).alias("__nt"),
    ).select(
        "doc_id", F.explode(F.split(F.col("__nt"), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(dfreq, on="term").withColumn(
        "tfidf", F.round(F.col("tf") * idf, 6)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "rank", "tf", "tfidf")
    )


def text_profile(df: DataFrame, text_col: str) -> DataFrame:
    """Append the standard text-analysis columns to *df*.

    Single-pass plan: the normalize+split token array and every count
    derived from it are staged ONCE in intermediate projections, and
    all nine metrics are arithmetic over the staged columns.  (Calling
    the per-metric helpers directly would re-derive ``tokens(t)``
    inside each of ~6 metric columns — Catalyst's CollapseProject
    keeps a multiply-referenced non-cheap alias in its own projection,
    so the staging is what guarantees one tokenization per row.)
    Values are bit-identical to the per-metric helpers: same formulas,
    shared subtrees.
    """
    t = F.col(text_col)
    staged = _parallelize_input(df).withColumn("__toks", tokens(t))
    toks = F.col("__toks")
    hit_cols = {
        f"__hits_{lang}": _hits(toks, words)
        for lang, words in LANG_MARKERS.items()
    }
    staged = staged.withColumns(
        {
            "__n": F.size(toks),
            "__dist": F.size(F.array_distinct(toks)),
            "__tlen": F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, tk: acc + F.length(tk)
            ),
            "__npunct": punct_count(t),
            **hit_cols,
        }
    )
    n = F.col("__n")
    swr = F.when(n > 0, F.col("__hits_en") / n).otherwise(F.lit(0.0))
    rep = F.when(
        n > 0, F.lit(1.0) - F.col("__dist") / n
    ).otherwise(F.lit(0.0))
    mlen = F.when(n > 0, F.col("__tlen") / n).otherwise(F.lit(0.0))
    punct_norm = F.when(
        n > 0, F.least(F.lit(1.0), F.col("__npunct") / n)
    ).otherwise(F.lit(1.0))
    mlen_clamped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), (mlen - 1) / 6))
    quality = (
        0.25 * F.least(F.lit(1.0), swr * 5)
        + 0.25 * (1 - punct_norm)
        + 0.25 * (1 - rep)
        + 0.25 * mlen_clamped
    )
    lang_pairs = F.array(
        *[
            F.struct(
                F.when(n > 0, F.col(f"__hits_{lang}") / n)
                .otherwise(F.lit(0.0))
                .alias("s"),
                F.lit(lang).alias("l"),
            )
            for lang in LANG_MARKERS
        ]
    )
    best = F.array_max(lang_pairs)  # struct compare: by s, tie-break by l
    return staged.withColumns(
        {
            "n_tokens": n,
            "n_word_tokens": word_token_count(t),
            "n_punct": F.col("__npunct"),
            "stopword_ratio": F.round(swr, 6),
            "repetition_ratio": F.round(rep, 6),
            "mean_token_len": F.round(mlen, 6),
            "quality": F.round(quality, 6),
            "lang_pred": F.when(best["s"] >= 0.01, best["l"]).otherwise(
                F.lit("und")
            ),
            "fingerprint": text_fingerprint(t),
        }
    ).drop("__toks", "__n", "__dist", "__tlen", "__npunct", *hit_cols)


# ------------------------------------------- within-document repetition


def token_ngrams(toks: Column, n: int) -> Column:
    """Word *n*-grams of a token array, space-joined (array<string>).

    ``slice`` is 1-based; documents with fewer than *n* tokens produce
    an empty array (explicit guard — ``sequence(1, 0)`` counts down).
    """
    m = F.size(toks)
    idx = F.when(
        m >= n, F.sequence(F.lit(1), m - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )


def repetition_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Gopher-style within-document repetition metrics (Rae et al.
    2021, "Scaling Language Models", §A.1.1 repetition filters —
    public-paper semantics, deterministic re-definition):

    ``top_{top_n}gram_char_frac``
        chars covered by the single most frequent word *top_n*-gram:
        ``count · len(gram) / len(normalized_text)`` (ties broken by
        lexicographically smallest gram, so cross-engine stable).
    ``dup_{dup_n}gram_frac``
        fraction of word *dup_n*-gram occurrences that are repeats:
        ``1 − distinct/total``.
    ``symbol_word_ratio``
        punctuation marks per token.
    plus ``n_tokens``, ``mean_token_len`` — the inputs a Gopher-rule
    filter needs.

    Bulk formulation: normalize+tokenize staged once per document, one
    explode per metric family, aggregations keyed by ``doc`` (uniform,
    map-side combinable).  Both metric joins are on the document id —
    at 100 TB the joins co-partition with AQE and nothing is quadratic.
    Returns ``(doc, n_chars_norm, n_tokens, mean_token_len,
    symbol_word_ratio, top_gram, top_gram_count, top_Ngram_char_frac,
    dup_Ngram_frac)``.
    """
    t = F.col(text_col)
    staged = _parallelize_input(df).select(
        F.col(id_col).alias("doc"),
        normalized_text(t).alias("__nt"),
        tokens(t).alias("__toks"),
        punct_count(t).alias("__npunct"),
    ).withColumns(
        {
            "__n": F.size("__toks"),
            "__tlen": F.aggregate(
                F.col("__toks"),
                F.lit(0).cast("long"),
                lambda acc, tk: acc + F.length(tk),
            ),
        }
    )

    base = staged.select(
        "doc",
        F.length("__nt").alias("n_chars_norm"),
        F.col("__n").alias("n_tokens"),
        F.round(
            F.when(F.col("__n") > 0, F.col("__tlen") / F.col("__n")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("mean_token_len"),
        F.round(
            F.when(
                F.col("__n") > 0, F.col("__npunct") / F.col("__n")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("symbol_word_ratio"),
    )

    # most frequent top_n-gram per doc: explode → count → rank
    g_top = (
        staged.select(
            "doc", F.explode(token_ngrams(F.col("__toks"), top_n)).alias("g")
        )
        .groupBy("doc", "g")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("doc").orderBy(F.col("c").desc(), F.col("g").asc())
    top1 = (
        g_top.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("doc", F.col("g").alias("top_gram"), F.col("c").alias("top_gram_count"))
    )

    # duplicate dup_n-gram occurrence fraction per doc
    g_dup = (
        staged.select(
            "doc", F.explode(token_ngrams(F.col("__toks"), dup_n)).alias("g")
        )
        .groupBy("doc")
        .agg(
            F.count("*").alias("__tot"),
            F.count_distinct(F.col("g")).alias("__dist"),
        )
        .select(
            "doc",
            F.round(F.lit(1.0) - F.col("__dist") / F.col("__tot"), 6).alias(
                f"dup_{dup_n}gram_frac"
            ),
        )
    )

    out = (
        base.join(top1, on="doc", how="left")
        .join(g_dup, on="doc", how="left")
        .withColumn(
            f"top_{top_n}gram_char_frac",
            F.round(
                F.coalesce(
                    F.col("top_gram_count")
                    * F.length("top_gram")
                    / F.col("n_chars_norm"),
                    F.lit(0.0),
                ),
                6,
            ),
        )
        .withColumn(
            f"dup_{dup_n}gram_frac",
            F.coalesce(F.col(f"dup_{dup_n}gram_frac"), F.lit(0.0)),
        )
    )
    return out


#: Gopher-rule thresholds (public-paper values where the corpus makes
#: them meaningful; tightened top-2gram bound so synthetic word-soup
#: corpora exercise both branches)
GOPHER_RULES = {
    "min_tokens": 25,
    "max_tokens": 100_000,
    "min_mean_token_len": 3.0,
    "max_mean_token_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_top_2gram_char_frac": 0.08,
    "max_dup_5gram_frac": 0.15,
}


def gopher_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    rules: dict | None = None,
) -> DataFrame:
    """Repetition/quality document filter: :func:`repetition_profile`
    plus a boolean ``keep`` column applying the Gopher-style rules.

    Pure composition — one profile pass, one final column; filter the
    result on ``keep`` to materialize the curated corpus.
    """
    r = dict(GOPHER_RULES, **(rules or {}))
    prof = repetition_profile(df, text_col, id_col)
    keep = (
        (F.col("n_tokens") >= r["min_tokens"])
        & (F.col("n_tokens") <= r["max_tokens"])
        & (F.col("mean_token_len") >= r["min_mean_token_len"])
        & (F.col("mean_token_len") <= r["max_mean_token_len"])
        & (F.col("symbol_word_ratio") <= r["max_symbol_word_ratio"])
        & (F.col("top_2gram_char_frac") <= r["max_top_2gram_char_frac"])
        & (F.col("dup_5gram_frac") <= r["max_dup_5gram_frac"])
    )
    return prof.withColumn("keep", keep)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_chars: int,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into fixed-size character chunks for
    embedding / retrieval pipelines: chunks of *chunk_chars* characters
    starting every *stride* characters (default: non-overlapping,
    ``stride = chunk_chars``; a smaller stride overlaps neighbors).

    Row-local: start offsets are a ``sequence`` + ``posexplode`` and the
    slice is ``substring`` — zero shuffles, rides inside the scan's
    codegen stage, embarrassingly parallel at any scale.  Empty
    documents still emit one (empty) chunk so no row disappears.

    Output: *id_col*, ``chunk_idx`` (0-based), ``chunk_start`` (1-based
    char offset), ``chunk_len``, ``chunk_text``.
    """
    if chunk_chars <= 0:
        raise ValueError("chunk_chars must be positive")
    stride = stride or chunk_chars
    if stride <= 0:
        raise ValueError("stride must be positive")

    t = F.col(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(t), F.lit(1)), F.lit(int(stride))
    )
    out = df.select(
        F.col(id_col),
        t.alias("__text"),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    chunk = F.substring(F.col("__text"), F.col("chunk_start"), chunk_chars)
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        chunk.alias("chunk_text"),
    )


def bm25_rank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> DataFrame:
    """Top-*top_n* documents for a bag-of-words query under BM25
    (Robertson/Sparck-Jones; the ``ln(1 + (N-df+0.5)/(df+0.5))``
    non-negative idf variant used by Lucene): ``(doc_id, score, dl)``
    plus one ``tf_<i>`` count per query term.

    Plan shape — fully row-local scoring, one 1-row reduce, one top-n:
    per-document term frequencies come from ``F.filter`` over the
    staged token array (no explode, no (doc, term) shuffle — the query
    has only a handful of terms, so k array scans per row beat a
    vocabulary-wide aggregation), corpus statistics (N, avgdl, per-term
    df) are a single global aggregate, and the final ranking is an
    ``ORDER BY … LIMIT n`` — Spark plans TakeOrderedAndProject, a
    per-partition heap + driver merge of n rows, never a full sort.
    Scores round to 6 dp with the doc id as tie-break so the ranking
    is reproducible across engines.

    The corpus-stats aggregate is materialized driver-side into
    literals (same documented pattern as ``tfidf_top_terms``'s
    ``df.count()``): one job over the already-reduced per-doc counts,
    whose 1-row result parameterizes the scoring expressions.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    df = _parallelize_input(df)

    toks = tokens(F.col(text_col))

    # single-arg lambda via a factory: a second (default) parameter
    # would make F.filter treat the lambda as (element, index)
    def _eq(term: str):
        lit = F.lit(term)
        return lambda x: x == lit

    tf_cols = {
        f"tf_{i}": F.size(F.filter(toks, _eq(t))).cast("long")
        for i, t in enumerate(terms)
    }
    per_doc = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        *[c.alias(n) for n, c in tf_cols.items()],
    )

    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).first()
    n_docs = float(stats["n_docs"])
    avgdl = float(stats["avgdl"] or 0.0)

    score = F.lit(0.0)
    for i in range(len(terms)):
        dfreq = float(stats[f"df_{i}"])
        idf = math.log(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
        tf = F.col(f"tf_{i}").cast("double")
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(max(avgdl, 1e-9))
        )
        score = score + F.lit(idf) * F.try_divide(tf * F.lit(k1 + 1.0), norm)

    scored = per_doc.withColumn("score", F.round(score, 6))
    return (
        scored.where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(top_n))
    )


def term_cooccurrence_pmi(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_count: int = 5,
    max_terms_per_doc: int = 50,
    top_n: int = 100,
) -> DataFrame:
    """Top document-level term-pair associations by pointwise mutual
    information: ``(term_a, term_b, n_ab, n_a, n_b, pmi)`` with
    ``term_a < term_b``, ranked by ``pmi`` (6 dp, pair as tie-break).

    PMI over document co-occurrence: ``ln(N * n_ab / (n_a * n_b))``
    with N the document count and n_* document frequencies.

    Scale shape — the quadratic step is explicitly bounded: each
    document contributes its DISTINCT terms only, capped at
    *max_terms_per_doc* by in-document frequency (count desc, term asc
    — deterministic), so pair generation is an in-doc self-join of at
    most m terms → ≤ m(m-1)/2 rows per doc, linear in corpus size for
    fixed m.  Pairs and unigram frequencies are uniform-key hash
    aggregations; the *min_count* filter prunes the long tail BEFORE
    the final ranking, and the ranking itself is ORDER BY + LIMIT
    (TakeOrderedAndProject heap).  One driver-side ``count()`` for N
    (the documented literal-stats pattern).
    """
    n_docs = df.count()
    df = _parallelize_input(df)

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    per_doc = toks.groupBy("doc_id", "term").agg(F.count("*").alias("__c"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("__c").desc(), F.col("term").asc()
    )
    kept = (
        per_doc.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_terms_per_doc)
        .select("doc_id", "term")
    )

    uni = kept.groupBy("term").agg(F.count("*").cast("long").alias("n"))
    pairs = (
        kept.alias("a")
        .join(kept.alias("b"), on="doc_id")
        .where(F.col("a.term") < F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    ua = uni.select(F.col("term").alias("term_a"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("n").alias("n_b"))
    scored = (
        pairs.join(ua, on="term_a")
        .join(ub, on="term_b")
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.lit(float(n_docs))
                    * F.col("n_ab")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    ).limit(int(top_n)).select(
        "term_a", "term_b", "n_ab", "n_a", "n_b", "pmi"
    )


def unigram_surprisal(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document mean token surprisal under the corpus's own
    unigram model: ``(doc_id, n_tokens, mean_surprisal)`` where
    surprisal of a token is ``-log2(count(term)/total_tokens)`` (bits).

    A self-contained perplexity-style quality signal — no external
    language model: boilerplate-heavy documents score low (their
    tokens are corpus-frequent), lexically-rich ones score high, so
    thresholding both tails is a standard curation filter.  No
    smoothing is needed: every scored token is in the model's own
    corpus by construction.

    Plan shape: tokens explode once; term frequencies are one
    uniform-key aggregation; scoring joins the (term, count) frame
    back on the term key — Zipf-hot terms fan out on the probe side
    only — and reduces per doc.  The total-token count is one 1-row
    aggregate materialized as a literal (the documented
    ``tfidf_top_terms`` pattern).
    """
    df = _parallelize_input(df)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    freq = toks.groupBy("term").agg(F.count("*").alias("__n"))
    total = float(freq.agg(F.sum("__n")).first()[0] or 0.0)
    if total == 0:
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("mean_surprisal"),
        )
    surprisal = -F.log2(F.col("__n") / F.lit(total))
    return (
        toks.join(freq, on="term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg(surprisal), 6).alias("mean_surprisal"),
        )
    )


def source_js_divergence(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (bits) between the unigram
    term distributions of each group: ``(group_a, group_b, jsd)`` with
    ``group_a < group_b`` — the symmetric, bounded-[0,1] lexical
    distance between sources (0 = identical vocabularies, 1 =
    disjoint).

    ``JSD = 0.5·KL(p‖m) + 0.5·KL(q‖m)`` with ``m = (p+q)/2``; terms
    absent from one side contribute ``0.5·p·log2(2)`` — handled
    exactly by the full outer join with zero fills, no smoothing
    needed.

    Plan shape: one (group, term) count aggregation plus a group-share
    normalization (broadcast totals); the pairwise comparison is a
    term-keyed self-join (fans out only on shared vocabulary — the
    same shape as :func:`~fame2pygen_spark.operators.dedup.
    source_overlap`) — except a FULL join cannot express ``a < b``
    pairing directly, so one-sided terms are recovered as the residual
    probability mass ``1 − Σ shared p`` per pair, keeping the join an
    inner one.
    """
    counts = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("g", "term")
        .agg(F.count("*").alias("c"))
    )
    totals = counts.groupBy("g").agg(F.sum("c").alias("t"))
    shares = counts.join(F.broadcast(totals), on="g").select(
        "g", "term", (F.col("c") / F.col("t")).alias("p")
    )
    a = shares.select(
        F.col("g").alias("group_a"), "term", F.col("p").alias("pa")
    )
    b = shares.select(
        F.col("g").alias("group_b"), "term", F.col("p").alias("pb")
    )
    shared = a.join(b, on="term").where(F.col("group_a") < F.col("group_b"))
    m = (F.col("pa") + F.col("pb")) / 2
    # contribution of shared terms; one-sided terms add 0.5*p*log2(2)
    # = 0.5*p, recovered from the residual mass 1 - Σ shared p
    contrib = 0.5 * F.col("pa") * F.log2(F.col("pa") / m) + 0.5 * F.col(
        "pb"
    ) * F.log2(F.col("pb") / m)
    agg = shared.groupBy("group_a", "group_b").agg(
        F.sum(contrib).alias("__shared"),
        F.sum("pa").alias("__mass_a"),
        F.sum("pb").alias("__mass_b"),
    )
    jsd = (
        F.col("__shared")
        + 0.5 * (1.0 - F.col("__mass_a"))
        + 0.5 * (1.0 - F.col("__mass_b"))
    )
    return agg.select(
        "group_a", "group_b", F.round(jsd, 6).alias("jsd")
    )


def dup_span_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 13,
) -> DataFrame:
    """CROSS-document duplicated n-gram span profile (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    ExactSubstr criterion at token granularity): for each document,
    the fraction of its positional token n-grams that also occur in at
    least one OTHER document.  Complements :func:`repetition_profile`
    (within-doc) and the pair-level dedup operators: this one scores
    every document by how much of its *content* is corpus-duplicated,
    which is the signal used to cut boilerplate/licence/template spans
    before training.

    Shape: explode positional n-grams once, aggregate to
    ``(doc, gram) -> positions`` (map-side combine absorbs within-doc
    repeats), then a gram-keyed count of *documents* per gram over that
    already-deduped set, a join back on the gram key, and a final
    per-doc rollup.  Two shuffles on uniform keys (gram md5-ish
    distribution), no windows, no driver state — the 100 TB plan is
    the same plan.  Documents shorter than *n* tokens have no n-gram
    positions and are excluded (mirrored by the oracle).

    Output: ``doc`` + ``n_positions``, ``n_dup_positions``,
    ``dup_frac`` (exact integer ratio, rounded to 6 dp).
    """
    toked = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    ).where(F.size("__toks") >= n)
    pos = toked.select(
        "doc", F.explode(token_ngrams(F.col("__toks"), n)).alias("__g")
    )
    per_doc_gram = pos.groupBy("doc", "__g").agg(
        F.count("*").cast("long").alias("__n_pos_g")
    )
    gram_docs = per_doc_gram.groupBy("__g").agg(
        F.count("*").cast("long").alias("__n_docs")
    )
    joined = per_doc_gram.join(gram_docs, on="__g")
    return (
        joined.groupBy("doc")
        .agg(
            F.sum("__n_pos_g").cast("long").alias("n_positions"),
            F.sum(
                F.when(F.col("__n_docs") >= 2, F.col("__n_pos_g")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_dup_positions"),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.col("n_dup_positions").cast("double")
                / F.col("n_positions"),
                6,
            ),
        )
    )


#: GPT-2-style pre-tokenizer pattern (Radford et al. 2019 — the
#: regex that splits text into BPE merge units: contractions, space-
#: prefixed letter runs, digit runs, punctuation runs, whitespace).
#: Ordered alternation; no lookarounds, so Java regex (Spark) and RE2
#: (DuckDB) produce the identical piece sequence.
BPE_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


def bpe_pretoken_profile(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document BPE pre-tokenization profile: how a GPT-2-style
    tokenizer would segment the text BEFORE byte-pair merges — the
    standard denominator for token-budget accounting ("this corpus is
    N billion tokens") and a compression proxy (chars per pre-token
    correlates with post-merge token counts).

    Entirely row-local column algebra (one regexp_extract_all + array
    filters) — zero shuffles, stays in whole-stage codegen, scales
    embarrassingly.  Whitespace-run matches are excluded from the
    token count (GPT-2 folds single leading spaces into the following
    piece; standalone runs are layout, not tokens).

    Output: ``doc_id, n_chars, n_ws_tokens, n_bpe_tokens,
    n_contractions, chars_per_bpe_token`` (6 dp).
    """
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), 0
    )
    non_ws = F.filter(pieces, lambda x: F.trim(x) != F.lit(""))
    contractions = F.filter(
        pieces, lambda x: x.startswith(F.lit("'"))
    )
    n_bpe = F.size(non_ws).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.size(contractions).cast("long").alias("n_contractions"),
        F.round(
            F.try_divide(F.length(text_col).cast("double"), n_bpe), 6
        ).alias("chars_per_bpe_token"),
    )


def bigram_surprisal(
    df: DataFrame, text_col: str, id_col: str, *, k: float = 0.5
) -> DataFrame:
    """Per-document mean BIGRAM surprisal under the corpus's own
    add-k-smoothed bigram model: ``(doc_id, n_bigrams,
    mean_surprisal)`` in bits.

    The contextual upgrade of :func:`unigram_surprisal`: a document of
    individually-common words in unnatural ORDER (shuffled text, SEO
    keyword stuffing, template churn) scores high here while scoring
    low on the unigram signal — the difference between the two is a
    cheap fluency proxy used in corpus quality filtering.

    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)`` where ``c(w1·)``
    counts bigrams starting with ``w1`` and ``V`` is corpus vocabulary
    size; surprisal is ``-log2 P``.  Smoothing matters here (unlike
    the unigram case) because conditional contexts CAN be unseen when
    scoring with per-document leave-nothing-out counts.

    Plan shape: tokens posexplode once; bigrams come from a ``lead``
    over the (doc, position) window — row-linear, no self-join of the
    token table; model counts are two keyed aggregations (bigram,
    context) joined on the bigram key with Zipf fanout on the probe
    side only; V is a 1-row aggregate injected as a literal.  Each
    per-bigram surprisal is decimal-cast before the per-doc mean so
    results are accumulation-order-insensitive.
    """
    df = _parallelize_input(df)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w1"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = toks.withColumn("w2", F.lead("w1").over(w)).where(
        F.col("w2").isNotNull()
    )
    vocab = float(toks.select("w1").distinct().count())
    bg_counts = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("__cb")
    )
    ctx_counts = bg_counts.groupBy("w1").agg(
        F.sum("__cb").alias("__cw")
    )
    model = bg_counts.join(ctx_counts, on="w1")
    p = (F.col("__cb") + F.lit(float(k))) / (
        F.col("__cw").cast("double") + F.lit(float(k)) * F.lit(vocab)
    )
    surprisal = (-F.log2(p)).cast("decimal(38,12)")
    return (
        big.join(model, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.try_divide(
                    F.sum(surprisal).cast("double"),
                    F.count(F.lit(1)).cast("double"),
                ),
                6,
            ).alias("mean_surprisal"),
        )
    )


RAKE_STOPWORDS = [
    "the", "a", "an", "and", "or", "but", "if", "then", "else", "of",
    "in", "on", "at", "to", "for", "with", "by", "from", "as", "is",
    "are", "was", "were", "be", "been", "it", "its", "this", "that",
    "these", "those", "not", "no", "so", "we", "you", "they", "he",
    "she", "i", "my", "our", "their", "your",
]


def rake_keywords(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    top_n: int = 20,
    max_phrase_len: int = 4,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free token runs; each word
    scores ``degree/frequency`` where ``degree(w) = Σ |phrase|`` over
    phrases containing w (co-occurrence-weighted) and ``freq(w)`` its
    candidate count; a phrase scores the sum of its word scores.
    Returns the corpus top-*top_n*: ``(phrase, n_occurrences,
    score)`` (6 dp; ties broken by phrase text).

    Spark-first mechanics: phrase segmentation is the gaps-and-islands
    idiom — non-stopword tokens keep their position, ``pos −
    row_number`` is constant within a run — one window per doc, no
    per-row Python and no HOF lambda over whole documents (the
    re-evaluation pitfall documented in prefix_jaccard_join).  Word
    statistics are one aggregation over exploded phrase words; phrase
    scores decimal-cast word scores before summing so corpus-wide
    ranking is partitioning-independent.  ``max_phrase_len`` caps
    degenerate runs (a stopword-free spam page is otherwise one giant
    phrase with an enormous score).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w"),
    )
    nonstop = toks.where(~F.col("w").isin(RAKE_STOPWORDS))
    wn = Window.partitionBy("doc_id").orderBy("pos")
    runs = nonstop.withColumn(
        "__grp", F.col("pos") - F.row_number().over(wn)
    )
    inst = (
        runs.groupBy("doc_id", "__grp")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "w"))
                    ),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("int").alias("plen"),
        )
        .where(F.col("plen") <= F.lit(int(max_phrase_len)))
    )
    words = inst.select(
        "doc_id",
        "__grp",
        "plen",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    stats = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("__freq"),
        F.sum("plen").cast("long").alias("__deg"),
    )
    score_w = F.try_divide(
        F.col("__deg").cast("double"), F.col("__freq").cast("double")
    )
    scored_words = stats.withColumn("__ws", score_w)
    inst_scores = (
        words.join(scored_words, on="w")
        .groupBy("doc_id", "__grp")
        .agg(
            F.sum(F.col("__ws").cast("decimal(38,12)"))
            .cast("double")
            .alias("__ps")
        )
    )
    phrases = inst.join(inst_scores, on=["doc_id", "__grp"]).groupBy(
        "phrase"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.round(F.max("__ps"), 6).alias("score"),
    )
    return phrases.orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    ).limit(int(top_n))


def boilerplate_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    *,
    n: int = 2,
    min_frac: float = 0.2,
    min_docs: int = 2,
) -> DataFrame:
    """Per-group boilerplate n-gram profile (the C4 / RefinedWeb
    "frequent line" removal signal, Raffel et al. 2020 §2.2 /
    Penedo et al. 2023 — re-expressed at n-gram granularity): an
    n-gram is BOILERPLATE within a group (source/domain) when it
    occurs in ≥ *min_docs* AND ≥ *min_frac* of the group's documents
    — navigation chrome, cookie banners, footers repeat across a
    domain's pages while real content doesn't.  Output is the per-doc
    contamination profile a curation filter thresholds on.

    Distinct from x74 ``dup_span_profile`` (global cross-doc duplicate
    positions, any 2 docs) — this is group-relative *template*
    detection: a gram in 2 of 10 000 domain pages is a coincidence,
    in 30% of them it's chrome.

    Scale shape: one ``distinct`` on (group, doc, gram), one
    map-side-combinable ``groupBy(group, gram)`` doc count, group
    sizes as a tiny broadcast, and the boilerplate gram set — by
    construction ≤ |grams| · min_frac⁻¹ / |group docs|, i.e. small —
    broadcast back onto the per-doc rollup.  No self-joins, nothing
    quadratic; the heavy explode shuffles once.

    Output: ``group_col, doc, n_grams_distinct, n_boiler,
    boiler_frac`` (6 dp) — one row per document with ≥1 n-gram (docs
    shorter than *n* tokens have no profile).
    """
    df = _parallelize_input(df)
    gid, doc = F.col(group_col), F.col(id_col)
    pd_ = (
        df.select(
            gid.alias("__grp"),
            doc.alias("doc"),
            F.explode(token_ngrams(tokens(F.col(text_col)), int(n))).alias(
                "g"
            ),
        )
        .distinct()
        # feeds the gram-frequency count AND the per-doc rollup —
        # materialize once (cf. the curation-pipeline checkpoint)
        .localCheckpoint(eager=True)
    )
    sz = df.groupBy(gid.alias("__grp")).agg(
        F.countDistinct(doc).alias("__n_group_docs")
    )
    gc = pd_.groupBy("__grp", "g").agg(F.count(F.lit(1)).alias("__nd"))
    bl = (
        gc.join(F.broadcast(sz), on="__grp")
        .where(
            (F.col("__nd") >= F.lit(int(min_docs)))
            & (
                F.col("__nd")
                >= F.lit(float(min_frac)) * F.col("__n_group_docs")
            )
        )
        .select("__grp", "g", F.lit(True).alias("__bl"))
    )
    return (
        pd_.join(F.broadcast(bl), on=["__grp", "g"], how="left")
        .groupBy(F.col("__grp").alias(group_col), "doc")
        .agg(
            F.count(F.lit(1)).alias("n_grams_distinct"),
            F.count(F.when(F.col("__bl"), 1)).alias("n_boiler"),
        )
        .withColumn(
            "boiler_frac",
            F.round(
                F.col("n_boiler").cast("double")
                / F.col("n_grams_distinct"),
                6,
            ),
        )
    )


def lang_span_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span_tokens: int = 10,
) -> DataFrame:
    """Code-switching / mixed-language span profile: language-id each
    consecutive *span_tokens*-token window of a document (same marker
    rule as the whole-doc ``lang_pred``: argmax marker-hit ratio,
    ``und`` below 1%), then summarize the per-doc language mixture —
    the span-level signal monolingual corpus filters need: a document
    that is 60% English and 40% Spanish passes a doc-level langid
    threshold while poisoning both monolingual training sets, and the
    switch count separates translation-pair pages (1 switch) from
    boilerplate-interleaved spam (many).

    Per doc: ``n_spans``, ``n_langs`` (distinct identified languages),
    ``dominant_lang`` (modal span language incl. ``und``, ties →
    lexicographically smallest), ``dominant_frac``, and ``switches``
    (adjacent span pairs whose language differs).

    Scale shape: the span explode is the only row multiplier
    (|tokens|/span_tokens rows per doc); every aggregate and the modal
    window are doc-keyed.  Engine-exactness: marker hits are integer
    counts, ratios are single divisions, the argmax is a struct
    compare — no float accumulation.

    Docs with no tokens produce no row.
    """
    df = _parallelize_input(df)
    k = int(span_tokens)
    nt = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    ).where(F.size("__toks") > 0)
    n_spans_doc = F.ceil(F.size("__toks") / F.lit(k)).cast("int")
    spans = nt.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans_doc - 1),
                lambda i: F.slice(F.col("__toks"), i * k + 1, k),
            )
        ).alias("pos", "__span"),
    )
    n = F.size("__span")
    lang_pairs = F.array(
        *[
            F.struct(
                (_hits(F.col("__span"), words) / n).alias("s"),
                F.lit(lang).alias("l"),
            )
            for lang, words in LANG_MARKERS.items()
        ]
    )
    best = F.array_max(lang_pairs)
    tagged = spans.select(
        "doc",
        "pos",
        F.when(best["s"] >= 0.01, best["l"]).otherwise(F.lit("und")).alias(
            "lang"
        ),
    # feeds the switch scan AND the modal election — materialize once
    ).localCheckpoint(eager=True)
    wlag = Window.partitionBy("doc").orderBy("pos")
    seq = tagged.withColumn("__prev", F.lag("lang").over(wlag))
    per_doc = seq.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.countDistinct(F.when(F.col("lang") != "und", F.col("lang")))
        .cast("long")
        .alias("n_langs"),
        F.count(
            F.when(
                F.col("__prev").isNotNull()
                & (F.col("lang") != F.col("__prev")),
                1,
            )
        )
        .cast("long")
        .alias("switches"),
    )
    modal = (
        tagged.groupBy("doc", "lang")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("doc").orderBy(
                    F.desc("__c"), F.asc("lang")
                )
            ),
        )
        .where(F.col("__r") == 1)
        .select(
            "doc",
            F.col("lang").alias("dominant_lang"),
            F.col("__c").alias("__cm"),
        )
    )
    return (
        per_doc.join(modal, on="doc")
        .withColumn(
            "dominant_frac",
            F.round(F.col("__cm").cast("double") / F.col("n_spans"), 6),
        )
        .select(
            "doc", "n_spans", "n_langs", "dominant_lang",
            "dominant_frac", "switches",
        )
    )


#: symbol separator inside BPE sequences — ASCII unit separator, never
#: present in normalized text
BPE_SEP = "\x1f"


def _bpe_apply_merge(seq, a, b):
    """Greedy LTR application of ONE merge (a, b) to a SEP-joined
    symbol sequence, as a left fold: fuse x onto the accumulator with
    no separator iff the accumulator's last symbol == a and x == b.
    Exact greedy semantics (fuzz-pinned) — ``ab`` can never equal *a*,
    so a fused symbol never re-matches within the same step."""
    arr = F.split(seq, BPE_SEP)
    return F.aggregate(
        F.slice(arr, 2, F.size(arr) - 1),
        F.element_at(arr, 1),
        lambda acc, x: F.when(
            (F.element_at(F.split(acc, BPE_SEP), -1) == a) & (x == b),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(BPE_SEP), x)),
    )


def bpe_init_seqs(df: DataFrame, text_col: str) -> DataFrame:
    """Word-frequency table with character-level symbol sequences —
    the BPE training start state: ``(word, freq, seq)`` where *seq* is
    the word's characters joined by :data:`BPE_SEP`.  Tokens that
    contain the separator byte itself (C0 control chars survive the
    whitespace normalizer) are excluded — they would split into
    phantom empty symbols and poison the pair statistics."""
    df = _parallelize_input(df)
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(~F.col("word").contains(BPE_SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    # '(.)' -> '$1<SEP>' appends a separator after every char; strip
    # the trailing one.  Built with the identical regexp in the SQL
    # oracle, so sequences match byte-for-byte.
    seq = F.regexp_replace(
        F.regexp_replace(F.col("word"), "(.)", "$1" + BPE_SEP),
        BPE_SEP + "$",
        "",
    )
    return words.withColumn("seq", seq)


def bpe_merge_step(seqs: DataFrame) -> DataFrame:
    """One byte-pair-encoding merge (Sennrich et al. 2016,
    arXiv:1508.07909 — the tokenizer-training iteration): count every
    adjacent symbol pair weighted by word frequency, pick the most
    frequent pair (ties → lexicographically smallest), and merge its
    non-overlapping occurrences left-to-right in every word.  Repeated
    V times this trains the V-entry merge table; each step is one
    bounded aggregation over the word table — at 100 TB the word-freq
    table (not the corpus) is the iteration state, exactly why BPE
    training scales.

    The greedy left-to-right merge is a left FOLD over the symbol
    array: fuse the next symbol onto the accumulator (no separator)
    exactly when the accumulator's LAST symbol equals *a* and the next
    equals *b*; the fused symbol ``ab`` can never equal *a* (b is
    non-empty), so the fold reproduces greedy non-overlapping LTR
    including self-pair runs — fuzz-pinned against a brute-force
    reference in tests.  (A plain string ``replace`` on the joined
    sequence is WRONG here: it matches across symbol boundaries —
    symbols ``[th, e]`` with merge (h, e) would fuse — and a fully
    delimited pattern consumes the shared separator of adjacent
    occurrences.)  Both engines express the fold identically
    (``aggregate`` / ``list_reduce`` with a string accumulator).

    Plan shape: pair counts = one explode of the zipped symbol array +
    one map-side-combinable groupBy; the argmax is ``orderBy().limit
    (1)`` (a heap, no global sort) broadcast back onto the word table;
    the merge itself is a map-only expression.  Integer counts
    end to end.

    Input/output: ``(word, freq, seq)`` — re-feed the output for the
    next merge.  Output adds ``pair_a, pair_b, pair_count`` (the
    learned merge-table entry, identical on every row).
    """
    arr = F.split(F.col("seq"), BPE_SEP)
    m = F.size(arr)
    zipped = F.arrays_zip(
        F.slice(arr, 1, m - 1).alias("a"), F.slice(arr, 2, m - 1).alias("b")
    )
    pairs = (
        seqs.where(m >= 2)
        .select("freq", F.explode(zipped).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )
    # a null sentinel keeps the step total when NO pair remains (fully
    # merged vocabulary): the word table passes through unchanged with
    # null pair columns instead of being annihilated by an empty join
    sentinel = seqs.limit(1).select(
        F.lit(None).cast("string").alias("a"),
        F.lit(None).cast("string").alias("b"),
        F.lit(None).cast("long").alias("pair_count"),
    )
    best = (
        pairs.unionByName(sentinel)
        .orderBy(
            F.desc_nulls_last("pair_count"),
            F.asc_nulls_last("a"),
            F.asc_nulls_last("b"),
        )
        .limit(1)
    )
    merged = F.when(
        F.col("a").isNotNull(),
        _bpe_apply_merge(F.col("seq"), F.col("a"), F.col("b")),
    ).otherwise(F.col("seq"))
    return seqs.crossJoin(F.broadcast(best)).select(
        "word",
        "freq",
        merged.alias("seq"),
        F.col("a").alias("pair_a"),
        F.col("b").alias("pair_b"),
        F.col("pair_count").cast("long").alias("pair_count"),
    )


def bpe_encode_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize every document with a learned BPE merge table and
    report the per-doc token economics: ``(doc, n_words, n_subwords,
    fertility)`` where fertility = subwords per word — the number a
    tokenizer team watches per language/source (fertility ≫ 1 on a
    domain means the vocab under-serves it and training pays the
    context-length tax).

    Encoding applies the merges IN LEARNED ORDER, each as the same
    greedy left-to-right ``replace`` the training step used — so
    encode(train corpus) is consistent with the merge table by
    construction.

    Scale shape: the merge chain is applied to the DISTINCT word
    vocabulary, not to every token occurrence — the vocab table is
    the bounded object (the x138 insight again); occurrences then
    join the encoded vocab (uniform word key) and roll up per doc.
    """
    df = _parallelize_input(df)
    occ = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("word")
    ).where(~F.col("word").contains(BPE_SEP))
    vocab = occ.select("word").distinct()
    seq = F.regexp_replace(
        F.regexp_replace(F.col("word"), "(.)", "$1" + BPE_SEP),
        BPE_SEP + "$",
        "",
    )
    for a, b in merges:
        seq = _bpe_apply_merge(seq, F.lit(a), F.lit(b))
    encoded = vocab.select(
        "word", F.size(F.split(seq, BPE_SEP)).alias("__n_sub")
    )
    return (
        occ.join(encoded, on="word")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__n_sub").cast("long").alias("n_subwords"),
        )
        .withColumn(
            "fertility",
            F.round(
                F.col("n_subwords").cast("double") / F.col("n_words"), 6
            ),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_n: int = 500,
    min_rank: int = 1,
) -> DataFrame:
    """Zipf's-law fit over the corpus term-frequency distribution: OLS
    of ``ln(freq)`` on ``ln(rank)`` across the *top_n* most frequent
    terms.  A healthy natural-language corpus fits slope ≈ −1
    (Zipf 1949); a slope far from −1 or a poor R² flags template spam,
    boilerplate floods, or tokenizer breakage — a one-row corpus
    health check run before committing a crawl to training.

    Shape: the only full pass is the token explode + term groupBy
    (map-side combined).  The top-*n* cut is ``orderBy().limit()`` —
    Spark plans TakeOrderedAndProject (a per-partition heap + driver
    merge of n·partitions rows), NEVER a global sort.  Ranking and the
    OLS moments then run over ≤ *top_n* rows, bounded by the parameter
    regardless of corpus size.  Moment sums are decimal-cast
    (order-insensitive, the ``corr_pairs`` idiom).

    *min_rank* drops the first ranks from the fit (the classic Zipf
    departure zone for function words).  Ties rank by
    ``(freq DESC, term ASC)`` so the cut is deterministic.

    Output, one row: ``(n_terms, total_tokens, slope, intercept, r2)``
    (6 dp).  ``total_tokens`` counts the whole corpus, not the top-n.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    total = counts.agg(
        F.sum("freq").cast("long").alias("total_tokens")
    )
    top = counts.orderBy(F.desc("freq"), F.asc("term")).limit(int(top_n))
    w = Window.partitionBy().orderBy(F.desc("freq"), F.asc("term"))
    ranked = (
        top.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") >= int(min_rank))
        .select(
            F.log(F.col("rank").cast("double")).alias("__x"),
            F.log(F.col("freq").cast("double")).alias("__y"),
        )
    )
    dec = "decimal(38,12)"
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(F.col("__x").cast(dec)).alias("__sx"),
        F.sum(F.col("__y").cast(dec)).alias("__sy"),
        F.sum((F.col("__x") * F.col("__y")).cast(dec)).alias("__sxy"),
        F.sum((F.col("__x") * F.col("__x")).cast(dec)).alias("__sxx"),
        F.sum((F.col("__y") * F.col("__y")).cast(dec)).alias("__syy"),
    )
    n = F.col("n_terms").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    slope = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r_num = n * sxy - sx * sy
    r2 = F.try_divide(
        r_num * r_num, (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return m.crossJoin(F.broadcast(total)).select(
        "n_terms",
        "total_tokens",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def source_cross_entropy(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Pairwise unigram cross-entropy matrix between groups:
    ``CE(s→t) = −Σ_w p_s(w)·ln q_t(w)`` with add-α smoothed
    ``q_t(w) = (c_t(w)+α)/(N_t+α·V)`` over the union vocabulary — the
    domain-similarity table behind model-based data selection (score
    every candidate source by how well the target domain's LM
    predicts it; DSIR/DoGE-style mixtures start from exactly this
    matrix).  The diagonal is each source's smoothed self-entropy.

    Absent-term mass is folded ANALYTICALLY: splitting the sum at the
    vocabulary intersection gives ``CE = ln D_t − Σ_{w∈s∩t}
    p_s(w)·ln(c_t(w)+α) − (1−P_st)·ln α`` with ``P_st`` the source-s
    probability mass landing inside t's vocabulary — so the join is
    INNER on shared terms only; no |S|×V dense grid is ever built.

    Shape: one tokenize pass to (group, term) counts, an inner
    self-join on term (each term row fans out only to the groups that
    contain it), one decimal-summed (s, t) aggregation, and broadcast
    joins of the |S|-sized totals.  Engine-exact: per-term products
    are decimal-cast before summing; P_st is an integer count ratio.

    Output: ``(p_source, q_source, n_shared_terms, p_mass_covered,
    cross_entropy, perplexity)`` (6 dp), |S|² rows.
    """
    a = float(alpha)
    dec = "decimal(38,12)"
    counts = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ).localCheckpoint(eager=True)
    totals = counts.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("n_tok")
    )
    vocab = counts.select("term").distinct().count()
    cs = counts.select(
        F.col("grp").alias("p_source"),
        "term",
        F.col("cnt").alias("__cs"),
    )
    ct = counts.select(
        F.col("grp").alias("q_source"),
        "term",
        F.col("cnt").alias("__ct"),
    )
    pair = (
        cs.join(ct, "term")
        .groupBy("p_source", "q_source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum("__cs").cast("long").alias("__cov"),
            F.sum(
                (
                    F.col("__cs").cast("double")
                    * F.log(F.col("__ct").cast("double") + F.lit(a))
                ).cast(dec)
            ).alias("__slq"),
        )
    )
    np_ = totals.select(
        F.col("grp").alias("p_source"), F.col("n_tok").alias("__np")
    )
    nq = totals.select(
        F.col("grp").alias("q_source"), F.col("n_tok").alias("__nq")
    )
    j = pair.join(F.broadcast(np_), "p_source").join(
        F.broadcast(nq), "q_source"
    )
    p_mass = F.col("__cov").cast("double") / F.col("__np").cast("double")
    log_dt = F.log(
        F.col("__nq").cast("double") + F.lit(a) * F.lit(float(vocab))
    )
    ce = (
        log_dt
        - F.col("__slq").cast("double") / F.col("__np").cast("double")
        - (F.lit(1.0) - p_mass) * F.lit(math.log(a))
    )
    return j.select(
        "p_source",
        "q_source",
        "n_shared_terms",
        F.round(p_mass, 6).alias("p_mass_covered"),
        F.round(ce, 6).alias("cross_entropy"),
        F.round(F.exp(ce), 6).alias("perplexity"),
    )


def readability_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document readability metrics: Flesch-Kincaid grade level
    and the Automated Readability Index (Kincaid et al. 1975; Senter &
    Smith 1967) from three integer counts — words (lowercase alpha
    runs), sentence terminators (``[.!?]+`` groups, floored at 1), and
    a vowel-group syllable estimate (runs of ``[aeiouy]``, floored at
    1 per word).  The classic cheap quality-filter signal: grade
    levels far outside ~[2, 16] flag boilerplate, code soup, or
    degenerate text (reference analogue: the quality screens around
    text.py's gopher_filter).

    Scale shape: map-only — two regex extractions and one
    higher-order fold per row, no shuffle, whole-stage codegen
    throughout.  All inputs to the float formulas are integers, so the
    per-row doubles are engine-exact.

    Output: input columns plus ``n_words``, ``n_sentences``,
    ``n_syllables``, ``n_letters``, ``fk_grade``, ``ari`` (6 dp; docs
    with zero words are dropped).
    """
    col = F.col(text_col)
    # ASCII-letter runs WITHOUT lower(): unicode lowercasing (Kelvin
    # sign, dotted-I) is locale/engine-dependent, a case class is not
    words = F.regexp_extract_all(col, F.lit("[A-Za-z]+"), 0)
    out = df.withColumn("__words", words).withColumn(
        "n_words", F.size(F.col("__words")).cast("long")
    )
    out = out.where(F.col("n_words") > 0)
    syll = F.aggregate(
        F.col("__words"),
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1).cast("long"),
            F.size(
                F.regexp_extract_all(w, F.lit("[aeiouyAEIOUY]+"), 0)
            ).cast("long"),
        ),
    )
    letters = F.aggregate(
        F.col("__words"),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w).cast("long"),
    )
    sents = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.regexp_extract_all(col, F.lit("[.!?]+"), 0)).cast("long"),
    )
    out = (
        out.withColumn("n_sentences", sents)
        .withColumn("n_syllables", syll)
        .withColumn("n_letters", letters)
    )
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    sy = F.col("n_syllables").cast("double")
    le = F.col("n_letters").cast("double")
    fk = F.lit(0.39) * (w / s) + F.lit(11.8) * (sy / w) - F.lit(15.59)
    ari = F.lit(4.71) * (le / w) + F.lit(0.58) * (w / s) - F.lit(21.43)
    return (
        out.withColumn("fk_grade", F.round(fk, 6))
        .withColumn("ari", F.round(ari, 6))
        .drop("__words")
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    group_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Vocabulary-richness and coverage estimates per group: observed
    vocab, hapax/dis legomena, the Chao1 unseen-species floor (Chao
    1984, bias-corrected: V + f1(f1-1)/(2(f2+1))) and Good-Turing
    sample coverage (1 - f1/N, Good 1953) — answers "how much of this
    source's vocabulary has the crawl actually seen", the saturation
    signal for deciding whether another crawl round buys new data.
    Complements the Zipf slope (x147) and Heaps-style growth checks.

    Scale shape: one explode + (group, term) count, one group
    aggregation — both map-side combinable; every output is an
    integer or a two-integer ratio, engine-exact.

    Output per group: ``n_tokens, vocab, f1, f2, chao1, coverage``
    (6 dp).
    """
    toks = tokens(F.col(text_col))
    parts = [F.col(c) for c in group_cols]
    term = (
        df.select(*parts, F.explode(toks).alias("__term"))
        .groupBy(*parts, "__term")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    agg = term.groupBy(*parts).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("__c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.col("vocab").cast("double") + f1 * (f1 - 1.0) / (
        2.0 * (f2 + 1.0)
    )
    cov = F.lit(1.0) - f1 / F.col("n_tokens").cast("double")
    return agg.select(
        *group_cols,
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        F.round(chao1, 6).alias("chao1"),
        F.round(cov, 6).alias("coverage"),
    )


def burrows_delta(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    *,
    top_k: int = 30,
) -> DataFrame:
    """Burrows' Delta stylometric distance (Burrows 2002): each
    group's relative frequencies of the corpus's *top_k* most common
    terms are z-scored across groups, and every group pair is scored
    by the mean |z_a - z_b| — the standard authorship/register
    fingerprint, here a provenance audit: two "independent" sources
    with near-zero Delta are the same upstream generator in disguise.

    Scale shape: top-k terms via one TakeOrderedAndProject cut, the
    (group × term) grid COMPLETED by a broadcast cross join (absent
    terms charge z at freq 0, which is the signal), per-term moments
    across groups (decimal sums), and a |groups|²·k-bounded pair
    join — groups are sources/shards (10²-10³), never documents.

    Output per unordered pair: ``(source_a, source_b, n_terms,
    delta)`` (6 dp), ascending delta — most-suspicious first.
    """
    toks = tokens(F.col(text_col))
    g = F.col(group_col)
    term = (
        df.select(g.alias("__g"), F.explode(toks).alias("__term"))
        .groupBy("__g", "__term")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    ).localCheckpoint(eager=True)
    top = (
        term.groupBy("__term")
        .agg(F.sum("__c").cast("long").alias("__tot"))
        .orderBy(F.desc("__tot"), F.asc("__term"))
        .limit(int(top_k))
        .select("__term")
    )
    gtot = term.groupBy("__g").agg(
        F.sum("__c").cast("long").alias("__gn")
    )
    grid = gtot.crossJoin(F.broadcast(top))
    freq = grid.join(term, ["__g", "__term"], "left").select(
        "__g",
        "__term",
        (
            F.coalesce(F.col("__c"), F.lit(0).cast("long")).cast(
                "double"
            )
            / F.col("__gn").cast("double")
        ).alias("__f"),
    ).localCheckpoint(eager=True)
    dec = "decimal(38,18)"
    mom = freq.groupBy("__term").agg(
        F.count(F.lit(1)).cast("long").alias("__k"),
        F.sum(F.col("__f").cast(dec)).alias("__sf"),
        F.sum((F.col("__f") * F.col("__f")).cast(dec)).alias("__sff"),
    )
    kk = F.col("__k").cast("double")
    mean = F.col("__sf").cast("double") / kk
    var = F.col("__sff").cast("double") / kk - mean * mean
    mom = mom.select(
        "__term",
        mean.alias("__mu"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("__sd"),
    ).where(F.col("__sd") > 0)
    z = freq.join(F.broadcast(mom), "__term").select(
        "__g",
        "__term",
        ((F.col("__f") - F.col("__mu")) / F.col("__sd")).alias("__z"),
    )
    a, b = z.alias("a"), z.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__term") == F.col("b.__term"))
        & (F.col("a.__g") < F.col("b.__g")),
    ).select(
        F.col("a.__g").alias("source_a"),
        F.col("b.__g").alias("source_b"),
        F.abs(F.col("a.__z") - F.col("b.__z"))
        .cast(dec)
        .alias("__dz"),
    )
    out = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("__dz").alias("__sdz"),
    )
    delta = F.col("__sdz").cast("double") / F.col("n_terms").cast(
        "double"
    )
    return out.select(
        "source_a",
        "source_b",
        "n_terms",
        F.round(delta, 6).alias("delta"),
    ).orderBy(F.asc("delta"), F.asc("source_a"), F.asc("source_b"))


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    window: int = 2,
    min_len: int = 4,
    n_iter: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph — content terms (length ≥
    *min_len*) linked when they fall within *window* positions of
    each other in a document, symmetric, weighted by co-occurrence
    count — surfaces corpus-level keyphrases without any training.

    Scale shape: co-occurrence pairs come from *window* positional
    EQUI-joins on ``(doc, position + offset)`` — linear in tokens,
    never a per-doc quadratic self-join; the graph collapses to one
    (src, dst) count aggregation and the fixed-round PageRank reuses
    :func:`fame2pygen_spark.operators.graph.pagerank` (decimal
    contribution sums, checkpointed supersteps, x91's engine-exact
    contract).  The final cut is a *top_n* heap; the position column
    is a window over ≤ top_n rows.

    Output: ``(term, score, pos)`` — 6 dp, rank by (score desc,
    term asc).
    """
    from .graph import pagerank

    base = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.posexplode(tokens(F.col(text_col))).alias("__p", "__t"),
        )
        .where(F.length(F.col("__t")) >= int(min_len))
    )
    rp = F.row_number().over(
        Window.partitionBy("__doc").orderBy("__p")
    )
    seq = base.select("__doc", rp.alias("__rp"), "__t").localCheckpoint(
        eager=True
    )
    pair_parts = []
    for off in range(1, int(window) + 1):
        a = seq.alias("a")
        b = seq.alias("b")
        pair_parts.append(
            a.join(
                b,
                (F.col("a.__doc") == F.col("b.__doc"))
                & (F.col("b.__rp") == F.col("a.__rp") + off)
                & (F.col("a.__t") != F.col("b.__t")),
            ).select(
                F.col("a.__t").alias("src"), F.col("b.__t").alias("dst")
            )
        )
    pairs = pair_parts[0]
    for p in pair_parts[1:]:
        pairs = pairs.unionByName(p)
    edges = (
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    ).localCheckpoint(eager=True)
    ranks = pagerank(edges, n_iter=int(n_iter))
    top = ranks.orderBy(F.desc("rank"), F.asc("node")).limit(int(top_n))
    pos = F.row_number().over(Window.orderBy(F.desc("rank"), F.asc("node")))
    return top.select(
        F.col("node").alias("term"),
        F.round(F.col("rank"), 6).alias("score"),
        pos.cast("long").alias("pos"),
    )


def memorization_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: Sequence[str] = ("source",),
    *,
    n: int = 8,
    train_frac: float = 0.9,
    salt: str = "memsplit",
) -> DataFrame:
    """Train/held-out n-gram memorization audit (the overlap metric
    of Lee 2022 "Deduplicating Training Data Makes Language Models
    Better"): hash-split the corpus, build the train side's distinct
    n-gram set, and measure how much of each held-out document is
    already covered — high coverage means eval numbers will be
    memorization, not generalization.  The split-aware sibling of the
    x19 decontamination probe.

    Scale shape: per-doc DISTINCT grams (one explode + distinct),
    membership by the same md5 hash band as ``mixing.split_corpus``
    (no shuffle for the split), one gram equi-join against the train
    set, one doc rollup, one group rollup — per-doc novelty ratios
    decimal-cast before the group mean.  Docs shorter than *n* tokens
    carry no grams and drop out.

    Output per group: ``n_test_docs, mean_novelty, memorized_share``
    (6 dp; memorized = every gram of the doc appears in train).
    """
    from .mixing import uniform_hash01

    parts = [F.col(c) for c in group_cols]
    base = (
        df.select(
            *parts,
            F.col(id_col).alias("__id"),
            F.explode(token_ngrams(tokens(F.col(text_col)), int(n))).alias(
                "__g"
            ),
        )
        .distinct()
        .withColumn(
            "__train",
            uniform_hash01(F.col("__id"), salt) < F.lit(float(train_frac)),
        )
    )
    train = base.where(F.col("__train")).select(F.col("__g")).distinct()
    test = base.where(~F.col("__train"))
    per_doc = (
        test.join(
            train.withColumn("__hit", F.lit(1)), on="__g", how="left"
        )
        .groupBy(*parts, "__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__ng"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("__seen"),
        )
    )
    dec = "decimal(38,18)"
    novelty = F.lit(1.0) - F.col("__seen").cast("double") / F.col(
        "__ng"
    ).cast("double")
    out = per_doc.groupBy(*parts).agg(
        F.count(F.lit(1)).cast("long").alias("n_test_docs"),
        F.sum(novelty.cast(dec)).alias("__sn"),
        F.sum(F.when(F.col("__seen") == F.col("__ng"), 1).otherwise(0))
        .cast("long")
        .alias("__mem"),
    )
    nd = F.col("n_test_docs").cast("double")
    return out.select(
        *group_cols,
        "n_test_docs",
        F.round(F.col("__sn").cast("double") / nd, 6).alias("mean_novelty"),
        F.round(F.col("__mem").cast("double") / nd, 6).alias(
            "memorized_share"
        ),
    )


# ------------------------------------------ ROUGE-N pair overlap


def rouge_ngram_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pairs: DataFrame,
    *,
    n: int = 2,
    ref_col: str = "ref_id",
    cand_col: str = "cand_id",
) -> DataFrame:
    """ROUGE-N overlap (Lin 2004) for explicit document pairs:
    clipped n-gram matching, the workhorse metric for summarization
    eval, paraphrase mining, and template-churn detection in corpus QC.

    ``match = Σ_g min(count_ref(g), count_cand(g))``;
    ``recall = match / n_ref``, ``precision = match / n_cand``,
    ``f1 = 2PR/(P+R)``.  Clipping (the ``min``) is what distinguishes
    ROUGE from raw n-gram recall: a candidate repeating one reference
    gram 50× scores the gram once, so keyword-stuffed near-copies
    don't saturate the metric.

    Output: ``(ref_id, cand_id, n_match, n_ref, n_cand, precision,
    recall, f1)`` — one row per input pair (6 dp; pairs whose docs
    have no n-grams yield null ratios via try_divide).

    Scale shape: *df* is first semi-joined to the docs *pairs*
    actually references, so gram work is bounded by the pair list,
    not the corpus (scoring 100 pairs against a 10⁸-doc corpus
    tokenizes ~200 docs); n-gram counts are then ONE doc-keyed
    aggregation over a lead-window gram stream (row-linear, no token
    self-join), computed once per doc regardless of how many pairs
    reference it; the match join is keyed by (doc, gram) equi-keys.
    Counts are exact BIGINTs; the three ratios are single double
    divisions composed identically in the oracle.
    """
    ref_ids = pairs.select(F.col(ref_col).alias(id_col)).unionByName(
        pairs.select(F.col(cand_col).alias(id_col))
    ).distinct()
    df = df.join(ref_ids, on=id_col, how="leftsemi")
    toks = _parallelize_input(df).select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w0"),
    )
    seq = Window.partitionBy("doc").orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("w0"),
        *[F.lead("w0", i + 1).over(seq) for i in range(n - 1)]
    )
    full = (
        F.lead("w0", n - 1).over(seq).isNotNull() if n > 1 else F.lit(True)
    )
    counts = (
        toks.select("doc", gram.alias("g"), full.alias("__f"))
        .where(F.col("__f"))
        .groupBy("doc", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("doc").agg(F.sum("c").alias("tot"))
    p = pairs.select(
        F.col(ref_col).alias("ref_id"), F.col(cand_col).alias("cand_id")
    )
    rc = counts.select(
        F.col("doc").alias("ref_id"), "g", F.col("c").alias("cr")
    )
    cc = counts.select(
        F.col("doc").alias("cand_id"), "g", F.col("c").alias("cc")
    )
    matches = (
        p.join(rc, on="ref_id")
        .join(cc, on=["cand_id", "g"])
        .groupBy("ref_id", "cand_id")
        .agg(F.sum(F.least("cr", "cc")).alias("n_match"))
    )
    out = (
        p.join(matches, on=["ref_id", "cand_id"], how="left")
        .join(
            totals.select(F.col("doc").alias("ref_id"), F.col("tot").alias("n_ref")),
            on="ref_id", how="left",
        )
        .join(
            totals.select(F.col("doc").alias("cand_id"), F.col("tot").alias("n_cand")),
            on="cand_id", how="left",
        )
        .select(
            "ref_id", "cand_id",
            F.coalesce(F.col("n_match"), F.lit(0)).cast("long").alias("n_match"),
            F.coalesce(F.col("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce(F.col("n_cand"), F.lit(0)).cast("long").alias("n_cand"),
        )
    )
    prec = F.try_divide(
        F.col("n_match").cast("double"), F.col("n_cand").cast("double")
    )
    rec = F.try_divide(
        F.col("n_match").cast("double"), F.col("n_ref").cast("double")
    )
    f1 = F.try_divide(F.lit(2.0) * prec * rec, prec + rec)
    return out.select(
        "ref_id", "cand_id", "n_match", "n_ref", "n_cand",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


# ---------------------------------- CCNet-style perplexity buckets


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lang_col: str,
    *,
    n_buckets: int = 3,
    k: float = 0.5,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020): rank every document WITHIN its language by LM surprisal
    (here the corpus's own add-k bigram model,
    :func:`bigram_surprisal`) and split each language into equal
    head / middle / tail buckets.  Head = most fluent; CCNet keeps
    head+middle and drops tail — per-language ranking is the point,
    as a fixed global threshold would throw away whole low-resource
    languages.

    Output: one row per (lang, bucket): ``(lang, bucket, bucket_name,
    n_docs, share, mean_surprisal)`` — bucket 1..n_buckets by rising
    surprisal; ``share`` is within-language.  Docs with no bigrams
    (< 2 tokens) are excluded.

    Engine-exactness: the ntile ranking key is the ROUNDED 6-dp
    surprisal with the doc id as tie-break — a total deterministic
    order both engines reproduce; ntile's extra-row rule (first
    ``n mod b`` buckets get the extra) is identical in Spark and
    DuckDB.  Scale shape: surprisal is the x98 pipeline (doc-keyed);
    the ntile window is keyed by language — parallel across languages,
    and within one language the sort is of doc-level rows (already
    ~6 orders of magnitude smaller than the token stream).
    """
    scored = bigram_surprisal(df, text_col, id_col, k=k).join(
        df.select(
            F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
        ),
        on="doc_id",
    )
    w = Window.partitionBy("lang").orderBy("mean_surprisal", "doc_id")
    binned = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    names = F.when(F.col("bucket") == 1, F.lit("head")).otherwise(
        F.when(F.col("bucket") == n_buckets, F.lit("tail")).otherwise(
            F.lit("middle")
        )
    )
    per = binned.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("mean_surprisal").cast("decimal(38,12)")).alias("__s"),
    )
    lang_tot = per.groupBy("lang").agg(F.sum("n_docs").alias("__lt"))
    return (
        per.join(lang_tot, on="lang")
        .select(
            "lang",
            F.col("bucket").cast("long").alias("bucket"),
            names.alias("bucket_name"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(
                F.col("n_docs").cast("double") / F.col("__lt").cast("double"),
                6,
            ).alias("share"),
            F.round(
                F.col("__s").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("mean_surprisal"),
        )
    )


# ------------------------------------ category lexicon flag rates


def lexicon_category_rates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_cols: Sequence[str],
    lexicon: dict[str, Sequence[str]],
) -> DataFrame:
    """Content-flag audit against a category lexicon: per (*group*,
    category) the share of documents with at least one term hit and
    the hit volume — the blocklist / safety-wordlist screening pass a
    corpus pipeline runs per source before deciding what needs model-
    based review.  (Wordlist screening is a triage signal, not a
    verdict — hence rates per group, not per-doc verdicts.)

    *lexicon* maps category → term list; matching is on normalized
    whitespace tokens (exact term match — substring matching inflates
    on morphology and is not engine-portable for multi-byte text).

    Scale shape: ONE tokenization pass (explode), an equi-join against
    the broadcast (term → category) table — the lexicon is KBs — and a
    (group, category) hash agg; the (group × category) spine is
    completed with a broadcast cross join so zero-hit categories
    report 0, not absence.

    Output: ``(*group_cols, category, n_docs, docs_flagged, flag_rate,
    total_hits, hits_per_doc)`` (6 dp).
    """
    g = list(group_cols)
    spark = df.sparkSession
    terms = spark.createDataFrame(
        [(t, c) for c, ts in sorted(lexicon.items()) for t in sorted(set(ts))],
        "term string, category string",
    )
    toks = _parallelize_input(df).select(
        *g,
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    hits = (
        toks.join(F.broadcast(terms), on="term")
        .groupBy(*g, "category", "doc")
        .agg(F.count(F.lit(1)).alias("__h"))
    )
    per = hits.groupBy(*g, "category").agg(
        F.count(F.lit(1)).alias("docs_flagged"),
        F.sum("__h").alias("total_hits"),
    )
    groups = df.groupBy(*g).agg(F.count(F.lit(1)).alias("n_docs"))
    cats = spark.createDataFrame(
        [(c,) for c in sorted(lexicon)], "category string"
    )
    spine = groups.crossJoin(F.broadcast(cats))
    out = spine.join(per, on=g + ["category"], how="left")
    return out.select(
        *g,
        "category",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.coalesce(F.col("docs_flagged"), F.lit(0)).cast("long").alias(
            "docs_flagged"
        ),
        F.round(
            F.coalesce(F.col("docs_flagged"), F.lit(0)).cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("flag_rate"),
        F.coalesce(F.col("total_hits"), F.lit(0)).cast("long").alias(
            "total_hits"
        ),
        F.round(
            F.coalesce(F.col("total_hits"), F.lit(0)).cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("hits_per_doc"),
    )


# -------------------------------------- Heaps'-law vocab growth


def heaps_law(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978): bucket the
    corpus into *n_buckets* equal-width ingestion slices (by the doc
    id range — ingestion order is the id order), track cumulative
    token count N and cumulative vocabulary V per slice, and fit
    ``V = k·N^β`` by OLS on (ln N, ln V).  β ≈ 0.4–0.6 is natural
    text; β → 1 means vocabulary growing as fast as the corpus
    (unbounded noise: OCR garbage, ids, hashes) and β → 0 a closed
    vocabulary (template churn) — the scaling-law twin of the static
    Zipf fit (x147), and the projection tool for "how big does the
    tokenizer vocab need to be at 10× corpus".

    Engine-exactness: a term's first occurrence is ``min(doc id)``
    (exact), cumulative sums are integer, the OLS moments are
    decimal-cast log sums.

    Scale shape: bucketing is arithmetic on the id against a 1-row
    broadcast min/max (NO global ordering window); first occurrences
    are one term-keyed agg; everything after runs on *n_buckets* rows
    (the tiny cumulative/fit windows included).

    Output: one row per bucket: ``(bucket, n_docs, cum_tokens,
    cum_vocab, beta, k, r2)`` — fit columns repeated per row (6 dp).
    """
    toks = _parallelize_input(df).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    mm = df.agg(
        F.min(F.col(id_col)).alias("__lo"), F.max(F.col(id_col)).alias("__hi")
    )
    bucket_of = lambda c: F.least(  # noqa: E731
        F.lit(n_buckets - 1),
        F.floor(
            (c - F.col("__lo")).cast("double")
            * F.lit(float(n_buckets))
            / (F.col("__hi") - F.col("__lo") + F.lit(1)).cast("double")
        ).cast("int"),
    )
    tok_b = toks.crossJoin(F.broadcast(mm)).withColumn(
        "bucket", bucket_of(F.col("doc"))
    )
    per_tok = tok_b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("__ntok")
    )
    first = tok_b.groupBy("term").agg(F.min("bucket").alias("bucket"))
    per_new = first.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("__nnew")
    )
    docs_b = df.crossJoin(F.broadcast(mm)).select(
        bucket_of(F.col(id_col)).alias("bucket")
    ).groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    base = (
        docs_b.join(per_tok, on="bucket", how="left")
        .join(per_new, on="bucket", how="left")
        .select(
            "bucket",
            "n_docs",
            F.coalesce("__ntok", F.lit(0)).alias("__ntok"),
            F.coalesce("__nnew", F.lit(0)).alias("__nnew"),
        )
    )
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = base.select(
        "bucket",
        "n_docs",
        F.sum("__ntok").over(wc).cast("long").alias("cum_tokens"),
        F.sum("__nnew").over(wc).cast("long").alias("cum_vocab"),
    ).where((F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0))
    lx = F.log(F.col("cum_tokens").cast("double"))
    ly = F.log(F.col("cum_vocab").cast("double"))
    pts = cum.select(
        "bucket", "n_docs", "cum_tokens", "cum_vocab",
        lx.cast("decimal(38,18)").alias("__x"),
        ly.cast("decimal(38,18)").alias("__y"),
        (lx * ly).cast("decimal(38,18)").alias("__xy"),
        (lx * lx).cast("decimal(38,18)").alias("__xx"),
        (ly * ly).cast("decimal(38,18)").alias("__yy"),
    )
    wf = Window.partitionBy(F.lit(1))
    n = F.count(F.lit(1)).over(wf).cast("double")
    sx = F.sum("__x").over(wf).cast("double")
    sy = F.sum("__y").over(wf).cast("double")
    sxy = F.sum("__xy").over(wf).cast("double")
    sxx = F.sum("__xx").over(wf).cast("double")
    syy = F.sum("__yy").over(wf).cast("double")
    beta = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    intercept = (sy - beta * sx) / n
    r_num = n * sxy - sx * sy
    r2 = F.try_divide(
        r_num * r_num, (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return pts.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_docs").cast("long").alias("n_docs"),
        "cum_tokens",
        "cum_vocab",
        F.round(beta, 6).alias("beta"),
        F.round(F.exp(intercept), 6).alias("k"),
        F.round(r2, 6).alias("r2"),
    )


# --------------------------- vocabulary coverage (Good-Turing/Chao1)


def vocabulary_coverage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Vocabulary coverage estimate per group: the Good-Turing unseen
    probability mass ``P₀ = n₁/N`` (Good 1953 — the chance the NEXT
    token is a type never seen in this group) and the bias-corrected
    Chao1 richness estimate ``V + n₁(n₁−1)/(2(n₂+1))`` (Chao 1984 —
    how many types exist INCLUDING unseen ones), from singleton/
    doubleton counts.  The coverage answer Heaps' β (x194) only
    trends toward: is this source's vocabulary nearly exhausted
    (P₀ → 0) or barely sampled?

    Engine-exactness: N, V, n₁, n₂ are exact integers; the two
    estimates are single double compositions.

    Scale shape: one tokenization explode, one (group, term) agg, one
    group agg — the same two-shuffle shape as TF-IDF.

    Output: ``(*group_cols, n_tokens, n_types, n_singletons,
    n_doubletons, p_unseen, chao1_types)`` (6 dp).
    """
    g = list(group_cols)
    toks = _parallelize_input(df).select(
        *g, F.explode(tokens(F.col(text_col))).alias("term")
    )
    per_term = toks.groupBy(*g, "term").agg(
        F.count(F.lit(1)).alias("__c")
    )
    agg = per_term.groupBy(*g).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("__c") == 1).cast("long")).cast("long").alias(
            "n_singletons"
        ),
        F.sum((F.col("__c") == 2).cast("long")).cast("long").alias(
            "n_doubletons"
        ),
    )
    p0 = F.col("n_singletons").cast("double") / F.col("n_tokens").cast(
        "double"
    )
    chao1 = F.col("n_types").cast("double") + (
        F.col("n_singletons").cast("double")
        * (F.col("n_singletons").cast("double") - F.lit(1.0))
        / (F.lit(2.0) * (F.col("n_doubletons").cast("double") + F.lit(1.0)))
    )
    return agg.select(
        *g,
        "n_tokens",
        "n_types",
        "n_singletons",
        "n_doubletons",
        F.round(p0, 6).alias("p_unseen"),
        F.round(chao1, 6).alias("chao1_types"),
    )


def word_repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals (the Gopher repetition
    family, Rae et al. 2021 §A1.1): duplicate-word fraction, top-word
    share, and top-bigram share per document — the quality tripwire
    for template spam, keyword stuffing, and decoding loops, which
    length/stopword profiles (x06) and cross-doc dedup both miss
    (a document can be globally unique and still be one phrase
    repeated 400 times).

    Tokenization matches the corpus convention (``bigram_surprisal``):
    lowercase, whitespace-collapse, split on single space, drop
    empties.  All three ratios are integer-count quotients rounded at
    6 dp — engine-exact by construction.

    Scale shape: two explode → keyed-hash-agg chains (words, bigrams)
    joined back per document; everything is keyed by *id_col* — no
    global state, no windows over the corpus.

    Output: ``(id_col, n_tokens, dup_word_frac, top_word_share,
    top_bigram_share)`` — top_bigram_share null for single-token
    docs.
    """
    tk = F.expr(
        f"filter(split(trim(regexp_replace(lower({text_col}), "
        f"'\\\\s+', ' ')), ' '), t -> t <> '')"
    )
    toks = df.select(F.col(id_col).alias("__id"), tk.alias("__tk")).where(
        F.size("__tk") > 0
    )
    words = (
        toks.select("__id", F.explode("__tk").alias("__w"))
        .groupBy("__id", "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__id")
        .agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("__nd"),
            F.max("__c").cast("long").alias("__topw"),
        )
    )
    bigrams = (
        toks.where(F.size("__tk") >= 2)
        .select(
            "__id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__tk) - 1), "
                    "i -> struct(__tk[i-1] as w1, __tk[i] as w2))"
                )
            ).alias("__b"),
        )
        .groupBy("__id", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__id")
        .agg(
            F.sum("__c").cast("long").alias("__nb"),
            F.max("__c").cast("long").alias("__topb"),
        )
    )
    out = words.join(bigrams, "__id", "left")
    nt = F.col("n_tokens").cast("double")
    return out.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.round(F.lit(1.0) - F.col("__nd").cast("double") / nt, 6).alias(
            "dup_word_frac"
        ),
        F.round(F.col("__topw").cast("double") / nt, 6).alias(
            "top_word_share"
        ),
        F.round(
            F.try_divide(
                F.col("__topb").cast("double"),
                F.col("__nb").cast("double"),
            ),
            6,
        ).alias("top_bigram_share"),
    )


def byte_anomaly_profile(
    df: DataFrame,
    text_col: str = "text",
    group_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Encoding-health audit per group: multibyte-character ratio,
    control-character count, and U+FFFD replacement-character
    incidence — the mojibake tripwire run per source/snapshot BEFORE
    text operators consume the corpus (a double-encoded or
    latin-1-mislabeled feed shows up here as a multibyte-ratio jump
    long before any downstream metric moves).

    Everything is row-local column algebra on two portable
    primitives: characters (``length``) vs bytes (``octet_length`` /
    DuckDB ``strlen``) — their difference counts multibyte chars
    exactly, with no regex over the raw bytes — plus one control-char
    strip (C0 minus tab/newline/CR) and one replacement-char scan.

    Scale shape: ONE map-side-combinable hash aggregation; the
    per-row expressions all run inside the scan stage.

    Output: ``(*group_cols, n_docs, total_chars, multibyte_chars,
    multibyte_ratio, control_chars, n_docs_nonascii,
    n_docs_replacement)``.
    """
    g = list(group_cols)
    t = F.col(text_col)
    chars = F.length(t)
    mbytes = F.octet_length(t) - chars
    ctrl = chars - F.length(
        F.regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")
    )
    base = df.where(t.isNotNull()).groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(chars).cast("long").alias("total_chars"),
        F.sum(mbytes).cast("long").alias("multibyte_chars"),
        F.sum(ctrl).cast("long").alias("control_chars"),
        F.sum(F.when(mbytes > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_nonascii"),
        F.sum(F.when(F.contains(t, F.lit("�")), 1).otherwise(0))
        .cast("long")
        .alias("n_docs_replacement"),
    )
    return base.select(
        *g,
        "n_docs",
        "total_chars",
        "multibyte_chars",
        F.round(
            F.try_divide(
                F.col("multibyte_chars").cast("double"),
                F.col("total_chars").cast("double"),
            ),
            6,
        ).alias("multibyte_ratio"),
        "control_chars",
        "n_docs_nonascii",
        "n_docs_replacement",
    )


def watermark_screen(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    salt: str = "wm",
    z_flag: float = 4.0,
) -> DataFrame:
    """Green-list watermark detector (Kirchenbauer et al. 2023, "A
    Watermark for Large Language Models" — detection side only): a
    soft-watermarked generator over-samples tokens from a
    pseudo-random "green" half of the vocabulary, so watermarked text
    shows a green-token excess the one-proportion z-test sees:
    ``z = (g − n/2)/√(n/4)`` under H₀ green-rate ½.  The
    synthetic-text screen a 100 TB crawl needs BEFORE model-generated
    content recycles into training data; complements the perplexity
    bucketing (x183), which needs an LM — this needs only a hash.

    The green list here is the salted-md5 parity of the token itself
    (the simplest fixed-list variant — detecting a SPECIFIC vendor's
    watermark means substituting their keyed hash; the plumbing,
    counters, and test are identical).  Tokenization matches the
    corpus convention (lowercase, whitespace split).

    Engine-exactness: g and n are integers; z is one double
    expression.  Scale shape: one explode → (doc, parity) count →
    per-doc reduce; doc-keyed throughout.

    Output: ``(id_col, n_tokens, n_green, green_rate, z, flagged)``
    — flagged when z ≥ *z_flag* (4.0 ≈ the paper's operating point,
    false-positive rate ~3e-5).
    """
    tk = F.expr(
        f"filter(split(trim(regexp_replace(lower({text_col}), "
        f"'\\\\s+', ' ')), ' '), t -> t <> '')"
    )
    toks = df.select(F.col(id_col).alias("__id"), tk.alias("__tk")).where(
        F.size("__tk") > 0
    )
    parity = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col("__w"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    per = (
        toks.select("__id", F.explode("__tk").alias("__w"))
        .select("__id", parity.alias("__green"))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__green").cast("long").alias("n_green"),
        )
    )
    n = F.col("n_tokens").cast("double")
    g = F.col("n_green").cast("double")
    z = (g - n / 2.0) / F.sqrt(n / 4.0)
    return per.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "n_green",
        F.round(g / n, 6).alias("green_rate"),
        F.round(z, 6).alias("z"),
        (F.round(z, 6) >= F.lit(float(z_flag))).alias("flagged"),
    )


def self_bleu_sample(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 32,
    salt: str = "sb",
) -> DataFrame:
    """Corpus diversity via sampled self-BLEU-2 (Zhu et al. 2018,
    "Texygen" — the diversity metric, inverted: HIGH self-BLEU means
    a homogeneous, template-heavy corpus): each document is scored
    against ONE deterministic partner (the next doc_id inside its
    md5 hash bucket) by modified bigram precision ``Σ_g min(c_a(g),
    c_b(g)) / Σ_g c_a(g)``.  The full metric is all-pairs (O(n²),
    dead at corpus scale); hash-bucketed adjacent pairing keeps n−B
    pairs, unbiased for the corpus-level mean because buckets are
    content-independent.  Complements x234: repetition is
    WITHIN-doc degeneracy, self-BLEU is ACROSS-doc homogeneity that
    exact dedup (distinct fingerprints) cannot see.

    Everything is integer bigram counting; per-pair precision is an
    integer ratio, and the corpus mean is a decimal-cast sum — engine
    -exact throughout.

    Scale shape: one bigram-count pass (doc-keyed), one bucket-keyed
    lag window for the pairing, one gram-keyed join WITHIN pairs
    (each doc joins exactly one partner), one reduce.

    Output: one row ``(n_docs, n_pairs, mean_p2, share_high)`` —
    share_high = fraction of pairs with precision > 0.5, the
    near-template alarm (6 dp).
    """
    tk = F.expr(
        f"filter(split(trim(regexp_replace(lower({text_col}), "
        f"'\\\\s+', ' ')), ' '), t -> t <> '')"
    )
    toks = df.select(F.col(id_col).alias("__id"), tk.alias("__tk")).where(
        F.size("__tk") >= 2
    )
    grams = (
        toks.select(
            "__id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__tk) - 1), "
                    "i -> concat(__tk[i-1], ' ', __tk[i]))"
                )
            ).alias("__g"),
        )
        .groupBy("__id", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("__id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % int(n_buckets)
    )
    w = Window.partitionBy("__b").orderBy("__id")
    pairs = (
        toks.select("__id", bucket.alias("__b"))
        .withColumn("__partner", F.lead("__id").over(w))
        .where(F.col("__partner").isNotNull())
        .select(F.col("__id").alias("__a"), F.col("__partner").alias("__p"))
    )
    ga = grams.select(
        F.col("__id").alias("__a"), "__g", F.col("__c").alias("__ca")
    )
    gb = grams.select(
        F.col("__id").alias("__p"), "__g", F.col("__c").alias("__cb")
    )
    per_pair = (
        pairs.join(ga, "__a")
        .join(gb, ["__p", "__g"], "left")
        .groupBy("__a", "__p")
        .agg(
            F.sum("__ca").alias("__tot"),
            F.sum(
                F.least(F.col("__ca"), F.coalesce(F.col("__cb"), F.lit(0)))
            ).alias("__match"),
        )
        .select(
            F.round(
                F.col("__match").cast("double") / F.col("__tot").cast("double"),
                6,
            ).alias("__p2")
        )
    )
    n_docs = toks.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    out = per_pair.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.col("__p2").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_p2"),
        F.round(
            F.sum(F.when(F.col("__p2") > 0.5, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("share_high"),
    )
    return n_docs.crossJoin(F.broadcast(out))


def kn_continuation(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    top_n: int = 25,
) -> DataFrame:
    """Kneser–Ney continuation statistics (Kneser & Ney 1995, ICASSP;
    the discounting backbone of modified-KN, Chen & Goodman 1998):
    for each word, ``p_continuation(w) = N1+(·w) / N1+(··)`` — the
    share of distinct BIGRAM TYPES that end in *w* — versus its raw
    unigram probability.  The divergence is the collocation-bound
    signal ("francisco" is frequent but continues almost nothing
    except "san francisco"); corpus-side it flags template/boilerplate
    vocabulary that raw frequency ranks as important, the same failure
    mode TF-IDF (x13) attacks document-locally.

    Plan shape: ONE tokenization pass (posexplode), bigrams from a
    ``lead`` over the (doc, position) window — the x98 row-linear
    idiom — then two keyed aggs (per-word token count; per-word
    distinct-left-context count on the deduped bigram-type table) and
    a 1-row type-total broadcast.  Top-n is a single TakeOrdered heap
    (count desc, word asc), never a global sort.

    Output: ``word, n_tokens, n_contexts, p_unigram,
    p_continuation`` for the *top_n* most frequent words (6 dp).
    """
    df = _parallelize_input(df)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w1"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big_types = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .where(F.col("w2").isNotNull())
        .select("w1", "w2")
        .distinct()
    )
    n_types = big_types.agg(
        F.count(F.lit(1)).cast("double").alias("__nt")
    )
    n_tokens_total = toks.agg(
        F.count(F.lit(1)).cast("double").alias("__tt")
    )
    ctx = big_types.groupBy(F.col("w2").alias("word")).agg(
        F.count(F.lit(1)).alias("n_contexts")
    )
    freq = toks.groupBy(F.col("w1").alias("word")).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    return (
        freq.join(ctx, on="word", how="left")
        .na.fill({"n_contexts": 0})
        .crossJoin(F.broadcast(n_types))
        .crossJoin(F.broadcast(n_tokens_total))
        .orderBy(F.desc("n_tokens"), F.asc("word"))
        .limit(int(top_n))
        .select(
            "word",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_contexts").cast("long").alias("n_contexts"),
            F.round(
                F.try_divide(F.col("n_tokens"), F.col("__tt")), 6
            ).alias("p_unigram"),
            F.round(
                F.try_divide(F.col("n_contexts"), F.col("__nt")), 6
            ).alias("p_continuation"),
        )
    )


def hashed_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    dim: int = 64,
    salt: str = "fh",
) -> DataFrame:
    """Signed feature hashing (Weinberger, Dasgupta, Langford, Smola
    & Attenberg 2009, ICML — the "hashing trick"): every token maps to
    bucket ``h(t) mod dim`` with sign ``ξ(t) ∈ {±1}`` from an
    independent hash, and a document's feature vector is the signed
    term-frequency sum per bucket.  The sign makes bucket collisions
    cancel in expectation (E[φ_i·φ_j] is unbiased for the true inner
    product), which is what lets a FIXED 64-wide vector stand in for
    an unbounded vocabulary — no dictionary to build, broadcast, or
    version, the property that matters when the 100 TB corpus's vocab
    won't fit anywhere.

    Plan shape: one tokenization pass (explode), bucket/sign as scan-
    stage column algebra on the md5 family, ONE (doc, dim) hash agg of
    exact integer signed counts — output is the sparse triplet form
    ``doc_id, dim, value`` that joins straight into the similarity
    stack (``dot`` on triplets = equi-join on dim + sum).

    Output: ``doc_id, dim ∈ [0, dim), value`` — only nonzero cells
    (values are exact BIGINTs; downstream normalization is the
    caller's choice).
    """
    from .sketch import _hash64

    df = _parallelize_input(df)
    d = int(dim)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    bucket = (_hash64(F.col("t"), salt) % d).cast("long")
    sign = (
        F.lit(1) - F.lit(2) * (_hash64(F.col("t"), f"{salt}s") % 2)
    ).cast("long")
    return (
        toks.select("doc_id", bucket.alias("dim"), sign.alias("__s"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("__s").cast("long").alias("value"))
        .where(F.col("value") != 0)
    )


def good_turing_profile(
    df: DataFrame,
    text_col: str,
    *,
    max_r: int = 5,
) -> DataFrame:
    """Good–Turing frequency-of-frequencies profile (Good 1953,
    Biometrika; estimator notation per Gale & Sampson 1995): the
    count-of-counts table ``N_r`` with the Turing adjusted counts
    ``r* = (r+1)·N_{r+1}/N_r`` for the low ranks.  The ``r = 1`` row's
    token share ``1·N_1/N`` IS the Good–Turing unseen-species mass —
    the probability the NEXT token drawn from this corpus is a word
    never seen in it, i.e. how open the vocabulary still is (the
    saturation question Heaps' law (x194) answers by curve shape,
    answered here by a single distribution-free estimate).

    Scale shape: one tokenization pass → word-count agg → count-of-
    counts agg (|distinct counts| rows, tiny) → a broadcast self-join
    on ``r+1`` for r*.  Totals ride along from a 1-row summary; the
    heavy shuffles are the same two keyed aggs every vocabulary
    operator pays.

    Output: the *max_r* SMALLEST observed frequency classes (a corpus
    with no hapaxes still reports its rarest classes) — ``r, n_r,
    token_share (= r·N_r/N), r_star`` — null r* where ``N_{r+1}`` is
    empty; when the minimum observed r is 1, the first row's
    token_share is the unseen mass.
    """
    df = _parallelize_input(df)
    wc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    nr = wc.groupBy(F.col("__c").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    tot = nr.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("double").alias("__n")
    )
    nxt = nr.select(
        (F.col("r") - 1).alias("__rp"), F.col("n_r").alias("__n_next")
    )
    return (
        nr.orderBy("r")
        .limit(int(max_r))
        .join(F.broadcast(nxt), F.col("r") == F.col("__rp"), "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            F.round(
                F.col("r").cast("double") * F.col("n_r") / F.col("__n"), 6
            ).alias("token_share"),
            F.round(
                (F.col("r") + 1).cast("double")
                * F.col("__n_next")
                / F.col("n_r"),
                6,
            ).alias("r_star"),
        )
    )


def naive_bayes_confusion(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
) -> DataFrame:
    """Multinomial Naive Bayes trained and evaluated in-corpus
    (McCallum & Nigam 1998's event model; add-1 smoothing per
    Laplace): class-conditional word log-probabilities
    ``log((c(w,ℓ)+1)/(T_ℓ+V))`` and log priors from ONE tokenization
    pass, then every document scored for every class and argmaxed —
    reported as the label × prediction confusion matrix.  The trained
    complement of the heuristic lang-id confusion (x113): when NB
    can't separate the stored labels IN SAMPLE, the labels themselves
    are noise (label-quality audit), and class pairs that confuse are
    near-duplicate strata candidates.

    Scale shape: training is two keyed aggs (word×class counts, class
    totals); scoring fans doc-words across the (broadcast-small)
    class list, left-joins the count table on the word key — the one
    wide shuffle — and reduces per (doc, class) with
    decimal(38,12)-quantized log terms.  Argmax is a doc-keyed rank
    window on the 6-dp-rounded score with the class-name tiebreak
    (engine-stable, the x240 idiom).

    Output: ``label, predicted, n_docs`` confusion cells (docs with
    no tokens are skipped — no likelihood evidence).
    """
    df = _parallelize_input(df)
    base = df.where(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col).alias("doc"),
        F.col(label_col).alias("label"),
        tokens(F.col(text_col)).alias("__tk"),
    )
    dw = (
        base.select("doc", "label", F.explode("__tk").alias("w"))
        .groupBy("doc", "label", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wc = dw.groupBy(F.col("w"), F.col("label").alias("cls")).agg(
        F.sum("cnt").alias("cwl")
    )
    ct = wc.groupBy("cls").agg(F.sum("cwl").alias("tl"))
    vocab = dw.select("w").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    ndocs = base.groupBy(F.col("label").alias("cls")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    ntot = base.agg(F.count(F.lit(1)).cast("double").alias("nt"))
    classes = (
        ct.join(F.broadcast(ndocs), "cls")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ntot))
        .select(
            "cls",
            F.col("tl").cast("double").alias("tl"),
            "v",
            F.log(F.col("nd") / F.col("nt")).alias("lprior"),
        )
    )
    scored = (
        dw.crossJoin(F.broadcast(classes))
        .join(
            wc.withColumnRenamed("cwl", "__cwl"),
            ["w", "cls"],
            "left",
        )
        .select(
            "doc",
            "label",
            "cls",
            "lprior",
            (
                F.col("cnt").cast("double")
                * F.log(
                    (F.coalesce(F.col("__cwl"), F.lit(0)) + 1).cast(
                        "double"
                    )
                    / (F.col("tl") + F.col("v"))
                )
            )
            .cast("decimal(38,12)")
            .alias("__term"),
        )
        .groupBy("doc", "label", "cls", "lprior")
        .agg(F.sum("__term").cast("double").alias("__ll"))
        .select(
            "doc",
            "label",
            "cls",
            F.round(F.col("lprior") + F.col("__ll"), 6).alias("__score"),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.desc("__score"), F.asc("cls")
    )
    pred = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("doc", "label", F.col("cls").alias("predicted"))
    )
    return pred.groupBy("label", "predicted").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def text_tiling_boundaries(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    block_tokens: int = 20,
    z_cut: float = 1.0,
) -> DataFrame:
    """TextTiling-style topic-boundary detection (Hearst 1997,
    Computational Linguistics — the block-comparison variant): tile
    each document into fixed *block_tokens* blocks, score every
    adjacent block pair by term-vector cosine, and flag boundaries
    where cohesion drops more than *z_cut* standard deviations below
    the document's mean gap score.  The structural chunker behind
    retrieval-corpus preparation: fixed-size chunking (x27) cuts
    mid-topic; tiling cuts WHERE THE VOCABULARY SHIFTS, which is what
    you want embedded as one unit.

    Scale shape: one tokenization pass → (doc, block, term) counts →
    adjacent-pair cosine via ONE equi-join on (doc, term) with
    block+1 (integer sums; the norm join is per-(doc, block)) → a
    doc-keyed mean/std window for the z-score.  Everything is keyed
    by doc; no cross-document work at all.

    Output: one row per interior gap — ``doc_id, gap (block index of
    the right block), cos_sim, z, is_boundary`` (6 dp; documents
    with < 3 blocks emit nothing — no gap statistics).
    """
    df = _parallelize_input(df)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w"),
    ).withColumn("block", (F.col("pos") / F.lit(int(block_tokens))).cast("int"))
    tc = toks.groupBy("doc_id", "block", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    norms = tc.groupBy("doc_id", "block").agg(
        F.sum(F.col("c") * F.col("c")).alias("__n2")
    )
    nblocks = norms.groupBy("doc_id").agg(
        F.max("block").alias("__maxb")
    )
    dots = (
        tc.alias("a")
        .join(
            tc.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") == F.col("b.w"))
            & (F.col("b.block") == F.col("a.block") + 1),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"),
            (F.col("a.block") + 1).alias("gap"),
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("__dot"))
    )
    # gaps with zero shared terms have no dot row: rebuild the full
    # gap list from the block table so cos = 0 gaps still score
    gaps = (
        norms.select("doc_id", (F.col("block") + 1).alias("gap"))
        .join(
            norms.select("doc_id", F.col("block").alias("gap"), "__n2"),
            ["doc_id", "gap"],
        )
        .select("doc_id", "gap", F.col("__n2").alias("__n2r"))
    )
    left = norms.select(
        "doc_id", (F.col("block") + 1).alias("gap"), F.col("__n2").alias("__n2l")
    )
    scored = (
        gaps.join(left, ["doc_id", "gap"])
        .join(dots, ["doc_id", "gap"], "left")
        .select(
            "doc_id",
            "gap",
            F.round(
                F.coalesce(F.col("__dot"), F.lit(0)).cast("double")
                / (
                    F.sqrt(F.col("__n2l").cast("double"))
                    * F.sqrt(F.col("__n2r").cast("double"))
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    wd = Window.partitionBy("doc_id")
    k = F.count(F.lit(1)).over(wd)
    stats = scored.select(
        "doc_id",
        "gap",
        "cos_sim",
        k.alias("__k"),
        (
            F.sum(F.col("cos_sim").cast("decimal(28,6)")).over(wd)
            .cast("double")
            / k
        ).alias("__mu"),
        (
            F.sum(
                (F.col("cos_sim") * F.col("cos_sim")).cast("decimal(38,12)")
            ).over(wd)
            .cast("double")
            / k
        ).alias("__m2"),
    ).where(F.col("__k") >= 2)
    sd = F.sqrt(
        F.greatest(
            F.col("__m2") - F.col("__mu") * F.col("__mu"), F.lit(0.0)
        )
    )
    z = F.try_divide(F.col("cos_sim") - F.col("__mu"), sd)
    return stats.select(
        "doc_id",
        F.col("gap").cast("long").alias("gap"),
        "cos_sim",
        F.round(z, 6).alias("z"),
        (z < F.lit(-float(z_cut))).alias("is_boundary"),
    )


def query_likelihood_rank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    *,
    mu: float = 2000.0,
    top_n: int = 10,
) -> DataFrame:
    """Top-*top_n* documents under the Dirichlet-smoothed query
    likelihood language model (Zhai-Lafferty 2001): ``score(d) =
    sum_t ln((tf_td + mu * P(t|C)) / (dl_d + mu))`` with ``P(t|C)``
    the collection unigram model — the probabilistic retrieval
    counterpart to BM25 (cf. bm25_rank), whose single ``mu`` knob
    replaces (k1, b) and whose background model scores documents
    even for terms they lack.

    Plan shape mirrors ``bm25_rank`` exactly: row-local tf via
    ``F.filter`` over the staged token array (k array scans per row,
    no vocabulary shuffle), ONE 1-row corpus aggregate (total tokens
    + per-term collection tf) materialized driver-side into literals
    (the documented literal-stats pattern, cf. tfidf_top_terms), and
    a TakeOrderedAndProject top-n — never a full sort.  Only
    documents matching >=1 query term are ranked (the standard
    candidate-set restriction; the background model still
    discriminates among them via dl).  Scores at 6 dp, doc id
    tie-break.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    df = _parallelize_input(df)

    toks = tokens(F.col(text_col))

    def _eq(term: str):
        lit = F.lit(term)
        return lambda x: x == lit

    tf_cols = {
        f"tf_{i}": F.size(F.filter(toks, _eq(t))).cast("long")
        for i, t in enumerate(terms)
    }
    per_doc = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        *[c.alias(n) for n, c in tf_cols.items()],
    )

    stats = per_doc.agg(
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum(f"tf_{i}").alias(f"ctf_{i}")
            for i in range(len(terms))
        ],
    ).first()
    total = float(stats["total_tokens"] or 0.0)

    score = F.lit(0.0)
    any_tf = F.lit(False)
    for i in range(len(terms)):
        # P(t|C) then mu*P — association order matches the oracle SQL
        pc = float(stats[f"ctf_{i}"] or 0) / max(total, 1.0)
        tf = F.col(f"tf_{i}").cast("double")
        score = score + F.log(
            (tf + F.lit(mu * pc))
            / (F.col("dl").cast("double") + F.lit(float(mu)))
        )
        any_tf = any_tf | (F.col(f"tf_{i}") > 0)

    scored = per_doc.withColumn("score", F.round(score, 6))
    return (
        scored.where(any_tf)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(top_n))
    )


def span_corruption_plan(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    mask_rate: float = 0.15,
    mean_span: int = 3,
    salt: str = "t5",
) -> DataFrame:
    """T5-style span-corruption mask plan (Raffel et al. 2020): pick
    deterministic corruption spans over each document's token grid and
    report the realized masking profile — the plan a seq2seq
    pretraining pipeline materializes into (inputs, targets) pairs,
    audited BEFORE the expensive tokenize-and-write pass.

    Mechanism (set-based, no sequential scan): every token index i is
    a candidate span START with probability ``mask_rate / mean_span``
    (derandomized: ``uniform_hash01(id:i) < p``); a started span
    covers ``[i, i + mean_span)``; overlapping/adjacent spans merge by
    the standard islands technique (interval union via running max of
    span ends — cf. interval_overlap).  Expected coverage ~= mask_rate
    with geometric-ish span lengths after merging, and the whole plan
    is reproducible from (salt, doc id) alone — no RNG state to ship.

    Output one row per document: ``(doc_id, n_tokens, n_spans,
    n_masked, mask_frac)`` (6 dp).  Documents with zero tokens are
    dropped (nothing to corrupt).

    Plan shape: one posexplode to the token grid, per-doc keyed
    windows (running max of candidate span ends -> island ids ->
    span/mask counts) — everything keyed by doc, no global state,
    linear in corpus tokens."""
    p_start = float(mask_rate) / float(mean_span)
    L = int(mean_span)
    base = _parallelize_input(df).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")
    ).withColumn("n_tokens", F.size("__t").cast("long")).where(
        F.col("n_tokens") > 0
    )
    grid = base.select(
        "doc_id",
        "n_tokens",
        F.posexplode(F.col("__t")).alias("i", "__tok"),
    ).drop("__tok")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col("doc_id").cast("string"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    cand = grid.withColumn(
        "__end",
        F.when(
            u < F.lit(p_start),
            F.least(
                F.col("i").cast("long") + F.lit(L),
                F.col("n_tokens"),
            ),
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # a token is MASKED iff some earlier-or-here span covers it:
    # running max of ends over strictly-previous rows vs current start
    cov_prev = F.max("__end").over(w)
    w2 = Window.partitionBy("doc_id").orderBy("i")
    marked = cand.withColumn(
        "__covered",
        (
            F.col("__end").isNotNull()
            | (F.coalesce(cov_prev, F.lit(-1)) > F.col("i"))
        ).cast("long"),
    ).withColumn(
        # a merged span OPENS at an uncovered->covered transition, so
        # overlapping AND back-to-back spans count as one masked run
        "__opens",
        (
            (F.col("__covered") == 1)
            & (F.coalesce(F.lag("__covered").over(w2), F.lit(0)) == 0)
        ).cast("long"),
    )
    return (
        marked.groupBy("doc_id", "n_tokens")
        .agg(
            F.sum("__opens").cast("long").alias("n_spans"),
            F.sum("__covered").cast("long").alias("n_masked"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_spans",
            "n_masked",
            F.round(
                F.col("n_masked").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("mask_frac"),
        )
    )


def vocab_richness(df: DataFrame, text_col: str) -> DataFrame:
    """Nonparametric vocabulary-richness estimators over the corpus:
    Chao1 (Chao 1984, bias-corrected form) and ACE (Chao & Lee 1992)
    — "how many word types exist that this corpus hasn't shown yet",
    from the frequency-of-frequencies alone.  The forward-looking
    complement to the Heaps'-law growth fit (x194) and Good–Turing
    unseen-mass estimate (x257):

    * ``chao1 = S_obs + f1(f1−1) / (2(f2+1))`` — defined even with no
      doubletons (the classical f1²/2f2 form is not).
    * ACE over the rare tail (counts ≤ 10): coverage
      ``C = 1 − f1/N_rare``,
      ``γ² = max(0, S_rare·Σk(k−1)f_k / (C·N_rare(N_rare−1)) − 1)``,
      ``ace = S_abund + S_rare/C + f1·γ²/C`` — null when every rare
      type is a singleton (C = 0: the estimator is undefined, not
      infinite).

    Cross-engine exactness: everything up to the final formulas is
    integer (type counts → frequency-of-frequencies), so the handful
    of closing double divisions see identical operands in any
    partitioning and in the oracle.

    Scale shape: tokenize+explode → ONE term-keyed count agg → one
    count-keyed agg over the (tiny) distinct-count support → single
    reduce.  The same two-shuffle shape as every corpus-vocab query;
    no windows.

    Output: one row ``(s_obs, n_tokens, f1, f2, chao1, ace)``.
    """
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fof = counts.groupBy("c").agg(F.count(F.lit(1)).alias("f"))
    agg = fof.agg(
        F.sum("f").cast("long").alias("s_obs"),
        F.sum(F.col("c") * F.col("f")).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, F.col("f")).otherwise(F.lit(0)))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, F.col("f")).otherwise(F.lit(0)))
        .cast("long")
        .alias("f2"),
        F.sum(
            F.when(F.col("c") <= 10, F.col("f")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("__s_rare"),
        F.sum(
            F.when(F.col("c") <= 10, F.col("c") * F.col("f")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("__n_rare"),
        F.sum(
            F.when(
                F.col("c") <= 10,
                F.col("c") * (F.col("c") - 1) * F.col("f"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("__kk1"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.col("s_obs").cast("double") + f1 * (f1 - 1.0) / (
        2.0 * (f2 + 1.0)
    )
    s_rare = F.col("__s_rare").cast("double")
    n_rare = F.col("__n_rare").cast("double")
    s_abund = (F.col("s_obs") - F.col("__s_rare")).cast("double")
    cov = F.lit(1.0) - f1 / n_rare
    gamma2 = F.greatest(
        F.lit(0.0),
        s_rare
        * F.col("__kk1").cast("double")
        / (cov * n_rare * (n_rare - 1.0))
        - F.lit(1.0),
    )
    ace = F.when(
        (F.col("__n_rare") > 1) & (cov > 0),
        s_abund + s_rare / cov + f1 * gamma2 / cov,
    )
    return agg.select(
        "s_obs",
        "n_tokens",
        "f1",
        "f2",
        F.round(chao1, 6).alias("chao1"),
        F.round(ace, 6).alias("ace"),
    )


def stupid_backoff_score(
    ref_docs: DataFrame,
    score_docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document mean trigram stupid-backoff log-score (Brants et
    al. 2007, "Large Language Models in Machine Translation") of
    *score_docs* under raw n-gram counts from *ref_docs* — the
    cheapest cross-corpus LM quality signal: no discounting, no
    normalization, just count ratios with a fixed backoff penalty.

    ``S(w3 | w1 w2) = f(w1w2w3)/f(w1w2)`` when the trigram is seen in
    the reference, else ``alpha * f(w2w3)/ctx(w2)`` when the bigram
    is — where ``ctx(w2)`` is the bigram-context count (occurrences
    of w2 followed by another token, i.e. excluding document-final
    w2, so the level-2 ratios over a fixed context sum to 1) —,
    else ``alpha^2 * (f(w3)+1)/(N+V)`` (add-one on the unigram floor
    so out-of-vocabulary tokens stay finite — the one deviation from
    the paper, which assumes an OOV-free vocabulary).  Splitting
    reference and scored corpora is what makes backoff live: scoring
    a corpus under its own counts never leaves level 3 (every scored
    trigram counts itself).

    Plan shape: reference counts are three keyed aggregations with
    map-side combine (vocabulary-bounded outputs, Zipf-friendly);
    the scored token stream builds trigrams with two ``lag`` steps
    over one (doc, position) window — row-linear, never a token
    self-join — then THREE stream joins (trigram-, bigram-, unigram-
    keyed model tables, each pre-joined to its context counts so one
    probe carries numerator and denominator).  N and V are 1-row
    aggregates injected as literals.  Per-token log10 scores round at
    9 dp and decimal-sum per doc (accumulation-order-insensitive).

    Output per scored doc with >= 3 tokens: ``(doc_id, n_scored,
    n_tri_hits, n_bi_backoffs, n_uni_backoffs, mean_log10_score)``
    (6 dp, tie-safe).
    """
    a = float(alpha)
    if not (0.0 < a <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    dec = "decimal(38,9)"

    ref_toks = _parallelize_input(ref_docs).select(
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w")
    )
    n_total = ref_toks.count()
    vocab = ref_toks.select("w").distinct().count()
    if n_total == 0:
        raise ValueError("reference corpus has no tokens")

    uni = ref_toks.groupBy(F.col("w").alias("w3")).agg(
        F.count(F.lit(1)).cast("long").alias("__c1")
    )
    rt = _parallelize_input(ref_docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w3"),
    )
    wref = Window.partitionBy("doc_id").orderBy("pos")
    ref_tri = rt.select(
        F.lag("w3", 2).over(wref).alias("w1"),
        F.lag("w3", 1).over(wref).alias("w2"),
        "w3",
    )
    bi_counts = (
        ref_tri.where(F.col("w2").isNotNull())
        .groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("__c2"))
    )
    bi_ctx = bi_counts.groupBy(F.col("w2")).agg(
        F.sum("__c2").cast("long").alias("__c2ctx")
    )
    bi_model = bi_counts.join(bi_ctx, on="w2")
    tri_counts = (
        ref_tri.where(F.col("w1").isNotNull())
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("__c3"))
    )
    tri_ctx = tri_counts.groupBy("w1", "w2").agg(
        F.sum("__c3").cast("long").alias("__c3ctx")
    )
    tri_model = tri_counts.join(tri_ctx, on=["w1", "w2"])

    st = _parallelize_input(score_docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w3"),
    )
    wsc = Window.partitionBy("doc_id").orderBy("pos")
    stream = st.select(
        "doc_id",
        F.lag("w3", 2).over(wsc).alias("w1"),
        F.lag("w3", 1).over(wsc).alias("w2"),
        "w3",
    ).where(F.col("w1").isNotNull())
    probed = (
        stream.join(tri_model, on=["w1", "w2", "w3"], how="left")
        .join(bi_model, on=["w2", "w3"], how="left")
        .join(uni, on="w3", how="left")
    )
    s_tri = F.col("__c3").cast("double") / F.col("__c3ctx").cast("double")
    s_bi = (
        F.lit(a)
        * F.col("__c2").cast("double")
        / F.col("__c2ctx").cast("double")
    )
    s_uni = (
        F.lit(a * a)
        * (F.coalesce(F.col("__c1"), F.lit(0)).cast("double") + F.lit(1.0))
        / F.lit(float(n_total) + float(vocab))
    )
    level = F.when(F.col("__c3").isNotNull(), F.lit(3)).otherwise(
        F.when(F.col("__c2").isNotNull(), F.lit(2)).otherwise(F.lit(1))
    )
    score = F.when(F.col("__c3").isNotNull(), s_tri).otherwise(
        F.when(F.col("__c2").isNotNull(), s_bi).otherwise(s_uni)
    )
    logt = F.round(F.log10(score), 9).cast(dec)
    return (
        probed.select("doc_id", level.alias("__lvl"), logt.alias("__lg"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.sum((F.col("__lvl") == 3).cast("long")).alias("n_tri_hits"),
            F.sum((F.col("__lvl") == 2).cast("long")).alias(
                "n_bi_backoffs"
            ),
            F.sum((F.col("__lvl") == 1).cast("long")).alias(
                "n_uni_backoffs"
            ),
            (
                F.round(
                    F.try_divide(
                        F.sum("__lg").cast("double"),
                        F.count(F.lit(1)).cast("double"),
                    )
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("mean_log10_score"),
        )
    )


# --------------------------------------------------------------------
# script-mixing / confusable audit, code-vs-prose, FIM span planning
# (round-7 second session)

#: literal character-class strings shared verbatim by the Spark regex
#: and the SQL oracle — actual codepoints, not \\u escapes, because
#: Java regex and RE2 spell escapes differently but treat literal
#: ranges identically
_CYRILLIC_CLASS = f"[{chr(0x0400)}-{chr(0x04FF)}]"
_GREEK_CLASS = f"[{chr(0x0370)}-{chr(0x03FF)}]"
_INVISIBLE_CLASS = (
    f"[{chr(0x200B)}-{chr(0x200F)}{chr(0x202A)}-{chr(0x202E)}"
    f"{chr(0xFEFF)}{chr(0x2060)}]"
)


def script_mixing_audit(
    df: DataFrame, *, id_col: str, text_col: str
) -> DataFrame:
    """Unicode script-mixing / confusable-spoofing audit per document
    (the UTS #39 mixed-script heuristic applied to corpus hygiene):
    counts Latin letters, Cyrillic and Greek codepoints, decimal
    digits, and invisible/bidi controls (ZWSP..RLM, LRE..RLO, BOM,
    word joiner), then flags documents mixing Latin with a confusable
    script and scores the confusable fraction.  Training corpora
    poisoned with homoglyph substitutions (``dаta`` with Cyrillic а)
    defeat exact dedup and token-frequency filters — this is the
    scan that catches them BEFORE tokenization; the codepoint-level
    companion to x191's byte-level mojibake profile.

    Pure single-pass column algebra (regexp counts over literal
    codepoint ranges — identical class strings in both engines), no
    shuffle beyond the final sort: the canonical 100 TB map-only
    scan.

    Output per document: ``(id, n_latin, n_cyrillic, n_greek,
    n_digit, n_invisible, mixed_script, confusable_frac)``; the
    fraction is NULL for letterless documents.
    """
    cnt = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(F.col("t"), F.lit(pat), 0)
    ).cast("long")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    scored = base.select(
        "id",
        cnt("[A-Za-z]").alias("n_latin"),
        cnt(_CYRILLIC_CLASS).alias("n_cyrillic"),
        cnt(_GREEK_CLASS).alias("n_greek"),
        cnt("[0-9]").alias("n_digit"),
        cnt(_INVISIBLE_CLASS).alias("n_invisible"),
    )
    conf = F.col("n_cyrillic") + F.col("n_greek")
    letters = F.col("n_latin") + conf
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return scored.select(
        "id", "n_latin", "n_cyrillic", "n_greek", "n_digit",
        "n_invisible",
        ((F.col("n_latin") > 0) & (conf > 0)).cast("int").alias(
            "mixed_script"
        ),
        r6(
            F.when(letters > 0, conf.cast("double") / letters)
        ).alias("confusable_frac"),
    ).orderBy("id")


#: keyword alternation for the code-likeness heuristic — literal, no
#: escapes, identical in both engines
_CODE_KEYWORDS = (
    r"\b(def|return|import|const|var|function|class|if|else|for"
    r"|while|lambda|void|int|public)\b"
)
_CODE_SYMBOLS = r"[{}();=<>\[\]]"
_INDENT_LINES = r"(?m)^(  +|\t)"
_SNAKE = r"[a-z]_[a-z]"
_CAMEL = r"[a-z][A-Z]"


def code_prose_score(
    df: DataFrame, *, id_col: str, text_col: str
) -> DataFrame:
    """Code-vs-prose detection per document by surface heuristics
    (the fastText-free first pass every pretraining pipeline runs to
    route documents to the code vs natural-language mixers): symbol
    density, indented-line count, language-keyword hits, snake_case
    and camelCase digram counts, folded into a literal-weight score

        ``score = 4·sym_ratio + 0.05·kw + 0.03·indent + 0.02·snake
                  + 0.02·camel``  (clamped informally by the data)

    with ``is_code = score > 0.5``.  Weights are Python literals
    injected into both engines; all counts are exact integers over
    shared literal regexes (``(?m)`` multiline and ``\\b`` behave
    identically in Java regex and RE2).

    Map-only single pass — no shuffle, no UDF; at 100 TB this rides
    the scan like x06's text profile.

    Output: ``(id, n_chars, sym_count, kw_count, indent_count,
    snake_count, camel_count, code_score, is_code)``.
    """
    cnt = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(F.col("t"), F.lit(pat), 0)
    ).cast("long")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    scored = base.select(
        "id",
        F.length("t").cast("long").alias("n_chars"),
        cnt(_CODE_SYMBOLS).alias("sym_count"),
        cnt(_CODE_KEYWORDS).alias("kw_count"),
        cnt(_INDENT_LINES).alias("indent_count"),
        cnt(_SNAKE).alias("snake_count"),
        cnt(_CAMEL).alias("camel_count"),
    )
    score = (
        F.lit(4.0)
        * F.col("sym_count")
        / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
        + F.lit(0.05) * F.col("kw_count")
        + F.lit(0.03) * F.col("indent_count")
        + F.lit(0.02) * F.col("snake_count")
        + F.lit(0.02) * F.col("camel_count")
    )
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return scored.select(
        "*",
        r6(score).alias("code_score"),
        (score > F.lit(0.5)).cast("int").alias("is_code"),
    ).orderBy("id")


def fim_span_plan(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    min_len: int = 8,
    salt: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle span planning per document (Bavarian et al.
    2022, "Efficient training of language models to fill in the
    middle"): split each document's character range into
    prefix/middle/suffix at two md5-derived uniform cut points —
    the deterministic replayable version of the random FIM transform
    a pretraining pipeline applies, so the same corpus snapshot
    always yields the same spans (and an incremental rebuild
    reproduces them).  Alternating documents get PSM / SPM ordering
    (``doc_id`` parity), mirroring the 50/50 joint-format recipe.

    Cut-point algebra: ``u = md5_32(salt:id) / 2^32`` (the KMV hash
    idiom), ``p_end = 1 + floor(u1·(n-2))``, ``m_end = p_end + 1 +
    floor(u2·(n-p_end-1))`` — both segments guaranteed non-empty for
    ``n >= 3``; documents shorter than *min_len* pass through with
    NULL spans (too short to supervise).  Each segment is certified
    by an md5-prefix digest so the oracle proves byte-identical
    splitting, not just identical lengths.

    Map-only, no shuffle, no UDF — the split is column algebra over
    substrings and rides the scan at any scale.

    Output: ``(id, n_chars, fim_format, prefix_len, middle_len,
    suffix_len, prefix_md5, middle_md5, suffix_md5)``.
    """
    if min_len < 3:
        raise ValueError("fim_span_plan: min_len must be >= 3")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )

    def u01(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(f"{salt}-{tag}"),
                            F.col("id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            .cast("double")
            / F.lit(4294967296.0)
        )

    n = F.length("t").cast("long")
    eligible = n >= F.lit(int(min_len))
    p_end = (
        F.lit(1)
        + F.floor(u01("a") * (n - F.lit(2)).cast("double")).cast("long")
    )
    m_end = (
        p_end
        + F.lit(1)
        + F.floor(
            u01("b") * (n - p_end - F.lit(1)).cast("double")
        ).cast("long")
    )
    seg = lambda s, ln: F.substring(F.col("t"), s, ln)  # noqa: E731
    pfx = seg(F.lit(1), p_end)
    mid = seg(p_end + F.lit(1), m_end - p_end)
    sfx = seg(m_end + F.lit(1), n - m_end)
    dig = lambda c: F.substring(F.md5(c), 1, 8)  # noqa: E731
    return base.select(
        "id",
        n.alias("n_chars"),
        F.when(
            eligible,
            F.when(F.col("id") % 2 == 0, F.lit("psm")).otherwise(
                F.lit("spm")
            ),
        ).alias("fim_format"),
        F.when(eligible, p_end).alias("prefix_len"),
        F.when(eligible, m_end - p_end).alias("middle_len"),
        F.when(eligible, n - m_end).alias("suffix_len"),
        F.when(eligible, dig(pfx)).alias("prefix_md5"),
        F.when(eligible, dig(mid)).alias("middle_md5"),
        F.when(eligible, dig(sfx)).alias("suffix_md5"),
    ).orderBy("id")


#: chat-format marker regexes — literal, engine-portable
_CHATML_MARK = r"<\|im_start\|>"
_INST_MARK = r"\[INST\]"
_ROLE_LINE = r"(?m)^(system|user|assistant): "
_JSON_ROLE = r'"role"\s*:\s*"(system|user|assistant)"'


def chat_template_detect(
    df: DataFrame, *, id_col: str, text_col: str
) -> DataFrame:
    """Chat/instruction-format detection per document: counts of the
    four marker families a pretraining pipeline must route away from
    the plain-text mixer (or strip) — ChatML ``<|im_start|>`` blocks,
    Llama-style ``[INST]`` tags, ``role:``-prefixed transcript lines,
    and serialized-JSON role keys.  Dominant format by count with a
    fixed precedence tie-break (chatml > inst > role_lines > json),
    NULL for plain documents.  Map-only literal-regex scan, the
    x345/x346 family's fourth member.

    Output: ``(id, chatml_count, inst_count, role_line_count,
    json_role_count, is_chat, chat_format)``.
    """
    cnt = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(F.col("t"), F.lit(pat), 0)
    ).cast("long")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    scored = base.select(
        "id",
        cnt(_CHATML_MARK).alias("chatml_count"),
        cnt(_INST_MARK).alias("inst_count"),
        cnt(_ROLE_LINE).alias("role_line_count"),
        cnt(_JSON_ROLE).alias("json_role_count"),
    )
    counts = [
        ("chatml", F.col("chatml_count")),
        ("inst", F.col("inst_count")),
        ("role_lines", F.col("role_line_count")),
        ("json_roles", F.col("json_role_count")),
    ]
    any_chat = None
    for _, c in counts:
        any_chat = c > 0 if any_chat is None else (any_chat | (c > 0))
    # fixed-precedence argmax: first family with the maximal count
    mx = F.greatest(*[c for _, c in counts])
    fmt = F.when(F.lit(False), F.lit(""))
    for name, c in counts:
        fmt = fmt.when(c == mx, F.lit(name))
    return scored.select(
        "*",
        any_chat.cast("int").alias("is_chat"),
        F.when(any_chat, fmt).alias("chat_format"),
    ).orderBy("id")


def negative_sampling_plan(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n_neg: int = 5,
    salt: str = "neg",
    bucket_width: int = 65536,
) -> DataFrame:
    """word2vec-style negative-sampling plan (Mikolov et al. 2013):
    draw *n_neg* deterministic negatives per document from the
    unigram^(3/4) distribution — the replayable version of the
    sampling a skip-gram/contrastive pipeline performs, so shards
    rebuilt incrementally draw the SAME negatives.

    Mechanism, all engine-exact:

    * unigram weights ``w = sqrt(sqrt(cnt³))`` — cnt^(3/4) via two
      IEEE-exact sqrts, never libm ``pow`` (the x184 discipline);
    * an ORDER-PINNED running sum over the vocabulary (sorted by
      word) lays the words out on a line; boundaries snap to an
      integer lattice at 1e-6 grain via ``lag(cum)`` (NOT ``cum−w``,
      which float-drifts off the previous boundary), making intervals
      exactly contiguous;
    * each (doc, k) draw is an md5-derived integer in [0, total) —
      pure integer arithmetic, no float in the draw;
    * draws land on words through :func:`..temporal.range_join_points`
      — the bucketed interval join, never a nested-loop range scan.

    The vocabulary-sized window is metadata-scale (the x343 histogram
    precedent); the draw frame is docs × n_neg and joins by bucket.

    Output: ``(id, k, neg_word)`` ordered by (id, k).
    """
    if n_neg < 1:
        raise ValueError("negative_sampling_plan: n_neg must be >= 1")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    toks = base.select(
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(F.lower(F.col("t")), r"\s+", " ")
                ),
                " ",
            )
        ).alias("w")
    ).where(F.col("w") != "")
    vocab = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    wgt = F.sqrt(F.sqrt(F.col("cnt") * F.col("cnt") * F.col("cnt")))
    wv = Window.orderBy("w")
    wcum = wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lattice = (
        vocab.withColumn("cum", F.sum(wgt).over(wcum))
        .withColumn("hi", F.round(F.col("cum") * F.lit(1e6)).cast("long"))
        .withColumn(
            "lo",
            F.coalesce(
                F.round(F.lag("cum").over(wv) * F.lit(1e6)).cast("long"),
                F.lit(0),
            ),
        )
        .select("w", "lo", "hi")
    )
    total = lattice.agg(F.max("hi").alias("total"))
    ks = F.explode(
        F.array(*[F.lit(k) for k in range(1, int(n_neg) + 1)])
    )
    draws = (
        base.select("id", ks.alias("k"))
        .join(F.broadcast(total))
        .select(
            "id",
            "k",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit(salt),
                                F.col("id").cast("string"),
                                F.col("k").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("total")
            ).alias("target"),
        )
    )
    from .temporal import range_join_points

    joined = range_join_points(
        draws,
        lattice,
        point_col="target",
        start_col="lo",
        end_col="hi",
        bucket_width=int(bucket_width),
    )
    return joined.select(
        F.col("id"),
        F.col("k").cast("long").alias("k"),
        F.col("w").alias("neg_word"),
    ).orderBy("id", "k")


def cdc_chunk_dedup(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    boundary_mod: int = 8,
) -> DataFrame:
    """Content-defined chunking dedup profile (the FastCDC/LBFS idea
    at word granularity, Muthitacharoen et al. 2001): a word ENDS a
    chunk whenever its content hash satisfies
    ``md5_32('cdc:'+word) % boundary_mod == 0`` — boundaries depend
    only on LOCAL content, so inserting a sentence shifts no
    boundary outside its own chunk (fixed-size blocks reshuffle
    everything; x21's passage windows slide).  Chunks fingerprint by
    md5 and dedup across the corpus: the storage/backup dedup
    mechanism, and the detector for shared boilerplate that
    whole-doc MinHash dilutes below threshold.

    Per document: chunk count, chunks shared with ANY other document,
    and the fraction of the document's words sitting inside shared
    chunks — the "how much of this doc is template" score.

    Shapes: one posexplode, one (doc, chunk) aggregation with an
    ordered string_agg, one corpus-wide chunk-count aggregation
    joined back (hash-keyed).  Expected chunk length is
    *boundary_mod* words.

    Output: ``(id, n_words, n_chunks, dup_chunks, dup_word_frac)``
    at 6 dp, ordered by id.
    """
    if boundary_mod < 2:
        raise ValueError(
            "cdc_chunk_dedup: boundary_mod must be >= 2"
        )
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    words = base.select(
        "id",
        F.posexplode(
            F.filter(
                F.split(
                    F.trim(
                        F.regexp_replace(
                            F.lower(F.col("t")), r"\s+", " "
                        )
                    ),
                    " ",
                ),
                lambda w: w != F.lit(""),
            )
        ).alias("pos", "w"),
    )
    flag = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cdc:"), F.col("w"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % F.lit(int(boundary_mod))
        == 0
    ).cast("long")
    wseq = Window.partitionBy("id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    chunked = words.withColumn("f", flag).withColumn(
        "chunk", F.sum("f").over(wseq) - F.col("f")
    )
    chunks = chunked.groupBy("id", "chunk").agg(
        F.count(F.lit(1)).cast("long").alias("c_words"),
        F.substring(
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("pos", "w"))
                        ),
                        lambda s: s["w"],
                    ),
                    " ",
                )
            ),
            1,
            8,
        ).alias("h"),
    )
    corpus = chunks.groupBy("h").agg(
        F.countDistinct("id").cast("long").alias("n_docs")
    )
    tagged = chunks.join(corpus, "h")
    r6 = lambda c: F.round(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    agg = tagged.groupBy("id").agg(
        F.sum("c_words").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.count(F.when(F.col("n_docs") > 1, F.lit(1)))
        .cast("long")
        .alias("dup_chunks"),
        F.sum(
            F.when(F.col("n_docs") > 1, F.col("c_words")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("dup_words"),
    )
    return agg.select(
        "id", "n_words", "n_chunks", "dup_chunks",
        r6(
            F.col("dup_words").cast("double")
            / F.col("n_words").cast("double")
        ).alias("dup_word_frac"),
    ).orderBy("id")


def repeated_span_extents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 8,
    max_gram_docs: int = 20,
    min_span_tokens: int = 10,
) -> DataFrame:
    """Maximal cross-document repeated token spans — the EXTENT form
    of the ExactSubstr criterion (Lee et al. 2022): where
    :func:`dup_span_profile` scores each document by how much of it is
    corpus-duplicated, this returns WHICH spans are shared between
    WHICH document pairs and how long they run — the actionable
    output an exact-substring dedup pass cuts (licence blocks,
    templates, mirrored articles).

    Mechanism: positional *k*-shingle fingerprints; shingles shared by
    2..*max_gram_docs* documents (the cap drops ubiquitous boilerplate
    grams whose pair sets grow quadratically — raise it consciously,
    the way the LSH ``max_bucket`` caps work) pair up via ONE
    fingerprint-keyed equi-join; within a document pair, matches on
    one diagonal (``pos_a − pos_b`` constant) that sit at consecutive
    positions belong to one maximal span — the classic
    gaps-and-islands grouping ``pos_a − row_number()`` over a
    (pair, diagonal)-keyed window.  A run of ``m`` consecutive shared
    k-shingles certifies a shared span of ``m + k − 1`` tokens.

    Scale shape: the explode rides the scan; two shuffles on uniform
    keys (shingle hash, then the pair+diagonal window key); the pair
    join is frequency-capped so nothing is quadratic in the corpus.
    All outputs are integers — partitioning cannot change them.

    Output: ``doc_a < doc_b``, ``diag``, ``start_a``, ``start_b``
    (0-based token offsets), ``matched_grams``, ``span_tokens``
    (= matched_grams + k − 1), spans of at least *min_span_tokens*.
    """
    toked = df.select(
        F.col(id_col).cast("long").alias("doc"),
        tokens(F.col(text_col)).alias("__toks"),
    ).where(F.size("__toks") >= k)
    pos = toked.select(
        "doc",
        F.posexplode(token_ngrams(F.col("__toks"), k)).alias(
            "pos", "__g"
        ),
    )
    freq = (
        pos.groupBy("__g")
        .agg(F.count_distinct("doc").alias("__nd"))
        .where(
            (F.col("__nd") >= 2) & (F.col("__nd") <= int(max_gram_docs))
        )
        .select("__g")
    )
    occ = pos.join(freq, on="__g")
    a = occ.select(
        "__g", F.col("doc").alias("doc_a"), F.col("pos").alias("pos_a")
    )
    b = occ.select(
        "__g", F.col("doc").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    pairs = a.join(b, on="__g").where(F.col("doc_a") < F.col("doc_b"))
    diag = pairs.select(
        "doc_a",
        "doc_b",
        (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        "pos_a",
        "pos_b",
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = diag.withColumn(
        "__island", F.col("pos_a") - F.row_number().over(w)
    )
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "__island")
        .agg(
            F.min("pos_a").cast("long").alias("start_a"),
            F.min("pos_b").cast("long").alias("start_b"),
            F.count("*").cast("long").alias("matched_grams"),
        )
        .withColumn(
            "span_tokens",
            (F.col("matched_grams") + F.lit(k - 1)).cast("long"),
        )
        .where(F.col("span_tokens") >= int(min_span_tokens))
        .drop("__island")
    )


def local_align_pairs(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    toks_a: str,
    toks_b: str,
    *,
    match: int = 2,
    mismatch: int = -1,
    gap: int = -1,
    max_tokens: int = 64,
) -> DataFrame:
    """Smith-Waterman local alignment score over token sequences
    (Smith & Waterman 1981) for a pre-paired frame — the gap-tolerant
    complement to :func:`repeated_span_extents`: exact-substring
    extents miss near-identical spans with an insertion/edit inside;
    local alignment scores them (plagiarism/mirror detection, fuzzy
    boilerplate, template drift between document versions).

    ``H(i,j) = max(0, H(i-1,j-1)+s, H(i-1,j)+gap, H(i,j-1)+gap)`` —
    integer DP, so both engines are exact.  Sequences are truncated to
    *max_tokens* (loud in the schema: ``n_a``/``n_b`` carry the
    aligned lengths) — the pair frame is expected to come from a
    candidate generator (LSH buckets, repeated-span hits), never a
    full cross join.

    Execution: the x323 DTW shape — each pair's DP runs inside ONE
    Arrow batch; the oracle replays the identical recursion as an
    anti-diagonal wavefront recursive CTE and reads the argmax with
    the same total tie order (score desc, then smallest end_i,
    end_j).

    Output: ``(doc_a, doc_b, n_a, n_b, score, end_i, end_j)`` with
    1-based end positions of the best local alignment (0/0 when the
    best score is 0).
    """
    staged = pairs.select(
        F.col(id_a).cast("long").alias("doc_a"),
        F.col(id_b).cast("long").alias("doc_b"),
        F.slice(F.col(toks_a), 1, int(max_tokens)).alias("xa"),
        F.slice(F.col(toks_b), 1, int(max_tokens)).alias("xb"),
    )
    ms, mm, gp = int(match), int(mismatch), int(gap)

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_a": [], "doc_b": [], "n_a": [], "n_b": [],
                   "score": [], "end_i": [], "end_j": []}
            for da, db, xa, xb in zip(
                pdf["doc_a"], pdf["doc_b"], pdf["xa"], pdf["xb"]
            ):
                a, b = list(xa), list(xb)
                n, m = len(a), len(b)
                prev = [0] * (m + 1)
                best, bi, bj = 0, 0, 0
                for i in range(1, n + 1):
                    cur = [0] * (m + 1)
                    for j in range(1, m + 1):
                        s = ms if a[i - 1] == b[j - 1] else mm
                        h = max(
                            0,
                            prev[j - 1] + s,
                            prev[j] + gp,
                            cur[j - 1] + gp,
                        )
                        cur[j] = h
                        if h > best:
                            best, bi, bj = h, i, j
                    prev = cur
                out["doc_a"].append(int(da))
                out["doc_b"].append(int(db))
                out["n_a"].append(n)
                out["n_b"].append(m)
                out["score"].append(best)
                out["end_i"].append(bi)
                out["end_j"].append(bj)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(c, LongType()) for c in
         ("doc_a", "doc_b", "n_a", "n_b", "score", "end_i", "end_j")]
    )
    return (
        staged.mapInPandas(compute, schema=schema)
        .orderBy("doc_a", "doc_b")
    )


def vocab_growth(
    df: DataFrame,
    text_col: str,
    id_col: str,
    partition_col: str,
) -> DataFrame:
    """Per-entity Heaps-law vocabulary growth (r9 panel text lane):
    for each *partition_col* entity, documents in *id_col* order
    accumulate the count of DISTINCT tokens seen so far — the corpus
    diagnostic behind "how much new vocabulary does each source still
    contribute", which drives dedup/mixture decisions at ingest time.

    Declarative shape, no per-entity iteration: a token's first
    appearance is one ``groupBy(entity, token).min(id)`` (uniform
    keys, map-side combinable), new-token counts re-key by (entity,
    first_doc), and the running vocabulary is a PARTITION BY entity
    cumulative window — each entity's curve computes independently, so
    at 100 TB adding sources adds partitions, never rows-per-window.

    Output per document: ``(partition_col, id_col, n_tokens, n_new,
    vocab_cum)``, ordered.
    """
    base = df.select(
        F.col(partition_col).alias("__pk"),
        F.col(id_col).cast("long").alias("__doc"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    toks = base.select(
        "__pk", "__doc", F.explode("__toks").alias("__tok")
    )
    firsts = (
        toks.groupBy("__pk", "__tok")
        .agg(F.min("__doc").alias("__doc"))
        .groupBy("__pk", "__doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    per_doc = base.select(
        "__pk", "__doc", F.size("__toks").cast("long").alias("n_tokens")
    ).join(firsts, on=["__pk", "__doc"], how="left")
    w = (
        Window.partitionBy("__pk")
        .orderBy("__doc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = per_doc.withColumn(
        "n_new", F.coalesce(F.col("n_new"), F.lit(0)).cast("long")
    )
    return (
        filled.withColumn(
            "vocab_cum", F.sum("n_new").over(w).cast("long")
        )
        .select(
            F.col("__pk").alias(partition_col),
            F.col("__doc").alias(id_col),
            "n_tokens", "n_new", "vocab_cum",
        )
        .orderBy(partition_col, id_col)
    )
