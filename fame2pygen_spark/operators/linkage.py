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

__all__ = ["fuzzy_self_pairs", "default_block_key"]


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
