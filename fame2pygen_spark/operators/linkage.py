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
