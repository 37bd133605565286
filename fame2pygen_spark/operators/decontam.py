"""Benchmark decontamination: flag / remove training documents that
share word *n*-grams with a held-out evaluation set.

Not present in the reference (single-frame TS data model) — this is
north-star training-pipeline surface, following the published recipe
(GPT-3 appendix C / Gopher §A.1.2: documents overlapping an eval
benchmark on long word n-grams are dropped from the training corpus).
Deterministic re-definition: overlap is counted over *distinct*
normalized word n-grams, so the operator is a pure function of the two
corpora and a DuckDB oracle reproduces it value-for-value.

Scale shape (100 TB corpus vs ~GB benchmark):

* the benchmark side is reduced to its distinct n-gram set once —
  benchmarks are small (millions of n-grams), so the set broadcasts
  and the corpus-side probe is map-side (no corpus shuffle for the
  join);
* the corpus side builds each document's n-gram array in one scan
  (normalize + tokenize once), `array_distinct` *before* explode so
  repeated grams cost one probe, and aggregates matches by doc id —
  uniform key, map-side combinable;
* the final flag join is counts→corpus on doc id, where the counts
  side holds only contaminated docs (usually a vanishing fraction),
  so AQE broadcasts it.

Set ``broadcast_bench=False`` for benchmark sets too large to ship to
every executor; the probe then becomes a partitioned equi-join on the
gram string — still one shuffle of the (doc, gram) pairs, never a
cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import token_ngrams, tokens


def benchmark_ngrams(bench_df: DataFrame, text_col: str, *, n: int = 8) -> DataFrame:
    """Distinct normalized word *n*-grams of the benchmark corpus
    (single column ``g``) — the probe set for :func:`contamination`."""
    return (
        bench_df.select(
            F.explode(
                F.array_distinct(token_ngrams(tokens(F.col(text_col)), n))
            ).alias("g")
        )
        .distinct()
    )


def contamination(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 8,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """*df* plus ``n_contaminated_ngrams`` (distinct benchmark n-grams
    the document contains) and boolean ``contaminated``
    (``≥ min_overlap``).

    Documents shorter than *n* tokens have no n-grams and are never
    contaminated — the published rules treat them as out of scope.
    """
    bench = benchmark_ngrams(bench_df, text_col, n=n)
    if broadcast_bench:
        bench = F.broadcast(bench)

    doc_grams = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(
            F.array_distinct(token_ngrams(tokens(F.col(text_col)), n))
        ).alias("g"),
    )
    counts = (
        doc_grams.join(bench, on="g")
        .groupBy("__doc")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    out = df.join(
        counts, on=df[id_col] == counts["__doc"], how="left"
    ).drop("__doc")
    # single coalesced expression for both columns — inside one
    # withColumns call the flag would otherwise see the pre-coalesce
    # (NULL) count from the left join
    cnt = F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)).cast("long")
    return out.withColumns(
        {
            "n_contaminated_ngrams": cnt,
            "contaminated": cnt >= F.lit(int(min_overlap)),
        }
    )


def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 8,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """The surviving (uncontaminated) rows of *df*, original schema."""
    flagged = contamination(
        df,
        bench_df,
        text_col,
        id_col,
        n=n,
        min_overlap=min_overlap,
        broadcast_bench=broadcast_bench,
    )
    return flagged.where(~F.col("contaminated")).select(*df.columns)
