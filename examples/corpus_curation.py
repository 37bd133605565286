"""End-to-end training-corpus curation on a tiny in-memory corpus —
the scale-extension side of the engine (SURVEY §8): quality filtering,
exact + fuzzy dedup, duplicated-span scoring, deterministic mixing,
and BPE token accounting, chained the way a real 100 TB pipeline would
run them (each stage a DataFrame → DataFrame operator; nothing
collects to the driver).

Run standalone: ``python examples/corpus_curation.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _corpus(spark: SparkSession) -> DataFrame:
    boiler = "subscribe to our newsletter for updates and offers today"
    rows = [
        (0, "web", "the quick brown fox jumps over the lazy dog and "
                    "runs far away into the green hills"),
        (1, "web", "the quick brown fox jumps over the lazy dog and "
                    "runs far away into the green hills"),   # exact dup
        (2, "web", "the quick brown fox jumps over the sleepy dog and "
                    "runs far away into the green hills"),   # near dup
        (3, "web", boiler + " " + boiler + " " + boiler),    # repetitive
        (4, "books", "call me ishmael some years ago never mind how "
                     "long precisely having little or no money"),
        (5, "books", "it was the best of times it was the worst of "
                     "times it was the age of wisdom"),
        (6, "code", "def main args parse the input and return the "
                    "result of the computation quickly"),
        (7, "web", "zz"),                                    # too short
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.dedup import (
        dedup_exact, prefix_jaccard_join,
    )
    from fame2pygen_spark.operators.mixing import stratified_sample
    from fame2pygen_spark.operators.text import (
        bpe_pretoken_profile, dup_span_profile, gopher_filter,
    )

    docs = _corpus(spark)

    # 1. quality gate (Gopher-style repetition / length screens)
    # thresholds loosened for toy-sized docs (the defaults target
    # real documents, where 25+ tokens and tight 2-gram mass apply)
    kept_ids = (
        gopher_filter(
            docs, "text", "doc_id",
            rules={"min_tokens": 5, "max_top_2gram_char_frac": 0.2},
        )
        .where("keep")
        .select(F.col("doc").alias("doc_id"))
    )
    quality = docs.join(kept_ids, on="doc_id")

    # 2. exact dedup (md5 fingerprint, min-id survivor)
    exact = dedup_exact(quality, "text", "doc_id")

    # 3. fuzzy dedup: exact prefix-filtered Jaccard join -> drop the
    #    higher id of each matched pair
    pairs = prefix_jaccard_join(exact, "text", "doc_id", n=3, threshold=0.5)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = exact.join(losers, on="doc_id", how="left_anti")

    # 4. cross-doc duplicated-span score (survives as a feature column)
    spans = dup_span_profile(deduped, "text", "doc_id", n=5).select(
        F.col("doc").alias("doc_id"), "dup_frac"
    )
    scored = deduped.join(spans, on="doc_id", how="left")

    # 5. deterministic source mix (hash membership — reproducible)
    mixed = stratified_sample(
        scored, "source", {"web": 1.0, "books": 1.0, "code": 1.0},
        "doc_id",
    )

    # 6. token accounting for the training budget
    return (
        bpe_pretoken_profile(mixed, "text", "doc_id")
        .join(mixed.select("doc_id", "source", "dup_frac"), on="doc_id")
        .orderBy("doc_id")
    )


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from _data import demo_spark

    out = main(demo_spark())
    out.show(truncate=False)
