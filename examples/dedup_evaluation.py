"""Evaluating a dedup key before trusting it — the round-4 dedup-eval
operators chained the way a corpus team scores a candidate blocking
strategy:

1. Winnowing fingerprints (MOSS) — candidate near-dup pairs with the
   shared-run guarantee a sampled-hash key cannot give.
2. ROUGE-2 verification on the candidate pairs — clipped n-gram
   overlap separates template churn from genuine duplication.
3. ARI clustering agreement — chance-corrected score of the cheap
   key's clusters against exact-duplicate groups.

Run standalone: ``python examples/dedup_evaluation.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _corpus(spark: SparkSession) -> DataFrame:
    template = (
        "breaking update the quarterly numbers were released today and "
        "analysts expect further movement in the coming weeks"
    )
    rows = []
    for i in range(10):  # template churn: same body, tweaked tail
        rows.append((i, template + f" edition {i}"))
    for i in range(10, 30):  # distinct filler docs
        rows.append(
            (i, f"doc {i} covers topic {i * 7 % 13} with angle {i * 11 % 17} "
                f"and detail {i * 3 % 7} nothing shared here")
        )
    rows.append((30, rows[0][1]))  # one exact duplicate
    return spark.createDataFrame(rows, "doc_id long, text string")


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.dedup import (
        text_fingerprint, winnowing_pairs,
    )
    from fame2pygen_spark.operators.quality import clustering_agreement
    from fame2pygen_spark.operators.text import rouge_ngram_scores

    docs = _corpus(spark)

    pairs = winnowing_pairs(
        docs, "text", "doc_id", k=3, w=4, max_bucket=25, min_shared=2
    )
    print("winnowing candidate pairs (template family + exact dup):")
    pairs.orderBy(F.desc("n_shared"), "doc_a", "doc_b").show(10)

    verified = rouge_ngram_scores(
        docs, "text", "doc_id",
        pairs.select(
            F.col("doc_a").alias("ref_id"), F.col("doc_b").alias("cand_id")
        ),
        n=2,
    )
    print("ROUGE-2 verification of the candidates:")
    verified.orderBy(F.desc_nulls_last("f1")).show(10)

    labeled = docs.select(
        F.lit("all").alias("g"),
        text_fingerprint(F.col("text")).alias("exact"),
        F.substring(F.col("text"), 1, 30).alias("cheap_key"),
    )
    ari = clustering_agreement(labeled, "exact", "cheap_key", ("g",))
    print("ARI of the 30-char-prefix key vs exact duplicate groups:")
    ari.show()

    return verified


if __name__ == "__main__":
    from _data import demo_spark

    main(demo_spark())
