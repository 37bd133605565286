"""Daily-ingest dedup operation — the way near-dup dedup actually runs
against a 100 TB corpus (you never re-pair the whole corpus per day):

  day 0   build the corpus signature table once (`minhash_signatures`)
          and persist it next to the corpus;
  day N   `incremental_lsh_pairs(corpus ∪ batch, is_new=batch,
          corpus_sigs=persisted)` — signatures are computed for the
          batch only, candidate buckets are probed batch-vs-index (the
          old×old quadratic term never exists), and exact verification
          re-shingles only pair participants;
  merge   append the batch's signatures to the table for day N+1.

The result is provably the full-batch `minhash_lsh_pairs` restricted
to pairs touching the batch (differential pytest in
tests/test_extensions.py); BASELINE.md records the measured costs.

Run standalone: ``python examples/incremental_ingest_dedup.py``
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def _day0_corpus(spark: SparkSession) -> DataFrame:
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet forest until the morning light arrives"
    )
    rows = [
        (1, base),
        (2, base.replace("quiet", "silent")),
        (3, "an entirely unrelated document about catalyst planning"),
        (4, "another unrelated document about shuffle partitioning"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _day1_batch(spark: SparkSession) -> DataFrame:
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet forest until the morning light arrives"
    )
    rows = [
        (10, base),                                  # re-crawl of doc 1
        (11, base.replace("morning", "evening")),    # near-dup
        (12, "a genuinely new document about watermark semantics"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.dedup import (
        incremental_lsh_pairs, minhash_signatures,
    )

    sig_kw = dict(n=5, num_hashes=64)
    sig_dir = os.path.join(tempfile.mkdtemp(prefix="sig_table_"), "sigs")

    # ---- day 0: persist the corpus signature table once
    corpus = _day0_corpus(spark)
    minhash_signatures(corpus, "text", "doc_id", **sig_kw).write.parquet(
        sig_dir
    )

    # ---- day 1: probe the batch against the persisted index
    batch = _day1_batch(spark)
    ingest = corpus.select("doc_id", "text").withColumn(
        "is_new", F.lit(False)
    ).unionByName(
        batch.select("doc_id", "text").withColumn("is_new", F.lit(True))
    )
    leaks = incremental_lsh_pairs(
        ingest, "text", "doc_id", F.col("is_new"),
        bands=16,
        threshold=0.6,
        corpus_sigs=spark.read.parquet(sig_dir),
        **sig_kw,
    )

    # ---- merge: append batch signatures for tomorrow's run
    minhash_signatures(batch, "text", "doc_id", **sig_kw).write.mode(
        "append"
    ).parquet(sig_dir)

    # every pair touches the batch; doc 10 duplicates corpus doc 1
    return leaks.orderBy("id_a", "id_b")


if __name__ == "__main__":
    session = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    main(session).show(truncate=False)
