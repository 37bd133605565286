#!/usr/bin/env python
"""100×-replica scaling point for a CAPPED QUADRATIC op (r4 verdict
item #6): run MinHash-LSH pair generation on sf0.1 documents
replicated 100× (≈500k docs, every base doc a 100-member near-dup
clique) with the ``max_bucket`` cap ACTIVE and measure

  - wall seconds for the capped pair run,
  - verified pair count,
  - the cap's truncation rate: what fraction of raw bucket
    memberships the deterministic row_number cap drops, and how many
    buckets exceed the cap at all.

This demonstrates the dense-direction bound: with ~100-member
cliques, an uncapped band join would blow up O(clique²)·bands; the
cap keeps per-bucket membership ≤ max_bucket so candidate volume is
O(buckets · cap²) regardless of replica factor.  BASELINE.md's
earlier 100× point covered linear ops only.

Usage (idle machine, no concurrent Spark):
  python scripts/bench_scale100.py            # max_bucket=20
  SPARK_GRAFT_CAP=50 python scripts/bench_scale100.py

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "100"))
CAP = int(os.environ.get("SPARK_GRAFT_CAP", "20"))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SPARK_TMP = os.path.join(_REPO, ".spark-tmp")
os.makedirs(_SPARK_TMP, exist_ok=True)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("fame2pygen_spark-scale100")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", _SPARK_TMP)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    os.environ["SPARK_GRAFT_SCALE_REPLICAS"] = str(REPLICAS)
    import bench_scale

    bench_scale.REPLICAS = REPLICAS
    bench_scale.CORPUS = os.path.join(_REPO, ".scale-corpus", f"{REPLICAS}x")
    docs = bench_scale.build_corpus(spark)
    n_docs = docs.count()

    from fame2pygen_spark.operators import dedup as dd

    # --- capped pair run (the measured quantity) ---
    # untimed warm-read pass first (r9 protocol — see bench_scale)
    bench_scale.warm_read(bench_scale.CORPUS, SF_DIR)
    t0 = time.perf_counter()
    n_pairs = dd.minhash_lsh_pairs(
        docs, "text", "doc_id", n=5, num_hashes=64, bands=16,
        threshold=0.6, max_bucket=CAP,
    ).count()
    wall = round(time.perf_counter() - t0, 2)

    # --- truncation audit: raw bucket sizes BEFORE the cap ---
    # (same signature + banding path, cap disabled via a huge bound)
    sigs = dd.minhash_signatures(
        docs, "text", "doc_id", n=5, num_hashes=64
    )
    raw = dd._banded_buckets(sigs, 64, 16, max_bucket=1 << 60)
    stats = (
        raw.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.sum("sz").alias("memberships"),
            F.sum(F.greatest(F.col("sz") - CAP, F.lit(0))).alias("dropped"),
            F.sum((F.col("sz") > CAP).cast("long")).alias("over_cap"),
            F.count(F.lit(1)).alias("buckets"),
            F.max("sz").alias("max_bucket_size"),
        )
        .collect()[0]
    )
    trunc_rate = (
        float(stats["dropped"]) / float(stats["memberships"])
        if stats["memberships"]
        else 0.0
    )

    print(
        json.dumps(
            {
                "metric": "x03_capped_100x",
                "replicas": REPLICAS,
                "n_docs": n_docs,
                "max_bucket": CAP,
                "wall_sec": wall,
                "verified_pairs": n_pairs,
                "buckets": stats["buckets"],
                "buckets_over_cap": stats["over_cap"],
                "max_bucket_size": stats["max_bucket_size"],
                "memberships": stats["memberships"],
                "memberships_dropped": stats["dropped"],
                "truncation_rate": round(trunc_rate, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
