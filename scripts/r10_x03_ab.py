#!/usr/bin/env python
"""A/B harness for the minhash_lsh_pairs restructure (round 10).

Variants (all MUST produce byte-identical (id_a, id_b, jaccard) sets):

  v0  current operator (dedup.minhash_lsh_pairs)
  v1  v0 + id-notnull prefilter on the input frame, so the banding
      branch and the candidate-join branches canonicalize identically
      and AQE's stage cache reuses one signature exchange (guide §2.4:
      remove shuffles outright / share one exchange).
  v2  single-pass formulation: ONE explode+md5 aggregation computing
      the 64 mins AND collect_set(shingles), localCheckpoint'ed
      (eager), then banding/prefilter/verify all read the
      materialized frame (guide §8: decide on small rows, move heavy
      bytes once — here: hash the corpus once).

Usage: python scripts/r10_x03_ab.py [time|check] [v0 v1 v2 ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("RUNS", "3"))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from fame2pygen_spark.operators import dedup as dd  # noqa: E402


def v0(docs):
    return dd.minhash_lsh_pairs(
        docs, "text", "doc_id", n=5, num_hashes=64, bands=16, threshold=0.6
    )


def v1(docs):
    return dd.minhash_lsh_pairs(
        docs.where(F.col("doc_id").isNotNull()),
        "text", "doc_id", n=5, num_hashes=64, bands=16, threshold=0.6,
    )


def _v2_impl(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    df = dd._parallelize_input(df.where(F.col(id_col).isNotNull()))
    exploded = dd.exploded_shingles(df, text_col, id_col, n).withColumn(
        "h", dd.shingle_hash(F.col("s"))
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(dd.MERSENNE_31)).alias(f"mh{j}")
        for j, (a, b) in enumerate(dd._affine_params(num_hashes, seed))
    ]
    sigs_sh = (
        exploded.groupBy("doc")
        .agg(*aggs, F.collect_set("s").alias("sh"))
        .localCheckpoint(eager=True)
    )
    sigs = sigs_sh.select("doc", *[f"mh{j}" for j in range(num_hashes)])
    banded = dd._banded_buckets(sigs, num_hashes, bands, max_bucket)
    left = banded.select("band", "bh", F.col("doc").alias("id_a"))
    right = banded.select("band", "bh", F.col("doc").alias("id_b"))
    cand = (
        left.join(right, on=["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    min_match = dd.min_sig_matches(threshold, num_hashes)
    packed = sigs_sh.select(
        "doc",
        F.array(*[F.col(f"mh{j}") for j in range(num_hashes)]).alias("sig"),
        "sh",
    )
    matches = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    )
    out = (
        cand.join(
            packed.select(F.col("doc").alias("id_a"),
                          F.col("sig").alias("sig_a"),
                          F.col("sh").alias("sh_a")),
            on="id_a",
        )
        .join(
            packed.select(F.col("doc").alias("id_b"),
                          F.col("sig").alias("sig_b"),
                          F.col("sh").alias("sh_b")),
            on="id_b",
        )
        .where(matches >= min_match)
        .withColumn(
            "jaccard", F.round(dd.jaccard_arrays(F.col("sh_a"), F.col("sh_b")), 6)
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
    return out


def v2(docs):
    return _v2_impl(docs, "text", "doc_id")


VARIANTS = {"v0": v0, "v1": v1, "v2": v2}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or list(VARIANTS)

    from pyspark.sql import SparkSession

    from bench_scale import steal_ms_now, warm_read

    tmp = os.path.join(_REPO, ".spark-tmp")
    os.makedirs(tmp, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r10-x03-ab")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.local.dir", tmp)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    if mode == "check":
        base = sorted(
            (r.id_a, r.id_b, r.jaccard) for r in VARIANTS["v0"](docs).collect()
        )
        print(f"v0 rows={len(base)}")
        for name in names:
            if name == "v0":
                continue
            got = sorted(
                (r.id_a, r.id_b, r.jaccard) for r in VARIANTS[name](docs).collect()
            )
            print(f"{name}: rows={len(got)} identical={got == base}")
    else:
        for name in names:
            fn = VARIANTS[name]
            spark.sparkContext.setJobDescription(f"x03-ab:{name}")
            warm_read(SF_DIR)
            fn(docs).write.format("noop").mode("overwrite").save()
            ts, s0 = [], steal_ms_now()
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            print(
                f"{name}: median={statistics.median(ts):.3f} min={min(ts):.3f} "
                f"runs={[round(t, 3) for t in ts]} steal_ms={steal_ms_now() - s0:.0f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
