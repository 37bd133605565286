"""One-off audit: run EVERY registered query at two shuffle-partition
counts (3 vs 13) and two input-split sizes, diffing stringified
results — the full-registry version of
tests/test_partitioning_invariance.py.  Any mismatch is a latent
driver-hash failure of the class that produced the r2 reds
(order-sensitive float accumulation).

Usage: python scripts/invariance_sweep.py [sf_dir]
Prints one line per mismatching query, then a summary.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from fame2pygen_spark.queries import QUERIES  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def snapshot(spark, name):
    df = QUERIES[name](spark, SF)
    cols = sorted(df.columns)
    rows = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    return cols, rows


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad, err = [], []
    names = list(QUERIES)
    for i, name in enumerate(names):
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            spark.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
            a = snapshot(spark, name)
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
            b = snapshot(spark, name)
            if a != b:
                bad.append(name)
                print(f"MISMATCH {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            err.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
        if (i + 1) % 20 == 0:
            print(f"-- {i + 1}/{len(names)} done", flush=True)
    print(f"SUMMARY checked={len(names)} mismatches={bad} errors={err}")


if __name__ == "__main__":
    main()
