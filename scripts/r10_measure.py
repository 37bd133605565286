#!/usr/bin/env python
"""Round-10 optimization measurement harness (guide §1).

Two modes, both over the registry queries:

  explain:  capture .explain("formatted") per query to
            plans/r10/<query>_<tag>.txt  (tag = before|after)
  time:     isolate each query with the noop sink
            (df.write.format("noop")) — times the computation, not the
            sink — N runs, report median/min plus /proc/stat steal
            delta so host contention is visible per entry.

Usage:
  python scripts/r10_measure.py explain before x03_dedup_minhash_lsh ...
  python scripts/r10_measure.py time x03_dedup_minhash_lsh ...
  python scripts/r10_measure.py time --runs 5 HEADLINE

The session mirrors bench.py's conf exactly (master local[$SPARK_GRAFT_CPUS],
shuffle.partitions=$CPUS, AQE on) so plans and timings match the bench.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
_SPARK_TMP = os.path.join(_REPO, ".spark-tmp")
os.makedirs(_SPARK_TMP, exist_ok=True)

HEADLINE = [
    "flagship_pricing_summary", "s01_projection_arithmetic",
    "e06_pct_diff", "s08_conditional", "s12_chain_index", "s13_fishvol",
    "s14_convert_down", "s14_convert_business", "s11_backcast",
    "s16_first_last", "p01_panel_pct", "p02_panel_convert",
    "x01_dedup_exact", "x03_dedup_minhash_lsh", "x05_similarity_topk",
    "x06_text_profile", "x10_events_hourly", "x11_events_sessions",
]


def _session():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r10-measure")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.local.dir", _SPARK_TMP)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    runs = 3
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    if mode in ("explain", "final"):
        tag, names = args[0], args[1:]
    else:
        tag, names = "", args
    if names == ["HEADLINE"]:
        names = HEADLINE

    from fame2pygen_spark.queries import QUERIES

    from bench_scale import steal_ms_now, warm_read

    spark = _session()

    if mode in ("explain", "final"):
        outdir = os.path.join(_REPO, "plans", "r10")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, SF_DIR)
            if mode == "final":
                df.collect()  # finalize the adaptive plan
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            n_exch = txt.count("Exchange")
            n_py = txt.count("EvalPython") + txt.count("MapInArrow") + txt.count("MapInPandas")
            joins = [
                j for j in ("BroadcastHashJoin", "SortMergeJoin",
                            "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                            "CartesianProduct")
                if j in txt
            ]
            print(f"{name}: exchanges={n_exch} python={n_py} joins={joins} -> {path}")
    elif mode == "time":
        results = {}
        for name in names:
            fn = QUERIES[name]
            spark.sparkContext.setJobDescription(f"r10:{name}")
            warm_read(SF_DIR)
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts, s0 = [], steal_ms_now()
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            results[name] = {
                "median": round(statistics.median(ts), 4),
                "min": round(min(ts), 4),
                "runs": [round(t, 4) for t in ts],
                "steal_ms": round(steal_ms_now() - s0, 1),
            }
            print(json.dumps({name: results[name]}), flush=True)
        total = round(sum(r["median"] for r in results.values()), 4)
        print(json.dumps({"total_median": total}))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
