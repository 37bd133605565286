#!/usr/bin/env python
"""Round-11 optimization measurement harness (guide §1).

Modes (over the registry queries):

  explain:  capture .explain("formatted") per query to
            plans/r11/<query>_<tag>.txt  (tag = before|after)
  final:    same, after a collect() so the AQE final plan is captured
  time:     isolate each query with the noop sink — N runs, median/min,
            plus /proc/stat steal delta and a cpu spin probe per entry
            so host contention is readable per entry (this host is
            frequently degraded 1.5-3x with quiet steal counters).
  stages:   run the query once on the noop sink, then dump PER-STAGE
            metrics from the AppStatusStore (task time, input bytes,
            shuffle read/write bytes+records, stage name) and the job
            count — deterministic plan-cost evidence that does not
            depend on the host's wall clock.

Usage:
  python scripts/r11_measure.py explain before x03_dedup_minhash_lsh ...
  python scripts/r11_measure.py time --runs 5 x03_dedup_minhash_lsh
  python scripts/r11_measure.py stages x03_dedup_minhash_lsh

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
        .appName("r11-measure")
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


def _stage_list(spark):
    """AppStatusStore.stageList with explicit defaults (py4j cannot see
    Scala default args): (statuses, details, withSummaries, quantiles,
    taskStatus)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    quantiles = sc._gateway.new_array(jvm.double, 0)
    return store.stageList(empty, False, False, quantiles,
                           jvm.java.util.ArrayList())


def _stage_dump(spark, since_stage: int) -> list[dict]:
    """Per-stage metrics from the AppStatusStore (works with UI off)."""
    stages = _stage_list(spark)
    out = []
    for i in range(stages.size()):
        s = stages.apply(i)
        if s.stageId() < since_stage:
            continue
        out.append(
            {
                "stage": s.stageId(),
                "name": str(s.name())[:80],
                "tasks": s.numCompleteTasks(),
                "run_ms": s.executorRunTime(),
                "cpu_ms": s.executorCpuTime() // 1_000_000,
                "input_mb": round(s.inputBytes() / 1e6, 1),
                "sh_read_mb": round(s.shuffleReadBytes() / 1e6, 2),
                "sh_read_rows": s.shuffleReadRecords(),
                "sh_write_mb": round(s.shuffleWriteBytes() / 1e6, 2),
                "sh_write_rows": s.shuffleWriteRecords(),
            }
        )
    return sorted(out, key=lambda d: -d["run_ms"])


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

    from bench_scale import cpu_probe_s, steal_ms_now, warm_read

    spark = _session()

    if mode in ("explain", "final"):
        outdir = os.path.join(_REPO, "plans", "r11")
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
            spark.sparkContext.setJobDescription(f"r11:{name}")
            warm_read(SF_DIR)
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts, s0, p0 = [], steal_ms_now(), cpu_probe_s()
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            results[name] = {
                "median": round(statistics.median(ts), 4),
                "min": round(min(ts), 4),
                "runs": [round(t, 4) for t in ts],
                "steal_ms": round(steal_ms_now() - s0, 1),
                "probe_s": [p0, cpu_probe_s()],
            }
            print(json.dumps({name: results[name]}), flush=True)
        total = round(sum(r["median"] for r in results.values()), 4)
        print(json.dumps({"total_median": total}))
    elif mode == "stages":
        for name in names:
            fn = QUERIES[name]
            spark.sparkContext.setJobDescription(f"r11-stages:{name}")
            warm_read(SF_DIR)
            # one warm pass so codegen/broadcast caches are hot, then a
            # marked pass whose stages we attribute
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            sc = spark.sparkContext._jsc.sc()
            # stage ids are global+monotonic: snapshot the max seen so far
            probe_stage = _stage_list(spark)
            max_stage = -1
            for i in range(probe_stage.size()):
                max_stage = max(max_stage, probe_stage.apply(i).stageId())
            j0 = sc.dagScheduler().nextJobId()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            j1 = sc.dagScheduler().nextJobId()
            dump = _stage_dump(spark, max_stage + 1)
            print(json.dumps({
                "query": name, "wall_s": round(wall, 3), "jobs": j1 - j0,
                "probe_s": cpu_probe_s(),
            }))
            for d in dump:
                print("  " + json.dumps(d))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
