#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock seconds across the headline query set (median
of WARM_RUNS warm runs per query, after one warm-up run that absorbs
JVM/codegen startup).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WARM_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

#: headline set: the heaviest representative op per family — FAME core,
#: panel (entity-partitioned) mode, and the scale extensions
HEADLINE = [
    "flagship_pricing_summary",
    "s01_projection_arithmetic",
    "e06_pct_diff",
    "s08_conditional",
    "s12_chain_index",
    "s13_fishvol",
    "s14_convert_down",
    "s14_convert_business",
    "s11_backcast",
    "s16_first_last",
    "p01_panel_pct",
    "p02_panel_convert",
    "x01_dedup_exact",
    "x03_dedup_minhash_lsh",
    "x05_similarity_topk",
    "x06_text_profile",
    "x10_events_hourly",
    "x11_events_sessions",
]


_SPARK_TMP = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".spark-tmp")
os.makedirs(_SPARK_TMP, exist_ok=True)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("fame2pygen_spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # shuffle/spill temp inside the repo: host /tmp reapers have
        # deleted active blockmgr dirs mid-job (shows up as roaming
        # "temp_shuffle... No such file" stalls)
        .config("spark.local.dir", _SPARK_TMP)
        # keep stderr clean: the driver records the output tail, and
        # console progress bars drown the JSON line in stage spam
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fame2pygen_spark.queries import QUERIES

    sf = None
    tail = os.path.basename(SF_DIR.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            sf = tail

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"),
    )
    from bench_scale import cpu_probe_s, steal_ms_now, warm_read

    timings: dict[str, float] = {}
    probe_start = cpu_probe_s()
    steal0 = steal_ms_now()
    for name in HEADLINE:
        fn = QUERIES[name]
        # untimed warm-read pass (r8 verdict item #2): byte-read the
        # inputs so a host page-cache eviction mid-bench can't land a
        # cold parquet read on the next query's timed runs, then one
        # untimed execution for JIT + file listing
        warm_read(SF_DIR)
        fn(spark, SF_DIR).count()
        runs = []
        for _ in range(WARM_RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)

    total = round(sum(timings.values()), 4)
    result = {
        "metric": "headline_queries_total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # hypervisor steal across the whole headline loop (one number:
        # the final line must stay compact) — r9's +22% elevation was
        # adjudicated from prose; this makes host contention readable
        # from the artifact.  Per-entry detail: BENCH_SCALE.json.
        "steal_ms_total": round(steal_ms_now() - steal0, 1),
        # host-floor spin probe at loop start/end (bench_scale.
        # cpu_probe_s, ~0.22 s healthy): steal alone missed a 3x
        # sustained-degradation session (11.8 core-s steal, 31.6 s
        # total) in the r10 post-close verification — the probe makes
        # that host state readable from the artifact
        "cpu_probe_s": [probe_start, cpu_probe_s()],
    }

    headline_line = json.dumps(result)
    # print the compact headline (~600 B) IMMEDIATELY — if anything
    # kills the process during the long scale tier below, this line is
    # still the last complete one in the driver's tail capture
    print(headline_line, flush=True)

    # scale-validation tier: the heaviest pipeline ops on a 10×
    # replicated corpus (scripts/bench_scale.py).  Printed on its OWN
    # stdout line and mirrored to BENCH_SCALE.json BEFORE the headline
    # line repeats — the driver captures only the tail of stdout and
    # parses the FINAL line, which must stay compact (<1 KB; round 4's
    # combined line outgrew the tail buffer and the headline number was
    # lost).  Only runs at the default sf0.1 tier (at smaller SFs it
    # would measure nothing).
    if os.environ.get("SPARK_GRAFT_SCALE_TIER", "1") != "0" and sf == 0.1:
        try:
            sys.path.insert(
                0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "scripts")
            )
            from bench_scale import run_scale_tier

            scale = run_scale_tier(spark)
        except Exception as exc:  # tier failure must not sink the bench
            scale = {"error": str(exc)[:200]}
        scale_line = json.dumps({"metric": "scale_tier", "queries": scale})
        print(scale_line, flush=True)
        # mirror to a DRIVER-RUN side file — never BENCH_SCALE.json,
        # which is the committed builder-idle protocol artifact
        # (BASELINE.md r8 section: the r7 close accidentally shipped a
        # driver-run tier because this mirror used to clobber it)
        side = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_SCALE_driver.json",
        )
        try:
            with open(side, "w") as fh:
                fh.write(scale_line + "\n")
        except OSError:
            pass

    # FINAL line: the compact headline object again (~600 B) — keep it
    # last and keep it small forever.
    print(headline_line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
