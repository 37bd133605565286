"""Print physical-plan markers for registry queries — the evidence
basis for writing plan-shape pins when retiring PLAN_PIN_EXEMPT
entries (r8 verdict item #4).

Usage: python scripts/probe_plan_markers.py x53_corr x66_ab_test ...
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "MapInPandas",
    "ArrowEvalPython",
    "Generate",
    "Exchange",
)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: probe_plan_markers.py <query_name>...")
    from pyspark.sql import SparkSession

    from fame2pygen_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    for name in names:
        try:
            df = QUERIES[name](spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            found = [m for m in MARKERS if m in plan]
            print(f"{name}: {' '.join(found)}")
        except Exception as exc:  # noqa: BLE001 — survey tool
            print(f"{name}: ERROR {str(exc)[:120]}")
    spark.stop()


if __name__ == "__main__":
    main()
