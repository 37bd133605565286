"""Panel mode (no reference analog): one FAME script over a long-format
frame of many independent series — every window partitioned by entity.
This is the 100 TB layout; the demo uses 50 entities, production uses
millions."""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession

from fame2pygen_spark import run_script

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).parent))
from _data import demo_spark

SCRIPT = [
    "freq m",
    "g = pct(v)",
    "trend = v / firstvalue(v) * 100",
    "q = convert(v, q, disc, ave)",
]


def main(spark: SparkSession) -> DataFrame:
    rows = []
    for e in range(50):
        for i in range(24):
            d = date(2020 + i // 12, i % 12 + 1, 1)
            rows.append((f"series_{e:03d}", d, 100.0 + e + 2.0 * i))
    panel = spark.createDataFrame(rows, "ENTITY string, DATE date, V double")
    res = run_script(panel, SCRIPT, entity_cols=("ENTITY",))
    return res.df.select("ENTITY", "DATE", "G", "TREND", "V_QTRLY")


if __name__ == "__main__":

    main(demo_spark()).show(10)
