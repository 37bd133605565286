from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import SparkSession

# spark temp inside the repo: host /tmp reapers have deleted active
# blockmgr shuffle dirs mid-job (see scripts/bench_scale.py)
_SPARK_TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".spark-tmp"
)
os.makedirs(_SPARK_TMP, exist_ok=True)


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("fame2pygen_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.local.dir", _SPARK_TMP)
        .getOrCreate()
    )
    yield spark
    spark.stop()


def month_starts(start: dt.date, n: int) -> list[dt.date]:
    out = []
    y, m = start.year, start.month
    for _ in range(n):
        out.append(dt.date(y, m, 1))
        m += 1
        if m > 12:
            m = 1
            y += 1
    return out


@pytest.fixture()
def ts_monthly(spark):
    """F1 fixture from FIXTURES.md — 120 monthly rows, deterministic."""
    import math

    dates = month_starts(dt.date(2015, 1, 1), 120)
    rows = []
    for i, d in enumerate(dates):
        rows.append(
            (
                d,
                100.0 + 2.0 * i,                 # A
                50.0 * math.sin(i / 6.0) + 60.0,  # B
                (i * 37 % 200) * 1.0,             # C (deterministic "uniform")
                float(i * i % 97),                # D
                (i * 13 % 20) * 1.0,              # X
                100.0 + i,                        # Y
                0.0,                              # Z
                40.0 + (i * 7 % 80),              # PRICE
                1.0 + (i % 12),                   # QUANTITY
                float(d.year),                    # YEAR
            )
        )
    return spark.createDataFrame(
        rows,
        "DATE date, A double, B double, C double, D double, X double, "
        "Y double, Z double, PRICE double, QUANTITY double, YEAR double",
    )
