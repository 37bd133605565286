"""NLRX smoothing (reference ``examples/nlrx_example.py``): the one
procedural operator — an HP-trend solve per series via
``applyInPandas``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fame2pygen_spark import run_script

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).parent))
from _data import demo_spark
from _data import monthly_frame

SCRIPT = [
    "freq m",
    "lambda20 = 20",
    "set <date 2019-01-01 to 2021-12-31> b1 = 1",
    "set <date 2019-01-01 to 2021-12-31> b2 = 0",
    "set <date 2019-01-01 to 2021-12-31> b3 = 0",
    "set <date 2019-01-01 to 2021-12-31> b4 = 0",
    "set <date 2019-01-01 to 2021-12-31> c = 0",
    "set <date 2019-01-01 to 2021-12-31> d = 0",
    "gdp_trend = nlrx(lambda20, cpi, b1, b2, b3, b4, c, d)",
]


def main(spark: SparkSession) -> DataFrame:

    res = run_script(monthly_frame(spark), SCRIPT)
    return res.df.select("DATE", "CPI", "GDP_TREND")


if __name__ == "__main__":

    main(demo_spark()).show(12)
