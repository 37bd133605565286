"""Math functions under date windows (reference
``examples/sqrt_and_date_filtering_example.py``)."""

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
    "date 2020-01-01 to 2020-12-31",
    "vol = sqrt(abs(cpi - 60))",
    "date *",
    "logged = log(monthly_gdp)",
    "combo = lsum(vol, sqrt(cpi))",
]


def main(spark: SparkSession) -> DataFrame:

    res = run_script(monthly_frame(spark), SCRIPT)
    return res.df.select("DATE", "VOL", "LOGGED", "COMBO")


if __name__ == "__main__":

    main(demo_spark()).show(15)
