"""Business-day frequency (reference
``examples/business_day_frequency_example.py``): interpolate a monthly
indicator to business days and difference it."""

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
    "vbot = 1",
    "daily_gdp = convert(monthly_gdp, b, linear, end)",
    "growth = daily_gdp - daily_gdp[t-1]",
]


def main(spark: SparkSession) -> DataFrame:

    res = run_script(monthly_frame(spark), SCRIPT)
    return res.df.where("MONTHLY_GDP_BUSD is not null").select(
        "DATE", "MONTHLY_GDP_BUSD", "GROWTH"
    )


if __name__ == "__main__":

    main(demo_spark()).show(10)
