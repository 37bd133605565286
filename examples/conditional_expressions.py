"""Conditionals and ``nd`` (reference
``examples/conditional_expression_example.py``)."""

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
    "base_value = 100",
    "threshold = 150",
    "result1 = if base_value gt 100 then base_value * 2 else nd",
    "result2 = if threshold ge 150 then base_value * 1.5 else base_value",
    "price = 50",
    "quantity = 10",
    "adjusted_total = if price lt 100 then price * quantity "
    "else price * quantity * 1.1",
    "signal = if cpi gt 60 and monthly_gdp gt 120 then 1 else 0",
]


def main(spark: SparkSession) -> DataFrame:

    res = run_script(monthly_frame(spark), SCRIPT)
    return res.df.select(
        "DATE", "RESULT1", "RESULT2", "ADJUSTED_TOTAL", "SIGNAL"
    )


if __name__ == "__main__":

    main(demo_spark()).show(10)
