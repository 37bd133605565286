"""Date-window scoping (reference ``examples/date_filtering_example.py``
and ``date_range_subsetting_example.py``): assignments apply only inside
the active window; outside, prior values persist (or null for new
columns)."""

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
    "v_base = 100",
    "date 2020-01-01 to 2020-12-31",
    "v_2020 = v_base * 1.1",
    "v_2020_adj = v_2020 + 10",
    "date *",
    "v_all = v_2020_adj / 2",
    "date 2021-01-01 to 2021-12-31",
    "v_2021 = v_all * 1.2",
]


def main(spark: SparkSession) -> DataFrame:

    res = run_script(monthly_frame(spark), SCRIPT)
    return res.df.select("DATE", "V_2020", "V_2020_ADJ", "V_ALL", "V_2021")


if __name__ == "__main__":

    main(demo_spark()).show(30)
