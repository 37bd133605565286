"""Data sources/sinks.

The reference has no storage layer — the caller supplies the frame
(``/root/reference/README.md:359-364``).  Here: parquet-first readers
for the driver's star schema, plus generic format helpers.  Everything
returns plain DataFrames so filters/projections push into the scan.
"""

from .tables import (  # noqa: F401
    TABLES, load_table, load_tables, wide_ts_frame, write_parquet,
)
