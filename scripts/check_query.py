"""Ad-hoc strict parity check for one or more registry queries.

Usage: python scripts/check_query.py x72_prefix_jaccard [more...]
Runs the Spark query and its DuckDB oracle at sf0.01 (override with
SPARK_GRAFT_TEST_SF) and applies the driver's exact compare: sort
columns by name, stringify every value, compare row-by-row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from fame2pygen_spark.queries import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    data = [tuple(row[i] for i in order) for row in rows]
    data.sort(key=lambda r: [(v is None, str(v)) for v in r])
    return [columns[i] for i in order], data


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: check_query.py <query_name>...")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("check_query")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    failed = False
    for name in names:
        sdf = QUERIES[name](spark, SF_DIR)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        rel = con.execute(ORACLES[name])
        o_cols = [d[0] for d in rel.description]
        o_rows = rel.fetchall()
        sc, sr = normalize(s_rows, s_cols)
        oc, orr = normalize(o_rows, o_cols)
        ok = True
        if sc != oc:
            print(f"{name}: SCHEMA mismatch spark={sc} oracle={oc}")
            ok = False
        elif len(sr) != len(orr):
            print(f"{name}: ROWS mismatch spark={len(sr)} oracle={len(orr)}")
            ok = False
        else:
            for i, (a, b) in enumerate(zip(sr, orr)):
                sa = [str(v) for v in a]
                sb = [str(v) for v in b]
                if sa != sb:
                    print(f"{name}: VALUE mismatch row {i}:")
                    print("  spark :", sa)
                    print("  oracle:", sb)
                    ok = False
                    break
        if ok:
            print(f"{name}: OK ({len(sr)} rows, cols={sc})")
        failed = failed or not ok
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
