"""Round-start testdata smoke: the driver regenerates parquet between
rounds and events.ts has flipped physical type before (TIMESTAMP(NANOS)
vs TIMESTAMP(MICROS)).  These assertions run first (alphabetically after
conftest collection ordering doesn't matter — they are cheap) and fail
loudly if a new testdata generation breaks the normalized reader
contract every events-based query depends on."""

from __future__ import annotations

import os

import duckdb
import pytest

from fame2pygen_spark.queries_ext import _read_events

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_events_reader_normalized_schema(spark):
    ev = _read_events(spark, SF_DIR)
    dtypes = dict(ev.dtypes)
    assert dtypes["ts_us"] == "bigint", dtypes
    for col in ("event_id", "user_id"):
        assert dtypes[col] == "bigint", dtypes
    assert dtypes["event_type"] == "string", dtypes
    assert dtypes["value"] == "double", dtypes


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_events_ts_us_matches_duckdb_epoch_us(spark):
    """ts_us must agree with DuckDB's epoch_us EXACTLY (the oracle gate
    compares stringified values — a ±1µs float-division drift fails)."""
    got = (
        _read_events(spark, SF_DIR)
        .orderBy("event_id")
        .limit(50)
        .select("event_id", "ts_us")
        .collect()
    )
    con = duckdb.connect()
    want = con.execute(
        "SELECT event_id, epoch_us(ts) FROM "
        f"read_parquet('{SF_DIR}/events.parquet') ORDER BY event_id LIMIT 50"
    ).fetchall()
    con.close()
    assert [(r.event_id, r.ts_us) for r in got] == [tuple(w) for w in want]


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_core_tables_present(spark):
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        assert os.path.exists(f"{SF_DIR}/{t}.parquet"), t
