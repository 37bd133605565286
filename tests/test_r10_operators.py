"""Hand-computed unit tests for the round-10 changes — independent
of the DuckDB oracles: tiny inputs where the expected output (or the
expected failure) is derived by hand in the test body.
"""

from __future__ import annotations

import pytest


def test_minhash_lsh_pairs_keyed_rejects_conflicting_entity(spark):
    """ADVICE r9: a doc_id appearing under two partition values used
    to be silently scoped to an arbitrary one (dropDuplicates); the
    in-plan guard now raises at execution time instead."""
    from fame2pygen_spark.operators.dedup import minhash_lsh_pairs_keyed

    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, text, "s1"),
        (1, text, "s2"),  # same id, conflicting entity → must raise
        (2, text, "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    with pytest.raises(Exception, match="multiple partition values"):
        minhash_lsh_pairs_keyed(df, "text", "doc_id", "source").collect()


def test_minhash_lsh_pairs_keyed_duplicate_rows_same_entity_ok(spark):
    """The guard keys on DISTINCT (id, entity): repeating the same
    mapping (e.g. an upstream union that duplicated rows) is NOT a
    conflict and still dedups within the entity."""
    from fame2pygen_spark.operators.dedup import minhash_lsh_pairs_keyed

    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, text, "s1"),
        (1, text, "s1"),  # duplicated row, consistent entity — fine
        (2, text, "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = minhash_lsh_pairs_keyed(df, "text", "doc_id", "source").collect()
    assert [(r["id_a"], r["id_b"], r["source"]) for r in out] == [(1, 2, "s1")]
