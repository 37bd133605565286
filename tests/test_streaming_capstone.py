"""Cross-batch proof for the composed streaming ingest pipeline
(examples/streaming_ingest_pipeline.py, r9 verdict item #6): the
stream's three sinks equal the BATCH formulations on the union of all
micro-batches, and stay equal after an at-least-once replay of a
mid-stream batch.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

from pyspark.sql import functions as F

_EX = Path(__file__).parent.parent / "examples"


def _load_pipeline():
    sys.path.insert(0, str(_EX))
    try:
        spec = importlib.util.spec_from_file_location(
            "streaming_ingest_pipeline",
            str(_EX / "streaming_ingest_pipeline.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


def test_streaming_capstone_equals_batch_and_survives_replay(
    spark, tmp_path
):
    mod = _load_pipeline()
    lexicon = {"infra": ["spark", "join"], "quality": ["lorem"]}
    schema = "doc_id long, text string, source string"
    b1 = spark.createDataFrame(
        [
            (1, "spark join spark tuning", "web"),
            (2, "lorem ipsum dolor", "web"),
            (3, "bad \x07 control doc", "web"),        # gated
            (4, "a clean paragraph about rivers", "books"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (5, "another spark join walkthrough", "web"),
            (6, "mojibake � document", "books"),   # gated
            (7, "the river keeps flowing onward", "books"),
        ],
        schema,
    )
    src = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    # maxFilesPerTrigger=1 → at least two micro-batches
    mod.run_pipeline(spark, src, out, lexicon, b1.schema)

    union_gated = mod.byte_gate(b1.unionByName(b2))

    def check_all():
        # 1. doc sink == gated union (batch column is lineage only)
        sunk = spark.read.parquet(f"{out}/docs").select(
            "doc_id", "text", "source"
        )
        assert sorted(map(tuple, sunk.collect())) == sorted(
            map(tuple, union_gated.collect())
        )
        # 2. merged signature state == batch signatures on the union,
        #    bitwise (integer mins through the same affine family)
        got_sigs = {
            (r["source"], r["j"]): r["mh"]
            for r in mod.merged_signatures(spark, out).collect()
        }
        want_sigs = {
            (r["source"], r["j"]): r["mh"]
            for r in mod.source_signatures_long(union_gated).collect()
        }
        assert got_sigs == want_sigs
        assert len(got_sigs) == 2 * 64
        # 3. lexicon totals == the batch aggregation on the union
        from fame2pygen_spark.streaming.core import (
            streaming_lexicon_flag_counts,
        )

        got_lex = {
            (r["source"], r["category"]): (
                r["docs_flagged"], r["total_hits"], r["n_docs"]
            )
            for r in mod.lexicon_totals(spark, out).collect()
        }
        want_lex = {
            (r["source"], r["category"]): (
                r["docs_flagged"], r["total_hits"], r["n_docs"]
            )
            for r in streaming_lexicon_flag_counts(
                union_gated, "text", ("source",), lexicon
            ).collect()
        }
        assert got_lex == want_lex
        # hand-computed spot check: web/infra = docs 1 and 5 flagged,
        # hits 3 (doc 1) + 2 (doc 5), 3 web docs survived the gate
        assert got_lex[("web", "infra")] == (2, 5, 3)

    check_all()

    # at-least-once redelivery: re-run batch 0's handler verbatim —
    # every sink must overwrite its own partition, leaving all three
    # cross-batch views unchanged
    handler = mod.build_foreach_batch(out, lexicon)
    handler(b1, 0)
    check_all()


def test_byte_gate_is_row_local_and_matches_anomaly_profile(spark):
    """The gate keeps exactly the rows the x233 byte-anomaly counters
    would report clean (no control chars, no U+FFFD)."""
    mod = _load_pipeline()
    df = spark.createDataFrame(
        [
            (1, "plain ascii", "s"),
            (2, "utf8 café fine", "s"),       # multibyte is FINE
            (3, "ctrl\x01here", "s"),
            (4, "bad � char", "s"),
            (5, None, "s"),
        ],
        "doc_id long, text string, source string",
    )
    kept = sorted(r["doc_id"] for r in mod.byte_gate(df).collect())
    assert kept == [1, 2]
