"""Crawl → corpus: the front half of the pretraining pipeline, from
raw WARC blobs to deduplicated, quality-scored documents — the stage
BEFORE examples/pretraining_pipeline.py takes over.

  split      Arrow record splitter over binaryFile-shaped blobs
             (`sources/warc.warc_documents`): one row per HTTP
             response, HTML stripped to text by the same algebra the
             JVM scan lane uses
  gate       status == 200, content-type html, non-empty text
  profile    `text_profile` quality + language over the extracted
             text — the gate a crawl actually applies before paying
             for dedup
  dedup      exact dedup on the normalized text fingerprint (the
             MinHash near-dup stage runs corpus-wide later; at ingest
             the cheap exact pass kills re-crawls)

At 100 TB: WARC segments are per-record-gzip (unsplittable), so the
split stage parallelizes by FILE — tens of thousands of ~1 GB
segments — and everything after the text column exists is ordinary
scan-stage column algebra.

Run standalone: ``python examples/warc_to_corpus.py``
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _demo_blobs(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.sources.warc import build_warc, http_response

    def page(body: str) -> bytes:
        return (
            "<html><head><script>track()</script></head><body><p>"
            + _html.escape(body) + "</p></body></html>"
        ).encode()

    docs = [
        ("https://a.example/1", "the quick brown fox jumps over the dog"),
        ("https://a.example/2", "an entirely different page about rivers"),
        ("https://b.example/1", "the quick brown fox jumps over the dog"),
        ("https://b.example/err", None),  # 404 — gated out
    ]
    recs = [(
        {"WARC-Type": "warcinfo", "WARC-Date": "2026-01-01T00:00:00Z"},
        b"software: demo\r\n",
    )]
    for uri, body in docs:
        if body is None:
            recs.append((
                {"WARC-Type": "response", "WARC-Target-URI": uri,
                 "WARC-Date": "2026-01-01T00:00:00Z"},
                http_response(b"gone", status=404),
            ))
        else:
            recs.append((
                {"WARC-Type": "response", "WARC-Target-URI": uri,
                 "WARC-Date": "2026-01-01T00:00:00Z"},
                http_response(page(body)),
            ))
    return spark.createDataFrame(
        [(0, build_warc(recs[:3], gzip_per_record=True)),
         (1, build_warc([recs[0]] + recs[3:], gzip_per_record=False))],
        "segment long, blob binary",
    )


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.dedup import text_fingerprint
    from fame2pygen_spark.operators.text import text_profile
    from fame2pygen_spark.sources.warc import warc_documents

    blobs = _demo_blobs(spark)
    responses = warc_documents(blobs, "blob", id_cols=("segment",))
    gated = responses.where(
        (F.col("status") == 200)
        & F.col("content_type").contains("html")
        & (F.length(F.trim("text")) > 0)
    )
    with_id = gated.withColumn(
        "doc_id", F.xxhash64("uri")
    )
    prof = text_profile(with_id, "text").select(
        "doc_id", "quality", "lang_pred"
    )
    scored = with_id.join(prof, on="doc_id")
    # exact dedup: first URI (lexicographic) survives per fingerprint
    deduped = (
        scored.withColumn("fp", text_fingerprint(F.col("text")))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("uri")),
        )
        .where(F.col("rn") == 1)
        .select("uri", "segment", "quality", "lang_pred", "text")
        .orderBy("uri")
    )
    return deduped


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sp = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sp.sparkContext.setLogLevel("ERROR")
    main(sp).show(truncate=60)
    sp.stop()
