"""Round-7 extension queries (x334+): baseline-JPEG ingest and the
round's later operator families.

Same contract as :mod:`fame2pygen_spark.queries_ext`: every query is
``(spark, sf_dir) -> DataFrame`` with column names/types matching its
ANSI-SQL DuckDB oracle exactly (driver compare = exact stringified
value hash after sorting columns by name).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

EXT16_QUERIES: dict = {}
EXT16_ORACLES: dict = {}


# ------------------------- x334: baseline JPEG decode → perceptual hash

_JPEG_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def q_x334_jpeg_ahash(spark, sf_dir):
    """REAL baseline-JPEG decode end to end
    (operators/multimodal.py:_decode_jpeg → image_ahash): each
    document's deterministic 8×8 fingerprint (same pixel definition as
    x84/x300) becomes a 64×64 image of flat 8×8 blocks encoded as a
    genuine entropy-coded baseline JPEG inside Arrow-batched
    ``mapInPandas`` — huffman DC/AC coding with differential DC
    prediction across 64 blocks, 0xFF byte stuffing, the frame variant
    rotating grayscale / YCbCr 4:4:4 / YCbCr 4:2:0 (MCU-interleaved,
    chroma subsampled) by ``doc_id % 3`` and every fifth document
    adding DRI + RSTn restart markers.  DC-only blocks at quant step 8
    make the decode bit-exact (IDCT of a pure-DC block is ``dc·q/8``,
    exact in float64), so the oracle derives the hash arithmetically
    from the pixel definition without ever seeing the bytes: an exact
    match proves huffman encode → unstuff → huffman decode → dequant →
    IDCT → upsample → color-convert → thumbnail → hash is lossless for
    all three frame layouts.  Closes the reference's last declared
    media-codec gap (reference shells out to a codec library; here the
    codec is stdlib+numpy inside the operator)."""
    from .operators.multimodal import encode_jpeg_bytes, image_ahash
    from .queries_ext2 import _ahash_pixel_counts_spark

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nt = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array(*_ahash_pixel_counts_spark(nt)).alias("px"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id, px in zip(pdf["doc_id"], pdf["px"]):
                blocks = np.asarray(list(px), dtype=np.uint8).reshape(8, 8)
                mode = ("gray", "ycbcr444", "ycbcr420")[int(doc_id) % 3]
                ri = 2 if int(doc_id) % 5 == 0 else 0
                payloads.append(
                    encode_jpeg_bytes(blocks, mode=mode, restart_interval=ri)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    with_jpg = staged.mapInPandas(encode, schema=_JPEG_PAYLOAD_SCHEMA)
    return image_ahash(with_jpg, "doc_id", "payload")


def _sql_x334() -> str:
    # identical pixel definition to x84 — the hash is a pure function
    # of the 64 fingerprint bytes; only the reported dimensions differ
    # (the JPEG carries a 64×64 image of flat 8×8 blocks, and the
    # nearest-neighbor 8×8 thumbnail lands on each block's top-left).
    from .queries_ext2 import _sql_x84

    sql = _sql_x84()
    out = sql.replace("CAST(8 AS INTEGER)", "CAST(64 AS INTEGER)")
    assert out.count("CAST(64 AS INTEGER)") == 2, "x84 oracle shape changed"
    return out


EXT16_QUERIES.update({"x334_jpeg_ahash": q_x334_jpeg_ahash})
EXT16_ORACLES.update({"x334_jpeg_ahash": _sql_x334()})
