"""Round-5 extension queries (x300+): compressed-codec ingest and the
round's new operator families.

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

EXT13_QUERIES: dict = {}
EXT13_ORACLES: dict = {}


# ----------------------------- x300: PNG decode → perceptual hash

_PNG_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def q_x300_png_ahash(spark, sf_dir):
    """REAL PNG decode end to end (operators/multimodal.py:_decode_png
    → image_ahash): each document's deterministic 8×8 grayscale
    fingerprint (same pixel definition as x84's BMP path) is encoded
    as a genuine zlib-compressed PNG inside an Arrow-batched
    ``mapInPandas`` stage — color type rotating gray/RGB/RGBA by
    ``doc_id % 3`` and the scanline filter cycling through all five
    PNG filter types — then the operator inflates, unfilters and
    hashes those bytes.  The oracle never sees the bytes: it derives
    the hash arithmetically from the pixel definition, so an exact
    match proves the PNG encode → inflate → unfilter → thumbnail →
    hash pipeline is lossless for every filter type and color type."""
    from .operators.multimodal import encode_png_bytes, image_ahash
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
                gray = np.asarray(list(px), dtype=np.uint8).reshape(8, 8)
                color_type = (0, 2, 6)[int(doc_id) % 3]
                payloads.append(
                    encode_png_bytes(
                        gray, color_type=color_type, filter_mode="cycle"
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    with_png = staged.mapInPandas(encode, schema=_PNG_PAYLOAD_SCHEMA)
    return image_ahash(with_png, "doc_id", "payload")


def _sql_x300() -> str:
    # identical pixel definition to x84 — the hash is a pure function
    # of the 64 fingerprint bytes, so the SQL side is byte-layout-free
    from .queries_ext2 import _sql_x84

    return _sql_x84()


EXT13_QUERIES.update({"x300_png_ahash": q_x300_png_ahash})
EXT13_ORACLES.update({"x300_png_ahash": _sql_x300()})
