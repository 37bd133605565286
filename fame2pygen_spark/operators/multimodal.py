"""Multimodal column handling: images/audio/video as opaque binary.

Convention: a multimodal asset is a ``binary`` payload column plus a
typed metadata struct::

    payload  binary
    media    struct<kind string, mime string, n_bytes long,
                    width int, height int, sample_rate int,
                    duration_ms long>

The Spark-side plumbing here is real and tested — schemas, Arrow batch
shape, ``mapInPandas`` partition flow, metadata extraction in pure
column algebra.  The actual codec work (JPEG decode, resampling, frame
sampling) is STUBBED: this container has no image/audio libraries, so
the decode hook either raises ``NotImplementedError`` or runs a
clearly-marked deterministic fake that derives pixel statistics from
the payload bytes.  Swap ``decode_fn`` for a real decoder (PIL/ffmpeg)
in production; the pipeline shape does not change.

Scale notes: payloads never pass through Python row-at-a-time — binary
columns travel as Arrow buffers into ``mapInPandas`` batches; metadata
probing (magic bytes, sizes) stays JVM-side so filters on media type
push down to the parquet scan without touching payload bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

#: magic-byte prefixes → (kind, mime); pure column-side sniffing
_MAGIC = [
    ("ffd8ff", "image", "image/jpeg"),
    ("89504e47", "image", "image/png"),
    ("47494638", "image", "image/gif"),
    ("52494646", "audio", "audio/wav"),  # RIFF
    ("494433", "audio", "audio/mpeg"),   # ID3
    ("1a45dfa3", "video", "video/webm"),
]


def sniff_media(payload: Column) -> Column:
    """JVM-side media-type sniffing from magic bytes → (kind, mime)
    struct; no payload decode, no Python."""
    head = F.lower(F.hex(F.substring(payload, 1, 8)))
    kind = F.lit("unknown")
    mime = F.lit("application/octet-stream")
    for prefix, k, m in reversed(_MAGIC):
        is_match = head.startswith(prefix.upper()) | head.startswith(prefix)
        kind = F.when(is_match, F.lit(k)).otherwise(kind)
        mime = F.when(is_match, F.lit(m)).otherwise(mime)
    return F.struct(kind.alias("kind"), mime.alias("mime"))


def attach_media_metadata(df: DataFrame, payload_col: str) -> DataFrame:
    """Append the ``media`` struct from payload bytes (columnar only)."""
    payload = F.col(payload_col)
    sniffed = sniff_media(payload)
    return df.withColumn(
        "media",
        F.struct(
            sniffed["kind"].alias("kind"),
            sniffed["mime"].alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _stub_decode(payload: bytes) -> dict:
    """Deterministic fake decoder — byte statistics standing in for
    pixel statistics.  Replace with a real codec in production."""
    if not payload:
        return {"mean_byte": 0.0, "n_bytes": 0}
    return {
        "mean_byte": sum(payload) / len(payload),
        "n_bytes": len(payload),
    }


FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", StringType()),
    ]
)


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], dict] | None = None,
    batch_note: bool = False,
) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    Arrow moves payload batches to Python whole-column; *decode_fn*
    runs per asset inside the batch.  Default decode is the
    deterministic stub; pass a real decoder for production.
    """
    decode = decode_fn or _stub_decode
    names = [id_col, payload_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p)) if p is not None else _stub_decode(b"")
                     for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "mean_byte": [f"{f['mean_byte']:.6f}" for f in feats],
                }
            )

    return df.select(*names).mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_image(payload: Column) -> Column:  # pragma: no cover - stub
    """Real image decode requires a codec library not present in this
    container."""
    raise NotImplementedError(
        "image decoding needs PIL/opencv — not available here; use "
        "extract_features(decode_fn=...) with a real decoder in production"
    )


def frame_sample(payload: Column, every_ms: int) -> Column:  # pragma: no cover
    """Video frame sampling stub (needs ffmpeg)."""
    raise NotImplementedError("video frame sampling needs ffmpeg bindings")
