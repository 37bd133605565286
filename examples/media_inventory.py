"""Mixed-format media inventory: the full pure-Python codec suite in
one pipeline — decode → dimensions → perceptual hash → near-dup
grouping over a corpus that mixes EVERY implemented container:

    BMP, binary PPM, PNG, baseline JPEG (gray / 4:4:4 / 4:2:0 with
    restart markers), PROGRESSIVE JPEG (spectral selection +
    successive approximation), and lossless WebP (VP8L with
    subtract-green / predictor / palette / color-cache / LZ77 /
    meta-prefix variants)

plus two payloads that stay behind the declared codec boundary (lossy
WebP, a truncated stream) to show the needs-codec lane.  The same
8×8 source image round-trips through every codec, so all decodable
variants land in ONE aHash group — format-independent near-dup
detection, which is exactly what a multimodal ingest pipeline wants
("this PNG and that WebP are the same asset").

All decode work is Arrow-batched ``mapInPandas``
(operators/multimodal.py:image_ahash); nothing is per-row Python UDF,
nothing collects pixels to the driver.

Run standalone: ``python examples/media_inventory.py``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _payloads():
    import numpy as np

    from fame2pygen_spark.operators.multimodal import (
        encode_jpeg_bytes,
        encode_progressive_jpeg_bytes,
    )
    from fame2pygen_spark.operators.webp import encode_webp_lossless

    rng = np.random.RandomState(21)
    # one shared 8x8 source asset + one distinct asset
    a = rng.randint(0, 256, size=(8, 8)).astype(np.uint8)
    b = rng.randint(0, 256, size=(8, 8)).astype(np.uint8)

    def bmp(gray):
        # 8x8 24bpp bottom-up BMP of the gray image
        import struct

        h, w = gray.shape
        stride = ((w * 3 + 3) // 4) * 4
        pix = bytearray()
        for y in range(h - 1, -1, -1):
            row = bytearray()
            for x in range(w):
                row += bytes([int(gray[y, x])] * 3)
            row += b"\x00" * (stride - len(row))
            pix += row
        head = struct.pack(
            "<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54
        ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                        2835, 2835, 0, 0)
        return bytes(head + pix)

    def ppm(gray):
        h, w = gray.shape
        body = bytes(
            int(gray[y, x]) for y in range(h) for x in range(w)
            for _ in range(3)
        )
        return f"P6\n{w} {h}\n255\n".encode() + body

    def png(gray):
        import struct
        import zlib

        h, w = gray.shape
        raw = b"".join(
            b"\x00" + bytes(int(v) for v in gray[y]) for y in range(h)
        )

        def chunk(tag, data):
            c = tag + data
            return (
                struct.pack(">I", len(data)) + c
                + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def webp(gray, **kw):
        img = np.stack(
            [gray, gray, gray, np.full_like(gray, 255)], axis=2
        )
        return encode_webp_lossless(img, **kw)

    rows = [
        (0, "bmp", bmp(a)),
        (1, "ppm", ppm(a)),
        (2, "png", png(a)),
        (3, "jpeg-gray", encode_jpeg_bytes(a, mode="gray")),
        (4, "jpeg-420-rst",
         encode_jpeg_bytes(a, mode="ycbcr420", restart_interval=2)),
        (5, "jpeg-progressive",
         encode_progressive_jpeg_bytes(a, mode="ycbcr444")),
        (6, "webp-plain", webp(a)),
        (7, "webp-palette", webp(a, palette=True)),
        (8, "webp-pred-subg",
         webp(a, predictor_mode=11, use_subtract_green=True)),
        (9, "webp-cache-lz77", webp(a, cache_bits=4, lz77_rows=True)),
        (10, "png-other-asset", png(b)),
        (11, "webp-lossy-boundary",
         b"RIFF\x10\x00\x00\x00WEBPVP8 \x00\x00\x00\x00"),
        (12, "truncated", encode_jpeg_bytes(a, mode="gray")[:40]),
    ]
    return rows


def main(spark: SparkSession) -> DataFrame:
    from fame2pygen_spark.operators.multimodal import image_ahash

    rows = _payloads()
    df = spark.createDataFrame(
        rows, "doc_id long, fmt string, payload binary"
    )
    hashed = image_ahash(df, "doc_id", "payload").join(
        df.select("doc_id", "fmt"), on="doc_id"
    )
    # format-independent asset grouping: equal aHash == same asset
    inventory = (
        hashed.groupBy("ahash")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.sort_array(F.collect_list("fmt")).alias("formats"),
            F.min("h").alias("h"),
            F.min("w").alias("w"),
        )
        .orderBy(F.desc("n_variants"), "ahash")
    )
    return inventory


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("media-inventory")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    main(spark).show(truncate=False)
    spark.stop()
