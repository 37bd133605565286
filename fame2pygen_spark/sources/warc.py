"""WARC (Web ARChive) ingestion — the Common-Crawl-shaped entry point
of a pretraining pipeline, implemented from the public WARC/1.x and
HTTP/1.1 specs with no external libraries.

Scale shape: real ``.warc.gz`` files are concatenations of PER-RECORD
gzip members, which makes them unsplittable by byte range — the
correct Spark plan is ``spark.read.format("binaryFile")`` (one file
per task) + an Arrow ``mapInPandas`` record splitter, exactly what
:func:`warc_documents` does.  At 100 TB parallelism comes from file
COUNT (Common Crawl ships ~1 GB segments in the tens of thousands),
so the per-file lane never needs to split a member.

HTML → text has two lanes:

* :func:`html_text_column` — JVM-side column algebra (regexp chain:
  drop script/style/comments with their content, tags → spaces,
  entity decode for the common five + numeric, collapse whitespace).
  This is the HOT path: boilerplate stripping rides the scan.
* :func:`html_to_text` — the Python twin used inside the WARC lane,
  byte-for-byte the same algebra (the pytest proves the twins agree).
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated-gzip-member stream → decompressed concatenation
    (the .warc.gz layout: one member per record)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member in WARC stream: {exc}")
        if d.unused_data == data:  # no progress → corrupt tail
            raise ValueError("corrupt gzip member in WARC stream")
        data = d.unused_data
    return b"".join(out)


def parse_warc_records(data: bytes) -> list:
    """Raw WARC bytes (plain or per-record-gzip) → list of
    ``{headers: {lower-name: value}, payload: bytes}`` in stream
    order.  Record grammar: ``WARC/1.x CRLF`` header lines to a blank
    line, ``Content-Length`` payload bytes, two CRLFs."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"expected WARC record header at {pos}")
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            n = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length")
        body_start = hdr_end + 4
        if body_start + n > len(data):
            raise ValueError("truncated WARC record payload")
        records.append(
            {
                "headers": headers,
                "payload": data[body_start : body_start + n],
            }
        )
        pos = body_start + n
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
    return records


def split_http_response(payload: bytes):
    """HTTP response block → (status_code, header dict, body bytes)."""
    end = payload.find(_CRLF2)
    if end < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("not an HTTP response payload")
    lines = payload[:end].decode("utf-8", "replace").split("\r\n")
    parts = lines[0].split(None, 2)
    status = int(parts[1])
    headers = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, payload[end + 4 :]


#: the five named entities every page uses + numeric code points
_ENT = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
        "&#39;": "'", "&apos;": "'"}


def html_to_text(html: str) -> str:
    """Python twin of :func:`html_text_column` — IDENTICAL algebra so
    the Arrow lane and the scan lane extract the same text."""
    s = re.sub(r"(?is)<(script|style)\b.*?</\1\s*>", " ", html)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(r"(?s)<[^>]*>", " ", s)
    for ent, ch in _ENT.items():
        s = s.replace(ent, ch)
    s = re.sub(
        r"&#(\d+);", lambda m: chr(int(m.group(1))) if int(m.group(1)) < 0x110000 else m.group(0), s
    )
    return re.sub(r"\s+", " ", s).strip()


def html_text_column(col: Column) -> Column:
    """JVM-side HTML → text: the scan-stage boilerplate stripper.
    Same transform chain as :func:`html_to_text`; entity decode covers
    the named five (numeric entities are left to the Python lane —
    Spark regex replacement cannot compute ``chr``)."""
    s = F.regexp_replace(col, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENT.items():
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


WARC_DOC_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("text", StringType()),
        StructField("n_records", LongType()),
    ]
)


def warc_documents(
    df: DataFrame, payload_col: str, *, id_cols: tuple = ()
) -> DataFrame:
    """One row per WARC *response* record across every blob in
    *payload_col* (Arrow ``mapInPandas``): URI, date, HTTP status,
    response content type, and HTML-stripped body text;
    ``n_records`` carries the blob's total record count (warcinfo /
    request records included) for ingest accounting.  Non-HTML
    bodies pass through as replacement-decoded text."""
    import pandas as pd

    ids = list(id_cols)

    def run(batches):
        for pdf in batches:
            out = {c: [] for c in ids}
            out.update({f.name: [] for f in WARC_DOC_SCHEMA.fields})
            for row in pdf.itertuples(index=False):
                blob = getattr(row, payload_col)
                recs = parse_warc_records(
                    bytes(blob) if blob is not None else b""
                )
                for rec in recs:
                    if rec["headers"].get("warc-type") != "response":
                        continue
                    status, hh, body = split_http_response(rec["payload"])
                    ctype = hh.get("content-type", "")
                    text = body.decode("utf-8", "replace")
                    if "html" in ctype:
                        text = html_to_text(text)
                    for c in ids:
                        out[c].append(getattr(row, c))
                    out["uri"].append(
                        rec["headers"].get("warc-target-uri")
                    )
                    out["warc_date"].append(
                        rec["headers"].get("warc-date")
                    )
                    out["status"].append(status)
                    out["content_type"].append(ctype)
                    out["text"].append(text)
                    out["n_records"].append(len(recs))
            yield pd.DataFrame(out)

    schema = StructType(
        [f for f in df.schema.fields if f.name in ids]
        + list(WARC_DOC_SCHEMA.fields)
    )
    return df.mapInPandas(run, schema=schema)


def build_warc(records: list, *, gzip_per_record: bool = False) -> bytes:
    """Fixture/export WARC writer: *records* are ``(headers dict,
    payload bytes)`` pairs; Content-Length is computed.  With
    *gzip_per_record* each record becomes its own gzip member (the
    .warc.gz layout real crawls ship)."""
    import gzip as _gzip

    out = []
    for headers, payload in records:
        lines = ["WARC/1.0"]
        for k, v in headers.items():
            lines.append(f"{k}: {v}")
        lines.append(f"Content-Length: {len(payload)}")
        block = (
            "\r\n".join(lines).encode() + _CRLF2 + payload + _CRLF2
        )
        if gzip_per_record:
            block = _gzip.compress(block, mtime=0)
        out.append(block)
    return b"".join(out)


def http_response(
    body: bytes, *, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """Minimal HTTP/1.1 response block for WARC fixtures."""
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode()
    return head + b"\r\n" + body
