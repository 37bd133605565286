"""WARC ingestion tests: record grammar, per-record gzip, HTTP split,
and the html_to_text / html_text_column twin equivalence.
"""

from __future__ import annotations

import html as _html

import pytest

from fame2pygen_spark.sources.warc import (
    build_warc, html_to_text, http_response, parse_warc_records,
    split_http_response,
)


def _fixture(gz: bool) -> bytes:
    text = "Hello <world> & friends\nsecond   line"
    page = (
        "<html><head><script>var x = '<p>';</script>"
        "<style>a{color:red}</style></head><body><!-- c --><p>"
        + _html.escape(text) + "</p></body></html>"
    ).encode()
    return build_warc(
        [
            (
                {"WARC-Type": "warcinfo",
                 "WARC-Date": "2026-01-01T00:00:00Z"},
                b"software: test\r\n",
            ),
            (
                {"WARC-Type": "response",
                 "WARC-Target-URI": "https://example.org/1",
                 "WARC-Date": "2026-01-01T00:00:00Z"},
                http_response(page),
            ),
        ],
        gzip_per_record=gz,
    )


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip_plain_and_gzip(gz):
    recs = parse_warc_records(_fixture(gz))
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo", "response",
    ]
    status, hh, body = split_http_response(recs[1]["payload"])
    assert status == 200
    assert hh["content-type"] == "text/html"
    # entity decode restores the raw characters; tags/script/style/
    # comments vanish; whitespace collapses
    assert html_to_text(body.decode()) == (
        "Hello <world> & friends second line"
    )


def test_warc_truncation_raises():
    blob = _fixture(False)
    for cut in (3, 40, len(blob) - 10):
        with pytest.raises(ValueError):
            parse_warc_records(blob[:cut])
    with pytest.raises(ValueError, match="gzip"):
        parse_warc_records(b"\x1f\x8b\x00garbage")
    with pytest.raises(ValueError, match="HTTP"):
        split_http_response(b"not http")


def test_html_text_twins_agree(spark):
    """The JVM column lane and the Python lane are the same algebra —
    byte-for-byte equal output over adversarial snippets (numeric
    entities excluded: the column lane documents that residue)."""
    from pyspark.sql import functions as F

    from fame2pygen_spark.sources.warc import html_text_column

    snippets = [
        "<p>plain</p>",
        "a<script>ignore<b>this</b></script>b",
        "<style type='x'>p{}</style>tail",
        "keep &amp; &lt;these&gt; &quot;quoted&quot; &#39;ok&#39;",
        "<!-- drop\nme -->  spaced\t\tout ",
        "<div class='x' data-y=\"<z>\">inner</div>",
        "no tags at all",
        "<SCRIPT>UPPER</SCRIPT>case",
    ]
    df = spark.createDataFrame([(s,) for s in snippets], "h string")
    jvm = [r[0] for r in df.select(html_text_column(F.col("h"))).collect()]
    py = [html_to_text(s) for s in snippets]
    assert jvm == py
    assert jvm[1] == "a b"
    assert jvm[3] == "keep & <these> \"quoted\" 'ok'"


def test_warc_documents_lane(spark):
    """The Arrow splitter: multi-record blobs (one gzip, one plain)
    yield one row per response with ids carried through."""
    from fame2pygen_spark.sources.warc import warc_documents

    rows = [(0, _fixture(False)), (1, _fixture(True))]
    df = spark.createDataFrame(rows, "bucket long, blob binary")
    out = warc_documents(df, "blob", id_cols=("bucket",)).collect()
    assert len(out) == 2
    assert sorted(r["bucket"] for r in out) == [0, 1]
    for r in out:
        assert r["status"] == 200
        assert r["uri"] == "https://example.org/1"
        assert r["n_records"] == 2
        assert r["text"].startswith("Hello <world>")
