"""WARC source: record framing, gzip multi-member, HTTP envelope split,
and the ingest → curation chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.sources.warc import parse_warc, read_warc_records, write_warc

HTML = b"<html><body><p>hello crawl</p></body></html>"
HTTP = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + HTML

RECORDS = [
    {
        "type": "warcinfo",
        "uri": None,
        "date": "2024-01-01T00:00:00Z",
        "content_type": "application/warc-fields",
        "payload": b"software: test\r\n",
    },
    {
        "type": "response",
        "uri": "http://example.org/a",
        "date": "2024-01-01T00:00:01Z",
        "content_type": "application/http; msgtype=response",
        "payload": HTTP,
    },
    {
        "type": "request",
        "uri": "http://example.org/a",
        "date": "2024-01-01T00:00:01Z",
        "content_type": "application/http; msgtype=request",
        "payload": b"GET /a HTTP/1.1\r\n\r\n",
    },
]


def test_parse_warc_framing_and_http_split():
    blob_records = RECORDS + [
        {
            "type": "response",
            "uri": "http://example.org/b",
            "date": "2024-01-01T00:00:02Z",
            "content_type": "application/http; msgtype=response",
            "payload": b"HTTP/1.1 404 Not Found\r\n\r\ngone",
        }
    ]
    import io

    buf = io.BytesIO()
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.warc")
        write_warc(blob_records, p)
        data = open(p, "rb").read()
    recs = parse_warc(data)
    assert [r["record_type"] for r in recs] == [
        "warcinfo", "response", "request", "response",
    ]
    assert recs[1]["http_status"] == 200
    assert recs[1]["http_body"] == HTML
    assert recs[2]["http_status"] is None  # requests keep raw payload only
    assert recs[3]["http_status"] == 404
    # trailing garbage ends the parse without raising
    assert [r["record_type"] for r in parse_warc(data + b"garbage")] == [
        "warcinfo", "response", "request", "response",
    ]


def test_read_warc_records_plain_and_gzip(spark, tmp_path):
    write_warc(RECORDS, str(tmp_path / "a.warc"))
    write_warc(RECORDS, str(tmp_path / "b.warc.gz"), compress=True)
    df = read_warc_records(spark, str(tmp_path / "*.warc*"))
    got = df.select("warc_file", "record_idx", "record_type", "target_uri").collect()
    assert len(got) == 6  # 3 records × 2 files
    by_file = {}
    for r in got:
        by_file.setdefault(r["warc_file"].rsplit("/", 1)[-1], []).append(r["record_type"])
    assert by_file["a.warc"] == ["warcinfo", "response", "request"]
    assert by_file["b.warc.gz"] == ["warcinfo", "response", "request"]


def test_warc_to_curation_chain(spark, tmp_path):
    """The real ingest shape: WARC responses → HTTP body → html_to_text →
    tokens, entirely in-executor."""
    from engine.extended.curation import html_to_text
    from engine.extended.text import tokens

    write_warc(RECORDS, str(tmp_path / "c.warc.gz"), compress=True)
    df = read_warc_records(spark, str(tmp_path / "*.warc.gz"))
    docs = (
        df.filter((F.col("record_type") == "response") & (F.col("http_status") == 200))
        .select(
            "target_uri",
            F.decode(F.col("http_body"), "utf-8").alias("html"),
        )
        .select("target_uri", html_to_text("html").alias("text"))
        .select("target_uri", tokens("text").alias("toks"))
    )
    got = docs.collect()
    assert len(got) == 1
    assert got[0]["toks"] == ["hello", "crawl"]


def test_parse_warc_lf_headers_with_crlf_payload():
    """Review finding: LF-terminated record headers whose payload contains
    CRLFCRLF (any normal HTTP message) must not misframe — the parser
    takes the EARLIER terminator, not CRLFCRLF-first."""
    rec1 = (
        b"WARC/1.0\n"
        b"WARC-Type: response\n"
        b"WARC-Target-URI: http://x/a\n"
        + f"Content-Length: {len(HTTP)}\n".encode()
        + b"\n" + HTTP + b"\n\n"
    )
    rec2 = (
        b"WARC/1.0\n"
        b"WARC-Type: request\n"
        b"Content-Length: 2\n"
        b"\n" b"ok" b"\n\n"
    )
    recs = parse_warc(rec1 + rec2)
    assert [r["record_type"] for r in recs] == ["response", "request"]
    assert recs[0]["http_status"] == 200
    assert recs[0]["http_body"] == HTML
    assert recs[1]["payload"] == b"ok"


def test_parse_warc_negative_content_length_terminates():
    """Review finding: a corrupt negative Content-Length must stop the
    parse, not loop the cursor backward forever."""
    evil = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"Content-Length: -47\r\n"
        b"\r\n"
    )
    assert parse_warc(evil) == []


def test_parse_warc_truncated_gzip_keeps_leading_records(tmp_path):
    """Review finding: a half-downloaded .warc.gz must yield its complete
    leading records instead of raising EOFError out of the task."""
    import os

    p = os.path.join(str(tmp_path), "t.warc.gz")
    write_warc(RECORDS, p, compress=True)
    blob = open(p, "rb").read()
    # cut inside the LAST gzip member: earlier members survive
    recs = parse_warc(blob[: len(blob) - 10])
    assert len(recs) >= 2
    assert recs[0]["record_type"] == "warcinfo"
    assert recs[1]["http_status"] == 200
