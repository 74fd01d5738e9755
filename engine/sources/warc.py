"""WARC source — the web-archive format CommonCrawl ships, i.e. the raw
input of a web-scale LLM corpus pipeline.  Stdlib-only, same scale shape as
the tar-shard source:

- ``spark.read.format("binaryFile")`` lists and reads WARC files in
  parallel (one task per file — CommonCrawl segments at ~1 GB are the
  parallelism unit);
- a ``mapInPandas`` seam parses records in-executor — Content-Length-framed
  per the WARC/1.0 spec, gzip multi-member streams (the ``.warc.gz``
  convention: one gzip member per record) decompressed with stdlib gzip,
  which reads through concatenated members;
- ``response`` records additionally split the HTTP envelope at the first
  CRLFCRLF so the body lands in its own column, ready for
  ``html_to_text`` → the curation chain.

Malformed trailing bytes end the file's parse without failing the task
(a truncated crawl segment must not kill the job); per-record header
anomalies null the affected column and keep the record.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["read_warc_records", "write_warc", "parse_warc"]

def _gunzip_lenient(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream MEMBER BY MEMBER,
    keeping everything recovered before a truncation: a half-downloaded
    ``.warc.gz`` segment yields its complete leading records instead of
    failing the task.  (gzip.decompress — and even a chunked GzipFile
    read, which crosses member boundaries inside one read() call — raises
    EOFError on exactly the most common real-world corruption.)  A
    truncated final member contributes its recovered prefix; parse_warc
    then stops cleanly mid-record."""
    import zlib

    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data[pos:])
        except zlib.error:
            break
        if not d.eof:
            break  # truncated member: keep its recovered prefix, stop
        rest = d.unused_data
        if not rest:
            break
        pos = len(data) - len(rest)
    return bytes(out)


WARC_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("record_idx", LongType()),
        StructField("record_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("http_status", LongType()),
        StructField("http_body", BinaryType()),
    ]
)


def parse_warc(data: bytes) -> list[dict]:
    """WARC/1.0 bytes → record dicts.  Content-Length framing; CRLF or LF
    header line endings tolerated; stops cleanly at trailing garbage."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_lenient(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos : pos + 5] == b"WARC/":
            break
        # take the EARLIER of the two terminator conventions: searching
        # CRLFCRLF first across the whole buffer would find a terminator
        # inside an LF-headered record's payload (HTTP bodies contain
        # CRLFCRLF) and misframe everything after it
        crlf = data.find(b"\r\n\r\n", pos)
        lf = data.find(b"\n\n", pos)
        if crlf == -1 and lf == -1:
            break
        if lf == -1 or (crlf != -1 and crlf <= lf):
            hdr_end, sep = crlf, 4
        else:
            hdr_end, sep = lf, 2
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].splitlines()[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.decode("latin-1").strip().lower()] = (
                    v.decode("latin-1").strip()
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break  # unframed record: cannot advance safely
        # a crafted/corrupt negative length would move the cursor BACKWARD
        # (infinite loop + unbounded growth); stop cleanly instead
        if clen < 0:
            break
        body_start = hdr_end + sep
        body = data[body_start : body_start + clen]
        rec = {
            "record_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "payload": body,
            "http_status": None,
            "http_body": None,
        }
        if rec["record_type"] == "response" and body[:5] == b"HTTP/":
            he = body.find(b"\r\n\r\n")
            hsep = 4
            if he == -1:
                he = body.find(b"\n\n")
                hsep = 2
            if he != -1:
                status_line = body[: he].splitlines()[0].split()
                if len(status_line) >= 2 and status_line[1].isdigit():
                    rec["http_status"] = int(status_line[1])
                rec["http_body"] = body[he + hsep :]
        out.append(rec)
        pos = body_start + clen
    return out


def read_warc_records(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per WARC record across every matched file.  Bytes never
    touch the driver; parallelism = file count."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                for i, rec in enumerate(parse_warc(bytes(content))):
                    rows.append(
                        (
                            path,
                            i,
                            rec["record_type"],
                            rec["target_uri"],
                            rec["warc_date"],
                            rec["content_type"],
                            rec["payload"],
                            rec["http_status"],
                            rec["http_body"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_idx", "record_type", "target_uri",
                    "warc_date", "content_type", "payload", "http_status",
                    "http_body",
                ],
            )

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(extract, schema=WARC_SCHEMA)


def write_warc(records: list[dict], path: str, *, compress: bool = False) -> None:
    """Test/fixture helper: records (type, uri, date, content_type, payload
    bytes) → a WARC/1.0 file, optionally as the per-record-gzip-member
    ``.warc.gz`` convention."""
    members = []
    for rec in records:
        payload = rec["payload"]
        hdr = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {rec['type']}\r\n".encode()
            + (
                f"WARC-Target-URI: {rec['uri']}\r\n".encode()
                if rec.get("uri")
                else b""
            )
            + (
                f"WARC-Date: {rec['date']}\r\n".encode()
                if rec.get("date")
                else b""
            )
            + (
                f"Content-Type: {rec['content_type']}\r\n".encode()
                if rec.get("content_type")
                else b""
            )
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        members.append(hdr + payload + b"\r\n\r\n")
    if compress:
        blob = b"".join(gzip.compress(m) for m in members)
    else:
        blob = b"".join(members)
    with open(path, "wb") as fh:
        fh.write(blob)
