"""Avro binary encode/decode for flat records (SURVEY §2.1 S7).

The reference binary-encodes each sink record against a registry-fetched Avro
schema (lib/pipeline_controller.py:59,241-242).  The harness image ships
neither the ``spark-avro`` SQL datasource jar nor a Python avro wheel, so the
engine carries a minimal, dependency-free implementation of the Avro binary
spec (zigzag-varint longs, length-prefixed utf8/bytes, union-index prefix) —
sufficient for the flat nullable-primitive records this pipeline emits, and
exposed as an Arrow-batched pandas UDF so encoding runs executor-side.

Spec: https://avro.apache.org/docs/1.11.1/specification/ (binary encoding).
If ``pyspark.sql.avro.functions.to_avro`` is available (spark-avro jar on the
classpath), :func:`to_avro_col` uses it instead — same wire format.
"""

from __future__ import annotations

import json
import struct
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

__all__ = [
    "zigzag_encode",
    "encode_record",
    "decode_record",
    "avro_encode_udf",
    "to_avro_col",
]


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then varint."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(value: Any, avro_type: Any, out: bytearray) -> None:
    if isinstance(avro_type, list):  # union — find the branch
        if value is None:
            idx = avro_type.index("null")
            out += zigzag_encode(idx)
            return
        for i, branch in enumerate(avro_type):
            if branch != "null":
                out += zigzag_encode(i)
                _encode_value(value, branch, out)
                return
        raise ValueError(f"no non-null branch in union {avro_type}")
    if avro_type == "null":
        return
    if avro_type in ("long", "int"):
        out += zigzag_encode(int(value))
    elif avro_type == "string":
        raw = str(value).encode("utf-8")
        out += zigzag_encode(len(raw)) + raw
    elif avro_type == "bytes":
        out += zigzag_encode(len(value)) + bytes(value)
    elif avro_type == "boolean":
        out.append(1 if value else 0)
    elif avro_type == "double":
        out += struct.pack("<d", float(value))
    elif avro_type == "float":
        out += struct.pack("<f", float(value))
    else:
        raise NotImplementedError(f"avro type {avro_type!r}")


def encode_record(record: dict, schema: dict) -> bytes:
    """Binary-encode one dict against a flat Avro record schema."""
    out = bytearray()
    for field in schema["fields"]:
        _encode_value(record.get(field["name"]), field["type"], out)
    return bytes(out)


def _decode_value(buf: bytes, pos: int, avro_type: Any) -> tuple[Any, int]:
    if isinstance(avro_type, list):
        idx, pos = zigzag_decode(buf, pos)
        return _decode_value(buf, pos, avro_type[idx])
    if avro_type == "null":
        return None, pos
    if avro_type in ("long", "int"):
        return zigzag_decode(buf, pos)
    if avro_type in ("string", "bytes"):
        n, pos = zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if avro_type == "string" else raw), pos + n
    if avro_type == "boolean":
        return buf[pos] == 1, pos + 1
    if avro_type == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if avro_type == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    raise NotImplementedError(f"avro type {avro_type!r}")


def decode_record(buf: bytes, schema: dict) -> dict:
    """Inverse of :func:`encode_record` (round-trip testing / sink verify)."""
    rec = {}
    pos = 0
    for field in schema["fields"]:
        rec[field["name"]], pos = _decode_value(buf, pos, field["type"])
    return rec


def avro_encode_udf(schema: dict):
    """Arrow-batched encoder: struct column → Avro-binary column."""
    schema_fields = schema["fields"]

    @pandas_udf(BinaryType())
    def _encode(s: pd.DataFrame) -> pd.Series:
        # struct columns arrive as a pandas DataFrame of fields
        recs = s.to_dict("records")
        fixed = [
            {k: (None if pd.isna(v) else v) for k, v in r.items()} for r in recs
        ]
        return pd.Series(
            [encode_record(r, {"fields": schema_fields}) for r in fixed]
        )

    return _encode


def to_avro_col(df: DataFrame, cols: list[str], schema: dict) -> Column:
    """Avro-encode ``struct(cols)``; prefers the JVM ``to_avro`` when loaded."""
    st = F.struct(*[F.col(c) for c in cols])
    try:  # pragma: no cover - jar not present in harness image
        from pyspark.sql.avro.functions import to_avro

        probe = df.sparkSession.range(1).select(to_avro(F.struct("id")))
        probe.schema  # forces analysis; raises if datasource missing
        return to_avro(st, json.dumps(schema))
    except Exception:
        return avro_encode_udf(schema)(st)
