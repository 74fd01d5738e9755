"""Multimodal (image/audio/video) columns as opaque binary + typed metadata
(north-star operator).

Convention (:data:`engine.schemas.MEDIA`): the payload is an opaque
``binary`` column; mime/width/height/duration are first-class typed columns
so Catalyst can filter/partition on them without touching bytes.  The
decode / feature-extract / resize / frame-sample steps are ``mapInPandas``
seams — the Arrow batch carries the binary column zero-copy into pandas,
the (pluggable) codec runs per batch, and the result is again a typed frame.

The image/audio libraries are NOT in the harness image, so the real codecs
are stubbed: :func:`decode_media` raises ``NotImplementedError`` unless a
codec is injected, and :func:`fake_media_from_text` manufactures
deterministic payloads so the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is fully exercised by tests and the harness.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "fake_media_from_text",
    "decode_media",
    "media_features",
    "frame_sample",
    "resize_media",
    "fake_resizer",
]

#: codec signature: payload bytes -> decoded ndarray-ish bytes (opaque here)
Codec = Callable[[bytes, str], bytes]


def fake_media_from_text(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from a text corpus: payload = utf-8 bytes,
    dimensions derived from stable hashes.  Stands in for a real binary
    ingest (S3 object fetch / tar shards) with identical column shapes."""
    payload = F.encode(F.col(text_col), "utf-8")
    h = F.abs(F.xxhash64(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.when(h % 3 == 0, F.lit("image/png"))
        .when(h % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        ((h % 1280) + 64).cast("int").alias("width"),
        ((h % 720) + 64).cast("int").alias("height"),
        ((h % 60000) + 1000).cast("long").alias("duration_ms"),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("decoded", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def decode_media(df: DataFrame, codec: Codec | None = None) -> DataFrame:
    """Decode payloads via an injected codec (PIL/librosa/ffmpeg in a real
    deployment).  Without a codec this raises at *plan execution* time —
    clearly marking the stub — unless ``codec='identity'`` semantics are
    injected by tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if codec is None:
                raise NotImplementedError(
                    "no media codec available in this image; inject a Codec "
                    "(e.g. PIL.Image.open for image/*) to decode payloads"
                )
            decoded = [codec(bytes(p), m) for p, m in zip(b["payload"], b["mime"])]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "mime": b["mime"],
                    "decoded": decoded,
                    "n_bytes": [len(d) for d in decoded],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", DoubleType()),
        StructField("signature", ArrayType(DoubleType())),
    ]
)


def media_features(df: DataFrame, *, sig_dim: int = 8) -> DataFrame:
    """Cheap content features straight off the bytes (no codec needed):
    size, byte-entropy, and a fixed-dim byte-histogram signature — the
    pattern a real extractor (CLIP embedding, mel spectrogram) drops into."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, mime, payload in zip(b["media_id"], b["mime"], b["payload"]):
                data = bytes(payload)
                n = len(data)
                counts = [0] * 256
                for byte in data:
                    counts[byte] += 1
                ent = 0.0
                for c in counts:
                    if c:
                        p = c / n
                        ent -= p * math.log2(p)
                bucket = 256 // sig_dim
                sig = [
                    sum(counts[i * bucket : (i + 1) * bucket]) / n if n else 0.0
                    for i in range(sig_dim)
                ]
                rows.append((mid, mime, n, round(ent, 4), sig))
            yield pd.DataFrame(
                rows, columns=["media_id", "mime", "n_bytes", "byte_entropy", "signature"]
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(df: DataFrame, *, every_n_bytes: int = 256, frame_len: int = 64) -> DataFrame:
    """Frame sampling plumbing: explode each payload into fixed-stride slices
    (a real implementation decodes and samples video frames; the slicing
    stands in byte-for-byte so downstream schema/partitioning is real)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                data = bytes(payload)
                for idx, start in enumerate(range(0, max(len(data), 1), every_n_bytes)):
                    out_rows.append((mid, idx, data[start : start + frame_len]))
            yield pd.DataFrame(out_rows, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

#: resizer signature: (payload, mime, src_w, src_h, dst_w, dst_h) -> bytes
Resizer = Callable[[bytes, str, int, int, int, int], bytes]


def fake_resizer() -> Resizer:
    """Deterministic stand-in for an image resizer (PIL.Image.resize in a
    real deployment): scales the byte budget by the area ratio — payload
    sizes behave like a real downscale, so downstream size/partition logic
    is exercised honestly."""

    def resize(payload: bytes, mime: str, sw: int, sh: int, dw: int, dh: int) -> bytes:
        if sw <= 0 or sh <= 0:
            return payload
        target = max(1, int(len(payload) * (dw * dh) / (sw * sh)))
        if target <= len(payload):
            return payload[:target]
        reps = (target + len(payload) - 1) // len(payload)
        return (payload * reps)[:target]

    return resize


def resize_media(
    df: DataFrame, width: int, height: int, *, resizer: Resizer | None = None
) -> DataFrame:
    """Resize every payload to (width, height) through the mapInPandas seam.

    Without an injected resizer this raises NotImplementedError at execution
    (clearly-marked stub — the image libs aren't in this container); the
    plumbing (schema, batching, metadata rewrite) is real either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if resizer is None:
                raise NotImplementedError(
                    "no resize backend in this image; inject a Resizer "
                    "(e.g. PIL-based) to resize payloads"
                )
            out = [
                resizer(bytes(p), m, int(w), int(h), width, height)
                for p, m, w, h in zip(b["payload"], b["mime"], b["width"], b["height"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "mime": b["mime"],
                    "payload": out,
                    "width": [width] * len(b),
                    "height": [height] * len(b),
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)
