"""Dependency-free WAV (RIFF PCM) codec — the audio sibling of
engine/extended/imagecodec.py: real stdlib-only encode/parse/decode so the
multimodal audio path exercises genuine byte decoding, with the same
``Codec`` injection seam left open for librosa/ffmpeg in a deployment.

Only integer PCM (8/16-bit, little-endian, any channel count) is handled —
the format the synthetic corpus emits and the overwhelmingly common
interchange case.  Unknown chunks are skipped per the RIFF spec (a real
encoder's LIST/fact chunks must not break parsing).
"""

from __future__ import annotations

import struct

__all__ = ["wav_encode", "parse_wav_header", "wav_decode"]


def wav_encode(
    samples: list[int], sample_rate: int, channels: int, *, bits: int = 16
) -> bytes:
    """Interleaved integer samples → RIFF/WAVE PCM bytes.

    16-bit samples are signed ([-32768, 32767]); 8-bit are unsigned
    ([0, 255]) per the WAV convention.  ``len(samples)`` must be a
    multiple of ``channels``.
    """
    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    if len(samples) % channels:
        raise ValueError("len(samples) must be a multiple of channels")
    if bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    else:
        frames = bytes(samples)
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(data: bytes) -> dict | None:
    """RIFF/WAVE metadata without decoding samples: sample_rate, channels,
    bits, n_frames, duration_ms.  None for non-WAV bytes; unknown chunks
    are skipped (word-aligned per the RIFF spec)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"fmt " and fmt is None and pos + 8 + 16 <= len(data):
            fmt = struct.unpack_from("<HHIIHH", data, pos + 8)
        elif cid == b"data" and data_len is None:
            # FIRST data chunk only — wav_decode returns the first chunk's
            # samples, so the frame count must describe the same bytes
            data_len = min(clen, len(data) - pos - 8)
        pos += 8 + clen + (clen & 1)
    if fmt is None or data_len is None:
        return None
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or not channels or not rate:
        return None  # only integer PCM
    n_frames = data_len // (channels * bits // 8) if block_align else 0
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // rate,
    }


def wav_decode(data: bytes) -> list[int] | None:
    """PCM bytes → interleaved integer samples (signed for 16-bit,
    unsigned for 8-bit).  None when the header doesn't parse."""
    hdr = parse_wav_header(data)
    if hdr is None:
        return None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"data":
            raw = data[pos + 8 : pos + 8 + clen]
            if hdr["bits"] == 16:
                n = len(raw) // 2
                return list(struct.unpack(f"<{n}h", raw[: n * 2]))
            return list(raw)
        pos += 8 + clen + (clen & 1)
    return None
