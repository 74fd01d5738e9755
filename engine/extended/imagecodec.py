"""Dependency-free image codec for the multimodal seams.

Real decode where the format allows it with stdlib only:

- **PNG**: full decode/encode — zlib IDAT inflate + scanline filter
  reconstruction (None/Sub/Up/Average/Paeth) to raw interleaved pixels, and
  the inverse (filter 0 + deflate) for writing.  Covers bit-depth 8, color
  types 0/2/4/6 (grey, RGB, grey+alpha, RGBA); palette/interlace/16-bit
  raise cleanly (inject PIL for those).
- **JPEG**: full baseline-sequential decode/encode via
  :mod:`engine.extended.jpegcodec` — Huffman entropy decode, dequantize,
  IDCT, chroma upsample (4:4:4 / 4:2:2 / 4:2:0), restart intervals.
  Progressive/arithmetic/12-bit raise cleanly (inject PIL).
- **GIF / BMP**: header-only metadata (dimensions + channels); ``decode``
  passes the payload through with real metadata attached.

This makes ``decode_media`` / ``resize_media`` genuinely functional on the
default path (no NotImplementedError): PNG and baseline JPEG payloads
round-trip through raw pixels, other known formats carry parsed metadata,
unknown bytes pass through untouched.  A real deployment still injects
PIL/ffmpeg via the same ``Codec`` / ``Resizer`` seams for speed and the
esoteric variants.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "parse_header",
    "png_decode",
    "png_encode",
    "nn_resize_raw",
    "default_codec",
    "default_resizer",
]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> channels
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG start-of-frame markers that carry dimensions (baseline/progressive)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_header(data: bytes) -> dict | None:
    """(format, width, height, channels) from magic bytes, or None.

    PNG: IHDR fields.  JPEG: first SOFn segment.  GIF: logical screen
    descriptor.  BMP: BITMAPINFOHEADER.  No decompression — O(header) work,
    safe to run inline on 100 TB of payload metadata extraction.
    """
    if len(data) >= 24 and data[:8] == _PNG_MAGIC and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        bit_depth, color_type = data[24], data[25]
        return {
            "format": "png",
            "width": w,
            "height": h,
            "channels": _PNG_CHANNELS.get(color_type, 0),
            "bit_depth": bit_depth,
        }
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > len(data):
                break
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF and i + 9 <= len(data):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return {
                    "format": "jpeg",
                    "width": w,
                    "height": h,
                    "channels": data[i + 9] if i + 9 < len(data) else 3,
                    "bit_depth": data[i + 4],
                }
            i += 2 + seg_len
        return None
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return {"format": "gif", "width": w, "height": h, "channels": 3, "bit_depth": 8}
    if len(data) >= 30 and data[:2] == b"BM":
        w, h = struct.unpack("<ii", data[18:26])
        bpp = struct.unpack("<H", data[28:30])[0]
        return {
            "format": "bmp",
            "width": w,
            "height": abs(h),
            "channels": max(1, bpp // 8),
            "bit_depth": min(bpp, 8),
        }
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, raw interleaved 8-bit pixels).

    Raises ValueError on non-PNG bytes and on PNG features outside the
    stdlib decoder's scope (palette, interlace, non-8-bit depth).
    """
    hdr = parse_header(data)
    if not hdr or hdr["format"] != "png":
        raise ValueError("not a PNG payload")
    if hdr["bit_depth"] != 8:
        raise ValueError(f"unsupported PNG bit depth {hdr['bit_depth']} (inject PIL)")
    color_type, interlace = data[25], data[28]
    if color_type == 3:
        raise ValueError("palette PNG unsupported (inject PIL)")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported (inject PIL)")
    w, h, ch = hdr["width"], hdr["height"], hdr["channels"]

    idat = bytearray()
    i = 8
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        if ctype == b"IDAT":
            idat += data[i + 8 : i + 8 + length]
        if ctype == b"IEND":
            break
        i += 12 + length  # length + type + payload + crc
    raw = zlib.decompress(bytes(idat))

    stride = w * ch
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def png_encode(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """Raw interleaved 8-bit pixels -> PNG bytes (filter 0, one IDAT)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError(f"pixel buffer {len(pixels)} != {height}x{stride}")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    scanlines = bytearray()
    for y in range(height):
        scanlines += b"\x00" + pixels[y * stride : (y + 1) * stride]
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scanlines), 6))
        + chunk(b"IEND", b"")
    )


def nn_resize_raw(
    pixels: bytes, sw: int, sh: int, dw: int, dh: int, channels: int
) -> bytes:
    """Nearest-neighbor resample of raw interleaved pixels (the classic
    src_idx = floor(dst_idx * src / dst) mapping)."""
    out = bytearray(dw * dh * channels)
    src_stride = sw * channels
    for dy in range(dh):
        sy = min(dy * sh // dh, sh - 1)
        row = sy * src_stride
        orow = dy * dw * channels
        for dx in range(dw):
            sx = min(dx * sw // dw, sw - 1)
            s = row + sx * channels
            o = orow + dx * channels
            out[o : o + channels] = pixels[s : s + channels]
    return bytes(out)


def default_codec(payload: bytes, mime: str) -> bytes:
    """The built-in Codec: PNG and baseline JPEG -> raw pixels (real
    decode); other known headers -> payload unchanged (metadata comes from
    :func:`parse_header`); unknown bytes -> unchanged.  Never raises on the
    default path (esoteric variants pass through with real metadata)."""
    hdr = parse_header(payload)
    if hdr and hdr["format"] == "png":
        try:
            return png_decode(payload)[3]
        except ValueError:
            return payload  # esoteric PNG variant: pass through, meta still real
    if hdr and hdr["format"] == "jpeg":
        from engine.extended.jpegcodec import jpeg_decode

        try:
            return jpeg_decode(payload)[3]
        except ValueError:
            return payload  # progressive/arithmetic: pass through
    return payload


def default_resizer(
    payload: bytes, mime: str, sw: int, sh: int, dw: int, dh: int
) -> bytes:
    """The built-in Resizer: PNG and baseline JPEG payloads decode ->
    NN-resample -> re-encode (a REAL resize, same container format out);
    other payloads scale their byte budget by area ratio so size-dependent
    downstream logic stays honest."""
    hdr = parse_header(payload)
    if hdr and hdr["format"] == "png":
        try:
            w, h, ch, pixels = png_decode(payload)
            return png_encode(nn_resize_raw(pixels, w, h, dw, dh, ch), dw, dh, ch)
        except ValueError:
            pass
    if hdr and hdr["format"] == "jpeg":
        from engine.extended.jpegcodec import jpeg_decode, jpeg_encode

        try:
            w, h, ch, pixels = jpeg_decode(payload)
            return jpeg_encode(nn_resize_raw(pixels, w, h, dw, dh, ch), dw, dh, ch)
        except ValueError:
            pass
    if sw <= 0 or sh <= 0 or not payload:
        return payload
    target = max(1, int(len(payload) * (dw * dh) / (sw * sh)))
    if target <= len(payload):
        return payload[:target]
    reps = (target + len(payload) - 1) // len(payload)
    return (payload * reps)[:target]
