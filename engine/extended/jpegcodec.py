"""Stdlib baseline-sequential JPEG codec (ITU T.81) for the multimodal seam.

Round-3 verdict item: web-scraped multimodal corpora are overwhelmingly
JPEG, so ``decode_media`` needs real pixels on the JPEG path, matching the
PNG codec's standard (``n_bytes == w*h*ch``), not header-parse-only.

Scope — the baseline-sequential profile that covers the overwhelming
majority of real-world JPEGs:

- **decode**: SOF0 (baseline DCT), 8-bit, 1 or 3 components, any sampling
  factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals, byte
  stuffing.  Progressive (SOF2) / arithmetic / 12-bit raise ``ValueError``
  cleanly (inject PIL via the ``Codec`` seam for those).
- **encode**: 4:4:4 (or single-component) baseline with the T.81 Annex K
  quantization + Huffman tables and libjpeg's quality scaling — enough to
  round-trip ``decode(encode(x)) ≈ x`` in tests without any third-party
  wheel in the container.

Pure Python is the PARITY/TEST path: at deployment scale the decode runs
inside ``mapInPandas`` batches where an injected PIL/libjpeg-turbo codec
takes over through the same seam (engine/extended/multimodal.py); the
Spark-side plumbing (schema, batch shape, pixel-count contract) is what
this module makes testable hermetically.

Reference behavior: NYPL/patron-info-poller has no media path; this module
serves the brief's multimodal-columns requirement (SURVEY §2 extended).
"""

from __future__ import annotations

import math
import struct

__all__ = ["jpeg_decode", "jpeg_encode"]

# zigzag index k -> natural (row-major) index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.1/K.2 quantization tables (natural order, quality 50 base)
_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# T.81 Annex K.3 Huffman specs: (bits[16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
for _bits, _vals in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
    assert sum(_bits) == len(_vals), "inconsistent Huffman spec"

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, values).items()}


# ---------------------------------------------------------------------------
# DCT (separable, float — 8x8 blocks only, so O(2*8^3) per block)
# ---------------------------------------------------------------------------


def _fdct(block: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += block[base + x] * _COS[x][u]
            tmp[base + u] = s
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[y][v]
            out[v * 8 + u] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for v in range(8):
        base = v * 8
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * coef[base + u] * _COS[x][u]
            tmp[base + x] = s
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + x] * _COS[y][v]
            out[y * 8 + x] = 0.25 * s
    return out


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker reached (EOI / RST handled by caller via sync)
                    raise ValueError("marker inside entropy stream")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self._n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, raw interleaved 8-bit pixels).

    Baseline sequential only; raises ValueError on other profiles so the
    injected-codec seam can take over.
    """
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported (inject PIL)")
                qt[tid] = list(seg[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG profile unsupported (inject PIL)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 15)
            return _decode_scan(
                data, i + 2 + seg_len, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        i += 2 + seg_len
    raise ValueError("no scan data in JPEG")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(comps) not in (1, 3):
        raise ValueError(f"{len(comps)}-component JPEG unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component plane buffers (MCU-padded)
    planes = []
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row
        c["bh"] = mcuy * c["v"]
        planes.append(bytearray(c["bw"] * 8 * c["bh"] * 8))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = scan[c["id"]]
                dc_tab, ac_tab = huff_dc[dct], huff_ac[act]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0.0] * 64
                        t = _decode_symbol(reader, dc_tab)
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci] * q[0]
                        k = 0
                        while k < 63:
                            rs = _decode_symbol(reader, ac_tab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r + 1
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[ZIGZAG[k]] = _extend(reader.receive(s), s) * q[k]
                        px = _idct(coef)
                        plane = planes[ci]
                        stride = c["bw"] * 8
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        for yy in range(8):
                            row = (oy + yy) * stride + ox
                            for xx in range(8):
                                v = int(px[yy * 8 + xx] + 128.5)
                                plane[row + xx] = 0 if v < 0 else (255 if v > 255 else v)
            mcu_count += 1
    # upsample to full resolution and color-convert
    if len(comps) == 1:
        c = comps[0]
        stride = c["bw"] * 8
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = planes[0][y * stride : y * stride + w]
        return w, h, 1, bytes(out)
    out = bytearray(w * h * 3)
    strides = [c["bw"] * 8 for c in comps]
    h0, h1, h2 = (comps[ci]["h"] for ci in range(3))
    p0, p1, p2 = planes
    for y in range(h):
        r0 = (y * comps[0]["v"] // vmax) * strides[0]
        r1 = (y * comps[1]["v"] // vmax) * strides[1]
        r2 = (y * comps[2]["v"] // vmax) * strides[2]
        o = y * w * 3
        for x in range(w):
            yv = p0[r0 + x * h0 // hmax]
            cb = p1[r1 + x * h1 // hmax] - 128
            cr = p2[r2 + x * h2 // hmax] - 128
            r = int(yv + 1.402 * cr + 0.5)
            g = int(yv - 0.344136 * cb - 0.714136 * cr + 0.5)
            b = int(yv + 1.772 * cb + 0.5)
            out[o] = 0 if r < 0 else (255 if r > 255 else r)
            out[o + 1] = 0 if g < 0 else (255 if g > 255 else g)
            out[o + 2] = 0 if b < 0 else (255 if b > 255 else b)
            o += 3
    return w, h, 3, bytes(out)


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4 / grayscale)
# ---------------------------------------------------------------------------


def _scaled_qt(base: list[int], quality: int) -> list[int]:
    """Annex-K table (natural order) scaled by libjpeg's quality curve,
    returned in ZIGZAG order — the order DQT stores and every q[k] lookup
    against a zigzag coefficient index expects."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    nat = [max(1, min(255, (t * scale + 50) // 100)) for t in base]
    return [nat[ZIGZAG[k]] for k in range(64)]


def _encode_block(
    writer: _BitWriter,
    samples: list[float],
    q: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    coef = _fdct(samples)
    zz = [int(round(coef[ZIGZAG[k]] / q[k])) for k in range(64)]
    diff = zz[0] - pred
    t = diff if diff >= 0 else -diff
    size = t.bit_length()
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        size = (v if v >= 0 else -v).bit_length()
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return zz[0]


def jpeg_encode(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int = 85,
    subsampling: str = "444",
) -> bytes:
    """Raw interleaved 8-bit pixels -> baseline JPEG (Annex K tables).

    ``channels`` 1 (grayscale) or 3 (RGB); ``subsampling`` '444' or '420'
    (the web default — 2x2-averaged chroma, which also exercises the
    decoder's upsampling path in tests)."""
    if channels not in (1, 3):
        raise ValueError(f"jpeg_encode supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer {len(pixels)} != {height}x{width}x{channels}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling}")
    sub = 2 if (subsampling == "420" and channels == 3) else 1
    qts = [_scaled_qt(_QT_LUMA, quality)]
    if channels == 3:
        qts.append(_scaled_qt(_QT_CHROMA, quality))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(q)
    nf = channels
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nf) + bytes([8]) + struct.pack(
        ">HH", height, width
    ) + bytes([nf])
    for c in range(nf):
        hv = (sub << 4) | sub if c == 0 else 0x11
        out += bytes([c + 1, hv, 0 if c == 0 else 1])
    specs = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if channels == 3:
        specs += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for cls, tid, (bits, vals) in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes(
            [(cls << 4) | tid]
        ) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nf) + bytes([nf])
    for c in range(nf):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += bytes([0, 63, 0])

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    # color convert to per-component planes (levels shifted at block build)
    if channels == 3:
        ny = width * height
        py = [0.0] * ny
        pcb = [0.0] * ny
        pcr = [0.0] * ny
        for i in range(ny):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            py[i] = 0.299 * r + 0.587 * g + 0.114 * b
            pcb[i] = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
            pcr[i] = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [py, pcb, pcr]
        tables = [(qts[0], dc_l, ac_l), (qts[1], dc_c, ac_c), (qts[1], dc_c, ac_c)]
    else:
        planes = [[float(p) for p in pixels]]
        tables = [(qts[0], dc_l, ac_l)]

    def grab(plane: list[float], pw: int, ph: int, ox: int, oy: int) -> list[float]:
        block = [0.0] * 64
        for yy in range(8):
            sy = min(oy + yy, ph - 1)
            for xx in range(8):
                sx = min(ox + xx, pw - 1)
                block[yy * 8 + xx] = plane[sy * pw + sx] - 128.0
        return block

    writer = _BitWriter()
    preds = [0] * channels
    if sub == 2:
        # 2x2-average chroma planes, MCU = 4 Y blocks + Cb + Cr
        cw, chh = (width + 1) // 2, (height + 1) // 2
        down = []
        for plane in planes[1:]:
            d = [0.0] * (cw * chh)
            for cy in range(chh):
                for cx in range(cw):
                    s = 0.0
                    for dy in range(2):
                        for dx in range(2):
                            s += plane[
                                min(2 * cy + dy, height - 1) * width
                                + min(2 * cx + dx, width - 1)
                            ]
                    d[cy * cw + cx] = s / 4.0
            down.append(d)
        for my in range((height + 15) // 16):
            for mx in range((width + 15) // 16):
                for by in range(2):
                    for bx in range(2):
                        preds[0] = _encode_block(
                            writer,
                            grab(planes[0], width, height, mx * 16 + bx * 8, my * 16 + by * 8),
                            qts[0], preds[0], dc_l, ac_l,
                        )
                for pi in (1, 2):
                    preds[pi] = _encode_block(
                        writer,
                        grab(down[pi - 1], cw, chh, mx * 8, my * 8),
                        qts[1], preds[pi], dc_c, ac_c,
                    )
    else:
        for by in range((height + 7) // 8):
            for bx in range((width + 7) // 8):
                for ci in range(channels):
                    q, dc_codes, ac_codes = tables[ci]
                    preds[ci] = _encode_block(
                        writer,
                        grab(planes[ci], width, height, bx * 8, by * 8),
                        q, preds[ci], dc_codes, ac_codes,
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
