"""Pure-Python bcrypt (spec-derived) — parity fallback for the obfuscation
contract when the ``bcrypt`` wheel is absent.

The reference obfuscates ids with keyed bcrypt (its utils ``obfuscate``,
applied at lib/pipeline_controller.py:195-197); the engine's scale path is
sha2 (engine/ops/hashing.py), but this module makes ``mode='bcrypt'``
functional everywhere so the reference-identical contract is testable
without the wheel.

Implementation notes:

- Written from the algorithm definition (Provos & Mazières, "A
  Future-Adaptable Password Scheme", USENIX 1999): Blowfish with the
  expensive key schedule (EksBlowfishSetup), 2^cost alternating key/salt
  ExpandKey rounds, then "OrpheanBeholderScryDoubt" ECB-encrypted 64 times.
- The Blowfish P/S initialization constants are the hex digits of π; rather
  than embed 1042 magic words, they are COMPUTED at first use from Machin's
  formula with integer arithmetic and asserted against the two well-known
  leading words (0x243F6A88, 0x85A308D3).
- Correctness is pinned by public OpenWall crypt_blowfish test vectors in
  tests/test_app.py (same vectors every bcrypt implementation ships).
- Performance: pure Python, ~1s at cost 5 — fine for tests and small keyed
  batches, NOT the 100 TB path (that's sha2 mode; with the wheel installed
  the C implementation takes over automatically).
"""

from __future__ import annotations

import struct
from functools import lru_cache

__all__ = ["hashpw", "gensalt_from_bytes"]

_B64_ALPHABET = "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
_B64_INDEX = {c: i for i, c in enumerate(_B64_ALPHABET)}
_MASK32 = 0xFFFFFFFF


def _atan_inv(x: int, one: int) -> int:
    """atan(1/x) in fixed-point (``one`` = 2^bits), Taylor with bigints."""
    total = 0
    term = one // x
    x2 = x * x
    k = 0
    while term:
        part = term // (2 * k + 1)
        total += -part if k & 1 else part
        term //= x2
        k += 1
    return total


@lru_cache(maxsize=1)
def _pi_words(n_words: int = 18 + 4 * 256) -> tuple[int, ...]:
    """First ``n_words`` 32-bit words of π's fractional hex expansion —
    the Blowfish P-array + S-box initializer."""
    bits = 32 * n_words + 64
    one = 1 << bits
    pi = 16 * _atan_inv(5, one) - 4 * _atan_inv(239, one)  # Machin
    frac = pi - 3 * one
    words = []
    for i in range(n_words):
        frac <<= 32
        words.append((frac >> bits) & _MASK32)
        frac &= one - 1
    assert words[0] == 0x243F6A88 and words[1] == 0x85A308D3, "pi stream broken"
    return tuple(words)


def _encipher(P, S0, S1, S2, S3, xl: int, xr: int) -> tuple[int, int]:
    for i in range(0, 16, 2):
        xl ^= P[i]
        xr ^= (
            ((S0[xl >> 24] + S1[(xl >> 16) & 0xFF]) & _MASK32)
            ^ S2[(xl >> 8) & 0xFF]
        ) + S3[xl & 0xFF] & _MASK32
        xr &= _MASK32
        xr ^= P[i + 1]
        xl ^= (
            ((S0[xr >> 24] + S1[(xr >> 16) & 0xFF]) & _MASK32)
            ^ S2[(xr >> 8) & 0xFF]
        ) + S3[xr & 0xFF] & _MASK32
        xl &= _MASK32
    xl ^= P[16]
    xr ^= P[17]
    return xr, xl  # final swap + P[17]/P[16] fold


def _expand_key(P, S, salt_words, key: bytes) -> None:
    klen = len(key)
    j = 0
    for i in range(18):
        w = 0
        for _ in range(4):
            w = ((w << 8) | key[j % klen]) & _MASK32
            j += 1
        P[i] ^= w
    S0, S1, S2, S3 = S
    l = r = 0
    n = 0
    for i in range(0, 18, 2):
        if salt_words:
            l ^= salt_words[n & 3]
            r ^= salt_words[(n + 1) & 3]
            n += 2
        l, r = _encipher(P, S0, S1, S2, S3, l, r)
        P[i], P[i + 1] = l, r
    for box in S:
        for k in range(0, 256, 2):
            if salt_words:
                l ^= salt_words[n & 3]
                r ^= salt_words[(n + 1) & 3]
                n += 2
            l, r = _encipher(P, S0, S1, S2, S3, l, r)
            box[k], box[k + 1] = l, r


def _eks_setup(cost: int, salt: bytes, key: bytes):
    words = _pi_words()
    P = list(words[:18])
    S = [list(words[18 + 256 * b : 18 + 256 * (b + 1)]) for b in range(4)]
    salt_words = struct.unpack(">4I", salt)
    _expand_key(P, S, salt_words, key)
    for _ in range(1 << cost):
        _expand_key(P, S, None, key)
        _expand_key(P, S, None, salt)
    return P, S


def _b64_encode(data: bytes) -> str:
    out = []
    i = 0
    while i < len(data):
        c1 = data[i]
        i += 1
        out.append(_B64_ALPHABET[c1 >> 2])
        c1 = (c1 & 0x03) << 4
        if i >= len(data):
            out.append(_B64_ALPHABET[c1])
            break
        c2 = data[i]
        i += 1
        c1 |= c2 >> 4
        out.append(_B64_ALPHABET[c1])
        c1 = (c2 & 0x0F) << 2
        if i >= len(data):
            out.append(_B64_ALPHABET[c1])
            break
        c2 = data[i]
        i += 1
        c1 |= c2 >> 6
        out.append(_B64_ALPHABET[c1])
        out.append(_B64_ALPHABET[c2 & 0x3F])
    return "".join(out)


def _b64_decode(s: str, n_bytes: int) -> bytes:
    bits = 0
    acc = 0
    out = bytearray()
    for ch in s:
        acc = (acc << 6) | _B64_INDEX[ch]
        bits += 6
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return bytes(out[:n_bytes])


def gensalt_from_bytes(raw16: bytes, *, rounds: int = 12, prefix: str = "2b") -> str:
    """Deterministic salt string from 16 raw bytes (the keyed-obfuscation
    setting: salt comes from config, not a CSPRNG)."""
    if len(raw16) != 16:
        raise ValueError("bcrypt salt needs exactly 16 raw bytes")
    return f"${prefix}${rounds:02d}${_b64_encode(raw16)}"


def hashpw(password: bytes, salt: str | bytes) -> str:
    """``bcrypt.hashpw`` twin: '$2a/2b$NN$<22 char salt>' → 60-char hash."""
    if isinstance(salt, bytes):
        salt = salt.decode("ascii")
    if not salt.startswith("$2"):
        raise ValueError("unsupported salt prefix")
    parts = salt.split("$")  # '', '2b', 'NN', salt+maybe-hash
    prefix, cost_s, rest = parts[1], parts[2], parts[3]
    if prefix not in ("2a", "2b", "2y"):
        raise ValueError(f"unsupported bcrypt variant {prefix}")
    cost = int(cost_s)
    if not 4 <= cost <= 31:
        raise ValueError("bcrypt cost out of range")
    raw_salt = _b64_decode(rest[:22], 16)
    key = password[:72] + b"\x00" if len(password) < 72 else password[:72]
    P, S = _eks_setup(cost, raw_salt, key)
    S0, S1, S2, S3 = S

    ctext = list(struct.unpack(">6I", b"OrpheanBeholderScryDoubt"))
    for _ in range(64):
        for off in range(0, 6, 2):
            ctext[off], ctext[off + 1] = _encipher(
                P, S0, S1, S2, S3, ctext[off], ctext[off + 1]
            )
    out = struct.pack(">6I", *ctext)
    return f"${prefix}${cost:02d}${rest[:22]}{_b64_encode(out[:23])}"
