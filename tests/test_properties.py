"""Property-based tests (hypothesis) for the pure-Python seams: Avro binary
codec, address parsing, census CSV codec.  These are the components with no
SQL oracle — randomized round-trips are their correctness gate."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.ops.address import _parse_one, _to_ascii
from engine.ops.avro_codec import decode_record, encode_record, zigzag_decode, zigzag_encode
from engine.sources.censuscsv import build_request_csv, parse_response_csv

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(I64)
def test_zigzag_round_trip(n):
    buf = zigzag_encode(n)
    val, pos = zigzag_decode(buf, 0)
    assert val == n and pos == len(buf)


RECORD_SCHEMA = {
    "fields": [
        {"name": "s", "type": ["null", "string"]},
        {"name": "n", "type": ["null", "long"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "b", "type": ["null", "boolean"]},
    ]
}

record = st.fixed_dictionaries(
    {
        "s": st.none() | st.text(max_size=200),
        "n": st.none() | I64,
        "d": st.none() | st.floats(allow_nan=False, allow_infinity=False),
        "b": st.none() | st.booleans(),
    }
)


@given(record)
@settings(max_examples=200)
def test_avro_record_round_trip(rec):
    assert decode_record(encode_record(rec, RECORD_SCHEMA), RECORD_SCHEMA) == rec


@given(st.none() | st.text(max_size=120))
@settings(max_examples=300)
def test_parse_one_total_function(addr):
    """The parser must be total: any input → 3-tuple, never an exception."""
    house, street, unit = _parse_one(addr)
    for v in (house, street, unit):
        assert v is None or (isinstance(v, str) and v == v.strip())


@given(st.text(max_size=120))
@settings(max_examples=300)
def test_to_ascii_is_ascii(s):
    out = _to_ascii(s)
    out.encode("ascii")  # must never raise


@given(
    st.lists(
        st.tuples(
            st.none() | st.text(alphabet=st.characters(blacklist_characters="\r\n", blacklist_categories=("Cs",)), max_size=40),
            st.none() | st.text(alphabet="abc XYZ'\"", max_size=10),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=100)
def test_request_csv_one_line_per_row(rows):
    batch = pd.DataFrame(
        {
            "address": [a for a, _ in rows],
            "city": [c for _, c in rows],
            "region": ["NY"] * len(rows),
            "postal_code": ["10001"] * len(rows),
        }
    )
    payload = build_request_csv(batch)
    import csv as _csv
    import io

    parsed = list(_csv.reader(io.StringIO(payload.decode())))
    assert len(parsed) == len(rows)
    assert all(rec[0] == str(i) for i, rec in enumerate(parsed))


def test_parse_response_handles_ragged_rows():
    ragged = b'"0","A","Match","Exact","A","1,2","t","L","36","061","019000","2001"\n"1"\n"2","B"\n\n'
    out = parse_response_csv(ragged)
    assert len(out) == 3
    assert out["match"].tolist() == ["Match", None, None]


# ---------------------------------------------------------------------------
# round-2 pure-Python seams: PNG codec, bcrypt b64, pi stream
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_png_encode_decode_round_trip(w, h, ch, seed):
    """decode(encode(pixels)) == pixels for arbitrary small images — the
    filter-reconstruction path is exercised via zlib'd scanlines."""
    import hashlib

    from engine.extended.imagecodec import png_decode, png_encode

    need = w * h * ch
    stream = bytearray()
    counter = 0
    while len(stream) < need:
        stream += hashlib.sha256(f"{seed}|{counter}".encode()).digest()
        counter += 1
    pixels = bytes(stream[:need])
    data = png_encode(pixels, w, h, ch)
    dw, dh, dch, out = png_decode(data)
    assert (dw, dh, dch) == (w, h, ch)
    assert out == pixels


@given(st.binary(min_size=0, max_size=40))
@settings(max_examples=50, deadline=None)
def test_bcrypt_b64_round_trip(raw):
    from engine.ops.bcrypt_pure import _b64_decode, _b64_encode

    assert _b64_decode(_b64_encode(raw), len(raw)) == raw


@given(st.binary(min_size=16, max_size=16), st.binary(min_size=0, max_size=30))
@settings(max_examples=5, deadline=None)
def test_bcrypt_deterministic_and_salt_sensitive(salt16, pw):
    from engine.ops.bcrypt_pure import gensalt_from_bytes, hashpw

    salt = gensalt_from_bytes(salt16, rounds=4)
    h1 = hashpw(pw, salt)
    assert h1 == hashpw(pw, salt)           # deterministic
    assert h1.startswith("$2b$04$") and len(h1) == 60
    other = gensalt_from_bytes(bytes(b ^ 0xFF for b in salt16), rounds=4)
    assert hashpw(pw, other) != h1          # salt changes the hash
