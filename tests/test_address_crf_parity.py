"""CRF-vs-fallback address-tagger parity harness (VERDICT r10 #6).

The engine's F9 path has two taggers: the real ``usaddress`` CRF (env-gated;
the wheel is DNS-blocked in this harness — 9 probes r4-r11) and the
deterministic fallback (engine/ops/address.py:_fallback_tagger).  The
fallback is pinned by goldens, but its residual gap to the CRF has only ever
been prose.  This test makes it a MEASURED number: it runs
``reformat_malformed_address`` with both taggers over a few hundred
NYC-shaped addresses and reports the per-field divergence rate, failing only
if the fallback diverges from the CRF on more than DIVERGENCE_BUDGET of the
corpus for any reference-read field (city/region/postal_code/house_number/
street_name — the fields the reference's extraction actually consumes,
helpers/address_helper.py:29-36).

Skipped with a recorded reason while the wheel is absent; arms automatically
the round it lands.
"""

from __future__ import annotations

import itertools

import pytest

from engine.ops.address import HAS_USADDRESS

#: max fraction of corpus rows where fallback != CRF, per field.  The
#: fallback intentionally covers the reference's test shapes, not the CRF's
#: full model, so some divergence is expected — the budget keeps it bounded
#: and the printed report shows exactly where it sits.
DIVERGENCE_BUDGET = 0.10

_FIELDS = ("city", "region", "postal_code", "house_number", "street_name")


def nyc_corpus() -> list[str]:
    """~400 deterministic NYC-shaped addresses spanning every fallback
    branch: plain street types, pre/post directionals, Queens hyphenated
    house numbers, fractions, units (marker and identifier-first), PO
    boxes, highways, pre-type OF-names, intersections, borough/state/zip
    tails, and messy charset/punctuation variants."""
    streets = [
        "MAIN ST", "W 79TH ST", "AVENUE OF THE AMERICAS", "E 161ST ST",
        "GRAND CONCOURSE", "OCEAN PKWY", "QUEENS BLVD", "ROUTE 9W",
        "US HIGHWAY 1", "ST NICHOLAS AVE", "MALCOLM X BLVD",
        "FORT WASHINGTON AVE", "BEACH 116TH ST", "AVE W",
    ]
    houses = ["123", "37-61", "61A", "2109", "123 1/2", "37-61A"]
    tails = [
        "",
        " BROOKLYN NY 11223",
        " NEW YORK, NY 10001",
        " FLUSHING NY",
        " BRONX, NY 10451-2301",
        " STATEN ISLAND NY 10301",
    ]
    units = ["", " APT 4B", " #2F", " STE 200", " FL 3"]
    corpus = []
    for house, street, unit, tail in itertools.product(
        houses[:4], streets[:10], units[:3], tails[:3]
    ):
        corpus.append(f"{house} {street}{unit}{tail}")
    # lower-volume branches: fractions, PO boxes, intersections, highways
    for house in houses[4:]:
        for street in streets[:4]:
            corpus.append(f"{house} {street} QUEENS NY 11373")
    for box in ("PO BOX 220", "P.O. BOX 1234"):
        for tail in tails[1:4]:
            corpus.append(f"{box}{tail}")
    for a, b in [("BROADWAY", "W 79TH ST"), ("QUEENS BLVD", "63RD DR")]:
        corpus.append(f"{a} & {b} NEW YORK NY")
        corpus.append(f"{a} AND {b}")
    for street in streets[10:]:
        for house in houses[:3]:
            corpus.append(f"{house} {street} NY 10032")
    # charset variants the scrub path must normalize identically
    corpus.append("123 CAFÉ ST NEW YORK NY 10001")
    corpus.append("61-15 JOSÉ AVE FLUSHING NY 11373")
    assert len(corpus) >= 300, len(corpus)
    return corpus


@pytest.mark.skipif(
    not HAS_USADDRESS,
    reason="usaddress CRF wheel not installed — DNS-blocked in this harness "
    "(9 download probes r4-r11, latest 2026-08-17: pip cannot resolve the "
    "index host). The fallback tagger is pinned by goldens "
    "(tests/test_address_geocode.py); this parity report arms automatically "
    "when the wheel lands.",
)
def test_fallback_tagger_parity_with_crf():
    from engine.ops.address import (
        _ADDRESS_TAG_MAP,
        _fallback_tagger,
        _usaddress,
        reformat_malformed_address,
    )

    def crf_tagger(s):
        return _usaddress.tag(s, tag_mapping=_ADDRESS_TAG_MAP)

    corpus = nyc_corpus()
    diverged: dict[str, list[str]] = {f: [] for f in _FIELDS}
    for addr in corpus:
        row = {"full_address": addr, "city": "", "region": "",
               "postal_code": "", "address": "", "street_name": ""}
        got_crf = reformat_malformed_address(dict(row), tagger=crf_tagger)
        got_fb = reformat_malformed_address(dict(row), tagger=_fallback_tagger)
        for f in _FIELDS:
            if got_crf[f] != got_fb[f]:
                diverged[f].append(addr)

    n = len(corpus)
    report = {f: round(len(v) / n, 4) for f, v in diverged.items()}
    print(f"\nCRF-vs-fallback divergence over {n} addresses: {report}")
    for f, v in diverged.items():
        for addr in v[:5]:
            print(f"  {f}: {addr!r}")
    worst = max(report.values())
    assert worst <= DIVERGENCE_BUDGET, (
        f"fallback diverges from CRF beyond budget: {report} "
        f"(examples printed above)"
    )


def test_parity_corpus_is_well_formed():
    """The corpus itself must stay runnable in every env (wheel or not):
    deterministic, non-trivial, and parseable by the fallback without
    exceptions — so the gated test above can't rot while skipped."""
    from engine.ops.address import _fallback_tagger, reformat_malformed_address

    corpus = nyc_corpus()
    assert len(corpus) == len(set(corpus)) >= 300
    parsed_house = 0
    for addr in corpus:
        row = {"full_address": addr, "city": "", "region": "",
               "postal_code": "", "address": "", "street_name": ""}
        out = reformat_malformed_address(row, tagger=_fallback_tagger)
        assert set(_FIELDS) <= set(out)
        parsed_house += bool(out["house_number"])
    # most corpus rows carry a house number the fallback must extract
    assert parsed_house >= 0.7 * len(corpus)
