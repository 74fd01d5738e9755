"""Address scrub / assembly / parse / normalize (SURVEY §2.8 F3/F4/F5/F9/F10).

Built-in Spark expressions cover the scrub/assembly/truncate steps (they stay
in whole-stage codegen); the free-text *parse* step (reference: the
``usaddress`` CRF tagger, helpers/address_helper.py:20-50) is a Python seam.
The harness image has neither ``usaddress`` nor ``unidecode``, so the parse
UDF uses them when importable and otherwise falls back to a deterministic
regex tagger + ASCII transliteration table covering the reference's test
shapes (house number / street / unit, unicode scrub —
tests/test_address_helper.py:60-116 in /root/reference).
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # optional
    import usaddress as _usaddress  # type: ignore

    HAS_USADDRESS = True
except ImportError:  # pragma: no cover
    _usaddress = None
    HAS_USADDRESS = False

__all__ = [
    "scrub_quotes",
    "full_address",
    "zip5",
    "ascii_scrub_expr",
    "parse_address_udf",
    "HAS_USADDRESS",
]

# -- F3: quote/backslash strip (lib/pipeline_controller.py:367-369) ----------
_QUOTE_RE = "['\"\\\\]"


def scrub_quotes(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _QUOTE_RE, "")


# -- F4: full-address assembly (lib/pipeline_controller.py:370-373) ----------
def full_address(*cols: str) -> Column:
    """Space-join address parts, null-safe, trimmed.  ``concat_ws`` skips
    nulls, which here matches the reference's ``fillna('') + strip()``."""
    return F.trim(F.concat_ws(" ", *[F.col(c) for c in cols]))


# -- F5: ZIP+4 → zip5 (lib/pipeline_controller.py:231-232) -------------------
def zip5(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, 5)


# -- F10: per-field charset whitelists (helpers/address_helper.py:52-68) -----
_FIELD_WHITELIST = {
    # keep letters/space/hyphen for city & region
    "city": "[^A-Za-z \\-]",
    "region": "[^A-Za-z \\-]",
    # street line also keeps digits and light punctuation
    "street": "[^A-Za-z0-9 \\-.#/&]",
    # zip keeps digits and hyphen
    "zip": "[^0-9\\-]",
}


def ascii_scrub_expr(col: Column | str, field: str) -> Column:
    """Whitelist scrub for one address field (applied after transliteration).

    The unicode→ascii step itself is in the parse UDF (no Spark built-in
    transliterates); this expression is the JVM-side second half.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _FIELD_WHITELIST[field], "")


# ---------------------------------------------------------------------------
# F9 (+unicode half of F10): free-text parse into components
# ---------------------------------------------------------------------------

# Deterministic fallback transliteration: NFKD-decompose and drop combining
# marks; a small table for characters NFKD can't decompose.
_TRANSLIT = str.maketrans(
    {
        "ß": "ss", "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O",
        "đ": "d", "Đ": "D", "ł": "l", "Ł": "L", "þ": "th", "Þ": "Th",
        "œ": "oe", "Œ": "OE", "ð": "d", "Ð": "D",
    }
)


def _to_ascii(s: str) -> str:
    s = s.translate(_TRANSLIT)
    return (
        unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")
    )


# Fallback tagger: leading house number, optional unit suffix, rest = street.
_ADDR_RE = re.compile(
    r"^\s*(?P<house>\d+[A-Za-z]?(?:-\d+)?)?\s*(?P<street>[^,#]*?)"
    r"(?:\s*(?:#|APT\.?|UNIT|STE\.?|SUITE|FL\.?|RM\.?)\s*(?P<unit>[\w-]+))?\s*$",
    re.IGNORECASE,
)

# usaddress label → output slot, mirroring the reference's ``_ADDRESS_TAG_MAP``
# (helpers/address_helper.py:10-17): everything street-ish folds into street_name.
_USADDRESS_MAP = {
    "AddressNumber": "house_number",
    "AddressNumberPrefix": "house_number",
    "AddressNumberSuffix": "house_number",
    "StreetNamePreDirectional": "street_name",
    "StreetNamePreModifier": "street_name",
    "StreetNamePreType": "street_name",
    "StreetName": "street_name",
    "StreetNamePostType": "street_name",
    "StreetNamePostDirectional": "street_name",
    "OccupancyType": "unit",
    "OccupancyIdentifier": "unit",
}


def _parse_one(addr: str | None) -> tuple[str | None, str | None, str | None]:
    """→ (house_number, street_name, unit); Nones on unparseable input."""
    if addr is None or not addr.strip():
        return (None, None, None)
    addr = _to_ascii(addr)
    if HAS_USADDRESS:  # pragma: no cover - not in harness image
        try:
            tagged, _ = _usaddress.tag(addr)
            slots: dict[str, list[str]] = {}
            for label, value in tagged.items():
                slot = _USADDRESS_MAP.get(label)
                if slot:
                    slots.setdefault(slot, []).append(value)
            return (
                " ".join(slots.get("house_number", [])) or None,
                " ".join(slots.get("street_name", [])) or None,
                " ".join(slots.get("unit", [])) or None,
            )
        except _usaddress.RepeatedLabelError:
            # reference de-dups repeated label values and joins them
            # (helpers/address_helper.py:72-102); fall through to regex
            pass
    m = _ADDR_RE.match(addr)
    if not m:
        return (None, addr.strip() or None, None)
    house = m.group("house")
    street = (m.group("street") or "").strip(" ,") or None
    unit = m.group("unit")
    return (house, street, unit)


PARSED_SCHEMA = "house_number string, street_name string, unit string"

_parse_udf_cache = None


def parse_address_udf():
    """Arrow-batched struct-returning parse UDF (F9+F10 unicode half).

    Built lazily — pandas_udf needs an active SparkSession to parse the DDL
    return type, so the decorator cannot run at import time.
    """
    global _parse_udf_cache
    if _parse_udf_cache is None:

        @pandas_udf(PARSED_SCHEMA)
        def _udf(addr: pd.Series) -> pd.DataFrame:
            rows = [_parse_one(a) for a in addr]
            return pd.DataFrame(rows, columns=["house_number", "street_name", "unit"])

        _parse_udf_cache = _udf
    return _parse_udf_cache


def with_parsed_address(df: DataFrame, addr_col: str = "full_address") -> DataFrame:
    """Attach house_number / street_name / unit columns (reference
    ``reformat_malformed_address``, applied at lib/pipeline_controller.py:389)."""
    parsed = parse_address_udf()(F.col(addr_col)).alias("__p")
    return (
        df.withColumn("__p", parsed)
        .withColumn("house_number", F.col("__p.house_number"))
        .withColumn("street_name", F.col("__p.street_name"))
        .withColumn("unit", F.col("__p.unit"))
        .drop("__p")
    )
