"""Two-tier geocode enrichment cascade (SURVEY §2.1 S5/S6, §2.8 F7/F8, §2.3 J9).

Reference behavior (lib/pipeline_controller.py:352-411):

1. census batch HTTP geocode of ``full_address`` rows (attempt 1);
2. re-parse malformed addresses, retry census (attempt 2), overlaying only
   still-null geoids;
3. rows with (house_number, street_name, zip) fall back to the in-process
   Geosupport library (attempt 3), borough→FIPS + tract-vintage coalesce.

Spark-first shape:

- each attempt is a ``mapInPandas`` stage: Arrow batch in → external call →
  Arrow batch out.  The *transport* is injected (a callable), exactly like the
  reference's mocked clients (tests/test_pipeline_controller.py:262-268), so
  tests and the harness run a deterministic fake while production injects an
  HTTP/FFI transport.  Arrow batch size (``maxRecordsPerBatch``) plays the
  role of the reference's API batch limit; partition count bounds external
  concurrency (the reference used 2 threads, nyc_geocoder_client.py:31).
- the J9 "retry fills only nulls" overlay is ``coalesce(attempt1, attempt2,
  attempt3)`` — no positional Series.update.
- retry/backoff/halving (ST7, census_geocoder_api_client.py:17-21,75-90)
  lives inside the transport wrapper: on failure it recursively halves the
  batch while ≥ ``min_split`` rows, then gives up to nulls.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = [
    "assemble_geoid",
    "borough_fips",
    "tract_coalesce",
    "census_geocode",
    "geosupport_geocode",
    "geocode_cascade",
    "fake_census_transport",
    "fake_geosupport",
]

# -- F7: geoid assembly (census_geocoder_api_client.py:42-43) ----------------
def assemble_geoid(state: Column, county: Column, tract: Column) -> Column:
    """11-char geoid = state(2) + county(3) + tract(6)."""
    return F.concat(state, county, tract)


# -- F8: borough→FIPS literal map (nyc_geocoder_client.py:8-14) --------------
BOROUGH_FIPS = {
    "MANHATTAN": "36061",
    "BRONX": "36005",
    "BROOKLYN": "36047",
    "QUEENS": "36081",
    "STATEN ISLAND": "36085",
}


def borough_fips(borough: Column | str) -> Column:
    c = F.col(borough) if isinstance(borough, str) else borough
    mapping = F.create_map(
        *[F.lit(x) for kv in BOROUGH_FIPS.items() for x in kv]
    )
    return mapping[F.upper(c)]


def tract_coalesce(*tract_cols: Column) -> Column:
    """first non-null census-tract vintage (2020/2010/2000/1990,
    nyc_geocoder_client.py:59-67)."""
    return F.coalesce(*tract_cols)


# ---------------------------------------------------------------------------
# Transports (injected; deterministic fakes for tests/harness)
# ---------------------------------------------------------------------------

#: transport signature: pd.DataFrame[address, city, region, postal_code] ->
#: pd.Series[str|None] of 11-char geoids aligned to the input index.
CensusTransport = Callable[[pd.DataFrame], pd.Series]


def fake_census_transport(
    match_rate_mod: int = 10, fail_mod: int | None = None
) -> CensusTransport:
    """Deterministic stand-in for the census batch API (S5).

    Hashes the full address to a stable pseudo-geoid; every ``match_rate_mod``-th
    hash bucket is a 'No_Match' (returns null), mirroring the reference's
    Match/No_Match/Tie response shapes (tests/test_census_geocoder_api_client.py:11-15).
    """

    def transport(batch: pd.DataFrame) -> pd.Series:
        def one(addr: str | None) -> str | None:
            if not addr:
                return None
            h = hashlib.sha256(addr.encode("utf-8")).digest()
            if h[0] % match_rate_mod == 0:
                return None  # No_Match
            state = f"{h[1] % 56 + 1:02d}"
            county = f"{h[2] % 800:03d}"
            tract = f"{int.from_bytes(h[3:6], 'big') % 1_000_000:06d}"
            return state + county + tract

        return batch["full_address"].map(one)

    return transport


def retrying_census_transport(
    inner: CensusTransport, *, max_retries: int = 2, min_split: int = 1000
) -> CensusTransport:
    """ST7 wrapper: retry then recursively halve the batch on failure
    (census_geocoder_api_client.py:75-90); exhausted sub-batches → nulls."""

    def transport(batch: pd.DataFrame) -> pd.Series:
        for _ in range(max_retries + 1):
            try:
                return inner(batch)
            except Exception:
                continue
        if len(batch) >= 2 * min_split:
            mid = len(batch) // 2
            return pd.concat(
                [transport(batch.iloc[:mid]), transport(batch.iloc[mid:])]
            )
        return pd.Series([None] * len(batch), index=batch.index, dtype="object")

    return transport


#: geosupport signature: (house_number, street_name, zip5) -> geoid | None
GeosupportFn = Callable[[str, str, str], "str | None"]


def fake_geosupport() -> GeosupportFn:
    """Deterministic Geosupport stand-in (S6): stable borough + tract from the
    input hash; per-row errors → null (nyc_geocoder_client.py:68-69)."""
    boroughs = list(BOROUGH_FIPS.values())

    def one(house: str | None, street: str | None, zip_code: str | None) -> str | None:
        if not house or not street or not zip_code:
            return None
        h = hashlib.sha256(f"{house}|{street}|{zip_code}".encode()).digest()
        fips = boroughs[h[0] % len(boroughs)]
        tract = f"{int.from_bytes(h[1:4], 'big') % 1_000_000:06d}"
        return fips + tract

    return one


# ---------------------------------------------------------------------------
# mapInPandas stages
# ---------------------------------------------------------------------------


def census_geocode(
    df: DataFrame,
    transport: CensusTransport,
    *,
    out_col: str = "geoid",
) -> DataFrame:
    """S5: batch-geocode via injected transport; adds ``out_col``.

    ``mapInPandas`` feeds the transport one Arrow batch at a time; setting
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the external batch
    size exactly like the reference's 10k-row API batches.
    """
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, StringType())])
    cols = list(df.columns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            res = b[cols].copy()
            res[out_col] = transport(b).astype("object")
            yield res

    return df.mapInPandas(run, schema=out_schema)


def geosupport_geocode(
    df: DataFrame,
    fn: GeosupportFn,
    *,
    house_col: str = "house_number",
    street_col: str = "street_name",
    zip_col: str = "postal_code",
    out_col: str = "geoid_nyc",
) -> DataFrame:
    """S6: per-row native-library geocode.  The library handle is created
    inside the task (one per worker, lazy) — the iterator form means init
    happens once per partition, replacing the reference's 2-thread pool."""
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, StringType())])
    cols = list(df.columns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        geocode = fn  # lazy per-task handle
        for b in batches:
            res = b[cols].copy()
            res[out_col] = [
                geocode(h, s, z)
                for h, s, z in zip(b[house_col], b[street_col], b[zip_col])
            ]
            yield res

    return df.mapInPandas(run, schema=out_schema)


#: release ledger for the most recent cascade's attempt caches (see the
#: persist comment inside geocode_cascade)
_CASCADE_CACHE_LAST: list = []


def geocode_cascade(
    addresses: DataFrame,
    census: CensusTransport,
    geosupport: GeosupportFn,
    *,
    parse_fn=None,
) -> DataFrame:
    """The full 3-attempt cascade (lib/pipeline_controller.py:352-411) on a
    frame with columns (patron_id, address, city, region, postal_code).

    Returns the frame + ``geoid`` column (null where all attempts failed).
    The overlay between attempts is ``coalesce`` (J9) — each attempt only ever
    fills rows the previous attempts left null, computed only for those rows.
    """
    from engine.ops.address import (
        full_address,
        scrub_quotes,
        with_parsed_address,
        zip5,
    )

    base = (
        addresses.withColumns(
            {c: scrub_quotes(c) for c in ("address", "city", "region", "postal_code")}
        )
        .withColumn("full_address", full_address("address", "city", "region", "postal_code"))
        .filter(F.length("full_address") > 0)
    )

    # attempt 1: census on the raw assembled address.  Each attempt is
    # persisted: downstream joins/filters branch from it, and recomputation
    # would re-invoke the EXTERNAL transport (cost + rate limits) — the
    # cache pin is part of the operator's at-most-once-per-attempt contract.
    # A 1-deep release ledger bounds the session leak to one cascade's two
    # frames (the advice-r8 discipline): each new cascade call releases the
    # previous call's caches — unpersist is lineage-safe for an already-
    # collected result, and an un-collected one recomputes (acceptable for
    # the FAKE transports of the gate corpus; a production caller holding
    # two live cascades should persist AND materialize its own copies
    # before starting the next cascade).  NOT thread-safe: concurrent
    # cascades in one session would release each other's in-flight
    # attempt caches and re-invoke the external transport — serialize
    # cascade calls or fork sessions (second review r9).
    while _CASCADE_CACHE_LAST:
        _CASCADE_CACHE_LAST.pop().unpersist()
    a1 = census_geocode(base, census, out_col="geoid_a1").persist()
    _CASCADE_CACHE_LAST.append(a1)

    # attempt 2: re-parse malformed (still-null) rows, rebuild address, retry
    misses1 = a1.filter(F.col("geoid_a1").isNull()).drop("geoid_a1")
    parsed = (parse_fn or with_parsed_address)(misses1)
    reparsed = parsed.withColumn(
        "full_address",
        F.trim(
            F.concat_ws(
                " ",
                F.coalesce(F.col("house_number"), F.lit("")),
                F.coalesce(F.col("street_name"), F.lit("")),
                F.col("city"),
                F.col("region"),
                zip5("postal_code"),
            )
        ),
    )
    a2 = census_geocode(reparsed, census, out_col="geoid_a2").persist()
    _CASCADE_CACHE_LAST.append(a2)

    # attempt 3: Geosupport for rows with house+street+zip
    misses2 = a2.filter(F.col("geoid_a2").isNull())
    eligible = misses2.filter(
        F.col("house_number").isNotNull()
        & F.col("street_name").isNotNull()
        & F.col("postal_code").isNotNull()
    )
    a3 = geosupport_geocode(
        eligible.withColumn("postal_code", zip5("postal_code")),
        geosupport,
        out_col="geoid_a3",
    )

    # J9 overlay: later attempts fill only null slots of earlier ones
    key = "patron_id"
    merged = (
        a1.join(
            F.broadcast(a2.select(key, "geoid_a2")), on=key, how="left"
        )
        .join(F.broadcast(a3.select(key, "geoid_a3")), on=key, how="left")
        .withColumn("geoid", F.coalesce("geoid_a1", "geoid_a2", "geoid_a3"))
        .drop("geoid_a1", "geoid_a2", "geoid_a3")
    )
    return merged
