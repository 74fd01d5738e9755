"""Census geocoder batch CSV wire format (SURVEY §2.1 S5).

The reference POSTs a headerless CSV of ``(index, address, city, region,
postal_code)`` and parses a 12-column CSV response
(lib/census_geocoder_api_client.py:23-44; response schema :37-41; short rows
for non-matches, tests/test_census_geocoder_api_client.py:11-15).  The engine
keeps that codec as pure functions used inside the ``mapInPandas`` transport
(request build / response parse per Arrow batch) and as a DataFrame parser
for offline response files.
"""

from __future__ import annotations

import csv
import io

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.schemas import GEOCODER_RESPONSE

__all__ = [
    "build_request_csv",
    "parse_response_csv",
    "response_to_geoids",
    "parse_response_df",
]

REQUEST_COLUMNS = ["address", "city", "region", "postal_code"]
RESPONSE_COLUMNS = [f.name for f in GEOCODER_RESPONSE.fields]


def build_request_csv(batch: pd.DataFrame) -> bytes:
    """Headerless request CSV; the row index is the join-back key
    (lib/census_geocoder_api_client.py:30-35)."""
    buf = io.StringIO()
    w = csv.writer(buf)
    for idx, row in batch[REQUEST_COLUMNS].iterrows():
        w.writerow([idx, *["" if pd.isna(v) else v for v in row]])
    return buf.getvalue().encode("utf-8")


def parse_response_csv(payload: bytes) -> pd.DataFrame:
    """12-column response; non-match rows arrive short and are null-padded
    (reference pads via names=range(12))."""
    rows = []
    for rec in csv.reader(io.StringIO(payload.decode("utf-8"))):
        if not rec:
            continue
        rec = rec[: len(RESPONSE_COLUMNS)]
        rec += [None] * (len(RESPONSE_COLUMNS) - len(rec))
        rows.append(rec)
    df = pd.DataFrame(rows, columns=RESPONSE_COLUMNS)
    df["index"] = pd.to_numeric(df["index"], errors="coerce")
    return df


def response_to_geoids(resp: pd.DataFrame) -> pd.Series:
    """geoid = state+county+tract for exact 'Match' rows, else null (F7;
    lib/census_geocoder_api_client.py:42-43), indexed by the request index."""
    matched = resp["match"] == "Match"
    geoid = (
        resp["state_id"].fillna("")
        + resp["county_id"].fillna("")
        + resp["tract_id"].fillna("")
    )
    out = geoid.where(matched & (geoid.str.len() == 11), None)
    out.index = resp["index"].astype("int64")
    return out


def parse_response_df(spark: SparkSession, path: str) -> DataFrame:
    """Offline/bulk form: read response CSVs as a DataFrame with the declared
    schema (no inference) and assemble geoids relationally."""
    df = spark.read.csv(path, schema=GEOCODER_RESPONSE, header=False)
    return df.withColumn(
        "geoid",
        F.when(
            (F.col("match") == "Match")
            & (F.length(F.concat("state_id", "county_id", "tract_id")) == 11),
            F.concat("state_id", "county_id", "tract_id"),
        ),
    )
