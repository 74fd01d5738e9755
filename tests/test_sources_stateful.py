"""Sources (S1-S3 SQL builders, S5 CSV codec, S9 config) + custom stateful
streaming operators."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from engine.schemas import EVENTS
from engine.sources.censuscsv import (
    build_request_csv,
    parse_response_csv,
    parse_response_df,
    response_to_geoids,
)
from engine.sources.config import load_config
from engine.sources.jdbc import (
    IncrementalScanSpec,
    build_active_scan_sql,
    build_deleted_scan_sql,
    build_keyed_lookup_sql,
)
from engine.streaming.incremental import parquet_stream
from engine.streaming.stateful import dedup_with_audit, running_stats


# -- S1/S2/S3 SQL builders (reference helpers/query_helper.py shapes) --------


def test_active_scan_sql_shape():
    spec = IncrementalScanSpec(
        table="sierra_view.record_metadata",
        ts_col="creation_date_gmt",
        projection=["id", "creation_date_gmt"],
        batch_size=10000,
        extra_where=["record_type_code = 'p'"],
        joins=["LEFT JOIN addr ON id = addr.record_id"],
        order_tail=["display_order", "addr_type"],
    )
    sql = build_active_scan_sql(spec, "2020-01-01 00:00:00-05", "2021-01-01 00:00:00")
    assert "creation_date_gmt >= '2020-01-01 00:00:00-05'" in sql
    assert "creation_date_gmt < '2021-01-01 00:00:00'" in sql
    assert "creation_date_gmt IS NOT NULL" in sql
    assert "record_type_code = 'p'" in sql
    assert "LEFT JOIN addr" in sql
    assert sql.strip().endswith("LIMIT 10000")
    assert "ORDER BY creation_date_gmt, display_order, addr_type" in sql


def test_deleted_scan_and_keyed_lookup_sql():
    sql = build_deleted_scan_sql("t", "id", "deletion_date_gmt", "2020-01-01", "2021-01-01", 500000)
    assert "LIMIT 500000" in sql and "deletion_date_gmt IS NOT NULL" in sql
    lookup = build_keyed_lookup_sql("patron_info", ["patron_id", "geoid"], "address_hash", ["h1", "o'h2"])
    assert "WHERE address_hash IN ('h1', 'o''h2')" in lookup  # quote-escaped


# -- S5 CSV codec -------------------------------------------------------------

RESPONSE = (
    b'"0","1 MAIN ST","Match","Exact","1 MAIN ST, NY","-73.9,40.7","111","L","36","061","019000","2001"\n'
    b'"1","2 ELM ST","No_Match"\n'
    b'"2","3 OAK AVE","Tie"\n'
)


def test_request_response_round_trip():
    batch = pd.DataFrame(
        {
            "address": ["1 Main St", None],
            "city": ["NYC", "NYC"],
            "region": ["NY", "NY"],
            "postal_code": ["10001", "10002"],
        }
    )
    csv_bytes = build_request_csv(batch)
    lines = csv_bytes.decode().strip().split("\r\n")
    assert lines[0] == "0,1 Main St,NYC,NY,10001"
    assert lines[1] == "1,,NYC,NY,10002"  # null → empty slot

    resp = parse_response_csv(RESPONSE)
    assert len(resp) == 3
    geoids = response_to_geoids(resp)
    assert geoids[0] == "36061019000"
    assert geoids[1] is None and geoids[2] is None  # No_Match / Tie


def test_parse_response_df(spark, tmp_path):
    p = tmp_path / "resp.csv"
    p.write_bytes(RESPONSE)
    df = parse_response_df(spark, str(p))
    rows = {r["index"]: r["geoid"] for r in df.collect()}
    assert rows == {0: "36061019000", 1: None, 2: None}


# -- S9 config ----------------------------------------------------------------


def test_load_config_layering(tmp_path, monkeypatch):
    y = tmp_path / "c.yaml"
    y.write_text("batch_size: 50\nsalt: yaml-salt\n")
    monkeypatch.setenv("ENGINE_BATCH_SIZE", "99")
    cfg = load_config(str(y), defaults={"batch_size": 1, "mode": "new"})
    assert cfg["batch_size"] == 99  # env wins
    assert cfg["salt"] == "yaml-salt"  # yaml beats default
    assert cfg["mode"] == "new"  # default survives


# -- custom stateful operators -------------------------------------------------


def _two_batch_stream(spark, tmp_path):
    """Two parquet files + maxFilesPerTrigger=1 → two micro-batches."""
    base = dt.datetime(2024, 1, 1)
    b1 = [(1, base, 7, "click", 5.0, None), (2, base, 7, "click", 3.0, None)]
    b2 = [(3, base + dt.timedelta(minutes=1), 7, "click", 2.0, None),
          (4, base + dt.timedelta(minutes=1), 8, "view", 1.0, None)]
    d = tmp_path / "stream"
    spark.createDataFrame(b1, EVENTS).coalesce(1).write.mode("overwrite").parquet(str(d / "f1"))
    spark.createDataFrame(b2, EVENTS).coalesce(1).write.mode("append").parquet(str(d / "f1"))
    return str(d / "f1")


def test_dedup_with_audit_cross_batch(spark, tmp_path):
    path = _two_batch_stream(spark, tmp_path)
    stream = parquet_stream(spark, path, EVENTS, max_files_per_trigger=1)
    out = dedup_with_audit(stream, "user_id")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("audit_out")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from audit_out").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    # user 7 appears in both batches: emitted exactly once overall
    assert sum(r["emitted"] for r in by_key["7"]) == 1
    assert max(r["dup_count"] for r in by_key["7"]) == 2  # 3 events - 1 emission
    assert sum(r["emitted"] for r in by_key["8"]) == 1
    assert max(r["dup_count"] for r in by_key["8"]) == 0


def test_running_stats_accumulates(spark, tmp_path):
    path = _two_batch_stream(spark, tmp_path)
    stream = parquet_stream(spark, path, EVENTS, max_files_per_trigger=1)
    out = running_stats(stream, "user_id", "value")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stats_out")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from stats_out").collect()
    final = {}
    for r in rows:
        if r["key"] not in final or r["n"] > final[r["key"]]["n"]:
            final[r["key"]] = r
    assert final["7"]["n"] == 3 and final["7"]["total"] == 10
    assert final["8"]["n"] == 1 and final["8"]["total"] == 1
