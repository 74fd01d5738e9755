"""Sources (S1-S3 SQL builders, S5 CSV codec, S9 config) + custom stateful
streaming operators."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
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


def test_load_config_encrypted_section_round_trip(tmp_path):
    """Reference layout (config/devel.yaml:2-33): PLAINTEXT_VARIABLES merge
    directly, ENCRYPTED_VARIABLES go through the injected decrypt hook (KMS
    in production, a fake here)."""
    y = tmp_path / "c.yaml"
    y.write_text(
        "PLAINTEXT_VARIABLES:\n"
        "  AWS_REGION: us-east-1\n"
        "  BATCH_SIZE: 20\n"
        "ENCRYPTED_VARIABLES:\n"
        "  DB_PASSWORD: enc:hunter2\n"
        "  BCRYPT_SALT: enc:pepper\n"
    )
    calls = []

    def fake_decrypt(ct):
        calls.append(ct)
        assert ct.startswith("enc:")
        return ct[4:]

    cfg = load_config(str(y), decrypt=fake_decrypt)
    assert cfg["AWS_REGION"] == "us-east-1" and cfg["BATCH_SIZE"] == 20
    assert cfg["DB_PASSWORD"] == "hunter2" and cfg["BCRYPT_SALT"] == "pepper"
    assert sorted(calls) == ["enc:hunter2", "enc:pepper"]


def test_load_config_encrypted_without_decryptor_fails_fast(tmp_path):
    """Secrets must never flow through as ciphertext: an encrypted section
    with no decrypt hook is a startup error, not a silent passthrough."""
    import pytest

    y = tmp_path / "c.yaml"
    y.write_text("ENCRYPTED_VARIABLES:\n  DB_PASSWORD: ciphertext\n")
    with pytest.raises(ValueError, match="no decrypt"):
        load_config(str(y))


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


def _three_batch_stream(spark, tmp_path):
    """Four time-separated micro-batches (1h apart): user 7 recurs in b1
    (twice, in-batch dup) and b4 — far past any minutes-scale watermark/TTL,
    and with TWO intervening watermark advances so the built-in dedup
    operator's commit-time eviction (which lags one batch) has fired before
    the recurrence arrives.  Users 8/9/10 appear once each."""
    import os
    import time

    base = dt.datetime(2024, 1, 1)
    hours = dt.timedelta(hours=1)
    batches = [
        [(1, base, 7, "click", 5.0, None),
         (2, base + dt.timedelta(seconds=30), 7, "click", 3.0, None),
         (3, base, 8, "view", 1.0, None)],
        [(4, base + hours, 9, "click", 2.0, None)],
        [(5, base + 2 * hours, 10, "view", 4.0, None)],
        [(6, base + 3 * hours, 7, "click", 9.0, None)],
    ]
    d = tmp_path / "stream3"
    now = time.time()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, EVENTS).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
        # file source orders batches by modification time — pin it
        for f in sorted((d).glob("part-*.parquet")):
            if os.path.getmtime(f) > now + i - 0.5:
                os.utime(f, (now + i, now + i))
    return str(d)


def _drain(out, tmp_path, name):
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _state_rows(q):
    import json

    totals = []
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        for op in d.get("stateOperators", []):
            totals.append(op["numRowsTotal"])
    return totals


def test_stream_dedup_state_evicts_under_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a 3-batch replay: duplicate keys
    within the watermark suppress, keys recurring AFTER it re-emit, and the
    state store sheds expired keys instead of accumulating stream history
    (SURVEY §7 risk 5 — the long-run memory bound)."""
    from engine.streaming.windows import stream_dedup

    path = _three_batch_stream(spark, tmp_path)
    stream = parquet_stream(spark, path, EVENTS, max_files_per_trigger=1)
    out = stream_dedup(stream, ["user_id"], "ts", watermark="5 minutes")
    q = _drain(out, tmp_path, "dedup_ttl_out")
    users = sorted(r["user_id"] for r in spark.sql(
        "select user_id from dedup_ttl_out").collect())
    # 7 emits in b1 AND b4 (3h >> 5m watermark); the in-batch dup suppresses
    assert users == [7, 7, 8, 9, 10]
    totals = _state_rows(q)
    # 6 state insertions happened overall (7,8 | 9 | 10 | 7) but the final
    # batch must hold only the un-expired tail, not the whole history
    assert totals and totals[-1] <= 3, totals


def test_dedup_audit_ttl_bounds_state_and_reemits(spark, tmp_path):
    """dedup_with_audit(ttl_minutes=...) — the custom stateful operator gets
    the same bound: a key recurring after the TTL re-emits (state was
    dropped) and final state size tracks the active set, not history."""
    path = _three_batch_stream(spark, tmp_path)
    stream = parquet_stream(spark, path, EVENTS, max_files_per_trigger=1)
    out = dedup_with_audit(stream, "user_id", ttl_minutes=5, watermark="1 minute")
    q = _drain(out, tmp_path, "audit_ttl_out")
    rows = spark.sql("select * from audit_ttl_out").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    # user 7: emitted in b1 (dup suppressed), state expires, emitted AGAIN in b4
    assert sum(r["emitted"] for r in by_key["7"]) == 2
    assert max(r["dup_count"] for r in by_key["7"]) == 1  # only the b1 in-batch dup
    assert sum(r["emitted"] for r in by_key["8"]) == 1
    assert sum(r["emitted"] for r in by_key["9"]) == 1
    assert sum(r["emitted"] for r in by_key["10"]) == 1
    totals = _state_rows(q)
    assert totals and totals[-1] <= 3, totals


def test_rocksdb_state_store_runs_stateful_query(spark, tmp_path):
    """The RocksDB state store provider (the long-run production posture)
    actually backs a stateful query end to end — progress metrics carry
    rocksdb counters, results identical to the default store."""
    from engine.streaming.stateful import rocksdb_state_conf
    from engine.streaming.windows import stream_dedup

    conf = rocksdb_state_conf()
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        path = _three_batch_stream(spark, tmp_path)
        stream = parquet_stream(spark, path, EVENTS, max_files_per_trigger=1)
        out = stream_dedup(stream, ["user_id"], "ts", watermark="5 minutes")
        q = _drain(out, tmp_path, "rocksdb_out")
        users = sorted(r["user_id"] for r in spark.sql(
            "select user_id from rocksdb_out").collect())
        assert users == [7, 7, 8, 9, 10]
        import json

        metrics = [
            json.loads(p.json).get("stateOperators", [])
            for p in q.recentProgress
        ]
        custom = [op.get("customMetrics", {}) for ops in metrics for op in ops]
        assert any(
            any(k.startswith("rocksdb") for k in m) for m in custom
        ), "rocksdb metrics absent — provider did not engage"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


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


def test_load_config_decrypt_errors_propagate(tmp_path):
    """The yaml import gate must not swallow a decrypt hook's ImportError
    (e.g. a lazy boto3 import on a box without it) — that would silently
    drop every secret."""
    import pytest

    y = tmp_path / "c.yaml"
    y.write_text("ENCRYPTED_VARIABLES:\n  DB_PASSWORD: ct\n")

    def broken_decrypt(ct):
        raise ImportError("No module named 'boto3'")

    with pytest.raises(ImportError, match="boto3"):
        load_config(str(y), decrypt=broken_decrypt)


def test_load_config_mixed_layout_keeps_flat_keys(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(
        "mode: updated\n"
        "PLAINTEXT_VARIABLES:\n  BATCH_SIZE: 7\n"
    )
    cfg = load_config(str(y))
    assert cfg["mode"] == "updated" and cfg["BATCH_SIZE"] == 7


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState's state-server protocol needs google.protobuf "
    "— not installed in this sandbox (probed 2026-08-15/16/17: "
    "pip download/install both DNS-blocked, no wheel anywhere on the host; "
    "same env-blocked class as the usaddress wheel). The old-API "
    "running_stats covers the semantics; this parity test arms "
    "automatically when protobuf lands.",
)
def test_running_stats_tws_parity_with_old_api(spark, tmp_path):
    """transformWithStateInPandas twin produces the same final per-key
    totals as the applyInPandasWithState implementation across the same
    two-batch stream (requires the RocksDB provider, which the new API
    mandates)."""
    from engine.streaming.stateful import (
        rocksdb_state_conf,
        running_stats_tws,
    )

    old = {}
    try:
        for k, v in rocksdb_state_conf().items():
            try:
                old[k] = spark.conf.get(k)
            except Exception:
                old[k] = None
            spark.conf.set(k, v)
        path = _two_batch_stream(spark, tmp_path)
        stream = parquet_stream(spark, path, EVENTS, max_files_per_trigger=1)
        out = running_stats_tws(stream, "user_id", "value")
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("stats_tws_out")
            .option("checkpointLocation", str(tmp_path / "ck_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.sql("select * from stats_tws_out").collect()
        final = {}
        for r in rows:
            if r["key"] not in final or r["n"] > final[r["key"]]["n"]:
                final[r["key"]] = r
        assert final["7"]["n"] == 3 and final["7"]["total"] == 10
        assert final["8"]["n"] == 1 and final["8"]["total"] == 1
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
