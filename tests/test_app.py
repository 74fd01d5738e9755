"""Top-level orchestration (engine.app): three modes, one run timestamp,
shared cross-mode dedup, Avro+Kinesis sink on the wire."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from engine.app import make_avro_kinesis_sink, run_all_modes
from engine.ops.avro_codec import decode_record
from engine.ops.sinks import CollectingTransport
from engine.ops.state import LocalJsonStateStore
from engine.pipeline import PipelineConfig
from engine.schemas import SINK_AVRO_SCHEMA, SINK_RECORD


def test_run_all_modes_cross_mode_dedup(spark, sierra_df, tmp_path):
    """A patron seen in NEW mode must not re-emit from UPDATED mode in the
    same run (reference pins this with pre-seeded processed_ids,
    tests/test_pipeline_controller.py:451-459)."""
    store = LocalJsonStateStore(str(tmp_path / "state.json"))
    cfg = PipelineConfig(salt="app", batch_size=10)
    transport = CollectingTransport()
    # driver mode: CollectingTransport is driver-side-only; the factory
    # default is the executor foreachPartition path.
    sink = make_avro_kinesis_sink(transport, mode="driver")
    patron_info = spark.createDataFrame([], SINK_RECORD)
    deleted = spark.createDataFrame(
        [(123, dt.date(2021, 5, 1)), (555, dt.date(2021, 5, 2))],
        "patron_id_plaintext long, deletion_date_et date",
    )

    report = run_all_modes(
        spark,
        cfg,
        store,
        active_source=sierra_df,
        deleted_source=deleted,
        patron_info=patron_info,
        sink=sink,
        now=dt.datetime(2021, 6, 1),
    )

    # NEW emitted the 3 distinct patrons; UPDATED re-scanned the same rows
    # but every key was already in the session set → zero re-emissions
    assert report.new.rows_out == 3
    assert report.updated.rows_out == 0
    # DELETED: 123 already processed this run → only 555 emits
    assert report.deleted.rows_out == 1

    decoded = [decode_record(bytes(b), SINK_AVRO_SCHEMA) for b in transport.records]
    assert len(decoded) == 4
    # the deleted record carries its deletion date on the wire
    deleted_recs = [d for d in decoded if d["deletion_date_et"] is not None]
    assert len(deleted_recs) == 1 and deleted_recs[0]["deletion_date_et"] == "2021-05-02"

    # watermarks advanced independently per mode
    st = store.get()
    assert st["creation_dt"] == "2021-01-01 03:00:00"
    assert st["update_dt"] == "2021-01-01 03:00:00"
    assert st["deletion_date"] == "2021-05-02"
