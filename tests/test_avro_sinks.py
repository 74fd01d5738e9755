"""Avro codec (S7) round-trips + Kinesis-style sink batching (S8)."""

from __future__ import annotations

from engine.ops.avro_codec import (
    avro_encode_udf,
    decode_record,
    encode_record,
    zigzag_encode,
)
from engine.ops.sinks import (
    KINESIS_MAX_BATCH,
    CollectingTransport,
    avro_project,
    kinesis_put_batch,
    write_kinesis,
)
from engine.schemas import SINK_AVRO_SCHEMA, SINK_RECORD


def test_zigzag_known_values():
    # Avro spec examples
    assert zigzag_encode(0) == b"\x00"
    assert zigzag_encode(-1) == b"\x01"
    assert zigzag_encode(1) == b"\x02"
    assert zigzag_encode(-2) == b"\x03"
    assert zigzag_encode(64) == b"\x80\x01"


def test_record_round_trip():
    rec = {
        "patron_id": "abc",
        "address_hash": None,
        "postal_code": "10001",
        "geoid": "36061012345",
        "creation_date_et": "2021-01-01",
        "deletion_date_et": None,
        "circ_active_date_et": None,
        "ptype_code": 10,
        "pcode3": None,
        "patron_home_library_code": "aa",
        "initial_patron_home_library_code": None,
    }
    buf = encode_record(rec, SINK_AVRO_SCHEMA)
    assert isinstance(buf, bytes) and len(buf) > 0
    assert decode_record(buf, SINK_AVRO_SCHEMA) == rec


def test_avro_project_and_decode(spark, sierra_df):
    from engine.pipeline import PipelineConfig, new_patrons_graph

    out = new_patrons_graph(sierra_df, PipelineConfig(salt="s"))
    cols = [f.name for f in SINK_RECORD.fields]
    enc = avro_project(out, cols, SINK_AVRO_SCHEMA)
    assert enc.columns == ["record"]
    records = [bytes(r["record"]) for r in enc.collect()]
    decoded = [decode_record(b, SINK_AVRO_SCHEMA) for b in records]
    assert {d["postal_code"] for d in decoded} >= {"10001", "11201"}


def test_kinesis_batching_caps_at_500():
    transport = CollectingTransport()
    calls = kinesis_put_batch([b"x"] * 1203, transport, batch_id=7)
    assert calls == 3
    sizes = [len(b) for _, b in transport.batches]
    assert sizes == [KINESIS_MAX_BATCH, KINESIS_MAX_BATCH, 203]
    assert all(bid == 7 for bid, _ in transport.batches)


def test_write_kinesis_driver_mode_and_dry_run(spark):
    df = spark.createDataFrame([(b"a",), (b"b",)], "record binary")
    transport = CollectingTransport()
    n = write_kinesis(df, transport, mode="driver")
    assert n == 2 and len(transport.records) == 2
    n2 = write_kinesis(df, transport, dry_run=True)
    assert n2 == 2 and len(transport.records) == 2  # dry run: no new puts


def test_write_kinesis_executor_mode(spark, tmp_path):
    """Executor-side puts: a picklable file-based transport records each
    chunk from the worker processes; chunking and totals must hold across
    partitions."""
    import glob
    import os
    import uuid

    out_dir = str(tmp_path / "puts")
    os.makedirs(out_dir, exist_ok=True)

    def transport(records, batch_id):
        p = os.path.join(out_dir, f"{batch_id}-{uuid.uuid4().hex}.chunk")
        with open(p, "wb") as f:
            f.write(b"\n".join(bytes(r) for r in records))

    df = spark.createDataFrame(
        [(f"rec{i}".encode(),) for i in range(1203)], "record binary"
    ).repartition(3)
    n = write_kinesis(df, transport, batch_id=9, mode="executor")
    assert n == 1203
    chunks = glob.glob(f"{out_dir}/9-*.chunk")
    sizes = sorted(
        len(open(c, "rb").read().split(b"\n")) for c in chunks
    )
    assert sum(sizes) == 1203
    assert max(sizes) <= KINESIS_MAX_BATCH  # no chunk exceeds the service cap
    assert len(chunks) >= 3  # at least one put per partition
