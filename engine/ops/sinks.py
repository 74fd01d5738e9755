"""Record sinks (SURVEY §2.1 S7/S8): Avro projection + Kinesis-style batched put.

The reference Avro-encodes each record and PutRecords them to Kinesis in
chunks of ≤500 (lib/pipeline_controller.py:241-244; config/production.yaml:12),
with an ``IGNORE_KINESIS`` dry-run flag (:72).  OSS Spark has no first-party
Kinesis sink, so the engine uses the standard pattern: ``foreachBatch`` (or a
``foreachPartition`` in batch mode) calling a *transport* — injected, like the
geocode transports, so tests capture records in-memory and production plugs in
boto3 ``put_records``.

Delivery semantics: at-least-once, matching the reference (SURVEY §7 risk 3) —
re-delivered boundary rows are made no-ops by the upstream ST4 dedup, and the
batchId is available to idempotent transports.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.ops.avro_codec import to_avro_col

__all__ = ["avro_project", "kinesis_put_batch", "write_kinesis", "CollectingTransport"]

KINESIS_MAX_BATCH = 500  # PutRecords service maximum (reference README.md:62)

#: transport signature: (records: list[bytes], batch_id: int) -> None
KinesisTransport = Callable[[list, int], None]


def avro_project(df: DataFrame, cols: list[str], avro_schema: dict) -> DataFrame:
    """S7: project the sink columns into one Avro-binary ``record`` column.

    Skips the reference's DataFrame→JSON→dict hop (F13,
    lib/pipeline_controller.py:241-242) — encode straight from the columnar
    batch."""
    return df.select(to_avro_col(df, cols, avro_schema).alias("record"))


def kinesis_put_batch(
    records: list, transport: KinesisTransport, *, batch_id: int = 0
) -> int:
    """Chunk ≤500 and put in order; returns number of service calls."""
    calls = 0
    for i in range(0, len(records), KINESIS_MAX_BATCH):
        transport(records[i : i + KINESIS_MAX_BATCH], batch_id)
        calls += 1
    return calls


def write_kinesis(
    df: DataFrame,
    transport: KinesisTransport | None,
    *,
    batch_id: int = 0,
    dry_run: bool = False,
    mode: str = "executor",
) -> int:
    """Put an Avro-record DataFrame (one binary ``record`` column) to the sink.

    ``mode='executor'`` (the scale path): each partition ships its own
    ≤500-record chunks via ``foreachPartition``, so puts run executor-side in
    parallel and the driver never holds the batch.  The transport must be
    picklable (e.g. :func:`boto3_kinesis_transport`).

    ``mode='driver'``: collect then put from the driver — for tests with
    in-memory transports and for strictly-ordered streams (the reference puts
    from its single process, preserving batch order).

    Returns the record count; dry-run counts without calling the transport
    (mirrors the reference's IGNORE_KINESIS flag).
    """
    if dry_run or transport is None:
        return df.count()

    if mode == "driver":
        records = [row["record"] for row in df.collect()]
        kinesis_put_batch(records, transport, batch_id=batch_id)
        return len(records)

    count_acc = df.sparkSession.sparkContext.accumulator(0)

    def put_partition(rows: Iterator) -> None:
        buf = []
        for row in rows:
            buf.append(row["record"])
            if len(buf) == KINESIS_MAX_BATCH:
                transport(buf, batch_id)
                count_acc.add(len(buf))
                buf = []
        if buf:
            transport(buf, batch_id)
            count_acc.add(len(buf))

    df.foreachPartition(put_partition)
    return count_acc.value


class CollectingTransport:
    """In-memory transport for tests (driver-side only — mirrors the
    reference's mocked KinesisClient).

    Use with ``mode='driver'``: under the default ``mode='executor'`` the
    transport would be pickled into Python workers, puts would mutate
    worker-side copies, and the sink would still report the full record
    count — success with zero records visible on the driver (advice-review
    catch r8).  Pickling therefore FAILS LOUDLY: task serialization raises
    before any put runs, instead of the silent record loss."""

    def __init__(self):
        self.batches: list[tuple[int, list]] = []

    def __call__(self, records: list, batch_id: int) -> None:
        self.batches.append((batch_id, list(records)))

    def __getstate__(self):
        raise TypeError(
            "CollectingTransport is driver-side only: shipping it to"
            " executors (write_kinesis mode='executor') would collect into"
            " worker-side copies and silently drop every record — pass"
            " mode='driver', or use a picklable transport"
        )

    @property
    def records(self) -> list:
        return [r for _, batch in self.batches for r in batch]


def boto3_kinesis_transport(stream_name: str):  # pragma: no cover - needs AWS
    """Production transport: boto3 PutRecords with failed-record retry."""
    import boto3

    client = boto3.client("kinesis")

    def transport(records: list, batch_id: int) -> None:
        entries = [
            {"Data": bytes(r), "PartitionKey": str(hash(bytes(r)) % 1000)}
            for r in records
        ]
        resp = client.put_records(StreamName=stream_name, Records=entries)
        failed = [
            e
            for e, r in zip(entries, resp.get("Records", []))
            if "ErrorCode" in r
        ]
        if failed:
            client.put_records(StreamName=stream_name, Records=failed)

    return transport
