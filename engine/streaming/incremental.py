"""The incremental pipeline as a genuine Structured Streaming query
(SURVEY §2.9 ST1-ST4; BASELINE.json north star: "Structured Streaming +
Kinesis sink").

:func:`run_available_now` wires: file/parquet ``readStream`` source →
watermark + stateful dedup → a pipeline mode graph → ``foreachBatch`` sink
(Avro encode + Kinesis put) → checkpointed offsets, triggered
``availableNow`` so a run drains everything currently available and stops —
the exact operational shape of the reference's poll loop, with Spark's
checkpoint dir replacing the hand-rolled S3 watermark (S4) and the state
store replacing ``processed_ids`` (ST4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from engine.streaming.windows import stream_dedup

__all__ = ["parquet_stream", "run_available_now"]


def parquet_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory (the harness's stand-in
    for the polled DB table; each new file = newly arrived rows)."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def run_available_now(
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    *,
    dedup_keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    query_name: str = "engine-incremental",
):
    """Drain all available input through ``transform`` into ``sink``.

    ``transform`` runs per micro-batch *inside* foreachBatch so mode graphs
    built for batch DataFrames (engine.pipeline) work unchanged; stateful
    dedup happens stream-side first, so the graphs see each key once
    (ST4 semantics).  Returns after the query terminates.
    """
    src = stream_df
    if dedup_keys:
        src = stream_dedup(src, dedup_keys, ts_col, watermark=watermark)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df)
        sink(out, batch_id)

    query = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
