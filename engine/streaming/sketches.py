"""Streaming sketch maintenance: count-min over a stream.

Sketch linearity (cms_merge: sketch(A) + sketch(B) == sketch(A ∪ B)) makes
frequency state TRIVIALLY incremental: each micro-batch contributes its own
``depth × width``-bounded cell table and the running sketch is the
cell-wise sum — no per-key state store, no watermark bookkeeping, and the
state is the SAME object a batch job would compute, so batch/streaming
parity is exact (pinned by tests/test_streaming.py's availableNow parity
test, the same contract as streaming_zscore).

The accumulator here is a driver-side dict of ≤ ``depth × width`` cells —
bounded by the sketch geometry, never by stream volume (the bloom_bit_words
discipline).  A cluster deployment would instead upsert the per-batch cell
table into a storage table (cells are idempotent under re-aggregation, so
an at-least-once sink re-merge is safe: re-running a batch after failure
requires the usual foreachBatch idempotence via batch_id, which the
caller's sink owns — documented, not hidden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from engine.extended.sketch import cms_build

__all__ = ["streaming_cms", "streaming_hll", "streaming_hll_estimate"]


def streaming_cms(
    stream_df: DataFrame,
    key_col: str,
    checkpoint_dir: str,
    *,
    depth: int = 3,
    width: int = 512,
    cells: dict[tuple[int, int], int] | None = None,
    query_name: str = "engine-streaming-cms",
):
    """Maintain a count-min sketch over a stream (availableNow drain).

    Each micro-batch is sketched with :func:`cms_build` (one pass, ≤
    depth × width groups) and merged into ``cells`` — pass a dict to keep
    the accumulator, or read the returned one.  Returns ``(query, cells)``.
    """
    acc: dict[tuple[int, int], int] = cells if cells is not None else {}
    # foreachBatch is at-least-once: a failed batch can be re-delivered
    # with the SAME batch_id, and re-merging it would inflate every count
    # (silently — CMS errors are already one-sided).  The accumulator IS
    # the sink here, so it owns its own idempotence: skip seen batch ids
    # (review-caught).  Across restarts the checkpoint skips completed
    # batches, so the in-process guard is the only gap.
    seen: set[int] = set()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in seen:
            return
        rows = cms_build(batch_df, key_col, depth=depth, width=width).collect()
        for r in rows:
            k = (r["row"], r["col"])
            acc[k] = acc.get(k, 0) + r["cnt"]
        seen.add(batch_id)

    query = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query, acc


def streaming_hll(
    stream_df: DataFrame,
    key_col: str,
    checkpoint_dir: str,
    *,
    lg_k: int = 12,
    sketches: list[bytes] | None = None,
    query_name: str = "engine-streaming-hll",
):
    """Maintain a distinct-count HLL over a stream (availableNow drain) —
    the distinct-count twin of :func:`streaming_cms`.

    Each micro-batch collapses to ONE Datasketches HLL binary
    (``hll_sketch_agg`` — register-bounded regardless of batch size);
    the accumulator keeps one sketch per batch and
    :func:`streaming_hll_estimate` unions them Spark-side (register-max
    merge is associative, so batch boundaries are invisible — exact
    batch/stream parity, pinned in tests/test_streaming.py).  Same
    at-least-once discipline as streaming_cms: a seen-batch_id guard
    makes the in-process accumulator idempotent under re-delivery
    (re-merging an HLL is actually harmless — max is idempotent — but
    the guard keeps the one-sketch-per-batch invariant honest).
    """
    from pyspark.sql import functions as F

    acc: list[bytes] = sketches if sketches is not None else []
    seen: set[int] = set()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in seen:
            return
        row = batch_df.where(F.col(key_col).isNotNull()).agg(
            F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k)).alias("sk")
        ).collect()[0]
        if row["sk"] is not None:
            acc.append(bytes(row["sk"]))
        seen.add(batch_id)

    query = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query, acc


def streaming_hll_estimate(spark, sketches: list[bytes]) -> float:
    """Union the per-batch sketches and estimate — one Spark-side
    ``hll_union_agg`` over a batch-count-sized frame."""
    from pyspark.sql import functions as F

    if not sketches:
        return 0.0
    df = spark.createDataFrame([(s,) for s in sketches], "sk binary")
    return float(
        df.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
