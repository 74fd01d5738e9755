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

__all__ = ["streaming_cms"]


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
