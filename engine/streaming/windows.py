"""Event-time windowed aggregation — tumbling / sliding / session — with
watermarks (SURVEY §2.9; capability layer demanded by BASELINE.json's
"Structured Streaming" approach).

The reference has no window aggregation (its stream is a DB poll), but its
event-time contract (ordering column + watermark advance, ST2) maps directly
onto Spark's ``withWatermark`` + ``window``/``session_window``.  Every
function here works on BOTH a batch DataFrame and a streaming one — in batch
mode ``withWatermark`` is a no-op, so the same definitions serve the DuckDB
oracle checks and the streaming tests.

Scale: windowed aggregation shuffles once on (window, keys); Spark keeps
partial aggregates map-side.  Watermark delay bounds state size — without it
a session/dedup state store grows unboundedly (SURVEY §7 risk 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_dedup",
]


def _maybe_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    """Watermark (streaming only) + drop NULL event times (both modes).

    An event with an unknown timestamp belongs to no window: streaming
    would never admit it past the watermark, and in batch the engines
    disagree on where it lands (Spark's window() nulls it out, a SQL
    date_trunc groups it; a session cumsum splits vs absorbs it depending
    on NULL sort order — fuzz-found).  Excluding it is the only semantics
    that is engine-invariant AND batch/streaming-consistent."""
    d = df.filter(F.col(ts_col).isNotNull())
    if delay and df.isStreaming:
        return d.withWatermark(ts_col, delay)
    return d


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list,
    *,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Fixed windows: ``groupBy(window(ts, d), *keys)``; emits
    window_start/window_end columns."""
    d = _maybe_watermark(df, ts_col, watermark)
    out = d.groupBy(F.window(ts_col, duration), *group_cols).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("window", *group_cols)],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list,
    *,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    d = _maybe_watermark(df, ts_col, watermark)
    out = d.groupBy(F.window(ts_col, duration, slide), *group_cols).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("window", *group_cols)],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list,
    *,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Session windows: merge events per key until a ``gap`` of silence."""
    d = _maybe_watermark(df, ts_col, watermark)
    out = d.groupBy(F.session_window(ts_col, gap), *group_cols).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("session_window", *group_cols)],
    )


def stream_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """ST4 in streaming form — watermark-BOUNDED dedup is the default.

    With a ``watermark`` (the default), state holds only keys inside the
    horizon (``dropDuplicatesWithinWatermark``): the sf0.1 soak measures
    the plateau at keys-per-horizon (62,500) vs the full key domain
    (100,000) for exact dedup, and the plateau is what survives an
    unbounded stream (verdict r9 #5).  A duplicate arriving AFTER the
    horizon re-emits — that is the trade for bounded state.

    ``watermark=None`` opts into EXACT dedup (``dropDuplicates``): every
    key ever seen stays in state, so reserve it for bounded key domains
    (a dimension feed, a backfill of known extent) where exactly-once
    emission matters more than state growth.

    Batch frames dedup exactly either way."""
    if df.isStreaming:
        if watermark is None:
            return df.dropDuplicates(key_cols)
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)
