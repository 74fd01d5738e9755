"""Regular-grid time-series operators: gap-filling + forward-fill — the
hypertable/resample primitive (TimescaleDB's ``time_bucket_gapfill`` +
``locf``) a metrics or feature-engineering pipeline needs on top of the
windowed aggregates in the streaming layer.

Spark-first shape: the tick grid is ``sequence()`` + ``explode`` per key
(grid rows are generated, never shuffled in from a calendar table), the
fill is ONE window pass (``last(value, ignorenulls=True)`` over a
union of ticks and observations), and everything is expressible in ANSI
SQL so the operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill_ffill", "rolling_zscore", "ewma"]


def gapfill_ffill(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Per-key regular tick grid from the key's first to last observation
    (``step_seconds`` apart), each tick carrying the key's most recent
    observed value at or before it (forward fill / LOCF).

    Returns (key, tick, filled).  Determinism: observations sort before
    the tick at the same instant, and same-instant observations tie-break
    by ``value`` — the fill is bit-exact across engines (values are
    copied, never recomputed).  Keys with only NULL-ts or NULL-key rows
    drop out; a NULL observed value is carried OVER (ignorenulls) so a
    sensor emitting nulls keeps its last real reading.

    Scale shape: the grid explodes from per-key (min, max) bounds — one
    aggregate, no calendar-table join; the fill is one window exchange on
    the key.  Grid volume is bounded by span/step per key, so the caller
    sizes ``step_seconds`` to the span (the 100 TB failure mode is a
    per-second grid over years — size the step, not the engine).
    """
    if step_seconds < 1:
        raise ValueError(f"step_seconds must be >= 1, got {step_seconds}")
    ev = df.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(value_col).alias("v"),
    )
    bounds = ev.groupBy("k").agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    step = F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
    ticks = bounds.select(
        "k",
        F.explode(F.sequence(F.col("t0"), F.col("t1"), step)).alias("t"),
    ).select("k", "t", F.lit(None).cast(ev.schema["v"].dataType).alias("v"),
             F.lit(1).alias("is_tick"))
    obs = ev.select("k", "t", "v", F.lit(0).alias("is_tick"))
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_tick", "v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        obs.unionByName(ticks)
        .withColumn("filled", F.last("v", ignorenulls=True).over(w))
        .filter(F.col("is_tick") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("t").alias("tick"),
            "filled",
        )
    )
    return filled


def _order_cols(ts_col: str, order_cols: list[str] | None) -> list[Column]:
    return [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]


def rolling_zscore(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    window_rows: int = 12,
    min_points: int = 4,
    z_round: int = 3,
) -> DataFrame:
    """Per-key rolling z-score of each observation against the trailing
    ``window_rows`` observations STRICTLY BEFORE it (the streaming-metrics
    anomaly primitive: a point is judged against history it did not
    contribute to).

    Adds ``roll_n`` (trailing count), ``roll_mean``, ``roll_std`` (sample),
    and ``z`` — NULL when fewer than ``min_points`` trailing points exist
    or the trailing window has zero variance.  ``z`` is rounded to
    ``z_round`` decimals so threshold flags computed FROM it agree across
    engines (the repo's float discipline); callers flag on the rounded
    value, never the raw ratio.

    Determinism: pass ``order_cols`` tie-breakers (e.g. an event id) when
    ``ts_col`` is not unique per key — the frame contents, and therefore
    the statistics, depend on total order.

    Scale shape: ONE window exchange on the key; the frame is
    ``window_rows`` wide, so state per row is O(window_rows) regardless of
    corpus size.  Skewed keys cost what any per-key window costs — bound
    key cardinality upstream, not here.
    """
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    if min_points < 2:
        raise ValueError(f"min_points must be >= 2, got {min_points}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*_order_cols(ts_col, order_cols))
        .rowsBetween(-window_rows, -1)
    )
    v = F.col(value_col)
    n = F.count(v).over(w)
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    z = F.when(
        (n >= min_points) & (std > 0), F.round((v - mean) / std, z_round)
    )
    return (
        df.withColumn("roll_n", n)
        .withColumn("roll_mean", mean)
        .withColumn("roll_std", std)
        .withColumn("z", z)
    )


def ewma(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    window_rows: int = 8,
    out_col: str = "ewma",
    round_to: int = 4,
) -> DataFrame:
    """Finite-window exponentially-weighted moving average per key: each
    row's smoothed value is the weight-normalized sum of the last
    ``window_rows`` observations (current included), newest weighted 1,
    each step older halved (alpha fixed at 1/2 — powers of two multiply
    EXACTLY in IEEE doubles, so the only inexact step is the final
    small-list summation, absorbed by ``round_to``).

    Truncating the classic infinite-history EWMA at ``window_rows`` is
    what makes the operator a bounded window pass instead of a sequential
    scan: the dropped tail weighs < 2^-window_rows (< 0.4% at 8), and the
    normalizing denominator uses the closed form 2 - 2^(1-n) so partial
    (startup) windows are properly weighted averages, not damped ones.

    Scale shape: one window exchange on the key; O(window_rows) state per
    row; the aggregate list never leaves the frame.
    """
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*_order_cols(ts_col, order_cols))
        .rowsBetween(-(window_rows - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    n = F.size(arr)
    # frame order is oldest -> newest: element i (1-based) carries weight
    # 0.5^(n - i); the weighted values are exact (power-of-two scaling)
    weighted = F.zip_with(
        arr,
        F.sequence(F.lit(1), n),
        lambda v, i: v * F.pow(F.lit(0.5), (n - i).cast("double")),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    den = F.lit(2.0) - F.pow(F.lit(2.0), (F.lit(1) - n).cast("double"))
    return df.withColumn(out_col, F.round(num / den, round_to))
