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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill_ffill"]


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
