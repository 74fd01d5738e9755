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

__all__ = [
    "gapfill_ffill",
    "rolling_zscore",
    "ewma",
    "lttb_downsample",
    "rollup_partials",
    "rollup_merge",
    "mad_outliers",
]


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
    window_rows: int | None = 12,
    min_points: int = 4,
    z_round: int = 3,
) -> DataFrame:
    """Per-key rolling z-score of each observation against the trailing
    ``window_rows`` observations STRICTLY BEFORE it (the streaming-metrics
    anomaly primitive: a point is judged against history it did not
    contribute to).  ``window_rows=None`` scores against ALL trailing
    history — the batch twin of
    :func:`engine.streaming.stateful.streaming_zscore`.

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
    if window_rows is not None and window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    if min_points < 2:
        raise ValueError(f"min_points must be >= 2, got {min_points}")
    lo = Window.unboundedPreceding if window_rows is None else -window_rows
    w = (
        Window.partitionBy(key_col)
        .orderBy(*_order_cols(ts_col, order_cols))
        .rowsBetween(lo, -1)
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

    NULL-value rows are DROPPED (review finding: collect_list silently
    skips NULLs, which would compress the frame so older observations get
    newer weights, and a missing observation has no meaningful smoothed
    value) — filter upstream if you need them carried.
    """
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    df = df.filter(F.col(value_col).isNotNull())
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


def lttb_downsample(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    n_buckets: int = 12,
    area_round: int = 3,
    avg_round: int = 6,
) -> DataFrame:
    """Visually-representative per-key downsampling to ~``n_buckets``
    points — the largest-triangle-three-buckets idea (Steinarsson 2013)
    in its FIXED-ANCHOR variant: each equal-count bucket keeps the point
    forming the largest triangle with the NEIGHBOR BUCKETS' AVERAGES
    (canonical LTTB uses the previously-selected point as the left
    anchor, a sequential dependency; fixed anchors make every bucket's
    choice independent, i.e. one parallel pass — the variant that runs
    on a cluster).  First and last points are always kept; keys with
    <= ``n_buckets`` points pass through whole.

    Determinism: x-coordinates are exact epoch MICROSECONDS (integer
    sums, exact bucket means), bucket y-means are rounded to
    ``avg_round`` (double summation order is the one engine-dependent
    step), and triangle areas are rounded to ``area_round`` before the
    per-bucket argmax with (area DESC, time) tie-break — the selection
    is engine-exact and SQL-oracle-checkable.

    Scale shape: one window exchange on the key (rank + count), one
    (key, bucket) aggregate for anchors, two broadcast-sized joins per
    point against the anchor table, one argmax window — everything keyed,
    nothing quadratic.
    """
    if n_buckets < 3:
        raise ValueError(f"n_buckets must be >= 3, got {n_buckets}")
    ev = df.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(value_col).cast("double").alias("v"),
        *[F.col(c) for c in (order_cols or [])],
    )
    w = Window.partitionBy("k").orderBy("t", *[(c) for c in (order_cols or [])])
    base = ev.select(
        "k",
        "t",
        "v",
        (F.row_number().over(w) - 1).alias("rank"),
        F.count(F.lit(1)).over(
            Window.partitionBy("k").orderBy("t").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    small = base.filter(F.col("n") <= n_buckets).select(
        "k", "t", "v", F.col("rank").cast("int").alias("bucket")
    )
    big = base.filter(F.col("n") > n_buckets).withColumn(
        "bucket", F.expr(f"CAST((rank * {n_buckets}) div n AS INT)")
    )
    # x is REBASED to the key's first timestamp: triangle areas are
    # translation-invariant, and small integers keep every partial sum
    # inside double-exact range (raw epoch-micros ~1.7e18 would make the
    # bucket-mean summation order-dependent across engines)
    kw = Window.partitionBy("k")
    big = big.withColumn(
        "x", F.unix_micros(F.col("t")) - F.min(F.unix_micros(F.col("t"))).over(kw)
    )
    anchors = big.groupBy("k", "bucket").agg(
        F.avg("x").alias("bx"),
        F.round(F.avg("v"), avg_round).alias("by"),
    )
    prev = anchors.select(
        "k", (F.col("bucket") + 1).alias("bucket"),
        F.col("bx").alias("px"), F.col("by").alias("py"),
    )
    nxt = anchors.select(
        "k", (F.col("bucket") - 1).alias("bucket"),
        F.col("bx").alias("nx"), F.col("by").alias("ny"),
    )
    interior = (
        big.filter(
            (F.col("bucket") >= 1) & (F.col("bucket") <= n_buckets - 2)
        )
        .join(prev, ["k", "bucket"])
        .join(nxt, ["k", "bucket"])
        .withColumn(
            "area",
            F.round(
                F.abs(
                    (F.col("px") - F.col("nx"))
                    * (F.col("v") - F.col("py"))
                    - (F.col("px") - F.col("x").cast("double"))
                    * (F.col("ny") - F.col("py"))
                ),
                area_round,
            ),
        )
    )
    aw = Window.partitionBy("k", "bucket").orderBy(
        F.col("area").desc(), "rank"
    )
    picked = (
        interior.withColumn("__rn", F.row_number().over(aw))
        .filter(F.col("__rn") == 1)
        .select("k", "t", "v", "bucket")
    )
    ends = big.filter(
        (F.col("rank") == 0) | (F.col("rank") == F.col("n") - 1)
    ).select("k", "t", "v", "bucket")
    return (
        small.unionByName(ends)
        .unionByName(picked)
        .select(
            F.col("k").alias(key_col),
            F.col("t").alias("tick"),
            F.col("v").alias("picked_value"),
            "bucket",
        )
    )


def rollup_partials(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Fine-grained mergeable partial aggregates — the materialized layer
    of a continuous aggregate (TimescaleDB caggs / Druid rollup): per
    (keys, time bucket) keep (n, sum, min, max), the state from which any
    coarser aggregate is derivable WITHOUT re-reading raw rows.

    Mergeability is the whole design: count and sum re-sum, min/max
    re-min/max — so hourly partials roll to days, days to months, each
    level reading only the level below.  AVG is emitted at READ time as
    sum/n (storing avg would break the merge).

    The sum is kept in INTEGER MICRO-UNITS (``round(v·1e6)`` as long, the
    seeded-IVF quantization idiom): float partial sums re-summed in a
    different grouping order land on rounding boundaries (measured under
    fuzz), while integer sums merge EXACTLY at any depth.  Exactness
    bound: |v|·1e6 · rows-per-bucket must stay under 2^63 — at larger
    magnitudes shrink the unit, same trade as integer pagerank.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    units = F.round(F.col(value_col).cast("double") * 1_000_000.0).cast(
        "long"
    )
    return (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(*key_cols, b.alias("bucket_ts"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(units).alias("s_units"),
            F.min(value_col).alias("mn"),
            F.max(value_col).alias("mx"),
        )
    )


def rollup_merge(
    partials: DataFrame,
    *,
    key_cols: list[str],
    bucket: str = "day",
    avg_round: int = 4,
    sum_round: int = 4,
) -> DataFrame:
    """Derive a coarser rollup FROM the partial layer (never from raw
    rows): re-truncate the fine bucket, re-sum n and the integer-unit
    sum, re-min/max.  Returns (keys, bucket_ts, n, total, vmin, vmax,
    vavg) — counts, extrema, and the unit sum merge EXACTLY; only the
    final unit→double conversion rounds, identically at any merge depth.

    At 100 TB this is the only affordable shape for standing dashboards:
    the raw stream is aggregated once into the fine layer, and every
    coarser resolution is a merge over data that is already
    bucket-cardinality, not row-cardinality.
    """
    if not 0 <= sum_round <= 6 or not 0 <= avg_round <= 6:
        raise ValueError("sum_round/avg_round must be in [0, 6]")
    b = F.date_trunc(bucket, F.col("bucket_ts"))

    def half_away(den_sql: str, scale: int) -> Column:
        # round-half-away-from-zero of (__s / den / 10^(6-scale)) computed
        # ENTIRELY in integer space: quantized sums make exact .5 cases
        # common, and float ROUND half-cases resolve differently across
        # engines (fuzz-measured).  SQL `div` is true 64-bit integer
        # division (review finding: the double-based _idiv identity is
        # only exact below 2^53, short of the documented 2^63 sum bound).
        d = f"(({den_sql}) * {int(10 ** (6 - scale))}L)"
        q = F.expr(f"(2L * abs(__s) + {d}) div (2L * {d})")
        sign = F.when(F.col("__s") < 0, F.lit(-1)).otherwise(F.lit(1)).cast(
            "long"
        )
        return (sign * q).cast("double") / F.lit(float(10**scale))

    agg = partials.groupBy(*key_cols, b.alias("bucket_ts")).agg(
        F.sum("n").alias("n"),
        F.sum("s_units").alias("__s"),
        F.min("mn").alias("vmin"),
        F.max("mx").alias("vmax"),
    )
    return agg.select(
        *key_cols,
        "bucket_ts",
        "n",
        half_away("1L", sum_round).alias("total"),
        "vmin",
        "vmax",
        half_away("n", avg_round).alias("vavg"),
    )


def mad_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    k: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """Robust per-key outlier stats via median absolute deviation:
    ``(key..., n_events, n_outliers, med_milli, mad_milli)`` where a row is
    an outlier iff ``|v − median| > k · MAD``.

    MAD is the robust twin of :func:`rolling_zscore`'s mean/std baseline —
    a few extreme points inflate the std and MASK each other (z stays
    small when the contamination sets the yardstick), while the median and
    MAD barely move, which is the property that matters on corrupted
    telemetry.  Breakdown point 50% vs the z-score's 0%.

    Determinism discipline (the rolling_median lesson): values are
    quantized to milli-units with the engine-exact half rule
    ``FLOOR(scale·v + 0.5)`` BEFORE the medians, so every interpolated
    median is an exact multiple of 0.5 (binary-exact double) and the
    ``dev > k·MAD`` comparison never sits on a float boundary; the
    rendered med/mad go through the same FLOOR(x+0.5).  NULL values are
    skipped; a key whose MAD is 0 (over half its values identical) flags
    every deviating row — the conventional degenerate-MAD behavior.

    Shape: two aggregates and two co-partitioned joins on the key — the
    medians are per-key ``percentile`` aggregates (one exchange each,
    reused by AQE), never a global sort.
    """
    vm = F.floor(F.lit(float(scale)) * F.col(value_col) + F.lit(0.5)).cast(
        "long"
    )
    e = df.where(F.col(value_col).isNotNull()).select(
        *key_cols, vm.alias("__vm")
    )
    med = e.groupBy(*key_cols).agg(
        F.percentile("__vm", F.lit(0.5)).alias("__med")
    )
    d = e.join(med, key_cols).withColumn(
        "__dev", F.abs(F.col("__vm") - F.col("__med"))
    )
    mad = d.groupBy(*key_cols).agg(
        F.percentile("__dev", F.lit(0.5)).alias("__mad")
    )
    j = d.join(mad, key_cols)
    return j.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            (F.col("__dev") > F.lit(float(k)) * F.col("__mad")).cast("long")
        ).cast("long").alias("n_outliers"),
        F.floor(F.max("__med") + F.lit(0.5)).cast("long").alias("med_milli"),
        F.floor(F.max("__mad") + F.lit(0.5)).cast("long").alias("mad_milli"),
    )
