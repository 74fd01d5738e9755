"""Column profiling: the data-quality summary every ingest pipeline runs
before trusting a feed (the reference validates its inputs ad hoc —
row-count guards in lib/pipeline_controller.py and null checks scattered
through helpers/; this operator is that validation generalized to a single
declarative pass).

One aggregate scan produces every per-column statistic as ONE wide row
(count / nulls / exact distinct / min / max as canonical strings); a
zero-shuffle ``stack`` unpivot then reshapes it to one row per column.
At 100 TB the only caveat is exact COUNT(DISTINCT): Spark plans multiple
distinct aggregates as one Expand (rows × columns blow-up before partial
aggregation), so ``exact_distinct=False`` swaps in HLL
``approx_count_distinct`` — same single-scan shape, no Expand, constant
memory — which is the right default on corpus-scale feeds (the exact mode
is the oracle-checkable one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_profile", "group_quantiles", "int_histogram"]


def _canon_str(c, dtype: str):
    """Engine-portable string form for an aggregated min/max value: dates
    are ISO, floats are rounded to 2 and rendered via DECIMAL so Spark and
    the SQL oracle print identical text ('1.50', not '1.5').  Applied AFTER
    the min/max aggregate so ordering is native (numeric), never
    lexicographic."""
    if dtype in ("double", "float"):
        return F.round(c, 2).cast("decimal(28,2)").cast("string")
    return c.cast("string")


def table_profile(
    df: DataFrame, cols: list[str], *, exact_distinct: bool = True
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_value, max_value), one row
    per profiled column, ordered by column name."""
    from engine.ops.quality import _check_ident

    for c in cols:
        _check_ident(c, "column name")
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            _canon_str(F.min(F.col(c)), dtypes[c]).alias(f"__min_{c}"),
            _canon_str(F.max(F.col(c)), dtypes[c]).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__n`, `__nn_{c}`, `__nd_{c}`, `__min_{c}`, `__max_{c}`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(`column`, n_rows, n_null, n_distinct, min_value, max_value)"
    ).orderBy("column")


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    metric_col: str,
    *,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact: bool = True,
) -> DataFrame:
    """Per-group discrete quantiles of an integer metric (+ group count),
    ordered by group.  ``percentile_disc`` returns an ACTUAL data value
    (cast back to long), so results are engine-exact — no interpolation.
    One shuffle on the group key; ``exact=False`` swaps in the
    bounded-memory ``approx_percentile`` sketch for corpus-scale metrics
    (same plan shape, values within sketch error)."""
    from engine.ops.quality import _check_ident

    _check_ident(metric_col, "metric column")
    aliases = [f"q{int(round(p * 100)):02d}" for p in probs]
    if len(set(aliases)) != len(aliases):
        raise ValueError(
            f"probs {probs} collide after rounding to integer percents {aliases}"
        )
    if exact:
        aggs = [
            F.expr(
                f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY `{metric_col}`)"
            )
            .cast("long")
            .alias(a)
            for p, a in zip(probs, aliases)
        ]
    else:
        aggs = [
            F.percentile_approx(metric_col, p)
            .cast("long")
            .alias(a)
            for p, a in zip(probs, aliases)
        ]
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
        .orderBy(*group_cols)
    )


def int_histogram(
    df: DataFrame, metric_col: str, *, lo: int, hi: int, n_buckets: int
) -> DataFrame:
    """Fixed-width histogram of an integer metric: (bucket, lo_edge,
    hi_edge, n_rows) with bucket -1 for underflow and ``n_buckets`` for
    overflow.  The bucket index is INTEGER arithmetic
    (``(x - lo) * n div (hi - lo)``) — exact and engine-invariant, unlike
    float ``width_bucket`` boundary behavior.  One exchange carrying at
    most ``n_buckets + 2`` partial counts per task."""
    from engine.ops.quality import _check_ident

    _check_ident(metric_col, "metric column")
    x = F.col(metric_col).cast("long")
    span = hi - lo
    bucket = (
        F.when(x < lo, F.lit(-1))
        .when(x >= hi, F.lit(n_buckets))
        .otherwise(
            F.expr(
                f"((CAST(`{metric_col}` AS BIGINT) - {lo}) * {n_buckets}) div {span}"
            )
        )
        .cast("long")
    )
    out = (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    width = span / n_buckets
    return out.select(
        "bucket",
        F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 4).alias("lo_edge"),
        F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 4).alias(
            "hi_edge"
        ),
        "n_rows",
    ).orderBy("bucket")
