"""Sequential-funnel analysis over an event stream: how many users reach
each step of an ordered event sequence, where every step must occur
STRICTLY AFTER the previous step's first occurrence and within a
conversion window of it.

Scale shape: step k is one equi-join on the user key against the step-k-1
cohort (cohorts only shrink, and each is user-cardinality, not
event-cardinality) followed by a min-timestamp aggregate with map-side
partial min.  The event table is scanned once per step WITH the step's
event-type predicate pushed into the scan — at 100 TB each scan reads one
type's fraction, and a pre-bucketed-by-user layout makes every join
exchange-free.

Determinism: "first occurrence" = MIN(ts); the strictly-after rule makes
same-instant step events non-qualifying in both engines, so the result is
exact under the microsecond-floored timestamp contract of load_table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "cohort_retention"]


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_days: int = 7,
) -> DataFrame:
    """Per-step cohort sizes for the ordered ``steps`` sequence.

    Returns (step, step_name, n_users): step is 1-based, n_users the count
    of users whose step-k first-occurrence chain is complete through k
    (NULL users never join across steps, matching SQL equi-join
    semantics).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    win = F.expr(f"INTERVAL {int(window_days)} DAYS")
    out_frames = []
    prev = None
    for i, name in enumerate(steps):
        ev = events.filter(F.col(type_col) == name).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("ts")
        )
        if prev is None:
            cur = ev.groupBy("u").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(prev, "u")
                .filter((F.col("ts") > F.col("t")) & (F.col("ts") <= F.col("t") + win))
                .groupBy("u")
                .agg(F.min("ts").alias("t"))
            )
        out_frames.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step"),
                F.lit(name).alias("step_name"),
                F.col("n_users"),
            )
        )
        prev = cur
    return reduce(DataFrame.union, out_frames)


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Monthly cohort-retention matrix: users grouped by the month of their
    FIRST event; for each (cohort, k) the count of cohort users active k
    calendar months later — the companion analytic to :func:`funnel_steps`.

    Month arithmetic is integer (``year·12 + month`` differences), so the
    result is engine-exact with no interval/rounding semantics in play.
    Returns (cohort 'yyyy-MM', k, n_users), k ≥ 0.

    Shape: one user-keyed min aggregate, one user-keyed join back, a
    distinct on (user, k) partial-aggregated before the wire, then the
    (cohort, k) count — nothing event-cardinality crosses more than one
    exchange.
    """
    ev = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(F.col(user_col).alias("u"), F.col(ts_col).alias("ts"))
    firsts = ev.groupBy("u").agg(F.min("ts").alias("t0"))
    ym = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    acts = (
        ev.join(firsts, "u")
        .select(
            "u",
            F.date_format("t0", "yyyy-MM").alias("cohort"),
            (ym(F.col("ts")) - ym(F.col("t0"))).alias("k"),
        )
        .distinct()
    )
    return acts.groupBy("cohort", "k").agg(F.count(F.lit(1)).alias("n_users"))
