"""As-of join and range join — operators Spark lacks natively (engine
capability beyond the reference; pyspark guide "Common OLAP patterns").

Both are implemented as compositions of existing DataFrame ops chosen for
their shuffle shape, NOT as inequality joins (which Catalyst executes as
broadcast-nested-loop — quadratic and non-viable at scale):

- :func:`asof_join` — union the two sides, one window pass per key
  (``last(value, ignorenulls=True)``): each probe row picks up the most
  recent build-side row with ``ts <= probe.ts``.  Cost: one hash exchange on
  the key + partition-local sort — the same plan a native as-of would need.
- :func:`range_join_buckets` — equi-join on coarse time buckets (each probe
  row joins its own and the preceding bucket) + exact range filter.  Turns an
  inequality join into a hash join with bounded fan-out; bucket width tunes
  selectivity vs duplication.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_buckets"]


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    value_cols: list[str],
    *,
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """For each probe row, attach ``value_cols`` from the matching build row
    of the same ``key``: ``direction="backward"`` (default) takes the latest
    build row with ``build_ts <= probe_ts``, ``"forward"`` the earliest with
    ``build_ts >= probe_ts``, ``"nearest"`` whichever of the two is closer
    in time (tie → backward) — the pandas ``merge_asof`` direction contract.

    merge_asof semantics via union + window: build rows sort before probe rows
    at equal timestamps (inclusive bound), then ``last(ignorenulls)`` carries
    the most recent build values forward onto every probe row (the forward
    direction is the same window over the REVERSED timestamp order; nearest
    computes both and picks per row).  Ties between build rows at the same
    (key, timestamp) are resolved arbitrarily — supply a unique build_ts
    (or pre-dedup) when that matters, same as any sort-based ASOF.

    NULL timestamps: a build row with NULL ``build_ts`` is dropped (an
    unknown event time cannot be "the latest at or before" anything — left
    in, it would sort NULLS FIRST and masquerade as an
    earlier-than-everything match), and a probe row with NULL ``probe_ts``
    matches nothing (its values come back NULL, the row itself survives a
    left join).  Engines disagree here — DuckDB's sort-based ASOF with
    NULLS LAST hands a NULL probe the LATEST build row — so the contract
    is pinned explicitly (fuzz-found).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    clash = set(value_cols) & {c for c in probe.columns if c != key}
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with probe columns — alias "
            "the build side before the as-of join"
        )
    p = probe.withColumn("__ts", F.col(probe_ts)).withColumn("__side", F.lit(1))
    # SQL equality never matches NULL keys, but a window PARTITION BY groups
    # them — drop NULL-key build rows (they can match nothing) while
    # NULL-key probe rows survive with no match, exactly the ASOF-join
    # contract of an equality predicate (fuzz-found).
    b = (
        build.filter(F.col(build_ts).isNotNull() & F.col(key).isNotNull())
        .withColumn("__ts", F.col(build_ts))
        .withColumn("__side", F.lit(0))
    )

    p_cols = probe.columns
    all_cols = [key, "__ts", "__side"]
    # build values ride in ONE struct that is null exactly when there is no
    # build row: carrying bare columns with last(ignorenulls) would skip a
    # matched build row whose VALUE is null and resurrect an older one
    # (fuzz-found) — "latest row, null value" and "no row yet" must stay
    # distinguishable.
    from pyspark.sql import types as T

    bschema = {f.name: f for f in build.schema.fields}
    # carry the matched build timestamp inside the struct: nearest needs it
    # to compare distances, and it rides along invisibly otherwise
    bv_type = T.StructType(
        [bschema[c] for c in value_cols]
        + [T.StructField("__asof_bts", bschema[build_ts].dataType)]
    )
    sel_p = p.select(
        *all_cols,
        *[F.col(c).alias(f"__p_{c}") for c in p_cols if c != key],
        F.lit(None).cast(bv_type).alias("__bv"),
    )
    sel_b = b.select(
        *all_cols,
        *[F.lit(None).cast(dict(probe.dtypes)[c]).alias(f"__p_{c}") for c in p_cols if c != key],
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(build_ts).alias("__asof_bts"),
        ).alias("__bv"),
    )
    unioned = sel_p.unionByName(sel_b)
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward = the same carry over the REVERSED timestamp order: in desc
    # order the last non-null before the probe row is the SMALLEST build_ts
    # >= probe_ts; __side still sorts build before probe at equal ts so the
    # bound stays inclusive
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").desc(), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry_cols = [
        key,
        "__ts",
        "__side",
        *[F.col(f"__p_{c}") for c in p_cols if c != key],
    ]
    # a NULL probe_ts matches nothing in ANY direction: backward is safe by
    # NULLS-FIRST accident, but desc ordering puts NULL ts LAST where the
    # forward frame sees every build row — guard explicitly
    null_ts_guard = F.col("__ts").isNotNull()
    if direction == "backward":
        bv = F.last(F.col("__bv"), ignorenulls=True).over(w_back)
        carried = unioned.select(
            *carry_cols, F.when(null_ts_guard, bv).alias("__bv")
        )
    elif direction == "forward":
        bv = F.last(F.col("__bv"), ignorenulls=True).over(w_fwd)
        carried = unioned.select(
            *carry_cols, F.when(null_ts_guard, bv).alias("__bv")
        )
    else:  # nearest: closer of the two, tie -> backward
        bb = F.last(F.col("__bv"), ignorenulls=True).over(w_back)
        bf = F.last(F.col("__bv"), ignorenulls=True).over(w_fwd)
        stage = unioned.select(
            *carry_cols, bb.alias("__bb"), bf.alias("__bf")
        )

        # distance compare needs a numeric view of the timestamps; DATE
        # cannot cast straight to double in Spark (review-caught), so route
        # date/timestamp types through a timestamp cast first
        ts_type = dict(probe.dtypes)[probe_ts]

        def _num(c):
            if ts_type in ("date", "timestamp", "timestamp_ntz"):
                return c.cast("timestamp").cast("double")
            return c.cast("double")

        pick = (
            F.when(F.col("__bf").isNull(), F.col("__bb"))
            .when(F.col("__bb").isNull(), F.col("__bf"))
            .when(
                (
                    _num(F.col("__ts"))
                    - _num(F.col("__bb")["__asof_bts"])
                )
                <= (
                    _num(F.col("__bf")["__asof_bts"])
                    - _num(F.col("__ts"))
                ),
                F.col("__bb"),
            )
            .otherwise(F.col("__bf"))
        )
        carried = stage.select(
            *carry_cols, F.when(null_ts_guard, pick).alias("__bv")
        )
    matched = carried.filter(F.col("__side") == 1)
    if how == "inner":
        matched = matched.filter(F.col("__bv").isNotNull())
    return matched.select(
        key,
        *[F.col(f"__p_{c}").alias(c) for c in p_cols if c != key],
        *[F.col("__bv")[c].alias(c) for c in value_cols],
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    *,
    lower: Column | None = None,
    window_seconds: int,
    bucket_seconds: int | None = None,
    extra_key: tuple[str, str] | None = None,
) -> DataFrame:
    """Pairs (l, r) with ``r.ts ∈ [l.ts - window, l.ts]`` as a hash join.

    Each left row probes its own bucket and enough preceding buckets to cover
    the window; the exact predicate filters the fan-out.  With
    ``bucket_seconds = window_seconds`` (default) each row joins exactly 2
    buckets — the textbook bounded-fan-out range join.
    """
    bucket_seconds = bucket_seconds or window_seconds
    n_back = (window_seconds + bucket_seconds - 1) // bucket_seconds

    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / bucket_seconds)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / bucket_seconds)

    l_exp = left.withColumn(
        "__bucket", F.explode(F.array(*[lb - i for i in range(n_back + 1)]))
    )
    r_b = right.withColumn("__bucket", rb)

    cond = l_exp["__bucket"] == r_b["__bucket"]
    if extra_key:
        cond = cond & (l_exp[extra_key[0]] == r_b[extra_key[1]])
    joined = l_exp.join(r_b, cond)
    in_range = (
        (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return joined.filter(in_range).drop("__bucket")
