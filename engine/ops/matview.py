"""Incremental aggregate maintenance: stored partials + batch merge.

The materialized-view pattern that makes per-key aggregates affordable at
100 TB: the fact HISTORY is never re-read.  The stored snapshot holds one
row of mergeable partials per key (count / sum / min / max — mean and
average derive at read time as sum/n), each incoming batch collapses to the
same partial shape with one map-side-combining groupBy, and the two merge
with a single co-partitioned full-outer join on the key.  Work per refresh
is O(batch + |keys|), independent of how much history the snapshot
summarizes — the exact-aggregate twin of the sketch family's rollups
(count-min cells sum, HLL registers max, histogram buckets add; here the
partials are exact because count/sum/min/max are losslessly mergeable).

The merge's changelog falls out of the same join for free: a key only in
the batch is an ``insert``, in both an ``update``, only in the snapshot
``unchanged`` — the stream a downstream cache invalidation or CDC consumer
(engine/ops/scd.py) wants, without a diff pass.

NOT expressible this way: non-mergeable measures (exact COUNT(DISTINCT),
medians).  Those need the sketch family (hll_shard_merge /
hist_shard_merge) or a salted exact recompute — the module boundary is the
mergeability of the partial, and it is checked at call time.

Reference parity note: the reference poller re-derives its per-patron
aggregates from each poll window and carries only a watermark
(lib/pipeline_controller.py's state round-trip); this operator is the
Spark-first generalization that keeps the full per-key aggregate live
without re-reading prior windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["agg_partials", "merge_agg_snapshot"]


def agg_partials(
    df: DataFrame,
    key_cols: list[str],
    *,
    count_col: str = "n",
    sums: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
) -> DataFrame:
    """Collapse raw rows to one row of mergeable partials per key.

    ``sums``/``mins``/``maxs`` map output column -> input column (or SQL
    expression string).  The aggregate combines map-side, so the shuffle
    carries one partial per (task, key) — the cheapest possible shape for
    a wide fact scan.  Callers own value typing: pass a DECIMAL-cast
    expression for money (the q1 discipline — float partial sums crossing
    ROUND diverge across partition counts).
    """
    aggs = [F.count(F.lit(1)).cast("long").alias(count_col)]
    for out, src in (sums or {}).items():
        aggs.append(F.sum(F.expr(src)).alias(out))
    for out, src in (mins or {}).items():
        aggs.append(F.min(F.expr(src)).alias(out))
    for out, src in (maxs or {}).items():
        aggs.append(F.max(F.expr(src)).alias(out))
    return df.groupBy(*key_cols).agg(*aggs)


def merge_agg_snapshot(
    snapshot: DataFrame,
    batch_partials: DataFrame,
    key_cols: list[str],
    *,
    count_col: str = "n",
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    op_col: str | None = "op",
    null_safe_keys: bool = True,
) -> DataFrame:
    """Merge a batch's partials into the stored snapshot → next snapshot.

    Both inputs carry the :func:`agg_partials` shape (``key_cols`` +
    ``count_col`` + the measure columns).  Combination rules are the
    mergeable-aggregate identities — counts add, sums add, mins take the
    least, maxes the greatest — with explicit NULL handling (a measure all
    of whose source values were NULL stays NULL until a non-NULL partial
    arrives; ``LEAST``/``GREATEST`` NULL behavior differs across engines,
    so the CASE is spelled out rather than inherited).

    ``op_col`` (set to None to omit) labels each output key: ``insert``
    (batch-only), ``update`` (both sides), ``unchanged`` (snapshot-only) —
    filter ``op != 'unchanged'`` for the refresh's changelog.

    One full-outer sort-merge/hash join on the key.  ``null_safe_keys``
    (default True) joins with ``eqNullSafe`` so a NULL group key merges
    correctly — but the null-safe wrapper means Catalyst cannot reuse a
    bucketed snapshot's partitioning, so BOTH sides exchange.  When the
    key columns are known non-nullable (the usual case: group keys of a
    NOT NULL fact column), pass ``null_safe_keys=False`` — plain equality
    lets a snapshot stored bucketed on the key (engine.ops.io.
    write_bucketed) refresh EXCHANGE-FREE on the snapshot side (one
    shuffle total, the batch partials re-bucketing; plan-gated in
    tests/test_layout.py).  Partitioning reuse also needs the bucket
    count to match the join's numPartitions (size the buckets to the
    session's shuffle partitions, or enable bucket coalescing).  With ``null_safe_keys=False`` a NULL key that
    does sneak in never matches and duplicates its row on both sides —
    the caller owns the non-nullability claim.
    """
    missing = [c for c in (count_col, *sum_cols, *min_cols, *max_cols)
               if c not in snapshot.columns or c not in batch_partials.columns]
    if missing:
        raise ValueError(
            f"partial columns {missing} absent from one side; both inputs"
            " must carry the agg_partials shape"
        )
    s = snapshot.select(
        *[F.col(k).alias(f"__sk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__s_{c}")
          for c in (count_col, *sum_cols, *min_cols, *max_cols)],
    )
    b = batch_partials.select(
        *[F.col(k).alias(f"__bk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__b_{c}")
          for c in (count_col, *sum_cols, *min_cols, *max_cols)],
    )
    cond = None
    for k in key_cols:
        if null_safe_keys:
            eq = s[f"__sk_{k}"].eqNullSafe(b[f"__bk_{k}"])
        else:
            eq = s[f"__sk_{k}"] == b[f"__bk_{k}"]
        cond = eq if cond is None else cond & eq
    j = s.join(b, cond, "full_outer")

    def both(c: str, combine) -> F.Column:
        sv, bv = F.col(f"__s_{c}"), F.col(f"__b_{c}")
        return (
            F.when(sv.isNull(), bv)
            .when(bv.isNull(), sv)
            .otherwise(combine(sv, bv))
            .alias(c)
        )

    def key_out(k: str) -> F.Column:
        merged_key = F.coalesce(F.col(f"__sk_{k}"), F.col(f"__bk_{k}"))
        if null_safe_keys:
            return merged_key.alias(k)
        # With plain equality a NULL key never matches, so ANY NULL in the
        # merged key column means a NULL-key row just duplicated across the
        # full outer join — raise instead of silently corrupting the
        # snapshot (advice-review catch).  The guard lives INSIDE the key
        # expression (a separate assert column would be pruned; the
        # determinism-ledger dry-run rule), costs one isNull per row, and
        # sits above the join so partitioning reuse is untouched.
        return (
            F.when(
                merged_key.isNull(),
                F.raise_error(F.lit(
                    f"merge_agg_snapshot(null_safe_keys=False): NULL {k!r}"
                    " group key — the caller claimed non-nullable keys;"
                    " use the default null-safe path for nullable keys"
                )),
            )
            .otherwise(merged_key)
            .alias(k)
        )

    out = [key_out(k) for k in key_cols]
    out.append(
        (
            F.coalesce(F.col(f"__s_{count_col}"), F.lit(0))
            + F.coalesce(F.col(f"__b_{count_col}"), F.lit(0))
        ).cast("long").alias(count_col)
    )
    out += [both(c, lambda a, x: a + x) for c in sum_cols]
    out += [both(c, F.least) for c in min_cols]
    out += [both(c, F.greatest) for c in max_cols]
    if op_col:
        out.append(
            F.when(F.col(f"__s_{count_col}").isNull(), F.lit("insert"))
            .when(F.col(f"__b_{count_col}").isNull(), F.lit("unchanged"))
            .otherwise(F.lit("update"))
            .alias(op_col)
        )
    return j.select(*out)
