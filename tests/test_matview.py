"""Incremental aggregate maintenance (engine.ops.matview).

Pins the merge identities (counts add, sums add, min/least, max/greatest),
explicit NULL semantics (an all-NULL measure stays NULL until a non-NULL
partial arrives — LEAST/GREATEST NULL behavior is engine-dependent, so the
operator spells it out), NULL-key groups surviving the null-safe join, the
changelog op labels, and the partial-shape guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.ops.matview import agg_partials, merge_agg_snapshot


def _partials(spark, rows):
    df = spark.createDataFrame(rows, "k string, v int")
    return agg_partials(
        df, ["k"], sums={"s": "v"}, mins={"lo": "v"}, maxs={"hi": "v"}
    )


def test_merge_equals_full_recompute(spark):
    hist = [("a", 1), ("a", 5), ("b", 3), (None, 7)]
    batch = [("a", 2), ("c", 9), (None, 1)]
    snap = _partials(spark, hist)
    bp = _partials(spark, batch)
    merged = merge_agg_snapshot(
        snap, bp, ["k"], sum_cols=("s",), min_cols=("lo",), max_cols=("hi",)
    )
    want = {
        r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in _partials(spark, hist + batch).collect()
    }
    got = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in merged.collect()}
    assert got == want  # includes the NULL-key group (null-safe join)
    ops = {r["k"]: r["op"] for r in merged.collect()}
    assert ops == {"a": "update", "b": "unchanged", "c": "insert", None: "update"}


def test_all_null_measure_stays_null_until_value_arrives(spark):
    snap = _partials(spark, [("a", None)])
    bp1 = _partials(spark, [("a", None)])
    m1 = merge_agg_snapshot(
        snap, bp1, ["k"], sum_cols=("s",), min_cols=("lo",), max_cols=("hi",)
    ).collect()[0]
    assert m1["n"] == 2 and m1["s"] is None and m1["lo"] is None
    bp2 = _partials(spark, [("a", 4)])
    m2 = merge_agg_snapshot(
        snap, bp2, ["k"], sum_cols=("s",), min_cols=("lo",), max_cols=("hi",)
    ).collect()[0]
    assert (m2["n"], m2["s"], m2["lo"], m2["hi"]) == (2, 4, 4, 4)


def test_merge_is_associative_across_batches(spark):
    """Folding batches one at a time equals folding their union — the
    property that lets refresh cadence be an operational choice."""
    b1 = [("a", 1), ("b", 2)]
    b2 = [("a", 3)]
    b3 = [("b", -5), ("c", 0)]
    kw = dict(sum_cols=("s",), min_cols=("lo",), max_cols=("hi",), op_col=None)
    snap = _partials(spark, b1)
    snap = merge_agg_snapshot(snap, _partials(spark, b2), ["k"], **kw)
    snap = merge_agg_snapshot(snap, _partials(spark, b3), ["k"], **kw)
    want = {
        r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in _partials(spark, b1 + b2 + b3).collect()
    }
    got = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in snap.collect()}
    assert got == want


def test_missing_partial_column_raises(spark):
    snap = _partials(spark, [("a", 1)])
    bad = snap.drop("s")
    with pytest.raises(ValueError, match="partial columns"):
        merge_agg_snapshot(snap, bad, ["k"], sum_cols=("s",))


def test_merge_plan_is_single_join_no_history_rescan(spark):
    """The refresh plan touches the snapshot and the batch partials once
    each: one join, and aggregates only on the batch side feeding it."""
    snap = _partials(spark, [("a", 1), ("b", 2)])
    raw = spark.createDataFrame([("a", 9)], "k string, v int")
    bp = agg_partials(raw, ["k"], sums={"s": "v"}, mins={"lo": "v"}, maxs={"hi": "v"})
    merged = merge_agg_snapshot(
        snap, bp, ["k"], sum_cols=("s",), min_cols=("lo",), max_cols=("hi",)
    )
    p = merged._jdf.queryExecution().executedPlan().toString()
    assert p.count("Join") >= 1
    # exactly one full-outer join in the merged plan (no self-join diff pass)
    assert p.lower().count("fullouter") == 1


def test_merge_fast_path_raises_on_null_key(spark):
    """advice r8: null_safe_keys=False silently duplicated a NULL-key row
    on both sides of the full-outer join — now the merged key expression
    itself raises, so the corruption cannot ship, and the guard survives
    column pruning (it IS the key column)."""
    import pytest as _pytest

    from engine.ops.matview import agg_partials, merge_agg_snapshot

    n1 = spark.createDataFrame([(None, 5), (1, 2)], "k long, v long")
    n2 = spark.createDataFrame([(None, 7), (1, 3)], "k long, v long")
    bad = merge_agg_snapshot(
        agg_partials(n1, ["k"], sums={"s": "v"}),
        agg_partials(n2, ["k"], sums={"s": "v"}),
        ["k"], sum_cols=("s",), op_col=None, null_safe_keys=False,
    )
    with _pytest.raises(Exception, match="NULL 'k' group key"):
        bad.collect()
    # clean keys still merge exactly on the fast path
    ok = merge_agg_snapshot(
        agg_partials(n1.filter("k IS NOT NULL"), ["k"], sums={"s": "v"}),
        agg_partials(n2.filter("k IS NOT NULL"), ["k"], sums={"s": "v"}),
        ["k"], sum_cols=("s",), op_col=None, null_safe_keys=False,
    ).collect()
    assert len(ok) == 1 and ok[0]["s"] == 5
