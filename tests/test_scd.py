"""CDC changelog apply + SCD2 merge goldens."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from engine.ops.scd import apply_changelog, scd2_merge


def test_apply_changelog_latest_wins(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, 1, 0, "U", "a2"),   # old update
            (1, 2, 0, "U", "a3"),   # latest for k=1 → wins
            (2, 1, 0, "D", None),   # delete k=2
            (4, 1, 0, "U", "new"),  # insert k=4
        ],
        "k long, ts long, tie long, op string, v string",
    )
    out = {r["k"]: r["v"] for r in apply_changelog(snap, changes, "k", ["ts", "tie"]).collect()}
    assert out == {1: "a3", 3: "c", 4: "new"}


def test_apply_changelog_tiebreak(spark):
    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, 5, 1, "U", "x"), (1, 5, 2, "D", None)],
        "k long, ts long, tie long, op string, v string",
    )
    # same ts; higher tiebreak (the delete) wins
    out = apply_changelog(snap, changes, "k", ["ts", "tie"]).collect()
    assert out == []


def test_scd2_merge_closes_and_appends(spark):
    t0 = dt.datetime(2020, 1, 1)
    t1 = dt.datetime(2021, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, "gold", t0, None),          # current, will be updated
            (1, "silver", dt.datetime(2019, 1, 1), t0),  # history row
            (2, "bronze", t0, None),        # current, untouched
        ],
        "k long, tier string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [(1, "platinum", t1)], "k long, tier string, effective_ts timestamp"
    )
    out = scd2_merge(dim, upd, "k", ["tier"])
    rows = sorted(
        ((r["k"], r["tier"], r["valid_from"], r["valid_to"]) for r in out.collect())
    )
    assert (1, "gold", t0, t1) in rows          # closed at update ts
    assert (1, "platinum", t1, None) in rows    # new current version
    assert (1, "silver", dt.datetime(2019, 1, 1), t0) in rows  # history intact
    assert (2, "bronze", t0, None) in rows      # untouched current
    assert len(rows) == 4


def test_asof_join_forward_direction(spark):
    from engine.ops.asof import asof_join

    probe = spark.createDataFrame(
        [(1, 5), (1, 20), (1, 10), (2, 7), (1, None)],
        "key int, pts int",
    )
    build = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 3, "c")], "key int, bts int, v string"
    )
    out = asof_join(
        probe, build, "key", "pts", "bts", ["v"], direction="forward"
    )
    got = {(r["key"], r["pts"]): r["v"] for r in out.collect()}
    assert got == {
        (1, 5): "a",     # earliest bts >= 5 is 10
        (1, 10): "a",    # inclusive bound
        (1, 20): None,   # nothing after 15
        (2, 7): None,    # build at 3 is before the probe
        (1, None): None, # NULL probe ts matches nothing in any direction
    }


def test_asof_join_nearest_direction_tie_goes_backward(spark):
    from engine.ops.asof import asof_join

    probe = spark.createDataFrame(
        [(1, 12), (1, 14), (1, 1), (1, 30)], "key int, pts int"
    )
    build = spark.createDataFrame(
        [(1, 10, "lo"), (1, 15, "hi")], "key int, bts int, v string"
    )
    out = asof_join(
        probe, build, "key", "pts", "bts", ["v"], direction="nearest"
    )
    got = {r["pts"]: r["v"] for r in out.collect()}
    assert got == {
        12: "lo",  # |12-10| = 2 < |15-12| = 3
        14: "hi",  # |14-15| = 1 < |14-10| = 4
        1: "lo",   # only forward side exists? no: backward none, forward 10 -> lo
        30: "hi",  # only backward side exists
    }


def test_asof_join_bad_direction_rejected(spark):
    import pytest

    from engine.ops.asof import asof_join

    df = spark.createDataFrame([(1, 1)], "key int, pts int")
    b = spark.createDataFrame([(1, 1, "x")], "key int, bts int, v string")
    with pytest.raises(ValueError):
        asof_join(df, b, "key", "pts", "bts", ["v"], direction="sideways")


def test_asof_join_nearest_on_date_columns(spark):
    """direction='nearest' must work on DateType timestamps (DATE cannot
    cast straight to double — routed through a timestamp cast)."""
    from engine.ops.asof import asof_join

    probe = spark.createDataFrame(
        [(1, "2024-01-12"), (1, "2024-01-14")], "key int, pts string"
    ).select("key", F.col("pts").cast("date").alias("pts"))
    build = spark.createDataFrame(
        [(1, "2024-01-10", "lo"), (1, "2024-01-15", "hi")],
        "key int, bts string, v string",
    ).select("key", F.col("bts").cast("date").alias("bts"), "v")
    out = asof_join(probe, build, "key", "pts", "bts", ["v"], direction="nearest")
    got = {str(r["pts"]): r["v"] for r in out.collect()}
    assert got == {"2024-01-12": "lo", "2024-01-14": "hi"}
