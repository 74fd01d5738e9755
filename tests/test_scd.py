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
