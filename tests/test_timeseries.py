"""Gap-fill + forward-fill: grid bounds, LOCF semantics, null handling."""

from __future__ import annotations

import datetime as dt

import pytest

from engine.extended.timeseries import gapfill_ffill


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731


def test_gapfill_fills_gaps_with_last_value(spark):
    e = _ev(
        spark,
        [
            (1, T(0), 10.0),
            (1, T(3), 30.0),   # 3-hour gap: ticks at 1:00 and 2:00 carry 10.0
        ],
    )
    got = {
        r["tick"]: r["filled"]
        for r in gapfill_ffill(e, step_seconds=3600).collect()
    }
    assert got == {T(0): 10.0, T(1): 10.0, T(2): 10.0, T(3): 30.0}


def test_gapfill_null_observation_is_carried_over(spark):
    """A sensor emitting NULL keeps its last real reading (ignorenulls)."""
    e = _ev(spark, [(1, T(0), 5.0), (1, T(1), None), (1, T(2), 7.0)])
    got = {
        r["tick"]: r["filled"]
        for r in gapfill_ffill(e, step_seconds=3600).collect()
    }
    assert got == {T(0): 5.0, T(1): 5.0, T(2): 7.0}


def test_gapfill_same_instant_observation_wins_and_ties_break_high(spark):
    e = _ev(
        spark,
        [
            (1, T(0), 1.0),
            (1, T(1), 3.0),
            (1, T(1), 2.0),  # same-instant pair: deterministic max-value fill
        ],
    )
    got = {
        r["tick"]: r["filled"]
        for r in gapfill_ffill(e, step_seconds=3600).collect()
    }
    assert got == {T(0): 1.0, T(1): 3.0}


def test_gapfill_per_key_bounds_and_validation(spark):
    e = _ev(
        spark,
        [
            (1, T(0), 1.0), (1, T(2), 2.0),
            (2, T(5), 9.0),          # single obs: one tick
            (None, T(0), 4.0),       # null key drops
            (3, None, 4.0),          # null ts drops the row (and key 3)
        ],
    )
    out = gapfill_ffill(e, step_seconds=3600).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["user_id"], []).append((r["tick"], r["filled"]))
    assert set(by_key) == {1, 2}
    assert sorted(by_key[1]) == [(T(0), 1.0), (T(1), 1.0), (T(2), 2.0)]
    assert by_key[2] == [(T(5), 9.0)]
    with pytest.raises(ValueError, match="step_seconds"):
        gapfill_ffill(e, step_seconds=0)
