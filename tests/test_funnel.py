"""Funnel-step semantics: ordering, windows, strict-after, null users."""

from __future__ import annotations

import datetime as dt

import pytest

from engine.extended.funnel import funnel_steps


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, et) for i, (ts, u, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _at(hours):
    return T0 + dt.timedelta(hours=hours)


def test_funnel_counts_ordered_sequences_only(spark):
    e = _ev(
        spark,
        [
            # user 1 completes: view → click → purchase
            (_at(0), 1, "view"), (_at(1), 1, "click"), (_at(2), 1, "purchase"),
            # user 2 clicks BEFORE viewing: stops at step 1
            (_at(1), 2, "click"), (_at(2), 2, "view"),
            # user 3 views only
            (_at(0), 3, "view"),
            # user 4 never views (click+purchase don't count)
            (_at(0), 4, "click"), (_at(1), 4, "purchase"),
        ],
    )
    got = {
        r["step"]: (r["step_name"], r["n_users"])
        for r in funnel_steps(e, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: ("view", 3), 2: ("click", 1), 3: ("purchase", 1)}


def test_funnel_window_and_strict_after(spark):
    e = _ev(
        spark,
        [
            # user 1: click 8 days after view — outside the 7-day window
            (_at(0), 1, "view"), (_at(8 * 24), 1, "click"),
            # user 2: click at the SAME instant as view — strictly-after excludes
            (_at(0), 2, "view"), (_at(0), 2, "click"),
            # user 3: click exactly at the window boundary (inclusive)
            (_at(0), 3, "view"), (_at(7 * 24), 3, "click"),
        ],
    )
    got = {r["step"]: r["n_users"] for r in funnel_steps(e, ["view", "click"]).collect()}
    assert got == {1: 3, 2: 1}


def test_funnel_uses_first_occurrence_per_step(spark):
    """The chain anchors on MIN(ts) per step: user 1's first view is early,
    so a click that precedes a LATER view still qualifies."""
    e = _ev(
        spark,
        [
            (_at(0), 1, "view"), (_at(5), 1, "view"), (_at(2), 1, "click"),
        ],
    )
    got = {r["step"]: r["n_users"] for r in funnel_steps(e, ["view", "click"]).collect()}
    assert got == {1: 1, 2: 1}


def test_funnel_null_user_never_chains(spark):
    e = _ev(
        spark,
        [
            (_at(0), None, "view"), (_at(1), None, "click"),
        ],
    )
    got = {r["step"]: r["n_users"] for r in funnel_steps(e, ["view", "click"]).collect()}
    assert got == {1: 1, 2: 0}  # null groups count in step 1, never join on


def test_funnel_validation(spark):
    e = _ev(spark, [(_at(0), 1, "view")])
    with pytest.raises(ValueError, match="non-empty"):
        funnel_steps(e, [])
    with pytest.raises(ValueError, match="window_days"):
        funnel_steps(e, ["view"], window_days=0)


def test_cohort_retention_hand_computed(spark):
    from engine.extended.funnel import cohort_retention

    e = _ev(
        spark,
        [
            # user 1: first in Jan, active Jan + Feb + Apr
            (dt.datetime(2024, 1, 5), 1, "view"),
            (dt.datetime(2024, 2, 10), 1, "click"),
            (dt.datetime(2024, 4, 1), 1, "view"),
            # user 2: first in Jan, Jan only (two events, one (u, k) row)
            (dt.datetime(2024, 1, 20), 2, "view"),
            (dt.datetime(2024, 1, 21), 2, "view"),
            # user 3: first in Feb, active Feb + Mar
            (dt.datetime(2024, 2, 1), 3, "view"),
            (dt.datetime(2024, 3, 30), 3, "view"),
            # null user / null ts excluded
            (dt.datetime(2024, 1, 1), None, "view"),
            (None, 4, "view"),
        ],
    )
    got = {
        (r["cohort"], r["k"]): r["n_users"] for r in cohort_retention(e).collect()
    }
    assert got == {
        ("2024-01", 0): 2,
        ("2024-01", 1): 1,
        ("2024-01", 3): 1,
        ("2024-02", 0): 1,
        ("2024-02", 1): 1,
    }


def test_cohort_retention_year_boundary(spark):
    """Dec → Jan is k=1, not a negative or 11-month artifact — the
    year·12+month arithmetic, not MONTH() subtraction."""
    from engine.extended.funnel import cohort_retention

    e = _ev(
        spark,
        [
            (dt.datetime(2023, 12, 31), 1, "view"),
            (dt.datetime(2024, 1, 1), 1, "view"),
        ],
    )
    got = {
        (r["cohort"], r["k"]): r["n_users"] for r in cohort_retention(e).collect()
    }
    assert got == {("2023-12", 0): 1, ("2023-12", 1): 1}
