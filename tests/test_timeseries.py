"""Gap-fill + forward-fill, rolling z-score, EWMA: grid bounds, LOCF
semantics, null handling, trailing-frame exclusion, weight math."""

from __future__ import annotations

import datetime as dt

import pytest

from engine.extended.timeseries import ewma, gapfill_ffill, rolling_zscore


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


def test_rolling_zscore_excludes_current_and_needs_min_points(spark):
    """Frame is strictly-trailing: the spike's own value never contaminates
    its baseline.  Baseline [10,10,12,12]: mean 11, sd ~1.1547 -> z(25)
    = 12.124; rows with < min_points history stay NULL."""
    e = _ev(
        spark,
        [(1, T(h), v) for h, v in enumerate([10.0, 10.0, 12.0, 12.0, 25.0])],
    )
    out = {
        r["ts"]: r["z"]
        for r in rolling_zscore(e, window_rows=12, min_points=4).collect()
    }
    assert out[T(0)] is None and out[T(1)] is None and out[T(3)] is None
    assert out[T(4)] == pytest.approx(12.124, abs=1e-9)


def test_rolling_zscore_zero_variance_yields_null(spark):
    e = _ev(spark, [(1, T(h), 5.0) for h in range(6)])
    out = rolling_zscore(e, window_rows=12, min_points=4).collect()
    assert all(r["z"] is None for r in out)


def test_rolling_zscore_window_truncates_old_history(spark):
    """With window_rows=3 the early outlier falls out of the frame."""
    vals = [100.0, 10.0, 10.0, 12.0, 12.0]
    e = _ev(spark, [(1, T(h), v) for h, v in enumerate(vals)])
    out = {
        r["ts"]: (r["roll_n"], r["roll_mean"])
        for r in rolling_zscore(e, window_rows=3, min_points=2).collect()
    }
    # row at T(4): frame = [10, 10, 12] (the 100 aged out)
    assert out[T(4)][0] == 3
    assert out[T(4)][1] == pytest.approx((10 + 10 + 12) / 3)


def test_rolling_zscore_validation(spark):
    e = _ev(spark, [(1, T(0), 1.0)])
    with pytest.raises(ValueError, match="window_rows"):
        rolling_zscore(e, window_rows=0)
    with pytest.raises(ValueError, match="min_points"):
        rolling_zscore(e, min_points=1)


def test_ewma_hand_computed_weights(spark):
    """Three points [2, 4, 8]: weights 0.25/0.5/1, den = 2 - 2^-2 = 1.75,
    ewma = (0.5 + 2 + 8) / 1.75 = 6.0.  First row is its own average."""
    e = _ev(spark, [(1, T(0), 2.0), (1, T(1), 4.0), (1, T(2), 8.0)])
    out = {r["ts"]: r["ewma"] for r in ewma(e, window_rows=8).collect()}
    assert out[T(0)] == pytest.approx(2.0)
    assert out[T(1)] == pytest.approx(round((2.0 * 0.5 + 4.0) / 1.5, 4))
    assert out[T(2)] == pytest.approx(6.0)


def test_ewma_window_truncation_reweights(spark):
    """window_rows=2 keeps only the last two points: [4, 8] -> (2 + 8)/1.5."""
    e = _ev(spark, [(1, T(0), 2.0), (1, T(1), 4.0), (1, T(2), 8.0)])
    out = {r["ts"]: r["ewma"] for r in ewma(e, window_rows=2).collect()}
    assert out[T(2)] == pytest.approx(round((4.0 * 0.5 + 8.0) / 1.5, 4))
    with pytest.raises(ValueError, match="window_rows"):
        ewma(e, window_rows=0)


def test_rolling_ops_are_single_exchange(spark):
    """Both operators cost exactly one shuffle (the key window)."""
    e = _ev(spark, [(1, T(0), 1.0), (1, T(1), 2.0), (2, T(0), 3.0)])
    for op in (rolling_zscore, ewma):
        plan = op(e)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# lttb_downsample
# ---------------------------------------------------------------------------

from engine.extended.timeseries import lttb_downsample


def test_lttb_small_series_passes_through_whole(spark):
    e = _ev(spark, [(1, T(h), float(h)) for h in range(5)])
    out = lttb_downsample(e, n_buckets=12).collect()
    assert len(out) == 5
    assert {r["picked_value"] for r in out} == {0.0, 1.0, 2.0, 3.0, 4.0}


def test_lttb_keeps_endpoints_and_one_point_per_bucket(spark):
    e = _ev(spark, [(1, T(h % 24, h // 24), float(h % 7)) for h in range(60)])
    out = sorted(lttb_downsample(e, n_buckets=6).collect(), key=lambda r: r["tick"])
    assert len(out) == 6
    assert {r["bucket"] for r in out} == set(range(6))
    # endpoints are the true first/last observations
    assert out[0]["tick"] == min(T(h % 24, h // 24) for h in range(60))
    assert out[-1]["tick"] == max(T(h % 24, h // 24) for h in range(60))


def test_lttb_selects_the_spike(spark):
    """Flat series with one huge spike: the spike's bucket must pick it."""
    vals = [1.0] * 30
    vals[14] = 500.0
    e = _ev(spark, [(1, T(h % 24, h // 24), v) for h, v in enumerate(vals)])
    out = lttb_downsample(e, n_buckets=6).collect()
    assert 500.0 in {r["picked_value"] for r in out}


def test_lttb_validation_and_null_handling(spark):
    e = _ev(spark, [(1, T(0), 1.0), (None, T(1), 2.0), (1, None, 3.0), (1, T(2), None)])
    with pytest.raises(ValueError, match="n_buckets"):
        lttb_downsample(e, n_buckets=2)
    out = lttb_downsample(e, n_buckets=3).collect()
    assert [(r["user_id"], r["picked_value"]) for r in out] == [(1, 1.0)]


# ---------------------------------------------------------------------------
# rollup_partials / rollup_merge (continuous-aggregate layering)
# ---------------------------------------------------------------------------

from engine.extended.timeseries import rollup_merge, rollup_partials


def test_rollup_merge_is_lossless_vs_direct(spark):
    """Hourly partials merged to a day equal the direct daily aggregate:
    counts/extrema exactly, sums at the quantization unit."""
    rows = [
        (1, dt.datetime(2024, 1, 1, h, m), 1, "m", float(h) + m / 100, None)
        for h in range(5)
        for m in (0, 30)
    ]
    from engine.schemas import EVENTS

    df = spark.createDataFrame(rows, EVENTS)
    hourly = rollup_partials(df, key_cols=["event_type"], bucket="hour")
    assert hourly.count() == 5  # one partial per hour
    daily = rollup_merge(hourly, key_cols=["event_type"], bucket="day").collect()
    assert len(daily) == 1
    r = daily[0]
    vals = [float(h) + m / 100 for h in range(5) for m in (0, 30)]
    assert r["n"] == len(vals)
    assert r["vmin"] == min(vals) and r["vmax"] == max(vals)
    assert r["total"] == pytest.approx(round(sum(vals), 4))
    assert r["vavg"] == pytest.approx(round(sum(vals) / len(vals), 4))


def test_rollup_half_cases_round_away_from_zero_exactly(spark):
    """Quantized sums make exact .00005 halves common; the integer
    rounding path resolves them away from zero on both signs."""
    from engine.schemas import EVENTS

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "pos", 0.00005, None),
        (2, base, 1, "neg", -0.00005, None),
    ]
    df = spark.createDataFrame(rows, EVENTS)
    out = {
        r["event_type"]: (r["total"], r["vavg"])
        for r in rollup_merge(
            rollup_partials(df, key_cols=["event_type"], bucket="hour"),
            key_cols=["event_type"],
            bucket="day",
        ).collect()
    }
    assert out["pos"] == (0.0001, 0.0001)
    assert out["neg"] == (-0.0001, -0.0001)


def test_rollup_validation(spark):
    from engine.schemas import EVENTS

    df = spark.createDataFrame([], EVENTS)
    p = rollup_partials(df, key_cols=["event_type"])
    with pytest.raises(ValueError, match="sum_round"):
        rollup_merge(p, key_cols=["event_type"], sum_round=7)
