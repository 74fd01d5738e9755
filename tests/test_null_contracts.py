"""Regression pins for the fuzz-found NULL/IEEE contracts (the ledger in
tools/fuzz_oracle.py).  Each test encodes the decided semantics directly so
a refactor can't silently revert to engine defaults."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_keep_first_unknown_ts_never_wins(spark):
    from engine.ops.dedup import keep_first

    df = spark.createDataFrame(
        [(1, None, "null-ts"), (1, _ts("2024-01-02 00:00:00"), "real")],
        "k long, ts timestamp, tag string",
    )
    out = keep_first(df, ["k"], ["ts"]).collect()
    assert [r["tag"] for r in out] == ["real"]


def test_keyset_page_nulls_sort_last(spark):
    from engine.ops.relational import keyset_page

    df = spark.createDataFrame(
        [(1, None), (2, _ts("2024-01-01 00:00:00"))], "id long, ts timestamp"
    )
    out = keyset_page(df, ["ts"], 1).collect()
    assert out[0]["id"] == 2


def test_asof_null_probe_ts_matches_nothing(spark):
    from engine.ops.asof import asof_join

    probe = spark.createDataFrame(
        [(1, "k", None), (2, "k", _ts("2024-01-02 00:00:00"))],
        "pid long, key string, pts timestamp",
    )
    build = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00"), 5.0)],
        "key string, bts timestamp, v double",
    )
    out = {r["pid"]: r["v"] for r in asof_join(probe, build, "key", "pts", "bts", ["v"]).collect()}
    assert out[1] is None  # unknown probe time: no match, row survives
    assert out[2] == 5.0


def test_asof_null_build_ts_and_null_key_dropped(spark):
    from engine.ops.asof import asof_join

    probe = spark.createDataFrame(
        [(1, "k", _ts("2024-01-05 00:00:00")), (2, None, _ts("2024-01-05 00:00:00"))],
        "pid long, key string, pts timestamp",
    )
    build = spark.createDataFrame(
        [
            ("k", None, 1.0),  # unknown build time: cannot be "latest before"
            (None, _ts("2024-01-01 00:00:00"), 2.0),  # NULL key matches nothing
        ],
        "key string, bts timestamp, v double",
    )
    out = {r["pid"]: r["v"] for r in asof_join(probe, build, "key", "pts", "bts", ["v"]).collect()}
    assert out == {1: None, 2: None}


def test_asof_matched_row_with_null_value_not_conflated(spark):
    from engine.ops.asof import asof_join

    probe = spark.createDataFrame(
        [(1, "k", _ts("2024-01-10 00:00:00"))], "pid long, key string, pts timestamp"
    )
    build = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 00:00:00"), 1.0),
            ("k", _ts("2024-01-05 00:00:00"), None),  # latest match, null VALUE
        ],
        "key string, bts timestamp, v double",
    )
    r = asof_join(probe, build, "key", "pts", "bts", ["bts", "v"]).first()
    # must take the LATEST row (null value), never resurrect the older 1.0
    assert r["bts"] == _ts("2024-01-05 00:00:00") and r["v"] is None


def test_event_time_windows_exclude_null_ts(spark):
    from engine.streaming.windows import tumbling_agg

    df = spark.createDataFrame(
        [(None, "a", 1.0), (_ts("2024-01-01 00:30:00"), "a", 2.0)],
        "ts timestamp, k string, v double",
    )
    out = tumbling_agg(df, "ts", "1 hour", ["k"], [F.count(F.lit(1)).alias("n")])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n"] == 1


def test_quantize_scale_never_negative_zero(spark):
    import math

    from engine.extended.similarity import quantize_int8

    df = spark.createDataFrame([(1, [-0.0, 0.0])], "vec_id long, embedding array<double>")
    r = quantize_int8(df).first()
    assert math.copysign(1.0, r["qscale"]) == 1.0  # +0.0, not -0.0


def test_ivf_seeded_excludes_null_vectors(spark):
    from engine.extended.similarity import ivf_build_seeded

    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(12)] + [(99, None)],
        "vec_id long, embedding array<double>",
    )
    assigned, cents = ivf_build_seeded(df, n_lists=2, iters=1, dim=2)
    ids = {r["vec_id"] for r in assigned.select("vec_id").collect()}
    assert 99 not in ids and len(cents) == 2
