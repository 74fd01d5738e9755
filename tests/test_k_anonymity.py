"""k_anonymity semantics: class sizes, the at-risk threshold boundary, and
NULL quasi-identifier grouping (SQL GROUP BY semantics — one class)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.ops.profile import k_anonymity


def test_class_sizes_and_threshold(spark):
    rows = (
        [("a", 1)] * 5   # exactly k -> safe
        + [("a", 2)] * 4  # k-1 -> at risk
        + [("b", 1)] * 1  # singleton -> at risk
    )
    df = spark.createDataFrame(rows, "seg string, nat int")
    got = {
        (r["seg"], r["nat"]): (r["class_size"], r["at_risk"])
        for r in k_anonymity(df, ["seg", "nat"], k=5).collect()
    }
    assert got == {
        ("a", 1): (5, False),
        ("a", 2): (4, True),
        ("b", 1): (1, True),
    }


def test_null_quasi_values_form_one_class(spark):
    df = spark.createDataFrame(
        [("x", None), ("x", None), ("x", 1)], "seg string, nat int"
    )
    cls = k_anonymity(df, ["seg", "nat"], k=2).collect()
    sizes = {(r["seg"], r["nat"]): r["class_size"] for r in cls}
    assert sizes == {("x", None): 2, ("x", 1): 1}


def test_empty_quasi_cols_rejected(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        k_anonymity(df, [])


def test_single_aggregate_plan(spark):
    df = spark.createDataFrame([("a", 1)], "seg string, nat int")
    p = (
        k_anonymity(df, ["seg", "nat"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hash aggregate pair, no join, no window
    assert "Join" not in p and "Window" not in p
    assert p.count("Exchange") <= 1


def test_at_risk_rows_match_filter(spark):
    df = spark.createDataFrame(
        [(s, n) for s in "ab" for n in range(3) for _ in range(n + 1)],
        "seg string, nat int",
    )
    cls = k_anonymity(df, ["seg", "nat"], k=2)
    risk = cls.where("at_risk").agg(F.sum("class_size")).collect()[0][0]
    assert risk == 2  # the two (seg, 0) singletons
