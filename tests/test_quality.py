"""Round-3 data-quality operators: constraint checks, key audits,
snapshot diffing."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.ops.quality import (
    check_constraints,
    check_foreign_key,
    check_unique,
    snapshot_diff,
)


def test_check_constraints_counts_nulls_as_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], "k long, v double"
    )
    rows = {
        r["rule"]: r
        for r in check_constraints(
            df, {"v_positive": F.col("v") > 0, "k_small": F.col("k") < 100}
        ).collect()
    }
    assert rows["v_positive"]["n_violations"] == 2  # -1.0 and NULL
    assert rows["k_small"]["n_violations"] == 0
    assert rows["v_positive"]["n_rows"] == 3


def test_check_unique_reports_dup_keys_and_rows(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (3,)], "k long"
    )
    r = check_unique(df, ["k"]).first()
    assert r["n_keys"] == 3 and r["n_dup_keys"] == 2 and r["n_dup_rows"] == 5


def test_check_foreign_key_separates_orphans_from_nulls(spark):
    fact = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    r = check_foreign_key(fact, "fk", dim, "id").first()
    assert r["n_orphans"] == 1 and r["n_null_keys"] == 1


def test_snapshot_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e"), (4, None)], "k long, v string"
    )
    out = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # 1 unchanged (absent), 2 changed, 3 removed, 5 added, 4 unchanged-null (absent)
    assert out == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_null_vs_empty_do_not_collide(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "")], "k long, v string")
    out = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert [(r["k"], r["change"]) for r in out] == [(1, "changed")]
