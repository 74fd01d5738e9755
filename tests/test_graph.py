"""Integer-PageRank: hand-computed ranks, dangling mass, exact division."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.extended.graph import _idiv, pagerank


def _edges(spark):
    # a → b, a → c, b → a ; c is dangling
    return spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a")], "src string, dst string"
    )


def test_pagerank_matches_hand_computation(spark):
    """iter1: a=150000+850000, b=c=150000+85·500000//100=575000;
    iter2: a gets b's 575000 → 150000+(85·575000)//100=638750."""
    r1 = {r["node"]: r["rank"] for r in pagerank(_edges(spark), iters=1).collect()}
    assert r1 == {"a": 1000000, "b": 575000, "c": 575000}
    r2 = {r["node"]: r["rank"] for r in pagerank(_edges(spark), iters=2).collect()}
    assert r2 == {"a": 638750, "b": 575000, "c": 575000}


def test_pagerank_lazy_and_materialized_agree(spark):
    lazy = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark), iters=3, materialize=False).collect()
    }
    mat = pagerank(_edges(spark), iters=3)
    assert {r["node"]: r["rank"] for r in mat.collect()} == lazy
    mat.unpersist()


def test_pagerank_no_inbound_node_keeps_base_rank(spark):
    e = spark.createDataFrame([("x", "y")], "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=3, materialize=False).collect()}
    assert got["x"] == 150000  # nothing points at x
    assert got["y"] == 150000 + (85 * 150000) // 100


def test_pagerank_validation(spark):
    e = _edges(spark)
    with pytest.raises(ValueError, match="iters"):
        pagerank(e, iters=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(e, damping_pct=0)
    with pytest.raises(ValueError, match="unit"):
        pagerank(e, unit=0)


def test_idiv_exact_up_to_the_documented_bound(spark):
    """_idiv must equal Python's // right up to the 2^53 dividend bound,
    including the a = k·b - 1 shape that sits just under a quotient
    boundary."""
    cases = [
        ((1 << 53) - 1, 997),
        ((1 << 53) - 1, (1 << 31) - 1),
        (9_007_199_254_740_880, 3_037_000_499),  # k·b - 1 near the bound
        (85 * 150_000, 100),
        (0, 7),
    ]
    df = spark.createDataFrame(cases, "a long, b long")
    got = df.select("a", "b", _idiv(F.col("a"), F.col("b")).alias("i")).collect()
    for r in got:
        assert r["i"] == r["a"] // r["b"], (r["a"], r["b"])
