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


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------

from engine.extended.graph import triangle_counts  # noqa: E402


def _tri(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _counts(df):
    return {r["node"]: r["n_triangles"] for r in df.collect()}


def test_triangles_k4_every_node_in_three(spark):
    """K4 has 4 triangles; each node sits in C(3,2) = 3 of them."""
    nodes = ["a", "b", "c", "d"]
    e = _tri(
        spark,
        [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1 :]],
    )
    assert _counts(triangle_counts(e)) == {n: 3 for n in nodes}


def test_triangles_path_and_star_have_none(spark):
    path = _tri(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert triangle_counts(path).count() == 0
    star = _tri(spark, [("hub", x) for x in "abcdef"])
    assert triangle_counts(star).count() == 0


def test_triangles_canonicalize_duplicates_reversals_selfloops(spark):
    """One triangle reported once despite duplicate, reversed, and
    self-loop edges; NULL endpoints drop."""
    e = _tri(
        spark,
        [
            ("a", "b"), ("b", "a"), ("a", "b"),   # dup + reversed
            ("b", "c"), ("c", "a"),
            ("a", "a"),                            # self-loop
            (None, "b"), ("c", None),
        ],
    )
    assert _counts(triangle_counts(e)) == {"a": 1, "b": 1, "c": 1}


def test_triangles_two_shared_edge(spark):
    """Two triangles sharing edge (a,b): a and b are in 2, c and d in 1."""
    e = _tri(
        spark,
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")],
    )
    assert _counts(triangle_counts(e)) == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_clustering_coefficients_k4_and_path(spark):
    """K4: every node's neighborhood is complete -> coefficient 1.0;
    a path's middle node has 2 unconnected neighbors -> 0.0; degree-1
    endpoints are excluded."""
    from engine.extended.graph import clustering_coefficients

    nodes = ["a", "b", "c", "d"]
    k4 = _tri(
        spark, [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1 :]]
    )
    got = {
        r["node"]: (r["degree"], r["coefficient"])
        for r in clustering_coefficients(k4).collect()
    }
    assert got == {n: (3, 1.0) for n in nodes}

    path = _tri(spark, [("a", "b"), ("b", "c")])
    got2 = {r["node"]: r["coefficient"] for r in clustering_coefficients(path).collect()}
    assert got2 == {"b": 0.0}
