"""Count-min sketch + salted-distinct semantics and plan-shape gates.

Semantics: CMS estimates never under-count, collisions over-count (forced
with a tiny width), merge is exactly linear; salted_count_distinct equals
plain COUNT(DISTINCT) including NULL exclusion and many-salts-vs-few.

Plan shapes (the 100 TB claims): the sketch build shuffles on (row, col) —
the d×w cell grid — NOT on the key column; estimation probes the sketch via
a broadcast hash join; the salted distinct's first aggregate shuffles on
(group, salt).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.extended.sketch import cms_build, cms_estimate, cms_merge
from engine.ops.skew import salted_count_distinct


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_cms_never_undercounts_and_exact_when_wide(spark):
    rows = [(k,) for k in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]]
    df = _df(spark, rows, ["k"])
    sk = cms_build(df, "k", depth=3, width=4096)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(sk, exact, "k", depth=3, width=4096)
    got = {r["k"]: (r["exact_n"], r["est_n"]) for r in est.collect()}
    assert got == {"a": (5, 5), "b": (3, 3), "c": (2, 2), "d": (1, 1)}


def test_cms_collisions_overcount_never_undercount(spark):
    rows = [(f"k{i}",) for i in range(40) for _ in range(i % 3 + 1)]
    df = _df(spark, rows, ["k"])
    sk = cms_build(df, "k", depth=2, width=8)  # forced collisions
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(sk, exact, "k", depth=2, width=8)
    rows_out = est.collect()
    assert len(rows_out) == 40
    assert all(r["est_n"] >= r["exact_n"] for r in rows_out)
    assert any(r["est_n"] > r["exact_n"] for r in rows_out)  # w=8 must collide


def test_cms_null_keys_skipped(spark):
    df = _df(spark, [("a",), (None,), ("a",), (None,)], ["k"])
    sk = cms_build(df, "k", depth=3, width=64)
    total = sk.agg(F.sum("cnt").alias("s")).collect()[0]["s"]
    assert total == 2 * 3  # two non-null rows × depth


def test_cms_merge_is_linear(spark):
    rows = [(f"k{i % 7}", i) for i in range(50)]
    df = _df(spark, rows, ["k", "i"])
    a = cms_build(df.where(F.col("i") < 20), "k", depth=3, width=32)
    b = cms_build(df.where(F.col("i") >= 20), "k", depth=3, width=32)
    merged = {(r["row"], r["col"]): r["cnt"] for r in cms_merge(a, b).collect()}
    whole = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(df, "k", depth=3, width=32).collect()
    }
    assert merged == whole


def test_cms_build_shuffles_on_cells_not_keys(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = plan(cms_build(li, "l_partkey"))
    # partial aggregation before the exchange, grouping on the cell grid
    assert "hashpartitioning" in p
    part = p.split("hashpartitioning(")[1].split(")")[0]
    assert "row" in part and "col" in part and "l_partkey" not in part
    assert p.count("HashAggregate") >= 2  # map-side partial + final


def test_cms_estimate_broadcasts_sketch(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    sk = cms_build(li, "l_partkey")
    keys = li.select("l_partkey").distinct()
    p = plan(cms_estimate(sk, keys, "l_partkey"))
    assert "BroadcastHashJoin" in p


def test_salted_distinct_matches_plain(spark):
    rows = [(f"g{i % 3}", f"v{i % 17}") for i in range(200)] + [
        ("g0", None),
        (None, "v1"),
    ]
    df = _df(spark, rows, ["g", "v"])
    got = {
        r["g"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["g"], "v", salts=16).collect()
    }
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == want
    # degenerate salts=1 also exact
    got1 = {
        r["g"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["g"], "v", salts=1).collect()
    }
    assert got1 == want


def test_salted_distinct_partial_shuffles_on_salt(spark):
    import re

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = plan(salted_count_distinct(li, ["l_returnflag"], "l_partkey", salts=16))
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", p)
    # the distinct phase must spread on (group, salt, value) — the salt alias
    # shows up as a _groupingexpression in the physical plan
    assert any(
        "l_returnflag" in x and "l_partkey" in x and "_groupingexpression" in x
        for x in parts
    ), parts


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram (quantile sketch family member)
# ---------------------------------------------------------------------------


def test_hist_merge_equals_whole_and_quantile_bound(spark):
    from engine.extended.sketch import hist_build, hist_merge, hist_quantile

    rows = [(float(i), i % 2) for i in range(1000)]
    df = spark.createDataFrame(rows, "v double, shard int")
    kw = dict(lo=0.0, hi=1000.0, n_buckets=50)
    parts = [
        hist_build(df.where(F.col("shard") == s), "v", **kw) for s in (0, 1)
    ]
    merged = hist_merge(*parts)
    whole = hist_build(df, "v", **kw)
    j = merged.select("bucket", F.col("cnt").alias("m")).join(
        whole.select("bucket", F.col("cnt").alias("w")), "bucket", "full"
    )
    assert j.where("m IS NULL OR w IS NULL OR m <> w").count() == 0
    est = hist_quantile(merged, 0.5, **kw).collect()[0]["est"]
    assert abs(est - 499.5) <= 20.0  # one bucket width of the true median


def test_hist_clamps_outliers_and_skips_nulls(spark):
    from engine.extended.sketch import hist_build

    df = spark.createDataFrame(
        [(-50.0,), (5.0,), (999.0,), (None,)], "v double"
    )
    h = {r["bucket"]: r["cnt"] for r in
         hist_build(df, "v", lo=0.0, hi=100.0, n_buckets=10).collect()}
    assert h == {0: 2, 9: 1}  # -50 clamps to 0, 999 clamps to top, NULL gone


def test_hist_build_constant_group_cardinality_plan(spark):
    from engine.extended.sketch import hist_build

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    h = hist_build(df, "v", lo=0.0, hi=100.0, n_buckets=8)
    p = plan(h)
    assert "Join" not in p  # one aggregate chain, bucket-bounded


def test_cms_estimate_absent_key_is_zero_via_empty_cell(spark):
    """Open-world probe: a key with at least one EMPTY counter cell must
    estimate 0 — the left-join + coalesce(0) path (an inner join returned
    the min of only the occupied cells: a false positive frequency)."""
    from engine.extended.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([("a",)] * 4, ["k"])
    sk = cms_build(df, "k", depth=3, width=4096)
    probe = spark.createDataFrame([("a",), ("never-seen-key",)], ["k"])
    got = {
        r["k"]: r["est_n"]
        for r in cms_estimate(sk, probe, "k", depth=3, width=4096).collect()
    }
    assert got["a"] == 4
    # with one key in a width-4096 sketch, any other key has >= 1 empty cell
    assert got["never-seen-key"] == 0


def test_py_cms_index_matches_jvm_hash(spark):
    """The driver-side hash replica used by streaming_topk's candidate
    pruning must be bit-identical to the JVM cms_hash_col expression —
    a drift here silently re-ranks candidates."""
    from engine.extended.sketch import cms_hash_col
    from engine.streaming.sketches import _py_cms_index

    keys = ["a", "hot-key", "üñïçødé", "", "user|123", "x" * 100]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    for row in range(3):
        got = {
            r["k"]: r["h"]
            for r in df.select(
                "k", cms_hash_col(F.col("k"), row, 512).alias("h")
            ).collect()
        }
        for k in keys:
            assert got[k] == _py_cms_index(k, row, 512), (k, row)


def test_cms_estimate_keeps_duplicate_probe_rows(spark):
    """Duplicate probe rows each get their own output row (advice-review
    catch: grouping on the probe frame's columns collapsed them)."""
    from engine.extended.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([("a",)] * 3 + [("b",)], ["k"])
    sk = cms_build(df, "k", depth=3, width=4096)
    probe = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    rows = cms_estimate(sk, probe, "k", depth=3, width=4096).collect()
    assert sorted((r["k"], r["est_n"]) for r in rows) == [
        ("a", 3), ("a", 3), ("b", 1),
    ]


def test_cms_estimate_rejects_reserved_probe_columns(spark):
    """A probe frame already carrying row/col/cnt would make the cell join
    ambiguous — raise instead of mis-grouping (advice-review catch)."""
    import pytest

    from engine.extended.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([("a",)], ["k"])
    sk = cms_build(df, "k", depth=3, width=64)
    probe = spark.createDataFrame([("a", 1)], ["k", "cnt"])
    with pytest.raises(ValueError, match="cnt"):
        cms_estimate(sk, probe, "k", depth=3, width=64)


def test_salted_count_distinct_keeps_all_null_groups(spark):
    """A group whose values are all NULL must appear with count 0, exactly
    like the plain COUNT(DISTINCT) aggregate."""
    df = spark.createDataFrame(
        [("g1", None), ("g1", None), ("g2", "v"), ("g2", None)],
        "g string, v string",
    )
    got = {
        r["g"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["g"], "v", salts=4).collect()
    }
    assert got == {"g1": 0, "g2": 1}



def test_hll_shard_merge_equals_whole(spark):
    df = spark.createDataFrame(
        [(i % 5, f"u{i % 400}") for i in range(3000)], "shard int, u string"
    )
    shards = df.groupBy("shard").agg(F.hll_sketch_agg("u", F.lit(12)).alias("sk"))
    merged = shards.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m")
    ).collect()[0]["m"]
    whole = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u", F.lit(12))).alias("w")
    ).collect()[0]["w"]
    assert merged == whole  # register-max merge is associative
    assert abs(merged - 400) <= 0.05 * 400



def test_hll_inclusion_exclusion_intersection(spark):
    """|A ∩ B| by inclusion-exclusion on HLL sketches stays within 10% of
    the union even at dense (non-sparse) cardinalities."""
    a = spark.range(0, 6000).select(F.col("id").alias("u"))
    b = spark.range(4000, 10000).select(F.col("id").alias("u"))
    sk = (
        a.select(F.lit("a").alias("s"), "u")
        .unionByName(b.select(F.lit("b").alias("s"), "u"))
        .groupBy("s")
        .agg(F.hll_sketch_agg("u", F.lit(12)).alias("sk"))
    )
    r = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u"),
        F.sum(F.hll_sketch_estimate("sk")).alias("s"),
    ).collect()[0]
    est_i = r["s"] - r["u"]
    assert abs(r["u"] - 10000) <= 0.05 * 10000
    assert abs(est_i - 2000) <= 0.10 * 10000



def test_cms_estimate_rejects_probe_id_column(spark):
    """ADVICE r6 (low): a probe frame already carrying __probe_id was
    silently overwritten by the internal id (and dropped from the output);
    it is reserved like row/col/cnt now."""
    import pytest

    from engine.extended.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([("a",)], ["k"])
    sk = cms_build(df, "k", depth=3, width=64)
    probe = spark.createDataFrame([("a", 7)], ["k", "__probe_id"])
    with pytest.raises(ValueError, match="__probe_id"):
        cms_estimate(sk, probe, "k", depth=3, width=64)


def test_size_rank_spreads_single_bitlength_corpus(spark):
    """VERDICT r6 #2: a corpus where 90% of rows share ONE size bit-length
    (all docs 512-1023 tokens) used to collapse the rank window onto one
    bucket.  The top-7-bit refinement must spread that mass across many
    order-consistent sub-buckets — no bucket holds more than a few percent
    — while ranks stay exactly the brute-force global order."""
    import random

    from engine.extended.sampling import _size_bucket, _size_rank

    rng = random.Random(11)
    rows = [(i, rng.randrange(512, 1024)) for i in range(9000)]  # one blen
    rows += [(9000 + i, rng.randrange(0, 200)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, sz long")
    dist = (
        df.withColumn("b", _size_bucket("sz"))
        .groupBy("b")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in dist)
    top = max(r["count"] for r in dist)
    # 9000 rows over 128 sub-buckets: the hottest holds ~1/128, not 90%
    assert top / total < 0.05, f"concentration survived: {top}/{total}"
    # refinement must not change results: exact brute-force rank parity
    got = {
        r["doc_id"]: r["__grank"]
        for r in _size_rank(df, "sz", "doc_id", descending=True).collect()
    }
    want = {
        i: rk
        for rk, (i, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == want


def test_bottomk_merge_identity_random_shards(spark):
    """Min-ranks commute with union: merging per-shard bottom-k sketches
    equals the direct bottom-k of the combined key set, for any sharding
    (including overlapping shards and duplicate keys)."""
    import random

    from engine.extended.sketch import bottomk_build, bottomk_merge

    rng = random.Random(5)
    keys = [f"k{rng.randrange(0, 5000)}" for _ in range(20000)]
    df = spark.createDataFrame([(k, rng.randrange(4)) for k in keys], "k string, shard int")
    direct = [
        (r["hash"], r["key"]) for r in bottomk_build(df, "k", k=16).collect()
    ]
    shards = [
        bottomk_build(df.filter(F.col("shard") == s), "k", k=16)
        for s in range(4)
    ]
    merged = [
        (r["hash"], r["key"]) for r in bottomk_merge(shards, k=16).collect()
    ]
    assert merged == direct and len(direct) == 16


def test_bottomk_jaccard_extremes_and_nulls(spark):
    """Identical sets estimate 10000 bp, disjoint sets 0 bp; NULL keys are
    excluded from the sketch."""
    from engine.extended.sketch import bottomk_build, bottomk_jaccard

    a = spark.createDataFrame([(f"x{i}",) for i in range(200)] + [(None,)], ["k"])
    b = spark.createDataFrame([(f"y{i}",) for i in range(200)], ["k"])
    ska, skb = bottomk_build(a, "k", k=32), bottomk_build(b, "k", k=32)
    same = bottomk_jaccard(ska, ska, k=32).first()
    assert (same["k_used"], same["n_both"], same["jaccard_bp"]) == (32, 32, 10000)
    disj = bottomk_jaccard(ska, skb, k=32).first()
    assert (disj["n_both"], disj["jaccard_bp"]) == (0, 0)
    assert ska.count() == 32  # NULL key contributed nothing


def test_bottomk_jaccard_estimates_true_overlap(spark):
    """On a 50%-overlap pair the bottom-64 estimate lands near the true
    Jaccard (1/3), well away from the extremes."""
    from engine.extended.sketch import bottomk_build, bottomk_jaccard

    a = spark.createDataFrame([(f"s{i}",) for i in range(0, 2000)], ["k"])
    b = spark.createDataFrame([(f"s{i}",) for i in range(1000, 3000)], ["k"])
    est = bottomk_jaccard(
        bottomk_build(a, "k", k=64), bottomk_build(b, "k", k=64), k=64
    ).first()["jaccard_bp"]
    assert 1500 < est < 5500, est  # true 3333 bp, k=64 sampling noise


def test_bottomk_merge_empty_list_raises(spark):
    """Review catch: an empty sketches list raises the explicit ValueError
    (like cms_merge), not IndexError."""
    import pytest

    from engine.extended.sketch import bottomk_merge

    with pytest.raises(ValueError, match="at least one"):
        bottomk_merge([])


def test_cms_inner_product_bounds_and_exactness(spark):
    """The sketch inner product upper-bounds the exact pair count always
    (collisions only add), and equals it when width dwarfs the key space;
    cross-sketch products estimate A-join-B size the same way."""
    from engine.extended.sketch import cms_build, cms_inner_product

    rows = [(f"k{i % 50}",) for i in range(4000)]
    df = spark.createDataFrame(rows, ["k"])
    exact_self = 50 * 80 * 80
    for width in (64, 4096):
        sk = cms_build(df, "k", depth=3, width=width)
        est = cms_inner_product(sk, sk).first()["est_pairs"]
        assert est >= exact_self, (width, est)
        if width == 4096:
            assert est == exact_self  # 50 keys, 4096 cells: no collision
    # cross product: disjoint key sets -> near zero (exact 0 sans collision)
    other = spark.createDataFrame([(f"x{i}",) for i in range(500)], ["k"])
    ska = cms_build(df, "k", depth=3, width=4096)
    skb = cms_build(other, "k", depth=3, width=4096)
    cross = cms_inner_product(ska, skb).first()["est_pairs"]
    exact_cross = 0
    assert cross is not None and cross >= exact_cross and cross < 4000 * 2


def test_cms_inner_product_disjoint_rows_count_as_zero(spark):
    """A sketch row sharing no cell with the other sketch contributes 0 to
    the MIN (review-of-own-code catch: the inner join dropped it, biasing
    the estimate up or to NULL on fully-disjoint sketches)."""
    from engine.extended.sketch import cms_inner_product

    a = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 7), (2, 3, 9)], "row int, col int, cnt long"
    )
    b = spark.createDataFrame(
        [(0, 1, 2), (1, 9, 7), (2, 9, 9)], "row int, col int, cnt long"
    )
    # row 0 overlaps (5*2=10); rows 1,2 are disjoint -> 0 -> min = 0
    assert cms_inner_product(a, b).first()["est_pairs"] == 0
    fully = spark.createDataFrame([(0, 7, 1)], "row int, col int, cnt long")
    assert cms_inner_product(a, fully.filter("col = 99")).first()[
        "est_pairs"
    ] == 0


def test_bottomk_cardinality_exact_below_k_and_estimates_above(spark):
    """Below k the sketch HAS the whole distinct set — the exact count must
    come back, not the estimator; above k the KMV estimate lands within
    the standard ~1/sqrt(k) band of the truth."""
    from engine.extended.sketch import bottomk_build, bottomk_cardinality

    small = spark.createDataFrame([(f"k{i}",) for i in range(10)], "key string")
    got = bottomk_cardinality(
        bottomk_build(small, "key", k=64), k=64
    ).collect()[0]
    assert got["n_rows"] == 10 and got["est_distinct"] == 10

    big = spark.createDataFrame(
        [(f"user-{i % 5000}",) for i in range(8000)], "key string"
    )
    est = bottomk_cardinality(
        bottomk_build(big, "key", k=64), k=64
    ).collect()[0]["est_distinct"]
    assert abs(est - 5000) <= 5000 * 0.5  # k=64 → wide but sane band


def test_bottomk_cardinality_rejects_oversized_sketch(spark):
    """Advice r8: a sketch built at k=64 passed with k=32 would silently
    apply the wrong (k-1)·2^60/h_k scale — the n_rows > k half of the
    k-contract is verifiable in-plan and must raise, not estimate."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from engine.extended.sketch import bottomk_build, bottomk_cardinality

    big = spark.createDataFrame(
        [(f"user-{i}",) for i in range(500)], "key string"
    )
    sk = bottomk_build(big, "key", k=64)
    # raise_error surfaces as SparkRuntimeException (advice r10: the bare
    # Exception previously in this tuple would have swallowed any failure)
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
        bottomk_cardinality(sk, k=32).collect()
    assert "built with a larger k" in str(ei.value)


def test_bottomk_setops_estimate_identities(spark):
    """Set-algebra sanity on a known overlap: A = 0..999, B = 500..1499.
    Union ≈ 1500, intersection ≈ 500, A-only ≈ 500; and the disjoint /
    identical extremes pin the estimator's edges exactly (n_both = 0 and
    n_both = k_used respectively)."""
    from engine.extended.sketch import bottomk_build, bottomk_setops_estimate

    a = spark.createDataFrame([(f"id{i}",) for i in range(1000)], "key string")
    b = spark.createDataFrame(
        [(f"id{i}",) for i in range(500, 1500)], "key string"
    )
    ska = bottomk_build(a, "key", k=64)
    skb = bottomk_build(b, "key", k=64)
    r = bottomk_setops_estimate(ska, skb, k=64).collect()[0]
    assert abs(r["est_union"] - 1500) <= 1500 * 0.5
    assert 0 < r["n_both"] < 64
    assert r["est_intersection"] <= r["est_union"]
    assert r["est_only_a"] + r["est_intersection"] <= r["est_union"] * 2

    disj = bottomk_setops_estimate(
        bottomk_build(a, "key", k=64),
        bottomk_build(
            spark.createDataFrame([(f"zz{i}",) for i in range(1000)], "key string"),
            "key", k=64,
        ),
        k=64,
    ).collect()[0]
    assert disj["n_both"] == 0 and disj["est_intersection"] == 0
    same = bottomk_setops_estimate(ska, ska, k=64).collect()[0]
    assert same["n_both"] == 64
    assert same["est_intersection"] == same["est_union"]
    assert same["est_only_a"] == max(same["est_a"] - same["est_union"], 0)


def test_native_sketch_parity_known_cardinalities(spark):
    """VERDICT r8 #3: the native-sketch behavior that `approx_sketches`
    rows-only-checked now pins here against KNOWN cardinalities (the
    driver slot moved to the md5-register `hll_native_cells`, which is
    value-hash-checked against DuckDB).

    Spark's Datasketches HLL (lgK=12) is EXACT in sparse mode at these
    cardinalities; approx_count_distinct (HLL++, rsd=5% default) must
    land within its advertised error; percentile_approx at full accuracy
    returns an exact member of the input (KLL-class contract)."""
    n_keys = 3000
    rows = [(i % n_keys, float(i % 1000)) for i in range(3 * n_keys)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = df.agg(
        F.approx_count_distinct("k").alias("acd"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg("k", F.lit(12))
        ).alias("hll"),
        F.percentile_approx("v", 0.5, 2147483647).alias("med"),
        F.expr("approx_count_distinct(k, 0.01)").alias("acd_tight"),
    ).collect()[0]
    assert abs(got["acd"] - n_keys) <= 0.05 * n_keys * 3  # 3σ at rsd=5%
    assert abs(got["acd_tight"] - n_keys) <= 0.01 * n_keys * 3
    # Datasketches HLL lgK=12 holds ~2.5k exact sparse entries; at 3k it
    # may have promoted to dense — allow its 1.6% rsd at 3σ
    assert abs(got["hll"] - n_keys) <= 0.016 * n_keys * 3
    # exact-accuracy approx median of 0..999 (each value ×9): the true
    # median interval is [499, 500]; the estimate must be a member value
    assert got["med"] in (499.0, 500.0)
    # per-group form (the old approx_sketches shape): grouped estimates
    # carry the same contracts independently per group
    g = (
        df.withColumn("grp", F.col("k") % 3)
        .groupBy("grp")
        .agg(
            F.approx_count_distinct("k").alias("acd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    per_grp = n_keys / 3
    for r in g:
        assert r["n"] == 3 * per_grp
        assert abs(r["acd"] - per_grp) <= 0.05 * per_grp * 3
