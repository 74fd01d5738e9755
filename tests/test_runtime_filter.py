"""Bloom runtime-filter, bucketed-write recovery, and HLL merge gates.

Semantics: bloom_prefilter never drops a matching fact row (no false
negatives), drops NULL keys like the equi-join would, and composes with the
join to the exact plain-join result; write_bucketed recovers from an
orphaned warehouse location (catalog lost, directory left behind); the HLL
shard-merge estimate equals the whole-corpus estimate.

Plan shape (the 100 TB claim): the prefiltered fact side is a bare
Filter-over-scan — no Join, no Exchange — so the reduction happens before
any shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from engine.ops.runtime_filter import bloom_prefilter


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_prefilter_no_false_negatives_exact_join(spark):
    fact = spark.createDataFrame(
        [(i % 37, i) for i in range(500)] + [(None, 999)], "k int, v int"
    )
    build = spark.createDataFrame([(3,), (11,), (36,), (None,)], "bk int")
    pre = bloom_prefilter(fact, build, "k", "bk")
    got = pre.join(build.where(F.col("bk").isNotNull()), pre.k == F.col("bk"))
    plain = fact.join(build.where(F.col("bk").isNotNull()), fact.k == F.col("bk"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    # every matching key survived the prefilter
    kept = {r["k"] for r in pre.select("k").distinct().collect()}
    assert {3, 11, 36} <= kept
    assert None not in kept  # NULL keys drop, matching inner-join semantics


def test_bloom_prefilter_tiny_filter_overselects_never_underselects(spark):
    # m_bits=64 forces false positives; correctness must not depend on them
    fact = spark.createDataFrame([(i, i) for i in range(200)], "k int, v int")
    build = spark.createDataFrame([(7,), (8,)], "bk int")
    pre = bloom_prefilter(fact, build, "k", "bk", n_hashes=2, m_bits=64)
    kept = {r["k"] for r in pre.collect()}
    assert {7, 8} <= kept  # no false negatives, ever


def test_bloom_prefilter_autosizes_to_key_count(spark):
    """Default sizing must track the distinct build-key count (~1% FP at
    10 bits/key) — a fixed filter saturates at 10x the keys (x10-probe
    regression: FP -> 1 degenerated the prefilter to a full pass-through)."""
    fact = spark.createDataFrame([(i, i) for i in range(5000)], "k int, v int")
    build = spark.createDataFrame([(i,) for i in range(2000)], "bk int")
    pre = bloom_prefilter(fact, build, "k", "bk")
    kept = pre.count()
    assert kept >= 2000  # no false negatives
    assert kept <= 2000 + 0.05 * 3000  # FP rate stayed low at 2000 keys


def test_bloom_prefilter_degrades_when_over_budget(spark):
    """Needed bits beyond max_bits -> skip the filter (NULL drop only):
    semantics unchanged, no saturated-bloom work."""
    fact = spark.createDataFrame(
        [(1, 1), (2, 2), (None, 3)], "k int, v int"
    )
    build = spark.createDataFrame([(i,) for i in range(100)], "bk int")
    pre = bloom_prefilter(fact, build, "k", "bk", max_bits=64)
    assert sorted(r["k"] for r in pre.collect()) == [1, 2]
    p = plan(pre)
    assert "md5" not in p.lower()  # degraded path must not hash per row


def test_bloom_prefilter_plan_is_scan_side_only(spark):
    fact = spark.createDataFrame([(i, i) for i in range(100)], "k int, v int")
    build = spark.createDataFrame([(1,), (2,)], "bk int")
    p = plan(bloom_prefilter(fact, build, "k", "bk"))
    assert "Join" not in p and "Exchange" not in p  # pure filter, pre-shuffle


def test_write_bucketed_recovers_orphaned_location(spark):
    """A leftover spark-warehouse/<table> dir without a catalog entry must
    not break the next overwrite (LOCATION_ALREADY_EXISTS regression: the
    local derby catalog is per-session, the warehouse dir is not)."""
    from urllib.parse import urlparse

    from engine.ops.io import read_table, write_bucketed

    spark.sql("DROP TABLE IF EXISTS t_orphan")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    os.makedirs(os.path.join(wh, "t_orphan"), exist_ok=True)
    with open(os.path.join(wh, "t_orphan", "stale.parquet"), "w") as f:
        f.write("junk")
    df = spark.range(100).select((F.col("id") % 7).alias("k"), "id")
    try:
        write_bucketed(df, "t_orphan", "k", 4)
        assert read_table(spark, "t_orphan").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orphan")


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


def test_write_bucketed_recovers_orphan_with_default_db_prefix(spark):
    """'default.t' must resolve to <warehouse>/t (not <warehouse>/default.t)
    when clearing an orphaned location."""
    from urllib.parse import urlparse

    from engine.ops.io import read_table, write_bucketed

    spark.sql("DROP TABLE IF EXISTS t_orphan2")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    os.makedirs(os.path.join(wh, "t_orphan2"), exist_ok=True)
    with open(os.path.join(wh, "t_orphan2", "stale"), "w") as f:
        f.write("junk")
    df = spark.range(50).select((F.col("id") % 3).alias("k"), "id")
    try:
        write_bucketed(df, "default.t_orphan2", "k", 4)
        assert read_table(spark, "default.t_orphan2").count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS default.t_orphan2")


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
