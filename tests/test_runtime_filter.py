"""Bloom runtime-filter, bucketed-write recovery, and HLL merge gates.

Semantics: bloom_prefilter never drops a matching fact row (no false
negatives), drops NULL keys like the equi-join would, and composes with the
join to the exact plain-join result; write_bucketed recovers from an
orphaned warehouse location (catalog lost, directory left behind); the HLL
shard-merge estimate equals the whole-corpus estimate.

Plan shape (the 100 TB claim): the prefiltered fact side is a bare
Filter-over-scan — no Join, no Exchange — so the reduction happens before
any shuffle.  (HLL sketch tests live in test_sketch_skew.py.)
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


def test_bloom_prefilter_keep_nulls_retains_null_key_rows(spark):
    """keep_nulls=True keeps NULL-key fact rows on BOTH the filtered and the
    degraded over-budget path (advice-review item: callers that route NULL
    keys separately must be able to opt out of the inner-join-style drop)."""
    fact = spark.createDataFrame([(7, 1), (9, 2), (None, 3)], "k int, v int")
    build = spark.createDataFrame([(7,), (8,)], "bk int")
    kept = {r["v"] for r in
            bloom_prefilter(fact, build, "k", "bk", keep_nulls=True).collect()}
    assert 1 in kept and 3 in kept and 2 not in kept
    big_build = spark.createDataFrame([(i,) for i in range(100)], "bk int")
    degraded = {r["v"] for r in
                bloom_prefilter(fact, big_build, "k", "bk",
                                max_bits=64, keep_nulls=True).collect()}
    assert degraded == {1, 2, 3}  # over budget: pass-through, NULLs intact


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


def test_write_bucketed_other_db_never_touches_default_tables(spark):
    """Unqualified names resolve against the session's CURRENT database —
    writing 't' while USEing another db must not rmtree <warehouse>/t, the
    data files of an unrelated healthy default-db table (advice-review
    catch: the old default-db assumption silently destroyed that table's
    files while its catalog entry survived)."""
    from engine.ops.io import read_table, write_bucketed

    df = spark.range(60).select((F.col("id") % 5).alias("k"), "id")
    spark.sql("DROP TABLE IF EXISTS default.t_victim")
    spark.sql("CREATE DATABASE IF NOT EXISTS altdb_wb")
    try:
        write_bucketed(df, "default.t_victim", "k", 4)
        spark.catalog.setCurrentDatabase("altdb_wb")
        write_bucketed(df, "t_victim", "k", 4)  # lands in altdb_wb
        spark.catalog.setCurrentDatabase("default")
        # the healthy default-db table still reads — files intact
        assert read_table(spark, "default.t_victim").count() == 60
        assert read_table(spark, "altdb_wb.t_victim").count() == 60
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP TABLE IF EXISTS default.t_victim")
        spark.sql("DROP TABLE IF EXISTS altdb_wb.t_victim")
        spark.sql("DROP DATABASE IF EXISTS altdb_wb")


def test_write_bucketed_cached_skips_second_write(spark, tmp_path):
    """Session layout cache (VERDICT r5 #6): the second call with the same
    data fingerprint skips the write; a changed fingerprint re-writes."""
    import engine.ops.io as io_mod
    from engine.ops.io import path_fingerprint, read_table, write_bucketed_cached

    src = tmp_path / "fp_src.txt"
    src.write_text("v1")
    fp1 = path_fingerprint(str(src))
    df = spark.range(40).select((F.col("id") % 4).alias("k"), "id")
    spark.sql("DROP TABLE IF EXISTS t_cached")
    io_mod._BUCKETED_FP.pop("t_cached", None)
    try:
        assert write_bucketed_cached(df, "t_cached", "k", 4, fingerprint=fp1)
        assert not write_bucketed_cached(df, "t_cached", "k", 4, fingerprint=fp1)
        assert read_table(spark, "t_cached").count() == 40
        # data changed -> new fingerprint -> the layout is re-paid
        os.utime(src, ns=(1, 1))
        fp2 = path_fingerprint(str(src))
        assert fp2 != fp1
        assert write_bucketed_cached(df, "t_cached", "k", 4, fingerprint=fp2)
        # dropped table (catalog miss) -> re-written even with a cached fp
        spark.sql("DROP TABLE t_cached")
        assert write_bucketed_cached(df, "t_cached", "k", 4, fingerprint=fp2)
        # empty fingerprint = no data-version identity -> cache bypassed
        # every time (review catch: ""=="" served the first write forever)
        assert write_bucketed_cached(df, "t_cached", "k", 4)
        assert write_bucketed_cached(df, "t_cached", "k", 4)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cached")
        io_mod._BUCKETED_FP.pop("t_cached", None)


def test_path_fingerprint_raises_on_missing_path(tmp_path):
    """ADVICE r6 (low): a nonexistent path must raise, not hash an empty
    walk — the constant empty-walk digest fed to write_bucketed_cached is
    a permanent stale cache hit."""
    import pytest

    from engine.ops.io import path_fingerprint

    with pytest.raises(FileNotFoundError, match="neither a file"):
        path_fingerprint(str(tmp_path / "no_such_dir"))
    # existing dir and file still fingerprint fine
    f = tmp_path / "ok.txt"
    f.write_text("x")
    assert path_fingerprint(str(tmp_path))
    assert path_fingerprint(str(f))
