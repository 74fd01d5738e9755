"""Storage-layout gates: partition pruning and co-located bucketed joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.ops.io import read_table, write_bucketed, write_partitioned


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning(spark, tmp_path):
    df = spark.range(1000).withColumn("part", F.col("id") % 10).withColumn(
        "v", F.col("id") * 2
    )
    path = str(tmp_path / "pt")
    write_partitioned(df, path, ["part"])
    scan = spark.read.parquet(path).filter(F.col("part") == 3)
    assert scan.count() == 100
    # the filter must appear as a partition filter (pruned at planning),
    # not as a data filter evaluated per row
    p = plan(scan)
    pf = p.split("PartitionFilters:")[1].split("]")[0]
    assert "part" in pf and "= 3" in pf


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(1000).withColumn("k", F.col("id") % 50).withColumn(
        "lv", F.col("id") + 1
    )
    right = spark.range(500).withColumn("k", F.col("id") % 50).withColumn(
        "rv", F.col("id") + 2
    )
    write_bucketed(left.select("k", "lv"), "t_bl", "k", 8, sort_col="k")
    write_bucketed(right.select("k", "rv"), "t_br", "k", 8, sort_col="k")
    bl, br = read_table(spark, "t_bl"), read_table(spark, "t_br")
    # joining on the bucket key must not shuffle either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bl.join(br, "k")
        p = plan(j)
        assert "Exchange hashpartitioning" not in p
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_bl")
        spark.sql("DROP TABLE IF EXISTS t_br")


def test_dynamic_partition_pruning(spark, tmp_path):
    """A selective dim filter must prune fact partitions at runtime (DPP) —
    the join-driven twin of static partition pruning."""
    fact = spark.range(2000).select(
        (F.col("id") % 20).alias("dim_id"), (F.col("id") * 3).alias("v")
    )
    path = str(tmp_path / "fact")
    write_partitioned(fact, path, ["dim_id"])
    dim = spark.range(20).select(
        F.col("id").alias("dim_id"),
        F.when(F.col("id") == 5, "pick").otherwise("skip").alias("tag"),
    )
    f = spark.read.parquet(path)
    j = f.join(dim.filter(F.col("tag") == "pick"), "dim_id")
    p = plan(j)
    assert "dynamicpruning" in p.lower()
    assert j.count() == 100


def test_zorder_clustering_bounds_both_column_spans(spark, tmp_path):
    """Z-order layout: every file gets a bounded min/max span on BOTH
    clustered columns (multi-column data skipping); a single-column sort
    leaves the second column's per-file span at full width."""
    from pyspark.sql import functions as F

    from engine.ops.io import cluster_by_zorder

    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )

    def avg_spans(df_sorted, path):
        df_sorted.write.mode("overwrite").parquet(path)
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"))
            .collect()[0]
        )
        return per_file["ax"], per_file["ay"]

    zx, zy = avg_spans(
        cluster_by_zorder(grid, ["x", "y"], bits=6, n_files=16),
        str(tmp_path / "zorder"),
    )
    sx, sy = avg_spans(
        grid.repartitionByRange(16, "x").sortWithinPartitions("x"),
        str(tmp_path / "xsort"),
    )
    # z-order: both dimensions bounded well below full width (63)
    assert zx < 32 and zy < 32, (zx, zy)
    # x-sort: x is tight but y spans (nearly) the full range — no skipping
    assert sx < 8 and sy > 48, (sx, sy)


def test_shard_assign_write_layout_is_epoch_stable(spark, tmp_path):
    """The promised training-shard layout: partitionBy(shard) with rows
    sorted by shard_pos inside each partition — every epoch reader sees the
    same order, with no global sort in the plan."""
    from engine.extended.sampling import shard_assign

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    sharded = shard_assign(docs, n_shards=4)
    path = str(tmp_path / "shards")
    (
        sharded.repartition(4, "shard")
        .sortWithinPartitions("shard_pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    # partition pruning works on the shard dir layout
    one = back.filter(F.col("shard") == 2)
    pf = plan(one).split("PartitionFilters:")[1].split("]")[0]
    assert "shard" in pf and "= 2" in pf
    # within each shard FILE the rows are already in shard_pos order
    import glob

    import pyarrow.parquet as pq

    for shard_dir in glob.glob(f"{path}/shard=*"):
        for f in glob.glob(f"{shard_dir}/*.parquet"):
            col = pq.read_table(f, columns=["shard_pos"])["shard_pos"].to_pylist()
            assert col == sorted(col)
    # a second run over a reshuffled input produces the identical layout
    again = shard_assign(docs.repartition(13), n_shards=4)
    a = {(r["doc_id"], r["shard"], r["shard_pos"]) for r in sharded.collect()}
    b = {(r["doc_id"], r["shard"], r["shard_pos"]) for r in again.collect()}
    assert a == b


def test_compact_small_files_restores_file_size(spark, tmp_path):
    from engine.ops.io import compact_small_files

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    # 40 tiny appended files (the streaming-append pathology)
    for i in range(40):
        spark.range(i * 10, i * 10 + 10).write.mode("append").parquet(src)
    stats = compact_small_files(
        spark, src, dst, target_file_bytes=10 * 1024 * 1024
    )
    assert stats["files_before"] >= 40
    assert stats["files_after"] == 1  # tiny total → one target file
    got = spark.read.parquet(dst)
    assert got.count() == 400
    assert {r["id"] for r in got.collect()} == set(range(400))


def test_compact_small_files_with_sort_and_validation(spark, tmp_path):
    import pytest

    from engine.ops.io import compact_small_files

    src = str(tmp_path / "f2")
    for i in range(4):
        spark.range(100).selectExpr(
            f"id + {i * 100} as id", "id % 7 as k"
        ).write.mode("append").parquet(src)
    dst = str(tmp_path / "c2")
    compact_small_files(
        spark, src, dst, target_file_bytes=1 << 30, sort_cols=["k", "id"]
    )
    import glob

    part = sorted(glob.glob(dst + "/part-*.parquet"))
    assert len(part) == 1
    rows = spark.read.parquet(part[0]).collect()  # single-file read order
    keys = [(r["k"], r["id"]) for r in rows]
    assert keys == sorted(keys)  # clustering restored within the file
    with pytest.raises(ValueError, match="target_file_bytes"):
        compact_small_files(spark, src, dst, target_file_bytes=0)


def test_compact_small_files_reads_nested_layouts(spark, tmp_path):
    """Review finding: the listing is recursive, so the read must be too —
    per-batch subdirectories (the exact pathology compaction exists for)
    must compact, not crash or silently vanish."""
    from engine.ops.io import compact_small_files

    src = str(tmp_path / "nested")
    for i in range(3):
        spark.range(i * 10, i * 10 + 10).write.parquet(f"{src}/batch={i}/files")
    dst = str(tmp_path / "out")
    stats = compact_small_files(spark, src, dst, target_file_bytes=1 << 30)
    got = spark.read.parquet(dst)
    assert got.count() == 30
    assert stats["files_after"] == 1


def test_bucketed_snapshot_merge_exchange_free_on_snapshot_side(spark):
    """The matview refresh's storage story, plan-gated (r8): a snapshot
    stored bucketed on the group key merges the next batch's partials
    with NO exchange on the snapshot side — only the batch partials
    re-bucket (one hash exchange total).  Requires plain-equality keys
    (null_safe_keys=False, the non-nullable-key fast path): the default
    eqNullSafe wrapper hides the key from Catalyst's partitioning reuse.
    Values must equal the full recompute exactly."""
    from pyspark.sql import functions as F

    from engine.ops.matview import agg_partials, merge_agg_snapshot

    df1 = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("k"), (F.col("id") * 3).alias("v")
    )
    df2 = spark.range(500, 1500).select(
        (F.col("id") % 97).alias("k"), (F.col("id") * 7).alias("v")
    )
    snap = agg_partials(df1, ["k"], sums={"s": "v"})
    # bucket count matches the session's shuffle partitions: partitioning
    # reuse requires the join's chosen numPartitions to equal the bucket
    # count (a mismatch re-shuffles BOTH sides)
    write_bucketed(snap, "t_snap_merge_gate", "k", 4, sort_col="k")
    try:
        snap_b = read_table(spark, "t_snap_merge_gate")
        bp = agg_partials(df2, ["k"], sums={"s": "v"})

        merged = merge_agg_snapshot(
            snap_b, bp, ["k"], sum_cols=("s",), op_col=None,
            null_safe_keys=False,
        )
        assert plan(merged).count("Exchange hashpartitioning") <= 1

        got = {r["k"]: (r["n"], r["s"]) for r in merged.collect()}
        want = {
            r["k"]: (r["n"], r["s"])
            for r in agg_partials(
                df1.unionAll(df2), ["k"], sums={"s": "v"}
            ).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_snap_merge_gate")

    # and the default null-safe path still merges NULL keys correctly
    n1 = spark.createDataFrame([(None, 5)], "k long, v long")
    n2 = spark.createDataFrame([(None, 7)], "k long, v long")
    m = merge_agg_snapshot(
        agg_partials(n1, ["k"], sums={"s": "v"}),
        agg_partials(n2, ["k"], sums={"s": "v"}),
        ["k"],
        sum_cols=("s",),
        op_col=None,
    ).collect()
    assert len(m) == 1 and m[0]["s"] == 12
