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
