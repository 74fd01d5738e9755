"""Round-6 operator properties: survivor-quality dedup, size-balanced
sharding, length-bucketed batching, mergeable exact moments.

Each is pinned against a brute-force single-window reference on small
frames (the scale-safe rank machinery must agree with the naive total
order exactly) plus its operator-specific invariants.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from engine.extended.sampling import balanced_shards, length_bucket_batches
from engine.ops.dedup import keep_best


def test_keep_best_picks_highest_score_null_never_wins(spark):
    df = spark.createDataFrame(
        [
            ("k1", 1, 10), ("k1", 2, 30), ("k1", 3, None),
            ("k2", 4, None), ("k2", 5, None),
            ("k3", 6, 7),
        ],
        "key string, id int, score int",
    )
    kept = {r["id"]: r["n_dups"] for r in
            keep_best(df, ["key"], "score", ["id"], size_col="n_dups").collect()}
    # k1: real score 30 wins over NULL; k2: all-NULL -> lowest id; k3: alone
    assert kept == {2: 3, 4: 2, 6: 1}


def test_keep_best_tie_breaks_deterministically(spark):
    df = spark.createDataFrame(
        [("k", 9, 5), ("k", 3, 5), ("k", 7, 5)], "key string, id int, score int"
    )
    kept = keep_best(df, ["key"], "score", ["id"]).collect()
    assert len(kept) == 1 and kept[0]["id"] == 3  # equal scores -> min id


def _brute_rank_desc(spark, rows):
    df = spark.createDataFrame(rows, "id long, sz long")
    w = Window.orderBy(F.col("sz").desc(), F.col("id"))
    return {r["id"]: r["rk"] - 1 for r in
            df.withColumn("rk", F.row_number().over(w)).collect()}


def test_balanced_shards_matches_brute_force_serpentine(spark):
    rows = [(i, (i * 37) % 101) for i in range(200)] + [(900, None), (901, -5)]
    df = spark.createDataFrame(rows, "id long, sz long")
    got = {r["id"]: r["shard"] for r in
           balanced_shards(df, "sz", n_shards=4, id_col="id").collect()}
    clamped = [(i, max(s or 0, 0)) for i, s in rows]
    rank = _brute_rank_desc(spark, clamped)
    for i, _ in rows:
        pos = rank[i] % 8
        want = pos if pos < 4 else 7 - pos
        assert got[i] == want, (i, got[i], want)


def test_balanced_shards_sum_spread_beats_hash_sharding(spark):
    """The whole point: with size-skewed rows the serpentine shard sums are
    near-equal (spread bounded by one fold pair), while hash sharding's
    spread tracks the fat tail."""
    from engine.extended.sampling import shard_assign

    rows = [(i, 2 ** (i % 14)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, sz long")
    sums = [
        r["s"] for r in balanced_shards(df, "sz", n_shards=4)
        .groupBy("shard").agg(F.sum("sz").alias("s")).collect()
    ]
    assert len(sums) == 4
    assert max(sums) - min(sums) <= 2 ** 13  # <= one largest row
    hash_sums = [
        r["s"] for r in shard_assign(df, n_shards=4, position=False)
        .groupBy("shard").agg(F.sum("sz").alias("s")).collect()
    ]
    assert max(sums) - min(sums) < max(hash_sums) - min(hash_sums)


def test_length_bucket_batches_invariants(spark):
    rows = [(i, (i * 13) % 500) for i in range(260)]
    df = spark.createDataFrame(rows, "doc_id long, sz long")
    out = length_bucket_batches(
        df, "sz", n_buckets=4, batch_size=16, id_col="doc_id"
    ).collect()
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    # equal-frequency buckets (差 <= 1 row)
    counts = sorted(len(v) for v in by_bucket.values())
    assert counts[-1] - counts[0] <= 1 and len(by_bucket) == 4
    # buckets are contiguous size ranges: max(sz) of bucket b <= min of b+1
    edges = {
        b: (min(x["sz"] for x in v), max(x["sz"] for x in v))
        for b, v in by_bucket.items()
    }
    for b in range(3):
        assert edges[b][1] <= edges[b + 1][0]
    # batches are full except possibly the bucket's last
    for b, v in by_bucket.items():
        sizes: dict = {}
        for x in v:
            sizes[x["batch"]] = sizes.get(x["batch"], 0) + 1
        n_batches = len(sizes)
        for idx, cnt in sizes.items():
            assert 0 <= idx < n_batches
            if idx < n_batches - 1:
                assert cnt == 16
            else:
                assert 1 <= cnt <= 16


def test_moments_merge_matches_whole_and_skips_nulls(spark):
    from engine.extended.sketch import moments_build, moments_merge, moments_stats

    df = spark.createDataFrame(
        [(0, 2), (0, 4), (1, 6), (1, None), (0, 0)], "g int, v int"
    )
    parts = moments_build(df, "v", by=["g"])
    merged = moments_merge(parts)
    row = merged.collect()[0]
    assert (row["n"], row["sum_v"], row["sumsq_v"]) == (4, 12, 56)
    whole = moments_build(df, "v").collect()[0]
    assert (whole["n"], whole["sum_v"], whole["sumsq_v"]) == (4, 12, 56)
    stats = moments_stats(merged).collect()[0]
    assert stats["mean_milli"] == 3000  # mean 3.0
    # population variance of (2,4,6,0): mean 3, var (1+1+9+9)/4 = 5.0
    assert stats["var_milli"] == 5000
