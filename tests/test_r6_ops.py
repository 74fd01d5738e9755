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
    # equal-frequency buckets (sizes differ by <= 1 row)
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


def test_budget_select_prefix_rule_matches_brute_force(spark):
    from engine.extended.selection import budget_select

    rows = [(i, (i * 7) % 50, 10 + (i % 5)) for i in range(100)]
    rows += [(200, None, 30), (201, 45, None)]  # NULL score / NULL cost
    df = spark.createDataFrame(rows, "doc_id long, score long, cost long")
    got = {r["doc_id"]: r["running_cost"] for r in
           budget_select(df, "score", "cost", budget=300).collect()}
    # brute force: sort by (clamped score desc, id), cumulative cost prefix
    order = sorted(rows, key=lambda x: (-(max(x[1] or 0, 0)), x[0]))
    run, want = 0, {}
    for i, _s, c in order:
        run += max(c or 0, 0)
        if run > 300:
            break
        want[i] = run
    assert got == want
    assert sum(1 for _ in want) > 0


def test_budget_select_zero_cost_rows_ride_free(spark):
    from engine.extended.selection import budget_select

    df = spark.createDataFrame(
        [(1, 10, 0), (2, 9, 5), (3, 8, 0)], "doc_id long, score long, cost long"
    )
    kept = {r["doc_id"] for r in
            budget_select(df, "score", "cost", budget=5).collect()}
    assert kept == {1, 2, 3}


def test_curriculum_interleave_prefix_mixture_balanced(spark):
    from engine.extended.selection import curriculum_interleave

    rows = [(i, "a", 1000 - i) for i in range(50)]       # a scores high
    rows += [(100 + i, "b", 100 - i) for i in range(50)]  # b scores low
    rows += [(999, None, 5)]                              # NULL group dropped
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    out = curriculum_interleave(df, "score", group_col="source",
                                id_col="doc_id").collect()
    assert len(out) == 100  # NULL-source row dropped
    pos = {r["cur_pos"]: r for r in out}
    assert len(pos) == 100  # strict total order, no collisions
    # every 2-slot prefix pair holds one 'a' and one 'b' (rank-r dealt
    # adjacently), so ANY prefix is mixture-balanced within one row
    first20 = [pos[p]["source"] for p in sorted(pos)[:20]]
    assert first20.count("a") == 10 and first20.count("b") == 10
    # within a group, positions increase as score decreases
    a_rows = sorted((r["cur_pos"], r["score"]) for r in out if r["source"] == "a")
    assert all(s1 >= s2 for (_, s1), (_, s2) in zip(a_rows, a_rows[1:]))


def test_label_propagation_separates_two_cliques(spark):
    from engine.extended.graph import label_propagation

    # two 4-cliques bridged by a single edge
    c1, c2 = [1, 2, 3, 4], [10, 11, 12, 13]
    edges = [(a, b) for i, a in enumerate(c1) for b in c1[i + 1:]]
    edges += [(a, b) for i, a in enumerate(c2) for b in c2[i + 1:]]
    edges += [(4, 10)]  # bridge
    df = spark.createDataFrame(edges, "src long, dst long")
    labels = {r["node"]: r["label"] for r in
              label_propagation(df, iters=3).collect()}
    # each clique converges to its own min label; the bridge doesn't merge
    assert {labels[n] for n in c1} == {1}
    assert {labels[n] for n in c2} == {10}


def test_label_propagation_is_deterministic_under_shuffle(spark):
    from engine.extended.graph import label_propagation

    edges = [(i, (i * 3) % 17) for i in range(40) if i != (i * 3) % 17]
    df1 = spark.createDataFrame(edges, "src long, dst long")
    df2 = spark.createDataFrame(list(reversed(edges)), "src long, dst long").repartition(7)
    l1 = sorted(map(tuple, label_propagation(df1, iters=3).collect()))
    l2 = sorted(map(tuple, label_propagation(df2, iters=3).collect()))
    assert l1 == l2


def test_mad_outliers_resists_masking_where_zscore_fails(spark):
    from engine.extended.timeseries import mad_outliers

    # 20 values at ~10.0 plus TWO extreme points: they inflate the std
    # (z of each extreme ~ 3.1... masked near threshold) but leave the
    # median/MAD untouched, so MAD flags exactly the two extremes.
    vals = [10.0 + 0.1 * (i % 5) for i in range(20)] + [100.0, -80.0]
    df = spark.createDataFrame([("u", v) for v in vals], "user_id string, value double")
    row = mad_outliers(df, ["user_id"], "value", k=3).collect()[0]
    assert row["n_events"] == 22
    assert row["n_outliers"] == 2
    assert row["med_milli"] == 10200  # median of the bulk
    # MAD of the bulk is ~100-200 milli, never inflated by the extremes
    assert row["mad_milli"] <= 200


def test_mad_outliers_zero_mad_flags_any_deviation(spark):
    from engine.extended.timeseries import mad_outliers

    df = spark.createDataFrame(
        [("u", 5.0)] * 10 + [("u", 5.001)], "user_id string, value double"
    )
    row = mad_outliers(df, ["user_id"], "value", k=3).collect()[0]
    assert row["mad_milli"] == 0
    assert row["n_outliers"] == 1  # the lone deviating row


def test_profile_drift_flags_null_flood_and_unit_change(spark):
    from engine.ops.profile import profile_drift

    old = spark.createDataFrame(
        [(float(i % 7), 10.0) for i in range(100)], "a double, b double"
    )
    # a: 30% NULL flood; b: silent unit change (x1000)
    new_rows = [(float(i % 7), 10000.0) for i in range(70)] + [
        (None, 10000.0)
    ] * 30
    new = spark.createDataFrame(new_rows, "a double, b double")
    got = {r["col_name"]: r for r in
           profile_drift(old, new, ["a", "b"]).collect()}
    assert got["a"]["drift_flag"] == 1      # null_bp 0 -> 3000
    assert got["a"]["new_null_bp"] == 3000
    assert got["b"]["drift_flag"] == 1      # mean 10 -> 10000
    assert got["b"]["old_mean_milli"] == 10000
    assert got["b"]["new_mean_milli"] == 10000000
    # steady columns don't flare
    same = profile_drift(old, old, ["a", "b"]).collect()
    assert all(r["drift_flag"] == 0 for r in same)


def test_snapshot_diff_classifies_and_carries_right_values(spark):
    from engine.ops.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, None, 40)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),        # unchanged
         (2, "B", 20),        # update (value change)
         (3, "c", 30),        # update (NULL -> value)
         (5, "e", 50)],       # insert; key 4 deleted
        "k int, s string, v int",
    )
    got = {r["k"]: (r["op"], r["s"], r["v"]) for r in
           snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        2: ("update", "B", 20),
        3: ("update", "c", 30),   # today's values on update
        4: ("delete", None, 40),  # yesterday's values on delete
        5: ("insert", "e", 50),
    }
    # include_unchanged surfaces key 1
    all_rows = {r["k"]: r["op"] for r in
                snapshot_diff(old, new, ["k"], include_unchanged=True).collect()}
    assert all_rows[1] == "unchanged" and len(all_rows) == 5


def test_snapshot_diff_resists_separator_injection(spark):
    """Length-prefixed field encoding: values containing the old
    tag/separator bytes must not shift column boundaries (review catch —
    a tagged concat collapsed these two different rows)."""
    from engine.ops.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a\x1f\x01b", "c"), (2, "x1:", "y")], "k int, a string, b string"
    )
    new = spark.createDataFrame(
        [(1, "a", "b\x1f\x01c"), (2, "x", "1:y")], "k int, a string, b string"
    )
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "update", 2: "update"}


def test_snapshot_diff_null_vs_null_string_distinct(spark):
    """The null-tagged digest must distinguish NULL from the string
    'NULL' (and from empty) — a plain concat_ws would collapse them."""
    from engine.ops.scd import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "NULL")], "k int, s string")
    new = spark.createDataFrame([(1, "NULL"), (2, None)], "k int, s string")
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "update", 2: "update"}
