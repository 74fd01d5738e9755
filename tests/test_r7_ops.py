"""Round-7 operator unit tests: temporal point-in-time join, l-diversity,
phrase search, covariance/whitening, last-click attribution edges."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

TS = dt.datetime


def test_scd2_point_in_time_version_boundary_and_nulls(spark):
    """A fact AT a version boundary lands in the NEWER version (half-open
    [from, to)); facts before all versions, with NULL ts, or with unknown
    keys keep NULL attributes under the left join."""
    from engine.ops.scd import scd2_point_in_time

    dim = spark.createDataFrame(
        [
            ("k1", "OLD", TS(2020, 1, 1), TS(2021, 1, 1)),
            ("k1", "NEW", TS(2021, 1, 1), None),
        ],
        "k string, seg string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [
            (1, "k1", TS(2020, 6, 1)),   # inside OLD
            (2, "k1", TS(2021, 1, 1)),   # boundary -> NEW
            (3, "k1", TS(2019, 1, 1)),   # before all versions
            (4, "k1", None),             # NULL ts
            (5, "kX", TS(2021, 6, 1)),   # unknown key
        ],
        "fid long, k string, ts timestamp",
    )
    out = {
        r["fid"]: r["seg"]
        for r in scd2_point_in_time(facts, dim, "k", "ts").collect()
    }
    assert out == {1: "OLD", 2: "NEW", 3: None, 4: None, 5: None}
    # every fact exactly once — the tiling admits no double match
    assert scd2_point_in_time(facts, dim, "k", "ts").count() == 5


def test_l_diversity_flags_homogeneous_class(spark):
    """A large class with one sensitive value is at risk; a small diverse
    class is not; NULL sensitive values do not count toward diversity."""
    from engine.ops.profile import l_diversity

    rows = (
        [("A", "s1")] * 10                   # big but homogeneous
        + [("B", "s1"), ("B", "s2")]         # small but diverse (l=2)
        + [("C", None), ("C", None)]         # all-NULL -> zero diversity
    )
    df = spark.createDataFrame(rows, "qid string, sens string")
    out = {
        r["qid"]: (r["class_size"], r["sensitive_diversity"], r["at_risk"])
        for r in l_diversity(df, ["qid"], "sens", l=2).collect()
    }
    assert out["A"] == (10, 1, True)
    assert out["B"] == (2, 2, False)
    assert out["C"] == (2, 0, True)


def test_phrase_match_counts_overlaps_and_order(spark):
    """Overlapping occurrences count as start positions; term order
    matters; punctuation and case normalize through the tokenizer."""
    from engine.extended.search import phrase_match_counts

    df = spark.createDataFrame(
        [
            (1, "a a a"),                 # 'a a' twice (overlapping)
            (2, "Fast, TABLE! fast table"),  # normalization, 2 matches
            (3, "table fast"),            # wrong order: 0
            (4, None),                    # NULL text dropped
            (5, "fast"),                  # incomplete phrase
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match_counts(df, "a a").collect()
    }
    assert got == {1: 2}
    got2 = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match_counts(df, "fast table").collect()
    }
    assert got2 == {2: 2}


def test_pca_whiten_decorrelates(spark):
    """Whitening the block with the corpus covariance must bring the
    whitened block's covariance to ~identity (correlated synthetic
    input), with excluded rows getting NULL output."""
    import random

    import numpy as np

    from engine.extended.similarity import (
        embedding_covariance_block,
        pca_whiten,
    )

    rng = random.Random(3)
    rows = []
    for i in range(4000):
        z0, z1 = rng.gauss(0, 1), rng.gauss(0, 0.3)
        # strongly correlated pair + one independent dim
        rows.append((i, [z0, 0.9 * z0 + z1, rng.gauss(0, 0.5)]))
    rows.append((9999, None))
    rows.append((9998, [1.0]))  # too short
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    dims = [0, 1, 2]
    out = pca_whiten(df, dims, out_col="w").collect()
    byid = {r["vec_id"]: r["w"] for r in out}
    assert byid[9999] is None and byid[9998] is None
    W = np.array([r["w"] for r in out if r["w"] is not None])
    C = np.cov(W.T, bias=True)
    assert np.allclose(C, np.eye(3), atol=0.08), C
    # r9: the projection is mean-subtracted — without W·(x−μ) the constant
    # W·μ term survives in every output (review catch); whitened mean ≈ 0
    assert np.allclose(W.mean(axis=0), 0.0, atol=0.05), W.mean(axis=0)
    # and the covariance op itself: off-diagonal (0,1) strongly positive
    cov = {
        (r["i"], r["j"]): r["cov_micro"]
        for r in embedding_covariance_block(df, dims).collect()
    }
    assert cov[(0, 1)] > 500_000  # ~0.9 in micro-units


def test_attribution_window_boundary_and_ties(spark):
    """A click exactly one hour before the purchase attributes (closed
    lower bound); one millisecond earlier does not; simultaneous clicks
    tie-break by the larger click id."""
    from queries.sql_surface import attribution_last_click

    # build a tiny parquet pack with just the events table
    import os

    rows = [
        (1, TS(2024, 1, 1, 12, 0, 0), 7, "purchase", 1.0, None),
        (2, TS(2024, 1, 1, 11, 0, 0), 7, "click", 1.0, None),     # exactly 1h
        (3, TS(2024, 1, 1, 10, 59, 59, 999000), 7, "click", 1.0, None),
        (10, TS(2024, 1, 2, 12, 0, 0), 7, "purchase", 1.0, None),
        (11, TS(2024, 1, 2, 11, 30, 0), 7, "click", 1.0, None),
        (12, TS(2024, 1, 2, 11, 30, 0), 7, "click", 1.0, None),   # tie: id 12
        (20, TS(2024, 1, 3, 12, 0, 0), 8, "purchase", 1.0, None), # no click
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile

    d = tempfile.mkdtemp()
    ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["p_id"]: (r["attributed_click"], r["gap_ms"])
        for r in attribution_last_click(spark, d).collect()
    }
    assert out[1] == (2, 3_600_000)     # boundary click attributes
    assert out[10] == (12, 1_800_000)   # tie -> larger click id
    assert out[20] == (None, None)      # unattributed survives the left join


def test_hilbert_key_matches_reference_and_is_a_curve(spark):
    """The branchless unrolled Spark expression equals the classic
    iterative xy→d transform on a full 6-bit grid, is bijective, and
    consecutive distances are unit steps (the locality property that
    justifies preferring it to Z-order); NULL inputs give a NULL key."""
    from engine.ops.io import with_hilbert_key

    def ref(x, y, bits):
        d = 0
        for k in range(bits - 1, -1, -1):
            s = 1 << k
            rx = 1 if (x & s) else 0
            ry = 1 if (y & s) else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
        return d

    bits, n = 6, 64
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts + [(None, 3), (5, None)], "x int, y int")
    rows = with_hilbert_key(df, "x", "y", bits=bits).collect()
    got = {(r["x"], r["y"]): r["hkey"] for r in rows}
    assert got[(None, 3)] is None and got[(5, None)] is None
    pos = {}
    for (x, y) in pts:
        assert got[(x, y)] == ref(x, y, bits), (x, y)
        pos[got[(x, y)]] = (x, y)
    assert len(pos) == n * n  # bijective
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit-step curve


def test_stratified_kfold_exact_balance(spark):
    """Every stratum splits across folds within one row, including a
    stratum smaller than k and a NULL stratum."""
    from engine.extended.sampling import stratified_kfold

    rows = (
        [(i, "big") for i in range(103)]
        + [(1000 + i, "tiny") for i in range(3)]
        + [(2000 + i, None) for i in range(7)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_kfold(df, "source", k=5).collect()
    from collections import Counter

    per = Counter((r["source"], r["fold"]) for r in out)
    for src, total in [("big", 103), ("tiny", 3), (None, 7)]:
        counts = [per.get((src, f), 0) for f in range(5)]
        assert sum(counts) == total
        assert max(counts) - min(counts) <= 1, (src, counts)


def test_rendezvous_assign_minimal_disruption(spark):
    """The HRW property: dropping one node reassigns ONLY that node's
    keys — every other key keeps its owner (the reason this beats
    mod-N, which reshuffles ~everything)."""
    from engine.extended.sampling import rendezvous_assign

    df = spark.createDataFrame([(i,) for i in range(2000)], ["k"])
    nodes = [f"n{i}" for i in range(5)]
    before = {
        r["k"]: r["node"] for r in rendezvous_assign(df, "k", nodes).collect()
    }
    after = {
        r["k"]: r["node"]
        for r in rendezvous_assign(df, "k", nodes[:-1]).collect()
    }
    moved = {k for k in before if before[k] != after[k]}
    assert moved == {k for k, n in before.items() if n == "n4"}
    # and the load is roughly uniform (within 3x of fair share)
    from collections import Counter

    load = Counter(before.values())
    assert all(2000 / 5 / 2 < c < 2000 / 5 * 2 for c in load.values()), load


def test_ivf_add_batch_matches_rebuild_assignment(spark):
    """The FAISS train-once/add-forever contract: a batch assigned against
    the fixed centroids lands in exactly the lists a from-scratch
    assignment of the full corpus (same centroids) produces, and vectors
    with NULL embeddings are excluded like the build's own contract."""
    import random

    from engine.extended.similarity import ivf_add_batch, ivf_build_seeded

    rng = random.Random(17)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(300)
    ] + [(999, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base = df.filter(F.col("vec_id") % 3 != 0)
    batch = df.filter(F.col("vec_id") % 3 == 0)
    assigned_base, cents = ivf_build_seeded(base, n_lists=4, iters=2, dim=8)
    added = {
        r["vec_id"]: r["ivf_list"]
        for r in ivf_add_batch(batch, cents).collect()
    }
    # rebuild-parity: assign the SAME batch rows via the build's own final
    # assignment path (fixed centroids)
    from engine.extended.similarity import _seeded_argmin, quantized_vec

    full = (
        batch.filter(F.col("embedding").isNotNull())
        .select("vec_id", quantized_vec("embedding", 1_000_000.0).alias("__q"))
        .withColumn("ivf_list", _seeded_argmin(cents))
    )
    want = {r["vec_id"]: r["ivf_list"] for r in full.collect()}
    assert added == want and 999 not in added and len(added) > 0


def test_ranking_auc_known_values(spark):
    """Hand-checkable AUCs: a perfect separator scores 1.0, a reversed one
    0.0, all-ties 0.5, and a known mixed case matches sklearn's tie
    convention (pairwise half-credit); one-class inputs yield NULL."""
    from engine.ops.profile import ranking_auc

    def auc(rows):
        df = spark.createDataFrame(rows, "score double, lab int")
        r = ranking_auc(df, "score", "lab").first()
        return r["auc_micro"]

    perfect = [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]
    assert auc(perfect) == 1_000_000
    reversed_ = [(s, 1 - l) for s, l in perfect]
    assert auc(reversed_) == 0
    ties = [(5.0, 0), (5.0, 1), (5.0, 0), (5.0, 1)]
    assert auc(ties) == 500_000
    # mixed: pos scores {3, 1}, neg {2, 1}: pairs (3>2)=1, (3>1)=1,
    # (1<2)=0, (1=1)=0.5 -> AUC = 2.5/4 = 0.625
    mixed = [(3.0, 1), (1.0, 1), (2.0, 0), (1.0, 0)]
    assert auc(mixed) == 625_000
    one_class = [(1.0, 1), (2.0, 1)]
    assert auc(one_class) is None
    # NULL score/label rows are excluded, not crashed on
    with_nulls = mixed + [(None, 1), (9.0, None)]
    assert auc(with_nulls) == 625_000


def test_ranking_auc_negative_scores(spark):
    """Review catch: a perfect separator living entirely in negative score
    territory must score 1.0 — the first cut clamped negatives into one
    tie at zero and returned 0.5."""
    from engine.ops.profile import ranking_auc

    rows = [(-3.0, 0), (-2.0, 0), (-1.0, 1), (-0.5, 1)]
    df = spark.createDataFrame(rows, "score double, lab int")
    assert ranking_auc(df, "score", "lab").first()["auc_micro"] == 1_000_000
    # and mixed-sign ordering is preserved across the shift
    rows2 = [(-1.0, 0), (0.5, 1), (-2.0, 0), (2.0, 1)]
    df2 = spark.createDataFrame(rows2, "score double, lab int")
    assert ranking_auc(df2, "score", "lab").first()["auc_micro"] == 1_000_000
