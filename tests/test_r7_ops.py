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
