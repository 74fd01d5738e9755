"""Hybrid search unit tests + randomized keep-first equivalence vs the
reference's pandas semantics."""

from __future__ import annotations

import math
import random

import pandas as pd

from engine.extended.search import hybrid_topk, tfidf_scores
from engine.ops.dedup import keep_first


def test_tfidf_known_values(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark spark engine"),
            (1, "engine room"),
            (2, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lex_score"] for r in tfidf_scores(docs, ["spark"]).collect()}
    idf = math.log((3 + 1) / (1 + 1))  # df(spark)=1, N=3
    assert out[0] == round(idf * (2 / (2 + 1.2)), 4)
    assert out[1] == 0.0 and out[2] == 0.0


def test_hybrid_fuses_both_signals(spark):
    docs = spark.createDataFrame(
        [(0, "spark match"), (1, "no lexical overlap")],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    # doc 0 wins lexically, doc 1 wins on vector; lexical idf ~0.29 < cos gap 1.0
    out = hybrid_topk(docs, vecs, ["spark"], [1.0, 0.0], k=2)
    rows = out.collect()
    assert rows[0]["doc_id"] == 1  # vector signal dominates here
    assert rows[0]["vec_score"] == 1.0
    assert rows[1]["lex_score"] > 0


def test_keep_first_matches_pandas_reference_semantics(spark):
    """Randomized equivalence: engine keep_first ≡ pandas sort_values +
    drop_duplicates(keep='first') — the reference's exact implementation
    (lib/pipeline_controller.py:176-181)."""
    rng = random.Random(1234)
    for trial in range(3):
        rows = [
            (
                rng.randrange(8),      # key (collisions guaranteed)
                rng.randrange(4),      # order1
                rng.randrange(4),      # order2
                rng.randrange(10000),  # payload (tiebreak for determinism)
            )
            for _ in range(200)
        ]
        pdf = pd.DataFrame(rows, columns=["k", "o1", "o2", "p"])
        expected = (
            pdf.sort_values(["o1", "o2", "p"], kind="mergesort")
            .drop_duplicates(subset=["k"], keep="first")
            .sort_values("k")
        )
        sdf = spark.createDataFrame(pdf)
        got = (
            keep_first(sdf, ["k"], ["o1", "o2", "p"])
            .orderBy("k")
            .toPandas()
        )
        assert got.reset_index(drop=True).equals(
            expected.reset_index(drop=True)
        ), f"trial {trial} diverged"


def test_hash_split_distribution_and_stability(spark):
    from engine.extended.sampling import hash_split
    from pyspark.sql import functions as F

    df = spark.range(10000).select(F.col("id"))
    out = df.withColumn("split", hash_split("id"))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 10000 - 0.8) < 0.02
    assert abs(counts["val"] / 10000 - 0.1) < 0.02
    assert abs(counts["test"] / 10000 - 0.1) < 0.02
    # stability: same key → same split on re-run and under different partitioning
    again = {r["id"]: r["split"] for r in df.repartition(13).withColumn("split", hash_split("id")).collect()}
    first = {r["id"]: r["split"] for r in out.collect()}
    assert first == again
