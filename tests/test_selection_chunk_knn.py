"""Golden-frame tests: DSIR selection, token chunking, exact kNN join."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from engine.extended.curation import chunk_tokens
from engine.extended.selection import dsir_select, importance_scores
from engine.extended.similarity import knn_join


# ---------------------------------------------------------------------------
# importance_scores / dsir_select
# ---------------------------------------------------------------------------


def _lang_docs(spark):
    rows = [
        (0, "aaa aaa bbb", "en"),   # mostly target-heavy tokens
        (1, "ccc ccc ddd", "de"),   # background-only tokens
        (2, "aaa ccc", "de"),       # mixed
        (3, "", "en"),              # zero tokens -> dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_importance_scores_rank_target_like_docs_higher(spark):
    scores = {
        r["doc_id"]: r["score"]
        for r in importance_scores(_lang_docs(spark), F.col("lang") == "en").collect()
    }
    assert 3 not in scores  # zero-token doc has no score
    # doc 0 is made of tokens frequent in the en slice -> highest score;
    # doc 1's tokens never appear in the target -> lowest
    assert scores[0] > scores[2] > scores[1]


def test_importance_scores_match_hand_computation(spark):
    # corpus: aaa x3 (2 in target), bbb x1 (target), ccc x3, ddd x1
    # tot_bg=8, tot_t=3 (doc0: aaa aaa bbb), vocab=4, smoothing=1
    def llr(n_t, n_bg):
        return math.log((n_t + 1) / (3 + 4)) - math.log((n_bg + 1) / (8 + 4))

    expected_doc2 = round((llr(2, 3) + llr(0, 3)) / 2, 4)  # aaa, ccc
    scores = {
        r["doc_id"]: r["score"]
        for r in importance_scores(_lang_docs(spark), F.col("lang") == "en").collect()
    }
    assert scores[2] == expected_doc2


def test_dsir_select_top_k_deterministic(spark):
    out = dsir_select(_lang_docs(spark), F.col("lang") == "en", k=2).collect()
    assert [r["doc_id"] for r in out] == [0, 2]


# ---------------------------------------------------------------------------
# chunk_tokens
# ---------------------------------------------------------------------------


def test_chunk_tokens_overlapping_windows(spark):
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6")], "doc_id long, text string"
    )
    rows = {r["chunk_id"]: r for r in chunk_tokens(df, size=4, stride=2).collect()}
    # r9: the start-6 window ('t6') is a strict suffix of the start-4
    # window and is no longer emitted (review catch: stride<size
    # duplicated tail content into every downstream index)
    assert set(rows) == {0, 1, 2}
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3" and rows[0]["n_tokens"] == 4
    assert rows[1]["chunk_text"] == "t2 t3 t4 t5"
    assert rows[2]["chunk_text"] == "t4 t5 t6" and rows[2]["n_tokens"] == 3


def test_chunk_tokens_disjoint_when_stride_equals_size(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    rows = chunk_tokens(df, size=2, stride=2).collect()
    texts = [r["chunk_text"] for r in sorted(rows, key=lambda r: r["chunk_id"])]
    assert texts == ["a b", "c d", "e"]


def test_chunk_tokens_drops_empty_docs_and_has_no_shuffle(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "x")], "doc_id long, text string")
    out = chunk_tokens(df, size=4, stride=4)
    assert [(r["doc_id"], r["chunk_text"]) for r in out.collect()] == [(3, "x")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure flatMap: pipelines into the consumer


# ---------------------------------------------------------------------------
# knn_join
# ---------------------------------------------------------------------------


def _unit_vecs(spark):
    def v(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    rows = [(0, v(0)), (1, v(10)), (2, v(30)), (3, v(90)), (4, v(180))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_knn_join_ranks_by_angle(spark):
    e = _unit_vecs(spark)
    out = knn_join(e.filter(F.col("vec_id") == 0), e, k=3).collect()
    assert [(r["c_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (1, 1),
        (2, 2),
        (3, 3),
    ]


def test_knn_join_every_query_gets_k_neighbors(spark):
    e = _unit_vecs(spark)
    out = knn_join(e, e, k=2).collect()
    per_q = {}
    for r in out:
        assert r["q_id"] != r["c_id"]  # self-pairs excluded
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(sorted(v) == [1, 2] for v in per_q.values())


# ---------------------------------------------------------------------------
# contamination_attribution
# ---------------------------------------------------------------------------


def test_contamination_attribution_finds_the_leaking_doc(spark):
    from engine.extended.curation import contamination_attribution

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # full overlap
            (2, "the quick brown cat sits on the warm mat"),     # partial
            (3, "totally unrelated text about query engines"),   # none
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(97, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    rows = contamination_attribution(train, ev, k=2).collect()
    ranked = [(r["train_id"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert ranked == [(1, 1), (2, 2)]
    assert all(r["eval_id"] == 97 for r in rows)
    top = {r["rank"]: r["n_shared"] for r in rows}
    assert top[1] == 7  # all 7 distinct trigrams of the 9-token eval doc
    assert top[2] == 1  # only "the quick brown"


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------


def test_quantize_int8_codes_and_roundtrip(spark):
    from engine.extended.similarity import dequantize_int8, quantize_int8

    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.0]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = dequantize_int8(quantize_int8(df))
    rows = {r["vec_id"]: r for r in out.collect()}
    assert rows[0]["qvec"] == [127, -64, 0]  # round(-63.5) away from zero
    assert abs(rows[0]["qscale"] - 1.0 / 127) < 1e-12
    # roundtrip error bounded by scale/2 per component
    for orig, deq in zip([1.0, -0.5, 0.0], rows[0]["embedding_deq"]):
        assert abs(orig - deq) <= rows[0]["qscale"] / 2 + 1e-12
    assert rows[1]["qvec"] == [0, 0, 0] and rows[1]["qscale"] == 0.0
    assert rows[1]["embedding_deq"] == [0.0, 0.0, 0.0]  # zero vector exact


def test_quantize_int8_is_shuffle_free(spark):
    from engine.extended.similarity import quantize_int8

    df = spark.createDataFrame([(0, [0.25, -0.75])], "vec_id long, embedding array<float>")
    plan = quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_knn_join_exclude_self_flag_keeps_equal_ids_for_disjoint_tables(spark):
    # queries and corpus from different tables whose id spaces coincide:
    # exclude_self=False must keep the legitimate equal-id neighbor
    q = _unit_vecs(spark).filter(F.col("vec_id") == 0)
    out = knn_join(q, _unit_vecs(spark), k=2, exclude_self=False).collect()
    ranked = [(r["c_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [(0, 1), (1, 2)]  # the identical vector is rank 1


def test_quantize_int8_scale_projected_outside_transform_lambda(spark):
    # HOF lambdas get no CSE: the O(d) array_max must appear ONCE in the
    # optimized plan (projected behind qscale), not inlined per element
    from engine.extended.similarity import quantize_int8

    e = _unit_vecs(spark)
    plan = (
        quantize_int8(e).select("qvec", "qscale")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("array_max") == 1


def test_lsh_knn_join_matches_exact_on_tight_clusters(spark):
    """Near-identical vectors share all band keys, so the LSH join finds
    the same neighbors as the exact join for cos~1 pairs; bucket_cap bounds
    a flooded bucket to its cap lowest corpus ids."""
    import math

    from engine.extended.similarity import knn_join, lsh_knn_join

    def ray(theta, eps=0.0):
        return [math.cos(theta) + eps, math.sin(theta)] + [0.0] * 14

    rows = []
    # two tight clusters of 4 + a lone outlier
    for i in range(4):
        rows.append((i, ray(0.0, eps=i * 1e-4)))
        rows.append((10 + i, ray(math.pi / 2, eps=i * 1e-4)))
    rows.append((99, ray(math.pi, 0.0)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter(F.col("vec_id").isin(0, 10))

    exact = {
        (r["q_id"], r["rank"]): r["c_id"]
        for r in knn_join(qs, df, k=2).collect()
    }
    approx = {
        (r["q_id"], r["rank"]): r["c_id"]
        for r in lsh_knn_join(
            qs, df, k=2, dim=16, planes=16, bands=4, exclude_self=True
        ).collect()
    }
    assert approx == exact  # tight clusters: full recall

    capped = lsh_knn_join(
        qs, df, k=3, dim=16, planes=16, bands=4, exclude_self=True,
        bucket_cap=2,
    ).collect()
    # with cap 2, each bucket exposes its 2 lowest corpus ids only — pin the
    # EXACT allowed set so a cap failure in either cluster's buckets fails
    # (c_id <= 11 alone would let uncapped 2/3 through)
    assert {r["c_id"] for r in capped} <= {0, 1, 10, 11, 99}

    import pytest

    with pytest.raises(ValueError, match="multiple of bands"):
        lsh_knn_join(qs, df, k=1, dim=16, planes=10, bands=4)
    with pytest.raises(ValueError, match="multiple of bands"):
        lsh_knn_join(qs, df, k=1, dim=16, planes=4, bands=8)


# ---------------------------------------------------------------------------
# Product quantization: pq_train_seeded / pq_encode / pq_adc_topk
# ---------------------------------------------------------------------------


def _pq_corpus(spark):
    """Two tight clusters in 8-d: ids 0-3 near e1, ids 10-13 near e2."""
    rows = []
    for i in range(4):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
        rows.append((10 + i, [0.0, 0.0, 0.0, 0.0, 1.0, 0.01 * i, 0.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_identical_vectors_share_codes(spark):
    from engine.extended.similarity import pq_encode, pq_train_seeded

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [1.0, 2.0, 3.0, 4.0]), (2, [-9.0, 0.0, 5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    cb = pq_train_seeded(df, m=2, ksub=2, iters=2, dim=4)
    codes = {r["vec_id"]: r["pq_code"] for r in pq_encode(df, cb).collect()}
    assert codes[0] == codes[1]
    assert len(codes[0]) == 2  # m codes per vector


def test_pq_adc_ranks_own_cluster_first(spark):
    from engine.extended.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train_seeded,
        quantized_vec,
    )

    df = _pq_corpus(spark)
    cb = pq_train_seeded(df, m=2, ksub=2, iters=2, dim=8)
    enc = pq_encode(df, cb)
    qq = [
        int(x)
        for x in df.filter(F.col("vec_id") == 0)
        .select(quantized_vec("embedding").alias("qq"))
        .collect()[0]["qq"]
    ]
    top = pq_adc_topk(enc, cb, qq, k=4).collect()
    assert {r["vec_id"] for r in top} == {0, 1, 2, 3}  # query's own cluster
    # ascending distance, deterministic tie-break by id
    dists = [r["adist"] for r in top]
    assert dists == sorted(dists)


def test_pq_adc_matches_python_reference(spark):
    """ADC distances equal an independent driver-side recomputation
    (codes looked up in the same codebooks, same fold order)."""
    from engine.extended.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train_seeded,
        quantized_vec,
    )

    df = _pq_corpus(spark)
    m, dsub = 2, 4
    cb = pq_train_seeded(df, m=m, ksub=2, iters=1, dim=8)
    enc = pq_encode(df, cb)
    rows = enc.select("vec_id", quantized_vec("embedding").alias("qq"), "pq_code").collect()
    qq = [int(x) for x in rows[0]["qq"]]
    want = {}
    for r in rows:
        d = 0.0
        for j in range(m):
            c = cb[j][r["pq_code"][j]]
            s = 0.0
            for x, y in zip(qq[j * dsub : (j + 1) * dsub], c):
                s = s + (float(x) - y) * (float(x) - y)
            d = d + s
        want[r["vec_id"]] = round(d / 1e12, 6)
    got = {r["vec_id"]: r["adist"] for r in pq_adc_topk(enc, cb, qq, k=100).collect()}
    assert got == want


def test_pq_encode_null_vector_null_code_and_adc_skips_it(spark):
    from engine.extended.similarity import pq_adc_topk, pq_encode, pq_train_seeded

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, None), (2, [0.0, 0.0, 1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cb = pq_train_seeded(df, m=2, ksub=2, iters=1, dim=4)
    enc = pq_encode(df, cb)
    codes = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
    assert codes[1] is None
    ids = {r["vec_id"] for r in pq_adc_topk(enc, cb, [0, 0, 0, 0], k=10).collect()}
    assert ids == {0, 2}


def test_pq_validates_dim_and_empty(spark):
    import pytest

    from engine.extended.similarity import pq_train_seeded

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="multiple of m"):
        pq_train_seeded(df, m=2, ksub=2, iters=1, dim=3)
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="no non-null vectors"):
        pq_train_seeded(empty, m=1, ksub=2, iters=1, dim=3)


def test_pq_encode_and_adc_are_shuffle_free(spark):
    """The stored-side plans are pure projections: encode adds the code
    column with no Exchange; the ADC scan is filter+project+TakeOrdered."""
    from engine.extended.similarity import pq_adc_topk, pq_encode, pq_train_seeded

    df = _pq_corpus(spark)
    cb = pq_train_seeded(df, m=2, ksub=2, iters=1, dim=8)
    enc = pq_encode(df, cb)
    assert "Exchange" not in enc._jdf.queryExecution().executedPlan().toString()
    plan = (
        pq_adc_topk(enc, cb, [0] * 8, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_ann_degenerate_input_guards(spark):
    """Review catches r9: dim mismatches must fail loudly or NULL out, not
    silently collapse to 0-signatures / list-0 assignments / code-0 PQ."""
    import pytest

    from engine.extended.similarity import (
        ivf_build_seeded,
        lsh_topk,
        pq_encode,
        with_signature,
    )

    df = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [0.5] * 64), (2, [1.0] * 16)],
        "vec_id long, embedding array<float>",
    )
    # with_signature: wrong-length vector -> NULL signature, not 0
    sigs = {
        r["vec_id"]: r["lsh_sig"]
        for r in with_signature(df, dim=64, planes=16).collect()
    }
    assert sigs[0] is not None and sigs[1] is not None
    assert sigs[2] is None

    # lsh_topk: query length must match dim
    with pytest.raises(ValueError, match="query_vec"):
        lsh_topk(df, [1.0] * 16, k=2, dim=64)

    # ivf_build_seeded: vector length must match dim
    with pytest.raises(ValueError, match="!= dim"):
        ivf_build_seeded(
            df.filter(F.col("vec_id") < 2), n_lists=2, dim=16, iters=1
        )

    # pq_encode: wrong-length vector -> NULL codes (never fabricated 0s)
    books = [[[0.0] * 8, [1000000.0] * 8] for _ in range(8)]  # m=8, dsub=8
    codes = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(df, books).collect()
    }
    assert codes[0] is not None and codes[1] is not None
    assert codes[2] is None
