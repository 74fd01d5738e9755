"""Round-3 curation additions: HTML → text extraction, hashed linear
quality classifier, character entropy, column profiling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from engine.extended.curation import hashed_quality_score, html_to_text
from engine.extended.text import char_entropy_expr
from engine.ops.profile import table_profile


def _one(spark, html: str) -> str:
    return (
        spark.createDataFrame([(html,)], "h string")
        .select(html_to_text("h").alias("t"))
        .first()["t"]
    )


def test_html_to_text_strips_script_style_comments_tags(spark):
    html = (
        '<html><head><STYLE media="all">p {a:1}</STYLE>'
        "<script>if (1 < 2 && x > 0) alert('hi')</script></head>"
        "<!-- hidden <b>markup</b> --><body><p>Hello <i>world</i></p></body></html>"
    )
    assert _one(spark, html) == "Hello world"


def test_html_to_text_entities_and_double_escape(spark):
    # &amp;lt; must decode to the LITERAL "&lt;", never to "<" (amp runs last,
    # left-to-right non-overlapping), and &nbsp; becomes plain space.
    assert (
        _one(spark, "a &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;b &amp;lt;c")
        == 'a <tag> "q" \'s\' b &lt;c'
    )


def test_html_to_text_collapses_whitespace(spark):
    assert _one(spark, "<div>a</div>\n\n  <div>b</div>\t c") == "a b c"


def test_hashed_quality_score_matches_hand_computation(spark):
    from engine.extended.dedup import md5_long

    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, ""), (3, None)], "doc_id long, text string"
    )
    from engine.extended.text import tokens

    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", tokens("text").alias("__toks")
        )
        .select(
            "doc_id",
            *[
                c.alias(n)
                for n, c in hashed_quality_score(F.col("__toks")).items()
            ],
        )
        .collect()
    }
    # hand-compute the weights through the same dual-implementable hash
    buckets = {
        r["t"]: r["b"]
        for r in spark.createDataFrame([("alpha",), ("beta",)], "t string")
        .select(
            "t",
            (
                F.pmod(md5_long(F.concat(F.lit("q|"), F.col("t"))), F.lit(4096))
                % 197
                - 98
            ).alias("b"),
        )
        .collect()
    }
    expect = buckets["alpha"] + 2 * buckets["beta"]
    assert out[1]["weight_sum"] == expect
    raw = expect / (98.0 * 3)
    assert out[1]["quality_score"] == round(1.0 / (1.0 + math.exp(-4.0 * raw)), 4)
    assert out[1]["quality_label"] == int(out[1]["quality_score"] >= 0.5)
    # empty text: zero weight, neutral score; null text: null sum, neutral score
    assert out[2]["weight_sum"] == 0 and out[2]["quality_score"] == 0.5
    assert out[3]["weight_sum"] is None and out[3]["quality_score"] == 0.5


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "aaaa"),
            (2, "abab"),
            (3, "abcd"),
            (4, ""),
            (5, None),
            (6, "🎉🎉aåa"),  # non-ASCII stripped pre-lowering → "aa" → H=0
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", char_entropy_expr("text").alias("h")
        ).collect()
    }
    assert out[1] == 0.0  # single symbol
    assert out[2] == round(math.log(2), 4)  # two equiprobable symbols
    assert out[3] == round(math.log(4), 4)  # four equiprobable symbols
    assert out[4] == 0.0 and out[5] == 0.0
    assert out[6] == 0.0


def test_table_profile_stats_and_canonical_strings(spark):
    df = spark.createDataFrame(
        [(1, 10.5, "b"), (2, None, "a"), (2, 3.0, None)],
        "k long, v double, s string",
    )
    rows = {
        r["column"]: r
        for r in table_profile(df, ["k", "v", "s"], exact_distinct=True).collect()
    }
    assert list(rows) == ["k", "s", "v"]  # ordered by column name
    assert rows["k"]["n_rows"] == 3 and rows["k"]["n_distinct"] == 2
    assert rows["v"]["n_null"] == 1
    assert rows["v"]["min_value"] == "3.00" and rows["v"]["max_value"] == "10.50"
    assert rows["s"]["min_value"] == "a" and rows["s"]["max_value"] == "b"
    # default (HLL) mode keeps the same shape/columns
    approx = {r["column"]: r for r in table_profile(df, ["k"]).collect()}
    assert approx["k"]["n_distinct"] >= 1


def test_table_profile_exact_edge_semantics(spark):
    """The two-pass exact path must match native COUNT(DISTINCT): -0.0 and
    0.0 merge, NaN is one value, an all-NULL column counts 0, and the plan
    carries no gid-Expand in EITHER mode."""
    nan = float("nan")
    df = spark.createDataFrame(
        [(0.0, None), (-0.0, None), (nan, None), (nan, None), (1.5, None)],
        "d double, z string",
    )
    rows = {
        r["column"]: r
        for r in table_profile(df, ["d", "z"], exact_distinct=True).collect()
    }
    assert rows["d"]["n_distinct"] == 3  # {0.0, NaN, 1.5}
    assert rows["z"]["n_distinct"] == 0 and rows["z"]["n_null"] == 5
    for exact in (True, False):
        plan = (
            table_profile(df, ["d", "z"], exact_distinct=exact)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Expand" not in plan


def test_table_profile_exact_distinct_on_array_column(spark):
    """Complex types go through to_json, not a bare string cast: ['a, b']
    and ['a','b'] must stay distinct."""
    df = spark.createDataFrame(
        [(["a, b"],), (["a", "b"],), (["a", "b"],)], "tags array<string>"
    )
    rows = {
        r["column"]: r
        for r in table_profile(df, ["tags"], exact_distinct=True).collect()
    }
    assert rows["tags"]["n_distinct"] == 2


# ---------------------------------------------------------------------------
# Bloom-filter membership / contamination
# ---------------------------------------------------------------------------


def _bloom_docs(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),   # eval
            (1, "the quick brown fox jumps somewhere else today"),  # overlaps
            (2, "completely different words about spark engines here"),
            (3, ""),  # no shingles: drops out
        ],
        "doc_id long, text string",
    )


def test_bloom_has_no_false_negatives(spark):
    """Every shingle actually in the filter's key set must probe true —
    probing the eval docs against their own filter flags everything."""
    from engine.extended.curation import bloom_contamination

    d = _bloom_docs(spark)
    ev = d.filter(F.col("doc_id") == 0)
    out = {r["doc_id"]: r for r in bloom_contamination(ev, ev).collect()}
    assert out[0]["n_flagged"] == out[0]["n_shingles"]
    assert out[0]["bloom_rate"] == 1.0


def test_bloom_rate_upper_bounds_exact_contamination(spark):
    """False positives only inflate the rate — bloom_rate >= the exact
    broadcast-join contamination for every doc, and with 16384 bits and a
    handful of keys the two coincide on this corpus."""
    from engine.extended.curation import bloom_contamination, ngram_contamination

    d = _bloom_docs(spark)
    ev = d.filter(F.col("doc_id") == 0)
    train = d.filter(F.col("doc_id") != 0)
    bloom = {r["doc_id"]: r for r in bloom_contamination(train, ev).collect()}
    exact = {r["doc_id"]: r for r in ngram_contamination(train, ev).collect()}
    assert set(bloom) == set(exact) == {1, 2}
    for i in exact:
        assert bloom[i]["n_shingles"] == exact[i]["n_shingles"]
        assert bloom[i]["bloom_rate"] >= exact[i]["contamination"]
    assert bloom[1]["bloom_rate"] > 0.0  # overlapping doc is caught
    assert bloom[2]["bloom_rate"] == 0.0  # disjoint doc stays clean here


def test_bloom_probe_plan_has_no_join(spark):
    """The scale claim: the training-side scan is joinless codegen — the
    eval set's size can never re-shape the 100 TB side's plan."""
    from engine.extended.curation import bloom_contamination

    d = _bloom_docs(spark)
    plan = (
        bloom_contamination(d.filter(F.col("doc_id") != 0), d.filter(F.col("doc_id") == 0))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_bloom_words_shape_and_validation(spark):
    import pytest

    from engine.extended.curation import bloom_bit_words, bloom_member

    keys = spark.createDataFrame([("a b c",), (None,)], "sh string")
    words = bloom_bit_words(keys, m_bits=256, n_hashes=2)
    assert len(words) == 4  # 256 / 64
    assert any(w != 0 for w in words)
    assert all(-(1 << 63) <= w < (1 << 63) for w in words)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bit_words(keys, m_bits=100)
    with pytest.raises(ValueError, match="n_hashes"):
        bloom_bit_words(keys, n_hashes=0)
    with pytest.raises(ValueError, match="entries"):
        bloom_member("sh", words, m_bits=512, n_hashes=2)


def test_bloom_member_null_key_probes_null(spark):
    from engine.extended.curation import bloom_bit_words, bloom_member

    keys = spark.createDataFrame([("x",)], "sh string")
    words = bloom_bit_words(keys, m_bits=64, n_hashes=2)
    probe = spark.createDataFrame([("x",), (None,)], "sh string")
    got = probe.select(
        bloom_member("sh", words, m_bits=64, n_hashes=2).alias("m")
    ).collect()
    assert got[0]["m"] is True
    assert got[1]["m"] is None


# ---------------------------------------------------------------------------
# PMI collocations / JL projection
# ---------------------------------------------------------------------------


def test_pmi_hand_computed(spark):
    """5 docs of exactly 'new york': p(a,b)=1, p(new)=p(york)=1/2 →
    PMI = ln(4) = 1.3863."""
    from engine.extended.curation import pmi_collocations

    d = spark.createDataFrame(
        [(i, "new york") for i in range(5)], "doc_id long, text string"
    )
    got = pmi_collocations(d, min_count=5, k=10).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["a"], r["b"], r["pair_count"]) == ("new", "york", 5)
    assert r["pmi"] == 1.3863


def test_pmi_min_count_floor(spark):
    from engine.extended.curation import pmi_collocations

    d = spark.createDataFrame(
        [(0, "rare pair"), (1, "other words entirely")],
        "doc_id long, text string",
    )
    assert pmi_collocations(d, min_count=2, k=10).collect() == []


def test_jl_project_matches_python_fold(spark):
    import math

    from engine.extended.dedup import _unit_hyperplanes
    from engine.extended.similarity import jl_project

    vec = [float(i % 7) - 3.0 for i in range(16)]
    d = spark.createDataFrame(
        [(0, vec), (1, None)], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r["jl_vec"] for r in jl_project(d, 4, dim=16).collect()}
    assert got[1] is None
    planes = _unit_hyperplanes(16, 4)
    scale = math.sqrt(3.0 / 4)
    import numpy as np

    f32 = [float(np.float32(v)) for v in vec]
    want = []
    for p in planes:
        s = 0.0
        for x, y in zip(f32, p):
            s = s + x * y
        want.append(round(s * scale, 6) + 0.0)
    assert got[0] == want
    assert len(got[0]) == 4


def test_jl_project_validation_and_plan(spark):
    import pytest

    from engine.extended.similarity import jl_project

    d = spark.createDataFrame([(0, [1.0] * 8)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="out_dim"):
        jl_project(d, 0, dim=8)
    with pytest.raises(ValueError, match="out_dim"):
        jl_project(d, 9, dim=8)
    plan = jl_project(d, 2, dim=8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
