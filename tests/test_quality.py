"""Round-3 data-quality operators: constraint checks, key audits,
snapshot diffing."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.ops.quality import (
    check_constraints,
    check_foreign_key,
    check_unique,
    snapshot_diff,
)


def test_check_constraints_counts_nulls_as_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], "k long, v double"
    )
    rows = {
        r["rule"]: r
        for r in check_constraints(
            df, {"v_positive": F.col("v") > 0, "k_small": F.col("k") < 100}
        ).collect()
    }
    assert rows["v_positive"]["n_violations"] == 2  # -1.0 and NULL
    assert rows["k_small"]["n_violations"] == 0
    assert rows["v_positive"]["n_rows"] == 3


def test_check_unique_reports_dup_keys_and_rows(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (3,)], "k long"
    )
    r = check_unique(df, ["k"]).first()
    assert r["n_keys"] == 3 and r["n_dup_keys"] == 2 and r["n_dup_rows"] == 5


def test_check_foreign_key_separates_orphans_from_nulls(spark):
    fact = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    r = check_foreign_key(fact, "fk", dim, "id").first()
    assert r["n_orphans"] == 1 and r["n_null_keys"] == 1


def test_snapshot_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e"), (4, None)], "k long, v string"
    )
    out = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # 1 unchanged (absent), 2 changed, 3 removed, 5 added, 4 unchanged-null (absent)
    assert out == {2: "changed", 3: "removed", 5: "added"}


def test_group_quantiles_discrete_values(spark):
    from engine.ops.profile import group_quantiles

    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 4]] + [("b", 10)], "g string, m long"
    )
    rows = {r["g"]: r for r in group_quantiles(df, ["g"], "m").collect()}
    assert (rows["a"]["q25"], rows["a"]["q50"], rows["a"]["q75"]) == (1, 2, 3)
    assert rows["b"]["q50"] == 10 and rows["b"]["n_rows"] == 1
    approx = group_quantiles(df, ["g"], "m", exact=False).columns
    assert approx == ["g", "n_rows", "q25", "q50", "q75"]


def test_int_histogram_buckets_and_overflow(spark):
    from engine.ops.profile import int_histogram

    df = spark.createDataFrame(
        [(v,) for v in [-5, 0, 49, 50, 99, 100, 250]], "m long"
    )
    rows = {
        r["bucket"]: r
        for r in int_histogram(df, "m", lo=0, hi=100, n_buckets=2).collect()
    }
    assert rows[-1]["n_rows"] == 1  # underflow
    assert rows[0]["n_rows"] == 2  # 0, 49
    assert rows[1]["n_rows"] == 2  # 50, 99 (boundary 50 goes UP)
    assert rows[2]["n_rows"] == 2  # 100, 250 overflow
    assert (rows[0]["lo_edge"], rows[0]["hi_edge"]) == (0.0, 50.0)


def test_snapshot_diff_null_vs_empty_do_not_collide(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "")], "k long, v string")
    out = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert [(r["k"], r["change"]) for r in out] == [(1, "changed")]


def test_row_hash_no_delimiter_injection(spark):
    from engine.ops.quality import snapshot_diff

    # ('x|y','z') vs ('x','y|z') must NOT collide (per-column hashing)
    old = spark.createDataFrame([(1, "x|y", "z")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "x", "y|z")], "k long, a string, b string")
    out = snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    assert [(r["k"], r["change"]) for r in out] == [(1, "changed")]


def test_unsafe_names_rejected(spark):
    import pytest

    from engine.ops.profile import table_profile
    from engine.ops.quality import check_constraints

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        check_constraints(df, {"isn't safe": F.col("k") > 0})
    with pytest.raises(ValueError):
        table_profile(df.withColumnRenamed("k", "k`x"), ["k`x"])


def test_group_quantiles_alias_collision_rejected(spark):
    import pytest

    from engine.ops.profile import group_quantiles

    df = spark.createDataFrame([(1, 1)], "g long, m long")
    with pytest.raises(ValueError):
        group_quantiles(df, ["g"], "m", probs=(0.333, 0.3349))


def test_zorder_key_sql_range_guard():
    import pytest

    from engine.ops.io import zorder_key_sql

    with pytest.raises(ValueError):
        zorder_key_sql(["a", "b", "c", "d"], bits=16)


# ---------------------------------------------------------------------------
# split_leakage_audit
# ---------------------------------------------------------------------------

from engine.ops.quality import split_leakage_audit


def test_split_leakage_counts_cross_split_twins(spark):
    """Twin texts under ids landing in different splits are counted per
    pair; expectations derived from hash_split itself on the same ids."""
    from pyspark.sql import functions as F
    from engine.extended.sampling import hash_split

    rows = [(i, f"unique text {i} paddingpadding") for i in range(40)]
    rows += [(100 + i, f"unique text {i} paddingpadding") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    split_of = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", hash_split(F.col("doc_id")).alias("s")
        ).collect()
    }
    expected = {}
    for i in range(40):
        a, b = sorted([split_of[i], split_of[100 + i]])
        if a != b:
            expected[(a, b)] = expected.get((a, b), 0) + 1
    got = {
        (r["split_a"], r["split_b"]): r["n_shared"]
        for r in split_leakage_audit(df).collect()
    }
    assert got == expected
    assert expected  # the fixture must actually exercise leakage


def test_split_leakage_clean_corpus_is_empty_and_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, "aaa bbb"), (2, "ccc ddd"), (3, None), (None, "aaa bbb")],
        "doc_id long, text string",
    )
    assert split_leakage_audit(df).count() == 0


# ---------------------------------------------------------------------------
# winsorized_stats
# ---------------------------------------------------------------------------

import pytest as _pt

from engine.ops.profile import winsorized_stats


def test_winsorize_clips_outliers_and_counts(spark):
    """19 unit values + one 1000.0 outlier: p95 (interpolated) pins the
    clip boundary; the outlier is counted and the mean is bounded."""
    rows = [("a", 1.0)] * 19 + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = winsorized_stats(df, "g", "v", lo=0.05, hi=0.95).collect()[0]
    assert r["n"] == 20
    assert r["n_clipped_hi"] == 1
    assert r["n_clipped_lo"] == 0
    # p95 of 19×1.0 + 1000.0 = 1.0 + 0.05·999·...: just assert boundedness
    assert r["win_mean"] < 100.0
    assert r["hi_bound"] < 1000.0


def test_winsorize_uniform_group_is_identity(spark):
    df = spark.createDataFrame([("a", 5.0)] * 8, "g string, v double")
    r = winsorized_stats(df, "g", "v").collect()[0]
    assert (r["n_clipped_lo"], r["n_clipped_hi"]) == (0, 0)
    assert r["win_mean"] == _pt.approx(5.0)


def test_winsorize_validation_and_null_exclusion(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), (None, 2.0)], "g string, v double"
    )
    with _pt.raises(ValueError, match="lo"):
        winsorized_stats(df, "g", "v", lo=0.9, hi=0.1)
    out = winsorized_stats(df, "g", "v").collect()
    assert len(out) == 1 and out[0]["n"] == 1


# ---------------------------------------------------------------------------
# categorical_mi
# ---------------------------------------------------------------------------

from engine.ops.profile import categorical_mi


def test_mi_perfect_dependence_equals_entropy(spark):
    """y = f(x) bijectively: MI = H(X) = H(Y), NMI = 1."""
    rows = [("a", "1")] * 4 + [("b", "2")] * 4
    df = spark.createDataFrame(rows, "x string, y string")
    r = categorical_mi(df, "x", "y").collect()[0]
    assert r["mi"] == r["h_x"] == r["h_y"]
    assert r["nmi"] == _pt.approx(1.0)


def test_mi_independence_is_zero_and_nulls_excluded(spark):
    rows = [(x, y) for x in "ab" for y in "12" for _ in range(3)]
    rows += [(None, "1"), ("a", None)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = categorical_mi(df, "x", "y").collect()[0]
    assert r["n"] == 12
    assert r["mi"] == _pt.approx(0.0)
    assert r["nmi"] == _pt.approx(0.0)


def test_mi_constant_column_yields_zero_nmi(spark):
    df = spark.createDataFrame([("a", "1"), ("a", "2")], "x string, y string")
    r = categorical_mi(df, "x", "y").collect()[0]
    assert r["h_x"] == 0.0 and r["nmi"] == 0.0


# ---------------------------------------------------------------------------
# money_cents — the canonical ledger idiom (queries/_base.py)
# ---------------------------------------------------------------------------


def test_money_cents_matches_duckdb_idiom(spark):
    """The centralized FLOOR(x·100+0.5) idiom must match DuckDB's
    CAST(FLOOR(x*100+0.5) AS BIGINT) bit-for-bit on hostile endings —
    .005/.995 shortest-string traps, negatives, zero, large magnitudes
    (the r9 ROUND-divergence ledger: FLOOR in binary space is the one
    half-up with a single cross-engine semantic)."""
    import duckdb

    from queries._base import money_cents

    vals = [
        1.005, 0.995, 99.995, 50.75375, -1.005, -0.005, 0.0, -0.0,
        123456789.555, 2.675, 8.875, 1e-8, -99999999.995,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r["c"]
        for r in df.select(money_cents("v").alias("c")).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(FLOOR(CAST(? AS DOUBLE) * 100 + 0.5) AS BIGINT)",
            [v],
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want


# ---------------------------------------------------------------------------
# r11: Gopher rule battery + n-gram novelty
# ---------------------------------------------------------------------------


def _gopher_rows(spark, texts):
    from engine.extended.text import gopher_rule_exprs, tokens

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    toked = df.select("doc_id", "text", tokens("text").alias("__toks"))
    cols = gopher_rule_exprs(F.col("__toks"), "text")
    out = toked.select("doc_id", *[c.alias(n) for n, c in cols.items()])
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_gopher_rules_keep_and_flags(spark):
    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with vigor"] * 6
    )  # 66 words, all alpha, stopwords {the, that, with, over...}
    short = "the dog and the cat have fun"  # 7 words -> flag_words = 0
    symbolic = good + " " + "#" * 20  # 66 words, 20 '#' -> ratio > 0.1
    rows = _gopher_rows(spark, [good, short, symbolic])

    g = rows[0]
    assert g["n_words"] == 66
    assert g["keep"] == 1 and all(
        g[f] == 1
        for f in (
            "flag_words",
            "flag_word_len",
            "flag_symbol",
            "flag_alpha",
            "flag_stop",
        )
    )
    assert g["n_stop_distinct"] >= 3  # the, that, with (+ over not in set)

    s = rows[1]
    assert s["flag_words"] == 0 and s["keep"] == 0
    assert s["flag_stop"] == 1  # the, and, have >= 2 distinct

    y = rows[2]
    assert y["flag_symbol"] == 0 and y["keep"] == 0
    # '#' runs are not tokens, so the word count is unchanged
    assert y["n_words"] == 66


def test_gopher_mean_word_len_flag_is_integer_exact(spark):
    # 50 words of length exactly 3 -> sum_len == 3*n: boundary must PASS
    # (>= 3 inclusive), with no float division anywhere in the flag.
    exact = " ".join(["abc"] * 50)
    # 50 words of length 2 -> mean 2 < 3: boundary must FAIL.
    low = " ".join(["ab"] * 50)
    rows = _gopher_rows(spark, [exact, low])
    assert rows[0]["flag_word_len"] == 1
    assert rows[0]["mean_word_len"] == 3.0
    assert rows[1]["flag_word_len"] == 0


def test_gopher_ellipsis_and_empty_doc(spark):
    # unicode ellipsis and three-dot sequences both count as symbols
    dotty = " ".join(["word"] * 50) + " ... ... …"
    rows = _gopher_rows(spark, [dotty, ""])
    assert rows[0]["n_words"] == 50
    # 3 symbols / 50 words = 0.06 <= 0.1 -> passes
    assert rows[0]["symbol_ratio"] == 0.06 and rows[0]["flag_symbol"] == 1
    e = rows[1]
    assert e["n_words"] == 0 and e["keep"] == 0
    assert e["mean_word_len"] is None and e["alpha_word_frac"] is None


def test_ngram_novelty_first_owner_semantics(spark):
    from engine.extended.curation import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c d"),  # shingles {a b c, b c d} - both first here
            (2, "a b c x"),  # {a b c (seen), b c x (new)} -> 0.5
            (3, "a b c d"),  # exact dup of doc 1 -> nothing novel
            (4, "z q"),  # < 3 tokens -> excluded
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in ngram_novelty(df, shingle_n=3).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_ngrams"] == 2 and out[1]["novelty"] == 1.0
    assert out[2]["n_ngrams"] == 2 and out[2]["n_novel"] == 1
    assert out[2]["novelty"] == 0.5
    assert out[3]["n_novel"] == 0 and out[3]["novelty"] == 0.0


def test_ngram_novelty_repeated_shingle_within_doc_counts_once(spark):
    from engine.extended.curation import ngram_novelty

    df = spark.createDataFrame(
        [(1, "a b a b a b")],  # 3-grams: {a b a, b a b} repeated -> distinct 2
        "doc_id long, text string",
    )
    row = ngram_novelty(df, shingle_n=3).collect()[0]
    assert row["n_ngrams"] == 2 and row["n_novel"] == 2
