"""BPE merge training: hand-checked merges, framing-invariant edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.extended.bpe import bpe_apply, bpe_train, char_seq, rules_df


def _corpus(spark, words: dict[str, int]):
    rows = [(i, " ".join([w] * n)) for i, (w, n) in enumerate(words.items())]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_learns_the_sennrich_example(spark):
    """low×5 lower×2 newest×6 widest×3: es(9) → est(9) → lo(7) → low(7),
    with the (e,s)-before-(s,t) and (l,o)-before-(o,w) lexicographic
    tie-breaks hand-verified."""
    d = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    rules, words = bpe_train(d, rounds=4)
    words.unpersist()
    got = [(r["lhs"], r["rhs"], r["merged"], r["pair_count"]) for r in rules]
    assert got == [
        ("e", "s", "es", 9),
        ("es", "t", "est", 9),
        ("l", "o", "lo", 7),
        ("lo", "w", "low", 7),
    ]


def test_bpe_merges_adjacent_occurrences_in_one_round(spark):
    """'abab': one replace pass must catch BOTH (a,b) pairs even though
    consecutive matches share the separator — the framing invariant."""
    d = _corpus(spark, {"abab": 3})
    rules, words = bpe_train(d, rounds=2)
    words.unpersist()
    assert (rules[0]["merged"], rules[0]["pair_count"]) == ("ab", 6)
    assert (rules[1]["merged"], rules[1]["pair_count"]) == ("abab", 3)


def test_bpe_overlap_chain_merges_leftmost(spark):
    """'aaa' merging (a,a): leftmost non-overlapping → ['aa', 'a']."""
    d = _corpus(spark, {"aaa": 1})
    rules, words = bpe_train(d, rounds=1)
    segged = bpe_apply(d, rules)
    assert segged.collect()[0]["bpe_symbols"][0] == ["aa", "a"]
    words.unpersist()


def test_bpe_no_intra_symbol_false_match(spark):
    """After 'ab' forms, a later (b, c) merge must not fire against the 'b'
    inside the multi-char symbol 'ab'.  abx×5 abc×2 zbc×3 learns ab(7),
    abx(5), then bc — whose count must be 3 (zbc only): a broken symbol
    boundary would see 'b  c' inside ' ab  c ' and report 5."""
    d = _corpus(spark, {"abx": 5, "abc": 2, "zbc": 3})
    rules, words = bpe_train(d, rounds=3)
    words.unpersist()
    assert rules[0]["merged"] == "ab"
    assert rules[1]["merged"] == "abx"
    assert (rules[2]["lhs"], rules[2]["rhs"]) == ("b", "c")
    assert rules[2]["pair_count"] == 3
    seg = {
        r["doc_id"]: r["bpe_symbols"]
        for r in bpe_apply(d, rules).collect()
    }
    assert seg[1][0] == ["ab", "c"]  # abc docs keep 'ab' intact
    assert seg[2][0] == ["z", "bc"]


def test_bpe_empty_corpus_and_validation(spark):
    d = spark.createDataFrame([(1, "")], "doc_id long, text string")
    rules, words = bpe_train(d, rounds=3)
    words.unpersist()
    assert rules == []
    out = rules_df(spark, rules)
    assert out.columns == ["merge_rank", "lhs", "rhs", "merged", "pair_count"]
    assert out.count() == 0
    with pytest.raises(ValueError, match="rounds"):
        bpe_train(d, rounds=0)


def test_char_seq_framing(spark):
    got = (
        spark.createDataFrame([("abc",)], "w string")
        .select(char_seq("w").alias("s"))
        .collect()[0]["s"]
    )
    assert got == " a  b  c "


def test_bpe_apply_is_shuffle_free(spark):
    d = _corpus(spark, {"abab": 2})
    rules, words = bpe_train(d, rounds=1)
    words.unpersist()
    plan = (
        bpe_apply(d, rules)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_bpe_oracle_parity_when_merges_exhaust(spark):
    """The divergence a review caught: when the vocabulary runs out of
    pairs before the round budget, Spark's bpe_train breaks and KEEPS the
    word table — the SQL twin's per-round merge must preserve it too (a
    CROSS JOIN against the empty argmax wiped it to zero rows)."""
    import duckdb
    import pandas as pd

    from queries import _bpe_sql

    rows = [(0, "ab"), (1, "ab"), (2, "ab")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    rules, words = bpe_train(d, rounds=3)
    assert [r["merged"] for r in rules] == ["ab"]  # merges exhaust at 1
    from pyspark.sql import functions as F

    syms = F.split(F.substring("seq", F.lit(2), F.length("seq") - 2), "  ")
    spark_stats = sorted(
        (r["sym"], r["n"])
        for r in words.select("cnt", F.explode(syms).alias("sym"))
        .groupBy("sym")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    )
    words.unpersist()

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = _bpe_sql(
        3,
        """
    SELECT sym, CAST(SUM(cnt) AS BIGINT) AS n FROM (
      SELECT cnt, UNNEST(string_split(substr(seq, 2, length(seq) - 2), '  ')) AS sym
      FROM w3)
    GROUP BY sym ORDER BY sym""",
    )
    oracle_stats = sorted((r[0], r[1]) for r in con.execute(sql).fetchall())
    assert spark_stats == oracle_stats == [("ab", 3)]
