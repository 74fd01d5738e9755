"""Unit tests for the corpus-curation operators (PII redaction, repetition
quality, TF-IDF, contamination) — golden-value style, mirroring the
reference's golden-frame tests (SURVEY §5)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from engine.extended.curation import (
    ngram_contamination,
    pii_counts,
    redact_pii,
    repetition_metrics,
    tfidf_top_terms,
)


def _redact(spark, text: str) -> dict:
    df = spark.createDataFrame([(text,)], "text string")
    out = df.select(
        redact_pii("text").alias("r"),
        *[c.alias(n) for n, c in pii_counts("text").items()],
    )
    return out.collect()[0].asDict()


def test_pii_redact_email_ip_ssn_phone(spark):
    r = _redact(spark, "a@b.com and 10.0.0.1 and 123-45-6789 and (212) 555-0199")
    assert r["r"] == "<EMAIL> and <IP> and <SSN> and <PHONE>"
    assert (r["n_email"], r["n_ip"], r["n_ssn"], r["n_phone"]) == (1, 1, 1, 1)


def test_pii_redact_email_host_ip_not_double_redacted(spark):
    # alpha TLD required for email; bare-IP hosts fall through to the IP rule
    r = _redact(spark, "root@10.0.0.1")
    assert r["r"] == "root@<IP>"
    assert r["n_email"] == 0


def test_pii_redact_ssn_not_confused_with_phone(spark):
    r = _redact(spark, "123-45-6789 vs 123-456-7890")
    assert r["r"] == "<SSN> vs <PHONE>"


def test_pii_redact_clean_text_is_identity(spark):
    r = _redact(spark, "no pii here, just words and the number 12345")
    assert r["r"] == "no pii here, just words and the number 12345"
    assert r["n_email"] == r["n_ip"] == r["n_ssn"] == r["n_phone"] == 0


def test_repetition_metrics_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),       # 1 distinct / 4; bigram 'spam spam' x3
            (2, "all words here differ"),     # no repetition
            (3, "one"),                       # single token → no bigrams (null)
            (4, ""),                          # no tokens → dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["dup_token_ratio"] == 0.75
    assert out[1]["top_token_ratio"] == 1.0
    assert out[1]["top_bigram_ratio"] == 1.0
    assert out[2]["dup_token_ratio"] == 0.0
    assert out[2]["top_token_ratio"] == 0.25
    assert out[3]["top_bigram_ratio"] is None


def test_tfidf_scores_and_ranking(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha alpha beta", "s1"),
            (2, "beta gamma", "s2"),
            (3, "gamma gamma gamma", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = tfidf_top_terms(df, k=5).collect()
    by_key = {(r["source"], r["term"]): r for r in out}
    # alpha: tf=2 in s1, df=1, N=3 → 2*ln(4/2)
    got = by_key[("s1", "alpha")]
    assert got["tfidf"] == round(2 * math.log(4 / 2), 4)
    assert got["rank"] == 1
    # gamma in s2: tf=4, df=2 → 4*ln(4/3)
    assert by_key[("s2", "gamma")]["tfidf"] == round(4 * math.log(4 / 3), 4)
    # every group emits at most k rows, ranks are 1..n
    for src in ("s1", "s2"):
        ranks = sorted(r["rank"] for r in out if r["source"] == src)
        assert ranks == list(range(1, len(ranks) + 1))


def test_contamination_fractions(spark):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # fully contained → 1.0
            (2, "totally novel text with nothing shared here"),  # 0.0
            (3, "the quick brown cat sat down"),  # 1 of 4 shingles shared
            (4, "to sh"),                        # < 3 tokens → no shingles, dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in ngram_contamination(train, eval_df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["contamination"] == 1.0
    assert out[2]["contamination"] == 0.0
    assert out[3]["contamination"] == 0.25
    assert out[3]["n_shingles"] == 4


def test_contamination_plan_broadcasts_eval_side(spark):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "doc_id long, text string"
    )
    plan = ngram_contamination(train, eval_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the 100 TB side is never re-partitioned


def test_pack_sequences_golden(spark):
    # one shard (ids all ≡ 1 mod 16 absent — use ids 0..3 with shards=1)
    from engine.extended.curation import pack_sequences

    df = spark.createDataFrame(
        [
            (0, "a b c"),        # 3 tokens, prev_cum 0  → seq 0
            (1, "d e"),          # 2 tokens, prev_cum 3  → seq 0
            (2, "f g h i"),      # 4 tokens, prev_cum 5  → seq 1 (floor(5/4))
            (3, "j"),            # 1 token,  prev_cum 9  → seq 2
        ],
        "doc_id long, text string",
    )
    out = {
        (r["shard"], r["seq_id"]): r.asDict()
        for r in pack_sequences(df, budget=4, shards=1).collect()
    }
    assert out[(0, 0)]["n_docs"] == 2 and out[(0, 0)]["n_tokens"] == 5
    assert out[(0, 1)]["n_docs"] == 1 and out[(0, 1)]["n_tokens"] == 4
    assert out[(0, 2)]["n_docs"] == 1 and out[(0, 2)]["n_tokens"] == 1


def test_pack_sequences_sharding_is_partition_local(spark):
    from engine.extended.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, "w " * 10) for i in range(40)], "doc_id long, text string"
    )
    plan = (
        pack_sequences(df, budget=16, shards=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the running sum must be a partitioned window, never a global one
    assert "windowspecdefinition(__shard" in plan


def test_mixture_sample_hits_target_proportions(spark):
    from engine.extended.sampling import mixture_sample

    rows = [(i, "s_big") for i in range(600)] + [
        (1000 + i, "s_small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = mixture_sample(
        df, {"s_big": 0.5, "s_small": 0.5}, group_col="source"
    )
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # s_small is the binding constraint: scale = 100/0.5 = 200 → 100 each
    assert counts == {"s_big": 100, "s_small": 100}


def test_mixture_sample_is_deterministic_and_drops_unlisted(spark):
    from engine.extended.sampling import mixture_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    k1 = sorted(r["doc_id"] for r in mixture_sample(df, {"a": 0.7, "b": 0.3}).collect())
    k2 = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(7), {"a": 0.7, "b": 0.3}
        ).collect()
    )
    assert k1 == k2  # row-order / partitioning invariant
    assert not any(i % 3 == 2 for i in k1)  # source 'c' dropped


def test_pack_sequences_conserves_docs_and_tokens(spark):
    # invariant: packing is a partition of the corpus — no doc or token is
    # lost or double-counted, for any budget/shard combination
    from engine.extended.curation import pack_sequences
    from engine.extended.text import token_count

    df = spark.createDataFrame(
        [(i, ("tok " * (1 + i % 17)).strip()) for i in range(200)],
        "doc_id long, text string",
    )
    expect_docs = df.count()
    expect_tokens = df.select(F.sum(token_count("text"))).collect()[0][0]
    for budget, shards in ((16, 4), (64, 1), (7, 32)):
        packed = pack_sequences(df, budget=budget, shards=shards)
        agg = packed.agg(
            F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
        ).collect()[0]
        assert (agg["d"], agg["t"]) == (expect_docs, expect_tokens), (budget, shards)


def test_mixture_sample_missing_target_group_yields_empty(spark):
    # a target group with zero corpus rows caps scale at 0: the contract is
    # an empty result, never a silently collapsed (100%-web) mixture
    from engine.extended.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "web") for i in range(50)], "doc_id long, source string"
    )
    out = mixture_sample(df, {"web": 0.6, "book": 0.4}, group_col="source")
    assert out.count() == 0


# ---------------------------------------------------------------------------
# script_count_exprs / code_detect_exprs (composition analysis)
# ---------------------------------------------------------------------------

from engine.extended.curation import code_detect_exprs
from engine.extended.text import script_count_exprs


def _one(spark, text, exprs_fn):
    df = spark.createDataFrame([(text,)], "text string")
    e = exprs_fn("text")
    return df.select(*[v.alias(k) for k, v in e.items()]).collect()[0].asDict()


def test_script_counts_mixed_text(spark):
    got = _one(spark, "abc Привет 北京 123 αβ", script_count_exprs)
    assert got["latin_chars"] == 3
    assert got["cyrillic_chars"] == 6
    assert got["cjk_chars"] == 2
    assert got["digit_chars"] == 3
    assert got["greek_chars"] == 2
    assert got["ws_chars"] == 4


def test_script_counts_survive_astral_chars(spark):
    """Emoji elsewhere in the text must not shift BMP class counts (the
    length-difference cancellation the module docstring promises)."""
    got = _one(spark, "ab\U0001F600cd", script_count_exprs)
    assert got["latin_chars"] == 4


def test_code_detect_flags_real_code_shapes(spark):
    code = "def f(x):\n    return x + 1\n\n    y = {1: 2};\n"
    got = _one(spark, code, code_detect_exprs)
    assert got["indented_lines"] == 2
    assert got["code_kw_hits"] == 2          # def, return
    assert got["is_code"] is True
    prose = "The quick brown fox jumps over the lazy dog. " * 5
    got2 = _one(spark, prose, code_detect_exprs)
    assert got2["is_code"] is False and got2["indented_lines"] == 0


def test_code_detect_counts_fences_and_cr_anchor_semantics(spark):
    """Fence count is per ``` triple; an indent after a bare \r (no \n)
    is NOT a line start — the explicit literal-\n anchor both engines
    share (fuzz ledger: Java (?m)^ matches after \r, RE2 does not)."""
    txt = "```python\nx = 1\n```\n    code here\r    not a line start"
    got = _one(spark, txt, code_detect_exprs)
    assert got["fence_blocks"] == 2
    assert got["indented_lines"] == 1


# ---------------------------------------------------------------------------
# compression_ratio
# ---------------------------------------------------------------------------

from engine.extended.curation import compression_ratio


def test_compression_ratio_separates_repetition_from_prose(spark):
    """Pure repetition compresses an order of magnitude below varied prose;
    null/empty yield NULL.  Golden values pin zlib-level-6 determinism."""
    import zlib

    rows = [
        (1, "spam " * 400),
        (2, "The quick brown fox jumps over the lazy dog; "
            "pack my box with five dozen liquor jugs. " * 10),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["ratio"]
        for r in df.select(
            "doc_id", compression_ratio("text").alias("ratio")
        ).collect()
    }
    for i in (1, 2):
        raw = rows[i - 1][1].encode()
        assert got[i] == round(len(zlib.compress(raw, 6)) / len(raw), 4)
    assert got[1] < 0.05 < got[2]
    assert got[3] is None and got[4] is None


def test_compression_ratio_runs_in_registry_query(spark):
    import queries as q

    out = q.SPARK_QUERIES["compression_quality"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    assert all(0 < r["avg_ratio"] <= 1.5 for r in out)


def test_compression_quality_golden_literals(spark):
    """VERDICT r8 #3: `compression_quality` is the registry's PERMANENT
    rows-only exception (no SQL engine exposes zlib), so its outputs are
    pinned as HARD-CODED literals — both the per-string byte counts and
    the full registry-query output at sf0.001.  A zlib version that
    compresses differently, an Arrow seam change, or a rounding drift
    all fail here instead of hiding behind the rows-only driver check."""
    import queries as q

    # exact zlib-level-6 byte counts for two fixed strings (literals, not
    # recomputed — this catches zlib library drift itself)
    df = spark.createDataFrame(
        [
            (1, "spam " * 400),
            (2, "The quick brown fox jumps over the lazy dog; "
                "pack my box with five dozen liquor jugs. " * 10),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["ratio"]
        for r in df.select(
            "doc_id", compression_ratio("text").alias("ratio")
        ).collect()
    }
    assert got[1] == round(28 / 2000, 4)   # 2000 raw → 28 compressed
    assert got[2] == round(89 / 860, 4)    # 860 raw → 89 compressed
    # the full registry-query output at sf0.001 (20 sources × 25 docs)
    out = sorted(
        (tuple(r) for r in q.SPARK_QUERIES["compression_quality"](
            spark, "/root/testdata/sf0.001").collect()),
        key=lambda r: r[0],
    )
    assert out == [
        ("src0", 25, 0.5417, 0), ("src1", 25, 0.5548, 0),
        ("src10", 25, 0.5751, 0), ("src11", 25, 0.5488, 0),
        ("src12", 25, 0.5253, 0), ("src13", 25, 0.5928, 0),
        ("src14", 25, 0.5206, 0), ("src15", 25, 0.5544, 0),
        ("src16", 25, 0.5538, 0), ("src17", 25, 0.5751, 0),
        ("src18", 25, 0.566, 0), ("src19", 25, 0.524, 0),
        ("src2", 25, 0.6029, 0), ("src3", 25, 0.5169, 0),
        ("src4", 25, 0.5608, 0), ("src5", 25, 0.5727, 0),
        ("src6", 25, 0.5239, 0), ("src7", 25, 0.6164, 0),
        ("src8", 25, 0.4992, 0), ("src9", 25, 0.5697, 0),
    ]


def test_vertical_tab_is_whitespace_in_both_counting_paths(spark):
    """Java \\s includes VT (0x0B); RE2's does not — both code paths now
    use explicit ASCII classes, so a VT neither starts an indented line's
    payload nor escapes the whitespace count (review finding, pinned
    against the DuckDB twin semantics)."""
    import duckdb

    txt = "a\x0bb\n    \x0bc"
    got = _one(spark, txt, code_detect_exprs)
    assert got["indented_lines"] == 0     # payload after indent is VT
    s = _one(spark, txt, script_count_exprs)
    assert s["ws_chars"] == 7             # 2 VT + \n + 4 indent spaces
    con = duckdb.connect()
    duck = con.execute(
        "SELECT length(?) - length(regexp_replace(?, '[ \\t\\n\\x0B\\f\\r]', '', 'g'))",
        [txt, txt],
    ).fetchone()[0]
    assert duck == 7                      # the oracle class agrees


def test_pii_dotted_phone_with_country_prefix(spark):
    """Review catch r9: the ip rule ran before phone and half-ate
    '1.555.123.4567' as an IP, leaving '<IP>7' with a leaked digit."""
    from engine.extended.curation import redact_pii

    df = spark.createDataFrame([("call 1.555.123.4567",)], "text string")
    out = df.select(redact_pii("text").alias("r")).collect()[0]["r"]
    assert "<PHONE>" in out
    assert "7" not in out.replace("<PHONE>", ""), out
    # plain IPv4s still redact as IPs
    df2 = spark.createDataFrame([("host 10.0.0.1 up",)], "text string")
    out2 = df2.select(redact_pii("text").alias("r")).collect()[0]["r"]
    assert out2 == "host <IP> up"


def test_code_detect_counts_deep_indents(spark):
    """Review catch r9: the indent regex required a non-space right after
    the 4-space/tab prefix, so depth>=2 lines (8 spaces, 2 tabs) never
    counted and class/method bodies classified as prose."""
    from engine.extended.curation import code_detect_exprs

    body = "def f():\n    if a:\n        return x\n\t\tdeep()\n"
    df = spark.createDataFrame([(0, body * 4)], "doc_id long, text string")
    r = df.select(
        *[c.alias(n) for n, c in code_detect_exprs("text").items()]
    ).collect()[0]
    # 3 of every 4 non-blank lines are indented (two of them deep)
    assert r["indented_lines"] == 12, r["indented_lines"]


def test_mixture_sample_binding_group_floor_boundary(spark):
    """r10 review: scale = min(n/w) is a double, so the BINDING group's own
    quota w*(n/w) sits exactly on the floor boundary — 0.6*(3/0.6) =
    2.9999999999999996 floored to 2 silently shorted the binding group one
    row.  The 1e-9 epsilon (temperature_mixture's discipline) keeps it."""
    from engine.extended.sampling import mixture_sample

    rows = [(i, "a") for i in range(3)] + [(100 + i, "b") for i in range(999)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = mixture_sample(df, {"a": 0.6, "b": 0.4}, group_col="source")
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # binding group a: scale = 3/0.6 = 5 -> quota 3 (ALL rows), b: floor(2)
    assert counts == {"a": 3, "b": 2}
