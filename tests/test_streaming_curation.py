"""Composed STREAMING curation pipeline end-to-end: the round-3 curation
operators (HTML extraction, hashed quality classifier, fingerprint dedup)
driven through Structured Streaming — proving the same expressions run
unchanged under readStream + stateful dedup + foreachBatch, the way a
continuously-ingesting corpus would consume them."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_curation_pipeline(spark, tmp_path):
    from engine.extended.curation import hashed_quality_score, html_to_text
    from engine.extended.text import fingerprint, tokens
    from engine.streaming.incremental import run_available_now
    from engine.streaming.windows import stream_dedup

    src_dir = str(tmp_path / "in")
    # two micro-batch files; doc 2 is an exact near-duplicate of doc 1
    # (same fingerprint after tag strip), doc 4 arrives in a later file
    batch1 = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "<p>alpha beta gamma</p>"),
            (2, "2024-01-01 00:05:00", "<div>alpha   beta GAMMA!</div>"),
            (3, "2024-01-01 00:10:00", "<script>x</script><p>delta only</p>"),
        ],
        "doc_id long, ts_s string, html string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    batch2 = spark.createDataFrame(
        [(4, "2024-01-01 00:20:00", "<p>epsilon zeta</p>")],
        "doc_id long, ts_s string, html string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    batch1.write.mode("overwrite").parquet(src_dir)
    batch2.write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(
            "doc_id long, ts_s string, html string, ts timestamp"
        ).parquet(src_dir)
    )
    cleaned = stream.select(
        "doc_id", "ts", html_to_text("html").alias("text")
    ).withColumn("fp", fingerprint("text"))
    deduped = stream_dedup(cleaned, ["fp"], "ts")

    seen: list = []

    def transform(df):
        toked = df.select("doc_id", "fp", tokens("text").alias("__toks"))
        scores = hashed_quality_score(F.col("__toks"))
        return toked.select("doc_id", "fp", scores["quality_score"].alias("q"))

    def sink(df, batch_id):
        seen.extend(df.collect())

    run_available_now(
        deduped,
        transform,
        sink,
        str(tmp_path / "ckpt"),
        query_name="curation-stream-test",
    )

    by_id = {r["doc_id"]: r for r in seen}
    # docs 1 and 2 share a casefolded-alnum fingerprint after tag strip:
    # exactly ONE survives (dropDuplicatesWithinWatermark keeps whichever
    # the stream processed first — arrival order, not id order)
    assert len(by_id) == 3
    assert {3, 4} <= set(by_id)
    assert len(set(by_id) & {1, 2}) == 1
    survivor = (set(by_id) & {1, 2}).pop()
    assert 0.0 <= by_id[survivor]["q"] <= 1.0
    fps = [r["fp"] for r in seen]
    assert len(fps) == len(set(fps))  # one row per distinct fingerprint


def test_streaming_curation_with_url_and_mojibake_normalization(spark, tmp_path):
    """Round-4 stateless curation ops composed INTO the stream: mojibake
    repair runs before extraction/fingerprinting (so a cp1252-garbled copy
    of a clean doc dedups against it), and canonical_url keys the stream by
    normalized source URL — both pure expression chains, unchanged under
    readStream."""
    from engine.extended.curation import canonical_url, fix_mojibake, html_to_text
    from engine.extended.text import fingerprint
    from engine.streaming.incremental import run_available_now
    from engine.streaming.windows import stream_dedup

    src_dir = str(tmp_path / "in")
    rows = [
        # doc 11: clean; doc 12: SAME text mojibake-garbled + messy URL
        # variant of the same page -> must dedup onto one survivor
        (11, "2024-01-01 00:00:00", "<p>café déjà vu</p>",
         "http://site.com/a"),
        (12, "2024-01-01 00:05:00", "<p>cafÃ© dÃ©jÃ  vu</p>",
         "HTTP://WWW.Site.com:80/a/?utm_source=x#f"),
        (13, "2024-01-01 00:10:00", "<p>other page</p>",
         "https://other.org/b"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, ts_s string, html string, url string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(src_dir)

    stream = spark.readStream.schema(
        "doc_id long, ts_s string, html string, url string, ts timestamp"
    ).parquet(src_dir)
    cleaned = stream.select(
        "doc_id",
        "ts",
        html_to_text(fix_mojibake("html")).alias("text"),
        canonical_url("url").alias("canon_url"),
    ).withColumn("fp", fingerprint("text"))
    deduped = stream_dedup(cleaned, ["fp"], "ts")

    seen: list = []
    run_available_now(
        deduped,
        lambda df: df.select("doc_id", "canon_url", "fp"),
        lambda df, bid: seen.extend(df.collect()),
        str(tmp_path / "ckpt2"),
        query_name="curation-stream-r4-test",
    )

    by_id = {r["doc_id"]: r for r in seen}
    assert len(by_id) == 2 and 13 in by_id
    survivor = (set(by_id) & {11, 12}).pop()
    # both variants canonicalize to the same URL key
    assert by_id[survivor]["canon_url"] == "http://site.com/a"


def test_streaming_bloom_decontamination_gate(spark, tmp_path):
    """The Bloom probe as a STREAMING ingest gate: the filter is built once
    from the (static) eval corpus and applied per micro-batch as a pure
    expression — a contaminated doc (shares its shingles with the eval set)
    is dropped in-stream, clean docs pass.  No joins, no state: the gate
    costs the same whether the eval suite has 10^2 or 10^9 shingles."""
    from engine.extended.curation import bloom_bit_words, bloom_member
    from engine.extended.text import ngrams_from, tokens
    from engine.streaming.incremental import run_available_now

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    eval_sh = eval_df.select(tokens("text").alias("__toks")).select(
        F.explode(ngrams_from(F.col("__toks"), 3)).alias("sh")
    )
    words = bloom_bit_words(eval_sh, key_col="sh")

    src_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00",
             "report the quick brown fox jumps over everything"),  # contaminated
            (2, "2024-01-01 00:05:00", "entirely unrelated corpus content here"),
        ],
        "doc_id long, ts_s string, text string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(src_dir)

    stream = spark.readStream.schema(
        "doc_id long, ts_s string, text string, ts timestamp"
    ).parquet(src_dir)
    toked = stream.select("doc_id", "ts", tokens("text").alias("__toks"))
    # per-ROW gate: ANY shingle hitting the filter marks the doc — a
    # stateless exists() over the shingle array, no aggregation, no state
    contaminated = F.exists(
        ngrams_from(F.col("__toks"), 3), lambda sh: bloom_member(sh, words)
    )
    gated = toked.select("doc_id", "ts", contaminated.alias("hit"))

    seen: list = []
    run_available_now(
        gated,
        lambda df: df.filter(~F.col("hit")).select("doc_id"),
        lambda df, bid: seen.extend(df.collect()),
        str(tmp_path / "ckpt3"),
        query_name="bloom-stream-test",
    )
    assert {r["doc_id"] for r in seen} == {2}
