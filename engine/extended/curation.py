"""Corpus-curation operators a large-scale training-data pipeline needs:
PII redaction, repetition-based quality metrics (Gopher/C4-style), TF-IDF
term scoring, and benchmark-contamination measurement.

These extend the reference's PII posture (it bcrypt-obfuscates identifiers,
``lib/pipeline_controller.py:195-197``) to free-text scrubbing, and its
quality gating idea to the repetition heuristics used for LLM corpora.

Scale shape (the design point is 100 TB of `documents`):

- **PII redaction is pure codegen** — a chain of ``regexp_replace`` on the
  JVM row stream; no shuffle, no Python.
- **Repetition / TF-IDF / contamination are explode + two-level
  aggregates** — the shuffle carries (id, term, partial-count), never raw
  text, and map-side partial aggregation collapses each document's terms
  before the wire.  Contamination probes a broadcast benchmark-shingle set,
  so the 100 TB side is never re-partitioned.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.extended.text import ngrams_from, tokens

__all__ = [
    "code_detect_exprs",
    "compression_ratio",
    "CODE_KEYWORDS",
    "PII_PATTERNS",
    "redact_pii",
    "pii_counts",
    "repetition_metrics",
    "tfidf_top_terms",
    "ngram_contamination",
    "pack_sequences",
    "chunk_tokens",
    "contamination_attribution",
    "bigram_lm_scores",
    "trigram_lm_scores",
    "shrunk_group_rate",
    "URL_RE",
    "extract_urls",
    "url_domain",
    "MOJIBAKE_MAP",
    "fix_mojibake",
    "TRACKING_PARAM_RE",
    "canonical_url",
    "domain_blocklist_filter",
    "HTML_STRIP_STEPS",
    "HTML_ENTITIES",
    "html_to_text",
    "hashed_quality_score",
    "bloom_bit_words",
    "bloom_member",
    "bloom_contamination",
    "pmi_collocations",
]

#: (name, regex, replacement) applied IN ORDER.  Patterns are written in the
#: common subset of Java regex and RE2 (no lookaround, no \b) so the DuckDB
#: oracle can run the identical expressions.  Email runs first so an address
#: host is consumed before the IP rule sees it; SSN before phone so 3-2-4
#: hyphen groups stay SSN; phone BEFORE ip (review catch r9: the ip rule
#: half-ate dot-separated phones with a country-code prefix —
#: '1.555.123.4567' became '<IP>7', leaking a digit); replacement tokens
#: contain no digits, so later rules can never match inside an earlier
#: substitution.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace emails / IPv4s / SSNs / phone numbers with typed tokens.

    Sequential ``regexp_replace`` chain — stays inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(col: str) -> dict[str, Column]:
    """Per-kind match counts on the ORIGINAL text (counts are independent
    per pattern; an IP inside an email address counts for both — documented
    semantics, identical in the SQL twin)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0)))
        for name, pat, _ in PII_PATTERNS
    }


def repetition_metrics(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features per document:

    - ``dup_token_ratio``  = 1 − distinct/total tokens
    - ``top_token_ratio``  = occurrences of the most frequent token / total
    - ``top_bigram_ratio`` = occurrences of the most frequent bigram / total
      bigrams (null when the doc has < 2 tokens)

    Documents with zero tokens drop out (no repetition signal exists).

    ONE pass (r10; the previous form ran two explode→aggregate pipelines
    joined on id — two scans and two tokenizations of the corpus, which
    the reuse audit flagged and exchange reuse cannot fix because the
    subtrees genuinely differ): unigrams and bigrams explode together
    from a single tokenization, one (doc, unit) count collapses
    duplicates map-side, and one conditional aggregate produces both
    kinds' stats — no join, half the scans/tokenizes, 2 exchanges
    instead of 4.  No tag column rides the exchange: the token regex
    admits no spaces, so a unit IS a bigram iff it contains one
    (``instr(u, ' ')``).  A doc with < 2 tokens has no bigram rows, so
    its bigram aggregates are NULL (the old left join's semantics).
    Local wall is a wash (1.15 vs 1.23 s mid-2 at sf0.1 under load);
    the plan is adopted for the 100 TB term — the corpus scan+tokenize
    is the dominant cost there and this halves it.
    """
    # ONE exchange (r11 opt): repartitioning the raw docs by id up front
    # satisfies BOTH downstream groupings (hashpartitioning(id) clusters
    # (id, u) and (id) alike), so the unit-count and the stats aggregates
    # run exchange-free where the previous shape shuffled twice more
    # ((id, u) counts, then (id) partials).  It also spreads the
    # tokenize+explode map work across the cluster when the scan arrives
    # as fewer splits than cores (single-row-group files locally; one hot
    # input file at scale).  Shuffled bytes: the raw text once, instead of
    # the per-doc unit counts twice — strictly fewer.
    units = (
        df.select(F.col(id_col).alias("id"), F.col(text_col))
        .repartition(F.col("id"))
        .select("id", tokens(text_col).alias("__toks"))
        .select(
            "id",
            F.explode(
                F.concat(F.col("__toks"), ngrams_from(F.col("__toks"), 2))
            ).alias("u"),
        )
    )
    uc = units.groupBy("id", "u").agg(F.count(F.lit(1)).alias("c"))
    is_t = F.instr("u", " ") == 0
    stats = uc.groupBy("id").agg(
        F.sum(F.when(is_t, F.col("c"))).alias("n_tokens"),
        F.count(F.when(is_t, F.lit(1))).alias("n_distinct"),
        F.max(F.when(is_t, F.col("c"))).alias("top_c"),
        F.sum(F.when(~is_t, F.col("c"))).alias("n_bigrams"),
        F.max(F.when(~is_t, F.col("c"))).alias("top_bc"),
    )
    nt = F.col("n_tokens").cast("double")
    return stats.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.round(F.lit(1.0) - F.col("n_distinct") / nt, 4).alias(
            "dup_token_ratio"
        ),
        F.round(F.col("top_c") / nt, 4).alias("top_token_ratio"),
        F.round(
            F.col("top_bc") / F.col("n_bigrams").cast("double"), 4
        ).alias("top_bigram_ratio"),
    )


def tfidf_top_terms(
    df: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per ``group_col`` by TF-IDF.

    tf = term occurrences within the group; idf = ln((N+1)/(df+1)) with
    N = total documents, df = documents containing the term.  Ranking uses
    the ROUNDED score (ties → lexicographically-first term) so the result is
    stable across engines whose ``ln`` differs in the last ulp.

    PRECONDITION: each ``id_col`` value maps to exactly ONE ``group_col``
    value (df is derived from a shared (term, group, id) aggregate, so an
    id reused across groups — dirty input, id collisions across sources —
    counts once PER GROUP and silently inflates df, shifting idf).  If ids
    may repeat across groups, dedupe/namespace them first.

    Shape: one explode, a (group, term) aggregate, a term-level aggregate
    joined back, and a per-group top-k window — all partial-agg friendly;
    N is a broadcast scalar, not a driver-side collect.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.explode(tokens(text_col)).alias("term"),
    )
    # ONE tokenize/scan (r10 reuse-audit): tf and df both derive from a
    # shared (term, grp, id) count whose identical subtree AQE's stage
    # reuse evaluates once — the old form scanned + tokenized the corpus
    # separately for each.  A doc has ONE group, so (term, id) is unique
    # within g1 and count(*) per term IS the distinct-doc frequency.
    g1 = tok.groupBy("term", "grp", "id").agg(F.count(F.lit(1)).alias("__c"))
    tf = g1.groupBy("grp", "term").agg(F.sum("__c").cast("long").alias("tf"))
    # count(IF(__c > 0, 1)): __c is always ≥ 1, so this IS the group count —
    # but phrased so the optimizer cannot prune __c out of the df-side
    # aggregate (plain count(1)/count(__c) both rewrite to a function-less
    # distinct aggregate whose exchange no longer canonically matches the
    # tf side's, killing the stage reuse this shape exists for)
    dfreq = g1.groupBy("term").agg(
        F.count(F.when(F.col("__c") > 0, 1)).alias("df")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                4,
            ),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col), "term", "tf", "df", "tfidf", "rank"
        )
    )


def ngram_contamination(
    df: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: for each training document, the
    fraction of its DISTINCT word ``shingle_n``-grams that appear anywhere
    in the evaluation corpus.

    Returns (id, n_shingles, contamination) for documents with ≥ 1 shingle.
    The evaluation shingle set is deduplicated and broadcast — the training
    corpus is scanned once and never re-partitioned by shingle, so the probe
    survives a 100 TB training side as long as the benchmark set stays
    dimension-sized (it does: eval suites are millions of shingles, not
    billions).
    """
    eval_sh = (
        eval_df.select(tokens(text_col).alias("__toks"))
        .select(F.explode(ngrams_from(F.col("__toks"), shingle_n)).alias("sh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    doc_sh = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
    ).select(
        "id",
        F.explode(F.array_distinct(ngrams_from(F.col("__toks"), shingle_n))).alias(
            "sh"
        ),
    )
    return (
        doc_sh.join(F.broadcast(eval_sh), "sh", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("contamination"),
        )
        .withColumnRenamed("id", id_col)
    )


def ngram_novelty(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's DISTINCT
    word ``shingle_n``-grams whose corpus-wide FIRST occurrence (minimum
    document id) is this document — the marginal-contribution signal a
    curation pipeline uses to rank ingest feeds ("how much of this doc is
    new text vs recombination of what the corpus already has?").

    Returns (id, n_ngrams, n_novel, novelty) for documents with ≥ 1
    shingle; ``novelty`` is ``n_novel / n_ngrams`` rounded to 4 decimals.

    Scale shape: per-doc distinct shingles collapse to 60-bit md5
    fingerprints (:func:`engine.extended.dedup.md5_long`) BEFORE the wide
    exchange, so the shingle shuffle carries 8-byte keys instead of raw
    strings; first-owner resolution is a ``min`` window on that one
    fingerprint exchange (no self-join), then a per-doc aggregate — two
    shuffles total, both on bounded-width keys, no step ever holds more
    than one doc's shingle set in memory.
    """
    from pyspark.sql import Window

    from engine.extended.dedup import md5_long

    e = (
        df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks"))
        .select(
            "id",
            F.explode(
                F.array_distinct(ngrams_from(F.col("__toks"), shingle_n))
            ).alias("sh"),
        )
        .select("id", md5_long(F.col("sh")).alias("fp"))
    )
    w = Window.partitionBy("fp")
    firsts = e.withColumn("first_id", F.min("id").over(w))
    return (
        firsts.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("id") == F.col("first_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.round(F.col("n_novel") / F.col("n_ngrams").cast("double"), 4),
        )
        .withColumnRenamed("id", id_col)
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    shards: int = 16,
) -> DataFrame:
    """Streaming-concatenation sequence packing: documents are concatenated
    in id order and cut at ``budget``-token boundaries — each document lands
    in the training sequence where its first token falls
    (``seq = floor(preceding_cumulative_tokens / budget)``), the standard
    pre-training packing layout.

    Returns one row per (shard, seq_id): document count and token total.
    Sharding (``pmod(id, shards)``) keeps the running-sum window
    partition-local — a single global order would serialize the cumsum on
    one task; with shards the packing is deterministic per shard and all
    shards run in parallel, which is the only layout that survives 100 TB.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toked = df.select(
        F.col(id_col).alias(id_col),
        F.pmod(F.col(id_col), F.lit(shards)).alias("__shard"),
        F.size(tokens(text_col)).alias("__n_tok"),
    )
    binned = toked.withColumn(
        "seq_id",
        F.floor(
            F.coalesce(F.sum("__n_tok").over(w), F.lit(0)) / F.lit(budget)
        ),
    )
    return (
        binned.groupBy(F.col("__shard").alias("shard"), "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n_tok").alias("n_tokens"),
        )
    )


def chunk_tokens(
    df: DataFrame,
    *,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding token windows over each document: chunks of ``size`` tokens
    every ``stride`` tokens (stride < size ⇒ overlapping context windows —
    the RAG / long-context chunking layout; stride == size ⇒ disjoint).

    Returns (id, chunk_id, n_tokens, chunk_text).  Zero-token documents are
    dropped (no chunk to emit), and so are tail windows FULLY CONTAINED in
    their predecessor (review catch r9: with stride < size the last
    ceil(size/stride)−1 starts per doc emitted strict suffixes of the
    previous chunk — duplicate content in every RAG index built from
    this).  A start survives iff it is 0 or its predecessor did not
    already reach the document end (``start − stride + size < n``).
    Per-row compute only: tokenize ONCE behind
    an alias boundary (HOF lambdas get no CSE — see engine.extended.text),
    then explode the start offsets and slice.  No shuffle at all — the
    operator is a pure flatMap, so it pipelines into whatever follows.
    """
    if size <= 0 or stride <= 0:
        raise ValueError(f"chunk_tokens: need size > 0 and stride > 0, got"
                         f" size={size}, stride={stride}")
    toks = df.select(
        F.col(id_col),
        tokens(text_col).alias("__toks"),
    ).withColumn("__n", F.size("__toks"))
    starts = F.sequence(F.lit(0), F.col("__n") - 1, F.lit(int(stride)))
    return (
        toks.filter(F.col("__n") > 0)
        .select(F.col(id_col), F.col("__toks"), F.col("__n"),
                F.explode(starts).alias("__start"))
        .filter(
            (F.col("__start") == 0)
            | (F.col("__start") - stride + size < F.col("__n"))
        )
        .select(
            id_col,
            (F.col("__start") / stride).cast("int").alias("chunk_id"),
            F.size(F.slice("__toks", F.col("__start") + 1, F.lit(int(size)))).alias(
                "n_tokens"
            ),
            F.array_join(
                F.slice("__toks", F.col("__start") + 1, F.lit(int(size))), " "
            ).alias("chunk_text"),
        )
    )


def contamination_attribution(
    df: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 3,
) -> DataFrame:
    """Attribute benchmark leakage to its source: for each evaluation
    document, the top-``k`` training documents by count of shared DISTINCT
    word ``shingle_n``-grams (the follow-up question after
    :func:`ngram_contamination` flags an eval slice as leaked: *which*
    training docs carry the overlap).

    Returns (eval_id, train_id, n_shared, rank).  The eval shingle set is
    dimension-sized and broadcast with its ids; the training corpus streams
    through once — matches collapse map-side on (eval, train) before the
    single shuffle, and the per-eval top-k is a WindowGroupLimit heap.
    """
    from pyspark.sql import Window

    eval_sh = eval_df.select(
        F.col(id_col).alias("eval_id"), tokens(text_col).alias("__toks")
    ).select(
        "eval_id",
        F.explode(F.array_distinct(ngrams_from(F.col("__toks"), shingle_n))).alias("sh"),
    )
    train_sh = df.select(
        F.col(id_col).alias("train_id"), tokens(text_col).alias("__toks")
    ).select(
        "train_id",
        F.explode(F.array_distinct(ngrams_from(F.col("__toks"), shingle_n))).alias("sh"),
    )
    hits = (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    w = Window.partitionBy("eval_id").orderBy(
        F.col("n_shared").desc(), F.col("train_id")
    )
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("eval_id", "train_id", "n_shared", "rank")
    )


# ---------------------------------------------------------------------------
# Bigram language-model quality scoring (self-scored corpus LM)
# ---------------------------------------------------------------------------


def bigram_lm_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document average bigram log-probability under the corpus's OWN
    bigram model — the shape of KenLM-perplexity quality filtering
    (CCNet/RedPajama) with the model training fused into the same plan.

    ``P(w2 | w1) = c(w1 w2) / c(w1·)`` with ``c(w1·)`` = bigrams starting
    with w1 (so P sums to 1 per history, and self-scoring needs no
    smoothing: every scored bigram exists in the model).  Returns
    (doc_id, n_bigrams, avg_logp) — documents with FEWER THAN TWO tokens
    produce no bigrams and are ABSENT from the output (review note r9:
    composed gates that inner-join on this frame drop such docs without
    an explicit quality decision; left-join and decide if they must
    survive).  Boilerplate-heavy docs score high,
    unusual token sequences score low.

    Scale shape: bigram counts via one explode + groupBy with map-side
    partials (the shuffle carries distinct-bigram partials, not token
    volume); history counts derive from the COUNT TABLE, never a second
    corpus pass; scoring joins are hash joins on the bigram/history keys.

    ``carry_cols`` ride through the explode and the final per-doc group so
    a composed pipeline can keep e.g. ``source`` WITHOUT joining the
    scores back to the (possibly expensive) input subtree — each such join
    would re-evaluate that subtree once more.
    """
    # The tokenize+explode subtree is evaluated twice (model counts and
    # probe) — deliberate: a pre-deduped (doc, bigram, k) probe was measured
    # SLOWER (the occurrence-volume exchange it adds costs more than the
    # repeated scan saves, and Spark does not reuse the exchange across the
    # aggregate boundary).  At 100 TB, persist the bigram projection or
    # accept the second scan — both beat shuffling raw occurrence volume.
    carry = list(carry_cols or [])
    toks = df.select(
        F.col(id_col).alias(id_col), *carry, tokens(text_col).alias("__toks")
    )
    # Explicit isnotnull pair (r11 opt; the q15/dsir/trigram reuse
    # discipline): c2's aggregate exchange has TWO consumers — the probe
    # join (which infers isnotnull(bg) on its side) and c1 (whose __w1
    # join infers isnotnull(element_at(split(bg), 1)) and pushes it down
    # through both aggregates) — so the subtrees canonicalized differently
    # and AQE could not emit a ReusedExchange: the corpus was tokenized
    # and exploded a THIRD time just to rebuild c2 for c1 (reuse_audit: 3
    # identical documents scans).  Planting BOTH inferred predicates on
    # the shared frame makes every consumer's inference redundant; both
    # are semantics-free (a bigram is a non-null concat of regexp tokens,
    # and split() of a non-null string never yields a null first element),
    # and the final plan reuses c2's exchange — the third scan disappears.
    _w1 = F.element_at(F.split(F.col("bg"), " "), 1)
    bg = toks.select(
        id_col, *carry, F.explode(ngrams_from(F.col("__toks"), 2)).alias("bg")
    ).filter(F.col("bg").isNotNull() & _w1.isNotNull())
    c2 = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("__c2"))
    w1 = F.element_at(F.split(F.col("bg"), " "), 1)
    c1 = c2.groupBy(w1.alias("__w1")).agg(F.sum("__c2").alias("__c1"))
    scored = (
        bg.join(c2, "bg")
        .withColumn("__w1", w1)
        .join(c1, "__w1")
        .withColumn("__logp", F.log2(F.col("__c2") / F.col("__c1")))
    )
    return scored.groupBy(id_col, *carry).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__logp"), round_to).alias("avg_logp"),
    )


def trigram_lm_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    round_to: int = 4,
) -> DataFrame:
    """Per-document average log-probability under a Jelinek-Mercer
    interpolated trigram LM trained on the corpus itself:

    ``P(w3|w1w2) = λ3·c3(w1w2w3)/c3(w1w2·) + λ2·c2(w2w3)/c2(w2·) + λ1·c1(w3)/N``

    — the step up from :func:`bigram_lm_scores` toward the KenLM-class
    models CCNet/RedPajama filter with: trigram contexts dominate where
    observed, backed off through bigram and unigram mass so rare contexts
    are not scored solely by their own count.  All three component models
    normalize per history (each c·h is the SUM of its continuations), so
    every probability is a ratio of exact integers and the interpolation
    is one fixed-order double expression — engine-reproducible.

    Returns ``(id, n_trigrams, avg_logp)``; docs with <3 tokens have no
    trigrams and are ABSENT (same contract as the bigram scorer — left-join
    if they must survive a composed gate).

    Scale shape: three corpus passes (unigram/bigram/trigram explodes — the
    bigram scorer's measured trade: shuffling distinct-ngram partials beats
    pre-deduped occurrence-volume exchanges), then hash joins of trigram
    occurrences against the five COUNT tables (c3, c3-history, c2,
    c2-history, c1), each distinct-ngram sized.  N is a 1-row scalar
    (collected once, inlined as a literal — the bm25 stats pattern).
    """
    l3, l2, l1 = (float(x) for x in lambdas)
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    # every model table derives from an explicitly isnotnull-filtered shared
    # frame: the probe join INFERS isnotnull(key) on its side while the
    # aggregate side would not carry it, so without the explicit filter the
    # two subtrees canonicalize differently and AQE cannot reuse the
    # exchange (the q15/dsir_select bug class — reuse_audit flagged 6
    # identical scans here; with the filters the final plan reuses)
    tg = toks.select(
        id_col, F.explode(ngrams_from(F.col("__toks"), 3)).alias("tg")
    ).filter(F.col("tg").isNotNull())
    c3 = tg.groupBy("tg").agg(F.count(F.lit(1)).alias("__c3"))
    h2_of = lambda c: F.concat_ws(  # noqa: E731
        " ",
        F.element_at(F.split(c, " "), 1),
        F.element_at(F.split(c, " "), 2),
    )
    c3h = c3.groupBy(h2_of(F.col("tg")).alias("__h2")).agg(
        F.sum("__c3").alias("__c3h")
    )
    bg = toks.select(
        F.explode(ngrams_from(F.col("__toks"), 2)).alias("bg")
    ).filter(F.col("bg").isNotNull())
    c2 = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("__c2"))
    c2h = c2.groupBy(
        F.element_at(F.split(F.col("bg"), " "), 1).alias("__w2")
    ).agg(F.sum("__c2").alias("__c2h"))
    ug = toks.select(F.explode("__toks").alias("__w")).filter(
        F.col("__w").isNotNull()
    )
    c1 = ug.groupBy("__w").agg(F.count(F.lit(1)).alias("__c1"))
    # N = Σ c1 — derived from the count table, never a second corpus scan
    n_row = c1.agg(F.sum("__c1")).collect()[0][0]
    n_total = int(n_row or 0)
    if n_total == 0:
        return df.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_trigrams"),
            F.lit(None).cast("double").alias("avg_logp"),
        ).limit(0)
    parts = F.split(F.col("tg"), " ")
    scored = (
        tg.join(c3, "tg")
        .withColumn("__h2", h2_of(F.col("tg")))
        .join(c3h, "__h2")
        .withColumn(
            "__bg23",
            F.concat_ws(
                " ", F.element_at(parts, 2), F.element_at(parts, 3)
            ),
        )
        .join(c2.withColumnRenamed("bg", "__bg23"), "__bg23")
        .withColumn("__w2", F.element_at(parts, 2))
        .join(c2h, "__w2")
        .withColumn("__w", F.element_at(parts, 3))
        .join(c1, "__w")
        .withColumn(
            "__logp",
            F.log2(
                F.lit(l3) * (F.col("__c3") / F.col("__c3h"))
                + F.lit(l2) * (F.col("__c2") / F.col("__c2h"))
                + F.lit(l1) * (F.col("__c1") / F.lit(float(n_total)))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(F.avg("__logp"), round_to).alias("avg_logp"),
    )


def shrunk_group_rate(
    df: DataFrame,
    group_col: str,
    flag_col,
    *,
    m: int = 20,
    round_to: int = 4,
) -> DataFrame:
    """Empirical-Bayes shrinkage of a per-group binary rate toward the
    corpus rate: ``shrunk = (k_g + m·K/N) / (n_g + m)`` with prior
    strength ``m`` pseudo-documents — the domain-level quality signal
    (RefinedWeb/FineWeb-style source triage), where a 3-doc domain with
    3 keeps must NOT outrank a 500-doc domain with 480.

    Computed as the exact integer ratio ``(k_g·N + m·K) / ((n_g+m)·N)``:
    integer numerator and denominator, ONE rounded double division, so the
    ranking decision is engine-exact.  ``flag_col`` may be a 0/1 column
    name or Column expression.

    Scale shape: one groupBy on the group key (map-side partials collapse
    docs to one partial per group per task); the corpus totals derive from
    the per-group AGGREGATE (group-count sized, never a second corpus
    scan) and ride in as a 1-row broadcast cross join.
    """
    if m < 0:
        raise ValueError(f"prior strength m must be >= 0, got {m}")
    flag = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(flag.cast("long")).alias("n_flag"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("__N"), F.sum("n_flag").alias("__K")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "n_flag",
        F.round(F.col("n_flag") / F.col("n_docs"), round_to).alias("rate"),
        F.round(
            (F.col("n_flag") * F.col("__N") + F.lit(m) * F.col("__K"))
            / ((F.col("n_docs") + F.lit(m)) * F.col("__N")),
            round_to,
        ).alias("shrunk_rate"),
    )


# ---------------------------------------------------------------------------
# URL extraction / domain blocklist filtering
# ---------------------------------------------------------------------------

#: Java-regex ∩ RE2 subset (no lookaround, no \b) — the oracle runs the
#: identical pattern.  Scheme matching is case-insensitive (review catch
#: r9: 'HTTP://...' was invisible to extraction, stats, and the
#: blocklist even though canonical_url handles uppercase schemes).
URL_RE = r"(?i:https?)://[A-Za-z0-9.-]+(?:/[^\s]*)?"


def extract_urls(col: Column | str) -> Column:
    """Array of http(s) URLs found in the text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(URL_RE), F.lit(0))


def url_domain(col: Column | str) -> Column:
    """Host part of one URL string (empty string on non-URL input)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, "(?i:https?)://([A-Za-z0-9.-]+)", 1)


#: cp1252-mojibake repair table: the UTF-8 byte sequences of the most
#: common non-ASCII chars, mis-decoded as cp1252/latin-1 ("Ã©" for "é",
#: "â€™" for a curly apostrophe).  LITERAL replacements applied in order
#: (3-byte punctuation first — its prefix "â" must not be half-eaten by a
#: 2-byte rule), every pair printable in both engines, so the DuckDB twin
#: runs the identical REPLACE chain.  A general repair needs a real
#: re-encode (ftfy); this fixed table is the declarative 95% of it — the
#: same pragmatic pass Dolma/RedPajama-style cleaning applies.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("\u00e2\u20ac\u2122", "\u2019"),  # â€™ -> right single quote
    ("\u00e2\u20ac\u0153", "\u201c"),  # â€œ -> left double quote
    ("\u00e2\u20ac\u201c", "\u2013"),  # â€“ -> en dash
    ("\u00e2\u20ac\u201d", "\u2014"),  # â€” -> em dash
    ("\u00e2\u20ac\u00a6", "\u2026"),  # â€¦ -> ellipsis
    ("\u00e2\u201a\u00ac", "\u20ac"),  # â‚¬ -> euro sign
    ("\u00c3\u00a9", "\u00e9"),  # Ã© -> é
    ("\u00c3\u00a8", "\u00e8"),  # Ã¨ -> è
    ("\u00c3\u00aa", "\u00ea"),  # Ãª -> ê
    ("\u00c3\u00a1", "\u00e1"),  # Ã¡ -> á
    ("\u00c3\u00a0", "\u00e0"),  # Ã + nbsp -> à
    ("\u00c3\u00a2", "\u00e2"),  # Ã¢ -> â
    ("\u00c3\u00a4", "\u00e4"),  # Ã¤ -> ä
    ("\u00c3\u00a3", "\u00e3"),  # Ã£ -> ã
    ("\u00c3\u00ad", "\u00ed"),  # Ã­ -> í
    ("\u00c3\u00ae", "\u00ee"),  # Ã® -> î
    ("\u00c3\u00b3", "\u00f3"),  # Ã³ -> ó
    ("\u00c3\u00b4", "\u00f4"),  # Ã´ -> ô
    ("\u00c3\u00b6", "\u00f6"),  # Ã¶ -> ö
    ("\u00c3\u00b5", "\u00f5"),  # Ãµ -> õ
    ("\u00c3\u00ba", "\u00fa"),  # Ãº -> ú
    ("\u00c3\u00bb", "\u00fb"),  # Ã» -> û
    ("\u00c3\u00bc", "\u00fc"),  # Ã¼ -> ü
    ("\u00c3\u00b1", "\u00f1"),  # Ã± -> ñ
    ("\u00c3\u00a7", "\u00e7"),  # Ã§ -> ç
    ("\u00c2\u00ab", "\u00ab"),  # Â« -> «
    ("\u00c2\u00bb", "\u00bb"),  # Â» -> »
    ("\u00c2\u00b0", "\u00b0"),  # Â° -> °
    ("\u00c2\u00a0", "\u00a0"),  # Â + nbsp -> nbsp
]


def fix_mojibake(col: Column | str) -> Column:
    """Repair the :data:`MOJIBAKE_MAP` cp1252 double-encodings in one
    literal-replace chain — zero shuffles, whole-stage codegen, and
    idempotent on already-clean text (the repaired forms are never
    themselves map keys)."""
    c = F.col(col) if isinstance(col, str) else col
    for bad, good in MOJIBAKE_MAP:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c


TRACKING_PARAM_RE = r"(utm_[A-Za-z]+|fbclid|gclid|mc_cid|mc_eid)"


def canonical_url(col: Column | str) -> Column:
    """Canonical form of one URL string — the normalization pass BEFORE
    URL-level dedup (the C4/RefinedWeb crawl-frontier discipline: the same
    page arrives as ``HTTP://WWW.Site.com:80/a/?utm_source=x#top`` and
    ``http://site.com/a`` and must collapse to one key).

    Deterministic chain, defined BY the chain (Java-regex ∩ RE2 subset so
    the DuckDB oracle runs the identical patterns, with the ``'g'`` flag
    where DuckDB defaults to first-match).  Anchors are ``\\z`` — Java's
    ``$`` matches BEFORE a trailing newline where RE2's does not (engine
    divergence on unstripped crawl lines); the fragment strip is
    ``#[\\s\\S]*`` (to absolute end, no anchor needed):

    1. drop the fragment;
    2. strip tracking params (``utm_*``, ``fbclid``, ``gclid``,
       ``mc_cid``/``mc_eid``) INSIDE THE QUERY STRING ONLY (a literal
       ``&utm_x=`` in a path segment is legal per RFC 3986 and must not
       collapse distinct pages), repairing the separator;
    3. lowercase scheme and host (path/query case is significant and kept);
    4. drop a leading ``www.`` and the scheme's default port;
    5. trim trailing slashes.

    Non-URL input yields NULL (no scheme match).  Pure expression chain —
    zero shuffles, whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(c, r"#[\s\S]*", "")
    pre = F.regexp_extract(u, r"^([^?]*)", 1)
    qs = F.regexp_extract(u, r"^[^?]*(\?[\s\S]*)", 1)
    qs = F.regexp_replace(qs, r"&" + TRACKING_PARAM_RE + r"=[^&]*", "")
    qs = F.regexp_replace(qs, r"\?" + TRACKING_PARAM_RE + r"=[^&]*&", "?")
    qs = F.regexp_replace(qs, r"\?" + TRACKING_PARAM_RE + r"=[^&]*\z", "")
    u = F.concat(pre, qs)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80\z", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443\z", ""))
        .otherwise(host)
    )
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([\s\S]*)", 1)
    # trailing-slash trim applies to the PATH only (review catch r9: the
    # old whole-rest trim stripped slashes from the end of QUERY VALUES —
    # '?next=/' and '?next=' collapsed to one canonical key)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    q2 = F.regexp_extract(rest, r"^[^?]*([\s\S]*)", 1)
    rest = F.concat(F.regexp_replace(path, r"/+\z", ""), q2)
    return F.when(scheme != "", F.concat(scheme, F.lit("://"), host, rest))


def domain_blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
    broadcast_flagged: bool | None = None,
) -> DataFrame:
    """Drop documents containing ANY URL whose domain is blocklisted — the
    C4/RefinedWeb curation step.

    ``blocked`` is a 1-column domain table (dimension-sized at any corpus
    scale → always broadcast on the INNER flag join; the corpus is scanned
    once, URLs never leave their partition except as the per-doc verdict).

    The FLAGGED set, by contrast, scales with the corpus (every doc
    containing a blocked-domain URL), so the final anti-join strategy is a
    tri-state ``broadcast_flagged`` knob, same contract as
    :func:`engine.extended.semdedup.semantic_dedup`'s ``broadcast_drops``:
    ``True`` forces broadcast (clean corpora, rare hits), ``False`` forces a
    shuffled anti-join (spam-heavy corpora where the flag set is
    corpus-scale and a forced broadcast would OOM the driver), ``None``
    (default) leaves the choice to Catalyst/AQE, which sees the actual
    flagged size at runtime.
    """
    if id_col not in df.columns:
        raise ValueError(f"id_col {id_col!r} not in {df.columns}")

    def _canon_dom(c):
        # DNS names are case-insensitive and 'www.' is cosmetic — without
        # this normalization on BOTH sides, 'WWW.BadSite.com' trivially
        # bypassed the blocklist (review catch r9; the same rules
        # canonical_url already applies to dedup keys)
        return F.regexp_replace(F.lower(c), r"^www\.", "")

    doc_domains = df.select(
        id_col, F.explode_outer(extract_urls(text_col)).alias("__url")
    ).withColumn("__dom", _canon_dom(url_domain(F.col("__url"))))
    flagged = (
        doc_domains.join(
            F.broadcast(
                blocked.select(_canon_dom(F.col(domain_col)).alias("__dom"))
            ),
            "__dom",
        )
        .select(id_col)
        .distinct()
    )
    if broadcast_flagged is True:
        flagged = F.broadcast(flagged)
    elif broadcast_flagged is False:
        flagged = flagged.hint("shuffle_hash")
    return df.join(flagged, id_col, "left_anti")


# ---------------------------------------------------------------------------
# HTML → text extraction (the first stage of every web-scrape pipeline)
# ---------------------------------------------------------------------------

#: tag-strip passes applied IN ORDER; Java-regex ∩ RE2 subset ((?i) inline
#: flag, [\s\S] for DOTALL, non-greedy *?) so the DuckDB oracle runs the
#: identical patterns.  script/style bodies are payload, not prose, so their
#: CONTENT dies with the element; comments next (they may contain markup);
#: then any remaining tag.
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?i)<script[^>]*>[\s\S]*?</script\s*>", " "),
    (r"(?i)<style[^>]*>[\s\S]*?</style\s*>", " "),
    (r"<!--[\s\S]*?-->", " "),
    (r"<[^>]+>", " "),
]

#: literal entity decodes; ``&amp;`` LAST so ``&amp;lt;`` yields ``&lt;``
#: (the HTML5 double-escape rule), never ``<``.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(col: Column | str) -> Column:
    """Boilerplate-free prose from raw HTML: drop script/style bodies,
    comments and tags, decode the common literal entities, collapse
    whitespace.  Pure regexp/replace chain — zero shuffles, whole-stage
    codegen; the C4-style extraction pass before any quality filter.

    Literal U+00A0 normalizes to plain space (it IS whitespace in HTML
    rendering, same as the ``&nbsp;`` entity form), and the final edge
    strip is an explicit ASCII-space regexp rather than TRIM — engine
    TRIMs disagree on Unicode spaces (DuckDB strips U+00A0, the JVM does
    not; fuzz-found, seed 0)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_STRIP_STEPS:
        c = F.regexp_replace(c, pat, rep)
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.replace(c, F.lit("\xa0"), F.lit(" "))
    return F.regexp_replace(F.regexp_replace(c, r"\s+", " "), "^ +| +$", "")


# ---------------------------------------------------------------------------
# Hashed linear quality classifier (fastText-shape scoring)
# ---------------------------------------------------------------------------


def hashed_quality_score(
    text_col: Column,
    *,
    n_buckets: int = 4096,
    prefix: str = "q",
    hash_fn: str = "md5",
) -> dict[str, Column]:
    """fastText-style hashed bag-of-words linear score over an
    ALREADY-PROJECTED token-array column (see text.ngrams_from for why).

    Each token hashes to a weight bucket (dual-implementable md5_long — the
    classifier is oracle-checkable end to end); the bucket's weight is a
    deterministic integer in [-98, 98] derived from the bucket id, standing
    in for trained parameters (real deployments broadcast a weight table and
    map-join it; the OPERATOR SHAPE — hash, gather, mean, squash — is
    identical).  The per-doc sum stays integer (exact, order-independent),
    so the only float op is one final sigmoid on an exact value — no
    accumulation-order divergence between engines.

    Zero shuffles: transform + aggregate inside codegen, one scan.
    ``hash_fn='md5'`` (default) is the oracle-checkable family;
    ``'xxhash64'`` is the cheaper production hash (same contract as the
    signature operators in engine.extended.dedup).
    """
    from engine.extended.dedup import _hash64

    toks = text_col
    bucket = lambda t: F.pmod(  # noqa: E731
        _hash64(F.concat(F.lit(prefix + "|"), t), hash_fn), F.lit(n_buckets)
    )
    wsum = F.aggregate(
        F.transform(toks, lambda t: bucket(t) % 197 - 98),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )
    n = F.size(toks)
    raw = F.when(n > 0, wsum.cast("double") / (F.lit(98.0) * n)).otherwise(F.lit(0.0))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(4.0) * raw)), 4)
    # a token-free document carries NO quality evidence: its sigmoid(0)
    # score of exactly 0.5 classified every empty/non-tokenizable doc as
    # QUALITY under `>= 0.5` (review catch r9) — label it 0 explicitly
    return {
        "weight_sum": wsum,
        "quality_score": score,
        "quality_label": ((score >= 0.5) & (n > 0)).cast("int"),
    }


# ---------------------------------------------------------------------------
# Bloom-filter membership: constant-memory decontamination probe
# ---------------------------------------------------------------------------


def _bloom_validate(n_hashes: int, m_bits: int) -> None:
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")


def _bloom_positions(col: Column, n_hashes: int, m_bits: int, hash_fn: str) -> list[Column]:
    """Bit positions of a key: ``pmod(hash('bf{i}|' || key), m_bits)`` per
    hash index — the standard k-independent-hash construction, with the
    repo's pluggable hash family (md5 mode is dual-implementable, so the
    filter's exact bit pattern — false positives included — reproduces in
    the SQL oracle)."""
    from engine.extended.dedup import _hash64

    return [
        F.pmod(_hash64(F.concat(F.lit(f"bf{i}|"), col), hash_fn), F.lit(m_bits))
        for i in range(n_hashes)
    ]


def bloom_bit_words(
    keys: DataFrame,
    *,
    key_col: str = "sh",
    n_hashes: int = 3,
    m_bits: int = 16384,
    hash_fn: str = "md5",
) -> list[int]:
    """Build the Bloom bit array for a key set: returns ``m_bits / 64``
    signed-64 words (the driver-side representation :func:`bloom_member`
    embeds as a literal).

    Scale contract: the collect is the DISTINCT SET-BIT POSITIONS — bounded
    by ``m_bits`` regardless of key-set size, so a billion-key eval suite
    still collects at most ``m_bits`` small ints.  The filter itself is
    ``m_bits / 8`` bytes (2 KiB at the default 16384) versus the O(set)
    broadcast of :func:`ngram_contamination` — the trade is a tunable
    false-positive rate ``(1 - e^(-kn/m))^k``, which for decontamination
    means a few extra docs conservatively flagged, never a miss.
    """
    _bloom_validate(n_hashes, m_bits)
    pos = _bloom_positions(F.col(key_col), n_hashes, m_bits, hash_fn)
    # _spread: the per-key hashing runs in the scan stage and a small
    # key-set file arrives as one split (r11 opt); no-op at scale
    from engine.extended.dedup import _spread

    rows = (
        _spread(keys.filter(F.col(key_col).isNotNull()).select(key_col))
        .select(F.explode(F.array(*pos)).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r["p"])
        words[p // 64] |= 1 << (p % 64)
    # Python ints are unbounded; fold bit 63 back into signed-64 range so
    # each word round-trips through a Spark LongType literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_member(
    col: Column | str,
    words: list[int],
    *,
    n_hashes: int = 3,
    m_bits: int = 16384,
    hash_fn: str = "md5",
) -> Column:
    """Boolean membership probe against a built filter: true iff ALL
    ``n_hashes`` bit positions of the key are set.

    Pure codegen (hash → element_at on the literal word array → mask test);
    no join, no shuffle, no Python — the probe side of a 100 TB
    decontamination pass is a bare scan.  Bit masks come from a 64-entry
    power-of-two literal because the Python API's shift functions take only
    literal shift amounts.  NULL keys probe NULL (never a crash).
    """
    _bloom_validate(n_hashes, m_bits)
    if len(words) != m_bits // 64:
        raise ValueError(f"words has {len(words)} entries, want {m_bits // 64}")
    c = F.col(col) if isinstance(col, str) else col
    # ONE F.expr string per literal array (r11 opt): the Column-tree form
    # cost m_bits/64 + 64 py4j round trips per probe build — the r10
    # driver-side expression BUILD class (see sign_band_structs)
    words_lit = F.expr(
        "array(" + ", ".join(f"{int(w)}L" for w in words) + ")"
    )
    pow2 = [1 << b for b in range(63)] + [-(1 << 63)]
    pow2_lit = F.expr(
        "array(" + ", ".join(f"{int(v)}L" for v in pow2) + ")"
    )
    cond = None
    for p in _bloom_positions(c, n_hashes, m_bits, hash_fn):
        word = F.element_at(words_lit, F.floor(p / 64).cast("int") + 1)
        mask = F.element_at(pow2_lit, F.pmod(p, F.lit(64)).cast("int") + 1)
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else cond & hit
    # explicit NULL gate: a NULL key must probe NULL, and the element_at
    # fold does not reliably propagate a NULL index through the mask test
    return F.when(c.isNotNull(), cond)


def bloom_contamination(
    df: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 3,
    m_bits: int = 16384,
    hash_fn: str = "md5",
) -> DataFrame:
    """Constant-memory variant of :func:`ngram_contamination`: the eval
    corpus's shingle set becomes a Bloom filter, and each training doc
    counts how many of its distinct shingles the filter flags.

    Returns (id, n_shingles, n_flagged, bloom_rate).  ``bloom_rate`` is an
    UPPER BOUND on the true contamination (false positives inflate it, set
    by ``m_bits``; false negatives cannot occur), which is the safe
    direction for decontamination — conservatively quarantine, then
    exact-check the flagged slice if needed.

    Scale shape: building the filter aggregates eval shingles down to
    ≤ ``m_bits`` bit positions (one distinct-aggregate, driver-bounded by
    construction); the training scan is shingle → 3 hashes → bit tests —
    ZERO joins, so nothing about the eval set's size ever touches the
    training side's plan.
    """
    eval_sh = eval_df.select(tokens(text_col).alias("__toks")).select(
        F.explode(ngrams_from(F.col("__toks"), shingle_n)).alias("sh")
    )
    words = bloom_bit_words(
        eval_sh, key_col="sh", n_hashes=n_hashes, m_bits=m_bits, hash_fn=hash_fn
    )
    doc_sh = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
    ).select(
        "id",
        F.explode(F.array_distinct(ngrams_from(F.col("__toks"), shingle_n))).alias("sh"),
    )
    flagged = bloom_member(
        "sh", words, n_hashes=n_hashes, m_bits=m_bits, hash_fn=hash_fn
    ).cast("int")
    return (
        doc_sh.select("id", flagged.alias("__hit"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("__hit").alias("n_flagged"),
            F.round(
                F.sum("__hit") / F.count(F.lit(1)).cast("double"), 4
            ).alias("bloom_rate"),
        )
        .withColumnRenamed("id", id_col)
    )


def pmi_collocations(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Collocation mining: the ``k`` adjacent token pairs with the highest
    pointwise mutual information — ``ln(p(a,b) / (p(a)·p(b)))`` over corpus
    unigram/bigram frequencies.  The phrase-discovery pass that seeds
    multi-word vocabulary entries and n-gram merge candidates.

    ``min_count`` floors the bigram count (PMI is noise for rare pairs);
    ranking uses the ROUNDED score with (a, b) tie-breaks, the same
    ulp-stability discipline as tfidf_top_terms.

    Shape: two explode→aggregate pipelines (unigrams, adjacent bigrams),
    both map-side partial-aggregated; totals are 1-row broadcast cross
    joins; the bigram table joins the vocabulary-sized unigram table
    twice on the token key.  Nothing corpus-sized crosses the wire after
    the first aggregates.
    """
    toklist = df.select(tokens(text_col).alias("__toks"))
    uni = toklist.select(F.explode("__toks").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("uc"))
    un = ucnt.agg(F.sum("uc").alias("n"))
    # guard: sequence(1, 0) is DESCENDING in Spark (the BPE pair-count
    # trap) — docs with < 2 tokens have no bigrams
    idx = F.when(
        F.size("__toks") >= 2, F.sequence(F.lit(1), F.size("__toks") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bi = toklist.select("__toks", F.explode(idx).alias("i")).select(
        F.element_at("__toks", F.col("i")).alias("a"),
        F.element_at("__toks", F.col("i") + 1).alias("b"),
    )
    bcnt = bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("pair_count"))
    bn = bcnt.agg(F.sum("pair_count").alias("m"))
    ua = ucnt.select(F.col("w").alias("a"), F.col("uc").alias("ca"))
    ub = ucnt.select(F.col("w").alias("b"), F.col("uc").alias("cb"))
    pmi = F.round(
        F.log(
            (F.col("pair_count") * F.lit(1.0) / F.col("m"))
            / (
                (F.col("ca") * F.lit(1.0) / F.col("n"))
                * (F.col("cb") * F.lit(1.0) / F.col("n"))
            )
        ),
        4,
    )
    return (
        bcnt.filter(F.col("pair_count") >= min_count)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(un))
        .crossJoin(F.broadcast(bn))
        .select("a", "b", "pair_count", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "a", "b")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Code detection (corpus-composition heuristic)
# ---------------------------------------------------------------------------

#: ASCII identifier keywords counted by :func:`code_detect_exprs`.  \b is
#: the ASCII word boundary in BOTH engines (Java's default \w and RE2's \w
#: are ASCII), so the hit counts are engine-invariant.
CODE_KEYWORDS = (
    "def|function|return|import|const|class|void|public|static|lambda"
)


def code_detect_exprs(col: str) -> dict[str, Column]:
    """Per-document code-likeness signals — the composition heuristic that
    tells a curation pipeline how much of a web corpus is source code
    (to route it, weight it, or drop it):

    - ``n_lines`` / ``indented_lines`` (4-space or tab indent, the
      layout signature of code blocks),
    - ``brace_chars`` (``{ } ; = < >`` density feeds the flag),
    - ``fence_blocks`` (markdown ``` fences, counted by literal replace),
    - ``code_kw_hits`` (ASCII keyword matches),
    - ``is_code`` — the combined flag, thresholded on ROUNDED ratios with
      ASCII-only denominators so the decision is engine-exact.

    Everything is exact integer counting (length differences, literal
    replaces, regexp match counts) — zero shuffle, pure codegen.
    """
    c = F.col(col)
    n_lines = (
        F.length(c) - F.length(F.regexp_replace(c, "\n", "")) + 1
    ).cast("long")
    # explicit (?:^|\n) line anchor, never (?m): Java's multiline ^ also
    # matches after \r and Unicode line separators where RE2's only
    # matches after \n (fuzz-found divergence) — a literal-\n anchor is
    # the same operation in both engines
    # explicit ASCII class, not \S: Java's \s includes vertical tab
    # (0x0B) where RE2's does not, so \S disagrees on VT (review-found,
    # DuckDB-verified) — the negated literal set is identical in both
    indented = F.size(
        F.regexp_extract_all(
            c, F.lit("(?:^|\n)(?:    |\t)[ \t]*[^ \t\n\x0B\f\r]"), F.lit(0)
        )
    ).cast("long")
    braces = (
        F.length(c) - F.length(F.regexp_replace(c, "[{};=<>]", ""))
    ).cast("long")
    fences = (
        (F.length(c) - F.length(F.replace(c, F.lit("```"), F.lit("")))) / 3
    ).cast("long")
    kw = F.size(
        F.regexp_extract_all(c, F.lit(rf"\b(?:{CODE_KEYWORDS})\b"), F.lit(0))
    ).cast("long")
    ascii_len = F.length(F.regexp_replace(c, "[^ -~]", ""))
    indent_ratio = F.round(
        indented / F.greatest(n_lines, F.lit(1)).cast("double"), 4
    )
    brace_density = F.round(
        braces / F.greatest(ascii_len, F.lit(1)).cast("double"), 4
    )
    is_code = (
        (fences > 0)
        | (indent_ratio >= 0.25)
        | (brace_density >= 0.02)
        | (kw >= 3)
    )
    return {
        "n_lines": n_lines,
        "indented_lines": indented,
        "brace_chars": braces,
        "fence_blocks": fences,
        "code_kw_hits": kw,
        "indent_ratio": indent_ratio,
        "brace_density": brace_density,
        "is_code": is_code,
    }


# ---------------------------------------------------------------------------
# Compression-ratio quality signal
# ---------------------------------------------------------------------------


def compression_ratio(col: str, *, level: int = 6) -> Column:
    """zlib-compressed size over raw UTF-8 size — the classic
    repetitiveness proxy (boilerplate and templated spam compress far
    below natural prose; random noise compresses above it) used alongside
    the Gopher repetition metrics when a cheap single-number signal is
    enough.

    An Arrow ``pandas_udf`` (the repo's only sanctioned Python seam —
    batch-vectorized, never row-at-a-time): zlib at a FIXED level is
    deterministic bytes-for-bytes, so the ratio is reproducible across
    runs and machines; it is still a UDF, so the operator is rows-only
    in the oracle harness and pinned by golden tests instead.  NULL and
    empty text yield NULL.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(s: pd.Series) -> pd.Series:
        def one(txt):
            if txt is None:
                return None
            raw = txt.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), 4)

        return s.map(one)

    return ratio(F.col(col))
