"""Hybrid lexical + vector retrieval (north-star composition operator).

Retrieval over a corpus that has both text and an embedding column:

- :func:`tfidf_scores` — query-term lexical scores with corpus-level IDF
  (the BM25-family shape: per-term tf saturation × idf, summed over query
  terms).  Two scans: one tiny aggregate for document frequencies (broadcast
  as literals), one scoring scan — no shuffle of the corpus itself.
- :func:`hybrid_topk` — weighted fusion of the lexical score and cosine
  similarity to a query vector, exact top-k.  Everything is expression-level
  (codegen), deterministic, and rounding-stable for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from engine.extended.dedup import cosine
from engine.extended.text import tokens

__all__ = ["tfidf_scores", "bm25_scores", "hybrid_topk", "rrf_fuse_topk", "inverted_postings", "phrase_match_counts"]


def _term_tf(toks: Column, term: str) -> Column:
    """term frequency of one query term in a pre-projected token array."""
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def tfidf_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    k1: float = 1.2,
    round_to: int = 4,
) -> DataFrame:
    """(id, lex_score): sum over query terms of idf(term) · tf/(tf+k1).

    idf = ln((N+1)/(df+1)); document frequencies are computed once and
    inlined as literals (they are per-query scalars — the 100 TB analogue is
    a broadcast stats table refreshed with the corpus).
    tf/(tf+k1) is the BM25 saturation without length normalization —
    deterministic and oracle-friendly.
    """
    import math

    # ONE stats scan (r10 review): the previous form paid a separate
    # count() pass for N AND re-ran tokens("text") per term inside the
    # df aggregate (HOFs get no CSE — len(terms)× the regex per row, the
    # same 12× trap bm25_scores already avoids).  Tokenize once behind an
    # alias boundary and fold N into the same aggregate.
    stats = (
        docs.select(tokens("text").alias("__toks"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.count(F.when(F.array_contains("__toks", term), 1)).alias(
                    f"__df_{i}"
                )
                for i, term in enumerate(query_terms)
            ],
        )
        .collect()[0]
    )
    n_docs = stats["__n"]
    dfs = {
        term: stats[f"__df_{i}"] for i, term in enumerate(query_terms)
    }

    # tokenize ONCE behind an alias boundary — the per-term tf filters then
    # reference the array instead of re-running the regex per term
    toked = docs.select(F.col(id_col), tokens("text").alias("__toks"))
    score = None
    for term in query_terms:
        idf = math.log((n_docs + 1) / (dfs[term] + 1))
        tf = _term_tf(F.col("__toks"), term).cast("double")
        part = F.lit(idf) * (tf / (tf + F.lit(k1)))
        score = part if score is None else score + part
    return toked.select(
        F.col(id_col), F.round(score, round_to).alias("lex_score")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """(id, bm25): full Okapi BM25 with document-length normalization.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), with the
    Lucene-style non-negative idf = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Corpus statistics (N, avgdl, per-term df) come from ONE combined
    aggregate scan and are inlined as literals — per-query scalars, the
    100 TB analogue being a broadcast stats table refreshed with the corpus.
    The scoring pass is then a single codegen scan: tokenize once behind an
    alias boundary, per-term tf as array filters — no corpus shuffle at all.
    """
    import math

    # tokenize ONCE behind an alias boundary — higher-order expressions are
    # not CSE'd, so aggregating over tokens("text") per stat would re-run
    # the regex 2+len(terms) times per row
    stats = (
        docs.select(tokens("text").alias("__toks"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.avg(F.size("__toks")).alias("__avgdl"),
            *[
                F.count(F.when(F.array_contains("__toks", term), 1)).alias(
                    f"__df_{i}"
                )
                for i, term in enumerate(query_terms)
            ],
        )
        .collect()[0]
    )
    n_docs, avgdl = stats["__n"], float(stats["__avgdl"])

    toked = docs.select(F.col(id_col), tokens("text").alias("__toks"))
    dl = F.size("__toks").cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    score = None
    for i, term in enumerate(query_terms):
        df_t = stats[f"__df_{i}"]
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        tf = _term_tf(F.col("__toks"), term).cast("double")
        part = F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    return toked.select(F.col(id_col), F.round(score, round_to).alias("bm25"))


def hybrid_topk(
    docs: DataFrame,
    vectors: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    *,
    k: int = 10,
    alpha: float = 1.0,
    doc_id: str = "doc_id",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Top-k by ``alpha·lex_score + vec_score`` (ids joined 1:1).

    The default alpha=1.0 (plain sum) avoids systematic round-half
    boundaries that 0.5-weighting of two rounded scores creates; the ranking
    is scale-invariant in the weights' ratio anyway.

    The lexical and vector sides each stay single-scan; the fusion is one
    broadcast-joinable id equi-join.  Ties break by id for determinism.
    """
    lex = tfidf_scores(docs, query_terms, id_col=doc_id)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = vectors.select(
        F.col(vec_id).alias(doc_id),
        F.round(cosine(F.col(vec_col), q), round_to).alias("vec_score"),
    )
    fused = lex.join(vec, on=doc_id).select(
        doc_id,
        "lex_score",
        "vec_score",
        F.round(
            F.lit(alpha) * F.col("lex_score") + F.col("vec_score"), round_to
        ).alias("score"),
    )
    return fused.orderBy(F.col("score").desc_nulls_last(), F.col(doc_id)).limit(k)


def rrf_fuse_topk(
    docs: DataFrame,
    vectors: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    *,
    k: int = 10,
    rrf_k: int = 60,
    n_candidates: int = 100,
    doc_id: str = "doc_id",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) of the BM25 and
    cosine candidate lists: ``rrf = Σ_lists 1/(rrf_k + rank)``, absent-from-
    a-list docs simply lacking that list's contribution — the score-scale-
    free fusion used when the lexical and vector scores are incomparable
    (:func:`hybrid_topk` is the score-sum sibling for calibrated scores).

    Scale shape: each side reduces to ``n_candidates`` rows via
    TakeOrderedAndProject (never a global sort), so the rank windows and
    the full-outer fusion join run on ≤2·n_candidates rows — one tiny
    single-partition stage regardless of corpus size.  Ranks order by the
    ROUNDED side score with id tie-break, and 1/(rrf_k+rank) is an exact
    IEEE division of small integers, so the fusion is engine-exact.
    """
    def ranked_top(scored: DataFrame, score_col: str, rank_name: str) -> DataFrame:
        # TakeOrderedAndProject to n_candidates, then rank the survivors
        # (a ≤n_candidates-row single-partition window, by construction)
        order = [F.col(score_col).desc_nulls_last(), F.col(doc_id)]
        return (
            scored.orderBy(*order)
            .limit(n_candidates)
            .select(
                F.col(doc_id),
                F.row_number().over(Window.orderBy(*order)).alias(rank_name),
            )
        )

    lex = ranked_top(
        bm25_scores(docs, query_terms, id_col=doc_id, round_to=round_to),
        "bm25",
        "lex_rank",
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = ranked_top(
        vectors.filter(F.col(vec_col).isNotNull()).select(
            F.col(vec_id).alias(doc_id),
            F.round(cosine(F.col(vec_col), q), round_to).alias("__cos"),
        ),
        "__cos",
        "vec_rank",
    )
    fused = lex.join(vec, on=doc_id, how="full_outer").select(
        doc_id,
        "lex_rank",
        "vec_rank",
        F.round(
            F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(
        F.col("rrf_score").desc_nulls_last(), F.col(doc_id)
    ).limit(k)


def inverted_postings(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional postings ``(id, pos, token)`` — the inverted-index build
    (0-based positions, the engine's standard tokenizer).  One explode; at
    scale this is written bucketed by ``token`` so term lookups prune."""
    return df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "token")
    )


def phrase_match_counts(
    df: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase occurrence counts per document via positional-postings
    intersection — ``(id, n_matches)``, overlapping occurrences counted
    (start positions), docs without a match absent.

    The phrase is tokenized with the SAME rule as the corpus; a start
    position matches when term *i* of the phrase appears at ``pos + i``
    for every *i* — the classic positional-index AND, expressed as a chain
    of semi-joins on ``(id, shifted pos)``.  Scale shape: the postings are
    FILTERED to the phrase's terms before any join (term-selective — the
    scan prunes on the token predicate), every join keys on (id, pos) so
    the per-term slices co-partition, and semi-join semantics keep the
    base side's cardinality monotonically shrinking.  Never a per-doc
    Python loop; never a regex over the raw text (that would re-scan every
    byte per query instead of reusing the index shape).
    """
    import re as _re

    from engine.extended.text import _TOKEN_RE

    # the phrase MUST tokenize with the corpus tokenizer's own pattern —
    # a second inline copy would silently desynchronize from _TOKEN_RE
    # edits and make every phrase return 0 matches (review catch)
    terms = [w.lower() for w in _re.findall(_TOKEN_RE, phrase)]
    if not terms:
        raise ValueError(f"phrase has no tokens: {phrase!r}")
    post = inverted_postings(df, id_col=id_col, text_col=text_col)
    match = post.filter(F.col("token") == terms[0]).select(id_col, "pos")
    for i, term in enumerate(terms[1:], start=1):
        ti = post.filter(F.col("token") == term).select(
            F.col(id_col), (F.col("pos") - i).alias("pos")
        )
        match = match.join(ti, [id_col, "pos"], "left_semi")
    return match.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_matches"))
