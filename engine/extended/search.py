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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.extended.dedup import cosine
from engine.extended.text import tokens

__all__ = ["tfidf_scores", "hybrid_topk"]


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

    n_docs = docs.count()
    dfs = {}
    df_row = docs.agg(
        *[
            F.count(F.when(F.array_contains(tokens("text"), term), 1)).alias(term)
            for term in query_terms
        ]
    ).collect()[0]
    for term in query_terms:
        dfs[term] = df_row[term]

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
