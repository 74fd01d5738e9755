"""Deterministic sampling/sharding, SemDeDup, BPE, selection, profile/stats families.

Split out of the flat queries.py (VERDICT r6 #8); all entries register
into the shared ``queries._base.SPARK_QUERIES`` / ``ORACLE_SQL``.
"""

from __future__ import annotations

from queries._base import *  # noqa: F401,F403
from queries._base import _arr_str  # noqa: F401
from queries.extended import _EMB_DIM, _MD5H, _TOKS_SQL, _lsh_sig_sql, _query_vec_rows, corpus_pipeline_v3  # noqa: F401

# ===========================================================================
# North-star: deterministic sampling/sharding + SemDeDup (semantic dedup)
# ===========================================================================


@q(
    "per_key_sample",
    """
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY MD5(CAST(doc_id AS VARCHAR) || '|pks'), doc_id) AS rk
      FROM documents)
    SELECT source, doc_id FROM ranked WHERE rk <= 5
    """,
)
def per_key_sample_q(spark, sf_dir):
    """Deterministic reservoir-style sample: ≤5 docs per source, ranked by
    md5(id) so the pick is uniform, engine-independent, and partition-count
    invariant (engine.extended.sampling.per_key_sample)."""
    from engine.extended.sampling import per_key_sample

    d = t(spark, sf_dir, "documents")
    return per_key_sample(d, "source", k=5).select("source", "doc_id")


@q(
    "shard_assign",
    """
    WITH h AS (
      SELECT doc_id, MD5(CAST(doc_id AS VARCHAR) || '|shard') AS hx
      FROM documents)
    SELECT doc_id,
           CAST(CAST(('0x' || SUBSTRING(hx, 1, 8)) AS BIGINT) % 8 AS INTEGER) AS shard,
           ROW_NUMBER() OVER (
             PARTITION BY CAST(('0x' || SUBSTRING(hx, 1, 8)) AS BIGINT) % 8
             ORDER BY hx, doc_id) AS shard_pos
    FROM h
    """,
)
def shard_assign_q(spark, sf_dir):
    """Deterministic global shuffle into 8 training shards with within-shard
    positions — the epoch-stable shard-writer ordering
    (engine.extended.sampling.shard_assign)."""
    from engine.extended.sampling import shard_assign

    d = t(spark, sf_dir, "documents")
    return shard_assign(d, n_shards=8).select("doc_id", "shard", "shard_pos")


@q(
    "label_centroids",
    """
    WITH x AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             CAST(UNNEST(embedding) AS DOUBLE) AS val
      FROM embeddings)
    SELECT label, pos, ROUND(AVG(val), 4) + 0.0 AS centroid
    FROM x GROUP BY label, pos
    """,
)
def label_centroids_q(spark, sf_dir):
    """Per-cluster mean embedding (the SemDeDup/IVF centroid computation):
    posexplode + map-side partial avg — shuffle O(clusters×dim), not O(rows)
    (engine.extended.semdedup.centroids_by)."""
    from engine.extended.semdedup import centroids_by

    e = t(spark, sf_dir, "embeddings")
    return centroids_by(e)


#: pair sides capped at the engine's cluster_cap=500 scale default
#: (lowest-id rows per label — deterministic, so QUALIFY mirrors it
#: exactly; every test-SF cluster is under the cap, so the capped and
#: uncapped results coincide while the gate checks the scale config)
_SEMDEDUP_PAIRS_SQL = """
    WITH v AS (
      SELECT label, vec_id, embedding,
             SQRT(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    vc AS (
      SELECT * FROM v
      QUALIFY ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) <= 500),
    p AS (
      SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
             CASE WHEN a.nrm * b.nrm > 0 THEN ROUND(
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (a.nrm * b.nrm), 4)
             END AS sim
      FROM vc a JOIN vc b ON a.label = b.label AND a.vec_id < b.vec_id)
"""


@q(
    "semdedup_pairs",
    _SEMDEDUP_PAIRS_SQL
    + """
    SELECT label, a_id, b_id, sim FROM p WHERE sim >= 0.4
    """,
)
def semdedup_pairs_q(spark, sf_dir):
    """SemDeDup candidate pairs: within-cluster exact cosine ≥ 0.4 (threshold
    on the rounded value — engine-exact).  Norms projected once per row
    before the self-join (engine.extended.semdedup.semdedup_pairs)."""
    from engine.extended.semdedup import semdedup_pairs

    e = t(spark, sf_dir, "embeddings")
    # cluster_cap=500 — the engine scale default, mirrored in the oracle's
    # QUALIFY (r11; the ×100 probe showed uncapped pair generation going
    # quadratic in cluster size, so the gate now checks the scale config)
    return semdedup_pairs(
        e,
        threshold=0.4,
        probe_parallelism=spark.sparkContext.defaultParallelism,
        cluster_cap=500,
    )


@q(
    "semdedup_prune",
    _SEMDEDUP_PAIRS_SQL
    + """
    , drops AS (SELECT DISTINCT b_id FROM p WHERE sim >= 0.3)
    SELECT e.label,
           COUNT(*) FILTER (WHERE d.b_id IS NULL) AS n_kept,
           COUNT(d.b_id) AS n_dropped
    FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.b_id
    GROUP BY e.label
    """,
)
def semdedup_prune_q(spark, sf_dir):
    """SemDeDup keeper rule per cluster: drop the higher id of every
    qualifying pair (cos ≥ 0.3), keep the rest — kept/dropped counts per
    label (engine.extended.semdedup.semdedup)."""
    from engine.extended.semdedup import semdedup_pairs

    e = t(spark, sf_dir, "embeddings")
    drops = (
        # probe_parallelism: the embeddings fixture has ~10 clusters, so the
        # quadratic pair stage would otherwise run on ~10 tasks (r11 opt)
        semdedup_pairs(
            e,
            threshold=0.3,
            cluster_cap=500,
            probe_parallelism=spark.sparkContext.defaultParallelism,
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    return (
        e.join(F.broadcast(drops), "vec_id", "left")
        .groupBy("label")
        .agg(
            F.count(F.when(F.col("__dropped").isNull(), 1)).alias("n_kept"),
            F.count("__dropped").alias("n_dropped"),
        )
    )


_TOK_SQL = "list_transform(regexp_extract_all(text, '[A-Za-z0-9'']+'), x -> LOWER(x))"


@q(
    "dsir_select",
    f"""
    WITH tok AS (
      SELECT doc_id, (lang = 'en') AS is_t, UNNEST({_TOK_SQL}) AS token
      FROM documents),
    counts AS (
      SELECT token, COUNT(*) AS n_bg,
             SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_t
      FROM tok GROUP BY token),
    tot AS (SELECT SUM(n_bg) AS tot_bg, SUM(n_t) AS tot_t, COUNT(*) AS vocab
            FROM counts),
    ratio AS (
      SELECT token,
             LN((n_t + 1.0) / (tot_t + 1.0 * vocab))
             - LN((n_bg + 1.0) / (tot_bg + 1.0 * vocab)) AS llr
      FROM counts, tot),
    scores AS (
      SELECT tok.doc_id, ROUND(AVG(r.llr), 4) AS score
      FROM tok JOIN ratio r USING (token) GROUP BY tok.doc_id)
    SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id LIMIT 50
    """,
)
def dsir_select_q(spark, sf_dir):
    """DSIR-style data selection (Xie et al. 2023): top-50 documents by mean
    unigram log-likelihood ratio of the lang='en' target slice over the whole
    corpus — one token shuffle builds both distributions, the vocab table is
    broadcast back (engine.extended.selection.dsir_select)."""
    from engine.extended.selection import dsir_select

    d = t(spark, sf_dir, "documents")
    return dsir_select(d, F.col("lang") == "en", k=50)


@q(
    "chunk_tokens",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
    st AS (
      SELECT doc_id, toks, UNNEST(generate_series(0, len(toks) - 1, 16)) AS s
      FROM tok WHERE len(toks) > 0)
    SELECT doc_id,
           CAST(s / 16 AS INTEGER) AS chunk_id,
           len(list_slice(toks, s + 1, s + 32)) AS n_tokens,
           array_to_string(list_slice(toks, s + 1, s + 32), ' ') AS chunk_text
    FROM st
    WHERE s = 0 OR s - 16 + 32 < len(toks)
    """,
)
def chunk_tokens_q(spark, sf_dir):
    """Sliding context-window chunking: 32-token chunks every 16 tokens
    (50% overlap), tokenized once behind an alias boundary — a pure flatMap,
    zero shuffle (engine.extended.curation.chunk_tokens)."""
    from engine.extended.curation import chunk_tokens

    d = t(spark, sf_dir, "documents")
    return chunk_tokens(d, size=32, stride=16)


@q(
    "knn_join_exact",
    """
    WITH v AS (
      SELECT vec_id, embedding,
             SQRT(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id % 100 = 7),
    p AS (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             CASE WHEN q.nrm * c.nrm > 0 THEN ROUND(
               list_sum(list_transform(list_zip(q.embedding, c.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (q.nrm * c.nrm), 4)
             END AS sim
      FROM q JOIN v c ON q.vec_id <> c.vec_id),
    r AS (
      SELECT q_id, c_id, sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sim DESC NULLS LAST, c_id) AS rank
      FROM p)
    SELECT q_id, c_id, sim, rank FROM r WHERE rank <= 3
    """,
)
def knn_join_exact_q(spark, sf_dir):
    """Exact kNN join: top-3 corpus neighbors for every query vector
    (vec_id % 100 = 7 slice) — broadcast query side, norms projected
    pre-join, per-query WindowGroupLimit top-k
    (engine.extended.similarity.knn_join)."""
    from engine.extended.similarity import knn_join

    e = t(spark, sf_dir, "embeddings")
    return knn_join(e.filter(F.col("vec_id") % 100 == 7), e, k=3)


def _knn_join_lsh_sql() -> str:
    from engine.extended.dedup import _unit_hyperplanes

    hp = _unit_hyperplanes(_EMB_DIM, 16)
    per_band = 4
    branches = []
    for b in range(4):
        key = _lsh_sig_sql("embedding", hp[b * per_band : (b + 1) * per_band])
        branches.append(
            f"SELECT vec_id, {b} AS band, {key} AS bkey FROM nn"
        )
    banded = "\n      UNION ALL\n      ".join(branches)
    return f"""
    WITH nn AS (
      SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL),
    banded AS (
      {banded}),
    qb AS (SELECT vec_id AS q_id, band, bkey FROM banded WHERE vec_id % 100 = 7),
    cand AS (
      SELECT DISTINCT q.q_id, c.vec_id AS c_id
      FROM qb q JOIN banded c ON q.band = c.band AND q.bkey = c.bkey
      WHERE q.q_id <> c.vec_id),
    v AS (
      SELECT vec_id, embedding,
             SQRT(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM nn),
    p AS (
      SELECT cand.q_id, cand.c_id,
             CASE WHEN q.nrm * c.nrm > 0 THEN ROUND(
               list_sum(list_transform(list_zip(q.embedding, c.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (q.nrm * c.nrm), 4)
             END AS sim
      FROM cand JOIN v q ON q.vec_id = cand.q_id
                JOIN v c ON c.vec_id = cand.c_id),
    r AS (
      SELECT q_id, c_id, sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sim DESC NULLS LAST, c_id) AS rank
      FROM p)
    SELECT q_id, c_id, sim, rank FROM r WHERE rank <= 3
    """


@q("knn_join_lsh", _knn_join_lsh_sql())
def knn_join_lsh_q(spark, sf_dir):
    """Approximate kNN JOIN via shared sign-LSH bands — the scale path for
    query sides too big to broadcast (engine.extended.similarity.
    lsh_knn_join): both sides banded with the same deterministic
    hyperplanes, bare-id candidate pairs through the band join, vectors
    joined back once per distinct pair, per-query top-3.  Same query slice
    as knn_join_exact so recall is directly comparable."""
    from engine.extended.similarity import lsh_knn_join

    e = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    return lsh_knn_join(
        e.filter(F.col("vec_id") % 100 == 7),
        e,
        k=3,
        dim=_EMB_DIM,
        planes=16,
        bands=4,
        exclude_self=True,
    )


@q(
    "contamination_attribution",
    """
    WITH toklist AS (
      SELECT doc_id,
             list_transform(regexp_extract_all(text, '[A-Za-z0-9'']+'),
                            x -> LOWER(x)) AS toks
      FROM documents),
    tri AS (
      SELECT doc_id, toks, UNNEST(range(1, len(toks) - 1)) AS i
      FROM toklist WHERE len(toks) >= 3),
    shingles AS (
      SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS sh FROM tri),
    ev AS (SELECT doc_id AS eval_id, sh FROM shingles WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id AS train_id, sh FROM shingles WHERE doc_id % 97 <> 0),
    hits AS (
      SELECT eval_id, train_id, COUNT(*) AS n_shared
      FROM tr JOIN ev USING (sh) GROUP BY eval_id, train_id),
    r AS (
      SELECT eval_id, train_id, n_shared,
             ROW_NUMBER() OVER (PARTITION BY eval_id
               ORDER BY n_shared DESC, train_id) AS rank
      FROM hits)
    SELECT eval_id, train_id, n_shared, rank FROM r WHERE rank <= 3
    """,
)
def contamination_attribution_q(spark, sf_dir):
    """Leak attribution: for each eval doc (doc_id % 97 = 0 slice), the top-3
    training docs by shared distinct 3-gram shingles — broadcast eval
    shingles, map-side (eval,train) collapse, WindowGroupLimit top-k
    (engine.extended.curation.contamination_attribution)."""
    from engine.extended.curation import contamination_attribution

    d = t(spark, sf_dir, "documents")
    return contamination_attribution(
        d.filter(F.col("doc_id") % 97 != 0), d.filter(F.col("doc_id") % 97 == 0), k=3
    )


@q(
    "embedding_quantize",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> ABS(CAST(x AS DOUBLE)))) + 0.0 AS amax
      FROM embeddings)
    SELECT vec_id,
           ROUND(amax / 127.0, 6) AS qscale_r,
           array_to_string(
             CASE WHEN amax > 0 THEN
               list_transform(embedding,
                 x -> CAST(ROUND(CAST(x AS DOUBLE) / (amax / 127.0)) AS INTEGER))
             ELSE list_transform(embedding, x -> 0) END, ',') AS qvec
    FROM m
    """,
)
def embedding_quantize_q(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding column — the 4×
    vector-storage code path; int codes compare bit-for-bit across engines
    (engine.extended.similarity.quantize_int8).  Codes render comma-joined
    so the driver comparator can canonicalize them (VERDICT r4 #1)."""
    from engine.extended.similarity import quantize_int8

    e = t(spark, sf_dir, "embeddings")
    return quantize_int8(e).select(
        "vec_id",
        F.round("qscale", 6).alias("qscale_r"),
        _arr_str("qvec").alias("qvec"),
    )


@q(
    "semdedup_incremental",
    """
    WITH v AS (
      SELECT label, vec_id, embedding,
             SQRT(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    corpus AS (SELECT * FROM v WHERE vec_id % 2 = 0),
    batch  AS (SELECT * FROM v WHERE vec_id % 2 = 1),
    ccap AS (
      SELECT * FROM corpus
      QUALIFY ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) <= 500),
    xhit AS (
      SELECT DISTINCT b.vec_id AS id
      FROM batch b JOIN ccap c ON b.label = c.label
      WHERE CASE WHEN b.nrm * c.nrm > 0 THEN ROUND(
              list_sum(list_transform(list_zip(b.embedding, c.embedding),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
              / (b.nrm * c.nrm), 4) END >= 0.3),
    fresh AS (SELECT * FROM batch WHERE vec_id NOT IN (SELECT id FROM xhit)),
    fcap AS (
      SELECT * FROM fresh
      QUALIFY ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) <= 500),
    p AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             CASE WHEN a.nrm * b.nrm > 0 THEN ROUND(
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (a.nrm * b.nrm), 4) END AS sim
      FROM fcap a JOIN fcap b ON a.label = b.label AND a.vec_id < b.vec_id),
    drops AS (SELECT DISTINCT b_id FROM p WHERE sim >= 0.3)
    SELECT vec_id, label FROM fresh
    WHERE vec_id NOT IN (SELECT b_id FROM drops)
    """,
)
def semdedup_incremental_q(spark, sf_dir):
    """Incremental semantic dedup: the odd-id half of the embeddings arrives
    as a new batch and is accepted only if novel against the even-id corpus
    AND within itself — per-batch cost stays O(batch × cluster slice), the
    persisted-index ingest shape (engine.extended.semdedup.semdedup_incremental).

    cluster_cap=500 — the engine's SCALE path, mirrored exactly in the
    oracle (QUALIFY lowest-id-500 per label on the corpus probe side and on
    the within-batch pair sides; the cap rule is deterministic).  The r11
    ×100 probe caught the previous cluster_cap=None form going quadratic in
    cluster size (500k-vector fixture: >18 min vs ~1 s at sf0.1); at the
    test SFs every cluster is under the cap, so results are identical —
    the gate now simply checks the configuration that survives 100 TB."""
    from engine.extended.semdedup import semdedup_incremental

    e = t(spark, sf_dir, "embeddings")
    return semdedup_incremental(
        e.filter(F.col("vec_id") % 2 == 1),
        e.filter(F.col("vec_id") % 2 == 0),
        threshold=0.3,
        cluster_cap=500,
        # ~10 clusters in the fixture → the probe/pair stages would run on
        # ~10 tasks without the spread (r11 opt; see pairwise_sims)
        probe_parallelism=spark.sparkContext.defaultParallelism,
    ).select("vec_id", "label")


@q(
    "corpus_pipeline_v2",
    """
    WITH red AS (
      SELECT doc_id, source, lang,
             REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g'),
               '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
               '\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g')
               AS text
      FROM documents),
    filtered AS (
      SELECT doc_id, text, source, lang FROM red
      WHERE LENGTH(text) >= 50
        AND LENGTH(list_transform(regexp_extract_all(text, '[A-Za-z0-9'']+'), x -> LOWER(x))) >= 10
        AND LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) * 1.0
            / LENGTH(text) >= 0.5),
    deduped AS (
      SELECT doc_id, text, source, lang FROM (
        SELECT f.*, ROW_NUMBER() OVER (
          PARTITION BY MD5(LOWER(REGEXP_REPLACE(text, '[^A-Za-z0-9]', '', 'g')))
          ORDER BY doc_id) AS rn
        FROM filtered f) WHERE rn = 1),
    tok AS (
      SELECT doc_id, (lang = 'en') AS is_t,
             UNNEST(list_transform(regexp_extract_all(text, '[A-Za-z0-9'']+'), x -> LOWER(x))) AS token
      FROM deduped),
    counts AS (
      SELECT token, COUNT(*) AS n_bg,
             SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_t
      FROM tok GROUP BY token),
    tot AS (SELECT SUM(n_bg) AS tot_bg, SUM(n_t) AS tot_t, COUNT(*) AS vocab
            FROM counts),
    ratio AS (
      SELECT token,
             LN((n_t + 1.0) / (tot_t + 1.0 * vocab))
             - LN((n_bg + 1.0) / (tot_bg + 1.0 * vocab)) AS llr
      FROM counts, tot),
    scores AS (
      SELECT tok.doc_id, ROUND(AVG(r.llr), 4) AS score
      FROM tok JOIN ratio r USING (token) GROUP BY tok.doc_id),
    selected AS (
      SELECT d.doc_id, d.text, s.score FROM deduped d
      JOIN scores s USING (doc_id) WHERE s.score >= 0),
    sharded AS (
      SELECT *,
             CAST(CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR) || '|shard'), 1, 8))
                  AS BIGINT) % 4 AS INTEGER) AS shard
      FROM selected)
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(list_transform(regexp_extract_all(text, '[A-Za-z0-9'']+'), x -> LOWER(x))))
                AS BIGINT) AS total_tokens,
           ROUND(AVG(score), 4) AS avg_score
    FROM sharded GROUP BY shard
    """,
)
def corpus_pipeline_v2(spark, sf_dir):
    """The extended curation chain as ONE declarative plan: PII redaction →
    quality filter → exact dedup → DSIR importance gate (keep docs scoring
    more target-like than background, score ≥ 0 vs the lang='en' target) →
    deterministic shard assignment → per-shard stats.  Every stage is an
    engine operator; Catalyst fuses redaction+filter into the scan, and the
    only exchanges are the dedup fingerprint, the DSIR token aggregate, and
    the final shard stats."""
    from engine.extended.curation import redact_pii
    from engine.extended.dedup import exact_dedup_docs
    from engine.extended.sampling import shard_assign
    from engine.extended.selection import importance_scores
    from engine.extended.text import token_count

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", redact_pii("text").alias("text")
    )
    alpha_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
        / F.length("text").cast("double")
    )
    filtered = d.filter(
        (F.length("text") >= 50) & (token_count("text") >= 10) & (alpha_ratio >= 0.5)
    ).select("doc_id", "text", "source", "lang")
    deduped = exact_dedup_docs(filtered)
    scores = importance_scores(deduped, F.col("lang") == "en")
    selected = (
        deduped.join(scores, "doc_id")
        .filter(F.col("score") >= 0)
        .select("doc_id", "text", "score")
    )
    sharded = shard_assign(selected, n_shards=4, position=False)
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).cast("long").alias("total_tokens"),
        F.round(F.avg("score"), 4).alias("avg_score"),
    )


_BM25_TERMS = ["spark", "merge", "table"]


def _bm25_term_sql(term: str, i: int) -> str:
    tf = f"LENGTH(list_filter(t.toks, x -> x = '{term}'))"
    return (
        f"LN(1 + (s.n - s.df{i} + 0.5) / (s.df{i} + 0.5)) * {tf} * 2.2\n"
        f"             / ({tf} + 1.2 * (0.25 + 0.75 * LENGTH(t.toks) / s.avgdl))"
    )


@q(
    "bm25_rank",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    stats AS (
      SELECT COUNT(*) AS n, AVG(LENGTH(toks)) AS avgdl,
             {", ".join(f"COUNT(CASE WHEN list_contains(toks, '{t_}') THEN 1 END) AS df{i}" for i, t_ in enumerate(_BM25_TERMS))}
      FROM tok)
    SELECT t.doc_id,
           ROUND({" + ".join(_bm25_term_sql(t_, i) for i, t_ in enumerate(_BM25_TERMS))}, 4) AS bm25
    FROM tok t, stats s
    ORDER BY bm25 DESC NULLS LAST, t.doc_id LIMIT 15
    """,
)
def bm25_rank(spark, sf_dir):
    """Full Okapi BM25 ranking (length-normalized, Lucene-style idf) over the
    corpus for a literal query — the lexical-retrieval primitive
    (engine.extended.search.bm25_scores).  Stats come from one combined
    aggregate scan; scoring is a single codegen scan; top-k is
    TakeOrderedAndProject, never a global sort."""
    from engine.extended.search import bm25_scores

    d = t(spark, sf_dir, "documents")
    return (
        bm25_scores(d, _BM25_TERMS)
        .orderBy(F.col("bm25").desc_nulls_last(), "doc_id")
        .limit(15)
    )


_RRF_COS_SQL = """
         CASE WHEN SQRT(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                   SQRT(list_sum(list_transform(qv.q,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
         THEN ROUND(
           list_sum(list_transform(list_zip(e.embedding, qv.q),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
           (SQRT(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
            SQRT(list_sum(list_transform(qv.q,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
         END"""


@q(
    "rrf_fusion_topk",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    stats AS (
      SELECT COUNT(*) AS n, AVG(LENGTH(toks)) AS avgdl,
             {", ".join(f"COUNT(CASE WHEN list_contains(toks, '{t_}') THEN 1 END) AS df{i}" for i, t_ in enumerate(_BM25_TERMS))}
      FROM tok),
    scored AS (
      SELECT t.doc_id,
             ROUND({" + ".join(_bm25_term_sql(t_, i) for i, t_ in enumerate(_BM25_TERMS))}, 4) AS bm25
      FROM tok t, stats s),
    lexr AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC NULLS LAST, doc_id) AS lr
      FROM (SELECT doc_id, bm25 FROM scored
            ORDER BY bm25 DESC NULLS LAST, doc_id LIMIT 100)),
    qv AS (SELECT embedding AS q FROM embeddings WHERE embedding IS NOT NULL AND vec_id = (SELECT MIN(vec_id) FROM embeddings WHERE embedding IS NOT NULL AND vec_id >= 3)),
    cs AS (
      SELECT e.vec_id AS doc_id,{_RRF_COS_SQL} AS c
      FROM embeddings e, qv WHERE e.embedding IS NOT NULL),
    vecr AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY c DESC NULLS LAST, doc_id) AS vr
      FROM (SELECT doc_id, c FROM cs
            ORDER BY c DESC NULLS LAST, doc_id LIMIT 100)),
    f AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             CAST(COALESCE(l.lr, 0) AS BIGINT) AS lex_rank,
             CAST(COALESCE(v.vr, 0) AS BIGINT) AS vec_rank,
             ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + l.lr), CAST(0 AS DOUBLE))
                 + COALESCE(CAST(1 AS DOUBLE) / (60 + v.vr), CAST(0 AS DOUBLE)),
                 6) AS rrf_score
      FROM lexr l FULL JOIN vecr v ON l.doc_id = v.doc_id)
    SELECT doc_id, lex_rank, vec_rank, rrf_score
    FROM f ORDER BY rrf_score DESC NULLS LAST, doc_id LIMIT 10
    """,
)
def rrf_fusion_topk(spark, sf_dir):
    """Reciprocal-rank fusion of the BM25 and cosine candidate lists
    (engine.extended.search.rrf_fuse_topk): rrf = Σ 1/(60+rank), the
    score-scale-free fusion for incomparable retrieval scores —
    hybrid_search_topk's rank-space sibling.  Each side is a
    TakeOrderedAndProject top-100 (never a global sort or corpus-wide rank
    window); ranks and the full-outer fusion run on ≤200 rows.  Absent-
    from-a-list ranks surface as 0 (the gate-stable no-contribution
    convention); 1/(60+rank) is exact IEEE division of small ints."""
    from engine.extended.search import rrf_fuse_topk

    d = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    qv = _query_vec_rows(emb, 3)
    if qv is None:
        return d.select(
            "doc_id",
            F.lit(0).cast("long").alias("lex_rank"),
            F.lit(0).cast("long").alias("vec_rank"),
            F.lit(None).cast("double").alias("rrf_score"),
        ).limit(0)
    out = rrf_fuse_topk(d, emb, _BM25_TERMS, qv, k=10, rrf_k=60,
                        n_candidates=100)
    return out.select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(0)).cast("long").alias("vec_rank"),
        "rrf_score",
    )


_SPAN_SQL = f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    nz AS (SELECT doc_id, toks FROM tok WHERE LENGTH(toks) > 0),
    pos AS (
      SELECT doc_id, toks,
             UNNEST(range(0, CAST(CEIL(LENGTH(toks) / 8.0) AS BIGINT))) AS pos
      FROM nz),
    spans AS (
      SELECT doc_id, pos,
             array_to_string(list_slice(toks, pos * 8 + 1, pos * 8 + 8), ' ') AS span
      FROM pos),
    fps AS (SELECT doc_id, pos, span, {_MD5H.format(x='span')} AS fp FROM spans),
    owners AS (
      SELECT fp, COUNT(*) AS cnt, MIN(doc_id) AS owner
      FROM fps GROUP BY fp)"""


@q(
    "span_dup_stats",
    _SPAN_SQL
    + """
    SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN o.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           ROUND(SUM(CASE WHEN o.cnt >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
             AS dup_fraction
    FROM fps f JOIN owners o USING (fp)
    GROUP BY f.doc_id
    """,
)
def span_dup_stats(spark, sf_dir):
    """Per-doc duplicated-span profile: fraction of non-overlapping 8-token
    spans whose fingerprint occurs 2+ times corpus-wide — the boilerplate
    detector that decides whether a doc needs span-level rewriting
    (engine.extended.dedup.duplicate_span_stats; md5 mode for the oracle,
    xxhash64 in production)."""
    from engine.extended.dedup import duplicate_span_stats

    d = t(spark, sf_dir, "documents")
    return duplicate_span_stats(d, span_tokens=8, min_count=2, hash_fn="md5")


@q(
    "span_dedup_rewrite",
    _SPAN_SQL
    + """
    SELECT f.doc_id,
           COALESCE(STRING_AGG(f.span, ' ' ORDER BY f.pos)
                    FILTER (WHERE o.cnt < 2 OR o.owner = f.doc_id), '')
             AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN o.cnt >= 2 AND o.owner <> f.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped
    FROM fps f JOIN owners o USING (fp)
    GROUP BY f.doc_id
    """,
)
def span_dedup_rewrite(spark, sf_dir):
    """Span-level dedup rewrite: every duplicated 8-token span survives only
    in its canonical owner (lowest doc id); other docs are reassembled
    without it (the RefinedWeb/C4 boilerplate-removal pass;
    engine.extended.dedup.remove_duplicate_spans)."""
    from engine.extended.dedup import remove_duplicate_spans

    d = t(spark, sf_dir, "documents")
    return remove_duplicate_spans(d, span_tokens=8, min_count=2, hash_fn="md5")


def _moji_sql_chain(expr: str) -> str:
    from engine.extended.curation import MOJIBAKE_MAP

    for bad, good in MOJIBAKE_MAP:
        expr = f"REPLACE({expr}, '{bad}', '{good}')"
    return expr


def _html_sql_chain(expr: str) -> str:
    """SQL twin of curation.html_to_text, generated from the SAME strip/
    entity constants the Spark expression uses (DuckDB string literals
    take regex backslashes verbatim; only quotes need doubling)."""
    from engine.extended.curation import HTML_ENTITIES, HTML_STRIP_STEPS

    e = expr
    for pat, rep in HTML_STRIP_STEPS:
        e = f"REGEXP_REPLACE({e}, '{pat.replace(chr(39), chr(39) * 2)}', '{rep}', 'g')"
    for ent, rep in HTML_ENTITIES:
        e = f"REPLACE({e}, '{ent.replace(chr(39), chr(39) * 2)}', '{rep.replace(chr(39), chr(39) * 2)}')"
    e = "REPLACE(" + e + ", '\xa0', ' ')"  # literal U+00A0 -> plain space
    return (
        f"REGEXP_REPLACE(REGEXP_REPLACE({e}, '\\s+', ' ', 'g'), '^ +| +$', '', 'g')"
    )


def _pii_sql_chain(expr: str) -> str:
    """SQL twin of curation.redact_pii, generated from PII_PATTERNS."""
    from engine.extended.curation import PII_PATTERNS

    e = expr
    for _, pat, repl in PII_PATTERNS:
        e = f"REGEXP_REPLACE({e}, '{pat}', '{repl}', 'g')"
    return e


@q(
    "mojibake_repair",
    f"""
    WITH t2 AS (
      SELECT doc_id,
             text || ' â€œLÃ©on â€“ cafÃ©â€¦ Â«RÃ©sumÃ©Â» '
                  || CAST(doc_id % 3 AS VARCHAR) AS tx
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           RIGHT({_moji_sql_chain('tx')}, 30) AS fixed_tail,
           CAST(LENGTH(tx) - LENGTH({_moji_sql_chain('tx')}) AS BIGINT)
             AS n_chars_repaired
    FROM t2
    """,
)
def mojibake_repair(spark, sf_dir):
    """cp1252 mojibake repair (engine.extended.curation.fix_mojibake) — the
    ftfy-style cleaning pass every web corpus needs: UTF-8 bytes mis-decoded
    as cp1252 ('Ã©' for 'é', 'â€™' for a curly quote) fixed by a literal
    replace chain, idempotent on clean text.  Deterministic mojibake is
    planted per doc; repaired-character counts are length deltas, exact in
    both engines."""
    from engine.extended.curation import fix_mojibake

    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d2 = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" â€œLÃ©on â€“ cafÃ©â€¦ Â«RÃ©sumÃ©Â» "),
            (F.col("doc_id") % 3).cast("string"),
        ).alias("tx"),
    )
    return d2.withColumn("fx", fix_mojibake("tx")).select(
        "doc_id",
        F.expr("right(fx, 30)").alias("fixed_tail"),
        (F.length("tx") - F.length("fx")).cast("long").alias("n_chars_repaired"),
    )


@q(
    "url_canonical_groups",
    """
    WITH raw AS (
      SELECT doc_id,
             'HTTP://WWW.' || source
               || CASE WHEN doc_id % 2 = 0 THEN '.Example.COM:80' ELSE '.example.com' END
               || '/p/' || CAST(doc_id % 7 AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0
                       THEN '/?utm_source=x&q=' || CAST(doc_id % 5 AS VARCHAR)
                       WHEN doc_id % 3 = 1
                       THEN '/?q=' || CAST(doc_id % 5 AS VARCHAR) || '&utm_campaign=z'
                       ELSE '/' END
               || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents),
    canon AS (
      SELECT doc_id, url,
        CASE WHEN regexp_extract(u3, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) <> '' THEN
          LOWER(regexp_extract(u3, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://'
          || CASE LOWER(regexp_extract(u3, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
             WHEN 'http' THEN regexp_replace(hostn, ':80\\z', '')
             WHEN 'https' THEN regexp_replace(hostn, ':443\\z', '')
             ELSE hostn END
          || regexp_replace(regexp_extract(regexp_extract(u3,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([\\s\\S]*)', 1),
                 '^([^?]*)', 1), '/+\\z', '')
          || regexp_extract(regexp_extract(u3,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([\\s\\S]*)', 1),
                 '^[^?]*([\\s\\S]*)', 1)
        END AS canon_url
      FROM (
        SELECT doc_id, url, u3,
               regexp_replace(
                 LOWER(regexp_extract(u3, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                 '^www\\.', '') AS hostn
        FROM (
          SELECT doc_id, url,
                 regexp_extract(u1, '^([^?]*)', 1)
                 || regexp_replace(regexp_replace(regexp_replace(
                      regexp_extract(u1, '^[^?]*(\\?[\\s\\S]*)', 1),
                      '&(utm_[A-Za-z]+|fbclid|gclid|mc_cid|mc_eid)=[^&]*', '', 'g'),
                      '\\?(utm_[A-Za-z]+|fbclid|gclid|mc_cid|mc_eid)=[^&]*&', '?', 'g'),
                      '\\?(utm_[A-Za-z]+|fbclid|gclid|mc_cid|mc_eid)=[^&]*\\z', '', 'g')
                   AS u3
          FROM (SELECT doc_id, url,
                       regexp_replace(url, '#[\\s\\S]*', '', 'g') AS u1
                FROM raw))))
    SELECT canon_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms
    FROM canon GROUP BY canon_url
    """,
)
def url_canonical_groups(spark, sf_dir):
    """URL canonicalization (engine.extended.curation.canonical_url) — the
    normalization before URL-level dedup: scheme/host case, www., default
    ports, tracking params, fragments and trailing slashes all collapse, so
    messy crawl variants of one page share a canonical key.  Deterministic
    messy URLs are planted per doc (the synthetic corpus has none), then
    grouped by canonical form with raw-variant counts."""
    from engine.extended.curation import canonical_url

    d = t(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW."),
            F.col("source"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(".Example.COM:80")).otherwise(
                F.lit(".example.com")
            ),
            F.lit("/p/"),
            (F.col("doc_id") % 7).cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("/?utm_source=x&q="), (F.col("doc_id") % 5).cast("string")
                ),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.concat(
                    F.lit("/?q="),
                    (F.col("doc_id") % 5).cast("string"),
                    F.lit("&utm_campaign=z"),
                ),
            )
            .otherwise(F.lit("/")),
            F.when(F.col("doc_id") % 4 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return raw.select("doc_id", "url", canonical_url("url").alias("canon_url")).groupBy(
        "canon_url"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("url").alias("n_raw_forms"),
    )


@q(
    "line_dedup_rewrite",
    f"""
    WITH t2 AS (
      SELECT doc_id,
             text || chr(10) || 'Shared footer - all rights reserved'
                  || CASE WHEN doc_id % 3 = 0
                     THEN chr(10) || '  Promo: subscribe now  ' ELSE '' END AS tx
      FROM documents WHERE text IS NOT NULL),
    ls AS (SELECT doc_id, string_split(tx, chr(10)) AS ls FROM t2),
    pos AS (SELECT doc_id, ls, UNNEST(range(1, LENGTH(ls) + 1)) AS pos FROM ls),
    lines AS (
      SELECT doc_id, pos - 1 AS pos, ls[pos] AS line,
             regexp_replace(ls[pos], '^[ \t\r]+|[ \t\r]+$', '', 'g') AS norm
      FROM pos),
    fps AS (
      SELECT doc_id, pos, line,
             CASE WHEN norm <> '' THEN {_MD5H.format(x='norm')} END AS fp
      FROM lines),
    boiler AS (
      SELECT fp FROM fps WHERE fp IS NOT NULL
      GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2)
    SELECT f.doc_id,
           COALESCE(STRING_AGG(f.line, chr(10) ORDER BY f.pos)
                    FILTER (WHERE b.fp IS NULL), '') AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN b.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM fps f LEFT JOIN boiler b ON f.fp = b.fp
    GROUP BY f.doc_id
    """,
)
def line_dedup_rewrite(spark, sf_dir):
    """Line-level boilerplate dedup (CCNet/RefinedWeb line-wise filter):
    every line whose ASCII-normalized form appears in 2+ distinct docs is
    dropped from ALL docs — template furniture has no canonical owner,
    unlike the copied-prose spans of span_dedup_rewrite.  The synthetic
    corpus has no newlines, so deterministic boilerplate is planted (a
    universal footer + a promo line in every third doc) and the real
    operator (engine.extended.dedup.line_dedup_rewrite, md5 mode for the
    oracle) rewrites it away."""
    from engine.extended.dedup import line_dedup_rewrite as ldr

    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d2 = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nShared footer - all rights reserved"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\n  Promo: subscribe now  ")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return ldr(d2, min_docs=2, hash_fn="md5")


_LINE_T2_SQL = """
      SELECT doc_id,
             text || chr(10) || 'Shared footer - all rights reserved'
                  || CASE WHEN doc_id % 3 = 0
                     THEN chr(10) || '  Promo: subscribe now  ' ELSE '' END AS tx
      FROM documents WHERE text IS NOT NULL"""


def _line_fps_sql(src: str) -> str:
    norm = "regexp_replace(ls[pos], '^[ \t\r]+|[ \t\r]+$', '', 'g')"
    fp_hash = _MD5H.format(x=norm)
    return f"""
    ls_{src} AS (SELECT doc_id, string_split(tx, chr(10)) AS ls FROM {src}),
    pos_{src} AS (SELECT doc_id, ls, UNNEST(range(1, LENGTH(ls) + 1)) AS pos
                  FROM ls_{src}),
    fps_{src} AS (
      SELECT doc_id, pos - 1 AS pos, ls[pos] AS line,
             CASE WHEN {norm} <> '' THEN {fp_hash} END AS fp
      FROM pos_{src})"""


@q(
    "line_dedup_incremental",
    f"""
    WITH t2 AS ({_LINE_T2_SQL}),
    corpus AS (SELECT * FROM t2 WHERE doc_id % 3 <> 0),
    batch AS (SELECT * FROM t2 WHERE doc_id % 3 = 0),
    {_line_fps_sql('corpus')},
    {_line_fps_sql('batch')},
    icounts AS (
      SELECT fp, COUNT(DISTINCT doc_id) AS n_docs
      FROM fps_corpus WHERE fp IS NOT NULL GROUP BY fp),
    bcounts AS (
      SELECT fp, COUNT(DISTINCT doc_id) AS bn
      FROM fps_batch WHERE fp IS NOT NULL GROUP BY fp),
    boiler AS (
      SELECT b.fp FROM bcounts b LEFT JOIN icounts i USING (fp)
      WHERE b.bn + COALESCE(i.n_docs, 0) >= 2)
    SELECT f.doc_id,
           COALESCE(STRING_AGG(f.line, chr(10) ORDER BY f.pos)
                    FILTER (WHERE b.fp IS NULL), '') AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN b.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM fps_batch f LEFT JOIN boiler b ON f.fp = b.fp
    GROUP BY f.doc_id
    """,
)
def line_dedup_incremental_q(spark, sf_dir):
    """INCREMENTAL line dedup (engine.extended.dedup.line_fp_index +
    line_dedup_incremental): the corpus's per-line distinct-doc counts are
    a persisted index; a new batch rewrites against index + its own
    internal counts without the corpus ever re-reading raw lines — the
    same persisted-state shape as the incremental MinHash path.  Here the
    prior corpus is doc_id % 3 != 0 and the batch is doc_id % 3 = 0: the
    universal footer drops via the INDEX count, the batch-only promo line
    drops via the BATCH count."""
    from engine.extended.dedup import line_dedup_incremental, line_fp_index

    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t2 = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nShared footer - all rights reserved"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\n  Promo: subscribe now  ")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    corpus = t2.filter(F.col("doc_id") % 3 != 0)
    batch = t2.filter(F.col("doc_id") % 3 == 0)
    index = line_fp_index(corpus, hash_fn="md5")
    return line_dedup_incremental(batch, index, min_docs=2, hash_fn="md5")


@q(
    "global_order_positions",
    """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY MD5(CAST(doc_id AS VARCHAR) || '|order'), doc_id) - 1
             AS BIGINT) AS global_pos
    FROM documents
    """,
)
def global_order_positions(spark, sf_dir):
    """Deterministic total order (epoch-stable global shuffle with absolute
    offsets) computed WITHOUT a global sort: md5-prefix shards + per-shard
    window rank + broadcast cumulative shard offsets
    (engine.extended.sampling.global_order).  The oracle IS the global sort —
    proving the sharded computation equals ORDER BY md5(id)."""
    from engine.extended.sampling import global_order

    d = t(spark, sf_dir, "documents").select("doc_id")
    return global_order(d).select("doc_id", "global_pos")


_HTML_PRE = (
    '<html><head><style>p {color: red}</style>'
    '<script type="text/js">if (1 < 2 && x > 0) alert("hi")</script></head>'
    '<!-- comment <b>bold</b> --><body><p id="p1">'
)
_HTML_POST = (
    '</p><br/><div>Tail &amp;amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;'
    ' &nbsp;end</div></body></html>'
)


@q(
    "html_extract",
    f"""
    WITH raw AS (
      SELECT doc_id,
             '{_HTML_PRE.replace("'", "''")}' || text ||
             '{_HTML_POST.replace("'", "''")}' AS html
      FROM documents),
    stripped AS (
      SELECT doc_id,
             REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(html,
               '(?i)<script[^>]*>[\\s\\S]*?</script\\s*>', ' ', 'g'),
               '(?i)<style[^>]*>[\\s\\S]*?</style\\s*>', ' ', 'g'),
               '<!--[\\s\\S]*?-->', ' ', 'g'),
               '<[^>]+>', ' ', 'g') AS s
      FROM raw)
    SELECT doc_id,
           REGEXP_REPLACE(REGEXP_REPLACE(
             REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(s,
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
               '&apos;', ''''), '&nbsp;', ' '), '&amp;', '&'), ' ', ' '),
             '\\s+', ' ', 'g'), '^ +| +$', '', 'g') AS clean_text,
           LENGTH(html) AS n_html_chars
    FROM stripped JOIN raw USING (doc_id)
    """,
)
def html_extract(spark, sf_dir):
    """HTML → text extraction (script/style/comment/tag strip + literal
    entity decode + whitespace collapse) — the C4-style first stage of a
    web-scrape curation pipeline (engine.extended.curation.html_to_text).
    The synthetic corpus carries no markup, so each doc is wrapped in a
    deterministic HTML shell IN-PLAN (same expression in both engines: shell
    exercises nested tags, a script with < > && operators, a commented-out
    tag, and the double-escape rule &amp;amp; → &amp;).  Zero shuffles."""
    from engine.extended.curation import html_to_text

    d = t(spark, sf_dir, "documents")
    html = F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST))
    return d.select(
        "doc_id",
        html_to_text(html).alias("clean_text"),
        F.length(html).alias("n_html_chars"),
    )


_RECIPE_PLANT = " cafÃ© bob@x.com 555-123-4567 â€“ "
_RECIPE_STEPS = [
    {"op": "fix_mojibake"},
    {"op": "html_to_text"},
    {"op": "redact_pii"},
    {"op": "min_length", "chars": 80},
    {"op": "exact_dedup"},
]


def _recipe_sql() -> str:
    pre = _HTML_PRE.replace("'", "''")
    post = _HTML_POST.replace("'", "''")
    plant = _RECIPE_PLANT.replace("'", "''")
    return f"""
    WITH raw AS (
      SELECT doc_id, source,
             '{pre}' || text || '{plant}' || '{post}' AS html
      FROM documents),
    moji AS (SELECT doc_id, source, {_moji_sql_chain('html')} AS m FROM raw),
    extracted AS (SELECT doc_id, source, {_html_sql_chain('m')} AS x FROM moji),
    red AS (SELECT doc_id, source, {_pii_sql_chain('x')} AS txt FROM extracted),
    filt AS (SELECT doc_id, source, txt FROM red WHERE LENGTH(txt) >= 80),
    ranked AS (
      SELECT doc_id, source, txt,
             ROW_NUMBER() OVER (
               PARTITION BY MD5(LOWER(REGEXP_REPLACE(txt, '[^A-Za-z0-9]', '', 'g')))
               ORDER BY doc_id) AS rn
      FROM filt)
    SELECT doc_id, source, txt AS text FROM ranked WHERE rn = 1
    """


@q("recipe_pipeline", _recipe_sql())
def recipe_pipeline_q(spark, sf_dir):
    """The DECLARATIVE curation layer end to end: a config-shaped step list
    (mojibake repair → HTML extraction → PII redaction → length filter →
    exact dedup) compiled by engine.recipes.apply_recipe into one plan,
    value-hash-checked against an oracle whose SQL is GENERATED from the
    same strip/entity/pattern constants the operators use — the recipe
    form provably equals the operator chain.  Docs are wrapped in the
    html_extract shell plus planted mojibake/PII so every step has work."""
    from engine.recipes import apply_recipe

    d = t(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id",
        "source",
        F.concat(
            F.lit(_HTML_PRE), F.col("text"), F.lit(_RECIPE_PLANT), F.lit(_HTML_POST)
        ).alias("text"),
    )
    return apply_recipe(wrapped, _RECIPE_STEPS).select("doc_id", "source", "text")


@q(
    "quality_classifier",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    ws AS (
      SELECT doc_id, LENGTH(toks) AS n,
             CASE WHEN toks IS NULL THEN NULL ELSE CAST(COALESCE(
               list_aggregate(list_transform(toks,
                 t -> ({_MD5H.format(x="'q|' || t")} % 4096) % 197 - 98), 'sum'),
               0) AS BIGINT) END AS weight_sum
      FROM tok)
    SELECT doc_id, weight_sum,
           ROUND(1.0 / (1.0 + EXP(-4.0 *
             CASE WHEN n > 0 THEN weight_sum / (98.0 * n) ELSE 0.0 END)), 4)
             AS quality_score,
           CAST(ROUND(1.0 / (1.0 + EXP(-4.0 *
             CASE WHEN n > 0 THEN weight_sum / (98.0 * n) ELSE 0.0 END)), 4)
             >= 0.5 AND n > 0 AS INT) AS quality_label
    FROM ws
    """,
)
def quality_classifier(spark, sf_dir):
    """fastText-shape hashed bag-of-words linear classifier: token → md5
    weight bucket → deterministic integer weight → exact integer sum → one
    sigmoid (engine.extended.curation.hashed_quality_score).  The model-
    scoring operator every learned quality filter reduces to; dual-
    implementable hash makes the whole classifier oracle-checkable.  Zero
    shuffles, single codegen scan."""
    from engine.extended.curation import hashed_quality_score
    from engine.extended.text import tokens

    d = t(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens("text").alias("__toks"))
    scores = hashed_quality_score(F.col("__toks"))
    return toked.select(
        "doc_id", *[c.alias(n) for n, c in scores.items()]
    )


@q(
    "char_entropy",
    r"""
    WITH norm AS (
      SELECT doc_id,
             REGEXP_REPLACE(LOWER(REGEXP_REPLACE(text, '[^ -~]', '', 'g')),
                            '\s+', ' ', 'g') AS nt
      FROM documents),
    ch AS (
      SELECT doc_id, nt, LENGTH(nt) AS n,
             list_sort(list_distinct(regexp_extract_all(nt, '[\s\S]'))) AS chars
      FROM norm),
    s AS (
      SELECT doc_id, n,
             list_aggregate(list_transform(chars,
               c -> (n - LENGTH(REPLACE(nt, c, ''))) *
                    LN(n - LENGTH(REPLACE(nt, c, '')))), 'sum') AS sc
      FROM ch)
    SELECT doc_id,
           CASE WHEN n > 0 THEN ROUND(LN(n) - sc / n, 4) ELSE 0.0 END
             AS char_entropy
    FROM s
    """,
)
def char_entropy(spark, sf_dir):
    """Shannon character entropy per doc — the gibberish / binary-noise
    filter (engine.extended.text.char_entropy_from).  Zero-shuffle
    formulation: histogram via length-minus-replace over the SORTED distinct
    char array (deterministic float fold order in both engines), identity
    H = ln(n) − Σ cnt·ln(cnt)/n so only exact integers enter the fold.
    ASCII-restricted normal form (ascii_norm_text) — Unicode lowering and
    astral-plane length are engine-dependent; printable ASCII is not."""
    from engine.extended.text import ascii_norm_text, char_entropy_from

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", ascii_norm_text("text").alias("__nt")).select(
        "doc_id", char_entropy_from(F.col("__nt")).alias("char_entropy")
    )


_PROFILE_COLS = [
    "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
    "o_orderstatus", "o_totalprice",
]


def _profile_col_sql(c: str, canon: str) -> str:
    return f"""
      SELECT '{c}' AS "column", COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
             COUNT(DISTINCT {c}) AS n_distinct,
             {canon.format(x=f"MIN({c})")} AS min_value,
             {canon.format(x=f"MAX({c})")} AS max_value
      FROM orders"""


@q(
    "table_profile",
    " UNION ALL ".join(
        _profile_col_sql(
            c,
            "CAST(CAST(ROUND({x}, 2) AS DECIMAL(28,2)) AS VARCHAR)"
            if c == "o_totalprice"
            else "CAST({x} AS VARCHAR)",
        )
        for c in _PROFILE_COLS
    )
    + ' ORDER BY "column"',
)
def table_profile(spark, sf_dir):
    """Per-column data-quality profile of a feed (count / nulls / exact
    distinct / canonical min / max) — the declarative form of the
    reference's scattered input validation (row-count guards,
    lib/pipeline_controller.py:204-210).  The operator default is the HLL
    single-scan plan (the 100 TB path); the oracle needs exact counts, and
    the exact mode is the no-Expand two-pass plan (plain wide agg + a
    map-side-collapsed distinct-pair aggregate), never Spark's gid-Expand
    multi-distinct."""
    from engine.ops.profile import table_profile as profile

    d = t(spark, sf_dir, "orders")
    return profile(d, _PROFILE_COLS, exact_distinct=True)


_PPL_P = (1 / 3, 2 / 3)


@q(
    "perplexity_buckets",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    bg AS (
      SELECT doc_id, UNNEST(CASE WHEN LENGTH(toks) < 2 THEN CAST([] AS VARCHAR[])
        ELSE list_transform(range(0, LENGTH(toks) - 1),
             i -> array_to_string(list_slice(toks, i + 1, i + 2), ' ')) END) AS bg
      FROM toks),
    c2 AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
    c1 AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
    sc AS (
      SELECT b.doc_id, COUNT(*) AS n_bigrams,
             ROUND(AVG(log2(c2.c2 / c1.c1)), 4) AS avg_logp
      FROM bg b JOIN c2 ON b.bg = c2.bg
      JOIN c1 ON split_part(b.bg, ' ', 1) = c1.w1
      GROUP BY b.doc_id),
    bounds AS (
      SELECT quantile_disc(avg_logp, {_PPL_P[0]!r}) AS b0,
             quantile_disc(avg_logp, {_PPL_P[1]!r}) AS b1
      FROM sc)
    SELECT doc_id, n_bigrams, avg_logp,
           CAST(avg_logp > b0 AS INT) + CAST(avg_logp > b1 AS INT) AS ppl_bucket
    FROM sc, bounds
    """,
)
def perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity stratification: score every doc under the
    corpus's own bigram LM, then split into head/middle/tail terciles by
    discrete quantile boundaries (engine.extended.selection.quantile_buckets
    over engine.extended.curation.bigram_lm_scores).  percentile_disc picks
    an ACTUAL data value as each boundary, so bucketing is engine-exact;
    boundary assignment is a broadcast 1-row cross join — no extra
    shuffle beyond the LM itself.  exact=False swaps in the approximate
    sketch at corpus scale.

    The scored frame is PERSISTED (per-doc rows, tiny next to the corpus):
    quantile_buckets consumes it twice (boundary aggregate + assignment),
    and without the cut point each consumption re-runs the whole LM —
    the same duplicate-subtree disease corpus_pipeline_v3 had (r4)."""
    from engine.extended.curation import bigram_lm_scores
    from engine.extended.selection import quantile_buckets

    d = t(spark, sf_dir, "documents")
    scores = bigram_lm_scores(d).persist()
    return quantile_buckets(
        scores, "avg_logp", probs=_PPL_P, bucket_col="ppl_bucket"
    )


@q(
    "constraint_audit",
    """
    WITH base AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        CAST(SUM(CASE WHEN NOT COALESCE(o_orderdate IS NOT NULL, FALSE)
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_date,
        CAST(SUM(CASE WHEN NOT COALESCE(LENGTH(o_orderpriority) > 0, FALSE)
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_prio
      FROM orders)
    SELECT 'orderdate_not_null' AS rule, v_date AS n_violations, n AS n_rows
      FROM base
    UNION ALL SELECT 'priority_nonempty', v_prio, n FROM base
    UNION ALL SELECT 'totalprice_positive', v_price, n FROM base
    ORDER BY rule
    """,
)
def constraint_audit(spark, sf_dir):
    """Declarative row-level constraint audit (great-expectations shape):
    N named predicates → violation counts in ONE codegen scan with
    map-side partials (engine.ops.quality.check_constraints); NULL
    predicate results count as violations."""
    from engine.ops.quality import check_constraints

    o = t(spark, sf_dir, "orders")
    return check_constraints(
        o,
        {
            "totalprice_positive": F.col("o_totalprice") > 0,
            "orderdate_not_null": F.col("o_orderdate").isNotNull(),
            "priority_nonempty": F.length("o_orderpriority") > 0,
        },
    )


@q(
    "referential_audit",
    """
    WITH pk AS (
      SELECT COUNT(*) AS n_keys,
             CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_keys,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
               AS n_dup_rows
      FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY 1)),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans
      FROM orders o
      WHERE o.o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)),
    nn AS (
      SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null_keys
      FROM orders)
    SELECT * FROM pk, fk, nn
    """,
)
def referential_audit(spark, sf_dir):
    """Key-integrity audit: primary-key uniqueness (one shuffle on the key,
    second fold over the key-sized count table) + referential integrity of
    o_custkey against customer (broadcast anti-join; NULL keys reported
    separately per SQL FK semantics) — engine.ops.quality.check_unique /
    check_foreign_key composed into one row."""
    from engine.ops.quality import check_foreign_key, check_unique

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    uniq = check_unique(o, ["o_orderkey"])
    fk = check_foreign_key(o, "o_custkey", c, "c_custkey")
    return uniq.crossJoin(F.broadcast(fk))


@q(
    "snapshot_audit",
    """
    SELECT o_orderkey, 'removed' AS change FROM orders WHERE o_orderkey % 97 = 0
    UNION ALL
    SELECT o_orderkey, 'changed' FROM orders
    WHERE o_orderkey % 13 = 0 AND o_orderkey % 97 <> 0
      AND o_totalprice IS NOT NULL
    UNION ALL
    SELECT o_orderkey + 10000000, 'added' FROM orders WHERE o_orderkey % 101 = 0
    """,
)
def snapshot_audit(spark, sf_dir):
    """Snapshot regression diff (engine.ops.quality.snapshot_diff): old =
    orders; new = a deterministically perturbed version built IN-PLAN
    (drop keys ≡0 mod 97, bump price on keys ≡0 mod 13, add remapped
    copies of keys ≡0 mod 101).  The oracle PREDICTS the diff from the
    perturbation independently — it never sees the row hashes — so it
    verifies the operator's semantics, not a mirror of its internals.
    One key-partitioned full-outer join, delta-sized output."""
    from engine.ops.quality import snapshot_diff

    key = F.col("o_orderkey")
    compare = ["o_custkey", "o_totalprice", "o_orderstatus"]
    o = t(spark, sf_dir, "orders")
    bumped = F.when(
        (key % 13 == 0) & F.col("o_totalprice").isNotNull(),
        F.col("o_totalprice") + 1.0,
    ).otherwise(F.col("o_totalprice"))
    newv = o.filter(~(key % 97 == 0)).select(
        key, F.col("o_custkey"), bumped.alias("o_totalprice"), "o_orderstatus"
    )
    added = o.filter(key % 101 == 0).select(
        (key + 10000000).alias("o_orderkey"), *compare
    )
    return snapshot_diff(
        o, newv.unionByName(added), ["o_orderkey"], compare
    )


@q(
    "doclen_quantiles",
    """
    SELECT source, COUNT(*) AS n_rows,
           CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q25,
           CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS q50,
           CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q75
    FROM documents GROUP BY source ORDER BY source
    """,
)
def doclen_quantiles(spark, sf_dir):
    """Per-source document-length quartiles (engine.ops.profile
    .group_quantiles): discrete percentiles are actual data values, so the
    grouped summary is engine-exact; one shuffle on the group key,
    exact=False swaps in the sketch at corpus scale."""
    from engine.ops.profile import group_quantiles

    d = t(spark, sf_dir, "documents")
    return group_quantiles(d, ["source"], "n_chars")


@q(
    "doclen_histogram",
    """
    WITH b AS (
      SELECT CASE WHEN n_chars < 0 THEN -1
                  WHEN n_chars >= 600 THEN 12
                  ELSE (n_chars * 12) // 600 END AS bucket
      FROM documents)
    SELECT bucket, ROUND(bucket * 50.0, 4) AS lo_edge,
           ROUND((bucket + 1) * 50.0, 4) AS hi_edge,
           COUNT(*) AS n_rows
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def doclen_histogram(spark, sf_dir):
    """Fixed-width histogram of document length (engine.ops.profile
    .int_histogram): integer-arithmetic bucket index (engine-invariant, no
    float width_bucket boundary drift), under/overflow buckets, one
    exchange of at most buckets+2 partial counts per task."""
    from engine.ops.profile import int_histogram

    d = t(spark, sf_dir, "documents")
    return int_histogram(d, "n_chars", lo=0, hi=600, n_buckets=12)


@q(
    "exists_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def exists_order_priority(spark, sf_dir):
    """TPC-H Q4 shape — correlated EXISTS decorrelated to a left-semi join
    (filter pushed below the join so only 'R' lineitems build the hash
    side), then one group-key exchange with map-side partials."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    semi = o.join(
        li.filter(F.col("l_returnflag") == "R").select(
            F.col("l_orderkey").alias("o_orderkey")
        ),
        "o_orderkey",
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "rich_idle_customers",
    """
    WITH thr AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total,
             COUNT(*) AS nn
      FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_bal
    FROM customer c, thr
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * nn > total
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def rich_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape — scalar-subquery threshold (above-average balance)
    + NOT EXISTS anti-join (no RECENT orders) + per-segment rollup.  The average comparison is
    CROSS-MULTIPLIED (bal·n > Σbal) so the threshold stays exact decimal
    arithmetic — a float mean would put boundary customers at the mercy of
    engine-specific summation order.  Threshold rides a broadcast 1-row
    table; the anti-join shuffles once on the key."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("__total"), F.count(F.lit(1)).alias("__nn")
    )
    rich = c.crossJoin(F.broadcast(thr)).filter(
        bal * F.col("__nn") > F.col("__total")
    )
    idle = rich.join(
        o.filter(F.col("o_orderdate") >= "2000-06-01").select(
            F.col("o_custkey").alias("c_custkey")
        ),
        "c_custkey",
        "left_anti",
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum(bal), 2).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@q(
    "supplier_value_share",
    """
    WITH sv AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS value
      FROM lineitem GROUP BY l_suppkey),
    tot AS (SELECT SUM(value) AS total, COUNT(*) AS nn FROM sv)
    SELECT l_suppkey, CAST(ROUND(value, 2) AS DOUBLE) AS net_value
    FROM sv, tot
    WHERE value * nn * 20 > 21 * total
    ORDER BY l_suppkey
    """,
)
def supplier_value_share(spark, sf_dir):
    """TPC-H Q11 shape — HAVING against a global-total scalar subquery:
    suppliers whose share exceeds 1.05× the mean share (scale-invariant,
    unlike a fixed fraction).  The test is cross-multiplied
    (value·n·20 > 21·Σvalue) so it stays exact decimal math;
    the total derives from the SAME per-supplier aggregate (supplier-sized,
    one extra fold), never a second lineitem pass."""
    li = t(spark, sf_dir, "lineitem")
    val = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount").cast("decimal(4,2)")
    )
    sv = li.groupBy("l_suppkey").agg(F.sum(val).alias("__value"))
    tot = sv.agg(
        F.sum("__value").alias("__total"), F.count(F.lit(1)).alias("__nn")
    )
    return (
        sv.crossJoin(F.broadcast(tot))
        .filter(F.col("__value") * F.col("__nn") * 20 > F.col("__total") * 21)
        .select(
            "l_suppkey",
            F.round("__value", 2).cast("double").alias("net_value"),
        )
        .orderBy("l_suppkey")
    )




@q(
    "phrase_search_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL),
    pos AS (
      SELECT doc_id, UNNEST(range(1, GREATEST(len(tk) - 1, 0) + 1)) AS i, tk
      FROM toks),
    hits AS (
      SELECT doc_id FROM pos WHERE list_slice(tk, i, i + 1) = ['fast', 'table']),
    cnt AS (SELECT doc_id, COUNT(*) AS n_matches FROM hits GROUP BY doc_id)
    SELECT doc_id, n_matches FROM cnt
    ORDER BY n_matches DESC, doc_id LIMIT 20
    """,
)
def phrase_search_topk(spark, sf_dir):
    """Exact phrase search over a positional inverted index
    (engine.extended.search.phrase_match_counts): postings filtered to the
    phrase's terms, start positions surviving a chain of (doc, shifted-pos)
    semi-joins, occurrence counts per doc, top-20.  The oracle counts the
    same phrase by slicing the token array directly — an INDEPENDENT
    verification path, so an off-by-one in the positional intersection
    cannot self-confirm.  Overlapping occurrences count (start positions),
    the lexical sibling of bm25_rank for exact-match retrieval."""
    from engine.extended.search import phrase_match_counts

    d = t(spark, sf_dir, "documents")
    return (
        phrase_match_counts(d, "fast table")
        .orderBy(F.col("n_matches").desc(), "doc_id")
        .limit(20)
    )


def _cov_sql(dims: list[int], quant: int = 1000) -> str:
    """DuckDB twin of embedding_covariance_block: identical quantization
    (FLOOR(x·quant + 0.5) BIGINTs), identical exact sums, identical
    double-space assembly operand order (1-based list indexing)."""
    pairs = [(i, j) for a, i in enumerate(dims) for j in dims[a:]]

    def qd(i: int) -> str:
        return (
            f"CAST(FLOOR(CAST(embedding[{i + 1}] AS DOUBLE) * {quant} + 0.5)"
            " AS BIGINT)"
        )

    filt = " AND ".join(f"embedding[{i + 1}] IS NOT NULL" for i in dims)
    sums = ", ".join(
        [f"SUM({qd(i)}) AS s{i}" for i in dims]
        + [f"SUM({qd(i)} * {qd(j)}) AS p{i}_{j}" for i, j in pairs]
    )
    cells = " UNION ALL ".join(
        f"SELECT {i} AS i, {j} AS j, n, CAST(FLOOR("
        f"(CAST(p{i}_{j} AS DOUBLE) / CAST(n AS DOUBLE)"
        f" - (CAST(s{i} AS DOUBLE) / CAST(n AS DOUBLE))"
        f" * (CAST(s{j} AS DOUBLE) / CAST(n AS DOUBLE))) + 0.5) AS BIGINT)"
        f" AS cov_micro FROM agg"
        for i, j in pairs
    )
    return (
        f"WITH agg AS (SELECT COUNT(*) AS n, {sums} FROM embeddings"
        f" WHERE embedding IS NOT NULL AND len(embedding) >= {max(dims) + 1}"
        f" AND {filt}) {cells}"
    )


_COV_DIMS = list(range(8))


@q("embedding_covariance_block", _cov_sql(_COV_DIMS))
def embedding_covariance_block_q(spark, sf_dir):
    """Exact covariance of the embedding's first 8 dimensions
    (engine.extended.similarity.embedding_covariance_block): ONE corpus
    aggregate carrying all 44 exact quantized sums — no per-pair explode,
    no self-join — unpivoted to (i, j, n, cov_micro) upper-triangle rows.
    The anisotropy audit before cosine retrieval, and the input to
    pca_whiten's driver-side eigenbasis (the bounded-collect family)."""
    from engine.extended.similarity import embedding_covariance_block

    e = t(spark, sf_dir, "embeddings")
    return embedding_covariance_block(e, _COV_DIMS)


@q(
    "stratified_kfold_balance",
    """
    WITH folded AS (
      SELECT source,
             (ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY MD5(COALESCE(CAST(doc_id AS VARCHAR), '') || '|fold'),
                         doc_id NULLS LAST) - 1) % 5 AS fold
      FROM documents)
    SELECT source, CAST(fold AS INTEGER) AS fold, COUNT(*) AS n
    FROM folded GROUP BY source, fold
    """,
)
def stratified_kfold_balance(spark, sf_dir):
    """Stratified k-fold assignment (engine.extended.sampling.
    stratified_kfold, k=5): within each source, md5-ranked rows deal into
    folds round-robin, so every fold's source mixture matches the corpus
    EXACTLY (±1 row per stratum) — the cross-validation splitter whose
    per-stratum balance independent hash-mod folds only approximate.  The
    per-(source, fold) counts are the balance audit."""
    from engine.extended.sampling import stratified_kfold

    d = t(spark, sf_dir, "documents")
    out = stratified_kfold(d, "source", k=5)
    return out.groupBy("source", "fold").agg(F.count(F.lit(1)).alias("n"))


def _hrw_sql(nodes: list[str]) -> str:
    h = lambda n: (  # noqa: E731
        "CAST(('0x' || SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)"
        f" || '|{n}|hrw'), 1, 15)) AS BIGINT)"
    )
    cols = ", ".join(f"{h(n)} AS h{i}" for i, n in enumerate(nodes))
    great = ", ".join(f"h{i}" for i in range(len(nodes)))
    # tie-break must match Spark's array_max(struct(h, n)) — largest node
    # NAME wins on an (astronomically unlikely) hash tie — so the CASE
    # tests the LAST-listed node first (review catch: index order broke
    # toward node0)
    whens = " ".join(
        f"WHEN h{i} THEN '{n}'"
        for i, n in sorted(enumerate(nodes), key=lambda t: t[1], reverse=True)
    )
    return f"""
    WITH h AS (
      SELECT c_custkey, {cols} FROM customer WHERE c_custkey IS NOT NULL),
    a AS (
      SELECT c_custkey,
             CASE GREATEST({great}) {whens} END AS node
      FROM h)
    SELECT node, COUNT(*) AS n_keys FROM a GROUP BY node
    """


_HRW_NODES = [f"node{i}" for i in range(5)]


@q("rendezvous_routing", _hrw_sql(_HRW_NODES))
def rendezvous_routing(spark, sf_dir):
    """Rendezvous / highest-random-weight routing
    (engine.extended.sampling.rendezvous_assign): every customer key owned
    by the node with the highest md5(key|node) weight — the
    minimal-disruption router (removing a node reassigns ONLY its keys,
    pinned in pytest) for shard-stable incremental index ownership.  Pure
    per-row expressions; the output is the per-node load table."""
    from engine.extended.sampling import rendezvous_assign

    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey").isNotNull())
    out = rendezvous_assign(c, "c_custkey", _HRW_NODES)
    return out.groupBy("node").agg(F.count(F.lit(1)).alias("n_keys"))


@q(
    "score_quantile_normalize",
    """
    SELECT doc_id, source,
           CAST(FLOOR(PERCENT_RANK() OVER (
                  PARTITION BY source ORDER BY n_chars NULLS FIRST)
                * 1000 + 0.5) AS BIGINT) AS pr_milli
    FROM documents WHERE doc_id IS NOT NULL
    """,
)
def score_quantile_normalize(spark, sf_dir):
    """Per-source quantile normalization: each document's raw score
    (n_chars) replaced by its percent-rank WITHIN its source — the
    cross-source score calibration step before mixing corpora whose raw
    quality scales differ (a 0.9 from one scorer is not a 0.9 from
    another; percentiles are).  percent_rank's (rank−1)/(n−1) is the same
    double in every engine given identical tie groups; quantized to
    milli-units via the FLOOR(+0.5) discipline.  One window shuffle on
    the source key."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    w = Window.partitionBy("source").orderBy(F.col("n_chars").asc_nulls_first())
    return d.select(
        "doc_id",
        "source",
        F.floor(F.percent_rank().over(w) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("pr_milli"),
    )
