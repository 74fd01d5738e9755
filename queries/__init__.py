"""The engine's query pack — one named query per implemented operator from
SURVEY.md §2 (+ the north-star extended operators), each with a DuckDB oracle
SQL twin where the semantics are ANSI-SQL-expressible.

Registration model: ``@q(name, sql)`` adds a (spark_fn, oracle_sql) pair to
the module registries consumed by ``__spark_entry__``.  Spark fns take
``(spark, sf_dir)`` and return a DataFrame; every computed column is aliased
identically in both the DataFrame code and the SQL so the driver's
column-sorted value hash lines up.

Float discipline: every floating aggregate/ratio is rounded (usually 2-4
decimals) in BOTH engines so double accumulation-order differences cannot
break value hashes; date/timestamp outputs are emitted as formatted strings
for the same reason.
"""

from __future__ import annotations

from queries._base import *  # noqa: F401,F403
from queries._base import _arr_str  # noqa: F401
from queries import (  # noqa: E402
    core,
    extended,
    flagship,
    sql_surface,
    pipeline_modes,
    curation,
    sampling,
    maintenance,
    tpch_shapes,
)

# Re-export every top-level name of every family module (tests and tools
# import query functions and SQL-builder helpers directly from `queries`,
# exactly as they did from the flat module).  Plain assignment in module
# order mirrors the flat file's later-definition-wins shadowing.
for _m in (
    core, extended, flagship, sql_surface, pipeline_modes, curation,
    sampling, maintenance, tpch_shapes,
):
    for _k, _v in vars(_m).items():
        if not _k.startswith("__"):
            globals()[_k] = _v
del _m, _k, _v


# ===========================================================================
# Registration order (driver verification window)
# ===========================================================================
# The driver's correctness gate checks the FIRST 50 registered queries, so
# ordering is a verification-budget decision, not cosmetics: slots 1-50 must
# all be oracle-paired (a rows-only query in the window burns a slot on a
# guaranteed `no_oracle`), and should cover every SURVEY §2 family plus the
# highest-value end-to-end chains (flagship, pipeline modes, curation).
# Rows-only queries (engine-native hash families, external-call seams) sit at
# the very end so ANY window size the driver picks lands on oracle-paired
# entries first.

_WINDOW_PRIORITY = [
    # ---- r10 ROTATION (VERDICT r9 #2): regression insurance on the
    # now-stalest cohort.  These are the 50 registry queries whose latest
    # driver row is OLDEST (36×r4 + 14×r5, computed from
    # CORRECTNESS_r01..r09 against the live registry; the verdict's own
    # staleness computation names the same set).  They are exactly the
    # ANN/semdedup/BM25/dedup/timeseries families the r9 cold-area review
    # sweeps (8315e50, 2d4d16f) churned, so a regression here is likeliest.
    # Tail slots swap for new r10 queries as they land (windowed-at-birth
    # rule); displaced names stay stalest-first for the r11 rotation.
    # Last driver row r4 (36).
    "dedup_minhash_incremental", "dedup_simhash", "ann_lsh_topk",
    "embedding_near_dup", "bigram_lm_quality", "url_domain_stats",
    "domain_blocklist_kept", "temperature_mixture_sample",
    "corpus_pipeline_v3", "asof_join_events_orders", "range_join_sessions",
    "ann_ivf_topk", "doc_overlap_winnow", "scd2_history_merge",
    "dedup_minhash_cc", "hybrid_search_topk", "tfidf_top_terms",
    "ngram_contamination", "semdedup_pairs", "semdedup_prune",
    "dsir_select", "knn_join_exact", "contamination_attribution",
    "semdedup_incremental", "bm25_rank", "span_dup_stats",
    "span_dedup_rewrite", "global_order_positions", "html_extract",
    "quality_classifier", "char_entropy", "table_profile",
    "perplexity_buckets", "constraint_audit", "referential_audit",
    "snapshot_audit",
    # Last driver row r5 (14).
    "embedding_matryoshka", "array_agg_sorted", "percentiles_exact",
    "ann_pq_adc_topk", "funnel_conversion_unbounded", "embedding_jl_project",
    "doc_vector_hashed", "pmi_collocations", "timeseries_gapfill",
    "timeseries_anomaly", "ewma_smooth", "timeseries_lttb",
    "cohort_retention", "funnel_conversion",
]
assert len(_WINDOW_PRIORITY) == 50, len(_WINDOW_PRIORITY)

#: rows-only queries DELIBERATELY spent on window slots this round:
#: each name here lacks a SQL oracle by nature (external-call seams, binary
#: media, engine-native hash families).  Any window entry that is rows-only
#: but NOT in this allowlist is still an error — a slot burned by accident.
#: (r8: empty — every windowed ex-seam gained its oracle twin: the fake
#: corpora now chain their byte streams through ASCII-hex sha256, so the
#: DuckDB oracle replays payload bytes and the decode → fingerprint →
#: banded-hamming-join pipelines are value-hash-checked end to end.)
_WINDOW_ROWS_ONLY: set[str] = set()


def _reorder_registry() -> None:
    missing = [n for n in _WINDOW_PRIORITY if n not in SPARK_QUERIES]
    assert not missing, f"priority names not registered: {missing}"
    unpaired = [
        n for n in _WINDOW_PRIORITY
        if n not in ORACLE_SQL and n not in _WINDOW_ROWS_ONLY
    ]
    assert not unpaired, f"rows-only queries in the window: {unpaired}"
    rest_oracle = [
        n for n in SPARK_QUERIES
        if n not in _WINDOW_PRIORITY and n in ORACLE_SQL
    ]
    rest_rows_only = [n for n in SPARK_QUERIES if n not in ORACLE_SQL]
    ordered = _WINDOW_PRIORITY + rest_oracle + rest_rows_only
    reordered = {n: SPARK_QUERIES[n] for n in ordered}
    SPARK_QUERIES.clear()
    SPARK_QUERIES.update(reordered)


_reorder_registry()
