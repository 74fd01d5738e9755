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
    # ---- r7 ROTATION (VERDICT r6 #1): after six artifacts, exactly 37
    # registry queries have never earned a driver row — 27 oracle-paired
    # (the 12 r6 operators + the 15 r6-queued leftovers) and 10 rows-only
    # seams.  This window fronts ALL 37 (the rows-only ones intentionally:
    # a driver rows-only row is the hardest signal those seams can earn —
    # see _WINDOW_ROWS_ONLY) plus 13 driver-green representatives covering
    # every §2 family and the headline end-to-end chains.  Every rotated-
    # out query stays green under the full local oracle gate
    # (tools/check_oracle.py, gate #1 of the verify ladder).
    # §2 core representatives (driver-green r1-r6).
    "p5_range_scan",            # P: scan + range/null predicates
    "j4_keepfirst_dedup",       # J + window dedup
    "a1_stall_guard_minmax",    # A: min/max stall aggregate
    "f1_f2_address_key_hash",   # F: null-safe concat + keyed hash
    "st4_stream_dedup",         # ST: cross-batch dedup
    "flagship_patron_chain",    # flagship chain
    "pipeline_new_mode",        # end-to-end NEW-mode pipeline
    "q1_pricing_summary",       # TPC-H-shape aggregate
    "dedup_minhash_lsh",        # near-dup family
    "ann_cosine_topk",          # similarity family
    "cdc_apply_changelog",      # CDC family
    # r7 TPC-H subquery shapes (VERDICT r6 #6) — windowed at birth
    "q2_min_cost_supplier", "q20_excess_share_suppliers",
    # r6 operators (judge-green at sf0.01, never driver-windowed).
    "incremental_agg_merge", "dedup_keep_best", "balanced_shards",
    "moments_shard_merge", "length_bucket_batches", "token_budget_select",
    "curriculum_interleave", "label_propagation_communities",
    "mad_outliers_by_user", "profile_drift_audit", "event_transition_probs",
    "snapshot_diff_changelog",
    # r6-queued leftovers (judge-green at sf0.01, never driver-windowed).
    "centroid_drift_by_label", "token_gini_by_source",
    "readability_by_source", "multivariate_outliers", "lang_source_mi",
    "bpe_symbol_stats", "zorder_key", "label_centroids", "chunk_tokens",
    "corpus_pipeline_v2", "doclen_quantiles", "doclen_histogram",
    "exists_order_priority", "rich_idle_customers", "supplier_value_share",
    # Rows-only seams (weaker driver check — rows>0 + stable schema — but
    # it is the only driver signal these can ever earn; see allowlist).
    "multimodal_features", "multimodal_decode", "image_near_dup",
    "audio_features", "audio_near_dup", "approx_sketches",
    "stratified_sample", "geocode_cascade_fake", "address_parse",
    "compression_quality",
]
assert len(_WINDOW_PRIORITY) == 50, len(_WINDOW_PRIORITY)

#: rows-only queries DELIBERATELY spent on window slots this round (r7):
#: each name here lacks a SQL oracle by nature (external-call seams, binary
#: media, engine-native hash families) and has never appeared in a
#: CORRECTNESS artifact.  Any window entry that is rows-only but NOT in
#: this allowlist is still an error — a slot burned by accident.
_WINDOW_ROWS_ONLY = {
    "multimodal_features", "multimodal_decode", "image_near_dup",
    "audio_features", "audio_near_dup", "approx_sketches",
    "stratified_sample", "geocode_cascade_fake", "address_parse",
    "compression_quality",
}


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
