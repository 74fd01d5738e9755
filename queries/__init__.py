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
    # ---- r11 ROTATION (VERDICT r10 #1): regression insurance on the
    # now-stalest cohort.  Staleness histogram after r10 (latest driver row
    # per live query, computed from CORRECTNESS_r01..r10): r5:30, r6:44,
    # r7:30, r8:50, r9:50, r10:50.  The 50 slots fill stalest-first: ALL 30
    # r5-checked queries, then 20 of the 44 r6-checked.  Within the r6 tie
    # the two queries whose code/oracle is touched THIS round go first
    # (windowed-at-birth rule: memo_lookup_or_compute — r11 __hit-marker
    # rework; mixture_sample — r10 epsilon fix never driver-rechecked),
    # then alphabetical.  The 24 displaced r6 names stay stalest-first for
    # the r12 rotation.
    # Last driver row r5 (30 — the full cohort).
    "ann_ivfpq_topk", "bpe_encode_tokens", "bpe_fertility_by_lang",
    "bpe_merge_rules", "clustering_coeff_topk", "code_detect_stats",
    "contamination_bloom", "embedding_quantize", "entity_ids_incremental",
    "entity_match", "event_path_topk", "golden_user_profile",
    "line_dedup_incremental", "line_dedup_rewrite", "mmr_select_topk",
    "mojibake_repair", "negative_sample_topk", "pagerank_topk",
    "quality_calibration", "range_frame_hour_sum", "recipe_pipeline",
    "rollup_hour_to_day", "script_profile", "spatial_radius_join",
    "split_leakage_audit", "triangle_count_topk", "url_canonical_groups",
    "vocab_drift_kl", "weighted_sample_topk", "winsorized_stats",
    # Last driver row r6 (20 of 44: touched-this-round first, then A-Z).
    "memo_lookup_or_compute", "mixture_sample",
    "ann_recall_audit", "asof_join_forward", "bloom_prefilter_join",
    "bucketed_join_colocated", "cms_heavy_hitters", "cms_merge_shards",
    "corpus_curation_pipeline", "corpus_pipeline_v4",
    "correlated_above_group_avg", "cross_source_overlap", "cube_agg",
    "dataset_split", "dedup_bloom_incremental", "dp_noisy_counts",
    "dup_cluster_size_hist", "dup_rate_by_source", "exists_subquery",
    "grouping_sets_agg",
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
