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
    # ---- r9 ROTATION (VERDICT r8 #1): with zero never-driver-checked
    # queries left, the window's job flips from coverage to REGRESSION
    # INSURANCE.  These are the 50 registry queries whose latest driver row
    # is OLDEST (2×r1, 34×r3, 14×r4 — computed from CORRECTNESS_r01..r08);
    # the code under them has churned since (queries-package split r7,
    # oracle re-pairings and scrub/regex fixes r8).  Tail r4 slots are
    # swapped for new r9 queries as they land (windowed-at-birth rule) —
    # the displaced r4 names stay stalest-first for the r10 rotation.
    # Last driver row r1.
    "window_running_total", "topk_per_group",
    # Last driver row r3.
    "p2_null_normalize", "p3_trim_projection", "p4_ts_to_date", "p6_in_list",
    "j1_left_join_fanout", "j2_dim_chain_join", "j6_deleted_enrich",
    "j8_coalesce_fill", "j9_retry_overlay", "j7_overlay_join", "a5_null_rate",
    "f3_f4_scrub_assemble", "f5_f12_casts", "f7_f8_geoid_assembly",
    "f13_json_records", "q3_order_revenue_topk", "q5_nation_revenue",
    "rollup_revenue", "pivot_status_counts", "setops_customer_keys",
    "st2_incremental_page", "st5_stall_detect", "tumbling_window_agg",
    "sliding_window_agg", "session_window_agg", "text_token_stats",
    "text_quality", "lang_id", "dedup_exact", "dedup_ngram_jaccard",
    "multimodal_meta", "date_funcs_pack", "pii_redact", "repetition_metrics",
    # Last driver row r4.
    "j5_memo_probe", "o1_keyset_page", "f6_tz_local_date",
    # r9 new queries, windowed at birth (displacing the 11 stalest-r4 tail
    # picks ann_ivf_topk/knn_join_exact/semdedup_pairs/semdedup_prune/
    # semdedup_incremental/bm25_rank/dedup_minhash_incremental/
    # dedup_simhash/ann_lsh_topk/embedding_near_dup/dedup_minhash_cc,
    # which lead the r10 rotation).
    "q4_order_priority", "q12_shipmode_priority", "q16_part_supplier_counts",
    "q19_discounted_revenue", "q22_global_sales_opportunity",
    "hll_native_cells",
    "q8_national_market_share", "q9_product_type_profit",
    "q10_returned_item_revenue", "q11_important_parts", "q15_top_supplier",
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
