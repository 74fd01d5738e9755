"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with the noop sink (full plan executes, nothing is
collected to the driver).  Warm-up policy: every headline query runs once,
untimed, at sf0.001 first — same plan shape, so whole-stage-codegen and
planner caches are hot — then the timed pass runs at the target SF.  The
timed numbers therefore measure data-proportional execution, which is the
quantity that extrapolates to cluster scale (at 100 TB, one-time JIT cost
is amortized to zero; on local[32] with ~MB inputs it would otherwise be
the majority of wall time and drown the signal).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from engine.session import get_spark  # noqa: E402

#: headline set: the flagship chain, scan-heavy aggs, join/window shapes, and
#: the north-star dedup/similarity operators — the queries whose plans decide
#: 100 TB viability.
HEADLINE = [
    "flagship_patron_chain",
    "q1_pricing_summary",
    "q3_order_revenue_topk",
    "q5_nation_revenue",
    "j1_left_join_fanout",
    "j4_keepfirst_dedup",
    "window_running_total",
    "topk_per_group",
    "session_window_agg",
    "tumbling_window_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "pii_redact",
    "repetition_metrics",
    "ann_cosine_topk",
    "semdedup_pairs",
    "f1_f2_address_key_hash",
    "cdc_apply_changelog",
    "vocab_stats",
    "dsir_select",
    "pipeline_new_mode",
]

#: operators added after the pack was frozen (round-2/3): timed separately so
#: the headline total stays round-over-round comparable; reported in the same
#: JSON line under "secondary" (not counted in "value").
SECONDARY = [
    "bigram_lm_quality",
    "url_domain_stats",
    "temperature_mixture_sample",
    "embedding_matryoshka",
    "doc_overlap_winnow",
    "corpus_pipeline_v3",
    "bm25_rank",
    "span_dup_stats",
    "span_dedup_rewrite",
    "global_order_positions",
    # round-3 additions
    "html_extract",
    "quality_classifier",
    "char_entropy",
    "table_profile",
    "perplexity_buckets",
    # round-4 continuation additions
    "ann_pq_adc_topk",
    "contamination_bloom",
    "bpe_merge_rules",
    "pagerank_topk",
    "funnel_conversion",
    "pmi_collocations",
    "embedding_jl_project",
    # round-4 second-continuation additions
    "timeseries_anomaly",
    "ewma_smooth",
    "timeseries_lttb",
    "bpe_encode_tokens",
    "triangle_count_topk",
    "entity_match",
    "mmr_select_topk",
    "weighted_sample_topk",
    "split_leakage_audit",
    "script_profile",
    "code_detect_stats",
    "winsorized_stats",
    "negative_sample_topk",
    "compression_quality",
    "vocab_drift_kl",
    "rollup_hour_to_day",
    "event_path_topk",
    "entity_ids_incremental",
    "golden_user_profile",
    "lang_source_mi",
    "quality_calibration",
    "bpe_fertility_by_lang",
    "range_frame_hour_sum",
    "spatial_radius_join",
    "readability_by_source",
    "token_gini_by_source",
    "multivariate_outliers",
    "centroid_drift_by_label",
    "clustering_coeff_topk",
    # round-5 additions
    "cms_heavy_hitters",
    "cms_merge_shards",
    "salted_distinct_users",
    "skew_salted_enrich",
    "bloom_prefilter_join",
    "bucketed_join_colocated",
    "hll_shard_merge",
    "k_anonymity_audit",
    "dedup_bloom_incremental",
    "hist_shard_merge",
    "corpus_pipeline_v4",
    "asof_join_forward",
    "hll_set_ops",
    "hll_windowed_users",
    "dp_noisy_counts",
    "rolling_median_value",
    "join_key_skew_stats",
    "ann_recall_audit",
    "dup_cluster_size_hist",
    "cross_source_overlap",
    # round-6 additions
    "incremental_agg_merge",
    "dedup_keep_best",
    "balanced_shards",
    "moments_shard_merge",
    "length_bucket_batches",
    "token_budget_select",
    "curriculum_interleave",
    "label_propagation_communities",
    "mad_outliers_by_user",
    "profile_drift_audit",
    "event_transition_probs",
    "snapshot_diff_changelog",
    # round-7 additions
    "q2_min_cost_supplier",
    "q20_excess_share_suppliers",
    "scd2_point_in_time_join",
    "l_diversity_audit",
    "attribution_last_click",
    "phrase_search_topk",
    "embedding_covariance_block",
    "bottomk_shard_merge",
    "jaccard_bottomk_overlap",
    "hilbert_key",
    "stratified_kfold_balance",
    "rendezvous_routing",
    "join_size_estimate",
    "score_quantile_normalize",
    "video_frame_sample",
    "ivf_index_incremental",
    "lsh_recall_audit",
    "ranking_auc_value",
    "corpus_pipeline_v5",
    # round-8 additions
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue_share",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "theta_sketch_setops",
    "minhash_recall_frontier",
    "gaps_and_islands",
    "trimmed_mean_stats",
    # round-9 additions (Q4/Q12/Q16/Q19/Q22 landed earlier in the round)
    "q4_order_priority",
    "q12_shipmode_priority",
    "q16_part_supplier_counts",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q8_national_market_share",
    "q9_product_type_profit",
    "q10_returned_item_revenue",
    "q11_important_parts",
    "q15_top_supplier",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


#: Steal-calibration anchor (VERDICT r10 #2): a fixed, seeded, single-thread
#: CPU loop timed alongside the pack.  Its wall time on an uncontended host
#: is a constant, so anchor_sec / ANCHOR_NOMINAL_SEC is the host's current
#: slowdown factor (hypervisor steal + sibling load) and
#: total / steal_factor is a round-over-round comparable normalized total —
#: no more frozen-tree A/B/A worktree runs to adjudicate bench drift.
#: ANCHOR_ITERS is frozen forever (changing it breaks cross-round
#: comparability); ANCHOR_NOMINAL_SEC is the r11 near-idle measurement
#: (min-of-7 = 0.546 s, loadavg < 2) rounded to the declared nominal.
ANCHOR_ITERS = 3_200_000
ANCHOR_NOMINAL_SEC = 0.55


def _anchor_once() -> float:
    x = 0x9E3779B97F4A7C15
    t0 = time.perf_counter()
    for _ in range(ANCHOR_ITERS):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 29
    assert x != 0  # keep the loop un-eliminable
    return time.perf_counter() - t0


def anchor_sample(n: int = 3) -> float:
    """Median of ``n`` anchor runs — the current host slowdown sample."""
    return round(sorted(_anchor_once() for _ in range(n))[n // 2], 4)


#: Spark-side anchor: a fixed 400M-row range aggregate on 32 partitions.
#: The pure-Python loop above is register-resident, so it is blind to the
#: contention classes that actually slow the pack (memory bandwidth, JVM
#: scheduling) — measured 2026-08-16: pack +25% while the CPU anchor read
#: 1.01×.  This one exercises codegen + multi-core + the JVM itself.
#: Nominal is defined IN-BENCH (as sampled at the anchor's position in a
#: bench.py run, after the full warm-up + headline passes): a cold session
#: reads ~2× slower for the same job (shallower C2 JIT), so a
#: standalone-session calibration is not comparable.  r11 fast-host
#: in-bench median: 0.145 s, on a run whose pack total (15.8 s) was the
#: best ever recorded for the tree — i.e., genuinely near-idle.
SPARK_ANCHOR_NOMINAL_SEC = 0.14
_spark_anchor_warm = False


def spark_anchor_sample(spark, n: int = 3) -> float:
    """Median of ``n`` runs of the fixed Spark anchor job (first use runs
    one extra untimed pass so codegen compilation never pollutes a sample)."""
    global _spark_anchor_warm

    def one() -> float:
        t0 = time.perf_counter()
        spark.range(0, 400_000_000, 1, 32).selectExpr(
            "sum(id % 2654435761) as s"
        ).collect()
        return time.perf_counter() - t0

    if not _spark_anchor_warm:
        one()
        _spark_anchor_warm = True
    return round(sorted(one() for _ in range(n))[n // 2], 4)


def _ensure_skew_pack() -> str | None:
    """Generate (once; cached by a marker file) the bench skew pack:
    sf0.01 base replicated ×10 by tools/skewgen.py — same row volume as the
    uniform sf0.1 pack, hostile distribution."""
    base = os.environ.get("SPARK_GRAFT_SKEW_BASE", "/root/testdata/sf0.01")
    factor = int(os.environ.get("SPARK_GRAFT_SKEW_FACTOR", "10"))
    out = os.environ.get(
        "SPARK_GRAFT_SKEW_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "fixtures", "skew_bench"),
    )
    marker = os.path.join(out, f".skewgen-{os.path.basename(base)}-x{factor}")
    if not os.path.exists(marker):
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
            import skewgen

            skewgen.generate(base, out, factor=factor)
            with open(marker, "w") as f:
                f.write("ok\n")
        except Exception as e:  # pragma: no cover - bench must still report
            print(f"skew pack generation failed ({e}); skipping skew pass",
                  file=sys.stderr)
            return None
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # no stage-progress bar: its \r spam consumed the driver's output tail
    # buffer in r4 and truncated the JSON record (BENCH_r04 "parsed": null)
    spark = get_spark(
        app_name="spark-graft-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from queries import SPARK_QUERIES

    # warm-up (untimed): run every headline query once at sf0.001.  Identical
    # plan shapes → codegen/planner caches are hot for the timed pass, whose
    # numbers then scale with data volume, not first-use JVM compilation.
    # The headline pack is warmed AND timed before any secondary query runs:
    # the secondary list grows every round, and warming it first measurably
    # inflates the timed headline (~15% heap/GC drag at r4's 31 entries) —
    # ordering keeps the frozen pack's total comparable round-over-round.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in HEADLINE:
        force(SPARK_QUERIES[name](spark, warm_dir))
        spark.catalog.clearCache()
    # parquet footers of the target SF (I/O warm-up, not plan warm-up)
    for name in ("region", "lineitem", "documents"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").limit(1).count()

    # Timed headline pass runs 3× and reports per-query MEDIANS: the host's
    # hypervisor-steal band (±18% on identical code, measured r3-r5) exceeds
    # any real round-over-round delta, so a single pass can't distinguish a
    # plan regression from scheduler noise.  Medians of 3 cut the band to a
    # usable signal at ~2 min added wall time.  secondary/skewed stay 1×.
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    # Anchor sampling brackets EVERY pass (pre, between passes, post): host
    # steal oscillates on minute timescales (r10's 16.2→23.1 s same-tree
    # band), so two endpoint samples can read near-nominal while the pack
    # itself ran through a slow phase.  passes+1 samples, median reported.
    anchors = [anchor_sample()]
    spark_anchors = [spark_anchor_sample(spark)]
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(passes):
        for name in HEADLINE:
            fn = SPARK_QUERIES[name]
            t0 = time.time()
            force(fn(spark, sf_dir))
            samples[name].append(time.time() - t0)
            spark.catalog.clearCache()
        anchors.append(anchor_sample())
        spark_anchors.append(spark_anchor_sample(spark))
    timings = {name: round(sorted(ts)[len(ts) // 2], 3)
               for name, ts in samples.items()}
    total = sum(timings.values())
    anchor_sec = round(sorted(anchors)[len(anchors) // 2], 4)
    spark_anchor_sec = round(sorted(spark_anchors)[len(spark_anchors) // 2], 4)
    # the Spark anchor sees the contention classes the CPU loop is blind to
    # (memory bandwidth, JVM scheduling) — it is the normalizing factor; the
    # CPU anchor stays as corroboration for pure core-steal episodes
    steal = round(spark_anchor_sec / SPARK_ANCHOR_NOMINAL_SEC, 3)

    secondary: dict[str, float] = {}
    for name in SECONDARY:
        force(SPARK_QUERIES[name](spark, warm_dir))
        spark.catalog.clearCache()
    for name in SECONDARY:
        fn = SPARK_QUERIES[name]
        t0 = time.time()
        force(fn(spark, sf_dir))
        secondary[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    # Post-phase anchor (r11 opt): the headline anchors bracket only the
    # headline passes, so a steal episode during the (longer) secondary or
    # skew phase was previously invisible — one r11-opt run read uniform
    # 2-10× inflation on UNTOUCHED secondary queries with near-nominal
    # headline anchors.  Additive field; the headline JSON contract is
    # unchanged.
    spark_anchor_post_secondary = spark_anchor_sample(spark)

    # Skew pass (VERDICT r3 #8): the same frozen headline pack over a
    # skewgen-derived pack of EQUAL volume (sf0.01 base × factor 10 ≈ sf0.1
    # rows) with hot join keys / null keys / duplicate timestamps / hot LSH
    # buckets injected — so a perf regression on skewed keys is caught
    # round-over-round the way correctness ones are.  Expectation: no query
    # >2× its uniform-data time.  Disable with SPARK_GRAFT_SKEW=0.
    skewed: dict[str, float] = {}
    skew_extra: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SKEW", "1") != "0":
        skew_dir = _ensure_skew_pack()
        if skew_dir is not None:
            for name in HEADLINE:
                fn = SPARK_QUERIES[name]
                t0 = time.time()
                force(fn(spark, skew_dir))
                skewed[name] = round(time.time() - t0, 3)
                spark.catalog.clearCache()
            # Capped vector/fingerprint ops OUTSIDE the frozen headline:
            # their caps are load-bearing exactly on hostile keys (r11 —
            # uncapped embedding_near_dup ran >6 min on this fixture), so
            # regressions belong in the per-round record.  Reported
            # separately; NOT added to skewed_total (which stays
            # round-over-round comparable for the frozen pack).
            for name in ("embedding_near_dup", "doc_overlap_winnow",
                         "semdedup_incremental", "dedup_ngram_jaccard",
                         "dedup_weighted_jaccard"):
                fn = SPARK_QUERIES[name]
                t0 = time.time()
                force(fn(spark, skew_dir))
                skew_extra[name] = round(time.time() - t0, 3)
                spark.catalog.clearCache()

    # Output contract: the driver records only the last ~2,000 chars of
    # stdout, so the big secondary/skewed blocks print FIRST on their own
    # lines and the headline JSON (metric/value/queries — ~850 chars for the
    # frozen 21-query pack) is the guaranteed LAST line.  r4 and r5 both lost
    # the headline to tail truncation when everything shared one 3.3k line.
    spark_anchor_post_skew = spark_anchor_sample(spark)
    print(
        json.dumps({"metric": "secondary_query_timings", "unit": "sec",
                    "secondary": secondary,
                    "secondary_total": round(sum(secondary.values()), 3),
                    "spark_anchor_post_secondary": spark_anchor_post_secondary,
                    "spark_anchor_nominal_sec": SPARK_ANCHOR_NOMINAL_SEC}),
        flush=True,
    )
    print(
        json.dumps({"metric": "skewed_headline_pack", "unit": "sec",
                    "skewed": skewed,
                    "skewed_total": round(sum(skewed.values()), 3),
                    "skew_extra": skew_extra,
                    "spark_anchor_post_skew": spark_anchor_post_skew}),
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_pack_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "skewed_total": round(sum(skewed.values()), 3),
                "passes": passes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # steal calibration: anchor_sec / nominal = host slowdown;
                # value / steal_factor is the cross-round comparable number.
                "anchor_sec": anchor_sec,
                "anchor_samples": anchors,
                "anchor_nominal_sec": ANCHOR_NOMINAL_SEC,
                "spark_anchor_sec": spark_anchor_sec,
                "spark_anchor_samples": spark_anchors,
                "spark_anchor_nominal_sec": SPARK_ANCHOR_NOMINAL_SEC,
                "steal_factor": steal,
                "value_steal_normalized": round(total / max(steal, 0.01), 3),
                # parallelism contract audit (VERDICT r11 #1): the JVM's
                # actual master + task-slot count, so a c8-vs-c32 driver run
                # is externally verifiable (the r11 scaling block could not
                # distinguish "env var lost" from "host caps effective
                # cores").  Additive fields; the last-line contract holds.
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "host_cpu_count": os.cpu_count(),
            }
        ),
        flush=True,
    )
    sys.stderr.flush()
    spark.stop()


if __name__ == "__main__":
    main()
