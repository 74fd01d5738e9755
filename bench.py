"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with the noop sink (full plan executes, nothing is
collected to the driver), after a warm-up pass of the parquet footer reads.
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
    "ann_cosine_topk",
    "f1_f2_address_key_hash",
    "cdc_apply_changelog",
    "vocab_stats",
    "pipeline_new_mode",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="spark-graft-bench")

    from queries import SPARK_QUERIES

    # warm-up (untimed): parquet footers + JIT for the operator classes the
    # pack uses — hash-agg, window, broadcast join, explode+hash-agg, top-k —
    # so per-query timings measure the queries, not first-use JVM compilation.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for name in ("region", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").limit(1).count()
    r = spark.range(10000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(100).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    w = Window.partitionBy("k").orderBy("v")
    warm = (
        r.join(F.broadcast(dim), "k")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.min(F.xxhash64("d", F.lit(1))).alias("h"))
        .orderBy(F.col("s").desc())
        .limit(5)
    )
    warm.write.format("noop").mode("overwrite").save()
    spark.range(1000).select(
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("e")
    ).groupBy("e").count().write.format("noop").mode("overwrite").save()
    # the OPH signature + LSH self-join pipeline is the pack's largest plan —
    # compile its parquet-scan-shaped codegen once at sf0.001 (same plan shape
    # as the timed run; a local-relation corpus misses the codegen cache)
    from engine.extended.dedup import minhash_candidates
    from engine.schemas import load_table

    tiny = load_table(spark, "/root/testdata/sf0.001", "documents")
    minhash_candidates(tiny).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = SPARK_QUERIES[name]
        t0 = time.time()
        force(fn(spark, sf_dir))
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "headline_query_pack_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
