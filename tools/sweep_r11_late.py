"""One-off ×N sweep harness for the r11 late-addition queries (SCALE.md
appendix methodology): times each query once at sf0.1 and once against a
replicated fixture (tools/stress10x.py output), warm JVM, and prints the
ratio table.  Usage:

    SPARK_GRAFT_DRIVER_MEM=12g python tools/sweep_r11_late.py /tmp/x100
"""

from __future__ import annotations

import sys
import time

QUERIES = [
    "gopher_quality_rules",
    "ngram_novelty",
    "c4_quality_rules",
    "group_safe_split",
    "rrf_fusion_topk",
    "trigram_lm_quality",
    "source_quality_shrunk",
]


def main() -> int:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/x100"
    names = sys.argv[2:] or QUERIES
    import __spark_entry__ as entrymod
    from engine.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        # warm pass at base scale (codegen + first-exec constants)
        fn(spark, "/root/testdata/sf0.1").count()
        t0 = time.time()
        n_small = fn(spark, "/root/testdata/sf0.1").count()
        t_small = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        n_big = fn(spark, big).count()
        t_big = time.time() - t0
        print(
            f"{name}: sf0.1 {t_small:.1f}s ({n_small} rows) | xN {t_big:.1f}s "
            f"({n_big} rows) | ratio {t_big / max(t_small, 1e-9):.1f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
