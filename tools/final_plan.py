"""Print the FINAL adaptive physical plan (post-execution) for named queries.

Usage: python tools/final_plan.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, help="write DIR/<name>_final.txt instead of stdout")
    args = ap.parse_args()

    spark = get_spark(app_name="final-plan",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from queries import SPARK_QUERIES

    for name in args.names:
        df = SPARK_QUERIES[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            with open(os.path.join(args.out, f"{name}_final.txt"), "w") as f:
                f.write(plan)
            print(f"{name}: wrote {len(plan)} chars")
        else:
            print(f"===== {name} =====")
            print(plan)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
