"""Final-plan audit for missed AQE exchange reuse (r10, after the Q15 find).

For every registered query, drives the query to its FINAL adaptive plan at
the given SF and flags plans that scan the same parquet table more than
once WITHOUT a ReusedExchange — the signature of a shared subtree whose
two consumers failed to canonicalize identically (the Q15 bug class: an
inferred isnotnull on one side only).  A flagged query is a CANDIDATE, not
a defect: some shapes legitimately scan a table twice (different column
sets / filters — e.g. a self-join on different roles).

    python tools/reuse_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def table_scans(plan: str) -> dict[str, int]:
    """table name -> scan count in the FINAL plan section only."""
    final = plan.split("== Initial Plan ==")[0]
    counts: dict[str, int] = {}
    for m in re.finditer(r"FileScan parquet[^\n]*?\[file:([^\]]+)\]", final):
        name = m.group(1).rstrip("/").rsplit("/", 1)[-1].replace(".parquet", "")
        counts[name] = counts.get(name, 0) + 1
    return counts


def identical_scans(plan: str) -> dict[tuple, int]:
    """(table, ReadSchema, PushedFilters, DataFilters) tuples appearing MORE
    THAN ONCE in the final plan — the high-suspicion signature (r11 triage):
    two scans with different columns/filters are usually different roles,
    but byte-identical scans mean a shared subtree whose consumers failed
    to canonicalize (the q15/dsir isnotnull class) — OR a persisted frame
    whose cached child plan prints per reference (check for
    InMemoryRelation before treating it as a defect)."""
    final = plan.split("== Initial Plan ==")[0]
    seen: dict[tuple, int] = {}
    for m in re.finditer(r"FileScan parquet \[[^\]]*\][^\n]*", final):
        line = m.group(0)
        tm = re.search(r"\[file:([^\]]+)\]", line)
        t = (
            tm.group(1).rstrip("/").rsplit("/", 1)[-1].replace(".parquet", "")
            if tm
            else "?"
        )
        rs = re.search(r"ReadSchema: (\S+)", line)
        pf = re.search(r"PushedFilters: (\[[^\]]*\])", line)
        dfl = re.search(r"DataFilters: (\[[^\]]*\])", line)
        key = (
            t,
            rs.group(1) if rs else "",
            pf.group(1) if pf else "",
            dfl.group(1) if dfl else "",
        )
        seen[key] = seen.get(key, 0) + 1
    return {k: v for k, v in seen.items() if v > 1}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from engine.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    flagged = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"SKIP {name}: {type(e).__name__}")
            continue
        final = plan.split("== Initial Plan ==")[0]
        reused = final.count("ReusedExchange")
        dupes = {t: c for t, c in table_scans(plan).items() if c > 1}
        if dupes and not reused:
            flagged.append(name)
            ident = identical_scans(plan)
            sev = " [IDENTICAL-SCANS — triage first]" if ident else ""
            print(f"FLAG {name}: repeat scans {dupes}, no ReusedExchange{sev}")
    print(f"\n{len(flagged)} flagged" + (f": {flagged}" if flagged else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
