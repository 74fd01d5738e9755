"""Plain N× replication probe (SCALE.md appendix methodology).

Replicates a testdata SF dir ``factor``× with DISTINCT keys per replica and
NO skew injection (tools/skewgen.py is the hostile-distribution sibling) —
the fixture for the "does wall time stay sublinear in data volume" probe
each round's SCALE.md appendix reports.

Usage::

    python tools/stress10x.py --base /root/testdata/sf0.1 --out fixtures/x10 --factor 10
    python - <<'PY'   # then time operators against fixtures/x10
"""

from __future__ import annotations

import argparse
import os

import duckdb

#: table -> key columns to shift per replica (stride = max(key)+1 of the base)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]


def generate(base: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in list(KEYED) + VERBATIM:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{base}/{t}.parquet'")
    con.execute(f"CREATE VIEW rep AS SELECT UNNEST(range({factor})) AS rep")
    for t in VERBATIM:
        con.execute(f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    for t, keys in KEYED.items():
        strides = {
            k: con.execute(f"SELECT MAX({k}) + 1 FROM {t}").fetchone()[0] or 1
            for k in keys
        }
        shifted = ", ".join(f"{k} + {strides[k]} * rep AS {k}" for k in keys)
        excl = ", ".join(keys + ["rep"])
        con.execute(
            f"COPY (SELECT {shifted}, * EXCLUDE ({excl}) FROM {t} CROSS JOIN rep) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/root/testdata/sf0.1")
    p.add_argument("--out", required=True)
    p.add_argument("--factor", type=int, default=10)
    a = p.parse_args()
    generate(a.base, a.out, a.factor)


if __name__ == "__main__":
    main()
