"""Plain N× replication probe (SCALE.md appendix methodology).

Replicates a testdata SF dir ``factor``× with DISTINCT keys per replica and
NO skew injection (tools/skewgen.py is the hostile-distribution sibling) —
the fixture for the "does wall time stay sublinear in data volume" probe
each round's SCALE.md appendix reports.

Replicas must not manufacture the very distributions the probe excludes:

- ``documents.text`` gets a per-replica suffix (verbatim copies would make
  every doc an N-way exact/near-dup family — that's skewgen's job);
- ``embeddings.embedding`` gets its first component nudged by ``rep·1e-3``
  (verbatim vectors would form N-way identical-cosine hot clusters);
- ``events.user_id`` shifts with the replica (verbatim ids would put N× the
  rows in each window-dedup partition);
- ``lineitem.l_orderkey`` shifts by the ORDERS stride so the FK chain stays
  join-consistent across replicas.

Replica 0 is always the base data verbatim, so every literal the query pack
depends on still exists.
"""

from __future__ import annotations

import argparse
import os

import duckdb

#: table -> key columns shifted per replica (stride = max(key)+1 of the base)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]


def _stride(con, table: str, key: str) -> int:
    return con.execute(f"SELECT MAX({key}) + 1 FROM {table}").fetchone()[0] or 1


def generate(
    base: str, out: str, factor: int, tables: list[str] | None = None
) -> None:
    """``tables``: restrict generation to a subset (e.g. documents +
    embeddings for the near-dup/ANN family probe at factors where the full
    FK chain would dominate generation time and disk for no added signal)."""
    keyed = {t: k for t, k in KEYED.items() if tables is None or t in tables}
    verbatim = [t for t in VERBATIM if tables is None or t in tables]
    want_lineitem = tables is None or "lineitem" in tables
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    src = list(keyed) + verbatim + (["lineitem", "orders"] if want_lineitem else [])
    for t in dict.fromkeys(src):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{base}/{t}.parquet'")
    con.execute(f"CREATE VIEW rep AS SELECT UNNEST(range({factor})) AS rep")

    def copy(sql: str, name: str) -> None:
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in verbatim:
        copy(f"SELECT * FROM {t}", t)

    #: per-table non-key rewrites keeping replica 0 verbatim
    perturb = {
        "documents": {
            "text": "CASE WHEN rep = 0 THEN text "
                    "ELSE text || ' v' || CAST(rep AS VARCHAR) END AS text"
        },
        "embeddings": {
            "embedding": "CASE WHEN rep = 0 THEN embedding ELSE "
                         "list_concat([CAST(embedding[1] + rep * 0.001 AS FLOAT)], "
                         "embedding[2:]) END AS embedding"
        },
    }
    for t, keys in keyed.items():
        strides = {k: _stride(con, t, k) for k in keys}
        shifted = [f"{k} + {strides[k]} * rep AS {k}" for k in keys]
        rewritten = list(perturb.get(t, {}).values())
        excl = keys + list(perturb.get(t, {})) + ["rep"]
        copy(
            f"SELECT {', '.join(shifted + rewritten)}, * EXCLUDE ({', '.join(excl)}) "
            f"FROM {t} CROSS JOIN rep",
            t,
        )
    if want_lineitem:
        o_stride = _stride(con, "orders", "o_orderkey")
        copy(
            f"SELECT l_orderkey + {o_stride} * rep AS l_orderkey, "
            "* EXCLUDE (l_orderkey, rep) FROM lineitem CROSS JOIN rep",
            "lineitem",
        )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/root/testdata/sf0.1")
    p.add_argument("--out", required=True)
    p.add_argument("--factor", type=int, default=10)
    p.add_argument("--tables", nargs="*", default=None,
                   help="restrict to these tables (default: all)")
    a = p.parse_args()
    generate(a.base, a.out, a.factor, tables=a.tables)


if __name__ == "__main__":
    main()
