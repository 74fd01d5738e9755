"""Adversarial-scale skewed fixture generator (round-3 stress gate).

Derives a schema-identical pack from an existing testdata SF dir, replicated
``factor``× with deterministic hash-driven skew injected — the distribution
shapes uniform synthetic data can never produce but a 100 TB corpus always
does:

- **Zipf-ish hot join keys**: 40% of orders land on ONE customer, 30% of
  lineitems on ONE part, 50% of events on ONE user (window-dedup skew).
- **Null-heavy join keys**: 5% of ``o_custkey`` / ``user_id`` are NULL.
- **Duplicate timestamps**: replica events keep the original ``ts``, so hot
  users carry thousands of same-(user, ts) rows — total-order tie-break
  stress for every keep-first window.
- **Hot LSH bucket**: ~3% of documents are BYTE-IDENTICAL copies of one base
  doc — identical minhash/simhash signatures, so every band bucket for that
  family exceeds ``bucket_cap`` and the cap MUST engage (the all-pairs
  blow-up happens in any engine that skips it).
- **Giant near-dup family**: ~52% of documents are class-token + rotation
  variants of the same base — one massive transitive near-dup component for
  the connected-components path.
- **Hot identical-vector cluster**: ~6% of embeddings are copies of the
  ``vec_id=7`` vector — exact cosine ties (rank determinism) and a hot
  sign-LSH bucket.

Everything is derived with DuckDB ``hash()`` over the new key — rerunning
the generator reproduces the same pack bit-for-bit on the same DuckDB
version.  Original rows are preserved verbatim as replica 0 (un-skewed
columns), so every literal the query pack depends on (``vec_id = 7``,
pipeline date windows, …) still exists.

Usage::

    python tools/skewgen.py --base /root/testdata/sf0.1 --out fixtures/skew10 --factor 10

then run the same gates the driver runs::

    python tools/check_oracle.py fixtures/skew10
    SPARK_GRAFT_SF_DIR=fixtures/skew10 python bench.py
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = [
    "region", "nation", "supplier", "part", "customer",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# key strides (max key + 1 in the driver testdata at any SF — derived per
# run from the actual base tables, these are only the documented sf0.1 ones)
HOT_CUSTOMER = 42
HOT_PART = 7
HOT_SUPP = 3
HOT_USER = 123
BASE_DOC = 0
HOT_VEC = 7


def _stride(con, table: str, key: str) -> int:
    return con.execute(f"SELECT COALESCE(MAX({key}), 0) + 1 FROM {table}").fetchone()[0]


def generate(base: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{base}/{t}.parquet'")
    con.execute(f"CREATE VIEW rep AS SELECT UNNEST(range({factor})) AS rep")

    def copy(sql: str, name: str) -> None:
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # dimension tables: verbatim (region/nation) or replicated with shifted keys
    copy("SELECT * FROM region", "region")
    copy("SELECT * FROM nation", "nation")
    s_stride = _stride(con, "supplier", "s_suppkey")
    copy(
        f"SELECT s_suppkey + {s_stride} * rep AS s_suppkey, * EXCLUDE (s_suppkey, rep) "
        "FROM supplier CROSS JOIN rep",
        "supplier",
    )
    p_stride = _stride(con, "part", "p_partkey")
    copy(
        f"SELECT p_partkey + {p_stride} * rep AS p_partkey, * EXCLUDE (p_partkey, rep) "
        "FROM part CROSS JOIN rep",
        "part",
    )
    c_stride = _stride(con, "customer", "c_custkey")
    copy(
        f"SELECT c_custkey + {c_stride} * rep AS c_custkey, * EXCLUDE (c_custkey, rep) "
        "FROM customer CROSS JOIN rep",
        "customer",
    )

    # orders: hot customer + null keys; replica 0 keeps original rows verbatim
    o_stride = _stride(con, "orders", "o_orderkey")
    copy(
        f"""
        SELECT o_orderkey + {o_stride} * rep AS o_orderkey,
               CASE WHEN rep = 0 THEN o_custkey
                    WHEN hash(o_orderkey + {o_stride} * rep) % 100 < 40 THEN {HOT_CUSTOMER}
                    WHEN hash(o_orderkey + {o_stride} * rep) % 100 < 45 THEN NULL
                    ELSE o_custkey + {c_stride} * rep END AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders CROSS JOIN rep""",
        "orders",
    )

    # lineitem: orderkeys track orders; hot part/supplier keys
    copy(
        f"""
        SELECT l_orderkey + {o_stride} * rep AS l_orderkey,
               CASE WHEN rep = 0 THEN l_partkey
                    WHEN hash(l_orderkey + {o_stride} * rep + l_linenumber) % 100 < 30
                    THEN {HOT_PART}
                    ELSE l_partkey + {p_stride} * rep END AS l_partkey,
               CASE WHEN rep = 0 THEN l_suppkey
                    WHEN hash(l_orderkey * 7 + {o_stride} * rep + l_linenumber) % 100 < 20
                    THEN {HOT_SUPP}
                    ELSE l_suppkey + {s_stride} * rep END AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM lineitem CROSS JOIN rep""",
        "lineitem",
    )

    # events: hot user (50%), null user (5%), ts kept verbatim so replicas
    # collide on (user_id, ts) with distinct event_ids
    e_stride = _stride(con, "events", "event_id")
    copy(
        f"""
        SELECT event_id + {e_stride} * rep AS event_id, ts,
               CASE WHEN rep = 0 THEN user_id
                    WHEN hash(event_id + {e_stride} * rep) % 100 < 50 THEN {HOT_USER}
                    WHEN hash(event_id + {e_stride} * rep) % 100 < 55 THEN NULL
                    ELSE user_id END AS user_id,
               event_type, value, props
        FROM events CROSS JOIN rep""",
        "events",
    )

    # documents: 3% byte-identical hot family, 52% rotation near-dup family,
    # 0.5% NULL text, 0.5% empty text, rest unique (distinct suffix token);
    # replica 0 stays verbatim
    d_stride = _stride(con, "documents", "doc_id")
    con.execute(
        f"CREATE VIEW base_doc AS SELECT text AS bt, "
        f"string_split(text, ' ') AS btoks, len(string_split(text, ' ')) AS bn "
        f"FROM documents WHERE doc_id = {BASE_DOC}"
    )
    copy(
        f"""
        WITH expanded AS (
          SELECT doc_id + {d_stride} * rep AS doc_id, rep, text, lang, source,
                 hash(doc_id + {d_stride} * rep) % 1000 AS h
          FROM documents CROSS JOIN rep),
        skewed AS (
          SELECT doc_id,
                 CASE
                   WHEN rep = 0 THEN text
                   WHEN h < 30 THEN bd.bt
                   WHEN h < 550 THEN
                     'x' || CAST(doc_id % 211 AS VARCHAR) || ' ' ||
                     array_to_string(list_concat(
                       list_slice(bd.btoks, 1 + CAST(doc_id % 13 AS INT), bd.bn),
                       list_slice(bd.btoks, 1, CAST(doc_id % 13 AS INT))), ' ')
                   WHEN h < 555 THEN NULL
                   WHEN h < 560 THEN ''
                   ELSE text || ' u' || CAST(doc_id AS VARCHAR)
                 END AS text,
                 lang, source
          FROM expanded CROSS JOIN base_doc bd)
        SELECT doc_id, text, lang, source, LENGTH(text) AS n_chars FROM skewed""",
        "documents",
    )

    # embeddings: 6% hot identical-vector cluster (vec 7's embedding)
    v_stride = _stride(con, "embeddings", "vec_id")
    con.execute(
        f"CREATE VIEW hot_vec AS SELECT embedding AS hv FROM embeddings "
        f"WHERE vec_id = {HOT_VEC}"
    )
    copy(
        f"""
        SELECT vec_id + {v_stride} * rep AS vec_id,
               CASE WHEN rep > 0 AND hash(vec_id + {v_stride} * rep) % 100 < 6
                    THEN hv.hv ELSE embedding END AS embedding,
               label
        FROM embeddings CROSS JOIN rep CROSS JOIN hot_vec hv""",
        "embeddings",
    )
    con.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="fixtures/skew10")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    generate(args.base, args.out, args.factor)


if __name__ == "__main__":
    main()
