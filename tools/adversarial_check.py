"""Adversarial oracle audit: run every oracle-paired query against tiny
hand-crafted tables full of edge cases — sort ties, blank/whitespace strings,
duplicate rows, same-timestamp events, zero vectors, empty text — and
compare Spark vs DuckDB exactly like the driver would.

The shipped testdata is well-behaved; divergences on ties/NaN/null ordering
only fire on data like this.  Usage: python tools/adversarial_check.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, ".")

import pandas as pd  # noqa: E402

import duckdb  # noqa: E402

from tools.check_oracle import TABLES, canon, compare  # noqa: E402


def duck_con_dirs(sf_dir: str):
    """DuckDB views over Spark-written parquet DIRECTORIES (vs the driver's
    single files)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    return con


def build_tables(path: str, spark) -> None:
    def write(name, pdf, schema):
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/{name}.parquet")

    write(
        "region",
        # duplicate names, trailing space; ASIA so the q8 market join fires
        [(0, "ALPHA"), (1, "ALPHA"), (2, "beta "), (3, "ASIA")],
        "r_regionkey int, r_name string",
    )
    write(
        "nation",
        [(i, n, i % 3) for i, n in enumerate(
            ["CHINA", "CHINA", "FRANCE", "none", "", "  ", "PERU", "peru"]
        )]
        # NATION_1/NATION_2 in the ASIA region so the q7/q8/q11 nation
        # literals match edge rows (they were vacuously empty before r9)
        + [(8, "NATION_1", 3), (9, "NATION_2", 3)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    write(
        "customer",
        [
            (1, "Alice", 0, 100.0, "BUILDING"),
            (2, "Alice", 0, 100.0, "BUILDING"),     # full tie with 1
            (3, "", 1, -5.559999999, "none"),        # blank name, near-half bal
            (4, "Dora", 2, 0.0, ""),                 # empty segment
            (5, "Eve", 2, 5000.0, "MACHINERY"),
            (6, "O'Hara \"Q\"", 1, None, "BUILDING"),  # quotes + null bal
            (7, "Zed", 8, 0.005, "MACHINERY"),  # NATION_1/ASIA (q8 market)
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    write(
        "supplier",
        # suppliers 3/4 sit in NATION_1/NATION_2 (q8 share / q11 prune);
        # 0.005 acctbal is a cents-rounding half-way trap
        [(1, "S1", 0, 10.0), (2, "S1", 0, 10.0), (3, "S3", 8, 0.005),
         (4, "S4", 9, -0.005)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    write(
        "part",
        [
            (1, "azure linen", "Brand#1", "PROMO BURNISHED", 5, 1.005),
            (2, "azure linen", "Brand#1", "PROMO BURNISHED", 5, 1.005),  # dup
            (3, "x", "B2", " ", 0, 0.0),  # whitespace type
            # STANDARD + widget names so q8/q9 fire on edge rows; .005 and
            # .995 retail prices stress FLOOR(x*100+0.5) in the q9 cost term
            (4, "mega widget", "Brand#12", "STANDARD", 1, 10.005),
            (5, "tiny widget", "Brand#3", "STANDARD", 1, 0.995),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    d0 = dt.datetime(1995, 6, 1)
    write(
        "orders",
        [
            # same customer, identical totalprice (topk tie), same date
            (10, 1, "O", 500.0, d0, "1-URGENT"),
            (11, 1, "O", 500.0, d0, "1-URGENT"),
            (12, 1, "F", 250.125, d0, "none"),
            (13, 2, "F", 0.0, dt.datetime(1995, 6, 2), ""),
            (14, 3, "P", 99.995, dt.datetime(1994, 12, 31, 23, 59, 59), "  "),
            (15, 5, "O", 300000.5, dt.datetime(1996, 1, 1), "5-LOW"),
            (20, 6, "F", 500.0, d0, "2-HIGH"),  # F + orderkey%10==0 → CDC delete
            (21, 4, "O", -123.455, d0, "3-MEDIUM"),  # negative price
            # inside Q1-1995 (q10's quarter; boundary row at its last second)
            # and q8's 1995-96 order window; customer 7 is the ASIA edge row
            (16, 7, "O", 100.0, dt.datetime(1995, 2, 1), "1-URGENT"),
            (17, 1, "F", 100.0,
             dt.datetime(1995, 3, 31, 23, 59, 59), "2-HIGH"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    write(
        "lineitem",
        [
            # duplicate complete rows (j4 full tie) + a second linenumber
            (10, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", d0),
            (10, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", d0),
            (10, 2, 1, 2, 3.0, 50.0, 0.06, 0.01, "N", "O", d0),
            (11, 3, 2, 1, 0.0, 0.0, 0.0, 0.0, "R", "F", dt.datetime(1994, 3, 1)),
            (12, 1, 1, 1, 24.0, 10.0, 0.07, 0.0, "A", "F", dt.datetime(1994, 6, 1)),
            # r9: rows that light up the TPC-H completion set on edge data —
            # R-flag lines on the Q1-1995 orders (q10), NATION_1 supplier 3
            # (q8 share numerator, q11 prune), widget/STANDARD parts 4/5
            # (q9), shipdates at both q15 window boundaries (>= start, just
            # under end), and .005/.015/.995 money endings whose float
            # representations sit just BELOW the half-cent (FLOOR(x*100+0.5)
            # must agree bit-for-bit across engines)
            (16, 4, 3, 1, 2.0, 1.005, 0.0, 0.0, "R", "O",
             dt.datetime(1995, 5, 1)),
            (16, 4, 3, 2, 1.0, 99.995, 0.05, 0.0, "N", "O",
             dt.datetime(1995, 6, 30, 23, 59, 59)),
            (17, 5, 3, 1, 3.0, 0.015, 0.1, 0.0, "R", "F",
             dt.datetime(1995, 4, 1)),
            (17, 5, 4, 2, 1.0, 200.0, 1.0, 0.0, "R", "F",  # 100% discount
             dt.datetime(1995, 7, 1)),  # first instant PAST the q15 window
            # NULL suppkey: SQL NOT IN drops it, a bare anti join keeps
            # it — pins q16's explicit NULL exclusion (review catch r9)
            (12, 4, None, 3, 2.0, 7.005, 0.0, 0.0, "N", "O",
             dt.datetime(1995, 6, 2)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    write(
        "events",
        [
            (1, t0, 7, "click", 1.0, '{"k": 1}'),
            (2, t0, 7, "click", 2.0, None),            # same ts same user (tie)
            (3, t0 + dt.timedelta(minutes=29), 7, "view", 3.0, '{"k": 2}'),
            (4, t0 + dt.timedelta(minutes=61), 7, "view", 4.0, '{"k": -3}'),
            (5, t0, 8, "error", -1.5, '{"k": 0}'),
            (6, dt.datetime(2024, 3, 2, 4, 0, 0), 8, "signup", 0.0, None),  # ET midnight edge
            (7, dt.datetime(2024, 3, 10, 6, 59, 59), 9, "view", 1.0, None),   # just before ET spring-forward
            (8, dt.datetime(2024, 3, 10, 7, 0, 1), 9, "click", 1.0, None),    # just after (2:00->3:00 ET)
            (9, dt.datetime(2024, 11, 3, 5, 30, 0), 9, "purchase", 1.0, None),# inside the repeated fall-back hour
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    write(
        "documents",
        [
            (0, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),
            (1, "THE QUICK BROWN FOX jumps over the lazy dog again and again!!!", "en", "web", 62),  # exact dup of 0 normalized
            (2, "", "en", "web", 0),                     # empty text
            (3, "   ", "en", "book", 3),                 # whitespace only
            (4, "der hund und die katze sind nicht da zu haus", "de", "book", 44),
            (5, "le chat est dans la maison pour le moment", "fr", "web", 41),
            (6, "the los", "und", "web", 7),             # en/es marker tie
            (7, "short", "en", "book", 5),
            (8, "İstanbul Straße ÄÖÜ the CAFÉ naïve the résumé", "de", "web", 46),  # unicode lowering
            (9, "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ ｔｈｅ 1２3", "en", "web", 20),  # fullwidth forms
            (10, "party 🎉 time 🚀🚀 the 🤖 end", "en", "web", 24),  # astral-plane emoji
            # PII: email, IP-in-email-host, SSN vs phone shape, parenthesized phone
            (11, "mail bob.smith+x@example.co.uk or root@10.0.0.1 now", "en", "web", 50),
            (12, "ssn 123-45-6789 phone 212-555-0199 ip 256.1.2.3", "en", "web", 47),
            (13, "call (212) 555-0199 or 212.555.0199 at 1.2.3.4", "en", "web", 46),
            # degenerate repetition (dup_token_ratio → 1, single bigram)
            (14, "spam spam spam spam spam spam", "en", "web", 29),
            (97 * 2, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),  # eval-slice member duplicating doc 0 (contamination = 1)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import math

    # dim matches the testdata embeddings (64): the hyperplane sign-LSH
    # oracles embed dim-64 plane literals, so edge vectors must be dim-64 too
    def v64(head: list[float]) -> list[float]:
        return head + [0.0] * (64 - len(head))

    vecs = []
    for i in range(12):
        angle = i * math.pi / 12
        vecs.append((i, v64([math.cos(angle), math.sin(angle), 0.0, 0.1 * i]), i % 3))
    vecs.append((99, v64([1.0]), 0))   # duplicate direction of vec 0
    vecs.append((100, v64([]), 1))     # zero vector (cosine 0/0)
    # lone cluster whose centroid rounds to IEEE -0.0 (negative-zero repr
    # canary: centroids/matryoshka must normalize -0.0 -> 0.0)
    vecs.append((101, v64([-0.00004]), 3))
    write(
        "embeddings",
        vecs,
        "vec_id long, embedding array<float>, label int",
    )


# rows-only queries (no oracle) are skipped implicitly; these two need more
# clusters/ids than the adversarial tables provide
SKIP = {
    "ann_ivf_topk",  # k-means with 8 lists over 14 vectors is degenerate
}


def main() -> int:
    import __spark_entry__ as entrymod
    from engine.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    tmp = tempfile.mkdtemp(prefix="adversarial_sf_")
    build_tables(tmp, spark)
    con = duck_con_dirs(tmp)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    # crash-safety pass: rows-only queries must run on edge data too
    for name, fn in qs.items():
        if name in oracles or name in SKIP:
            continue
        try:
            n = len(fn(spark, tmp).toPandas())
            print(f"rows {name}: {n} rows (edge data, no oracle)")
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:160]}")
    for name, fn in qs.items():
        if name not in oracles or name in SKIP:
            continue
        try:
            sdf = fn(spark, tmp).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:160]}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:160]}")
            continue
        ok, msg = compare(name, sdf, odf)
        print(("PASS" if ok else "FAIL"), name, msg)
        if not ok:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
