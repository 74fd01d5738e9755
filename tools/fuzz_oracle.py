"""Property-based oracle fuzzing: regenerate the volatile tables with
hostile random content and run the full DuckDB gate against them.

The curated edge tables in ``adversarial_check.py`` encode failure modes we
already thought of; this tool searches for the ones we didn't.  Per seed it
rebuilds six tables — ``documents`` (random mixtures of ASCII soup, Unicode
scripts, emoji/astral, control characters, HTML-ish fragments, URLs/emails/
PII shapes, pathological whitespace, empty and NULL text), ``orders`` and
``lineitem`` (NULL keys/amounts/dates, negative money inside the decimal
contract), ``events`` (NULL timestamps/users), ``embeddings`` (NULL, zero,
and denormal vectors), ``customer`` (NULL/unicode/padded names), and the four dims with NULL
names/FKs — drops
them into a copy of the sf0.001 directory, and runs ``check_oracle`` over
every oracle-paired query.

Usage: python tools/fuzz_oracle.py [n_seeds] [query ...]
Exit 0 = every seed clean.  A failure prints the seed so the exact corpus
is reproducible (all generation is ``numpy.random.default_rng(seed)``).

Found-by-this-tool ledger (fixes land at the OPERATOR level):
- html_to_text: DuckDB TRIM strips U+00A0, JVM trim does not → NBSP now
  normalizes to space and the edge strip is an explicit ASCII regexp.
- keyset_page / window frames: Spark ASC defaults NULLS FIRST, Postgres
  and DuckDB default NULLS LAST → orderings over nullable columns are now
  pinned NULLS LAST on both sides.
- correlated_above_group_avg: a window PARTITION BY groups NULL keys
  together, but the correlated subquery it decorrelates can never match a
  NULL key → decorrelation now excludes NULL keys explicitly.
- asof_join: NULL build timestamps masqueraded as earlier-than-everything
  matches (NULLS FIRST sort); NULL probe timestamps got the LATEST build
  row from DuckDB's sort-based ASOF → contract pinned: NULL build ts
  dropped, NULL probe ts matches nothing.
- media_features / decode_media: NULL payloads crashed the Arrow UDF →
  null-content rows now pass through with null features.
- event-time windows (tumbling/sliding/session) disagreed on NULL event
  times (Spark drops, date_trunc groups, session cumsum splits-vs-absorbs
  by NULL sort order) → operators now exclude NULL timestamps: the only
  semantics that is engine-invariant AND batch/streaming-consistent.
- keep_first ordered NULLS FIRST (Spark default), so an unknown-ts row
  beat known ones → NULLS LAST pinned (Postgres/reference semantics).
- code_detect_exprs used (?m)^ for indent detection: Java's multiline ^
  also matches after \r and Unicode line separators where RE2's only
  matches after \n → line anchors are now an explicit (?:^|\n).
- mmr_select blended two ALREADY-ROUNDED inputs and re-rounded: the blend
  of 4-decimal values lands on exact half-way cases where Spark's
  BigDecimal HALF_UP and DuckDB's multiply-then-rint disagree → the
  blend now runs in exact integer space (quantized inputs,
  integer-percent weights, one final division) — the rollup_merge
  half-away lesson generalized.
- funnel windows partitioned NULL user_ids into a group the oracle's
  equi-joins can never produce → unidentified users excluded.
- asof_join carried bare values with last(ignorenulls), conflating "build
  row with NULL value" with "no build row yet" (it resurrected stale
  values) → build values now ride ONE struct, null exactly when unmatched;
  NULL-key build rows dropped (SQL equality matches nothing, a window
  PARTITION BY groups them).
- quantize_int8: engines disagree on ABS(-0.0), so an all-±0.0 vector got
  a -0.0 scale on one side → amax normalized with + 0.0.
- IVF k-means iterated NULL vectors (a NULL seed row crashed the
  driver-side centroid build) → clustering excludes NULL vectors, mirrored
  in the oracle's pts CTE.
- the ANN queries collected a hard-coded vec_id's embedding as the query
  literal; NULL there crashed the literal build → query pick is now "the
  smallest vec_id >= preferred with a non-null vector", mirrored verbatim
  in every qv CTE.
- f13's JSON oracle was a '||' chain, so ONE null field nulled the whole
  record while Spark's to_json omits null fields → CONCAT_WS of per-field
  CASEs mirrors the omission semantics.
- DuckDB levenshtein counts BYTES on non-ASCII, Spark counts codepoints →
  the comparison pair is ASCII-restricted, same discipline as every
  char-level oracle op.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001"

WORDS = (
    "the quick brown fox key agg row scan slow fast table value part hash "
    "merge batch spark order data column join small line customer query big "
    "stream group vector window filter sort"
).split()

UNICODE_POOL = [
    "İstanbul", "Straße", "naïve", "résumé", "ÄÖÜ", "ĳ", "ﬁ",  # lowering traps
    "москва", "Ελλάδα", "北京", "東京", "한국",  # scripts
    "🎉", "🚀🚀", "🤖", "👨‍👩‍👧‍👦", "🇺🇸",  # astral + ZWJ + flags
    " ", " ", "​", "﻿",  # exotic whitespace/marks
]

FRAGMENTS = [
    "<div class='x'>frag</div>", "<script>1<2&&3>4</script>", "<!-- c -->",
    "&amp;lt; &nbsp; &quot;", "https://ex.example.org/p?q=1", "a.b+c@example.net",
    "10.0.0.1", "123-45-6789", "(212) 555-0199", "tab\there", "quote'mid",
    'double"mid', "back\\slash", "pipe|mid", "nul\x00byte",
]


def rand_text(rng: np.random.Generator) -> str | None:
    kind = rng.integers(0, 10)
    if kind == 0:
        return None
    if kind == 1:
        return ""
    if kind == 2:
        return " \t\n  "
    n = int(rng.integers(1, 60))
    parts = []
    for _ in range(n):
        r = rng.integers(0, 10)
        if r < 6:
            parts.append(WORDS[rng.integers(0, len(WORDS))])
        elif r < 8:
            parts.append(UNICODE_POOL[rng.integers(0, len(UNICODE_POOL))])
        else:
            parts.append(FRAGMENTS[rng.integers(0, len(FRAGMENTS))])
    sep = [" ", "  ", "\n", "\t"][int(rng.integers(0, 4))]
    return sep.join(parts)


def fuzz_documents(rng: np.random.Generator, n: int = 400) -> pa.Table:
    texts = [rand_text(rng) for _ in range(n)]
    langs = rng.choice(["en", "de", "fr", "es", "it", "und"], n).tolist()
    sources = rng.choice(["web", "book", "code"], n).tolist()
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(
                [len(t) if t is not None else None for t in texts], pa.int64()
            ),
        }
    )


def fuzz_orders(rng: np.random.Generator, n: int = 1200) -> pa.Table:
    keys = list(range(1, n + 1))  # PK stays unique (snapshot diff contract)
    cust = [
        None if rng.random() < 0.05 else int(rng.integers(1, 200)) for _ in range(n)
    ]
    price = [
        None
        if rng.random() < 0.05
        else round(float(rng.uniform(-1e4, 1e7)), 2)
        for _ in range(n)
    ]
    base = np.datetime64("1995-01-01", "us")
    dates = [
        None
        if rng.random() < 0.03
        else base + np.timedelta64(int(rng.integers(0, 2400)) * 86_400_000_000, "us")
        for _ in range(n)
    ]
    status = rng.choice(["O", "F", "P", "", "X"], n).tolist()
    prio = rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "", "5-LOW"], n).tolist()
    return pa.table(
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array(cust, pa.int64()),
            "o_orderstatus": pa.array(status, pa.string()),
            "o_totalprice": pa.array(price, pa.float64()),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(prio, pa.string()),
        }
    )


def fuzz_events(rng: np.random.Generator, n: int = 1500) -> pa.Table:
    base = np.datetime64("2024-01-01", "us")
    ts = [
        None
        if rng.random() < 0.03
        else base + np.timedelta64(int(rng.integers(0, 90 * 86_400)) * 1_000_000, "us")
        for _ in range(n)
    ]
    user = [None if rng.random() < 0.05 else int(rng.integers(1, 40)) for _ in range(n)]
    etype = rng.choice(["click", "view", "purchase", "signup", "error", ""], n).tolist()
    value = [
        None if rng.random() < 0.03 else round(float(rng.uniform(-1e3, 1e6)), 2)
        for _ in range(n)
    ]
    props = [
        None if rng.random() < 0.05 else '{"k": %d}' % rng.integers(0, 100)
        for _ in range(n)
    ]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )


def fuzz_embeddings(rng: np.random.Generator, n: int = 300, dim: int = 64) -> pa.Table:
    vecs = []
    for _ in range(n):
        r = rng.random()
        if r < 0.03:
            vecs.append(None)
        elif r < 0.08:
            vecs.append([0.0] * dim)  # zero vector: norm guards
        elif r < 0.12:
            vecs.append([float(x) for x in rng.normal(0, 1e-12, dim)])  # true tiny norms
        else:
            vecs.append([round(float(x), 4) for x in rng.normal(0, 1, dim)])
    labels = [None if rng.random() < 0.05 else int(rng.integers(0, 10)) for _ in range(n)]
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def fuzz_customer(rng: np.random.Generator, n: int = 200) -> pa.Table:
    names = [
        None
        if rng.random() < 0.05
        else rng.choice(
            ["  Customer#%d  " % i, "Ünïcode#%d" % i, "O'Brien %d" % i, "", "   "]
        )
        for i in range(n)
    ]
    return pa.table(
        {
            "c_custkey": pa.array(range(1, n + 1), pa.int64()),
            "c_name": pa.array(names, pa.string()),
            "c_nationkey": pa.array(
                [None if rng.random() < 0.05 else int(rng.integers(0, 30)) for _ in range(n)],
                pa.int64(),
            ),
            "c_acctbal": pa.array(
                [None if rng.random() < 0.05 else round(float(rng.uniform(-1e3, 1e4)), 2) for _ in range(n)],
                pa.float64(),
            ),
            "c_mktsegment": pa.array(
                rng.choice(["BUILDING", "MACHINERY", "", "AUTOMOBILE"], n).tolist(),
                pa.string(),
            ),
        }
    )


def fuzz_lineitem(rng: np.random.Generator, n: int = 4000) -> pa.Table:
    # money stays inside the DECIMAL(12,2) contract (overflow SEMANTICS
    # differ across engines — Spark's non-ANSI cast nulls, DuckDB errors —
    # and the operators document 2-decimal bounded money as a data contract)
    base = np.datetime64("1995-01-01", "us")
    return pa.table(
        {
            "l_orderkey": pa.array(
                [int(rng.integers(1, 1500)) for _ in range(n)], pa.int64()
            ),
            "l_partkey": pa.array(
                [None if rng.random() < 0.03 else int(rng.integers(1, 200)) for _ in range(n)],
                pa.int64(),
            ),
            "l_suppkey": pa.array(
                [None if rng.random() < 0.03 else int(rng.integers(1, 50)) for _ in range(n)],
                pa.int64(),
            ),
            "l_linenumber": pa.array(
                [int(rng.integers(1, 8)) for _ in range(n)], pa.int64()
            ),
            "l_quantity": pa.array(
                [None if rng.random() < 0.03 else float(rng.integers(1, 51)) for _ in range(n)],
                pa.float64(),
            ),
            "l_extendedprice": pa.array(
                [None if rng.random() < 0.03 else round(float(rng.uniform(-100, 1e5)), 2) for _ in range(n)],
                pa.float64(),
            ),
            "l_discount": pa.array(
                [None if rng.random() < 0.03 else round(float(rng.uniform(0, 0.99)), 2) for _ in range(n)],
                pa.float64(),
            ),
            "l_tax": pa.array(
                [round(float(rng.uniform(0, 0.08)), 2) for _ in range(n)], pa.float64()
            ),
            "l_returnflag": pa.array(
                rng.choice(["R", "A", "N", ""], n).tolist(), pa.string()
            ),
            "l_linestatus": pa.array(
                rng.choice(["O", "F"], n).tolist(), pa.string()
            ),
            "l_shipdate": pa.array(
                [
                    None
                    if rng.random() < 0.03
                    else base + np.timedelta64(int(rng.integers(0, 2400)) * 86_400_000_000, "us")
                    for _ in range(n)
                ],
                pa.timestamp("us"),
            ),
        }
    )


def fuzz_dims(rng: np.random.Generator) -> dict[str, pa.Table]:
    """part / supplier / nation / region with NULL names, keys, and
    attributes (keys stay unique; NULL FK values exercise join drops)."""
    np_, ns, nn, nr = 120, 40, 25, 5
    maybe = lambda v, p=0.05: None if rng.random() < p else v  # noqa: E731
    return {
        "part": pa.table(
            {
                "p_partkey": pa.array(range(1, np_ + 1), pa.int64()),
                "p_name": pa.array(
                    [maybe(rng.choice(["azure plum thistle", "Ünïcode pärt", "", "promo  padded "])) for _ in range(np_)],
                    pa.string(),
                ),
                "p_brand": pa.array(
                    [maybe("Brand#%d" % rng.integers(10, 60)) for _ in range(np_)], pa.string()
                ),
                "p_type": pa.array(
                    rng.choice(["PROMO BRUSHED", "STANDARD", "", "promo lower"], np_).tolist(),
                    pa.string(),
                ),
                "p_size": pa.array(
                    [maybe(int(rng.integers(1, 50))) for _ in range(np_)], pa.int32()
                ),
                "p_retailprice": pa.array(
                    [maybe(round(float(rng.uniform(0, 2000)), 2)) for _ in range(np_)],
                    pa.float64(),
                ),
            }
        ),
        "supplier": pa.table(
            {
                "s_suppkey": pa.array(range(1, ns + 1), pa.int64()),
                "s_name": pa.array(
                    [maybe("Supplier#%03d" % i) for i in range(ns)], pa.string()
                ),
                "s_nationkey": pa.array(
                    [maybe(int(rng.integers(0, nn))) for _ in range(ns)], pa.int32()
                ),
                "s_acctbal": pa.array(
                    [maybe(round(float(rng.uniform(-1e3, 1e4)), 2)) for _ in range(ns)],
                    pa.float64(),
                ),
            }
        ),
        "nation": pa.table(
            {
                "n_nationkey": pa.array(range(nn), pa.int32()),
                "n_name": pa.array(
                    [maybe("NATION %d" % i, 0.08) for i in range(nn)], pa.string()
                ),
                "n_regionkey": pa.array(
                    [maybe(int(rng.integers(0, nr)), 0.08) for _ in range(nn)], pa.int32()
                ),
            }
        ),
        "region": pa.table(
            {
                "r_regionkey": pa.array(range(nr), pa.int32()),
                "r_name": pa.array(
                    [
                        maybe(
                            rng.choice(
                                ["REGION %d" % i, 'RE"GION\\%d' % i, "R\tG\n%d" % i]
                            ),
                            0.2,
                        )
                        for i in range(nr)
                    ],
                    pa.string(),
                ),
            }
        ),
    }


def run_seed(seed: int, only: list[str]) -> int:
    rng = np.random.default_rng(seed)
    d = tempfile.mkdtemp(prefix=f"fuzz{seed}_")
    try:
        for t in os.listdir(BASE):
            src = os.path.join(BASE, t)
            dst = os.path.join(d, t)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
        pq.write_table(fuzz_documents(rng), os.path.join(d, "documents.parquet"))
        pq.write_table(fuzz_orders(rng), os.path.join(d, "orders.parquet"))
        pq.write_table(fuzz_events(rng), os.path.join(d, "events.parquet"))
        pq.write_table(fuzz_embeddings(rng), os.path.join(d, "embeddings.parquet"))
        pq.write_table(fuzz_customer(rng), os.path.join(d, "customer.parquet"))
        pq.write_table(fuzz_lineitem(rng), os.path.join(d, "lineitem.parquet"))
        for tname, tbl in fuzz_dims(rng).items():
            pq.write_table(tbl, os.path.join(d, f"{tname}.parquet"))
        r = subprocess.run(
            [sys.executable, "tools/check_oracle.py", d, *only],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        tail = r.stdout.strip().splitlines()
        fails = [ln for ln in tail if ln.startswith("FAIL")]
        print(f"seed {seed}: {tail[-1] if tail else '??'}")
        for ln in fails:
            print("   ", ln[:300])
        return r.returncode
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> int:
    args = sys.argv[1:]
    # first arg: seed count N (seeds 0..N-1) or an explicit A:B range —
    # soaks split across multiple invocations need fresh seeds, not reruns
    seeds = range(3)
    only = args
    if args:
        head = args[0]
        if head.isdigit():
            seeds, only = range(int(head)), args[1:]
        elif ":" in head:
            a, b = head.split(":", 1)
            if a.isdigit() and b.isdigit():
                seeds, only = range(int(a), int(b)), args[1:]
    rc = 0
    for seed in seeds:
        rc |= run_seed(seed, only)
    print("CLEAN" if rc == 0 else "FUZZ FAILURES — reproduce with the seed above")
    return rc


if __name__ == "__main__":
    sys.exit(main())
