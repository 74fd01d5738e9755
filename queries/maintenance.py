"""Round 6: incremental aggregate maintenance, survivor dedup, balanced shards, mergeable moments, drift/changelog audits.

Split out of the flat queries.py (VERDICT r6 #8); all entries register
into the shared ``queries._base.SPARK_QUERIES`` / ``ORACLE_SQL``.
"""

from __future__ import annotations

from queries._base import *  # noqa: F401,F403
from queries.sql_surface import cdc_apply_changelog  # noqa: F401

# ===========================================================================
# Round 6: incremental aggregate maintenance, survivor-quality dedup,
# size-balanced sharding, mergeable moments, padding-aware batching
# ===========================================================================


@q(
    "incremental_agg_merge",
    """
    WITH agg AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
               AS DOUBLE) AS total_spend,
             MAX(o_orderdate) AS last_order
      FROM orders GROUP BY o_custkey),
    flags AS (
      SELECT o_custkey AS custkey,
             MAX(CASE WHEN o_orderdate <  DATE '1997-01-01' THEN 1 ELSE 0 END)
               AS has_hist,
             MAX(CASE WHEN o_orderdate >= DATE '1997-01-01'
                        OR o_orderdate IS NULL THEN 1 ELSE 0 END)
               AS has_batch
      FROM orders GROUP BY o_custkey)
    SELECT j.custkey, j.n, j.total_spend, j.last_order,
           CASE WHEN has_hist = 1 AND has_batch = 1 THEN 'update'
                WHEN has_batch = 1 THEN 'insert'
                ELSE 'unchanged' END AS op
    FROM agg j JOIN flags f ON j.custkey IS NOT DISTINCT FROM f.custkey
    """,
)
def incremental_agg_merge(spark, sf_dir):
    """Materialized-view maintenance (engine.ops.matview): per-customer
    order aggregates maintained as stored mergeable partials — history
    before 1997 is the SNAPSHOT (one partial row per customer), 1997+ is
    the incoming BATCH, and the refresh is one groupBy over the batch plus
    one co-partitioned full-outer join, never a re-scan of history.  The
    op column (insert/update/unchanged) is the refresh's changelog, free
    from the same join.  The oracle recomputes the merged result from
    scratch over ALL orders — pinning the merge identities (counts add,
    DECIMAL sums add, maxes take greatest) against an independent path.
    Work per refresh at 100 TB: O(batch + customers), snapshot bucketed on
    the key makes the join exchange-free on its side."""
    from engine.ops.matview import agg_partials, merge_agg_snapshot

    o = t(spark, sf_dir, "orders")
    split = F.lit("1997-01-01").cast("date")
    spec = dict(
        sums={"__spend": "CAST(o_totalprice AS DECIMAL(18,2))"},
        maxs={"last_order": "o_orderdate"},
    )
    snap = agg_partials(o.where(F.col("o_orderdate") < split),
                        ["o_custkey"], **spec)
    # NULL order dates ride the CURRENT batch (late/unknown-date rows must
    # land in exactly one slice or they vanish from the maintained view —
    # fuzz-caught); the oracle's has_batch flag mirrors the OR IS NULL.
    bp = agg_partials(
        o.where((F.col("o_orderdate") >= split)
                | F.col("o_orderdate").isNull()),
        ["o_custkey"], **spec)
    merged = merge_agg_snapshot(
        snap, bp, ["o_custkey"],
        sum_cols=("__spend",), max_cols=("last_order",),
    )
    return merged.select(
        F.col("o_custkey").alias("custkey"),
        "n",
        F.round("__spend", 2).cast("double").alias("total_spend"),
        "last_order",
        "op",
    )


@q(
    "dedup_keep_best",
    """
    WITH scored AS (
      SELECT doc_id, source,
             MD5(LOWER(REGEXP_REPLACE(text, '[^A-Za-z0-9]', '', 'g'))) AS key,
             LENGTH(REGEXP_REPLACE(COALESCE(text, ''), '[^A-Za-z0-9]', '', 'g'))
               AS score
      FROM documents),
    r AS (
      SELECT doc_id, source, score,
             ROW_NUMBER() OVER (
               PARTITION BY key ORDER BY score DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY key) AS n_dups
      FROM scored)
    SELECT doc_id, source, CAST(score AS BIGINT) AS score,
           CAST(n_dups AS BIGINT) AS n_dups
    FROM r WHERE rk = 1
    """,
)
def dedup_keep_best(spark, sf_dir):
    """Survivor-selection dedup (engine.ops.dedup.keep_best): per
    normalized-content cluster, keep the HIGHEST-quality member (here:
    alphanumeric character count — mirrors differ in boilerplate even when
    the content key collides) instead of keep-first's ingestion order —
    with the duplicate-cluster size riding on the surviving row as the
    audit record.  The score counts ONLY [A-Za-z0-9] chars, so Spark's
    UTF-16 length and DuckDB's codepoint length agree (astral chars are
    stripped before counting — the length-divergence pitfall).  One hash
    exchange on the content key; both window functions share it."""
    from engine.ops.dedup import keep_best

    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.regexp_replace("text", "[^A-Za-z0-9]", ""))).alias(
            "key"
        ),
        F.length(
            F.regexp_replace(F.coalesce("text", F.lit("")), "[^A-Za-z0-9]", "")
        ).alias("score"),
    )
    kept = keep_best(scored, ["key"], "score", ["doc_id"], size_col="n_dups")
    return kept.select(
        "doc_id", "source", F.col("score").cast("long").alias("score"), "n_dups"
    )


@q(
    "balanced_shards",
    """
    WITH s AS (
      SELECT doc_id,
             GREATEST(COALESCE(n_chars, 0), 0) AS sz
      FROM documents),
    r AS (
      SELECT sz,
             ROW_NUMBER() OVER (ORDER BY sz DESC, doc_id) - 1 AS rk
      FROM s)
    SELECT CAST(CASE WHEN rk % 16 < 8 THEN rk % 16
                     ELSE 15 - (rk % 16) END AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(sz) AS BIGINT) AS total_chars
    FROM r GROUP BY 1
    """,
)
def balanced_shards_q(spark, sf_dir):
    """SIZE-balanced training shards (engine.extended.sampling.
    balanced_shards): docs ranked by size descending and dealt serpentine
    (0..7,7..0) into 8 shards, so per-shard byte sums stay within one
    document of each other — the straggler fix hash sharding (shard_assign)
    cannot give when cost follows size.  The global rank is computed with
    the bit-length-bucket + offset pattern (no single-reducer window); the
    oracle ranks directly.  Output: per-shard doc and byte totals — the
    balance is the result."""
    from engine.extended.sampling import balanced_shards

    d = t(spark, sf_dir, "documents")
    sharded = balanced_shards(d, "n_chars", n_shards=8, id_col="doc_id")
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.greatest(F.coalesce(F.col("n_chars").cast("long"), F.lit(0)),
                         F.lit(0))).cast("long").alias("total_chars"),
    )


@q(
    "moments_shard_merge",
    """
    WITH v AS (
      SELECT ((l_orderkey % 4) + 4) % 4 AS shard,
             CAST(l_quantity AS BIGINT) AS v
      FROM lineitem WHERE l_quantity IS NOT NULL),
    p AS (
      SELECT shard, COUNT(v) AS n, SUM(v) AS sum_v, SUM(v * v) AS sumsq_v
      FROM v GROUP BY shard),
    m AS (
      SELECT -1 AS shard, COUNT(v) AS n, SUM(v) AS sum_v, SUM(v * v) AS sumsq_v
      FROM v),
    u AS (SELECT * FROM p UNION ALL SELECT * FROM m)
    SELECT CAST(shard AS INTEGER) AS shard,
           CAST(n AS BIGINT) AS n,
           CAST(sum_v AS BIGINT) AS sum_v,
           CAST(sumsq_v AS BIGINT) AS sumsq_v,
           CAST(FLOOR(1000.0 * (CAST(sum_v AS DOUBLE) / CAST(n AS DOUBLE))
             + 0.5) AS BIGINT) AS mean_milli,
           CAST(FLOOR(1000.0 * ((CAST(n AS DOUBLE) * CAST(sumsq_v AS DOUBLE)
               - CAST(sum_v AS DOUBLE) * CAST(sum_v AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) + 0.5) AS BIGINT)
             AS var_milli
    FROM u
    """,
)
def moments_shard_merge(spark, sf_dir):
    """Mergeable EXACT moments (engine.extended.sketch.moments_build/merge/
    stats) — the exact member of the summary family: per-shard (n, Σv, Σv²)
    BIGINT partials merge by plain addition into whole-corpus mean and
    population variance, bit-for-bit (no float partial-sum order
    divergence — the q1 discipline applied to second moments).  The merged
    row (shard = -1) is computed by MERGING the four shard partials on the
    Spark side while the oracle recomputes it directly over all rows —
    pinning the rollup identity the per-day statistics table relies on.
    mean/variance render as milli-scaled BIGINTs via FLOOR(x + 0.5) from
    identically-computed doubles (components stay within 2^53 at integral
    TPC-H quantities ≤ 50)."""
    from engine.extended.sketch import moments_build, moments_merge, moments_stats

    li = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity").isNotNull())
        .select(
            F.pmod("l_orderkey", F.lit(4)).cast("int").alias("shard"),
            F.col("l_quantity").cast("bigint").alias("v"),
        )
    )
    parts = moments_build(li, "v", by=["shard"])
    merged = moments_merge(parts).select(
        F.lit(-1).cast("int").alias("shard"), "n", "sum_v", "sumsq_v"
    )
    u = parts.select("shard", "n", "sum_v", "sumsq_v").unionByName(merged)
    return moments_stats(u)


@q(
    "length_bucket_batches",
    """
    WITH s AS (
      SELECT doc_id, GREATEST(COALESCE(n_chars, 0), 0) AS sz
      FROM documents),
    r AS (
      SELECT sz, ROW_NUMBER() OVER (ORDER BY sz, doc_id) - 1 AS rk,
             COUNT(*) OVER () AS n
      FROM s),
    b AS (
      SELECT sz, (rk * 8) // n AS bucket,
             (rk - ((((rk * 8) // n) * n + 7) // 8)) // 32 AS batch
      FROM r),
    g AS (
      SELECT bucket, batch, COUNT(*) AS cnt, MAX(sz) AS mx, SUM(sz) AS rsum
      FROM b GROUP BY bucket, batch)
    SELECT CAST(bucket AS INTEGER) AS bucket,
           COUNT(*) AS n_batches,
           CAST(SUM(cnt) AS BIGINT) AS n_docs,
           CAST(SUM(cnt * mx) AS BIGINT) AS padded_cells,
           CAST(SUM(rsum) AS BIGINT) AS real_cells,
           CAST(CASE WHEN SUM(cnt * mx) = 0 THEN 0
                     ELSE FLOOR(10000.0 * (SUM(cnt * mx) - SUM(rsum))
                                / SUM(cnt * mx) + 0.5) END AS BIGINT)
             AS waste_bp
    FROM g GROUP BY bucket
    """,
)
def length_bucket_batches_q(spark, sf_dir):
    """Length-bucketed batching audit (engine.extended.sampling.
    length_bucket_batches): docs fall into 8 equal-frequency length
    buckets and fixed 32-doc batches within each; every batch pads to its
    max member, and the per-bucket waste_bp measures what bucketing saves
    (batch-mates are similar-sized, so pad-to-max collapses).  The whole
    assignment derives from one scale-safe global size rank by integer
    codegen — no per-bucket window, no second shuffle; the oracle ranks
    directly and applies the identical integer formulas."""
    from engine.extended.sampling import length_bucket_batches

    d = t(spark, sf_dir, "documents")
    bb = length_bucket_batches(
        d, "n_chars", n_buckets=8, batch_size=32, id_col="doc_id"
    )
    sz = F.greatest(F.coalesce(F.col("n_chars").cast("long"), F.lit(0)), F.lit(0))
    g = bb.groupBy("bucket", "batch").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max(sz).alias("mx"),
        F.sum(sz).alias("rsum"),
    )
    out = g.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum(F.col("cnt") * F.col("mx")).cast("long").alias("padded_cells"),
        F.sum("rsum").cast("long").alias("real_cells"),
    )
    waste = F.when(F.col("padded_cells") == 0, F.lit(0)).otherwise(
        F.floor(
            F.lit(10000.0) * (F.col("padded_cells") - F.col("real_cells"))
            / F.col("padded_cells") + F.lit(0.5)
        )
    )
    return out.select(
        "bucket", "n_batches", "n_docs", "padded_cells", "real_cells",
        waste.cast("long").alias("waste_bp"),
    )


@q(
    "token_budget_select",
    """
    WITH s AS (
      SELECT doc_id, source,
             GREATEST(COALESCE(LENGTH(REGEXP_REPLACE(COALESCE(text, ''),
               '[^A-Za-z0-9]', '', 'g')), 0), 0) AS score,
             GREATEST(COALESCE(n_chars, 0), 0) AS cost
      FROM documents),
    r AS (
      SELECT source, cost,
             SUM(cost) OVER (ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      FROM s)
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(cost) AS BIGINT) AS total_chars
    FROM r WHERE running <= 100000 GROUP BY source
    """,
)
def token_budget_select(spark, sf_dir):
    """Budget-constrained corpus selection (engine.extended.selection.
    budget_select): quality-rank every document (alphanumeric char count —
    the ASCII-only score both engines length identically) and keep the
    maximal best-first prefix whose cumulative size fits a 100k-char
    budget — the "fill the token budget with the best docs" mixing
    primitive.  The global running sum is scale-safe (bit-length score
    buckets + per-bucket cumsum + ≤64-row offset table, no single-reducer
    window); the oracle runs the naive total-order window.  Output:
    per-source composition of the selected slice — what the budget
    actually bought."""
    from engine.extended.selection import budget_select

    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.length(
            F.regexp_replace(F.coalesce("text", F.lit("")), "[^A-Za-z0-9]", "")
        ).alias("score"),
        F.col("n_chars").alias("cost"),
    )
    sel = budget_select(scored, "score", "cost", budget=100_000, id_col="doc_id")
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(F.coalesce(F.col("cost").cast("long"), F.lit(0)), F.lit(0))
        ).cast("long").alias("total_chars"),
    )


@q(
    "curriculum_interleave",
    """
    WITH s AS (
      SELECT doc_id, source,
             GREATEST(COALESCE(LENGTH(REGEXP_REPLACE(COALESCE(text, ''),
               '[^A-Za-z0-9]', '', 'g')), 0), 0) AS score
      FROM documents WHERE source IS NOT NULL),
    g AS (
      SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS gidx,
             COUNT(*) OVER () AS ng
      FROM (SELECT DISTINCT source FROM s)),
    r AS (
      SELECT s.doc_id, s.source, s.score,
             ROW_NUMBER() OVER (
               PARTITION BY s.source ORDER BY s.score DESC, s.doc_id) AS grk
      FROM s)
    SELECT r.doc_id, r.source, CAST(r.score AS BIGINT) AS score,
           CAST((r.grk - 1) * g.ng + g.gidx AS BIGINT) AS cur_pos
    FROM r JOIN g ON r.source = g.source
    WHERE (r.grk - 1) * g.ng + g.gidx < 200
    """,
)
def curriculum_interleave_q(spark, sf_dir):
    """Mixture-balanced curriculum order (engine.extended.selection.
    curriculum_interleave): rank docs by quality WITHIN each source, then
    deal rank-r rows of all sources adjacently (pos = (rank−1)·n_sources +
    source_index) — best-first training order whose every prefix keeps the
    source mixture balanced, unlike a pure quality sort that front-loads
    the systematically higher-scoring source.  Per-source rank window +
    a broadcast group-index table; the query emits the first 200
    curriculum slots."""
    from engine.extended.selection import curriculum_interleave

    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.greatest(
            F.length(
                F.regexp_replace(
                    F.coalesce("text", F.lit("")), "[^A-Za-z0-9]", ""
                )
            ).cast("long"),
            F.lit(0),
        ).alias("score"),
    )
    cur = curriculum_interleave(scored, "score", group_col="source",
                                id_col="doc_id")
    return cur.where(F.col("cur_pos") < 200).select(
        "doc_id", "source", F.col("score").cast("long").alias("score"), "cur_pos"
    )


@q(
    "mad_outliers_by_user",
    """
    WITH e AS (
      SELECT user_id,
             CAST(FLOOR(1000.0 * value + 0.5) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
    med AS (
      SELECT user_id, quantile_cont(vm, 0.5) AS med FROM e GROUP BY user_id),
    d AS (
      SELECT e.user_id, ABS(vm - med) AS dev, med
      FROM e JOIN med USING (user_id)),
    mad AS (
      SELECT user_id, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY user_id)
    SELECT d.user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(FLOOR(MAX(med) + 0.5) AS BIGINT) AS med_milli,
           CAST(FLOOR(MAX(mad) + 0.5) AS BIGINT) AS mad_milli
    FROM d JOIN mad USING (user_id)
    GROUP BY d.user_id
    """,
)
def mad_outliers_by_user(spark, sf_dir):
    """Robust per-user outlier audit (engine.extended.timeseries.
    mad_outliers): median / MAD baselines instead of rolling mean/std —
    a handful of extreme points inflate a std yardstick and mask each
    other (the z-score's 0% breakdown point); the MAD barely moves (50%).
    Values quantize to milli-units through FLOOR(x+0.5) BEFORE the
    medians, so interpolated medians are exact 0.5-multiples and the
    |v−med| > 3·MAD decision never sits on a float boundary (Spark
    `percentile` ≡ DuckDB `quantile_cont` on those inputs — the
    rolling-median discipline).  Two key-partitioned aggregates + two
    co-partitioned joins; no global structure."""
    from engine.extended.timeseries import mad_outliers

    e = t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    return mad_outliers(e, ["user_id"], "value", k=3)


def _drift_metric_sql(tag: str, src: str, cols: list[str]) -> str:
    """One-pass conditional aggregate per snapshot slice, mirroring
    engine.ops.profile.profile_drift's quantize-then-sum discipline."""
    terms = []
    for c in cols:
        terms += [
            f"COUNT(*) AS {c}_n",
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS {c}_nulls",
            f"SUM(CAST(FLOOR(1000.0 * {c} + 0.5) AS BIGINT)) AS {c}_vsum",
            f"COUNT({c}) AS {c}_vn",
        ]
    return f"{tag} AS (SELECT {', '.join(terms)} FROM {src})"


def _drift_row_sql(c: str) -> str:
    def m(tag: str) -> str:
        return (
            f"CAST({tag}.{c}_n AS BIGINT) AS {tag}_n, "
            f"CAST(CASE WHEN {tag}.{c}_n = 0 THEN 0 ELSE FLOOR(10000.0 *"
            f" {tag}.{c}_nulls / {tag}.{c}_n + 0.5) END AS BIGINT)"
            f" AS {tag}_null_bp, "
            f"CAST(CASE WHEN {tag}.{c}_vn = 0 THEN NULL ELSE FLOOR("
            f"CAST({tag}.{c}_vsum AS DOUBLE) / {tag}.{c}_vn + 0.5) END"
            f" AS BIGINT) AS {tag}_mean_milli"
        )
    return f"SELECT '{c}' AS col_name, {m('o')}, {m('n')} FROM o, n"


_DRIFT_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@q(
    "profile_drift_audit",
    f"""
    WITH {_drift_metric_sql('o',
        "lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'", _DRIFT_COLS)},
    {_drift_metric_sql('n',
        "lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'"
        " OR l_shipdate IS NULL", _DRIFT_COLS)},
    rows_ AS ({' UNION ALL '.join(_drift_row_sql(c) for c in _DRIFT_COLS)})
    SELECT col_name,
           o_n AS old_n, n_n AS new_n,
           o_null_bp AS old_null_bp, n_null_bp AS new_null_bp,
           o_mean_milli AS old_mean_milli, n_mean_milli AS new_mean_milli,
           CAST(CASE WHEN ABS(COALESCE(n_null_bp, 0) - COALESCE(o_null_bp, 0))
                          > 500
                     OR FLOOR(10000.0 * ABS(CAST(COALESCE(n_mean_milli, 0)
                          AS DOUBLE) - COALESCE(o_mean_milli, 0))
                        / GREATEST(ABS(CAST(COALESCE(o_mean_milli, 0)
                          AS DOUBLE)), 1.0) + 0.5) > 500
                THEN 1 ELSE 0 END AS INTEGER) AS drift_flag
    FROM rows_
    """,
)
def profile_drift_audit(spark, sf_dir):
    """Snapshot-over-snapshot column drift (engine.ops.profile.
    profile_drift): lineitem's four measure columns compared between the
    pre-1999 slice and everything after (NULL ship dates ride the new
    slice, the matview routing rule) — NULL-rate movement in basis points
    and milli-unit mean movement in relative bp, flagged past 500 bp.
    The data-ops gate that catches a unit change or NULL flood upstream
    of training.  Each slice is ONE map-side-combined aggregate pass
    carrying all columns' quantized BIGINT sums (partition-order-exact);
    the per-column unpivot is a stack over the 1-row result."""
    from engine.ops.profile import profile_drift

    li = t(spark, sf_dir, "lineitem")
    split = F.lit("1999-01-01").cast("timestamp")
    old = li.where(F.col("l_shipdate") < split)
    new = li.where(
        (F.col("l_shipdate") >= split) | F.col("l_shipdate").isNull()
    )
    return profile_drift(old, new, _DRIFT_COLS, drift_bp=500)


@q(
    "event_transition_probs",
    """
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL),
    tr AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
    tot AS (
      SELECT from_type, SUM(n) AS n_from FROM tr GROUP BY from_type)
    SELECT tr.from_type, tr.to_type,
           CAST(tr.n AS BIGINT) AS n_transitions,
           CAST(FLOOR(10000.0 * tr.n / tot.n_from + 0.5) AS BIGINT) AS p_bp
    FROM tr JOIN tot ON tr.from_type = tot.from_type
    """,
)
def event_transition_probs(spark, sf_dir):
    """First-order Markov transition matrix over user event streams: for
    each (from, to) event-type pair, the transition count and conditional
    probability in basis points — the behavioral model behind
    next-action prediction and anomalous-flow detection (event_path_topk
    mines the popular 3-step paths; this gives the full conditional
    next-step distribution).  One LEAD window per user (ties broken by
    event_id), one type-pair aggregate (cardinality = |types|²), and a
    broadcast of the from-state marginals."""
    e = t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    tr = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("__n")
    )
    tot = tr.groupBy("from_type").agg(F.sum("__n").alias("__n_from"))
    return tr.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("__n").cast("long").alias("n_transitions"),
        F.floor(10000.0 * F.col("__n") / F.col("__n_from") + F.lit(0.5))
        .cast("long")
        .alias("p_bp"),
    )


@q(
    "snapshot_diff_changelog",
    """
    WITH old_s AS (
      SELECT c_custkey, c_mktsegment, c_nationkey FROM customer),
    act AS (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL),
    rec AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= DATE '1998-01-01' AND o_custkey IS NOT NULL),
    new_s AS (
      SELECT c.c_custkey,
             CASE WHEN r.o_custkey IS NOT NULL THEN 'MIGRATED'
                  ELSE c.c_mktsegment END AS c_mktsegment,
             c.c_nationkey
      FROM customer c
      JOIN act a ON c.c_custkey = a.o_custkey
      LEFT JOIN rec r ON c.c_custkey = r.o_custkey
      UNION ALL
      SELECT c_custkey + 10000000, c_mktsegment, c_nationkey
      FROM customer WHERE c_custkey % 997 = 0),
    d AS (
      SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN o.c_custkey IS NULL THEN 'insert'
                  WHEN n.c_custkey IS NULL THEN 'delete'
                  WHEN o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                    OR o.c_nationkey IS DISTINCT FROM n.c_nationkey
                    THEN 'update'
                  ELSE 'unchanged' END AS op,
             CASE WHEN n.c_custkey IS NOT NULL THEN n.c_mktsegment
                  ELSE o.c_mktsegment END AS c_mktsegment,
             CASE WHEN n.c_custkey IS NOT NULL THEN n.c_nationkey
                  ELSE o.c_nationkey END AS c_nationkey
      FROM old_s o FULL OUTER JOIN new_s n ON o.c_custkey = n.c_custkey)
    SELECT c_custkey, op, c_mktsegment, c_nationkey
    FROM d WHERE op <> 'unchanged'
    """,
)
def snapshot_diff_changelog(spark, sf_dir):
    """Changelog DERIVATION between two snapshots (engine.ops.scd.
    snapshot_diff) — the inverse of cdc_apply_changelog, and how CDC is
    bootstrapped when the source has no log (the reference's Sierra
    polling shape: full-ish extracts, diff downstream).  The synthetic
    'today' snapshot migrates recently-active customers' segments
    (updates), drops never-ordered customers (deletes), and re-keys a
    0.1% clone slice (inserts); the diff classifies every key with one
    full-outer join over null-tagged value digests.  The oracle diffs by
    direct IS DISTINCT FROM value comparison — an independent change-
    detection path, so a digest canonicalization bug cannot self-confirm."""
    from engine.ops.scd import snapshot_diff

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey").isNotNull())
    old_s = c.select("c_custkey", "c_mktsegment", "c_nationkey")
    act = o.select("o_custkey").distinct()
    rec = (
        o.where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        .select(F.col("o_custkey").alias("__rk"))
        .distinct()
    )
    new_s = (
        c.join(act, c.c_custkey == act.o_custkey, "left_semi")
        .join(rec, F.col("c_custkey") == F.col("__rk"), "left")
        .select(
            "c_custkey",
            F.when(F.col("__rk").isNotNull(), F.lit("MIGRATED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            "c_nationkey",
        )
        .unionByName(
            c.where(F.col("c_custkey") % 997 == 0).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                "c_mktsegment",
                "c_nationkey",
            )
        )
    )
    return snapshot_diff(
        old_s, new_s, ["c_custkey"],
        compare_cols=["c_mktsegment", "c_nationkey"],
    )


# ===========================================================================
# Round 7: the two hard TPC-H subquery shapes still missing (VERDICT r6 #6)


@q(
    "scd2_point_in_time_join",
    """
    WITH dim AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer),
    upd AS (
      SELECT * FROM (
        SELECT o_custkey AS c_custkey, o_orderpriority AS c_mktsegment,
               o_orderdate AS effective_ts,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_custkey IS NOT NULL) WHERE rn = 1),
    closed AS (
      SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
             COALESCE(u.effective_ts, d.valid_to) AS valid_to
      FROM dim d LEFT JOIN upd u ON d.c_custkey = u.c_custkey),
    new_rows AS (
      SELECT c_custkey, c_mktsegment, effective_ts AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM upd),
    dim2 AS (SELECT * FROM closed UNION ALL SELECT * FROM new_rows)
    SELECT o.o_orderkey,
           o.o_custkey AS c_custkey,
           CAST(CAST(o.o_orderdate AS TIMESTAMP) AS VARCHAR) AS evt_ts_s,
           d.c_mktsegment AS segment_at_order,
           CAST(d.valid_from AS VARCHAR) AS version_from_s
    FROM orders o LEFT JOIN dim2 d
      ON o.o_custkey = d.c_custkey
     AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
     AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to)
    """,
)
def scd2_point_in_time_q(spark, sf_dir):
    """Temporal (point-in-time) join — the READ side of the SCD2 family:
    every order re-joined to the customer-segment VERSION valid at its
    order date (engine.ops.scd.scd2_point_in_time over the scd2_merge
    output), the as-of-the-event feature lookup that keeps a training
    snapshot free of future leakage.  The half-open [from, to) tiling
    guarantees at most one version per fact; the join's hash condition is
    the key equality with validity as residual filter — never a nested
    loop over versions."""
    from engine.ops.scd import scd2_merge, scd2_point_in_time

    c = t(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("effective_ts").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        o.filter(F.col("o_custkey").isNotNull())
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderpriority").alias("c_mktsegment"),
            F.col("o_orderdate").alias("effective_ts"),
            "o_orderkey",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "o_orderkey")
    )
    dim2 = scd2_merge(dim, latest, "c_custkey", ["c_mktsegment"])
    facts = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate").cast("timestamp").alias("evt_ts"),
    )
    out = scd2_point_in_time(facts, dim2, "c_custkey", "evt_ts")
    return out.select(
        "o_orderkey",
        "c_custkey",
        F.col("evt_ts").cast("string").alias("evt_ts_s"),
        F.col("c_mktsegment").alias("segment_at_order"),
        F.col("valid_from").cast("string").alias("version_from_s"),
    )


@q(
    "corpus_pipeline_v5",
    """
    WITH s AS (
      SELECT doc_id, source, GREATEST(COALESCE(n_chars, 0), 0) AS cost,
             CAST(FLOOR(PERCENT_RANK() OVER (
                    PARTITION BY source ORDER BY n_chars NULLS FIRST)
                  * 1000 + 0.5) AS BIGINT) AS pr
      FROM documents WHERE doc_id IS NOT NULL),
    r AS (
      SELECT doc_id, cost, pr,
             SUM(cost) OVER (ORDER BY pr DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      FROM s),
    sel AS (SELECT doc_id, cost, pr FROM r WHERE running <= 150000),
    rk AS (
      SELECT cost, pr,
             ROW_NUMBER() OVER (ORDER BY cost DESC, doc_id) - 1 AS rk
      FROM sel)
    SELECT CAST(CASE WHEN rk % 16 < 8 THEN rk % 16
                     ELSE 15 - (rk % 16) END AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(cost) AS BIGINT) AS total_chars,
           CAST(FLOOR(CAST(SUM(pr) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
             AS mean_pr_milli
    FROM rk GROUP BY 1
    """,
)
def corpus_pipeline_v5(spark, sf_dir):
    """End-to-end training-layout pipeline from the round-7 primitives:
    per-source QUANTILE-NORMALIZED quality (cross-source calibration) →
    best-first BUDGET fill (150k chars, running cost on the shared
    bit-length-bucket machinery) → size-BALANCED serpentine shards of the
    selection.  Per-shard doc/byte totals plus the mean normalized
    quality per shard — the audit that the budget bought high-percentile
    docs AND the shards stayed byte-balanced.  Every stage is the
    registry operator itself (score_quantile_normalize / budget_select /
    balanced_shards), composed; the oracle chains the naive total-order
    SQL of each."""
    from engine.extended.sampling import balanced_shards
    from engine.extended.selection import budget_select

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    w = Window.partitionBy("source").orderBy(F.col("n_chars").asc_nulls_first())
    scored = d.select(
        "doc_id",
        F.greatest(
            F.coalesce(F.col("n_chars").cast("long"), F.lit(0)), F.lit(0)
        ).alias("cost"),
        F.floor(F.percent_rank().over(w) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("pr"),
    )
    sel = budget_select(scored, "pr", "cost", budget=150_000, id_col="doc_id")
    sharded = balanced_shards(
        sel.select("doc_id", "cost", "pr"), "cost", n_shards=8, id_col="doc_id"
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("cost").cast("long").alias("total_chars"),
        F.floor(F.sum("pr").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("mean_pr_milli"),
    )
