"""Mergeable frequency sketches: deterministic count-min with heavy-hitter
extraction.

The reference engine keeps exact per-key counters driver-side (its corpora
fit one process); at 100 TB the frequency table for a hot column (URLs,
n-grams, part keys) does not fit anywhere, and the classic answer is a
count-min sketch [Cormode & Muthukrishnan 2005]: a ``depth × width`` grid of
counters where each key increments one counter per row (chosen by a per-row
hash) and a key's frequency estimate is the MIN over its ``depth`` counters
— always an overestimate, with error ≤ ``e/width × N`` at probability
``1 - e^-depth``.

Why this shape survives 100 TB:

- **The build is one pass with NO per-key shuffle.** Each input row explodes
  into ``depth`` (row, col) cells and the aggregate groups by cell — at most
  ``depth × width`` distinct groups, so map-side partial aggregation
  collapses everything executor-locally and the shuffle moves ≤ a few
  thousand rows regardless of input size or key skew.  This is exactly the
  case partial aggregation is best at (tiny group cardinality), and exactly
  what a per-key exact count cannot do on a skewed key column.
- **Sketches are linear**, so per-partition / per-day / per-shard sketches
  merge by element-wise addition (:func:`cms_merge`) into the sketch of the
  union — the incremental-corpus pattern used across this repo (line
  fingerprint index, minhash incremental) applied to frequencies.
- **Estimation joins a broadcast.** The materialized sketch is ≤
  ``depth × width`` rows; probing any candidate set is a broadcast hash
  join, never a shuffle of the candidates.

Determinism / oracle story: the row hashes are the dual-implementable md5
family (``engine.extended.dedup.md5_long`` seeded per row as ``"{row}:{key}"``),
so a DuckDB twin computes the bit-identical sketch and the driver's value-hash
gate covers the whole pipeline — sketch build, merge, and estimates.

Reference parity anchor: the reference's only frequency surface is exact
pandas ``value_counts`` on driver-resident batches
(/root/reference/lib/pipeline_controller.py's per-batch stats); this module is
the scale path for the same question.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.extended.dedup import md5_long

__all__ = [
    "cms_hash_col",
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "hist_build",
    "hist_merge",
    "hist_quantile",
    "moments_build",
    "moments_merge",
    "moments_stats",
    "bottomk_build",
    "bottomk_merge",
    "bottomk_jaccard",
    "bottomk_cardinality",
    "bottomk_setops_estimate",
    "cms_inner_product",
]


def cms_hash_col(key: Column, row: int, width: int) -> Column:
    """Column for the counter index of ``key`` in sketch row ``row``.

    ``md5_long`` of ``"{row}:{key}"`` modulo ``width``: nonnegative in both
    engines (md5_long < 2^60), so ``%`` agrees between Spark's ``pmod``-free
    ``%`` and DuckDB's ``%`` with no sign divergence.
    """
    return md5_long(F.concat(F.lit(f"{row}:"), key)) % width


def cms_build(
    df: DataFrame, key_col: str, *, depth: int = 3, width: int = 512
) -> DataFrame:
    """One-pass count-min sketch build → DataFrame ``(row, col, cnt)``.

    Each input row contributes ``depth`` cells via a posexplode of its
    per-row counter indices; the groupBy has ≤ ``depth × width`` groups so
    the aggregation is map-side-collapsed (no key-cardinality shuffle —
    the whole point versus an exact count on a skewed column).
    NULL keys are skipped, matching ``COUNT(key)`` semantics.
    """
    key = F.col(key_col).cast("string")
    # _spread: the depth× md5 hashing is the build's dominant CPU and runs
    # in the SCAN stage — a small input arriving as 1-2 splits would hash
    # single-threaded (r11 opt: 1.9 → 1.1 s at sf0.1).  Conditional no-op
    # when the scan already has enough splits (always true at scale), and
    # only the projected key column crosses the spread exchange.
    from engine.extended.dedup import _spread

    cells = _spread(df.where(key.isNotNull()).select(key.alias("__k"))).select(
        F.posexplode(
            F.array(*[cms_hash_col(F.col("__k"), r, width) for r in range(depth)])
        ).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise sum of sketches built with the same (depth, width).

    Linearity: sketch(A) + sketch(B) == sketch(A ∪ B) exactly — the merge
    is a union + re-aggregate over ≤ depth × width cells.
    """
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 3,
    width: int = 512,
    est_col: str = "est_n",
) -> DataFrame:
    """Frequency estimates for ``keys[key_col]`` → keys + ``est_col``.

    Probing is a broadcast hash LEFT join of the candidates against the ≤
    depth × width cell table, then MIN over the ``depth`` counters with an
    empty cell counting as ZERO.  That empty-cell zero is load-bearing for
    open-world probes: a key the sketch has never seen whose cells are
    (hot-collision 100, 50, empty) must estimate min(100, 50, 0) = 0 — an
    inner join would drop the empty cell and return 50, a false positive
    frequency for a provably-absent key (review catch; the registry
    queries never hit it because their probes are build subsets).

    Probe rows are grouped on a per-row id, not on ``keys``'s columns, so
    duplicate probe rows each keep their own output row (advice-review
    catch: grouping on the columns silently collapsed duplicates).  The
    internal ``row``/``col``/``cnt`` names would make the join ambiguous if
    ``keys`` already carries one of them — raise rather than mis-group.
    """
    reserved = {"row", "col", "cnt", "__probe_id"} & set(keys.columns)
    if reserved:
        raise ValueError(
            f"cms_estimate probe frame must not contain columns {sorted(reserved)}"
            " (internal sketch-cell/probe-id names); rename them before probing"
        )
    key = F.col(key_col).cast("string")
    probes = keys.withColumn("__probe_id", F.monotonically_increasing_id()).select(
        "*",
        F.posexplode(
            F.array(*[cms_hash_col(key, r, width) for r in range(depth)])
        ).alias("row", "col"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy("__probe_id", *keys.columns)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(est_col)
        )
        .drop("__probe_id")
    )


# ---------------------------------------------------------------------------
# Mergeable equi-width histograms: the quantile member of the sketch family
# (frequencies = count-min above, distinct counts = Datasketches HLL in
# queries.hll_shard_merge, quantiles = this)
# ---------------------------------------------------------------------------


def hist_build(
    df: DataFrame, value_col: str, *, lo: float, hi: float, n_buckets: int = 256
) -> DataFrame:
    """One-pass equi-width histogram → ``(bucket, cnt)``.

    The grid (``lo``, ``hi``, ``n_buckets``) is DATA-INDEPENDENT, which is
    what makes the histogram mergeable (same buckets everywhere) and
    oracle-reproducible (no engine-specific quantile interpolation inside
    the sketch).  Values clamp into the edge buckets, so outliers never
    grow the grid; NULLs are skipped.  Like the CMS build, the aggregate
    has ≤ ``n_buckets`` groups — map-side partials collapse everything and
    the shuffle is constant-size in input volume.  Quantile estimates read
    off the cumulative histogram with error ≤ one bucket width — the
    trade that lets per-shard/per-day histograms roll up without
    re-reading history (a t-digest is tighter but not exactly
    reproducible across engines).
    """
    if not hi > lo:
        raise ValueError(f"need hi > lo, got ({lo}, {hi})")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w = (hi - lo) / n_buckets
    v = F.col(value_col).cast("double")
    bucket = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("long")
    return (
        df.where(v.isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Element-wise sum of histograms on the same grid: hist(A) + hist(B)
    == hist(A ∪ B) exactly (same linearity as :func:`cms_merge`)."""
    if not hists:
        raise ValueError("hist_merge needs at least one histogram")
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def hist_quantile(
    hist: DataFrame,
    q: float,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 256,
    out_col: str = "est",
) -> DataFrame:
    """1-row DataFrame with the quantile estimate of ``hist`` (upper edge
    of the bucket where the cumulative count first reaches ``q · N``) —
    within one bucket width of the true quantile by construction.

    Returns the aggregated frame rather than a bare Column so the estimate
    is bound to THIS histogram (review catch: a Column version silently
    aggregated whatever DataFrame it was later attached to).

    Implemented as a plain aggregate over the ≤ ``n_buckets``-row histogram
    (min bucket whose cumulative share ≥ q via a conditional fold over a
    sorted-array scan — no window needed on a bounded table).
    """
    if not 0 < q <= 1:
        raise ValueError(f"q must be in (0, 1], got {q}")
    w = (hi - lo) / n_buckets
    # cumulative share per bucket without a window: sum counts of buckets
    # <= b for each candidate b, via a self-aggregated sorted array
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("bucket"), F.col("cnt")))
    )
    total = F.aggregate(
        pairs, F.lit(0).cast("long"), lambda acc, x: acc + x["cnt"]
    )
    # fold: track (cum, answer_bucket); first bucket reaching q*total wins
    folded = F.aggregate(
        pairs,
        F.struct(
            F.lit(0).cast("long").alias("cum"),
            F.lit(None).cast("long").alias("ans"),
        ),
        lambda acc, x: F.struct(
            (acc["cum"] + x["cnt"]).alias("cum"),
            F.when(
                acc["ans"].isNull()
                & ((acc["cum"] + x["cnt"]) >= F.lit(q) * total),
                x["bucket"],
            )
            .otherwise(acc["ans"])
            .alias("ans"),
        ),
    )
    return hist.agg(
        (F.lit(lo) + (folded["ans"] + 1) * F.lit(w)).alias(out_col)
    )


def hist_exact_quantile(
    df: DataFrame,
    value_col: str,
    hist: DataFrame,
    q: float,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 256,
    out_col: str = "exact_q",
) -> DataFrame:
    """1-row DataFrame with the EXACT interpolated quantile of
    ``value_col`` — bit-identical to ``F.percentile(value_col, q)`` —
    computed by histogram narrowing instead of an all-values aggregation
    buffer (r11 opt, guide §1.2 "the distributed algorithm").

    ``percentile()`` collects every row's value into a per-task
    ObjectHashAggregate map and merges + sorts them in ONE final task —
    both a local bottleneck (the merge is serial in the value count) and
    the plan's only memory term that grows with rows-per-task.  With an
    equi-width histogram on (``lo``, ``hi``, ``n_buckets``) already in
    hand, the quantile's two order statistics are known to lie in the
    bucket range where the cumulative count crosses ``floor/ceil(q·(n−1))``
    — so pass 1 reads the ≤``n_buckets``-row histogram for the bounds and
    pass 2 re-scans ONLY the rows of those buckets (a 1/n_buckets fraction
    on spread-out data), folds their (value, count) pairs in sorted order,
    and applies Spark's own interpolation formula
    ``(higher − pos)·v_lo + (pos − lower)·v_hi`` with the identical
    double operation order.

    Caveats: NULLs are skipped (like :func:`hist_build`); the narrowed
    pass is only as small as the histogram's resolution — a single bucket
    holding most of the mass degrades it toward a value-cardinality fold
    (use a finer grid).  ``hist`` must have been built by
    :func:`hist_build` over exactly ``df``'s ``value_col`` rows with the
    same grid; pin it if it is referenced elsewhere, or the lazy lineage
    re-runs the build.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    w = (hi - lo) / n_buckets
    v = F.col(value_col).cast("double")
    bucket = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("long")
    # pass 1: one aggregate over the bounded histogram → (pos, lpos, hpos,
    # target bucket range [bl, bh], rows before bl) — all via sorted-array
    # folds, no window, no driver collect (the hist_quantile pattern)
    pairs = F.array_sort(F.collect_list(F.struct(F.col("bucket"), F.col("cnt"))))
    total = F.aggregate(pairs, F.lit(0).cast("long"), lambda a, x: a + x["cnt"])

    def first_bucket_reaching(target_1based):
        # min bucket whose cumulative count >= target (1-based row position)
        return F.aggregate(
            F.col("__pairs"),
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("long").alias("ans"),
            ),
            lambda acc, x: F.struct(
                (acc["cum"] + x["cnt"]).alias("cum"),
                F.when(
                    acc["ans"].isNull()
                    & ((acc["cum"] + x["cnt"]) >= target_1based),
                    x["bucket"],
                )
                .otherwise(acc["ans"])
                .alias("ans"),
            ),
        )["ans"]

    params = (
        hist.agg(pairs.alias("__pairs"), total.alias("__n"))
        .select(
            "__pairs",
            "__n",
            (F.lit(float(q)) * (F.col("__n") - 1)).alias("__pos"),
        )
        .select(
            "__pairs",
            "__n",
            "__pos",
            F.floor(F.col("__pos")).cast("long").alias("__lpos"),
            F.ceil(F.col("__pos")).cast("long").alias("__hpos"),
        )
        .select(
            "__pairs",
            "__n",
            "__pos",
            "__lpos",
            "__hpos",
            first_bucket_reaching(F.col("__lpos") + 1).alias("__bl"),
            first_bucket_reaching(F.col("__hpos") + 1).alias("__bh"),
        )
        .select(
            "__n",
            "__pos",
            "__lpos",
            "__hpos",
            "__bl",
            "__bh",
            F.aggregate(
                F.col("__pairs"),
                F.lit(0).cast("long"),
                lambda a, x: a
                + F.when(x["bucket"] < F.col("__bl"), x["cnt"]).otherwise(
                    F.lit(0).cast("long")
                ),
            ).alias("__before"),
        )
    )
    # pass 2: only rows whose bucket is in [bl, bh] — aggregate to (value,
    # count), fold the sorted pairs to the two order statistics, interpolate
    narrowed = (
        df.where(v.isNotNull())
        .select(v.alias("__v"), bucket.alias("__b"))
        .crossJoin(F.broadcast(params))
        .filter((F.col("__b") >= F.col("__bl")) & (F.col("__b") <= F.col("__bh")))
        .groupBy("__v")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.max("__before").alias("__before"),
            F.max("__pos").alias("__pos"),
            F.max("__lpos").alias("__lpos"),
            F.max("__hpos").alias("__hpos"),
        )
    )
    def value_at(pos_0based):
        # value whose cumulative (local) count covers the 0-based position
        return F.aggregate(
            F.col("__vp"),
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("double").alias("ans"),
            ),
            lambda acc, x: F.struct(
                (acc["cum"] + x["__c"]).alias("cum"),
                F.when(
                    acc["ans"].isNull()
                    & ((acc["cum"] + x["__c"]) >= pos_0based + 1),
                    x["__v"],
                )
                .otherwise(acc["ans"])
                .alias("ans"),
            ),
        )["ans"]

    folded = narrowed.agg(
        F.array_sort(F.collect_list(F.struct(F.col("__v"), F.col("__c"))))
        .alias("__vp"),
        F.max("__before").alias("__bef"),
        F.max("__pos").alias("__p"),
        F.max("__lpos").alias("__l"),
        F.max("__hpos").alias("__h"),
    ).select(
        value_at(F.col("__l") - F.col("__bef")).alias("__vl"),
        value_at(F.col("__h") - F.col("__bef")).alias("__vh"),
        "__p",
        "__l",
        "__h",
    )
    # Spark Percentile.getPercentile, operation-for-operation:
    # higher == lower → lowerKey; else (higher−pos)·vl + (pos−lower)·vh
    return folded.select(
        F.when(F.col("__h") == F.col("__l"), F.col("__vl"))
        .otherwise(
            (F.col("__h").cast("double") - F.col("__p")) * F.col("__vl")
            + (F.col("__p") - F.col("__l").cast("double")) * F.col("__vh")
        )
        .alias(out_col)
    )


# ---------------------------------------------------------------------------
# Mergeable exact moments: the EXACT member of the summary family (count-min
# = approximate frequencies, HLL = approximate distinct, histogram =
# approximate quantiles; (n, Σv, Σv²) = exact mean/variance, losslessly
# mergeable because all three components are plain sums)
# ---------------------------------------------------------------------------


def moments_build(
    df: DataFrame, value_expr: str, *, by: list[str] | None = None
) -> DataFrame:
    """Per-group exact moment partials ``(by..., n, sum_v, sumsq_v)``.

    ``value_expr`` must evaluate to an INTEGRAL type (cast upstream): with
    BIGINT components every partial — and every merge of partials — is
    exact, so shard moments equal whole-corpus moments bit-for-bit, the
    property that makes per-day/per-shard rollups of mean and variance
    safe (float partials re-added in a different order are not — the q1
    discipline applied to second moments).  NULL values are skipped (all
    three sums ignore them consistently).

    One map-side-combining aggregate: the shuffle carries one partial per
    (task, group), never the values.
    """
    v = F.expr(value_expr)
    base = df.where(v.isNotNull())
    keys = [F.col(c) for c in (by or [])]
    return base.groupBy(*keys).agg(
        F.count(v).cast("long").alias("n"),
        F.sum(v).cast("long").alias("sum_v"),
        F.sum(v * v).cast("long").alias("sumsq_v"),
    )


def moments_merge(parts: DataFrame, *, by: list[str] | None = None) -> DataFrame:
    """Fold moment partials over ``by`` (drop keys entirely when None →
    one global row): counts, sums, and sums-of-squares all add."""
    aggs = [
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_v").cast("long").alias("sum_v"),
        F.sum("sumsq_v").cast("long").alias("sumsq_v"),
    ]
    if by:
        return parts.groupBy(*by).agg(*aggs)
    return parts.agg(*aggs)


def moments_stats(df: DataFrame, *, scale: int = 1000) -> DataFrame:
    """Attach ``mean_milli`` / ``var_milli`` (population variance) rendered
    as scaled BIGINTs via the engine-exact half rule FLOOR(x + 0.5).

    The doubles feeding FLOOR are computed the same way any engine would
    from the exact integer components (cast each component to double
    FIRST, then multiply/subtract/divide), so the rendered values
    reproduce cross-engine.  The variance numerator is deliberately NOT
    formed in BIGINT arithmetic: ``n·sumsq − sum²`` wraps past 2^63
    silently in Spark (non-ANSI) while the DuckDB twin errors — at
    milli-quantized values over ~10^7 rows ``sum²`` alone exceeds int64
    (review catch).  In double space the products are exact while each
    component stays under 2^53 and degrade to relative-precision loss —
    never wraparound — beyond it; past 2^53, derive statistics from the
    raw BIGINT components instead.
    """
    n = F.col("n").cast("double")
    s = F.col("sum_v").cast("double")
    q = F.col("sumsq_v").cast("double")
    mean = F.lit(float(scale)) * (s / n) + F.lit(0.5)
    var = F.lit(float(scale)) * ((n * q - s * s) / (n * n)) + F.lit(0.5)
    return df.select(
        "*",
        F.floor(mean).cast("long").alias("mean_milli"),
        F.floor(var).cast("long").alias("var_milli"),
    )


# ---------------------------------------------------------------------------
# Bottom-k sketches: the SAMPLE member of the mergeable-summary family
# (frequencies = count-min, distinct = HLL, quantiles = histogram,
# mean/variance = moments, distinct-SAMPLE + set overlap = this)
# ---------------------------------------------------------------------------


def bottomk_build(
    df: DataFrame, key_col: str, *, k: int = 32, salt: str = "bk"
) -> DataFrame:
    """Bottom-k distinct sample of ``key_col`` → ``(hash, key)`` rows, the k
    SMALLEST ``md5_long(key)`` values over the distinct keys.

    A bottom-k sketch is a mergeable uniform sample of the distinct-key
    set: merging shard sketches (union → global bottom-k) gives EXACTLY
    the sketch of the union, because min-ranks commute with union — no
    approximation in the merge itself, so the merge identity is
    oracle-checkable bit-for-bit (unlike the estimator built on top).
    Deterministic: the md5 rank is a pure key function, no RNG, identical
    in every engine.  NULL keys carry no hash and are excluded.

    Scale shape: per-shard maintenance is a size-k top-k (TakeOrdered /
    partial sort, no global shuffle of the keys); the merge side is k-row
    frames.
    """
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("key"))
        .distinct()
        .select(
            md5_long(F.concat(F.col("key"), F.lit("|" + salt))).alias("hash"),
            "key",
        )
        .orderBy("hash", "key")
        .limit(k)
    )


def bottomk_merge(sketches: list[DataFrame], *, k: int = 32) -> DataFrame:
    """Union shard bottom-k sketches → the union's bottom-k (exact)."""
    if not sketches:
        raise ValueError("bottomk_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("hash", "key").limit(k)


def bottomk_jaccard(
    a: DataFrame, b: DataFrame, *, k: int = 32
) -> DataFrame:
    """Jaccard estimate between two key sets from their bottom-k sketches →
    one row ``(k_used, n_both, jaccard_bp)``.

    The standard bottom-k estimator: take the k smallest hashes of the
    UNION of the two sketches, count how many belong to both sets; the
    share estimates |A∩B| / |A∪B|.  Everything downstream of the (tiny,
    ≤2k-row) sketches — deterministic, so the ESTIMATE itself is
    engine-reproducible and oracle-paired even though it approximates the
    true Jaccard.  Reported in basis points via integer math.
    """
    au = a.select("hash").withColumn("in_a", F.lit(1))
    bu = b.select("hash").withColumn("in_b", F.lit(1))
    uni = (
        au.join(bu, "hash", "full_outer")
        .select(
            "hash",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
        .orderBy("hash")
        .limit(k)
    )
    return uni.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        # FLOOR of the double quotient, never CAST: Spark's double→long cast
        # truncates while DuckDB's rounds (determinism ledger)
        F.floor(
            F.sum(F.col("in_a") * F.col("in_b")).cast("long") * 10000
            / F.greatest(F.count(F.lit(1)), F.lit(1))
        ).cast("long").alias("jaccard_bp"),
    )


def bottomk_cardinality(sk: DataFrame, *, k: int = 64) -> DataFrame:
    """Distinct-cardinality estimate from a bottom-k (KMV/theta) sketch →
    one row ``(n_rows, est_distinct)``.

    The classic KMV estimator: with k smallest 60-bit hashes, the k-th
    smallest ``h_k`` estimates density k/|D| of the hash space, so
    |D| ≈ (k-1)·2^60 / h_k.  A sketch holding fewer than k rows has seen
    the WHOLE distinct set — the exact count is returned instead (the
    estimator's denominator would be meaningless).  All inputs to the one
    double division are exact integers, so the estimate is bit-identical
    across engines (the FLOOR-not-CAST ledger rule renders it).

    ``k`` must be the k the sketch was BUILT with: ``max('hash')`` is only
    h_k when the frame really is a bottom-k sample of that k.  The
    verifiable half of that claim is enforced in-plan — a sketch with
    MORE than k rows (built at a larger k) raises instead of silently
    scaling by the wrong (k-1) (advice r8).  The converse (built smaller,
    claimed larger) is indistinguishable from a complete small set, so it
    stays the caller's contract."""
    scale = float((k - 1) * (1 << 60))
    return sk.agg(
        F.count(F.lit(1)).alias("n_rows"), F.max("hash").alias("__hk")
    ).select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.when(
            F.col("n_rows") > k,
            F.raise_error(
                F.concat(
                    F.lit("bottomk_cardinality: sketch holds "),
                    F.col("n_rows").cast("string"),
                    F.lit(f" rows > k={k} — built with a larger k?"),
                )
            ).cast("long"),
        )
        .when(F.col("n_rows") < k, F.col("n_rows").cast("long"))
        .otherwise(F.floor(F.lit(scale) / F.col("__hk")).cast("long"))
        .alias("est_distinct"),
    )


def bottomk_setops_estimate(
    a: DataFrame, b: DataFrame, *, k: int = 64
) -> DataFrame:
    """Theta-sketch-style set-operation estimates from two bottom-k
    sketches → one row ``(est_a, est_b, est_union, n_both,
    est_intersection, est_only_a)``.

    Composition of the family's two identities: the merge of bottom-k
    sketches IS the union's sketch (min-ranks commute with union →
    est_union is just :func:`bottomk_cardinality` of the merge), and the
    union's k-sample is uniform over A∪B, so the fraction of it belonging
    to both sets estimates |A∩B|/|A∪B| (:func:`bottomk_jaccard`'s
    counter).  est_intersection = n_both·est_union/k_used and the
    difference follows by inclusion — the full theta-sketch set algebra
    (union / intersection / A-not-B) from nothing but mergeable k-row
    samples.  Every division is a FLOOR over exact integers."""
    est_a = bottomk_cardinality(a, k=k).select(
        F.col("est_distinct").alias("est_a")
    )
    est_b = bottomk_cardinality(b, k=k).select(
        F.col("est_distinct").alias("est_b")
    )
    est_u = bottomk_cardinality(bottomk_merge([a, b], k=k), k=k).select(
        F.col("est_distinct").alias("est_union")
    )
    jac = bottomk_jaccard(a, b, k=k).select("k_used", "n_both")
    out = est_a.crossJoin(est_b).crossJoin(est_u).crossJoin(jac)
    inter = F.floor(
        (F.col("n_both") * F.col("est_union")).cast("double")
        / F.greatest(F.col("k_used"), F.lit(1))
    ).cast("long")
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        "n_both",
        inter.alias("est_intersection"),
        F.greatest(
            F.col("est_a") - inter, F.lit(0).cast("long")
        ).alias("est_only_a"),
    )


def cms_inner_product(
    a: DataFrame, b: DataFrame
) -> DataFrame:
    """Join-size / self-join-size estimate from two count-min sketches
    (same depth × width): ``min over rows of Σ_col cntA·cntB`` — the
    classic sketch inner product, an UPPER bound on ``Σ_k cntA(k)·cntB(k)``
    (exact when no hash collisions; collisions only add).  This is the
    query-optimizer / blocking-audit primitive: how many pairs would a
    join or a dedup-blocking key produce, answered from two ≤depth×width
    cell tables without touching either corpus again.  One row
    ``(est_pairs)``."""
    bb = b.select(
        F.col("row").alias("row"),
        F.col("col").alias("col"),
        F.col("cnt").alias("__cnt_b"),
    )
    # products accumulate in DECIMAL: a single hot cell past ~3e9 rows
    # makes cnt² wrap a signed long, and a wrapped-negative row would win
    # the MIN and silently invert the upper-bound contract exactly when
    # the join-explosion warning matters (review catch).  The LONG output
    # cast below bounds the reportable estimate at 2^63 — the caller's
    # pair count is unrepresentable long before that matters.
    per_row = a.join(bb, ["row", "col"]).groupBy("row").agg(
        F.sum(
            F.col("cnt").cast("decimal(19,0)")
            * F.col("__cnt_b").cast("decimal(19,0)")
        ).alias("__p")
    )
    # a sketch row sharing NO cell with b has true inner product 0 — it
    # must participate in the MIN as 0, not vanish from it (an inner-join
    # min over the surviving rows would overestimate, or go NULL for
    # fully-disjoint sketches)
    rows = a.select("row").distinct()
    prod = rows.join(per_row, "row", "left").select(
        F.coalesce(F.col("__p"), F.lit(0).cast("long")).alias("__p")
    )
    # empty `a` stays NULL (no sketch, no estimate) — only present-but-
    # disjoint rows coalesce to 0 above
    return prod.agg(F.min("__p").cast("long").alias("est_pairs"))
