"""Column profiling: the data-quality summary every ingest pipeline runs
before trusting a feed (the reference validates its inputs ad hoc —
row-count guards in lib/pipeline_controller.py and null checks scattered
through helpers/; this operator is that validation generalized to a single
declarative pass).

The DEFAULT path (``exact_distinct=False``) is one aggregate scan
producing every per-column statistic as ONE wide row (count / nulls / HLL
distinct / min / max as canonical strings) plus a zero-shuffle ``stack``
unpivot — no Expand, constant memory, the plan you want on a corpus-scale
feed.

``exact_distinct=True`` (the oracle-checkable mode) must NOT go through
Spark's multi-distinct planning — that expands the scan N_cols× through a
gid-Expand before partial aggregation (measured 5× slower than HLL at
sf0.1, and the multiplier rides to 100 TB).  Instead it runs TWO clean
passes: the same non-distinct wide agg, plus a ``stack`` unpivot to
(column, canonical value) pairs collapsed map-side by a two-level
aggregate — the shuffle carries distinct pairs, never row volume, and no
Expand appears in either plan.  Canonical value forms are injective per
dtype (doubles add +0.0 to merge IEEE -0.0/0.0 exactly like native
distinct semantics; binary goes through hex) so the count equals native
COUNT(DISTINCT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "table_profile",
    "group_quantiles",
    "int_histogram",
    "winsorized_stats",
    "categorical_mi",
    "k_anonymity",
    "l_diversity",
    "ranking_auc",
    "profile_drift",
]


def _canon_str(c, dtype: str):
    """Engine-portable string form for an aggregated min/max value: dates
    are ISO, floats are rounded to 2 and rendered via DECIMAL so Spark and
    the SQL oracle print identical text ('1.50', not '1.5').  Applied AFTER
    the min/max aggregate so ordering is native (numeric), never
    lexicographic."""
    if dtype in ("double", "float"):
        return F.round(c, 2).cast("decimal(28,2)").cast("string")
    return c.cast("string")


def _distinct_key(c: str, dtype: str):
    """Injective canonical form for exact-distinct counting: two values map
    to the same key iff native COUNT(DISTINCT) would merge them.  Doubles
    add +0.0 (IEEE -0.0 == 0.0 under native distinct; their strings differ);
    binary goes through hex (UTF-8 decode is lossy); arrays/structs/maps go
    through to_json (a bare string cast renders ['a, b'] and ['a','b']
    identically — silent undercount); everything else casts injectively
    (Java shortest-roundtrip for floats, full precision for timestamps)."""
    col = F.col(c)
    if dtype in ("double", "float"):
        return (col + F.lit(0.0)).cast("string")
    if dtype == "binary":
        return F.hex(col)
    if dtype.startswith(("array", "struct", "map")):
        return F.to_json(col)
    return col.cast("string")


def table_profile(
    df: DataFrame, cols: list[str], *, exact_distinct: bool = False
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_value, max_value), one row
    per profiled column, ordered by column name."""
    from engine.ops.quality import _check_ident

    for c in cols:
        _check_ident(c, "column name")
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            _canon_str(F.min(F.col(c)), dtypes[c]).alias(f"__min_{c}"),
            _canon_str(F.max(F.col(c)), dtypes[c]).alias(f"__max_{c}"),
        ]
        if not exact_distinct:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    if exact_distinct:
        # Exact distinct WITHOUT the multi-distinct gid-Expand: unpivot to
        # (column, canonical value) in the scan projection, collapse
        # duplicates map-side, count per column.  Shuffle volume = distinct
        # pairs; both passes stay whole-stage codegen.
        pairs = df.select(
            *[_distinct_key(c, dtypes[c]).alias(f"__k_{c}") for c in cols]
        ).selectExpr(
            f"stack({len(cols)}, "
            + ", ".join(f"'{c}', `__k_{c}`" for c in cols)
            + ") AS (`column`, `__val`)"
        )
        nd = (
            pairs.filter(F.col("__val").isNotNull())
            .groupBy("column", "__val")
            .agg(F.lit(1).alias("__one"))
            .groupBy("column")
            .agg(F.count(F.lit(1)).alias("n_distinct"))
        )
        stack_args = ", ".join(
            f"'{c}', `__n`, `__nn_{c}`, `__min_{c}`, `__max_{c}`" for c in cols
        )
        base = wide.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(`column`, n_rows, n_null, min_value, max_value)"
        )
        # a column whose values are all NULL has no pair rows -> 0 distinct
        return (
            base.join(F.broadcast(nd), "column", "left")
            .select(
                "column",
                "n_rows",
                "n_null",
                F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
                "min_value",
                "max_value",
            )
            .orderBy("column")
        )
    stack_args = ", ".join(
        f"'{c}', `__n`, `__nn_{c}`, `__nd_{c}`, `__min_{c}`, `__max_{c}`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(`column`, n_rows, n_null, n_distinct, min_value, max_value)"
    ).orderBy("column")


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    metric_col: str,
    *,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact: bool = True,
) -> DataFrame:
    """Per-group discrete quantiles of an integer metric (+ group count),
    ordered by group.  ``percentile_disc`` returns an ACTUAL data value
    (cast back to long), so results are engine-exact — no interpolation.
    One shuffle on the group key; ``exact=False`` swaps in the
    bounded-memory ``approx_percentile`` sketch for corpus-scale metrics
    (same plan shape, values within sketch error)."""
    from engine.ops.quality import _check_ident

    _check_ident(metric_col, "metric column")
    aliases = [f"q{int(round(p * 100)):02d}" for p in probs]
    if len(set(aliases)) != len(aliases):
        raise ValueError(
            f"probs {probs} collide after rounding to integer percents {aliases}"
        )
    if exact:
        aggs = [
            F.expr(
                f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY `{metric_col}`)"
            )
            .cast("long")
            .alias(a)
            for p, a in zip(probs, aliases)
        ]
    else:
        aggs = [
            F.percentile_approx(metric_col, p)
            .cast("long")
            .alias(a)
            for p, a in zip(probs, aliases)
        ]
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
        .orderBy(*group_cols)
    )


def int_histogram(
    df: DataFrame, metric_col: str, *, lo: int, hi: int, n_buckets: int
) -> DataFrame:
    """Fixed-width histogram of an integer metric: (bucket, lo_edge,
    hi_edge, n_rows) with bucket -1 for underflow and ``n_buckets`` for
    overflow.  The bucket index is INTEGER arithmetic
    (``(x - lo) * n div (hi - lo)``) — exact and engine-invariant, unlike
    float ``width_bucket`` boundary behavior.  One exchange carrying at
    most ``n_buckets + 2`` partial counts per task."""
    from engine.ops.quality import _check_ident

    _check_ident(metric_col, "metric column")
    x = F.col(metric_col).cast("long")
    span = hi - lo
    bucket = (
        F.when(x < lo, F.lit(-1))
        .when(x >= hi, F.lit(n_buckets))
        .otherwise(
            F.expr(
                f"((CAST(`{metric_col}` AS BIGINT) - {lo}) * {n_buckets}) div {span}"
            )
        )
        .cast("long")
    )
    out = (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    width = span / n_buckets
    return out.select(
        "bucket",
        F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 4).alias("lo_edge"),
        F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 4).alias(
            "hi_edge"
        ),
        "n_rows",
    ).orderBy("bucket")


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    lo: float = 0.05,
    hi: float = 0.95,
    bound_round: int = 4,
    mean_round: int = 4,
) -> DataFrame:
    """Outlier-robust per-group statistics: values clipped to the group's
    [lo, hi] exact interpolated percentiles (winsorization — the robust
    aggregate a metrics/feature pipeline uses where a single fat-finger
    reading would poison a plain mean).

    Returns (group, n, lo_bound, hi_bound, n_clipped_lo, n_clipped_hi,
    win_mean).

    Determinism (reworked after the r9 percentiles_exact catch): values
    quantize to INTEGER ``10^bound_round``-units before the percentile —
    Spark ``percentile`` and DuckDB ``quantile_cont`` are bit-identical
    over integer inputs (verified empirically: same ``(1−f)·a + f·b``
    double ops for every fraction) — and every rendering is
    ``FLOOR(x + 0.5)``, never ``ROUND``: Spark rounds the double's
    SHORTEST DECIMAL STRING half-up while DuckDB rints the binary value,
    so ``ROUND`` diverges on any double whose shortest string ends in a
    half digit even when both engines hold the identical double.  The
    clip decision and both clip counts are pure integer comparisons.

    Scale shape: one ``percentile`` aggregate per group broadcast back
    onto the stream, then one clipped aggregate — two shuffles on the
    group key, no self-join, no global sort.  Memory is bounded at ANY
    corpus size because the quantized ``__vi`` domain is bounded:
    ``percentile``'s partial buffer is a value→count MAP, so its size is
    capped by DISTINCT quantized values (10^bound_round × value range),
    not by rows — the r11 percentiles_exact lesson.  An r11 rewrite to
    per-group histogram narrowing (``_grouped_exact_percentiles``) was
    bit-identical but measured 7× SLOWER at ×100 (10.4 s vs 1.2 s, and
    5-6× slower on a hostile single-hot-bucket distribution): its 3-4
    extra corpus scans can never be repaid when the buffer is
    domain-bounded, so it was REVERTED in r12 (SCALE.md appendix;
    histogram narrowing remains correct for UNBOUNDED value domains —
    see ``engine.extended.sketch.hist_exact_quantile``).
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got lo={lo}, hi={hi}")
    g = F.col(group_col)
    v = F.col(value_col)
    scale = float(10 ** bound_round)
    mscale = float(10 ** mean_round)
    # NaN is excluded like NULL (second review r9): Spark's
    # floor(NaN)→long silently yields 0, which would inject a fake 0.0
    # reading into the robust statistic (and the oracle's CAST raises on
    # NaN) — an undefined reading carries no information either way
    base = df.filter(
        g.isNotNull() & v.isNotNull() & ~F.isnan(v.cast("double"))
    ).withColumn(
        "__vi",
        F.floor(v.cast("double") * F.lit(scale) + F.lit(0.5)).cast("long"),
    )
    bounds = base.groupBy(group_col).agg(
        F.floor(F.percentile("__vi", F.lit(lo)) + F.lit(0.5))
        .cast("long").alias("__lo_i"),
        F.floor(F.percentile("__vi", F.lit(hi)) + F.lit(0.5))
        .cast("long").alias("__hi_i"),
    )
    joined = base.join(F.broadcast(bounds), group_col)
    clipped = F.least(
        F.greatest(F.col("__vi"), F.col("__lo_i")), F.col("__hi_i")
    )
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        (F.first("__lo_i") / F.lit(scale)).alias("lo_bound"),
        (F.first("__hi_i") / F.lit(scale)).alias("hi_bound"),
        F.sum(F.when(F.col("__vi") < F.col("__lo_i"), 1).otherwise(0)).alias(
            "n_clipped_lo"
        ),
        F.sum(F.when(F.col("__vi") > F.col("__hi_i"), 1).otherwise(0)).alias(
            "n_clipped_hi"
        ),
        (
            # DECIMAL(38,0) accumulation: Spark's non-ANSI sum(long) wraps
            # past 2^63 while DuckDB sums BIGINT into HUGEINT — the exact
            # 38-digit sum matches HUGEINT's range, and casting the exact
            # integer to double is the same rounding in both engines
            # (second review r9)
            F.floor(
                F.sum(clipped.cast("decimal(38,0)")).cast("double")
                * F.lit(mscale)
                / (F.count(F.lit(1)) * F.lit(scale))
                + F.lit(0.5)
            ) / F.lit(mscale)
        ).alias("win_mean"),
    )


def categorical_mi(
    df: DataFrame,
    col_x: str,
    col_y: str,
    *,
    round_to: int = 4,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns — the
    feature-association audit (is ``lang`` informative about ``source``?
    is a split column accidentally correlated with a label?).  Returns
    one row: (n, h_x, h_y, mi, nmi) with NMI = MI / min(H) (0 when either
    marginal entropy is 0 — a constant column carries no information).

    Rows with a NULL in either column are excluded (MI over observed
    pairs).  All probabilities come from exact integer counts; the only
    floats are the final ln terms, rounded.

    Scale shape: one (x, y) aggregate, two marginal aggregates joined
    back on their keys, the total as a broadcast 1-row table — joint
    cardinality bounds everything after the first aggregate.
    """
    base = df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    joint = base.groupBy(col_x, col_y).agg(F.count(F.lit(1)).alias("c_xy"))
    px = base.groupBy(col_x).agg(F.count(F.lit(1)).alias("c_x"))
    py = base.groupBy(col_y).agg(F.count(F.lit(1)).alias("c_y"))
    n = base.agg(F.count(F.lit(1)).alias("n"))
    j = joint.join(px, col_x).join(py, col_y).crossJoin(F.broadcast(n))
    p_xy = F.col("c_xy") / F.col("n")
    mi = F.sum(
        p_xy * F.log(p_xy / ((F.col("c_x") / F.col("n")) * (F.col("c_y") / F.col("n"))))
    )
    hx = px.crossJoin(F.broadcast(n)).agg(
        (-F.sum((F.col("c_x") / F.col("n")) * F.log(F.col("c_x") / F.col("n"))))
        .alias("h_x")
    )
    hy = py.crossJoin(F.broadcast(n)).agg(
        (-F.sum((F.col("c_y") / F.col("n")) * F.log(F.col("c_y") / F.col("n"))))
        .alias("h_y")
    )
    agg = j.agg(mi.alias("mi")).crossJoin(hx).crossJoin(hy).crossJoin(n)
    hmin = F.least(F.col("h_x"), F.col("h_y"))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round("h_x", round_to).alias("h_x"),
        F.round("h_y", round_to).alias("h_y"),
        F.round("mi", round_to).alias("mi"),
        F.when(hmin > 0, F.round(F.col("mi") / hmin, round_to))
        .otherwise(F.lit(0.0))
        .alias("nmi"),
    )


def k_anonymity(df: DataFrame, quasi_cols: list[str], *, k: int = 5) -> DataFrame:
    """Equivalence-class audit for the k-anonymity privacy criterion: rows
    sharing one combination of the quasi-identifier columns form a class; a
    class smaller than ``k`` re-identifies its members by linkage.  Returns
    the class table (quasi cols + ``class_size`` + ``at_risk``) for callers
    to aggregate (share of rows at risk, min class size per stratum) or to
    drive suppression/generalization.

    Scale shape: one hash aggregate on the quasi-identifier tuple — the
    class table is at most quasi-cardinality rows, so the audit of a 100 TB
    release is a single shuffle bounded by the identifier space, never by
    row count.  NULL quasi values group together (SQL GROUP BY semantics)
    — a NULL-heavy column forms one big class, which is the conservative
    direction for an at-risk audit.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    cls = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    return cls.withColumn("at_risk", F.col("class_size") < k)


def profile_drift(
    old_df: DataFrame,
    new_df: DataFrame,
    numeric_cols: list[str],
    *,
    drift_bp: int = 500,
    scale: int = 1000,
) -> DataFrame:
    """Per-column distribution drift between two snapshots of the same
    table — the data-ops monitor that catches an upstream schema change,
    unit change, or silent NULL flood before it reaches training.

    For each column: row count, NULL rate (basis points), and mean in
    milli-units, computed for BOTH snapshots in ONE aggregate pass each
    (all columns' sums ride one map-side-combined agg — never a pass per
    column), then joined per column.  ``drift_flag`` fires when the NULL
    rate moved more than ``drift_bp`` or the mean moved more than
    ``drift_bp`` RELATIVE basis points.

    Determinism discipline: values quantize to ``scale`` units through
    FLOOR(x + 0.5) before summing (BIGINT sums are partition-order-exact;
    double sums are not), and every rendered ratio goes through the same
    engine-exact half rule.

    Returns one row per column:
    ``(col_name, old_n, new_n, old_null_bp, new_null_bp, old_mean_milli,
    new_mean_milli, drift_flag)``.
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        aggs = []
        for c in numeric_cols:
            vm = F.floor(F.lit(float(scale)) * F.col(c) + F.lit(0.5)).cast(
                "long"
            )
            aggs += [
                F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
                F.sum(F.col(c).isNull().cast("long")).cast("long").alias(
                    f"{c}__nulls"
                ),
                F.sum(vm).alias(f"{c}__vsum"),
                F.count(F.col(c)).cast("long").alias(f"{c}__vn"),
            ]
        one = df.agg(*aggs)
        pairs = ", ".join(
            f"'{c}', {c}__n, {c}__nulls, {c}__vsum, {c}__vn"
            for c in numeric_cols
        )
        stacked = one.select(
            F.expr(
                f"stack({len(numeric_cols)}, {pairs})"
                " AS (col_name, n, nulls, vsum, vn)"
            )
        )
        half = F.lit(0.5)
        return stacked.select(
            "col_name",
            F.col("n").alias(f"{tag}_n"),
            F.when(F.col("n") == 0, F.lit(0))
            .otherwise(
                F.floor(10000.0 * F.col("nulls") / F.col("n") + half)
            )
            .cast("long")
            .alias(f"{tag}_null_bp"),
            F.when(F.col("vn") == 0, F.lit(None))
            .otherwise(
                F.floor(F.col("vsum").cast("double") / F.col("vn") + half)
            )
            .cast("long")
            .alias(f"{tag}_mean_milli"),
        )

    j = side(old_df, "old").join(side(new_df, "new"), "col_name", "full_outer")
    null_moved = (
        F.abs(
            F.coalesce("new_null_bp", F.lit(0))
            - F.coalesce("old_null_bp", F.lit(0))
        )
        > drift_bp
    )
    om = F.coalesce(F.col("old_mean_milli"), F.lit(0)).cast("double")
    nm = F.coalesce(F.col("new_mean_milli"), F.lit(0)).cast("double")
    mean_moved = (
        F.floor(10000.0 * F.abs(nm - om) / F.greatest(F.abs(om), F.lit(1.0))
                + F.lit(0.5))
        > drift_bp
    )
    return j.select(
        "col_name",
        "old_n", "new_n", "old_null_bp", "new_null_bp",
        "old_mean_milli", "new_mean_milli",
        (null_moved | mean_moved).cast("int").alias("drift_flag"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    l: int = 3,
) -> DataFrame:
    """Distinct-l-diversity audit, the companion criterion to
    :func:`k_anonymity`: a quasi-identifier class whose SENSITIVE column
    holds fewer than ``l`` distinct values leaks that attribute by
    association even when the class is large (the homogeneity attack
    k-anonymity alone cannot see).  Returns the class table (quasi cols +
    ``class_size`` + ``sensitive_diversity`` + ``at_risk``).

    Scale shape: one exact COUNT(DISTINCT) aggregate on the quasi tuple —
    Spark plans it as the standard two-phase expand/partial, still bounded
    by quasi-cardinality output.  NULL sensitive values do not count
    toward diversity (SQL COUNT DISTINCT semantics): an all-NULL class
    audits as zero-diverse, the conservative direction.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    cls = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(sensitive_col).alias("sensitive_diversity"),
    )
    return cls.withColumn("at_risk", F.col("sensitive_diversity") < l)


def ranking_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    quant: int = 1000,
    score_cap: int = 1_000_000_000,
) -> DataFrame:
    """ROC AUC of a score against a binary label — the classifier/quality-
    scorer evaluation every selection pipeline reads before trusting a
    score column — computed SCALE-SAFELY: no global rank window over the
    corpus.

    Uses the pairwise identity ``AUC = Σ_v npos(v)·(cumneg(<v) + nneg(v)/2)
    / (P·N)`` over the DISTINCT-score table: one groupBy collapses the
    corpus to per-score (npos, nneg) counts, and the cumulative-negative
    running sum rides :func:`engine.extended.sampling._size_rank`'s
    bit-length-bucketed machinery (no SinglePartition exchange) with the
    negatives count as the window weight.  Ties contribute the standard
    half credit exactly (everything stays integer until ONE final
    division — accumulated in DECIMAL so the ≈2·P·N numerator cannot wrap
    a signed long at billions-per-class scale, review catch).  Scores
    quantize to ``quant`` units, clamp to ``[-score_cap, score_cap]``,
    and SHIFT by ``score_cap`` into non-negative longs — an
    order-preserving affine map, so negative scores (logits, z-scores,
    centered sims) rank correctly instead of collapsing into one tie at
    zero (review catch: the first cut clamped at 0 and scored a perfect
    negative-range separator as 0.5).  NULL scores and labels are
    excluded.  Returns one row ``(n_pos, n_neg, auc_micro)`` with NULL
    auc when either class is empty.
    """
    from engine.extended.sampling import _size_rank

    lab = F.col(label_col).cast("int")
    cap = int(score_cap)
    sc = F.least(
        F.greatest(
            F.floor(F.col(score_col).cast("double") * quant + F.lit(0.5))
            .cast("long"),
            F.lit(-cap).cast("long"),
        ),
        F.lit(cap).cast("long"),
    ) + F.lit(cap).cast("long")
    s = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(sc.alias("score"), lab.alias("lab"))
    vt = s.groupBy("score").agg(
        F.sum("lab").alias("np"),
        F.sum(F.lit(1) - F.col("lab")).alias("nn"),
    )
    ranked = _size_rank(
        vt, "score", "score", descending=False, weight_col="nn"
    )
    # __runsum is cumulative negatives INCLUSIVE of this score's group
    return ranked.select(
        "np", "nn", (F.col("__runsum") - F.col("nn")).alias("cumneg")
    ).agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.when(
            (F.sum("np") > 0) & (F.sum("nn") > 0),
            F.floor(
                F.sum(
                    (F.col("np") * (2 * F.col("cumneg") + F.col("nn")))
                    .cast("decimal(38,0)")
                ).cast("double")
                / (
                    F.lit(2.0)
                    * F.sum("np").cast("double")
                    * F.sum("nn").cast("double")
                )
                * 1000000
                + F.lit(0.5)
            ).cast("long"),
        ).alias("auc_micro"),
    )
