"""Dataset splitting and sampling for training-data pipelines (north-star).

- :func:`hash_split` — deterministic train/val/test assignment from a stable
  content/id hash: reproducible across runs, machines, and engine versions,
  and immune to row order (the property RNG-based ``randomSplit`` lacks).
  Pure expression → no shuffle; the split column can partition the output
  write.
- :func:`stratified_sample` — per-stratum Bernoulli sampling with a fixed
  seed (``sampleBy``): class-balanced subsets at corpus scale without
  collecting group sizes first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_split",
    "group_safe_split",
    "weighted_sample",
    "negative_sample",
    "stratified_sample",
    "stratified_sample_det",
    "mixture_sample",
    "per_key_sample",
    "shard_assign",
    "balanced_shards",
    "length_bucket_batches",
    "global_order",
    "stratified_kfold",
    "rendezvous_assign",
]


def hash_split(
    key: Column | str,
    *,
    splits: dict[str, float] | None = None,
) -> Column:
    """Split label ('train'/'val'/'test' by default) from md5(key).

    The first 4 hex chars of md5 give a uniform 16-bit bucket; cumulative
    fraction thresholds carve it.  md5 (not xxhash) so any engine —
    including the DuckDB oracle — reproduces the assignment bit-for-bit.
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    c = F.col(key) if isinstance(key, str) else key
    bucket = F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("long")
    total = 65536
    expr = None
    acc = 0.0
    items = list(splits.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = bucket < int(acc * total)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return (expr.otherwise(last)) if expr is not None else F.lit(last)


def group_safe_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: dict[str, float] | None = None,
) -> DataFrame:
    """Leakage-safe train/val/test split: the assignment unit is the
    exact-dup GROUP — every doc sharing a normalized-text fingerprint gets
    the split of the group's canonical member (min id) — so duplicate
    documents can NEVER straddle splits.  The constructive counterpart of
    :func:`engine.ops.quality.split_leakage_audit`, which MEASURES the
    contamination a per-doc split allows; running the audit on this
    split's output is empty by construction (pinned by test).

    Returns ``(id, group_rep, split)``.  Scale shape: ONE fingerprint
    shuffle (the exchange exact dedup already pays) carrying only
    ``(fp, id)``; the representative is a min-window on that exchange (no
    self-join), and the split itself is a pure md5 expression on the
    representative — order-, run-, and engine-stable.
    """
    from engine.extended.text import fingerprint

    labeled = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(id_col), fingerprint(text_col).alias("__fp"))
    # materialize the rep in its own projection so the min-window runs
    # ONCE (inlining it into hash_split too would put two copies of the
    # window expression in one select)
    with_rep = labeled.select(
        F.col(id_col),
        F.min(id_col).over(Window.partitionBy("__fp")).alias("group_rep"),
    )
    return with_rep.select(
        F.col(id_col),
        "group_rep",
        hash_split(F.col("group_rep"), splits=splits).alias("split"),
    )


def stratified_sample_det(
    df: DataFrame,
    strata_col: str,
    fractions_bp: int | dict,
    *,
    id_col: str = "doc_id",
    seed: int = 42,
    default_bp: int = 0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the hash-rank sibling of
    :func:`stratified_sample`: keep a row iff its md5 rank (first 15 hex
    chars of ``md5(seed|stratum|id)`` as a 60-bit integer, mod 10000) falls
    below the stratum's basis-point fraction.  Reproducible across runs,
    row orders, partition counts, and engines (the md5_long dual family —
    the DuckDB oracle replays the exact keep set), which seeded
    ``sampleBy`` cannot promise.

    ``fractions_bp`` is an int (uniform basis points for every stratum) or
    a user-declared ``{stratum: bp}`` dict applied as a literal CASE —
    never collected from data.  NULL strata/ids sample deterministically
    via sentinels (concat_ws would silently SKIP nulls — the cross-engine
    trap in the determinism ledger).

    Scale shape: pure expression filter, no shuffle, no driver collect —
    the fix for the distinct().collect() the rows-only query carried
    (VERDICT r7 #6).
    """
    from engine.extended.dedup import md5_long

    strat = F.coalesce(F.col(strata_col).cast("string"), F.lit("␀"))
    ident = F.coalesce(F.col(id_col).cast("string"), F.lit("␀"))
    tag = (
        md5_long(
            F.concat(F.lit(str(seed)), F.lit("|"), strat, F.lit("|"), ident)
        )
        % 10000
    )
    if isinstance(fractions_bp, dict):
        thr = None
        for name, bp in fractions_bp.items():
            cond = (
                F.col(strata_col).isNull()
                if name is None
                else (F.col(strata_col) == F.lit(name))
            )
            thr = (
                F.when(cond, F.lit(int(bp)))
                if thr is None
                else thr.when(cond, F.lit(int(bp)))
            )
        thr = thr.otherwise(F.lit(int(default_bp))) if thr is not None else F.lit(int(default_bp))
    else:
        thr = F.lit(int(fractions_bp))
    return df.filter(tag < thr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, *, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (seeded, one pass, no group-size
    collection).  Engine-native randomness → rows-only in the harness;
    :func:`stratified_sample_det` is the engine-portable deterministic
    variant the registry query pins."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def per_key_sample(
    df: DataFrame,
    group_col: str,
    *,
    k: int,
    id_col: str = "doc_id",
    salt: str = "pks",
) -> DataFrame:
    """Deterministic uniform sample of at most ``k`` rows per group.

    Reservoir-sampling semantics (uniform within each group, exactly
    ``min(k, group_size)`` rows) without RNG state: the md5 of the row id is
    the random tag, so the selection is reproducible across runs, row orders,
    partition counts, and engines — the property driver-seeded ``sample``
    lacks.

    Scale shape: one shuffle on ``group_col``; the ``row_number <= k`` filter
    is recognized by Catalyst's WindowGroupLimit, which keeps a per-partition
    top-k heap instead of fully sorting each group — cost O(n log k), state
    O(k) per group, so a hot key degrades gracefully rather than spilling a
    whole-group sort.
    """
    from pyspark.sql import Window

    tag = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    w = Window.partitionBy(group_col).orderBy(tag, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def shard_assign(
    df: DataFrame,
    *,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    position: bool = True,
) -> DataFrame:
    """Deterministic global shuffle for training-shard writes.

    ``shard`` = md5-bucket of the row id mod ``n_shards`` — a pure expression
    (no shuffle to assign, content-stable across epochs and engines).
    ``shard_pos`` = hash rank within the shard, i.e. the within-shard read
    order.  Writing ``partitionBy(shard)`` with rows sorted by ``shard_pos``
    gives every epoch reader the same globally-shuffled order WITHOUT a
    global sort: the only exchange is the hash partition on ``shard``, which
    is exactly the write partitioning, and the per-shard sort is
    partition-local (``sortWithinPartitions``).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    out = df.withColumn("shard", (bucket % n_shards).cast("int"))
    if position:
        w = Window.partitionBy("shard").orderBy(h, F.col(id_col))
        out = out.withColumn("shard_pos", F.row_number().over(w))
    return out


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float],
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Largest exact subsample matching a target group mixture.

    Given target proportions (e.g. ``{"web": 0.6, "book": 0.4}``), find the
    maximal total size whose per-group quotas ``floor(wᵍ·scale)`` fit inside
    every group's available rows (``scale = min over groups of nᵍ/wᵍ``), then
    keep each group's quota by md5-rank — deterministic across runs, row
    orders, and engines (the domain-reweighting step of corpus mixing).
    Groups absent from ``targets`` are dropped.

    A target group with NO corpus rows caps the scale at 0, so the result is
    EMPTY rather than a silently skewed mixture (a 100%%-web sample when the
    caller asked for 60/40 web/book and books are missing) — the targets are
    outer-joined against observed counts so absent groups count as 0
    available, not "not constraining".

    Scale shape: one count aggregate (group-cardinality-sized), a broadcast
    of the quota table, and one window rank per group — the corpus is
    shuffled once on ``group_col``.  No driver-side collection.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in targets.items()], [group_col, "__w"]
    ).filter(F.col("__w") > 0)
    counts = (
        tgt.join(
            df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n_avail")),
            group_col,
            "left",
        )
        .withColumn("__n_avail", F.coalesce(F.col("__n_avail"), F.lit(0)))
    )
    scale = counts.agg(
        F.min(F.col("__n_avail") / F.col("__w")).alias("__scale")
    )
    # +1e-9: ``scale = min(n/w)`` is a double, so the BINDING group's own
    # quota ``w·(n/w)`` sits exactly on the floor boundary and one ulp of
    # division error drops a row the caller is owed (0.6·(3/0.6) =
    # 2.9999999999999996 → floor 2, not 3).  The epsilon resolves the
    # boundary upward deterministically — temperature_mixture's discipline
    # (r10 review); it can never push a quota past n_avail because
    # w·scale ≤ n by construction and floor(n + 1e-9) = n.
    quotas = counts.crossJoin(F.broadcast(scale)).select(
        group_col,
        "__n_avail",
        F.floor(F.col("__w") * F.col("__scale") + F.lit(1e-9)).alias("__quota"),
    )
    rk = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|mix"))), id_col
    )
    return (
        df.withColumn("__rk", F.row_number().over(rk))
        .join(F.broadcast(quotas), group_col)
        .filter(F.col("__rk") <= F.col("__quota"))
        .drop("__rk", "__n_avail", "__quota")
    )


def temperature_mixture(
    df: DataFrame,
    *,
    alpha: float,
    total: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-weighted mixture sample: group g gets
    ``quota_g = min(n_g, floor(total * n_g^alpha / sum(n^alpha)))`` rows —
    the multilingual/domain rebalancing rule (alpha < 1 flattens the head,
    alpha = 1 is proportional, alpha = 0 is uniform-by-group).

    Rows within each group are chosen by md5-rank (hash IS the RNG:
    deterministic across runs, row orders, partitionings, engines).  Quotas
    saturated at n_g are NOT redistributed — the realized total can undershoot
    ``total`` when a tail group runs dry (documented, matches the simple
    temperature rule).

    The floor carries a +1e-9 epsilon: ``sum(n^alpha)`` is an order-dependent
    double sum, so a share that is EXACTLY integral (equal-sized groups) sits
    on the floor boundary and would otherwise flip by one row between runs /
    engines.  The epsilon resolves the boundary upward deterministically.

    Scale shape: one group-cardinality count agg, a broadcast quota table,
    one md5-rank window per group — a single exchange on ``group_col``.
    ``sum(n^alpha)`` folds over the GROUP-CARDINALITY table via an
    unpartitioned window (single partition of #groups rows — the same
    benign shape as global_order's offsets table), not a second aggregate +
    cross join: one fewer barrier on the quota path.
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    wexpr = F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    quotas = (
        counts.withColumn("__w", wexpr)
        .withColumn("__sw", F.sum("__w").over(Window.partitionBy()))
        .select(
            group_col,
            F.least(
                F.col("__n"),
                F.floor(
                    F.lit(float(total)) * F.col("__w") / F.col("__sw")
                    + F.lit(1e-9)
                ).cast("long"),
            ).alias("__quota"),
        )
    )
    rk = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))), id_col
    )
    return (
        df.withColumn("__rk", F.row_number().over(rk))
        .join(F.broadcast(quotas), group_col)
        .filter(F.col("__rk") <= F.col("__quota"))
        .drop("__rk", "__quota")
    )


def _size_bucket(sz_col: str) -> Column:
    """Order-consistent bounded bucket id for a non-negative long size
    column: ``bitlen(sz) * 128 + (sz >> max(bitlen(sz) - 7, 0))`` — the
    bit length refined by the size's top 7 bits.

    Monotone in ``sz`` (for equal bit lengths, the top-7-bit prefix of two
    same-length binary numbers orders like the numbers; across bit lengths
    the ``* 128`` stride dominates because the refinement is < 128), so
    all rows of bucket *i* precede all rows of bucket *i+1* under the size
    total order — the property that makes per-bucket running sums + a
    bucket-offset cumsum equal one global running sum.  At most 64 × 128 =
    8192 buckets, so the offsets side stays driver-trivial, while any ONE
    bit length (the realistic concentration: docs all 512-1023 tokens)
    splits across up to 128 window partitions instead of one (r6 verdict
    item: the bit-length-only bucket concentrated the stage's parallelism).

    Takes a column NAME (``shiftright`` goes through ``F.expr`` because
    the DSL binding takes only a literal shift and this one varies per
    row).
    """
    blen = F.length(F.bin(F.col(sz_col))).cast("long")
    top = F.expr(
        f"shiftright({sz_col}, "
        f"greatest(cast(length(bin({sz_col})) as int) - 7, 0))"
    )
    return (blen * 128 + top).cast("long")


def _size_rank(
    df: DataFrame,
    size_col: str,
    id_col: str,
    *,
    descending: bool,
    with_total: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """Attach ``__sz`` (clamped size) and a GLOBAL running weight sum over
    the (size, id) total order — scale-safely, with no single-reducer
    window.  With the default unit weight this is a global rank: the
    output carries ``__grank`` (0-based); with ``weight_col`` it is a
    global cumulative sum and carries ``__runsum`` (inclusive of the
    current row) — one machinery for both balanced_shards'
    rank-and-deal and budget_select's running-cost prefix (review catch:
    the two used to carry duplicate copies of this pattern).

    The :func:`global_order` pattern adapted to a size ordering: rows
    bucket by a prefix of their size's binary representation (see
    :func:`_size_bucket` — integer-exact and monotone in sz, so bucket
    order is consistent with the total order, unlike a float ``log2``
    whose ulp error could misorder boundary values), running-sum within
    buckets via a partitioned window, and add per-bucket weight totals
    cumsum-ed over the ≤8192-row bucket table.  The r6 cut bucketed by
    bit length alone (≤64 buckets), which concentrated the window stage's
    parallelism onto ONE bucket whenever most rows shared a bit length —
    a realistic corpus shape (docs all 512-1023 tokens).  Refining the
    key with the size's top 7 bits splits every bit-length into up to 128
    order-consistent sub-buckets, deterministically and probe-free — no
    sampled range exchange, no second corpus pass, and ranks are
    IDENTICAL because any order-consistent refinement of the buckets
    leaves (offset + within-bucket position) unchanged.  Residual
    limitation: a corpus where most rows share one EXACT size still
    concentrates (ties must rank contiguously by id, which no
    deterministic value-based bucketing can split); that shape needs a
    sampled range exchange on (size, id) and is documented, not hidden.

    NULL and negative sizes clamp to 0 (a negative long's two's-complement
    bin() is 64 bits and would otherwise outrank every real size); NULL
    and negative weights also clamp to 0.  ``with_total`` attaches
    ``__total`` (the global weight sum, from the same bounded side — no
    extra corpus pass).
    """
    from pyspark.sql import Window

    sz = F.greatest(F.coalesce(F.col(size_col).cast("long"), F.lit(0)), F.lit(0))
    if weight_col is None:
        wt = F.lit(1).cast("long")
    else:
        wt = F.greatest(
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0)), F.lit(0)
        )
    d2 = (
        df.withColumn("__sz", sz)
        .withColumn("__w", wt)
        .withColumn("__bkt", _size_bucket("__sz"))
    )
    sz_ord = F.col("__sz").desc() if descending else F.col("__sz").asc()
    w = (
        Window.partitionBy("__bkt")
        .orderBy(sz_ord, F.col(id_col).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = d2.withColumn("__rs", F.sum("__w").over(w))
    bkt_ord = F.col("__bkt").desc() if descending else F.col("__bkt").asc()
    # ≤8192 buckets (64 bit lengths × ≤128 top-7-bit refinements) — the
    # cumsum side is bounded by construction; same non-foldable
    # empty-prefix partition trick as global_order to keep WindowExec
    # quiet on the small frame.
    fullbkt = Window.partitionBy(
        F.substring(F.col("__bkt").cast("string"), 0, 0)
    )
    counts = d2.groupBy("__bkt").agg(F.sum("__w").alias("__cnt"))
    offsets = counts.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__cnt").over(
                fullbkt.orderBy(bkt_ord)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    if with_total:
        offsets = offsets.withColumn(
            "__total",
            F.sum("__cnt").over(
                fullbkt.orderBy(bkt_ord).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    keep = ["__bkt", "__offset"] + (["__total"] if with_total else [])
    out = ranked.join(F.broadcast(offsets.select(*keep)), "__bkt")
    run = (F.col("__offset") + F.col("__rs")).cast("long")
    if weight_col is None:
        out = out.withColumn("__grank", (run - 1).cast("long"))
    else:
        out = out.withColumn("__runsum", run)
    return out.drop("__bkt", "__rs", "__offset", "__w")


def balanced_shards(
    df: DataFrame,
    size_col: str,
    *,
    n_shards: int,
    id_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """SIZE-balanced shard assignment: serpentine fold of the size-descending
    global rank into ``n_shards`` — the straggler killer :func:`shard_assign`
    is not.

    Hash sharding balances ROW counts; when per-row cost follows size
    (tokens, bytes, decode time), the hot shard gets the fat tail and every
    epoch waits on it.  Ranking rows by size descending and dealing them
    boustrophedon (0,1,…,k-1,k-1,…,1,0 — the classic LPT/serpentine
    schedule) bounds the shard-sum spread by ONE row's size per fold pair,
    instead of the O(√n·σ) drift of plain round-robin on sorted input.
    The global rank comes from :func:`_size_rank` (bit-length buckets +
    offsets — no single-reducer window; see its scale notes).

    Output: input columns + ``out_col``.
    """
    ranked = _size_rank(df, size_col, id_col, descending=True)
    pos = F.col("__grank") % (2 * n_shards)
    shard = F.when(pos < n_shards, pos).otherwise(2 * n_shards - 1 - pos)
    return (
        ranked.withColumn(out_col, shard.cast("int"))
        .drop("__sz", "__grank")
    )


def length_bucket_batches(
    df: DataFrame,
    size_col: str,
    *,
    n_buckets: int = 8,
    batch_size: int = 32,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    batch_col: str = "batch",
) -> DataFrame:
    """Length-bucketed batching: equal-frequency size buckets, fixed-size
    batches within each — the padding killer for batched training/inference.

    Batching documents in arbitrary order pads every sequence to its
    batch's max length; with a heavy-tailed length distribution most of
    the compute is padding.  Grouping by length first makes batch-mates
    similar-sized, so the pad-to-max waste collapses (the bucketing trick
    behind dynamic batching in every serious serving/training stack).

    Everything derives from ONE global size rank (:func:`_size_rank` — no
    single-reducer window) by pure integer codegen expressions:
    ``bucket = (rank·k) div N`` (equal-frequency buckets differing by ≤1
    row), ``batch = (rank − bucket_start) div batch_size`` where
    ``bucket_start = (bucket·N + k−1) div k`` — no second window, no
    per-bucket shuffle.  The last batch of each bucket may run short;
    callers that need exactly-full batches drop ``batch`` ==
    ``bucket_rows div batch_size``.

    Output: input columns + ``bucket_col`` (int) + ``batch_col`` (long).
    """
    k = n_buckets
    ranked = _size_rank(df, size_col, id_col, descending=False, with_total=True)
    bucket = F.expr(f"CAST((__grank * {k}) div __total AS INT)")
    with_b = ranked.withColumn(bucket_col, bucket)
    batch = F.expr(
        f"(__grank - (({bucket_col} * __total + {k - 1}) div {k}))"
        f" div {batch_size}"
    )
    return (
        with_b.withColumn(batch_col, batch.cast("long"))
        .drop("__sz", "__grank", "__total")
    )


def global_order(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "order",
    prefix_len: int = 2,
) -> DataFrame:
    """Total deterministic global position (0-based) WITHOUT a global sort.

    ``global_pos`` equals the row's rank under ``ORDER BY md5(id|salt), id``
    — the epoch-stable "global shuffle" order a resumable dataloader needs
    absolute offsets for — but is computed scale-safely in three steps:

    1. shard = the first ``prefix_len`` hex chars of the md5 (a PREFIX, so
       shard order is consistent with full-hash order — unlike a mod bucket);
    2. rank within shard via a partitioned window (the only corpus exchange);
    3. shard offsets from a 16^prefix_len-row count table (cumulative-summed
       on the driver-sized side and broadcast back).

    The default 256 shards keep each window partition ~1/256 of the corpus;
    raise ``prefix_len`` to 3 (4096 shards) beyond ~10¹⁰ rows.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    sharded = df.withColumn("__h", h).withColumn(
        "__shard", F.substring("__h", 1, prefix_len)
    )
    w = Window.partitionBy("__shard").orderBy("__h", F.col(id_col))
    ranked = sharded.withColumn("__rk", F.row_number().over(w))
    # The offsets cumsum runs over the 16^prefix_len-row shard-count table
    # (256 rows at the default) — bounded by construction, so one partition
    # is CORRECT here, not a scale hazard.  The partition key is a
    # non-foldable empty prefix of __shard: it hashes every row to the same
    # partition (same execution as an unpartitioned window) while keeping
    # partitionSpec non-empty, so WindowExec does not emit its "No Partition
    # Defined ... serious performance degradation" warning for a 256-row
    # frame on every global_order / negative_sample / entity-id-minting run
    # (a plain lit() gets constant-folded away and the warning returns).
    offsets = (
        sharded.groupBy("__shard")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.partitionBy(F.substring(F.col("__shard"), 0, 0))
                    .orderBy("__shard")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__shard", "__offset")
    )
    return (
        ranked.join(F.broadcast(offsets), "__shard")
        .withColumn("global_pos", (F.col("__offset") + F.col("__rk") - 1).cast("long"))
        .drop("__h", "__shard", "__rk", "__offset")
    )


def weighted_sample(
    df: DataFrame,
    group_col: str,
    *,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wrs",
    key_round: int = 6,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, at most ``k`` rows per group,
    inclusion probability proportional to ``weight_col`` (Efraimidis &
    Spirakis 2006): each row draws a deterministic uniform u from the md5
    of its id and keeps key ``ln(u) / w``; the k largest keys per group
    are exactly a weighted sample without replacement.

    RNG-free and order-independent like :func:`per_key_sample` — the md5
    tag IS the randomness, so the sample reproduces across runs, row
    orders, partition counts, and engines.  Keys are ROUNDED to
    ``key_round`` decimals before ranking (ties break by id): natural log
    is correctly-rounded-ulp territory where JVM and C runtimes may
    disagree, and ranking on the rounded key is what keeps the selection
    engine-exact.  Rows with NULL/non-positive weight or NULL id are
    excluded (a zero-weight row must never be sampled).

    Scale shape: pure expression + one shuffle on ``group_col`` with the
    WindowGroupLimit top-k heap — same cost as per_key_sample.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    # u in (0, 1) strictly: (bucket + 1) / (2^32 + 1)
    u = (bucket + 1) / F.lit(float(2**32 + 1))
    # + 0.0 merges IEEE -0.0 into 0.0 (a huge weight rounds the key to
    # zero from below; the two zeros render differently across engines —
    # the table_profile canonical-value discipline)
    key = (
        F.round(F.log(u) / F.col(weight_col).cast("double"), key_round)
        + F.lit(0.0)
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__wk").desc(), F.col(id_col)
    )
    return (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .withColumn("__wk", key)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
        .withColumnRenamed("__wk", "sample_key")
    )


def negative_sample(
    anchors: DataFrame,
    corpus: DataFrame,
    *,
    k: int,
    n_probes: int | None = None,
    anchor_id: str = "vec_id",
    anchor_label: str = "label",
    corpus_id: str = "vec_id",
    corpus_label: str = "label",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic pseudo-random negatives for contrastive training: for
    each anchor, up to ``k`` corpus rows with a DIFFERENT label, drawn
    "randomly" but RNG-free — probe ``j``'s target is
    ``md5(anchor|j|salt) mod N`` over the corpus's deterministic global
    positions (:func:`global_order`), so every epoch, engine, and restart
    draws the same negatives.

    Probes that land on the anchor itself, on a same-label row (null-safe:
    a NULL corpus label never equals anything, so unlabeled rows are valid
    negatives), or on an already-drawn negative are skipped; losses are
    absorbed by overprobing (``n_probes`` defaults to 3k) and survivors
    keep probe order, so ``neg_rank`` is stable.  Returns (anchor id,
    neg_rank, negative id, negative label).

    Scale shape: anchors × n_probes rows equi-join the position index —
    linear in anchors, never anchors × corpus; the corpus count rides
    along as a broadcast 1-row table.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_probes is None:  # `or` would silently resurrect an explicit 0
        n_probes = 3 * k
    if n_probes < k:
        raise ValueError(f"n_probes must be >= k, got {n_probes} < {k}")
    from pyspark.sql import Window

    from engine.extended.dedup import md5_long

    c = corpus.filter(F.col(corpus_id).isNotNull()).select(
        F.col(corpus_id).alias("__cid"), F.col(corpus_label).alias("__cl")
    )
    pos = global_order(c, id_col="__cid", salt=salt + "o").select(
        "__cid", "__cl", F.col("global_pos").alias("__gp")
    )
    cnt = c.agg(F.count(F.lit(1)).alias("__n"))
    probes = (
        anchors.filter(F.col(anchor_id).isNotNull())
        .select(
            F.col(anchor_id).alias("__aid"),
            F.col(anchor_label).alias("__al"),
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            "__aid",
            "__al",
            "__n",
            F.explode(F.sequence(F.lit(0), F.lit(n_probes - 1))).alias("__j"),
        )
        .withColumn(
            "__tp",
            md5_long(
                F.concat(
                    F.col("__aid").cast("string"),
                    F.lit("|"),
                    F.col("__j").cast("string"),
                    F.lit("|" + salt),
                )
            )
            % F.col("__n"),
        )
    )
    cand = (
        probes.join(pos, probes["__tp"] == pos["__gp"])
        .filter(
            (F.col("__cid") != F.col("__aid"))
            & ~F.col("__cl").eqNullSafe(F.col("__al"))
        )
        .select("__aid", "__j", "__cid", "__cl")
    )
    dedup_w = Window.partitionBy("__aid", "__cid").orderBy("__j")
    rank_w = Window.partitionBy("__aid").orderBy("__j")
    return (
        cand.withColumn("__dup", F.row_number().over(dedup_w))
        .filter(F.col("__dup") == 1)
        .withColumn("neg_rank", F.row_number().over(rank_w))
        .filter(F.col("neg_rank") <= k)
        .select(
            F.col("__aid").alias(anchor_id),
            "neg_rank",
            F.col("__cid").alias("neg_id"),
            F.col("__cl").alias("neg_label"),
        )
    )


def stratified_kfold(
    df: DataFrame,
    stratum_col: str,
    *,
    k: int,
    id_col: str = "doc_id",
    out_col: str = "fold",
    salt: str = "fold",
) -> DataFrame:
    """Deterministic stratified k-fold assignment: within each stratum,
    rows rank by their md5 order and fold = rank mod k — every stratum
    splits EXACTLY evenly across folds (±1 row), unlike independent
    hash-mod folds whose per-stratum balance is only ~binomial.  The
    cross-validation / eval-shard splitter that keeps every fold's source
    mixture identical to the corpus's.

    Epoch-stability REQUIRES ``id_col`` to be unique and non-NULL: the
    fold follows the (md5(id), id) order, so duplicate or NULL ids tie
    and the tied rows' fold split becomes partition-order-dependent
    (review catch — the per-stratum BALANCE still holds either way, only
    which tied row lands in which fold floats).  NULL ids hash as the
    empty string (they sort at md5('')'s position, together); NULL strata
    form their own stratum (GROUP BY semantics).  One window shuffle on
    the stratum key.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.coalesce(F.col(id_col).cast("string"), F.lit("")),
                       F.lit("|" + salt)))
    w = Window.partitionBy(stratum_col).orderBy(
        h.asc(), F.col(id_col).asc_nulls_last()
    )
    return df.withColumn(
        out_col, ((F.row_number().over(w) - 1) % k).cast("int")
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    nodes: list[str],
    *,
    out_col: str = "node",
    salt: str = "hrw",
) -> DataFrame:
    """Rendezvous (highest-random-weight) assignment of keys to nodes:
    ``node = argmax over nodes of md5(key | node | salt)`` — the routing
    function whose MINIMAL-DISRUPTION property consistent-hashing rings
    approximate: removing a node reassigns ONLY that node's keys (every
    other key's argmax is unchanged), and adding one steals ~1/(n+1) from
    each.  The shard-router / cache-affinity primitive for incremental
    index maintenance (which executor owns which band bucket / IVF list).

    Pure expression per row (|nodes| hashes + one array_max over
    (hash, node) structs — deterministic tie-break), no shuffle, NULL keys
    get a NULL node.
    """
    if not nodes:
        raise ValueError("nodes must be non-empty")
    from engine.extended.dedup import md5_long

    cells = [
        F.struct(
            md5_long(
                F.concat(
                    F.col(key_col).cast("string"),
                    F.lit(f"|{node}|{salt}"),
                )
            ).alias("h"),
            F.lit(node).alias("n"),
        )
        for node in nodes
    ]
    return df.withColumn(
        out_col,
        F.when(
            F.col(key_col).isNotNull(), F.array_max(F.array(*cells))["n"]
        ),
    )
