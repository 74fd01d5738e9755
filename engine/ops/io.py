"""Storage-layout operators: partitioned + bucketed writes (100 TB layout).

At cluster scale the cheapest shuffle is the one the table layout already
paid for:

- :func:`write_partitioned` — directory partitioning on a low-cardinality
  column: predicate on that column → partition pruning (zero I/O on
  non-matching partitions).  This is how the IVF index (ivf_list) and
  date-sliced fact tables should be laid out.
- :func:`write_bucketed` — hash-bucketed (+ sorted) table: two tables
  bucketed the same way join with NO exchange on either side — the
  co-located join.  Requires a saveAsTable (bucket metadata lives in the
  catalog); local tests use the ephemeral spark-warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_partitioned",
    "write_bucketed",
    "write_bucketed_cached",
    "path_fingerprint",
    "read_table",
    "zorder_key",
    "zorder_key_sql",
    "with_hilbert_key",
    "hilbert_key_sql",
    "cluster_by_zorder",
    "zorder_write",
    "compact_small_files",
]


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], *, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    *,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.

    Joins/aggregations on ``bucket_col`` between tables bucketed with the
    same (col, n) read co-located buckets and skip the exchange entirely —
    verified by the no-Exchange plan gate in tests/test_layout.py.

    ``path`` makes the table EXTERNAL at that location (r9): the data then
    outlives the session-scoped derby catalog, and a caller that records
    (schema, bucket spec, location) can re-register the table in a fresh
    session — the restart contract the streaming matview maintainer needs
    (review catch r9: managed snapshot tables were unrecoverable across
    sessions).

    A managed table's location can survive its metastore entry (the local
    derby catalog is per-session while spark-warehouse/ persists), and
    ``saveAsTable`` refuses to adopt an orphaned location
    (LOCATION_ALREADY_EXISTS) even in overwrite mode — so drop the catalog
    entry AND clear a stale location before writing.
    """
    spark = df.sparkSession
    if mode == "overwrite" and path is not None:
        # external mode: DROP leaves the files; clear the location too.
        # Local paths only — shutil cannot clear remote schemes, and a
        # silently-skipped cleanup would hit the LOCATION_ALREADY_EXISTS
        # refusal on the next overwrite (second review r9)
        import os as _os
        import shutil
        from urllib.parse import urlparse

        u = urlparse(path)
        if u.scheme not in ("", "file"):
            raise ValueError(
                f"write_bucketed(path={path!r}): external-mode overwrite"
                " cleanup supports local/file: paths only"
            )
        local = u.path or path
        # refuse to clear anything that looks like a snapshot ROOT or a
        # database dir rather than one table's leaf location — the same
        # can't-take-out-the-world guard the managed branch applies
        if _os.path.isdir(local):
            entries = _os.listdir(local)
            if any(
                e == "_CURRENT"
                or e.endswith(".db")
                or e.endswith(".tablemeta.json")
                for e in entries
            ):
                raise ValueError(
                    f"write_bucketed(path={local!r}): refusing to clear a"
                    " directory that looks like a snapshot root or"
                    " database dir, not a single table location"
                )
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(local, ignore_errors=True)
    elif mode == "overwrite":
        # DROP removes a managed table's files when the catalog knows it;
        # the rmtree handles the orphan case (location without an entry).
        # Managed locations: default db -> <wh>/<t>, other -> <wh>/<db>.db/<t>
        # (review catch: the first cut used <wh>/<db>.<t> for qualified
        # names, missing the orphan it was meant to clear).
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        import os
        import shutil
        from urllib.parse import urlparse

        parts = table.lower().split(".")
        if len(parts) > 1 and parts[0] == "spark_catalog":
            parts = parts[1:]
        # an unqualified name lives in the session's CURRENT database, not
        # necessarily 'default' — assuming default here deleted the files
        # of an unrelated default-db table whenever the caller had switched
        # databases (advice-review catch: silent data loss on a healthy
        # table whose catalog entry survived the rmtree)
        if len(parts) == 1:
            parts = [spark.catalog.currentDatabase().lower(), parts[0]]
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        if parts[0] == "default":
            loc = f"{wh}/{parts[-1]}"
        else:
            loc = f"{wh}/{parts[-2]}.db/{parts[-1]}"
        # only clear a TRUE orphan: the DROP above removed any catalog
        # entry, so a table that still exists means the drop was blocked —
        # leave its files alone.  And only if the directory actually looks
        # like a table location (data/marker files, no nested *.db catalog
        # dirs), so a mis-resolved path can never take out a database dir.
        if (
            os.path.isdir(loc)
            and not spark.catalog.tableExists(table)
            and all(
                not (os.path.isdir(os.path.join(loc, e)) and e.endswith(".db"))
                for e in os.listdir(loc)
            )
        ):
            shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


#: session-scoped layout cache: table name -> the content fingerprint its
#: current bucketed materialization was written from.  Process-local by
#: design — the local derby catalog is per-session too, so a new session
#: starts cold and the first write repopulates both.
_BUCKETED_FP: dict[str, str] = {}


def path_fingerprint(*paths: str) -> str:
    """Cheap content fingerprint of parquet files/directories: (name, size,
    mtime_ns) of every file at or under each path, hashed.  No Spark job —
    pure driver-side stat walk, so cache probes cost microseconds.
    Regenerating a pack in place (new mtimes) or pointing at different data
    changes the fingerprint and invalidates any layout keyed on it.

    A path that exists as neither a file nor a directory RAISES: silently
    hashing the empty walk would give every missing/typo'd input the same
    constant digest, and fed to :func:`write_bucketed_cached` that constant
    produces a permanent stale cache hit — the exact failure mode the
    empty-string bypass exists to prevent (advice-review catch)."""
    import hashlib
    import os

    h = hashlib.md5()
    for p in paths:
        if os.path.isfile(p):
            st = os.stat(p)
            h.update(f"{p}|{st.st_size}|{st.st_mtime_ns};".encode())
            continue
        if not os.path.isdir(p):
            raise FileNotFoundError(
                f"path_fingerprint: {p!r} is neither a file nor an existing"
                " directory — refusing to hash an empty walk (it would alias"
                " every missing path to one constant fingerprint)"
            )
        for root, dirs, files in sorted(os.walk(p)):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                h.update(f"{root}/{f}|{st.st_size}|{st.st_mtime_ns};".encode())
    return h.hexdigest()


def write_bucketed_cached(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    *,
    sort_col: str | None = None,
    fingerprint: str = "",
) -> bool:
    """:func:`write_bucketed`, skipped when this session already wrote
    ``table`` from data with the same ``fingerprint`` (see
    :func:`path_fingerprint`) and the catalog still holds it.

    Returns True when a write happened, False on a cache hit.  This is the
    session-scoped answer to a registry/demo caller invoking a bucketed
    join repeatedly: the layout is paid once per (table, data-version), not
    per call — exactly how a production deployment would treat a bucketed
    table as durable infrastructure rather than a per-query artifact.

    An EMPTY fingerprint bypasses the cache entirely (always writes): a
    caller that omits it has declared no data-version identity, and
    matching ""=="" would serve the first write's data forever — a
    permanent stale hit (review catch).
    """
    spark = df.sparkSession
    if (
        fingerprint
        and _BUCKETED_FP.get(table) == fingerprint
        and spark.catalog.tableExists(table)
    ):
        return False
    write_bucketed(df, table, bucket_col, n_buckets, sort_col=sort_col)
    if fingerprint:
        _BUCKETED_FP[table] = fingerprint
    return True


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def zorder_key(cols, *, bits: int = 16):
    """Morton (Z-order) interleaving of ``len(cols)`` non-negative integer
    columns into one clustering key.

    Sorting/range-partitioning a table by this key before writing gives
    every file a bounded min/max span on EVERY input column simultaneously —
    multi-column data skipping from single-column file statistics, the
    standard lakehouse clustering trick (a single-column sort leaves the
    other columns' per-file spans at full width, so predicates on them prune
    nothing).  Callers pre-scale values into ``[0, 2**bits)`` (e.g.
    ``pmod(hash, lit(65536))`` or an epoch-day offset).

    Pure integer bit expression → whole-stage codegen, no shuffle of its
    own, and exactly reproducible in any engine with shift/and/or (the
    DuckDB oracle runs the identical formula).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds signed-64 range")
    acc = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            src = (F.col(c) if isinstance(c, str) else c).cast("long")
            bit = F.shiftright(src, b).bitwiseAND(F.lit(1))
            acc = acc.bitwiseOR(F.shiftleft(bit, b * n + i))
    return acc


def zorder_key_sql(cols: list[str], *, bits: int = 16) -> str:
    """ANSI-SQL twin of :func:`zorder_key` (same bit placement; disjoint
    bits let ``+`` stand in for ``|``).  ``cols`` are column expressions
    already scaled into ``[0, 2**bits)``, same contract as the Spark side."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds signed-64 range")
    terms = [
        f"((({c}) >> {b}) & 1) * {1 << (b * n + i)}"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame, cols: list[str], *, bits: int = 16, n_files: int = 32
) -> DataFrame:
    """Range-partition by the Z-order key into ``n_files`` write groups and
    sort within each — the write-side layout pass.  One range exchange
    (sampled boundaries), then each task writes one locality-clustered
    file."""
    keyed = df.withColumn("__z", zorder_key(cols, bits=bits))
    return (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """:func:`cluster_by_zorder` + parquet write: per-file key ranges are
    disjoint curve segments (range partitioning), so row-group min/max
    stats stay tight on EVERY interleaved column — multi-dimensional file
    pruning without a table format (the mechanism behind Delta's OPTIMIZE
    ZORDER BY, as a plain expression + write)."""
    cluster_by_zorder(df, cols, bits=bits, n_files=n_files).write.mode(
        mode
    ).parquet(path)


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files.

    The operational op every streaming/incremental pipeline needs: each
    micro-batch appends a few small files, and a month later the table has
    10^6 of them — every scan then pays 10^6 opens and the driver pays a
    10^6-entry listing.  Compaction restores the ~128 MB file size the
    scan planner wants (one task per file, full read-ahead).

    ``sort_cols`` optionally re-sorts within the rewrite (repartition +
    sortWithinPartitions) so compaction can simultaneously restore a
    clustering (e.g. the Z-order key) that appends destroyed.  Returns
    {files_before, bytes_total, files_after} for the caller's audit log.

    Writes to ``dst_path`` (swap-after-verify is the caller's move — an
    in-place rewrite that fails mid-way would destroy the table).
    """
    if target_file_bytes < 1:
        raise ValueError(f"target_file_bytes must be >= 1, got {target_file_bytes}")
    import math

    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(src_path)
        .select("length")
        .collect()
    )
    files_before = len(files)
    bytes_total = sum(r["length"] for r in files)
    n_out = max(1, math.ceil(bytes_total / target_file_bytes))
    # recursive on BOTH passes: the listing counts nested per-batch
    # subdirectories, so the read must see them too (a plain read throws
    # on nested-only layouts and silently skips nested files in mixed ones)
    df = spark.read.option("recursiveFileLookup", "true").parquet(src_path)
    if sort_cols:
        out = df.repartition(n_out).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_path)
    files_after = len(
        spark.read.format("binaryFile")
        .load(dst_path + "/*.parquet")
        .select("length")
        .collect()
    )
    return {
        "files_before": files_before,
        "bytes_total": bytes_total,
        "files_after": files_after,
    }


def with_hilbert_key(df: DataFrame, x_col, y_col, *, bits: int = 8, out_col: str = "hkey") -> DataFrame:
    """Attach the Hilbert-curve distance of a 2-D point — the
    locality-clustering key whose neighborhoods beat Morton's (Z-order has
    long diagonal jumps; Hilbert is a continuous curve, so consecutive key
    ranges are compact squares and range scans touch fewer files).

    The classic xy→d loop (one step per bit, rotate-and-reflect each
    quadrant) unrolled into BRANCHLESS integer arithmetic — the rotation's
    if/swap becomes arithmetic selects (``ry·x + (1−ry)(rx·(s−1−y) +
    (1−rx)·y)``), so NULL inputs propagate to a NULL key through plain
    arithmetic in every engine (a CASE-based unroll would hit
    engine-specific NULL-branch semantics).  Callers pre-scale both
    columns into ``[0, 2**bits)``, the :func:`zorder_key` contract.

    Emitted as ONE PROJECTION PER BIT over a DataFrame (not a single
    Column): each step's (hx, hy) feeds the next step FOUR times, so an
    inlined expression tree grows ~4^bits and OOMs Catalyst at 8 bits —
    the per-step aliases keep the plan linear (CollapseProject leaves
    multiply-referenced non-cheap aliases alone), exactly like
    :func:`hilbert_key_sql`'s chained subqueries, which the SAME Python
    loop generates so the two cannot drift independently.
    """
    from pyspark.sql import functions as F

    if 2 * bits > 62:
        raise ValueError(f"2*bits = {2 * bits} exceeds signed-64 range")
    if {"__hx", "__hy", out_col} & set(df.columns):
        raise ValueError(f"df must not already carry __hx/__hy/{out_col}")
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("long")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("long")
    cur = df.select(
        "*", x.alias("__hx"), y.alias("__hy"),
        F.lit(0).cast("long").alias(out_col),
    )
    base_cols = df.columns
    one = F.lit(1).cast("long")
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        hx, hy, hd = F.col("__hx"), F.col("__hy"), F.col(out_col)
        rx = F.shiftright(hx, k).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, k).bitwiseAND(F.lit(1))
        cur = cur.select(
            *base_cols,
            (ry * hx + (one - ry) * (rx * (F.lit(s - 1) - hy) + (one - rx) * hy)).alias("__hx"),
            (ry * hy + (one - ry) * (rx * (F.lit(s - 1) - hx) + (one - rx) * hx)).alias("__hy"),
            (hd + F.lit(s * s) * ((F.lit(3) * rx).bitwiseXOR(ry))).alias(out_col),
        )
    return cur.drop("__hx", "__hy")


def hilbert_key_sql(
    x_expr: str,
    y_expr: str,
    *,
    bits: int = 8,
    from_sql: str,
    keep_cols: list[str],
    out_col: str = "hkey",
) -> str:
    """ANSI-SQL twin of :func:`hilbert_key`: the same unrolled iterations
    emitted as a CHAIN of nested subqueries, one per bit, each carrying
    (hx, hy, hd) forward as columns — linear in ``bits`` (a pure textual
    substitution of x/y grows ~4^bits and hits 38 MB at 8 bits).  Returns
    a full SELECT producing ``keep_cols`` + ``out_col`` from ``from_sql``.
    One Python loop produces both engines' arithmetic, so they cannot
    drift independently."""
    if 2 * bits > 62:
        raise ValueError(f"2*bits = {2 * bits} exceeds signed-64 range")
    keep = ", ".join(keep_cols)
    inner = (
        f"SELECT {keep}, CAST(({x_expr}) AS BIGINT) AS hx,"
        f" CAST(({y_expr}) AS BIGINT) AS hy,"
        f" CAST(0 AS BIGINT) AS hd FROM {from_sql}"
    )
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        with_bits = (
            f"SELECT {keep}, hx, hy, hd, ((hx >> {k}) & 1) AS rx,"
            f" ((hy >> {k}) & 1) AS ry FROM ({inner})"
        )
        inner = (
            f"SELECT {keep},"
            f" (ry * hx + (1 - ry) * (rx * ({s - 1} - hy)"
            f" + (1 - rx) * hy)) AS hx,"
            f" (ry * hy + (1 - ry) * (rx * ({s - 1} - hx)"
            f" + (1 - rx) * hx)) AS hy,"
            f" hd + {s * s} * xor(3 * rx, ry) AS hd"
            f" FROM ({with_bits})"
        )
    return f"SELECT {keep}, hd AS {out_col} FROM ({inner})"
