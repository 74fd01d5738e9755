"""CDC apply + SCD2 merge without a lakehouse format (pyspark guide "CDC /
SCD2: emulate with anti-join + union + window").

The harness image has no Delta/Iceberg jars, and at the reference's scale the
same maintenance operations are expressible — exactly once per key — with
plain DataFrame ops over parquet:

- :func:`apply_changelog` — collapse an insert/update/delete changelog to the
  latest op per key (window), then: deletes drop the key, upserts replace-or-
  insert (anti-join + union).  One shuffle on the key for the window, one for
  the anti-join — both on the same key, so AQE/bucketing can co-locate them.
- :func:`scd2_merge` — type-2 dimension maintenance: rows for changed keys
  are closed (``valid_to`` set) and a new current version appended; history
  rows pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["apply_changelog", "scd2_merge", "scd2_point_in_time", "snapshot_diff"]


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    ts_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D changelog to a snapshot; the latest change per key wins.

    ``changes`` carries (key, *ts_cols, op_col, <same value columns as
    snapshot>).  ``ts_cols`` must be a total order within a key (include a
    tiebreaker).  Returns the post-image snapshot.

    ``op_col`` must be non-NULL: a NULL op behaves as a DELETE (the filter
    ``op != 'D'`` null-drops the row from the upsert set while its key
    still joins the touched anti-join — identical in both engines, r10
    review).  Validate ops upstream if the log can carry NULLs.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in ts_cols])
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    value_cols = [c for c in snapshot.columns if c != key]
    upserts = latest.filter(F.col(op_col) != "D").select(key, *value_cols)
    touched = latest.select(key)
    survivors = snapshot.join(F.broadcast(touched), on=key, how="left_anti")
    return survivors.unionByName(upserts)


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attr_cols: list[str],
    *,
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Type-2 merge: ``dim`` rows are versioned (``valid_from``/``valid_to``,
    null ``valid_to`` = current); ``updates`` carries one new version per key
    (key, *attr_cols, ts_col).

    Current rows of updated keys close at the update timestamp; a new open
    version is appended; closed history and untouched keys pass through.
    Updates that change nothing still produce a new version (idempotence is
    the caller's concern — filter no-op updates upstream if undesired).
    """
    upd = updates.select(
        key, *attr_cols, F.col(ts_col).alias("__new_from")
    )
    current = dim.filter(F.col(valid_to).isNull())
    history = dim.filter(F.col(valid_to).isNotNull())

    joined = current.join(F.broadcast(upd.select(key, "__new_from")), on=key, how="left")
    closed = joined.withColumn(
        valid_to,
        F.when(F.col("__new_from").isNotNull(), F.col("__new_from")).otherwise(
            F.col(valid_to)
        ),
    ).drop("__new_from")

    new_rows = upd.select(
        key,
        *attr_cols,
        F.col("__new_from").alias(valid_from),
        F.lit(None).cast(dict(dim.dtypes)[valid_to]).alias(valid_to),
    )
    out_cols = dim.columns
    return (
        history.select(*out_cols)
        .unionByName(closed.select(*out_cols))
        .unionByName(new_rows.select(*out_cols))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
    op_col: str = "op",
    include_unchanged: bool = False,
) -> DataFrame:
    """DERIVE the changelog between two snapshots of the same table — the
    inverse of :func:`apply_changelog`: given yesterday's and today's full
    extracts, emit per key ``insert`` / ``update`` / ``delete`` (and
    optionally ``unchanged``), with today's values for I/U and yesterday's
    for D.

    This is how CDC is bootstrapped when the source has no log (the
    reference's Sierra polling is exactly this shape: full-ish extracts,
    diff downstream), and how a backfill is reconciled against what the
    incremental path produced.

    Change detection hashes the ``compare_cols`` (default: all non-key
    columns present on BOTH sides) with a LENGTH-PREFIXED canonical
    encoding: each field serializes as ``"<len>:<value>"`` (NULL as the
    unambiguous ``"n"`` — a length prefix is always a digit, so NULL and
    the string ``'NULL'`` can never collide), making the concatenation
    prefix-free — no value can shift a column boundary, so two different
    rows never share a digest by separator injection (review catch: a
    plain tagged concat collapsed ``("a\\x1f\\x01b", "c")`` with
    ``("a", "b\\x1f\\x01c")``).  Column order is fixed by the caller's
    list so the digest is stable across snapshots.  One full-outer join
    on the key; both hash projections are scan-local.  Row identity per
    key is assumed (snapshots, not event logs) — pre-dedup with
    :func:`engine.ops.dedup.keep_first` otherwise.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns
            if c not in key_cols and c in old.columns
        ]

    def canon(c: str):
        s = F.col(c).cast("string")
        return F.when(F.col(c).isNull(), F.lit("n")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    def keyed(df: DataFrame, tag: str) -> DataFrame:
        digest = F.md5(F.concat(*[canon(c) for c in compare_cols]))
        return df.select(
            *[F.col(k).alias(f"__{tag}k_{k}") for k in key_cols],
            digest.alias(f"__{tag}_digest"),
            F.struct(*compare_cols).alias(f"__{tag}_vals"),
        )

    o, n = keyed(old, "o"), keyed(new, "n")
    cond = None
    for k in key_cols:
        eq = o[f"__ok_{k}"].eqNullSafe(n[f"__nk_{k}"])
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    op = (
        F.when(F.col("__o_digest").isNull(), F.lit("insert"))
        .when(F.col("__n_digest").isNull(), F.lit("delete"))
        .when(F.col("__o_digest") != F.col("__n_digest"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    vals = F.when(
        F.col("__n_digest").isNotNull(), F.col("__n_vals")
    ).otherwise(F.col("__o_vals"))
    out = j.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in key_cols
        ],
        op.alias(op_col),
        *[vals[c].alias(c) for c in compare_cols],
    )
    if include_unchanged:
        return out
    return out.where(F.col(op_col) != "unchanged")


def scd2_point_in_time(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (temporal) join: attach to each fact the dimension
    VERSION that was valid at the fact's timestamp — the read side of
    :func:`scd2_merge`, and the join every training-data snapshot over a
    versioned dimension needs (features as-of the event, never leaked from
    the future).

    Validity is the half-open ``[valid_from, valid_to)`` with NULL
    ``valid_to`` = still current, exactly the tiling :func:`scd2_merge`
    writes, so every fact timestamp matches at most one version and a
    version-boundary fact lands in the NEWER version.  A NULL fact
    timestamp matches nothing (kept with NULL attributes under
    ``how='left'``).

    Scale shape: the join carries the KEY equality as its hash/sort-merge
    condition — one shuffle on the key, the validity range applied as the
    join's residual filter — never a nested loop over versions (the
    versions of one key meet that key's facts inside one partition).
    """
    f = facts.alias("__f")
    d = dim.alias("__d")
    fts = F.col(f"__f.{ts_col}")
    cond = (
        (F.col(f"__f.{key}") == F.col(f"__d.{key}"))
        & (fts >= F.col(f"__d.{valid_from}"))
        & (F.col(f"__d.{valid_to}").isNull() | (fts < F.col(f"__d.{valid_to}")))
    )
    return f.join(d, cond, how).drop(F.col(f"__d.{key}"))
