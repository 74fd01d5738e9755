"""Data-quality operators: declarative constraint checking and snapshot
diffing — the regression gates a production feed runs between pipeline
versions (the reference validates ad hoc: row-count guards and null checks
in lib/pipeline_controller.py; these generalize that to one declarative
pass per concern).

Everything is a plain aggregate / join plan:

- :func:`check_constraints` — row-level predicates in ONE codegen scan
  (violation counts per rule, no matter how many rules);
- :func:`check_unique` / :func:`check_foreign_key` — the two rule shapes
  that need their own plan (an aggregate on the key; a broadcast anti-join
  against the dimension);
- :func:`snapshot_diff` — added / removed / changed rows between two
  versions of a table, keyed full-outer join comparing dual-implementable
  row hashes (md5 over a null-sentineled concat, so the diff itself is
  oracle-checkable).

At 100 TB: constraint counts are map-side partials (rule count × tasks
rows cross the wire); uniqueness shuffles once on the key; FK checks
broadcast the dimension; snapshot diff is one co-partitioned join on the
key — bucket both versions on the key and the exchange disappears
(`test_layout`'s co-located join gate applies).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "check_constraints",
    "check_unique",
    "check_foreign_key",
    "row_hash",
    "snapshot_diff",
    "split_leakage_audit",
]

_IDENT_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_ .-]*$")


def _check_ident(name: str, what: str) -> None:
    """Names are interpolated into a generated ``stack(...)`` selectExpr;
    reject anything that could escape its string/backtick quoting."""
    if not _IDENT_RE.match(name):
        raise ValueError(f"{what} {name!r} contains characters unsafe for SQL interpolation")


def check_constraints(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """(rule, n_violations, n_rows) per named predicate; a NULL predicate
    result counts as a violation (unknown is not compliance).  One scan,
    map-side partial aggregation regardless of rule count."""
    if not checks:
        raise ValueError("checks must be non-empty")
    for name in checks:
        _check_ident(name, "rule name")
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{name}")
        for name, cond in checks.items()
    ]
    wide = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack_args = ", ".join(f"'{n}', `__v_{n}`" for n in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (rule, n_violations)",
        "__n AS n_rows",
    ).orderBy("rule")


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """(n_keys, n_dup_keys, n_dup_rows): key-cardinality uniqueness audit.
    One shuffle on the key; the second aggregate folds the key-sized count
    table, never the rows."""
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("__c") > 1).cast("long")).alias("n_dup_keys"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias(
            "n_dup_rows"
        ),
    )


def check_foreign_key(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """(n_orphans, n_null_keys): referential-integrity audit of ``df.col``
    against ``dim.dim_col``.  Broadcast anti-join (dimension-sized right
    side); NULL keys are reported separately, not as orphans (SQL FK
    semantics)."""
    orphans = df.filter(F.col(col).isNotNull()).join(
        F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
        col,
        "left_anti",
    )
    n_orphans = orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    n_nulls = df.agg(
        F.sum(F.col(col).isNull().cast("long")).alias("n_null_keys")
    )
    return n_orphans.crossJoin(n_nulls)


#: sentinel for NULL inside the row hash — cannot collide with any md5 hex
#: digest (wrong length, non-hex chars).
_NULL_SENTINEL = "<null>"


def row_hash(cols: list[str]) -> Column:
    """Dual-implementable row fingerprint: md5 over the concatenation of
    PER-COLUMN md5 digests (NULL → a non-hex sentinel).  Hashing each
    column first makes every segment fixed-width, so no delimiter-injection
    collision exists: values containing separators can never realign across
    column boundaries (plain ``concat_ws('|', ...)`` would hash
    ``('x|y','z')`` and ``('x','y|z')`` identically).  DuckDB twin:
    ``MD5(CONCAT(COALESCE(MD5(CAST(c AS VARCHAR)), '<null>'), ...))``."""
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit(_NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat(*parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """(keys…, change) with change ∈ added | removed | changed: the
    regression diff between two versions of a table.  Unchanged rows are
    dropped BEFORE anything leaves the join, so the result is
    delta-sized.  One key-partitioned full-outer join; bucketing both
    snapshots on the key makes it exchange-free."""
    oh = old.select(*key_cols, row_hash(compare_cols).alias("__oh"))
    nh = new.select(*key_cols, row_hash(compare_cols).alias("__nh"))
    joined = oh.join(nh, key_cols, "full_outer")
    change = (
        F.when(F.col("__oh").isNull(), F.lit("added"))
        .when(F.col("__nh").isNull(), F.lit("removed"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def split_leakage_audit(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: dict[str, float] | None = None,
) -> DataFrame:
    """Cross-split contamination audit for a train/val/test assignment:
    counts normalized-text fingerprints that appear in more than one
    split (an eval document with a training twin invalidates the eval —
    the leakage check every LLM data pipeline must run before shipping a
    split).

    Uses :func:`engine.extended.sampling.hash_split` for the assignment
    and :func:`engine.extended.text.fingerprint` for identity, so the
    audit measures exactly what the engine's own split + dedup operators
    ship.  Returns one row per ordered split pair ``(split_a < split_b,
    n_shared)`` — pairs with no leakage are absent.

    Scale shape: one distinct over (fingerprint, split) — the fingerprint
    shuffle exact dedup already pays — then pair generation INSIDE the
    per-fingerprint split set (bounded by the number of splits, never by
    corpus size) and a splits²-cardinality aggregate.
    """
    from engine.extended.sampling import hash_split
    from engine.extended.text import fingerprint

    labeled = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        fingerprint(text_col).alias("fp"),
        hash_split(F.col(id_col), splits=splits).alias("split"),
    )
    per_fp = (
        labeled.distinct()
        .groupBy("fp")
        .agg(F.array_sort(F.collect_set("split")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    from engine.ops.relational import ordered_pairs

    pairs = per_fp.select(
        F.explode(
            ordered_pairs(F.col("ss"), "split_a", "split_b")
        ).alias("p")
    )
    return (
        pairs.select(F.col("p.split_a").alias("split_a"),
                     F.col("p.split_b").alias("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
