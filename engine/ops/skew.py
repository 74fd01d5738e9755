"""Skew-aware join strategies (100 TB design point; SURVEY §4 physical notes).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
:mod:`engine.session`) handles sort-merge skew at runtime.  These helpers
cover the cases AQE cannot:

- :func:`salted_join` — explicit key salting for a *shuffle hash/sort-merge*
  join where one side has pathological hot keys (the classic null-key or
  power-law fan-in).  The hot side gets a random-but-deterministic salt in
  [0, n); the other side is replicated n× with every salt value; the join key
  becomes (key, salt).  Results are identical to the plain join, but the hot
  key's rows spread over n reducers.
- :func:`null_safe_split_join` — nulls never match in an equi-join but still
  all hash to one reducer; split them out, join only non-null keys, union the
  null rows back (left-join semantics preserved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "null_safe_split_join", "salted_count_distinct"]


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side replicated.

    Deterministic salt (hash of the full row via monotonically-increasing id
    would break determinism; ``pmod(xxhash64(key, uuid-free row hash), n)``
    needs row identity — instead we salt by ``pmod(xxhash64(<all cols>), n)``,
    stable for identical rows and uniform enough to split a hot key).
    Replication cost: ``salts×`` the small side — choose ``salts`` ≈ the skew
    factor, not more.
    """
    skew_salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salts))
    s = skewed.withColumn("__salt", skew_salt)
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = s.join(o, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def null_safe_split_join(
    left: DataFrame, right: DataFrame, key: str
) -> DataFrame:
    """Left join where left-side null keys skip the shuffle entirely.

    Null join keys can be the biggest "hot key" of all (they never match but
    still shuffle to one partition).  Split: non-null rows join normally;
    null-key rows are unioned back with null right-side columns.
    """
    nn = left.filter(F.col(key).isNotNull()).join(right, on=key, how="left")
    right_only_cols = [c for c in nn.columns if c not in left.columns]
    nulls = left.filter(F.col(key).isNull())
    for c in right_only_cols:
        nulls = nulls.withColumn(c, F.lit(None).cast(dict(nn.dtypes)[c]))
    return nn.unionByName(nulls.select(*nn.columns))


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT value) per group with the distinct phase salted.

    Plain ``countDistinct`` shuffles EVERY (group, value) pair to the
    group's reducer before de-duplicating — a hot group (one URL domain with
    10^9 distinct paths) serializes into a single task and spills.  Algebraic
    aggregates don't have this problem (map-side partials compress them);
    DISTINCT does, because partial aggregation must retain every distinct
    value it has seen.

    Salting fixes the reducer, not the semantics: each value hashes to
    exactly one salt bucket (``pmod(xxhash64(value), salts)``), so the
    per-(group, salt) distinct sets are disjoint and their sizes sum to the
    true distinct count.  Phase 1 de-duplicates within (group, salt) across
    ``salts`` reducers per group; phase 2 sums ``salts`` small partial
    counts per group.  Result is exactly ``COUNT(DISTINCT value)`` — NULL
    values excluded from the COUNT but NOT from the grouping: a group whose
    values are all NULL still appears with count 0, exactly like the plain
    aggregate (review catch: a pre-groupBy ``WHERE v IS NOT NULL`` dropped
    such groups entirely).  ``count_distinct`` already ignores NULLs, so no
    row filter is needed; NULL values hash to one constant salt bucket and
    contribute nothing.  The hot group's distinct state spreads over
    ``salts`` tasks — this is also what ``spark.sql.optimizer.
    distinctAggregatorHashPartitioning``-class rewrites do internally; the
    explicit operator makes the shape pinnable by the plan gate and usable
    where the optimizer rewrite doesn't fire.
    """
    v = F.col(value_col)
    salt = F.pmod(F.xxhash64(v), F.lit(salts))
    partial = df.groupBy(*group_cols, salt.alias("__salt")).agg(
        F.count_distinct(v).alias("__partial")
    )
    return partial.groupBy(*group_cols).agg(F.sum("__partial").alias(out_col))
