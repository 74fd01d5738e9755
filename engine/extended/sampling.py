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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_split", "stratified_sample"]


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


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, *, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (seeded, one pass, no group-size
    collection).  Engine-native randomness → rows-only in the harness."""
    return df.sampleBy(strata_col, fractions, seed=seed)
