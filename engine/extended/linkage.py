"""Entity resolution / record linkage: blocked fuzzy matching between two
record sets — the dedup-across-sources step of a data-integration or
training-data pipeline (matching noisy crawl metadata to a canonical
catalog, merging user records across systems).

Spark-first shape: candidate generation is MULTI-PASS BLOCKING (equi-joins
on cheap derived keys — never an all-pairs similarity join), verification
is the JVM's built-in ``levenshtein`` with an early-exit threshold, and
best-match selection is one window pass.  Every stage is an equi-join or a
keyed window, so the operator is shuffle-partitioned end to end and
oracle-checkable in ANSI SQL.

Blocking recall: a prefix block misses edits inside the prefix; a suffix
block misses edits inside the suffix.  An edit (insert/delete/substitute)
at position p damages at most one of the two keys, so the UNION of both
passes catches every single-edit pair whose string is longer than
``block_len`` — and multi-edit pairs degrade gracefully (the classic
multi-pass blocking trade; add passes for higher recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["blocked_levenshtein_match"]


def blocked_levenshtein_match(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str = "left_id",
    left_text: str = "left_text",
    right_id: str = "right_id",
    right_text: str = "right_text",
    max_dist: int = 2,
    block_len: int = 4,
    block_cap: int = 1000,
) -> DataFrame:
    """Best fuzzy match in ``right`` for every ``left`` row.

    Candidates come from two blocking passes (first ``block_len`` chars,
    last ``block_len`` chars); a pair survives when its edit distance is
    <= ``max_dist`` (computed with Spark's thresholded ``levenshtein``,
    which abandons a pair early once the bound is exceeded — the verify
    step is O(max_dist · len), not O(len^2)); each left row keeps its
    (distance, right_id)-minimal match.  Returns every left row as
    ``(left_id, match_id, dist)`` with NULLs for unmatched rows.

    ``block_cap`` bounds hot blocks: only the ``block_cap`` lowest-id
    right rows per block key enter the candidate join (the ``bucket_cap``
    discipline from dedup.py — a degenerate key like an all-blank prefix
    would otherwise make one block quadratic at 100 TB).  Overflow rows
    are still matchable through their OTHER blocking key.

    IDs must be non-null and unique per side; left rows with NULL text
    are preserved unmatched (NULL never matches anything — levenshtein
    with a NULL side is NULL in both engines).
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if block_len < 1:
        raise ValueError(f"block_len must be >= 1, got {block_len}")
    if block_cap < 1:
        raise ValueError(f"block_cap must be >= 1, got {block_cap}")

    l_ = left.select(
        F.col(left_id).alias("__lid"), F.col(left_text).alias("__lt")
    )
    r_ = right.select(
        F.col(right_id).alias("__rid"), F.col(right_text).alias("__rt")
    )

    def keyed(df: DataFrame, text: str, out: str) -> DataFrame:
        # left()/right() (not substring with negative start) — both engines
        # return the whole string when it is shorter than block_len, so
        # short strings key identically everywhere
        pre = df.select("*", F.expr(f"left({text}, {block_len})").alias(out))
        suf = df.select("*", F.expr(f"right({text}, {block_len})").alias(out))
        return pre.unionByName(suf)

    lk = keyed(l_, "__lt", "__bk").filter(F.col("__bk").isNotNull())
    rk = keyed(r_, "__rt", "__bk").filter(F.col("__bk").isNotNull())
    cap_w = Window.partitionBy("__bk").orderBy("__rid")
    rk = (
        rk.withColumn("__rn", F.row_number().over(cap_w))
        .filter(F.col("__rn") <= block_cap)
        .drop("__rn")
    )
    cand = (
        lk.join(rk, "__bk")
        .select("__lid", "__lt", "__rid", "__rt")
        .distinct()
    )
    dist = F.levenshtein("__lt", "__rt", max_dist)
    scored = cand.withColumn("__d", dist).filter(F.col("__d") >= 0)
    best_w = Window.partitionBy("__lid").orderBy("__d", "__rid")
    best = (
        scored.withColumn("__rn", F.row_number().over(best_w))
        .filter(F.col("__rn") == 1)
        .select("__lid", "__rid", "__d")
    )
    return l_.join(best, "__lid", "left").select(
        F.col("__lid").alias(left_id),
        F.col("__rid").alias("match_id"),
        F.col("__d").alias("dist"),
    )
