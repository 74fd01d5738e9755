"""Memoization join — ``lookup_or_compute`` (SURVEY §7 step 4; §4 "semantic
cache" row).

The reference's central architectural pattern (lib/pipeline_controller.py:
199-215 in /root/reference): probe a warehouse cache by a derived key (J5),
run the expensive computation (geocoding) ONLY for cache misses, overlay the
computed results back (J7), optionally backfill secondary columns from
another keyed dim (J8).  The engine generalizes it: ``compute_fn`` is any
DataFrame→DataFrame transformation, so the same helper memoizes geocoding,
model inference, or any per-key enrichment.

Scale shape: one broadcast join against the cache slice, compute over the
(hopefully small) miss set only, one broadcast overlay join back.  The cache
side is bounded by the batch's key set — ship keys to the cache store, never
scan the store.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lookup_or_compute"]


def lookup_or_compute(
    df: DataFrame,
    cache: DataFrame,
    key: str,
    value_cols: list[str],
    compute_fn: Callable[[DataFrame], DataFrame],
    *,
    broadcast_overlays: bool | None = True,
) -> DataFrame:
    """Fill ``value_cols`` from ``cache`` by ``key``; compute only misses.

    ``cache`` must carry (key, *value_cols).  ``compute_fn`` receives the
    miss rows (original columns, without the cache values) and must return
    (key, *value_cols) for them.  Returns ``df`` + ``value_cols``, where each
    row's values come from the cache when present, else from the computation.

    Miss detection is an explicit hit marker: the cache slice is projected
    with a ``TRUE AS __hit`` column, and a row is a miss iff ``__hit IS
    NULL`` after the left probe join.  A cache row whose value columns are
    all NULL is therefore a first-class NEGATIVE cache entry ("known
    failed"): it counts as a hit, its NULLs are kept verbatim, and the row
    is NOT recomputed (r10 verdict #3; previously ``value_cols[0] IS
    NULL`` misread such rows as misses and recomputed them every batch).
    ``df`` must not already carry a ``__hit`` column.

    ``broadcast_overlays``: ``True`` (default) hints both the cache slice and
    the computed-miss overlay broadcast — right when the cache probe is
    key-bounded and misses are rare (the reference's operating regime, where
    the miss set is one batch's uncached keys).  ``False`` drops the hints so
    the joins shuffle — required when the miss set can approach corpus scale
    (cold cache over a large backfill), where a forced broadcast of the
    computed overlay would OOM the driver.  ``None`` lets AQE choose per join
    from runtime sizes.
    """

    def maybe_b(d: DataFrame) -> DataFrame:
        if broadcast_overlays is True:
            return F.broadcast(d)
        if broadcast_overlays is False:
            return d.hint("shuffle_hash")
        return d

    assert "__hit" not in df.columns, "df must not carry a __hit column"
    cached = cache.select(
        key,
        F.lit(True).alias("__hit"),
        *[F.col(c).alias(f"__cache_{c}") for c in value_cols],
    )
    probed = df.join(maybe_b(cached), on=key, how="left")

    misses = probed.filter(F.col("__hit").isNull()).select(*df.columns)
    computed = compute_fn(misses).select(
        key, *[F.col(c).alias(f"__new_{c}") for c in value_cols]
    )

    out = probed.join(maybe_b(computed), on=key, how="left")
    for c in value_cols:
        # A hit keeps the cached value VERBATIM (NULL included — negative
        # caching); only genuine misses take the computed overlay.
        out = out.withColumn(
            c,
            F.when(F.col("__hit").isNotNull(), F.col(f"__cache_{c}"))
            .otherwise(F.col(f"__new_{c}")),
        ).drop(f"__cache_{c}", f"__new_{c}")
    return out.drop("__hit")
