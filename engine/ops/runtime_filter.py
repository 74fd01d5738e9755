"""Runtime semi-join reduction: Bloom-prefilter the big side of a join.

At 100 TB the dominant join cost is shuffling fact rows that CANNOT match —
a selective dimension (say 0.1% of part keys survive a filter) still forces
the full fact table through the exchange before the join drops 99.9% of it.
The classic fix is a runtime filter: collapse the build side's key set into
a small Bloom filter (sized from the key count, bounded by a literal
budget), broadcast it as a literal, and drop non-matching fact rows DURING
THE SCAN, before any shuffle.  Spark's own
optimizer does this opportunistically (``spark.sql.optimizer.runtime.
bloomFilter.enabled``); this operator makes the reduction explicit,
deterministic (md5 hash family — the DuckDB oracle reproduces the exact bit
pattern when needed), and pinnable by a plan gate.

Semantics are EXACT for the downstream join: a Bloom filter has no false
negatives, so every fact row that would join survives the prefilter; false
positives (rate ``(1 - e^(-kn/m))^k``) pass through and are eliminated by
the join itself.  ``bloom_prefilter`` therefore composes with any
equi-join without changing its result — pinned by the oracle-paired
registry query (`bloom_prefilter_join`) whose DuckDB twin is the PLAIN join.

Reference parity: the reference engine probes its memo/dimension stores row
by row over the network (e.g. the keyed Redshift lookups in
lib/redshift_client helpers); a Bloom prefilter is the scan-side analogue
that makes the same "only fetch what can match" decision without a
round-trip per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_prefilter"]


def bloom_prefilter(
    fact: DataFrame,
    build_keys: DataFrame,
    fact_key: str,
    build_key: str | None = None,
    *,
    n_hashes: int = 3,
    m_bits: int | None = None,
    bits_per_key: int = 10,
    max_bits: int = 1 << 20,
    hash_fn: str = "md5",
    keep_nulls: bool = False,
) -> DataFrame:
    """Filter ``fact`` to rows whose ``fact_key`` MAY appear in
    ``build_keys[build_key]`` (no false negatives).

    The build side is aggregated to distinct bit positions — a collect
    bounded by the filter size no matter how many build rows exist — and
    the probe is pure codegen (hash → literal-array bit test): no join, no
    shuffle, no Python on the fact side.  Rows with a NULL key are dropped,
    matching inner-equi-join semantics (NULL never equi-matches).

    Composition contract (advice-review item): the prefilter is
    result-preserving ONLY ahead of an INNER equi-join on the key (or on
    the NON-preserved side of an outer join) — filtering the PRESERVED
    side of an outer join loses its unmatched output rows (Bloom-miss rows
    as well as NULL-key rows), and no flag can make that composition safe.
    ``keep_nulls=True`` retains NULL-key fact rows (in the degraded
    over-budget path too) for callers that route NULL keys separately
    (quarantine-and-union pipelines) instead of relying on the join to
    drop them.

    Sizing: ``m_bits=None`` (default) sizes the filter from the DISTINCT
    build-key count at ``bits_per_key`` (10 → ~1% false positives with 3
    hashes).  A FIXED filter under a growing build side is the classic
    silent failure — at 10× the keys it saturates, FP → 1, and the probe
    degenerates to "hash every fact row, keep everything" (measured: the
    x10 probe went 6× superlinear under a hard-coded 16384 before this).
    If the needed size exceeds ``max_bits`` (a literal-array budget: 2^20
    bits = 16 K longs — beyond that the embedded literal bloats codegen
    and the filter stops being 'small'), the prefilter DEGRADES to the
    NULL-key drop only: semantics are unchanged (callers always follow
    with the exact join) and the plan falls back to the plain join the
    optimizer would have run anyway — the honest behavior when the build
    side is no longer 'small' relative to the filter budget.
    """
    from engine.extended.curation import bloom_bit_words, bloom_member

    build_key = build_key or fact_key
    keys = (
        build_keys.select(F.col(build_key).cast("string").alias("__bf_key"))
        .where(F.col("__bf_key").isNotNull())
        .distinct()
    )
    if m_bits is None:
        n_keys = keys.count()
        need = max(64, 64 * ((n_keys * bits_per_key + 63) // 64))
        if need > max_bits:
            if keep_nulls:
                return fact
            return fact.where(F.col(fact_key).isNotNull())
        m_bits = need
    words = bloom_bit_words(
        keys, key_col="__bf_key", n_hashes=n_hashes, m_bits=m_bits, hash_fn=hash_fn
    )
    probe: Column = bloom_member(
        F.col(fact_key).cast("string"),
        words,
        n_hashes=n_hashes,
        m_bits=m_bits,
        hash_fn=hash_fn,
    )
    # bloom_member yields NULL for NULL keys; the coalesce keeps the
    # predicate three-valued-logic-safe (NULL key -> dropped like the inner
    # join would, or kept when the caller opted out of the drop)
    return fact.where(F.coalesce(probe, F.lit(keep_nulls)))
