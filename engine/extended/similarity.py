"""Similarity search over embedding columns (north-star operator).

Two paths, same answer shape (``vec_id, sim`` top-k):

- :func:`cosine_topk` — brute-force scan: one pass over the vectors, per-row
  dot product against a broadcast query vector, ``TakeOrderedAndProject``
  top-k.  This is the *correctness baseline* and — because it is one
  shuffle-free scan — also the honest fallback at any scale when recall must
  be 1.0.
- :func:`lsh_topk` — random-hyperplane LSH pre-filter: probe only vectors
  whose sign-signature is within ``max_probe_hamming`` of the query's, then
  exact-rank the survivors.  At 100 TB this turns a full scan into a
  partition-pruned fraction at a tunable recall; signatures are computed once
  (:func:`with_signature`) and stored/partitioned-by in the real deployment.

Arithmetic is double-precision with a fixed left-to-right accumulation order
(``aggregate`` over ``zip_with``), so results are bit-stable and match the
DuckDB oracle exactly after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.extended.dedup import _dot, _unit_hyperplanes, cosine

__all__ = ["cosine_topk", "with_signature", "lsh_topk"]


def cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    The query vector is a literal array (broadcast by the plan, no join);
    ordering ties break by id so the result is deterministic.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(cosine(F.col(vec_col), q), round_to)
    return (
        vectors.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def with_signature(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 16,
    planes: int = 16,
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Attach the random-hyperplane sign signature (deterministic planes —
    same family as :func:`engine.extended.dedup.embedding_near_dup`)."""
    hp = _unit_hyperplanes(dim, planes)
    sig = F.aggregate(
        F.array(
            *[
                F.when(_dot(F.col(vec_col), hp[p]) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
                for p in range(planes)
            ]
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v.cast("long")),
    )
    return vectors.withColumn(out_col, sig)


def lsh_topk(
    vectors: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 16,
    planes: int = 16,
    max_probe_hamming: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: rank only vectors whose LSH signature is within
    ``max_probe_hamming`` bits of the query signature.

    The signature filter is a cheap codegen predicate (``bit_count(xor)``),
    so Catalyst evaluates it during the scan — with signatures persisted and
    the table partitioned/bucketed by signature prefix, whole partitions
    prune away.  Recall rises with ``max_probe_hamming`` (→ planes = scan).
    """
    hp = _unit_hyperplanes(dim, planes)
    qsig = 0
    for p in range(planes):
        dot = sum(float(a) * b for a, b in zip(query_vec, hp[p]))
        if dot >= 0:
            qsig |= 1 << p
    sigged = with_signature(vectors, vec_col=vec_col, dim=dim, planes=planes)
    probe = sigged.filter(
        F.bit_count(F.col("lsh_sig").bitwiseXOR(F.lit(qsig))) <= max_probe_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(cosine(F.col(vec_col), q), round_to)
    return (
        probe.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )
