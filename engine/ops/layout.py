"""Data-layout optimization: Z-order (Morton) clustering keys and the
range-partitioned sorted write that turns them into skippable files.

At 100 TB the scan cost of a multi-dimensional filter is decided by LAYOUT,
not by the reader: parquet min/max stats prune a file only if rows inside
it are clustered on the filtered columns.  A lexicographic sort clusters
the FIRST column only; interleaving the bits of several columns (the
Z-order / Morton curve) keeps every dimension's value range tight within
each file, so ``WHERE a BETWEEN ... AND b BETWEEN ...`` prunes on all of
them.  This is the same mechanism behind Delta Lake's OPTIMIZE ZORDER BY —
reimplemented here as a plain expression + ``repartitionByRange`` write,
no table format required.

The key expression is pure integer bit-math (shift / mask / add over
disjoint bits), fully inside whole-stage codegen and exactly expressible
in ANSI SQL — the query twin verifies the curve bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key_expr", "zorder_key_sql", "zorder_write"]


def zorder_key_expr(cols: list[Column | str], *, bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of each column:
    bit ``j`` of column ``k`` lands at position ``j * len(cols) + k``.

    Inputs are wrapped into ``[0, 2**bits)`` with ``pmod`` (negative-safe);
    callers mapping continuous domains should pre-bucket (e.g. days since
    epoch, price cents >> 8) so nearby values share high bits.  With the
    default 16 bits and 2-4 columns the key fits a long with room to spare.
    ``bits * len(cols)`` must stay ≤ 63.
    """
    d = len(cols)
    if bits * d > 63:
        raise ValueError(f"bits*cols = {bits * d} exceeds signed-64 range")
    key = F.lit(0).cast("long")
    for k, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        masked = F.pmod(cc, F.lit(1 << bits))
        for j in range(bits):
            bit = F.shiftright(masked, j).bitwiseAND(F.lit(1))
            key = key + bit * F.lit(1 << (j * d + k))
    return key


def zorder_key_sql(cols: list[str], *, bits: int = 16) -> str:
    """ANSI-SQL twin of :func:`zorder_key_expr` (same bit placement; ``%``
    on the same nonnegative inputs matches ``pmod``)."""
    d = len(cols)
    terms = []
    for k, c in enumerate(cols):
        for j in range(bits):
            terms.append(
                f"((({c} % {1 << bits}) >> {j}) & 1) * {1 << (j * d + k)}"
            )
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    range-partition on the key (file boundaries = contiguous curve
    segments, balanced by sampling) and sort within each partition so
    row-group min/max stats are tight on every interleaved column.  The
    only exchange is the range partitioner itself."""
    keyed = df.withColumn("__zkey", zorder_key_expr(list(cols), bits=bits))
    parted = (
        keyed.repartitionByRange(n_files, "__zkey")
        if n_files
        else keyed.repartitionByRange("__zkey")
    )
    parted.sortWithinPartitions("__zkey").drop("__zkey").write.mode(
        "overwrite"
    ).parquet(path)
