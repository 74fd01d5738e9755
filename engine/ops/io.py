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

__all__ = ["write_partitioned", "write_bucketed", "read_table"]


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
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.

    Joins/aggregations on ``bucket_col`` between tables bucketed with the
    same (col, n) read co-located buckets and skip the exchange entirely —
    verified by the no-Exchange plan gate in tests/test_layout.py.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
