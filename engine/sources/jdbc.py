"""Incremental JDBC scans + keyed dim lookups (SURVEY §2.1 S1-S3).

The reference pushes three query shapes to its remote engines
(helpers/query_helper.py in /root/reference):

- S1 — active-patron incremental scan: range filter on a mode-dependent
  timestamp, non-null guard, type filter, two left joins, deterministic
  ORDER BY + LIMIT (:5-30,63-72);
- S2 — deleted-patron scan: same pattern, 2-column projection (:32-40);
- S3 — keyed warehouse lookups: ``WHERE key IN (...)`` semi-joins shipped as
  literal lists (:42-60).

Spark-side design: the *scan SQL is still built engine-side* and handed to
the JDBC source as a ``dbtable`` subquery.  This is deliberate, not a
Catalyst workaround: the ORDER BY ts LIMIT n pagination unit must execute on
the remote index to be O(batch) (SURVEY §4 "limit pushdown"), and Spark's
JDBC limit-pushdown cannot guarantee index-ordered pagination.  Everything
*after* the scan is DataFrame-land.  Filters on dim reads use ``.filter``
(Catalyst pushes ``isin``/ranges to JDBC automatically).

These builders are pure string/DataFrame functions — unit-tested without a
database (as the reference tests its query_helper), and wired to a live
``spark.read.jdbc`` by :func:`read_incremental_batch` when a URL is supplied.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "IncrementalScanSpec",
    "build_active_scan_sql",
    "build_deleted_scan_sql",
    "build_keyed_lookup_sql",
    "read_jdbc_query",
    "read_incremental_batch",
    "partitioned_read_options",
]


@dataclass
class IncrementalScanSpec:
    """One pipeline mode's scan contract (helpers/query_helper.py:63-79)."""

    table: str
    ts_col: str
    projection: list[str]
    batch_size: int
    extra_where: list[str] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    order_tail: list[str] = field(default_factory=list)  # dedup tiebreak keys


def _quote_ts(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def build_active_scan_sql(spec: IncrementalScanSpec, start_ts: str, end_ts: str) -> str:
    """S1: half-open incremental page, remote-ordered and limited.

    Mirrors build_active_patrons_query (helpers/query_helper.py:5-30): range +
    non-null guard, joins for address fan-out, ORDER BY ts + tiebreak LIMIT n.
    """
    where = [
        f"{spec.ts_col} >= {_quote_ts(start_ts)}",
        f"{spec.ts_col} < {_quote_ts(end_ts)}",
        f"{spec.ts_col} IS NOT NULL",
        *spec.extra_where,
    ]
    order = ", ".join([spec.ts_col, *spec.order_tail])
    joins = ("\n" + "\n".join(spec.joins)) if spec.joins else ""
    return (
        f"SELECT {', '.join(spec.projection)}\n"
        f"FROM {spec.table}{joins}\n"
        f"WHERE {' AND '.join(where)}\n"
        f"ORDER BY {order}\n"
        f"LIMIT {spec.batch_size}"
    )


def build_deleted_scan_sql(
    table: str, id_col: str, date_col: str, start_date: str, end_date: str, limit: int
) -> str:
    """S2: deleted-record scan (helpers/query_helper.py:32-40)."""
    return (
        f"SELECT {id_col}, {date_col}\n"
        f"FROM {table}\n"
        f"WHERE {date_col} >= {_quote_ts(start_date)}"
        f" AND {date_col} < {_quote_ts(end_date)}"
        f" AND {date_col} IS NOT NULL\n"
        f"ORDER BY {date_col}\n"
        f"LIMIT {limit}"
    )


def build_keyed_lookup_sql(
    table: str, projection: list[str], key_col: str, keys: list[str]
) -> str:
    """S3: IN-list keyed lookup (helpers/query_helper.py:42-60).

    The reference ships the batch's key set as literals so the warehouse scans
    only matching rows (lib/pipeline_controller.py:317-319).  Engine-side this
    exists for parity/tests; live reads should prefer
    ``read_jdbc_query(...).filter(col(key).isin(keys))`` — Catalyst compiles
    the same IN into the JDBC pushdown, without string assembly.
    """
    quoted = ", ".join(_quote_ts(k) for k in keys)
    return (
        f"SELECT {', '.join(projection)}\nFROM {table}\nWHERE {key_col} IN ({quoted})"
    )


def read_jdbc_query(
    spark: SparkSession, url: str, query_sql: str, *, properties: dict | None = None
) -> DataFrame:  # pragma: no cover - needs a live database
    """Run an engine-built SQL as a JDBC subquery scan."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query_sql}) AS scan")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def partitioned_read_options(
    ts_col: str, start_ts: str, end_ts: str, num_partitions: int
) -> dict:
    """Options for a *parallel* JDBC range read (full-table backfills, not the
    ordered incremental page): Spark splits [lower, upper] into
    ``num_partitions`` stride predicates, one connection each — the scale path
    for the initial 100 TB-side load, where a single-cursor read would bottleneck.
    """
    return {
        "partitionColumn": ts_col,
        "lowerBound": start_ts,
        "upperBound": end_ts,
        "numPartitions": str(num_partitions),
        "pushDownPredicate": "true",
        "pushDownLimit": "true",
    }


def read_incremental_batch(
    spark: SparkSession,
    url: str,
    spec: IncrementalScanSpec,
    start_ts: str,
    end_ts: str,
    *,
    properties: dict | None = None,
) -> DataFrame:  # pragma: no cover - needs a live database
    """One S1 micro-batch as a DataFrame (the IncrementalRunner's source)."""
    return read_jdbc_query(
        spark, url, build_active_scan_sql(spec, start_ts, end_ts), properties=properties
    )
