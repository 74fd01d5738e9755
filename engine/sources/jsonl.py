"""JSONL corpus source — the interchange format LLM training corpora
actually arrive in (one JSON object per line, typically gz-sharded).

Design for scale:

- **schema DECLARED, never inferred**: inference is a full extra pass over
  100 TB and produces run-dependent types; the declared schema also prunes
  columns at the parser level (Jackson skips unprojected fields).
- **corrupt-record quarantine, not job failure**: PERMISSIVE mode routes
  unparseable lines into a corrupt column; :func:`read_jsonl` splits the
  table into (good, quarantine) so one bad shard line cannot kill a crawl
  ingest.  Spark disallows selecting ONLY the corrupt column from a raw
  scan, so the split goes through one cached parse.
- compression/sharding are free: ``.json(path)`` reads ``*.jsonl[.gz/.zst]``
  shards in parallel, one task per split.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

__all__ = ["read_jsonl", "write_jsonl", "JsonlRead", "DOCUMENTS_SCHEMA"]

#: the documents-table shape as a JSONL declaration
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


class JsonlRead(NamedTuple):
    """Result of :func:`read_jsonl`.  ``good``/``quarantine`` are views over
    ONE cached parse; call :meth:`unpersist` once both have been consumed to
    release the executor storage that cache pins (on a 100 TB ingest the
    cached parse is the dominant storage cost of the read)."""

    good: DataFrame
    quarantine: DataFrame
    parsed: DataFrame

    def unpersist(self, blocking: bool = False) -> None:
        self.parsed.unpersist(blocking)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    corrupt_col: str = "_corrupt_record",
) -> JsonlRead:
    """Parse JSONL shards under ``path`` with a declared schema.

    Returns a :class:`JsonlRead` of (good, quarantine, parsed): rows parsing
    cleanly (corrupt column dropped), the raw text of lines that did not,
    and the cached parent parse.  The parse is cached before splitting —
    both halves come from ONE scan, and Spark's "corrupt-column-only query"
    restriction never triggers.  The CALLER owns the cache's lifetime:
    ``result.unpersist()`` after materializing both halves.
    """
    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .cache()
    )
    good = parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = parsed.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return JsonlRead(good, quarantine, parsed)


def write_jsonl(df: DataFrame, path: str, *, compression: str | None = None) -> None:
    """Write a table as JSONL shards (one file per partition — shard count =
    write parallelism; pass e.g. ``compression='gzip'`` for crawl-style
    archives)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
