"""WebDataset-style tar-shard source for multimodal corpora.

The de-facto layout for image/text training data is tar shards whose members
share a basename per sample (``000123.png`` + ``000123.txt`` +
``000123.json``).  This source reads them with stdlib only:

- ``spark.read.format("binaryFile")`` lists and reads the shard FILES in
  parallel (one task per shard — shard size, typically 100 MB-1 GB, is the
  parallelism unit, exactly how WebDataset is consumed at scale);
- a ``mapInPandas`` seam untars each shard in-executor and emits one row per
  member ``(shard, key, ext, payload)`` — bytes never touch the driver;
- :func:`group_samples` pivots members back into one row per sample with a
  ``map<ext, payload>`` column (the WebDataset sample dict).

At 100 TB: shards are immutable blobs, so the scan parallelizes to the shard
count; member extraction is pure per-shard CPU with no shuffle.
:func:`read_tar_samples` groups members into samples INSIDE the extraction
seam (every member of a sample lives in the same shard by construction) —
zero exchanges end to end; :func:`group_samples` is the shuffle-based
equivalent over an already-materialized member table.  Memory bound: one
shard per task in memory — keep shards at the conventional ≤1 GB.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    MapType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "read_tar_shards",
    "read_tar_samples",
    "group_samples",
    "write_tar_shard",
]

MEMBER_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("key", StringType()),
        StructField("ext", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def read_tar_shards(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per tar member across all shards matching ``path_glob``.

    ``key`` is the member basename without its last extension; ``ext`` the
    extension ('' when the name has none).  Non-file members are skipped.
    """
    shards = spark.read.format("binaryFile").load(path_glob)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        name = m.name
                        key, dot, ext = name.rpartition(".")
                        if not dot:
                            key, ext = name, ""
                        rows.append((path, key, ext, tf.extractfile(m).read()))
            yield pd.DataFrame(rows, columns=["shard", "key", "ext", "payload"])

    return shards.select("path", "content").mapInPandas(extract, schema=MEMBER_SCHEMA)


SAMPLE_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("key", StringType()),
        StructField("parts", MapType(StringType(), BinaryType())),
    ]
)


def read_tar_samples(spark: SparkSession, path_glob: str) -> DataFrame:
    """(shard, key, parts: map<ext, payload>) with ZERO exchanges: every
    member of a sample lives in the same shard file, so grouping happens
    inside the extraction seam (one dict build per shard in-executor) —
    the mapPartitions rewrite :func:`group_samples` trades a shuffle for.
    """
    shards = spark.read.format("binaryFile").load(path_glob)

    def extract_grouped(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                samples: dict[str, dict[str, bytes]] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        key, dot, ext = m.name.rpartition(".")
                        if not dot:
                            key, ext = m.name, ""
                        samples.setdefault(key, {})[ext] = tf.extractfile(m).read()
                rows.extend((path, k, parts) for k, parts in samples.items())
            yield pd.DataFrame(rows, columns=["shard", "key", "parts"])

    return shards.select("path", "content").mapInPandas(
        extract_grouped, schema=SAMPLE_SCHEMA
    )


def group_samples(members: DataFrame) -> DataFrame:
    """(shard, key, parts: map<ext, payload>) — the WebDataset sample dict.

    One shuffle on (shard, key); members of a sample share their shard, so
    the exchange is balanced by shard hash, never by a hot sample.
    """
    return members.groupBy("shard", "key").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("ext"), F.col("payload")))
        ).alias("parts")
    )


def write_tar_shard(rows: list[tuple[str, bytes]], path: str) -> None:
    """Test/fixture helper: write (member_name, payload) tuples as one tar
    shard (driver-side — real pipelines produce shards upstream)."""
    with tarfile.open(path, "w") as tf:
        for name, payload in rows:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
