"""Write-audit-publish (WAP) for datasets: stage → audit → atomic swap,
with a manifest consumers can re-verify.

The production contract a corpus pipeline needs around every emitted
dataset: downstream training jobs must never see a half-written or
silently-truncated table.  The publish path writes to a staging directory,
audits what actually landed (row count, schema, file inventory with
checksums), writes a ``_manifest.json`` describing it, and atomically
renames staging into place; :func:`verify_dataset` re-derives the same
facts from the live table and raises on ANY drift — the check a consumer
runs before training on the data.

Local-filesystem rename is atomic; object stores swap via their
committer/metadata layer instead — the staging/manifest/verify protocol is
the part that transfers.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["publish_dataset", "verify_dataset", "read_manifest", "PublishError"]

MANIFEST = "_manifest.json"


class PublishError(RuntimeError):
    """Audit or verification failure — the dataset must not be consumed."""


def _md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _file_inventory(path: str, *, checksums: bool) -> list[dict]:
    """EVERY visible file (not just parquet — a stray junk file must show
    up as drift, not crash the later parquet read with an opaque error;
    review finding).  Names starting with '_' or '.' are Spark/Hadoop
    metadata (e.g. _SUCCESS, the manifest itself) and excluded on both
    the publish and verify sides."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            entry = {"path": os.path.relpath(p, path), "bytes": os.path.getsize(p)}
            if checksums:
                entry["md5"] = _md5_file(p)
            out.append(entry)
    return sorted(out, key=lambda d: d["path"])


def _schema_drift(a, b) -> bool:
    """Name/type comparison, IGNORING nullability: the parquet round-trip
    legitimately relaxes non-null input fields to nullable."""
    strip = lambda sch: [(f.name, f.dataType) for f in sch.fields]  # noqa: E731
    return strip(a) != strip(b)


def publish_dataset(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str] | None = None,
    checksums: bool = True,
) -> dict:
    """Stage, audit, and atomically publish ``df`` as parquet at ``path``.

    The audit RE-READS the staged files (never trusts the writing job's
    view): row count and schema come from the staged parquet, the file
    inventory — with per-file md5 when ``checksums`` (default; disable for
    very large tables where the extra read pass costs more than the
    tamper-detection is worth) — from the filesystem.  Fails, cleaning up
    staging and leaving the target untouched, if the target already
    exists, the write dies mid-job, or the staged schema's names/types
    disagree with the input's (partition columns excepted: partitioning
    reorders them to the end).  Returns the manifest dict.
    """
    if os.path.exists(path):
        raise PublishError(f"target already exists: {path}")
    spark = df.sparkSession
    staging = f"{path}.__staging-{uuid.uuid4().hex}"
    try:
        writer = df.write.mode("errorifexists")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(staging)
        staged = spark.read.parquet(staging)
        if not partition_cols and _schema_drift(staged.schema, df.schema):
            raise PublishError(
                f"staged schema drifted from input: {staged.schema.simpleString()} "
                f"vs {df.schema.simpleString()}"
            )
        n_rows = staged.count()
        manifest = {
            "n_rows": n_rows,
            "schema": staged.schema.json(),
            "partition_cols": partition_cols or [],
            "files": _file_inventory(staging, checksums=checksums),
        }
        with open(os.path.join(staging, MANIFEST), "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        os.rename(staging, path)  # atomic on a local filesystem
        return manifest
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise


def read_manifest(path: str) -> dict:
    mp = os.path.join(path, MANIFEST)
    if not os.path.exists(mp):
        raise PublishError(f"no {MANIFEST} at {path} — not a published dataset")
    with open(mp, encoding="utf-8") as fh:
        return json.load(fh)


def verify_dataset(spark: SparkSession, path: str) -> dict:
    """Re-derive the manifest's facts from the live table and raise
    :class:`PublishError` naming every discrepancy: missing/extra/resized/
    checksum-drifted files (BEFORE any data read — a truncated file would
    crash the parquet reader with an opaque error instead of this named
    report), then schema and row-count drift.  Returns the manifest when
    clean — run this before training on the data."""
    manifest = read_manifest(path)
    problems: list[str] = []
    has_sums = any("md5" in f for f in manifest["files"])
    live_files = _file_inventory(path, checksums=has_sums)
    want = {f["path"]: f for f in manifest["files"]}
    have = {f["path"]: f for f in live_files}
    for p in sorted(set(want) - set(have)):
        problems.append(f"missing file: {p}")
    for p in sorted(set(have) - set(want)):
        problems.append(f"unexpected file: {p}")
    for p in sorted(set(want) & set(have)):
        if want[p]["bytes"] != have[p]["bytes"]:
            problems.append(
                f"size drift: {p} {want[p]['bytes']} -> {have[p]['bytes']}"
            )
        elif want[p].get("md5") and want[p]["md5"] != have[p].get("md5"):
            problems.append(f"checksum drift: {p}")
    if problems:
        raise PublishError("; ".join(problems))
    df = spark.read.parquet(path)
    if df.schema.json() != manifest["schema"]:
        problems.append("schema drift")
    n = df.count()
    if n != manifest["n_rows"]:
        problems.append(f"row count drift: {manifest['n_rows']} -> {n}")
    if problems:
        raise PublishError("; ".join(problems))
    return manifest
