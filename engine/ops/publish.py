"""Write-audit-publish (WAP) for datasets: stage → audit → atomic swap,
with a manifest consumers can re-verify.

The production contract a corpus pipeline needs around every emitted
dataset: downstream training jobs must never see a half-written or
silently-truncated table.  The publish path writes to a staging directory,
audits what actually landed (row count, schema, file inventory), writes a
``_manifest.json`` describing it, and atomically renames staging into
place; :func:`verify_dataset` re-derives the same facts from the live
table and raises on ANY drift — the check a consumer runs before
training on the data.

Local-filesystem rename is atomic; object stores swap via their
committer/metadata layer instead — the staging/manifest/verify protocol is
the part that transfers.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["publish_dataset", "verify_dataset", "read_manifest", "PublishError"]

MANIFEST = "_manifest.json"


class PublishError(RuntimeError):
    """Audit or verification failure — the dataset must not be consumed."""


def _file_inventory(path: str) -> list[dict]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out.append(
                    {
                        "path": os.path.relpath(p, path),
                        "bytes": os.path.getsize(p),
                    }
                )
    return sorted(out, key=lambda d: d["path"])


def publish_dataset(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str] | None = None,
) -> dict:
    """Stage, audit, and atomically publish ``df`` as parquet at ``path``.

    The audit RE-READS the staged files (never trusts the writing job's
    view): row count and schema come from the staged parquet, the file
    inventory from the filesystem.  Returns the manifest dict.  Fails —
    leaving the target untouched — if the target already exists or the
    staged re-read disagrees with the input schema.
    """
    if os.path.exists(path):
        raise PublishError(f"target already exists: {path}")
    spark = df.sparkSession
    staging = f"{path}.__staging-{uuid.uuid4().hex}"
    writer = df.write.mode("errorifexists")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
    try:
        staged = spark.read.option("recursiveFileLookup", "false").parquet(staging)
        n_rows = staged.count()
        schema_json = staged.schema.json()
        manifest = {
            "n_rows": n_rows,
            "schema": schema_json,
            "partition_cols": partition_cols or [],
            "files": _file_inventory(staging),
        }
        with open(os.path.join(staging, MANIFEST), "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        os.rename(staging, path)  # atomic on a local filesystem
        return manifest
    except Exception:
        import shutil

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
    :class:`PublishError` naming every discrepancy: missing/extra/resized
    files, row-count drift, schema drift.  Returns the manifest when
    clean — run this before training on the data."""
    manifest = read_manifest(path)
    problems: list[str] = []
    live_files = _file_inventory(path)
    want = {f["path"]: f["bytes"] for f in manifest["files"]}
    have = {f["path"]: f["bytes"] for f in live_files}
    for p in sorted(set(want) - set(have)):
        problems.append(f"missing file: {p}")
    for p in sorted(set(have) - set(want)):
        problems.append(f"unexpected file: {p}")
    for p in sorted(set(want) & set(have)):
        if want[p] != have[p]:
            problems.append(f"size drift: {p} {want[p]} -> {have[p]}")
    # inventory drift aborts BEFORE the data read: a truncated or missing
    # file would crash the parquet reader with an opaque error instead of
    # this named report
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
