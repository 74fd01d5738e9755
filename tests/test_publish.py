"""Write-audit-publish: staging swap, manifest audit, drift detection."""

from __future__ import annotations

import glob
import os

import pytest

from engine.ops.publish import (
    PublishError,
    publish_dataset,
    read_manifest,
    verify_dataset,
)


def test_publish_and_verify_roundtrip(spark, tmp_path):
    path = str(tmp_path / "ds")
    m = publish_dataset(spark.range(100).selectExpr("id", "id % 5 as k"), path)
    assert m["n_rows"] == 100
    assert len(m["files"]) >= 1
    assert verify_dataset(spark, path)["n_rows"] == 100
    # no staging residue
    assert glob.glob(str(tmp_path / "ds.__staging-*")) == []


def test_publish_partitioned(spark, tmp_path):
    path = str(tmp_path / "pds")
    m = publish_dataset(
        spark.range(60).selectExpr("id", "id % 3 as part"),
        path,
        partition_cols=["part"],
    )
    assert m["partition_cols"] == ["part"]
    assert any("part=" in f["path"] for f in m["files"])
    verify_dataset(spark, path)


def test_verify_detects_missing_and_tampered_files(spark, tmp_path):
    path = str(tmp_path / "vds")
    publish_dataset(spark.range(50), path)
    victim = glob.glob(path + "/part-*.parquet")[0]
    blob = open(victim, "rb").read()
    os.remove(victim)
    with pytest.raises(PublishError, match="missing file"):
        verify_dataset(spark, path)
    # restore but truncated: size drift
    open(victim, "wb").write(blob[: len(blob) // 2])
    with pytest.raises(PublishError, match="size drift"):
        verify_dataset(spark, path)


def test_verify_detects_extra_file_and_missing_manifest(spark, tmp_path):
    path = str(tmp_path / "eds")
    publish_dataset(spark.range(10), path)
    open(path + "/part-sneaky.parquet", "wb").write(b"x")
    with pytest.raises(PublishError, match="unexpected file"):
        verify_dataset(spark, path)
    with pytest.raises(PublishError, match="not a published dataset"):
        read_manifest(str(tmp_path))


def test_publish_refuses_existing_target_and_cleans_staging(spark, tmp_path):
    path = str(tmp_path / "xds")
    publish_dataset(spark.range(5), path)
    with pytest.raises(PublishError, match="already exists"):
        publish_dataset(spark.range(5), path)
    assert glob.glob(str(tmp_path / "xds.__staging-*")) == []


def test_verify_detects_non_parquet_junk_before_the_read(spark, tmp_path):
    """Review finding: a stray non-parquet file must surface as named
    inventory drift, not crash the later parquet read."""
    path = str(tmp_path / "jds")
    publish_dataset(spark.range(10), path)
    open(path + "/junk.txt", "wb").write(b"\x00garbage")
    with pytest.raises(PublishError, match="unexpected file: junk.txt"):
        verify_dataset(spark, path)


def test_verify_detects_same_size_tampering_via_checksum(spark, tmp_path):
    """Review finding: content tampering that preserves the byte length
    must still fail verification (per-file md5 in the manifest)."""
    path = str(tmp_path / "cds")
    publish_dataset(spark.range(100), path)
    victim = glob.glob(path + "/part-*.parquet")[0]
    blob = bytearray(open(victim, "rb").read())
    blob[len(blob) // 2] ^= 0xFF  # same size, different content
    open(victim, "wb").write(bytes(blob))
    with pytest.raises(PublishError, match="checksum drift"):
        verify_dataset(spark, path)


def test_failed_write_cleans_staging(spark, tmp_path):
    """Review finding: a write that dies mid-job must not leak the
    staging directory."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "fds")
    bad = spark.range(10).select(
        F.when(F.col("id") < 5, F.col("id"))
        .otherwise(F.raise_error(F.lit("boom")))
        .alias("id")
    )
    with pytest.raises(Exception):
        publish_dataset(bad, path)
    assert glob.glob(str(tmp_path / "fds.__staging-*")) == []
    assert not os.path.exists(path)


def test_schema_drift_comparator_ignores_nullability():
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from engine.ops.publish import _schema_drift

    a = StructType([StructField("x", LongType(), True)])
    b = StructType([StructField("x", LongType(), False)])
    c = StructType([StructField("x", StringType(), True)])
    d = StructType([StructField("y", LongType(), True)])
    assert not _schema_drift(a, b)  # nullability relaxed: fine
    assert _schema_drift(a, c)      # type change: drift
    assert _schema_drift(a, d)      # name change: drift
