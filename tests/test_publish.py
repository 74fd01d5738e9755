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
