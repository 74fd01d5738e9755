"""Spatial radius join: haversine correctness, grid-cell candidate
recall, polar bound, null handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.extended.spatial import haversine_km, radius_join


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat double, lon double")


def test_haversine_known_distances(spark):
    """Paris (48.8566, 2.3522) <-> London (51.5074, -0.1278) ~ 343.5 km;
    identical points -> 0."""
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double"
    )
    got = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("d")
    ).collect()[0]["d"]
    assert got == pytest.approx(343.5, abs=1.0)
    same = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("a"), F.col("b")).alias("d")
    ).collect()[0]["d"]
    assert same == 0.0


def test_radius_join_finds_cross_cell_neighbors_and_drops_far(spark):
    """A pair straddling a cell boundary still matches (3x3 probe); a
    clearly distant pair never does."""
    left = _pts(spark, [(1, 10.0, 20.0)])
    right = _pts(
        spark,
        [
            (100, 10.0, 20.0),     # same point: dist 0
            (101, 10.9, 20.0),     # ~100 km north, adjacent lat cell
            (102, 10.0, 21.0),     # ~109 km east
            (103, 30.0, 60.0),     # far
        ],
    )
    out = {
        r["rpid"]: r["dist_km"]
        for r in radius_join(
            left.withColumnRenamed("pid", "lpid"),
            right.withColumnRenamed("pid", "rpid"),
            radius_km=150.0, left_id="lpid", right_id="rpid",
        ).collect()
    }
    assert set(out) == {100, 101, 102}
    assert out[100] == 0.0
    assert 95 < out[101] < 105
    assert 105 < out[102] < 115


def test_radius_join_excludes_polar_and_null_rows(spark):
    left = _pts(spark, [(1, 80.0, 0.0), (2, None, 0.0), (3, 10.0, None)])
    right = _pts(spark, [(9, 80.0, 0.0)])
    out = radius_join(
        left.withColumnRenamed("pid", "lpid"),
        right.withColumnRenamed("pid", "rpid"),
        radius_km=100.0, left_id="lpid", right_id="rpid",
    ).collect()
    assert out == []  # 80° lat exceeds the 66° conservative bound
    with pytest.raises(ValueError, match="radius_km"):
        radius_join(left, right, radius_km=0)
    with pytest.raises(ValueError, match="max_abs_lat"):
        radius_join(left, right, radius_km=1, max_abs_lat=89.5)


def test_radius_join_wraps_the_antimeridian(spark):
    """~11 km apart across the date line: modular lon cells pair them."""
    left = _pts(spark, [(1, 0.0, 179.95)])
    right = _pts(spark, [(9, 0.0, -179.95)])
    out = radius_join(
        left.withColumnRenamed("pid", "lpid"),
        right.withColumnRenamed("pid", "rpid"),
        radius_km=150.0, left_id="lpid", right_id="rpid",
    ).collect()
    assert len(out) == 1
    assert out[0]["dist_km"] == pytest.approx(11.1, abs=0.5)


def test_radius_join_covers_the_narrow_seam_cell(spark):
    """Advisor counterexample: with ceil-tiling, the LAST longitude cell was
    narrower than the radius (radius 150 at max_abs_lat 66 → 1.19° ≈ 132 km
    wide), so (0, 178.815) and (0, -179.99) — 132.9 km apart — sat 2 cells
    apart and the 3×3 probe missed them.  Floor-tiling + widened cell_lon
    makes every cell ≥ the conservative bound, so the pair must be found."""
    left = _pts(spark, [(1, 0.0, 178.815)])
    right = _pts(spark, [(9, 0.0, -179.99)])
    out = radius_join(
        left.withColumnRenamed("pid", "lpid"),
        right.withColumnRenamed("pid", "rpid"),
        radius_km=150.0, left_id="lpid", right_id="rpid",
    ).collect()
    assert len(out) == 1
    assert out[0]["dist_km"] == pytest.approx(132.9, abs=0.5)


def test_huge_radius_no_duplicate_pairs(spark):
    """With radius so large the globe tiles into < 3 longitude cells, the
    wrapped 3x3 probe offsets collapse onto the same cell — pairs must
    still appear exactly once (wrapped ids are distinct-ed pre-explode)."""
    from engine.extended.spatial import radius_join

    l = spark.createDataFrame([(1, 0.0, 10.0)], "left_id int, lat double, lon double")
    r = spark.createDataFrame(
        [(2, 1.0, 12.0), (3, 0.0, 90.0)], "right_id int, lat double, lon double"
    )
    got = radius_join(l, r, radius_km=9000.0).collect()
    keys = [(x["left_id"], x["right_id"]) for x in got]
    assert sorted(keys) == [(1, 2), (1, 3)]  # each pair once, both in radius
