"""Spatial joins — the geo layer a location-bearing corpus needs (store
catchment, POI conflation, geocoded-record linkage), built the only way a
spatial join survives scale: GRID-CELL BUCKETING first (equi-join on cell
ids — never an all-pairs distance product), exact haversine verification
second.

Cross-engine determinism: cells are integer floors of scaled coordinates
(floor is floor in every engine); the haversine verify runs on a ROUNDED
distance (sin/cos/asin are correctly-rounded-ulp territory where JVM and C
runtimes may differ), so the keep/drop decision compares identical values
everywhere — the repo's float discipline.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["haversine_km", "radius_join"]

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG_LAT = 111.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column, *, round_to: int = 3
) -> Column:
    """Great-circle distance in km, rounded to ``round_to`` decimals (the
    comparison-safe form — raw trig differs in the last ulp across
    engines)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    return F.round(
        F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a)), round_to
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    *,
    radius_km: float,
    left_id: str = "left_id",
    right_id: str = "right_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 66.0,
    round_to: int = 3,
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` of each other.

    Shape: both sides hash into square grid cells sized so a radius
    circle can only span adjacent cells; the LEFT side probes its 3×3
    cell neighborhood (a 9-row explode — constant fan-out), pairs meet in
    an equi-join on the cell id, and the exact rounded haversine filters.
    Cost is candidate-pair-bound (points per cell × 9), never |L|×|R|.

    The longitude cell width uses the worst-case shrink at
    ``max_abs_lat`` (cells get WIDER in degrees toward the poles, so a
    fixed degree width sized at the highest allowed latitude stays
    conservative); rows beyond ``max_abs_lat`` are excluded — document
    the bound to callers rather than silently missing polar pairs.
    Longitude cells WRAP across the ±180° antimeridian (the probe uses
    modular cell ids, and haversine itself is wrap-correct), so a pair
    straddling the date line is found like any other.  NULL coordinates
    are excluded.

    Returns (left_id, right_id, dist_km).
    """
    if radius_km <= 0:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    if not 0 < max_abs_lat < 89.0:
        raise ValueError(f"max_abs_lat must be in (0, 89), got {max_abs_lat}")
    cell_lat = radius_km / KM_PER_DEG_LAT
    cell_lon = radius_km / (
        KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat))
    )
    # lon cells are modular: shift to [0, 360) and wrap the probe ids.
    # Tile evenly with FLOOR, then widen cell_lon to 360/n: ceil would make
    # the LAST cell narrower than the radius (e.g. radius 150 km at
    # max_abs_lat 66 → 1.19° ≈ 132 km), so a pair straddling that seam sat
    # 2 cells apart and escaped the 3×3 probe (advisor-found, with a
    # date-line counterexample).  Widening keeps every cell ≥ the
    # conservative bound, so adjacency still covers the radius.
    n_lon_cells = max(1, int(math.floor(360.0 / cell_lon)))
    cell_lon = 360.0 / n_lon_cells

    def prep(df: DataFrame, idc: str, pre: str) -> DataFrame:
        cx = F.pmod(
            F.floor((F.col(lon_col) + 180.0) / cell_lon).cast("long"),
            F.lit(n_lon_cells),
        )
        return df.filter(
            F.col(idc).isNotNull()
            & F.col(lat_col).isNotNull()
            & F.col(lon_col).isNotNull()
            & (F.abs(F.col(lat_col)) <= max_abs_lat)
        ).select(
            F.col(idc).alias(f"{pre}id"),
            F.col(lat_col).cast("double").alias(f"{pre}lat"),
            F.col(lon_col).cast("double").alias(f"{pre}lon"),
            F.floor(F.col(lat_col) / cell_lat).cast("long").alias(f"{pre}cy"),
            cx.alias(f"{pre}cx"),
        )

    l_ = prep(left, left_id, "l_")
    r_ = prep(right, right_id, "r_")
    offsets = F.expr(
        "array(-1, 0, 1)"
    )
    # wrap BEFORE exploding and de-duplicate the wrapped ids: with fewer
    # than 3 longitude cells (radius so large the globe tiles into 1-2
    # cells) the three dx offsets collapse onto the same wrapped cell, and
    # exploding them raw would emit the same candidate pair 2-3 times
    wrapped_dx = F.array_distinct(
        F.transform(
            offsets,
            lambda d: F.pmod(
                F.col("l_cx") + d + F.lit(n_lon_cells), F.lit(n_lon_cells)
            ),
        )
    )
    probes = (
        l_.withColumn("__dy", F.explode(offsets))
        .withColumn("cx", F.explode(wrapped_dx))
        .select(
            "l_id",
            "l_lat",
            "l_lon",
            (F.col("l_cy") + F.col("__dy")).alias("cy"),
            "cx",
        )
    )
    cand = probes.join(
        r_.withColumnRenamed("r_cy", "cy").withColumnRenamed("r_cx", "cx"),
        ["cy", "cx"],
    )
    dist = haversine_km(
        F.col("l_lat"), F.col("l_lon"), F.col("r_lat"), F.col("r_lon"),
        round_to=round_to,
    )
    return (
        cand.withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            "dist_km",
        )
    )
