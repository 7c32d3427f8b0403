"""Geo filtering — the lucene/spatial prefix-tree module restated for
columnar lat/lon.

The reference indexes shapes into a geohash prefix tree and intersects
query shapes against tree cells (lucene/spatial/.../prefix/
RecursivePrefixTreeStrategy.java). The columnar restatement:

  - grid_cell(): a fixed-resolution cell id per row — the prefix-tree
    cell as a PARTITION KEY: write the corpus partitioned/bucketed by it
    and a radius query prunes to the bbox's cells before any row is read.
  - geo_within_radius(): bounding-box prefilter (simple range predicates,
    pushed into the parquet scan / partition pruning) + exact haversine
    — the filter-then-verify shape of the reference strategy.

All expressions are built-in Catalyst trig — JVM-side, codegen'd.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat_a, lon_a, lat_b, lon_b) -> Column:
    """Great-circle distance between two (lat, lon) pairs, in km."""
    dlat = F.radians(lat_b - lat_a)
    dlon = F.radians(lon_b - lon_a)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b))
        * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(lat, lon, cell_deg: float = 1.0) -> Column:
    """Fixed-resolution grid cell id (the prefix-tree cell / geohash-bucket
    analog, numeric for cheap joins): row-major index of the cell_deg-sized
    cell containing the point."""
    n_lon = int(math.ceil(360.0 / cell_deg))
    return (
        F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)) * F.lit(n_lon)
        + F.floor((lon + F.lit(180.0)) / F.lit(cell_deg))
    ).cast("long")


def geo_within_radius(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat0: float,
    lon0: float,
    radius_km: float,
) -> DataFrame:
    """Rows within ``radius_km`` of (lat0, lon0): bbox prefilter (range
    predicates — pushdown/partition-pruning eligible) then exact haversine.

    The bbox is conservative: latitude span is exact; longitude span uses
    the widest parallel in the latitude band and degenerates to the full
    [-180, 180] near the poles (correctness first, pruning second)."""
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    lat_lo, lat_hi = max(lat0 - dlat, -90.0), min(lat0 + dlat, 90.0)
    widest = min(abs(lat_lo), abs(lat_hi)) if lat_lo * lat_hi > 0 else 0.0
    cosw = math.cos(math.radians(widest))
    if (
        lat0 + dlat >= 90.0 or lat0 - dlat <= -90.0  # circle contains a pole
        or cosw < 1e-9
        or dlat / max(cosw, 1e-9) >= 180.0
    ):
        lon_pred = F.lit(True)  # longitude unbounded
    else:
        dlon = dlat / cosw
        lo, hi = lon0 - dlon, lon0 + dlon
        if lo < -180.0:  # antimeridian wrap (west)
            lon_pred = (F.col(lon_col) >= lo + 360.0) | (F.col(lon_col) <= hi)
        elif hi > 180.0:  # antimeridian wrap (east)
            lon_pred = (F.col(lon_col) >= lo) | (F.col(lon_col) <= hi - 360.0)
        else:
            lon_pred = F.col(lon_col).between(lo, hi)
    dist = haversine_km(F.col(lat_col), F.col(lon_col), F.lit(lat0), F.lit(lon0))
    return (
        df.where(F.col(lat_col).between(lat_lo, lat_hi) & lon_pred)
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= radius_km)
    )
