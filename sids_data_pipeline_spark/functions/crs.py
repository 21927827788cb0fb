"""Coordinate reference system transforms (P9/F8 — SURVEY.md §2a).

The reference probes each raster's EPSG with gdalsrsinfo and warps to
EPSG:4326 only when they differ (reference ``batch/processing/raster.py:
14-29``). GDAL is not in this container, but the two CRSs this engine's
data model actually uses — WGS-84 (4326) and Web Mercator (3857, the
slippy-tile CRS the K2 sink targets) — convert in closed form, so the
engine implements that pair as pure JVM column math (codegen-friendly, no
UDF, SQL-oracle-mirrorable). Other CRSs raise: plug pyproj into a pandas
UDF behind the same operator signature when available.

Spherical Web Mercator (EPSG:3857), R = 6378137 m:
    x = R·lon_rad                 lon = degrees(x / R)
    y = R·ln(tan(π/4 + lat_rad/2))    lat = degrees(2·atan(exp(y / R)) − π/2)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WEB_MERCATOR_RADIUS = 6378137.0
WGS84 = 4326
WEB_MERCATOR = 3857


def lonlat_to_mercator(lon: Column, lat: Column) -> tuple[Column, Column]:
    x = F.radians(lon) * F.lit(WEB_MERCATOR_RADIUS)
    y = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / F.lit(2.0))) * F.lit(
        WEB_MERCATOR_RADIUS
    )
    return x, y


def mercator_to_lonlat(x: Column, y: Column) -> tuple[Column, Column]:
    lon = F.degrees(x / F.lit(WEB_MERCATOR_RADIUS))
    lat = F.degrees(
        F.atan(F.exp(y / F.lit(WEB_MERCATOR_RADIUS))) * F.lit(2.0)
        - F.lit(math.pi / 2.0)
    )
    return lon, lat


def reproject_pixels(
    pixels: DataFrame,
    src_epsg: int,
    dst_epsg: int = WGS84,
    x_col: str = "lon",
    y_col: str = "lat",
) -> DataFrame:
    """P9 branch + F8 warp as a declarative plan: identity when the CRSs
    already match (the reference's gdalsrsinfo short-circuit), closed-form
    column math for the 4326↔3857 pair, loud failure otherwise."""
    if src_epsg == dst_epsg:
        return pixels
    if (src_epsg, dst_epsg) == (WEB_MERCATOR, WGS84):
        lon, lat = mercator_to_lonlat(F.col(x_col), F.col(y_col))
    elif (src_epsg, dst_epsg) == (WGS84, WEB_MERCATOR):
        lon, lat = lonlat_to_mercator(F.col(x_col), F.col(y_col))
    else:
        raise NotImplementedError(
            f"EPSG:{src_epsg}→EPSG:{dst_epsg} needs pyproj (not in this "
            "container); 4326↔3857 are built-in closed forms"
        )
    return pixels.withColumn(x_col, lon).withColumn(y_col, lat)


def standardize_crs(
    pixels: DataFrame, epsg_col: str = "src_epsg", dst_epsg: int = WGS84
) -> DataFrame:
    """Per-row CRS branch for mixed-CRS pixel tables (the batch module's
    per-raster probe, vectorized): rows already in ``dst_epsg`` pass
    through, Web Mercator rows convert, anything else fails the job loudly.

    The raise is woven into the lon/lat output expressions (unsupported
    rows fall through every WHEN branch into a raise_error OTHERWISE), so
    the guard survives column pruning — a standalone assertion column
    would be dropped by Catalyst as unused and never fire.
    """
    is_dst = F.col(epsg_col) == dst_epsg
    is_merc = F.col(epsg_col) == WEB_MERCATOR
    lon_m, lat_m = mercator_to_lonlat(F.col("lon"), F.col("lat"))
    boom = F.raise_error(
        F.concat(F.lit("unsupported src EPSG: "), F.col(epsg_col).cast("string"))
    ).cast("double")
    return (
        pixels.withColumn(
            "lon", F.when(is_merc, lon_m).when(is_dst, F.col("lon")).otherwise(boom)
        )
        .withColumn(
            "lat", F.when(is_merc, lat_m).when(is_dst, F.col("lat")).otherwise(boom)
        )
        .withColumn(epsg_col, F.lit(dst_epsg))
    )
