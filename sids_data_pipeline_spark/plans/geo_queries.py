"""Geospatial + manifest query catalog with full-value SQL oracles.

The zonal-stats oracle problem (VERDICT "What's wrong #4"): the engine's
containment is pixel-center ray-casting (functions/geo.py), so a DuckDB
oracle using a *different* point-in-polygon formulation would diverge on
boundary/float edge cases. Solution: :func:`o_contains` generates the
oracle's containment SQL *from the same WKB bytes the engine consumes*,
mirroring the numpy kernel edge-for-edge — same crossing condition, same
intersection formula, same even-odd ring XOR — so both sides evaluate
bit-identical IEEE-754 expressions.

The pixel side is deterministic on both engines: ``spark.range(n*n)``
(sources/raster.py synthetic fixtures) vs ``unnest(range(n*n))`` with the
same arithmetic.

Covers SURVEY.md §2a: J1 (both join strategies), A1 superset, O1, P4/P5
(clip/band), P6/P8/J3 (manifest incrementality), F5/F6 (pixel model +
containment).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sids_data_pipeline_spark.functions import geo
from sids_data_pipeline_spark.operators import manifest
from sids_data_pipeline_spark.operators.zonal import zonal_stats
from sids_data_pipeline_spark.plans.base import Query
from sids_data_pipeline_spark.sources.raster import (
    GRID_N,
    PIXEL_DEG,
    clip_extent,
    select_band,
    synthetic_raster,
)
from sids_data_pipeline_spark.sources.vector import FIXTURE_BUILDERS, fixture_zones


# --- oracle-side synthetic pixels (twin of sources/raster.synthetic_raster) --

_VAL_SQL = {
    "rast_gradient": "CAST(i AS DOUBLE)",
    "rast_checker": f"CAST((i % {GRID_N} + i // {GRID_N}) % 2 AS DOUBLE)",
    "rast_nodata": (
        f"CASE WHEN ((i % {GRID_N}) * (i // {GRID_N})) % 7 = 0 THEN NULL "
        "ELSE CAST(i AS DOUBLE) END"
    ),
}


def _px_cte(raster_id: str) -> str:
    n = GRID_N
    return f"""
px AS (
  SELECT i % {n} AS x, i // {n} AS y,
         (i % {n} + 0.5) * 0.1 AS lon, (i // {n} + 0.5) * 0.1 AS lat,
         1 AS band,
         {_VAL_SQL[raster_id]} AS val
  FROM (SELECT unnest(range({n * n})) AS i) t
)
"""



_FIXTURE_TIFF_DIRS: dict[str, str] = {}


def _cached_fixture_dir(key: str, filename: str, arr_fn, **encode_kw) -> str:
    """One process-cached temp directory per fixture key, holding a
    deterministic GeoTIFF written once. Cached so repeated catalog/gate/
    bench invocations reuse one directory instead of leaking a fresh
    mkdtemp per run, and so every scan path (mapInPandas ingest AND the
    registered DataSource) reads the SAME bytes."""
    import os
    import tempfile

    from sids_data_pipeline_spark.sources.geotiff import encode_geotiff

    work = _FIXTURE_TIFF_DIRS.get(key)
    if work is None:
        work = tempfile.mkdtemp(prefix=f"sdp_tiff_{key}_")
        data = encode_geotiff(
            arr_fn(), origin_x=0.0, origin_y=GRID_N * 0.1, pixel_deg=0.1,
            **encode_kw,
        )
        with open(os.path.join(work, filename), "wb") as f:
            f.write(data)
        _FIXTURE_TIFF_DIRS[key] = work
    return work


def _fixture_geotiff_dir() -> str:
    """Deterministic gradient GeoTIFF in the reference's own output
    profile (ZSTD, 128-tiled)."""
    import numpy as np

    def arr():
        y, x = np.mgrid[0:GRID_N, 0:GRID_N]
        return (x + GRID_N * y).astype("float64")

    return _cached_fixture_dir(
        "gradient", "rast_gradient.tif", arr, compress="zstd", tile=128
    )


def _fixture_multiband_dir() -> str:
    """Deterministic 3-band GeoTIFF in the PLANAR strip layout
    (PlanarConfiguration=2) + deflate — the foreign-raster shape the
    round-6 verdict flagged as the last codec gap. Band b's value at
    cell i is b*100000 + i, so a band-selection bug (wrong plane, wrong
    interleave) cannot hash-collide with the oracle."""
    import numpy as np

    def arr():
        y, x = np.mgrid[0:GRID_N, 0:GRID_N]
        base = (x + GRID_N * y).astype("float64")
        return np.stack([b * 100000.0 + base for b in (1, 2, 3)])

    return _cached_fixture_dir(
        "mb", "rast_rgb.tif", arr, compress="deflate", planar=True
    )


# --- oracle-side containment, generated from the engine's own WKB -----------


def _edge_term(x0: float, y0: float, x1: float, y1: float) -> str:
    """One ray-cast edge term, mirroring geo._ring_crossings exactly:
    count the edge iff (y0 > lat) != (y1 > lat) and
    lon < (x1 - x0) * (lat - y0) / (y1 - y0) + x0."""
    return (
        f"(CASE WHEN ({y0!r} > lat) <> ({y1!r} > lat) "
        f"AND lon < ({x1!r} - {x0!r}) * (lat - {y0!r}) / ({y1!r} - {y0!r}) + {x0!r} "
        f"THEN 1 ELSE 0 END)"
    )


def o_contains(wkb: bytes) -> str:
    """SQL predicate: pixel center (lon, lat) inside the WKB (Multi)Polygon,
    by the same even-odd ray-casting the engine's numpy kernel computes."""
    per_poly = []
    for rings in geo.parse_wkb(wkb):
        terms = []
        for ring in rings:
            for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
                if y0 == y1:
                    continue  # horizontal edges never satisfy the condition
                terms.append(_edge_term(float(x0), float(y0), float(x1), float(y1)))
        if terms:
            per_poly.append("((" + " + ".join(terms) + ") % 2 = 1)")
        else:
            # zero-area polygon (all-horizontal edges): the kernel's
            # crossing count is 0 everywhere → contains nothing; an
            # empty join would be a SQL syntax error
            per_poly.append("(FALSE)")
    if not per_poly:
        return "(FALSE)"  # empty MultiPolygon contains nothing
    return "(" + " OR ".join(per_poly) + ")"


_STAT_SQL = {
    "mean": 'AVG(CASE WHEN {c} THEN val END) AS "mean"',
    "count": 'COUNT(CASE WHEN {c} THEN val END) AS "count"',
    "sum": 'SUM(CASE WHEN {c} THEN val END) AS "sum"',
    "min": 'MIN(CASE WHEN {c} THEN val END) AS "min"',
    "max": 'MAX(CASE WHEN {c} THEN val END) AS "max"',
    "median": 'quantile_cont(CASE WHEN {c} THEN val END, 0.5) AS "median"',
}


def _zonal_sql_for(
    zone_rows: list[tuple[int, str, bytes]],
    vector_id: str,
    raster_id: str,
    stats: tuple[str, ...],
    px_cte: str,
) -> str:
    """Oracle generator: one conditional-aggregate arm per zone, with the
    containment predicate generated from the zone's own WKB bytes."""
    arms = []
    for fid, _name, wkb in zone_rows:
        c = o_contains(wkb)
        cols = ", ".join(_STAT_SQL[s].format(c=c) for s in stats)
        arms.append(
            f"SELECT '{vector_id}' AS vector_id, '{raster_id}' AS raster_id, "
            f"CAST({fid} AS BIGINT) AS fid, {cols} FROM px"
        )
    body = "\nUNION ALL\n".join(arms)
    return f"WITH {px_cte}\n{body}"


def _zonal_sql(vector_id: str, raster_id: str, stats: tuple[str, ...]) -> str:
    return _zonal_sql_for(
        FIXTURE_BUILDERS[vector_id](), vector_id, raster_id, stats,
        _px_cte(raster_id),
    )


def _zonal_query(vector_id: str, raster_id: str, stats: tuple[str, ...], how: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        zones = fixture_zones(spark, vector_id)
        pixels = synthetic_raster(spark, raster_id)
        return zonal_stats(zones, pixels, stats=stats, how=how)

    return run


# --- benchmark-scale zonal (1M pixels) -----------------------------------------

_LARGE_N = 1024
_LARGE_SCALE = float(_LARGE_N // GRID_N)  # zones_grid boxes scale up 16×


def _large_zone_rows() -> list[tuple[int, str, bytes]]:
    rows = []
    for fid, name, wkb in FIXTURE_BUILDERS["zones_grid"]():
        xmin, ymin, xmax, ymax = geo.wkb_bbox(wkb)
        rows.append(
            (
                fid,
                name,
                geo.box_wkb(
                    xmin * _LARGE_SCALE,
                    ymin * _LARGE_SCALE,
                    xmax * _LARGE_SCALE,
                    ymax * _LARGE_SCALE,
                ),
            )
        )
    return rows


def _large_px_cte() -> str:
    n = _LARGE_N
    return f"""
px AS (
  SELECT (i % {n} + 0.5) * 0.1 AS lon, (i // {n} + 0.5) * 0.1 AS lat,
         CAST(i AS DOUBLE) AS val
  FROM (SELECT unnest(range({n * n})) AS i) t
)
"""


def _zonal_large_factory(how: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sids_data_pipeline_spark.schemas import ZONES
        from sids_data_pipeline_spark.sources.raster import synthetic_raster_scaled

        zone_pdf = pd.DataFrame(
            [("zones_large", fid, name, wkb) for fid, name, wkb in _large_zone_rows()],
            columns=[f.name for f in ZONES.fields],
        )
        zones = spark.createDataFrame(zone_pdf, ZONES).coalesce(1)
        pixels = synthetic_raster_scaled(spark, _LARGE_N)
        return zonal_stats(
            zones, pixels, stats=("mean", "count"), how=how, cell_deg=8.0
        )

    return run


QUERIES_LARGE_SQL = _zonal_sql_for(
    _large_zone_rows(), "zones_large", f"rast_gradient_{_LARGE_N}",
    ("mean", "count"), _large_px_cte(),
)


# --- clip + band selection (P4/P5) -------------------------------------------


def _raster_clip_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = select_band(synthetic_raster(spark, "rast_gradient"), 1)
    clipped = clip_extent(px, lon=(1.0, 5.0), lat=(2.0, 6.0))
    return clipped.groupBy("raster_id").agg(
        F.count("val").alias("n_pixels"),
        F.sum("val").alias("sum_val"),
        F.min("lon").alias("min_lon"),
        F.max("lat").alias("max_lat"),
    )


_CLIP_SQL = f"""
WITH {_px_cte('rast_gradient')}
SELECT 'rast_gradient' AS raster_id,
       COUNT(val) AS n_pixels, SUM(val) AS sum_val,
       MIN(lon) AS min_lon, MAX(lat) AS max_lat
FROM px
WHERE band = 1 AND lon BETWEEN 1.0 AND 5.0 AND lat BETWEEN 2.0 AND 6.0
GROUP BY 1
"""
# ^ GROUP BY keeps the empty-window case symmetric with the engine's
# groupBy("raster_id"): both sides yield ZERO rows when no pixel
# survives the clip, instead of the oracle's former global aggregate
# emitting a lone (0, NULL, NULL, NULL) row the engine never would.


# --- manifest incrementality (P6/P8/J3) ---------------------------------------

_VECTORS = ("zones_grid", "zones_overlap")
_RASTERS = ("rast_gradient", "rast_checker", "rast_nodata")
_DONE = (("zones_grid", "rast_gradient"),)


def _manifest_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = spark.createDataFrame([(v,) for v in _VECTORS], "id string")
    rasters = spark.createDataFrame([(r,) for r in _RASTERS], "id string")
    done = spark.createDataFrame(list(_DONE), "v_id string, r_id string")
    pairs = manifest.work_pairs(vectors, rasters)
    return manifest.pending_pairs(pairs, done).orderBy("v_id", "r_id")


_MANIFEST_SQL = f"""
WITH v(v_id) AS (VALUES {', '.join(f"('{x}')" for x in _VECTORS)}),
r(r_id) AS (VALUES {', '.join(f"('{x}')" for x in _RASTERS)}),
done(v_id, r_id) AS (VALUES {', '.join(f"('{a}', '{b}')" for a, b in _DONE)}),
pairs AS (
  SELECT v_id, r_id, concat_ws('_', v_id, r_id) AS pair_key
  FROM v CROSS JOIN r
)
SELECT p.v_id, p.r_id, p.pair_key
FROM pairs p LEFT JOIN done d ON p.v_id = d.v_id AND p.r_id = d.r_id
WHERE d.v_id IS NULL
ORDER BY p.v_id, p.r_id
"""


# --- CRS reprojection (P9/F8) --------------------------------------------------


def _crs_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.functions.crs import reproject_pixels

    grid = spark.range(0, 1000, 1, 8).select(
        F.col("id"),
        ((F.col("id") % 50).cast("double") * 100000.0 - 2500000.0).alias("lon"),
        ((F.col("id") / 50).cast("long").cast("double") * 150000.0 - 1500000.0).alias(
            "lat"
        ),
    )
    out = reproject_pixels(grid, src_epsg=3857, dst_epsg=4326)
    # 9-dp rounding: Java and C libm may differ in the last ULP of
    # atan/exp; nine decimals ≈ 0.1 mm, far beyond either error.
    return out.select(
        "id", F.round("lon", 9).alias("lon"), F.round("lat", 9).alias("lat")
    )


_CRS_SQL = """
WITH m AS (
  SELECT i AS id,
         CAST(i % 50 AS DOUBLE) * 100000.0 - 2500000.0 AS x,
         CAST(i // 50 AS DOUBLE) * 150000.0 - 1500000.0 AS y
  FROM (SELECT unnest(range(1000)) AS i) t
)
SELECT id,
       ROUND(degrees(x / 6378137.0), 9) AS lon,
       ROUND(degrees(atan(exp(y / 6378137.0)) * 2.0 - 1.5707963267948966), 9) AS lat
FROM m
"""


# --- S5/S6 source scans, gate-visible ------------------------------------------


def _geotiff_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 end-to-end: encode the gradient fixture in the reference's own
    output profile (ZSTD + 128×128 tiles, batch/processing/raster.py:7-8)
    and ingest it distributed (binaryFile → mapInPandas). Deterministic
    array → the oracle recomputes the same lattice from range()."""
    from sids_data_pipeline_spark.sources.geotiff import ingest_geotiff

    px = ingest_geotiff(spark, _fixture_geotiff_dir() + "/*.tif")
    return px.select(
        "raster_id", "band", "y", "x",
        F.round("lon", 9).alias("lon"),
        F.round("lat", 9).alias("lat"),
        "val",
    )


def _fixture_lzw_dir() -> str:
    """Deterministic uint16 GeoTIFF in the single most common FOREIGN
    profile: LZW + horizontal predictor 2, strip layout — the NASA/USGS
    distribution default the round-7 verdict flagged as the first crash
    a real user would hit (reference reads it via GDAL,
    batch/processing/raster.py:22-38). Values are the gradient mod 4096
    so they fit u2 exactly and can't alias the plain-gradient fixture."""
    import numpy as np

    def arr():
        y, x = np.mgrid[0:GRID_N, 0:GRID_N]
        return np.mod(x + GRID_N * y, 4096).astype("float64")

    return _cached_fixture_dir(
        "lzw", "rast_lzw.tif", arr, compress="lzw", dtype="u2", predictor=2
    )


def _fixture_bigtiff_dir() -> str:
    """Deterministic BigTIFF (version 43, 8-byte offsets) fixture —
    classic TIFF caps at 4 GiB, so the >4 GiB rasters of a 100 TB
    estate arrive in this layout (GDAL writes it automatically past the
    ceiling). ZSTD + 128-tiles like the reference profile; values are
    the gradient + 7 so a header-dispatch bug cannot alias the classic
    gradient fixture's hash."""
    import numpy as np

    def arr():
        y, x = np.mgrid[0:GRID_N, 0:GRID_N]
        return (x + GRID_N * y + 7).astype("float64")

    return _cached_fixture_dir(
        "big", "rast_big.tif", arr, compress="zstd", tile=128, bigtiff=True
    )


def _bigtiff_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 on the BigTIFF layout: version-43 header, 20-byte IFD entries,
    LONG8 strip/tile offsets — distributed ingest, lattice oracle."""
    from sids_data_pipeline_spark.sources.geotiff import ingest_geotiff

    px = ingest_geotiff(spark, _fixture_bigtiff_dir() + "/*.tif")
    return px.select(
        "raster_id", "band", "y", "x",
        F.round("lon", 9).alias("lon"),
        F.round("lat", 9).alias("lat"),
        "val",
    )


def _bigtiff_ingest_sql() -> str:
    n = GRID_N
    return f"""
SELECT 'rast_big' AS raster_id,
       1 AS band,
       CAST(i // {n} AS INT) AS y,
       CAST(i % {n} AS INT) AS x,
       ROUND((i % {n} + 0.5) * CAST(0.1 AS DOUBLE), 9) AS lon,
       ROUND({n} * CAST(0.1 AS DOUBLE) - (i // {n} + 0.5) * CAST(0.1 AS DOUBLE), 9)
         AS lat,
       CAST(i + 7 AS DOUBLE) AS val
FROM (SELECT unnest(range({n * n})) AS i) t
"""


def _lzw_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 on a foreign-profile raster: uint16 + LZW + predictor 2
    (pure-python early-change LZW + modular cumsum un-differencing),
    distributed ingest, lattice oracle."""
    from sids_data_pipeline_spark.sources.geotiff import ingest_geotiff

    px = ingest_geotiff(spark, _fixture_lzw_dir() + "/*.tif")
    return px.select(
        "raster_id", "band", "y", "x",
        F.round("lon", 9).alias("lon"),
        F.round("lat", 9).alias("lat"),
        "val",
    )


def _lzw_ingest_sql() -> str:
    n = GRID_N
    return f"""
SELECT 'rast_lzw' AS raster_id,
       1 AS band,
       CAST(i // {n} AS INT) AS y,
       CAST(i % {n} AS INT) AS x,
       ROUND((i % {n} + 0.5) * CAST(0.1 AS DOUBLE), 9) AS lon,
       ROUND({n} * CAST(0.1 AS DOUBLE) - (i // {n} + 0.5) * CAST(0.1 AS DOUBLE), 9)
         AS lat,
       CAST(i % 4096 AS DOUBLE) AS val
FROM (SELECT unnest(range({n * n})) AS i) t
"""


# Warp target grid (EPSG:3857 meters): origin (0, 0), 9 km cells, 80×80 —
# covers the fixture's 6.4° extent (≈712 km at the equator) plus an edge
# margin so out-of-source cells exercise the omission contract.
_WARP_RES = 9000.0
_WARP_N = 80


def _raster_warp_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 grid warp (gdalwarp -t_srs EPSG:3857 -r bilinear parity) on the
    NODATA fixture: target lattice inverse-projects through the closed-form
    Mercator leg, contributors resolve via integer (x, y) equi-joins, and
    NULL pixels drop out of the weight normalisation — the oracle recomputes
    the identical lattice + 4-corner weighting in pure scalar SQL (the
    fixture value and its nodata mask are closed forms, so no source join)."""
    from sids_data_pipeline_spark.sources.raster import synthetic_raster, warp_to_grid

    px = synthetic_raster(spark, "rast_nodata")
    out = warp_to_grid(
        px,
        src_epsg=4326,
        dst_epsg=3857,
        src_origin=(0.0, 0.0),
        src_res=(PIXEL_DEG, PIXEL_DEG),
        dst_origin=(0.0, 0.0),
        dst_res=(_WARP_RES, _WARP_RES),
        dst_size=(_WARP_N, _WARP_N),
        resampling="bilinear",
    )
    # 4 dp on val: bilinear weights inherit ~1-ULP libm drift from the
    # Mercator atan/exp leg; against the gradient's 0..4095 range that is
    # ≤ ~1e-12 absolute — 4 dp sits 8 orders of magnitude above it.
    return out.select(
        "out_x", "out_y", F.round("val", 4).alias("val")
    ).orderBy("out_y", "out_x")


def _raster_warp_sql() -> str:
    n = GRID_N
    return f"""
WITH tgt AS (
  SELECT CAST(i % {_WARP_N} AS INT) AS out_x,
         CAST(i // {_WARP_N} AS INT) AS out_y,
         (CAST(i % {_WARP_N} AS DOUBLE) + 0.5) * {_WARP_RES} AS xd,
         (CAST(i // {_WARP_N} AS DOUBLE) + 0.5) * {_WARP_RES} AS yd
  FROM (SELECT unnest(range({_WARP_N * _WARP_N})) AS i) t
), inv AS (
  SELECT out_x, out_y,
         degrees(xd / 6378137.0) / {PIXEL_DEG} - 0.5 AS fc,
         degrees(atan(exp(yd / 6378137.0)) * 2.0 - 1.5707963267948966)
           / {PIXEL_DEG} - 0.5 AS fr
  FROM tgt
), c0 AS (
  SELECT out_x, out_y,
         CAST(floor(fc) AS INT) AS i0, CAST(floor(fr) AS INT) AS j0,
         fc - floor(fc) AS fx, fr - floor(fr) AS fy
  FROM inv
), corners AS (
  SELECT out_x, out_y, i0 AS i, j0 AS j, (1.0 - fx) * (1.0 - fy) AS w FROM c0
  UNION ALL SELECT out_x, out_y, i0 + 1, j0, fx * (1.0 - fy) FROM c0
  UNION ALL SELECT out_x, out_y, i0, j0 + 1, (1.0 - fx) * fy FROM c0
  UNION ALL SELECT out_x, out_y, i0 + 1, j0 + 1, fx * fy FROM c0
), valid AS (
  SELECT out_x, out_y, w, CAST(i + {n} * j AS DOUBLE) AS val
  FROM corners
  WHERE w > 0 AND i BETWEEN 0 AND {n - 1} AND j BETWEEN 0 AND {n - 1}
    AND (i * j) % 7 <> 0
)
SELECT out_x, out_y, ROUND(SUM(w * val) / SUM(w), 4) AS val
FROM valid
GROUP BY out_x, out_y
ORDER BY out_y, out_x
"""


def _raster_warp_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 downsampling warp (gdalwarp -r average parity): every source
    center forward-maps through the closed-form Mercator leg into its
    target cell and non-NULL contributors mean per cell — one map-side-
    combined groupBy, no join, no target lattice."""
    from sids_data_pipeline_spark.sources.raster import synthetic_raster, warp_to_grid

    px = synthetic_raster(spark, "rast_nodata")
    out = warp_to_grid(
        px,
        src_epsg=4326,
        dst_epsg=3857,
        src_origin=(0.0, 0.0),
        src_res=(PIXEL_DEG, PIXEL_DEG),
        dst_origin=(0.0, 0.0),
        dst_res=(_WARP_RES, _WARP_RES),
        dst_size=(_WARP_N, _WARP_N),
        resampling="average",
    )
    return out.select(
        "out_x", "out_y", F.round("val", 4).alias("val")
    ).orderBy("out_y", "out_x")


def _raster_warp_average_sql() -> str:
    n = GRID_N
    return f"""
WITH src AS (
  SELECT CAST(i % {n} AS INT) AS x, CAST(i // {n} AS INT) AS y,
         CASE WHEN ((i % {n}) * (i // {n})) % 7 = 0 THEN NULL
              ELSE CAST(i AS DOUBLE) END AS val
  FROM (SELECT unnest(range({n * n})) AS i) t
), fwd AS (
  SELECT radians((x + 0.5) * {PIXEL_DEG}) * 6378137.0 AS xd,
         ln(tan(pi() / 4.0 + radians((y + 0.5) * {PIXEL_DEG}) / 2.0))
           * 6378137.0 AS yd,
         val
  FROM src WHERE val IS NOT NULL
), cells AS (
  SELECT CAST(floor(xd / {_WARP_RES}) AS INT) AS out_x,
         CAST(floor(yd / {_WARP_RES}) AS INT) AS out_y, val
  FROM fwd
)
SELECT out_x, out_y, ROUND(AVG(val), 4) AS val
FROM cells
WHERE out_x BETWEEN 0 AND {_WARP_N - 1} AND out_y BETWEEN 0 AND {_WARP_N - 1}
GROUP BY out_x, out_y
ORDER BY out_y, out_x
"""


def _raster_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaladdo -r average parity: 3 overview levels of the nodata
    fixture in ONE map-side-combined groupBy (explode onto (level, block)
    keys); NULL pixels drop out of the block mean and n_px audits the
    contributor count."""
    from sids_data_pipeline_spark.operators.terrain import build_overviews
    from sids_data_pipeline_spark.sources.raster import synthetic_raster

    out = build_overviews(synthetic_raster(spark, "rast_nodata"), levels=3)
    return out.select(
        "level", "x", "y", F.round("val", 9).alias("val"), "n_px"
    ).orderBy("level", "y", "x")


def _raster_pyramid_sql() -> str:
    n = GRID_N
    return f"""
WITH src AS (
  SELECT CAST(i % {n} AS INT) AS x, CAST(i // {n} AS INT) AS y,
         CASE WHEN ((i % {n}) * (i // {n})) % 7 = 0 THEN NULL
              ELSE CAST(i AS DOUBLE) END AS val
  FROM (SELECT unnest(range({n * n})) AS i) t
), lv AS (SELECT unnest(range(1, 4)) AS level)
SELECT CAST(level AS INT) AS level,
       CAST(x >> level AS INT) AS x,
       CAST(y >> level AS INT) AS y,
       ROUND(AVG(val), 9) AS val,
       COUNT(val) AS n_px
FROM src CROSS JOIN lv
WHERE val IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY 1, 3, 2
"""


def _raster_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaldem hillshade parity (Horn 1981, az 315° / alt 45°) on a
    quadratic test surface: 9-neighbor explode + one integer-key groupBy
    reassembles each full 3×3 window; the oracle recomputes the window
    algebra in pure scalar SQL (the surface is a closed form, so every
    neighbour value is an expression, no join)."""
    from sids_data_pipeline_spark.operators.terrain import hillshade

    n = GRID_N
    quad = spark.range(0, n * n, 1, 8).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    ).withColumn(
        "val",
        (F.col("x") * F.col("x") + 2 * F.col("y") * F.col("y")
         + F.col("x") * F.col("y")).cast("double") / 16.0,
    )
    out = hillshade(quad, cellsize=30.0)
    return out.select(
        "x", "y", F.round("hillshade", 4).alias("hillshade")
    ).orderBy("y", "x")


def _raster_hillshade_sql() -> str:
    n = GRID_N

    def v(i: str, j: str) -> str:
        return f"((({i})*({i}) + 2.0*({j})*({j}) + ({i})*({j})) / 16.0)"

    a, b, c = v("x-1", "y+1"), v("x", "y+1"), v("x+1", "y+1")
    d, f_ = v("x-1", "y"), v("x+1", "y")
    g, h, i_ = v("x-1", "y-1"), v("x", "y-1"), v("x+1", "y-1")
    return f"""
WITH cells AS (
  SELECT CAST(i % {n} AS INT) AS x, CAST(i // {n} AS INT) AS y
  FROM (SELECT unnest(range({n * n})) AS i) t
  WHERE i % {n} BETWEEN 1 AND {n - 2} AND i // {n} BETWEEN 1 AND {n - 2}
), deriv AS (
  SELECT x, y,
    ((({c}) + 2.0*({f_}) + ({i_})) - (({a}) + 2.0*({d}) + ({g}))) / 240.0 AS p,
    ((({a}) + 2.0*({b}) + ({c})) - (({g}) + 2.0*({h}) + ({i_}))) / 240.0 AS q
  FROM cells
)
SELECT x, y,
  ROUND(GREATEST(255.0 * (
      cos(radians(45.0)) * cos(atan(sqrt(p*p + q*q)))
    + sin(radians(45.0)) * sin(atan(sqrt(p*p + q*q)))
      * cos(radians(315.0) - atan2(-p, -q))
  ), 0.0), 4) AS hillshade
FROM deriv
ORDER BY y, x
"""


def _raster_pyramid_estate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estate-capable overview path: TWO fixture rasters pyramid in the
    SAME single shuffle via group_cols=('raster_id',) — blocks never mix
    rasters; the oracle unions the two closed-form per-raster pyramids."""
    from sids_data_pipeline_spark.operators.terrain import build_overviews
    from sids_data_pipeline_spark.sources.raster import synthetic_raster

    estate = synthetic_raster(spark, "rast_nodata").unionByName(
        synthetic_raster(spark, "rast_checker")
    )
    out = build_overviews(estate, levels=2, group_cols=("raster_id",))
    return out.select(
        "raster_id", "level", "x", "y",
        F.round("val", 9).alias("val"), "n_px",
    ).orderBy("raster_id", "level", "y", "x")


def _raster_pyramid_estate_sql() -> str:
    n = GRID_N
    arms = []
    for rid in ("rast_nodata", "rast_checker"):
        arms.append(f"""
SELECT '{rid}' AS raster_id, CAST(level AS INT) AS level,
       CAST(x >> level AS INT) AS x, CAST(y >> level AS INT) AS y,
       ROUND(AVG(val), 9) AS val, COUNT(val) AS n_px
FROM (
  SELECT CAST(i % {n} AS INT) AS x, CAST(i // {n} AS INT) AS y,
         {_VAL_SQL[rid]} AS val
  FROM (SELECT unnest(range({n * n})) AS i) t
) src CROSS JOIN (SELECT unnest(range(1, 3)) AS level) lv
WHERE val IS NOT NULL
GROUP BY 1, 2, 3, 4""")
    return (
        "SELECT * FROM ("
        + "\nUNION ALL\n".join(arms)
        + ") ORDER BY raster_id, level, y, x"
    )


# Sieve-fill fixture: the clump blocks lattice plus a 2-px val-9 speckle
# inside block (0,0) and a 1-px val-9 speckle inside block (4,4) — after
# sieve(fill=True, min_size=5) every speckle must take its surrounding
# block's value, so the expected output is the PLAIN holed block lattice.
_SPECKLES = ((1, 1), (2, 1), (18, 18))


def _raster_sieve_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_sieve fill semantics, driver-gated: speckles of a foreign
    value inside large blocks must merge into the surrounding block
    (clump → adjacency join → largest-neighbour argmax); the oracle is
    the speckle-free closed-form lattice the fill must reproduce."""
    from sids_data_pipeline_spark.operators.terrain import sieve

    n = 32
    is_speckle = None
    for sx, sy in _SPECKLES:
        c = (F.col("x") == sx) & (F.col("y") == sy)
        is_speckle = c if is_speckle is None else (is_speckle | c)
    px = spark.range(0, n * n, 1, 8).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    ).withColumn(
        "val",
        F.when(
            ((F.col("x") % 4) == 1) & ((F.col("y") % 4) == 2),
            F.lit(None).cast("double"),
        )
        .when(is_speckle, F.lit(9.0))
        .otherwise(
            ((F.col("x") / 4).cast("int") + (F.col("y") / 4).cast("int"))
            .cast("double") % 3
        ),
    )
    return sieve(px, min_size=5, fill=True).orderBy("y", "x")


def _raster_sieve_fill_sql() -> str:
    n = 32
    return f"""
SELECT CAST(i % {n} AS INT) AS x,
       CAST(i // {n} AS INT) AS y,
       CASE WHEN (i % {n}) % 4 = 1 AND (i // {n}) % 4 = 2 THEN NULL
            ELSE CAST(((i % {n}) // 4 + (i // {n}) // 4) % 3 AS DOUBLE)
       END AS val
FROM (SELECT unnest(range({n * n})) AS i) t
ORDER BY y, x
"""


def _geo_dwithin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_DWithin parity: all point pairs within 150 km, via lat/lon
    grid buckets + 3×3 neighbourhood explode + exact haversine refine —
    the oracle brute-forces the cross join (trivially fine for DuckDB at
    fixture scale, the shape the engine must NOT use). Points 300-303
    are planted ANTIMERIDIAN pairs (lon ±179.9): the wrapped longitude
    buckets must pair them exactly like the haversine (which is
    inherently wrap-correct in sin²(Δλ/2)) says they pair."""
    from sids_data_pipeline_spark.functions.crs import dwithin_join

    def pts(n: int, dlat: float, dlon: float):
        base = spark.range(0, n, 1, 8).select(
            F.col("id"),
            ((F.col("id") * 37) % 110 - 55 + 0.25 + dlat)
            .cast("double").alias("lat"),
            ((F.col("id") * 73) % 358 - 179 + 0.5 + dlon)
            .cast("double").alias("lon"),
        )
        seam = spark.createDataFrame(
            [
                (n + 0, 52.0 + dlat, 179.9),
                (n + 1, 52.2 + dlat, -179.95),
                (n + 2, -30.5 + dlat, -179.99),
                (n + 3, -30.4 + dlat, 179.85),
            ],
            "id long, lat double, lon double",
        )
        return base.unionByName(seam)

    # B = A shifted by (1.2°, 0.7°): the diagonal pair distance CROSSES
    # the 150 km radius as |lat| grows (lon degrees shrink), so inclusion
    # is latitude-dependent — a wrong bucket or refine flips real rows
    out = dwithin_join(pts(300, 0.0, 0.0), pts(300, 1.2, 0.7),
                       radius_m=150_000.0)
    return out.select(
        F.col("id").alias("id_l"),
        F.col("id_r"),
        F.round("dist_m", 3).alias("dist_m"),
    ).orderBy("id_l", "id_r")


def _geo_dwithin_sql() -> str:
    hav = (
        "2.0 * 6371008.8 * asin(sqrt("
        "sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)"
        " + cos(radians(a.lat)) * cos(radians(b.lat))"
        " * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)))"
    )
    return f"""
WITH a AS (
  SELECT i AS id,
         CAST((i * 37) % 110 - 55 + 0.25 + 0.0 AS DOUBLE) AS lat,
         CAST((i * 73) % 358 - 179 + 0.5 + 0.0 AS DOUBLE) AS lon
  FROM (SELECT unnest(range(300)) AS i) t
  UNION ALL
  SELECT * FROM (VALUES
    (300, CAST(52.0 AS DOUBLE), CAST(179.9 AS DOUBLE)),
    (301, CAST(52.2 AS DOUBLE), CAST(-179.95 AS DOUBLE)),
    (302, CAST(-30.5 AS DOUBLE), CAST(-179.99 AS DOUBLE)),
    (303, CAST(-30.4 AS DOUBLE), CAST(179.85 AS DOUBLE))
  ) s(id, lat, lon)
), b AS (
  SELECT i AS id,
         CAST((i * 37) % 110 - 55 + 0.25 + 1.2 AS DOUBLE) AS lat,
         CAST((i * 73) % 358 - 179 + 0.5 + 0.7 AS DOUBLE) AS lon
  FROM (SELECT unnest(range(300)) AS i) t
  UNION ALL
  SELECT * FROM (VALUES
    (300, CAST(53.2 AS DOUBLE), CAST(179.9 AS DOUBLE)),
    (301, CAST(53.4 AS DOUBLE), CAST(-179.95 AS DOUBLE)),
    (302, CAST(-29.3 AS DOUBLE), CAST(-179.99 AS DOUBLE)),
    (303, CAST(-29.2 AS DOUBLE), CAST(179.85 AS DOUBLE))
  ) s(id, lat, lon)
)
SELECT a.id AS id_l, b.id AS id_r, ROUND({hav}, 3) AS dist_m
FROM a CROSS JOIN b
WHERE {hav} <= 150000.0
ORDER BY id_l, id_r
"""


def _raster_clump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRASS r.clump / gdal_sieve grouping parity: 4-connected equal-value
    regions via one integer-key neighbour join + the Pregel min-label loop.
    Fixture: 32×32 three-coloured 4×4 blocks (neighbouring blocks always
    differ mod 3, so every block is exactly one region) with a NULL hole
    per block — the oracle knows each region's min packed id in closed
    form, while the engine has to EARN it through real edge propagation."""
    from sids_data_pipeline_spark.operators.terrain import clump_regions

    n = 32
    px = spark.range(0, n * n, 1, 8).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    ).withColumn(
        "val",
        F.when(
            ((F.col("x") % 4) == 1) & ((F.col("y") % 4) == 2),
            F.lit(None).cast("double"),
        ).otherwise(
            ((F.col("x") / 4).cast("int") + (F.col("y") / 4).cast("int"))
            .cast("double") % 3
        ),
    )
    return clump_regions(px).orderBy("y", "x")


def _raster_clump_sql() -> str:
    n = 32
    return f"""
SELECT CAST(i % {n} AS INT) AS x,
       CAST(i // {n} AS INT) AS y,
       CAST(((i % {n}) // 4 + (i // {n}) // 4) % 3 AS DOUBLE) AS val,
       (4 * ((i // {n}) // 4)) * 4294967296 + 4 * ((i % {n}) // 4) AS region
FROM (SELECT unnest(range({n * n})) AS i) t
WHERE NOT ((i % {n}) % 4 = 1 AND (i // {n}) % 4 = 2)
ORDER BY y, x
"""


def _raster_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_rasterize parity (center rule, highest-fid-wins on overlap)
    on the OVERLAP fixture — two overlapping boxes, a sub-pixel box that
    must burn nothing, and the holed triangle exercising the ray-cast
    refine; the oracle recomputes containment per zone from the same WKB
    via the edge-term predicate generator and takes MAX(fid)."""
    from sids_data_pipeline_spark.sources.raster import rasterize

    zones = fixture_zones(spark, "zones_overlap")
    out = rasterize(
        zones,
        origin=(0.0, 0.0),
        res=(PIXEL_DEG, PIXEL_DEG),
        size=(GRID_N, GRID_N),
    )
    return out.orderBy("y", "x")


def _raster_burn_sql() -> str:
    n = GRID_N
    arms = []
    for fid, _name, wkb in FIXTURE_BUILDERS["zones_overlap"]():
        arms.append(
            f"SELECT x, y, CAST({fid} AS BIGINT) AS fid FROM px "
            f"WHERE {o_contains(wkb)}"
        )
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH px AS (
  SELECT CAST(i % {n} AS INT) AS x, CAST(i // {n} AS INT) AS y,
         (i % {n} + 0.5) * {PIXEL_DEG} AS lon,
         (i // {n} + 0.5) * {PIXEL_DEG} AS lat
  FROM (SELECT unnest(range({n * n})) AS i) t
), hits AS (
{body}
)
SELECT x, y, MAX(fid) AS burn
FROM hits
GROUP BY x, y
ORDER BY y, x
"""


def _raster_slope_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaldem slope + aspect on the quadratic surface: same Horn window
    reassembly as hillshade, aspect in the steepest-descent convention
    (clockwise from north, flat → NULL)."""
    from sids_data_pipeline_spark.operators.terrain import slope_aspect

    n = GRID_N
    quad = spark.range(0, n * n, 1, 8).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    ).withColumn(
        "val",
        (F.col("x") * F.col("x") + 2 * F.col("y") * F.col("y")
         + F.col("x") * F.col("y")).cast("double") / 16.0,
    )
    out = slope_aspect(quad, cellsize=30.0)
    return out.select(
        "x", "y",
        F.round("slope_deg", 4).alias("slope_deg"),
        F.round("aspect_deg", 4).alias("aspect_deg"),
    ).orderBy("y", "x")


def _raster_slope_aspect_sql() -> str:
    n = GRID_N

    def v(i: str, j: str) -> str:
        return f"((({i})*({i}) + 2.0*({j})*({j}) + ({i})*({j})) / 16.0)"

    a, b, c = v("x-1", "y+1"), v("x", "y+1"), v("x+1", "y+1")
    d, f_ = v("x-1", "y"), v("x+1", "y")
    g, h, i_ = v("x-1", "y-1"), v("x", "y-1"), v("x+1", "y-1")
    return f"""
WITH cells AS (
  SELECT CAST(i % {n} AS INT) AS x, CAST(i // {n} AS INT) AS y
  FROM (SELECT unnest(range({n * n})) AS i) t
  WHERE i % {n} BETWEEN 1 AND {n - 2} AND i // {n} BETWEEN 1 AND {n - 2}
), deriv AS (
  SELECT x, y,
    ((({c}) + 2.0*({f_}) + ({i_})) - (({a}) + 2.0*({d}) + ({g}))) / 240.0 AS p,
    ((({a}) + 2.0*({b}) + ({c})) - (({g}) + 2.0*({h}) + ({i_}))) / 240.0 AS q
  FROM cells
), ang AS (
  SELECT x, y,
    degrees(atan(sqrt(p*p + q*q))) AS slope_deg,
    CASE WHEN p = 0 AND q = 0 THEN NULL
         ELSE CASE WHEN degrees(atan2(-p, -q)) < 0
                   THEN degrees(atan2(-p, -q)) + 360.0
                   ELSE degrees(atan2(-p, -q)) END
    END AS aspect_deg
  FROM deriv
)
SELECT x, y, ROUND(slope_deg, 4) AS slope_deg,
       ROUND(aspect_deg, 4) AS aspect_deg
FROM ang
ORDER BY y, x
"""


def _raster_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_proximity -maxdist parity: distance to the nearest target
    pixel (a 16-step lattice of seeds) within radius 6, via the 3×3
    bucket-neighbourhood equi-join; the oracle brute-forces the same
    distances over the 16 seeds (4096×16 rows — trivial for DuckDB,
    quadratic-impossible for the engine, which must use the buckets)."""
    from sids_data_pipeline_spark.operators.terrain import proximity
    from sids_data_pipeline_spark.sources.raster import synthetic_raster

    px = synthetic_raster(spark, "rast_gradient")
    out = proximity(
        px,
        target=(F.col("x") % 16 == 0) & (F.col("y") % 16 == 0),
        max_distance=6.0,
    )
    return out.select(
        "x", "y", F.round("dist", 9).alias("dist")
    ).orderBy("y", "x")


def _raster_proximity_sql() -> str:
    n = GRID_N
    return f"""
WITH px AS (
  SELECT CAST(i % {n} AS INT) AS x, CAST(i // {n} AS INT) AS y
  FROM (SELECT unnest(range({n * n})) AS i) t
), tg AS (
  SELECT 16 * a AS tx, 16 * b AS ty
  FROM (SELECT unnest(range(4)) AS a) ta
  CROSS JOIN (SELECT unnest(range(4)) AS b) tb
), d AS (
  SELECT x, y, MIN(sqrt((x - tx) * (x - tx) + (y - ty) * (y - ty))) AS dist
  FROM px CROSS JOIN tg
  GROUP BY x, y
)
SELECT x, y, ROUND(dist, 9) AS dist
FROM d
WHERE dist <= 6.0
ORDER BY y, x
"""


def _streaming_raster_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7's Structured Streaming ingest wrapper, end to end: a
    fresh landing directory gets the gradient fixture, one availableNow
    drain decodes it into PIXELS parquet through the SAME executor
    generator as the batch path, and the result verifies against the
    lattice oracle — streaming with a FULL value oracle, not rows-only,
    because availableNow over a static directory is deterministic."""
    import os
    import tempfile

    import numpy as np

    from sids_data_pipeline_spark.sources.geotiff import encode_geotiff
    from sids_data_pipeline_spark.streaming.jobs import streaming_raster_ingest

    # process-cached like _cached_fixture_dir: repeated catalog/gate/
    # bench invocations reuse ONE landing dir + checkpoint instead of
    # leaking a mkdtemp per run — and the re-drain is then the file
    # source's natural no-op (checkpoint already covers the fixture)
    work = _FIXTURE_TIFF_DIRS.get("stream")
    if work is None:
        work = tempfile.mkdtemp(prefix="sdp_stream_tif_")
        src = os.path.join(work, "in")
        os.makedirs(src)
        y, x = np.mgrid[0:GRID_N, 0:GRID_N]
        arr = (x + GRID_N * y + 3).astype("float64")
        with open(os.path.join(src, "rast_stream.tif"), "wb") as f:
            f.write(encode_geotiff(arr, 0.0, GRID_N * 0.1, 0.1,
                                   compress="zstd", tile=128))
        _FIXTURE_TIFF_DIRS["stream"] = work
    out = os.path.join(work, "pixels")
    streaming_raster_ingest(
        spark, os.path.join(work, "in"), out, os.path.join(work, "ckpt")
    )
    px = spark.read.parquet(out)
    return px.select(
        "raster_id", "band", "y", "x",
        F.round("lon", 9).alias("lon"),
        F.round("lat", 9).alias("lat"),
        "val",
    )


def _streaming_raster_sql() -> str:
    n = GRID_N
    return f"""
SELECT 'rast_stream' AS raster_id,
       1 AS band,
       CAST(i // {n} AS INT) AS y,
       CAST(i % {n} AS INT) AS x,
       ROUND((i % {n} + 0.5) * CAST(0.1 AS DOUBLE), 9) AS lon,
       ROUND({n} * CAST(0.1 AS DOUBLE) - (i // {n} + 0.5) * CAST(0.1 AS DOUBLE), 9)
         AS lat,
       CAST(i + 3 AS DOUBLE) AS val
FROM (SELECT unnest(range({n * n})) AS i) t
"""


def _geotiff_datasource_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 through the Spark 4 Python DataSource API: the codec as a
    planner-integrated format (`spark.read.format("geotiff")`), one
    source partition per file. Same lattice oracle as the mapInPandas
    ingest path — the two scan styles must be value-identical (they now
    literally read the same cached fixture bytes)."""
    from sids_data_pipeline_spark.sources.geotiff_datasource import register

    register(spark)
    px = (
        spark.read.format("geotiff")
        .option("band", "1")
        .load(_fixture_geotiff_dir() + "/*.tif")
    )
    return px.select(
        "raster_id", "band", "y", "x",
        F.round("lon", 9).alias("lon"),
        F.round("lat", 9).alias("lat"),
        "val",
    )


def _multiband_band2_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 band selection on a foreign multi-band GeoTIFF: 3 planar bands,
    ingest band 2 only (``gdal_translate -b 2``, reference
    batch/processing/raster.py:34) — the selection happens at decode
    time, before any pixel rows materialize."""
    from sids_data_pipeline_spark.sources.geotiff import ingest_geotiff

    px = ingest_geotiff(spark, _fixture_multiband_dir() + "/*.tif", band=2)
    return px.select(
        "raster_id", "band", "y", "x",
        F.round("lon", 9).alias("lon"),
        F.round("lat", 9).alias("lat"),
        "val",
    )


def _multiband_band2_sql() -> str:
    n = GRID_N
    return f"""
SELECT 'rast_rgb' AS raster_id,
       2 AS band,
       CAST(i // {n} AS INT) AS y,
       CAST(i % {n} AS INT) AS x,
       ROUND((i % {n} + 0.5) * CAST(0.1 AS DOUBLE), 9) AS lon,
       ROUND({n} * CAST(0.1 AS DOUBLE) - (i // {n} + 0.5) * CAST(0.1 AS DOUBLE), 9)
         AS lat,
       CAST(200000 + i AS DOUBLE) AS val
FROM (SELECT unnest(range({n * n})) AS i) t
"""


def _geotiff_ingest_sql() -> str:
    n = GRID_N
    return f"""
SELECT 'rast_gradient' AS raster_id,
       1 AS band,
       CAST(i // {n} AS INT) AS y,
       CAST(i % {n} AS INT) AS x,
       ROUND((i % {n} + 0.5) * CAST(0.1 AS DOUBLE), 9) AS lon,
       ROUND({n} * CAST(0.1 AS DOUBLE) - (i // {n} + 0.5) * CAST(0.1 AS DOUBLE), 9)
         AS lat,
       CAST(i AS DOUBLE) AS val
FROM (SELECT unnest(range({n * n})) AS i) t
"""


def _gpkg_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 end-to-end: write the zones fixture as a minimal valid
    GeoPackage (stdlib sqlite3 + GPB codec), ingest it back, and emit the
    parsed WKB as hex — byte-for-byte against the fixture VALUES."""
    import os
    import tempfile

    from sids_data_pipeline_spark.sources.geopackage import (
        ingest_geopackage,
        write_geopackage,
    )

    work = tempfile.mkdtemp(prefix="sdp_gpkg_")
    path = os.path.join(work, "zones.gpkg")
    write_geopackage(list(FIXTURE_BUILDERS["zones_grid"]()), path)
    zones = ingest_geopackage(spark, path, vector_id="zones_grid")
    return zones.select(
        "vector_id", "fid", "name", F.lower(F.hex("geometry")).alias("wkb_hex")
    )


def _gpkg_ingest_sql() -> str:
    values = ",\n  ".join(
        f"('zones_grid', {fid}, '{name}', '{wkb.hex()}')"
        for fid, name, wkb in FIXTURE_BUILDERS["zones_grid"]()
    )
    return f"""
SELECT * FROM (VALUES
  {values}
) AS t(vector_id, fid, name, wkb_hex)
"""


def _shapefile_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 end-to-end: write BOTH zone fixtures (rectangles + the holed
    triangle + overlapping polygons) as a spec-compliant shapefile set
    (.shp/.shx/.dbf/.prj/.cpg, pure stdlib+numpy), ingest it back through
    the ogr2ogr-parity reader, and emit the WKB as hex. The oracle VALUES
    are the driver-side winding-canonicalisation twin of the same
    fixtures — the Spark path must reproduce them byte-for-byte through
    the .shp winding round trip (OGC CCW → spec CW → OGC CCW)."""
    import os
    import tempfile

    from sids_data_pipeline_spark.sources.shapefile import (
        ingest_shapefile,
        write_shapefile,
    )

    work = tempfile.mkdtemp(prefix="sdp_shp_")
    path = os.path.join(work, "zones.shp")
    write_shapefile(_shapefile_fixture_records(), path)
    zones = ingest_shapefile(spark, path, vector_id="zones_shp")
    return zones.select(
        "vector_id", "fid", "name", F.lower(F.hex("geometry")).alias("wkb_hex")
    )


def _shapefile_fixture_records() -> list[tuple[int, str, bytes]]:
    grid = list(FIXTURE_BUILDERS["zones_grid"]())
    overlap = list(FIXTURE_BUILDERS["zones_overlap"]())
    return grid + [(fid + 10, name, wkb) for fid, name, wkb in overlap]


def _shapefile_ingest_sql() -> str:
    from sids_data_pipeline_spark.sources.shapefile import (
        canonicalize_wkb_winding,
    )

    values = ",\n  ".join(
        f"('zones_shp', {i}, '{name}', "
        f"'{canonicalize_wkb_winding(wkb).hex()}')"
        for i, (_fid, name, wkb) in enumerate(_shapefile_fixture_records())
    )
    return f"""
SELECT * FROM (VALUES
  {values}
) AS t(vector_id, fid, name, wkb_hex)
"""


def _streaming_vector_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The S4 ingest THROUGH the streaming drop-folder path: the fixture
    shapefile lands in a watched directory, Trigger.AvailableNow drains
    it into the zones ledger, and the ledger must be byte-identical to
    the batch ingest (same oracle VALUES as vector_shapefile_ingest —
    the two paths share the parser, and this entry pins that they
    cannot drift)."""
    import os
    import tempfile

    from sids_data_pipeline_spark.sources.shapefile import write_shapefile
    from sids_data_pipeline_spark.streaming.jobs import streaming_vector_ingest

    work = tempfile.mkdtemp(prefix="sdp_svec_")
    drop = os.path.join(work, "drop")
    os.makedirs(drop)
    write_shapefile(_shapefile_fixture_records(), os.path.join(drop, "zones_shp.shp"))
    out = os.path.join(work, "zones")
    streaming_vector_ingest(
        spark, drop + "/*", out, os.path.join(work, "ckpt")
    )
    zones = spark.read.parquet(out).select(
        "vector_id", "fid", "name", F.lower(F.hex("geometry")).alias("wkb_hex")
    )
    return zones.orderBy("fid")


def _csv_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/K6 end-to-end: region → header CSV (sharded) → schema-pinned
    scan back. The oracle is the region table itself — the round-trip
    must be lossless."""
    import os
    import tempfile

    from sids_data_pipeline_spark.sinks.csvio import read_csv, write_csv
    from sids_data_pipeline_spark.sources.tables import load_table

    region = load_table(spark, "region", sf_dir)
    work = os.path.join(tempfile.mkdtemp(prefix="sdp_csv_"), "region")
    write_csv(region, work)
    return read_csv(spark, work, region.schema)


_CSV_ROUNDTRIP_SQL = "SELECT * FROM region"


def _json_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7: JSON-lines sink → schema-pinned scan, lossless vs nation."""
    import os
    import tempfile

    from sids_data_pipeline_spark.sinks.csvio import read_json, write_json
    from sids_data_pipeline_spark.sources.tables import load_table

    nation = load_table(spark, "nation", sf_dir)
    work = os.path.join(tempfile.mkdtemp(prefix="sdp_json_"), "nation")
    write_json(nation, work)
    return read_json(spark, work, nation.schema)


_JSON_ROUNDTRIP_SQL = "SELECT * FROM nation"


def _orc_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second columnar format: supplier → ZSTD ORC → schema-pinned scan
    back. Lossless vs the parquet table (the oracle) — numbers,
    timestamps, and strings survive the format change bit-for-bit."""
    import os
    import tempfile

    from sids_data_pipeline_spark.sinks.orcio import read_orc, write_orc
    from sids_data_pipeline_spark.sources.tables import load_table

    supplier = load_table(spark, "supplier", sf_dir)
    work = os.path.join(tempfile.mkdtemp(prefix="sdp_orc_"), "supplier")
    write_orc(supplier, work)
    return read_orc(spark, work, supplier.schema)


_ORC_ROUNDTRIP_SQL = "SELECT * FROM supplier"


def _geojsonl_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 end-to-end: zones fixture → GeoJSONL text shards → read back,
    extracting the properties. Geometry json survives (checked by pytest
    against the WKB parse); the gate verifies the property payload."""
    import os
    import tempfile

    from sids_data_pipeline_spark.sinks.geojsonl import read_geojsonl, write_geojsonl

    zones = fixture_zones(spark, "zones_grid")
    work = os.path.join(tempfile.mkdtemp(prefix="sdp_gjl_"), "zones")
    write_geojsonl(zones, work, property_cols=("fid", "name"))
    back = read_geojsonl(spark, work)
    return back.select(
        F.get_json_object("properties_json", "$.fid").cast("long").alias("fid"),
        F.get_json_object("properties_json", "$.name").alias("name"),
        F.length("geometry_json").cast("long").alias("geometry_json_len"),
    )


def _geojsonl_sql() -> str:
    """Expected rows computed once from the same fixture the engine
    exports: property values verbatim, geometry length from the identical
    json encoding the sink's UDF produces."""
    import json

    rows = []
    for fid, name, wkb in FIXTURE_BUILDERS["zones_grid"]():
        # the SAME encoder the sink's UDF serializes through — oracle and
        # sink stay coupled by construction, not by a hand-kept copy
        gj = json.dumps(
            geo.wkb_to_geojson_geometry(wkb),
            separators=(",", ":"),
            sort_keys=True,  # the sink serializes features with sort_keys
        )
        rows.append(f"({fid}, '{name}', {len(gj)})")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(fid, name, geometry_json_len)"
    )


# --- CRS reprojection, UTM pair (P9/F8) ---------------------------------------


def _crs_reproject_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326 → UTM 33N forward, then inverse back — both legs of the
    closed-form transverse Mercator (reference warps arbitrary EPSG →
    4326, batch/processing/raster.py:22-29)."""
    from sids_data_pipeline_spark.functions.crs import lonlat_to_utm, utm_to_lonlat

    grid = spark.range(0, 1000, 1, 8).select(
        F.col("id"),
        (F.lit(12.1) + (F.col("id") % 40).cast("double") * 0.145).alias("lon"),
        ((F.col("id") / 40).cast("long").cast("double") * 5.6 - 68.0).alias("lat"),
    )
    e, n = lonlat_to_utm(F.col("lon"), F.col("lat"), zone=33)
    utm = grid.select("id", e.alias("easting"), n.alias("northing"))
    lon2, lat2 = utm_to_lonlat(F.col("easting"), F.col("northing"), zone=33)
    # 3 dp on metres (≈1 µm) / 9 dp on degrees (≈0.1 mm): far beyond any
    # Java-vs-C libm last-ULP divergence, far below series truncation.
    return utm.select(
        "id",
        F.round("easting", 3).alias("easting"),
        F.round("northing", 3).alias("northing"),
        F.round(lon2, 9).alias("lon_rt"),
        F.round(lat2, 9).alias("lat_rt"),
    )


def _crs_utm_sql() -> str:
    """DuckDB oracle generated from the SAME coefficient doubles as
    functions/crs.py (repr() is shortest-roundtrip, so both engines parse
    bit-identical literals); formula structure mirrors the Column
    expressions term-for-term."""
    import math

    from sids_data_pipeline_spark.functions import crs as c

    lam0 = math.radians(33 * 6 - 183)  # zone 33 central meridian
    mu_den = c.UTM_K0 * c.UTM_A * c._M0
    r1_num = c.UTM_A * (1.0 - c._E2)
    return f"""
WITH src AS (
  SELECT i AS id,
         12.1 + CAST(i % 40 AS DOUBLE) * 0.145 AS lon,
         CAST(i // 40 AS DOUBLE) * 5.6 - 68.0 AS lat
  FROM (SELECT unnest(range(1000)) AS i) t
),
f1 AS (
  SELECT id, radians(lat) AS phi, radians(lon) - {lam0!r} AS dlam FROM src
),
f2 AS (
  SELECT id, phi, sin(phi) AS sinp, cos(phi) AS cosp, tan(phi) AS tanp, dlam
  FROM f1
),
f3 AS (
  SELECT id, phi, tanp,
         {c.UTM_A!r} / sqrt(1.0 - {c._E2!r} * sinp * sinp) AS n,
         tanp * tanp AS t,
         {c._EP2!r} * cosp * cosp AS cc,
         dlam * cosp AS aa,
         {c.UTM_A!r} * ({c._M0!r} * phi - {c._M2!r} * sin(phi * 2.0)
                        + {c._M4!r} * sin(phi * 4.0)
                        - {c._M6!r} * sin(phi * 6.0)) AS m
  FROM f2
),
fwd AS (
  SELECT id,
         {c.UTM_FALSE_EASTING!r} + {c.UTM_K0!r} * n *
           (aa + (1.0 - t + cc) * pow(aa, 3) / 6.0
               + (5.0 - t * 18.0 + t * t + cc * 72.0 - {58.0 * c._EP2!r})
                 * pow(aa, 5) / 120.0) AS easting,
         {c.UTM_K0!r} * (m + n * tanp *
           (aa * aa / 2.0
            + (5.0 - t + cc * 9.0 + cc * cc * 4.0) * pow(aa, 4) / 24.0
            + (61.0 - t * 58.0 + t * t + cc * 600.0 - {330.0 * c._EP2!r})
              * pow(aa, 6) / 720.0)) AS northing
  FROM f3
),
i1 AS (
  SELECT id, easting, northing,
         easting - {c.UTM_FALSE_EASTING!r} AS x,
         northing / {mu_den!r} AS mu
  FROM fwd
),
i2 AS (
  SELECT id, easting, northing, x,
         mu + {c._P2!r} * sin(mu * 2.0) + {c._P4!r} * sin(mu * 4.0)
            + {c._P6!r} * sin(mu * 6.0) + {c._P8!r} * sin(mu * 8.0) AS phi1
  FROM i1
),
i3 AS (
  SELECT id, easting, northing, x, phi1,
         sin(phi1) AS sin1, cos(phi1) AS cos1, tan(phi1) AS tan1
  FROM i2
),
i4 AS (
  SELECT id, easting, northing, x, phi1, cos1, tan1,
         {c._EP2!r} * cos1 * cos1 AS c1,
         tan1 * tan1 AS t1,
         1.0 - {c._E2!r} * sin1 * sin1 AS om
  FROM i3
),
i5 AS (
  SELECT id, easting, northing, phi1, cos1, tan1, c1, t1,
         {c.UTM_A!r} / sqrt(om) AS n1,
         {r1_num!r} / pow(om, 1.5) AS r1,
         x / (({c.UTM_A!r} / sqrt(om)) * {c.UTM_K0!r}) AS d
  FROM i4
),
inv AS (
  SELECT id, easting, northing,
         degrees(phi1 - (n1 * tan1 / r1) *
           (d * d / 2.0
            - (5.0 + t1 * 3.0 + c1 * 10.0 - c1 * c1 * 4.0 - {9.0 * c._EP2!r})
              * pow(d, 4) / 24.0
            + (61.0 + t1 * 90.0 + c1 * 298.0 + t1 * t1 * 45.0
               - {252.0 * c._EP2!r} - c1 * c1 * 3.0)
              * pow(d, 6) / 720.0)) AS lat_rt,
         degrees({lam0!r} +
           (d - (1.0 + t1 * 2.0 + c1) * pow(d, 3) / 6.0
              + (5.0 - c1 * 2.0 + t1 * 28.0 - c1 * c1 * 3.0
                 + {8.0 * c._EP2!r} + t1 * t1 * 24.0)
                * pow(d, 5) / 120.0) / cos1) AS lon_rt
  FROM i5
)
SELECT id, ROUND(easting, 3) AS easting, ROUND(northing, 3) AS northing,
       ROUND(lon_rt, 9) AS lon_rt, ROUND(lat_rt, 9) AS lat_rt
FROM inv
"""


def _crs_reproject_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326 → Lambert-93 (EPSG:2154) forward, then inverse back — the
    Lambert Conformal Conic closed form (Snyder §15), France-bounds grid."""
    from sids_data_pipeline_spark.functions.crs import reproject_pixels

    grid = spark.range(0, 1000, 1, 8).select(
        F.col("id"),
        (F.lit(-4.0) + (F.col("id") % 40).cast("double") * 0.3).alias("lon"),
        ((F.col("id") / 40).cast("long").cast("double") * 0.32 + 42.0).alias("lat"),
    )
    xy = reproject_pixels(grid, src_epsg=4326, dst_epsg=2154)
    xy = xy.select("id", F.col("lon").alias("x"), F.col("lat").alias("y"))
    back = reproject_pixels(
        xy.withColumnsRenamed({"x": "lon", "y": "lat"}), 2154, 4326
    )
    return (
        xy.join(back.withColumnsRenamed({"lon": "lon_rt", "lat": "lat_rt"}), "id")
        .select(
            "id",
            F.round("x", 3).alias("x"),
            F.round("y", 3).alias("y"),
            F.round("lon_rt", 9).alias("lon_rt"),
            F.round("lat_rt", 9).alias("lat_rt"),
        )
    )


def _crs_lcc_sql() -> str:
    """Mirror with constants derived once in Python (repr round-trips the
    exact doubles) and the latitude fixed-point unrolled as a CTE chain —
    same arithmetic per step, so values match the Column unroll."""
    import math

    from sids_data_pipeline_spark.functions.crs import LAMBERT93 as P
    from sids_data_pipeline_spark.functions.crs import LCC_INV_ITERS

    aF = P.a * P.F
    lam0 = math.radians(P.lon0)
    half_e = P.e / 2.0
    pi2 = math.pi / 2.0
    iters = "\n".join(
        f"i{k + 1} AS (\n"
        f"  SELECT id, x, y, tp, lon_rt,\n"
        f"         {pi2!r} - (atan(tp * pow((1.0 - {P.e!r} * sin(phi)) /"
        f" (1.0 + {P.e!r} * sin(phi)), {half_e!r})) * 2.0) AS phi\n"
        f"  FROM i{k}\n),"
        for k in range(LCC_INV_ITERS)
    )
    return f"""
WITH src AS (
  SELECT i AS id,
         -4.0 + CAST(i % 40 AS DOUBLE) * 0.3 AS lon,
         CAST(i // 40 AS DOUBLE) * 0.32 + 42.0 AS lat
  FROM (SELECT unnest(range(1000)) AS i) t
),
f1 AS (
  SELECT id, radians(lat) AS phi, radians(lon) AS lam FROM src
),
fwd AS (
  SELECT id,
         {P.fe!r} + ({aF!r} * pow(tan({math.pi / 4.0!r} - phi / 2.0) /
            pow((1.0 - {P.e!r} * sin(phi)) / (1.0 + {P.e!r} * sin(phi)),
                {half_e!r}), {P.n!r}))
           * sin({P.n!r} * (lam - {lam0!r})) AS x,
         {P.fn!r} + {P.rho0!r} - ({aF!r} * pow(tan({math.pi / 4.0!r} - phi / 2.0) /
            pow((1.0 - {P.e!r} * sin(phi)) / (1.0 + {P.e!r} * sin(phi)),
                {half_e!r}), {P.n!r}))
           * cos({P.n!r} * (lam - {lam0!r})) AS y
  FROM f1
),
inv0 AS (
  SELECT id, x, y,
         x - {P.fe!r} AS dx,
         {P.rho0!r} - (y - {P.fn!r}) AS dy
  FROM fwd
),
i0 AS (
  SELECT id, x, y,
         pow((1.0 * sqrt(dx * dx + dy * dy)) / {aF!r}, {1.0 / P.n!r}) AS tp,
         degrees(atan2(1.0 * dx, 1.0 * dy) / {P.n!r} + {lam0!r}) AS lon_rt,
         {pi2!r} - atan(pow((1.0 * sqrt(dx * dx + dy * dy)) / {aF!r},
                            {1.0 / P.n!r})) * 2.0 AS phi
  FROM inv0
),
{iters}
fin AS (SELECT id, x, y, lon_rt, degrees(phi) AS lat_rt FROM i{LCC_INV_ITERS})
SELECT id, ROUND(x, 3) AS x, ROUND(y, 3) AS y,
       ROUND(lon_rt, 9) AS lon_rt, ROUND(lat_rt, 9) AS lat_rt
FROM fin
"""


def _crs_reproject_albers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326 → EPSG:5070 (NAD83 / Conus Albers, Snyder §14) forward, then
    the closed-form authalic-series inverse back — CONUS-bounds grid.
    The forward leg is pinned to Snyder's published worked example in
    tests/test_crs.py; here the oracle mirrors every term."""
    from sids_data_pipeline_spark.functions.crs import reproject_pixels

    grid = spark.range(0, 1000, 1, 8).select(
        F.col("id"),
        (F.lit(-124.0) + (F.col("id") % 40).cast("double") * 1.45).alias("lon"),
        ((F.col("id") / 40).cast("long").cast("double") * 0.96 + 25.0).alias("lat"),
    )
    xy = reproject_pixels(grid, src_epsg=4326, dst_epsg=5070)
    xy = xy.select("id", F.col("lon").alias("x"), F.col("lat").alias("y"))
    back = reproject_pixels(
        xy.withColumnsRenamed({"x": "lon", "y": "lat"}), 5070, 4326
    )
    return (
        xy.join(back.withColumnsRenamed({"lon": "lon_rt", "lat": "lat_rt"}), "id")
        .select(
            "id",
            F.round("x", 3).alias("x"),
            F.round("y", 3).alias("y"),
            F.round("lon_rt", 9).alias("lon_rt"),
            F.round("lat_rt", 9).alias("lat_rt"),
        )
    )


def _crs_albers_sql() -> str:
    """Term-for-term mirror of AlbersEqualArea forward + series inverse;
    constants derive once from the SAME projection object (repr
    round-trips the exact doubles), so engine and oracle cannot
    desynchronize on parameters."""
    import math

    from sids_data_pipeline_spark.functions.crs import CONUS_ALBERS as P

    lam0 = math.radians(P.lon0)
    half_inv_e = 1.0 / (2.0 * P.e)
    one_m_e2 = 1.0 - P.e2
    sign = 1.0 if P.n >= 0 else -1.0
    return f"""
WITH src AS (
  SELECT i AS id,
         -124.0 + CAST(i % 40 AS DOUBLE) * 1.45 AS lon,
         CAST(i // 40 AS DOUBLE) * 0.96 + 25.0 AS lat
  FROM (SELECT unnest(range(1000)) AS i) t
),
f1 AS (
  SELECT id, radians(lat) AS phi, radians(lon) AS lam FROM src
),
fq AS (
  SELECT id, lam,
         {one_m_e2!r} * (sin(phi) / (1.0 - {P.e2!r} * sin(phi) * sin(phi))
           - {half_inv_e!r} * ln((1.0 - {P.e!r} * sin(phi))
                                 / (1.0 + {P.e!r} * sin(phi)))) AS qv
  FROM f1
),
fwd AS (
  SELECT id,
         {P.fe!r} + ({P.a!r} * sqrt({P.C!r} - {P.n!r} * qv) / {P.n!r})
           * sin({P.n!r} * (lam - {lam0!r})) AS x,
         {P.fn!r} + {P.rho0!r} - ({P.a!r} * sqrt({P.C!r} - {P.n!r} * qv) / {P.n!r})
           * cos({P.n!r} * (lam - {lam0!r})) AS y
  FROM fq
),
inv0 AS (
  SELECT id, x, y,
         x - {P.fe!r} AS dx,
         {P.rho0!r} - (y - {P.fn!r}) AS dy
  FROM fwd
),
i0 AS (
  SELECT id, x, y,
         ({P.C!r} - (({sign!r} * sqrt(dx * dx + dy * dy))
                     * ({sign!r} * sqrt(dx * dx + dy * dy)))
            * {P.n * P.n!r} / {P.a * P.a!r}) / {P.n!r} AS qv2,
         degrees(atan2({sign!r} * dx, {sign!r} * dy) / {P.n!r} + {lam0!r})
           AS lon_rt
  FROM inv0
),
ib AS (
  SELECT id, x, y, lon_rt,
         asin(greatest(-1.0, least(1.0, qv2 / {P.qp!r}))) AS beta
  FROM i0
),
fin AS (
  SELECT id, x, y, lon_rt,
         degrees(beta + {P.b2!r} * sin(beta * 2.0)
                      + {P.b4!r} * sin(beta * 4.0)
                      + {P.b6!r} * sin(beta * 6.0)) AS lat_rt
  FROM ib
)
SELECT id, ROUND(x, 3) AS x, ROUND(y, 3) AS y,
       ROUND(lon_rt, 9) AS lon_rt, ROUND(lat_rt, 9) AS lat_rt
FROM fin
"""


def _crs_reproject_polar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326 → EPSG:3413 (WGS-84 / NSIDC Sea Ice Polar Stereographic
    North, Snyder §21 / EPSG 9829 variant B) forward, then the
    conformal-series closed-form inverse back — pan-Arctic grid incl.
    antimeridian longitudes that exercise the [-180, 180) wrap. The
    forward leg is pinned to the EPSG Guidance 7-2 published worked
    example in tests/test_crs.py; here the oracle mirrors every term.

    Quantization note (round-8 driver red): the forward leg runs a
    fractional-exponent pow() whose cross-libm (JVM vs DuckDB) noise is
    ~1e-8 m — a 9-decimal ROUND on the round-trip degrees flips the last
    digit once in ~1e5 values and hash-mismatches despite identical math.
    The gate now checks the forward leg at a 1 m quantum (noise/quantum
    ≈ 1e-8, boundary risk ≈ 1e-5 over 2 000 values; a wrong projection
    would be off by km) and the round trip as an explicit tolerance
    boolean vs the SOURCE coordinates (|Δ| < 1e-6°, compared modulo 360°
    for the antimeridian column), which is ULP-insensitive by design."""
    from sids_data_pipeline_spark.functions.crs import reproject_pixels

    grid = spark.range(0, 1000, 1, 8).select(
        F.col("id"),
        (F.lit(-180.0) + (F.col("id") % 20).cast("double") * 18.0).alias("lon"),
        ((F.col("id") / 20).cast("long").cast("double") * 0.66 + 55.0).alias("lat"),
    )
    xy = reproject_pixels(grid, src_epsg=4326, dst_epsg=3413)
    xy = xy.select("id", F.col("lon").alias("x"), F.col("lat").alias("y"))
    back = reproject_pixels(
        xy.withColumnsRenamed({"x": "lon", "y": "lat"}), 3413, 4326
    )
    lon_d = F.abs(F.col("lon_rt") - F.col("lon"))
    return (
        grid.join(xy, "id")
        .join(back.withColumnsRenamed({"lon": "lon_rt", "lat": "lat_rt"}), "id")
        .select(
            "id",
            F.round("x", 0).alias("x"),
            F.round("y", 0).alias("y"),
            (F.least(lon_d, F.lit(360.0) - lon_d) < F.lit(1e-6)).alias("lon_ok"),
            (F.abs(F.col("lat_rt") - F.col("lat")) < F.lit(1e-6)).alias("lat_ok"),
        )
    )


def _crs_polar_sql() -> str:
    """Term-for-term mirror of PolarStereographic (north aspect) forward
    + conformal-series inverse; constants derive from the SAME projection
    object so engine and oracle cannot desynchronize on parameters."""
    import math

    from sids_data_pipeline_spark.functions.crs import NSIDC_NORTH as P

    lam0 = math.radians(P.lon0)
    pi = math.pi
    return f"""
WITH src AS (
  SELECT i AS id,
         -180.0 + CAST(i % 20 AS DOUBLE) * 18.0 AS lon,
         CAST(i // 20 AS DOUBLE) * 0.66 + 55.0 AS lat
  FROM (SELECT unnest(range(1000)) AS i) t
),
f1 AS (
  SELECT id, radians(lat) AS phi, radians(lon) AS lam FROM src
),
ft AS (
  SELECT id, lam,
         tan({pi / 4.0!r} - phi / 2.0)
           / pow((1.0 - {P.e!r} * sin(phi)) / (1.0 + {P.e!r} * sin(phi)),
                 {P.e / 2.0!r}) AS tv
  FROM f1
),
fwd AS (
  SELECT id,
         {P.fe!r} + ({P.k!r} * tv) * sin(lam - {lam0!r}) AS x,
         {P.fn!r} - ({P.k!r} * tv) * cos(lam - {lam0!r}) AS y
  FROM ft
),
inv0 AS (
  SELECT id, x, y, x - {P.fe!r} AS dx, {P.fn!r} - y AS dy FROM fwd
),
i0 AS (
  SELECT id, x, y, dx, dy,
         {pi / 2.0!r} - atan(sqrt(dx * dx + dy * dy) / {P.k!r}) * 2.0 AS chi
  FROM inv0
),
i1 AS (
  SELECT id, x, y,
         atan2(dx, dy) + {lam0!r} AS lam_raw,
         chi + {P.c2!r} * sin(chi * 2.0) + {P.c4!r} * sin(chi * 4.0)
             + {P.c6!r} * sin(chi * 6.0) + {P.c8!r} * sin(chi * 8.0) AS phi
  FROM i0
),
fin AS (
  SELECT id, x, y,
         degrees(lam_raw - {2.0 * pi!r}
                   * floor((lam_raw + {pi!r}) / {2.0 * pi!r})) AS lon_rt,
         degrees(phi) AS lat_rt
  FROM i1
)
SELECT f.id, ROUND(f.x, 0) AS x, ROUND(f.y, 0) AS y,
       least(abs(f.lon_rt - s.lon), 360.0 - abs(f.lon_rt - s.lon)) < 1e-6
         AS lon_ok,
       abs(f.lat_rt - s.lat) < 1e-6 AS lat_ok
FROM fin f JOIN src s USING (id)
"""


def _crs_reproject_tm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326 → EPSG:2193 (NZGD2000 / New Zealand Transverse Mercator,
    Snyder §8 / EPSG method 9807 with non-UTM parameters: lon0=173E,
    FE=1.6e6, FN=1e7) forward, then the footpoint-latitude series
    inverse back — the generalized national-grid TM family (OSGB 27700
    is the Helmert-shifted sibling, pinned to the OS + EPSG worked
    examples in tests/test_crs.py). Grid kept within ±3.3° of the CM
    where the low-order Redfearn series is sub-mm. Same ULP-insensitive
    gate as crs_reproject_polar: forward at a 1 m quantum, round trip
    as tolerance booleans vs the SOURCE coordinates."""
    from sids_data_pipeline_spark.functions.crs import reproject_pixels

    grid = spark.range(0, 1000, 1, 8).select(
        F.col("id"),
        (F.lit(169.7) + (F.col("id") % 20).cast("double") * 0.33).alias("lon"),
        (F.lit(-46.8) + (F.col("id") / 20).cast("long").cast("double") * 0.26).alias(
            "lat"
        ),
    )
    xy = reproject_pixels(grid, src_epsg=4326, dst_epsg=2193)
    xy = xy.select("id", F.col("lon").alias("x"), F.col("lat").alias("y"))
    back = reproject_pixels(
        xy.withColumnsRenamed({"x": "lon", "y": "lat"}), 2193, 4326
    )
    return (
        grid.join(xy, "id")
        .join(back.withColumnsRenamed({"lon": "lon_rt", "lat": "lat_rt"}), "id")
        .select(
            "id",
            F.round("x", 0).alias("x"),
            F.round("y", 0).alias("y"),
            (F.abs(F.col("lon_rt") - F.col("lon")) < F.lit(1e-6)).alias("lon_ok"),
            (F.abs(F.col("lat_rt") - F.col("lat")) < F.lit(1e-6)).alias("lat_ok"),
        )
    )


def _crs_tm_sql() -> str:
    """Term-for-term mirror of TransverseMercator.project/unproject with
    the NZTM2000 constants; every coefficient derives from the SAME
    projection object so engine and oracle cannot desynchronize."""
    src = """
  SELECT i AS id,
         169.7 + CAST(i % 20 AS DOUBLE) * 0.33 AS lon,
         -46.8 + CAST(i // 20 AS DOUBLE) * 0.26 AS lat
  FROM (SELECT unnest(range(1000)) AS i) t
"""
    return _tm_roundtrip_sql(src, "id")


def _tm_roundtrip_sql(src_sql: str, key_cols: str) -> str:
    """NZTM forward + inverse round-trip SQL over a source CTE providing
    (key cols…, lon, lat) — shared by the scalar CRS entry and the
    vector-geometry reprojection entry, with the same ULP-insensitive
    gate (1 m forward quantum + round-trip tolerance booleans)."""
    import math

    from sids_data_pipeline_spark.functions.crs import NZTM2000 as P

    lam0 = math.radians(P.lon0)
    return f"""
WITH src AS (
{src_sql}
),
f1 AS (
  SELECT {key_cols}, lon, lat, radians(lat) AS phi, radians(lon) AS lam FROM src
),
f2 AS (
  SELECT {key_cols}, lon, lat, phi,
         {P.a!r} / sqrt(1.0 - {P.e2!r} * sin(phi) * sin(phi)) AS nu,
         tan(phi) * tan(phi) AS tt,
         {P.ep2!r} * cos(phi) * cos(phi) AS cc,
         (lam - {lam0!r}) * cos(phi) AS aa,
         {P.a!r} * ({P.m0c!r} * phi - {P.m2c!r} * sin(phi * 2.0)
                    + {P.m4c!r} * sin(phi * 4.0)
                    - {P.m6c!r} * sin(phi * 6.0)) AS m
  FROM f1
),
fwd AS (
  SELECT {key_cols}, lon, lat,
         {P.fe!r} + {P.k0!r} * nu * (
           aa + (1.0 - tt + cc) * pow(aa, 3) / 6.0
              + (5.0 - tt * 18.0 + tt * tt + cc * 72.0
                 - {58.0 * P.ep2!r}) * pow(aa, 5) / 120.0) AS x,
         {P.fn!r} + {P.k0!r} * (
           m - {P.m0_arc!r}
             + nu * tan(phi) * (
                 aa * aa / 2.0
                 + (5.0 - tt + cc * 9.0 + cc * cc * 4.0) * pow(aa, 4) / 24.0
                 + (61.0 - tt * 58.0 + tt * tt + cc * 600.0
                    - {330.0 * P.ep2!r}) * pow(aa, 6) / 720.0)) AS y
  FROM f2
),
i0 AS (
  SELECT {key_cols}, lon, lat, x, y,
         ({P.m0_arc!r} + (y - {P.fn!r}) / {P.k0!r}) / {P.a * P.m0c!r} AS mu
  FROM fwd
),
i1 AS (
  SELECT {key_cols}, lon, lat, x, y,
         mu + {P.p2!r} * sin(mu * 2.0) + {P.p4!r} * sin(mu * 4.0)
            + {P.p6!r} * sin(mu * 6.0) + {P.p8!r} * sin(mu * 8.0) AS phi1
  FROM i0
),
i2 AS (
  SELECT {key_cols}, lon, lat, x, y, phi1,
         {P.ep2!r} * cos(phi1) * cos(phi1) AS c1,
         tan(phi1) * tan(phi1) AS t1,
         1.0 - {P.e2!r} * sin(phi1) * sin(phi1) AS om
  FROM i1
),
i3 AS (
  SELECT {key_cols}, lon, lat, x, y, phi1, c1, t1,
         {P.a!r} / sqrt(om) AS n1,
         {P.a * (1.0 - P.e2)!r} / pow(om, 1.5) AS r1
  FROM i2
),
i4 AS (
  SELECT {key_cols}, lon, lat, x, y, phi1, c1, t1, n1, r1,
         (x - {P.fe!r}) / (n1 * {P.k0!r}) AS d
  FROM i3
),
fin AS (
  SELECT {key_cols}, lon, lat, x, y,
         degrees(phi1 - (n1 * tan(phi1) / r1) * (
             d * d / 2.0
             - (5.0 + t1 * 3.0 + c1 * 10.0 - c1 * c1 * 4.0
                - {9.0 * P.ep2!r}) * pow(d, 4) / 24.0
             + (61.0 + t1 * 90.0 + c1 * 298.0 + t1 * t1 * 45.0
                - {252.0 * P.ep2!r} - c1 * c1 * 3.0)
               * pow(d, 6) / 720.0)) AS lat_rt,
         degrees({lam0!r} + (
             d - (1.0 + t1 * 2.0 + c1) * pow(d, 3) / 6.0
               + (5.0 - c1 * 2.0 + t1 * 28.0 - c1 * c1 * 3.0
                  + {8.0 * P.ep2!r} + t1 * t1 * 24.0)
                 * pow(d, 5) / 120.0) / cos(phi1)) AS lon_rt
  FROM i4
)
SELECT {key_cols}, ROUND(x, 0) AS x, ROUND(y, 0) AS y,
       abs(lon_rt - lon) < 1e-6 AS lon_ok,
       abs(lat_rt - lat) < 1e-6 AS lat_ok
FROM fin
"""


def _vreproj_rings() -> list[tuple[int, list[list[tuple[float, float]]]]]:
    """Three NZ-placed zones: two rectangles + a triangle with a hole
    (non-rectangular rings + hole preservation through the vertex
    pipeline). Closed rings, fixed vertices — enumerable into SQL."""
    return [
        (1, [[(172.5, -43.5), (173.2, -43.5), (173.2, -43.0),
              (172.5, -43.0), (172.5, -43.5)]]),
        (2, [[(174.6, -41.5), (175.1, -41.5), (175.1, -41.1),
              (174.6, -41.1), (174.6, -41.5)]]),
        (3, [[(170.2, -45.9), (171.4, -45.9), (170.8, -44.9),
              (170.2, -45.9)],
             [(170.6, -45.6), (171.0, -45.6), (170.8, -45.3),
              (170.6, -45.6)]]),
    ]


def _vector_reproject_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ogr2ogr -t_srs parity as a distributed plan: WKB zones → vertex
    table (mapInPandas) → NZTM closed-form column math (the SAME
    expressions as crs_reproject_tm) → WKB rebuild (applyInPandas) —
    then back to 4326 and re-exploded. Every vertex is value-checked at
    a 1 m quantum against DuckDB's independent evaluation of the TM
    series, and the geometry round trip gates at 1e-6°. Hole rings and
    multi-ring structure must survive both rebuilds for the vertex keys
    to line up at all."""
    from sids_data_pipeline_spark.operators.vector_reproject import (
        explode_vertices,
        reproject_zones,
    )

    import pandas as pd

    from sids_data_pipeline_spark.schemas import ZONES

    rows = [
        ("nz", fid, f"zone{fid}", geo.multipolygon_wkb([rings]))
        for fid, rings in _vreproj_rings()
    ]

    zones = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in ZONES.fields]), ZONES
    )
    keys = ["vector_id", "fid"]
    idx = ["_poly", "_ring", "_vtx"]
    v0 = explode_vertices(zones, keys).withColumnsRenamed(
        {"lon": "lon0", "lat": "lat0"}
    )
    z2193 = reproject_zones(zones, 4326, 2193)
    v1 = explode_vertices(z2193, keys).withColumnsRenamed(
        {"lon": "xm", "lat": "ym"}
    )
    back = reproject_zones(z2193, 2193, 4326)
    v2 = explode_vertices(back, keys).withColumnsRenamed(
        {"lon": "lon_rt", "lat": "lat_rt"}
    )
    return (
        v0.join(v1, keys + idx)
        .join(v2, keys + idx)
        .select(
            "fid",
            F.col("_poly").alias("poly"),
            F.col("_ring").alias("ring"),
            F.col("_vtx").alias("vtx"),
            F.round("xm", 0).alias("x"),
            F.round("ym", 0).alias("y"),
            (F.abs(F.col("lon_rt") - F.col("lon0")) < F.lit(1e-6)).alias("lon_ok"),
            (F.abs(F.col("lat_rt") - F.col("lat0")) < F.lit(1e-6)).alias("lat_ok"),
        )
    )


def _raster_polygonize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_polygonize parity end-to-end: clump labels → boundary-face
    joins → ring walk → MultiPolygon, reduced to analytic scalars the
    oracle states from FIRST PRINCIPLES (taxicab perimeter, area
    conservation, bbox): an 8×8 grid with a 2×2 corner block (C), a 3×3
    inner block (B), and the remainder (A) whose polygon must carry the
    corner NOTCH in its exterior and a HOLE where B sits — including the
    saddle vertex (2,2) shared by notch and hole, which a wrong turn
    rule would fuse into one self-touching ring (and the n_rings/
    perimeter columns would expose)."""
    import pandas as pd

    from sids_data_pipeline_spark.operators.polygonize import polygonize
    from sids_data_pipeline_spark.operators.terrain import clump_regions

    rows = []
    for y in range(8):
        for x in range(8):
            if x < 2 and y < 2:
                v = 3.0
            elif 2 <= x <= 4 and 2 <= y <= 4:
                v = 2.0
            else:
                v = 1.0
            rows.append((x, y, v))
    px = spark.createDataFrame(
        pd.DataFrame(rows, columns=["x", "y", "val"])
    ).selectExpr("CAST(x AS INT) x", "CAST(y AS INT) y", "val")
    out = polygonize(clump_regions(px))

    import pyspark.sql.types as T

    facts_schema = T.StructType(
        [
            T.StructField("region", T.LongType()),
            T.StructField("n_pixels", T.LongType()),
            T.StructField("n_rings", T.IntegerType()),
            T.StructField("area2_e6", T.LongType()),
            T.StructField("perim_e6", T.LongType()),
            T.StructField("xmin", T.DoubleType()),
            T.StructField("ymin", T.DoubleType()),
            T.StructField("xmax", T.DoubleType()),
            T.StructField("ymax", T.DoubleType()),
        ]
    )

    def facts(batches):
        for pdf in batches:
            res = []
            for region, n, wkb in pdf[
                ["region", "n_pixels", "geometry"]
            ].itertuples(index=False, name=None):
                wkb = bytes(wkb)
                x0, y0, x1, y1 = geo.wkb_bbox(wkb)
                res.append(
                    (
                        int(region),
                        int(n),
                        sum(len(p) for p in geo.parse_wkb(wkb)),
                        geo.wkb_area2_e6(wkb),
                        geo.wkb_perimeter_e6(wkb),
                        x0, y0, x1, y1,
                    )
                )
            yield pd.DataFrame(
                res, columns=[f.name for f in facts_schema.fields]
            )

    return out.mapInPandas(facts, facts_schema).orderBy("region")


_RASTER_POLYGONIZE_SQL = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(4 AS BIGINT), 1, CAST(8000000 AS BIGINT),
   CAST(8000000 AS BIGINT), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
   CAST(2.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
  (CAST(2 AS BIGINT), CAST(51 AS BIGINT), 2, CAST(102000000 AS BIGINT),
   CAST(44000000 AS BIGINT), 0.0, 0.0, 8.0, 8.0),
  (CAST(8589934594 AS BIGINT), CAST(9 AS BIGINT), 1,
   CAST(18000000 AS BIGINT), CAST(12000000 AS BIGINT), 2.0, 2.0, 5.0, 5.0)
) t(region, n_pixels, n_rings, area2_e6, perim_e6, xmin, ymin, xmax, ymax)
ORDER BY region
"""


def _raster_mosaic_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_merge parity: three synthetic rasters on overlapping 20×20
    integer grids (B shifted +10 in x, C shifted +10 in y), composited
    last-wins in order A < B < C, with B's nodata value (−1, a diagonal
    stripe) transparent so A shows through inside B's footprint. Every
    cell's winner is a closed-form function of (lon, lat) the oracle
    states independently."""
    from sids_data_pipeline_spark.sources.raster import mosaic

    def grid(rid: str, x0: int, y0: int, fn):
        return spark.range(0, 400, 1, 8).select(
            F.lit(rid).alias("raster_id"),
            (F.col("id") % 20 + x0).cast("double").alias("lon"),
            (F.col("id") / 20).cast("int").cast("double").alias("_r"),
        ).select(
            "raster_id",
            "lon",
            (F.col("_r") + y0).alias("lat"),
            fn(F.col("lon"), F.col("_r") + F.lit(float(y0))).alias("val"),
        )

    a = grid("a", 0, 0, lambda x, y: x * 100.0 + y)
    b = grid(
        "b", 10, 0,
        lambda x, y: F.when((x + y) % 5 == 0, F.lit(-1.0)).otherwise(
            x * 100.0 + y + 1_000_000.0
        ),
    )
    c = grid("c", 0, 10, lambda x, y: x * 100.0 + y + 2_000_000.0)
    px = a.unionByName(b).unionByName(c)
    out = mosaic(px, order=["a", "b", "c"], nodata=-1.0)
    return out.select(
        F.col("lon").cast("int").alias("lon"),
        F.col("lat").cast("int").alias("lat"),
        F.col("val").cast("long").alias("val"),
        F.col("raster_id").alias("source"),
    ).orderBy("lon", "lat")


_RASTER_MOSAIC_SQL = """
WITH cells AS (
  SELECT a.i AS lon, b.i AS lat
  FROM (SELECT unnest(range(30)) AS i) a
  CROSS JOIN (SELECT unnest(range(30)) AS i) b
  WHERE (a.i < 20 AND b.i < 20)        -- A footprint
     OR (a.i >= 10 AND b.i < 20)       -- B footprint
     OR (a.i < 20 AND b.i >= 10)       -- C footprint
),
decided AS (
  SELECT lon, lat,
         CASE
           WHEN lon < 20 AND lat >= 10 THEN 'c'
           WHEN lon >= 10 AND lat < 20 AND (lon + lat) % 5 <> 0 THEN 'b'
           WHEN lon < 20 AND lat < 20 THEN 'a'
           ELSE 'b'  -- B-only cells (lon >= 20) where the stripe is nodata
         END AS source0
  FROM cells
),
filtered AS (  -- a B-only nodata cell has NO painter at all: drop it
  SELECT * FROM decided
  WHERE NOT (source0 = 'b' AND (lon + lat) % 5 = 0)
)
SELECT lon, lat,
       CAST(lon * 100 + lat
            + CASE source0 WHEN 'b' THEN 1000000
                           WHEN 'c' THEN 2000000 ELSE 0 END AS BIGINT) AS val,
       source0 AS source
FROM filtered
ORDER BY lon, lat
"""


def _crs_standardize_mixed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixed-raster-estate story as ONE expression: 1000 points
    across four CRS families (UTM 33N, Web Mercator, NSIDC polar
    stereographic 3413, NZTM 2193) forward-projected into their declared
    CRS by the per-family scalar path, unioned with an ``src_epsg``
    column, and standardized back to 4326 by a SINGLE per-row
    ``standardize_crs`` CASE — each row must land back on its source
    coordinates within 1e-6° (positive-signal gate: the per-family
    VALUE mirrors are the sibling crs_reproject_* entries; what THIS
    entry pins is the per-row dispatch itself). Longitudes compare
    modulo 360 for the polar family's antimeridian points."""
    from sids_data_pipeline_spark.functions.crs import (
        reproject_pixels,
        standardize_crs,
    )

    src = spark.range(0, 1000, 1, 8).select(
        "id",
        F.when(F.col("id") < 250, F.lit(32633))
        .when(F.col("id") < 500, F.lit(3857))
        .when(F.col("id") < 750, F.lit(3413))
        .otherwise(F.lit(2193))
        .alias("src_epsg"),
        F.when(
            F.col("id") < 250,
            F.lit(12.1) + (F.col("id") % 25).cast("double") * 0.14,
        )
        .when(
            F.col("id") < 500,
            F.lit(-170.0) + (F.col("id") % 25).cast("double") * 13.6,
        )
        .when(
            F.col("id") < 750,
            F.lit(-180.0) + (F.col("id") % 25).cast("double") * 14.4,
        )
        .otherwise(F.lit(169.8) + (F.col("id") % 25).cast("double") * 0.33)
        .alias("lon"),
        F.when(
            F.col("id") < 250,
            F.lit(-68.0) + ((F.col("id") % 250) / 25).cast("int").cast("double") * 5.6,
        )
        .when(
            F.col("id") < 500,
            F.lit(-80.0) + ((F.col("id") % 250) / 25).cast("int").cast("double") * 16.0,
        )
        .when(
            F.col("id") < 750,
            F.lit(56.0) + ((F.col("id") % 250) / 25).cast("int").cast("double") * 3.4,
        )
        .otherwise(
            F.lit(-46.7) + ((F.col("id") % 250) / 25).cast("int").cast("double") * 1.2
        )
        .alias("lat"),
    )
    parts = []
    for epsg in (32633, 3857, 3413, 2193):
        sub = src.filter(F.col("src_epsg") == epsg)
        parts.append(reproject_pixels(sub, 4326, epsg))
    mixed = parts[0]
    for p in parts[1:]:
        mixed = mixed.unionByName(p)
    std = standardize_crs(mixed)
    lon_d = F.abs(F.col("lon") - F.col("lon0"))
    return (
        std.withColumnsRenamed({"lon": "lon", "lat": "lat"})
        .join(
            src.select(
                "id",
                F.col("lon").alias("lon0"),
                F.col("lat").alias("lat0"),
                F.col("src_epsg").alias("epsg0"),
            ),
            "id",
        )
        .select(
            "id",
            F.col("epsg0").alias("declared_epsg"),
            (F.least(lon_d, F.lit(360.0) - lon_d) < F.lit(1e-6)).alias("lon_ok"),
            (F.abs(F.col("lat") - F.col("lat0")) < F.lit(1e-6)).alias("lat_ok"),
            (F.col("src_epsg") == F.lit(4326)).alias("restamped"),
        )
        .orderBy("id")
    )


_CRS_STANDARDIZE_MIXED_SQL = """
SELECT i AS id,
       CASE WHEN i < 250 THEN 32633 WHEN i < 500 THEN 3857
            WHEN i < 750 THEN 3413 ELSE 2193 END AS declared_epsg,
       TRUE AS lon_ok, TRUE AS lat_ok, TRUE AS restamped
FROM (SELECT unnest(range(1000)) AS i) t
ORDER BY id
"""


def _crs_reproject_krovak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326-free Krovak leg: S-JTSK geodetic grid over CZ/SK → EPSG
    method 9819 oblique conformal cone forward (East-North orientation)
    → inverse back. Projection-only on purpose: the oracle mirrors the
    cone math term-for-term; the Helmert datum leg is pinned separately
    (worked-example + kernel-equivalence pytest, and the
    crs_standardize_datum entry rows route 5514 through the full
    chain). Same ULP-insensitive gate as crs_reproject_tm: forward at
    a 1 m quantum, round trip as tolerance booleans vs the source."""
    from sids_data_pipeline_spark.functions.crs import SJTSK_KROVAK

    grid = spark.range(0, 1000, 1, 8).select(
        F.col("id"),
        (F.lit(13.1) + (F.col("id") % 20).cast("double") * 0.26).alias("lon"),
        (F.lit(48.6) + (F.col("id") / 20).cast("long").cast("double") * 0.045).alias(
            "lat"
        ),
    )
    x, y = SJTSK_KROVAK.project(F.col("lon"), F.col("lat"))
    xy = grid.select("id", "lon", "lat", x.alias("x"), y.alias("y"))
    lon_rt, lat_rt = SJTSK_KROVAK.unproject(F.col("x"), F.col("y"))
    return xy.select(
        "id",
        F.round("x", 0).alias("x"),
        F.round("y", 0).alias("y"),
        (F.abs(lon_rt - F.col("lon")) < F.lit(1e-7)).alias("lon_ok"),
        (F.abs(lat_rt - F.col("lat")) < F.lit(1e-7)).alias("lat_ok"),
    )


def _crs_krovak_sql() -> str:
    """Term-for-term mirror of Krovak.project/unproject with the
    EPSG:5514 constants; every coefficient derives from the SAME
    projection object — including the conformal→geodetic series
    coefficients the closed-form inverse latitude uses."""
    import math

    from sids_data_pipeline_spark.functions.crs import SJTSK_KROVAK as P

    phi_expr = (
        f"chi + {P.d2!r} * sin(chi * 2.0) + {P.d4!r} * sin(chi * 4.0)"
        f" + {P.d6!r} * sin(chi * 6.0) + {P.d8!r} * sin(chi * 8.0)"
    )
    return f"""
WITH src AS (
  SELECT i AS id,
         13.1 + CAST(i % 20 AS DOUBLE) * 0.26 AS lon,
         48.6 + CAST(i // 20 AS DOUBLE) * 0.045 AS lat
  FROM (SELECT unnest(range(1000)) AS i) t
),
f1 AS (
  SELECT id, lon, lat, radians(lat) AS phi, radians(lon) AS lam,
         {P.e!r} * sin(radians(lat)) AS esin
  FROM src
),
f2 AS (
  SELECT id, lon, lat,
         2.0 * (atan({P.t0!r} * pow(tan(phi / 2.0 + pi() / 4.0), {P.B!r})
                     / pow((1.0 + esin) / (1.0 - esin), {P.e * P.B / 2.0!r}))
                - pi() / 4.0) AS u,
         {P.B!r} * ({P.lam0!r} - lam) AS v
  FROM f1
),
f3 AS (
  SELECT id, lon, lat, u, v,
         asin({math.cos(P.alphac)!r} * sin(u)
              + {math.sin(P.alphac)!r} * cos(u) * cos(v)) AS tt
  FROM f2
),
f4 AS (
  SELECT id, lon, lat, tt,
         {P.n!r} * asin(cos(u) * sin(v) / cos(tt)) AS theta,
         {P.r0 * P.tan_p ** P.n!r} / pow(tan(tt / 2.0 + pi() / 4.0), {P.n!r}) AS r
  FROM f3
),
fwd AS (
  SELECT id, lon, lat,
         -(r * sin(theta)) AS x,
         -(r * cos(theta)) AS y
  FROM f4
),
i1 AS (
  SELECT id, lon, lat, x, y,
         sqrt(x * x + y * y) AS rp,
         atan2(-x, -y) AS thetap
  FROM fwd
),
i2 AS (
  SELECT id, lon, lat, x, y,
         thetap / {P.n!r} AS dp,
         2.0 * (atan(pow({P.r0!r} / rp, {1.0 / P.n!r}) * {P.tan_p!r})
                - pi() / 4.0) AS tp
  FROM i1
),
i3 AS (
  SELECT id, lon, lat, x, y, dp, tp,
         asin({math.cos(P.alphac)!r} * sin(tp)
              - {math.sin(P.alphac)!r} * cos(tp) * cos(dp)) AS up
  FROM i2
),
i4 AS (
  SELECT id, lon, lat, x, y, up,
         degrees({P.lam0!r} - asin(cos(tp) * sin(dp) / cos(up)) / {P.B!r}) AS lon_rt,
         2.0 * (atan({P.c_lat!r} * pow(tan(up / 2.0 + pi() / 4.0), {P.inv_b!r}))
                - pi() / 4.0) AS chi
  FROM i3
),
fin AS (
  SELECT id, lon, lat, x, y, lon_rt, degrees({phi_expr}) AS lat_rt FROM i4
)
SELECT id, ROUND(x, 0) AS x, ROUND(y, 0) AS y,
       abs(lon_rt - lon) < 1e-7 AS lon_ok,
       abs(lat_rt - lat) < 1e-7 AS lat_ok
FROM fin
"""


_E2E_RASTERS = ("rast_gradient", "rast_checker")
_E2E_MAX_ZOOM = 4


def _pipeline_end_to_end_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED Entry-1 lifecycle under the driver gate (reference
    ``pipeline/processing/__main__.py:19-26``): run_pipeline over the
    2-pair fixture estate (zones_grid × two rasters), then read the
    actual artifacts back — per-zone means parsed from the written
    ``export.geojsonl``, tile counts from the written tiles parquet —
    and pin P6 idempotency IN the gate: the first run reports
    pending=2, an immediate second run pending=0 (ledger + marker
    skip). The collects are the 8-feature fixture readback (the job
    itself is one distributed zonal+sink pass; see
    tests/test_pipeline_job.py for the operational-scale claims); the
    temp estate is deleted after readback, which is why the result is
    re-materialized rather than returned lazily over the files."""
    import shutil
    import tempfile

    from sids_data_pipeline_spark.jobs.pipeline import run_pipeline

    out_dir = tempfile.mkdtemp(prefix="sdp_pipeline_e2e_")
    rows = []
    try:
        res1 = run_pipeline(
            spark, ["zones_grid"], list(_E2E_RASTERS), out_dir,
            stats=("mean",), max_zoom=_E2E_MAX_ZOOM,
        )
        res2 = run_pipeline(
            spark, ["zones_grid"], list(_E2E_RASTERS), out_dir,
            stats=("mean",), max_zoom=_E2E_MAX_ZOOM,
        )
        for rid in _E2E_RASTERS:
            pair = f"zones_grid_{rid}"
            feats = (
                spark.read.text(os.path.join(out_dir, pair, "export.geojsonl"))
                .select(
                    F.get_json_object("value", "$.properties.fid")
                    .cast("bigint").alias("fid"),
                    F.get_json_object("value", "$.properties.mean")
                    .cast("double").alias("mean"),
                )
                .collect()
            )
            n_tiles = (
                spark.read.parquet(os.path.join(out_dir, pair, "tiles"))
                .select("z", "x", "y").distinct().count()
            )
            rows.extend(
                (pair, r.fid, r.mean, n_tiles, res1["pending"], res2["pending"])
                for r in feats
            )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "pair_key string, fid bigint, mean double, n_tiles bigint, "
        "first_run_pending bigint, second_run_pending bigint",
    ).orderBy("pair_key", "fid")


def _pipeline_end_to_end_sql() -> str:
    """Oracle: zonal means from the same ray-cast containment the zonal
    entries use (o_contains over the zone WKB), tile counts from the
    tile-assignment math CTE (no density drops: 4 features < the 64
    cap), and the P6 pins as literals (first run must process exactly
    the 2 pairs, the second exactly 0)."""
    zones = FIXTURE_BUILDERS["zones_grid"]()
    _, values = _zone_bbox_values(("zones_grid",))
    n = GRID_N
    ctes, arms = [], []
    for rid in _E2E_RASTERS:
        ctes.append(
            f"""px_{rid} AS (
  SELECT (i % {n} + 0.5) * 0.1 AS lon, (i // {n} + 0.5) * 0.1 AS lat,
         {_VAL_SQL[rid]} AS val
  FROM (SELECT unnest(range({n * n})) AS i) t
)"""
        )
        for fid, _name, wkb in zones:
            c = o_contains(wkb)
            arms.append(
                f"SELECT 'zones_grid_{rid}' AS pair_key, "
                f"CAST({fid} AS BIGINT) AS fid, "
                f"AVG(CASE WHEN {c} THEN val END) AS mean FROM px_{rid}"
            )
    body = "\nUNION ALL\n".join(arms)
    return (
        f"WITH f(fid, xmin, ymin, xmax, ymax) AS (VALUES {values}),\n"
        + _TILE_MATH_SQL.format(maxz=_E2E_MAX_ZOOM)
        + ",\ntc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tiles FROM "
        "(SELECT DISTINCT z, x, y FROM assigned)),\n"
        + ",\n".join(ctes)
        + f",\nm AS (\n{body}\n)\n"
        "SELECT m.pair_key, m.fid, m.mean, tc.n_tiles, "
        "CAST(2 AS BIGINT) AS first_run_pending, "
        "CAST(0 AS BIGINT) AS second_run_pending "
        "FROM m, tc ORDER BY pair_key, fid"
    )


def _crs_standardize_datum_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row dispatch for DATUM-SHIFTED grids (the r9 refusal made a
    real path): 1000 points across OSGB 27700, Irish 29902, and Krovak
    5514 (three Helmert-shifted codes across TWO projection families,
    handled by ONE mapInPandas Arrow kernel with per-code masks —
    functions/crs.standardize_crs_datum), NZTM 2193 (datum-free,
    proving the JVM CASE path coexists in the same call) and raw 4326
    passthrough. Each row is forward-projected into its declared CRS
    by the per-file scalar path, then the single standardize_crs_datum
    call must land it back on its source coordinates within 1e-6° and
    restamp it 4326. Positive-signal gate like crs_standardize_mixed:
    the per-family value mirrors are the sibling crs_reproject_*
    entries; THIS entry pins the two-path datum dispatch. The
    repartition is a codegen barrier for the fixture's in-plan forward
    chains only (a real estate scans its coordinates from storage)."""
    from sids_data_pipeline_spark.functions.crs import (
        reproject_pixels,
        standardize_crs_datum,
    )

    block = ((F.col("id") % 200) / 25).cast("int").cast("double")
    src = spark.range(0, 1000, 1, 8).select(
        "id",
        F.when(F.col("id") < 200, F.lit(27700))
        .when(F.col("id") < 400, F.lit(29902))
        .when(F.col("id") < 600, F.lit(5514))
        .when(F.col("id") < 800, F.lit(2193))
        .otherwise(F.lit(4326))
        .alias("src_epsg"),
        F.when(F.col("id") < 200, F.lit(-5.8) + (F.col("id") % 25).cast("double") * 0.29)
        .when(F.col("id") < 400, F.lit(-10.3) + (F.col("id") % 25).cast("double") * 0.19)
        .when(F.col("id") < 600, F.lit(13.1) + (F.col("id") % 25).cast("double") * 0.2)
        .when(F.col("id") < 800, F.lit(169.8) + (F.col("id") % 25).cast("double") * 0.33)
        .otherwise(F.lit(-170.0) + (F.col("id") % 25).cast("double") * 13.6)
        .alias("lon"),
        F.when(F.col("id") < 200, F.lit(50.2) + block * 1.0)
        .when(F.col("id") < 400, F.lit(51.5) + block * 0.5)
        .when(F.col("id") < 600, F.lit(48.6) + block * 0.31)
        .when(F.col("id") < 800, F.lit(-46.7) + block * 1.5)
        .otherwise(F.lit(-80.0) + block * 20.0)
        .alias("lat"),
    )
    parts = [src.filter(F.col("src_epsg") == 4326)]
    for epsg in (27700, 29902, 5514, 2193):
        parts.append(
            reproject_pixels(src.filter(F.col("src_epsg") == epsg), 4326, epsg)
        )
    mixed = parts[0]
    for p in parts[1:]:
        mixed = mixed.unionByName(p)
    # localCheckpoint: the fixture's four forward-projection expression
    # chains would otherwise ride INSIDE the standardize plan (fused by
    # codegen into one multi-MB generated method — Janino compile time
    # dwarfs the actual work). A real estate scans coordinates from
    # storage; the checkpoint makes the fixture look like one.
    std = standardize_crs_datum(mixed.localCheckpoint())
    return (
        std.join(
            src.select(
                "id",
                F.col("lon").alias("lon0"),
                F.col("lat").alias("lat0"),
                F.col("src_epsg").alias("epsg0"),
            ),
            "id",
        )
        .select(
            "id",
            F.col("epsg0").alias("declared_epsg"),
            (F.abs(F.col("lon") - F.col("lon0")) < F.lit(1e-6)).alias("lon_ok"),
            (F.abs(F.col("lat") - F.col("lat0")) < F.lit(1e-6)).alias("lat_ok"),
            (F.col("src_epsg") == F.lit(4326)).alias("restamped"),
        )
        .orderBy("id")
    )


_CRS_STANDARDIZE_DATUM_SQL = """
SELECT i AS id,
       CASE WHEN i < 200 THEN 27700 WHEN i < 400 THEN 29902
            WHEN i < 600 THEN 5514 WHEN i < 800 THEN 2193
            ELSE 4326 END AS declared_epsg,
       TRUE AS lon_ok, TRUE AS lat_ok, TRUE AS restamped
FROM (SELECT unnest(range(1000)) AS i) t
ORDER BY id
"""


def _raster_contour_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_contour parity on a field that is LINEAR in every cell
    (val = x + 2y on a 13×13 grid), where marching squares is EXACT:
    per level, the segment count equals the number of cells the analytic
    line straddles, the segment-endpoint bbox equals the line-in-box
    intersection points (dyadic levels ⇒ exact floats), each level
    chains into exactly one polyline, and the summed segment length
    matches the closed-form chord length to 1e-6."""
    import math

    from sids_data_pipeline_spark.operators.contour import (
        contour_lines,
        contour_segments,
    )

    levels = [8.5, 15.25]
    chord = {
        8.5: math.hypot(8.5, 4.25),
        15.25: math.hypot(12.0, 7.625 - 1.625),
    }
    rows = [(x, y, float(x + 2 * y)) for y in range(13) for x in range(13)]
    px = spark.createDataFrame(rows, "x int, y int, val double")
    segs = contour_segments(px, levels)
    seg_len = F.sqrt(
        (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
        + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
    )
    chord_col = F.when(F.col("level") == 8.5, F.lit(chord[8.5])).otherwise(
        F.lit(chord[15.25])
    )
    agg = segs.groupBy("level").agg(
        F.count(F.lit(1)).cast("int").alias("n_segs"),
        F.least(F.min("x1"), F.min("x2")).alias("xmin"),
        F.least(F.min("y1"), F.min("y2")).alias("ymin"),
        F.greatest(F.max("x1"), F.max("x2")).alias("xmax"),
        F.greatest(F.max("y1"), F.max("y2")).alias("ymax"),
        (F.abs(F.sum(seg_len) - F.max(chord_col)) < F.lit(1e-6)).alias("len_ok"),
    )
    nl = contour_lines(px, levels).select("level", "n_lines")
    return agg.join(nl, "level").orderBy("level")


_RASTER_CONTOUR_SQL = """
WITH cells AS (
  SELECT a.i AS cx, b.i AS cy
  FROM (SELECT unnest(range(12)) AS i) a
  CROSS JOIN (SELECT unnest(range(12)) AS i) b
),
counts AS (  -- cells the analytic line x + 2y = L straddles
  SELECT L, CAST(count(*) AS INT) AS n_segs
  FROM cells CROSS JOIN (SELECT unnest([8.5, 15.25]) AS L) lv
  WHERE cx + 2 * cy < L AND L < cx + 2 * cy + 3
  GROUP BY L
),
ends AS (  -- line-in-box endpoints, closed form
  SELECT * FROM (VALUES
    (CAST(8.5 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
     CAST(8.5 AS DOUBLE), CAST(4.25 AS DOUBLE),
     sqrt(8.5 * 8.5 + 4.25 * 4.25)),
    (15.25, 0.0, 1.625, 12.0, 7.625,
     sqrt(12.0 * 12.0 + 6.0 * 6.0))
  ) e(L, xmin, ymin, xmax, ymax, chord)
)
SELECT c.L AS level, c.n_segs, e.xmin, e.ymin, e.xmax, e.ymax,
       TRUE AS len_ok, 1 AS n_lines
FROM counts c JOIN ends e ON e.L = c.L
ORDER BY level
"""


def _validity_fixture() -> list[tuple[int, list[list[list[tuple[float, float]]]]]]:
    """(fid, polygons) — one geometry per validity class: valid
    rectangle; bow-tie (proper self-crossing); pinch (non-adjacent
    vertex touch); valid triangle-with-hole; rectangle with a
    consecutive duplicate vertex (valid: zero-length segments are not
    intersections)."""
    return [
        (1, [[[(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (0.0, 0.0)]]]),
        (2, [[[(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0), (0.0, 0.0)]]]),
        (3, [[[(0.0, 0.0), (2.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.0, 2.0),
               (1.0, 1.0), (0.0, 0.0)]]]),
        (4, [[[(1.0, 1.0), (5.0, 1.0), (3.0, 5.0), (1.0, 1.0)],
              [(2.6, 1.8), (3.0, 2.6), (3.4, 1.8), (2.6, 1.8)]]]),
        (5, [[[(0.0, 0.0), (3.0, 0.0), (3.0, 0.0), (3.0, 2.0), (0.0, 2.0),
               (0.0, 0.0)]]]),
    ]


def _geo_validity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 validity reporting (the diagnostic half of ogr2ogr -makevalid):
    the numpy segment-pair kernel (proper crossings + non-adjacent
    vertex touches) vs DuckDB computing the SAME intersection algebra
    independently over the vertex table — plus ring/vertex counts and
    winding canonicality."""
    import pandas as pd

    from sids_data_pipeline_spark.operators.geometry_quality import (
        validity_report,
    )
    from sids_data_pipeline_spark.schemas import ZONES

    rows = [
        ("val", fid, None, geo.multipolygon_wkb(polys))
        for fid, polys in _validity_fixture()
    ]
    zones = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in ZONES.fields]), ZONES
    )
    return validity_report(zones, ["fid"]).orderBy("fid")


def _geo_validity_sql() -> str:
    values = ",\n    ".join(
        f"({fid}, {pi}, {ri}, {vi}, CAST({x!r} AS DOUBLE), "
        f"CAST({y!r} AS DOUBLE))"
        for fid, polys in _validity_fixture()
        for pi, poly in enumerate(polys)
        for ri, ring in enumerate(poly)
        for vi, (x, y) in enumerate(ring)
    )
    return f"""
WITH v AS (
  SELECT * FROM (VALUES
    {values}
  ) t(fid, poly, ring, vtx, x, y)
),
lagged AS (  -- collapse consecutive duplicate vertices (mirror of the
             -- kernel's dedup: zero-length segments are redundancy)
  SELECT fid, poly, ring, vtx, x, y,
         lag(x) OVER w AS lx, lag(y) OVER w AS ly
  FROM v WINDOW w AS (PARTITION BY fid, poly, ring ORDER BY vtx)
),
clean AS (
  SELECT fid, poly, ring,
         row_number() OVER (PARTITION BY fid, poly, ring ORDER BY vtx) - 1
           AS vtx,
         x, y
  FROM lagged WHERE lx IS NULL OR x <> lx OR y <> ly
),
seg AS (  -- open-ring segments: vertex i -> i+1 (closing vertex dropped)
  SELECT a.fid, a.poly, a.ring, a.vtx AS i,
         a.x AS px, a.y AS py, b.x AS qx, b.y AS qy,
         (SELECT max(vtx) FROM clean w
          WHERE w.fid = a.fid AND w.poly = a.poly AND w.ring = a.ring) AS last
  FROM clean a JOIN clean b
    ON b.fid = a.fid AND b.poly = a.poly AND b.ring = a.ring
   AND b.vtx = a.vtx + 1
),
hits AS (  -- proper crossings + shared endpoints of NON-adjacent segments
  SELECT s.fid, count(*) AS n
  FROM seg s JOIN seg u
    ON u.fid = s.fid AND u.poly = s.poly AND u.ring = s.ring
   AND u.i >= s.i + 2 AND NOT (s.i = 0 AND u.i = s.last - 1)
  WHERE ((s.qx - s.px) * (u.qy - u.py) - (s.qy - s.py) * (u.qx - u.px)) <> 0
    AND ((u.px - s.px) * (u.qy - u.py) - (u.py - s.py) * (u.qx - u.px))
        / ((s.qx - s.px) * (u.qy - u.py) - (s.qy - s.py) * (u.qx - u.px))
        BETWEEN 0.0 AND 1.0
    AND ((u.px - s.px) * (s.qy - s.py) - (u.py - s.py) * (s.qx - s.px))
        / ((s.qx - s.px) * (u.qy - u.py) - (s.qy - s.py) * (u.qx - u.px))
        BETWEEN 0.0 AND 1.0
  GROUP BY s.fid
),
shoelace AS (
  SELECT fid, poly, ring,
         sum(px * qy - qx * py) / 2.0 AS area2
  FROM seg GROUP BY fid, poly, ring
),
winding AS (
  SELECT fid,
         bool_and(CASE WHEN area2 = 0.0 THEN TRUE
                       WHEN ring = 0 THEN area2 >= 0.0
                       ELSE area2 <= 0.0 END) AS winding_canonical
  FROM shoelace GROUP BY fid
),
counts AS (
  SELECT fid,
         CAST(count(DISTINCT poly) AS INT) AS n_polys,
         CAST(count(DISTINCT (poly, ring)) AS INT) AS n_rings,
         CAST(count(*) AS INT) AS n_vertices
  FROM v GROUP BY fid
)
SELECT c.fid, c.n_polys, c.n_rings, c.n_vertices,
       coalesce(h.n > 0, FALSE) AS self_intersecting,
       w.winding_canonical
FROM counts c
LEFT JOIN hits h ON h.fid = c.fid
JOIN winding w ON w.fid = c.fid
ORDER BY c.fid
"""


def _vector_clip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector extent clip (the reference's ingest-time working-extent
    clip, batch/processing/config.py:12-15) against clip box
    [1, 6] × [1, 4]: straddling rects, a fully-inside rect, a
    fully-outside rect (survived = false, NULLs), a right triangle cut
    by the top edge (non-axis-aligned hypotenuse → real S-H
    intersection points), and a rect with a hole (signed-area
    subtraction). All coordinates are dyadic so every shoelace micro-
    term is exact and the oracle can use CLOSED-FORM intersection
    algebra (greatest/least + analytic triangle areas) — it never runs
    Sutherland–Hodgman."""
    import pandas as pd

    from sids_data_pipeline_spark.operators.vector_clip import clip_zones
    from sids_data_pipeline_spark.schemas import ZONES

    tri = geo.multipolygon_wkb([[[(1.0, 1.0), (5.0, 1.0), (1.0, 5.0), (1.0, 1.0)]]])
    holed = geo.multipolygon_wkb(
        [[[(1.5, 1.5), (5.5, 1.5), (5.5, 3.5), (1.5, 3.5), (1.5, 1.5)],
          [(2.0, 2.0), (2.0, 3.0), (3.0, 3.0), (3.0, 2.0), (2.0, 2.0)]]]
    )
    rows = [
        ("clip", 1, None, geo.box_wkb(0.0, 0.0, 4.0, 3.0)),
        ("clip", 2, None, geo.box_wkb(2.0, 2.0, 5.0, 3.5)),
        ("clip", 3, None, geo.box_wkb(7.0, 0.0, 9.0, 2.0)),
        ("clip", 4, None, tri),
        ("clip", 5, None, holed),
        ("clip", 6, None, geo.box_wkb(-2.0, 1.25, 2.0, 3.25)),
    ]
    zones = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in ZONES.fields]), ZONES
    )
    clipped = clip_zones(zones, lon=(1.0, 6.0), lat=(1.0, 4.0))

    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("fid", T.LongType()),
            T.StructField("survived", T.BooleanType()),
            T.StructField("xmin", T.DoubleType()),
            T.StructField("ymin", T.DoubleType()),
            T.StructField("xmax", T.DoubleType()),
            T.StructField("ymax", T.DoubleType()),
            T.StructField("area2_e6", T.LongType()),
        ]
    )

    def facts(batches):
        for pdf in batches:
            rows = []
            for fid, surv, wkb in pdf[["fid", "survived", "geometry"]].itertuples(
                index=False, name=None
            ):
                if wkb is None:
                    rows.append((fid, bool(surv), None, None, None, None, None))
                else:
                    x0, y0, x1, y1 = geo.wkb_bbox(bytes(wkb))
                    rows.append(
                        (fid, bool(surv), x0, y0, x1, y1,
                         geo.wkb_area2_e6(bytes(wkb)))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return clipped.mapInPandas(facts, out_schema).orderBy("fid")


_VECTOR_CLIP_SQL = """
WITH rects AS (
  SELECT * FROM (VALUES
    (1, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
        CAST(4.0 AS DOUBLE), CAST(3.0 AS DOUBLE)),
    (2, 2.0, 2.0, 5.0, 3.5),
    (3, 7.0, 0.0, 9.0, 2.0),
    (6, -2.0, 1.25, 2.0, 3.25)
  ) r(fid, x0, y0, x1, y1)
),
rect_clip AS (  -- rect ∩ clip box in closed form
  SELECT fid,
         greatest(x0, 1.0) AS ix0, greatest(y0, 1.0) AS iy0,
         least(x1, 6.0) AS ix1, least(y1, 4.0) AS iy1
  FROM rects
),
rect_rows AS (
  SELECT CAST(fid AS BIGINT) AS fid,
         ix0 < ix1 AND iy0 < iy1 AS survived,
         CASE WHEN ix0 < ix1 AND iy0 < iy1 THEN ix0 END AS xmin,
         CASE WHEN ix0 < ix1 AND iy0 < iy1 THEN iy0 END AS ymin,
         CASE WHEN ix0 < ix1 AND iy0 < iy1 THEN ix1 END AS xmax,
         CASE WHEN ix0 < ix1 AND iy0 < iy1 THEN iy1 END AS ymax,
         CASE WHEN ix0 < ix1 AND iy0 < iy1
              THEN CAST(round(2.0 * (ix1 - ix0) * (iy1 - iy0) * 1e6)
                        AS BIGINT) END AS area2_e6
  FROM rect_clip
),
-- fid 4: right triangle (1,1)(5,1)(1,5), clip y <= 4 removes the similar
-- top triangle of height 1 (area 1/2); x within [1,6] untouched.
tri_row AS (
  SELECT CAST(4 AS BIGINT) AS fid, TRUE AS survived,
         CAST(1.0 AS DOUBLE) AS xmin, CAST(1.0 AS DOUBLE) AS ymin,
         CAST(5.0 AS DOUBLE) AS xmax, CAST(4.0 AS DOUBLE) AS ymax,
         CAST(round(2.0 * (0.5 * 4.0 * 4.0 - 0.5 * 1.0 * 1.0) * 1e6)
              AS BIGINT) AS area2_e6
),
-- fid 5: exterior 4×2 minus 1×1 hole, entirely inside the clip box.
hole_row AS (
  SELECT CAST(5 AS BIGINT) AS fid, TRUE AS survived,
         CAST(1.5 AS DOUBLE) AS xmin, CAST(1.5 AS DOUBLE) AS ymin,
         CAST(5.5 AS DOUBLE) AS xmax, CAST(3.5 AS DOUBLE) AS ymax,
         CAST(round(2.0 * (4.0 * 2.0 - 1.0 * 1.0) * 1e6) AS BIGINT)
           AS area2_e6
)
SELECT * FROM rect_rows
UNION ALL SELECT * FROM tri_row
UNION ALL SELECT * FROM hole_row
ORDER BY fid
"""


def _vector_reproject_sql() -> str:
    values = ",\n    ".join(
        f"({fid}, 0, {ri}, {vi}, CAST({x!r} AS DOUBLE), CAST({y!r} AS DOUBLE))"
        for fid, rings in _vreproj_rings()
        for ri, ring in enumerate(rings)
        for vi, (x, y) in enumerate(ring)
    )
    src = f"""
  SELECT * FROM (VALUES
    {values}
  ) v(fid, poly, ring, vtx, lon, lat)
"""
    return _tm_roundtrip_sql(src, "fid, poly, ring, vtx")


def _crs_reproject_sinu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326 → MODIS sinusoidal (R = 6371007.181 m, the MOD* land grids)
    forward + inverse round trip — spherical closed form both legs.
    MODIS carries no true EPSG, so the de-facto SR-ORG:6974 tag is an
    explicit opt-in registration, not an engine default."""
    from sids_data_pipeline_spark.functions.crs import (
        MODIS_SINUSOIDAL,
        register_projection,
        reproject_pixels,
    )

    register_projection(6974, MODIS_SINUSOIDAL)

    grid = spark.range(0, 1000, 1, 8).select(
        F.col("id"),
        (F.lit(-170.0) + (F.col("id") % 40).cast("double") * 8.5).alias("lon"),
        ((F.col("id") / 40).cast("long").cast("double") * 6.0 - 72.0).alias("lat"),
    )
    xy = reproject_pixels(grid, src_epsg=4326, dst_epsg=6974)
    xy = xy.select("id", F.col("lon").alias("x"), F.col("lat").alias("y"))
    back = reproject_pixels(
        xy.withColumnsRenamed({"x": "lon", "y": "lat"}), 6974, 4326
    )
    return (
        xy.join(back.withColumnsRenamed({"lon": "lon_rt", "lat": "lat_rt"}), "id")
        .select(
            "id",
            F.round("x", 3).alias("x"),
            F.round("y", 3).alias("y"),
            F.round("lon_rt", 9).alias("lon_rt"),
            F.round("lat_rt", 9).alias("lat_rt"),
        )
    )


def _crs_sinu_sql() -> str:
    from sids_data_pipeline_spark.functions.crs import MODIS_SINUSOIDAL as P

    return f"""
WITH src AS (
  SELECT i AS id,
         -170.0 + CAST(i % 40 AS DOUBLE) * 8.5 AS lon,
         CAST(i // 40 AS DOUBLE) * 6.0 - 72.0 AS lat
  FROM (SELECT unnest(range(1000)) AS i) t
),
fwd AS (
  SELECT id,
         {P.r!r} * radians(lon) * cos(radians(lat)) AS x,
         {P.r!r} * radians(lat) AS y
  FROM src
),
inv AS (
  SELECT id, x, y,
         degrees(x / ({P.r!r} * cos(y / {P.r!r}))) AS lon_rt,
         degrees(y / {P.r!r}) AS lat_rt
  FROM fwd
)
SELECT id, ROUND(x, 3) AS x, ROUND(y, 3) AS y,
       ROUND(lon_rt, 9) AS lon_rt, ROUND(lat_rt, 9) AS lat_rt
FROM inv
"""


# --- tile assignment + density drop (K2/O2) -----------------------------------

_TILE_MAX_ZOOM = 4
_TILE_KEEP = 2


def _zone_bbox_values(vector_ids: tuple[str, ...]) -> tuple[list, str]:
    """(rows, SQL VALUES) of per-zone bboxes, computed ONCE from the same
    WKB the engine parses — engine UDF and oracle see identical doubles."""
    rows = []
    for vid in vector_ids:
        for fid, _name, wkb in FIXTURE_BUILDERS[vid]():
            xmin, ymin, xmax, ymax = geo.wkb_bbox(wkb)
            rows.append((f"{vid}_{fid}", xmin, ymin, xmax, ymax))
    values = ", ".join(
        f"('{k}', {xmin!r}, {ymin!r}, {xmax!r}, {ymax!r})"
        for k, xmin, ymin, xmax, ymax in rows
    )
    return rows, values


def _tile_features(spark: SparkSession) -> DataFrame:
    rows, _ = _zone_bbox_values(("zones_grid", "zones_overlap"))
    pdf = pd.DataFrame(rows, columns=["fid", "xmin", "ymin", "xmax", "ymax"])
    return spark.createDataFrame(pdf).coalesce(1)


def _tiles_assign_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.sinks.tiles import assign_tiles

    out = assign_tiles(_tile_features(spark), max_zoom=_TILE_MAX_ZOOM)
    return out.select("fid", "z", "x", "y")


_TILE_MATH_SQL = """
t AS (
  SELECT fid, z.z AS z,
         LEAST(GREATEST(CAST(floor((xmin + 180.0) / 360.0 * pow(2.0, z.z)) AS INT), 0), CAST(pow(2.0, z.z) AS INT) - 1) AS x0,
         LEAST(GREATEST(CAST(floor((xmax + 180.0) / 360.0 * pow(2.0, z.z)) AS INT), 0), CAST(pow(2.0, z.z) AS INT) - 1) AS x1,
         LEAST(GREATEST(CAST(floor((1.0 - ln(tan(radians(ymax)) + sqrt(tan(radians(ymax)) * tan(radians(ymax)) + 1.0)) / pi()) / 2.0 * pow(2.0, z.z)) AS INT), 0), CAST(pow(2.0, z.z) AS INT) - 1) AS y0,
         LEAST(GREATEST(CAST(floor((1.0 - ln(tan(radians(ymin)) + sqrt(tan(radians(ymin)) * tan(radians(ymin)) + 1.0)) / pi()) / 2.0 * pow(2.0, z.z)) AS INT), 0), CAST(pow(2.0, z.z) AS INT) - 1) AS y1
  FROM f CROSS JOIN (SELECT unnest(range({maxz} + 1)) AS z) z
),
assigned AS (
  SELECT fid, CAST(z AS INT) AS z, CAST(xx.x AS INT) AS x, CAST(yy.y AS INT) AS y,
         x0, x1, y0, y1
  FROM t, unnest(range(x0, x1 + 1)) AS xx(x), unnest(range(y0, y1 + 1)) AS yy(y)
)
"""


def _tiles_assign_sql() -> str:
    _, values = _zone_bbox_values(("zones_grid", "zones_overlap"))
    return (
        f"WITH f(fid, xmin, ymin, xmax, ymax) AS (VALUES {values}),\n"
        + _TILE_MATH_SQL.format(maxz=_TILE_MAX_ZOOM)
        + "SELECT fid, z, x, y FROM assigned"
    )


# --- true polygon rings through the MVT wire format (K2 fidelity) -------------

_RINGS_MAX_ZOOM = 3


def _tiles_encode_rings_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 end-to-end at feature-content fidelity: zones (real polygons,
    incl. a triangle with a hole) → tile assignment → MVT encode with true
    clipped/simplified rings (executor-side, real protobuf bytes) → MVT
    decode → one row per ring vertex. The oracle rebuilds the same vertices
    from the fixture WKB through the shared kernel, so a single flipped
    bit anywhere in project/simplify/clip/winding/zigzag/varint shows up
    as a hash mismatch. Replaces the reference's tippecanoe geometry cut
    (pipeline/processing/tiles.py:16-29)."""
    from sids_data_pipeline_spark.operators.zonal import _zone_bboxes
    from sids_data_pipeline_spark.sinks.tiles import assign_tiles, encode_tiles

    zones = fixture_zones(spark, "zones_overlap").select("fid", "geometry")
    feats = _zone_bboxes(zones).select(
        "fid", "geometry", "xmin", "ymin", "xmax", "ymax"
    )
    assigned = assign_tiles(feats, max_zoom=_RINGS_MAX_ZOOM)
    encoded = encode_tiles(
        assigned, ["fid", "geometry"], geometry_col="geometry",
        max_zoom=_RINGS_MAX_ZOOM,
    )

    def explode_rings(batches):
        import pandas as pd

        from sids_data_pipeline_spark.functions import mvt

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                layer = mvt.decode_tile(bytes(r.pbf))["features"]
                for feat in layer["features"]:
                    for ri, ring in enumerate(feat["rings"]):
                        for vi, (px, py) in enumerate(ring):
                            rows.append(
                                (int(r.z), int(r.x), int(r.y),
                                 int(feat["props"]["fid"]), ri, vi,
                                 int(px), int(py))
                            )
            yield pd.DataFrame(
                rows,
                columns=["z", "x", "y", "fid", "ring", "vertex", "px", "py"],
            )

    return encoded.mapInPandas(
        explode_rings,
        "z int, x int, y int, fid long, ring int, vertex int, px long, py long",
    )


def _tiles_encode_rings_sql() -> str:
    """Expected vertices computed once from the same fixture WKB through
    the shared geometry kernel (fixture-VALUES oracle, like the GeoJSONL
    entry): the engine side still has to push real bytes through the MVT
    wire format and back on executors to match it."""
    import math as m

    from sids_data_pipeline_spark.sinks.tiles import (
        DEFAULT_SIMPLIFY_TOL,
        geometry_tile_rings,
    )

    def tx(lon, z):
        return m.floor((lon + 180.0) / 360.0 * 2.0 ** z)

    def ty(lat, z):
        # mirrors _tile_y term-for-term (same float op order)
        t = m.tan(m.radians(lat))
        asinh_t = m.log(t + m.sqrt(t * t + 1.0))
        mercator = 1.0 - asinh_t / m.pi
        return m.floor(mercator / 2.0 * 2.0 ** z)

    def clamp(v, z):
        # mirrors assign_tiles' [0, 2^z - 1] clamp (tiles.py) — lon=180
        # or the mercator lat cutoff must index the edge tile here too,
        # not a phantom tile the engine never emits
        return min(max(v, 0), int(2.0 ** z) - 1)

    rows = []
    for fid, _name, wkb in FIXTURE_BUILDERS["zones_overlap"]():
        xmin, ymin, xmax, ymax = geo.wkb_bbox(wkb)
        for z in range(_RINGS_MAX_ZOOM + 1):
            tol = DEFAULT_SIMPLIFY_TOL if z < _RINGS_MAX_ZOOM else 0.0
            for x in range(clamp(tx(xmin, z), z), clamp(tx(xmax, z), z) + 1):
                for y in range(clamp(ty(ymax, z), z), clamp(ty(ymin, z), z) + 1):
                    rings = geometry_tile_rings(wkb, z, x, y, simplify_tol=tol)
                    for ri, ring in enumerate(rings):
                        for vi, (px, py) in enumerate(ring):
                            rows.append(
                                f"({z}, {x}, {y}, {fid}, {ri}, {vi}, {px}, {py})"
                            )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(z, x, y, fid, ring, vertex, px, py)"
    )


def _tiles_drop_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.sinks.tiles import assign_tiles, drop_densest

    out = drop_densest(
        assign_tiles(_tile_features(spark), max_zoom=_TILE_MAX_ZOOM),
        max_features_per_tile=_TILE_KEEP,
    )
    return out.select("fid", "z", "x", "y")


def _tiles_drop_sql() -> str:
    _, values = _zone_bbox_values(("zones_grid", "zones_overlap"))
    return (
        f"WITH f(fid, xmin, ymin, xmax, ymax) AS (VALUES {values}),\n"
        + _TILE_MATH_SQL.format(maxz=_TILE_MAX_ZOOM)
        + f""",
ranked AS (
  SELECT a.fid, a.z, a.x, a.y,
         ROW_NUMBER() OVER (
           PARTITION BY a.z, a.x, a.y
           ORDER BY (f.xmax - f.xmin) * (f.ymax - f.ymin) DESC, a.fid ASC) AS rnk
  FROM assigned a JOIN f ON f.fid = a.fid
)
SELECT fid, z, x, y FROM ranked WHERE rnk <= {_TILE_KEEP}
"""
    )


_SITES = (
    (1, -20.0, 30.0),
    (2, 10.0, -60.0),
    (3, 0.0, 100.0),
    (4, -30.0, -150.0),
    (5, 25.0, 0.0),
)


def _geo_nearest_site(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-site assignment by great-circle distance: 5 literal sites
    folded into one codegen projection, struct-min argmin with meter
    rounding (absorbs cross-engine libm ulps). Points derive
    arithmetically from orders within the reference's working belt."""
    from sids_data_pipeline_spark.functions.crs import nearest_site
    from sids_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, "orders", sf_dir)
    pts = orders.filter(F.col("o_orderkey") % 15 == 0).select(
        F.col("o_orderkey").alias("pid"),
        ((F.col("o_orderkey") % 120) / 2.0 - 30.0).alias("lat"),
        ((F.col("o_custkey") % 360) - 180.0).alias("lon"),
    )
    return nearest_site(pts, list(_SITES))


def _geo_nearest_site_sql() -> str:
    sites_values = ", ".join(f"({sid}, {lat}, {lon})" for sid, lat, lon in _SITES)
    return f"""
WITH pts AS (
  SELECT o_orderkey AS pid,
         (o_orderkey % 120) / 2.0 - 30.0 AS lat,
         (o_custkey % 360) - 180.0 AS lon
  FROM orders WHERE o_orderkey % 15 = 0
),
sites(site_id, slat, slon) AS (VALUES {sites_values}),
d AS (
  -- dist_m computed ONCE; the argmin below orders by the same column,
  -- so formula edits cannot desynchronize ranking from reporting
  SELECT pid, lat, lon, CAST(site_id AS BIGINT) AS site_id,
         CAST(ROUND(
           (2.0 * 6371008.8) * asin(sqrt(
             sin((slat - lat) * (3.141592653589793 / 180.0) / 2)
               * sin((slat - lat) * (3.141592653589793 / 180.0) / 2)
             + cos(lat * (3.141592653589793 / 180.0))
               * cos(slat * (3.141592653589793 / 180.0))
               * sin((slon - lon) * (3.141592653589793 / 180.0) / 2)
               * sin((slon - lon) * (3.141592653589793 / 180.0) / 2)
           ))) AS BIGINT) AS dist_m
  FROM pts CROSS JOIN sites
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY pid
                               ORDER BY dist_m ASC, site_id ASC) AS rn
  FROM d
)
SELECT pid, lat, lon, site_id, dist_m FROM ranked WHERE rn = 1
"""


def _geo_zone_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Area/ST_Length-style zone metrics: twice the signed shoelace
    area and the ring perimeter, both as exact integer micros (per-edge
    terms round before the sum — plans/base.py policy). Arrow-batched
    Python kernel (geometry work is the legitimate pandas-UDF case);
    the generated oracle recomputes every edge term as SQL arithmetic
    on the same literal vertices."""
    from pyspark.sql.functions import pandas_udf

    zones = fixture_zones(spark, "zones_overlap")

    @pandas_udf("long")
    def area2_e6(wkb: pd.Series) -> pd.Series:
        return wkb.map(geo.wkb_area2_e6)

    @pandas_udf("long")
    def perim_e6(wkb: pd.Series) -> pd.Series:
        return wkb.map(geo.wkb_perimeter_e6)

    return zones.select(
        "fid",
        area2_e6("geometry").alias("area2_e6"),
        perim_e6("geometry").alias("perim_e6"),
    ).orderBy("fid")


def _zone_metrics_sql() -> str:
    """Per-zone per-edge shoelace/hypotenuse terms as literal SQL
    arithmetic — same IEEE ops on the same vertex doubles, same
    half-away rounding, integer sums."""
    rows = []
    for fid, _name, wkb in FIXTURE_BUILDERS["zones_overlap"]():
        a_terms, p_terms = [], []
        for poly in geo.parse_wkb(wkb):
            for ring in poly:
                pts = [(float(x), float(y)) for x, y in ring]
                for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:]):
                    a_terms.append(
                        f"CAST(ROUND(({x0!r} * {y1!r} - {x1!r} * {y0!r})"
                        f" * 1000000) AS BIGINT)"
                    )
                    p_terms.append(
                        f"CAST(ROUND(SQRT(({x1!r} - {x0!r}) * ({x1!r} - {x0!r})"
                        f" + ({y1!r} - {y0!r}) * ({y1!r} - {y0!r}))"
                        f" * 1000000) AS BIGINT)"
                    )
        rows.append(
            f"({fid}, CAST({' + '.join(a_terms)} AS BIGINT),"
            f" CAST({' + '.join(p_terms)} AS BIGINT))"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(fid, area2_e6, perim_e6) ORDER BY fid"
    )


def _geo_zone_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Centroid-style zone centroids: shoelace numerator terms and
    twice-area as exact integer micros (per-edge rounding, plans/base.py
    policy), then ONE IEEE division — the generated oracle recomputes
    every edge term as literal SQL arithmetic. Holes (zones_overlap fid
    4) subtract consistently from numerators and area."""
    from pyspark.sql.functions import pandas_udf

    zones = fixture_zones(spark, "zones_overlap")

    @pandas_udf("sx long, sy long, a2 long")
    def terms(wkb: pd.Series) -> pd.DataFrame:
        vals = wkb.map(geo.wkb_centroid_terms_e6)
        return pd.DataFrame(
            {"sx": [v[0] for v in vals], "sy": [v[1] for v in vals],
             "a2": [v[2] for v in vals]}
        )

    t = zones.select("fid", terms("geometry").alias("_t")).select(
        "fid", F.col("_t.sx").alias("sx"), F.col("_t.sy").alias("sy"),
        F.col("_t.a2").alias("a2"),
    )
    safe = F.when(F.col("a2") != 0, F.col("a2") * 3.0)
    return t.select(
        "fid",
        F.round(F.col("sx") / safe, 9).alias("cx"),
        F.round(F.col("sy") / safe, 9).alias("cy"),
    ).orderBy("fid")


def _zone_centroid_sql() -> str:
    rows = []
    for fid, _name, wkb in FIXTURE_BUILDERS["zones_overlap"]():
        sx_t, sy_t, a_t = [], [], []
        for poly in geo.parse_wkb(wkb):
            for ring in poly:
                pts = [(float(x), float(y)) for x, y in ring]
                for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:]):
                    cross = f"({x0!r} * {y1!r} - {x1!r} * {y0!r})"
                    sx_t.append(
                        f"CAST(ROUND(({x0!r} + {x1!r}) * {cross} * 1000000)"
                        " AS BIGINT)"
                    )
                    sy_t.append(
                        f"CAST(ROUND(({y0!r} + {y1!r}) * {cross} * 1000000)"
                        " AS BIGINT)"
                    )
                    a_t.append(f"CAST(ROUND({cross} * 1000000) AS BIGINT)")
        rows.append(
            f"({fid}, CAST({' + '.join(sx_t)} AS BIGINT),"
            f" CAST({' + '.join(sy_t)} AS BIGINT),"
            f" CAST({' + '.join(a_t)} AS BIGINT))"
        )
    return (
        "WITH t(fid, sx, sy, a2) AS (VALUES "
        + ", ".join(rows)
        + ") SELECT fid, ROUND(sx / NULLIF(a2 * 3.0, 0.0), 9) AS cx, "
        "ROUND(sy / NULLIF(a2 * 3.0, 0.0), 9) AS cy FROM t ORDER BY fid"
    )


def _geo_zone_area_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Area(geography)-style spherical zone area (Chamberlain &
    Duquette edge sum on the IUGG mean sphere), exact integer m² by
    per-edge rounding; the oracle re-derives every edge term from
    PRE-COMPUTED radian literals of the same vertices."""
    from pyspark.sql.functions import pandas_udf

    zones = fixture_zones(spark, "zones_overlap")

    @pandas_udf("long")
    def area_m2(wkb: pd.Series) -> pd.Series:
        return wkb.map(geo.wkb_area_sphere_m2)

    return zones.select(
        "fid", area_m2("geometry").alias("area_m2")
    ).orderBy("fid")


def _zone_area_sphere_sql() -> str:
    import math as _math

    half_r2 = geo.SPHERE_RADIUS_M * geo.SPHERE_RADIUS_M / 2.0
    rows = []
    for fid, _name, wkb in FIXTURE_BUILDERS["zones_overlap"]():
        terms = []
        for poly in geo.parse_wkb(wkb):
            for ring in poly:
                rad = [
                    (_math.radians(float(x)), _math.radians(float(y)))
                    for x, y in ring
                ]
                for (l0, p0), (l1, p1) in zip(rad[:-1], rad[1:]):
                    terms.append(
                        f"CAST(ROUND(({l1!r} - {l0!r}) * "
                        f"(2.0 + sin({p0!r}) + sin({p1!r})) * {half_r2!r})"
                        " AS BIGINT)"
                    )
        rows.append(f"({fid}, CAST({' + '.join(terms)} AS BIGINT))")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(fid, area_m2) ORDER BY fid"
    )


# Non-pixel-aligned rects over the 64x64 0.1-degree gradient raster:
# fractional weights on every boundary edge, varying interior sizes.
# Literal bounds shared by engine and generated oracle; the empty-zone
# NULL row is pinned by tests/test_zonal.py instead.
_WEIGHTED_RECTS: list[tuple[int, tuple[float, float, float, float]]] = [
    (1, (0.13, 0.07, 0.52, 0.61)),
    (2, (0.33, 0.42, 0.78, 0.79)),
    (3, (0.0, 0.0, 0.8, 0.8)),
    (4, (0.95, 0.9, 1.2, 1.1)),
]


def _zonal_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region-weighted zonal mean (the reference's ST_DumpAsPolygons
    area-weighting, stats.py:8-16) for rectangle zones: closed-form
    overlap weights, all in codegen — zero Python nodes."""
    from sids_data_pipeline_spark.operators.zonal import zonal_weighted_rects

    zones = spark.createDataFrame(
        [(fid, geo.box_wkb(*bounds)) for fid, bounds in _WEIGHTED_RECTS],
        "fid long, geometry binary",
    )
    pixels = synthetic_raster(spark, "rast_gradient")
    return zonal_weighted_rects(zones, pixels, pixel_deg=0.1)


def _zonal_weighted_sql() -> str:
    arms = []
    for fid, bounds in _WEIGHTED_RECTS:
        arms.append(f"""
SELECT {fid} AS fid, CAST(SUM(w_e6) AS BIGINT) AS w_e6_sum,
       CAST(ROUND(CAST(SUM(w_e6 * val_cents) AS DOUBLE) / SUM(w_e6))
            AS BIGINT) AS wmean_cents
FROM (
  SELECT {_o_rect_w(bounds)} AS w_e6,
         CAST(ROUND(val * 100) AS BIGINT) AS val_cents
  FROM px
) t WHERE w_e6 > 0""")
    return (
        f"WITH {_px_cte('rast_gradient')}\n"
        + "SELECT * FROM ("
        + "\nUNION ALL\n".join(arms)
        + ") u ORDER BY fid"
    )


def _o_rect_w(bounds: tuple[float, float, float, float],
              pixel_deg: float = 0.1) -> str:
    """SQL twin of operators.zonal._overlap_w_e6 for one literal rect.
    h and inv DERIVE from pixel_deg exactly as the engine's
    _overlap_w_e6 derives them — one parameter on both sides, so the
    pair cannot desynchronize if the fixture pixel size changes."""
    h = pixel_deg / 2.0
    inv = 1e6 / (pixel_deg * pixel_deg)
    xmin, ymin, xmax, ymax = bounds
    return (
        f"CAST(ROUND("
        f"GREATEST(0.0, LEAST({xmax!r}, lon + {h!r}) - GREATEST({xmin!r}, lon - {h!r}))"
        f" * GREATEST(0.0, LEAST({ymax!r}, lat + {h!r}) - GREATEST({ymin!r}, lat - {h!r}))"
        f" * {inv!r}) AS BIGINT)"
    )


def _zonal_touched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """all_touched inclusivity (SURVEY §7): every cell with positive
    overlap counts, unweighted — compare n_pixels with the center-rule
    count on the same non-aligned rects."""
    from sids_data_pipeline_spark.operators.zonal import zonal_touched_rects

    zones = spark.createDataFrame(
        [(fid, geo.box_wkb(*bounds)) for fid, bounds in _WEIGHTED_RECTS],
        "fid long, geometry binary",
    )
    pixels = synthetic_raster(spark, "rast_gradient")
    return zonal_touched_rects(zones, pixels, pixel_deg=0.1)


def _zonal_touched_sql() -> str:
    # same rounded ppm-weight predicate as the engine (a raw > 0 on the
    # float overlap diverges on zero-measure touches: DuckDB decimal
    # literals vs Spark doubles disagree by one ulp at cell boundaries)
    arms = []
    for fid, bounds in _WEIGHTED_RECTS:
        arms.append(f"""
SELECT {fid} AS fid, COUNT(*) AS n_pixels,
       CAST(ROUND(CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS DOUBLE)
                  / COUNT(*)) AS BIGINT) AS mean_cents
FROM px WHERE {_o_rect_w(bounds)} > 0""")
    return (
        f"WITH {_px_cte('rast_gradient')}\n"
        + "SELECT * FROM ("
        + "\nUNION ALL\n".join(arms)
        + ") u ORDER BY fid"
    )


QUERIES: list[Query] = [
    Query(
        "zonal_all_touched",
        _zonal_touched,
        _zonal_touched_sql(),
        doc="all_touched zonal stats (positive-overlap inclusivity, "
            "PostGIS/GDAL convention) for rect zones — pure-codegen "
            "predicate, SURVEY section-7 option delivered",
        tags=("geo", "zonal", "aggregate"),
    ),
    Query(
        "zonal_weighted_mean",
        _zonal_weighted,
        _zonal_weighted_sql(),
        doc="region-weighted zonal mean (reference ST_DumpAsPolygons "
            "semantics) for rect zones: closed-form ppm overlap weights, "
            "exact integer numerator/denominator, zero Python nodes",
        tags=("geo", "zonal", "aggregate"),
    ),
    Query(
        "geo_zone_metrics",
        _geo_zone_metrics,
        _zone_metrics_sql(),
        doc="shoelace area + perimeter per zone in exact integer micros "
            "(per-edge rounding, oracle mirrors every term)",
        tags=("geo", "scalar"),
    ),
    Query(
        "geo_dwithin_join",
        _geo_dwithin_join,
        _geo_dwithin_sql(),
        doc="ST_DWithin parity: within-radius point join via lat/lon "
            "grid buckets + 3×3 explode + exact haversine refine — "
            "never a cross join; brute-force oracle",
        tags=("geo", "join"),
    ),
    Query(
        "geo_zone_area_sphere",
        _geo_zone_area_sphere,
        _zone_area_sphere_sql(),
        doc="ST_Area(geography) parity: Chamberlain-Duquette spherical "
            "edge sum on the IUGG mean sphere, exact integer m² "
            "(per-edge-literal SQL oracle)",
        tags=("geo", "scalar"),
    ),
    Query(
        "geo_zone_centroid",
        _geo_zone_centroid,
        _zone_centroid_sql(),
        doc="ST_Centroid parity: shoelace numerators + twice-area in "
            "exact integer micros, one IEEE division; holes subtract "
            "consistently (per-edge-literal SQL oracle)",
        tags=("geo", "scalar"),
    ),
    Query(
        "geo_nearest_site",
        _geo_nearest_site,
        _geo_nearest_site_sql(),
        doc="great-circle nearest-site assign: literal site matrix in one "
            "codegen projection, struct-min argmin, meter-rounded",
        tags=("geo", "similarity"),
    ),
    Query(
        "crs_reproject",
        _crs_reproject,
        _CRS_SQL,
        doc="P9/F8: Web Mercator → WGS-84, closed-form column math",
        tags=("geo", "scalar"),
    ),
    Query(
        "crs_reproject_utm",
        _crs_reproject_utm,
        _crs_utm_sql(),
        doc="P9/F8: WGS-84 ↔ UTM 33N, closed-form transverse Mercator both legs",
        tags=("geo", "scalar"),
    ),
    Query(
        "crs_reproject_lcc",
        _crs_reproject_lcc,
        _crs_lcc_sql(),
        doc="P9/F8: WGS-84 ↔ Lambert-93 (LCC 2SP), closed form both legs",
        tags=("geo", "scalar"),
    ),
    Query(
        "raster_geotiff_ingest",
        _geotiff_ingest_query,
        _geotiff_ingest_sql(),
        doc="S5: ZSTD+tiled GeoTIFF (reference profile) → distributed "
            "pixel ingest, lattice-oracle-verified",
        tags=("geo", "source"),
    ),
    Query(
        "crs_reproject_albers",
        _crs_reproject_albers,
        _crs_albers_sql(),
        doc="P9/F8: WGS-84 ↔ NAD83/Conus Albers (EPSG:5070, Snyder §14), "
            "closed form both legs incl. authalic-series inverse; forward "
            "leg pinned to Snyder's published worked example in pytest",
        tags=("geo", "scalar"),
    ),
    Query(
        "crs_reproject_polar",
        _crs_reproject_polar,
        _crs_polar_sql(),
        doc="P9/F8: WGS-84 ↔ NSIDC polar stereographic North (EPSG:3413, "
            "Snyder §21 / EPSG 9829 variant B), closed form both legs "
            "incl. conformal-series inverse + antimeridian wrap; forward "
            "leg pinned to the EPSG Guidance 7-2 worked example in pytest",
        tags=("geo", "scalar"),
    ),
    Query(
        "raster_mosaic",
        _raster_mosaic_query,
        _RASTER_MOSAIC_SQL,
        doc="gdal_merge parity: last-wins compositing of overlapping "
            "rasters in ONE max_by shuffle, nodata-transparent, unknown "
            "rasters rejected in-plan; closed-form winner oracle",
        tags=("geo", "source"),
    ),
    Query(
        "crs_standardize_mixed",
        _crs_standardize_mixed_query,
        _CRS_STANDARDIZE_MIXED_SQL,
        doc="per-row mixed-CRS standardization: four families (UTM, "
            "3857, polar 3413, NZTM 2193) through ONE standardize_crs "
            "CASE, round-trip-gated vs source coordinates (the sibling "
            "crs_reproject_* entries carry the per-family value mirrors)",
        tags=("geo", "scalar"),
    ),
    Query(
        "pipeline_end_to_end",
        _pipeline_end_to_end_query,
        _pipeline_end_to_end_sql(),
        doc="composed Entry-1 lifecycle (X1): run_pipeline over the "
            "2-pair estate, artifacts read back from disk (geojsonl "
            "means + tiles parquet counts), P6 idempotency pinned "
            "in-gate (second run pending=0)",
        tags=("geo", "pipeline", "sink"),
    ),
    Query(
        "crs_reproject_krovak",
        _crs_reproject_krovak,
        _crs_krovak_sql(),
        doc="Krovak oblique conformal conic (EPSG 9819, S-JTSK 5514 "
            "East-North): CZ/SK grid forward + closed-form conformal-"
            "latitude inverse (Snyder series; fixed-point unrolling is "
            "deliberately avoided, see functions/crs.py), term-for-term "
            "SQL mirror, 1 m forward quantum + round-trip tolerance gate",
        tags=("geo", "scalar"),
    ),
    Query(
        "crs_standardize_datum",
        _crs_standardize_datum_query,
        _CRS_STANDARDIZE_DATUM_SQL,
        doc="per-row DATUM-SHIFTED standardization: OSGB 27700 + Irish "
            "29902 + Krovak 5514 (two projection families) through one "
            "Arrow kernel (inverse_np numpy twins of the unproject+"
            "Helmert+Bowring column forms, per-code masks) unioned with "
            "the JVM CASE path for datum-free rows; round-trip-gated vs "
            "source coordinates",
        tags=("geo", "scalar", "arrow"),
    ),
    Query(
        "raster_contour",
        _raster_contour_query,
        _RASTER_CONTOUR_SQL,
        doc="gdal_contour parity: marching squares (saddle-aware) + "
            "per-level polyline chaining, gated on the exact-on-linear-"
            "fields property (analytic straddle counts, line-in-box "
            "endpoints, closed-form chord length)",
        tags=("geo", "scalar"),
    ),
    Query(
        "raster_polygonize",
        _raster_polygonize_query,
        _RASTER_POLYGONIZE_SQL,
        doc="gdal_polygonize parity: clump labels → boundary-face joins "
            "→ saddle-aware ring walk → MultiPolygon with holes, gated "
            "on first-principles scalars (area conservation, taxicab "
            "perimeter, ring counts, bbox)",
        tags=("geo", "scalar"),
    ),
    Query(
        "vector_clip_extent",
        _vector_clip_query,
        _VECTOR_CLIP_SQL,
        doc="ingest-time working-extent clip for vectors (reference "
            "config.py:12-15): Sutherland–Hodgman per ring vs a closed-"
            "form intersection-algebra oracle; holes, drop-outs, and "
            "hypotenuse intersection points all value-checked",
        tags=("geo", "scalar"),
    ),
    Query(
        "geo_validity_report",
        _geo_validity_query,
        _geo_validity_sql(),
        doc="F7 diagnostic half of -makevalid: bow-tie/pinch detection "
            "via segment-pair algebra, mirrored independently in SQL; "
            "ring/vertex counts + winding canonicality",
        tags=("geo", "scalar"),
    ),
    Query(
        "vector_reproject_zones",
        _vector_reproject_query,
        _vector_reproject_sql(),
        doc="ogr2ogr -t_srs parity: distributed WKB vertex explode → "
            "closed-form NZTM column math → WKB rebuild, every vertex "
            "value-checked vs DuckDB's independent TM evaluation",
        tags=("geo", "scalar"),
    ),
    Query(
        "crs_reproject_tm",
        _crs_reproject_tm,
        _crs_tm_sql(),
        doc="P9/F8: WGS-84 ↔ NZTM (EPSG:2193), the generalized national-"
            "grid transverse Mercator (arbitrary k0/lat0/lon0/FE/FN), "
            "closed form both legs; the OSGB sibling (27700, Airy + "
            "7-param Helmert) is pinned to the OS and EPSG Guidance 7-2 "
            "worked examples in pytest",
        tags=("geo", "scalar"),
    ),
    Query(
        "crs_reproject_sinu",
        _crs_reproject_sinu,
        _crs_sinu_sql(),
        doc="P9/F8: WGS-84 ↔ MODIS sinusoidal (R=6371007.181), spherical "
            "closed form both legs",
        tags=("geo", "scalar"),
    ),
    Query(
        "streaming_raster_ingest",
        _streaming_raster_query,
        _streaming_raster_sql(),
        doc="SURVEY §7 Structured Streaming ingest wrapper: file-source "
            "checkpoint as the P6 ledger, availableNow drain, FULL "
            "lattice oracle (deterministic over a static directory)",
        tags=("geo", "source", "streaming"),
    ),
    Query(
        "raster_bigtiff_ingest",
        _bigtiff_ingest_query,
        _bigtiff_ingest_sql(),
        doc="S5 on BigTIFF (version 43, LONG8 offsets — how >4 GiB "
            "rasters ship), pure-python decode, lattice-oracle-verified",
        tags=("geo", "source"),
    ),
    Query(
        "raster_warp_bilinear",
        _raster_warp_bilinear,
        _raster_warp_sql(),
        doc="F8 grid warp (gdalwarp -t_srs/-tr/-r bilinear parity): "
            "distributed target lattice, closed-form Mercator inverse leg, "
            "integer-key corner equi-joins, nodata-aware weight "
            "normalisation — two shuffles regardless of raster size",
        tags=("geo", "raster"),
    ),
    Query(
        "raster_warp_average",
        _raster_warp_average,
        _raster_warp_average_sql(),
        doc="F8 downsampling warp (gdalwarp -r average parity): forward "
            "source→target mapping, one map-side-combined groupBy, "
            "nodata-aware contributor mean",
        tags=("geo", "raster"),
    ),
    Query(
        "raster_burn",
        _raster_burn,
        _raster_burn_sql(),
        doc="gdal_rasterize parity: center rule, highest-fid-wins, "
            "grid-cell equi-join + ray-cast refine (the verified zonal "
            "join inverted), sub-pixel and holed-polygon edge cases",
        tags=("geo", "raster"),
    ),
    Query(
        "raster_slope_aspect",
        _raster_slope_aspect,
        _raster_slope_aspect_sql(),
        doc="gdaldem slope+aspect (Horn 3×3, steepest-descent aspect, "
            "flat→NULL): same single-shuffle window reassembly as "
            "hillshade, scalar-SQL oracle",
        tags=("geo", "raster"),
    ),
    Query(
        "raster_proximity",
        _raster_proximity,
        _raster_proximity_sql(),
        doc="gdal_proximity -maxdist parity: exact euclidean distance to "
            "the nearest target within the radius via a 3×3 bucket-"
            "neighbourhood equi-join — never all-pairs",
        tags=("geo", "raster"),
    ),
    Query(
        "raster_pyramid_estate",
        _raster_pyramid_estate,
        _raster_pyramid_estate_sql(),
        doc="estate-capable overviews: two rasters pyramid in ONE shuffle "
            "via group_cols, blocks never mix rasters; oracle unions the "
            "closed-form per-raster pyramids",
        tags=("geo", "raster"),
    ),
    Query(
        "raster_sieve_fill",
        _raster_sieve_fill,
        _raster_sieve_fill_sql(),
        doc="gdal_sieve fill: speckles merge into the largest adjacent "
            "region (clump + adjacency join + argmax); oracle is the "
            "speckle-free closed-form lattice",
        tags=("geo", "raster", "graph"),
    ),
    Query(
        "raster_clump",
        _raster_clump,
        _raster_clump_sql(),
        doc="r.clump/gdal_sieve grouping: 4-connected equal-value regions, "
            "integer-key neighbour join + Pregel min-label, closed-form "
            "region oracle",
        tags=("geo", "raster", "graph"),
    ),
    Query(
        "raster_pyramid",
        _raster_pyramid,
        _raster_pyramid_sql(),
        doc="gdaladdo -r average parity: 3 overview levels in ONE "
            "map-side-combined groupBy, nodata-aware block means, "
            "auditable contributor counts",
        tags=("geo", "raster"),
    ),
    Query(
        "raster_hillshade",
        _raster_hillshade,
        _raster_hillshade_sql(),
        doc="gdaldem hillshade parity (Horn 3×3, az 315°/alt 45°): "
            "9-neighbor explode + integer-key groupBy, full-window-only "
            "nodata contract, scalar-SQL oracle",
        tags=("geo", "raster"),
    ),
    Query(
        "raster_lzw_ingest",
        _lzw_ingest_query,
        _lzw_ingest_sql(),
        doc="S5 on the NASA/USGS default foreign profile: uint16 + LZW "
            "(TIFF early-change variant) + horizontal predictor 2, "
            "pure-python decode, lattice-oracle-verified",
        tags=("geo", "source"),
    ),
    Query(
        "raster_multiband_band2",
        _multiband_band2_query,
        _multiband_band2_sql(),
        doc="P4 on a foreign raster: 3-band planar+deflate GeoTIFF, "
            "band-2 selection at decode time (gdal_translate -b parity)",
        tags=("geo", "source"),
    ),
    Query(
        "source_geotiff_datasource",
        _geotiff_datasource_query,
        _geotiff_ingest_sql(),
        doc="S5 via the Spark 4 Python DataSource API: geotiff as a "
            "registered format, one planned partition per file, Arrow "
            "batches executor-side; value-identical to the ingest path",
        tags=("geo", "source"),
    ),
    Query(
        "vector_geopackage_ingest",
        _gpkg_ingest_query,
        _gpkg_ingest_sql(),
        doc="S6: GeoPackage write → ingest round-trip, WKB hex-verified",
        tags=("geo", "source"),
    ),
    Query(
        "vector_shapefile_ingest",
        _shapefile_ingest_query,
        _shapefile_ingest_sql(),
        doc="S4: shapefile write → ingest round-trip (.shp winding rule, "
            ".dbf attributes, .prj CRS gate), WKB hex-verified",
        tags=("geo", "source"),
    ),
    Query(
        "streaming_vector_ingest",
        _streaming_vector_ingest_query,
        _shapefile_ingest_sql(),
        doc="S4 via the streaming drop-folder path: file-source "
            "checkpoint as the P6 ledger; byte-identical to the batch "
            "ingest (shared parser, shared oracle)",
        tags=("geo", "source", "streaming"),
    ),
    Query(
        "source_csv_roundtrip",
        _csv_roundtrip_query,
        _CSV_ROUNDTRIP_SQL,
        doc="S2/K6: header CSV sink → schema-pinned scan, lossless vs the "
            "parquet table",
        tags=("source", "sink"),
    ),
    Query(
        "sink_json_roundtrip",
        _json_roundtrip_query,
        _JSON_ROUNDTRIP_SQL,
        doc="K7: JSON-lines sink → schema-pinned scan, lossless vs the "
            "parquet table",
        tags=("source", "sink"),
    ),
    Query(
        "sink_geojsonl_roundtrip",
        _geojsonl_roundtrip_query,
        _geojsonl_sql(),
        doc="K1: zones → GeoJSONL shards → read-back, fixture-VALUES oracle",
        tags=("geo", "sink"),
    ),
    Query(
        "sink_orc_roundtrip",
        _orc_roundtrip_query,
        _ORC_ROUNDTRIP_SQL,
        doc="ORC sink → schema-pinned scan, lossless vs the parquet table "
            "(second columnar format for Hive/Trino estates)",
        tags=("source", "sink"),
    ),
    Query(
        "tiles_assign",
        _tiles_assign_query,
        _tiles_assign_sql(),
        doc="K2 slippy z/x/y assignment, pure column math",
        tags=("geo", "tiles"),
    ),
    Query(
        "tiles_density_drop",
        _tiles_drop_query,
        _tiles_drop_sql(),
        doc="O2 per-tile density-ranked drop (tippecanoe drop-densest semantics)",
        tags=("geo", "tiles", "window"),
    ),
    Query(
        "tiles_encode_rings",
        _tiles_encode_rings_query,
        _tiles_encode_rings_sql(),
        doc="K2 feature-content fidelity: true clipped+zoom-simplified "
            "polygon rings through the MVT wire format and back",
        tags=("geo", "tiles", "sink"),
    ),
    Query(
        "zonal_mean_broadcast",
        _zonal_query("zones_grid", "rast_gradient", ("mean",), "broadcast"),
        _zonal_sql("zones_grid", "rast_gradient", ("mean",)),
        doc="J1+A1+O1: zonal mean, broadcast filter-and-refine path",
        tags=("geo", "zonal"),
    ),
    Query(
        "zonal_mean_grid",
        _zonal_query("zones_grid", "rast_gradient", ("mean",), "grid"),
        _zonal_sql("zones_grid", "rast_gradient", ("mean",)),
        doc="J1 grid-cell equi-join path (the 100 TB strategy), same oracle",
        tags=("geo", "zonal"),
    ),
    Query(
        "zonal_multi_stats",
        _zonal_query(
            "zones_grid",
            "rast_nodata",
            ("mean", "count", "sum", "min", "max", "median"),
            "broadcast",
        ),
        _zonal_sql(
            "zones_grid", "rast_nodata", ("mean", "count", "sum", "min", "max", "median")
        ),
        doc="A1 superset with nodata handling; count=0 for empty zones",
        tags=("geo", "zonal"),
    ),
    Query(
        "zonal_mean_large",
        _zonal_large_factory("grid"),
        QUERIES_LARGE_SQL,
        doc="J1 at bench scale: 1M-pixel raster, grid path (kernel throughput)",
        tags=("geo", "zonal", "bench"),
    ),
    Query(
        "zonal_large_broadcast",
        _zonal_large_factory("broadcast"),
        QUERIES_LARGE_SQL,
        doc="J1 at bench scale, broadcast path: driver-built zone index, "
        "keys-only refine (no per-row WKB transfer)",
        tags=("geo", "zonal", "bench"),
    ),
    Query(
        "zonal_polygons",
        _zonal_query("zones_overlap", "rast_checker", ("mean", "count"), "grid"),
        _zonal_sql("zones_overlap", "rast_checker", ("mean", "count")),
        doc="F6 containment on real polygons (triangle with hole, overlaps, sub-pixel)",
        tags=("geo", "zonal"),
    ),
    Query(
        "raster_clip_band",
        _raster_clip_band,
        _CLIP_SQL,
        doc="P4 band select + P5 bbox clip, pushed-down filters",
        tags=("geo", "filter"),
    ),
    Query(
        "manifest_pending",
        _manifest_pending,
        _MANIFEST_SQL,
        doc="J3 crossJoin pairs + P6 anti-join incremental skip",
        tags=("manifest",),
    ),
]
