"""Distributed vector-geometry reprojection — the ogr2ogr ``-t_srs``
leg of the reference's vector import (pipeline/processing/inputs.py:
46-62), Spark-first.

The reference hands foreign-CRS vectors to ogr2ogr, which transforms
every vertex and rewrites the layer. Here the same job is three
declarative stages, each independently scalable:

1. **Explode** — ``mapInPandas`` parses each WKB MultiPolygon into a
   vertex table ``(key cols…, _poly, _ring, _vtx, lon, lat)``. One
   Arrow batch in, one out; no driver involvement.
2. **Transform** — the registered projections' EXISTING column
   expressions (functions/crs.py) run on the vertex columns verbatim:
   the same whole-stage-codegen math the raster path uses, no numpy
   twin to drift out of sync.
3. **Rebuild** — ``applyInPandas`` over the geometry key groups sorts
   vertices back into (poly, ring, vtx) order and re-encodes WKB.

Scale shape: vertices of one geometry form one group — the natural
partitioning key — so the single shuffle is by geometry id, and a
100 TB vector estate (continent-scale coastlines, parcel fabrics)
streams through without any geometry ever crossing executor-memory
bounds except its own vertex list (the same unit ogr2ogr holds in
memory). Zones tables are usually dimension-sized, where all three
stages collapse into a handful of tasks — but nothing here assumes it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sids_data_pipeline_spark.functions.geo import multipolygon_wkb, parse_wkb

_VERTEX_FIELDS = [
    T.StructField("_poly", T.IntegerType()),
    T.StructField("_ring", T.IntegerType()),
    T.StructField("_vtx", T.IntegerType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
]


def explode_vertices(
    zones: DataFrame, key_cols: list[str], geometry_col: str = "geometry"
) -> DataFrame:
    """WKB MultiPolygons → vertex rows (key cols + _poly/_ring/_vtx +
    lon/lat). NULL geometries emit no rows (they re-enter as NULL at
    rebuild time only if carried separately — reproject_zones handles
    that with a left join)."""
    key_fields = [zones.schema[c] for c in key_cols]
    out_schema = T.StructType(key_fields + _VERTEX_FIELDS)
    cols = key_cols + [geometry_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf[cols].itertuples(index=False, name=None):
                *keys, wkb = rec
                if wkb is None:
                    continue
                for pi, poly in enumerate(parse_wkb(bytes(wkb))):
                    for ri, ring in enumerate(poly):
                        for vi, (x, y) in enumerate(ring):
                            rows.append(
                                (*keys, pi, ri, vi, float(x), float(y))
                            )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return zones.select(*cols).mapInPandas(gen, out_schema)


def rebuild_wkb(
    vertices: DataFrame, key_cols: list[str], geometry_col: str = "geometry"
) -> DataFrame:
    """Vertex rows → one WKB MultiPolygon per key group (inverse of
    :func:`explode_vertices`). One shuffle, keyed by the geometry id."""
    key_fields = [vertices.schema[c] for c in key_cols]
    out_schema = T.StructType(
        key_fields + [T.StructField(geometry_col, T.BinaryType())]
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_poly", "_ring", "_vtx"])
        polys: list[list[list[tuple[float, float]]]] = []
        for (pi, ri), ring in pdf.groupby(["_poly", "_ring"], sort=True):
            while len(polys) <= pi:
                polys.append([])
            polys[pi].append(list(zip(ring["lon"], ring["lat"])))
        keys = [pdf.iloc[0][c] for c in key_cols]
        return pd.DataFrame(
            [(*keys, multipolygon_wkb(polys))],
            columns=[f.name for f in out_schema.fields],
        )

    return vertices.groupBy(*key_cols).applyInPandas(build, out_schema)


def reproject_zones(
    zones: DataFrame,
    src_epsg: int,
    dst_epsg: int = 4326,
    key_cols: tuple[str, ...] = ("vector_id", "fid"),
    geometry_col: str = "geometry",
) -> DataFrame:
    """Reproject every vertex of a ZONES-shaped table between CRSs —
    ogr2ogr ``-t_srs`` parity using the SAME closed-form column math as
    the raster path (reproject_pixels dispatch: 4326↔3857, UTM zones,
    and the LCC/Albers/sinusoidal/polar/TM registry). Identity when the
    codes match. NULL geometries pass through as NULL; all non-key,
    non-geometry columns (e.g. ``name``) are preserved."""
    from sids_data_pipeline_spark.functions.crs import reproject_pixels

    if src_epsg == dst_epsg:
        return zones
    keys = list(key_cols)
    verts = explode_vertices(zones, keys, geometry_col)
    moved = reproject_pixels(verts, src_epsg, dst_epsg)
    rebuilt = rebuild_wkb(moved, keys, geometry_col)
    return zones.drop(geometry_col).join(rebuilt, keys, "left").select(
        *zones.columns
    )


def _transform_wkb_driver(wkb: bytes, fn) -> bytes:
    """Driver-side twin for tests: apply ``fn(lon, lat) -> (x, y)`` to
    every vertex of a WKB MultiPolygon."""
    polys = parse_wkb(wkb)
    out = []
    for poly in polys:
        rings = []
        for ring in poly:
            rings.append([fn(float(x), float(y)) for x, y in ring])
        out.append(rings)
    return multipolygon_wkb(out)
