"""Vector clip to a working extent — the vector half of the reference's
ingest-time extent clip (``batch/processing/config.py:12-15`` pins the
pipeline to lon [−180, 180] × lat [−35, 35]; rasters get it via the warp
grid, vectors via this operator).

Clipping against an axis-aligned rectangle reuses the Sutherland–Hodgman
kernel the MVT tile encoder already trusts (functions/geo.clip_ring_rect)
— exterior rings and holes clip independently, which is valid for a
CONVEX clip window. Zones that fall entirely outside come back with NULL
geometry (survived = false) so the row-level bookkeeping (fid universe,
manifest joins) stays intact; filter on ``survived`` to drop them.

Scale shape: one ``mapInPandas`` pass over the geometry column — no
shuffle, no driver involvement; each geometry clips independently."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from sids_data_pipeline_spark.functions.geo import (
    clip_ring_rect,
    multipolygon_wkb,
    parse_wkb,
)


def wkb_clip_box(
    wkb: bytes, xmin: float, ymin: float, xmax: float, ymax: float
) -> bytes | None:
    """Clip one WKB Polygon/MultiPolygon to the rectangle; None when
    nothing survives. A polygon whose EXTERIOR vanishes drops entirely
    (its holes are meaningless without it)."""
    out = []
    for poly in parse_wkb(wkb):
        rings = []
        for k, ring in enumerate(poly):
            clipped = clip_ring_rect(ring, xmin, ymin, xmax, ymax)
            if clipped.shape[0] == 0:
                if k == 0:
                    rings = []
                    break
                continue  # a hole can vanish while the exterior survives
            rings.append([(float(x), float(y)) for x, y in clipped])
        if rings:
            out.append(rings)
    return multipolygon_wkb(out) if out else None


def clip_zones(
    zones: DataFrame,
    lon: tuple[float, float],
    lat: tuple[float, float],
    geometry_col: str = "geometry",
) -> DataFrame:
    """Clip every zone geometry to [lon0, lon1] × [lat0, lat1]; adds a
    ``survived`` boolean and NULLs the geometry of fully-outside zones
    (NULL input geometry stays NULL with survived = false)."""
    x0, x1 = sorted(map(float, lon))
    y0, y1 = sorted(map(float, lat))
    schema = T.StructType(
        list(zones.schema.fields) + [T.StructField("survived", T.BooleanType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            clipped = [
                wkb_clip_box(bytes(w), x0, y0, x1, y1) if w is not None else None
                for w in pdf[geometry_col]
            ]
            pdf[geometry_col] = clipped
            pdf["survived"] = [c is not None for c in clipped]
            yield pdf

    return zones.mapInPandas(gen, schema)


def clip_zones_to_reference_extent(zones: DataFrame) -> DataFrame:
    """The reference's published working extent (config.py:12-15)."""
    return clip_zones(zones, lon=(-180.0, 180.0), lat=(-35.0, 35.0))


__all__ = [
    "wkb_clip_box",
    "clip_zones",
    "clip_zones_to_reference_extent",
]
