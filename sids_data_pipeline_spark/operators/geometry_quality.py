"""Geometry validity reporting + safe normalisation — the honest subset
of ogr2ogr's ``-makevalid`` (reference pipeline/processing/inputs.py:51).

A full ST_MakeValid (node-and-rebuild via polygon clipping) needs a
computational-geometry engine and is documented out of scope. What a
pipeline actually needs first is (a) to KNOW which geometries are
invalid before zonal joins silently mis-count them, and (b) to repair
the repairs that are safe and deterministic:

* ``validity_report`` — per geometry: ring/vertex counts, proper
  self-intersection (bow-tie) and non-adjacent vertex-touch (pinch)
  detection via a vectorized numpy segment-pair test, and winding
  canonicality. Detection scope: proper segment crossings and shared
  endpoints of non-adjacent segments; collinear-overlap degeneracy is
  not classified (it has measure zero under float inputs and
  node-and-rebuild is the only honest fix).
* ``normalize_zones`` — the safe repairs only: drop consecutive
  duplicate vertices, drop degenerate (<3 distinct points or zero-area)
  rings, rewrite winding to OGC-canonical (exterior CCW, holes CW).
  Self-intersecting rings are NOT repaired — they pass through and the
  report flags them (repairing would silently change area semantics).

Scale shape: both run as ``mapInPandas`` over the geometry column — one
Arrow batch in, one out, no shuffle; the O(n²) segment test is per-ring
numpy (admin-boundary rings are 10²-10⁴ vertices; a 10⁴-vertex ring is
~5·10⁷ vectorized comparisons, milliseconds)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from sids_data_pipeline_spark.functions.geo import (
    multipolygon_wkb,
    parse_wkb,
    ring_signed_area,
)


def ring_self_intersects(ring: np.ndarray) -> bool:
    """True when any two NON-ADJACENT segments of the closed ring
    intersect — proper crossings (bow-ties) and shared endpoints
    (pinch points) both count, matching OGC validity. Consecutive
    duplicate vertices are collapsed FIRST: a zero-length segment is a
    redundancy, not an intersection, and leaving it in would make
    index-adjacency diverge from geometric adjacency (the segments on
    either side of the duplicate share an endpoint legitimately)."""
    pts = np.asarray(ring, dtype=np.float64)[:-1]  # open ring
    if pts.shape[0] > 1:
        dup = np.all(pts == np.roll(pts, 1, axis=0), axis=1)
        if dup.any():
            pts = pts[~dup]
    n = pts.shape[0]
    if n < 4:
        return False
    b = np.roll(pts, -1, axis=0)
    i, j = np.triu_indices(n, k=2)
    keep = ~((i == 0) & (j == n - 1))  # first/last segments are adjacent
    i, j = i[keep], j[keep]
    p, r = pts[i], b[i] - pts[i]
    q, s = pts[j], b[j] - pts[j]

    def cross(u, v):
        return u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0]

    denom = cross(r, s)
    qp = q - p
    tnum, unum = cross(qp, s), cross(qp, r)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = tnum / denom
        u = unum / denom
    hit = (denom != 0.0) & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    return bool(hit.any())


def wkb_quality(wkb: bytes) -> tuple[int, int, int, bool, bool]:
    """(n_polys, n_rings, n_vertices, self_intersecting,
    winding_canonical) for one WKB Polygon/MultiPolygon."""
    polys = parse_wkb(wkb)
    n_rings = sum(len(p) for p in polys)
    n_vertices = sum(len(r) for p in polys for r in p)
    self_x = any(ring_self_intersects(r) for p in polys for r in p)
    winding_ok = all(
        (ring_signed_area(r) >= 0.0) == (k == 0)
        for p in polys
        for k, r in enumerate(p)
        if ring_signed_area(r) != 0.0
    )
    return len(polys), n_rings, n_vertices, self_x, winding_ok


_REPORT_FIELDS = [
    T.StructField("n_polys", T.IntegerType()),
    T.StructField("n_rings", T.IntegerType()),
    T.StructField("n_vertices", T.IntegerType()),
    T.StructField("self_intersecting", T.BooleanType()),
    T.StructField("winding_canonical", T.BooleanType()),
]


def validity_report(
    df: DataFrame, key_cols: list[str], geometry_col: str = "geometry"
) -> DataFrame:
    """Per-geometry validity facts (see module docstring). NULL
    geometries report NULL facts."""
    key_fields = [df.schema[c] for c in key_cols]
    out_schema = T.StructType(key_fields + _REPORT_FIELDS)
    cols = key_cols + [geometry_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf[cols].itertuples(index=False, name=None):
                *keys, wkb = rec
                if wkb is None:
                    rows.append((*keys, None, None, None, None, None))
                else:
                    rows.append((*keys, *wkb_quality(bytes(wkb))))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.select(*cols).mapInPandas(gen, out_schema)


def normalize_wkb(wkb: bytes) -> bytes | None:
    """The safe ``-makevalid`` subset: drop consecutive duplicate
    vertices, drop degenerate rings (fewer than 3 distinct points or
    exactly zero area), canonical winding. Returns None when nothing
    survives (fully degenerate input). Self-intersections pass through
    unchanged — flag via validity_report instead."""
    out_polys = []
    for poly in parse_wkb(wkb):
        rings = []
        for k, ring in enumerate(poly):
            pts = np.asarray(ring, dtype=np.float64)[:-1]
            dup = np.all(pts == np.roll(pts, 1, axis=0), axis=1)
            pts = pts[~dup] if dup.any() else pts
            if pts.shape[0] < 3:
                continue
            closed = np.vstack([pts, pts[:1]])
            area = ring_signed_area(closed)
            if area == 0.0:
                # zero signed area is degenerate ONLY when the ring is
                # simple (collinear sliver); a bow-tie's lobes cancel to
                # exactly zero too, and those must pass through for the
                # report to flag, not vanish silently
                if not ring_self_intersects(closed):
                    continue
            else:
                want_ccw = k == 0
                if (area > 0.0) != want_ccw:
                    closed = closed[::-1]
            rings.append([(float(x), float(y)) for x, y in closed])
        if rings:
            out_polys.append(rings)
    return multipolygon_wkb(out_polys) if out_polys else None


def normalize_zones(
    df: DataFrame, key_cols: list[str], geometry_col: str = "geometry"
) -> DataFrame:
    """Apply :func:`normalize_wkb` across a zones table (mapInPandas,
    no shuffle); all columns preserved, geometry replaced in place."""
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[geometry_col] = [
                normalize_wkb(bytes(w)) if w is not None else None
                for w in pdf[geometry_col]
            ]
            yield pdf

    return df.mapInPandas(gen, schema)
