"""gdal_polygonize parity: labeled raster → MultiPolygon per region.

The load-bearing invariant: for every region, the SIGNED shoelace sum of
its rings equals its pixel count (exterior minus holes) — no partial or
crossed tracing can satisfy it."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sids_data_pipeline_spark.functions.geo import (
    parse_wkb,
    ring_signed_area,
    wkb_area2_e6,
    wkb_bbox,
    wkb_perimeter_e6,
)
from sids_data_pipeline_spark.operators.geometry_quality import wkb_quality
from sids_data_pipeline_spark.operators.polygonize import (
    _walk_rings,
    polygonize,
)
from sids_data_pipeline_spark.operators.terrain import clump_regions


def _grid(spark, vals):
    rows = [
        (x, y, float(v))
        for y, row in enumerate(vals)
        for x, v in enumerate(row)
        if v is not None
    ]
    return spark.createDataFrame(rows, "x int, y int, val double")


def test_blocky_fixture_rings_holes_and_conservation(spark):
    vals = [
        [3 if x < 2 and y < 2 else 2 if 2 <= x <= 4 and 2 <= y <= 4 else 1
         for x in range(8)]
        for y in range(8)
    ]
    out = {r.region: r for r in polygonize(clump_regions(_grid(spark, vals))).collect()}
    assert set(out) == {0, 2, (2 << 32) | 2}
    a = out[2]  # the big region: notched exterior + hole where B sits
    polys = parse_wkb(a.geometry)
    assert len(polys) == 1 and len(polys[0]) == 2
    assert ring_signed_area(polys[0][0]) > 0  # exterior CCW
    assert ring_signed_area(polys[0][1]) < 0  # hole CW
    assert a.n_pixels == 51
    assert wkb_area2_e6(a.geometry) == 2 * 51 * 10**6
    assert wkb_perimeter_e6(a.geometry) == 44 * 10**6
    assert wkb_bbox(a.geometry) == (0.0, 0.0, 8.0, 8.0)
    b = out[(2 << 32) | 2]
    assert parse_wkb(b.geometry)[0][0].shape[0] == 5  # collinear collapsed
    assert wkb_area2_e6(b.geometry) == 2 * 9 * 10**6
    # every emitted geometry is OGC-valid (no self-touch at the saddle)
    for r in out.values():
        *_, self_x, winding_ok = wkb_quality(r.geometry)
        assert not self_x and winding_ok


def test_saddle_vertex_separates_rings(spark):
    """The notch corner (2,2) is ALSO the hole corner — a saddle where
    four boundary edges of the same region meet. The right-turn rule
    must keep exterior and hole as two rings, not one pinched ring."""
    vals = [
        [3 if x < 2 and y < 2 else 2 if 2 <= x <= 4 and 2 <= y <= 4 else 1
         for x in range(8)]
        for y in range(8)
    ]
    out = {r.region: r for r in polygonize(clump_regions(_grid(spark, vals))).collect()}
    polys = parse_wkb(out[2].geometry)
    assert [len(p) for p in polys] == [2]


def test_affine_transform_and_negative_dy(spark):
    vals = [[1, 1], [1, 1]]
    lab = clump_regions(_grid(spark, vals))
    out = polygonize(lab, x0=100.0, y0=50.0, dx=0.5, dy=-0.5).collect()[0]
    assert wkb_bbox(out.geometry) == (100.0, 49.0, 101.0, 50.0)
    # winding stays canonical after the mirror
    assert ring_signed_area(parse_wkb(out.geometry)[0][0]) > 0


def test_null_pixels_become_region_boundaries(spark):
    vals = [[1, None, 1], [1, None, 1]]
    out = polygonize(clump_regions(_grid(spark, vals))).collect()
    assert len(out) == 2  # the NULL column splits one value into two regions
    for r in out:
        assert r.n_pixels == 2
        assert wkb_area2_e6(r.geometry) == 4 * 10**6


def test_walk_rejects_open_chain():
    edges = np.array([[0, 0, 1, 0], [1, 0, 1, 1]], dtype=np.int64)
    with pytest.raises(ValueError, match="open boundary"):
        _walk_rings(edges)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 2), min_size=5, max_size=5),
        min_size=5,
        max_size=5,
    )
)
def test_conservation_on_random_grids(spark, vals):
    """Random 5×5 label soup: every region's signed ring-area sum equals
    its pixel count, and every geometry passes the validity kernel."""
    out = polygonize(clump_regions(_grid(spark, vals))).collect()
    npix = sum(1 for row in vals for _ in row)
    assert sum(r.n_pixels for r in out) == npix
    for r in out:
        assert wkb_area2_e6(r.geometry) == 2 * r.n_pixels * 10**6, r.region
        *_, self_x, winding_ok = wkb_quality(r.geometry)
        assert not self_x and winding_ok
