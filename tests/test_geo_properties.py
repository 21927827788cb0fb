"""Property-based tests (hypothesis) for the pure-numpy geometry kernel.

These run driver-side only (no SparkSession) so hypothesis can afford
hundreds of examples: WKB codec round-trips, box-containment equivalence
with direct interval tests, hole/XOR semantics, and translation
invariance of the ray-casting kernel.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sids_data_pipeline_spark.functions import geo

coord = st.floats(
    min_value=-180.0, max_value=180.0, allow_nan=False, allow_infinity=False
)


@st.composite
def boxes(draw):
    x0, x1 = sorted((draw(coord), draw(coord)))
    y0, y1 = sorted((draw(coord), draw(coord)))
    # degenerate (zero-area) boxes are valid rings but contain nothing
    return (x0, y0, x1, y1)


@settings(max_examples=200, deadline=None)
@given(boxes(), st.lists(st.tuples(coord, coord), min_size=1, max_size=50))
def test_box_containment_matches_intervals(box, pts):
    """Ray-cast containment on an axis-aligned box == half-open interval
    membership [xmin, xmax) × [ymin, ymax) — the pixel-center convention."""
    xmin, ymin, xmax, ymax = box
    wkb = geo.box_wkb(xmin, ymin, xmax, ymax)
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    got = geo.points_in_polygons(geo.parse_wkb(wkb), px, py)
    want = (px >= xmin) & (px < xmax) & (py >= ymin) & (py < ymax)
    assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(boxes(), min_size=1, max_size=5))
def test_multipolygon_union_semantics(box_list):
    """Containment in a MultiPolygon of boxes == OR of per-box tests."""
    polys = [
        [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]]
        for x0, y0, x1, y1 in box_list
    ]
    wkb = geo.multipolygon_wkb(polys)
    rng = np.random.default_rng(7)
    px = rng.uniform(-200, 200, 64)
    py = rng.uniform(-200, 200, 64)
    got = geo.points_in_polygons(geo.parse_wkb(wkb), px, py)
    want = np.zeros(64, dtype=bool)
    for x0, y0, x1, y1 in box_list:
        want |= (px >= x0) & (px < x1) & (py >= y0) & (py < y1)
    assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(boxes(), st.floats(-50, 50, allow_nan=False), st.floats(-50, 50, allow_nan=False))
def test_translation_invariance(box, dx, dy):
    xmin, ymin, xmax, ymax = box
    rng = np.random.default_rng(11)
    px = rng.uniform(xmin - 1, xmax + 1, 32)
    py = rng.uniform(ymin - 1, ymax + 1, 32)
    base = geo.points_in_polygons(
        geo.parse_wkb(geo.box_wkb(xmin, ymin, xmax, ymax)), px, py
    )
    shifted = geo.points_in_polygons(
        geo.parse_wkb(geo.box_wkb(xmin + dx, ymin + dy, xmax + dx, ymax + dy)),
        px + dx,
        py + dy,
    )
    assert np.array_equal(base, shifted)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=12))
def test_wkb_roundtrip(ring_pts):
    """encode → parse preserves ring coordinates (closure appended)."""
    from hypothesis import assume

    # a 3-point ring whose ends already coincide closes to <4 points —
    # correctly rejected as degenerate, so out of scope here
    assume(not (len(ring_pts) == 3 and ring_pts[0] == ring_pts[-1]))
    wkb = geo.polygon_wkb([ring_pts])
    polys = geo.parse_wkb(wkb)
    assert len(polys) == 1
    ring = polys[0][0]
    want = list(ring_pts) + ([ring_pts[0]] if ring_pts[0] != ring_pts[-1] else [])
    assert np.allclose(ring, np.array(want), rtol=0, atol=0)


@settings(max_examples=100, deadline=None)
@given(boxes())
def test_bbox_of_box_is_box(box):
    xmin, ymin, xmax, ymax = box
    got = geo.wkb_bbox(geo.box_wkb(xmin, ymin, xmax, ymax))
    assert got == (xmin, ymin, xmax, ymax)


def test_hole_xor_semantics():
    outer = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    hole = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
    wkb = geo.polygon_wkb([outer, hole])
    px = np.array([5.0, 2.0, 11.0, 4.5])
    py = np.array([5.0, 2.0, 5.0, 4.0])
    got = geo.points_in_polygons(geo.parse_wkb(wkb), px, py)
    # center of hole: out; interior: in; outside: out; on hole's bottom
    # edge at (4.5, 4.0): hole's half-open rule counts it as hole → out
    assert got.tolist() == [False, True, False, False]


# --- MVT codec properties (functions/mvt.py) --------------------------------

tile_coord = st.integers(min_value=-(2**20), max_value=2**20)
prop_value = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
)


@st.composite
def mvt_features(draw):
    from sids_data_pipeline_spark.functions import mvt

    n_rings = draw(st.integers(1, 3))
    rings = []
    for _ in range(n_rings):
        pts = draw(
            st.lists(st.tuples(tile_coord, tile_coord), min_size=3, max_size=8)
        )
        rings.append(pts + [pts[0]])  # closed
    props = draw(
        st.dictionaries(st.text(min_size=1, max_size=8), prop_value, max_size=4)
    )
    return {"id": draw(st.integers(1, 2**30)), "type": mvt.GEOM_POLYGON,
            "rings": rings, "props": props}


@settings(max_examples=100, deadline=None)
@given(st.lists(mvt_features(), min_size=1, max_size=5))
def test_mvt_round_trip_property(feats):
    """encode→decode is the identity on ids, closed rings, and typed
    properties, for arbitrary coordinates (negative, beyond-extent) and
    interned key/value tables."""
    from sids_data_pipeline_spark.functions import mvt

    out = mvt.decode_tile(mvt.encode_tile("t", feats))["t"]
    assert len(out["features"]) == len(feats)
    for f_in, f_out in zip(feats, out["features"]):
        assert f_out["id"] == f_in["id"]
        assert f_out["rings"] == f_in["rings"]
        assert f_out["props"] == f_in["props"]
