"""Unit tests for the pure-numpy WKB / containment kernel."""

from __future__ import annotations

import numpy as np

from sids_data_pipeline_spark.functions import geo


def test_wkb_roundtrip_box():
    wkb = geo.box_wkb(1.0, 2.0, 3.0, 4.0)
    polys = geo.parse_wkb(wkb)
    assert len(polys) == 1
    ring = polys[0][0]
    assert ring.shape == (5, 2)
    assert geo.wkb_bbox(wkb) == (1.0, 2.0, 3.0, 4.0)


def test_point_in_box():
    polys = geo.parse_wkb(geo.box_wkb(0.0, 0.0, 2.0, 2.0))
    px = np.array([1.0, 3.0, -0.5, 1.999])
    py = np.array([1.0, 1.0, 1.0, 0.001])
    assert geo.points_in_polygons(polys, px, py).tolist() == [
        True,
        False,
        False,
        True,
    ]


def test_point_in_triangle_with_hole():
    wkb = geo.multipolygon_wkb(
        [
            [
                [(0.0, 0.0), (10.0, 0.0), (5.0, 10.0), (0.0, 0.0)],
                [(4.0, 2.0), (6.0, 2.0), (5.0, 4.0), (4.0, 2.0)],
            ]
        ]
    )
    polys = geo.parse_wkb(wkb)
    px = np.array([5.0, 5.0, 0.1, 20.0])
    py = np.array([1.0, 2.5, 5.0, 5.0])  # inside; in hole; outside; outside
    assert geo.points_in_polygons(polys, px, py).tolist() == [
        True,
        False,
        False,
        False,
    ]


def test_multipolygon_two_parts():
    wkb = geo.multipolygon_wkb(
        [
            [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]],
            [[(5, 5), (6, 5), (6, 6), (5, 6), (5, 5)]],
        ]
    )
    polys = geo.parse_wkb(wkb)
    px = np.array([0.5, 5.5, 3.0])
    py = np.array([0.5, 5.5, 3.0])
    assert geo.points_in_polygons(polys, px, py).tolist() == [True, True, False]


def test_geojson_feature_roundtrip():
    import json

    wkb = geo.box_wkb(0.0, 0.0, 1.0, 1.0)
    line = geo.geojson_feature(wkb, {"fid": 1, "mean": 2.5})
    feat = json.loads(line)
    assert feat["type"] == "Feature"
    assert feat["properties"] == {"fid": 1, "mean": 2.5}
    assert feat["geometry"]["type"] == "MultiPolygon"
    ring = feat["geometry"]["coordinates"][0][0]
    assert ring[0] == ring[-1]


def test_wkb_rect_detection():
    assert geo.wkb_rect(geo.box_wkb(0.0, 1.0, 2.0, 3.0)) == (0.0, 1.0, 2.0, 3.0)
    # plain Polygon encoding of a rectangle also qualifies
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (0.0, 2.0), (0.0, 0.0)]
    assert geo.wkb_rect(geo.polygon_wkb([ring])) == (0.0, 0.0, 4.0, 2.0)
    # non-rectangles: triangle, rect-with-hole, two-part multi, extra vertex
    tri = [(0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)]
    assert geo.wkb_rect(geo.polygon_wkb([tri])) is None
    hole = [(1.0, 0.5), (2.0, 0.5), (2.0, 1.5), (1.0, 1.5), (1.0, 0.5)]
    assert geo.wkb_rect(geo.polygon_wkb([ring, hole])) is None
    assert geo.wkb_rect(
        geo.multipolygon_wkb([[ring], [[(9, 9), (10, 9), (10, 10), (9, 10), (9, 9)]]])
    ) is None
    six = [(0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (4.0, 2.0), (0.0, 2.0), (0.0, 0.0)]
    assert geo.wkb_rect(geo.polygon_wkb([six])) is None
    # degenerate (zero-area) boxes are refused — kernel decides
    assert geo.wkb_rect(geo.polygon_wkb(
        [[(0.0, 0.0), (4.0, 0.0), (4.0, 0.0), (0.0, 0.0), (0.0, 0.0)]]
    )) is None


def test_rect_halfopen_equals_kernel_boundary_exact():
    """The geo.wkb_rect contract: for a rectangle, the ray-casting kernel
    equals xmin<=x<xmax AND ymin<=y<ymax on EVERY point, including points
    exactly on edges and corners."""
    rng = np.random.default_rng(7)
    for _ in range(50):
        xmin, ymin = rng.uniform(-50, 50, 2)
        xmax = xmin + rng.uniform(0.1, 40)
        ymax = ymin + rng.uniform(0.1, 40)
        wkb = geo.box_wkb(xmin, ymin, xmax, ymax)
        assert geo.wkb_rect(wkb) == (xmin, ymin, xmax, ymax)
        polys = geo.parse_wkb(wkb)
        # random interior/exterior points plus every boundary combination
        px = np.concatenate([
            rng.uniform(xmin - 5, xmax + 5, 200),
            np.array([xmin, xmax, xmin, xmax, xmin, xmax,
                      (xmin + xmax) / 2, (xmin + xmax) / 2]),
        ])
        py = np.concatenate([
            rng.uniform(ymin - 5, ymax + 5, 200),
            np.array([ymin, ymin, ymax, ymax, (ymin + ymax) / 2,
                      (ymin + ymax) / 2, ymin, ymax]),
        ])
        kernel = geo.points_in_polygons(polys, px, py)
        halfopen = (px >= xmin) & (px < xmax) & (py >= ymin) & (py < ymax)
        np.testing.assert_array_equal(kernel, halfopen)


# --- tile-geometry kernels: clip, simplify, winding ---------------------------


def test_clip_ring_rect_cases():
    square = np.array(
        [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    )
    # fully inside: unchanged (still closed)
    inside = geo.clip_ring_rect(square, -5, -5, 15, 15)
    assert np.array_equal(inside[0], inside[-1])
    assert {tuple(p) for p in inside[:-1]} == {(0, 0), (10, 0), (10, 10), (0, 10)}
    # fully outside: empty
    assert geo.clip_ring_rect(square, 20, 20, 30, 30).shape == (0, 2)
    # partial: right half survives, cut edge lands exactly on the bound
    half = geo.clip_ring_rect(square, 5, -5, 15, 15)
    assert {tuple(p) for p in half[:-1]} == {(5, 0), (10, 0), (10, 10), (5, 10)}
    # clip window entirely inside the ring: the window itself comes back
    win = geo.clip_ring_rect(square, 2, 2, 8, 8)
    assert {tuple(p) for p in win[:-1]} == {(2, 2), (8, 2), (8, 8), (2, 8)}


def test_simplify_ring_drops_collinear_and_small_detail():
    # square with collinear midpoints: any positive tolerance removes them
    ring = np.array(
        [(0.0, 0.0), (5.0, 0.0), (10.0, 0.0), (10.0, 10.0),
         (0.0, 10.0), (0.0, 0.0)]
    )
    out = geo.simplify_ring(ring, 0.01)
    assert (5.0, 0.0) not in {tuple(p) for p in out}
    assert np.array_equal(out[0], out[-1])
    # a small notch below tolerance disappears; above, survives
    notched = np.array(
        [(0.0, 0.0), (5.0, 0.0), (5.0, 1.0), (6.0, 1.0), (6.0, 0.0),
         (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    )
    coarse = {tuple(p) for p in geo.simplify_ring(notched, 2.0)}
    fine = {tuple(p) for p in geo.simplify_ring(notched, 0.5)}
    assert (5.0, 1.0) not in coarse and (5.0, 1.0) in fine
    # tol<=0 is identity
    assert np.array_equal(geo.simplify_ring(notched, 0.0), notched)


def test_ring_signed_area_orientation():
    # screen-clockwise in y-down coords (right, down, left, up): positive
    cw = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    assert geo.ring_signed_area(cw) == 16.0
    assert geo.ring_signed_area(cw[::-1]) == -16.0


def test_area_perimeter_hand_computed():
    """Unit square: 2*area = 2e6 micros, perimeter 4e6; a square hole
    wound the same way ADDS under signed-sum semantics (documented)."""
    from sids_data_pipeline_spark.functions import geo

    sq = geo.polygon_wkb([[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]])
    assert geo.wkb_area2_e6(sq) == 2_000_000
    assert geo.wkb_perimeter_e6(sq) == 4_000_000

    # opposite winding → negative signed area, same perimeter
    rev = geo.polygon_wkb([[(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]])
    assert geo.wkb_area2_e6(rev) == -2_000_000
    assert geo.wkb_perimeter_e6(rev) == 4_000_000

    # 3-4-5 triangle: hypotenuse exercises the sqrt path
    tri = geo.polygon_wkb([[(0, 0), (3, 0), (0, 4), (0, 0)]])
    assert geo.wkb_area2_e6(tri) == 12_000_000
    assert geo.wkb_perimeter_e6(tri) == 12_000_000


def test_clip_area_rect_matches_closed_form():
    """Clipping an axis-aligned rect against a box equals the closed-form
    interval-overlap product, across aligned/partial/disjoint cases."""
    from sids_data_pipeline_spark.functions import geo

    rect = [(1.0, 1.0), (4.0, 1.0), (4.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
    for box in [(0, 0, 2, 2), (1.5, 0.5, 3.5, 2.5), (4, 3, 9, 9), (0, 0, 9, 9),
                (2, 1, 3, 3), (-5, -5, 0.5, 0.5)]:
        x0, y0, x1, y1 = (float(v) for v in box)
        wx = max(0.0, min(4.0, x1) - max(1.0, x0))
        wy = max(0.0, min(3.0, y1) - max(1.0, y0))
        got = geo.clip_ring_box_area2(rect, x0, y0, x1, y1) / 2.0
        assert abs(got - wx * wy) < 1e-12, box


def test_clip_area_triangle_hand_computed():
    from sids_data_pipeline_spark.functions import geo

    # right triangle (0,0)-(2,0)-(0,2); clip to unit square [0,1]²:
    # square minus the corner triangle above x+y=2... within [0,1]² the
    # hypotenuse x+y=2 only touches (1,1), so area = full unit square
    # minus nothing above the line inside the box → area 1 - 0.5*? 
    # x+y<=2 holds everywhere in [0,1]² (max 2 at the corner) → area 1.0
    tri = [(0.0, 0.0), (2.0, 0.0), (0.0, 2.0), (0.0, 0.0)]
    assert abs(geo.clip_ring_box_area2(tri, 0, 0, 1, 1) / 2.0 - 1.0) < 1e-12
    # clip to [1,2]×[1,2]: empty beyond the hypotenuse except the point
    assert abs(geo.clip_ring_box_area2(tri, 1, 1, 2, 2)) < 1e-12
    # clip to [0.5,1.5]×[0,1]: trapezoid under x+y=2 between x=0.5..1.5
    # full strip area 1; cut corner above line: triangle with legs 0.5 →
    # 0.125; area = 1 - 0.125 = 0.875
    assert abs(geo.clip_ring_box_area2(tri, 0.5, 0.0, 1.5, 1.0) / 2.0 - 0.875) < 1e-12


def test_geo_edge_guards(spark):
    """Round-7 review: empty geometries, open rings, NaN coordinates,
    and numpy-ring re-encoding all fail loudly (or work) instead of
    crashing cryptically or silently corrupting parity."""
    import struct

    import numpy as np
    import pytest as _pytest

    from sids_data_pipeline_spark.functions import geo

    # MULTIPOLYGON EMPTY parses; bbox raises a NAMED error
    empty = struct.pack("<BII", 1, geo.WKB_MULTIPOLYGON, 0)
    assert geo.parse_wkb(empty) == []
    with _pytest.raises(ValueError, match="empty geometry"):
        geo.polys_bbox(geo.parse_wkb(empty))

    # re-encoding the parser's own numpy rings round-trips
    wkb = geo.box_wkb(0.0, 0.0, 2.0, 1.0)
    polys = geo.parse_wkb(wkb)
    again = geo.multipolygon_wkb(
        [[ring for ring in poly] for poly in polys]
    )
    assert again == wkb

    # NaN coordinates rejected at encode AND parse
    with _pytest.raises(ValueError, match="NaN"):
        geo.polygon_wkb([[(0.0, 0.0), (1.0, 0.0), (float("nan"), 1.0), (0.0, 0.0)]])

    # open ring: containment kernel refuses instead of losing an edge
    open_sq = [np.asarray([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)])]
    with _pytest.raises(ValueError, match="unclosed"):
        geo.points_in_polygons([open_sq], np.array([-2.0]), np.array([2.0]))

    # clip area: open and closed forms of the same ring agree
    closed = np.asarray([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    a_closed = geo.clip_ring_box_area2(closed, 1.0, 1.0, 3.0, 3.0)
    a_open = geo.clip_ring_box_area2(closed[:-1], 1.0, 1.0, 3.0, 3.0)
    a_pre = geo.clip_ring_box_area2(
        geo.ring_open_tuples(closed), 1.0, 1.0, 3.0, 3.0
    )
    assert a_closed == a_open == a_pre == 8.0  # 2 * (2x2)


def test_wkb_parser_fuzz_raises_cleanly():
    """Foreign-input robustness (same contract as the TIFF decoder):
    corrupt/truncated/random WKB must raise controlled error types,
    never hang or leak from deep inside numpy/struct. 20k-trial run was
    clean when added; this seeded subset guards regressions."""
    import random
    import struct as structmod

    rng = random.Random(99)
    base = geo.box_wkb(0, 0, 2, 3)
    accept = (ValueError, structmod.error, IndexError, OverflowError)
    for _ in range(3000):
        data = bytearray(base)
        k = rng.random()
        if k < 0.4:
            for _ in range(rng.randint(1, 6)):
                data[rng.randrange(len(data))] = rng.randrange(256)
        elif k < 0.7:
            data = data[: rng.randrange(1, len(data))]
        else:
            data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 120)))
        try:
            geo.parse_wkb(bytes(data))
        except accept:
            pass


def test_gpb_codec_fuzz_raises_cleanly():
    import random
    import struct as structmod

    from sids_data_pipeline_spark.sources.geopackage import make_gpb, parse_gpb

    rng = random.Random(7)
    base = make_gpb(geo.box_wkb(0, 0, 2, 3))
    accept = (ValueError, structmod.error, IndexError, OverflowError)
    for _ in range(3000):
        data = bytearray(base)
        k = rng.random()
        if k < 0.4:
            for _ in range(rng.randint(1, 6)):
                data[rng.randrange(len(data))] = rng.randrange(256)
        elif k < 0.7:
            data = data[: rng.randrange(0, len(data))]
        else:
            data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 120)))
        try:
            parse_gpb(bytes(data))
        except accept:
            pass


def test_centroid_terms_box_triangle_hole():
    """Box centroid = its center; triangle centroid = vertex mean; a
    hole pulls the centroid away from the hole's side."""
    import pytest

    from sids_data_pipeline_spark.functions.geo import (
        box_wkb,
        multipolygon_wkb,
        wkb_centroid_terms_e6,
    )

    def centroid(wkb):
        sx, sy, a2 = wkb_centroid_terms_e6(wkb)
        return sx / (3.0 * a2), sy / (3.0 * a2)

    cx, cy = centroid(box_wkb(1.0, 2.0, 5.0, 10.0))
    assert cx == pytest.approx(3.0, abs=1e-9)
    assert cy == pytest.approx(6.0, abs=1e-9)

    tri = multipolygon_wkb([[[(0.0, 0.0), (6.0, 0.0), (0.0, 3.0), (0.0, 0.0)]]])
    cx, cy = centroid(tri)
    assert cx == pytest.approx(2.0, abs=1e-6)
    assert cy == pytest.approx(1.0, abs=1e-6)

    # unit hole (wound OPPOSITE the exterior, so it subtracts) in the
    # right half of a 0..4 box: centroid shifts LEFT
    holed = multipolygon_wkb(
        [
            [
                [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                [(3.0, 1.5), (2.0, 1.5), (2.0, 2.5), (3.0, 2.5), (3.0, 1.5)],
            ]
        ]
    )
    cx, cy = centroid(holed)
    assert cx < 2.0
    assert cy == pytest.approx(2.0, abs=1e-6)  # hole is y-symmetric
    # exact composite: (16*2 - 1*2.5) / 15
    assert cx == pytest.approx((16 * 2.0 - 1 * 2.5) / 15.0, abs=1e-6)


def test_sphere_area_box_matches_closed_form():
    """For a lon/lat-aligned box the Chamberlain–Duquette edge sum
    collapses to the EXACT spherical-zone area R²·Δλ·(sinφ₂ − sinφ₁)
    (constant-λ edges contribute nothing); per-edge integer rounding
    leaves ≤ 2 m² slack. A CCW-vs-CW pair must be sign-opposite."""
    import math

    from sids_data_pipeline_spark.functions.geo import (
        SPHERE_RADIUS_M,
        box_wkb,
        multipolygon_wkb,
        wkb_area_sphere_m2,
    )

    lon1, lat1, lon2, lat2 = 10.0, 20.0, 12.5, 23.0
    got = wkb_area_sphere_m2(box_wkb(lon1, lat1, lon2, lat2))
    want = (
        SPHERE_RADIUS_M**2
        * math.radians(lon2 - lon1)
        * (math.sin(math.radians(lat2)) - math.sin(math.radians(lat1)))
    )
    assert abs(abs(got) - want) <= 2.0
    # ~2.5°×3° at 20°N ≈ 8.6e10 m² — sanity on magnitude
    assert 8.0e10 < abs(got) < 9.5e10
    reversed_ring = multipolygon_wkb(
        [[[(lon1, lat1), (lon1, lat2), (lon2, lat2), (lon2, lat1), (lon1, lat1)]]]
    )
    rev = wkb_area_sphere_m2(reversed_ring)
    assert rev == -got or rev == -got + 1 or rev == -got - 1  # rounding ties
