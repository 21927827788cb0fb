"""gdal_contour parity: marching squares + polyline chaining."""

from __future__ import annotations

import math

import pytest

from sids_data_pipeline_spark.operators.contour import (
    _cell_segments,
    contour_lines,
    contour_segments,
    multilinestring_wkb,
)


def _gradient(spark, n=13):
    rows = [(x, y, float(x + 2 * y)) for y in range(n) for x in range(n)]
    return spark.createDataFrame(rows, "x int, y int, val double")


def test_linear_field_is_exact(spark):
    """val = x + 2y: the iso-line x + 2y = 8.5 reconstructs EXACTLY —
    total segment length equals the closed-form line-in-box length and
    the chain is one open polyline from (8.5, 0) to (0, 4.25)."""
    segs = contour_segments(_gradient(spark), [8.5]).collect()
    assert len(segs) == 13
    total = sum(math.hypot(s.x2 - s.x1, s.y2 - s.y1) for s in segs)
    assert abs(total - math.hypot(8.5, 4.25)) < 1e-9
    for s in segs:  # every vertex ON the analytic line
        assert abs((s.x1 + 2 * s.y1) - 8.5) < 1e-12
        assert abs((s.x2 + 2 * s.y2) - 8.5) < 1e-12
    lines = contour_lines(_gradient(spark), [8.5]).collect()
    assert [(r.level, r.n_lines) for r in lines] == [(8.5, 1)]


def test_closed_loop_chebyshev_cone(spark):
    """val = max(|x−6|, |y−6|): square contours; level 2.5 chains into
    ONE closed loop whose first and last vertex coincide."""
    rows = [
        (x, y, float(max(abs(x - 6), abs(y - 6))))
        for y in range(13)
        for x in range(13)
    ]
    px = spark.createDataFrame(rows, "x int, y int, val double")
    out = contour_lines(px, [2.5]).collect()[0]
    assert out.n_lines == 1
    # decode the single LineString and check closure
    import struct

    buf = memoryview(out.geometry)
    assert struct.unpack_from("<BII", buf, 0)[1:] == (5, 1)
    npts = struct.unpack_from("<I", buf, 14)[0]
    first = struct.unpack_from("<dd", buf, 18)
    last = struct.unpack_from("<dd", buf, 18 + 16 * (npts - 1))
    assert first == last


def test_multiple_levels_grouped(spark):
    out = {r.level: r.n_lines for r in contour_lines(_gradient(spark), [4.5, 8.5, 15.25]).collect()}
    assert out == {4.5: 1, 8.5: 1, 15.25: 1}


def test_saddle_cases_emit_two_segments():
    # code 5: b00 & b11 high — two segments either way the center falls
    segs_hi = _cell_segments(0, 0, 1.0, 0.0, 0.0, 1.0, 0.5)
    assert len(segs_hi) == 2
    segs_lo = _cell_segments(0, 0, 10.0, 0.0, 0.0, 10.0, 9.0)
    assert len(segs_lo) == 2


def test_empty_levels_rejected(spark):
    with pytest.raises(ValueError, match="levels"):
        contour_segments(_gradient(spark), [])


def test_level_outside_range_yields_nothing(spark):
    assert contour_segments(_gradient(spark), [1000.5]).count() == 0


def test_multilinestring_wkb_layout():
    wkb = multilinestring_wkb([[(0.0, 0.0), (1.0, 2.0)]])
    import struct

    assert struct.unpack_from("<BII", wkb, 0) == (1, 5, 1)
    assert struct.unpack_from("<BII", wkb, 9) == (1, 2, 2)
    assert struct.unpack_from("<4d", wkb, 18) == (0.0, 0.0, 1.0, 2.0)
