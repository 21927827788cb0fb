"""Geometry validity reporting + safe normalisation (the honest subset
of ogr2ogr -makevalid, reference pipeline/processing/inputs.py:51)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sids_data_pipeline_spark.functions.geo import (
    box_wkb,
    multipolygon_wkb,
    parse_wkb,
    ring_signed_area,
)
from sids_data_pipeline_spark.operators.geometry_quality import (
    normalize_wkb,
    normalize_zones,
    ring_self_intersects,
    validity_report,
    wkb_quality,
)
from sids_data_pipeline_spark.schemas import ZONES


def _ring(pts):
    return np.asarray(pts, dtype=np.float64)


class TestSelfIntersection:
    def test_rectangle_clean(self):
        assert not ring_self_intersects(
            _ring([(0, 0), (4, 0), (4, 3), (0, 3), (0, 0)])
        )

    def test_bowtie_detected(self):
        assert ring_self_intersects(
            _ring([(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)])
        )

    def test_pinch_detected(self):
        assert ring_self_intersects(
            _ring([(0, 0), (2, 0), (1, 1), (2, 2), (0, 2), (1, 1), (0, 0)])
        )

    def test_duplicate_consecutive_vertex_is_not_intersection(self):
        assert not ring_self_intersects(
            _ring([(0, 0), (3, 0), (3, 0), (3, 2), (0, 2), (0, 0)])
        )

    def test_spike_touchback_detected(self):
        # a spike that returns along itself: vertex 4 lands on segment 0
        assert ring_self_intersects(
            _ring([(0, 0), (4, 0), (4, 3), (2, 0), (1, 3), (0, 3), (0, 0)])
        )

    def test_triangle_minimal_clean(self):
        assert not ring_self_intersects(_ring([(0, 0), (1, 0), (0, 1), (0, 0)]))


def test_wkb_quality_counts_and_winding():
    tri_hole = multipolygon_wkb(
        [[[(1, 1), (5, 1), (3, 5), (1, 1)], [(2.6, 1.8), (3.0, 2.6), (3.4, 1.8), (2.6, 1.8)]]]
    )
    n_polys, n_rings, n_vertices, self_x, winding_ok = wkb_quality(tri_hole)
    assert (n_polys, n_rings, n_vertices) == (1, 2, 8)
    assert not self_x
    assert winding_ok  # exterior CCW, hole CW already


def test_wkb_quality_flags_noncanonical_winding():
    # exterior clockwise: structurally fine, winding non-canonical
    cw = multipolygon_wkb([[[(0, 0), (0, 3), (4, 3), (4, 0), (0, 0)]]])
    *_, self_x, winding_ok = wkb_quality(cw)
    assert not self_x
    assert not winding_ok


def test_normalize_dedupes_and_fixes_winding():
    cw_dup = multipolygon_wkb(
        [[[(0, 0), (0, 3), (0, 3), (4, 3), (4, 0), (0, 0)]]]
    )
    out = normalize_wkb(cw_dup)
    polys = parse_wkb(out)
    assert len(polys) == 1 and len(polys[0]) == 1
    ring = polys[0][0]
    assert ring.shape[0] == 5  # duplicate dropped, ring closed
    assert ring_signed_area(ring) > 0  # exterior now CCW


def test_normalize_drops_degenerate_rings_and_empty_returns_none():
    # zero-area sliver ring + a real ring: sliver dropped
    mixed = multipolygon_wkb(
        [[[(0, 0), (4, 0), (4, 3), (0, 3), (0, 0)]],
         [[(9, 9), (10, 9), (9.5, 9), (9, 9)]]]  # collinear, zero area
    )
    polys = parse_wkb(normalize_wkb(mixed))
    assert len(polys) == 1
    # everything degenerate -> None
    assert normalize_wkb(
        multipolygon_wkb([[[(0, 0), (1, 0), (0.5, 0), (0, 0)]]])
    ) is None


def test_normalize_leaves_self_intersections_alone():
    bowtie = multipolygon_wkb([[[(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)]]])
    out = normalize_wkb(bowtie)
    assert parse_wkb(out)[0][0].shape == parse_wkb(bowtie)[0][0].shape


def test_validity_report_spark(spark):
    zones = spark.createDataFrame(
        pd.DataFrame(
            [
                ("v", 1, "ok", box_wkb(0, 0, 4, 3)),
                ("v", 2, "bowtie",
                 multipolygon_wkb([[[(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)]]])),
                ("v", 3, "nullgeom", None),
            ],
            columns=[f.name for f in ZONES.fields],
        ),
        ZONES,
    )
    rows = {r.fid: r for r in validity_report(zones, ["fid"]).collect()}
    assert rows[1].self_intersecting is False and rows[1].winding_canonical
    assert rows[2].self_intersecting is True
    assert rows[3].n_polys is None and rows[3].self_intersecting is None


def test_normalize_zones_spark(spark):
    cw = multipolygon_wkb([[[(0, 0), (0, 3), (4, 3), (4, 0), (0, 0)]]])
    zones = spark.createDataFrame(
        pd.DataFrame(
            [("v", 1, "cw", cw), ("v", 2, "none", None)],
            columns=[f.name for f in ZONES.fields],
        ),
        ZONES,
    )
    rows = {r.fid: r for r in normalize_zones(zones, ["fid"]).collect()}
    assert ring_signed_area(parse_wkb(rows[1].geometry)[0][0]) > 0
    assert rows[2].geometry is None
    assert rows[1].name == "cw"  # non-geometry columns untouched


def test_report_then_normalize_then_report_is_canonical(spark):
    cw_dup = multipolygon_wkb(
        [[[(0, 0), (0, 3), (0, 3), (4, 3), (4, 0), (0, 0)]]]
    )
    zones = spark.createDataFrame(
        pd.DataFrame(
            [("v", 1, None, cw_dup)], columns=[f.name for f in ZONES.fields]
        ),
        ZONES,
    )
    fixed = normalize_zones(zones, ["fid"])
    row = validity_report(fixed, ["fid"]).collect()[0]
    assert row.winding_canonical and not row.self_intersecting
    assert row.n_vertices == 5
