"""Vector extent clip (reference config.py:12-15 working-extent clip)."""

from __future__ import annotations

import pandas as pd

from sids_data_pipeline_spark.functions.geo import (
    box_wkb,
    multipolygon_wkb,
    parse_wkb,
    wkb_area2_e6,
    wkb_bbox,
)
from sids_data_pipeline_spark.operators.vector_clip import (
    clip_zones,
    clip_zones_to_reference_extent,
    wkb_clip_box,
)
from sids_data_pipeline_spark.schemas import ZONES


def test_wkb_clip_box_straddle_and_outside():
    rect = box_wkb(0.0, 0.0, 4.0, 3.0)
    got = wkb_clip_box(rect, 1.0, 1.0, 6.0, 4.0)
    assert wkb_bbox(got) == (1.0, 1.0, 4.0, 3.0)
    assert wkb_area2_e6(got) == 12_000_000
    assert wkb_clip_box(box_wkb(7.0, 0.0, 9.0, 2.0), 1.0, 1.0, 6.0, 4.0) is None


def test_wkb_clip_hole_vanishes_exterior_survives():
    holed = multipolygon_wkb(
        [[[(0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0), (0.0, 0.0)],
          [(6.0, 6.0), (6.0, 7.0), (7.0, 7.0), (7.0, 6.0), (6.0, 6.0)]]]
    )
    # clip box excludes the hole entirely: one ring remains
    got = wkb_clip_box(holed, 0.0, 0.0, 5.0, 5.0)
    polys = parse_wkb(got)
    assert len(polys) == 1 and len(polys[0]) == 1
    assert wkb_area2_e6(got) == 50_000_000


def test_wkb_clip_exterior_vanishes_drops_polygon():
    two = multipolygon_wkb(
        [[[(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0)]],
         [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]]
    )
    got = wkb_clip_box(two, 0.0, 0.0, 5.0, 5.0)
    assert len(parse_wkb(got)) == 1  # far polygon dropped entirely


def test_clip_zones_spark_survived_flag(spark):
    zones = spark.createDataFrame(
        pd.DataFrame(
            [
                ("v", 1, "in", box_wkb(0.0, 0.0, 4.0, 3.0)),
                ("v", 2, "out", box_wkb(7.0, 0.0, 9.0, 2.0)),
                ("v", 3, "null", None),
            ],
            columns=[f.name for f in ZONES.fields],
        ),
        ZONES,
    )
    rows = {r.fid: r for r in clip_zones(zones, (1.0, 6.0), (1.0, 4.0)).collect()}
    assert rows[1].survived and rows[1].geometry is not None
    assert not rows[2].survived and rows[2].geometry is None
    assert not rows[3].survived and rows[3].geometry is None
    assert rows[2].name == "out"  # non-geometry columns preserved


def test_reference_extent_tropics(spark):
    zones = spark.createDataFrame(
        pd.DataFrame(
            [("v", 1, "fiji", box_wkb(177.0, -19.0, 179.0, -16.0)),
             ("v", 2, "iceland", box_wkb(-24.0, 63.0, -13.0, 67.0))],
            columns=[f.name for f in ZONES.fields],
        ),
        ZONES,
    )
    rows = {r.fid: r for r in clip_zones_to_reference_extent(zones).collect()}
    assert rows[1].survived  # SIDS zone inside the tropics band
    assert not rows[2].survived  # lat > 35 drops out entirely
