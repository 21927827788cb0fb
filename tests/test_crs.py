"""CRS transforms: round-trip identity, known anchor points, per-row
branch behavior, loud failure for unsupported CRSs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.functions import crs, geo


@pytest.fixture(scope="module")
def lonlat(spark):
    return spark.range(0, 200, 1, 4).select(
        F.col("id"),
        ((F.col("id") % 20).cast("double") * 15.0 - 150.0).alias("lon"),
        ((F.col("id") / 20).cast("long").cast("double") * 7.0 - 34.0).alias("lat"),
    )


def test_roundtrip_identity(lonlat):
    merc = crs.reproject_pixels(lonlat, 4326, 3857)
    back = crs.reproject_pixels(merc, 3857, 4326)
    rows = back.join(
        lonlat.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).collect()
    for r in rows:
        assert abs(r.lon - r.lon0) < 1e-9
        assert abs(r.lat - r.lat0) < 1e-9


def test_known_anchor(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0), (1, 180.0, 0.0)], "id long, lon double, lat double")
    rows = {r.id: r for r in crs.reproject_pixels(df, 4326, 3857).collect()}
    assert rows[0].lon == 0.0 and abs(rows[0].lat) < 1e-6
    assert abs(rows[1].lon - math.pi * crs.WEB_MERCATOR_RADIUS) < 1e-6


def test_identity_when_same_epsg(lonlat):
    assert crs.reproject_pixels(lonlat, 4326, 4326) is lonlat


def test_unsupported_pair_raises(lonlat):
    with pytest.raises(NotImplementedError):
        crs.reproject_pixels(lonlat, 27700, 4326)


def test_standardize_mixed_crs(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, 20.0, 4326),
            (2, 1113194.9079327357, 2273030.926987689, 3857),  # (10°, 20°)
        ],
        "id long, lon double, lat double, src_epsg int",
    )
    rows = {r.id: r for r in crs.standardize_crs(df).collect()}
    assert rows[1].lon == 10.0
    assert abs(rows[2].lon - 10.0) < 1e-9
    assert abs(rows[2].lat - 20.0) < 1e-9
    assert rows[2].src_epsg == 4326


def test_promote_to_multi():
    poly = geo.polygon_wkb([[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]])
    multi = geo.promote_to_multi(poly)
    # already-multi passes through byte-identical
    assert geo.promote_to_multi(multi) == multi
    # parsed content identical to the source polygon
    import numpy as np

    a, b = geo.parse_wkb(poly), geo.parse_wkb(multi)
    assert len(a) == len(b) == 1
    assert np.array_equal(a[0][0], b[0][0])


def test_standardize_unsupported_epsg_raises(spark):
    """The unsupported-CRS guard lives inside the lon/lat expressions, so
    it fires even under aggressive column pruning (a standalone assertion
    column would be optimized away and never raise)."""
    df = spark.createDataFrame(
        [(1, 10.0, 20.0, 27700)], "id long, lon double, lat double, src_epsg int"
    )
    with pytest.raises(Exception, match="unsupported src EPSG"):
        crs.standardize_crs(df).select("lon").collect()
