"""SQL front door for the geometry kernel: the reference's Entry-3 query
written as plain SQL against registered functions."""

from __future__ import annotations

import json

import pytest

from sids_data_pipeline_spark import lifecycle
from sids_data_pipeline_spark.functions.register import register_all
from sids_data_pipeline_spark.operators.zonal import zonal_stats
from sids_data_pipeline_spark.sources.raster import synthetic_raster
from sids_data_pipeline_spark.sources.vector import fixture_zones


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_all(spark)


def test_entry3_query_as_sql(spark):
    """SQL zonal mean over st_contains_point equals the operator API."""
    zones = fixture_zones(spark, "zones_grid")
    pixels = synthetic_raster(spark, "rast_gradient")
    with lifecycle.temp_views(spark, zones=zones, pixels=pixels):
        # Spark disallows Python UDFs in outer-join ON clauses; the
        # supported spelling is a cross join filtered in WHERE (zones
        # with no pixels drop out — the operator keeps them as NULL)
        sql = spark.sql(
            """
            SELECT z.fid, AVG(p.val) AS mean
            FROM zones z, pixels p
            WHERE st_contains_point(z.geometry, p.lon, p.lat)
            GROUP BY z.fid ORDER BY z.fid
            """
        ).collect()
    op = (
        zonal_stats(zones, pixels, stats=("mean",))
        .filter("mean IS NOT NULL")
        .orderBy("fid")
        .collect()
    )
    assert [(r.fid, r["mean"]) for r in sql] == [(r.fid, r["mean"]) for r in op]


def test_bbox_and_geojson_functions(spark):
    zones = fixture_zones(spark, "zones_grid")
    with lifecycle.temp_views(spark, zones=zones):
        rows = spark.sql(
            """
            SELECT fid, st_bbox(geometry) AS bb,
                   st_bbox_area(geometry) AS area,
                   st_asgeojson(geometry) AS gj
            FROM zones WHERE fid = 1
            """
        ).collect()
    r = rows[0]
    assert (r.bb.xmin, r.bb.ymin, r.bb.xmax, r.bb.ymax) == (0.12, 0.12, 2.08, 2.08)
    assert abs(r.area - (2.08 - 0.12) ** 2) < 1e-12
    assert json.loads(r.gj)["type"] == "MultiPolygon"
