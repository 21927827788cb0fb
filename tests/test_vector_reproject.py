"""Distributed vector-geometry reprojection (ogr2ogr -t_srs parity,
reference pipeline/processing/inputs.py:46-62)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.functions import crs
from sids_data_pipeline_spark.functions.geo import (
    multipolygon_wkb,
    parse_wkb,
)
from sids_data_pipeline_spark.operators.vector_reproject import (
    _transform_wkb_driver,
    explode_vertices,
    rebuild_wkb,
    reproject_zones,
)
from sids_data_pipeline_spark.sources.vector import fixture_zones


def _max_vertex_diff(wkb_a: bytes, wkb_b: bytes) -> float:
    pa, pb = parse_wkb(wkb_a), parse_wkb(wkb_b)
    assert len(pa) == len(pb)
    worst = 0.0
    for qa, qb in zip(pa, pb):
        assert len(qa) == len(qb)
        for ra, rb in zip(qa, qb):
            assert ra.shape == rb.shape
            worst = max(worst, float(abs(ra - rb).max()))
    return worst


def test_explode_rebuild_is_identity(spark):
    zones = fixture_zones(spark, "zones_overlap")
    verts = explode_vertices(zones, ["vector_id", "fid"])
    rebuilt = rebuild_wkb(verts, ["vector_id", "fid"])
    orig = {r.fid: r.geometry for r in zones.collect()}
    got = {r.fid: r.geometry for r in rebuilt.collect()}
    assert set(got) == set(orig)
    for fid in orig:
        assert got[fid] == orig[fid]  # byte-identical: no transform ran


def test_roundtrip_3857_preserves_structure_and_values(spark):
    zones = fixture_zones(spark, "zones_overlap")
    back = reproject_zones(reproject_zones(zones, 4326, 3857), 3857, 4326)
    orig = {r.fid: r.geometry for r in zones.collect()}
    got = {r.fid: (r.name, r.geometry) for r in back.collect()}
    for fid, wkb in orig.items():
        assert _max_vertex_diff(wkb, got[fid][1]) < 1e-9
    # the holed triangle keeps its 2-ring single polygon
    polys = parse_wkb(got[4][1])
    assert len(polys) == 1 and len(polys[0]) == 2
    # non-key columns (name) survive
    assert {v[0] for v in got.values()} == {
        "west", "east_overlapping", "subpixel", "triangle_holed"
    }


def test_matches_driver_twin_on_forward_leg(spark):
    """Spark's vertex pipeline vs the driver-side WKB transform with the
    plain-math Web Mercator formulas — independent transcription."""
    R = crs.WEB_MERCATOR_RADIUS

    def merc(lon, lat):
        return (
            math.radians(lon) * R,
            math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)) * R,
        )

    zones = fixture_zones(spark, "zones_grid")
    got = {r.fid: r.geometry for r in reproject_zones(zones, 4326, 3857).collect()}
    for r in zones.collect():
        want = _transform_wkb_driver(r.geometry, merc)
        assert _max_vertex_diff(want, got[r.fid]) < 1e-6


def test_null_geometry_passes_through(spark):
    from sids_data_pipeline_spark.schemas import ZONES

    zones = spark.createDataFrame(
        [("v", 1, "a", multipolygon_wkb([[[(0, 0), (1, 0), (1, 1), (0, 0)]]])),
         ("v", 2, "nullgeom", None)],
        ZONES,
    )
    rows = {r.fid: r for r in reproject_zones(zones, 4326, 3857).collect()}
    assert rows[2].geometry is None
    assert rows[2].name == "nullgeom"
    assert rows[1].geometry is not None


def test_identity_when_same_epsg(spark):
    zones = fixture_zones(spark, "zones_grid")
    assert reproject_zones(zones, 4326, 4326) is zones


def test_shapefile_ingest_reprojects_registered_prj(spark, tmp_path):
    """A shapefile whose .prj declares NZTM (EPSG:2193) and whose
    coordinates are NZTM meters ingests straight to 4326 zones with
    reproject=True — full ogr2ogr parity for registered grids."""
    from sids_data_pipeline_spark.sources.shapefile import (
        ingest_shapefile,
        write_shapefile,
    )

    ring_ll = [(172.5, -43.5), (173.2, -43.5), (173.2, -43.0),
               (172.5, -43.0), (172.5, -43.5)]
    # forward-project the ring with the registered column math
    df = spark.createDataFrame(ring_ll, "lon double, lat double")
    x, y = crs.NZTM2000.forward(F.col("lon"), F.col("lat"))
    ring_m = [(r.x, r.y) for r in df.select(x.alias("x"), y.alias("y")).collect()]
    path = str(tmp_path / "nz.shp")
    write_shapefile([(0, "canterbury", multipolygon_wkb([[ring_m]]))], path)
    with open(path[:-4] + ".prj", "w") as fh:
        fh.write('PROJCS["NZGD2000_NZTM",AUTHORITY["EPSG","2193"]]')

    with pytest.raises(ValueError, match="EPSG:2193"):
        ingest_shapefile(spark, path, vector_id="nz")  # default: refuse

    zones = ingest_shapefile(spark, path, vector_id="nz", reproject=True)
    row = zones.collect()[0]
    want = multipolygon_wkb([[ring_ll]])
    assert _max_vertex_diff(want, row.geometry) < 1e-6
    assert row.name == "canterbury"


def test_shapefile_ingest_unregistered_prj_raises(spark, tmp_path):
    from sids_data_pipeline_spark.sources.shapefile import (
        ingest_shapefile,
        write_shapefile,
    )
    from sids_data_pipeline_spark.functions.geo import box_wkb

    # Belgian Lambert 72 — a real CRS with no registered closed form
    # (Krovak 5514, the previous fixture, is registered as of r10)
    path = str(tmp_path / "be.shp")
    write_shapefile([(0, "a", box_wkb(0, 0, 1, 1))], path)
    with open(path[:-4] + ".prj", "w") as fh:
        fh.write('PROJCS["Belge72",AUTHORITY["EPSG","31370"]]')
    with pytest.raises(ValueError, match="no registered closed form"):
        ingest_shapefile(spark, path, vector_id="be", reproject=True)


def test_geopackage_ingest_honours_srs_id(spark, tmp_path):
    """A GeoPackage layer declared in EPSG:3857 must refuse a plain
    ingest (meters-as-degrees) and reproject correctly with
    reproject=True — srs_id is read from gpkg_geometry_columns."""
    from sids_data_pipeline_spark.sources.geopackage import (
        ingest_geopackage,
        write_geopackage,
    )

    ring_ll = [(10.0, 45.0), (10.5, 45.0), (10.5, 45.4), (10.0, 45.4),
               (10.0, 45.0)]
    R = crs.WEB_MERCATOR_RADIUS

    def merc(lon, lat):
        return (
            math.radians(lon) * R,
            math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)) * R,
        )

    wkb_m = multipolygon_wkb([[[merc(x, y) for x, y in ring_ll]]])
    path = str(tmp_path / "m.gpkg")
    write_geopackage([(1, "po_valley", wkb_m)], path, srs_id=3857)

    with pytest.raises(ValueError, match="srs_id=3857"):
        ingest_geopackage(spark, path, vector_id="v")

    zones = ingest_geopackage(spark, path, vector_id="v", reproject=True)
    row = zones.collect()[0]
    assert _max_vertex_diff(multipolygon_wkb([[ring_ll]]), row.geometry) < 1e-9
    assert row.name == "po_valley"


def test_empty_zones_reproject(spark):
    """Zero-row input survives the explode→rebuild pipeline (empty Arrow
    batches must not break schema inference)."""
    from sids_data_pipeline_spark.schemas import ZONES

    empty = spark.createDataFrame([], ZONES)
    out = reproject_zones(empty, 4326, 3857)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [f.name for f in ZONES.fields]
