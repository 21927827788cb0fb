"""Vector source: GeoPackage/Shapefile → zones DataFrame (WKB geometry).

The reference imports vectors with ogr2ogr into PostGIS, normalising to
fid-keyed, EPSG:4326, valid, 2-D, MULTI-promoted geometry
(``pipeline/processing/inputs.py:46-62``). The engine's canonical vector
form is a Parquet table (schemas.ZONES) with little-endian WKB
MultiPolygons. Vector layers are dimension-sized (admin boundaries), so
they broadcast in every join — the reference makes the same decision by
importing vectors once up front and streaming rasters past them
(``pipeline/processing/__main__.py:13-23``).

``ingest_geopackage`` delegates to the REAL stdlib-sqlite3 reader in
sources/geopackage.py (GPB envelope + WKB decode — no fiona/geopandas
needed); ``ingest_shapefile`` (sources/shapefile.py) is the matching
pure-stdlib .shp/.dbf/.prj/.cpg reader for the reference's other vector
format (download.py:14-17); ``fixture_zones`` provides the
deterministic FIXTURES.md §B2 layers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from sids_data_pipeline_spark.functions.geo import box_wkb, multipolygon_wkb
from sids_data_pipeline_spark.schemas import ZONES


def _grid_zones() -> list[tuple[int, str, bytes]]:
    """'zones_grid': 4 disjoint rectangles; fid=3 pixel-edge aligned,
    fid=4 entirely outside the raster (LEFT-join ⇒ mean NULL, mirroring
    reference stats.py:11-14)."""
    return [
        (1, "sw_block", box_wkb(0.12, 0.12, 2.08, 2.08)),
        (2, "ne_block", box_wkb(3.02, 3.02, 6.08, 6.08)),
        (3, "edge_aligned", box_wkb(0.0, 2.5, 1.0, 3.0)),
        (4, "offshore", box_wkb(20.0, 20.0, 21.0, 21.0)),
    ]


def _overlap_zones() -> list[tuple[int, str, bytes]]:
    """'zones_overlap': 3 overlapping polygons (a pixel may count toward
    several fids) + 1 sub-pixel polygon + 1 triangle with a hole (exercises
    non-rectangular rings in the containment kernel)."""
    tri_with_hole = multipolygon_wkb(
        [
            [
                [(1.0, 1.0), (5.0, 1.0), (3.0, 5.0), (1.0, 1.0)],  # exterior
                [(2.6, 1.8), (3.4, 1.8), (3.0, 2.6), (2.6, 1.8)],  # hole
            ]
        ]
    )
    return [
        (1, "west", box_wkb(0.52, 0.52, 3.08, 3.08)),
        (2, "east_overlapping", box_wkb(2.02, 2.02, 5.08, 5.08)),
        (3, "subpixel", box_wkb(1.51, 1.51, 1.54, 1.54)),
        (4, "triangle_holed", tri_with_hole),
    ]


FIXTURE_BUILDERS = {"zones_grid": _grid_zones, "zones_overlap": _overlap_zones}


def fixture_zones(spark: SparkSession, vector_id: str) -> DataFrame:
    """FIXTURES.md §B2 vector layers as a ZONES DataFrame."""
    rows = [
        (vector_id, fid, name, wkb)
        for fid, name, wkb in FIXTURE_BUILDERS[vector_id]()
    ]
    # pandas source → Arrow-serialized LocalRelation: one compact batch,
    # re-materialized cheaply each time the plan references it (the tuple
    # path re-runs Python pickling per reference and fans tiny batches
    # across defaultParallelism slices).
    pdf = pd.DataFrame(rows, columns=[f.name for f in ZONES.fields])
    return spark.createDataFrame(pdf, ZONES).coalesce(1)


def fixture_zones_pandas(vector_id: str) -> pd.DataFrame:
    """Driver-side twin for the numpy oracle in tests."""
    return pd.DataFrame(
        [
            {"vector_id": vector_id, "fid": fid, "name": name, "geometry": wkb}
            for fid, name, wkb in FIXTURE_BUILDERS[vector_id]()
        ]
    )


def ingest_geopackage(
    spark: SparkSession, path: str, vector_id: str, table: str | None = None
) -> DataFrame:
    """GeoPackage → ZONES DataFrame (S6, real — stdlib sqlite3).

    Delegates to sources/geopackage.py: GeoPackage is a SQLite database
    with GeoPackageBinary blobs wrapping standard WKB, so no GDAL is
    needed. Normalisation per the reference's ogr2ogr flags
    (pipeline/processing/inputs.py:49-53): MULTI-promotion via
    geo.promote_to_multi, 2-D enforcement via the parser's Z/M rejection;
    make_valid requires a geometry engine and is documented out of scope.
    """
    from sids_data_pipeline_spark.sources.geopackage import (
        ingest_geopackage as _ingest,
    )

    return _ingest(spark, path, vector_id, table=table)
