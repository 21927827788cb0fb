"""SQL function registration: the engine's geometry kernel as
``spark.sql``-callable functions.

The reference's users write SQL against PostGIS (``ST_Intersects``,
``ST_DumpAsPolygons`` — reference ``pipeline/processing/stats.py:5-18``);
this module gives the engine's SQL front door the equivalent vocabulary
so the Entry-3 query shape can be written as plain SQL over temp views:

    SELECT z.fid, AVG(p.val) AS mean
    FROM zones z JOIN pixels p
      ON st_contains_point(z.geometry, p.lon, p.lat)
    GROUP BY z.fid

All functions are Arrow-batched pandas UDFs over the numpy kernel —
registration only changes how they're invoked, not how they execute.
(Note: a theta-join on a UDF predicate is a nested-loop plan; the
operator API's filter-and-refine join remains the scale path, this is
the expressiveness path.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType, StringType

from sids_data_pipeline_spark.functions import geo


def register_all(spark: SparkSession) -> None:
    """Register the engine's SQL functions on this session (idempotent).

    ``st_contains_point`` registers the operator kernel itself
    (operators/zonal._contains_udf) — ONE containment dispatch, so rect
    fast paths / null handling fixed there apply to the SQL surface too.
    NULL geometry yields NULL (bbox/geojson/area) or false (contains),
    never a worker crash."""
    from sids_data_pipeline_spark.operators.zonal import _contains_udf

    @F.pandas_udf("xmin double, ymin double, xmax double, ymax double")
    def st_bbox(wkb: pd.Series) -> pd.DataFrame:
        rows = [
            geo.wkb_bbox(bytes(b)) if b is not None else (None, None, None, None)
            for b in wkb
        ]
        return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])

    @F.pandas_udf(StringType())
    def st_asgeojson(wkb: pd.Series) -> pd.Series:
        import json

        return pd.Series(
            [
                json.dumps(
                    geo.wkb_to_geojson_geometry(bytes(b)), separators=(",", ":")
                )
                if b is not None
                else None
                for b in wkb
            ]
        )

    @F.pandas_udf(DoubleType())
    def st_bbox_area(wkb: pd.Series) -> pd.Series:
        out = []
        for b in wkb:
            if b is None:
                out.append(None)
                continue
            xmin, ymin, xmax, ymax = geo.wkb_bbox(bytes(b))
            out.append((xmax - xmin) * (ymax - ymin))
        return pd.Series(out)

    spark.udf.register("st_contains_point", _contains_udf)
    spark.udf.register("st_bbox", st_bbox)
    spark.udf.register("st_asgeojson", st_asgeojson)
    spark.udf.register("st_bbox_area", st_bbox_area)
