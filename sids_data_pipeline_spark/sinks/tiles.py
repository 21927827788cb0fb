"""Vector-tile sink (K2/O2/K3 — SURVEY.md §2a).

The reference shells out to tippecanoe: GeoJSONL → ``{z}/{x}/{y}.pbf``
pyramid, zoom ≤ 10, layer per pair, ``--drop-densest-as-needed``, then
azcopy-uploads the directory and relies on ``metadata.json`` existing as
the pair's completion marker (reference ``pipeline/processing/tiles.py:
16-32``, ``pipeline/processing/data.py:26-40``).

Spark-first equivalents:

- **tiling math** (slippy z/x/y) is pure column arithmetic — JVM-side,
  codegen-friendly, no UDF;
- **feature→tile assignment** explodes each feature's bbox to the tiles
  it covers per zoom (bounded: a bbox covers few tiles at z ≤ 10);
- **density drop (O2)** is the window-ranked limit per tile that
  tippecanoe's ``--drop-densest-as-needed`` performs internally
  (``tiles.py:18``): smallest-area (densest) features drop first once a
  tile exceeds ``max_features_per_tile``;
- **PBF encode** runs per tile group in ``applyInPandas``, emitting REAL
  Mapbox Vector Tile (vector-tile-spec 2.1) protobuf bytes via the
  pure-Python codec in ``functions/mvt.py`` — no native libs needed on
  executors. Tests decode the bytes back and assert feature content;
  byte-parity with tippecanoe is not a goal (SURVEY.md §7).
- **upload (K3)** is the write itself: ``partitionBy(z, x)`` to any
  Hadoop-supported URI; ``metadata.json`` sidecar completes the P6 loop.
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MAX_ZOOM = 10  # reference tippecanoe -z10 (tiles.py:22-24)


def _tile_x(lon, z):
    return F.floor((lon + 180.0) / 360.0 * F.lit(2.0) ** z).cast("int")


def _tile_y(lat, z):
    # asinh spelled as ln(t + sqrt(t² + 1)): portable across SQL engines
    # (the correctness oracle mirrors this exact expression)
    t = F.tan(F.radians(lat))
    asinh_t = F.log(t + F.sqrt(t * t + F.lit(1.0)))
    mercator = F.lit(1.0) - asinh_t / F.lit(math.pi)
    return F.floor(mercator / 2.0 * F.lit(2.0) ** z).cast("int")


def assign_tiles(
    features: DataFrame,
    max_zoom: int = MAX_ZOOM,
    bbox_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
) -> DataFrame:
    """Explode features to every (z, x, y) tile their bbox touches,
    z = 0..max_zoom. Pure column math: zoom explode → per-corner tile
    indices → x/y range explode. Bbox-sized features at z ≤ 10 cover few
    tiles, so the fan-out is bounded and shuffle-free until the caller
    groups by tile."""
    xmin, ymin, xmax, ymax = (F.col(c) for c in bbox_cols)
    z = F.explode(F.sequence(F.lit(0), F.lit(max_zoom))).alias("z")
    with_z = features.select("*", z)
    zc = F.col("z")
    x0, x1 = _tile_x(xmin, zc), _tile_x(xmax, zc)
    # slippy y grows southward: ymax (north) maps to the smaller y index
    y0, y1 = _tile_y(ymax, zc), _tile_y(ymin, zc)
    return (
        with_z.withColumn("x", F.explode(F.sequence(x0, x1)))
        .withColumn("y", F.explode(F.sequence(y0, y1)))
    )


def drop_densest(
    tiles: DataFrame,
    max_features_per_tile: int,
    area_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    id_col: str = "fid",
) -> DataFrame:
    """O2: per-tile ranked limit — when a tile holds more than
    ``max_features_per_tile`` features, the smallest-bbox (densest)
    features drop first; ties break on the feature id so the result is
    total-order deterministic."""
    xmin, ymin, xmax, ymax = (F.col(c) for c in area_cols)
    area = (xmax - xmin) * (ymax - ymin)
    w = Window.partitionBy("z", "x", "y").orderBy(
        area.desc(), F.col(id_col).asc()
    )
    return (
        tiles.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= max_features_per_tile)
        .drop("_rank")
    )


def _local_coords(z: int, x: int, y: int, xmin, ymin, xmax, ymax, extent: int):
    """Project a lon/lat bbox into tile-local integer space [0, extent]
    (coords may exceed the range for features spilling past the tile edge
    — MVT geometry is sint, the spec allows buffer overflow)."""
    n = 2.0 ** z

    def lx(lon):
        return round(((lon + 180.0) / 360.0 * n - x) * extent)

    def ly(lat):
        t = math.tan(math.radians(lat))
        merc = (1.0 - math.log(t + math.sqrt(t * t + 1.0)) / math.pi) / 2.0
        return round((merc * n - y) * extent)

    # tile Y grows downward, so ymax (north) is the smaller local y;
    # ring is CW in screen space per spec §4.3.3.2 (exterior ring)
    x0, x1 = lx(xmin), lx(xmax)
    y0, y1 = ly(ymax), ly(ymin)
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]


def _encode_tile(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real MVT (vector-tile-spec 2.1) tile: one ``features`` layer, each
    feature's bbox as a tile-local polygon, remaining columns as typed
    properties (deterministic: features sorted by id column). Pure-Python
    wire format — functions/mvt.py — so executors need no native libs."""
    from sids_data_pipeline_spark.functions import mvt

    z, x, y = int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]), int(pdf["y"].iloc[0])
    feat_cols = [c for c in pdf.columns if c not in ("z", "x", "y")]
    bbox = ("xmin", "ymin", "xmax", "ymax")
    has_bbox = all(c in feat_cols for c in bbox)
    prop_cols = [c for c in feat_cols if c not in bbox]
    rows = pdf[feat_cols].sort_values(feat_cols[0]).to_dict("records")
    features = []
    for i, r in enumerate(rows):
        rings = (
            [_local_coords(z, x, y, r["xmin"], r["ymin"], r["xmax"], r["ymax"],
                           mvt.DEFAULT_EXTENT)]
            if has_bbox
            else [[(mvt.DEFAULT_EXTENT // 2, mvt.DEFAULT_EXTENT // 2)]]
        )
        features.append(
            {
                "id": i + 1,  # spec: nonzero unique-in-layer id
                "type": mvt.GEOM_POLYGON if has_bbox else mvt.GEOM_POINT,
                "rings": rings,
                # bbox columns become the geometry ring, not properties
                # (tippecanoe likewise doesn't duplicate geometry as attrs)
                "props": {
                    k: (v.item() if hasattr(v, "item") else v)
                    for k, v in r.items()
                    if k in prop_cols
                },
            }
        )
    payload = mvt.encode_tile("features", features)
    return pd.DataFrame([{"z": z, "x": x, "y": y, "pbf": payload}])


def encode_tiles(tiles: DataFrame, feature_cols: Iterable[str]) -> DataFrame:
    """Group by tile key and encode each group to one binary payload
    (K2). applyInPandas keeps encoding executor-side; the groupBy is the
    single shuffle of the tile pipeline."""
    cols = ["z", "x", "y", *feature_cols]
    return (
        tiles.select(*cols)
        .groupBy("z", "x", "y")
        .applyInPandas(_encode_tile, "z int, x int, y int, pbf binary")
    )


def write_tileset(
    tiles: DataFrame,
    path: str,
    name: str,
    max_zoom: int = MAX_ZOOM,
    mode: str = "overwrite",
) -> None:
    """Write the (z, x, y, pbf) table partitioned by z/x — the storage
    analogue of tippecanoe's directory pyramid — then drop the
    ``metadata.json`` completion marker the incremental skip (P6) probes,
    mirroring reference data.py:33-35."""
    tiles.write.mode(mode).partitionBy("z", "x").parquet(path)
    meta = {"name": name, "format": "pbf", "maxzoom": max_zoom}
    # leading underscore: Spark data-source listings ignore _*/.* files,
    # so the marker coexists with the parquet parts (like _SUCCESS)
    with open(os.path.join(path, "_tileset_metadata.json"), "w") as fh:
        json.dump(meta, fh, separators=(",", ":"))


def read_tileset(spark: SparkSession, path: str) -> DataFrame:
    """Read a tileset back; partition pruning serves single-tile lookups
    (``WHERE z = .. AND x = ..`` touches one directory)."""
    return spark.read.parquet(path)


def tileset_complete(path: str) -> bool:
    """P6 existence probe (reference data.py:33-35)."""
    return os.path.exists(os.path.join(path, "_tileset_metadata.json"))
