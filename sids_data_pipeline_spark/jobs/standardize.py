"""Entry-2 (batch module) as ONE data-parallel Spark job: raster
standardization with an idempotent completion ledger.

Reference: ``batch/processing/__main__.py`` + ``raster.py:20-40`` — per
file, gdal_translate band-select → gdalwarp clip to the SIDS window →
ZSTD/128×128 tiled output, then an SQLite ``INSERT`` marks the raster
done, and already-recorded rasters are skipped on re-run
(``utils.py:31-38``, ``data.py``). Here the whole batch is one declarative
plan: the registered ``geotiff`` format scans every input as pixel rows
(partition per file), a left-anti join on the Parquet ledger drops
already-standardized rasters BEFORE any decoding work is scheduled for
them (predicate on the file-path partition would be even earlier; the
anti-join keeps it declarative), `standardize_pixels` applies band select
+ extent clip, and the same format's write path emits the standardized
files in the reference's ZSTD+tiled profile. The ledger append is the
final action, so a crash mid-write re-processes (idempotent overwrite)
rather than skipping unfinished rasters.

At 100 TB: inputs parallelize per file, the clip filter prunes pixels
before the (per-raster) repartition, and the only driver-side state is
the pending-raster id list (manifest-sized).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sids_data_pipeline_spark.sources.geotiff_datasource import register
from sids_data_pipeline_spark.sources.raster import CLIP_LAT, CLIP_LON, standardize_pixels


def run_standardize_job(
    spark: SparkSession,
    input_glob: str,
    out_dir: str,
    ledger_path: str,
    band: int = 1,
    lon: tuple[float, float] = CLIP_LON,
    lat: tuple[float, float] = CLIP_LAT,
) -> dict:
    """Standardize every not-yet-done raster under ``input_glob`` into
    ``out_dir`` (ZSTD, 128×128 tiles) and append their ids to the
    ledger. Returns {"processed": [...], "skipped": [...]}."""
    import os

    register(spark)
    px = spark.read.format("geotiff").option("band", str(band)).load(input_glob)

    if "://" not in ledger_path and not os.path.exists(ledger_path):
        done = spark.createDataFrame([], "raster_id string")
    else:
        done = spark.read.parquet(ledger_path).select("raster_id")
    done = done.distinct()

    pending = px.join(done, "raster_id", "left_anti")
    std = standardize_pixels(pending, band=band)
    std = std.filter(F.col("lon").between(*lon) & F.col("lat").between(*lat))

    processed = [r.raster_id for r in std.select("raster_id").distinct().collect()]
    skipped = [r.raster_id for r in done.collect()]
    if processed:
        (
            std.repartition("raster_id")
            .write.format("geotiff")
            .option("compress", "zstd")
            .option("tile", "128")
            .mode("overwrite")
            .save(out_dir)
        )
        spark.createDataFrame(
            [(r,) for r in processed], "raster_id string"
        ).write.mode("append").parquet(ledger_path)
    return {"processed": sorted(processed), "skipped": sorted(skipped)}
