"""Terrain-products job: product correctness vs the per-raster
operators, constant job shape, ledger idempotency, incremental append."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.jobs.terrain import run_terrain_job
from sids_data_pipeline_spark.operators.terrain import build_overviews, hillshade
from sids_data_pipeline_spark.sources.raster import synthetic_raster


@pytest.fixture()
def estate(spark):
    return synthetic_raster(spark, "rast_gradient").unionByName(
        synthetic_raster(spark, "rast_nodata")
    )


def test_job_products_match_operators_and_ledger_skips(spark, estate, tmp_path):
    out = str(tmp_path / "products")
    ledger = str(tmp_path / "ledger")
    res = run_terrain_job(spark, estate, out, ledger, cellsize=30.0, levels=2)
    assert res["processed"] == ["rast_gradient", "rast_nodata"]
    assert res["skipped"] == []

    hs = spark.read.parquet(out + "/product=hillshade")
    for rid in ("rast_gradient", "rast_nodata"):
        got = {
            (r.x, r.y): r.hillshade
            for r in hs.filter(F.col("raster_id") == rid).collect()
        }
        want = {
            (r.x, r.y): r.hillshade
            for r in hillshade(
                synthetic_raster(spark, rid), cellsize=30.0
            ).collect()
        }
        assert got == want
    ov = spark.read.parquet(out + "/product=overviews")
    n_ov = {
        r.raster_id: r.n
        for r in ov.groupBy("raster_id").agg(F.count("*").alias("n")).collect()
    }
    assert n_ov["rast_gradient"] == 1024 + 256
    assert (
        n_ov["rast_nodata"]
        == build_overviews(synthetic_raster(spark, "rast_nodata"), 2).count()
    )

    # re-run: everything ledgered → zero work, outputs untouched
    res2 = run_terrain_job(spark, estate, out, ledger, cellsize=30.0, levels=2)
    assert res2 == {
        "processed": [],
        "skipped": ["rast_gradient", "rast_nodata"],
    }
    assert spark.read.parquet(out + "/product=hillshade").count() == hs.count()


def test_job_incremental_append(spark, estate, tmp_path):
    """A new raster arriving later derives alone; ledgered ones skip."""
    out = str(tmp_path / "products")
    ledger = str(tmp_path / "ledger")
    first = estate.filter(F.col("raster_id") == "rast_gradient")
    run_terrain_job(spark, first, out, ledger, levels=2)
    res = run_terrain_job(spark, estate, out, ledger, levels=2)
    assert res["processed"] == ["rast_nodata"]
    assert res["skipped"] == ["rast_gradient"]
    rids = {
        r.raster_id
        for r in spark.read.parquet(out + "/product=hillshade")
        .select("raster_id").distinct().collect()
    }
    assert rids == {"rast_gradient", "rast_nodata"}
