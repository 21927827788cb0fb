"""End-to-end pipeline lifecycle: one data-parallel run over all pending
pairs, per-pair exports, ledger append, idempotent re-run."""

from __future__ import annotations

import json
import os

from sids_data_pipeline_spark.jobs.pipeline import run_pipeline
from sids_data_pipeline_spark.sinks import tiles


def test_pipeline_end_to_end_and_idempotent(spark, tmp_path):
    out = str(tmp_path / "out")
    vectors = ["zones_grid", "zones_overlap"]
    rasters = ["rast_gradient", "rast_checker"]

    r1 = run_pipeline(spark, vectors, rasters, out, stats=("mean", "count"))
    assert r1["pending"] == 4
    assert sorted(r1["outputs"]) == [
        "zones_grid_rast_checker",
        "zones_grid_rast_gradient",
        "zones_overlap_rast_checker",
        "zones_overlap_rast_gradient",
    ]

    # per-pair outputs exist and decode
    pair = os.path.join(out, "zones_grid_rast_gradient")
    lines = spark.read.text(os.path.join(pair, "export.geojsonl")).collect()
    assert len(lines) == 4  # one feature per zone
    feat = json.loads(lines[0].value)
    assert feat["type"] == "Feature" and "mean" in feat["properties"]
    assert tiles.tileset_complete(os.path.join(pair, "tiles"))

    # signature behavior: a re-run finds nothing to do
    r2 = run_pipeline(spark, vectors, rasters, out, stats=("mean", "count"))
    assert r2 == {"pending": 0, "outputs": []}

    # adding a raster only processes the new pairs
    r3 = run_pipeline(
        spark, vectors, rasters + ["rast_nodata"], out, stats=("mean", "count")
    )
    assert r3["pending"] == 2
    assert all(k.endswith("rast_nodata") for k in r3["outputs"])


def test_curation_job_end_to_end(spark, tmp_path):
    """Full corpus-prep lifecycle: scrub → curate → split → shard →
    partitioned parquet, with zero-work idempotent re-run."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.jobs.curation import run_curation_job

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "corpus")
    m1 = run_curation_job(spark, docs, out, shard_tokens=2000)
    assert m1["skipped"] is False
    assert m1["n_input"] == docs.count()
    assert 0 < m1["n_curated"] <= m1["n_input"]
    assert set(m1["splits"]) <= {"train", "val", "test"}
    total_docs = sum(v["docs"] for v in m1["splits"].values())
    assert total_docs == m1["n_curated"]
    # materialized layout is partitioned by (split, shard_id)
    written = spark.read.parquet(out + "/data")
    assert {"split", "shard_id"} <= set(written.columns)
    # shard budget respected up to the one-doc overshoot rule
    worst = (
        written.groupBy("split", "shard_id")
        .agg(F.sum("n_words").alias("w"), F.max("n_words").alias("m"))
        .selectExpr("max(w - m) AS slack")
        .collect()[0]
        .slack
    )
    assert worst <= 2000
    # idempotent re-run: same config short-circuits
    m2 = run_curation_job(spark, docs, out, shard_tokens=2000)
    assert m2["skipped"] is True and m2["n_curated"] == m1["n_curated"]
    # changed config re-runs
    m3 = run_curation_job(spark, docs, out, shard_tokens=500)
    assert m3["skipped"] is False
