"""Entry-2 batch standardization job: end-to-end, idempotent, profile."""

from __future__ import annotations

import numpy as np

from sids_data_pipeline_spark.jobs.standardize import run_standardize_job
from sids_data_pipeline_spark.sources.geotiff import decode_geotiff, encode_geotiff


def _write_fixture(path, stem, base=0.0):
    arr = (np.arange(64, dtype="float64") + base).reshape(8, 8)
    (path / f"{stem}.tif").write_bytes(
        encode_geotiff(arr, origin_x=0.0, origin_y=0.8, pixel_deg=0.1)
    )


def test_standardize_job_end_to_end_and_idempotent(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_fixture(src, "r1", 0.0)
    _write_fixture(src, "r2", 100.0)
    out = tmp_path / "out"
    ledger = str(tmp_path / "ledger")

    res1 = run_standardize_job(
        spark, str(src / "*.tif"), str(out), ledger,
        lon=(0.0, 0.45), lat=(0.0, 0.8),
    )
    assert res1 == {"processed": ["r1", "r2"], "skipped": []}
    # clipped to centers 0.05..0.45 inclusive → 5 columns x 8 rows
    vals, (ox, oy, sx, sy), nodata = decode_geotiff((out / "r1.tif").read_bytes())
    assert vals.shape == (8, 5)
    assert (ox, oy) == (0.0, 0.8)

    # second run: everything ledgered, nothing reprocessed
    res2 = run_standardize_job(
        spark, str(src / "*.tif"), str(out), ledger,
        lon=(0.0, 0.45), lat=(0.0, 0.8),
    )
    assert res2 == {"processed": [], "skipped": ["r1", "r2"]}

    # a new raster appears: only it is processed
    _write_fixture(src, "r3", 500.0)
    res3 = run_standardize_job(
        spark, str(src / "*.tif"), str(out), ledger,
        lon=(0.0, 0.45), lat=(0.0, 0.8),
    )
    assert res3["processed"] == ["r3"]
    assert sorted(res3["skipped"]) == ["r1", "r2"]
    assert (out / "r3.tif").exists()
