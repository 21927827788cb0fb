"""CLI front door (python -m sids_data_pipeline_spark) — the reference's
container entry-point UX (pipeline/processing/__main__.py:19-26,
batch/processing/__main__.py:13-20) over the Spark engine."""

from __future__ import annotations

import json

from sids_data_pipeline_spark.__main__ import main


def test_catalog_lists_queries(capsys):
    out = main(["catalog"])
    assert "pricing_summary" in out["queries"]
    assert json.loads(capsys.readouterr().out)["queries"] == out["queries"]


def test_query_subcommand_runs_catalog_entry(spark, capsys):
    out = main(["query", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001"])
    assert out["rows"] > 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == out["rows"]


def test_query_subcommand_rejects_unknown_name(capsys):
    import pytest

    with pytest.raises(SystemExit):
        main(["query", "no_such_query"])


def test_pipeline_subcommand_end_to_end(spark, tmp_path):
    out = main([
        "pipeline", "--vectors", "zones_grid", "--rasters", "rast_gradient",
        "--out", str(tmp_path / "run"), "--max-zoom", "3",
    ])
    assert out["pending"] == 1 and out["outputs"] == ["zones_grid_rast_gradient"]
    # idempotent re-run does zero work (reference data.py:26-40 behavior)
    again = main([
        "pipeline", "--vectors", "zones_grid", "--rasters", "rast_gradient",
        "--out", str(tmp_path / "run"), "--max-zoom", "3",
    ])
    assert again["pending"] == 0


def test_curate_subcommand_end_to_end(spark, tmp_path):
    out = main([
        "curate", "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "corpus"),
    ])
    assert out["n_input"] > 0 and 0 < out["n_curated"] <= out["n_input"]
    assert set(out["splits"]) == {"train", "val", "test"}
    assert (tmp_path / "corpus").exists()
