"""E4 multimodal plumbing: binary payload columns through mapInPandas.

The decode step is a deterministic stub (no media libs in this
container — operators/multimodal._decode_payload documents the swap
point); what these tests prove is the Spark-side plumbing the stub sits
in: ASSETS-shaped schema, Arrow batch transfer of binary columns, UDF
signatures, and batch-shape independence (results invariant under
repartitioning). Also the pattern referenced by sources/raster.py's
ingest_geotiff stub (binaryFile → mapInPandas decode).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators import multimodal
from sids_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return multimodal.documents_to_assets(docs)


def test_assets_schema(assets):
    fields = {f.name: f.dataType.simpleString() for f in assets.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["modality"] == "string"
    assert fields["meta"].startswith("struct<")


def test_extract_features_deterministic(assets, spark, sf_dir):
    feats = multimodal.extract_features(assets).toPandas().set_index("asset_id")
    docs = load_table(spark, "documents", sf_dir).toPandas().set_index("doc_id")
    assert len(feats) == len(docs)
    for doc_id, row in docs.head(25).iterrows():
        payload = row["text"].encode()
        n = len(payload)
        got = feats.loc[doc_id]
        assert got["n_bytes"] == n
        assert got["width"] == n % 640
        assert got["height"] == (n * 7) % 480
        assert got["n_frames"] == n % 24 + 1
        assert got["checksum"] == hashlib.md5(payload).hexdigest()


def test_extract_features_partition_invariant(assets):
    one = (
        multimodal.extract_features(assets.repartition(1))
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    many = (
        multimodal.extract_features(assets.repartition(7))
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    assert one.equals(many)


def test_frame_sample_video_only(assets):
    frames = multimodal.frame_sample(assets, every_n=8).toPandas()
    video_ids = {
        r.asset_id for r in assets.filter("modality = 'video'").collect()
    }
    assert set(frames["asset_id"]) <= video_ids
    assert len(frames) > 0
    # deterministic: indices step by every_n, slices are 8 bytes
    g = frames[frames["asset_id"] == frames["asset_id"].iloc[0]]
    assert list(g["frame_index"]) == list(range(0, g["frame_index"].max() + 1, 8))
    assert all(len(bytes(b)) <= 8 for b in frames["frame_bytes"])


def test_resize_stub_passthrough(assets):
    out = multimodal.resize_stub(assets, 224, 224)
    row = out.filter(F.col("asset_id") == 0).collect()[0]
    src = assets.filter(F.col("asset_id") == 0).collect()[0]
    assert bytes(row["payload"]) == bytes(src["payload"])
    assert (row["width"], row["height"]) == (224, 224)
