"""X4 lifecycle: temp-view scoping, cache release, JSON sink round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from sids_data_pipeline_spark import lifecycle
from sids_data_pipeline_spark.sinks import csvio


def test_temp_views_scope(spark):
    df = spark.range(5)
    with lifecycle.temp_views(spark, scoped_view=df):
        assert spark.sql("SELECT count(*) AS n FROM scoped_view").first().n == 5
    assert "scoped_view" not in [t.name for t in spark.catalog.listTables()]


def test_release_unpersists(spark):
    df = spark.range(10).persist()
    df.count()
    assert df.storageLevel.useMemory
    lifecycle.release(df)
    # unpersist is async; the flag on the plan flips immediately
    assert not df.storageLevel.useMemory


def test_json_round_trip(spark, tmp_path):
    path = str(tmp_path / "out.jsonl")
    df = spark.range(3).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id").cast("string")).alias("name")
    )
    csvio.write_json(df, path)
    back = csvio.read_json(spark, path, "id long, name string")
    assert sorted(map(tuple, back.collect())) == [(0, "n0"), (1, "n1"), (2, "n2")]


def test_release_tracked_actually_unpins(spark):
    """track() must hold a strong reference: an operator-local persisted
    frame stays releasable after the operator returns (a weak registry
    auto-discarded it and leaked the JVM cache forever)."""
    from sids_data_pipeline_spark import lifecycle

    def op():
        df = spark.range(100).persist()
        df.count()
        return lifecycle.track(df)

    out = op()
    import gc

    gc.collect()
    assert any(d is out for d in lifecycle._TRACKED)
    assert out.storageLevel.useMemory
    lifecycle.release_tracked()
    assert not lifecycle._TRACKED
    assert not out.storageLevel.useMemory


def test_e3_gate_persists_route_through_track(spark, sf_dir):
    """ADVICE r14: gate-internal persists (the PCA-rotated corpus in
    similarity_pq_pca_gate) must register via lifecycle.track so the
    catalog runner's release_tracked unpins them between queries —
    untracked gate caches accumulate across a 243-entry driver run."""
    from sids_data_pipeline_spark import lifecycle
    from sids_data_pipeline_spark.plans.catalog import all_queries

    lifecycle.release_tracked()
    res = all_queries()["similarity_pq_pca_gate"].spark(spark, sf_dir)
    assert lifecycle._TRACKED, "gate persisted outside lifecycle.track"
    tracked = list(lifecycle._TRACKED)
    row = res.collect()[0]
    assert row.violations == 0 and row.found_hits
    lifecycle.release_tracked()
    assert all(not d.storageLevel.useMemory for d in tracked)
