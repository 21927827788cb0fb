"""Structured Streaming wrapper: batch/stream parity for the windowed
aggregation (same operator definition, availableNow one-shot drain)."""

from __future__ import annotations

import pytest

from sids_data_pipeline_spark.operators import windows
from sids_data_pipeline_spark.sources.tables import load_table
from sids_data_pipeline_spark.streaming import jobs


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Stage events as a micro-batched parquet directory (the canonical
    micros-precision form — the streaming source schema-pins EVENTS)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, "events", sf_dir).repartition(4).write.parquet(path)
    return path


def test_stream_equals_batch(spark, events_dir, tmp_path):
    stream = jobs.stream_events(spark, events_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    result = jobs.windowed_counts_stream(stream, "10 minutes", "1 hour")
    jobs.run_available_now(result, "stream_counts", str(tmp_path / "ckpt"))

    got = {
        (r.window_start_us, r.event_type): (r.n_events, r.sum_value_cents)
        for r in spark.table("stream_counts").collect()
    }
    batch_events = spark.read.parquet(events_dir)
    want = {
        (r.window_start_us, r.event_type): (r.n_events, r.sum_value_cents)
        for r in windows.tumbling(batch_events, "10 minutes").collect()
    }
    assert got == want
