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


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """Duplicates are removed WITHIN a batch and ACROSS batches/runs via
    the persistent digest ledger."""
    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    schema = "doc_id long, text string"

    batch1 = spark.createDataFrame(
        [(0, "alpha"), (1, "alpha"), (2, "beta")], schema
    )
    batch1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    jobs.streaming_exact_dedup(
        spark, stream, out, str(tmp_path / "ck1"), key_cols=("text",)
    )
    rows1 = spark.read.parquet(out + "/rows")
    assert sorted(r.doc_id for r in rows1.collect()) == [0, 2]

    # second run with new files: 'alpha'/'beta' are already seen
    spark.createDataFrame([(3, "beta"), (4, "gamma")], schema).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    jobs.streaming_exact_dedup(
        spark, stream2, out, str(tmp_path / "ck1"), key_cols=("text",)
    )
    rows2 = spark.read.parquet(out + "/rows")
    assert sorted(r.doc_id for r in rows2.collect()) == [0, 2, 4]


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed counts finalize once the watermark passes a
    window; an event later than the watermark is dropped, not re-opened."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    src = str(tmp_path / "late_src")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    sink = str(tmp_path / "late_out")

    def drain(qname: str) -> None:
        stream = spark.readStream.schema(schema).parquet(src)
        result = jobs.windowed_counts_stream(stream, "10 minutes", "30 minutes")
        q = (
            result.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_late"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: on-time events spanning 2 hours advance the watermark to
    # t0 + 120m − 30m (persisted in the checkpoint)
    on_time = [
        (i, t0 + timedelta(minutes=10 * i), 1, "click", 1.0, "{}") for i in range(13)
    ]
    spark.createDataFrame(on_time, schema).repartition(1).write.mode(
        "append"
    ).parquet(src)
    drain("late_counts")

    # run 2 (same checkpoint): a very-late event behind the watermark
    late = [(99, t0 + timedelta(minutes=5), 1, "click", 1.0, "{}")]
    spark.createDataFrame(late, schema).repartition(1).write.mode("append").parquet(
        src
    )
    drain("late_counts")
    t0_us = 1_704_067_200_000_000
    finalized = {
        r.window_start_us: r.n_events for r in spark.read.parquet(sink).collect()
    }
    # the first window finalized with ONE event; the late arrival (which
    # would have made it 2) was behind the watermark and dropped
    assert finalized.get(t0_us) == 1


def test_stateful_running_totals(spark, events_dir, tmp_path):
    """applyInPandasWithState accumulates across micro-batches; the final
    update per user equals the batch aggregate."""
    from pyspark.sql import functions as F

    stream = jobs.stream_events(spark, events_dir, max_files_per_trigger=2)
    result = jobs.stateful_running_totals(stream)
    q = (
        result.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per (user, batch); the max per user is the
    # final running total
    got = {
        r.user_id: (r.n_events, r.sum_value_cents)
        for r in spark.table("running_totals")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value_cents").alias("sum_value_cents"),
        )
        .collect()
    }
    want = {
        r.user_id: (r.n, r.cents)
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want


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


def test_streaming_sessions_match_batch(spark, events_dir, tmp_path):
    """Watermarked session windows (append mode) finalize to exactly the
    batch operator's sessions once the watermark passes them. A far-future
    heartbeat event closes every real session; cross-run checkpointed
    watermark + no-data micro-batch trigger the final emission."""
    from datetime import datetime

    src = str(tmp_path / "sess_src")
    sink = str(tmp_path / "sess_out")
    ck = str(tmp_path / "sess_ck")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    base = spark.read.parquet(events_dir)
    base.repartition(2).write.mode("append").parquet(src)

    def drain() -> None:
        stream = jobs.stream_events(spark, src)
        result = jobs.session_windows_stream(stream, "30 minutes", "1 hour")
        q = (
            result.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    sentinel = 10**9
    spark.createDataFrame(
        [(sentinel, datetime(2030, 1, 1), sentinel, "hb", 0.0, "{}")], schema
    ).write.mode("append").parquet(src)
    drain()

    got = {
        (r.user_id, r.session_start_us): (
            r.session_end_us, r.n_events, r.sum_value_cents
        )
        for r in spark.read.parquet(sink).filter(f"user_id < {sentinel}").collect()
    }
    want = {
        (r.user_id, r.session_start_us): (
            r.session_end_us, r.n_events, r.sum_value_cents
        )
        for r in windows.session(base, "30 minutes").collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, events_dir, tmp_path):
    """Watermarked stream-stream click→purchase attribution equals the
    identical static join (inner joins emit on match, so one availableNow
    drain yields the complete result)."""
    from pyspark.sql import functions as F

    def split(df):
        clicks = df.filter(F.col("event_type") == "click")
        purchases = df.filter(F.col("event_type") == "purchase")
        return clicks, purchases

    s_clicks, s_purchases = split(jobs.stream_events(spark, events_dir))
    result = jobs.stream_stream_attribution(s_clicks, s_purchases)
    sink = str(tmp_path / "attr_out")
    q = (
        result.writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "attr_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.click_id, r.purchase_id): (r.user_id, r.value_cents)
        for r in spark.read.parquet(sink).collect()
    }

    b_clicks, b_purchases = split(spark.read.parquet(events_dir))
    want = {
        (r.click_id, r.purchase_id): (r.user_id, r.value_cents)
        for r in jobs.stream_stream_attribution(b_clicks, b_purchases).collect()
    }
    assert len(want) > 0 and got == want


def test_data_batches_only_join_parity_and_conf_restore(
    spark, events_dir, tmp_path
):
    """Skipping the trailing no-data micro-batch (data_batches_only)
    must not change an inner stream-stream join's output — matches emit
    on arrival even across MULTIPLE micro-batches (maxFilesPerTrigger=2
    over the 4-file stage), because the watermark is state-cleanup-only
    for inner joins. Also pins that the context restores the session
    conf on exit."""
    from pyspark.sql import functions as F

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    before = spark.conf.get(key)

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    s_clicks, s_purchases = split(
        jobs.stream_events(spark, events_dir, max_files_per_trigger=2)
    )
    sink = str(tmp_path / "nb_out")
    with jobs.data_batches_only(spark):
        assert spark.conf.get(key) == "false"
        q = (
            jobs.stream_stream_attribution(s_clicks, s_purchases)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "nb_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    assert spark.conf.get(key) == before

    got = {
        (r.click_id, r.purchase_id): (r.user_id, r.value_cents)
        for r in spark.read.parquet(sink).collect()
    }
    b_clicks, b_purchases = split(spark.read.parquet(events_dir))
    want = {
        (r.click_id, r.purchase_id): (r.user_id, r.value_cents)
        for r in jobs.stream_stream_attribution(b_clicks, b_purchases).collect()
    }
    assert len(want) > 0 and got == want


def test_cdc_upsert_across_batches_with_tombstone(spark, tmp_path):
    """Insert batch, then update+delete batch in a SECOND drain: the
    state table must show updates applied, tombstoned keys gone, and
    untouched keys intact."""
    src = str(tmp_path / "cdc_in")
    state = str(tmp_path / "cdc_state")
    schema = "k long, ts int, seq int, v string, dead boolean"

    spark.createDataFrame(
        [(1, 1, 0, "a", False), (2, 1, 0, "b", False), (3, 1, 0, "c", False)],
        schema,
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    jobs.streaming_cdc_upsert(
        spark, stream, state, str(tmp_path / "ck"),
        keys=("k",), ts_col="ts", tiebreak_col="seq", delete_col="dead",
    )
    got = {r.k: r.v for r in jobs.read_cdc_state(spark, state).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}

    # second drain: update k=1 twice in-batch (latest wins), delete k=2
    spark.createDataFrame(
        [(1, 2, 0, "A0", False), (1, 2, 1, "A1", False), (2, 2, 0, "x", True)],
        schema,
    ).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    jobs.streaming_cdc_upsert(
        spark, stream2, state, str(tmp_path / "ck"),
        keys=("k",), ts_col="ts", tiebreak_col="seq", delete_col="dead",
    )
    got = {r.k: r.v for r in jobs.read_cdc_state(spark, state).collect()}
    assert got == {1: "A1", 3: "c"}


def test_cdc_upsert_replay_converges(spark, tmp_path):
    """At-least-once replay: re-applying the SAME batch id folds onto the
    predecessor snapshot (pointer.prev), not onto its own output — the
    snapshot is identical after a simulated duplicate delivery."""
    import json
    import os

    src = str(tmp_path / "cdc_in")
    state = str(tmp_path / "cdc_state")
    schema = "k long, ts int, seq int, v string, dead boolean"
    spark.createDataFrame(
        [(1, 1, 0, "a", False)], schema
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    jobs.streaming_cdc_upsert(
        spark, stream, state, str(tmp_path / "ck"),
        keys=("k",), ts_col="ts", tiebreak_col="seq", delete_col="dead",
    )
    with open(os.path.join(state, "_CURRENT")) as f:
        ptr = json.load(f)
    before = sorted(
        map(tuple, jobs.read_cdc_state(spark, state).collect())
    )
    # simulate redelivery of the same micro-batch through a fresh
    # checkpoint (same batch id 0): snapshot must converge
    stream2 = spark.readStream.schema(schema).parquet(src)
    jobs.streaming_cdc_upsert(
        spark, stream2, state, str(tmp_path / "ck_replay"),
        keys=("k",), ts_col="ts", tiebreak_col="seq", delete_col="dead",
    )
    with open(os.path.join(state, "_CURRENT")) as f:
        ptr2 = json.load(f)
    after = sorted(
        map(tuple, jobs.read_cdc_state(spark, state).collect())
    )
    assert before == after
    assert ptr2["batch"] == ptr["batch"] == 0


def test_stateful_rolling_matches_batch_and_expires_state(spark, tmp_path):
    """Two micro-batches for one user: the second batch's events must see
    the first batch's events inside the horizon, and NOT see expired
    ones — i.e. the drain equals batch rolling_stats over the union."""
    from datetime import datetime as dt

    from sids_data_pipeline_spark.operators.windows import rolling_stats

    src = str(tmp_path / "roll_in")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    b1 = [
        (1, dt(2024, 1, 1, 10, 0, 0), 7, "e", 1.0, ""),
        (2, dt(2024, 1, 1, 10, 30, 0), 7, "e", 2.0, ""),
    ]
    b2 = [
        (3, dt(2024, 1, 1, 11, 15, 0), 7, "e", 4.0, ""),  # 10:00 expired
        (4, dt(2024, 1, 1, 11, 20, 0), 7, "e", 8.0, ""),
    ]
    out_dir = str(tmp_path / "roll_out")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            jobs.stateful_rolling_stats(stream, lookback_seconds=3600)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    drain()
    got = {
        r.ts_us: (r.n_trailing, r.sum_trailing_cents)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = spark.createDataFrame(b1 + b2, schema)
    want = {
        r.ts_us: (r.n_trailing, r.sum_trailing_cents)
        for r in rolling_stats(batch, lookback_seconds=3600).collect()
    }
    assert got == want
    # the 11:15 event must NOT count the expired 10:00 event
    us = lambda d: int(d.timestamp() * 1_000_000)
    assert got[us(dt(2024, 1, 1, 11, 15, 0))] == (2, 600)


def test_watermarked_dedup_bounded_state(spark, tmp_path):
    """Duplicates inside the watermark horizon collapse; the survivor set
    equals batch dropDuplicates over one drained batch."""
    from datetime import datetime as dt

    src = str(tmp_path / "wm_in")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    rows = [
        (1, dt(2024, 1, 1, 10, 0, 0), 7, "click", 1.0, ""),
        (2, dt(2024, 1, 1, 10, 0, 5), 7, "click", 1.0, ""),   # dup key
        (3, dt(2024, 1, 1, 10, 1, 0), 8, "view", 2.0, ""),
    ]
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = jobs.watermarked_dedup_stream(
        stream, ("user_id", "event_type"), watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory").queryName("wm_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {(r.user_id, r.event_type) for r in spark.table("wm_dedup").collect()}
    assert got == {(7, "click"), (8, "view")}
    assert spark.table("wm_dedup").count() == 2


def test_stateful_rolling_late_event_ignores_future_state(spark, tmp_path):
    """A late cross-batch event must not count state entries NEWER than
    itself: the batch RANGE frame is trailing-only."""
    from datetime import datetime as dt

    src = str(tmp_path / "late_in")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    out_dir = str(tmp_path / "late_out")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            jobs.stateful_rolling_stats(stream, lookback_seconds=3600)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "late_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    b1 = [(1, dt(2024, 1, 1, 12, 0, 0), 7, "e", 1.0, "")]
    b2 = [(2, dt(2024, 1, 1, 11, 30, 0), 7, "e", 2.0, "")]  # late arrival
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    drain()
    us = lambda d: int(d.timestamp() * 1_000_000)
    got = {
        r.ts_us: (r.n_trailing, r.sum_trailing_cents)
        for r in spark.read.parquet(out_dir).collect()
    }
    # the 11:30 late event sees only itself, not the future 12:00 entry
    assert got[us(dt(2024, 1, 1, 11, 30, 0))] == (1, 200)


def test_stateful_cents_rounding_matches_sql_half_up(spark):
    """pandas' .round() is half-to-even; the kernels must use HALF_UP
    like F.round. NULLs carry 0 cents with a False nonnull flag so
    callers reproduce SQL SUM semantics (all-NULL group → NULL sum)."""
    import numpy as np
    import pandas as pd

    from sids_data_pipeline_spark.streaming.jobs import _cents_half_up

    s = pd.Series([0.125, 0.135, -0.125, None])
    cents, nonnull = _cents_half_up(s)
    # 12.5 → 13 (HALF_UP; banker's rounding would give 12), -12.5 → -13
    assert list(cents) == [13, 14, -13, 0]
    assert list(nonnull) == [True, True, True, False]
    assert cents.dtype == np.dtype("int64")


def test_stateful_all_null_values_sum_null(spark, tmp_path):
    """A user whose every value is NULL must report a NULL sum — the
    batch SUM / SQL-oracle semantics — not 0 (round-7 review)."""
    import datetime as dt

    from sids_data_pipeline_spark.streaming.jobs import (
        run_available_now,
        stateful_running_totals,
        stream_events,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 7, dt.datetime(2024, 1, 1, 0, 0, 0), "view", None),
         (2, 7, dt.datetime(2024, 1, 1, 0, 1, 0), "view", None),
         (3, 8, dt.datetime(2024, 1, 1, 0, 2, 0), "view", 1.5)],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    ).coalesce(1).write.parquet(src)
    stream = stream_events(spark, src)
    run_available_now(
        stateful_running_totals(stream), "sdp_nulltotals",
        str(tmp_path / "ckpt"), output_mode="update",
    )
    got = {r.user_id: r.sum_value_cents
           for r in spark.table("sdp_nulltotals").collect()}
    assert got[7] is None
    assert got[8] == 150


def test_stateful_rolling_all_null_window_and_trunc(spark, tmp_path):
    """Rolling kernel: an all-NULL trailing window sums to NULL, and a
    pre-1970 fractional-second timestamp buckets by FLOOR — matching the
    batch operator and the SQL oracle (round-7 review, both sides)."""
    import datetime as dt

    from sids_data_pipeline_spark.operators.windows import rolling_stats
    from sids_data_pipeline_spark.streaming.jobs import (
        run_available_now,
        stateful_rolling_stats,
        stream_events,
    )

    rows = [
        (1, 7, dt.datetime(1969, 12, 31, 23, 59, 59, 500000), "v", None),
        (2, 7, dt.datetime(1970, 1, 1, 0, 10, 0), "v", None),
        (3, 8, dt.datetime(2024, 1, 1, 0, 0, 0), "v", 2.0),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    ).coalesce(1).write.parquet(src)
    batch = {
        (r.user_id, r.ts_us): (r.n_trailing, r.sum_trailing_cents, r.mean_trailing)
        for r in rolling_stats(spark.read.parquet(src)).collect()
    }
    run_available_now(
        stateful_rolling_stats(stream_events(spark, src)), "sdp_nullroll",
        str(tmp_path / "ckpt"), output_mode="append",
    )
    stream = {
        (r.user_id, r.ts_us): (r.n_trailing, r.sum_trailing_cents, r.mean_trailing)
        for r in spark.table("sdp_nullroll").collect()
    }
    assert stream == batch


def test_streaming_raster_ingest_incremental(spark, tmp_path):
    """SURVEY §7 streaming-ingest wrapper: the file-source checkpoint is
    the P6 ledger — first drain ingests the files present, second drain
    after a new file arrives appends ONLY that file's pixels."""
    import numpy as np

    from sids_data_pipeline_spark.sources.geotiff import (
        encode_geotiff,
        ingest_geotiff,
    )
    from sids_data_pipeline_spark.streaming.jobs import streaming_raster_ingest

    src = tmp_path / "in"
    src.mkdir()
    arr = np.arange(64, dtype="float64").reshape(8, 8)
    (src / "r1.tif").write_bytes(encode_geotiff(arr, 0.0, 0.8, 0.1))
    (src / "r2.tif").write_bytes(
        encode_geotiff(arr + 100, 0.0, 0.8, 0.1, compress="lzw",
                       dtype="u2", predictor=2)
    )
    out = str(tmp_path / "pixels")
    ckpt = str(tmp_path / "ckpt")

    streaming_raster_ingest(spark, str(src), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 128
    assert {r.raster_id for r in got.select("raster_id").distinct().collect()} \
        == {"r1", "r2"}

    # incremental: only the NEW file lands on the second drain
    (src / "r3.tif").write_bytes(
        encode_geotiff(arr + 200, 0.0, 0.8, 0.1, bigtiff=True)
    )
    streaming_raster_ingest(spark, str(src), out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == 192  # +64, not re-ingesting r1/r2

    # value parity with the batch path on the same files
    batch = ingest_geotiff(spark, str(src) + "/*.tif")
    a = sorted(map(tuple, got2.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b


def test_streaming_near_dedup_equals_batch(spark, tmp_path):
    """streaming_near_dedup drained over multiple micro-batches must
    emit exactly the batch operator's pairs, each exactly once."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.dedup import near_duplicates_minhash
    from sids_data_pipeline_spark.streaming.jobs import streaming_near_dedup

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs right now ok",
    ]
    rows = [
        (i, base[i % 2] + (" extra" if i % 3 == 0 else ""))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "src")
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).repartition(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    streaming_near_dedup(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), threshold=0.2
    )
    got = {
        (r.id1, r.id2): r.jaccard
        for r in spark.read.parquet(str(tmp_path / "out" / "pairs")).collect()
    }
    want = {
        (r.id1, r.id2): r.jaccard
        for r in near_duplicates_minhash(docs, threshold=0.2).collect()
    }
    assert got == want
    # exactly-once: the parquet union has no duplicate pairs
    n_rows = spark.read.parquet(str(tmp_path / "out" / "pairs")).count()
    assert n_rows == len(got)


def test_streaming_vector_ingest_incremental(spark, tmp_path, monkeypatch):
    """Drop-folder vector ingest: first drain ingests the shapefile,
    second drain after a GeoPackage lands ingests ONLY the new file
    (the file-source checkpoint is the incrementality ledger), and the
    ledger's zones equal the batch ingests row-for-row. The shapefile
    GEOMETRY parse must run EXECUTOR-side: a tripwire on the
    driver-process parser proves no driver-side decode (executor python
    workers import the module independently, so the patch only fires if
    the DRIVER parses)."""
    import os

    from sids_data_pipeline_spark.sources import shapefile as shp_mod
    from sids_data_pipeline_spark.sources.geopackage import write_geopackage
    from sids_data_pipeline_spark.sources.shapefile import write_shapefile
    from sids_data_pipeline_spark.sources.vector import FIXTURE_BUILDERS
    from sids_data_pipeline_spark.streaming.jobs import streaming_vector_ingest

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "zones")
    ckpt = str(tmp_path / "ckpt")
    write_shapefile(
        list(FIXTURE_BUILDERS["zones_grid"]()), str(drop / "grid.shp")
    )

    def _driver_parse_tripwire(data):
        raise AssertionError(
            "read_shp_geometries ran in the DRIVER process — the "
            "streaming twin must parse .shp content executor-side"
        )

    monkeypatch.setattr(shp_mod, "read_shp_geometries", _driver_parse_tripwire)
    try:
        streaming_vector_ingest(spark, str(drop) + "/*", out, ckpt)
    finally:
        monkeypatch.undo()
    first = spark.read.parquet(out)
    assert first.count() == 4
    assert set(r.vector_id for r in first.collect()) == {"grid"}

    write_geopackage(
        list(FIXTURE_BUILDERS["zones_overlap"]()), str(drop / "overlap.gpkg")
    )
    streaming_vector_ingest(spark, str(drop) + "/*", out, ckpt)
    both = spark.read.parquet(out)
    assert both.count() == 8
    assert set(r.vector_id for r in both.collect()) == {"grid", "overlap"}
    # batch-path parity: same WKB bytes for the gpkg layer
    from sids_data_pipeline_spark.sources.geopackage import ingest_geopackage

    want = {
        r.fid: r.geometry
        for r in ingest_geopackage(
            spark, str(drop / "overlap.gpkg"), vector_id="overlap"
        ).collect()
    }
    got = {
        r.fid: r.geometry
        for r in both.filter("vector_id = 'overlap'").collect()
    }
    assert got == want


def test_streaming_vector_ingest_reprojects_non_wgs84(spark, tmp_path):
    """A dropped layer whose .prj declares a registered projected CRS
    (NZTM, EPSG:2193) must reproject through the same vector_reproject
    leg as the batch ingest — ledger zones equal
    ingest_shapefile(reproject=True) byte-for-byte."""
    from sids_data_pipeline_spark.sources.shapefile import (
        ingest_shapefile,
        write_shapefile,
    )
    from sids_data_pipeline_spark.sources.vector import FIXTURE_BUILDERS
    from sids_data_pipeline_spark.streaming.jobs import streaming_vector_ingest

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "zones")
    ckpt = str(tmp_path / "ckpt")
    # NZTM-plane rectangles (meters): fabricate from the grid fixture by
    # writing plausible projected coordinates directly
    recs = [
        (0, "a", _rect_wkb(1_560_000.0, 5_170_000.0, 1_570_000.0, 5_180_000.0)),
        (1, "b", _rect_wkb(1_570_000.0, 5_170_000.0, 1_580_000.0, 5_180_000.0)),
    ]
    write_shapefile(recs, str(drop / "nz.shp"))
    (drop / "nz.prj").write_text(
        'PROJCS["NZGD2000 / New Zealand Transverse Mercator 2000",'
        'GEOGCS["NZGD2000"],AUTHORITY["EPSG","2193"]]'
    )
    streaming_vector_ingest(spark, str(drop) + "/*", out, ckpt, reproject=True)
    got = {r.fid: r.geometry for r in spark.read.parquet(out).collect()}
    want = {
        r.fid: r.geometry
        for r in ingest_shapefile(
            spark, str(drop / "nz.shp"), vector_id="nz", reproject=True
        ).collect()
    }
    assert got == want and len(got) == 2


def _rect_wkb(x0, y0, x1, y1):
    """Minimal WKB MultiPolygon rectangle (little-endian)."""
    import struct as st

    ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    poly = st.pack("<BII", 1, 3, 1) + st.pack("<I", len(ring)) + b"".join(
        st.pack("<dd", x, y) for x, y in ring
    )
    return st.pack("<BII", 1, 6, 1) + poly


def test_streaming_vector_ingest_sidecar_race_fails_batch(spark, tmp_path):
    """A .shp listed before its .prj/.dbf land must FAIL the batch (so
    the file-source checkpoint does not commit a permanently mislabeled
    ingest); once the sidecars arrive, a retry ingests the complete
    set."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from sids_data_pipeline_spark.sources.shapefile import write_shapefile
    from sids_data_pipeline_spark.sources.vector import FIXTURE_BUILDERS
    from sids_data_pipeline_spark.streaming.jobs import streaming_vector_ingest

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "zones")
    ckpt = str(tmp_path / "ckpt")
    write_shapefile(
        list(FIXTURE_BUILDERS["zones_grid"]()), str(drop / "grid.shp")
    )
    # simulate the producer still mid-upload: .shp visible, .prj missing
    os.rename(str(drop / "grid.prj"), str(tmp_path / "grid.prj.held"))
    with pytest.raises(StreamingQueryException, match="sidecars"):
        streaming_vector_ingest(spark, str(drop) + "/*", out, ckpt)
    # producer finishes; the retry (same checkpoint) ingests cleanly
    os.rename(str(tmp_path / "grid.prj.held"), str(drop / "grid.prj"))
    streaming_vector_ingest(spark, str(drop) + "/*", out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert {r.vector_id for r in got.collect()} == {"grid"}


def test_streaming_vector_ingest_duplicate_stem_refuses(spark, tmp_path):
    """vector_id is the file stem AND the ledger key: two same-stem
    layers in one batch (multi-directory glob) would be ambiguous
    downstream and would cross-route through each other's reprojection
    leg — the batch must refuse loudly naming both paths."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from sids_data_pipeline_spark.sources.shapefile import write_shapefile
    from sids_data_pipeline_spark.sources.vector import FIXTURE_BUILDERS
    from sids_data_pipeline_spark.streaming.jobs import streaming_vector_ingest

    for sub in ("a", "b"):
        d = tmp_path / "drop" / sub
        d.mkdir(parents=True)
        write_shapefile(
            list(FIXTURE_BUILDERS["zones_grid"]()), str(d / "grid.shp")
        )
    with pytest.raises(
        StreamingQueryException, match="duplicate vector_id 'grid'"
    ):
        streaming_vector_ingest(
            spark,
            str(tmp_path / "drop") + "/*/*",
            str(tmp_path / "zones"),
            str(tmp_path / "ckpt"),
        )


def test_streaming_media_ingest_incremental_and_quarantine(spark, tmp_path):
    """Drop-folder media ingest: first drain decodes a PNG + WAV with
    real dims through the shared codec dispatch; a second drain after a
    GIF lands processes ONLY the new file. A corrupt PNG (bad CRC)
    dropped AMONG good assets must NOT poison the stream: the batch
    completes, the good assets decode, and the corrupt one lands as a
    status='quarantined' row carrying the error — failing the batch
    would be permanent, since the file source re-lists the same bytes
    on every retry."""
    import numpy as np

    from sids_data_pipeline_spark.functions import imagecodec as ic
    from sids_data_pipeline_spark.streaming.jobs import streaming_media_ingest

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    (drop / "pic.png").write_bytes(ic.png_encode(ic.synth_image(1, 12, 7, 3)))
    (drop / "tone.wav").write_bytes(
        ic.wav_encode(np.zeros((400, 2), dtype=np.int16), sample_rate=8000)
    )
    streaming_media_ingest(spark, str(drop) + "/*", out, ckpt)
    first = {r.media_id: r for r in spark.read.parquet(out).collect()}
    assert (first["pic"].modality, first["pic"].width, first["pic"].height) == (
        "image", 12, 7,
    )
    assert (first["tone"].modality, first["tone"].width,
            first["tone"].height, first["tone"].n_frames) == ("audio", 8000, 2, 400)
    assert {r.status for r in first.values()} == {"ok"}

    frames = np.zeros((3, 4, 5), dtype=np.uint8)
    (drop / "clip.gif").write_bytes(ic.gif_encode(frames))
    streaming_media_ingest(spark, str(drop) + "/*", out, ckpt)
    both = {r.media_id: r for r in spark.read.parquet(out).collect()}
    assert len(both) == 3
    assert (both["clip"].modality, both["clip"].n_frames) == ("video", 3)

    # corrupt GIF (truncated LZW) + corrupt PNG (bad CRC) among a good
    # asset: the stream completes, good decodes, bad quarantines
    bad_png = bytearray(ic.png_encode(ic.synth_image(2, 6, 6, 1)))
    bad_png[41] ^= 0xFF
    (drop / "corrupt.png").write_bytes(bytes(bad_png))
    good_gif = ic.gif_encode(np.full((2, 3, 3), 5, dtype=np.uint8))
    (drop / "torn.gif").write_bytes(good_gif[: len(good_gif) - 8])
    (drop / "fine.png").write_bytes(ic.png_encode(ic.synth_image(3, 9, 4, 1)))
    streaming_media_ingest(spark, str(drop) + "/*", out, ckpt)
    rows = {r.media_id: r for r in spark.read.parquet(out).collect()}
    assert len(rows) == 6
    assert (rows["fine"].status, rows["fine"].width) == ("ok", 9)
    assert rows["corrupt"].status == "quarantined"
    assert "CRC" in rows["corrupt"].error and rows["corrupt"].width is None
    assert rows["torn"].status == "quarantined"
    assert rows["torn"].checksum is not None
    # replay-safety: a fresh drain with nothing new is a no-op
    streaming_media_ingest(spark, str(drop) + "/*", out, ckpt)
    assert spark.read.parquet(out).count() == 6


def test_ann_enrich_stream_equals_batch(spark, tmp_path):
    """streaming/jobs.ann_enrich_stream: one staged file -> one
    availableNow micro-batch -> the streamed neighbor table equals the
    batch topk_ivf_pq over the same static pre-encoded index,
    row-for-row including the exact integer ADC dist2 (foreachBatch
    reuses the batch operator, so drift means replay or index breakage)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators import similarity
    from sids_data_pipeline_spark.streaming.jobs import ann_enrich_stream

    rng = np.random.default_rng(3)
    ctr = rng.normal(scale=2.0, size=(3, 8)).astype(np.float32)
    vecs = (
        ctr[rng.integers(0, 3, 300)]
        + rng.normal(scale=0.2, size=(300, 8)).astype(np.float32)
    ).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(300), "embedding": list(map(list, vecs))})
    )
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=3, m=2, kc=4, iters=1)
    enc = similarity.ivf_pq_encode(emb, cents, books).persist()

    src = str(tmp_path / "src")
    queries = emb.filter(F.col("vec_id") < 3)
    queries.repartition(1).write.parquet(src)
    qstream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(src)
    out = str(tmp_path / "out")
    ann_enrich_stream(
        qstream, enc, cents, books, out, str(tmp_path / "ckpt"),
        k=6, nprobe=2,
    )
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    streamed = (
        spark.read.parquet(out + "/rows").select(cols).toPandas()
        .sort_values(cols[:2]).reset_index(drop=True)
    )
    batch = (
        similarity.topk_ivf_pq(
            enc, queries, cents, books, k=6, nprobe=2,
            candidates_encoded=True,
        ).toPandas().sort_values(cols[:2]).reset_index(drop=True)
    )
    assert len(streamed) > 0
    assert streamed.equals(batch[cols])


def test_ann_enrich_stream_refine_equals_batch_and_is_exact(spark, tmp_path):
    """streaming/jobs.ann_enrich_stream with refine_with: each
    micro-batch runs the TWO-STAGE serving shape (ADC shortlist from
    the static index, exact integer re-rank against the raw vectors),
    so (1) the streamed table equals the batch topk_ivf_pq_refine over
    the same query set row-for-row, and (2) every streamed dist2 is the
    EXACT integer L2 for its (query, neighbor) pair — recomputed
    independently in numpy — not the ADC approximation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators import similarity
    from sids_data_pipeline_spark.streaming.jobs import ann_enrich_stream

    rng = np.random.default_rng(11)
    ctr = rng.normal(scale=2.0, size=(3, 8)).astype(np.float32)
    vecs = (
        ctr[rng.integers(0, 3, 300)]
        + rng.normal(scale=0.2, size=(300, 8)).astype(np.float32)
    ).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(300), "embedding": list(map(list, vecs))})
    )
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=3, m=2, kc=4, iters=1)
    enc = similarity.ivf_pq_encode(emb, cents, books).persist()

    src = str(tmp_path / "src")
    queries = emb.filter(F.col("vec_id") < 3)
    queries.repartition(1).write.parquet(src)
    qstream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(src)
    out = str(tmp_path / "out")
    ann_enrich_stream(
        qstream, enc, cents, books, out, str(tmp_path / "ckpt"),
        k=6, nprobe=2, refine_with=emb, kprime=24,
    )
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    streamed = (
        spark.read.parquet(out + "/rows").select(cols).toPandas()
        .sort_values(cols[:2]).reset_index(drop=True)
    )
    batch = (
        similarity.topk_ivf_pq_refine(
            emb, queries, cents, books, k=6, kprime=24, nprobe=2,
            encoded=enc,
        ).toPandas().sort_values(cols[:2]).reset_index(drop=True)
    )
    assert len(streamed) > 0
    assert streamed.equals(batch[cols])
    # exactness: streamed dist2 is the true integer L2, recomputed
    # independently over the same x1e6 quantization the operators use
    micros = np.round(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    for row in streamed.itertuples(index=False):
        diff = micros[int(row.query_id)] - micros[int(row.neighbor_id)]
        assert int(row.dist2) == int((diff * diff).sum())
    enc.unpersist()


def test_ann_enrich_stream_query_limit_is_loud(spark, tmp_path):
    """ADVICE r14: nothing intrinsically bounds a file-source micro-batch
    (a backlog drains as ONE availableNow batch), so ann_enrich_stream
    plumbs query_limit through to topk_ivf_pq's bounded collect. An
    over-limit batch must FAIL the stream loudly (truncating would drop
    retrievals silently); re-running with the limit raised succeeds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from sids_data_pipeline_spark.operators import similarity
    from sids_data_pipeline_spark.streaming.jobs import ann_enrich_stream

    rng = np.random.default_rng(7)
    vecs = rng.normal(scale=1.0, size=(60, 4)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(60), "embedding": list(map(list, vecs))})
    )
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=2, m=2, kc=2, iters=1)
    enc = similarity.ivf_pq_encode(emb, cents, books).persist()
    src = str(tmp_path / "src")
    emb.filter(F.col("vec_id") < 5).repartition(1).write.parquet(src)

    def run(limit, ckpt, out):
        qstream = spark.readStream.schema(
            "vec_id long, embedding array<float>"
        ).parquet(src)
        ann_enrich_stream(
            qstream, enc, cents, books, out, ckpt,
            k=3, nprobe=1, query_limit=limit,
        )

    with pytest.raises(StreamingQueryException, match="query_limit"):
        run(2, str(tmp_path / "ckpt_tight"), str(tmp_path / "out_tight"))
    run(100, str(tmp_path / "ckpt_ok"), str(tmp_path / "out_ok"))
    got = spark.read.parquet(str(tmp_path / "out_ok") + "/rows")
    assert got.count() > 0
    enc.unpersist()
