"""Structured Streaming wrappers (SURVEY.md §2a Streaming — ABSENT in the
reference, shipped by the engine).

The reference is strictly batch with file-existence incrementality
(reference ``pipeline/processing/__main__.py:19-26``, ``data.py:26-40``);
its closest streaming analogue is "process only new inputs." The engine
exposes the same operator definitions (operators/windows.py) over
``readStream``:

- :func:`stream_events` — file-source stream over an events directory;
- :func:`windowed_counts_stream` — watermarked tumbling aggregation, the
  late-data-tolerant form of ``windows.tumbling``;
- :func:`run_available_now` — drain everything currently available and
  stop (Trigger.AvailableNow): the batch-parity mode tests use to prove
  the stream plan equals the batch plan.

Batch/stream parity holds because every aggregation here is defined over
event time, not arrival time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sids_data_pipeline_spark.schemas import EVENTS


def stream_events(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream. Schema is pinned (streams cannot infer),
    one-file micro-batches are opt-in for tests."""
    reader = spark.readStream.schema(EVENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def windowed_counts_stream(
    events: DataFrame,
    duration: str = "10 minutes",
    watermark: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling counts: the streaming twin of
    ``operators.windows.tumbling``. The watermark bounds state — windows
    older than (max event time − watermark) finalize and evict, so state
    size is O(active windows), independent of stream length."""
    w = F.window(F.col("ts"), duration)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            *group_cols,
            "n_events",
            "sum_value_cents",
        )
    )


def run_available_now(
    result: DataFrame, query_name: str, checkpoint_dir: str
) -> None:
    """Drain all currently-available input into an in-memory table named
    ``query_name`` and stop — deterministic one-shot used for
    batch-parity tests and backfills."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
