"""Input-spread guard for compute-heavy narrow stages (guide §2.5).

A scan of a few small files (or one small file with a single parquet
row group) yields fewer partitions than the session has cores, so every
narrow operator downstream — Python codec batches, hash/shingle
projections, Arrow encode kernels — runs on a handful of tasks while
the rest of the machine idles. That is the "input skew: one huge
unsplittable file" case of the optimization guide: fix at the source if
you can; otherwise repartition immediately after the read.

:func:`spread_small_scan` is that repartition, made scale-adaptive: it
is a NO-OP whenever the plan already has at least ``defaultParallelism``
partitions — the 100 TB case, where a scan carries thousands of splits
and a blanket repartition would be a full extra shuffle of the data.
Only under-parallel inputs pay the (tiny) round-robin exchange, and the
target derives from the session's core count, never a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism — only when it currently has fewer partitions (the
    deterministic local-sort-before-repartition exchange, so retried
    tasks reproduce their row assignment). Streaming frames and plans
    whose partitioning cannot be inspected pass through unchanged."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    from pyspark.errors import AnalysisException

    try:
        n = df.rdd.getNumPartitions()
    except AnalysisException:
        # the one expected shape: a plan that cannot be physically
        # planned outside its intended sink (ADVICE r14 — a bare except
        # here masked real analysis errors until the action)
        return df
    if n >= target:
        return df
    return df.repartition(target)
