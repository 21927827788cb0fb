"""Data-layout operators: multi-dimensional clustering for scan pruning.

The reference organizes rasters into fixed 128x128 blocks so any bbox
query touches a bounded set of blocks (``batch/processing/raster.py:8``,
``pipeline/processing/inputs.py:27``). The tabular generalization at
100 TB is Z-ORDER clustering: interleave the bits of two-or-more key
columns into one scalar, range-partition + sort the write by it, and
parquet's per-row-group min/max stats then prune scans that filter on
ANY of the interleaved dimensions — not just the leading sort key.

Everything here is a pure JVM expression (bit shifts + OR inside
whole-stage codegen); the layout write is one range-shuffle. No UDFs,
no driver involvement.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column round-robin (column j supplies output bit ``i*ncols + j`` from
    its input bit i). Inputs are clamped to [0, 2**bits) — callers
    pre-scale (e.g. ``pct_rank * 2**bits`` or ``value % 2**bits``) so the
    full bit budget carries signal.

    ``ncols * bits`` must fit a signed 64-bit key (<= 62).
    """
    ncols = len(cols)
    if ncols * bits > 62:
        raise ValueError(f"zorder_key: {ncols} cols x {bits} bits > 62")
    terms: list[Column] = []
    hi = F.lit((1 << bits) - 1)
    for j, c in enumerate(cols):
        cc = F.col(c) if isinstance(c, str) else c
        # clamp in DOUBLE before the long cast: an out-of-int64 outlier
        # or NaN would abort the cast under ANSI mode before the clamp
        # could bound it (NaN orders above every double in Spark, so
        # least() pins it to the top bucket)
        clamped = F.least(
            F.greatest(cc.cast("double"), F.lit(0.0)), hi.cast("double")
        ).cast("long")
        for i in range(bits):
            bit = F.shiftright(clamped, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * ncols + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def o_zorder_key(exprs: Sequence[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — the same interleave spelled as
    integer arithmetic, so the oracle verifies every bit of the key.

    Fractional expressions FLOOR before the cast: Spark's cast('long')
    truncates while DuckDB's CAST rounds to nearest, and the engine
    clamps negatives to 0 anyway, so floor == trunc on the live range.
    """
    ncols = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        clamped = f"CAST(LEAST(GREATEST(FLOOR({e}), 0.0), {(1 << bits) - 1}.0) AS BIGINT)"
        for i in range(bits):
            terms.append(f"((({clamped} >> {i}) & 1) << {i * ncols + j})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the key (equi-depth file sizes even when the key
    space is sparse), sort within partitions, drop the helper column.

    Scale shape: ONE range shuffle (sampling pass + exchange); each
    output file then covers a compact Z-range, so min/max row-group
    stats prune bbox-style predicates on every clustered dimension.
    """
    keyed = df.withColumn("_zkey", zorder_key(list(cols), bits=bits))
    part = (
        keyed.repartitionByRange(num_files, "_zkey")
        if num_files
        else keyed.repartitionByRange("_zkey")
    )
    part.sortWithinPartitions("_zkey").drop("_zkey").write.mode(
        "overwrite"
    ).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a hash-bucketed (and per-bucket sorted) parquet
    table registered in the session catalog.

    This is THE shuffle-elimination layout for repeated fact-fact joins
    at 100 TB: every row lands in ``hash(bucket_cols) % num_buckets``,
    so two tables bucketed the same way join bucket-to-bucket with NO
    exchange on either side — the shuffle is paid once at write time and
    amortized over every subsequent join/aggregation on that key.
    ``sort_cols`` (default: the bucket key) additionally pre-sorts each
    bucket file so sort-merge joins can skip their sort.

    The write itself is one hash shuffle into ``num_buckets`` groups; at
    cluster scale pick ``num_buckets`` ≈ total-cores × small-integer so
    bucket files stay within one executor's memory.

    Delegates to :func:`sources.storage.write_bucketed` (the one
    implementation), defaulting ``sort_cols`` to the bucket key so
    sort-merge joins skip their sort.
    """
    from sids_data_pipeline_spark.sources.storage import (
        write_bucketed as _write_bucketed,
    )

    _write_bucketed(
        df,
        table,
        list(bucket_cols),
        num_buckets=num_buckets,
        sort_cols=list(sort_cols or bucket_cols),
        path=path,
    )


def bucketed_join(
    spark, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket specs Catalyst plans a SortMergeJoin with ZERO
    Exchange nodes (asserted in tests/test_layout.py) — each task reads
    bucket i of both sides locally."""
    return spark.table(left_table).join(
        spark.table(right_table), on=list(on), how=how
    )


def pruned_fraction(path: str, col_ranges: dict[str, tuple[float, float]]) -> dict:
    """Layout-effectiveness probe: using only parquet footer min/max
    stats, report how many row groups a conjunctive range predicate
    could skip. Driver-side metadata read only (footers, not data) —
    the same information the scan's row-group filter uses.
    """
    import pyarrow.parquet as pq

    ds = pq.ParquetDataset(path)
    total = kept = 0
    for frag in ds.fragments:
        md = frag.metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            stats = {
                g.column(i).path_in_schema: g.column(i).statistics
                for i in range(g.num_columns)
            }
            total += 1
            overlap = True
            for c, (lo, hi) in col_ranges.items():
                s = stats.get(c)
                if s is not None and s.has_min_max and (s.min > hi or s.max < lo):
                    overlap = False
                    break
            kept += int(overlap)
    return {"row_groups": total, "scanned": kept, "skipped": total - kept}
