"""Upsert / snapshot-diff — incremental-maintenance primitives.

The reference's incrementality is pair-level: skip a (vector, raster)
pair when its marker exists (``pipeline/processing/data.py:26-40``), and
append completions to a ledger (``batch/processing/raster.py:40``).
Row-level maintenance — apply a batch of changed rows to a persisted
table, or diff two snapshots to find what changed — is the natural next
granularity a 100 TB pipeline needs (ledger compaction, CDC-style
re-ingest, dataset versioning), so the engine ships both as declarative
plans:

- ``merge_upsert``  = ANSI MERGE (WHEN MATCHED UPDATE / WHEN NOT MATCHED
  INSERT / WHEN MATCHED AND <flag> DELETE), expressed as one left-anti
  join plus a union — a single shuffle on the merge key, broadcast when
  the change batch is small (the common CDC case).
- ``snapshot_diff`` = added/removed/changed classification between two
  snapshots, shuffling only (key, digest) pairs — the payload stays in
  place, so the shuffle cost is O(rows x key width), not O(bytes).
- ``scd2_history`` = type-2 slowly-changing dimension built from a
  change-event log: collapse unchanged runs, then LEAD for validity
  intervals — one shuffle total, both windows share the partitioning.
- ``maintain_aggregate`` = incremental materialized-view maintenance:
  fold a signed changelog into an existing COUNT/SUM aggregate without
  touching the base facts — the aggregate twin of ``merge_upsert``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators.dedup import exact_key_digest


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Apply a change batch to ``target``: source rows replace matching
    target rows (whole-row UPDATE), unmatched source rows are inserted,
    unmatched target rows pass through. If ``delete_col`` names a boolean
    column on ``source``, rows where it is true act as tombstones: the
    matching target row is removed and nothing is inserted.

    Like ANSI MERGE, ``source`` must be key-unique (one change per key per
    batch — dedup upstream with ``windows.latest_events`` or
    ``dedup.exact_dedup`` if it is a raw CDC stream).

    Scale shape: ONE equi-join on the merge key (left-anti, so Spark
    broadcasts a small change batch automatically) plus a union — no
    full-outer join, no row comparison, no driver involvement.
    """
    keys = list(keys)
    touched_keys = source.select(*keys)
    if delete_col is not None:
        tombstone = F.coalesce(F.col(delete_col), F.lit(False))
        upserts = source.filter(~tombstone).drop(delete_col)
    else:
        upserts = source
    # plain (non-null-safe) anti join on purpose: ANSI MERGE's ON t.k =
    # s.k never matches NULL keys either, so NULL-keyed target rows
    # survive and NULL-keyed source rows insert — identical semantics
    survivors = target.join(touched_keys, keys, "left_anti")
    return survivors.unionByName(upserts.select(*target.columns))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every key as added / removed / changed between two
    snapshots; unchanged keys are dropped (the output is the change set,
    which is the small side at scale). ``compare_cols`` restricts the
    value comparison (default: every non-key column of ``new``).

    Comparison is null-safe via the same 256-bit per-row digest exact
    dedup uses, so only (key, digest) shuffles — two narrow projections
    into one full-outer join, never the payload bytes. Key matching is
    ALSO null-safe (a NULL key is a real identity under GROUP BY
    semantics, same policy as :func:`maintain_aggregate`): an unchanged
    NULL-keyed row diffs as unchanged, not as removed+added.
    """
    from functools import reduce as _reduce

    keys = list(keys)
    value_cols = list(compare_cols or [c for c in new.columns if c not in keys])
    o = old.select(*keys, exact_key_digest(value_cols).alias("_old_digest")).alias("_o")
    n = new.select(*keys, exact_key_digest(value_cols).alias("_new_digest")).alias("_n")
    cond = _reduce(
        lambda a, b: a & b,
        [F.col(f"_o.{k}").eqNullSafe(F.col(f"_n.{k}")) for k in keys],
    )
    joined = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("_old_digest").isNull(), F.lit("added"))
        .when(F.col("_new_digest").isNull(), F.lit("removed"))
        .when(F.col("_old_digest") != F.col("_new_digest"), F.lit("changed"))
    )
    # a side that didn't match contributes all-NULL columns, so the
    # matched-or-present key is the digest-bearing side's key
    key_out = [
        F.when(F.col("_new_digest").isNotNull(), F.col(f"_n.{k}"))
        .otherwise(F.col(f"_o.{k}"))
        .alias(k)
        for k in keys
    ]
    return (
        joined.select(*key_out, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def maintain_aggregate(
    mv: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sums: dict[str, str],
    count_col: str = "n_rows",
    sign_col: str = "_sign",
) -> DataFrame:
    """Incrementally maintain a COUNT/SUM materialized view from a signed
    changelog, without re-reading the base facts.

    ``mv`` is the current aggregate: ``keys`` + ``count_col`` (row count)
    + one column per ``sums`` key. ``changes`` carries fact rows plus
    ``sign_col`` = +1 (insert) / -1 (delete); ``sums`` maps each MV sum
    column to the fact column it sums (e.g. ``{"sum_qty": "qty"}``).
    Groups whose maintained count reaches zero are dropped, so the result
    is exactly the aggregate a full recompute over (base − deletes +
    inserts) would produce. AVG views derive as sum/count downstream;
    MIN/MAX are NOT self-maintainable under deletes (they need the base
    rows) — recompute those or restrict their changelog to inserts.

    Scale shape: the changelog collapses to per-key deltas with a
    map-side partial aggregate BEFORE touching the view, so the join is
    delta-keys × view — at 100 TB the view never rescans its facts, and a
    small change batch broadcasts. This is the standard self-maintainable
    view algebra (count/sum form an abelian group under signed union).
    """
    from functools import reduce as _reduce

    keys = list(keys)
    delta = changes.groupBy(*keys).agg(
        F.sum(sign_col).alias("_d_n"),
        *[
            F.sum(F.col(src) * F.col(sign_col)).alias(f"_d_{dst}")
            for dst, src in sums.items()
        ],
    )
    m, d = mv.alias("_mv"), delta.alias("_dl")
    mc = lambda c: F.col(f"_mv.{c}")
    dc = lambda c: F.col(f"_dl.{c}")
    # null-SAFE key equality: a NULL group key is a real group under
    # GROUP BY semantics, so it must merge, not full-outer-split
    cond = _reduce(
        lambda a, b: a & b,
        [mc(k).eqNullSafe(dc(k)) for k in keys],
    )
    merged = m.join(d, cond, "full_outer")
    zero = F.lit(0)
    new_count = F.coalesce(mc(count_col), zero) + F.coalesce(dc("_d_n"), zero)
    out_cols = [
        *[
            F.when(dc("_d_n").isNull(), mc(k)).otherwise(dc(k)).alias(k)
            for k in keys
        ],
        new_count.alias(count_col),
        *[
            (F.coalesce(mc(dst), zero) + F.coalesce(dc(f"_d_{dst}"), zero)).alias(
                dst
            )
            for dst in sums
        ],
    ]
    return merged.select(*out_cols).filter(F.col(count_col) > 0)


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change-event log:
    one row per (key, value-state) episode with ``valid_from`` /
    ``valid_to`` (NULL = still current) and ``is_current``.

    Consecutive events whose ``value_cols`` are unchanged (null-safe, via
    the exact-dedup digest) collapse into one episode — the SCD2
    compression step — then each episode's ``valid_to`` is the next
    episode's start (LEAD). ``tiebreak_cols`` break equal-timestamp
    ordering deterministically (pass a unique event id).

    Scale shape: both windows share the same partitioning (``keys``) and
    sort, so the whole build is ONE shuffle; the LEAD window runs on the
    already-collapsed (much smaller) episode set without re-exchanging.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    tiebreak = list(tiebreak_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    cols = list(dict.fromkeys(keys + [ts_col] + value_cols + tiebreak))
    episodes = (
        changes.select(*cols)
        .withColumn("_digest", exact_key_digest(value_cols))
        .withColumn("_prev", F.lag("_digest").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("_digest")))
    )
    return (
        episodes.select(
            *keys,
            *value_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def refresh_aggregate(
    mv: DataFrame,
    old_facts: DataFrame,
    new_facts: DataFrame,
    id_keys: Sequence[str],
    group_keys: Sequence[str],
    sums: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental aggregate REFRESH: bring a materialized view built
    over ``old_facts`` up to date with ``new_facts`` without a full
    recompute — the composition of :func:`snapshot_diff` (what changed,
    keyed by ``id_keys``) and :func:`maintain_aggregate` (fold the
    signed changelog into the view).

    Removed/changed keys contribute their OLD row with sign −1;
    added/changed keys contribute their NEW row with sign +1 — a changed
    row is a retract+insert pair, the standard incremental-view algebra.

    Scale shape: the diff shuffles only (key, digest); the changelog is
    change-set-sized, not table-sized; the fold joins delta-keys × view.
    A 0.1% daily churn on a 100 TB fact table costs ~0.1% of the full
    rebuild.
    """
    from functools import reduce as _reduce

    from sids_data_pipeline_spark.lifecycle import track

    # persist the change set (r15, guide §5): the diff's full-outer
    # digest join over BOTH fact snapshots feeds the retract AND the
    # insert semi-joins below — un-persisted, the whole diff re-executed
    # per reference. The cached frame is (id keys, change): change-set-
    # sized by the operator's own scale contract, never payload bytes.
    diff = track(
        snapshot_diff(old_facts, new_facts, id_keys)
        .select(*id_keys, "change")
        .persist()
    )
    id_keys = list(id_keys)

    def _semi(facts: DataFrame, changes: Sequence[str]) -> DataFrame:
        # null-safe semi join: snapshot_diff treats a NULL id key as a
        # real identity, so the retract/insert lookup must match it too
        # (a plain equi-semi-join would silently drop the changelog row
        # and the view would keep a stale contribution forever)
        sel = diff.filter(F.col("change").isin(*changes)).select(*id_keys).alias("_d")
        f = facts.alias("_f")
        cond = _reduce(
            lambda a, b: a & b,
            [F.col(f"_f.{k}").eqNullSafe(F.col(f"_d.{k}")) for k in id_keys],
        )
        return f.join(sel, cond, "left_semi")

    retracts = _semi(old_facts, ["removed", "changed"]).withColumn(
        "_sign", F.lit(-1)
    )
    inserts = _semi(new_facts, ["added", "changed"]).withColumn(
        "_sign", F.lit(1)
    )
    return maintain_aggregate(
        mv,
        retracts.unionByName(inserts),
        list(group_keys),
        sums,
        count_col=count_col,
    )


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    part_cols: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-partition mergeable distinct-count sketches — the COUNT
    DISTINCT analogue of :func:`maintain_aggregate`.

    Plain sums/counts maintain incrementally with a signed changelog,
    but COUNT DISTINCT does not decompose that way — the standard
    warehouse answer is to STORE a mergeable sketch per partition
    (Datasketches HLL, the same family BigQuery/Snowflake expose) and
    union sketches at query time. One map-side-combined groupBy emits
    (part_cols..., sketch, n_rows); a new day's data appends one row,
    and the base table is never rescanned.

    ``lg_k=12`` ⇒ 2^12 registers ≈ 1.6% relative standard error, ~4 KB
    per sketch.
    """
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(int(lg_k))).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merged_distinct(
    sketches: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Union stored sketches → distinct-count estimate, optionally per
    ``group_cols`` rollup (e.g. month sketches → per-year + global
    estimates). Cost is proportional to the SKETCH table (one row per
    partition), not the base data."""
    est = F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
        "approx_distinct"
    )
    if group_cols:
        return sketches.groupBy(*group_cols).agg(est)
    return sketches.agg(est)
