"""As-of (time-travel) join — a custom operator Spark lacks natively.

For each left row, attach the latest right row whose timestamp is ≤ the
left timestamp within the same key (the canonical point-in-time lookup:
"the last purchase before this click", "the prevailing price at order
time"). DuckDB's native ASOF JOIN provides the value-level oracle.

Two strategies per SURVEY.md §2's custom-operator ladder:

- ``how="window"`` (default, rung (a) — composition of built-in ops):
  union both sides tagged, one shuffle on the key, and a running
  ``last(struct, ignorenulls)`` window ordered by (ts, side) picks each
  left row's most recent right row. Entirely JVM-side — no Arrow
  transfer, no Python workers — and the running frame is O(n) per
  partition. The matched row's payload is carried as ONE struct so a
  NULL payload *field* on the matched row stays NULL (a per-column
  ``last(ignorenulls)`` would leak an older row's value).

- ``how="cogroup"`` (rung (b) — Arrow-batched custom kernel): cogrouped
  ``applyInPandas`` running ``pandas.merge_asof`` per key group. Kept as
  the extension template for merge semantics the window form can't
  express (tolerance bounds, multi-column ordering) and as the
  independent implementation the direction tests cross-check against.

Both strategies support ``direction`` backward / forward / nearest
(ties resolve backward, matching pandas).

Right-side (key, ts) duplicates make "the latest row" ambiguous;
:func:`dedupe_right` collapses them deterministically first.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_right(
    right: DataFrame, by: str, ts_col: str, tiebreak: str
) -> DataFrame:
    """Collapse (by, ts) duplicates keeping the highest ``tiebreak`` —
    makes the as-of lookup single-valued."""
    w = Window.partitionBy(by, ts_col).orderBy(F.col(tiebreak).desc())
    return (
        right.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_cols: Iterable[str],
    suffix: str = "_right",
    how: str = "window",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: per ``by`` key attach the right row nearest each left
    timestamp in the given ``direction``:

    - ``backward`` (default): latest right row with ``ts <= left.ts``
    - ``forward``: earliest right row with ``ts >= left.ts``
    - ``nearest``: whichever of the two is closer; exact ties resolve
      backward (pandas ``merge_asof`` tie rule)

    Left rows with no eligible right row keep NULLs. Output: all left
    columns + [f"{c}{suffix}" for c in right_cols].

    Right rows with a NULL timestamp or NULL key are dropped first: a
    NULL ts can never be "the latest row at or before t" (pandas
    merge_asof and DuckDB ASOF JOIN likewise ignore NULL keys; without
    this, NULLS-FIRST ascending ordering would make them matchable as
    the earliest payload in the window strategy).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    # materialize once up front: a generator input would be consumed by
    # the membership test below and arrive empty at the strategy
    right_cols = list(right_cols)
    if "_ts" in right_cols:
        # the payload struct reserves _ts for the match's own timestamp
        # (the `nearest` distance compare); a payload column of the same
        # name would silently shadow it
        raise ValueError(
            "right_cols may not contain '_ts' (reserved for the internal "
            "match-timestamp slot); rename the column first"
        )
    right = right.filter(F.col(ts_col).isNotNull() & F.col(by).isNotNull())
    if how == "window":
        return _asof_window(
            left, right, by, ts_col, list(right_cols), suffix, direction
        )
    if how == "cogroup":
        return _asof_cogroup(
            left, right, by, ts_col, list(right_cols), suffix, direction
        )
    raise ValueError(f"how must be 'window' or 'cogroup', got {how!r}")


def _asof_window(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str,
    direction: str = "backward",
) -> DataFrame:
    from pyspark.sql.types import TimestampType

    left_names = [f.name for f in left.schema.fields]
    left_types = {f.name: f.dataType for f in left.schema.fields}
    right_types = {f.name: f.dataType for f in right.schema.fields}

    # Tag and align both sides on the union schema: right rows carry the
    # key/ts (for partitioning/ordering) plus their payload struct; left
    # rows carry their columns and a NULL payload slot. The payload also
    # carries the match's own timestamp (_ts) so `nearest` can compare
    # distances without a second lookup.
    payload = F.struct(
        *[F.col(c).alias(c) for c in right_cols],
        F.col(ts_col).alias("_ts"),
    )
    r_tag = right.select(
        *[
            F.col(c)
            if c in (by, ts_col)
            else F.lit(None).cast(left_types[c]).alias(c)
            for c in left_names
        ],
        F.lit(0).alias("_side"),
        payload.alias("_r"),
    )
    null_payload = F.lit(None).cast(
        "struct<" + ", ".join(
            [f"{c}: {right_types[c].simpleString()}" for c in right_cols]
            + [f"_ts: {right_types[ts_col].simpleString()}"]
        ) + ">"
    )
    l_tag = left.select(
        *[F.col(c) for c in left_names],
        F.lit(1).alias("_side"),
        null_payload.alias("_r"),
    )
    union = r_tag.unionByName(l_tag)
    # Backward: right rows sort BEFORE left rows at equal ts (_side
    # 0 < 1) and the trailing frame takes the last non-null payload, so
    # an exactly-equal timestamp matches — merge_asof semantics.
    # Forward mirrors it: right rows sort AFTER left at equal ts and the
    # leading frame takes the first non-null payload. Both orderings
    # share one hash partitioning on the key, so `nearest` (which needs
    # both) still shuffles once.
    wb = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        matched = union.withColumn("_m", F.last("_r", ignorenulls=True).over(wb))
    elif direction == "forward":
        matched = union.withColumn("_m", F.first("_r", ignorenulls=True).over(wf))
    else:  # nearest: both lookups, pick the closer; ties go backward
        from pyspark.sql.types import DateType

        if isinstance(right_types[ts_col], TimestampType):
            num = F.unix_micros
        elif isinstance(right_types[ts_col], DateType):
            # backward/forward need only ordering, but nearest needs a
            # numeric distance; a Date cannot cast to double directly
            num = F.unix_date
        else:
            num = lambda c: c.cast("double")  # noqa: E731
        mb, mf = F.last("_r", ignorenulls=True).over(wb), F.first(
            "_r", ignorenulls=True
        ).over(wf)
        matched = (
            union.withColumn("_mb", mb)
            .withColumn("_mf", mf)
            .withColumn(
                "_m",
                F.when(F.col("_mb").isNull(), F.col("_mf"))
                .when(F.col("_mf").isNull(), F.col("_mb"))
                .when(
                    num(F.col(ts_col)) - num(F.col("_mb._ts"))
                    <= num(F.col("_mf._ts")) - num(F.col(ts_col)),
                    F.col("_mb"),
                )
                .otherwise(F.col("_mf")),
            )
        )
    # A NULL left timestamp satisfies no ts-inequality, so it must match
    # nothing. Backward gets this for free (the NULLS-FIRST row's trailing
    # frame holds only other NULL rows), but in the LEADING frame a NULL
    # left ts sorts before everything and would grab the key's earliest
    # right payload — null it out explicitly for every direction.
    matched = matched.filter(F.col("_side") == 1).withColumn(
        "_m", F.when(F.col(ts_col).isNull(), null_payload).otherwise(F.col("_m"))
    )
    return matched.select(
        *left_names,
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def _asof_cogroup(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str,
    direction: str = "backward",
) -> DataFrame:
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    right_schema = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_fields += [f"{c}{suffix} {right_schema[c]}" for c in right_cols]
    out_schema = ", ".join(out_fields)
    left_names = [f.name for f in left.schema.fields]

    # Re-alias every right column: when left and right derive from the
    # same scan (self-cogroup), shared expression IDs make Catalyst prune
    # the right side's columns out of the cogroup child. Fresh aliases
    # mint fresh IDs. The pandas-side names stay the originals.
    right = right.select(
        F.col(by).alias(by),
        F.col(ts_col).alias(ts_col),
        *[F.col(c).alias(c) for c in right_cols if c not in (by, ts_col)],
    )

    out_names = left_names + [f"{c}{suffix}" for c in right_cols]

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            # key present only on the right → no left rows to emit (the
            # empty frame arrives without columns, so build one explicitly)
            return pd.DataFrame(columns=out_names)
        # pd.merge_asof rejects NULL merge keys; the documented contract
        # (same as the window strategy) is that a NULL-ts left row keeps
        # NULL payload — split it out and re-attach after the merge
        null_ts = l_pdf[l_pdf[ts_col].isna()]
        l_pdf = l_pdf[l_pdf[ts_col].notna()]
        suffixed = [f"{c}{suffix}" for c in right_cols]

        def with_null_payload(frame: pd.DataFrame) -> pd.DataFrame:
            out = frame.copy()
            for c in right_cols:
                out[f"{c}{suffix}"] = None
            return out[left_names + suffixed]

        if l_pdf.empty or r_pdf.empty:
            return pd.concat(
                [with_null_payload(l_pdf), with_null_payload(null_ts)],
                ignore_index=True,
            )
        if len(null_ts):
            # Arrow promotes a nullable long ts to float64; merge_asof
            # requires matching key dtypes, so restore the right's dtype
            # now that the NULLs are gone
            l_pdf = l_pdf.assign(**{ts_col: l_pdf[ts_col].astype(r_pdf[ts_col].dtype)})
        l_sorted = l_pdf.sort_values(ts_col, kind="mergesort")
        # ts_col may itself be requested as a payload column; keep one
        # copy for merge_asof's `on` and mint the suffixed copy after the
        # rename (a naive [[ts_col, *right_cols]] would duplicate it and
        # the rename would leave merge_asof with no `on` column).
        payload = [c for c in right_cols if c != ts_col]
        r_sorted = r_pdf[[ts_col, *payload]].sort_values(ts_col, kind="mergesort")
        r_sorted = r_sorted.rename(columns={c: f"{c}{suffix}" for c in payload})
        if ts_col in right_cols:
            r_sorted[f"{ts_col}{suffix}"] = r_sorted[ts_col]
        merged = pd.merge_asof(
            l_sorted, r_sorted, on=ts_col, direction=direction
        )
        merged = merged[left_names + suffixed]
        if len(null_ts):
            merged = pd.concat(
                [merged, with_null_payload(null_ts)], ignore_index=True
            )
        return merged

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), out_schema)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    by: Iterable[str] = (),
    bucket_width: int = 64,
    how: str = "inner",
) -> DataFrame:
    """Interval-OVERLAP join: pair every left interval with every right
    interval it overlaps (closed bounds: ``ls <= re AND rs <= le``),
    optionally within equal ``by`` keys. The generalization of the range
    join from point-in-interval to interval-vs-interval.

    Scale shape: each interval explodes onto ``bucket_width``-sized grid
    buckets and the sides EQUI-join on (by, bucket) — never a cartesian
    or nested-loop plan. An overlapping pair would meet in every shared
    bucket, so the join keeps only the canonical one — the bucket
    containing ``greatest(ls, rs)`` (a point inside both intervals by
    definition) — which makes matches exactly-once WITHOUT a distinct
    shuffle. Cost is O(interval_span / bucket_width) replicas per row:
    size ``bucket_width`` to the typical span.

    Only inner join is supported (the bucket trick cannot see
    non-matches); anti/semi compose via left_anti/left_semi on the
    result keys.
    """
    if how != "inner":
        raise ValueError("interval_join supports only how='inner'")
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    by = list(by)
    clash = (set(left.columns) & set(right.columns)) - set(by)
    if clash:
        raise ValueError(
            f"interval_join: rename overlapping non-key columns {sorted(clash)}"
        )
    ls, le = (F.col(c) for c in left_bounds)
    rs, re_ = (F.col(c) for c in right_bounds)
    w = F.lit(int(bucket_width))
    lb = left.withColumn(
        "_bkt", F.explode(F.sequence(F.floor(ls / w), F.floor(le / w)))
    )
    rb = right.withColumn(
        "_bkt", F.explode(F.sequence(F.floor(rs / w), F.floor(re_ / w)))
    )
    cond = (
        (ls <= re_)
        & (rs <= le)
        & (F.col("_bkt") == F.floor(F.greatest(ls, rs) / w))
    )
    return lb.join(rb, [*by, "_bkt"]).filter(cond).drop("_bkt")
