"""As-of (time-travel) join — a custom operator Spark lacks natively.

For each left row, attach the latest right row whose timestamp is ≤ the
left timestamp within the same key (the canonical point-in-time lookup:
"the last purchase before this click", "the prevailing price at order
time"). Implemented per SURVEY.md §2's custom-operator ladder, rung (b):
a cogrouped ``applyInPandas`` running ``pandas.merge_asof`` per key
group — both sides shuffle ONCE on the key, each group merges sorted in
memory, and the operator inherits AQE skew handling on the cogroup
exchange. DuckDB's native ASOF JOIN provides the value-level oracle.

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
) -> DataFrame:
    """Backward as-of join: latest right row with ``right.ts <= left.ts``
    per ``by`` key. Left rows with no prior right row keep NULLs.

    Output: all left columns + [f"{c}{suffix}" for c in right_cols].
    """
    right_cols = list(right_cols)
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
        l_sorted = l_pdf.sort_values(ts_col, kind="mergesort")
        if r_pdf.empty:
            out = l_sorted.copy()
            for c in right_cols:
                out[f"{c}{suffix}"] = None
            return out[left_names + [f"{c}{suffix}" for c in right_cols]]
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
            l_sorted, r_sorted, on=ts_col, direction="backward"
        )
        return merged[left_names + [f"{c}{suffix}" for c in right_cols]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), out_schema)
    )
