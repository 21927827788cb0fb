"""Skew-mitigation utilities.

AQE's skew-join splitting (on in session.py) handles most hot keys at
runtime; these helpers cover the cases AQE can't: a broadcast-ineligible
join against a dimension with a handful of pathological keys, and
high-cardinality aggregation where one key dominates a partition.

- :func:`salted_join` — left rows scatter across ``num_salts`` sub-keys
  (deterministic hash of the whole row, so retries/speculation reproduce
  the same placement); the right side replicates per salt. The hot key's
  rows spread over ``num_salts`` tasks instead of one.
- :func:`salted_agg` — two-phase aggregation: partial per (key, salt),
  final per key. Only algebraic aggregates (count/sum/min/max) compose
  this way; the wrapper exposes exactly those.
- :func:`heavy_hitters` / :func:`key_skew_report` — the diagnostic that
  decides WHETHER to salt: exact top-k hot keys with traffic share, and
  a one-row skew summary (max/mean key frequency) to alert on.

No reference counterpart (single-node Postgres has no shuffles); part of
the engine's 100 TB design surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    num_salts: int = 16,
    how: str = "inner",
    salt_expr: Column | None = None,
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    ``right`` should be the smaller input (it grows ×num_salts). The salt
    is a deterministic hash of the left row (pass ``salt_expr`` to salt on
    specific columns), so task retries and speculative execution land rows
    identically — required for exactly-once semantics under re-planning.

    Only left-preserving join types are valid: a right/full outer join
    would emit each unmatched RIGHT row once per salt replica (num_salts
    copies), so those types are rejected rather than silently corrupted.
    """
    allowed = {
        "inner", "cross",
        "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi",
        "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: join type {how!r} would duplicate unmatched right "
            f"rows across salt replicas; supported: {sorted(allowed)}"
        )
    salt = salt_expr if salt_expr is not None else F.xxhash64(*left.columns)
    l = left.withColumn(_SALT, F.pmod(salt, F.lit(num_salts)).cast("int"))
    # (no cast around explode: generators can't nest inside expressions)
    r = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return l.join(r, [*keys, _SALT], how).drop(_SALT)


_ALGEBRAIC = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column → (function, input column), function in
    {count, sum, min, max}. Phase 1 aggregates per (keys, salt) — the hot
    key's rows combine in ``num_salts`` parallel partial states — phase 2
    merges the partials per key. Result equals the direct groupBy
    (property-tested).
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(
                f"{name}: {fn!r} is not algebraic; salting supports {sorted(_ALGEBRAIC)}"
            )
    # Salt by input-partition id, NOT by row values: a value-derived salt
    # degenerates to a constant on the canonical count-per-key case
    # (salt cols == key cols) and on duplicate-heavy hot keys — exactly
    # the skew this helper exists to break. Algebraic aggregates are
    # placement-invariant, so the partial grouping needs no
    # row-determinism; the FINAL result is identical for any salt
    # (property-tested), and no extra columns reach the scan.
    salted = df.withColumn(
        _SALT, F.pmod(F.spark_partition_id(), F.lit(num_salts)).cast("int")
    )
    partial = salted.groupBy(*keys, _SALT).agg(
        *[
            _ALGEBRAIC[fn][0](col).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](f"_p_{name}").alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )


def heavy_hitters(df: DataFrame, keys: list[str], k: int = 20) -> DataFrame:
    """Exact top-``k`` keys by row count, with each key's traffic share
    in parts-per-million (integer — hash-stable across engines).

    Scale shape: ONE map-side-combined groupBy on the key, then a
    distributed partial top-k (orderBy+limit plans as
    TakeOrderedAndProject — every partition forwards at most k rows, no
    global sort, no window over all keys); the grand total re-attaches by
    broadcasting one row. Ties at the boundary break on the key columns,
    so the result is deterministic.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.desc("n"), *[F.col(c).asc() for c in keys]).limit(k)
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn(
            # double-first like the SQL mirror: a BIGINT n*1e6 would
            # overflow (ANSI abort) past ~9e12 rows per key
            "share_ppm",
            F.round(F.col("n").cast("double") * 1_000_000 / F.col("_total"), 0).cast("long"),
        )
        .drop("_total")
    )


def key_skew_report(df: DataFrame, keys: list[str]) -> DataFrame:
    """One-row skew summary for a prospective shuffle key: number of
    distinct keys, max/mean key frequency, and their ratio in micros
    (1_000_000 = perfectly uniform). A ratio >> num_partitions means the
    hottest task dwarfs the average — salt or split before shuffling.

    Two cascaded aggregations (per-key counts → one row); both benefit
    from map-side partials, and the second input is only the distinct
    keys.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_key_rows"),
        # double-first like the SQL mirror: max*1e6*n_keys in BIGINT
        # overflows (ANSI abort) at large-but-valid key cardinalities
        F.round(
            F.max("n").cast("double") * 1_000_000 * F.count(F.lit(1)) / F.sum("n"), 0
        )
        .cast("long")
        .alias("skew_ratio_micros"),
    )
