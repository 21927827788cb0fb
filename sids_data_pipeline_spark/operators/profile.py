"""Table profiling — ANALYZE-style per-column statistics in one pass.

A 100 TB ingest needs cheap visibility before anything else runs: row
counts, null rates, cardinalities, and value ranges drive partition
sizing, join-strategy choices (broadcast vs shuffle), and data-quality
gates. The reference has no profiling surface (its QA is visual — the
rendered tiles); this is engine-native tooling in the spirit of
``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``.

Everything is ONE aggregation job over the table — map-side partial
aggregation, a single one-row shuffle — then a driver-free unpivot of
that row into one output row per column. With ``approx=True`` (the
default, and the only sane choice at scale) cardinalities come from
HyperLogLog sketches that merge in the partial-agg combine; ``approx=
False`` gives exact distinct counts but plans an EXPAND (one data copy
per profiled column) — fine for fixtures, ruinous at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: all columns): one output row per column
    with ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``.
    min/max are rendered as strings so heterogeneous column types share
    one schema; ``rsd`` is the HLL relative error when ``approx``.
    """
    cols = list(cols or df.columns)
    base_exprs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        base_exprs += [
            F.count(c).alias(f"_nn_{i}"),
            F.min(c).cast("string").alias(f"_min_{i}"),
            F.max(c).cast("string").alias(f"_max_{i}"),
        ]
    if approx:
        # HLL sketches merge in the partial-agg combine — one pass for
        # everything, no Expand
        row = df.agg(
            *base_exprs,
            *[
                F.approx_count_distinct(c, rsd).alias(f"_d_{i}")
                for i, c in enumerate(cols)
            ],
        )
    else:
        # exact mode: keep the n-way count_distinct EXPAND away from the
        # plain aggregates (r15, measured 4.4 s -> 1.9 s at sf0.1, same
        # rows). Mixing them makes Spark evaluate every count/min/max
        # over the (n_cols+1)-fold expanded rows too; split, the plain
        # pass scans once un-expanded and the distinct pass expands only
        # its own n-way copies — same total expanded rows, one extra
        # scan, one-row crossJoin to re-attach.
        row = df.agg(*base_exprs).crossJoin(
            df.agg(
                *[
                    F.count_distinct(F.col(c)).alias(f"_d_{i}")
                    for i, c in enumerate(cols)
                ]
            )
        )
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{i}")).alias("n_nulls"),
            F.col(f"_d_{i}").alias("n_distinct"),
            F.col(f"_min_{i}").alias("min_value"),
            F.col(f"_max_{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return row.select(F.explode(F.array(*entries)).alias("s")).select("s.*")


def column_histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Equi-width histogram of a numeric column over ``[lo, hi)``:
    one row per non-empty bucket ``(bucket, n)``; values below ``lo``
    clamp to bucket 0, at-or-above ``hi`` to bucket ``bins - 1``, NULLs
    are dropped. Bounds are explicit (take them from
    :func:`profile_table`) so the operator is a single deterministic
    pass — no extra min/max job hidden inside.

    The bucket expression ``floor((x - lo) / (hi - lo) * bins)`` uses one
    fixed parenthesization, so any IEEE-754 engine bins identically.
    NaNs are dropped along with NULLs — clamping would silently inflate
    bucket 0 (NaN compares false everywhere, so greatest() keeps raw).
    """
    if not bins > 0:
        raise ValueError(f"bins must be positive, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(bins))
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        df.filter(x.isNotNull() & ~F.isnan(x))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def column_correlation(
    df: DataFrame,
    pairs: Sequence[tuple[str, str]],
    group_cols: Sequence[str] = (),
    scale: int = 100,
) -> DataFrame:
    """Pearson correlation for column pairs from EXACT integer moments:
    each value scales to round(x*scale) and the five sums (n, Σx, Σy,
    Σxy, Σx², Σy²) aggregate exactly in DECIMAL(38,0) — wide enough that
    Σx² at 10⁷+ rows cannot overflow (a BIGINT accumulator would abort
    under ANSI mode long before 100 TB) — then the correlation derives
    in one deterministic double formula, mirrored term-for-term by the
    SQL oracle. Unlike ``F.corr``, whose running double accumulation is
    shuffle-order-dependent, the result survives a cross-engine hash.

    Pearson is defined over PAIRWISE-COMPLETE rows: a row where either
    column is NULL contributes to none of the pair's moments (matching
    ``F.corr`` and every statistics package); ``n`` is the complete-pair
    count. A zero-variance side yields corr = NULL (not a divide-by-zero
    job abort under ANSI mode).

    One output row per (group, pair); corr is rounded to 6 decimals.
    Scale shape: ONE map-side-combined aggregation per pair over the
    same scan (unioned), no joins.
    """
    if not pairs:
        raise ValueError("column_correlation needs at least one pair")
    frames = []
    for x, y in pairs:
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        xi = F.when(both, F.round(F.col(x) * scale, 0)).cast("decimal(19,0)")
        yi = F.when(both, F.round(F.col(y) * scale, 0)).cast("decimal(19,0)")
        agg = df.groupBy(*group_cols).agg(
            F.count(xi).alias("_n"),
            F.sum(xi).alias("_sx"),
            F.sum(yi).alias("_sy"),
            F.sum((xi * yi).cast("decimal(38,0)")).alias("_sxy"),
            F.sum((xi * xi).cast("decimal(38,0)")).alias("_sxx"),
            F.sum((yi * yi).cast("decimal(38,0)")).alias("_syy"),
        )
        n = F.col("_n").cast("double")
        sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
        cov = F.col("_sxy").cast("double") - sx * sy / n
        vx = F.col("_sxx").cast("double") - sx * sx / n
        vy = F.col("_syy").cast("double") - sy * sy / n
        frames.append(
            agg.select(
                *group_cols,
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.col("_n").alias("n"),
                F.when(
                    (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)
                ).alias("corr"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def robust_stats(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    scale: int = 100,
) -> DataFrame:
    """Per-key robust center/spread: exact median and MAD (median
    absolute deviation) — the outlier-resistant twin of mean/stddev for
    data-quality monitoring (one wild value moves a mean arbitrarily but
    the MAD not at all).

    Exactness: values enter an even-integer domain (``2 * round(x *
    scale)``) so the 0.5-quantile midpoint interpolation always lands on
    an integer; deviations are doubled again before the second median
    for the same reason. Output units: ``median_halfcents`` = 2 x median
    in scale units, ``mad_quartercents`` = 4 x MAD — both exact BIGINT,
    bit-identical on any IEEE engine.

    Scale shape: two grouped aggregations with a broadcast-sized key
    join between them (keys x 1 row each); the fact scans twice but
    never shuffles more than the key-grouped percentile state.
    """
    from functools import reduce as _reduce

    h = (F.round(F.col(value_col) * scale, 0).cast("long") * 2).alias("_h")
    keyed = df.select(*keys, h).alias("_k")
    med = keyed.groupBy(*keys).agg(
        F.expr("CAST(percentile(_h, 0.5) AS BIGINT)").alias("median_halfcents")
    ).alias("_m")
    # null-safe key join: groupBy emits a NULL-key group, and a plain
    # equi-join would silently drop it from the monitoring output
    cond = _reduce(
        lambda a, b: a & b,
        [F.col(f"_k.{k}").eqNullSafe(F.col(f"_m.{k}")) for k in keys],
    )
    dev = keyed.join(F.broadcast(med), cond).select(
        *[F.col(f"_k.{k}") for k in keys],
        "median_halfcents",
        (F.abs(F.col("_h") - F.col("median_halfcents")) * 2).alias("_d"),
    )
    return (
        dev.groupBy(*keys, "median_halfcents")
        .agg(
            F.expr("CAST(percentile(_d, 0.5) AS BIGINT)").alias(
                "mad_quartercents"
            )
        )
        .orderBy(*keys)
    )
