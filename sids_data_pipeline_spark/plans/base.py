"""Shared plumbing for the engine's query catalog.

Cross-engine float determinism policy
-------------------------------------
The driver's correctness gate hash-compares the engine's results with a
DuckDB oracle. Floating-point *sums* over arbitrary doubles are
summation-order dependent, so any aggregate that feeds the gate follows
one rule: **transform element-wise to an exact integer domain first, then
aggregate**. ``round(x * 100)`` (or ``* 1e6`` for high-precision columns)
is computed per element — bit-identical in any IEEE-754 engine — and the
subsequent BIGINT sum is exact, so Spark and DuckDB agree regardless of
partitioning, partial aggregation, or merge order. Averages are expressed
as exact-integer sums divided by counts (one deterministic double
division). min/max/count are order-insensitive and need no treatment.
This is a correctness *policy* of the engine, not a test hack: at 100 TB
the same property makes results reproducible run-to-run under AQE
re-planning and speculative execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sids_data_pipeline_spark.sources.tables import load_table


@dataclass
class Query:
    """One catalog entry: a Spark plan plus its DuckDB oracle SQL.

    ``oracle`` is None for operators whose semantics SQL cannot express
    (streaming, LSH internals) — the driver then records a weaker
    rows-only check.
    """

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load tables for a catalog query. Forces the session timezone to UTC
    so timestamp→string rendering matches the (timezone-naive) oracle even
    when the driver supplies its own SparkSession."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return [load_table(spark, n, sf_dir) for n in names]


def cents(col: Column | str) -> Column:
    """Element-wise exact money domain: round(x*100) as BIGINT (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


def micros(col: Column | str) -> Column:
    """Element-wise exact 1e-6 domain for high-precision doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 1_000_000, 0).cast("long")


def sum_cents(col: Column | str, alias: str) -> Column:
    return F.sum(cents(col)).alias(alias)


def avg_from_cents(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact integer sum / count / 100."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(cents(c)).cast("double") / F.count(c) / F.lit(100.0)
    ).alias(alias)


# DuckDB-side twins (string templates). DuckDB's SUM(BIGINT) returns
# HUGEINT, which pandas renders as float — always cast back to BIGINT.
def o_cents(expr: str) -> str:
    return f"CAST(ROUND(({expr}) * 100) AS BIGINT)"


def o_micros(expr: str) -> str:
    return f"CAST(ROUND(({expr}) * 1000000) AS BIGINT)"


def o_sum_cents(expr: str, alias: str) -> str:
    return f"CAST(SUM({o_cents(expr)}) AS BIGINT) AS {alias}"


def o_avg_from_cents(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM({o_cents(expr)}) AS DOUBLE) / COUNT({expr}) / 100.0 AS {alias}"
    )
