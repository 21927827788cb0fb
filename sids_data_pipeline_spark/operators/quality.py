"""Data-quality expectations — declarative constraint checks as plans.

A 100 TB ingest gates on invariants before anything downstream runs:
keys present and unique, values in range, codes in their domain. The
reference's only QA is visual inspection of rendered tiles; this module
gives the engine a dbt-test/Great-Expectations-style surface that stays
fully distributed:

- every ROW-LOCAL rule (not-null, range, set, regex) compiles to one
  conditional sum inside a SINGLE aggregation pass over the table —
  adding a rule adds an expression, not a job;
- each UNIQUENESS rule adds one groupBy on its key (the unavoidable
  shuffle), counting only the rows beyond the first per duplicate key;
- the result is a tiny (rule, n_violations, passed) frame — gate the
  pipeline on ``passed`` with an aggregate, never a driver loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, in_range, in_set,
    matches, unique}; ``name`` defaults to a kind/column slug."""

    kind: str
    cols: tuple[str, ...]
    params: tuple = field(default=())
    name: str = ""

    def label(self) -> str:
        return self.name or f"{self.kind}({', '.join(self.cols)})"


def not_null(col: str, name: str = "") -> Rule:
    return Rule("not_null", (col,), name=name)


def in_range(col: str, lo, hi, name: str = "") -> Rule:
    """Violated when the value is non-null and outside [lo, hi]."""
    return Rule("in_range", (col,), (lo, hi), name=name)


def in_set(col: str, values: Sequence, name: str = "") -> Rule:
    """Violated when the value is non-null and not one of ``values``."""
    return Rule("in_set", (col,), tuple(values), name=name)


def matches(col: str, pattern: str, name: str = "") -> Rule:
    """Violated when the value is non-null and does not match ``pattern``
    (RE2-compatible regex recommended, per the PII-scrub policy)."""
    return Rule("matches", (col,), (pattern,), name=name)


def unique(*cols: str, name: str = "") -> Rule:
    return Rule("unique", tuple(cols), name=name)


def _violation(rule: Rule) -> Column:
    c = F.col(rule.cols[0])
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.params
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if rule.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule.params))
    if rule.kind == "matches":
        return c.isNotNull() & ~c.rlike(rule.params[0])
    raise ValueError(f"unknown row-local rule kind {rule.kind!r}")


def check_expectations(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate ``rules`` and return (rule, n_violations, passed), one
    row per rule in a deterministic (rule-label) order-insensitive frame.
    """
    if not rules:
        raise ValueError("check_expectations needs at least one rule")
    row_local = [r for r in rules if r.kind != "unique"]
    uniques = [r for r in rules if r.kind == "unique"]
    parts: list[DataFrame] = []
    if row_local:
        aggs = [
            F.sum(_violation(r).cast("long")).alias(f"_v_{i}")
            for i, r in enumerate(row_local)
        ]
        one = df.agg(*aggs)
        entries = [
            F.struct(
                F.lit(r.label()).alias("rule"),
                F.coalesce(F.col(f"_v_{i}"), F.lit(0)).alias("n_violations"),
            )
            for i, r in enumerate(row_local)
        ]
        parts.append(
            one.select(F.explode(F.array(*entries)).alias("s")).select("s.*")
        )
    for r in uniques:
        # dbt/GE convention: unique is "unique among non-null" — NULL
        # keys are not duplicates of each other; pair with not_null to
        # police them separately
        src = df
        for c in r.cols:
            src = src.filter(F.col(c).isNotNull())
        dup_extra = (
            src.groupBy(*[F.col(c) for c in r.cols])
            .agg(F.count("*").alias("_n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("_n") > 1, F.col("_n") - 1)), F.lit(0)
                ).alias("n_violations")
            )
            .select(F.lit(r.label()).alias("rule"), "n_violations")
        )
        parts.append(dup_extra)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)


def split_dead_letters(
    df: DataFrame,
    casts: dict[str, tuple[str, str]],
    id_cols: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """Safe typed ingest with a dead-letter channel: ``casts`` maps each
    output column to (source string column, target type). Rows where
    every ``try_cast`` succeeds (or the source is NULL — absent ≠
    malformed) come back typed in the good frame; rows with at least one
    un-castable value land in the dead-letter frame with a
    ``_bad_fields`` array naming the offending columns — the triage
    queue a production loader needs instead of a job abort or silent
    NULLs.

    One pass, pure codegen (try_cast never throws); the two outputs are
    complementary filters over the same scan, so Spark reuses the
    cached/scanned subtree rather than re-reading.
    """
    bad_flags = [
        F.when(
            F.col(src).isNotNull()
            & F.col(src).try_cast(typ).isNull(),
            F.lit(out),
        )
        for out, (src, typ) in casts.items()
    ]
    flagged = df.withColumn(
        "_bad_fields",
        F.array_compact(F.array(*bad_flags)),
    )
    ok = F.size("_bad_fields") == 0
    good = flagged.filter(ok).select(
        *id_cols,
        *[
            F.col(src).try_cast(typ).alias(out)
            for out, (src, typ) in casts.items()
        ],
    )
    dead = flagged.filter(~ok).select(*id_cols, *(
        F.col(src).alias(out) for out, (src, typ) in casts.items()
    ), "_bad_fields")
    return good, dead
