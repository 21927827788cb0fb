"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query catalog
(``sids_data_pipeline_spark.plans.catalog``): every implemented operator
from SURVEY.md §2 registers a ``queries()`` entry; deterministic ones also
register the equivalent DuckDB ``oracle_sql()``. Column names and exact
values are matched via the engine's determinism policy (plans/base.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sids_data_pipeline_spark.plans.catalog import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The A1-superset aggregation (pricing_summary) — the engine's grouped
    zonal-mean shape applied to the relational tables.
    """
    return all_queries()["pricing_summary"].spark(spark, _SMOKE_SF_DIR)


def _released(fn: Callable[[SparkSession, str], DataFrame]):
    """Unpin the previous query's operator-internal caches before building
    the next plan, so a long sequential gate run doesn't accumulate
    orphaned persisted blocks (lifecycle.track/release_tracked)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sids_data_pipeline_spark.lifecycle import release_tracked

        release_tracked()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _released(q.spark) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; omitted entries (seeded sketches) get rows-only."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
