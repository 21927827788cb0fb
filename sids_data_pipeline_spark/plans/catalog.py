"""The engine's full query catalog: one registry the driver contract,
bench harness, and tests all share.

Every implemented operator from SURVEY.md §2 has an entry here; entries
with ``oracle`` SQL get the driver's full value-hash check, entries with
``oracle=None`` (seeded sketches) get the rows-only check.
"""

from __future__ import annotations

from sids_data_pipeline_spark.plans import ext_queries, geo_queries, relational
from sids_data_pipeline_spark.plans.base import Query


def all_queries() -> dict[str, Query]:
    out: dict[str, Query] = {}
    for module in (relational, ext_queries, geo_queries):
        for q in module.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate catalog query name {q.name!r}")
            out[q.name] = q
    return out
