"""Catalog invariants + fast oracle-syntax guard.

Every oracle must at least EXPLAIN cleanly in DuckDB against the real
table views — catches SQL syntax/typo regressions in seconds without a
SparkSession.
"""

from __future__ import annotations

import duckdb
import pytest

from sids_data_pipeline_spark.plans.catalog import all_queries

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def catalog():
    return all_queries()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_priority_names_all_registered():
    """Drift guard: every PRIORITY name must be registered by a QUERIES
    module. A phantom name makes ``all_queries()`` raise, which zeroes the
    whole correctness gate — this test fails first, without a SparkSession,
    so the drift is caught at commit time."""
    from sids_data_pipeline_spark.plans import catalog, ext_queries, geo_queries, relational

    registered = {
        q.name
        for module in (relational, ext_queries, geo_queries)
        for q in module.QUERIES
    }
    missing = set(catalog.PRIORITY) - registered
    assert not missing, f"PRIORITY names not registered: {sorted(missing)}"


def test_names_unique_and_wellformed(catalog):
    assert len(catalog) >= 60
    for name, q in catalog.items():
        assert name == q.name
        assert name.replace("_", "").isalnum()
        assert callable(q.spark)


def test_every_query_documented(catalog):
    for q in catalog.values():
        assert q.doc, f"{q.name} lacks a doc string"
        assert q.tags, f"{q.name} lacks tags"


def test_oracles_explain_in_duckdb(catalog, con):
    for q in catalog.values():
        if q.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {q.oracle}")
        except Exception as ex:  # pragma: no cover
            pytest.fail(f"oracle for {q.name} fails to parse: {ex}")


def test_rows_only_entries_are_sketches(catalog):
    rows_only = {name for name, q in catalog.items() if q.oracle is None}
    assert rows_only == {
        "agg_approx_distinct",
        "dedup_minhash_ml",
        "similarity_ann_lsh",
    }


def test_no_bare_whitespace_class_in_oracles():
    """Policy: oracle SQL must spell whitespace classes explicitly —
    Java's ASCII \\s includes \\x0B where DuckDB/RE2's does not, so a
    shared `\\s` literal silently diverges between the engine and its
    oracle on vertical-tab input (the round-7 review caught BPE_REGEX
    doing exactly this)."""
    from sids_data_pipeline_spark.plans.catalog import all_queries

    offenders = [
        name
        for name, q in all_queries().items()
        if q.oracle and "\\s" in q.oracle
    ]
    assert offenders == [], offenders


def test_inline_cents_copies_match_base_policy():
    """plans/relational.py hand-spells the exact-cents idiom in ~15 SQL
    constants (its NOTE says 'keep in sync ... if the money policy ever
    changes'); this pins the canonical rendering so a policy change in
    plans/base.py fails HERE with instructions instead of silently
    desynchronizing one oracle."""
    from sids_data_pipeline_spark.plans import base

    assert base.o_cents("X") == "CAST(ROUND((X) * 100) AS BIGINT)", (
        "money policy changed in plans/base.py::o_cents — update every "
        "hand-spelled copy in plans/relational.py (grep 'ROUND((') "
        "before shipping"
    )
    assert base.o_micros("X") == "CAST(ROUND((X) * 1000000) AS BIGINT)", (
        "micros policy changed in plans/base.py::o_micros — update the "
        "hand-spelled copies in plans/*.py (grep '1000000) AS BIGINT')"
    )
