"""The hard TPC-H subquery shapes in the SQL front door (Q13/Q17/Q18/
Q21/Q22 adapted to the fixture schema).

The value-level gate lives in tools/selfcheck.py + the driver's DuckDB
compare; these tests pin the semantic invariants and the decorrelation
plan shapes Catalyst must produce (semi/anti joins, not nested loops).
"""

from __future__ import annotations

import pytest

from sids_data_pipeline_spark.plans.catalog import all_queries


@pytest.fixture(scope="module")
def catalog():
    return all_queries()


def test_customer_distribution_accounts_for_every_customer(spark, sf_dir, catalog):
    rows = catalog["sql_customer_distribution"].spark(spark, sf_dir).collect()
    # Q13 partitions the customer universe: the distribution must sum to
    # the full customer count (left join keeps no-order customers).
    n_customers = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r.custdist for r in rows) == n_customers
    assert all(r.c_count >= 0 for r in rows)


def test_small_qty_revenue_threshold_is_strict_subset(spark, sf_dir, catalog):
    row = catalog["sql_small_qty_revenue"].spark(spark, sf_dir).collect()[0]
    # the 1/5-of-average cut must select a strict subset of the brand's lines
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        "p_brand = 'Brand#1'"
    )
    brand_lines = li.join(
        parts, li.l_partkey == parts.p_partkey
    ).count()
    assert 0 <= row.n_lines < brand_lines
    assert row.price_cents_sum is None or row.price_cents_sum >= 0


def test_large_volume_orders_all_exceed_threshold(spark, sf_dir, catalog):
    rows = catalog["sql_large_volume_customer"].spark(spark, sf_dir).collect()
    assert all(r.qty_cents > 30000 for r in rows)
    # descending by qty, orderkey tiebreak → deterministic LIMIT
    qtys = [r.qty_cents for r in rows]
    assert qtys == sorted(qtys, reverse=True)


def test_waiting_suppliers_decorrelates_to_semi_and_anti(spark, sf_dir, catalog):
    q = catalog["sql_waiting_suppliers"]
    df = q.spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # EXISTS → left semi, NOT EXISTS → left anti; a nested-loop fallback
    # here would be quadratic in lineitem at scale
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    for r in df.collect():
        assert r.numwait > 0


def test_sales_opportunity_excludes_urgent_customers(spark, sf_dir, catalog):
    rows = catalog["sql_sales_opportunity"].spark(spark, sf_dir).collect()
    # group key is the 2-char name suffix; counts positive; above-average
    # balance cut means every group's mean is positive
    for r in rows:
        assert len(r.cntrycode) == 2
        assert r.numcust > 0
        assert r.totacctbal_cents > 0
