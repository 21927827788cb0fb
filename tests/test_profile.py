"""profile_table: one-pass per-column statistics."""

from __future__ import annotations

from sids_data_pipeline_spark.operators.profile import profile_table


def test_profile_counts_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (4, "b", 2.5)],
        "k bigint, s string, v double",
    )
    prof = {r.col_name: r for r in profile_table(df, approx=False).collect()}
    assert set(prof) == {"k", "s", "v"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert prof["s"].n_nulls == 1 and prof["v"].n_nulls == 1
    assert prof["k"].n_distinct == 4 and prof["s"].n_distinct == 2
    assert prof["v"].n_distinct == 2  # nulls not counted as a value
    assert prof["k"].min_value == "1" and prof["k"].max_value == "4"
    assert prof["v"].min_value == "1.5" and prof["v"].max_value == "2.5"
    assert prof["s"].min_value == "a" and prof["s"].max_value == "b"


def test_profile_approx_path_close_and_no_expand(spark):
    df = spark.range(0, 5000).selectExpr(
        "id", "CAST(id % 97 AS STRING) AS s", "id % 10 AS m"
    )
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert abs(prof["s"].n_distinct - 97) <= 10  # HLL within rsd
    assert prof["m"].n_distinct <= 11
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # HLL path never multiplies the data
    exact_plan = (
        profile_table(df, approx=False)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan  # documented cost of exact distincts


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k bigint, dead string")
    prof = {r.col_name: r for r in profile_table(df, approx=False).collect()}
    d = prof["dead"]
    assert d.n_nulls == 2 and d.n_distinct == 0
    assert d.min_value is None and d.max_value is None
