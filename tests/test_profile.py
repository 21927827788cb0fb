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


def test_column_correlation_matches_numpy(spark):
    import numpy as np

    from sids_data_pipeline_spark.operators.profile import column_correlation

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.1, 5.9, 8.2, 10.0]   # near-perfect positive
    zs = [5.0, 4.0, 3.0, 2.0, 1.0]    # perfect negative vs xs
    df = spark.createDataFrame(
        list(zip(xs, ys, zs)), "x double, y double, z double"
    )
    got = {
        (r.col_x, r.col_y): r.corr
        for r in column_correlation(df, [("x", "y"), ("x", "z")]).collect()
    }
    # integer-cents domain: compare against numpy corr of the SCALED ints
    xi = np.round(np.array(xs) * 100)
    yi = np.round(np.array(ys) * 100)
    zi = np.round(np.array(zs) * 100)
    assert got[("x", "y")] == round(float(np.corrcoef(xi, yi)[0, 1]), 6)
    assert got[("x", "z")] == -1.0


def test_robust_stats_hand_computed(spark):
    """Median/MAD of a small set with an outlier the mean would chase."""
    from sids_data_pipeline_spark.operators.profile import robust_stats

    # values 1,2,3,4,1000 → median 3, deviations {2,1,0,1,997} → MAD 1
    rows = [("a", float(v)) for v in (1, 2, 3, 4, 1000)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = robust_stats(df, "v", ["k"]).collect()[0]
    assert got.median_halfcents == 3 * 200       # 2 × 300 cents
    assert got.mad_quartercents == 1 * 400       # 4 × 100 cents

    # even count interpolates the midpoint: 1,2,3,4 → median 2.5
    df2 = spark.createDataFrame(rows[:4], "k string, v double")
    got2 = robust_stats(df2, "v", ["k"]).collect()[0]
    assert got2.median_halfcents == 500          # 2 × 250 cents
    # deviations |x-2.5| = 1.5,0.5,0.5,1.5 → MAD 1.0 → 400 quarter-cents
    assert got2.mad_quartercents == 400


def test_correlation_uses_pairwise_complete_rows(spark):
    from sids_data_pipeline_spark.operators.profile import column_correlation

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (None, 3.0), (3.0, 3.0)], "x double, y double"
    )
    row = column_correlation(df, [("x", "y")]).collect()[0]
    # the NULL-x row contributes to no moment; complete pairs are exactly
    # collinear
    assert row.n == 3
    assert row.corr == 1.0


def test_correlation_constant_column_yields_null_not_crash(spark):
    from sids_data_pipeline_spark.operators.profile import column_correlation

    df = spark.createDataFrame([(1.0, 1.0), (1.0, 2.0)], "x double, y double")
    row = column_correlation(df, [("x", "y")]).collect()[0]
    assert row.corr is None


def test_correlation_rejects_empty_pairs(spark):
    import pytest

    from sids_data_pipeline_spark.operators.profile import column_correlation

    with pytest.raises(ValueError):
        column_correlation(spark.range(1), [])


def test_histogram_drops_nan(spark):
    from sids_data_pipeline_spark.operators.profile import column_histogram

    df = spark.createDataFrame(
        [(float("nan"),), (0.5,)], "x double"
    )
    rows = {r.bucket: r.n for r in column_histogram(df, "x", 4, 0.0, 1.0).collect()}
    assert rows == {2: 1}  # NaN dropped, 0.5 in bucket 2


def test_robust_stats_keeps_null_key_group(spark):
    from sids_data_pipeline_spark.operators.profile import robust_stats

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("g", 3.0)], "k string, v double"
    )
    rows = {r.k: r for r in robust_stats(df, "v", ["k"]).collect()}
    assert set(rows) == {None, "g"}
    # even-integer domain: median of {200, 400} halfcent units = 300
    assert rows[None].median_halfcents == 300
