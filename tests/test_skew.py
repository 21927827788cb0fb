"""Salted join/agg equal their unsalted counterparts (the correctness
property; the perf property is that hot keys spread over num_salts tasks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on key 'hot'
    return spark.range(0, 10_000, 1, 8).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(7)]
    return spark.createDataFrame(rows, "k string, label string")


def test_salted_join_equals_plain(spark, skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = skew.salted_join(skewed, dim, ["k"], num_salts=8).groupBy(
        "k", "label"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, dim):
    left = spark.createDataFrame([("hot", 1), ("missing", 2)], "k string, v int")
    out = skew.salted_join(left, dim, ["k"], num_salts=4, how="left")
    rows = {r.k: r.label for r in out.collect()}
    assert rows == {"hot": "H", "missing": None}


def test_salted_agg_equals_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.count("v").alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    salted = skew.salted_agg(
        skewed,
        ["k"],
        {"n": ("count", "v"), "s": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
        num_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError):
        skew.salted_agg(skewed, ["k"], {"a": ("avg", "v")})


def test_salted_join_rejects_right_preserving(spark, dim):
    left = spark.createDataFrame([(1, "x")], "k long, v string")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            skew.salted_join(left, dim, ["k"], how=how)


def test_heavy_hitters_exact_counts_and_share(spark):
    from sids_data_pipeline_spark.operators.skew import heavy_hitters

    df = spark.createDataFrame(
        [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1, "k string"
    )
    rows = heavy_hitters(df, ["k"], k=2).collect()
    assert [(r.k, r.n, r.share_ppm) for r in rows] == [
        ("hot", 6, 600000),
        ("warm", 3, 300000),
    ]


def test_heavy_hitters_boundary_ties_break_on_key(spark):
    from sids_data_pipeline_spark.operators.skew import heavy_hitters

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",), ("c",)], "k string"
    )
    rows = heavy_hitters(df, ["k"], k=2).collect()
    assert [r.k for r in rows] == ["a", "b"]


def test_heavy_hitters_plans_partial_topk_not_global_sort(spark, sf_dir):
    """Scale shape: the top-k must plan as TakeOrderedAndProject (per-
    partition partial top-k), never a single-partition global Sort."""
    from sids_data_pipeline_spark.operators.skew import heavy_hitters

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        heavy_hitters(events, ["event_type"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_key_skew_report_uniform_vs_hot(spark):
    from sids_data_pipeline_spark.operators.skew import key_skew_report

    uniform = spark.createDataFrame([(i % 4,) for i in range(16)], "k int")
    r = key_skew_report(uniform, ["k"]).collect()[0]
    assert (r.n_keys, r.n_rows, r.max_key_rows) == (4, 16, 4)
    assert r.skew_ratio_micros == 1_000_000  # perfectly uniform

    hot = spark.createDataFrame([(0,)] * 13 + [(1,), (2,), (3,)], "k int")
    r = key_skew_report(hot, ["k"]).collect()[0]
    assert r.max_key_rows == 13
    assert r.skew_ratio_micros == round(13 * 1_000_000 * 4 / 16)
