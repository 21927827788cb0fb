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
