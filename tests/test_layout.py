"""Z-order layout: key correctness, codegen purity, and the actual
row-group pruning benefit the layout exists to buy."""

from __future__ import annotations

from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators.layout import (
    pruned_fraction,
    write_zordered,
    zorder_key,
)


def _py_zorder(vals, bits):
    key = 0
    n = len(vals)
    for j, v in enumerate(vals):
        v = max(0, min(v, (1 << bits) - 1))
        for i in range(bits):
            key |= ((v >> i) & 1) << (i * n + j)
    return key


def test_zorder_key_matches_reference_bits(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023), (-7, 2000)]
    df = spark.createDataFrame(rows, "a int, b int").withColumn(
        "z", zorder_key(["a", "b"], bits=10)
    )
    got = {(r.a, r.b): r.z for r in df.collect()}
    for a, b in rows:
        assert got[(a, b)] == _py_zorder([a, b], 10), (a, b)


def test_zorder_interleave_locality():
    """Adjacent cells in either dimension stay within a bounded Z-range
    (the property that makes min/max stats selective)."""
    z00 = _py_zorder([0, 0], 10)
    z10 = _py_zorder([1, 0], 10)
    z01 = _py_zorder([0, 1], 10)
    assert {z10 - z00, z01 - z00} == {1, 2}


def test_zorder_key_is_pure_codegen(spark):
    df = spark.range(10).select(
        (F.col("id") % 4).alias("a"), (F.col("id") % 8).alias("b")
    )
    plan = (
        df.withColumn("z", zorder_key(["a", "b"], bits=8))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython


def test_zordered_layout_prunes_non_leading_dimension(spark, sf_dir, tmp_path):
    """The point of the layout: a predicate on the SECOND clustered
    dimension alone still skips most row groups under Z-order, while a
    linear sort on the first dimension skips nothing for it. (A leading-
    dimension predicate is prunable by both — that case needs no Z.)"""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            ((F.col("l_orderkey") * 7919) % 1024).alias("pk"),
            ((F.col("l_partkey") * 104729 + F.col("l_suppkey")) % 1024).alias("sk"),
            "l_orderkey",
        )
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    write_zordered(li, zpath, ["pk", "sk"], bits=10, num_files=16)
    li.repartitionByRange(16, "pk").sortWithinPartitions("pk").write.parquet(lpath)

    box = {"sk": (0, 127)}  # non-leading dimension only
    z = pruned_fraction(zpath, box)
    lin = pruned_fraction(lpath, box)
    assert z["row_groups"] >= 8
    # Z-order keeps sk-extents compact per file: most groups skip.
    assert z["skipped"] >= z["row_groups"] * 0.5
    # Linear sort on pk has full-range sk stats in every file.
    assert lin["skipped"] == 0
    # And the conjunctive 2-D box prunes at least as well as sk alone.
    z2 = pruned_fraction(zpath, {"pk": (0, 127), "sk": (0, 127)})
    assert z2["skipped"] >= z["skipped"]


def test_zorder_rejects_key_overflow():
    import pytest

    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_bucketed_join_has_zero_exchanges_and_matches_shuffled(spark, sf_dir, tmp_path):
    """Matching-bucket tables must join with NO Exchange on either side,
    and the layout must not change results vs a plain shuffled join."""
    from sids_data_pipeline_spark.operators.layout import bucketed_join, write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("okey"), "l_linenumber"
    )
    write_bucketed(orders, "t_orders_b", ["okey"], 4, path=str(tmp_path / "o"))
    write_bucketed(lineitem, "t_lineitem_b", ["okey"], 4, path=str(tmp_path / "l"))

    # the fixture dims are broadcast-sized; disable broadcast to surface
    # the fact-fact shape the bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_lineitem_b", "t_orders_b", ["okey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        expected = lineitem.join(orders, "okey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
