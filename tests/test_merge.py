"""merge_upsert / snapshot_diff: row-level incremental maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators.merge import merge_upsert, snapshot_diff


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )


def test_upsert_update_insert_passthrough(spark, target):
    source = spark.createDataFrame([Row(k=2, v="B"), Row(k=4, v="d")])
    got = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_upsert_tombstone_delete(spark, target):
    source = spark.createDataFrame(
        [
            Row(k=2, v="B", dead=False),
            Row(k=3, v=None, dead=True),  # delete existing
            Row(k=9, v=None, dead=True),  # delete absent: no-op
        ]
    )
    got = {
        r.k: r.v
        for r in merge_upsert(target, source, ["k"], delete_col="dead").collect()
    }
    assert got == {1: "a", 2: "B"}


def test_upsert_null_tombstone_flag_means_upsert(spark, target):
    source = spark.createDataFrame(
        [(1, "A", None)], "k bigint, v string, dead boolean"
    )
    got = {
        r.k: r.v
        for r in merge_upsert(target, source, ["k"], delete_col="dead").collect()
    }
    assert got == {1: "A", 2: "b", 3: "c"}


def test_upsert_composite_key_and_column_order(spark):
    target = spark.createDataFrame([Row(a=1, b="x", v=10), Row(a=1, b="y", v=20)])
    # source with columns in a different order: unionByName must align
    source = spark.createDataFrame([Row(v=99, b="x", a=1)]).select("v", "b", "a")
    rows = merge_upsert(target, source, ["a", "b"]).collect()
    assert {(r.a, r.b, r.v) for r in rows} == {(1, "x", 99), (1, "y", 20)}


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    new = spark.createDataFrame(
        [Row(k=2, v="b"), Row(k=3, v="C"), Row(k=4, v="d")]
    )
    got = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    # k=2 unchanged -> absent from the change set
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_null_safe(spark):
    old = spark.createDataFrame([Row(k=1, v=None), Row(k=2, v="")])
    new = spark.createDataFrame([Row(k=1, v=""), Row(k=2, v="")])
    got = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    # NULL -> '' is a change (digest distinguishes NULL from empty string)
    assert got == {1: "changed"}


def test_snapshot_diff_compare_cols_subset(spark):
    old = spark.createDataFrame([Row(k=1, v="a", meta="m1")])
    new = spark.createDataFrame([Row(k=1, v="a", meta="m2")])
    assert snapshot_diff(old, new, ["k"], compare_cols=["v"]).count() == 0
    got = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "changed"}


def test_scd2_collapses_runs_and_builds_intervals(spark):
    from datetime import datetime as dt

    from sids_data_pipeline_spark.operators.merge import scd2_history

    rows = [
        # user 1: a a b a  -> episodes a[t1,t3) b[t3,t4) a[t4,∞)
        (1, dt(2024, 1, 1), 10, "a"),
        (1, dt(2024, 1, 2), 11, "a"),
        (1, dt(2024, 1, 3), 12, "b"),
        (1, dt(2024, 1, 4), 13, "a"),
        # user 2: single event -> one current episode
        (2, dt(2024, 1, 1), 14, "x"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, state string"
    )
    hist = scd2_history(
        df, ["user_id"], "ts", ["state"], tiebreak_cols=["event_id"]
    ).collect()
    by_user = {}
    for r in sorted(hist, key=lambda r: (r.user_id, r.valid_from)):
        by_user.setdefault(r.user_id, []).append(r)
    u1 = by_user[1]
    assert [(r.state, r.valid_from.day, r.valid_to.day if r.valid_to else None)
            for r in u1] == [("a", 1, 3), ("b", 3, 4), ("a", 4, None)]
    assert [r.is_current for r in u1] == [False, False, True]
    (u2,) = by_user[2]
    assert u2.state == "x" and u2.is_current and u2.valid_to is None


def test_scd2_timestamp_tie_broken_by_tiebreak_col(spark):
    from datetime import datetime as dt

    from sids_data_pipeline_spark.operators.merge import scd2_history

    t = dt(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t, 2, "late"), (1, t, 1, "early")],
        "user_id bigint, ts timestamp, event_id bigint, state string",
    )
    hist = sorted(
        scd2_history(df, ["user_id"], "ts", ["state"], ["event_id"]).collect(),
        key=lambda r: r.is_current,
    )
    assert [r.state for r in hist] == ["early", "late"]
    assert hist[1].is_current


def test_scd2_single_shuffle(spark):
    """Both windows share one partitioning: exactly one Exchange."""
    from datetime import datetime as dt

    from sids_data_pipeline_spark.operators.merge import scd2_history

    df = spark.createDataFrame(
        [(1, dt(2024, 1, 1), 1, "a")],
        "user_id bigint, ts timestamp, event_id bigint, state string",
    )
    plan = scd2_history(
        df, ["user_id"], "ts", ["state"], ["event_id"]
    )._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_upsert_broadcasts_small_change_batch(spark, sf_dir):
    """Scale shape: the anti-join against a small change batch must be a
    broadcast join (no shuffle of the big target side)."""
    target = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    source = target.filter(F.col("o_orderkey") < 100).withColumn(
        "o_orderpriority", F.lit("X")
    )
    plan = merge_upsert(target, source, ["o_orderkey"])._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_maintain_aggregate_matches_full_recompute(spark):
    """Property: folding a signed changelog into the view equals a full
    recompute over (base - deletes + inserts), including vanished groups."""
    from sids_data_pipeline_spark.operators.merge import maintain_aggregate

    base = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 30), ("c", 4, 40)],
        "g string, k int, v long",
    )
    mv = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    )
    changes = spark.createDataFrame(
        [
            ("a", 5, 50, 1),    # insert into existing group
            ("d", 6, 60, 1),    # insert creating a new group
            ("b", 3, 30, -1),   # delete the only 'b' row -> group vanishes
            ("c", 4, 40, -1),   # delete one 'c' row
            ("c", 7, 70, 1),    # ...then insert another
        ],
        "g string, k int, v long, _sign int",
    )
    got = {
        r.g: (r.n_rows, r.sum_v)
        for r in maintain_aggregate(
            mv, changes, ["g"], {"sum_v": "v"}
        ).collect()
    }
    assert got == {"a": (3, 80), "c": (1, 70), "d": (1, 60)}
    assert "b" not in got


def test_maintain_aggregate_delta_preaggregates_before_join(spark):
    """Scale shape: the changelog collapses to per-key deltas (partial
    aggregate) before joining the view -- the join input is keys, not rows."""
    from sids_data_pipeline_spark.operators.merge import maintain_aggregate

    mv = spark.createDataFrame([("a", 1, 10)], "g string, n_rows long, sum_v long")
    changes = spark.createDataFrame(
        [("a", 1, 1)], "g string, v long, _sign int"
    )
    plan = (
        maintain_aggregate(mv, changes, ["g"], {"sum_v": "v"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial" in plan.lower()  # map-side combine on the changelog


def test_refresh_aggregate_equals_full_recompute(spark):
    """Adds, removes, and in-place changes: the refreshed view must equal
    the aggregate computed directly over the new snapshot."""
    from sids_data_pipeline_spark.operators.merge import refresh_aggregate

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "id int, g string, v long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),    # unchanged
            (2, "a", 25),    # changed value
            (4, "b", 40),    # changed group (moves c -> b)
            (5, "d", 50),    # added
        ],                    # id 3 removed
        "id int, g string, v long",
    )
    mv = old.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    )
    got = {
        r.g: (r.n_rows, r.sum_v)
        for r in refresh_aggregate(
            mv, old, new, ["id"], ["g"], {"sum_v": "v"}
        ).collect()
    }
    want = {
        r.g: (r.n_rows, r.sum_v)
        for r in new.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert got == want
    assert "c" not in got  # group vanished with the move


def test_maintain_aggregate_randomized_vs_recompute(spark):
    """Seeded randomized property check at a few hundred keys: fold of a
    random signed changelog == recompute over (base − deletes + inserts),
    including groups that vanish entirely."""
    import random

    from sids_data_pipeline_spark.operators.merge import maintain_aggregate

    rng = random.Random(42)
    base = [
        (i, f"g{rng.randrange(40)}", rng.randrange(-50, 100))
        for i in range(2000)
    ]
    base_df = spark.createDataFrame(base, "id int, g string, v long")
    mv = base_df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    )
    # deletes: an exact subset of base rows; inserts: new rows, some in
    # brand-new groups; also delete EVERY row of group g0 (vanishing)
    deletes = [r for r in base if rng.random() < 0.3 or r[1] == "g0"]
    inserts = [
        (10_000 + i, f"g{rng.randrange(50)}", rng.randrange(-50, 100))
        for i in range(500)
    ]
    changes = spark.createDataFrame(
        [(*r, -1) for r in deletes] + [(*r, 1) for r in inserts],
        "id int, g string, v long, _sign int",
    )
    got = {
        r.g: (r.n_rows, r.sum_v)
        for r in maintain_aggregate(mv, changes, ["g"], {"sum_v": "v"}).collect()
    }
    kept = [r for r in base if r not in deletes] + inserts
    want: dict = {}
    for _i, g, v in kept:
        n, s = want.get(g, (0, 0))
        want[g] = (n + 1, s + v)
    assert got == want


def test_maintain_aggregate_null_group_key(spark):
    """A NULL group key is a real group under GROUP BY; the fold must
    merge it null-safely instead of splitting view and delta rows."""
    from sids_data_pipeline_spark.operators.merge import maintain_aggregate

    base = spark.createDataFrame(
        [(None, 10), (None, 20), ("a", 1)], "g string, v long"
    )
    mv = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    )
    changes = spark.createDataFrame(
        [(None, 5, 1), (None, 10, -1)], "g string, v long, _sign int"
    )
    got = {
        r.g: (r.n_rows, r.sum_v)
        for r in maintain_aggregate(mv, changes, ["g"], {"sum_v": "v"}).collect()
    }
    assert got == {None: (2, 25), "a": (1, 1)}


def test_snapshot_diff_null_keys_match_null_safely(spark):
    from sids_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(None, "a"), (1, "b")], "k int, v string")
    new = spark.createDataFrame([(None, "a"), (1, "c")], "k int, v string")
    rows = {(r.k, r.change) for r in snapshot_diff(old, new, ["k"]).collect()}
    # the unchanged NULL-key row must NOT diff as removed+added
    assert rows == {(1, "changed")}


def test_refresh_aggregate_retracts_null_id_keys(spark):
    from sids_data_pipeline_spark.operators.merge import refresh_aggregate

    old = spark.createDataFrame(
        [(None, "g", 10.0), (1, "g", 5.0)], "id int, grp string, v double"
    )
    new = spark.createDataFrame([(1, "g", 5.0)], "id int, grp string, v double")
    mv = spark.createDataFrame([("g", 2, 15.0)], "grp string, n_rows long, sum_v double")
    out = {r.grp: r for r in refresh_aggregate(
        mv, old, new, ["id"], ["grp"], {"sum_v": "v"}
    ).collect()}
    # the NULL-id row was removed: its contribution must retract
    assert out["g"].n_rows == 1
    assert out["g"].sum_v == 5.0


def test_distinct_sketches_merge_and_append(spark):
    """COUNT DISTINCT via stored sketches: per-partition sketches union
    to the right global estimate, and appending a NEW partition's sketch
    row updates the estimate without touching old partitions."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.merge import (
        distinct_sketches,
        merged_distinct,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("part"),
        # keys overlap across partitions: per-part distinct sums to 3000
        # but the true global distinct is 1000
        (F.col("id") % 1000).alias("key"),
    )
    sk = distinct_sketches(df, "key", ["part"])
    assert sk.count() == 3
    est = merged_distinct(sk).first().approx_distinct
    assert abs(est - 1000) <= 1000 * 0.05
    # append one new partition carrying 500 NEW keys
    extra = spark.range(0, 500).select(
        F.lit(9).alias("part"), (F.col("id") + 10_000).alias("key")
    )
    sk2 = sk.unionByName(distinct_sketches(extra, "key", ["part"]))
    est2 = merged_distinct(sk2).first().approx_distinct
    assert abs(est2 - 1500) <= 1500 * 0.05
    # per-group rollup path
    grouped = merged_distinct(sk2, ["part"])
    assert grouped.count() == 4
