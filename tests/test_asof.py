"""As-of join semantics against hand-computed expectations, including the
self-cogroup case (left and right carved from one scan) that exposed the
shared-expression-ID pruning bug."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators import asof

T0 = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (event_id, type, user, ts_offset_minutes, value)
        (1, "purchase", 1, 0, 10.0),
        (2, "click", 1, 5, 0.0),     # after purchase 1
        (3, "purchase", 1, 10, 20.0),
        (4, "click", 1, 10, 0.0),    # exactly at purchase 3 → matches it
        (5, "click", 2, 7, 0.0),     # user 2 has no purchase → NULLs
        (6, "purchase", 3, 50, 30.0),  # user 3 has no clicks → no output
    ]
    return spark.createDataFrame(
        [(i, t, u, T0 + timedelta(minutes=m), v) for i, t, u, m, v in rows],
        "event_id long, event_type string, user_id long, ts timestamp, value double",
    )


@pytest.mark.parametrize("how", ["window", "cogroup"])
def test_asof_backward_semantics(spark, events, how):
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = {
        r.event_id: (r.event_id_right, r.value_right)
        for r in asof.asof_join(
            clicks, purchases, by="user_id", ts_col="ts",
            right_cols=("event_id", "value"), how=how,
        ).collect()
    }
    assert out[2] == (1, 10.0)      # latest purchase before t+5 is #1
    assert out[4] == (3, 20.0)      # equal timestamps match (<=)
    assert out[5] == (None, None)   # user without purchases keeps NULLs
    assert 6 not in out             # right-only users emit nothing
    assert set(out) == {2, 4, 5}


def test_dedupe_right_keeps_highest_tiebreak(spark):
    dup = spark.createDataFrame(
        [(1, T0, 10, 1.0), (1, T0, 11, 2.0), (1, T0 + timedelta(minutes=1), 12, 3.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    kept = asof.dedupe_right(dup, by="user_id", ts_col="ts", tiebreak="event_id")
    assert sorted(r.event_id for r in kept.collect()) == [11, 12]


@pytest.mark.parametrize("how", ["window", "cogroup"])
def test_asof_right_ts_as_payload(spark, events, how):
    """Requesting the right timestamp itself as a payload column yields a
    suffixed copy instead of crashing merge_asof."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = {
        r.event_id: r
        for r in asof.asof_join(
            clicks, purchases, by="user_id", ts_col="ts",
            right_cols=("ts", "value"), how=how,
        ).collect()
    }
    assert out[2].ts_right == T0 and out[2].value_right == 10.0
    assert out[4].ts_right == T0 + timedelta(minutes=10)
    assert out[5].ts_right is None and out[5].value_right is None


def test_asof_null_payload_field_preserved(spark):
    """A NULL payload FIELD on the matched right row stays NULL — the
    struct-carry in the window strategy must not leak an older row's
    value (per-column last(ignorenulls) would)."""
    left = spark.createDataFrame(
        [(1, 1, T0 + timedelta(minutes=20))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, T0, 99.0), (1, T0 + timedelta(minutes=10), None)],
        "user_id long, ts timestamp, value double",
    )
    for how in ("window", "cogroup"):
        row = asof.asof_join(
            left, right, by="user_id", ts_col="ts",
            right_cols=("value",), how=how,
        ).collect()[0]
        assert row.value_right is None, how


def test_asof_strategies_agree_on_events_table(spark):
    """Both strategies produce identical rows on the real events table."""
    from sids_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purchases = asof.dedupe_right(
        ev.filter("event_type = 'purchase'").select(
            "user_id", "ts", "event_id", "value"
        ),
        by="user_id", ts_col="ts", tiebreak="event_id",
    )
    res = {}
    for how in ("window", "cogroup"):
        res[how] = sorted(
            tuple(r)
            for r in asof.asof_join(
                clicks, purchases, by="user_id", ts_col="ts",
                right_cols=("event_id", "value"), how=how,
            ).collect()
        )
    assert res["window"] == res["cogroup"] and len(res["window"]) > 0


def test_asof_ignores_null_ts_right_rows(spark):
    """ADVICE r5: right rows with NULL ts/key must never match (pandas
    merge_asof / DuckDB ASOF JOIN ignore NULL keys); without the filter
    the window strategy's NULLS-FIRST ordering would surface them as the
    'earliest' payload."""
    from sids_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 5, "L1"), ("a", 1, "L0")], "k string, ts long, tag string"
    )
    right = spark.createDataFrame(
        [("a", None, 999), ("a", 3, 30), (None, 2, 777)],
        "k string, ts long, price long",
    )
    for how in ("window", "cogroup"):
        out = {
            r.tag: r.price_right
            for r in asof_join(
                left, right, by="k", ts_col="ts",
                right_cols=["price"], how=how,
            ).collect()
        }
        # ts=5 sees the ts=3 row; ts=1 has no prior valid row -> NULL
        # (the NULL-ts 999 and NULL-key 777 rows are invisible)
        assert out == {"L1": 30, "L0": None}, (how, out)


def test_interval_join_matches_naive_and_exactly_once(spark):
    """Property vs the naive theta join on random intervals, including
    pairs spanning many buckets (would duplicate without the canonical-
    bucket filter)."""
    import random

    from sids_data_pipeline_spark.operators.asof import interval_join

    rng = random.Random(7)
    lrows = [(i, s := rng.randrange(0, 500), s + rng.randrange(0, 200))
             for i in range(120)]
    rrows = [(j, s := rng.randrange(0, 500), s + rng.randrange(0, 200))
             for j in range(110)]
    left = spark.createDataFrame(lrows, "lid int, ls long, le long")
    right = spark.createDataFrame(rrows, "rid int, rs long, re long")
    got = {
        (r.lid, r.rid)
        for r in interval_join(
            left, right, ("ls", "le"), ("rs", "re"), bucket_width=32
        ).collect()
    }
    want = {
        (li, rj)
        for li, ls, le in lrows
        for rj, rs, re in rrows
        if ls <= re and rs <= le
    }
    assert got == want
    # exactly-once: the collected list has no duplicates
    rows = interval_join(
        left, right, ("ls", "le"), ("rs", "re"), bucket_width=32
    ).collect()
    assert len(rows) == len(want)


def test_interval_join_by_key_and_no_cartesian_plan(spark):
    from sids_data_pipeline_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [("a", 1, 0, 10), ("b", 2, 0, 10)], "g string, lid int, ls long, le long"
    )
    right = spark.createDataFrame(
        [("a", 9, 5, 15), ("b", 8, 50, 60)], "g string, rid int, rs long, re long"
    )
    out = interval_join(
        left, right, ("ls", "le"), ("rs", "re"), by=["g"], bucket_width=8
    )
    assert {(r.lid, r.rid) for r in out.collect()} == {(1, 9)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_rejects_column_clash(spark):
    import pytest

    from sids_data_pipeline_spark.operators.asof import interval_join

    df = spark.createDataFrame([(1, 0, 1)], "id int, s long, e long")
    with pytest.raises(ValueError, match="overlapping"):
        interval_join(df, df, ("s", "e"), ("s", "e"))


def test_forward_and_nearest_window_match_cogroup(spark):
    """The JVM window strategy and the pandas merge_asof kernel are
    independent implementations; all three directions must agree."""
    from sids_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 25.0), (3, "a", 40.0), (4, "b", 5.0)],
        "lid long, k string, ts double",
    )
    right = spark.createDataFrame(
        [("a", 20.0, 100), ("a", 30.0, 200), ("b", 50.0, 300)],
        "k string, ts double, payload long",
    )
    for direction in ("backward", "forward", "nearest"):
        w = asof_join(
            left, right, by="k", ts_col="ts", right_cols=("payload",),
            how="window", direction=direction,
        )
        c = asof_join(
            left, right, by="k", ts_col="ts", right_cols=("payload",),
            how="cogroup", direction=direction,
        )
        ws = sorted((r.lid, r.payload_right) for r in w.collect())
        cs = sorted((r.lid, r.payload_right) for r in c.collect())
        assert ws == cs, direction
    # hand-checked expectations
    near = dict(
        (r.lid, r.payload_right)
        for r in asof_join(
            left, right, by="k", ts_col="ts", right_cols=("payload",),
            direction="nearest",
        ).collect()
    )
    # lid=1 ts=10 → only forward match exists at ts=20 → 100
    # lid=2 ts=25 → tie (20 vs 30) → backward → 100
    # lid=3 ts=40 → nearest is 30 (backward) → 200
    # lid=4 ts=5 → only forward match at 50 → 300
    assert near == {1: 100, 2: 100, 3: 200, 4: 300}


def test_asof_directions_match_pandas_randomized(spark):
    """Seeded random keys/timestamps with duplicates and unmatched keys:
    every direction must agree with pandas merge_asof exactly."""
    import random

    import pandas as pd

    from sids_data_pipeline_spark.operators.asof import asof_join

    rng = random.Random(13)
    left_rows = [
        (i, f"k{rng.randrange(5)}", float(rng.randrange(100)))
        for i in range(120)
    ]
    right_rows = [
        (f"k{rng.randrange(6)}", float(rng.randrange(100)), i * 10)
        for i in range(80)
    ]
    # dedupe right on (key, ts): keep max payload, the operator contract
    best: dict = {}
    for k, ts, p in right_rows:
        best[(k, ts)] = max(best.get((k, ts), -1), p)
    right_rows = [(k, ts, p) for (k, ts), p in best.items()]

    left = spark.createDataFrame(left_rows, "lid long, k string, ts double")
    right = spark.createDataFrame(right_rows, "k string, ts double, payload long")

    l_pdf = pd.DataFrame(left_rows, columns=["lid", "k", "ts"])
    r_pdf = pd.DataFrame(right_rows, columns=["k", "ts", "payload"])
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.lid: r.payload_right
            for r in asof_join(
                left, right, by="k", ts_col="ts",
                right_cols=("payload",), direction=direction,
            ).collect()
        }
        want_df = pd.merge_asof(
            l_pdf.sort_values(["ts", "lid"], kind="mergesort"),
            r_pdf.sort_values("ts", kind="mergesort"),
            on="ts", by="k", direction=direction,
        )
        want = {
            int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
            for r in want_df.itertuples()
        }
        assert got == want, direction


def test_null_left_ts_matches_nothing_every_direction(spark):
    """A NULL left timestamp satisfies no ts-inequality — it must keep a
    NULL match in every direction (the leading-frame forms would
    otherwise grab the key's earliest right payload)."""
    from sids_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "a", None), (2, "a", 25.0)], "lid long, k string, ts double"
    )
    right = spark.createDataFrame(
        [("a", 10.0, 100), ("a", 30.0, 200)], "k string, ts double, payload long"
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.lid: r.payload_right
            for r in asof_join(
                left, right, by="k", ts_col="ts",
                right_cols=("payload",), direction=direction,
            ).collect()
        }
        assert got[1] is None, direction
        # ts=25: backward → 10 (payload 100); forward → 30 (200);
        # nearest → 30 (distance 5 beats 15)
        assert got[2] == (100 if direction == "backward" else 200), direction


def test_cogroup_null_left_ts_keeps_null_payload(spark):
    """pd.merge_asof rejects NULL keys; the cogroup strategy must match
    the window strategy's contract instead of crashing the task."""
    from sids_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, None, "b")], "k int, ts long, tag string"
    )
    right = spark.createDataFrame([(1, 50, 7.0)], "k int, ts long, px double")
    for how in ("window", "cogroup"):
        rows = {r.tag: r.px_r for r in asof_join(
            left, right, by="k", ts_col="ts", right_cols=["px"],
            suffix="_r", how=how,
        ).collect()}
        assert rows == {"a": 7.0, "b": None}, how


def test_interval_join_rejects_nonpositive_bucket_width(spark):
    import pytest

    from sids_data_pipeline_spark.operators.asof import interval_join

    df = spark.createDataFrame([(1, 0, 10)], "id int, s long, e long")
    with pytest.raises(ValueError):
        interval_join(df, df.selectExpr("id rid", "s rs", "e re"),
                      ("s", "e"), ("rs", "re"), bucket_width=0)


def test_asof_nearest_date_type(spark):
    """DateType timestamps work in all three directions — `nearest`
    needs a numeric distance and Date cannot cast to double directly."""
    import datetime as dt

    from sids_data_pipeline_spark.operators.asof import asof_join

    d = dt.date
    left = spark.createDataFrame(
        [("a", d(2024, 1, 10)), ("a", d(2024, 1, 20))],
        "k string, ts date",
    )
    right = spark.createDataFrame(
        [("a", d(2024, 1, 1), 1.0), ("a", d(2024, 1, 18), 2.0)],
        "k string, ts date, v double",
    )
    for direction, want in (
        ("backward", {d(2024, 1, 10): 1.0, d(2024, 1, 20): 2.0}),
        ("forward", {d(2024, 1, 10): 2.0, d(2024, 1, 20): None}),
        # Jan 10: 8 days forward to Jan 18 beats 9 days back to Jan 1
        ("nearest", {d(2024, 1, 10): 2.0, d(2024, 1, 20): 2.0}),
    ):
        got = {
            r.ts: r.v_right
            for r in asof_join(
                left, right, by="k", ts_col="ts", right_cols=["v"],
                direction=direction,
            ).collect()
        }
        assert got == want, direction


def test_asof_rejects_reserved_ts_payload(spark):
    import pytest as _pytest

    from sids_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([("a", 1.0)], "k string, ts double")
    right = spark.createDataFrame(
        [("a", 1.0, 9.0)], "k string, ts double, _ts double"
    )
    with _pytest.raises(ValueError, match="_ts"):
        asof_join(left, right, by="k", ts_col="ts", right_cols=["_ts"])
