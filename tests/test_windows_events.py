"""Event-time window semantics against hand-computed oracles."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from sids_data_pipeline_spark.operators import windows

T0 = datetime(2024, 1, 1, 0, 0, 0)

# (event_id, ts, user_id, event_type, value, props)
EVENTS = [
    (1, T0, 1, "click", 1.0, "{}"),
    (2, T0 + timedelta(minutes=5), 1, "click", 2.0, "{}"),
    (3, T0 + timedelta(minutes=34), 1, "view", 4.0, "{}"),   # still session 1 (gap 29m < 30m)
    (4, T0 + timedelta(minutes=65), 1, "view", 8.0, "{}"),   # gap 31m → session 2
    (5, T0 + timedelta(minutes=95), 1, "click", 16.0, "{}"),  # gap EXACTLY 30m → merges (Spark: diff <= gap)
    (7, T0 + timedelta(minutes=160), 1, "click", 64.0, "{}"),  # gap 35m → session 3
    (6, T0, 2, "click", 32.0, "{}"),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


T0_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def us(dt: datetime) -> int:
    # timezone-proof: offset from the fixed UTC epoch of T0 (the session
    # timezone is pinned to UTC, so naive datetimes are UTC instants)
    return T0_EPOCH_US + int((dt - T0).total_seconds() * 1_000_000)


def test_tumbling_counts(events):
    rows = {
        (r.window_start_us, r.event_type): (r.n_events, r.sum_value_cents)
        for r in windows.tumbling(events, "10 minutes").collect()
    }
    assert rows[(us(T0), "click")] == (3, 3500)  # events 1, 2 (user1) + 6 (user2)
    assert rows[(us(T0 + timedelta(minutes=30)), "view")] == (1, 400)


def test_sliding_window_multiplicity(events):
    rows = windows.sliding(events, "30 minutes", "10 minutes").collect()
    # each event appears in exactly duration/slide = 3 windows
    assert sum(r.n_events for r in rows) == 3 * len(EVENTS)


def test_session_window_gap_semantics(events):
    rows = sorted(
        windows.session(events, "30 minutes").collect(),
        key=lambda r: (r.user_id, r.session_start_us),
    )
    u1 = [r for r in rows if r.user_id == 1]
    assert len(u1) == 3
    # session 1 = events 1-3: [T0, T0+34m+30m)
    assert u1[0].session_start_us == us(T0)
    assert u1[0].session_end_us == us(T0 + timedelta(minutes=64))
    assert u1[0].n_events == 3
    # boundary: event at exactly prev_ts + gap MERGES (Spark semantics:
    # sessions merge when the time difference <= gap), so session 2 holds
    # events 4 and 5 and ends at 95m + 30m
    assert u1[1].n_events == 2
    assert u1[1].session_end_us == us(T0 + timedelta(minutes=125))
    assert u1[2].session_start_us == us(T0 + timedelta(minutes=160))
    u2 = [r for r in rows if r.user_id == 2]
    assert len(u2) == 1 and u2[0].n_events == 1


def test_latest_per_key(events):
    rows = {r.user_id: r.event_id for r in windows.latest_per_key(events).collect()}
    assert rows == {1: 7, 2: 6}


def test_funnel_hand_oracle(spark):
    """Greedy funnel semantics: windows, ordering, and strict > ties."""
    rows = []
    # user 1: view → click (+1h) → purchase (+1h): completes, depth 3
    rows += [
        (10, T0, 1, "view", 0.0, "{}"),
        (11, T0 + timedelta(hours=1), 1, "click", 0.0, "{}"),
        (12, T0 + timedelta(hours=2), 1, "purchase", 0.0, "{}"),
    ]
    # user 2: click arrives 50h after the first view → outside the 48h
    # window; a later view cannot re-anchor (greedy first-view), depth 1
    rows += [
        (20, T0, 2, "view", 0.0, "{}"),
        (21, T0 + timedelta(hours=50), 2, "click", 0.0, "{}"),
        (22, T0 + timedelta(hours=49), 2, "view", 0.0, "{}"),
    ]
    # user 3: purchase at EXACTLY the click timestamp → strict > excludes
    # it; no later purchase, depth 2
    rows += [
        (30, T0, 3, "view", 0.0, "{}"),
        (31, T0 + timedelta(hours=1), 3, "click", 0.0, "{}"),
        (32, T0 + timedelta(hours=1), 3, "purchase", 0.0, "{}"),
    ]
    # user 4: never views, depth 0 (still counted in the universe)
    rows += [(40, T0, 4, "click", 0.0, "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.depth: r.n_users for r in windows.funnel(df).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}


def test_retention_hand_oracle(spark):
    """Cohorts anchor at first activity; churn drops out of later offsets."""
    rows = [
        # user 1: purchases in weeks 0, 1, 2 (cohort 0, retained twice)
        (100, T0, 1, "purchase", 0.0, "{}"),
        (101, T0 + timedelta(days=8), 1, "purchase", 0.0, "{}"),
        (102, T0 + timedelta(days=15), 1, "purchase", 0.0, "{}"),
        # user 2: cohort 0, churns after week 0 (second event same week)
        (200, T0 + timedelta(days=1), 2, "purchase", 0.0, "{}"),
        (201, T0 + timedelta(days=2), 2, "purchase", 0.0, "{}"),
        # user 3: first purchase in week 1 → its own cohort
        (300, T0 + timedelta(days=9), 3, "purchase", 0.0, "{}"),
        # user 4: only clicks — excluded by the event-type filter
        (400, T0, 4, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in windows.retention(df).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}


def test_funnel_conserves_users_and_custom_stages(spark, events):
    # every user lands in exactly one depth bucket
    out = windows.funnel(events).collect()
    assert sum(r.n_users for r in out) == 2  # fixture has users 1 and 2
    # custom 2-stage sequence: user 1 has click@T0 then view@+34m → depth 2;
    # user 2 has only a click → depth 1
    got = {r.depth: r.n_users for r in windows.funnel(
        events, stages=("click", "view")).collect()}
    assert got == {1: 1, 2: 1}


def test_rolling_stats_trailing_frame(spark):
    from datetime import datetime as dt

    from sids_data_pipeline_spark.operators.windows import rolling_stats

    rows = [
        (1, dt(2024, 1, 1, 10, 0, 0), 1.0),
        (1, dt(2024, 1, 1, 10, 30, 0), 2.0),
        (1, dt(2024, 1, 1, 11, 15, 0), 4.0),   # 10:00 falls out of 1h frame
        (2, dt(2024, 1, 1, 10, 0, 0), 10.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = {
        (r.user_id, r.ts_us): (r.n_trailing, r.sum_trailing_cents)
        for r in rolling_stats(df, lookback_seconds=3600).collect()
    }
    us = lambda d: int(d.timestamp() * 1_000_000)
    assert got[(1, us(dt(2024, 1, 1, 10, 0, 0)))] == (1, 100)
    assert got[(1, us(dt(2024, 1, 1, 10, 30, 0)))] == (2, 300)
    # 11:15 frame = [10:15, 11:15] -> includes 10:30 and itself only
    assert got[(1, us(dt(2024, 1, 1, 11, 15, 0)))] == (2, 600)
    assert got[(2, us(dt(2024, 1, 1, 10, 0, 0)))] == (1, 1000)


def test_zscore_outliers_flags_only_extremes(spark):
    from sids_data_pipeline_spark.operators.windows import zscore_outliers

    # 9 values at 10.0 and one at 100.0: the spike is the only outlier
    rows = [(i, "buy", 10.0) for i in range(9)] + [(9, "buy", 100.0)]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    out = zscore_outliers(df, threshold_micros=2_000_000).collect()
    assert [r.event_id for r in out] == [9]
    assert out[0].value_cents == 10000


def test_zscore_outliers_never_shuffles_events(spark, sf_dir):
    """The event side must reach the join without an Exchange: moments
    broadcast back, so only the tiny key aggregate shuffles."""
    from sids_data_pipeline_spark.operators.windows import zscore_outliers

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        zscore_outliers(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_zscore_outliers_constant_key_never_flags(spark):
    from sids_data_pipeline_spark.operators.windows import zscore_outliers

    df = spark.createDataFrame(
        [(i, "const", 5.0) for i in range(4)],
        "event_id bigint, event_type string, value double",
    )
    assert zscore_outliers(df, threshold_micros=0).count() == 0


def test_gap_fill_daily_zero_fills_and_carries(spark):
    from sids_data_pipeline_spark.operators.windows import gap_fill_daily

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1.00),
            (2, "2024-01-01 11:00:00", 2.00),
            (3, "2024-01-04 09:00:00", 5.00),
        ],
        "event_id long, ts string, value double",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    rows = {r.day: r for r in gap_fill_daily(ev).collect()}
    assert sorted(rows) == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert (rows["2024-01-01"].n_events, rows["2024-01-01"].sum_cents) == (2, 300)
    # gap days: zero-filled additives, carried level from Jan 1
    for gap in ("2024-01-02", "2024-01-03"):
        assert (rows[gap].n_events, rows[gap].sum_cents) == (0, 0)
        assert rows[gap].carried_cents == 300
    assert rows["2024-01-04"].carried_cents == 500


def test_event_transitions_counts_ordered_pairs(spark):
    from sids_data_pipeline_spark.operators.windows import event_transitions

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "view", 0.0, ""),
            (2, "2024-01-01 10:01:00", 7, "click", 0.0, ""),
            (3, "2024-01-01 10:02:00", 7, "view", 0.0, ""),
            (4, "2024-01-01 10:00:30", 8, "view", 0.0, ""),
            (5, "2024-01-01 10:01:30", 8, "click", 0.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    )
    rows = {(r.from_type, r.to_type): (r.n, r.share_ppm)
            for r in event_transitions(ev).collect()}
    # user 7: view→click, click→view; user 8: view→click
    assert rows[("view", "click")] == (2, 666667)
    assert rows[("click", "view")] == (1, 333333)
    assert len(rows) == 2


def test_funnel_null_ts_does_not_cap_depth(spark):
    """A NULL-timestamp stage event must not anchor the scan (it would
    NULL every later guard and freeze the user at depth 1)."""
    import datetime as dt

    from sids_data_pipeline_spark.operators.windows import funnel

    t = dt.datetime
    rows = [
        (1, None, 7, "view", 1.0, "{}"),
        (2, t(2024, 1, 1, 0, 30), 7, "view", 1.0, "{}"),
        (3, t(2024, 1, 1, 1, 0), 7, "click", 1.0, "{}"),
        (4, t(2024, 1, 1, 2, 0), 7, "purchase", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.depth: r.n_users for r in funnel(ev).collect()}
    assert got == {3: 1}


def test_zscore_outliers_survives_huge_values(spark):
    """A single >= $30.4M value used to overflow the BIGINT sum of
    squares (ANSI: job-killing ARITHMETIC_OVERFLOW); moments now
    accumulate in DECIMAL(38,0)."""
    import datetime as dt

    from sids_data_pipeline_spark.operators.windows import zscore_outliers

    t = dt.datetime(2024, 1, 1)
    # 20 ordinary values + one huge one (population z caps at sqrt(n-1),
    # so a small baseline could never cross 3 sigma)
    rows = [(i, t, 7, "pay", float(i % 3), "{}") for i in range(2, 22)]
    rows.append((1, t, 7, "pay", 40_000_000.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = zscore_outliers(ev, key_col="event_type").collect()
    assert {r.event_id for r in out} == {1}  # the huge value IS the outlier


def test_latest_per_key_custom_payload(spark):
    from sids_data_pipeline_spark.operators.windows import latest_per_key

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10, 5.0),
         (1, "2024-01-02 00:00:00", 11, 7.0)],
        "k long, t string, i long, v double",
    ).selectExpr("k", "CAST(t AS TIMESTAMP) AS t", "i", "v")
    out = latest_per_key(df, key_col="k", ts_col="t", id_col="i",
                         payload_cols=("v",)).collect()
    assert len(out) == 1 and out[0].i == 11 and out[0].v == 7.0
