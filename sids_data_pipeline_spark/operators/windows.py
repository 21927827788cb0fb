"""Event-time window operators (EXT E6 — SURVEY.md §2b).

The reference is strictly batch (SURVEY.md §2a Streaming: ABSENT); these
operators give the engine the event-time surface a training-data pipeline
needs, built on Spark's native window primitives:

- :func:`tumbling` / :func:`sliding` — ``F.window`` fixed/overlapping
  windows.
- :func:`session` — ``F.session_window`` gap-based sessions.
- :func:`latest_per_key` — event dedup: last event per key by time.
- :func:`funnel` — ordered-sequence conversion funnel (single-pass
  greedy scan over per-user sorted event arrays).
- :func:`retention` — periodic cohort retention counts.

All outputs expose window bounds as epoch-microsecond BIGINTs
(``unix_micros``) rather than rendered timestamps: integers are
timezone-proof and hash-identical across engines, per the plans/base.py
determinism policy. The same plans run under Structured Streaming via
streaming/jobs.py (readStream + watermark); batch and stream share the
operator definitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col) -> F.Column:
    return F.unix_micros(col)


def _cents(col) -> F.Column:
    """The money-domain policy (round-half-up to integer cents) in ONE
    place — five hand-inlined copies previously invited silent drift."""
    return F.round((F.col(col) if isinstance(col, str) else col) * 100, 0).cast(
        "long"
    )


def tumbling(
    events: DataFrame,
    duration: str = "10 minutes",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Fixed windows: count + exact-cents value sum per (window, keys).

    Output: (window_start_us, window_end_us, *group_cols, n_events,
    sum_value_cents).
    """
    w = F.window(F.col(ts_col), duration)
    return (
        events.groupBy(w.alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents("value")).alias("sum_value_cents"),
        )
        .select(
            _us(F.col("w.start")).alias("window_start_us"),
            _us(F.col("w.end")).alias("window_end_us"),
            *group_cols,
            "n_events",
            "sum_value_cents",
        )
    )


def sliding(
    events: DataFrame,
    duration: str = "30 minutes",
    slide: str = "10 minutes",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    w = F.window(F.col(ts_col), duration, slide)
    return (
        events.groupBy(w.alias("w"), *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            _us(F.col("w.start")).alias("window_start_us"),
            _us(F.col("w.end")).alias("window_end_us"),
            *group_cols,
            "n_events",
        )
    )


def session(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions per key (``F.session_window``).

    Spark merges events whose timestamps are <= gap apart (an exact-gap
    pair shares a session); the session
    window is [first_ts, last_ts + gap). Output: (user_id,
    session_start_us, session_end_us, n_events, sum_value_cents).
    """
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(w.alias("w"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents("value")).alias("sum_value_cents"),
        )
        .select(
            key_col,
            _us(F.col("w.start")).alias("session_start_us"),
            _us(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value_cents",
        )
    )


def latest_per_key(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    payload_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Event dedup: keep each key's latest event (ties → highest id).

    ``payload_cols`` are the carried columns (default matches the events
    table — pass your own for frames without ``event_type``; previously
    that column was hard-coded and broke the parameterization contract).
    Output: (key, id, ts_us, *payload_cols).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            key_col,
            id_col,
            _us(F.col(ts_col)).alias("ts_us"),
            *payload_cols,
        )
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    window_hours: int = 48,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence conversion funnel: how many users progress through
    ``stages`` with each transition inside a ``window_hours`` deadline.

    Greedy earliest-transition semantics (the standard product-analytics
    definition): stage 1 anchors at the user's first ``stages[0]`` event;
    each later stage takes the first matching event after the previous
    anchor and within its conversion window.

    Single-shuffle shape for 100-TB scale: one groupBy(user) builds the
    time-sorted per-user event array, then ONE linear ``aggregate`` scan
    (whole-stage codegen, no UDF) tracks (depth, deadline) — no
    per-stage self-joins, no re-shuffling the event table once per stage.
    Per-user state is bounded by that user's event count.

    Output: (depth int, n_users) — depth d counts users who completed
    stage d under GREEDY anchoring (0 = never hit stage 1). Note this is
    the greedy earliest-transition depth, not the deepest REACHABLE
    stage: a later anchor choice could sometimes reach further (e.g. a
    second 'click' whose window still covers the purchase), but greedy
    is the standard analytics definition and what the oracle mirrors.

    NULL-timestamp events are dropped first: the sorted scan would
    anchor on one (sort_array puts the NULL-ts struct first) and every
    later ``ts > anchor`` guard would evaluate NULL, permanently capping
    the user's depth — while the oracle's min-ts cascade skips NULLs.
    """
    events = events.filter(F.col(ts_col).isNotNull())
    cases = []
    for i, st in enumerate(stages):
        st_sql = st.replace("'", "''")  # quote-safe stage literals
        # strict > excludes same-timestamp transitions (matches the
        # min-ts-cascade oracle formulation exactly, not just in sort order)
        guard = (
            ""
            if i == 0
            else f" AND x.ts > s.a AND x.ts <= s.a + INTERVAL {int(window_hours)} HOUR"
        )
        cases.append(
            f"WHEN s.d = {i} AND x.et = '{st_sql}'{guard} THEN "
            f"named_struct('d', {i + 1}, 'a', x.ts)"
        )
    scan = F.expr(
        "aggregate(_evs, "
        "named_struct('d', 0, 'a', CAST(NULL AS TIMESTAMP)), "
        f"(s, x) -> CASE {' '.join(cases)} ELSE s END).d"
    )
    return (
        events.groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
                )
            ).alias("_evs")
        )
        .select("user_id", scan.alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("depth")
    )


def retention(
    events: DataFrame,
    event_type: str | None = "purchase",
    anchor_date: str = "2024-01-01",
    period_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention: users grouped by first-activity period, counted
    in each later period they remain active.

    Shape: distinct (user, period) pairs → min-period cohort per user →
    equi-join back → count per (cohort, offset). The distinct and both
    aggregations partition on user_id, so Catalyst plans one user-keyed
    shuffle chain; the pairs table is bounded by |users|·|periods|, far
    smaller than the event table at scale.

    Output: (cohort_week, week_offset, n_users) — period arithmetic in
    whole periods since ``anchor_date``.
    """
    src = events if event_type is None else events.filter(
        F.col(type_col) == event_type
    )
    wk = F.floor(
        F.datediff(F.col(ts_col).cast("date"), F.lit(anchor_date).cast("date"))
        / float(period_days)
    )
    pairs = src.select(
        F.col(user_col).alias("user_id"), wk.alias("week")
    ).distinct()
    cohort = pairs.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        pairs.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def rolling_stats(
    events: DataFrame,
    lookback_seconds: int = 3600,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-event trailing-window features: for every event, the count
    and exact-cents sum/mean of the key's events in the preceding
    ``lookback_seconds`` (inclusive of the event itself) — the standard
    feature-engineering primitive ("activity in the last hour").

    Implemented as ONE range-frame window over epoch seconds
    (``RANGE BETWEEN lookback PRECEDING AND CURRENT ROW``): a single
    shuffle on the key, sorted once, state bounded by the lookback span.
    Sums are integer cents, so the trailing mean is deterministic.
    """
    # FLOOR, not cast-truncation: the oracle buckets with
    # FLOOR(epoch_us/1e6) and the two differ on pre-1970 fractional
    # seconds (trunc pulls toward zero, floor away)
    sec = F.floor(_us(F.col(ts_col)) / 1_000_000).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(sec)
        .rangeBetween(-int(lookback_seconds), 0)
    )
    cents = _cents(value_col)
    return events.select(
        key_col,
        _us(F.col(ts_col)).alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(cents).over(w).alias("sum_trailing_cents"),
        (
            F.sum(cents).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
            / F.lit(100.0)
        ).alias("mean_trailing"),
    )


def zscore_outliers(
    events: DataFrame,
    threshold_micros: int = 3_000_000,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key z-score outlier flags: events whose value deviates from
    their key's mean by more than ``threshold_micros``/1e6 population
    standard deviations. Mean and variance derive from exact integer
    cents sums (sum, sum-of-squares), so the z-scores are deterministic
    and SQL-reproducible; the z-score itself rounds to integer micros.

    Scale shape: one map-side-combined groupBy for the per-key moments
    (a key-count-sized broadcast), one broadcast join back — the event
    stream is never shuffled.
    """
    c = _cents(value_col)
    # DECIMAL(38,0) keeps the moments exact where BIGINT overflows:
    # c*c alone passes 2^63 at |value| >= ~$30.4M (ANSI mode would kill
    # the job; non-ANSI silently produced negative variance), and the
    # per-key running sum at ~10^10 rows - both inside the documented
    # scale. DuckDB's oracle sums into HUGEINT, so this also restores
    # engine parity at the extremes.
    cd = c.cast("decimal(38,0)")
    moments = events.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(cd).alias("_s"),
        F.sum(cd * cd).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = F.col("_ss").cast("double") / F.col("_n") - mean * mean
    z = (c.cast("double") - mean) / F.sqrt(var)
    return (
        events.join(F.broadcast(moments), key_col)
        # n>=2 and positive variance: a constant-valued key has no
        # z-score (0/0 would be NaN and engine-dependent), so it can
        # never flag outliers
        .filter((F.col("_n") >= 2) & (var > 0))
        .withColumn("z_micros", F.round(z * 1_000_000, 0).cast("long"))
        .filter(F.abs(F.col("z_micros")) > threshold_micros)
        .select(id_col, key_col, c.alias("value_cents"), "z_micros")
    )


def gap_fill_daily(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-series gap fill: a continuous daily date spine from the
    data's own min..max day, left-joined to the daily aggregates, with
    zero-fill for the additive columns and LOCF (last observation
    carried forward) for the carried level — the standard reporting
    transform that turns a sparse event stream into a dense series.

    Output per day (day as 'YYYY-MM-DD' string): n_events and sum_cents
    (0 on gap days) and carried_cents (the most recent observed day's
    sum). The spine's first day is observed by construction, so
    carried_cents is never NULL.

    Scale shape: the event stream collapses to day-count-sized rows in
    ONE map-side-combined aggregation before anything else; the spine
    explode, left join, and LOCF window all run on that day-count-sized
    frame (a single-task window over ~10^4 rows even for a 30-year
    range) — the 100 TB input is touched exactly once.
    """
    daily = events.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents(value_col)).alias("sum_cents"),
    )
    spine = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("sum_cents", F.lit(0)).cast("long").alias("sum_cents"),
            F.last("sum_cents", ignorenulls=True).over(w).alias("carried_cents"),
        )
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key event-type transition counts — the Markov-chain view of a
    behavioral stream (which step follows which, corpus-wide) that the
    fixed-stage funnel cannot express. Output one row per observed
    (from_type, to_type) pair with its global count and share in ppm
    (integer, order-free).

    Scale shape: ONE shuffle on the key for the LEAD window (timestamp
    order, tiebreak for same-timestamp determinism), then a
    map-side-combined count over the tiny type×type domain; the share
    re-attaches via a single-row broadcast.
    """
    # asc_nulls_last pins NULL-ts events to the END of each key's
    # sequence — Spark's default NULLS FIRST would pair them opposite to
    # the DuckDB oracle's default NULLS LAST
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc_nulls_last(), F.col(tiebreak_col).asc_nulls_last()
    )
    pairs = (
        events.withColumn("_next", F.lead(type_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), F.col("_next").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = pairs.agg(F.sum("n").alias("_t"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") * 1_000_000 / F.col("_t"), 0)
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("from_type", "to_type")
    )
