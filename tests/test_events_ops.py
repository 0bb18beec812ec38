"""Hand-value tests for the event-stream batch analytics: gap
sessionization, ordered funnel, tumbling rollup."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from graphical_context_extraction_pipeline_spark.operators import events as EV

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(minutes: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def _events(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_sessionize_gap_split(spark):
    # user 1: events at t=0, 10, 20 (one session), then 60 (new session:
    # 40 min > 30 min gap), 70; user 2: single event
    rows = [
        (1, _ts(0), 1, "view", 1.0),
        (2, _ts(10), 1, "click", 1.0),
        (3, _ts(20), 1, "view", 1.0),
        (4, _ts(60), 1, "view", 1.0),
        (5, _ts(70), 1, "purchase", 1.0),
        (6, _ts(5), 2, "view", 1.0),
    ]
    out = {(r["user_id"], r["session_idx"]): r.asDict()
           for r in EV.sessionize(_events(spark, rows)).collect()}
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s1 = out[(1, 1)]
    assert s1["n_events"] == 3 and s1["duration_ms"] == 20 * 60000
    s2 = out[(1, 2)]
    assert s2["n_events"] == 2 and s2["start_ms"] - s1["end_ms"] == 40 * 60000
    assert out[(2, 1)]["n_events"] == 1 and out[(2, 1)]["duration_ms"] == 0


def test_sessionize_exact_gap_not_split(spark):
    # a gap of EXACTLY gap_ms stays in the same session (break is strict >)
    rows = [(1, _ts(0), 1, "view", 1.0), (2, _ts(30), 1, "view", 1.0)]
    out = EV.sessionize(_events(spark, rows)).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_funnel_ordering_is_strict(spark):
    # user 1: view->click->purchase in order (completes all)
    # user 2: click before view (first click precedes first view -> stops at view)
    # user 3: view only
    rows = [
        (1, _ts(0), 1, "view", 1.0),
        (2, _ts(1), 1, "click", 1.0),
        (3, _ts(2), 1, "purchase", 1.0),
        (4, _ts(0), 2, "click", 1.0),
        (5, _ts(1), 2, "view", 1.0),
        (6, _ts(2), 2, "purchase", 1.0),
        (7, _ts(0), 3, "view", 1.0),
    ]
    got = {r["step"]: r["n_users"] for r in EV.funnel(_events(spark, rows)).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_event_rollup_hourly(spark):
    rows = [
        (1, _ts(0), 1, "view", 1.25),
        (2, _ts(59), 1, "view", 2.00),
        (3, _ts(60), 1, "view", 4.00),  # next hour bucket
        (4, _ts(61), 1, "click", 8.00),
    ]
    out = {(r["window_start_ms"], r["event_type"]): r.asDict()
           for r in EV.event_rollup(_events(spark, rows)).collect()}
    base = 1704067200000  # 2024-01-01T00:00:00Z in epoch ms (NTZ treated as UTC)
    assert out[(base, "view")]["n_events"] == 2
    assert out[(base, "view")]["sum_value_e2"] == 125 + 200
    assert out[(base + 3600000, "view")]["n_events"] == 1
    assert out[(base + 3600000, "click")]["sum_value_e2"] == 800


def test_retention_cohorts_hand_values(spark):
    wk = 7 * 86400 * 1000
    base = dt.datetime(1970, 1, 1)

    def at_week(w, minute):
        return base + dt.timedelta(milliseconds=w * wk, minutes=minute)

    # user 1: first event week 0, active weeks 0,1,3
    # user 2: first event week 0, active week 0 only (two events same week)
    # user 3: first event week 1, active weeks 1,2
    rows = [
        (1, at_week(0, 1), 1, "view", 1.0),
        (2, at_week(1, 1), 1, "view", 1.0),
        (3, at_week(3, 1), 1, "view", 1.0),
        (4, at_week(0, 2), 2, "view", 1.0),
        (5, at_week(0, 3), 2, "click", 1.0),
        (6, at_week(1, 1), 3, "view", 1.0),
        (7, at_week(2, 1), 3, "view", 1.0),
    ]
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in EV.retention_cohorts(_events(spark, rows)).collect()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}


def test_rate_spikes_hand_values(spark):
    import datetime as dt

    from graphical_context_extraction_pipeline_spark.operators import events as EV

    def e(i, hour, typ="view"):
        return (i, dt.datetime(2026, 1, 1, hour, 30), 1, typ, 1.0, None)

    rows, i = [], 0
    # hours 0,1,2: 2 events each (baseline); hour 3: 6 events (3× mean → spike);
    # hour 4: 2 events (trailing now 2,2,6 → mean 10/3, 2 < 10 → no spike)
    for h, n in [(0, 2), (1, 2), (2, 2), (3, 6), (4, 2)]:
        for _ in range(n):
            rows.append(e(i, h)); i += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    got = {r.window_start_ms: r for r in EV.rate_spikes(ev).collect()}
    by_hour = {k // 3600000 % 24: v for k, v in got.items()}
    assert by_hour[0].spike is False and by_hour[0].trailing_n == 0  # cold start
    assert by_hour[2].spike is False  # only 2 predecessors
    assert by_hour[3].spike is True and by_hour[3].trailing_sum == 6
    assert by_hour[4].spike is False and by_hour[4].trailing_sum == 10


def test_conversion_lag_buckets(spark):
    """Only strictly-converting users count; lag buckets are bit_length(lag+1)."""
    from graphical_context_extraction_pipeline_spark.operators import events as EV

    rows = [
        # user 1: view at 0ms, purchase at 7ms -> lag 7 -> bucket len(bin(8)) = 4
        (1, 1, "2020-01-01 00:00:00.000", "view"),
        (2, 1, "2020-01-01 00:00:00.007", "purchase"),
        # user 2: purchase BEFORE view -> excluded
        (3, 2, "2020-01-01 00:00:00.000", "purchase"),
        (4, 2, "2020-01-01 00:00:01.000", "view"),
        # user 3: view only -> excluded
        (5, 3, "2020-01-01 00:00:00.000", "view"),
        # user 4: lag 1ms -> bucket len(bin(2)) = 2
        (6, 4, "2020-01-01 00:00:00.000", "view"),
        (7, 4, "2020-01-01 00:00:00.001", "purchase"),
    ]
    events = spark.createDataFrame(rows, "event_id long, user_id long, ts string, event_type string").selectExpr(
        "event_id", "user_id", "cast(ts AS timestamp_ntz) AS ts", "event_type"
    )
    got = {r.bucket: (r.n_users, r.min_lag_ms, r.max_lag_ms)
           for r in EV.conversion_lag(events).collect()}
    assert got == {4: (1, 7, 7), 2: (1, 1, 1)}


def test_gap_quantiles_hand_values(spark):
    """One user, one kind, gaps 10/20/30/40/50 ms (from 6 events):
    Q(50)=30 (cum 3 >= 2.5), Q(95)=50, Q(99)=50; a kind with a single
    event yields no gap row; ties and same-ms events break on event_id."""
    import datetime as dt

    from graphical_context_extraction_pipeline_spark.operators.events import (
        gap_quantiles,
    )

    def ts(ms):
        return dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=ms)

    rows = []
    t, acc = 0, [0]
    for g in (10, 20, 30, 40, 50):
        t += g
        acc.append(t)
    rows += [(i, ts(ms), "u1", "view", 0.0, None) for i, ms in enumerate(acc)]
    rows.append((100, ts(7), "u1", "solo", 0.0, None))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id string, event_type string,"
        " value double, props map<string,string>",
    )
    got = {
        (r.event_type, r.p): (r.gap_ms, r.n_gaps)
        for r in gap_quantiles(events).collect()
    }
    assert got[("view", 50)] == (30, 5)
    assert got[("view", 95)] == (50, 5)
    assert got[("view", 99)] == (50, 5)
    assert not any(k == "solo" for k, _ in got)
