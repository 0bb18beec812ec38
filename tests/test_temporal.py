"""Semantics gates for operators/temporal.py: as-of join boundary/tie/
no-match behavior and pair-once interval overlap counting across buckets."""

import datetime

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import temporal as T


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


LEFT_SCHEMA = "k string, lts long, lid long"
RIGHT_SCHEMA = "k string, rts long, val string, rid long"


def _asof(spark, left_rows, right_rows, **kw):
    left = _df(spark, left_rows, LEFT_SCHEMA)
    right = _df(spark, right_rows, RIGHT_SCHEMA)
    out = T.asof_join(
        left, right, by=["k"], left_ts="lts", right_ts="rts",
        value_cols=["val", "rid"], right_tie="rid", **kw,
    )
    return {(r.k, r.lts, r.lid): (r.val, r.rid) for r in out.collect()}


def test_asof_basic_most_recent_preceding(spark):
    got = _asof(
        spark,
        [("a", 10, 1), ("a", 4, 2), ("a", 99, 3)],
        [("a", 5, "x", 100), ("a", 9, "y", 101), ("a", 50, "z", 102)],
    )
    assert got[("a", 10, 1)] == ("y", 101)   # 9 <= 10 < 50
    assert got[("a", 4, 2)] == (None, None)  # nothing at or before 4
    assert got[("a", 99, 3)] == ("z", 102)


def test_asof_boundary_inclusive_vs_strict(spark):
    left = [("a", 10, 1)]
    right = [("a", 10, "boundary", 7), ("a", 3, "older", 6)]
    assert _asof(spark, left, right)[("a", 10, 1)] == ("boundary", 7)
    assert _asof(spark, left, right, inclusive=False)[("a", 10, 1)] == ("older", 6)


def test_asof_tie_break_is_max_tie_column(spark):
    got = _asof(
        spark,
        [("a", 10, 1)],
        [("a", 10, "low", 5), ("a", 10, "high", 9), ("a", 10, "mid", 7)],
    )
    assert got[("a", 10, 1)] == ("high", 9)


def test_asof_groups_are_independent(spark):
    got = _asof(
        spark,
        [("a", 10, 1), ("b", 10, 2)],
        [("a", 9, "fromA", 1), ("b", 8, "fromB", 2)],
    )
    assert got[("a", 10, 1)] == ("fromA", 1)
    assert got[("b", 10, 2)] == ("fromB", 2)


def test_asof_empty_right_keeps_all_left(spark):
    left = _df(spark, [("a", 10, 1)], LEFT_SCHEMA)
    right = _df(spark, [], RIGHT_SCHEMA)
    out = T.asof_join(left, right, by=["k"], left_ts="lts", right_ts="rts",
                      value_cols=["val", "rid"], right_tie="rid").collect()
    assert len(out) == 1 and out[0].val is None


def test_asof_empty_left_is_empty(spark):
    left = _df(spark, [], LEFT_SCHEMA)
    right = _df(spark, [("a", 5, "x", 1)], RIGHT_SCHEMA)
    out = T.asof_join(left, right, by=["k"], left_ts="lts", right_ts="rts",
                      value_cols=["val"], right_tie="rid")
    assert out.count() == 0


INT_SCHEMA = "u long, i long, start_ms long, end_ms long"


def _overlaps(spark, rows, bucket_ms):
    df = _df(spark, rows, INT_SCHEMA)
    out = T.interval_overlap_counts(df, ["u", "i"], bucket_ms)
    return {(r.u, r.i): r.n_overlaps for r in out.collect()}


def test_overlap_counts_planted_geometry(spark):
    # A=[0,100] overlaps B=[50,150] and C=[100,200] (closed-interval touch);
    # D=[300,400] overlaps nothing.
    rows = [(1, 0, 0, 100), (2, 0, 50, 150), (3, 0, 100, 200), (4, 0, 300, 400)]
    got = _overlaps(spark, rows, bucket_ms=1000)
    assert got == {(1, 0): 2, (2, 0): 2, (3, 0): 2, (4, 0): 0}


def test_overlap_pair_counted_once_across_shared_buckets(spark):
    # both intervals span many shared buckets with bucket_ms=10; the pair
    # must still count exactly once in each direction
    rows = [(1, 0, 0, 95), (2, 0, 5, 90)]
    got = _overlaps(spark, rows, bucket_ms=10)
    assert got == {(1, 0): 1, (2, 0): 1}


def test_overlap_bucket_size_invariance(spark):
    rows = [
        (1, 0, 0, 37), (2, 0, 15, 22), (3, 0, 36, 80),
        (4, 0, 81, 90), (5, 0, 0, 90), (6, 0, 91, 91),
    ]
    expected = _overlaps(spark, rows, bucket_ms=1_000_000)  # single bucket = brute force
    for w in (3, 7, 10, 50):
        assert _overlaps(spark, rows, bucket_ms=w) == expected, f"bucket_ms={w}"


def test_overlap_zero_length_point_interval(spark):
    rows = [(1, 0, 10, 10), (2, 0, 0, 20), (3, 0, 11, 30)]
    got = _overlaps(spark, rows, bucket_ms=8)
    assert got[(1, 0)] == 1  # the point 10 sits inside [0,20] only
    assert got[(2, 0)] == 2
    assert got[(3, 0)] == 1


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(eid, datetime.datetime(2024, 1, 1) + datetime.timedelta(milliseconds=ms), u, et)
         for (eid, ms, u, et) in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    ).withColumn("value", F.lit(1.0)).withColumn("props", F.lit("{}"))


def test_view_attribution_planted(spark):
    ev = _events_df(spark, [
        (1, 0, 1, "view"),
        (2, 5_000, 1, "click"),       # -> view 1
        (3, 6_000, 1, "view"),
        (4, 6_000, 1, "purchase"),    # same instant -> view 3 (inclusive)
        (5, 1_000, 2, "click"),       # user 2 never viewed -> sentinel
    ])
    got = {r.event_id: (r.view_event_id, r.latency_ms) for r in
           T.view_attribution(ev).collect()}
    assert got == {2: (1, 5_000), 4: (3, 0), 5: (-1, -1)}


def test_concurrent_sessions_planted(spark):
    # user 1: one session [0, 10min]; user 2: session [5min, 12min]
    # (overlaps user 1) then a gap >30min, session [60min, 61min] (alone)
    m = 60_000
    ev = _events_df(spark, [
        (1, 0, 1, "view"), (2, 10 * m, 1, "view"),
        (3, 5 * m, 2, "view"), (4, 12 * m, 2, "view"),
        (5, 60 * m, 2, "view"), (6, 61 * m, 2, "view"),
    ])
    got = {(r.user_id, r.session_idx): r.n_concurrent for r in
           T.concurrent_sessions(ev).collect()}
    assert got == {(1, 1): 1, (2, 1): 1, (2, 2): 0}


def test_overlap_negative_timestamps(spark):
    """Pre-1970 intervals: the positive bucket offset makes DIV a true
    floor, so counts stay exact when intervals straddle zero — the pinned
    truncate-vs-floor trap can't reach the bucket ids."""
    rows = [
        (1, 0, -100, -10), (2, 0, -50, 40), (3, 0, -9, -1),
        (4, 0, 0, 60), (5, 0, -200, -150),
    ]
    expected = _overlaps(spark, rows, bucket_ms=1_000_000)  # single bucket = brute
    assert expected == {(1, 0): 1, (2, 0): 3, (3, 0): 1, (4, 0): 1, (5, 0): 0}
    for w in (3, 7, 16, 64):
        assert _overlaps(spark, rows, bucket_ms=w) == expected, f"bucket_ms={w}"
