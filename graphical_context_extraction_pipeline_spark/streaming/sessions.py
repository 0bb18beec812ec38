"""Streaming gap-based sessionization (applyInPandasWithState) — the
incremental twin of ``operators/events.sessionize``.

Semantics: identical to the batch operator — within each user's
(ts_ms, event_id) order, an event more than ``gap_ms`` after the previous
one opens a new session; session ordinals are 1-based per user. A session
row is emitted when the session CLOSES: either a later event opens the
next session (exact, matches batch), or the optional processing-time
``flush_timeout_ms`` fires for an idle user (early emit of the open
session). After a timeout flush the state keeps a CLOSED marker carrying
the ordinal, start, and count, so a straggler that still belongs to the
flushed session (event-time gap ≤ gap_ms) REOPENS it — the session is
re-emitted on its real close with the corrected totals, and consumers keep
the LAST row per (user_id, session_idx), which converges to exactly the
batch answer. Stragglers later than gap_ms start the next ordinal, again
matching batch.

State per user is five scalars — ordinal, start, last-seen, count, open —
regardless of session length, so 10^9 concurrent users cost ~40 bytes
each; with ``flush_timeout_ms`` set, idle users' state is dropped one
timeout after their session flushes.

Ordering contract: events must arrive per-user in event-time order across
micro-batches (an append-log ingest); within a micro-batch arrival order
is free (the operator sorts each group by (ts_ms, event_id)).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

SESSION_EVENTS_DDL = "user_id long, event_id long, ts_ms long, event_type string"
SESSIONS_OUT_DDL = (
    "user_id long, session_idx long, n_events long, start_ms long, "
    "end_ms long, duration_ms long"
)
SESSION_STATE_DDL = (
    "session_idx long, start_ms long, last_ms long, n_events long, open boolean"
)

_OUT_COLS = ["user_id", "session_idx", "n_events", "start_ms", "end_ms", "duration_ms"]


def _make_sessionizer(gap_ms: int, flush_timeout_ms: int | None):
    def _sessionize(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if getattr(state, "hasTimedOut", False):
            if state.exists:
                si, st, la, ne, is_open = state.get
                if is_open:
                    # early-flush the open session; keep a closed marker so
                    # a straggler within gap_ms reopens this ordinal
                    yield pd.DataFrame(
                        [(user_id, si, ne, st, la, la - st)], columns=_OUT_COLS
                    )
                    state.update((si, st, la, ne, False))
                    state.setTimeoutDuration(flush_timeout_ms)
                else:
                    state.remove()  # marker expired — user idle 2× timeout
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_ms", "event_id"], kind="mergesort")
        if state.exists:
            si, st, la, ne, is_open = state.get
        else:
            si, st, la, ne, is_open = 0, None, None, 0, False
        out = []
        for ts in rows["ts_ms"]:
            ts = int(ts)
            if is_open:
                if ts - la > gap_ms:
                    out.append((user_id, si, ne, st, la, la - st))
                    si, st, ne = si + 1, ts, 1
                else:
                    ne += 1
                la = ts
            elif la is not None and ts - la <= gap_ms:
                # straggler continuing a timeout-flushed session: reopen it
                is_open, ne, la = True, ne + 1, ts
            else:
                si, st, la, ne, is_open = si + 1, ts, ts, 1, True
        state.update((si, st, la, ne, is_open))
        if flush_timeout_ms is not None:
            state.setTimeoutDuration(flush_timeout_ms)
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    return _sessionize


def stream_sessionize(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_ms: int = 30 * 60 * 1000,
    max_files_per_trigger: int = 1,
    flush_timeout_ms: int | None = None,
):
    """User-event file stream → stateful sessionization → sessions parquet.

    Input files carry ``SESSION_EVENTS_DDL`` rows (stage with
    ``events_to_stream_rows``); output is ``SESSIONS_OUT_DDL`` in append
    mode — one row per closed session (plus refined re-emissions after
    timeout flushes; keep the last row per (user_id, session_idx))."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(SESSION_EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_ms, flush_timeout_ms),
        outputStructType=SESSIONS_OUT_DDL,
        stateStructType=SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if flush_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def events_to_stream_rows(events_df):
    """Batch helper: project the events table into the streaming input
    shape (epoch ms via the same NTZ-safe expression the batch operator
    uses)."""
    from pyspark.sql import functions as F

    from ..operators.events import _TS_MS

    return events_df.select(
        "user_id", "event_id", F.expr(_TS_MS).alias("ts_ms"), "event_type"
    )
