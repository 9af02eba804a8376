"""Custom stateful streaming operator: per-key sessionization with
``applyInPandasWithState`` (SURVEY §2.3 "UDF surface": the engine's
sanctioned custom-stateful extension point, the streaming analogue of the
reference's Transformation ABC).

Batch sessionization is a window function (`__spark_entry__.q_sessionize_
events`); on an unbounded stream the engine keeps per-user open-session
state across micro-batches and emits a row per CLOSED session, closing by
event-time gap or processing-time timeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long"
STATE_SCHEMA = "start long, last long, n long"


def _sessionize(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int = 1800,
):
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [user_id],
             "session_start": [pd.Timestamp(start, unit="s")],
             "session_end": [pd.Timestamp(last, unit="s")],
             "n_events": [n]}
        )
        return

    ts = sorted(
        int(t.timestamp())
        for pdf in pdfs
        for t in pd.to_datetime(pdf["ts"])
    )
    if not ts:
        return
    start, last, n = state.get if state.exists else (ts[0], ts[0], 0)
    closed = []
    for t in ts:
        # late events (t <= last) merge into the open session without moving
        # its boundaries backwards: a gap only exists when t is AHEAD of the
        # stored session end, and session_end must never regress (an
        # out-of-order arrival would otherwise shrink the window and falsely
        # split the session on the next in-order event).
        if t > last and t - last > gap_s:
            closed.append((start, last, n))
            start, n = t, 0
        start = min(start, t)
        last = max(last, t)
        n += 1
    state.update((start, last, n))
    state.setTimeoutDuration(gap_s * 1000)
    if closed:
        yield pd.DataFrame(
            {"user_id": [user_id] * len(closed),
             "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in closed],
             "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in closed],
             "n_events": [c for _, _, c in closed]}
        )


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events(user_id, ts, ...) stream -> closed sessions stream."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _sessionize(key, pdfs, state, gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
