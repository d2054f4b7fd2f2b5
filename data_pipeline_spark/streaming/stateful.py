"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only stateful stream is the harvest watermark, but the
engine's streaming surface (driver north star) needs arbitrary keyed state
— running per-entity aggregates, online dedupe sets, session accumulators.
This module provides the canonical shape: a per-key running aggregate with
event-count and value-sum state, timeout-free (state lives for the run;
add ``GroupStateTimeout.ProcessingTimeTimeout`` for eviction in long-lived
jobs). The handler is pure over (key, batch iterator, state) — Spark owns
the state store, checkpointing and recovery; at scale state is partitioned
by the grouping key like any shuffle.
"""

from __future__ import annotations

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(key, pdfs, state: GroupState):
    """Fold each micro-batch's rows for one user into running totals."""
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events_stream):
    """events stream (user_id, value, ...) -> updating per-user totals.

    Usage:
        q = (running_user_totals(stream)
             .writeStream.outputMode("update").format("memory")
             .queryName("totals").trigger(availableNow=True).start())
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE = "start timestamp, last timestamp, n bigint"
SESSION_GAP_MS = 30 * 60 * 1000


def _update_sessions(key, pdfs, state: GroupState):
    """Gap-based sessionization (r07's streaming twin): a session closes
    when the event-time watermark passes last_event + gap — Spark fires
    the timed-out state as its own invocation with an empty batch."""
    import pandas as pd

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [key[0]], "session_start": [start],
             "session_end": [last], "n_events": [n]}
        )
        return

    start, last, n = state.get if state.exists else (None, None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts = pd.to_datetime(pdf["ts"])
        lo, hi = ts.min(), ts.max()
        start = lo if start is None or lo < start else start
        last = hi if last is None or hi > last else last
        n += len(pdf)
    state.update((start, last, n))
    # the session stays open until the WATERMARK (not wall clock) passes
    # last + gap: late events inside the gap reopen nothing, they extend.
    # Clamp to just past the current watermark — a batch of late events
    # can put last+gap in the past, which Spark rejects; such a session
    # closes at the next watermark advance instead.
    due = int(last.timestamp() * 1000) + SESSION_GAP_MS
    state.setTimeoutTimestamp(max(due, state.getCurrentWatermarkMs() + 1))
    yield from ()


def streaming_sessions(events_stream, watermark: str = "10 minutes"):
    """events stream (user_id, ts, ...) -> CLOSED sessions only.

    The batch twin is r07_sessionization (window cumsum over the same
    30-minute gap rule); this form emits a session exactly once, when the
    event-time watermark guarantees no in-gap event can still arrive —
    the bounded-state form of sessionization at 100TB (state is one
    (start, last, n) triple per OPEN session, partitioned by user)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sessions,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
