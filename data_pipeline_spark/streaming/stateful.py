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


def _epoch_ms(ts) -> int:
    """Naive timestamp -> epoch ms, wall-clock-as-UTC on BOTH the pandas
    and datetime.datetime paths.  datetime.timestamp() would interpret a
    naive value in the OS-local zone, shifting session closes by the
    machine's UTC offset on non-UTC hosts; pd.Timestamp(...).value is
    offset-free for both input types."""
    import pandas as pd

    return int(pd.Timestamp(ts).value // 1_000_000)


def _update_sessions(key, pdfs, state: GroupState):
    """Gap-based sessionization (r07's streaming twin): events sorted by
    time split wherever the gap exceeds SESSION_GAP_MS — every session
    closed by an in-batch split (or by a new event beyond the open
    session's gap) emits immediately; the still-open tail session emits
    when the event-time watermark passes last + gap (Spark fires the
    timed-out state as its own invocation with an empty batch)."""
    import pandas as pd

    def row(start, last, n):
        return pd.DataFrame(
            {"user_id": [key[0]], "session_start": [start],
             "session_end": [last], "n_events": [n]}
        )

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield row(start, last, n)
        return

    start, last, n = state.get if state.exists else (None, None, 0)
    times = [pd.to_datetime(pdf["ts"]).sort_values() for pdf in pdfs if len(pdf)]
    all_ts = pd.concat(times).sort_values() if times else pd.Series([], dtype="datetime64[ns]")
    for ts in all_ts:
        if last is not None and _epoch_ms(ts) - _epoch_ms(last) > SESSION_GAP_MS:
            # gap exceeded WITHIN the data: the open session is closed by
            # this very event, no watermark needed (r07's split rule)
            yield row(start, last, n)
            start, last, n = ts, ts, 1
        else:
            # a late in-gap event may precede the open session's start
            start = ts if start is None or ts < start else start
            last = ts if last is None or ts > last else last
            n += 1
    if last is None:
        return  # invoked with neither data nor timeout — nothing to track
    state.update((start, last, n))
    # the open tail session survives until the WATERMARK (not wall clock)
    # passes last + gap.  Clamp to just past the current watermark — a
    # batch of late events can put last+gap in the past, which Spark
    # rejects; such a session closes at the next watermark advance.
    due = _epoch_ms(last) + SESSION_GAP_MS
    state.setTimeoutTimestamp(max(due, state.getCurrentWatermarkMs() + 1))


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
