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
# ALL not-yet-finalized sessions for the key (parallel arrays, sorted by
# start): a session closed by an in-batch gap split is NOT final until the
# watermark passes its end + gap — with watermark delay < gap, a late
# in-gap event can still arrive and must merge into the session it belongs
# to (or bridge two of them) instead of corrupting the newest open one.
SESSION_STATE = "starts array<timestamp>, lasts array<timestamp>, ns array<bigint>"
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
    """Gap-based sessionization (r07's streaming twin): a session is the
    maximal run of events with no inter-event gap above SESSION_GAP_MS.

    Every session — including ones closed by an in-batch gap split — is
    held in state and emitted ONLY once the event-time watermark passes
    its end + gap.  Until then a late in-gap event (admissible whenever
    watermark delay < gap) merges into whichever pending session's
    [start - gap, last + gap] interval it falls in, and an event bridging
    two pending sessions coalesces them — exactly the sessions the batch
    twin computes over the complete sorted event sequence.  Spark drops
    events older than the watermark before the handler runs, so a session
    with last + gap <= watermark can no longer change: emission at that
    point is exactly-once and final."""
    import pandas as pd

    def row(start, last, n):
        return pd.DataFrame(
            {"user_id": [key[0]], "session_start": [start],
             "session_end": [last], "n_events": [n]}
        )

    sessions: list[list] = []
    if state.exists:
        starts, lasts, ns = state.get
        sessions = [[pd.Timestamp(s), pd.Timestamp(e), int(n)]
                    for s, e, n in zip(starts, lasts, ns)]

    if not state.hasTimedOut:
        times = [pd.to_datetime(pdf["ts"]).sort_values() for pdf in pdfs if len(pdf)]
        all_ts = (
            pd.concat(times).sort_values()
            if times else pd.Series([], dtype="datetime64[ns]")
        )
        for ts in all_ts:
            t = _epoch_ms(ts)
            hit = None
            for s in sessions:
                if (_epoch_ms(s[0]) - SESSION_GAP_MS <= t
                        <= _epoch_ms(s[1]) + SESSION_GAP_MS):
                    hit = s
                    break
            if hit is None:
                sessions.append([ts, ts, 1])
            else:
                hit[0] = min(hit[0], ts)
                hit[1] = max(hit[1], ts)
                hit[2] += 1
            # the event may have bridged two sessions into gap range —
            # coalesce neighbours (list stays tiny: open sessions per key)
            sessions.sort(key=lambda s: s[0])
            merged: list[list] = []
            for s in sessions:
                if merged and _epoch_ms(s[0]) - _epoch_ms(merged[-1][1]) <= SESSION_GAP_MS:
                    merged[-1][1] = max(merged[-1][1], s[1])
                    merged[-1][0] = min(merged[-1][0], s[0])
                    merged[-1][2] += s[2]
                else:
                    merged.append(s)
            sessions = merged

    wm = state.getCurrentWatermarkMs()
    live = []
    for s in sessions:
        # STRICTLY below the watermark: an admissible event may arrive
        # with ts == wm, and ts - last == gap exactly is IN-session for
        # the batch twin (split only when gap EXCEEDS the threshold), so
        # end + gap == wm is not final yet
        if _epoch_ms(s[1]) + SESSION_GAP_MS < wm:
            yield row(*s)  # finalized: no admissible event can reach it
        else:
            live.append(s)
    if not live:
        if state.exists:
            state.remove()
        return
    state.update((
        [s[0] for s in live], [s[1] for s in live], [s[2] for s in live],
    ))
    # wake when the earliest pending session becomes final.  Clamp to just
    # past the current watermark — late events can put end+gap in the
    # past, which Spark rejects; such sessions close at the next advance.
    due = min(_epoch_ms(s[1]) for s in live) + SESSION_GAP_MS
    state.setTimeoutTimestamp(max(due, wm + 1))


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
