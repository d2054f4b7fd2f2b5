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
