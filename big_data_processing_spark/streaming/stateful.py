"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the engine's template for operators whose
state outlives a micro-batch (the pattern SURVEY §2.9 notes the
reference lacks entirely: its only 'state' was an in-memory buffer
keyed by Kafka end-markers, lost on every restart).

Semantics match the batch twin (`plans.catalog.events_sessionize`):
events within ``gap`` of the previous event for the same user belong
to one session. A session CLOSES when a later event arrives past the
gap; the open tail session lives in the state store (checkpointed,
exactly-once across restarts) until a closing event arrives.

Scale: state is partitioned by user_id — the same hash shuffle a batch
window would pay, but incremental per micro-batch; the state store
holds one small tuple per active user, not per event.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_seq int, start_us bigint, end_us bigint, "
    "n_events bigint, session_value double"
)
SESSION_STATE_SCHEMA = (
    "last_us bigint, session_seq int, start_us bigint, n_events bigint, "
    "session_value double"
)


def _sessionize_group(gap_us: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        if state.exists:
            last_us, seq, start_us, n, total = state.get
        else:
            last_us, seq, start_us, n, total = None, 0, None, 0, 0.0
        closed: list[tuple] = []
        for r in batch.itertuples():
            ts_us = int(pd.Timestamp(r.ts).value // 1_000)
            if last_us is None or ts_us - last_us > gap_us:
                if n > 0:
                    closed.append((user_id, seq, start_us, last_us, n, total))
                seq += 1
                start_us, n, total = ts_us, 0, 0.0
            n += 1
            total += float(r.value)
            last_us = ts_us
        state.update((last_us, seq, start_us, n, total))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_seq",
                    "start_us",
                    "end_us",
                    "n_events",
                    "session_value",
                ],
            )

    return fn


def streaming_sessionize(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """events(ts timestamp, user_id, event_id, value) → closed sessions.

    Feed a streaming DataFrame; the open session per user persists in
    checkpointed state across micro-batches AND query restarts."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group(gap_us),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
