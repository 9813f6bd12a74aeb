"""Custom stateful streaming operator: continuous sessionization via
``applyInPandasWithState``.

The batch twin is queries.q_sessionize (lag + running-sum windows);
that shape cannot run continuously because a late-arriving batch would
need to re-window the whole history. Here the per-user state is just
the open session (4 scalars), so the operator handles unbounded
streams with O(users) state — the canonical custom-stateful pattern
the reference (which has no streaming at all, SURVEY §2.5) could
never express.

Semantics: events for a user belong to one session while consecutive
gaps are <= gap_s seconds; a larger gap CLOSES the previous session
(emitted) and opens a new one. Open sessions stay in state across
micro-batches and are emitted only when closed — flush the tail by
sending a sentinel or closing the stream in tests.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Emitted once per CLOSED session.
SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)

#: Open-session state: epoch-micros timestamps + running aggregates.
STATE_SCHEMA = "start_us bigint, last_us bigint, n_events bigint, total_value double"


def _sessionize_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n_events, total_value = state.get
        else:
            start_us = last_us = None
            n_events, total_value = 0, 0.0

        closed: list[dict[str, Any]] = []
        events = pd.concat(list(pdfs))
        events = events.sort_values(["ts", "event_id"])
        for ts, value in zip(events["ts"], events["value"]):
            t_us = int(ts.value // 1_000)  # pandas ns -> us
            if last_us is not None and t_us - last_us > gap_us:
                closed.append(
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start_us * 1_000),
                        "session_end": pd.Timestamp(last_us * 1_000),
                        "n_events": n_events,
                        "total_value": total_value,
                    }
                )
                start_us, n_events, total_value = None, 0, 0.0
            if start_us is None:
                start_us = t_us
            n_events += 1
            total_value += float(value) if pd.notna(value) else 0.0
            last_us = t_us

        state.update((start_us, last_us, n_events, total_value))
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "total_value",
            ],
        )

    return fn


def stream_sessionize(events: DataFrame, *, gap_s: int = 1800) -> DataFrame:
    """events(user_id, event_id, ts, value) stream → closed-session
    stream. One state entry per user; emission is append-mode (a
    session appears exactly once, when a later event closes it)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
