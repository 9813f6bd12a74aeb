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


#: Emitted once per (user, completed funnel stage).
FUNNEL_SCHEMA = "user_id bigint, stage_order int, stage_ts timestamp"

#: Funnel progress per user: epoch-micros of each completed stage
#: (NULL = not reached). Once stage 3 lands the machine is terminal.
FUNNEL_STATE_SCHEMA = "t0_us bigint, t1_us bigint, t2_us bigint"

#: Ordered funnel steps; must match queries.q_funnel_conversion.
_FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_fn(window_s: int):
    window_us = window_s * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        t0_us, t1_us, t2_us = state.get if state.exists else (None, None, None)

        emitted: list[dict[str, Any]] = []
        events = pd.concat(list(pdfs))
        events = events.sort_values(["ts", "event_id"])
        for ts, etype in zip(events["ts"], events["event_type"]):
            if t2_us is not None:
                break  # terminal: the user completed the funnel
            t_us = int(ts.value // 1_000)  # pandas ns -> us
            if etype == _FUNNEL_STEPS[0] and t0_us is None:
                t0_us = t_us
                emitted.append({"user_id": user_id, "stage_order": 1,
                                "stage_ts": pd.Timestamp(t_us * 1_000)})
            elif (
                etype == _FUNNEL_STEPS[1]
                and t1_us is None
                and t0_us is not None
                and t0_us < t_us <= t0_us + window_us
            ):
                t1_us = t_us
                emitted.append({"user_id": user_id, "stage_order": 2,
                                "stage_ts": pd.Timestamp(t_us * 1_000)})
            elif (
                etype == _FUNNEL_STEPS[2]
                and t2_us is None
                and t1_us is not None
                and t1_us < t_us <= t1_us + window_us
            ):
                t2_us = t_us
                emitted.append({"user_id": user_id, "stage_order": 3,
                                "stage_ts": pd.Timestamp(t_us * 1_000)})

        state.update((t0_us, t1_us, t2_us))
        yield pd.DataFrame(
            emitted, columns=["user_id", "stage_order", "stage_ts"]
        )

    return fn


def stream_funnel(events: DataFrame, *, window_s: int = 86_400) -> DataFrame:
    """events(user_id, event_id, ts, event_type) stream → stage-
    completion stream for the ordered view→click→purchase funnel with
    a ``window_s`` conversion window per step (the batch twin is
    queries.q_funnel_conversion's three chained min-aggregates).

    Per-user state is THREE nullable epoch-micros scalars — O(users)
    regardless of stream length, and strictly less than sessionize's
    (no running aggregates). Unlike sessionize there is NO tail to
    flush: a stage completion is known the moment its event arrives,
    so rows emit immediately in append mode and a sentinel is never
    needed. In ts-order feeds (micro-batch sort + ordered files) the
    first qualifying event the machine sees IS the batch twin's
    min(ts) for that stage, which is what makes the stream and batch
    doors share one oracle."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(window_s),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
