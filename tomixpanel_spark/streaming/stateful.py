"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the Structured Streaming shape the brief's
"custom stateful operators" point names).

Batch sessionization (operators.analytics.sessionize) answers the query
historically; this operator maintains LIVE per-user session state across
micro-batches: each user's group state holds (current_session_num,
last_seen_ms); events extend or roll the session, timed-out state emits a
final session summary row.

Scale shape: state is keyed by user_id — Spark hash-partitions state across
executors; each micro-batch shuffles only that batch's events to their
state partitions. State size is O(active users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MS = 1800 * 1000

OUTPUT_SCHEMA = (
    "user_id long, session_num long, n_events long, "
    "session_start_ms long, session_end_ms long, closed boolean"
)
STATE_SCHEMA = "session_num long, last_ms long, n_events long, start_ms long"


def sessionize_with_state(
    events: DataFrame,
    gap_ms: int = SESSION_GAP_MS,
    timeout: str = GroupStateTimeout.ProcessingTimeTimeout,
) -> DataFrame:
    """events (user_id, time_ms) stream -> live session summary rows.

    Streaming-only (applyInPandasWithState has no batch mode); tests drive
    it with an availableNow file stream. The batch answer to the same
    question is operators.analytics.sessionize.
    """
    from tomixpanel_spark.session import ship_package

    ship_package(events.sparkSession)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            session_num, last_ms, n_events, start_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_num": [session_num],
                    "n_events": [n_events],
                    "session_start_ms": [start_ms],
                    "session_end_ms": [last_ms],
                    "closed": [True],
                }
            )
            return

        times: list[int] = []
        for pdf in pdfs:
            # nullable longs arrive as float64 + NaN through Arrow; a null
            # event must not kill the streaming query
            times.extend(int(t) for t in pdf["time_ms"] if pd.notna(t))
        times.sort()
        if not times:
            return

        if state.exists:
            session_num, last_ms, n_events, start_ms = state.get
        else:
            session_num, last_ms, n_events, start_ms = 0, None, 0, None

        # parallel-list accumulation, ONE dict-of-lists DataFrame per
        # group: this function runs once per (user, trigger) — at ~1.5k
        # groups/trigger the list-of-dicts constructor alone cost ~230 ms
        # per trigger vs ~140 ms for dict-of-lists (measured), a real
        # slice of the applyInPandasWithState floor
        o_sess: list[int] = []
        o_n: list[int] = []
        o_start: list[Any] = []
        o_end: list[Any] = []
        o_closed: list[bool] = []

        for t in times:
            if last_ms is None or t - last_ms > gap_ms:
                if n_events:
                    o_sess.append(session_num)
                    o_n.append(n_events)
                    o_start.append(start_ms)
                    o_end.append(last_ms)
                    o_closed.append(True)
                session_num += 1
                start_ms, n_events = t, 0
            n_events += 1
            last_ms = t
        state.update((session_num, last_ms, n_events, start_ms))
        if timeout == GroupStateTimeout.ProcessingTimeTimeout:
            state.setTimeoutDuration(gap_ms)
        # emit the live (open) session snapshot
        o_sess.append(session_num)
        o_n.append(n_events)
        o_start.append(start_ms)
        o_end.append(last_ms)
        o_closed.append(False)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(o_sess),
                "session_num": o_sess,
                "n_events": o_n,
                "session_start_ms": o_start,
                "session_end_ms": o_end,
                "closed": o_closed,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
