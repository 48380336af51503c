"""Custom stateful streaming operators: gap-based sessionization, in TWO
strategies (the ``asof.py`` two-strategy precedent):

* ``sessionize_session_window`` — the SERVING strategy: pure-JVM
  ``session_window`` aggregation. No python workers in the trigger loop;
  state lives in the JVM state store, rows cross no Arrow boundary. The
  measured host floor is ~0.35 s/trigger vs ~0.78 s/trigger for the
  python state channel, so this is the path a latency-sensitive pipeline
  runs. Append mode: each session emits EXACTLY ONCE, when the watermark
  passes its close — bounded replays need a far-future sentinel row to
  flush the final sessions (streaming_parity's windowed precedent).
* ``sessionize_with_state`` — the flexible-logic LIBRARY path:
  ``applyInPandasWithState`` (the Structured Streaming shape the brief's
  "custom stateful operators" point names). Emits live OPEN-session
  snapshots each trigger and supports arbitrary per-group logic
  (timeout-driven eviction, custom emission) that a declarative
  aggregation can't express.

Both implement the same gap rule (a new session starts when
``t - last > gap_ms``, strictly greater — the DuckDB-oracle semantics);
``tests/test_windowed.py`` asserts their final sessions row-equal.

Batch sessionization (operators.analytics.sessionize) answers the query
historically; these operators maintain LIVE per-user session state across
micro-batches.

Scale shape: state is keyed by user_id — Spark hash-partitions state across
executors; each micro-batch shuffles only that batch's events to their
state partitions. State size is O(active users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MS = 1800 * 1000

OUTPUT_SCHEMA = (
    "user_id long, session_num long, n_events long, "
    "session_start_ms long, session_end_ms long, closed boolean"
)
STATE_SCHEMA = "session_num long, last_ms long, n_events long, start_ms long"


def sessionize_session_window(
    events: DataFrame,
    gap_ms: int = SESSION_GAP_MS,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """events (user_id, time_ms) stream -> one row per CLOSED session:
    (user_id, n_events, session_start_ms, session_end_ms).

    Pure-JVM serving strategy: ``session_window`` keeps the whole
    trigger loop inside Tungsten/state-store code — no python workers,
    no Arrow transfer. Works in batch too (session_window is a regular
    grouping expression there), which the strategies-agree test uses.

    Gap semantics: the library path starts a new session when
    ``t - last > gap_ms`` (STRICTLY greater — equal-to-gap extends the
    session, matching the SQL lag-gap oracle). ``session_window`` merges
    TOUCHING windows (measured on this Spark: two events exactly
    ``gap`` apart with ``gap`` as the window gap land in ONE session;
    ``gap+1`` apart in two), i.e. merge iff ``t - last <= gap`` — the
    library rule verbatim, so the gap passes through unchanged. The
    strategies-agree test pins both boundary deltas.

    Append-mode emission: a session emits exactly once, when the
    watermark passes ``last_event + gap + 1ms``. On a bounded replay the
    watermark stops at the last real event, so callers must append a
    far-future sentinel row (> max real ts + gap) and filter its
    session out of the sink — the streaming_parity windowed precedent.

    Null event times are dropped (the library path skips them; the
    oracle's epoch_ms(ts) never yields one from a non-null row)."""
    out = (
        events.filter(F.col("time_ms").isNotNull())
        .withColumn("__ts", F.timestamp_millis(F.col("time_ms")))
        .withWatermark("__ts", watermark_delay)
        .groupBy(
            F.col("user_id"),
            F.session_window("__ts", f"{gap_ms} milliseconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("time_ms").alias("session_start_ms"),
            F.max("time_ms").alias("session_end_ms"),
        )
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("session_start_ms").cast("long").alias("session_start_ms"),
        F.col("session_end_ms").cast("long").alias("session_end_ms"),
    )


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
