"""Streaming gap-sessionization: cross-batch state per user.

applyInPandasWithState keeps the OPEN session per user across
micro-batches: a batch's events merge into the open session when they
arrive within the gap, otherwise the open session is emitted closed and
a new one starts. Sessions are only emitted when CLOSED — by a
later-arriving event past the gap, or by the processing-time timeout
(idle user → flush). This is the streaming twin of
operators/sessions.sessionize; tests assert cross-batch continuity
against the batch result.

Assumes per-user in-order arrival within the stream (enforce upstream
with a watermark + sort within micro-batch if the source reorders).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = (
    "session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def sessionize_stream(
    df: DataFrame,
    gap_minutes: int = 30,
    flush_timeout_ms: int = 60_000,
) -> DataFrame:
    """flush_timeout_ms=0 disables the idle flush: open sessions then
    stay in state until a later event closes them (useful for finite
    availableNow runs, where a processing-time timeout would keep the
    query alive waiting for wall-clock timeouts to mature)."""
    gap_s = gap_minutes * 60

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, v = state.get
                closed.append((key[0], s0, s1, n, v))
            state.remove()
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=["user_id", "session_start", "session_end",
                             "n_events", "total_value"],
                )
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        if state.exists:
            s0, s1, n, v = state.get
        else:
            s0 = s1 = None
            n, v = 0, 0.0
        for row in batch.itertuples():
            ts = row.ts
            if s0 is None:
                s0, s1, n, v = ts, ts, 1, float(row.value)
            elif (ts - s1).total_seconds() > gap_s:
                closed.append((key[0], s0, s1, n, v))
                s0, s1, n, v = ts, ts, 1, float(row.value)
            else:
                s1 = ts
                n += 1
                v += float(row.value)
        state.update((s0, s1, n, v))
        if flush_timeout_ms:
            state.setTimeoutDuration(flush_timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end",
                         "n_events", "total_value"],
            )

    return (
        df.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                         if flush_timeout_ms else GroupStateTimeout.NoTimeout),
        )
    )
