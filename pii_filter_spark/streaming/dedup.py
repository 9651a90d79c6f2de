"""Custom stateful streaming operator: cross-batch exact dedup.

Structured Streaming's built-in dropDuplicates covers the common case;
this module is the applyInPandasWithState pattern for operators Spark
lacks — per-key state that survives across micro-batches (the shape a
streaming ingest of the image+caption table needs to suppress re-sent
rows after an upstream retry).

State model: one group per dedup key, state = "seen" marker. The first
micro-batch that delivers a key emits exactly one row for it; later
arrivals of the same key emit nothing. An optional processing-time
timeout bounds state size for unbounded key domains (at 10^12 scale you
always set it — state is per-key and lives on the executors).
"""

from __future__ import annotations

from typing import Any, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_distinct(
    df: DataFrame,
    key_col: str,
    timeout_ms: Optional[int] = None,
) -> DataFrame:
    """Keep the first-arriving row per key across ALL micro-batches.

    Works on a streaming DataFrame (grouped-map with state). Output
    schema == input schema. Deterministic pick inside one batch: the
    row with the smallest tuple of remaining column values.

    TTL semantics (timeout_ms set): suppress-while-active. EVERY arrival
    of a key — including suppressed duplicates — renews the timeout, so a
    key re-emits only after timeout_ms of complete silence. Without a
    timeout the first-emit guarantee is absolute but state grows with the
    key domain; with one, a row arriving after the silence window is
    emitted again by design (bounded state ↔ bounded memory of the past).
    """
    schema = df.schema
    other_cols = [f.name for f in schema.fields]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def dedup_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)  # renew TTL on every arrival
            return  # key already emitted in an earlier batch
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        first = batch.sort_values(by=other_cols, kind="mergesort").head(1)
        state.update((True,))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield first

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=schema,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=timeout,
        )
    )
