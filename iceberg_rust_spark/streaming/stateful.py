"""Custom stateful streaming operators via applyInPandasWithState.

Beyond-reference surface (the reference has no streaming): the
arbitrary-state API is the Spark-native way to express operators Structured
Streaming lacks built-in — here, gap-based sessionization with explicit
per-key state and timeout-driven session closure. State is one small tuple
per active (user) key in the state store; emitted rows are CLOSED sessions
only, so the output stream is append-only and composes with the exactly-once
Iceberg sink (streaming/sink.py).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long")
STATE_SCHEMA = "start long, last long, n long"


def dedup_stream(events: DataFrame, keys: list, ts_col: str = "ts",
                 delay: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: keep the first row per key, with state bounded
    by the watermark (``dropDuplicatesWithinWatermark``) so the key store
    can't grow without bound — the streaming face of operators/dedup.py's
    batch exact_dedup, sized for an unbounded 100 TB ingest where an
    unbounded ``dropDuplicates`` state would eventually OOM the store."""
    return (events.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(keys))


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Streaming gap sessionization: one output row per CLOSED session.

    A session closes when a new event for the key arrives more than
    ``gap_seconds`` after the previous one (the in-batch + cross-batch gap
    rule), or when the key sees no data for ``gap_seconds`` processing time
    (state timeout -> flush). State per key: (start_us, last_us, n_events).
    """
    gap_us = gap_seconds * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, l, n = state.get
                closed.append((key[0], s, l, n))
                state.remove()
        else:
            ts_us = pd.concat([p[ts_col] for p in pdfs]) \
                .astype("datetime64[us]").astype("int64").sort_values()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = None, None, 0
            for t in ts_us:
                t = int(t)
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((key[0], start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            state.update((start, last, n))
            state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame({
                "user_id": [c[0] for c in closed],
                "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
                "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                "n_events": [c[3] for c in closed]})

    return (events.groupBy(user_col).applyInPandasWithState(
        fn, outputStructType=SESSION_SCHEMA, stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
