"""Custom stateful streaming operator: event-time sessionization.

`applyInPandasWithState` is the escape hatch for stateful logic the
built-in windowed aggregates can't express — here, gap-based session
windows: consecutive events of a key belong to one session until a quiet
gap of `gap` seconds, at which point the closed session is emitted with
its stats.  State per key is O(1) (current session bounds + counter),
timeouts are event-time driven (watermark), so state stays bounded by
the number of concurrently-active keys — the property that matters at
10^9 users.

This is the Spark-idiomatic analogue shape for any custom stateful
operator the reference ecosystem would bolt onto a stream (session
rollups, rate trackers, dedup-with-TTL): group by key, fold Arrow
batches into a tiny state tuple, emit on watermark-driven timeout.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

SESSION_OUTPUT = StructType([
    StructField("key", StringType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

# state: (session_start_epoch_us, session_end_epoch_us, n_events)
_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
])


def sessionize(stream_df: DataFrame, key_col: str, ts_col: str,
               gap_seconds: int = 1800,
               watermark: str = "10 minutes") -> DataFrame:
    """Emit closed sessions (key, session_start, session_end, n_events).

    A session closes when the event-time watermark passes its end + gap
    (GroupStateTimeout.EventTimeTimeout) — no processing-time flakiness,
    deterministic under replay.
    """
    gap_us = int(gap_seconds) * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            closed.append((key[0], start_us, end_us, n))
            state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(
                    pdf[ts_col].astype("datetime64[us]").astype("int64"))
            ts_list.sort()
            if state.exists:
                start_us, end_us, n = state.get
            else:
                start_us, end_us, n = ts_list[0], ts_list[0], 0
            for t in ts_list:
                if t - end_us > gap_us:
                    closed.append((key[0], start_us, end_us, n))
                    start_us, end_us, n = t, t, 0
                end_us = max(end_us, t)
                n += 1
            state.update((start_us, end_us, n))
            # close when the watermark passes session_end + gap
            state.setTimeoutTimestamp(end_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "key": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="us"),
                    "session_end": pd.to_datetime(
                        [c[2] for c in closed], unit="us"),
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, SESSION_OUTPUT, _STATE, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
