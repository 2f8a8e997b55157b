"""Custom stateful streaming operator: gap-based session windows.

Spark's built-in windowed aggregates cover tumbling/sliding windows
(streaming/bars.py); gap-based sessions need per-key custom state, so
this is the engine's ``applyInPandasWithState`` exemplar (SURVEY §2.3
row "UDF/UDAF surface"): state = the one open session per user;
arriving events extend it or close it (emitting the closed session)
when the idle gap exceeds the threshold.

Batch equivalence: ``operators/sessionize.py`` computes the same
sessions with window functions; the streaming run must emit exactly
the batch sessions except each user's final (still-open) one —
asserted in tests/test_streaming_sessions.py.

Scale notes: state is one tiny tuple per user (bounded by user
cardinality, not event volume); grouping shuffles once on user_id per
micro-batch. For production, add a timeout
(GroupStateTimeout.EventTimeTimeout + watermark) so idle users' open
sessions close and state is reclaimed; the no-timeout configuration
here keeps replay tests deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_MIN = 30

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# open session carried between micro-batches
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    ts_us = (pdf["ts"].astype("int64") // 1000).tolist()  # ns -> us
    values = pdf["value"].tolist()

    if state.exists:
        start_us, last_us, n_events, total_value = state.get
    else:
        start_us = last_us = None
        n_events, total_value = 0, 0.0

    closed: list[tuple] = []
    for t_us, v in zip(ts_us, values):
        if last_us is not None and t_us - last_us > _GAP_US:
            closed.append((start_us, last_us, n_events, total_value))
            start_us, n_events, total_value = t_us, 0, 0.0
        if start_us is None:
            start_us = t_us
        last_us = t_us
        n_events += 1
        total_value += v

    state.update((start_us, last_us, n_events, total_value))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                "n_events": [c[2] for c in closed],
                "total_value": [round(c[3], 2) for c in closed],
            }
        )


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """events (streaming, with ts/event_id/user_id/value) -> closed
    sessions, one row per session, emitted as they close."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
