"""Custom stateful streaming operator: per-user session tracking with
applyInPandasWithState — the engine's demonstration of arbitrary stateful
logic on a stream (the pattern a streaming resolve-cell operator would use;
SURVEY.md §2.10 notes the reference is batch-only, this is the graft's
forward path).

State per user: (session_count, last_ts, current_session_events). A new
session opens when the gap since last_ts exceeds the timeout. Emits one row
per (user, closed-or-updated session) per micro-batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("session_id", T.LongType()),
    T.StructField("last_ts", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])


def track_sessions(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """events: streaming DF with (user_id long, ts timestamp). Returns the
    running (user_id, session_id, n_events) per micro-batch."""

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            session_id, last_ts, n_events = state.get
        else:
            session_id, last_ts, n_events = 0, float("-inf"), 0
        rows = []
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(pdf["ts"].astype("int64").to_numpy() / 1e9)
        for t in sorted(ts_all):
            if t - last_ts > gap_seconds:
                if n_events > 0:
                    rows.append((user_id, session_id, n_events))
                session_id += 1
                n_events = 0
            last_ts = t
            n_events += 1
        rows.append((user_id, session_id, n_events))
        state.update((int(session_id), float(last_ts), int(n_events)))
        yield pd.DataFrame(rows, columns=["user_id", "session_id", "n_events"])

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
