"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (SURVEY.md §2.8 — the Spark-native form of a
custom stateful operator; the batch twin is operators/windows.sessionize).

State per user: (last event epoch, current session index, events in
session). A 30-min gap closes the session. Emits one row per closed
session — closed either by a later event from the same user, or by the
EVENT-TIME timer: when the watermark passes a session's end + gap, the
open session is flushed downstream and the user's state slot is removed.
That timer is the piece that bounds memory on an unbounded stream: state
tracks users active within the watermark horizon, not all users ever
seen, and being event-time-driven it is deterministic for a given input
(no wall clock). (``ProcessingTimeTimeout`` deadlocks the Python worker
protocol in PySpark 4.1.2 local mode — the event-time form is both the
working and the semantically better choice. The newer
``transformWithStateInPandas`` API (Spark 4.0 arbitrary-state v2,
RocksDB-backed) was evaluated for this operator and crashes its
dedicated Python driver worker in the same local-mode environment
("TransformWithStateInPySpark driver worker exited unexpectedly"), so
``applyInPandasWithState`` remains the declared custom-stateful
surface here; on a real cluster the v2 API is the drop-in upgrade —
same per-key Arrow-batch contract plus state TTL and multiple typed
state variables.)
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

#: late-data allowance; also sets how far the watermark trails the newest
#: event, i.e. how long an idle user's open session lingers in state
WATERMARK_DELAY = "30 minutes"

OUTPUT_SCHEMA = "user_id long, session_id long, n_events long, start_s long, end_s long"
STATE_SCHEMA = "last_s long, session_id long, n_events long, start_s long"

_COLUMNS = ["user_id", "session_id", "n_events", "start_s", "end_s"]


def _gather(pdfs):
    """Concatenate ALL of a group's Arrow chunks for this micro-batch
    before sorting. The grouping sort orders rows by KEY only — a group's
    rows reach the kernel in shuffle-fetch order, split across chunks at
    arbitrary points, so sorting each chunk independently replays the
    recurrence in a nondeterministic interleaving (caught by the sf1
    oracle sweep: 937 divergent bin-pack rows across 107 customers whose
    rows spanned chunk boundaries). One concat + one sort restores the
    within-batch total order the recurrences are defined over; the
    cross-batch contract is unchanged (state carries)."""
    chunks = list(pdfs)
    if not chunks:
        return None
    if len(chunks) == 1:
        return chunks[0]
    return pd.concat(chunks, ignore_index=True)


def sessionize_with_state(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key

    if state.hasTimedOut:
        # Watermark passed last_s + gap: flush the open session, reclaim
        # the state slot.
        last_s, session_id, n_events, start_s = state.get
        state.remove()
        rows = (
            [(user_id, session_id, n_events, start_s, last_s)] if n_events > 0 else []
        )
        yield pd.DataFrame(rows, columns=_COLUMNS)
        return

    if state.exists:
        last_s, session_id, n_events, start_s = state.get
    else:
        last_s, session_id, n_events, start_s = -(10**18), 0, 0, 0

    out: list[tuple[int, int, int, int, int]] = []
    block = _gather(pdfs)
    if block is not None:
        for ts in sorted(int(t) for t in block["ts_s"]):
            if ts - last_s > SESSION_GAP_S:
                if n_events > 0:
                    out.append((user_id, session_id, n_events, start_s, last_s))
                    session_id += 1
                n_events, start_s = 0, ts
            n_events += 1
            last_s = ts
    state.update((last_s, session_id, n_events, start_s))
    # Event-time timer at session end + gap (must sit strictly above the
    # current watermark, which may already have passed the target).
    target_ms = (last_s + SESSION_GAP_S) * 1000
    state.setTimeoutTimestamp(max(target_ms, state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(out, columns=_COLUMNS)


def apply_sessionization(
    events_with_epoch: DataFrame, delay: str = WATERMARK_DELAY
) -> DataFrame:
    """events_with_epoch: streaming frame with (user_id long, ts_s long)."""
    ev = events_with_epoch.withColumn(
        "ts", F.timestamp_seconds("ts_s")
    ).withWatermark("ts", delay)
    return ev.groupBy("user_id").applyInPandasWithState(
        sessionize_with_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- X287: streaming hysteresis (Schmitt-trigger) alerting ---------------

HYST_OUTPUT_SCHEMA = (
    "user_id long, event_id long, sec long, value double, alert int"
)
HYST_STATE_SCHEMA = "alert int"
_HYST_COLUMNS = ["user_id", "event_id", "sec", "value", "alert"]


def hysteresis_with_state(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user Schmitt-trigger recurrence with the alert BIT as the only
    state — the minimal custom stateful operator: raise > HYST_HI,
    clear < HYST_LO, hold in between (state carries holds across
    micro-batches). Emits every event with its alert flag; one int of
    state per user, no timers (the alert is meaningful forever, unlike
    a session window — eviction would CHANGE semantics, not save
    memory, so none is declared)."""
    from ..operators.grouped import HYST_HI, HYST_LO

    (user_id,) = key
    alert = state.get[0] if state.exists else 0
    out: list[tuple[int, int, int, float, int]] = []
    block = _gather(pdfs)
    if block is not None:
        block = block.sort_values(["sec", "event_id"])
        for _, row in block.iterrows():
            v = float(row["value"])
            if v > HYST_HI:
                alert = 1
            elif v < HYST_LO:
                alert = 0
            out.append(
                (user_id, int(row["event_id"]), int(row["sec"]), v, alert)
            )
    state.update((alert,))
    yield pd.DataFrame(out, columns=_HYST_COLUMNS)


def apply_hysteresis(events_with_epoch: DataFrame) -> DataFrame:
    """events_with_epoch: streaming frame with
    (user_id long, event_id long, sec long, value double)."""
    ev = events_with_epoch.withColumn(
        "ts", F.timestamp_seconds("sec")
    ).withWatermark("ts", WATERMARK_DELAY)
    return ev.groupBy("user_id").applyInPandasWithState(
        hysteresis_with_state,
        outputStructType=HYST_OUTPUT_SCHEMA,
        stateStructType=HYST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TB_COLUMNS = ["user_id", "event_id", "sec", "allowed", "tokens_after"]

TB_OUTPUT_SCHEMA = (
    "user_id long, event_id long, sec long, allowed int, tokens_after long"
)
TB_STATE_SCHEMA = "tokens long, tick long"


def token_bucket_with_state(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user token-bucket admission control with (tokens, last tick)
    as the state struct — the rate-limit shape gateways deploy. Refill
    accrues on absolute tick boundaries (integer arithmetic only), so
    state carried across micro-batches reproduces the batch recurrence
    exactly; like hysteresis, every event emits one row and the state
    is meaningful forever — no timers declared."""
    from ..operators.grouped import TB_CAP, TB_REFILL_S

    (user_id,) = key
    if state.exists:
        tokens, prev_tick = state.get
        first = False
    else:
        tokens, prev_tick, first = TB_CAP, 0, True
    out: list[tuple[int, int, int, int, int]] = []
    block = _gather(pdfs)
    if block is not None:
        block = block.sort_values(["sec", "event_id"])
        for _, row in block.iterrows():
            sec = int(row["sec"])
            tick = sec // TB_REFILL_S
            if first:
                prev_tick = tick
                first = False
            tokens = min(TB_CAP, tokens + (tick - prev_tick))
            prev_tick = tick
            allowed = 1 if tokens >= 1 else 0
            tokens -= allowed
            out.append(
                (user_id, int(row["event_id"]), sec, allowed, tokens)
            )
    state.update((tokens, prev_tick))
    yield pd.DataFrame(out, columns=_TB_COLUMNS)


def apply_token_bucket(events_with_epoch: DataFrame) -> DataFrame:
    """events_with_epoch: streaming frame with
    (user_id long, event_id long, sec long)."""
    ev = events_with_epoch.withColumn(
        "ts", F.timestamp_seconds("sec")
    ).withWatermark("ts", WATERMARK_DELAY)
    return ev.groupBy("user_id").applyInPandasWithState(
        token_bucket_with_state,
        outputStructType=TB_OUTPUT_SCHEMA,
        stateStructType=TB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_BP_COLUMNS = ["custkey", "orderkey", "day", "size", "bin_idx", "rem_after"]

BP_OUTPUT_SCHEMA = (
    "custkey long, orderkey long, day long, size long, "
    "bin_idx long, rem_after long"
)
BP_STATE_SCHEMA = "bin_idx long, rem long"


def bin_pack_with_state(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-customer NEXT-FIT packing with (open bin index, remaining
    space) as the state struct — the consolidation service shape: the
    open container persists across micro-batches, so a shipment stream
    packs identically whether it arrived in one batch or many. Integer
    state only; initial state (bin 1, CAP remaining) makes the first
    item follow the same fits/overflows rule as every later one, so
    the drained output IS the batch recurrence."""
    from ..operators.grouped import BP_CAP

    (custkey,) = key
    if state.exists:
        bin_idx, rem = state.get
    else:
        bin_idx, rem = 1, BP_CAP
    out: list[tuple[int, int, int, int, int, int]] = []
    block = _gather(pdfs)
    if block is not None:
        block = block.sort_values(["day", "orderkey"])
        for _, row in block.iterrows():
            size = int(row["size"])
            if size <= rem:
                rem -= size
            else:
                bin_idx += 1
                rem = BP_CAP - size
            out.append(
                (
                    custkey,
                    int(row["orderkey"]),
                    int(row["day"]),
                    size,
                    bin_idx,
                    rem,
                )
            )
    state.update((bin_idx, rem))
    yield pd.DataFrame(out, columns=_BP_COLUMNS)


def apply_bin_pack(items: DataFrame) -> DataFrame:
    """items: streaming frame with (custkey long, orderkey long,
    day long, size long)."""
    it = items.withColumn(
        "ts", F.timestamp_seconds(F.col("day") * 86400)
    ).withWatermark("ts", WATERMARK_DELAY)
    return it.groupBy("custkey").applyInPandasWithState(
        bin_pack_with_state,
        outputStructType=BP_OUTPUT_SCHEMA,
        stateStructType=BP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_QL_COLUMNS = ["nation", "orderkey", "arr_s", "svc_s", "wait_s", "depart_s"]

QL_OUTPUT_SCHEMA = (
    "nation long, orderkey long, arr_s long, svc_s long, "
    "wait_s long, depart_s long"
)
QL_STATE_SCHEMA = "wait_s long, arr_s long, svc_s long"


def lindley_with_state(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-server Lindley recursion with (last wait, last arrival, last
    service) as the state struct — a live backlog monitor: the queue
    carries across micro-batches, so the reported delay of the next
    arrival is exact however the stream was chopped. Integer seconds
    only; drained output equals the batch recurrence."""
    (nation,) = key
    if state.exists:
        w, pa, ps = state.get
        first = False
    else:
        w, pa, ps, first = 0, 0, 0, True
    out: list[tuple[int, int, int, int, int, int]] = []
    block = _gather(pdfs)
    if block is not None:
        block = block.sort_values(["arr_s", "orderkey"])
        for _, row in block.iterrows():
            a, s = int(row["arr_s"]), int(row["svc_s"])
            if first:
                w = 0
                first = False
            else:
                w = max(0, w + ps - (a - pa))
            pa, ps = a, s
            out.append((nation, int(row["orderkey"]), a, s, w, a + w + s))
    state.update((w, pa, ps))
    yield pd.DataFrame(out, columns=_QL_COLUMNS)


def apply_lindley(items: DataFrame) -> DataFrame:
    """items: streaming frame with (nation long, orderkey long,
    arr_s long, svc_s long)."""
    it = items.withColumn(
        "ts", F.timestamp_seconds(F.col("arr_s"))
    ).withWatermark("ts", WATERMARK_DELAY)
    return it.groupBy("nation").applyInPandasWithState(
        lindley_with_state,
        outputStructType=QL_OUTPUT_SCHEMA,
        stateStructType=QL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SO_OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, start_s long, "
    "end_s long, has_click int, has_purchase int"
)
SO_STATE_SCHEMA = (
    "last_s long, session_id long, n_events long, start_s long, "
    "has_click int, has_purchase int"
)
_SO_COLUMNS = [
    "user_id", "session_id", "n_events", "start_s", "end_s",
    "has_click", "has_purchase",
]


def sessionize_outcomes_with_state(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Sessionization carrying per-session OUTCOME flags (click intent,
    purchase conversion) in state — the cart-abandonment deployment of
    the sessionize kernel: same gap/timer mechanics, two extra ints of
    state."""
    (user_id,) = key

    if state.hasTimedOut:
        last_s, session_id, n_events, start_s, hc, hp = state.get
        state.remove()
        rows = (
            [(user_id, session_id, n_events, start_s, last_s, hc, hp)]
            if n_events > 0
            else []
        )
        yield pd.DataFrame(rows, columns=_SO_COLUMNS)
        return

    if state.exists:
        last_s, session_id, n_events, start_s, hc, hp = state.get
    else:
        last_s, session_id, n_events, start_s, hc, hp = (
            -(10**18), 0, 0, 0, 0, 0,
        )

    out: list[tuple[int, int, int, int, int, int, int]] = []
    block = _gather(pdfs)
    if block is not None:
        recs = sorted(
            zip(
                (int(t) for t in block["ts_s"]),
                block["event_type"],
            )
        )
        for ts, etype in recs:
            if ts - last_s > SESSION_GAP_S:
                if n_events > 0:
                    out.append(
                        (user_id, session_id, n_events, start_s, last_s,
                         hc, hp)
                    )
                    session_id += 1
                n_events, start_s, hc, hp = 0, ts, 0, 0
            n_events += 1
            last_s = ts
            if etype == "click":
                hc = 1
            elif etype == "purchase":
                hp = 1
    state.update((last_s, session_id, n_events, start_s, hc, hp))
    target_ms = (last_s + SESSION_GAP_S) * 1000
    state.setTimeoutTimestamp(
        max(target_ms, state.getCurrentWatermarkMs() + 1)
    )
    yield pd.DataFrame(out, columns=_SO_COLUMNS)


def apply_sessionization_outcomes(
    events_with_epoch: DataFrame, delay: str = WATERMARK_DELAY
) -> DataFrame:
    """events_with_epoch: streaming frame with (user_id long, ts_s long,
    event_type string)."""
    ev = events_with_epoch.withColumn(
        "ts", F.timestamp_seconds("ts_s")
    ).withWatermark("ts", delay)
    return ev.groupBy("user_id").applyInPandasWithState(
        sessionize_outcomes_with_state,
        outputStructType=SO_OUTPUT_SCHEMA,
        stateStructType=SO_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
