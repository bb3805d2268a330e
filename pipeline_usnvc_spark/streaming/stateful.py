"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch form (plans/events_queries.q40) is a window+lag cumsum; the
streaming form keeps one small state row per user (open session:
start, last-seen, count, index) and emits a session as soon as a gap
closes it. State is per-key and O(1), so the operator scales with
distinct users, not events — the watermark/timeout story for truly
unbounded streams plugs into the same hook (GroupStateTimeout).

Sessions still open when the stream drains stay in state (exactly
what a real pipeline wants); the test closes the loop by checking
emitted sessions equal the batch result minus each user's final
(still-open) session.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_idx bigint, n_events bigint, "
    "session_start timestamp, session_end timestamp"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, sid bigint"

_GAP_US = 1800 * 1_000_000


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    ts_us = (rows["ts"].astype("int64") // 1000).tolist()  # ns → µs

    if state.exists:
        start_us, last_us, n, sid = state.get
    else:
        start_us = last_us = None
        n = 0
        sid = 0

    closed = []
    for t in ts_us:
        if last_us is None:
            sid += 1
            start_us, last_us, n = t, t, 1
        elif t - last_us > _GAP_US:
            closed.append((user_id, sid, n, start_us, last_us))
            sid += 1
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1

    state.update((start_us, last_us, n, sid))
    out = pd.DataFrame(
        closed, columns=["user_id", "session_idx", "n_events", "_start_us", "_end_us"]
    )
    out["session_start"] = pd.to_datetime(out["_start_us"], unit="us")
    out["session_end"] = pd.to_datetime(out["_end_us"], unit="us")
    yield out[["user_id", "session_idx", "n_events", "session_start", "session_end"]]


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """events stream → closed-session stream (append mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
