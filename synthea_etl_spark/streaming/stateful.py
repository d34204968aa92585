"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (beyond-reference surface — the reference
has no streaming at all, SURVEY §2.8; its Lambda barrier is external).

Two sessionizers exist in this engine:

- the BUILT-IN path (``F.session_window`` — see
  plans/streaming_batch.q52) — always prefer this when plain
  gap-session aggregation is enough; Catalyst handles state for free;
- THIS module, the template for session logic Spark can't express
  declaratively (per-session custom rollups, early emission rules,
  side outputs). It demonstrates the full custom-stateful contract:
  Arrow-batched state function, explicit state schema, event-time
  timeout wired to the watermark.

Scale design: state is one fixed-size row per open session per key
(three longs) — memory is O(active users), never O(events). Closed
sessions leave state immediately; watermark timeouts flush idle
sessions, so state cannot grow without bound. The shuffle is the same
single hash exchange on user_id a groupBy would need.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id string, session_start timestamp, session_end timestamp, "
    "n_events long"
)
# open-session state: epoch-second bounds + event count
STATE_SCHEMA = "start long, last long, n long"


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Append-mode stateful sessionization on a WATERMARKED streaming
    DataFrame with columns (user_id, ts, ...).

    A session closes (and emits) when a later event for the key
    arrives more than ``gap_seconds`` after it, or when the event-time
    watermark passes its timeout. Matches the batch q51 semantics:
    session bounds are min/max event ts, count is n_events."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def out(rows):
            return pd.DataFrame(
                {
                    "user_id": [key[0] for _ in rows],
                    "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in rows],
                    "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in rows],
                    "n_events": [n for _, _, n in rows],
                }
            )

        if state.hasTimedOut:
            closed = [state.get] if state.exists else []
            state.remove()
            if closed:
                yield out(closed)
            return

        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf["ts"].astype("int64") // 1_000_000_000)
        ts.sort()

        cur = list(state.get) if state.exists else None
        closed = []
        for t in ts:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > gap_seconds:
                closed.append(tuple(cur))
                cur = [t, t, 1]
            else:
                cur[1] = t
                cur[2] += 1
        if cur is not None:
            state.update(tuple(cur))
            # flush via watermark once the gap has provably elapsed
            state.setTimeoutTimestamp((cur[1] + gap_seconds) * 1000)
        if closed:
            yield out(closed)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
