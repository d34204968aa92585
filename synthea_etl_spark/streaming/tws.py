"""Stateful streaming on Spark 4's ``transformWithStateInPandas``:
per-key running totals with typed state handles.

This is the successor API to ``applyInPandasWithState`` (stateful.py):
instead of one opaque state tuple, the processor owns NAMED, TYPED
state primitives (ValueState / ListState / MapState) with optional
per-state TTL, and timers are first-class. We keep both operators —
stateful.py shows the classic contract, this module the idiomatic
Spark 4 form — because a migrating user will hold either.

The processor maintains one ValueState row (cnt, total) per key and
emits the updated running aggregate for every key seen in a batch —
the streaming twin of an incremental rollup (operators/incremental):
state is the mergeable partial aggregate, each micro-batch is the
delta. State is O(keys), flushed by TTL if configured; the shuffle is
the same single hash exchange on the key a groupBy would need.

Runtime prerequisite: pyspark's TWS implementation talks protobuf to a
dedicated driver-side Python worker; without the ``protobuf`` package
the query fails at initialization (tests/test_tws.py skips there).

The processor class is defined INSIDE the factory on purpose:
transformWithStateInPandas ships it to a dedicated driver-side Python
worker that does not share the launching process's sys.path, so a
module-level class (pickled by reference) fails to import there —
a function-local class is serialized by value instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id string, n_events long, total double"
_STATE_SCHEMA = "cnt long, total double"


def running_totals(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Update-mode running (count, sum(value)) per user_id over a
    streaming frame with columns (user_id, value, ...)."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", _STATE_SCHEMA, ttl_ms)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                cnt, total = self._state.get()
            else:
                cnt, total = 0, 0.0
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((cnt, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [cnt], "total": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalProcessor(),
        OUTPUT_SCHEMA,
        "Update",
        "ProcessingTime",
    )
