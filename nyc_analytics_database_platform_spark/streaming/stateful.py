"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windows (streaming/windows.py) cover time-bucketed state; this
is the escape hatch for arbitrary per-key state machines. The demo operator
maintains running per-user counters (event count, value sum, last seen
timestamp) across micro-batches - state the engine persists in the state
store, surviving batch boundaries and restarts via the checkpoint.

Scale: state is partitioned by the grouping key across executors; each
micro-batch touches only the keys present in that batch. A production
variant adds GroupStateTimeout to expire idle keys and bound the store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_last = int(pdf["ts"].astype("int64").max()) // 1000  # ns -> us
        last = max(last, batch_last)
    state.update((n, total, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [total], "last_ts_us": [last]}
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Per-user running totals emitted each micro-batch the user appears in.
    Works only on streaming frames (state requires the streaming engine)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
