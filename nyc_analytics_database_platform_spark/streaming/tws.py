"""Custom stateful streaming via the Spark 4 transformWithState API
(transformWithStateInPandas): the successor to applyInPandasWithState
(streaming/stateful.py keeps that surface) with typed, composable state
primitives (ValueState/ListState/MapState), per-state TTL, and timers.

Demo operator: per-user high-water-mark detector - emits a row only on the
micro-batches where a user's running maximum value is broken, keeping
(current max, number of breaks) as a typed ValueState. The conditional
emission is the part the groupBy-agg surface cannot express: silence is
information ("no new record this batch").

Scale: state lives in the per-partition RocksDB state store keyed by
user_id; each micro-batch touches only the keys present in the batch, and
changelog checkpointing ships deltas, not snapshots. A production variant
passes ttlDurationMs to expire idle users and bound the store.

ENVIRONMENT NOTE: executing transformWithState requires the `protobuf`
Python package (the state-server wire protocol,
pyspark/sql/streaming/proto/StateMessage_pb2.py), which is absent from this
sandbox and cannot be installed. The operator and its end-to-end test
(tests/test_tws.py) are real; the test skips itself when protobuf is
missing - the same honest-stub policy as the multimodal codecs
(operators/multimodal.py). applyInPandasWithState (streaming/stateful.py)
covers the custom-stateful surface with a protobuf-free runtime and IS
exercised end-to-end in CI.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("new_max", T.DoubleType()),
        T.StructField("n_breaks", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("mx", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


class HighWaterMarkProcessor(StatefulProcessor):
    """Tracks each key's maximum `value`; emits only when it increases."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("hwm", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        prev = self._st.get()
        mx, n = prev if prev is not None else (float("-inf"), 0)
        broke = False
        for pdf in rows:
            if len(pdf) == 0:
                continue
            m = float(pdf["value"].max())
            if m > mx:
                mx, n, broke = m, n + 1, True
        if broke:
            self._st.update((mx, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "new_max": [mx], "n_breaks": [n]}
            )

    def close(self) -> None:
        pass


def high_water_marks(events: DataFrame) -> DataFrame:
    """Per-user record-break stream. Streaming frames only (state requires
    the streaming engine); requires the RocksDB state store provider
    (transformWithState does not support the default HDFS-backed one)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=HighWaterMarkProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
