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


# --- streaming weighted reservoir (A-ES top-k per key) -----------------------

RESERVOIR_K = 5

RESERVOIR_OUTPUT = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("rk", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("es_key", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

RESERVOIR_STATE = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _reservoir_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge the batch's (es_key, doc_id) candidates into the k-smallest
    reservoir. Selection over a multiset is associative and commutative,
    so the final state is independent of micro-batch boundaries - that
    is what makes the streaming result equal the batch A-ES sample and
    gives a stateful streaming query an EXACT SQL oracle. All comparisons
    are integer (the transcendental key is pinned JVM-side upstream);
    n_seen is monotone, so the final-state projection is max(n_seen)."""
    if state.exists:
        keys, ids, seen = state.get
        pool = list(zip(keys, ids))
    else:
        pool, seen = [], 0
    for pdf in pdfs:
        seen += len(pdf)
        pool.extend(
            zip(
                pdf["es_key"].astype("int64").tolist(),
                pdf["doc_id"].astype("int64").tolist(),
            )
        )
        pool.sort()
        del pool[RESERVOIR_K:]
    state.update(([k for k, _ in pool], [i for _, i in pool], seen))
    yield pd.DataFrame(
        {
            "source": [key[0]] * len(pool),
            "rk": list(range(1, len(pool) + 1)),
            "doc_id": [i for _, i in pool],
            "es_key": [k for k, _ in pool],
            "n_seen": [seen] * len(pool),
        }
    )


def weighted_reservoir(docs: DataFrame) -> DataFrame:
    """Per-source A-ES weighted reservoir over a stream of documents:
    expects (source, doc_id, es_key) rows; maintains the k smallest keys
    per source across micro-batches."""
    return (
        docs.select("source", "doc_id", "es_key")
        .groupBy("source")
        .applyInPandasWithState(
            _reservoir_update,
            RESERVOIR_OUTPUT,
            RESERVOIR_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming SCD2 maintenance (closed validity intervals as a stream) ------

SCD2_OUTPUT = T.StructType(
    [
        T.StructField("custkey", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("vf_us", T.LongType()),
        T.StructField("vt_us", T.LongType()),
        T.StructField("version", T.IntegerType()),
    ]
)

SCD2_STATE = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("from_us", T.LongType()),
        T.StructField("version", T.IntegerType()),
    ]
)


def _scd2_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key SCD2 state machine: the open run lives in state; a status
    change EMITS the closed interval (append semantics) and rolls the run.
    Requires micro-batches to arrive in event-time order per key (the same
    log-tail contract as operators/maintenance.scd2_apply_changes - here
    provided by the chronological file staging)."""
    cur = state.get if state.exists else None  # (status, from_us, version)
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_us", "okey"], kind="mergesort"
    )
    out: dict[str, list] = {c: [] for c in ("status", "vf_us", "vt_us", "version")}
    for status, ts_us in zip(rows["status"], rows["ts_us"]):
        ts_us = int(ts_us)
        if cur is None:
            cur = (status, ts_us, 1)
        elif status != cur[0]:
            out["status"].append(cur[0])
            out["vf_us"].append(cur[1])
            out["vt_us"].append(ts_us)
            out["version"].append(cur[2])
            cur = (status, ts_us, cur[2] + 1)
    state.update(cur)
    if out["status"]:
        yield pd.DataFrame(
            {
                "custkey": [key[0]] * len(out["status"]),
                "status": out["status"],
                "vf_us": out["vf_us"],
                "vt_us": out["vt_us"],
                "version": out["version"],
            }
        )


def scd2_closed_intervals(orders: DataFrame) -> DataFrame:
    """Streaming SCD2 maintenance: emits each key's CLOSED validity
    intervals as they close (append); the open run per key stays in the
    state store - exactly the mutable tail a warehouse keeps hot while
    history is immutable. Input needs columns (o_custkey, ts_us, okey,
    status); works only on streaming frames."""
    return (
        orders.groupBy("o_custkey")
        .applyInPandasWithState(
            _scd2_update,
            SCD2_OUTPUT,
            SCD2_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming sessionization (closed sessions as a stream) -------------------

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_GAP_US = 300 * 1_000_000


def _session_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key session state machine (>= gap closes, the sessionize /
    session_window convention): the OPEN session lives in state; an event
    at >= last + gap emits the closed session and starts the next. Same
    event-time-ordered micro-batch contract as _scd2_update."""
    cur = state.get if state.exists else None  # (seq, start, last, n)
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_us", "event_id"], kind="mergesort"
    )
    out: dict[str, list] = {c: [] for c in ("seq", "start", "end", "n")}
    for ts_us in rows["ts_us"]:
        ts_us = int(ts_us)
        if cur is None:
            cur = (1, ts_us, ts_us, 1)
        elif ts_us - cur[2] >= SESSION_GAP_US:
            out["seq"].append(cur[0])
            out["start"].append(cur[1])
            out["end"].append(cur[2])
            out["n"].append(cur[3])
            cur = (cur[0] + 1, ts_us, ts_us, 1)
        else:
            cur = (cur[0], cur[1], ts_us, cur[3] + 1)
    state.update(cur)
    if out["seq"]:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out["seq"]),
                "session_seq": out["seq"],
                "start_us": out["start"],
                "end_us": out["end"],
                "n_events": out["n"],
            }
        )


def session_closed_windows(events: DataFrame) -> DataFrame:
    """Streaming session maintenance: emits each key's CLOSED sessions as
    the closing event arrives (append); the open session per key stays in
    the state store. Input needs (user_id, ts_us, event_id); streaming
    frames only."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            SESSION_OUTPUT,
            SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
