"""Batch sessionization: assign each event a per-key session ordinal from a
max-gap rule (new session when the gap since the previous event is >= `gap`).

This is the batch twin of `streaming/windows.session_event_windows` (Spark's
`session_window` aggregate): where the streaming operator only returns
per-session aggregates, this one tags EVERY ROW with its session id, which is
what a training-data pipeline needs to assemble conversation/session documents
(group events into sessions, then pack sessions into context windows via
operators/sampling.sequence_packing_bins).

Gap semantics match Spark's session_window close rule: a session covers
[first, last + gap), so an event at exactly last + gap starts a new session
(same `>=` convention as queries/streaming_batch.stream_session_windows).

Scale: one shuffle on the session key; both window passes (lag flag, running
sum) share the same partitioning so Catalyst plans a single Exchange. Sessions
never span keys, so the operator is embarrassingly parallel across keys at
100 TB; skewed power-users bound the per-task work but a single user's events
always fit one task (the same constraint Spark's own session_window has).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: tuple[str, ...] = (),
    out_col: str = "session_seq",
) -> DataFrame:
    """Add `out_col`: 1-based session ordinal per `key_col`, split on gaps of
    at least `gap_seconds`. `order_cols` break timestamp ties deterministically
    (always pass a unique column when timestamps can collide)."""
    us: Column = F.unix_micros(F.col(ts_col))
    # Order by the RAW timestamp column, not unix_micros(ts): the total
    # order is identical (unix_micros is strictly monotone), but only the
    # raw column form lets Catalyst eliminate the window Sort when the
    # input layout (operators/bucketed.py) is already sorted by
    # (key, ts, ...). The gap arithmetic below still uses integer micros.
    order = [F.col(ts_col), *(F.col(c) for c in order_cols)]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(us).over(w)
    new_session = (prev.isNull() | ((us - prev) >= gap_seconds * 1_000_000)).cast("int")
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(new_session).over(running))
