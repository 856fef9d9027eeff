"""Windowed streaming aggregations, written to run identically on a batch
DataFrame and a streaming DataFrame (the transformations are the same
logical plan; only the source/sink and watermark differ).

Late data: `withWatermark` bounds state - events later than the watermark
are dropped from open windows; tests exercise the batch-vs-stream parity via
trigger(availableNow) over the same parquet.

Scale: windowed aggregation state is partitioned by (window, keys); the gap
-based session windows keep per-key state only until watermark passes the
session close. Output uses epoch seconds/micros (integers) so results are
timezone-free and engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.functions.numeric import exact_sum


def _maybe_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    if watermark and events.isStreaming:
        return events.withWatermark("ts", watermark)
    return events


def tumbling_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str | None = "10 minutes"
) -> DataFrame:
    """Per (tumbling window, event_type): count + exact value sum."""
    df = _maybe_watermark(events, watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Sliding windows: each event lands in window/slide overlapping windows."""
    df = _maybe_watermark(events, watermark)
    return (
        df.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            F.col("w.end").cast("long").alias("window_end"),
            "n_events",
        )
    )


def session_event_windows(
    events: DataFrame, gap: str = "5 minutes", watermark: str | None = "10 minutes"
) -> DataFrame:
    """Gap-based session windows per user: a session extends while successive
    events arrive within `gap`; output one row per closed session."""
    df = _maybe_watermark(events, watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def first_seen_dedupe(events: DataFrame, watermark: str | None = "1 hour") -> DataFrame:
    """Streaming dedupe: keep the first event per (user_id, event_type).

    On a stream this is dropDuplicates with watermark-bounded state; on a
    batch frame dropDuplicates keeps an arbitrary row, so batch parity (and
    the SQL oracle) uses the deterministic min-ts variant in
    queries/streaming_batch.py."""
    df = _maybe_watermark(events, watermark)
    return df.dropDuplicates(["user_id", "event_type"])


def static_enrich_segment_counts(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the (possibly unbounded) events side
    against a broadcast static dimension and count per segment. In
    streaming, the static side is re-broadcast per micro-batch and needs no
    state store; in batch, the identical plan is a BroadcastHashJoin + agg.
    The dimension projection happens before the broadcast so only the two
    join/output columns ship to executors."""
    dim = F.broadcast(customers.select("c_custkey", "c_mktsegment"))
    return (
        events.join(dim, events.user_id == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"))
    )
