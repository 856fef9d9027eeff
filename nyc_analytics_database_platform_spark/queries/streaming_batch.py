"""Batch-mode registrations of the streaming window operators (the same
logical plans run as streams in streaming/windows.py; tests prove
batch == availableNow-stream parity). Oracles use epoch integers so results
are timezone-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register
from nyc_analytics_database_platform_spark.streaming.windows import (
    session_event_windows,
    sliding_event_counts,
    tumbling_event_counts,
)


@register(
    "stream_tumbling_event_counts",
    oracle="""
        SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    tags=("streaming", "window"),
    bench=True,
)
def stream_tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type (epoch-aligned, matching
    Spark's window origin)."""
    events = load(spark, sf_dir, "events")
    return tumbling_event_counts(events).orderBy("window_start", "event_type")


@register(
    "stream_sliding_event_counts",
    oracle="""
        WITH starts AS (
            SELECT unnest([
                ((epoch_us(ts) // 300000000) * 300),
                ((epoch_us(ts) // 300000000) * 300 - 300)
            ]) AS window_start
            FROM events
        )
        SELECT window_start,
               window_start + 600 AS window_end,
               COUNT(*) AS n_events
        FROM starts
        GROUP BY 1
        ORDER BY window_start
    """,
    tags=("streaming", "window"),
)
def stream_sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 - each event lands in exactly two
    windows; the oracle materializes both window starts per event."""
    events = load(spark, sf_dir, "events")
    return sliding_event_counts(events).orderBy("window_start")


@register(
    "stream_session_windows",
    oracle="""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        flags AS (
            SELECT user_id, us,
                   CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                             OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                                >= 300000000
                        THEN 1 ELSE 0 END AS new_s
            FROM e
        ),
        sess AS (
            SELECT user_id, us,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flags
        )
        SELECT user_id, MIN(us) AS session_start_us, COUNT(*) AS n_events
        FROM sess
        GROUP BY user_id, sid
        ORDER BY user_id, session_start_us
    """,
    tags=("streaming", "session"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based (5 min) session windows per user. The oracle reproduces
    Spark's session semantics (new session when the gap is >= the duration)
    with a lag + cumulative-sum session id."""
    events = load(spark, sf_dir, "events")
    return session_event_windows(events).orderBy("user_id", "session_start_us")


@register(
    "stream_first_seen_dedupe",
    oracle="""
        SELECT user_id, event_type, event_id,
               epoch_us(ts) AS first_ts_us
        FROM (
            SELECT user_id, event_type, event_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        )
        WHERE rn = 1
        ORDER BY user_id, event_type
    """,
    tags=("streaming", "dedupe"),
)
def stream_first_seen_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type) - the deterministic batch twin of
    streaming dropDuplicates-with-watermark (streaming/windows.py
    first_seen_dedupe)."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("first_ts_us"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "stream_static_enrich_counts",
    oracle="""
        SELECT c.c_mktsegment, COUNT(*) AS n_events
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    tags=("streaming", "stream-static", "J1"),
)
def stream_static_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch registration of the stream-static broadcast-enrich plan
    (streaming/windows.py:static_enrich_segment_counts); the availableNow
    streaming run of the SAME builder is proven equal in
    tests/test_streaming.py::test_stream_static_broadcast_enrich_equals_batch."""
    from nyc_analytics_database_platform_spark.streaming.windows import (
        static_enrich_segment_counts,
    )

    return static_enrich_segment_counts(
        load(spark, sf_dir, "events"), load(spark, sf_dir, "customer")
    ).orderBy("c_mktsegment")
