"""Interval (time-bounded) join: purchases to the same user's clicks within
the preceding 10 minutes. Registered here in batch form with an exact
oracle; the identical plan runs as a watermarked stream-stream join in
streaming/windows-style tests (stream-stream inner joins REQUIRE exactly
this shape: an equality key plus a bounded time condition so state can be
pruned by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register


def interval_join_clicks_before_purchase(
    purchases: DataFrame, clicks: DataFrame
) -> DataFrame:
    """Inner join: each (purchase, click) pair for the same user with
    click.ts in [purchase.ts - 10 min, purchase.ts). Works identically on
    batch and streaming inputs; streaming adds watermarks upstream."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    cond = (
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr("interval 10 minutes"))
        & (c.c_ts < p.p_ts)
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "user_id", "p_ts", "c_ts"
    )


@register(
    "interval_join_click_counts",
    oracle="""
        SELECT p.event_id AS purchase_id,
               p.user_id,
               epoch_us(p.ts) AS p_ts_us,
               COUNT(c.ts) AS clicks_10m
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts <  p.ts
        GROUP BY 1, 2, 3
        ORDER BY purchase_id
    """,
    tags=("streaming", "interval-join"),
)
def interval_join_click_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: how many clicks the user made in the preceding 10
    minutes (left join so zero-click purchases keep a row). The inner
    time-bounded join is the exact shape Structured Streaming requires for
    stream-stream joins - see tests/test_streaming_join.py for the
    watermarked twin."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    joined = interval_join_clicks_before_purchase(purchases, clicks)
    return (
        purchases.select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.unix_micros("ts").alias("p_ts_us"),
        )
        .join(
            joined.groupBy("purchase_id").agg(F.count("*").alias("n")),
            "purchase_id",
            "left",
        )
        .select(
            "purchase_id",
            "user_id",
            "p_ts_us",
            F.coalesce("n", F.lit(0)).alias("clicks_10m"),
        )
        .orderBy("purchase_id")
    )
