"""Property: the scalable as-of join (union + sorted-window last) equals the
naive specification (join, filter right_ts <= left_ts, take max right_ts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.joins import asof_join


def test_asof_equals_naive_spec(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")

    fast = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", value_cols=["ts"]
    ).select("event_id", F.unix_micros("asof_ts").alias("asof_us"))

    naive = (
        purchases.alias("p")
        .join(
            clicks.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") <= F.col("p.ts")),
            "left",
        )
        .groupBy(F.col("p.event_id").alias("event_id"))
        .agg(F.unix_micros(F.max("c.ts")).alias("asof_us"))
    )

    f = {r["event_id"]: r["asof_us"] for r in fast.collect()}
    n = {r["event_id"]: r["asof_us"] for r in naive.collect()}
    assert f == n
    assert len(f) == purchases.count()  # left-outer: every purchase kept


def test_asof_boundary_inclusive_and_no_match_null(spark):
    """right_ts == left_ts matches (the DuckDB ASOF >= convention); a left
    row before every right row keeps a NULL (left-outer semantics)."""
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 09:00:00")],
        "id long, k long, ts string",
    ).select("id", "k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame([(1, "2024-01-01 10:00:00")], "k long, ts string") \
        .select("k", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["id"]: r["asof_ts"] for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["ts"]
    ).collect()}
    assert out[1] is not None  # equal-ts match included
    assert out[2] is None  # pre-everything left row kept with NULL


def test_asof_forward_equals_naive_spec(spark, sf_dir):
    from nyc_analytics_database_platform_spark.operators.joins import (
        asof_join_forward,
    )

    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )

    fast = asof_join_forward(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["ts"],
    ).select("event_id", F.unix_micros("asof_ts").alias("asof_us"))

    naive = (
        clicks.alias("c")
        .join(
            purchases.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("c.ts")),
            "left",
        )
        .groupBy(F.col("c.event_id").alias("event_id"))
        .agg(F.unix_micros(F.min("p.ts")).alias("asof_us"))
    )

    f = {r["event_id"]: r["asof_us"] for r in fast.collect()}
    n = {r["event_id"]: r["asof_us"] for r in naive.collect()}
    assert f == n
    assert len(f) == clicks.count()


def test_asof_forward_boundary_inclusive_and_no_match_null(spark):
    """right_ts == left_ts matches; a left row after every right row keeps
    a NULL (left-outer semantics)."""
    from nyc_analytics_database_platform_spark.operators.joins import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 11:00:00")],
        "id long, k long, ts string",
    ).select("id", "k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["id"]: r["asof_ts"] for r in asof_join_forward(
        left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["ts"]
    ).collect()}
    assert out[1] is not None  # equal-ts match included
    assert out[2] is None  # post-everything left row kept with NULL
