"""Stream-stream interval join: the watermarked streaming twin of
interval_join_clicks_before_purchase must equal the batch run."""

from __future__ import annotations

import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.queries.streaming_join import (
    interval_join_clicks_before_purchase,
)

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    src = os.path.join(TMP, f"events_ssj_{uuid.uuid4().hex[:8]}")
    load(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    try:
        schema = spark.read.parquet(src).schema

        def split(df):
            return (
                df.filter(F.col("event_type") == "purchase"),
                df.filter(F.col("event_type") == "click"),
            )

        # batch
        bp, bc = split(spark.read.parquet(src))
        batch = interval_join_clicks_before_purchase(bp, bc)

        # stream: both sides watermarked (required for state pruning)
        sp, sc = split(spark.readStream.schema(schema).parquet(src))
        stream = interval_join_clicks_before_purchase(
            sp.withWatermark("ts", "30 minutes"),
            sc.withWatermark("ts", "30 minutes"),
        )
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName("t_ssj")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.table("t_ssj")
        b = sorted(map(tuple, batch.collect()))
        s = sorted(map(tuple, got.select(*batch.columns).collect()))
        assert len(b) > 0
        assert b == s
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_stream_left_outer_join_equals_batch(spark, sf_dir):
    """Left-outer stream-stream join: purchases with no click in the
    preceding 10 minutes must still emit (click columns null) once the
    watermark closes the interval - matched against the batch left join."""
    src = os.path.join(TMP, f"events_ssoj_{uuid.uuid4().hex[:8]}")
    events = load(spark, sf_dir, "events")
    # Far-future sentinels (one per side, filtered from results): without
    # them the final watermark stops 30min behind max(ts) and unmatched
    # purchases in the last watermark+interval window never emit their nulls.
    sentinels = (
        events.limit(2)
        .select(
            F.monotonically_increasing_id().alias("i"),
            (F.lit(None).cast("long")).alias("_drop"),
        )
        .select(
            # types must match the events file EXACTLY: parquet schema
            # inference samples one file, and an int32 user_id in the
            # sentinel file intermittently breaks reading the int64 one
            (F.lit(-1) - F.col("i")).cast("long").alias("event_id"),
            F.lit("2024-03-01 00:00:00").cast("timestamp").alias("ts"),
            F.lit(-999).cast("long").alias("user_id"),
            F.when(F.col("i") == 0, "purchase").otherwise("click").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    # Two ORDERED micro-batches (maxFilesPerTrigger=1): all real events
    # first, the sentinel file second. The sentinel batch advances the
    # watermark past every real timestamp, and the trailing no-data batch
    # then evicts the remaining left-state, emitting the tail nulls. With a
    # single batch the watermark only advances after the last data batch, so
    # purchases in the final watermark+interval window would never emit.
    events.coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(2)  # distinct mtime: the sentinel file must be the LAST batch
    sentinels.select(events.columns).coalesce(1).write.mode("append").parquet(src)
    try:
        schema = spark.read.parquet(src).schema

        def shape(df):
            p = (
                df.filter(F.col("event_type") == "purchase")
                .select(
                    F.col("event_id").alias("p_id"),
                    F.col("user_id").alias("p_user"),
                    F.col("ts").alias("p_ts"),
                )
            )
            c = (
                df.filter(F.col("event_type") == "click")
                .select(
                    F.col("event_id").alias("c_id"),
                    F.col("user_id").alias("c_user"),
                    F.col("ts").alias("c_ts"),
                )
            )
            return p, c

        cond = (
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts"))
        )

        bp, bc = shape(spark.read.parquet(src))
        batch = (
            bp.join(bc, cond, "left_outer")
            .filter(F.col("p_id") >= 0)
            .select("p_id", "c_id")
        )

        # Watermark the BASE stream once, before the split: with
        # per-branch withWatermark the union's two source instances advance
        # asymmetrically and the min-policy global watermark stalls at the
        # slower branch, holding back the tail nulls.
        base = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "30 minutes")
        )
        sp, sc = shape(base)
        stream = (
            sp.join(sc, cond, "left_outer")
            .filter(F.col("p_id") >= 0)
            .select("p_id", "c_id")
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("t_ssoj")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.table("t_ssoj")
        b = sorted(map(tuple, batch.collect()))
        s = sorted(map(tuple, got.collect()))
        assert len(b) > 0
        assert any(c is None for _, c in b)  # unmatched purchases exist
        assert b == s
    finally:
        shutil.rmtree(src, ignore_errors=True)
