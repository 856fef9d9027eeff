"""Stream-stream interval join: the watermarked streaming twin of
interval_join_clicks_before_purchase must equal the batch run."""

from __future__ import annotations

import os
import shutil
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
