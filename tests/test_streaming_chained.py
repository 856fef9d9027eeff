"""Chained stateful streaming (Spark 3.4+ multiple stateful operators in
one query): a windowed per-type count whose output feeds a SECOND windowed
aggregate (total + distinct types per window) - the two-level rollup shape
of a metrics pipeline - verified against the same two-level batch plan.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def _two_level(df):
    """Level 1: per (1h window, event_type) counts. Level 2: per window
    totals over the level-1 output - a second stateful aggregate keyed on
    the SAME event-time window column (required: chained stateful ops must
    stay aligned on event time derived from the upstream window)."""
    lvl1 = (
        df.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    return lvl1.groupBy("w").agg(
        F.sum("n").alias("total"),
        F.count("*").alias("n_types"),
    )


def test_chained_windowed_aggregates_match_batch(spark, sf_dir):
    src = os.path.join(TMP, f"events_chain_{uuid.uuid4().hex[:8]}")
    load(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    try:
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            _two_level(stream)
            .writeStream.format("memory")
            .queryName("t_chain")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.w.start, r.w.end): (r.total, r.n_types)
            for r in spark.table("t_chain").collect()
        }
        expect = {
            (r.w.start, r.w.end): (r.total, r.n_types)
            for r in _two_level(spark.read.parquet(src)).collect()
        }
        # append mode emits only watermark-closed windows: every emitted
        # window must match batch exactly, and the only absent windows are
        # those the final watermark (max event time - 1h delay) left open.
        assert got, "no windows emitted"
        for k, v in got.items():
            assert expect[k] == v
        max_ts = (
            spark.read.parquet(src).agg(F.max("ts").alias("m")).collect()[0].m
        )
        from datetime import timedelta

        watermark = max_ts - timedelta(hours=1)
        missing = set(expect) - set(got)
        assert missing, "expected at least the unclosed tail window"
        for start, end in missing:
            assert end > watermark, (start, end, watermark)
    finally:
        shutil.rmtree(src, ignore_errors=True)
