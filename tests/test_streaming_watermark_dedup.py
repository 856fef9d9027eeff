"""dropDuplicatesWithinWatermark: streaming dedup whose state is bounded by
the watermark (keys older than the watermark are evicted) - the production
form of streaming dedup for unbounded key domains."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def test_drop_duplicates_within_watermark(spark, sf_dir):
    src = os.path.join(TMP, f"wmd_{uuid.uuid4().hex[:8]}")
    try:
        # duplicate every event id on purpose
        ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
        ev.union(ev).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("t_wmd")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.table("t_wmd")
        n_unique = ev.select("event_id").distinct().count()
        # events span ~1 month > watermark, so late re-occurrences past the
        # watermark COULD re-emit; with all data in order-of-file batches and
        # dup pairs identical-ts, each id emits exactly once
        assert got.count() == n_unique
        assert got.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
