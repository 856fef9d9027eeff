"""Streaming parquet sink: windowed aggregates written continuously to
storage (append mode + checkpoint) match the batch computation - the
persistent-output half of the streaming story (memory sinks are test-only)."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.streaming.windows import tumbling_event_counts

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def test_streaming_parquet_sink_matches_batch(spark, sf_dir):
    base = os.path.join(TMP, f"sink_{uuid.uuid4().hex[:8]}")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    try:
        load(spark, sf_dir, "events").write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = tumbling_event_counts(
            spark.readStream.schema(schema).parquet(src), watermark="10 minutes"
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        written = spark.read.parquet(out)
        batch = tumbling_event_counts(load(spark, sf_dir, "events"))
        # append mode emits only watermark-closed windows; with availableNow
        # over finite input the last window(s) may stay open - everything
        # written must match the batch result exactly, and the vast majority
        # of windows must have been emitted
        b = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in batch.collect()
        }
        w = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in written.collect()
        }
        assert w, "sink wrote nothing"
        for k, v in w.items():
            assert b[k] == v
        assert len(w) >= len(b) - 10  # only the trailing open windows missing
    finally:
        shutil.rmtree(base, ignore_errors=True)
