"""Structured Streaming parity: the same window operators run as a real
stream (readStream -> trigger(availableNow) -> memory sink) must equal the
batch run over the same data."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.streaming.windows import (
    first_seen_dedupe,
    session_event_windows,
    sliding_event_counts,
    tumbling_event_counts,
)

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir):
    """Stage the events table into a directory so it can be a file-stream
    source (readStream needs a directory it can list)."""
    out = os.path.join(TMP, f"events_stream_{uuid.uuid4().hex[:8]}")
    load(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _stream_source(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    return spark.readStream.schema(schema).parquet(events_stream_dir)


def _assert_same(batch_df, stream_df, keys):
    b = sorted([tuple(r) for r in batch_df.collect()])
    s = sorted([tuple(r) for r in stream_df.select(*batch_df.columns).collect()])
    assert b == s, f"stream/batch divergence: {len(b)} vs {len(s)} rows"


def test_tumbling_stream_equals_batch(spark, sf_dir, events_stream_dir):
    batch = tumbling_event_counts(load(spark, sf_dir, "events"))
    stream = tumbling_event_counts(_stream_source(spark, events_stream_dir))
    assert stream.isStreaming
    out = _run_stream(spark, stream, "t_tumbling")
    _assert_same(batch, out, ["window_start", "event_type"])


def test_sliding_stream_equals_batch(spark, sf_dir, events_stream_dir):
    batch = sliding_event_counts(load(spark, sf_dir, "events"))
    stream = sliding_event_counts(_stream_source(spark, events_stream_dir))
    out = _run_stream(spark, stream, "t_sliding")
    _assert_same(batch, out, ["window_start"])


def test_session_stream_equals_batch(spark, sf_dir, events_stream_dir):
    batch = session_event_windows(load(spark, sf_dir, "events"))
    stream = session_event_windows(_stream_source(spark, events_stream_dir))
    out = _run_stream(spark, stream, "t_session")
    _assert_same(batch, out, ["user_id", "session_start_us"])


def test_streaming_dedupe_one_row_per_key(spark, sf_dir, events_stream_dir):
    stream = first_seen_dedupe(_stream_source(spark, events_stream_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_dedupe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedupe")
    n_keys = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert got.count() == n_keys
    assert got.groupBy("user_id", "event_type").count().filter(F.col("count") > 1).count() == 0


def test_stream_static_broadcast_enrich_equals_batch(spark, sf_dir, events_stream_dir):
    """Stream-static join: the unbounded side joins a broadcast static
    dimension per micro-batch (no state store needed). Enriched counts per
    segment must equal the batch run."""
    static_dim = F.broadcast(
        load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )

    def enrich(events_df):
        return (
            events_df.join(static_dim, events_df.user_id == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_events"))
        )

    batch = enrich(load(spark, sf_dir, "events"))
    stream = _run_stream(
        spark, enrich(_stream_source(spark, events_stream_dir)), "stream_static_enrich"
    )
    _assert_same(batch, stream, ["c_mktsegment"])


def test_stateful_query_entry_matches_batch_agg(spark, sf_dir):
    """The driver-attested executed-streaming query (real availableNow run
    of applyInPandasWithState over a 4-file staged source, 2 files per
    trigger) must converge to the plain batch group aggregate."""
    from nyc_analytics_database_platform_spark.queries.streaming_stateful import (
        stream_stateful_user_counters,
    )

    got = stream_stateful_user_counters(spark, sf_dir)
    want = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max(F.unix_micros("ts")).alias("last_ts_us"),
        )
    )
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w
