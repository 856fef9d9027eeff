"""Streaming maintenance state machines: checkpoint recovery and seam
semantics for the round-9 applyInPandasWithState operators."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.queries.streaming_stateful import (
    _stage_ordered_files,
    drain_or_raise,
)


def _staged_orders(spark, sf_dir, scratch, n_stages=7):
    """Chronological micro-batch files. Seven stages, not four (ADVICE
    r13): the restart test kills the stream after the FIRST observed
    progress event at 0.2 s poll granularity, so more, smaller batches
    make "drained before the kill" implausible on any plausible hardware
    — the same re-staging the ANN-ingest restart test got."""
    src_dir = os.path.join(scratch, "files")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_micros("o_orderdate").alias("ts_us"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
    )
    cuts = ["1994-01-01", "1995-06-01", "1996-06-01", "1997-06-01",
            "1998-01-01", "1999-08-01"][: n_stages - 1]
    cuts_us = [F.unix_micros(F.lit(c).cast("timestamp")) for c in cuts]
    lo_bounds = [None] + cuts_us
    hi_bounds = cuts_us + [None]
    stages = []
    for lo, hi in zip(lo_bounds, hi_bounds):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("ts_us") >= lo)
        if hi is not None:
            cond = cond & (F.col("ts_us") < hi)
        stages.append(orders.filter(cond))
    _stage_ordered_files(scratch, src_dir, stages)
    return orders, src_dir


def test_scd2_stream_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill the SCD2 maintenance stream after the FIRST micro-batch, start
    a fresh query on the same checkpoint, drain the rest: the union of the
    two queries' emissions must equal the batch build's closed intervals -
    open runs recovered from the state store, no duplicates, no holes.
    This is the restart the 100 TB always-on deployment lives through
    daily; a state machine that loses its open run would emit a wrong
    valid_from after every restart."""
    from nyc_analytics_database_platform_spark.operators.scd import (
        scd2_intervals,
    )
    from nyc_analytics_database_platform_spark.streaming.stateful import (
        scd2_closed_intervals,
    )

    scratch = str(tmp_path / "scd2_restart")
    orders, src_dir = _staged_orders(spark, sf_dir, scratch)
    ckpt = os.path.join(scratch, "ckpt")
    out_dir = os.path.join(scratch, "out")

    def start():
        # Memory sinks don't support checkpoint recovery; the restartable
        # form is the file sink (exactly-once via the sink's commit log).
        source = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        return (
            scd2_closed_intervals(source)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # Phase 1: process at least one micro-batch, then stop mid-stream.
    q1 = start()
    while q1.isActive and not q1.recentProgress:
        q1.awaitTermination(0.2)
    q1.stop()
    q1.awaitTermination()
    batches_a = {p["batchId"] for p in q1.recentProgress}
    assert len(batches_a) < 7, "stream finished before the kill; test is vacuous"

    # Phase 2: fresh query, same checkpoint - state store carries the open
    # runs across the restart.
    q2 = start()
    drain_or_raise(q2, "restarted SCD2 stream")

    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())

    full = scd2_intervals(
        load(spark, sf_dir, "orders"),
        key_col="o_custkey",
        ts_col="o_orderdate",
        attr_cols=("o_orderstatus",),
        order_cols=("o_orderkey",),
    ).filter(~F.col("is_current"))
    want = sorted(
        (
            r["o_custkey"],
            r["o_orderstatus"],
            r["vf_us"],
            r["vt_us"],
            r["version"],
        )
        for r in full.select(
            "o_custkey",
            "o_orderstatus",
            F.unix_micros("valid_from").alias("vf_us"),
            F.unix_micros("valid_to").alias("vt_us"),
            "version",
        ).collect()
    )
    assert got == want


def test_stream_ann_ingest_survives_checkpoint_restart(spark, sf_dir,
                                                       tmp_path):
    """Kill the streaming ANN cell ingest between micro-batches, restart
    a fresh query on the same checkpoint, drain the rest (VERDICT r12
    #2): stream_ann_ingest_cells' exactly-once claim was previously
    proven only within one availableNow drain — this is the
    restart-with-redelivery path where double-indexing hides. Structured
    Streaming re-delivers the in-flight batch after the kill
    (at-least-once), the txnlog sink must dedupe it by batch_id, and the
    final cell lists must equal a from-scratch frozen-quantizer
    assignment of every vector: no vector double-indexed, none lost."""
    from nyc_analytics_database_platform_spark.operators import txnlog
    from nyc_analytics_database_platform_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )

    scratch = str(tmp_path / "ann_restart")
    src_dir = os.path.join(scratch, "files")
    root = os.path.join(scratch, "table")
    ckpt = os.path.join(scratch, "ckpt")

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    hist = emb.filter(F.col("vec_id") < 300).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents, _ = kmeans_fit(hist, 4, 2)
    cents = cents.localCheckpoint(eager=True)  # the frozen quantizer
    n_max = emb.agg(F.max("vec_id")).collect()[0][0]
    # Six micro-batches, not four: the kill must land mid-stream, and the
    # poll below observes progress at 0.2 s granularity — more, smaller
    # batches make "drained before the kill" implausible even on a much
    # faster box (ADVICE r13).
    n_stages = 6
    cuts = [(i + 1) * n_max // n_stages for i in range(n_stages - 1)]
    bounds = zip([-1] + cuts, cuts + [n_max])
    stages = [
        emb.filter((F.col("vec_id") > lo) & (F.col("vec_id") <= hi))
        for lo, hi in bounds
    ]
    _stage_ordered_files(scratch, src_dir, stages)

    def sink(bdf, bid):
        cells = assign_clusters(
            bdf.select("vec_id",
                       F.col("embedding").cast("array<double>").alias("v")),
            cents,
        ).select("vec_id", F.col("c_id").cast("int").alias("cell"))
        txnlog.commit_stream_batch(spark, root, cells, bid,
                                   range_col="vec_id", n_files=1)

    def start():
        return (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # Phase 1: let at least one micro-batch commit, then kill mid-stream.
    q1 = start()
    while q1.isActive and not q1.recentProgress:
        q1.awaitTermination(0.2)
    q1.stop()
    q1.awaitTermination()
    batches_a = {p["batchId"] for p in q1.recentProgress}
    assert len(batches_a) < 6, "stream finished before the kill; vacuous"

    # Phase 2: fresh query, same checkpoint. The first batch it runs is a
    # REDELIVERY of the possibly-in-flight one; the sink must no-op it if
    # phase 1's commit landed, commit it if not — either way exactly once.
    q2 = start()
    drain_or_raise(q2, "restarted ANN ingest stream")
    batches_b = {p["batchId"] for p in q2.recentProgress}

    # The restart must have done real work (redelivery or continuation),
    # and every batch either query ran is committed exactly once, with no
    # gap in the id sequence. NOT pinned to exactly 6 ids: a restarted
    # availableNow source may legally re-chunk the remaining files
    # (maxFilesPerTrigger is a soft limit), so the batch COUNT can come
    # out below the file count while delivery stays exactly-once — the
    # multiset compare below is the actual no-loss/no-duplication proof.
    assert batches_b, "restarted stream processed nothing; vacuous"
    committed = txnlog.committed_batch_ids(root)
    assert committed == batches_a | batches_b
    assert committed == set(range(len(committed)))
    # Final index == from-scratch assignment under the same frozen
    # quantizer: any double-indexed vector shows as a duplicate (multiset
    # compare), any lost batch as missing rows.
    got = sorted(
        (r["vec_id"], r["cell"])
        for r in txnlog.read_version(spark, root).collect()
    )
    want = sorted(
        (r["vec_id"], r["c_id"])
        for r in assign_clusters(
            emb.select("vec_id",
                       F.col("embedding").cast("array<double>").alias("v")),
            cents,
        ).collect()
    )
    assert got == want


def test_session_stream_merges_across_batch_boundary(spark, sf_dir, tmp_path):
    """A session spanning two micro-batches must come out as ONE session
    with the first batch's start and combined event count - the in-state
    equivalent of merge_session_tables' seam rule."""
    from nyc_analytics_database_platform_spark.streaming.stateful import (
        session_closed_windows,
    )

    scratch = str(tmp_path / "sess_seam")
    src_dir = os.path.join(scratch, "files")
    # user 1: events at t=0s, 100s | batch boundary | 200s, then a closing
    # event at 10000s -> ONE closed session [0, 200] with 3 events.
    s1 = spark.createDataFrame(
        [(1, 0, 1), (1, 100_000_000, 2)], "user_id long, ts_us long, event_id long"
    )
    s2 = spark.createDataFrame(
        [(1, 200_000_000, 3), (1, 10_000_000_000, 4)],
        "user_id long, ts_us long, event_id long",
    )
    _stage_ordered_files(scratch, src_dir, [s1, s2])
    source = (
        spark.readStream.schema(s1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        session_closed_windows(source)
        .writeStream.format("memory")
        .queryName("sess_seam_sink")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, "session seam stream")
    rows = [tuple(r) for r in spark.table("sess_seam_sink").collect()]
    assert rows == [(1, 1, 0, 200_000_000, 3)]


def test_two_surface_sink_partial_crash_replay(spark, tmp_path):
    """stream_multi_index_ingest's two-surface sink claim (round 13): the
    SAME batch id commits idempotently per surface, so a crash BETWEEN the
    band commit and the cell commit, followed by Structured Streaming's
    batch redelivery, no-ops the surface that landed and applies the one
    that did not — exactly-once on both, with no cross-surface
    coordination beyond sharing the batch id."""
    from nyc_analytics_database_platform_spark.operators import txnlog

    root_b = str(tmp_path / "bands")
    root_c = str(tmp_path / "cells")
    bands = spark.range(20).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("band"),
        F.col("id").cast("string").alias("bucket"))
    cells = spark.range(20).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 4).cast("int").alias("cell"))
    # Batch 0 lands on the band surface, then the process "crashes"
    # before the cell commit.
    assert txnlog.commit_stream_batch(
        spark, root_b, bands, batch_id=0, range_col="doc_id") is not None
    # Redelivery re-runs the WHOLE sink for batch 0:
    assert txnlog.commit_stream_batch(
        spark, root_b, bands, batch_id=0, range_col="doc_id") is None
    assert txnlog.commit_stream_batch(
        spark, root_c, cells, batch_id=0, range_col="vec_id") is not None
    # Both surfaces exactly-once.
    assert txnlog.read_version(spark, root_b).count() == 20
    assert txnlog.read_version(spark, root_c).count() == 20
    assert txnlog.committed_batch_ids(root_b) == {0}
    assert txnlog.committed_batch_ids(root_c) == {0}
