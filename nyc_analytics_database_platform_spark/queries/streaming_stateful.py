"""Driver-attested EXECUTED streaming: unlike the batch-mode registrations
in streaming_batch.py (same logical plan, batch execution), this query runs
the actual streaming engine inside the query call - file-source readStream ->
applyInPandasWithState -> availableNow trigger -> memory sink - and returns
the drained result as a batch frame. The per-key state machine is not
SQL-expressible, but its FINAL state is (running counters = group
aggregates), so the oracle fully attests the stateful path end to end.

Scale: state lives in the state store partitioned by user_id across
executors; each micro-batch touches only the keys it contains. The memory
sink is test/driver plumbing only - production uses a parquet/Kafka sink with
the same checkpointed exactly-once semantics.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register


def drain_or_raise(query, desc: str, timeout_s: int = 300) -> None:
    """Await a bounded (availableNow) streaming query; if it has not
    terminated within `timeout_s`, stop it and raise TimeoutError instead
    of proceeding - a partially drained sink would silently return
    undercounted state, the worst failure mode for a correctness gate.
    (Regression-pinned in tests/test_round4_ops.py: the False branch must
    raise, never fall through.)"""
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"{desc} did not drain within {timeout_s}s; sink would be partial"
        )


def _stage_ordered_files(scratch: str, src_dir: str, stages) -> None:
    """Write each stage DataFrame as one parquet file into src_dir with
    strictly increasing mtimes, so the file stream source (oldest-first)
    drains them as micro-batches in exactly this order."""
    import shutil
    import time as _time

    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    for i, df in enumerate(stages):
        part_dir = os.path.join(scratch, f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(part_dir)
        src = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        dst = os.path.join(src_dir, f"batch-{i}.parquet")
        shutil.move(os.path.join(part_dir, src), dst)
        t = _time.time() - 300 + i * 10
        os.utime(dst, (t, t))


@register(
    "stream_stateful_user_counters",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_ts_us
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("streaming", "stateful", "U"),
)
def stream_stateful_user_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running counters maintained by applyInPandasWithState,
    executed through the real streaming engine (availableNow drain of the
    events file source). Update-mode emits a row per (key, micro-batch); the
    final-state projection takes the max per key (counters are monotone), so
    the result is batch-deterministic and the oracle is the plain group
    aggregate the state machine converges to. The float sum_value column
    stays internal (stream-order float accumulation is not bit-portable);
    the attested columns are exact integers."""
    from nyc_analytics_database_platform_spark.streaming.stateful import (
        running_user_counters,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream", tag)
    ckpt = os.path.join(scratch, "user_counters_ckpt")

    # The file stream source needs a directory; stage events as a 4-file
    # copy and drain 2 files per trigger so state genuinely crosses
    # micro-batch boundaries (update-mode emits per-batch rows and the
    # final-state projection below folds them).
    events = load(spark, sf_dir, "events")
    src_dir = os.path.join(scratch, "events_files")
    events.repartition(4).write.mode("overwrite").parquet(src_dir)
    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    counters = running_user_counters(source)
    # A leftover checkpoint marks the source file as already consumed, which
    # would drain zero batches and leave the sink empty - each invocation is
    # a fresh bounded run, so reset it.
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    name = f"stateful_user_counters_{tag}"
    q = (
        counters.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # availableNow should drain in seconds; timeout -> loud failure.
    drain_or_raise(q, "stateful user-counter stream")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_ts_us").alias("last_ts_us"),
        )
        .orderBy("user_id")
    )


@register(
    "stream_watermark_late_drop",
    oracle="""
        WITH mx AS (SELECT MAX(ts) AS m FROM events)
        SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS window_start_s,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events, mx
        WHERE epoch(date_trunc('day', ts)) + 86400 <= epoch(m) - 259200
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("streaming", "watermark", "executed"),
)
def stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED watermark semantics, both halves attested at once: (1) LATE
    DATA IS DROPPED - the source is staged as three files drained one per
    micro-batch (days 1-10, days 11-20, then a batch that REPLAYS days
    1-5 alongside days 21-30; by then the watermark sits near day 17, so
    every replayed row's window is closed and the duplicates must NOT
    inflate the counts); (2) APPEND MODE EMITS EXACTLY THE CLOSED WINDOWS
    - daily windows whose end <= final watermark (max ts - 3 days). The
    oracle states both rules declaratively: per-day counts WITHOUT
    duplicate inflation, restricted to closed windows - it matches if and
    only if the streaming engine dropped all replayed lates and emitted
    precisely the watermark-closed set. File order is pinned by explicit
    mtimes (the file source processes oldest-first). At scale this is the
    standard bounded-state contract: watermark delay caps state size and
    lateness tolerance in one knob."""
    tag = hashlib.md5((sf_dir + ":latedrop").encode()).hexdigest()[:8]
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream", tag)
    ckpt = os.path.join(scratch, "late_drop_ckpt")
    src_dir = os.path.join(scratch, "late_drop_files")

    events = load(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    stages = [
        events.filter(day <= 10),
        events.filter((day > 10) & (day <= 20)),
        # batch 2: replayed lates (days 1-5, already behind the watermark)
        # plus the on-time tail
        events.filter(day <= 5).unionByName(events.filter(day > 20)),
    ]
    _stage_ordered_files(scratch, src_dir, stages)

    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = (
        source.withWatermark("ts", "3 days")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"), "n_events"
        )
    )
    name = f"late_drop_{tag}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, "watermark late-drop stream")
    return spark.table(name).orderBy("window_start_s")


@register(
    "stream_dedupe_state_eviction",
    oracle="""
        SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("streaming", "watermark", "dedup", "executed"),
)
def stream_dedupe_state_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED dropDuplicatesWithinWatermark - both guards of the
    bounded-state dedup contract in one oracle: (1) duplicates arriving
    while the key's state lives are DROPPED (batch 0 carries days 1-10
    plus same-id copies of days 8-10 - none may survive); (2) rows behind
    the watermark are dropped as LATE before dedup even sees them (batch
    2 replays days 1-5 when the watermark sits near day 17 - none may
    reappear; this is also WHY the state eviction at ts + delay is safe:
    any would-be duplicate past the horizon is excluded by the lateness
    filter first). Expected per-day counts are therefore exactly the
    original counts; a failed dedup doubles days 8-10, a failed lateness
    filter doubles days 1-5, and either hash-mismatches. State size is
    bounded by (arrival rate x watermark delay) - the production dedup
    form for unbounded key domains."""
    tag = hashlib.md5((sf_dir + ":dedupevict").encode()).hexdigest()[:8]
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream", tag)
    ckpt = os.path.join(scratch, "dedupe_evict_ckpt")
    src_dir = os.path.join(scratch, "dedupe_evict_files")

    events = load(spark, sf_dir, "events").select("event_id", "ts")
    day = F.dayofmonth("ts")
    stages = [
        # in-batch duplicates for days 8-10: must be deduped (state live)
        events.filter(day <= 10).unionByName(
            events.filter((day >= 8) & (day <= 10))
        ),
        events.filter((day > 10) & (day <= 20)),
        # replay of days 1-5: behind the watermark -> dropped as late
        events.filter(day <= 5).unionByName(events.filter(day > 20)),
    ]
    _stage_ordered_files(scratch, src_dir, stages)

    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    deduped = source.withWatermark("ts", "3 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = f"dedupe_evict_{tag}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, "dedupe state-eviction stream")
    return (
        spark.table(name)
        .groupBy(F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_s"))
        .agg(F.count("*").alias("n_rows"))
        .orderBy("day_s")
    )


@register(
    "stream_foreachbatch_upsert_executed",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_ts_us
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("streaming", "sink", "executed", "U"),
)
def stream_foreachbatch_upsert_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE delivery to a NON-transactional store, executed:
    per-user running counters stream (update mode, 2 files/trigger) into a
    foreachBatch sink that MERGEs each micro-batch into a parquet target
    by key with an atomic directory swap, journaling applied batch ids so
    a replayed batch is a no-op (streaming/sinks.py; replay safety is
    separately test-pinned by invoking the sink twice with one batch id).
    Because counter state is cumulative, the last emission per key IS its
    converged total, so the final target equals the plain batch aggregate
    - the oracle. This is the production sink path the memory-sink
    registrations deliberately stub; at 100 TB the same anti-join + union
    merge lands in a transactional table format whose commit log replaces
    the journal."""
    from nyc_analytics_database_platform_spark.streaming.sinks import (
        idempotent_upsert_sink,
    )

    tag = hashlib.md5((sf_dir + ":febu").encode()).hexdigest()[:8]
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream", tag)
    ckpt = os.path.join(scratch, "febu_ckpt")
    src_dir = os.path.join(scratch, "febu_files")
    target = os.path.join(scratch, "febu_target")
    journal = os.path.join(scratch, "febu_journal")

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(src_dir)
    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    counters = source.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
    )
    q = (
        counters.writeStream.foreachBatch(
            idempotent_upsert_sink(target, journal, "user_id")
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, "foreachBatch upsert stream")
    return spark.read.parquet(target).orderBy("user_id")


@register(
    "stream_left_outer_join_executed",
    oracle="""
        SELECT p.event_id AS purchase_id,
               p.user_id,
               CAST(epoch_us(p.ts) AS BIGINT) AS p_ts_us,
               CAST(COUNT(c.event_id) AS BIGINT) AS clicks_10m
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts <  p.ts
        GROUP BY 1, 2, 3
        ORDER BY purchase_id
    """,
    tags=("streaming", "interval-join", "outer", "executed"),
)
def stream_left_outer_join_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED stream-stream LEFT OUTER interval join - the semantics the
    inner join cannot show: an unmatched purchase emits its null row only
    once the WATERMARK proves no qualifying click can still arrive (state
    closure, not match, triggers emission). Purchases and clicks are two
    filtered views of ONE watermarked file stream (watermark assigned
    BEFORE the type filters, so every event advances it); a sentinel
    'flush' row staged 2 hours past the last event pushes the final
    watermark beyond every purchase's join window, and the closing
    batches then emit ALL pending unmatched rows - making the drained
    sink equal the batch LEFT join exactly, zero-click purchases
    included. The oracle is that batch left join rolled up per purchase
    (COUNT(c.event_id) counts 0 for unmatched). 30-minute watermarks
    bound both sides' state; the sentinels ride each side's own filter
    (pushdown puts the filters below the event-time tracker - see
    _flush) under user_id -1 and are dropped from the drained sink.
    Inner twin: stream_interval_join_executed."""
    tag = hashlib.md5((sf_dir + ":ssloj").encode()).hexdigest()[:8]
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream", tag)
    ckpt = os.path.join(scratch, "ssloj_ckpt")
    src_dir = os.path.join(scratch, "ssloj_files")

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    bounds = events.agg(
        F.max("ts").alias("mx"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_p"
        ),
    ).head()
    def _flush(hours: int):
        # One sentinel PER JOIN SIDE: Catalyst pushes the event_type
        # filters into the parquet scan - BELOW the event-time tracker -
        # so a row that survives neither filter never advances either
        # side's watermark (measured: a 'flush'-typed row reads as 0
        # source rows). The sentinels use user_id -1 (matches nothing)
        # and are dropped from the drained sink by purchase_id >= 0.
        rows = []
        for i, etype in enumerate(("purchase", "click")):
            rows.append(
                events.limit(1).select(
                    F.lit(-1 - i)
                    .cast(events.schema["event_id"].dataType)
                    .alias("event_id"),
                    F.lit(-1)
                    .cast(events.schema["user_id"].dataType)
                    .alias("user_id"),
                    F.lit(etype).alias("event_type"),
                    (F.lit(bounds["mx"]) + F.expr(f"INTERVAL {hours} HOURS")).alias(
                        "ts"
                    ),
                )
            )
        return rows[0].unionByName(rows[1])

    # Four micro-batches: pre/post split (cross-batch join state, as in
    # the inner twin - split at the first purchase so its in-window clicks
    # buffer in batch 0) and TWO watermark-flush sentinel batches:
    # outer-join null emission in batch k applies the watermark committed
    # at the end of batch k-1 (one-batch lag), so the first flush alone
    # leaves the final purchase's closure unproven - the second flush
    # batch emits under the first flush's watermark.
    stages = [
        events.filter(F.col("ts") < F.lit(bounds["first_p"])),
        events.filter(F.col("ts") >= F.lit(bounds["first_p"])),
        _flush(2),
        _flush(4),
    ]
    _stage_ordered_files(scratch, src_dir, stages)

    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withWatermark("ts", "30 minutes")
    )
    p = source.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = source.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "leftOuter",
    )
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    name = f"ssloj_{tag}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, "stream-stream left outer interval join")
    return (
        spark.table(name)
        .filter(F.col("purchase_id") >= 0)  # drop the watermark sentinels
        .groupBy(
            "purchase_id",
            F.col("p_user").alias("user_id"),
            F.unix_micros("p_ts").alias("p_ts_us"),
        )
        .agg(F.count("click_id").alias("clicks_10m"))
        .orderBy("purchase_id")
    )


@register(
    "stream_interval_join_executed",
    oracle="""
        SELECT p.event_id AS purchase_id,
               p.user_id,
               CAST(epoch_us(p.ts) AS BIGINT) AS p_ts_us,
               CAST(COUNT(*) AS BIGINT) AS clicks_10m
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts <  p.ts
        GROUP BY 1, 2, 3
        ORDER BY purchase_id
    """,
    tags=("streaming", "interval-join", "executed"),
)
def stream_interval_join_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED stream-stream interval join, drained across REAL
    micro-batch boundaries: purchases and clicks arrive as two
    watermarked streams over a 2-file staged source (1 file/trigger,
    mtime-pinned order) split exactly at the earliest matched purchase's
    timestamp, so its click is buffered in batch 0's join state and the
    purchase arrives in batch 1 - at least one match provably forms
    ACROSS the micro-batch boundary (the 30-minute watermark retains the
    click: it sits at most 10 minutes behind the split). Inner stream-stream joins emit on match (no window-close
    gating), so the drained sink equals the batch interval join exactly;
    the oracle is that batch join rolled up per purchase. The 30-minute
    watermarks bound BOTH sides' state to (rate x delay + interval) -
    the production contract that makes an unbounded two-stream join
    runnable at all. Batch twin: interval_join_click_counts (same
    operator, batch execution, left-join variant)."""
    tag = hashlib.md5((sf_dir + ":ssjoin").encode()).hexdigest()[:8]
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream", tag)
    ckpt = os.path.join(scratch, "ssj_ckpt")
    src_dir = os.path.join(scratch, "ssj_files")

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    from nyc_analytics_database_platform_spark.queries.streaming_join import (
        interval_join_clicks_before_purchase as _ij,
    )

    # Stage the batch boundary at the EARLIEST matched purchase's
    # timestamp (a 1-row parameter fetch, the _query_vec convention): its
    # click lands in batch 0 and the purchase in batch 1, so at least one
    # match is GUARANTEED to form across a micro-batch boundary - the
    # cross-batch state buffering is attested, not assumed.
    split_ts = (
        _ij(
            events.filter(F.col("event_type") == "purchase"),
            events.filter(F.col("event_type") == "click"),
        )
        .agg(F.min("p_ts"))
        .head()[0]
    )
    stages = [
        events.filter(F.col("ts") < F.lit(split_ts)),
        events.filter(F.col("ts") >= F.lit(split_ts)),
    ]
    _stage_ordered_files(scratch, src_dir, stages)

    source = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    from nyc_analytics_database_platform_spark.queries.streaming_join import (
        interval_join_clicks_before_purchase,
    )

    purchases = source.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", "30 minutes"
    )
    clicks = source.filter(F.col("event_type") == "click").withWatermark(
        "ts", "30 minutes"
    )
    joined = interval_join_clicks_before_purchase(purchases, clicks)
    name = f"ssj_{tag}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, "stream-stream interval join")
    return (
        spark.table(name)
        .groupBy(
            "purchase_id",
            "user_id",
            F.unix_micros("p_ts").alias("p_ts_us"),
        )
        .agg(F.count("*").alias("clicks_10m"))
        .orderBy("purchase_id")
    )


# --- executed stream-static spatial enrichment -------------------------------

_SP_DIST = (
    "sqrt(power((lat - f.flat) * 111320.0, 2)"
    " + power((lon - f.flon) * 84288.0, 2))"
)


@register(
    "stream_spatial_facility_counts",
    oracle="""
        WITH p AS (
            SELECT event_id,
                   40.5 + ((CAST(('0x' || substr(md5('lat:' || user_id), 1, 6))
                            AS BIGINT) + 0) / 16777216.0) * 0.4 AS lat,
                   -74.25 + ((CAST(('0x' || substr(md5('lon:' || user_id), 1, 6))
                              AS BIGINT) + 0) / 16777216.0) * 0.5 AS lon
            FROM events WHERE event_type = 'purchase'
        ),
        fac AS (
            SELECT s_suppkey AS fid,
                   40.5 + ((CAST(('0x' || substr(md5('lat:' || s_suppkey), 1, 6))
                            AS BIGINT) + 0) / 16777216.0) * 0.4 AS flat,
                   -74.25 + ((CAST(('0x' || substr(md5('lon:' || s_suppkey), 1, 6))
                              AS BIGINT) + 0) / 16777216.0) * 0.5 AS flon
            FROM supplier
        ),
        best AS (
            SELECT p.event_id, f.fid,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.event_id
                       ORDER BY sqrt(power((lat - f.flat) * 111320.0, 2)
                                     + power((lon - f.flon) * 84288.0, 2)),
                                f.fid) AS rk
            FROM p, fac f
        )
        SELECT fid AS facility_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM best WHERE rk = 1
        GROUP BY fid
        ORDER BY facility_id
    """,
    tags=("streaming", "stream-static", "spatial"),
)
def stream_spatial_facility_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED streaming spatial enrichment: purchase events stream
    through the real engine (file source, 2-files-per-trigger drain) and
    each event is geofence-assigned to its nearest facility INSIDE the
    stateless projection - the tiny facility dim rides in as ONE broadcast
    row holding an array of (fid, lat, lon) structs, and the argmin is an
    array_min over per-facility distance structs (dist, fid struct order =
    nearest-then-smallest-id, matching the oracle's rank). Per-facility
    counts aggregate in complete mode across micro-batches. Coordinates
    and distance follow parity_spatial's md5 + fixed-meters-per-degree
    convention, so the assignment is bit-identical in both engines.

    Scale: the stream side never shuffles before the bounded-key count
    (the argmin is projection-local); the static side is k facility rows
    broadcast once - the geofence-dispatch shape (order -> nearest store)
    at any stream rate. The truncated 24-bit hash fraction here (vs the
    48-bit batch variant) keeps the oracle literal readable; resolution
    ~6e-8 deg is still sub-centimeter."""
    import shutil
    import time as _time

    from nyc_analytics_database_platform_spark.queries.parity_spatial import (
        _LAT0,
        _LAT_SPAN,
        _LON0,
        _LON_SPAN,
    )

    def point(df: DataFrame, key: str) -> DataFrame:
        lat = F.lit(_LAT0) + (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("", F.lit("lat:"), F.col(key))), 1, 6
                ),
                16,
                10,
            ).cast("long")
            / F.lit(16777216.0)
        ) * F.lit(_LAT_SPAN)
        lon = F.lit(_LON0) + (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("", F.lit("lon:"), F.col(key))), 1, 6
                ),
                16,
                10,
            ).cast("long")
            / F.lit(16777216.0)
        ) * F.lit(_LON_SPAN)
        return df.withColumn("lat", lat).withColumn("lon", lon)

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    scratch = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream", tag + "_spatial"
    )
    ckpt = os.path.join(scratch, "ckpt")
    src_dir = os.path.join(scratch, "events_files")
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(src_dir)

    fac_row = (
        point(
            load(spark, sf_dir, "supplier").select(
                F.col("s_suppkey").alias("fid")
            ),
            "fid",
        )
        .select(F.struct("fid", F.col("lat").alias("flat"),
                         F.col("lon").alias("flon")).alias("f"))
        .agg(F.collect_list("f").alias("facs"))
        .withColumn("k", F.lit(1))
    )

    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    stream = point(
        source.filter(F.col("event_type") == "purchase"), "user_id"
    ).withColumn("k", F.lit(1))
    assigned = stream.join(F.broadcast(fac_row), "k").withColumn(
        "best",
        F.expr(
            f"array_min(transform(facs, f -> named_struct("
            f"'dist', {_SP_DIST}, 'fid', f.fid)))"
        ),
    )
    counts = assigned.groupBy(
        F.col("best.fid").alias("facility_id")
    ).agg(F.count("*").alias("n_purchases"))

    shutil.rmtree(ckpt, ignore_errors=True)
    name = f"spatial_facility_counts_{tag}"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, "spatial facility-count stream")
    return spark.table(name).orderBy("facility_id")


@register(
    "stream_weighted_reservoir",
    oracle="""
        WITH keyed AS (
            SELECT doc_id, source,
                   ROUND(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                             / 4294967296.0) / n_chars * 1e9) AS k
            FROM documents
            WHERE n_chars > 0
        ),
        ranked AS (
            SELECT source, doc_id, CAST(k AS BIGINT) AS es_key,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY k, doc_id) AS rk
            FROM keyed
        )
        SELECT source, CAST(rk AS INT) AS rk, doc_id, es_key
        FROM ranked WHERE rk <= 5
        ORDER BY source, rk
    """,
    tags=("streaming", "stateful", "sampling", "U"),
)
def stream_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming weighted sampling without replacement: the per-source
    Efraimidis-Spiridakis reservoir (k = 5 smallest -ln(u)/w keys)
    maintained across micro-batches by applyInPandasWithState, executed
    through the real streaming engine (availableNow drain of a staged
    4-file document source, 2 files per trigger so state genuinely
    crosses batch boundaries).

    Why this stateful op has an EXACT SQL oracle (most have rows-only
    checks): top-k selection over a multiset is associative and
    commutative, so the final reservoir equals the batch A-ES sample
    regardless of how the stream was chopped - the oracle is the plain
    windowed rank cut. The transcendental key is computed JVM-SIDE in the
    streaming select (identical expression to weighted_sample_es_topk,
    pinned at 1e-9), so the state machine compares only integers.

    Scale shape: state is k longs per source key, partitioned across
    executors; each micro-batch touches only sources present in it."""
    from nyc_analytics_database_platform_spark.streaming.stateful import (
        weighted_reservoir,
    )

    tag = hashlib.md5((sf_dir + "wres").encode()).hexdigest()[:8]
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream", tag)
    ckpt = os.path.join(scratch, "wres_ckpt")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    src_dir = os.path.join(scratch, "docs_files")
    docs.repartition(4).write.mode("overwrite").parquet(src_dir)
    source = (
        spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    keyed = source.filter(F.col("n_chars") > 0).select(
        "source",
        "doc_id",
        F.round(
            -F.log(
                (
                    F.conv(
                        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    + 1
                )
                / 4294967296.0
            )
            / F.col("n_chars")
            * 1e9
        )
        .cast("long")
        .alias("es_key"),
    )
    res = weighted_reservoir(keyed)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    name = f"weighted_reservoir_{tag}"
    q = (
        res.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, "weighted reservoir stream")
    emitted = spark.table(name)
    # final state per source = the emission with the max (monotone) n_seen;
    # a partitioned max-window instead of a sink self-join (the memory
    # sink's View cannot appear on both sides of a join in Spark 4.1)
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    return (
        emitted.withColumn("_mx", F.max("n_seen").over(w))
        .filter(F.col("n_seen") == F.col("_mx"))
        .select("source", "rk", "doc_id", "es_key")
        # the memory sink is NOT idempotent under micro-batch retry: a
        # replayed trigger re-appends identical rows, which would surface
        # here as duplicated reservoir rows and break exact-row parity
        .dropDuplicates(["source", "rk"])
        .orderBy("source", "rk")
    )


@register(
    "stream_scd2_maintenance_executed",
    # Oracle: CLOSED intervals of the batch SCD2 build (the open run per
    # key lives in the state store, not the emitted stream).
    oracle="""
        WITH ordered AS (
            SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
                   lag(o_orderstatus) OVER w AS prev_status
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ),
        ch AS (
            SELECT * FROM ordered
            WHERE prev_status IS NULL OR o_orderstatus <> prev_status
        ),
        iv AS (
            SELECT o_custkey AS custkey, o_orderstatus AS status,
                   epoch_us(o_orderdate) AS vf_us,
                   epoch_us(lead(o_orderdate) OVER w2) AS vt_us,
                   CAST(ROW_NUMBER() OVER w2 AS INT) AS version
            FROM ch
            WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        )
        SELECT custkey, status, vf_us, vt_us, version
        FROM iv
        WHERE vt_us IS NOT NULL
        ORDER BY custkey, version
    """,
    tags=("streaming", "scd2", "stateful", "executed", "incremental"),
)
def stream_scd2_maintenance_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 maintenance as a STREAM, executed end-to-end: the orders log
    drains chronologically (4 ordered files, 1 per trigger) through an
    applyInPandasWithState state machine (streaming/stateful.
    scd2_closed_intervals) that keeps each key's open run in the state
    store and emits a row the moment a run CLOSES - the streaming twin of
    operators/maintenance.scd2_apply_changes, with micro-batches playing
    the role of log tails. The batch oracle's closed intervals must match
    row-for-row: versions continue across micro-batch boundaries and runs
    spanning batches close with the exact original valid_from. At 100 TB
    this is the always-on form: per-key state is one tiny open-run tuple
    in RocksDB, and each trigger touches only the keys present in it."""
    import shutil

    tag = hashlib.md5((sf_dir + ":scd2m").encode()).hexdigest()[:8]
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream", tag)
    src_dir = os.path.join(scratch, "files")
    ckpt = os.path.join(scratch, "ckpt")

    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_micros("o_orderdate").alias("ts_us"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
    )
    cuts = ["1997-01-01", "1998-07-01", "2000-01-01"]
    cuts_us = [
        F.unix_micros(F.lit(c).cast("timestamp")) for c in cuts
    ]
    stages = [
        orders.filter(F.col("ts_us") < cuts_us[0]),
        orders.filter((F.col("ts_us") >= cuts_us[0]) & (F.col("ts_us") < cuts_us[1])),
        orders.filter((F.col("ts_us") >= cuts_us[1]) & (F.col("ts_us") < cuts_us[2])),
        orders.filter(F.col("ts_us") >= cuts_us[2]),
    ]
    _stage_ordered_files(scratch, src_dir, stages)

    from nyc_analytics_database_platform_spark.streaming.stateful import (
        scd2_closed_intervals,
    )

    source = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sink_name = f"scd2m_{tag}"
    q = (
        scd2_closed_intervals(source)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        drain_or_raise(q, "streaming SCD2 maintenance")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.table(sink_name).orderBy("custkey", "version")


@register(
    "stream_session_maintenance_executed",
    # Oracle: batch sessionization minus each user's LAST (still-open)
    # session - only closed sessions are emitted by the stream.
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        ),
        m AS (
            SELECT *,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w >= 300000000
                        THEN 1 ELSE 0 END AS ns
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        s AS (
            SELECT *, SUM(ns) OVER (
                PARTITION BY user_id ORDER BY us, event_id
                ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM m
        ),
        agg AS (
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   MIN(us) AS start_us, MAX(us) AS end_us,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, session_seq
        ),
        lastmark AS (
            SELECT *, MAX(session_seq) OVER (PARTITION BY user_id) AS mx
            FROM agg
        )
        SELECT user_id, session_seq, start_us, end_us, n_events
        FROM lastmark WHERE session_seq < mx
        ORDER BY user_id, session_seq
    """,
    tags=("streaming", "session", "stateful", "executed", "incremental"),
)
def stream_session_maintenance_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as an always-on STREAM, executed end-to-end: events
    drain chronologically (4 ordered files, 1/trigger) through an
    applyInPandasWithState state machine (streaming/stateful.
    session_closed_windows) holding each user's OPEN session and emitting
    a row the moment a session CLOSES (>= 5-minute gap, the sessionize /
    session_window convention) - the streaming twin of operators/
    maintenance.merge_session_tables, with sessions spanning micro-batch
    boundaries merged in state exactly as the batch seam rule merges
    tables. The batch oracle drops each user's last (still-open) session;
    everything else must match row-for-row, seq numbering included. At
    100 TB state is one open-session tuple per active user and each
    trigger touches only the users present in it."""
    import shutil

    tag = hashlib.md5((sf_dir + ":sessm").encode()).hexdigest()[:8]
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream", tag)
    src_dir = os.path.join(scratch, "files")
    ckpt = os.path.join(scratch, "ckpt")

    events = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    cuts = ["2024-01-08", "2024-01-16", "2024-01-23"]
    cuts_us = [F.unix_micros(F.lit(c).cast("timestamp")) for c in cuts]
    stages = [
        events.filter(F.col("ts_us") < cuts_us[0]),
        events.filter((F.col("ts_us") >= cuts_us[0]) & (F.col("ts_us") < cuts_us[1])),
        events.filter((F.col("ts_us") >= cuts_us[1]) & (F.col("ts_us") < cuts_us[2])),
        events.filter(F.col("ts_us") >= cuts_us[2]),
    ]
    _stage_ordered_files(scratch, src_dir, stages)

    from nyc_analytics_database_platform_spark.streaming.stateful import (
        session_closed_windows,
    )

    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sink_name = f"sessm_{tag}"
    q = (
        session_closed_windows(source)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        drain_or_raise(q, "streaming session maintenance")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.table(sink_name).orderBy("user_id", "session_seq")
