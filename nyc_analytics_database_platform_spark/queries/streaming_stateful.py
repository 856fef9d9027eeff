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
