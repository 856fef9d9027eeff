"""Custom stateful streaming operator (applyInPandasWithState) across real
micro-batch boundaries, and the salted-join skew utility."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.joins import salted_join
from nyc_analytics_database_platform_spark.streaming.stateful import running_user_counters

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def test_stateful_counters_across_microbatches(spark, sf_dir):
    """State must accumulate across micro-batches: split events into 4 files,
    force one file per trigger, and check the final per-user totals equal the
    batch aggregate."""
    src = os.path.join(TMP, f"events_state_{uuid.uuid4().hex[:8]}")
    ckpt = os.path.join(TMP, f"ckpt_{uuid.uuid4().hex[:8]}")
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(src)
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            running_user_counters(stream)
            .writeStream.format("memory")
            .queryName("t_state")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.lastProgress["batchId"] >= 3, "expected multiple micro-batches"
        # memory sink in update mode appends each emission; the LAST row per
        # user is the final running total
        out = spark.sql(
            """
            SELECT user_id, n_events, sum_value FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY n_events DESC) AS rn
                FROM t_state
            ) WHERE rn = 1
            """
        ).collect()
        expect = {
            r["user_id"]: (r["n"], r["s"])
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in out}
        assert set(got) == set(expect)
        for uid, (n, s) in expect.items():
            assert got[uid][0] == n
            assert got[uid][1] == pytest.approx(s, rel=1e-9)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_salted_join_equals_plain_join(spark):
    """Salting is distribution-only: results identical to the plain join,
    including a pathologically skewed key."""
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 500), (3, 501)], "k int, row_id int"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k int, v string")
    plain = left.join(right, "k")
    salted = salted_join(left, right, on="k", salt_by="row_id", n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert salted.count() == 501


def test_salt_is_deterministic_and_balanced(spark):
    """The salt must be a pure function of the salt_by column (a rand() salt
    corrupts results on task retry - Spark may recompute a partition) and
    must spread a hot key's rows across all n_salts buckets."""
    from pyspark.sql import functions as F

    n = 40_000
    hot = spark.range(n).select(
        F.lit(1).alias("k"), F.col("id").alias("row_id")
    )
    salt = F.pmod(F.xxhash64(F.col("row_id")), F.lit(8))
    once = hot.select(salt.alias("s")).groupBy("s").count().collect()
    twice = (
        hot.repartition(13)
        .select(salt.alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))  # layout-independent
    counts = {r["s"]: r["count"] for r in once}
    assert len(counts) == 8
    assert max(counts.values()) < 2 * n / 8  # no bucket more than 2x fair share
