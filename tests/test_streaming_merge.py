"""Streaming CDC apply: a change-batch stream merged into a parquet snapshot
via foreachBatch + operators/merge.merge_upsert must converge to the same
state as applying the batches in batch mode - the streaming half of the
MERGE surface (the copy-on-write commit loop a production table runs per
trigger)."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.merge import OP_COL, merge_upsert

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def test_stream_merge_converges_to_batch_merge(spark, sf_dir):
    base = os.path.join(TMP, f"stream_merge_{uuid.uuid4().hex[:8]}")
    target_dir = os.path.join(base, "target")
    cdc_dir = os.path.join(base, "cdc")
    ckpt_dir = os.path.join(base, "ckpt")
    os.makedirs(cdc_dir, exist_ok=True)
    try:
        orders = load(spark, sf_dir, "orders")
        orders.write.parquet(target_dir)
        key = F.col("o_orderkey")

        # two key-disjoint CDC batches (order-independent final state)
        upd = (
            orders.filter(key % 10 == 3)
            .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(5.0))
            .withColumn(OP_COL, F.lit("U"))
        )
        dels_ins = (
            orders.filter(key % 10 == 1).withColumn(OP_COL, F.lit("D"))
        ).unionByName(
            orders.filter(key % 10 == 7)
            .withColumn("o_orderkey", key + F.lit(10_000_000))
            .withColumn(OP_COL, F.lit("U"))
        )
        upd.coalesce(1).write.parquet(os.path.join(cdc_dir, "batch1"))
        dels_ins.coalesce(1).write.parquet(os.path.join(cdc_dir, "batch2"))

        cdc_schema = upd.schema

        def apply_batch(batch_df, _batch_id):
            sess = batch_df.sparkSession
            merged = merge_upsert(
                sess.read.parquet(target_dir), batch_df, "o_orderkey"
            )
            staged = target_dir + ".staged"
            merged.write.mode("overwrite").parquet(staged)
            old = target_dir + ".old"
            os.rename(target_dir, old)
            os.rename(staged, target_dir)
            shutil.rmtree(old)

        q = (
            spark.readStream.schema(cdc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(cdc_dir, "*"))
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        expected = merge_upsert(merge_upsert(orders, upd, "o_orderkey"), dels_ins, "o_orderkey")
        got = spark.read.parquet(target_dir)
        assert got.count() == expected.count()
        exp_agg = expected.agg(
            F.sum("o_orderkey").alias("k"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("p"),
        ).collect()[0]
        got_agg = got.agg(
            F.sum("o_orderkey").alias("k"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("p"),
        ).collect()[0]
        assert (got_agg["k"], got_agg["p"]) == (exp_agg["k"], exp_agg["p"])
        # deletes really gone, inserts really present
        assert got.filter((F.col("o_orderkey") % 10 == 1) & (key < 10_000_000)).count() == 0
        assert got.filter(key >= 10_000_000).count() == orders.filter(key % 10 == 7).count()
    finally:
        shutil.rmtree(base, ignore_errors=True)
