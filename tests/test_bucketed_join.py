"""Bucketing evidence (SCALE.md Layout): two tables bucketed on the join key
join WITHOUT a shuffle - the plan shows no Exchange between the bucketed
scans and the SortMergeJoin."""

from __future__ import annotations

import contextlib
import io
import os
import shutil

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.sources.layout import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    wh = os.path.abspath("spark-warehouse")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    for name, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        write_bucketed_table(load(spark, sf_dir, name), f"b_{name}", key, 8)
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(wh, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    joined = spark.table("b_orders").join(
        spark.table("b_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    # correctness: same count as the unbucketed join
    plain = load(spark, sf_dir, "orders").join(
        load(spark, sf_dir, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    assert joined.count() == plain.count()
