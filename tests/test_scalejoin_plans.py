"""Plan-shape evidence for the scale-join family (queries/parity_scalejoin.py):
the bucketed join really skips its shuffles, the partitioned join really
prunes at runtime, and the selective dim join really injects a bloom filter.
Value correctness is covered by the registered DuckDB oracles; these tests
pin the PHYSICAL plans the docstrings promise."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.queries.parity_scalejoin import (
    build_bucketed_pair,
    bucketed_join_colocated_revenue,
    dpp_partitioned_month_join,
    runtime_filter_part_revenue,
)


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _simple(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_plan_is_colocated(spark, sf_dir, no_broadcast):
    bo, bc = build_bucketed_pair(spark, sf_dir)
    per_cust = (
        spark.table(bo)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    seg = (
        per_cust.join(
            spark.table(bc).select("c_custkey", "c_mktsegment"),
            per_cust["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )
    plan = _simple(seg)
    assert "SortMergeJoin" in plan
    # the ONLY exchange is the final 5-row segment rollup; the per-customer
    # aggregate and the join itself are bucket-local
    assert plan.count("Exchange") == 1, plan
    fmt = _formatted(seg)
    assert "Bucketed: true" in fmt
    assert "SelectedBucketsCount" in fmt


def test_bucketed_layout_adopted_by_fresh_catalog(spark, sf_dir, no_broadcast):
    """Dropping the catalog entries and rebuilding must take the
    DDL-adoption path (files untouched) and still join without a shuffle -
    the 'new session adopts an existing layout' lifecycle."""
    bo, bc = build_bucketed_pair(spark, sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {bo}")
    spark.sql(f"DROP TABLE IF EXISTS {bc}")
    bo2, bc2 = build_bucketed_pair(spark, sf_dir)
    assert (bo2, bc2) == (bo, bc)
    joined = spark.table(bo2).join(
        spark.table(bc2), F.col("o_custkey") == F.col("c_custkey")
    )
    plan = _simple(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # adopted layout serves the same rows as the unlayouted source
    assert joined.count() == load(spark, sf_dir, "orders").join(
        load(spark, sf_dir, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).count()


def test_bucketed_query_matches_unlayouted_twin(spark, sf_dir):
    got = {
        r["c_mktsegment"]: (r["n_customers"], r["n_orders"], r["spend_cents"])
        for r in bucketed_join_colocated_revenue(spark, sf_dir).collect()
    }
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("spend_cents"),
        )
    )
    want = {
        r["c_mktsegment"]: (r["n_customers"], r["n_orders"], r["spend_cents"])
        for r in per_cust.join(
            load(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            F.sum("spend_cents").alias("spend_cents"),
        )
        .collect()
    }
    assert got == want


def test_dpp_plan_prunes_partitions_at_runtime(spark, sf_dir):
    df = dpp_partitioned_month_join(spark, sf_dir)
    fmt = _formatted(df)
    assert "dynamicpruningexpression" in fmt.lower(), fmt
    # the pruning subquery keys on the partition directory column
    assert "PartitionFilters" in fmt
    # Q1 only: every surviving month is 01/02/03
    months = [r["o_month"] for r in df.collect()]
    assert months and all(m[5:] in ("01", "02", "03") for m in months)


def test_runtime_bloom_filter_injected_when_forced(spark, sf_dir):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = runtime_filter_part_revenue(spark, sf_dir)
        fmt = _formatted(df)
        assert "bloom_filter_agg" in fmt, fmt
        assert "might_contain" in fmt, fmt
        forced = {
            (r["p_brand"], r["n_lines"], r["price_cents"]) for r in df.collect()
        }
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    # the injected filter changes no row
    plain = {
        (r["p_brand"], r["n_lines"], r["price_cents"])
        for r in runtime_filter_part_revenue(spark, sf_dir).collect()
    }
    assert forced == plain
