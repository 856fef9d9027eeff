"""Operator invariants for the lifecycle family (sessions / SCD2 /
incremental aggregate maintenance) — properties the DuckDB oracle can't
express: partition-independence, interval algebra, merge associativity."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.incremental import (
    merge_partials,
    partial_agg,
)
from nyc_analytics_database_platform_spark.operators.scd import scd2_intervals
from nyc_analytics_database_platform_spark.operators.sessions import sessionize


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_sessionize_partition_independent(spark, sf_dir):
    """Session assignment is a function of the data, not the physical layout."""
    events = load(spark, sf_dir, "events")
    a = sessionize(events, "user_id", "ts", 300, order_cols=("event_id",))
    b = sessionize(
        events.repartition(7, "event_type"), "user_id", "ts", 300, order_cols=("event_id",)
    )
    assert _rows(a, "event_id", "session_seq") == _rows(b, "event_id", "session_seq")


def test_sessionize_gap_extremes(spark, sf_dir):
    """gap=0 -> every event its own session; huge gap -> one session per key."""
    events = load(spark, sf_dir, "events")
    singletons = sessionize(events, "user_id", "ts", 0, order_cols=("event_id",))
    per_key = singletons.groupBy("user_id").agg(
        F.count("*").alias("n"), F.max("session_seq").alias("mx")
    )
    assert per_key.filter(F.col("n") != F.col("mx")).count() == 0

    one = sessionize(events, "user_id", "ts", 10**9, order_cols=("event_id",))
    assert one.filter(F.col("session_seq") != 1).count() == 0


def test_scd2_interval_algebra(spark, sf_dir):
    """Intervals chain exactly: next valid_from == previous valid_to, exactly
    one open (is_current) interval per key, and versions are 1..n dense."""
    orders = load(spark, sf_dir, "orders")
    scd = scd2_intervals(
        orders, "o_custkey", "o_orderdate", ("o_orderstatus",), order_cols=("o_orderkey",)
    ).cache()
    try:
        per_key = scd.groupBy("o_custkey").agg(
            F.sum(F.col("is_current").cast("int")).alias("n_open"),
            F.count("*").alias("n"),
            F.max("version").alias("max_v"),
            F.min("version").alias("min_v"),
        )
        bad = per_key.filter(
            (F.col("n_open") != 1) | (F.col("max_v") != F.col("n")) | (F.col("min_v") != 1)
        )
        assert bad.count() == 0

        nxt = scd.select(
            "o_custkey", F.col("version").alias("v2"), F.col("valid_from").alias("vf2")
        )
        chained = scd.join(
            nxt,
            (scd.o_custkey == nxt.o_custkey) & (scd.version + 1 == nxt.v2),
            "inner",
        )
        assert chained.filter(F.col("valid_to") != F.col("vf2")).count() == 0
    finally:
        scd.unpersist()


def test_scd2_no_adjacent_equal_values(spark, sf_dir):
    """Consecutive versions always differ in the tracked attribute."""
    orders = load(spark, sf_dir, "orders")
    scd = scd2_intervals(
        orders, "o_custkey", "o_orderdate", ("o_orderstatus",), order_cols=("o_orderkey",)
    )
    cur = scd.select("o_custkey", "version", F.col("o_orderstatus").alias("s1"))
    nxt = scd.select(
        F.col("o_custkey").alias("k2"), (F.col("version") - 1).alias("v2"),
        F.col("o_orderstatus").alias("s2"),
    )
    pairs = cur.join(nxt, (cur.o_custkey == nxt.k2) & (cur.version == nxt.v2))
    assert pairs.filter(F.col("s1") == F.col("s2")).count() == 0


def test_incremental_merge_associative_and_exact(spark, sf_dir):
    """Merging 3 arbitrary splits == single-pass aggregate, bit-exact."""
    orders = load(spark, sf_dir, "orders")
    parts = [
        partial_agg(orders.filter(F.col("o_orderkey") % 3 == i), ["o_orderpriority"],
                    "o_totalprice")
        for i in range(3)
    ]
    merged = merge_partials(parts, ["o_orderpriority"])
    direct = partial_agg(orders, ["o_orderpriority"], "o_totalprice")
    cols = ["o_orderpriority", "n", "sum_dec", "min_v", "max_v"]
    assert _rows(merged, *cols) == _rows(direct, *cols)


def test_snapshot_diff_null_semantics(spark):
    """Null-safe digests: null vs 'null-string' must differ; null == null must
    not read as changed; null keys match null-safely."""
    from nyc_analytics_database_platform_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "N"), (None, "a")],
        "k int, v string",
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, None), (None, "b")],
        "k int, v string",
    )
    got = {
        (r["k"], r["change_type"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # k=1: null -> null is unchanged; k=2: value -> null changed;
    # k=3: a string equal to the null marker vs real null MUST read as changed;
    # k=null: matches null-safely, a -> b changed.
    assert got == {(2, "changed"), (3, "changed"), (None, "changed")}
