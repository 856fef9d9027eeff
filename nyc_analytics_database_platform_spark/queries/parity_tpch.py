"""Classic TPC-H-shaped queries on the driver tables - recognizable
benchmark plans exercising the full scan->join->agg->sort spine with exact
cross-engine numerics (decimal-cast sums), plus the constraint-audit query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.functions.numeric import exact_sum
from nyc_analytics_database_platform_spark.registry import register


@register(
    "tpch_q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                        AS DECIMAL(38,0))) AS DOUBLE) / 1e4 AS sum_disc_price,
               CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                             * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))
                        AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "A3"),
    bench=True,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate over a date-filtered fact scan.
    All arithmetic is exact and order-independent; derived expressions (disc
    price, charge) multiply in integer cents BEFORE any cast so both engines
    round the same product (the decimal-cast of a double PRODUCT hits
    engine-specific rounding modes - HALF_UP vs half-even - observed as a
    0.005 drift at sf0.01).

    Two-stage aggregation for speed + overflow safety: the full-table pass
    sums LONGS (cents / cent-products - ~2x faster than Spark's decimal
    aggregate buffer, measured at sf0.1) grouped by (keys, partition id), so
    a per-task partial never exceeds ~1e17 (bounded by
    spark.sql.files.maxPartitionBytes: a <=1e8-row task x <=1e11 per-row
    charge product); the tiny second stage combines the per-task partials
    as DECIMAL(38,0), where a 100 TB group count can no longer overflow.
    This is operators/incremental.py's mergeable-partial pattern applied
    inside one query."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    disc_pct = F.lit(100) - disc_c
    tax_pct = F.lit(100) + F.round(F.col("l_tax") * 100).cast("long")
    partial = (
        li.groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_p"))
        .agg(
            F.sum(qty_c).alias("qty_c"),
            F.sum(price_c).alias("price_c"),
            F.sum(price_c * disc_pct).alias("disc_c4"),
            F.sum(price_c * disc_pct * tax_pct).alias("charge_c6"),
            F.sum(disc_c).alias("disc_c"),
            F.count("*").alias("n"),
        )
    )
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)"))  # noqa: E731
    return (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (dec("qty_c").cast("double") / 1e2).alias("sum_qty"),
            (dec("price_c").cast("double") / 1e2).alias("sum_base_price"),
            (dec("disc_c4").cast("double") / 1e4).alias("sum_disc_price"),
            (dec("charge_c6").cast("double") / 1e6).alias("sum_charge"),
            (dec("qty_c").cast("double") / 1e2 / F.sum("n")).alias("avg_qty"),
            (dec("disc_c").cast("double") / 1e2 / F.sum("n")).alias("avg_disc"),
            F.sum("n").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                        AS DECIMAL(38,0))) AS DOUBLE) / 1e4 AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
               o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("tpch", "J2"),
    bench=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: three-way join with selective filters on every input,
    grouped revenue, top-10. Filters sit on the scans (pushdown) so the
    joins see reduced inputs; the top-10 is TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue_num = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("decimal(38,0)")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            "o_orderpriority",
        )
        .agg((F.sum(revenue_num).cast("double") / 1e4).alias("revenue"))
        .select("l_orderkey", "revenue", "order_day", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "data_quality_audit",
    oracle="""
        SELECT
            CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
            CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
            CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS bad_discount,
            CAST(SUM(CASE WHEN l_shipdate > TIMESTAMP '2026-08-13' THEN 1 ELSE 0 END) AS BIGINT)
              AS future_shipdate,
            CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkey,
            COUNT(*) AS total_rows
        FROM lineitem
    """,
    tags=("F9", "quality"),
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's DDL CHECK constraints as a one-pass audit (reference:
    schema.sql:31-35,43-44,70-73 - positivity, ranges, date sanity, NOT
    NULL), computed as conditional aggregates so a 100 TB audit is a single
    scan with map-side partials."""
    li = load(spark, sf_dir, "lineitem")
    def bad(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)
    return li.agg(
        bad(F.col("l_quantity") <= 0, "bad_quantity"),
        bad(F.col("l_extendedprice") <= 0, "bad_price"),
        bad((F.col("l_discount") < 0) | (F.col("l_discount") > 1), "bad_discount"),
        bad(F.col("l_shipdate") > F.lit("2026-08-13").cast("timestamp"), "future_shipdate"),
        bad(F.col("l_orderkey").isNull(), "null_orderkey"),
        F.count("*").alias("total_rows"),
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
        )
        SELECT c.c_name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               o.o_totalprice AS total_price,
               b.total_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
        LIMIT 100
    """,
    tags=("tpch", "A-ext", "J2", "O5"),
    bench=True,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): full-fact aggregate, a
    selective HAVING, then joins back to orders/customer. The classic plan
    trap is re-scanning lineitem to recompute the quantity sum inside the
    outer query (the spec's correlated IN) - here the aggregate is computed
    ONCE and its post-filter survivors (tiny: ~0.03% of orders) are
    BROADCAST into the orders join, so the only wide shuffle at any scale is
    the single lineitem hash-aggregate. TakeOrderedAndProject keeps the
    top-100 sort bounded. Deterministic tiebreak (orderkey) per the driver
    top-k discipline."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name",
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            "total_qty",
        )
        .orderBy(F.col("total_price").desc(), "order_date", "orderkey")
        .limit(100)
    )
