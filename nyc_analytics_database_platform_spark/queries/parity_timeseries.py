"""Time-series parity queries: monthly bucketing, month-spine densification,
and the windowed extensions (SURVEY.md sections 2.4 A6/A7, 2.3 J4, 2.5).

The month-spine left join is the one relational operator the reference
implements in application code (reference: server.py:319-342 - generate month
list, left-join aggregated months, fill 0 for counts / None for medians).
Here it is a declarative sequence() -> explode -> left join -> coalesce plan,
so Catalyst can push it around like any other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.timeseries import month_spine_densify
from nyc_analytics_database_platform_spark.registry import register


@register(
    "monthly_order_counts",
    oracle="""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               COUNT(*) AS num_orders
        FROM orders
        GROUP BY 1
        ORDER BY month
    """,
    tags=("A6", "F1", "F3", "O3"),
    bench=True,
)
def monthly_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed COUNT (reference: server.py:281-289 - monthly complaint
    counts via DATE_TRUNC). Scale: single hash-agg on a derived month key."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        )
        .agg(F.count("*").alias("num_orders"))
        .orderBy("month")
    )


@register(
    "monthly_median_price",
    oracle="""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
               COUNT(*) AS num_orders
        FROM orders
        GROUP BY 1
        ORDER BY month
    """,
    tags=("A7", "F1", "O3"),
)
def monthly_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month exact median + count (reference: server.py:291-302)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        )
        .agg(
            F.percentile("o_totalprice", 0.5).alias("median_price"),
            F.count("*").alias("num_orders"),
        )
        .orderBy("month")
    )


_SPINE_FILTER_SQL = """
    SELECT o.o_orderdate, o.o_totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey = 3
"""


def _nation3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 3).select(
        "c_custkey"
    )
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderdate", "o_totalprice"
    )


@register(
    "month_spine_zero_fill",
    oracle=f"""
        WITH f AS ({_SPINE_FILTER_SQL}),
        b AS (SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                     date_trunc('month', MAX(o_orderdate)) AS hi FROM f),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month_ts FROM b),
        m AS (SELECT date_trunc('month', o_orderdate) AS month_ts, COUNT(*) AS c
              FROM f GROUP BY 1)
        SELECT strftime(spine.month_ts, '%Y-%m') AS month,
               COALESCE(m.c, 0) AS num_orders
        FROM spine LEFT JOIN m USING (month_ts)
        ORDER BY month
    """,
    tags=("J4", "F4", "A6"),
    bench=True,
)
def month_spine_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-spine densification, zero-fill variant (reference:
    server.py:319-342, fill at :337-338). Gap months appear with count 0."""
    f = _nation3_orders(spark, sf_dir)
    agg = f.groupBy(F.date_trunc("month", "o_orderdate").alias("month_ts")).agg(
        F.count("*").alias("c")
    )
    dense = month_spine_densify(
        f, "o_orderdate", agg, fills={"num_orders": (F.col("c"), F.lit(0))}
    )
    return dense.select(
        F.date_format("month_ts", "yyyy-MM").alias("month"), "num_orders"
    ).orderBy("month")


@register(
    "month_spine_null_fill_median",
    oracle=f"""
        WITH f AS ({_SPINE_FILTER_SQL}),
        b AS (SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                     date_trunc('month', MAX(o_orderdate)) AS hi FROM f),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month_ts FROM b),
        m AS (SELECT date_trunc('month', o_orderdate) AS month_ts,
                     PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med
              FROM f GROUP BY 1)
        SELECT strftime(spine.month_ts, '%Y-%m') AS month,
               m.med AS median_price
        FROM spine LEFT JOIN m USING (month_ts)
        ORDER BY month
    """,
    tags=("J4", "F4", "A7"),
)
def month_spine_null_fill_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-spine densification, null-fill variant for medians (reference:
    server.py:339-340 - missing months keep None so charts span gaps)."""
    f = _nation3_orders(spark, sf_dir)
    agg = f.groupBy(F.date_trunc("month", "o_orderdate").alias("month_ts")).agg(
        F.percentile("o_totalprice", 0.5).alias("med")
    )
    dense = month_spine_densify(
        f, "o_orderdate", agg, fills={"median_price": (F.col("med"), None)}
    )
    return dense.select(
        F.date_format("month_ts", "yyyy-MM").alias("month"), "median_price"
    ).orderBy("month")


@register(
    "rolling_3m_avg_orders",
    oracle="""
        WITH m AS (
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                   COUNT(*) AS num_orders
            FROM orders GROUP BY 1
        )
        SELECT month, num_orders,
               AVG(num_orders) OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 AS rolling_avg
        FROM m ORDER BY month
    """,
    tags=("W-ext", "A6"),
)
def rolling_3m_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-month average over the monthly series - the frame-spec window
    extension (SURVEY.md section 2.5; no reference counterpart)."""
    orders = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("num_orders"))
    w = Window.orderBy("month").rowsBetween(-2, 0)
    return m.withColumn("rolling_avg", F.avg("num_orders").over(w)).orderBy("month")


@register(
    "cumulative_orders",
    oracle="""
        WITH m AS (
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                   COUNT(*) AS num_orders
            FROM orders GROUP BY 1
        )
        SELECT month, num_orders,
               CAST(SUM(num_orders) OVER (ORDER BY month
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS running_total,
               num_orders - LAG(num_orders) OVER (ORDER BY month) AS mom_delta
        FROM m ORDER BY month
    """,
    tags=("W-ext",),
)
def cumulative_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + month-over-month delta (cumulative window + lag)."""
    orders = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("num_orders"))
    w = Window.orderBy("month")
    return (
        m.withColumn(
            "running_total",
            F.sum("num_orders").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("mom_delta", F.col("num_orders") - F.lag("num_orders").over(w))
        .orderBy("month")
    )
