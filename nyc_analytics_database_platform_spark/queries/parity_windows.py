"""Ranking-window parity queries: top-K + Other rollup, per-group rank
(SURVEY.md sections 2.4 A9, 2.5, 2.6 O5/O6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.topk import topk_other
from nyc_analytics_database_platform_spark.registry import register


@register(
    "top5_other_rollup",
    oracle="""
        WITH c AS (
            SELECT n.n_name AS nation, COUNT(*) AS num_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        ),
        r AS (
            SELECT nation, num_orders,
                   ROW_NUMBER() OVER (ORDER BY num_orders DESC, nation) AS rn
            FROM c
        )
        -- head rows pass through; the tail is APPENDED as one synthetic row
        -- (matching the operator: a genuine 'Other' input label is NOT merged
        -- into the rollup; the reference appends Other separately)
        SELECT nation, CAST(num_orders AS BIGINT) AS num_orders
        FROM r WHERE rn <= 5
        UNION ALL
        SELECT 'Other' AS nation, CAST(SUM(num_orders) AS BIGINT) AS num_orders
        FROM r WHERE rn > 5
        HAVING COUNT(*) > 0
    """,
    tags=("A9", "O6"),
    bench=True,
)
def top5_other_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 groups by count + 'Other' tail bucket (reference:
    server.py:411-419 - top-5 complaint types, tail summed into Other)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    counts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("num_orders"))
    )
    return topk_other(counts, "nation", "num_orders", k=5)


@register(
    "top3_customers_per_nation",
    oracle="""
        SELECT nation, c_custkey, c_acctbal, rnk FROM (
            SELECT n.n_name AS nation, c.c_custkey, c.c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY n.n_name
                                      ORDER BY c.c_acctbal DESC, c.c_custkey) AS rnk
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ) WHERE rnk <= 3
        ORDER BY nation, rnk
    """,
    tags=("W-ext", "O5"),
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via ranking window (the compare view's top-10 slice,
    templates/compare.html:246, generalized to partitioned ranking).

    Scale: row_number over (nation, acctbal desc) - Spark pushes a per-group
    top-K filter (WindowGroupLimit) before the full sort, so the shuffle
    carries only candidate rows."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("nation").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), "c_custkey", "c_acctbal")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("nation", "rnk")
    )


@register(
    "percentile_rank_spend_by_segment",
    oracle="""
        WITH cr AS (
            SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                     AS spend
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        )
        SELECT segment, custkey, spend,
               round(PERCENT_RANK() OVER w, 6) AS pct_rank,
               round(CUME_DIST() OVER w, 6) AS cume_dist,
               CAST(NTILE(4) OVER w AS INT) AS quartile
        FROM cr
        WINDOW w AS (PARTITION BY segment ORDER BY spend, custkey)
        QUALIFY custkey % 20 = 0
        ORDER BY segment, custkey
    """,
    tags=("W", "window", "rank"),
)
def percentile_rank_spend_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing windows (percent_rank / cume_dist / ntile) over
    per-customer spend within segment - the remaining ranked-window family
    members (rank/dense_rank/row_number are covered by the top-k queries).
    Deterministic tiebreak on custkey; ranks computed over the aggregated
    per-customer frame (|customers| rows), then sampled for the report.

    Scale: the window reads the grouped aggregate, not the fact table; one
    shuffle on segment."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cr = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("o_custkey").alias("custkey")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("spend"))
    )
    w = Window.partitionBy("segment").orderBy("spend", "custkey")
    return (
        cr.select(
            "segment",
            "custkey",
            "spend",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("custkey") % 20 == 0)
        .orderBy("segment", "custkey")
    )
