"""Composite-query registrations (SURVEY.md section 2.11): batched bookmarks
summary, two-entity compare, one-row dashboard."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.plans.summary import (
    customer_summary,
    single_entity_dashboard,
)
from nyc_analytics_database_platform_spark.registry import register

_SUMMARY_AGGS_SQL = """
               COUNT(o.o_orderkey) AS total_orders,
               CAST(SUM(CASE WHEN o.o_orderstatus IN ('O','P') THEN 1 ELSE 0 END) AS BIGINT)
                 AS active_orders,
               MIN(o.o_totalprice) AS min_price,
               MAX(o.o_totalprice) AS max_price,
               PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o.o_totalprice) AS median_price,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
"""

_BOOKMARKED = [1, 7, 42, 99, 123, 1499]


@register(
    "bookmarks_summary_batch",
    oracle=f"""
        SELECT c.c_custkey AS custkey, c.c_name AS name,
               {_SUMMARY_AGGS_SQL}
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IN (1, 7, 42, 99, 123, 1499)
        GROUP BY c.c_custkey, c.c_name
        ORDER BY custkey
    """,
    tags=("composite", "bookmarks"),
    bench=True,
)
def bookmarks_summary_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched bookmarks: one groupBy pass over an IN-list of keys replaces
    the reference's serial per-key 5-query loop (server.py:561-580). Keys
    with no orders keep a zeroed/NULL stats row (server.py:237-240)."""
    return customer_summary(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders"), _BOOKMARKED
    )


@register(
    "compare_two_customers",
    oracle=f"""
        SELECT c.c_custkey AS custkey, c.c_name AS name,
               {_SUMMARY_AGGS_SQL}
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate <= TIMESTAMP '1998-12-31'
        WHERE c.c_custkey IN (5, 10)
        GROUP BY c.c_custkey, c.c_name
        ORDER BY custkey
    """,
    tags=("composite", "compare"),
)
def compare_two_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side-by-side compare with a shared date window (reference:
    server.py:435-473 - dual get_bbl_data with one range). The date predicate
    lives in the join condition so an entity with no in-window orders still
    yields its zeroed row rather than vanishing."""
    return customer_summary(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        [5, 10],
        start="1996-01-01",
        end="1998-12-31",
    )


@register(
    "dashboard_single_entity",
    oracle="""
        SELECT COUNT(o_orderkey) AS total_orders,
               CAST(SUM(CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 0 END) AS BIGINT)
                 AS active_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS prio_1,
               CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS prio_2,
               CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS prio_3,
               CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS prio_4,
               CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS prio_5
        FROM orders
        WHERE o_custkey = 42
    """,
    tags=("composite", "dashboard"),
)
def dashboard_single_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full single-entity dashboard in ONE scan + one-row aggregate - the
    reference's five sequential SQL round-trips (server.py:140-236) plus the
    by-category breakdown, collapsed into pivoted conditional aggregates."""
    return single_entity_dashboard(load(spark, sf_dir, "orders"), custkey=42)
