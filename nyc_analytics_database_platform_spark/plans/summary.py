"""Entity summary plans - the reference's bbl_summary / bookmarks / compare
composites re-expressed as single-pass multi-aggregate DataFrame plans.

The reference answers one dashboard view with 5 sequential SQL round-trips
(reference: server.py:140-236) and the bookmarks page with a full 5-query
re-run per bookmarked key, serially (reference: server.py:569-578). Here the
whole summary is ONE aggregation pass per key set:

    facts LEFT JOIN keys (date predicate inside the join condition)
    -> groupBy key -> {count, conditional count, min, max, exact median,
       exact revenue, per-category conditional sums}

which is one shuffle regardless of how many keys are summarized - the N+1
pattern becomes a batch groupBy. At 100 TB the keys side is a broadcast and
the fact scan is partition-pruned by the date predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.domain import ACTIVE_STATUSES
from nyc_analytics_database_platform_spark.functions.numeric import exact_sum


def order_stats_aggs() -> list[Column]:
    """The single-pass aggregate set of the summary (reference's five
    round-trips collapsed: A1+A2 totals, A4 min/max, A5 median)."""
    return [
        F.count("o_orderkey").alias("total_orders"),
        F.sum(
            F.when(F.col("o_orderstatus").isin(*ACTIVE_STATUSES), 1).otherwise(0)
        ).alias("active_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.percentile("o_totalprice", 0.5).alias("median_price"),
        exact_sum("o_totalprice").alias("revenue"),
    ]


def customer_summary(
    customers: DataFrame,
    orders: DataFrame,
    custkeys: list[int] | None = None,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Per-customer order summary in one aggregation pass.

    - `custkeys=None` summarizes every customer (the batch path); a list is
      the bookmarks IN-list path.
    - The optional date range composes into the JOIN condition, not a
      post-filter, so keyed rows with no in-range orders still appear with
      zeroed stats (reference's empty-sales branch, server.py:237-240).
    """
    keys = customers.select("c_custkey", "c_name")
    if custkeys is not None:
        keys = keys.filter(F.col("c_custkey").isin(custkeys))
        # Mirror the IN-list onto the orders side: Spark cannot infer it
        # through a LEFT join's null-producing side, so without this the
        # plan scans EVERY order to probe a 6-row hash table. With it the
        # predicate reaches the parquet scan (PushedFilters: In(o_custkey,
        # ...)) and row-group stats prune the fact — the difference
        # between O(bookmarks) and O(table) at 100 TB. Semantics are
        # unchanged: rows with other custkeys can never match the join.
        orders = orders.filter(F.col("o_custkey").isin(custkeys))
    cond = orders.o_custkey == keys.c_custkey
    if start is not None:
        cond = cond & (orders.o_orderdate >= F.lit(start).cast("timestamp"))
    if end is not None:
        # inclusive end bound - same convention as api._date_filtered and the
        # reference's `created_date <= :end_date` (server.py:155-167)
        cond = cond & (orders.o_orderdate <= F.lit(end).cast("timestamp"))
    return (
        keys.join(orders, cond, "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(*order_stats_aggs())
        .orderBy("custkey")
    )


def single_entity_dashboard(orders: DataFrame, custkey: int) -> DataFrame:
    """One-row dashboard for one key: the five reference round-trips plus the
    by-category breakdown (complaints-by-type analog: order priority) as
    pivoted conditional sums - a single scan, a single one-row aggregate."""
    prio_cols = [
        F.sum(F.when(F.col("o_orderpriority") == p, 1).otherwise(0)).alias(
            f"prio_{p.split('-')[0]}"
        )
        for p in (
            "1-URGENT",
            "2-HIGH",
            "3-MEDIUM",
            "4-NOT SPECIFIED",
            "5-LOW",
        )
    ]
    return orders.filter(F.col("o_custkey") == custkey).agg(
        *order_stats_aggs(), *prio_cols
    )
