"""Core reference-parity queries: scans, predicates, projections, scalar and
grouped aggregation, sorts (SURVEY.md sections 2.1, 2.2, 2.4, 2.6).

Each query re-expresses a reference SQL shape (cited per function) on the
driver testdata tables. Scale notes are inline: every filter is a plain
column predicate (parquet pushdown), dims are broadcast, aggregates are
partial-aggregable single-pass plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.domain import ACTIVE_STATUSES
from nyc_analytics_database_platform_spark.functions.numeric import (
    ORACLE_SUM,
    exact_sum,
)
from nyc_analytics_database_platform_spark.registry import register


@register(
    "flagship_orders_status_by_nation",
    oracle="""
        SELECT n.n_name AS nation,
               COUNT(*) AS total_orders,
               CAST(SUM(CASE WHEN o.o_orderstatus IN ('O','P') THEN 1 ELSE 0 END) AS BIGINT)
                 AS active_orders,
               {revenue} AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY total_orders DESC, nation
    """.format(revenue=ORACLE_SUM.format(col="o.o_totalprice")),
    tags=("A3", "J1", "A2", "O1"),
    bench=True,
)
def flagship_orders_status_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: fact x dim group-count with conditional aggregation, ordered.

    Reference shape: complaints by type with active count
    (reference: server.py:183-191) - GROUP BY dim name, COUNT(*),
    SUM(CASE WHEN status IN (...) THEN 1 ELSE 0), ORDER BY count DESC.

    Scale: orders x customer is the big join (sort-merge / AQE), nation is
    broadcast; the aggregate is a single hash-agg pass with map-side partials.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("total_orders"),
            F.sum(
                F.when(F.col("o_orderstatus").isin(*ACTIVE_STATUSES), 1).otherwise(0)
            ).alias("active_orders"),
            exact_sum("o_totalprice").alias("revenue"),
        )
        .orderBy(F.desc("total_orders"), "nation")
    )


@register(
    "point_lookup_natural_key",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation
        WHERE n_name = 'NATION_7'
    """,
    tags=("P1",),
)
def point_lookup_natural_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by natural key with projection (reference:
    server.py:135-152 - Geographic_Area by (borough, block, lot)).

    Scale: a conjunctive equality predicate on a dimension -> partition /
    row-group pruning; no shuffle at all.
    """
    nation = load(spark, sf_dir, "nation")
    return nation.filter(F.col("n_name") == "NATION_7").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "filter_date_range_projection",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity AS qty,
               l_extendedprice AS price, strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_suppkey = 3
    """,
    tags=("P2", "P3", "P5", "P6"),
)
def filter_date_range_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compositional date-range predicate + projection with rename + scalar
    cast at the boundary (reference: server.py:155-167, :204, :212-217).

    Scale: both predicates and the 5-column projection push into the parquet
    scan (PushedFilters + ReadSchema); at 100 TB with date partitioning this
    is partition pruning.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_suppkey") == 3)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("qty"),
            F.col("l_extendedprice").alias("price"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
        )
    )


@register(
    "scalar_counts_conditional",
    oracle="""
        SELECT COUNT(*) AS total_orders,
               CAST(SUM(CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 0 END) AS BIGINT)
                 AS active_orders,
               {revenue} AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
    """.format(revenue=ORACLE_SUM.format(col="o_totalprice")),
    tags=("A1", "A2", "P3", "P4"),
)
def scalar_counts_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar COUNT(*) + conditional SUM in one pass (reference:
    server.py:170-179 - total & active computed together).

    Scale: single scan, map-side partial aggregation, one-row result.
    """
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .agg(
            F.count("*").alias("total_orders"),
            F.sum(
                F.when(F.col("o_orderstatus").isin(*ACTIVE_STATUSES), 1).otherwise(0)
            ).alias("active_orders"),
            exact_sum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "minmax_price_stats",
    oracle="""
        SELECT MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               COUNT(*) AS num_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("A4", "A8", "J2"),
)
def minmax_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX price bounds over a filtered join (reference: server.py:222-230
    - sale price bounds for one parcel).

    Scale: the segment filter reduces the customer side before the join;
    MIN/MAX are partial-aggregable.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count("*").alias("num_orders"),
    )


@register(
    "median_price",
    oracle="""
        SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("A5", "J2"),
)
def median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous median over a filtered join (reference:
    server.py:222-230 - PERCENTILE_CONT(0.5) WITHIN GROUP).

    Spark's percentile() is the exact interpolated percentile =
    PERCENTILE_CONT. Scale note: exact percentile shuffles all values of the
    group; the approx twin (median_price_approx) is the 100 TB path.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).agg(
        F.percentile("o_totalprice", 0.5).alias("median_price")
    )


_APPROX_MEDIAN_TOL = 0.01  # rel. error bound for accuracy=10000 sketch


@register(
    "median_price_approx",
    # Tolerance oracle: the sketch value itself is engine-specific, so the
    # compared columns are the exact median (computed by both engines) plus
    # a within-tolerance assertion the oracle pins to TRUE - a hash mismatch
    # means the sketch drifted beyond the documented bound.
    oracle="""
        SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                 AS exact_median,
               TRUE AS within_tolerance
        FROM orders
    """,
    tags=("A5", "approx"),
)
def median_price_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of median_price: approx_percentile (t-digest,
    constant memory per group vs shuffling every value). The result carries
    the exact median and a boolean asserting the sketch landed within
    _APPROX_MEDIAN_TOL relative error, which the oracle checks."""
    orders = load(spark, sf_dir, "orders")
    return orders.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median"),
        F.percentile("o_totalprice", 0.5).alias("exact_median"),
    ).select(
        "exact_median",
        (
            F.abs(F.col("approx_median") - F.col("exact_median"))
            / F.col("exact_median")
            <= _APPROX_MEDIAN_TOL
        ).alias("within_tolerance"),
    )


@register(
    "median_price_by_segment",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o.o_totalprice) AS median_price,
               COUNT(*) AS num_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY segment
    """,
    tags=("A5", "A7", "J2"),
)
def median_price_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact median + count (reference: server.py:291-302 - per-month
    PERCENTILE_CONT + COUNT on Sale x Property)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.percentile("o_totalprice", 0.5).alias("median_price"),
            F.count("*").alias("num_orders"),
        )
        .orderBy("segment")
    )


@register(
    "recent_orders_top10",
    oracle="""
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
               o_totalprice, o_orderstatus
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 10
    """,
    tags=("O2", "O4"),
)
def recent_orders_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recent-first top-10 (reference: server.py:208 ORDER BY sale_date DESC +
    templates/analytics.html:252-262 slice [:10]).

    The secondary key makes the cut deterministic under date ties. Scale:
    ORDER BY + LIMIT compiles to TakeOrderedAndProject - per-partition top-K
    then a K-row merge on the driver, no global sort.
    """
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            "o_totalprice",
            "o_orderstatus",
        )
    )


@register(
    "latest_order_pick",
    oracle="""
        SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 1
    """,
    tags=("O7",),
)
def latest_order_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-row pick from a sorted result (reference: server.py:421-424 -
    latest sale's address pre-fills the compare form)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(1)
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        )
    )
