"""Remaining engine-surface queries: pivot, cube, the string-function layer
(SURVEY.md section 2.8 F6-F8), and the grouped-map (applyInPandas) path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.grouped import grouped_minmax_scale
from nyc_analytics_database_platform_spark.registry import register


@register(
    "pivot_status_by_nation",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
               CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
               CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation
    """,
    tags=("A-ext", "pivot"),
)
def pivot_status_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted counts (status columns per nation). With the pivot values
    enumerated, Spark compiles this to one pass of conditional aggregates -
    exactly the oracle's CASE formulation, no second scan."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
        .orderBy("nation")
    )


@register(
    "cube_priority_status",
    oracle="""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS num_orders
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
        ORDER BY priority, status
    """,
    tags=("A-ext", "cube"),
)
def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping sets in one pass (priority, status, each
    margin, grand total)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("num_orders"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "num_orders",
        )
        .orderBy("priority", "status")
    )


@register(
    "string_layer_formatting",
    oracle="""
        SELECT c_custkey,
               string_split(c_name, '#')[1] AS name_prefix,
               CAST(string_split(c_name, '#')[2] AS BIGINT) AS name_number,
               concat_ws(' | ', trim(c_name), coalesce(c_mktsegment, 'UNKNOWN')) AS display,
               CASE WHEN c_acctbal < 0 THEN '-' ELSE '' END ||
               format('{:,}', CAST(floor(abs(c_acctbal)) AS BIGINT)) || '.' ||
               lpad(CAST(CAST(round((abs(c_acctbal) - floor(abs(c_acctbal))) * 100) AS BIGINT)
                    AS VARCHAR), 2, '0') AS balance_fmt
        FROM customer
        ORDER BY c_custkey
    """,
    tags=("F6", "F7", "F8"),
)
def string_layer_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string/presentation function layer (reference: address assembly
    server.py:114,365-367; split semantics templates/analytics.html:162-165;
    currency formatting templates/analytics.html:183,200-204) - trim,
    coalesce-default, concat_ws, split-indexing, thousands formatting, all
    native expressions."""
    cust = load(spark, sf_dir, "customer")
    parts = F.split("c_name", "#")
    return cust.select(
        "c_custkey",
        parts.getItem(0).alias("name_prefix"),
        parts.getItem(1).cast("long").alias("name_number"),
        F.concat_ws(
            " | ", F.trim("c_name"), F.coalesce("c_mktsegment", F.lit("UNKNOWN"))
        ).alias("display"),
        F.format_number("c_acctbal", 2).alias("balance_fmt"),
    ).orderBy("c_custkey")


@register(
    "grouped_map_minmax_scale",
    oracle="""
        SELECT event_id, event_type, value,
               CASE WHEN MAX(value) OVER w > MIN(value) OVER w
                    THEN (value - MIN(value) OVER w)
                         / (MAX(value) OVER w - MIN(value) OVER w)
               END AS scaled
        FROM events
        WINDOW w AS (PARTITION BY event_type)
        ORDER BY event_id
    """,
    tags=("UDF", "grouped-map"),
)
def grouped_map_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map path, verified value-exactly: min-max
    scaling per event_type computed in a pandas kernel equals the window-
    function formulation bit-for-bit (same IEEE subtraction/division)."""
    events = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return grouped_minmax_scale(events, "event_type", "value").orderBy("event_id")


@register(
    "grouping_sets_priority_segment",
    oracle="""
        SELECT CASE WHEN GROUPING(o.o_orderpriority) = 0 THEN o.o_orderpriority END
                 AS priority,
               CASE WHEN GROUPING(c.c_mktsegment) = 0 THEN c.c_mktsegment END
                 AS segment,
               CAST(GROUPING(o.o_orderpriority) * 2 + GROUPING(c.c_mktsegment)
                    AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY GROUPING SETS ((o.o_orderpriority), (c.c_mktsegment), ())
        ORDER BY gid, priority NULLS FIRST, segment NULLS FIRST
    """,
    tags=("A-ext", "grouping-sets"),
)
def grouping_sets_priority_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id disambiguation: per-priority totals,
    per-segment totals, and the grand total in ONE pass (the general form
    rollup/cube specialize; the reference runs these as separate queries -
    server.py's analytics endpoints - one scan each). Spark expands the sets
    into a single Expand + hash-agg: one scan, one shuffle, any number of
    simultaneous rollup views."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    grouped = joined.groupingSets(
        [["o_orderpriority"], ["c_mktsegment"], []],
        "o_orderpriority",
        "c_mktsegment",
    ).agg(
        F.grouping_id("o_orderpriority", "c_mktsegment").cast("long").alias("gid"),
        F.count("*").alias("n"),
    )
    return grouped.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("c_mktsegment").alias("segment"),
        "gid",
        "n",
    ).orderBy("gid", F.col("priority").asc_nulls_first(), F.col("segment").asc_nulls_first())


@register(
    "grouped_agg_geomean_price",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               round(exp(SUM(round(ln(o.o_totalprice), 9)) / COUNT(*)), 2)
                   AS geomean_price,
               COUNT(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY segment
    """,
    tags=("UDF", "grouped-agg"),
)
def grouped_agg_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas_udf GROUPED_AGG surface (the one sanctioned Python path
    not yet exercised elsewhere: a vectorized *aggregate* kernel, Arrow
    batch in -> scalar out, usable inside groupBy().agg alongside native
    aggregates). Computes the per-segment geometric mean of order totals.

    Determinism discipline: the kernel sums ln(price) values PRE-ROUNDED to
    9dp - the rounding makes each addend identical across engines, and the
    final round(..., 2) sits ~7 orders above the residual summation-order
    noise (~1e-9 relative over 30k addends), so the oracle is exact. Like
    all grouped-agg UDFs this has no partial aggregation (full rows of each
    group ship to the UDF) - the docstring's 100 TB note: prefer native
    exp(avg(ln(x))) when exactness tolerances allow; the UDF surface is for
    kernels Spark lacks."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _geomean(prices):
        import numpy as np

        logs = np.round(np.log(prices.to_numpy()), 9)
        return float(np.exp(logs.sum() / len(logs)))

    # Real annotation objects (this module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature inference cannot resolve).
    _geomean.__annotations__ = {"prices": pd.Series, "return": float}
    geomean = pandas_udf(_geomean, "double")

    def _n(prices):
        return len(prices)

    # Spark disallows mixing a grouped-agg pandas UDF with native aggregates
    # in one agg() - the group count rides along as a second pandas kernel.
    _n.__annotations__ = {"prices": pd.Series, "return": int}
    pandas_count = pandas_udf(_n, "long")

    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(geomean("o_totalprice"), 2).alias("geomean_price"),
            pandas_count("o_totalprice").alias("n"),
        )
        .orderBy("segment")
    )
