"""Raw-SQL surface attestation: queries submitted as SQL text through
`catalog.sql` (temp views over the catalog tables), not the DataFrame API.

The reference engine is SQL-driven end to end (every route handler in
server.py is a SQL string against PostgreSQL), so a reference user's first
contact with this engine is `sql(spark, sf_dir, "SELECT ...")`. Catalyst
compiles SQL text and DataFrame plans to the same logical algebra - these
queries attest that the SQL path gets the same optimizations (broadcast
joins, pushdown, decorrelated EXISTS) and the same exact numerics as the
DataFrame queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_analytics_database_platform_spark.catalog import sql
from nyc_analytics_database_platform_spark.registry import register

# exact-revenue convention (see functions/numeric.py and tpch_q1): prices and
# discounts are 2dp by construction -> cents/percent integer arithmetic is
# exact; never decimal-cast a double product (engine rounding modes differ).
_REVENUE = """CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                AS DECIMAL(38,0))) AS DOUBLE) / 1e4"""


@register(
    "sql_revenue_by_region",
    oracle=f"""
        SELECT r.r_name AS region,
               {_REVENUE} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY r.r_name
        ORDER BY revenue DESC, region
    """,
    tags=("sql-surface", "J1", "A3"),
)
def sql_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape submitted as SQL text: fact->orders->customer->
    nation->region with a one-year date band, discounted revenue by region.
    The BROADCAST hint pins the two bounded dims exactly as the DataFrame
    queries do with F.broadcast; the date filter pushes down to the orders
    scan from SQL just as from the API."""
    return sql(
        spark,
        sf_dir,
        f"""
        SELECT /*+ BROADCAST(n), BROADCAST(r) */
               r.r_name AS region,
               {_REVENUE} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY r.r_name
        ORDER BY revenue DESC, region
        """,
    )


@register(
    "sql_late_shipping_priority",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    tags=("sql-surface", "tpch", "J-ext"),
)
def sql_late_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape via the SQL surface: correlated EXISTS (orders with at
    least one line item shipped >60 days after ordering) counted by
    priority. Catalyst decorrelates the EXISTS into a left-semi hash join on
    l_orderkey - the same plan the DataFrame semi-join queries produce - so
    the subquery never executes per row."""
    return sql(
        spark,
        sf_dir,
        """
        SELECT o.o_orderpriority,
               COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """,
    )
