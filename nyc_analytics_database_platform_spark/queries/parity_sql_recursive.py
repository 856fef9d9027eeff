"""Recursive-CTE and LATERAL-subquery SQL surfaces (Spark 4 features).

The reference engine exposes its whole surface as SQL text (server.py route
handlers); these queries extend the raw-SQL attestation in parity_sql.py with
the two SQL constructs Spark gained in the 4.x line that the rest of the
registry exercises only through the DataFrame API:

- `WITH RECURSIVE` (iterative fixpoint inside one statement), used for
  BFS reachability over the nation-level trade graph. The SCALE story: the
  recursion runs over the *contracted* graph (25 nation nodes), while the
  distributed heavy lifting - extracting the edge set from the 100 TB fact
  table via three joins + DISTINCT - happens once, before the loop. This is
  the same contract-then-iterate shape as operators/graph.py's connected
  components, expressed in pure SQL.
- `LATERAL (... ORDER BY ... LIMIT k)` - the correlated top-k-per-group
  idiom. Catalyst plans the same WindowGroupLimit/topk shape as the
  DataFrame `top3_customers_per_nation`; the attestation is that the SQL
  spelling reaches the same plan family and exact results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_analytics_database_platform_spark.catalog import sql
from nyc_analytics_database_platform_spark.registry import register

# Nation-level trade edge set: customer-nation -> supplier-nation pairs that
# actually traded (share at least one lineitem). DISTINCT contracts the fact
# table to <= nations^2 rows before any recursion touches it.
_EDGES = """
    SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
"""

_REACH_SQL = f"""
    WITH RECURSIVE edges AS ({_EDGES}),
    reach(nationkey, hop) AS (
        SELECT CAST(6 AS INT) AS nationkey, 0 AS hop
        UNION ALL
        SELECT e.dst AS nationkey, r.hop + 1 AS hop
        FROM reach r JOIN edges e ON e.src = r.nationkey
        WHERE r.hop < 3
    )
    SELECT r.nationkey, CAST(MIN(r.hop) AS INT) AS min_hops
    FROM reach r
    GROUP BY r.nationkey
    ORDER BY min_hops, r.nationkey
"""


@register(
    "sql_recursive_trade_reach",
    oracle=_REACH_SQL,
    tags=("sql-surface", "recursive-cte", "graph"),
)
def sql_recursive_trade_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS min-hop reachability from nation 6 over the contracted trade
    graph via WITH RECURSIVE (depth-guarded at 3 hops; the GROUP BY MIN
    collapses the frontier multiplicities the UNION ALL recursion emits).
    Same SQL text runs on the DuckDB oracle - a cross-engine recursive-CTE
    parity check."""
    return sql(spark, sf_dir, _REACH_SQL)


_LATERAL_SQL = """
    SELECT n.n_name AS nation, t.c_name AS customer, t.c_acctbal AS acctbal
    FROM nation n,
    LATERAL (
        SELECT c.c_name, c.c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c.c_acctbal DESC, c.c_name
        LIMIT 2
    ) t
    ORDER BY nation, acctbal DESC, customer
"""


@register(
    "sql_lateral_top2_customers",
    oracle=_LATERAL_SQL,
    tags=("sql-surface", "lateral", "O5"),
)
def sql_lateral_top2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by account balance per nation via a correlated
    LATERAL subquery with ORDER BY + LIMIT (deterministic c_name
    tie-break). The inner-join lateral drops empty nations - also the
    DuckDB convention, so the same text is the oracle."""
    return sql(spark, sf_dir, _LATERAL_SQL)
