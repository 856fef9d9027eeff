"""Graph analytics beyond connectivity (operators/graph.py gives connected
components): fixed-iteration PageRank over the customer-supplier trade graph
derived from the fact tables.

Nodes: customers (id = c_custkey) and suppliers (id = 1_000_000 + s_suppkey);
an undirected edge links a customer to every supplier that shipped them a
line item (distinct pairs). Undirected = both directed edges exist, so no
node is dangling and the per-iteration dangling-mass redistribution term
drops out of the update rule.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register

_D = 0.85  # damping
_ITERS = 3
_SUPP_OFFSET = 1_000_000

_EDGE_CTE = f"""
    pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT c AS src, s + {_SUPP_OFFSET} AS dst FROM pairs
        UNION ALL
        SELECT s + {_SUPP_OFFSET} AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    n AS (SELECT COUNT(DISTINCT src) AS n FROM edges)
"""


def _iter_cte(k: int) -> str:
    prev = f"r{k - 1}"
    return f"""
    r{k} AS (
        SELECT e.dst AS node,
               (1 - {_D}) / n.n + {_D} * SUM(p.rank / deg.d) AS rank
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN deg ON deg.src = e.src
        CROSS JOIN n
        GROUP BY e.dst, n.n
    )"""


_ORACLE = (
    f"WITH {_EDGE_CTE},\n"
    "    r0 AS (SELECT src AS node, 1.0 / n.n AS rank FROM deg CROSS JOIN n),\n"
    + ",\n".join(_iter_cte(k) for k in range(1, _ITERS + 1))
    + f"""
    SELECT node, round(rank * n.n, 6) AS norm_rank
    FROM r{_ITERS} CROSS JOIN n
    ORDER BY node
    """
)


@register(
    "pagerank_trade_graph",
    oracle=_ORACLE,
    tags=("graph", "iterative"),
    bench=True,
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 synchronous iterations) over the undirected
    customer-supplier trade graph. Emits every node's rank normalized by the
    node count (so values sit near 1.0 and the 6-decimal round keeps real
    precision); returning ALL nodes avoids a top-k cut on an unrounded
    double, which could select different boundary rows per engine.

    Scale shape: the classic Pregel loop as DataFrame ops - per iteration
    one join of the rank vector (2 narrow columns) against the edge list
    pre-joined with degrees, and one groupBy(dst) sum. Edge list and degrees
    are computed once and cached; both sit partitioned on src, so every
    iteration's join reuses the same exchange and only the rank vector
    moves. The oracle unrolls the identical 3 iterations as CTEs (the
    engine's loop is plan-level, like operators/kmeans.py). For deep
    convergence runs, localCheckpoint every few rounds truncates the plan
    lineage (operators/graph.py:connected_components does the same)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), (F.col("s") + _SUPP_OFFSET).alias("dst")
    ).unionAll(
        pairs.select(
            (F.col("s") + _SUPP_OFFSET).alias("src"), F.col("c").alias("dst")
        )
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # Edge+degree is the loop-invariant side: cache it once, partitioned by
    # the join key every iteration reuses.
    ed = edges.join(deg, "src").cache()
    n_nodes = deg.count()  # also materializes ed's lineage inputs

    ranks = deg.select(
        "src", (F.lit(1.0) / n_nodes).alias("rank")
    ).withColumnRenamed("src", "node")
    for _ in range(_ITERS):
        ranks = (
            ed.join(ranks, ed.src == ranks.node)
            .groupBy("dst")
            .agg(
                (
                    F.lit((1 - _D) / n_nodes)
                    + _D * F.sum(F.col("rank") / F.col("d"))
                ).alias("rank")
            )
            .withColumnRenamed("dst", "node")
        )
    out = ranks.select(
        "node", F.round(F.col("rank") * n_nodes, 6).alias("norm_rank")
    ).orderBy("node")
    return out
