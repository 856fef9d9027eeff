"""Near-duplicate clustering: MinHash candidate pairs -> connected
components -> canonical keep/drop decision per cluster.

This is the step that makes dedup actionable: pairs say "these two are
similar"; components say "these N docs are one group - keep the canonical
one". The Spark side is an iterative label-propagation loop (non-SQL-
expressible per se); the DuckDB oracle reproduces it with a recursive CTE
over the same md5-derived candidate edges, so even the iterative operator
gets an exact cross-engine check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from nyc_analytics_database_platform_spark.operators.graph import connected_components
from nyc_analytics_database_platform_spark.queries.llm_dedup import _minhash_oracle
from nyc_analytics_database_platform_spark.registry import register

# The candidate-pair SQL is the minhash oracle minus its ORDER BY.
_EDGES_SQL = _minhash_oracle().rsplit("ORDER BY", 1)[0]


@register(
    "dedup_minhash_clusters",
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        und AS (
            SELECT a_id AS src, b_id AS dst FROM edges
            UNION
            SELECT b_id AS src, a_id AS dst FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM und
            UNION
            SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
        ),
        members AS (
            SELECT src AS node, dst FROM reach
            UNION
            SELECT src AS node, src AS dst FROM und
        )
        SELECT node, MIN(dst) AS component
        FROM members
        GROUP BY node
        ORDER BY node
    """,
    tags=("llm", "dedup", "iterative"),
    bench=True,
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH candidate pairs: every doc
    appearing in a candidate pair is labeled with its cluster's minimum
    doc_id (= the canonical survivor; the rest are the drop set)."""
    docs = load(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(docs, num_perm=12, k=5))
    return connected_components(pairs).orderBy("node")
