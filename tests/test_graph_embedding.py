"""Properties of PageRank (graph_analytics.py) and the JL sign projection
(llm_similarity.embedding_random_projection) beyond the bit-exact oracle.
"""

from __future__ import annotations



import pyspark.sql.functions as F

from nyc_analytics_database_platform_spark.queries.graph_analytics import (
    pagerank_trade_graph,
)
from nyc_analytics_database_platform_spark.queries.llm_similarity import (
    _PROJ_OUT,
    embedding_random_projection,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_mass_conserved(spark):
    rows = pagerank_trade_graph(spark, SF_DIR).collect()
    assert rows
    # Undirected graph -> no dangling mass: total rank stays 1, so the
    # normalized ranks sum to the node count (within rounding of each term).
    total = sum(r.norm_rank for r in rows)
    assert abs(total - len(rows)) < 1e-3 * len(rows)
    assert all(r.norm_rank > 0 for r in rows)


def test_pagerank_degree_monotone_for_suppliers(spark):
    # With uniform teleport, a supplier connected to strictly more customers
    # should not rank below one with a small fraction of its degree.
    ranks = {
        r.node: r.norm_rank for r in pagerank_trade_graph(spark, SF_DIR).collect()
    }
    supp = sorted(
        ((n, v) for n, v in ranks.items() if n >= 1_000_000),
        key=lambda x: x[1],
    )
    assert supp[-1][1] > supp[0][1]


def test_projection_shape_and_determinism(spark):
    df = embedding_random_projection(spark, SF_DIR)
    n_vec = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    rows = df.collect()
    assert len(rows) == n_vec * _PROJ_OUT
    # Deterministic across runs/partitionings
    again = embedding_random_projection(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_projection_norm_expectation(spark):
    # JL property: for +-1 sign projections each output coordinate has
    # E[val^2] = ||x||^2, so with unit-normalized inputs (this corpus) the
    # projected squared norm concentrates around _PROJ_OUT. Check the corpus
    # mean lands well inside [_PROJ_OUT/2, 2*_PROJ_OUT] - distances survive
    # the compression in expectation, which is what the dedup/ANN consumers
    # of the projection rely on.
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    in_norm2 = (
        emb.select(
            F.aggregate(
                "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") ** 2
            ).alias("n2")
        )
        .agg(F.avg("n2"))
        .collect()[0][0]
    )
    p2 = (
        embedding_random_projection(spark, SF_DIR)
        .groupBy("vec_id")
        .agg(F.sum(F.col("val") ** 2).alias("p2"))
        .agg(F.avg("p2"))
        .collect()[0][0]
    )
    expected = _PROJ_OUT * in_norm2
    assert expected / 2 < p2 < expected * 2
