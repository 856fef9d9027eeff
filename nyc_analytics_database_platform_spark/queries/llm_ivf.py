"""IVF-style ANN: coarse partition centroids + probe-one-partition search.

The corpus's `label` column is the coarse partitioning (in production it
comes from k-means over a sample; here it is given, which keeps the oracle
exact). The pipeline is the real IVF shape:

  1. centroid per partition  (per-dimension mean, the index build)
  2. probe selection          (nearest centroid to the query vector)
  3. search within the probe  (exact cosine top-k over ~1/n_labels of data)

Centroid means are rounded to 6dp: the raw double mean carries ~1e-12
summation-order noise, 6 orders below the rounding unit, so both engines
produce identical rounded centroids. At 100 TB the partition id is the
storage partition key and step 3 reads one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register


@register(
    "ivf_label_centroids",
    oracle="""
        SELECT label, CAST(i - 1 AS INT) AS dim,
               round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid_v
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS g(i)
        GROUP BY label, i
        ORDER BY label, dim
    """,
    tags=("llm", "similarity", "ivf"),
)
def ivf_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-build step: per-(partition, dimension) centroid means.
    posexplode keeps dimension order; one groupBy pass."""
    emb = load(spark, sf_dir, "embeddings", parallel=True)
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_v"))
        .orderBy("label", "dim")
    )


# one definition shared with the brute-force/sign-LSH queries so the
# cosine-rounding convention cannot drift between the oracle formulations
from nyc_analytics_database_platform_spark.queries.llm_similarity import (  # noqa: E402
    _COS_SQL,
)


@register(
    "ivf_probe_top5",
    oracle=f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        cent AS (
            SELECT label, list(centroid_v ORDER BY dim) AS cv
            FROM (
                SELECT label, i AS dim,
                       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid_v
                FROM embeddings,
                     unnest(generate_series(1, len(embedding))) AS g(i)
                GROUP BY label, i
            )
            GROUP BY label
        ),
        probe AS (
            SELECT label FROM cent, q
            ORDER BY list_dot_product(cv, qv) /
                     (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))) DESC,
                     label
            LIMIT 1
        )
        SELECT vec_id, {_COS_SQL} AS score
        FROM embeddings, q
        WHERE label = (SELECT label FROM probe)
        ORDER BY score DESC, vec_id
        LIMIT 5
    """,
    tags=("llm", "similarity", "ivf"),
)
def ivf_probe_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: pick the nearest partition centroid to the query, then
    exact top-5 within that single partition - all inside one declarative
    plan (no driver-side head()/collect() actions): the query vector and the
    1-row probe label travel as broadcast frames, the centroid argmax is
    max_by over struct(cosine, -label) (ties -> lowest label, matching the
    oracle's ORDER BY cos DESC, label LIMIT 1), and the final search is a
    BroadcastHashJoin that touches only the probed partition's rows."""
    from nyc_analytics_database_platform_spark.operators.similarity import cosine

    emb = load(spark, sf_dir, "embeddings", parallel=True)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    centroids = (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("cv"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
    )
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select("label", cosine(F.col("cvec"), F.col("qv")).alias("c"))
        .agg(
            F.max_by(
                "label", F.struct(F.col("c"), (-F.col("label")).alias("neg"))
            ).alias("label")
        )
    )
    return (
        emb.join(F.broadcast(probe), "label")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(5)
    )
