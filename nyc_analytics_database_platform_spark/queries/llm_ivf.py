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
from nyc_analytics_database_platform_spark.operators.similarity import brute_force_topk
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
    exact top-5 within that single partition. The centroid argmin is a
    query-parameter computation (3 tiny vectors); the search scan touches
    only the probed partition."""
    import math

    emb = load(spark, sf_dir, "embeddings", parallel=True)
    q = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])

    cent_rows = (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("cv"))
        .collect()
    )
    centroids: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        centroids.setdefault(r["label"], {})[r["dim"]] = r["cv"]
    qn = math.sqrt(sum(x * x for x in q))

    def cos_to_q(c: dict[int, float]) -> float:
        vec = [c[i] for i in sorted(c)]
        dot = sum(a * b for a, b in zip(vec, q))
        return dot / (math.sqrt(sum(a * a for a in vec)) * qn)

    best_label = max(sorted(centroids), key=lambda l: (cos_to_q(centroids[l]), -l))
    return brute_force_topk(emb.filter(F.col("label") == best_label), q, k=5)
