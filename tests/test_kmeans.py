"""Properties of the declarative k-means trainer (the oracle query pins the
exact values; these pin the operator laws)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
    seed_centroids,
)


def _vectors(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def test_seeding_is_partition_independent(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    a = seed_centroids(vecs.repartition(13), 3).collect()
    b = seed_centroids(vecs.coalesce(1), 3).collect()
    assert sorted(r["c_id"] for r in a) == [0, 1, 2]
    assert {r["c_id"]: r["cvec"] for r in a} == {r["c_id"]: r["cvec"] for r in b}


def test_assignment_partitions_corpus(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    cents, assignment = kmeans_fit(vecs, 3, 1)
    n = vecs.count()
    assert assignment.count() == n  # every vector assigned
    assert assignment.select("vec_id").distinct().count() == n  # exactly once
    assert cents.count() <= 3
    dims = cents.select(F.size("cvec").alias("d")).distinct().collect()
    assert len(dims) == 1  # centroids live in the input space


def test_iteration_does_not_increase_distortion(spark, sf_dir):
    """Lloyd monotonicity: mean squared distance to the assigned centroid
    never goes up with another (assign, update) round (up to the 6dp
    centroid rounding, which bounds the wobble at ~1e-6)."""
    vecs = _vectors(spark, sf_dir)

    def distortion(cents):
        from nyc_analytics_database_platform_spark.operators.kmeans import _dist2

        return (
            vecs.crossJoin(F.broadcast(cents))
            .select("vec_id", _dist2(F.col("v"), F.col("cvec")).alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("d2"))
            .agg(F.avg("d2"))
            .collect()[0][0]
        )

    c1, _ = kmeans_fit(vecs, 4, 1)
    c2, _ = kmeans_fit(vecs, 4, 2)
    assert distortion(c2) <= distortion(c1) + 1e-5
