"""K-means (Lloyd's algorithm) as declarative DataFrame plans - the learned
coarse quantizer for IVF indexing (llm_ivf.py uses the given `label` column
as its partitioning; this operator is how those labels are produced when
none exist).

Design for determinism and scale:

- seeding is hash-deterministic (the k vectors with the lowest md5(id) -
  a reproducible uniform draw, same property as operators/sampling.py), so
  training is bit-replayable with no RNG state;
- each Lloyd iteration is assign (crossJoin with the BROADCAST centroid
  frame - k rows - then min_by per vector) + update (posexplode -> per
  (cluster, dim) mean). Per iteration: one narrow broadcast pass + one
  shuffle keyed by (cluster, dim) whose cardinality is k x dims, constants -
  the classic scalable k-means shape (vectors never shuffle);
- centroid means are ROUNDED to 6dp each iteration: the raw double mean
  carries ~1e-12 summation-order noise; rounding pins every subsequent
  distance computation to identical inputs across engines and runs, which
  is what makes the DuckDB oracle exact;
- iterations are a fixed count (training-pipeline convention: budgeted
  epochs, convergence monitored offline). Each round appends to the plan;
  for large iteration counts, localCheckpoint between rounds bounds plan
  growth (same pattern as operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dist2(v, c):
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def seed_centroids(vectors: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "v") -> DataFrame:
    """(c_id, cvec): the k vectors with the lowest md5(id) - deterministic,
    partition-independent seeding."""
    ordered = vectors.select(
        F.md5(F.col(id_col).cast("string")).alias("_ok"), id_col, vec_col
    ).orderBy("_ok", id_col).limit(k)
    w = Window.orderBy("_ok", id_col)
    return ordered.select(
        (F.row_number().over(w) - 1).alias("c_id"), F.col(vec_col).alias("cvec")
    )


def assign_clusters(vectors: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """(id, c_id): nearest centroid by squared L2, ties to the lowest c_id.
    The centroid frame is k rows - always broadcast; no shuffle of the
    vectors."""
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .select(
            id_col,
            "c_id",
            _dist2(F.col(vec_col), F.col("cvec")).alias("d2"),
        )
        .groupBy(id_col)
        .agg(F.min_by("c_id", F.struct("d2", "c_id")).alias("c_id"))
    )


def update_centroids(vectors: DataFrame, assignment: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """(c_id, cvec): per-cluster, per-dimension mean, rounded to 6dp (see
    module docstring). One shuffle keyed by (c_id, dim) - k x dims groups."""
    return (
        assignment.join(vectors, id_col)
        .select("c_id", F.posexplode(vec_col).alias("dim", "val"))
        .groupBy("c_id", "dim")
        .agg(F.round(F.avg("val"), 6).alias("cv"))
        .groupBy("c_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
    )


def kmeans_fit(vectors: DataFrame, k: int, iterations: int,
               id_col: str = "vec_id", vec_col: str = "v") -> tuple[DataFrame, DataFrame]:
    """Run `iterations` Lloyd rounds from the deterministic seeds; returns
    (final centroids (c_id, cvec), final assignment (id, c_id))."""
    cents = seed_centroids(vectors, k, id_col, vec_col)
    assignment = None
    for _ in range(iterations):
        assignment = assign_clusters(vectors, cents, id_col, vec_col)
        cents = update_centroids(vectors, assignment, id_col, vec_col)
    return cents, assign_clusters(vectors, cents, id_col, vec_col)
