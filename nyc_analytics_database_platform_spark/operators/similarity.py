"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. Dot product and norms
  are native higher-order functions (zip_with + aggregate) over the vector
  cast to double - JVM-side, no Python, deterministic summation order.
- Sign-LSH bucketed ANN: the scale path. Buckets on the sign bits of a
  fixed set of coordinates (a simple but valid locality-sensitive code for
  cosine on roughly isotropic data); search touches only the query's bucket.
  At 100 TB the bucket id becomes the shuffle/partition key, so a query
  reads one partition instead of the full corpus. (A production variant
  replaces coordinate signs with random-hyperplane signs or IVF centroids -
  same plan shape: assign bucket -> co-partition -> per-bucket top-k.)
- Embedding near-dup: all candidate pairs with cosine >= threshold.

Scores are rounded to 6 decimals in the public outputs: float-vector dot
products agree across engines to ~1e-12, and rounding pins the comparison
(and any top-k tie) to a stable value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    The query vector is a broadcast literal (array constructor), the score is
    a narrow per-row expression, and top-k compiles to TakeOrderedAndProject
    (per-partition heap + k-row driver merge - no global sort).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def signlsh_bucket(vec_col: Column, n_bits: int = 8) -> Column:
    """Bucket id from the sign bits of the first n_bits coordinates."""
    bits = [
        F.when(vec_col.getItem(i) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def signlsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign-LSH bucket."""
    qbucket = 0
    for i in range(n_bits):
        if query_vec[i] >= 0:
            qbucket |= 1 << i
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    candidates = embeddings.filter(
        signlsh_bucket(F.col(vec_col), n_bits) == F.lit(qbucket)
    )
    scored = candidates.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def cosine_near_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold - embedding near-dup.

    All-pairs here (the oracle-checkable baseline); the scale path runs the
    same scoring only within sign-LSH buckets (see signlsh_bucket) or via
    block-matrix multiply on normalized vectors."""
    a = embeddings.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("score", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("score") >= threshold)
        .select("a_id", "b_id", "score")
    )
