"""Product quantization (PQ) - the memory-side companion to the IVF coarse
quantizer (operators/kmeans.py): split each vector into m subvectors, learn
an independent k-centroid codebook per subspace, store each vector as m
small codes, and answer queries with asymmetric distance computation (ADC)
- per query, precompute the k x m table of exact query-subvector-to-
centroid distances, then score every database vector by m table lookups.

Why it matters at 100 TB: a 64-dim float vector is 256 bytes; its PQ code
at m=4, k=8 is 4 bytes (3 bits each) - a 64x compression that turns an
embedding corpus scan into a code-table scan, with the ADC table (k x m
doubles) broadcast per query. This module is IVF-PQ's PQ half; compose
with the IVF cell routing in queries/llm_ivf.py for the full index.

Determinism discipline (same as operators/kmeans.py, which this module
deliberately mirrors stage for stage):
- hash-deterministic seeding: the k vectors with the lowest md5(id) seed
  EVERY subspace (their slices), so training is bit-replayable;
- centroid means round to 6dp per iteration, pinning all downstream
  distances to engine-identical doubles;
- fixed iteration count (budgeted epochs).

Scale shape: all m codebooks train in ONE Lloyd loop - the subspace index
j joins the key of every stage, so "m independent k-means" costs the same
number of jobs as one. Per iteration: one broadcast assign pass over the
(id, j, subvector) frame (vectors never shuffle) + one shuffle keyed by
(j, c_id, dim) whose cardinality is m x k x (dims/m) = dims x k, a
constant. Encoding is the assign pass; ADC is a broadcast join on
(j, c_id) followed by a per-id sum with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.operators.kmeans import _dist2


def subvectors(
    vectors: DataFrame, m: int, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """(id, j, sv): subspace j's slice of each vector, j in [0, m). The
    subvector width is size(v) div m, taken from the data. Dimensionality
    must divide m: a trailing remainder would otherwise be SILENTLY
    dropped from every distance (a corrupt index, not an error), so the
    expression asserts size(v) % m == 0 per row and fails the job loudly
    on the first violating vector."""
    ds = f"(size({vec_col}) div {m})"
    guard = (
        f"assert_true(size({vec_col}) % {m} = 0, "
        f"concat('pq: vector dims ', size({vec_col}),"
        f" ' not divisible by m={m}'))"
    )
    return vectors.select(
        id_col,
        F.posexplode(
            F.expr(
                f"if(isnull({guard}), "
                f"transform(sequence(0, {m - 1}),"
                f" j -> slice({vec_col}, j * {ds} + 1, {ds})), null)"
            )
        ).alias("j", "sv"),
    )


def seed_codebooks(
    vectors: DataFrame, m: int, k: int, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """(j, c_id, cvec): subspace slices of the k vectors with the lowest
    md5(id) - one deterministic draw shared by every subspace."""
    w = Window.orderBy("_ok", id_col)
    seeds = (
        vectors.select(
            F.md5(F.col(id_col).cast("string")).alias("_ok"), id_col, vec_col
        )
        .orderBy("_ok", id_col)
        .limit(k)
        .select((F.row_number().over(w) - 1).alias("c_id"), vec_col)
    )
    ds = f"(size({vec_col}) div {m})"
    return seeds.select(
        "c_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" j -> slice({vec_col}, j * {ds} + 1, {ds}))"
            )
        ).alias("j", "sv"),
    ).select("j", "c_id", F.col("sv").alias("cvec"))


def assign_codes(
    sv: DataFrame, codebooks: DataFrame
) -> DataFrame:
    """(id, j, c_id): nearest codebook entry per (vector, subspace), ties
    to the lowest c_id. Codebooks are m x k rows - always broadcast."""
    id_col = sv.columns[0]
    return (
        sv.join(F.broadcast(codebooks), "j")
        .select(
            id_col,
            "j",
            "c_id",
            _dist2(F.col("sv"), F.col("cvec")).alias("d2"),
        )
        .groupBy(id_col, "j")
        .agg(F.min_by("c_id", F.struct("d2", "c_id")).alias("c_id"))
    )


def update_codebooks(sv: DataFrame, codes: DataFrame) -> DataFrame:
    """(j, c_id, cvec): per-(subspace, cluster, dim) mean, 6dp-rounded.
    One shuffle of dims x k groups."""
    id_col = sv.columns[0]
    return (
        codes.join(sv, [id_col, "j"])
        .select("j", "c_id", F.posexplode("sv").alias("dim", "val"))
        .groupBy("j", "c_id", "dim")
        .agg(F.round(F.avg("val"), 6).alias("cv"))
        .groupBy("j", "c_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
    )


def pq_fit(
    vectors: DataFrame,
    m: int,
    k: int,
    iterations: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> tuple[DataFrame, DataFrame]:
    """Train all m codebooks (`iterations` Lloyd rounds from deterministic
    seeds); returns (codebooks (j, c_id, cvec), codes (id, j, c_id))."""
    sv = subvectors(vectors, m, id_col, vec_col)
    books = seed_codebooks(vectors, m, k, id_col, vec_col)
    for _ in range(iterations):
        codes = assign_codes(sv, books)
        books = update_codebooks(sv, codes)
    return books, assign_codes(sv, books)


def adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    query: DataFrame,
    m: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, adc_d2): approximate squared L2 of every coded vector to the
    single-row `query` frame, smallest first - asymmetric distance: the
    exact query-subvector-to-centroid table (m x k rows) is built once and
    broadcast; each vector costs m lookups + a sum (map-side combinable).
    Take .limit(k') on the ordered result for top-k'."""
    qsub = subvectors(query, m, id_col, vec_col).select(
        "j", F.col("sv").alias("qsv")
    )
    table = (
        codebooks.join(qsub, "j")
        .select("j", "c_id", _dist2(F.col("qsv"), F.col("cvec")).alias("dt"))
    )
    return (
        codes.join(F.broadcast(table), ["j", "c_id"])
        .groupBy(id_col)
        .agg(F.round(F.sum("dt"), 6).alias("adc_d2"))
        .orderBy("adc_d2", id_col)
    )
