"""Scalar quantization (SQ8) of the embeddings table: per-dimension
min/max-scaled uint8 codes, asymmetric-distance search over the
dequantized codes, and the measured recall audit - the simpler sibling of
product quantization (llm_pq.py) and the third member of the
vector-compression family (sign-LSH buckets, PQ codebooks, SQ8 codes).

SQ8 is the workhorse compression in production vector stores (FAISS
ScalarQuantizer, Lucene/Elasticsearch int8_hnsw): 4x-8x smaller than
floats, no codebook training, and distances stay within ~1% of exact for
well-spread data. The quantization grid here is per-dimension min/max ->
255 steps; code = round((x - dmin) * 255 / (dmax - dmin)), with
degenerate constant dimensions pinned to code 0.

Determinism discipline: the per-dim grid (min/max) is exact (no float
accumulation - MIN/MAX only); encode is a per-element expression with one
fixed evaluation order on both engines, so the codes are bit-identical
integers. ADC distances sum 64 doubles per vector and are rounded to 6dp
before ranking (same absorption as the PQ/kmeans family).

Scale (100 TB): the grid is a 64-row aggregate broadcast back to the
scan; encoding is a narrow map (no shuffle), and the candidate scan reads
1 byte/dim instead of 4 - at 100 TB that is the difference between a
25 TB and a 6 TB index sweep. The audit query is the calibration
evidence (same pattern as pq_recall_audit / ivf_recall_audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register

_DIMS = 64

_CELLS_CTE = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cells AS (
        SELECT vec_id, i - 1 AS dim, v[i] AS x
        FROM e, unnest(generate_series(1, {_DIMS})) AS g(i)
    ),
    stats AS (SELECT dim, MIN(x) AS dmin, MAX(x) AS dmax FROM cells GROUP BY dim),
    codes AS (
        SELECT c.vec_id, c.dim,
               CASE WHEN s.dmax = s.dmin THEN 0
                    ELSE CAST(round((c.x - s.dmin) * 255.0 / (s.dmax - s.dmin))
                              AS INT) END AS code
        FROM cells c JOIN stats s USING (dim)
    )
"""

_DEQ_CTE = """
    deq AS (
        SELECT c.vec_id, c.dim,
               CASE WHEN s.dmax = s.dmin THEN s.dmin
                    ELSE s.dmin + c.code * (s.dmax - s.dmin) / 255.0 END AS dx
        FROM codes c JOIN stats s USING (dim)
    ),
    q AS (SELECT dim, x AS qx FROM cells WHERE vec_id = 0)
"""


def _quantized(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(cells, stats, codes): the exploded corpus, the 64-row broadcastable
    grid, and the integer codes - shared by every SQ8 query."""
    emb = load(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cells = emb.select("vec_id", F.posexplode("v").alias("dim", "x"))
    stats = cells.groupBy("dim").agg(
        F.min("x").alias("dmin"), F.max("x").alias("dmax")
    )
    codes = cells.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "dim",
        F.when(F.col("dmax") == F.col("dmin"), F.lit(0))
        .otherwise(
            F.round(
                (F.col("x") - F.col("dmin")) * 255.0 / (F.col("dmax") - F.col("dmin"))
            ).cast("int")
        )
        .alias("code"),
    )
    return cells, stats, codes


@register(
    "sq8_encode_stats",
    oracle=f"""
        WITH {_CELLS_CTE}
        SELECT CAST(dim AS INT) AS dim,
               round(ANY_VALUE(s.dmin), 6) AS grid_min,
               round(ANY_VALUE(s.dmax), 6) AS grid_max,
               CAST(SUM(code) AS BIGINT) AS sum_codes,
               CAST(MAX(code) AS INT) AS max_code
        FROM codes JOIN stats s USING (dim)
        GROUP BY dim ORDER BY dim
    """,
    tags=("llm", "similarity", "quantization"),
)
def sq8_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQ8 encode pass attested per dimension: the quantization grid
    (min/max) plus the integer code sum and max over the whole corpus -
    code parity here means every stored byte matches the oracle exactly.
    One explode + one 64-group aggregate; the grid aggregate is map-side
    combinable and the join back is a broadcast."""
    _, stats, codes = _quantized(spark, sf_dir)
    return (
        codes.join(F.broadcast(stats), "dim")
        .groupBy("dim")
        .agg(
            F.round(F.first("dmin"), 6).alias("grid_min"),
            F.round(F.first("dmax"), 6).alias("grid_max"),
            F.sum("code").cast("long").alias("sum_codes"),
            F.max("code").cast("int").alias("max_code"),
        )
        .select(F.col("dim").cast("int").alias("dim"), "grid_min", "grid_max",
                "sum_codes", "max_code")
        .orderBy("dim")
    )


def _adc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector asymmetric distance: exact query coordinates vs the
    dequantized corpus codes - (vec_id, adc_d2) rounded to 6dp."""
    cells, stats, codes = _quantized(spark, sf_dir)
    deq = codes.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "dim",
        F.when(F.col("dmax") == F.col("dmin"), F.col("dmin"))
        .otherwise(
            F.col("dmin")
            + F.col("code") * (F.col("dmax") - F.col("dmin")) / 255.0
        )
        .alias("dx"),
    )
    q = cells.filter(F.col("vec_id") == 0).select("dim", F.col("x").alias("qx"))
    return (
        deq.join(F.broadcast(q), "dim")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum((F.col("qx") - F.col("dx")) * (F.col("qx") - F.col("dx"))), 6
            ).alias("adc_d2")
        )
    )


@register(
    "sq8_adc_top5",
    oracle=f"""
        WITH {_CELLS_CTE},{_DEQ_CTE}
        SELECT vec_id, round(SUM((q.qx - deq.dx) * (q.qx - deq.dx)), 6) AS adc_d2
        FROM deq JOIN q USING (dim)
        GROUP BY vec_id
        ORDER BY adc_d2, vec_id
        LIMIT 5
    """,
    tags=("llm", "similarity", "quantization"),
)
def sq8_adc_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 asymmetric search: the query keeps its exact coordinates, every
    corpus vector is priced from its 1-byte codes (dequantized against the
    broadcast 64-row grid). Top-5 for the vec_id=0 query point - the ANN
    family's shared convention. The scan is narrow (codes + broadcast
    grid); ranking is TakeOrderedAndProject, no global sort."""
    return _adc_scores(spark, sf_dir).orderBy("adc_d2", "vec_id").limit(5)


@register(
    "sq8_recall_audit",
    oracle=f"""
        WITH {_CELLS_CTE},{_DEQ_CTE},
        adc AS (
            SELECT vec_id
            FROM deq JOIN q USING (dim)
            GROUP BY vec_id
            ORDER BY round(SUM((q.qx - deq.dx) * (q.qx - deq.dx)), 6), vec_id
            LIMIT 5
        ),
        exact AS (
            SELECT c.vec_id
            FROM cells c JOIN q USING (dim)
            GROUP BY c.vec_id
            ORDER BY round(SUM((q.qx - c.x) * (q.qx - c.x)), 6), c.vec_id
            LIMIT 5
        )
        SELECT CAST(5 AS BIGINT) AS k,
               CAST((SELECT COUNT(*) FROM adc
                     WHERE vec_id IN (SELECT vec_id FROM exact)) AS BIGINT)
                   AS n_hits,
               round((SELECT COUNT(*) FROM adc
                      WHERE vec_id IN (SELECT vec_id FROM exact)) / 5.0, 2)
                   AS recall_at_5
    """,
    tags=("llm", "similarity", "quantization", "audit"),
)
def sq8_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@5 of SQ8 ADC search vs exact L2 brute force for the
    vec_id=0 query - the calibration evidence that 1-byte codes preserve
    the neighborhood (the audit twin of pq_recall_audit; SQ8's grid is
    much finer than PQ's 8 centroids per subspace, so recall should be at
    least as high). The exact side is one full-scan pass; the hit count is
    a 5-row join."""
    cells, _, _ = _quantized(spark, sf_dir)
    adc_ids = (
        _adc_scores(spark, sf_dir).orderBy("adc_d2", "vec_id").limit(5).select("vec_id")
    )
    q = cells.filter(F.col("vec_id") == 0).select("dim", F.col("x").alias("qx"))
    exact_ids = (
        cells.join(F.broadcast(q), "dim")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum((F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x"))), 6
            ).alias("d2")
        )
        .orderBy("d2", "vec_id")
        .limit(5)
        .select("vec_id")
    )
    hits = adc_ids.join(exact_ids, "vec_id").count()
    return spark.createDataFrame(
        [(5, hits, round(hits / 5.0, 2))],
        "k long, n_hits long, recall_at_5 double",
    )
