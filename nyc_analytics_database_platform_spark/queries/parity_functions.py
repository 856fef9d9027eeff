"""Scalar/array function surfaces: higher-order array functions over the
embedding column and the try_* error-safe function family.

The reference's scalar surface (SURVEY 2.8) is strings + dates; these two
panels cover the array-lambda and error-handling families a Spark engine
user reaches for next - each expression JVM-side (whole-stage codegen), no
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register


@register(
    "hof_embedding_panel",
    oracle="""
        SELECT vec_id,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)
                   AS n_positive,
               round(list_reduce(
                   list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (a, b) -> a + b), 6) AS sq_norm,
               round(list_max(list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs,
               (len(list_filter(embedding, x -> abs(x) > 3.0)) = 0)
                   AS all_small
        FROM embeddings
        ORDER BY vec_id
    """,
    tags=("F-ext", "higher-order", "llm"),
)
def hof_embedding_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding vectors - filter,
    transform, aggregate (left fold), forall - all JVM-side lambdas inside
    one whole-stage-codegen scan (the fast path for vector feature
    extraction; contrast with a pandas UDF doing the same in Python).
    Determinism: floats cast to double BEFORE squaring in both engines, and
    both folds run in array order (Spark F.aggregate is a left fold; the
    oracle uses list_reduce, also a left fold - list_sum's summation order
    is unspecified, so it is deliberately avoided), making the round(6)
    doubles bit-identical."""
    emb = load(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias(
            "n_positive"
        ),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
        F.round(F.array_max(F.transform(dbl, F.abs)), 6).alias("max_abs"),
        F.forall("embedding", lambda x: F.abs(x) <= 3.0).alias("all_small"),
    ).orderBy("vec_id")


@register(
    "try_functions_audit",
    oracle="""
        WITH parsed AS (
            SELECT event_type, value,
                   TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unparsable,
               CAST(SUM(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_div7,
               MAX(CAST(value AS DOUBLE) / NULLIF(k, 0)) AS max_ratio
        FROM parsed
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("F-ext", "error-safe", "quality"),
)
def try_functions_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe function family (try_cast / try_divide): malformed or
    missing payload fields become NULLs instead of task failures - the
    difference between one bad row killing a 100 TB job and the row landing
    in an audit column. try_divide(x, 0) -> NULL mirrors DuckDB's
    x / NULLIF(k, 0). The audited ratio statistic is MAX - IEEE division is
    bit-deterministic and max is order-independent, so the double compares
    exactly with no rounding convention at all (a SUM of arbitrary doubles
    would re-introduce engine-specific rounding; see exact_sum for the
    2dp-data convention)."""
    events = load(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    ratio_or_null = F.try_divide(F.col("value"), F.nullif(k, F.lit(0)))
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("n_unparsable"),
            F.sum(F.when(k % 7 == 0, 1).otherwise(0)).alias("n_div7"),
            F.max(ratio_or_null).alias("max_ratio"),
        )
        .orderBy("event_type")
    )
