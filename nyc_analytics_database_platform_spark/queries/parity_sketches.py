"""Frequency-sketch query surfaces (operators/sketches.py).

Heavy hitters over the events stream: the sketch pass bounds memory by
capacity * partitions (domain-independent), the exact verify pass makes the
answer oracle-exact - so the DuckDB oracle is the plain GROUP BY / HAVING
the sketch replaces at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.sketches import heavy_hitters
from nyc_analytics_database_platform_spark.registry import register

_PHI = 0.005  # heavy hitter = value carrying > 0.5% of all events


@register(
    "heavy_hitters_users",
    oracle=f"""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events
        WHERE user_id IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(*) > (SELECT COUNT(*) FROM events) * {_PHI}
        ORDER BY n_rows DESC, user_id
    """,
    tags=("sketch", "heavy-hitters", "llm"),
)
def heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users carrying > phi = 0.5% of event traffic, via per-partition
    Misra-Gries summaries (mapInPandas, Arrow-batched) -> candidate union ->
    broadcast-semi-join exact recount -> threshold filter. The sketch only
    prunes; the output counts are exact, so the oracle is the direct
    GROUP BY/HAVING. At 100 TB the GROUP BY over a high-cardinality key is
    the expensive plan; the sketch caps state at capacity x partitions."""
    events = load(spark, sf_dir, "events", parallel=True)
    return heavy_hitters(events, "user_id", phi=_PHI)


@register(
    "dedup_bloom_screen_new_docs",
    oracle="""
        WITH hist AS (
            SELECT md5(lower(trim(text))) AS digest
            FROM documents WHERE doc_id % 5 <> 0
        ),
        newbatch AS (
            SELECT doc_id, source, md5(lower(trim(text))) AS digest
            FROM documents WHERE doc_id % 5 = 0
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_new,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM newbatch
        WHERE digest NOT IN (SELECT digest FROM hist)
        GROUP BY source
        ORDER BY source
    """,
    tags=("sketch", "bloom", "dedup", "incremental"),
)
def dedup_bloom_screen_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-dedup screening with a Bloom pre-filter: the new
    batch (doc_id % 5 == 0) is checked against the historical corpus digest
    set; clear bitmap misses skip the anti-join entirely (no false
    negatives), might-contain candidates get the exact anti-join. The
    aggregate output is exact, so the oracle is the plain NOT IN anti-join.
    Complements dedup_incremental_vs_corpus (LSH band index) for the
    EXACT-duplicate incremental path."""
    from nyc_analytics_database_platform_spark.operators.sketches import (
        bloom_screen_new,
    )

    docs = load(spark, sf_dir, "documents", parallel=True).withColumn(
        "digest", F.md5(F.lower(F.trim(F.col("text"))))
    )
    hist = docs.filter(F.col("doc_id") % 5 != 0).select("digest")
    new = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "source", "digest"
    )
    return (
        bloom_screen_new(new, hist, "digest")
        .groupBy("source")
        .agg(F.count("*").alias("n_new"), F.sum("doc_id").alias("id_sum"))
        .orderBy("source")
    )
