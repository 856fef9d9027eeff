"""Semi-structured (JSON) column surface: the events table carries a JSON
`props` payload; these queries parse it with an explicit schema (from_json
-> typed struct, JVM-native, no Python) and aggregate the extracted fields -
the clickstream-property pattern every event pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register

_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


@register(
    "events_json_extract_stats",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                 AS sum_k,
               CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                 AS min_k,
               CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                 AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("json", "A-ext"),
)
def events_json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation: parse `props` with an
    explicit schema (from_json -> struct<k: bigint>; malformed/missing keys
    become NULL, counted separately) and roll integer-exact stats up per
    event type.

    Scale shape: from_json with a DECLARED schema is a native Catalyst
    expression inside whole-stage codegen - no schema inference pass over
    the data (schema_of_json exists for exploration; production pins the
    struct), no Python. One scan, one bounded-cardinality aggregate."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", _PROPS_SCHEMA).getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
