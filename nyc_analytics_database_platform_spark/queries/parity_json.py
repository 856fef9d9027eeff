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


@register(
    "xml_roundtrip_order_extract",
    oracle="""
        SELECT o_orderkey,
               CAST(o_custkey AS BIGINT) AS cust,
               o_orderstatus AS status,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM orders
        WHERE o_orderkey % 100 = 0
        ORDER BY o_orderkey
    """,
    tags=("sql-surface", "spark4", "xml"),
)
def xml_roundtrip_order_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 built-in XML: orders serialized to XML strings with to_xml,
    then parsed back with from_xml into typed fields - the semi-structured
    surface beside the JSON (get_json_object/from_json) and Variant
    families. The oracle is the identity: a lossless roundtrip must
    reproduce the source columns exactly (DECIMAL-routed price so the
    double is bit-stable). Both directions are native expressions inside
    one codegen stage - no UDF, no shuffle beyond the presentation sort.
    (Avro and protobuf columnar codecs are documented out-of-scope: the
    spark-avro package and python protobuf runtime are absent here; XML,
    JSON, and Variant are the in-scope semi-structured codecs.)"""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    xml = orders.select(
        "o_orderkey",
        F.to_xml(
            F.struct(
                F.col("o_custkey").alias("cust"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            )
        ).alias("doc"),
    )
    schema = "cust BIGINT, status STRING, price DECIMAL(18,2)"
    parsed = xml.select(
        "o_orderkey", F.from_xml("doc", schema).alias("p")
    )
    return parsed.select(
        "o_orderkey",
        F.col("p.cust").alias("cust"),
        F.col("p.status").alias("status"),
        F.col("p.price").cast("double").alias("price"),
    ).orderBy("o_orderkey")


@register(
    "events_variant_extract_stats",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                             AND json_valid(props)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_k,
               CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT)
                                  % 2 = 0
                             THEN CAST(json_extract(props, '$.k') AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS sum_even_k,
               COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT) // 10)
                   AS distinct_k_buckets
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("json", "variant", "spark4"),
)
def events_variant_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: `parse_json` props
    into a VariantType column, read fields with `variant_get` typed paths,
    and roll up per event type — the schema-on-read twin of
    events_json_extract_stats (which pins a from_json struct). VARIANT is
    the right call when the payload schema drifts: the binary-encoded
    variant parses once and every `variant_get` is a cheap path read, no
    re-parse per field and no declared struct to migrate.

    DuckDB has no VARIANT; the oracle reads the same paths with
    json_extract — identical integer semantics, which is exactly the
    point (VARIANT changes the storage/access shape, not the answers).

    Scale shape: parse_json + variant_get are native Catalyst expressions
    in whole-stage codegen; one scan, one bounded-cardinality aggregate.
    At 100 TB the parsed variant column is what you'd persist (shredded
    parquet), making every later path read column-pruned."""
    ev = load(spark, sf_dir, "events")
    var = F.parse_json("props")
    k = F.variant_get(var, "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_valid_k"),
            F.coalesce(
                F.sum(F.when(F.col("k") % 2 == 0, F.col("k")).otherwise(0)),
                F.lit(0),
            ).alias("sum_even_k"),
            F.countDistinct(F.expr("k div 10")).alias("distinct_k_buckets"),
        )
        .orderBy("event_type")
    )
