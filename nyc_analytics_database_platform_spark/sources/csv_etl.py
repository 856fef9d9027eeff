"""CSV -> clean -> Parquet ETL stage.

The reference's load path was CSV -> clean_csv_files.py -> PostgreSQL,
offline and excluded from its repo (reference: .gitignore:1-7). This module
is that stage, Spark-native: explicit schema (no inference - one pass, no
sampling job), trim/normalize, CHECK-constraint validation with an audit
side-channel, and a partitioned parquet sink.

Scale: schema-on-read CSV with a declared StructType streams through without
an inference pre-pass; the clean step is all native expressions; the sink
partitions by a pruning column so downstream queries skip data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.functions.quality import split_valid


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.csv(path, header=True, schema=schema, mode="PERMISSIVE")


def clean_strings(df: DataFrame) -> DataFrame:
    """Trim every string column; empty strings -> NULL (the reference's
    cleaning concern: strip + default handling, server.py:114,365-367)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            trimmed = F.trim(F.col(f.name))
            out = out.withColumn(
                f.name, F.when(trimmed == "", None).otherwise(trimmed)
            )
    return out


def etl_csv_to_parquet(
    spark: SparkSession,
    csv_path: str,
    parquet_path: str,
    schema: T.StructType,
    checks: dict[str, Column] | None = None,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Full stage: read -> clean -> validate -> write. Returns
    (valid_rows, rejected_rows); rejects land beside the sink as an audit
    table with the violated check names."""
    df = clean_strings(read_csv(spark, csv_path, schema))
    valid, bad = split_valid(df, checks or {})
    writer = valid.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(parquet_path)
    n_bad = bad.count()
    if n_bad:
        bad.withColumn("violated", F.concat_ws(",", "violated")).write.mode(
            "overwrite"
        ).parquet(parquet_path.rstrip("/") + "_rejects")
    return int(spark.read.parquet(parquet_path).count()), int(n_bad)
