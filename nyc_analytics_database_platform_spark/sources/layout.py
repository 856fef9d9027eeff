"""Storage-layout utilities: partitioned/bucketed writes and small-file
compaction - the write-side half of the 100 TB design (SCALE.md Layout).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within: list[str] | None = None,
) -> None:
    """Partitioned parquet sink; optional within-partition sort improves
    parquet min/max stats (row-group skipping for range predicates)."""
    out = df.sortWithinPartitions(*sort_within) if sort_within else df
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame, table: str, bucket_by: str, n_buckets: int = 8
) -> None:
    """Bucketed + sorted managed table: joins/aggregations on the bucket key
    skip their shuffle entirely (evidence: tests/test_bucketed_join.py)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_by)
        .sortBy(bucket_by)
        .saveAsTable(table)
    )


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int]:
    """Rewrite a parquet directory into ~target-sized files. Long-running
    pipelines accrete small files (per-trigger streaming output, per-task
    shards); scans then pay per-file open cost and lose row-group locality.
    Returns (files_before, files_after).

    Scale note: this is the local single-dir variant; at 100 TB compaction
    runs per partition directory so it parallelizes and can be incremental
    (only dirs whose small-file count exceeds a threshold).
    """
    files_before = len(glob.glob(os.path.join(path, "*.parquet")))
    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    n = max(1, round(total_bytes / target_file_bytes))
    tmp = path.rstrip("/") + "__compact"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (local filesystem; object stores use a manifest swap)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    files_after = len(glob.glob(os.path.join(path, "*.parquet")))
    return files_before, files_after
