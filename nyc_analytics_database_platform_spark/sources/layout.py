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

    Hive-partitioned directories (key=value subdirs) are compacted per
    partition directory - each leaf keeps its layout and the recursion
    parallelizes naturally at scale (and can be made incremental: only
    leaves whose small-file count exceeds a threshold).

    Crash safety: the old data is renamed aside before the compacted dir is
    promoted, so an interrupt leaves either the original (pre-promote) or
    both the new dir and the `__old` backup (post-promote) - never nothing.
    On object stores the equivalent is a manifest swap.
    """
    part_dirs = sorted(
        e.path
        for e in os.scandir(path)
        if e.is_dir() and "=" in e.name and not e.name.startswith("_")
    )
    if part_dirs:
        before = after = 0
        for sub in part_dirs:
            b, a = compact_parquet(spark, sub, target_file_bytes)
            before += b
            after += a
        return before, after

    files = glob.glob(os.path.join(path, "*.parquet"))
    files_before = len(files)
    total_bytes = sum(os.path.getsize(f) for f in files)
    if total_bytes == 0:
        return files_before, files_before
    df = spark.read.parquet(path)
    n = max(1, round(total_bytes / target_file_bytes))
    tmp = path.rstrip("/") + "__compact"
    old = path.rstrip("/") + "__old"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    # promote: move old aside first so a crash between the two renames
    # leaves recoverable data, then drop the backup only on full success
    import shutil

    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = len(glob.glob(os.path.join(path, "*.parquet")))
    return files_before, files_after
