"""Small-file compaction: rewrite a fragmented parquet directory into
~target-size files.

The operational gap every long-lived table hits: streaming sinks,
per-trigger writes, and incremental merges (operators/maintenance.py,
streaming sinks) leave thousands of KB-scale files, and at 100 TB the
scan's task-per-file scheduling and footer overhead dominate. Compaction
is the standing maintenance job that bin-packs them back to the ~1 GB
file target the scan wants.

Plan shape: one REBALANCE shuffle whose output partitioning AQE sizes to
`spark.sql.adaptive.advisoryPartitionSizeInBytes` - coalescing tiny
partitions and splitting skewed ones - then a plain parquet write, one
file per post-AQE partition. No driver-side file surgery: the same plan
works on a 1000-executor cluster where the files don't fit one machine,
and a transactional table format would wrap the swap in a commit.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

_ADVISORY = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def dir_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the flat .parquet files in `path`."""
    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_parquet_dir(
    spark: SparkSession, src: str, dst: str, target_bytes: int
) -> dict:
    """Rewrite `src` (flat parquet dir) into `dst` at ~`target_bytes` per
    file via a REBALANCE shuffle under a temporarily-lowered AQE advisory
    size. Returns before/after (n_files, bytes) stats. Parquet encoding
    can shrink the rewritten bytes, so the post-compaction file count
    tracks ceil(written_bytes / target), not the input byte count."""
    n_before, bytes_before = dir_stats(src)
    old = spark.conf.get(_ADVISORY, None)
    spark.conf.set(_ADVISORY, str(target_bytes))
    try:
        df = spark.read.parquet(src)
        df.hint("rebalance").write.mode("overwrite").parquet(dst)
    finally:
        if old is None:
            spark.conf.unset(_ADVISORY)
        else:
            spark.conf.set(_ADVISORY, old)
    n_after, bytes_after = dir_stats(dst)
    return {
        "n_files_before": n_before,
        "bytes_before": bytes_before,
        "n_files_after": n_after,
        "bytes_after": bytes_after,
        "target_files": max(1, math.ceil(bytes_after / target_bytes)),
    }
