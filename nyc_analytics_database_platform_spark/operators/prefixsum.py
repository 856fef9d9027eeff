"""Distributed ordered prefix sum (two-level bucketed cumsum).

A running total over a GLOBAL order is the textbook window
`SUM(...) OVER (ORDER BY k)` - which Spark executes in ONE partition (the
WindowExec warns about it): correct on a bounded series, a scale-killer on a
corpus. This operator computes the same result with bounded parallelism, the
classic two-pass scan algorithm:

1. bucket every row by a PREFIX of the (orderable) key - prefix buckets are
   order-consistent: every key in bucket b sorts before every key in b+1;
2. per-bucket totals (one small aggregate) come to the driver - bucket
   count is fixed (e.g. 256), so this is index metadata, not data;
3. exclusive prefix offsets per bucket broadcast-join back, and the
   within-bucket window (partitionBy bucket - parallel!) adds its local
   running sum to the bucket offset.

Total cost: one aggregate + one windowed pass, both partitioned; no
single-partition stage anywhere. The same shape serves token-budget
sampling, exact-quantile assignment, and deterministic data splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_running_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "running_total",
    prefix_len: int = 2,
) -> DataFrame:
    """Add `out_col` = inclusive running sum of `value_col` in the global
    ascending order of the string key `key_col`. Keys must be
    lexicographically orderable (the callers use md5 hex digests, the
    repo's cross-engine ordering convention); the bucket is the key's first
    `prefix_len` characters, giving 16^prefix_len buckets."""
    bucket = F.substring(key_col, 1, prefix_len).alias("_bucket")
    rows = df.withColumn("_bucket", bucket)

    # coalesce: a bucket whose values are all NULL sums to NULL; treat it
    # as contributing 0 to downstream offsets instead of crashing int(None).
    totals = (
        rows.groupBy("_bucket")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("_bucket_total"))
        .collect()
    )
    offset_of: dict[str, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["_bucket"]):
        offset_of[r["_bucket"]] = acc
        acc += int(r["_bucket_total"])
    offsets = df.sparkSession.createDataFrame(
        [(b, o) for b, o in offset_of.items()], "_bucket string, _offset long"
    )

    w = (
        Window.partitionBy("_bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rows.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            out_col, F.col("_offset") + F.sum(value_col).over(w)
        )
        .drop("_bucket", "_offset")
    )
