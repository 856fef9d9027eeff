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


def ranked_by_range(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rk",
    num_shards: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global ROW_NUMBER over a TOTAL order without a
    single-partition window — the sharded rank scan `bucketed_running_sum`
    documents, generalized from string-prefix buckets to range partitions
    so any orderable key works (no lexicographic encoding, no skew from
    shared prefixes):

    1. `repartitionByRange` on the order columns — contiguous, ordered
       shards (the range sampler balances them);
    2. per-shard row counts to the driver (one row per shard — bounded
       index metadata, like the graph convergence probes);
    3. exclusive shard offsets broadcast back; within-shard ROW_NUMBER
       (partitionBy shard id — parallel) plus the offset is the global
       rank.

    `order_cols` must be a TOTAL order (include a unique tiebreaker) —
    equal keys may straddle a range boundary, and only a total order makes
    the straddling rank-exact. Returns (frame + out_col, total row count)
    — the count is free from the shard totals, so NTILE-style consumers
    need no second pass.

    Plan note: the within-shard window adds one balanced hash exchange on
    `_shard` (Catalyst cannot consume the checkpointed range layout as a
    distribution guarantee), so the frame moves twice — still strictly
    better than the single-partition global sort this replaces; callers
    feed either a pre-aggregated key frame (|customers|, |vocab|) or a
    column-pruned projection of the fact (ntile_decile: 2 columns)."""
    spark = df.sparkSession
    shards = num_shards or spark.sparkContext.defaultParallelism
    # localCheckpoint PINS the shard layout: the counts job and the window
    # job must see the IDENTICAL partitioning, but a re-executed range
    # exchange need not reproduce it (AQE coalesces adjacent range
    # partitions per-job from that job's runtime stats, and the range
    # sampler is per-execution) - without the pin the broadcast offsets
    # can misalign with the window's shard ids and ranks silently skew
    # (caught by the ntile_decile_price_bounds oracle at sf0.01).
    parts = (
        df.repartitionByRange(shards, *order_cols)
        .withColumn("_shard", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = sorted(
        (r["_shard"], r["cnt"])
        for r in parts.groupBy("_shard").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = spark.createDataFrame(offsets or [(0, 0)], "_shard int, _offset long")
    w = Window.partitionBy("_shard").orderBy(*order_cols)
    out = (
        parts.join(F.broadcast(off), "_shard")
        .withColumn(out_col, F.row_number().over(w) + F.col("_offset"))
        .drop("_shard", "_offset")
    )
    return out, acc


def ntile_from_rank(rank_col: str, n_rows: int, tiles: int = 5) -> F.Column:
    """NTILE(tiles) from a unique 1-based global rank (e.g. from
    `ranked_by_range`) — the exact SQL semantics in closed form: the first
    (n mod tiles) groups get ceil(n/tiles) rows, the rest floor(n/tiles).
    Pure integer arithmetic, bit-identical to window NTILE on any engine;
    with the rank coming from the sharded scan this replaces the
    single-partition NTILE sort wholesale."""
    q, r = divmod(n_rows, tiles)
    lim = r * (q + 1)
    big = f"cast((({rank_col} - 1) div {q + 1}) + 1 as int)"
    if q == 0:
        return F.expr(big)  # fewer rows than tiles: group = rank
    return F.expr(
        f"CASE WHEN {rank_col} <= {lim} THEN {big} "
        f"ELSE cast({r} + (({rank_col} - {lim} - 1) div {q}) + 1 as int) END"
    )
