"""Snapshot diff: classify rows across two table versions as added /
removed / changed, keyed by a natural key.

The regression primitive of a maintained warehouse: validate a backfill
against the previous snapshot, audit a CDC apply (operators/merge.py) by
diffing its output against the expected state, or produce the change feed
two full snapshots imply. The reference app has no history, so it cannot
express this; a 100 TB pipeline runs it after every rewrite.

Plan shape: one full outer SortMergeJoin on the key — a single co-partitioned
shuffle of both sides, no row multiplication (keys are unique per side).
Change detection compares md5 over the concatenated tracked columns inside
the join projection, so wide rows never shuffle twice. With both snapshots
bucketed on the key (sources/layout.py) the Exchange disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_digest(df: DataFrame, cols: list[str]) -> Column:
    """Null-safe xxhash64 digest of the tracked columns. Each column hashes
    independently to a long (null -> a fixed marker long) and the longs fold
    through one outer xxhash64 — positionally unambiguous, so no value can
    stand in for a null in another column (plain xxhash64(c1, c2) SKIPS null
    inputs, making ('x', null) and (null, 'x') collide). A real column
    hashing to the marker long is a 2^-64 per-row event — the accepted
    digest-collision rate; the previous md5-hex-string scheme was collision
    free but cost ~10x in hashing and string allocation per row (md5 hex of
    md5 hex), measured as the dominant term of a wide-table diff."""
    parts = [
        F.when(F.col(c).isNull(), F.lit(-0x61C8864680B583EB)).otherwise(
            F.xxhash64(F.col(c))
        )
        for c in cols
    ]
    return F.xxhash64(*parts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Full-outer diff of two snapshots on `key_cols`. Returns one row per
    key that differs: key columns + change_type ('added' | 'removed' |
    'changed'). `compare_cols` defaults to every non-key column present in
    BOTH frames. Assumes keys are unique within each snapshot (enforce
    upstream with dedup_exact if not)."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in key_cols and c in new.columns
        ]
    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        _row_digest(old, compare_cols).alias("_old_digest"),
    )
    n = new.select(
        *[F.col(c).alias(f"n_{c}") for c in key_cols],
        _row_digest(new, compare_cols).alias("_new_digest"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"k_{c}").eqNullSafe(F.col(f"n_{c}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("_old_digest").isNull(), F.lit("added"))
        .when(F.col("_new_digest").isNull(), F.lit("removed"))
        .when(F.col("_old_digest") != F.col("_new_digest"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"k_{c}"), F.col(f"n_{c}")).alias(c)
                for c in key_cols
            ],
            "change_type",
        )
    )
