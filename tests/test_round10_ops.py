"""Round-10 operator tests: transactional compaction of manifest-tracked
layouts (rewrite + manifest refresh as one operation) and its pruning
behavior afterwards."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
    build_compacted_manifest_layout,
    manifest_compacted_quarter_revenue,
)


def _parquet_files(path: str) -> set[str]:
    return {f for f in os.listdir(path) if f.endswith(".parquet")}


def test_compaction_refreshes_manifest_and_reduces_files(spark, sf_dir):
    layout, manifest, stats = build_compacted_manifest_layout(spark, sf_dir)
    # file-count reduction is the whole point of compaction
    assert stats["n_files_before"] == 64
    assert stats["n_files_after"] < stats["n_files_before"]
    assert stats["n_files_after"] <= 8
    # the refreshed manifest lists EXACTLY the compacted files - no ghosts
    # from the fragmented layout, no missing entries
    listed = {
        r["file"] for r in spark.read.parquet(manifest).select("file").collect()
    }
    assert listed == _parquet_files(layout)
    assert stats["manifest_files"] == len(listed)
    # manifest row counts must add up to the table (nothing dropped/dup'd)
    n_manifest = (
        spark.read.parquet(manifest).agg(F.sum("n_rows")).collect()[0][0]
    )
    assert n_manifest == spark.read.parquet(layout).count()


def test_compacted_manifest_prunes_quarter_scan(spark, sf_dir):
    """The quarter probe must open a strict subset of the compacted files
    (range clustering keeps stat ranges disjoint), and the pruned result
    must equal the unpruned rollup."""
    layout, manifest, stats = build_compacted_manifest_layout(spark, sf_dir)
    q_lo, q_hi = "1997-01-01", "1997-04-01"
    picked = (
        spark.read.parquet(manifest)
        .filter(
            (F.col("max_ts") >= F.lit(q_lo).cast("timestamp"))
            & (F.col("min_ts") < F.lit(q_hi).cast("timestamp"))
        )
        .count()
    )
    assert 1 <= picked < stats["n_files_after"]
    got = {
        tuple(r)
        for r in manifest_compacted_quarter_revenue(spark, sf_dir).collect()
    }
    full = {
        tuple(r)
        for r in spark.read.parquet(layout)
        .filter(
            (F.col("o_orderdate") >= F.lit(q_lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(q_hi).cast("timestamp"))
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
        .collect()
    }
    assert got == full
