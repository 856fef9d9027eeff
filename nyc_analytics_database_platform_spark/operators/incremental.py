"""Incremental (algebraic) aggregate maintenance: partial-agg + merge.

The 100 TB shape for a maintained rollup: never re-scan history. Keep the
stored aggregate in its MERGEABLE form (count, decimal sum, min, max — all
commutative monoids), aggregate only the new delta partition into the same
form, and merge with a groupBy over the union of the two small aggregate
tables. Cost per refresh is O(delta + |aggregate|), independent of history
size. This is exactly Spark's own partial-aggregation contract
(HashAggregate partial/final) lifted to a cross-batch materialized view —
and the batch twin of what Structured Streaming's stateful aggregation does
per micro-batch.

Exactness: sums stay DECIMAL(18,4) through the merge (order-independent),
cast to double only at presentation — so the merged result is bit-identical
to a from-scratch recompute, which is what the driver oracle asserts.

Derived (non-algebraic) measures — avg, stddev — must be rebuilt from the
mergeable parts at read time (avg = sum/count), never stored and merged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_agg(df: DataFrame, keys: list[str], sum_col: str) -> DataFrame:
    """Aggregate one batch into mergeable form: n / decimal sum / min / max
    of `sum_col` per `keys`."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(F.col(sum_col).cast("decimal(18,4)")).alias("sum_dec"),
        F.min(sum_col).alias("min_v"),
        F.max(sum_col).alias("max_v"),
    )


def merge_partials(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge partial aggregates (same schema) into one: the monoid combine.
    Equivalent to partial_agg over the concatenated inputs."""
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def present(df: DataFrame) -> DataFrame:
    """Presentation form: decimal sum -> double, derived avg from the parts."""
    return df.select(
        *[c for c in df.columns if c not in ("n", "sum_dec", "min_v", "max_v")],
        F.col("n").alias("n"),
        F.col("sum_dec").cast("double").alias("total"),
        (F.col("sum_dec").cast("double") / F.col("n")).alias("mean"),
        F.col("min_v").alias("min_v"),
        F.col("max_v").alias("max_v"),
    )
