"""Frequency-sketch operators: distributed heavy hitters (Misra-Gries).

Two-pass scalable shape (the 100 TB pattern for "which keys exceed phi of
all traffic" when the key domain is too large to group-count exactly):

1. SKETCH: each partition runs a Misra-Gries summary of capacity k over its
   rows via `mapInPandas` (Arrow-batched; no Python per-row UDF). MG's
   guarantee transfers across partitions by an averaging argument: if an
   item's global frequency exceeds n/k, its frequency in at least one
   partition exceeds that partition's n_p/k, so it survives that
   partition's summary. The union of partition summaries is therefore a
   SUPERSET of the true phi = 1/k heavy hitters, and its size is bounded by
   k * num_partitions regardless of domain cardinality.
2. VERIFY: the candidate set (small) is broadcast-semi-joined back against
   the stream and counted EXACTLY; the final threshold filter then makes
   the result exact - sketch error never reaches the output, only the
   candidate-generation cost.

This mirrors the sketch->candidates->exact-verify shape used by the LSH
dedup operators (operators/dedup.py): approximate pruning, exact answers.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of `col`, unioned and
    deduplicated. Returns a one-column DataFrame of candidate values that
    is a superset of every value with global frequency > n/capacity.

    The batched decrement (subtract the (capacity+1)-th largest counter
    from all, drop the non-positive) is a run of classic MG decrement
    steps, so the standard error bound n_p/capacity per partition holds.
    """
    field = df.schema[col]
    out_schema = f"{col} {field.dataType.simpleString()}"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for value, cnt in pdf[col].value_counts().items():
                counters[value] = counters.get(value, 0) + int(cnt)
            if len(counters) > capacity:
                # (capacity+1)-th largest counter value = amount every
                # counter can give up while keeping any > n_p/capacity item.
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(summarize, out_schema).distinct()


def heavy_hitters(
    df: DataFrame, col: str, phi: float, capacity: int | None = None
) -> DataFrame:
    """Exact phi-heavy-hitters of `col` via the two-pass sketch+verify
    shape: values whose frequency strictly exceeds phi * count(*).

    `capacity` defaults to ceil(1/phi), the smallest MG capacity whose
    superset guarantee covers the phi threshold. Output: (col, n_rows)
    with exact counts, ordered by count desc then value."""
    if capacity is None:
        capacity = int(1.0 / phi) + 1
    if capacity * phi < 1.0:
        raise ValueError(f"capacity {capacity} too small for phi={phi}")
    candidates = misra_gries_candidates(df, col, capacity)
    total = df.agg(F.count("*").alias("_total"))
    exact = (
        df.join(F.broadcast(candidates), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("n_rows"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") > F.col("_total") * F.lit(phi))
        .drop("_total")
        .orderBy(F.desc("n_rows"), col)
    )
