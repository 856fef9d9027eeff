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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of `col`, unioned and
    deduplicated. Returns a one-column DataFrame of candidate values that
    is a superset of every value with global frequency > n/capacity.

    The batched decrement (subtract the (capacity+1)-th largest counter
    from all, drop the non-positive) is a run of classic MG decrement
    steps, so the standard error bound n_p/capacity per partition holds.

    NULL keys are OUT OF SCOPE and dropped up front: pandas value_counts
    skips NaN and an equi-join never matches NULL anyway, so without the
    explicit filter a NULL key carrying > phi of traffic would be silently
    omitted. Callers that care about NULL traffic should count it
    separately (one `df.filter(col.isNull()).count()`).
    """
    df = df.filter(F.col(col).isNotNull())
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
    with exact counts, ordered by count desc then value. NULL keys are out
    of scope (dropped by the sketch pass; see misra_gries_candidates) -
    the denominator still counts every row, matching a GROUP BY/HAVING
    oracle that excludes the NULL group."""
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


def cms_bucket_cols(col: str, depth: int, width: int) -> list:
    """The count-min bucket ids of `col` for each of `depth` hash rows.
    Row r's hash is the first 6 hex chars of md5('r<r>:' || value) read as
    an integer, mod width - pure md5-hex arithmetic, so any engine with
    md5 reproduces the buckets bit-exactly (the same cross-engine hash
    convention as minhash_signatures)."""
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("", F.lit(f"r{r}:"), F.col(col))), 1, 6
                ),
                16,
                10,
            ).cast("long")
            % width
        ).alias(f"c{r}")
        for r in range(depth)
    ]


def count_min_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """The count-min sketch of `col`'s value stream as a (r, c, bucket_n)
    DataFrame of at most depth * width rows.

    Each occurrence increments one bucket per hash row; the build is a
    single groupBy over (row, bucket) with MAP-SIDE partial aggregation,
    so every map partition ships at most depth * width partial counts no
    matter how many rows or distinct values it holds - the sketch is the
    fixed-memory substitute for a full value-count table when only
    frequency ESTIMATES of queried values are needed. Estimates (min over
    rows of the value's buckets) never undercount; overcounts are bounded
    by e * N / width with probability 1 - (1/e)^depth (Cormode-Muthu)."""
    return (
        df.select(F.posexplode(F.array(*cms_bucket_cols(col, depth, width))).alias("r", "c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("bucket_n"))
    )


def cms_estimates(
    values: DataFrame, sketch: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Attach `cms_est` (the count-min point estimate) to every row of
    `values`. The sketch is depth * width rows at most - always broadcast;
    the probe is a narrow per-value join + min, no shuffle of `values`
    beyond the final per-value min aggregate."""
    keep = [c for c in values.columns]
    probed = values.select(
        *keep, F.posexplode(F.array(*cms_bucket_cols(col, depth, width))).alias("r", "c")
    )
    return (
        probed.join(F.broadcast(sketch), ["r", "c"])
        .groupBy(*keep)
        .agg(F.min("bucket_n").alias("cms_est"))
    )


def bloom_screen_new(
    new_df: DataFrame,
    hist_df: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """Rows of `new_df` whose `col` value does NOT appear in `hist_df`,
    computed with a Bloom-filter pre-screen so the exact (shuffling)
    anti-join only touches the rows the filter could not clear.

    Build: k xxhash64(value, seed) bit positions per history row, JVM-side,
    folded DISTRIBUTED into 64-bit words - groupBy(word_index) +
    bit_or(mask) with map-side partial aggregation, so the shuffle and the
    driver each see at most m_bits/64 rows (non-zero words only), never
    the raw bit positions. The words concat into an m_bits/8-byte bitmap
    that broadcasts once. Probe: the new side computes ITS positions
    JVM-side too - the Arrow-batched pandas UDF only tests bits against
    the broadcast bitmap with vectorized numpy gathers (one (n, k) fancy
    index per Arrow batch, no per-row Python), so both engines' hash
    arithmetic is identical by construction (no Python hashing to drift).

    No false negatives: a clear miss is definitely new and skips the join
    entirely; only might-contain candidates (true dups + fpp share) take
    the exact anti-join. Result is EXACT - the sketch prunes join traffic,
    never answers. At 2^30 bits the bitmap broadcast is 128 MB - the
    practical ceiling; beyond that, partition the filter or use the LSH
    band index (operators/incremental.py)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    def positions(c: str):
        return F.array(
            *[
                F.pmod(F.xxhash64(F.col(c), F.lit(i)), F.lit(m_bits)).cast("long")
                for i in range(k_hashes)
            ]
        )

    # Distributed OR-fold: bit b lives in word b div 64 as mask 1 << (b%64).
    # bit_or is idempotent, so no distinct() pass is needed and partial
    # aggregation bounds every map output at one row per touched word.
    set_words = (
        hist_df.select(F.explode(positions(col)).alias("b"))
        .select(
            F.expr("b div 64").alias("w"),
            F.expr("shiftleft(1L, cast(b % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    words = np.zeros(m_bits // 64, dtype="<u8")
    for r in set_words.collect():  # <= m_bits/64 rows of (word, bits)
        words[int(r["w"])] = np.uint64(int(r["bits"]) & 0xFFFFFFFFFFFFFFFF)
    # Little-endian word bytes make byte j of word w cover global bits
    # (w*64 + j*8)..(w*64 + j*8 + 7) - byte-identical to the classic
    # bitmap[b >> 3] |= 1 << (b & 7) layout the probe below indexes.
    bc = new_df.sparkSession.sparkContext.broadcast(words.tobytes())

    @pandas_udf("boolean")
    def might_contain(bits: pd.Series) -> pd.Series:
        if len(bits) == 0:
            return pd.Series([], dtype=bool)
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        pos = np.vstack(bits.to_numpy()).astype(np.int64)  # (n, k)
        hit = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    screened = new_df.withColumn("_might", might_contain(positions(col)))
    definite_new = screened.filter(~F.col("_might")).drop("_might")
    candidates = screened.filter(F.col("_might")).drop("_might")
    verified_new = candidates.join(
        hist_df.select(col).distinct(), on=col, how="left_anti"
    )
    return definite_new.unionByName(verified_new)
