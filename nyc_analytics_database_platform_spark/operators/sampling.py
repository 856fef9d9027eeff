"""Deterministic sampling / splitting / ordering operators for training-data
pipelines.

Everything here is HASH-deterministic, never RNG-based: membership of a row
in a sample, split, or shuffle position is a pure function of its key
(md5 - the one hash primitive with identical output in Spark and DuckDB, so
every operator has an exact cross-engine oracle). That determinism is the
production property that matters at 100 TB:

- reproducible: re-running the pipeline (or backfilling one partition)
  yields the same sample - no seed bookkeeping across executors;
- stable under data movement: membership doesn't depend on partitioning,
  row order, or cluster size (all of which RNG sampling silently does);
- incremental: new rows join the same split/sample lawfully without
  re-sampling history.

Mechanics: the first 8 hex chars of md5(key) are a uniform draw from
[0, 16^8); comparing that fixed-width lowercase hex string lexicographically
against a precomputed threshold string IS the numeric comparison, with no
integer conversion to drift between engines. Every operator is a narrow
per-row expression (no shuffle) except where a global order is the explicit
semantic (sequence packing), and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 16**8  # first 8 hex digits of md5


def hex_threshold(rate: float) -> str:
    """rate in [0,1] -> zero-padded 8-hex-digit threshold string."""
    return format(min(int(rate * HASH_SPACE), HASH_SPACE - 1), "08x")


def hash_draw(key: Column) -> Column:
    """Uniform [0, 16^8) draw as a fixed-width hex string: deterministic,
    partition-independent, identical in DuckDB as
    substr(md5(CAST(key AS VARCHAR)), 1, 8)."""
    return F.substring(F.md5(key.cast("string")), 1, 8)


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep rows whose hash draw falls under `rate` - the reproducible
    Bernoulli sample. A narrow filter: pushes down past the scan, no
    shuffle, and at 100 TB the sample of a partition is computable from
    that partition alone."""
    return df.filter(hash_draw(F.col(key_col)) < F.lit(hex_threshold(rate)))


def split_column(
    key: Column, fractions: dict[str, float]
) -> Column:
    """CASE expression assigning each row to a named split by cumulative
    hash-threshold bands, e.g. {'train': .8, 'val': .1, 'test': .1}.
    Fractions must sum to 1 (the last band absorbs rounding)."""
    draw = hash_draw(key)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = draw < F.lit(hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample (the hash analogue of
    df.sampleBy, but reproducible and partition-independent). Rebalances
    skewed corpora - e.g. downsample the dominant language - in one narrow
    pass with no shuffle."""
    thr = F.lit(hex_threshold(default_rate))
    for value, rate in rates.items():
        thr = F.when(
            F.col(strata_col) == value, F.lit(hex_threshold(rate))
        ).otherwise(thr)
    return df.filter(hash_draw(F.col(key_col)) < thr)


def shuffle_order(key: Column) -> Column:
    """The deterministic global-shuffle sort key (training-epoch order):
    ordering by md5(key) is a reproducible permutation of the corpus.
    Different epochs prepend an epoch tag to the key."""
    return F.md5(key.cast("string"))


def pack_sequences(
    docs: DataFrame,
    context_tokens: int,
    token_count: Column,
    key_col: str = "doc_id",
) -> DataFrame:
    """Plan sequence packing: assign documents (in deterministic shuffle
    order) to consecutive context windows of `context_tokens`, the standard
    pre-training batch-construction step. bin = floor(exclusive-prefix-sum
    of token counts / C): greedy contiguous packing where a document that
    straddles a boundary starts the next fill (its overflow is the
    truncation/continuation policy applied downstream).

    The global window here is the exact-oracle formulation; the 100 TB
    variant is pack_sequences_sharded below (window PARTITION BY shard) -
    each shard is one training-data file, so a global prefix sum is never
    actually needed.
    """
    w = Window.orderBy("_ord").rowsBetween(Window.unboundedPreceding, -1)
    return (
        docs.select(
            F.col(key_col),
            shuffle_order(F.col(key_col)).alias("_ord"),
            token_count.alias("n_tokens"),
        )
        .withColumn(
            "bin_id",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
                / F.lit(context_tokens)
            ),
        )
        .drop("_ord")
    )


def pack_sequences_sharded(
    docs: DataFrame,
    context_tokens: int,
    token_count: Column,
    n_shards: int = 16,
    key_col: str = "doc_id",
) -> DataFrame:
    """The SCALE formulation of sequence packing: documents are hash-sharded
    (first hex digit(s) of the md5 order key, so shard membership is as
    deterministic as the order itself), and the prefix-sum window runs
    PARTITION BY shard - every partition packs independently, no
    single-partition stage anywhere (each shard is one training-data file;
    bins are local to their shard, which is exactly how packed pre-training
    files are laid out). Output adds (shard, bin_id).

    n_shards must be a power of 16 subdivision expressible as a hex prefix
    (16, 256, ...); 16^p shards uses a p-char prefix. At 100 TB pick the
    prefix so each shard's token total fits one output file."""
    import math

    p = round(math.log(n_shards, 16))
    if 16**p != n_shards:
        raise ValueError(f"n_shards must be a power of 16, got {n_shards}")
    w = (
        Window.partitionBy("shard")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            F.col(key_col),
            shuffle_order(F.col(key_col)).alias("_ord"),
            token_count.alias("n_tokens"),
        )
        .withColumn("shard", F.substring("_ord", 1, p))
        .withColumn(
            "bin_id",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
                / F.lit(context_tokens)
            ),
        )
        .drop("_ord")
    )
