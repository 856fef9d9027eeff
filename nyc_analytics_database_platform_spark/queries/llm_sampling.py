"""Driver-attested training-data sampling / splitting / packing queries.

The dataset-assembly half of an LLM pipeline (the curation half lives in
llm_dedup / llm_text / plans/curation): reproducible Bernoulli samples,
train/val/test splits, stratified rebalancing, deterministic epoch order,
context-window packing, and benchmark-contamination screening - all
hash-deterministic (operators/sampling.py) so each has an exact DuckDB
oracle, and all narrow per-row expressions except where a global order is
the declared semantic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.dedup import with_tokens
from nyc_analytics_database_platform_spark.operators.sampling import (
    deterministic_sample,
    hash_draw,
    hex_threshold,
    pack_sequences,
    pack_sequences_sharded,
    shuffle_order,
    split_column,
    stratified_sample,
)
from nyc_analytics_database_platform_spark.registry import register

# the one hash-draw expression, as DuckDB SQL (mirrors sampling.hash_draw)
_DRAW = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"

_SAMPLE_RATE = 0.25


@register(
    "sample_deterministic_by_source",
    oracle=f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
        FROM documents
        WHERE {_DRAW} < '{hex_threshold(_SAMPLE_RATE)}'
        GROUP BY source
        ORDER BY source
    """,
    tags=("llm", "sampling"),
)
def sample_deterministic_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 25% Bernoulli sample (hash-deterministic, no RNG/seed
    state), reported per source so the uniformity of the draw is observable.
    The membership filter is a narrow expression: it pushes past the scan
    and needs no shuffle at any scale."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    return (
        deterministic_sample(docs, _SAMPLE_RATE)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
        .orderBy("source")
    )


_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


@register(
    "train_val_test_split_report",
    oracle=f"""
        SELECT CASE
                 WHEN {_DRAW} < '{hex_threshold(0.8)}' THEN 'train'
                 WHEN {_DRAW} < '{hex_threshold(0.9)}' THEN 'val'
                 ELSE 'test'
               END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY split
        ORDER BY split
    """,
    tags=("llm", "sampling"),
)
def train_val_test_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by cumulative hash-threshold
    bands: a pure function of doc_id, so new data joins the same split
    lawfully and no holdout row ever migrates between splits across runs -
    the property RNG splits lose on re-execution."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    return (
        docs.withColumn("split", split_column(F.col("doc_id"), _SPLITS))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


_STRATA_RATES = {"en": 0.1}
_DEFAULT_RATE = 0.5


@register(
    "stratified_sample_by_lang",
    oracle=f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_sampled
        FROM documents
        WHERE {_DRAW} < CASE WHEN lang = 'en'
                             THEN '{hex_threshold(_STRATA_RATES["en"])}'
                             ELSE '{hex_threshold(_DEFAULT_RATE)}' END
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("llm", "sampling"),
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (the hash analogue of sampleBy):
    downsample the dominant language (en -> 10%) while keeping half of
    every other stratum - corpus rebalancing as one narrow filter, no
    shuffle, reproducible across runs and partitionings."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    return (
        stratified_sample(docs, "lang", _STRATA_RATES, _DEFAULT_RATE)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("lang")
    )


@register(
    "global_shuffle_head",
    oracle=f"""
        SELECT doc_id, {_DRAW} AS ord_key
        FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        LIMIT 10
    """,
    tags=("llm", "sampling"),
)
def global_shuffle_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: ordering by md5(doc_id) is a
    reproducible permutation of the corpus (epoch n prepends its tag to the
    key). Top-10 probe compiles to TakeOrderedAndProject - per-partition
    heaps, no global sort; a full epoch materialization would instead
    RANGE-partition on the same key."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    return (
        docs.select(
            "doc_id",
            F.substring(shuffle_order(F.col("doc_id")), 1, 8).alias("ord_key"),
            shuffle_order(F.col("doc_id")).alias("_full"),
        )
        .orderBy("_full", "doc_id")
        .limit(10)
        .drop("_full")
    )


_CONTEXT = 512


@register(
    "sequence_packing_bins",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS ord,
                   len({_TOKS}) AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT doc_id, n_tokens,
                   CAST(floor(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY ord
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {_CONTEXT}) AS BIGINT) AS bin_id
            FROM t
        )
        SELECT bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        FROM packed
        GROUP BY bin_id
        ORDER BY bin_id
    """,
    tags=("llm", "sampling", "packing"),
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing plan: documents in deterministic shuffle order
    assigned to consecutive 512-token windows by exclusive prefix
    sum (operators/sampling.pack_sequences). The global window is the
    exact-oracle formulation; the 100 TB variant partitions by shard id and
    packs within shards (one training file per shard), so no global prefix
    sum exists in production."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    packed = pack_sequences(docs, _CONTEXT, F.size("toks"))
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("bin_id")
    )


@register(
    "sequence_packing_bins_sharded",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS ord,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
                   len({_TOKS}) AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT shard, n_tokens,
                   CAST(floor(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard
                       ORDER BY ord
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {_CONTEXT}) AS BIGINT) AS bin_id
            FROM t
        )
        SELECT shard, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        FROM packed
        GROUP BY shard, bin_id
        ORDER BY shard, bin_id
    """,
    tags=("llm", "sampling", "packing", "scale"),
)
def sequence_packing_bins_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production packing path: documents hash-shard on the first hex
    digit of their order key and pack WITHIN each shard
    (operators/sampling.pack_sequences_sharded) - the window is PARTITION BY
    shard, so every partition packs independently and no single-partition
    window exists anywhere in the plan (each shard is one training file;
    the global-order twin sequence_packing_bins is the exact-oracle
    calibration formulation)."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    packed = pack_sequences_sharded(docs, _CONTEXT, F.size("toks"), n_shards=16)
    return (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("shard", "bin_id")
    )


_BENCH_MAX_ID = 20  # doc_id < 20 stands in for the benchmark/eval set
_NGRAM = 8


@register(
    "benchmark_contamination_report",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(t[i:i+{_NGRAM - 1}], ' ') AS s
            FROM toks,
                 unnest(generate_series(1, greatest(len(t) - {_NGRAM - 1}, 0))) AS g(i)
        ),
        bench AS (
            SELECT DISTINCT s FROM sh WHERE doc_id < {_BENCH_MAX_ID}
        ),
        corp AS (SELECT doc_id, s FROM sh WHERE doc_id >= {_BENCH_MAX_ID}),
        totals AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams
            FROM corp GROUP BY doc_id
        ),
        overlap AS (
            SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
            FROM corp c JOIN bench b ON c.s = b.s
            GROUP BY c.doc_id
        )
        SELECT o.doc_id, o.n_overlap, t.n_ngrams,
               round(o.n_overlap / CAST(t.n_ngrams AS DOUBLE), 6) AS contamination
        FROM overlap o JOIN totals t ON o.doc_id = t.doc_id
        ORDER BY o.doc_id
    """,
    tags=("llm", "sampling", "contamination"),
)
def benchmark_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: corpus documents sharing any 8-gram
    with the benchmark/eval set (here: doc_id < 20), with the
    per-document overlap ratio. The benchmark n-gram set is tiny by
    construction, so the probe is a BROADCAST semi-structure - the corpus
    side streams through it with no shuffle of the corpus at any scale;
    join keys are md5 digests (fixed-width) rather than raw n-gram
    strings."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    sh = (
        docs.select("doc_id", F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {_NGRAM} "
                f"THEN transform(sequence(1, size(toks) - {_NGRAM} + 1), "
                f"i -> array_join(slice(toks, i, {_NGRAM}), ' ')) "
                f"ELSE array() END"
            )
        ).alias("s"))
        .select("doc_id", F.md5("s").alias("hs"))
        .distinct()
    )
    bench = sh.filter(F.col("doc_id") < _BENCH_MAX_ID).select("hs").distinct()
    corp = sh.filter(F.col("doc_id") >= _BENCH_MAX_ID)
    totals = corp.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    overlap = (
        corp.join(F.broadcast(bench), "hs")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        overlap.join(totals, "doc_id")
        .select(
            "doc_id",
            "n_overlap",
            "n_ngrams",
            F.round(
                F.col("n_overlap") / F.col("n_ngrams").cast("double"), 6
            ).alias("contamination"),
        )
        .orderBy("doc_id")
    )


@register(
    "quantile_token_filter",
    oracle=f"""
        WITH t AS (SELECT len({_TOKS}) AS tc, n_chars FROM documents),
        b AS (
            SELECT PERCENTILE_CONT(0.1) WITHIN GROUP (ORDER BY tc) AS lo,
                   PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY tc) AS hi
            FROM t
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(tc) AS BIGINT) AS kept_tokens,
               round(ANY_VALUE(b.lo), 6) AS lo,
               round(ANY_VALUE(b.hi), 6) AS hi
        FROM t, b
        WHERE t.tc >= b.lo AND t.tc <= b.hi
    """,
    tags=("llm", "sampling", "quality"),
)
def quantile_token_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-outlier trimming by corpus quantiles: keep documents inside
    the [p10, p90] token-count band. The two thresholds are a one-row
    aggregate broadcast-crossJoined back to the corpus (the same pattern as
    TF-IDF's idf row) - a 100 TB corpus computes them via approx
    percentile_approx instead; the exact percentile here keeps the oracle
    bit-exact."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    t = docs.select(F.size("toks").alias("tc"))
    bounds = t.agg(
        F.percentile("tc", 0.1).alias("lo"),
        F.percentile("tc", 0.9).alias("hi"),
    )
    return (
        t.crossJoin(F.broadcast(bounds))
        .filter((F.col("tc") >= F.col("lo")) & (F.col("tc") <= F.col("hi")))
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("tc").alias("kept_tokens"),
            F.round(F.first("lo"), 6).alias("lo"),
            F.round(F.first("hi"), 6).alias("hi"),
        )
    )


@register(
    "exact_quota_sample_by_lang",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        )
        SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 10
        ORDER BY lang, rk
    """,
    tags=("llm", "sampling"),
)
def exact_quota_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sampling: EXACTLY min(10, |stratum|) documents
    per language, chosen by ranking on a content-independent deterministic
    key (md5 of the id) - reproducible across runs, partitionings, and
    engines, unlike rate-based Bernoulli sampling
    (stratified_sample_by_lang), which only hits quotas in expectation.
    The md5 ordering IS the uniformity argument: it is a fixed pseudorandom
    permutation of ids, so every stratum member is equally likely under id
    assignment.

    Scale shape: one shuffle on the stratum key; the rank<=k predicate
    compiles to WindowGroupLimit, so each partition keeps only its running
    top-k by hash order - state is O(k) per stratum, never the stratum
    itself."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "rk")
    )


# numeric hash draw in [0,1): first 8 md5 hex chars as integer / 2^32
# (integer parse, so the double is identical cross-engine)
_FRAC = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)"
    " / 4294967296.0"
)


@register(
    "weighted_sample_top10",
    oracle=f"""
        SELECT doc_id, n_chars,
               round(pow({_FRAC}, 1.0 / n_chars), 9) AS es_key
        FROM documents
        ORDER BY pow({_FRAC}, 1.0 / n_chars) DESC, doc_id
        LIMIT 10
    """,
    tags=("llm", "sampling", "weighted"),
)
def weighted_sample_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each document draws key = u^(1/w) with u the deterministic hash-uniform
    and w = n_chars; the top-k keys ARE a weighted sample without
    replacement - a single narrow expression + TakeOrderedAndProject, no
    shuffle, reproducible across engines and runs. This is how a 100 TB
    corpus takes a size-weighted subsample in one pass (the per-partition
    heap keeps k rows; the driver merges P heaps). The ES key is exact
    cross-engine because u is an integer-parsed double and pow/division
    follow IEEE semantics on identical operands."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    key = F.pow(u, F.lit(1.0) / F.col("n_chars"))
    return (
        docs.select("doc_id", "n_chars", key.alias("_k"))
        .orderBy(F.desc("_k"), "doc_id")
        .limit(10)
        .select("doc_id", "n_chars", F.round("_k", 9).alias("es_key"))
    )


@register(
    "token_budget_sample",
    oracle=r"""
        WITH t AS (
            SELECT doc_id, lang,
                   len(string_split_regex(lower(trim(text)), '\s+')) AS toks,
                   md5(CAST(doc_id AS VARCHAR)) AS k
            FROM documents
        ),
        tot AS (SELECT SUM(toks) // 2 AS budget FROM t),
        r AS (
            SELECT lang, toks,
                   SUM(toks) OVER (ORDER BY k
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS running_total
            FROM t
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS tok_sum
        FROM r, tot
        WHERE running_total <= budget
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("llm", "sampling", "prefix-sum"),
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample documents up to an exact global token budget (half the corpus)
    in deterministic md5-of-key order - the reproducible way to cut a
    fixed-size training slice. The running total comes from
    operators/prefixsum.bucketed_running_sum: per-bucket totals + broadcast
    offsets + WITHIN-BUCKET windows, so no single-partition global window
    anywhere (the oracle's OVER (ORDER BY k) is exactly the shape this
    replaces at 100 TB). Budget is an exact integer (total // 2), so the
    cut point is engine-independent."""
    from nyc_analytics_database_platform_spark.functions.text import ws_tokens
    from nyc_analytics_database_platform_spark.operators.prefixsum import (
        bucketed_running_sum,
    )

    docs = load(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        "lang",
        F.size(ws_tokens("text")).alias("toks"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    with_rt = bucketed_running_sum(docs, "k", "toks")
    budget = docs.agg(
        F.expr("sum(toks) div 2").cast("long").alias("_budget")
    )
    return (
        with_rt.crossJoin(F.broadcast(budget))
        .filter(F.col("running_total") <= F.col("_budget"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("tok_sum"),
        )
        .orderBy("lang")
    )


_PAD_BANDS = 32  # tokens per length band for bucketed batching


@register(
    "padding_efficiency_report",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
            FROM documents WHERE text IS NOT NULL
        ),
        g AS (
            SELECT CAST(n_tok // {_PAD_BANDS} AS INT) AS band,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
                   MAX(n_tok) AS max_tok
            FROM toks GROUP BY 1
        ),
        gstats AS (
            SELECT CAST(SUM(n_tok) AS BIGINT) AS total_tok,
                   MAX(n_tok) AS gmax, COUNT(*) AS n
            FROM toks
        )
        SELECT band,
               CAST(n_docs AS BIGINT) AS n_docs,
               sum_tok,
               CAST(max_tok AS BIGINT) AS band_max,
               CAST(n_docs * max_tok - sum_tok AS BIGINT) AS band_padding,
               CAST((SELECT n * gmax - total_tok FROM gstats) AS BIGINT)
                   AS unbucketed_padding
        FROM g
        ORDER BY band
    """,
    tags=("llm", "sampling", "batching"),
)
def padding_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: documents grouped into 32-token
    length bands, reporting the padding each band would waste if its
    batch were padded to the band max, against the corpus-wide padding of
    unbucketed batching (pad-to-global-max). The standard serving /
    training-throughput justification for length bucketing, as two
    map-side-combinable aggregates; the integer band id doubles as the
    partition key a bucketed batch writer would use."""
    toks = (
        load(spark, sf_dir, "documents", parallel=True)
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "n_tok"
            ),
        )
    )
    g = toks.groupBy(
        (F.col("n_tok") / _PAD_BANDS).cast("int").alias("band")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
        F.max("n_tok").alias("max_tok"),
    )
    glob = toks.agg(
        (F.count("*") * F.max("n_tok") - F.sum("n_tok"))
        .cast("long")
        .alias("unbucketed_padding")
    )
    return (
        g.crossJoin(F.broadcast(glob))
        .select(
            "band",
            F.col("n_docs").cast("long").alias("n_docs"),
            "sum_tok",
            F.col("max_tok").cast("long").alias("band_max"),
            (F.col("n_docs") * F.col("max_tok") - F.col("sum_tok"))
            .cast("long")
            .alias("band_padding"),
            "unbucketed_padding",
        )
        .orderBy("band")
    )


@register(
    "contamination_rate_by_source",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, {_TOKS} AS t FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, source,
                   array_to_string(t[i:i+{_NGRAM - 1}], ' ') AS s
            FROM toks,
                 unnest(generate_series(1, greatest(len(t) - {_NGRAM - 1}, 0))) AS g(i)
        ),
        bench AS (
            SELECT DISTINCT s FROM sh WHERE doc_id < {_BENCH_MAX_ID}
        ),
        corp_docs AS (
            SELECT DISTINCT doc_id, source FROM sh
            WHERE doc_id >= {_BENCH_MAX_ID}
        ),
        hit_docs AS (
            SELECT DISTINCT c.doc_id
            FROM sh c JOIN bench b ON c.s = b.s
            WHERE c.doc_id >= {_BENCH_MAX_ID}
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contaminated,
               round(CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS contamination_rate
        FROM corp_docs d LEFT JOIN hit_docs h ON d.doc_id = h.doc_id
        GROUP BY d.source
        ORDER BY d.source
    """,
    tags=("llm", "sampling", "contamination", "reporting"),
)
def contamination_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH SOURCES leak eval content: the exact 8-gram contamination
    screen rolled up per source - the crawl-operator view that decides
    whether a feed gets quarantined rather than per-doc scrubbed (pairs
    with dedup_rate_by_source and hapax_rate_by_source in the per-source
    triage panel). Counts only docs with at least one n-gram (the same
    denominator discipline as the per-doc report).

    Scale: identical shape to benchmark_contamination_report - the bench
    n-gram digest set broadcasts, the corpus streams through without
    shuffling; the only additions are a distinct doc set and a
    per-source 4-column rollup."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    sh = (
        docs.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"CASE WHEN size(toks) >= {_NGRAM} "
                    f"THEN transform(sequence(1, size(toks) - {_NGRAM} + 1), "
                    f"i -> array_join(slice(toks, i, {_NGRAM}), ' ')) "
                    f"ELSE array() END"
                )
            ).alias("s"),
        )
        .select("doc_id", "source", F.md5("s").alias("hs"))
        .distinct()
    )
    bench = sh.filter(F.col("doc_id") < _BENCH_MAX_ID).select("hs").distinct()
    corp = sh.filter(F.col("doc_id") >= _BENCH_MAX_ID)
    corp_docs = corp.select("doc_id", "source").distinct()
    hit_docs = (
        corp.join(F.broadcast(bench), "hs").select("doc_id").distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        corp_docs.join(hit_docs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("hit").alias("n_contaminated"),
            F.round(F.count("hit").cast("double") / F.count("*"), 6).alias(
                "contamination_rate"
            ),
        )
        .orderBy("source")
    )


@register(
    "epoch_shuffle_plan",
    oracle="""
        WITH epochs AS (SELECT * FROM (VALUES (0), (1), (2)) AS e(epoch)),
        placed AS (
            SELECT e.epoch, d.doc_id,
                   CAST(('0x' || substr(md5(CAST(e.epoch AS VARCHAR) || ':' ||
                                        CAST(d.doc_id AS VARCHAR)), 1, 12))
                        AS BIGINT) AS h
            FROM documents d CROSS JOIN epochs e
        ),
        positioned AS (
            SELECT epoch, doc_id, h, h % 8 AS shard,
                   ROW_NUMBER() OVER (PARTITION BY epoch, h % 8
                                      ORDER BY h, doc_id) AS pos
            FROM placed
        )
        SELECT epoch, shard,
               COUNT(*) AS n_docs,
               SUM(pos * doc_id) AS placement_checksum,
               MIN(h) AS min_h, MAX(h) AS max_h
        FROM positioned
        GROUP BY epoch, shard
        ORDER BY epoch, shard
    """,
    tags=("LLM", "sampling"),
)
def epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch shuffle plan: for each training epoch the
    corpus is re-ordered by a salted hash and split into 8 shards, and each
    doc gets its within-shard position - the reproducible 'global shuffle
    per epoch' a trainer's data loader needs, verified here via per-shard
    counts and an order-sensitive placement checksum (sum of pos * doc_id)
    rather than by materializing the full permutation.

    Every epoch is a pure function of (epoch, doc_id): re-running, adding
    executors, or recovering a failed shard reproduces the same order with
    zero coordination - no RNG state, no driver-side permutation array.

    Scale shape: hash + shard are narrow per-row expressions; the only
    shuffle is the per-(epoch, shard) window whose partitions are
    corpus/8-sized by construction (the hash balances shards), and the
    report aggregate is map-side combinable. At 100 TB positions within a
    shard would come from the same sharded prefix-sum used by
    sequence_packing_bins_sharded instead of one window sort per shard."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    placed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("", F.col("epoch").cast("string"),
                                  F.lit(":"), F.col("doc_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    positioned = placed.select(
        "epoch",
        "doc_id",
        "h",
        (F.col("h") % 8).alias("shard"),
        F.row_number()
        .over(
            Window.partitionBy("epoch", F.col("h") % 8).orderBy("h", "doc_id")
        )
        .alias("pos"),
    )
    return (
        positioned.groupBy("epoch", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("placement_checksum"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
        .orderBy("epoch", "shard")
    )


_ES_K = 20  # weighted-sample size


@register(
    "weighted_sample_es_topk",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, source, n_chars,
                   ROUND(-ln((('0x' || {_DRAW})::BIGINT + 1) / 4294967296.0)
                         / n_chars * 1e9) AS k
            FROM documents
            WHERE n_chars > 0
        )
        SELECT ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rk,
               doc_id, source, n_chars,
               CAST(k AS BIGINT) AS es_key
        FROM keyed
        ORDER BY k, doc_id
        LIMIT {_ES_K}
    """,
    tags=("llm", "sampling"),
)
def weighted_sample_es_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spiridakis
    A-ES: each doc draws u from its deterministic hash and competes with
    key -ln(u)/w (w = n_chars, so longer documents are proportionally more
    likely); the k smallest keys ARE a weighted sample without
    replacement - the distributed-sampling primitive behind
    length-weighted corpus subsets (one-pass, mergeable: the union of
    per-partition top-k candidates contains the global top-k).

    Determinism: u is the md5 hash draw (+1 over 2^32 - never 0); the
    transcendental ln() is PINNED to an integer-valued double
    (ROUND(x * 1e9), the zipf convention: a last-ulp libm difference
    cannot move a 1e-9 rounding except on a knife-edge) and ties break on
    doc_id.

    Scale shape: a narrow per-row key expression straight off the scan,
    then TakeOrderedAndProject(k) - no shuffle wider than k rows per
    partition; the rank window runs over the k survivors only."""
    keyed = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(
                -F.log(
                    (
                        F.conv(hash_draw(F.col("doc_id")), 16, 10).cast(
                            "long"
                        )
                        + 1
                    )
                    / 4294967296.0
                )
                / F.col("n_chars")
                * 1e9
            ).alias("k"),
        )
    )
    top = keyed.orderBy("k", "doc_id").limit(_ES_K)
    return top.select(
        F.row_number()
        .over(Window.orderBy("k", "doc_id"))
        .alias("rk"),
        "doc_id",
        "source",
        "n_chars",
        F.col("k").cast("long").alias("es_key"),
    ).orderBy("rk")
