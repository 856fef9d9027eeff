"""Model-based corpus filters: a linear quality classifier (the
fasttext-style scoring pass behind FineWeb-Edu / DCLM-style "model-based
quality filtering") and MinHash-fuzzy benchmark decontamination (the
near-duplicate twin of the exact 8-gram probe in
llm_sampling.benchmark_contamination_report).

Both are single-scan passes at 100 TB: the classifier is a narrow
expression panel (no shuffle at all beyond the scan), and the fuzzy
decontamination probe re-uses the banded MinHash index - the eval set's
bands are tiny and broadcast into the corpus band stream, so the corpus
never shuffles on raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.functions.text import count_in, ws_tokens
from nyc_analytics_database_platform_spark.operators.dedup import (
    banded_buckets,
    minhash_signatures,
)
from nyc_analytics_database_platform_spark.queries.llm_dedup import _shingle_cte
from nyc_analytics_database_platform_spark.registry import register

# Fixed stand-in for a pretrained linear quality model: intercept + weights
# over (log tokens, mean word length, stopword ratio, type-token ratio).
# Real pipelines load these from a model artifact; the *plan* is identical.
_W0, _W_LOGTOK, _W_WLEN, _W_STOP, _W_TTR = -2.0, 0.6, -0.3, 2.5, 1.5
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


@register(
    "quality_model_scores",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS t,
                   CAST(length(regexp_replace(trim(text), '\\s', '', 'g'))
                        AS DOUBLE) AS n_chars_ns
            FROM documents WHERE text IS NOT NULL
        ),
        feats AS (
            SELECT doc_id,
                   ln(1.0 + len(t)) AS log_tokens,
                   n_chars_ns / len(t) AS mean_wlen,
                   CAST(len(list_filter(t, x -> x IN
                        ({", ".join("'" + w + "'" for w in _STOPWORDS)})))
                        AS DOUBLE) / len(t) AS stop_ratio,
                   CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
            FROM toks
        )
        SELECT doc_id,
               round(log_tokens, 6) AS log_tokens,
               round(mean_wlen, 6) AS mean_wlen,
               round(stop_ratio, 6) AS stop_ratio,
               round(ttr, 6) AS ttr,
               round(1.0 / (1.0 + exp(-({_W0} + {_W_LOGTOK} * log_tokens
                     + {_W_WLEN} * mean_wlen + {_W_STOP} * stop_ratio
                     + {_W_TTR} * ttr))), 6) AS score,
               round(1.0 / (1.0 + exp(-({_W0} + {_W_LOGTOK} * log_tokens
                     + {_W_WLEN} * mean_wlen + {_W_STOP} * stop_ratio
                     + {_W_TTR} * ttr))), 6) >= 0.5 AS keep
        FROM feats
        ORDER BY doc_id
    """,
    tags=("llm", "text", "quality", "model"),
)
def quality_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over engineered document features: sigmoid
    of a fixed weight vector on (log token count, mean word length,
    stopword ratio, type-token ratio) - the scoring half of model-based
    quality filtering; the keep flag thresholds the ROUNDED score on both
    engines so the cut is cross-engine stable. One narrow scan: every
    feature is an in-place array expression, the weights are literals (at
    scale, a broadcast model row), and no shuffle exists anywhere in the
    plan. round(6) absorbs libm exp/ln ulp differences."""
    docs = load(spark, sf_dir, "documents", parallel=True).filter(
        F.col("text").isNotNull()
    )
    base = docs.select(
        "doc_id",
        ws_tokens().alias("t"),
        F.length(F.regexp_replace(F.trim(F.col("text")), r"\s", ""))
        .cast("double")
        .alias("n_chars_ns"),
    )
    n = F.size("t").cast("double")
    feats = base.select(
        "doc_id",
        F.log(F.lit(1.0) + F.size("t")).alias("log_tokens"),
        (F.col("n_chars_ns") / n).alias("mean_wlen"),
        (count_in("t", list(_STOPWORDS)).cast("double") / n).alias("stop_ratio"),
        (F.size(F.array_distinct("t")).cast("double") / n).alias("ttr"),
    )
    z = (
        F.lit(_W0)
        + F.lit(_W_LOGTOK) * F.col("log_tokens")
        + F.lit(_W_WLEN) * F.col("mean_wlen")
        + F.lit(_W_STOP) * F.col("stop_ratio")
        + F.lit(_W_TTR) * F.col("ttr")
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select(
        "doc_id",
        F.round("log_tokens", 6).alias("log_tokens"),
        F.round("mean_wlen", 6).alias("mean_wlen"),
        F.round("stop_ratio", 6).alias("stop_ratio"),
        F.round("ttr", 6).alias("ttr"),
        score.alias("score"),
        (score >= 0.5).alias("keep"),
    ).orderBy("doc_id")


_EVAL_MOD = 10  # doc_id % 10 == 0 marks the stand-in benchmark/eval split


def _fuzzy_oracle(num_perm: int = 12, rows_per_band: int = 2) -> str:
    sig_cols = ", ".join(f"MIN(md5('{p}:' || s)) AS m{p}" for p in range(num_perm))
    num_bands = num_perm // rows_per_band
    cases = " ".join(
        "WHEN {b} THEN md5({cat})".format(
            b=b,
            cat=" || ".join(
                f"m{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(num_bands)
    )
    return f"""
        WITH {_shingle_cte(5)},
        sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
        bands AS (
            SELECT doc_id, bnd, CASE bnd {cases} END AS bucket
            FROM sig, (SELECT unnest(generate_series(0, {num_bands - 1})) AS bnd) g
        )
        SELECT c.doc_id,
               CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_matches
        FROM bands c
        JOIN bands e ON c.bnd = e.bnd AND c.bucket = e.bucket
        WHERE c.doc_id % {_EVAL_MOD} <> 0 AND e.doc_id % {_EVAL_MOD} = 0
        GROUP BY c.doc_id
        ORDER BY c.doc_id
    """


@register(
    "benchmark_contamination_fuzzy",
    oracle=_fuzzy_oracle(),
    tags=("llm", "dedup", "contamination"),
)
def benchmark_contamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination: corpus documents whose MinHash/LSH
    bands collide with any eval-set document (doc_id % 10 == 0 is the
    stand-in eval split), with the count of distinct eval docs each one
    hits - the near-duplicate complement of the exact 8-gram contamination
    probe (a paraphrased eval answer that shares no verbatim 8-gram still
    lands in the same MinHash bucket). Reuses the SAME banded signature
    index as the dedup family (12 perms, 6 bands x 2 rows): at 100 TB the
    eval set's band rows are tiny and broadcast into the corpus band
    stream - the corpus shuffles only its (band, bucket) keys, never
    text."""
    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_perm=12, k=5)
    bands = banded_buckets(sigs, num_perm=12, rows_per_band=2)
    corpus = bands.filter(F.col("doc_id") % _EVAL_MOD != 0)
    eval_b = bands.filter(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "band", "bucket"
    )
    return (
        corpus.join(F.broadcast(eval_b), ["band", "bucket"])
        .groupBy("doc_id")
        .agg(F.countDistinct("eval_id").alias("n_eval_matches"))
        .orderBy("doc_id")
    )
