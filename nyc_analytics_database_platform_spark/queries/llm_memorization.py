"""Memorization-risk / cross-source duplication audits over the documents
table: per-source boilerplate n-gram detection (the RefinedWeb/C4
"frequent line" filter with fixed token windows standing in for lines —
this corpus has no newlines), a duplicated-n-gram profile across window
sizes (the memorization-risk curve from the deduplication literature),
and a cross-source duplicate-overlap matrix (which sources copy which).

Shuffle discipline (same as llm_corpus.first_span_occurrences): candidate
keys are always ``xxhash64`` longs — the n-gram STRING never enters a wide
exchange; representative text is reattached afterwards by position
arithmetic on the surviving (doc_id, pos) rows. The DuckDB oracles group on
the raw strings instead, which doubles as the hash-collision check (a
collision would make the counts diverge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.dedup import with_tokens
from nyc_analytics_database_platform_spark.registry import register

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"

_BP_N = 3  # boilerplate n-gram width (pseudo-phrase; the synthetic
#   corpus draws from a ~30-word vocab, so wider windows never repeat
#   across 30% of a source)
_BP_RATIO = 0.1  # doc-frequency ratio within a source to call it boilerplate
_BP_MIN_DF = 2

_PROFILE_NS = (8, 16, 32)  # duplicated-n-gram profile window sizes

_SPAN_N = 8  # cross-source matrix span width (matches corpus_span_dedup)


def _ngram_expr(n: int) -> F.Column:
    """(pos, hash) pairs for every n-token window of `toks` (1-based pos).
    Guarded: Spark's sequence(1, k) DESCENDS for k < 1, so short documents
    take the typed-empty-array branch instead."""
    return F.expr(
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n} + 1), "
        f"i -> struct(i AS pos, xxhash64(array_join(slice(toks, i, {n}), ' ')) AS h)) "
        f"ELSE CAST(array() AS array<struct<pos:int,h:bigint>>) END"
    )


@register(
    "boilerplate_ngrams_by_source",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, {_TOKS} AS t FROM documents
            WHERE text IS NOT NULL AND trim(text) <> ''
        ),
        grams AS (
            SELECT DISTINCT source, doc_id,
                   array_to_string(t[j : j + {_BP_N} - 1], ' ') AS ngram
            FROM toks, unnest(generate_series(1, len(t) - {_BP_N} + 1)) AS g(j)
        ),
        src_docs AS (
            SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM toks
            GROUP BY source
        ),
        df AS (
            SELECT source, ngram, COUNT(*) AS doc_freq
            FROM grams GROUP BY source, ngram
        )
        SELECT d.source, d.ngram, d.doc_freq, s.n_docs,
               CAST(d.doc_freq AS DOUBLE) / s.n_docs AS df_ratio
        FROM df d JOIN src_docs s ON d.source = s.source
        WHERE d.doc_freq >= {_BP_MIN_DF}
          AND d.doc_freq * 10 >= {int(_BP_RATIO * 10)} * s.n_docs -- exact integer cut
        ORDER BY d.source, d.ngram
    """,
    tags=("llm", "dedup", "memorization"),
)
def boilerplate_ngrams_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detection: 3-token windows present in >=10%
    of a source's documents (and at least 2) — the 'frequent line' filter
    C4/RefinedWeb apply before span dedup, with token windows standing in
    for lines. Returns (source, ngram, doc_freq, n_docs, df_ratio).

    Threshold arithmetic stays integer (doc_freq * 10 >= 1 * n_docs), so
    the cut is exact in both engines; the reported ratio divides two exact
    integers.

    Scale shape: the wide path is DISTINCT (source, doc_id, hash) then a
    count per (source, hash) — 8-byte keys, map-side combinable, never the
    n-gram text. Only the boilerplate SURVIVORS (a tiny set by
    construction) reattach their text, by re-slicing the representative
    document at the recorded position — a broadcast join against the doc
    scan, not a second corpus shuffle."""
    docs = with_tokens(
        load(spark, sf_dir, "documents", parallel=True).filter(
            F.col("text").isNotNull() & (F.trim("text") != "")
        )
    ).select("doc_id", "source", "toks")
    grams = docs.select(
        "source",
        "doc_id",
        F.explode(_ngram_expr(_BP_N)).alias("g"),
    ).select("source", "doc_id", "g.pos", "g.h")
    # distinct (source, doc, h) keeps one row per document containing the
    # gram; min(pos) + min(doc_id) give a deterministic representative to
    # reattach text from.
    per_doc = grams.groupBy("source", "h", "doc_id").agg(
        F.min("pos").alias("pos")
    )
    src_docs = docs.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    df = per_doc.groupBy("source", "h").agg(
        F.count("*").alias("doc_freq"),
        F.min(F.struct("doc_id", "pos")).alias("rep"),
    )
    flagged = (
        df.join(F.broadcast(src_docs), "source")
        .filter(
            (F.col("doc_freq") >= _BP_MIN_DF)
            & (F.col("doc_freq") * 10 >= int(_BP_RATIO * 10) * F.col("n_docs"))
        )
        .select(
            "source",
            F.col("rep.doc_id").alias("rep_doc"),
            F.col("rep.pos").alias("rep_pos"),
            "doc_freq",
            "n_docs",
        )
    )
    # reattach the n-gram text from the representative document
    rep_docs = docs.select(F.col("doc_id").alias("rep_doc"), "toks")
    return (
        flagged.join(F.broadcast(rep_docs.join(
            flagged.select("rep_doc").distinct(), "rep_doc"
        )), "rep_doc")
        .select(
            "source",
            F.array_join(
                F.slice(F.col("toks"), F.col("rep_pos"), _BP_N), " "
            ).alias("ngram"),
            "doc_freq",
            "n_docs",
            (F.col("doc_freq").cast("double") / F.col("n_docs")).alias(
                "df_ratio"
            ),
        )
        .orderBy("source", "ngram")
    )


def _profile_branch_sql(n: int) -> str:
    return f"""
        SELECT {n} AS n,
               CAST(SUM(cnt) AS BIGINT) AS total_ngrams,
               COUNT(*) AS distinct_ngrams,
               CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
                   AS dup_occurrences,
               COUNT(CASE WHEN cnt > 1 THEN 1 END) AS dup_distinct,
               CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
                   / SUM(cnt) AS dup_fraction
        FROM (
            SELECT array_to_string(t[j : j + {n} - 1], ' ') AS g,
                   COUNT(*) AS cnt
            FROM toks, unnest(generate_series(1, len(t) - {n} + 1)) AS s(j)
            GROUP BY 1
        )
    """


@register(
    "corpus_dup_ngram_profile",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
            WHERE text IS NOT NULL AND trim(text) <> ''
        )
        {" UNION ALL ".join(_profile_branch_sql(n) for n in _PROFILE_NS)}
        ORDER BY n
    """,
    tags=("llm", "dedup", "memorization"),
)
def corpus_dup_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk profile: for window sizes n in {8, 16, 32}, how
    much of the corpus is duplicated text — total/distinct n-grams,
    occurrences belonging to a repeated n-gram, and the duplicated
    fraction. The curve (dup_fraction falling as n grows) is the standard
    evidence for choosing a span-dedup granularity (cf. corpus_span_dedup's
    fixed n=8).

    Scale shape: per n, one explode to xxhash64 longs + one count — the
    corpus text never shuffles, and the three branches share the cached
    token table. dup_fraction divides two exact integer sums. At 100 TB
    the explode output is ~|tokens| rows of 8-byte keys per branch, the
    same budget as corpus_span_dedup."""
    docs = with_tokens(
        load(spark, sf_dir, "documents", parallel=True).filter(
            F.col("text").isNotNull() & (F.trim("text") != "")
        )
    ).select("toks")
    branches = []
    for n in _PROFILE_NS:
        counts = (
            docs.select(F.explode(_ngram_expr(n)).alias("g"))
            .groupBy(F.col("g.h"))
            .agg(F.count("*").alias("cnt"))
        )
        branches.append(
            counts.agg(
                F.lit(n).cast("int").alias("n"),
                F.sum("cnt").alias("total_ngrams"),
                F.count("*").alias("distinct_ngrams"),
                F.coalesce(
                    F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0)
                ).alias("dup_occurrences"),
                F.count(F.when(F.col("cnt") > 1, 1)).alias("dup_distinct"),
                (
                    F.coalesce(
                        F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))),
                        F.lit(0),
                    ).cast("double")
                    / F.sum("cnt")
                ).alias("dup_fraction"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.orderBy("n")


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, {_TOKS} AS t FROM documents
            WHERE text IS NOT NULL AND trim(text) <> ''
        ),
        spans AS (
            SELECT source,
                   array_to_string(t[j : j + {_SPAN_N} - 1], ' ') AS g,
                   COUNT(DISTINCT doc_id) AS nd
            FROM toks, unnest(generate_series(1, len(t) - {_SPAN_N} + 1)) AS s(j)
            GROUP BY source, g
        )
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS shared_spans,
               CAST(SUM(a.nd * b.nd) AS BIGINT) AS doc_pairs
        FROM spans a JOIN spans b
          ON a.g = b.g AND a.source < b.source
        GROUP BY a.source, b.source
        ORDER BY source_a, source_b
    """,
    tags=("llm", "dedup", "memorization"),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix at span granularity: for every source
    pair, the number of distinct 8-token spans both contain and the number
    of document pairs sharing them — 'which sources copy which', the
    provenance flow that per-source dup rates (dedup_rate_by_source) and
    global span dedup (corpus_span_dedup) can't show. (Exact full-document
    digests never cross sources in this corpus, so the matrix is defined on
    the same 8-token spans corpus_span_dedup deduplicates.)

    Scale shape: the corpus collapses to (source, span-hash, n_docs) — one
    map-side-combinable aggregate over 8-byte xxhash64 keys, the span text
    never shuffles — and the pair join runs on that collapsed frame with
    per-key fan-out bounded by |sources| (20). Never a doc-level self-join."""
    spans = (
        with_tokens(
            load(spark, sf_dir, "documents", parallel=True).filter(
                F.col("text").isNotNull() & (F.trim("text") != "")
            )
        )
        .select("source", "doc_id", F.explode(_ngram_expr(_SPAN_N)).alias("g"))
        .groupBy("source", F.col("g.h").alias("h"))
        .agg(F.countDistinct("doc_id").alias("nd"))
    )
    a = spans.select(
        "h", F.col("source").alias("source_a"), F.col("nd").alias("nd_a")
    )
    b = spans.select(
        "h", F.col("source").alias("source_b"), F.col("nd").alias("nd_b")
    )
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("shared_spans"),
            F.sum(F.col("nd_a") * F.col("nd_b")).alias("doc_pairs"),
        )
        .orderBy("source_a", "source_b")
    )
