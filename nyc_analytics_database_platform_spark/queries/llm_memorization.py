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


def _ngram_expr(n: int, arr: str = "toks") -> F.Column:
    """(pos, hash) pairs for every n-token window of `arr` (1-based pos).
    Guarded: Spark's sequence(1, k) DESCENDS for k < 1, so short documents
    take the typed-empty-array branch instead. When `arr` is a
    pre-hashed array<bigint> (``_TH``), the window hash is xxhash64 over
    the LONG slice — no per-position string join/allocation; hashing
    8-byte tokens instead of rebuilding n-token strings measured ~15-20%
    off the whole-query time at sf0.5."""
    key = f"slice({arr}, i, {n})" if arr != "toks" else (
        f"array_join(slice({arr}, i, {n}), ' ')"
    )
    return F.expr(
        f"CASE WHEN size({arr}) >= {n} THEN "
        f"transform(sequence(1, size({arr}) - {n} + 1), "
        f"i -> struct(i AS pos, xxhash64({key}) AS h)) "
        f"ELSE CAST(array() AS array<struct<pos:int,h:bigint>>) END"
    )


# per-token xxhash64 longs: every window key downstream hashes slices of
# this array (8 bytes/token) instead of re-joined strings; a window
# collision needs a token-hash collision first, and the string-grouped
# DuckDB oracles remain the collision check either way.
_TH = "transform(toks, t -> xxhash64(t))"


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
    count per (source, hash) — 8-byte token-hash-slice keys, map-side
    combinable, never the n-gram text. The survivor set (tiny by
    construction) localCheckpoints so its two downstream uses never
    recompute the corpus pipeline, the per-source doc counts come from a
    token-free scan of the raw table, and only the representative
    documents re-tokenize for text reattachment (a broadcast-semi-joined
    scan) — one full tokenize+explode pass total, vs three in the round-6
    shape (2.68x DuckDB then; 1.64x at sf1.0 now, see SCALE.md)."""
    base = load(spark, sf_dir, "documents", parallel=True).filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    grams = (
        with_tokens(base)
        .selectExpr("source", "doc_id", f"{_TH} as th")
        .select("source", "doc_id", F.explode(_ngram_expr(_BP_N, "th")).alias("g"))
        .select("source", "doc_id", "g.pos", "g.h")
    )
    # distinct (source, doc, h) keeps one row per document containing the
    # gram; min(pos) + min(doc_id) give a deterministic representative to
    # reattach text from.
    per_doc = grams.groupBy("source", "h", "doc_id").agg(
        F.min("pos").alias("pos")
    )
    # n_docs needs no tokens - count the same non-empty filter on the raw scan
    src_docs = base.groupBy("source").agg(
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
        # bounded by construction (>=10% doc-frequency grams per source);
        # checkpointing stops the corpus pipeline running once per use below
        .localCheckpoint(eager=False)
    )
    # reattach the n-gram text by re-slicing ONLY the representative docs
    rep_toks = with_tokens(
        base.join(
            F.broadcast(flagged.select("rep_doc").distinct()),
            base["doc_id"] == F.col("rep_doc"),
        )
    ).select(F.col("doc_id").alias("rep_doc"), "toks")
    return (
        flagged.join(F.broadcast(rep_toks), "rep_doc")
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

    Scale shape: ONE tokenize+explode pass for all three window sizes
    (round 6 ran the corpus scan per n), with hierarchical window hashes:
    h8 hashes the 8-long token-hash slice, then h16[i] = xxhash64(h8[i],
    h8[i+8]) and h32[i] = xxhash64(h16[i], h16[i+16]) — 2 longs hashed
    per wider window instead of 16/32 tokens. The explode emits (n, h)
    8-byte pairs, one map-side-combinable groupBy(n, h), one 3-row
    rollup; the corpus text never shuffles. A wider-window collision
    requires an 8-window collision first, and the string-grouped oracle
    stays the collision check. dup_fraction divides two exact integer
    sums. 1.32s vs round 6's 1.86s at sf0.5; 1.5x DuckDB at sf1.0."""
    n8, n16, n32 = _PROFILE_NS
    # the hierarchical construction requires the doubling ladder
    assert n16 == 2 * n8 and n32 == 2 * n16, _PROFILE_NS
    gr = (
        with_tokens(
            load(spark, sf_dir, "documents", parallel=True).filter(
                F.col("text").isNotNull() & (F.trim("text") != "")
            )
        )
        .selectExpr(f"{_TH} as th")
        .selectExpr(
            f"CASE WHEN size(th) >= {n8} THEN "
            f"transform(sequence(1, size(th) - {n8} + 1), "
            f"i -> xxhash64(slice(th, i, {n8}))) "
            "ELSE CAST(array() AS array<bigint>) END as h8"
        )
        .selectExpr(
            "h8",
            f"CASE WHEN size(h8) >= {n8 + 1} THEN "
            f"transform(sequence(1, size(h8) - {n8}), "
            f"i -> xxhash64(element_at(h8, i), element_at(h8, i + {n8}))) "
            "ELSE CAST(array() AS array<bigint>) END as h16",
        )
        .selectExpr(
            "h8",
            "h16",
            f"CASE WHEN size(h16) >= {n16 + 1} THEN "
            f"transform(sequence(1, size(h16) - {n16}), "
            f"i -> xxhash64(element_at(h16, i), element_at(h16, i + {n16}))) "
            "ELSE CAST(array() AS array<bigint>) END as h32",
        )
        .selectExpr(
            "explode(concat("
            f"transform(h8, h -> struct({n8} as n, h)), "
            f"transform(h16, h -> struct({n16} as n, h)), "
            f"transform(h32, h -> struct({n32} as n, h)))) as g"
        )
    )
    counts = gr.groupBy("g.n", "g.h").agg(F.count("*").alias("cnt"))
    return (
        counts.groupBy("n")
        .agg(
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
        .orderBy("n")
    )


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
        .selectExpr("source", "doc_id", f"{_TH} as th")
        .select("source", "doc_id", F.explode(_ngram_expr(_SPAN_N, "th")).alias("g"))
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
