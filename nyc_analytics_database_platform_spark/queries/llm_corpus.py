"""Corpus-curation operators over the documents table: global span-level
exact dedup (C4-style repeated-span removal), unigram-LM quality scoring
(CCNet-style perplexity filter), and overlapping-window chunking (the
training-example / RAG assembly step).

All per-row logic is native Catalyst expressions; the only shuffles are the
corpus-wide aggregates each operator fundamentally needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.dedup import with_tokens
from nyc_analytics_database_platform_spark.registry import register

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"

# Span-dedup granularity: non-overlapping 8-token spans (C4 removes repeated
# 3-sentence spans; the synthetic corpus has no sentence marks, so fixed
# token windows stand in for sentences).
_SPAN = 8

# Chunking: 40-token windows, stride 30 (10-token overlap), chosen so the
# final window always has >= _CHUNK - _STRIDE tokens.
_CHUNK = 40
_STRIDE = 30


def first_span_occurrences(spans: DataFrame) -> DataFrame:
    """Global argmin of (doc_id, pos) per distinct span over a
    (doc_id, pos, span) frame - the kept set of C4-style span dedup.
    Groups on xxhash64(span) (8-byte shuffle keys; 2^-64 collision bound)
    and takes min over struct(doc_id, pos): lexicographic struct order IS
    the (doc_id, pos) global order ((doc_id, pos) is unique per row), with
    no packed-key arithmetic to overflow however long a document gets -
    regression-pinned with a >100k-token document in
    tests/test_round4_ops.py. The span STRING never enters the shuffle:
    the argmin ships (hash, doc_id, pos) only - 24 bytes/row - and the
    caller reattaches text by position arithmetic on the source document
    (see corpus_span_dedup). Callers that need the span text get it by
    joining this frame back on (doc_id, pos)."""
    return (
        spans.groupBy(F.xxhash64("span").alias("h"))
        .agg(F.min(F.struct("doc_id", "pos")).alias("f"))
        .select("f.doc_id", "f.pos")
    )


@register(
    "corpus_span_dedup",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
        ),
        spans AS (
            SELECT doc_id, i AS pos,
                   array_to_string(t[i:i + {_SPAN - 1}], ' ') AS span
            FROM toks,
                 unnest(generate_series(1, len(t), {_SPAN})) AS g(i)
        ),
        kept AS (
            SELECT doc_id, pos, span FROM (
                SELECT doc_id, pos, span,
                       ROW_NUMBER() OVER (
                           PARTITION BY span ORDER BY doc_id, pos
                       ) AS rn
                FROM spans
            ) WHERE rn = 1
        ),
        totals AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans FROM spans
            GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_spans,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
               COALESCE(k.kept_text, '') AS kept_text
        FROM totals t
        LEFT JOIN (
            SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(span, ' ' ORDER BY pos) AS kept_text
            FROM kept GROUP BY doc_id
        ) k ON t.doc_id = k.doc_id
        ORDER BY t.doc_id
    """,
    tags=("llm", "dedup", "corpus"),
    bench=True,
)
def corpus_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style repeated-span removal: split every document into fixed
    8-token spans, keep only the GLOBALLY FIRST occurrence of each span
    (ordered by (doc_id, position)), and reassemble the surviving text in
    document order. Unlike document-level dedup (dedup_exact_groups), this
    removes boilerplate that repeats INSIDE otherwise-unique documents -
    the C4/Lee-et-al. pipeline stage.

    Scale shape: one explode (spans-per-doc is bounded by doc length / 8),
    one shuffle on xxhash64(span) - an 8-byte long, never the raw span
    string (SCALE.md key discipline; the 2^-64 collision bound means two
    DISTINCT spans sharing a hash would dedupe as one, negligible against
    any corpus size this engine targets) - for the global argmin. The span
    TEXT never enters any shuffle: the argmin ships (hash, doc_id, pos)
    structs only (~24 bytes/row; map-side partial aggregation ships at
    most one per distinct hash per partition), the kept set collapses to
    ONE ROW PER DOC carrying a sorted int array of kept positions, and
    kept_text is reattached by POSITION ARITHMETIC - slicing the source
    document's own token array at each kept position - in a doc_id join
    whose kept side is per-doc-tiny (AQE broadcasts it at bench scale; at
    100 TB it degrades to a shuffle join where the position arrays, not
    the corpus text, are the payload). The argmin itself is min over
    struct(doc_id, pos): lexicographic struct order equals the (doc_id,
    pos) global order exactly ((doc_id, pos) is unique), with no
    packed-key arithmetic to overflow on a >100k-token document. The
    per-doc span TOTAL is pure arithmetic on the token count
    (ceil(len/8) = (len-1) div 8 + 1), so no branch ever tokenizes the
    corpus twice. NULL-text docs produce no spans on either engine and
    are dropped from totals to match (the oracle's totals aggregates the
    span rows themselves)."""
    # text-notnull BEFORE tokenizing: filtering on toks pushes the
    # predicate below the projection as isnotnull(split(...)), re-running
    # the whole tokenizer once per row just for the null test (opt round
    # 1); split() is null iff its input is null, so the pre-filter is
    # exactly equivalent and pushes to the scan.
    docs = with_tokens(
        load(spark, sf_dir, "documents", parallel=True).filter(
            F.col("text").isNotNull()
        )
    )
    spans = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(toks), {_SPAN}), "
                f"i -> array_join(slice(toks, i, {_SPAN}), ' '))"
            )
        ).alias("k", "span"),
    ).select(
        "doc_id", (F.col("k") * _SPAN + 1).alias("pos"), "span"
    )
    kept_pos = (
        first_span_occurrences(spans)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_sort(F.collect_list("pos")).alias("poss"),
        )
    )
    # sequence(1, len, 8) generates floor((len-1)/8)+1 starts (len >= 1
    # always: splitting an empty string yields ['']), so the span count is
    # arithmetic on size(toks) - no second explode, no shuffle. The same
    # scan carries toks so kept_text slices straight out of the document.
    return (
        docs.select(
            "doc_id",
            "toks",
            F.expr(f"(size(toks) - 1) div {_SPAN} + 1")
            .cast("long")
            .alias("n_spans"),
        )
        .join(kept_pos, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        "poss",
                        lambda p: F.array_join(
                            F.slice("toks", p.cast("int"), _SPAN), " "
                        ),
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("kept_text"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_unigram_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
        ),
        tokens AS (
            SELECT doc_id, unnest(t) AS tok FROM toks
        ),
        vocab AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tokens GROUP BY tok
        ),
        model AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
            FROM vocab
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               round(SUM(-ln((v.c + 1.0) / (m.n + m.v))) / COUNT(*), 6)
                 AS avg_nll,
               round(SUM(-ln((v.c + 1.0) / (m.n + m.v))) / COUNT(*), 6) < 3.45
                 AS keep
        FROM tokens t
        JOIN vocab v ON t.tok = v.tok
        CROSS JOIN model m
        GROUP BY t.doc_id
        ORDER BY t.doc_id
    """,
    tags=("llm", "quality", "corpus"),
)
def corpus_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filter with a corpus-trained unigram LM: the
    add-one-smoothed unigram log-probability of each document's tokens,
    averaged per token; documents above the negative-log-likelihood
    threshold are flagged for removal (high NLL = far from the corpus
    distribution = boilerplate/noise).

    Scale shape: the unigram model is two aggregates - per-token counts (one
    shuffle of (token) keys) and a one-row (N, V) total. Natural-language
    vocabularies are bounded (<= millions of types however large the corpus),
    so the count table BROADCASTs back onto the token stream and the one-row
    model is a broadcast crossJoin literal; the fact-side data is never
    shuffled except the per-document final aggregate. The keep flag compares
    the ROUNDED score so both engines make the identical boundary decision."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    tokens = docs.select("doc_id", F.explode("toks").alias("tok"))
    vocab = tokens.groupBy("tok").agg(F.count("*").alias("c"))
    model = vocab.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    )
    nll = -F.ln((F.col("c") + 1.0) / (F.col("n") + F.col("v")))
    score = F.round(F.sum(nll) / F.count("*"), 6)
    return (
        tokens.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(model))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            score.alias("avg_nll"),
            (score < 3.45).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_chunk_windows",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
        )
        SELECT doc_id,
               CAST((i - 1) / {_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(i AS BIGINT) AS start_tok,
               CAST(len(t[i:i + {_CHUNK - 1}]) AS BIGINT) AS n_tok_chunk,
               array_to_string(t[i:i + {_CHUNK - 1}], ' ') AS chunk_text
        FROM toks,
             unnest(generate_series(1, greatest(len(t) - {_CHUNK - _STRIDE - 1}, 1),
                                    {_STRIDE})) AS g(i)
        ORDER BY doc_id, chunk_idx
    """,
    tags=("llm", "chunking", "corpus"),
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking (RAG / context-window assembly): split
    each document into 40-token chunks at stride 30 (10-token overlap), with
    deterministic (doc_id, chunk_idx) identity, start offset, and chunk
    text. Start positions run to len - (chunk - stride) + 1 so the final
    window always keeps at least the overlap's worth of fresh tokens and the
    tail is never orphaned.

    Scale shape: pure per-row explode - no shuffle at all (the ORDER BY is
    presentation; a production writer would partition by hash(doc_id)). Row
    growth is len/stride per doc, the same multiplier any trainer pays; the
    chunk text is sliced from the one tokenized array, so text bytes are
    read once."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    starts = F.expr(
        f"sequence(1, greatest(size(toks) - {_CHUNK - _STRIDE - 1}, 1), {_STRIDE})"
    )
    return (
        docs.select("doc_id", "toks", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            (((F.col("i") - 1) / _STRIDE).cast("long")).alias("chunk_idx"),
            F.col("i").cast("long").alias("start_tok"),
            F.size(F.slice("toks", F.col("i"), _CHUNK))
            .cast("long")
            .alias("n_tok_chunk"),
            F.array_join(F.slice("toks", F.col("i"), _CHUNK), " ").alias(
                "chunk_text"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


_BI_THRESH = 3.41  # splits the corpus near its NLL median (measured)


@register(
    "corpus_bigram_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
        ),
        tokens AS (
            SELECT doc_id, unnest(t) AS tok FROM toks
        ),
        vocab AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tokens GROUP BY tok
        ),
        model AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
            FROM vocab
        ),
        bi AS (
            SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
            FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
            WHERE len(t) >= 2
        ),
        bgc AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bi GROUP BY w1, w2
        )
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_transitions,
               round(SUM(-ln(0.75 * (g.c12 + 1.0) / (v1.c + m.v)
                           + 0.25 * (v2.c + 1.0) / (m.n + m.v)))
                     / COUNT(*), 6) AS avg_nll,
               round(SUM(-ln(0.75 * (g.c12 + 1.0) / (v1.c + m.v)
                           + 0.25 * (v2.c + 1.0) / (m.n + m.v)))
                     / COUNT(*), 6) < {_BI_THRESH} AS keep
        FROM bi b
        JOIN bgc g ON b.w1 = g.w1 AND b.w2 = g.w2
        JOIN vocab v1 ON b.w1 = v1.tok
        JOIN vocab v2 ON b.w2 = v2.tok
        CROSS JOIN model m
        GROUP BY b.doc_id
        ORDER BY b.doc_id
    """,
    tags=("llm", "quality", "corpus"),
)
def corpus_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity filter - the order-2 upgrade of
    corpus_unigram_logprob (CCNet trains a real LM; the interpolated
    add-one bigram here is its engine-shaped stand-in): per transition,
    p(w2|w1) = 0.75 * (c12+1)/(c1+V) + 0.25 * (c2+1)/(N+V) - a smoothed
    bigram backed off to the smoothed unigram - averaged as NLL per doc;
    docs above the threshold are out-of-distribution (repetitive spans
    score LOW, scrambled text scores HIGH, which is exactly what the
    unigram model cannot see).

    Scale shape: the model is two aggregates - bigram counts (one shuffle
    keyed by the bigram; at 100 TB those keys are xxhash64 longs and the
    table is a persisted artifact, like the LSH band index) and the
    bounded vocab (broadcast). The transition stream joins its own count
    table once and the vocab twice, then one per-doc aggregate. Docs with
    < 2 tokens have no transitions and drop on both engines; the keep
    flag compares the ROUNDED score so both engines make the identical
    boundary call."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallel=True))
    tokens = docs.select("doc_id", F.explode("toks").alias("tok"))
    vocab = tokens.groupBy("tok").agg(F.count("*").alias("c"))
    model = vocab.agg(F.sum("c").alias("n"), F.count("*").alias("v"))
    bi = (
        docs.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    bgc = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    v1 = vocab.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    v2 = vocab.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    nll = -F.ln(
        0.75 * (F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))
        + 0.25 * (F.col("c2") + 1.0) / (F.col("n") + F.col("v"))
    )
    score = F.round(F.sum(nll) / F.count("*"), 6)
    return (
        bi.join(bgc, ["w1", "w2"])
        .join(F.broadcast(v1), "w1")
        .join(F.broadcast(v2), "w2")
        .crossJoin(F.broadcast(model))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_transitions"),
            score.alias("avg_nll"),
            (score < _BI_THRESH).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_novelty_scores",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
            FROM documents WHERE text IS NOT NULL
        ),
        grams AS (
            SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
            FROM toks,
                 unnest(generate_series(1, greatest(len(t) - 7, 0))) AS gi(i)
        ),
        firsts AS (
            SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
        )
        SELECT grams.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN firsts.first_doc = grams.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               round(SUM(CASE WHEN firsts.first_doc = grams.doc_id
                              THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
        FROM grams JOIN firsts USING (g)
        GROUP BY grams.doc_id
        ORDER BY grams.doc_id
    """,
    tags=("llm", "corpus", "dedup", "monitoring"),
)
def corpus_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 8-grams whose
    FIRST corpus occurrence (by doc_id order) is this document - low
    novelty marks documents that mostly repeat earlier corpus content (the
    memorization-risk / incremental-crawl-value metric; the doc-level
    rollup of the span-dedup first-occurrence idea). One distinct-gram
    explode, one gram-keyed argmin (map-side combinable MIN), one join
    back and a per-doc count. The gram shuffle key IS
    xxhash64(gram) (SCALE.md key discipline; the oracle keeps the exact
    string key - identical answers absent a 2^-64 hash collision, the
    same documented bound as corpus_span_dedup)."""
    # text-notnull BEFORE tokenizing: filtering on toks pushes the
    # predicate below the projection as isnotnull(split(...)), re-running
    # the whole tokenizer once per row just for the null test (opt round
    # 1); split() is null iff its input is null, so the pre-filter is
    # exactly equivalent and pushes to the scan.
    docs = with_tokens(
        load(spark, sf_dir, "documents", parallel=True).filter(
            F.col("text").isNotNull()
        )
    )
    # Shuffle keys are xxhash64(gram) longs, never the raw 8-token strings
    # (SCALE.md key discipline; 2^-64 collision bound documented) - the
    # hash happens INSIDE the array before the explode, so the exchange
    # carries (doc_id, long) rows only.
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(toks) >= 8 THEN "
                    "transform(sequence(1, size(toks) - 7), "
                    "i -> xxhash64(array_join(slice(toks, i, 8), ' '))) "
                    "ELSE array() END"
                )
            )
        ).alias("g"),
    )
    # No join-back: a doc's NOVEL count is just how many grams list it as
    # their first_doc, so both sides of the ratio come from per-doc
    # aggregates of the (already shuffled) gram frame - the corpus-wide
    # gram stream is never re-joined on its string key.
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    # totals never explode: a doc's distinct-gram count is an in-place
    # array expression (the per-document-properties-in-place pattern), so
    # the corpus is exploded exactly once (for the argmin side)
    totals = docs.select(
        "doc_id",
        F.size(
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(toks) >= 8 THEN "
                    "transform(sequence(1, size(toks) - 7), "
                    "i -> xxhash64(array_join(slice(toks, i, 8), ' '))) "
                    "ELSE array() END"
                )
            )
        )
        .cast("long")
        .alias("n_grams"),
    ).filter(F.col("n_grams") > 0)
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)) / F.col("n_grams").cast("double"),
                6,
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@register(
    "dataset_card_report",
    oracle=r"""
        WITH d AS (
            SELECT doc_id, source, lang, n_chars,
                   md5(lower(trim(text))) AS digest,
                   CASE WHEN text IS NULL THEN 0
                        ELSE len(string_split_regex(lower(trim(text)), '\s+'))
                   END AS n_toks,
                   (text IS NULL) AS is_null
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(SUM(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_text,
               round(1.0 - CAST(COUNT(DISTINCT digest) AS DOUBLE) / COUNT(*), 6)
                   AS exact_dup_rate,
               PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY n_chars)
                   AS median_chars,
               round(CAST(SUM(n_toks) AS DOUBLE) / COUNT(*), 6)
                   AS mean_tokens
        FROM d
    """,
    tags=("llm", "corpus", "reporting"),
)
def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card summary row: corpus size, language/source spread,
    NULL-text count, exact-duplicate mass, median length, mean token count
    - the one-glance documentation block published beside a training
    corpus (Datasheets/Data-Cards practice), every number a
    driver-attested aggregate consistent with the dedicated operators
    (dedup_rate_by_source, text_token_stats, train_val_test_split_report).

    Scale: one scan + one global aggregate. The two COUNT DISTINCTs
    (lang/source, bounded domains) and the digest distinct (corpus-sized)
    share the pass; at 100 TB the digest distinct is the expensive term
    and swaps to approx_count_distinct exactly as approx_distinct_buyers
    demonstrates. Exact median over n_chars shuffles the column once
    (the documented exact-percentile cost; approx twin policy applies)."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    d = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.md5(F.lower(F.trim(F.col("text")))).alias("digest"),
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
        .alias("n_toks"),
        F.col("text").isNull().alias("is_null"),
    )
    return d.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.count(F.when(F.col("is_null"), 1)).alias("n_null_text"),
        F.round(
            1.0 - F.countDistinct("digest").cast("double") / F.count("*"), 6
        ).alias("exact_dup_rate"),
        F.percentile("n_chars", 0.5).alias("median_chars"),
        F.round(F.sum("n_toks").cast("double") / F.count("*"), 6).alias(
            "mean_tokens"
        ),
    )


@register(
    "hapax_rate_by_source",
    oracle=rf"""
        WITH toks AS (
            SELECT source, unnest({_TOKS}) AS tok
            FROM documents WHERE text IS NOT NULL
        ),
        counts AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM toks WHERE tok <> '' GROUP BY source, tok
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               round(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS hapax_rate,
               CAST(SUM(n) AS BIGINT) AS n_tokens
        FROM counts
        GROUP BY source
        ORDER BY source
    """,
    tags=("llm", "corpus", "text", "reporting"),
)
def hapax_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-health metric per source: hapax legomena rate (fraction
    of the source's vocabulary occurring exactly once). A healthy natural
    corpus sits near ~0.4-0.6 (Zipf); a CRASHED rate signals boilerplate/
    template spam, a rate near 1.0 signals OCR noise or junk tokens -
    both the crawl-level triage signals that decide whether a source is
    worth dedup + filtering at all (pairs with dedup_rate_by_source and
    vocab_zipf_slope).

    Scale: one explode + one (source, token)-keyed count with map-side
    partial aggregation (shuffle bounded by per-source vocab, not token
    occurrences), then a per-source rollup of that bounded frame."""
    docs = load(spark, sf_dir, "documents", parallel=True).filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("source", "tok").agg(F.count("*").alias("n"))
    return (
        counts.groupBy("source")
        .agg(
            F.count("*").alias("vocab_size"),
            F.count(F.when(F.col("n") == 1, 1)).alias("n_hapax"),
            F.round(
                F.count(F.when(F.col("n") == 1, 1)).cast("double") / F.count("*"),
                6,
            ).alias("hapax_rate"),
            F.sum("n").alias("n_tokens"),
        )
        .orderBy("source")
    )


# Any-length substring dedup: minimum duplicated-run length in tokens. A
# duplicated region of length L >= _SUB_K is the union of its L-_SUB_K+1
# sliding _SUB_K-gram occurrences, so marking every non-first _SUB_K-gram
# occurrence and merging the marks recovers the FULL maximal repeat at
# token granularity - the seed-and-extend in closed form (the overlapping
# seeds ARE the extension), with no suffix array materialization.
_SUB_K = 8


@register(
    "corpus_substring_dedup",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
        ),
        grams AS (
            SELECT doc_id, i AS pos,
                   array_to_string(t[i:i + {_SUB_K - 1}], ' ') AS g
            FROM toks,
                 unnest(generate_series(1, len(t) - {_SUB_K - 1})) AS s(i)
            WHERE len(t) >= {_SUB_K}
        ),
        dup AS (
            SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                       ROW_NUMBER() OVER (
                           PARTITION BY g ORDER BY doc_id, pos
                       ) AS rn
                FROM grams
            ) WHERE rn > 1
        ),
        positions AS (
            SELECT doc_id, i AS pos, t[i] AS tok
            FROM toks, unnest(generate_series(1, len(t))) AS s(i)
        ),
        cov AS (
            SELECT p.doc_id, p.pos, p.tok,
                   EXISTS (
                       SELECT 1 FROM dup d
                       WHERE d.doc_id = p.doc_id
                         AND p.pos BETWEEN d.pos AND d.pos + {_SUB_K - 1}
                   ) AS covered
            FROM positions p
        ),
        runs AS (
            SELECT doc_id, pos, tok, covered,
                   CASE WHEN covered AND NOT COALESCE(
                            LAG(covered) OVER (
                                PARTITION BY doc_id ORDER BY pos
                            ), FALSE)
                        THEN 1 ELSE 0 END AS run_start
            FROM cov
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) FILTER (covered) AS BIGINT) AS n_dup_tokens,
               CAST(COALESCE(SUM(run_start), 0) AS BIGINT) AS n_dup_runs,
               COALESCE(
                   string_agg(tok, ' ' ORDER BY pos) FILTER (NOT covered),
                   '') AS kept_text
        FROM runs GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "dedup", "corpus"),
)
def corpus_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-length exact-substring dedup (the Lee et al. "Deduplicating
    Training Data" ExactSubstr stage, reference's dedup family): every
    maximal repeated token run of length >= _SUB_K whose content appeared
    EARLIER in the corpus (global (doc_id, pos) order over identical
    grams) is removed; the first occurrence keeps its text. Unlike
    corpus_span_dedup's fixed aligned 8-token spans, matches here start
    at ANY offset and extend to ANY length: a 37-token repeat is removed
    in full, not just its aligned-span core.

    How any-length works without a suffix array: slide a _SUB_K-token
    window over every document; a repeat of length L >= _SUB_K contains
    all of its L-_SUB_K+1 sliding grams, each a non-first global
    occurrence, so the union of their [pos, pos+_SUB_K-1] covers exactly
    the full repeat (seed-and-extend in closed form - the overlapping
    seeds ARE the bidirectional extension). Marks merge per document into
    maximal runs; output reports token totals, covered-token counts, run
    counts, and the reassembled kept text.

    Scale shape: one explode to ~token-count gram rows, hashed to
    xxhash64 IN the generating projection so only (doc_id, pos, h) - 24
    bytes/row, never gram text - enters the ONE shuffle (the per-hash
    first-occurrence window; 2^-64 collision bound as corpus_span_dedup
    documents). Dup starts are a small fraction of gram rows; everything
    after is per-document array arithmetic (sorted starts -> merged
    interval runs -> complement slices of the document's own token
    array), bounded by document length, no second shuffle besides the
    per-doc collect_list groupBy. The O(tokens x _SUB_K) gram-string
    construction is the one non-rolling cost; at 100 TB a polynomial
    rolling hash over per-token hashes drops it to O(tokens) without
    changing any downstream semantics."""
    # text-notnull BEFORE tokenizing: filtering on toks pushes the
    # predicate below the projection as isnotnull(split(...)), re-running
    # the whole tokenizer once per row just for the null test (opt round
    # 1); split() is null iff its input is null, so the pre-filter is
    # exactly equivalent and pushes to the scan.
    docs = with_tokens(
        load(spark, sf_dir, "documents", parallel=True).filter(
            F.col("text").isNotNull()
        )
    )
    base = docs.select(
        "doc_id", "toks", F.size("toks").cast("long").alias("n_tokens")
    )
    grams = (
        base.filter(F.col("n_tokens") >= _SUB_K)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SUB_K - 1}), "
                    f"i -> xxhash64(array_join(slice(toks, i, {_SUB_K}), ' ')))"
                )
            ).alias("k", "h"),
        )
        .select("doc_id", (F.col("k") + 1).alias("pos"), "h")
    )
    from pyspark.sql import Window

    first = F.min(F.struct("doc_id", "pos")).over(Window.partitionBy("h"))
    dup_starts = (
        grams.withColumn("f", first)
        .filter(
            (F.col("f.doc_id") != F.col("doc_id"))
            | (F.col("f.pos") != F.col("pos"))
        )
        .select("doc_id", "pos")
    )
    # sorted dup starts -> merged maximal runs [a, b] (intervals
    # [s, s+K-1] merge when the next start is <= b+1: overlapping OR
    # adjacent covered regions are ONE maximal run, matching the oracle's
    # per-position run_start flags)
    runs_expr = (
        "aggregate(starts, cast(array() as array<struct<a:int,b:int>>), "
        "(acc, s) -> CASE WHEN size(acc) > 0 AND s <= element_at(acc, -1).b + 1 "
        "THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array(named_struct('a', element_at(acc, -1).a, 'b', s + {_SUB_K - 1}))) "
        f"ELSE concat(acc, array(named_struct('a', s, 'b', s + {_SUB_K - 1}))) END)"
    )
    dup = (
        dup_starts.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("starts"))
        .withColumn("runs", F.expr(runs_expr))
        .select("doc_id", "runs")
    )
    # kept_text = the complement slices of the doc's own token array,
    # walked with a (cursor, parts) fold; n_dup_tokens/runs are pure
    # arithmetic on the merged intervals.
    kept_expr = (
        "array_join(aggregate(runs, "
        "named_struct('cur', 1, 'parts', cast(array() as array<string>)), "
        "(st, r) -> named_struct('cur', r.b + 1, 'parts', "
        "CASE WHEN r.a > st.cur THEN concat(st.parts, "
        "array(array_join(slice(toks, st.cur, r.a - st.cur), ' '))) "
        "ELSE st.parts END), "
        "st -> CASE WHEN st.cur <= size(toks) THEN concat(st.parts, "
        "array(array_join(slice(toks, st.cur, size(toks) - st.cur + 1), ' '))) "
        "ELSE st.parts END), ' ')"
    )
    return (
        base.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(
                F.expr("aggregate(runs, 0L, (x, r) -> x + r.b - r.a + 1)"),
                F.lit(0).cast("long"),
            ).alias("n_dup_tokens"),
            F.coalesce(F.size("runs").cast("long"), F.lit(0).cast("long")).alias(
                "n_dup_runs"
            ),
            F.when(F.col("runs").isNull(), F.array_join("toks", " "))
            .otherwise(F.expr(kept_expr))
            .alias("kept_text"),
        )
        .orderBy("doc_id")
    )
