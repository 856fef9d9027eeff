"""Properties of the corpus-curation operators (llm_corpus.py) beyond the
bit-exact oracle: global uniqueness after span dedup, chunk coverage, and
quality-score bounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F


from nyc_analytics_database_platform_spark.queries.llm_corpus import (
    _CHUNK,
    _SPAN,
    _STRIDE,
    corpus_chunk_windows,
    corpus_span_dedup,
    corpus_unigram_logprob,
)

SF_DIR = "/root/testdata/sf0.001"


def test_span_dedup_counts(spark):
    # Exactly one occurrence of each distinct span survives - that is the
    # operator's whole contract (checked against an independent re-split).
    df = corpus_span_dedup(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    spans = docs.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, size(split(lower(trim(text)), '\\\\s+')), {_SPAN}),"
                f" i -> array_join(slice(split(lower(trim(text)), '\\\\s+'), i, {_SPAN}), ' '))"
            )
        ).alias("span")
    )
    n_spans_total = spans.count()
    n_distinct = spans.distinct().count()
    agg = df.agg(
        F.sum("n_spans").alias("t"), F.sum("n_kept").alias("k")
    ).collect()[0]
    assert agg.t == n_spans_total
    # exactly one occurrence of each distinct span survives
    assert agg.k == n_distinct


def test_chunk_windows_cover_all_tokens(spark):
    chunks = corpus_chunk_windows(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_toks"),
    )
    last = chunks.groupBy("doc_id").agg(
        F.max(F.col("start_tok") + F.col("n_tok_chunk") - 1).alias("covered"),
        F.count("*").alias("n_chunks"),
    )
    joined = last.join(docs, "doc_id").collect()
    assert joined
    for r in joined:
        assert r.covered == r.n_toks  # tail never orphaned
        # stride math: chunk indexes are dense 0..n_chunks-1
    idx = chunks.groupBy("doc_id").agg(
        F.max("chunk_idx").alias("mx"), F.count("*").alias("n")
    ).collect()
    for r in idx:
        assert r.mx == r.n - 1


def test_chunk_overlap_is_stride(spark):
    rows = (
        corpus_chunk_windows(spark, SF_DIR)
        .filter(F.col("doc_id") == 0)
        .orderBy("chunk_idx")
        .collect()
    )
    for a, b in zip(rows, rows[1:]):
        assert b.start_tok - a.start_tok == _STRIDE
        if a.n_tok_chunk == _CHUNK:
            # consecutive full windows share exactly CHUNK-STRIDE tokens
            a_toks = a.chunk_text.split()
            b_toks = b.chunk_text.split()
            assert a_toks[_STRIDE:] == b_toks[: _CHUNK - _STRIDE]


def test_unigram_scores_positive_and_keep_consistent(spark):
    rows = corpus_unigram_logprob(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.avg_nll > 0
        assert r.keep == (r.avg_nll < 3.45)


def test_with_tokens_single_exchange_and_single_split(spark, sf_dir):
    """Optimization-round pin: with_tokens repartitions BEFORE tokenizing,
    so a parallel-loaded input collapses with it into ONE round-robin
    exchange (CollapseRepartition), and a downstream consumer of `toks`
    never re-runs the regex split - neither inlined into per-element
    lambdas (CollapseProject) nor duplicated into a pushed-down null
    filter (the old toks-isNotNull shape tokenized every row twice)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.operators.dedup import (
        with_tokens,
    )

    docs = with_tokens(
        load(spark, sf_dir, "documents", parallel=True).filter(
            F.col("text").isNotNull()
        )
    )
    out = docs.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(toks), 8),"
            " i -> array_join(slice(toks, i, 8), ' '))"
        ).alias("spans"),
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("RoundRobinPartitioning") == 1, plan
    assert plan.count("split(") == 1, plan
