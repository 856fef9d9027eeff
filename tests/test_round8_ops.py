"""Round-8 invariants: any-length exact-substring dedup
(corpus_substring_dedup) on a planted-repeat corpus — the semantics the
sliding-gram + interval-merge construction must deliver: a repeat of ANY
length >= 8 tokens is removed in FULL (not just its aligned-span core),
first occurrence keeps its text, sub-threshold repeats survive."""

from __future__ import annotations

import pyspark.sql.functions as F

from nyc_analytics_database_platform_spark.queries.llm_corpus import (
    corpus_substring_dedup,
)


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


_SEQ = iter(range(10**6))


def _run_on_docs(spark, tmp_path, rows):
    sub = f"sf{next(_SEQ)}"
    sf = str(tmp_path / sub)
    (tmp_path / sub).mkdir()
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    out = corpus_substring_dedup(spark, sf).collect()
    return {r["doc_id"]: r for r in out}


def test_planted_long_repeat_removed_in_full(spark, tmp_path):
    """A 37-token repeat (NOT a multiple of 8, offset into the middle of
    doc 2) is removed in full from the later occurrence; the first
    occurrence keeps every token."""
    repeat = _words("rep", 37)
    d1 = f"{_words('a', 5)} {repeat} {_words('b', 5)}"
    d2 = f"{_words('c', 11)} {repeat} {_words('d', 3)}"
    res = _run_on_docs(
        spark,
        tmp_path,
        [(1, "s", d1), (2, "s", d2)],
    )
    assert res[1]["n_dup_tokens"] == 0
    assert res[1]["kept_text"] == d1
    assert res[2]["n_tokens"] == 11 + 37 + 3
    assert res[2]["n_dup_tokens"] == 37
    assert res[2]["n_dup_runs"] == 1
    assert res[2]["kept_text"] == f"{_words('c', 11)} {_words('d', 3)}"


def test_sub_threshold_repeat_survives(spark, tmp_path):
    """A 7-token repeat (< _SUB_K = 8) is NOT removed anywhere."""
    repeat = _words("r", 7)
    d1 = f"{repeat} {_words('x', 9)}"
    d2 = f"{_words('y', 9)} {repeat}"
    res = _run_on_docs(spark, tmp_path, [(1, "s", d1), (2, "s", d2)])
    assert res[1]["n_dup_tokens"] == 0
    assert res[2]["n_dup_tokens"] == 0
    assert res[2]["kept_text"] == d2


def test_two_separate_runs_counted(spark, tmp_path):
    """Two disjoint planted repeats in one doc -> two maximal runs; a
    within-document self-repeat also dedupes (first copy survives)."""
    r1, r2 = _words("p", 10), _words("q", 12)
    d1 = f"{r1} {_words('m', 9)} {r2}"
    d2 = f"{r2} {_words('n', 9)} {r1}"
    res = _run_on_docs(spark, tmp_path, [(1, "s", d1), (2, "s", d2)])
    assert res[1]["n_dup_tokens"] == 0
    assert res[2]["n_dup_tokens"] == 22
    assert res[2]["n_dup_runs"] == 2
    assert res[2]["kept_text"] == _words("n", 9)
    # self-repeat inside one document
    r = _words("z", 8)
    res2 = _run_on_docs(
        spark, tmp_path, [(7, "s", f"{r} {_words('w', 9)} {r}")]
    )
    assert res2[7]["n_dup_tokens"] == 8
    assert res2[7]["n_dup_runs"] == 1
    assert res2[7]["kept_text"] == f"{r} {_words('w', 9)}"


def test_adjacent_runs_merge(spark, tmp_path):
    """Back-to-back repeated regions (each seen earlier in different
    docs) merge into ONE maximal run in the doc that contains both."""
    r1, r2 = _words("g", 8), _words("h", 8)
    res = _run_on_docs(
        spark,
        tmp_path,
        [
            (1, "s", f"{r1} {_words('u', 9)}"),
            (2, "s", f"{_words('v', 9)} {r2}"),
            (3, "s", f"{_words('k', 9)} {r1} {r2} {_words('l', 9)}"),
        ],
    )
    # doc 3: r1 and r2 are each duplicated; when adjacent they are one
    # contiguous covered region -> BUT the join seam "g7 h0..." grams also
    # only exist in doc 3, so coverage is exactly the 16 repeat tokens.
    assert res[3]["n_dup_tokens"] == 16
    assert res[3]["n_dup_runs"] == 1
    assert res[3]["kept_text"] == f"{_words('k', 9)} {_words('l', 9)}"


# --- persisted HLL sketch table (queries/parity_lifecycle.py) -------------

def test_sketch_table_warm_serves_from_files(spark, sf_dir):
    """Second invocation must hit the freshness stamp (no rebuild) and the
    parquet-roundtripped sketches must union to the same answer."""
    import os

    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        build_month_sketch_table,
        sketch_table_range_buyers,
    )

    first = sketch_table_range_buyers(spark, sf_dir).collect()
    path = build_month_sketch_table(spark, sf_dir)
    mtime = os.path.getmtime(path + "_done")
    second = sketch_table_range_buyers(spark, sf_dir).collect()
    assert os.path.getmtime(path + "_done") == mtime, "rebuilt on warm call"
    assert first == second
    assert first[0]["within_tolerance"] is True
    assert first[0]["n_months"] == 24


def test_sketch_table_union_matches_whole_range_sketch(spark, sf_dir):
    """Register-wise union of per-month sketches ~= one sketch over the
    whole range (Datasketches union may promote representations, so exact
    equality is not guaranteed; 2% of exact is - same bound the
    incremental HLL query pins)."""
    from pyspark.sql import functions as F

    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        build_month_sketch_table,
    )

    path = build_month_sketch_table(spark, sf_dir)
    rng = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
    )
    single = rng.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e"),
        F.countDistinct("o_custkey").alias("x"),
    ).collect()[0]
    merged = (
        spark.read.parquet(path)
        .filter(F.col("o_month").between("1997-01", "1998-12"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(merged - single["e"]) / single["x"] <= 0.02
