"""Round-4 additions beyond oracle parity: BPE merge-fold semantics vs a
pure-Python reference, SQ8 code-range / reconstruction-error bounds, and
RRF fused-score invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.queries.llm_bpe import (
    _apply_merge,
    _top_pair,
    bpe_train_merges,
)
from nyc_analytics_database_platform_spark.queries.llm_retrieval import (
    _K_CAND,
    _RRF_K,
    retrieval_rrf_hybrid_top5,
)
from nyc_analytics_database_platform_spark.queries.llm_sq import _quantized


# --- BPE ---------------------------------------------------------------------


def _ref_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Reference left-to-right non-overlapping BPE merge."""
    out = [syms[0]]
    for x in syms[1:]:
        if out[-1] == left and x == right:
            out[-1] = out[-1] + x
        else:
            out.append(x)
    return out


def _words_df(spark, rows):
    df = spark.createDataFrame(rows, "word string, freq long")
    return df.withColumn("syms", F.split("word", ""))


def test_bpe_top_pair_count_and_tiebreak(spark):
    # (a,a) and (a,b) both count 4; tie breaks to the lexically first pair.
    words = _words_df(spark, [("aaab", 2), ("abab", 1)])
    top = _top_pair(words).head()
    assert (top["l"], top["r"], top["cnt"]) == ("a", "a", 4)


@pytest.mark.parametrize(
    "word",
    ["aaaa", "aaa", "abab", "a", "banana"],
)
def test_bpe_fold_matches_reference(spark, word):
    words = _words_df(spark, [(word, 1)])
    pair = spark.createDataFrame([("a", "a", 1)], "l string, r string, cnt long")
    got = _apply_merge(words, pair).head()["syms"]
    assert list(got) == _ref_merge(list(word), "a", "a")
    # the canonical overlap case: aaaa -> aa,aa (never aa,a,a or aaa,a)
    if word == "aaaa":
        assert list(got) == ["aa", "aa"]


def test_bpe_merged_symbol_does_not_chain_within_round(spark):
    # after 'a'+'a' -> 'aa', the new 'aa' must not immediately fuse with the
    # next 'a' in the same round (acc[-1] = 'aa' != l = 'a')
    words = _words_df(spark, [("aaa", 1)])
    pair = spark.createDataFrame([("a", "a", 1)], "l string, r string, cnt long")
    assert list(_apply_merge(words, pair).head()["syms"]) == ["aa", "a"]


def test_bpe_train_merges_shape(spark, sf_dir):
    rows = bpe_train_merges(spark, sf_dir).collect()
    assert [r["step"] for r in rows] == [1, 2, 3]
    # counts are positive and the merged symbols are non-empty
    assert all(r["pair_count"] > 0 for r in rows)
    assert all(r["left_sym"] and r["right_sym"] for r in rows)


def test_bpe_materialized_long_run_extends_lazy_prefix(spark, sf_dir):
    """The scale path (train_merges(materialize=True), per-round
    localCheckpoint) must be algorithm-identical to the lazy chain: a
    12-round materialized run's first 3 merges equal the lazy 3-round
    run's, and the merge sequence stays well-formed (positive,
    non-increasing-ish counts are NOT guaranteed by BPE, but every merge
    must have a positive count and non-empty symbols)."""
    from nyc_analytics_database_platform_spark.queries.llm_bpe import train_merges

    def merge_rows(tops):
        return [
            (r["l"], r["r"], r["cnt"]) for t in tops for r in t.collect()
        ]

    _, lazy3 = train_merges(spark, sf_dir, 3)
    _, mat12 = train_merges(spark, sf_dir, 12, materialize=True)
    lazy_rows, mat_rows = merge_rows(lazy3), merge_rows(mat12)
    assert mat_rows[:3] == lazy_rows
    assert len(mat_rows) == 12
    assert all(cnt > 0 and l and r for l, r, cnt in mat_rows)


# --- SQ8 ---------------------------------------------------------------------


def test_sq8_codes_in_range_and_error_bounded(spark, sf_dir):
    cells, stats, codes = _quantized(spark, sf_dir)
    rng = codes.agg(
        F.min("code").alias("lo"), F.max("code").alias("hi")
    ).head()
    assert rng["lo"] >= 0 and rng["hi"] <= 255
    # reconstruction error of every cell is at most half a grid step
    joined = (
        codes.join(cells, ["vec_id", "dim"])
        .join(F.broadcast(stats), "dim")
        .select(
            (
                F.abs(
                    F.col("x")
                    - (
                        F.col("dmin")
                        + F.col("code")
                        * (F.col("dmax") - F.col("dmin"))
                        / F.lit(255.0)
                    )
                )
                - (F.col("dmax") - F.col("dmin")) / F.lit(510.0)
            ).alias("excess")
        )
    )
    worst = joined.agg(F.max("excess").alias("m")).head()["m"]
    assert worst <= 1e-9


# --- RRF ---------------------------------------------------------------------


def test_rrf_scores_are_valid_fusions(spark, sf_dir):
    rows = retrieval_rrf_hybrid_top5(spark, sf_dir).collect()
    assert len(rows) == 5
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    hi = 2.0 / (_RRF_K + 1)
    for r in rows:
        assert 0.0 < r["rrf_score"] <= hi + 1e-12
        for c in ("lex_rank", "sem_rank"):
            assert r[c] is None or 1 <= r[c] <= _K_CAND
        # the fused score is exactly the sum of the two contributions
        expect = sum(
            1.0 / (_RRF_K + r[c]) for c in ("lex_rank", "sem_rank") if r[c]
        )
        assert abs(r["rrf_score"] - round(expect, 9)) < 1e-12


# --- hypothesis: fold == reference on arbitrary words/pairs ------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:

    @settings(max_examples=20, deadline=None)
    @given(
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=4
        ),
        left=st.sampled_from(["a", "b"]),
        right=st.sampled_from(["a", "b"]),
    )
    def test_bpe_fold_property(spark, words, left, right):
        rows = [(w, 1) for w in dict.fromkeys(words)]
        wdf = _words_df(spark, rows)
        pair = spark.createDataFrame(
            [(left, right, 1)], "l string, r string, cnt long"
        )
        got = {
            r["word"]: list(r["syms"]) for r in _apply_merge(wdf, pair).collect()
        }
        for w, _ in rows:
            assert got[w] == _ref_merge(list(w), left, right), (w, left, right)


# --- empty-input degradation -------------------------------------------------


def test_bpe_empty_words_degrade(spark):
    empty = spark.createDataFrame(
        [], "word string, freq long"
    ).withColumn("syms", F.split("word", ""))
    top = _top_pair(empty).head()
    assert top["l"] is None and top["r"] is None
    # applying a NULL pair is a no-op, not an error
    assert _apply_merge(empty, _top_pair(empty)).count() == 0


# --- MMR greedy trajectory vs pure-Python reference --------------------------


def test_mmr_matches_reference_trajectory(spark, sf_dir):
    import math

    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.queries.llm_retrieval import (
        _MMR_K,
        _MMR_LAMBDA,
        _MMR_POOL,
        retrieval_mmr_top5,
    )

    rows = load(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    q = vecs[0]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b))
            ),
            6,
        )

    scored = sorted(
        ((cos(v, q), -i) for i, v in vecs.items()), reverse=True
    )[:_MMR_POOL]
    pool = [(-ni, s) for s, ni in scored]
    sel = []
    for k in range(_MMR_K):
        best = None
        for i, rel in pool:
            if any(i == j for j, _ in sel):
                continue
            pen = max((cos(vecs[i], vecs[j]) for j, _ in sel), default=0.0)
            mmr = round(
                _MMR_LAMBDA * rel
                - (0.0 if not sel else round(1 - _MMR_LAMBDA, 1) * pen),
                6,
            )
            cand = (mmr, -i)
            if best is None or cand > best[0]:
                best = (cand, i, rel, mmr)
        sel.append((best[1], best[3]))

    got = [
        (r["vec_id"], r["mmr"]) for r in retrieval_mmr_top5(spark, sf_dir).collect()
    ]
    assert got == sel
