"""Plan-shape guards for the round-4 additions (BPE / SQ8 / RRF / filters):
the scale claims in their docstrings - zero-shuffle scoring, broadcast
grids, WindowGroupLimit rank cuts, no Python in any hot path - locked as
plan assertions, same discipline as test_plan_invariants.py."""

from __future__ import annotations

import contextlib
import io

from nyc_analytics_database_platform_spark import registry


def plan_text(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        registry.get(name).fn(spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_rrf_candidate_cuts_are_take_ordered(spark, sf_dir):
    p = plan_text(spark, sf_dir, "retrieval_rrf_hybrid_top5")
    # both retriever cuts are distributed top-k merges, not global sorts
    assert p.count("TakeOrderedAndProject") >= 2
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_quality_model_is_zero_shuffle_scan(spark, sf_dir):
    p = plan_text(spark, sf_dir, "quality_model_scores")
    # scoring itself never hash-shuffles; the only exchange is the
    # presentation orderBy's range partitioning
    assert "Exchange hashpartitioning" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_sq8_adc_broadcasts_grid_and_takes_ordered(spark, sf_dir):
    p = plan_text(spark, sf_dir, "sq8_adc_top5")
    assert "BroadcastHashJoin" in p  # 64-row grid + query cells broadcast
    assert "TakeOrderedAndProject" in p  # top-5, no global sort
    assert "SortMergeJoin" not in p


def test_fuzzy_contamination_broadcasts_eval_bands(spark, sf_dir):
    p = plan_text(spark, sf_dir, "benchmark_contamination_fuzzy")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bpe_stays_jvm_side(spark, sf_dir):
    p = plan_text(spark, sf_dir, "bpe_train_merges")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the chosen pair travels as a broadcast, never a collected literal:
    # each merge round contributes a broadcast-of-one-row nested loop join
    assert p.count("BroadcastNestedLoopJoin") >= 3
