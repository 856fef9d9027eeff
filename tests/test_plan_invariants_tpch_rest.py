"""Plan-shape guards for the round-3 additions: the remaining TPC-H shapes
(parity_tpch_rest.py) and the mixture/kNN queries (llm_mixture.py)."""

from __future__ import annotations

from tests.test_plan_invariants import plan_text


def test_q6_predicates_push_to_scan(spark, sf_dir):
    """Q6 is a pure scan-filter-agg: the shipdate range and quantity bound
    must reach the parquet scan, and no exchange beyond the 1-row final
    aggregate combine may appear."""
    p = plan_text(spark, sf_dir, "tpch_q6_forecast_revenue")
    pushed = p.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    assert "hashpartitioning" not in p  # only the SinglePartition combine


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    p = plan_text(spark, sf_dir, "tpch_q4_order_priority")
    assert "LeftSemi" in p


def test_q5_dims_broadcast_two_wide_shuffles(spark, sf_dir):
    """Q5's supplier/nation/region chain must broadcast; the only wide
    (hashpartitioning) exchanges are lineitem<->orders, orders<->customer,
    and the final per-nation aggregate."""
    p = plan_text(spark, sf_dir, "tpch_q5_local_supplier_volume")
    assert "BroadcastHashJoin" in p
    keys = [l for l in p.splitlines() if "Arguments: hashpartitioning" in l]
    assert len(keys) <= 6, p  # 2 join sides x 2 joins + final agg, never more


def test_q19_residual_predicates_push_to_both_scans(spark, sf_dir):
    """Catalyst must extract per-side residuals from the OR-of-ANDs: the
    lineitem scan gets a quantity bound, the part scan gets brand/size
    Or-filters."""
    p = plan_text(spark, sf_dir, "tpch_q19_disjunctive_revenue")
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)", p)
    joined = " | ".join(pushed)
    assert "l_quantity" in joined, p
    assert "p_brand" in joined or "p_size" in joined, p


def test_q15_view_reused_not_recomputed(spark, sf_dir):
    """The revenue view feeds both the max and the equality join from one
    materialization (localCheckpoint): the fact scan must appear at most
    once in the final plan."""
    p = plan_text(spark, sf_dir, "tpch_q15_top_supplier")
    n_fact_scans = p.count("lineitem.parquet")
    assert n_fact_scans == 0, p  # checkpointed: plan reads the RDD, no rescan


def test_q16_distinct_pairs_before_part_join(spark, sf_dir):
    """The (partkey, suppkey) distinct must run before the part join so fact
    multiplicity collapses first; part keep-list and supplier blocklist are
    broadcast."""
    p = plan_text(spark, sf_dir, "tpch_q16_part_supplier_counts")
    agg_pos = p.find("HashAggregate")
    join_pos = p.find("BroadcastHashJoin")
    assert 0 <= agg_pos < join_pos, p


def test_q20_one_pass_no_self_join(spark, sf_dir):
    """Q20's two aggregates (1997 qty, lifetime qty) come from ONE pass over
    the part-filtered fact: exactly one fact scan, no self-join."""
    p = plan_text(spark, sf_dir, "tpch_q20_promotion_suppliers")
    # each scan prints its Location once in the detail section
    n_fact_scans = p.count("lineitem.parquet")
    assert n_fact_scans == 1, p


def test_knn_graph_window_group_limit(spark, sf_dir):
    """The per-source top-3 must compile to WindowGroupLimit (running heap),
    never a full per-source sort of the neighbor lists."""
    p = plan_text(spark, sf_dir, "knn_graph_top3")
    assert "WindowGroupLimit" in p


def test_mixture_rates_broadcast_no_corpus_shuffle(spark, sf_dir):
    """The 4-row rate frame joins back to the corpus as a broadcast; the
    corpus itself shuffles only for the final 4-group aggregate."""
    p = plan_text(spark, sf_dir, "domain_mixture_resample")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_semdedup_join_is_equi_on_cluster(spark, sf_dir):
    """SemDeDup candidate generation must be an equi-join on the cluster id
    (shuffle or broadcast hash join) - never a cartesian product."""
    p = plan_text(spark, sf_dir, "semdedup_within_cluster")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
