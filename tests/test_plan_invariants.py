"""Plan-shape regression guards: the physical-plan properties SCALE.md
claims are locked by tests, so a refactor that silently loses pushdown,
broadcast, or top-K optimization fails CI."""

from __future__ import annotations

import contextlib
import io

import pytest

from nyc_analytics_database_platform_spark import registry


def plan_text(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        registry.get(name).fn(spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_date_filter_pushes_to_scan(spark, sf_dir):
    p = plan_text(spark, sf_dir, "filter_date_range_projection")
    pushed = p.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "l_shipdate" in pushed and "EqualTo(l_suppkey,3)" in pushed


def test_projection_prunes_scan_columns(spark, sf_dir):
    p = plan_text(spark, sf_dir, "flagship_orders_status_by_nation")
    orders_schema = next(
        l for l in p.splitlines() if "ReadSchema" in l and "o_custkey" in l
    )
    assert "o_orderdate" not in orders_schema  # unused column not read
    assert "o_orderpriority" not in orders_schema


def test_flagship_dims_broadcast(spark, sf_dir):
    p = plan_text(spark, sf_dir, "flagship_orders_status_by_nation")
    assert "BroadcastHashJoin" in p


def test_top10_uses_take_ordered(spark, sf_dir):
    p = plan_text(spark, sf_dir, "recent_orders_top10")
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p  # no global sort node


def test_ranked_window_gets_group_limit(spark, sf_dir):
    p = plan_text(spark, sf_dir, "top3_customers_per_nation")
    assert "WindowGroupLimit" in p


def test_sql_surface_gets_same_optimizations(spark, sf_dir):
    """SQL text compiles to the same physical shapes as the DataFrame API:
    hinted dims broadcast, and the correlated EXISTS decorrelates to a
    semi join (never a per-row subquery)."""
    p = plan_text(spark, sf_dir, "sql_revenue_by_region")
    assert "BroadcastHashJoin" in p
    p = plan_text(spark, sf_dir, "sql_late_shipping_priority")
    assert "LeftSemi" in p


def test_merge_upsert_is_anti_join_plus_union(spark, sf_dir):
    p = plan_text(spark, sf_dir, "merge_upsert_orders")
    assert "LeftAnti" in p
    assert "Union" in p


def test_ivf_probe_has_no_driver_actions(spark, sf_dir):
    """The probe is one declarative plan: no collect()/head()/toPandas()
    driver actions inside the query fn (job counting is too noisy a probe -
    every spark.read.parquet runs a footer-read job), and the plan carries
    the argmax subquery as broadcast joins, not a literal label."""
    import inspect

    src = inspect.getsource(registry.get("ivf_probe_top5").fn)
    for action in (".collect()", ".head(", ".toPandas()", ".first()", ".take("):
        assert action not in src, action
    p = plan_text(spark, sf_dir, "ivf_probe_top5")
    assert p.count("BroadcastExchange") >= 2  # probe label + query vector


def test_no_python_udf_in_native_paths(spark, sf_dir):
    """The reference-parity queries must stay whole-stage-codegen native -
    no Python evaluation nodes."""
    for name in (
        "flagship_orders_status_by_nation",
        "month_spine_zero_fill",
        "top5_other_rollup",
        "key_codec_roundtrip",
        "text_token_stats",
    ):
        p = plan_text(spark, sf_dir, name)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_q18_broadcasts_survivors_single_wide_shuffle(spark, sf_dir):
    """Q18's only wide shuffle is the lineitem aggregate: the HAVING
    survivors broadcast into orders, so no orders/customer shuffle appears."""
    p = plan_text(spark, sf_dir, "tpch_q18_large_orders")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    # exactly one hashpartitioning exchange (the lineitem groupBy)
    n_exchanges = sum(
        1 for l in p.splitlines() if "Arguments: hashpartitioning" in l
    )
    assert n_exchanges == 1, p


def test_scd2_windows_share_one_exchange(spark, sf_dir):
    """The SCD2 build's lag/lead/row_number windows all use the same
    partitioning+ordering: one shuffle + at most two sorts, never three."""
    p = plan_text(spark, sf_dir, "scd2_customer_status_history")
    n_exchanges = sum(
        1 for l in p.splitlines() if "Arguments: hashpartitioning" in l
    )
    assert n_exchanges == 1, p


def test_q17_fact_never_shuffles_whole(spark, sf_dir):
    """Q17's fact joins are both broadcast (part filter in, stats back), so
    the only hashpartitioning exchange is the brand-filtered per-part
    aggregate - the full lineitem never shuffles."""
    p = plan_text(spark, sf_dir, "tpch_q17_small_qty_revenue")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_q13_aggregates_orders_before_join(spark, sf_dir):
    """Q13 must reduce orders to per-customer counts BEFORE joining customer
    (the naive row-multiplying outer join would shuffle the fact wide): the
    plan's first hashpartitioning exchange carries only the narrow count
    aggregate, and the join consumes it."""
    p = plan_text(spark, sf_dir, "tpch_q13_custdist")
    agg_pos = p.find("HashAggregate")
    join_pos = max(p.find("SortMergeJoin"), p.find("BroadcastHashJoin"))
    assert 0 <= agg_pos < join_pos, p


def test_q21_single_fact_shuffle_key(spark, sf_dir):
    """Q21 decorrelates both EXISTS into one per-order aggregate chain on
    the shuffle-hash join's own partitioning: the only hashpartitioning
    exchanges are the two join inputs on the order key (l_orderkey /
    o_orderkey) and the tiny final per-supplier-name aggregate - NO
    (l_orderkey, l_suppkey) pair-level exchange (the pair aggregate reuses
    the join partitioning), no self-join explosion."""
    p = plan_text(spark, sf_dir, "tpch_q21_waiting_suppliers")
    keys = [
        l for l in p.splitlines() if "Arguments: hashpartitioning" in l
    ]
    assert keys and all(
        "l_orderkey" in k or "o_orderkey" in k or "s_name" in k for k in keys
    ), p
    # the pair aggregate must NOT re-shuffle on the (orderkey, suppkey) pair
    assert not any(
        "l_orderkey" in k and "l_suppkey" in k for k in keys
    ), p


def test_profile_single_scan(spark, sf_dir):
    """The column profile must read orders ONCE (the oracle's UNION ALL
    re-scans per column; the engine plan may not)."""
    p = plan_text(spark, sf_dir, "profile_orders_columns")
    # formatted explain prints each scan twice (tree + detail); count the
    # numbered detail entries only
    import re

    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M))
    assert n_scans == 1, p


def test_unigram_vocab_broadcasts(spark, sf_dir):
    """The unigram model joins back onto the token stream as broadcasts
    (vocab + one-row totals) - the token fact must not shuffle for either."""
    p = plan_text(spark, sf_dir, "corpus_unigram_logprob")
    assert p.count("BroadcastExchange") >= 2


def test_global_window_detector_flags_unlabeled(spark, sf_dir):
    """The plan-audit window census must (a) flag a real unpartitioned
    full-cardinality window, (b) not flag partitioned windows, and
    (c) auto-label rank-limited global windows (WindowGroupLimit)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from plan_audit import window_census
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from nyc_analytics_database_platform_spark.catalog import load

    orders = load(spark, sf_dir, "orders")
    # (a) unguarded global window: running total over everything
    bad = orders.withColumn(
        "rt",
        F.sum("o_totalprice").over(
            Window.orderBy("o_orderkey").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    g, p, gl = window_census(bad._jdf.queryExecution().executedPlan().toString())
    assert (g, p, gl) == (1, 0, 0), (g, p, gl)
    # (b) partitioned window: not global
    ok = orders.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderkey")
        ),
    )
    g, p, gl = window_census(ok._jdf.queryExecution().executedPlan().toString())
    assert (g, p, gl) == (0, 1, 0), (g, p, gl)
    # (c) global rank-filter: Spark caps the window input with
    # TakeOrderedAndProject/GlobalLimit (LimitPushDownThroughWindow) -
    # the census must see the guard and count the window as bounded
    lim = (
        orders.withColumn(
            "rk", F.row_number().over(Window.orderBy("o_orderkey"))
        ).filter(F.col("rk") <= 5)
    )
    g, p, gl = window_census(lim._jdf.queryExecution().executedPlan().toString())
    assert g == 1 and gl >= 1, (g, p, gl)


def test_registry_has_no_unlabeled_global_windows(spark, sf_dir):
    """Every registered batch query's executed plan must have zero
    unguarded, un-audited global windows — the enforcement the round-6
    verdict asked for (new queries must either compile their global
    window to WindowGroupLimit or be listed in WINDOW_OK with a
    justification)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from plan_audit import WINDOW_OK, window_census

    offenders = []
    for name, spec in sorted(registry.all_specs().items()):
        if name.startswith("stream_"):
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        g, _p, gl = window_census(plan)
        if g > gl and name not in WINDOW_OK:
            offenders.append((name, g, gl))
        # clear_engine_state also drops RDD-layer localCheckpoint blocks
        # (ranked_by_range's pinned shard layouts) that clearCache leaves
        from nyc_analytics_database_platform_spark.catalog import (
            clear_engine_state,
        )

        clear_engine_state(spark)
    assert not offenders, offenders
