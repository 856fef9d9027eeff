"""Semantic tests: Misra-Gries heavy hitters (superset guarantee, exactness
under pruning pressure) and the Spark-4 SQL surfaces (recursive CTE BFS,
correlated LATERAL top-k, unpivot reshape)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.operators.sketches import (
    heavy_hitters,
    misra_gries_candidates,
)


def _skewed_df(spark, n_parts=4):
    # One 60% hitter, one 20% hitter, long unique tail: the MG summary must
    # evict tail values (capacity << distinct count) yet keep both hitters.
    rows = [(0,)] * 600 + [(1,)] * 200 + [(i,) for i in range(100, 300)]
    return spark.createDataFrame(rows, "v long").repartition(n_parts)


def test_mg_candidates_superset_and_bounded(spark):
    df = _skewed_df(spark)
    capacity = 10
    cands = {r["v"] for r in misra_gries_candidates(df, "v", capacity).collect()}
    counts = Counter(r["v"] for r in df.collect())
    n = sum(counts.values())
    must_keep = {v for v, c in counts.items() if c > n / capacity}
    assert must_keep <= cands  # the MG guarantee
    assert len(cands) <= capacity * df.rdd.getNumPartitions()
    assert len(cands) < len(counts)  # pruning actually happened


def test_heavy_hitters_exact_under_pruning(spark):
    df = _skewed_df(spark)
    got = {
        r["v"]: r["n_rows"]
        for r in heavy_hitters(df, "v", phi=0.1, capacity=10).collect()
    }
    counts = Counter(r["v"] for r in df.collect())
    n = sum(counts.values())
    want = {v: c for v, c in counts.items() if c > n * 0.1}
    assert got == want  # exact counts, exact membership


def test_heavy_hitters_capacity_guard(spark):
    df = _skewed_df(spark)
    try:
        heavy_hitters(df, "v", phi=0.5, capacity=1)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("capacity below 1/phi must be rejected")


def test_recursive_reach_bfs_invariants(spark, sf_dir):
    from nyc_analytics_database_platform_spark.queries.parity_sql_recursive import (
        sql_recursive_trade_reach,
    )

    rows = sql_recursive_trade_reach(spark, sf_dir).collect()
    hops = {r["nationkey"]: r["min_hops"] for r in rows}
    assert hops[6] == 0  # seed at distance zero
    assert len(hops) == len(rows)  # one row per reached nation
    assert all(0 <= h <= 3 for h in hops.values())  # depth guard respected


def test_lateral_top2_per_group(spark, sf_dir):
    from nyc_analytics_database_platform_spark.queries.parity_sql_recursive import (
        sql_lateral_top2_customers,
    )

    rows = sql_lateral_top2_customers(spark, sf_dir).collect()
    per_nation: dict[str, list[float]] = {}
    for r in rows:
        per_nation.setdefault(r["nation"], []).append(r["acctbal"])
    for bals in per_nation.values():
        assert len(bals) <= 2
        assert bals == sorted(bals, reverse=True)


def test_unpivot_shape_and_no_shuffle(spark, sf_dir):
    from nyc_analytics_database_platform_spark.queries.parity_misc import (
        unpivot_nation_metrics,
    )

    df = unpivot_nation_metrics(spark, sf_dir)
    rows = df.collect()
    n_nations = df.select("n_name").distinct().count()
    assert len(rows) == 3 * n_nations  # rows x metrics, nothing dropped
    assert {r["metric"] for r in rows} == {
        "customer_balance",
        "n_customers",
        "n_suppliers",
    }
    # the reshape itself is an Expand, not an exchange
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan


def test_lateral_plan_decorrelates_to_window_group_limit(spark, sf_dir):
    from nyc_analytics_database_platform_spark.queries.parity_sql_recursive import (
        sql_lateral_top2_customers,
    )

    plan = (
        sql_lateral_top2_customers(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Catalyst must rewrite the correlated LATERAL LIMIT into the rank-based
    # top-k (WindowGroupLimit), not a per-outer-row nested loop.
    assert "WindowGroupLimit" in plan
    assert "NestedLoop" not in plan


def test_recursive_plan_uses_union_loop(spark, sf_dir):
    from nyc_analytics_database_platform_spark.queries.parity_sql_recursive import (
        sql_recursive_trade_reach,
    )

    plan = (
        sql_recursive_trade_reach(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "UnionLoop" in plan  # native recursive execution, not a manual unroll


def test_bloom_screen_exact_and_prunes(spark):
    from nyc_analytics_database_platform_spark.operators.sketches import (
        bloom_screen_new,
    )

    hist = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(500)], "digest string"
    )
    # new batch: 100 known dups + 200 genuinely new values
    new = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(100)]
        + [(1000 + i, f"new-{i}") for i in range(200)],
        "id long, digest string",
    )
    want = {1000 + i for i in range(200)}
    got = {r["id"] for r in bloom_screen_new(new, hist, "digest").collect()}
    assert got == want  # exact: all new kept, all dups dropped
    # tiny filter -> every probe collides -> still exact via the verify join
    got_tiny = {
        r["id"]
        for r in bloom_screen_new(new, hist, "digest", m_bits=64).collect()
    }
    assert got_tiny == want


def test_bucketed_running_sum_equals_global_window(spark):
    from pyspark.sql import Window

    from nyc_analytics_database_platform_spark.operators.prefixsum import (
        bucketed_running_sum,
    )

    df = (
        spark.range(2000)
        .select(
            F.md5(F.col("id").cast("string")).alias("k"),
            (F.col("id") % 37 + 1).alias("v"),
        )
        .repartition(8)
    )
    got = {
        r["k"]: r["running_total"]
        for r in bucketed_running_sum(df, "k", "v").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["k"]: r["rt"]
        for r in df.withColumn("rt", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_bucketed_running_sum_no_single_partition_window(spark):
    """The point of the operator: the window partitions by bucket, so the
    physical plan must contain a partitioned Window (hashpartitioning on
    the bucket), never the single-partition global-order exchange."""
    from nyc_analytics_database_platform_spark.operators.prefixsum import (
        bucketed_running_sum,
    )

    df = spark.range(100).select(
        F.md5(F.col("id").cast("string")).alias("k"), F.lit(1).alias("v")
    )
    plan = (
        bucketed_running_sum(df, "k", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_ivf_persisted_probe_uses_dynamic_partition_pruning(spark, sf_dir):
    """The persisted-cell search must prune at the FILE level: the probed
    label arrives as a runtime broadcast, so the cells scan has to carry a
    dynamicpruningexpression partition filter (reads one label=N dir)."""
    from nyc_analytics_database_platform_spark.queries.llm_ivf import (
        ivf_persisted_probe_top5,
    )

    plan = (
        ivf_persisted_probe_top5(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruningexpression" in plan


def test_blocked_fuzzy_join_is_hash_join(spark, sf_dir):
    """The blocking key must carry the join: an equi hash join on the
    prefix, never a cartesian/nested-loop over name pairs."""
    from nyc_analytics_database_platform_spark.queries.parity_analytics import (
        fuzzy_customer_name_pairs,
    )

    plan = (
        fuzzy_customer_name_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cohort_matrix_join_is_hash_join(spark, sf_dir):
    from nyc_analytics_database_platform_spark.queries.parity_analytics import (
        cohort_retention_matrix,
    )

    plan = (
        cohort_retention_matrix(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashJoin" in plan
    assert "CartesianProduct" not in plan
