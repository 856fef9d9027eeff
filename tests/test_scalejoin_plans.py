"""Plan-shape evidence for the scale-join family (queries/parity_scalejoin.py):
the bucketed join really skips its shuffles, the partitioned join really
prunes at runtime, and the selective dim join really injects a bloom filter.
Value correctness is covered by the registered DuckDB oracles; these tests
pin the PHYSICAL plans the docstrings promise."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.queries.parity_scalejoin import (
    build_bucketed_pair,
    bucketed_join_colocated_revenue,
    dpp_partitioned_month_join,
    runtime_filter_part_revenue,
)


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _simple(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_plan_is_colocated(spark, sf_dir, no_broadcast):
    bo, bc = build_bucketed_pair(spark, sf_dir)
    per_cust = (
        spark.table(bo)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    seg = (
        per_cust.join(
            spark.table(bc).select("c_custkey", "c_mktsegment"),
            per_cust["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )
    plan = _simple(seg)
    assert "SortMergeJoin" in plan
    # the ONLY exchange is the final 5-row segment rollup; the per-customer
    # aggregate and the join itself are bucket-local
    assert plan.count("Exchange") == 1, plan
    fmt = _formatted(seg)
    assert "Bucketed: true" in fmt
    assert "SelectedBucketsCount" in fmt


def test_bucketed_layout_adopted_by_fresh_catalog(spark, sf_dir, no_broadcast):
    """Dropping the catalog entries and rebuilding must take the
    DDL-adoption path (files untouched) and still join without a shuffle -
    the 'new session adopts an existing layout' lifecycle."""
    bo, bc = build_bucketed_pair(spark, sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {bo}")
    spark.sql(f"DROP TABLE IF EXISTS {bc}")
    bo2, bc2 = build_bucketed_pair(spark, sf_dir)
    assert (bo2, bc2) == (bo, bc)
    joined = spark.table(bo2).join(
        spark.table(bc2), F.col("o_custkey") == F.col("c_custkey")
    )
    plan = _simple(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # adopted layout serves the same rows as the unlayouted source
    assert joined.count() == load(spark, sf_dir, "orders").join(
        load(spark, sf_dir, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).count()


def test_bucketed_query_matches_unlayouted_twin(spark, sf_dir):
    got = {
        r["c_mktsegment"]: (r["n_customers"], r["n_orders"], r["spend_cents"])
        for r in bucketed_join_colocated_revenue(spark, sf_dir).collect()
    }
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("spend_cents"),
        )
    )
    want = {
        r["c_mktsegment"]: (r["n_customers"], r["n_orders"], r["spend_cents"])
        for r in per_cust.join(
            load(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            F.sum("spend_cents").alias("spend_cents"),
        )
        .collect()
    }
    assert got == want


def test_dpp_plan_prunes_partitions_at_runtime(spark, sf_dir):
    df = dpp_partitioned_month_join(spark, sf_dir)
    fmt = _formatted(df)
    assert "dynamicpruningexpression" in fmt.lower(), fmt
    # the pruning subquery keys on the partition directory column
    assert "PartitionFilters" in fmt
    # Q1 only: every surviving month is 01/02/03
    months = [r["o_month"] for r in df.collect()]
    assert months and all(m[5:] in ("01", "02", "03") for m in months)


def test_runtime_bloom_filter_injected_when_forced(spark, sf_dir):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = runtime_filter_part_revenue(spark, sf_dir)
        fmt = _formatted(df)
        assert "bloom_filter_agg" in fmt, fmt
        assert "might_contain" in fmt, fmt
        forced = {
            (r["p_brand"], r["n_lines"], r["price_cents"]) for r in df.collect()
        }
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    # the injected filter changes no row
    plain = {
        (r["p_brand"], r["n_lines"], r["price_cents"])
        for r in runtime_filter_part_revenue(spark, sf_dir).collect()
    }
    assert forced == plain


# --- Z-order layout (operators/layout.py + zorder_box_scan_stats) ---------

def _morton_ref(x: int, y: int) -> int:
    """Pure-Python bit-interleave reference for the Spark morton_key."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_reference(spark):
    import random

    from nyc_analytics_database_platform_spark.operators.layout import (
        morton_key,
    )

    rng = random.Random(20260815)
    pts = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(200)]
    pts += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "z", morton_key(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def _candidate_rowgroups(path: str, x_rng=None, t_rng=None):
    """Count parquet row groups whose footer min/max stats intersect the
    probe - exactly the skipping decision the scan makes before reading
    any data pages."""
    import datetime
    import glob

    import pyarrow.parquet as pq

    utc = datetime.timezone.utc

    def aware(v):
        return v.replace(tzinfo=utc) if v.tzinfo is None else v

    tot = cand = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            tot += 1
            hit = True
            if x_rng is not None:
                s = md.row_group(rg).column(sch["o_custkey"]).statistics
                hit = hit and s.min <= x_rng[1] and s.max >= x_rng[0]
            if t_rng is not None:
                s = md.row_group(rg).column(sch["o_orderdate"]).statistics
                hit = hit and (
                    aware(s.min) < t_rng[1] and aware(s.max) >= t_rng[0]
                )
            if hit:
                cand += 1
    return cand, tot


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """The z-order value proposition measured from real parquet footers:
    a single-column sort prunes row groups ONLY on its own column (the
    other dimension interleaves through every row group, candidate
    fraction 100%), while the Morton layout prunes meaningfully on EITHER
    dimension alone and best on the 2-D box. Thresholds sit well inside
    the measured margins (9/16 vs 16/16 at sf0.001)."""
    import datetime

    from nyc_analytics_database_platform_spark.queries.parity_scalejoin import (
        build_zorder_orders,
    )

    utc = datetime.timezone.utc
    x_rng = (40, 59)
    t_rng = (
        datetime.datetime(1998, 1, 1, tzinfo=utc),
        datetime.datetime(1999, 1, 1, tzinfo=utc),
    )

    zpath = build_zorder_orders(spark, sf_dir)

    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        twins = {}
        for name, col in [("bydate", "o_orderdate"), ("bycust", "o_custkey")]:
            p = str(tmp_path / name)
            (
                load(spark, sf_dir, "orders")
                .repartitionByRange(16, col)
                .sortWithinPartitions(col)
                .write.mode("overwrite")
                .option("parquet.block.size", 64 * 1024)
                .parquet(p)
            )
            twins[name] = p
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)

    # single sorts are blind on the other dimension
    c, t = _candidate_rowgroups(twins["bydate"], x_rng=x_rng)
    assert c == t, "date sort should not prune a customer probe"
    c, t = _candidate_rowgroups(twins["bycust"], t_rng=t_rng)
    assert c == t, "customer sort should not prune a date probe"

    # z-order prunes on either dimension alone ...
    cx, tx = _candidate_rowgroups(zpath, x_rng=x_rng)
    ct, tt = _candidate_rowgroups(zpath, t_rng=t_rng)
    assert cx / tx <= 0.75, (cx, tx)
    assert ct / tt <= 0.75, (ct, tt)
    # ... and best on the 2-D box
    cb, tb = _candidate_rowgroups(zpath, x_rng=x_rng, t_rng=t_rng)
    assert cb / tb <= 0.5, (cb, tb)
    assert cb <= min(cx, ct)


def test_zorder_scan_pushes_both_predicates(spark, sf_dir):
    from nyc_analytics_database_platform_spark.queries.parity_scalejoin import (
        zorder_box_scan_stats,
    )

    fmt = _formatted(zorder_box_scan_stats(spark, sf_dir))
    assert "PushedFilters" in fmt
    pushed = [l for l in fmt.splitlines() if "PushedFilters" in l][0]
    assert "o_custkey" in pushed, pushed
    assert "o_orderdate" in pushed, pushed


def test_zorder_query_matches_unlayouted_twin(spark, sf_dir):
    from nyc_analytics_database_platform_spark.queries.parity_scalejoin import (
        zorder_box_scan_stats,
    )

    got = {
        r["o_orderstatus"]: (r["n_orders"], r["key_sum"], r["spend_cents"])
        for r in zorder_box_scan_stats(spark, sf_dir).collect()
    }
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    want = {
        r["o_orderstatus"]: (r["n_orders"], r["key_sum"], r["spend_cents"])
        for r in load(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").between(40, 129)
            & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            F.sum(cents).alias("spend_cents"),
        )
        .collect()
    }
    assert got == want and got


def test_morton_key_equals_zvalue_twin(spark):
    """operators/layout.morton_key (magic-number spread, write path) and
    functions/zorder.zvalue (per-bit aggregate, oracle-expressible) must be
    bit-identical - two renderings of one curve."""
    import random

    from nyc_analytics_database_platform_spark.functions.zorder import zvalue
    from nyc_analytics_database_platform_spark.operators.layout import (
        morton_key,
    )

    rng = random.Random(8)
    pts = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(500)]
    df = spark.createDataFrame(pts, "x long, y long")
    n_diff = df.filter(
        morton_key(F.col("x"), F.col("y")) != zvalue("x", "y")
    ).count()
    assert n_diff == 0


def test_scd2_bucketed_plan_is_exchange_and_sort_free(spark, sf_dir):
    """Round 9: the bucketed PIT twin's whole plan - window, filter,
    project - must contain ZERO Exchange and ZERO Sort nodes: the layout
    (operators/bucketed.py: one file per bucket + SORTED BY spec) carries
    both the partitioning and the ordering the window needs."""
    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        scd2_point_in_time_bucketed,
    )

    df = scd2_point_in_time_bucketed(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert not any(" Sort " in ln for ln in plan.splitlines()), plan
    assert df.count() > 0


def test_sessionize_bucketed_plan_is_exchange_free(spark, sf_dir):
    """Round 9: both sessionize window passes AND the per-session rollup
    run shuffle-free over the (user_id, ts, event_id)-sorted bucket
    layout - the user_id bucketing co-locates (user_id, session_seq)
    grouping too."""
    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        sessionize_stats_bucketed,
    )

    df = sessionize_stats_bucketed(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert not any(" Sort " in ln for ln in plan.splitlines()), plan
    assert df.count() > 0


def test_bucketed_lifecycle_twins_match_generic_forms(spark, sf_dir):
    """The layout twins return the exact rows of their generic (un-layouted)
    counterparts - layout and plan rewrite change no answer."""
    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        scd2_point_in_time_bucketed,
        scd2_point_in_time_join,
        sessionize_event_stats,
        sessionize_stats_bucketed,
    )

    a = sorted(map(tuple, scd2_point_in_time_join(spark, sf_dir).collect()))
    b = sorted(map(tuple, scd2_point_in_time_bucketed(spark, sf_dir).collect()))
    assert a == b and len(a) > 0
    c = sorted(map(tuple, sessionize_event_stats(spark, sf_dir).collect()))
    d = sorted(map(tuple, sessionize_stats_bucketed(spark, sf_dir).collect()))
    assert c == d and len(c) > 0


def test_scd2_generic_is_single_window_no_join(spark, sf_dir):
    """Round 9 rewrite: the generic PIT form is ONE window pass (running
    max-struct over a RANGE frame), no join at all - the interval-join
    formulation cost two Exchanges and two sorts over the same bytes. The
    plan must contain exactly one Exchange, one Sort, and zero Joins."""
    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        scd2_point_in_time_join,
    )

    plan = scd2_point_in_time_join(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan
    n_sorts = sum(1 for ln in plan.splitlines() if " Sort " in ln)
    assert n_sorts == 1, plan


def test_pit_external_facts_union_asof_no_interval_join(spark, sf_dir):
    """The general external-facts as-of form: one equi join maps facts to
    the dimension key (inherent to the problem), but the as-of itself is a
    window, never a range-predicate join - so exactly one Join node and a
    Window over the union'd stream."""
    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        pit_external_facts_asof,
    )

    plan = pit_external_facts_asof(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert len(joins) == 1, plan
    # The one join is the key-mapping equi join on l_orderkey: no
    # non-equi residual range condition.
    assert "o_orderdate" not in joins[0], joins[0]
    assert "Window" in plan, plan
