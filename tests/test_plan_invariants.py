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
