"""Property-based checks (SURVEY.md section 5 item 3): algebraic identities
the operators must satisfy on arbitrary inputs, via hypothesis."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.functions.codec import format_key, parse_key
from nyc_analytics_database_platform_spark.operators.timeseries import month_spine
from nyc_analytics_database_platform_spark.operators.topk import topk_other

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),
            st.integers(min_value=0, max_value=99999),
            st.integers(min_value=0, max_value=9999),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_codec_roundtrip_property(spark, triples):
    """format then parse is the identity on (1-digit, <=5-digit, <=4-digit)."""
    df = spark.createDataFrame(triples, "a int, b int, c int")
    coded = df.select(
        "a", "b", "c", format_key(F.col("a"), F.col("b"), F.col("c")).alias("code")
    )
    parsed = parse_key(F.col("code"))
    out = coded.select(
        (parsed[0] == F.col("a")).alias("pa"),
        (parsed[1] == F.col("b")).alias("pb"),
        (parsed[2] == F.col("c")).alias("pc"),
    ).collect()
    assert all(r["pa"] and r["pb"] and r["pc"] for r in out)


@given(
    st.lists(
        st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=3), st.integers(1, 1000)),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_topk_other_preserves_total(spark, rows, k):
    """Top-K + Other is a partition of the input: the value total is
    preserved and at most k+1 output rows exist."""
    df = spark.createDataFrame(rows, "label string, cnt long")
    out = topk_other(df, "label", "cnt", k=k).collect()
    assert sum(r["cnt"] for r in out) == sum(c for _, c in rows)
    assert len(out) <= k + 1
    non_other = [r for r in out if r["label"] != "Other"]
    assert len(non_other) <= k


@given(
    st.lists(
        st.dates(min_value=__import__("datetime").date(1995, 1, 1),
                 max_value=__import__("datetime").date(2005, 12, 31)),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_month_spine_is_dense_and_covering(spark, dates):
    """The spine has exactly (last month - first month + 1) consecutive rows
    and covers every input month."""
    rows = [(d,) for d in dates]
    df = spark.createDataFrame(rows, "d date").select(F.col("d").cast("timestamp").alias("ts"))
    spine = [r["month_ts"] for r in month_spine(df, "ts").orderBy("month_ts").collect()]
    lo, hi = min(dates), max(dates)
    n_months = (hi.year - lo.year) * 12 + (hi.month - lo.month) + 1
    assert len(spine) == n_months
    months = {(m.year, m.month) for m in spine}
    assert {(d.year, d.month) for d in dates} <= months
    # consecutive
    for a, b in zip(spine, spine[1:]):
        assert (b.year - a.year) * 12 + (b.month - a.month) == 1


def test_summary_invariants(spark, sf_dir):
    """active <= total; median within [min, max] for every summarized key."""
    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.plans.summary import customer_summary

    out = customer_summary(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    ).collect()
    assert out
    for r in out:
        assert r["active_orders"] <= r["total_orders"]
        if r["total_orders"] > 0:
            assert r["min_price"] <= r["median_price"] <= r["max_price"]
