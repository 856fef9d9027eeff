"""The grading driver runs entry()/queries() with ITS OWN SparkSession -
plain builder, none of session.py's tuning. Every registered query must
work under such a session (the events nanos-timestamp conf in particular
is self-provisioned by catalog.load)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def driver_like_spark(spark):
    """A session resembling the driver's: new session state (fresh conf),
    no legacy/nanos settings."""
    s = spark.newSession()
    for key in (
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.autoBroadcastJoinThreshold",
    ):
        try:
            s.conf.unset(key)
        except Exception:
            pass
    return s


def test_entry_under_driver_session(driver_like_spark):
    assert len(entrymod.entry(driver_like_spark).collect()) > 0


# legitimately empty at the sf0.001 test fixture (the sf0.01 driver gate
# sees rows): the compat check there is runs-clean + stable schema.
_MAY_BE_EMPTY = {"kcore_cosupply_members"}


@pytest.mark.parametrize(
    "name",
    [
        "asof_join_purchase_last_click",  # events: nanos + date_format
        "stream_session_windows",  # events: session windows + epoch
        "json_extract_event_props",  # events: JSON
        "grouped_map_minmax_scale",  # events + applyInPandas
        "interval_join_click_counts",  # events interval join
        "stream_left_outer_join_executed",  # r5: real drain + outer state
        "stream_foreachbatch_upsert_executed",  # r5: foreachBatch sink
        "cms_heavy_users_estimates",  # r5: mapInPandas MG + conv()
        "asof_forward_next_purchase",  # r5: events + descending window
        "unigram_viterbi_segment",  # r5: map broadcast + aggregate fold
        "spatial_dbscan_clusters",  # r5: localCheckpoint CC loop
        "kmv_theta_set_estimates",  # r5: conv() hash + TakeOrdered sketches
        "kcore_cosupply_members",  # r5: localCheckpoint peel loop
        "conversion_latency_stats",  # r5: events nanos + forward as-of
        "stream_spatial_facility_counts",  # r5: executed stream + broadcast array
        "user_activity_streaks",  # r6: events nanos + date arithmetic
        "multitouch_attribution_position",  # r6: events interval join + div
        "kaplan_meier_reorder",  # r6: date buckets + ln pinning
        "session_top_paths",  # r6: events unix_micros gap + leads
        "epoch_shuffle_plan",  # r6: md5 conv() hash + windows
        "embedding_pca_top_component",  # r6: localCheckpoint + decimal pins
        "revenue_mom_yoy",  # r6: date_trunc + date_format rendering
        "inventory_capped_running_balance",  # r6: scan-rewrite windows
    ],
)
def test_events_queries_under_driver_session(driver_like_spark, sf_dir, name):
    df = entrymod.queries()[name](driver_like_spark, sf_dir)
    rows = df.collect()
    if name in _MAY_BE_EMPTY:
        assert df.columns
    else:
        assert len(rows) > 0


def test_catalog_load_pins_utc_for_any_table(driver_like_spark, sf_dir):
    """ENGINE CONTRACT: every catalog load pins the session to UTC (all
    stored timestamps are naive micros read as LTZ), so date rendering is
    host-timezone-independent - not just for events, for orders too."""
    from nyc_analytics_database_platform_spark.catalog import load

    driver_like_spark.conf.set(
        "spark.sql.session.timeZone", "America/New_York"
    )
    try:
        df = load(driver_like_spark, sf_dir, "orders")
        assert (
            driver_like_spark.conf.get("spark.sql.session.timeZone") == "UTC"
        )
        from pyspark.sql import functions as F

        first = df.orderBy("o_orderkey").select(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("d")
        ).first()["d"]
        assert first.endswith("00:00:00")  # midnight stays midnight in UTC
    finally:
        driver_like_spark.conf.set("spark.sql.session.timeZone", "UTC")
