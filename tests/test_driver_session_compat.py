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


@pytest.mark.parametrize(
    "name",
    [
        "asof_join_purchase_last_click",  # events: nanos + date_format
        "stream_session_windows",  # events: session windows + epoch
        "json_extract_event_props",  # events: JSON
        "grouped_map_minmax_scale",  # events + applyInPandas
        "interval_join_click_counts",  # events interval join
    ],
)
def test_events_queries_under_driver_session(driver_like_spark, sf_dir, name):
    df = entrymod.queries()[name](driver_like_spark, sf_dir)
    assert len(df.collect()) > 0
