"""The raw-SQL entry point: catalog tables usable from plain Spark SQL."""

from __future__ import annotations

from nyc_analytics_database_platform_spark.catalog import load, sql


def test_sql_over_catalog_views(spark, sf_dir):
    df = sql(
        spark,
        sf_dir,
        """
        SELECT n.n_name, COUNT(*) AS c
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """,
    )
    rows = df.collect()
    assert len(rows) == load(spark, sf_dir, "nation").count()
    assert sum(r["c"] for r in rows) == load(spark, sf_dir, "orders").count()


def test_sql_sees_events_normalization(spark, sf_dir):
    # the view carries the nanos->micros normalized timestamp
    df = sql(spark, sf_dir, "SELECT MIN(ts) AS lo FROM events")
    assert df.collect()[0]["lo"].year == 2024
