"""Statistical summary operators: grouped mode with deterministic
tie-breaks and a chi-square independence test over a contingency table -
the profiling/monitoring companions to drift_psi_value_buckets (PSI) and
profile_orders_columns (ANALYZE stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register


@register(
    "mode_event_type_per_user",
    oracle="""
        WITH counts AS (
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY user_id, event_type
        ),
        ranked AS (
            SELECT user_id, event_type, cnt,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY cnt DESC, event_type) AS rn
            FROM counts
        )
        SELECT user_id, event_type AS mode_type, cnt AS mode_count
        FROM ranked WHERE rn = 1
        ORDER BY user_id
    """,
    tags=("A-ext", "stats"),
)
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mode (most frequent event_type per user) with a DETERMINISTIC
    tie-break (highest count, then lexicographic type) - the categorical
    summary statistic SQL's MODE() leaves tie-ordering undefined for, which
    would be driver-hash-unstable across engines.

    Scale shape: pre-aggregate to (user, type) counts first (map-side
    combine collapses the fact), then a per-user WindowGroupLimit pass over
    a frame whose size is bounded by |users| x |event types|. No raw-event
    window."""
    counts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy("user_id")
    )


@register(
    "chi2_priority_vs_status",
    oracle="""
        WITH cells AS (
            SELECT o_orderpriority AS p, o_orderstatus AS s, COUNT(*) AS o
            FROM orders GROUP BY p, s
        ),
        rows_t AS (SELECT p, SUM(o) AS rt FROM cells GROUP BY p),
        cols_t AS (SELECT s, SUM(o) AS ct FROM cells GROUP BY s),
        n AS (SELECT SUM(o) AS n FROM cells)
        SELECT round(SUM(
                   (c.o - r.rt * ct.ct / CAST(n.n AS DOUBLE))
                   * (c.o - r.rt * ct.ct / CAST(n.n AS DOUBLE))
                   / (r.rt * ct.ct / CAST(n.n AS DOUBLE))
               ), 4) AS chi2,
               CAST((COUNT(DISTINCT c.p) - 1) * (COUNT(DISTINCT c.s) - 1)
                    AS BIGINT) AS dof,
               MAX(n.n) AS n
        FROM cells c
        JOIN rows_t r ON c.p = r.p
        JOIN cols_t ct ON c.s = ct.s
        CROSS JOIN n
    """,
    tags=("A-ext", "stats"),
)
def chi2_priority_vs_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order priority and order
    status: contingency-table cells, marginals, and the test statistic in
    one declarative plan - the distribution-shift / A-B monitoring primitive
    (PSI's categorical sibling).

    Scale shape: ONE shuffle builds the (p, s) cells from the fact; every
    later frame (marginals, N) is derived from the tiny cell table and
    broadcast back onto it. The statistic's integer cell counts make the
    double arithmetic engine-deterministic to well under the rounded 4
    decimals."""
    cells = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderstatus").alias("s"),
        )
        .agg(F.count("*").alias("o"))
        .cache()
    )
    rows_t = cells.groupBy("p").agg(F.sum("o").alias("rt"))
    cols_t = cells.groupBy("s").agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o").alias("n"))
    e = F.col("rt") * F.col("ct") / F.col("n").cast("double")
    return (
        cells.join(F.broadcast(rows_t), "p")
        .join(F.broadcast(cols_t), "s")
        .crossJoin(F.broadcast(n))
        .agg(
            F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4).alias(
                "chi2"
            ),
            (
                (F.count_distinct(F.col("p")) - 1)
                * (F.count_distinct(F.col("s")) - 1)
            ).alias("dof"),
            F.max("n").alias("n"),
        )
    )
