"""Join parity queries: semi/anti, range-band, as-of (SURVEY.md section 2.3 -
the reference has only inner equi-joins; these complete the engine surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.functions.numeric import ORACLE_SUM, exact_sum
from nyc_analytics_database_platform_spark.operators.joins import (
    asof_join,
    maybe_salted_join,
    range_band_join,
)
from nyc_analytics_database_platform_spark.registry import register


@register(
    "semi_join_active_customers",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01'
        )
        ORDER BY c_custkey
    """,
    tags=("J-ext",),
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: customers with a recent order."""
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "anti_join_dormant_customers",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01'
        )
        ORDER BY c_custkey
    """,
    tags=("J-ext",),
)
def anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: customers with no recent order."""
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_BANDS = [
    ("budget", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("premium", 150_000.0, 300_000.0),
    ("luxury", 300_000.0, 1e12),
]


@register(
    "range_join_price_bands",
    oracle="""
        WITH bands(band, lo, hi) AS (VALUES
            ('budget',  CAST(0 AS DOUBLE),      CAST(50000 AS DOUBLE)),
            ('mid',     CAST(50000 AS DOUBLE),  CAST(150000 AS DOUBLE)),
            ('premium', CAST(150000 AS DOUBLE), CAST(300000 AS DOUBLE)),
            ('luxury',  CAST(300000 AS DOUBLE), CAST(1e12 AS DOUBLE))
        )
        SELECT b.band, COUNT(*) AS num_orders, {rev} AS revenue
        FROM orders o
        JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.band
        ORDER BY band
    """.format(rev=ORACLE_SUM.format(col="o.o_totalprice")),
    tags=("J-ext",),
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny broadcast band table."""
    orders = load(spark, sf_dir, "orders")
    schema = T.StructType(
        [
            T.StructField("band", T.StringType()),
            T.StructField("lo", T.DoubleType()),
            T.StructField("hi", T.DoubleType()),
        ]
    )
    bands = spark.createDataFrame(_BANDS, schema)
    return (
        range_band_join(orders, bands, F.col("o_totalprice"))
        .groupBy("band")
        .agg(
            F.count("*").alias("num_orders"),
            exact_sum("o_totalprice").alias("revenue"),
        )
        .orderBy("band")
    )


@register(
    "asof_join_purchase_last_click",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    tags=("J-ext", "asof"),
    bench=True,
)
def asof_join_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the latest click by the same user
    at or before it (DuckDB's native ASOF JOIN is the oracle).

    Spark has no as-of join; this uses the union + sorted-window
    last(ignorenulls) plan from operators/joins.py - one shuffle on user_id,
    no row multiplication (scales to arbitrarily many events per user).
    """
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", value_cols=["ts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_ts"),
    ).orderBy("event_id")


@register(
    "salted_join_segment_revenue",
    oracle=f"""
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {ORACLE_SUM.format(col="o.o_totalprice")} AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    tags=("J-ext", "skew"),
)
def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew path attested end-to-end: orders x customer through
    operators/joins.salted_join (deterministic salt on o_orderkey splits any
    hot customer across 8 reducers; the dim side replicates once per salt),
    then revenue per segment. The oracle is the PLAIN join - a hash match
    proves salting changes only the shuffle distribution, never the result
    set. In production AQE's skew split handles moderate skew; explicit
    salting is for the pathological keys AQE can't split (single-key
    hotspots in a broadcast-ineligible join)."""
    from nyc_analytics_database_platform_spark.operators.joins import salted_join

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        cust,
        on="c_custkey",
        salt_by="o_orderkey",
    )
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum("o_totalprice").alias("revenue"),
        )
        .orderBy("segment")
    )


@register(
    "nullsafe_join_event_props",
    oracle="""
        WITH keyed AS (
            SELECT event_id, event_type,
                   CASE WHEN event_type = 'view' THEN NULL
                        ELSE CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
                   END AS bucket
            FROM events
        ),
        dim AS (
            SELECT DISTINCT bucket FROM keyed WHERE event_type = 'purchase'
            UNION
            SELECT NULL AS bucket
        )
        SELECT k.bucket, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM keyed k
        JOIN dim d ON k.bucket IS NOT DISTINCT FROM d.bucket
        GROUP BY k.bucket
        ORDER BY k.bucket NULLS FIRST
    """,
    tags=("J-ext", "null-semantics"),
)
def nullsafe_join_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the derived
    JSON bucket key is deliberately NULL for 'view' events (modeling a
    missing payload field), and the dim side contains a NULL bucket - a plain equi-join would drop
    every NULL-keyed event; the null-safe join matches them. Catalyst still
    plans a hash join (null-safe equality is hashable), so the scale shape
    is identical to the equi-join. Oracle uses DuckDB's
    IS NOT DISTINCT FROM."""
    events = load(spark, sf_dir, "events")
    keyed = events.select(
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") != "view",
            F.get_json_object("props", "$.k").cast("int") % 10,
        ).alias("bucket"),
    )
    dim = (
        keyed.filter(F.col("event_type") == "purchase")
        .select("bucket")
        .distinct()
        .unionByName(
            events.sparkSession.createDataFrame([(None,)], "bucket int")
        )
        .distinct()
    )
    return (
        keyed.alias("k")
        .join(F.broadcast(dim.alias("d")), F.expr("k.bucket <=> d.bucket"))
        .groupBy("k.bucket")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.col("bucket").asc_nulls_first())
    )


@register(
    "salted_join_priority_revenue",
    oracle="""
        SELECT o.o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e4 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY priority
        ORDER BY priority
    """,
    tags=("J-ext", "skew", "salted"),
)
def salted_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-resistant join path under full attestation: the fact-to-fact
    lineitem x orders join executed through maybe_salted_join with the
    salted branch FORCED (measured_share=1.0), proving the salt/replicate/
    join/drop pipeline is result-identical to the plain equi-join the
    oracle runs. Production consults the measured hot-key share instead
    (join_key_skew_report / key_max_share decides; this testdata is
    near-uniform, so the forced branch is what makes the salted plan
    observable). Revenue uses the exact integer cents x percent discipline;
    salting only redistributes rows, and integer-unit sums are
    order-independent, so redistribution cannot perturb the value."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    rev_c4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("decimal(38,0)")
    joined = maybe_salted_join(
        li, orders, "l_orderkey", salt_by="l_linenumber", measured_share=1.0
    )
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(rev_c4).cast("double") / 1e4).alias("revenue"),
        )
        .orderBy("priority")
    )


@register(
    "asof_forward_next_purchase",
    oracle="""
        SELECT c.event_id,
               c.user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
               strftime(MIN(p.ts), '%Y-%m-%d %H:%M:%S.%f') AS asof_ts
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON p.user_id = c.user_id AND p.ts >= c.ts
        GROUP BY c.event_id, c.user_id, c.ts
        ORDER BY c.event_id
    """,
    tags=("J-ext", "asof"),
)
def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each click, the earliest purchase by the
    same user at or after it - the time-to-conversion primitive
    (click -> next purchase), mirroring asof_join_purchase_last_click's
    backward lookup. The oracle states the semantics as a MIN over the
    future side; the Spark plan is operators/joins.asof_join_forward -
    the same union + sorted-window shape traversed in DESCENDING ts, so
    still one shuffle on user_id and zero row multiplication however many
    events a user has (the oracle's join-then-min is |clicks| x
    |purchases| per user and exists only as the spec)."""
    from nyc_analytics_database_platform_spark.operators.joins import (
        asof_join_forward,
    )

    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    joined = asof_join_forward(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_ts"),
    ).orderBy("event_id")


@register(
    "conversion_latency_stats",
    oracle="""
        WITH nxt AS (
            SELECT c.event_id, c.ts AS cts, MIN(p.ts) AS pts
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON p.user_id = c.user_id AND p.ts >= c.ts
            GROUP BY c.event_id, c.ts
        ),
        lat AS (
            SELECT epoch_us(pts) - epoch_us(cts) AS us
            FROM nxt WHERE pts IS NOT NULL
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nxt) AS n_clicks,
               CAST(COUNT(*) AS BIGINT) AS n_converted,
               round(COUNT(*) / CAST((SELECT COUNT(*) FROM nxt) AS DOUBLE), 6)
                   AS conversion_rate,
               PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY us)
                   AS median_latency_us,
               PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY us)
                   AS p90_latency_us
        FROM lat
    """,
    tags=("J-ext", "asof", "reporting"),
)
def conversion_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase conversion report on top of the forward as-of
    join: conversion rate plus median/p90 time-to-convert - the product
    metric the asof_forward primitive exists for. Latencies stay integer
    MICROSECONDS into the percentile: interpolated percentiles over
    integers below 2^53 are EXACT in IEEE doubles (sums, differences and
    halving all representable), so cross-engine equality needs no
    rounding convention here.

    Scale: the as-of join is the one shuffle (operators/joins
    .asof_join_forward - no row multiplication); the percentile is the
    documented exact-percentile shuffle with approx_percentile as the
    100 TB swap."""
    from nyc_analytics_database_platform_spark.operators.joins import (
        asof_join_forward,
    )

    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    nxt = asof_join_forward(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["ts"],
    ).select(
        "event_id",
        (F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("us"),
    )
    return nxt.agg(
        F.count("*").cast("long").alias("n_clicks"),
        F.count("us").cast("long").alias("n_converted"),
        F.round(
            F.count("us") / F.count("*").cast("double"), 6
        ).alias("conversion_rate"),
        F.percentile("us", 0.5).alias("median_latency_us"),
        F.percentile("us", 0.9).alias("p90_latency_us"),
    )
