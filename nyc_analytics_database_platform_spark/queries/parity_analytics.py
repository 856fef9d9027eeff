"""Analytics-surface extensions: multi-percentiles, histogram binning,
correlated-subquery (above-group-average) shape, and event funnel analysis.
All SQL-expressible, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.prefixsum import (
    ntile_from_rank,
    ranked_by_range,
)
from nyc_analytics_database_platform_spark.registry import register


@register(
    "price_percentiles_by_segment",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY o.o_totalprice) AS p25,
               PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY o.o_totalprice) AS p50,
               PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY o.o_totalprice) AS p75,
               PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY o.o_totalprice) AS p95
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY segment
    """,
    tags=("A5", "percentiles"),
)
def price_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full quartile profile per group in one pass - four exact interpolated
    percentiles share a single sort of each group's values."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    g = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
        F.col("c_mktsegment").alias("segment")
    )
    return g.agg(
        F.percentile("o_totalprice", 0.25).alias("p25"),
        F.percentile("o_totalprice", 0.50).alias("p50"),
        F.percentile("o_totalprice", 0.75).alias("p75"),
        F.percentile("o_totalprice", 0.95).alias("p95"),
    ).orderBy("segment")


@register(
    "price_histogram",
    oracle="""
        SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
               CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000 AS bucket_lo,
               COUNT(*) AS num_orders
        FROM orders
        GROUP BY 1, 2
        ORDER BY bucket
    """,
    tags=("A-ext", "histogram"),
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor binning - a single hash aggregate on
    a derived key (the scalable histogram; no sorting, no per-bucket scan)."""
    orders = load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("num_orders"))
        .select("bucket", (F.col("bucket") * 50000).alias("bucket_lo"), "num_orders")
        .orderBy("bucket")
    )


@register(
    "customers_above_nation_average",
    oracle="""
        WITH nation_avg AS (
            SELECT c_nationkey,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c_acctbal)
                     AS avg_bal
            FROM customer GROUP BY c_nationkey
        )
        SELECT c.c_custkey, c.c_nationkey, c.c_acctbal, n.avg_bal AS nation_avg_bal
        FROM customer c JOIN nation_avg n ON c.c_nationkey = n.c_nationkey
        WHERE c.c_acctbal > n.avg_bal
        ORDER BY c_custkey
    """,
    tags=("A-ext", "correlated"),
)
def customers_above_nation_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-subquery shape (balance above the customer's own
    nation's average), decorrelated into aggregate + join - what Catalyst
    does to the subquery formulation anyway, written explicitly. Exact
    decimal mean keeps the comparison engine-stable."""
    cust = load(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
         / F.count("c_acctbal")).alias("avg_bal")
    )
    return (
        cust.join(nation_avg, "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.col("avg_bal").alias("nation_avg_bal"),
        )
        .orderBy("c_custkey")
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
            FROM events GROUP BY user_id
        )
        SELECT COUNT(*) AS n_users,
               CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
               CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                        THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
               CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                             AND first_purchase > first_click
                        THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click
        FROM per_user
    """,
    tags=("events", "funnel"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per-user first-occurrence
    timestamps in one conditional-MIN pass, then stage predicates over the
    ordering. Two aggregations total, no joins, no windows - the shape that
    scales to billions of events."""
    events = load(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    per_user = events.groupBy("user_id").agg(
        first_ts("view").alias("first_view"),
        first_ts("click").alias("first_click"),
        first_ts("purchase").alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    purchased = clicked & (F.col("first_purchase") > F.col("first_click"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(viewed, 1).otherwise(0)).alias("viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).alias("clicked_after_view"),
        F.sum(F.when(purchased, 1).otherwise(0)).alias("purchased_after_click"),
    )


@register(
    "drift_psi_value_buckets",
    oracle="""
        WITH spine AS (SELECT unnest(generate_series(0, 9)) AS bucket),
        e AS (
            SELECT CAST(least(floor(value / 50.0), 9) AS BIGINT) AS bucket,
                   (ts < TIMESTAMP '2024-01-15') AS in_a
            FROM events
        ),
        a AS (SELECT bucket, COUNT(*) AS c FROM e WHERE in_a GROUP BY 1),
        b AS (SELECT bucket, COUNT(*) AS c FROM e WHERE NOT in_a GROUP BY 1),
        tot AS (
            SELECT (SELECT COUNT(*) FROM e WHERE in_a) AS na,
                   (SELECT COUNT(*) FROM e WHERE NOT in_a) AS nb
        )
        SELECT s.bucket,
               coalesce(a.c, 0) AS n_ref,
               coalesce(b.c, 0) AS n_cur,
               round((CAST(coalesce(a.c, 0) + 1 AS DOUBLE) / (na + 10)
                      - CAST(coalesce(b.c, 0) + 1 AS DOUBLE) / (nb + 10))
                     * ln((CAST(coalesce(a.c, 0) + 1 AS DOUBLE) / (na + 10))
                          / (CAST(coalesce(b.c, 0) + 1 AS DOUBLE) / (nb + 10))),
                     6) AS psi_term
        FROM spine s
        LEFT JOIN a ON s.bucket = a.bucket
        LEFT JOIN b ON s.bucket = b.bucket
        CROSS JOIN tot
        ORDER BY s.bucket
    """,
    tags=("drift", "quality", "training-data"),
)
def drift_psi_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report: per-bucket Population Stability Index terms
    for the event `value` distribution, reference period (before Jan 15) vs
    current (after). Laplace-smoothed so empty buckets stay finite; terms are
    emitted per bucket (their sum is the headline PSI) so the oracle
    comparison never depends on cross-engine summation order of ln() values.

    Scale: two grouped counts over one scan + a 10-row spine join — the
    per-bucket aggregate is a single shuffle; the totals are a broadcast
    one-row frame. The drift monitor every training-data refresh runs."""
    events = load(spark, sf_dir, "events")
    e = events.select(
        F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("long").alias("bucket"),
        (F.col("ts") < F.lit("2024-01-15").cast("timestamp")).alias("in_a"),
    )
    a = e.filter("in_a").groupBy("bucket").agg(F.count("*").alias("c_a"))
    b = e.filter("NOT in_a").groupBy("bucket").agg(F.count("*").alias("c_b"))
    tot = e.agg(
        F.sum(F.col("in_a").cast("long")).alias("na"),
        F.sum((~F.col("in_a")).cast("long")).alias("nb"),
    )
    spine = spark.range(10).select(F.col("id").alias("bucket"))
    joined = (
        spine.join(a, "bucket", "left")
        .join(b, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.coalesce("c_a", F.lit(0)).alias("n_ref"),
            F.coalesce("c_b", F.lit(0)).alias("n_cur"),
            ((F.coalesce("c_a", F.lit(0)) + 1).cast("double") / (F.col("na") + 10)).alias("pa"),
            ((F.coalesce("c_b", F.lit(0)) + 1).cast("double") / (F.col("nb") + 10)).alias("pb"),
        )
    )
    return joined.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")), 6).alias(
            "psi_term"
        ),
    ).orderBy("bucket")


@register(
    "ntile_decile_price_bounds",
    oracle="""
        WITH t AS (
            SELECT o_totalprice,
                   NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
            FROM orders
        )
        SELECT decile, COUNT(*) AS n,
               MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        FROM t GROUP BY decile ORDER BY decile
    """,
    tags=("A-ext", "window", "histogram"),
)
def ntile_decile_price_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram via NTILE deciles (the complement of
    price_histogram's equi-WIDTH binning): bucket boundaries adapt to the
    distribution. Deterministic tiebreak on o_orderkey so both engines cut
    identical buckets.

    Scale shape: EXACT deciles with no single-partition sort - the global
    rank comes from operators/prefixsum.ranked_by_range (range shuffle +
    parallel within-shard window + broadcast shard offsets) and the decile
    is the closed-form NTILE arithmetic on that rank, bit-identical to the
    window NTILE the oracle runs."""
    orders = load(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    ranked, n = ranked_by_range(
        orders, [F.asc("o_totalprice"), F.asc("o_orderkey")], "rk"
    )
    return (
        ranked.select(
            "o_totalprice", ntile_from_rank("rk", n, 10).alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("decile")
    )


@register(
    "customer_revenue_share_in_nation",
    oracle="""
        WITH cr AS (
            SELECT c.c_nationkey, o.o_custkey,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev_dec
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        shares AS (
            SELECT c_nationkey AS nationkey, o_custkey AS custkey, revenue,
                   round(CAST(rev_dec / SUM(rev_dec) OVER (PARTITION BY c_nationkey)
                              AS DOUBLE), 6) AS nation_share,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY rev_dec DESC, o_custkey) AS rn
            FROM cr
        )
        SELECT nationkey, custkey, revenue, nation_share
        FROM shares WHERE rn <= 3
        ORDER BY nationkey, custkey
    """,
    tags=("A-ext", "window", "share"),
)
def customer_revenue_share_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-group analysis: each customer's fraction of their nation's
    revenue (windowed sum over a grouped aggregate - the decorrelated form
    of a correlated scalar subquery), top-3 per nation. The share divides
    DECIMALS (order-independent) and casts the quotient once, so both
    engines round identically.

    Scale: the window reads the already-aggregated per-customer frame
    (|customers| rows, not |orders|); WindowGroupLimit bounds the rank."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cr = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_dec"))
    )
    wn = Window.partitionBy("c_nationkey")
    wr = Window.partitionBy("c_nationkey").orderBy(
        F.col("rev_dec").desc(), "o_custkey"
    )
    return (
        cr.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("rev_dec").cast("double").alias("revenue"),
            F.round(
                (F.col("rev_dec") / F.sum("rev_dec").over(wn)).cast("double"), 6
            ).alias("nation_share"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .select("nationkey", "custkey", "revenue", "nation_share")
        .orderBy("nationkey", "custkey")
    )


@register(
    "winsorized_price_by_segment",
    oracle="""
        WITH bounds AS (
            SELECT c.c_mktsegment AS segment,
                   PERCENTILE_CONT(0.05) WITHIN GROUP (ORDER BY o.o_totalprice) AS lo,
                   PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY o.o_totalprice) AS hi
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        )
        SELECT b.segment,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN o.o_totalprice < b.lo THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clipped_lo,
               CAST(SUM(CASE WHEN o.o_totalprice > b.hi THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clipped_hi,
               CAST(SUM(CAST(least(greatest(o.o_totalprice, b.lo), b.hi)
                             AS DECIMAL(18,4))) AS DOUBLE) AS winsorized_sum
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN bounds b ON b.segment = c.c_mktsegment
        GROUP BY b.segment
        ORDER BY b.segment
    """,
    tags=("A-ext", "preprocessing", "training-data"),
)
def winsorized_price_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature preprocessing: winsorize order prices to each segment's
    [p05, p95] band (outlier clipping before normalization/training) and
    report clip counts + the decimal-exact clipped sum.

    Scale: percentile bounds come from one grouped aggregate over segments
    (tiny), broadcast back into the scan - the fact table is read once per
    pass; exact percentiles are the oracle-scale semantics, approx_percentile
    is the documented 100 TB swap."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    bounds = joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.95)").alias("hi"),
    )
    clipped = joined.join(
        F.broadcast(bounds), F.col("c_mktsegment") == F.col("segment")
    ).select(
        "segment",
        "o_totalprice",
        F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")).alias("w"),
        (F.col("o_totalprice") < F.col("lo")).cast("long").alias("clip_lo"),
        (F.col("o_totalprice") > F.col("hi")).cast("long").alias("clip_hi"),
    )
    return (
        clipped.groupBy("segment")
        .agg(
            F.count("*").alias("n"),
            F.sum("clip_lo").alias("n_clipped_lo"),
            F.sum("clip_hi").alias("n_clipped_hi"),
            F.sum(F.col("w").cast("decimal(18,4)")).cast("double").alias("winsorized_sum"),
        )
        .orderBy("segment")
    )


@register(
    "cohort_retention_matrix",
    oracle="""
        WITH activity AS (
            SELECT user_id, event_type,
                   CAST(datediff('day', DATE '1970-01-01', ts) AS BIGINT)
                       AS didx
            FROM events
        ),
        cohorts AS (
            SELECT user_id, MIN(didx) AS cohort_idx
            FROM activity WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        joined AS (
            SELECT c.cohort_idx, a.didx - c.cohort_idx AS offset_d, a.user_id
            FROM activity a JOIN cohorts c ON a.user_id = c.user_id
            WHERE a.didx - c.cohort_idx BETWEEN 0 AND 6
        )
        SELECT cohort_idx, offset_d,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM joined
        GROUP BY cohort_idx, offset_d
        ORDER BY cohort_idx, offset_d
    """,
    tags=("analytics", "cohort", "A-ext"),
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-purchase DAY, counted as
    active on each of the following 7 days (the events table spans one
    month, so daily grain gives a real matrix). Days are integer epoch-day
    indexes - exact arithmetic, no date-diff convention drift. Shape: two aggregations and one join on user_id - the
    self-join-free retention matrix; at 100 TB both aggs and the join
    shuffle on the same user_id key, so AQE coalesces them into one
    exchange chain."""
    events = load(spark, sf_dir, "events")
    activity = events.select(
        "user_id",
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("didx"),
    )
    cohorts = (
        activity.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("didx").alias("cohort_idx"))
    )
    joined = (
        activity.join(cohorts, "user_id")
        .withColumn("offset_d", F.col("didx") - F.col("cohort_idx"))
        .filter(F.col("offset_d").between(0, 6))
    )
    return (
        joined.groupBy("cohort_idx", "offset_d")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_idx", "offset_d")
    )


@register(
    "fuzzy_customer_name_pairs",
    oracle="""
        WITH named AS (SELECT c_custkey, c_name FROM customer),
        blocked AS (
            SELECT substr(c_name, 1, 16) AS block, c_custkey, c_name
            FROM named
        ),
        pairs AS (
            SELECT a.block, a.c_name AS name_a, b.c_name AS name_b
            FROM blocked a
            JOIN blocked b
              ON a.block = b.block AND a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        )
        SELECT block,
               CAST(COUNT(*) AS BIGINT) AS n_close_pairs,
               CAST(COUNT(DISTINCT name_a) AS BIGINT) AS n_left_names
        FROM pairs
        GROUP BY block
        ORDER BY block
    """,
    tags=("entity-resolution", "fuzzy-join", "J-ext"),
)
def fuzzy_customer_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join (the record-linkage shape): a cheap BLOCKING
    key (16-char name prefix) partitions the quadratic candidate space into
    within-block groups, then the expensive predicate (levenshtein <= 1)
    runs only inside blocks - the same prune-then-verify discipline as the
    LSH dedup family, with the standard blocking trade-off that cross-block
    near-matches are out of scope by design. The equi-join on the block key
    is a plain hash join; block size bounds the quadratic term (~100 names
    here), exactly how it must at 100 TB."""
    named = load(spark, sf_dir, "customer").select(
        F.substring("c_name", 1, 16).alias("block"), "c_custkey", "c_name"
    )
    a, b = named.alias("a"), named.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).filter(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
    return (
        pairs.groupBy(F.col("a.block").alias("block"))
        .agg(
            F.count("*").alias("n_close_pairs"),
            F.countDistinct(F.col("a.c_name")).alias("n_left_names"),
        )
        .orderBy("block")
    )


_ATTR_WINDOW_US = 7 * 86400 * 1_000_000  # 7-day attribution lookback (µs)


@register(
    "attribution_last_touch_revenue",
    oracle=f"""
        WITH ev AS (
            SELECT event_id, user_id, epoch_us(ts) AS es, event_type, value,
                   event_type IN ('view', 'click', 'signup') AS is_touch
            FROM events
        ),
        carried AS (
            SELECT event_id, user_id, es, event_type, value,
                   last_value(CASE WHEN is_touch THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY es, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS touch_type,
                   last_value(CASE WHEN is_touch THEN es END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY es, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS touch_es
            FROM ev
        )
        SELECT CASE WHEN touch_type IS NULL
                         OR es - touch_es > {_ATTR_WINDOW_US} THEN 'direct'
                    ELSE touch_type END AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS attributed_value
        FROM carried
        WHERE event_type = 'purchase'
        GROUP BY 1
        ORDER BY channel
    """,
    tags=("analytics", "W", "attribution"),
)
def attribution_last_touch_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's value goes to the
    channel (view/click/signup) of the user's most recent PRECEDING touch
    within a 7-day lookback; purchases with no qualifying touch bucket to
    'direct'. One per-user IGNORE-NULLS carry-forward window (the
    sessionization shape: partitioned by user, totally ordered by
    (epoch-microseconds, event_id) so sub-second ties order identically
    in both engines — whole-second epoch() truncation would let same-user
    same-second events order differently) followed by a 4-group
    aggregate; value sums go through DECIMAL so the per-channel totals are
    order-independent and cross-engine exact. At 100 TB this is one
    shuffle on user_id - the same key sessionize_event_stats already
    partitions by."""
    ev = load(spark, sf_dir, "events", parallel=True).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("es"),
        "event_type",
        "value",
        F.col("event_type").isin("view", "click", "signup").alias("is_touch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.select(
        "event_type",
        "value",
        "es",
        F.last(F.when(F.col("is_touch"), F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(F.col("is_touch"), F.col("es")), ignorenulls=True)
        .over(w)
        .alias("touch_es"),
    )
    channel = F.when(
        F.col("touch_type").isNull()
        | ((F.col("es") - F.col("touch_es")) > _ATTR_WINDOW_US),
        F.lit("direct"),
    ).otherwise(F.col("touch_type"))
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(channel.alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("channel")
    )


@register(
    "events_user_zscore_anomalies",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, value
            FROM events WHERE event_type = 'purchase'
        ),
        stats AS (
            SELECT user_id,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                       AS mu,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))
                            * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sumsq
            FROM p GROUP BY user_id
        ),
        scored AS (
            SELECT p.event_id, p.user_id, p.value,
                   (p.value - s.mu)
                       / sqrt((s.sumsq - s.n * s.mu * s.mu) / (s.n - 1)) AS z
            FROM p JOIN stats s USING (user_id)
            WHERE s.n >= 3 AND s.sumsq - s.n * s.mu * s.mu > 1e-12
        )
        SELECT event_id, user_id,
               round(value, 6) AS value,
               round(z, 4) AS zscore
        FROM scored
        WHERE abs(round(z, 4)) > 2.0
        ORDER BY event_id
    """,
    tags=("analytics", "stats", "monitoring"),
)
def events_user_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user purchase-value anomalies: events more than 2 sample standard
    deviations from the user's own mean (users with >= 3 purchases and
    non-degenerate variance). The moments are DECIMAL sums - exact and
    order-independent - converted to double once, so mu and sigma are
    bit-identical cross-engine and the z threshold compares the ROUNDED
    z on both sides (same rounded-cut discipline as quality_model_scores).
    One shuffle on user_id for the moment aggregate; the scoring join
    broadcasts per-user stats back (narrow at any scale since stats are
    one row per user)."""
    p = (
        load(spark, sf_dir, "events", parallel=True)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    dec = F.col("value").cast("decimal(18,6)")
    stats = p.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.sum(dec).cast("double") / F.count("*")).alias("mu"),
        F.sum(dec * dec).cast("double").alias("sumsq"),
    )
    var = (F.col("sumsq") - F.col("n") * F.col("mu") * F.col("mu")) / (
        F.col("n") - 1
    )
    z = (F.col("value") - F.col("mu")) / F.sqrt(var)
    return (
        p.join(stats, "user_id")
        .filter(
            (F.col("n") >= 3)
            & (F.col("sumsq") - F.col("n") * F.col("mu") * F.col("mu") > 1e-12)
        )
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 2.0)
        .orderBy("event_id")
    )


@register(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
        ORDER BY from_type, to_type
    """,
    tags=("analytics", "W", "sequence"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event-type transition matrix (the Markov/Sankey input): for each
    user's totally-ordered event sequence, count every adjacent
    (from_type, to_type) pair. One lead() window partitioned by user -
    the sessionization shuffle - then a 25-cell aggregate; at 100 TB the
    matrix side is constant-size, so this is one user_id shuffle plus a
    map-side-combinable count."""
    ev = load(spark, sf_dir, "events", parallel=True)
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


@register(
    "twap_user_value",
    oracle="""
        WITH seq AS (
            SELECT user_id, value, epoch_us(ts) AS us,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS next_us
            FROM events
        ),
        spans AS (
            SELECT user_id,
                   SUM(CAST(value AS DECIMAL(18,6)) * (next_us - us))
                       AS weighted,
                   SUM(next_us - us) AS span
            FROM seq WHERE next_us IS NOT NULL
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(span AS BIGINT) AS span_us,
               round(CAST(weighted AS DOUBLE) / span, 6) AS twap
        FROM spans
        WHERE span > 0
        ORDER BY user_id
    """,
    tags=("analytics", "W", "timeseries"),
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (the TWAP shape: each reading
    holds until the next one, so its weight is the microsecond span to its
    successor). The weighted sum is DECIMAL x integer-microseconds - exact
    and order-independent - divided once at the end, so both engines emit
    identical doubles at 6dp. Same single user-partitioned lead() window
    as the transition matrix; degenerate single-event users (no span)
    drop out on both sides."""
    ev = load(spark, sf_dir, "events", parallel=True)
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    spans = (
        seq.filter(F.col("next_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.col("value").cast("decimal(18,6)")
                * (F.col("next_us") - F.col("us"))
            ).alias("weighted"),
            F.sum(F.col("next_us") - F.col("us")).alias("span"),
        )
    )
    return (
        spans.filter(F.col("span") > 0)
        .select(
            "user_id",
            F.col("span").cast("long").alias("span_us"),
            F.round(F.col("weighted").cast("double") / F.col("span"), 6).alias(
                "twap"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "entity_clusters_customers",
    oracle="""
        WITH RECURSIVE named AS (SELECT c_custkey, c_name FROM customer),
        blocked AS (
            SELECT substr(c_name, 1, 16) AS block, c_custkey, c_name
            FROM named
        ),
        edges AS (
            SELECT a.c_custkey AS a_id, b.c_custkey AS b_id
            FROM blocked a
            JOIN blocked b
              ON a.block = b.block AND a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        ),
        und AS (
            SELECT a_id AS src, b_id AS dst FROM edges
            UNION
            SELECT b_id AS src, a_id AS dst FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM und
            UNION
            SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
        ),
        members AS (
            SELECT src AS node, dst FROM reach
            UNION
            SELECT src AS node, src AS dst FROM und
        ),
        comp AS (
            SELECT node, MIN(dst) AS entity_id FROM members GROUP BY node
        )
        SELECT comp.entity_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               MIN(named.c_name) AS canonical_name
        FROM comp JOIN named ON named.c_custkey = comp.node
        GROUP BY comp.entity_id
        ORDER BY comp.entity_id
    """,
    tags=("entity-resolution", "iterative", "graph"),
)
def entity_clusters_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: blocked fuzzy matches
    (fuzzy_customer_name_pairs' prune-then-verify edges) -> transitive
    closure via pointer-jumping connected components -> one canonical
    entity per cluster (min member id as the entity key, lexicographic
    min name as the display canonical). The match graph is tiny relative
    to the corpus (only within-block near-pairs), so the iterative CC
    runs on the edge set while the full customer table joins back exactly
    once for canonicalization - the standard dedup-then-survivorship
    shape at any scale."""
    from nyc_analytics_database_platform_spark.operators.graph import (
        connected_components,
    )

    named = load(spark, sf_dir, "customer").select(
        F.substring("c_name", 1, 16).alias("block"), "c_custkey", "c_name"
    )
    a, b = named.alias("a"), named.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        .select(
            F.col("a.c_custkey").alias("a_id"), F.col("b.c_custkey").alias("b_id")
        )
    )
    comp = connected_components(edges).select(
        F.col("node").alias("c_custkey"), F.col("component").alias("entity_id")
    )
    return (
        comp.join(named.select("c_custkey", "c_name"), "c_custkey")
        .groupBy("entity_id")
        .agg(
            F.count("*").alias("n_members"),
            F.min("c_name").alias("canonical_name"),
        )
        .orderBy("entity_id")
    )


@register(
    "market_basket_part_pairs_top20",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(COUNT(*) AS BIGINT) AS support
            FROM items a
            JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
        )
        SELECT part_a, part_b, support FROM pairs
        ORDER BY support DESC, part_a, part_b
        LIMIT 20
    """,
    tags=("analytics", "basket", "J-ext"),
)
def market_basket_part_pairs_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the Apriori pair-support step): the 20
    part pairs most often bought in the same order. The self-join is
    keyed on the ORDER (the basket id), so the quadratic term is bounded
    by basket size (~7 lines in TPC-H) exactly like the blocked fuzzy
    join and the within-cluster SemDeDup - never an all-pairs join over
    parts. Distinct-ing (order, part) first makes multi-line duplicates
    of the same part count one basket. Top-20 is TakeOrderedAndProject
    over integer supports with full deterministic tie-breaks."""
    items = (
        load(spark, sf_dir, "lineitem", parallel=True)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("support"))
    )
    return pairs.orderBy(
        F.col("support").desc(), "part_a", "part_b"
    ).limit(20)


@register(
    "events_heatmap_dow_hour",
    oracle="""
        SELECT CAST(dayofweek(ts) AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY 1, 2
        ORDER BY dow, hod
    """,
    tags=("analytics", "A6", "reporting"),
)
def events_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity matrix (the ops-dashboard
    heatmap): event and distinct-user counts per (dow, hour) cell. UTC
    session pinning (session.py) makes the calendar split cross-engine
    deterministic; DuckDB's dayofweek is 0=Sunday while Spark's is
    1=Sunday, so the Spark side shifts by one to the shared convention.
    One map-side-combinable aggregate into a fixed 7x24 cell grid."""
    ev = load(spark, sf_dir, "events", parallel=True)
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hod")
    )


@register(
    "rolling_7d_active_users",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
            FROM events
        ),
        days AS (SELECT DISTINCT d FROM du)
        SELECT CAST(strftime(days.d, '%Y-%m-%d') AS VARCHAR) AS day,
               CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
        FROM days
        JOIN du ON du.d > days.d - INTERVAL 7 DAY AND du.d <= days.d
        GROUP BY days.d
        ORDER BY day
    """,
    tags=("analytics", "W", "reporting"),
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the WAU curve) - COUNT
    DISTINCT over a sliding window, which no window frame can express
    exactly, so it is the textbook spine-fan-out: the corpus collapses
    once to distinct (day, user) pairs (one shuffle, map-side
    combinable), and the 7x fan-out + distinct count runs on that tiny
    frame joined to the day spine. At 100 TB the (day, user) frame is
    the only corpus-scale object and it is exactly the pre-aggregate a
    metrics store would persist."""
    ev = load(spark, sf_dir, "events", parallel=True)
    du = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct().withColumnRenamed("d", "day_d")
    joined = days.join(
        du,
        (F.col("d") > F.date_sub(F.col("day_d"), 7))
        & (F.col("d") <= F.col("day_d")),
    )
    return (
        joined.groupBy("day_d")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.date_format("day_d", "yyyy-MM-dd").alias("day"), "wau")
        .orderBy("day")
    )


@register(
    "session_funnel_report",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events
        ),
        flags AS (
            SELECT *,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w >= 300000000
                        THEN 1 ELSE 0 END AS new_s
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        sess AS (
            SELECT *,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flags
        ),
        per AS (
            SELECT user_id, sid,
                   MIN(CASE WHEN event_type = 'view' THEN us END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN us END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN us END) AS t_buy
            FROM sess GROUP BY user_id, sid
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS s_view,
               CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                             THEN 1 ELSE 0 END) AS BIGINT) AS s_view_click,
               CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                                  AND t_buy > t_click
                             THEN 1 ELSE 0 END) AS BIGINT) AS s_full_funnel
        FROM per
    """,
    tags=("analytics", "funnel", "session"),
)
def session_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered view -> click -> purchase funnel at SESSION granularity
    (the user-level funnel is funnel_view_click_purchase; sessions are
    the unit conversion analyses actually report): per 5-minute-gap
    session, the funnel advances only if each stage's first occurrence
    strictly follows the previous stage's. One sessionization window
    (the user_id shuffle everything in this family shares) + a
    per-session conditional-min aggregate + a 1-row rollup. NULL
    comparisons do the ordering work: t_click > t_view is NULL-false
    when either stage is absent, identical semantics on both engines."""
    from nyc_analytics_database_platform_spark.operators.sessions import (
        sessionize,
    )

    ev = load(spark, sf_dir, "events", parallel=True)
    sess = sessionize(ev, "user_id", "ts", gap_seconds=300, order_cols=("event_id",))
    us = F.unix_micros("ts")
    per = sess.groupBy("user_id", "session_seq").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_buy"),
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("s_view"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("s_view_click"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_buy") > F.col("t_click")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("s_full_funnel"),
    )


@register(
    "revenue_pareto_by_customer_decile",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY o_custkey
        ),
        tiled AS (
            SELECT rev, ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
            FROM spend
        ),
        per AS (
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   SUM(rev) AS d_rev
            FROM tiled GROUP BY decile
        ),
        tot AS (SELECT SUM(d_rev) AS t FROM per)
        SELECT decile, n_customers,
               CAST(d_rev AS DOUBLE) AS revenue,
               round(CAST(d_rev AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share,
               round(CAST(SUM(d_rev) OVER (ORDER BY decile) AS DOUBLE)
                     / CAST(t AS DOUBLE), 6) AS cum_share
        FROM per, tot
        ORDER BY decile
    """,
    tags=("analytics", "W", "reporting"),
)
def revenue_pareto_by_customer_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the Pareto / 80-20 report): customers ranked
    by total spend, split into deciles, with each decile's revenue share
    and the cumulative share curve. Spend totals are DECIMAL-exact; the
    decile comes from the SHARDED rank scan over the customer-spend frame
    (operators/prefixsum.ranked_by_range + closed-form NTILE - no
    single-partition sort; the per-key pre-aggregate, never the order
    fact); the final cumulative window touches 10 rows. Deterministic
    ntile ties via (rev DESC, custkey)."""
    spend = (
        load(spark, sf_dir, "orders", parallel=True)
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    ranked, n_cust = ranked_by_range(
        spend, [F.desc("rev"), F.asc("o_custkey")], "rk"
    )
    per = (
        ranked.withColumn("decile", ntile_from_rank("rk", n_cust, 10))
        .groupBy("decile")
        .agg(F.count("*").alias("n_customers"), F.sum("rev").alias("d_rev"))
    )
    tot = per.agg(F.sum("d_rev").alias("t"))
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("cum_rev", F.sum("d_rev").over(w_cum))
        .select(
            "decile",
            "n_customers",
            F.col("d_rev").cast("double").alias("revenue"),
            F.round(
                F.col("d_rev").cast("double") / F.col("t").cast("double"), 6
            ).alias("share"),
            F.round(
                F.col("cum_rev").cast("double") / F.col("t").cast("double"), 6
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


@register(
    "item_similarity_top3",
    oracle="""
        WITH bi AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem
        ),
        cooc AS (
            SELECT a.i AS i, b.i AS j, CAST(COUNT(*) AS BIGINT) AS cooc
            FROM bi a JOIN bi b ON a.o = b.o AND a.i < b.i
            GROUP BY 1, 2
        ),
        und AS (
            SELECT i, j, cooc FROM cooc
            UNION ALL
            SELECT j AS i, i AS j, cooc FROM cooc
        ),
        n AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ni FROM bi GROUP BY 1),
        scored AS (
            SELECT u.i, u.j, u.cooc,
                   round(u.cooc / sqrt(ni.ni * CAST(nj.ni AS DOUBLE)), 6)
                       AS sim
            FROM und u
            JOIN n ni ON ni.i = u.i
            JOIN n nj ON nj.i = u.j
        ),
        ranked AS (
            SELECT i, j, cooc, sim,
                   ROW_NUMBER() OVER (PARTITION BY i
                                      ORDER BY sim DESC, j) AS rk
            FROM scored
        )
        SELECT i AS part, CAST(rk AS INT) AS rk, j AS similar_part,
               cooc, sim
        FROM ranked WHERE rk <= 3
        ORDER BY part, rk
    """,
    tags=("A-ext", "recommendation", "similarity"),
)
def item_similarity_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarity: for every part, the 3
    most co-purchased parts by cosine over basket co-occurrence
    (cooc / sqrt(n_i * n_j)) - the "customers also bought" primitive, the
    similarity layer on top of market_basket_part_pairs_top20's raw
    support counts. Integer co-occurrence counts through one IEEE sqrt
    keep the score identical cross-engine; ranking is on the 6dp-rounded
    score with an id tie-break.

    Scale: the basket self-join is bounded by basket size (sum over
    orders of k^2, never |parts|^2 - the quadratic hazard lives per
    basket, and hub baskets would be capped as in the projection
    operators); the top-3 compiles to WindowGroupLimit."""
    bi = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("i"))
        .distinct()
    )
    a = bi.select("o", F.col("i").alias("ia"))
    b = bi.select(F.col("o").alias("o2"), F.col("i").alias("ib"))
    cooc = (
        a.join(b, (a.o == b.o2) & (F.col("ia") < F.col("ib")))
        .groupBy(F.col("ia").alias("i"), F.col("ib").alias("j"))
        .agg(F.count("*").alias("cooc"))
    )
    und = cooc.unionByName(
        cooc.select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cooc"
        )
    )
    n = bi.groupBy("i").agg(F.count("*").alias("ni"))
    scored = (
        und.join(n.select(F.col("i"), F.col("ni")), "i")
        .join(
            n.select(F.col("i").alias("j"), F.col("ni").alias("nj")), "j"
        )
        .select(
            "i",
            "j",
            "cooc",
            F.round(
                F.col("cooc")
                / F.sqrt((F.col("ni") * F.col("nj")).cast("double")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.col("sim").desc(), "j")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("i").alias("part"),
            F.col("rk").cast("int").alias("rk"),
            F.col("j").alias("similar_part"),
            "cooc",
            "sim",
        )
        .orderBy("part", "rk")
    )
