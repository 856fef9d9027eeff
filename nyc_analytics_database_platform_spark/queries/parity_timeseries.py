"""Time-series parity queries: monthly bucketing, month-spine densification,
and the windowed extensions (SURVEY.md sections 2.4 A6/A7, 2.3 J4, 2.5).

The month-spine left join is the one relational operator the reference
implements in application code (reference: server.py:319-342 - generate month
list, left-join aggregated months, fill 0 for counts / None for medians).
Here it is a declarative sequence() -> explode -> left join -> coalesce plan,
so Catalyst can push it around like any other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.timeseries import month_spine_densify
from nyc_analytics_database_platform_spark.registry import register


@register(
    "monthly_order_counts",
    oracle="""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               COUNT(*) AS num_orders
        FROM orders
        GROUP BY 1
        ORDER BY month
    """,
    tags=("A6", "F1", "F3", "O3"),
    bench=True,
)
def monthly_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed COUNT (reference: server.py:281-289 - monthly complaint
    counts via DATE_TRUNC). Scale: single hash-agg on a derived month key."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        )
        .agg(F.count("*").alias("num_orders"))
        .orderBy("month")
    )


@register(
    "monthly_median_price",
    oracle="""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
               COUNT(*) AS num_orders
        FROM orders
        GROUP BY 1
        ORDER BY month
    """,
    tags=("A7", "F1", "O3"),
)
def monthly_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month exact median + count (reference: server.py:291-302)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        )
        .agg(
            F.percentile("o_totalprice", 0.5).alias("median_price"),
            F.count("*").alias("num_orders"),
        )
        .orderBy("month")
    )


_SPINE_FILTER_SQL = """
    SELECT o.o_orderdate, o.o_totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey = 3
"""


def _nation3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 3).select(
        "c_custkey"
    )
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderdate", "o_totalprice"
    )


@register(
    "month_spine_zero_fill",
    oracle=f"""
        WITH f AS ({_SPINE_FILTER_SQL}),
        b AS (SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                     date_trunc('month', MAX(o_orderdate)) AS hi FROM f),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month_ts FROM b),
        m AS (SELECT date_trunc('month', o_orderdate) AS month_ts, COUNT(*) AS c
              FROM f GROUP BY 1)
        SELECT strftime(spine.month_ts, '%Y-%m') AS month,
               COALESCE(m.c, 0) AS num_orders
        FROM spine LEFT JOIN m USING (month_ts)
        ORDER BY month
    """,
    tags=("J4", "F4", "A6"),
    bench=True,
)
def month_spine_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-spine densification, zero-fill variant (reference:
    server.py:319-342, fill at :337-338). Gap months appear with count 0."""
    f = _nation3_orders(spark, sf_dir)
    agg = f.groupBy(F.date_trunc("month", "o_orderdate").alias("month_ts")).agg(
        F.count("*").alias("c")
    )
    dense = month_spine_densify(
        f, "o_orderdate", agg, fills={"num_orders": (F.col("c"), F.lit(0))}
    )
    return dense.select(
        F.date_format("month_ts", "yyyy-MM").alias("month"), "num_orders"
    ).orderBy("month")


@register(
    "month_spine_null_fill_median",
    oracle=f"""
        WITH f AS ({_SPINE_FILTER_SQL}),
        b AS (SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                     date_trunc('month', MAX(o_orderdate)) AS hi FROM f),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month_ts FROM b),
        m AS (SELECT date_trunc('month', o_orderdate) AS month_ts,
                     PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med
              FROM f GROUP BY 1)
        SELECT strftime(spine.month_ts, '%Y-%m') AS month,
               m.med AS median_price
        FROM spine LEFT JOIN m USING (month_ts)
        ORDER BY month
    """,
    tags=("J4", "F4", "A7"),
)
def month_spine_null_fill_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-spine densification, null-fill variant for medians (reference:
    server.py:339-340 - missing months keep None so charts span gaps)."""
    f = _nation3_orders(spark, sf_dir)
    agg = f.groupBy(F.date_trunc("month", "o_orderdate").alias("month_ts")).agg(
        F.percentile("o_totalprice", 0.5).alias("med")
    )
    dense = month_spine_densify(
        f, "o_orderdate", agg, fills={"median_price": (F.col("med"), None)}
    )
    return dense.select(
        F.date_format("month_ts", "yyyy-MM").alias("month"), "median_price"
    ).orderBy("month")


@register(
    "rolling_3m_avg_orders",
    oracle="""
        WITH m AS (
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                   COUNT(*) AS num_orders
            FROM orders GROUP BY 1
        )
        SELECT month, num_orders,
               AVG(num_orders) OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 AS rolling_avg
        FROM m ORDER BY month
    """,
    tags=("W-ext", "A6"),
)
def rolling_3m_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-month average over the monthly series - the frame-spec window
    extension (SURVEY.md section 2.5; no reference counterpart)."""
    orders = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("num_orders"))
    w = Window.orderBy("month").rowsBetween(-2, 0)
    return m.withColumn("rolling_avg", F.avg("num_orders").over(w)).orderBy("month")


@register(
    "cumulative_orders",
    oracle="""
        WITH m AS (
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                   COUNT(*) AS num_orders
            FROM orders GROUP BY 1
        )
        SELECT month, num_orders,
               CAST(SUM(num_orders) OVER (ORDER BY month
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS running_total,
               num_orders - LAG(num_orders) OVER (ORDER BY month) AS mom_delta
        FROM m ORDER BY month
    """,
    tags=("W-ext",),
)
def cumulative_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + month-over-month delta (cumulative window + lag)."""
    orders = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("num_orders"))
    w = Window.orderBy("month")
    return (
        m.withColumn(
            "running_total",
            F.sum("num_orders").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("mom_delta", F.col("num_orders") - F.lag("num_orders").over(w))
        .orderBy("month")
    )


@register(
    "month_spine_interpolated_revenue",
    oracle=f"""
        WITH f AS (
            SELECT o.o_orderdate, o.o_totalprice
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_nationkey = 3 AND o.o_orderpriority = '1-URGENT'
        ),
        b AS (SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                     date_trunc('month', MAX(o_orderdate)) AS hi FROM f),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month_ts FROM b),
        m AS (SELECT date_trunc('month', o_orderdate) AS month_ts,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
              FROM f GROUP BY 1),
        d AS (SELECT spine.month_ts, m.rev,
                     row_number() OVER (ORDER BY spine.month_ts) AS i
              FROM spine LEFT JOIN m USING (month_ts)),
        w AS (SELECT month_ts, rev, i,
                last_value(rev IGNORE NULLS) OVER
                    (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                last_value(CASE WHEN rev IS NOT NULL THEN i END IGNORE NULLS) OVER
                    (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
                first_value(rev IGNORE NULLS) OVER
                    (ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN rev IS NOT NULL THEN i END IGNORE NULLS) OVER
                    (ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
              FROM d)
        SELECT strftime(month_ts, '%Y-%m') AS month,
               round(CASE WHEN rev IS NOT NULL THEN rev
                     ELSE pv + (nv - pv) * (CAST(i - pi AS DOUBLE) / (ni - pi))
                     END, 4) AS revenue,
               rev IS NULL AS interpolated
        FROM w ORDER BY month
    """,
    tags=("J4", "F4", "timeseries"),
)
def month_spine_interpolated_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill by LINEAR INTERPOLATION on the month spine: gap months get
    pv + (nv - pv) * (i - pi) / (ni - pi) between the bracketing observed
    months - the third fill policy beside zero-fill and null-fill (the
    reference only zero/null-fills, server.py:337-340; interpolation is
    the standard time-series upgrade). Revenue per observed month is an
    exact decimal sum cast once to double, so both engines interpolate
    identical endpoints. The four IGNORE-NULLS window passes run over the
    SPINE frame, whose cardinality is the month span of the data - a
    bounded presentation frame (same argument as the nyc/api boundary),
    not a corpus-scale window; the spine never leaves one executor.
    Leading/trailing gaps cannot exist (the spine spans observed months).
    The slice (nation 3, 1-URGENT priority) is deliberately sparse so gap
    months actually occur and the interpolation branch is attested."""
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 3)
        .select("c_custkey")
    )
    f = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderdate", "o_totalprice"
    )
    agg = f.groupBy(F.date_trunc("month", "o_orderdate").alias("month_ts")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    dense = month_spine_densify(
        f, "o_orderdate", agg, fills={"rev": (F.col("rev"), None)}
    )
    w_all = Window.orderBy("i")
    prev_w = w_all.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    next_w = w_all.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    known_i = F.when(F.col("rev").isNotNull(), F.col("i"))
    d = dense.withColumn("i", F.row_number().over(Window.orderBy("month_ts")))
    interp = (
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("i") - F.col("pi")).cast("double") / (F.col("ni") - F.col("pi")))
    )
    return (
        d.withColumn("pv", F.last("rev", ignorenulls=True).over(prev_w))
        .withColumn("pi", F.last(known_i, ignorenulls=True).over(prev_w))
        .withColumn("nv", F.first("rev", ignorenulls=True).over(next_w))
        .withColumn("ni", F.first(known_i, ignorenulls=True).over(next_w))
        .select(
            F.date_format("month_ts", "yyyy-MM").alias("month"),
            F.round(
                F.when(F.col("rev").isNotNull(), F.col("rev")).otherwise(interp), 4
            ).alias("revenue"),
            F.col("rev").isNull().alias("interpolated"),
        )
        .orderBy("month")
    )


@register(
    "monthly_revenue_cusum",
    oracle="""
        WITH m AS (
            SELECT date_trunc('month', o_orderdate) AS month_ts,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS rev
            FROM orders GROUP BY 1
        ),
        stats AS (
            SELECT CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) AS mu
            FROM m
        ),
        c AS (
            SELECT month_ts, rev,
                   SUM(CAST(rev - mu AS DECIMAL(18,6))) OVER (
                       ORDER BY month_ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cusum
            FROM m, stats
        )
        SELECT strftime(month_ts, '%Y-%m') AS month,
               round(rev, 2) AS revenue,
               round(CAST(cusum AS DOUBLE), 2) AS cusum,
               abs(CAST(cusum AS DOUBLE))
                   = MAX(abs(CAST(cusum AS DOUBLE))) OVER () AS change_point
        FROM c
        ORDER BY month
    """,
    tags=("timeseries", "monitoring", "W"),
)
def monthly_revenue_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point scan over monthly revenue: cumulative deviation
    from the series mean, flagging the month where |CUSUM| peaks (the
    classic single-change-point estimate). Deviations accumulate in
    DECIMAL, so the running sums are exact and order-independent and the
    peak flag needs no epsilon. The cumulative and max windows run over
    the MONTH frame - bounded by the data's time span, the same
    presentation-frame argument as the spine queries; the only
    corpus-scale work is the initial month aggregate (one shuffle,
    map-side combinable)."""
    m = (
        load(spark, sf_dir, "orders", parallel=True)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month_ts"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    stats = m.agg(
        (F.sum(F.col("rev").cast("decimal(18,2)")).cast("double") / F.count("*"))
        .alias("mu")
    )
    w_cum = Window.orderBy("month_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("month_ts").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = m.crossJoin(F.broadcast(stats)).withColumn(
        "cusum",
        F.sum((F.col("rev") - F.col("mu")).cast("decimal(18,6)")).over(w_cum),
    )
    return c.select(
        F.date_format("month_ts", "yyyy-MM").alias("month"),
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("cusum").cast("double"), 2).alias("cusum"),
        (
            F.abs(F.col("cusum").cast("double"))
            == F.max(F.abs(F.col("cusum").cast("double"))).over(w_all)
        ).alias("change_point"),
    ).orderBy("month")


_HOLT_A, _HOLT_B = 0.5, 0.3


@register(
    "monthly_revenue_holt",
    oracle=f"""
        WITH RECURSIVE m AS (
            SELECT date_trunc('month', o_orderdate) AS month_ts,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS rev
            FROM orders GROUP BY 1
        ),
        idx AS (
            SELECT month_ts, rev,
                   row_number() OVER (ORDER BY month_ts) AS i
            FROM m
        ),
        fold AS (
            SELECT month_ts, rev, i, rev AS l, CAST(0 AS DOUBLE) AS b
            FROM idx WHERE i = 1
            UNION ALL
            SELECT x.month_ts, x.rev, x.i,
                   {_HOLT_A} * x.rev + {1 - _HOLT_A} * (f.l + f.b),
                   {_HOLT_B} * (({_HOLT_A} * x.rev
                                 + {1 - _HOLT_A} * (f.l + f.b)) - f.l)
                       + {1 - _HOLT_B} * f.b
            FROM fold f JOIN idx x ON x.i = f.i + 1
        )
        SELECT strftime(month_ts, '%Y-%m') AS month,
               round(rev, 2) AS revenue,
               round(l, 4) AS level,
               round(b, 4) AS trend,
               round(l + b, 4) AS forecast_next
        FROM fold
        ORDER BY month
    """,
    tags=("timeseries", "monitoring", "iterative"),
)
def monthly_revenue_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential (level + trend) smoothing of monthly
    revenue - the forecasting step up from monthly_revenue_ewma when the
    series trends: l_t = a*y_t + (1-a)(l+b), b_t = g*(l_t - l) + (1-g)*b,
    seeded (l_1 = y_1, b_1 = 0); forecast_next = l_t + b_t is the
    one-step-ahead prediction a capacity planner reads. Sequential by
    nature, so it runs as ONE JVM aggregate-lambda fold over the bounded
    month frame (the EWMA/BPE fold primitive) after the corpus-scale
    month aggregate; the oracle replays the recurrence as a recursive CTE
    with the IDENTICAL expression structure (the level term is spelled
    out inside the trend update in both engines), so the IEEE sequences
    match at 4dp with no tolerance."""
    m = (
        load(spark, sf_dir, "orders", parallel=True)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month_ts"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    packed = m.agg(
        F.array_sort(F.collect_list(F.struct("month_ts", "rev"))).alias("xs")
    )
    lnew = (
        f"{_HOLT_A}D * x.rev + {1 - _HOLT_A}D * "
        f"(element_at(acc, -1).l + element_at(acc, -1).b)"
    )
    folded = packed.select(
        F.expr(
            f"""
            aggregate(
                slice(xs, 2, size(xs) - 1),
                array(named_struct(
                    'month_ts', xs[0].month_ts, 'rev', xs[0].rev,
                    'l', xs[0].rev, 'b', cast(0 as double))),
                (acc, x) -> concat(acc, array(named_struct(
                    'month_ts', x.month_ts, 'rev', x.rev,
                    'l', {lnew},
                    'b', {_HOLT_B}D * (({lnew}) - element_at(acc, -1).l)
                         + {1 - _HOLT_B}D * element_at(acc, -1).b)))
            )
            """
        ).alias("out")
    )
    return (
        folded.select(F.explode("out").alias("r"))
        .select(
            F.date_format("r.month_ts", "yyyy-MM").alias("month"),
            F.round("r.rev", 2).alias("revenue"),
            F.round("r.l", 4).alias("level"),
            F.round("r.b", 4).alias("trend"),
            F.round(F.col("r.l") + F.col("r.b"), 4).alias("forecast_next"),
        )
        .orderBy("month")
    )


_EWMA_ALPHA = 0.3


@register(
    "monthly_revenue_ewma",
    oracle=f"""
        WITH RECURSIVE m AS (
            SELECT date_trunc('month', o_orderdate) AS month_ts,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS rev
            FROM orders GROUP BY 1
        ),
        idx AS (
            SELECT month_ts, rev,
                   row_number() OVER (ORDER BY month_ts) AS i
            FROM m
        ),
        fold AS (
            SELECT month_ts, rev, i, rev AS ewma FROM idx WHERE i = 1
            UNION ALL
            SELECT x.month_ts, x.rev, x.i,
                   {_EWMA_ALPHA} * x.rev + {1 - _EWMA_ALPHA} * f.ewma
            FROM fold f JOIN idx x ON x.i = f.i + 1
        )
        SELECT strftime(month_ts, '%Y-%m') AS month,
               round(rev, 2) AS revenue,
               round(ewma, 4) AS ewma
        FROM fold
        ORDER BY month
    """,
    tags=("timeseries", "monitoring", "iterative"),
)
def monthly_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of monthly revenue
    (alpha=0.3, seeded with the first month) - the smoothing pass a
    monitoring dashboard layers over the raw trend. The recurrence
    ewma_t = a*x_t + (1-a)*ewma_{t-1} is inherently sequential, so it
    runs as ONE JVM aggregate-lambda fold over the month array (the same
    fold primitive as BPE training), executed on the bounded month frame
    after the corpus-scale month aggregate; the oracle replays the
    identical recurrence as a recursive CTE, and because both engines
    evaluate the same IEEE expression sequence in the same order, the
    smoothed values match at 4dp without any tolerance."""
    m = (
        load(spark, sf_dir, "orders", parallel=True)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month_ts"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    packed = m.agg(
        F.array_sort(
            F.collect_list(F.struct("month_ts", "rev"))
        ).alias("xs")
    )
    folded = packed.select(
        F.expr(
            f"""
            aggregate(
                slice(xs, 2, size(xs) - 1),
                array(named_struct(
                    'month_ts', xs[0].month_ts, 'rev', xs[0].rev,
                    'ewma', xs[0].rev)),
                (acc, x) -> concat(acc, array(named_struct(
                    'month_ts', x.month_ts, 'rev', x.rev,
                    'ewma', {_EWMA_ALPHA}D * x.rev
                             + {1 - _EWMA_ALPHA}D * element_at(acc, -1).ewma)))
            )
            """
        ).alias("out")
    )
    return (
        folded.select(F.explode("out").alias("r"))
        .select(
            F.date_format("r.month_ts", "yyyy-MM").alias("month"),
            F.round("r.rev", 2).alias("revenue"),
            F.round("r.ewma", 4).alias("ewma"),
        )
        .orderBy("month")
    )


@register(
    "seasonal_index_by_month",
    oracle="""
        WITH m AS (
            SELECT date_trunc('month', o_orderdate) AS ym,
                   CAST(month(o_orderdate) AS BIGINT) AS moy,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
            FROM orders
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT SUM(rev) AS grand, CAST(COUNT(*) AS BIGINT) AS n_all FROM m
        )
        SELECT moy,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               round((CAST(SUM(rev) AS DOUBLE) * t.n_all)
                     / (CAST(t.grand AS DOUBLE) * COUNT(*)), 6)
                   AS seasonal_index
        FROM m, tot t
        GROUP BY moy, t.grand, t.n_all
        ORDER BY moy
    """,
    tags=("A6", "timeseries", "forecast"),
)
def seasonal_index_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative seasonal decomposition of monthly revenue: the
    calendar-month index = (mean revenue of that month-of-year) / (mean
    over all year-months) - index > 1 months run seasonally hot. This is
    the seasonal leg next to the trend legs (EWMA/Holt) and the
    change-point leg (CUSUM); a forecaster multiplies the Holt level by
    this index. Exactness: revenues stay DECIMAL through both aggregates;
    the index is one double expression over four exact terms (sum * count
    / (sum * count)), rounded 6dp identically in both engines.

    Scale: facts aggregate once to the bounded year-month grid; everything
    after runs on that ~O(years*12)-row frame with a broadcast scalar."""
    orders = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("ym"),
        F.month("o_orderdate").cast("long").alias("moy"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    tot = m.agg(
        F.sum("rev").alias("grand"), F.count("*").cast("long").alias("n_all")
    )
    return (
        m.join(F.broadcast(tot))
        .groupBy("moy", "grand", "n_all")
        .agg(
            F.count("*").cast("long").alias("n_months"),
            F.round(
                (F.sum("rev").cast("double") * F.first("n_all"))
                / (F.first("grand").cast("double") * F.count("*")),
                6,
            ).alias("seasonal_index"),
        )
        .select("moy", "n_months", "seasonal_index")
        .orderBy("moy")
    )


@register(
    "theil_sen_revenue_trend",
    oracle="""
        WITH m AS (
            SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                       AS mi,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100
                        AS BIGINT) AS cents
            FROM orders
            GROUP BY 1
        ),
        slopes AS (
            SELECT (b.cents - a.cents) / CAST(b.mi - a.mi AS DOUBLE) AS s
            FROM m a JOIN m b ON b.mi > a.mi
        ),
        ts AS (
            SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY s) AS slope
            FROM slopes
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_months,
               round(ts.slope / 100, 4) AS slope_per_month,
               round((SELECT PERCENTILE_DISC(0.5) WITHIN GROUP
                          (ORDER BY m.cents - ts.slope * m.mi) FROM m) / 100,
                     4) AS intercept
        FROM ts
    """,
    tags=("stats", "timeseries", "robust"),
)
def theil_sen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue: slope = MEDIAN of all
    pairwise month-to-month slopes (29% breakdown point - a few wild
    months cannot drag it, unlike the OLS line in stats_exact_linear_fit,
    its least-squares twin), intercept = median residual at slope. All
    inputs integerize (month index, revenue cents) before the one double
    division per pair, so both engines take medians over identical
    doubles; both medians are DISCRETE order statistics, so no
    interpolation arithmetic exists to diverge.

    Scale: facts collapse to the bounded year-month frame FIRST; the
    pairwise self-join, the global-order windows, and both medians run on
    O(months^2) ~ thousands of rows however big the fact table -
    calendar-bounded, not data-bounded (the unpartitioned windows are over
    this bounded frame only)."""
    orders = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * 100)
        .cast("long")
        .alias("cents")
    )
    a = m.select(F.col("mi").alias("ami"), F.col("cents").alias("ac"))
    b = m.select(F.col("mi").alias("bmi"), F.col("cents").alias("bc"))
    slopes = (
        a.join(b, F.col("bmi") > F.col("ami"))
        .select(
            (
                (F.col("bc") - F.col("ac"))
                / (F.col("bmi") - F.col("ami")).cast("double")
            ).alias("s")
        )
    )
    # DISCRETE medians on purpose (PERCENTILE_DISC = the value at
    # position ceil(n/2), an actual element of the set): an interpolated
    # median averages two doubles, and the engines' interpolation differs
    # in the last ulp - which the month index (~24000) then amplifies
    # through slope * mi into the residual median. Picking an element
    # makes both medians bit-identical by construction.
    wsl = Window.orderBy("s")
    ts = (
        slopes.select(
            "s",
            F.row_number().over(wsl).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("ns"),
        )
        .filter(F.col("rn") == F.ceil(F.lit(0.5) * F.col("ns")))
        .select(F.col("s").alias("slope"))
    )
    res = m.crossJoin(F.broadcast(ts)).select(
        "slope", (F.col("cents") - F.col("slope") * F.col("mi")).alias("r")
    )
    wr = Window.orderBy("r")
    resid = (
        res.select(
            "slope",
            "r",
            F.row_number().over(wr).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("nr"),
        )
        .filter(F.col("rn") == F.ceil(F.lit(0.5) * F.col("nr")))
        .select(F.col("r").alias("med_resid"), "slope")
    )
    n = m.agg(F.count("*").cast("long").alias("n_months"))
    return (
        n.crossJoin(F.broadcast(resid))
        .select(
            "n_months",
            F.round(F.col("slope") / 100, 4).alias("slope_per_month"),
            F.round(F.col("med_resid") / 100, 4).alias("intercept"),
        )
    )


@register(
    "monthly_revenue_max_drawdown",
    oracle="""
        WITH monthly AS (
            SELECT DATE_TRUNC('month', o_orderdate) AS m,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
            FROM orders GROUP BY 1
        ),
        curve AS (
            SELECT m,
                   SUM(rev_cents) OVER (ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_cents
            FROM monthly
        ),
        peaks AS (
            SELECT m, cum_cents,
                   MAX(cum_cents) OVER (ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS peak_cents
            FROM curve
        )
        SELECT STRFTIME(m, '%Y-%m') AS month,
               CAST(cum_cents AS DOUBLE) / 100.0 AS cumulative_revenue,
               CAST(peak_cents AS DOUBLE) / 100.0 AS running_peak,
               CAST(peak_cents - cum_cents AS DOUBLE) / 100.0 AS drawdown,
               CASE WHEN peak_cents - cum_cents =
                        MAX(peak_cents - cum_cents) OVER ()
                    THEN 1 ELSE 0 END AS is_max_drawdown
        FROM peaks
        ORDER BY month
    """,
    tags=("W", "timeseries"),
)
def monthly_revenue_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-drawdown scan over the cumulative monthly revenue curve —
    running peak, per-month drawdown from that peak, and a flag on the
    deepest trough (the classic risk metric; another recurrence that looks
    sequential but is two associative cumulative windows, the same rewrite
    family as inventory_capped_running_balance).

    All values are exact integer cents through every window; only the
    report columns divide to DOUBLE. The is_max_drawdown flag compares
    integers, so ties (several equally-deep troughs) flag identically in
    both engines.

    Scale shape: windows run over the MONTHLY aggregate (bounded by
    calendar span) produced by one map-side-combinable pass over the
    fact."""
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    w_cum = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    peaks = (
        monthly.withColumn("cum_cents", F.sum("rev_cents").over(w_cum))
        .withColumn("peak_cents", F.max("cum_cents").over(w_cum))
        .withColumn("dd_cents", F.col("peak_cents") - F.col("cum_cents"))
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        peaks.select(
            F.date_format("m", "yyyy-MM").alias("month"),
            (F.col("cum_cents").cast("double") / 100.0).alias(
                "cumulative_revenue"
            ),
            (F.col("peak_cents").cast("double") / 100.0).alias("running_peak"),
            (F.col("dd_cents").cast("double") / 100.0).alias("drawdown"),
            F.when(
                F.col("dd_cents") == F.max("dd_cents").over(w_all), 1
            )
            .otherwise(0)
            .alias("is_max_drawdown"),
        )
        .orderBy("month")
    )
