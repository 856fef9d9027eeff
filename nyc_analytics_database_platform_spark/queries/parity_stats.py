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


@register(
    "cogroup_nation_balance_stats",
    oracle="""
        WITH c AS (
            SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers,
                   SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS cust_bal_cents
            FROM customer GROUP BY 1
        ),
        s AS (
            SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS supp_bal_cents
            FROM supplier GROUP BY 1
        )
        SELECT COALESCE(c.nk, s.nk) AS nationkey,
               COALESCE(c.n_customers, 0) AS n_customers,
               COALESCE(s.n_suppliers, 0) AS n_suppliers,
               COALESCE(c.cust_bal_cents, 0) AS cust_bal_cents,
               COALESCE(s.supp_bal_cents, 0) AS supp_bal_cents,
               COALESCE(c.cust_bal_cents, 0) - COALESCE(s.supp_bal_cents, 0)
                   AS gap_cents
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
        ORDER BY nationkey
    """,
    tags=("U", "cogroup", "A-ext"),
)
def cogroup_nation_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided grouped UDF surface: customers and suppliers cogrouped on
    the nation key, one Arrow-batched pandas call per key receiving BOTH
    sides (flatMapCoGroupsInPandas) - the API for per-key logic that needs
    two tables at once without a pre-join. Cogroup keys are the union of
    both sides (full-outer semantics), which the oracle mirrors with a FULL
    JOIN of the per-side aggregates.

    Balances convert to integer cents JVM-side (Spark round == DuckDB ROUND
    half-away for positive 2dp values, the _REVENUE convention) so the
    pandas sums are exact int64 arithmetic - the Python stage cannot drift.

    Scale: each side shuffles once on the key (same exchange a join would
    need); per-key pandas state is bounded by the key's group sizes, and the
    output is one row per key."""
    import pandas as pd

    cust = (
        load(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nk"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        )
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .select(
            F.col("s_nationkey").alias("nk"),
            F.round(F.col("s_acctbal") * 100).cast("long").alias("cents"),
        )
    )

    def stats(key, cdf: "pd.DataFrame", sdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "nationkey": [int(key[0])],
                "n_customers": [len(cdf)],
                "n_suppliers": [len(sdf)],
                "cust_bal_cents": [int(cdf["cents"].sum()) if len(cdf) else 0],
                "supp_bal_cents": [int(sdf["cents"].sum()) if len(sdf) else 0],
            }
        )

    out_schema = (
        "nationkey int, n_customers long, n_suppliers long, "
        "cust_bal_cents long, supp_bal_cents long"
    )
    return (
        cust.groupBy("nk")
        .cogroup(supp.groupBy("nk"))
        .applyInPandas(stats, out_schema)
        .withColumn(
            "gap_cents", F.col("cust_bal_cents") - F.col("supp_bal_cents")
        )
        .orderBy("nationkey")
    )


@register(
    "stats_exact_linear_fit",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                   SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sx,
                   SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       AS DECIMAL(38,0))) AS sy,
                   SUM(CAST(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sxx,
                   SUM(CAST(CAST(l_quantity AS BIGINT)
                       * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       AS DECIMAL(38,0))) AS sxy,
                   SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       AS DECIMAL(38,0))) AS syy
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n_rows,
               CAST((n * sxy - sx * sy) AS DOUBLE)
                   / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr,
               CAST((n * sxy - sx * sy) AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS slope
        FROM m
        ORDER BY l_returnflag
    """,
    tags=("stats", "A-ext", "exact-numerics"),
)
def stats_exact_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed correlation + regression slope with EXACT moments:
    built-in corr()/regr_slope() accumulate doubles in partition order (the
    result changes with partitioning - unusable for cross-engine or even
    rerun-stable audits). Here every moment (n, Sx, Sy, Sxx, Sxy, Syy) is
    an exact DECIMAL(38,0) sum of integer quantities and price-cents -
    order-independent, map-side combinable, one shuffle - and the closed
    formulas evaluate on doubles cast from identical decimals in a fixed
    order, so corr and slope are bit-identical across engines with no
    rounding convention. Slope is cents-per-unit scaled back to currency
    (/100)."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum((x * y).cast(dec)).alias("sxy"),
        F.sum((y * y).cast(dec)).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        (num / (F.sqrt(varx) * F.sqrt(vary))).alias("corr"),
        (num / varx / F.lit(100.0)).alias("slope"),
    ).orderBy("l_returnflag")


@register(
    "percentile_disc_price_by_status",
    oracle="""
        SELECT o_orderstatus,
               PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p90_price,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("stats", "A-ext", "percentile"),
)
def percentile_disc_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentile (an actual data value, never interpolated -
    PERCENTILE_DISC semantics: the first value whose cume_dist >= p).
    Spark has only the continuous percentile built-in, so this derives the
    discrete one from rank arithmetic: value at position ceil(p * n) in
    group order. One shuffle on the group key; the per-group sort is the
    same work the ordered-set aggregate does in any engine. A data value is
    exact by construction - no float convention needed."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("o_orderstatus")).alias("n"),
    )
    return (
        ranked.filter(F.col("rn") == F.ceil(F.lit(0.9) * F.col("n")))
        .select(
            "o_orderstatus",
            F.col("o_totalprice").alias("p90_price"),
            F.col("n").cast("long").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "ab_test_conversion_ztest",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CAST(user_id % 2 AS INT) AS grp,
                   CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) >= 14
                        THEN 1 ELSE 0 END AS converted
            FROM events
            GROUP BY user_id
        ),
        g AS (
            SELECT grp, COUNT(*) AS n, SUM(converted) AS conv
            FROM per_user GROUP BY grp
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN grp = 0 THEN n END) AS n_a,
                MAX(CASE WHEN grp = 0 THEN conv END) AS conv_a,
                MAX(CASE WHEN grp = 1 THEN n END) AS n_b,
                MAX(CASE WHEN grp = 1 THEN conv END) AS conv_b
            FROM g
        )
        SELECT CAST(n_a AS BIGINT) AS n_a,
               CAST(conv_a AS BIGINT) AS conv_a,
               CAST(n_b AS BIGINT) AS n_b,
               CAST(conv_b AS BIGINT) AS conv_b,
               round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
               round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
               round(
                   (conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
                   / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                          * (1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                          * (1.0 / n_a + 1.0 / n_b)), 4) AS zstat
        FROM wide
    """,
    tags=("stats", "analytics", "experiment"),
)
def ab_test_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between user cohorts (user_id parity stands in
    for the assignment hash): per-cohort conversion = a heavy purchaser
    (>= 14 purchase events - the mid-split on this data; every user has
    SOME purchase, so an any-purchase metric would be degenerate at 100%
    and the pooled variance zero),
    pooled-variance z statistic - the experimentation primitive on top of
    the engine. Counts are integers, every float derives from them in one
    fixed expression, so the rounded statistic is cross-engine exact. Two
    aggregates (per-user flag, per-cohort count) and a 2-row pivot; at
    100 TB this is one user_id shuffle with map-side combine."""
    per_user = (
        load(spark, sf_dir, "events", parallel=True)
        .groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14
            )
            .cast("int")
            .alias("converted")
        )
        .select((F.col("user_id") % 2).cast("int").alias("grp"), "converted")
    )
    g = per_user.groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    wide = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).alias("conv_b"),
    )
    na, ca = F.col("n_a").cast("double"), F.col("conv_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("conv_b").cast("double")
    pool = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / F.sqrt(
        pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(ca / na, 6).alias("rate_a"),
        F.round(cb / nb, 6).alias("rate_b"),
        F.round(z, 4).alias("zstat"),
    )


@register(
    "monthly_revenue_autocorr",
    oracle="""
        WITH m AS (
            SELECT date_trunc('month', o_orderdate) AS month_ts,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS rev
            FROM orders GROUP BY 1
        ),
        pairs AS (
            SELECT CAST(ROUND(rev * 100) AS BIGINT) AS y,
                   CAST(ROUND(lag(rev) OVER (ORDER BY month_ts) * 100)
                        AS BIGINT) AS x
            FROM m
        ),
        mm AS (
            SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                   SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                   SUM(CAST(y AS DECIMAL(38,0))) AS sy,
                   SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
                   SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy,
                   SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy
            FROM pairs WHERE x IS NOT NULL
        )
        SELECT CAST(n AS BIGINT) AS n_pairs,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                   AS lag1_corr
        FROM mm
    """,
    tags=("stats", "timeseries", "exact-numerics"),
)
def monthly_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of monthly revenue - the seasonality/trend
    diagnostic. Month revenues are exact decimal sums; the (x_t, x_{t-1})
    pairs integerize to cents, the moments are exact DECIMAL(38,0) sums
    (stats_exact_linear_fit's recipe), and the closed Pearson formula
    evaluates once on doubles cast from identical decimals - the
    statistic is cross-engine exact. The lag window runs over the bounded
    month frame."""
    m = (
        load(spark, sf_dir, "orders", parallel=True)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month_ts"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    w = Window.orderBy("month_ts")
    pairs = m.select(
        F.round(F.col("rev") * 100).cast("long").alias("y"),
        F.round(F.lag("rev").over(w) * 100).cast("long").alias("x"),
    ).filter(F.col("x").isNotNull())
    dec = "decimal(38,0)"
    x, y = F.col("x"), F.col("y")
    # cents-squared exceeds int64 - multiply in DECIMAL, never in long
    mm = pairs.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum(x.cast(dec) * x.cast(dec)).alias("sxx"),
        F.sum(x.cast(dec) * y.cast(dec)).alias("sxy"),
        F.sum(y.cast(dec) * y.cast(dec)).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return mm.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6).alias("lag1_corr"),
    )


_BOOT_B = 100  # bootstrap replicates
# Poisson(1) CDF thresholds for weights 0..4 (else 5), 10dp literals so
# both engines compare the SAME constants
_POIS = (0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431, 0.9963401532)


def _pois_w_sql(u: str) -> str:
    return (
        f"CASE WHEN {u} < {_POIS[0]} THEN 0 WHEN {u} < {_POIS[1]} THEN 1 "
        f"WHEN {u} < {_POIS[2]} THEN 2 WHEN {u} < {_POIS[3]} THEN 3 "
        f"WHEN {u} < {_POIS[4]} THEN 4 ELSE 5 END"
    )


@register(
    "bootstrap_poisson_mean_ci",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        drawn AS (
            SELECT b.b, base.cents,
                   {_pois_w_sql(
                       "CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)"
                       " || ':' || CAST(b.b AS VARCHAR)), 1, 8)) AS UBIGINT)"
                       " / 4294967296.0"
                   )} AS w
            FROM base,
                 (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b
        ),
        reps AS (
            SELECT b,
                   CAST(SUM(CAST(w AS DECIMAL(38,0))
                            * CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                       / (CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DOUBLE) * 100.0)
                       AS mean_rep
            FROM drawn GROUP BY b
            HAVING SUM(w) > 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
               round(PERCENTILE_CONT(0.025) WITHIN GROUP (ORDER BY mean_rep), 4)
                   AS ci_lo,
               round(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY mean_rep), 4)
                   AS ci_mid,
               round(PERCENTILE_CONT(0.975) WITHIN GROUP (ORDER BY mean_rep), 4)
                   AS ci_hi
        FROM reps
    """,
    tags=("stats", "bootstrap", "exact-numerics"),
)
def bootstrap_poisson_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the at-scale bootstrap: resample weights drawn
    per (row, replicate) independently - no global resample pass) for the
    95% CI of the mean order price, B=100 replicates. Weights come from
    the md5 hash draw (deterministic, partition-independent) through the
    Poisson(1) inverse CDF as fixed 10dp thresholds; each replicate's
    weighted mean uses DECIMAL-exact sums of integer cents, so every
    replicate statistic is bit-identical cross-engine and the percentile
    CI needs only 4dp rounding. One B-way row fan-out + one (replicate)-
    keyed aggregate - fully map-side combinable; B scales the scan cost,
    not the shuffle width (B rows per group key)."""
    base = load(spark, sf_dir, "orders", parallel=True).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    w = (
        F.when(u < _POIS[0], 0)
        .when(u < _POIS[1], 1)
        .when(u < _POIS[2], 2)
        .when(u < _POIS[3], 3)
        .when(u < _POIS[4], 4)
        .otherwise(5)
    )
    drawn = base.crossJoin(
        F.broadcast(spark.range(_BOOT_B).select(F.col("id").alias("b")))
    ).select("b", "cents", w.alias("w"))
    dec = "decimal(38,0)"
    reps = (
        drawn.groupBy("b")
        .agg(
            F.sum(F.col("w").cast(dec) * F.col("cents").cast(dec)).alias("sw"),
            F.sum(F.col("w").cast(dec)).alias("n"),
        )
        .filter(F.col("n") > 0)
        .select(
            (
                F.col("sw").cast("double")
                / (F.col("n").cast("double") * F.lit(100.0))
            ).alias("mean_rep")
        )
    )
    return reps.agg(
        F.count("*").alias("n_replicates"),
        F.round(F.percentile("mean_rep", 0.025), 4).alias("ci_lo"),
        F.round(F.percentile("mean_rep", 0.5), 4).alias("ci_mid"),
        F.round(F.percentile("mean_rep", 0.975), 4).alias("ci_hi"),
    )


@register(
    "standardized_price_by_segment",
    oracle="""
        WITH base AS (
            SELECT c.c_mktsegment AS segment, o.o_orderkey,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        m AS (
            SELECT segment,
                   CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                   SUM(CAST(cents AS DECIMAL(38,0))) AS sx,
                   SUM(CAST(cents AS DECIMAL(38,0))
                       * CAST(cents AS DECIMAL(38,0))) AS sxx
            FROM base GROUP BY segment
        )
        SELECT b.o_orderkey, b.segment,
               round((b.cents - CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
                     / sqrt((CAST(m.sxx AS DOUBLE)
                             - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)
                               / CAST(m.n AS DOUBLE))
                            / (CAST(m.n AS DOUBLE) - 1.0)), 6) AS z
        FROM base b JOIN m USING (segment)
        WHERE b.o_orderkey % 50 = 0
        ORDER BY b.o_orderkey
    """,
    tags=("stats", "ml-prep", "exact-numerics"),
)
def standardized_price_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-standardization (the StandardScaler shape of ML feature
    prep): order price scaled to zero-mean/unit-variance within its
    market segment. The group moments are DECIMAL-exact integer-cents
    sums (multiplied in DECIMAL), broadcast back onto the scan; every z
    value derives from identical decimals through one fixed float
    expression, so 6dp rounding is exact cross-engine. The output keeps
    every 50th order key - the attestation sample of a full-corpus
    feature column (writing all rows is the same plan minus the
    filter)."""
    base = (
        load(spark, sf_dir, "orders", parallel=True)
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", F.col("c_mktsegment").alias("segment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "o_orderkey",
            "segment",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    dec = "decimal(38,0)"
    c = F.col("cents")
    m = base.groupBy("segment").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(c.cast(dec)).alias("sx"),
        F.sum(c.cast(dec) * c.cast(dec)).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    mu = sxd / nd
    sd = F.sqrt((sxxd - sxd * sxd / nd) / (nd - 1.0))
    return (
        base.join(F.broadcast(m), "segment")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            "segment",
            F.round((c - mu) / sd, 6).alias("z"),
        )
        .orderBy("o_orderkey")
    )


# log10(1 + 1/d) for d = 1..9, 10dp literals shared by both engines
_BENFORD = (
    0.3010299957, 0.1760912591, 0.1249387366, 0.0969100130, 0.0791812460,
    0.0669467896, 0.0579919470, 0.0511525224, 0.0457574906,
)


@register(
    "benford_first_digit_audit",
    oracle=f"""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders WHERE o_totalprice > 0
        ),
        c AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
        ),
        t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c),
        e AS (
            SELECT digit, n,
                   CASE digit {" ".join(
                       f"WHEN {i + 1} THEN {p}" for i, p in enumerate(_BENFORD)
                   )} END AS p_benford
            FROM c
        )
        SELECT digit, n,
               round(n / total, 6) AS p_observed,
               p_benford,
               round((n - total * p_benford) * (n - total * p_benford)
                     / (total * p_benford), 6) AS chi2_term
        FROM e, t
        ORDER BY digit
    """,
    tags=("stats", "quality", "audit"),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals - the classic
    fabricated-data / corruption screen a warehouse runs over money
    columns. Digits come from the integer-cents string (no float
    formatting dependence); expected probabilities are shared 10dp
    literals; each digit's chi-square term derives from integer counts
    through one fixed expression - 6dp-exact cross-engine. One
    9-group aggregate over a single scan; consumers sum chi2_term
    against the chi-square(8) critical value."""
    d = (
        load(spark, sf_dir, "orders", parallel=True)
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").cast("double").alias("total"))
    p = None
    for i, prob in enumerate(_BENFORD):
        p = (
            F.when(F.col("digit") == i + 1, F.lit(prob))
            if p is None
            else p.when(F.col("digit") == i + 1, F.lit(prob))
        )
    joined = c.crossJoin(F.broadcast(t)).withColumn("p_benford", p)
    exp = F.col("total") * F.col("p_benford")
    return joined.select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("p_observed"),
        "p_benford",
        F.round((F.col("n") - exp) * (F.col("n") - exp) / exp, 6).alias(
            "chi2_term"
        ),
    ).orderBy("digit")


_KS_CRIT = 1.358  # Kolmogorov c(alpha) at alpha = 0.05


@register(
    "ks_two_sample_price_drift",
    oracle=f"""
        WITH v AS (
            SELECT o_totalprice AS val,
                   CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c2
            FROM orders
            GROUP BY 1
        ),
        e AS (
            SELECT SUM(c1) OVER (ORDER BY val) AS r1,
                   SUM(c2) OVER (ORDER BY val) AS r2
            FROM v
        ),
        t AS (
            SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2
            FROM v
        )
        SELECT t.n1, t.n2,
               round(MAX(ABS(e.r1 / CAST(t.n1 AS DOUBLE)
                             - e.r2 / CAST(t.n2 AS DOUBLE))), 6) AS ks_stat,
               round({_KS_CRIT} * sqrt((t.n1 + t.n2)
                     / CAST(t.n1 * t.n2 AS DOUBLE)), 6) AS crit_05,
               MAX(ABS(e.r1 / CAST(t.n1 AS DOUBLE)
                       - e.r2 / CAST(t.n2 AS DOUBLE)))
                   > {_KS_CRIT} * sqrt((t.n1 + t.n2)
                     / CAST(t.n1 * t.n2 AS DOUBLE)) AS reject_05
        FROM e, t
        GROUP BY t.n1, t.n2
    """,
    tags=("stats", "drift", "monitoring"),
)
def ks_two_sample_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test between the order-value
    distributions of URGENT vs non-urgent orders - the nonparametric drift
    check that sees SHAPE changes PSI's fixed buckets smear away
    (drift_psi_value_buckets is the binned twin). D = max |F1 - F2| over
    the merged jump points, evaluated right-continuously at every distinct
    value - exact, no sampling; reject at alpha=0.05 via the Kolmogorov
    asymptotic critical value 1.358*sqrt((n1+n2)/(n1*n2)).

    Scale: the global ECDF running sums use the repo's two-level scan, not
    a single-partition window - rows pre-aggregate to distinct values,
    values bucket by a fixed price-range prefix (bucket count bounded by
    the price DOMAIN, not the data), per-bucket windows run in parallel,
    and the bucket-offset frame (~60 rows) broadcasts back. Counts stay
    integer-exact until the two final divisions, so both engines compute
    identical doubles."""
    orders = load(spark, sf_dir, "orders")
    v = orders.groupBy(F.col("o_totalprice").alias("val")).agg(
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).cast("long").alias("c1"),
        F.sum(
            F.when(F.col("o_orderpriority") != "1-URGENT", 1).otherwise(0)
        ).cast("long").alias("c2"),
    )
    v = v.withColumn("bucket", F.floor(F.col("val") / 10000).cast("long"))
    # level 1: per-bucket totals -> exclusive offsets (bounded frame:
    # price-domain / 10000 buckets, ~60 rows).
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        v.groupBy("bucket")
        .agg(F.sum("c1").alias("b1"), F.sum("c2").alias("b2"))
        .select(
            "bucket",
            F.coalesce(F.sum("b1").over(wb), F.lit(0)).alias("off1"),
            F.coalesce(F.sum("b2").over(wb), F.lit(0)).alias("off2"),
        )
    )
    # level 2: within-bucket running sums (partitioned window) + offset.
    wv = (
        Window.partitionBy("bucket")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = v.join(F.broadcast(offsets), "bucket").select(
        (F.sum("c1").over(wv) + F.col("off1")).alias("r1"),
        (F.sum("c2").over(wv) + F.col("off2")).alias("r2"),
    )
    totals = v.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    d = F.max(
        F.abs(
            F.col("r1") / F.col("n1").cast("double")
            - F.col("r2") / F.col("n2").cast("double")
        )
    )
    crit = F.lit(_KS_CRIT) * F.sqrt(
        (F.col("n1") + F.col("n2")) / (F.col("n1") * F.col("n2")).cast("double")
    )
    return (
        ecdf.join(F.broadcast(totals))
        .groupBy("n1", "n2")
        .agg(
            F.round(d, 6).alias("ks_stat"),
            F.round(crit, 6).alias("crit_05"),
            (d > crit).alias("reject_05"),
        )
        .select("n1", "n2", "ks_stat", "crit_05", "reject_05")
    )


_MAD_SCALE = 1.4826  # normal-consistency constant: MAD * 1.4826 ~ sigma
_MAD_CUT = 3.0


@register(
    "mad_robust_outliers_by_segment",
    oracle=f"""
        WITH p AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(o.o_totalprice * 100 AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        med AS (
            SELECT segment,
                   quantile_cont(cents, 0.5) AS med_cents
            FROM p GROUP BY 1
        ),
        dev AS (
            SELECT p.segment, p.cents, ABS(p.cents - m.med_cents) AS adev,
                   m.med_cents
            FROM p JOIN med m ON p.segment = m.segment
        ),
        mad AS (
            SELECT segment, quantile_cont(adev, 0.5) AS mad_cents
            FROM dev GROUP BY 1
        )
        SELECT d.segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               MAX(d.med_cents) AS median_cents,
               MAX(x.mad_cents) AS mad_cents,
               CAST(SUM(CASE WHEN d.adev > {_MAD_CUT} * {_MAD_SCALE}
                                  * x.mad_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad x ON d.segment = x.segment
        GROUP BY d.segment
        ORDER BY d.segment
    """,
    tags=("stats", "anomaly", "robust"),
)
def mad_robust_outliers_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier screen per market segment - the
    heavy-tail-safe twin of events_user_zscore_anomalies: mean/stddev are
    themselves dragged by the outliers they hunt, median/MAD are not
    (50% breakdown point). Outlier = |x - median| > 3 * 1.4826 * MAD (the
    normal-consistency scaling). Exactness: prices integerize to cents, so
    both engines' interpolated medians are identical doubles (halves at
    worst, quarters for the MAD) and every comparison is over exact
    values; the outputs stay in raw cents - dividing a half-cent median
    by 100 lands exactly on a .005 and the engines round it in opposite
    directions.

    Scale: two grouped exact percentiles (the documented full-shuffle
    cost - approx_percentile is the 100 TB swap) + one broadcast join of
    the per-segment stats back onto the deviation stream."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    p = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    med = p.groupBy("segment").agg(
        F.percentile("cents", 0.5).alias("med_cents")
    )
    dev = p.join(F.broadcast(med), "segment").select(
        "segment", "med_cents", F.abs(F.col("cents") - F.col("med_cents")).alias("adev")
    )
    mad = dev.groupBy("segment").agg(
        F.percentile("adev", 0.5).alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "segment")
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max("med_cents").alias("median_cents"),
            F.max("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(
                    F.col("adev") > _MAD_CUT * _MAD_SCALE * F.col("mad_cents"), 1
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("segment")
    )


@register(
    "weighted_median_price_by_flag",
    oracle="""
        WITH v AS (
            SELECT l_returnflag AS returnflag, l_extendedprice AS val,
                   CAST(SUM(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS w
            FROM lineitem
            GROUP BY 1, 2
        ),
        c AS (
            SELECT returnflag, val, w,
                   SUM(w) OVER (PARTITION BY returnflag ORDER BY val) AS cw,
                   SUM(w) OVER (PARTITION BY returnflag) AS tw
            FROM v
        )
        SELECT returnflag,
               MIN(val) AS weighted_median_price,
               CAST(MAX(tw) AS BIGINT) AS total_weight
        FROM c
        WHERE 2 * cw >= tw
        GROUP BY returnflag
        ORDER BY returnflag
    """,
    tags=("stats", "A-ext", "percentile"),
)
def weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median price per return flag - the
    inventory-weighted center percentile() cannot express (each row
    counts quantity times, so a few huge-quantity lines move the median
    where the unweighted one sits still). Lower weighted median: the
    smallest value whose cumulative weight reaches half the total -
    picked by an integer predicate (2*cw >= tw), no interpolation, no
    floats anywhere.

    Scale: rows pre-aggregate to distinct (flag, value) with integer
    centiweights; the cumulative weights use the two-level scan - offsets
    over the per-(flag, price-kilobucket) totals frame (bounded by the
    price DOMAIN: ~105 buckets x 3 flags), within-bucket windows fully
    partitioned - no single-partition window touches data."""
    li = load(spark, sf_dir, "lineitem")
    v = li.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_extendedprice").alias("val"),
    ).agg(
        F.sum((F.col("l_quantity") * 100).cast("long")).cast("long").alias("w")
    )
    v = v.withColumn("bucket", F.floor(F.col("val") / 1000).cast("long"))
    wb = (
        Window.partitionBy("returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        v.groupBy("returnflag", "bucket")
        .agg(F.sum("w").alias("bw"))
        .select(
            "returnflag",
            "bucket",
            F.coalesce(F.sum("bw").over(wb), F.lit(0)).alias("off"),
        )
    )
    wv = (
        Window.partitionBy("returnflag", "bucket")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = v.groupBy("returnflag").agg(F.sum("w").cast("long").alias("tw"))
    c = (
        v.join(F.broadcast(offsets), ["returnflag", "bucket"])
        .select(
            "returnflag",
            "val",
            (F.sum("w").over(wv) + F.col("off")).alias("cw"),
        )
        .join(F.broadcast(tot), "returnflag")
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("returnflag")
        .agg(
            F.min("val").alias("weighted_median_price"),
            F.max("tw").cast("long").alias("total_weight"),
        )
        .orderBy("returnflag")
    )


_APX_QS = (0.5, 0.95, 0.99)
_APX_ACCS = (100, 1000, 10000)


@register(
    "approx_percentile_rank_error_sweep",
    oracle=f"""
        WITH e AS (
            SELECT
              PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
              PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95,
              PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99
            FROM orders
        )
        SELECT g.acc AS accuracy, g.q AS quantile,
               CASE g.q WHEN 0.5 THEN e.p50
                        WHEN 0.95 THEN e.p95
                        ELSE e.p99 END AS exact_value,
               TRUE AS rank_error_ok
        FROM e, (VALUES {", ".join(f"({a}, {q})" for a in _APX_ACCS for q in _APX_QS)})
                 AS g(acc, q)
        ORDER BY accuracy, quantile
    """,
    tags=("stats", "approx", "calibration"),
)
def approx_percentile_rank_error_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calibration sweep for the percentile 100 TB path: at accuracies
    100 / 1000 / 10000, certify that percentile_approx's RANK error -
    the quantity its Greenwald-Khanna contract actually bounds
    (|rank(v)/n - q| <= 1/accuracy) - holds at q = 0.5 / 0.95 / 0.99.
    Sketch VALUES are engine-specific, so (same pattern as
    median_price_approx) the compared columns are the exact percentile
    both engines compute plus a TRUE-pinned contract assertion; a hash
    mismatch means the sketch broke its published bound. This is the
    consult-before-retuning table for swapping exact percentile() out at
    scale, the percentile twin of dedup_lsh_threshold_sweep.

    Scale: one pass computes every rank - the nine approx values ride a
    1-row broadcast into conditional counts, all map-side combinable; the
    exact percentiles are the documented full-shuffle calibration cost."""
    orders = load(spark, sf_dir, "orders")
    qlist = list(_APX_QS)
    one = orders.agg(
        F.percentile("o_totalprice", qlist).alias("evs"),
        F.count("*").alias("n"),
        *[
            F.percentile_approx("o_totalprice", qlist, a).alias(f"avs_{a}")
            for a in _APX_ACCS
        ],
    )
    ranks = orders.crossJoin(F.broadcast(one)).agg(
        *[
            F.array(
                *[
                    F.sum(
                        F.when(
                            F.col("o_totalprice")
                            <= F.element_at(f"avs_{a}", i + 1),
                            1,
                        ).otherwise(0)
                    )
                    for i in range(len(qlist))
                ]
            ).alias(f"ranks_{a}")
            for a in _APX_ACCS
        ],
        F.first("evs").alias("evs"),
        F.first("n").alias("n"),
    )
    grid = spark.createDataFrame(
        [(a, i, int(round(q * 100))) for a in _APX_ACCS for i, q in enumerate(qlist)],
        "accuracy long, qi int, q100 long",
    )
    rank_col = F.when(
        F.col("accuracy") == _APX_ACCS[0],
        F.element_at(f"ranks_{_APX_ACCS[0]}", F.col("qi") + 1),
    ).when(
        F.col("accuracy") == _APX_ACCS[1],
        F.element_at(f"ranks_{_APX_ACCS[1]}", F.col("qi") + 1),
    ).otherwise(F.element_at(f"ranks_{_APX_ACCS[2]}", F.col("qi") + 1))
    return (
        grid.crossJoin(F.broadcast(ranks))
        .select(
            "accuracy",
            (F.col("q100") / F.lit(100.0)).alias("quantile"),
            F.element_at("evs", F.col("qi") + 1).alias("exact_value"),
            # |rank/n - q| <= 1/acc, held INCLUSIVELY in pure integer
            # arithmetic (the sketch legitimately sits exactly ON its
            # bound; a double compare flips on the epsilon overshoot):
            # |100r - q100*n| * acc <= 100 * n.
            (
                F.abs(
                    100 * rank_col.cast("long")
                    - F.col("q100") * F.col("n")
                )
                * F.col("accuracy")
                <= 100 * F.col("n")
            ).alias("rank_error_ok"),
        )
        .orderBy("accuracy", "quantile")
    )


_EQ_QS = ((50, "p50"), (90, "p90"), (99, "p99"))


@register(
    "exact_quantiles_bucketed",
    oracle="""
        WITH v AS (
            SELECT o_totalprice AS val, CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1
        ),
        e AS (
            SELECT val, SUM(c) OVER (ORDER BY val) AS cw,
                   SUM(c) OVER () AS n
            FROM v
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               MIN(CASE WHEN 100 * cw >= 50 * n THEN val END) AS p50,
               MIN(CASE WHEN 100 * cw >= 90 * n THEN val END) AS p90,
               MIN(CASE WHEN 100 * cw >= 99 * n THEN val END) AS p99
        FROM e
    """,
    tags=("stats", "percentile", "A-ext"),
)
def exact_quantiles_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of order value WITHOUT the percentile() plan
    shape: percentile() shuffles every group value to one aggregation
    state, while this computes discrete quantiles (value at rank
    ceil(q*n)) from per-value counts + the two-level bucketed running
    count - every stage partitioned, the bucket-offset frame bounded by
    the price DOMAIN. This is the scale path when EXACT percentiles are
    required and approx_percentile's rank error (see the contract sweep)
    is not acceptable; all three quantiles come from ONE pass over the
    distinct-value frame via integer rank predicates (100*cw >= q*n -
    exactly ceil, no floats).

    The weighted-median query is this machinery with quantity weights;
    here weight = row count, three thresholds."""
    orders = load(spark, sf_dir, "orders")
    v = orders.groupBy(F.col("o_totalprice").alias("val")).agg(
        F.count("*").cast("long").alias("c")
    )
    v = v.withColumn("bucket", F.floor(F.col("val") / 1000).cast("long"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        v.groupBy("bucket")
        .agg(F.sum("c").alias("bc"))
        .select(
            "bucket",
            F.coalesce(F.sum("bc").over(wb), F.lit(0)).alias("off"),
        )
    )
    wv = (
        Window.partitionBy("bucket")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = v.agg(F.sum("c").cast("long").alias("n"))
    e = (
        v.join(F.broadcast(offsets), "bucket")
        .select("val", (F.sum("c").over(wv) + F.col("off")).alias("cw"))
        .join(F.broadcast(tot))
    )
    return e.agg(
        F.max("n").cast("long").alias("n"),
        *[
            F.min(
                F.when(100 * F.col("cw") >= q * F.col("n"), F.col("val"))
            ).alias(name)
            for q, name in _EQ_QS
        ],
    )


_WILSON_Z = "1.96"  # 95% two-sided normal quantile, identical literal in both engines


@register(
    "conversion_wilson_ci_by_channel",
    oracle=f"""
        WITH first_touch AS (
            SELECT event_type AS channel, user_id, MIN(ts) AS first_ts
            FROM events WHERE event_type <> 'purchase'
            GROUP BY event_type, user_id
        ),
        last_purchase AS (
            SELECT user_id, MAX(ts) AS last_p FROM events
            WHERE event_type = 'purchase' GROUP BY user_id
        ),
        flags AS (
            SELECT f.channel, f.user_id,
                   CASE WHEN p.last_p > f.first_ts THEN 1 ELSE 0 END AS conv
            FROM first_touch f LEFT JOIN last_purchase p
              ON f.user_id = p.user_id
        ),
        counts AS (
            SELECT channel, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS k
            FROM flags GROUP BY channel
        )
        SELECT channel, n AS n_users, k AS n_converted,
               (CAST(k AS DOUBLE) / n) AS conv_rate,
               ((CAST(k AS DOUBLE) / n) + ({_WILSON_Z} * {_WILSON_Z}) / (2.0 * n))
                   / (1.0 + ({_WILSON_Z} * {_WILSON_Z}) / n)
                 - ({_WILSON_Z} * sqrt(
                       ((CAST(k AS DOUBLE) / n) * (1.0 - (CAST(k AS DOUBLE) / n))) / n
                       + ({_WILSON_Z} * {_WILSON_Z}) / (4.0 * n * n)))
                   / (1.0 + ({_WILSON_Z} * {_WILSON_Z}) / n) AS wilson_low,
               ((CAST(k AS DOUBLE) / n) + ({_WILSON_Z} * {_WILSON_Z}) / (2.0 * n))
                   / (1.0 + ({_WILSON_Z} * {_WILSON_Z}) / n)
                 + ({_WILSON_Z} * sqrt(
                       ((CAST(k AS DOUBLE) / n) * (1.0 - (CAST(k AS DOUBLE) / n))) / n
                       + ({_WILSON_Z} * {_WILSON_Z}) / (4.0 * n * n)))
                   / (1.0 + ({_WILSON_Z} * {_WILSON_Z}) / n) AS wilson_high
        FROM counts
        ORDER BY channel
    """,
    tags=("A-ext", "stats"),
)
def conversion_wilson_ci_by_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel conversion rate with a Wilson 95% score interval: a user
    'converts' from a channel if any purchase follows their first event of
    that type. Wilson bounds are the release-gating form (valid at small n
    and extreme p, unlike the Wald interval the z-test family uses).

    Determinism: k and n are exact integers; the Wilson formula is spelled
    with the IDENTICAL literal z, parenthesization, and operation order in
    both engines — every intermediate double is bit-identical because
    +,*,/,sqrt are all correctly rounded IEEE ops on identical operands
    (no transcendental appears anywhere).

    Scale shape: two map-side-combinable aggregates (first touch per
    (channel, user), last purchase per user) joined on user_id, then a
    |channels|-row report."""
    ev = load(spark, sf_dir, "events")
    first_touch = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy(F.col("event_type").alias("channel"), "user_id")
        .agg(F.min("ts").alias("first_ts"))
    )
    last_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_p"))
    )
    flags = first_touch.join(last_purchase, "user_id", "left").select(
        "channel",
        F.when(F.col("last_p") > F.col("first_ts"), 1).otherwise(0).alias(
            "conv"
        ),
    )
    counts = flags.groupBy("channel").agg(
        F.count("*").alias("n"), F.sum("conv").alias("k")
    )
    z = F.lit(1.96)
    n, k = F.col("n"), F.col("k")
    p = k.cast("double") / n
    center = (p + (z * z) / (2.0 * n)) / (F.lit(1.0) + (z * z) / n)
    half = (
        z
        * F.sqrt((p * (F.lit(1.0) - p)) / n + (z * z) / (4.0 * n * n))
    ) / (F.lit(1.0) + (z * z) / n)
    return counts.select(
        "channel",
        n.alias("n_users"),
        k.alias("n_converted"),
        p.alias("conv_rate"),
        (center - half).alias("wilson_low"),
        (center + half).alias("wilson_high"),
    ).orderBy("channel")


@register(
    "spearman_price_size_corr",
    oracle="""
        WITH ranked AS (
            SELECT p_brand,
                   ROW_NUMBER() OVER (PARTITION BY p_brand
                       ORDER BY p_retailprice, p_partkey) AS rp,
                   ROW_NUMBER() OVER (PARTITION BY p_brand
                       ORDER BY p_size, p_partkey) AS rs
            FROM part
        ),
        stats AS (
            SELECT p_brand, COUNT(*) AS n,
                   SUM(CAST((rp - rs) * (rp - rs) AS DECIMAL(38,0))) AS d2
            FROM ranked GROUP BY p_brand
        )
        SELECT p_brand, n AS n_parts,
               1.0 - CAST(6 * d2 AS DOUBLE)
                   / CAST(CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0))
                          * n - 1) AS DOUBLE) AS spearman_rho
        FROM stats WHERE n > 1
        ORDER BY p_brand
    """,
    tags=("A-ext", "stats"),
)
def spearman_price_size_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between retail price and size per brand —
    the monotone-association screen (robust to outliers/nonlinearity, the
    rank companion to stats_exact_linear_fit's Pearson machinery). Ranks
    are ROW_NUMBER with the deterministic (value, p_partkey) tie-break, so
    rho = 1 - 6*sum(d^2) / (n(n^2-1)) is EXACT integer arithmetic up to
    one final double division (both engines bit-identical). The tie-broken
    rank convention is documented in lieu of the tie-averaged variant,
    whose fractional average ranks would reintroduce float sums.

    Scale shape: two per-brand rank windows over the part dim (partitioned,
    bounded by brand group size), one map-side-combinable aggregate;
    d^2 sums accumulate as DECIMAL(38,0) (n(n^2-1) passes 2^63 at ~2M rows
    per group)."""
    w_price = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    w_size = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    ranked = load(spark, sf_dir, "part").select(
        "p_brand",
        F.row_number().over(w_price).alias("rp"),
        F.row_number().over(w_size).alias("rs"),
    )
    d = F.col("rp") - F.col("rs")
    stats = ranked.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum((d * d).cast("decimal(38,0)")).alias("d2"),
    )
    n_dec = F.col("n").cast("decimal(38,0)")
    return (
        stats.filter(F.col("n") > 1)
        .select(
            "p_brand",
            F.col("n").alias("n_parts"),
            (
                F.lit(1.0)
                - (6 * F.col("d2")).cast("double")
                / (n_dec * (n_dec * F.col("n") - 1)).cast("double")
            ).alias("spearman_rho"),
        )
        .orderBy("p_brand")
    )


_CUPED_SPLIT = "2024-01-16"


@register(
    "cuped_adjusted_conversion",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                             IN ('0','1','2','3','4','5','6','7')
                        THEN 'A' ELSE 'B' END AS variant,
                   SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END) AS x,
                   SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END) AS y
            FROM events GROUP BY user_id
        ),
        pooled AS (
            SELECT COUNT(*) AS n,
                   SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                   SUM(CAST(y AS DECIMAL(38,0))) AS sy,
                   SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
                   SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
            FROM per_user
        ),
        theta AS (
            SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) AS th,
                   CAST(sx AS DOUBLE) / n AS xbar_pool
            FROM pooled
        ),
        per_variant AS (
            SELECT variant, COUNT(*) AS n_users,
                   SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                   SUM(CAST(y AS DECIMAL(38,0))) AS sy,
                   SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
                   SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                   SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
            FROM per_user GROUP BY variant
        )
        SELECT variant, n_users,
               (CAST(sy AS DOUBLE) / n_users) / 100.0 AS mean_raw,
               ((CAST(sy AS DOUBLE) / n_users)
                - t.th * ((CAST(sx AS DOUBLE) / n_users) - t.xbar_pool))
                   / 100.0 AS mean_cuped,
               1.0 - (
                   (CAST(n_users * syy - sy * sy AS DOUBLE)
                    - 2.0 * t.th * CAST(n_users * sxy - sx * sy AS DOUBLE)
                    + t.th * t.th * CAST(n_users * sxx - sx * sx AS DOUBLE))
                   / CAST(n_users * syy - sy * sy AS DOUBLE)
               ) AS variance_reduction
        FROM per_variant CROSS JOIN theta t
        ORDER BY variant
    """,
    tags=("A-ext", "stats", "experiment"),
)
def cuped_adjusted_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for an A/B readout: per-user pre-period
    spend (before 2024-01-16) is the covariate, post-period spend the metric;
    theta = cov(x,y)/var(x) is fitted on the pooled population and each
    variant reports its raw mean, CUPED-adjusted mean, and the achieved
    variance reduction. Variant assignment is the repo's deterministic
    md5-hex-band split (first hex digit 0-7 -> A, else B).

    Numerics: x and y are integer cents; every moment (sums, cross/self
    products) accumulates as DECIMAL(38,0) — exact and order-independent,
    with n*sxy-level products passing 2^63 well below cluster scale — and
    theta / the means / the variance identity evaluate in doubles with the
    IDENTICAL expression tree in both engines.

    Scale shape: one map-side-combinable per-user aggregate over the fact,
    one 1-row pooled moment frame broadcast onto a |variants|-row report."""
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0)).alias("y"),
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                *"01234567"
            ),
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "x",
        "y",
    )
    d38 = "decimal(38,0)"
    pooled = per_user.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
    )
    theta = pooled.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("th"),
        (F.col("sx").cast("double") / F.col("n")).alias("xbar_pool"),
    )
    per_variant = per_user.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
    )
    n_u = F.col("n_users")
    var_y = (n_u * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    cov_v = (n_u * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    var_x = (n_u * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    th = F.col("th")
    return (
        per_variant.crossJoin(F.broadcast(theta))
        .select(
            "variant",
            "n_users",
            ((F.col("sy").cast("double") / n_u) / 100.0).alias("mean_raw"),
            (
                (
                    (F.col("sy").cast("double") / n_u)
                    - th
                    * ((F.col("sx").cast("double") / n_u) - F.col("xbar_pool"))
                )
                / 100.0
            ).alias("mean_cuped"),
            (
                F.lit(1.0)
                - (var_y - 2.0 * th * cov_v + th * th * var_x) / var_y
            ).alias("variance_reduction"),
        )
        .orderBy("variant")
    )


@register(
    "anova_f_value_by_priority",
    oracle="""
        WITH vals AS (
            SELECT o_orderpriority AS g,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        per_group AS (
            SELECT g, COUNT(*) AS n, SUM(cents) AS s,
                   SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS q,
                   CAST(ROUND((CAST(SUM(cents) AS DOUBLE) * SUM(cents)
                               / COUNT(*)) / 1e9) AS BIGINT) AS t_pin
            FROM vals GROUP BY g
        ),
        totals AS (
            SELECT COUNT(*) AS k,
                   CAST(SUM(n) AS BIGINT) AS n_total,
                   SUM(s) AS s_total,
                   SUM(q) AS q_total,
                   CAST(SUM(t_pin) AS BIGINT) AS t_sum
            FROM per_group
        ),
        parts AS (
            SELECT k, n_total,
                   (CAST(t_sum - CAST(ROUND((CAST(s_total AS DOUBLE) * s_total
                                             / n_total) / 1e9) AS BIGINT)
                         AS DOUBLE) * 1e9) / 10000.0 AS ssb,
                   (CAST(q_total AS DOUBLE)
                    - CAST(t_sum AS DOUBLE) * 1e9) / 10000.0 AS ssw
            FROM totals
        )
        SELECT k AS k_groups, n_total,
               ssb, ssw,
               (ssb / (k - 1)) / (ssw / (n_total - k)) AS f_stat,
               ssb / (ssb + ssw) AS eta_squared
        FROM parts
    """,
    tags=("A-ext", "stats"),
)
def anova_f_value_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order value across the five order priorities —
    between/within sums of squares, the F statistic, and eta-squared
    (completes the classical-test family beside chi2 (categorical), the
    z-test (proportions), and KS (distributional)). Sums of squares report
    in currency^2 units (cents^2 / 1e4).

    Numerics: per-group moments are exact (BIGINT sums; DECIMAL(38,0) for
    the squared sums, which pass 2^63); each group's S_g^2/n_g term — the
    one unavoidable rational — is computed as an identical double
    expression then PINNED to a 1e9-unit integer grid before the
    cross-group summation, so the 5-term reduction is exact integer
    arithmetic (grid keeps ~12 significant digits of terms bounded by
    ~3e21; the pinned sum stays below 2^53 through sf1.0 bench scale).

    Scale shape: one map-side-combinable aggregate over the fact to 5
    group rows, then scalar arithmetic."""
    vals = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per_group = vals.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "q"
        ),
    ).withColumn(
        "t_pin",
        F.round(
            (F.col("s").cast("double") * F.col("s") / F.col("n")) / 1e9
        ).cast("long"),
    )
    totals = per_group.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_total"),
        F.sum("s").alias("s_total"),
        F.sum("q").alias("q_total"),
        F.sum("t_pin").alias("t_sum"),
    )
    grand_pin = F.round(
        (F.col("s_total").cast("double") * F.col("s_total") / F.col("n_total"))
        / 1e9
    ).cast("long")
    parts = totals.select(
        "k",
        "n_total",
        (
            (F.col("t_sum") - grand_pin).cast("double") * 1e9 / 10000.0
        ).alias("ssb"),
        (
            (
                F.col("q_total").cast("double")
                - F.col("t_sum").cast("double") * 1e9
            )
            / 10000.0
        ).alias("ssw"),
    )
    return parts.select(
        F.col("k").alias("k_groups"),
        "n_total",
        "ssb",
        "ssw",
        (
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_total") - F.col("k")))
        ).alias("f_stat"),
        (F.col("ssb") / (F.col("ssb") + F.col("ssw"))).alias("eta_squared"),
    )
