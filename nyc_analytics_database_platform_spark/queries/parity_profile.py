"""Table profiling: the ANALYZE-style column-statistics pass a warehouse
runs to feed its cost model and data-quality dashboards (the engine-side
equivalent of the reference's implicit reliance on PostgreSQL's planner
statistics; reference schema constraints: schema.sql:31-35,43-44,70-73).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register

# Profiled columns of orders: (name, is_numeric). min/max are rendered as
# strings so every column fits one result schema; numerics use a plain
# float rendering and timestamps ISO dates to stay engine-neutral.
_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "long"),
    ("o_custkey", "long"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "money"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _render_sql(col: str, kind: str) -> tuple[str, str]:
    if kind == "money":
        return (
            f"CAST(CAST(ROUND(MIN({col}) * 100) AS BIGINT) AS VARCHAR)",
            f"CAST(CAST(ROUND(MAX({col}) * 100) AS BIGINT) AS VARCHAR)",
        )
    if kind == "ts":
        return (
            f"strftime(MIN({col}), '%Y-%m-%d')",
            f"strftime(MAX({col}), '%Y-%m-%d')",
        )
    return f"CAST(MIN({col}) AS VARCHAR)", f"CAST(MAX({col}) AS VARCHAR)"


_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{col}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({col}) AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
           {_render_sql(col, kind)[0]} AS min_val,
           {_render_sql(col, kind)[1]} AS max_val
    FROM orders
    """
    for col, kind in _COLS
)


def _render_spark(col: str, kind: str) -> tuple[F.Column, F.Column]:
    if kind == "money":
        return (
            F.round(F.min(col) * 100).cast("long").cast("string"),
            F.round(F.max(col) * 100).cast("long").cast("string"),
        )
    if kind == "ts":
        return (
            F.date_format(F.min(col), "yyyy-MM-dd"),
            F.date_format(F.max(col), "yyyy-MM-dd"),
        )
    return F.min(col).cast("string"), F.max(col).cast("string")


@register(
    "profile_orders_columns",
    oracle=f"SELECT * FROM ({_ORACLE}) ORDER BY col_name",
    tags=("profiling", "quality", "A-ext"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profile of the orders table: row count, null count,
    exact NDV, and rendered min/max per column - one result row per column.

    Scale shape: ONE scan computes every per-column aggregate in a single
    wide agg (count_distinct adds an Expand but no extra scan); the oracle's
    6-scan UNION ALL is the shape we deliberately avoid. At 100 TB the exact
    NDVs would flip to approx_count_distinct (HLL, fixed-size state) - the
    exact form is kept here because the oracle must agree bit-for-bit.
    Money min/max are rendered as integer cents (engine-neutral; a raw
    DOUBLE-to-string render differs between engines: '1.0' vs '1')."""
    orders = load(spark, sf_dir, "orders")
    aggs: list[F.Column] = [F.count("*").alias("n_rows")]
    for col, kind in _COLS:
        lo, hi = _render_spark(col, kind)
        aggs += [
            (F.count("*") - F.count(col)).alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__ndv"),
            lo.alias(f"{col}__min"),
            hi.alias(f"{col}__max"),
        ]
    wide = orders.agg(*aggs)
    # Pivot the single wide row into one row per column: stack() is a
    # compile-time reshape of a 1-row frame - no shuffle, no second scan.
    stack_args = ", ".join(
        f"'{col}', {col}__nulls, {col}__ndv, {col}__min, {col}__max"
        for col, _ in _COLS
    )
    return (
        wide.select(
            "n_rows",
            F.expr(
                f"stack({len(_COLS)}, {stack_args}) AS "
                "(col_name, n_nulls, ndv, min_val, max_val)"
            ),
        )
        .select("col_name", "n_rows", "n_nulls", "ndv", "min_val", "max_val")
        .orderBy("col_name")
    )


@register(
    "observe_lineitem_scan_metrics",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_sum,
               CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT)
                   AS n_returned
        FROM lineitem
    """,
    tags=("profile", "observe"),
)
def observe_lineitem_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API surface: accumulator-style metrics collected
    DURING a pass (here a count() action over the scan) with zero extra
    jobs - the engine's way to audit a pipeline run without re-reading
    100 TB. The observed metrics come back to the driver as a dict; the
    query re-emits them as a one-row frame the oracle reproduces with plain
    aggregates, proving the in-flight metrics equal a dedicated scan."""
    from pyspark.sql import Observation

    from nyc_analytics_database_platform_spark.functions.numeric import exact_sum

    li = load(spark, sf_dir, "lineitem")
    obs = Observation("lineitem_scan")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum("l_quantity").alias("qty_sum"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
    )
    observed.count()  # the single pass that feeds the observation
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["qty_sum"], m["n_returned"])],
        "n_rows long, qty_sum double, n_returned long",
    )


_FP_MOD = 2305843009213693951  # 2^61 - 1 (Mersenne prime)


def fingerprint_row_repr():
    """Canonical row rendering hashed by table_fingerprint_orders. Money is
    integer cents (ROUND(x*100) AS BIGINT) BEFORE stringification: a double
    >= 1e7 renders '1.0E7' in the JVM but '10000000.0' in DuckDB, so a
    float's string form must never reach the hash. Exposed as a function so
    the regression test (tests/test_round4_ops.py) can pin the >= 1e7 edge
    on a crafted frame."""
    return F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
    )


@register(
    "table_fingerprint_orders",
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST('0x' || substr(md5(
                        CAST(o_orderkey AS VARCHAR) || '|' ||
                        o_orderstatus || '|' ||
                        CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR)), 1, 15)
                    AS UBIGINT)) % {_FP_MOD} AS BIGINT) AS fingerprint
        FROM orders
    """,
    tags=("profile", "integrity", "fingerprint"),
)
def table_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint that SCALES: per-row md5 -> top
    60 bits as an integer -> modular SUM. Unlike the sorted-string-agg
    digest (etl_orc_roundtrip), nothing is collected or sorted - the
    fingerprint is a map-side-combinable aggregate over any partitioning,
    the one-number integrity check you can afford on every 100 TB snapshot
    (compare fingerprints across replicas/engines before trusting a diff).
    Hex->int via conv() here and '0x' cast in DuckDB; the 2^61-1 modulus
    keeps the exact sum inside BIGINT on both engines. The money column is
    canonicalized to integer cents (ROUND(x*100) AS BIGINT - the repo's
    cents convention) before hashing: double->string rendering diverges
    between JDK and DuckDB at >= 1e7 ('1.0E7' vs '10000000.0'), so the
    fingerprint never hashes a float's string form."""
    orders = load(spark, sf_dir, "orders")
    row_repr = fingerprint_row_repr()
    h60 = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    return orders.agg(
        F.count("*").alias("n_rows"),
        (F.sum(h60) % F.lit(_FP_MOD)).cast("long").alias("fingerprint"),
    )


@register(
    "join_key_skew_report",
    oracle="""
        WITH li AS (
            SELECT COUNT(*) AS sz FROM lineitem GROUP BY l_orderkey
        ),
        oc AS (
            SELECT COUNT(*) AS sz FROM orders GROUP BY o_custkey
        )
        SELECT 'lineitem.l_orderkey' AS join_key,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(sz) AS BIGINT) AS max_size,
               CAST(PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY sz)
                    AS BIGINT) AS p99_size,
               CAST(MAX(sz) AS DOUBLE) / SUM(sz) AS max_share
        FROM li
        UNION ALL
        SELECT 'orders.o_custkey',
               CAST(COUNT(*) AS BIGINT),
               CAST(MAX(sz) AS BIGINT),
               CAST(PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY sz)
                    AS BIGINT),
               CAST(MAX(sz) AS DOUBLE) / SUM(sz)
        FROM oc
        ORDER BY join_key
    """,
    tags=("profile", "skew", "planning"),
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic - the measurement behind the
    salt-or-don't-salt decision (operators/joins.salted_join, AQE skew
    thresholds): per candidate key, group-size max / p99 / max-share. Two
    aggregations per key (sizes, then stats over sizes - both shuffles on
    small intermediates); p99 is PERCENTILE_DISC semantics computed from
    the size-value histogram (bounded by max group size, so the ordering
    window runs on metadata, never on the billion-key frame), max_share an
    IEEE-exact division."""

    def audit(df: DataFrame, col: str, label: str) -> DataFrame:
        sizes = df.groupBy(col).agg(F.count("*").alias("sz"))
        # Exact discrete p99 WITHOUT ordering the per-key frame (keys can be
        # billions at 100 TB): aggregate sizes into a size-VALUE histogram
        # (cardinality bounded by max group size - metadata scale), then a
        # cumulative window over that tiny frame picks the first size whose
        # cumulative key-count reaches ceil(0.99 * n_keys).
        hist = sizes.groupBy("sz").agg(F.count("*").alias("cnt"))
        w = Window.orderBy("sz").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = hist.select(
            "sz",
            F.sum("cnt").over(w).alias("cum"),
            F.sum("cnt").over(Window.partitionBy()).alias("n"),
        )
        p99 = (
            cum.filter(F.col("cum") >= F.ceil(F.lit(0.99) * F.col("n")))
            .agg(F.min("sz").alias("p99_size"))
        )
        stats = sizes.agg(
            F.count("*").alias("n_keys"),
            F.max("sz").alias("max_size"),
            (F.max("sz").cast("double") / F.sum("sz")).alias("max_share"),
        )
        return stats.crossJoin(F.broadcast(p99)).select(
            F.lit(label).alias("join_key"),
            "n_keys",
            "max_size",
            "p99_size",
            "max_share",
        )

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        audit(li, "l_orderkey", "lineitem.l_orderkey")
        .unionByName(audit(orders, "o_custkey", "orders.o_custkey"))
        .orderBy("join_key")
    )


_KANON_K = 5


@register(
    "k_anonymity_audit",
    oracle=f"""
        WITH g AS (
            SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_risky_groups,
               CAST(COALESCE(SUM(CASE WHEN n < {_KANON_K} THEN n END), 0)
                    AS BIGINT) AS n_risky_rows,
               CAST(MIN(n) AS BIGINT) AS min_group_size
        FROM g
    """,
    tags=("quality", "privacy", "reporting"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (nation, market segment): how many equivalence classes fall below
    k={_KANON_K} members - rows in those classes are re-identifiable by
    the quasi-identifiers alone, the release-gating check a governance
    review runs before publishing an extract (the reference's
    Geographic_Area natural key plays the same quasi-identifier role for
    NYC parcels). The remedy is generalization (coarsen a column) or
    suppression (drop risky rows) until n_risky_groups = 0.

    Scale: one map-side-combinable groupBy over the quasi-identifier
    domain (bounded: nations x segments) + a 4-column scalar rollup of
    that bounded frame."""
    cust = load(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    return g.agg(
        F.count("*").alias("n_groups"),
        F.count(F.when(F.col("n") < _KANON_K, 1)).alias("n_risky_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n") < _KANON_K, F.col("n"))), F.lit(0)
        ).cast("long").alias("n_risky_rows"),
        F.min("n").alias("min_group_size"),
    )


_LDIV_L = 3


@register(
    "l_diversity_audit",
    oracle=f"""
        WITH g AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000)
                                            AS BIGINT)) AS BIGINT) AS l
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN l < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_low_div_groups,
               CAST(COALESCE(SUM(CASE WHEN l < {_LDIV_L} THEN n END), 0)
                    AS BIGINT) AS n_exposed_rows,
               CAST(MIN(l) AS BIGINT) AS min_l
        FROM g
    """,
    tags=("quality", "privacy", "reporting"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit, the companion check to [k_anonymity_audit]:
    k-anonymity only bounds group SIZE, so a group of 50 rows that all
    share one sensitive value still leaks it (the homogeneity attack).
    Here the sensitive attribute is the account-balance band
    (floor(acctbal/1000), exact decimal arithmetic); a quasi-identifier
    group with fewer than l=3 distinct bands exposes its members'
    financial tier. Release gate: n_low_div_groups must be 0.

    Scale: COUNT(DISTINCT band) per group rewrites to a two-level
    aggregate (distinct expand then count) - both levels map-side
    combinable, output bounded by the quasi-identifier domain."""
    cust = load(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000).cast("long")
        ).alias("l"),
    )
    return g.agg(
        F.count("*").alias("n_groups"),
        F.count(F.when(F.col("l") < _LDIV_L, 1)).alias("n_low_div_groups"),
        F.coalesce(
            F.sum(F.when(F.col("l") < _LDIV_L, F.col("n"))), F.lit(0)
        ).cast("long").alias("n_exposed_rows"),
        F.min("l").alias("min_l"),
    )


@register(
    "t_closeness_audit",
    oracle="""
        WITH joined AS (
            SELECT c.c_mktsegment AS segment, c.c_nationkey AS nk,
                   o.o_orderpriority AS prio
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        total AS (SELECT COUNT(*) AS t FROM joined),
        gdist AS (
            SELECT prio, COUNT(*) AS cnt FROM joined GROUP BY prio
        ),
        grp AS (
            SELECT segment, nk, COUNT(*) AS tg FROM joined
            GROUP BY segment, nk
        ),
        grp_prio AS (
            SELECT segment, nk, prio, COUNT(*) AS cnt_gp FROM joined
            GROUP BY segment, nk, prio
        ),
        diffs AS (
            SELECT g.segment, g.nk, g.tg,
                   ABS(COALESCE(gp.cnt_gp, 0) * t.t - gl.cnt * g.tg)
                       AS num_part
            FROM grp g
            CROSS JOIN total t
            JOIN gdist gl ON TRUE
            LEFT JOIN grp_prio gp
              ON gp.segment = g.segment AND gp.nk = g.nk
             AND gp.prio = gl.prio
        )
        SELECT d.segment, d.nk AS nationkey, d.tg AS n_rows,
               CAST(SUM(d.num_part) AS DOUBLE)
                   / (2.0 * d.tg * t.t) AS t_value,
               CASE WHEN CAST(SUM(d.num_part) AS DOUBLE)
                         / (2.0 * d.tg * t.t) > 0.2
                    THEN 1 ELSE 0 END AS breach
        FROM diffs d CROSS JOIN total t
        GROUP BY d.segment, d.nk, d.tg, t.t
        ORDER BY d.segment, nationkey
    """,
    tags=("F9", "privacy"),
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness privacy audit (companion to k_anonymity_audit /
    l_diversity_audit): for each quasi-identifier group (mktsegment x
    nation), the total-variation distance between the group's sensitive
    distribution (order priority) and the global one; groups with
    t > 0.2 are release breaches.

    Exact rational arithmetic: TVD = sum_p |cnt_gp*T - cnt_p*T_g| /
    (2*T_g*T) keeps the numerator in BIGINT over the common denominator
    (products bounded by |rows|^2 < 2^63 at any per-partition scale; the
    sum accumulates exactly), so the single final division produces
    bit-identical doubles in both engines.

    Scale: three map-side-combinable aggregates over one joined pass; the
    global distribution (|priorities| rows) broadcasts onto the group
    frame, so output is bounded by the QI domain."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    joined = (
        load(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nk"),
            F.col("o_orderpriority").alias("prio"),
        )
    )
    total = joined.agg(F.count("*").alias("t"))
    glob = joined.groupBy("prio").agg(F.count("*").alias("cnt"))
    grp = joined.groupBy("segment", "nk").agg(F.count("*").alias("tg"))
    grp_prio = joined.groupBy("segment", "nk", "prio").agg(
        F.count("*").alias("cnt_gp")
    )
    diffs = (
        grp.crossJoin(F.broadcast(glob))
        .join(
            grp_prio,
            ["segment", "nk", "prio"],
            "left",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "segment",
            "nk",
            "tg",
            "t",
            F.abs(
                F.coalesce(F.col("cnt_gp"), F.lit(0)) * F.col("t")
                - F.col("cnt") * F.col("tg")
            ).alias("num_part"),
        )
    )
    tv = F.sum("num_part").cast("double") / (
        2.0 * F.first("tg") * F.first("t")
    )
    return (
        diffs.groupBy("segment", "nk")
        .agg(
            F.first("tg").alias("n_rows"),
            tv.alias("t_value"),
            F.when(tv > 0.2, 1).otherwise(0).alias("breach"),
        )
        .select(
            "segment",
            F.col("nk").alias("nationkey"),
            "n_rows",
            "t_value",
            "breach",
        )
        .orderBy("segment", "nationkey")
    )
