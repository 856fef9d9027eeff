"""Set operations, grouping sets, distinct aggregation, the BBL-style key
codec, and JSON extraction (SURVEY.md sections 2.7, 2.8, 2.4 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.functions.codec import format_key, parse_key
from nyc_analytics_database_platform_spark.registry import register


@register(
    "set_ops_customer_segments",
    oracle="""
        WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        recent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        SELECT
            (SELECT COUNT(*) FROM (SELECT * FROM building UNION SELECT * FROM recent)) AS union_cnt,
            (SELECT COUNT(*) FROM (SELECT * FROM building INTERSECT SELECT * FROM recent)) AS intersect_cnt,
            (SELECT COUNT(*) FROM (SELECT * FROM building EXCEPT SELECT * FROM recent)) AS except_cnt
    """,
    tags=("SET-ext",),
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two customer key sets (SURVEY.md
    section 2.7 - free Spark built-ins, none in the reference)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    u = building.union(recent).distinct().count()
    i = building.intersect(recent).count()
    e = building.exceptAll(recent).distinct().count()
    return spark.createDataFrame(
        [(u, i, e)], "union_cnt bigint, intersect_cnt bigint, except_cnt bigint"
    )


@register(
    "rollup_region_nation",
    oracle="""
        SELECT COALESCE(r.r_name, 'ALL') AS region,
               COALESCE(n.n_name, 'ALL') AS nation,
               COUNT(*) AS num_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
        ORDER BY region, nation
    """,
    tags=("A-ext", "rollup"),
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (region -> nation -> grand total) - the
    grouping-sets extension (SURVEY.md section 2.4 note)."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("num_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "num_customers",
        )
        .orderBy("region", "nation")
    )


@register(
    "distinct_counts_per_nation",
    oracle="""
        SELECT n.n_name AS nation,
               COUNT(DISTINCT o.o_custkey) AS distinct_buyers,
               COUNT(DISTINCT strftime(date_trunc('month', o.o_orderdate), '%Y-%m'))
                 AS active_months
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation
    """,
    tags=("A-ext", "distinct"),
)
def distinct_counts_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISTINCT aggregation (SURVEY.md section 2.4 note). The 100 TB
    twin is approx_count_distinct (HLL) - see approx_distinct_buyers."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("o_custkey").alias("distinct_buyers"),
            F.countDistinct(
                F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
            ).alias("active_months"),
        )
        .orderBy("nation")
    )


_APPROX_DISTINCT_TOL = 0.05  # rel. error bound for rsd=0.01 HLL++ sketch


@register(
    "approx_distinct_buyers",
    # Tolerance oracle (same pattern as median_price_approx): exact count
    # from both engines + a TRUE-pinned within-tolerance assertion.
    oracle="""
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_buyers,
               TRUE AS within_tolerance
        FROM orders
    """,
    tags=("A-ext", "approx"),
)
def approx_distinct_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) - the 100 TB path for distinct
    counts: constant memory per group vs a full shuffle of distinct values.
    The result carries the exact count and a boolean asserting the sketch
    landed within _APPROX_DISTINCT_TOL relative error, which the oracle
    checks (HLL values are engine-specific, so the sketch value itself is
    not compared)."""
    orders = load(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_buyers"),
        F.countDistinct("o_custkey").alias("exact_buyers"),
    ).select(
        "exact_buyers",
        (
            F.abs(F.col("approx_buyers") - F.col("exact_buyers"))
            / F.col("exact_buyers")
            <= _APPROX_DISTINCT_TOL
        ).alias("within_tolerance"),
    )


@register(
    "key_codec_roundtrip",
    oracle="""
        SELECT code,
               CAST(string_split(code, '-')[1] AS INTEGER) AS part_a,
               CAST(string_split(code, '-')[2] AS INTEGER) AS part_b,
               CAST(string_split(code, '-')[3] AS INTEGER) AS part_c
        FROM (
            SELECT printf('%d-%05d-%04d',
                          CAST(l_orderkey % 5 + 1 AS BIGINT),
                          CAST(l_partkey AS BIGINT),
                          CAST(l_suppkey AS BIGINT)) AS code
            FROM lineitem
            WHERE l_orderkey < 100
        )
        ORDER BY code
    """,
    tags=("S4", "F5"),
)
def key_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BBL-style composite-key codec: 3 ints <-> 'b-bbbbb-llll' string
    (reference: server.py:104-109,118-127 - zero-padded BBL parse/format),
    as pure native expressions (format_string / split / cast - no UDF)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    coded = li.select(
        format_key(
            F.col("l_orderkey") % 5 + 1, F.col("l_partkey"), F.col("l_suppkey")
        ).alias("code")
    )
    parsed = parse_key(F.col("code"))
    return coded.select(
        "code",
        parsed[0].alias("part_a"),
        parsed[1].alias("part_b"),
        parsed[2].alias("part_c"),
    ).orderBy("code")


@register(
    "json_extract_event_props",
    oracle="""
        SELECT event_type,
               COUNT(*) AS num_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("F-ext", "json"),
)
def json_extract_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + aggregation over the events payload column
    (the reference's only JSON is the response boundary, server.py:495;
    this is the engine-side JSON surface)."""
    events = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("num_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "unpivot_nation_metrics",
    oracle="""
        WITH cust AS (
            SELECT c_nationkey,
                   CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) AS n_customers,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                       AS customer_balance
            FROM customer GROUP BY c_nationkey
        ),
        supp AS (
            SELECT s_nationkey,
                   CAST(COUNT(DISTINCT s_suppkey) AS DOUBLE) AS n_suppliers
            FROM supplier GROUP BY s_nationkey
        ),
        wide AS (
            SELECT n.n_name,
                   COALESCE(c.n_customers, 0) AS n_customers,
                   COALESCE(s.n_suppliers, 0) AS n_suppliers,
                   COALESCE(c.customer_balance, 0) AS customer_balance
            FROM nation n
            LEFT JOIN cust c ON c.c_nationkey = n.n_nationkey
            LEFT JOIN supp s ON s.s_nationkey = n.n_nationkey
        )
        SELECT n_name, metric, val FROM (
            SELECT n_name, 'customer_balance' AS metric, customer_balance AS val FROM wide
            UNION ALL
            SELECT n_name, 'n_customers' AS metric, n_customers AS val FROM wide
            UNION ALL
            SELECT n_name, 'n_suppliers' AS metric, n_suppliers AS val FROM wide
        )
        ORDER BY n_name, metric
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape via DataFrame.unpivot (the melt dual of
    pivot_status_by_nation): per-nation metric columns become
    (n_name, metric, val) rows. The wide build aggregates customer and
    supplier SEPARATELY before joining nation (no fan-out between the two
    dims), with the decimal-cast exact sum for order-independent balances.
    The unpivot itself is a zero-shuffle Expand - rows x metrics without an
    exchange - which is why long format is the scale-safe shape for metric
    stores. Oracle reproduces it with UNION ALL selects."""
    from nyc_analytics_database_platform_spark.functions.numeric import exact_sum

    nation = load(spark, sf_dir, "nation")
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_custkey").cast("double").alias("n_customers"),
            exact_sum("c_acctbal").alias("customer_balance"),
        )
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.countDistinct("s_suppkey").cast("double").alias("n_suppliers"))
    )
    wide = (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left")
        .join(supp, nation.n_nationkey == supp.s_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("customer_balance", F.lit(0.0)).alias("customer_balance"),
            F.coalesce("n_customers", F.lit(0.0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0.0)).alias("n_suppliers"),
        )
    )
    return wide.unpivot(
        "n_name",
        ["customer_balance", "n_customers", "n_suppliers"],
        "metric",
        "val",
    ).orderBy("n_name", "metric")


_REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")


@register(
    "transpose_region_customer_counts",
    oracle=f"""
        WITH per AS (
            SELECT r.r_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers
            FROM region r
            LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
            LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
            GROUP BY r.r_name
        )
        SELECT 'n_customers' AS key,
               {", ".join(
                   f'''MAX(CASE WHEN r_name = '{r}' THEN n_customers END) AS "{r}"'''
                   for r in _REGIONS
               )}
        FROM per
    """,
    tags=("reshape", "spark4"),
)
def transpose_region_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 DataFrame.transpose: the customers-per-region 5-row frame
    flipped so region names become columns (key column carries the former
    metric name) - the wide-report reshape dual of unpivot_nation_metrics.
    The LEFT JOINs guarantee all five region columns exist on both engines
    even for an empty customer slice. transpose() collects the index
    column to the driver to derive the schema - bounded by the region
    cardinality (5), the same driver-boundary contract as the
    presentation-layer nyc/api composites."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    per = (
        region.join(
            nation, nation["n_regionkey"] == region["r_regionkey"], "left"
        )
        .join(cust, cust["c_nationkey"] == nation["n_nationkey"], "left")
        .groupBy("r_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )
    return per.transpose()


@register(
    "listagg_nations_per_region",
    oracle="""
        SELECT r.r_name AS region,
               string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY region
    """,
    tags=("sql-surface", "spark4", "A-ext"),
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 listagg (SQL:2016 LISTAGG / string_agg): ordered
    string concatenation per group - the report-formatting aggregate the
    reference builds in Python response handlers (server.py's joined
    address lists). WITHIN GROUP ordering makes the result deterministic
    regardless of partitioning; the group count bounds the concatenated
    width, so this stays a plain one-shuffle aggregate at any scale."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    return (
        region.join(nation, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
                "nations"
            ),
            F.count("*").alias("n_nations"),
        )
        .orderBy("region")
    )


@register(
    "set_ops_all_multiset",
    oracle="""
        WITH a AS (SELECT o_orderpriority AS p FROM orders
                   WHERE o_orderstatus = 'O'),
        b AS (SELECT o_orderpriority AS p FROM orders
              WHERE o_orderstatus = 'P')
        SELECT
            (SELECT COUNT(*) FROM (SELECT * FROM a UNION ALL SELECT * FROM b))
                AS union_all_cnt,
            (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
                AS intersect_all_cnt,
            (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
                AS except_all_a_cnt,
            (SELECT COUNT(*) FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a))
                AS except_all_b_cnt
    """,
    tags=("SET-ext",),
)
def set_ops_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations (the ALL variants set_ops_customer_
    segments' distinct forms don't exercise): order-priority multisets of
    the open vs in-progress order populations, compared with UNION ALL /
    INTERSECT ALL / EXCEPT ALL multiplicity arithmetic — intersect keeps
    min(count_a, count_b) copies per value, except keeps the positive
    surplus.

    Scale shape: Spark plans INTERSECT ALL / EXCEPT ALL as one hash
    aggregate per side plus a generate step on the min/surplus counts (no
    row-by-row matching); all four counts reduce in one job each."""
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("p")
    )
    b = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_orderpriority").alias("p")
    )
    u = a.unionAll(b).count()
    i = a.intersectAll(b).count()
    ea = a.exceptAll(b).count()
    eb = b.exceptAll(a).count()
    return spark.createDataFrame(
        [(u, i, ea, eb)],
        "union_all_cnt bigint, intersect_all_cnt bigint, "
        "except_all_a_cnt bigint, except_all_b_cnt bigint",
    )
