"""TPC-H breadth beyond Q1/Q3/Q4/Q5/Q18 (parity_tpch.py, parity_sql.py):
the subquery/decorrelation family Q13/Q17/Q21/Q22 plus the join-shape
family Q7/Q10/Q14, adapted to the driver tables (no o_comment /
l_commitdate / c_phone columns - each query keeps the reference
benchmark's *plan shape* and swaps the filter onto an available column).

These exercise the patterns a warehouse engine must plan well: outer-join
aggregation (Q13), correlated scalar aggregate (Q17), correlated EXISTS +
NOT EXISTS over the same fact (Q21), scalar-subquery crossjoin plus anti
join (Q22), double-role dimension join with a symmetric OR predicate (Q7),
selective multi-join top-k (Q10), and conditional-share aggregation (Q14).
All numeric comparisons against computed averages are rewritten into
integer-cent arithmetic so both engines make bit-identical keep/drop
decisions (a double AVG is order-dependent in the last ulp - a boundary
row could differ between Spark and the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register


@register(
    "tpch_q13_custdist",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "J4", "A-ext"),
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): outer join with a
    join-side predicate, per-customer count, then a distribution re-aggregate.

    Plan choice: aggregate orders FIRST (one shuffle of two narrow columns),
    then left-join customer against the per-customer counts - not the naive
    customer LEFT JOIN orders row-multiplying join the SQL spells. At 100 TB
    the fact is reduced to |customers| rows before any join, and the second
    aggregate runs on a frame bounded by max orders-per-customer."""
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("cnt", F.lit(0).cast("long")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
        WITH target AS (
            SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'
        ),
        stats AS (
            SELECT l_partkey,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_cents,
                   COUNT(*) AS n
            FROM lineitem JOIN target ON l_partkey = p_partkey
            GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 / 7.0 AS avg_yearly,
               COUNT(*) AS n_small
        FROM lineitem l
        JOIN stats s ON l.l_partkey = s.l_partkey
        WHERE CAST(ROUND(l.l_quantity * 100) AS BIGINT) * 5 * s.n < s.qty_cents
    """,
    tags=("tpch", "A-ext"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): a correlated scalar
    aggregate - "lines whose quantity is below 20% of that part's average" -
    decorrelated into a per-part aggregate joined back to the fact.

    The 0.2*AVG threshold is evaluated as `qty_cents*5*n < sum_qty_cents`
    (integer, exact, no double AVG at the boundary). The per-part stats frame
    is tiny (only the brand-filtered parts) and broadcast back into the fact
    scan, so the fact shuffles zero times: one scan computes the stats (after
    a broadcast semi-reduction on the part filter), a second broadcast-joined
    scan applies the threshold. At 100 TB the alternative - shuffling the
    fact on l_partkey - would dominate the query; this plan never does it."""
    target = load(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100).cast("long")
    filtered = li.join(
        F.broadcast(target), li.l_partkey == target.p_partkey
    )
    stats = filtered.groupBy("l_partkey").agg(
        F.sum(qty_cents).alias("qty_cents"), F.count("*").alias("n")
    )
    joined = li.join(F.broadcast(stats), "l_partkey").filter(
        qty_cents * 5 * F.col("n") < F.col("qty_cents")
    )
    return joined.agg(
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                "double"
            )
            / 100
            / 7.0
        ).alias("avg_yearly"),
        F.count("*").alias("n_small"),
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
        WITH lo AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lo l1 ON s.s_suppkey = l1.l_suppkey
        WHERE l1.late
          AND EXISTS (
              SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lo l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.late
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    tags=("tpch", "J-ext"),
    bench=True,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): correlated EXISTS
    and NOT EXISTS against the same fact, decorrelated into ONE per-order
    aggregate instead of two self-joins. "Late" = shipped more than 90 days
    after the order date (the trimmed schema has no commit/receipt dates).

    Per order, a late line qualifies iff its order has >=2 suppliers (the
    EXISTS) and exactly 1 late supplier (the NOT EXISTS - the one late
    supplier is l1's own).

    THRESHOLD REWRITE - no distinct counting at all: the two subquery
    tests only need thresholds, never exact distinct counts, so
      n_supp >= 2        <=>  min(suppkey) != max(suppkey)
      n_late_supp == 1   <=>  >=1 late line AND min(late suppkey) ==
                              max(late suppkey)
    which collapses the whole decorrelation into ONE per-order aggregate
    of plain min/max/conditional-count - no countDistinct EXPAND
    (measured 2.37x DuckDB at sf0.5), no intermediate per-(order,
    supplier)-pair aggregate (previously a ~2M-group hash table at bench
    sf1.0, pure overhead next to the 0.5M-group per-order table; at
    100 TB that removed aggregate is billions of groups). When the order
    qualifies, the single late supplier IS max(when(late, suppkey)) and
    its late-line count IS count(when(late, 1)) - so numwait =
    SUM(n_late_lines) per supplier with no join back to the fact.

    ONE LINEAGE and ONE fact shuffle: the orders join is HINTED
    shuffle-hash on the order key (not broadcast - also the only option
    at 100 TB, where orders is not broadcastable), the join output is
    hash-partitioned by l_orderkey, and the per-order aggregate satisfies
    its clustering from that same partitioning: zero additional
    exchanges, all codegen HashAggregates. Everything after it is
    orders-cardinality small, and the supplier join is broadcast.

    Measured scale curve (interleaved min-of-5 vs DuckDB on the key-offset
    replicas): ratio 3.75x at sf0.5, 2.29x at sf1.0, 2.11x at sf2.0 with
    FLAT absolute time (1.31s -> 1.27s from sf1.0 to sf2.0, 32 threads) -
    the gap is per-job fixed overhead (scan task dispatch + one 120 MB
    shuffle materialization), amortizing away as data grows, not a plan
    defect; marginal cost per added row matches DuckDB ~1.1x."""
    # The +90d cutoff is computed on the ORDERS side before its shuffle
    # (0.5M rows at bench sf1.0) rather than on the join output (2M rows):
    # same bytes shuffled, strictly fewer date-arithmetic evaluations.
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            F.date_add(F.col("o_orderdate"), 90).alias("cutoff"),
        )
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(
        orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("cutoff")).alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("mn_sk"),
        F.max("l_suppkey").alias("mx_sk"),
        F.min(F.when(F.col("late"), F.col("l_suppkey"))).alias("lmn"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("lmx"),
        F.count(F.when(F.col("late"), 1)).alias("late_nl"),
    )
    qual = per_order.filter(
        (F.col("mn_sk") != F.col("mx_sk"))
        & (F.col("late_nl") >= 1)
        & (F.col("lmn") == F.col("lmx"))
    ).select(F.col("lmx").alias("late_sk"), "late_nl")
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qual.join(F.broadcast(supplier), F.col("late_sk") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_nl").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22_dormant_value_customers",
    oracle="""
        WITH sel AS (
            SELECT c_custkey, c_nationkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer
            WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        ),
        avg_bal AS (
            SELECT SUM(bal_cents) AS sum_cents, COUNT(*) AS n
            FROM sel WHERE bal_cents > 0
        )
        SELECT s.c_nationkey AS cntrycode,
               COUNT(*) AS numcust,
               CAST(SUM(s.bal_cents) AS DOUBLE) / 100 AS totacctbal
        FROM sel s, avg_bal a
        WHERE s.bal_cents * a.n > a.sum_cents
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = s.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY s.c_nationkey
        ORDER BY cntrycode
    """,
    tags=("tpch", "J-ext", "A-ext"),
)
def tpch_q22_dormant_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar-subquery average
    broadcast against the dimension, then an anti join for "no recent
    orders". Country-code prefixing becomes a nationkey IN-list (the trimmed
    schema has no phone column); "no orders in 7 years" becomes a date-bounded
    anti join (every sf0.01 customer has SOME order).

    The above-average test is `bal_cents * n > sum_cents` (integer, exact).
    The scalar aggregate is one row - crossJoin(broadcast) keeps it a map-side
    literal, not a shuffle. The anti join's right side is orders reduced by
    the date filter BEFORE the join (pushed to the scan); at 100 TB that's
    the semi-join-reduction shape, and AQE can still pick broadcast-anti if
    the filtered side is small."""
    sel = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        )
    )
    avg_bal = sel.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("sum_cents"), F.count("*").alias("n")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = sel.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("bal_cents") * F.col("n") > F.col("sum_cents")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        dormant.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_cents").cast("double") / 100).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_REV_CENTS = """CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
           AS DECIMAL(38,0))"""


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM({_REV_CENTS}) AS DOUBLE) / 1e4 AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   l.l_extendedprice, l.l_discount
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
                OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
              AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                   AND TIMESTAMP '1997-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "J1"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the same dimension joined TWICE
    under different roles (supplier nation / customer nation) with a
    symmetric OR pair predicate, yearly revenue rollup.

    Plan: nation is broadcast on both sides (two independent
    BroadcastHashJoins, not a self-join); the pair predicate prunes to the
    two relevant nations BEFORE the fact joins by filtering each broadcast
    input, so the OR never prevents pushdown - the classic rewrite of Q7's
    disjunction."""
    nations = ("NATION_9", "NATION_6")
    n1 = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("decimal(38,0)")
    return (
        li.join(F.broadcast(supp.select("s_suppkey", "supp_nation")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "cust_nation"),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(rev).cast("double") / 1e4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey AS custkey, c.c_name,
               CAST(SUM({_REV_CENTS}) AS DOUBLE) / 1e4 AS revenue,
               c.c_acctbal AS acctbal, n.n_name AS nation
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01'
          AND l.l_returnflag = 'R'
        GROUP BY custkey, c.c_name, acctbal, nation
        ORDER BY revenue DESC, custkey
        LIMIT 20
    """,
    tags=("tpch", "J2", "O5"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item losers): quarter-bounded orders join
    return-flagged lineitems, customer rollup, top 20 by lost revenue.
    Filters live on both fact scans (pushdown prunes the quarter and the
    return flag before any join); nation broadcasts; top-20 is
    TakeOrderedAndProject with a custkey tiebreak."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("decimal(38,0)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            F.col("c_acctbal").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg((F.sum(rev).cast("double") / 1e4).alias("revenue"))
        .select("custkey", "c_name", "revenue", "acctbal", "nation")
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
        SELECT CAST(100 * SUM(CASE WHEN p.p_type = 'PROMO'
                                   THEN {_REV_CENTS} ELSE 0 END) AS DOUBLE)
               / CAST(SUM({_REV_CENTS}) AS DOUBLE) AS promo_pct,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
          AND l.l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    tags=("tpch", "A2"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): conditional revenue share over a
    month of shipments joined to the part dimension. The month filter is
    pushed into the fact scan; part broadcasts; the CASE lives inside the
    aggregate so one pass computes both numerator and denominator. Both
    sums are exact decimal cents - the ratio divides two exact numbers, so
    the double result is bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("decimal(38,0)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(38,0)")
    )
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (
            (F.lit(100) * F.sum(promo)).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_pct"),
        F.count("*").alias("n_lines"),
    )
