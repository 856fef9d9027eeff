"""Versioned-table parity queries: time travel, CDC from the commit log,
retraction-capable incremental views, optimistic concurrency, and vacuum —
the transaction-log lifecycle over operators/txnlog.py.

The reference's data model is one mutable current-state table (reference:
webserver/schema.sql:1-24; server.py:140-236 recomputes rollups from it per
request) — it cannot answer "as of last week", cannot feed a downstream
consumer a change stream, and has no concurrent-writer story. At 100 TB all
three are table-stakes, and all three fall out of the same primitive: an
immutable-file commit log (see operators/txnlog.py for the design and its
object-store mapping).

Every query here builds a deterministic commit chain over `orders`
(append / append / copy-on-write range delete — or racing appends for the
concurrency query), so each version's logical state is expressible as a
plain predicate over the source table. That is what makes the oracles
EXACT: DuckDB reconstructs each version from `orders` with the same
predicate and must hash-match the Spark side's log-pinned file reads.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark import layouts
from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.functions.numeric import ORACLE_SUM
from nyc_analytics_database_platform_spark.operators import txnlog
from nyc_analytics_database_platform_spark.registry import register

# The commit chain's deterministic parameters. v1 appends pre-1997 orders,
# v2 appends the rest, v3 copy-on-write-deletes one o_orderkey range. Each
# version's state is therefore a pure predicate over `orders`:
#   v1: o_orderdate <  '1997-01-01'
#   v2: all orders
#   v3: NOT (1000 <= o_orderkey < 3000)
_CUTOFF = "1997-01-01"
_DEL_LO, _DEL_HI = 1000, 3000

_V3_PRED_SQL = f"NOT (o_orderkey >= {_DEL_LO} AND o_orderkey < {_DEL_HI})"


def _root(sf_dir: str, variant: str) -> str:
    return layouts.scratch(sf_dir, "txnlog", variant)


def build_orders_commit_chain(
    spark: SparkSession, sf_dir: str, variant: str = "main"
) -> str:
    """Build (or adopt) the three-commit chain. Freshness-stamped like
    every persisted layout, PLUS txnlog.chain_intact — the log must not
    reference files a tmp cleaner removed. `variant` namespaces chains so
    destructive queries (vacuum) never mutate the chain the time-travel
    and CDC queries read."""
    root = _root(sf_dir, variant)
    marker = root + "_done"
    stamp = layouts.source_stamp(
        sf_dir, "orders",
        spec=f"chain:{_CUTOFF}:{_DEL_LO}:{_DEL_HI}:{variant}",
    )
    if layouts.is_fresh(marker, stamp) and txnlog.chain_intact(root):
        return root
    shutil.rmtree(root, ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    # Range-clustered on o_orderkey so the later range delete prunes at
    # file granularity (tests pin n_carried > 0: most files carry over
    # by reference, untouched).
    txnlog.append(spark, root, orders.filter(F.col("o_orderdate") < cutoff),
                  range_col="o_orderkey", n_files=8)
    txnlog.append(spark, root, orders.filter(F.col("o_orderdate") >= cutoff),
                  range_col="o_orderkey", n_files=4)
    txnlog.delete_range_cow(spark, root, "o_orderkey", _DEL_LO, _DEL_HI)
    layouts.mark_fresh(marker, stamp)
    return root


def _status_rollup(df: DataFrame) -> DataFrame:
    return df.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "revenue_cents"
        ),
    )


_V_STATE_SQL = {
    1: f"o_orderdate < TIMESTAMP '{_CUTOFF}'",
    2: "TRUE",
    3: _V3_PRED_SQL,
}


@register(
    "time_travel_status_revenue",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT {v} AS version, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders WHERE {pred}
        GROUP BY o_orderstatus
        """
        for v, pred in _V_STATE_SQL.items()
    ) + "\nORDER BY version, o_orderstatus",
    tags=("txnlog", "timetravel", "lifecycle", "warehouse"),
)
def time_travel_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same rollup AS OF every version of the chain: each time-travel
    read costs ONE KB-scale log-entry read to pin its file set (no log
    replay, no directory listing — txnlog.read_version), then a normal
    pruned parquet scan. The oracle reconstructs each version's state from
    the source table by predicate, so a hash match proves the log pinned
    exactly the right bytes at every version — including v3, whose state
    mixes carried-over v1/v2 files with the delete's rewrites."""
    root = build_orders_commit_chain(spark, sf_dir)
    parts = [
        _status_rollup(txnlog.read_version(spark, root, v)).withColumn(
            "version", F.lit(v)
        )
        for v in (1, 2, 3)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "version", "o_orderstatus", "n_orders", "revenue_cents"
    ).orderBy("version", "o_orderstatus")


@register(
    "table_changes_feed",
    oracle=f"""
        WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders
                    WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'),
             v2 AS (SELECT o_orderkey, o_totalprice FROM orders),
             v3 AS (SELECT o_orderkey, o_totalprice FROM orders
                    WHERE {_V3_PRED_SQL}),
             feed AS (
                SELECT 2 AS version_to, 'insert' AS change_type, *
                FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)
                UNION ALL
                SELECT 2, 'delete', * FROM (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2)
                UNION ALL
                SELECT 3, 'insert', * FROM (SELECT * FROM v3 EXCEPT ALL SELECT * FROM v2)
                UNION ALL
                SELECT 3, 'delete', * FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v3)
             )
        SELECT version_to, change_type, o_orderkey AS orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM feed
        ORDER BY version_to, change_type, orderkey
    """,
    tags=("txnlog", "cdc", "lifecycle", "warehouse"),
)
def table_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between consecutive versions computed FROM THE LOG
    (txnlog.changes_between): only files added/removed between the
    versions are read, and survivor rows a copy-on-write rewrite carried
    into new files cancel via exceptAll. The oracle computes the same feed
    as full-state EXCEPT ALLs between reconstructed versions — a hash
    match proves log-diff CDC equals state-diff semantics while reading
    O(changed files), not O(2 x table) (contrast snapshot_diff_orders,
    which scans both snapshots)."""
    root = build_orders_commit_chain(spark, sf_dir)
    cols = ["o_orderkey", "o_totalprice"]
    feeds = [
        txnlog.changes_between(spark, root, v - 1, v, cols).withColumn(
            "version_to", F.lit(v)
        )
        for v in (2, 3)
    ]
    out = feeds[0].unionByName(feeds[1])
    return out.select(
        "version_to",
        "change_type",
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    ).orderBy("version_to", "change_type", "orderkey")


@register(
    "ivm_retractable_monthly_revenue",
    oracle=f"""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               COUNT(*) AS n,
               {ORACLE_SUM.format(col="o_totalprice")} AS total,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) AS mean
        FROM orders
        WHERE {_V3_PRED_SQL}
        GROUP BY 1
        ORDER BY month
    """,
    tags=("txnlog", "incremental", "materialized-view", "cdc", "warehouse"),
)
def ivm_retractable_monthly_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental view maintenance driven by the change feed, WITH
    retractions: the monthly-revenue view is built once at v1, advanced to
    v2 by merging the insert feed's partials, and advanced to v3 by
    merging the DELETE feed's partials with negated count/sum — so the
    view follows the table through a delete without any rescan of history.
    Only the commutative-group measures (count, decimal sum, and avg
    derived from them) survive retraction; min/max are monoid-only and are
    deliberately absent (a deletion can invalidate a stored min — contrast
    incremental_monthly_revenue, the append-only view that keeps them).
    Groups whose rows are all retracted leave n = 0 and are dropped. The
    oracle recomputes the v3 state from scratch: a hash match proves
    insert-merge minus delete-merge is exactly recompute, decimals
    included. Per-refresh cost at 100 TB: O(changed files + |view|)."""
    root = build_orders_commit_chain(spark, sf_dir)
    cols = ["o_orderkey", "o_orderdate", "o_totalprice"]
    month = F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")

    def partials(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy(month.alias("month")).agg(
            (F.lit(sign) * F.count("*")).alias("n"),
            (F.lit(sign) * F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
             ).alias("sum_dec"),
        )

    v1 = txnlog.read_version(spark, root, 1).select(*cols)
    ins2 = txnlog.changes_between(spark, root, 1, 2, cols).filter(
        F.col("change_type") == "insert"
    )
    feed3 = txnlog.changes_between(spark, root, 2, 3, cols)
    ins3 = feed3.filter(F.col("change_type") == "insert")
    del3 = feed3.filter(F.col("change_type") == "delete")
    view = (
        partials(v1, 1)
        .unionByName(partials(ins2, 1))
        .unionByName(partials(ins3, 1))
        .unionByName(partials(del3, -1))
        .groupBy("month")
        .agg(F.sum("n").alias("n"), F.sum("sum_dec").alias("sum_dec"))
        .filter(F.col("n") > 0)
    )
    return view.select(
        "month",
        F.col("n").alias("n"),
        F.col("sum_dec").cast("double").alias("total"),
        (F.col("sum_dec").cast("double") / F.col("n")).alias("mean"),
    ).orderBy("month")


@register(
    "txnlog_concurrent_appends",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("txnlog", "concurrency", "lifecycle", "warehouse"),
)
def txnlog_concurrent_appends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency append race, run for real: writer A and
    writer B both prepare appends against parent v1 (thirds of `orders` by
    key mod 3); A publishes v2 first, so B's commit of v2 raises
    CommitConflict inside txnlog.append, which revalidates against the new
    head and republishes B's ALREADY-WRITTEN files as v3 — the retry runs
    zero Spark jobs (append never logically conflicts with append). The
    oracle aggregates all of `orders`: a hash match proves the losing
    writer's data was neither lost nor duplicated through the retry."""
    root = _root(sf_dir, "cc")
    marker = root + "_done"
    stamp = layouts.source_stamp(sf_dir, "orders", spec="cc-race:mod3")
    if not (layouts.is_fresh(marker, stamp) and txnlog.chain_intact(root)):
        shutil.rmtree(root, ignore_errors=True)
        orders = load(spark, sf_dir, "orders")
        key = F.col("o_orderkey")
        txnlog.append(spark, root, orders.filter(key % 3 == 0),
                      range_col="o_orderkey", n_files=4)
        # Both writers target parent=1; B's first commit attempt MUST
        # conflict (exercised on every fresh build, pinned by tests).
        txnlog.append(spark, root, orders.filter(key % 3 == 1),
                      range_col="o_orderkey", n_files=4, parent=1)
        txnlog.append(spark, root, orders.filter(key % 3 == 2),
                      range_col="o_orderkey", n_files=4, parent=1)
        assert txnlog.latest_version(root) == 3
        layouts.mark_fresh(marker, stamp)
    return _status_rollup(txnlog.read_version(spark, root)).select(
        "o_orderstatus", "n_orders", "revenue_cents"
    ).orderBy("o_orderstatus")


@register(
    "vacuum_retention_revenue",
    oracle=f"""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders
        WHERE {_V3_PRED_SQL}
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("txnlog", "vacuum", "retention", "lifecycle", "warehouse"),
)
def vacuum_retention_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vacuum with retention = head only, then query the live table. Runs
    on its own chain variant (vacuum is destructive to history; the
    time-travel queries keep theirs). Files referenced by the head
    snapshot are excluded from removal BY CONSTRUCTION, so the post-vacuum
    rollup must still hash-match the v3-state oracle — that is the safety
    property this query asserts end-to-end; tests additionally pin that
    vacuum removed > 0 files and expired versions 1-2."""
    root = build_orders_commit_chain(spark, sf_dir, variant="vac")
    txnlog.vacuum(root, keep_last=1)
    live = txnlog.read_version(spark, root)
    return live.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "revenue_cents"
        ),
    ).orderBy("o_orderpriority")
