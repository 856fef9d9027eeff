"""Table profiling: the ANALYZE-style column-statistics pass a warehouse
runs to feed its cost model and data-quality dashboards (the engine-side
equivalent of the reference's implicit reliance on PostgreSQL's planner
statistics; reference schema constraints: schema.sql:31-35,43-44,70-73).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
