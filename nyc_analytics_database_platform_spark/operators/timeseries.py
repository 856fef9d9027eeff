"""Time-series operators: month-spine densification.

Re-expresses the reference's application-side month-gap filling
(reference: server.py:319-342) as a declarative plan:

    bounds (min/max month)  ->  sequence(lo, hi, interval 1 month)
    -> explode (the spine)  ->  LEFT JOIN aggregated months
    -> coalesce fills (0 for counts, keep NULL for medians)

Scale notes: the spine is at most a few thousand rows regardless of fact
size (bounded by calendar span), so the left join is a broadcast of the
aggregated side only when that side is small; the expensive part - the
monthly aggregation - happens before the join on the already-reduced data.
The bounds aggregation is a separate tiny job (min/max with map-side
partials), not a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def month_spine(source_df: DataFrame, ts_col: str) -> DataFrame:
    """One row per calendar month between min and max of ts_col.

    Output column: month_ts (timestamp, first instant of the month).
    """
    bounds = source_df.agg(
        F.date_trunc("month", F.min(ts_col)).alias("lo"),
        F.date_trunc("month", F.max(ts_col)).alias("hi"),
    )
    return bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("month_ts")
    )


def month_spine_densify(
    source_df: DataFrame,
    ts_col: str,
    monthly_agg: DataFrame,
    fills: dict[str, tuple[Column, Column | None]],
) -> DataFrame:
    """Left-join a monthly aggregate onto the full month spine.

    monthly_agg must carry a `month_ts` timestamp column (date_trunc month).
    fills maps output column name -> (source expression over monthly_agg
    columns, fill value for missing months or None to keep NULL - the
    reference zero-fills counts and null-fills medians, server.py:337-340).
    """
    spine = month_spine(source_df, ts_col)
    out = spine.join(monthly_agg, "month_ts", "left")
    cols = [F.col("month_ts")]
    for name, (expr, fill) in fills.items():
        cols.append((F.coalesce(expr, fill) if fill is not None else expr).alias(name))
    return out.select(*cols)
