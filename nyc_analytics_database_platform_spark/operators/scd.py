"""SCD Type 2: collapse a keyed change log into validity intervals.

The reference app keeps only current-state rows (one row per BBL in
`properties`; reference: webserver/schema.sql:1-24) — history is implicit in
the fact tables. A warehouse at 100 TB needs the explicit form: for each key,
consecutive runs of equal attribute values become one row with
[valid_from, valid_to) bounds and an is_current flag, the standard
slowly-changing-dimension type-2 contract.

Plan shape: one shuffle on the key; the three window passes (lag change flag,
lead interval close, row_number version) all share the same
partitionBy/orderBy, so Catalyst plans a single Exchange + sort. The
change-filter runs BEFORE the lead/version windows, so the second pass only
sees change rows (usually a small fraction of the log). No joins, no
driver-side state — scales linearly in log size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: tuple[str, ...],
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Collapse the change log `df` into SCD2 rows: one row per run of equal
    `attr_cols` values per `key_col`, with valid_from/valid_to (the next run's
    start; null = open), version (1-based), and is_current. `order_cols` break
    `ts_col` ties deterministically."""
    order = [F.col(ts_col), *(F.col(c) for c in order_cols)]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = reduce(
        lambda a, c: a | ~F.col(c).eqNullSafe(F.lag(c).over(w)),
        attr_cols,
        F.lag(ts_col).over(w).isNull(),
    )
    changes = df.withColumn("_is_change", changed).filter("_is_change").drop("_is_change")
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key_col, *attr_cols, "valid_from", "valid_to", "version", "is_current")
    )
