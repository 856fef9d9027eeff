"""Z-order (Morton) curve: interleave the low bits of two dimensions into one
sort key, so sorting by it clusters rows that are close in BOTH dimensions.

Why an analytics engine wants it: parquet scan pruning works off per-file
min/max ranges. A single-column sort gives perfect pruning on that column and
none on any other; writing files in z-order gives useful min/max bounds on
both dimensions at once, so two-dimensional predicates (customer x date, the
reference's dashboard access pattern - server.py filters bbl + date range
together) prune files instead of scanning everything.

Pure Catalyst expression (aggregate over a bit-index sequence, shifts and
masks) - JVM-side, codegen, no UDF; the identical arithmetic is expressible
in DuckDB for the oracle. Expressed via F.expr because the Python shiftleft/
shiftright wrappers only accept literal ints for the shift amount, while the
SQL functions take full expressions (the lambda's bit index).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x_sql: str, y_sql: str, bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative integer SQL
    expressions: bit i of x lands at position 2i, bit i of y at 2i+1."""
    return F.expr(
        f"""aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), (acc, i) -> acc
            + shiftleft(CAST(shiftright({x_sql}, i) & 1 AS BIGINT), 2*i)
            + shiftleft(CAST(shiftright({y_sql}, i) & 1 AS BIGINT), 2*i + 1))"""
    )


def zvalue_oracle_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as DuckDB SQL."""
    return f"""CAST(
        list_sum(list_transform(range(0, {bits}),
            i -> CASE WHEN (({x}) >> i) & 1 = 1 THEN (1::BIGINT << (2*i)) ELSE 0 END
                 + CASE WHEN (({y}) >> i) & 1 = 1 THEN (1::BIGINT << (2*i + 1)) ELSE 0 END))
        AS BIGINT)"""


def zorder_sort(
    df: DataFrame, x_sql: str, y_sql: str, bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort the frame by the interleaved key - the write
    layout that gives parquet files tight min/max bounds on both dimensions.
    At 100 TB this replaces a single-column sort before the sink: the range
    exchange samples the z-key so file count scales with the data, and scan
    pruning works for predicates on either (or both) dimensions. Pass
    `num_partitions` to pin the file count (also opts the exchange out of
    AQE coalescing, which would otherwise merge small outputs and widen
    per-file bounds). Z-order pays off only when both dimensions use
    comparable bit widths - quantize each to the same range first."""
    z = zvalue(x_sql, y_sql, bits)
    parts = (
        df.withColumn("_z", z).repartitionByRange(num_partitions, F.col("_z"))
        if num_partitions
        else df.withColumn("_z", z).repartitionByRange(F.col("_z"))
    )
    return parts.sortWithinPartitions("_z").drop("_z")
