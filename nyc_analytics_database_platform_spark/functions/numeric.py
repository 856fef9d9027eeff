"""Order-independent numeric aggregates.

SUM/AVG over doubles are order-dependent in the last ulp, which breaks
bit-exact comparison against any other engine (and even against a re-run with
different partitioning). The fix: cast each input to DECIMAL(18,4) first -
both Spark and DuckDB round the exact binary value of the double to 4 decimal
places, so the decimals are identical; decimal summation is exact and
order-independent; the final cast back to DOUBLE is deterministic.

This also matters at 100 TB: decimal partial aggregation is still map-side
combinable, so the plan shape (partial agg -> shuffle -> final agg) is
unchanged - only the value is made deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(18,4)"


def exact_sum(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def exact_avg(col: str | Column) -> Column:
    """Exact mean: exact decimal sum divided by count (double division is
    deterministic given identical operands)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


# Oracle-side (DuckDB) equivalents; .format(col=...) into the SQL string.
ORACLE_SUM = "CAST(SUM(CAST({col} AS DECIMAL(18,4))) AS DOUBLE)"
ORACLE_AVG = (
    "CAST(SUM(CAST({col} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({col})"
)
