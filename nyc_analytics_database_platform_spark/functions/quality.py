"""Data-quality predicates - the reference's DDL CHECK/NOT NULL constraints
as engine-side assertions (reference: schema.sql:31-35,43-44,70-73; Spark
doesn't enforce constraints, so the ETL path validates instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def positive(col: str) -> Column:
    return F.col(col).isNull() | (F.col(col) > 0)


def non_negative(col: str) -> Column:
    return F.col(col).isNull() | (F.col(col) >= 0)


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def date_not_future(col: str) -> Column:
    return F.col(col).isNull() | (F.col(col) <= F.current_date())


def in_domain(col: str, values: list[str]) -> Column:
    return F.col(col).isin(values)


def split_valid(df: DataFrame, checks: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Partition df into (valid, violations). The violations side carries a
    `violated` array naming every failed check - one pass, no driver loop.

    Scale: both branches derive from one scan; writing valid rows and a
    violations audit table is a fan-out of the same cached plan.
    """
    named = [F.when(~cond, F.lit(name)) for name, cond in checks.items()]
    flagged = df.withColumn(
        "violated", F.array_compact(F.array(*named)) if named else F.array()
    )
    valid = flagged.filter(F.size("violated") == 0).drop("violated")
    bad = flagged.filter(F.size("violated") > 0)
    return valid, bad
