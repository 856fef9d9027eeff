"""Local replica of the driver's t2 DuckDB-oracle correctness check.

The driver (per __spark_entry__.py docstring) runs each queries()[name] and
its oracle_sql()[name] side by side and compares row-count + schema +
order-insensitive value hash with columns sorted by name. This module does
the same locally so every registered query is validated before commit.

Normalization is deliberately strict: values must compare equal as Python
objects after canonicalization (floats by exact repr, Decimals normalized,
dates/timestamps by isoformat). Queries are therefore written so both engines
produce bit-identical values - see registry.py docstring for the DECIMAL
trick on double aggregates.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal

import duckdb

from nyc_analytics_database_platform_spark.catalog import TABLES, table_path


def _canon(v: object) -> object:
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NaN"
        return ("f", repr(v))
    if isinstance(v, Decimal):
        return ("f", repr(float(v)))
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    return v


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""

    def __bool__(self) -> bool:
        return self.ok


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _rows_to_multiset(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(name: str, spark_df, oracle: str, sf_dir: str) -> CompareResult:
    s_rows = spark_df.collect()
    s_cols = list(spark_df.columns)
    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(o_cols):
        return CompareResult(name, False, len(s_rows), len(o_rows), f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        return CompareResult(name, False, len(s_rows), len(o_rows), "row count mismatch")

    a = _rows_to_multiset(s_cols, [tuple(r) for r in s_rows])
    b = _rows_to_multiset(o_cols, o_rows)
    if a != b:
        diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), -1)
        detail = f"value mismatch at sorted row {diff}: spark={a[diff]!r} oracle={b[diff]!r}" if diff >= 0 else "value mismatch"
        return CompareResult(name, False, len(s_rows), len(o_rows), detail)
    return CompareResult(name, True, len(s_rows), len(o_rows))
