"""Simulate the grading driver: import __spark_entry__ from the repo root,
smoke entry(), then run every queries() entry at the given sf_dir and compare
with oracle_sql() via DuckDB (row count + column-name-sorted value multiset).

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from nyc_analytics_database_platform_spark.catalog import TABLES, table_path  # noqa: E402
from nyc_analytics_database_platform_spark.session import get_spark  # noqa: E402


def canon(v: object) -> str:
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return repr(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("driver-sim")
    n = len(entrymod.entry(spark).collect())
    print(f"SMOKE entry(): {n} rows")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        scols = list(sdf.columns)
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sset = sorted(tuple(canon(r[i]) for i in sidx) for r in srows)
        oset = sorted(tuple(canon(r[i]) for i in oidx) for r in orows)
        ok = sorted(scols) == sorted(ocols) and sset == oset
        if not ok:
            failures += 1
            diff = next(
                (i for i, (x, y) in enumerate(zip(sset, oset)) if x != y), -1
            )
            extra = (
                f" first-diff spark={sset[diff]} oracle={oset[diff]}"
                if 0 <= diff < len(sset) and diff < len(oset)
                else f" cols spark={sorted(scols)} oracle={sorted(ocols)}"
            )
            print(f"MISMATCH {name}: spark={len(srows)} oracle={len(orows)}{extra}")
        else:
            print(f"MATCH {name}: spark={len(srows)} oracle={len(orows)}")
    print(f"DONE: {failures} mismatches")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
