"""End-of-round gate: run every verification surface in order and print a
one-line PASS/FAIL summary per gate. Exit 0 only if all gates pass.

Gates (in order, cheapest first):
  1. registry   - all query modules import; every spec has fn (+ oracle)
  2. testdata   - parquet physical types match the engine's expectations
                  (the driver regenerates testdata between rounds; type
                  drift broke round 2)
  3. pytest     - full suite
  4. driver-sim - entry() + all queries vs oracles at sf0.01 (the t2 gate)
  5. plan-audit - anti-pattern sweep (scripts/plan_audit.py)

Usage: python scripts/round_check.py [--fast]   (--fast skips pytest)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

results: list[tuple[str, bool, str]] = []


def gate(name: str, ok: bool, detail: str) -> None:
    results.append((name, ok, detail))
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}", flush=True)


def main() -> None:
    fast = "--fast" in sys.argv

    # 1. registry
    try:
        from nyc_analytics_database_platform_spark import registry

        specs = registry.all_specs()
        no_oracle = [n for n, s in specs.items() if s.oracle is None]
        gate(
            "registry",
            len(specs) > 0,
            f"{len(specs)} queries, {len(no_oracle)} without oracle {no_oracle}",
        )
    except Exception as e:
        gate("registry", False, repr(e))
        sys.exit(1)

    # 2. testdata physical types
    try:
        import pyarrow.parquet as pq

        drift = []
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            d = f"/root/testdata/{sf}"
            if not os.path.isdir(d):
                continue
            for t, col, want in [
                ("orders", "o_orderdate", ("timestamp[us]", "timestamp[ns]")),
                ("events", "ts", ("timestamp[us]", "timestamp[ns]", "int64")),
                ("embeddings", "embedding", ("list<element: float>", "list<item: float>")),
            ]:
                s = pq.read_schema(os.path.join(d, f"{t}.parquet"))
                got = str(s.field(col).type)
                if got not in want:
                    drift.append(f"{sf}/{t}.{col}={got}")
        gate("testdata", not drift, "types as expected" if not drift else f"DRIFT: {drift}")
    except Exception as e:
        gate("testdata", False, repr(e))

    # 3. pytest
    if fast:
        gate("pytest", True, "skipped (--fast)")
    else:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "--no-header"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        tail = (r.stdout.strip().splitlines() or ["?"])[-1]
        gate("pytest", r.returncode == 0, tail)

    # 4. driver-sim at sf0.01
    try:
        import datetime
        import decimal

        import duckdb

        import __spark_entry__ as e
        from nyc_analytics_database_platform_spark.session import get_spark

        spark = get_spark("round-check")
        assert len(e.entry(spark).collect()) > 0
        sf = "/root/testdata/sf0.01"
        qs, osql = e.queries(), e.oracle_sql()
        con = duckdb.connect()
        from nyc_analytics_database_platform_spark.catalog import TABLES, table_path

        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')"
            )

        def canon(v):
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                return repr(v)
            if isinstance(v, (datetime.datetime, datetime.date)):
                return v.isoformat()
            if isinstance(v, list):
                return "[" + ",".join(canon(x) for x in v) + "]"
            return repr(v)

        fails = []
        for name, fn in sorted(qs.items()):
            try:
                df = fn(spark, sf)
                scols = sorted(df.columns)
                srows = sorted(
                    tuple(canon(r[c]) for c in scols) for r in df.collect()
                )
                if name not in osql:
                    continue
                cur = con.execute(osql[name])
                ocols_raw = [dsc[0] for dsc in cur.description]
                order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
                ocols = sorted(ocols_raw)
                orows = sorted(
                    tuple(canon(row[i]) for i in order) for row in cur.fetchall()
                )
                if scols != ocols or srows != orows:
                    fails.append(name)
            except Exception:
                fails.append(name)
            spark.catalog.clearCache()
        gate(
            "driver-sim",
            not fails,
            f"{len(qs) - len(fails)}/{len(qs)} match at sf0.01"
            + (f"; FAILS: {fails[:10]}" if fails else ""),
        )
        spark.stop()
    except Exception as ex:
        gate("driver-sim", False, repr(ex))

    # 5. plan audit
    r = subprocess.run(
        [sys.executable, "scripts/plan_audit.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    line = (r.stdout.strip().splitlines() or ["?"])[0]
    gate(
        "plan-audit",
        r.returncode == 0 and "unexplained_antipatterns=0" in line,
        line,
    )

    ok = all(p for _, p, _ in results)
    print("ROUND-CHECK:", "ALL PASS" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
