"""The bench CLI's driver contract, pinned WITHOUT Spark: the final stdout
line must be one JSON object that fits entirely inside the driver's
2000-char output tail (rounds 9-11 shipped truncated, unparseable lines),
must carry the required contract fields, and must surface the deepest
crossover marks when they fit."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import TAIL_BUDGET, build_compact_line  # noqa: E402

# A realistic headline set: 29 long query names (the r11 shape).
TIMINGS = {
    f"query_family_{chr(97 + i // 4)}_{'deep' if i % 2 else 'wide'}_{i:02d}": 0.1 + i * 0.07
    for i in range(29)
}


def _parse(line: str) -> dict:
    assert "\n" not in line
    assert len(line) <= TAIL_BUDGET, len(line)
    d = json.loads(line)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in d, k
    assert d["unit"] == "sec"
    assert len(d["queries"]) == len(TIMINGS)
    return d


def test_no_crossover_fits():
    d = _parse(build_compact_line(17.37, TIMINGS, 15.16, 1.15, 0.1,
                                  "BENCH_DETAIL.json", None))
    assert "deepest_xover_sf_ratio" not in d


def test_skip_and_error_reasons_survive():
    for cx in ({"skipped": "SPARK_GRAFT_CROSSOVER=0"},
               {"error": "RuntimeError: boom"}):
        d = _parse(build_compact_line(1.0, TIMINGS, 1.0, 1.0, 0.001,
                                      "BENCH_DETAIL_sf0.001.json", cx))
        assert d["crossover"] == cx


def test_deepest_mark_wins_and_line_fits():
    # Full r11-shaped crossover: sf0.5 covers everything, deeper blocks
    # override with their own ratios.
    names = list(TIMINGS)
    cx = {"sf": 0.5, "vs_duckdb": {n: 9.9 for n in names}}
    for sf in ("sf1.0", "sf2.0", "sf4.0", "sf8.0", "sf16.0"):
        cx[sf] = {"vs_duckdb": {n: float(sf[2:-2]) for n in names[:17]}}
    cx["sf32.0_stragglers"] = {"vs_duckdb": {names[0]: 1.41}}
    d = _parse(build_compact_line(17.37, TIMINGS, 15.16, 1.15, 0.1,
                                  "BENCH_DETAIL.json", cx))
    deep = d["deepest_xover_sf_ratio"]
    # the deepest block's mark wins for its query...
    assert deep[names[0]] == [32.0, 1.41]
    # ...and every included mark sits at or above the fitted floor.
    floors = {v[0] for v in deep.values()}
    assert min(floors) >= 1.0


def test_pathological_width_still_fits():
    # 80 queries x 40-char names + marks at every depth: the guard must
    # keep the line under the tail budget no matter what.
    big = {f"extremely_long_query_name_number_{i:03d}_x": 1.234 for i in range(80)}
    cx = {"vs_duckdb": {n: 9.9 for n in big}}
    for sf in ("sf1.0", "sf8.0", "sf16.0"):
        cx[sf] = {"vs_duckdb": {n: 2.2 for n in big}}
    line = build_compact_line(99.9, big, 88.8, 1.13, 0.1,
                              "BENCH_DETAIL.json", cx)
    assert len(line) <= TAIL_BUDGET
    d = json.loads(line)
    # the fallback truncates to the largest-time queries and says so
    assert len(d["queries"]) + d.get("queries_omitted", 0) == 80
    if "queries_omitted" in d:
        kept_min = min(d["queries"].values())
        assert kept_min >= 1.2  # largest-time entries were the ones kept
