"""Sweep every registered query's PHYSICAL plan for scale anti-patterns and
emit PLAN_AUDIT.md - the automated evidence behind SCALE.md's plan claims.

Per query (built at sf0.001; plans are scale-invariant in shape):
- shuffle census: ShuffleExchange count (every one is a full-data network
  pass at 100 TB), broadcast count
- flags:
  - CARTESIAN: a CartesianProduct node (both sides unbounded - never
    acceptable outside the labeled calibration baselines)
  - bnl(n): BroadcastNestedLoopJoin count - informational; in this engine
    every BNLJ build side is a BOUNDED broadcast (a 1-row scalar/model
    aggregate, an n_salts-row salt list, a 1-2 row IVF probe set, a 4-row
    band dim), i.e. the scalar-attach pattern, not a quadratic compare.
    The genuinely quadratic compares are the labeled calibration baselines
    in CARTESIAN_OK.
  - PY-ROW-UDF: BatchEvalPython = row-at-a-time Python in the plan (the
    engine bans it; Arrow surfaces show as ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas and are fine)
  - GLOBAL-WINDOW: a Window node with an EMPTY partition spec that is NOT
    rank-limited — a single-partition sort of its whole input, the
    scale-killer WindowExec itself warns about. Two labeled-ok forms:
    window(limit) = every global Window in the plan is fed by a
    WindowGroupLimit (Spark's rank-filter pushdown caps rows per map task,
    so the single partition sees <= k * n_partitions rows, not the data);
    window(ok) = the query is in WINDOW_OK, the audited list of global
    windows over BOUNDED/metadata intermediates (month spines, histogram
    buckets, <=125-row reports) with a file:line justification.

Streaming queries execute real drains in fn() and are skipped (their plans
are audited by the streaming tests).
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_analytics_database_platform_spark import registry
from nyc_analytics_database_platform_spark.catalog import clear_engine_state
from nyc_analytics_database_platform_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Queries whose quadratic compare IS the documented point (calibration
# baselines with bucketed production twins, or broadcast-of-tiny patterns).
CARTESIAN_OK = {
    "dedup_simhash_pairs",  # all-pairs twin proving bucketing losslessness
    "embedding_near_pairs",  # exact baseline for the sign-LSH variant
    "ann_bruteforce_top10",  # exact baseline for IVF/LSH ANN
    "knn_graph_top3",  # exact kNN graph baseline
    "ann_two_stage_rerank",  # stage 1 is the documented exact rerank pool
    "semdedup_within_cluster",  # within-cluster pairs, cluster-bounded
    "hard_negatives_per_query",  # per-query compare, query set bounded
    "ivf_recall_audit",  # brute-force leg is the calibration baseline
    "dedup_lsh_recall_audit",  # same
    "range_join_price_bands",  # broadcast nested loop over a 4-row band dim
}


# Queries whose UNGUARDED global windows are over bounded/metadata
# intermediates - audited by hand, justification beside each. (Rank-filter
# windows that compile to WindowGroupLimit/TakeOrderedAndProject are
# auto-labeled window(limit) and never need listing.) Populated by the
# round-7 sweep; a NEW query with an unlisted unguarded global window
# fails tests/test_plan_invariants.py. Real-cardinality global windows
# found by that sweep were FIXED instead of listed (ntile_decile_price_
# bounds, revenue_pareto deciles, segment-migration quintiles, zipf ranks,
# rfm quintiles - all on operators/prefixsum.ranked_by_range now).
WINDOW_OK: dict[str, str] = {
    # month-spine family: window input is the month series of the order
    # history - <=~100 rows regardless of corpus size
    "cumulative_orders": "cumsum over the monthly aggregate (<=84 rows)",
    "rolling_3m_avg_orders": "3-month frame over the monthly aggregate",
    "revenue_mom_yoy": "LAG(1)/LAG(12) over the monthly aggregate",
    "month_spine_interpolated_revenue": (
        "gap-fill LAG/LEAD chains over the generated month spine"
    ),
    "monthly_revenue_autocorr": "lag-k pairs over the monthly series",
    "monthly_revenue_cusum": "mean-centered cumsum over the monthly series",
    "monthly_revenue_max_drawdown": (
        "running-peak scan over the monthly series"
    ),
    "theil_sen_revenue_trend": (
        "pairwise-slope median over the monthly series (bnl over the same)"
    ),
    "retail_kpi_report": "composite of the monthly-series KPIs above",
    "kaplan_meier_reorder": (
        "life-table product over gap-month buckets (parity_journey.py:336,"
        " bounded by the observation window in months)"
    ),
    "kaplan_meier_bucketed": (
        "the same bounded life-table windows as kaplan_meier_reorder, fed"
        " from the PERSISTED duration-bucket partial table"
        " (parity_journey.py:426 - input is the KB-scale bucket census,"
        " not fact rows)"
    ),
    # bucket/metadata frames: window input is a fixed bucket census
    "exact_quantiles_bucketed": (
        "bucket-offset window over 256 value-bucket totals"
        " (operators/prefixsum.py two-level scan)"
    ),
    "ks_two_sample_price_drift": (
        "ECDF offset window over the bounded value-bucket census"
    ),
    "join_key_skew_report": (
        "histogram window over the size-value census (parity_profile.py:256"
        " - rows = distinct per-key counts, a bounded size domain)"
    ),
    "sequence_packing_bins": (
        "bin assembly over the bounded shard/bucket metadata of the sharded"
        " prefix-sum (llm_sampling.py)"
    ),
    "top5_other_rollup": (
        "rank over the per-group totals (group domain: order statuses x"
        " months, bounded)"
    ),
    "pareto_frontier_parts": (
        "running-max over DISTINCT part prices (parity_retail.py:363 -"
        " bounded price domain, collapsed before the window)"
    ),
    "revenue_pareto_by_customer_decile": (
        "cum-share window over the 10 decile rows (the customer-rank window"
        " itself is the sharded scan now)"
    ),
    "rfm_customer_segments": (
        "NTILE windows over |customers| BELOW the row-count switch only"
        " (parity_retail._RFM_PREFIXSUM_MIN_ORDERS); above it the sharded"
        " rank scan runs - both paths locked bit-identical by"
        " tests/test_round7_ops.py"
    ),
    "quality_model_auc": (
        "Mann-Whitney offset window over the 6dp-rounded SCORE census"
        " (llm_filters.py round 9 - <= 1e6+1 distinct values regardless of"
        " corpus size, same boundedness as exact_quantiles_bucketed)"
    ),
}


def _top_level_groups(s: str) -> list[str]:
    """Split a physical-plan node's argument text into its top-level
    [...] groups (bracket-depth parser - window exprs nest brackets)."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(s[start + 1 : i])
                start = -1
    return groups


_NODE_RE = re.compile(
    r"^(?P<deco>[\s:+|*-]*(?:\(\d+\)\s*)?)(?P<name>[A-Za-z]\w*)(?P<rest>.*)$"
)

# Nodes that cap the rows reaching a downstream Window: Spark compiles a
# rank-filter over a GLOBAL window to LimitPushDownThroughWindow
# (TakeOrderedAndProject / Global+LocalLimit below the Window) and a
# partitioned one to WindowGroupLimit - either way the single-partition
# sort sees <= k rows, not the data.
_WINDOW_GUARDS = frozenset(
    {"WindowGroupLimit", "TakeOrderedAndProject", "GlobalLimit", "LocalLimit"}
)
# Pure pass-throughs between a Window and whatever bounds/feeds it.
_WINDOW_PASSTHROUGH = frozenset({"Sort", "Exchange", "ShuffleQueryStage",
                                 "InputAdapter", "WholeStageCodegen",
                                 "AQEShuffleRead", "Project", "Filter"})


def window_census(plan: str) -> tuple[int, int, int]:
    """(global_windows, partitioned_windows, guarded_global_windows) for a
    physical-plan string. A Window node renders as
    `Window [exprs], [partitionSpec], [orderSpec]` with the partition group
    OMITTED when empty (two top-level bracket groups instead of three). A
    global Window counts as guarded when a limit-type node
    (_WINDOW_GUARDS) sits directly beneath it, across pass-through
    sort/exchange/projection nodes."""
    nodes: list[tuple[int, str, str]] = []
    for line in plan.splitlines():
        m = _NODE_RE.match(line)
        if m:
            nodes.append(
                (len(m.group("deco")), m.group("name"), m.group("rest"))
            )
    n_global = n_part = n_guarded = 0
    for i, (indent, name, rest) in enumerate(nodes):
        if name != "Window":
            continue
        groups = _top_level_groups(rest)
        if len(groups) >= 3:
            n_part += 1
            continue
        # two groups is ambiguous: [exprs], [partitionSpec] (partitioned,
        # unordered - fine) vs [exprs], [orderSpec] (GLOBAL ordered - the
        # single-partition sort). Sort specs always render ASC/DESC.
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC)\b", groups[1]
        ):
            n_part += 1
            continue
        n_global += 1
        j = i + 1
        while j < len(nodes) and nodes[j][0] > indent:
            child = nodes[j][1]
            if child in _WINDOW_GUARDS:
                n_guarded += 1
                break
            if child in _WINDOW_PASSTHROUGH:
                j += 1
                continue
            break  # a data-sized child: unguarded
    return n_global, n_part, n_guarded


def main() -> None:
    spark = get_spark("plan-audit")
    specs = registry.all_specs()
    rows: list[tuple[str, int, int, list[str]]] = []
    errors: list[tuple[str, str]] = []
    for name, spec in sorted(specs.items()):
        if name.startswith("stream_"):
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            errors.append((name, traceback.format_exc(limit=1).splitlines()[-1]))
            continue
        shuffles = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning)", plan))
        bcasts = plan.count("BroadcastExchange")
        flags = []
        if "CartesianProduct" in plan:
            flags.append(
                "cartesian(ok)" if name in CARTESIAN_OK else "CARTESIAN"
            )
        nbl = plan.count("BroadcastNestedLoopJoin")
        if nbl:
            flags.append(
                f"bnl({nbl})" + (" baseline" if name in CARTESIAN_OK else "")
            )
        if "BatchEvalPython" in plan:
            flags.append("PY-ROW-UDF")
        n_global, _n_part, n_gl = window_census(plan)
        if n_global:
            if n_global <= n_gl:
                flags.append(f"window(limit x{n_global})")
            elif name in WINDOW_OK:
                flags.append(f"window(ok x{n_global})")
            else:
                flags.append(f"GLOBAL-WINDOW({n_global - n_gl})")
        rows.append((name, shuffles, bcasts, flags))
        # also drops RDD-layer localCheckpoint blocks (ranked_by_range,
        # PCA, graph CC) that clearCache() alone leaves resident
        clear_engine_state(spark)

    bad = [r for r in rows if any(f.isupper() for f in r[3])]
    lines = [
        "# Plan audit (generated by scripts/plan_audit.py)",
        "",
        f"Physical-plan sweep of {len(rows)} batch queries at sf0.001 "
        f"({len(errors)} skipped on error; stream_* audited by streaming tests).",
        "",
        f"**Unexplained anti-patterns: {len(bad)}** "
        "(CARTESIAN = unlabeled quadratic join; PY-ROW-UDF = row-at-a-time "
        "Python; GLOBAL-WINDOW = unpartitioned non-rank-limited window over "
        "unaudited cardinality). `cartesian(ok)` marks the documented "
        "calibration baselines and broadcast-of-tiny-band patterns; "
        "`window(limit)` marks global windows capped by WindowGroupLimit "
        "rank pushdown; `window(ok)` marks audited bounded/metadata global "
        "windows (justifications in scripts/plan_audit.py WINDOW_OK).",
        "",
        "| query | shuffles | broadcasts | flags |",
        "|---|---|---|---|",
    ]
    for name, sh, bc, flags in rows:
        lines.append(f"| `{name}` | {sh} | {bc} | {', '.join(flags) or '-'} |")
    if errors:
        lines += ["", "## Skipped (error during plan build)", ""]
        for name, err in errors:
            lines.append(f"- `{name}`: {err}")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"queries={len(rows)} errors={len(errors)} unexplained_antipatterns={len(bad)}"
    )
    for name, sh, bc, flags in bad:
        print("BAD:", name, flags)
    spark.stop()


if __name__ == "__main__":
    main()
