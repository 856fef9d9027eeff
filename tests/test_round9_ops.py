"""Round-9 operator tests: incremental maintenance seams and the two-phase
exact-quantile lifecycle (persisted histogram locate + bin-sliver refine)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.maintenance import (
    merge_session_tables,
    scd2_apply_changes,
)
from nyc_analytics_database_platform_spark.operators.scd import scd2_intervals


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_scd2_apply_absorbs_same_status_run(spark):
    """Seam rule: delta starting with the SAME attrs keeps the history row's
    valid_from and version - one unbroken run, exactly as a full recompute
    would see it."""
    hist = spark.createDataFrame(
        [(1, "2020-01-01", 10, "A"), (1, "2020-02-01", 11, "B")],
        "k int, ts string, seq int, status string",
    ).select("k", F.to_timestamp("ts").alias("ts"), "seq", "status")
    delta = spark.createDataFrame(
        [(1, "2020-03-01", 12, "B"), (1, "2020-04-01", 13, "C")],
        "k int, ts string, seq int, status string",
    ).select("k", F.to_timestamp("ts").alias("ts"), "seq", "status")
    merged = scd2_apply_changes(
        scd2_intervals(hist, "k", "ts", ("status",), ("seq",)),
        delta, "k", "ts", ("status",), ("seq",),
    )
    full = scd2_intervals(hist.unionByName(delta), "k", "ts", ("status",), ("seq",))
    cols = ["k", "status", "valid_from", "valid_to", "version", "is_current"]
    assert _rows(merged.select(*cols)) == _rows(full.select(*cols))
    # The absorbed run: version 2, open until 2020-04-01, valid_from Feb.
    cur_b = [r for r in merged.collect() if r["status"] == "B"]
    assert len(cur_b) == 1 and cur_b[0]["version"] == 2
    assert str(cur_b[0]["valid_from"])[:10] == "2020-02-01"


def test_scd2_apply_new_key_and_untouched_key(spark):
    hist = spark.createDataFrame(
        [(1, "2020-01-01", 1, "A")], "k int, ts string, seq int, status string"
    ).select("k", F.to_timestamp("ts").alias("ts"), "seq", "status")
    delta = spark.createDataFrame(
        [(2, "2020-05-01", 2, "X"), (2, "2020-06-01", 3, "Y")],
        "k int, ts string, seq int, status string",
    ).select("k", F.to_timestamp("ts").alias("ts"), "seq", "status")
    merged = scd2_apply_changes(
        scd2_intervals(hist, "k", "ts", ("status",), ("seq",)),
        delta, "k", "ts", ("status",), ("seq",),
    )
    full = scd2_intervals(hist.unionByName(delta), "k", "ts", ("status",), ("seq",))
    cols = ["k", "status", "valid_from", "valid_to", "version", "is_current"]
    assert _rows(merged.select(*cols)) == _rows(full.select(*cols))


def test_session_merge_seam_boundary_exact_gap(spark):
    """An exact-gap boundary does NOT merge (>= gap starts a new session),
    one microsecond under DOES."""
    def tab(rows):
        return spark.createDataFrame(
            rows, "k int, session_seq long, s long, e long, n long"
        )

    gap = 1_000_000
    hist = tab([(1, 1, 0, 100, 2)])
    # delta session starting exactly at e+gap: no merge
    d_no = tab([(1, 1, 100 + gap, 200 + gap, 3)])
    out = merge_session_tables(
        hist, d_no, "k", gap, seq_col="session_seq",
        start_col="s", end_col="e", add_cols=("n",),
    )
    assert _rows(out) == {(1, 1, 0, 100, 2), (1, 2, 100 + gap, 200 + gap, 3)}
    # one microsecond earlier: merge, stats add, seq stays 1
    d_yes = tab([(1, 1, 100 + gap - 1, 200 + gap, 3)])
    out2 = merge_session_tables(
        hist, d_yes, "k", gap, seq_col="session_seq",
        start_col="s", end_col="e", add_cols=("n",),
    )
    assert _rows(out2) == {(1, 1, 0, 200 + gap, 5)}


def test_quantile_refine_scan_pushes_price_range(spark, sf_dir):
    """Phase 2 of the two-phase quantile must read a PUSHED price range,
    not the whole fact: the widened bin range appears in PushedFilters."""
    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        _QHIST_BINS,
        build_month_quantile_table,
    )

    path = build_month_quantile_table(spark, sf_dir)
    row = spark.read.parquet(path).select("lo", "width").first()
    lo, width = row["lo"], row["width"]
    b = _QHIST_BINS // 2
    orders = load(spark, sf_dir, "orders")
    sliver = orders.filter(
        (F.col("o_totalprice") >= F.lit(lo + (b - 1) * width))
        & (F.col("o_totalprice") < F.lit(lo + (b + 2) * width))
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sliver.explain("formatted")
    fmt = buf.getvalue()
    pushed = [l for l in fmt.splitlines() if "PushedFilters" in l]
    assert pushed and "GreaterThanOrEqual(o_totalprice" in pushed[0]
    assert "LessThan(o_totalprice" in pushed[0]


def test_quantile_table_matches_exact_order_statistics(spark, sf_dir):
    """The two-phase answer equals the order statistic computed the naive
    way (collect + sort in the test; fine at test scale)."""
    from nyc_analytics_database_platform_spark.registry import all_specs

    q = all_specs()["quantile_table_range_price"]
    got = q.fn(spark, sf_dir).first()
    prices = sorted(
        r[0]
        for r in load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .select("o_totalprice")
        .collect()
    )
    n = len(prices)
    assert got["n_orders"] == n
    assert got["p50"] == prices[(1 * n + 1) // 2 - 1]
    assert got["p95"] == prices[(19 * n + 19) // 20 - 1]


def test_manifest_prunes_most_files(spark, sf_dir):
    """The quarter query's manifest selection must open a strict subset of
    the 16 range-fragmented files (~2 for a quarter of a 6.5-year span) -
    the planner-side pruning the persisted manifest exists for."""
    import os

    from pyspark.sql import functions as F

    from nyc_analytics_database_platform_spark.queries.parity_lifecycle import (
        build_orders_date_manifest,
    )

    layout, manifest = build_orders_date_manifest(spark, sf_dir)
    n_total = len([f for f in os.listdir(layout) if f.endswith(".parquet")])
    picked = (
        spark.read.parquet(manifest)
        .filter(
            (F.col("max_ts") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("min_ts") < F.lit("1997-04-01").cast("timestamp"))
        )
        .count()
    )
    assert n_total == 16
    assert 0 < picked <= 3, picked
    # Every file must carry stats (TIMESTAMP_MICROS write path).
    assert spark.read.parquet(manifest).filter("min_ts IS NULL").count() == 0


def test_compaction_reduces_files_and_preserves_content(spark, sf_dir, tmp_path):
    """compact_parquet_dir on a 32-way fragmented slice: fewer files out
    than in, identical row multiset (checksum), advisory conf restored."""
    from pyspark.sql import functions as F

    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.operators.compaction import (
        compact_parquet_dir,
        dir_stats,
    )

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    load(spark, sf_dir, "customer").repartition(32).write.parquet(src)
    n_before, total = dir_stats(src)
    before_conf = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", None
    )
    stats = compact_parquet_dir(spark, src, dst, target_bytes=max(1, total // 2))
    after_conf = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", None
    )
    assert after_conf == before_conf
    assert stats["n_files_after"] < stats["n_files_before"] == n_before == 32
    a = spark.read.parquet(src).agg(
        F.sum(F.xxhash64("*").cast("decimal(38,0)")), F.count("*")
    ).first()
    b = spark.read.parquet(dst).agg(
        F.sum(F.xxhash64("*").cast("decimal(38,0)")), F.count("*")
    ).first()
    assert tuple(a) == tuple(b)


def test_session_merge_seam_scan_is_column_pruned(spark, tmp_path):
    """VERDICT r9 #3: the seam extraction must locate each side's boundary
    session from a (key, seq)-only scan of history - never by windowing
    full-width rows (array partials included). Pins: (a) no Window node
    anywhere in the merge plan, (b) a history scan whose ReadSchema is
    exactly the two seam columns, (c) the carry-column recovery join plans
    as a broadcast hash join under broadcast_seam=True, so the full-width
    history scan has no Exchange at all."""
    import contextlib
    import io

    hist_path = str(tmp_path / "hist_sessions")
    spark.createDataFrame(
        [(1, 1, 0, 100, 2, ["a"]), (1, 2, 500, 600, 1, ["b"]),
         (2, 1, 0, 50, 1, ["a", "c"])],
        "k int, session_seq long, s long, e long, n long, types array<string>",
    ).write.mode("overwrite").parquet(hist_path)
    hist = spark.read.parquet(hist_path)
    delta = spark.createDataFrame(
        [(1, 1, 650, 700, 3, ["c"])],
        "k int, session_seq long, s long, e long, n long, types array<string>",
    )
    out = merge_session_tables(
        hist, delta, "k", 1_000_000, seq_col="session_seq",
        start_col="s", end_col="e", add_cols=("n",), set_cols=("types",),
        broadcast_seam=True,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, "seam must not re-window history"
    assert "BroadcastHashJoin" in plan
    # Exactly one history scan is column-pruned to the seam pair; scans of
    # the same parquet location appear with their ReadSchema in formatted
    # explain output.
    pruned_scans = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "k:int,session_seq:bigint" in ln
    ]
    assert pruned_scans, f"no (k, session_seq)-only history scan in:\n{plan}"
    # and the merged values are still exact (seam absorbs: gap 50 < 1s);
    # set-partial array order is engine-chosen, so compare sorted tuples
    rows = {(r["k"], r["session_seq"], r["s"], r["e"], r["n"],
             tuple(sorted(r["types"]))) for r in out.collect()}
    assert rows == {
        (1, 1, 0, 100, 2, ("a",)),
        (2, 1, 0, 50, 1, ("a", "c")),
        (1, 2, 500, 700, 4, ("b", "c")),
    }
