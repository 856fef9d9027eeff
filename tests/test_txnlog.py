"""Transaction-log (operators/txnlog.py) mechanics: atomic optimistic
commits, copy-on-write file pruning, log-diff CDC, crash invisibility,
vacuum safety, and chain adoption. The value-level answers are covered by
the five registered parity_versioned queries (oracle-checked); these tests
pin the FILE-LEVEL properties the oracles cannot see — which files were
rewritten vs carried, what a crashed writer leaves behind, what vacuum
removes."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.operators import txnlog
from nyc_analytics_database_platform_spark.queries.parity_versioned import (
    build_orders_commit_chain,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "table")


def _orders(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("v"),
    )


def test_append_and_time_travel(spark, root):
    df = _orders(spark)
    v1 = txnlog.append(spark, root, df.filter("k < 60"), range_col="k", n_files=3)
    v2 = txnlog.append(spark, root, df.filter("k >= 60"), range_col="k", n_files=2)
    assert (v1, v2) == (1, 2)
    assert txnlog.read_version(spark, root, 1).count() == 60
    assert txnlog.read_version(spark, root, 2).count() == 100
    # v2's file list contains v1's files by reference (append is O(delta)).
    f1 = set(txnlog.read_entry(root, 1)["files"])
    f2 = set(txnlog.read_entry(root, 2)["files"])
    assert f1 < f2 and len(f2 - f1) == 2


def test_commit_conflict_raised_and_retry_wins(spark, root):
    txnlog.append(spark, root, _orders(spark, 10), n_files=1)
    files = txnlog.read_entry(root, 1)["files"]
    # Direct log-level race: two writers publish against parent 1.
    txnlog.commit(root, 1, files, "append")
    with pytest.raises(txnlog.CommitConflict):
        txnlog.commit(root, 1, files, "append")
    # append() retries internally: same stale parent, no data lost.
    txnlog.append(spark, root, _orders(spark, 5), n_files=1, parent=1)
    assert txnlog.latest_version(root) == 3
    assert txnlog.read_version(spark, root, 3).count() == 15


def test_cow_delete_prunes_files(spark, root):
    txnlog.append(spark, root, _orders(spark, 1000), range_col="k", n_files=8)
    v, stats = txnlog.delete_range_cow(spark, root, "k", 100, 200)
    assert v == 2
    # Range-clustered layout: the 100-key delete touches a strict minority
    # of files; the rest carry over by reference (zero I/O).
    assert stats["n_rewritten"] < stats["n_parent_files"]
    assert stats["n_carried"] > 0
    carried = set(txnlog.read_entry(root, 1)["files"]) & set(
        txnlog.read_entry(root, 2)["files"]
    )
    assert len(carried) == stats["n_carried"]
    got = txnlog.read_version(spark, root, 2)
    assert got.count() == 900
    assert got.filter("k >= 100 and k < 200").count() == 0


def test_cdc_cancels_cow_survivor_copies(spark, root):
    txnlog.append(spark, root, _orders(spark, 100), range_col="k", n_files=2)
    txnlog.delete_range_cow(spark, root, "k", 10, 20)
    feed = txnlog.changes_between(spark, root, 1, 2, ["k", "v"]).collect()
    # Survivors copied into the rewrite (the other ~40 rows of the touched
    # file) must NOT appear in the feed — only the 10 true deletes.
    assert sorted(r["k"] for r in feed) == list(range(10, 20))
    assert {r["change_type"] for r in feed} == {"delete"}


def test_crashed_writer_invisible(spark, root):
    txnlog.append(spark, root, _orders(spark, 50), n_files=1)
    # Simulate a crash: files staged under data/ but no log entry linked.
    staged = os.path.join(root, "data", "v00002-crashed")
    _orders(spark, 7).write.parquet(staged)
    assert txnlog.latest_version(root) == 1
    assert txnlog.read_version(spark, root).count() == 50
    # Vacuum collects the orphaned staging files.
    removed = txnlog.vacuum(root, keep_last=1)
    assert removed["n_files_removed"] >= 1
    assert txnlog.read_version(spark, root).count() == 50


def test_vacuum_retention_and_expiry(spark, root):
    df = _orders(spark, 200)
    txnlog.append(spark, root, df.filter("k < 100"), range_col="k", n_files=4)
    txnlog.append(spark, root, df.filter("k >= 100"), range_col="k", n_files=2)
    txnlog.delete_range_cow(spark, root, "k", 0, 50)
    before = txnlog.read_version(spark, root).collect()
    stats = txnlog.vacuum(root, keep_last=1)
    # The delete rewrote >= 1 file, so its pre-image is now unreferenced.
    assert stats["n_files_removed"] >= 1
    assert stats["n_versions_expired"] == 2
    # Live data untouched; expired versions gone; head still intact.
    after = txnlog.read_version(spark, root).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    with pytest.raises(OSError):
        txnlog.read_entry(root, 1)
    assert txnlog.chain_intact(root)


def test_chain_adoption_and_cleaner_guard(spark, sf_dir):
    root = build_orders_commit_chain(spark, sf_dir)
    head_entry = txnlog._entry_path(root, txnlog.latest_version(root))
    mtime = os.path.getmtime(head_entry)
    # Second call adopts: no rebuild, the log is byte-identical.
    assert build_orders_commit_chain(spark, sf_dir) == root
    assert os.path.getmtime(head_entry) == mtime
    # A tmp cleaner that removes data files forces a rebuild, never a
    # broken adopt (chain_intact gate).
    victim = txnlog.snapshot_files(root, 1)[0]
    os.unlink(victim)
    assert not txnlog.chain_intact(root)
    root2 = build_orders_commit_chain(spark, sf_dir)
    assert txnlog.chain_intact(root2)
    n = txnlog.read_version(spark, root2, 2).count()
    assert n > 0


def test_concurrent_append_race_is_exercised(spark, sf_dir):
    """The registered concurrency query must hit a REAL conflict on every
    fresh build: writer B commits against parent 1 after A took v2."""
    from nyc_analytics_database_platform_spark import layouts
    from nyc_analytics_database_platform_spark.queries import parity_versioned

    root = layouts.scratch(sf_dir, "txnlog", "cc")
    shutil.rmtree(root, ignore_errors=True)
    try:
        os.unlink(root + "_done")
    except OSError:
        pass
    out = parity_versioned.txnlog_concurrent_appends(spark, sf_dir)
    assert txnlog.latest_version(root) == 3
    assert out.count() > 0
    ops = [txnlog.read_entry(root, v)["op"] for v in (1, 2, 3)]
    assert ops == ["append", "append", "append"]


def test_mor_delete_rewrites_nothing_and_reads_apply_dv(spark, root):
    txnlog.append(spark, root, _orders(spark, 100), range_col="k", n_files=4)
    v = txnlog.delete_where_mor(spark, root, ["k"], F.col("k") < 10)
    assert v == 2
    e1, e2 = txnlog.read_entry(root, 1), txnlog.read_entry(root, 2)
    assert e1["files"] == e2["files"]          # zero data files rewritten
    assert len(e2["delete_files"]) == 1
    got = txnlog.read_version(spark, root, 2)
    assert got.count() == 90
    assert got.filter("k < 10").count() == 0
    # time travel to v1 still sees everything
    assert txnlog.read_version(spark, root, 1).count() == 100


def test_purge_prunes_and_is_logically_silent(spark, root):
    txnlog.append(spark, root, _orders(spark, 1000), range_col="k", n_files=8)
    txnlog.delete_where_mor(spark, root, ["k"], (F.col("k") >= 100) & (F.col("k") < 160))
    v, stats = txnlog.purge_deletes(spark, root, "k")
    assert v == 3
    assert stats["n_carried"] > 0
    assert stats["n_rewritten"] < stats["n_parent_files"]
    assert txnlog.read_entry(root, 3).get("delete_files", []) == []
    before = txnlog.read_version(spark, root, 2).collect()
    after = txnlog.read_version(spark, root, 3).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    # CDC across the purge is EMPTY: file-diff and resurrection cancel.
    feed = txnlog.changes_between(spark, root, 2, 3, ["k", "v"])
    assert feed.count() == 0


def test_mor_cdc_and_resurrection(spark, root):
    txnlog.append(spark, root, _orders(spark, 100), range_col="k", n_files=2)
    txnlog.delete_where_mor(spark, root, ["k"], (F.col("k") >= 20) & (F.col("k") < 25))
    feed = txnlog.changes_between(spark, root, 1, 2, ["k", "v"]).collect()
    assert sorted(r["k"] for r in feed) == list(range(20, 25))
    assert {r["change_type"] for r in feed} == {"delete"}
    # Undelete: drop the delete set WITHOUT rewriting (entry-only commit) -
    # the feed must emit the rows as inserts (the symmetric branch).
    e2 = txnlog.read_entry(root, 2)
    txnlog.commit(root, 2, e2["files"], "undelete",
                  extra={"delete_files": [], "delete_key_cols": ["k"]})
    feed3 = txnlog.changes_between(spark, root, 2, 3, ["k", "v"]).collect()
    assert sorted(r["k"] for r in feed3) == list(range(20, 25))
    assert {r["change_type"] for r in feed3} == {"insert"}


def test_vacuum_retains_live_delete_files(spark, root):
    txnlog.append(spark, root, _orders(spark, 100), range_col="k", n_files=4)
    txnlog.delete_where_mor(spark, root, ["k"], F.col("k") < 10)
    stats = txnlog.vacuum(root, keep_last=1)
    assert stats["n_files_removed"] == 0       # data + DV all still referenced
    assert txnlog.read_version(spark, root).count() == 90


def test_stream_batch_commit_is_idempotent(spark, root):
    df = _orders(spark, 30)
    v1 = txnlog.commit_stream_batch(spark, root, df.filter("k < 20"), batch_id=0)
    v2 = txnlog.commit_stream_batch(spark, root, df.filter("k >= 20"), batch_id=1)
    assert (v1, v2) == (1, 2)
    # Replay of batch 1 (restart redelivery): no new version, no new rows.
    assert txnlog.commit_stream_batch(spark, root, df.filter("k >= 20"), batch_id=1) is None
    assert txnlog.latest_version(root) == 2
    assert txnlog.read_version(spark, root).count() == 30
    assert txnlog.committed_batch_ids(root) == {0, 1}


def test_schema_evolution_merge_read(spark, root):
    txnlog.append(spark, root, _orders(spark, 10), n_files=1)
    txnlog.append(spark, root,
                  _orders(spark, 5).withColumn("tag", F.lit("new")), n_files=1)
    got = txnlog.read_version(spark, root, merge_schema=True)
    assert "tag" in got.columns
    assert got.filter(F.col("tag").isNull()).count() == 10
    assert got.filter(F.col("tag") == "new").count() == 5


def test_branch_pointer_and_vacuum_pin(spark, root):
    txnlog.append(spark, root, _orders(spark, 60), range_col="k", n_files=2)
    txnlog.set_branch(root, "main", 1)
    txnlog.delete_range_cow(spark, root, "k", 0, 30)
    txnlog.append(spark, root, _orders(spark, 10).withColumn(
        "k", F.col("k") + 1000), range_col="k", n_files=1)
    with pytest.raises(ValueError):
        txnlog.set_branch(root, "missing", 99)
    stats = txnlog.vacuum(root, keep_last=1)
    # v1 is branch-pinned: entry survives retention, its files survive GC.
    assert stats["n_versions_expired"] == 1            # only v2 expires
    assert txnlog.read_branch(spark, root, "main").count() == 60
    assert txnlog.get_branch(root, "main") == 1


def test_wap_rejected_staging_is_invisible_and_collectable(spark, root):
    txnlog.append(spark, root, _orders(spark, 50), range_col="k", n_files=2)
    txnlog.set_branch(root, "main", 1)
    poison = _orders(spark, 5).withColumn("v", -F.col("v"))
    txnlog.append(spark, root, poison, n_files=1)        # staged, audited out
    # Consumers never see the staged commit: main still reads v1.
    assert txnlog.read_branch(spark, root, "main").count() == 50
    # The corrected delta bases its lineage on the published version.
    v3 = txnlog.append(spark, root, _orders(spark, 5).withColumn(
        "k", F.col("k") + 500), n_files=1, base=1)
    assert sorted(txnlog.read_entry(root, 3)["files"])[:2] == sorted(
        txnlog.read_entry(root, 1)["files"]
    )  # poisoned v2 files are NOT in v3's lineage
    txnlog.set_branch(root, "main", v3)
    assert txnlog.read_branch(spark, root, "main").count() == 55
    # Vacuum collects the rejected staging files (unreferenced anywhere).
    stats = txnlog.vacuum(root, keep_last=1)
    assert stats["n_files_removed"] >= 1
    assert txnlog.read_branch(spark, root, "main").count() == 55


def test_read_version_scans_exactly_the_pinned_files(spark, root):
    """Plan-level pin: a time-travel read's scan file set IS the snapshot
    file list — no directory listing can leak unpinned files in (the
    property that makes concurrent writes invisible to running reads)."""
    txnlog.append(spark, root, _orders(spark, 40), range_col="k", n_files=2)
    txnlog.append(spark, root, _orders(spark, 10).withColumn(
        "k", F.col("k") + 100), range_col="k", n_files=1)
    for v in (1, 2):
        scanned = {os.path.realpath(p.removeprefix("file:"))
                   for p in txnlog.read_version(spark, root, v).inputFiles()}
        pinned = {os.path.realpath(p) for p in txnlog.snapshot_files(root, v)}
        assert scanned == pinned
    # A concurrent append between plan and execution cannot appear: the
    # v2 read's files are a strict superset of v1's plus only v2's delta.
    assert len(txnlog.snapshot_files(root, 2)) == 3


def test_purge_after_cow_removed_all_dv_targets(spark, root):
    """A CoW delete can rewrite away every row a delete set names; the
    following purge must drop the set without rewriting anything."""
    txnlog.append(spark, root, _orders(spark, 100), range_col="k", n_files=4)
    txnlog.delete_where_mor(spark, root, ["k"], (F.col("k") >= 10) & (F.col("k") < 12))
    txnlog.delete_range_cow(spark, root, "k", 0, 30)
    v, stats = txnlog.purge_deletes(spark, root, "k")
    assert stats["n_rewritten"] == 0
    assert txnlog.read_entry(root, v).get("delete_files", []) == []
    assert txnlog.read_version(spark, root, v).count() == 70


def test_vacuum_after_tighter_vacuum(spark, root):
    """A retention window that spans already-expired versions must skip
    them, not crash."""
    for i in range(4):
        txnlog.append(spark, root, _orders(spark, 10).withColumn(
            "k", F.col("k") + 100 * i), n_files=1)
    txnlog.vacuum(root, keep_last=1)        # expires v1-v3
    stats = txnlog.vacuum(root, keep_last=3)  # window spans the expired ones
    assert stats["n_files_removed"] == 0
    assert txnlog.read_version(spark, root).count() == 40


def test_optimize_is_silent_and_improves_skip(spark, root):
    """OPTIMIZE commits a re-clustered rewrite: logically silent (empty
    CDC), and the per-file (x, y) bounding boxes actually tighten — on the
    hash-scattered v1 every file's bbox intersects the probe box, after
    z-ordering only a minority do (the file-skip that makes 2-D probes
    metadata-bounded at 100 TB)."""
    from nyc_analytics_database_platform_spark.functions.zorder import zvalue

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").cast("double").alias("v"),
    )
    txnlog.append(spark, root, df.repartition(8, "v"), n_files=0)
    txnlog.optimize(spark, root, zvalue("x", "y", bits=6), "z(x,y)",
                    n_files=8)
    assert txnlog.changes_between(spark, root, 1, 2, ["x", "y", "v"]).count() == 0

    def intersecting(version):
        hits = 0
        for f in txnlog.snapshot_files(root, version):
            b = spark.read.parquet(f).agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")).first()
            if b[1] >= 8 and b[0] <= 23 and b[3] >= 8 and b[2] <= 23:
                hits += 1
        return hits, len(txnlog.snapshot_files(root, version))

    before_hits, before_n = intersecting(1)
    after_hits, after_n = intersecting(2)
    assert before_hits == before_n            # scattered: no skip at all
    assert after_hits < after_n               # z-ordered: real file skip
    # MoR deletes are materialized into the rewrite and dropped.
    txnlog.delete_where_mor(spark, root, ["v"], F.col("v") < 100)
    txnlog.optimize(spark, root, zvalue("x", "y", bits=6), "z(x,y)")
    assert txnlog.read_entry(root, 4).get("delete_files", []) == []
    assert txnlog.read_version(spark, root).count() == 4096 - 100


def test_catalog_commit_atomic_pins(spark, root):
    a_root, b_root = os.path.join(root, "a"), os.path.join(root, "b")
    txnlog.append(spark, a_root, _orders(spark, 10), n_files=1)
    txnlog.append(spark, b_root, _orders(spark, 20), n_files=1)
    txnlog.catalog_commit(root, {"a": 1, "b": 1}, parent=0)
    txnlog.append(spark, a_root, _orders(spark, 5).withColumn(
        "k", F.col("k") + 50), n_files=1)
    # a@2 exists on disk, but the catalog still exposes only (a@1, b@1).
    assert txnlog.catalog_snapshot(root) == {"a": 1, "b": 1}
    txnlog.catalog_commit(root, {"a": 2, "b": 1}, parent=1)
    assert txnlog.catalog_snapshot(root) == {"a": 2, "b": 1}
    assert txnlog.catalog_snapshot(root, 1) == {"a": 1, "b": 1}
    with pytest.raises(txnlog.CommitConflict):
        txnlog.catalog_commit(root, {"a": 2, "b": 2}, parent=1)


def test_clone_shares_bytes_but_not_lifetime(spark, root):
    src, cln = os.path.join(root, "src"), os.path.join(root, "cln")
    txnlog.append(spark, src, _orders(spark, 80), range_col="k", n_files=4)
    txnlog.delete_where_mor(spark, src, ["k"], F.col("k") < 10)
    txnlog.clone(src, cln)
    # Zero-copy: every clone data file is a hard link (same inode).
    src_inodes = {os.stat(f).st_ino for f in txnlog.snapshot_files(src, 2)}
    cln_inodes = {os.stat(f).st_ino for f in txnlog.snapshot_files(cln, 1)}
    assert cln_inodes == src_inodes
    # The clone carries the source's delete set: same visible rows.
    assert txnlog.read_version(spark, cln).count() == 70
    # Divergence is isolated in both directions.
    txnlog.delete_range_cow(spark, cln, "k", 40, 80)
    assert txnlog.read_version(spark, cln).count() == 30
    assert txnlog.read_version(spark, src).count() == 70
    # Source vacuum (even source DELETION) cannot break the clone.
    txnlog.delete_range_cow(spark, src, "k", 0, 100)   # rewrites src files
    txnlog.vacuum(src, keep_last=1)
    shutil.rmtree(src)
    assert txnlog.read_version(spark, cln).count() == 30


def test_cdf_consumer_offsets_and_crash_replay(spark, sf_dir, tmp_path):
    from nyc_analytics_database_platform_spark.queries.parity_versioned import (
        _consumer_pointer,
        consumer_advance,
    )

    root = build_orders_commit_chain(spark, sf_dir)
    consumer = str(tmp_path / "consumer")
    os.makedirs(consumer)
    assert consumer_advance(spark, root, consumer, through=2) == 2
    mid = _consumer_pointer(consumer)
    # Idempotent: re-advancing with nothing new is a no-op.
    assert consumer_advance(spark, root, consumer, through=2) == 2
    assert _consumer_pointer(consumer) == mid
    # Crash between view write and pointer swap: a stray view dir for the
    # next offset exists, but the pointer still holds (v2, view_v2) - the
    # replay must consume v3's feed exactly once on top of the OLD view.
    (tmp_path / "consumer" / "view_v00003").mkdir()
    assert consumer_advance(spark, root, consumer) == 3
    ptr = _consumer_pointer(consumer)
    assert ptr["offset"] == 3
    got = spark.read.parquet(os.path.join(consumer, ptr["view"]))
    want = (
        txnlog.read_version(spark, root, 3)
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"),
                               "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("n"))
    )
    gm = {(r["month"], r["n"]) for r in got.select("month", "n").collect()}
    wm = {(r["month"], r["n"]) for r in want.collect()}
    assert gm == wm
    # Superseded view dirs are pruned once the pointer swap commits
    # (ADVICE r10: advances used to leak one abandoned view per refresh),
    # EXCEPT the immediately-previous view, which survives one generation
    # because lazy readers may still hold unexecuted plans over it
    # (ADVICE r11).
    views = sorted(n for n in os.listdir(consumer) if n.startswith("view_v"))
    assert views == sorted({ptr["view"], mid["view"]})


def test_batch_id_watermark_survives_vacuum(spark, root):
    """Exactly-once dedup after retention: vacuum expires the individual
    stream-append entries, but the cumulative batch-id set rides forward
    in every head entry, so a post-vacuum redelivery is still skipped
    (ADVICE r10: vacuum used to lose the dedup set)."""
    df = _orders(spark, 30)
    txnlog.commit_stream_batch(spark, root, df.filter("k < 10"), batch_id=0)
    txnlog.commit_stream_batch(spark, root,
                               df.filter("(k >= 10) and (k < 20)"), batch_id=1)
    # Non-stream commits in between must carry the watermark too.
    txnlog.append(spark, root, df.filter("k >= 20"), range_col="k", n_files=1)
    txnlog.delete_range_cow(spark, root, "k", 0, 5)
    stats = txnlog.vacuum(root, keep_last=1)
    assert stats["n_versions_expired"] == 3  # stream entries are expendable
    assert txnlog.committed_batch_ids(root) == {0, 1}
    assert txnlog.commit_stream_batch(
        spark, root, df.filter("(k >= 10) and (k < 20)"), batch_id=1) is None
    assert txnlog.read_version(spark, root).count() == 25


def test_vacuum_grace_window_protects_staged_files(spark, root):
    """grace_seconds: files staged by a concurrent writer (unreferenced
    until its commit links) survive a vacuum whose grace window covers
    them; with grace 0 they are collected as before."""
    txnlog.append(spark, root, _orders(spark, 20), n_files=1)
    # Stage files the way append does, without committing.
    staged = txnlog._write_version_dir(
        root, 2, _orders(spark, 5), None, 1)
    stats = txnlog.vacuum(root, keep_last=1, grace_seconds=3600)
    assert stats["n_files_removed"] == 0
    # The staged write can still commit: every file it references exists.
    head = txnlog.latest_version(root)
    base = txnlog.read_entry(root, head)["files"]
    v = txnlog.commit(root, head, base + staged, "append")
    assert txnlog.read_version(spark, root, v).count() == 25
    # Without the grace window, the same staged files would have been
    # collected and the commit must fail loudly, not publish a broken
    # snapshot (ADVICE r10 medium).
    orphan = txnlog._write_version_dir(root, 9, _orders(spark, 3), None, 1)
    txnlog.vacuum(root, keep_last=1, grace_seconds=0)
    with pytest.raises(FileNotFoundError):
        txnlog.commit(root, txnlog.latest_version(root),
                      txnlog.read_entry(root, v)["files"] + orphan, "append")


def test_vacuum_entry_only_table_and_extra_pins(spark, tmp_path):
    """A catalog root (entries with files=[], no data directory) must
    vacuum without error; extra_pins retains catalog-pinned versions of a
    member table that its own retention would expire."""
    cat = str(tmp_path / "cat")
    tbl = str(tmp_path / "tbl")
    v1 = txnlog.append(spark, tbl, _orders(spark, 10), n_files=1)
    txnlog.catalog_commit(cat, {"tbl": v1}, parent=0)
    txnlog.append(spark, tbl, _orders(spark, 5).withColumn(
        "k", F.col("k") + 100), n_files=1)
    # Entry-only root: no data dir, must not raise (ADVICE r10 low).
    stats = txnlog.vacuum(cat, keep_last=1)
    assert stats["n_files_removed"] == 0
    pins = txnlog.catalog_snapshot(cat)
    stats = txnlog.vacuum(tbl, keep_last=1, extra_pins=set(pins.values()))
    assert stats["n_versions_expired"] == 0  # v1 is catalog-pinned
    assert txnlog.read_version(spark, tbl, pins["tbl"]).count() == 10


def test_latest_version_past_five_digits(root):
    """v100000.json must parse as 100000, not a truncated 10000
    (ADVICE r10 low: fixed-width slice)."""
    os.makedirs(os.path.join(root, "log"), exist_ok=True)
    for v in (99999, 100000):
        with open(os.path.join(root, "log", f"v{v:05d}.json"), "w") as fh:
            fh.write('{"version": %d, "files": []}' % v)
    assert txnlog.latest_version(root) == 100000


def test_stream_delete_batch_idempotent_and_purgeable(spark, root):
    """commit_stream_delete_batch: exactly-once delete registration under
    redelivery, visibility through read_version, empty CDC across the
    later purge, and dedup state surviving vacuum."""
    txnlog.append(spark, root, _orders(spark, 100), range_col="k", n_files=4)
    v2 = txnlog.commit_stream_delete_batch(
        spark, root, _orders(spark, 100).filter("k < 10").select("k"),
        batch_id=0, key_cols=["k"])
    assert v2 == 2
    assert txnlog.read_version(spark, root).count() == 90
    # Redelivery of batch 0 (restart replay): no new version.
    assert txnlog.commit_stream_delete_batch(
        spark, root, _orders(spark, 100).filter("k < 10").select("k"),
        batch_id=0, key_cols=["k"]) is None
    assert txnlog.latest_version(root) == 2
    # Second batch accumulates on the same delete set.
    txnlog.commit_stream_delete_batch(
        spark, root, _orders(spark, 100).filter("(k >= 50) and (k < 60)")
        .select("k"), batch_id=1, key_cols=["k"])
    assert txnlog.read_version(spark, root).count() == 80
    # Purge rewrites the affected files, drops the set, changes no rows,
    # and the CDC feed across the purge is EMPTY.
    head = txnlog.latest_version(root)
    pv, stats = txnlog.purge_deletes(spark, root, "k")
    assert stats["n_rewritten"] > 0
    assert txnlog.read_version(spark, root, pv).count() == 80
    assert txnlog.changes_between(spark, root, head, pv, ["k", "v"]).count() == 0
    # Vacuum expires the stream-delete entries; the batch-id watermark in
    # the head entry still dedupes a late redelivery.
    txnlog.vacuum(root, keep_last=1)
    assert txnlog.commit_stream_delete_batch(
        spark, root, _orders(spark, 100).filter("k < 10").select("k"),
        batch_id=1, key_cols=["k"]) is None


def test_optimize_files_targets_only_selected(spark, sf_dir):
    """Plan -> execute discrimination: the policy-selected files are
    rewritten, every healthy file carries by reference, the change feed
    across the compaction commit is empty, and the planner re-run on the
    compacted head no longer selects the rewrite output wholesale."""
    from nyc_analytics_database_platform_spark import layouts
    from nyc_analytics_database_platform_spark.queries.parity_versioned import (
        _compaction_manifest_plan,
    )

    # Rebuild the variant chain from scratch: a previous run of this test
    # compacted its head, and the plan over a compacted manifest is
    # (correctly) empty — the assertions below need the fragmented state.
    stale = layouts.scratch(sf_dir, "txnlog", "compacttest")
    shutil.rmtree(stale, ignore_errors=True)
    try:
        os.unlink(stale + "_done")
    except OSError:
        pass
    root, plan, selected = _compaction_manifest_plan(
        spark, sf_dir, variant="compacttest")
    head = txnlog.latest_version(root)
    before = set(txnlog.read_entry(root, head)["files"])
    assert selected and set(selected) < before   # discriminates
    n_rows_before = txnlog.read_version(spark, root).count()
    v = txnlog.optimize_files(spark, root, selected, "o_orderkey", n_files=2)
    after = set(txnlog.read_entry(root, v)["files"])
    assert not (set(selected) & after)           # selected gone
    assert (before - set(selected)) < after      # healthy carried by ref
    assert txnlog.read_version(spark, root, v).count() == n_rows_before
    feed = txnlog.changes_between(
        spark, root, head, v, ["o_orderkey", "o_totalprice"])
    assert feed.count() == 0                     # logically silent
    with pytest.raises(ValueError):
        txnlog.optimize_files(spark, root, ["data/nope.parquet"], "o_orderkey")


def test_stream_delete_on_empty_table_raises(spark, root):
    """ADVICE r11: head==0 used to fall into read_entry(root, 0) (OSError)
    then KeyError; now it is a loud, typed refusal."""
    with pytest.raises(ValueError, match="empty table"):
        txnlog.commit_stream_delete_batch(
            spark, root, _orders(spark, 5).select("k"),
            batch_id=0, key_cols=["k"])


def test_stream_delete_retry_revalidates_key_cols(spark, root, monkeypatch):
    """ADVICE r11 (medium): after a CommitConflict the retry loop must
    re-check delete_key_cols against the WINNER's head — a racing writer
    that registered deletes under different key columns would otherwise
    have its delete files silently reinterpreted under our key schema.
    Simulated race: the first commit attempt is intercepted, a rival
    MoR-delete keyed on a DIFFERENT column lands, then the original
    attempt conflicts and retries."""
    txnlog.append(spark, root, _orders(spark, 20), range_col="k", n_files=2)
    real_commit = txnlog.commit
    state = {"raced": False}

    def racing_commit(r, parent, files, op, extra=None):
        if not state["raced"] and op == "stream-delete-mor":
            state["raced"] = True
            # Rival wins version parent+1 with a DIFFERENT key column.
            real_commit(r, parent, files, "stream-delete-mor", extra={
                "delete_files": extra["delete_files"],
                "delete_key_cols": ["v"], "batch_id": 99})
        return real_commit(r, parent, files, op, extra)

    monkeypatch.setattr(txnlog, "commit", racing_commit)
    with pytest.raises(ValueError, match="stable per table"):
        txnlog.commit_stream_delete_batch(
            spark, root, _orders(spark, 20).filter("k < 5").select("k"),
            batch_id=0, key_cols=["k"])


def test_raw_commit_carries_batch_id_watermark(spark, root):
    """ADVICE r11: commit() itself unions the parent's batch_ids forward,
    so a chain-building helper issuing a raw commit() at the head cannot
    drop the exactly-once watermark — vacuum after such a commit used to
    lose dedup state despite the round-11 _bid_extra fix."""
    df = _orders(spark, 20)
    txnlog.commit_stream_batch(spark, root, df.filter("k < 10"), batch_id=7)
    # Raw commit at head WITHOUT threading _bid_extra (the hazard case).
    head = txnlog.latest_version(root)
    files = txnlog.read_entry(root, head)["files"]
    txnlog.commit(root, head, files, "manual-maintenance")
    txnlog.vacuum(root, keep_last=1)
    assert 7 in txnlog.committed_batch_ids(root)
    assert txnlog.commit_stream_batch(
        spark, root, df.filter("k < 10"), batch_id=7) is None


def test_stream_delete_compaction_boundary_invariants(spark, root):
    """Streamed MoR deletes -> delete-aware compaction (round 12): the
    policy selects exactly the files whose key ranges intersect the
    pending delete set, the optimize commit is logically silent (CDC
    across the boundary EMPTY, time-travel to the pre-compaction head
    identical), clean files carry by reference, and the batch-id
    watermark rides through the optimize commit so a late replay of a
    streamed batch still dedupes after vacuum."""
    from nyc_analytics_database_platform_spark.queries.parity_versioned import (
        _mor_delete_compaction_plan,
    )

    txnlog.append(spark, root, _orders(spark, 1000), range_col="k", n_files=8)
    # Two streamed delete batches confined to the low key range.
    for bid, (lo, hi) in enumerate(((0, 40), (40, 80))):
        txnlog.commit_stream_delete_batch(
            spark, root,
            _orders(spark, 1000).filter(f"k >= {lo} and k < {hi}").select("k"),
            batch_id=bid, key_cols=["k"])
    pre = txnlog.latest_version(root)
    pre_rows = sorted(map(tuple, txnlog.read_version(spark, root, pre)
                          .collect()))
    selected, manifest = _mor_delete_compaction_plan(root)
    # Discrimination: some files intersect the deletes, most don't.
    assert selected
    assert len(selected) < len(manifest)
    post = txnlog.optimize_files(spark, root, selected, "k", n_files=1)
    # Logically silent: empty feed across the boundary, identical reads.
    assert txnlog.changes_between(spark, root, pre, post, ["k", "v"]).count() == 0
    assert sorted(map(tuple, txnlog.read_version(spark, root, post)
                      .collect())) == pre_rows
    # Time travel to the pre-compaction head still answers.
    assert txnlog.read_version(spark, root, pre).count() == len(pre_rows)
    # Clean files carried by reference; selected files gone from the head.
    e_pre = set(txnlog.read_entry(root, pre)["files"])
    e_post = set(txnlog.read_entry(root, post)["files"])
    assert not (set(selected) & e_post)
    assert (e_pre - set(selected)) < e_post
    # A re-run of the policy on the compacted head selects nothing: the
    # rewrite folded the hidden deletes in. Here the contiguous low-range
    # deletes make even plain range intersection converge; the provenance
    # skip (`-opt-` + newer than every delete file) covers the sparse case
    # — see test_mor_compaction_converges_on_sparse_deletes.
    sel2, _ = _mor_delete_compaction_plan(root)
    assert sel2 == []
    # Watermark through the optimize commit + vacuum: replay still dedupes.
    txnlog.vacuum(root, keep_last=1)
    assert txnlog.commit_stream_delete_batch(
        spark, root, _orders(spark, 1000).filter("k < 40").select("k"),
        batch_id=0, key_cols=["k"]) is None


def test_mor_compaction_converges_on_sparse_deletes(spark, root):
    """Sparse (every-7th-key) deletes: the rewritten survivors still SPAN
    the delete key ranges — equality-delete files ride until purge — so
    range intersection alone would re-select the optimize output on every
    maintenance pass, rewriting already-clean files forever. Provenance
    (`-opt-` dir marker + writing version strictly newer than every
    pending delete file) proves them clean: the policy converges after
    one pass, and a NEW delete landing after the optimize re-dirties the
    head so selection resumes on exactly the intersecting rewrite."""
    from nyc_analytics_database_platform_spark.queries.parity_versioned import (
        _mor_delete_compaction_plan,
    )

    txnlog.append(spark, root, _orders(spark, 1000), range_col="k", n_files=8)
    txnlog.commit_stream_delete_batch(
        spark, root, _orders(spark, 1000).filter("k % 7 = 0").select("k"),
        batch_id=0, key_cols=["k"])
    sel1, man1 = _mor_delete_compaction_plan(root)
    assert sel1  # every file's range contains some multiple of 7
    pre_rows = sorted(map(tuple,
                          txnlog.read_version(spark, root).collect()))
    txnlog.optimize_files(spark, root, sel1, "k", n_files=2)
    head = txnlog.latest_version(root)
    # The delete set still pends (not purged) ...
    assert txnlog.read_entry(root, head).get("delete_files")
    # ... yet nothing is re-selected: convergence by provenance, where
    # intersection arithmetic alone could not converge for sparse keys.
    sel2, man2 = _mor_delete_compaction_plan(root)
    assert sel2 == []
    assert any("-opt-" in rel for rel, *_ in man2)
    assert sorted(map(tuple,
                      txnlog.read_version(spark, root).collect())) == pre_rows
    # A delete committed AFTER the optimize outranks its provenance: the
    # rewrite never saw key 3, so the intersecting opt file is selected
    # again while any non-intersecting one stays carried.
    txnlog.commit_stream_delete_batch(
        spark, root, _orders(spark, 1000).filter("k = 3").select("k"),
        batch_id=1, key_cols=["k"])
    sel3, _ = _mor_delete_compaction_plan(root)
    assert sel3 and all("-opt-" in rel for rel in sel3)


def test_rewrite_commit_reencode_feed_and_time_travel(spark, root):
    """txnlog.rewrite (round 13, the quantizer-refresh commit shape): a
    full-content rewrite lands as ONE commit whose change feed is exactly
    the rows whose values changed — unchanged rows cancel — while
    time-travel to the pre-rewrite head still answers with the OLD
    values, the pending MoR delete set is consumed (not carried), and the
    exactly-once batch watermark rides through vacuum."""
    df = _orders(spark, 200)
    txnlog.commit_stream_batch(spark, root, df, batch_id=5,
                               range_col="k", n_files=4)
    txnlog.commit_stream_delete_batch(
        spark, root, df.filter("k < 20").select("k"),
        batch_id=6, key_cols=["k"])
    pre = txnlog.latest_version(root)
    pre_rows = sorted(map(tuple,
                          txnlog.read_version(spark, root, pre).collect()))
    assert len(pre_rows) == 180  # MoR deletes applied at read
    # The re-encode: even keys get a new value, odd keys are unchanged.
    new = txnlog.read_version(spark, root).withColumn(
        "v", F.when(F.col("k") % 2 == 0, F.col("v") + 1.0)
              .otherwise(F.col("v")))
    post = txnlog.rewrite(spark, root, new, "optimize:reencode",
                          range_col="k", n_files=3)
    # Feed across the rewrite = exactly the changed rows, both sides.
    feed = txnlog.changes_between(spark, root, pre, post, ["k", "v"])
    ins = {(r["k"], r["v"]) for r in
           feed.filter("change_type = 'insert'").collect()}
    dels = {(r["k"], r["v"]) for r in
            feed.filter("change_type = 'delete'").collect()}
    evens = {k for k in range(20, 200) if k % 2 == 0}
    assert ins == {(k, k * 2.0 + 1.0) for k in evens}
    assert dels == {(k, k * 2.0) for k in evens}
    # Time travel: the pre-rewrite head still answers with old values.
    assert sorted(map(tuple, txnlog.read_version(spark, root, pre)
                      .collect())) == pre_rows
    # The rewrite consumed the delete set: head carries no delete files
    # and the deleted keys stay gone.
    e_post = txnlog.read_entry(root, post)
    assert not e_post.get("delete_files")
    assert txnlog.read_version(spark, root, post).count() == 180
    # Watermark survives the rewrite + vacuum: replay still dedupes.
    txnlog.vacuum(root, keep_last=1)
    assert txnlog.commit_stream_batch(
        spark, root, df, batch_id=5) is None
    assert txnlog.commit_stream_delete_batch(
        spark, root, df.filter("k < 20").select("k"),
        batch_id=6, key_cols=["k"]) is None
