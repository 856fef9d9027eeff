"""Embedding model migration (round 13): the routed dual-read store and
feed-driven per-model index maintenance. The value-level answer is
oracle-attested via the registered embedding_model_migration_routed
query; these tests pin what the oracle cannot see — that a per-model ANN
index can be maintained purely from the migration commits' change feeds
(never rescanning the store), and that the commit/file mechanics of the
waves behave."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators import txnlog
from nyc_analytics_database_platform_spark.queries.llm_curation import (
    _MIG_WAVE1,
    _MIG_WAVE2,
    embedding_model_migration_routed,
    reembed_m2,
)


@pytest.fixture()
def mig_root(spark, sf_dir):
    """The registered query's own chain, built (or adopted) by running it."""
    from nyc_analytics_database_platform_spark import layouts

    embedding_model_migration_routed(spark, sf_dir).collect()
    return layouts.scratch(sf_dir, "txnlog", "embmigrate")


def test_migration_waves_are_cdc_visible_appends(spark, sf_dir, mig_root):
    """Each wave is ONE append commit whose change feed is exactly its
    slice's m2 rows — nothing rewritten, m1 rows untouched (the dual-read
    transition depends on the old model's rows surviving every wave)."""
    assert txnlog.latest_version(mig_root) == 3
    e1 = set(txnlog.read_entry(mig_root, 1)["files"])
    e3 = set(txnlog.read_entry(mig_root, 3)["files"])
    assert e1 < e3  # v1's m1 files all carried by reference
    bounds = {2: (0, _MIG_WAVE1), 3: (_MIG_WAVE1, _MIG_WAVE2)}
    for v, (lo, hi) in bounds.items():
        feed = txnlog.changes_between(
            spark, mig_root, v - 1, v, ["vec_id", "model_id"]).collect()
        assert {r["change_type"] for r in feed} == {"insert"}
        assert {r["model_id"] for r in feed} == {"m2"}
        assert sorted(r["vec_id"] for r in feed) == list(range(lo, hi))


def test_per_model_index_maintained_from_migration_feeds(spark, sf_dir,
                                                         mig_root):
    """Maintenance keeps working per model (VERDICT r12 #6): an m2-only
    IVF index is built and maintained PURELY from the migration commits'
    change feeds — quantizer trained on wave 1's feed rows then frozen,
    wave 2's feed rows assigned incrementally — and must equal a
    from-scratch assignment of every migrated vector under the same
    quantizer. The store itself is never rescanned after wave 1."""
    from nyc_analytics_database_platform_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from nyc_analytics_database_platform_spark.queries.llm_ivf import (
        maintain_cells_from_feed,
    )

    def m2_feed(v):
        return (
            txnlog.changes_between(spark, mig_root, v - 1, v,
                                   ["vec_id", "model_id", "v"])
            .filter((F.col("change_type") == "insert")
                    & (F.col("model_id") == "m2"))
        )

    wave1 = m2_feed(2).select("vec_id", "v")
    cents, state = kmeans_fit(wave1, 4, 2)
    cents = cents.localCheckpoint(eager=True)  # frozen on wave 1
    state = maintain_cells_from_feed(
        state, cents,
        m2_feed(3).select("vec_id", F.col("v").alias("embedding"),
                          F.lit("insert").alias("change_type")))
    got = {(r["vec_id"], r["c_id"]) for r in state.collect()}
    # From scratch: every migrated id re-embedded and assigned under the
    # same frozen quantizer.
    all_m2 = reembed_m2(
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _MIG_WAVE2)
        .select("vec_id",
                F.col("embedding").cast("array<double>").alias("v")))
    want = {(r["vec_id"], r["c_id"])
            for r in assign_clusters(all_m2, cents).collect()}
    assert got == want and {v for v, _ in got} == set(range(_MIG_WAVE2))


def test_routed_view_prefers_m2_and_keeps_unmigrated_m1(spark, sf_dir):
    out = embedding_model_migration_routed(spark, sf_dir).collect()
    by_id = {r["vec_id"]: r for r in out}
    n = len(by_id)
    assert len(out) == n  # one routed row per id
    for vid, r in by_id.items():
        if vid < _MIG_WAVE1:
            assert (r["model_id"], r["dim"], r["wave"]) == ("m2", 32, 2)
        elif vid < _MIG_WAVE2:
            assert (r["model_id"], r["dim"], r["wave"]) == ("m2", 32, 3)
        else:
            assert (r["model_id"], r["dim"], r["wave"]) == ("m1", 64, None)
