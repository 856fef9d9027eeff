"""Quantizer-refresh lifecycle composition (round 13): maintenance must
CONTINUE correctly across a refresh commit. The registered query
(ann_quantizer_refresh_commit) attests the refresh boundary itself; this
test pins the full life: maintain under Q1 -> refresh to Q2 (txnlog.
rewrite) -> maintain MORE inserts under Q2 -> the head equals a
from-scratch assignment of every live vector under Q2, while time travel
to the pre-refresh head still answers under Q1."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators import txnlog
from nyc_analytics_database_platform_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
)


def _vecs(df):
    return df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))


def _cells(assignment):
    return assignment.select(
        "vec_id", F.col("c_id").cast("int").alias("cell"))


def test_maintenance_continues_under_refreshed_quantizer(spark, sf_dir,
                                                         tmp_path):
    root = str(tmp_path / "cells")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # v1: history indexed under Q1 (frozen).
    hist = _vecs(emb.filter(F.col("vec_id") < 300))
    cents1, assign1 = kmeans_fit(hist, 4, 2)
    cents1 = cents1.localCheckpoint(eager=True)
    txnlog.append(spark, root, _cells(assign1), range_col="vec_id",
                  n_files=3)
    # v2: an increment maintained under frozen Q1.
    inc1 = _vecs(emb.filter((F.col("vec_id") >= 300)
                            & (F.col("vec_id") < 400)))
    txnlog.append(spark, root, _cells(assign_clusters(inc1, cents1)),
                  range_col="vec_id", n_files=2)
    pre = txnlog.latest_version(root)

    # v3: the refresh — Q2 retrained on the live set, full re-assign as
    # ONE rewrite commit.
    live = _vecs(emb.filter(F.col("vec_id") < 400))
    cents2, assign2 = kmeans_fit(live, 4, 2)
    cents2 = cents2.localCheckpoint(eager=True)
    txnlog.rewrite(spark, root, _cells(assign2),
                   "optimize:quantizer-refresh", range_col="vec_id",
                   n_files=3)

    # v4: maintenance RESUMES under the CURRENT quantizer (Q2) — the
    # composition the lifecycle exists for: a refresh must not strand the
    # maintenance loop on the retired artifact.
    inc2 = _vecs(emb.filter(F.col("vec_id") >= 400))
    txnlog.append(spark, root, _cells(assign_clusters(inc2, cents2)),
                  range_col="vec_id", n_files=2)

    got = sorted((r["vec_id"], r["cell"]) for r in
                 txnlog.read_version(spark, root).collect())
    want = sorted((r["vec_id"], r["c_id"]) for r in
                  assign_clusters(_vecs(emb), cents2).collect())
    assert got == want

    # Time travel: the pre-refresh head still answers under Q1.
    got_pre = sorted((r["vec_id"], r["cell"]) for r in
                     txnlog.read_version(spark, root, pre).collect())
    want_pre = sorted((r["vec_id"], r["c_id"]) for r in
                      assign_clusters(live, cents1).collect())
    assert got_pre == want_pre
