"""Unit checks for the round-3 operators beyond their DuckDB oracles:
hand-computable invariants on tiny inputs (the oracle checks equivalence;
these check the *semantics* are the intended ones)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark import registry


def test_triangle_wedge_join_on_known_graph(spark):
    """K4 minus one edge has exactly 2 triangles; the oriented wedge join
    must find them and count each once."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], ["s1", "s2"]
    )  # K4 minus (3,4): triangles {1,2,3} and {1,2,4}
    e1 = edges.select(F.col("s1").alias("u"), F.col("s2").alias("v"))
    e2 = edges.select(F.col("s1").alias("v2"), F.col("s2").alias("w"))
    e3 = edges.select(F.col("s1").alias("u3"), F.col("s2").alias("w3"))
    tri = (
        e1.join(e2, F.col("v") == F.col("v2"))
        .join(e3, (F.col("u") == F.col("u3")) & (F.col("w") == F.col("w3")))
    )
    assert tri.count() == 2


def test_es_key_monotone_in_weight(spark):
    """Efraimidis-Spirakis: for a FIXED uniform u, key = u^(1/w) strictly
    increases with weight - heavier items are more likely to survive the
    top-k cut. (Distributional correctness is the published result; this
    guards the implementation's direction.)"""
    u = 0.3
    keys = [u ** (1.0 / w) for w in (10, 100, 1000)]
    assert keys == sorted(keys)
    # and the engine expression agrees with Python pow
    row = (
        spark.range(1)
        .select(F.pow(F.lit(u), F.lit(1.0) / F.lit(100.0)).alias("k"))
        .collect()[0]
    )
    assert math.isclose(row.k, u ** (1.0 / 100.0), rel_tol=0, abs_tol=0)


def test_mixture_rates_hit_target_shares(spark, sf_dir):
    """Water-filling invariants: the binding domain keeps rate 1.0; every
    rate is in (0, 1]; expected kept chars (chars_in * rate) are
    proportional to the target weights across domains."""
    out = {
        r["domain"]: r
        for r in registry.get("domain_mixture_resample")
        .fn(spark, sf_dir)
        .collect()
    }
    weights = {"web": 0.1, "books": 0.3, "code": 0.3, "reference": 0.3}
    assert set(out) == set(weights)
    rates = {d: out[d]["rate"] for d in out}
    assert max(rates.values()) == 1.0
    assert all(0 < r <= 1.0 for r in rates.values())
    # expected kept volume proportional to weight: chars_in*rate / w constant
    ratios = {
        d: out[d]["chars_in"] * rates[d] / weights[d] for d in out
    }
    lo, hi = min(ratios.values()), max(ratios.values())
    assert (hi - lo) / hi < 1e-4  # equal up to the 6dp rate rounding


def test_knn_graph_neighbors_are_nearest(spark, sf_dir):
    """For one probe node, the top-3 from the query equal the top-3 from a
    direct brute-force scoring of that node."""
    out = registry.get("knn_graph_top3").fn(spark, sf_dir)
    got = [(r.dst, r.score) for r in out.filter(F.col("src") == 1).collect()]
    assert len(got) == 3

    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.operators.similarity import cosine

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 1).select(F.col("v").alias("qv"))
    brute = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 1)
        .select(
            "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("s")
        )
        .orderBy(F.desc("s"), "vec_id")
        .limit(3)
        .collect()
    )
    assert [(r.vec_id, r.s) for r in brute] == got


def test_two_stage_rerank_subset_of_bruteforce_order(spark, sf_dir):
    """Rerank candidates come from LSH buckets, so its top-5 must respect
    the exact cosine ordering restricted to its candidate set: scores are
    non-increasing and each is <= the global brute-force best."""
    rows = registry.get("ann_two_stage_rerank").fn(spark, sf_dir).collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    brute = registry.get("ann_bruteforce_top10").fn(spark, sf_dir).collect()
    assert scores[0] <= brute[0].score
