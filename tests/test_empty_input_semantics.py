"""Empty-input robustness: operators must degrade to empty/null results,
never throw - the behavior a 100 TB pipeline needs when a partition-pruned
read or a filter legitimately matches nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load


def _empty_docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").filter(F.lit(False))


def test_empty_aggregates(spark, sf_dir):
    empty = load(spark, sf_dir, "orders").filter(F.lit(False))
    row = empty.agg(
        F.count("*").alias("n"),
        F.sum("o_totalprice").alias("s"),
        F.percentile("o_totalprice", 0.5).alias("med"),
    ).collect()[0]
    assert row["n"] == 0 and row["s"] is None and row["med"] is None


def test_empty_exact_dedup_and_lsh(spark, sf_dir):
    from nyc_analytics_database_platform_spark.operators.dedup import (
        exact_dedup_groups,
        lsh_candidate_pairs,
        minhash_signatures,
        with_tokens,
    )

    empty = with_tokens(_empty_docs(spark, sf_dir))
    assert exact_dedup_groups(empty).count() == 0
    sigs = minhash_signatures(empty, num_perm=12, k=5)
    assert lsh_candidate_pairs(sigs, num_perm=12, rows_per_band=2).count() == 0


def test_empty_connected_components(spark):
    from nyc_analytics_database_platform_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(edges).count() == 0


def test_empty_heavy_hitters_and_bloom(spark, sf_dir):
    from nyc_analytics_database_platform_spark.operators.sketches import (
        bloom_screen_new,
        heavy_hitters,
    )

    empty = load(spark, sf_dir, "events").filter(F.lit(False))
    assert heavy_hitters(empty, "user_id", phi=0.01).count() == 0
    hist = spark.createDataFrame([("x",)], "digest string")
    new = spark.createDataFrame([], "id long, digest string")
    assert bloom_screen_new(new, hist, "digest").count() == 0
    # empty HISTORY: everything in the new batch is new
    new2 = spark.createDataFrame([(1, "a")], "id long, digest string")
    empty_hist = spark.createDataFrame([], "digest string")
    assert bloom_screen_new(new2, empty_hist, "digest").count() == 1


def test_empty_prefix_sum_and_asof(spark, sf_dir):
    from nyc_analytics_database_platform_spark.operators.joins import asof_join
    from nyc_analytics_database_platform_spark.operators.prefixsum import (
        bucketed_running_sum,
    )

    empty = spark.createDataFrame([], "k string, v long")
    assert bucketed_running_sum(empty, "k", "v").count() == 0

    events = load(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    right = events.filter(F.lit(False)).select("user_id", "ts")
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    value_cols=["ts"])
    n = left.count()
    got = out.collect()
    assert len(got) == n  # left-outer: all rows kept
    assert all(r["asof_ts"] is None for r in got)  # nothing to match
