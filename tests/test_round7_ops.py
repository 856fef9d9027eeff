"""Round-7 invariants: the wide-plan PCA shape (default) must be
bit-for-bit identical to the exploded cross-check shape
(SPARK_GRAFT_PCA_WIDE=off) — same pinned-BIGINT term values, different
physical plan. Locked at sf0.001 here and at sf0.01 via
SPARK_GRAFT_TEST_SF_DIR (the parity-pitfalls rule: iterative float
parity verified at BOTH scales)."""

from __future__ import annotations

import os

import pytest

from nyc_analytics_database_platform_spark.registry import all_specs


@pytest.mark.parametrize(
    "name",
    ["embedding_pca_top_component", "embedding_pca_projection_extremes"],
)
def test_pca_wide_equals_exploded(spark, sf_dir, name):
    spec = all_specs()[name]
    prev = os.environ.get("SPARK_GRAFT_PCA_WIDE")
    try:
        os.environ["SPARK_GRAFT_PCA_WIDE"] = "off"
        exploded = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
        os.environ["SPARK_GRAFT_PCA_WIDE"] = "auto"
        wide = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_PCA_WIDE", None)
        else:
            os.environ["SPARK_GRAFT_PCA_WIDE"] = prev
    assert wide == exploded


def test_rfm_prefixsum_equals_window(spark, sf_dir):
    """The default sharded-rank quintile path must reproduce the window
    NTILE path bit-for-bit (the closed-form NTILE arithmetic on exact
    global ranks is the same total-order bucketing)."""
    spec = all_specs()["rfm_customer_segments"]
    prev = os.environ.get("SPARK_GRAFT_RFM_QUINTILE")
    try:
        os.environ["SPARK_GRAFT_RFM_QUINTILE"] = "window"
        win = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
        os.environ["SPARK_GRAFT_RFM_QUINTILE"] = "prefixsum"
        pfx = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_RFM_QUINTILE", None)
        else:
            os.environ["SPARK_GRAFT_RFM_QUINTILE"] = prev
    assert pfx == win and len(pfx) > 0


def test_ntile_from_rank_matches_sql_ntile(spark):
    """Property check of the closed-form NTILE on awkward sizes (n < tiles,
    n % tiles != 0, n == tiles) against Spark's own window NTILE."""
    from nyc_analytics_database_platform_spark.operators.prefixsum import (
        ntile_from_rank as _ntile_from_rank,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for n in (1, 3, 5, 7, 12, 100, 101, 104):
        df = spark.range(1, n + 1).select(F.col("id").alias("rk"))
        got = {
            r["rk"]: r["t"]
            for r in df.select(
                "rk", _ntile_from_rank("rk", n).alias("t")
            ).collect()
        }
        want = {
            r["rk"]: r["t"]
            for r in df.select(
                "rk", F.ntile(5).over(Window.orderBy("rk")).alias("t")
            ).collect()
        }
        assert got == want, (n, got, want)


def test_pca_wide_is_default_and_plan_has_no_explode(spark, sf_dir):
    """The default path must be the wide shape: no Generate (posexplode)
    node in the executed plan of the returned loadings frame."""
    spec = all_specs()["embedding_pca_top_component"]
    assert os.environ.get("SPARK_GRAFT_PCA_WIDE", "auto") != "off"
    df = spec.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan


def test_ranked_by_range_properties(spark):
    """Sharded rank scan invariants: ranks are a bijection 1..n in the
    requested total order, under skewed keys, descending order, odd shard
    counts, and an empty input."""
    from pyspark.sql import functions as F

    from nyc_analytics_database_platform_spark.operators.prefixsum import (
        ranked_by_range,
    )

    # skewed: 90% of rows share one key; tiebreaker completes the order
    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, 7).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("tb"),
    )
    out, n = ranked_by_range(df, [F.asc("k"), F.asc("tb")], "rk", num_shards=5)
    rows = out.orderBy("rk").collect()
    assert n == 1000 and [r["rk"] for r in rows] == list(range(1, 1001))
    ordered = [(r["k"], r["tb"]) for r in rows]
    assert ordered == sorted(ordered)

    # descending metric
    out2, n2 = ranked_by_range(
        df, [F.desc("k"), F.asc("tb")], "rk", num_shards=3
    )
    rows2 = out2.orderBy("rk").collect()
    assert n2 == 1000
    key2 = [(-r["k"], r["tb"]) for r in rows2]
    assert key2 == sorted(key2)

    # empty input
    out3, n3 = ranked_by_range(
        df.filter(F.col("k") < -1), [F.asc("k")], "rk"
    )
    assert n3 == 0 and out3.count() == 0


def test_stream_weighted_reservoir_crosses_batches(spark, sf_dir):
    """The reservoir must be maintained across MULTIPLE micro-batches (not
    one mega-batch): after the drain, the memory sink shows at least one
    source emitted at two different (monotone) n_seen values, and the
    final n_seen per source sums to that source's document count."""
    import hashlib

    from pyspark.sql import functions as F

    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.registry import all_specs

    out = all_specs()["stream_weighted_reservoir"].fn(spark, sf_dir)
    assert out.count() > 0
    tag = hashlib.md5((sf_dir + "wres").encode()).hexdigest()[:8]
    emitted = spark.table(f"weighted_reservoir_{tag}")
    multi = (
        emitted.groupBy("source")
        .agg(F.countDistinct("n_seen").alias("n_emits"))
        .filter(F.col("n_emits") >= 2)
        .count()
    )
    assert multi > 0, "state never crossed a micro-batch boundary"
    finals = {
        r["source"]: r["mx"]
        for r in emitted.groupBy("source").agg(F.max("n_seen").alias("mx")).collect()
    }
    truth = {
        r["source"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert finals == truth


def test_exact_ntiles_matches_window_ntile(spark):
    """exact_ntiles (round 10: fused two-phase order-statistic NTILE, no
    global window) must be bit-identical to window NTILE for asc/desc
    orders, heavy ties, and n < tiles."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_analytics_database_platform_spark.operators.prefixsum import (
        exact_ntiles,
    )

    rng = random.Random(42)
    for n, tiles in ((1, 5), (3, 5), (97, 5), (1000, 10), (1000, 7)):
        rows = [(i, rng.randint(0, 8), rng.randint(0, 10**6)) for i in range(n)]
        df = spark.createDataFrame(rows, "tb long, a long, b long")
        out, total = exact_ntiles(
            df,
            [
                ("qa", [("a", False), ("tb", False)]),
                ("qb", [("b", True), ("tb", False)]),
            ],
            tiles=tiles,
            num_shards=5,
        )
        assert total == n
        exp = df.select(
            "tb",
            F.ntile(tiles).over(Window.orderBy("a", "tb")).alias("qa"),
            F.ntile(tiles).over(Window.orderBy(F.desc("b"), "tb")).alias("qb"),
        )
        got = {(r["tb"], r["qa"], r["qb"]) for r in out.select("tb", "qa", "qb").collect()}
        want = {(r["tb"], r["qa"], r["qb"]) for r in exp.collect()}
        assert got == want, f"n={n} tiles={tiles}"


def test_histogram_exact_ntiles_matches_window_ntile(spark, tmp_path):
    """histogram_exact_ntiles (round 11: bucketed-histogram order
    statistics with tie sub-bucketing) must be bit-identical to window
    NTILE for mixed widths, negated (DESC) metrics, HEAVY ties (every cut
    inside a tie set), and n < tiles."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_analytics_database_platform_spark.operators.prefixsum import (
        histogram_exact_ntiles,
    )

    rng = random.Random(7)
    for case, (n, tiles) in enumerate(
        # (50, 1): tiles=1 leaves no cut ranks — used to raise TypeError
        # in the boundary filter instead of assigning everyone tile 1
        # (ADVICE r11).
        ((1, 5), (4, 5), (97, 5), (2000, 5), (2000, 7), (50, 1))
    ):
        # a: ~3 distinct values (every cut lands inside a tie set);
        # b: near-unique, negated to exercise DESC + negative buckets.
        rows = [(i, rng.randint(0, 2), -rng.randint(0, 10**6))
                for i in range(n)]
        df = spark.createDataFrame(rows, "tb long, a long, nb long")
        path = str(tmp_path / f"pc{case}")
        df.write.mode("overwrite").parquet(path)
        pc = spark.read.parquet(path)
        out = histogram_exact_ntiles(
            pc,
            [("qa", "a", 1), ("qb", "nb", 4096)],
            tie_col="tb",
            tiles=tiles,
        )
        exp = df.select(
            "tb",
            F.ntile(tiles).over(Window.orderBy("a", "tb")).alias("qa"),
            F.ntile(tiles)
            .over(Window.orderBy(F.desc(-F.col("nb")), "tb"))
            .alias("qb"),
        )
        got = {(r["tb"], r["qa"], r["qb"])
               for r in out.select("tb", "qa", "qb").collect()}
        want = {(r["tb"], r["qa"], r["qb"]) for r in exp.collect()}
        assert got == want, (case, n, tiles)
