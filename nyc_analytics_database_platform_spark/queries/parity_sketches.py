"""Frequency-sketch query surfaces (operators/sketches.py).

Heavy hitters over the events stream: the sketch pass bounds memory by
capacity * partitions (domain-independent), the exact verify pass makes the
answer oracle-exact - so the DuckDB oracle is the plain GROUP BY / HAVING
the sketch replaces at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.sketches import heavy_hitters
from nyc_analytics_database_platform_spark.registry import register

_PHI = 0.005  # heavy hitter = value carrying > 0.5% of all events


@register(
    "heavy_hitters_users",
    oracle=f"""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events
        WHERE user_id IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(*) > (SELECT COUNT(*) FROM events) * {_PHI}
        ORDER BY n_rows DESC, user_id
    """,
    tags=("sketch", "heavy-hitters", "llm"),
)
def heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users carrying > phi = 0.5% of event traffic, via per-partition
    Misra-Gries summaries (mapInPandas, Arrow-batched) -> candidate union ->
    broadcast-semi-join exact recount -> threshold filter. The sketch only
    prunes; the output counts are exact, so the oracle is the direct
    GROUP BY/HAVING. At 100 TB the GROUP BY over a high-cardinality key is
    the expensive plan; the sketch caps state at capacity x partitions."""
    events = load(spark, sf_dir, "events", parallel=True)
    return heavy_hitters(events, "user_id", phi=_PHI)


_CMS_D, _CMS_W = 4, 1024


def _hex6_poly(h: str) -> str:
    """DuckDB: first 6 hex chars of md5 expression `h` as an integer."""
    return " + ".join(
        f"(strpos('0123456789abcdef', {h}[{i}:{i}]) - 1) * {16 ** (6 - i)}"
        for i in range(1, 7)
    )


@register(
    "cms_heavy_users_estimates",
    oracle=rf"""
        WITH cnts AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE user_id IS NOT NULL
            GROUP BY user_id
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events),
        hx AS (
            SELECT user_id, n, r, md5('r' || r || ':' || user_id) AS h
            FROM cnts, unnest(generate_series(0, {_CMS_D - 1})) AS gr(r)
        ),
        bk AS (
            SELECT user_id, n, r, ({_hex6_poly("h")}) % {_CMS_W} AS c FROM hx
        ),
        sk AS (SELECT r, c, SUM(n) AS bucket_n FROM bk GROUP BY r, c),
        est AS (
            SELECT b.user_id, MIN(s.bucket_n) AS cms_est
            FROM bk b JOIN sk s ON b.r = s.r AND b.c = s.c
            GROUP BY b.user_id
        )
        SELECT c.user_id, c.n AS n_rows,
               CAST(e.cms_est AS BIGINT) AS cms_est,
               CAST(e.cms_est - c.n AS BIGINT) AS cms_overestimate
        FROM cnts c JOIN est e USING (user_id), tot
        WHERE c.n > total * {_PHI}
        ORDER BY n_rows DESC, user_id
    """,
    tags=("sketch", "cms", "llm"),
)
def cms_heavy_users_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The phi-heavy users (same 0.5%-of-traffic threshold as
    heavy_hitters_users) with their COUNT-MIN estimates beside the exact
    counts - the fixed-memory companion to Misra-Gries: MG yields the
    bounded CANDIDATE set, the CMS yields an ESTIMATE for any queried
    value from depth*width counters, and the exact semi-join recount makes
    the reported counts (and the threshold filter) exact, so candidate-set
    partition-dependence never reaches the output. cms_overestimate >= 0
    by construction (CMS never undercounts) and is reported so the result
    doubles as a measured error audit of the sketch at this width.

    Scale: the sketch build is one map-side-combinable groupBy bounded at
    depth*width rows per partition output; candidates are bounded by
    capacity*partitions; both broadcast. The only stream-sized work is one
    scan for the sketch and one for the exact recount - the two-pass
    sketch->verify shape of heavy_hitters_users. Buckets use md5-hex
    arithmetic (cms_bucket_cols) so DuckDB reproduces every estimate
    bit-exactly."""
    from nyc_analytics_database_platform_spark.operators.sketches import (
        cms_estimates,
        count_min_sketch,
        misra_gries_candidates,
    )

    events = load(spark, sf_dir, "events", parallel=True)
    users = events.filter(F.col("user_id").isNotNull()).select("user_id")
    sketch = count_min_sketch(users, "user_id", _CMS_D, _CMS_W)
    cand = misra_gries_candidates(users, "user_id", int(1.0 / _PHI) + 1)
    exact = (
        users.join(F.broadcast(cand), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_rows"))
    )
    tot = events.agg(F.count("*").alias("total"))
    est = cms_estimates(exact, sketch, "user_id", _CMS_D, _CMS_W)
    return (
        est.crossJoin(F.broadcast(tot))
        .filter(F.col("n_rows") > F.col("total") * F.lit(_PHI))
        .select(
            "user_id",
            "n_rows",
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") - F.col("n_rows")).cast("long").alias("cms_overestimate"),
        )
        .orderBy(F.desc("n_rows"), "user_id")
    )


@register(
    "dedup_bloom_screen_new_docs",
    oracle="""
        WITH hist AS (
            SELECT md5(lower(trim(text))) AS digest
            FROM documents WHERE doc_id % 5 <> 0
        ),
        newbatch AS (
            SELECT doc_id, source, md5(lower(trim(text))) AS digest
            FROM documents WHERE doc_id % 5 = 0
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_new,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM newbatch
        WHERE digest NOT IN (SELECT digest FROM hist)
        GROUP BY source
        ORDER BY source
    """,
    tags=("sketch", "bloom", "dedup", "incremental"),
)
def dedup_bloom_screen_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-dedup screening with a Bloom pre-filter: the new
    batch (doc_id % 5 == 0) is checked against the historical corpus digest
    set; clear bitmap misses skip the anti-join entirely (no false
    negatives), might-contain candidates get the exact anti-join. The
    aggregate output is exact, so the oracle is the plain NOT IN anti-join.
    Complements dedup_incremental_vs_corpus (LSH band index) for the
    EXACT-duplicate incremental path."""
    from nyc_analytics_database_platform_spark.operators.sketches import (
        bloom_screen_new,
    )

    docs = load(spark, sf_dir, "documents", parallel=True).withColumn(
        "digest", F.md5(F.lower(F.trim(F.col("text"))))
    )
    hist = docs.filter(F.col("doc_id") % 5 != 0).select("digest")
    new = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "source", "digest"
    )
    return (
        bloom_screen_new(new, hist, "digest")
        .groupBy("source")
        .agg(F.count("*").alias("n_new"), F.sum("doc_id").alias("id_sum"))
        .orderBy("source")
    )
