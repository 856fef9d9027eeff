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


# --- KMV / theta sketch set operations --------------------------------------

_KMV_K = 64
_SEG_A, _SEG_B = "BUILDING", "MACHINERY"
_POW48 = float(2**48)


def _kmv_oracle() -> str:
    h = (
        "((CAST(('0x' || substr(md5(CAST(custkey AS VARCHAR)), 1, 12)) AS BIGINT)"
        f" + 1) / {_POW48})"
    )
    return f"""
        WITH flags AS (
            SELECT o.o_custkey AS custkey,
                   MAX(CASE WHEN c.c_mktsegment = '{_SEG_A}' THEN 1 ELSE 0 END)
                       AS in_a,
                   MAX(CASE WHEN c.c_mktsegment = '{_SEG_B}' THEN 1 ELSE 0 END)
                       AS in_b
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
            GROUP BY 1
        ),
        hashed AS (SELECT custkey, in_a, in_b, {h} AS h FROM flags),
        sk_a AS (
            SELECT h FROM hashed WHERE in_a = 1
            QUALIFY ROW_NUMBER() OVER (ORDER BY h, custkey) <= {_KMV_K}
        ),
        sk_b AS (
            SELECT h FROM hashed WHERE in_b = 1
            QUALIFY ROW_NUMBER() OVER (ORDER BY h, custkey) <= {_KMV_K}
        ),
        sk_u AS (
            SELECT h, in_a, in_b FROM hashed
            QUALIFY ROW_NUMBER() OVER (ORDER BY h, custkey) <= {_KMV_K}
        ),
        est AS (
            SELECT
              (SELECT CAST(COUNT(*) AS BIGINT) FROM hashed WHERE in_a = 1)
                  AS exact_a,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM hashed WHERE in_b = 1)
                  AS exact_b,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM hashed) AS exact_union,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM hashed
               WHERE in_a = 1 AND in_b = 1) AS exact_intersect,
              (SELECT CASE WHEN COUNT(*) < {_KMV_K}
                           THEN CAST(COUNT(*) AS DOUBLE)
                           ELSE round(({_KMV_K} - 1) / MAX(h), 2) END
               FROM sk_a) AS est_a,
              (SELECT CASE WHEN COUNT(*) < {_KMV_K}
                           THEN CAST(COUNT(*) AS DOUBLE)
                           ELSE round(({_KMV_K} - 1) / MAX(h), 2) END
               FROM sk_b) AS est_b,
              (SELECT CASE WHEN COUNT(*) < {_KMV_K}
                           THEN CAST(COUNT(*) AS DOUBLE)
                           ELSE round(({_KMV_K} - 1) / MAX(h), 2) END
               FROM sk_u) AS est_union,
              (SELECT CAST(SUM(in_a * in_b) AS BIGINT) FROM sk_u)
                  AS inter_in_sketch
        )
        SELECT exact_a, est_a, exact_b, est_b, exact_union, est_union,
               exact_intersect,
               round(inter_in_sketch * est_union / {_KMV_K}, 2)
                   AS est_intersect
        FROM est
    """


@register(
    "kmv_theta_set_estimates",
    oracle=_kmv_oracle(),
    tags=("sketch", "approx", "A-ext"),
)
def kmv_theta_set_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / theta) sketch with SET OPERATIONS: distinct
    buyers per segment plus UNION and - the thing HyperLogLog cannot do -
    INTERSECTION estimates, from three 64-value sketches. Union sketch =
    the k smallest hashes of the merged stream; intersection = (matching
    fraction inside the union sketch) * union estimate (the theta-sketch
    rule). The hash is the repo's md5-hex convention mapped to (0,1] with
    power-of-two scaling, so h, the k-th minimum, and every estimate are
    the SAME doubles in both engines - the oracle compares the estimates
    EXACTLY, alongside the exact counts it certifies them against
    (estimator error here: ~12% at k=64, visible in the output row).

    Scale: the per-set k-minimum is a TakeOrderedAndProject (per-partition
    heap, k-row merge - no global sort); sketches are k rows however large
    the key domain; merging sketches is a k-row operation. This is the
    partial-aggregable distinct-sketch family's third member beside HLL
    (approx_distinct_buyers) and bloom (dedup_bloom_screen_new_docs)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(_SEG_A, _SEG_B)
    ).select("c_custkey", "c_mktsegment")
    flags = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(
                F.when(F.col("c_mktsegment") == _SEG_A, 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("c_mktsegment") == _SEG_B, 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    h = (
        F.conv(
            F.substring(F.md5(F.col("custkey").cast("string")), 1, 12), 16, 10
        ).cast("long")
        + 1
    ) / F.lit(_POW48)
    hashed = flags.withColumn("h", h)

    def sketch(df: DataFrame) -> DataFrame:
        return df.orderBy("h", "custkey").limit(_KMV_K)

    def est(sk: DataFrame, name: str) -> DataFrame:
        return sk.agg(
            F.when(F.count("*") < _KMV_K, F.count("*").cast("double"))
            .otherwise(F.round((_KMV_K - 1) / F.max("h"), 2))
            .alias(name)
        )

    exacts = hashed.agg(
        F.sum("in_a").cast("long").alias("exact_a"),
        F.sum("in_b").cast("long").alias("exact_b"),
        F.count("*").cast("long").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("exact_intersect"),
    )
    sk_u = sketch(hashed)
    inter = sk_u.agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("inter_in_sketch")
    )
    out = (
        exacts.crossJoin(F.broadcast(est(sketch(hashed.filter("in_a = 1")), "est_a")))
        .crossJoin(F.broadcast(est(sketch(hashed.filter("in_b = 1")), "est_b")))
        .crossJoin(F.broadcast(est(sk_u, "est_union")))
        .crossJoin(F.broadcast(inter))
    )
    return out.select(
        "exact_a",
        "est_a",
        "exact_b",
        "est_b",
        "exact_union",
        "est_union",
        "exact_intersect",
        F.round(F.col("inter_in_sketch") * F.col("est_union") / _KMV_K, 2).alias(
            "est_intersect"
        ),
    )
