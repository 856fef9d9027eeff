"""PCA over the embeddings table: top principal component by power
iteration — the whitening/compression companion to the random-projection
(embedding_random_projection) and variance-audit
(embedding_dim_variance_audit) operators.

Cross-engine determinism for an ITERATIVE float algorithm. Two hazards and
their fixes, found the hard way (sf0.001 passed, sf0.01 flipped ~5 terms):

1. Engines disagree on double -> DECIMAL casts of FULL-MANTISSA doubles:
   Spark rounds the SHORTEST decimal representation (Scala BigDecimal wraps
   ``BigDecimal.valueOf``), DuckDB rounds the exact binary expansion — the
   two sit on opposite sides of the scale-12 midpoint for ~1e-5 of
   arbitrary terms. Fix: every accumulated term is first pinned to an
   INTEGER-VALUED double (``ROUND(term * 10^k)``, identical away-from-zero
   halves in both engines, exact valueOf repr), then summed as BIGINT —
   exact and order-independent for integer values, ~10x faster than
   DECIMAL accumulators (no BigDecimal boxing), and ANSI mode turns any
   overflow into a loud error rather than a wrong answer (bounds: |term|
   <= ~2.6e11, so ~3e7 rows per aggregate before DECIMAL partials are
   needed — the documented swap at extreme scale).
2. An L2 norm would need one more risky sum-of-squares per iteration; the
   loop instead normalizes by L-INFINITY (max |w|) — MAX is exact with no
   summation — and only the FINAL reported loadings get an L2 normalization
   over the 64 bounded components (|v| <= 1, so the squared terms pin at
   scale 12 without overflow).

Per-element IEEE ops (subtract, multiply, divide, sqrt) are correctly
rounded on identical operands, so the loadings match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register

_DIM = 64
_ITERS = 3
_V0 = "0.125"  # 1/sqrt(64): the exact-binary uniform unit start vector
_D38 = "BIGINT"


def _pca_oracle() -> str:
    head = f"""
        xq AS (
            SELECT vec_id, j, ROUND(embedding[j]::DOUBLE * 1e6) AS valq
            FROM embeddings, unnest(generate_series(1, {_DIM})) AS s(j)
        ),
        mu AS (
            SELECT j,
                   CAST(SUM(CAST(valq AS {_D38})) AS DOUBLE) / COUNT(*) / 1e6
                       AS m
            FROM xq GROUP BY j
        ),
        xc AS (
            SELECT x.vec_id, x.j, x.valq / 1e6 - mu.m AS c
            FROM xq x JOIN mu ON x.j = mu.j
        ),
        v0 AS (SELECT j, {_V0}::DOUBLE AS v
               FROM unnest(generate_series(1, {_DIM})) AS s(j))
    """
    iters = []
    for k in range(1, _ITERS + 1):
        iters.append(
            f"""
        s{k} AS (
            SELECT xc.vec_id,
                   CAST(SUM(CAST(ROUND(xc.c * v.v * 1e12) AS {_D38}))
                        AS DOUBLE) / 1e12 AS s
            FROM xc JOIN v{k - 1} v ON xc.j = v.j
            GROUP BY xc.vec_id
        ),
        w{k} AS (
            SELECT xc.j,
                   CAST(SUM(CAST(ROUND(xc.c * s.s * 1e9) AS {_D38}))
                        AS DOUBLE) / 1e9 AS w
            FROM xc JOIN s{k} s ON xc.vec_id = s.vec_id
            GROUP BY xc.j
        ),
        n{k} AS (SELECT MAX(ABS(w)) AS mx FROM w{k}),
        v{k} AS (
            SELECT w.j, w.w / n.mx AS v FROM w{k} w CROSS JOIN n{k} n
        )
        """
        )
    chain = head + "," + ",".join(iters)
    return f"""
        WITH {chain},
        l2 AS (
            SELECT sqrt(CAST(SUM(CAST(ROUND(v * v * 1e12) AS {_D38}))
                             AS DOUBLE) / 1e12) AS nrm
            FROM v{_ITERS}
        )
        SELECT v.j AS dim, mu.m AS mean, v.v / l2.nrm AS loading,
               n.mx AS eigenvalue_proxy
        FROM v{_ITERS} v
        JOIN mu ON v.j = mu.j
        CROSS JOIN l2 CROSS JOIN n{_ITERS} n
        ORDER BY dim
    """


@register(
    "embedding_pca_top_component",
    oracle=_pca_oracle(),
    tags=("llm", "similarity", "embedding", "iterative"),
)
def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the (mean-centered, micro-unit-quantized)
    embedding matrix via 3 power-iteration rounds from the uniform unit
    start vector — per-dimension mean, L2-normalized loading, and the final
    L-infinity magnitude of X'Xv (a dominant-eigenvalue proxy). The
    dimensionality-reduction / whitening primitive the ANN and quantization
    families (IVF, PQ, SQ8, random projection) sit on top of.

    Determinism: see the module docstring — every row-sum term pins to an
    integer-valued double before an exact DECIMAL(38,0) accumulation, the
    in-loop normalization is L-infinity (MAX, no summation), and the single
    final L2 norm sums 64 bounded pinned squares.

    Scale shape: per iteration, Xv is one (vec_id)-keyed aggregate and
    X'(Xv) one (dim)-keyed aggregate, both map-side combinable over the
    exploded (vec, dim, value) frame; v and the means broadcast (64 rows).
    Wall cost is 3 x two hash aggregates over |rows| x d — the same budget
    as kmeans_train_centroids per round, with zero driver involvement and
    no collect of anything data-sized."""
    d38 = "long"
    xq = (
        load(spark, sf_dir, "embeddings", parallel=True)
        .select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "j0", "val"
            ),
        )
        .select(
            "vec_id",
            (F.col("j0") + 1).alias("j"),
            F.round(F.col("val") * 1e6).alias("valq"),
        )
        .localCheckpoint(eager=False)
    )
    mu = xq.groupBy("j").agg(
        (
            F.sum(F.col("valq").cast(d38)).cast("double")
            / F.count("*")
            / 1e6
        ).alias("m")
    )
    xc = (
        xq.join(F.broadcast(mu), "j")
        .select(
            "vec_id", "j", (F.col("valq") / 1e6 - F.col("m")).alias("c")
        )
        .localCheckpoint(eager=False)
    )
    v = spark.range(1, _DIM + 1).select(
        F.col("id").cast("int").alias("j"), F.lit(float(_V0)).alias("v")
    )
    mx_frame = None
    for _ in range(_ITERS):
        s = (
            xc.join(F.broadcast(v), "j")
            .groupBy("vec_id")
            .agg(
                (
                    F.sum(
                        F.round(F.col("c") * F.col("v") * 1e12).cast(d38)
                    ).cast("double")
                    / 1e12
                ).alias("s")
            )
        )
        w = (
            xc.join(s, "vec_id")
            .groupBy("j")
            .agg(
                (
                    F.sum(
                        F.round(F.col("c") * F.col("s") * 1e9).cast(d38)
                    ).cast("double")
                    / 1e9
                ).alias("w")
            )
        )
        mx_frame = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        v = w.crossJoin(F.broadcast(mx_frame)).select(
            "j", (F.col("w") / F.col("mx")).alias("v")
        )
    l2 = v.agg(
        F.sqrt(
            F.sum(F.round(F.col("v") * F.col("v") * 1e12).cast(d38)).cast(
                "double"
            )
            / 1e12
        ).alias("nrm")
    )
    return (
        v.join(F.broadcast(mu), "j")
        .crossJoin(F.broadcast(l2))
        .crossJoin(F.broadcast(mx_frame))
        .select(
            F.col("j").alias("dim"),
            F.col("m").alias("mean"),
            (F.col("v") / F.col("nrm")).alias("loading"),
            F.col("mx").alias("eigenvalue_proxy"),
        )
        .orderBy("dim")
    )


def _pca_projection_oracle() -> str:
    """The PCA chain (same CTEs as _pca_oracle) extended with the pinned
    projection and the two rank cuts."""
    base = _pca_oracle()
    # reuse everything up to the final SELECT; rebuild the tail as CTEs
    with_body = base[: base.rindex("SELECT v.j AS dim")].rstrip()
    return f"""{with_body},
        loadings AS (
            SELECT v.j AS dim, mu.m AS mean, v.v / l2.nrm AS loading
            FROM v{_ITERS} v
            JOIN mu ON v.j = mu.j
            CROSS JOIN l2
        ),
        proj AS (
            SELECT x.vec_id,
                   CAST(SUM(CAST(ROUND((x.valq / 1e6 - l.mean) * l.loading
                                       * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
                       AS projection
            FROM xq x JOIN loadings l ON x.j = l.dim
            GROUP BY x.vec_id
        ),
        tops AS (
            SELECT 'top' AS tail_end, vec_id, projection,
                   ROW_NUMBER() OVER (ORDER BY projection DESC, vec_id) AS rk
            FROM proj QUALIFY rk <= 5
        ),
        bottoms AS (
            SELECT 'bottom' AS tail_end, vec_id, projection,
                   ROW_NUMBER() OVER (ORDER BY projection, vec_id) AS rk
            FROM proj QUALIFY rk <= 5
        )
        SELECT tail_end, rk, vec_id, projection FROM tops
        UNION ALL
        SELECT tail_end, rk, vec_id, projection FROM bottoms
        ORDER BY tail_end, rk
    """


@register(
    "embedding_pca_projection_extremes",
    oracle=_pca_projection_oracle(),
    tags=("llm", "similarity", "embedding"),
)
def embedding_pca_projection_extremes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Extreme points along the first principal component: every embedding
    projects onto the PCA loadings (the centered dot product) and the
    top-5 / bottom-5 by projection come back — the 'what lives at the ends
    of the dominant axis' exploration read, composed directly on
    embedding_pca_top_component's attested loadings.

    Determinism: per-vector projections sum pinned integer terms
    (ROUND((x - mean) * loading * 1e9), 64 per vector) exactly; the two
    rank cuts order by (projection, vec_id).

    Scale shape: the PCA runs once (its own documented budget); the
    projection is one more scan with a per-vector 64-term reduction, and
    both extremes are TakeOrderedAndProject cuts."""
    loadings = embedding_pca_top_component(spark, sf_dir).select(
        "dim", "mean", "loading"
    )
    xq = (
        load(spark, sf_dir, "embeddings", parallel=True)
        .select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "j0", "val"
            ),
        )
        .select(
            "vec_id",
            (F.col("j0") + 1).alias("dim"),
            F.round(F.col("val") * 1e6).alias("valq"),
        )
    )
    proj = (
        xq.join(F.broadcast(loadings), "dim")
        .groupBy("vec_id")
        .agg(
            (
                F.sum(
                    F.round(
                        (F.col("valq") / 1e6 - F.col("mean"))
                        * F.col("loading")
                        * 1e9
                    ).cast("long")
                ).cast("double")
                / 1e9
            ).alias("projection")
        )
    )
    tops = (
        proj.orderBy(F.desc("projection"), "vec_id")
        .limit(5)
        .select(
            F.lit("top").alias("tail_end"),
            F.row_number()
            .over(Window.orderBy(F.desc("projection"), "vec_id"))
            .alias("rk"),
            "vec_id",
            "projection",
        )
    )
    bottoms = (
        proj.orderBy("projection", "vec_id")
        .limit(5)
        .select(
            F.lit("bottom").alias("tail_end"),
            F.row_number()
            .over(Window.orderBy("projection", "vec_id"))
            .alias("rk"),
            "vec_id",
            "projection",
        )
    )
    return tops.unionByName(bottoms).orderBy("tail_end", "rk")
