"""Corpus-assembly operators: domain mixture resampling, SemDeDup-style
within-cluster near-dedup, and kNN-graph construction.

These close the loop between curation (llm_dedup / llm_text) and dataset
assembly (llm_sampling): once documents are clean, a training corpus is a
*mixture* - per-domain weights, re-sampled deterministically - and the
embedding-space structure (clusters, neighbor graphs) drives semantic dedup
and curriculum grouping. All hash/math is integer-or-rounded so every query
has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.similarity import cosine
from nyc_analytics_database_platform_spark.registry import register

# Domain map over the synthetic sources (src0..src19 -> 4 domains) and the
# target mixture the resampled corpus should converge to (by characters).
_DOMAIN_SQL = """CASE
    WHEN CAST(substr(source, 4) AS INT) < 5  THEN 'web'
    WHEN CAST(substr(source, 4) AS INT) < 10 THEN 'books'
    WHEN CAST(substr(source, 4) AS INT) < 15 THEN 'code'
    ELSE 'reference' END"""
_WEIGHTS = {"web": 0.1, "books": 0.3, "code": 0.3, "reference": 0.3}

# uniform-in-[0,1) hash draw from a doc id: first 8 md5 hex chars as an int,
# scaled by 2^32. Pure integer parse -> the double is identical cross-engine.
_FRAC_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)"
    " / 4294967296.0"
)


def _frac_col() -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def _domain_col() -> F.Column:
    num = F.substring("source", 4, 10).cast("int")
    return (
        F.when(num < 5, "web")
        .when(num < 10, "books")
        .when(num < 15, "code")
        .otherwise("reference")
    )


def _weight_col() -> F.Column:
    w = F.lit(None).cast("double")
    expr = None
    for dom, wt in _WEIGHTS.items():
        expr = (
            F.when(F.col("domain") == dom, F.lit(wt))
            if expr is None
            else expr.when(F.col("domain") == dom, F.lit(wt))
        )
    return expr.otherwise(w)


@register(
    "domain_mixture_resample",
    oracle=f"""
        WITH tagged AS (
            SELECT doc_id, n_chars, {_DOMAIN_SQL} AS domain,
                   {_FRAC_SQL} AS frac
            FROM documents
        ),
        totals AS (
            SELECT domain,
                   CASE domain WHEN 'web' THEN 0.1 WHEN 'books' THEN 0.3
                               WHEN 'code' THEN 0.3 ELSE 0.3 END AS w,
                   CAST(SUM(n_chars) AS BIGINT) AS chars_in,
                   CAST(COUNT(*) AS BIGINT) AS docs_in
            FROM tagged GROUP BY domain
        ),
        cap AS (SELECT MIN(chars_in / w) AS c FROM totals),
        rates AS (
            SELECT t.domain, t.docs_in, t.chars_in,
                   cap.c * t.w / t.chars_in AS rate
            FROM totals t CROSS JOIN cap
        )
        SELECT r.domain, r.docs_in, r.chars_in,
               round(r.rate, 6) AS rate,
               CAST(COUNT(CASE WHEN g.frac < r.rate THEN 1 END) AS BIGINT)
                   AS docs_kept,
               CAST(COALESCE(SUM(CASE WHEN g.frac < r.rate
                                      THEN g.n_chars END), 0) AS BIGINT)
                   AS chars_kept
        FROM rates r JOIN tagged g ON g.domain = r.domain
        GROUP BY r.domain, r.docs_in, r.chars_in, r.rate
        ORDER BY r.domain
    """,
    tags=("llm", "sampling", "mixture"),
)
def domain_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture resampling: down-sample each domain so the
    kept corpus converges to the target weights, keeping the binding domain
    at rate 1.0 (water-filling: c = min over domains of chars/weight; rate_d
    = c * w_d / chars_d). The per-domain totals are a 4-row aggregate
    broadcast back over the corpus; acceptance is the same hash-uniform
    draw as operators/sampling.py, so membership is reproducible across
    runs, engines, and partitionings. At 100 TB this is one narrow scan +
    one tiny agg - the mixture never shuffles the corpus."""
    docs = load(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", "n_chars", _domain_col().alias("domain"), _frac_col().alias("frac")
    )
    totals = (
        docs.groupBy("domain")
        .agg(F.sum("n_chars").alias("chars_in"), F.count("*").alias("docs_in"))
        .withColumn("w", _weight_col())
    )
    cap = totals.agg(
        F.min(F.col("chars_in").cast("double") / F.col("w")).alias("c")
    )
    rates = totals.crossJoin(F.broadcast(cap)).select(
        "domain",
        "docs_in",
        "chars_in",
        (F.col("c") * F.col("w") / F.col("chars_in").cast("double")).alias("rate"),
    )
    return (
        docs.join(F.broadcast(rates), "domain")
        .groupBy("domain", "docs_in", "chars_in", "rate")
        .agg(
            F.sum(F.when(F.col("frac") < F.col("rate"), 1).otherwise(0)).alias("docs_kept"),
            F.coalesce(
                F.sum(F.when(F.col("frac") < F.col("rate"), F.col("n_chars"))),
                F.lit(0),
            ).alias("chars_kept"),
        )
        .select(
            "domain",
            "docs_in",
            "chars_in",
            F.round("rate", 6).alias("rate"),
            "docs_kept",
            "chars_kept",
        )
        .orderBy("domain")
    )


_SEM_T = 0.42


@register(
    "semdedup_within_cluster",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        )
        SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_dot_product(a.v, b.v) /
                     (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 6) AS score
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v) /
                    (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))), 6) >= {_SEM_T}
        ORDER BY a.label, a_id, b_id
    """,
    tags=("llm", "similarity", "dedup"),
)
def semdedup_within_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: near-duplicate pairs are only sought
    WITHIN a cluster of the embedding space (here the `label` partition;
    kmeans_train_centroids is the operator that produces such labels when
    absent). This is the step that makes embedding dedup tractable at
    100 TB: candidate generation is an equi-join on the cluster id - the
    corpus shuffles once by cluster, and the quadratic term is bounded by
    the largest cluster, not the corpus. Pairs above the threshold are the
    drop candidates (keep-lowest-id convention, as in dedup_minhash_clusters)."""
    emb = load(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(
        F.col("label"), F.col("vec_id").alias("a_id"), F.col("v").alias("va")
    )
    b = emb.select(
        F.col("label").alias("lb"), F.col("vec_id").alias("b_id"), F.col("v").alias("vb")
    )
    return (
        a.join(b, (a.label == b.lb) & (F.col("a_id") < F.col("b_id")))
        .select(
            "label",
            "a_id",
            "b_id",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score"),
        )
        .filter(F.col("score") >= _SEM_T)
        .orderBy("label", "a_id", "b_id")
    )


@register(
    "knn_graph_top3",
    oracle="""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   round(list_dot_product(a.v, b.v) /
                         (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 6) AS score,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY round(list_dot_product(a.v, b.v) /
                                (sqrt(list_dot_product(a.v, a.v))
                                 * sqrt(list_dot_product(b.v, b.v))), 6) DESC,
                                b.vec_id
                   ) AS rk
            FROM e a JOIN e b ON a.vec_id <> b.vec_id
        )
        SELECT src, dst, score, CAST(rk AS BIGINT) AS rk
        FROM scored WHERE rk <= 3 AND src < 40
        ORDER BY src, rk
    """,
    tags=("llm", "similarity", "graph"),
)
def knn_graph_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-graph construction (3 nearest neighbors by cosine per node) -
    the backbone of graph-based semantic clustering, curriculum grouping,
    and diversity sampling. Exact all-pairs scoring with a per-source
    WindowGroupLimit top-3 (running heap per node, never the full neighbor
    list). The src < 40 slice bounds the *attested output*, not the
    computation. At 100 TB exact all-pairs is replaced by the bucketed
    candidate generators (sign-LSH / IVF partitions) feeding the same
    window; the window stage is identical either way."""
    emb = load(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("src"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("v").alias("vb"))
    w = Window.partitionBy("src").orderBy(F.desc("score"), "dst")
    return (
        a.join(b, F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("src") < 40))
        .select("src", "dst", "score", F.col("rk").cast("long").alias("rk"))
        .orderBy("src", "rk")
    )


@register(
    "rnn_mutual_pairs_within_cluster",
    oracle="""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ),
        scored AS (
            SELECT a.label, a.vec_id AS src, b.vec_id AS dst,
                   round(list_dot_product(a.v, b.v) /
                         (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 6) AS score,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY round(list_dot_product(a.v, b.v) /
                                (sqrt(list_dot_product(a.v, a.v))
                                 * sqrt(list_dot_product(b.v, b.v))), 6) DESC,
                                b.vec_id
                   ) AS rk
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
        ),
        t1 AS (SELECT label, src, dst, score FROM scored WHERE rk = 1)
        SELECT x.label, x.src AS a_id, x.dst AS b_id, x.score
        FROM t1 x JOIN t1 y ON x.src = y.dst AND x.dst = y.src
        WHERE x.src < x.dst
        ORDER BY x.label, a_id
    """,
    tags=("llm", "similarity", "graph", "dedup"),
)
def rnn_mutual_pairs_within_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest neighbors: pairs where each vector is the
    other's cosine top-1 WITHIN its cluster - the highest-precision
    near-duplicate signal an embedding space offers (RNN pairs seed
    NN-descent graph construction and validate ANN indexes; mutual top-1
    is far stricter than a one-directional threshold). Candidate
    generation is the SemDeDup equi-join on the cluster label, so the
    quadratic term is bounded by the largest cluster; the top-1 is a
    WindowGroupLimit rank per vector; mutuality is a self-join of the
    per-vector TOP-1 TABLE (one row per vector - corpus-row-sized, never
    pair-sized). Deterministic (score DESC, dst) tie-break."""
    emb = load(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select("label", F.col("vec_id").alias("src"), F.col("v").alias("va"))
    b = emb.select(
        F.col("label").alias("lb"), F.col("vec_id").alias("dst"), F.col("v").alias("vb")
    )
    w = Window.partitionBy("src").orderBy(F.desc("score"), "dst")
    t1 = (
        a.join(b, (a.label == F.col("lb")) & (F.col("src") != F.col("dst")))
        .select(
            "label",
            "src",
            "dst",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("score"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("label", "src", "dst", "score")
    )
    y = t1.select(
        F.col("src").alias("y_src"), F.col("dst").alias("y_dst")
    )
    return (
        t1.join(
            y, (t1.src == F.col("y_dst")) & (t1.dst == F.col("y_src"))
        )
        .filter(F.col("src") < F.col("dst"))
        .select("label", F.col("src").alias("a_id"), F.col("dst").alias("b_id"), "score")
        .orderBy("label", "a_id")
    )


@register(
    "curriculum_phase_stats",
    oracle="""
        WITH scored AS (
            SELECT doc_id, n_chars, CAST(n_chars AS DOUBLE) AS score
            FROM documents
        ),
        b AS (
            SELECT PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY score) AS p25,
                   PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY score) AS p50,
                   PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY score) AS p75
            FROM scored
        ),
        phased AS (
            SELECT s.doc_id, s.n_chars, s.score,
                   CASE WHEN s.score <= b.p25 THEN 1
                        WHEN s.score <= b.p50 THEN 2
                        WHEN s.score <= b.p75 THEN 3
                        ELSE 4 END AS phase
            FROM scored s CROSS JOIN b
        )
        SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS phase_chars,
               round(MIN(score), 6) AS min_score,
               round(MAX(score), 6) AS max_score
        FROM phased
        GROUP BY phase
        ORDER BY phase
    """,
    tags=("llm", "sampling", "curriculum"),
)
def curriculum_phase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment (short -> long training phases): documents
    bucket into 4 phases by quartiles of a deterministic difficulty score
    (document length; swap in any text_quality_scores signal). Unlike a global
    ntile window (one giant partition), the phase comes from comparing each
    row against three PRECOMPUTED quantile boundaries broadcast as a 1-row
    frame - the corpus never globally sorts and never shuffles; at 100 TB
    the boundaries come from approx_percentile on a sample and assignment
    stays embarrassingly parallel. The integer-derived score makes quantile
    boundaries and comparisons exact cross-engine."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    scored = docs.select(
        "doc_id", "n_chars", F.col("n_chars").cast("double").alias("score")
    )
    b = scored.agg(
        F.percentile("score", 0.25).alias("p25"),
        F.percentile("score", 0.50).alias("p50"),
        F.percentile("score", 0.75).alias("p75"),
    )
    phase = (
        F.when(F.col("score") <= F.col("p25"), 1)
        .when(F.col("score") <= F.col("p50"), 2)
        .when(F.col("score") <= F.col("p75"), 3)
        .otherwise(4)
    )
    return (
        scored.crossJoin(F.broadcast(b))
        .withColumn("phase", phase)
        .groupBy("phase")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("phase_chars"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
        .orderBy("phase")
    )


@register(
    "embedding_int8_quantize",
    oracle="""
        WITH e AS (
            SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS g(i)
        ),
        stats AS (
            SELECT dim, MIN(v) AS lo, MAX(v) AS hi,
                   (MAX(v) - MIN(v)) / 255.0 AS scale
            FROM e GROUP BY dim
        ),
        q AS (
            SELECT e.vec_id, e.dim,
                   round(CAST(round((e.v - s.lo) / s.scale) AS DOUBLE)
                         * s.scale + s.lo - e.v, 9) AS err
            FROM e JOIN stats s ON e.dim = s.dim
        )
        SELECT CAST(q.dim AS INT) AS dim,
               round(ANY_VALUE(s.scale), 9) AS scale,
               round(MAX(abs(q.err)), 9) AS max_abs_err,
               CAST(SUM(CAST(round(abs(q.err), 9) AS DECIMAL(18,12))) AS DOUBLE)
                   / COUNT(*) AS mean_abs_err
        FROM q JOIN stats s ON q.dim = s.dim
        WHERE q.dim < 8
        GROUP BY q.dim
        ORDER BY dim
    """,
    tags=("llm", "similarity", "compression"),
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 quantization of the embedding table (the 4x
    storage/bandwidth compression an ANN index applies before sharding):
    symmetric min-max affine to [0, 255], with per-dim reconstruction-error
    audit (max and mean absolute error). The per-dim stats are a dims-row
    broadcast; quantization is a narrow map - one posexplode shuffle for
    stats, zero shuffles to quantize at any corpus size. The dim < 8 slice
    bounds the attested output, not the computation. Mean error sums
    9dp-pre-rounded decimals, so the oracle is exact; scale/err doubles are
    identical cross-engine (same IEEE operands)."""
    emb = load(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    stats = emb.groupBy("dim").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        ((F.max("v") - F.min("v")) / F.lit(255.0)).alias("scale"),
    )
    err = F.round(
        F.round((F.col("v") - F.col("lo")) / F.col("scale"))
        * F.col("scale")
        + F.col("lo")
        - F.col("v"),
        9,
    )
    return (
        emb.join(F.broadcast(stats), "dim")
        .select("dim", "scale", err.alias("err"))
        .filter(F.col("dim") < 8)
        .groupBy("dim")
        .agg(
            F.round(F.first("scale"), 9).alias("scale"),
            F.round(F.max(F.abs("err")), 9).alias("max_abs_err"),
            (
                F.sum(F.round(F.abs("err"), 9).cast("decimal(18,12)")).cast("double")
                / F.count("*")
            ).alias("mean_abs_err"),
        )
        .orderBy("dim")
    )


_TEMP_ALPHA = 0.7  # the standard multilingual sampling temperature exponent


@register(
    "lang_temperature_mixture",
    oracle=f"""
        WITH per AS (
            SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars_in
            FROM documents
            GROUP BY lang
        ),
        tot AS (SELECT CAST(SUM(chars_in) AS DOUBLE) AS total,
                       SUM(power(chars_in / (SELECT CAST(SUM(chars_in) AS DOUBLE)
                                             FROM per), {_TEMP_ALPHA})) AS z
                FROM per)
        SELECT lang, chars_in,
               round(chars_in / total, 6) AS p_natural,
               round(power(chars_in / total, {_TEMP_ALPHA}) / z, 6) AS p_temp,
               round(power(chars_in / total, {_TEMP_ALPHA}) / z
                     / (chars_in / total), 6) AS boost
        FROM per, tot
        ORDER BY lang
    """,
    tags=("llm", "mixture", "sampling"),
)
def lang_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual mixture (the p_l^alpha re-weighting of
    mBERT/XLM-R and multilingual LLM data recipes, alpha=0.7): per-language
    natural share p, temperature-adjusted share p^alpha / sum(p^alpha), and
    the per-language sampling boost q/p a sampler would apply (boost > 1
    up-samples low-resource languages). Two tiny aggregates: the
    per-language character totals (map-side combinable) and a 1-row
    normalizer broadcast back - the corpus itself is never reshuffled;
    the acceptance pass would reuse the hash-draw membership of
    domain_mixture_resample with these rates."""
    per = (
        load(spark, sf_dir, "documents", parallel=True)
        .groupBy("lang")
        .agg(F.sum("n_chars").cast("long").alias("chars_in"))
    )
    grand = per.agg(F.sum("chars_in").cast("double").alias("total"))
    tot = (
        per.crossJoin(F.broadcast(grand))
        .agg(
            F.first("total").alias("total"),
            F.sum(F.pow(F.col("chars_in") / F.col("total"), _TEMP_ALPHA)).alias("z"),
        )
    )
    p = F.col("chars_in") / F.col("total")
    q = F.pow(p, _TEMP_ALPHA) / F.col("z")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "chars_in",
            F.round(p, 6).alias("p_natural"),
            F.round(q, 6).alias("p_temp"),
            F.round(q / p, 6).alias("boost"),
        )
        .orderBy("lang")
    )
