"""Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009 -
the fusion rule used by Elasticsearch/OpenSearch hybrid search) of the
BM25 lexical ranking (llm_text.text_bm25_scores) and the embedding cosine
ranking (llm_similarity's query-point convention, vec_id = 0) over the
aligned documents/embeddings tables.

RRF fuses top-k CANDIDATE LISTS, not full-corpus rankings: each retriever
contributes its top-20 via orderBy().limit(k) - TakeOrderedAndProject,
the distributed per-partition top-k merge, never a corpus-wide
single-partition Window (a bare row_number-over-global-order would be
exactly that) - and ranks are attached by a row_number over the already
k-row candidate frame, so the only Window in the plan sorts 20 rows. A
document missing from one list simply contributes 0 to the fused score.
That is exactly the 100 TB shape: two cheap top-k scans meet in a 40-row
fusion join - the corpus is never joined to itself.

Determinism: scores are rounded (6dp) BEFORE ranking on both engines, rank
ties break by id, and the fused score is a two-term sum of exact small
rationals rounded to 9dp, so parity is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.similarity import cosine
from nyc_analytics_database_platform_spark.queries.llm_similarity import _COS_SQL
from nyc_analytics_database_platform_spark.queries.llm_text import _bm25_oracle
from nyc_analytics_database_platform_spark.registry import register

_K_CAND = 20  # per-retriever candidate-list depth
_RRF_K = 60  # the standard RRF dampening constant


@register(
    "retrieval_rrf_hybrid_top5",
    oracle=f"""
        WITH lex AS ({_bm25_oracle()}),
        lr AS (
            SELECT doc_id, lex_rank FROM (
                SELECT doc_id,
                       row_number() OVER (ORDER BY score DESC, doc_id)
                           AS lex_rank
                FROM lex
            ) WHERE lex_rank <= {_K_CAND}
        ),
        qe AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        sem AS (SELECT vec_id, {_COS_SQL} AS score FROM embeddings, qe),
        sr AS (
            SELECT vec_id, sem_rank FROM (
                SELECT vec_id,
                       row_number() OVER (ORDER BY score DESC, vec_id)
                           AS sem_rank
                FROM sem
            ) WHERE sem_rank <= {_K_CAND}
        )
        SELECT COALESCE(lr.doc_id, sr.vec_id) AS doc_id,
               CAST(lex_rank AS INT) AS lex_rank,
               CAST(sem_rank AS INT) AS sem_rank,
               round(COALESCE(1.0::DOUBLE / ({_RRF_K} + lex_rank), 0.0)
                     + COALESCE(1.0::DOUBLE / ({_RRF_K} + sem_rank), 0.0), 9)
                   AS rrf_score
        FROM lr FULL JOIN sr ON lr.doc_id = sr.vec_id
        ORDER BY rrf_score DESC, doc_id
        LIMIT 5
    """,
    tags=("llm", "retrieval", "similarity"),
)
def retrieval_rrf_hybrid_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 documents by reciprocal-rank fusion of the BM25 candidate list
    and the cosine-ANN candidate list (both top-20, k=60 dampening). Each
    candidate cut is TakeOrderedAndProject (distributed top-k, no global
    sort, no corpus-wide Window); ranks come from a row_number over the
    20-row cut, and the fusion is a full-outer join of two k-row frames -
    the whole fused stage is bounded by k at any corpus size. The
    expensive parts are the two independent retriever scans, each already
    attested on its own (text_bm25_scores, ann_bruteforce_top10)."""
    from nyc_analytics_database_platform_spark.queries.llm_text import (
        text_bm25_scores,
    )

    lex = text_bm25_scores(spark, sf_dir).select("doc_id", "score")
    w_lex = Window.orderBy(F.col("score").desc(), "doc_id")
    lr = (
        lex.orderBy(F.col("score").desc(), "doc_id")
        .limit(_K_CAND)
        .withColumn("lex_rank", F.row_number().over(w_lex))
        .select("doc_id", "lex_rank")
    )

    emb = load(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sem = emb.crossJoin(F.broadcast(qv)).select(
        "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("score")
    )
    w_sem = Window.orderBy(F.col("score").desc(), "vec_id")
    sr = (
        sem.orderBy(F.col("score").desc(), "vec_id")
        .limit(_K_CAND)
        .withColumn("sem_rank", F.row_number().over(w_sem))
        .select("vec_id", "sem_rank")
    )

    fused = lr.join(sr, lr["doc_id"] == sr["vec_id"], "full").select(
        F.coalesce(lr["doc_id"], sr["vec_id"]).alias("doc_id"),
        F.col("lex_rank").cast("int").alias("lex_rank"),
        F.col("sem_rank").cast("int").alias("sem_rank"),
        F.round(
            F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0)),
            9,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(5)


_MMR_LAMBDA = 0.7
_MMR_POOL = 20
_MMR_K = 5


def _mmr_oracle() -> str:
    steps = []
    for k in range(2, _MMR_K + 1):
        prev = " UNION ALL ".join(f"SELECT vec_id FROM s{i}" for i in range(1, k))
        steps.append(f"""
        s{k} AS (
            SELECT vec_id, rel,
                   round({_MMR_LAMBDA} * rel - {round(1 - _MMR_LAMBDA, 1)} * mx, 6)
                       AS mmr,
                   {k} AS sel_rank
            FROM (
                SELECT c.vec_id, c.rel, MAX(pw.sim) AS mx
                FROM cand c JOIN pw ON pw.ai = c.vec_id
                WHERE pw.bi IN ({prev})
                  AND c.vec_id NOT IN ({prev})
                GROUP BY c.vec_id, c.rel
            )
            ORDER BY round({_MMR_LAMBDA} * rel
                           - {round(1 - _MMR_LAMBDA, 1)} * mx, 6) DESC, vec_id
            LIMIT 1
        )""")
    union = " UNION ALL ".join(
        f"SELECT sel_rank, vec_id, rel, mmr FROM s{i}"
        for i in range(1, _MMR_K + 1)
    )
    return f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        cand AS (
            SELECT vec_id, {_COS_SQL} AS rel, embedding::DOUBLE[] AS v
            FROM embeddings, q
            ORDER BY rel DESC, vec_id
            LIMIT {_MMR_POOL}
        ),
        pw AS (
            SELECT a.vec_id AS ai, b.vec_id AS bi,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
            FROM cand a, cand b
        ),
        s1 AS (
            SELECT vec_id, rel, round({_MMR_LAMBDA} * rel, 6) AS mmr,
                   1 AS sel_rank
            FROM cand
            ORDER BY round({_MMR_LAMBDA} * rel, 6) DESC, vec_id
            LIMIT 1
        ),{",".join(steps)}
        SELECT CAST(sel_rank AS INT) AS sel_rank, vec_id, rel, mmr
        FROM ({union})
        ORDER BY sel_rank
    """


@register(
    "retrieval_mmr_top5",
    oracle=_mmr_oracle(),
    tags=("llm", "retrieval", "similarity", "iterative"),
)
def retrieval_mmr_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell & Goldstein
    1998, lambda=0.7): greedily pick 5 of the top-20 cosine candidates,
    each step maximizing lambda*relevance - (1-lambda)*max-similarity to
    the already-selected set - the result list stays relevant but not
    redundant (the retrieval-side cousin of SemDeDup). Everything after
    the candidate cut operates on k-bounded frames: the 20-row candidate
    pool (ONE TakeOrderedAndProject job over the corpus), then O(k^2)
    greedy arithmetic on that bounded pool at the driver boundary - at
    100 TB only the cut touches the corpus, and the refinement cost is
    independent of corpus size. Scores are rounded before every argmax,
    ties break by vec_id, so the greedy trajectory is identical
    cross-engine (pinned against a pure-Python reference in
    tests/test_bpe_sq_rrf.py)."""
    emb = load(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    scored = emb.crossJoin(F.broadcast(qv)).select(
        "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("rel"), "v"
    )
    # ONE distributed job: the corpus-wide TakeOrderedAndProject cut. The
    # greedy refinement is O(k^2) arithmetic on the 20-row result - a
    # bounded presentation-scale computation (same boundary argument as
    # the recall audits' hit counts), so it runs driver-side instead of
    # paying a Spark job per greedy step.
    cand = (
        scored.orderBy(F.col("rel").desc(), "vec_id").limit(_MMR_POOL).collect()
    )
    import math

    vecs = {r["vec_id"]: r["v"] for r in cand}
    rels = {r["vec_id"]: r["rel"] for r in cand}

    def _cos(a: list, b: list) -> float:
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b))
            ),
            6,
        )

    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 1)
    sel: list[tuple[int, int, float, float]] = []
    chosen: list[int] = []
    for step in range(1, _MMR_K + 1):
        best = None
        for i in sorted(vecs):
            if i in chosen:
                continue
            if chosen:
                pen = max(_cos(vecs[i], vecs[j]) for j in chosen)
                mmr = round(lam * rels[i] - mu * pen, 6)
            else:
                mmr = round(lam * rels[i], 6)
            key = (-mmr, i)
            if best is None or key < best[0]:
                best = (key, i, rels[i], mmr)
        sel.append((step, best[1], best[2], best[3]))
        chosen.append(best[1])
    return spark.createDataFrame(
        sel, "sel_rank int, vec_id long, rel double, mmr double"
    ).orderBy("sel_rank")


_NDCG_K = 5
# log2(i + 1) for positions 1..5, written as identical decimal literals in
# both engines (never computed at runtime - libm log2 could differ by an ulp)
_NDCG_DISCOUNTS = (
    "1.0",
    "1.584962500721156",
    "2.0",
    "2.321928094887362",
    "2.584962500721156",
)
_SIGN_BITS_NDCG = 8
_NDCG_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(_SIGN_BITS_NDCG)
)


def _disc_case(rank_col: str) -> str:
    whens = " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_NDCG_DISCOUNTS)
    )
    return f"CASE {rank_col} {whens} END"


@register(
    "ann_ndcg_audit",
    oracle=f"""
        WITH q AS (
            SELECT embedding::DOUBLE[] AS qv, {_NDCG_BUCKET_SQL} AS qb
            FROM embeddings WHERE vec_id = 0
        ),
        gt AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY s DESC, vec_id) AS gt_rank
            FROM (SELECT vec_id, {{cos}} AS s FROM embeddings, q)
            QUALIFY gt_rank <= {_NDCG_K}
        ),
        sys AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY s DESC, vec_id) AS sys_rank
            FROM (
                SELECT vec_id, {{cos}} AS s
                FROM embeddings, q WHERE {_NDCG_BUCKET_SQL} = qb
            )
            QUALIFY sys_rank <= {_NDCG_K}
        ),
        dcg AS (
            SELECT CAST(SUM(CAST(ROUND(
                       (CASE WHEN g.gt_rank IS NULL THEN 0
                             ELSE {_NDCG_K} + 1 - g.gt_rank END) * 1e9
                       / ({_disc_case('s.sys_rank')})) AS BIGINT)) AS BIGINT)
                       AS dcg_nano,
                   COUNT(g.gt_rank) AS n_hits,
                   COUNT(*) AS n_sys
            FROM sys s LEFT JOIN gt g ON s.vec_id = g.vec_id
        ),
        idcg AS (
            SELECT CAST(SUM(CAST(ROUND(
                       ({_NDCG_K} + 1 - gt_rank) * 1e9
                       / ({_disc_case('gt_rank')})) AS BIGINT)) AS BIGINT)
                       AS idcg_nano
            FROM gt
        )
        SELECT {_NDCG_K} AS k, d.n_sys, d.n_hits, d.dcg_nano, i.idcg_nano,
               CAST(d.dcg_nano AS DOUBLE) / i.idcg_nano AS ndcg
        FROM dcg d CROSS JOIN idcg i
    """.format(cos=_COS_SQL),
    tags=("llm", "retrieval", "similarity", "audit"),
)
def ann_ndcg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the sign-LSH ANN ranking against the exact brute-force
    ranking — the graded-relevance companion to ivf_recall_audit /
    dedup_lsh_recall_audit (recall says whether the right items came back;
    NDCG says whether they came back in the right ORDER). Relevance of the
    item at exact rank r is (k+1-r); items outside the exact top-5 score 0.

    Numerics: per-position gain/discount terms are pinned to integer nanos
    (ROUND(rel * 1e9 / discount) with the log2 discounts written as shared
    decimal literals, never computed), so the DCG sums are exact integer
    arithmetic and the single final division is deterministic.

    Scale shape: both rankings are TakeOrderedAndProject cuts (the sys side
    over ~1/2^8 of the corpus via the bucket filter); the audit join is
    5x5 rows."""
    from nyc_analytics_database_platform_spark.operators.similarity import (
        brute_force_topk,
        signlsh_topk,
    )
    from nyc_analytics_database_platform_spark.queries.llm_similarity import (
        _query_vec,
    )

    emb = load(spark, sf_dir, "embeddings", parallel=True)
    qv = _query_vec(spark, sf_dir)
    disc = F.array(*[F.lit(float(d)) for d in _NDCG_DISCOUNTS])

    w = Window.orderBy(F.desc("score"), "vec_id")
    gt = (
        brute_force_topk(emb, qv, k=_NDCG_K)
        .withColumn("gt_rank", F.row_number().over(w))
        .select("vec_id", "gt_rank")
    )
    sys = (
        signlsh_topk(emb, qv, k=_NDCG_K, n_bits=_SIGN_BITS_NDCG)
        .withColumn("sys_rank", F.row_number().over(w))
        .select("vec_id", "sys_rank")
    )
    rel = F.when(
        F.col("gt_rank").isNotNull(), F.lit(_NDCG_K + 1) - F.col("gt_rank")
    ).otherwise(F.lit(0))
    dcg = (
        sys.join(gt, "vec_id", "left")
        .select(
            F.round(
                rel * F.lit(1e9) / F.element_at(disc, F.col("sys_rank"))
            )
            .cast("long")
            .alias("term"),
            F.col("gt_rank"),
        )
        .agg(
            F.sum("term").alias("dcg_nano"),
            F.count("gt_rank").alias("n_hits"),
            F.count("*").alias("n_sys"),
        )
    )
    idcg = gt.select(
        F.round(
            (F.lit(_NDCG_K + 1) - F.col("gt_rank"))
            * F.lit(1e9)
            / F.element_at(disc, F.col("gt_rank"))
        )
        .cast("long")
        .alias("term")
    ).agg(F.sum("term").alias("idcg_nano"))
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.lit(_NDCG_K).cast("int").alias("k"),
        "n_sys",
        "n_hits",
        "dcg_nano",
        "idcg_nano",
        (F.col("dcg_nano").cast("double") / F.col("idcg_nano")).alias("ndcg"),
    )
