"""Product-quantization queries (operators/pq.py): codebook training,
corpus encoding, ADC search, and the recall audit - the PQ half of IVF-PQ
over the embeddings table (64-dim vectors; m=4 subspaces x 16 dims, k=8
centroids per codebook, 2 Lloyd rounds).

Every oracle unrolls the same deterministic pipeline as chained DuckDB
CTEs, mirroring operators/pq.py stage for stage (hash-deterministic
seeds, 6dp-rounded means, ties to the lowest code) - the same discipline
as the kmeans/IVF family in llm_ivf.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.pq import (
    adc_topk,
    pq_fit,
)
from nyc_analytics_database_platform_spark.registry import register

_M, _K, _ITERS = 4, 8, 2
_DS = 16  # 64-dim embeddings / 4 subspaces


def _sub_cte() -> str:
    return f"""
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sub AS (
            SELECT vec_id, j, v[j * {_DS} + 1 : j * {_DS} + {_DS}] AS sv
            FROM e, unnest(generate_series(0, {_M - 1})) AS gj(j)
        ),
        ranked AS (
            SELECT vec_id, v,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS rn
            FROM e
        ),
        b0 AS (
            SELECT s.j, s.rn AS c_id, i - 1 AS dim, s.sv[i] AS cv
            FROM (
                SELECT rn, j, v[j * {_DS} + 1 : j * {_DS} + {_DS}] AS sv
                FROM ranked, unnest(generate_series(0, {_M - 1})) AS gj(j)
                WHERE rn < {_K}
            ) s, unnest(generate_series(1, {_DS})) AS gi(i)
        )"""


def _assign(name: str, books: str, src: str = "sub") -> str:
    return f"""
        d_{name} AS (
            SELECT s.vec_id, s.j, b.c_id,
                   SUM((s.sv[b.dim + 1] - b.cv) * (s.sv[b.dim + 1] - b.cv)) AS d2
            FROM {src} s JOIN {books} b ON s.j = b.j
            GROUP BY s.vec_id, s.j, b.c_id
        ),
        {name} AS (
            SELECT vec_id, j, c_id FROM (
                SELECT vec_id, j, c_id,
                       row_number() OVER (
                           PARTITION BY vec_id, j ORDER BY d2, c_id) AS r
                FROM d_{name}
            ) WHERE r = 1
        )"""


def _update(name: str, codes: str, src: str = "sub") -> str:
    return f"""
        {name} AS (
            SELECT a.j, a.c_id, i - 1 AS dim, round(avg(s.sv[i]), 6) AS cv
            FROM {codes} a JOIN {src} s ON a.vec_id = s.vec_id AND a.j = s.j,
                 unnest(generate_series(1, {_DS})) AS gi(i)
            GROUP BY a.j, a.c_id, dim
        )"""


_TRAINED = (
    _sub_cte()
    + ","
    + _assign("a1", "b0")
    + ","
    + _update("b1", "a1")
    + ","
    + _assign("a2", "b1")
    + ","
    + _update("b2", "a2")
    + ","
    + _assign("a3", "b2")
)


def _fitted(spark: SparkSession, sf_dir: str):
    emb = load(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb, *pq_fit(emb, _M, _K, _ITERS)


@register(
    "pq_train_codebooks",
    oracle=f"""
        WITH {_TRAINED},
        counts AS (
            SELECT j, c_id, CAST(COUNT(*) AS BIGINT) AS n_members
            FROM a3 GROUP BY j, c_id
        )
        SELECT CAST(b2.j AS INT) AS subspace, CAST(b2.c_id AS INT) AS c_id,
               CAST(b2.dim AS INT) AS dim, b2.cv AS centroid_v,
               counts.n_members
        FROM b2 JOIN counts USING (j, c_id)
        ORDER BY subspace, c_id, dim
    """,
    tags=("llm", "pq", "iterative"),
)
def pq_train_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All m=4 PQ codebooks trained in ONE Lloyd loop (subspace joins the
    key of every stage - operators/pq.py), 2 rounds from hash-deterministic
    seeds; reports per-(subspace, cluster, dim) centroid values + member
    counts. Per iteration: one broadcast assign over the subvector frame
    (vectors never shuffle) + one (j, c_id, dim)-keyed mean whose group
    count is dims x k - constants at any corpus size."""
    _, books, codes = _fitted(spark, sf_dir)
    counts = codes.groupBy("j", "c_id").agg(F.count("*").alias("n_members"))
    return (
        books.select("j", "c_id", F.posexplode("cvec").alias("dim", "centroid_v"))
        .join(counts, ["j", "c_id"])
        .select(
            F.col("j").cast("int").alias("subspace"),
            F.col("c_id").cast("int").alias("c_id"),
            F.col("dim").cast("int").alias("dim"),
            "centroid_v",
            "n_members",
        )
        .orderBy("subspace", "c_id", "dim")
    )


@register(
    "pq_encode_codes",
    oracle=f"""
        WITH {_TRAINED}
        SELECT vec_id, string_agg(CAST(c_id AS VARCHAR), '|' ORDER BY j) AS codes
        FROM a3 GROUP BY vec_id ORDER BY vec_id
    """,
    tags=("llm", "pq"),
)
def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus as PQ codes: m=4 small integers per vector (the 64x
    compression that makes a 100 TB embedding store scannable). Encoding
    is the broadcast assign pass; code assembly is one per-id aggregate
    (m rows per id, map-side combinable). Codes are emitted '|'-joined
    (string, not array<int>) so the driver canonicalizer can hash them."""
    _, _, codes = _fitted(spark, sf_dir)
    return (
        codes.groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "c_id"))),
                    lambda s: s["c_id"].cast("string"),
                ),
                "|",
            ).alias("codes")
        )
        .orderBy("vec_id")
    )


@register(
    "pq_adc_top5",
    oracle=f"""
        WITH {_TRAINED},
        q AS (
            SELECT j, v[j * {_DS} + 1 : j * {_DS} + {_DS}] AS qsv
            FROM e, unnest(generate_series(0, {_M - 1})) AS gj(j)
            WHERE vec_id = 0
        ),
        dt AS (
            SELECT b.j, b.c_id,
                   SUM((q.qsv[b.dim + 1] - b.cv) * (q.qsv[b.dim + 1] - b.cv)) AS dtv
            FROM b2 b JOIN q ON b.j = q.j
            GROUP BY b.j, b.c_id
        )
        SELECT a.vec_id, round(SUM(d.dtv), 6) AS adc_d2
        FROM a3 a JOIN dt d ON a.j = d.j AND a.c_id = d.c_id
        GROUP BY a.vec_id
        ORDER BY adc_d2, vec_id
        LIMIT 5
    """,
    tags=("llm", "pq", "similarity"),
)
def pq_adc_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance search: the exact query-to-centroid table (m x k
    doubles) is built once and broadcast; every database vector costs m
    code lookups + a sum. Top-5 for the vec_id=0 query point (the ANN
    family's shared convention)."""
    emb, books, codes = _fitted(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0)
    return adc_topk(codes, books, query, _M, _K).limit(5)


@register(
    "pq_recall_audit",
    oracle=f"""
        WITH {_TRAINED},
        q AS (
            SELECT j, v[j * {_DS} + 1 : j * {_DS} + {_DS}] AS qsv
            FROM e, unnest(generate_series(0, {_M - 1})) AS gj(j)
            WHERE vec_id = 0
        ),
        dt AS (
            SELECT b.j, b.c_id,
                   SUM((q.qsv[b.dim + 1] - b.cv) * (q.qsv[b.dim + 1] - b.cv)) AS dtv
            FROM b2 b JOIN q ON b.j = q.j
            GROUP BY b.j, b.c_id
        ),
        adc AS (
            SELECT a.vec_id
            FROM a3 a JOIN dt d ON a.j = d.j AND a.c_id = d.c_id
            GROUP BY a.vec_id
            ORDER BY round(SUM(d.dtv), 6), vec_id
            LIMIT 5
        ),
        qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        exact AS (
            SELECT e.vec_id
            FROM e, qv, unnest(generate_series(1, {_M * _DS})) AS gi(i)
            GROUP BY e.vec_id
            ORDER BY SUM((e.v[i] - qv.qv[i]) * (e.v[i] - qv.qv[i])), e.vec_id
            LIMIT 5
        )
        SELECT CAST(5 AS BIGINT) AS k,
               CAST((SELECT COUNT(*) FROM adc
                     WHERE vec_id IN (SELECT vec_id FROM exact)) AS BIGINT)
                   AS n_hits,
               round((SELECT COUNT(*) FROM adc
                      WHERE vec_id IN (SELECT vec_id FROM exact)) / 5.0, 2)
                   AS recall_at_5
    """,
    tags=("llm", "pq", "audit"),
)
def pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@5 of ADC search against exact L2 brute force for the
    vec_id=0 query - the calibration evidence that the 64x-compressed
    index is still useful (same audit pattern as ivf_recall_audit). The
    exact side is the one full-scan pass; the ADC side reuses the
    broadcast-table search."""
    emb, books, codes = _fitted(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0)
    adc_ids = adc_topk(codes, books, query, _M, _K).limit(5).select("vec_id")
    qv = query.select(F.col("v").alias("qv"))
    from nyc_analytics_database_platform_spark.operators.kmeans import _dist2

    exact_ids = (
        emb.crossJoin(F.broadcast(qv))
        .select("vec_id", _dist2(F.col("v"), F.col("qv")).alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(5)
        .select("vec_id")
    )
    hits = adc_ids.join(exact_ids, "vec_id").count()
    return spark.createDataFrame(
        [(5, hits, round(hits / 5.0, 2))],
        "k long, n_hits long, recall_at_5 double",
    )


@register(
    "ivfpq_adc_top5",
    oracle=f"""
        WITH {_TRAINED},
        el AS (SELECT vec_id, label FROM embeddings),
        cent AS (
            SELECT label, list(cv ORDER BY dim) AS cvec
            FROM (
                SELECT label, i AS dim,
                       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS cv
                FROM embeddings,
                     unnest(generate_series(1, {_M * _DS})) AS g(i)
                GROUP BY label, i
            )
            GROUP BY label
        ),
        qfull AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        probe AS (
            SELECT label
            FROM cent, qfull,
                 unnest(generate_series(1, {_M * _DS})) AS gi(i)
            GROUP BY label
            ORDER BY SUM((cvec[i] - qv[i]) * (cvec[i] - qv[i])), label
            LIMIT 1
        ),
        q AS (
            SELECT j, v[j * {_DS} + 1 : j * {_DS} + {_DS}] AS qsv
            FROM e, unnest(generate_series(0, {_M - 1})) AS gj(j)
            WHERE vec_id = 0
        ),
        dt AS (
            SELECT b.j, b.c_id,
                   SUM((q.qsv[b.dim + 1] - b.cv) * (q.qsv[b.dim + 1] - b.cv)) AS dtv
            FROM b2 b JOIN q ON b.j = q.j
            GROUP BY b.j, b.c_id
        )
        SELECT a.vec_id, round(SUM(d.dtv), 6) AS adc_d2
        FROM a3 a
        JOIN el ON a.vec_id = el.vec_id
        JOIN dt d ON a.j = d.j AND a.c_id = d.c_id
        WHERE el.label = (SELECT label FROM probe)
        GROUP BY a.vec_id
        ORDER BY adc_d2, a.vec_id
        LIMIT 5
    """,
    tags=("llm", "pq", "ivf", "similarity"),
)
def ivfpq_adc_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ index in one declarative plan: coarse-route the
    query to its nearest cell (L2 over the per-label 6dp-mean centroids -
    the `label` column is the IVF partitioning, as in llm_ivf.py), then
    ADC-score ONLY that cell's PQ codes. At 100 TB the codes table is
    label-partitioned on disk, so the probe reads one partition of 4-byte
    codes and the broadcast m x k table prices each candidate in m
    lookups - the scan cost is (corpus / n_cells) x 4 bytes, the memory
    cost one distance table. (Classic refinement - PQ over cell residuals
    - would re-center each cell before encoding; documented, not needed
    for the routing + compression semantics attested here.) Ties: lowest
    label, then lowest vec_id, matching the oracle exactly."""
    emb, books, codes = _fitted(spark, sf_dir)
    raw = load(spark, sf_dir, "embeddings", parallel=True)
    query = emb.filter(F.col("vec_id") == 0)
    qv = query.select(F.col("v").alias("qv"))
    from nyc_analytics_database_platform_spark.operators.kmeans import _dist2

    cent = (
        raw.select("label", F.posexplode("embedding").alias("dim", "ev"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("ev").cast("double")), 6).alias("cv"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
    )
    probe = (
        cent.crossJoin(F.broadcast(qv))
        .select("label", _dist2(F.col("cvec"), F.col("qv")).alias("d2"))
        .agg(F.min_by("label", F.struct("d2", "label")).alias("label"))
    )
    cell_ids = (
        raw.select("vec_id", "label")
        .join(F.broadcast(probe), "label")
        .select("vec_id")
    )
    cell_codes = codes.join(F.broadcast(cell_ids), "vec_id")
    return adc_topk(cell_codes, books, query, _M, _K).limit(5)


_SPLIT_VEC = 400  # vec_id >= _SPLIT_VEC is the "new batch"; below is history


def _hist_trained() -> str:
    """The training chain restricted to the HISTORY vectors (vec_id <
    _SPLIT_VEC): seeds drawn from history only, every Lloyd stage reads
    subh. The full `sub` frame stays available for encoding the increment."""
    return (
        _sub_cte()
        + f""",
        subh AS (SELECT * FROM sub WHERE vec_id < {_SPLIT_VEC}),
        rankedh AS (
            SELECT vec_id, v,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS rn
            FROM e WHERE vec_id < {_SPLIT_VEC}
        ),
        bh0 AS (
            SELECT s.j, s.rn AS c_id, i - 1 AS dim, s.sv[i] AS cv
            FROM (
                SELECT rn, j, v[j * {_DS} + 1 : j * {_DS} + {_DS}] AS sv
                FROM rankedh, unnest(generate_series(0, {_M - 1})) AS gj(j)
                WHERE rn < {_K}
            ) s, unnest(generate_series(1, {_DS})) AS gi(i)
        )"""
        + ","
        + _assign("ha1", "bh0", "subh")
        + ","
        + _update("hb1", "ha1", "subh")
        + ","
        + _assign("ha2", "hb1", "subh")
        + ","
        + _update("hb2", "ha2", "subh")
    )


@register(
    "pq_encode_increment",
    oracle=f"""
        WITH {_hist_trained()},
        subn AS (SELECT * FROM sub WHERE vec_id >= {_SPLIT_VEC}),{_assign("an", "hb2", "subn")}
        SELECT vec_id, string_agg(CAST(c_id AS VARCHAR), '|' ORDER BY j) AS codes
        FROM an GROUP BY vec_id ORDER BY vec_id
    """,
    tags=("llm", "pq", "incremental"),
)
def pq_encode_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index MAINTENANCE under a corpus increment - the production mode for
    a PQ store (same shape as dedup_incremental_*): codebooks are trained
    on the HISTORY (vec_id < _SPLIT_VEC = 400; they would be a persisted
    artifact, retrained on drift audits, not per batch), and ONLY the new
    batch is encoded against the frozen codebooks - one broadcast assign
    pass over the increment's subvectors, zero work proportional to the
    corpus. The oracle recomputes history training + increment encoding
    from scratch, so the driver attests the frozen-codebook path exactly."""
    from nyc_analytics_database_platform_spark.operators.pq import (
        assign_codes,
        subvectors,
    )

    emb, _, _ = _fitted(spark, sf_dir)
    hist = emb.filter(F.col("vec_id") < _SPLIT_VEC)
    books, _ = pq_fit(hist, _M, _K, _ITERS)
    new_sv = subvectors(emb.filter(F.col("vec_id") >= _SPLIT_VEC), _M)
    return (
        assign_codes(new_sv, books)
        .groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "c_id"))),
                    lambda s: s["c_id"].cast("string"),
                ),
                "|",
            ).alias("codes")
        )
        .orderBy("vec_id")
    )


# --- CDC-driven PQ code maintenance (round 12) -------------------------------

def _pq_maintain_oracle() -> str:
    """Frozen-codebook oracle over the versioned chain's HEAD: history-
    trained codebooks (the same CTE chain as pq_encode_increment), one
    assign pass over every head-visible subvector. The chain's delete
    range is imported from llm_ivf so the two maintenance twins cannot
    drift apart."""
    from nyc_analytics_database_platform_spark.queries.llm_ivf import (
        _ANN_DEL_HI,
        _ANN_DEL_LO,
        _ANN_SPLIT_VEC,
    )

    assert _ANN_SPLIT_VEC == _SPLIT_VEC  # one history definition
    return f"""
        WITH {_hist_trained()},
        subvis AS (
            SELECT * FROM sub
            WHERE NOT (vec_id >= {_ANN_DEL_LO} AND vec_id < {_ANN_DEL_HI})
        ),{_assign("av", "hb2", "subvis")}
        SELECT vec_id, string_agg(CAST(c_id AS VARCHAR), '|' ORDER BY j) AS codes
        FROM av GROUP BY vec_id ORDER BY vec_id
    """


@register(
    "pq_maintain_from_cdf",
    oracle=_pq_maintain_oracle(),
    tags=("llm", "pq", "incremental", "txnlog", "cdc"),
)
def pq_maintain_from_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ code store maintained FROM THE CHANGE FEED of a versioned
    embeddings table — the compressed-codes half of the retrieval
    maintenance loop (VERDICT r11 #7; the cell-list half is
    llm_ivf.ann_maintain_from_cdf over the same chain). Codebooks are
    trained on the v1 history and FROZEN (pq_encode_increment's
    production posture); each change-feed advance encodes ONLY the
    inserted vectors against them and retracts deleted vec_ids from the
    code store by anti-join. Work per advance is O(changed vectors); the
    corpus is never re-encoded. Oracle: from-scratch encoding of every
    head-visible vector under the same frozen codebooks."""
    from nyc_analytics_database_platform_spark.operators import txnlog
    from nyc_analytics_database_platform_spark.queries.llm_ivf import (
        build_embeddings_commit_chain,
    )

    root = build_embeddings_commit_chain(spark, sf_dir)
    cols = ["vec_id", "embedding"]

    def vecs(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )

    v1 = vecs(txnlog.read_version(spark, root, 1).select(*cols))
    books = frozen_history_codebooks(spark, sf_dir)
    state = encode_code_strings(v1, books)
    for v in (2, 3):
        feed = txnlog.changes_between(spark, root, v - 1, v, cols)
        state = maintain_codes_from_feed(state, books, feed)
    return state.orderBy("vec_id")


def frozen_history_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted PQ-codebook ARTIFACT: m subspace codebooks trained on
    the history prefix (vec_id < _SPLIT_VEC), written to parquet under
    layouts.scratch and stamped by the embeddings source + training
    constants — the codes-side twin of llm_ivf.frozen_history_quantizer
    (ADVICE r13: one artifact, not one retrain per consumer).
    Deterministic training keeps artifact == recompute exactly."""
    from nyc_analytics_database_platform_spark import layouts

    path = layouts.scratch(sf_dir, "artifact", "hist_codebooks")
    marker = path + "_done"
    stamp = layouts.source_stamp(
        sf_dir, "embeddings", spec=f"histpq:{_SPLIT_VEC}:{_M}:{_K}:{_ITERS}")
    if not (layouts.is_fresh(marker, stamp) and layouts.has_parquet(path)):
        hist = load(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < _SPLIT_VEC
        ).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        books, _ = pq_fit(hist, _M, _K, _ITERS)
        books.write.mode("overwrite").parquet(path)
        layouts.mark_fresh(marker, stamp)
    return layouts.session_artifact(
        spark, (path, stamp),
        lambda: spark.read.parquet(path).localCheckpoint(eager=True))


def encode_code_strings(df: DataFrame, books: DataFrame) -> DataFrame:
    """(vec_id, codes): each vector's m subvector code ids under frozen
    `books`, joined 'c0|c1|...|cm-1' in subspace order — the compact,
    engine-portable code-store row format the PQ maintenance family
    persists and the DuckDB oracles reproduce with string_agg."""
    from nyc_analytics_database_platform_spark.operators.pq import (
        assign_codes,
        subvectors,
    )

    return (
        assign_codes(subvectors(df, _M), books)
        .groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "c_id"))),
                    lambda s: s["c_id"].cast("string"),
                ),
                "|",
            ).alias("codes")
        )
    )


def maintain_codes_from_feed(
    state: DataFrame, books: DataFrame, feed: DataFrame
) -> DataFrame:
    """Advance the PQ code store by ONE change-feed version: deletes
    retract by anti-join on the feed's keys, inserts are encoded against
    the frozen codebooks and appended. Handles mixed feeds; work is
    O(feed rows) — the twin of llm_ivf.maintain_cells_from_feed on the
    compressed-codes side."""
    deleted = (
        feed.filter(F.col("change_type") == "delete")
        .select("vec_id").distinct()
    )
    inserted = feed.filter(F.col("change_type") == "insert").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return state.join(deleted, "vec_id", "left_anti").unionByName(
        encode_code_strings(inserted, books)
    )
