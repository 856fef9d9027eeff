"""Multi-index curation maintenance: ONE change-feed advance drives ALL
the curation indexes together.

The capstone of the 100 TB curation loop (VERDICT r12 #1). Rounds 10-12
proved each maintenance loop separately — dedup clusters from the
documents feed (llm_clusters.dedup_maintain_from_cdf), IVF cell lists and
PQ codes from the embeddings feed (llm_ivf.ann_maintain_from_cdf,
llm_pq.pq_maintain_from_cdf). A real curation pipeline runs them as ONE
loop: the corpus is a paired documents+embeddings store keyed by the same
id (driver testdata: vec_id == doc_id, one vector per document), a commit
advances both tables, and a single maintenance pass must leave every
index agreeing on exactly the surviving ids — a takedown that leaves a
vector behind in ANY index is a compliance failure, and a survivor
missing from the retrieval side is silent data loss.

Cross-index consistency is not asserted driver-side; it is the SHAPE of
the result. The query full-outer-joins the visible id set against all
three maintained states, so an orphan (id a deleted doc left in an index)
materializes as an extra row the from-scratch oracle does not have, and a
missing survivor materializes as a NULL cell/codes where the oracle has a
value — either way the driver's hash gate fails. Work per advance stays
O(changed ids + touched components); no state is rebuilt from the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.operators.kmeans import (
    assign_clusters,
)
from nyc_analytics_database_platform_spark.queries.llm_clusters import (
    _CDF_DEL_HI,
    _CDF_DEL_LO,
    _dedup_maintain_oracle,
    build_documents_commit_chain,
    maintain_clusters_from_feed,
    persisted_v1_dedup_state,
)
from nyc_analytics_database_platform_spark.queries.llm_ivf import (
    _ivf_hist_assign_oracle,
    build_embeddings_commit_chain,
    frozen_history_quantizer,
    maintain_cells_from_feed,
)
from nyc_analytics_database_platform_spark.queries.llm_pq import (
    _pq_maintain_oracle,
    encode_code_strings,
    frozen_history_codebooks,
    maintain_codes_from_feed,
)
from nyc_analytics_database_platform_spark.registry import register


def _multi_index_oracle() -> str:
    """From-scratch recompute of ALL THREE indexes at the head version,
    joined on the shared id: the dedup component oracle (recursive CTE),
    the frozen-quantizer IVF assignment, and the frozen-codebook PQ
    encoding — each the exact oracle its own maintenance query is attested
    against, composed as derived tables so their CTE namespaces cannot
    collide. LEFT joins from the visible id set: the oracle is consistent
    by construction, so any divergence (orphan row, NULL where a value
    belongs) can only come from the incremental path."""
    return f"""
        SELECT v.doc_id,
               CAST(1 AS INT) AS live,
               c.component,
               a.cell,
               p.codes
        FROM (
            SELECT doc_id FROM documents
            WHERE NOT (doc_id >= {_CDF_DEL_LO} AND doc_id < {_CDF_DEL_HI})
        ) v
        LEFT JOIN ({_dedup_maintain_oracle()}) c ON c.node = v.doc_id
        LEFT JOIN ({_ivf_hist_assign_oracle()}) a ON a.vec_id = v.doc_id
        LEFT JOIN ({_pq_maintain_oracle()}) p ON p.vec_id = v.doc_id
        ORDER BY v.doc_id
    """


@register(
    "curation_multi_index_advance",
    oracle=_multi_index_oracle(),
    tags=("llm", "dedup", "similarity", "ivf", "pq", "incremental",
          "txnlog", "cdc", "capstone"),
)
def curation_multi_index_advance(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """ONE maintenance loop advancing every curation index from the
    change feeds of a paired documents+embeddings chain (same three
    commits on both: history, increment, takedown of ids
    [_CDF_DEL_LO, _CDF_DEL_HI)).

    v1 state stands for the persisted artifacts: LSH band index +
    component assignment (dedup), frozen coarse quantizer + cell lists
    (IVF), frozen codebooks + code store (PQ). Each advance reads the two
    feeds ONCE and pushes all three states through their maintenance
    steps — insert docs get signatures/assignments/encodings computed on
    the increment alone, deleted ids retract from every index by
    anti-join, and only dedup components containing a deleted doc
    re-resolve. The returned frame is the cross-index curation view:
    visible ids full-outer-joined with all three states, so the oracle's
    hash gate doubles as the consistency proof (see module docstring).

    Oracle: from-scratch recompute of all three indexes at head
    (_multi_index_oracle) — exact, not rows-only."""
    from nyc_analytics_database_platform_spark.operators import txnlog

    doc_root = build_documents_commit_chain(spark, sf_dir)
    emb_root = build_embeddings_commit_chain(spark, sf_dir)

    def vecs(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )

    # v1: the PERSISTED index artifacts — the band index / assignment,
    # the frozen coarse quantizer, and the frozen PQ codebooks are each a
    # stamped parquet artifact shared with the per-index maintenance
    # queries (persisted_v1_dedup_state, frozen_history_quantizer,
    # frozen_history_codebooks); retraining is a separate OPTIMIZE-commit
    # (ann_quantizer_refresh_commit), never a maintenance step.
    band, assign = persisted_v1_dedup_state(spark, sf_dir)
    emb1 = vecs(txnlog.read_version(spark, emb_root, 1)
                .select("vec_id", "embedding"))
    cents = frozen_history_quantizer(spark, sf_dir)
    cells = assign_clusters(emb1, cents)
    books = frozen_history_codebooks(spark, sf_dir)
    codes = encode_code_strings(emb1, books)

    for v in (2, 3):
        dfeed = txnlog.changes_between(spark, doc_root, v - 1, v,
                                       ["doc_id", "text"])
        efeed = txnlog.changes_between(spark, emb_root, v - 1, v,
                                       ["vec_id", "embedding"])
        band, assign = maintain_clusters_from_feed(spark, band, assign,
                                                   dfeed)
        # Like the dedup step (which checkpoints internally), each state
        # is the persisted artifact between advances — truncate lineage
        # so plan size stays O(one advance).
        cells = maintain_cells_from_feed(cells, cents, efeed) \
            .localCheckpoint(eager=True)
        codes = maintain_codes_from_feed(codes, books, efeed) \
            .localCheckpoint(eager=True)

    visible = txnlog.read_version(spark, doc_root).select("doc_id")
    return (
        visible.withColumn("live", F.lit(1).cast("int"))
        .join(assign.select(F.col("node").alias("doc_id"), "component"),
              "doc_id", "full_outer")
        .join(cells.select(F.col("vec_id").alias("doc_id"),
                           F.col("c_id").cast("int").alias("cell")),
              "doc_id", "full_outer")
        .join(codes.select(F.col("vec_id").alias("doc_id"), "codes"),
              "doc_id", "full_outer")
        .select("doc_id", "live", "component", "cell", "codes")
        .orderBy("doc_id")
    )


# --- embedding model migration (round 13) ------------------------------------

_MIG_WAVE1, _MIG_WAVE2 = 250, 400  # ids < W1 migrate in v2, [W1, W2) in v3


def _model_migration_oracle() -> str:
    """Routed dual-read recompute: m2 = the deterministic stand-in
    re-embedding (adjacent-pair means, 64 -> 32 dims, 6dp per component —
    a real deployment calls the new model here; the routing/commit
    machinery is what this query attests), routed over m1 for every
    migrated id. `wave` mirrors which migration commit produced the row —
    the Spark side derives it from the ACTUAL change feeds, so a hash
    match proves the waves landed as their own commits."""
    return f"""
        WITH m1 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        mig AS (
            SELECT vec_id,
                   list_transform(
                       generate_series(1, len(v) // 2),
                       i -> round((v[2*i - 1] + v[2*i]) / 2, 6)
                   ) AS v
            FROM m1 WHERE vec_id < {_MIG_WAVE2}
        ),
        routed AS (
            SELECT vec_id, 'm2' AS model_id, v,
                   CASE WHEN vec_id < {_MIG_WAVE1} THEN 2 ELSE 3 END AS wave
            FROM mig
            UNION ALL
            SELECT vec_id, 'm1' AS model_id, v, NULL AS wave
            FROM m1
            WHERE NOT EXISTS (SELECT 1 FROM mig WHERE mig.vec_id = m1.vec_id)
        )
        SELECT vec_id, model_id, CAST(len(v) AS INT) AS dim,
               round(list_sum(v), 6) AS emb_sum,
               CAST(wave AS INT) AS wave
        FROM routed
        ORDER BY vec_id
    """


def reembed_m2(df: DataFrame) -> DataFrame:
    """The deterministic stand-in for 'call the new embedding model':
    64-dim m1 vectors become 32-dim m2 vectors by adjacent-pair means,
    each component rounded at 6dp so both engines agree exactly. Input
    and output carry (vec_id, v)."""
    n2 = F.floor(F.size("v") / F.lit(2)).cast("int")
    return df.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(1), n2),
            lambda i: F.round(
                (F.element_at("v", (i * 2 - 1).cast("int"))
                 + F.element_at("v", (i * 2).cast("int"))) / 2, 6),
        ).alias("v"),
    )


@register(
    "embedding_model_migration_routed",
    oracle=_model_migration_oracle(),
    tags=("llm", "similarity", "txnlog", "cdc", "lifecycle", "migration"),
)
def embedding_model_migration_routed(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Embedding MODEL UPGRADE mid-transition (VERDICT r12 #6): the last
    vector-store lifecycle gap — a new embedding model changes dimension
    and semantics, and 100 TB of vectors cannot re-embed in one commit.

    The versioned store carries (vec_id, model_id, embedding). v1 = the
    whole corpus under the old model m1. Each migration WAVE re-embeds
    one id-slice — reading ONLY that slice's m1 rows (file-pruned range
    scan of the index table, not a corpus rescan) — and commits the m2
    rows as ONE append whose change feed is exactly the wave (v2 = ids
    < _MIG_WAVE1, v3 = [_MIG_WAVE1, _MIG_WAVE2); ids >= _MIG_WAVE2 are
    still un-migrated at head, the realistic mid-transition state).

    The query returns the DUAL-READ ROUTED VIEW consumers use during the
    transition: per id, the m2 row when it exists else the m1 row
    (anti-join routing — no window, no driver-side state), plus `wave`
    derived from the ACTUAL change feeds across the migration commits —
    so the oracle hash gate attests the routing AND that each wave
    landed as its own CDC-visible commit. Per-model index maintenance
    stays feed-driven (tests/test_model_migration.py maintains an
    m2-only IVF index purely from these feeds). Mirrors
    schema_evolution_merged_read (parity_etl.py) on the vector side."""
    import shutil

    from nyc_analytics_database_platform_spark import layouts
    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.operators import txnlog

    root = layouts.scratch(sf_dir, "txnlog", "embmigrate")
    marker = root + "_done"
    stamp = layouts.source_stamp(
        sf_dir, "embeddings",
        spec=f"embmigrate:{_MIG_WAVE1}:{_MIG_WAVE2}")
    if not (layouts.is_fresh(marker, stamp) and txnlog.chain_intact(root)):
        shutil.rmtree(root, ignore_errors=True)
        m1 = load(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        # The fixed wave cuts encode "mid-transition at head": ids >=
        # _MIG_WAVE2 must exist to stay un-migrated. Fail loudly if the
        # testdata ever shrinks below the constants rather than silently
        # attesting a fully-migrated (wave-2-empty) chain.
        n_max = m1.agg(F.max("vec_id")).collect()[0][0]
        if n_max is None or n_max < _MIG_WAVE2:
            raise ValueError(
                f"embeddings max vec_id {n_max} < _MIG_WAVE2 "
                f"{_MIG_WAVE2}: migration chain needs an un-migrated tail"
            )
        txnlog.append(
            spark, root,
            m1.select("vec_id", F.lit("m1").alias("model_id"), "v"),
            range_col="vec_id", n_files=4)
        # Migration waves: each reads ONLY its slice's m1 rows back from
        # the store (range-pruned) and appends the re-embedded m2 rows.
        for lo, hi in ((0, _MIG_WAVE1), (_MIG_WAVE1, _MIG_WAVE2)):
            src = (
                txnlog.read_version(spark, root)
                .filter((F.col("model_id") == "m1")
                        & (F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
                .select("vec_id", "v")
            )
            txnlog.append(
                spark, root,
                reembed_m2(src).select(
                    "vec_id", F.lit("m2").alias("model_id"), "v"),
                range_col="vec_id", n_files=2)
        layouts.mark_fresh(marker, stamp)

    head_df = txnlog.read_version(spark, root)
    m2_rows = head_df.filter(F.col("model_id") == "m2")
    routed = m2_rows.unionByName(
        head_df.filter(F.col("model_id") == "m1")
        .join(m2_rows.select("vec_id"), "vec_id", "left_anti")
    )
    # Wave attribution from the actual feeds — not from the id ranges.
    waves = None
    for v in (2, 3):
        feed = (
            txnlog.changes_between(spark, root, v - 1, v,
                                   ["vec_id", "model_id"])
            .filter((F.col("change_type") == "insert")
                    & (F.col("model_id") == "m2"))
            .select("vec_id", F.lit(v).cast("int").alias("wave"),
                    F.lit("m2").alias("model_id"))
        )
        waves = feed if waves is None else waves.unionByName(feed)
    return (
        routed.join(waves, ["vec_id", "model_id"], "left")
        .select(
            "vec_id", "model_id",
            F.size("v").cast("int").alias("dim"),
            F.round(
                F.aggregate("v", F.lit(0.0), lambda a, x: a + x), 6
            ).alias("emb_sum"),
            "wave",
        )
        .orderBy("vec_id")
    )


# --- streaming multi-index ingest (round 13) ---------------------------------

def _stream_multi_index_oracle() -> str:
    """From-scratch recompute of both streamed index surfaces over the
    WHOLE corpus: frozen-quantizer cell assignment per vector, and the
    per-doc count of DISTINCT LSH candidate partners from the full
    minhash band index. A hash match proves no micro-batch was lost or
    double-indexed on EITHER surface and that the per-batch signature
    computation equals the corpus-wide one (minhash signatures are
    per-doc, so streaming ingestion is exact, not approximate)."""
    from nyc_analytics_database_platform_spark.queries.llm_dedup import (
        _minhash_oracle,
    )

    edges_sql = _minhash_oracle().rsplit("ORDER BY", 1)[0]
    return f"""
        SELECT d.doc_id, a.cell,
               CAST(COALESCE(p.n, 0) AS BIGINT) AS n_partners
        FROM (SELECT doc_id FROM documents) d
        JOIN ({_ivf_hist_assign_oracle(visible_pred="TRUE")}) a
          ON a.vec_id = d.doc_id
        LEFT JOIN (
            WITH edges AS ({edges_sql}),
            und AS (
                SELECT a_id AS x, b_id AS y FROM edges
                UNION ALL
                SELECT b_id AS x, a_id AS y FROM edges
            )
            SELECT x AS doc_id, COUNT(DISTINCT y) AS n
            FROM und GROUP BY x
        ) p ON p.doc_id = d.doc_id
        ORDER BY d.doc_id
    """


@register(
    "stream_multi_index_ingest",
    oracle=_stream_multi_index_oracle(),
    tags=("llm", "dedup", "similarity", "ivf", "streaming",
          "exactly-once", "txnlog", "capstone"),
)
def stream_multi_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the multi-index curation loop: paired
    documents+embeddings rows (joined on the shared id) arrive as
    chronological micro-batches, and each batch lands in BOTH index
    surfaces through the exactly-once transactional sink — minhash band
    rows into a versioned band-index table, frozen-quantizer cell
    assignments into a versioned cell-list table — with the SAME batch_id
    committed idempotently per surface, so a crash between the two
    commits redelivers the batch and only the missing surface applies it.
    Composition: at-least-once streaming delivery x per-surface
    exactly-once txnlog sinks x per-doc index computation (minhash
    signatures and coarse assignment depend only on the row, never the
    corpus) = O(batch) multi-index ingestion whose result is EXACTLY the
    batch-built index. curation_multi_index_advance is the CDC/read-side
    twin (cluster resolution stays a maintenance query over the band
    index — the production split between ingest and maintenance).

    Output per doc: its cell and its count of distinct LSH candidate
    partners read from the STREAMED indexes; oracle recomputes both from
    the full corpus."""
    import hashlib as _hl
    import os
    import shutil
    import tempfile

    from nyc_analytics_database_platform_spark import layouts
    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.operators import txnlog
    from nyc_analytics_database_platform_spark.operators.dedup import (
        banded_buckets,
        minhash_signatures,
    )
    from nyc_analytics_database_platform_spark.queries.llm_clusters import (
        _band_pairs,
    )
    from nyc_analytics_database_platform_spark.queries.streaming_stateful import (
        _stage_ordered_files,
        drain_or_raise,
    )

    root_b = layouts.scratch(sf_dir, "txnlog", "mistream_bands")
    root_c = layouts.scratch(sf_dir, "txnlog", "mistream_cells")
    marker = root_b + "_done"
    stamp = layouts.source_stamp(sf_dir, "documents", "embeddings",
                                 spec="mistream:12:5:2")
    if not (layouts.is_fresh(marker, stamp)
            and txnlog.chain_intact(root_b)
            and txnlog.chain_intact(root_c)):
        shutil.rmtree(root_b, ignore_errors=True)
        shutil.rmtree(root_c, ignore_errors=True)
        cents = frozen_history_quantizer(spark, sf_dir)
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        emb = load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding")
        paired = docs.join(emb, "doc_id")
        n_max = paired.agg(F.max("doc_id")).collect()[0][0]
        c1, c2 = n_max // 3, 2 * n_max // 3
        stages = [
            paired.filter(F.col("doc_id") <= c1),
            paired.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2)),
            paired.filter(F.col("doc_id") > c2),
        ]
        tag = _hl.md5((sf_dir + ":mistream").encode()).hexdigest()[:8]
        scratch = os.path.join(tempfile.gettempdir(), "spark_graft_stream",
                               tag)
        src_dir = os.path.join(scratch, "files")
        _stage_ordered_files(scratch, src_dir, stages)

        def sink(bdf: DataFrame, bid: int) -> None:
            # Two surfaces, one batch id: each commit is idempotent on its
            # own root, so a redelivery after a crash between them no-ops
            # the surface that landed and applies the one that did not.
            bands = banded_buckets(
                minhash_signatures(bdf.select("doc_id", "text"),
                                   num_perm=12, k=5),
                num_perm=12, rows_per_band=2,
            )
            txnlog.commit_stream_batch(spark, root_b, bands, bid,
                                       range_col="doc_id", n_files=1)
            from nyc_analytics_database_platform_spark.operators.kmeans import (
                assign_clusters,
            )

            cells = assign_clusters(
                bdf.select(
                    F.col("doc_id").alias("vec_id"),
                    F.col("embedding").cast("array<double>").alias("v"),
                ),
                cents,
            ).select("vec_id", F.col("c_id").cast("int").alias("cell"))
            txnlog.commit_stream_batch(spark, root_c, cells, bid,
                                       range_col="vec_id", n_files=1)

        q = (
            spark.readStream.schema(
                "doc_id long, text string, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            drain_or_raise(q, "streaming multi-index ingest")
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        layouts.mark_fresh(marker, stamp)

    bands = txnlog.read_version(spark, root_b)
    cells = txnlog.read_version(spark, root_c)
    pairs = _band_pairs(bands)
    partners = (
        pairs.select(F.col("a_id").alias("doc_id"),
                     F.col("b_id").alias("partner"))
        .unionByName(pairs.select(F.col("b_id").alias("doc_id"),
                                  F.col("a_id").alias("partner")))
        .groupBy("doc_id")
        .agg(F.countDistinct("partner").alias("n_partners"))
    )
    return (
        cells.select(F.col("vec_id").alias("doc_id"), "cell")
        .join(partners, "doc_id", "left")
        .select("doc_id", "cell",
                F.coalesce("n_partners", F.lit(0)).alias("n_partners"))
        .orderBy("doc_id")
    )
