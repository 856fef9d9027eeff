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

from nyc_analytics_database_platform_spark.operators.dedup import (
    banded_buckets,
    minhash_signatures,
)
from nyc_analytics_database_platform_spark.operators.graph import (
    connected_components,
)
from nyc_analytics_database_platform_spark.operators.kmeans import kmeans_fit
from nyc_analytics_database_platform_spark.operators.pq import pq_fit
from nyc_analytics_database_platform_spark.queries.llm_clusters import (
    _band_pairs,
    _CDF_DEL_HI,
    _CDF_DEL_LO,
    _dedup_maintain_oracle,
    build_documents_commit_chain,
    maintain_clusters_from_feed,
)
from nyc_analytics_database_platform_spark.queries.llm_ivf import (
    _ITERS as _IVF_ITERS,
    _ivf_hist_assign_oracle,
    _K as _IVF_K,
    build_embeddings_commit_chain,
    maintain_cells_from_feed,
)
from nyc_analytics_database_platform_spark.queries.llm_pq import (
    _ITERS as _PQ_ITERS,
    _K as _PQ_K,
    _M as _PQ_M,
    _pq_maintain_oracle,
    encode_code_strings,
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

    # v1: the persisted index artifacts, rebuilt here because driver
    # testdata is read-only (each quantizer/codebook is then FROZEN —
    # retraining is a separate OPTIMIZE-commit, not a maintenance step).
    docs1 = txnlog.read_version(spark, doc_root, 1).select("doc_id", "text")
    band = banded_buckets(minhash_signatures(docs1, num_perm=12, k=5),
                          num_perm=12, rows_per_band=2)
    assign = connected_components(_band_pairs(band))

    emb1 = vecs(txnlog.read_version(spark, emb_root, 1)
                .select("vec_id", "embedding"))
    cents, cells = kmeans_fit(emb1, _IVF_K, _IVF_ITERS)
    cents = cents.localCheckpoint(eager=True)
    books, _ = pq_fit(emb1, _PQ_M, _PQ_K, _PQ_ITERS)
    books = books.localCheckpoint(eager=True)
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
