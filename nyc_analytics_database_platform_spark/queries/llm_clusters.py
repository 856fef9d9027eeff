"""Near-duplicate clustering: MinHash candidate pairs -> connected
components -> canonical keep/drop decision per cluster.

This is the step that makes dedup actionable: pairs say "these two are
similar"; components say "these N docs are one group - keep the canonical
one". The Spark side is an iterative label-propagation loop (non-SQL-
expressible per se); the DuckDB oracle reproduces it with a recursive CTE
over the same md5-derived candidate edges, so even the iterative operator
gets an exact cross-engine check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.functions.text import ws_tokens
from nyc_analytics_database_platform_spark.operators.dedup import (
    banded_buckets,
    lsh_candidate_pairs,
    minhash_signatures,
)
from nyc_analytics_database_platform_spark.operators.graph import (
    connected_components,
    incremental_components,
)
from nyc_analytics_database_platform_spark.queries.llm_dedup import (
    _SPLIT_ID,
    _minhash_oracle,
)
from nyc_analytics_database_platform_spark.registry import register

# The candidate-pair SQL is the minhash oracle minus its ORDER BY.
_EDGES_SQL = _minhash_oracle().rsplit("ORDER BY", 1)[0]


@register(
    "dedup_minhash_clusters",
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        und AS (
            SELECT a_id AS src, b_id AS dst FROM edges
            UNION
            SELECT b_id AS src, a_id AS dst FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM und
            UNION
            SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
        ),
        members AS (
            SELECT src AS node, dst FROM reach
            UNION
            SELECT src AS node, src AS dst FROM und
        )
        SELECT node, MIN(dst) AS component
        FROM members
        GROUP BY node
        ORDER BY node
    """,
    tags=("llm", "dedup", "iterative"),
    bench=True,
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH candidate pairs: every doc
    appearing in a candidate pair is labeled with its cluster's minimum
    doc_id (= the canonical survivor; the rest are the drop set)."""
    docs = load(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(docs, num_perm=12, k=5))
    return connected_components(pairs).orderBy("node")


@register(
    "dedup_incremental_clusters",
    # the full-recompute recursive CTE over ALL candidate pairs: the
    # incremental path must reproduce it EXACTLY (same rows, same labels)
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        und AS (
            SELECT a_id AS src, b_id AS dst FROM edges
            UNION
            SELECT b_id AS src, a_id AS dst FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM und
            UNION
            SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
        ),
        members AS (
            SELECT src AS node, dst FROM reach
            UNION
            SELECT src AS node, src AS dst FROM und
        )
        SELECT node, MIN(dst) AS component
        FROM members
        GROUP BY node
        ORDER BY node
    """,
    tags=("llm", "dedup", "iterative", "incremental"),
)
def dedup_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster MAINTENANCE under a corpus increment - the production mode
    (operators/graph.incremental_components): docs below doc_id _SPLIT_ID
    (450, shared with llm_dedup) stand for the already-clustered history
    (their assignment would be a persisted table; recomputed here because
    the driver testdata is read-only), docs at/above it are the new batch.
    New candidate pairs (any pair touching a new doc) merge into the old
    assignment via star edges over TOUCHED components only - work bounded
    by the increment, not the corpus - and the oracle is the full
    recursive-CTE recompute over ALL pairs, so the driver attests exact
    equivalence of the incremental and from-scratch paths."""
    docs = load(spark, sf_dir, "documents")
    old_docs = docs.filter(F.col("doc_id") < _SPLIT_ID)
    old_pairs = lsh_candidate_pairs(
        minhash_signatures(old_docs, num_perm=12, k=5)
    )
    old_assign = connected_components(old_pairs)
    all_pairs = lsh_candidate_pairs(
        minhash_signatures(docs, num_perm=12, k=5)
    )
    new_edges = all_pairs.filter(
        (F.col("a_id") >= _SPLIT_ID) | (F.col("b_id") >= _SPLIT_ID)
    )
    return incremental_components(old_assign, new_edges).orderBy("node")


_LEAK_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _leak_split_sql(node: str) -> str:
    from nyc_analytics_database_platform_spark.operators.sampling import (
        hex_threshold,
    )

    draw = f"substr(md5(CAST({node} AS VARCHAR)), 1, 8)"
    return (
        f"CASE WHEN {draw} < '{hex_threshold(0.8)}' THEN 'train' "
        f"WHEN {draw} < '{hex_threshold(0.9)}' THEN 'val' "
        f"ELSE 'test' END"
    )


@register(
    "split_leakage_audit",
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        und AS (
            SELECT a_id AS src, b_id AS dst FROM edges
            UNION
            SELECT b_id AS src, a_id AS dst FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM und
            UNION
            SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
        ),
        members AS (
            SELECT src AS node, dst FROM reach
            UNION
            SELECT src AS node, src AS dst FROM und
        ),
        comp AS (
            SELECT node, MIN(dst) AS component FROM members GROUP BY node
        ),
        sp AS (
            SELECT node, component, {_leak_split_sql("node")} AS split
            FROM comp
        ),
        agg AS (
            SELECT component,
                   CAST(COUNT(*) AS BIGINT) AS cluster_size,
                   CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
                   CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
                   CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
            FROM sp GROUP BY component
        )
        SELECT component, cluster_size, n_train, n_val, n_test
        FROM agg
        WHERE CAST(n_train > 0 AS INT) + CAST(n_val > 0 AS INT)
              + CAST(n_test > 0 AS INT) >= 2
        ORDER BY component
    """,
    tags=("llm", "dedup", "sampling", "iterative", "audit"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-integrity audit: near-duplicate clusters whose members land in
    MORE THAN ONE train/val/test split - the data-leakage failure mode
    where a held-out document's near-copy sits in the training set and
    inflates eval scores. Composes two attested operators: the MinHash-LSH
    connected components (cluster labels) and the hash-band split
    assignment of train_val_test_split_report (same 80/10/10 thresholds,
    same md5 draw), so the audit reports leaks in EXACTLY the splits the
    pipeline would produce. The fix it motivates is cluster-level split
    assignment (split by component, not by doc).

    Scale: the component frame is candidate-pair-bounded (tiny next to
    the corpus); split assignment is a narrow expression; the per-cluster
    aggregate shuffles only cluster labels. The split-spanning test uses
    integer presence flags, not COUNT DISTINCT - no Expand."""
    from nyc_analytics_database_platform_spark.operators.sampling import (
        split_column,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(docs, num_perm=12, k=5))
    comp = connected_components(pairs)
    sp = comp.withColumn("split", split_column(F.col("node"), _LEAK_SPLITS))
    agg = sp.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.count(F.when(F.col("split") == "train", 1)).alias("n_train"),
        F.count(F.when(F.col("split") == "val", 1)).alias("n_val"),
        F.count(F.when(F.col("split") == "test", 1)).alias("n_test"),
    )
    spans = (
        (F.col("n_train") > 0).cast("int")
        + (F.col("n_val") > 0).cast("int")
        + (F.col("n_test") > 0).cast("int")
    )
    return agg.filter(spans >= 2).orderBy("component")


@register(
    "cluster_split_assignment",
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        und AS (
            SELECT a_id AS src, b_id AS dst FROM edges
            UNION
            SELECT b_id AS src, a_id AS dst FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM und
            UNION
            SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
        ),
        members AS (
            SELECT src AS node, dst FROM reach
            UNION
            SELECT src AS node, src AS dst FROM und
        ),
        comp AS (
            SELECT node, MIN(dst) AS component FROM members GROUP BY node
        ),
        labeled AS (
            SELECT d.doc_id, d.n_chars,
                   COALESCE(c.component, d.doc_id) AS label
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
        )
        SELECT {_leak_split_sql("label")} AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM labeled
        GROUP BY split
        ORDER BY split
    """,
    tags=("llm", "dedup", "sampling", "iterative"),
)
def cluster_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIX split_leakage_audit motivates: assign train/val/test by the
    hash of each document's near-dup CLUSTER LABEL (its component's
    canonical min id; singletons label themselves), so an entire duplicate
    cluster lands in one split and cross-split leakage is impossible BY
    CONSTRUCTION - the standard remedy once a leakage audit fires.
    Reports the resulting split sizes (they drift slightly from 80/10/10
    because clusters move as units - that drift is the price of
    integrity, visible in the output).

    Scale: components are candidate-pair-bounded; the corpus-side work is
    one left join against that small label frame (broadcastable at any
    realistic dup rate) + a narrow hash expression + a 3-group aggregate."""
    from nyc_analytics_database_platform_spark.operators.sampling import (
        split_column,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(docs, num_perm=12, k=5))
    comp = connected_components(pairs)
    labeled = docs.select("doc_id", "n_chars").join(
        F.broadcast(comp.withColumnRenamed("node", "doc_id")), "doc_id", "left"
    )
    return (
        labeled.withColumn(
            "split",
            split_column(
                F.coalesce(F.col("component"), F.col("doc_id")), _LEAK_SPLITS
            ),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "dedup_keep_longest_survivors",
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        und AS (
            SELECT a_id AS src, b_id AS dst FROM edges
            UNION
            SELECT b_id AS src, a_id AS dst FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM und
            UNION
            SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
        ),
        members AS (
            SELECT src AS node, dst FROM reach
            UNION
            SELECT src AS node, src AS dst FROM und
        ),
        comp AS (
            SELECT node, MIN(dst) AS component FROM members GROUP BY node
        ),
        ranked AS (
            SELECT c.component, c.node, d.n_chars,
                   row_number() OVER (
                       PARTITION BY c.component
                       ORDER BY d.n_chars DESC, c.node) AS rk,
                   COUNT(*) OVER (PARTITION BY c.component) AS cluster_size
            FROM comp c JOIN documents d ON d.doc_id = c.node
        )
        SELECT component, node AS survivor_id, n_chars,
               CAST(cluster_size AS BIGINT) AS cluster_size
        FROM ranked WHERE rk = 1
        ORDER BY component
    """,
    tags=("llm", "dedup", "iterative"),
)
def dedup_keep_longest_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup KEEP POLICY: one survivor per MinHash cluster, chosen by
    max character count (tie: lowest doc_id) - real pipelines keep the
    best document from each duplicate cluster, not the smallest id (the
    canonical-min label stays the cluster KEY; the keep rule is a policy
    on top). One per-cluster argmax over the cluster labels joined to the
    doc metadata - the labels frame is tiny relative to the corpus, and
    the argmax is a WindowGroupLimit-shaped rank filter partitioned by
    component."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(docs, num_perm=12, k=5))
    comp = connected_components(pairs)
    meta = docs.select(F.col("doc_id").alias("node"), "n_chars")
    joined = comp.join(meta, "node")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("node")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("component")),
        )
        .filter(F.col("rk") == 1)
        .select(
            "component",
            F.col("node").alias("survivor_id"),
            "n_chars",
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
        .orderBy("component")
    )


_CTFIDF_TOP = 5


@register(
    "cluster_topic_terms_ctfidf",
    oracle=f"""
        WITH toks AS (
            SELECT e.label, u.tok
            FROM documents d
            JOIN embeddings e ON e.vec_id = d.doc_id,
            unnest(string_split_regex(lower(trim(d.text)), '\\s+')) AS u(tok)
            WHERE d.text IS NOT NULL AND length(trim(d.text)) > 0
        ),
        tf AS (
            SELECT label, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY 1, 2
        ),
        f AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS f FROM tf GROUP BY 1),
        a AS (
            SELECT SUM(tf) / CAST(COUNT(DISTINCT label) AS DOUBLE) AS avg_class
            FROM tf
        ),
        scored AS (
            SELECT t.label, t.tok, t.tf,
                   round(t.tf * ln(1 + a.avg_class / f.f), 6) AS score
            FROM tf t JOIN f ON f.tok = t.tok, a
        ),
        ranked AS (
            SELECT label, tok, tf, score,
                   ROW_NUMBER() OVER (PARTITION BY label
                                      ORDER BY score DESC, tok) AS rk
            FROM scored
        )
        SELECT label, CAST(rk AS INT) AS rk, tok AS term, tf, score
        FROM ranked WHERE rk <= {_CTFIDF_TOP}
        ORDER BY label, rk
    """,
    tags=("llm", "clustering", "text"),
)
def cluster_topic_terms_ctfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster LABELING via class-based TF-IDF (the BERTopic c-TF-IDF
    rule): treat each embedding cluster as one meta-document, score term t
    in class c as tf(t,c) * ln(1 + A / f(t)) with A = average tokens per
    class and f(t) the corpus-wide term count, and emit the top-5 terms
    per cluster - the human-readable topic names for the semantic-dedup /
    IVF cluster artifacts. The one ln is computed on (double-div, ln,
    round 6dp after the integer tf multiply); ranking is on the ROUNDED
    score with a term tie-break, so the cut is deterministic cross-engine.

    Scale: tokens aggregate to (label, term) - map-side combinable - and
    term totals derive FROM that aggregate (never a second corpus pass);
    the rank is a WindowGroupLimit over the bounded label domain."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    toks = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select("label", F.explode(ws_tokens("text")).alias("tok"))
    )
    tf = toks.groupBy("label", "tok").agg(F.count("*").alias("tf"))
    fdf = tf.groupBy("tok").agg(F.sum("tf").alias("f"))
    a = tf.agg(
        (
            F.sum("tf") / F.countDistinct("label").cast("double")
        ).alias("avg_class")
    )
    scored = (
        tf.join(fdf, "tok")
        .crossJoin(F.broadcast(a))
        .select(
            "label",
            "tok",
            "tf",
            F.round(
                F.col("tf") * F.log(1 + F.col("avg_class") / F.col("f")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CTFIDF_TOP)
        .select(
            "label",
            F.col("rk").cast("int").alias("rk"),
            F.col("tok").alias("term"),
            "tf",
            "score",
        )
        .orderBy("label", "rk")
    )


# --- CDC-driven dedup maintenance (round 11) --------------------------------
#
# The two halves existed separately: table_changes_feed (the txnlog CDC
# feed, parity_versioned.py) and dedup_incremental_clusters (warm-start
# component maintenance, above). This query closes the 100 TB curation
# loop END-TO-END: the LSH cluster state is maintained purely from the
# version-to-version change feed of a versioned documents table — inserts
# extend the band index and merge via star-edge warm start, deletes
# (a takedown / license retraction) retract the removed docs' band rows
# and re-resolve ONLY the touched components. No step rescans the corpus.

_CDF_DEL_LO, _CDF_DEL_HI = 100, 200  # v3 retracts this doc_id range


def build_documents_commit_chain(
    spark: SparkSession, sf_dir: str, variant: str = "docs"
) -> str:
    """Three-commit documents chain: v1 = history (doc_id < _SPLIT_ID,
    the already-clustered corpus), v2 = the increment (doc_id >=
    _SPLIT_ID), v3 = copy-on-write retraction of [_CDF_DEL_LO,
    _CDF_DEL_HI). Freshness-stamped + chain_intact-gated like the orders
    chain (parity_versioned.build_orders_commit_chain)."""
    import shutil

    from nyc_analytics_database_platform_spark import layouts
    from nyc_analytics_database_platform_spark.operators import txnlog

    root = layouts.scratch(sf_dir, "txnlog", variant)
    marker = root + "_done"
    stamp = layouts.source_stamp(
        sf_dir, "documents",
        spec=f"docchain:{_SPLIT_ID}:{_CDF_DEL_LO}:{_CDF_DEL_HI}:{variant}",
    )
    if layouts.is_fresh(marker, stamp) and txnlog.chain_intact(root):
        return root
    shutil.rmtree(root, ignore_errors=True)
    docs = load(spark, sf_dir, "documents")
    txnlog.append(spark, root, docs.filter(F.col("doc_id") < _SPLIT_ID),
                  range_col="doc_id", n_files=4)
    txnlog.append(spark, root, docs.filter(F.col("doc_id") >= _SPLIT_ID),
                  range_col="doc_id", n_files=2)
    txnlog.delete_range_cow(spark, root, "doc_id", _CDF_DEL_LO, _CDF_DEL_HI)
    layouts.mark_fresh(marker, stamp)
    return root


def _band_pairs(bb: DataFrame, other: DataFrame | None = None) -> DataFrame:
    """Distinct candidate edges (a_id < b_id) between `bb`'s docs and
    `other`'s (default: bb itself) — docs sharing any (band, bucket)."""
    a = bb.select(F.col("doc_id").alias("a_id"), "band", "bucket")
    b = (other if other is not None else bb).select(
        F.col("doc_id").alias("b_id"), "band", "bucket"
    )
    lo = F.least("a_id", "b_id")
    hi = F.greatest("a_id", "b_id")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select(lo.alias("a_id"), hi.alias("b_id"))
        .distinct()
    )


def _dedup_maintain_oracle() -> str:
    """Full recompute at the HEAD version: recursive-CTE components over
    candidate edges of exactly the docs visible at v3 — a hash match
    proves the CDC-driven incremental maintenance (insert merge + delete
    retraction) lost nothing and resurrected nothing. Module-level so the
    multi-index capstone (llm_curation) composes the SAME component
    oracle instead of restating it."""
    edges_sql = _minhash_oracle(
        where=f"WHERE NOT (doc_id >= {_CDF_DEL_LO} "
              f"AND doc_id < {_CDF_DEL_HI})"
    ).rsplit("ORDER BY", 1)[0]
    return f"""
        WITH RECURSIVE edges AS ({edges_sql}),
        und AS (
            SELECT a_id AS src, b_id AS dst FROM edges
            UNION
            SELECT b_id AS src, a_id AS dst FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM und
            UNION
            SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
        ),
        members AS (
            SELECT src AS node, dst FROM reach
            UNION
            SELECT src AS node, src AS dst FROM und
        )
        SELECT node, MIN(dst) AS component
        FROM members
        GROUP BY node
        ORDER BY node
    """


@register(
    "dedup_maintain_from_cdf",
    oracle=_dedup_maintain_oracle(),
    tags=("llm", "dedup", "incremental", "txnlog", "cdc", "iterative"),
)
def dedup_maintain_from_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH dedup index + cluster assignment maintained FROM THE CHANGE
    FEED of a versioned documents table — the end-to-end 100 TB curation
    loop (VERDICT r10 #4).

    v1 state stands for the persisted artifacts (band index + component
    assignment; recomputed here because driver testdata is read-only).
    Advance to v2 reads ONLY the feed's inserted docs: signatures for the
    increment alone, new band rows appended to the index, new edges =
    increment bands probed against the updated index, merged via
    star-edge warm start over touched components
    (operators/graph.incremental_components). Advance to v3 reads ONLY
    the feed's deleted docs: their band rows retract from the index, and
    ONLY components containing a deleted doc re-resolve (from the
    surviving members' band rows); every untouched component passes
    through by reference. Work per advance is O(changed docs + touched
    components) — the corpus is never rescanned.

    Oracle: from-scratch recursive-CTE components over the docs visible
    at the HEAD version, so the driver attests exact equivalence of the
    incremental path and the full recompute."""
    from nyc_analytics_database_platform_spark.operators import txnlog

    root = build_documents_commit_chain(spark, sf_dir)
    cols = ["doc_id", "text"]

    # v1: the persisted state (band index + assignment) read from the
    # parquet artifacts (persisted_v1_dedup_state) — not re-hashed here.
    band, assign = persisted_v1_dedup_state(spark, sf_dir)

    # Each version's feed advances (index, assignment) through the SAME
    # general step (maintain_clusters_from_feed): v1 -> v2 is pure-insert
    # (star-edge warm start), v2 -> v3 pure-delete (touched-component
    # retraction); the step handles mixed feeds too, and the randomized
    # chain fuzzer drives it through arbitrary interleavings
    # (tests/test_differential_fuzz.py, incremental == full recompute).
    for v in (2, 3):
        feed = txnlog.changes_between(spark, root, v - 1, v, cols)
        band, assign = maintain_clusters_from_feed(spark, band, assign, feed)
    return assign.select("node", "component").orderBy("node")


def persisted_v1_dedup_state(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The persisted dedup-index ARTIFACTS for the documents HISTORY
    (doc_id < _SPLIT_ID): the LSH band index and the component
    assignment, written to parquet under layouts.scratch and stamped by
    the documents source + LSH constants — the text-side sibling of
    llm_ivf.frozen_history_quantizer (ADVICE r13: the maintenance family
    shares one persisted v1 state instead of re-hashing the history per
    consumer). md5-derived signatures and min-label components are
    deterministic, so artifact == recompute exactly."""
    from nyc_analytics_database_platform_spark import layouts

    base = layouts.scratch(sf_dir, "artifact", "dedup_v1")
    band_path = base + "_band"
    assign_path = base + "_assign"
    marker = base + "_done"
    stamp = layouts.source_stamp(
        sf_dir, "documents", spec=f"dedupv1:{_SPLIT_ID}:12:5:2")
    if not (layouts.is_fresh(marker, stamp)
            and layouts.has_parquet(band_path)
            and layouts.has_parquet(assign_path)):
        docs1 = load(spark, sf_dir, "documents").filter(
            F.col("doc_id") < _SPLIT_ID
        ).select("doc_id", "text")
        band = banded_buckets(minhash_signatures(docs1, num_perm=12, k=5),
                              num_perm=12, rows_per_band=2)
        band.write.mode("overwrite").parquet(band_path)
        connected_components(
            _band_pairs(spark.read.parquet(band_path))
        ).write.mode("overwrite").parquet(assign_path)
        layouts.mark_fresh(marker, stamp)
    # Band/assign are maintained (fed forward through advances), so only
    # the plain parquet plans are memoized — no checkpoint pinning here;
    # each maintenance step manages its own lineage truncation.
    return (
        layouts.session_artifact(
            spark, (band_path, stamp),
            lambda: spark.read.parquet(band_path)),
        layouts.session_artifact(
            spark, (assign_path, stamp),
            lambda: spark.read.parquet(assign_path)),
    )


def maintain_clusters_from_feed(
    spark: SparkSession,
    band: DataFrame,
    assign: DataFrame,
    feed: DataFrame,
    num_perm: int = 12,
    k: int = 5,
    rows_per_band: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Advance the persisted dedup state — (band index, component
    assignment) — by ONE change-feed version. Deletes retract the removed
    docs' band rows and re-resolve ONLY the components containing a
    removed doc (from their surviving members' band rows; a component may
    split, and members left edge-less drop, exactly as a full recompute
    would). Inserts compute signatures for the increment alone, append
    its band rows to the index, and merge the edges they introduce via
    star-edge warm start (operators/graph.incremental_components). Work
    per advance is O(changed docs + touched components); the corpus is
    never rescanned. Returns (band', assign')."""
    deleted = (
        feed.filter(F.col("change_type") == "delete")
        .select("doc_id").distinct()
    )
    inserted = feed.filter(F.col("change_type") == "insert").select(
        "doc_id", "text"
    )
    new_bands = banded_buckets(
        minhash_signatures(inserted, num_perm=num_perm, k=k),
        num_perm=num_perm, rows_per_band=rows_per_band,
    )
    band2 = band.join(deleted, "doc_id", "left_anti").unionByName(new_bands)
    # Retraction: components holding a deleted doc re-resolve from the
    # updated index (already minus deleted rows, plus the increment's —
    # so an insert that bridges INTO a touched component resolves here).
    touched_comps = (
        assign.join(deleted.withColumnRenamed("doc_id", "node"),
                    "node", "left_semi")
        .select("component").distinct()
    )
    touched_nodes = (
        assign.join(F.broadcast(touched_comps), "component", "left_semi")
        .select(F.col("node").alias("doc_id"))
    )
    surviving_bands = band2.join(touched_nodes, "doc_id", "left_semi")
    relabeled = connected_components(_band_pairs(surviving_bands))
    kept = assign.join(F.broadcast(touched_comps), "component", "left_anti")
    assign2 = kept.unionByName(relabeled)
    # Insert merge: edges the increment introduces against the updated
    # index, folded in with star edges over touched components only.
    new_edges = _band_pairs(new_bands, band2)
    assign3 = incremental_components(assign2, new_edges)
    # Truncate lineage before handing the state to the next advance: in
    # production (band', assign') are PERSISTED artifacts re-read from
    # storage each advance, so each step's plan is O(step). Returning the
    # lazy frames instead compounds every prior advance into the next
    # plan — the regenerated PLAN_AUDIT caught this query at 3172
    # exchanges (ADVICE r12) — so planning cost grew multiplicatively
    # with chain depth. localCheckpoint materializes the (small,
    # O(corpus-bands)) state and cuts the plan back to a leaf; at real
    # scale this is the parquet write of the maintained index.
    return (band2.localCheckpoint(eager=True),
            assign3.localCheckpoint(eager=True))
