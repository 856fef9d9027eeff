"""Deduplication operators for LLM training-data pipelines.

Five strategies, all expressed as declarative DataFrame plans over a
`(id, text)` corpus (plus an embedding variant):

- exact:        hash-groupBy on a normalized digest; keep min id per group.
- ngram-jaccard: explode distinct k-shingles -> self-join on shingle ->
                 |intersection| per pair -> Jaccard >= threshold.
- MinHash+LSH:  per-permutation signature = lexicographic MIN of
                 md5(perm || shingle) (md5 is identical across engines, so
                 the oracle is exact); signatures banded; a shared band
                 bucket makes a candidate pair.
- SimHash:      32-bit fingerprint from majority vote of per-feature hash
                 bits; near-dups = pairs with hamming distance <= radius via
                 bit_count(xor).
- embedding:    cosine >= threshold over vector pairs (see similarity.py).

Scale notes (the whole point of MinHash/SimHash): the naive shingle
self-join blows up on common shingles (a shingle shared by m docs emits
m^2 rows); LSH bounds the join key domain to (band, bucket) with ~constant
bucket occupancy, and SimHash reduces each doc to one 32/64-bit integer so
candidate generation can bucket on fingerprint prefixes. The exact variant
is one shuffle on the digest. None of these collect anything to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.functions.text import shingles, ws_tokens

# --- shared shingle prep ----------------------------------------------------


def exploded_shingles(docs: DataFrame, id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """(id, shingle) pairs, with per-doc repeats."""
    return docs.select(id_col, shingles_col(k).alias("sh")).select(
        id_col, F.explode("sh").alias("s")
    )


def distinct_shingles(docs: DataFrame, id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """(id, shingle) pairs, deduplicated per doc.

    Prefer distinct_hashed_shingles in join-heavy paths: distinct/join over
    variable-length strings measured ~5x slower than over xxhash64 longs.
    """
    return exploded_shingles(docs, id_col, k).distinct()


def distinct_hashed_shingles(
    docs: DataFrame, id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """(id, hs) with hs = xxhash64(shingle): the set-operations view of the
    shingle set. Collision odds ~ n^2/2^64 - immaterial for set sizes, and
    the long key makes distinct/join/cache ~5x faster than raw strings.

    The per-doc distinct is computed IN PLACE - hash inside the shingle
    array (transform + xxhash64), array_distinct, THEN explode - because
    "distinct per (id, shingle)" is a per-document property, not a global
    one: a corpus-wide `.distinct()` after the explode shuffles every
    (id, hs) row for an answer each doc already knows locally. Measured at
    sf0.5: 32.6s -> 1.2s for the identical output (the explode previously
    materialized 12.5M shingle STRINGS into the exchange; now only the
    deduped long hashes ever leave the projection)."""
    return docs.select(id_col, shingles_col(k).alias("sh")).select(
        id_col,
        F.explode(
            F.array_distinct(F.expr("transform(sh, s -> xxhash64(s))"))
        ).alias("hs"),
    )


def shingles_col(k: int = 5):
    return shingles("toks", k)


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Force an exchange, then tokenize.

    The repartition BEFORE tokenization is load-bearing: a small parquet
    file arrives as one partition and the tokenize + downstream
    shingling/hashing are CPU-bound, so the regex split must run on
    fanned-out rows. It sits before (not after) the projection so that an
    input that is already round-robin fanned out (catalog.load with
    parallel=True) COLLAPSES with it into one exchange
    (CollapseRepartition) - the old tokenize-then-repartition order
    stacked a second full-payload shuffle onto every such caller,
    measured 2x wall on corpus_span_dedup at sf0.1 (opt round 1). The
    historical reason for repartitioning after the projection - Catalyst
    inlining split() into every downstream slice()/transform() lambda -
    no longer holds on Spark 4: CollapseProject only inlines non-cheap
    expressions referenced once (verified: split() node count in the
    span/shingle plans is unchanged with the barrier removed).
    """
    target = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(target).withColumn("toks", ws_tokens(text_col))


# --- exact ------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: canonical (min) id + group size.
    Keep-set = the canonical ids; drop-set = group_size > 1 members."""
    return (
        docs.select(id_col, F.md5(F.lower(F.trim(F.col(text_col)))).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("group_size"),
        )
    )


# --- n-gram Jaccard ---------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float, id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """All pairs (a < b) with shingle-set Jaccard >= threshold.

    Exact but quadratic in docs sharing a shingle - the correctness baseline
    that MinHash approximates. Plan: explode -> self-join on shingle ->
    count intersections -> join sizes -> filter.
    """
    # Hashed shingles (long keys), eagerly cached: four downstream consumers
    # (self-join both sides + two size joins) read sh, and lazy caching lets
    # the branches race to materialize the shingle pipeline concurrently
    # (observed 2-5x inflation) - the count() barrier populates it first.
    # cache() over localCheckpoint deliberately: the CacheManager dedupes by
    # canonicalized plan, so repeated invocations of the same query REUSE one
    # entry (no per-call growth; one entry per distinct (plan, data) pair).
    sh = distinct_hashed_shingles(with_tokens(docs), id_col, k).cache()
    sh.count()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh.select(F.col(id_col).alias("a_id"), "hs")
    b = sh.select(F.col(id_col).alias("b_id"), "hs")
    inter = (
        a.join(b, "hs")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "inter", "na", "nb", "jaccard")
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame, threshold: float, id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """All pairs (a < b) with shingle-set Jaccard >= threshold - IDENTICAL
    output to ngram_jaccard_pairs, via prefix-filtered candidate generation
    (the AllPairs/PPJoin family) instead of the full shingle self-join.

    Under any fixed global order of shingles, two sets with Jaccard >= t
    MUST share an element within their prefixes of length
    |S| - ceil(t*|S|) + 1 (if A's prefix misses B entirely, the overlap is
    at most ceil(t*|A|) - 1 < t*|A|). Ordering by ascending document
    frequency makes prefixes RARE shingles, so the candidate join fans out
    minimally - the boilerplate shingle every doc shares sits at the END of
    the order and never generates candidates. Verification then counts
    intersections ONLY for candidate pairs (join restricted through the
    candidate list, never all-pairs).

    Exactness discipline: prefix length uses pure integer arithmetic -
    ceil(0.8*n) computed as (4n+4) div 5, never double rounding (0.8*35 in
    doubles is 28.000000000000004: a double ceil would shorten the prefix
    and silently drop pairs). The PPJoin LENGTH FILTER is applied at
    candidate generation, before the dedup-distinct and the verify join:
    J(A,B) >= t forces min(|A|,|B|) / max(|A|,|B|) >= t (the intersection
    is at most the smaller set, the union at least the larger), so any
    candidate with den*min(na,nb) < num*max(na,nb) is discarded - exact
    integer arithmetic again, answer-preserving, and it cuts the verify
    join's input (|cand| x |shingles|) directly, which is where the cost
    lives. Scale shape: df-ordering costs one extra aggregate over (hs);
    candidates shuffle on rare shingles only; the verify join is linear in
    surviving candidate count x doc shingles."""
    num, den = int(round(threshold * 10)), 10  # t as an exact rational
    sh = distinct_hashed_shingles(with_tokens(docs), id_col, k).cache()
    sh.count()
    dfreq = sh.groupBy("hs").agg(F.count("*").alias("df"))
    # ONE doc-keyed aggregate (`base`) feeds BOTH pipeline halves: gather
    # each doc's (df, hs) pairs df-ascending-sorted (struct order = df,
    # then hs). The prefix rows (`ordered`) are a slice+explode of it and
    # the verify arrays (`arrs`) a transform of it - so the sh->dfreq
    # attach (shuffle on hs) and the doc-keyed gather (shuffle on the doc
    # key) each happen exactly ONCE; the old shape paid a second doc-keyed
    # shuffle of sh just to build the verify arrays. base is cached: it is
    # consumed four times (both sides of the candidate self-join + both
    # sides of the verify attach), and on repeated invocations the
    # CacheManager's canonicalized-plan dedupe makes it the durable
    # artifact a production run would persist (doc -> sorted feature
    # vector). Per-doc arrays are bounded by the doc's own shingle count,
    # the same bound any explode already pays.
    base = (
        sh.join(dfreq, "hs")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df", "hs"))).alias("sl"))
        .cache()
    )
    base.count()  # barrier: populate before the 4 consumers race to build it
    ordered = base.select(
        id_col,
        F.size("sl").alias("n"),
        F.explode(
            F.slice(
                "sl",
                1,
                F.greatest(
                    F.lit(0),
                    F.size("sl")
                    - F.expr(f"({num} * size(sl) + {den} - 1) div {den}")
                    + 1,
                ),
            )
        ).alias("x"),
    ).select(id_col, "n", F.col("x.hs").alias("hs"))
    cand = (
        ordered.alias("pa")
        .join(ordered.alias("pb"), "hs")
        .filter(F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}"))
        # PPJoin length filter (answer-preserving): J >= t = num/den
        # requires den*min(na,nb) >= num*max(na,nb). Applied BEFORE the
        # distinct and the verify join, on sizes already carried by the
        # prefix rows - no extra join, integer-exact.
        .filter(
            F.least(F.col("pa.n"), F.col("pb.n")) * den
            >= F.greatest(F.col("pa.n"), F.col("pb.n")) * num
        )
        .select(
            F.col(f"pa.{id_col}").alias("a_id"), F.col(f"pb.{id_col}").alias("b_id")
        )
        .distinct()
    )
    # verify: per-pair array intersection instead of the old 3-way shuffle
    # join (cand x shingles(a) x shingles(b) -> groupBy count), which
    # materialized |cand| x |shingles| rows. Each doc's (already distinct)
    # shingle set comes straight out of the cached base aggregate - no
    # extra shuffle - and each candidate pair costs one native
    # array_intersect, O(na+nb), inside whole-stage codegen. Two doc-keyed
    # joins of the (small) pair frame replace the shingle-level shuffle
    # entirely.
    arrs = base.select(
        id_col, F.transform("sl", lambda s: s["hs"]).alias("arr")
    )
    return (
        cand.join(
            arrs.select(F.col(id_col).alias("a_id"), F.col("arr").alias("a_arr")),
            "a_id",
        )
        .join(
            arrs.select(F.col(id_col).alias("b_id"), F.col("arr").alias("b_arr")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("a_arr", "b_arr")).cast("long").alias("inter"),
            F.size("a_arr").cast("long").alias("na"),
            F.size("b_arr").cast("long").alias("nb"),
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "inter", "na", "nb", "jaccard")
    )


def prefix_filter_containment_pairs(
    docs: DataFrame, num: int, den: int, id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """All ORDERED pairs (a, b), a != b, with shingle-set containment
    C(a->b) = |A n B| / |A| >= num/den - the ASYMMETRIC near-dup relation
    Jaccard misses: a snippet extracted from a longer document has high
    containment in it but low Jaccard (the union is dominated by the long
    side), so quote-inclusion / boilerplate-wrapping duplicates survive a
    Jaccard-thresholded dedup. Corpus curation runs this as the complement
    pass (Lee et al., "Deduplicating Training Data Makes Language Models
    Better" flags exactly this containment failure mode).

    Candidate generation is the asymmetric prefix filter: under the global
    df-ascending shingle order, C(a->b) >= t forces inter >= ceil(t*|A|),
    so A's prefix of length |A| - ceil(t*|A|) + 1 MUST hit B - joining
    A-prefixes against B's FULL shingle index is lossless (if the prefix
    misses B, inter <= ceil(t*|A|) - 1). Unlike the Jaccard filter the
    probed side cannot be prefix-shortened (|A| varies per pair), so the
    b-side is the whole inverted index - but the PROBE rows are rare
    shingles (df-ascending prefixes), which bounds the join fan-out: each
    probe row emits df(hs) candidates and prefix shingles have small df by
    construction. The answer-preserving length filter is the one-sided
    den*nb >= num*na (inter <= |B| and inter >= t*|A| force |B| >= t*|A|);
    threshold compares stay in integer arithmetic (den*inter >= num*na),
    never double rounding. Verification is the same per-pair
    array_intersect as the Jaccard path: candidates join the cached
    doc->sorted-shingle-array artifact, O(na+nb) per pair in codegen.

    Scale shape: one df aggregate + one doc-keyed gather (both shared with
    the Jaccard path's artifact), probe join keyed on rare shingles,
    verify join linear in candidates. The full b-side index is the same
    inverted index an exact-dedup deployment already maintains."""
    sh = distinct_hashed_shingles(with_tokens(docs), id_col, k).cache()
    sh.count()
    dfreq = sh.groupBy("hs").agg(F.count("*").alias("df"))
    base = (
        sh.join(dfreq, "hs")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df", "hs"))).alias("sl"))
        .cache()
    )
    base.count()
    # A-side probes: df-ascending prefix of length n - ceil(t*n) + 1.
    probes = base.select(
        id_col,
        F.size("sl").alias("n"),
        F.explode(
            F.slice(
                "sl",
                1,
                F.greatest(
                    F.lit(0),
                    F.size("sl")
                    - F.expr(f"({num} * size(sl) + {den} - 1) div {den}")
                    + 1,
                ),
            )
        ).alias("x"),
    ).select(id_col, "n", F.col("x.hs").alias("hs"))
    # B-side: the FULL inverted index (asymmetric - see docstring).
    index = base.select(
        id_col, F.size("sl").alias("n"), F.explode("sl").alias("x")
    ).select(id_col, "n", F.col("x.hs").alias("hs"))
    cand = (
        probes.alias("pa")
        .join(index.alias("pb"), "hs")
        .filter(F.col(f"pa.{id_col}") != F.col(f"pb.{id_col}"))
        # one-sided length filter: |B| >= t*|A|, integer-exact.
        .filter(F.col("pb.n") * den >= F.col("pa.n") * num)
        .select(
            F.col(f"pa.{id_col}").alias("a_id"), F.col(f"pb.{id_col}").alias("b_id")
        )
        .distinct()
    )
    arrs = base.select(id_col, F.transform("sl", lambda s: s["hs"]).alias("arr"))
    return (
        cand.join(
            arrs.select(F.col(id_col).alias("a_id"), F.col("arr").alias("a_arr")),
            "a_id",
        )
        .join(
            arrs.select(F.col(id_col).alias("b_id"), F.col("arr").alias("b_arr")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("a_arr", "b_arr")).cast("long").alias("inter"),
            F.size("a_arr").cast("long").alias("na"),
            F.size("b_arr").cast("long").alias("nb"),
        )
        .filter(F.col("inter") * den >= F.col("na") * num)
        .withColumn(
            "containment", F.col("inter").cast("double") / F.col("na")
        )
        .select("a_id", "b_id", "inter", "na", "nb", "containment")
    )


# --- MinHash + LSH ----------------------------------------------------------


def minhash_signatures(
    docs: DataFrame, num_perm: int = 12, id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """num_perm minhash values per doc. Permutation p's hash of shingle s is
    md5('p:' || s); the signature entry is the lexicographic MIN - a valid
    minhash over the order induced by each keyed hash, and exactly
    reproducible in any engine with md5.

    No distinct: MIN over the shingle multiset equals MIN over the set.
    And no explode/groupBy either - each signature entry is
    array_min(transform(shingles, md5(...))), computed IN PLACE per
    document: a minhash is a per-doc property, so shuffling 12x|shingles|
    exploded rows through min-aggregates answers locally-computable
    questions with an exchange. Measured at sf0.5: 30.4s -> 13.2s for the
    identical signatures (the residual cost is the num_perm x |shingles|
    md5 calls themselves, fixed by the cross-engine oracle convention).
    Docs with zero shingles (shorter than k tokens, or NULL text) emit no
    signature row, exactly as the explode-based shape did."""
    base = (
        with_tokens(docs)
        .select(id_col, shingles_col(k).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    cols = [
        F.array_min(
            F.expr(f"transform(sh, s -> md5(concat('{p}:', s)))")
        ).alias(f"m{p}")
        for p in range(num_perm)
    ]
    return base.select(id_col, *cols)


def banded_buckets(
    signatures: DataFrame, num_perm: int = 12, rows_per_band: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, bucket) rows: the LSH band index. The bucket id is md5 of
    the band's concatenated minhashes, so the shuffle key is (band, 32-char
    bucket). Materialized eagerly: every consumer joins it at least twice,
    and without materialization the whole signature pipeline (shingle
    explode + 12-way min agg) recomputes per side (~10x measured). Rows are
    tiny (num_bands per doc); at 100 TB this IS the persisted dedup index -
    written bucketed by (band, bucket), probed by each increment
    (dedup_incremental_vs_corpus)."""
    num_bands = num_perm // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                ).alias("bucket"),
            )
            for b in range(num_bands)
        ]
    )
    exploded = (
        signatures.select(id_col, F.explode(bands).alias("bb"))
        .select(
            id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
        .cache()
    )
    exploded.count()  # eager: all join sides read the materialized bands
    return exploded


def lsh_candidate_pairs(
    signatures: DataFrame, num_perm: int = 12, rows_per_band: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature (num_perm / rows_per_band bands); docs sharing any
    band bucket become a candidate pair."""
    exploded = banded_buckets(signatures, num_perm, rows_per_band, id_col)
    a = exploded.select(F.col(id_col).alias("a_id"), "band", "bucket")
    b = exploded.select(F.col(id_col).alias("b_id"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


# --- SimHash ----------------------------------------------------------------

_HEX = "0123456789abcdef"
SIMHASH_BITS = 32  # 8 hex chars of md5


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """32-bit SimHash per doc from distinct k-shingle features.

    Feature hash = first 8 hex chars of md5(shingle); fingerprint bit j is 1
    iff the majority of features have bit j set (sum of +/-1 votes > 0).
    Everything is hex-digit arithmetic (strpos/shift/and), identical in the
    oracle engine.

    The per-doc feature-set dedup is array_distinct INSIDE the shingle
    array (exact, string-level, local to the document) - the old
    corpus-wide `.distinct()` shuffled every exploded (id, hash, h) row
    for an answer each doc already knows; only the deduped features reach
    the vote aggregation, whose shuffle is the 32 partial vote sums per
    doc (map-side combine), not the feature stream.
    """
    base = with_tokens(docs).select(id_col, shingles_col(k).alias("sh"))
    feat = base.select(
        id_col, F.explode(F.array_distinct("sh")).alias("s")
    ).select(id_col, F.substring(F.md5(F.col("s")), 1, 8).alias("h"))
    # bit j (j = 4*(i-1) + kk for hex char i, bit kk) vote: +1 if set else -1
    vote_aggs = []
    for i in range(1, 9):  # hex char position
        d = F.instr(F.lit(_HEX), F.substring(F.col("h"), i, 1)) - 1
        for kk in range(4):
            j = 4 * (i - 1) + kk
            bit = F.shiftright(d, 3 - kk).bitwiseAND(F.lit(1))
            vote_aggs.append(F.sum(bit * 2 - 1).alias(f"v{j}"))
    votes = feat.groupBy(id_col).agg(*vote_aggs)
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return votes.select(id_col, fp.alias("simhash"))


def simhash_near_pairs(
    fingerprints: DataFrame, radius: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) <= radius, via an all-pairs
    crossJoin.

    CALIBRATION-ONLY: O(n^2) candidate rows - do not run at scale. The
    production path is simhash_near_pairs_bucketed (pigeonhole byte-bucket
    candidate generation, same exact result set); this variant exists to
    verify the bucketed path's losslessness and to calibrate radius.
    """
    # eagerly cached: read twice by the self-join (plan-deduped, see above)
    fingerprints = fingerprints.cache()
    fingerprints.count()
    a = fingerprints.select(F.col(id_col).alias("a_id"), F.col("simhash").alias("fa"))
    b = fingerprints.select(F.col(id_col).alias("b_id"), F.col("simhash").alias("fb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("hamming") <= radius)
        .select("a_id", "b_id", "hamming")
    )


def simhash_near_pairs_bucketed(
    fingerprints: DataFrame,
    radius: int = 3,
    id_col: str = "doc_id",
    n_bytes: int = SIMHASH_BITS // 8,
) -> DataFrame:
    """The SCALE path for SimHash near-dup pairs: pigeonhole byte-bucket
    candidate generation, exact-equivalent to simhash_near_pairs.

    Pigeonhole: if hamming(fa, fb) <= radius and radius < n_bytes, the
    differing bits touch at most `radius` of the n_bytes byte slices, so at
    least one byte slice matches EXACTLY. Candidates are therefore pairs
    sharing any (byte_position, byte_value) bucket - a shuffle keyed on
    n_bytes * 256 well-distributed buckets instead of an all-pairs crossJoin.
    Each doc emits n_bytes rows; bucket occupancy ~ n/256 per position, so
    candidate volume is sum-of-squares over buckets, not n^2. The exact
    hamming filter then runs only on candidates. Lossless by construction
    (every true pair shares a byte), verified against the all-pairs variant
    in tests.
    """
    if radius >= n_bytes:
        raise ValueError(
            f"pigeonhole needs radius < n_bytes (got radius={radius}, n_bytes={n_bytes})"
        )
    # eagerly cached: both sides of the candidate self-join read the exploded
    # byte rows; without it the fingerprint pipeline recomputes per side.
    byte_slices = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * p).bitwiseAND(F.lit(255))
            for p in range(n_bytes)
        ]
    )
    exploded = fingerprints.select(
        id_col, "simhash", F.posexplode(byte_slices).alias("p", "byte")
    ).cache()
    exploded.count()
    a = exploded.select(
        F.col(id_col).alias("a_id"), F.col("simhash").alias("fa"), "p", "byte"
    )
    b = exploded.select(
        F.col(id_col).alias("b_id"), F.col("simhash").alias("fb"), "p", "byte"
    )
    cand = (
        a.join(b, ["p", "byte"])
        .filter(F.col("a_id") < F.col("b_id"))
        # a pair sharing several bytes appears once per shared byte slice
        .select("a_id", "b_id", "fa", "fb")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("hamming") <= radius)
        .select("a_id", "b_id", "hamming")
    )
