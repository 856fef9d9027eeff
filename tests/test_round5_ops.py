"""Round-5 additions beyond oracle parity: CMS sketch properties and
cross-engine bucket arithmetic, WordPiece greedy-fold semantics vs a pure
Python reference, RNN mutuality verified against numpy brute force, and
the Holt recurrence vs a pure-Python replay."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.registry import all_specs


# --- count-min sketch --------------------------------------------------------


def _py_bucket(value: str, r: int, width: int) -> int:
    h = hashlib.md5(f"r{r}:{value}".encode()).hexdigest()[:6]
    return int(h, 16) % width


def test_cms_buckets_match_python_md5_arithmetic(spark):
    from nyc_analytics_database_platform_spark.operators.sketches import (
        cms_bucket_cols,
    )

    df = spark.createDataFrame([("alpha",), ("42",), ("",)], "v string")
    rows = df.select("v", *cms_bucket_cols("v", 4, 1024)).collect()
    for row in rows:
        for r in range(4):
            assert row[f"c{r}"] == _py_bucket(row["v"], r, 1024), (row["v"], r)


def test_cms_never_undercounts(spark):
    """CMS point estimates are exact-or-over for EVERY value, not just the
    heavy ones the registered query reports."""
    from nyc_analytics_database_platform_spark.operators.sketches import (
        cms_estimates,
        count_min_sketch,
    )

    data = [("a",)] * 50 + [("b",)] * 20 + [(str(i),) for i in range(200)]
    df = spark.createDataFrame(data, "v string")
    sketch = count_min_sketch(df, "v", depth=4, width=64)  # narrow: collisions
    exact = df.groupBy("v").agg(F.count("*").alias("n"))
    est = cms_estimates(exact, sketch, "v", depth=4, width=64)
    rows = est.collect()
    assert len(rows) == 202
    assert all(r["cms_est"] >= r["n"] for r in rows)
    # the heavy keys' estimates are still dominated by their own mass
    by_v = {r["v"]: r for r in rows}
    assert by_v["a"]["cms_est"] >= 50 and by_v["b"]["cms_est"] >= 20


# --- WordPiece greedy fold ---------------------------------------------------


def _py_greedy(word: str, vocab: set[str], max_len: int = 4) -> list[str]:
    out, pos = [], 0
    while pos < len(word):
        for length in range(max_len, 0, -1):
            piece = word[pos : pos + length]
            if len(piece) == length and (length == 1 or piece in vocab):
                out.append(piece)
                pos += length
                break
    return out


@pytest.mark.parametrize(
    "word,vocab",
    [
        ("banana", {"ban", "ana", "na"}),
        ("aaaa", {"aa", "aaa"}),
        ("x", set()),
        ("mississippi", {"miss", "issi", "ss", "pp", "i"}),
    ],
)
def test_wordpiece_fold_matches_python_reference(spark, word, vocab):
    from nyc_analytics_database_platform_spark.queries.llm_bpe import _wp_fold_expr

    df = spark.createDataFrame([(word, sorted(vocab))], "word string, vs array<string>")
    got = df.select(F.expr(_wp_fold_expr()).alias("ps")).head()["ps"]
    assert list(got) == _py_greedy(word, vocab)
    assert "".join(got) == word  # segmentation always reassembles the word


# --- reciprocal nearest neighbors --------------------------------------------


def test_rnn_pairs_are_mutual_top1(spark, sf_dir):
    """Every reported pair must be each other's in-cluster cosine top-1
    under the (score desc, vec_id) tie-break - verified with numpy."""
    import numpy as np

    rows = all_specs()["rnn_mutual_pairs_within_cluster"].fn(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: (r["label"], np.array(r["embedding"], dtype=np.float64))
        for r in load(spark, sf_dir, "embeddings").collect()
    }

    def top1(vid):
        lab, v = emb[vid]
        best = None
        for oid, (olab, ov) in emb.items():
            if oid == vid or olab != lab:
                continue
            s = round(
                float(v @ ov) / (float(np.sqrt(v @ v)) * float(np.sqrt(ov @ ov))), 6
            )
            key = (-s, oid)
            if best is None or key < best[0]:
                best = (key, oid)
        return best[1] if best else None

    assert rows, "expected at least one mutual pair"
    for r in rows[:10]:  # bound the quadratic check
        assert top1(r["a_id"]) == r["b_id"]
        assert top1(r["b_id"]) == r["a_id"]
        assert r["a_id"] < r["b_id"]


# --- Holt smoothing ----------------------------------------------------------


def test_holt_matches_python_recurrence(spark, sf_dir):
    rows = all_specs()["monthly_revenue_holt"].fn(spark, sf_dir).collect()
    assert len(rows) >= 3
    revs = [r["revenue"] for r in rows]
    a, b = 0.5, 0.3
    l, t = None, 0.0
    for i, r in enumerate(rows):
        # replay on the ROUNDED revenue stream would drift; re-derive the
        # unrounded series is overkill - instead check the recurrence on
        # the reported (level, trend) pairs themselves at 3dp slack
        if i == 0:
            assert r["trend"] == 0.0 and r["level"] == r["revenue"]
            l, t = r["level"], r["trend"]
            continue
        l_new = a * revs[i] + (1 - a) * (l + t)
        t_new = b * (l_new - l) + (1 - b) * t
        assert abs(r["level"] - l_new) < 0.01, (i, r["level"], l_new)
        assert abs(r["trend"] - t_new) < 0.01, (i, r["trend"], t_new)
        assert abs(r["forecast_next"] - (r["level"] + r["trend"])) < 0.001
        l, t = r["level"], r["trend"]


# --- foreachBatch sink -------------------------------------------------------


def test_idempotent_sink_replay_and_crash_safety(spark, tmp_path):
    """The exactly-once recipe's two claims, exercised directly:
    (1) replaying a journaled batch id is a no-op, (2) a new batch
    replaces same-key rows and keeps the rest."""
    from nyc_analytics_database_platform_spark.streaming.sinks import (
        idempotent_upsert_sink,
    )

    target = str(tmp_path / "target")
    journal = str(tmp_path / "journal")
    sink = idempotent_upsert_sink(target, journal, "k")

    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, n long")
    sink(b0, 0)
    assert sorted(
        tuple(r) for r in spark.read.parquet(target).collect()
    ) == [(1, 10), (2, 20)]

    # replay of batch 0 with DIFFERENT (corrupt) content must be ignored
    sink(spark.createDataFrame([(1, 999)], "k long, n long"), 0)
    assert sorted(
        tuple(r) for r in spark.read.parquet(target).collect()
    ) == [(1, 10), (2, 20)]

    # batch 1 upserts key 2 and adds key 3; key 1 untouched
    sink(spark.createDataFrame([(2, 25), (3, 30)], "k long, n long"), 1)
    assert sorted(
        tuple(r) for r in spark.read.parquet(target).collect()
    ) == [(1, 10), (2, 25), (3, 30)]


# --- cross-family consistency ------------------------------------------------


def test_dataset_card_consistent_with_dedicated_operators(spark, sf_dir):
    """The card's numbers must agree with the operators that own each
    metric - a composite that drifts from its parts is worse than none."""
    card = all_specs()["dataset_card_report"].fn(spark, sf_dir).head()
    docs = load(spark, sf_dir, "documents")
    assert card["n_docs"] == docs.count()
    assert card["total_chars"] == docs.agg(F.sum("n_chars")).head()[0]
    by_source = {
        r["source"]: r
        for r in all_specs()["dedup_rate_by_source"].fn(spark, sf_dir).collect()
    }
    # dedup_rate_by_source drops NULL-text docs; the card counts them all:
    # reconcile via distinct-digest identity (NULL text has its own digest)
    n_distinct = docs.select(
        F.md5(F.lower(F.trim(F.col("text"))))
    ).distinct().count()
    assert abs(card["exact_dup_rate"] - (1 - n_distinct / card["n_docs"])) < 1e-6
    assert card["n_sources"] == len(by_source)


# --- split leakage -----------------------------------------------------------


def test_cluster_split_assignment_has_no_leaks(spark, sf_dir):
    """Assigning splits by cluster label must make the leakage audit empty
    BY CONSTRUCTION - prove it by recomputing the audit on cluster-keyed
    splits."""
    from nyc_analytics_database_platform_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from nyc_analytics_database_platform_spark.operators.graph import (
        connected_components,
    )
    from nyc_analytics_database_platform_spark.operators.sampling import split_column
    from nyc_analytics_database_platform_spark.queries.llm_clusters import (
        _LEAK_SPLITS,
    )

    docs = load(spark, sf_dir, "documents")
    comp = connected_components(
        lsh_candidate_pairs(minhash_signatures(docs, num_perm=12, k=5))
    )
    sp = comp.withColumn("split", split_column(F.col("component"), _LEAK_SPLITS))
    n_leaky = (
        sp.groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") >= 2)
        .count()
    )
    assert n_leaky == 0


# --- containment dedup -------------------------------------------------------


def test_containment_catches_snippet_jaccard_misses(spark):
    """The defining case: a short doc embedded verbatim in a much longer
    one has containment 1.0 but Jaccard well under any dedup threshold -
    prefix_filter_containment_pairs must emit the (snippet -> host) ordered
    pair and ngram_jaccard_pairs at 0.8 must not."""
    from nyc_analytics_database_platform_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_containment_pairs,
    )

    snippet = " ".join(f"w{i}" for i in range(10))
    host = snippet + " " + " ".join(f"x{i}" for i in range(60))
    other = " ".join(f"y{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, snippet), (2, host), (3, other)], "doc_id long, text string"
    )
    pairs = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in prefix_filter_containment_pairs(docs, 9, 10, k=5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (2, 1) not in pairs  # asymmetric: host not contained in snippet
    jac = ngram_jaccard_pairs(docs, 0.8, k=5).collect()
    assert not any({r["a_id"], r["b_id"]} == {1, 2} for r in jac)


def test_containment_prefix_filter_matches_bruteforce(spark):
    """Lossless-filter property on a corpus with planted overlaps: the
    prefix-filtered result equals the brute-force shingle self-join."""
    from nyc_analytics_database_platform_spark.operators.dedup import (
        distinct_hashed_shingles,
        prefix_filter_containment_pairs,
        with_tokens,
    )

    words = [f"t{i}" for i in range(40)]
    docs = []
    for d in range(12):
        lo = (d * 3) % 25
        docs.append((d, " ".join(words[lo : lo + 12 + (d % 5)])))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    sh = distinct_hashed_shingles(with_tokens(df), "doc_id", 5)
    a = sh.selectExpr("doc_id AS a_id", "hs")
    b = sh.selectExpr("doc_id AS b_id", "hs")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    brute = (
        a.join(b, "hs")
        .filter("a_id <> b_id")
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
        .join(sizes.selectExpr("doc_id AS a_id", "n AS na"), "a_id")
        .filter("inter * 10 >= na * 9")
        .select("a_id", "b_id")
    )
    got = prefix_filter_containment_pairs(df, 9, 10, k=5).select("a_id", "b_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, brute.collect()))


# --- unigram Viterbi segmentation -------------------------------------------


def _py_viterbi(word, lp):
    """Pure-Python replay of the fold's recurrence: max score, ties to the
    lexicographically smallest '|'-joined path."""
    best = [(0.0, "")]
    for t in range(1, len(word) + 1):
        cands = []
        for L in range(1, 5):
            if t >= L and word[t - L : t] in lp:
                s0, p0 = best[t - L]
                piece = word[t - L : t]
                cands.append(
                    (s0 + lp[piece], piece if p0 == "" else p0 + "|" + piece)
                )
        ms = max(s for s, _ in cands)
        best.append((ms, min(p for s, p in cands if s == ms)))
    return best[-1]


@pytest.mark.parametrize(
    "word,lp",
    [
        # Viterbi beats greedy: longest-first takes ab|c (-11), optimal a|bc (-3)
        ("abc", {"a": -2.0, "b": -9.0, "c": -10.0, "ab": -1.0, "bc": -1.0}),
        # tie between x|yz and xy|z forces the lexicographic tie-break
        ("xyz", {"x": -1.0, "y": -5.0, "z": -1.0, "xy": -2.0, "yz": -2.0}),
        ("aaaa", {"a": -3.0, "aa": -4.0, "aaa": -8.0, "aaaa": -20.0}),
        ("q", {"q": -0.5}),
    ],
)
def test_unigram_viterbi_fold_matches_python_reference(spark, word, lp):
    from nyc_analytics_database_platform_spark.queries.llm_bpe import (
        _uni_fold_expr,
    )

    map_expr = "map(" + ", ".join(
        f"'{g}', cast({v} as double)" for g, v in lp.items()
    ) + ")"
    row = (
        spark.createDataFrame([(word,)], "word string")
        .withColumn("lpm", F.expr(map_expr))
        .withColumn("best", F.expr(_uni_fold_expr()))
        .select("best.s", "best.p")
        .collect()[0]
    )
    exp_s, exp_p = _py_viterbi(word, lp)
    assert row["p"] == exp_p
    assert abs(row["s"] - exp_s) < 1e-12


def test_unigram_viterbi_differs_from_greedy_on_corpus_shape(spark):
    """The 'abc' case above IS the greedy/Viterbi divergence: WordPiece's
    longest-match-first rule would emit ab|c. Pin that the fold does not."""
    from nyc_analytics_database_platform_spark.queries.llm_bpe import (
        _uni_fold_expr,
    )

    row = (
        spark.createDataFrame([("abc",)], "word string")
        .withColumn(
            "lpm",
            F.expr(
                "map('a', -2.0D, 'b', -9.0D, 'c', -10.0D,"
                " 'ab', -1.0D, 'bc', -1.0D)"
            ),
        )
        .withColumn("best", F.expr(_uni_fold_expr()))
        .collect()[0]
    )
    assert row["best"]["p"] == "a|bc"


# --- spatial cell join -------------------------------------------------------


def test_spatial_cell_join_finds_cross_cell_boundary_pairs(spark):
    """Points on opposite sides of a cell boundary (and across a corner)
    within the radius must surface - the case a same-cell-only join drops."""
    from nyc_analytics_database_platform_spark.queries.parity_spatial import (
        near_pairs_cells,
    )

    pts = spark.createDataFrame(
        [
            (1, 40.69999, -74.00999),  # just inside cell (4069, -7401)
            (2, 40.70001, -74.01001),  # corner-adjacent cell, ~2.5 m away
            (3, 40.70001, -74.00999),  # edge-adjacent cell (lat)
            (4, 40.70300, -74.00999),  # same lat cell-column, ~335 m from 3
            (5, 40.80000, -74.20000),  # far away: no pairs
        ],
        "id long, lat double, lon double",
    )
    pairs = {
        (r["a_id"], r["b_id"]) for r in near_pairs_cells(pts).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (3, 4) in pairs
    assert not any(5 in p for p in pairs)


def test_spatial_cell_join_matches_bruteforce_on_random_cloud(spark):
    """Losslessness on a deterministic cloud: cell join == all-pairs."""
    from nyc_analytics_database_platform_spark.queries.parity_spatial import (
        near_pairs_cells,
        with_point,
        _dist_m,
    )

    base = spark.range(1, 300).select(F.col("id"))
    pts = with_point(base, "id").select("id", "lat", "lon")
    got = {
        (r["a_id"], r["b_id"]) for r in near_pairs_cells(pts).collect()
    }
    a = pts.selectExpr("id AS a_id", "lat AS a_lat", "lon AS a_lon")
    b = pts.selectExpr("id AS b_id", "lat AS b_lat", "lon AS b_lon")
    brute = (
        a.crossJoin(b)
        .filter("a_id < b_id")
        .filter(
            _dist_m(
                F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
            )
            <= 500.0
        )
    )
    exp = {(r["a_id"], r["b_id"]) for r in brute.collect()}
    assert got == exp and len(exp) > 0


# --- KMV theta sketch --------------------------------------------------------


def test_kmv_estimates_land_near_exact_counts(spark, sf_dir):
    """Deterministic accuracy guard: at k=64 the KMV relative error should
    stay well inside 3/sqrt(k) ~ 37% on every set, and the intersection
    estimate must be nonnegative and bounded by the union estimate."""
    from nyc_analytics_database_platform_spark.registry import all_specs

    fn = all_specs()["kmv_theta_set_estimates"].fn
    r = fn(spark, sf_dir).collect()[0]
    for est, exact in [
        (r["est_a"], r["exact_a"]),
        (r["est_b"], r["exact_b"]),
        (r["est_union"], r["exact_union"]),
    ]:
        if exact >= 64:
            assert abs(est - exact) / exact < 0.37, (est, exact)
        else:
            assert est == exact
    assert 0.0 <= r["est_intersect"] <= r["est_union"] + 1e-9


# --- k-core ------------------------------------------------------------------


def test_kcore_peels_tails_and_keeps_clique(spark):
    """K4 (a genuine 3-core) + a pendant tail + a triangle (2-core only):
    the 3-core must be exactly the K4, every member at degree 3 - and one
    extra round must change nothing (fixpoint)."""
    from nyc_analytics_database_platform_spark.operators.graph import (
        kcore_members,
    )

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 5), (5, 6)]
    tri = [(7, 8), (8, 9), (7, 9)]
    edges = spark.createDataFrame(k4 + tail + tri, "s1 long, s2 long")
    got = {
        r["node"]: r["core_degree"]
        for r in kcore_members(edges, 3, 6).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    again = {
        r["node"]: r["core_degree"]
        for r in kcore_members(edges, 3, 7).collect()
    }
    assert again == got


def test_kcore_registered_fixpoint_at_declared_rounds(spark, sf_dir):
    """The registered query's _KCORE_ROUNDS unroll must already be at the
    fixpoint on the driver data - one more Spark round changes nothing."""
    from nyc_analytics_database_platform_spark.queries.graph_analytics import (
        _KCORE_K,
        _KCORE_ROUNDS,
        kcore_cosupply_members,
    )
    from nyc_analytics_database_platform_spark.operators.graph import (
        kcore_members,
    )
    from nyc_analytics_database_platform_spark.catalog import load
    from pyspark.sql import functions as F2

    base = {
        (r["node"], r["core_degree"])
        for r in kcore_cosupply_members(spark, sf_dir).collect()
    }
    # rebuild the same projection with one extra peel round
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F2.col("o_custkey").alias("c"), F2.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = pairs.select("c", F2.col("s").alias("s1"))
    b = pairs.select(F2.col("c").alias("c2"), F2.col("s").alias("s2"))
    shared = (
        a.join(b, (a.c == b.c2) & (F2.col("s1") < F2.col("s2")))
        .groupBy("s1", "s2")
        .agg(F2.count("*").alias("shared_c"))
    )
    thr = shared.agg(F2.percentile("shared_c", 0.99).alias("t"))
    e = (
        shared.crossJoin(F2.broadcast(thr))
        .filter(F2.col("shared_c") >= F2.col("t"))
        .select("s1", "s2")
    )
    more = {
        (r["node"], r["core_degree"])
        for r in kcore_members(e, _KCORE_K, _KCORE_ROUNDS + 1).collect()
    }
    assert base == more


def test_dbscan_cell_contraction_equals_direct_cc(spark):
    """The eps/sqrt(2) cell contraction must produce exactly the
    components of the direct core eps-graph CC - including a chain that
    crosses many contraction cells and two cores sharing a cell with NO
    explicit edge row between them (the in-cell-clique guarantee)."""
    from pyspark.sql import functions as F2

    from nyc_analytics_database_platform_spark.operators.graph import (
        connected_components,
    )
    from nyc_analytics_database_platform_spark.queries.parity_spatial import (
        _cell_contracted_components,
        _dist_m,
        _DB_EPS,
    )

    # chain of 6 points ~900 m apart (each hop < eps, total span ~4.5 km
    # = many cells), plus an isolated pair sharing one cell, plus a loner
    base_lat, base_lon = 40.70, -74.00
    chain = [(i, base_lat, base_lon + i * 0.0106) for i in range(6)]
    cellmates = [(10, 40.80, -74.20), (11, 40.8001, -74.2001)]
    loner = [(20, 40.60, -73.80)]
    pts = spark.createDataFrame(
        chain + cellmates + loner, "id long, lat double, lon double"
    )
    a = pts.selectExpr("id AS a_id", "lat AS alat", "lon AS alon")
    b = pts.selectExpr("id AS b_id", "lat AS blat", "lon AS blon")
    edges = (
        a.crossJoin(b)
        .filter("a_id < b_id")
        .filter(
            _dist_m(F2.col("alat"), F2.col("alon"), F2.col("blat"), F2.col("blon"))
            <= _DB_EPS
        )
        .select("a_id", "b_id")
    )
    core = pts.select("id")  # treat all as cores for the CC comparison
    got = {
        (r["node"], r["component"])
        for r in _cell_contracted_components(pts, core, edges).collect()
    }
    direct = connected_components(edges)
    exp = {(r["node"], r["component"]) for r in direct.collect()}
    # direct CC covers only nodes WITH edges; contraction covers all cores
    # (the loner labels itself)
    assert exp <= got
    assert (20, 20) in got
    assert {(n, c) for n, c in got if n in range(6)} == {
        (i, 0) for i in range(6)
    }
    assert {(n, c) for n, c in got if n in (10, 11)} == {(10, 10), (11, 10)}


def test_exact_quantiles_bucketed_match_sorted_ranks(spark, sf_dir):
    """The bucketed-scan quantiles must equal the straight sorted-list
    rank picks (value at ceil(q*n)) - PERCENTILE_DISC semantics."""
    import math

    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.registry import all_specs

    row = all_specs()["exact_quantiles_bucketed"].fn(spark, sf_dir).collect()[0]
    vals = sorted(
        r["o_totalprice"]
        for r in load(spark, sf_dir, "orders").select("o_totalprice").collect()
    )
    n = len(vals)
    assert row["n"] == n
    for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        assert row[name] == vals[math.ceil(q * n) - 1], name
