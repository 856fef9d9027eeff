"""Property/branch tests for the LLM-pipeline operators (SURVEY.md section 5
item 3: algebraic identities), plus the multimodal stub contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
    simhash_near_pairs_bucketed,
)
from nyc_analytics_database_platform_spark.operators.multimodal import (
    as_media_table,
    decode_image,
    fake_decode_features,
    resample_audio,
    sample_video_frames,
)
from nyc_analytics_database_platform_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_pairs,
)


def test_exact_dedup_collapses_planted_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "Hello   World"), (3, "  hello world "), (4, "other")],
        "doc_id long, text string",
    )
    # normalization is lower+trim (not whitespace-collapse), so 1 and 3 group
    groups = {r["keep_id"]: r["group_size"] for r in exact_dedup_groups(docs).collect()}
    assert groups[1] == 2  # docs 1 and 3
    assert groups[2] == 1
    assert groups[4] == 1


def test_minhash_lsh_superset_of_high_jaccard(spark, sf_dir):
    """LSH candidates must contain every pair the exact Jaccard baseline
    finds at a threshold far above the banding threshold (~0.41)."""
    docs = load(spark, sf_dir, "documents")
    exact = {
        (r["a_id"], r["b_id"])
        for r in ngram_jaccard_pairs(docs, 0.9, k=5).collect()
    }
    sigs = minhash_signatures(docs, num_perm=12, k=5)
    lsh = {
        (r["a_id"], r["b_id"])
        for r in lsh_candidate_pairs(sigs, num_perm=12, rows_per_band=2).collect()
    }
    assert exact, "corpus should contain planted near-duplicates"
    missing = exact - lsh
    assert not missing, f"LSH missed high-jaccard pairs: {missing}"


def test_jaccard_bounds(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    rows = ngram_jaccard_pairs(docs, 0.8, k=5).collect()
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["inter"] <= min(r["na"], r["nb"])


def test_simhash_bucketed_lossless(spark, sf_dir):
    """Pigeonhole byte-bucketing must produce EXACTLY the all-pairs result
    set (radius 3 < 4 byte slices => every true pair shares a byte)."""
    docs = load(spark, sf_dir, "documents")
    fps = simhash_fingerprints(docs, k=3)
    allp = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_near_pairs(fps, radius=3).collect()
    }
    bucketed = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_near_pairs_bucketed(fps, radius=3).collect()
    }
    assert allp, "corpus should contain simhash near-dups"
    assert bucketed == allp


def test_simhash_bucketed_rejects_unsound_radius(spark):
    fps = spark.createDataFrame([(1, 0)], "doc_id long, simhash long")
    with pytest.raises(ValueError):
        simhash_near_pairs_bucketed(fps, radius=4, n_bytes=4)


def test_topk_self_is_best_match(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    top = brute_force_topk(emb, q, k=3).collect()
    assert top[0]["vec_id"] == 0
    assert top[0]["score"] == pytest.approx(1.0, abs=1e-6)
    assert top[0]["score"] >= top[1]["score"] >= top[2]["score"]


def test_cosine_pairs_symmetric_bound(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["a_id"], r["b_id"]): r["score"] for r in cosine_near_pairs(emb, 0.99).collect()}
    assert pairs == {(1, 2): 1.0}


def test_multimodal_fake_decode_deterministic(spark):
    docs = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    feats = fake_decode_features(as_media_table(docs)).collect()[0]
    # md5('abc') = 900150983cd24fb0...
    assert feats["n_bytes"] == 3
    assert feats["width"] == 0x90
    assert feats["height"] == 0x01
    assert feats["channels"] == 1 + (0x5 % 4)


def test_multimodal_codec_stubs_and_adapter(spark):
    """All three modalities are adapters now - image (round 3, Pillow),
    audio and video (round 4, stdlib wave / Y4M) - real kernel when the
    codec fits the payload, deterministic fake fallback with the same
    schema (contract-tested in tests/test_r3_scale_ops.py and
    tests/test_round4_ops.py) - so none may raise on the fake path, and
    the real paths reject a payload they cannot decode LOUDLY."""
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = as_media_table(docs)
    assert decode_image(media, (2, 2), use_codec=False).count() == 1
    assert resample_audio(media, 16000, use_codec=False).count() == 1
    assert sample_video_frames(media, 1.0, use_codec=False).count() >= 2
    with pytest.raises(Exception, match="not RIFF/WAVE"):
        resample_audio(media, 16000, use_codec=True).collect()
    with pytest.raises(Exception, match="not YUV4MPEG2"):
        sample_video_frames(media, 1.0, use_codec=True).collect()


def test_pii_redaction_not_vacuous(spark, sf_dir):
    """The oracle proves Spark==DuckDB; this guards that the injected PII is
    actually present and actually removed (both engines agreeing on a no-op
    would also hash-match)."""
    from nyc_analytics_database_platform_spark.queries.llm_text import text_pii_redaction

    df = text_pii_redaction(spark, sf_dir).cache()
    try:
        assert df.filter("n_emails > 0").count() > 0
        assert df.filter("n_ssns > 0").count() > 0
        assert df.filter("n_phones > 0").count() > 0
        assert df.filter("redacted LIKE '%<EMAIL>%'").count() > 0
        assert df.filter("redacted LIKE '%@example.com%'").count() == 0
        assert df.filter("redacted RLIKE '\\\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}'").count() == 0
    finally:
        df.unpersist()


def test_multimodal_arrow_and_pandas_surfaces_agree(spark):
    """mapInArrow and mapInPandas decode kernels must be bit-identical -
    same rows, same values - so either surface can serve the pipeline."""
    from nyc_analytics_database_platform_spark.operators.multimodal import (
        fake_decode_features_arrow,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = as_media_table(docs)
    a = sorted(map(tuple, fake_decode_features_arrow(media).collect()))
    p = sorted(map(tuple, fake_decode_features(media).collect()))
    assert a == p and len(a) > 0


def test_quality_model_training_learns_and_is_deterministic(spark, sf_dir):
    """Round 9: the trained student must (1) actually learn the teacher's
    boundary - held-out AUC well above chance; (2) move off the zero
    init; (3) be bit-deterministic across runs (the rounded GD update
    sequence has no RNG and no order-dependence)."""
    from nyc_analytics_database_platform_spark.queries.llm_filters import (
        quality_model_auc,
        quality_model_train,
    )

    w1 = quality_model_train(spark, sf_dir).collect()[0]
    w2 = quality_model_train(spark, sf_dir).collect()[0]
    assert w1 == w2
    assert any(
        abs(w1[c]) > 1e-4
        for c in ("w0", "w_log_tokens", "w_mean_wlen", "w_stop_ratio", "w_ttr")
    )
    auc_row = quality_model_auc(spark, sf_dir).collect()[0]
    assert auc_row.n_pos > 0 and auc_row.n_neg > 0
    assert auc_row.auc > 0.8, auc_row
