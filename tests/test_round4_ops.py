"""Round-4 regressions: the latent edges VERDICT r3 asked to pin
(streaming drain timeout, NULL prefix-sum buckets, float-free fingerprint
canonicalization, >100k-token span argmin) plus the new audio kernel's
real and fake paths and the q21 / jaccard plan invariants."""

from __future__ import annotations

import io
import math
import wave

import pytest
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.operators.multimodal import (
    DECODED_AUDIO_SCHEMA,
    as_media_table,
    have_audio_codec,
    resample_audio,
)
from nyc_analytics_database_platform_spark.operators.prefixsum import (
    bucketed_running_sum,
)
from nyc_analytics_database_platform_spark.queries.llm_corpus import (
    first_span_occurrences,
)
from nyc_analytics_database_platform_spark.queries.parity_profile import (
    fingerprint_row_repr,
)
from nyc_analytics_database_platform_spark.queries.streaming_stateful import (
    drain_or_raise,
)


# --- streaming drain timeout -------------------------------------------------


class _StuckQuery:
    def __init__(self):
        self.stopped = False

    def awaitTermination(self, timeout):
        return False  # never drains

    def stop(self):
        self.stopped = True


class _DrainedQuery:
    def awaitTermination(self, timeout):
        return True

    def stop(self):  # pragma: no cover - must not be called
        raise AssertionError("stop() on a drained query")


def test_drain_or_raise_raises_and_stops_on_timeout():
    q = _StuckQuery()
    with pytest.raises(TimeoutError, match="did not drain"):
        drain_or_raise(q, "test stream", timeout_s=1)
    assert q.stopped  # the hung query must not be left running


def test_drain_or_raise_passes_through_on_termination():
    drain_or_raise(_DrainedQuery(), "test stream", timeout_s=1)


# --- NULL-bucket prefix sum --------------------------------------------------


def test_bucketed_running_sum_all_null_bucket(spark):
    """A bucket whose every value is NULL sums to NULL in SQL; the operator
    must treat it as contributing 0 to downstream bucket offsets instead of
    crashing on int(None) (VERDICT r3 latent #3)."""
    rows = [
        ("00aaaa", None),  # bucket '00': all NULL
        ("01bbbb", 5),
        ("01cccc", None),  # mixed-NULL bucket: SUM skips NULLs
        ("02dddd", 7),
    ]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {
        r["k"]: r["running_total"]
        for r in bucketed_running_sum(df, "k", "v").collect()
    }
    # NULL values contribute nothing; a NULL row's own running total is the
    # prefix sum of everything before it (SUM window over NULLs keeps the
    # previous value, or NULL when nothing preceded in-bucket).
    assert got["01bbbb"] == 5
    assert got["01cccc"] == 5
    assert got["02dddd"] == 12


# --- fingerprint canonicalization -------------------------------------------


def test_fingerprint_row_repr_is_float_free(spark):
    """>= 1e7 doubles render '1.0E7' in the JVM vs '10000000.0' in DuckDB;
    the fingerprint must hash integer cents, never a float's string form
    (VERDICT r3 latent #4)."""
    df = spark.createDataFrame(
        [(1, "F", 10_000_000.0), (2, "O", 123.455)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    got = [r[0] for r in df.select(fingerprint_row_repr()).collect()]
    assert got[0] == "1|F|1000000000"  # exact integer cents, no E-notation
    assert "E" not in got[0] and "e" not in got[0]
    # banker's-vs-half-up does not matter here; the pin is integer cents
    assert got[1].startswith("2|O|1234")


# --- span argmin on a >100k-token document ----------------------------------


def test_first_span_occurrences_survives_100k_positions(spark):
    """The retired packed key doc_id*100000+pos collided (1, 100001) with
    (2, 1); the struct argmin must rank (1, 100001) first. Positions beyond
    100000 exercise exactly the overflow VERDICT r3 item 4 flagged."""
    spans = spark.createDataFrame(
        [
            (1, 100001, "shared span"),  # would pack to 200001
            (2, 1, "shared span"),  # would ALSO pack to 200001
            (2, 9, "only b"),
        ],
        "doc_id long, pos long, span string",
    )
    got = {(r["doc_id"], r["pos"]) for r in first_span_occurrences(spans).collect()}
    assert got == {(1, 100001), (2, 9)}


# --- audio kernel ------------------------------------------------------------


def _wav_bytes(
    samples: list[float], rate: int, *, width: int = 2, channels: int = 1
) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        frames = bytearray()
        for s in samples:
            for _ in range(channels):
                if width == 1:
                    frames += bytes([max(0, min(255, int(s * 127) + 128))])
                else:
                    v = max(-32768, min(32767, int(s * 32767)))
                    frames += v.to_bytes(2, "little", signed=True)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_resample_audio_real_path_downsamples(spark):
    """Real stdlib-wave kernel: a 16-bit 8 kHz sine resampled to 4 kHz
    halves the sample count and keeps amplitudes in [-1, 1] close to the
    original waveform."""
    n, rate = 64, 8000
    sine = [math.sin(2 * math.pi * 220 * i / rate) for i in range(n)]
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(sine, rate)))], "doc_id long, media binary"
    )
    out = resample_audio(df, 4000, use_codec=True)
    assert out.schema == DECODED_AUDIO_SCHEMA
    r = out.collect()[0]
    assert r["rate"] == 4000
    assert r["n_samples"] == 32 == len(r["samples"])
    assert all(-1.0 <= s <= 1.0 for s in r["samples"])
    # independent reconstruction: 16-bit quantization then linear interp
    # over linspace(0, n-1, new_n) - the kernel's exact math, recomputed
    # here from the original float samples
    import numpy as np

    q = np.array([int(s * 32767) for s in sine], dtype=np.float64) / 32768.0
    want = np.interp(np.linspace(0.0, n - 1, 32), np.arange(n), q)
    assert np.allclose(np.array(r["samples"]), want, atol=1e-4)


def test_resample_audio_real_path_mixes_and_upsamples(spark):
    """Stereo 8-bit payload: channels mono-mix, upsampling interpolates
    (count = round(n * rate / src))."""
    const = [0.5] * 10
    df = spark.createDataFrame(
        [(7, bytearray(_wav_bytes(const, 1000, width=1, channels=2)))],
        "doc_id long, media binary",
    )
    r = resample_audio(df, 3000, use_codec=True).collect()[0]
    assert r["n_samples"] == 30
    assert all(s == pytest.approx(0.5, abs=0.02) for s in r["samples"])


def test_resample_audio_real_path_zero_frame_wav(spark):
    """A structurally valid WAV with zero frames must yield an empty
    sample stream, not an np.interp crash inside the Arrow batch."""
    df = spark.createDataFrame(
        [(9, bytearray(_wav_bytes([], 8000)))], "doc_id long, media binary"
    )
    r = resample_audio(df, 4000, use_codec=True).collect()[0]
    assert r["n_samples"] == 0
    assert r["samples"] == []


def test_resample_audio_real_path_rejects_non_wav(spark):
    df = spark.createDataFrame(
        [(3, bytearray(b"definitely not audio"))], "doc_id long, media binary"
    )
    with pytest.raises(Exception, match="not RIFF/WAVE"):
        resample_audio(df, 8000, use_codec=True).collect()


def test_resample_audio_fake_path_contract(spark, sf_dir):
    """Fallback kernel over arbitrary payloads: declared schema, md5-derived
    deterministic samples, n in [4, 8], values in [-1, 1]."""
    from nyc_analytics_database_platform_spark.catalog import load

    media = as_media_table(load(spark, sf_dir, "documents").limit(8))
    out = resample_audio(media, 16000, use_codec=False)
    assert out.schema == DECODED_AUDIO_SCHEMA
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert r["rate"] == 16000
        assert 4 <= r["n_samples"] <= 8
        assert len(r["samples"]) == r["n_samples"]
        assert all(-1.0 <= s <= 1.0 for s in r["samples"])
    again = resample_audio(media, 16000, use_codec=False).collect()
    assert [r["samples"] for r in again] == [r["samples"] for r in rows]


def test_have_audio_codec_true_on_cpython():
    assert have_audio_codec()  # wave is stdlib


# --- plan invariants for the round-4 rewrites --------------------------------


def test_q21_plan_has_no_expand_and_one_fact_exchange(spark, sf_dir):
    """The Expand (double countDistinct) and the second fact scan are the
    regressions this round removed; pin their absence."""
    from nyc_analytics_database_platform_spark.registry import all_specs

    df = all_specs()["tpch_q21_waiting_suppliers"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    # ObjectHashAggregate would mean a collect_set crept back in
    assert "ObjectHashAggregate" not in plan


def test_jaccard_prefix_filter_matches_exact_baseline(spark, sf_dir):
    """Length filter + array_intersect verify must stay answer-identical to
    the quadratic exact baseline."""
    from nyc_analytics_database_platform_spark.catalog import load
    from nyc_analytics_database_platform_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = load(spark, sf_dir, "documents").limit(120)
    exact = {
        (r["a_id"], r["b_id"], r["inter"], r["na"], r["nb"])
        for r in ngram_jaccard_pairs(docs, 0.8).collect()
    }
    fast = {
        (r["a_id"], r["b_id"], r["inter"], r["na"], r["nb"])
        for r in prefix_filter_jaccard_pairs(docs, 0.8).collect()
    }
    assert fast == exact


# --- jaccard prefix-filter equivalence property ------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# Docs built from a tiny vocabulary so shingle overlap (incl. shared
# boilerplate prefixes/suffixes, duplicates, and short docs below the
# shingle width) actually occurs within few examples.
_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14).map(
            " ".join
        ),
        min_size=2,
        max_size=10,
    ),
    st.sampled_from([0.5, 0.7, 0.8, 0.9]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prefix_filter_equals_exact_property(spark, texts, threshold):
    """prefix_filter_jaccard_pairs must equal the quadratic baseline on
    ARBITRARY corpora - the prefix bound, the integer-exact prefix length,
    the length filter and the array_intersect verify all have edge cases
    (duplicate docs, all-boilerplate docs, docs shorter than the shingle
    width) that the fixed-testdata comparison cannot force."""
    from nyc_analytics_database_platform_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    key = lambda r: (r["a_id"], r["b_id"], r["inter"], r["na"], r["nb"])  # noqa: E731
    exact = {key(r) for r in ngram_jaccard_pairs(docs, threshold, k=3).collect()}
    fast = {
        key(r)
        for r in prefix_filter_jaccard_pairs(docs, threshold, k=3).collect()
    }
    assert fast == exact


# --- video kernel (Y4M) ------------------------------------------------------

from nyc_analytics_database_platform_spark.operators.multimodal import (  # noqa: E402
    SAMPLED_FRAME_SCHEMA,
    sample_video_frames,
)


def _y4m_bytes(
    frames: list[bytes], w: int, h: int, *, fps: str = "25:1", cs: str = ""
) -> bytes:
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1{cs}\n".encode()
    return hdr + b"".join(b"FRAME\n" + f for f in frames)


def test_sample_video_frames_real_y4m_stride(spark):
    """6-frame 4x2 C420 clip at 30 fps sampled at 10 fps -> stride 3 keeps
    source frames 0 and 3; the luma plane comes back byte-exact."""
    w, h = 4, 2
    fsize = w * h * 3 // 2  # C420
    frames = [bytes([i]) * fsize for i in range(6)]
    df = spark.createDataFrame(
        [(1, bytearray(_y4m_bytes(frames, w, h, fps="30:1")))],
        "doc_id long, media binary",
    )
    out = sample_video_frames(df, 10.0, use_codec=True)
    assert out.schema == SAMPLED_FRAME_SCHEMA
    rows = sorted(out.collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 3]
    for r in rows:
        assert (r["width"], r["height"]) == (w, h)
        assert bytes(r["frame"]) == bytes([r["frame_idx"]]) * (w * h)


def test_sample_video_frames_real_y4m_colorspaces(spark):
    """C444 and Cmono frame sizes parse correctly (different plane math)."""
    w, h = 2, 2
    c444 = _y4m_bytes([bytes(range(w * h * 3))], w, h, cs=" C444")
    mono = _y4m_bytes([bytes(range(w * h))], w, h, cs=" Cmono")
    df = spark.createDataFrame(
        [(1, bytearray(c444)), (2, bytearray(mono))], "doc_id long, media binary"
    )
    rows = {r["doc_id"]: r for r in sample_video_frames(df, 25.0, use_codec=True).collect()}
    assert bytes(rows[1]["frame"]) == bytes(range(w * h))  # luma = first WH
    assert bytes(rows[2]["frame"]) == bytes(range(w * h))


def test_sample_video_frames_real_rejects_non_y4m_and_truncated(spark):
    df = spark.createDataFrame(
        [(3, bytearray(b"not a video"))], "doc_id long, media binary"
    )
    with pytest.raises(Exception, match="not YUV4MPEG2"):
        sample_video_frames(df, 25.0, use_codec=True).collect()
    trunc = _y4m_bytes([bytes(2)], 4, 2)  # C420 needs 12 bytes, give 2
    df2 = spark.createDataFrame(
        [(4, bytearray(trunc))], "doc_id long, media binary"
    )
    with pytest.raises(Exception, match="truncated"):
        sample_video_frames(df2, 25.0, use_codec=True).collect()


def test_sample_video_frames_fake_path_contract(spark, sf_dir):
    from nyc_analytics_database_platform_spark.catalog import load

    media = as_media_table(load(spark, sf_dir, "documents").limit(6))
    out = sample_video_frames(media, 25.0, use_codec=False)
    assert out.schema == SAMPLED_FRAME_SCHEMA
    rows = out.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc) == 6
    for doc_rows in per_doc.values():
        assert 2 <= len(doc_rows) <= 5
        assert [r["frame_idx"] for r in sorted(doc_rows, key=lambda r: r["frame_idx"])] == list(range(len(doc_rows)))
        assert all(len(bytes(r["frame"])) == 16 for r in doc_rows)
    again = sample_video_frames(media, 25.0, use_codec=False).collect()
    assert sorted(map(str, again)) == sorted(map(str, rows))


# --- product quantization ----------------------------------------------------


def test_pq_fit_codes_and_adc_properties(spark):
    """PQ invariants on a tiny synthetic corpus: every vector gets exactly
    m codes in [0, k); a vector's ADC distance to ITSELF as the query is
    the (nonnegative) quantization error, and the query's own top-1 under
    ADC ranks it at (or tied with) vectors sharing its codes."""
    import random

    from nyc_analytics_database_platform_spark.operators.pq import (
        adc_topk,
        pq_fit,
    )

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    vecs = spark.createDataFrame(rows, "vec_id long, v array<double>")
    m, k = 2, 4
    books, codes = pq_fit(vecs, m, k, iterations=2)
    got_books = books.collect()
    assert {(r["j"], r["c_id"]) for r in got_books} <= {
        (j, c) for j in range(m) for c in range(k)
    }
    assert all(len(r["cvec"]) == 4 for r in got_books)  # 8 dims / 2
    got_codes = codes.collect()
    per_vec = {}
    for r in got_codes:
        per_vec.setdefault(r["vec_id"], []).append((r["j"], r["c_id"]))
        assert 0 <= r["c_id"] < k
    assert all(len(v) == m for v in per_vec.values())
    q = vecs.filter(F.col("vec_id") == 0)
    scored = adc_topk(codes, books, q, m, k).collect()
    assert len(scored) == 40
    assert all(r["adc_d2"] >= 0 for r in scored)
    # sorted ascending, deterministic tie-break
    ds = [r["adc_d2"] for r in scored]
    assert ds == sorted(ds)


def test_pq_subvectors_slicing(spark):
    from nyc_analytics_database_platform_spark.operators.pq import subvectors

    vecs = spark.createDataFrame(
        [(1, [float(x) for x in range(8)])], "vec_id long, v array<double>"
    )
    got = {r["j"]: r["sv"] for r in subvectors(vecs, 4).collect()}
    assert got == {
        0: [0.0, 1.0],
        1: [2.0, 3.0],
        2: [4.0, 5.0],
        3: [6.0, 7.0],
    }


def test_pq_subvectors_rejects_indivisible_dims(spark):
    """A 10-dim vector under m=4 would silently drop 2 dims from every
    distance; the operator must fail loudly instead."""
    from nyc_analytics_database_platform_spark.operators.pq import subvectors

    bad = spark.createDataFrame(
        [(1, [float(x) for x in range(10)])], "vec_id long, v array<double>"
    )
    with pytest.raises(Exception, match="not divisible"):
        subvectors(bad, 4).collect()


def test_short_doc_ngram_ops_degrade_to_empty(spark):
    """sequence(1, 0) in Spark is DESCENDING [1, 0] (DuckDB's
    generate_series(1, 0) is empty) - the n-gram transforms must guard the
    short-document case or slice(toks, 0, n) throws. Pin the guarded
    expressions on sub-n-token docs."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(["a", "b"],), ([],)], "toks array<string>")
    grams = df.select(
        F.expr(
            "CASE WHEN size(toks) >= 8 THEN transform(sequence(1, size(toks) - 7), "
            "i -> xxhash64(array_join(slice(toks, i, 8), ' '))) ELSE array() END"
        ).alias("g")
    ).collect()
    assert all(list(r["g"]) == [] for r in grams)
