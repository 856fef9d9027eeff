"""Multimodal-column queries: binary payload metadata (native expressions)
and the Pandas-UDF decode plumbing with a deterministic fake kernel whose
md5-derived features are reproduced exactly by the SQL oracle - proving the
mapInPandas path end-to-end, not just that it runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.multimodal import (
    as_media_table,
    fake_decode_features,
)
from nyc_analytics_database_platform_spark.registry import register


@register(
    "multimodal_payload_metadata",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS digest
        FROM documents
        ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary payload column - byte size and
    content digest, all native expressions (no decode needed)."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    media = as_media_table(docs)
    return media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("media").alias("digest"),
    ).orderBy("doc_id")


_HEXVAL = "(strpos('0123456789abcdef', {c}) - 1)"


def _hex_byte(h: str, pos: int) -> str:
    a = _HEXVAL.format(c=f"{h}[{pos}:{pos}]")
    b = _HEXVAL.format(c=f"{h}[{pos + 1}:{pos + 1}]")
    return f"({a} * 16 + {b})"


@register(
    "multimodal_decode_features",
    oracle=f"""
        WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                          md5(text) AS h
                   FROM documents)
        SELECT doc_id, n_bytes,
               {_hex_byte('h', 1)} AS width,
               {_hex_byte('h', 3)} AS height,
               1 + ({_HEXVAL.format(c='h[5:5]')} % 4) AS channels
        FROM m
        ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode stage with the deterministic fake kernel
    (md5-derived pseudo dimensions). The oracle recomputes the same features
    in SQL, so schema, Arrow batching, and byte handling are all verified."""
    docs = load(spark, sf_dir, "documents", parallel=True)
    feats = fake_decode_features(as_media_table(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
    ).orderBy("doc_id")


_AUDIO_RATE = 16000

# md5 hex byte j (0-indexed) of column h, via strpos arithmetic on the two
# hex chars at 1-based positions (2j+1, 2j+2) - here with the byte index
# coming from an unnested series column `i`.
_HEXB_I = (
    "((strpos('0123456789abcdef', substr(h, 2*i + 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(h, 2*i + 2, 1)) - 1))"
)


@register(
    "multimodal_audio_fake_resample",
    oracle=f"""
        WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
        hdr AS (
            SELECT doc_id, h,
                   4 + ({_hex_byte('h', 1)} % 5) AS n_samples
            FROM m
        )
        SELECT d.doc_id,
               {_AUDIO_RATE} AS rate,
               CAST(d.n_samples AS BIGINT) AS n_samples,
               CAST(SUM({_HEXB_I}) AS BIGINT) AS byte_sum
        FROM hdr d, unnest(generate_series(1, d.n_samples)) AS g(i)
        GROUP BY d.doc_id, d.n_samples
        ORDER BY d.doc_id
    """,
    tags=("llm", "multimodal", "audio"),
)
def multimodal_audio_fake_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas audio-decode stage (operators/multimodal.
    resample_audio) over the deterministic fake kernel - the payloads here
    are text, so this attests the PLUMBING (schema, Arrow batching, byte
    handling); the REAL stdlib-wave kernel is contract-tested on generated
    PCM WAVs in tests/test_llm_operators.py. Samples are md5-derived
    (sample_i = d[i+1]/255*2-1); the query folds them back to the exact
    integer byte sum (round((s+1)*127.5) inverts the float mapping
    losslessly), so the oracle compares integers, never float32 rounding."""
    from nyc_analytics_database_platform_spark.operators.multimodal import (
        resample_audio,
    )

    docs = load(spark, sf_dir, "documents", parallel=True)
    audio = resample_audio(as_media_table(docs), _AUDIO_RATE, use_codec=False)
    return audio.select(
        "doc_id",
        F.col("rate").cast("int").alias("rate"),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.aggregate(
            F.transform(
                "samples",
                lambda s: F.round((s + F.lit(1.0)) * 127.5).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("byte_sum"),
    ).orderBy("doc_id")


@register(
    "multimodal_video_fake_frames",
    oracle=f"""
        WITH m AS (SELECT doc_id, text, md5(text) AS h FROM documents),
        hdr AS (
            SELECT doc_id, text,
                   2 + ({_hex_byte('h', 1)} % 4) AS n_frames,
                   16 + ({_hex_byte('h', 3)} % 16) AS width,
                   16 + ({_hex_byte('h', 5)} % 16) AS height
            FROM m
        )
        SELECT d.doc_id,
               CAST(i AS INTEGER) AS frame_idx,
               CAST(d.width AS INTEGER) AS width,
               CAST(d.height AS INTEGER) AS height,
               md5(d.text || chr(CAST(65 + i AS INTEGER))) AS frame_hex
        FROM hdr d, unnest(generate_series(0, d.n_frames - 1)) AS g(i)
        ORDER BY d.doc_id, frame_idx
    """,
    tags=("llm", "multimodal", "video"),
)
def multimodal_video_fake_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas video frame-sampling stage (operators/multimodal.
    sample_video_frames) over the deterministic fake kernel - the payloads
    here are text, so this attests the PLUMBING (schema, one-row-per-frame
    fan-out, byte handling); the REAL stdlib Y4M kernel is contract-tested
    on generated uncompressed video in tests/test_round4_ops.py. Fake
    frame i's bytes are md5(payload || chr(65+i)) - a printable suffix, so
    the oracle reproduces the exact digests with string concat and the
    compare is on hex strings, byte-for-byte."""
    from nyc_analytics_database_platform_spark.operators.multimodal import (
        sample_video_frames,
    )

    docs = load(spark, sf_dir, "documents", parallel=True)
    frames = sample_video_frames(as_media_table(docs), 25.0, use_codec=False)
    return frames.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        F.lower(F.hex("frame")).alias("frame_hex"),
    ).orderBy("doc_id", "frame_idx")


_FRAME_BYTES, _EVERY_K = 16, 4


@register(
    "multimodal_frame_sample_plan",
    oracle=f"""
        WITH m AS (
            SELECT doc_id, octet_length(encode(text)) AS n_bytes
            FROM documents
        )
        SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
               CAST(i * {_FRAME_BYTES} AS BIGINT) AS byte_offset,
               CAST(least({_FRAME_BYTES},
                          n_bytes - i * {_FRAME_BYTES}) AS BIGINT) AS byte_length
        FROM m, unnest(generate_series(0, n_bytes // {_FRAME_BYTES} - 1,
                                       {_EVERY_K})) AS g(i)
        WHERE n_bytes >= {_FRAME_BYTES}
        ORDER BY doc_id, frame_idx
    """,
    tags=("llm", "multimodal"),
)
def multimodal_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling byte-range plan (operators/multimodal.
    plan_frame_extraction): every 4th fixed-size frame of each payload as
    (doc_id, frame_idx, byte_offset, byte_length) - the exact ranges a
    production codec kernel would read (ranged GETs at scale, never a
    full-payload fetch). Native sequence+explode; no Python anywhere."""
    from nyc_analytics_database_platform_spark.operators.multimodal import (
        plan_frame_extraction,
    )

    docs = load(spark, sf_dir, "documents", parallel=True)
    media = as_media_table(docs)
    return plan_frame_extraction(media, _FRAME_BYTES, _EVERY_K).orderBy(
        "doc_id", "frame_idx"
    )
