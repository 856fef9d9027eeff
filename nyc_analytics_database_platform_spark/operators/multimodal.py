"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded via Arrow-batched Pandas UDFs over mapInPandas.

The pattern for image/audio/video at 100 TB: the payload is an opaque
`binary` column (or a reference to object storage) with a typed metadata
struct beside it; decode / feature-extract / resize / frame-sample run as
mapInPandas stages so each Python worker processes whole Arrow batches.

The actual codec libraries (PIL, ffmpeg, soundfile) are NOT available in
this environment, so the decode step is stubbed two ways:
- `decode_image` / `sample_video_frames` / `resample_audio` raise
  NotImplementedError with the exact production signature documented;
- `fake_decode_features` is the deterministic stand-in used by tests and
  the oracle: pseudo-features derived from the payload's md5 (so the
  Spark-side plumbing - schema, batching, partitioning - is fully real
  and checkable end-to-end).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_media_table(
    df: DataFrame, id_col: str = "doc_id", payload_text_col: str = "text"
) -> DataFrame:
    """Wrap a text corpus as a media table: (id, media binary, meta struct).
    Stands in for reading real image/audio bytes; the binary column and
    metadata shape are exactly what a production reader would produce."""
    media = F.encode(F.col(payload_text_col), "utf-8")
    return df.select(
        F.col(id_col),
        media.alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.octet_length(media).alias("n_bytes"),
        ).alias("meta"),
    )


FAKE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def fake_decode_features(media_df: DataFrame) -> DataFrame:
    """Deterministic stand-in decode: md5-derived pseudo image dimensions.

    mapInPandas -> one Python worker call per Arrow batch (not per row);
    this is the real production plumbing with a fake kernel.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [hashlib.md5(bytes(b)).hexdigest() for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(b)) for b in pdf["media"]],
                    "width": [int(h[0:2], 16) for h in digests],
                    "height": [int(h[2:4], 16) for h in digests],
                    "channels": [1 + int(h[4], 16) % 4 for h in digests],
                }
            )

    return media_df.mapInPandas(kernel, FAKE_FEATURE_SCHEMA)


def fake_decode_features_arrow(media_df: DataFrame) -> DataFrame:
    """The same deterministic decode through mapInArrow: the worker receives
    raw pyarrow RecordBatches (no pandas materialization), which is the
    preferred kernel shape when the decode library consumes buffers directly
    (torch/tensor codecs, pyarrow-native image ops) - one copy fewer per
    batch than mapInPandas. Output is bit-identical to fake_decode_features;
    tests assert the two surfaces agree row-for-row."""
    import pyarrow as pa

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            media = batch.column("media").to_pylist()
            digests = [hashlib.md5(b).hexdigest() for b in media]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_bytes": pa.array(
                        [len(b) for b in media], type=pa.int32()
                    ),
                    "width": pa.array(
                        [int(h[0:2], 16) for h in digests], type=pa.int32()
                    ),
                    "height": pa.array(
                        [int(h[2:4], 16) for h in digests], type=pa.int32()
                    ),
                    "channels": pa.array(
                        [1 + int(h[4], 16) % 4 for h in digests],
                        type=pa.int32(),
                    ),
                }
            )

    return media_df.mapInArrow(kernel, FAKE_FEATURE_SCHEMA)


def plan_frame_extraction(
    media_df: DataFrame, frame_bytes: int, every_k: int
) -> DataFrame:
    """The pre-codec half of frame sampling, all native expressions: treat
    the payload as `n_frames = n_bytes div frame_bytes` fixed-size frames,
    keep every k-th index, and emit one row per sampled frame with its
    exact (byte_offset, byte_length) range. This explode + offset
    arithmetic is precisely what a production extractor computes before
    handing ranges to the codec kernel (which then reads ONLY those ranges
    - at 100 TB that's a ranged GET per frame, never a full-payload
    fetch); sample_video_frames documents the codec half."""
    n_frames = (F.col("meta.n_bytes") / frame_bytes).cast("long")
    idx = F.explode(
        F.when(
            n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_k))
        ).otherwise(F.array().cast("array<long>"))
    )
    return media_df.select(
        "doc_id", idx.alias("frame_idx"), F.col("meta.n_bytes").alias("n_bytes")
    ).select(
        "doc_id",
        "frame_idx",
        (F.col("frame_idx") * frame_bytes).alias("byte_offset"),
        F.least(
            F.lit(frame_bytes), F.col("n_bytes") - F.col("frame_idx") * frame_bytes
        ).alias("byte_length"),
    )


def decode_image(media_df: DataFrame, target_size: tuple[int, int]) -> DataFrame:
    """Production signature: decode + resize image payloads to
    (id, pixels array<float>, width, height). Requires an image codec
    (e.g. PIL) - not available in this environment."""
    raise NotImplementedError(
        "image codec not available in this environment; production kernel: "
        "mapInPandas(batch -> PIL.Image.open(io.BytesIO(b)).resize(target_size))"
    )


def sample_video_frames(media_df: DataFrame, fps: float) -> DataFrame:
    """Production signature: sample frames at `fps` to one row per frame
    (id, frame_idx, frame binary). Requires ffmpeg/av - not available."""
    raise NotImplementedError(
        "video codec not available; production kernel: mapInPandas over av/ffmpeg"
    )


def resample_audio(media_df: DataFrame, rate: int) -> DataFrame:
    """Production signature: decode + resample audio to
    (id, samples array<float>, rate). Requires soundfile/librosa - not
    available."""
    raise NotImplementedError(
        "audio codec not available; production kernel: mapInPandas over soundfile"
    )
