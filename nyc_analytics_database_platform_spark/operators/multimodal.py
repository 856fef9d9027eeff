"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded via Arrow-batched Pandas UDFs over mapInPandas.

The pattern for image/audio/video at 100 TB: the payload is an opaque
`binary` column (or a reference to object storage) with a typed metadata
struct beside it; decode / feature-extract / resize / frame-sample run as
mapInPandas stages so each Python worker processes whole Arrow batches.

Codec availability is an OPTIONAL dependency, adapter-style:
- `decode_image` uses Pillow when importable (the real kernel) and falls
  back to a deterministic md5-derived fake with the IDENTICAL output
  schema - both paths are contract-tested, and the real path's test is
  env-gated (skips where Pillow is absent, like test_tws.py);
- `sample_video_frames` / `resample_audio` still raise
  NotImplementedError with the exact production signature documented
  (no av/soundfile anywhere to adapt to);
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


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ]
)


def have_image_codec() -> bool:
    """True when Pillow is importable (driver-side probe; on a real cluster
    the executors' env must match - ship the dep in the image/venv)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(
    media_df: DataFrame,
    target_size: tuple[int, int],
    use_codec: bool | None = None,
) -> DataFrame:
    """Decode + resize image payloads to DECODED_IMAGE_SCHEMA:
    (doc_id, width, height, channels, pixels array<float> of
    width*height*3 RGB values in [0,1], row-major).

    Kernel selection: the REAL path (Pillow, when importable and the
    payloads are actual encoded images) and the deterministic FAKE fallback
    (md5-derived pixels, works on any payload) produce the SAME schema and
    batch shape, so every downstream stage - and the contract test - is
    identical either way. `use_codec=None` auto-detects via
    have_image_codec(); pass False to force the fake (e.g. for plumbing
    tests on non-image payloads while Pillow is installed).

    Both kernels are mapInPandas (Arrow-batched); at 100 TB decode is
    embarrassingly parallel and the only knobs are batch size
    (spark.sql.execution.arrow.maxRecordsPerBatch vs payload size) and
    partition sizing so a batch of decoded float arrays fits worker
    memory."""
    if use_codec is None:
        use_codec = have_image_codec()
    w, h = target_size

    if use_codec:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            for pdf in batches:
                pixels = []
                for b in pdf["media"]:
                    img = (
                        Image.open(io.BytesIO(bytes(b)))
                        .convert("RGB")
                        .resize((w, h))
                    )
                    pixels.append(
                        [p / 255.0 for px in img.getdata() for p in px]
                    )
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": w,
                        "height": h,
                        "channels": 3,
                        "pixels": pixels,
                    }
                )

    else:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            n = w * h * 3
            for pdf in batches:
                pixels = []
                for b in pdf["media"]:
                    d = hashlib.md5(bytes(b)).digest()
                    pixels.append(
                        [d[i % len(d)] / 255.0 for i in range(n)]
                    )
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": w,
                        "height": h,
                        "channels": 3,
                        "pixels": pixels,
                    }
                )

    return media_df.mapInPandas(kernel, DECODED_IMAGE_SCHEMA)


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
