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
- `resample_audio` is REAL via stdlib `wave` + numpy (PCM parse,
  mono-mix, linear resample) with the same deterministic fake fallback
  and contract tests as the image path;
- `sample_video_frames` still raises NotImplementedError with the exact
  production signature documented (no av/ffmpeg anywhere to adapt to);
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


DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("samples", T.ArrayType(T.FloatType())),
    ]
)


def have_audio_codec() -> bool:
    """True when the WAV codec is importable. `wave` is stdlib, so this is
    True in any CPython - the probe exists for symmetry with
    have_image_codec() and because on a real cluster the executors' env is
    what matters (a trimmed container image can drop stdlib modules)."""
    try:
        import wave  # noqa: F401

        return True
    except ImportError:
        return False


def _looks_like_wav(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def resample_audio(
    media_df: DataFrame, rate: int, use_codec: bool | None = None
) -> DataFrame:
    """Decode + resample audio payloads to DECODED_AUDIO_SCHEMA:
    (doc_id, rate, n_samples, samples array<float> in [-1, 1], mono).

    REAL path (default where the codec probe passes): stdlib `wave` parses
    RIFF/WAVE PCM payloads (8/16/32-bit widths), channels are mono-mixed,
    amplitudes normalized to [-1, 1], and the stream is linearly
    resampled to `rate` with numpy interp (new_n = round(n * rate / src)).
    No third-party codec dependency anywhere. A non-WAV payload on the
    real path raises ValueError with the doc id - decode errors must be
    loud, not silently faked.

    FAKE path (`use_codec=False` - e.g. plumbing tests over non-audio
    payloads, mirroring decode_image): deterministic md5-derived samples,
    n = 4 + d[0] % 5 samples with sample_i = d[i+1]/255*2-1, `rate`
    echoed. Identical schema and Arrow batch shape either way, so
    downstream stages and the contract tests are path-agnostic.

    Both kernels are mapInPandas (Arrow-batched); the 100 TB knobs are the
    same as decode_image - batch size vs payload size, and partition
    sizing so a batch of decoded float arrays fits worker memory."""
    if use_codec is None:
        use_codec = have_audio_codec()

    if use_codec:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io
            import wave

            import numpy as np

            widths = {1: (np.uint8, 128.0, 128.0), 2: (np.int16, 0.0, 32768.0), 4: (np.int32, 0.0, 2147483648.0)}
            for pdf in batches:
                out_samples, out_n = [], []
                for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                    raw = bytes(b)
                    if not _looks_like_wav(raw):
                        raise ValueError(
                            f"doc {doc_id}: payload is not RIFF/WAVE; "
                            "use_codec=False for non-audio payloads"
                        )
                    with wave.open(io.BytesIO(raw)) as w:
                        sw, nch = w.getsampwidth(), w.getnchannels()
                        src_rate, n = w.getframerate(), w.getnframes()
                        if sw not in widths:
                            raise ValueError(
                                f"doc {doc_id}: unsupported sample width {sw}"
                            )
                        dt, off, scale = widths[sw]
                        x = np.frombuffer(w.readframes(n), dtype=dt)
                    mono = (
                        (x.astype(np.float64) - off)
                        .reshape(-1, nch)
                        .mean(axis=1)
                        / scale
                    )
                    if len(mono) == 0:
                        # zero-frame WAV: a valid (if degenerate) file;
                        # np.interp rejects empty sample points, so emit
                        # an empty stream rather than crash the batch.
                        out_samples.append([])
                        out_n.append(0)
                        continue
                    new_n = max(1, int(round(len(mono) * rate / src_rate)))
                    res = np.interp(
                        np.linspace(0.0, len(mono) - 1, new_n),
                        np.arange(len(mono)),
                        mono,
                    ).astype(np.float32)
                    out_samples.append(res.tolist())
                    out_n.append(new_n)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "rate": rate,
                        "n_samples": out_n,
                        "samples": out_samples,
                    }
                )

    else:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_samples, out_n = [], []
                for b in pdf["media"]:
                    d = hashlib.md5(bytes(b)).digest()
                    n = 4 + d[0] % 5
                    out_samples.append(
                        [d[i + 1] / 255.0 * 2.0 - 1.0 for i in range(n)]
                    )
                    out_n.append(n)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "rate": rate,
                        "n_samples": out_n,
                        "samples": out_samples,
                    }
                )

    return media_df.mapInPandas(kernel, DECODED_AUDIO_SCHEMA)


def sample_video_frames(media_df: DataFrame, fps: float) -> DataFrame:
    """Production signature: sample frames at `fps` to one row per frame
    (id, frame_idx, frame binary). Requires ffmpeg/av - not available."""
    raise NotImplementedError(
        "video codec not available; production kernel: mapInPandas over av/ffmpeg"
    )
