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
- `sample_video_frames` is REAL for uncompressed YUV4MPEG2 (.y4m) - a
  pure stdlib parser (header tags, per-frame plane math for
  C420/C422/C444/mono, fps-stride sampling) with the same fake fallback;
  compressed codecs (h264/vp9) stay documented out-of-scope (no
  av/ffmpeg in the environment);
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


SAMPLED_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

# Y4M colorspace tag -> bytes per frame as a multiple of (W*H) in eighths:
# C420 = Y + 2 quarter-size chroma planes = 12/8, C422 = 16/8, C444 = 24/8,
# Cmono = 8/8.
_Y4M_EIGHTHS = {"420": 12, "422": 16, "444": 24, "mono": 8}


def _looks_like_y4m(b: bytes) -> bool:
    return b.startswith(b"YUV4MPEG2 ") or b.startswith(b"YUV4MPEG2\n")


def sample_video_frames(
    media_df: DataFrame, fps: float, use_codec: bool | None = None
) -> DataFrame:
    """Sample video payloads at `fps` to one row per kept frame,
    SAMPLED_FRAME_SCHEMA: (doc_id, frame_idx, width, height, frame binary
    = the luma/Y plane, row-major W*H bytes).

    REAL path: parses YUV4MPEG2 (.y4m) - the uncompressed interchange
    format every ffmpeg pipeline can emit - with zero third-party
    dependencies: a text header (W/H/F/C tags), then 'FRAME\\n' + raw
    planes per frame (C420/C422/C444/mono supported). The sampling stride
    is max(1, round(source_fps / fps)); frame_idx is the SOURCE index of
    each kept frame, so downstream alignment to timestamps is exact.
    Compressed codecs (h264 et al.) remain out of scope in this
    environment - documented, like the protobuf gap in tests/test_tws.py -
    and a non-Y4M payload on the real path raises ValueError with the doc
    id rather than silently faking.

    FAKE path (`use_codec=False` - plumbing tests / the oracle query over
    non-video payloads): deterministic md5-derived frames - d = md5(raw);
    n_frames = 2 + d[0] % 4, width = 16 + d[1] % 16, height = 16 + d[2] %
    16, frame i = md5(raw || chr(65+i)) digest bytes (printable suffix so
    a SQL oracle can reproduce it with string concat). Identical schema
    and batch shape either way.

    Both kernels are mapInPandas; at 100 TB the pre-codec byte-range plan
    (plan_frame_extraction) narrows what each worker reads, and this
    kernel decodes only the delivered ranges."""
    if use_codec is None:
        use_codec = have_video_codec()

    if use_codec:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {k: [] for k in ("doc_id", "frame_idx", "width", "height", "frame")}
                for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                    raw = bytes(b)
                    if not _looks_like_y4m(raw):
                        raise ValueError(
                            f"doc {doc_id}: payload is not YUV4MPEG2; "
                            "use_codec=False for non-video payloads "
                            "(compressed codecs are out of scope here)"
                        )
                    nl = raw.index(b"\n")
                    w = h = None
                    num, den, cs = 25, 1, "420"
                    for tok in raw[:nl].decode("ascii", "replace").split()[1:]:
                        if tok[0] == "W":
                            w = int(tok[1:])
                        elif tok[0] == "H":
                            h = int(tok[1:])
                        elif tok[0] == "F":
                            num, den = (int(x) for x in tok[1:].split(":"))
                        elif tok[0] == "C":
                            # C420 / C420jpeg / C420paldv / C420mpeg2 /
                            # C422 / C444 / Cmono - subsampling prefix only
                            tag = tok[1:]
                            cs = next(
                                (p for p in ("mono", "444", "422", "420")
                                 if tag.startswith(p)),
                                tag,
                            )
                    if w is None or h is None:
                        raise ValueError(f"doc {doc_id}: y4m header lacks W/H")
                    if cs not in _Y4M_EIGHTHS:
                        raise ValueError(
                            f"doc {doc_id}: unsupported y4m colorspace C{cs}"
                        )
                    fsize = w * h * _Y4M_EIGHTHS[cs] // 8
                    src_fps = num / den
                    stride = max(1, int(round(src_fps / fps)))
                    pos, idx = nl + 1, 0
                    while pos < len(raw):
                        fnl = raw.index(b"\n", pos)
                        if not raw[pos:fnl].startswith(b"FRAME"):
                            raise ValueError(
                                f"doc {doc_id}: malformed y4m frame marker"
                            )
                        body = raw[fnl + 1 : fnl + 1 + fsize]
                        if len(body) < fsize:
                            raise ValueError(
                                f"doc {doc_id}: truncated y4m frame {idx}"
                            )
                        if idx % stride == 0:
                            out["doc_id"].append(doc_id)
                            out["frame_idx"].append(idx)
                            out["width"].append(w)
                            out["height"].append(h)
                            out["frame"].append(body[: w * h])  # luma plane
                        pos = fnl + 1 + fsize
                        idx += 1
                yield pd.DataFrame(out)

    else:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {k: [] for k in ("doc_id", "frame_idx", "width", "height", "frame")}
                for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                    raw = bytes(b)
                    d = hashlib.md5(raw).digest()
                    for i in range(2 + d[0] % 4):
                        out["doc_id"].append(doc_id)
                        out["frame_idx"].append(i)
                        out["width"].append(16 + d[1] % 16)
                        out["height"].append(16 + d[2] % 16)
                        out["frame"].append(
                            hashlib.md5(raw + bytes([65 + i])).digest()
                        )
                yield pd.DataFrame(out)

    return media_df.mapInPandas(kernel, SAMPLED_FRAME_SCHEMA)


def have_video_codec() -> bool:
    """True when the Y4M parser's dependencies are importable (stdlib-only,
    so True in any CPython - kept for symmetry with the image/audio probes
    and for trimmed executor images). Compressed codecs (h264/vp9) would
    need av/ffmpeg, absent here; the Y4M path is the real uncompressed
    kernel, not a stub."""
    return True
