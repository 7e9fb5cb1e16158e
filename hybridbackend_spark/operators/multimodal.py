"""Multimodal column handling: opaque binary payloads + typed metadata,
with Arrow-batched (mapInPandas) decode / feature-extract / resize /
frame-sample operators.

Design: media is carried as ``binary`` columns beside a typed metadata
struct (mime, width/height, duration, sample_rate). All Spark-side
plumbing — schemas, partition sizing, UDF signatures, Arrow batch shapes —
is real and tested. The actual codec calls are STUBBED: the container has
no image/audio libraries, so each decoder either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the payload bytes (test mode), keeping pipelines runnable
end-to-end.

Scale notes: decode is the canonical Python-boundary operator — Arrow
batches amortize serde; ``spark.sql.execution.arrow.maxRecordsPerBatch``
and ``spark.sql.files.maxPartitionBytes`` bound per-task memory (media
rows are fat; size partitions by bytes, not rows). Feature vectors come
back as ``array<float>`` ready for the similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "IMAGE_META_SCHEMA",
    "AUDIO_META_SCHEMA",
    "VIDEO_META_SCHEMA",
    "with_media_meta",
    "decode_image_features",
    "resize_images",
    "sample_video_frames",
    "extract_audio_features",
]

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)
AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("fps", T.FloatType()),
    ]
)

_STRICT_MSG = (
    "real {kind} decoding requires a codec library not present in this "
    "environment; run with fake=True for the deterministic stub"
)


def with_media_meta(
    df: DataFrame, payload_col: str, mime: str, out_col: str = "meta", **fields
) -> DataFrame:
    """Attach a typed metadata struct next to a binary payload column."""
    parts = [F.lit(mime).alias("mime")] + [
        F.lit(v).alias(k) for k, v in fields.items()
    ]
    return df.withColumn(out_col, F.struct(*parts))


def _fake_vector(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-feature vector from payload bytes (sha256
    expansion) — stands in for a real encoder; stable across runs."""
    out = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "little")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return [float(x) for x in out[:dim]]


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 64,
    fake: bool = True,
) -> DataFrame:
    """Decode images and emit a feature vector per row via mapInPandas
    (Arrow batches; the only sanctioned Python boundary). Output schema:
    (id_col long, features array<float>).

    ``fake=False`` raises NotImplementedError inside the executor —
    replace ``_decode_batch`` with a real codec (PIL/torchvision) when
    available."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _decode_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(_STRICT_MSG.format(kind="image"))
            feats = [
                _fake_vector(bytes(p), dim) if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(_decode_batch, out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    width: int = 224,
    height: int = 224,
    fake: bool = True,
) -> DataFrame:
    """Resize images to (width, height); returns (id, payload binary,
    width, height). Stub: fake mode re-hashes the payload to a
    deterministic pseudo-resized blob of bounded size."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _resize_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(_STRICT_MSG.format(kind="image"))
            blobs = [
                hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
                if p is not None
                else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": blobs,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_resize_batch, out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced frames per video; one output ROW
    per frame (explode shape): (id, frame_idx, frame binary). Stub: fake
    frames are per-index hashes of the payload."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _sample_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(_STRICT_MSG.format(kind="video"))
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(
                        hashlib.sha256(bytes(p) + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(_sample_batch, out_schema)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 32,
    frame_bytes: int = 1024,
    fake: bool = True,
) -> DataFrame:
    """Audio feature extraction (MFCC-shaped stub): frame the byte stream
    into ``frame_bytes`` windows, compute a per-frame pseudo-energy, then
    pool frame energies into a ``dim``-length feature vector (mean/delta
    banding — the pooling shape a real MFCC pipeline produces). Output:
    (id, n_frames, features array<float>).

    Unlike :func:`decode_image_features` (one hash expansion of the whole
    payload), this follows the audio-native frame->feature->pool structure,
    so swapping in a real codec only replaces ``_frame_energy``."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _frame_energy(chunk: bytes, i: int) -> float:
        h = hashlib.sha256(chunk + i.to_bytes(4, "little")).digest()
        return sum(h[:8]) / (8 * 255.0)

    def _extract_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(_STRICT_MSG.format(kind="audio"))
            ids, counts, feats = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    ids.append(mid)
                    counts.append(0)
                    feats.append(None)
                    continue
                raw = bytes(p)
                chunks = [
                    raw[o : o + frame_bytes]
                    for o in range(0, max(len(raw), 1), frame_bytes)
                ]
                energies = [_frame_energy(c, i) for i, c in enumerate(chunks)]
                # pool per-frame energies into dim bands: band mean +
                # first difference (delta), cycled to fill dim
                vec = []
                for k in range(dim):
                    e = energies[k % len(energies)]
                    prev = energies[(k - 1) % len(energies)]
                    vec.append(float(e if k % 2 == 0 else e - prev))
                ids.append(mid)
                counts.append(len(chunks))
                feats.append(vec)
            yield pd.DataFrame(
                {id_col: ids, "n_frames": counts, "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(_extract_batch, out_schema)
