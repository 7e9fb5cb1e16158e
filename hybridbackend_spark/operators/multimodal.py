"""Multimodal column handling: opaque binary payloads + typed metadata,
with Arrow-batched (mapInPandas) decode / feature-extract / resize /
frame-sample operators.

Design: media is carried as ``binary`` columns beside a typed metadata
struct (mime, width/height, duration, sample_rate). All Spark-side
plumbing — schemas, partition sizing, UDF signatures, Arrow batch shapes —
is real and tested.

Codecs: formats decodable with container-available tooling are decoded
FOR REAL — PPM (P6) images via numpy, JPEG baseline AND progressive
(operators/jpeg.py, pure Python + numpy), PNG (operators/png.py,
stdlib zlib + numpy), GIF (operators/gif.py, pure-Python LZW), PCM16
WAV audio via the stdlib ``wave`` module, IMA ADPCM WAV
(operators/adpcm.py), a concatenated-PPM frame stream for video, and
ISO-BMFF MP4/M4A/MOV containers (operators/mp4.py) carrying PCM/G.711
audio tracks or PNG/motion-JPEG video tracks. PNG covers all five
filters, palette/gray/alpha variants, Adam7 interlace, and 16-bit
depth (round-6). Formats that genuinely require absent codec libraries
(MP3, AAC, H.264, arithmetic-coded JPEG) fall back per row to a
deterministic hash fake when ``fake=True`` (keeps pipelines runnable
end-to-end) or raise ``NotImplementedError`` in strict mode. The full
format x behavior matrix is pinned in COVERAGE.md ("Codec boundary")
and asserted by tests/test_codec_boundary.py. Payload sniffing is by
magic bytes, so one column can mix formats.

Scale notes: decode is the canonical Python-boundary operator — Arrow
batches amortize serde; ``spark.sql.execution.arrow.maxRecordsPerBatch``
and ``spark.sql.files.maxPartitionBytes`` bound per-task memory (media
rows are fat; size partitions by bytes, not rows). Feature vectors come
back as ``array<float>`` ready for the similarity operators.
"""

from __future__ import annotations

import hashlib
import io
import re
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "IMAGE_META_SCHEMA",
    "AUDIO_META_SCHEMA",
    "VIDEO_META_SCHEMA",
    "with_media_meta",
    "decode_image_features",
    "image_pixel_stats",
    "audio_sample_stats",
    "video_frame_stats",
    "resize_images",
    "sample_video_frames",
    "detect_scene_cuts",
    "extract_audio_features",
    "encode_ppm",
    "image_ahash",
    "image_near_dup_pairs",
    "register_codec",
    "unregister_codec",
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
    "payload is not a format decodable in this environment (PPM/WAV or a "
    "registered codec); real {kind} decoding of compressed formats "
    "requires a codec library not present here; register one with "
    "register_codec() or run with fake=True for the deterministic stub"
)


# ---------------------------------------------------------------------------
# Pluggable codec registry: where real codec libraries exist, they slot in
# without code change. A codec is (name, magic-byte prefix, decode fn);
# payloads are sniffed by prefix, first match wins. Decoder contracts:
#   image: decode(payload: bytes) -> (h, w, 3) uint8 ndarray, or None
#   audio: decode(payload: bytes) -> (mono float ndarray in [-1,1], rate),
#          or None
#   video: decode(payload: bytes) -> list of (h, w, 3) uint8 frames, or None
# Returning None means "not mine after all" — the sniff falls through to
# the next codec, then to the fake/strict fallback. Decoders are captured
# into the mapInPandas closure at operator-call time (a snapshot, so later
# registry edits don't mutate running plans) and must survive cloudpickle
# to the executors: functions from worker-importable modules (pickled by
# reference) or nested/dynamic functions (shipped by value) — never
# methods holding open resources.
# Built-in PPM/WAV/PPM-stream decoding always runs first.
# ---------------------------------------------------------------------------

_CODECS: dict[str, list[tuple[str, bytes, object]]] = {
    # baseline JPEG ships built-in (pure Python + numpy, operators/
    # jpeg.py) — registered below once _jpeg_decode exists; progressive/
    # arithmetic JPEGs make it return None and fall through as before
    "image": [],
    "audio": [],
    "video": [],
}


def register_codec(kind: str, name: str, magic: bytes, decode) -> None:
    """Register a real decoder for compressed payloads (e.g. JPEG via an
    imaging library, MP3 via an audio library, where installed). ``kind``
    is 'image' | 'audio' | 'video'; ``magic`` is the payload prefix that
    selects this codec (e.g. ``b"\\xff\\xd8\\xff"`` for JPEG). Re-using a
    name replaces the old entry."""
    if kind not in _CODECS:
        raise ValueError(f"unknown codec kind {kind!r}")
    _CODECS[kind] = [c for c in _CODECS[kind] if c[0] != name]
    _CODECS[kind].append((name, bytes(magic), decode))


def unregister_codec(kind: str, name: str) -> None:
    _CODECS[kind] = [c for c in _CODECS.get(kind, []) if c[0] != name]


def _codec_snapshot(kind: str) -> list[tuple[str, bytes, object]]:
    return list(_CODECS[kind])


def _try_codecs(codecs: list, payload: bytes):
    for _name, magic, decode in codecs:
        if payload.startswith(magic):
            out = decode(payload)
            if out is not None:
                return out
    return None


def with_media_meta(
    df: DataFrame, payload_col: str, mime: str, out_col: str = "meta", **fields
) -> DataFrame:
    """Attach a typed metadata struct next to a binary payload column."""
    parts = [F.lit(mime).alias("mime")] + [
        F.lit(v).alias(k) for k, v in fields.items()
    ]
    return df.withColumn(out_col, F.struct(*parts))


# ---------------------------------------------------------------------------
# Real codecs for container-decodable formats
# ---------------------------------------------------------------------------


def _jpeg_decode(payload: bytes):
    """Built-in baseline JPEG decode (pure Python + numpy, operators/
    jpeg.py) — module-level so it pickles by reference to executors."""
    from .jpeg import decode_jpeg

    return decode_jpeg(payload)


# JPEG magic is FF D8 (SOI); decode_jpeg itself rejects non-baseline
# frames by returning None, which falls through to fake/strict.
register_codec("image", "baseline-jpeg", b"\xff\xd8", _jpeg_decode)


def _png_decode(payload: bytes):
    """Built-in PNG decode (stdlib zlib + numpy, operators/png.py) —
    module-level so it pickles by reference to executors."""
    from .png import decode_png

    return decode_png(payload)


# 8-byte PNG signature; decode_png rejects interlaced/16-bit payloads by
# returning None, which falls through to fake/strict.
register_codec("image", "png", b"\x89PNG\r\n\x1a\n", _png_decode)


def _gif_decode(payload: bytes):
    """Built-in GIF decode (pure Python LZW, operators/gif.py) —
    module-level so it pickles by reference to executors."""
    from .gif import decode_gif

    return decode_gif(payload)


# "GIF8" covers both GIF87a and GIF89a; decode_gif returns the FIRST
# frame of animations and None on structural corruption.
register_codec("image", "gif", b"GIF8", _gif_decode)


def _adpcm_decode(payload: bytes):
    """Built-in IMA ADPCM WAV decode (pure Python, operators/adpcm.py)
    — module-level so it pickles by reference to executors."""
    from .adpcm import decode_adpcm_wav

    return decode_adpcm_wav(payload)


# PCM WAVs are consumed upstream by _parse_wav (stdlib wave refuses
# compressed format tags), so a RIFF payload reaching the registry is a
# compressed WAV: decode IMA ADPCM (tag 0x0011), None for other tags.
register_codec("audio", "ima-adpcm", b"RIFF", _adpcm_decode)


def _mp4_audio_decode(payload: bytes):
    """Built-in ISO-BMFF audio demux + uncompressed-codec decode
    (operators/mp4.py): PCM16 sowt/twos, 8-bit raw, G.711 ulaw/alaw.
    AAC stays a fall-through (None)."""
    from .mp4 import decode_mp4_audio

    return decode_mp4_audio(payload)


# BMFF's magic ("ftyp") sits at offset 4 behind a variable box size, so
# prefix matching can't select it; register with an empty prefix and let
# the decoder's own offset-4 check reject non-BMFF payloads immediately.
register_codec("audio", "mp4-audio", b"", _mp4_audio_decode)


def _mp4_video_decode(payload: bytes):
    """Built-in ISO-BMFF video demux + per-frame decode
    (operators/mp4.py): QuickTime 'png ' and motion-JPEG
    ('jpeg'/'mjpa') sample entries through the real PNG/JPEG decoders.
    Entropy-coded video (avc1/hev1/mp4v) stays a fall-through (None)."""
    from .mp4 import decode_mp4_video

    return decode_mp4_video(payload)


# Same empty-prefix registration as mp4-audio (magic at offset 4).
register_codec("video", "mp4-video", b"", _mp4_video_decode)

_PPM_HEADER = re.compile(rb"^P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s")


def _parse_ppm(payload: bytes):
    """Decode a binary PPM (P6) image to an (h, w, 3) uint8 array, or
    None if the payload is not PPM. Pure numpy — no codec library."""
    import numpy as np

    m = _PPM_HEADER.match(payload)
    if not m:
        return None
    w, h, maxval = (int(g) for g in m.groups())
    if maxval != 255:
        return None
    off = m.end()
    need = w * h * 3
    body = payload[off : off + need]
    if len(body) < need:
        return None
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(arr) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def _split_ppm_stream(payload: bytes) -> list[bytes]:
    """Split a concatenated-P6 stream (the toy video container) into the
    individual frame payloads; [] if the payload doesn't start with P6."""
    frames, off = [], 0
    while True:
        m = _PPM_HEADER.match(payload[off:])
        if not m:
            break
        w, h, _ = (int(g) for g in m.groups())
        end = off + m.end() + w * h * 3
        if end > len(payload):
            break
        frames.append(payload[off:end])
        off = end
    return frames


def _grid_features(img, grid: int = 4) -> list[float]:
    """Per-cell channel means over a grid x grid partition of the image,
    flattened (grid*grid*3 values in [0, 1]) — real pixel statistics in
    the shape a small visual encoder would emit."""
    import numpy as np

    feats = []
    for rows in np.array_split(img, grid, axis=0):
        for cell in np.array_split(rows, grid, axis=1):
            feats.extend(float(x) / 255.0 for x in cell.reshape(-1, 3).mean(axis=0))
    return feats


def _parse_wav(payload: bytes):
    """Decode PCM16 WAV to (mono float array in [-1, 1], sample_rate), or
    None if not parseable. Stdlib ``wave`` + numpy — no codec library."""
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            if wf.getsampwidth() != 2:
                return None
            rate = wf.getframerate()
            n = wf.getnframes()
            raw = wf.readframes(n)
            x = np.frombuffer(raw, dtype="<i2").astype("float64")
            ch = wf.getnchannels()
            if ch > 1:
                x = x.reshape(-1, ch).mean(axis=1)
            return x / 32768.0, rate
    except Exception:
        return None


def _fake_vector(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-feature vector from payload bytes (sha256
    expansion) — the fallback for compressed formats; stable across runs."""
    out = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "little")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return [float(x) for x in out[:dim]]


def _fit_dim(feats: list[float], dim: int) -> list[float]:
    """Cycle/truncate a feature list to exactly ``dim`` values."""
    if not feats:
        return [0.0] * dim
    return [float(feats[i % len(feats)]) for i in range(dim)]


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------


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

    PPM payloads are decoded for real (4x4 grid of per-cell channel
    means -> ``dim``); registered image codecs (see
    :func:`register_codec`) handle compressed formats. Remaining
    formats: deterministic hash fake when ``fake=True``, else
    NotImplementedError."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    codecs = _codec_snapshot("image")

    def _one(p) -> list[float] | None:
        if p is None:
            return None
        raw = bytes(p)
        img = _parse_ppm(raw)
        if img is None:
            img = _try_codecs(codecs, raw)
        if img is not None:
            return _fit_dim(_grid_features(img), dim)
        if not fake:
            raise NotImplementedError(_STRICT_MSG.format(kind="image"))
        return _fake_vector(raw, dim)

    def _decode_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": [_one(p) for p in pdf[payload_col]]}
            )

    return df.select(id_col, payload_col).mapInPandas(_decode_batch, out_schema)


def image_pixel_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Exact integer pixel statistics per image — the media-QA readout
    (corrupt-payload triage, black/blank-frame detection, dedup
    pre-screen) and the numerically-replayable proof that a decode path
    is lossless. Output: (id_col, height, width, r_sum, g_sum, b_sum,
    weighted) where ``weighted`` = sum over pixels of
    (r + 2g + 3b) * (1 + (x + y) % 7) — position-sensitive, so any
    pixel transposition or channel swap in a codec changes it.

    Strict by default (``fake=False``): an undecodable payload raises
    rather than contributing fabricated stats. All sums are int64 on
    uint8 pixels (overflow needs > 2^44 pixels per image)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
            T.StructField("weighted", T.LongType()),
        ]
    )
    codecs = _codec_snapshot("image")

    def _one(p):
        import numpy as np

        if p is None:
            return None
        raw = bytes(p)
        img = _parse_ppm(raw)
        if img is None:
            img = _try_codecs(codecs, raw)
        if img is None:
            if not fake:
                raise NotImplementedError(_STRICT_MSG.format(kind="image"))
            d = hashlib.sha256(raw).digest()
            v = int.from_bytes(d[:6], "big")
            return (0, 0, v, v, v, v)
        h, w = img.shape[:2]
        px = img.astype(np.int64)
        yy, xx = np.mgrid[0:h, 0:w]
        wt = 1 + (xx + yy) % 7
        lin = px[..., 0] + 2 * px[..., 1] + 3 * px[..., 2]
        return (
            h,
            w,
            int(px[..., 0].sum()),
            int(px[..., 1].sum()),
            int(px[..., 2].sum()),
            int((lin * wt).sum()),
        )

    def _stats_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            stats = [_one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "height": [s and s[0] for s in stats],
                    "width": [s and s[1] for s in stats],
                    "r_sum": [s and s[2] for s in stats],
                    "g_sum": [s and s[3] for s in stats],
                    "b_sum": [s and s[4] for s in stats],
                    "weighted": [s and s[5] for s in stats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _stats_batch, out_schema
    )


def audio_sample_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Exact integer sample statistics per audio payload — the audio
    counterpart of :func:`image_pixel_stats` (clipping/silence QA, and
    the numerically-replayable proof that a decode path is lossless for
    PCM). The decoded mono float signal is requantized to int16 (exact
    for PCM16: x/32768.0 is dyadic); output: (id_col, n_samples, rate,
    sum_abs, weighted) with ``weighted`` = sum of s_i * (1 + i % 7) —
    position-sensitive, so sample reordering or frame loss flips it.

    Strict by default: an undecodable payload raises rather than
    contributing fabricated stats."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("rate", T.LongType()),
            T.StructField("sum_abs", T.LongType()),
            T.StructField("weighted", T.LongType()),
        ]
    )
    codecs = _codec_snapshot("audio")

    def _one(p):
        import numpy as np

        if p is None:
            return None
        raw = bytes(p)
        wav = _parse_wav(raw)
        if wav is None:
            wav = _try_codecs(codecs, raw)
        if wav is None:
            if not fake:
                raise NotImplementedError(_STRICT_MSG.format(kind="audio"))
            d = hashlib.sha256(raw).digest()
            v = int.from_bytes(d[:6], "big")
            return (0, 0, v, v)
        x, rate = wav
        s = np.rint(np.asarray(x, dtype=np.float64) * 32768.0).astype(
            np.int64
        )
        wt = 1 + np.arange(len(s), dtype=np.int64) % 7
        return (
            len(s),
            int(rate),
            int(np.abs(s).sum()),
            int((s * wt).sum()),
        )

    def _stats_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            stats = [_one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_samples": [s and s[0] for s in stats],
                    "rate": [s and s[1] for s in stats],
                    "sum_abs": [s and s[2] for s in stats],
                    "weighted": [s and s[3] for s in stats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _stats_batch, out_schema
    )


def video_frame_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Exact integer pixel statistics PER FRAME of a video payload —
    the video counterpart of :func:`image_pixel_stats` (black/frozen
    frame triage, and the replayable proof that a demux+decode path is
    lossless). One output row per frame (explode shape):
    (id_col, frame_idx, height, width, r_sum, g_sum, b_sum, weighted)
    with the same position-sensitive ``weighted`` formula as
    ``image_pixel_stats``, so a dropped, reordered, or corrupted frame
    flips a row.

    Decodes concatenated-PPM streams and registered video codecs (e.g.
    PNG/MJPEG-in-MP4, operators/mp4.py). Strict by default."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
            T.StructField("weighted", T.LongType()),
        ]
    )
    codecs = _codec_snapshot("video")

    def _frames(raw: bytes):
        import numpy as np

        real = _split_ppm_stream(raw)
        if real:
            return [_parse_ppm(fr) for fr in real]
        decoded = _try_codecs(codecs, raw)
        if decoded is not None:
            return list(decoded)
        if not fake:
            raise NotImplementedError(_STRICT_MSG.format(kind="video"))
        d = hashlib.sha256(raw).digest()
        return [
            np.full((1, 1, 3), d[i] % 256, dtype=np.uint8) for i in range(2)
        ]

    def _stats_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in out_schema.fieldNames()}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                for fi, img in enumerate(_frames(bytes(p))):
                    h, w = img.shape[:2]
                    px = img.astype(np.int64)
                    yy, xx = np.mgrid[0:h, 0:w]
                    wt = 1 + (xx + yy) % 7
                    lin = px[..., 0] + 2 * px[..., 1] + 3 * px[..., 2]
                    rows[id_col].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["height"].append(h)
                    rows["width"].append(w)
                    rows["r_sum"].append(int(px[..., 0].sum()))
                    rows["g_sum"].append(int(px[..., 1].sum()))
                    rows["b_sum"].append(int(px[..., 2].sum()))
                    rows["weighted"].append(int((lin * wt).sum()))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        _stats_batch, out_schema
    )


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    width: int = 224,
    height: int = 224,
    fake: bool = True,
) -> DataFrame:
    """Resize images to (width, height); returns (id, payload binary,
    width, height). PPM payloads get a REAL nearest-neighbor resize
    (numpy index gather) re-encoded as PPM; other formats fall back to a
    deterministic pseudo-blob (or raise in strict mode)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    codecs = _codec_snapshot("image")

    def _one(p):
        import numpy as np

        if p is None:
            return None
        raw = bytes(p)
        img = _parse_ppm(raw)
        if img is None:
            img = _try_codecs(codecs, raw)
        if img is not None:
            # custom-decoded images are re-encoded as PPM (the engine's
            # uncompressed interchange format)
            h, w = img.shape[:2]
            rows = (np.arange(height) * h) // height
            cols = (np.arange(width) * w) // width
            return encode_ppm(img[rows][:, cols])
        if not fake:
            raise NotImplementedError(_STRICT_MSG.format(kind="image"))
        return hashlib.sha256(raw + f"{width}x{height}".encode()).digest()

    def _resize_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [_one(p) for p in pdf[payload_col]],
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
    per frame (explode shape): (id, frame_idx, frame binary).

    Concatenated-PPM streams are split and sampled for real (each
    emitted frame is itself a decodable PPM); other containers fall back
    to per-index payload hashes (or raise in strict mode)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    codecs = _codec_snapshot("video")

    def _sample_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                raw = bytes(p)
                real = _split_ppm_stream(raw)
                if not real:
                    decoded = _try_codecs(codecs, raw)
                    if decoded:
                        # custom frames re-encode as PPM for the output
                        real = [encode_ppm(fr) for fr in decoded]
                if real:
                    # evenly spaced positions over the decoded frame list
                    k = min(n_frames, len(real))
                    for i in range(k):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(real[(i * len(real)) // k])
                    continue
                if not fake:
                    raise NotImplementedError(_STRICT_MSG.format(kind="video"))
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(
                        hashlib.sha256(raw + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(_sample_batch, out_schema)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 32,
    frame_ms: int = 25,
    frame_bytes: int = 1024,
    fake: bool = True,
) -> DataFrame:
    """Audio feature extraction: frame the signal, compute per-frame RMS
    energy, pool frame energies into a ``dim``-length vector (mean +
    delta banding — the pooling shape a real MFCC pipeline produces).
    Output: (id, n_frames, features array<float>).

    PCM16 WAV payloads are decoded for real (stdlib ``wave``): frames
    are ``frame_ms`` windows of the mono signal. Other formats frame the
    raw bytes into ``frame_bytes`` windows with hashed pseudo-energies
    (or raise in strict mode)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _fake_energy(chunk: bytes, i: int) -> float:
        h = hashlib.sha256(chunk + i.to_bytes(4, "little")).digest()
        return sum(h[:8]) / (8 * 255.0)

    codecs = _codec_snapshot("audio")

    def _energies(raw: bytes) -> list[float]:
        import numpy as np

        wav = _parse_wav(raw)
        if wav is None:
            wav = _try_codecs(codecs, raw)
        if wav is not None:
            x, rate = wav
            flen = max(1, (rate * frame_ms) // 1000)
            return [
                float(np.sqrt(np.mean(x[o : o + flen] ** 2)))
                for o in range(0, max(len(x), 1), flen)
            ]
        if not fake:
            raise NotImplementedError(_STRICT_MSG.format(kind="audio"))
        chunks = [
            raw[o : o + frame_bytes]
            for o in range(0, max(len(raw), 1), frame_bytes)
        ]
        return [_fake_energy(c, i) for i, c in enumerate(chunks)]

    def _extract_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, counts, feats = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    ids.append(mid)
                    counts.append(0)
                    feats.append(None)
                    continue
                energies = _energies(bytes(p))
                # pool per-frame energies into dim bands: band mean +
                # first difference (delta), cycled to fill dim
                vec = []
                for k in range(dim):
                    e = energies[k % len(energies)]
                    prev = energies[(k - 1) % len(energies)]
                    vec.append(float(e if k % 2 == 0 else e - prev))
                ids.append(mid)
                counts.append(len(energies))
                feats.append(vec)
            yield pd.DataFrame(
                {id_col: ids, "n_frames": counts, "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(_extract_batch, out_schema)


def _ahash64(img) -> int:
    """64-bit average hash: 8x8 nearest-neighbor luminance grid, bit i =
    cell_i > grid mean. Near-identical images differ in a few bits;
    unrelated images differ in ~32.

    EXACT integer arithmetic: cell > mean is evaluated as the
    cross-multiplied 3*lum*64 > sum(3*lum) on integer channel sums, so
    the hash is bit-stable across engines and platforms (a float mean
    flips cells that sit exactly ON the mean)."""
    h, w, _ = img.shape
    lum3 = img.astype(int).sum(axis=2)  # 3x luminance, exact int
    cells = []
    for gy in range(8):
        for gx in range(8):
            y = min(int((gy + 0.5) * h / 8), h - 1)
            x = min(int((gx + 0.5) * w / 8), w - 1)
            cells.append(int(lum3[y, x]))
    total = sum(cells)
    bits = 0
    for i, c in enumerate(cells):
        if c * 64 > total:
            bits |= 1 << i
    # interpret as signed 64-bit for Spark LongType
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_ahash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Perceptual average-hash per image: (id, ahash long). Real for
    PPM / registered codecs; deterministic fake fallback (strict mode
    raises) — same codec policy as :func:`decode_image_features`.
    One Arrow-batched pass, zero shuffle."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("ahash", T.LongType()),
        ]
    )
    codecs = _codec_snapshot("image")

    def _one(p):
        if p is None:
            return None
        raw = bytes(p)
        img = _parse_ppm(raw)
        if img is None:
            img = _try_codecs(codecs, raw)
        if img is not None:
            return _ahash64(img)
        if not fake:
            raise NotImplementedError(_STRICT_MSG.format(kind="image"))
        import hashlib

        h = int.from_bytes(hashlib.md5(raw).digest()[:8], "big")
        return h - (1 << 64) if h >= (1 << 63) else h

    def _hash_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ahash": pd.array(
                        [_one(p) for p in pdf[payload_col]], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_hash_batch, out_schema)


def image_near_dup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    bands: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Near-duplicate image pairs: average-hash each image, band the 64
    bits into ``bands`` chunks, self-join only rows agreeing on at least
    one whole band (a hash pair within ``max_hamming < bands`` bits MUST
    agree on some band — pigeonhole, so recall is exact for small
    distances), then verify exact Hamming via ``bit_count(xor)``. The
    image-side mirror of :func:`~hybridbackend_spark.operators.dedup.
    simhash_candidates`; candidate volume is bounded by band-bucket
    collisions, never all pairs.

    Returns (id_a, id_b, hamming).

    .. note:: signature change in round 6 — the default ``max_hamming``
       dropped 6→3 and ``max_hamming >= bands`` now raises ``ValueError``
       (the pigeonhole recall proof needs ``bands > max_hamming``; the
       old default pair (6, bands=4) silently missed pairs). Callers on
       the previous default must either lower ``max_hamming`` or raise
       ``bands`` (e.g. 8) to keep exact recall.
    """
    if not (0 < bands <= 64) or 64 % bands != 0:
        raise ValueError("bands must divide 64")
    if max_hamming >= bands:
        # the pigeonhole recall proof needs more bands than flipped
        # bits: with B bands a pair differing in >= B bits can spread
        # one flip into every band and never collide
        raise ValueError(
            f"max_hamming={max_hamming} requires bands > max_hamming "
            f"(got {bands}): band recall is only exact below the band "
            "count"
        )
    width = 64 // bands
    hashed = image_ahash(df, payload_col, id_col, fake)
    band_cols = [
        F.expr(
            f"cast((ahash >> {b * width}) & {(1 << width) - 1} as bigint)"
        ).alias("bucket")
        for b in range(bands)
    ]
    banded = hashed.select(
        F.col(id_col),
        F.col("ahash"),
        F.posexplode(F.array(*band_cols)).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.ahash").alias("_ha"),
            F.col("b.ahash").alias("_hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.expr("_ha ^ _hb"))
    return (
        cands.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def detect_scene_cuts(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    threshold: float = 30.0,
    fake: bool = True,
) -> DataFrame:
    """Scene-cut detection per video: consecutive decoded frames compare
    by mean absolute luminance difference; a jump above ``threshold``
    (0-255 scale) marks a cut. Output one row per frame TRANSITION:
    (id, frame_idx, diff, is_cut) — frame_idx is the right frame of the
    pair. Real for concatenated-PPM streams / registered codecs;
    deterministic fake diffs otherwise (strict mode raises).

    The shot-segmentation primitive of video curation pipelines — cuts
    bound the clips later stages sample/caption. Arrow-batched
    mapInPandas, zero shuffle."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("diff", T.DoubleType()),
            T.StructField("is_cut", T.BooleanType()),
        ]
    )
    codecs = _codec_snapshot("video")

    def _cuts_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, diffs, cuts = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                raw = bytes(p)
                frames = [
                    _parse_ppm(fp) for fp in _split_ppm_stream(raw)
                ]
                frames = [f for f in frames if f is not None]
                if not frames:
                    decoded = _try_codecs(codecs, raw)
                    if decoded:
                        frames = list(decoded)
                if frames:
                    for i in range(1, len(frames)):
                        a = frames[i - 1].mean(axis=2)
                        b = frames[i].mean(axis=2)
                        if a.shape != b.shape:
                            d = 255.0  # resolution change = hard cut
                        else:
                            d = float(abs(a - b).mean())
                        ids.append(mid)
                        idxs.append(i)
                        diffs.append(round(d, 4))
                        cuts.append(d > threshold)
                    continue
                if not fake:
                    raise NotImplementedError(_STRICT_MSG.format(kind="video"))
                h = int.from_bytes(hashlib.sha256(raw).digest()[:4], "big")
                ids.append(mid)
                idxs.append(1)
                diffs.append(float(h % 256))
                cuts.append((h % 256) > threshold)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "diff": diffs,
                    "is_cut": cuts,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_cuts_batch, out_schema)
