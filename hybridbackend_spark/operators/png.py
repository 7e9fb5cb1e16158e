"""Pure-Python PNG decoder (stdlib ``zlib`` + numpy unfiltering).

Built-in real codec #2 for the multimodal column family (after
``operators/jpeg.py``): decodes 8- and 16-bit-per-sample PNGs, both
sequential and Adam7-interlaced — grayscale (color type 0), RGB (2),
palette (3, 8-bit only per spec), gray+alpha (4), and RGBA (6) — to an
``(h, w, 3)`` uint8 array, the same output contract as
:func:`~hybridbackend_spark.operators.jpeg.decode_jpeg`. 16-bit
samples downsample by round(v / 257) (exact — 65535 = 255 * 257);
alpha is composited over black (the deterministic choice — no
configuration surface); palette entries resolve through PLTE.

PNG is lossless, so unlike the JPEG tests the fixture tests assert
EXACT pixel equality against the independently-encoded source arrays.

Reference parity note: the reference (DeepRec-AI/HybridBackend) ships
no media decoding at all — multimodal columns are part of this repo's
training-data-pipeline surface, with Spark-side plumbing (schema,
mapInArrow batching, codec registry in operators/multimodal.py) doing
the scale work; the per-payload decode is embarrassingly parallel.

Spec: ISO/IEC 15948 (PNG), RFC 1950/1951 (zlib/deflate via stdlib).
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["decode_png", "encode_png_rgb"]

_MAGIC = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: bytes, h: int, w: int, bpp: int):
    """Reverse PNG scanline filtering (types 0-4). ``bpp`` is bytes per
    pixel; each scanline is 1 filter byte + w*bpp data bytes. Rows are
    sequentially dependent, so the loop is per row; Sub/Paeth are also
    byte-sequential within a row (fine at fixture scale — the batch
    parallelism lives at the payload level, not inside one image)."""
    import numpy as np

    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev) .astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[i] = (int(line[i]) + pr) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = line
    return out


# Adam7 pass geometry: (x_start, y_start, x_step, y_step). Each pass is
# an independent sub-image with its own scanline filter bytes; empty
# passes contribute zero bytes.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _rows_to_samples(rows, h: int, w: int, ch: int, depth: int):
    """(h, w*bpp) filtered-byte rows -> (h, w, ch) uint8 samples.
    16-bit samples are big-endian pairs; downsampled to 8-bit by
    round(v / 257) = (v + 128) // 257 (exact: 65535 = 255 * 257)."""
    import numpy as np

    if depth == 8:
        return rows.reshape(h, w, ch)
    u = rows.reshape(h, w, ch, 2).astype(np.uint32)
    v16 = (u[..., 0] << 8) | u[..., 1]
    return ((v16 + 128) // 257).astype(np.uint8)


def _decode_png_strict(payload: bytes):
    import numpy as np

    if not payload.startswith(_MAGIC):
        raise ValueError("not a PNG")
    pos = len(_MAGIC)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = (
            struct.unpack(">I", payload[pos : pos + 4]),
            payload[pos + 4 : pos + 8],
        )
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError("chunk CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown interlace method {interlace}")
    if depth not in (8, 16) or ctype_n not in _CHANNELS:
        raise ValueError(f"unsupported depth/color {depth}/{ctype_n}")
    if depth == 16 and ctype_n == 3:
        raise ValueError("16-bit palette images are invalid PNG")
    if w == 0 or h == 0 or w > 1 << 15 or h > 1 << 15:
        raise ValueError("bad dimensions")
    ch = _CHANNELS[ctype_n]
    bpp = ch * (depth // 8)
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        if len(raw) != h * (1 + w * bpp):
            raise ValueError("decompressed size mismatch")
        px = _rows_to_samples(_unfilter(raw, h, w, bpp), h, w, ch, depth)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        px = np.zeros((h, w, ch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            n = ph * (1 + pw * bpp)
            sub = raw[off : off + n]
            if len(sub) != n:
                raise ValueError("decompressed size mismatch")
            off += n
            px[y0::dy, x0::dx] = _rows_to_samples(
                _unfilter(sub, ph, pw, bpp), ph, pw, ch, depth
            )
        if off != len(raw):
            raise ValueError("decompressed size mismatch")
    if ctype_n == 0:  # grayscale -> replicate
        return np.repeat(px, 3, axis=2)
    if ctype_n == 2:  # RGB
        return px
    if ctype_n == 3:  # palette
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = px[..., 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if ctype_n == 4:  # gray + alpha, composite over black
        g = px[..., 0].astype(np.uint16)
        a = px[..., 1].astype(np.uint16)
        v = ((g * a + 127) // 255).astype(np.uint8)
        return np.repeat(v[..., None], 3, axis=2)
    # RGBA, composite over black
    rgb = px[..., :3].astype(np.uint16)
    a = px[..., 3:4].astype(np.uint16)
    return ((rgb * a + 127) // 255).astype(np.uint8)


def encode_png_rgb(img) -> bytes:
    """Minimal RGB PNG writer: 8-bit color type 2, filter 0 scanlines,
    one IDAT. The production-side encoder for thumbnail/media sinks and
    for synthesizing deterministic test payloads inside queries — NOT
    the test-suite encoder (tests/test_png.py ships an independent one
    that exercises forward filters 1-4, so decoder verification never
    rests on this writer)."""
    import numpy as np

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png_rgb expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(img[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Decode a PNG to an (h, w, 3) uint8 ndarray, or None when the
    payload is not a PNG this decoder handles (wrong magic, depth 1/2/4
    bits, structural corruption, CRC mismatch) — the codec-registry
    fall-through contract, mirroring decode_jpeg."""
    try:
        return _decode_png_strict(payload)
    except (ValueError, IndexError, KeyError, struct.error, zlib.error):
        return None
