"""Pure-Python PNG decoder (stdlib ``zlib`` + numpy unfiltering).

Built-in real codec #2 for the multimodal column family (after
``operators/jpeg.py``): decodes every spec-valid depth/color
combination — 1/2/4/8/16-bit grayscale (color type 0), 8/16-bit RGB
(2), 1/2/4/8-bit palette (3), 8/16-bit gray+alpha (4) and RGBA (6) —
both sequential and Adam7-interlaced, to an ``(h, w, 3)`` uint8 array,
the same output contract as
:func:`~hybridbackend_spark.operators.jpeg.decode_jpeg`. 16-bit
samples downsample by round(v / 257) (exact — 65535 = 255 * 257);
sub-byte grayscale rescales by the exact factor 255/(2^depth - 1);
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


def _unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Reverse PNG scanline filtering (types 0-4). ``stride`` is the
    scanline payload width in bytes (``w*bpp`` at 8/16-bit depths,
    ``ceil(w*depth/8)`` packed bytes at sub-byte depths); ``bpp`` is the
    filter distance in bytes (1 for sub-byte, per spec). Each scanline
    is 1 filter byte + stride data bytes. Rows are sequentially
    dependent, so the loop is per row; Sub/Paeth are also
    byte-sequential within a row (fine at fixture scale — the batch
    parallelism lives at the payload level, not inside one image)."""
    import numpy as np
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


def _subbyte_pixels(rows, h: int, w: int, depth: int):
    """(h, stride) unfiltered packed bytes -> (h, w, 1) raw sample
    values (0 .. 2^depth - 1). Bits are big-endian within each byte
    (leftmost pixel first, per spec); trailing pad bits are dropped."""
    import numpy as np

    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits.reshape(h, w, depth) * weights).sum(axis=2).astype(
        np.uint8
    )[..., None]


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
    if depth not in (1, 2, 4, 8, 16) or ctype_n not in _CHANNELS:
        raise ValueError(f"unsupported depth/color {depth}/{ctype_n}")
    if depth == 16 and ctype_n == 3:
        raise ValueError("16-bit palette images are invalid PNG")
    if depth < 8 and ctype_n not in (0, 3):
        raise ValueError("sub-byte depth valid only for gray/palette")
    if w == 0 or h == 0 or w > 1 << 15 or h > 1 << 15:
        raise ValueError("bad dimensions")
    ch = _CHANNELS[ctype_n]
    # filter distance is a whole byte even when a byte packs several
    # pixels (spec: bpp rounds up to 1); stride is the packed row width
    bpp = max(1, ch * depth // 8)

    def _stride(width: int) -> int:
        return (width * ch * depth + 7) // 8

    def _pixels(sub: bytes, ph: int, pw: int):
        rows = _unfilter(sub, ph, _stride(pw), bpp)
        if depth < 8:
            return _subbyte_pixels(rows, ph, pw, depth)
        return _rows_to_samples(rows, ph, pw, ch, depth)

    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        if len(raw) != h * (1 + _stride(w)):
            raise ValueError("decompressed size mismatch")
        px = _pixels(raw, h, w)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        px = np.zeros((h, w, ch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            n = ph * (1 + _stride(pw))
            sub = raw[off : off + n]
            if len(sub) != n:
                raise ValueError("decompressed size mismatch")
            off += n
            px[y0::dy, x0::dx] = _pixels(sub, ph, pw)
        if off != len(raw):
            raise ValueError("decompressed size mismatch")
    if ctype_n == 0:  # grayscale -> replicate
        if depth < 8:  # exact: 255 = 85*3 = 17*15 = 255*1
            px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
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
    payload is not a valid PNG (wrong magic, structural corruption, CRC
    mismatch, spec-invalid depth/color combination) — the
    codec-registry fall-through contract, mirroring decode_jpeg. All
    spec-valid depth/color combinations decode: 1/2/4/8/16-bit."""
    try:
        return _decode_png_strict(payload)
    except (ValueError, IndexError, KeyError, struct.error, zlib.error):
        return None
