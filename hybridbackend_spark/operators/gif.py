"""Pure-Python GIF decoder (LZW + palette, no external libraries).

Built-in real codec #3 for the multimodal column family (after
``operators/jpeg.py`` and ``operators/png.py``): decodes GIF87a/GIF89a
images — global/local color tables, all LZW code sizes, Adam-style
4-pass interlacing, and GIF89a transparency (composited over black,
matching the PNG alpha convention) — to an ``(h, w, 3)`` uint8 array.
For animated GIFs the FIRST frame is returned (frame sampling beyond
that belongs to the video operators).

GIF is lossless (palette indices roundtrip exactly), so like PNG the
tests assert EXACT pixel equality against an independently-written
encoder.

Reference parity note: the reference (DeepRec-AI/HybridBackend) ships
no media decoding; see operators/multimodal.py for how codecs slot
into the Spark-side plumbing.

Spec: GIF89a specification (CompuServe, 1990); LZW per the spec's
variable-code-size scheme (9..12 bits, clear/end codes).
"""

from __future__ import annotations

import struct

__all__ = ["decode_gif"]


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int):
    """Decode GIF-variant LZW to a list of palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # dictionary: code -> byte sequence
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # spec: dictionary freezes at 12 bits
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < n_pixels:
        raise ValueError("LZW produced too few pixels")
    return bytes(out[:n_pixels])


def _deinterlace(idx, h):
    """GIF 4-pass interlace: rows are stored in passes starting at
    0/4/2/1 with strides 8/8/4/2 — scatter them back."""
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = idx.copy()
    for src, dst in enumerate(order):
        out[dst] = idx[src]
    return out


def _decode_gif_strict(payload: bytes):
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated header")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    transparent = None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:
                # graphic control: transparency flag + index
                packed = payload[pos + 1]
                if packed & 0x01:
                    transparent = payload[pos + 4]
            while True:  # skip sub-blocks
                sz = payload[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown block 0x{b0:02x}")
        # image descriptor
        left, top, w, h, iflags = struct.unpack(
            "<HHHHB", payload[pos + 1 : pos + 10]
        )
        pos += 10
        if w == 0 or h == 0 or w > 1 << 15 or h > 1 << 15:
            raise ValueError("bad dimensions")
        lct = None
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        pal = lct if lct is not None else gct
        if pal is None:
            raise ValueError("no color table")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError("bad LZW min code size")
        chunks = bytearray()
        while True:
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            chunks.extend(payload[pos : pos + sz])
            pos += sz
        idx = np.frombuffer(
            _lzw_decode(min_code_size, bytes(chunks), w * h), np.uint8
        ).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx, h)
        if int(idx.max()) >= len(pal):
            raise ValueError("palette index out of range")
        rgb = pal[idx].copy()
        if transparent is not None and transparent < len(pal):
            rgb[idx == transparent] = 0  # composite over black
        # first frame only; ignore the rest of an animation
        return rgb
    raise ValueError("no image data")


def decode_gif(payload: bytes):
    """Decode a GIF to an (h, w, 3) uint8 ndarray (first frame), or
    None when the payload is not a GIF this decoder handles — the
    codec-registry fall-through contract, mirroring decode_jpeg /
    decode_png."""
    try:
        return _decode_gif_strict(payload)
    except (ValueError, IndexError, KeyError, struct.error):
        return None
