"""GIF decoder tests (operators/gif.py).

The encoder here implements GIF-variant LZW compression independently
of the decoder's decompressor (dictionary build vs dictionary replay),
so exact roundtrip equality is real verification: GIF is lossless on
palette indices, and any defect on either side breaks the byte-for-byte
pixel match.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hybridbackend_spark.operators.gif import decode_gif

# ---------------------------------------------------------------------------
# independent encoder (tests only)
# ---------------------------------------------------------------------------


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF-variant LZW compression (dictionary build side — independent
    of the decoder's replay side)."""
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    for byte in indices:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code > 4095:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = bytes([byte])
    if prev:
        emit(table[prev])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(idx, palette, interlace=False, transparent=None,
               version=b"GIF89a", local_table=False):
    """Minimal GIF encoder (tests only): one image, global or local
    color table, optional interlacing and GIF89a transparency."""
    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    pal = np.asarray(palette, dtype=np.uint8)
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    pal_full = np.zeros((1 << bits, 3), np.uint8)
    pal_full[: len(pal)] = pal
    blob = bytearray(version)
    gflags = (0x80 | (bits - 1)) if not local_table else 0
    blob += struct.pack("<HHBBB", w, h, gflags, 0, 0)
    if not local_table:
        blob += pal_full.tobytes()
    if transparent is not None:
        blob += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    iflags = 0
    if interlace:
        iflags |= 0x40
    if local_table:
        iflags |= 0x80 | (bits - 1)
    blob += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    if local_table:
        blob += pal_full.tobytes()
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        stored = idx[order]
    else:
        stored = idx
    min_code = max(2, bits)
    data = _lzw_encode(min_code, stored.tobytes())
    blob += bytes([min_code])
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        blob += bytes([len(part)]) + part
    blob += bytes([0, 0x3B])
    return bytes(blob)


def _pal(n):
    """Deterministic n-entry palette with distinct RGB rows."""
    i = np.arange(n)
    return np.stack(
        [(i * 37 + 11) % 256, (i * 73 + 5) % 256, (i * 151 + 97) % 256], -1
    ).astype(np.uint8)


def _idx(h, w, n, seed=0):
    return ((np.arange(h * w).reshape(h, w) * (seed * 2 + 3)) % n).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# decoder tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_colors", [4, 16, 256])
def test_roundtrip_exact_palette_sizes(n_colors):
    pal = _pal(n_colors)
    idx = _idx(21, 17, n_colors, seed=n_colors)
    out = decode_gif(encode_gif(idx, pal))
    assert out.shape == (21, 17, 3)
    assert np.array_equal(out, pal[idx])


def test_dictionary_growth_across_code_sizes():
    """Enough distinct runs to push LZW past several code-size bumps."""
    pal = _pal(64)
    rng_idx = ((np.arange(64 * 64) * 31 + (np.arange(64 * 64) // 7) * 13)
               % 64).reshape(64, 64).astype(np.uint8)
    out = decode_gif(encode_gif(rng_idx, pal))
    assert np.array_equal(out, pal[rng_idx])


def test_frozen_dictionary_at_4096():
    """Spec-conformant encoders may FREEZE the dictionary at 4096
    entries instead of emitting a clear code; the decoder must stop
    growing its table in lockstep (round-6 advisor item: previously the
    table grew without bound and out-of-range codes were accepted
    leniently)."""
    from hybridbackend_spark.operators.gif import _lzw_decode

    import random

    rng = random.Random(7)
    min_cs = 8
    clear = 1 << min_cs
    end = clear + 1
    # incompressible data long enough to exhaust 4096 - 258 entries
    data = bytes(rng.randrange(256) for _ in range(40000))
    # independent FROZEN-dictionary encoder (no clear at 4095)
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_cs + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    frozen = False
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code <= 4095:
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            frozen = True
        prev = bytes([byte])
    if prev:
        emit(table[prev])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    assert frozen, "test must actually exercise the frozen state"
    assert _lzw_decode(min_cs, bytes(out), len(data)) == data


def test_interlaced_roundtrip():
    pal = _pal(8)
    idx = _idx(19, 11, 8, seed=2)
    out = decode_gif(encode_gif(idx, pal, interlace=True))
    assert np.array_equal(out, pal[idx])


def test_gif87a_and_local_color_table():
    pal = _pal(16)
    idx = _idx(9, 13, 16, seed=3)
    a = decode_gif(encode_gif(idx, pal, version=b"GIF87a"))
    b = decode_gif(encode_gif(idx, pal, local_table=True))
    assert np.array_equal(a, pal[idx])
    assert np.array_equal(b, pal[idx])


def test_transparency_composites_black():
    pal = _pal(4)
    idx = _idx(6, 6, 4, seed=1)
    out = decode_gif(encode_gif(idx, pal, transparent=2))
    want = pal[idx].copy()
    want[idx == 2] = 0
    assert np.array_equal(out, want)


def test_not_mine_falls_through():
    pal = _pal(4)
    idx = _idx(5, 5, 4)
    good = encode_gif(idx, pal)
    assert decode_gif(b"\x89PNG not gif") is None  # wrong magic
    assert decode_gif(good[:15]) is None  # truncated
    bad = bytearray(good)
    bad[-10] = 0xEE  # corrupt LZW stream tail
    # either decodes to None or raises nothing — never crashes
    decode_gif(bytes(bad))


def test_spark_strict_path_decodes_real_gif(spark):
    """End-to-end through the Spark operator in STRICT mode: a GIF
    payload's exact integer pixel stats match the same pixels fed as
    PPM (both lossless)."""
    from hybridbackend_spark.operators.multimodal import (
        encode_ppm,
        image_pixel_stats,
    )

    pal = _pal(32)
    idx = _idx(14, 10, 32, seed=5)
    rgb = pal[idx]
    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(idx, pal))),
         (2, bytearray(encode_ppm(rgb)))],
        ["media_id", "payload"],
    )
    rows = {r.media_id: r
            for r in image_pixel_stats(df, fake=False).collect()}
    a, b = rows[1], rows[2]
    assert (a.r_sum, a.g_sum, a.b_sum, a.weighted) == (
        b.r_sum, b.g_sum, b.b_sum, b.weighted
    )
