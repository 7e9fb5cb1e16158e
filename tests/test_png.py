"""PNG decoder tests (operators/png.py).

The encoder here is written independently of the decoder (forward
filtering + chunk framing straight from the spec), so exact roundtrip
equality is real verification: PNG is lossless, and any defect in
either side breaks the byte-for-byte pixel match.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hybridbackend_spark.operators.png import decode_png

# ---------------------------------------------------------------------------
# independent encoder (tests only)
# ---------------------------------------------------------------------------

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_line(ftype, line, prev, bpp):
    """Forward-apply PNG filter ``ftype`` to one scanline (spec
    definitions, independent of the decoder's reverse pass)."""
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        x = int(line[i])
        a = int(line[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 0:
            v = x
        elif ftype == 1:
            v = x - a
        elif ftype == 2:
            v = x - b
        elif ftype == 3:
            v = x - ((a + b) >> 1)
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            v = x - pr
        out[i] = v & 0xFF
    return bytes(out)


# Adam7 pass geometry, restated independently from the decoder
# (x_start, y_start, x_step, y_step).
_ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _pack_subbyte_row(row, depth):
    """Pack one scanline of sub-byte samples big-endian-first into
    bytes, zero-padding the tail (spec bit order) — written directly
    from the spec, independent of the decoder's unpackbits path."""
    bits = []
    for v in row:
        for k in range(depth - 1, -1, -1):
            bits.append((int(v) >> k) & 1)
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(b << (7 - i) for i, b in enumerate(bits[j : j + 8]))
        for j in range(0, len(bits), 8)
    )


def encode_png(img, color_type=2, filters=None, palette=None,
               interlace=0, depth=8):
    """Minimal PNG encoder (tests only). ``img`` shape by color type:
    0 -> (h, w), 2 -> (h, w, 3), 3 -> (h, w) palette indices (requires
    ``palette`` (n, 3)), 4 -> (h, w, 2), 6 -> (h, w, 4). ``filters``
    picks the per-scanline filter type (int or list cycling 0-4).
    ``depth=16`` takes uint16 samples (written big-endian); depths
    1/2/4 pack samples big-endian-first within each byte;
    ``interlace=1`` writes Adam7 passes, each filtered independently."""
    img = np.asarray(img, dtype=np.uint16 if depth == 16 else np.uint8)
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    px = img.reshape(h, w, ch)
    bpp = max(1, ch * depth // 8)

    def pick(y):
        if filters is None:
            return 0
        if isinstance(filters, int):
            return filters
        return filters[y % len(filters)]

    def emit_sub(sub, raw):
        ph, pw = sub.shape[:2]
        prev = bytes((pw * ch * depth + 7) // 8)
        for y in range(ph):
            row = sub[y]
            if depth == 16:
                line = row.astype(">u2").tobytes()
            elif depth == 8:
                line = row.astype(np.uint8).tobytes()
            else:
                line = _pack_subbyte_row(row.reshape(-1), depth)
            ftype = pick(y)
            raw.append(ftype)
            raw.extend(_filter_line(ftype, line, prev, bpp))
            prev = line

    raw = bytearray()
    if interlace == 0:
        emit_sub(px, raw)
    else:
        for x0, y0, dx, dy in _ADAM7_PASSES:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                emit_sub(sub, raw)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    blob = _MAGIC + _chunk(b"IHDR", ihdr)
    if palette is not None:
        blob += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    blob += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    blob += _chunk(b"IEND", b"")
    return blob


def _grad(h, w, seed=0):
    """Deterministic full-range test image — exercises every filter's
    arithmetic including wraparound."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 7 + yy * 3 + seed * 11) % 256
    g = (xx * 5 + yy * 13 + seed * 17) % 256
    b = (xx * 2 + yy * 23 + seed * 29) % 256
    return np.stack([r, g, b], -1).astype(np.uint8)


def fixture_recipes():
    """(expected_rgb, encoder_input, encode_kwargs) per committed
    fixture PNG — shared by tools/make_png_fixtures.py (generation) and
    test_fixture_pngs_pinned_exact (verification). expected_rgb is what
    decode_png must return EXACTLY (lossless)."""
    rgb = _grad(21, 17, seed=1)
    gray = _grad(14, 14, seed=2)[:, :, 0]
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8
    )
    idx = (np.arange(12 * 9).reshape(12, 9) % 4).astype(np.uint8)
    img4 = _grad(10, 11, seed=3)
    a4 = ((np.arange(110).reshape(10, 11) * 41) % 256).astype(np.uint8)
    rgba = np.dstack([img4, a4])
    rgba_rgb = (
        (img4.astype(np.uint16) * a4[..., None].astype(np.uint16) + 127)
        // 255
    ).astype(np.uint8)
    return {
        "rgb_mixed_filters.png": (
            rgb, rgb, dict(filters=[0, 1, 2, 3, 4])
        ),
        "gray_paeth.png": (
            np.repeat(gray[..., None], 3, axis=2), gray,
            dict(color_type=0, filters=4),
        ),
        "palette_sub.png": (
            pal[idx], idx, dict(color_type=3, palette=pal, filters=1)
        ),
        "rgba_avg.png": (rgba_rgb, rgba, dict(color_type=6, filters=3)),
    }


# ---------------------------------------------------------------------------
# decoder tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_exact_each_filter(ftype):
    img = _grad(13, 17, seed=ftype)
    out = decode_png(encode_png(img, filters=ftype))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_rgb_roundtrip_mixed_filters():
    img = _grad(23, 9, seed=5)
    out = decode_png(encode_png(img, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(out, img)


def test_grayscale_replicates_channels():
    g = _grad(11, 12)[:, :, 0]
    out = decode_png(encode_png(g, color_type=0, filters=[2, 4]))
    assert out.shape == (11, 12, 3)
    assert np.array_equal(out[..., 0], g)
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 1], out[..., 2])


def test_palette_resolves_plte():
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8
    )
    idx = (np.arange(48).reshape(6, 8) % 4).astype(np.uint8)
    out = decode_png(
        encode_png(idx, color_type=3, palette=pal, filters=1)
    )
    assert np.array_equal(out, pal[idx])


def test_rgba_composites_over_black():
    img = _grad(7, 5, seed=2)
    a = ((np.arange(35).reshape(7, 5) * 37) % 256).astype(np.uint8)
    rgba = np.dstack([img, a])
    out = decode_png(encode_png(rgba, color_type=6, filters=4))
    want = (
        (img.astype(np.uint16) * a[..., None].astype(np.uint16) + 127)
        // 255
    ).astype(np.uint8)
    assert np.array_equal(out, want)


def test_gray_alpha_composites_over_black():
    g = _grad(6, 6)[:, :, 1]
    a = ((np.arange(36).reshape(6, 6) * 29) % 256).astype(np.uint8)
    ga = np.dstack([g, a])
    out = decode_png(encode_png(ga, color_type=4, filters=3))
    want = (
        (g.astype(np.uint16) * a.astype(np.uint16) + 127) // 255
    ).astype(np.uint8)
    assert np.array_equal(out[..., 0], want)
    assert np.array_equal(out[..., 0], out[..., 2])


def test_not_mine_falls_through():
    img = _grad(4, 4)
    good = encode_png(img)
    assert decode_png(b"\xff\xd8\xff\xe0 not png") is None  # wrong magic
    assert decode_png(good[:20]) is None  # truncated
    # flip one IDAT byte -> CRC mismatch -> None, not garbage pixels
    bad = bytearray(good)
    bad[len(bad) - 20] ^= 0xFF
    assert decode_png(bytes(bad)) is None
    # spec-invalid depth (3 bits) -> fall-through, not garbage
    ihdr3 = struct.pack(">IIBBBBB", 4, 4, 3, 0, 0, 0, 0)
    blob3 = (
        _MAGIC
        + _chunk(b"IHDR", ihdr3)
        + _chunk(b"IDAT", zlib.compress(bytes(4 * (1 + 2))))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(blob3) is None


@pytest.mark.parametrize("dims", [(13, 17), (8, 8), (7, 5), (1, 1),
                                  (2, 9), (9, 2)])
def test_adam7_interlaced_roundtrip_exact(dims):
    """Adam7 across shapes that exercise empty passes (1x1 has five
    empty passes), ragged pass widths, and per-pass filter chains."""
    h, w = dims
    img = _grad(h, w, seed=h * 31 + w)
    out = decode_png(encode_png(img, interlace=1, filters=[0, 1, 2, 3, 4]))
    assert out is not None and np.array_equal(out, img)


def test_adam7_grayscale_and_rgba():
    g = _grad(11, 13, seed=5)[:, :, 1]
    out = decode_png(encode_png(g, color_type=0, interlace=1, filters=4))
    assert np.array_equal(out[..., 0], g)
    assert np.array_equal(out[..., 0], out[..., 2])
    rgb = _grad(10, 6, seed=6)
    a = ((np.arange(60).reshape(10, 6) * 37) % 256).astype(np.uint8)
    rgba = np.dstack([rgb, a])
    out = decode_png(encode_png(rgba, color_type=6, interlace=1,
                                filters=[2, 4]))
    want = (
        (rgb.astype(np.uint16) * a[..., None].astype(np.uint16) + 127)
        // 255
    ).astype(np.uint8)
    assert np.array_equal(out, want)


def _down16(v16):
    """The decoder's documented 16->8 downsample: round(v/257)."""
    return ((v16.astype(np.uint32) + 128) // 257).astype(np.uint8)


def test_16bit_rgb_roundtrip_each_filter():
    yy, xx = np.mgrid[0:9, 0:12]
    img16 = np.stack(
        [(xx * 5387 + yy * 911) % 65536,
         (xx * 257 + yy * 65321) % 65536,
         (xx * 40961 + yy * 13) % 65536], -1
    ).astype(np.uint16)
    for ftype in range(5):
        out = decode_png(encode_png(img16, depth=16, filters=ftype))
        assert out is not None and np.array_equal(out, _down16(img16))
    # boundary values: 0 -> 0, 65535 -> 255, 128 -> 0, 129 -> 1
    edge = np.array([[[0, 65535, 128], [129, 32767, 32896]]], np.uint16)
    out = decode_png(encode_png(edge, depth=16))
    assert np.array_equal(
        out, np.array([[[0, 255, 0], [1, 127, 128]]], np.uint8)
    )


def test_16bit_gray_alpha_and_interlaced_16bit():
    g16 = ((np.arange(88).reshape(8, 11) * 5387) % 65536).astype(np.uint16)
    a16 = ((np.arange(88).reshape(8, 11) * 911 + 7) % 65536).astype(
        np.uint16
    )
    ga = np.dstack([g16, a16])
    out = decode_png(encode_png(ga, color_type=4, depth=16, filters=4))
    g8, a8 = _down16(g16).astype(np.uint16), _down16(a16).astype(np.uint16)
    want = ((g8 * a8 + 127) // 255).astype(np.uint8)
    assert np.array_equal(out[..., 0], want)
    # 16-bit + Adam7 together
    img16 = np.stack([g16, a16, (g16 ^ a16)], -1).astype(np.uint16)
    out = decode_png(
        encode_png(img16, depth=16, interlace=1, filters=[1, 3])
    )
    assert np.array_equal(out, _down16(img16))


def test_16bit_palette_rejected():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.zeros((4, 4), np.uint16)
    assert decode_png(
        encode_png(idx, color_type=3, palette=pal, depth=16)
    ) is None


def test_spark_strict_path_decodes_real_png(spark):
    """End-to-end through the Spark operator in STRICT mode: a PNG
    payload produces pixel features with no fake and no raise, and —
    PNG being lossless — they match the SAME pixels fed as PPM
    exactly."""
    from hybridbackend_spark.operators.multimodal import (
        decode_image_features,
        encode_ppm,
    )

    img = _grad(16, 16, seed=11)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img, filters=[0, 1, 2, 3, 4]))),
         (2, bytearray(encode_ppm(img)))],
        ["media_id", "payload"],
    )
    rows = {r["media_id"]: r["features"]
            for r in decode_image_features(df, dim=12, fake=False).collect()}
    assert np.array_equal(np.array(rows[1]), np.array(rows[2]))


def test_fixture_pngs_pinned_exact():
    """Committed fixture PNGs decode EXACTLY to the pinned source
    arrays (lossless format: the decoded hash equals the source hash
    by construction, so the pin is independent verification, not a
    decoder-derived regression guard)."""
    import hashlib
    import json
    import os

    fdir = os.path.join(os.path.dirname(__file__), "..", "fixtures", "png")
    with open(os.path.join(fdir, "expected.json")) as f:
        expected = json.load(f)
    recipes = fixture_recipes()
    assert expected and set(expected) == set(recipes)
    for name, want in expected.items():
        rgb_src, _img, _kwargs = recipes[name]
        src_sha = hashlib.sha256(rgb_src.tobytes()).hexdigest()[:16]
        assert src_sha == want["source"], (name, "source recipe drifted")
        with open(os.path.join(fdir, name), "rb") as f:
            out = decode_png(f.read())
        assert np.array_equal(out, rgb_src), name
        got = hashlib.sha256(out.tobytes()).hexdigest()[:16]
        assert got == want["source"] == want["decoded"], name


def test_image_pixel_stats_mixed_codecs_and_strict(spark):
    """image_pixel_stats agrees across codecs on identical pixels (PNG
    vs PPM), is position/channel-sensitive, and raises in strict mode
    on undecodable payloads."""
    from hybridbackend_spark.operators.multimodal import (
        encode_ppm,
        image_pixel_stats,
    )

    img = _grad(9, 7, seed=4)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img, filters=[1, 4]))),
         (2, bytearray(encode_ppm(img))),
         (3, bytearray(encode_ppm(img[:, :, ::-1])))],  # channels swapped
        ["media_id", "payload"],
    )
    rows = {r.media_id: r for r in image_pixel_stats(df).collect()}
    a, b, c = rows[1], rows[2], rows[3]
    assert (a.height, a.width) == (9, 7)
    assert (a.r_sum, a.g_sum, a.b_sum, a.weighted) == (
        b.r_sum, b.g_sum, b.b_sum, b.weighted
    )
    assert (c.r_sum, c.b_sum) == (a.b_sum, a.r_sum)
    assert c.weighted != a.weighted  # channel weights see the swap

    import pytest as _pytest
    from pyspark.errors import PythonException

    bad = spark.createDataFrame(
        [(9, bytearray(b"\x00garbage"))], ["media_id", "payload"]
    )
    with _pytest.raises(PythonException, match="not a format decodable"):
        image_pixel_stats(bad, fake=False).collect()


# ---------------------------------------------------------------------------
# sub-byte depths (1/2/4-bit gray + palette)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_subbyte_gray_roundtrip_each_filter(depth, ftype):
    rng = np.random.RandomState(depth * 10 + ftype)
    # width chosen so rows need tail padding (w*depth % 8 != 0)
    img = rng.randint(0, 1 << depth, size=(6, 5)).astype(np.uint8)
    out = decode_png(encode_png(img, color_type=0, depth=depth,
                                filters=ftype))
    scale = 255 // ((1 << depth) - 1)
    want = np.repeat((img * scale).astype(np.uint8)[..., None], 3, axis=2)
    assert np.array_equal(out, want)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette_roundtrip(depth):
    rng = np.random.RandomState(depth)
    n = 1 << depth
    palette = rng.randint(0, 256, size=(n, 3)).astype(np.uint8)
    idx = rng.randint(0, n, size=(5, 7)).astype(np.uint8)
    out = decode_png(encode_png(idx, color_type=3, palette=palette,
                                depth=depth, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(out, palette[idx])


def test_subbyte_adam7_interlaced_roundtrip():
    rng = np.random.RandomState(7)
    for dims in [(9, 11), (1, 1), (3, 2)]:
        img = rng.randint(0, 2, size=dims).astype(np.uint8)
        out = decode_png(encode_png(img, color_type=0, depth=1,
                                    interlace=1, filters=[0, 2, 1]))
        want = np.repeat((img * 255)[..., None], 3, axis=2)
        assert np.array_equal(out, want), dims


def test_subbyte_full_value_range_exact_scaling():
    # every representable sample value at each depth maps to the exact
    # 255/(2^d - 1) grid (1-bit: {0,255}; 2-bit: x85; 4-bit: x17)
    for depth in (1, 2, 4):
        vals = np.arange(1 << depth, dtype=np.uint8)[None, :]
        out = decode_png(encode_png(vals, color_type=0, depth=depth))
        assert list(out[0, :, 0]) == [
            v * (255 // ((1 << depth) - 1)) for v in range(1 << depth)
        ]


def test_subbyte_rgb_is_spec_invalid():
    # depths 1/2/4 are only legal for gray (0) and palette (3)
    img = np.zeros((2, 2, 3), np.uint8)
    assert decode_png(encode_png(img, color_type=2, depth=4)) is None


def test_subbyte_palette_index_out_of_range_falls_through():
    palette = np.zeros((2, 3), np.uint8)  # 2 entries, but idx 3 used
    idx = np.array([[3]], np.uint8)
    assert decode_png(encode_png(idx, color_type=3, palette=palette,
                                 depth=2)) is None
