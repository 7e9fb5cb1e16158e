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


def encode_png(img, color_type=2, filters=None, palette=None,
               interlace=0, depth=8):
    """Minimal PNG encoder (tests only). ``img`` shape by color type:
    0 -> (h, w), 2 -> (h, w, 3), 3 -> (h, w) palette indices (requires
    ``palette`` (n, 3)), 4 -> (h, w, 2), 6 -> (h, w, 4). ``filters``
    picks the per-scanline filter type (int or list cycling 0-4)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * ch)
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        if filters is None:
            ftype = 0
        elif isinstance(filters, int):
            ftype = filters
        else:
            ftype = filters[y % len(filters)]
        line = flat[y].tobytes()
        raw.append(ftype)
        raw.extend(_filter_line(ftype, line, prev, ch))
        prev = line
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
    assert decode_png(encode_png(img, interlace=1)) is None  # Adam7
    assert decode_png(encode_png(img, depth=16)) is None  # 16-bit
    # flip one IDAT byte -> CRC mismatch -> None, not garbage pixels
    bad = bytearray(good)
    bad[len(bad) - 20] ^= 0xFF
    assert decode_png(bytes(bad)) is None


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
