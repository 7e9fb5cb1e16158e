"""MP4/ISO-BMFF audio demux + decode tests.

Verification strategy mirrors test_jpeg/test_png: the muxer used here
is written INDEPENDENTLY of the engine's `encode_mp4_audio` (moov
before mdat, ragged stsc runs, optional co64), and the G.711 checks
compare the decoder's tables against an independently-derived
segment-search ENCODER (decode∘encode must land within the segment's
quantization step), not against the decoder's own formula.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hybridbackend_spark.operators.mp4 import (
    ALAW_TABLE,
    ULAW_TABLE,
    decode_mp4_audio,
    encode_mp4_audio,
)


# ---------------------------------------------------------------------------
# Independent test muxer: moov FIRST, explicit per-chunk stsc runs,
# optional 64-bit offsets — a different shape from the engine writer.
# ---------------------------------------------------------------------------

def _atom(typ, body):
    return struct.pack(">I", len(body) + 8) + typ + body


def _mux(chunks, fourcc, rate, channels, width, co64=False, handler=b"soun"):
    """chunks: list of lists of per-sample byte strings."""
    sizes = [len(s) for ch in chunks for s in ch]
    n_samples = len(sizes)

    entry = (
        struct.pack(">I", 36) + fourcc + bytes(6) + struct.pack(">H", 1)
        + struct.pack(">HHIHHHH", 0, 0, 0, channels, 8 * width, 0, 0)
        + struct.pack(">I", rate << 16)
    )
    stsd = _atom(b"stsd", struct.pack(">II", 0, 1) + entry)
    stsz = _atom(
        b"stsz",
        struct.pack(">III", 0, 0, n_samples)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    # one stsc run per chunk (maximally ragged — exercises run expansion)
    stsc = _atom(
        b"stsc",
        struct.pack(">II", 0, len(chunks))
        + b"".join(
            struct.pack(">III", i + 1, len(ch), 1)
            for i, ch in enumerate(chunks)
        ),
    )
    stts = _atom(b"stts", struct.pack(">II", 0, 1)
                 + struct.pack(">II", n_samples, 1))
    mdhd = _atom(b"mdhd", struct.pack(">IIIII", 0, 0, 0, rate, n_samples)
                 + bytes(4))
    hdlr = _atom(b"hdlr", bytes(8) + handler + bytes(13))

    # moov comes first: compute chunk offsets from the final layout
    ftyp = _atom(b"ftyp", b"qt  \x00\x00\x00\x00")
    chunk_bytes = [b"".join(ch) for ch in chunks]

    def build(offsets):
        ob = (
            struct.pack(">II", 0, len(offsets))
            + b"".join(
                struct.pack(">Q" if co64 else ">I", o) for o in offsets
            )
        )
        stco = _atom(b"co64" if co64 else b"stco", ob)
        stbl = _atom(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _atom(b"minf", _atom(b"smhd", bytes(8)) + stbl)
        mdia = _atom(b"mdia", mdhd + hdlr + minf)
        trak = _atom(b"trak", _atom(b"tkhd", bytes(84)) + mdia)
        moov = _atom(b"moov", _atom(b"mvhd", bytes(100)) + trak)
        return moov

    moov_len = len(build([0] * len(chunks)))
    base = len(ftyp) + moov_len + 8
    offsets, pos = [], base
    for cb in chunk_bytes:
        offsets.append(pos)
        pos += len(cb)
    return ftyp + build(offsets) + _atom(b"mdat", b"".join(chunk_bytes))


def _frames(arr16, fmt="<i2"):
    return [bytes(v) for v in arr16.astype(fmt)[..., None]]


# ---------------------------------------------------------------------------
# Independent G.711 encoders (segment search, not the decode formula)
# ---------------------------------------------------------------------------

_SEG_ENDS = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]


def _linear2ulaw(v):
    sign = 0x80 if v < 0 else 0
    v = min(abs(v), 0x7FFF - 0x84) + 0x84
    seg = next(i for i, e in enumerate(_SEG_ENDS) if v <= e)
    mant = (v >> (seg + 3)) & 0x0F
    return ~(sign | (seg << 4) | mant) & 0xFF


def _linear2alaw(v):
    sign = 0x80 if v >= 0 else 0
    v = min(abs(v), 0x7FFF)
    if v < 0x100:
        code = v >> 4
    else:
        seg = next(
            i for i, e in enumerate(_SEG_ENDS) if v <= e
        )
        code = (seg << 4) | ((v >> (seg + 3)) & 0x0F)
    return (sign | code) ^ 0x55


def test_pcm16_sowt_exact_roundtrip():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, 300, dtype=np.int64)
    chunks = [_frames(s[:100]), _frames(s[100:250]), _frames(s[250:])]
    p = _mux(chunks, b"sowt", 16000, 1, 2)
    x, rate = decode_mp4_audio(p)
    assert rate == 16000
    np.testing.assert_array_equal(
        np.rint(np.asarray(x) * 32768).astype(np.int64), s
    )


def test_pcm16_twos_bigendian_and_co64():
    s = np.array([-32768, -1, 0, 1, 255, 32767], dtype=np.int64)
    p = _mux([_frames(s, ">i2")], b"twos", 44100, 1, 2, co64=True)
    x, rate = decode_mp4_audio(p)
    assert rate == 44100
    np.testing.assert_array_equal(
        np.rint(np.asarray(x) * 32768).astype(np.int64), s
    )


def test_stereo_mixdown_mean():
    left = np.array([100, -200, 300], dtype=np.int64)
    right = np.array([300, 200, -100], dtype=np.int64)
    inter = np.empty(6, dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    frames = [
        inter[i : i + 2].astype("<i2").tobytes() for i in range(0, 6, 2)
    ]
    p = _mux([frames], b"sowt", 8000, 2, 2)
    x, _ = decode_mp4_audio(p)
    np.testing.assert_allclose(
        np.asarray(x) * 32768, (left + right) / 2.0, rtol=0, atol=0
    )


def test_raw8_offset_binary():
    b = np.array([0, 127, 128, 255], dtype=np.uint8)
    p = _mux([[bytes([v]) for v in b]], b"raw ", 8000, 1, 1)
    x, _ = decode_mp4_audio(p)
    np.testing.assert_array_equal(
        np.asarray(x) * 32768,
        (b.astype(np.int64) - 128) * 256,
    )


@pytest.mark.parametrize(
    "table,enc,bias",
    [(ULAW_TABLE, _linear2ulaw, 0x84), (ALAW_TABLE, _linear2alaw, 0)],
    ids=["ulaw", "alaw"],
)
def test_g711_decode_inverts_independent_encoder(table, enc, bias):
    """decode(encode(v)) must sit within the segment's quantization
    step of v for a dense sweep — ties the decode tables to the
    independent segment-search encoder, not to their own formula."""
    for v in list(range(-8192, 8192, 37)) + [-32768, -20000, 20000, 32767]:
        code = enc(v)
        dec = table[code]
        seg = next(
            i for i, e in enumerate(_SEG_ENDS)
            if min(abs(v) + bias, 0x7FFF) <= e
        )
        step = 1 << (seg + 3)
        assert abs(dec - v) <= step, (v, code, dec, step)
        if v != 0:
            assert (dec >= 0) == (v >= 0) or dec == 0


def test_g711_tables_are_odd_symmetric_and_bounded():
    u = np.asarray(ULAW_TABLE)
    a = np.asarray(ALAW_TABLE)
    assert u.max() == 32124 and u.min() == -32124
    assert a.max() == 32256 and a.min() == -32256
    # mu-law: code 0xFF is +0, code 0x7F is -0
    assert ULAW_TABLE[0xFF] == 0 and ULAW_TABLE[0x7F] == 0
    # sign flip mirrors magnitude exactly in both laws
    for t, flip in ((ULAW_TABLE, 0x80), (ALAW_TABLE, 0x80)):
        for c in range(128):
            assert t[c] == -t[c ^ flip] or (t[c] == 0 and t[c ^ flip] == 0)


def test_ulaw_track_chunk_order_preserved():
    codes = bytes((i * 7 + 3) % 256 for i in range(90))
    chunks = [
        [bytes([c]) for c in codes[:20]],
        [bytes([c]) for c in codes[20:75]],
        [bytes([c]) for c in codes[75:]],
    ]
    p = _mux(chunks, b"ulaw", 8000, 1, 1)
    x, rate = decode_mp4_audio(p)
    expect = np.asarray([ULAW_TABLE[c] for c in codes], dtype=np.int64)
    np.testing.assert_array_equal(
        np.rint(np.asarray(x) * 32768).astype(np.int64), expect
    )
    assert rate == 8000


def test_engine_muxer_roundtrips_through_decoder():
    codes = bytes((i * 31 + 5) % 256 for i in range(1000))
    p = encode_mp4_audio(codes, "alaw", 22050, channels=1,
                         chunk_frames=256)
    x, rate = decode_mp4_audio(p)
    assert rate == 22050
    expect = np.asarray([ALAW_TABLE[c] for c in codes], dtype=np.int64)
    np.testing.assert_array_equal(
        np.rint(np.asarray(x) * 32768).astype(np.int64), expect
    )


def test_video_handler_and_garbage_return_none():
    s = np.arange(4, dtype=np.int64)
    p = _mux([_frames(s)], b"sowt", 8000, 1, 2, handler=b"vide")
    assert decode_mp4_audio(p) is None
    assert decode_mp4_audio(b"\x00\x01\x02") is None
    assert decode_mp4_audio(b"nonsense-bytes-here!" * 4) is None


def test_aac_entry_falls_through():
    s = np.arange(8, dtype=np.int64)
    p = _mux([_frames(s)], b"mp4a", 8000, 1, 2)
    assert decode_mp4_audio(p) is None


def test_registry_decodes_mp4_payload(spark):
    """audio_sample_stats strict mode reaches the registered mp4-audio
    codec for BMFF payloads."""
    from hybridbackend_spark.operators.multimodal import (
        audio_sample_stats,
    )

    codes = bytes((i * 11) % 256 for i in range(64))
    p = encode_mp4_audio(codes, "ulaw", 8000)
    df = spark.createDataFrame([(1, bytearray(p))], "media_id long, payload binary")
    row = audio_sample_stats(df).collect()[0]
    expect = [ULAW_TABLE[c] for c in codes]
    assert row.n_samples == 64 and row.rate == 8000
    assert row.sum_abs == sum(abs(v) for v in expect)
    assert row.weighted == sum(
        v * (1 + i % 7) for i, v in enumerate(expect)
    )


# ---------------------------------------------------------------------------
# Video track: PNG / motion-JPEG samples
# ---------------------------------------------------------------------------

def _mux_video(chunks, fourcc, width, height):
    """Independent video muxer: moov FIRST, one ragged stsc run per
    chunk — different layout from the engine's encode_mp4_video.
    chunks: list of lists of per-frame encoded byte strings."""
    sizes = [len(s) for ch in chunks for s in ch]
    n = len(sizes)
    entry_body = (
        fourcc + bytes(6) + struct.pack(">H", 1) + bytes(16)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000) + bytes(4)
        + struct.pack(">H", 1) + bytes(32) + struct.pack(">Hh", 24, -1)
    )
    entry = struct.pack(">I", len(entry_body) + 4) + entry_body
    stsd = _atom(b"stsd", struct.pack(">II", 0, 1) + entry)
    stsz = _atom(
        b"stsz",
        struct.pack(">III", 0, 0, n)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stsc = _atom(
        b"stsc",
        struct.pack(">II", 0, len(chunks))
        + b"".join(
            struct.pack(">III", i + 1, len(ch), 1)
            for i, ch in enumerate(chunks)
        ),
    )
    stts = _atom(b"stts", struct.pack(">II", 0, 1) + struct.pack(">II", n, 1))
    mdhd = _atom(b"mdhd", struct.pack(">IIIII", 0, 0, 0, 10, n) + bytes(4))
    hdlr = _atom(b"hdlr", bytes(8) + b"vide" + bytes(13))
    ftyp = _atom(b"ftyp", b"qt  \x00\x00\x00\x00")
    chunk_bytes = [b"".join(ch) for ch in chunks]

    def build(offsets):
        stco = _atom(
            b"stco",
            struct.pack(">II", 0, len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
        stbl = _atom(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _atom(b"minf", _atom(b"vmhd", struct.pack(">I", 1) + bytes(8)) + stbl)
        mdia = _atom(b"mdia", mdhd + hdlr + minf)
        trak = _atom(b"trak", _atom(b"tkhd", bytes(84)) + mdia)
        return _atom(b"moov", _atom(b"mvhd", bytes(100)) + trak)

    moov_len = len(build([0] * len(chunks)))
    base = len(ftyp) + moov_len + 8
    offsets, pos = [], base
    for cb in chunk_bytes:
        offsets.append(pos)
        pos += len(cb)
    return ftyp + build(offsets) + _atom(b"mdat", b"".join(chunk_bytes))


def _vid_frames(n, h, w, seed=0):
    out = []
    for f in range(n):
        img = np.empty((h, w, 3), np.uint8)
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    img[y, x, c] = (seed + f * 47 + y * 13 + x * 7 + c * 29) % 256
        out.append(img)
    return out


def test_png_video_roundtrip_exact_independent_mux():
    from hybridbackend_spark.operators.mp4 import decode_mp4_video
    from tests.test_png import encode_png

    srcs = _vid_frames(5, 6, 9, seed=3)
    enc = [encode_png(im) for im in srcs]
    p = _mux_video([enc[:2], enc[2:3], enc[3:]], b"png ", 9, 6)
    dec = decode_mp4_video(p)
    assert dec is not None and len(dec) == 5
    for a, b in zip(srcs, dec):
        np.testing.assert_array_equal(a, b)


def test_mjpeg_video_decodes_within_jpeg_bounds():
    from hybridbackend_spark.operators.mp4 import decode_mp4_video
    from tests.test_jpeg import encode_jpeg

    srcs = _vid_frames(3, 16, 16, seed=11)
    enc = [encode_jpeg(im, quality=95) for im in srcs]
    p = _mux_video([enc], b"jpeg", 16, 16)
    dec = decode_mp4_video(p)
    assert dec is not None and len(dec) == 3
    for a, b in zip(srcs, dec):
        assert b.shape == a.shape
        err = np.abs(a.astype(np.int64) - b.astype(np.int64))
        assert err.mean() < 12 and err.max() < 96


def test_engine_video_muxer_roundtrips_and_entropy_codecs_fall_through():
    from hybridbackend_spark.operators.mp4 import (
        decode_mp4_video,
        encode_mp4_video,
    )
    from hybridbackend_spark.operators.png import encode_png_rgb

    srcs = _vid_frames(7, 5, 8, seed=9)
    enc = [encode_png_rgb(im) for im in srcs]
    p = encode_mp4_video(enc, 8, 5, "png ", chunk_samples=3)
    dec = decode_mp4_video(p)
    assert len(dec) == 7
    for a, b in zip(srcs, dec):
        np.testing.assert_array_equal(a, b)
    # avc1 sample entry (entropy-coded) must fall through, not raise
    q = _mux_video([enc], b"avc1", 8, 5)
    assert decode_mp4_video(q) is None
    # audio-only payloads have no video track
    a = encode_mp4_audio(bytes(64), "ulaw", 8000)
    assert decode_mp4_video(a) is None


def test_video_frame_stats_strict_registry(spark):
    from hybridbackend_spark.operators.mp4 import encode_mp4_video
    from hybridbackend_spark.operators.multimodal import video_frame_stats
    from hybridbackend_spark.operators.png import encode_png_rgb

    srcs = _vid_frames(3, 4, 6, seed=5)
    p = encode_mp4_video([encode_png_rgb(im) for im in srcs], 6, 4,
                         "png ", chunk_samples=2)
    df = spark.createDataFrame(
        [(9, bytearray(p))], "media_id long, payload binary"
    )
    rows = {r.frame_idx: r for r in video_frame_stats(df).collect()}
    assert sorted(rows) == [0, 1, 2]
    for fi, im in enumerate(srcs):
        px = im.astype(np.int64)
        yy, xx = np.mgrid[0:4, 0:6]
        wt = 1 + (xx + yy) % 7
        lin = px[..., 0] + 2 * px[..., 1] + 3 * px[..., 2]
        r = rows[fi]
        assert (r.height, r.width) == (4, 6)
        assert r.r_sum == px[..., 0].sum()
        assert r.weighted == (lin * wt).sum()
