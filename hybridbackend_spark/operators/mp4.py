"""ISO-BMFF (MP4/M4A/MOV) audio demux and uncompressed-codec decode.

Pure Python + numpy, spec-derived (ISO/IEC 14496-12 box structure,
QuickTime audio sample entries, ITU-T G.711 companding) — no media
library. The demuxer walks the real sample tables (``stsd`` sample
entry, ``stsz`` sizes, ``stsc`` sample-to-chunk runs, ``stco``/``co64``
chunk offsets) and reassembles the audio track's sample stream in
order, so chunk interleaving, 64-bit offsets, and non-uniform chunk
runs all round-trip. Decoded codecs — everything an MP4 can carry
without an entropy-coded bitstream:

- ``sowt`` / ``twos``: little/big-endian PCM16
- ``raw ``: 8-bit offset-binary PCM
- ``ulaw`` / ``alaw``: ITU-T G.711 companded 8-bit (decoded through
  256-entry tables built from the canonical expansion formulas)

AAC (``mp4a``) needs a full entropy decoder and stays a registry
fall-through (None), same policy as arithmetic-coded JPEG.

Reference parity: the reference engine (DeepRec-AI/HybridBackend) has
no media path; this module belongs to the multimodal-column family the
build brief makes first-class, beside `operators/jpeg.py` / `png.py` /
`gif.py` / `adpcm.py`. Return convention matches `_parse_wav`
(`multimodal.py`): ``(mono float64 array in [-1, 1], sample_rate)``.
G.711 expands to integer magnitudes < 2**15, channel mixdown averages
at most a few int16 lanes, and both divide by the dyadic 32768.0 — so
every decoded float is exact and downstream integer sample stats
(`audio_sample_stats`) are engine-replayable arithmetic.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_mp4_audio",
    "encode_mp4_audio",
    "decode_mp4_video",
    "encode_mp4_video",
    "ULAW_TABLE",
    "ALAW_TABLE",
]


def _build_ulaw_table():
    """G.711 mu-law expansion, canonical formula (ITU-T G.711 / the
    classic Sun reference implementation): complement, split into
    sign / 3-bit segment / 4-bit mantissa, rebuild with the 0x84 bias."""
    out = []
    for code in range(256):
        u = ~code & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        out.append(0x84 - t if (u & 0x80) else t - 0x84)
    return out


def _build_alaw_table():
    """G.711 A-law expansion: toggle the even bits (0x55), then
    segment 0 is linear (+8 bias), segments 1..7 shift the biased
    mantissa. Sign bit set means positive in A-law."""
    out = []
    for code in range(256):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a >> 4) & 0x07
        if seg == 0:
            t += 8
        else:
            t = (t + 0x108) << (seg - 1)
        out.append(t if (a & 0x80) else -t)
    return out


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()


# ---------------------------------------------------------------------------
# Box walking
# ---------------------------------------------------------------------------

def _iter_boxes(p: bytes, lo: int, hi: int):
    """Yield (type, body_start, box_end) for each box in [lo, hi)."""
    pos = lo
    while pos + 8 <= hi:
        (sz,) = struct.unpack_from(">I", p, pos)
        typ = p[pos + 4 : pos + 8]
        body = pos + 8
        if sz == 1:  # 64-bit largesize
            (sz,) = struct.unpack_from(">Q", p, pos + 8)
            body = pos + 16
        elif sz == 0:  # extends to end of enclosing box
            sz = hi - pos
        if sz < body - pos or pos + sz > hi:
            raise ValueError("bad box size")
        yield typ, body, pos + sz
        pos += sz


def _children(p, lo, hi, want):
    return [(t, b, e) for t, b, e in _iter_boxes(p, lo, hi) if t == want]


# ---------------------------------------------------------------------------
# Sample-table parsing
# ---------------------------------------------------------------------------

def _parse_stsd_audio(p, b, e):
    """First sample entry of an stsd, read as a QuickTime/ISO audio
    sample entry: (fourcc, channels, sample_size_bits, rate)."""
    (count,) = struct.unpack_from(">I", p, b + 4)
    if count < 1:
        return None
    eb = b + 8
    (esz,) = struct.unpack_from(">I", p, eb)
    if esz < 36 or eb + esz > e:
        return None
    fourcc = p[eb + 4 : eb + 8].decode("latin1")
    # 6 reserved + 2 data_reference_index, then the v0 audio fields
    channels, bits = struct.unpack_from(">HH", p, eb + 24)
    (rate_fixed,) = struct.unpack_from(">I", p, eb + 32)
    return fourcc, channels, bits, rate_fixed >> 16


def _parse_stsd_video(p, b, e):
    """First sample entry of a video stsd, read as an ISO
    VisualSampleEntry: (fourcc, width, height)."""
    (count,) = struct.unpack_from(">I", p, b + 4)
    if count < 1:
        return None
    eb = b + 8
    (esz,) = struct.unpack_from(">I", p, eb)
    if esz < 40 or eb + esz > e:
        return None
    fourcc = p[eb + 4 : eb + 8].decode("latin1")
    # 6 reserved + 2 dri + 16 predefined/reserved, then width/height
    width, height = struct.unpack_from(">HH", p, eb + 32)
    return fourcc, width, height


def _parse_stbl(p, lo, hi, parse_entry=_parse_stsd_audio):
    entry = sizes = None
    stsc: list[tuple[int, int, int]] = []
    offsets: list[int] = []
    for typ, b, e in _iter_boxes(p, lo, hi):
        if typ == b"stsd":
            entry = parse_entry(p, b, e)
        elif typ == b"stsz":
            uniform, n = struct.unpack_from(">II", p, b + 4)
            if uniform:
                sizes = [uniform] * n
            else:
                sizes = list(struct.unpack_from(f">{n}I", p, b + 12))
        elif typ == b"stsc":
            (n,) = struct.unpack_from(">I", p, b + 4)
            stsc = [
                struct.unpack_from(">III", p, b + 8 + 12 * i)
                for i in range(n)
            ]
        elif typ in (b"stco", b"co64"):
            (n,) = struct.unpack_from(">I", p, b + 4)
            fmt, w = (">I", 4) if typ == b"stco" else (">Q", 8)
            offsets = [
                struct.unpack_from(fmt, p, b + 8 + w * i)[0]
                for i in range(n)
            ]
    return entry, sizes, stsc, offsets


def _samples(p, sizes, stsc, offsets) -> list[bytes]:
    """Reassemble the track's samples in sample order from the chunk
    layout, one bytes object per sample. stsc runs are (first_chunk
    1-based, samples_per_chunk, sample_description_index)."""
    n_chunks = len(offsets)
    per_chunk: list[int] = []
    for i, (first, per, _desc) in enumerate(stsc):
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else n_chunks
        per_chunk.extend([per] * max(0, last - first + 1))
    out: list[bytes] = []
    si = 0
    for ci, off in enumerate(offsets):
        pos = off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            sz = sizes[si]
            if pos + sz > len(p):
                raise ValueError("sample beyond payload")
            out.append(p[pos : pos + sz])
            pos += sz
            si += 1
    return out


def _sample_stream(p, sizes, stsc, offsets) -> bytes:
    return b"".join(_samples(p, sizes, stsc, offsets))


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def _decode_strict(payload: bytes):
    import numpy as np

    p = bytes(payload)
    if len(p) < 16 or p[4:8] != b"ftyp":
        return None
    moov = _children(p, 0, len(p), b"moov")
    if not moov:
        return None
    _, mlo, mhi = moov[0]
    for _, tlo, thi in _children(p, mlo, mhi, b"trak"):
        mdia = _children(p, tlo, thi, b"mdia")
        if not mdia:
            continue
        _, dlo, dhi = mdia[0]
        hdlr = _children(p, dlo, dhi, b"hdlr")
        if not hdlr or p[hdlr[0][1] + 8 : hdlr[0][1] + 12] != b"soun":
            continue
        rate_mdhd = None
        for typ, b, _e in _iter_boxes(p, dlo, dhi):
            if typ == b"mdhd":
                ver = p[b]
                (rate_mdhd,) = struct.unpack_from(
                    ">I", p, b + (20 if ver == 1 else 12)
                )
        minf = _children(p, dlo, dhi, b"minf")
        if not minf:
            continue
        stbl = _children(p, minf[0][1], minf[0][2], b"stbl")
        if not stbl:
            continue
        entry, sizes, stsc, offsets = _parse_stbl(
            p, stbl[0][1], stbl[0][2]
        )
        if entry is None or sizes is None or not stsc or not offsets:
            continue
        fourcc, channels, _bits, rate = entry
        if not rate:
            rate = rate_mdhd or 0
        raw = _sample_stream(p, sizes, stsc, offsets)
        ch = max(1, channels)
        if fourcc == "sowt":
            x = np.frombuffer(raw, dtype="<i2").astype("float64")
        elif fourcc == "twos":
            x = np.frombuffer(raw, dtype=">i2").astype("float64")
        elif fourcc == "raw ":
            x = (
                np.frombuffer(raw, dtype="u1").astype("float64") - 128.0
            ) * 256.0
        elif fourcc == "ulaw":
            tab = np.asarray(ULAW_TABLE, dtype="float64")
            x = tab[np.frombuffer(raw, dtype="u1")]
        elif fourcc == "alaw":
            tab = np.asarray(ALAW_TABLE, dtype="float64")
            x = tab[np.frombuffer(raw, dtype="u1")]
        else:  # mp4a/AAC etc. — entropy-coded, registry fall-through
            return None
        if ch > 1:
            x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
        return x / 32768.0, int(rate)
    return None


def decode_mp4_audio(payload: bytes):
    """Decode the first audio track of an ISO-BMFF payload to
    (mono float64 array in [-1, 1], sample_rate), or None if the
    payload is not BMFF / has no decodable audio track."""
    try:
        return _decode_strict(payload)
    except (ValueError, struct.error, IndexError):
        return None


# ---------------------------------------------------------------------------
# Video track: MJPEG / PNG-in-MP4 demux + per-frame decode
# ---------------------------------------------------------------------------

# Frame codecs an MP4 video track can carry that this container decodes
# for real: QuickTime's 'png ' codec (lossless, operators/png.py) and
# motion-JPEG ('jpeg'/'mjpa', operators/jpeg.py). Entropy-coded video
# (avc1/hev1/mp4v) stays a registry fall-through, same policy as AAC.
def _decode_frame(sample: bytes, fourcc: str):
    if fourcc == "png ":
        from .png import decode_png

        return decode_png(sample)
    if fourcc in ("jpeg", "mjpa"):
        from .jpeg import decode_jpeg

        return decode_jpeg(sample)
    return None


def _decode_video_strict(payload: bytes):
    p = bytes(payload)
    if len(p) < 16 or p[4:8] != b"ftyp":
        return None
    moov = _children(p, 0, len(p), b"moov")
    if not moov:
        return None
    _, mlo, mhi = moov[0]
    for _, tlo, thi in _children(p, mlo, mhi, b"trak"):
        mdia = _children(p, tlo, thi, b"mdia")
        if not mdia:
            continue
        _, dlo, dhi = mdia[0]
        hdlr = _children(p, dlo, dhi, b"hdlr")
        if not hdlr or p[hdlr[0][1] + 8 : hdlr[0][1] + 12] != b"vide":
            continue
        minf = _children(p, dlo, dhi, b"minf")
        if not minf:
            continue
        stbl = _children(p, minf[0][1], minf[0][2], b"stbl")
        if not stbl:
            continue
        entry, sizes, stsc, offsets = _parse_stbl(
            p, stbl[0][1], stbl[0][2], _parse_stsd_video
        )
        if entry is None or sizes is None or not stsc or not offsets:
            continue
        fourcc, _w, _h = entry
        frames = []
        for sample in _samples(p, sizes, stsc, offsets):
            img = _decode_frame(sample, fourcc)
            if img is None:  # undecodable codec — whole track falls out
                return None
            frames.append(img)
        return frames or None
    return None


def decode_mp4_video(payload: bytes):
    """Decode the first video track of an ISO-BMFF payload to a list of
    (h, w, 3) uint8 frames ('png '/'jpeg'/'mjpa' sample entries), or
    None if the payload is not BMFF / carries no decodable video."""
    try:
        return _decode_video_strict(payload)
    except (ValueError, struct.error, IndexError):
        return None


# ---------------------------------------------------------------------------
# Mux (engine-side writer for synthesized payloads)
# ---------------------------------------------------------------------------

_WIDTHS = {"sowt": 2, "twos": 2, "raw ": 1, "ulaw": 1, "alaw": 1}


def encode_mp4_audio(
    data: bytes,
    fourcc: str = "ulaw",
    rate: int = 8000,
    channels: int = 1,
    chunk_frames: int = 4096,
) -> bytes:
    """Write an MP4 with one audio track holding ``data`` (already in
    the codec's on-wire encoding, frame-interleaved). Layout:
    ftyp + mdat + moov, one sample per PCM frame, uniform stsz, chunks
    of ``chunk_frames`` frames (a single trailing stsc run covers the
    short last chunk). Deliberately minimal and distinct from the test
    suite's independent muxer (which writes moov first and ragged
    chunk runs)."""
    if fourcc not in _WIDTHS:
        raise ValueError(f"unsupported fourcc {fourcc!r}")
    bpf = _WIDTHS[fourcc] * channels
    if len(data) % bpf:
        raise ValueError("data not a whole number of frames")
    n_frames = len(data) // bpf

    def atom(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    ftyp = atom(b"ftyp", b"isom\x00\x00\x02\x00isom")
    mdat = atom(b"mdat", data)
    mdat_body = len(ftyp) + 8

    n_chunks = max(1, -(-n_frames // chunk_frames))
    chunk_offsets = [
        mdat_body + i * chunk_frames * bpf for i in range(n_chunks)
    ]
    last_frames = n_frames - (n_chunks - 1) * chunk_frames

    sample_entry = (
        struct.pack(">I", 36)
        + fourcc.encode("latin1")
        + bytes(6)
        + struct.pack(">H", 1)  # data_reference_index
        + struct.pack(">HHIHHHH", 0, 0, 0, channels,
                      8 * _WIDTHS[fourcc], 0, 0)
        + struct.pack(">I", rate << 16)
    )
    stsd = atom(b"stsd", struct.pack(">II", 0, 1) + sample_entry)
    stts = atom(b"stts", struct.pack(">III", 0, 1, n_frames)
                + struct.pack(">I", 1))
    stsc_runs = [(1, chunk_frames, 1)]
    if last_frames != chunk_frames and n_chunks > 1:
        stsc_runs.append((n_chunks, last_frames, 1))
    elif n_chunks == 1:
        stsc_runs = [(1, n_frames, 1)]
    stsc = atom(
        b"stsc",
        struct.pack(">II", 0, len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    stsz = atom(b"stsz", struct.pack(">III", 0, bpf, n_frames))
    stco = atom(
        b"stco",
        struct.pack(">II", 0, n_chunks)
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = atom(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = atom(b"minf", atom(b"smhd", bytes(8)) + stbl)
    mdhd = atom(
        b"mdhd",
        struct.pack(">IIIII", 0, 0, 0, rate, n_frames)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = atom(b"hdlr", bytes(8) + b"soun" + bytes(12) + b"\x00")
    mdia = atom(b"mdia", mdhd + hdlr + minf)
    tkhd = atom(
        b"tkhd",
        struct.pack(">IIIII", 7, 0, 0, 1, 0) + bytes(72),
    )
    trak = atom(b"trak", tkhd + mdia)
    mvhd = atom(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, rate, n_frames) + bytes(80),
    )
    moov = atom(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_mp4_video(
    frames: list[bytes],
    width: int,
    height: int,
    fourcc: str = "png ",
    rate: int = 10,
    chunk_samples: int = 3,
) -> bytes:
    """Write an MP4 with one video track holding ``frames`` (each an
    already-encoded PNG/JPEG frame). Non-uniform stsz (one entry per
    frame), chunks of ``chunk_samples`` frames, ftyp + mdat + moov.
    Together with :func:`decode_mp4_video` this exercises the full
    variable-size sample-table path (the audio muxer is uniform-size)."""
    if fourcc not in ("png ", "jpeg", "mjpa"):
        raise ValueError(f"unsupported video fourcc {fourcc!r}")
    if not frames:
        raise ValueError("no frames")

    def atom(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    data = b"".join(frames)
    ftyp = atom(b"ftyp", b"isom\x00\x00\x02\x00isom")
    mdat = atom(b"mdat", data)
    mdat_body = len(ftyp) + 8

    n = len(frames)
    n_chunks = max(1, -(-n // chunk_samples))
    chunk_offsets = []
    pos = mdat_body
    for c in range(n_chunks):
        chunk_offsets.append(pos)
        for s in frames[c * chunk_samples : (c + 1) * chunk_samples]:
            pos += len(s)
    last_samples = n - (n_chunks - 1) * chunk_samples

    # ISO VisualSampleEntry: 6 reserved + 2 dri, 16 predefined/reserved,
    # width/height, 72 dpi resolutions, frame_count 1, compressorname,
    # depth 24, pre_defined -1.
    entry_body = (
        fourcc.encode("latin1")
        + bytes(6)
        + struct.pack(">H", 1)
        + bytes(16)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + bytes(4)
        + struct.pack(">H", 1)
        + bytes(32)
        + struct.pack(">Hh", 24, -1)
    )
    sample_entry = struct.pack(">I", len(entry_body) + 4) + entry_body
    stsd = atom(b"stsd", struct.pack(">II", 0, 1) + sample_entry)
    stts = atom(b"stts", struct.pack(">III", 0, 1, n) + struct.pack(">I", 1))
    stsc_runs = [(1, chunk_samples, 1)]
    if last_samples != chunk_samples and n_chunks > 1:
        stsc_runs.append((n_chunks, last_samples, 1))
    elif n_chunks == 1:
        stsc_runs = [(1, n, 1)]
    stsc = atom(
        b"stsc",
        struct.pack(">II", 0, len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    stsz = atom(
        b"stsz",
        struct.pack(">III", 0, 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in frames),
    )
    stco = atom(
        b"stco",
        struct.pack(">II", 0, n_chunks)
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = atom(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = atom(b"vmhd", struct.pack(">I", 1) + bytes(8))
    minf = atom(b"minf", vmhd + stbl)
    mdhd = atom(
        b"mdhd",
        struct.pack(">IIIII", 0, 0, 0, rate, n)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = atom(b"hdlr", bytes(8) + b"vide" + bytes(12) + b"\x00")
    mdia = atom(b"mdia", mdhd + hdlr + minf)
    tkhd = atom(
        b"tkhd",
        struct.pack(">IIIII", 7, 0, 0, 1, 0)
        + bytes(52)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = atom(b"trak", tkhd + mdia)
    mvhd = atom(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, rate, n) + bytes(80),
    )
    moov = atom(b"moov", mvhd + trak)
    return ftyp + mdat + moov
