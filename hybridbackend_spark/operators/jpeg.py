"""Pure-Python JPEG decoder (baseline + progressive) — the real
compressed-image path.

This container ships no imaging library, so the multimodal codec
registry (operators/multimodal.py) previously had nothing real to
register for JPEG: compressed payloads hit the strict-mode raise or the
deterministic fake. This module implements Huffman-coded DCT JPEG
(ITU-T T.81) from scratch on numpy:

  SOI / APPn / COM / DQT / DHT / SOF0 / SOF2 / DRI / SOS / RSTn / EOI,
  8-bit samples, 1- or 3-component scans, sampling factors 1-2
  (4:4:4, 4:2:2, 4:2:0), restart intervals, byte-stuffed entropy data.

PROGRESSIVE (SOF2) is fully supported: scans accumulate into a
per-component coefficient store (spectral selection bands, DC and AC
successive-approximation first + refinement passes per T.81 G.2,
including the AC correction-bit algorithm and EOB runs); the image
renders once after the last scan with a vectorized per-component IDCT.

Out of scope (returns None so the registry falls through): arithmetic
coding, 12-bit, lossless/hierarchical, CMYK. Anything unsupported
still fails loudly in strict mode rather than silently faking.

Performance: the Huffman bit reader is Python-level (the IDCT and color
transform are vectorized numpy). That is fine for tests and for the
metadata/feature extraction paths this engine runs media through; a
production deployment on 100 TB registers a native codec through the
same registry hook and this decoder remains the correctness reference.

Correctness evidence (tests/test_jpeg.py): decodes JPEGs produced by an
INDEPENDENTLY written encoder that lives in the tests (different DCT
formulation, programmatically derived zigzag), with flat-color
exactness, bounded roundtrip error on smooth gradients, subsampling and
restart-marker coverage, plus committed fixture files with pinned pixel
hashes as the cross-session contract.
"""

from __future__ import annotations

import struct

__all__ = ["decode_jpeg"]

# Standard zigzag order: ZIGZAG[k] = raster index of the k-th coefficient
# in the entropy-coded stream (T.81 Figure 5, written as the literal
# table; the test encoder derives its copy by walking diagonals).
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _idct_matrix():
    import numpy as np

    # C[u, x] = c(u)/2 * cos((2x+1) u pi / 16); spatial = C^T K C
    x = np.arange(8)
    u = np.arange(8).reshape(-1, 1)
    m = np.cos((2 * x + 1) * u * np.pi / 16.0) / 2.0
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing.

    Markers (0xFF followed by non-zero, non-RST) end the current entropy
    segment; RST markers are consumed by the caller via `sync_restart`.
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None  # pending marker byte once hit

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False  # marker reached: no more bits here
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # T.81: pad with 1-bits at the end of scan data
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def sync_restart(self) -> bool:
        """Consume an RSTn marker at a restart boundary. Returns True if
        one was consumed (decoder resets DC predictors)."""
        self.bits = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip FF Dn
            self.marker = None
            return True
        # tolerate scanning forward over any pad FFs to the marker
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
            self.marker = None
            return True
        return False


def _build_huffman(counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman: map (bit-length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1: map t-bit magnitude to signed value
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes):
    """Decode a baseline JPEG to an (h, w, 3) uint8 ndarray.

    Returns None when the payload is not a JPEG this decoder can handle
    — wrong magic, progressive/arithmetic/12-bit frames, or structural
    corruption. That is the codec-registry contract ("not mine, fall
    through"): a 2-byte magic sniff is weak evidence, so corrupt data
    falls through to the fake/strict fallback instead of failing the
    whole job from inside a batch.
    """
    try:
        return _decode_jpeg_strict(payload)
    except (ValueError, IndexError, KeyError, struct.error):
        return None


def _decode_jpeg_strict(payload: bytes):
    import numpy as np

    if not payload.startswith(b"\xff\xd8"):
        return None
    data = payload
    pos = 2
    qtabs: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coeffs: dict[int, "np.ndarray"] = {}
    restart_interval = 0
    saw_scan = False

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    q = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    q = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                tbl = np.zeros(64, dtype=np.int64)
                tbl[list(ZIGZAG)] = q.astype(np.int64)
                qtabs[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = seg[p + 1 : p + 17]
                n = sum(counts)
                syms = seg[p + 17 : p + 17 + n]
                tbl = _build_huffman(counts, syms)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                p += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec = seg[0]
            if prec != 8:
                return None
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                tq = seg[8 + c * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame["hmax"], frame["vmax"] = hmax, vmax
            frame["mcux"] = -(-w // (8 * hmax))
            frame["mcuy"] = -(-h // (8 * vmax))
            for c in comps:
                # interleaved-padded block grid; non-interleaved scans
                # use the leading ceil(cw/8) x ceil(ch/8) sub-grid
                bh = frame["mcuy"] * c["v"]
                bw = frame["mcux"] * c["h"]
                coeffs[c["id"]] = np.zeros((bh, bw, 64), dtype=np.int64)
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["bw_ni"] = -(-cw // 8)
                c["bh_ni"] = -(-ch // 8)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # arithmetic / lossless / hierarchical frames
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs = seg[1 + c * 2]
                td_ta = seg[2 + c * 2]
                comp = next(
                    x for x in frame["comps"] if x["id"] == cs
                )
                scomps.append(
                    {**comp, "td": td_ta >> 4, "ta": td_ta & 0xF}
                )
            ss = seg[1 + ns * 2]
            se = seg[2 + ns * 2]
            ah_al = seg[3 + ns * 2]
            ah, al = ah_al >> 4, ah_al & 0xF
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            else:
                # T.81 scan-header constraints for progressive frames
                if ss == 0 and se != 0:
                    raise ValueError("jpeg: progressive DC scan with Se>0")
                if ss > 0 and (ns != 1 or se < ss or se > 63):
                    raise ValueError("jpeg: bad progressive AC band")
                if ah > 13 or al > 13 or (ah and ah != al + 1):
                    raise ValueError("jpeg: bad successive approximation")
            pos = _decode_scan_into(
                data,
                pos + seglen,
                frame,
                scomps,
                huff_dc,
                huff_ac,
                restart_interval,
                ss,
                se,
                ah,
                al,
                coeffs,
            )
            saw_scan = True
            continue
        pos += seglen
    if frame is None or not saw_scan:
        raise ValueError("jpeg: no scan found")
    return _render(frame, coeffs, qtabs)


def _decode_block_seq(br, coef, dc_tbl, ac_tbl, pred_box):
    """Sequential (baseline) block: DC diff + full AC band in one pass."""
    t = _huff_decode(br, dc_tbl)
    diff = _extend(br.read(t), t) if t else 0
    pred_box[0] += diff
    coef[0] = pred_box[0]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC overflow")
        coef[k] = _extend(br.read(s), s)
        k += 1


def _decode_block_dc_first(br, coef, dc_tbl, pred_box, al):
    t = _huff_decode(br, dc_tbl)
    diff = _extend(br.read(t), t) if t else 0
    pred_box[0] += diff
    coef[0] = pred_box[0] << al


def _decode_block_dc_refine(br, coef, al):
    if br.read(1):
        coef[0] |= 1 << al


def _decode_block_ac_first(br, coef, ac_tbl, ss, se, al, eob_box):
    if eob_box[0] > 0:
        eob_box[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eob_box[0] = (1 << r) - 1
                if r:
                    eob_box[0] += br.read(r)
                return
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("jpeg: AC band overflow")
        coef[k] = _extend(br.read(s), s) << al
        k += 1


def _decode_block_ac_refine(br, coef, ac_tbl, ss, se, al, eob_box):
    """T.81 G.2 AC successive-approximation refinement (the correction-
    bit pass): newly-visible coefficients arrive as +-1<<al; every
    history-nonzero coefficient crossed on the way reads one correction
    bit."""
    p1 = 1 << al

    def refine_nonzero(k):
        if br.read(1) and not (abs(int(coef[k])) & p1):
            coef[k] += p1 if coef[k] > 0 else -p1

    if eob_box[0] > 0:
        for k in range(ss, se + 1):
            if coef[k]:
                refine_nonzero(k)
        eob_box[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        val = 0
        if s:
            if s != 1:
                raise ValueError("jpeg: bad refinement size")
            val = p1 if br.read(1) else -p1
        else:
            if r < 15:
                eob_box[0] = 1 << r
                if r:
                    eob_box[0] += br.read(r)
                break
        while k <= se:
            if coef[k]:
                refine_nonzero(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if val and k <= se:
            coef[k] = val
        k += 1
    if eob_box[0] > 0:
        while k <= se:
            if coef[k]:
                refine_nonzero(k)
            k += 1
        eob_box[0] -= 1


def _decode_scan_into(
    data, pos, frame, scomps, huff_dc, huff_ac, restart_interval,
    ss, se, ah, al, coeffs,
):
    """Decode ONE scan's entropy data into the coefficient store and
    return the stream position of the next marker. Handles interleaved
    (multi-component MCU order) and non-interleaved (single-component
    block-raster order, the progressive AC case) scans, restart
    markers, and all four progressive scan types."""
    br = _BitReader(data, pos)
    pred = {c["id"]: [0] for c in scomps}
    eob_box = [0]
    units_done = 0

    def maybe_restart():
        nonlocal units_done
        if (
            restart_interval
            and units_done
            and units_done % restart_interval == 0
        ):
            if br.sync_restart():
                for p in pred.values():
                    p[0] = 0
                eob_box[0] = 0

    def decode_unit(c, by, bx):
        coef = coeffs[c["id"]][by, bx]
        if not frame["progressive"]:
            _decode_block_seq(
                br, coef, huff_dc[c["td"]], huff_ac[c["ta"]], pred[c["id"]]
            )
        elif ss == 0:
            if ah == 0:
                _decode_block_dc_first(
                    br, coef, huff_dc[c["td"]], pred[c["id"]], al
                )
            else:
                _decode_block_dc_refine(br, coef, al)
        else:
            if ah == 0:
                _decode_block_ac_first(
                    br, coef, huff_ac[c["ta"]], ss, se, al, eob_box
                )
            else:
                _decode_block_ac_refine(
                    br, coef, huff_ac[c["ta"]], ss, se, al, eob_box
                )

    if len(scomps) == 1:
        # T.81: a single-component scan is ALWAYS non-interleaved —
        # the MCU is one data unit over the component's own block raster
        c = scomps[0]
        for by in range(c["bh_ni"]):
            for bx in range(c["bw_ni"]):
                maybe_restart()
                decode_unit(c, by, bx)
                units_done += 1
    else:
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                maybe_restart()
                for c in scomps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_unit(
                                c, my * c["v"] + by, mx * c["h"] + bx
                            )
                units_done += 1

    # resume parsing at the marker that ended this scan's entropy data
    # (skip residual entropy bytes, FF00 stuffing, and FF fill bytes)
    p = br.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF)
    ):
        p += 1
    return p


def _render(frame, coeffs, qtabs):
    """Dequantize + IDCT every component's coefficient store (one
    vectorized einsum per component), upsample, color-convert."""
    import numpy as np

    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    cmat = _idct_matrix()
    zz = np.array(ZIGZAG, dtype=np.int64)
    full = []
    for c in frame["comps"]:
        arr = coeffs[c["id"]]
        bh, bw = arr.shape[:2]
        raster = np.zeros((bh * bw, 64), dtype=np.float64)
        raster[:, zz] = arr.reshape(-1, 64)
        raster *= qtabs[c["tq"]].reshape(-1)
        blocks = raster.reshape(-1, 8, 8)
        spatial = (
            np.einsum("ij,njk,kl->nil", cmat.T, blocks, cmat) + 128.0
        )
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])

    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
