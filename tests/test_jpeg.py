"""Baseline JPEG decoder tests.

The encoder here is written INDEPENDENTLY of the decoder (different DCT
formulation — direct cosine sums vs the decoder's matrix IDCT — and a
programmatically derived zigzag vs the decoder's literal table), so a
roundtrip exercises two separately implemented codepaths: a
transcription error in either side breaks the roundtrip loudly.
"""

import io
import struct

import numpy as np
import pytest

from hybridbackend_spark.operators.jpeg import decode_jpeg

# ---------------------------------------------------------------------------
# Test-local baseline JPEG ENCODER
# ---------------------------------------------------------------------------

# standard luminance / chrominance quantization tables (T.81 Annex K)
QL = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
QC = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

# standard Huffman specs (bits[16], values); any valid canonical table
# works — the decoder reads them from DHT
DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _zigzag_order():
    """Derive zigzag by diagonal walking (independent of the decoder's
    literal table)."""
    order = []
    for d in range(15):
        idxs = [(d - j, j) for j in range(d + 1) if 0 <= d - j < 8 and j < 8]
        if d % 2 == 1:
            idxs = idxs[::-1]  # odd diagonals run top-right -> bottom-left
        order += [r * 8 + c for r, c in idxs]
    return order


ZZ = _zigzag_order()


def _dct2(block):
    """Direct DCT-II by cosine sums (the decoder uses a matrix IDCT)."""
    f = np.zeros((8, 8))
    xs = np.arange(8)
    for u in range(8):
        cu = 1 / np.sqrt(2) if u == 0 else 1.0
        for v in range(8):
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            cosx = np.cos((2 * xs + 1) * u * np.pi / 16)
            cosy = np.cos((2 * xs + 1) * v * np.pi / 16)
            f[u, v] = 0.25 * cu * cv * float(cosx @ block @ cosy)
    return f


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def pad(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _huff_codes(spec):
    bits, vals = spec
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _scaled_q(tbl, quality):
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int64)


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coef = _dct2(block - 128.0)
    qz = np.round(coef / q).astype(np.int64)
    seq = qz.reshape(-1)[ZZ]
    diff = int(seq[0]) - pred
    pred = int(seq[0])

    def maglen(v):
        return 0 if v == 0 else int(abs(v)).bit_length()

    def putmag(v, t):
        if t:
            bw.put(v if v >= 0 else v + (1 << t) - 1, t)

    t = maglen(diff)
    c, ln = dc_codes[t]
    bw.put(c, ln)
    putmag(diff, t)
    run = 0
    for k in range(1, 64):
        v = int(seq[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.put(c, ln)
            run -= 16
        t = maglen(v)
        c, ln = ac_codes[(run << 4) | t]
        bw.put(c, ln)
        putmag(v, t)
        run = 0
    if run:
        c, ln = ac_codes[0x00]
        bw.put(c, ln)
    return pred


def encode_jpeg(img, quality=90, subsample=False, gray=False,
                restart_interval=0):
    """Minimal baseline JPEG encoder (tests only)."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    if gray:
        planes = [img[:, :, 0]]
        samp = [(1, 1)]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                        + pp[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    ql = _scaled_q(QL, quality)
    qc = _scaled_q(QC, quality)
    qt = [ql] + [qc] * (len(planes) - 1)

    buf = io.BytesIO()
    buf.write(b"\xff\xd8")

    def seg(marker, body):
        buf.write(bytes([0xFF, marker]))
        buf.write(struct.pack(">H", len(body) + 2))
        buf.write(body)

    def dqt(tid, tbl):
        z = bytes(int(tbl.reshape(-1)[ZZ][k]) for k in range(64))
        seg(0xDB, bytes([tid]) + z)

    dqt(0, ql)
    if len(planes) > 1:
        dqt(1, qc)

    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for i, (hs, vs) in enumerate(samp):
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    seg(0xC0, bytes(sof))

    def dht(tc, th, spec):
        bits, vals = spec
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    dht(0, 0, DC_L)
    dht(1, 0, AC_L)
    if len(planes) > 1:
        dht(0, 1, DC_C)
        dht(1, 1, AC_C)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    sos = bytearray([len(planes)])
    for i in range(len(planes)):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (hs, vs) in zip(planes, samp):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        )
    dcl, acl = _huff_codes(DC_L), _huff_codes(AC_L)
    dcc, acc_ = _huff_codes(DC_C), _huff_codes(AC_C)
    bw = _BitWriter()
    pred = [0] * len(planes)
    mcus = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcus and mcus % restart_interval == 0:
                bw.pad()
                buf.write(bytes(bw.out))
                bw = _BitWriter()
                buf.write(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                pred = [0] * len(planes)
            for ci, (p, (hs, vs)) in enumerate(zip(padded, samp)):
                dc = dcl if ci == 0 else dcc
                ac = acl if ci == 0 else acc_
                q = qt[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        pred[ci] = _encode_block(
                            bw, p[y0:y0 + 8, x0:x0 + 8], q, dc, ac, pred[ci]
                        )
            mcus += 1
    bw.pad()
    buf.write(bytes(bw.out))
    buf.write(b"\xff\xd9")
    return buf.getvalue()


def _plan_setup(img, quality, gray, subsample):
    """Shared plane/quant/table setup + fully quantized zigzag
    coefficient blocks per component (the progressive encoder codes
    from these; independent of the decoder's math)."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    if gray:
        planes = [img[:, :, 0]]
        samp = [(1, 1)]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                        + pp[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    ql = _scaled_q(QL, quality)
    qc = _scaled_q(QC, quality)
    qt = [ql] + [qc] * (len(planes) - 1)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []  # per comp: (grid_bh, grid_bw, 64) zigzag-ordered ints
    for p, (hs, vs), q in zip(planes, samp, qt):
        bh, bw_ = mcuy * vs, mcux * hs
        pp = np.pad(
            p,
            ((0, bh * 8 - p.shape[0]), (0, bw_ * 8 - p.shape[1])),
            mode="edge",
        )
        out = np.zeros((bh, bw_, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw_):
                blk = _dct2(pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0)
                out[by, bx] = np.round(blk / q).astype(np.int64).reshape(-1)[ZZ]
        coefs.append(out)
    return h, w, planes, samp, qt, hmax, vmax, mcux, mcuy, coefs


def encode_jpeg_progressive(img, quality=90, gray=False, subsample=False,
                            successive=True):
    """Minimal PROGRESSIVE JPEG encoder (tests only): spectral selection
    (DC scan; AC bands 1-5 and 6-63 per component, non-interleaved) and
    optional successive approximation (Al=1 first scans + Ah=1
    refinement scans, including the AC correction-bit pass). Emission
    follows T.81 G.1.2 directly — independent of the decoder's G.2
    consumption logic."""
    (h, w, planes, samp, qt, hmax, vmax, mcux, mcuy,
     coefs) = _plan_setup(img, quality, gray, subsample)
    al1 = 1 if successive else 0
    buf = io.BytesIO()
    buf.write(b"\xff\xd8")

    def seg(marker, body):
        buf.write(bytes([0xFF, marker]))
        buf.write(struct.pack(">H", len(body) + 2))
        buf.write(body)

    def dqt(tid, tbl):
        z = bytes(int(tbl.reshape(-1)[ZZ][k]) for k in range(64))
        seg(0xDB, bytes([tid]) + z)

    dqt(0, qt[0])
    if len(planes) > 1:
        dqt(1, qt[1])
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for i, (hs, vs) in enumerate(samp):
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    seg(0xC2, bytes(sof))  # SOF2: progressive DCT, Huffman

    def dht(tc, th, spec):
        bits, vals = spec
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    dht(0, 0, DC_L)
    dht(1, 0, AC_L)
    if len(planes) > 1:
        dht(0, 1, DC_C)
        dht(1, 1, AC_C)
    dcl, acl = _huff_codes(DC_L), _huff_codes(AC_L)
    dcc, acc_ = _huff_codes(DC_C), _huff_codes(AC_C)

    def sos(comp_ids, tdta, ss, se_, ah, al):
        body = bytearray([len(comp_ids)])
        for cid, tt in zip(comp_ids, tdta):
            body += bytes([cid, tt])
        body += bytes([ss, se_, (ah << 4) | al])
        seg(0xDA, bytes(body))

    def putmag(bw, v, t):
        if t:
            bw.put(v if v >= 0 else v + (1 << t) - 1, t)

    # --- scan 1: DC first (interleaved), Al = al1 ---
    all_ids = list(range(1, len(planes) + 1))
    sos(all_ids, [0x00 if i == 0 else 0x10 for i in range(len(planes))],
        0, 0, 0, al1)
    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(samp):
                dc = dcl if ci == 0 else dcc
                for by in range(vs):
                    for bx in range(hs):
                        v = int(coefs[ci][my * vs + by, mx * hs + bx, 0])
                        v >>= al1  # arithmetic shift per T.81 DC path
                        diff = v - pred[ci]
                        pred[ci] = v
                        t = 0 if diff == 0 else abs(diff).bit_length()
                        c, ln = dc[t]
                        bw.put(c, ln)
                        putmag(bw, diff, t)
    bw.pad()
    buf.write(bytes(bw.out))

    # --- scan 2: DC refinement (interleaved), Ah=1, Al=0 ---
    if successive:
        sos(all_ids, [0x00] * len(planes), 0, 0, 1, 0)
        bw = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hs, vs) in enumerate(samp):
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(
                                coefs[ci][my * vs + by, mx * hs + bx, 0]
                            )
                            bw.put(v & 1, 1)
        bw.pad()
        buf.write(bytes(bw.out))

    # per-component non-interleaved grids
    def ni_grid(ci):
        hs, vs = samp[ci]
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        return -(-ch // 8), -(-cw // 8)

    bands = [(1, 5), (6, 63)]

    # --- AC first scans, Al = al1 ---
    for ci in range(len(planes)):
        ac = acl if ci == 0 else acc_
        for (ss, se_) in bands:
            sos([ci + 1], [0x00 if ci == 0 else 0x11], ss, se_, 0, al1)
            bw = _BitWriter()
            bh, bw_n = ni_grid(ci)
            for by in range(bh):
                for bx in range(bw_n):
                    seq = coefs[ci][by, bx]
                    run = 0
                    for k in range(ss, se_ + 1):
                        v = int(seq[k])
                        m = abs(v) >> al1
                        if m == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = ac[0xF0]
                            bw.put(c, ln)
                            run -= 16
                        t = m.bit_length()
                        c, ln = ac[(run << 4) | t]
                        bw.put(c, ln)
                        putmag(bw, m if v > 0 else -m, t)
                        run = 0
                    if run:
                        c, ln = ac[0x00]  # EOB (eobrun = 1)
                        bw.put(c, ln)
            bw.pad()
            buf.write(bytes(bw.out))

    # --- AC refinement scans, Ah=1, Al=0 ---
    if successive:
        for ci in range(len(planes)):
            ac = acl if ci == 0 else acc_
            for (ss, se_) in bands:
                sos([ci + 1], [0x00 if ci == 0 else 0x11], ss, se_, 1, 0)
                bw = _BitWriter()
                bh, bw_n = ni_grid(ci)
                for by in range(bh):
                    for bx in range(bw_n):
                        seq = coefs[ci][by, bx]

                        def hist(k):
                            return (abs(int(seq[k])) >> 1) != 0

                        newly = [
                            k for k in range(ss, se_ + 1)
                            if abs(int(seq[k])) == 1
                        ]
                        k = ss
                        for kk in newly:
                            r = sum(
                                1 for j in range(k, kk)
                                if int(seq[j]) == 0
                            )
                            while r > 15:
                                c, ln = ac[0xF0]
                                bw.put(c, ln)
                                cnt = 0
                                while cnt < 16:
                                    if hist(k):
                                        bw.put(abs(int(seq[k])) & 1, 1)
                                    else:
                                        cnt += 1
                                    k += 1
                                r -= 16
                            c, ln = ac[(r << 4) | 1]
                            bw.put(c, ln)
                            bw.put(1 if int(seq[kk]) > 0 else 0, 1)
                            while k < kk:
                                if hist(k):
                                    bw.put(abs(int(seq[k])) & 1, 1)
                                k += 1
                            k = kk + 1
                        if k <= se_:
                            c, ln = ac[0x00]  # EOB; then trailing bits
                            bw.put(c, ln)
                            while k <= se_:
                                if hist(k):
                                    bw.put(abs(int(seq[k])) & 1, 1)
                                k += 1
                bw.pad()
                buf.write(bytes(bw.out))

    buf.write(b"\xff\xd9")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# decoder tests
# ---------------------------------------------------------------------------


def _smooth(h, w, seed=0):
    """Smooth low-frequency test image (JPEG-friendly: bounded roundtrip
    error is meaningful)."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = 128 + 90 * np.sin(xx / 9.0 + seed)
    g = 128 + 90 * np.cos(yy / 7.0 - seed)
    b = 128 + 80 * np.sin((xx + yy) / 11.0)
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def fixture_recipes():
    """Source pixels + encode params for every committed fixture JPEG —
    the single recipe shared by tools/make_jpeg_fixtures.py (generation)
    and test_fixture_jpegs_pinned_hashes (verification), so the test can
    compare decoded output against the ORIGINAL source pixels instead of
    trusting the decoder that produced the pins."""
    return {
        "smooth_444_q90.jpg": (_smooth(32, 40, seed=1), dict(quality=90)),
        "smooth_420_q85.jpg": (
            _smooth(25, 33, seed=2), dict(quality=85, subsample=True)
        ),
        "gray_q90.jpg": (
            _smooth(16, 16, seed=3), dict(quality=90, gray=True)
        ),
        "restart_dri2_q88.jpg": (
            _smooth(24, 32, seed=4), dict(quality=88, restart_interval=2)
        ),
        "flat_teal_q75.jpg": (
            np.full((12, 20, 3), (0, 128, 128), dtype=np.uint8),
            dict(quality=75),
        ),
        "progressive_sa_q90.jpg": (
            _smooth(24, 31, seed=6), dict(quality=90, progressive=True)
        ),
    }


def test_flat_color_decodes_exactly():
    img = np.full((16, 24, 3), (200, 64, 130), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (16, 24, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_smooth_roundtrip_bounded_error_444():
    img = _smooth(32, 40)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert float(err.mean()) < 4.0
    assert int(err.max()) <= 25


def test_smooth_roundtrip_420_subsampled():
    img = _smooth(24, 24, seed=3)
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert float(err.mean()) < 6.0


def test_odd_dimensions_cropped():
    img = _smooth(19, 13, seed=5)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (19, 13, 3)


def test_grayscale_single_component():
    img = _smooth(16, 16, seed=7)
    out = decode_jpeg(encode_jpeg(img, quality=90, gray=True))
    assert out.shape == (16, 16, 3)
    # all three output channels replicate luma
    assert np.array_equal(out[..., 0], out[..., 1])
    y = img[..., 0].astype(int)
    assert float(np.abs(out[..., 0].astype(int) - y).mean()) < 4.0


def test_restart_markers_equal_no_restart():
    img = _smooth(32, 48, seed=9)
    a = decode_jpeg(encode_jpeg(img, quality=88))
    b = decode_jpeg(encode_jpeg(img, quality=88, restart_interval=2))
    assert np.array_equal(a, b)


def test_not_mine_falls_through():
    assert decode_jpeg(b"P6\n1 1\n255\nabc") is None  # wrong magic
    assert decode_jpeg(b"\xff\xd8\xff\xe0 corrupt") is None  # truncated
    # a baseline stream RELABELED as SOF2 is malformed progressive (its
    # scan header says Ss=0, Se=63 — illegal for a DC scan) -> None,
    # not garbage pixels
    img = _smooth(8, 8)
    blob = bytearray(encode_jpeg(img))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    assert decode_jpeg(bytes(blob)) is None
    # arithmetic-coded frame type (SOF9) stays out of scope -> None
    blob[i + 1] = 0xC9
    assert decode_jpeg(bytes(blob)) is None


def test_spark_strict_path_decodes_real_jpeg(spark):
    """End-to-end through the Spark operator in STRICT mode: a real
    JPEG payload produces real pixel features (no fake, no raise), and
    they match the features of the same pixels fed as PPM."""
    from hybridbackend_spark.operators.multimodal import (
        decode_image_features,
        encode_ppm,
    )

    img = _smooth(16, 16, seed=11)
    jpg = encode_jpeg(img, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(jpg)), (2, bytearray(encode_ppm(img)))],
        ["media_id", "payload"],
    )
    rows = {r["media_id"]: r["features"]
            for r in decode_image_features(df, dim=12, fake=False).collect()}
    a, b = np.array(rows[1]), np.array(rows[2])
    # same image through two real codecs: features agree to JPEG loss
    assert float(np.abs(a - b).max()) < 0.05


def test_fixture_jpegs_pinned_hashes():
    """Committed fixture JPEGs: (1) decoded output matches the SOURCE
    pixels within JPEG-loss bounds — independent verification against
    the recipe arrays, which do not pass through the decoder; (2) the
    recipe still reproduces the pinned source hash (guards recipe
    drift); (3) decoded bytes match the pinned decoder hash — a
    REGRESSION pin only, since it was produced by the decoder itself
    (regenerate via tools/make_jpeg_fixtures.py when rebuilding)."""
    import hashlib
    import json
    import os

    fdir = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                        "jpeg")
    with open(os.path.join(fdir, "expected.json")) as f:
        expected = json.load(f)
    recipes = fixture_recipes()
    assert expected and set(expected) == set(recipes)
    for name, want in expected.items():
        src, kwargs = recipes[name]
        src_sha = hashlib.sha256(src.tobytes()).hexdigest()[:16]
        assert src_sha == want["source"], (name, "source recipe drifted")
        with open(os.path.join(fdir, name), "rb") as f:
            out = decode_jpeg(f.read())
        # independent correctness: decoded pixels vs original source
        if kwargs.get("gray"):
            err = np.abs(out[..., 0].astype(int) - src[..., 0].astype(int))
        else:
            err = np.abs(out.astype(int) - src.astype(int))
        assert out.shape[:2] == src.shape[:2], name
        assert float(err.mean()) < 6.0, (name, err.mean())
        assert int(err.max()) <= 40, (name, err.max())
        # regression pin (decoder-derived)
        got = hashlib.sha256(out.tobytes()).hexdigest()[:16]
        assert got == want["decoded"], (name, got, want["decoded"])


def test_progressive_equals_baseline_444():
    """Progressive (spectral selection + successive approximation) and
    baseline encodings of the same image carry IDENTICAL quantized
    coefficients, so the decodes must match pixel-for-pixel."""
    img = _smooth(32, 40, seed=21)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert prog is not None
    assert np.array_equal(prog, base)


def test_progressive_spectral_selection_only():
    """Al=0 everywhere (no refinement scans) — pure spectral selection
    is also a legal progressive stream and must decode identically."""
    img = _smooth(24, 17, seed=22)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, successive=False)
    )
    assert np.array_equal(prog, base)


def test_progressive_grayscale_and_subsampled():
    g = _smooth(16, 16, seed=23)
    base = decode_jpeg(encode_jpeg(g, quality=90, gray=True))
    prog = decode_jpeg(encode_jpeg_progressive(g, quality=90, gray=True))
    assert np.array_equal(prog, base)
    img = _smooth(25, 33, seed=24)
    base = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=85, subsample=True)
    )
    assert np.array_equal(prog, base)


def test_progressive_roundtrip_error_bounded():
    """Against the SOURCE pixels (not the baseline decode): the
    progressive pipeline is still a faithful JPEG."""
    img = _smooth(32, 48, seed=25)
    out = decode_jpeg(encode_jpeg_progressive(img, quality=92))
    err = np.abs(out.astype(int) - img.astype(int))
    assert float(err.mean()) < 4.0
    assert int(err.max()) <= 25
