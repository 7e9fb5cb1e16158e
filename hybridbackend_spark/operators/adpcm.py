"""IMA ADPCM (DVI4) WAV decoder — pure Python, no codec libraries.

Built-in real codec for the AUDIO side of the multimodal family:
decodes WAVE files with format tag 0x0011 (IMA ADPCM, 4 bits per
sample, ~4:1 compression vs PCM16) to the registry's audio contract
``(mono float ndarray in [-1, 1], sample_rate)``. Mono and stereo
(averaged to mono) are supported; PCM WAVs are handled upstream by the
stdlib ``wave`` path in operators/multimodal.py, and other WAVE format
tags return None (registry fall-through).

The decode state machine (step/index tables, predictor clamp) follows
the IMA reference algorithm; the test-suite encoder tracks the decoder
prediction on its own side — the spec's design property — so tests can
assert EXACT sample equality, not just an error bound.

Spec: IMA Digital Audio Focus and Technical Working Groups recommended
practices (1992); Microsoft WAVE format tag 0x0011 block layout.
"""

from __future__ import annotations

import struct

__all__ = ["decode_adpcm_wav", "IMA_STEP_TABLE", "IMA_INDEX_TABLE"]

IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _decode_nibble(nib: int, pred: int, index: int):
    """One IMA ADPCM step: returns (new_pred, new_index)."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    if nib & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + IMA_INDEX_TABLE[nib & 7]))
    return pred, index


def _decode_block(block: bytes, n_ch: int, samples_per_block: int):
    """Decode one IMA ADPCM block -> per-channel int16 lists."""
    chans: list[list[int]] = []
    preds, idxs = [], []
    for c in range(n_ch):
        pred, index, _res = struct.unpack_from("<hBB", block, c * 4)
        if index > 88:
            raise ValueError("bad ADPCM step index")
        preds.append(pred)
        idxs.append(index)
        chans.append([pred])  # block header carries sample 0 verbatim
    pos = n_ch * 4
    # nibble data: 4-byte (8-nibble) groups round-robin per channel
    while pos < len(block) and len(chans[0]) < samples_per_block:
        for c in range(n_ch):
            group = block[pos : pos + 4]
            pos += 4
            for byte in group:
                for nib in (byte & 0x0F, byte >> 4):
                    if len(chans[c]) >= samples_per_block:
                        break
                    preds[c], idxs[c] = _decode_nibble(
                        nib, preds[c], idxs[c]
                    )
                    chans[c].append(preds[c])
    return chans


def _decode_adpcm_strict(payload: bytes):
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_ch, rate, _bps, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag != 0x0011:
        raise ValueError("not IMA ADPCM")
    if bits != 4 or n_ch not in (1, 2):
        raise ValueError("unsupported ADPCM layout")
    # samples per block from the spec layout (fact chunk optional)
    samples_per_block = (block_align - 4 * n_ch) * 2 // n_ch + 1
    out: list[list[int]] = [[] for _ in range(n_ch)]
    for off in range(0, len(data) - block_align + 1, block_align):
        chans = _decode_block(
            data[off : off + block_align], n_ch, samples_per_block
        )
        for c in range(n_ch):
            out[c].extend(chans[c])
    if not out[0]:
        raise ValueError("no audio data")
    x = np.array(out, dtype=np.float64)
    mono = x.mean(axis=0) / 32768.0
    return mono.astype(np.float32), int(rate)


def decode_adpcm_wav(payload: bytes):
    """Decode an IMA ADPCM WAV to (mono float ndarray in [-1, 1],
    sample_rate), or None when the payload is not one this decoder
    handles — the codec-registry fall-through contract."""
    try:
        return _decode_adpcm_strict(payload)
    except (ValueError, IndexError, KeyError, struct.error):
        return None
