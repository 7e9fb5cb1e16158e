"""IMA ADPCM decoder tests (operators/adpcm.py).

The encoder here performs real ADPCM compression (nibble search +
decoder-state tracking). By the codec's design, the encoder KNOWS the
decoder's reconstruction exactly (it must, to encode the next diff), so
tests assert EXACT sample equality between the decoder's output and the
encoder's tracked reconstruction — state-machine verification, not just
an error bound — plus an SNR bound against the original signal.
"""

from __future__ import annotations

import struct

import numpy as np

from hybridbackend_spark.operators.adpcm import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    decode_adpcm_wav,
)

# ---------------------------------------------------------------------------
# independent encoder (tests only)
# ---------------------------------------------------------------------------


def _encode_nibble(sample: int, pred: int, index: int):
    """Choose the nibble for ``sample`` given decoder state, return
    (nibble, new_pred, new_index) with new_pred = the DECODER's exact
    reconstruction."""
    step = IMA_STEP_TABLE[index]
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    # replay the decoder's arithmetic exactly
    d = step >> 3
    if nib & 1:
        d += step >> 2
    if nib & 2:
        d += step >> 1
    if nib & 4:
        d += step
    pred = pred - d if nib & 8 else pred + d
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + IMA_INDEX_TABLE[nib & 7]))
    return nib, pred, index


def encode_adpcm_wav(channels, rate, samples_per_block=505):
    """Encode int16 channel arrays as an IMA ADPCM WAV. Returns
    (wav_bytes, reconstruction) where reconstruction is the exact
    per-channel decoder output implied by the encoding."""
    channels = [np.asarray(c, dtype=np.int64) for c in channels]
    n_ch = len(channels)
    n = len(channels[0])
    block_align = ((samples_per_block - 1) // 2 + 4) * n_ch
    blocks = bytearray()
    recon: list[list[int]] = [[] for _ in range(n_ch)]
    idxs = [0] * n_ch
    for start in range(0, n, samples_per_block):
        seg = [c[start : start + samples_per_block] for c in channels]
        if len(seg[0]) < samples_per_block:  # zero-pad the tail block
            pad = samples_per_block - len(seg[0])
            seg = [np.concatenate([s, np.zeros(pad, np.int64)]) for s in seg]
        preds = []
        for c in range(n_ch):
            p = int(np.clip(seg[c][0], -32768, 32767))
            blocks += struct.pack("<hBB", p, idxs[c], 0)
            preds.append(p)
            recon[c].append(p)
        nibs: list[list[int]] = [[] for _ in range(n_ch)]
        for i in range(1, samples_per_block):
            for c in range(n_ch):
                s = int(np.clip(seg[c][i], -32768, 32767))
                nib, preds[c], idxs[c] = _encode_nibble(s, preds[c], idxs[c])
                nibs[c].append(nib)
                recon[c].append(preds[c])
        # pad nibbles to full 8-nibble groups, tracking state for pads
        for c in range(n_ch):
            while len(nibs[c]) % 8:
                nib, preds[c], idxs[c] = _encode_nibble(0, preds[c], idxs[c])
                nibs[c].append(nib)
        for g in range(len(nibs[0]) // 8):
            for c in range(n_ch):
                grp = nibs[c][g * 8 : g * 8 + 8]
                for k in range(0, 8, 2):
                    blocks.append(grp[k] | (grp[k + 1] << 4))
    byte_rate = rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHH", 0x0011, n_ch, rate, byte_rate, block_align, 4
    ) + struct.pack("<HH", 2, samples_per_block)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
    recon_np = [np.array(r[: n + (samples_per_block - n % samples_per_block)
                           % samples_per_block], np.int64)
                for r in recon]
    return wav, recon_np


def _sig(n, rate=8000, freq=440.0, amp=12000, seed=0):
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * freq * t / rate + seed)
    x += (amp // 10) * np.sin(2 * np.pi * 3.7 * freq * t / rate)
    return np.round(x).astype(np.int64)


# ---------------------------------------------------------------------------
# decoder tests
# ---------------------------------------------------------------------------


def test_mono_exact_state_replay():
    """Decoder output == the encoder's tracked decoder reconstruction,
    sample for sample (the ADPCM design invariant)."""
    sig = _sig(2000)
    wav, recon = encode_adpcm_wav([sig], 8000)
    out = decode_adpcm_wav(wav)
    assert out is not None
    mono, rate = out
    assert rate == 8000
    want = recon[0] / 32768.0
    assert len(mono) == len(want)
    assert np.allclose(mono, want.astype(np.float32), atol=0)


def test_mono_snr_vs_source():
    """~4:1 compression keeps a smooth signal recognizable: SNR well
    above 20 dB against the ORIGINAL samples (independent of any
    decoder-side state)."""
    sig = _sig(4040)
    wav, _ = encode_adpcm_wav([sig], 16000)
    mono, rate = decode_adpcm_wav(wav)
    assert rate == 16000
    x = sig[: len(mono)] / 32768.0
    noise = mono[: len(x)] - x
    snr = 10 * np.log10(float((x**2).sum()) / float((noise**2).sum()))
    assert snr > 20.0, snr
    # and it genuinely compressed: ~4 bits/sample + headers
    assert len(wav) < 0.35 * (2 * len(sig))


def test_stereo_averages_to_mono():
    l = _sig(1010, freq=300.0)
    r = _sig(1010, freq=500.0, seed=1)
    wav, recon = encode_adpcm_wav([l, r], 8000)
    mono, _ = decode_adpcm_wav(wav)
    want = ((recon[0] + recon[1]) / 2.0 / 32768.0)[: len(mono)]
    assert np.allclose(mono, want.astype(np.float64), atol=1e-6)


def test_not_mine_falls_through():
    sig = _sig(600)
    wav, _ = encode_adpcm_wav([sig], 8000)
    assert decode_adpcm_wav(b"OggS not a wav") is None  # wrong magic
    assert decode_adpcm_wav(wav[:40]) is None  # truncated
    # PCM format tag -> None (handled upstream by the stdlib wave path)
    pcm = bytearray(wav)
    tag_off = wav.index(b"fmt ") + 8
    pcm[tag_off : tag_off + 2] = struct.pack("<H", 1)
    assert decode_adpcm_wav(bytes(pcm)) is None


def test_spark_strict_path_decodes_adpcm(spark):
    """End-to-end through extract_audio_features in STRICT mode: an
    ADPCM payload produces real frame energies (no fake, no raise)
    close to the PCM16 WAV of the same signal."""
    import io
    import wave as wave_mod

    from hybridbackend_spark.operators.multimodal import (
        extract_audio_features,
    )

    sig = _sig(8000, rate=8000)
    adpcm, _ = encode_adpcm_wav([sig], 8000)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(sig.astype("<i2").tobytes())
    pcm = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(adpcm)), (2, bytearray(pcm))],
        ["media_id", "payload"],
    )
    rows = {
        r.media_id: np.array(r.features)
        for r in extract_audio_features(df, dim=16, fake=False).collect()
    }
    # same signal through the lossy codec: energies agree closely
    assert float(np.abs(rows[1] - rows[2]).max()) < 0.02


def test_audio_sample_stats_exact_pcm(spark):
    """audio_sample_stats recovers exact int16 sums from a PCM16 WAV
    (the lossless requantization contract) and raises strictly on
    undecodable payloads."""
    import io
    import wave as wave_mod

    import pytest as _pytest
    from pyspark.errors import PythonException

    from hybridbackend_spark.operators.multimodal import audio_sample_stats

    sig = _sig(700, rate=8000)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(np.clip(sig, -32768, 32767).astype("<i2").tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], ["media_id", "payload"]
    )
    r = audio_sample_stats(df).collect()[0]
    s = np.clip(sig, -32768, 32767)
    wt = 1 + np.arange(len(s)) % 7
    assert (r.n_samples, r.rate) == (700, 8000)
    assert r.sum_abs == int(np.abs(s).sum())
    assert r.weighted == int((s * wt).sum())

    bad = spark.createDataFrame(
        [(9, bytearray(b"\x01junk"))], ["media_id", "payload"]
    )
    with _pytest.raises(PythonException, match="not a format decodable"):
        audio_sample_stats(bad, fake=False).collect()
