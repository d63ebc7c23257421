"""Vectorised MP2 encoder lanes vs their per-frame / stacked references.

pack_frames (width-bucketed bit scatter over the whole stream) must be
byte-identical to the per-frame pack_frame loop; analyze_fast (16 shifted
[T, 32] row accumulations) must match analyze_np to f64 association-order
noise.  Neither needs the system oracles (tests/test_ahx.py covers those).
"""
import numpy as np
import pytest

from pycricodecs_tpu.models import ahx as ahxmod
from pycricodecs_tpu.ops import mp2_frame, mp2_kernels

CONFIGS = [
    (22050, 1, 96),    # LSF mono (AHX native)
    (16000, 1, 48),    # LSF low-rate
    (24000, 2, 128),   # LSF stereo
    (44100, 1, 64),    # MPEG-1 table a
    (44100, 2, 224),   # MPEG-1 table b
    (48000, 1, 48),    # MPEG-1 table c
    (32000, 1, 48),    # MPEG-1 table d
]


def _sig(sr, nch, seed=3, seconds=1.3):
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    chs = [np.sin(2 * np.pi * (300 + 150 * c) * t) * 9000
           + rng.standard_normal(n) * 400 for c in range(nch)]
    return np.clip(np.array(chs), -32768, 32767).astype(np.int16)


def _per_frame_pack(hdr, bitrate_idx, sr_idx, alloc, scfsi, sfidx, codes,
                    pads, frame_sizes):
    out = bytearray()
    for f in range(alloc.shape[0]):
        fhdr = hdr._replace(padding=int(pads[f]),
                            frame_size=int(frame_sizes[f]))
        out += mp2_frame.pack_frame(fhdr, bitrate_idx, sr_idx, alloc[f],
                                    scfsi[f], sfidx[f], codes[f])
    return bytes(out)


@pytest.mark.parametrize("sr,nch,kbps", CONFIGS)
def test_pack_frames_matches_per_frame(sr, nch, kbps, monkeypatch):
    pcm = _sig(sr, nch)
    fast = ahxmod.encode_mp2(pcm, sr, kbps)
    monkeypatch.setattr(mp2_frame, "pack_frames", _per_frame_pack)
    ref = ahxmod.encode_mp2(pcm, sr, kbps)
    assert fast == ref


def test_analyze_fast_matches_np():
    rng = np.random.default_rng(5)
    for shape in ((32 * 40,), (2, 32 * 173)):
        x = rng.standard_normal(shape)
        a = mp2_kernels.analyze_np(x)
        b = mp2_kernels.analyze_fast(x)
        assert np.abs(a - b).max() < 1e-11


def test_encoded_stream_decodes_clean():
    """Round trip through our own decoder after the vectorised encode."""
    sr, nch = 22050, 1
    pcm = _sig(sr, nch, seconds=1.0)
    blob = ahxmod.encode_mp2(pcm, sr, 96)
    out, got_sr = ahxmod.decode_mp2(blob)
    assert got_sr == sr
    lag = 481
    a = pcm[0, : pcm.shape[1] - lag].astype(float)
    b = out[0, lag:lag + len(a)].astype(float)
    snr = 10 * np.log10(np.sum(a * a) / max(1.0, np.sum((a - b) ** 2)))
    assert snr > 25, snr
