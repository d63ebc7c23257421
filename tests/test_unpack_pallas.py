"""Pallas coefficient-phase unpacker parity (interpret mode on CPU).

DeviceUnpacker._coefficients_pallas keeps each 1024-frame block's word
table VMEM-resident for the whole coefficient phase; it must produce qc
bit-identical to the XLA scan path (_coefficients) — both share the
window/VLC math via _vlc_symbol (hca.cpp:1444-1577 anchors).
"""
import os

import numpy as np
import pytest

from pycricodecs_tpu.ops import hca_encode_host, hca_frame
from pycricodecs_tpu.ops import hca_unpack_device
from pycricodecs_tpu.utils.wav import write_wav

from conftest import make_sine_pcm16


@pytest.mark.parametrize("channels,quality", [(2, 2)])
def test_coefficients_pallas_bit_exact(channels, quality):
    wav = write_wav(make_sine_pcm16(24000, channels, seed=11),
                    channels, 48000)
    blob = hca_encode_host.encode(wav, quality=quality)
    hs = int.from_bytes(blob[6:8], "big")
    info = hca_frame.parse_header(blob[:hs])
    fs, F = info.frame_size, info.frame_count
    frames = np.frombuffer(blob[hs:hs + F * fs], np.uint8).reshape(F, fs)
    cipher = np.asarray(info.cipher, np.uint8)
    ath = np.asarray(info.ath, np.int32)

    _assert_engines_match(info, frames, cipher, ath)


def _assert_engines_match(info, frames, cipher, ath):
    """Full pallas unpack (interpret) vs the XLA scan path: all outputs."""
    os.environ["PYCRICODECS_NO_PALLAS_UNPACK"] = "1"
    try:
        ref = hca_unpack_device.DeviceUnpacker(info)._jit(
            frames, cipher, ath, B=1)
    finally:
        del os.environ["PYCRICODECS_NO_PALLAS_UNPACK"]
    os.environ["PYCRICODECS_PALLAS_INTERPRET"] = "1"
    try:
        got = hca_unpack_device.DeviceUnpacker(info)._jit(
            frames, cipher, ath, B=1)
    finally:
        del os.environ["PYCRICODECS_PALLAS_INTERPRET"]
    for i, name in enumerate(("qc", "sf", "res", "inten", "err")):
        assert np.array_equal(np.asarray(ref[i]), np.asarray(got[i])), name


def test_side_info_pallas_synthetic_v3():
    """The side-info kernel's v3 intensity/HFR-extension paths against the
    XLA scan engine, on grammar-driven synthetic v3 frames (escape chains,
    per-frame error flags)."""
    from test_hca_unpack_device import _make_v3_frame, _v3_info

    info = _v3_info()
    assert info.hfr_group_count > 0
    rng = np.random.default_rng(20260818)
    frames_b = b"".join(_make_v3_frame(info, rng) for _ in range(24))
    frames = np.frombuffer(frames_b, np.uint8).reshape(24, info.frame_size)
    _assert_engines_match(info, frames,
                          np.asarray(info.cipher, np.uint8),
                          np.asarray(info.ath, np.int32))
