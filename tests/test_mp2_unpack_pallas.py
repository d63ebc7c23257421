"""MP2/AHX device unpacker parity (interpret mode on CPU).

Mp2DeviceUnpacker must reproduce mp2_frame.unpack's SoA tensors exactly
(the host path is itself locked against libtwolame/libmpg123 oracles in
tests/test_ahx.py), and ahx_decode_batch's device-unpack engine must emit
byte-identical WAVs to its host-unpack engine.
"""
import os

import numpy as np
import pytest

from pycricodecs_tpu.models import ahx as ahx_model
from pycricodecs_tpu.ops import mp2_frame, mp2_unpack_device
from pycricodecs_tpu.utils.wav import write_wav


def _pcm(dur, ch, sr, seed):
    n = int(sr * dur)
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    base = sum(a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
               for f, a in ((197, 0.3), (1201, 0.2), (3333, 0.1)))
    base = base + 0.03 * rng.standard_normal(n)
    pcm = np.stack([base * (1 - 0.1 * c) for c in range(ch)], 0)
    return np.clip(pcm * 32767, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("ch,sr,br", [(1, 22050, 64), (2, 44100, 192)],
                         ids=["lsf_mono", "mpeg1_stereo"])
def test_mp2_device_unpack_matches_host(ch, sr, br):
    blob = ahx_model.encode_mp2(_pcm(0.6, ch, sr, seed=ch), sr,
                                bitrate_kbps=br)
    hdr0, walk = mp2_frame.scan_frames(blob, 0)
    host = mp2_frame.unpack(blob, 0)
    F = host.nframes
    up = mp2_unpack_device.Mp2DeviceUnpacker(hdr0)
    frames = np.zeros((F, up.fs_max), np.uint8)
    for i, (pos, fr) in enumerate(walk):
        frames[i, :len(fr)] = np.frombuffer(fr, np.uint8)
    codes, lev, sfi, err = (np.asarray(x)
                            for x in up(frames, interpret=True))
    assert not err.any()
    SB = hdr0.sblimit
    assert np.array_equal(codes, host.codes[:, :, :, :SB].astype(np.int32))
    assert np.array_equal(lev, host.levels[:, :, :SB])
    assert np.array_equal(sfi, host.sfidx[:, :, :, :SB].astype(np.int32))


def test_ahx_batch_device_unpack_engine_parity():
    blobs = [ahx_model.AHX.encode(
        write_wav(_pcm(0.3 + 0.2 * s, 1, 22050, s).reshape(-1), 1, 22050))
        for s in range(2)]
    from pycricodecs_tpu import parallel
    os.environ["PYCRICODECS_NO_PALLAS_UNPACK"] = "1"
    try:
        ref = parallel.ahx_decode_batch(blobs, device=True)
    finally:
        del os.environ["PYCRICODECS_NO_PALLAS_UNPACK"]
    os.environ["PYCRICODECS_PALLAS_INTERPRET"] = "1"
    try:
        got = parallel.ahx_decode_batch(blobs, device=True)
    finally:
        del os.environ["PYCRICODECS_PALLAS_INTERPRET"]
    assert ref == got


def test_mp2_device_unpack_rejects_joint_stereo():
    class H:
        mode = 1
    with pytest.raises(ValueError):
        mp2_unpack_device.Mp2DeviceUnpacker(H())
