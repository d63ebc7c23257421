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


def _joint_stream(sr_idx=0, bri=12, nframes=9, seed=7):
    """Hand-packed MPEG-1 joint-stereo stream whose mode_ext (hence the
    shared-subband bound) VARIES PER FRAME — the layout case that forced
    the old kernel to reject joint stereo.  Random alloc is thinned until
    each frame fits its CBR size."""
    from pycricodecs_tpu.ops import mp2_tables as T
    rng = np.random.default_rng(seed)
    out = []
    for f in range(nframes):
        hw = mp2_frame.header_word(3, bri, sr_idx, 0, 1, mode_ext=f % 4)
        hdr = mp2_frame.parse_header(hw.to_bytes(4, "big"))
        table = T.ALLOC_TABLES[hdr.table_id]
        SB, bound = hdr.sblimit, hdr.bound
        alloc_idx = np.array([rng.integers(0, len(table[sb]))
                              * (rng.random() < 0.6) for sb in range(SB)
                              for _ in range(2)]).reshape(SB, 2).T
        alloc_idx[1, bound:] = alloc_idx[0, bound:]

        def bits(ai):
            lev = np.array([[table[sb][ai[c, sb]] for sb in range(SB)]
                            for c in range(2)])
            n = sum((len(table[sb]) - 1).bit_length()
                    * (2 if sb < bound else 1) for sb in range(SB))
            n += 2 * int((lev > 0).sum())              # scfsi
            n += 18 * int((lev > 0).sum())             # sf (scfsi 0)
            for sb in range(SB):
                for c in range(2 if sb < bound else 1):
                    v = int(lev[c, sb])
                    if v:
                        gb = T.GROUP_BITS.get(v)
                        n += 12 * (gb if gb else 3 * T.code_bits(v))
            return n, lev
        n, lev = bits(alloc_idx)
        while n > (hdr.frame_size - 4) * 8:
            nz = np.argwhere(alloc_idx > 0)
            c, sb = nz[rng.integers(0, len(nz))]
            alloc_idx[c, sb] = 0
            if sb >= bound:
                alloc_idx[1 - c, sb] = 0
            n, lev = bits(alloc_idx)
        scfsi = np.zeros((2, SB), np.int32)            # all-parts sf
        sfidx = np.where(lev[:, None] > 0,
                         rng.integers(0, 63, (2, 3, SB)), 0)
        codes = np.zeros((2, 36, SB), np.int64)
        for sb in range(SB):
            for c in range(2):
                if lev[c, sb]:
                    codes[c, :, sb] = rng.integers(0, lev[c, sb], 36)
            if sb >= bound:
                codes[1, :, sb] = codes[0, :, sb]
        out.append(mp2_frame.pack_frame(hdr, bri, sr_idx, alloc_idx,
                                        scfsi, sfidx, codes))
    return b"".join(out)


def test_mp2_device_unpack_joint_stereo_varying_bound():
    blob = _joint_stream()
    hdr0, walk = mp2_frame.scan_frames(blob, 0)
    assert hdr0.mode == 1
    host = mp2_frame.unpack(blob, 0)
    up = mp2_unpack_device.Mp2DeviceUnpacker(hdr0)
    frames = np.zeros((host.nframes, up.fs_max), np.uint8)
    for i, (pos, fr) in enumerate(walk):
        frames[i, :len(fr)] = np.frombuffer(fr, np.uint8)
    codes, lev, sfi, err = (np.asarray(x)
                            for x in up(frames, interpret=True))
    assert not err.any()
    SB = hdr0.sblimit
    assert np.array_equal(codes, host.codes[:, :, :, :SB].astype(np.int32))
    assert np.array_equal(lev, host.levels[:, :, :SB])
    assert np.array_equal(sfi, host.sfidx[:, :, :, :SB].astype(np.int32))


def test_ahx_batch_joint_stereo_device_unpack_parity():
    mo = pytest.importorskip("mpeg_oracles")
    if not mo.available():
        pytest.skip("libtwolame/libmpg123 not available")
    rng = np.random.default_rng(3)
    t = np.arange(int(44100 * 0.4)) / 44100
    pcm = np.stack([np.sin(2 * np.pi * (350 + 80 * c) * t) * 9000
                    + rng.standard_normal(t.size) * 200
                    for c in range(2)]).astype(np.int16)
    blob = mo.twolame_encode(pcm, 44100, 192, "joint")
    from pycricodecs_tpu import parallel
    os.environ["PYCRICODECS_NO_PALLAS_UNPACK"] = "1"
    try:
        ref = parallel.ahx_decode_batch([blob], device=True)
    finally:
        del os.environ["PYCRICODECS_NO_PALLAS_UNPACK"]
    os.environ["PYCRICODECS_PALLAS_INTERPRET"] = "1"
    try:
        got = parallel.ahx_decode_batch([blob], device=True)
    finally:
        del os.environ["PYCRICODECS_PALLAS_INTERPRET"]
    assert ref == got


def test_ahx_batch_vbr_stream_keeps_host_unpack():
    # scan_frames tolerates a mid-stream bitrate change for LSF (table 4
    # for every bitrate); the kernel's fixed frame size cannot — the
    # router must fall back to the host unpacker, not crash
    a = ahx_model.encode_mp2(_pcm(0.25, 1, 22050, 5)[0], 22050,
                             bitrate_kbps=64)
    b = ahx_model.encode_mp2(_pcm(0.25, 1, 22050, 6)[0], 22050,
                             bitrate_kbps=96)
    blob = a + b
    from pycricodecs_tpu import parallel
    os.environ["PYCRICODECS_PALLAS_INTERPRET"] = "1"
    try:
        got = parallel.ahx_decode_batch([blob], device=True)
    finally:
        del os.environ["PYCRICODECS_PALLAS_INTERPRET"]
    ref = parallel.ahx_decode_batch([blob], device=False)
    # engines agree within 1 LSB; byte equality is not guaranteed across
    # f32 device synthesis vs f64 host, so compare decoded samples
    import io
    import wave

    def _samples(w):
        with wave.open(io.BytesIO(w)) as f:
            return np.frombuffer(f.readframes(f.getnframes()), np.int16)
    d = np.abs(_samples(got[0]).astype(int) - _samples(ref[0]).astype(int))
    assert d.max() <= 1
