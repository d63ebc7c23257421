"""Device MP2/AHX encoder (ops/mp2_encode_device.py).

Certification split (module docstring contract):
- post-analysis determinism: device bytes == numpy mirror bytes GIVEN the
  same spectra (the mirror replicates the f32 op order, proxy allocation
  ranking, and first-index argmax ties);
- end-to-end quality: the f32 device stream decodes within a fraction of a
  dB of the float64 host encoder on clean content;
- batch semantics: padded/bucketed banks slice back to the same bytes as
  single-stream encodes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pycricodecs_tpu.models import ahx as ahx_model
from pycricodecs_tpu.ops import mp2_encode_device as E
from pycricodecs_tpu.ops import mp2_frame


def _pcm(C, N, rate, seed, noisy=False):
    rng = np.random.default_rng(seed)
    t = np.arange(N) / rate
    pcm = np.zeros((C, N), np.int16)
    for c in range(C):
        f0 = 180 + 140 * c + 11 * (seed % 13)
        x = 0.5 * np.sin(2 * np.pi * f0 * t) \
            + 0.15 * np.sin(2 * np.pi * 3.7 * f0 * t)
        if noisy:
            x = x + 0.1 * rng.standard_normal(N)
        pcm[c] = np.clip(x * 25000, -32768, 32767).astype(np.int16)
    return pcm


def _device_stream(pcm, rate, br, want_spectra=False, joint_bound=None):
    cfg = E.make_config(rate, pcm.shape[0], br, joint_bound=joint_bound)
    F = pcm.shape[1] // 1152
    pads = E.frame_padding(cfg, F)
    out = E.mp2_encode_frames(
        jnp.asarray(pcm[None]), jnp.asarray(pads),
        version=cfg.version, sr_idx=cfg.sr_idx, bitrate_idx=cfg.bitrate_idx,
        mode=cfg.mode, table_id=cfg.table_id, sblimit=cfg.sblimit,
        channels=cfg.channels, frame_base=cfg.frame_base,
        nbal_bits=cfg.nbal_bits, bound=cfg.bound, mode_ext=cfg.mode_ext,
        return_spectra=want_spectra)
    if want_spectra:
        frames, S0 = out
        return (E.assemble_stream(np.asarray(frames)[0, :F], cfg, pads),
                cfg, np.asarray(S0)[0])
    return E.assemble_stream(np.asarray(out)[0, :F], cfg, pads), cfg


CASES = [
    (1, 22050, 80, 5),      # AHX home turf: MPEG-2 LSF mono
    (1, 16000, 64, 6),
    (2, 24000, 160, 7),     # LSF stereo
    (2, 44100, 192, 8),     # MPEG-1 table 1
    (2, 48000, 128, 9),     # MPEG-1 table 0
    (1, 32000, 56, 10),     # MPEG-1 table 3
    (2, 44100, 48, 11),     # MPEG-1 low bitrate table 2 (sblimit 8)
]


@pytest.mark.parametrize("C,rate,br,seed", CASES,
                         ids=[f"c{c}r{r}b{b}" for c, r, b, _ in CASES])
def test_device_matches_mirror(C, rate, br, seed):
    """Device post-analysis pipeline == numpy mirror, byte for byte, with
    the spectra pinned FROM THE SAME DISPATCH (the analysis reduce order is
    shape/fusion-dependent — see mp2_encode_frames' return_spectra note)."""
    N = 1152 * 7
    pcm = _pcm(C, N, rate, seed, noisy=True)
    dev, cfg, S = _device_stream(pcm, rate, br, want_spectra=True)
    mirror = E.encode_from_spectra_np(S, cfg)
    assert dev == mirror


@pytest.mark.parametrize("C,rate,br", [(1, 22050, 80), (2, 44100, 192)])
def test_device_quality_matches_host(C, rate, br):
    """The f32 device stream decodes within 0.5 dB of the f64 host encode."""
    N = 1152 * 9
    pcm = _pcm(C, N, rate, 3)

    def snr_of(stream):
        out, _ = ahx_model.decode_mp2(stream)
        y = out.astype(np.float64)[:, 481:]
        x0 = pcm.astype(np.float64)[:, :y.shape[1]]
        y = y[:, :x0.shape[1]]
        return 10 * np.log10((x0 ** 2).sum() / ((x0 - y) ** 2).sum())

    host = ahx_model.encode_mp2(pcm, rate, br)
    dev, _ = _device_stream(pcm, rate, br)
    s_host, s_dev = snr_of(host), snr_of(dev)
    assert s_dev > s_host - 0.5, (s_host, s_dev)
    assert s_host > 30  # the gate is meaningful, not vacuous


@pytest.mark.parametrize("rate,br,jb", [(22050, 160, 8), (44100, 192, 12)])
def test_device_joint_stereo_matches_mirror(rate, br, jb):
    """Joint (intensity) stereo on device: mode-1 header, shared-subband
    single allocation, device bytes == mirror bytes, and the stream decodes
    identically under our decoder and libmpg123."""
    import sys
    sys.path.insert(0, "tests")
    import mpeg_oracles as mo

    N = 1152 * 7
    pcm = _pcm(2, N, rate, 31, noisy=True)
    dev, cfg, S = _device_stream(pcm, rate, br, want_spectra=True,
                                 joint_bound=jb)
    h = mp2_frame.parse_header(dev)
    assert h.mode == 1 and h.bound == min(jb, h.sblimit)
    mirror = E.encode_from_spectra_np(S, cfg)
    assert dev == mirror
    if mo.available():
        mine, _ = ahx_model.decode_mp2(dev)
        ref = mo.mpg123_decode(dev, rate, 2)
        n = min(mine.shape[1], ref.shape[1])
        refq = np.clip(np.round(ref * 32768.0), -32768, 32767).astype(int)
        assert np.abs(mine[:, :n].astype(int) - refq[:, :n]).max() <= 1


def test_stream_structure_valid():
    """Device streams parse frame-by-frame with the host unpacker: CBR
    framing, padding slots, and per-frame layout all line up."""
    pcm = _pcm(1, 1152 * 11, 22050, 4, noisy=True)
    dev, cfg = _device_stream(pcm, 22050, 80)
    st = mp2_frame.unpack(dev)
    assert st.codes.shape[0] == 11
    assert st.header.sample_rate == 22050


def test_batch_equals_single():
    """Mixed-length batch: padded/bucketed rows slice to the same bytes as
    each stream encoded alone (silence padding cannot leak backwards)."""
    a = _pcm(1, 1152 * 5, 22050, 21, noisy=True)
    b = _pcm(1, 1152 * 12 - 300, 22050, 22, noisy=True)  # partial frame
    batch = E.encode_mp2_device_batch([a, b], 22050, 80)
    for pcm, got in zip((a, b), batch):
        spf = mp2_frame.SAMPLES_PER_FRAME
        F = -(-pcm.shape[1] // spf)
        pad = np.zeros((1, F * spf), np.int16)
        pad[:, :pcm.shape[1]] = pcm
        single, cfg = _device_stream(pad, 22050, 80)
        assert got == single


def test_parallel_ahx_encode_batch_roundtrip():
    """Public surface: WAV -> ahx_encode_batch(device=True) -> AHX container
    -> ahx_decode_batch roundtrip preserves the audio."""
    import io
    import wave

    from pycricodecs_tpu import parallel

    wavs = []
    pcms = []
    for seed in (31, 32):
        pcm = _pcm(1, 22050 * 2, 22050, seed)
        pcms.append(pcm)
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(pcm[0].tobytes())
        w.close()
        wavs.append(buf.getvalue())
    blobs = parallel.ahx_encode_batch(wavs, device=True)
    assert all(b[:2] == b"\x80\x00" for b in blobs)      # AHX container
    decoded = parallel.ahx_decode_batch(blobs, device=False)
    for pcm, wav_out in zip(pcms, decoded):
        rd = wave.open(io.BytesIO(wav_out), "rb")
        y = np.frombuffer(rd.readframes(rd.getnframes()), np.int16)
        y = y.astype(np.float64)[481:]
        x0 = pcm[0].astype(np.float64)[:y.shape[0]]
        y = y[:x0.shape[0]]
        snr = 10 * np.log10((x0 ** 2).sum() / ((x0 - y) ** 2).sum())
        assert snr > 30, snr


def test_encode_mp2_device_flag():
    """encode_mp2(device=True) rides the full device pipeline and returns a
    decodable stream."""
    pcm = _pcm(1, 1152 * 6, 22050, 41)
    stream = ahx_model.encode_mp2(pcm[0], 22050, 80, device=True)
    out, sr = ahx_model.decode_mp2(stream)
    assert sr == 22050 and out.shape[1] >= 1152 * 6


def test_error_paths():
    with pytest.raises(ValueError):
        E.make_config(11025, 1, 80)            # unsupported rate
    with pytest.raises(ValueError):
        E.make_config(22050, 1, 81)            # unsupported bitrate
    with pytest.raises(ValueError):
        E.make_config(22050, 3, 80)            # channels
    with pytest.raises(ValueError):
        E.encode_mp2_device_batch(
            [np.zeros((1, 1152), np.int16),
             np.zeros((2, 1152), np.int16)], 22050)     # mixed channels


def test_device_stream_accepted_by_mpg123():
    """External conformance: libmpg123 decodes the DEVICE-encoded stream
    and agrees with our decoder within 1 LSB (same bar as the host
    encoder's test_encode_accepted_by_mpg123)."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import mpeg_oracles as mo
    if not mo.available():
        pytest.skip("system libtwolame/libmpg123 absent")

    for C, rate, br in ((1, 22050, 80), (2, 44100, 192)):
        pcm = _pcm(C, 1152 * 8, rate, 17, noisy=True)
        dev, _ = _device_stream(pcm, rate, br)
        ref = mo.mpg123_decode(dev, rate, C)
        mine, _ = ahx_model.decode_mp2(dev, device=False)
        n = min(ref.shape[1], mine.shape[1])
        refi = np.clip(np.rint(ref[:, :n].astype(np.float64) * 32768.0),
                       -32768, 32767).astype(np.int32)
        d = np.abs(mine[:, :n].astype(np.int32) - refi)
        assert d.max() <= 1, (C, rate, br, d.max())
