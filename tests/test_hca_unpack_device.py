"""Device (JAX) HCA frame unpacker vs the host reference path.

The device unpacker (ops/hca_unpack_device.py) must agree bit-for-bit with
_unpack_frames_py — itself locked against the reference C++ by decode byte
parity — on every stream it accepts, and must flag exactly the frames the
host path raises on.
"""
import numpy as np
import pytest

from pycricodecs_tpu.ops import hca_encode_host, hca_frame, hca_unpack_device
from pycricodecs_tpu.utils.bitio import BitWriter
from pycricodecs_tpu.utils.crc import crc16
from pycricodecs_tpu.utils.wav import write_wav
from tests.conftest import make_sine_pcm16


def _encode(channels=2, quality=2, seed=5, samples=12000, key=0):
    pcm = make_sine_pcm16(samples, channels, 48000, seed=seed)
    wav = write_wav(pcm, channels, 48000)
    blob = hca_encode_host.encode(wav, quality=quality)
    if key:
        from pycricodecs_tpu.models import hca as hcamod
        h = hcamod.HCA(blob)
        h.encrypt(key)
        blob = h.get_hca()
    return blob


def _split(blob, key=0):
    hs = int.from_bytes(blob[6:8], "big")
    info = hca_frame.parse_header(blob[:hs])
    if key:
        info.set_key(key)
    data = blob[hs:hs + info.frame_count * info.frame_size]
    return info, data


def _assert_equal(got, ref):
    for name in ("qc", "scalefactors", "resolutions", "intensity"):
        np.testing.assert_array_equal(getattr(got, name), getattr(ref, name),
                                      err_msg=name)


@pytest.mark.parametrize("quality,channels", [(0, 1), (1, 2), (2, 2), (4, 2),
                                              (3, 4), (2, 6), (4, 8)])
def test_device_unpack_matches_host(quality, channels):
    info, data = _split(_encode(channels, quality, seed=quality * 8 + channels))
    ref = hca_frame._unpack_frames_py(info, data)
    got = hca_unpack_device.unpack_frames_device(info, data)
    _assert_equal(got, ref)


def test_device_unpack_encrypted_stream():
    key = 0xCF222F1FE0748978
    blob = _encode(2, 2, seed=31, key=key)
    info, data = _split(blob, key=key)
    ref = hca_frame._unpack_frames_py(info, data)
    got = hca_unpack_device.unpack_frames_device(info, data)
    _assert_equal(got, ref)


def test_device_unpack_v1_dec_chunk():
    from tests.test_hca import _make_v1_dec_header
    v2 = _encode(1, 0, seed=91)
    v1 = _make_v1_dec_header(v2)
    info, data = _split(v1)
    ref = hca_frame._unpack_frames_py(info, data)
    got = hca_unpack_device.unpack_frames_device(info, data)
    _assert_equal(got, ref)


def test_device_unpack_noise_path_matches_host():
    """v3 PNS noise fill on-device: the serial LCG chain is reproduced with
    prefix sums + closed-form affine jumps — gather maps, scale indices,
    masks and the final LCG state must all equal the host chain's."""
    from tests.test_hca import _relabel_v3
    # quality 0 mono, 24576 samples: quiet high bands land at resolution 0,
    # which PNS-fills once min_resolution is 0 (same fixture as
    # test_v3_noise_fill_matches_reference)
    pcm = make_sine_pcm16(24576, 1, 48000, seed=77)
    blob = hca_encode_host.encode(write_wav(pcm, 1, 48000), quality=0)
    v3 = _relabel_v3(blob)
    info, data = _split(v3)
    ref = hca_frame._unpack_frames_py(info, data)
    assert ref.noise_mask.any(), "fixture must exercise the noise fill"
    got = hca_unpack_device.unpack_frames_device(info, data)
    _assert_equal(got, ref)
    np.testing.assert_array_equal(got.noise_mask, ref.noise_mask)
    np.testing.assert_array_equal(
        np.where(ref.noise_mask, got.noise_src, 0),
        np.where(ref.noise_mask, ref.noise_src, 0))
    np.testing.assert_array_equal(
        np.where(ref.noise_mask, got.noise_sci, 0),
        np.where(ref.noise_mask, ref.noise_sci, 0))
    assert got.random_state == ref.random_state


def test_device_decode_batch_noise_stream(oracle):
    """A v3 PNS stream through decode_batch's device engine must be
    byte-identical to the oracle and the host engine."""
    from tests.test_hca import _relabel_v3
    from pycricodecs_tpu import parallel
    from pycricodecs_tpu.models import hca as hcamod
    v3 = _relabel_v3(bytes(oracle.HcaEncode(
        write_wav(make_sine_pcm16(16000, 1, 48000, seed=77), 1, 48000),
        0, 0)))
    stats = parallel.DecodeStats()
    out = parallel.decode_batch([v3] * 3, engine="device", stats=stats)
    assert stats.device_unpack_streams == 3
    host = hcamod.decode(v3)
    assert all(o == host for o in out)
    hs = int.from_bytes(v3[6:8], "big")
    assert bytes(oracle.HcaDecode(v3, hs, 0, 0)) == host


# ---------------------------------------------------------------------------
# synthetic v3 streams: hand-written frames exercising the v3-only grammar
# (scalefactor HFR extension, delta-coded intensity with escapes). No
# encoder emits v3, so frames are written directly with the BitWriter under
# the unpack grammar; the host unpacker is the truth.
# ---------------------------------------------------------------------------

def _v3_info(quality=4, channels=2):
    """A v3.0 header config (min_resolution stays 1 -> no noise path)."""
    blob = _encode(channels, quality, seed=17)
    out = bytearray(blob)
    hs = int.from_bytes(blob[6:8], "big")
    assert out[4:6] == b"\x02\x00" and out[24:28] == b"comp"
    out[4:6] = b"\x03\x00"
    out[hs - 2:hs] = crc16(bytes(out[:hs - 2])).to_bytes(2, "big")
    info = hca_frame.parse_header(bytes(out[:hs]))
    assert info.version == 0x0300 and info.min_resolution == 1
    return info


def _write_sf_section(bw, rng, cs):
    mode = int(rng.integers(0, 3))
    if mode == 0:
        bw.write(0, 3)
        return
    if mode == 1:
        bw.write(int(rng.integers(6, 8)), 3)
        for _ in range(cs):
            bw.write(int(rng.integers(0, 64)), 6)
        return
    db = int(rng.integers(1, 6))
    expected = (1 << db) - 1
    half = expected >> 1
    bw.write(db, 3)
    value = int(rng.integers(0, 64))
    bw.write(value, 6)
    for _ in range(cs - 1):
        lo = max(0, half - value)
        hi = min(expected - 1, 63 + half - value)
        if int(rng.integers(0, 4)) == 0 or lo > hi:
            bw.write(expected, db)                # escape
            value = int(rng.integers(0, 64))
            bw.write(value, 6)
        else:
            delta = int(rng.integers(lo, hi + 1))
            bw.write(delta, db)
            value = (value - half + delta) & 0x3F


def _write_v3_intensity(bw, rng):
    kind = int(rng.integers(0, 4))
    if kind == 0:
        bw.write(15, 4)                           # value >= 15: all 7s
        return
    value = int(rng.integers(0, 15))
    bw.write(value, 4)
    db2 = int(rng.integers(0, 4))
    bw.write(db2, 2)
    if db2 == 3:
        for _ in range(7):
            bw.write(int(rng.integers(0, 16)), 4)
        return
    bits = db2 + 1
    bmax = (2 << db2) - 1
    for _ in range(7):
        delta = int(rng.integers(0, bmax))        # non-escape candidate
        cand = value - (bmax >> 1) + delta
        if int(rng.integers(0, 4)) == 0 or cand > 15 or cand < 0:
            bw.write(bmax, bits)                  # escape
            value = int(rng.integers(0, 16))
            bw.write(value, 4)
        else:
            bw.write(delta, bits)
            value = cand


def _make_v3_frame(info, rng):
    bw = BitWriter(info.frame_size)
    bw.write(0xFFFF, 16)
    bw.write(int(rng.integers(0, 512)), 9)
    bw.write(int(rng.integers(0, 128)), 7)
    for c in range(info.channels):
        ct = int(info.channel_type[c])
        cs = int(info.coded_count[c])
        if ct != 2 and info.hfr_group_count > 0:
            cs += int(info.hfr_group_count)
        _write_sf_section(bw, rng, cs)
        if ct == 2:
            _write_v3_intensity(bw, rng)
    # coefficient section + tail: random bits; reader semantics define truth
    while bw.pos + 32 <= bw.nbits - 16:
        bw.write(int(rng.integers(0, 1 << 30)), 30)
    frame = bytearray(bytes(bw.buf))
    crc = crc16(bytes(frame[:-2]))
    frame[-2:] = crc.to_bytes(2, "big")
    return bytes(frame)


def test_device_unpack_synthetic_v3_grammar():
    info = _v3_info()
    assert info.hfr_group_count > 0          # exercises the v3 sf extension
    assert 2 in list(np.asarray(info.channel_type))   # and v3 intensity
    rng = np.random.default_rng(20260817)
    frames = b"".join(_make_v3_frame(info, rng) for _ in range(64))

    # host truth, frame by frame (a frame may legitimately raise)
    host = []
    for f in range(64):
        chunk = frames[f * info.frame_size:(f + 1) * info.frame_size]
        try:
            host.append(hca_frame._unpack_frames_py(info, chunk))
        except hca_frame.HcaError:
            host.append(None)

    up = hca_unpack_device.DeviceUnpacker(info)
    arr = np.frombuffer(frames, np.uint8).reshape(64, info.frame_size)
    qc, sf, res, inten, err = (np.asarray(x) for x in up(arr)[:5])
    n_ok = 0
    for f in range(64):
        if host[f] is None:
            assert err[f], f"device missed host error at frame {f}"
            continue
        assert not err[f], f"device flagged good frame {f}"
        np.testing.assert_array_equal(qc[f], host[f].qc[0], err_msg=f"qc {f}")
        np.testing.assert_array_equal(sf[f], host[f].scalefactors[0])
        np.testing.assert_array_equal(res[f], host[f].resolutions[0])
        np.testing.assert_array_equal(inten[f], host[f].intensity[0])
        n_ok += 1
    assert n_ok >= 32  # the generator writes mostly-valid frames


@pytest.mark.parametrize("version_label", ["v2", "v3"])
def test_device_unpack_random_frame_fuzz(version_label):
    """Fully random frame payloads (valid sync+CRC): the device err flag must
    match exactly the set of frames the host unpacker raises on, and all
    outputs must be identical on the non-raising frames."""
    if version_label == "v2":
        info, _ = _split(_encode(2, 2, seed=3))
    else:
        info = _v3_info()
    rng = np.random.default_rng(99)
    F = 128
    fs = info.frame_size
    frames = rng.integers(0, 256, (F, fs), dtype=np.uint8)
    frames[:, 0] = 0xFF
    frames[:, 1] = 0xFF
    # sparse-corrupt half the frames from zeros (parse deeper)
    frames[::2, 2:] = 0
    sprinkle = rng.integers(0, 256, (F // 2, fs // 5), dtype=np.uint8)
    cols = rng.integers(2, fs - 2, (F // 2, fs // 5))
    for i in range(F // 2):
        frames[2 * i, cols[i]] = sprinkle[i]
    for f in range(F):
        c = crc16(frames[f, :-2].tobytes())
        frames[f, -2] = c >> 8
        frames[f, -1] = c & 0xFF

    host = []
    blob = frames.tobytes()
    for f in range(F):
        chunk = blob[f * fs:(f + 1) * fs]
        try:
            host.append(hca_frame._unpack_frames_py(info, chunk))
        except hca_frame.HcaError:
            host.append(None)

    up = hca_unpack_device.DeviceUnpacker(info)
    qc, sf, res, inten, err = (np.asarray(x) for x in up(frames)[:5])
    for f in range(F):
        assert err[f] == (host[f] is None), (
            f"frame {f}: device err={err[f]} host "
            f"{'raised' if host[f] is None else 'ok'}")
        if host[f] is None:
            continue
        np.testing.assert_array_equal(qc[f], host[f].qc[0], err_msg=f"qc {f}")
        np.testing.assert_array_equal(sf[f], host[f].scalefactors[0])
        np.testing.assert_array_equal(res[f], host[f].resolutions[0])
        np.testing.assert_array_equal(inten[f], host[f].intensity[0])


def test_device_unpack_v3_intensity_escape_chain_window_tail():
    """Regression: seven consecutive v3 intensity escapes push the last
    4-bit escape-value read to window offset 58 — a too-tight _ext64 offset
    clamp (55) silently shifted that read with err unset (found by review,
    confirmed divergent before the fix)."""
    info = _v3_info()
    fs = info.frame_size
    bw = BitWriter(fs)
    bw.write(0xFFFF, 16)
    bw.write(0, 16)
    bw.write(0, 3)                    # ch0 sf: delta_bits 0
    bw.write(0, 3)                    # ch1 sf: delta_bits 0 -> abs bit 38
    bw.write(3, 4)                    # intensity[0] = 3 (< 15)
    bw.write(2, 2)                    # db2 = 2 -> bits 3, bmax 7
    for v in (5, 9, 11, 2, 14, 6, 10):
        bw.write(7, 3)                # escape
        bw.write(v, 4)
    frame = bytearray(bytes(bw.buf))
    crc = crc16(bytes(frame[:-2]))
    frame[-2:] = crc.to_bytes(2, "big")
    arr = np.frombuffer(bytes(frame), np.uint8).reshape(1, fs)

    host = hca_frame._unpack_frames_py(info, bytes(frame))
    up = hca_unpack_device.DeviceUnpacker(info)
    qc, sf, res, inten, err = (np.asarray(x) for x in up(arr)[:5])
    assert not err[0]
    np.testing.assert_array_equal(inten[0], host.intensity[0])
    np.testing.assert_array_equal(qc[0], host.qc[0])


def test_device_unpack_error_cases():
    """Targeted error frames: sf delta out of range and v3 intensity
    overflow must set the err flag (host raises)."""
    info = _v3_info()
    fs = info.frame_size

    def finish(bw):
        frame = bytearray(bytes(bw.buf))
        crc = crc16(bytes(frame[:-2]))
        frame[-2:] = crc.to_bytes(2, "big")
        return np.frombuffer(bytes(frame), np.uint8).reshape(1, fs)

    # sf delta out of range: delta_bits=5, value=0, first delta=0 ->
    # test = 0 + 0 - 15 = -15 < 0
    bw = BitWriter(fs)
    bw.write(0xFFFF, 16)
    bw.write(0, 16)
    bw.write(5, 3)
    bw.write(0, 6)
    bw.write(0, 5)
    arr = finish(bw)
    with pytest.raises(hca_frame.HcaError):
        hca_frame._unpack_frames_py(info, arr.tobytes())
    up = hca_unpack_device.DeviceUnpacker(info)
    err = np.asarray(up(arr)[4])
    assert bool(np.asarray(err)[0])

    # v3 intensity overflow on the secondary channel: value=13, db2=2
    # (bits=3, bmax=7), delta=6 -> 13 - 3 + 6 = 16 > 15
    bw = BitWriter(fs)
    bw.write(0xFFFF, 16)
    bw.write(0, 16)
    bw.write(0, 3)                       # ch0 sf: delta_bits 0
    bw.write(0, 3)                       # ch1 sf: delta_bits 0
    bw.write(13, 4)                      # intensity[0] = 13
    bw.write(2, 2)                       # db2 = 2
    bw.write(6, 3)                       # delta 6 -> 16 -> raise
    arr = finish(bw)
    with pytest.raises(hca_frame.HcaError):
        hca_frame._unpack_frames_py(info, arr.tobytes())
    err = np.asarray(up(arr)[4])
    assert bool(np.asarray(err)[0])
