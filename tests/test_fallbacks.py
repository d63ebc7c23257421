"""The native C++ core is an optimisation, not a dependency: with the
library unavailable every path must fall back (numpy/JAX) with identical
bytes. Guards the fallbacks against rot now that native is the default."""
import numpy as np
import pytest

from pycricodecs_tpu import native
from pycricodecs_tpu.models import adx as adxmod
from pycricodecs_tpu.models import crilayla
from pycricodecs_tpu.models import hca as hcamod
from pycricodecs_tpu.ops import hca_encode_host
from pycricodecs_tpu.utils import hca_crypt
from pycricodecs_tpu.utils.wav import write_wav
from tests.conftest import make_sine_pcm16


@pytest.fixture
def no_native(monkeypatch):
    monkeypatch.setattr(native, "load", lambda: None)


def test_adx_roundtrip_without_native(no_native):
    pcm = (make_sine_pcm16(2048, 2, 48000, seed=4) // 16).astype(np.int16)
    wav = write_wav(pcm, 2, 48000)
    blob = adxmod.encode(wav)
    dec = adxmod.decode(blob)
    assert len(dec) > 44
    # parity with the native path (computed before the patch via a fresh
    # encode in another test would race; re-derive with JAX forced instead)
    assert adxmod.encode(wav, use_jax=True) == blob
    assert adxmod.decode(blob, use_jax=True) == dec


def test_hca_decode_encode_without_native(no_native, oracle):
    wav = write_wav(make_sine_pcm16(4096, 2, 48000, seed=5), 2, 48000)
    blob = hca_encode_host.encode(wav, quality=2)
    assert blob == bytes(oracle.HcaEncode(wav, 0, 2))
    hs = int.from_bytes(blob[6:8], "big")
    assert hcamod.decode(blob) == bytes(oracle.HcaDecode(blob, hs, 0, 0))


def test_crilayla_python_mirrors(no_native):
    data = b"fallback corpus text " * 64
    comp = crilayla.compress(data)
    assert crilayla.decompress(comp)[: len(data)] == data


def test_cipher_batch_numpy_fallback(no_native):
    rng = np.random.default_rng(1)
    keys = rng.integers(1, 1 << 63, 64).astype(np.uint64)
    batch = hca_crypt.cipher_tables_56_batch(keys)
    for i in (0, 13, 63):
        assert np.array_equal(batch[i], hca_crypt._cipher56(int(keys[i])))


def test_find_key_serial_fallback(no_native):
    from pycricodecs_tpu import parallel
    from pycricodecs_tpu.ops.hca_frame import parse_header

    key = 0xABCDEF12345
    wav = write_wav(make_sine_pcm16(4096, 2, 48000, seed=6), 2, 48000)
    blob = hca_encode_host.encode(wav, quality=2)
    hs = parse_header(blob).header_size
    enc = hcamod.crypt(blob, True, hs, 56, key)
    cands = [0x1111, key, 0x2222]
    scores = parallel.find_key(enc, cands, max_frames=4)
    assert int(scores.argmax()) == 1


def test_mp2_unpack_python_mirrors(no_native):
    """The vectorised Python MP2 unpack is the native core's reference."""
    from pycricodecs_tpu.models.ahx import AHX
    from pycricodecs_tpu.ops import mp2_frame
    from pycricodecs_tpu.utils.wav import write_wav
    from tests.conftest import make_sine_pcm16

    pcm = make_sine_pcm16(22050, 1, 22050, seed=80)
    blob = AHX.encode(write_wav(pcm, 1, 22050), bitrate_kbps=96)
    st = mp2_frame.unpack(blob, AHX.parse_header(blob)["data_offset"])
    assert st.nframes > 0 and st.codes.any()
    wav = AHX.decode(blob)
    assert wav[:4] == b"RIFF"


def test_mp2_synthesis_native_vs_numpy():
    """The native V-FIFO synthesis lane (cri_mp2_synthesize) vs the f64
    numpy stacked-matmul reference: dequantisation must be bit-identical
    and the synthesis within the package-wide 1-LSB fence (the factored
    form differs only in f64 association order)."""
    from pycricodecs_tpu.ops import mp2_kernels

    if native.load() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(42)
    for F, C in ((5, 1), (83, 2)):
        lvs = np.array([0, 3, 5, 7, 9, 15, 31, 63, 255, 1023, 65535])
        levels = lvs[rng.integers(0, len(lvs), (F, C, 32))].astype(np.int32)
        n36 = np.maximum(levels[:, :, None, :], 1)
        codes = (rng.integers(0, 1 << 16, (F, C, 36, 32)) % n36
                 ).astype(np.uint16)
        sfidx = rng.integers(0, 63, (F, C, 3, 32)).astype(np.uint8)
        fast = mp2_kernels.decode_pcm16_host(codes, levels, sfidx)
        sb = mp2_kernels.dequantize_np(codes, levels, sfidx)
        sb = np.transpose(sb, (1, 0, 2, 3)).reshape(C, F * 36, 32)
        ref = mp2_kernels.pcm16(mp2_kernels.synthesize_np(sb))
        assert fast.shape == ref.shape
        d = np.abs(fast.astype(int) - ref.astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 0.001
