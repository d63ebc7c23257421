"""Bounded mutation fuzzing: corrupt inputs must raise clean exceptions,
never crash or hang (exercises both the Python parsers and the C++ core)."""
import numpy as np
import pytest

from pycricodecs_tpu import cricodecs as CC
from pycricodecs_tpu.containers.awb import AWB, build_afs2
from pycricodecs_tpu.containers.cpk import CPK, CPKBuilder
from pycricodecs_tpu.containers.usm import USM
from pycricodecs_tpu.containers.utf import UTF, UTFBuilder
from pycricodecs_tpu.containers.chunk import UTFTypeValues as TV
from pycricodecs_tpu.models import adx as adxmod
from pycricodecs_tpu.models import crilayla
from pycricodecs_tpu.models import hca as hcamod
from pycricodecs_tpu.utils.wav import write_wav
from tests.conftest import make_sine_pcm16

N_MUTATIONS = 40


def _mutate(rng, blob: bytes):
    buf = bytearray(blob)
    kind = rng.integers(0, 3)
    if kind == 0 and len(buf) > 4:       # flip random bytes
        for _ in range(rng.integers(1, 8)):
            buf[rng.integers(0, len(buf))] ^= int(rng.integers(1, 256))
    elif kind == 1:                       # truncate
        buf = buf[:rng.integers(0, len(buf))]
    else:                                 # splice garbage
        pos = int(rng.integers(0, len(buf)))
        buf[pos:pos] = bytes(rng.integers(0, 256, int(rng.integers(1, 64))).astype(np.uint8))
    return bytes(buf)


def _fuzz(rng, parse, blob):
    for _ in range(N_MUTATIONS):
        mutated = _mutate(rng, blob)
        try:
            parse(mutated)
        except Exception:
            pass  # clean rejection is the accepted outcome


def test_fuzz_hca_decode(oracle):
    rng = np.random.default_rng(0)
    wav = write_wav(make_sine_pcm16(4096, 2, 48000, seed=1), 2, 48000)
    blob = bytes(oracle.HcaEncode(wav, 0, 2))
    _fuzz(rng, lambda b: hcamod.decode(b), blob)


def test_fuzz_adx_decode():
    rng = np.random.default_rng(1)
    wav = write_wav(make_sine_pcm16(2048, 1, 48000, seed=2), 1, 48000)
    blob = adxmod.encode(wav)
    _fuzz(rng, adxmod.decode, blob)


def test_fuzz_crilayla_decompress():
    rng = np.random.default_rng(2)
    blob = crilayla.compress(b"fuzzable content " * 200)
    # note: decompress output size is attacker-controlled; cap it like a
    # consumer should before decompressing untrusted data
    def parse(b):
        if len(b) >= 12 and int.from_bytes(b[8:12], "little") > 1 << 22:
            raise ValueError("unreasonable size")
        crilayla.decompress(b)
    _fuzz(rng, parse, blob)


def test_fuzz_utf():
    rng = np.random.default_rng(3)
    blob = bytes(UTFBuilder([{"A": (TV.uint, 1), "B": (TV.string, "x")}],
                            table_name="F").parse())
    _fuzz(rng, UTF, blob)


def test_fuzz_awb():
    rng = np.random.default_rng(4)
    blob = build_afs2([b"a" * 100, b"b" * 333])
    _fuzz(rng, lambda b: list(AWB(b).getfiles()), blob)


def test_fuzz_cpk(tmp_path):
    rng = np.random.default_rng(5)
    d = tmp_path / "in"
    d.mkdir()
    (d / "x.bin").write_bytes(b"cpk fuzz corpus " * 64)
    CPKBuilder(str(d), str(tmp_path / "a.cpk"), CpkMode=1)
    blob = (tmp_path / "a.cpk").read_bytes()
    _fuzz(rng, CPK, blob)
