"""Unit tests for the host primitives (bit IO, CRC)."""
import numpy as np

from pycricodecs_tpu.utils.bitio import (BitReader, BitWriter,
                                         pack_fixed_codes, unpack_fixed_codes)
from pycricodecs_tpu.utils.crc import crc16, crc16_batch


def test_bitio_roundtrip():
    rng = np.random.default_rng(0)
    widths = rng.integers(1, 25, 200)
    values = [int(rng.integers(0, 1 << w)) for w in widths]
    bw = BitWriter(1024)
    for v, w in zip(values, widths):
        bw.write(v, int(w))
    br = BitReader(bw.getvalue())
    for v, w in zip(values, widths):
        assert br.read(int(w)) == v


def test_bitreader_overrun_semantics():
    br = BitReader(b"\xAB")
    assert br.read(4) == 0xA
    # any read crossing the end returns 0 (hca.cpp bitreader_peek; the
    # native core's hca::BitReader has identical semantics)
    assert br.peek(8) == 0
    assert br.read(4) == 0xB
    assert br.read(8) == 0


def test_fixed_code_pack_roundtrip():
    rng = np.random.default_rng(1)
    for bits in (2, 4, 5, 8):
        n = 64 if (64 * bits) % 8 == 0 else 8
        codes = rng.integers(0, 1 << bits, (3, n)).astype(np.int32)
        packed = pack_fixed_codes(codes, bits)
        assert np.array_equal(unpack_fixed_codes(packed, bits), codes)


def test_crc16_known_vector():
    # CRC-16/BUYPASS style (poly 0x8005, init 0, MSB-first, no reflection)
    assert crc16(b"123456789") == 0xFEE8
    assert crc16(b"") == 0


def test_crc16_batch_matches_scalar():
    rng = np.random.default_rng(2)
    rows = rng.integers(0, 256, (5, 33)).astype(np.uint8)
    batch = crc16_batch(rows)
    for row, got in zip(rows, batch):
        assert crc16(row.tobytes()) == got


def test_parse_wav_malformed_raises_waverror():
    """Hostile fmt/data chunks raise WavError, never ZeroDivision/ValueError."""
    import pytest
    from pycricodecs_tpu.utils.wav import WavError, parse_wav, write_wav

    good = bytearray(write_wav(np.arange(64, dtype=np.int16), 2, 48000))
    for mutate in (
        lambda b: b.__setitem__(slice(22, 24), (0).to_bytes(2, "little")),   # channels=0
        lambda b: b.__setitem__(slice(32, 34), (0).to_bytes(2, "little")),   # block_align=0
        lambda b: b.__setitem__(slice(34, 36), (5).to_bytes(2, "little")),   # depth 5 in 2B
        lambda b: b.__setitem__(slice(34, 36), (24).to_bytes(2, "little")),  # depth 24 in 2B
    ):
        bad = bytearray(good)
        mutate(bad)
        with pytest.raises(WavError):
            parse_wav(bytes(bad))
    # declared data size beyond the actual bytes: clamp, don't crash
    oversize = bytearray(good)
    oversize[40:44] = (0xFFFF).to_bytes(4, "little")
    wav = parse_wav(bytes(oversize))
    assert wav.pcm16.size == 64
