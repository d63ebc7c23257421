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
    # past-end reads return remaining bits left-shifted (reference behaviour)
    assert br.peek(8) == 0xB << 4
    br.skip(4)
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
