"""MSB-first bitstream reader/writer used by the host-side codec front-ends.

Semantics mirror the hca.cpp clData reader (bitreader_peek, hca.cpp:224-281):
bits are consumed most-significant-first within each byte, and ANY read that
crosses the end of the buffer returns 0 — the reference HCA decoder relies on
this at frame tails, and the native core (cricore.cpp hca::BitReader) matches
it.  (The reference's OTHER reader, IO.cpp PeekInt, instead returns the
remaining bits left-shifted; nothing in this package uses those semantics —
this class's only consumers are the HCA unpack/test paths.)

For hot paths the C++ core (native/cricore.cpp) supersedes these; this module
is the reference implementation and is used by containers and tests.
"""
from __future__ import annotations

import numpy as np


class BitReader:
    __slots__ = ("buf", "nbits", "pos")

    def __init__(self, data) -> None:
        self.buf = bytes(data)
        self.nbits = len(self.buf) * 8
        self.pos = 0

    def remaining(self) -> int:
        return self.nbits - self.pos

    def peek(self, count: int) -> int:
        if count > self.nbits - self.pos:
            # hca.cpp bitreader_peek: any read crossing the end reads 0
            return 0
        return self._peek_exact(count)

    def _peek_exact(self, count: int) -> int:
        if count == 0:
            return 0
        start = self.pos >> 3
        bit_off = self.pos & 7
        nbytes = (bit_off + count + 7) >> 3
        chunk = int.from_bytes(self.buf[start:start + nbytes], "big")
        total = nbytes * 8
        return (chunk >> (total - bit_off - count)) & ((1 << count) - 1)

    def read(self, count: int) -> int:
        v = self.peek(count)
        self.pos += count
        return v

    def read_signed(self, count: int) -> int:
        v = self.read(count)
        if v & (1 << (count - 1)):
            v -= 1 << count
        return v

    def skip(self, count: int) -> None:
        self.pos += count

    def align(self, multiple: int) -> None:
        if self.pos % multiple:
            self.pos += multiple - self.pos % multiple


class BitWriter:
    __slots__ = ("buf", "nbits", "pos")

    def __init__(self, size: int) -> None:
        self.buf = bytearray(size)
        self.nbits = size * 8
        self.pos = 0

    def write(self, value: int, count: int) -> None:
        if count < 0 or count > 32 or count > self.nbits - self.pos:
            return
        value &= (1 << count) - 1 if count < 64 else ~0
        pos = self.pos
        self.pos += count
        while count > 0:
            byte_idx = pos >> 3
            bit_idx = pos & 7
            take = min(count, 8 - bit_idx)
            shift = 8 - bit_idx - take
            piece = (value >> (count - take)) & ((1 << take) - 1)
            mask = ((1 << take) - 1) << shift
            self.buf[byte_idx] = (self.buf[byte_idx] & ~mask) | (piece << shift)
            pos += take
            count -= take

    def align(self, multiple: int) -> None:
        if self.pos % multiple:
            self.write(0, multiple - self.pos % multiple)

    def getvalue(self) -> bytes:
        return bytes(self.buf)


def unpack_fixed_codes(data: np.ndarray, bit_depth: int) -> np.ndarray:
    """Vectorised MSB-first unpack of fixed-width codes from byte rows.

    data: uint8 array [..., nbytes]; returns int32 [..., nbytes*8//bit_depth]
    of *unsigned* code values. Used for ADX payloads where every sample is a
    fixed-width field, so the whole batch reshapes without any serial scan.
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    bits = np.unpackbits(data, axis=-1)
    n = data.shape[-1] * 8 // bit_depth
    bits = bits[..., : n * bit_depth].reshape(*data.shape[:-1], n, bit_depth)
    weights = (1 << np.arange(bit_depth - 1, -1, -1, dtype=np.int32))
    return (bits.astype(np.int32) * weights).sum(axis=-1)


def pack_fixed_codes(codes: np.ndarray, bit_depth: int) -> np.ndarray:
    """Inverse of unpack_fixed_codes: int codes [..., n] -> uint8 [..., n*bd/8]."""
    codes = np.asarray(codes)
    masked = (codes & ((1 << bit_depth) - 1)).astype(np.int64)
    shifts = np.arange(bit_depth - 1, -1, -1, dtype=np.int64)
    bits = ((masked[..., None] >> shifts) & 1).astype(np.uint8)
    flat = bits.reshape(*codes.shape[:-1], codes.shape[-1] * bit_depth)
    return np.packbits(flat, axis=-1)
