"""HCA byte-substitution cipher (types 0 / 1 / 56) and header chunk masking.

Behaviour parity: hca.cpp:491-617 (table generation), hca.cpp:3166-3337
(HcaCrypt: per-frame substitution + CRC re-stamp + header chunk-name XOR).
Frame transformation is a pure 256-entry LUT, applied batch-wide with one
numpy take() — thousands of frames per call, no Python loop.
"""
from __future__ import annotations

import numpy as np

from .crc import crc16_batch

DEFAULT_KEY = 0xCF222F1FE0748978


def scramble_subkey(keycode: int, subkey: int) -> int:
    """Key/subkey combination (hca.cpp:3309-3311)."""
    if subkey:
        keycode = (keycode * (((subkey & 0xFFFF) << 16) | ((~subkey + 2) & 0xFFFF))) \
            & 0xFFFFFFFFFFFFFFFF
    return keycode


def cipher_table(ciph_type: int, keycode: int = 0) -> np.ndarray:
    """Decryption substitution table for the given cipher type. [256] u8."""
    if ciph_type == 56 and not keycode:
        ciph_type = 0
    if ciph_type == 0:
        return np.arange(256, dtype=np.uint8)
    if ciph_type == 1:
        table = np.zeros(256, dtype=np.uint8)
        v = 0
        for i in range(1, 255):
            v = (v * 13 + 11) & 0xFF
            if v == 0 or v == 0xFF:
                v = (v * 13 + 11) & 0xFF
            table[i] = v
        table[0xFF] = 0xFF
        return table
    if ciph_type == 56:
        return _cipher56(keycode)
    raise ValueError("Unknown HCA cipher type")


def _init56_row(key: int) -> list:
    mul = ((key & 1) << 3) | 5
    add = (key & 0xE) | 1
    key >>= 4
    out = []
    for _ in range(16):
        key = (key * mul + add) & 0xF
        out.append(key)
    return out


def _cipher56(keycode: int) -> np.ndarray:
    if keycode != 0:
        keycode -= 1
    kc = [(keycode >> (8 * i)) & 0xFF for i in range(7)]
    seed = [
        kc[1], kc[1] ^ kc[6], kc[2] ^ kc[3], kc[2],
        kc[2] ^ kc[1], kc[3] ^ kc[4], kc[3], kc[3] ^ kc[2],
        kc[4] ^ kc[5], kc[4], kc[4] ^ kc[3], kc[5] ^ kc[6],
        kc[5], kc[5] ^ kc[4], kc[6] ^ kc[1], kc[6],
    ]
    base_r = _init56_row(kc[0])
    base = np.zeros(256, dtype=np.uint8)
    for r in range(16):
        base_c = _init56_row(seed[r])
        nb = base_r[r] << 4
        for c in range(16):
            base[r * 16 + c] = nb | base_c[c]
    table = np.zeros(256, dtype=np.uint8)
    x = 0
    pos = 1
    for _ in range(256):
        x = (x + 17) & 0xFF
        if base[x] != 0 and base[x] != 0xFF:
            table[pos] = base[x]
            pos += 1
    table[0] = 0
    table[0xFF] = 0xFF
    return table


def cipher_tables_56_batch(keycodes: np.ndarray) -> np.ndarray:
    """Batched _cipher56 over K keycodes -> uint8 [K, 256].

    Identical tables to the scalar path (validated in tests); used by the
    batched key search, where per-key Python table generation would dominate.
    Prefers the threaded C++ core; vectorised numpy fallback below.
    """
    import ctypes

    from .. import native
    lib = native.load()
    keycodes = np.ascontiguousarray(keycodes, dtype=np.uint64)
    if lib is not None and keycodes.size:
        out = np.empty((keycodes.size, 256), dtype=np.uint8)
        lib.cri_hca_cipher56_batch(
            keycodes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            np.int64(keycodes.size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), np.int32(0))
        return out
    kq = np.asarray(keycodes, dtype=np.uint64).copy()
    kq[kq != 0] -= np.uint64(1)
    K = kq.shape[0]
    kc = ((kq[:, None] >> (np.uint64(8) * np.arange(7, dtype=np.uint64)))
          & np.uint64(0xFF)).astype(np.int64)          # [K, 7]
    seed = np.stack([
        kc[:, 1], kc[:, 1] ^ kc[:, 6], kc[:, 2] ^ kc[:, 3], kc[:, 2],
        kc[:, 2] ^ kc[:, 1], kc[:, 3] ^ kc[:, 4], kc[:, 3],
        kc[:, 3] ^ kc[:, 2], kc[:, 4] ^ kc[:, 5], kc[:, 4],
        kc[:, 4] ^ kc[:, 3], kc[:, 5] ^ kc[:, 6], kc[:, 5],
        kc[:, 5] ^ kc[:, 4], kc[:, 6] ^ kc[:, 1], kc[:, 6]], axis=1)  # [K,16]

    def rows(keys):                                     # [N] -> [N, 16]
        mul = ((keys & 1) << 3) | 5
        add = (keys & 0xE) | 1
        key = keys >> 4
        out = np.empty(keys.shape + (16,), dtype=np.int64)
        for i in range(16):
            key = (key * mul + add) & 0xF
            out[..., i] = key
        return out

    base_r = rows(kc[:, 0])                             # [K, 16]
    base_c = rows(seed.reshape(-1)).reshape(K, 16, 16)  # [K, 16, 16]
    base = ((base_r[:, :, None] << 4) | base_c).reshape(K, 256)

    order = (17 * (np.arange(256) + 1)) & 0xFF          # key-independent walk
    vals = base[:, order]                               # [K, 256]
    mask = (vals != 0) & (vals != 0xFF)
    pos = np.cumsum(mask, axis=1)                       # 1-based write slots
    table = np.zeros((K, 256), dtype=np.uint8)
    krow = np.repeat(np.arange(K), 256).reshape(K, 256)
    table[krow[mask], pos[mask]] = vals[mask].astype(np.uint8)
    table[:, 0] = 0
    table[:, 0xFF] = 0xFF
    return table


def invert_cipher_table(table: np.ndarray) -> np.ndarray:
    inv = np.zeros(256, dtype=np.uint8)
    inv[table] = np.arange(256, dtype=np.uint8)
    return inv


def apply_cipher_frames(frames: np.ndarray, table: np.ndarray,
                        restamp_crc: bool = True) -> np.ndarray:
    """Substitute every byte of [N, frame_size] frames and re-stamp CRCs."""
    out = table[frames]
    if restamp_crc:
        crc = crc16_batch(out[:, :-2])
        out[:, -2] = (crc >> 8).astype(np.uint8)
        out[:, -1] = (crc & 0xFF).astype(np.uint8)
    return out


# --- header chunk-name masking (hca.cpp:3166-3250) --------------------------

# The reference XORs a host-endian (little-endian) u32 over the 4 signature
# bytes (hca.cpp:3175 etc.): 0x00808080 toggles bytes 0-2, 0x80808080 all 4.
_CHUNK_MASKS = {
    b"HCA\x00": (0x80, 0x80, 0x80, 0x00), b"fmt\x00": (0x80, 0x80, 0x80, 0x00),
    b"comp": (0x80, 0x80, 0x80, 0x80), b"dec\x00": (0x80, 0x80, 0x80, 0x00),
    b"vbr\x00": (0x80, 0x80, 0x80, 0x00), b"ath\x00": (0x80, 0x80, 0x80, 0x00),
    b"loop": (0x80, 0x80, 0x80, 0x80), b"ciph": (0x80, 0x80, 0x80, 0x80),
    b"rva\x00": (0x80, 0x80, 0x80, 0x00), b"comm": (0x80, 0x80, 0x80, 0x80),
    b"pad\x00": (0x80, 0x80, 0x80, 0x00),
}

_CHUNK_SIZES = {
    b"HCA\x00": 8, b"fmt\x00": 16, b"comp": 16, b"dec\x00": 12, b"vbr\x00": 8,
    b"ath\x00": 6, b"loop": 16, b"ciph": 6, b"rva\x00": 8,
}


def crypt_header(header: bytearray, ciph_value: int) -> bytearray:
    """XOR-toggle chunk signature bytes, set the ciph type field, restamp CRC.

    Works in both directions (the masks are involutions). `ciph_value` is the
    value written into the ciph chunk (encryption type when encrypting, 0 when
    decrypting).
    """
    from .crc import crc16

    out = bytearray(header)
    size = len(out)
    pos = 0

    def sig_at(p):
        return bytes(b & 0x7F for b in out[p:p + 4])

    def toggle(p, mask):
        for i in range(4):
            out[p + i] ^= mask[i]

    order = [b"HCA\x00", b"fmt\x00", (b"comp", b"dec\x00"), b"vbr\x00",
             b"ath\x00", b"loop", b"ciph", b"rva\x00", b"comm", b"pad\x00"]
    for want in order:
        if pos + 4 > size:
            break
        sig = sig_at(pos)
        wants = want if isinstance(want, tuple) else (want,)
        if sig not in wants:
            continue
        toggle(pos, _CHUNK_MASKS[sig])
        if sig == b"ciph":
            out[pos + 4:pos + 6] = int(ciph_value).to_bytes(2, "big")
        if sig == b"comm":
            length = out[pos + 4]
            pos += 5 + length
        elif sig == b"pad\x00":
            break
        else:
            pos += _CHUNK_SIZES[sig]
    crc = crc16(bytes(out[:size - 2]))
    out[size - 2:size] = crc.to_bytes(2, "big")
    return out
