"""Drop-in replacement for the reference's `CriCodecs` C extension module.

Exposes the same 7-function surface (CriCodecs.cpp:8-17) with identical
signatures, so code written against `import CriCodecs` can switch to
`from pycricodecs_tpu import cricodecs as CriCodecs`:

    AdxDecode(data) / AdxEncode(data, bitdepth, blocksize, encoding,
                                highpass, filter, adxver, force_no_looping)
    HcaDecode(data, header_size, keycode, subkey)
    HcaEncode(wav, force_not_looping, quality)
    HcaCrypt(buffer, crypt, header_size, type, keycode, subkey)
    CriLaylaDecompress(data) / CriLaylaCompress(data)
"""
from __future__ import annotations

from .models import adx as _adx
from .models import crilayla as _crilayla
from .models import hca as _hca
from .ops import hca_encode_host as _hca_enc


def AdxDecode(data: bytes) -> bytes:
    return _adx.decode(data)


def AdxEncode(data: bytes, bitdepth: int = 4, blocksize: int = 0x12,
              encoding: int = 3, highpass_frequency: int = 0x1F4,
              filter: int = 0, adx_version: int = 4,
              force_no_looping: bool = False) -> bytes:
    return _adx.encode(data, bit_depth=bitdepth, block_size=blocksize,
                       encoding_mode=encoding,
                       highpass_frequency=highpass_frequency, filter_=filter,
                       version=adx_version, force_not_looping=force_no_looping)


def HcaDecode(data: bytes, header_size: int, keycode: int = 0,
              subkey: int = 0) -> bytes:
    return _hca.decode(data, key=keycode, subkey=subkey)


def HcaEncode(data: bytes, force_not_looping: int = 0,
              quality: int = 1) -> bytes:
    return _hca_enc.encode(data, force_not_looping=bool(force_not_looping),
                           quality=quality)


def HcaCrypt(buffer, crypt: int, header_size: int, type: int,
             keycode: int, subkey: int) -> bytes:
    return _hca.crypt(bytes(buffer), bool(crypt), header_size, type,
                      keycode, subkey)


def CriLaylaDecompress(data: bytes) -> bytes:
    return _crilayla.decompress(data)


def CriLaylaCompress(data: bytes) -> bytes:
    return _crilayla.compress(data)
