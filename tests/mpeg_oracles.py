"""ctypes bindings to the system libtwolame/libmpg123 as MP2 test oracles.

Two *independent* third-party implementations used only by tests:
libtwolame encodes reference Layer II streams for our decoder to chew on,
and libmpg123 provides reference decodes of both twolame's and our encoder's
output.  Neither is used by the package itself.
"""
from __future__ import annotations

import ctypes as ct
import ctypes.util

import numpy as np

_MODES = {"stereo": 0, "joint": 1, "dual": 2, "mono": 3}


def _load(name: str, fallback: str):
    path = ctypes.util.find_library(name) or fallback
    try:
        return ct.CDLL(path)
    except OSError:
        return None


_tl = _load("twolame", "/usr/lib/x86_64-linux-gnu/libtwolame.so.0")
_mg = _load("mpg123", "/usr/lib/x86_64-linux-gnu/libmpg123.so.0")


def available() -> bool:
    return _tl is not None and _mg is not None


def twolame_encode(pcm: np.ndarray, sample_rate: int, kbps: int,
                   mode: str = "mono") -> bytes:
    """Encode int16 PCM ([N] or [C, N]) to a Layer II stream."""
    _tl.twolame_init.restype = ct.c_void_p
    opt = ct.c_void_p(_tl.twolame_init())
    pcm = np.asarray(pcm, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[None, :]
    nch = pcm.shape[0]
    for name, val in [("twolame_set_in_samplerate", sample_rate),
                      ("twolame_set_out_samplerate", sample_rate),
                      ("twolame_set_num_channels", nch),
                      ("twolame_set_mode", _MODES[mode]),
                      ("twolame_set_bitrate", kbps),
                      ("twolame_set_error_protection", 0)]:
        rc = getattr(_tl, name)(opt, val)
        assert rc == 0, (name, val, rc)
    assert _tl.twolame_init_params(opt) == 0
    n = pcm.shape[1]
    inter = np.ascontiguousarray(pcm.T)
    out = ct.create_string_buffer(4 * n + (1 << 16))
    nb = _tl.twolame_encode_buffer_interleaved(
        opt, inter.ctypes.data_as(ct.c_void_p), n, out, len(out))
    assert nb >= 0, nb
    extra = ct.create_string_buffer(1 << 16)
    nb2 = _tl.twolame_encode_flush(opt, extra, len(extra))
    _tl.twolame_close(ct.byref(opt))
    return out.raw[:nb] + extra.raw[:max(nb2, 0)]


def mpg123_decode(stream: bytes, sample_rate: int, nch: int) -> np.ndarray:
    """Decode an MPEG audio stream to float32 [C, N] in +-1 scale."""
    _mg.mpg123_init()
    _mg.mpg123_new.restype = ct.c_void_p
    h = ct.c_void_p(_mg.mpg123_new(None, ct.byref(ct.c_int(0))))
    _mg.mpg123_format_none(h)
    rc = _mg.mpg123_format(h, ct.c_long(sample_rate), ct.c_int(nch),
                           ct.c_int(0x200))           # MPG123_ENC_FLOAT_32
    assert rc == 0, rc
    _mg.mpg123_open_feed(h)
    _mg.mpg123_feed(h, stream, len(stream))
    buf = ct.create_string_buffer(1 << 24)
    done = ct.c_size_t(0)
    chunks = []
    while True:
        r = _mg.mpg123_read(h, buf, len(buf), ct.byref(done))
        if done.value:
            chunks.append(buf.raw[:done.value])
        if r in (-10, -12):                           # NEED_MORE / DONE
            break
        assert r in (0, -11), r                       # OK / NEW_FORMAT
    _mg.mpg123_delete(h)
    x = np.frombuffer(b"".join(chunks), dtype=np.float32)
    return x.reshape(-1, nch).T


def twolame_encode_crc(pcm: np.ndarray, sample_rate: int, kbps: int,
                       mode: str = "mono") -> bytes:
    """Like twolame_encode but with error protection (CRC16) enabled."""
    _tl.twolame_init.restype = ct.c_void_p
    opt = ct.c_void_p(_tl.twolame_init())
    pcm = np.asarray(pcm, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[None, :]
    for name, val in [("twolame_set_in_samplerate", sample_rate),
                      ("twolame_set_out_samplerate", sample_rate),
                      ("twolame_set_num_channels", pcm.shape[0]),
                      ("twolame_set_mode", _MODES[mode]),
                      ("twolame_set_bitrate", kbps),
                      ("twolame_set_error_protection", 1)]:
        assert getattr(_tl, name)(opt, val) == 0, name
    assert _tl.twolame_init_params(opt) == 0
    n = pcm.shape[1]
    inter = np.ascontiguousarray(pcm.T)
    out = ct.create_string_buffer(4 * n + (1 << 16))
    nb = _tl.twolame_encode_buffer_interleaved(
        opt, inter.ctypes.data_as(ct.c_void_p), n, out, len(out))
    extra = ct.create_string_buffer(1 << 16)
    nb2 = _tl.twolame_encode_flush(opt, extra, len(extra))
    _tl.twolame_close(ct.byref(opt))
    return out.raw[:nb] + extra.raw[:max(nb2, 0)]
