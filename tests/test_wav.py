"""WAV/PCM conversion parity vs the reference C++ PCM core."""
import numpy as np
import pytest

from pycricodecs_tpu.utils import wav as wavmod
from tests.conftest import make_sine_pcm16


def _wav_with_depth(pcm16, channels, sr, depth):
    """Build WAV bytes at various bit depths from an int16 source."""
    frames = pcm16.reshape(-1, channels)
    if depth == 8:
        data = ((frames.astype(np.int32) >> 8) + 0x80).astype(np.uint8).tobytes()
        block = channels
        fmt, bits = 1, 8
    elif depth == 16:
        data = frames.astype("<i2").tobytes()
        block = 2 * channels
        fmt, bits = 1, 16
    elif depth == 24:
        v = (frames.astype(np.int32) << 8)
        b = np.zeros((v.size, 3), dtype=np.uint8)
        flat = v.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        data = b.tobytes()
        block = 3 * channels
        fmt, bits = 1, 24
    elif depth == 32:
        data = (frames.astype(np.int32) << 16).astype("<i4").tobytes()
        block = 4 * channels
        fmt, bits = 1, 32
    elif depth == "f32":
        data = (frames.astype(np.float32) / 32767.0).astype("<f4").tobytes()
        block = 4 * channels
        fmt, bits = 3, 32
    elif depth == "f64":
        data = (frames.astype(np.float64) / 32767.0).astype("<f8").tobytes()
        block = 8 * channels
        fmt, bits = 3, 64
    out = bytearray()
    out += b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
    out += b"fmt " + (16).to_bytes(4, "little")
    out += fmt.to_bytes(2, "little") + channels.to_bytes(2, "little")
    out += sr.to_bytes(4, "little")
    out += (sr * block).to_bytes(4, "little") + block.to_bytes(2, "little")
    out += bits.to_bytes(2, "little")
    out += b"data" + len(data).to_bytes(4, "little") + bytes(data)
    return bytes(out)


@pytest.mark.parametrize("depth", [8, 16, 24, 32, "f32", "f64"])
def test_pcm_depths_encode_parity(oracle, depth):
    """All PCM input depths convert identically to the C++ PCM core
    (verified end-to-end through ADX encode, which consumes PCM16)."""
    pcm = make_sine_pcm16(2048, 1, 32000, seed=3)
    pcm[:64] = 0
    wav = _wav_with_depth(pcm, 1, 32000, depth)
    from pycricodecs_tpu.models import adx as adxmod
    ours = adxmod.encode(wav)
    ref = bytes(oracle.AdxEncode(wav, 4, 0x12, 3, 0x1F4, 0, 4, False))
    assert ours == ref


def test_unknown_chunks_skipped(oracle):
    pcm = make_sine_pcm16(1024, 2, 48000, seed=4)
    pcm[:128] = 0
    base = wavmod.write_wav(pcm, 2, 48000)
    # splice a LIST chunk between fmt and data
    junk = b"LIST" + (10).to_bytes(4, "little") + b"INFOjunk05" 
    spliced = base[:36] + junk + base[36:]
    spliced = bytearray(spliced)
    spliced[4:8] = (len(spliced) - 8).to_bytes(4, "little")
    parsed = wavmod.parse_wav(bytes(spliced))
    assert np.array_equal(parsed.pcm16, pcm)
    ours = None
    from pycricodecs_tpu.models import adx as adxmod
    ours = adxmod.encode(bytes(spliced))
    ref = bytes(oracle.AdxEncode(bytes(spliced), 4, 0x12, 3, 0x1F4, 0, 4, False))
    assert ours == ref
