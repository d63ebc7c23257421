"""CRILAYLA parity tests vs the reference C++ extension."""
import numpy as np
import pytest

from pycricodecs_tpu.models import crilayla


def _payloads():
    rng = np.random.default_rng(7)
    text = (b"the quick brown fox jumps over the lazy dog. " * 100)
    rep = bytes(rng.integers(0, 8, 600).astype(np.uint8)) * 5
    noisy = bytes(rng.integers(0, 256, 4096).astype(np.uint8))
    mixed = text + noisy[:512] + text[:1024]
    return {"text": text, "repetitive": rep, "noisy": noisy, "mixed": mixed}


# "noisy" (incompressible) is excluded from oracle parity: the reference's
# compressor indexes its output with an unsigned counter that wraps when the
# stream exceeds the input size (crilayla.cpp:112), crashing the process.
# Our implementation handles it; see test_python_fallback_matches_native.
@pytest.mark.parametrize("name", ["text", "repetitive", "mixed"])
def test_compress_matches_reference(oracle, name):
    data = _payloads()[name]
    ours = crilayla.compress(data)
    ref = bytes(oracle.CriLaylaCompress(data))
    assert ours == ref


@pytest.mark.parametrize("name", ["text", "repetitive", "mixed"])
def test_decompress_matches_reference(oracle, name):
    data = _payloads()[name]
    comp = bytes(oracle.CriLaylaCompress(data))
    ours = crilayla.decompress(comp)
    ref = bytes(oracle.CriLaylaDecompress(comp))
    assert ours == ref
    assert ours == data  # roundtrip restores the input exactly


@pytest.mark.parametrize("name", ["text", "repetitive", "noisy", "mixed"])
def test_python_fallback_matches_native(name):
    data = _payloads()[name]
    comp_native = crilayla.compress(data)
    comp_py = crilayla._compress_py(data)
    assert comp_py == comp_native
    decompress_size = int.from_bytes(comp_native[8:12], "little")
    compressed_size = int.from_bytes(comp_native[12:16], "little")
    out_py = crilayla._decompress_py(comp_native[16:], compressed_size,
                                     decompress_size)
    assert out_py == crilayla.decompress(comp_native) == data


def test_incompressible_roundtrip():
    """Incompressible data (which crashes the reference) roundtrips here."""
    rng = np.random.default_rng(9)
    noisy = bytes(rng.integers(0, 256, 8192).astype(np.uint8))
    comp = crilayla.compress(noisy)
    assert crilayla.decompress(comp) == noisy


def test_hash_matcher_matches_reference_medium(oracle):
    """The hash-chain matcher preserves the reference's exact greedy choices
    on a larger mixed payload (the reference's O(n*window) search allows only
    a modest size here)."""
    rng = np.random.default_rng(11)
    text = (b"structured segment with repeating tokens " * 400)
    noise = bytes(rng.integers(0, 256, 12000).astype(np.uint8))
    data = (text + noise + text[:5000] + noise[:3000])
    ours = crilayla.compress(data)
    ref = bytes(oracle.CriLaylaCompress(data))
    assert ours == ref
    assert crilayla.decompress(ours) == data


def test_decompress_rejects_implausible_size():
    """A hostile header claiming multi-GiB output must raise, not allocate."""
    import pytest
    from pycricodecs_tpu.models import crilayla

    blob = (b"CRILAYLA" + (0xFFFFFFFF).to_bytes(4, "little")
            + (64).to_bytes(4, "little") + b"\x00" * (64 + 256))
    with pytest.raises(ValueError):
        crilayla.decompress(blob)
