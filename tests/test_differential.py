"""Bounded randomized differential sweep against the reference oracle.

A distilled, deterministic version of the long-run campaign that found the
u16 scale-truncation parity break. Inputs are restricted to classes where
the reference itself is sound: per-channel sample counts aligned to
samples-per-block (its decoder heap-overflows / emits uninitialised tails
otherwise) and looping only up to 4 channels (its >=5ch looping header
corruption is a documented divergence). Within that envelope, encode,
decode and crypt must be byte-identical, and our three encoder engines
must agree with each other everywhere.
"""
import numpy as np
import pytest

from pycricodecs_tpu.models import adx, hca as hcamod
from pycricodecs_tpu.ops import hca_encode_host
from pycricodecs_tpu.utils.wav import write_wav

SEED = 77001


def _content(rng, ns, ch):
    kind = rng.choice(["tone", "noise", "mix", "quiet", "clip", "dc"])
    x = np.zeros((ns, ch))
    if kind in ("tone", "mix"):
        for c in range(ch):
            x[:, c] += np.sin(2 * np.pi * rng.uniform(20, 8000)
                              * np.arange(ns) / 48000) * rng.uniform(0.01, 0.9)
    if kind in ("noise", "mix"):
        x += rng.standard_normal((ns, ch)) * rng.uniform(0.001, 0.5)
    if kind == "quiet":
        x = rng.standard_normal((ns, ch)) * rng.uniform(1e-5, 1e-3)
    if kind == "clip":
        x = rng.standard_normal((ns, ch)) * 3.0
    if kind == "dc":
        x += rng.uniform(-0.5, 0.5)
    return np.clip(x * 32767, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("case", range(24))
def test_adx_differential(case, oracle):
    rng = np.random.default_rng([SEED, case])
    sr = int(rng.choice([8000, 22050, 44100, 48000, 96000]))
    ch = int(rng.choice([1, 2, 4, 6, 8]))
    bd = int(rng.choice([2, 3, 4, 5, 6, 8, 10, 12, 15]))
    bs = 2 + bd * 4 * int(rng.choice([1, 2]))
    if bs > 255:
        bs = 2 + bd * 4
    spb = (bs - 2) * 8 // bd
    nblocks = int(rng.integers(2, 60))
    ns = nblocks * spb  # aligned: the oracle decoder is only sound here
    mode = int(rng.choice([2, 3, 4]))
    ver = int(rng.choice([3, 4, 5]))
    loop = bool(rng.random() < 0.4) and ch <= 4
    pcm = _content(rng, ns, ch)
    wav = write_wav(pcm.reshape(-1), ch, sr, looping=loop,
                    loop_start=int(rng.integers(0, ns // 2)),
                    loop_end=int(rng.integers(ns // 2, ns)))

    ours = adx.encode(wav, bit_depth=bd, block_size=bs, encoding_mode=mode,
                      version=ver)
    theirs = bytes(oracle.AdxEncode(wav, bd, bs, mode, 0x1F4, 0, ver, 0))
    assert ours == theirs, f"encode bd={bd} bs={bs} m={mode} v={ver} ch={ch}"
    assert ours == adx.encode(wav, bit_depth=bd, block_size=bs,
                              encoding_mode=mode, version=ver, use_jax=True)

    try:
        d_t = bytes(oracle.AdxDecode(ours))
    except ValueError:
        # the reference's acceptance is heap-state-dependent here (its
        # documented uninitialized Looping/Header.Channels reads): the same
        # file can decode or reject depending on what ran before. Require
        # only that OUR decode is deterministic and doesn't crash.
        try:
            adx.decode(ours)
        except ValueError:
            pass
        return
    assert adx.decode(ours) == d_t, \
        f"decode bd={bd} bs={bs} m={mode} v={ver} ch={ch}"


@pytest.mark.parametrize("case", range(10))
def test_hca_differential(case, oracle):
    rng = np.random.default_rng([SEED + 1, case])
    sr = int(rng.choice([22050, 44100, 48000]))
    ch = int(rng.choice([1, 2, 4, 6, 8]))
    ns = int(rng.integers(1024, 40000))
    q = int(rng.choice([0, 1, 2, 3, 5]))
    loop = bool(rng.random() < 0.3) and ns > 2048
    pcm = _content(rng, ns, ch)
    wav = write_wav(pcm.reshape(-1), ch, sr, looping=loop,
                    loop_start=int(rng.integers(0, ns // 2)),
                    loop_end=int(rng.integers(ns // 2, ns)))
    ours = hca_encode_host.encode(wav, quality=q)
    assert ours == bytes(oracle.HcaEncode(wav, 0, q)), f"q={q} ch={ch} sr={sr}"
    hs = int.from_bytes(ours[6:8], "big")
    assert hcamod.decode(ours) == bytes(oracle.HcaDecode(ours, hs, 0, 0))
    key = int(rng.integers(1, 1 << 56))
    sub = int(rng.integers(0, 1 << 16)) if rng.random() < 0.5 else 0
    # the oracle's HcaCrypt encrypts the caller's buffer IN PLACE (it
    # writes through the y# view); hand it a copy
    enc = hcamod.crypt(ours, True, hs, 56, key, sub)
    assert enc == bytes(oracle.HcaCrypt(bytes(bytearray(ours)), 1, hs, 56,
                                        key, sub))
    assert hcamod.crypt(enc, False, hs, 56, key, sub) == ours
    # keyed decode of the encrypted stream (cipher + subkey scramble path)
    assert hcamod.decode(enc, key=key, subkey=sub) == \
        bytes(oracle.HcaDecode(bytes(bytearray(enc)), hs, key, sub))
