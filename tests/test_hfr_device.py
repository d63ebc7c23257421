"""Device HFR scale normalisation (ops/hca_hfr_device.py) vs the host f64
chain (hca_encode_host.calc_hfr_scales semantics via
hca_encode_device._host_hfr_scales).

The device version certifies its own exactness: wherever the guard flag is
False the scales must equal the host's; guard=True frames reroute to the
host encoder, so over-flagging is a perf bug but never a parity bug.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pycricodecs_tpu.ops import hca_encode_device as D
from pycricodecs_tpu.ops import hca_encode_host as H
from pycricodecs_tpu.ops import hca_tables as T
from pycricodecs_tpu.ops.hca_hfr_device import (
    _div_exact, _group_counts, _lo32, hfr_scales_device)


def test_div_exact_matches_ieee():
    rng = np.random.default_rng(7)
    for n in (8, 16, 24, 40, 48, 56, 72, 96, 104):
        x = (rng.random(100000).astype(np.float32)
             * np.float32(1000.0)).astype(np.float32)
        q = rng.random(2000).astype(np.float32) + np.float32(0.5)
        ulp = np.nextafter(q, np.inf) - q
        # exact-midpoint quotients (tie-to-even stress) + exact quotients
        mids = (q.astype(np.float64) * n
                + n * ulp.astype(np.float64) / 2).astype(np.float32)
        exact = q * np.float32(n)
        x = np.concatenate([x, mids, exact, np.float32([0.0, 1e-30])])
        want = (x / np.float32(n)).astype(np.float32)
        got, guard = _div_exact(jnp.asarray(x), n)
        got, guard = np.asarray(got), np.asarray(guard)
        assert ((got == want) | guard).all(), n
        # no over-flagging on this (normal-range) population
        assert guard.sum() <= 2, n


def test_div_exact_subnormal_quotient_guards():
    # x normal, x/n subnormal: flushed on device, must be flagged
    x = np.float32([2.0 ** -120, 2.0 ** -115])
    got, guard = _div_exact(jnp.asarray(x), 24)
    assert np.asarray(guard).all()


def test_lo32_boundary():
    # lo32(t) is the least f64 rounding (f32-nearest-even) to >= t
    for t in np.asarray(T.SCALING_TABLE, np.float32):
        lo = _lo32(t)
        assert np.float32(lo) >= t
        below = np.nextafter(np.float64(lo), 0.0)
        assert np.float32(below) < t


class _Info:
    pass


def _mk(info_ch, G, bpg, start, total, hfr_band_count, types):
    info = _Info()
    info.channels = info_ch
    info.hfr_group_count = G
    info.bands_per_hfr_group = bpg
    info.stereo_band_count = 0
    info.base_band_count = start
    info.total_band_count = total
    info.channel_type = types
    return info


def _host_scales(info, counts, counts2, ga, gs):
    """Reference normalisation on [B,F,C,G] sums (float64 branch exact)."""
    B, F, C, G = ga.shape
    out = np.zeros((B, F, C, G), np.int32)
    for g in range(G):
        n, n2 = counts[g], counts2[g]
        if n == 0:
            continue
        avg = (ga[..., g] / np.float32(n)).astype(np.float32)
        if n2:
            avg2 = (gs[..., g] / np.float32(n2)).astype(np.float32)
            factor = np.minimum(
                1.0 / np.maximum(avg2.astype(np.float64), 1e-300),
                np.sqrt(2.0))
            upd = (avg.astype(np.float64) * factor).astype(np.float32)
            avg = np.where(avg2.astype(np.float64) > 0.0, upd, avg)
        out[..., g] = H.find_scale_factor(avg)
    for c in range(info.channels):
        if info.channel_type[c] == T.STEREO_SECONDARY:
            out[:, :, c, :] = 0
    return out


def test_hfr_scales_random_parity():
    rng = np.random.default_rng(3)
    info = _mk(2, 6, 2, 80, 128, 24, (1, 2))
    counts = [16, 16, 16, 16, 16, 16]
    counts2 = [16, 8, 0, 0, 0, 0]
    shape = (4, 37, 2, 6)
    # magnitudes spanning the scale table's range and beyond
    ga = (rng.random(shape) * 10.0 ** rng.uniform(-8, 2, shape)
          ).astype(np.float32)
    gs = (rng.random(shape) * 10.0 ** rng.uniform(-8, 1, shape)
          ).astype(np.float32)
    ga[0, 0] = 0.0
    gs[0, 1] = 0.0
    want = _host_scales(info, counts, counts2, ga, gs)
    got, guard = hfr_scales_device(
        jnp.asarray(ga), jnp.asarray(gs), counts=counts, counts2=counts2,
        channel_types=tuple(info.channel_type))
    got, guard = np.asarray(got), np.asarray(guard)
    clean = ~guard
    assert clean.mean() > 0.99            # over-flagging fence
    assert (got[clean] == want[clean]).all()


def test_hfr_scales_exact_table_hit_is_unambiguous():
    """v landing exactly ON a table entry is decidedly >= it (the real
    decision boundary is the f32 rounding midpoint lo32, below the entry):
    no guard, and the scale counts that entry."""
    tab = np.asarray(T.SCALING_TABLE, np.float32)
    k = 40
    # avg2 = 1.0 -> factor = 1.0 exactly; avg = tab[k] -> v == tab[k]
    ga = np.full((1, 1, 1, 1), tab[k] * np.float32(16), np.float32)
    gs = np.full((1, 1, 1, 1), np.float32(16.0), np.float32)
    got, guard = hfr_scales_device(
        jnp.asarray(ga), jnp.asarray(gs), counts=[16], counts2=[16],
        channel_types=(1,))
    assert not np.asarray(guard).any()
    assert int(np.asarray(got)[0, 0, 0, 0]) == k + 1


def test_hfr_scales_near_boundary_guards():
    """A ratio within ~2^-48 of the lo32 decision boundary must flag.

    f32 pairs can approach (never hit) the 25-bit midpoint lo32: the best
    rational approximation p/q with q <= 2^24 sits ~1/(q*q') ~ 2^-48 away
    (continued fractions), inside the 2^-38 guard band but far beyond
    f32-pair resolution games.  avg2 is scaled into [0.75, 1.5) so the
    division branch (factor = 1/avg2 <= sqrt2) is the one exercised.
    """
    from fractions import Fraction

    tab = np.asarray(T.SCALING_TABLE, np.float32)
    k = 40
    lo = _lo32(tab[k])
    L = Fraction(lo)
    # continued-fraction convergents of L with denominator <= 2^24
    a = L
    p0, q0v, p1, q1 = 0, 1, 1, 0
    best = None
    while True:
        ai = int(a)
        p0, p1 = p1, ai * p1 + p0
        q0v, q1 = q1, ai * q1 + q0v
        if q1 > 2 ** 24 or p1 > 2 ** 24:
            break
        if q1 > 2 ** 20:
            best = (p1, q1)
        frac = a - ai
        if frac == 0:
            break
        a = 1 / frac
    assert best is not None
    p, q = best
    assert Fraction(p, q) != L
    # scale BOTH by 2^s (exact for p, q <= 2^24) so avg2 lands in
    # [0.75, 1.5) -> factor = 1/avg2 (not the sqrt2 cap)
    s = -q.bit_length()
    if q * 2.0 ** s < 0.75:
        s += 1
    avg = np.float32(np.float64(p) * 2.0 ** s)
    avg2 = np.float32(np.float64(q) * 2.0 ** s)
    assert 0.75 <= avg2 < 1.5
    assert float(avg) / float(avg2) == p / q
    ga = np.full((1, 1, 1, 1), avg * np.float32(16), np.float32)
    gs = np.full((1, 1, 1, 1), avg2 * np.float32(16), np.float32)
    got, guard = hfr_scales_device(
        jnp.asarray(ga), jnp.asarray(gs), counts=[16], counts2=[16],
        channel_types=(1,))
    assert np.asarray(guard).all()


def test_hfr_scales_pipeline_parity():
    """Against _host_hfr_scales on real encode-transform outputs."""
    from tests.test_pack_device import _encode_tensors, _wav

    for case in [dict(channels=2, quality=4, samples=8192, seed=21),
                 dict(channels=6, quality=2, samples=6144, seed=22),
                 dict(channels=1, quality=3, samples=8192, seed=23)]:
        wav_bytes = _wav(samples=case["samples"], channels=case["channels"],
                         seed=case["seed"])
        from pycricodecs_tpu.utils import wav as wavmod
        w = wavmod.parse_wav(wav_bytes)
        cfg = H.init_encode(w, case["quality"], w.looping)
        info = cfg.info
        if info.hfr_group_count == 0:
            continue
        _, F, tensors = _encode_tensors(wav_bytes, case["quality"])
        # recompute ga/gs by re-running the transform (tensors drop them)
        pcm = np.zeros((1, info.channels, -(-F // 16) * 16 * 1024), np.int16)
        tl = H.build_timeline(cfg, w)
        pcm[0, :, :tl.shape[1]] = tl
        pairs = tuple((c, c + 1) for c in range(info.channels - 1)
                      if info.channel_type[c] == T.STEREO_PRIMARY) \
            if info.stereo_band_count > 0 else ()
        out = D.hca_encode_transform(
            pcm, base_band=int(info.base_band_count),
            total_band=int(info.total_band_count), pairs=pairs,
            coded_counts=tuple(int(x) for x in info.coded_count),
            channel_types=tuple(int(x) for x in info.channel_type),
            hfr_group_count=int(info.hfr_group_count),
            bands_per_hfr_group=int(info.bands_per_hfr_group),
            hfr_band_count=int(cfg.hfr_band_count),
            frame_size=int(info.frame_size))
        ga, gs = np.asarray(out[7]), np.asarray(out[8])
        want = D._host_hfr_scales(info, cfg, ga, gs)
        counts, counts2 = _group_counts(info, int(cfg.hfr_band_count))
        got, guard = hfr_scales_device(
            jnp.asarray(ga), jnp.asarray(gs), counts=counts,
            counts2=counts2,
            channel_types=tuple(int(x) for x in info.channel_type))
        got, guard = np.asarray(got), np.asarray(guard)
        assert not np.asarray(guard).any(), "unexpected guard on content"
        assert (got == want).all()
