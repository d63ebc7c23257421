"""Pallas TPU kernels for the HCA hot ops.

The IMDCT butterfly network (the FLOP-heaviest decode stage) reformulated for
Mosaic: the reference's 14 buffer-shuffling stages (hca.cpp:1898-1979) become
an *in-place XOR schedule* — writing each stage's outputs onto its inputs'
lanes makes every stage pair lanes at a uniform XOR distance (1,2,..,64,64,
..,2,1; verified by construction), so each stage is two `pltpu.roll`s, a
parity select and one multiply-add per operand, with all lane bookkeeping
folded into per-stage constant coefficient vectors and a single final
permutation. Arithmetic per logical value is identical to the reference
(one rounded multiply per operand + one rounded add), so output is bit-exact
with the jnp path.

Each grid step processes a [TILE, 128] block of spectra rows in VMEM
(row = one subframe of one channel of one frame).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import hca_tables as T

TILE = 256
LANES = 128


def _build_schedule():
    """Derive the in-place schedule: per-stage (xor distance, c1, c2) and the
    final physical->logical permutation.

    Stage semantics: out[p] = c1[p] * x[p] + c2[p] * x[p ^ d].
    """
    n = LANES
    phys = np.arange(n)  # lane p currently holds logical slot phys[p]
    dists = []
    c1s = []
    c2s = []

    def positions():
        pos = np.empty(n, dtype=int)
        pos[phys] = np.arange(n)
        return pos

    for stage in range(T.MDCT_BITS):  # part 1: add/sub tree
        c = 64 >> stage
        pos = positions()
        newphys = np.empty(n, dtype=int)
        c1 = np.empty(n, dtype=np.float32)
        c2 = np.empty(n, dtype=np.float32)
        d = None
        for j in range(1 << stage):
            base = j * 2 * c
            for k in range(c):
                i1, i2 = base + 2 * k, base + 2 * k + 1
                p1, p2 = pos[i1], pos[i2]
                d = p1 ^ p2
                c1[p1], c2[p1] = 1.0, 1.0    # sum lane: x + partner
                c1[p2], c2[p2] = -1.0, 1.0   # diff lane: partner - x
                newphys[p1] = base + k
                newphys[p2] = base + c + k
        dists.append(d)
        c1s.append(c1)
        c2s.append(c2)
        phys = newphys

    for stage in range(T.MDCT_BITS):  # part 2: twiddle stages
        count1 = 64 >> stage
        c = 1 << stage
        sin_t = T.IMDCT_SIN[stage]
        cos_t = T.IMDCT_COS[stage]
        pos = positions()
        newphys = np.empty(n, dtype=int)
        c1 = np.empty(n, dtype=np.float32)
        c2 = np.empty(n, dtype=np.float32)
        d = None
        ti = 0
        for j in range(count1):
            base = j * 2 * c
            for k in range(c):
                i1, i2 = base + k, base + c + k
                p1, p2 = pos[i1], pos[i2]
                d = p1 ^ p2
                # first  = s1*sin - s2*cos  (written on s1's lane)
                # second = s1*cos + s2*sin  (written on s2's lane, which the
                #          reference stores reversed — absorbed by the final
                #          permutation)
                c1[p1], c2[p1] = sin_t[ti], -cos_t[ti]
                c1[p2], c2[p2] = sin_t[ti], cos_t[ti]
                newphys[p1] = base + k
                newphys[p2] = base + 2 * c - 1 - k
                ti += 1
        dists.append(d)
        c1s.append(c1)
        c2s.append(c2)
        phys = newphys

    # output[logical l] lives on lane perm[l]
    perm = np.empty(n, dtype=np.int32)
    perm[phys] = np.arange(n)
    return (tuple(int(d) for d in dists),
            np.stack(c1s).astype(np.float32),   # [14, 128]
            np.stack(c2s).astype(np.float32),   # [14, 128]
            perm)


_DISTS, _C1, _C2, _PERM = _build_schedule()


def _imdct_kernel(c1_ref, c2_ref, spec_ref, out_ref):
    from jax.experimental.pallas import tpu as pltpu

    x = spec_ref[:, :]
    tile = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    for t, d in enumerate(_DISTS):
        fwd = pltpu.roll(x, -d % LANES, 1)   # partner for lanes with bit clear
        bwd = pltpu.roll(x, d, 1)            # partner for lanes with bit set
        partner = jnp.where((lane & d) == 0, fwd, bwd)
        x = c1_ref[t, :] * x + c2_ref[t, :] * partner
    out_ref[:, :] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def imdct_pallas(spectra, interpret=False):
    """DCT-IV over the last axis via the Pallas kernel (bit-exact with the
    jnp butterfly path). spectra: f32 [..., 128]."""
    shape = spectra.shape
    rows = spectra.reshape(-1, LANES)
    n = rows.shape[0]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        rows = jnp.concatenate(
            [rows, jnp.zeros((n_pad - n, LANES), rows.dtype)], axis=0)
    try:
        from jax.experimental.pallas import tpu as pltpu
        mem_kw = dict(memory_space=pltpu.VMEM)
    except ImportError:  # pragma: no cover
        mem_kw = {}
    out = pl.pallas_call(
        _imdct_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, LANES), jnp.float32),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((14, LANES), lambda i: (0, 0), **mem_kw),
            pl.BlockSpec((14, LANES), lambda i: (0, 0), **mem_kw),
            pl.BlockSpec((TILE, LANES), lambda i: (i, 0), **mem_kw),
        ],
        out_specs=pl.BlockSpec((TILE, LANES), lambda i: (i, 0), **mem_kw),
        interpret=interpret,
    )(jnp.asarray(_C1), jnp.asarray(_C2), rows)
    # undo the in-place lane bookkeeping (pure gather, outside the kernel)
    out = jnp.take(out[:n], jnp.asarray(_PERM), axis=-1)
    return out.reshape(shape)


def _build_ola_maps():
    """Static gather matrices + window vectors for fused IMDCT->overlap-add.

    The windowed overlap-add (hca.cpp:1981-2018) reads each subframe's DCT
    output twice under static lane permutations:

        wave[k]    = w[k]    * dct[64+k]  + w[127-k] * prev[63-k]   (k < 64)
        wave[64+k] = w[64+k] * dct[127-k] - w[63-k]  * prev[k]

    Lane permutations are not natively expressible in Mosaic, so each becomes
    a 0/1 matrix multiply (every output draws exactly one input scaled by
    1.0f — bit-exact), composed with the IMDCT kernel's final
    physical->logical permutation so no separate un-permute pass is needed.
    The window weights (and the second-half minus sign) stay as per-lane
    vector multiplies to keep the mul/add rounding order identical to the
    jnp path.
    """
    w = np.asarray(T.IMDCT_WINDOW, dtype=np.float32)
    src_a = np.empty(LANES, dtype=np.int64)
    src_b = np.empty(LANES, dtype=np.int64)
    wa = np.empty(LANES, dtype=np.float32)
    wb = np.empty(LANES, dtype=np.float32)
    for k in range(64):
        src_a[k] = 64 + k
        wa[k] = w[k]
        src_a[64 + k] = 127 - k
        wa[64 + k] = w[64 + k]
        src_b[k] = 63 - k
        wb[k] = w[127 - k]
        src_b[64 + k] = k
        wb[64 + k] = -w[63 - k]
    ma = np.zeros((LANES, LANES), dtype=np.float32)
    mb = np.zeros((LANES, LANES), dtype=np.float32)
    for l in range(LANES):
        ma[_PERM[src_a[l]], l] = 1.0   # dct[i] lives on kernel lane _PERM[i]
        mb[_PERM[src_b[l]], l] = 1.0
    return ma, mb, wa, wb


_MA, _MB, _WA, _WB = _build_ola_maps()


def _imdct_ola_kernel(c1_ref, c2_ref, ma_ref, mb_ref, wa_ref, wb_ref,
                      spec_ref, out_ref, carry_ref):
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    x = spec_ref[0]
    tile = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    for t, d in enumerate(_DISTS):
        fwd = pltpu.roll(x, -d % LANES, 1)
        bwd = pltpu.roll(x, d, 1)
        partner = jnp.where((lane & d) == 0, fwd, bwd)
        x = c1_ref[t, :] * x + c2_ref[t, :] * partner
    # exact 0/1 gathers: current-row term and previous-row term
    ya = jax.lax.dot_general(x, ma_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    yb = jax.lax.dot_general(x, mb_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 0)
    prev = jnp.where(row == 0, carry_ref[:, :], pltpu.roll(yb, 1, 0))
    out_ref[0] = wa_ref[0] * ya + wb_ref[0] * prev
    carry_ref[:, :] = yb[tile - 1:tile, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def imdct_ola_pallas(spectra_t, interpret=False):
    """Fused DCT-IV + windowed overlap-add + final permutation.

    spectra_t: f32 [R, T, 128] — time-major subframe rows per (stream,
    channel); the one-step OLA carry rides VMEM scratch across the
    sequential time-tile grid axis (reset at each row's first tile).
    Returns wave f32 [R, T, 128], bit-exact with
    _window_overlap_add(_imdct_butterflies(...)).
    """
    from jax.experimental.pallas import tpu as pltpu

    R, Tn, _ = spectra_t.shape
    t_pad = -(-Tn // TILE) * TILE
    if t_pad != Tn:
        spectra_t = jnp.concatenate(
            [spectra_t,
             jnp.zeros((R, t_pad - Tn, LANES), spectra_t.dtype)], axis=1)
    mem_kw = dict(memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda r, j: (0,) * len(shape),
                                       **mem_kw)
    out = pl.pallas_call(
        _imdct_ola_kernel,
        out_shape=jax.ShapeDtypeStruct((R, t_pad, LANES), jnp.float32),
        grid=(R, t_pad // TILE),
        in_specs=[
            const((14, LANES)), const((14, LANES)),
            const((LANES, LANES)), const((LANES, LANES)),
            const((1, LANES)), const((1, LANES)),
            pl.BlockSpec((1, TILE, LANES), lambda r, j: (r, j, 0), **mem_kw),
        ],
        out_specs=pl.BlockSpec((1, TILE, LANES), lambda r, j: (r, j, 0),
                               **mem_kw),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(_C1), jnp.asarray(_C2), jnp.asarray(_MA), jnp.asarray(_MB),
      jnp.asarray(_WA)[None, :], jnp.asarray(_WB)[None, :], spectra_t)
    return out[:, :Tn]


def pallas_available() -> bool:
    return jax.devices()[0].platform == "tpu" or \
        os.environ.get("PYCRICODECS_PALLAS_INTERPRET") == "1"


def imdct(spectra, use_pallas: bool = False):
    """Dispatch: Pallas kernel on TPU (or interpret mode when forced)."""
    if use_pallas or os.environ.get("PYCRICODECS_USE_PALLAS") == "1":
        interp = jax.devices()[0].platform != "tpu"
        return imdct_pallas(spectra, interpret=interp)
    from . import hca_kernels
    return hca_kernels._imdct_butterflies(spectra)
