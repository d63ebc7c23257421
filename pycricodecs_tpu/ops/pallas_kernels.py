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
