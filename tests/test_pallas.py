"""Pallas IMDCT kernel parity vs the jnp butterfly implementation."""
import numpy as np
import pytest

from pycricodecs_tpu.ops import hca_kernels, pallas_kernels


def test_pallas_imdct_matches_jnp():
    rng = np.random.default_rng(0)
    spec = (rng.standard_normal((3, 5, 2, 8, 128)) * 0.4).astype(np.float32)
    ref = np.asarray(hca_kernels._imdct_butterflies(spec))
    out = np.asarray(pallas_kernels.imdct_pallas(spec, interpret=True))
    assert np.array_equal(ref.view(np.uint32), out.view(np.uint32))


def test_pallas_imdct_nonaligned_rows():
    rng = np.random.default_rng(1)
    spec = (rng.standard_normal((7, 128)) * 0.2).astype(np.float32)  # < TILE
    ref = np.asarray(hca_kernels._imdct_butterflies(spec))
    out = np.asarray(pallas_kernels.imdct_pallas(spec, interpret=True))
    assert np.array_equal(ref.view(np.uint32), out.view(np.uint32))


def test_enc_mdct_pallas_bit_exact():
    """Encoder MDCT kernel == the XLA _mdct stage network, bit-for-bit,
    including the leading zero previous-block half and non-tile-aligned
    row counts (hca.cpp:2481-2553 is the reference order both reproduce)."""
    import jax
    import jax.numpy as jnp
    from pycricodecs_tpu.ops import pallas_kernels as pk
    from pycricodecs_tpu.ops.hca_encode_device import _mdct
    from pycricodecs_tpu.ops import _hca_data as T

    rng = np.random.default_rng(5)
    window = jnp.asarray(T.IMDCT_WINDOW)
    for B, C, Tn in ((3, 2, 11), (1, 1, 5)):
        pcm = rng.integers(-32768, 32768, size=(B, C, Tn * 128),
                           dtype=np.int16)
        out = np.asarray(pk.mdct_enc_pallas(pcm, interpret=True))
        wave = (jnp.asarray(pcm).astype(jnp.float32)
                * jnp.float32(1.0 / 32768.0)).reshape(B, C, Tn, 128)
        ref = np.asarray(jax.jit(lambda w: _mdct(w, window))(wave))
        assert np.array_equal(ref.view(np.uint32), out.view(np.uint32)), \
            (B, C, Tn)


def test_imdct_ola_fused_bit_exact():
    """Fused IMDCT+overlap-add kernel == jnp reference path, incl. padding
    and the cross-tile carry (T not a multiple of the tile size)."""
    import numpy as np
    import jax.numpy as jnp
    from pycricodecs_tpu.ops import hca_kernels as hk
    from pycricodecs_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(7)
    for R, T in ((1, 8), (3, 40), (2, 300)):
        x = (rng.standard_normal((R, T, 128)) * 0.5).astype(np.float32)
        ref = np.asarray(hk._window_overlap_add(
            hk._imdct_butterflies(jnp.asarray(x))))
        got = np.asarray(pk.imdct_ola_pallas(jnp.asarray(x), interpret=True))
        assert np.array_equal(ref, got), (R, T)
