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
