"""Pallas kernel correctness (interpret mode on CPU — the SURVEY.md
section 5 'sanitizer' story for kernels)."""

from fractions import Fraction

import numpy as np
import pytest

import multirate_tpu as mr
from multirate_tpu.ops.pallas.rational import (
    rational_supercycle_pallas, build_k_matrix,
)


@pytest.mark.parametrize("L,M,hlen", [(147, 160, 3528), (7, 5, 36),
                                      (3, 2, 100), (2, 3, 17)])
def test_pallas_rational_matches_reference_path(rng, L, M, hlen):
    import jax.numpy as jnp
    h = rng.standard_normal(hlen).astype(np.float32)
    x = rng.standard_normal(8000).astype(np.float32)
    p = mr.make_kernel(h, ratio=Fraction(L, M))
    ref = np.asarray(mr.filt(h, x, Fraction(L, M), path="windows"))
    K = build_k_matrix(np.asarray(p.pfb), L, M)
    xext = np.concatenate([np.zeros(p.history_len, np.float32), x])
    y = np.asarray(rational_supercycle_pallas(
        jnp.asarray(xext), jnp.asarray(K), L, M, len(ref), JT=32,
        interpret=True))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_pallas_path_stateless_and_streaming(rng):
    h = rng.standard_normal(352).astype(np.float32)
    x = rng.standard_normal(9000).astype(np.float32)
    r = Fraction(11, 4)
    ref = np.asarray(mr.filt(h, x, r, path="supercycle"))
    y = np.asarray(mr.filt(h, x, r, path="pallas"))
    assert np.abs(y - ref).max() < 1e-5
    f = mr.FIRFilter(h, r, path="pallas")
    parts = [np.asarray(f.filt(x[i:i + 1500])) for i in range(0, 9000, 1500)]
    yc = np.concatenate(parts)
    assert yc.shape == ref.shape
    assert np.abs(yc - ref).max() < 1e-5


def test_pallas_batched_channels(rng):
    h = rng.standard_normal(64).astype(np.float32)
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    r = Fraction(7, 5)
    ref = np.asarray(mr.filt(h, x, r, path="supercycle"))
    y = np.asarray(mr.filt(h, x, r, path="pallas"))
    assert np.abs(y - ref).max() < 1e-5


def test_build_k_matrix_band_structure():
    pfb = np.arange(12, dtype=np.float32).reshape(3, 4)  # T=3, L=4
    K = build_k_matrix(pfb, 4, 3)  # L=4, M=3
    assert K.shape == (6, 4)
    # output r: phase (r*3) mod 4, offset (r*3)//4
    for r in range(4):
        off = (r * 3) // 4
        np.testing.assert_array_equal(K[off:off + 3, r], pfb[:, (r * 3) % 4])
