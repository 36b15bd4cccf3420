"""PFB construction / polynomial bank tests (reference: Filters.jl:271-338)."""

import numpy as np

import multirate_tpu as mr


def test_taps2pfb_reference_example():
    # taps2pfb(1:9, 4) = [9 0 0 0; 5 6 7 8; 1 2 3 4] — Filters.jl:276-281
    pfb = mr.taps2pfb(np.arange(1, 10), 4)
    np.testing.assert_array_equal(
        pfb, np.array([[9, 0, 0, 0], [5, 6, 7, 8], [1, 2, 3, 4]]))


def test_taps2pfb_exact_multiple():
    pfb = mr.taps2pfb(np.arange(1, 9), 4)
    np.testing.assert_array_equal(pfb, np.array([[5, 6, 7, 8], [1, 2, 3, 4]]))


def test_taps2pfb_column_is_flipped_subfilter():
    # Column p must be the time-reversed phase-p subfilter: dotting it with a
    # forward window implements convolution (Filters.jl:271-274).
    h = np.arange(12, dtype=float)
    L = 3
    pfb = mr.taps2pfb(h, L)
    for p in range(L):
        np.testing.assert_array_equal(pfb[:, p], h[p::L][::-1])


def test_polyfit_exact_on_polynomial():
    # polyfit fits over abscissae 1..n (support.jl:85-88)
    x = np.arange(1, 9, dtype=float)
    y = 2.0 - 3.0 * x + 0.5 * x ** 2
    c = mr.polyfit(y, 2)
    np.testing.assert_allclose(c, [2.0, -3.0, 0.5], atol=1e-9)
    np.testing.assert_allclose(mr.polyval(c, x), y, atol=1e-9)


def test_pfb2pnfb_reconstructs_rows():
    rng = np.random.default_rng(3)
    nphi = 16
    # taps that vary smoothly across phases are fitted nearly exactly
    t = np.arange(1, nphi + 1)
    pfb = np.stack([1.0 + 0.1 * t + 0.01 * t ** 2,
                    2.0 - 0.05 * t + 0.003 * t ** 3])
    C = mr.pfb2pnfb(pfb, 3)
    assert C.shape == (4, 2)
    recon = (t[:, None] ** np.arange(4)[None, :]) @ C  # (nphi, taps_per_phi)
    np.testing.assert_allclose(recon, pfb.T, atol=1e-8)


def test_kernel_constructors_shapes():
    h = np.random.default_rng(0).standard_normal(40).astype(np.float32)
    k = mr.FIRRational.create(h, 3, 2)
    assert k.pfb.shape == (14, 3) and k.h_min == 13
    # history_len >= h_min: the zero-copy kernel extends it to whole rows
    assert k.history_len >= k.h_min
    k = mr.FIRArbitrary.create(h, 1.5, 8)
    assert k.pfb.shape == (5, 8) and k.dpfb.shape == (5, 8)
    # dpfb is built from [diff(h); 0] (Filters.jl:106)
    dh = np.concatenate([np.diff(h), [0.0]]).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(k.dpfb), mr.taps2pfb(dh, 8))
    k = mr.FIRFarrow.create(h, 1.5, 8, 4)
    assert k.coeffs.shape == (5, 5)
