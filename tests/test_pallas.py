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
    # the raw kernel consumes the minimal-history xext convention (h_min
    # leading samples), not the extended zero-copy history the params carry
    h_min = getattr(p, "h_min", p.history_len)
    xext = np.concatenate([np.zeros(h_min, np.float32), x])
    y = np.asarray(rational_supercycle_pallas(
        jnp.asarray(xext), jnp.asarray(K), L, M, len(ref), JT=32,
        interpret=True))[:len(ref)]  # kernels return tile-padded output
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_pallas_path_stateless_and_streaming(rng):
    h = rng.standard_normal(352).astype(np.float32)
    x = rng.standard_normal(9000).astype(np.float32)
    r = Fraction(11, 4)
    ref = np.asarray(mr.filt(h, x, r, path="supercycle"))
    y = np.asarray(mr.filt(h, x, r, path="pallas"))
    # Both paths use bf16x3 splits (~2^-16/product, ops/precision.py) but
    # with different grouping/summation order; the accumulated difference
    # bound for 352 taps on N(0,1) data is ~sqrt(352)*2^-16 ~= 3e-4.
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=3e-4)
    f = mr.FIRFilter(h, r, path="pallas")
    parts = [np.asarray(f.filt(x[i:i + 1500])) for i in range(0, 9000, 1500)]
    yc = np.concatenate(parts)
    assert yc.shape == ref.shape
    np.testing.assert_allclose(yc, ref, rtol=2e-4, atol=3e-4)


def test_pallas_batched_channels(rng):
    h = rng.standard_normal(64).astype(np.float32)
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    r = Fraction(7, 5)
    ref = np.asarray(mr.filt(h, x, r, path="supercycle"))
    y = np.asarray(mr.filt(h, x, r, path="pallas"))
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=1e-4)


def test_build_k_matrix_band_structure():
    pfb = np.arange(12, dtype=np.float32).reshape(3, 4)  # T=3, L=4
    K = build_k_matrix(pfb, 4, 3)  # L=4, M=3
    assert K.shape == (6, 4)
    # output r: phase (r*3) mod 4, offset (r*3)//4
    for r in range(4):
        off = (r * 3) // 4
        np.testing.assert_array_equal(K[off:off + 3, r], pfb[:, (r * 3) % 4])


@pytest.mark.parametrize("spec,hlen", [((1, 1), 147), ((1, 4), 147),
                                       ((4, 1), 147), ((1, 1), 3),
                                       ((1, 16), 40), ((16, 1), 40)])
def test_generalized_supercycle_all_kernels(rng, spec, hlen):
    """standard/decimator/interpolator through the banded-K supercycle
    machinery (grouped columns), both XLA and Pallas-interpret variants."""
    from fractions import Fraction as F
    h = rng.standard_normal(hlen).astype(np.float32)
    x = rng.standard_normal(4000).astype(np.float32)
    r = F(*spec)
    ref = np.asarray(mr.filt(h, x, r, path="windows"))
    for p in ("supercycle", "pallas"):
        y = np.asarray(mr.filt(h, x, r, path=p))
        assert y.shape == ref.shape, (spec, p)
        np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"{spec} {p}")


def test_generalized_supercycle_streaming_decimator(rng):
    """Decimator deficit state through the banded path (origin folding)."""
    from fractions import Fraction as F
    h = rng.standard_normal(31).astype(np.float64)
    x = rng.standard_normal(1000)
    ref = np.asarray(mr.filt(h, x, F(1, 7), path="windows"))
    f = mr.FIRFilter(h, F(1, 7), path="pallas")
    got = np.concatenate([np.asarray(f.filt(x[i:i + 123]))
                          for i in range(0, 984, 123)] +
                         [np.asarray(f.filt(x[984:]))])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("rate", [0.4709, 1.7])
def test_winsel_v1_fallback_f64(rng, rate):
    """Non-f32 dtypes skip the v3/v4/gridsel f32 fast paths and run the v1
    lane-roll winsel kernels (select.py) — arb + Farrow, plus chunked
    streaming (this is the only remaining consumer of the v1 kernels
    since the phaseall/select2 paths were removed)."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float64)
    x = rng.standard_normal(4000)
    ref = np.asarray(mr.filt(h, x, rate, path="windows"))
    y = np.asarray(mr.filt(h, x, rate, path="winsel"))
    assert y.shape == ref.shape and y.dtype == ref.dtype
    np.testing.assert_allclose(y, ref, rtol=1e-9, atol=1e-11)
    reff = np.asarray(mr.filt(h, x, rate, 32, 4, path="windows"))
    yf = np.asarray(mr.filt(h, x, rate, 32, 4, path="winsel"))
    np.testing.assert_allclose(yf, reff, rtol=1e-9, atol=1e-11)
    f = mr.FIRFilter(h, rate, path="winsel")
    got = np.concatenate([np.asarray(f.filt(x[i:i + 600]))
                          for i in range(0, 3000, 600)])
    np.testing.assert_allclose(got, ref[:got.shape[-1]], rtol=1e-9,
                               atol=1e-11)


def test_complex_signal_planar_fast_paths(rng):
    """Complex x with real taps planar-routes through the fast paths (auto)
    and matches the native-complex windows path."""
    from fractions import Fraction as F
    h = rng.standard_normal(96).astype(np.float32)
    x = (rng.standard_normal(3000) + 1j * rng.standard_normal(3000)
         ).astype(np.complex64)
    for spec in (F(1, 1), F(1, 4), F(4, 1), F(7, 5)):
        ref = np.asarray(mr.filt(h, x, spec, path="windows"))
        y = np.asarray(mr.filt(h, x, spec, path="auto"))
        assert y.dtype == ref.dtype
        np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=str(spec))
    # streaming complex with state carry through the planar route
    f = mr.FIRFilter(h, F(7, 5))
    got = np.concatenate([np.asarray(f.filt(x[i:i + 750]))
                          for i in range(0, 3000, 750)])
    ref = np.asarray(mr.filt(h, x, F(7, 5), path="windows"))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("rate", [0.4709, 1.0 + 1e-9, 1.7, 3.2])
def test_winsel_paths_match_windows(rng, rate):
    """Fully fused winsel kernels (arb + Farrow) vs the windows path,
    stateless and chunked streaming."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    x = rng.standard_normal(4000).astype(np.float32)
    ref = np.asarray(mr.filt(h, x, rate, path="windows"))
    y = np.asarray(mr.filt(h, x, rate, path="winsel"))
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-5)
    reff = np.asarray(mr.filt(h, x, rate, 32, 4, path="windows"))
    yf = np.asarray(mr.filt(h, x, rate, 32, 4, path="winsel"))
    np.testing.assert_allclose(yf, reff, rtol=2e-3, atol=2e-3)


def test_winsel_streaming_and_batch(rng):
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float64)
    x = rng.standard_normal(3000)
    ref = np.asarray(mr.filt(h, x, 1.313, path="windows"))
    f = mr.FIRFilter(h, 1.313, path="winsel")
    got = np.concatenate([np.asarray(f.filt(x[i:i + 600]))
                          for i in range(0, 3000, 600)])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)
    xb = rng.standard_normal((3, 2000)).astype(np.float32)
    refb = np.asarray(mr.filt(h.astype(np.float32), xb, 0.77, path="windows"))
    yb = np.asarray(mr.filt(h.astype(np.float32), xb, 0.77, path="winsel"))
    np.testing.assert_allclose(yb, refb, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("rate", [0.4709, 1.0 + 1e-9, 1.7, 3.2])
def test_farrow_ratgrid_matches_windows(rng, rate):
    """Rational-grid Farrow path (static banded matmul, no gathers)."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    x = rng.standard_normal(8000).astype(np.float32)
    ref = np.asarray(mr.filt(h, x, rate, 32, 4, path="windows"))
    y = np.asarray(mr.filt(h, x, rate, 32, 4, path="ratgrid"))
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


def test_farrow_ratgrid_streaming_chunked(rng):
    """Chunked streaming through ratgrid (traced u0/deficit) == whole."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float64)
    x = rng.standard_normal(30000)
    for rate in (0.87654321, 1.313):
        ref = np.asarray(mr.filt(h, x, rate, 32, 4, path="windows"))
        f = mr.FIRFilter(h, rate, nphi=32, polyorder=4, path="ratgrid")
        got = np.concatenate([np.asarray(f.filt(x[i:i + 7500]))
                              for i in range(0, 30000, 7500)])
        assert got.shape == ref.shape, rate
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)


def test_farrow_ratgrid_batched(rng):
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    xb = rng.standard_normal((3, 6000)).astype(np.float32)
    ref = np.asarray(mr.filt(h, xb, 0.77, 32, 4, path="windows"))
    y = np.asarray(mr.filt(h, xb, 0.77, 32, 4, path="ratgrid"))
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


def test_farrow_ratgrid_degrades_when_no_plan(rng):
    """path='ratgrid' without a plan (bad convergent or oversized block)
    must degrade silently to gridsel/winsel with a trace-time warning,
    not raise — VERDICT r3 item 5 (the bench's 8M block exceeds n_cap)."""
    import warnings

    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    x = rng.standard_normal(40000).astype(np.float32)
    for rate in (1.333219, 0.500377):  # no ratgrid plan at these rates
        p = mr.make_kernel(h, rate=rate, nphi=32, polyorder=4)
        assert p.ratgrid_meta is None
        ref = np.asarray(mr.filt(h, x, rate, 32, 4, path="windows"))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            y = np.asarray(mr.filt(h, x, rate, 32, 4, path="ratgrid"))
        assert any("degrading path='ratgrid'" in str(m.message) for m in w)
        n = min(len(y), len(ref))
        assert np.sqrt(np.mean((y[:n] - ref[:n]) ** 2)) < 1e-4


def test_winsel_v3_fat_tile_kernels(rng):
    """select3 (fat static tiles, packed int32 indices, 2-pass bf16
    selects): f32 arb + Farrow vs the windows oracle, whole + chunked.
    Tolerances reflect the designed 2^-16 alpha/psi quantization."""
    from multirate_tpu.ops.pallas.select3 import v3_geometry
    from multirate_tpu.ops import indexing as idx

    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    x = rng.standard_normal(60_000).astype(np.float32)
    for rate in (0.4709, 1.2468013579):
        p = mr.make_kernel(h, rate=rate, nphi=32)
        assert v3_geometry(32, p.delta_fx, p.taps_per_phi,
                           idx.max_outputs(p, 60_000)) is not None
        ref = np.asarray(mr.filt(h, x, rate, 32, path="windows"))
        got = np.asarray(mr.filt(h, x, rate, 32, path="winsel"))
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-5
        reff = np.asarray(mr.filt(h, x, rate, 32, 4, path="windows"))
        gotf = np.asarray(mr.filt(h, x, rate, 32, 4, path="winsel"))
        assert gotf.shape == reff.shape
        assert np.abs(gotf - reff).max() / np.abs(reff).max() < 1e-4
    # chunked (traced u0 + deficit shift) == whole
    f = mr.FIRFilter(h, 0.87, nphi=32, path="winsel")
    got = np.concatenate([np.asarray(f.filt(x[i:i + 7001]))
                          for i in range(0, 56_008, 7001)])
    whole = np.asarray(mr.filt(h, x[:56_008], 0.87, 32, path="windows"))
    assert got.shape == whole.shape
    assert np.abs(got - whole).max() / np.abs(whole).max() < 5e-5
    # batched channels
    xb = rng.standard_normal((3, 40_000)).astype(np.float32)
    yb = np.asarray(mr.filt(h, xb, 0.77, 32, path="winsel"))
    rb = np.asarray(mr.filt(h, xb, 0.77, 32, path="windows"))
    assert np.abs(yb - rb).max() / np.abs(rb).max() < 5e-5


def test_chansel_batched_matches_windows(rng):
    """Batched-channel fused kernel (pallas/select4 'chansel'): all
    channels share one resampler state; outputs must match the per-channel
    windows path (reference semantics Filters.jl:693-742, 780-836)."""
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    x = rng.standard_normal((8, 40_000)).astype(np.float32)
    for spec in ((0.4709, 32), (1.618, 32), (0.9173, 32, 4)):
        yw = np.asarray(mr.filt(ha, x, *spec, path="windows"))
        yz = np.asarray(mr.filt(ha, x, *spec, path="winsel"))
        n = min(yw.shape[-1], yz.shape[-1])
        num = np.sqrt(np.mean((yz[..., :n] - yw[..., :n]) ** 2))
        den = np.sqrt(np.mean(yw[..., :n] ** 2))
        assert num / den < 5e-4, f"{spec}: rel rms {num / den}"


def test_chansel_streaming_chunked(rng):
    """Chunked batched streaming through chansel == whole-vector."""
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    x = rng.standard_normal((8, 60_000)).astype(np.float32)
    whole = np.asarray(mr.filt(ha, x, 0.77, 32, path="winsel"))
    f = mr.FIRFilter(ha, 0.77, path="winsel")
    parts = [np.asarray(f.filt(x[:, i:i + 15_000]))
             for i in range(0, 60_000, 15_000)]
    yc = np.concatenate(parts, axis=-1)
    n = min(yc.shape[-1], whole.shape[-1])
    np.testing.assert_allclose(yc[..., :n], whole[..., :n],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("rate", [0.4709, 1.0 + 1e-9, 1.7, 0.9173])
def test_gridsel_arb_matches_windows(rng, rate):
    """gridsel (rational-grid tile-adaptive fused kernel): arbitrary
    resampler vs the windows oracle. Index decisions exact; alpha/taps at the designed bf16x3 budget (~2^-16)."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    x = rng.standard_normal(9000).astype(np.float32)
    p = mr.make_kernel(h, rate=rate, nphi=32)
    assert p.gridsel_meta is not None
    ref = np.asarray(mr.filt(h, x, rate, 32, path="windows"))
    y = np.asarray(mr.filt(h, x, rate, 32, path="gridsel"))
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("rate", [0.4709, 1.7, 3.2])
def test_gridsel_farrow_matches_windows(rng, rate):
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    x = rng.standard_normal(9000).astype(np.float32)
    ref = np.asarray(mr.filt(h, x, rate, 32, 4, path="windows"))
    y = np.asarray(mr.filt(h, x, rate, 32, 4, path="gridsel"))
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


def test_gridsel_randomized_rates(rng):
    """Plan-search fuzz: 12 random rates in (0.2, 4.5) through the
    gridsel fused kernels vs the windows oracle. Every convergent-scale
    geometry the plan picks (packed / unpacked / eps-sign / degraded to
    no-plan) must either match the oracle or raise the documented
    no-plan ValueError — never silently diverge."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    x = rng.standard_normal(6000).astype(np.float32)
    rates = 0.2 + 4.3 * rng.random(12)
    planned = 0
    for rate in rates:
        rate = float(rate)
        for extra in ((), (4,)):
            ref = np.asarray(mr.filt(h, x, rate, 32, *extra,
                                     path="windows"))
            try:
                y = np.asarray(mr.filt(h, x, rate, 32, *extra,
                                       path="gridsel"))
            except ValueError as e:
                assert "plan" in str(e), (rate, e)
                continue
            planned += 1
            assert y.shape == ref.shape, rate
            np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4,
                                       err_msg=f"rate={rate}")
    assert planned >= 12  # the plan must cover most of the rate range


def test_gridsel_streaming_chunked(rng):
    """Chunked streaming through gridsel (traced u0/deficit in the packed
    index prep) == whole-vector, for arb and Farrow, odd chunk size."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    x = rng.standard_normal(30000).astype(np.float32)
    for extra in ((), (4,)):
        ref = np.asarray(mr.filt(h, x, 0.87654321, 32, *extra,
                                 path="windows"))
        f = mr.FIRFilter(h, 0.87654321, nphi=32,
                         polyorder=(4 if extra else None), path="gridsel")
        got = np.concatenate([np.asarray(f.filt(x[i:i + 7321]))
                              for i in range(0, 30000, 7321)])
        n = min(got.shape[-1], ref.shape[-1])
        np.testing.assert_allclose(got[:n], ref[:n], rtol=2e-4, atol=2e-4)


def test_gridsel_batched(rng):
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    xb = rng.standard_normal((3, 6000)).astype(np.float32)
    ref = np.asarray(mr.filt(h, xb, 0.77, 32, path="windows"))
    y = np.asarray(mr.filt(h, xb, 0.77, 32, path="gridsel"))
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("C", [16, 24])
def test_gridsel_batch_kernel(rng, C):
    """Batched-channel gridsel (shared per-tile K build, channels stacked
    on the matmul row axis) == windows oracle, arb + Farrow, including a
    C that needs channel padding to the kernel's CB quantum."""
    from multirate_tpu.ops.gridsel import _batch_dims

    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    xb = rng.standard_normal((C, 5000)).astype(np.float32)
    for extra in ((), (4,)):
        p = mr.make_kernel(h, rate=0.9173, nphi=32,
                           polyorder=(extra or (None,))[0])
        assert p.gridsel_meta is not None
        nk = 2 * (extra[0] + 1) if extra else 4
        assert _batch_dims(p.gridsel_meta, C, n_k=nk) is not None
        ref = np.asarray(mr.filt(h, xb, 0.9173, 32, *extra,
                                 path="windows"))
        y = np.asarray(mr.filt(h, xb, 0.9173, 32, *extra, path="gridsel"))
        assert y.shape == ref.shape
        np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("rate,want_packed", [(0.47058825, True),
                                              (0.75, False)])
def test_gridsel_packed_plan(rng, rate, want_packed):
    """Variant-PACKED gridsel plans (2*L2 <= 128: the B variant rides the
    lane padding; near-rational rates) == windows oracle, arb + Farrow,
    single-channel and 16-channel batch, plus chunked streaming.

    0.75 stopped selecting a packed plan in round 5: the valder flow made
    packed/unpacked main-tile cost identical, so the search picks the
    larger-L2 unpacked geometry there — the rate stays as plan-change
    coverage with want_packed=False."""
    from multirate_tpu.ops.gridsel import _pack  # noqa: F401

    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    x = rng.standard_normal(9000).astype(np.float32)
    xb = rng.standard_normal((16, 6000)).astype(np.float32)
    for extra in ((), (4,)):
        p = mr.make_kernel(h, rate=rate, nphi=32,
                           polyorder=(extra or (None,))[0])
        m = p.gridsel_meta
        assert m is not None
        if want_packed:
            assert 2 * m.L2 <= m.L2p
        ref = np.asarray(mr.filt(h, x, rate, 32, *extra, path="windows"))
        y = np.asarray(mr.filt(h, x, rate, 32, *extra, path="gridsel"))
        np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)
        refb = np.asarray(mr.filt(h, xb, rate, 32, *extra, path="windows"))
        yb = np.asarray(mr.filt(h, xb, rate, 32, *extra, path="gridsel"))
        np.testing.assert_allclose(yb, refb, rtol=2e-4, atol=2e-4)
        f = mr.FIRFilter(h, rate, nphi=32, polyorder=(extra or (None,))[0],
                         path="gridsel")
        got = np.concatenate([np.asarray(f.filt(x[i:i + 4021]))
                              for i in range(0, 9000, 4021)])
        n = min(got.shape[-1], ref.shape[-1])
        np.testing.assert_allclose(got[:n], ref[:n], rtol=2e-4, atol=2e-4)


def test_gridsel_batch_streaming_chunked(rng):
    """Chunked streaming through the batched gridsel kernel (traced
    u0/deficit) == whole, odd chunk size."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    xb = rng.standard_normal((16, 12000)).astype(np.float32)
    for extra in ((), (4,)):
        ref = np.asarray(mr.filt(h, xb, 1.3173, 32, *extra,
                                 path="windows"))
        f = mr.FIRFilter(h, 1.3173, nphi=32,
                         polyorder=(extra or (None,))[0], path="gridsel")
        got = np.concatenate([np.asarray(f.filt(xb[:, i:i + 5003]))
                              for i in range(0, 12000, 5003)], axis=-1)
        n = min(got.shape[-1], ref.shape[-1])
        np.testing.assert_allclose(got[..., :n], ref[..., :n],
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("C", [3, 12, 130, 272])
def test_chansel_any_channel_count(rng, C):
    """chansel generalization: channel padding to the 8-sublane quantum
    and 128-channel chunking (ROADMAP completeness item). C=272 covers
    >2 chunks with a ragged final chunk (VERDICT r3 weak #8: nothing
    exercised C > 256)."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    xb = rng.standard_normal((C, 4000)).astype(np.float32)
    for extra in ((), (4,)):
        ref = np.asarray(mr.filt(h, xb, 0.77, 32, *extra, path="windows"))
        y = np.asarray(mr.filt(h, xb, 0.77, 32, *extra, path="winsel"))
        np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


def test_chansel_large_c_lax_map(rng):
    """C=1034 drives the lax.map branch of _chansel_blocks (VERDICT r4
    weak #5: the unrolled Python loop bloated the jitted graph linearly
    in C) plus a ragged tail chunk; equality vs the windows oracle."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    xb = rng.standard_normal((1034, 600)).astype(np.float32)
    ref = np.asarray(mr.filt(h, xb, 0.77, 32, path="windows"))
    y = np.asarray(mr.filt(h, xb, 0.77, 32, path="winsel"))
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("path", ["winsel", "ratgrid", "gridsel"])
def test_complex_taps_fast_paths(rng, path):
    """Complex TAPS through the fused arb/Farrow kernels: filt_block_raw
    splits the bank re/im and runs the real kernel twice (index decisions
    shared), so y == yr + i*yi must hold on every fast path — the
    reference's complex-tap semantics (Filters.jl:693-742) without the
    windows-path slowdown."""
    # gridsel is an f32-only kernel (bf16x3 budget); the others take f64
    ft, ct = ((np.float32, np.complex64) if path == "gridsel"
              else (np.float64, np.complex128))
    hr = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(ft)
    hi = (0.25 * hr[::-1].copy()).astype(ft)
    h = (hr + 1j * hi).astype(ct)
    x = rng.standard_normal(9000).astype(ft)
    for extra in ((), (4,)) if path != "ratgrid" else ((4,),):
        got = np.asarray(mr.filt(h, x, 0.87, 32, *extra, path=path))
        yr = np.asarray(mr.filt(hr, x, 0.87, 32, *extra, path=path))
        yi = np.asarray(mr.filt(hi, x, 0.87, 32, *extra, path=path))
        np.testing.assert_allclose(got, yr + 1j * yi,
                                   rtol=1e-6, atol=1e-4 if ct == np.complex64
                                   else 1e-8)
        # and against the windows oracle (value correctness, not just
        # linearity of the split)
        ref = np.asarray(mr.filt(h, x, 0.87, 32, *extra, path="windows"))
        n = min(len(got), len(ref))
        np.testing.assert_allclose(got[:n], ref[:n], rtol=2e-4, atol=2e-4)


def test_zc_fused_vs_separate_tail_branches(rng):
    """The zc boundary tile runs FUSED into the main grid for short grids
    and as a separate aliased tail call for long ones (ZC_FUSE_MAX_TILES,
    exp24: the pl.when double body costs ~12%/step, the extra dispatch
    ~9-16% of short calls). Pin BOTH branches against the windows oracle
    on a geometry that actually has a boundary tile."""
    from fractions import Fraction as F
    import jax.numpy as jnp
    from multirate_tpu.ops.pallas import rational2 as r2
    from multirate_tpu.ops import compute as cc
    from multirate_tpu.ops import indexing as idx

    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    x = rng.standard_normal(60_000).astype(np.float32)
    p = mr.make_kernel(h, ratio=F(147, 160))
    n_max = idx.max_outputs(p, x.shape[-1])
    plan = cc._zc_plan(p, jnp.asarray(x), np.float32, n_max)
    assert plan is not None
    _, geo, _ = plan
    jt, num_tiles, t_ok, _ = geo
    assert num_tiles > t_ok, "need a boundary tile to exercise"
    ref = np.asarray(mr.filt(h, x, F(147, 160), path="windows"))
    old = (r2.ZC_FUSE_MAX_TILES, r2.ZC_LONGDOT)
    try:
        outs = {}
        # also cross the ZC_LONGDOT body variant (long same-row-view dots
        # vs per-128 chunks) so both group-loop forms stay covered
        for name, fm, ld in (("fused", 1 << 20, True), ("septail", 0, False)):
            r2.ZC_FUSE_MAX_TILES, r2.ZC_LONGDOT = fm, ld
            st = mr.init_state(p, (), jnp.float32)
            y, cnt, _ = cc.filt_block_raw(p, st, jnp.asarray(x), "pallas")
            outs[name] = np.asarray(y)[: int(cnt)]
    finally:
        r2.ZC_FUSE_MAX_TILES, r2.ZC_LONGDOT = old
    for name, got in outs.items():
        assert got.shape == ref.shape, name
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=3e-4,
                                   err_msg=name)


def test_time_major_chansel(rng):
    """filt_block_tm: (E, C) time-major batched arb/Farrow == the
    channel-major path transposed, including streaming state carry,
    deficit shifts (odd chunks), and the transpose fallback for
    non-chansel configs (VERDICT r4 item 2 / ROADMAP round-5 item 2)."""
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    C = 64
    xb = rng.standard_normal((C, 9000)).astype(np.float32)
    xt = np.ascontiguousarray(xb.T)
    for extra in ((), (4,)):
        p = mr.make_kernel(h, rate=0.9173, nphi=32,
                           polyorder=(extra or (None,))[0])
        ref = np.asarray(mr.filt(h, xb, 0.9173, 32, *extra,
                                 path="windows"))
        st = mr.init_state(p, (C,), np.float32)
        y, cnt, st2 = mr.filt_block_tm(p, st, xt)
        n = int(cnt)
        np.testing.assert_allclose(np.asarray(y)[:n].T, ref[:, :n],
                                   rtol=2e-4, atol=2e-4)
        # streaming: two tm chunks at an odd boundary == whole
        st = mr.init_state(p, (C,), np.float32)
        y1, c1, st = mr.filt_block_tm(p, st, xt[:5003])
        y2, c2, st = mr.filt_block_tm(p, st, xt[5003:])
        got = np.concatenate([np.asarray(y1)[:int(c1)],
                              np.asarray(y2)[:int(c2)]], axis=0)
        np.testing.assert_allclose(got[:n].T, ref[:, :n],
                                   rtol=2e-4, atol=2e-4)
    # f64 falls back to the transposed channel-major path
    p = mr.make_kernel(h.astype(np.float64), rate=0.9173, nphi=32)
    st = mr.init_state(p, (C,), np.float64)
    y, cnt, _ = mr.filt_block_tm(p, st, xt.astype(np.float64))
    ref = np.asarray(mr.filt(h.astype(np.float64),
                             xb.astype(np.float64), 0.9173, 32,
                             path="windows"))
    np.testing.assert_allclose(np.asarray(y)[:int(cnt)].T,
                               ref[:, :int(cnt)], rtol=1e-9, atol=1e-9)
