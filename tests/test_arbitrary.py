"""FIRArbitrary / FIRFarrow differential tests (reference: runtests.jl
test_arbitrary :330-378, test/farrowtest.jl, test/arbtest.jl)."""

import numpy as np
import pytest

import multirate_tpu as mr
from helpers import run_chunked
from multirate_tpu.utils.oracle import naivefilt
from multirate_tpu.utils.testing import assert_close, rms


def design_taps(nphi=32, transition=0.05, cutoff=0.45):
    """The reference's resampler tap recipe: design at samplerate=nphi, scale
    by nphi for unity passband gain (runtests.jl:336-341)."""
    hlen, beta = mr.kaiserlength(transition, samplerate=nphi)
    hlen = int(np.ceil(hlen / nphi)) * nphi
    return mr.firdes(hlen, cutoff, mr.kaiser, samplerate=nphi, beta=beta) * nphi


@pytest.mark.parametrize("rate", [0.713, 1.2468013579, 1.7238754, 3.99])
def test_arbitrary_vs_naive(rng, rate):
    nphi = 32
    h = design_taps(nphi)
    x = rng.standard_normal(300)
    naive = naivefilt(h, x, float(rate), nphi)

    # The derivative-bank scheme differs from the naive adjacent-sample
    # interpolation by O(tail taps) exactly at the last phase (the zero
    # appended to dh, Filters.jl:106), so the oracle bound is loose per
    # element; index-shift bugs would blow the rms by orders of magnitude.
    stateless = np.asarray(mr.filt(h, x, float(rate), nphi))
    n = min(len(naive), len(stateless))  # implementations may differ by a
    assert abs(len(naive) - len(stateless)) <= 2   # trailing sample or two
    assert_close(stateless[:n], naive[:n], rtol=1e-3, atol=3e-4,
                 label=f"arb stateless rate={rate}")
    assert rms(stateless[:n], naive[:n]) < 5e-5

    piece = run_chunked(h, float(rate), x, [1] * len(x), nphi=nphi)
    n = min(len(naive), len(piece))
    assert_close(piece[:n], naive[:n], rtol=1e-3, atol=3e-4,
                 label=f"arb piecewise rate={rate}")


@pytest.mark.parametrize("rate", [0.713, 1.0 + 1e-7, 1.7238754])
def test_arbitrary_exact_vs_sequential_sim(rng, rate):
    """Tight correctness pin: replay the reference's sequential filt! loop
    (Filters.jl:693-742) in numpy with the same fixed-point phase steps and
    demand near-bit equality with the batched kernel."""
    nphi = 32
    h = design_taps(nphi)
    x = rng.standard_normal(200)
    p = mr.make_kernel(h, rate=float(rate), nphi=nphi)
    T = p.taps_per_phi
    pfb = np.asarray(p.pfb, dtype=np.float64)
    dpfb = np.asarray(p.dpfb, dtype=np.float64)
    D = nphi << mr.PHASE_FRAC_BITS
    ONE = 1 << mr.PHASE_FRAC_BITS
    xext = np.concatenate([np.zeros(T - 1), x])
    u, inp = 0, 1
    ys = []
    while inp <= len(x):
        phi = (u % D) >> mr.PHASE_FRAC_BITS
        alpha = (u % ONE) / ONE
        w = xext[inp - 1: inp - 1 + T]
        ys.append(pfb[:, phi] @ w + alpha * (dpfb[:, phi] @ w))
        u_new = u + p.delta_fx
        inp += u_new // D - u // D
        u = u_new
    got = np.asarray(mr.filt(h, x, float(rate), nphi))
    assert len(got) == len(ys)
    assert_close(got, np.asarray(ys), rtol=1e-12, atol=1e-12,
                 label=f"arb exact rate={rate}")


ARB_DTYPE_CASES = [
    (np.float32, np.complex64),     # reference-pinned (runtests.jl:393,412)
    (np.float64, np.complex128),
    (np.float32, np.float64),
]


@pytest.mark.parametrize("th,tx", ARB_DTYPE_CASES)
@pytest.mark.parametrize("polyorder", [None, 4])
def test_arbitrary_farrow_complex_signals(rng, th, tx, polyorder):
    """Complex signals through the arbitrary/Farrow resamplers (the
    reference's randomized sweep runs its arb leg on complex64 signals,
    runtests.jl:393 + 412-419). Exercises the planar re/im routing through
    the accumulator fast paths, plus the chunked==whole invariant."""
    nphi = 32
    h = design_taps(nphi).astype(th)
    if np.issubdtype(tx, np.complexfloating):
        x = (rng.standard_normal(300)
             + 1j * rng.standard_normal(300)).astype(tx)
        x_or = x.astype(np.complex128)
    else:
        x = rng.standard_normal(300).astype(tx)
        x_or = x.astype(np.float64)
    rate = 1.2468013579
    args = (rate, nphi) if polyorder is None else (rate, nphi, polyorder)
    got = np.asarray(mr.filt(h, x, *args))
    assert got.dtype == np.promote_types(th, tx)
    na = naivefilt(h.astype(np.float64), x_or, rate, nphi)
    n = min(len(got), len(na))
    assert abs(len(got) - len(na)) <= 2
    tol = 2e-3 if polyorder is not None else 1e-3
    scale = float(np.abs(na[:n]).max())
    assert np.abs(got[:n] - na[:n]).max() < tol * scale
    # chunked == whole for the complex stream
    chunks = [37] * 8 + [4]
    piece = run_chunked(h, rate, x, chunks,
                        **({} if polyorder is None
                           else {"polyorder": polyorder}))
    assert piece.shape == got.shape
    assert np.abs(piece - got).max() < 1e-5 * scale


def test_arbitrary_complex_taps(rng):
    """Complex taps x real signal through the arbitrary kernel (windows
    path): output must equal the sum of per-part real filterings."""
    nphi = 32
    hr = design_taps(nphi)
    hi = 0.25 * hr[::-1].copy()
    h = (hr + 1j * hi).astype(np.complex128)
    x = rng.standard_normal(200)
    rate = 0.87
    got = np.asarray(mr.filt(h, x, rate, nphi))
    yr = np.asarray(mr.filt(hr, x, rate, nphi))
    yi = np.asarray(mr.filt(hi, x, rate, nphi))
    np.testing.assert_allclose(got, yr + 1j * yi, rtol=1e-10, atol=1e-12)


def test_arbitrary_chunked_invariant(rng):
    """Chunked == whole: the integer fixed-point accumulator makes every
    index decision exactly chunking-invariant (no sample slips, identical
    output lengths — stronger than the reference's float accumulator); float
    values agree to XLA reduction-order noise (~1 ulp)."""
    h = design_taps()
    x = rng.standard_normal(400)
    rate = 0.87654321
    whole = np.asarray(mr.filt(h, x, rate))
    for chunks in ([1] * 400, [7] * 50 + [50], [123, 277]):
        got = run_chunked(h, rate, x, chunks)
        assert got.shape == whole.shape
        assert np.abs(got - whole).max() < 1e-12, f"chunks {chunks[:3]}..."


def test_farrow_tracks_arbitrary(rng):
    """Farrow (polyorder 4) should track the arbitrary kernel closely on
    smooth taps (reference comparison: test/farrowtest.jl:22-29)."""
    h = design_taps()
    x = rng.standard_normal(500)
    for rate in (0.713, 1.7238754):
        ya = np.asarray(mr.filt(h, x, rate, 32))
        yf = np.asarray(mr.filt(h, x, rate, 32, 4))
        n = min(len(ya), len(yf))
        assert rms(yf[:n], ya[:n]) < 2e-3
        # and the polynomial-oracle path: numpy polyval of the fitted bank
        p = mr.make_kernel(h, rate=rate, nphi=32, polyorder=4)
        taps0 = mr.tapsforphase(p, 1.0)
        C = np.asarray(p.coeffs)
        np.testing.assert_allclose(taps0, C.sum(axis=0), atol=1e-9)


def test_farrow_chunked_invariant(rng):
    h = design_taps()
    x = rng.standard_normal(300)
    rate = 1.337
    whole = np.asarray(mr.filt(h, x, rate, 32, 4))
    got = run_chunked(h, rate, x, [1] * 300, polyorder=4)
    assert got.shape == whole.shape
    assert np.abs(got - whole).max() < 1e-12


def test_farrow_oracle_polynomial_evaluation(rng):
    """Close the reference's oracle gap (SURVEY.md section 4): evaluate the
    fitted polynomial taps in numpy and reproduce the kernel output exactly
    for a couple of outputs."""
    h = design_taps()
    rate, nphi, order = 1.3, 32, 4
    x = rng.standard_normal(100)
    p = mr.make_kernel(h, rate=rate, nphi=nphi, polyorder=order)
    from multirate_tpu.ops import indexing as idx
    n_out = int(idx.accum_count(nphi, p.delta_fx, 0, 1, len(x)))
    inp, phi, frac = idx.accum_indices(nphi, p.delta_fx, 0, 1, n_out)
    y = np.asarray(mr.filt(h, x, rate, nphi, order))
    T = p.taps_per_phi
    xext = np.concatenate([np.zeros(T - 1), x])
    C = np.asarray(p.coeffs)
    for n in (0, 5, n_out - 1):
        pv = 1.0 + float(phi[n]) + float(frac[n])
        taps = (pv ** np.arange(order + 1)) @ C
        w = xext[int(inp[n]) - 1: int(inp[n]) - 1 + T]
        np.testing.assert_allclose(y[n], taps @ w, rtol=1e-9, atol=1e-9)


def test_rate_one_identity_phase(rng):
    """rate=1.0 arbitrary resampler: every output lands exactly on phase 0
    with alpha=0, so y[n] == dot(pfb[:, 0], window_n) — the bank's first
    column applied as a plain FIR, with zero derivative-bank contribution."""
    h = design_taps()
    x = rng.standard_normal(64)
    y = np.asarray(mr.filt(h, x, 1.0, 32))
    assert len(y) == 64
    p = mr.make_kernel(h, rate=1.0, nphi=32)
    col0 = np.asarray(p.pfb, np.float64)[:, 0]
    T = p.taps_per_phi
    xext = np.concatenate([np.zeros(T - 1), x])
    want = np.asarray([col0 @ xext[n: n + T] for n in range(64)])
    np.testing.assert_allclose(y, want, rtol=1e-10, atol=1e-12)


def test_invalid_rate():
    with pytest.raises(ValueError):
        mr.FIRArbitrary.create(np.ones(8), -1.0, 32)
    with pytest.raises(ValueError):
        mr.FIRFarrow.create(np.ones(8), 0.0, 32, 4)


def test_farrow_method_oracle(rng):
    """naivefilt_farrow reproduces the Farrow METHOD in float64: the
    windows-path kernel must match it to float32 noise (the bank-interp
    oracle differs by the polynomial fit error, ~1e-3 — comparing against
    it would mask kernel bugs below that level)."""
    from multirate_tpu.utils.oracle import naivefilt_farrow

    h = design_taps().astype(np.float32)
    x = rng.standard_normal(20_000).astype(np.float32)
    ref = naivefilt_farrow(h, x, 0.7321, 32, 4)
    y = np.asarray(mr.filt(h, x, 0.7321, 32, 4, path="windows"))
    n = min(len(ref), len(y))
    num = np.sqrt(np.mean((y[:n] - ref[:n]) ** 2))
    den = np.sqrt(np.mean(ref[:n] ** 2))
    assert num / den < 1e-5


def test_winsel_nonstandard_nphi_falls_back_correct(rng):
    """The fused winsel kernels pack the phase in 5 bits and unpack with
    `& (nphi-1)`, so non-power-of-two or >32 nphi CANNOT run them; the
    geometry gates must route such configs to a correct fallback instead
    of silently corrupting the phase field (found: nphi=24 gave 0.26
    relative RMS before the gate)."""
    import jax.numpy as jnp
    from multirate_tpu.ops import compute

    h = design_taps().astype(np.float32)
    x = rng.standard_normal(30_000).astype(np.float32)
    for nphi in (24, 64):
        p = mr.make_kernel(h, rate=0.7123, nphi=nphi)
        st = mr.init_state(p, (), jnp.float32)
        yw = np.asarray(compute.filt_block_raw(p, st, jnp.asarray(x),
                                               "windows")[0])
        y3 = np.asarray(compute.filt_block_raw(p, st, jnp.asarray(x),
                                               "winsel")[0])
        rel = np.abs(y3 - yw).max() / np.abs(yw).max()
        assert rel < 1e-3, (nphi, rel)
        # batched channels (the chansel dispatch) too
        xb = jnp.asarray(np.stack([x[:10_000]] * 4))
        yw = np.asarray(compute.filt_block_raw(
            p, mr.init_state(p, (4,), jnp.float32), xb, "windows")[0])
        y4 = np.asarray(compute.filt_block_raw(
            p, mr.init_state(p, (4,), jnp.float32), xb, "winsel")[0])
        assert np.abs(y4 - yw).max() / np.abs(yw).max() < 1e-3, nphi
