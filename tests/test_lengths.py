"""Length algebra and phase-stepper tests (reference: Filters.jl:341-439,
runtests.jl:423-438)."""

from fractions import Fraction

import numpy as np
import pytest

import multirate_tpu as mr
from multirate_tpu.ops import indexing as idx


def test_nextphase_against_zero_stuff_derivation():
    # The reference derives the expected phase sequence by zero-stuffing and
    # downselecting (runtests.jl:423-438).
    for L in range(1, 9):
        for M in range(1, 9):
            r = Fraction(L, M)
            L_, M_ = r.numerator, r.denominator
            seq = np.tile(np.arange(1, L_ + 1), M_)[::M_]
            got = [1]
            for _ in range(1, L_):
                got.append(mr.nextphase(got[-1], r))
            np.testing.assert_array_equal(seq[: len(got)], got)


def brute_force_count(L, M, phi0, d0, xlen):
    """Simulate the reference's sequential loop (Filters.jl:558-568)."""
    n = 0
    inp = d0
    phi = phi0
    while inp <= xlen:
        n += 1
        inp += (phi + M - 1) // L
        phi = phi + (M % L)
        if phi > L:
            phi -= L
    return n, phi, inp - xlen


@pytest.mark.parametrize("L,M", [(1, 1), (3, 1), (1, 4), (3, 2), (7, 5),
                                 (147, 160)])
def test_rational_count_and_carry_match_loop(L, M):
    for phi0 in (1, (L + 1) // 2, L):
        for d0 in (1, 2, min(M, 3)):
            for xlen in (0, 1, 5, 37, 256):
                want = brute_force_count(L, M, phi0, d0, xlen)
                cnt, phi1, d1 = idx.rational_carry(L, M, phi0, d0, xlen)
                if want[0] == 0:
                    assert int(cnt) == 0
                    assert int(d1) == d0 - xlen
                else:
                    assert (int(cnt), int(phi1), int(d1)) == want


@pytest.mark.parametrize("L,M", [(3, 2), (7, 5), (147, 160)])
def test_rational_indices_match_loop(L, M):
    phi0, d0, xlen = 1, 1, 300
    inp, phi = idx.rational_indices(L, M, phi0, d0, 50)
    sim_in, sim_phi = [], []
    i, p = d0, phi0
    for _ in range(50):
        sim_in.append(i)
        sim_phi.append(p - 1)
        i += (p + M - 1) // L
        p = mr.nextphase(p, Fraction(L, M))
    np.testing.assert_array_equal(np.asarray(inp), sim_in)
    np.testing.assert_array_equal(np.asarray(phi), sim_phi)


def brute_force_accum(nphi, delta_fx, u0, d0, xlen, nmax=10000):
    """Simulate the reference's update() loop (Filters.jl:663-673) in exact
    fixed-point arithmetic."""
    D = nphi << mr.PHASE_FRAC_BITS
    out = []
    u, inp = u0, d0
    while inp <= xlen and len(out) < nmax:
        out.append((inp, u % D))
        u += delta_fx
        inp += (u - u % D) // D - (u - delta_fx - (u - delta_fx) % D) // D
    return out, u % D, inp - xlen


@pytest.mark.parametrize("rate", [0.3, 0.99999, 1.0, 1.5, 2.7182818])
def test_accum_indices_match_loop(rate):
    nphi = 32
    k = mr.FIRArbitrary.create(np.ones(64), rate, nphi)
    for u0 in (0, 123456789, (nphi << mr.PHASE_FRAC_BITS) - 1):
        for d0 in (1, 3):
            xlen = 40
            sim, u_end, d_end = brute_force_accum(nphi, k.delta_fx, u0, d0, xlen)
            cnt, u1, d1 = idx.accum_carry(nphi, k.delta_fx, u0, d0, xlen)
            assert int(cnt) == len(sim)
            assert int(u1) == u_end and int(d1) == d_end
            if sim:
                inp, phi, frac = idx.accum_indices(nphi, k.delta_fx, u0, d0,
                                                   len(sim))
                D1 = 1 << mr.PHASE_FRAC_BITS
                for n, (si, su) in enumerate(sim):
                    assert int(inp[n]) == si
                    assert int(phi[n]) == su >> mr.PHASE_FRAC_BITS
                    assert float(frac[n]) == (su % D1) / D1


@pytest.mark.parametrize("rate", [0.4709, 0.99999, 1.0, 3.99])
def test_accum_math_exact_beyond_int64_products(rate):
    """Regression for the int64 wrap at xlen >= ~2^63/D (~67M at nphi=32):
    (xlen+1)*D overflowed and silently returned count=0. The long-division
    formulation must match Python-bigint ground truth for any stream length
    or global offset (parallel/sharded.py feeds GLOBAL offsets here)."""
    nphi = 32
    k = mr.FIRArbitrary.create(np.ones(64), rate, nphi)
    delta, D = k.delta_fx, nphi << mr.PHASE_FRAC_BITS
    for xlen in (70_000_000, 2**31, 10**12, 10**15, 3):
        for u0 in (0, D - 1, 987654321):
            for d0 in (1, 2, -5):
                A = xlen - d0 + 1
                want_cnt = max(0, (A * D - 1 - u0) // delta + 1)  # bigint
                cnt, u1, d1 = idx.accum_carry(nphi, delta, u0, d0, xlen)
                assert int(cnt) == want_cnt
                u_end = u0 + want_cnt * delta
                assert int(u1) == u_end % D
                assert int(d1) == d0 + u_end // D - xlen


def test_muladd_divmod_matches_bigints():
    rng = np.random.default_rng(7)
    for b, den in [(137438953471, 8796093022208 - 3), (1, 1),
                   (2**43, 2**43 + 9), (12345, 678)]:
        a_vals = np.concatenate([
            rng.integers(-2**62 // b, 2**62 // b, 16),
            np.asarray([0, 1, -1, 2**40, -(2**40)])])
        c_vals = [0, -1, den - 1, -(den - 1)]
        for c in c_vals:
            q, r = idx._muladd_divmod(np.asarray(a_vals, np.int64), b, c, den)
            for av, qv, rv in zip(a_vals, np.asarray(q), np.asarray(r)):
                want_q, want_r = divmod(int(av) * b + c, den)
                assert (int(qv), int(rv)) == (want_q, want_r), (av, b, c, den)


def test_outputlength_inputlength_roundtrip():
    rng = np.random.default_rng(0)
    h = rng.standard_normal(64)
    for spec in [Fraction(1, 1), Fraction(4, 1), Fraction(1, 4),
                 Fraction(147, 160), 1.7, (1.7, 32, 3)]:
        if isinstance(spec, tuple):
            p = mr.make_kernel(h, rate=spec[0], nphi=spec[1], polyorder=spec[2])
        elif isinstance(spec, float):
            p = mr.make_kernel(h, rate=spec)
        else:
            p = mr.make_kernel(h, ratio=spec)
        for outlen in (1, 10, 313):
            need = mr.inputlength(p, outlen)
            assert mr.outputlength(p, need) >= outlen
            if need > 1:
                assert mr.outputlength(p, need - 1) < outlen


def test_outputlength_matches_actual_counts():
    rng = np.random.default_rng(1)
    h = rng.standard_normal(48)
    x = rng.standard_normal(200)
    for spec, expect_exact in [(Fraction(1, 1), True), (Fraction(5, 1), True),
                               (Fraction(1, 3), True), (Fraction(7, 3), True)]:
        p = mr.make_kernel(h, ratio=spec)
        y = mr.filt(h, x, spec)
        assert y.shape[-1] == mr.outputlength(p, 200)


def test_raw_outputlength_formula():
    # ceil((inlen*L - phi + 1)/M) — Filters.jl:352-357
    assert mr.outputlength(100, Fraction(3, 2), 1) == 150
    assert mr.outputlength(100, Fraction(3, 2), 3) == 149


def test_raw_inputlength_formula():
    # ceil((outlen*M + phi - 1)/L) — Filters.jl:395-400, symmetric with
    # the raw outputlength overload
    assert mr.inputlength(150, Fraction(3, 2), 1) == 100
    assert mr.inputlength(149, Fraction(3, 2), 3) == 100
    # roundtrip with the raw outputlength: inlen samples at (ratio, phi)
    # always produce >= the outlen the raw inverse was asked for
    for L, M in [(3, 2), (1, 4), (7, 5), (147, 160)]:
        r = Fraction(L, M)
        for phi in (1, 2, min(L, 3)):
            for outlen in (1, 7, 150, 44100):
                need = mr.inputlength(outlen, r, phi)
                assert mr.outputlength(need, r, phi) >= outlen


def test_max_outputs_bounds_actual():
    rng = np.random.default_rng(2)
    h = rng.standard_normal(32)
    for spec in [Fraction(1, 1), Fraction(3, 1), Fraction(1, 4),
                 Fraction(7, 5)]:
        p = mr.make_kernel(h, ratio=spec)
        assert mr.filt(h, rng.standard_normal(101), spec).shape[-1] <= \
            mr.max_outputs(p, 101)
    p = mr.make_kernel(h, rate=1.9)
    assert mr.filt(h, rng.standard_normal(101), 1.9).shape[-1] <= \
        mr.max_outputs(p, 101)


def test_length_overload_dispatch_guards():
    # numpy-integer outlens/inlens must hit the raw overload (ADVICE r4:
    # isinstance(params, int) rejected np.int64)
    r = Fraction(3, 2)
    assert mr.inputlength(np.int64(150), r, 1) == mr.inputlength(150, r, 1)
    assert mr.outputlength(np.int64(100), r, 1) == mr.outputlength(100, r, 1)
    # a FilterState passed positionally in the initial_phi slot must raise,
    # not silently compute the state=None answer
    h = np.arange(8.0)
    p = mr.make_kernel(h, ratio=r)
    st = mr.init_state(p, (), np.float32)
    with pytest.raises(TypeError):
        mr.inputlength(p, 10, st)
    with pytest.raises(TypeError):
        mr.outputlength(p, 10, st)
    # keyword form stays valid
    assert mr.inputlength(p, 10, state=st) == mr.inputlength(p, 10)
