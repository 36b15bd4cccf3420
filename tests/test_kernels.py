"""4-way differential tests for the rational-family kernels, across dtypes
and compute paths (reference methodology: runtests.jl section 4 of SURVEY.md).
"""

from fractions import Fraction

import numpy as np
import pytest

import multirate_tpu as mr
from helpers import four_way, run_chunked, default_rtol
from multirate_tpu.utils.oracle import naivefilt
from multirate_tpu.utils.testing import assert_close

DTYPE_CASES = [
    (np.float64, np.float64),
    (np.float32, np.float32),
    (np.float64, np.complex128),
    (np.float32, np.complex64),
    (np.float32, np.float64),
]


def _mk(rng, th, tx, hlen=33, xlen=260):
    h = rng.standard_normal(hlen).astype(th)
    if np.issubdtype(tx, np.complexfloating):
        x = (rng.standard_normal(xlen) + 1j * rng.standard_normal(xlen)).astype(tx)
    else:
        x = rng.standard_normal(xlen).astype(tx)
    return h, x


@pytest.mark.parametrize("th,tx", DTYPE_CASES)
def test_singlerate(rng, th, tx):
    h, x = _mk(rng, th, tx)
    four_way(h, x, Fraction(1, 1), rng, rtol=default_rtol(th, tx))


@pytest.mark.parametrize("th,tx", DTYPE_CASES[:3])
@pytest.mark.parametrize("M", [2, 4, 9])
def test_decimation(rng, th, tx, M):
    h, x = _mk(rng, th, tx, xlen=260 - 260 % M)
    four_way(h, x, Fraction(1, M), rng, rtol=default_rtol(th, tx))


@pytest.mark.parametrize("th,tx", DTYPE_CASES[:3])
@pytest.mark.parametrize("L", [2, 4, 9])
def test_interpolation(rng, th, tx, L):
    h, x = _mk(rng, th, tx)
    four_way(h, x, Fraction(L, 1), rng, rtol=default_rtol(th, tx))


@pytest.mark.parametrize("th,tx", DTYPE_CASES[:3])
@pytest.mark.parametrize("ratio", [(3, 2), (2, 3), (7, 5), (147, 160)])
def test_rational(rng, th, tx, ratio):
    h, x = _mk(rng, th, tx)
    four_way(h, x, Fraction(*ratio), rng, rtol=default_rtol(th, tx),
             atol=1e-6 if np.promote_types(th, tx).itemsize <= 8 else 0.0)


@pytest.mark.parametrize("ratio", [(1, 1), (4, 1), (1, 4), (7, 5)])
def test_paths_agree(rng, ratio):
    """conv / supercycle fast paths vs the windows reference path."""
    h, x = _mk(rng, np.float64, np.float64)
    r = Fraction(*ratio)
    ys = {p: np.asarray(mr.filt(h, x, r, path=p))
          for p in ("windows", "auto")}
    assert_close(ys["auto"], ys["windows"], rtol=1e-12, atol=1e-12,
                 label=f"paths {ratio}")


def test_long_taps_rational(rng):
    """taps_per_phi > decimation exercises the multi-part overlapped reshape
    in the supercycle matmul."""
    h, x = _mk(rng, np.float64, np.float64, hlen=200, xlen=300)
    four_way(h, x, Fraction(3, 2), rng, rtol=1e-9)
    four_way(h, x, Fraction(2, 5), rng, rtol=1e-9)


def test_short_taps(rng):
    h, x = _mk(rng, np.float64, np.float64, hlen=3, xlen=100)
    four_way(h, x, Fraction(5, 3), rng, rtol=1e-9)


def test_hlen_one(rng):
    """hlen=1 means history_len=0 (empty history buffer)."""
    h = np.asarray([2.0])
    x = rng.standard_normal(50)
    y = np.asarray(mr.filt(h, x))
    np.testing.assert_allclose(y, 2.0 * x, atol=1e-12)
    y = np.asarray(mr.filt(h, x, Fraction(1, 5)))
    np.testing.assert_allclose(y, 2.0 * x[::5], atol=1e-12)


def test_batched_channels(rng):
    """Leading channel dims broadcast through all kernels (TPU-native
    extension: the reference is 1-D only)."""
    h = rng.standard_normal(24)
    x = rng.standard_normal((3, 2, 200))
    for spec in [Fraction(1, 1), Fraction(3, 1), Fraction(1, 2),
                 Fraction(3, 2)]:
        y = np.asarray(mr.filt(h, x, spec))
        for i in range(3):
            for j in range(2):
                yr = np.asarray(mr.filt(h, x[i, j], spec))
                assert_close(y[i, j], yr, rtol=1e-10, label=f"batch {spec}")


def test_bfloat16_quantized_mode(rng):
    """bf16 taps + bf16 signal: the quantized low-bandwidth mode. Outputs
    are f32 ACCUMULATORS (round 4, mirroring int8 -> int32: the MXU
    accumulates in f32 and a bf16 store costs 1.6x the kernel in Mosaic
    relayout — exp43). Output tracks the f64 oracle within bf16 data
    quantization; index decisions stay exactly chunking-invariant."""
    import jax.numpy as jnp
    from multirate_tpu.ops.compute import _auto_path

    h64 = rng.standard_normal(24 * 21)
    x64 = rng.standard_normal(4000)
    for spec in [Fraction(147, 160), Fraction(1, 4), Fraction(4, 1)]:
        want = np.asarray(mr.filt(h64, x64, spec))
        hb = np.asarray(jnp.asarray(h64, jnp.bfloat16))
        p = mr.make_kernel(hb, ratio=spec)
        assert _auto_path(p, jnp.ones(8, jnp.bfloat16)) == "supercycle"
        y = mr.filt(hb, jnp.asarray(x64, jnp.bfloat16), spec)
        assert y.dtype == jnp.float32 and y.shape == want.shape
        got = np.asarray(y, np.float64)
        rel = np.sqrt(np.mean((got - want) ** 2)) / \
            np.sqrt(np.mean(want ** 2))
        assert rel < 3e-2, (spec, rel)
        # chunked == whole: index decisions exactly invariant (shape equal,
        # no sample slips); values to ~1 bf16 ulp (f32 reduction order at
        # mid-phase chunk entries can flip rounding ties)
        f = mr.FIRFilter(hb, spec)
        parts = [np.asarray(f.filt(jnp.asarray(x64[i:i + 997],
                                               jnp.bfloat16)), np.float64)
                 for i in range(0, 4000, 997)]
        yc = np.concatenate(parts)
        assert yc.shape == got.shape
        ulp = np.abs(got).max() * 2.0 ** -7
        assert np.abs(yc - got).max() <= ulp
        # the bf16 grouped Pallas kernel (TPU auto path for rational)
        # matches the XLA supercycle path bit-for-bit in interpret mode
        if spec == Fraction(147, 160):
            yp = np.asarray(mr.filt(hb, jnp.asarray(x64, jnp.bfloat16),
                                    spec, path="pallas"), np.float64)
            assert yp.shape == got.shape
            assert np.abs(yp - got).max() <= ulp


def test_bfloat16_zero_copy_kernel(rng):
    """bf16 quantized mode through the ZERO-COPY kernel (single bf16 K
    stack, S=16 sublane tiles): matches the XLA bf16 supercycle to ~1
    bf16 ulp for all four rational-family geometries, and streaming
    chunked == whole holds through the zc path (deficit slab select +
    16-row history carry)."""
    import jax.numpy as jnp
    from multirate_tpu.ops.compute import _out_dtype, _zc_plan
    from multirate_tpu.ops import indexing as idx

    h64 = rng.standard_normal(24 * 21)
    x64 = rng.standard_normal(120_000)
    xb = jnp.asarray(x64, jnp.bfloat16)
    for spec in [Fraction(147, 160), Fraction(1, 1), Fraction(1, 4),
                 Fraction(4, 1)]:
        hb = np.asarray(jnp.asarray(h64, jnp.bfloat16))
        p = mr.make_kernel(hb, ratio=spec)
        assert p.k_zc_hi is not None and p.k_zc_hi.dtype == jnp.bfloat16
        assert p.k_zc_lo is None
        n_max = idx.max_outputs(p, xb.shape[-1])
        assert _zc_plan(p, xb, _out_dtype(p, xb), n_max) is not None, spec
        st = mr.init_state(p, (), jnp.bfloat16)
        y_zc, c1, _ = mr.filt_block(p, st, xb, path="pallas")
        y_sc, c2, _ = mr.filt_block(p, mr.init_state(p, (), jnp.bfloat16),
                                    xb, path="supercycle")
        assert int(c1) == int(c2)
        a = np.asarray(y_zc)[: int(c1)].astype(np.float64)
        b = np.asarray(y_sc)[: int(c2)].astype(np.float64)
        ulp = np.abs(b).max() * 2.0 ** -7
        assert np.abs(a - b).max() <= ulp, spec
    # streaming: chunked == whole through the zc path (odd chunk size
    # exercises every deficit slab and the sub-row remainder tail)
    spec = Fraction(147, 160)
    p = mr.make_kernel(np.asarray(jnp.asarray(h64, jnp.bfloat16)),
                       ratio=spec)
    st = mr.init_state(p, (), jnp.bfloat16)
    yw, cw, _ = mr.filt_block(p, st, xb, path="pallas")
    yw = np.asarray(yw)[: int(cw)].astype(np.float64)
    st = mr.init_state(p, (), jnp.bfloat16)
    parts = []
    for i in range(0, 120_000, 31_013):
        y, c, st = mr.filt_block(p, st, xb[i:i + 31_013], path="pallas")
        parts.append(np.asarray(y)[: int(c)])
    yc = np.concatenate(parts).astype(np.float64)
    assert len(yc) == len(yw)
    ulp = np.abs(yw).max() * 2.0 ** -7
    assert np.abs(yc - yw).max() <= ulp


def test_complex_taps_planar_fast_path(rng):
    """Complex TAPS route through the supercycle MXU machinery as 2-4 real
    planar applies (not the slow windows gather): pallas/supercycle must
    equal the windows oracle for real and complex signals."""
    for spec in [(1, 1), (3, 1), (1, 4), (3, 2), (147, 160)]:
        h = (rng.standard_normal(48)
             + 1j * rng.standard_normal(48)).astype(np.complex128)
        for tx in (np.float64, np.complex128):
            x = rng.standard_normal(400)
            if tx == np.complex128:
                x = x + 1j * rng.standard_normal(400)
            ref = np.asarray(mr.filt(h, x, Fraction(*spec), path="windows"))
            for p in ("supercycle", "pallas"):
                got = np.asarray(mr.filt(h, x, Fraction(*spec), path=p))
                assert got.shape == ref.shape
                assert_close(got, ref, rtol=1e-9, atol=1e-10,
                             label=f"cx-taps {spec} {tx.__name__} {p}")


def test_oracle_vs_scipy_upfirdn(rng):
    """Independent second implementation of the rational oracle — the
    analogue of the reference validating its naive path against DSP.firfilt
    (runtests.jl:59-65). scipy.signal.upfirdn computes the same
    zero-stuff -> FIR -> downselect pipeline with its own polyphase code."""
    from scipy.signal import upfirdn

    for L, M in [(1, 1), (4, 1), (1, 5), (3, 2), (147, 160)]:
        h = rng.standard_normal(48)
        x = rng.standard_normal(257)
        ours = naivefilt(h, x, Fraction(L, M))
        scipy_full = upfirdn(h, x, up=L, down=M)
        # length conventions differ: upfirdn emits the full convolution
        # tail (but stops stuffing at the last sample), ours is causal-
        # truncated to outputlength; all common outputs must match exactly
        n = min(len(ours), len(scipy_full))
        assert abs(len(ours) - len(scipy_full)) <= (len(h) + L) // M + 1
        np.testing.assert_allclose(ours[:n], scipy_full[:n],
                                   rtol=1e-12, atol=1e-12)


def test_kernels_vs_scipy_upfirdn(rng):
    """The fast kernels directly against scipy's polyphase resampler."""
    from scipy.signal import upfirdn

    for L, M in [(1, 1), (3, 1), (1, 4), (7, 5)]:
        h = rng.standard_normal(33)
        x = rng.standard_normal(240)
        got = np.asarray(mr.filt(h, x, Fraction(L, M)))
        want = upfirdn(h, x, up=L, down=M)
        n = min(len(got), len(want))
        assert abs(len(got) - len(want)) <= (len(h) + L) // M + 1
        assert_close(got[:n], want[:n], rtol=1e-9, atol=1e-11,
                     label=f"upfirdn {L}//{M}")


def test_sweep_random(rng):
    """Scaled-down analogue of the reference's randomized test_all
    (runtests.jl:387-419): interp/decim from {1} + rand(2:32), the full
    Th x Tx dtype matrix (F32/F64 taps; F32/F64/C64/C128 signals), and the
    arbitrary-rate leg (rate = float(ratio) + rand) on F32/C64 signals."""
    taps_dtypes = [np.float32, np.float64]
    sig_dtypes = [np.float32, np.float64, np.complex64, np.complex128]
    interps = [1] + sorted(rng.choice(np.arange(2, 33), 3, replace=False))
    decims = [1] + sorted(rng.choice(np.arange(2, 33), 3, replace=False))
    case = 0
    for L in map(int, interps):
        for M in map(int, decims):
            th = taps_dtypes[case % 2]
            tx = sig_dtypes[case // 2 % 4]
            case += 1
            r = Fraction(L, M)
            hlen = int(rng.integers(16, 129))
            xlen = int(rng.integers(200, 301))
            xlen -= xlen % M
            h = rng.standard_normal(hlen).astype(th)
            if np.issubdtype(tx, np.complexfloating):
                x = (rng.standard_normal(xlen)
                     + 1j * rng.standard_normal(xlen)).astype(tx)
            else:
                x = rng.standard_normal(xlen).astype(tx)
            oracle = naivefilt(h.astype(np.float64),
                               x.astype(np.complex128 if
                                        np.issubdtype(tx, np.complexfloating)
                                        else np.float64), r)
            got = np.asarray(mr.filt(h, x, r))
            out_dt = np.promote_types(th, tx)
            lo_prec = out_dt.itemsize <= (8 if np.issubdtype(
                out_dt, np.complexfloating) else 4)
            assert_close(got, oracle.astype(out_dt),
                         rtol=3e-3 if lo_prec else 1e-9,
                         atol=1e-4 if lo_prec else 1e-10,
                         label=f"sweep {L}//{M} {th.__name__}/{tx.__name__}")
            # reference's arbitrary leg (runtests.jl:412-417): its
            # test_arbitrary designs its OWN smooth Kaiser taps
            # (runtests.jl:330-341) — only the (possibly complex) signal
            # comes from the sweep
            if L == r.numerator and M == r.denominator and L != 1 and M != 1 \
                    and tx in (np.float32, np.complex64):
                from test_arbitrary import design_taps

                # randomize nphi too (incl. non-power-of-two: the fused
                # kernels' 5-bit phase field must hold ANY nphi <= 32)
                nphi = int(rng.choice([16, 24, 31, 32]))
                ha = design_taps(nphi).astype(th)
                rate = float(r) + float(rng.random())
                ya = np.asarray(mr.filt(ha, x, rate, nphi))
                na = naivefilt(ha.astype(np.float64),
                               x.astype(np.complex128 if tx == np.complex64
                                        else np.float64), rate, nphi)
                n = min(len(ya), len(na))
                assert abs(len(ya) - len(na)) <= 2
                err = np.abs(ya[:n] - na[:n].astype(out_dt))
                scale = max(1.0, float(np.abs(na[:n]).max()))
                assert err.max() < 5e-3 * scale, \
                    f"arb leg {L}//{M}+r {tx.__name__}: {err.max()}"
