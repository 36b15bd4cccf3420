"""int8 quantized mode (ops/quant.py).

The reference is float-only; this mode is TPU-native added capability, so
the oracle here is exact host integer math: the int8 supercycle matmul
accumulates in int32 with NO rounding, so device output must equal a
float64 naive convolution over the integer-valued operands EXACTLY, and
chunked streaming must be BIT-exact (stronger than the float paths'
~1-ulp reduction-order bound).
"""

from fractions import Fraction

import numpy as np
import pytest

import multirate_tpu as mr
from multirate_tpu.ops import quant

RATIOS = [Fraction(1, 1), Fraction(1, 4), Fraction(4, 1), Fraction(3, 2),
          Fraction(147, 160)]


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _exact_upfirdn_int(hq, xq, L, M):
    """Exact integer L//M resample oracle: float64 is exact for these
    magnitudes (|acc| < 2^26 << 2^53)."""
    from scipy.signal import upfirdn

    y = upfirdn(hq.astype(np.float64), xq.astype(np.float64), up=L, down=M)
    return y


@pytest.mark.parametrize("ratio", RATIOS)
def test_int8_exact_integer_accumulation(rng, ratio):
    h = np.asarray(mr.firdes(96, 0.2, mr.kaiser, beta=7.0))
    hq, sh = quant.quantize_taps(h)
    x = rng.standard_normal(2000).astype(np.float32) * 0.4
    xq, sx = quant.quantize_signal(x)
    f = quant.QuantizedFIRFilter(h, ratio, x_scale=sx)
    y = np.asarray(f.filt(np.asarray(xq)))
    ref = _exact_upfirdn_int(hq, np.asarray(xq), ratio.numerator,
                             ratio.denominator)
    n = len(y)
    # device acc * (sx*sh) must equal the exact integer oracle scaled —
    # same integers, so equality to float32 rounding of the same product
    np.testing.assert_allclose(
        y, (ref[:n] * (sx * sh)).astype(np.float32), rtol=1e-6, atol=0)


def test_int8_streaming_bit_exact(rng):
    h = np.asarray(mr.firdes(96, 0.2, mr.kaiser, beta=7.0))
    x = rng.standard_normal(3000).astype(np.float32) * 0.4
    xq, sx = quant.quantize_signal(x)
    xq = np.asarray(xq)
    whole = np.asarray(
        quant.QuantizedFIRFilter(h, Fraction(3, 2), x_scale=sx).filt(xq))
    f = quant.QuantizedFIRFilter(h, Fraction(3, 2), x_scale=sx)
    parts = [np.asarray(f.filt(xq[i:i + 701])) for i in range(0, 3000, 701)]
    chunked = np.concatenate(parts)
    n = min(len(chunked), len(whole))
    # integer accumulation: chunked == whole BIT-exact
    assert np.array_equal(chunked[:n], whole[:n])
    assert abs(len(chunked) - len(whole)) <= 1


def test_int8_snr_against_float_reference(rng):
    """End-to-end SNR of the full quantize->filter->dequantize pipeline vs
    the float64 filter: ~6.02*8 - loading headroom => > 35 dB for a
    0.4-sigma Gaussian."""
    h = np.asarray(mr.firdes(147, 0.2, mr.kaiser, beta=7.0))
    x = rng.standard_normal(5000).astype(np.float32) * 0.5
    for ratio in (Fraction(1, 1), Fraction(147, 160)):
        y8, sx, sh = quant.filt_int8(h, x, ratio)
        yf = np.asarray(mr.filt(h.astype(np.float64),
                                x.astype(np.float64), ratio))
        n = min(len(yf), np.asarray(y8).shape[-1])
        err = np.asarray(y8)[:n] - yf[:n]
        snr = 10 * np.log10(np.mean(yf[:n] ** 2)
                            / max(float(np.mean(err ** 2)), 1e-30))
        assert snr > 35, (ratio, snr)


def test_stochastic_round_unbiased_and_bounded(rng):
    import jax

    v = np.linspace(-126.6, 126.6, 1001).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 400)
    import jax.numpy as jnp

    qs = np.stack([np.asarray(quant.stochastic_round_int8(jnp.asarray(v), k))
                   for k in keys])
    # each draw within 1 LSB of v
    assert np.max(np.abs(qs - v[None, :])) <= 1.0
    # unbiased: mean over draws converges to v (std err ~ 0.5/sqrt(400))
    bias = np.abs(qs.mean(axis=0) - v)
    assert bias.max() < 0.12, bias.max()
    # determinism per key
    q2 = np.asarray(quant.stochastic_round_int8(jnp.asarray(v), keys[0]))
    assert np.array_equal(qs[0], q2)


def test_int8_cascade_output(rng):
    """out='int8' re-quantizes with stochastic rounding for cascades."""
    h = np.asarray(mr.firdes(96, 0.2, mr.kaiser, beta=7.0))
    x = rng.standard_normal(2000).astype(np.float32) * 0.4
    xq, sx = quant.quantize_signal(x)
    f = quant.QuantizedFIRFilter(h, Fraction(1, 1), x_scale=sx, out="int8")
    yq = np.asarray(f.filt(np.asarray(xq)))
    assert yq.dtype == np.int8
    yf = np.asarray(mr.filt(h.astype(np.float64), x.astype(np.float64),
                            Fraction(1, 1)))
    n = len(yq)
    err = yq[:n] * f.out_scale - yf[:n]
    snr = 10 * np.log10(np.mean(yf[:n] ** 2)
                        / max(float(np.mean(err ** 2)), 1e-30))
    assert snr > 30, snr


def test_quantize_signal_stochastic_path(rng):
    import jax

    x = rng.standard_normal(512).astype(np.float32)
    q1, s1 = quant.quantize_signal(x, key=jax.random.PRNGKey(1))
    q2, s2 = quant.quantize_signal(x)
    assert s1 == s2
    # stochastic and nearest agree within 1 LSB everywhere
    assert np.max(np.abs(q1.astype(np.int32) - q2.astype(np.int32))) <= 1


def test_int8_zero_copy_kernel_bit_exact(rng):
    """int8 through the ZERO-COPY kernel (int8 K stack, S=32 tiles,
    s8 x s8 -> s32 MXU pass): integer accumulation is order-independent,
    so zc must equal the XLA supercycle BIT-exactly for every geometry,
    and chunked streaming == whole bit-exactly through the zc path."""
    import jax.numpy as jnp

    h = np.asarray(mr.firdes(24 * 21, 0.5 / 21, mr.kaiser, beta=7.0) * 21,
                   np.float32)
    x = rng.standard_normal(150_000).astype(np.float32)
    hq, _ = quant.quantize_taps(h)
    xq, _ = quant.quantize_signal(x)
    for ratio in [Fraction(147, 160), Fraction(1, 1), Fraction(1, 4),
                  Fraction(4, 1)]:
        p = mr.make_kernel(hq, ratio=ratio)
        assert p.k_zc_hi is not None and p.k_zc_hi.dtype == jnp.int8
        assert p.k_zc_lo is None
        y1, c1, _ = mr.filt_block(p, mr.init_state(p, (), jnp.int8), xq,
                                  path="pallas")
        y2, c2, _ = mr.filt_block(p, mr.init_state(p, (), jnp.int8), xq,
                                  path="supercycle")
        assert int(c1) == int(c2)
        a = np.asarray(y1)[: int(c1)]
        b = np.asarray(y2)[: int(c2)]
        assert a.dtype == np.int32 and np.array_equal(a, b), ratio
    from multirate_tpu.ops import indexing as idx
    from multirate_tpu.ops.compute import _out_dtype, _zc_plan

    p = mr.make_kernel(hq, ratio=Fraction(147, 160))
    st = mr.init_state(p, (), jnp.int8)
    assert _zc_plan(p, xq, _out_dtype(p, xq),
                    idx.max_outputs(p, xq.shape[-1])) is not None
    yw, cw, _ = mr.filt_block(p, st, xq, path="pallas")
    yw = np.asarray(yw)[: int(cw)]
    st = mr.init_state(p, (), jnp.int8)
    parts = []
    # chunk large enough that every chunk gets a zc plan at S=32 (a
    # too-small chunk silently falls back to the supercycle and the
    # streaming entry-state/deficit-slab path would go untested)
    for i in range(0, 150_000, 75_000):
        xc = xq[i:i + 75_000]
        assert _zc_plan(p, xc, _out_dtype(p, xc),
                        idx.max_outputs(p, xc.shape[-1])) is not None
        y, c, st = mr.filt_block(p, st, xc, path="pallas")
        parts.append(np.asarray(y)[: int(c)])
    assert np.array_equal(np.concatenate(parts), yw)


def test_store_dtype_bf16_outputs(rng):
    """Narrow-output mode (make_kernel store_dtype=bf16): full-precision
    compute, bf16 stores — output error is bf16 rounding (~4e-3 max rel),
    dtype honored on every path, chunked == whole to the same grade
    (VERDICT r5 item 4: quartering/halving write bytes is the structural
    way past the interpolator's write-dominated byte budget)."""
    import jax.numpy as jnp
    from fractions import Fraction

    h = np.asarray(mr.firdes(147, 0.2, mr.kaiser, beta=7.0), np.float32)
    x = rng.standard_normal(20000).astype(np.float32)
    for spec in (Fraction(4, 1), Fraction(147, 160)):
        p = mr.make_kernel(h, ratio=spec, store_dtype=jnp.bfloat16)
        pref = mr.make_kernel(h, ratio=spec)
        st = mr.init_state(p, (), np.float32)
        ref, cr, _ = mr.filt_block(pref, st, x)
        n = int(cr)
        for path in ("windows", "supercycle", "pallas"):
            y, c, _ = mr.filt_block(p, st, x, path=path)
            assert y.dtype == jnp.bfloat16
            rel = (np.abs(np.asarray(y[:n], np.float64)
                          - np.asarray(ref[:n], np.float64)).max()
                   / np.abs(np.asarray(ref)).max())
            assert rel < 2e-2, (spec, path, rel)
    # arb/Farrow reject the flag
    with pytest.raises(ValueError):
        mr.make_kernel(h, rate=1.3, store_dtype=jnp.bfloat16)
