"""int8 quantized filtering with stochastic rounding.

TPU-native quantized mode one step below the bf16 mode: taps and signal
live in HBM as int8 (4x less traffic than f32 — the roofline quadruples),
every contraction runs the MXU's native s8 x s8 -> s32 matmul through the
same generalized banded supercycle machinery as the float paths
(ops/compute.py), and the integer accumulation is EXACT — the streaming
chunked == whole invariant becomes bit-exact, stronger than the float
paths' ~1-ulp bound.

Scale handling follows the usual symmetric-quantization convention:
``y_true ~= y_int32 * (x_scale * tap_scale)``. Output re-quantization for
int8 cascades uses UNBIASED stochastic rounding (E[round(v)] = v), the
rounding mode the TPU supports natively for low-precision training
(pltpu.stochastic_round); the XLA-level dither here is the same math and
fuses into the surrounding elementwise graph on any backend.

The reference has no quantized mode (float only, Filters.jl throughout);
this module is TPU-native added capability mirroring its filt/FIRFilter
API shape (Filters.jl:434-454).

Overflow: |acc| <= T * 128 * 127, so any filter with fewer than ~2^17
taps per output is exact in int32 (validated at construction).
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from .api import filt_block, init_state, make_kernel
from . import indexing as _idx

__all__ = [
    "quantize_taps", "quantize_signal", "stochastic_round_int8",
    "QuantizedFIRFilter", "filt_int8",
]

_INT8_MAX = 127


def quantize_taps(h, scale: float | None = None):
    """(h_q int8, scale): symmetric per-tensor tap quantization.

    ``scale`` defaults to max|h| / 127 (no clipping). Rounding is
    round-to-nearest — taps are quantized ONCE at design time, where the
    deterministic minimum-error rounding beats stochastic (stochastic
    rounding's unbiasedness only pays off when errors accumulate across
    many independent roundings, i.e. on the data path).
    """
    h = np.asarray(h, dtype=np.float64)
    if scale is None:
        m = float(np.max(np.abs(h))) if h.size else 1.0
        scale = (m / _INT8_MAX) if m > 0 else 1.0
    q = np.clip(np.round(h / scale), -_INT8_MAX, _INT8_MAX).astype(np.int8)
    return q, float(scale)


def stochastic_round_int8(v, key):
    """Unbiased stochastic round of float ``v`` to int8: floor(v + u),
    u ~ U[0, 1). E[result] == clip(v) exactly (the TPU-native rounding
    mode for low-precision accumulation; pltpu.stochastic_round is the
    in-kernel equivalent for float targets)."""
    u = jax.random.uniform(key, v.shape, dtype=jnp.float32)
    q = jnp.floor(v.astype(jnp.float32) + u)
    return jnp.clip(q, -_INT8_MAX, _INT8_MAX).astype(jnp.int8)


def quantize_signal(x, scale: float | None = None, key=None):
    """(x_q int8, scale): quantize a signal block.

    With ``key`` given, rounds stochastically (unbiased — the right mode
    for the data path, where round-to-nearest bias correlates with the
    signal and shows up as distortion rather than noise); without, rounds
    to nearest.
    """
    if scale is None:
        m = float(np.max(np.abs(np.asarray(x, np.float64))))
        scale = (m / _INT8_MAX) if m > 0 else 1.0
    v = jnp.asarray(x) / scale
    if key is not None:
        return stochastic_round_int8(v, key), float(scale)
    q = jnp.clip(jnp.round(v), -_INT8_MAX, _INT8_MAX).astype(jnp.int8)
    return q, float(scale)


class QuantizedFIRFilter:
    """Streaming int8 FIR resampler (rational family: standard, L//1,
    1//M, L//M).

    Mirrors FIRFilter's API (ops/api.py, reference Filters.jl:434-454)
    but holds int8 tap banks and int8 history, and each ``filt`` call
    takes an int8 block (use quantize_signal) and returns float32
    ``y = acc_int32 * (x_scale * tap_scale)`` — or int8 when constructed
    with ``out="int8"`` (stochastic re-quantization for cascades, output
    scale ``self.out_scale``).
    """

    def __init__(self, h, ratio, *, x_scale: float, out: str = "f32",
                 out_scale: float | None = None, key=None):
        if isinstance(ratio, tuple):
            ratio = Fraction(*ratio)
        ratio = Fraction(ratio)
        hq, self.tap_scale = quantize_taps(h)
        self.params = make_kernel(hq, ratio=ratio)
        T = int(np.asarray(hq).shape[0])
        # worst-case |acc| = taps_per_output * 128 * 127 must fit int32
        if T * 128 * 127 >= 2 ** 31:
            raise ValueError(f"{T} taps overflows int32 accumulation")
        self.x_scale = float(x_scale)
        self.y_scale = self.x_scale * self.tap_scale
        if out not in ("f32", "int8"):
            raise ValueError("out must be 'f32' or 'int8'")
        self.out = out
        if out == "int8":
            # default output scale: preserve the input's dynamic range
            # through a unity-gain filter
            self.out_scale = float(out_scale if out_scale is not None
                                   else self.x_scale)
            self._key = (key if key is not None
                         else jax.random.PRNGKey(0x5eed))
        self._state = None

    def _ensure_state(self, xq):
        if self._state is None:
            self._state = init_state(self.params, xq.shape[:-1], jnp.int8)
        elif self._state.history.shape[:-1] != xq.shape[:-1]:
            # silently re-initializing would discard carried phase/deficit/
            # history mid-stream (same contract as FIRFilter._ensure_state)
            raise ValueError(
                f"chunk batch shape {xq.shape[:-1]} differs from the live "
                f"stream's {self._state.history.shape[:-1]}; construct a "
                "new QuantizedFIRFilter for a new batch shape")
        return self._state

    def filt(self, xq):
        """One streaming block: int8 in, f32 (or int8) out, trimmed."""
        xq = jnp.asarray(xq)
        if xq.dtype != jnp.int8:
            raise TypeError("QuantizedFIRFilter consumes int8 blocks; "
                            "use quantize_signal")
        st = self._ensure_state(xq)
        acc, count, self._state = filt_block(self.params, st, xq,
                                             path="auto")
        y = acc.astype(jnp.float32) * jnp.float32(self.y_scale)
        y = y[..., : int(count)]
        if self.out == "int8":
            self._key, sub = jax.random.split(self._key)
            return stochastic_round_int8(y / self.out_scale, sub)
        return y


def filt_int8(h, x, ratio, *, key=None):
    """One-shot int8 quantized resample of float ``x``: quantize taps and
    signal to int8, filter with exact int32 accumulation on the MXU, and
    return the dequantized float32 output (plus the quantization scales).

    Returns (y_f32, x_scale, tap_scale).
    """
    xq, sx = quantize_signal(x, key=key)
    f = QuantizedFIRFilter(h, ratio, x_scale=sx)
    return f.filt(xq), sx, f.tap_scale
