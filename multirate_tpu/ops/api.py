"""User API: stateless ``filt``, streaming ``FIRFilter``, phase/reset control.

Mirrors the reference's L4 surface (src/Multirate.jl exports; stateless filt
overloads Filters.jl:858-873; FIRFilter wrapper Filters.jl:150-198; setphase
:207-232; reset :244-260) on top of the pure-functional block step.

Functional core (jit-friendly, used by the parallel layer and by power users):

    params = make_kernel(h, ratio=Fraction(147,160))
    state  = init_state(params, batch_shape, x.dtype)
    y_pad, count, state = filt_block(params, state, x_block)   # jittable

``FIRFilter`` wraps that in the reference's mutable-object ergonomics.
"""

from __future__ import annotations

import math
from fractions import Fraction
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import indexing as _idx
from .compute import filt_block_raw
from .params import (
    PHASE_FRAC_BITS, PHASE_ONE,
    FIRStandard, FIRInterpolator, FIRDecimator, FIRRational,
    FIRArbitrary, FIRFarrow, FilterState, init_state, make_kernel,
)

__all__ = [
    "filt", "filt_block", "filt_block_inplace", "filt_block_tm",
    "FIRFilter",
    "setphase", "reset", "tapsforphase",
    "outputlength", "inputlength", "nextphase", "max_outputs",
]

outputlength = _idx.outputlength
inputlength = _idx.inputlength
nextphase = _idx.nextphase
max_outputs = _idx.max_outputs


filt_block = jax.jit(filt_block_raw, static_argnames=("path",))
filt_block.__doc__ = filt_block_raw.__doc__

from .compute import filt_block_tm_raw  # noqa: E402

filt_block_tm = jax.jit(filt_block_tm_raw, static_argnames=("path",))
filt_block_tm.__doc__ = filt_block_tm_raw.__doc__

# Streaming-loop variant: the state pytree is DONATED, so XLA reuses the
# history buffer in place instead of re-allocating it every block
# (SURVEY.md 2.3 donate-argnum buffers). The caller's input state is
# invalidated — only use where the state is threaded linearly (FIRFilter,
# StreamingResampler). Donation is a no-op on CPU.
filt_block_inplace = jax.jit(filt_block_raw, static_argnames=("path",),
                             donate_argnums=(1,))


def filt(h, x, ratio_or_rate=Fraction(1, 1), nphi: int = 32,
         polyorder=None, path: str = "auto"):
    """One-shot stateless filtering / resampling.

    - ``filt(h, x, L_over_M)`` with a Fraction/int/(L, M) tuple: single-rate,
      interpolating, decimating, or rational polyphase resampling
      (reference: Filters.jl:858-861).
    - ``filt(h, x, rate: float, nphi=32)``: arbitrary-rate resampling with
      derivative-bank linear interpolation (Filters.jl:864-867).
    - ``filt(h, x, rate: float, nphi, polyorder)``: Farrow polynomial
      resampling (Filters.jl:870-873).

    ``x`` may have leading channel/batch dims; time is the last axis. The
    output dtype is promote(h.dtype, x.dtype) (reference convention, e.g.
    Filters.jl:476) — EXCEPT for the quantized modes, which emit their
    accumulator dtype (bf16 taps/signal -> float32, int8 -> int32; see
    README "quantized modes" and docs/migration.md): Mosaic's narrowing
    output store costs more than the whole kernel (docs/kernels.md).
    """
    if isinstance(ratio_or_rate, float):
        params = make_kernel(h, rate=ratio_or_rate, nphi=nphi,
                             polyorder=polyorder)
    else:
        params = make_kernel(h, ratio=ratio_or_rate)
    x = jnp.asarray(x)
    state = init_state(params, x.shape[:-1], x.dtype)
    y, count, _ = filt_block(params, state, x, path=path)
    return y[..., : int(count)]


class FIRFilter:
    """Streaming (stateful) filter object, the reference's FIRFilter
    (Filters.jl:150-198) with a pure-functional jitted core.

    Construction dispatch (Filters.jl:158-198):

    - ``FIRFilter(h)`` or ``FIRFilter(h, Fraction(L, M))`` — single-rate /
      interpolator / decimator / rational by the shape of the ratio.
    - ``FIRFilter(h, rate: float, nphi=32)`` — arbitrary-rate resampler.
    - ``FIRFilter(h, rate: float, nphi, polyorder)`` — Farrow resampler.

    ``filt(x)`` consumes a chunk and returns exactly the producible output
    samples; leftover phase/history state is carried so that concatenated
    chunked output equals whole-vector output — index decisions are exactly
    chunking-invariant (int64 fixed point, never a sample slip); float
    values match to XLA reduction-order noise (~1 ulp). This is the
    invariant the reference tests at runtests.jl:72-96.
    """

    def __init__(self, h, ratio_or_rate=Fraction(1, 1), nphi: int = 32,
                 polyorder=None, path: str = "auto"):
        if isinstance(ratio_or_rate, float):
            self.params = make_kernel(h, rate=ratio_or_rate, nphi=nphi,
                                      polyorder=polyorder)
        else:
            self.params = make_kernel(h, ratio=ratio_or_rate)
        self.path = path
        self._state: FilterState | None = None
        # host-int mirror of (phase, deficit): lets filt() slice the output
        # by the exact closed-form count with NO device->host readback per
        # block (int(count) costs a ~25-32 ms RTT on the TPU relay). Kept
        # bit-exactly in lockstep by indexing.host_carry.
        self._hphase: int | None = None
        self._hdeficit: int | None = None

    @property
    def state(self):
        return self._state

    @state.setter
    def state(self, s):
        """External state assignment (checkpoint resume, tests) re-syncs the
        host index mirror — the ONE place a device readback is paid."""
        self._state = s
        if s is None:
            self._hphase = self._hdeficit = None
        else:
            self._hphase = int(s.phase)
            self._hdeficit = int(s.deficit)

    @property
    def kernel(self):
        return self.params

    @property
    def history(self):
        return None if self.state is None else self.state.history

    def _ensure_state(self, x):
        if self.state is None:
            # fresh stream: the initial (phase, deficit) are known statically
            # (init_state: phase 1 rational / 0 accum, deficit 1) — set the
            # host mirror directly, no device readback even at stream start
            self._state = init_state(self.params, x.shape[:-1], x.dtype)
            self._hphase = 1 if isinstance(self.params, FIRRational) else 0
            self._hdeficit = 1
        elif self.state.history.shape[:-1] != x.shape[:-1]:
            # Silently re-initializing would discard carried phase/deficit/
            # history (including a prior setphase) — a silent stream
            # discontinuity. Require an explicit reset.
            raise ValueError(
                f"chunk batch shape {x.shape[:-1]} differs from the live "
                f"stream's {self.state.history.shape[:-1]}; call reset() "
                f"before starting a stream with a new batch shape")
        elif self.state.history.dtype != x.dtype:
            # Keep phase/deficit (e.g. set via setphase before the first
            # chunk); only the history buffer tracks the signal dtype.
            # The host mirror is unchanged — assign _state directly.
            self._state = FilterState(
                history=self.state.history.astype(x.dtype),
                phase=self.state.phase, deficit=self.state.deficit)

    def filt(self, x):
        """Filter a chunk, carrying streaming state across calls.

        The state is threaded linearly, so on accelerators the jitted step
        donates it (history buffers reused in place, no per-block
        re-allocation)."""
        x = jnp.asarray(x)
        self._ensure_state(x)
        fb = filt_block if jax.default_backend() == "cpu" \
            else filt_block_inplace
        # closed-form host count (exact mirror of the device carry): the
        # output slice needs no device sync — assign _state directly so the
        # re-sync readback in the state setter stays off the hot path
        count, self._hphase, self._hdeficit = _idx.host_carry(
            self.params, self._hphase, self._hdeficit, x.shape[-1])
        y, _, self._state = fb(self.params, self._state, x, path=self.path)
        return y[..., :count]

    __call__ = filt

    def reset(self):
        """Zero history and phase state (bug-fixed reference reset,
        Filters.jl:244-260 / SURVEY.md section 2.2 item 2)."""
        if self.state is not None:
            self.state = init_state(
                self.params, self.state.history.shape[:-1],
                self.state.history.dtype)
        return self

    def setphase(self, phi: float):
        if self.state is None:
            self.state = init_state(self.params, (), jnp.float32)
        self.state = setphase(self.params, self.state, phi)
        return self

    def outputlength(self, inlen: int) -> int:
        return _idx.outputlength(self.params, inlen, state=self.state)

    def inputlength(self, outlen: int) -> int:
        return _idx.inputlength(self.params, outlen, state=self.state)


def setphase(params, state: FilterState, phi) -> FilterState:
    """Set the kernel phase; valid input is [0, 1] (Filters.jl:207-232).

    Bug-fixed semantics (the reference's interpolator/rational variant
    references an undefined variable, Filters.jl:212; SURVEY.md 2.2 item 1):

    - interpolator/rational: 1-based phase index = floor(phi * nphi) + 1,
      clamped to [1, nphi].
    - arbitrary: fixed-point accumulator u = phi * nphi (phase position into
      the bank; alpha is the fractional part) — acc = phi*nphi via modf in
      the reference (Filters.jl:216-222).
    - Farrow: u = phi * (nphi - 1) (reference convention phiIdx =
      phi*(nphi-1) + 1, Filters.jl:224-229).
    """
    if not 0.0 <= phi <= 1.0:
        raise ValueError("phase must be in [0, 1]")
    if isinstance(params, (FIRInterpolator, FIRRational)):
        nphi = params.nphi
        p = min(int(math.floor(phi * nphi)) + 1, nphi)
        return FilterState(history=state.history,
                           phase=jnp.asarray(p, jnp.int64),
                           deficit=state.deficit)
    if isinstance(params, FIRArbitrary):
        u = round(phi * params.nphi * PHASE_ONE)
        return FilterState(history=state.history,
                           phase=jnp.asarray(u, jnp.int64),
                           deficit=state.deficit)
    if isinstance(params, FIRFarrow):
        u = round(phi * (params.nphi - 1) * PHASE_ONE)
        return FilterState(history=state.history,
                           phase=jnp.asarray(u, jnp.int64),
                           deficit=state.deficit)
    raise TypeError(f"setphase not supported for {type(params).__name__}")


def reset(filt_or_params, state: FilterState | None = None):
    """Reset to initial state. With a FIRFilter, resets in place; with
    (params, state), returns a fresh state of the same shape/dtype."""
    if isinstance(filt_or_params, FIRFilter):
        return filt_or_params.reset()
    return init_state(filt_or_params, state.history.shape[:-1],
                      state.history.dtype)


def tapsforphase(params, phase: float):
    """Taps for an arbitrary (possibly fractional, 1-based) phase index.

    Arbitrary kernel: pfb[:, p] + alpha * dpfb[:, p] (Filters.jl:677-690);
    Farrow kernel: polynomial evaluation (Filters.jl:764-775).
    """
    if isinstance(params, FIRArbitrary):
        # 1-based bank index: valid phases are [1, nphi + 1] (the right edge
        # is bank nphi advanced by alpha=1). Anything below 1 would index
        # bank 0 -> column -1 via wraparound; raise instead.
        if not 1 <= phase <= params.nphi + 1:
            raise ValueError("phase must be in [1, nphi + 1]")
        alpha, pidx = math.modf(phase)
        pidx = int(pidx)
        if pidx == params.nphi + 1:
            pidx, alpha = params.nphi, 1.0
        return np.asarray(params.pfb[:, pidx - 1]) + alpha * np.asarray(
            params.dpfb[:, pidx - 1])
    if isinstance(params, FIRFarrow):
        if not 0 <= phase <= params.nphi + 1:
            raise ValueError("phase must be in [0, nphi + 1]")
        C = np.asarray(params.coeffs)
        powers = phase ** np.arange(C.shape[0])
        return powers @ C
    raise TypeError(f"tapsforphase not supported for {type(params).__name__}")
