"""Closed-form index math: the TPU-native replacement for sequential loops.

Every control recurrence in the reference — the rational phase stepper
(Filters.jl:558-568 with nextphase :433-439), the decimator stride
(Filters.jl:613-625), and the arbitrary/Farrow phase accumulators
(Filters.jl:663-673, 780-792) — is affine in the output ordinal ``n``. This
module computes, for a block of outputs, the exact input-index / phase-index /
interpolation-alpha vectors in one shot (int64, exact), plus the output counts
and the carried state for the next block. That removes the sequential
dependency that made the reference single-threaded: any block of outputs — on
one core or sharded across a TPU mesh — is independently computable from
(block start state, output ordinal).

Conventions: input indices are 1-based into the current block (index 1 is the
first sample of the block; the window for input index i is the taps_per_phi
samples of [history, x] ending at x[i]). Phase columns returned here are
0-based. ``u`` accumulators are int64 fixed point with PHASE_FRAC_BITS
fractional bits, u = (reference acc - 1) * 2^FRAC in [0, nphi << FRAC).
"""

from __future__ import annotations

from fractions import Fraction
from typing import Union

import jax.numpy as jnp
import numpy as np

from .params import (
    PHASE_FRAC_BITS, PHASE_ONE,
    FIRStandard, FIRInterpolator, FIRDecimator, FIRRational,
    FIRArbitrary, FIRFarrow,
)

__all__ = [
    "rational_indices", "rational_count", "rational_carry",
    "accum_indices", "accum_count", "accum_carry", "host_carry",
    "nextphase", "outputlength", "inputlength", "max_outputs",
]

_i64 = jnp.int64


# --------------------------------------------------------------------------- #
# Rational family (covers standard L=M=1, interpolator M=1, decimator L=1)
# --------------------------------------------------------------------------- #
# For output ordinal n (0-based) with 1-based entry phase phi0 and entry
# deficit d0, define the total phase t_n = (phi0 - 1) + n*M. Then
#   phase column (0-based):  phi_n = t_n mod L
#   input index (1-based):   in_n  = d0 + t_n div L
# which reproduces the reference recurrence inputIdx += floor((phiIdx+M-1)/L);
# phiIdx = nextphase(phiIdx) (Filters.jl:567-568) in closed form
# (SURVEY.md section 3.1).

def rational_indices(L: int, M: int, phi0, d0, n: int):
    """(in_idx[n] 1-based, phi[n] 0-based) for a block of ``n`` outputs."""
    t = (phi0 - 1) + jnp.arange(n, dtype=_i64) * M
    return d0 + t // L, t % L


def rational_count(L: int, M: int, phi0, d0, xlen):
    """Number of outputs producible from ``xlen`` block samples.

    Matches the reference's outputlength algebra
    ceil((effective_len * L - phi0 + 1) / M) with effective_len =
    xlen - d0 + 1 (Filters.jl:352-357, 371-373), clamped at 0 for blocks
    shorter than the deficit (Filters.jl:543-547).
    """
    c = ((xlen - d0 + 1) * L - phi0) // M + 1
    return jnp.maximum(c, 0)


def rational_carry(L: int, M: int, phi0, d0, xlen):
    """(count, phi0', d0') carried into the next block (Filters.jl:568, 571)."""
    count = rational_count(L, M, phi0, d0, xlen)
    t_end = (phi0 - 1) + count * M
    return count, (t_end % L) + 1, d0 + t_end // L - xlen


# --------------------------------------------------------------------------- #
# Fixed-point accumulator family (FIRArbitrary, FIRFarrow)
# --------------------------------------------------------------------------- #
# u_n = u0 + n * delta_fx;   D = nphi << PHASE_FRAC_BITS
#   input index (1-based):   in_n    = d0 + u_n div D
#   phase column (0-based):  phi_n   = (u_n mod D) >> FRAC
#   alpha:                   alpha_n = (u_n mod 2^FRAC) * 2^-FRAC
#   fractional 1-based phase (Farrow): 1 + (u_n mod D) * 2^-FRAC
# This is the reference update() recurrence (Filters.jl:663-673) in exact
# integer arithmetic: acc += Delta with rollover acc = mod(acc-1, nphi) + 1,
# xIdx += floor((acc-1)/nphi) is, in u = acc-1 coordinates, plain addition
# with div/mod readout — hence exactly parallelizable.
#
# The naive formulations form products like (xlen - d0 + 1) * D, which wrap
# int64 once xlen >= ~2^63 / D (~67M samples at nphi=32) — silently, and via
# parallel/sharded.py the GLOBAL stream offset hits the same wall. All
# products below therefore go through ``_muladd_divmod``: base-2^16 long
# division that never materializes a*b, exact for any int64 operand.

_LIMB_MASK = (1 << 16) - 1
# _muladd_divmod needs (den << 16) and (2^16 * b) to fit in int64 headroom.
ACCUM_OPERAND_BITS = 44


def _muladd_divmod(a, b: int, c, den: int):
    """Exact (q, r) = divmod(a * b + c, den) without ever forming a * b.

    ``a`` and ``c`` may be traced int64 scalars or vectors of either sign;
    ``b`` and ``den`` are static positive python ints < 2^44. Base-2^16
    long division over a's limbs: the largest intermediate is
    (den << 16) + (2^16 - 1) * b < 2^61. The quotient must fit int64
    (true for every stream quantity: counts and indices are < 2^62).
    """
    if not (0 < b < (1 << ACCUM_OPERAND_BITS)
            and 0 < den < (1 << ACCUM_OPERAND_BITS)):
        raise ValueError(
            f"static operands out of range for exact divmod: b={b} den={den}"
            f" (must be in (0, 2^{ACCUM_OPERAND_BITS}))")
    a = jnp.asarray(a, _i64)
    q = (a >> 48) * b // den          # top limb keeps the sign
    r = (a >> 48) * b - q * den
    for shift in (32, 16, 0):
        acc = (r << 16) + ((a >> shift) & _LIMB_MASK) * b
        q = (q << 16) + acc // den
        r = acc % den
    acc = r + c
    return q + acc // den, acc % den


def accum_indices(nphi: int, delta_fx: int, u0, d0, n: int):
    """(in_idx 1-based, phi 0-based, frac in [0,1)) for ``n`` outputs."""
    D = nphi << PHASE_FRAC_BITS
    steps = jnp.arange(n, dtype=_i64)
    q, rem = _muladd_divmod(steps, delta_fx, u0, D)
    phi = rem >> PHASE_FRAC_BITS
    frac = (rem & (PHASE_ONE - 1)).astype(jnp.float64) * (2.0 ** -PHASE_FRAC_BITS)
    return d0 + q, phi, frac


def accum_count(nphi: int, delta_fx: int, u0, d0, xlen):
    """Number of outputs with input index <= xlen (exact, int64)."""
    D = nphi << PHASE_FRAC_BITS
    # ((xlen - d0 + 1) * D - 1 - u0) // delta_fx + 1, overflow-free
    q, _ = _muladd_divmod(xlen - d0 + 1, D, -1 - u0, delta_fx)
    return jnp.maximum(q + 1, 0)


def accum_carry(nphi: int, delta_fx: int, u0, d0, xlen):
    """(count, u0', d0') carried into the next block (Filters.jl:734)."""
    D = nphi << PHASE_FRAC_BITS
    count = accum_count(nphi, delta_fx, u0, d0, xlen)
    # u_end = u0 + count * delta_fx; carry = (u_end % D, d0 + u_end//D - xlen)
    q, r = _muladd_divmod(count, delta_fx, u0, D)
    return count, r, d0 + q - xlen


def host_carry(params, phase: int, deficit: int, xlen: int):
    """Exact host-int mirror of the device count/state update.

    Returns (count, phase', deficit') as plain python ints, reproducing
    BIT-exactly what filt_block's device-side rational_carry/accum_carry
    compute for the same entry state (python ints are arbitrary precision,
    so this is exact for any stream offset). Stream drivers (FIRFilter,
    StreamingResampler) use it to slice outputs WITHOUT a device->host
    readback of the traced count — on the axon TPU relay that readback is
    a ~25-32 ms RTT per block, dwarfing the kernel itself.
    """
    phase, deficit, xlen = int(phase), int(deficit), int(xlen)
    if isinstance(params, FIRStandard):
        return xlen, phase, deficit
    if isinstance(params, FIRInterpolator):
        return params.interpolation * xlen, phase, deficit
    if isinstance(params, FIRDecimator):
        # device path: rational_carry(1, M, 1, deficit, xlen), phase kept
        M = params.decimation
        c = max(((xlen - deficit + 1) - 1) // M + 1, 0)
        t_end = c * M
        return c, phase, deficit + t_end - xlen
    if isinstance(params, FIRRational):
        L, M = params.interpolation, params.decimation
        c = max(((xlen - deficit + 1) * L - phase) // M + 1, 0)
        t_end = (phase - 1) + c * M
        return c, (t_end % L) + 1, deficit + t_end // L - xlen
    if isinstance(params, (FIRArbitrary, FIRFarrow)):
        D = params.nphi << PHASE_FRAC_BITS
        dfx = params.delta_fx
        c = max(((xlen - deficit + 1) * D - 1 - phase) // dfx + 1, 0)
        u_end = phase + c * dfx
        return c, u_end % D, deficit + u_end // D - xlen
    raise TypeError(f"unknown kernel {type(params)}")


# --------------------------------------------------------------------------- #
# Public length algebra (reference parity: Filters.jl:341-439)
# --------------------------------------------------------------------------- #

def nextphase(currentphase: int, ratio) -> int:
    """Next 1-based phase index after one output (Filters.jl:433-439)."""
    ratio = Fraction(*ratio) if isinstance(ratio, tuple) else Fraction(ratio)
    L, M = ratio.numerator, ratio.denominator
    step = M % L
    nxt = currentphase + step
    return nxt - L if nxt > L else nxt


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def outputlength(arg0, inlen=None, initial_phi: int = 1, state=None) -> int:
    """Exact output count for an input length.

    Two call shapes (mirroring Filters.jl:352-385):
    - ``outputlength(inlen, ratio, initial_phi)`` — raw rational algebra:
      ceil((inlen*L - phi + 1)/M).
    - ``outputlength(params, inlen, state=s)`` — per-kernel, accounting for
      the kernel's current deficit/phase (pass the live FilterState; defaults
      to a fresh state).
    """
    if isinstance(arg0, (int, np.integer)):
        # outputlength(inlen, ratio, initial_phi)
        ratio = inlen
        ratio = Fraction(*ratio) if isinstance(ratio, tuple) else Fraction(ratio)
        L, M = ratio.numerator, ratio.denominator
        return _ceil_div(arg0 * L - initial_phi + 1, M)

    params, xlen = arg0, int(inlen)
    if not isinstance(initial_phi, (int, np.integer)):
        raise TypeError(
            "outputlength(params, inlen, ...): the third positional slot is "
            "initial_phi (an int); pass a FilterState as state=... keyword")
    d0 = 1 if state is None else int(state.deficit)
    phi0 = 1 if state is None else int(state.phase)
    if isinstance(params, FIRStandard):
        return xlen
    if isinstance(params, FIRInterpolator):
        return params.interpolation * xlen
    if isinstance(params, FIRDecimator):
        return max(0, _ceil_div((xlen - d0 + 1) - 1 + 1, params.decimation)) \
            if xlen >= d0 else 0
    if isinstance(params, FIRRational):
        L, M = params.interpolation, params.decimation
        return max(0, ((xlen - d0 + 1) * L - phi0) // M + 1)
    if isinstance(params, (FIRArbitrary, FIRFarrow)):
        D = params.nphi << PHASE_FRAC_BITS
        u0 = 0 if state is None else int(state.phase)
        return max(0, ((xlen - d0 + 1) * D - 1 - u0) // params.delta_fx + 1)
    raise TypeError(f"unknown kernel {type(arg0)}")


def inputlength(params, outlen=None, initial_phi: int = 1, state=None) -> int:
    """Minimum input length that produces ``outlen`` outputs.

    Two call shapes (mirroring outputlength's, Filters.jl:395-422):
    - ``inputlength(outlen, ratio, initial_phi)`` — the raw rational
      algebra of Filters.jl:395-400: ceil((outlen*M + phi - 1)/L).
    - ``inputlength(params, outlen, state=s)`` — per-kernel, accounting
      for the kernel's current deficit/phase. The decimator variant fixes
      the reference's bug (it reads nonexistent ``kernel.inputlength``,
      Filters.jl:415 — SURVEY.md section 2.2 item 3) by using the deficit.
    """
    if isinstance(params, (int, np.integer)):
        # inputlength(outlen, ratio, initial_phi)
        ratio = outlen
        ratio = Fraction(*ratio) if isinstance(ratio, tuple) else Fraction(ratio)
        L, M = ratio.numerator, ratio.denominator
        return _ceil_div(params * M + initial_phi - 1, L)

    if not isinstance(initial_phi, (int, np.integer)):
        raise TypeError(
            "inputlength(params, outlen, ...): the third positional slot is "
            "initial_phi (an int); pass a FilterState as state=... keyword")
    d0 = 1 if state is None else int(state.deficit)
    phi0 = 1 if state is None else int(state.phase)

    if isinstance(params, FIRStandard):
        return outlen
    if isinstance(params, FIRInterpolator):
        return _ceil_div(outlen, params.interpolation)
    if isinstance(params, FIRDecimator):
        # count = (xlen - d0) div M + 1  =>  xlen = d0 + (outlen-1)*M
        return d0 + (outlen - 1) * params.decimation
    if isinstance(params, FIRRational):
        # count = ((xlen-d0+1)*L - phi0) div M + 1
        #   =>  xlen = d0 - 1 + ceil(((outlen-1)*M + phi0) / L)
        L, M = params.interpolation, params.decimation
        return d0 - 1 + _ceil_div((outlen - 1) * M + phi0, L)
    if isinstance(params, (FIRArbitrary, FIRFarrow)):
        # Smallest xlen with accum_count >= outlen (exact inverse of
        # accum_count): xlen >= d0 - 1 + ceil((u0 + (outlen-1)*dfx + 1) / D).
        D = params.nphi << PHASE_FRAC_BITS
        u0 = 0 if state is None else int(state.phase)
        return d0 - 1 + _ceil_div(u0 + (outlen - 1) * params.delta_fx + 1, D)
    raise TypeError(f"unknown kernel {type(params)}")


def max_outputs(params, block_len: int) -> int:
    """Static worst-case output count for a ``block_len``-sample block.

    This is the jit-stable buffer size: the actual (traced) count for any
    state is <= this bound. Standard/interpolator are exact; the others
    maximize over deficit=1 and the smallest possible entry phase.
    """
    B = block_len
    if isinstance(params, FIRStandard):
        return B
    if isinstance(params, FIRInterpolator):
        return B * params.interpolation
    if isinstance(params, FIRDecimator):
        return _ceil_div(B, params.decimation)
    if isinstance(params, FIRRational):
        return _ceil_div(B * params.interpolation, params.decimation)
    if isinstance(params, (FIRArbitrary, FIRFarrow)):
        D = params.nphi << PHASE_FRAC_BITS
        return (B * D - 1) // params.delta_fx + 1
    raise TypeError(f"unknown kernel {type(params)}")
