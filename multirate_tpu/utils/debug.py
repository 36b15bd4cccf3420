"""Debug / sanitizer utilities.

JAX's functional purity makes data races structurally absent (SURVEY.md
section 5); the remaining risk classes here are kernel bugs and index-math
bugs. This module packages the checks:

- ``interpret_kernels()``: context manager forcing every Pallas kernel into
  interpreter mode — the kernel "sanitizer" (out-of-bounds refs raise
  instead of reading garbage).
- ``check_block(...)``: cross-path differential check of one block — runs
  the fast path AND the universal windows path and compares, plus validates
  the closed-form index vectors against a literal replay of the reference's
  sequential recurrences (Filters.jl:558-568 / :663-673) in exact integer
  arithmetic.
"""

from __future__ import annotations

import contextlib

import numpy as np

from ..ops import indexing as idx
from ..ops.compute import filt_block_raw
from ..ops.params import (
    PHASE_FRAC_BITS, FIRArbitrary, FIRDecimator, FIRFarrow, FIRRational,
)

__all__ = ["interpret_kernels", "check_block", "check_indices"]


@contextlib.contextmanager
def interpret_kernels():
    """Force Pallas kernels into interpreter mode within the context."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def check_indices(params, phase0: int, deficit0: int, xlen: int) -> int:
    """Replay the reference's sequential index recurrence and assert our
    closed-form vectors match exactly. Returns the output count."""
    if isinstance(params, (FIRRational, FIRDecimator)):
        L = getattr(params, "interpolation", 1)
        M = params.decimation
        phi0 = phase0 if isinstance(params, FIRRational) else 1
        n = int(idx.rational_count(L, M, phi0, deficit0, xlen))
        if n:
            inp, phic = idx.rational_indices(L, M, phi0, deficit0, n)
            i, p = deficit0, phi0
            for k in range(n):
                assert int(inp[k]) == i, (k, int(inp[k]), i)
                assert int(phic[k]) == p - 1, (k, int(phic[k]), p)
                i += (p + M - 1) // L
                p += M % L
                if p > L:
                    p -= L
        return n
    if isinstance(params, (FIRArbitrary, FIRFarrow)):
        D = params.nphi << PHASE_FRAC_BITS
        n = int(idx.accum_count(params.nphi, params.delta_fx, phase0,
                                deficit0, xlen))
        if n:
            inp, phic, frac = idx.accum_indices(
                params.nphi, params.delta_fx, phase0, deficit0, n)
            u, i = phase0, deficit0
            for k in range(n):
                assert int(inp[k]) == i
                assert int(phic[k]) == (u % D) >> PHASE_FRAC_BITS
                u2 = u + params.delta_fx
                i += u2 // D - u // D
                u = u2
        return n
    return xlen  # standard / interpolator: trivially arange


def check_block(params, state, x, path: str = "auto",
                rtol: float = 1e-4, atol: float = 1e-5):
    """Run ``path`` and the universal windows path on one block and demand
    elementwise agreement; also validates the index math. Returns the fast
    path's outputs."""
    y, count, st = filt_block_raw(params, state, x, path)
    y_ref, count_ref, _ = filt_block_raw(params, state, x, "windows")
    n = int(count)
    assert n == int(count_ref), f"count mismatch: {n} vs {int(count_ref)}"
    a = np.asarray(y)[..., :n]
    b = np.asarray(y_ref)[..., :n]
    if not np.allclose(a, b, rtol=rtol, atol=atol):
        bad = np.argwhere(~np.isclose(a, b, rtol=rtol, atol=atol))[0]
        raise AssertionError(
            f"path '{path}' diverges from windows at {tuple(bad)}: "
            f"{a[tuple(bad)]} vs {b[tuple(bad)]}")
    check_indices(params, int(state.phase), int(state.deficit), x.shape[-1])
    return y, count, st
