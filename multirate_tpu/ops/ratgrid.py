"""Rational-grid (convergent) formulation of the Farrow resampler.

The arbitrary-rate kernels' irregularity comes from the fractional input
stride delta/nphi. But the *exact* fixed-point stride delta_fx / D is
rational, and its continued-fraction convergent M'/L' approximates it so
well that over millions of outputs the true window start

    start_n = (u_n) div D,   n = jj*L' + r

differs from the rational grid jj*M' + s_r (s_r = (r*delta_fx) div D) by a
bounded small integer b_n: the residue eps = L'*delta_fx - M'*D satisfies
|eps| < D/L' (convergent property), so drift accumulates at < 1/L'^2
window slots per output.

The Farrow taps are polynomial in the continuous phase (no floor()), so
the whole resample becomes ONE static banded matmul

    G (JJ, n_b*(P+1)*L') = X3 (JJ, U) @ K
    K[u, (b, p, r)] = coeffs[p, u - (s_r - s_0 + b - b_min)]

followed by purely elementwise math: G reshaped to (outputs, n_b, P+1) is
already in exact output order (output n = jj*L' + r IS row jj, column r),
and y_n = sum_p psi_n^p * G[n, b_idx_n, p] with psi/b closed-form vectors.
No gathers, no scatters, no dynamic shapes — MXU + VPU only.

(The FIRArbitrary kernel's floor-based bank indexing does not linearize
this way — its phase column drifts with the stream offset — so for top TPU
speed at arbitrary rates use FIRFarrow; it is exact to its own reference
semantics, Filters.jl:123-147.)

The plan (convergent, drift window, banded K) is built once at kernel
construction for blocks up to N_CAP outputs and stored in the params
pytree; larger blocks fall back to other paths.
"""

from __future__ import annotations

from fractions import Fraction
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .params import PHASE_FRAC_BITS

__all__ = ["build_ratgrid_plan", "farrow_ratgrid_apply", "RatgridMeta",
           "N_CAP"]


class RatgridMeta(NamedTuple):
    """Static rational-grid plan header (hashable: lives in the params
    pytree's static fields)."""

    L2: int
    M2: int
    eps: int
    b_min: int
    n_b: int
    U: int
    P1: int
    T: int
    n_cap: int

N_CAP = 1 << 24        # absolute bound on outputs per block for any plan
_DRIFT_SLOTS = 4       # drift budget (window slots) => n_b <= 6
_MIN_CAP = 1 << 16     # plans valid for fewer outputs aren't worth having


def build_ratgrid_plan(coeffs: np.ndarray, nphi: int, delta_fx: int):
    """(meta, K) for the rational-grid Farrow path, or (None, None).

    meta = RatgridMeta (python ints, static params field); K is the dense banded matrix (float64; cast to the
    compute dtype at apply time).
    ``n_cap`` is the per-block output-count bound that keeps the drift
    within the built variant window (rate-adaptive: better convergents
    drift slower and support bigger blocks).
    """
    D = nphi << PHASE_FRAC_BITS
    conv = Fraction(delta_fx, D).limit_denominator(512)
    M2, L2 = conv.numerator, conv.denominator
    if M2 == 0:
        return None, None
    eps = L2 * delta_fx - M2 * D
    if eps == 0:
        n_cap = N_CAP
    else:
        jj_cap = (_DRIFT_SLOTS * D) // abs(eps)
        n_cap = min(N_CAP, jj_cap * L2)
    if n_cap < _MIN_CAP:
        return None, None
    jj_cap = n_cap // L2 + 1
    drift_lo = min(0, eps * jj_cap)
    drift_hi = max(0, eps * jj_cap)
    b_min = drift_lo // D                     # b = (u0r + fr + jj*eps) div D
    b_max = (2 * (D - 1) + drift_hi) // D
    n_b = int(b_max - b_min) + 1

    C = np.asarray(coeffs)                    # (P+1, T)
    C = C.astype(np.complex128 if np.iscomplexobj(C) else np.float64)
    P1, T = C.shape
    s_r = [(r * delta_fx) // D for r in range(L2)]
    U = int(M2 + T + (b_max - b_min))
    # column order (b, p, r) with r fastest: the apply reduces G with
    # CONTIGUOUS lane slices G[:, k*L2:(k+1)*L2] per (b, p) block — a
    # trailing (n_b, P1) axis pair would pad to the (8, 128) TPU tile and
    # inflate G's HBM traffic ~18x (measured: the old (r, b, p) order +
    # 3-operand einsum ran at 131 Msps, below even the winsel kernel).
    K = np.zeros((U, n_b * P1 * L2), dtype=C.dtype)
    for r in range(L2):
        for bi in range(n_b):
            for p in range(P1):
                off = int(s_r[r] + bi)        # s_0 == 0; bi = b - b_min
                K[off: off + T, (bi * P1 + p) * L2 + r] = C[p]
    meta = RatgridMeta(L2, M2, int(eps), int(b_min), n_b, U, P1, T,
                       int(n_cap))
    return meta, K


def farrow_ratgrid_apply(meta, K, nphi: int, delta_fx: int, xext, u0, d0,
                         n_max: int, dt):
    """Execute the plan on one block. xext = [history, x]; u0/d0 traced."""
    from .compute import _shift_origin

    L2, M2, eps, b_min, n_b, U, P1, T, _ = meta
    D = nphi << PHASE_FRAC_BITS
    JJ = n_max // L2 + 1

    # jj/r/s_r via 2-D iota + a static table — integer division by L2 is
    # emulated int64 on TPU and measurably slow at vector length. All the
    # per-output vectors stay on the (JJ, L2) grid: row jj, lane r is
    # output n = jj*L2 + r, exactly G's natural layout.
    jj = jax.lax.broadcasted_iota(jnp.int64, (JJ, L2), 0)
    r = jax.lax.broadcasted_iota(jnp.int64, (JJ, L2), 1)
    n = jj * L2 + r
    u = u0 + n * delta_fx
    start = u // D                              # D is a power of two: shift
    # psi in the compute dtype with NO float64 intermediate (f64 mults are
    # software-emulated on TPU): split the fractional fix-point into two
    # int32-exact halves and convert each on the hardware path.
    frac = u % D                                # < nphi << 32
    f_hi = (frac >> jnp.int64(16)).astype(jnp.int32).astype(dt)
    f_lo = (frac & jnp.int64(0xFFFF)).astype(jnp.int32).astype(dt)
    psi = (jnp.asarray(1.0, dt)
           + f_hi * jnp.asarray(2.0 ** (16 - PHASE_FRAC_BITS), dt)
           + f_lo * jnp.asarray(2.0 ** -PHASE_FRAC_BITS, dt))
    s_r_tab = jnp.asarray([(rr * delta_fx) // D for rr in range(L2)],
                          dtype=jnp.int64)
    b_idx = jnp.clip(start - (jj * M2 + s_r_tab[None, :]) - b_min,
                     0, n_b - 1).astype(jnp.int32)

    # X3[jj, uu] = xq[jj*M2 + uu], xq = xext re-origined at
    # (d0 - 1) + b_min  (bands in K already include s_r and b - b_min).
    left = max(0, -b_min)                     # static
    xq = jnp.pad(xext, [(0, 0)] * (xext.ndim - 1) + [(left, 0)])
    max_shift = int(delta_fx // D) + 3 + left
    xq = _shift_origin(xq, d0 + b_min + left, max_shift)
    k_parts = -(-U // M2)
    need = (JJ + k_parts - 1) * M2
    pad = max(0, need - xq.shape[-1])
    xs = jnp.pad(xq, [(0, 0)] * (xq.ndim - 1) + [(0, pad)])[..., :need]
    lead = xs.shape[:-1]
    parts = [
        xs[..., i * M2: i * M2 + JJ * M2].reshape(*lead, JJ, M2)
        for i in range(k_parts)
    ]
    X3 = jnp.concatenate(parts, axis=-1)[..., :U]

    G = jnp.einsum("...ju,uc->...jc", X3.astype(dt), K.astype(dt),
                   precision=jax.lax.Precision.HIGH)

    # Reduce with n_b*P1 CONTIGUOUS (JJ, L2) lane slices of G: Horner in
    # psi per drift band, then a band-select sum. Pure VPU elementwise on
    # the natural grid — no one-hot matmul, no padded (n, n_b, P1) tiles.
    y = None
    for bi in range(n_b):
        acc = G[..., (bi * P1 + P1 - 1) * L2: (bi * P1 + P1) * L2]
        for p in range(P1 - 2, -1, -1):
            acc = acc * psi + G[..., (bi * P1 + p) * L2:
                                (bi * P1 + p + 1) * L2]
        term = jnp.where(b_idx == jnp.int32(bi), acc, jnp.asarray(0, dt))
        y = term if y is None else y + term
    return y.reshape(*lead, JJ * L2)[..., :n_max]
