"""Pallas TPU kernel for the rational (L//M) supercycle matmul.

The XLA path (ops/compute.py::_rational_supercycle) materializes the
overlapped input reshape X3 (J, M+T) in HBM — an extra write+read of
~(M+T)/M times the input. This kernel builds each X3 tile **in VMEM** from
two adjacent input blocks (the overlap never touches HBM) and feeds the MXU
directly:

  grid tile j:
    x_a = x[j     * JT*M : (j+1) * JT*M]      (auto-pipelined BlockSpec)
    x_b = x[(j+1) * JT*M : (j+2) * JT*M]      (same array, +1 block)
    X3[jj, u] = concat(x_a, x_b)[jj*M + u]    (static shifted reshapes, VPU)
    y_tile = X3 @ K                            (MXU, K VMEM-resident)

K is the (M+T, L) banded tap matrix: K[u, r] = pfb[u - off_r, p_r] with
off_r/p_r the closed-form per-supercycle input offset and phase column
(see compute.py docstring; reference recurrence Filters.jl:558-568). For a
fresh stream (phase 1, deficit 1) K is static and precomputed on host.

HBM traffic: x read twice (overlap trick) + y written once
= (2 + L/M) * 4 bytes/input vs light speed (1 + L/M) * 4 — about 1.5x
light speed for the 147//160 headline, with zero gather/scatter ops.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rational_supercycle_pallas", "build_k_matrix"]


def build_k_matrix(pfb: np.ndarray, L: int, M: int, phi0: int = 1,
                   origin: int = 0) -> np.ndarray:
    """Host-side banded tap matrix K (U, L), U = M + T + origin.

    Output r of each supercycle reads the window starting at
    off_r = (phi0 - 1 + r*M) // L relative to the supercycle origin; its
    taps are pfb[:, (phi0 - 1 + r*M) mod L]. ``origin`` >= 0 shifts all
    bands (used to fold a deficit offset into K instead of re-slicing x).
    """
    pfb = np.asarray(pfb)
    T = pfb.shape[0]
    U = M + T + origin
    K = np.zeros((U, L), dtype=pfb.dtype)
    for r in range(L):
        t_r = (phi0 - 1) + r * M
        off = t_r // L + origin
        K[off: off + T, r] = pfb[:, t_r % L]
    return K


def _kernel(x_a, x_b, k_ref, o_ref, *, JT: int, M: int, U: int, L: int):
    xcat = jnp.concatenate([x_a[:], x_b[:]], axis=0)  # (2*JT*M,)
    parts = []
    u = 0
    while u < U:
        width = min(M, U - u)
        seg = xcat[u: u + JT * M]
        parts.append(seg.reshape(JT, M)[:, :width])
        u += width
    X3 = jnp.concatenate(parts, axis=1)  # (JT, U)
    y = jnp.dot(X3, k_ref[:], preferred_element_type=X3.dtype)  # (JT, L)
    o_ref[:] = y.reshape(JT * L)


def rational_supercycle_pallas(x, K, L: int, M: int, n_out: int,
                               JT: int = 512, interpret: bool = False):
    """Resample ``x`` (1-D, length multiple of nothing in particular) through
    the banded tap matrix ``K`` ((M+T, L) from build_k_matrix).

    ``x`` must already start at the stream origin (deficit folded in by the
    caller: either sliced off or folded into K via ``origin``). Returns the
    first ``n_out`` outputs.
    """
    U = K.shape[0]
    if U > JT * M:
        raise ValueError(f"tile too small: U={U} > JT*M={JT * M}")
    J_total = -(-n_out // L)
    num_tiles = -(-J_total // JT)
    # pad x so block j+1 exists for the last tile
    need = (num_tiles + 1) * JT * M
    x_pad = jnp.pad(x, (0, max(0, need - x.shape[0])))[:need]

    grid = (num_tiles,)
    out = pl.pallas_call(
        functools.partial(_kernel, JT=JT, M=M, U=U, L=L),
        out_shape=jax.ShapeDtypeStruct((num_tiles * JT * L,), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((JT * M,), lambda j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((JT * M,), lambda j: (j + 1,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, L), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((JT * L,), lambda j: (j,),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_pad, x_pad, K)
    return out[:n_out]
