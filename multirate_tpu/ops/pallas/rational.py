"""Pallas TPU kernel for the rational (L//M) supercycle matmul.

The XLA path (ops/compute.py::_rational_supercycle) materializes the
overlapped input reshape X3 (J, M+T) in HBM — an extra write+read of
~(M+T)/M times the input. This kernel builds each X3 tile **in VMEM** from
two adjacent input blocks (the overlap never touches HBM) and feeds the MXU
directly.

Layout trick for Mosaic: the input is passed as a 2-D (rows, M) view (a free
HBM reshape), so each grid step receives (JT, M) and (JT, M)+1 blocks, and
the overlapped window matrix is assembled from *row slices* only:

  X3[j, i*M + m] = x[(j + i)*M + m] = xcat[j + i, m]
  => X3 = concat([xcat[i : i + JT, :] for i in range(ceil(U/M))], axis=1)[:, :U]

then y_tile = X3 @ K on the MXU, with the banded tap matrix K VMEM-resident.
K[u, r] = pfb[u - off_r, p_r] encodes the closed-form per-supercycle offsets
off_r = (phi0-1+r*M)//L and phase columns p_r = (phi0-1+r*M) mod L (reference
recurrence Filters.jl:558-568). For a fresh stream (phase 1, deficit 1) K is
static and precomputed on host at kernel-construction time.

HBM traffic: x read twice (overlap trick) + y written once
= (2 + L/M)*4 bytes/input vs light-speed (1 + L/M)*4 — ~1.5x light speed for
the 147//160 headline, with zero gather/scatter ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rational_supercycle_pallas", "build_k_matrix"]


def build_k_matrix(pfb: np.ndarray, L: int, M: int, phi0: int = 1,
                   origin: int = 0, group: int = 1) -> np.ndarray:
    """Host-side banded tap matrix K (group*M + T + origin, group*L).

    Generalized supercycle decomposition: a "row" covers ``group``
    supercycles = group*M inputs producing group*L outputs. Output column
    c = r_g*L + r reads the window starting (relative to the row origin) at
    off_c = r_g*M + (phi0 - 1 + r*M) // L with taps
    pfb[:, (phi0 - 1 + r*M) mod L]. ``origin`` >= 0 shifts all bands (used
    to fold a deficit offset into K instead of re-slicing x).

    With group > 1 this turns even degenerate ratios into wide MXU matmuls:
    standard FIR is (L, M) = (1, 1) with group ~128 columns; a 1//M
    decimator is (1, M); an L//1 interpolator is (L, 1). The rational
    recurrence itself is Filters.jl:558-568 in closed form.
    """
    pfb = np.asarray(pfb)
    T = pfb.shape[0]
    U = group * M + T + origin
    K = np.zeros((U, group * L), dtype=pfb.dtype)
    for c in range(group * L):
        r_g, r = divmod(c, L)
        t_r = (phi0 - 1) + r * M
        off = r_g * M + t_r // L + origin
        K[off: off + T, c] = pfb[:, t_r % L]
    return K


def _kernel(x_a, x_b, k_ref, o_ref, *, JT: int, M: int, U: int, L: int):
    # y[j] = sum_u x[j*M + u] * K[u, :]  decomposed into per-part matmuls
    # (Mosaic dislikes lane-axis concatenation, so X3 is never formed):
    #   y = sum_i xcat[i : i + JT, :w_i] @ K[i*M : i*M + w_i, :]
    # x_b is only the tiny (JT2-row) head of the NEXT tile's block — the
    # U-sample overlap — so each input row is fetched ~once, not twice.
    xcat = jnp.concatenate([x_a[:], x_b[:]], axis=0)       # (JT+JT2, M)
    acc = jnp.zeros((JT, L), dtype=x_a.dtype)
    u = 0
    i = 0
    while u < U:
        width = min(M, U - u)
        acc = acc + jnp.dot(xcat[i: i + JT, :width],
                            k_ref[u: u + width, :],
                            preferred_element_type=acc.dtype,
                            precision=jax.lax.Precision.HIGHEST)
        u += width
        i += 1
    o_ref[:] = acc


def rational_supercycle_pallas(x, K, L: int, M: int, n_out: int,
                               JT: int | None = None,
                               interpret: bool = False):
    """Resample 1-D ``x`` through the banded tap matrix ``K`` ((U, L) from
    build_k_matrix; L/M here are the *effective* grouped values g*L, g*M).
    ``x`` must already start at the stream origin (deficit folded in by the
    caller via slicing or K's ``origin``). Returns the first ``n_out``
    outputs.
    """
    U = K.shape[0]
    # overlap rows needed from the next tile: k_parts - 1, padded to 8s;
    # fetching only these (instead of the whole next block) makes the
    # kernel effectively single-read over x
    k_parts = -(-U // M)
    JT2 = max(8, -(-(k_parts - 1) // 8) * 8)
    if JT is None:
        # ~512K input samples per tile block, bounded tile VMEM footprint.
        # Round UP to the JT2 quantum (doubling-until-divisible blew the
        # tile to ~2700 rows for wide-M geometries: ~20 MB scoped VMEM,
        # past the 16 MB limit).
        JT = max(JT2, min(512, 131072 // M))
        JT = -(-JT // JT2) * JT2
        while JT * M < U:
            JT += JT2
    if U > JT * M:
        raise ValueError(f"tile too small: U={U} > JT*M={JT * M}")
    while JT % JT2 and JT2 < JT:
        JT2 += 8                    # grow until it divides JT
    if JT % JT2 or JT2 > JT:
        JT2 = JT                    # fallback: fetch the full next block
    J_total = -(-n_out // L)
    num_tiles = -(-J_total // JT)
    # pad x so the overlap head after the last tile exists
    need = (num_tiles * JT + JT2) * M
    x_pad = jnp.pad(x, (0, max(0, need - x.shape[0])))[:need]
    x2d = x_pad.reshape(-1, M)          # free HBM relayout
    ratio = JT // JT2

    out = pl.pallas_call(
        functools.partial(_kernel, JT=JT, M=M, U=U, L=L),
        out_shape=jax.ShapeDtypeStruct((num_tiles * JT, L), x.dtype),
        grid=(num_tiles,),
        in_specs=[
            # NB: every index component derives from j so all stay int32 —
            # bare 0/1 literals become int64 under jax_enable_x64 and Mosaic
            # rejects the mixed-width index tuple.
            pl.BlockSpec((JT, M), lambda j: (j, j * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((JT2, M), lambda j: ((j + 1) * ratio, j * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, L), lambda j: (j * 0, j * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((JT, L), lambda j: (j, j * 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, x2d, K)
    return out.reshape(num_tiles * JT * L)
