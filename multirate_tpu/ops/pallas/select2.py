"""Fused arbitrary/Farrow resampler Pallas kernels, v2.

v1 (select.py window_select_*) built each output's window implicitly via T
lane-rolls per tile — T*128 VPU ops per output and measured slower than
phaseall. v2 uses the two primitives validated on v5e (exp/exp1_gather.py):

  1. one-hot ROW select (B, 2RQ) @ (2RQ, 128) at Precision.HIGHEST
     (DEFAULT precision truncates the gathered values to bf16);
  2. per-row dynamic LANE gather via jnp.take_along_axis (Mosaic lowers a
     full-width lane gather natively).

Per tile of B outputs:

  A, A2 <- one-hot row select of the covering 128-lane row and its
           successor from the x tile                         [MXU]
  W     <- take_along_axis(A/A2, lane + iota) with a boundary
           select: W[n, t] = x[starts[n] + t] for t < 128    [VPU, O(1) ops]
  taps  <- arb:    onehot(phi) @ [pfbT | dpfbT<<64] + alpha-mix
           farrow: powers @ coeffs                           [MXU]
  y     <- rowsum(W * taps)                                  [VPU]

MACs/output ~ 2*2RQ*128 (row select) + NPHI*128 (bank select) — no NPhi x
interpolated stream, nothing intermediate in HBM, and x is read once.
Constraint: taps_per_phi <= 64 (the packed dual-bank layout); callers fall
back to the phaseall path otherwise.

Reference semantics: Filters.jl:693-742 (arbitrary), 780-836 (Farrow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_resample_pallas", "window_resample_farrow_pallas"]

_LANES = 128
_HIGHEST = jax.lax.Precision.HIGHEST


def _lane_gather(A, idx):
    """take_along_axis(A, idx, axis=1) with int32 indices. jnp's own
    take_along_axis force-converts indices to int64 under jax_enable_x64
    (which this package enables) and Mosaic rejects 64-bit types; this
    builds the identical batched lax.gather with int32 directly."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        A, idx[..., None], dnums, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _gather_window(A, A2, lane, B):
    """W[n, i] = (row n's window)[i]: element lane[n]+i of the double row
    [A[n] | A2[n]], via two full-width lane gathers + a boundary select."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, _LANES), 1)
    pos = lane[:, None] + iota                      # (B, 128) in [0, 255]
    idx = jax.lax.bitwise_and(pos, jnp.int32(_LANES - 1))
    Wa = _lane_gather(A, idx)
    Wb = _lane_gather(A2, idx)
    return jnp.where(pos < jnp.int32(_LANES), Wa, Wb)


def _row_select(xa, xb, q, base, B, RQ, dtype):
    """(A, A2, lane): the covering row and its successor for each output."""
    lanes = jnp.int32(_LANES)
    row_local = jax.lax.div(q, lanes) - base
    lane = jax.lax.rem(q, lanes)
    xcat = jnp.concatenate([xa[:], xb[:]], axis=0)   # (2RQ, 128)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * RQ), 1)
    A = jnp.dot((rows_iota == row_local[:, None]).astype(dtype), xcat,
                preferred_element_type=dtype, precision=_HIGHEST)
    A2 = jnp.dot((rows_iota == (row_local + 1)[:, None]).astype(dtype), xcat,
                 preferred_element_type=dtype, precision=_HIGHEST)
    return A, A2, lane


def _arb_kernel(bs_ref, q_ref, phi_ref, alpha_ref, xa, xb, banks, o_ref,
                *, B: int, RQ: int, T: int, NPHI: int):
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    base = bs_ref[pl.program_id(0)] * jnp.int32(RQ)
    A, A2, lane = _row_select(xa, xb, q_ref[sub, :], base, B, RQ, xa.dtype)
    W = _gather_window(A, A2, lane, B)

    # packed dual-bank select: banks lanes [0:T] = pfbT, [64:64+T] = dpfbT
    phi_iota = jax.lax.broadcasted_iota(jnp.int32, (B, NPHI), 1)
    onehot_p = (phi_iota == phi_ref[sub, :][:, None]).astype(xa.dtype)
    TH = jnp.dot(onehot_p, banks[:], preferred_element_type=xa.dtype,
                 precision=_HIGHEST)                 # (B, 128)
    THd = pltpu.roll(TH, jnp.int32(64), axis=1)                 # dpfb part -> lanes 0:T
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, _LANES), 1)
    taps = jnp.where(iota < jnp.int32(T),
                     TH + alpha_ref[sub, :][:, None] * THd,
                     jnp.zeros((), xa.dtype))
    o_ref[sub, :] = jnp.sum(W * taps, axis=1)


def _farrow_kernel(bs_ref, q_ref, pw_ref, xa, xb, coeffs, o_ref,
                   *, B: int, RQ: int, P1: int):
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    base = bs_ref[pl.program_id(0)] * jnp.int32(RQ)
    A, A2, lane = _row_select(xa, xb, q_ref[sub, :], base, B, RQ, xa.dtype)
    W = _gather_window(A, A2, lane, B)
    # taps: (B, P1) @ (P1, 128), zero-padded past T -> no mask needed
    taps = jnp.dot(pw_ref[sub, :, :], coeffs[:],
                   preferred_element_type=xa.dtype,
                   precision=jax.lax.Precision.HIGHEST)
    o_ref[sub, :] = jnp.sum(W * taps, axis=1)


def _tile_layout(n_out, n_x, T, max_step, B):
    RQ = -(-(B * max_step + T + _LANES) // _LANES) + 1
    RQ = -(-RQ // 8) * 8
    num_tiles = -(-n_out // B)
    num_tiles = -(-num_tiles // 8) * 8
    rows_total = -(-n_x // _LANES)
    rows_pad = (rows_total // RQ + 3) * RQ
    return RQ, num_tiles, rows_pad


def window_resample_pallas(x, starts, phi, alpha, pfb, dpfb, max_step: int,
                           B: int = 512, interpret: bool = False):
    """Fused arbitrary resample: for monotone window starts with per-output
    step <= max_step,
      y[n] = sum_t (pfb[t, phi[n]] + alpha[n]*dpfb[t, phi[n]]) * x[starts[n]+t]
    reading x directly. Requires taps_per_phi <= 64."""
    n_out = starts.shape[0]
    n_x = x.shape[0]
    T, NPHI = pfb.shape
    if T > 64:
        raise ValueError("window_resample_pallas requires taps_per_phi <= 64")
    RQ, num_tiles, rows_pad = _tile_layout(n_out, n_x, T, max_step, B)
    Xp = jnp.pad(x, (0, rows_pad * _LANES - n_x)).reshape(rows_pad, _LANES)

    pad_n = num_tiles * B - n_out
    q32 = jnp.clip(jnp.pad(starts, (0, pad_n), mode="edge"),
                   0, n_x - T).astype(jnp.int32).reshape(num_tiles, B)
    phi32 = jnp.pad(phi, (0, pad_n)).astype(jnp.int32).reshape(num_tiles, B)
    a32 = jnp.pad(alpha, (0, pad_n)).astype(x.dtype).reshape(num_tiles, B)

    banks = jnp.zeros((NPHI, _LANES), x.dtype)
    banks = banks.at[:, :T].set(pfb.T.astype(x.dtype))
    banks = banks.at[:, 64:64 + T].set(dpfb.T.astype(x.dtype))

    bs = (q32[:, 0] // _LANES) // RQ
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, B),
                         lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)),
            pl.BlockSpec((8, B),
                         lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)),
            pl.BlockSpec((8, B),
                         lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)),
            pl.BlockSpec((RQ, _LANES), lambda j, b: (b[j], j * 0)),
            pl.BlockSpec((RQ, _LANES), lambda j, b: (b[j] + 1, j * 0)),
            pl.BlockSpec((NPHI, _LANES), lambda j, b: (j * 0, j * 0)),
        ],
        out_specs=pl.BlockSpec(
            (8, B), lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)),
    )
    out = pl.pallas_call(
        functools.partial(_arb_kernel, B=B, RQ=RQ, T=T, NPHI=NPHI),
        out_shape=jax.ShapeDtypeStruct((num_tiles, B), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bs.astype(jnp.int32), q32, phi32, a32, Xp, Xp,
      jnp.asarray(banks).astype(x.dtype))
    return out.reshape(num_tiles * B)[:n_out]


def window_resample_farrow_pallas(x, starts, powers, coeffs, max_step: int,
                                  B: int = 512, interpret: bool = False):
    """Fused Farrow resample: y[n] = sum_t (powers[n] @ coeffs)[t] *
    x[starts[n] + t] for monotone starts. Requires taps_per_phi <= 128."""
    n_out, P1 = powers.shape
    n_x = x.shape[0]
    T = coeffs.shape[1]
    if T > _LANES:
        raise ValueError("window_resample_farrow_pallas requires "
                         "taps_per_phi <= 128")
    RQ, num_tiles, rows_pad = _tile_layout(n_out, n_x, T, max_step, B)
    Xp = jnp.pad(x, (0, rows_pad * _LANES - n_x)).reshape(rows_pad, _LANES)

    pad_n = num_tiles * B - n_out
    q32 = jnp.clip(jnp.pad(starts, (0, pad_n), mode="edge"),
                   0, n_x - T).astype(jnp.int32).reshape(num_tiles, B)
    pw = jnp.pad(powers, ((0, pad_n), (0, 0))).astype(x.dtype).reshape(
        num_tiles, B, P1)
    C = jnp.zeros((P1, _LANES), x.dtype).at[:, :T].set(
        coeffs.astype(x.dtype))

    bs = (q32[:, 0] // _LANES) // RQ
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, B),
                         lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)),
            pl.BlockSpec((8, B, P1),
                         lambda j, b: (jax.lax.div(j, jnp.int32(8)),
                                       j * 0, j * 0)),
            pl.BlockSpec((RQ, _LANES), lambda j, b: (b[j], j * 0)),
            pl.BlockSpec((RQ, _LANES), lambda j, b: (b[j] + 1, j * 0)),
            pl.BlockSpec((P1, _LANES), lambda j, b: (j * 0, j * 0)),
        ],
        out_specs=pl.BlockSpec(
            (8, B), lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)),
    )
    out = pl.pallas_call(
        functools.partial(_farrow_kernel, B=B, RQ=RQ, P1=P1),
        out_shape=jax.ShapeDtypeStruct((num_tiles, B), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bs.astype(jnp.int32), q32, pw, Xp, Xp, jnp.asarray(C).astype(x.dtype))
    return out.reshape(num_tiles * B)[:n_out]
