"""Pallas TPU kernels: fused windowed select (v1, "winsel").

Per-output windows are read straight from the 128-lane-reshaped input via
two overlapping auto-pipelined VMEM blocks; per-output taps are built
in-VMEM from the tiny banks with one-hot matmuls. Monotonicity of the
window starts bounds the per-tile row span, making the VMEM tile and the
one-hot width static. These are the any-dtype fallback kernels; the f32
fast paths are select3 (single-channel) / select4 (batched) / gridsel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_select_pallas", "window_select_farrow_pallas"]

_LANES = 128


def _win_kernel(bs_ref, q_ref, phi_ref, alpha_ref, xa, xb, pfbt, dpfbt,
                o_ref, *, B: int, RQ: int, T: int, NPHI: int):
    """Fused arbitrary-resampler tile: in-VMEM per-output taps
    (pfb[:, phi] + alpha*dpfb[:, phi] via a one-hot matmul against the tiny
    transposed banks) then a windowed weighted select straight from x."""
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    q = q_ref[sub, :]                              # (B,) window starts in x
    phi = phi_ref[sub, :]
    alpha = alpha_ref[sub, :]
    lanes = jnp.int32(_LANES)
    base = bs_ref[pl.program_id(0)] * jnp.int32(RQ)
    row_local = jax.lax.div(q, lanes) - base
    lane = jax.lax.rem(q, lanes)

    # taps (B, T) = onehot(phi) @ (pfbT + alpha*dpfbT per-row)
    phi_iota = jax.lax.broadcasted_iota(jnp.int32, (B, NPHI), 1)
    onehot_p = (phi_iota == phi[:, None]).astype(xa.dtype)
    t_lo = jnp.dot(onehot_p, pfbt[:], preferred_element_type=xa.dtype,
                   precision=jax.lax.Precision.HIGHEST)
    t_hi = jnp.dot(onehot_p, dpfbt[:], preferred_element_type=xa.dtype,
                   precision=jax.lax.Precision.HIGHEST)
    taps = t_lo + alpha[:, None] * t_hi            # (B, T)

    xcat = jnp.concatenate([xa[:], xb[:]], axis=0)  # (2RQ, 128)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * RQ), 1)
    A = jnp.dot((rows_iota == row_local[:, None]).astype(xcat.dtype), xcat,
                preferred_element_type=xcat.dtype,
                precision=jax.lax.Precision.HIGHEST)
    A2 = jnp.dot((rows_iota == (row_local + 1)[:, None]).astype(xcat.dtype),
                 xcat, preferred_element_type=xcat.dtype,
                 precision=jax.lax.Precision.HIGHEST)

    # W[:, s] = sum_t taps[:, t] * x_window_starting_at_lane_s[t], built
    # with T lane-rolls (A2 supplies the cross-row spill); then one masked
    # lane reduce picks each output's own start lane. This avoids 2T lane
    # reductions (measured dominant) in favor of T cheap rolls + 1 reduce.
    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (B, _LANES), 1)
    W = jnp.zeros((B, _LANES), xcat.dtype)
    for t in range(T):
        sh_amt = jnp.int32((_LANES - t) % _LANES)
        ra = pltpu.roll(A, sh_amt, axis=1)
        rb = pltpu.roll(A2, sh_amt, axis=1)
        sh = jnp.where(lanes_iota < _LANES - t, ra, rb)
        W = W + taps[:, t:t + 1] * sh
    y = jnp.sum(W * (lanes_iota == lane[:, None]).astype(xcat.dtype), axis=1)
    o_ref[sub, :] = y


def window_select_pallas(x, starts, phi, alpha, pfb, dpfb, max_step: int,
                         B: int = 512, interpret: bool = False):
    """Fused arbitrary resample finish: for monotone window starts with
    per-output step <= max_step,
      y[n] = sum_t (pfb[t, phi[n]] + alpha[n]*dpfb[t, phi[n]]) * x[starts[n]+t]
    reading x directly (no interpolated stream is ever materialized)."""
    n_out = starts.shape[0]
    n_x = x.shape[0]
    T, NPHI = pfb.shape
    RQ = -(-(B * max_step + T) // _LANES) + 2
    RQ = -(-RQ // 8) * 8
    num_tiles = -(-n_out // B)
    num_tiles = -(-num_tiles // 8) * 8

    rows_total = -(-n_x // _LANES)
    rows_pad = (rows_total // RQ + 3) * RQ
    Xp = jnp.pad(x, (0, rows_pad * _LANES - n_x)).reshape(rows_pad, _LANES)

    pad_n = num_tiles * B - n_out
    q32 = jnp.clip(jnp.pad(starts, (0, pad_n), mode="edge"),
                   0, n_x - T).astype(jnp.int32).reshape(num_tiles, B)
    phi32 = jnp.pad(phi, (0, pad_n)).astype(jnp.int32).reshape(num_tiles, B)
    a32 = jnp.pad(alpha, (0, pad_n)).astype(x.dtype).reshape(num_tiles, B)

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
            pl.BlockSpec((NPHI, T), lambda j, b: (j * 0, j * 0)),
            pl.BlockSpec((NPHI, T), lambda j, b: (j * 0, j * 0)),
        ],
        out_specs=pl.BlockSpec(
            (8, B), lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)),
    )
    out = pl.pallas_call(
        functools.partial(_win_kernel, B=B, RQ=RQ, T=T, NPHI=NPHI),
        out_shape=jax.ShapeDtypeStruct((num_tiles, B), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bs.astype(jnp.int32), q32, phi32, a32, Xp, Xp,
      jnp.asarray(pfb).T.astype(x.dtype), jnp.asarray(dpfb).T.astype(x.dtype))
    return out.reshape(num_tiles * B)[:n_out]


def _win_farrow_kernel(bs_ref, q_ref, pw_ref, xa, xb, coeffs, o_ref,
                       *, B: int, RQ: int, T: int, P1: int):
    """Fused Farrow tile: taps = powers @ coeffs in VMEM, then the windowed
    weighted select straight from x."""
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    q = q_ref[sub, :]
    lanes = jnp.int32(_LANES)
    base = bs_ref[pl.program_id(0)] * jnp.int32(RQ)
    row_local = jax.lax.div(q, lanes) - base
    lane = jax.lax.rem(q, lanes)

    taps = jnp.dot(pw_ref[sub, :, :], coeffs[:],
                   preferred_element_type=xa.dtype,
                   precision=jax.lax.Precision.HIGHEST)       # (B, T)

    xcat = jnp.concatenate([xa[:], xb[:]], axis=0)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * RQ), 1)
    A = jnp.dot((rows_iota == row_local[:, None]).astype(xcat.dtype), xcat,
                preferred_element_type=xcat.dtype,
                precision=jax.lax.Precision.HIGHEST)
    A2 = jnp.dot((rows_iota == (row_local + 1)[:, None]).astype(xcat.dtype),
                 xcat, preferred_element_type=xcat.dtype,
                 precision=jax.lax.Precision.HIGHEST)

    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (B, _LANES), 1)
    W = jnp.zeros((B, _LANES), xcat.dtype)
    for t in range(T):
        sh_amt = jnp.int32((_LANES - t) % _LANES)
        ra = pltpu.roll(A, sh_amt, axis=1)
        rb = pltpu.roll(A2, sh_amt, axis=1)
        sh = jnp.where(lanes_iota < _LANES - t, ra, rb)
        W = W + taps[:, t:t + 1] * sh
    y = jnp.sum(W * (lanes_iota == lane[:, None]).astype(xcat.dtype), axis=1)
    o_ref[sub, :] = y


def window_select_farrow_pallas(x, starts, powers, coeffs, max_step: int,
                                B: int = 512, interpret: bool = False):
    """Fused Farrow finish: y[n] = sum_t (powers[n] @ coeffs)[t] *
    x[starts[n] + t] for monotone starts."""
    n_out, P1 = powers.shape
    n_x = x.shape[0]
    T = coeffs.shape[1]
    RQ = -(-(B * max_step + T) // _LANES) + 2
    RQ = -(-RQ // 8) * 8
    num_tiles = -(-n_out // B)
    num_tiles = -(-num_tiles // 8) * 8

    rows_total = -(-n_x // _LANES)
    rows_pad = (rows_total // RQ + 3) * RQ
    Xp = jnp.pad(x, (0, rows_pad * _LANES - n_x)).reshape(rows_pad, _LANES)

    pad_n = num_tiles * B - n_out
    q32 = jnp.clip(jnp.pad(starts, (0, pad_n), mode="edge"),
                   0, n_x - T).astype(jnp.int32).reshape(num_tiles, B)
    pw = jnp.pad(powers, ((0, pad_n), (0, 0))).astype(x.dtype).reshape(
        num_tiles, B, P1)

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
            pl.BlockSpec((P1, T), lambda j, b: (j * 0, j * 0)),
        ],
        out_specs=pl.BlockSpec(
            (8, B), lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)),
    )
    out = pl.pallas_call(
        functools.partial(_win_farrow_kernel, B=B, RQ=RQ, T=T, P1=P1),
        out_shape=jax.ShapeDtypeStruct((num_tiles, B), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bs.astype(jnp.int32), q32, pw, Xp, Xp,
      jnp.asarray(coeffs).astype(x.dtype))
    return out.reshape(num_tiles * B)[:n_out]
