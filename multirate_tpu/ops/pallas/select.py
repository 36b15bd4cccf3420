"""Pallas TPU kernel: monotone flat-index select from interpolated streams.

The arbitrary/Farrow phaseall formulation (ops/compute.py) ends with
``y_n = Q[q_n] + alpha_n * dQ[q_n]`` over a monotone index vector q — a
pattern XLA lowers to single-element gathers (measured ~30 us per thousand
elements on TPU, dominating everything). This kernel tiles the outputs,
loads the covering rows of the 128-lane-reshaped streams into VMEM via two
overlapping auto-pipelined blocks, and performs the select as

  stage A (MXU): A  = onehot(row_local) @ Qcat     (B, 2*RQ) @ (2*RQ, 128)
  stage B (VPU): y  = sum_lane (A + alpha * Ad) * onehot(lane)

Monotonicity of q bounds the per-tile row span, making the VMEM tile and
the one-hot width static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["monotone_select_pallas", "poly_select_pallas",
           "window_select_pallas", "window_select_farrow_pallas"]

_LANES = 128


def _kernel(bs_ref, q_ref, alpha_ref, qa_row, qb_row, da_row, db_row, o_ref,
            *, B: int, RQ: int):
    # q/alpha/out blocks hold 8 grid steps' rows (Mosaic wants sublane dims
    # divisible by 8); each step addresses its own row.
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    q = q_ref[sub, :]                              # (B,) int32 flat indices
    alpha = alpha_ref[sub, :]                      # (B,) f32
    # NB: int32 constants throughout — python-int literals promote to int64
    # under jax_enable_x64 and trip Mosaic's type converter.
    lanes = jnp.int32(_LANES)
    base = bs_ref[pl.program_id(0)] * jnp.int32(RQ)  # first loaded row
    row_local = jax.lax.div(q, lanes) - base
    lane = jax.lax.rem(q, lanes)

    qcat = jnp.concatenate([qa_row[:], qb_row[:]], axis=0)   # (2RQ, 128)
    dcat = jnp.concatenate([da_row[:], db_row[:]], axis=0)

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * RQ), 1)
    onehot_r = (rows_iota == row_local[:, None]).astype(qcat.dtype)
    A = jnp.dot(onehot_r, qcat, preferred_element_type=qcat.dtype,
                precision=jax.lax.Precision.HIGHEST)
    Ad = jnp.dot(onehot_r, dcat, preferred_element_type=qcat.dtype,
                 precision=jax.lax.Precision.HIGHEST)

    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (B, _LANES), 1)
    mask = (lanes_iota == lane[:, None]).astype(qcat.dtype)
    y = jnp.sum((A + alpha[:, None].astype(qcat.dtype) * Ad) * mask, axis=1)
    o_ref[sub, :] = y


def monotone_select_pallas(Q, dQ, q, alpha, max_step: int,
                           B: int = 512, interpret: bool = False):
    """y[n] = Q[q[n]] + alpha[n] * dQ[q[n]] for monotone non-decreasing q
    with per-step increase <= max_step. Q/dQ are 1-D; q/alpha length n_out.
    """
    n_out = q.shape[0]
    n_up = Q.shape[0]
    RQ = -(-(B * max_step) // _LANES) + 2
    RQ = -(-RQ // 8) * 8  # sublane-divisible block rows
    num_tiles = -(-n_out // B)

    rows_total = -(-n_up // _LANES)
    # pad streams so any block index up to (last bs + 2) exists
    rows_pad = (rows_total // RQ + 3) * RQ
    Qp = jnp.pad(Q, (0, rows_pad * _LANES - n_up)).reshape(rows_pad, _LANES)
    dQp = jnp.pad(dQ, (0, rows_pad * _LANES - n_up)).reshape(rows_pad, _LANES)

    num_tiles8 = -(-num_tiles // 8) * 8
    q_pad = jnp.pad(q, (0, num_tiles8 * B - n_out), mode="edge")
    a_pad = jnp.pad(alpha, (0, num_tiles8 * B - n_out))
    q32 = jnp.clip(q_pad, 0, n_up - 1).astype(jnp.int32).reshape(num_tiles8, B)
    a32 = a_pad.astype(Q.dtype).reshape(num_tiles8, B)
    num_tiles = num_tiles8

    # per-tile first covered row, in RQ-block units (scalar prefetch)
    bs = (q32[:, 0] // _LANES) // RQ

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, B), lambda j, bs_ref: (jax.lax.div(j, jnp.int32(8)), j * 0)),
            pl.BlockSpec((8, B), lambda j, bs_ref: (jax.lax.div(j, jnp.int32(8)), j * 0)),
            pl.BlockSpec((RQ, _LANES), lambda j, bs_ref: (bs_ref[j], j * 0)),
            pl.BlockSpec((RQ, _LANES),
                         lambda j, bs_ref: (bs_ref[j] + 1, j * 0)),
            pl.BlockSpec((RQ, _LANES), lambda j, bs_ref: (bs_ref[j], j * 0)),
            pl.BlockSpec((RQ, _LANES),
                         lambda j, bs_ref: (bs_ref[j] + 1, j * 0)),
        ],
        out_specs=pl.BlockSpec((8, B), lambda j, bs_ref: (jax.lax.div(j, jnp.int32(8)), j * 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, B=B, RQ=RQ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, B), Q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bs.astype(jnp.int32), q32, a32, Qp, Qp, dQp, dQp)
    return out.reshape(num_tiles * B)[:n_out]


def _poly_kernel(bs_ref, q_ref, w_ref, fa_row, fb_row, o_ref,
                 *, B: int, RQ: int, P1: int):
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    q = q_ref[sub, :]                              # (B,) int32: row starts
    lanes = jnp.int32(_LANES)
    base = bs_ref[pl.program_id(0)] * jnp.int32(RQ)
    row_local = jax.lax.div(q, lanes) - base
    lane = jax.lax.rem(q, lanes)

    fcat = jnp.concatenate([fa_row[:], fb_row[:]], axis=0)   # (2RQ, 128)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * RQ), 1)
    A = jnp.dot((rows_iota == row_local[:, None]).astype(fcat.dtype), fcat,
                preferred_element_type=fcat.dtype,
                precision=jax.lax.Precision.HIGHEST)
    A2 = jnp.dot((rows_iota == (row_local + 1)[:, None]).astype(fcat.dtype),
                 fcat, preferred_element_type=fcat.dtype,
                 precision=jax.lax.Precision.HIGHEST)

    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (B, _LANES), 1)
    y = jnp.zeros((B,), fcat.dtype)
    for p in range(P1):
        tgt = lane + jnp.int32(p)
        in_row = (lanes_iota == tgt[:, None]).astype(fcat.dtype)
        ov_row = (lanes_iota == (tgt - lanes)[:, None]).astype(fcat.dtype)
        fp = jnp.sum(A * in_row + A2 * ov_row, axis=1)
        y = y + w_ref[sub, :, p] * fp
    o_ref[sub, :] = y


def poly_select_pallas(F, q, weights, max_step: int, B: int = 512,
                       interpret: bool = False):
    """y[n] = sum_p weights[n, p] * F[q[n] + p] for monotone non-decreasing
    q with per-step increase <= max_step and P1 = weights.shape[1]
    consecutive elements per output (the Farrow per-power FIR mix)."""
    n_out, P1 = weights.shape
    n_up = F.shape[0]
    RQ = -(-(B * max_step + P1) // _LANES) + 2
    RQ = -(-RQ // 8) * 8
    num_tiles = -(-n_out // B)
    num_tiles = -(-num_tiles // 8) * 8

    rows_total = -(-n_up // _LANES)
    rows_pad = (rows_total // RQ + 3) * RQ
    Fp = jnp.pad(F, (0, rows_pad * _LANES - n_up)).reshape(rows_pad, _LANES)

    q_pad = jnp.pad(q, (0, num_tiles * B - n_out), mode="edge")
    w_pad = jnp.pad(weights, ((0, num_tiles * B - n_out), (0, 0)))
    q32 = jnp.clip(q_pad, 0, n_up - P1).astype(jnp.int32).reshape(
        num_tiles, B)
    w3 = w_pad.astype(F.dtype).reshape(num_tiles, B, P1)

    bs = (q32[:, 0] // _LANES) // RQ
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, B),
                         lambda j, bs_ref: (jax.lax.div(j, jnp.int32(8)),
                                            j * 0)),
            pl.BlockSpec((8, B, P1),
                         lambda j, bs_ref: (jax.lax.div(j, jnp.int32(8)),
                                            j * 0, j * 0)),
            pl.BlockSpec((RQ, _LANES), lambda j, bs_ref: (bs_ref[j], j * 0)),
            pl.BlockSpec((RQ, _LANES),
                         lambda j, bs_ref: (bs_ref[j] + 1, j * 0)),
        ],
        out_specs=pl.BlockSpec(
            (8, B), lambda j, bs_ref: (jax.lax.div(j, jnp.int32(8)), j * 0)),
    )
    out = pl.pallas_call(
        functools.partial(_poly_kernel, B=B, RQ=RQ, P1=P1),
        out_shape=jax.ShapeDtypeStruct((num_tiles, B), F.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bs.astype(jnp.int32), q32, w3, Fp, Fp)
    return out.reshape(num_tiles * B)[:n_out]


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
