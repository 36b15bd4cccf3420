"""Batched-channel fused arbitrary/Farrow resampler ("chansel", v4).

All channels of a batched stream share ONE resampling state (FilterState
phase/deficit are scalars), so the per-output (window start, phase,
alpha) structure is SHARED across channels. That turns the resample into
real MXU work: per tile of 128 outputs the kernel builds a banded tap
matrix

    K3[u, n] = w_n[u - q_n]        (T compare-placement VPU stages,
                                    no gathers, no per-row shifts)

and emits ALL channels at once with one matmul

    Y_tile (C, 128) = Xw (C, U) @ K3 (U, 128).

Amortized over C channels the placement cost vanishes (U*T*3/C element
ops per output-sample); the kernel is MXU/HBM-bound — vs the per-output
VPU work that bounds the single-channel winsel kernels (select3).

The x block for each grid step is located with select3's affine
block-base approximation; inside a step, each tile narrows its matmul to
a 128-aligned dynamic window of the block (one dynamic f32 lane rotate —
the only dynamic data movement in the kernel).

Reference semantics: Filters.jl:693-742 (arbitrary), 780-836 (Farrow);
the per-output index math is the exact int64 fixed-point accumulator
(ops/indexing.py), identical to the winsel kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import PHASE_FRAC_BITS

__all__ = ["chan_resample_v4", "chan_resample_farrow_v4", "v4_geometry"]

_LANES = 128
_NO = 128          # outputs per tile (one matmul N dimension)
_SUB = 8           # tiles per grid step
_QBITS = 13        # window start relative to the x block (< 8192)
_SH2 = 20          # affine block-base shift (select3 convention)
_MAX_STEPS = 1 << 10


def _split16(v):
    from .. import precision as prec

    return prec.split_bf16(v)


class V4Geometry:
    def __init__(self, nphi, delta_fx, T, n_out, C):
        D = nphi << PHASE_FRAC_BITS
        self.D = D
        self.step_out = _SUB * _NO
        self.steps = -(-n_out // self.step_out)
        self.steps8 = -(-self.steps // 8) * 8
        # per-tile matmul window: EXACT max window-start span over one
        # tile's _NO outputs (consecutive starts step by delta_fx/D) +
        # taps + up to _LANES-1 of 128-aligned tile-base flooring. The
        # old ms = delta//D + 1 integer ceiling padded this ~1.7x for
        # fractional rates (e.g. 640 vs 384 at rate 0.9173) — pure
        # placement-stage and matmul-depth waste.
        span = ((_NO - 1) * delta_fx + D - 1) // D + 1
        self.uw = -(-(span + T + _LANES) // _LANES) * _LANES
        # x block: one step's span + window + jitter rows of 128 lanes
        span_cols = -(-(self.step_out * delta_fx // D + T + 2 * _LANES)
                      // _LANES)
        self.xr = span_cols + 2
        u2 = 2 * self.xr * _LANES
        self.ok = (T <= _LANES and self.uw <= u2
                   and (1 << _QBITS) >= u2
                   and self.steps8 <= _MAX_STEPS
                   and self.steps8 * self.step_out < (1 << 31)
                   and C % 8 == 0)

    def block_bases(self):
        j = jnp.arange(self.steps8, dtype=jnp.int32)
        return (j * jnp.int32(self.p2)) >> _SH2

    def finish(self, delta_fx):
        adv = (self.step_out * (delta_fx / self.D)) / (self.xr * _LANES)
        self.p2 = max(0, int(adv * (1 << _SH2)))
        return self


def v4_geometry(nphi, delta_fx, T, n_out, C, farrow=False):
    """Geometry or None. The arb packing gives the phase a 5-bit field
    (bits 13-17, below a14 at 18): nphi <= 32 is the hard limit. Farrow's
    19-bit psi prep is safe for any nphi the kernels accept (rem << 19 <
    2^63 up to nphi = 4096 > the 2048 construction cap)."""
    if not farrow and nphi > 32:
        return None
    g = V4Geometry(nphi, delta_fx, T, n_out, C)
    return g.finish(delta_fx) if g.ok else None


def _prep_indices(geo, nphi, delta_fx, u0, farrow):
    """packed (steps8, step_out) int32: q relative to the step's x block
    (13 bits) | phase (5 bits) | alpha at 2^-14 (arb), or | psi fraction
    at 19 bits (Farrow) — all quantizations inside the 1e-4 budget.
    Exact two-level int64 carry math as select3."""
    D = geo.D
    steps8, S = geo.steps8, geo.step_out
    qd, rd = divmod(delta_fx, D)
    j = jnp.arange(steps8, dtype=jnp.int64)
    from .. import indexing as idx

    in_base, u_base = idx._muladd_divmod(j * S, delta_fx, u0, D)
    s = jax.lax.broadcasted_iota(jnp.int64, (steps8, S), 1)
    t = u_base[:, None] + s * rd
    q_rel = s * qd + t // D
    rem = t % D
    q_abs = in_base[:, None] + q_rel
    bj = geo.block_bases().astype(jnp.int64)
    q_blk = jnp.clip(q_abs - bj[:, None] * (geo.xr * _LANES),
                     0, (1 << _QBITS) - 1).astype(jnp.int32)
    if farrow:
        hi = ((rem << 19) // D).astype(jnp.int32)       # 19-bit psi frac
        return q_blk | (hi << _QBITS)
    phi = (rem >> PHASE_FRAC_BITS).astype(jnp.int32)
    a14 = ((rem & ((1 << PHASE_FRAC_BITS) - 1))
           >> (PHASE_FRAC_BITS - 14)).astype(jnp.int32)
    return q_blk | (phi << _QBITS) | (a14 << 18)


def _k4_common(pk, banks_or_coeffs, T, NPHI, farrow, P1=0):
    """(qrel (NO,) int32, tapsT (T, NO) f32) for one tile."""
    f32 = jnp.float32
    qrel = jax.lax.bitwise_and(pk, jnp.int32((1 << _QBITS) - 1))
    if farrow:
        u19 = jax.lax.shift_right_logical(pk, jnp.int32(_QBITS))
        psi = jnp.float32(1.0) + u19.astype(f32) * jnp.float32(
            NPHI * 2.0 ** -19)
        # powersT (P1, NO): psi^p rows
        p1pad = -(-P1 // 8) * 8
        rows = [jnp.ones((1, psi.shape[0]), f32)]
        pr = psi[None, :]
        for _ in range(P1 - 1):
            rows.append(rows[-1] * pr)
        for _ in range(p1pad - P1):
            rows.append(jnp.zeros((1, psi.shape[0]), f32))
        powersT = jnp.concatenate(rows, axis=0)
        ph, plo = _split16(powersT)
        chT, clT = banks_or_coeffs                # (T128, P1pad) bf16
        tapsT = (jnp.dot(chT, ph, preferred_element_type=f32)
                 + jnp.dot(clT, ph, preferred_element_type=f32)
                 + jnp.dot(chT, plo, preferred_element_type=f32))
        return qrel, tapsT                      # (T128, NO)
    # full 5-bit field mask (nphi-1 is only a valid mask for pow2 nphi)
    phi = jax.lax.bitwise_and(
        jax.lax.shift_right_logical(pk, jnp.int32(_QBITS)),
        jnp.int32(31))
    alpha = jax.lax.shift_right_logical(pk, jnp.int32(18)).astype(f32) \
        * jnp.float32(2.0 ** -14)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (NPHI, phi.shape[0]), 0)
    ohp = (iota_p == phi[None, :]).astype(jnp.bfloat16)   # (NPHI, NO)
    ph, pl_, dh, dl = banks_or_coeffs           # (T128, NPHI) hi/lo
    tp = (jnp.dot(ph, ohp, preferred_element_type=f32)
          + jnp.dot(pl_, ohp, preferred_element_type=f32))
    td = (jnp.dot(dh, ohp, preferred_element_type=f32)
          + jnp.dot(dl, ohp, preferred_element_type=f32))
    tapsT = tp + alpha[None, :] * td            # (T128, NO)
    return qrel, tapsT


def _k4_kernel(pk_ref, xa, xb, bk, o_ref, *, T: int, NPHI: int,
               farrow: bool, P1: int, T128: int, UW: int):
    f32 = jnp.float32
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    xall = jnp.concatenate([xa[:], xb[:]], axis=1)       # (C, U2) f32
    u2 = xall.shape[1]
    if farrow:
        t128 = T128
        banks = (bk[0:t128, :], bk[t128:2 * t128, :])
    else:
        t128 = T128
        banks = (bk[0:t128, :], bk[t128:2 * t128, :],
                 bk[2 * t128:3 * t128, :], bk[3 * t128:, :])
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (UW, _NO), 0)
    # one aligned dynamic row load; per-tile slices are then static
    # (Mosaic rejects dynamic sublane loads at non-zero lane offsets)
    pk_row = pk_ref[sub, :]
    for k in range(_SUB):
        pk = pk_row[k * _NO:(k + 1) * _NO]
        qrel, tapsT = _k4_common(pk, banks, T, NPHI, farrow, P1)
        # narrow this tile's matmul to a 128-aligned dynamic window of
        # the block: ONE dynamic f32 lane rotate; the tap placement and
        # the matmul then run at depth UW instead of the full block
        tb = jnp.minimum(
            jax.lax.bitwise_and(jnp.min(qrel), jnp.int32(-_LANES)),
            jnp.int32(u2 - UW))
        xw = pltpu.roll(xall, jnp.int32(u2) - tb, axis=1)[:, :UW]
        xh, xl = _split16(xw)
        qw = qrel - tb
        k3 = jnp.zeros((UW, _NO), f32)
        for t in range(T):
            m = iota_u == (qw + jnp.int32(t))[None, :]
            k3 = k3 + jnp.where(m, tapsT[t:t + 1, :], jnp.float32(0.0))
        kh, kl = _split16(k3)
        acc = (jnp.dot(xh, kh, preferred_element_type=f32)
               + jnp.dot(xh, kl, preferred_element_type=f32)
               + jnp.dot(xl, kh, preferred_element_type=f32))
        o_ref[:, k * _NO:(k + 1) * _NO] = acc


def _launch(geo, packed, banks, x2, n_out, C, interpret, static):
    max_bj = ((geo.steps8 - 1) * geo.p2) >> _SH2
    need = (max_bj + 2) * geo.xr * _LANES
    xp = jnp.pad(x2, ((0, 0), (0, max(0, need - x2.shape[1]))))[:, :need]
    p2, sh = geo.p2, _SH2
    xw = geo.xr * _LANES

    def xmap_a(j):
        return (j * 0, (j * p2) >> sh)

    def xmap_b(j):
        return (j * 0, ((j * p2) >> sh) + 1)

    grid8 = lambda j: (jax.lax.div(j, jnp.int32(8)), j * 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_k4_kernel, **static),
        out_shape=jax.ShapeDtypeStruct((C, geo.steps8 * geo.step_out),
                                       jnp.float32),
        grid=(geo.steps8,),
        in_specs=[
            pl.BlockSpec((8, geo.step_out), grid8),
            pl.BlockSpec((C, xw), xmap_a),
            pl.BlockSpec((C, xw), xmap_b),
            pl.BlockSpec(banks.shape, lambda j: (j * 0, j * 0)),
        ],
        out_specs=pl.BlockSpec((C, geo.step_out),
                               lambda j: (j * 0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, xp, xp, banks)
    return out[:, :n_out]


def chan_resample_v4(x2, u0, pfb, dpfb, nphi: int, delta_fx: int,
                     n_out: int, interpret: bool = False):
    """Batched arbitrary resample: x2 (C, E) deficit-shifted channels
    sharing phase accumulator u0. Returns (C, n_out) float32."""
    T = pfb.shape[0]
    C = x2.shape[0]
    geo = v4_geometry(nphi, delta_fx, T, n_out, C)
    if geo is None:
        raise ValueError("v4 geometry inapplicable")
    packed = _prep_indices(geo, nphi, delta_fx, u0, farrow=False)
    t128 = -(-T // 8) * 8
    bp = jnp.zeros((t128, nphi), jnp.float32).at[:T].set(
        pfb.astype(jnp.float32))
    bd = jnp.zeros((t128, nphi), jnp.float32).at[:T].set(
        dpfb.astype(jnp.float32))
    ph, plo = _split16(bp)
    dh, dlo = _split16(bd)
    banks = jnp.concatenate([ph, plo, dh, dlo], axis=0)  # (4*t128, nphi)
    static = dict(T=T, NPHI=nphi, farrow=False, P1=0, T128=t128,
                  UW=geo.uw)
    return _launch(geo, packed, banks, x2.astype(jnp.float32), n_out, C,
                   interpret, static)


def chan_resample_farrow_v4(x2, u0, coeffs, nphi: int, delta_fx: int,
                            n_out: int, interpret: bool = False):
    """Batched Farrow resample: x2 (C, E) channels sharing u0."""
    P1, T = coeffs.shape
    C = x2.shape[0]
    geo = v4_geometry(nphi, delta_fx, T, n_out, C)
    if geo is None:
        raise ValueError("v4 geometry inapplicable")
    packed = _prep_indices(geo, nphi, delta_fx, u0, farrow=True)
    t128 = -(-T // 8) * 8
    p1pad = -(-P1 // 8) * 8
    cpadT = jnp.zeros((t128, p1pad), jnp.float32).at[:T, :P1].set(
        coeffs.T.astype(jnp.float32))
    ch, cl = _split16(cpadT)
    banks = jnp.concatenate([ch, cl], axis=0)            # (2*t128, P1pad)
    static = dict(T=T, NPHI=nphi, farrow=True, P1=P1, T128=t128,
                  UW=geo.uw)
    return _launch(geo, packed, banks, x2.astype(jnp.float32), n_out, C,
                   interpret, static)
