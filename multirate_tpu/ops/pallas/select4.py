"""Batched-channel fused arbitrary/Farrow resampler ("chansel", v4/v5).

All channels of a batched stream share ONE resampling state (FilterState
phase/deficit are scalars), so the per-output (window start, phase,
alpha) structure is SHARED across channels. That turns the resample into
real MXU work: per tile of 128 outputs the kernel builds a banded tap
matrix

    K3[u, n] = w_n[u - q_n]        (T compare-placement VPU stages,
                                    no gathers, no per-row shifts)

and emits ALL channels at once with one matmul

    Y_tile (C, 128) = Xw (C, UW) @ K3 (UW, 128).

Amortized over C channels the placement cost vanishes (U*T*3/C element
ops per output-sample); the kernel is MXU/HBM-bound — vs the per-output
VPU work that bounds the single-channel winsel kernels (select3).

v5 revision: each tile's x window arrives as UW/128 individually
DMA'd 128-lane blocks selected by a HOST-COMPUTED per-tile base via
scalar prefetch (the zc kernel's trick, rational2.py) — the v4 design
instead loaded one big per-step block and extracted each tile's window
with an in-kernel dynamic lane rotate of the whole (C, ~3300) block,
which Mosaic lowers to a multi-stage vreg shuffle that rivaled the
placement stages in VPU cost. The per-tile window start (tile-relative
q < UW) is exact host int64 math; no dynamic data movement remains in
the kernel.

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
_QBITS = 13        # tile-relative window start (< UW <= 8192)
_MAX_TILES = 1 << 13


def _split16(v):
    """Host/XLA-level (hi, lo) bf16 split (banks, built once)."""
    from .. import precision as prec

    return prec.split_bf16(v)


def _ksplit16(v):
    """In-kernel (hi, lo) bf16 split: hardware RTNE demote (4 vreg-ops
    vs split_bf16's 9 — safe inside Mosaic only, ops/precision.py)."""
    from .. import precision as prec

    return prec.split_bf16_kernel(v)


class V4Geometry:
    def __init__(self, nphi, delta_fx, T, n_out, C):
        D = nphi << PHASE_FRAC_BITS
        self.D = D
        self.tiles = -(-n_out // _NO)
        self.tiles8 = -(-self.tiles // 8) * 8
        # per-tile matmul window: EXACT max window-start span over one
        # tile's _NO outputs (consecutive starts step by delta_fx/D) +
        # taps + up to _LANES-1 of 128-aligned tile-base flooring.
        span = ((_NO - 1) * delta_fx + D - 1) // D + 1
        self.uw = -(-(span + T + _LANES) // _LANES) * _LANES
        # padded x: the last tile's base + its window, from the exact
        # affine bound on window starts (q <= (n_out-1)*delta/D + 1)
        q_hi = ((self.tiles8 * _NO - 1) * delta_fx) // D + 2
        self.xblocks = q_hi // _LANES + self.uw // _LANES + 1
        self.ok = (T <= _LANES and self.uw < (1 << _QBITS)
                   and self.tiles8 <= _MAX_TILES and C % 8 == 0)


def v4_geometry(nphi, delta_fx, T, n_out, C, farrow=False):
    """Geometry or None. The arb packing gives the phase a 5-bit field
    (bits 13-17, below a14 at 18): nphi <= 32 is the hard limit. Farrow's
    19-bit psi prep is safe for any nphi the kernels accept (rem << 19 <
    2^63 up to nphi = 4096 > the 2048 construction cap)."""
    if not farrow and nphi > 32:
        return None
    g = V4Geometry(nphi, delta_fx, T, n_out, C)
    return g if g.ok else None


def _prep_indices(geo, nphi, delta_fx, u0, farrow):
    """(packed (tiles8, _NO) int32, bases (tiles8,) int32).

    packed: q relative to the tile's 128-aligned block base (13 bits) |
    phase (5 bits) | alpha at 2^-14 (arb), or | psi fraction at 19 bits
    (Farrow) — all quantizations inside the 1e-4 budget. Exact two-level
    int64 carry math as select3. bases: per-tile x block index (units of
    128 lanes into the padded x)."""
    D = geo.D
    tiles8 = geo.tiles8
    qd, rd = divmod(delta_fx, D)
    j = jnp.arange(tiles8, dtype=jnp.int64)
    from .. import indexing as idx

    in_base, u_base = idx._muladd_divmod(j * _NO, delta_fx, u0, D)
    s = jax.lax.broadcasted_iota(jnp.int64, (tiles8, _NO), 1)
    t = u_base[:, None] + s * rd
    rem = t % D
    q_abs = in_base[:, None] + s * qd + t // D
    # q_abs is nondecreasing along the tile, so the tile min is column 0
    bases = jnp.clip(q_abs[:, 0] // _LANES, 0,
                     geo.xblocks - geo.uw // _LANES).astype(jnp.int32)
    q_blk = jnp.clip(q_abs - bases.astype(jnp.int64)[:, None] * _LANES,
                     0, (1 << _QBITS) - 1).astype(jnp.int32)
    if farrow:
        hi = ((rem << 19) // D).astype(jnp.int32)       # 19-bit psi frac
        return q_blk | (hi << _QBITS), bases
    phi = (rem >> PHASE_FRAC_BITS).astype(jnp.int32)
    a14 = ((rem & ((1 << PHASE_FRAC_BITS) - 1))
           >> (PHASE_FRAC_BITS - 14)).astype(jnp.int32)
    return q_blk | (phi << _QBITS) | (a14 << 18), bases


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
        ph, plo = _ksplit16(powersT)
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


def _k4_kernel(bases_ref, pk_ref, *rest, T: int, NPHI: int, farrow: bool,
               P1: int, T128: int, UW: int):
    f32 = jnp.float32
    nxb = UW // _LANES
    xparts = rest[:nxb]
    bk, o_ref = rest[nxb], rest[nxb + 1]
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    xw = jnp.concatenate([xp[...] for xp in xparts], axis=1)  # (C, UW)
    if farrow:
        banks = (bk[0:T128, :], bk[T128:2 * T128, :])
    else:
        banks = (bk[0:T128, :], bk[T128:2 * T128, :],
                 bk[2 * T128:3 * T128, :], bk[3 * T128:, :])
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (UW, _NO), 0)
    pk = pk_ref[sub, :]
    qw, tapsT = _k4_common(pk, banks, T, NPHI, farrow, P1)
    xh, xl = _ksplit16(xw)
    k3 = jnp.zeros((UW, _NO), f32)
    for t in range(T):
        m = iota_u == (qw + jnp.int32(t))[None, :]
        k3 = k3 + jnp.where(m, tapsT[t:t + 1, :], jnp.float32(0.0))
    kh, kl = _ksplit16(k3)
    # The C-row operand is THIN (C ~ 64 rows vs 128-deep weight tiles),
    # so the kernel is MXU weight-LOAD bound and the 3-pass split pays
    # 3 weight loads per K tile. Stacking [xh; xl] shares one kh load
    # across both kh products: 2 loads instead of 3 (~1.4x on the bound).
    C = xw.shape[0]
    xs2 = jnp.concatenate([xh, xl], axis=0)              # (2C, UW)
    p2 = jnp.dot(xs2, kh, preferred_element_type=f32)    # (2C, NO)
    acc = (p2[:C] + p2[C:]
           + jnp.dot(xh, kl, preferred_element_type=f32))
    o_ref[:, :] = acc


def _launch(geo, packed, bases, banks, x2, n_out, C, interpret, static):
    need = geo.xblocks * _LANES
    xp = jnp.pad(x2, ((0, 0), (0, max(0, need - x2.shape[1]))))[:, :need]
    nxb = geo.uw // _LANES
    grid8 = lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)  # noqa: E731

    def xmap(i):
        return lambda j, b, _i=i: (j * 0, b[j] + _i)

    out = pl.pallas_call(
        functools.partial(_k4_kernel, **static),
        out_shape=jax.ShapeDtypeStruct((C, geo.tiles8 * _NO), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(geo.tiles8,),
            in_specs=[
                pl.BlockSpec((8, _NO), grid8),
                *[pl.BlockSpec((C, _LANES), xmap(i)) for i in range(nxb)],
                pl.BlockSpec(banks.shape, lambda j, b: (j * 0, j * 0)),
            ],
            out_specs=pl.BlockSpec((C, _NO), lambda j, b: (j * 0, j)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bases, packed, *([xp] * nxb), banks)
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
    packed, bases = _prep_indices(geo, nphi, delta_fx, u0, farrow=False)
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
    return _launch(geo, packed, bases, banks, x2.astype(jnp.float32),
                   n_out, C, interpret, static)


def chan_resample_farrow_v4(x2, u0, coeffs, nphi: int, delta_fx: int,
                            n_out: int, interpret: bool = False):
    """Batched Farrow resample: x2 (C, E) channels sharing u0."""
    P1, T = coeffs.shape
    C = x2.shape[0]
    geo = v4_geometry(nphi, delta_fx, T, n_out, C)
    if geo is None:
        raise ValueError("v4 geometry inapplicable")
    packed, bases = _prep_indices(geo, nphi, delta_fx, u0, farrow=True)
    t128 = -(-T // 8) * 8
    p1pad = -(-P1 // 8) * 8
    cpadT = jnp.zeros((t128, p1pad), jnp.float32).at[:T, :P1].set(
        coeffs.T.astype(jnp.float32))
    ch, cl = _split16(cpadT)
    banks = jnp.concatenate([ch, cl], axis=0)            # (2*t128, P1pad)
    static = dict(T=T, NPHI=nphi, farrow=True, P1=P1, T128=t128,
                  UW=geo.uw)
    return _launch(geo, packed, bases, banks, x2.astype(jnp.float32),
                   n_out, C, interpret, static)
