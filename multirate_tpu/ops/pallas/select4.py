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

__all__ = ["chan_resample_v4", "chan_resample_farrow_v4", "v4_geometry",
           "chan_resample_tm", "chan_resample_farrow_tm", "tm_geometry"]

_LANES = 128
_NO = 128          # outputs per tile (one matmul N dimension)
_QBITS = 13        # tile-relative window start (< UW <= 8192)
_MAX_TILES = 1 << 13


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
    """Geometry or None. Any nphi: the host tap build removed phi/alpha
    from the packed word (round 4), so the old nphi <= 32 arb packing
    limit is gone — pk carries only the 13-bit tile-relative q."""
    g = V4Geometry(nphi, delta_fx, T, n_out, C)
    return g if g.ok else None


def _prep_indices(geo, nphi, delta_fx, u0, farrow):
    """(q_blk (tiles8, _NO) int32, bases (tiles8,) int32, rem int64).

    q_blk: window start relative to the tile's 128-aligned block base
    (13 bits). rem: the exact int64 sub-sample remainder feeding the
    host tap builders (_host_taps_arb / _host_taps_farrow). Exact
    two-level int64 carry math as select3. bases: per-tile x block
    index (units of 128 lanes into the padded x)."""
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
    return q_blk, bases, rem


def _host_taps_arb(pfb, dpfb, rem, nphi: int):
    """(tiles8, T128, _NO) f32 per-output taps, built ON THE HOST.

    taps = pfb[:, phi] + alpha * dpfb[:, phi] with phi/alpha from the
    exact int64 rem — full 2^-32 alpha (the old in-kernel build
    quantized alpha to 14 bits). One-hot batched matmul, NOT a gather
    (the chip's slowest primitive); HIGHEST keeps the select exact.
    Round-4 lesson from the gridsel kernels (exp31/35): tiny per-tile
    matmuls interleaved between the kernel's big band matmuls cost
    ~1 us/tile regardless of pass count — hoist them out."""
    f32 = jnp.float32
    T = pfb.shape[0]
    T128 = -(-T // 8) * 8
    D_PHI = 1 << PHASE_FRAC_BITS
    phi = (rem >> PHASE_FRAC_BITS).astype(jnp.int32)      # (x, NO)
    alpha = (rem & (D_PHI - 1)).astype(f32) * f32(2.0 ** -PHASE_FRAC_BITS)
    bp = jnp.zeros((T128, nphi), f32).at[:T].set(pfb.astype(f32))
    bd = jnp.zeros((T128, nphi), f32).at[:T].set(dpfb.astype(f32))
    iop = jnp.arange(nphi, dtype=jnp.int32)
    oh = (iop[None, :, None] == phi[:, None, :]).astype(f32)
    hi = jax.lax.Precision.HIGHEST
    mmv = jax.vmap(lambda o: (
        jnp.dot(bp, o, precision=hi, preferred_element_type=f32),
        jnp.dot(bd, o, precision=hi, preferred_element_type=f32)))
    tp, td = mmv(oh)
    return tp + alpha[:, None, :] * td


def _host_taps_farrow(coeffs, rem, nphi: int):
    """(tiles8, T128, _NO) f32 Farrow taps ON THE HOST: the polynomial
    sum_p c[p, t] * psi^p evaluated at the exact per-output psi (f64
    from the int64 rem — the old in-kernel build quantized psi to 19
    bits). See _host_taps_arb for why this is not done in-kernel."""
    f32 = jnp.float32
    P1, T = coeffs.shape
    T128 = -(-T // 8) * 8
    D = nphi << PHASE_FRAC_BITS
    psi = (1.0 + rem.astype(jnp.float64) * (nphi / D)).astype(f32)
    powers = jnp.stack([psi ** p for p in range(P1)], axis=1)
    cT = jnp.zeros((T128, P1), f32).at[:T].set(coeffs.T.astype(f32))
    hi = jax.lax.Precision.HIGHEST
    return jax.vmap(lambda pw: jnp.dot(cT, pw, precision=hi,
                                       preferred_element_type=f32))(powers)


def _k4_kernel(bases_ref, pk_ref, *rest, T: int, NPHI: int, farrow: bool,
               P1: int, T128: int, UW: int):
    f32 = jnp.float32
    nxb = UW // _LANES
    xparts = rest[:nxb]
    taps_ref, o_ref = rest[nxb], rest[nxb + 1]
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    xw = jnp.concatenate([xp[...] for xp in xparts], axis=1)  # (C, UW)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (UW, _NO), 0)
    qw = jax.lax.bitwise_and(pk_ref[sub, :],
                             jnp.int32((1 << _QBITS) - 1))
    tapsT = taps_ref[0]                         # (T128, NO) host-built
    xh, xl = _ksplit16(xw)
    k3 = jnp.zeros((UW, _NO), f32)
    for t in range(T):
        # where-select placement: the exp20 fma form was A/B'd here in
        # round 4 and measured WORSE (10.7 vs 11.8 Gsps on farrow_64ch)
        # — the gridsel finding does not transfer to this kernel
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


def _launch(geo, packed, bases, tapsT, x2, n_out, C, interpret, static):
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
                pl.BlockSpec((1, *tapsT.shape[1:]),
                             lambda j, b: (j, j * 0, j * 0)),
            ],
            out_specs=pl.BlockSpec((C, _NO), lambda j, b: (j * 0, j)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bases, packed, *([xp] * nxb), tapsT)
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
    packed, bases, rem = _prep_indices(geo, nphi, delta_fx, u0,
                                       farrow=False)
    t128 = -(-T // 8) * 8
    tapsT = _host_taps_arb(pfb, dpfb, rem, nphi)
    static = dict(T=T, NPHI=nphi, farrow=False, P1=0, T128=t128,
                  UW=geo.uw)
    return _launch(geo, packed, bases, tapsT, x2.astype(jnp.float32),
                   n_out, C, interpret, static)


def chan_resample_farrow_v4(x2, u0, coeffs, nphi: int, delta_fx: int,
                            n_out: int, interpret: bool = False):
    """Batched Farrow resample: x2 (C, E) channels sharing u0."""
    P1, T = coeffs.shape
    C = x2.shape[0]
    geo = v4_geometry(nphi, delta_fx, T, n_out, C)
    if geo is None:
        raise ValueError("v4 geometry inapplicable")
    packed, bases, rem = _prep_indices(geo, nphi, delta_fx, u0,
                                       farrow=True)
    t128 = -(-T // 8) * 8
    tapsT = _host_taps_farrow(coeffs, rem, nphi)
    static = dict(T=T, NPHI=nphi, farrow=True, P1=P1, T128=t128,
                  UW=geo.uw)
    return _launch(geo, packed, bases, tapsT, x2.astype(jnp.float32),
                   n_out, C, interpret, static)


# --------------------------------------------------------------------------- #
# Time-major ("tm") variant: x arrives (E, C) — time on the SUBLANE axis,
# channels on lanes. Each output tile's window is then a sublane-contiguous
# (UW, C) block whose start quantizes to the GB-row DMA granularity instead
# of the channel-major layout's 128-LANE flooring: at rate ~0.92 the
# channel-major UW was 384 lanes for a ~139-sample true span (2.8x x
# re-read, and placement cost 3*T*UW/C per output-sample — ROADMAP round-5
# item 2); time-major with GB=32 needs UW ~ 192 rows. The matmul contracts
# the window axis on the SUBLANE side of both operands:
#     Y (NO, C) = sum_u K3[u, :NO] * Xw[u, :C]    (dot_general, no
# materialized transpose), so outputs come back time-major too — the
# whole path stays (E, C) end-to-end with no transpose pass. C pads to
# the 128-lane quantum (C = 64 pays 2x lane padding; C >= 128 is free).
# --------------------------------------------------------------------------- #

import os

# DMA block rows (window-start quantization): smaller -> less window
# re-read but more, smaller DMAs per tile (UW/GB of (GB, C) blocks)
_TM_GB = int(os.environ.get("CHANSEL_TM_GB", "32"))


class TMGeometry:
    def __init__(self, nphi, delta_fx, T, n_out, C):
        D = nphi << PHASE_FRAC_BITS
        self.D = D
        self.tiles = -(-n_out // _NO)
        self.tiles8 = -(-self.tiles // 8) * 8
        span = ((_NO - 1) * delta_fx + D - 1) // D + 1
        self.uw = -(-(span + T + _TM_GB) // _TM_GB) * _TM_GB
        # + max_step slack rows: the deficit shift folds into q_abs
        # (_prep_indices_tm d0), so windows can start up to d0-1 <=
        # delta//D + 1 rows later than the fresh-stream bound
        q_hi = (((self.tiles8 * _NO - 1) * delta_fx) // D + 2
                + delta_fx // D + 2)
        self.xblocks = q_hi // _TM_GB + self.uw // _TM_GB + 1
        self.ok = (T <= _TM_GB and self.uw < (1 << _QBITS)
                   and self.tiles8 <= _MAX_TILES)


def tm_geometry(nphi, delta_fx, T, n_out, C):
    g = TMGeometry(nphi, delta_fx, T, n_out, C)
    return g if g.ok else None


def _prep_indices_tm(geo, nphi, delta_fx, u0, d0=None):
    """Like _prep_indices but with GB-row window-start quantization.

    ``d0`` (traced deficit) folds the stream-origin shift INTO the
    window starts (q_abs += d0-1) so callers never materialize a
    shifted copy of x (the channel-major path's _shift_origin cond costs
    a full extra HBM pass; geometry reserves d_max slack rows)."""
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
    if d0 is not None:
        q_abs = q_abs + (d0.astype(jnp.int64) - 1)
    bases = jnp.clip(q_abs[:, 0] // _TM_GB, 0,
                     geo.xblocks - geo.uw // _TM_GB).astype(jnp.int32)
    q_blk = jnp.clip(q_abs - bases.astype(jnp.int64)[:, None] * _TM_GB,
                     0, (1 << _QBITS) - 1).astype(jnp.int32)
    return q_blk, bases, rem


def _ktm_kernel(bases_ref, pk_ref, *rest, T: int, UW: int, NXB: int):
    f32 = jnp.float32
    xparts = rest[:NXB]
    taps_ref, o_ref = rest[NXB], rest[NXB + 1]
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    xw = jnp.concatenate([xp[...] for xp in xparts], axis=0)  # (UW, C)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (UW, _NO), 0)
    qw = jax.lax.bitwise_and(pk_ref[sub, :],
                             jnp.int32((1 << _QBITS) - 1))
    tapsT = taps_ref[0]                          # (T128, NO) host-built
    xh, xl = _ksplit16(xw)
    k3 = jnp.zeros((UW, _NO), f32)
    for t in range(T):
        m = iota_u == (qw + jnp.int32(t))[None, :]
        k3 = k3 + jnp.where(m, tapsT[t:t + 1, :], jnp.float32(0.0))
    kh, kl = _ksplit16(k3)
    # contraction over the shared SUBLANE axis u of K (UW, NO) and
    # Xw (UW, C): dot_general(((0,), (0,))) -> (NO, C). The K-side is
    # the thin/stationary operand; [kh; kl] row-stacking shares the xh
    # weight load across both (the v4 trick, transposed).
    dn = (((0,), (0,)), ((), ()))
    ks2 = jnp.concatenate([kh, kl], axis=1)              # (UW, 2*NO)
    p2 = jax.lax.dot_general(ks2, xh, dn,
                             preferred_element_type=f32)  # (2NO, C)
    acc = (p2[:_NO] + p2[_NO:]
           + jax.lax.dot_general(kh, xl, dn, preferred_element_type=f32))
    o_ref[:, :] = acc


def _launch_tm(geo, packed, bases, tapsT, xt, n_out, C, interpret,
               static):
    need = geo.xblocks * _TM_GB
    xp = jnp.pad(xt, ((0, max(0, need - xt.shape[0])), (0, 0)))[:need]
    nxb = geo.uw // _TM_GB
    grid8 = lambda j, b: (jax.lax.div(j, jnp.int32(8)), j * 0)  # noqa: E731

    def xmap(i):
        return lambda j, b, _i=i: (b[j] + _i, j * 0)

    out = pl.pallas_call(
        functools.partial(_ktm_kernel, NXB=nxb, **static),
        out_shape=jax.ShapeDtypeStruct((geo.tiles8 * _NO, C), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(geo.tiles8,),
            in_specs=[
                pl.BlockSpec((8, _NO), grid8),
                *[pl.BlockSpec((_TM_GB, C), xmap(i)) for i in range(nxb)],
                pl.BlockSpec((1, *tapsT.shape[1:]),
                             lambda j, b: (j, j * 0, j * 0)),
            ],
            out_specs=pl.BlockSpec((_NO, C), lambda j, b: (j, j * 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bases, packed, *([xp] * nxb), tapsT)
    return out[:n_out]


def chan_resample_tm(xt, u0, pfb, dpfb, nphi: int, delta_fx: int,
                     n_out: int, interpret: bool = False, d0=None):
    """TIME-MAJOR batched arbitrary resample: xt (E, C) channels sharing
    phase accumulator u0 (and deficit d0, folded into the window starts
    — no shifted x copy). Returns (n_out, C) float32 (time-major; no
    transpose anywhere on the path)."""
    T = pfb.shape[0]
    C = xt.shape[1]
    geo = tm_geometry(nphi, delta_fx, T, n_out, C)
    if geo is None:
        raise ValueError("tm geometry inapplicable")
    packed, bases, rem = _prep_indices_tm(geo, nphi, delta_fx, u0, d0)
    tapsT = _host_taps_arb(pfb, dpfb, rem, nphi)
    static = dict(T=T, UW=geo.uw)
    return _launch_tm(geo, packed, bases, tapsT, xt.astype(jnp.float32),
                      n_out, C, interpret, static)


def chan_resample_farrow_tm(xt, u0, coeffs, nphi: int, delta_fx: int,
                            n_out: int, interpret: bool = False,
                            d0=None):
    """TIME-MAJOR batched Farrow resample: xt (E, C). -> (n_out, C)."""
    P1, T = coeffs.shape
    C = xt.shape[1]
    geo = tm_geometry(nphi, delta_fx, T, n_out, C)
    if geo is None:
        raise ValueError("tm geometry inapplicable")
    packed, bases, rem = _prep_indices_tm(geo, nphi, delta_fx, u0, d0)
    tapsT = _host_taps_farrow(coeffs, rem, nphi)
    static = dict(T=T, UW=geo.uw)
    return _launch_tm(geo, packed, bases, tapsT, xt.astype(jnp.float32),
                      n_out, C, interpret, static)
