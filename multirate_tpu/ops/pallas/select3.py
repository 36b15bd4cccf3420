"""Fused arbitrary/Farrow resampler Pallas kernels, v3 (fat static tiles).

v2 (select2.py, since removed) was correct but grid-step-bound: ~920 tiles of 512 outputs,
each with scalar-prefetched data-dependent block indexing (~4 us/step of
DMA-issue overhead dominates the tiny compute). v3 removes every dynamic
index from the BlockSpecs so the pipeline is fully static, and each grid
step processes NSUB sub-tiles of 512 outputs:

- STEP = NSUB*512 outputs per grid step. The covering x block index is the
  affine-shift approximation bj(j) = (j*P2) >> 20 of the true base block
  (biased low; drift <= 1 block over <= 2^10 steps). Block height XR is
  sized so one step's span plus jitter fits two adjacent blocks for ANY
  traced entry phase u0.
- Per output, ONE packed int32 of kernel input (4 B/output): window start
  relative to its sub-tile's row base (11 bits) + phase (5 bits, arb) +
  alpha (16 bits) / psi (21 bits, Farrow) at 2^-16-ish quantization —
  inside the 1e-4 budget.
- Index prep is two-level: exact int64 carries to each STEP base (a tiny
  (steps,) vector), then per-slot math with one divide — no wide products
  on the big grid.
- Per sub-tile: a scalar row base dynamic-slices the in-VMEM x block;
  one-hot row/bank selects run as TWO bf16 passes (operands split hi+lo;
  one-hot rows are bf16-exact) — 3x cheaper than HIGHEST at ~2^-16
  relative error; windows gather via the native lane gather.

The deficit must be folded into the data (callers shift x by d0-1, as the
grouped rational kernel does); u0 stays traced.

Reference semantics: Filters.jl:693-742 (arbitrary), 780-836 (Farrow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import PHASE_FRAC_BITS

__all__ = ["window_resample_v3", "window_resample_farrow_v3",
           "v3_geometry"]

_LANES = 128
_SB = 512          # outputs per sub-tile
_Q_BITS = 11       # window start relative to sub-tile row base (< 2048)
_SH2 = 20          # affine block-base shift
_MAX_STEPS = 1 << 10


def _split16(v):
    """(hi, lo) bf16 pair with hi + lo == v to ~2^-16 relative.

    Delegates to precision.split_bf16: the round-based formulation is
    folded to lo == 0 by XLA under --xla_allow_excess_precision (see
    ops/precision.py) — this bit the tap-bank splits below, which run at
    the XLA level on dynamic param arrays."""
    from .. import precision as prec

    return prec.split_bf16(v)


def _dot2(oh16, xs_h, xs_l):
    """Select at ~2^-16: one-hot rows are bf16-exact, x split hi+lo."""
    f32 = jnp.float32
    return (jnp.dot(oh16, xs_h, preferred_element_type=f32)
            + jnp.dot(oh16, xs_l, preferred_element_type=f32))


class V3Geometry:
    """Static tile geometry for one (nphi, delta_fx, T, n_out, nsub)."""

    def __init__(self, nphi, delta_fx, T, n_out, nsub):
        D = nphi << PHASE_FRAC_BITS
        self.D = D
        self.step_out = nsub * _SB
        self.steps = -(-n_out // self.step_out)
        self.steps8 = -(-self.steps // 8) * 8
        # per-sub-tile covering rows (window start span within one
        # sub-tile + taps + lane boundary + jitter), 8-rounded
        ms = delta_fx // D + 1
        self.rqs = -(-(_SB * ms + T + _LANES) // _LANES) + 2
        self.rqs = -(-self.rqs // 8) * 8
        # block height: one step's input span + window + 2 rows jitter,
        # so [bj, bj+2) blocks always cover the step for any u0
        span_rows = -(-(self.step_out * delta_fx // D + T + 2 * _LANES)
                      // _LANES)
        self.xr = -(-(span_rows + 8) // 8) * 8
        # affine block base, biased low: bj <= true base block
        adv = (self.step_out * (delta_fx / D)) / (self.xr * _LANES)
        self.p2 = max(0, int(adv * (1 << _SH2)))
        self.ok = (T <= 128 and self.rqs <= 2 * self.xr - 8
                   and (1 << _Q_BITS) >= self.rqs * _LANES
                   and self.steps8 <= _MAX_STEPS
                   and self.steps8 * self.step_out < (1 << 31))

    def block_bases(self):
        j = jnp.arange(self.steps8, dtype=jnp.int32)
        return (j * jnp.int32(self.p2)) >> _SH2


def v3_geometry(nphi, delta_fx, T, n_out, nsub=16, farrow=False):
    """Geometry or None. nphi gates: the arb packing gives the phase a
    5-bit field (bits 11-15, below a16), so nphi <= 32 is the hard limit;
    the Farrow psi prep `(rem << 21) // D` needs rem << 21 < 2^63, i.e.
    nphi <= 1024. Out-of-range configs fall back to the v1-winsel/windows
    paths instead of silently corrupting the phase field."""
    if farrow:
        if nphi > 1024:
            return None
    elif nphi > 32:
        return None
    g = V3Geometry(nphi, delta_fx, T, n_out, nsub)
    return g if g.ok else None


def _prep_indices(geo, nphi, delta_fx, u0, farrow):
    """(packed (steps8, step_out) int32, rb (steps8, nsub) int32).

    Two-level exact math: int64 carries to per-step bases (tiny vectors),
    then per-slot s*delta with one divide — s*rd < 2^52, no wide products
    on the big grid.
    """
    D = geo.D
    steps8, S = geo.steps8, geo.step_out
    qd, rd = divmod(delta_fx, D)
    j = jnp.arange(steps8, dtype=jnp.int64)
    # exact per-step entry state: u_j = (u0 + j*S*delta) with div/mod D
    from .. import indexing as idx

    in_base, u_base = idx._muladd_divmod(j * S, delta_fx, u0, D)
    s = jax.lax.broadcasted_iota(jnp.int64, (steps8, S), 1)
    t = u_base[:, None] + s * rd                  # < D + 2^14 * D < 2^52
    q_rel = s * qd + t // D                       # samples past step base
    rem = t % D
    q_abs = in_base[:, None] + q_rel              # 0-based window starts
    bj = geo.block_bases().astype(jnp.int64)
    q_blk = q_abs - bj[:, None] * (geo.xr * _LANES)
    nsub = S // _SB
    firsts = q_blk[:, ::_SB]
    rb = jnp.clip(firsts >> 7, 0, 2 * geo.xr - geo.rqs).astype(jnp.int32)
    rb_full = jnp.repeat(rb, _SB, axis=1)
    q_sub = jnp.clip(q_blk - rb_full.astype(jnp.int64) * _LANES,
                     0, (1 << _Q_BITS) - 1).astype(jnp.int32)
    if farrow:
        hi = ((rem << 21) // D).astype(jnp.int32)          # 21-bit psi frac
        packed = q_sub | (hi << _Q_BITS)
    else:
        phi = (rem >> PHASE_FRAC_BITS).astype(jnp.int32)
        a16 = ((rem & ((1 << PHASE_FRAC_BITS) - 1))
               >> (PHASE_FRAC_BITS - 16)).astype(jnp.int32)
        packed = q_sub | (phi << _Q_BITS) | (a16 << 16)
    return packed, rb


def _sub_slice(xcat, rb, RQS):
    """Rows [rb, rb+RQS) of the f32 x block, split hi/lo AFTER slicing.
    Mosaic has no dynamic_slice lowering and its dynamic rotate supports
    only 32-bit data (so roll f32, not the bf16 halves); a dynamic
    sublane rotate + static slice is equivalent
    (rolled[i] = x[(i + rb) mod n])."""
    n = xcat.shape[0]
    shift = jnp.int32(n) - rb
    xs = pltpu.roll(xcat, shift, axis=0)[0:RQS]
    return _split16(xs)


def _select_rows(pk, xs_h, xs_l, iota_r):
    """(A, A2, lane): A[n, :] = xs[row_n, :], A2 the next row, and the
    in-row lane of each output's window start. Row selection is two
    bf16x2 one-hot matmuls (MXU); the per-output LANE extraction is NOT
    done here — the native (SB, 128) lane gather it used to feed measured
    ~100x slower than everything else in the kernel combined (the gather
    unit walks elements); callers fold the lane shift into the TAP matrix
    instead (_apply_taps)."""
    q_sub = jax.lax.bitwise_and(pk, jnp.int32((1 << _Q_BITS) - 1))
    row = jax.lax.shift_right_logical(q_sub, jnp.int32(7))
    lane = jax.lax.bitwise_and(q_sub, jnp.int32(_LANES - 1))
    oh = (iota_r == row[:, None]).astype(jnp.bfloat16)
    oh2 = (iota_r == (row + 1)[:, None]).astype(jnp.bfloat16)
    A = _dot2(oh, xs_h, xs_l)
    A2 = _dot2(oh2, xs_h, xs_l)
    return A, A2, lane


def _apply_taps(A, A2, lane, taps, iota_l, T: int):
    """y[n] = sum_t taps[n, t] * window_n[t] with window_n[t] =
    (A|A2)[n, lane_n + t], WITHOUT any per-row gather: rotate each tap
    row right by lane_n with a 7-stage masked barrel shifter (static
    power-of-two lane rolls + selects — whole-row VPU ops, no per-element
    gather and no sub-vreg broadcasts), then contract elementwise. After
    rotation, tap t of row n sits at lane (lane_n + t) mod 128; lanes
    >= lane_n read from A (same row), wrapped lanes < lane_n read from A2
    (the next row) — one select handles the row crossing. Requires
    T <= 128 - no-overlap: lane+T wrap never reaches lane again (T <=
    _LANES guaranteed by v3_geometry)."""
    # mask junk beyond the T real taps (the packed bank layout carries
    # dpfb values at lanes [64, 64+T))
    rot = jnp.where(iota_l < jnp.int32(T), taps, jnp.float32(0.0))
    lane2 = lane[:, None]  # minor-dim insert on int32 (bool is rejected)
    for b in range(7):
        sh = 1 << b
        bit2 = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(lane2, jnp.int32(b)), jnp.int32(1))
        rot = jnp.where(bit2 == jnp.int32(1),
                        pltpu.roll(rot, jnp.int32(sh), axis=1), rot)
    src = jnp.where(iota_l >= lane2, A, A2)
    return jnp.sum(src * rot, axis=1)


def _k3_arb(pk_ref, rb_ref, xa, xb, banks, o_ref, *, NSUB: int, RQS: int,
            T: int, NPHI: int):
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    f32 = jnp.float32
    xcat = jnp.concatenate([xa[:], xb[:]], axis=0)       # (2*XR, 128)
    dual = T > 64     # dual-row bank layout (packed fits only T <= 64)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_SB, _LANES), 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_SB, RQS), 1)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (_SB, NPHI), 1)
    for k in range(NSUB):
        pk = pk_ref[sub, k * _SB:(k + 1) * _SB]
        rb = rb_ref[sub, k]
        xs_h, xs_l = _sub_slice(xcat, rb, RQS)
        A, A2, lane = _select_rows(pk, xs_h, xs_l, iota_r)
        # mask the full 5-bit field (NOT nphi-1: that mask is only
        # correct for power-of-two nphi); any phi value <= 31 survives
        phi = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(pk, jnp.int32(_Q_BITS)),
            jnp.int32(31))
        alpha = jax.lax.shift_right_logical(pk, jnp.int32(16)).astype(f32) \
            * jnp.float32(2.0 ** -16)
        ohp = (iota_p == phi[:, None]).astype(jnp.bfloat16)
        if dual:
            # banks = [pfb_h; dpfb_h; pfb_l; dpfb_l] (4*NPHI, 128)
            TH = _dot2(ohp, banks[0:NPHI, :], banks[2 * NPHI:3 * NPHI, :])
            THd = _dot2(ohp, banks[NPHI:2 * NPHI, :], banks[3 * NPHI:, :])
        else:
            # packed: lanes [0:T] pfb, [64:64+T] dpfb; hi rows then lo rows
            TH = _dot2(ohp, banks[0:NPHI, :], banks[NPHI:2 * NPHI, :])
            THd = pltpu.roll(TH, jnp.int32(64), axis=1)
        taps = TH + alpha[:, None] * THd
        o_ref[sub, k * _SB:(k + 1) * _SB] = _apply_taps(
            A, A2, lane, taps, iota_l, T)


def _k3_farrow(pk_ref, rb_ref, xa, xb, coeffs, o_ref, *, NSUB: int,
               RQS: int, T: int, NPHI: int, P1: int):
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    f32 = jnp.float32
    xcat = jnp.concatenate([xa[:], xb[:]], axis=0)
    ch = coeffs[0:P1, :]
    cl = coeffs[P1:2 * P1, :]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_SB, _LANES), 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_SB, RQS), 1)
    for k in range(NSUB):
        pk = pk_ref[sub, k * _SB:(k + 1) * _SB]
        rb = rb_ref[sub, k]
        xs_h, xs_l = _sub_slice(xcat, rb, RQS)
        A, A2, lane = _select_rows(pk, xs_h, xs_l, iota_r)
        # psi = 1 + 21-bit fraction * nphi, in [1, nphi + 1)
        u21 = jax.lax.shift_right_logical(pk, jnp.int32(_Q_BITS))
        psi = jnp.float32(1.0) + u21.astype(f32) * jnp.float32(
            NPHI * 2.0 ** -21)
        pw = [jnp.ones_like(psi)]
        for _ in range(P1 - 1):
            pw.append(pw[-1] * psi)
        powers = jnp.stack(pw, axis=1)                   # (SB, P1)
        pw_h, pw_l = _split16(powers)
        taps = (jnp.dot(pw_h, ch, preferred_element_type=f32)
                + jnp.dot(pw_h, cl, preferred_element_type=f32)
                + jnp.dot(pw_l, ch, preferred_element_type=f32))
        o_ref[sub, k * _SB:(k + 1) * _SB] = _apply_taps(
            A, A2, lane, taps, iota_l, T)


def _launch(kernel, bank_pair, geo, nphi, delta_fx, u0, x, n_out,
            interpret, extra_static):
    packed, rb = _prep_indices(geo, nphi, delta_fx, u0,
                               farrow="P1" in extra_static)
    nsub = geo.step_out // _SB
    max_bj = ((geo.steps8 - 1) * geo.p2) >> _SH2
    need = (max_bj + 2) * geo.xr * _LANES
    xp = jnp.pad(x, (0, max(0, need - x.shape[0])))[:need]
    x2d = xp.reshape(-1, _LANES)

    p2, sh = geo.p2, _SH2     # python ints: index maps may not capture
                              # tracers, and int32 weak typing keeps the
                              # arithmetic 32-bit

    def xmap_a(j):
        return ((j * p2) >> sh, j * 0)    # j*p2 < 2^31: >> == logical

    def xmap_b(j):
        return (((j * p2) >> sh) + 1, j * 0)

    grid8 = lambda j: (jax.lax.div(j, jnp.int32(8)), j * 0)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(kernel, NSUB=nsub, RQS=geo.rqs,
                          T=extra_static.pop("T"), NPHI=nphi,
                          **extra_static),
        out_shape=jax.ShapeDtypeStruct((geo.steps8, geo.step_out), x.dtype),
        grid=(geo.steps8,),
        in_specs=[
            pl.BlockSpec((8, geo.step_out), grid8),
            pl.BlockSpec((8, nsub), grid8),
            pl.BlockSpec((geo.xr, _LANES), xmap_a),
            pl.BlockSpec((geo.xr, _LANES), xmap_b),
            pl.BlockSpec(bank_pair.shape, lambda j: (j * 0, j * 0)),
        ],
        out_specs=pl.BlockSpec((8, geo.step_out), grid8),
        interpret=interpret,
    )(packed, rb, x2d, x2d, bank_pair)
    return out.reshape(geo.steps8 * geo.step_out)[:n_out]


def window_resample_v3(x, u0, pfb, dpfb, nphi: int, delta_fx: int,
                       n_out: int, nsub: int = 16,
                       interpret: bool = False):
    """Fused arbitrary resample over deficit-shifted 1-D ``x``:
    y[n] = sum_t (pfb[t,phi_n] + alpha_n*dpfb[t,phi_n]) * x[q_n + t]
    with (q, phi, alpha) derived in closed form from traced ``u0``."""
    T = pfb.shape[0]
    geo = v3_geometry(nphi, delta_fx, T, n_out, nsub)
    if geo is None:
        raise ValueError("v3 geometry inapplicable; use the v2 kernel")
    if T <= 64:
        banks = jnp.zeros((nphi, _LANES), jnp.float32)
        banks = banks.at[:, :T].set(pfb.T.astype(jnp.float32))
        banks = banks.at[:, 64:64 + T].set(dpfb.T.astype(jnp.float32))
        bh, bl = _split16(banks)
        pair = jnp.concatenate([bh, bl], axis=0)         # (2*NPHI, 128)
    else:
        bp = jnp.zeros((nphi, _LANES), jnp.float32).at[:, :T].set(
            pfb.T.astype(jnp.float32))
        bd = jnp.zeros((nphi, _LANES), jnp.float32).at[:, :T].set(
            dpfb.T.astype(jnp.float32))
        ph, plo = _split16(bp)
        dh, dlo = _split16(bd)
        pair = jnp.concatenate([ph, dh, plo, dlo], axis=0)  # (4*NPHI, 128)
    return _launch(_k3_arb, pair, geo, nphi, delta_fx, u0,
                   x.astype(jnp.float32), n_out, interpret, {"T": T})


def window_resample_farrow_v3(x, u0, coeffs, nphi: int, delta_fx: int,
                              n_out: int, nsub: int = 16,
                              interpret: bool = False):
    """Fused Farrow resample over deficit-shifted 1-D ``x``: per-output
    taps are powers(psi_n) @ coeffs with psi quantized to 21 bits."""
    P1, T = coeffs.shape
    geo = v3_geometry(nphi, delta_fx, T, n_out, nsub)
    if geo is None:
        raise ValueError("v3 geometry inapplicable; use the v2 kernel")
    C = jnp.zeros((P1, _LANES), jnp.float32).at[:, :T].set(
        coeffs.astype(jnp.float32))
    ch, cl = _split16(C)
    pair = jnp.concatenate([ch, cl], axis=0)             # (2*P1, 128)
    return _launch(_k3_farrow, pair, geo, nphi, delta_fx, u0,
                   x.astype(jnp.float32), n_out, interpret,
                   {"T": T, "P1": P1})
