"""Rational-grid tile-adaptive fused arbitrary/Farrow resampler ("gridsel").

The single-channel arbitrary resampler is VPU-floor-bound in the winsel
kernels (~1 vreg-op per 8 outputs of per-output select work — select3.py)
and the batched chansel kernel's amortization needs many channels sharing
one phase accumulator (select4.py). This kernel finds the batch axis
INSIDE a single channel: on the rational grid of the convergent
M2/L2 ~ delta_fx/D, output n = jj*L2 + r has window start

    start_n = jj*M2 + (d0 - 1) + w div D,   w = u0 + r*delta + jj*eps

with eps = L2*delta - M2*D the tiny convergent residue. For a TILE of JT
consecutive jj rows the per-column (window offset q, bank phi, alpha/psi)
structure is *constant up to at most one sub-bank crossing* (JT chosen so
JT*|eps| <= 2^32 arb / <= D Farrow), so the tile's resample is ONE matmul

    Y (JT, L2) = X (JT, band) @ K (band, L2-cols)

against a banded tap matrix K built in-kernel by T compare-placement VPU
stages over HOST-BUILT tap rows, amortized over JT*L2 outputs.

Round-5 "valder" formulation (the round-4 kernels contracted 2 (arb) ..
P1 = polyorder+1 (Farrow) tap matrices per variant per tile): because the
within-tile phase drift is only JT*|eps| (sub-1e-3 alpha/psi units for
convergent-grade eps), the per-lane tap VALUES are tile-constant to first
order. The host therefore evaluates them directly —

    V = pfb[phi] + alpha0*dpfb[phi]        (arb: the Filters.jl:677-690
                                            interpolated taps at the
                                            tile-start alpha)
    V = polyval(coeffs, psi0)  (Farrow: the Filters.jl:780-792 polynomial
                                taps at the tile-start psi, in f64)

— plus the exact first-order drift row D (dpfb / polyval'), and the
kernel computes y = mm(K_V) + (row*deps)*mm(K_D): TWO matmuls per tile
for BOTH kernels (was 4 arb / 2*P1 Farrow), with the D term a <= ~1e-3-
coefficient correction contracted in one bf16 pass. Second-order error is
(JT*|eps|)^2 * taps'' — many orders below the 1e-4 budget.

Crossings are handled SPARSELY: a tile needs the variant-B (past-the-
crossing) taps only when some lane's crossing row lands inside the tile —
probability JT*|eps|/2^32 per lane (~1e-3 for convergent-grade eps), so
whole blocks contain only a handful of crossing tiles. The B build+matmul
+select runs under pl.when(min(rowc) < JT) and costs nothing on the
(overwhelmingly common) crossing-free tiles. Packed plans (2*L2 <= 128)
resolve variants in the lane dimension instead and only the static
roll+select is conditional.

Reference semantics preserved exactly: window start / bank index / alpha
are the reference accumulator recurrence (Filters.jl:663-673, 693-742) in
closed form; index decisions are exact int64 (packed host-side), only
alpha/psi carries the usual f32 quantization (~1e-7, inside the 1e-4
budget).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import precision as prec

__all__ = ["gridsel_resample_fused", "gridsel_resample_batch",
           "gridsel_farrow_horner_fused", "gridsel_farrow_horner_batch"]

_HI = jax.lax.Precision.HIGHEST
_QBITS = 10          # window offset q within the 2-row span (< 1024)

# placement formulation knob for on-TPU A/B (exp20/exp30):
#   fma   — m_f = (iou == q+t).astype(f32); k += m_f * row  (default)
#   where — k += where(m, row, 0)  (round-3 formulation)
_PLACE_IMPL = os.environ.get("GRIDSEL_PLACE", "fma")

# TIMING-ONLY stage ablation (exp31; results numerically WRONG — never
# set outside experiments): "noplace" skips the T placement stages,
# "nomm" skips the band matmuls, "nosel" skips the crossing-variant
# select, "noder" skips the drift-derivative correction matmul.
_ABLATE = frozenset(
    a for a in os.environ.get("GRIDSEL_ABLATE", "").split(",") if a)


def _make_mm(xa, JT: int, M2: int, sp2: int, three_pass: bool):
    """(mm3, mm1): K -> (JT, cols) contractions of the tile's band window.

    ``xa`` rows are host-tiled with OVERLAP (ops/gridsel._tile_x): row j
    holds x[j*M2 : j*M2 + M2p] with M2p = ceil128(sp2) >= sp2, so the
    whole two-stream-row band window is ONE contiguous, 128-lane-aligned
    slice. mm3 is the exact-grade 3-pass bf16-split contraction (~2^-15
    relative, half the MXU passes of HIGHEST); mm1 is a single bf16 pass
    (~2^-8 relative) for correction-scale terms whose coefficient already
    carries >= 2^-10 (the valder drift row)."""
    f32 = jnp.float32
    if "nomm" in _ABLATE:
        zmm = lambda K: jnp.zeros((JT, K.shape[-1]), f32) + K[0:1, :]  # noqa: E731
        return zmm, zmm
    if not three_pass:
        def mm3(K):
            return jnp.dot(xa[:JT, :sp2], K[:sp2], precision=_HI,
                           preferred_element_type=f32)
        return mm3, mm3
    x0h, x0l = prec.split_bf16_kernel(xa[:JT, :sp2])

    def mm3(K):
        kh, kl = prec.split_bf16_kernel(K[:sp2])
        return (jnp.dot(x0h, kh, preferred_element_type=f32)
                + jnp.dot(x0h, kl, preferred_element_type=f32)
                + jnp.dot(x0l, kh, preferred_element_type=f32))

    def mm1(K):
        return jnp.dot(x0h, K[:sp2].astype(jnp.bfloat16),
                       preferred_element_type=f32)
    return mm3, mm1


# BUILD-AND-CONSUME placement discipline (this is load-bearing): each
# (sp2, L2p) banded tap matrix is ~20-30 vregs. Building several of a
# tile's matrices before contracting them keeps them LIVE through every
# placement stage — past the vector register file — and every stage then
# round-trips its accumulators through VMEM. Measured on the batched
# Farrow kernel (exp/exp18): the all-live build was 7.7x slower than the
# same kernel with placement removed. The valder flow places exactly ONE
# (V, D) pair per executed variant and contracts it immediately.


def _place2(q, rows_p, rows_d, *, T: int, sp2: int, L2p: int):
    """(kP, kD): rows_*[t] placed at row q_col + t of column col. The
    per-t mask is shared by the pair (exp20: fma beats where ~20%)."""
    f32 = jnp.float32
    iou = jax.lax.broadcasted_iota(jnp.int32, (sp2, L2p), 0)
    z = jnp.float32(0.0)
    kP = jnp.zeros((sp2, L2p), f32)
    kD = jnp.zeros((sp2, L2p), f32)
    for t in range(T):
        if _PLACE_IMPL == "fma":
            m_f = (iou == (q + jnp.int32(t))[None, :]).astype(f32)
            kP = kP + m_f * rows_p[t:t + 1, :]
            kD = kD + m_f * rows_d[t:t + 1, :]
        else:
            m = iou == (q + jnp.int32(t))[None, :]
            kP = kP + jnp.where(m, rows_p[t:t + 1, :], z)
            kD = kD + jnp.where(m, rows_d[t:t + 1, :], z)
    return kP, kD


def _seg_geom(M2: int, sp2: int):
    """Segmented K layout of the fused kernels: logical band row v maps to
    physical row v (v < M2) or M2r + (v - M2) (v >= M2), with
    M2r = ceil8(M2). Segment 1 contracts against the tile's own (JT, M2)
    rows, segment 2 against the next row's leading sp2 - M2 lanes — the
    CLAUDE.md "sum per-part matmuls" form, which needs no lane-offset
    widening in VMEM (Mosaic cannot lower misaligned lane concats or
    in-kernel scatter; interpret mode does not catch either)."""
    M2r = -(-M2 // 8) * 8
    ovl = sp2 - M2
    ovr = -(-ovl // 8) * 8
    return M2r, ovl, M2r + ovr


def _make_mm_fused(main_ref, nxt_ref, *, JT: int, M2: int, sp2: int,
                   three_pass: bool):
    """(mm3, mm1) for the fused-input tile: K is in the SEGMENTED (SP2R,
    L2p) layout of _seg_geom.

    X1 = the tile's (JT, M2) rows; X2 = the same rows shifted one row up
    (sublane concat + roll), lanes [0, sp2-M2): row j's band window
    [j*M2, j*M2 + sp2) = X1[j] ++ X2[j]. Replaces the HBM-materialized
    _tile_x overlap tiling (43 MB written + re-read per 8M block — >50%
    of round-3 gridsel wall time, exp32)."""
    f32 = jnp.float32
    M2r, ovl, _ = _seg_geom(M2, sp2)
    X1 = main_ref[...]                                    # (JT, M2)
    z = jnp.concatenate([X1, nxt_ref[...]], axis=0)       # (JT+8, M2)
    # row r -> z[r+1]: jnp.roll semantics, shift n-1 (must be >= 0)
    X2 = pltpu.roll(z, jnp.int32(JT + 8 - 1), axis=0)[:JT, :ovl]
    if "nomm" in _ABLATE:
        zmm = lambda K: jnp.zeros((JT, K.shape[-1]), f32) + K[0:1, :]  # noqa: E731
        return zmm, zmm
    if not three_pass:
        def mm3(K):
            return (jnp.dot(X1, K[:M2], precision=_HI,
                            preferred_element_type=f32)
                    + jnp.dot(X2, K[M2r:M2r + ovl], precision=_HI,
                              preferred_element_type=f32))
        return mm3, mm3
    x1h, x1l = prec.split_bf16_kernel(X1)
    x2h, x2l = prec.split_bf16_kernel(X2)

    def mm3(K):
        k1 = K[:M2]
        k2 = K[M2r:M2r + ovl]
        k1h, k1l = prec.split_bf16_kernel(k1)
        k2h, k2l = prec.split_bf16_kernel(k2)
        return (jnp.dot(x1h, k1h, preferred_element_type=f32)
                + jnp.dot(x1h, k1l, preferred_element_type=f32)
                + jnp.dot(x1l, k1h, preferred_element_type=f32)
                + jnp.dot(x2h, k2h, preferred_element_type=f32)
                + jnp.dot(x2h, k2l, preferred_element_type=f32)
                + jnp.dot(x2l, k2h, preferred_element_type=f32))

    def mm1(K):
        return (jnp.dot(x1h, K[:M2].astype(jnp.bfloat16),
                        preferred_element_type=f32)
                + jnp.dot(x2h, K[M2r:M2r + ovl].astype(jnp.bfloat16),
                          preferred_element_type=f32))
    return mm3, mm1


def _phys_rows(v, M2: int, M2r: int):
    """Map logical band rows to the segmented physical layout."""
    if M2r == M2:
        return v
    return v + jnp.where(v >= jnp.int32(M2), jnp.int32(M2r - M2),
                         jnp.int32(0))


def _seg_place2(M2: int, sp2: int):
    """_place2 for the segmented layout (same stage count/cost; the row
    remap is one cheap (1, L2p) vector op per stage)."""
    M2r, _, SP2R = _seg_geom(M2, sp2)

    def place2(q, rows_p, rows_d, *, T, sp2, L2p):  # noqa: ARG001
        f32 = jnp.float32
        iou = jax.lax.broadcasted_iota(jnp.int32, (SP2R, L2p), 0)
        z = jnp.float32(0.0)
        kP = jnp.zeros((SP2R, L2p), f32)
        kD = jnp.zeros((SP2R, L2p), f32)
        for t in range(T):
            vp = _phys_rows(q + jnp.int32(t), M2, M2r)
            if _PLACE_IMPL == "fma":
                m_f = (iou == vp[None, :]).astype(f32)
                kP = kP + m_f * rows_p[t:t + 1, :]
                kD = kD + m_f * rows_d[t:t + 1, :]
            else:
                m = iou == vp[None, :]
                kP = kP + jnp.where(m, rows_p[t:t + 1, :], z)
                kD = kD + jnp.where(m, rows_d[t:t + 1, :], z)
        return kP, kD
    return place2


def _rows_of(tr_ref, nv: int):
    """Slice the per-tile (1, NV*T8, L2p) host row block into NV (T8, L2p)
    matrices: (V, D) packed/driftless; (V, D, dD) arb (the crossing
    delta is proportional to dD: gamma*mm(dD)); (V, D, dV, dD) Farrow."""
    T8 = tr_ref.shape[1] // nv
    return tuple(tr_ref[0, i * T8:(i + 1) * T8, :] for i in range(nv))


def _place1(q, rows, *, T: int, sp2: int, L2p: int, row0: int = 0):
    """One placed matrix from rows[row0 + t] (the Horner fallback's
    per-power-slice build)."""
    f32 = jnp.float32
    iou = jax.lax.broadcasted_iota(jnp.int32, (sp2, L2p), 0)
    z = jnp.float32(0.0)
    k = jnp.zeros((sp2, L2p), f32)
    for t in range(T):
        if _PLACE_IMPL == "fma":
            m_f = (iou == (q + jnp.int32(t))[None, :]).astype(f32)
            k = k + m_f * rows[row0 + t:row0 + t + 1, :]
        else:
            m = iou == (q + jnp.int32(t))[None, :]
            k = k + jnp.where(m, rows[row0 + t:row0 + t + 1, :], z)
    return k


def _seg_place1(M2: int, sp2: int):
    M2r, _, SP2R = _seg_geom(M2, sp2)

    def place1(q, rows, *, T, sp2, L2p, row0=0):  # noqa: ARG001
        f32 = jnp.float32
        iou = jax.lax.broadcasted_iota(jnp.int32, (SP2R, L2p), 0)
        z = jnp.float32(0.0)
        k = jnp.zeros((SP2R, L2p), f32)
        for t in range(T):
            vp = _phys_rows(q + jnp.int32(t), M2, M2r)
            if _PLACE_IMPL == "fma":
                m_f = (iou == vp[None, :]).astype(f32)
                k = k + m_f * rows[row0 + t:row0 + t + 1, :]
            else:
                m = iou == vp[None, :]
                k = k + jnp.where(m, rows[row0 + t:row0 + t + 1, :], z)
        return k
    return place1


def _farrow_horner_flow(o_write, mm3, pk, rowc, a0, rowf, cf, *, T: int,
                        P1: int, nphi: int, sp2: int, L2: int, L2p: int,
                        dir_: int, deps: float, packed: bool, place1):
    """LARGE-DRIFT Farrow fallback: when a plan's within-tile psi drift
    JT*|eps|*2^-32 exceeds the valder linearization budget (plans whose
    best convergent has a big residue), taps must be re-evaluated
    per-row: psi-Horner with each power-slice K placed and contracted one
    at a time (the round-4 kernel; see the build-and-consume note).
    Crossings are then frequent, so both variants are computed
    unconditionally. ``cf`` rows are lane-pre-broadcast host coeffs
    (row p*T + t = coeffs[p, t] across lanes)."""
    plin = a0[None, :] + rowf * jnp.float32(deps)
    q = jax.lax.bitwise_and(pk, jnp.int32((1 << _QBITS) - 1))
    f32 = jnp.float32

    def horner(qv, psi):
        acc = None
        for p in range(P1 - 1, -1, -1):
            if "noplace" in _ABLATE:
                k = jnp.zeros((sp2, L2p), f32) + cf[p * T:p * T + 1, :]
            else:
                k = place1(qv, cf, T=T, sp2=sp2, L2p=L2p, row0=p * T)
            G = mm3(k)
            acc = G if acc is None else acc * psi + G
        return acc

    if packed or dir_ == 0:
        acc = horner(q, plin)
        if dir_ == 0 or "nosel" in _ABLATE:
            o_write(acc)
            return
        yB = pltpu.roll(acc, jnp.int32(L2p - L2), axis=1)
        o_write(jnp.where(rowf >= rowc[None, :], yB, acc))
        return
    accA = horner(q, plin)
    if "nosel" in _ABLATE:
        o_write(accA)
        return
    qB = jax.lax.bitwise_and(
        jax.lax.shift_right_logical(pk, jnp.int32(_QBITS)),
        jnp.int32((1 << _QBITS) - 1))
    accB = horner(qB, plin - jnp.float32(dir_ * nphi))
    o_write(jnp.where(rowf >= rowc[None, :], accB, accA))


def _valder_flow(o_write, mm3, mm1, pk, rowc, a0, rowf, rows, *, T: int,
                 sp2: int, L2: int, L2p: int, JTP: int, dir_: int,
                 deps: float, packed: bool, place2, place1):
    """The shared tile flow: place (V, D), y = mm3(K_V) + drift*mm1(K_D),
    then add the crossing delta UNCONDITIONALLY:

        y += (rowf >= rowc) * (mm1(K_dV) + drift*mm1(K_dD))

    against the host-precancelled delta rows (ops/gridsel._delta_rows).
    ``pk`` packs q | qB << _QBITS (both host-resolved exact int64);
    ``rowc`` is the per-lane crossing row clipped to [0, JTP].

    Round-5 history: (a) a pl.when-guarded full variant-B build taxed
    EVERY tile ~0.2-0.3 ms/block even with the branch essentially never
    taken (the round-3 boundary-tile finding again) — hence
    unconditional; (b) a single-matmul gamma*mm(dD) merge (tap
    continuity) measured 5e-4 errors at bank-WRAP crossings, where the
    window shifts one sample and dV gains O(tap) edge terms — hence the
    exact two-matmul pair."""
    f32 = jnp.float32
    q = jax.lax.bitwise_and(pk, jnp.int32((1 << _QBITS) - 1))

    def place_pair(qv, rv, rd, Tn):
        if "noplace" in _ABLATE:
            return (jnp.zeros((sp2, L2p), f32) + rv[0:1, :],
                    jnp.zeros((sp2, L2p), f32) + rd[0:1, :])
        return place2(qv, rv, rd, T=Tn, sp2=sp2, L2p=L2p)

    drift = rowf * jnp.float32(deps)
    kV, kD = place_pair(q, rows[0], rows[1], T)
    if "noder" in _ABLATE:
        y = mm3(kV)
    else:
        y = mm3(kV) + drift * mm1(kD)
    if dir_ == 0 or "nosel" in _ABLATE:
        o_write(y)
        return
    mask = (rowf >= rowc[None, :]).astype(f32)
    if packed:
        yB = pltpu.roll(y, jnp.int32(L2p - L2), axis=1)
        o_write(y + mask * (yB - y))
        return
    qB = jax.lax.bitwise_and(
        jax.lax.shift_right_logical(pk, jnp.int32(_QBITS)),
        jnp.int32((1 << _QBITS) - 1))
    qd = jnp.minimum(q, qB)
    kdV, kdD = place_pair(qd, rows[2], rows[3], T + 1)
    o_write(y + mask * (mm1(kdV) + drift * mm1(kdD)))


def _kernel_fused(pk_ref, rowc_ref, a0_ref, main, nxt, tr_ref, o_ref, *,
                  JT: int, M2: int, sp2: int, T: int, L2: int, L2p: int,
                  dir_: int, deps: float, three_pass: bool, nv: int,
                  packed: bool = False, d_pass: int = 1):
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    mm3, mm1 = _make_mm_fused(main, nxt, JT=JT, M2=M2, sp2=sp2,
                              three_pass=three_pass)
    rowf = jax.lax.broadcasted_iota(jnp.int32, (JT, L2p), 0).astype(
        jnp.float32)
    _, _, SP2R = _seg_geom(M2, sp2)

    def o_write(y):
        o_ref[:, :] = y[:, :L2].astype(o_ref.dtype)

    _valder_flow(o_write, mm3, mm3 if d_pass == 3 else mm1,
                 pk_ref[sub, :], rowc_ref[sub, :], a0_ref[sub, :],
                 rowf, _rows_of(tr_ref, nv), T=T, sp2=SP2R,
                 L2=L2, L2p=L2p, JTP=JT, dir_=dir_, deps=deps,
                 packed=packed, place2=_seg_place2(M2, sp2),
                 place1=_seg_place1(M2, sp2))


def _kernel_farrow_horner_fused(pk_ref, rowc_ref, a0_ref, main, nxt,
                                cf_ref, o_ref, *, JT: int, M2: int,
                                sp2: int, T: int, P1: int, nphi: int,
                                L2: int, L2p: int, dir_: int, deps: float,
                                three_pass: bool, packed: bool = False):
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    mm3, _ = _make_mm_fused(main, nxt, JT=JT, M2=M2, sp2=sp2,
                            three_pass=three_pass)
    rowf = jax.lax.broadcasted_iota(jnp.int32, (JT, L2p), 0).astype(
        jnp.float32)
    _, _, SP2R = _seg_geom(M2, sp2)

    def o_write(y):
        o_ref[:, :] = y[:, :L2].astype(o_ref.dtype)

    _farrow_horner_flow(o_write, mm3, pk_ref[sub, :], rowc_ref[sub, :],
                        a0_ref[sub, :], rowf, cf_ref[...], T=T, P1=P1,
                        nphi=nphi, sp2=SP2R, L2=L2, L2p=L2p, dir_=dir_,
                        deps=deps, packed=packed,
                        place1=_seg_place1(M2, sp2))


def _launch_fused(kern, packs, xrows, meta_t, num_tiles, interpret,
                  tile_banks=(), banks=()):
    """xrows: (R, M2) row view of the padded stream, R >= num_tiles*JT + 8.
    Two stacked row-block specs feed each tile: its (JT, M2) rows plus the
    following (8, M2) rows (JT % 8 == 0 keeps both block-aligned).
    ``packs``: per-tile (tiles8, L2p) index-state arrays (pk, rowc[, a0]).
    ``tile_banks``: (tiles8, R_, L2p) arrays DMA'd per tile (host V/D tap
    rows); ``banks``: whole-array VMEM residents (Horner cf)."""
    JT, M2, L2, L2p = meta_t
    g8 = lambda j: (jax.lax.div(j, jnp.int32(8)), j * 0)  # noqa: E731
    jt8 = JT // 8
    pk_specs = [pl.BlockSpec((8, L2p), g8) for _ in packs]
    tb_specs = [pl.BlockSpec((1, *b.shape[1:]), lambda j: (j, j * 0, j * 0))
                for b in tile_banks]
    bank_specs = [pl.BlockSpec(b.shape, lambda j: (j * 0, j * 0))
                  for b in banks]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((num_tiles * JT, L2), jnp.float32),
        grid=(num_tiles,),
        in_specs=[
            *pk_specs,
            pl.BlockSpec((JT, M2), lambda j: (j, j * 0)),
            pl.BlockSpec((8, M2), lambda j: ((j + 1) * jt8, j * 0)),
            *tb_specs,
            *bank_specs,
        ],
        out_specs=pl.BlockSpec((JT, L2), lambda j: (j, j * 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*packs, xrows, xrows, *tile_banks, *banks)


def gridsel_resample_fused(xrows, pk, rowc, a0, vdrows, *, JT, M2, sp2,
                           T, L2, L2p, dir_, deps, num_tiles, nv,
                           three_pass=True, packed=False, d_pass=1,
                           interpret=False):
    """Fused-input single-channel valder resample (arb AND Farrow — the
    kernels unified once taps became host VALUES): consumes the (R, M2)
    row view directly (no HBM overlap tiling); two-segment band matmul.
    ``vdrows``: (tiles8, NV*T8, L2p) f32 host-evaluated value/derivative
    tap rows (ops/gridsel._valder_rows_*); ``nv`` its block count.
    ``d_pass``: 3 -> contract the drift/delta rows at full 3-pass grade
    (arb plans whose within-tile alpha drift exceeds the 1-pass bf16
    budget; the fold is exactly linear so only the matmul grade
    matters)."""
    kern = functools.partial(_kernel_fused, JT=JT, M2=M2, sp2=sp2, T=T,
                             L2=L2, L2p=L2p, dir_=dir_, deps=deps,
                             three_pass=three_pass, packed=packed,
                             d_pass=d_pass, nv=nv)
    return _launch_fused(kern, (pk, rowc, a0), xrows, (JT, M2, L2, L2p),
                         num_tiles, interpret, tile_banks=(vdrows,))


def gridsel_farrow_horner_fused(xrows, pk, rowc, a0, cf, *, JT, M2, sp2,
                                T, P1, nphi, L2, L2p, dir_, deps,
                                num_tiles, three_pass=True, packed=False,
                                interpret=False):
    """Fused-input Farrow resample via the per-row psi-Horner fallback
    (large-drift plans; see _farrow_horner_flow)."""
    kern = functools.partial(_kernel_farrow_horner_fused, JT=JT, M2=M2,
                             sp2=sp2, T=T, P1=P1, nphi=nphi, L2=L2,
                             L2p=L2p, dir_=dir_, deps=deps,
                             three_pass=three_pass, packed=packed)
    return _launch_fused(kern, (pk, rowc, a0), xrows, (JT, M2, L2, L2p),
                         num_tiles, interpret, banks=(cf,))


# --------------------------------------------------------------------------- #
# Batched-channel variants: C channels SHARE one FilterState (scalar
# phase/deficit), so the per-tile K build — the T compare-placement stages
# over the host rows, which dominate the single-channel kernel and are
# replicated per channel under vmap — is done ONCE and amortized: only
# the x-window matmuls scale with C. Channels are stacked on the matmul's
# ROW axis: the (CB, JT, M2p) overlap-tiled block collapses (leading-dim
# reshape, a pure relabeling) to one (CB*JT, M2p) operand, so each MXU
# pass runs at CB*JT rows instead of C separate (JT, M2p) calls. JT must
# be a power of two: the output row's channel decomposition r = c*JT +
# rowj is then one AND mask.
# --------------------------------------------------------------------------- #


def _batch_rowf(CB, JTP, L2p):
    """Per-row output-row index within its channel: r = c*JTP + rowj with
    JTP a power of two, so rowj is one AND mask."""
    return jax.lax.bitwise_and(
        jax.lax.broadcasted_iota(jnp.int32, (CB * JTP, L2p), 0),
        jnp.int32(JTP - 1)).astype(jnp.float32)


def _kernel_batch(pk_ref, rowc_ref, a0_ref, xa, tr_ref, o_ref, *,
                  CB: int, JT: int, M2: int, sp2: int, T: int, L2: int,
                  L2p: int, dir_: int, deps: float, nv: int,
                  packed: bool = False, d_pass: int = 1):
    sub = jax.lax.rem(pl.program_id(1), jnp.int32(8))
    M2p = xa.shape[-1]
    X0 = xa[...].reshape(CB * JT, M2p)
    mm3, mm1 = _make_mm(X0, CB * JT, M2, sp2, True)

    def o_write(y):
        for c in range(CB):
            o_ref[c, :, :] = y[c * JT:(c + 1) * JT, :L2].astype(o_ref.dtype)

    _valder_flow(o_write, mm3, mm3 if d_pass == 3 else mm1,
                 pk_ref[sub, :], rowc_ref[sub, :], a0_ref[sub, :],
                 _batch_rowf(CB, JT, L2p), _rows_of(tr_ref, nv),
                 T=T, sp2=sp2, L2=L2, L2p=L2p, JTP=JT, dir_=dir_,
                 deps=deps, packed=packed, place2=_place2,
                 place1=_place1)


def _kernel_farrow_horner_batch(pk_ref, rowc_ref, a0_ref, xa, cf_ref,
                                o_ref, *, CB: int, JT: int, M2: int,
                                sp2: int, T: int, P1: int, nphi: int,
                                L2: int, L2p: int, dir_: int, deps: float,
                                packed: bool = False):
    sub = jax.lax.rem(pl.program_id(1), jnp.int32(8))
    M2p = xa.shape[-1]
    X0 = xa[...].reshape(CB * JT, M2p)
    mm3, _ = _make_mm(X0, CB * JT, M2, sp2, True)

    def o_write(y):
        for c in range(CB):
            o_ref[c, :, :] = y[c * JT:(c + 1) * JT, :L2].astype(o_ref.dtype)

    _farrow_horner_flow(o_write, mm3, pk_ref[sub, :], rowc_ref[sub, :],
                        a0_ref[sub, :], _batch_rowf(CB, JT, L2p),
                        cf_ref[...], T=T, P1=P1, nphi=nphi, sp2=sp2,
                        L2=L2, L2p=L2p, dir_=dir_, deps=deps,
                        packed=packed, place1=_place1)


def _launch_batch(kern, packs, x3d, meta_t, num_tiles, CB, interpret,
                  tile_banks=(), banks=()):
    JT, M2p, L2, L2p = meta_t
    C = x3d.shape[0]
    p8 = lambda cb, j: (jax.lax.div(j, jnp.int32(8)), j * 0)  # noqa: E731
    pk_specs = [pl.BlockSpec((8, L2p), p8) for _ in packs]
    tb_specs = [pl.BlockSpec((1, *b.shape[1:]),
                             lambda cb, j: (j, j * 0, j * 0))
                for b in tile_banks]
    bank_specs = [pl.BlockSpec(b.shape, lambda cb, j: (j * 0, j * 0))
                  for b in banks]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, num_tiles * JT, L2),
                                       jnp.float32),
        grid=(C // CB, num_tiles),
        in_specs=[
            *pk_specs,
            pl.BlockSpec((CB, JT, M2p), lambda cb, j: (cb, j, j * 0)),
            *tb_specs,
            *bank_specs,
        ],
        out_specs=pl.BlockSpec((CB, JT, L2),
                               lambda cb, j: (cb, j, j * 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*packs, x3d, *tile_banks, *banks)


def gridsel_resample_batch(x3d, pk, rowc, a0, vdrows, *, CB, JT, M2, sp2,
                           T, L2, L2p, dir_, deps, num_tiles, nv,
                           packed=False, d_pass=1, interpret=False):
    """Batched valder resample over overlap-tiled ``x3d`` (C, R, M2p);
    all channels share the packed per-tile index state AND the host V/D
    rows (built once, DMA'd per tile). C % CB == 0 and JT a power of two
    (callers pad/choose). Returns (C, num_tiles*JT, L2) float32."""
    assert x3d.shape[0] % CB == 0 and (JT & (JT - 1)) == 0
    kern = functools.partial(_kernel_batch, CB=CB, JT=JT, M2=M2, sp2=sp2,
                             T=T, L2=L2, L2p=L2p, dir_=dir_, deps=deps,
                             packed=packed, d_pass=d_pass, nv=nv)
    return _launch_batch(kern, (pk, rowc, a0), x3d,
                         (JT, x3d.shape[-1], L2, L2p), num_tiles, CB,
                         interpret, tile_banks=(vdrows,))


def gridsel_farrow_horner_batch(x3d, pk, rowc, a0, cf, *, CB, JT, M2,
                                sp2, T, P1, nphi, L2, L2p, dir_, deps,
                                num_tiles, packed=False, interpret=False):
    """Batched Farrow resample via the per-row psi-Horner fallback
    (large-drift plans)."""
    assert x3d.shape[0] % CB == 0 and (JT & (JT - 1)) == 0
    kern = functools.partial(_kernel_farrow_horner_batch, CB=CB, JT=JT,
                             M2=M2, sp2=sp2, T=T, P1=P1, nphi=nphi,
                             L2=L2, L2p=L2p, dir_=dir_, deps=deps,
                             packed=packed)
    return _launch_batch(kern, (pk, rowc, a0), x3d,
                         (JT, x3d.shape[-1], L2, L2p), num_tiles, CB,
                         interpret, banks=(cf,))
