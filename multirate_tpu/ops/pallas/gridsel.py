"""Rational-grid tile-adaptive fused arbitrary resampler ("gridsel").

The single-channel arbitrary resampler is VPU-floor-bound in the winsel
kernels (~1 vreg-op per 8 outputs of per-output select work — select3.py)
and the batched chansel kernel's amortization needs many channels sharing
one phase accumulator (select4.py). This kernel finds the batch axis
INSIDE a single channel: on the rational grid of the convergent
M2/L2 ~ delta_fx/D, output n = jj*L2 + r has window start

    start_n = jj*M2 + (d0 - 1) + w div D,   w = u0 + r*delta + jj*eps

with eps = L2*delta - M2*D the tiny convergent residue. For a TILE of JT
consecutive jj rows the per-column (window offset q, bank phi, alpha)
structure is *constant up to at most one sub-bank crossing* (JT chosen so
JT*|eps| <= 2^32), so the tile's resample is ONE matmul

    Y (JT, L2) = X (JT, 2*M2) @ K (2*M2, L2-cols)

against a tap matrix K built IN-KERNEL per tile (T compare-placement
VPU stages over HOST-gathered tap rows, amortized over JT*L2 outputs;
round 4 moved the tap-row build out — in-kernel one-hot matmuls cost
0.29 ms/block regardless of pass count) with TWO
variants per column — before/after the crossing — selected per output row
by an exact crossing-row mask. The interpolation alpha is affine in the
row index (alpha = alpha0_r + row*eps/2^32, wrapped by the same mask), so
the whole irregular resample is MXU matmuls + elementwise VPU work: no
gathers, no per-output lane ops, no NPHI-times interpolated stream.

Reference semantics preserved exactly: window start / bank index / alpha
are the reference accumulator recurrence (Filters.jl:663-673, 693-742) in
closed form; index decisions are exact int64 (packed host-side), only
alpha carries the usual f32 quantization (~1e-7, inside the 1e-4 budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import precision as prec

__all__ = ["gridsel_resample_arb_fused", "gridsel_resample_farrow_fused",
           "gridsel_resample_arb_batch", "gridsel_resample_farrow_batch"]

_HI = jax.lax.Precision.HIGHEST
_QBITS = 10          # window offset q within the 2-row span (< 1024)


def _make_mm(xa, JT: int, M2: int, sp2: int, three_pass: bool):
    """K -> (JT, cols) contraction of the tile's band window.

    ``xa`` rows are host-tiled with OVERLAP (ops/gridsel._tile_x): row j
    holds x[j*M2 : j*M2 + M2p] with M2p = ceil128(sp2) >= sp2, so the
    whole two-stream-row band window is ONE contiguous, 128-lane-aligned
    slice — no in-kernel row roll, no two-segment matmul (the second
    segment cost a full extra MXU pass per split: ceil128(M2) +
    ceil128(sp2-M2) vs ceil128(sp2)). With three_pass, x is bf16-hi/lo
    split once per tile and each K is split at use (the zc kernel's
    3-pass trick: ~2^-16 relative error, at half the MXU passes of
    HIGHEST)."""
    f32 = jnp.float32
    if "nomm" in _ABLATE:
        return lambda K: jnp.zeros((JT, K.shape[-1]), f32) + K[0:1, :]
    if not three_pass:
        def mm(K):
            return jnp.dot(xa[:JT, :sp2], K[:sp2], precision=_HI,
                           preferred_element_type=f32)
        return mm
    x0h, x0l = prec.split_bf16_kernel(xa[:JT, :sp2])

    def mm(K):
        kh, kl = prec.split_bf16_kernel(K[:sp2])
        return (jnp.dot(x0h, kh, preferred_element_type=f32)
                + jnp.dot(x0h, kl, preferred_element_type=f32)
                + jnp.dot(x0l, kh, preferred_element_type=f32))
    return mm


def _variant_b(qA, phA, nphi: int, dir_: int):
    """(qB, phB): the sub-bank step after the tile's crossing. dir_ is the
    static sign of eps (0 = no drift: variant B unused, keep A)."""
    if dir_ == 0:
        return qA, phA
    phR = phA + jnp.int32(dir_)
    qB = (qA
          + jnp.where(phR == jnp.int32(nphi), jnp.int32(1), jnp.int32(0))
          - jnp.where(phR < jnp.int32(0), jnp.int32(1), jnp.int32(0)))
    phB = jnp.where(phR == jnp.int32(nphi), jnp.int32(0),
                    jnp.where(phR < jnp.int32(0), jnp.int32(nphi - 1), phR))
    return qB, phB


# BUILD-AND-CONSUME placement discipline (this is load-bearing): each
# (sp2, L2p) banded tap matrix is ~20-30 vregs. Building all of a tile's
# variants/power-slices before contracting them keeps 4 (arb) .. 10
# (Farrow P1=5) of them LIVE through every placement stage — far past the
# vector register file — and every stage then round-trips its accumulators
# through VMEM. Measured on the batched Farrow kernel (exp/exp18): the
# all-live build was 7.7x slower than the same kernel with placement
# removed; the whole kernel sat at 7.8 Gsps vs a 135 Gsps matmul-only
# skeleton. The helpers below therefore place AT MOST TWO matrices at a
# time, and the tile flows (_arb_tile/_farrow_tile) contract each one
# immediately, re-deriving masks per matrix instead of sharing them.


import os

# placement formulation knob for on-TPU A/B (exp20/exp30):
#   fma   — m_f = (iou == q+t).astype(f32); k += m_f * row  (default)
#   where — k += where(m, row, 0)  (round-3 formulation)
_PLACE_IMPL = os.environ.get("GRIDSEL_PLACE", "fma")

# TIMING-ONLY stage ablation (exp31; results numerically WRONG — never
# set outside experiments): "noplace" skips the T placement stages,
# "nomm" skips the band matmuls, "notap" (arb) skips the one-hot tap
# vector build, "nosel" skips the crossing-variant select.
_ABLATE = frozenset(
    a for a in os.environ.get("GRIDSEL_ABLATE", "").split(",") if a)


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


def _place1(q, rows, *, T: int, sp2: int, L2p: int, row0: int = 0):
    """One placed matrix from rows[row0 + t]."""
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


def _arb_tile(mm, pk, rowc, a0, rowf, taprows, *, T: int, nphi: int,
              sp2: int, L2: int, L2p: int, dir_: int, deps: float,
              packed: bool, place2=None):
    """One tile's arb output (rows, L2p): per-variant K pairs are placed
    and contracted one at a time (see the build-and-consume note).

    ``taprows`` = (tpA, tdA[, tpB, tdB]): per-tile (T8, L2p) f32 tap row
    matrices GATHERED ON THE HOST (ops/gridsel._tap_rows) and DMA'd with
    the tile — row t, lane col = pfb/dpfb[t, phi_col] for the tile's
    variant-A (and, unpacked, variant-B) bank indices. Round-4 history:
    the in-kernel one-hot tap build cost 0.29 ms of the 0.90 ms arb e2e
    (exp31 notap), and converting its 6-pass HIGHEST dots to exact
    2-pass pre-split bf16 dots recovered NOTHING (exp35: 0.8957 vs
    0.8956 ms) — the cost was the tiny (16, nphi) @ (nphi, 128) matmuls
    interleaved between (JT, 256) band matmuls at all, not the pass
    count. Host rows add ~10 MB/block of DMA (~0.06 ms at the measured
    ceiling) and remove every small matmul from the kernel."""
    if place2 is None:
        place2 = _place2
    f32 = jnp.float32
    alin = a0[None, :] + rowf * jnp.float32(deps)
    q = jax.lax.bitwise_and(pk, jnp.int32((1 << _QBITS) - 1))

    def halfy(qv, tp, td, alin_v):
        if "noplace" in _ABLATE:
            kP = jnp.zeros((sp2, L2p), f32) + tp[0:1, :]
            kD = jnp.zeros((sp2, L2p), f32) + td[0:1, :]
        else:
            kP, kD = place2(qv, tp, td, T=T, sp2=sp2, L2p=L2p)
        return mm(kP) + alin_v * mm(kD)

    if packed or dir_ == 0:
        # packed: every lane carries its own resolved variant (B lanes'
        # phi and alpha pre-offset by _pack); dir_ == 0: no variant B
        yall = halfy(q, taprows[0], taprows[1], alin)
        if dir_ == 0:
            return yall
        if "nosel" in _ABLATE:
            return yall
        yB = pltpu.roll(yall, jnp.int32(L2p - L2), axis=1)
        return jnp.where(rowf >= rowc[None, :], yB, yall)
    yA = halfy(q, taprows[0], taprows[1], alin)
    if "nosel" in _ABLATE:
        return yA
    # variant B: bank steps by dir_ with wraparound into q (the tap rows
    # for phi+dir_ come from the host; only q's carry stays in-kernel)
    ph = jax.lax.shift_right_logical(pk, jnp.int32(_QBITS))
    qB, _ = _variant_b(q, ph, nphi, dir_)
    yB = halfy(qB, taprows[2], taprows[3], alin - jnp.float32(dir_))
    return jnp.where(rowf >= rowc[None, :], yB, yA)


def _farrow_tile(mm, pk, rowc, a0, rowf, cf, *, T: int, P1: int,
                 nphi: int, sp2: int, L2: int, L2p: int, dir_: int,
                 deps: float, packed: bool, place1=None):
    """One tile's Farrow output: psi-Horner with each power-slice K placed
    and contracted one at a time. Variant B (unpacked) re-places at
    q + dir_ with the SAME polynomial taps (the plan statically checks
    the q_B placement bound)."""
    if place1 is None:
        place1 = _place1
    f32 = jnp.float32
    plin = a0[None, :] + rowf * jnp.float32(deps)
    q = jax.lax.bitwise_and(pk, jnp.int32((1 << _QBITS) - 1))

    def horner(qv, psi):
        acc = None
        for p in range(P1 - 1, -1, -1):
            if "noplace" in _ABLATE:
                k = jnp.zeros((sp2, L2p), f32) + cf[p * T:p * T + 1, :]
            else:
                k = place1(qv, cf, T=T, sp2=sp2, L2p=L2p, row0=p * T)
            G = mm(k)
            acc = G if acc is None else acc * psi + G
        return acc

    if packed or dir_ == 0:
        acc = horner(q, plin)
        if dir_ == 0:
            return acc
        yB = pltpu.roll(acc, jnp.int32(L2p - L2), axis=1)
        return jnp.where(rowf >= rowc[None, :], yB, acc)
    accA = horner(q, plin)
    if "nosel" in _ABLATE:
        return accA
    accB = horner(q + jnp.int32(dir_), plin - jnp.float32(dir_ * nphi))
    return jnp.where(rowf >= rowc[None, :], accB, accA)


def _build_k_farrow(pk, cf, *, T: int, P1: int, sp2: int, L2p: int,
                    dir_: int, packed: bool = False):
    """(ksA + ksB) 2*P1 banded polynomial-slice tap matrices — or just P1
    for a variant-PACKED plan. NOT used by the production kernels (they
    place-and-consume one matrix at a time — see the build-and-consume
    note above; carrying all 2*P1 live measured 7.7x slower); kept as the
    reference implementation for exp/exp18_gsb_ablate.py."""
    f32 = jnp.float32
    qA = jax.lax.bitwise_and(pk, jnp.int32((1 << _QBITS) - 1))
    iou = jax.lax.broadcasted_iota(jnp.int32, (sp2, L2p), 0)
    z = jnp.float32(0.0)
    # cf rows are LANE-PRE-BROADCAST on the host: row p*T + t holds
    # coeffs[p, t] across all L2p lanes, so each placement stage is a
    # sublane-only (1, L2p) broadcast — Mosaic cannot lower a (1, 1)
    # vector broadcast in both sublanes and lanes.
    ksA = [jnp.zeros((sp2, L2p), f32) for _ in range(P1)]
    for t in range(T):
        mA = iou == (qA + jnp.int32(t))[None, :]
        for p in range(P1):
            c = cf[p * T + t: p * T + t + 1, :]           # (1, L2p) tap row
            ksA[p] = ksA[p] + jnp.where(mA, c, z)
    if packed:
        return ksA
    # Variant B is q stepped by dir_ with the SAME polynomial taps (Farrow
    # coeffs span all banks), so K_B is K_A rolled dir_ sublane rows. The
    # wrapped row is zero under the plan's own placement bound (q_B + T <=
    # sp2 and q_B >= 0, which the compare-placement build needs anyway).
    if dir_ == 0:
        ksB = ksA
    else:
        ksB = [pltpu.roll(k, jnp.int32(dir_ % sp2), axis=0) for k in ksA]
    return ksA + ksB


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
    """K (SP2R, L2p) -> (JT, L2p) contraction of the fused-input tile.

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
        return lambda K: jnp.zeros((JT, K.shape[-1]), f32) + K[0:1, :]
    if not three_pass:
        def mm(K):
            return (jnp.dot(X1, K[:M2], precision=_HI,
                            preferred_element_type=f32)
                    + jnp.dot(X2, K[M2r:M2r + ovl], precision=_HI,
                              preferred_element_type=f32))
        return mm
    x1h, x1l = prec.split_bf16_kernel(X1)
    x2h, x2l = prec.split_bf16_kernel(X2)

    def mm(K):
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
    return mm


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


def _taprows_of(tr_ref, packed: bool, dir_: int):
    """Slice the per-tile (1, NV*T8, L2p) host tap-row block into NV
    (T8, L2p) matrices: (tpA, tdA) packed/driftless, else + (tpB, tdB)."""
    nmat = 2 if (packed or dir_ == 0) else 4
    T8 = tr_ref.shape[1] // nmat
    return tuple(tr_ref[0, i * T8:(i + 1) * T8, :] for i in range(nmat))


def _kernel_arb_fused(pk_ref, rowc_ref, a0_ref, main, nxt, tr_ref,
                      o_ref, *, JT: int, M2: int, sp2: int,
                      T: int, nphi: int, L2: int, L2p: int, dir_: int,
                      deps: float, three_pass: bool, packed: bool = False):
    f32 = jnp.float32
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    mm = _make_mm_fused(main, nxt, JT=JT, M2=M2, sp2=sp2,
                        three_pass=three_pass)
    rowf = jax.lax.broadcasted_iota(jnp.int32, (JT, L2p), 0).astype(f32)
    _, _, SP2R = _seg_geom(M2, sp2)
    y = _arb_tile(mm, pk_ref[sub, :], rowc_ref[sub, :], a0_ref[sub, :],
                  rowf, _taprows_of(tr_ref, packed, dir_), T=T, nphi=nphi,
                  sp2=SP2R, L2=L2, L2p=L2p, dir_=dir_, deps=deps,
                  packed=packed, place2=_seg_place2(M2, sp2))
    o_ref[:, :] = y[:, :L2].astype(o_ref.dtype)


def _kernel_farrow_fused(pk_ref, rowc_ref, a0_ref, main, nxt, cf_ref,
                         o_ref, *, JT: int, M2: int, sp2: int,
                         T: int, nphi: int, L2: int, L2p: int, P1: int,
                         dir_: int, deps: float, three_pass: bool,
                         packed: bool = False):
    f32 = jnp.float32
    sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    mm = _make_mm_fused(main, nxt, JT=JT, M2=M2, sp2=sp2,
                        three_pass=three_pass)
    rowf = jax.lax.broadcasted_iota(jnp.int32, (JT, L2p), 0).astype(f32)
    _, _, SP2R = _seg_geom(M2, sp2)
    y = _farrow_tile(mm, pk_ref[sub, :], rowc_ref[sub, :], a0_ref[sub, :],
                     rowf, cf_ref[...], T=T, P1=P1, nphi=nphi, sp2=SP2R,
                     L2=L2, L2p=L2p, dir_=dir_, deps=deps, packed=packed,
                     place1=_seg_place1(M2, sp2))
    o_ref[:, :] = y[:, :L2].astype(o_ref.dtype)


def _launch_fused(kern, packs, xrows, banks, meta_t, num_tiles, interpret,
                  tile_banks=()):
    """xrows: (R, M2) row view of the padded stream, R >= num_tiles*JT + 8.
    Two stacked row-block specs feed each tile: its (JT, M2) rows plus the
    following (8, M2) rows (JT % 8 == 0 keeps both block-aligned).
    ``tile_banks``: (tiles8, R_, L2p) arrays DMA'd per tile (host tap
    rows); ``banks``: whole-array VMEM residents (Farrow cf)."""
    JT, M2, L2, L2p = meta_t
    pk, rowc, a0 = packs
    g8 = lambda j: (jax.lax.div(j, jnp.int32(8)), j * 0)  # noqa: E731
    jt8 = JT // 8
    tb_specs = [pl.BlockSpec((1, *b.shape[1:]), lambda j: (j, j * 0, j * 0))
                for b in tile_banks]
    bank_specs = [pl.BlockSpec(b.shape, lambda j: (j * 0, j * 0))
                  for b in banks]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((num_tiles * JT, L2), jnp.float32),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, L2p), g8),
            pl.BlockSpec((8, L2p), g8),
            pl.BlockSpec((8, L2p), g8),
            pl.BlockSpec((JT, M2), lambda j: (j, j * 0)),
            pl.BlockSpec((8, M2), lambda j: ((j + 1) * jt8, j * 0)),
            *tb_specs,
            *bank_specs,
        ],
        out_specs=pl.BlockSpec((JT, L2), lambda j: (j, j * 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pk, rowc, a0, xrows, xrows, *tile_banks, *banks)


def gridsel_resample_arb_fused(xrows, pk, rowc, a0, taprows, *, JT, M2,
                               sp2, T, nphi, L2, L2p, dir_, deps,
                               num_tiles, three_pass=True, packed=False,
                               interpret=False):
    """Fused-input single-channel arb resample: consumes the (R, M2) row
    view directly (no HBM overlap tiling); two-segment band matmul.
    ``taprows``: (tiles8, NV*T8, L2p) f32 host-gathered tap rows
    (ops/gridsel._tap_rows)."""
    kern = functools.partial(_kernel_arb_fused, JT=JT, M2=M2,
                             sp2=sp2, T=T, nphi=nphi, L2=L2, L2p=L2p,
                             dir_=dir_, deps=deps, three_pass=three_pass,
                             packed=packed)
    return _launch_fused(kern, (pk, rowc, a0), xrows, (),
                         (JT, M2, L2, L2p), num_tiles, interpret,
                         tile_banks=(taprows,))


def gridsel_resample_farrow_fused(xrows, pk, rowc, a0, cf, *, JT, M2, sp2,
                                  T, nphi, L2, L2p, P1, dir_, deps,
                                  num_tiles, three_pass=True, packed=False,
                                  interpret=False):
    """Fused-input single-channel Farrow resample over the (R, M2) rows."""
    kern = functools.partial(_kernel_farrow_fused, JT=JT, M2=M2,
                             sp2=sp2, T=T, nphi=nphi, L2=L2, L2p=L2p,
                             P1=P1, dir_=dir_, deps=deps,
                             three_pass=three_pass, packed=packed)
    return _launch_fused(kern, (pk, rowc, a0), xrows, (cf,),
                         (JT, M2, L2, L2p), num_tiles, interpret)


# --------------------------------------------------------------------------- #
# Batched-channel variants: C channels SHARE one FilterState (scalar
# phase/deficit), so the per-tile K build — the T compare-placement stages
# over the host-gathered tap rows, which dominate the single-channel
# kernel and are replicated per channel under vmap — is done ONCE and
# amortized: only the x-window matmuls scale with C. Channels are stacked on the matmul's
# ROW axis: the (CB, JT, M2p) overlap-tiled block collapses (leading-dim
# reshape, a pure relabeling) to one (CB*JT, M2p) operand, so each MXU
# pass runs at CB*JT rows instead of C separate (JT, M2p) calls. JT must
# be a power of two: the output row's channel decomposition r = c*JT +
# rowj is then one AND mask. (The pre-overlap design needed 8 spill rows
# per channel for the cross-row sublane roll; the overlap tiling removed
# the roll and the spill rows with it.)
# --------------------------------------------------------------------------- #


def _batch_rowf(CB, JTP, L2p):
    """Per-row output-row index within its channel: r = c*JTP + rowj with
    JTP a power of two, so rowj is one AND mask."""
    return jax.lax.bitwise_and(
        jax.lax.broadcasted_iota(jnp.int32, (CB * JTP, L2p), 0),
        jnp.int32(JTP - 1)).astype(jnp.float32)


def _kernel_arb_batch(pk_ref, rowc_ref, a0_ref, xa, tr_ref,
                      o_ref, *, CB: int, JT: int, M2: int, sp2: int, T: int,
                      nphi: int, L2: int, L2p: int, dir_: int, deps: float,
                      packed: bool = False):
    sub = jax.lax.rem(pl.program_id(1), jnp.int32(8))
    M2p = xa.shape[-1]
    X0 = xa[...].reshape(CB * JT, M2p)
    mm = _make_mm(X0, CB * JT, M2, sp2, True)
    y = _arb_tile(mm, pk_ref[sub, :], rowc_ref[sub, :], a0_ref[sub, :],
                  _batch_rowf(CB, JT, L2p), _taprows_of(tr_ref, packed,
                                                        dir_),
                  T=T, nphi=nphi, sp2=sp2, L2=L2, L2p=L2p, dir_=dir_,
                  deps=deps, packed=packed)
    for c in range(CB):
        o_ref[c, :, :] = y[c * JT:(c + 1) * JT, :L2].astype(o_ref.dtype)


def _kernel_farrow_batch(pk_ref, rowc_ref, a0_ref, xa, cf_ref, o_ref, *,
                         CB: int, JT: int, M2: int, sp2: int, T: int,
                         nphi: int, L2: int, L2p: int, P1: int, dir_: int,
                         deps: float, packed: bool = False):
    sub = jax.lax.rem(pl.program_id(1), jnp.int32(8))
    M2p = xa.shape[-1]
    X0 = xa[...].reshape(CB * JT, M2p)
    mm = _make_mm(X0, CB * JT, M2, sp2, True)
    y = _farrow_tile(mm, pk_ref[sub, :], rowc_ref[sub, :], a0_ref[sub, :],
                     _batch_rowf(CB, JT, L2p), cf_ref[...], T=T, P1=P1,
                     nphi=nphi, sp2=sp2, L2=L2, L2p=L2p, dir_=dir_,
                     deps=deps, packed=packed)
    for c in range(CB):
        o_ref[c, :, :] = y[c * JT:(c + 1) * JT, :L2].astype(o_ref.dtype)


def _launch_batch(kern, packs, x3d, banks, meta_t, num_tiles, CB,
                  interpret, tile_banks=()):
    JT, M2p, L2, L2p = meta_t
    pk, rowc, a0 = packs
    C = x3d.shape[0]
    p8 = lambda cb, j: (jax.lax.div(j, jnp.int32(8)), j * 0)  # noqa: E731
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
            pl.BlockSpec((8, L2p), p8),
            pl.BlockSpec((8, L2p), p8),
            pl.BlockSpec((8, L2p), p8),
            pl.BlockSpec((CB, JT, M2p), lambda cb, j: (cb, j, j * 0)),
            *tb_specs,
            *bank_specs,
        ],
        out_specs=pl.BlockSpec((CB, JT, L2),
                               lambda cb, j: (cb, j, j * 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(pk, rowc, a0, x3d, *tile_banks, *banks)


def gridsel_resample_arb_batch(x3d, pk, rowc, a0, taprows, *, CB, JT, M2,
                               sp2, T, nphi, L2, L2p, dir_, deps,
                               num_tiles, packed=False, interpret=False):
    """Batched arbitrary resample over overlap-tiled ``x3d`` (C, R, M2p);
    all channels share the packed per-tile index state AND the host tap
    rows (built once, DMA'd per tile). C % CB == 0 and JT a power of two
    (callers pad/choose). Returns (C, num_tiles*JT, L2) float32."""
    assert x3d.shape[0] % CB == 0 and (JT & (JT - 1)) == 0
    kern = functools.partial(_kernel_arb_batch, CB=CB, JT=JT, M2=M2,
                             sp2=sp2, T=T, nphi=nphi, L2=L2, L2p=L2p,
                             dir_=dir_, deps=deps, packed=packed)
    return _launch_batch(kern, (pk, rowc, a0), x3d, (),
                         (JT, x3d.shape[-1], L2, L2p), num_tiles, CB,
                         interpret, tile_banks=(taprows,))


def gridsel_resample_farrow_batch(x3d, pk, rowc, a0, cf, *, CB, JT, M2,
                                  sp2, T, nphi, L2, L2p, P1, dir_, deps,
                                  num_tiles, packed=False,
                                  interpret=False):
    """Batched Farrow resample over overlap-tiled ``x3d`` (C, R, M2p)."""
    assert x3d.shape[0] % CB == 0 and (JT & (JT - 1)) == 0
    kern = functools.partial(_kernel_farrow_batch, CB=CB, JT=JT, M2=M2,
                             sp2=sp2, T=T, nphi=nphi, L2=L2, L2p=L2p,
                             P1=P1, dir_=dir_, deps=deps, packed=packed)
    return _launch_batch(kern, (pk, rowc, a0), x3d, (cf,),
                         (JT, x3d.shape[-1], L2, L2p), num_tiles, CB,
                         interpret)
