"""Rational-grid plan + block prep for the gridsel fused resampler.

See pallas/gridsel.py for the kernel design. This module owns:

- ``build_gridsel_plan``: static plan search at kernel construction. Picks
  a rational approximation M2/L2 ~ delta_fx/D (continued-fraction
  convergents, optionally integer-scaled so the stream row M2 is wide
  enough for the band span) and the tile rows JT subject to the
  one-crossing-per-tile bound JT*|eps| <= 2^32 (arb) / <= D (Farrow),
  scored by a simple MXU+VPU cost model.
- ``_pack_arb`` / ``_pack_farrow``: per-block exact int64 index prep
  (traced u0/d0), emitting the packed per-(tile, column) q/phi, exact
  crossing rows and alpha/psi tile-start values.
- ``arb_gridsel_apply`` / ``farrow_gridsel_apply``: pad/tile x and run the
  Pallas kernel.

Reference semantics: the accumulator recurrence Filters.jl:663-673
(arbitrary, :693-742) and :780-836 (Farrow), identical index decisions to
ops/indexing.accum_indices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .params import PHASE_FRAC_BITS

__all__ = ["build_gridsel_plan", "GridselMeta", "arb_gridsel_apply",
           "farrow_gridsel_apply"]

import os

N_CAP = 1 << 24
# Whole-window drift budget over one block: n_cap (the per-call output
# cap) scales LINEARLY with it, at the price of _DRIFT_SLOTS extra rows
# of matmul depth (sp2) and left zero-padding. 16 keeps the 8M-input
# bench blocks (n_max ~ 3.8M outputs at rate 0.4709) inside one call
# (+~7% sp2 for the 0.4709 plan); 4 capped them at ~1.7M and the bench
# fell back to the 25x-slower winsel kernel.
_DRIFT_SLOTS = 16
PAD_L = _DRIFT_SLOTS + 8   # left zero pad: absorbs downward drift (q >= 0)
_MIN_CAP = 1 << 16


class GridselMeta(NamedTuple):
    """Static gridsel plan (python ints; hashable params meta field)."""

    L2: int
    M2: int
    eps: int
    JT: int
    sp2: int
    L2p: int
    n_cap: int
    d_max: int


def _convergents(num: int, den: int, max_den: int):
    """Continued-fraction convergents p/q of num/den with q <= max_den."""
    a, b = num, den
    p0, q0, p1, q1 = 0, 1, 1, 0
    out = []
    while b:
        k = a // b
        a, b = b, a - k * b
        p0, q0, p1, q1 = p1, q1, p0 + k * p1, q0 + k * q1
        if q1 > max_den:
            break
        if p1 > 0:
            out.append((p1, q1))
    return out


def build_gridsel_plan(nphi: int, delta_fx: int, T: int,
                       farrow: bool = False, polyorder: int | None = None):
    """GridselMeta or None when no viable geometry exists."""
    D = nphi << PHASE_FRAC_BITS
    d_max = delta_fx // D + 2
    cross_lim = D if farrow else (1 << 32)
    best, best_cost = None, None
    base = T + PAD_L + d_max + _DRIFT_SLOTS + 4
    cands = []
    for (m, l) in _convergents(delta_fx, D, 512):
        # scale so one stream row holds the whole band span (two-segment
        # matmul limit sp2 <= 2*M2) and is wide enough to matter ...
        ks = {max(1, -(-max(base, 96) // m))}
        # ... plus the variant-PACKING candidate: the largest scale with
        # 2*L2 <= 128, so both crossing variants ride one 128-lane matmul
        # (half the matmul + placement work; see pallas/gridsel.py)
        if 64 // l >= 1:
            ks.add(64 // l)
        cands.extend((m, l, k) for k in sorted(ks))
    for (m, l, k) in cands:
        M2, L2, eps = k * m, k * l, k * (l * delta_fx - m * D)
        if M2 + base > (1 << 10):      # q must fit _QBITS
            continue
        if L2 > 1024:
            continue
        if eps == 0:
            n_cap = N_CAP
        else:
            n_cap = min(N_CAP, (_DRIFT_SLOTS * D // abs(eps)) * L2)
        if n_cap < _MIN_CAP:
            continue
        L2p = -(-L2 // 128) * 128
        sp2 = -(-(M2 + base) // 8) * 8
        if sp2 > 2 * M2:
            continue
        # Tile row cap (GRIDSEL_JT overrides; per-plan read for A/Bs):
        # the (JT, band) matmul dots run far under MXU peak at 256 rows
        # (fixed per-dot overhead) and the placement pair amortizes with
        # JT — measured at the reference harness rate (round 5,
        # interleaved): JT 256 -> 1024 -> 2048 takes arb 17.0 -> 20.8 ->
        # 21.9 and Farrow 15.3 -> 20.3 -> 21.2 Gsps. The one-crossing
        # bound and VMEM bound the top (jt halves until the VMEM model
        # fits, so wide-sp2 candidates keep their best feasible tile);
        # interpret-mode/CPU keeps 256 (tile work is simulated
        # per-element and small test blocks pad to one full tile).
        env_jt = int(os.environ.get("GRIDSEL_JT", "0"))
        jt_cap = env_jt or (2048 if jax.default_backend() == "tpu"
                            else 256)
        jt = min(jt_cap, cross_lim // max(abs(eps), 1))
        jt = (jt // 8) * 8
        M2p_ = -(-sp2 // 128) * 128
        while jt >= 16 and 4 * (2 * sp2 * L2p + 2 * (jt + 8) * M2p_
                                + 6 * jt * L2p) > 12 * (1 << 20):
            jt //= 2
        jt = (jt // 8) * 8
        if jt < 16:
            continue
        # Placement bound, checked statically (the Farrow kernel builds
        # variant-B tap matrices by a CIRCULAR sublane roll of variant A —
        # a violated bound would silently wrap a nonzero row into accB):
        # q = PAD_L + (d0-1) + (u0 + r*delta + jj*eps) div D with
        # d0-1 in [0, d_max-1], u0 in [0, D), r <= L2-1, and the in-cap
        # drift |jj*eps| <= _DRIFT_SLOTS*D. Variant B steps q by +-1.
        q_hi = (PAD_L + (d_max - 1)
                + ((D - 1) + (L2 - 1) * delta_fx) // D + _DRIFT_SLOTS)
        q_lo = PAD_L - _DRIFT_SLOTS
        if not (q_lo - 1 >= 0 and q_hi + 1 + T <= sp2):
            continue
        # VMEM ceiling (~16 MiB/core; keep headroom for double buffering
        # and Mosaic temporaries). Majors: the in-kernel (V, D) tap
        # matrix pair ((sp2, L2p) f32; the crossing-tile B pair is
        # transient under pl.when — count one resident pair), x tiles,
        # and (JT, L2p) row temps. The valder flow (round 5) made the
        # per-tile work IDENTICAL for arb and Farrow — host-evaluated
        # value/derivative rows, one placed pair, mm3 + drift*mm1 — so
        # P1/packing no longer scale the kernel cost; crossing tiles
        # (probability jt*|eps|/crossing-scale per lane) are sparse.
        n_k = 2
        n_mm = 2
        M2p = -(-sp2 // 128) * 128
        vmem = 4 * (n_k * sp2 * L2p
                    + 2 * (jt + 8) * M2p
                    + 6 * jt * L2p)
        if vmem > 12 * (1 << 20):
            continue
        # cost per output, MXU MACs normalized to VPU ops (~25x thruput).
        # Pass count is DRIFT-AWARE (round 5): small within-tile drift
        # (|eps|*jt*2^-32) runs the cheap valder flow (V at 3 bf16
        # passes, drift-D and crossing-delta at 1 each); large drift
        # raises the correction grade (arb) or forces the per-row
        # psi-Horner fallback (Farrow, 3*(polyorder+1) passes x A/B
        # variants) — so a deeper convergent with a tiny residue can
        # beat a shallow one whose residue forces the expensive flow.
        drift = abs(eps) * jt * 2.0 ** -32
        if eps == 0:
            passes = 4.0
        elif farrow:
            P1s = (polyorder + 1) if polyorder is not None else 5
            passes = (6.0 if drift <= _FARROW_VALDER_DRIFT
                      else 3.0 * P1s * 2.0)
        else:
            dp = 3.0 if drift > _ARB_D1_DRIFT else 1.0
            passes = 3.0 + 2.0 * dp
        mxu = passes * M2p * (L2p / L2) / 25.0
        vpu = 2.0 * T * n_k * sp2 * L2p / (jt * L2)
        cost = mxu + vpu
        if best_cost is None or cost < best_cost:
            best_cost = cost
            best = GridselMeta(L2, M2, int(eps), jt, sp2, L2p,
                               int(n_cap), d_max)
    return best


def _pack(meta: GridselMeta, nphi: int, delta_fx: int, u0, d0,
          tiles8: int, farrow: bool, jt: int | None = None,
          packed: bool = False):
    """(pk int32, rowc f32, a0 f32, phiA, phiB), each (tiles8, L2p).
    Exact int64. ``jt`` overrides the plan's tile rows (batched kernels
    use smaller tiles for VMEM; any jt <= meta.JT keeps the one-crossing
    bound).

    pk packs q | qB << 10 — the variant-A window offset and the
    (host-resolved, bank-carry-exact) variant-B offset past the tile's
    crossing. a0 is the tile-start alpha (arb, bank units) / psi (farrow,
    1-based continuous phase): consumed HOST-SIDE by the valder row
    builders; the kernel never sees phases. phiA/phiB are the arb bank
    indices for the host row gather (None for farrow).

    ``packed`` (requires 2*L2 <= L2p): lanes [L2, 2*L2) carry column
    l - L2's VARIANT-B state — q/phi stepped past the tile's crossing and
    a0 pre-offset (alpha - dir for arb, psi - dir*nphi for Farrow) — so
    one host (V, D) row pair covers both variants and the kernel resolves
    the (rare) crossing with one static lane roll + select."""
    L2, M2, eps, JT, sp2, L2p = meta[:6]
    JT = jt or JT
    D = nphi << PHASE_FRAC_BITS
    i64 = jnp.int64
    dir_ = 0 if eps == 0 else (1 if eps > 0 else -1)
    jj0 = (jnp.arange(tiles8, dtype=i64) * JT)[:, None]
    lane = jnp.arange(L2p, dtype=i64)
    if packed:
        assert 2 * L2 <= L2p
        isB = lane >= L2
        r = jnp.clip(jnp.where(isB, lane - L2, lane), 0, L2 - 1)[None, :]
        isB = isB[None, :]
    else:
        isB = None
        r = jnp.minimum(lane, L2 - 1)[None, :]
    w0 = u0.astype(i64) + r * delta_fx + jj0 * eps
    phiA = phiB = None
    if farrow:
        b = w0 // D
        rem = w0 - b * D                       # in [0, D)
        q = (d0.astype(i64) - 1) + b + PAD_L
        if packed:
            q = jnp.where(isB, q + dir_, q)
        q = q.astype(jnp.int32)
        qB = q + jnp.int32(dir_)               # window step at crossing
        scale = D
    else:
        k = w0 >> 32
        rem = w0 - (k << 32)                   # in [0, 2^32)
        b = k // nphi
        phi = (k - b * nphi).astype(jnp.int32)
        q = ((d0.astype(i64) - 1) + b + PAD_L).astype(jnp.int32)
        # variant B: phi steps by dir with bank wraparound into q
        phR = phi + jnp.int32(dir_)
        qB = (q
              + jnp.where(phR == jnp.int32(nphi), 1, 0)
              - jnp.where(phR < jnp.int32(0), 1, 0)).astype(jnp.int32)
        phB = jnp.where(phR == jnp.int32(nphi), jnp.int32(0),
                        jnp.where(phR < jnp.int32(0),
                                  jnp.int32(nphi - 1), phR))
        if packed:
            q = jnp.where(isB, qB, q)
            phi = jnp.where(isB, phB, phi)
            qB = q
            phB = phi
        phiA, phiB = phi, phB
        scale = 1 << 32
    pk = q | (qB << jnp.int32(10))
    if eps > 0:
        rowc = (scale - rem + (eps - 1)) // eps
    elif eps < 0:
        rowc = rem // (-eps) + 1
    else:
        rowc = jnp.full_like(rem, JT)
    rowc = jnp.clip(rowc, 0, JT).astype(jnp.int32).astype(jnp.float32)
    # tile-start alpha (arb, units of one bank) / psi (farrow, 1-based
    # continuous phase) in f32 with int32-exact halves (no f64 mults)
    hi = (rem >> 16).astype(jnp.int32).astype(jnp.float32)
    lo = (rem & jnp.int64(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    if farrow:
        a0 = (jnp.float32(1.0) + hi * jnp.float32(2.0 ** -16)
              + lo * jnp.float32(2.0 ** -32))
        if packed:
            a0 = jnp.where(isB, a0 - jnp.float32(dir_ * nphi), a0)
    else:
        a0 = hi * jnp.float32(2.0 ** -16) + lo * jnp.float32(2.0 ** -32)
        if packed:
            a0 = jnp.where(isB, a0 - jnp.float32(dir_), a0)
    return pk, rowc, a0, phiA, phiB


def _tile_x(xext, meta: GridselMeta, num_tiles: int,
            jt: int | None = None):
    """Left/right-padded OVERLAP-tiled (..., R, M2p) view of xext: row j
    holds samples [j*M2, j*M2 + M2p) with M2p = ceil128(sp2) >= sp2, so
    the kernel's whole band window is one contiguous 128-aligned lane
    slice of its row — no in-kernel row roll, no two-segment matmul.
    Costs M2p/M2 expansion on the tiling pass (gridsel is VPU/MXU-bound
    at ~7-15% of the HBM roofline, so the extra traffic is free)."""
    L2, M2 = meta.L2, meta.M2
    M2p = -(-meta.sp2 // 128) * 128
    R = num_tiles * (jt or meta.JT) + 8
    lead = xext.shape[:-1]
    pad_r = R * M2 + M2p - PAD_L - xext.shape[-1]
    zl = jnp.zeros((*lead, PAD_L), xext.dtype)
    zr = jnp.zeros((*lead, max(pad_r, 0)), xext.dtype)
    xq = jnp.concatenate([zl, xext, zr], axis=-1)[..., :R * M2 + M2p]
    rows = xq[..., :R * M2].reshape(*lead, R, M2)
    # overlap lanes [M2, M2p): the next row's first M2p - M2 samples
    nxt = xq[..., M2:R * M2 + M2].reshape(*lead, R, M2)
    if M2p - M2 <= M2:
        ovl = nxt[..., :M2p - M2]
    else:
        nx2 = xq[..., 2 * M2:R * M2 + 2 * M2].reshape(*lead, R, M2)
        ovl = jnp.concatenate([nxt, nx2[..., :M2p - 2 * M2]], axis=-1)
    return jnp.concatenate([rows, ovl], axis=-1)


def _rows_x(history, x, meta: GridselMeta, num_tiles: int,
            jt: int | None = None):
    """(R, M2) row view of [PAD_L zeros, history, x, right zeros] — the
    fused kernels' input. R covers num_tiles*JT main rows plus the
    trailing 8-row overlap block.

    Formulation matters: jnp.pad of [history, x] lowers to one efficient
    materialization (0.113 ms for the 32 MB 8M block, exp38), where the
    4-piece zeros/history/x/zeros concat this replaced cost 0.285 ms —
    prep was ~30% of the whole fused-path wall time."""
    JT = jt or meta.JT
    M2 = meta.M2
    R = num_tiles * JT + 8
    lead = x.shape[:-1]
    hb = jnp.broadcast_to(history.astype(x.dtype),
                          (*lead, history.shape[-1]))
    xq = jnp.concatenate([hb, x], axis=-1)
    pr = R * M2 - PAD_L - xq.shape[-1]
    widths = [(0, 0)] * (xq.ndim - 1) + [(PAD_L, max(pr, 0))]
    return jnp.pad(xq, widths)[..., :R * M2].reshape(*lead, R, M2)


def _geometry(meta: GridselMeta, n_max: int, jt: int | None = None):
    jt = jt or meta.JT
    J_total = -(-n_max // meta.L2)
    num_tiles = -(-J_total // jt)
    tiles8 = -(-num_tiles // 8) * 8
    return num_tiles, tiles8


def _batch_dims(meta: GridselMeta, C: int, n_k: int):
    """(CB, jt_b) for the batched-channel kernel, or None.

    jt_b must be a power of two (the kernel's row->channel AND-mask
    decomposition) and <= meta.JT (one-crossing bound). CB is sized so
    the kernel's VMEM majors — the collapsed (CB*jt_b, M2p) operand with
    its bf16 hi/lo splits (~12 B/row/lane), ~5 (CBT, L2p) f32
    accumulators, the double-buffered overlap-tiled x and out blocks,
    and the n_k (sp2, L2p) tap matrices — stay under ~10 MiB."""
    L2, M2, _, JT, sp2, L2p, _, _ = meta
    M2p = -(-sp2 // 128) * 128
    per_row = 20 * M2p + 20 * L2p + 8 * L2
    fixed = 4 * n_k * sp2 * L2p
    cbt = max(0, (10 * (1 << 20) - fixed)) // per_row
    best = None
    for jt_b in (256, 128, 64, 32, 16):
        if jt_b > JT:
            continue
        cb = min(64, C, (cbt // jt_b // 8) * 8)
        if cb < 8:
            continue
        score = cb * jt_b  # outputs amortizing one K build
        if best is None or score > best[0]:
            best = (score, cb, jt_b)
    return None if best is None else (best[1], best[2])


def _delta_rows(pk, VA, DA, VB, DB):
    """(dV, dD): host-PRECANCELLED crossing-correction rows.

    The exact past-the-crossing output is y_B = mm(V_B@qB) +
    drift*mm(D_B@qB), so the exact correction over the A model is
    mm(V_B@qB - V_A@qA) + drift*mm(D_B@qB - D_A@qA). Both banks are
    aligned to q_d = min(qA, qB) ON THE HOST (per-lane row shift in
    {0, 1}) and SUBTRACTED HERE: for small-drift plans the difference is
    ~gamma*taps'' — orders below either operand — and a kernel-side
    subtraction of two separately-matmul'd large terms would drown it in
    bf16 pass error. The kernel then adds mask*(mm1(dV) + drift*mm1(dD))
    UNCONDITIONALLY — no pl.when: round-3/5 measurements show a
    conditional double body taxes every grid step (~0.2-0.3 ms/block)
    even when it never executes."""
    qA = pk & jnp.int32(1023)
    qB = jax.lax.shift_right_logical(pk, jnp.int32(10)) & jnp.int32(1023)
    qd = jnp.minimum(qA, qB)
    sA = (qA - qd)[:, None, :]
    sB = (qB - qd)[:, None, :]

    def shift_rows(R, s):
        down = jnp.concatenate(
            [jnp.zeros_like(R[:, :1]), R[:, :-1]], axis=1)
        return jnp.where(s == 1, down, R)

    dV = shift_rows(VB, sB) - shift_rows(VA, sA)
    dD = shift_rows(DB, sB) - shift_rows(DA, sA)
    return dV, dD


def _valder_rows_arb(pfb, dpfb, pk, phiA, phiB, a0, dir_: int,
                     packed: bool):
    """(tiles8, NV*T8, L2p) f32 host-EVALUATED per-tile tap rows.

    V = pfb[:, phi] + a0*dpfb[:, phi] — the reference's interpolated taps
    (Filters.jl:677-690) at the tile-start alpha — and D = dpfb[:, phi],
    the exact first-order alpha-drift row (the kernel adds
    row*deps*mm(D); the fold is exactly linear in alpha, so this is not
    an approximation). Unpacked drifting plans append the precancelled
    crossing-delta rows (dV, dD) — see _delta_rows. T8 = ceil8(T+1): the
    delta alignment spans T+1 rows. Bank selection is a one-hot batched
    matmul, NOT a gather (gathers are the chip's slowest primitive — the
    take()-based build cost 0.46 ms/block, round 4); round 4 moved the
    build OUT of the kernel entirely (in-kernel tiny matmuls interleaved
    between band matmuls cost 0.29 ms/block regardless of pass count,
    exp31/exp35)."""
    f32 = jnp.float32
    T = pfb.shape[0]
    T8 = -(-(T + 1) // 8) * 8
    # stacked (2*T8, nphi) bank: [pfb; dpfb], T8-padded rows
    B = jnp.zeros((2 * T8, pfb.shape[1]), f32)
    B = B.at[:T].set(pfb.astype(f32)).at[T8:T8 + T].set(dpfb.astype(f32))
    iop = jnp.arange(pfb.shape[1], dtype=jnp.int32)

    def pd(phv):
        # HIGHEST keeps the select exact (ops/precision.py SELECT class)
        oh = (iop[None, :, None] == phv[:, None, :]).astype(f32)
        return jax.vmap(
            lambda o: jnp.dot(B, o, precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=f32))(oh)

    pdA = pd(phiA)
    PA, DA = pdA[:, :T8], pdA[:, T8:]
    VA = PA + a0[:, None, :].astype(f32) * DA
    parts = [VA, DA]
    if not (packed or dir_ == 0):
        # NOTE a gamma*mm(dD) single-matmul correction (using tap
        # continuity, dV = gamma0*dD) is exact ONLY for within-bank
        # crossings: at a bank WRAP (1/nphi of crossings) the window
        # shifts one sample and dV gains O(tap) edge terms — the exact
        # host-subtracted (dV, dD) pair is required (measured 5e-4
        # errors at rate 0.4709 on the merged form, all at qB != qA).
        pdB = pd(phiB)
        PB, DB = pdB[:, :T8], pdB[:, T8:]
        aB = (a0 - jnp.float32(dir_))[:, None, :].astype(f32)
        parts += list(_delta_rows(pk, VA, DA, PB + aB * DB, DB))
    return jnp.concatenate(parts, axis=1)


def _valder_rows_farrow(coeffs, pk, a0, dir_: int, nphi: int,
                        packed: bool):
    """(tiles8, NV*T8, L2p) f32 host-evaluated Farrow tap rows.

    V[t] = polyval(coeffs[:, t], psi0) — the reference's per-output tap
    regeneration (Filters.jl:780-792) at the tile-start psi, evaluated in
    f64 on the host (the round-4 kernel Horner ran f32 with psi up to
    nphi+1: genuine cancellation; host f64 is exact to an f32 ulp) — and
    D[t] = d/dpsi polyval: the first-order psi-drift row. Unpacked
    drifting plans append the precancelled crossing-delta rows at
    psi0 - dir*nphi (the post-crossing wrap) — see _delta_rows."""
    f32 = jnp.float32
    P1, T = coeffs.shape
    T8 = -(-(T + 1) // 8) * 8
    cf = jnp.asarray(coeffs, jnp.float64)                  # (P1, T)
    dcf = cf[1:] * jnp.arange(1, P1, dtype=jnp.float64)[:, None] \
        if P1 > 1 else None

    def horner(c, psi):
        # c (Pn, T), psi (tiles8, L2p) -> (tiles8, T8, L2p)
        acc = jnp.broadcast_to(c[-1][None, :, None],
                               (psi.shape[0], T, psi.shape[1]))
        for p in range(c.shape[0] - 2, -1, -1):
            acc = acc * psi[:, None, :] + c[p][None, :, None]
        acc = acc.astype(f32)
        return jnp.concatenate(
            [acc, jnp.zeros((psi.shape[0], T8 - T, psi.shape[1]), f32)],
            axis=1)

    def vd(psi):
        V = horner(cf, psi)
        D = (horner(dcf, psi) if dcf is not None
             else jnp.zeros_like(V))
        return V, D

    psiA = a0.astype(jnp.float64)
    VA, DA = vd(psiA)
    parts = [VA, DA]
    if not (packed or dir_ == 0):
        VB, DB = vd(psiA - jnp.float64(dir_ * nphi))
        parts += list(_delta_rows(pk, VA, DA, VB, DB))
    return jnp.concatenate(parts, axis=1)


# Within-tile drift budgets (static per plan; drift = |eps|*jt*2^-32 in
# alpha units for arb, bank units for Farrow). Arb's valder fold is
# EXACTLY linear in alpha — the threshold only picks the drift-matmul
# grade (1-pass bf16 error ~ drift*2^-8 of the derivative term). Farrow's
# is a first-order psi linearization: error ~ drift^2 * |taps''|, so
# large-drift plans (big convergent residue) fall back to the per-row
# psi-Horner kernel.
_ARB_D1_DRIFT = 1.0 / 128.0
_FARROW_VALDER_DRIFT = 0.02


def _gridsel_apply(meta: GridselMeta, rows_of, T: int, nphi: int,
                   delta_fx: int, history, x, u0, d0, n_max: int, dt,
                   farrow: bool, horner_cf=None, polyorder=None):
    """Shared valder dispatch: pack exact per-tile index state, build the
    host V/D tap rows (``rows_of(pk, a0, phiA, phiB, packed)``), and run
    the fused (single/few-channel) or batched (>= 16 channels) kernel.
    Large-drift Farrow plans route to the psi-Horner fallback kernels
    (``horner_cf`` = (P1*T8, L2p) lane-pre-broadcast coeff rows thunk).
    Returns a TILE-PADDED output (trailing length num_tiles*JT*L2 >=
    n_max; filt_block_raw's y_padded contract)."""
    from .pallas import gridsel as pg

    L2, M2, eps, JT, sp2, L2p = meta[:6]
    packed = 2 * L2 <= L2p and eps != 0
    lead = x.shape[:-1]
    C = int(np.prod(lead)) if lead else 0
    dims = _batch_dims(meta, C, n_k=2) if C >= 16 else None
    jt = dims[1] if dims is not None else None
    num_tiles, tiles8 = _geometry(meta, n_max, jt)
    pk, rowc, a0, phiA, phiB = _pack(meta, nphi, delta_fx, u0, d0, tiles8,
                                     farrow=farrow, jt=jt, packed=packed)
    dir_ = 0 if eps == 0 else (1 if eps > 0 else -1)
    drift = abs(eps) * (jt or JT) * 2.0 ** -32
    horner = farrow and drift > _FARROW_VALDER_DRIFT
    interp = jax.default_backend() != "tpu"
    kw = dict(M2=M2, sp2=sp2, T=T, L2=L2, L2p=L2p, dir_=dir_,
              deps=float(eps * 2.0 ** -32), num_tiles=num_tiles,
              packed=packed, interpret=interp)
    packs = (pk, rowc, a0)
    if horner:
        banks = (horner_cf(),)
        kw["nphi"] = nphi
        kw["P1"] = polyorder + 1
        batch_fn, fused_fn = (pg.gridsel_farrow_horner_batch,
                              pg.gridsel_farrow_horner_fused)
    else:
        banks = (rows_of(pk, a0, phiA, phiB, dir_, packed),)
        kw["nv"] = 2 if (packed or dir_ == 0) else 4
        if not farrow:
            kw["d_pass"] = 3 if drift > _ARB_D1_DRIFT else 1
        batch_fn, fused_fn = (pg.gridsel_resample_batch,
                              pg.gridsel_resample_fused)

    if dims is not None:
        cb, jt_b = dims
        xext = jnp.concatenate(
            [jnp.broadcast_to(history.astype(x.dtype),
                              (*lead, history.shape[-1])), x], axis=-1)
        x2d = _tile_x(xext.astype(jnp.float32), meta, num_tiles, jt)
        x3 = x2d.reshape(C, *x2d.shape[-2:])
        cpad = -(-C // cb) * cb - C
        if cpad:
            x3 = jnp.concatenate(
                [x3, jnp.zeros((cpad, *x3.shape[1:]), x3.dtype)], axis=0)
        y = batch_fn(x3, *packs, *banks, CB=cb, JT=jt_b, **kw)
        out = y[:C].reshape(C, num_tiles * jt_b * L2)
        return out.reshape(*lead, out.shape[-1]).astype(dt)

    xr = _rows_x(history, x.astype(jnp.float32), meta, num_tiles)

    def run(xv):
        y = fused_fn(xv, *packs, *banks, JT=JT, **kw)
        return y.reshape(num_tiles * JT * L2)

    if xr.ndim == 2:
        return run(xr).astype(dt)
    out = jax.vmap(run)(xr.reshape(-1, *xr.shape[-2:]))
    return out.reshape(*lead, out.shape[-1]).astype(dt)


def arb_gridsel_apply(meta: GridselMeta, pfb, dpfb, nphi: int,
                      delta_fx: int, history, x, u0, d0, n_max: int, dt):
    """Arbitrary resample of one block through the valder gridsel kernel.

    Single/few channels run the fused-input kernel (in-VMEM window
    assembly from the (R, M2) row view — no HBM overlap tiling, exp32).
    Batched (channel-lead) inputs with >= 16 channels run the
    batched-channel kernel (one shared K build per tile; channels stacked
    on the matmul row axis) instead of vmapping the single-channel kernel,
    which replicates the placement work per channel."""
    def rows_of(pk, a0, phiA, phiB, dir_, packed):
        return _valder_rows_arb(pfb, dpfb, pk, phiA, phiB, a0, dir_,
                                packed)

    return _gridsel_apply(meta, rows_of, pfb.shape[0], nphi, delta_fx,
                          history, x, u0, d0, n_max, dt, farrow=False)


def farrow_gridsel_apply(meta: GridselMeta, coeffs, nphi: int,
                         delta_fx: int, history, x, u0, d0, n_max: int,
                         dt):
    """Farrow resample of one block through the valder gridsel kernel
    (see arb_gridsel_apply; the kernels unified in round 5 — only the
    host tap-row evaluation differs). Large-drift plans run the psi-
    Horner fallback with the lane-pre-broadcast coefficient bank."""
    P1, T = coeffs.shape

    def rows_of(pk, a0, phiA, phiB, dir_, packed):
        return _valder_rows_farrow(coeffs, pk, a0, dir_, nphi, packed)

    def horner_cf():
        # lane-pre-broadcast layout: row p*T + t = coeffs[p, t] across all
        # L2p lanes (placement stages need (1, L2p) rows — Mosaic has no
        # both-axes vector broadcast)
        L2p = meta.L2p
        PT8 = -(-(P1 * T) // 8) * 8
        return jnp.zeros((PT8, L2p), jnp.float32).at[:P1 * T, :].set(
            jnp.broadcast_to(
                coeffs.astype(jnp.float32).reshape(P1 * T, 1),
                (P1 * T, L2p)))

    return _gridsel_apply(meta, rows_of, T, nphi, delta_fx,
                          history, x, u0, d0, n_max, dt, farrow=True,
                          horner_cf=horner_cf, polyorder=P1 - 1)
