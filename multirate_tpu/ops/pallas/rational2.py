"""Grouped-band Pallas TPU kernel for the rational supercycle matmul (v2).

The v1 kernel (rational.py) contracts the full dense (U, gL) banded tap
matrix: every output column multiplies all U rows although its band is only
T wide (density T/U ~ 5% for the 147//160 headline) — it is MXU-compute
bound at ~40% of the HBM roofline. This kernel splits the output columns
into groups of <= 128 (the MXU lane quantum). Group bands span only
~128*M/L + T + 1 input samples; a pair of STATIC lane rolls re-aligns the
group's band start to lane 0 of the xcat tile, so each group is ONE narrow
matmul:

    for group c [static]:
        xg  = roll-assemble xcat so xg[j, m] = x[j*gM + b8_c + m]
        out[:, cols(c)] = xg[:JT, :span_c] @ K[b8_c : b8_c + span_c, cols(c)]

MACs/input ~ (L/M) * (128*M/L + T) ~ 151 for the headline vs ~614 dense —
the kernel leaves the MXU-bound regime and runs at the single-read HBM
bandwidth bound. Roll-assembly is O(NC) VPU ops per tile: negligible.

Requirements: group bands must fit one xcat row span (gM >= 128*M/L + T +
1 + 8, checked by band_groups); the deficit must be folded into the DATA
(callers slice xext by d0-1) — group ranges carry only the +1 row of
entry-phase slack (any phi0 in [1, L] shifts a fresh band start by at most
+1, see build_k_matrix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import precision as prec

__all__ = ["rational_supercycle_grouped", "band_groups", "padded_need",
           "default_jt", "band_groups_zc", "zc_geometry",
           "rational_zc_main", "build_k_zc_stack", "ZC_S", "ZC_S_BF16",
           "ZC_S_INT8", "zc_s"]

# Zero-copy history depth: the streaming state carries the last S rows
# (S*gM samples) of the stream, so the kernel reads the new block x IN
# PLACE (natural (rows, gM) reshape) with no [history ++ x] concat — the
# concat costs a full extra HBM read+write pass, as much as the kernel
# itself at roofline. S is the sublane quantum of the input dtype: f32 8,
# bf16 16 ((16, 128) memory tiles), int8 32. The streaming state carries
# exactly the rows its mode needs (params._zc_rows).
ZC_S = 8
ZC_S_BF16 = 16
ZC_S_INT8 = 32


def zc_s(dtype) -> int:
    """Zero-copy row quantum for an input dtype (sublane granularity)."""
    if dtype == jnp.bfloat16:
        return ZC_S_BF16
    if dtype == jnp.int8:
        return ZC_S_INT8
    return ZC_S


def _jt2(bf16: bool) -> int:
    # only the next row is ever touched (span <= gM); bf16 memory tiles
    # are (16, 128) so bf16 blocks need 16-sublane granularity
    return 16 if bf16 else 8


def default_jt(L: int, M: int, n_out: int, bf16: bool = False) -> int:
    """The kernel's default tile rows (kept in sync with
    rational_supercycle_grouped's JT selection)."""
    JT2 = _jt2(bf16)
    JT = max(JT2, min(512, 131072 // M))
    JT = -(-JT // JT2) * JT2
    return min(JT, -(- -(-n_out // L) // JT2) * JT2)


def padded_need(L: int, M: int, n_out: int, JT: int | None = None,
                bf16: bool = False) -> int:
    """Input samples the kernel will touch (callers may pre-pad xext to
    this length with a single fused concat so the kernel's own jnp.pad
    becomes a free no-op slice)."""
    JT2 = _jt2(bf16)
    if JT is None:
        JT = default_jt(L, M, n_out, bf16)
    num_tiles = -(- -(-n_out // L) // JT)
    return (num_tiles * JT + JT2) * M


def band_groups(T: int, L: int, M: int, group: int,
                cols_per_group: int = 128, shift_slack: int = 0):
    """Static (col0, col1, b8, span) for each output-column group.

    Column c = r_g*L + r has fresh-stream band start off_c = r_g*M +
    (r*M)//L; entry phase phi0 in [1, L] shifts it by at most +1 row.
    b8 is the group's 8-aligned minimum band row; span covers through the
    slack-padded band end, 8-rounded. ``shift_slack`` widens every span
    by that many rows so the caller may fold a dynamic streaming-deficit
    shift into K (roll K down by d0-1 <= shift_slack rows) instead of
    shifting the data — Mosaic has no dynamic lane rotate for unaligned
    (non-128-multiple) row widths, and a caller-side data shift costs a
    full extra HBM pass. Returns None if any group span exceeds
    2*group*M - b8 (the one-spill-row assembly limit; fall back to the
    dense v1 kernel).
    """
    gL, gM = group * L, group * M
    c = np.arange(gL)
    off = (c // L) * M + ((c % L) * M) // L
    groups = []
    for c0 in range(0, gL, cols_per_group):
        c1 = min(c0 + cols_per_group, gL)
        b8 = (int(off[c0:c1].min()) // 8) * 8
        hi = int(off[c0:c1].max()) + 1 + T + shift_slack
        span = -(-(hi - b8) // 8) * 8
        if b8 + span > 2 * gM:
            return None
        groups.append((c0, c1, b8, span))
    return tuple(groups)


def _kernel(x_a, x_b, *rest, JT: int, gM: int, groups: tuple,
            three_pass: bool):
    # xcat row r holds x[r*gM : (r+1)*gM]; for group band start b8:
    # xs[j, m] = x[j*gM + b8 + m] assembled by one static lane roll.
    # Bands spilling past the row boundary (b8 + span > gM) are handled
    # by SUMMING two partial matmuls (in-row part + next-row part) —
    # Mosaic has no lane-axis concat with mismatched offsets.
    #
    # three_pass: HIGHEST costs 6 bf16 MXU passes. The manual bf16x3
    # split (x = hi + lo, K pre-split on host) costs 3 passes at ~2^-16
    # relative error — well inside the 1e-4 budget (ops/precision.py).
    if three_pass:
        kh_ref, kl_ref, o_ref = rest
    else:
        (k_ref, o_ref) = rest
    f32 = jnp.float32
    bf16_in = x_a.dtype == jnp.bfloat16
    xcat = jnp.concatenate([x_a[:], x_b[:]], axis=0)       # (JT+JT2, gM)
    if bf16_in:
        # Mosaic lane rotates operate on 32-bit elements; assemble the
        # shifted windows in f32 (VMEM only — HBM traffic stays bf16,
        # which is the whole point of the quantized mode) and drop back
        # to bf16 for the single-pass MXU matmul.
        xcat = xcat.astype(f32)
    total = xcat.shape[0]

    def mm(xs, r0, r1_, c0, c1):
        """xs @ K[r0:r1_, c0:c1] at the configured precision."""
        if three_pass:
            xh16, xl16 = _ksplit(xs)
            kh = kh_ref[r0:r1_, c0:c1]
            kl = kl_ref[r0:r1_, c0:c1]
            acc = jnp.dot(xh16, kh, preferred_element_type=f32)
            acc = acc + jnp.dot(xh16, kl, preferred_element_type=f32)
            acc = acc + jnp.dot(xl16, kh, preferred_element_type=f32)
            return acc
        if bf16_in:
            return jnp.dot(xs.astype(jnp.bfloat16), k_ref[r0:r1_, c0:c1],
                           preferred_element_type=f32)
        return jnp.dot(xs, k_ref[r0:r1_, c0:c1],
                       preferred_element_type=x_a.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    xnext = None
    for (c0, c1, b8, span) in groups:
        r1 = (xcat if b8 == 0
              else pltpu.roll(xcat, jnp.int32(gM - b8), axis=1))
        if b8 + span <= gM:
            acc = mm(r1[:JT, :span], b8, b8 + span, c0, c1)
        else:
            p1 = gM - b8
            if xnext is None:
                xnext = pltpu.roll(xcat, jnp.int32(total - 1), axis=0)
            acc = (mm(r1[:JT, :p1], b8, gM, c0, c1)
                   + mm(xnext[:JT, :span - p1], gM, b8 + span, c0, c1))
        o_ref[:, c0:c1] = acc.astype(x_a.dtype)


def rational_supercycle_grouped(x, K, L: int, M: int, n_out: int,
                                groups: tuple,
                                JT: int | None = None,
                                interpret: bool = False,
                                use_grid: bool = True,
                                three_pass: bool = False):
    """Grouped-band variant of rational_supercycle_pallas.

    ``x`` must start at the stream origin. The streaming deficit is folded
    in either by the caller slicing the data (x[d0-1:]) or — far cheaper —
    by ROLLING K down d0-1 rows (jnp.roll(K, d0-1, axis=0), using K's
    zero-row headroom) with ``groups`` built with shift_slack >= the max
    deficit: no data movement at all. L/M here are the effective grouped
    values (g*L, g*M); K is (U, L) from build_k_matrix/_select_k.
    """
    U = K.shape[0]
    need_u = max(b8 + span for (_, _, b8, span) in groups)
    if need_u > U:
        # 8-rounding + shift slack can push a group's span a few rows past
        # K; pad with zero rows (K is tiny)
        K = jnp.concatenate(
            [K, jnp.zeros((need_u - U, K.shape[1]), K.dtype)], axis=0)
        U = need_u
    JT2 = _jt2(x.dtype == jnp.bfloat16)
    J_total = -(-n_out // L)
    if JT is None:
        JT = default_jt(L, M, n_out, x.dtype == jnp.bfloat16)
    num_tiles = -(-J_total // JT)
    need = (num_tiles * JT + JT2) * M
    x_pad = jnp.pad(x, (0, max(0, need - x.shape[0])))[:need]
    x2d = x_pad.reshape(-1, M)
    ratio = JT // JT2

    if three_pass:
        # split_bf16, NOT the round-based split: K is a dynamic jit value
        # here and XLA's excess-precision folding zeroes the naive lo term
        # (ops/precision.py).
        K_hi, K_lo = prec.split_bf16(K)
        k_args = (K_hi, K_lo)
        k_specs = [pl.BlockSpec((U, L), lambda j: (j * 0, j * 0),
                                memory_space=pltpu.VMEM)] * 2
    else:
        k_args = (K,)
        k_specs = [pl.BlockSpec((U, L), lambda j: (j * 0, j * 0),
                                memory_space=pltpu.VMEM)]
    kern = functools.partial(_kernel, JT=JT, gM=M, groups=groups,
                             three_pass=three_pass)

    if use_grid:
        # Multi-tile grid (DMA/compute pipelining). Cold compiles of this
        # shape were observed to take minutes through the relay compile
        # service under load (the remote cache makes repeats instant);
        # per-tile calls below are the fallback shape if that regresses.
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((num_tiles * JT, L), x.dtype),
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((JT, M), lambda j: (j, j * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((JT2, M), lambda j: ((j + 1) * ratio, j * 0),
                             memory_space=pltpu.VMEM),
                *k_specs,
            ],
            out_specs=pl.BlockSpec((JT, L), lambda j: (j, j * 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x2d, x2d, *k_args)
        return out.reshape(num_tiles * JT * L)

    # One single-grid pallas call per tile, with CONSTANT block offsets in
    # the index maps (sidesteps the slow-grid compile at the cost of one
    # y-concat and no cross-tile pipelining).
    tiles = []
    for t in range(num_tiles):
        out_t = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((JT, L), x.dtype),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((JT, M), lambda j, _t=t: (j * 0 + _t, j * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((JT2, M),
                             lambda j, _t=t: (j * 0 + (_t + 1) * ratio,
                                              j * 0),
                             memory_space=pltpu.VMEM),
                *k_specs,
            ],
            out_specs=pl.BlockSpec((JT, L), lambda j: (j * 0, j * 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x2d, x2d, *k_args)
        tiles.append(out_t)
    out = tiles[0] if num_tiles == 1 else jnp.concatenate(tiles, axis=0)
    return out.reshape(num_tiles * JT * L)


# --------------------------------------------------------------------------- #
# Zero-copy entry variant (v3)
# --------------------------------------------------------------------------- #
#
# The grouped kernel above consumes xext = [history ++ x ++ pad] — one full
# extra HBM read+write to materialize. This variant eliminates every
# per-block O(N) or O(K) preparation:
#
#   - streaming state carries hist = the last ZC_S*gM stream samples
#     (ZC_S rows); x is reshaped (R, gM) IN PLACE (R = xlen // gM).
#   - conceptual stream rows: xext_p row u = hist row u (u < S) else
#     x2d row u - S. Supercycle j's bands live at absolute lane positions
#     (j + S)*gM + off(c) - h_min (h_min = minimal history, T - 1), i.e.
#     rows j+S-1 / j+S (+1 spill) of xext_p — assembled per tile from
#     [first_S, x_a(JT), next_S] with first_S selected between the hist
#     block (tile 0) and the previous S rows of x2d (program_id select),
#     via cached static sublane rolls. No data is ever shifted in HBM.
#   - the deficit d0-1 SELECTS a pre-rolled K slab from a host-built
#     compressed stack via scalar prefetch — zero per-block K arithmetic
#     (any per-call K roll/split/cond costs ~as much HBM traffic as the
#     kernel itself). The stack is compressed to per-group 128-col
#     stripes: slab (Umax, G*128) holds K[b8_g : b8_g+span_g, c0_g:c1_g]
#     at rows [0, span_g) of stripe g (~6x smaller than the dense band).
#   - the last (possibly input-incomplete) tile is computed by a SECOND
#     single-step pallas call over a tiny assembled tail block (includes
#     the sub-row remainder of x), writing into the SAME output buffer
#     via input_output_aliases: no concat, no dynamic-update-slice — so a
#     consumer reading only a suffix element never forces the full
#     flat-layout rewrite, while the alias chain keeps the main grid live.
#
# Reference semantics preserved: Filters.jl:558-568 recurrence (closed
# form), deficit/phase carry identical to the grouped path.


def band_groups_zc(T: int, L: int, M: int, group: int, h_min: int,
                   shift_slack: int = 0, cols_per_group: int = 128,
                   lane_align: int = 128):
    """Static (c0, c1, b8, span) groups for the zero-copy kernel.

    b8 is the band start in lanes RELATIVE to xcat row r + (S-1) for
    output row r, floored to ``lane_align``: band position p(c) = gM +
    off(c) - h_min (in [gM - h_min, 2*gM)), so b8 in [0, 2*gM).

    lane_align=128 aligns every band start to a whole vector register, so
    the kernel assembles group windows with ZERO cross-lane rolls — a
    128-multiple lane slice of a (rows-rolled) tile is free, while a
    dynamic-width lane roll is a full-tile VPU shuffle (measured: the 5
    per-group lane rolls cost ~as much as the matmuls). The price is up
    to lane_align-1 extra leading K rows per group — mitigated by the DP
    boundary choice below. Returns None if the geometry is inapplicable
    (h_min > gM, or a group span would exceed one row width gM).

    With lane_align=128 the group COLUMN boundaries are chosen by dynamic
    programming to minimize the total number of 128-row contraction
    chunks (the v4 body issues ceil(span/128) chunk matmuls per group,
    each a full MXU pass regardless of how many of its leading rows the
    128-flooring wasted): fixed 128-col boundaries cost 13 chunk passes
    on the 147//160 headline, the DP partition 11 (-15% MXU work). Ties
    prefer fewer groups (narrower K stripes, fewer output stores).
    """
    gL, gM = group * L, group * M
    if h_min > gM:
        return None
    c = np.arange(gL)
    off = (c // L) * M + ((c % L) * M) // L
    p = gM + off - h_min

    def mk(c0, c1):
        b8 = (int(p[c0:c1].min()) // lane_align) * lane_align
        hi = int(p[c0:c1].max()) + 1 + T + shift_slack
        span = -(-(hi - b8) // 8) * 8
        return (c0, c1, b8, span)

    if lane_align == 128 and ZC_DP_GROUPS:
        # DP over contiguous partitions, width <= cols_per_group.
        # cost(group) = (chunks, 1): lexicographic (total chunk passes,
        # then group count). p is nondecreasing in c, so min = p[c0].
        INF = (1 << 30, 1 << 30)
        f = [INF] * (gL + 1)
        nxt = [0] * (gL + 1)
        f[gL] = (0, 0)
        for c0 in range(gL - 1, -1, -1):
            b8 = (int(p[c0]) // 128) * 128
            best, bc1 = INF, 0
            for c1 in range(c0 + 1, min(c0 + cols_per_group, gL) + 1):
                hi = int(p[c1 - 1]) + 1 + T + shift_slack
                span = -(-(hi - b8) // 8) * 8
                if span > gM:
                    break
                nch = -(-span // 128)
                v = (nch + f[c1][0], 1 + f[c1][1])
                if v < best:
                    best, bc1 = v, c1
            f[c0], nxt[c0] = best, bc1
        if f[0][0] >= (1 << 30):
            return None
        groups, c0 = [], 0
        while c0 < gL:
            c1 = nxt[c0]
            groups.append(mk(c0, c1))
            c0 = c1
        return tuple(groups)

    groups = []
    for c0 in range(0, gL, cols_per_group):
        g = mk(c0, min(c0 + cols_per_group, gL))
        if g[3] > gM:  # segment loop supports 2 rows max per group
            return None
        groups.append(g)
    return tuple(groups)


def zc_groups(T: int, L: int, M: int, group: int, h_min: int,
              shift_slack: int = 0):
    """Group plan for the zero-copy kernel.

    When the row width gM is a multiple of 128, prefer 128-lane-aligned
    band starts: the v4 chunked body (`_zc_body_v4`) then assembles every
    x window from FREE 128-aligned vreg slices of the raw input block
    plus two narrow (128-lane) boundary strips — zero full-block rolls.
    (With the OLD roll-based body, 128-alignment measured SLOWER — 30.7
    vs 41.9 Gsps — because the ~1.3x wider spans cost more than the lane
    rolls they saved; the v4 body removes the 3 full-block sublane rolls
    AND the per-group lane rolls, flipping that trade.) Geometries where
    128-alignment pushes a span past one row width gM fall back to
    8-alignment + the roll-based body."""
    if (group * M) % 128 == 0 and not ZC_FORCE_ALIGN8:
        g128 = band_groups_zc(T, L, M, group, h_min, shift_slack,
                              lane_align=128)
        if g128 is not None:
            return g128
    return band_groups_zc(T, L, M, group, h_min, shift_slack, lane_align=8)


# Experiment knob: force the 8-aligned roll-based geometry even when the
# v4 chunked geometry applies (exp/exp11_v4_ab.py A/B runs). Must be set
# both at kernel construction AND around the timed call (the plan is
# re-derived at trace time).
ZC_FORCE_ALIGN8: bool = False

# Experiment knobs: DP group boundaries (vs fixed 128-col), and the
# in-kernel data split (split_bf16_kernel vs split_bf16_trunc). Same
# trace-time caveat as ZC_FORCE_ALIGN8.
ZC_DP_GROUPS: bool = True
ZC_FAST_SPLIT: bool = True

# Grid-size ceiling for the FUSED boundary-tile kernel: pl.when keeps two
# v4 body instantiations live, costing ~12% per MAIN-grid step (exp24
# interleaved bisect: 53.6 vs 47.7 Gsps at 8M), while the alternative —
# a separate aliased tail pallas_call — costs one extra dispatch
# serialized behind the grid (~9-16% of call time at 1M-scale inputs,
# amortizing away as the grid grows). Fuse short grids, split long ones.
ZC_FUSE_MAX_TILES: int = 24

# Contract each group's same-row-view lane run as one long-depth dot
# instead of per-128-lane chunks (see the _zc_body_v4 group loop).
# Measured neutral-to-slightly-slower on the 147//160 headline (exp24:
# 54.3 vs 55.4 Gsps medians, within pace-drift noise); kept off, retained
# for geometries where cross-view chunk rolls dominate (small gM).
ZC_LONGDOT: bool = False


def _ksplit(v):
    """Data-side (hi, lo) bf16 split used inside the zc kernel bodies."""
    return (prec.split_bf16_kernel(v) if ZC_FAST_SPLIT
            else prec.split_bf16_trunc(v))


# TIMING-ONLY stage ablation for the zc v4 body (results numerically
# WRONG for ablated stages — never set outside experiments; mirrors
# gridsel's GRIDSEL_ABLATE): "nomm" skips the chunk matmuls, "nostrip"
# feeds every chunk from the u=S row view (no boundary-strip concat or
# roll), "nosplit" contracts a single bf16 pass instead of three.
import os as _os

_ZC_ABLATE = frozenset(
    a for a in _os.environ.get("ZC_ABLATE", "").split(",") if a)


def _v4_ok(gM: int, groups: tuple) -> bool:
    """True when the chunked roll-free assembly applies (all band starts
    and the row width on the 128-lane vreg grid)."""
    return gM % 128 == 0 and all(b8 % 128 == 0 for (_, _, b8, _) in groups)


def build_k_zc_stack(pfb2d: np.ndarray, L: int, M: int, group: int,
                     h_min: int, n_deficit: int, groups) -> np.ndarray:
    """Host-side compressed (L*D, Umax, G*128) float32 stack of zc-layout
    banded tap matrices: slab (phi0-1)*D + d is pre-built for entry phase
    phi0 and deficit shift d (= d0 - 1), so the kernel's scalar-prefetch
    slab index folds the ENTIRE streaming entry state with zero per-block
    K arithmetic (any per-call K roll/cond/split costs ~as much HBM
    traffic as the kernel itself). Stripe g holds the dense band rows
    [b8_g, b8_g + span_g) of column group g at rows [0, span_g), cols
    [g*128, g*128 + (c1-c0)).

    Column c = r_g*L + r of entry phase phi0 has band start (in lanes
    relative to supercycle row, zc origin) gM - h_min + d + r_g*M +
    (phi0-1+r*M)//L with taps pfb[:, (phi0-1+r*M) mod L] — the reference
    recurrence Filters.jl:558-568 in closed form, tabulated.
    """
    pfb2d = np.asarray(pfb2d, np.float32)
    T = pfb2d.shape[0]
    gM, gL = group * M, group * L
    D = n_deficit
    c = np.arange(gL)
    r_g, r = c // L, c % L
    phis = np.arange(1, L + 1)
    t_r = (phis[:, None] - 1) + r[None, :] * M          # (L, gL)
    off = r_g[None, :] * M + t_r // L                   # (L, gL) lanes
    pcol = t_r % L                                      # (L, gL) bank col
    umax = max(span for (*_, span) in groups)
    out = np.zeros((L * D, umax, len(groups) * 128), np.float32)
    tI = np.arange(T)
    for d in range(D):
        for gi, (c0, c1, b8, span) in enumerate(groups):
            W = c1 - c0
            rows = (off[:, c0:c1, None] + (gM - h_min + d) - b8
                    + tI[None, None, :])                     # (L, W, T)
            vals = pfb2d[tI[None, None, :], pcol[:, c0:c1, None]]
            cols = gi * 128 + np.arange(W)[None, :, None] + 0 * rows
            slab = (np.arange(L)[:, None, None] * D + d) + 0 * rows
            out[slab, rows, cols] = vals
    return out


# Experiment knob: force the zc kernel's tile rows (exp/exp9_zc_sweep.py).
ZC_JT_OVERRIDE: int | None = None
# Experiment knob: force the zc kernel's OUTPUT dtype (exp41/exp43 bf16
# store-path A/B); None = follow the input dtype (int8 -> int32).
ZC_OUT_DTYPE_OVERRIDE = None


def zc_geometry(L: int, M: int, n_out: int, xlen: int, JT: int | None = None,
                S: int = ZC_S):
    """Static grid geometry (JT, num_tiles, T_ok, R), or None when the
    zero-copy path cannot cover at least one full main tile. L/M are the
    grouped effective values (g*L, g*M); ``S`` is the row quantum
    (zc_s(dtype)). num_tiles - T_ok <= 1; the leftover tile (if any) runs
    as the aliased tail call.

    When the preferred tile exceeds the block's input rows — or leaves
    more than one leftover tile (an n_max-ceiling row can push J_total
    one past R) — the tile shrinks (S-quantized descending scan) until
    the grid covers the block. Precision class is unaffected by the
    tile size for every mode: f32 runs the same 3-pass split as its
    grouped-kernel fallback, and the quantized modes' precision is set
    by the operand dtype (int8 is exact regardless)."""
    R = xlen // M
    if JT is not None:
        cands = [JT]
    else:
        # ~1 MB of x rows per tile, capped at 384: the exp25 JT sweep on
        # the 147//160 headline (gM=640) was flat-to-rising over 304-600
        # with the best median at ~400; 104-200 measurably slower.
        jt = ZC_JT_OVERRIDE or max(S, min(384, (262144 // M) // S * S))
        jt = -(-jt // S) * S
        cands = list(range(jt, S - 1, -S))
    J_total = -(-n_out // L)
    for jt in cands:
        num_tiles = -(-J_total // jt)
        T_ok = min(num_tiles, max(0, (R - S) // jt))
        if T_ok >= 1 and num_tiles - T_ok <= 1:
            return jt, num_tiles, T_ok, R
    return None


def _zc_compute_dtype(in_dtype):
    """Assembly dtype for the zc kernels: Mosaic lane rotates / sublane
    selects operate on 32-bit elements, so sub-32-bit inputs are widened
    once on entry (VMEM only — HBM traffic stays at the narrow dtype) and
    narrowed back per-matmul."""
    if in_dtype == jnp.bfloat16:
        return jnp.float32
    if in_dtype == jnp.int8:
        return jnp.int32
    return in_dtype


def _zc_body(xcat, rest, *, JT: int, gM: int, groups: tuple,
             three_pass: bool, out_dtype):
    """Shared contraction body: out rows r from bands at xcat rows
    r+S-1 .. r+S+1 against the compressed K stripes. S is implied by the
    assembled block (total = JT + 2*S). ``xcat`` arrives pre-widened to
    the 32-bit assembly dtype; the matmul mode follows the K stack dtype:
    bf16 pair -> 3-pass split, bf16 single -> native bf16 MXU pass,
    int8 -> native s8 x s8 -> s32 MXU pass, f32/f64 -> HIGHEST."""
    if three_pass:
        kh_ref, kl_ref, o_ref = rest
    else:
        (k_ref, o_ref) = rest
    f32 = jnp.float32
    total = xcat.shape[0]
    S = (total - JT) // 2

    def mm(xs, r0, r1_, gi, w):
        cs = gi * 128
        if three_pass:
            xh16, xl16 = _ksplit(xs)
            kh = kh_ref[0, r0:r1_, cs:cs + w]
            kl = kl_ref[0, r0:r1_, cs:cs + w]
            acc = jnp.dot(xh16, kh, preferred_element_type=f32)
            acc = acc + jnp.dot(xh16, kl, preferred_element_type=f32)
            acc = acc + jnp.dot(xl16, kh, preferred_element_type=f32)
            return acc
        kd = k_ref.dtype
        if kd == jnp.bfloat16:
            return jnp.dot(xs.astype(jnp.bfloat16),
                           k_ref[0, r0:r1_, cs:cs + w],
                           preferred_element_type=f32)
        if kd == jnp.int8:
            return jnp.dot(xs.astype(jnp.int8),
                           k_ref[0, r0:r1_, cs:cs + w],
                           preferred_element_type=jnp.int32)
        return jnp.dot(xs, k_ref[0, r0:r1_, cs:cs + w],
                       preferred_element_type=xs.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    views = {0: xcat}

    def rowview(k):
        if k not in views:
            views[k] = pltpu.roll(xcat, jnp.int32(total - k), axis=0)
        return views[k]

    for gi, (c0, c1, b8, span) in enumerate(groups):
        k0 = (S - 1) + b8 // gM
        lane = b8 % gM
        w = c1 - c0
        v = rowview(k0)
        if lane % 128 == 0 and lane + span <= gM:
            # 128-aligned lane slice: pure vreg select, no data movement
            acc = mm(v[:JT, lane:lane + span], 0, span, gi, w)
        elif lane % 128 == 0:
            p1 = gM - lane
            v2 = rowview(k0 + 1)
            acc = (mm(v[:JT, lane:gM], 0, p1, gi, w)
                   + mm(v2[:JT, :span - p1], p1, span, gi, w))
        else:
            r1 = (v if lane == 0
                  else pltpu.roll(v, jnp.int32(gM - lane), axis=1))
            if lane + span <= gM:
                acc = mm(r1[:JT, :span], 0, span, gi, w)
            else:
                p1 = gM - lane
                v2 = rowview(k0 + 1)
                acc = (mm(r1[:JT, :p1], 0, p1, gi, w)
                       + mm(v2[:JT, :span - p1], p1, span, gi, w))
        if o_ref.ndim == 3:      # narrow-lane output layout (see launch)
            o_ref[:, c0 // 128, :] = acc.astype(out_dtype)
        else:
            o_ref[:, c0:c1] = acc.astype(out_dtype)


def _zc_body_v4(f_first, f_xa, f_next, rest, *, S: int, JT: int, gM: int,
                groups: tuple, three_pass: bool, in_dt, out_dtype):
    """Roll-free chunked contraction body (requires `_v4_ok` geometry).

    Every group band start b8 and the row width gM sit on the 128-lane
    vreg grid, so each group's x window decomposes into 128-lane chunks
    that are FREE vreg slices of the raw input rows (``f_xa`` — the u=S
    row view IS the input block, no assembly at all), plus at most two
    narrow boundary strips (u = S-1 / S+1: a (JT+2S, 128) three-piece
    concat + one narrow sublane roll — ~gM/128 x cheaper than the
    full-block rowview rolls of the v3 body, and there are zero per-group
    lane rolls). Chunks and their bf16x3 splits are cached across groups
    (adjacent group bands overlap by ~T+slack rows).

    ``f_first(l0)`` / ``f_xa(lm)`` / ``f_next(l0)`` return the (S, 128) /
    (JT, 128) / (S, 128) lane window [l0, l0+128) of the rows just
    before / of / just after the tile's input rows, in ``in_dt``.
    """
    if three_pass:
        kh_ref, kl_ref, o_ref = rest
    else:
        (k_ref, o_ref) = rest
    f32 = jnp.float32
    if "nobody" in _ZC_ABLATE:               # timing-only: bare structure
        o_ref[...] = jnp.ones(o_ref.shape, o_ref.dtype)
        return
    total = JT + 2 * S
    wide = _zc_compute_dtype(in_dt)          # 32-bit dtype rolls operate in
    if three_pass:
        mm_dt = None                         # split pair, handled in mmk
    else:
        mm_dt = k_ref.dtype if k_ref.dtype in (jnp.bfloat16, jnp.int8) \
            else wide

    strips: dict = {}                        # l0 -> (total, 128) in `wide`
    chunks: dict = {}                        # (u, lm) -> chunk / split pair

    def strip(l0):
        if l0 not in strips:
            strips[l0] = jnp.concatenate(
                [f_first(l0).astype(wide), f_xa(l0).astype(wide),
                 f_next(l0).astype(wide)], axis=0)
        return strips[l0]

    def chunk(u, lm):
        key = (u, lm)
        if key not in chunks:
            if u == S or "nostrip" in _ZC_ABLATE:
                xs = f_xa(lm)
            else:
                xs = pltpu.roll(strip(lm), jnp.int32(total - u),
                                axis=0)[:JT]
            if three_pass:
                chunks[key] = _ksplit(xs.astype(f32))
            else:
                chunks[key] = xs.astype(mm_dt)
        return chunks[key]

    def mmk(xs, kr0, w, cs, wc):
        if "nomm" in _ZC_ABLATE:
            z = xs[0] if three_pass else xs
            return jnp.zeros((z.shape[0], wc), f32) + jnp.float32(1.0)
        if three_pass:
            xh16, xl16 = xs
            if w < 128:
                xh16, xl16 = xh16[:, :w], xl16[:, :w]
            kh = kh_ref[0, kr0:kr0 + w, cs:cs + wc]
            kl = kl_ref[0, kr0:kr0 + w, cs:cs + wc]
            acc = jnp.dot(xh16, kh, preferred_element_type=f32)
            if "nosplit" in _ZC_ABLATE:
                return acc
            acc = acc + jnp.dot(xh16, kl, preferred_element_type=f32)
            acc = acc + jnp.dot(xl16, kh, preferred_element_type=f32)
            return acc
        if w < 128:
            xs = xs[:, :w]
        kd = k_ref.dtype
        if kd == jnp.bfloat16:
            return jnp.dot(xs, k_ref[0, kr0:kr0 + w, cs:cs + wc],
                           preferred_element_type=f32)
        if kd == jnp.int8:
            return jnp.dot(xs, k_ref[0, kr0:kr0 + w, cs:cs + wc],
                           preferred_element_type=jnp.int32)
        return jnp.dot(xs, k_ref[0, kr0:kr0 + w, cs:cs + wc],
                       preferred_element_type=xs.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    for gi, (c0, c1, b8, span) in enumerate(groups):
        k0 = (S - 1) + b8 // gM
        lane = b8 % gM
        wc = c1 - c0
        acc = None
        r0 = 0
        while r0 < span:
            al = lane + r0
            u = k0 + al // gM
            lm0 = al % gM
            rend = min(span, r0 + gM - lm0)
            if ZC_LONGDOT and u == S and rend - r0 > 128:
                # Whole same-row-view lane run as ONE long-depth dot:
                # the chunk accumulation moves inside the MXU pipeline
                # (no per-chunk (JT, wc) f32 acc roundtrip). exp23
                # ablation: pass-issue cost, not HBM, bounds the kernel
                # (full 80 / nosplit 161 / dmaonly 605 Gsps-equivalent).
                # Run bounds stay 128-aligned (b8, gM on the vreg grid),
                # so the slice is still a free lane window of the rows.
                w = rend - r0
                xs = f_xa(lm0, w)
                xs = (_ksplit(xs.astype(f32)) if three_pass
                      else xs.astype(mm_dt))
                part = mmk(xs, r0, w, gi * 128, wc)
                r0 = rend
            else:
                w = min(128, rend - r0)
                part = mmk(chunk(u, lm0), r0, w, gi * 128, wc)
                r0 += w
            acc = part if acc is None else acc + part
        if o_ref.ndim == 3:      # narrow-lane output layout (see launch)
            o_ref[:, c0 // 128, :] = acc.astype(out_dtype)
        else:
            o_ref[:, c0:c1] = acc.astype(out_dtype)


def _kernel_zc_main(dsel_ref, hist_ref, prev_ref, xa_ref, next_ref, *rest,
                    JT: int, gM: int, groups: tuple, three_pass: bool):
    pid = pl.program_id(0)
    if _v4_ok(gM, groups):
        S = hist_ref.shape[0]

        def f_first(l0):
            return jnp.where(pid == jnp.int32(0),
                             hist_ref[:, l0:l0 + 128],
                             prev_ref[:, l0:l0 + 128])

        _zc_body_v4(f_first, lambda lm, w=128: xa_ref[:, lm:lm + w],
                    lambda l0: next_ref[:, l0:l0 + 128], rest,
                    S=S, JT=JT, gM=gM, groups=groups,
                    three_pass=three_pass, in_dt=xa_ref.dtype,
                    out_dtype=rest[-1].dtype)
        return
    cdt = _zc_compute_dtype(xa_ref.dtype)
    first = jnp.where(pid == jnp.int32(0), hist_ref[...],
                      prev_ref[...]).astype(cdt)
    xcat = jnp.concatenate(
        [first, xa_ref[...].astype(cdt), next_ref[...].astype(cdt)], axis=0)
    _zc_body(xcat, rest, JT=JT, gM=gM, groups=groups,
             three_pass=three_pass, out_dtype=rest[-1].dtype)


def _kernel_zc_tail(dsel_ref, xt_ref, *rest, JT: int, gM: int,
                    groups: tuple, three_pass: bool):
    # rest = (*k_refs, prev_out_ref(ANY, ignored), o_ref)
    if _v4_ok(gM, groups):
        S = (xt_ref.shape[0] - JT) // 2
        _zc_body_v4(lambda l0: xt_ref[0:S, l0:l0 + 128],
                    lambda lm, w=128: xt_ref[S:S + JT, lm:lm + w],
                    lambda l0: xt_ref[S + JT:, l0:l0 + 128],
                    (*rest[:-2], rest[-1]),
                    S=S, JT=JT, gM=gM, groups=groups,
                    three_pass=three_pass, in_dt=xt_ref.dtype,
                    out_dtype=rest[-1].dtype)
        return
    cdt = _zc_compute_dtype(xt_ref.dtype)
    _zc_body(xt_ref[...].astype(cdt), (*rest[:-2], rest[-1]), JT=JT, gM=gM,
             groups=groups, three_pass=three_pass,
             out_dtype=rest[-1].dtype)


def _kernel_zc_fused(dsel_ref, hist_ref, prev_ref, xa_ref, next_ref, xt_ref,
                     *rest, JT: int, gM: int, groups: tuple,
                     three_pass: bool):
    """Single-grid v4 kernel covering the boundary tile too: the LAST grid
    step takes its rows from the small pre-assembled ``xt`` block (which
    holds the sub-row remainder of x plus zero tail padding); every other
    step reads the raw stream rows. The two cases are pl.when-PREDICATED
    (two body instantiations, one executed per step): selecting per chunk
    with jnp.where instead costs (JT, 128) selects on EVERY step —
    measured ~10% of tile time at 8M (exp13 rawup-vs-notail gap). The
    clamped xa/prev/next index maps keep the last step's (unread) stream
    blocks in bounds. This replaces the separate aliased tail pallas_call
    (a second dispatch serialized behind the whole main grid: measured
    ~9-16% of call time at 1M-scale block counts)."""
    pid = pl.program_id(0)
    S = hist_ref.shape[0]
    tail = pid == jnp.int32(pl.num_programs(0) - 1)
    kw = dict(S=S, JT=JT, gM=gM, groups=groups, three_pass=three_pass,
              in_dt=xa_ref.dtype, out_dtype=rest[-1].dtype)

    @pl.when(jnp.logical_not(tail))
    def _main():
        def f_first(l0):
            return jnp.where(pid == jnp.int32(0), hist_ref[:, l0:l0 + 128],
                             prev_ref[:, l0:l0 + 128])

        _zc_body_v4(f_first, lambda lm, w=128: xa_ref[:, lm:lm + w],
                    lambda l0: next_ref[:, l0:l0 + 128], rest, **kw)

    @pl.when(tail)
    def _tail():
        _zc_body_v4(lambda l0: xt_ref[0:S, l0:l0 + 128],
                    lambda lm, w=128: xt_ref[S:S + JT, lm:lm + w],
                    lambda l0: xt_ref[S + JT:, l0:l0 + 128], rest, **kw)


def rational_supercycle_zc(x, hist, k_stack, dsel, L: int, M: int,
                           n_out: int, groups: tuple, geo,
                           three_pass: bool = True,
                           interpret: bool = False, out_dtype=None):
    """Zero-copy rational supercycle resample over flat ``x``.

    x: (xlen,) at the stream origin of THIS block; hist: (>= S*gM,)
    trailing stream samples; k_stack: (k_hi, k_lo) compressed bf16 stacks
    (three_pass) or one f32/bf16 stack (bf16 x runs the single-pass bf16
    MXU matmul at S = 16); dsel: deficit slab index d0-1.
    Entry phase must be 1 (callers cond on it). Returns the flat
    TILE-PADDED grid output (num_tiles*JT*L,) — entries past n_out are
    unspecified; callers use their count (slicing to n_out here would
    cost a full extra HBM read+write pass over y).
    """
    S = zc_s(x.dtype)
    odt = out_dtype or ZC_OUT_DTYPE_OVERRIDE or (
        jnp.int32 if x.dtype == jnp.int8
        else jnp.float32 if x.dtype == jnp.bfloat16
        else x.dtype)
    JT, num_tiles, T_ok, R = geo
    # Narrow-lane output layout (round 5): a (JT, L) out block with L on
    # the lane axis DMAs at ~274 GB/s when L spans many 128-lane quanta,
    # while the SAME flat bytes written as 128-lane rows sustain ~750-800
    # (exp54 — writes post ~2.4x faster than reads, but only for
    # narrow-lane blocks). When every column group is an exact 128-lane
    # run, emit the output as (rows, L//128, 128): row-major flat memory
    # is IDENTICAL, the callers' final .reshape(-1) is unchanged, and
    # each group's store targets [:, c0//128, :].
    narrow = (L % 128 == 0
              and all(c0 % 128 == 0 and c1 - c0 == 128
                      for (c0, c1, _, _) in groups))
    oshape = ((num_tiles * JT, L // 128, 128) if narrow
              else (num_tiles * JT, L))

    def ospec(index2):
        if narrow:
            return pl.BlockSpec((JT, L // 128, 128),
                                lambda j, d_ref: (*index2(j, d_ref), 0 * j))
        return pl.BlockSpec((JT, L), index2)
    xlen = x.shape[0]
    x2d = x[: R * M].reshape(R, M)
    h2d = hist[hist.shape[0] - S * M:].reshape(S, M)
    if three_pass:
        k_args = tuple(k_stack)
        D, U, GC = k_stack[0].shape
    else:
        k_args = (k_stack,)
        D, U, GC = k_stack.shape
    k_specs = [pl.BlockSpec((1, U, GC),
                            lambda j, d_ref: (d_ref[0], j * 0, j * 0))
               for _ in k_args]
    assert JT % S == 0
    rps = JT // S
    dsel1 = dsel.reshape(1).astype(jnp.int32)

    if (num_tiles > T_ok and _v4_ok(M, groups)
            and num_tiles <= ZC_FUSE_MAX_TILES):
        # fused single-grid form: the boundary tile rides the main grid
        # (see _kernel_zc_fused). Clamped index maps keep the last step's
        # (dead) stream reads in bounds.
        J0 = T_ok * JT
        o0 = (J0 - S) * M
        need = (JT + 2 * S) * M
        xt = x[o0: min(o0 + need, xlen)]
        xt2d = jnp.pad(xt, (0, need - xt.shape[0])).reshape(JT + 2 * S, M)
        rb_max = R // S - 1
        ja_max = (R - JT) // JT
        kern_f = functools.partial(_kernel_zc_fused, JT=JT, gM=M,
                                   groups=groups, three_pass=three_pass)
        out = pl.pallas_call(
            kern_f,
            out_shape=jax.ShapeDtypeStruct(oshape, odt),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(num_tiles,),
                in_specs=[
                    pl.BlockSpec((S, M), lambda j, d_ref: (j * 0, j * 0)),
                    pl.BlockSpec(
                        (S, M),
                        lambda j, d_ref: (
                            jnp.minimum(jnp.maximum(j * rps - 1, 0), rb_max),
                            j * 0)),
                    pl.BlockSpec((JT, M),
                                 lambda j, d_ref: (jnp.minimum(j, ja_max),
                                                   j * 0)),
                    pl.BlockSpec(
                        (S, M),
                        lambda j, d_ref: (jnp.minimum((j + 1) * rps, rb_max),
                                          j * 0)),
                    pl.BlockSpec((JT + 2 * S, M),
                                 lambda j, d_ref: (j * 0, j * 0)),
                    *k_specs,
                ],
                out_specs=ospec(lambda j, d_ref: (j, j * 0)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(dsel1, h2d, x2d, x2d, x2d, xt2d, *k_args)
        return out.reshape(num_tiles * JT * L)

    kern = functools.partial(_kernel_zc_main, JT=JT, gM=M, groups=groups,
                             three_pass=three_pass)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(oshape, odt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T_ok,),
            in_specs=[
                pl.BlockSpec((S, M), lambda j, d_ref: (j * 0, j * 0)),
                pl.BlockSpec((S, M),
                             lambda j, d_ref: (jnp.maximum(j * rps - 1, 0),
                                               j * 0)),
                pl.BlockSpec((JT, M), lambda j, d_ref: (j, j * 0)),
                pl.BlockSpec((S, M), lambda j, d_ref: ((j + 1) * rps,
                                                       j * 0)),
                *k_specs,
            ],
            out_specs=ospec(lambda j, d_ref: (j, j * 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(dsel1, h2d, x2d, x2d, x2d, *k_args)

    if num_tiles > T_ok:
        # final tile over a small assembled block (includes the sub-row
        # remainder of x and zero tail padding), written into the same
        # buffer via aliasing — in-place, and the alias chain keeps the
        # main grid live for suffix-only consumers.
        J0 = T_ok * JT
        o0 = (J0 - S) * M
        need = (JT + 2 * S) * M
        xt = x[o0: min(o0 + need, xlen)]
        xt2d = jnp.pad(xt, (0, need - xt.shape[0])).reshape(JT + 2 * S, M)
        kern_t = functools.partial(_kernel_zc_tail, JT=JT, gM=M,
                                   groups=groups, three_pass=three_pass)
        out = pl.pallas_call(
            kern_t,
            out_shape=jax.ShapeDtypeStruct(oshape, odt),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((JT + 2 * S, M),
                                 lambda j, d_ref: (j * 0, j * 0)),
                    *k_specs,
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=ospec(
                    lambda j, d_ref, _t=T_ok: (j * 0 + _t, j * 0)),
            ),
            input_output_aliases={len(k_args) + 2: 0},
            interpret=interpret,
        )(dsel1, xt2d, *k_args, out)
    return out.reshape(num_tiles * JT * L)
