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
           "default_jt"]


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
            xh16, xl16 = prec.split_bf16(xs)
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
        return out.reshape(num_tiles * JT * L)[:n_out]

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
    return out.reshape(num_tiles * JT * L)[:n_out]
