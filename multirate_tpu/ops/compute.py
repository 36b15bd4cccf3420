"""Block filtering computations: one batched contraction per output block.

This is the TPU-native replacement for the reference's per-output
``unsafedot`` inner loops (support.jl:5-55). The central formulation is the
**generalized supercycle matmul**: every rational-family kernel (standard,
interpolator, decimator, rational) is a banded-matrix contraction

    Y (J, gL) = X3 (J, gM + T + M) @ K (gM + T + M, gL)

where row j of the overlapped input reshape X3[j, u] = xext[j*g*M + u]
contains every window of ``g`` consecutive supercycles, and K encodes the
closed-form per-output window offsets and phase columns (the reference
recurrence Filters.jl:558-568 evaluated analytically; see
pallas/rational.py:build_k_matrix). The grouping factor g widens degenerate
ratios so even a plain FIR runs as a ~128-column MXU matmul.

Compute paths:

- ``windows``: gather an (N, taps_per_phi) window matrix and contract with
  per-output tap rows. Universal (any kernel, any dtype incl. complex); the
  correctness reference for the fast paths. ``slices`` variant uses
  contiguous slice-gathers (TPU-friendlier) for the arbitrary/Farrow
  kernels.
- ``conv``: XLA ``conv_general_dilated`` (good on CPU; poor on TPU for long
  single-channel kernels).
- ``supercycle``: the banded matmul with X3 materialized by XLA.
- ``pallas``: the banded matmul as a Pallas kernel. Prefers the zero-copy
  kernel (in-place x reads, phase/deficit-selected compressed K stacks,
  ops/pallas/rational2.py) when its plan applies; otherwise the grouped
  (rational) or dense v1 concat-entry kernels.
- ``concat``: like ``pallas`` but skips the zero-copy plan — always the
  concat-entry grouped/v1 kernel (for per-run A/B benchmarks).
- arbitrary/Farrow fast paths: ``winsel`` (fused window-select; batched
  channels dispatch to the chansel kernel), ``gridsel`` (rational-grid
  tile-adaptive), ``ratgrid`` (static banded matmul; Farrow), and the

All paths consume the extended signal xext = [history, x_block] so filter
ramp-up across block boundaries is uniform (the reference's split
history/signal dot, support.jl:16-31, disappears).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import indexing as idx
from . import precision as prec
from .params import (
    FIRStandard, FIRInterpolator, FIRDecimator, FIRRational,
    FIRArbitrary, FIRFarrow, FilterState,
)

__all__ = ["filt_block_raw"]


def _out_dtype(params, x):
    tap = params.taps_rev if hasattr(params, "taps_rev") else params.pfb
    dt = jnp.promote_types(tap.dtype, x.dtype)
    if dt == jnp.bfloat16:
        # bf16 quantized mode emits f32 ACCUMULATORS, mirroring the int8
        # mode's exact int32 outputs: the MXU already accumulates in f32,
        # a bf16 output store costs 1.6x the whole kernel in Mosaic
        # (16, 128)-tile relayout (exp43: 0.125 -> 0.078 ms bare), and
        # re-quantizing throws the accumulated precision away. Halved
        # traffic on the INPUT side is the mode's bandwidth win;
        # re-quantization of outputs belongs to the cascade stage.
        return jnp.float32
    return dt


def _extend(history, x):
    """xext = [history, x] along time (the shiftin! stream, support.jl:61-80)."""
    return jnp.concatenate([history.astype(x.dtype), x], axis=-1)


def _new_history(xext, history_len: int):
    return xext[..., xext.shape[-1] - history_len:]


def _gather_windows(xext, starts0, taps_per_phi: int, slices: bool = False):
    """W[..., n, t] = xext[..., starts0[n] + t] (clipped gather).

    ``slices=True`` lowers to N contiguous T-element slice-gathers
    (vmapped dynamic_slice) instead of N*T single-element gathers — the
    same values, but far friendlier to the TPU gather unit."""
    if slices:
        E = xext.shape[-1]
        s32 = jnp.clip(starts0, 0, E - taps_per_phi).astype(jnp.int32)

        def one(s):
            return lax.dynamic_slice_in_dim(xext, s, taps_per_phi, axis=-1)

        W = jax.vmap(one)(s32)              # (N, ..., T)
        return jnp.moveaxis(W, 0, -2)       # (..., N, T)
    ind = starts0[:, None] + jnp.arange(taps_per_phi, dtype=starts0.dtype)[None, :]
    return jnp.take(xext, ind, axis=-1, mode="clip")


def _row_contract(W, taps):
    """y[..., n] = sum_t W[..., n, t] * taps[n, t]."""
    if W.dtype == jnp.bfloat16:
        return jnp.einsum("...nt,nt->...n", W, taps,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    return jnp.einsum("...nt,nt->...n", W, taps, precision=prec.TAP)


def _corr1d(x, kernels, stride: int = 1):
    """Correlate (..., W) with (T,) or (T, C) kernels, VALID, stride.

    Returns (..., outW) for 1-D kernels or (..., outW, C) for multi-channel.
    """
    dt = jnp.promote_types(x.dtype, kernels.dtype)
    x = x.astype(dt)
    kernels = kernels.astype(dt)
    single = kernels.ndim == 1
    k = kernels[:, None] if single else kernels  # (T, C)
    T, C = k.shape
    lead = x.shape[:-1]
    lhs = x.reshape(-1, 1, x.shape[-1])            # (B, 1, W)
    rhs = k.T.reshape(C, 1, T)                     # (C, 1, T)
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=lhs.dtype, precision=prec.TAP,
    )                                               # (B, C, outW)
    out = jnp.moveaxis(out, 1, -1).reshape(*lead, out.shape[-1], C)
    return out[..., 0] if single else out


def _shift_origin(xext, d0, max_shift: int):
    """ys[..., i] = xext[..., (d0-1) + i], zero-padded on the right."""
    padded = jnp.pad(xext, [(0, 0)] * (xext.ndim - 1) + [(0, max_shift)])
    return lax.dynamic_slice_in_dim(
        padded, (d0 - 1).astype(jnp.int32), xext.shape[-1], axis=-1)


def _shift_origin_tm(xt, d0, max_shift: int):
    """Time-major (E, C) variant: ys[i, :] = xt[(d0-1) + i, :]."""
    padded = jnp.pad(xt, [(0, max_shift), (0, 0)])
    return lax.dynamic_slice_in_dim(
        padded, (d0 - 1).astype(jnp.int32), xt.shape[0], axis=0)


# --------------------------------------------------------------------------- #
# Generalized supercycle machinery (standard / interp / decim / rational)
# --------------------------------------------------------------------------- #

def _band_geometry(params):
    """(pfb2d (T, L), L, M, group) for a rational-family kernel."""
    if isinstance(params, FIRStandard):
        return params.taps_rev.reshape(-1, 1), 1, 1, params.sc_group
    if isinstance(params, FIRDecimator):
        return (params.taps_rev.reshape(-1, 1), 1, params.decimation,
                params.sc_group)
    if isinstance(params, FIRInterpolator):
        return params.pfb, params.interpolation, 1, params.sc_group
    if isinstance(params, FIRRational):
        return (params.pfb, params.interpolation, params.decimation,
                params.sc_group)
    raise TypeError(type(params))


def _build_k_in_graph(params, phi0, d0, dtype, origin: int = 0,
                      rows_total: int | None = None):
    """Banded tap matrix for arbitrary traced entry state, origin-folded:
    column c = r_g*L + r has band start r_g*M + (phi0-1+r*M)//L + (d0-1)
    + origin. ``origin``/``rows_total`` support the zero-copy K layout
    (origin = g*M - h_min, see pallas/rational2.build_k_zc_stack)."""
    pfb, L, M, g = _band_geometry(params)
    T = pfb.shape[0]
    c = jnp.arange(g * L, dtype=jnp.int64)
    r = c % L
    r_g = c // L
    t_r = (phi0 - 1) + r * M
    off = r_g * M + t_r // L + (d0 - 1) + origin
    rows = off[None, :] + jnp.arange(T, dtype=jnp.int64)[:, None]
    cols = jnp.broadcast_to(c[None, :], (T, g * L))
    vals = jnp.take(pfb, t_r % L, axis=1, mode="clip")
    if rows_total is None:
        rows_total = g * M + T + M + origin
    return jnp.zeros((rows_total, g * L), dtype=dtype).at[rows, cols].set(
        vals.astype(dtype))


def _select_k(params, phi0, d0, dtype):
    """Fresh streams (phase 1, deficit 1 — including any stream chunked in
    multiples of M, whose carried state provably returns to (1, 1)) take the
    host-precomputed k_super; only mid-phase entry pays the in-graph build
    (a TPU scatter, measured ~ms — hence the cond)."""
    fresh = jnp.logical_and(phi0 == 1, d0 == 1)
    # zero-valued anchor keeps both branches' device-variance types equal
    # under shard_map (the fresh branch is otherwise a closed-over constant)
    anchor = ((phi0 + d0) * 0).astype(dtype)
    return lax.cond(
        fresh,
        lambda: params.k_super.astype(dtype) + anchor,
        lambda: _build_k_in_graph(params, phi0, d0, dtype),
    )


def _supercycle_xla(xext, K, L_eff: int, M_eff: int, n_max: int):
    """Banded matmul with X3 materialized by XLA reshape/concat.

    bfloat16 operands accumulate in float32 on the MXU (native single-pass
    bf16 matmul, no precision splitting) and round back to bf16 on output:
    the quantized low-bandwidth mode (bf16 taps + bf16 signal halves HBM
    traffic, doubling the roofline)."""
    U = K.shape[0]
    J = -(-n_max // L_eff)
    k_parts = -(-U // M_eff)
    need = (J + k_parts - 1) * M_eff
    pad = max(0, need - xext.shape[-1])
    xs = jnp.pad(xext, [(0, 0)] * (xext.ndim - 1) + [(0, pad)])[..., :need]
    lead = xs.shape[:-1]
    parts = [
        xs[..., i * M_eff: i * M_eff + J * M_eff].reshape(*lead, J, M_eff)
        for i in range(k_parts)
    ]
    X3 = jnp.concatenate(parts, axis=-1)[..., :U]
    if jnp.issubdtype(X3.dtype, jnp.integer):
        # int8 quantized mode (ops/quant.py): native s8 x s8 -> s32 MXU
        # matmul, exact integer accumulation (no precision policy needed)
        Y = jnp.einsum("...ju,ul->...jl", X3, K.astype(X3.dtype),
                       preferred_element_type=jnp.int32)
    elif X3.dtype == jnp.bfloat16:
        Y = jnp.einsum("...ju,ul->...jl", X3, K.astype(X3.dtype),
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
    else:
        Y = jnp.einsum("...ju,ul->...jl", X3, K.astype(X3.dtype),
                       precision=prec.TAP)
    return Y.reshape(*lead, J * L_eff)


def _supercycle_pallas(xext, K, L_eff: int, M_eff: int, n_max: int):
    """Banded matmul via the Pallas kernel (X3 tiles live in VMEM only)."""
    from .pallas.rational import rational_supercycle_pallas

    interp = jax.default_backend() != "tpu"
    run = lambda xv: rational_supercycle_pallas(  # noqa: E731
        xv, K, L_eff, M_eff, n_max, interpret=interp)
    if xext.ndim == 1:
        return run(xext)
    lead = xext.shape[:-1]
    flat = xext.reshape(-1, xext.shape[-1])
    y = jax.vmap(run)(flat)
    return y.reshape(*lead, y.shape[-1])


def _grouped_k(params, phi0, d0, dt):
    """K for the grouped kernel: entry phase folded in, deficit NOT (the
    grouped kernel's static part ranges carry only +1 phi0 slack; the
    deficit is applied as a data-origin shift instead)."""
    anchor = ((phi0 + d0) * 0).astype(dt)
    return lax.cond(
        phi0 == 1,
        lambda: params.k_super.astype(dt) + anchor,
        lambda: _build_k_in_graph(params, phi0, jnp.asarray(1, jnp.int64),
                                  dt),
    )


def _max_deficit(L: int, M: int) -> int:
    """Inclusive bound on the streaming deficit shift d0-1.

    From rational_carry: d0' = in_count - xlen where in_n advances by at
    most ceil(M/L) per output, so d0' - 1 <= ceil(M/L) (induction from
    the fresh-stream d0=1). +1 safety margin; asserted by the
    sequential-replay tests."""
    return -(-M // L) + 1


def _run_grouped(params, xext, d0, n_max, K, groups):
    """Run the grouped kernel (vmapped over leading channel dims). The
    streaming deficit is folded into K — roll K down d0-1 rows (into its
    zero-row headroom; groups are built with matching shift_slack) — so
    the DATA is consumed in place: no extra HBM pass, and no in-kernel
    dynamic lane rotate (unsupported by Mosaic for non-128-multiple row
    widths)."""
    from .pallas.rational2 import rational_supercycle_grouped

    _, L, M, g = _band_geometry(params)
    K = jnp.roll(K, d0 - 1, axis=0)
    interp = jax.default_backend() != "tpu"
    # bf16x3 split: 3 MXU passes instead of HIGHEST's 6 at ~2^-16 relative
    # — measured 109.5 Gsps (~roofline) vs 31.8 Gsps on the v5e headline.
    # f64 keeps HIGHEST (the split targets f32 pipelines).
    tp = K.dtype == jnp.float32
    run = lambda xv: rational_supercycle_grouped(  # noqa: E731
        xv, K, g * L, g * M, n_max, groups, interpret=interp,
        three_pass=tp)
    if xext.ndim == 1:
        return run(xext)
    lead = xext.shape[:-1]
    y = jax.vmap(run)(xext.reshape(-1, xext.shape[-1]))
    return y.reshape(*lead, y.shape[-1])


def _rational_groups(params):
    """Static grouped-band plan for a rational kernel, or None."""
    from .pallas.rational2 import band_groups

    if not isinstance(params, FIRRational):
        return None
    L, M = params.interpolation, params.decimation
    return band_groups(params.taps_per_phi, L, M, params.sc_group,
                       shift_slack=_max_deficit(L, M))


# --------------------------------------------------------------------------- #
# Zero-copy rational path (pallas/rational2 v3): no [history ++ x] concat,
# no per-block K arithmetic — see rational2.py's design comment.
# --------------------------------------------------------------------------- #

def _zc_slack(params) -> int:
    """Deficit slab count for the zero-copy K stacks, per family (must
    match the n_deficit used at construction in params._zc_fields)."""
    if isinstance(params, FIRRational):
        return _max_deficit(params.interpolation, params.decimation)
    if isinstance(params, FIRDecimator):
        return params.decimation + 1
    return 1  # standard / interpolator: deficit is constant 1


def _zc_plan(params, x, dt, n_max):
    """Static zero-copy plan (groups, geometry) or None.

    Three modes: f32 signal against f32 taps (three-pass bf16x3 stacks,
    k_zc_lo present), and the quantized modes with a single stack
    (k_zc_lo is None): bf16 signal x bf16 taps (one bf16 MXU pass, S=16)
    and int8 signal x int8 taps (native s8 x s8 -> s32 MXU pass, S=32,
    exact int32 accumulation)."""
    from .pallas.rational2 import zc_groups, zc_geometry, zc_s

    if not (isinstance(params, (FIRStandard, FIRInterpolator, FIRDecimator,
                                FIRRational))
            and params.k_zc_hi is not None):
        return None
    want = jnp.float32 if params.k_zc_lo is not None else params.k_zc_hi.dtype
    out_want = jnp.float32 if want == jnp.bfloat16 else want
    if x.dtype != want or dt != out_want:
        return None
    pfb2d, L, M, g = _band_geometry(params)
    groups = zc_groups(pfb2d.shape[0], L, M, g, params.h_min,
                       shift_slack=_zc_slack(params))
    if groups is None:
        return None
    if x.ndim > 1:
        # STREAM-CONCAT batching: channels concatenate into ONE flat
        # stream with an M-aligned gap region carrying each channel's
        # history tail — gap % M == 0 and seg % M == 0 keep the shared
        # (phase, deficit) state identical at every segment entry, so a
        # single kernel call serves all channels at full zc speed.
        # (vmapping the kernel batches its BlockSpecs, which Mosaic
        # rejects on hardware; a loop of per-channel calls measured ~10x
        # one call — round 5, the c64 planar row.)
        C = int(np.prod(x.shape[:-1]))
        xlen = x.shape[-1]
        h_min = params.h_min
        gap = h_min + ((-(xlen + h_min)) % M)
        seg = xlen + gap
        ops_seg = seg * L // M
        n_tot = C * ops_seg + gap * L // M + 8
        geo = zc_geometry(g * L, g * M, n_tot, C * seg,
                          S=zc_s(x.dtype))
        if geo is None:
            return None
        return groups, geo, (C, xlen, gap, seg, ops_seg, n_tot, L, M)
    geo = zc_geometry(g * L, g * M, n_max, x.shape[-1], S=zc_s(x.dtype))
    if geo is None:
        return None
    return groups, geo, None


def _carry_history(params, state, x):
    """New history = trailing history_len samples of [old history ++ x]."""
    H = params.history_len
    xlen = x.shape[-1]
    if xlen >= H:
        return x[..., xlen - H:]
    return jnp.concatenate(
        [state.history[..., xlen - H:].astype(x.dtype), x], axis=-1)


def _run_zc(params, history, phi0, d0, x, n_max, plan):
    """Zero-copy rational resample: y_padded (..., n_max).

    The ENTIRE streaming entry state (phase, deficit) selects one
    pre-built compressed K slab — slab (phi0-1)*D + (d0-1) — via scalar
    prefetch, so the host stacks feed pallas_call directly with zero
    per-block K arithmetic. (Any per-call K roll/cond/select at the XLA
    level forces a copy of the stacks that costs as much HBM traffic as
    the kernel itself.)"""
    from .pallas.rational2 import rational_supercycle_zc

    _, L, M, g = _band_geometry(params)
    groups, geo, batch_meta = plan
    gL, gM = g * L, g * M
    kh, kl = params.k_zc_hi, params.k_zc_lo
    three_pass = kl is not None  # single bf16 stack in the quantized mode
    k_stack = (kh, kl) if three_pass else kh
    D = kh.shape[0] // L
    dsel = (jnp.clip(phi0 - 1, 0, L - 1) * D
            + jnp.clip(d0 - 1, 0, D - 1)).astype(jnp.int32)
    interp = jax.default_backend() != "tpu"
    xlen = x.shape[-1]

    sd = getattr(params, "store_dtype", None)

    def run(xv, hv, n_out):
        return rational_supercycle_zc(xv, hv, k_stack, dsel, gL, gM,
                                      n_out, groups, geo,
                                      three_pass=three_pass,
                                      interpret=interp,
                                      out_dtype=(jnp.dtype(sd) if sd
                                                 is not None else None))

    if x.ndim == 1:
        return run(x, history, n_max)
    # STREAM-CONCAT batching (see _zc_plan): one flat kernel call over
    # [gap_0 ++ x_0 ++ gap_1 ++ x_1 ++ ...] where gap_c = [zeros,
    # history_c tail]; per-channel outputs are static slices of the flat
    # grid output (segment alignment makes them exact).
    lead = x.shape[:-1]
    C, xl, gap, seg, ops_seg, n_tot, Lb, Mb = batch_meta
    x2 = x.reshape(C, xl)
    h2 = history.reshape(C, history.shape[-1])
    h_min = params.h_min
    histpad = jnp.concatenate(
        [jnp.zeros((C, gap - h_min), x.dtype),
         h2[:, h2.shape[-1] - h_min:].astype(x.dtype)], axis=-1)
    xflat = jnp.concatenate([histpad, x2], axis=-1).reshape(C * seg)
    zero_hist = jnp.zeros((history.shape[-1],), x.dtype)
    y_flat = run(xflat, zero_hist, n_tot)
    # ONE slice + free reshape: per-channel outputs are ops_seg apart, so
    # a single off0-shifted window reshapes to (C, ops_seg) rows whose
    # leading n_max entries are each channel's outputs; the tail padding
    # rides the y_padded >= max_outputs contract (64 per-channel
    # misaligned slices measured 0.47 ms/block — 2x the kernel itself)
    off0 = gap * Lb // Mb
    y = lax.slice_in_dim(y_flat, off0, off0 + C * ops_seg,
                         axis=0).reshape(C, ops_seg)
    return y.reshape(*lead, ops_seg)


def _supercycle_dispatch(params, xext, phi0, d0, n_max, dt, path):
    _, L, M, g = _band_geometry(params)
    if xext.ndim > 1 and jax.default_backend() == "tpu":
        # vmapped pallas_calls batch their BlockSpecs, which Mosaic
        # rejects on real hardware (see _zc_plan note); batched inputs
        # run the XLA supercycle (itself a batched MXU matmul)
        path = "supercycle"
    grouped = _rational_groups(params) if path == "pallas" else None
    if jnp.issubdtype(dt, jnp.integer):
        # int8 quantized mode outside the zc plan: the XLA supercycle
        # lowers to the native s8 MXU matmul; the float Pallas kernels
        # (HIGHEST / bf16x3 splits) don't apply to integer operands
        grouped = None
        path = "supercycle"

    if jnp.issubdtype(dt, jnp.complexfloating):
        # Complex taps (and possibly complex signal): planar decomposition
        # into 2-4 REAL supercycle applies — the MXU path instead of the
        # slow windows gather (reference complex support: runtests.jl:393).
        rt = jnp.float32 if dt == jnp.complex64 else jnp.float64
        x_cx = jnp.issubdtype(xext.dtype, jnp.complexfloating)
        xr = xext.real.astype(rt)
        xi = xext.imag.astype(rt) if x_cx else None
        t = params.taps_rev if hasattr(params, "taps_rev") else params.pfb
        if grouped is not None:
            Kc = _grouped_k(params, phi0, d0, dt)
            one_apply = lambda xv, Kv: _run_grouped(  # noqa: E731
                params, xv, d0, n_max, Kv, grouped)
        else:
            Kc = _select_k(params, phi0, d0, dt)
            app = _supercycle_pallas if path == "pallas" else _supercycle_xla
            one_apply = lambda xv, Kv: app(  # noqa: E731
                xv, Kv, g * L, g * M, n_max)
        if jnp.issubdtype(t.dtype, jnp.complexfloating):
            Kr, Ki = Kc.real.astype(rt), Kc.imag.astype(rt)
            yr = one_apply(xr, Kr)
            yi = one_apply(xr, Ki)
            if x_cx:
                yr = yr - one_apply(xi, Ki)
                yi = yi + one_apply(xi, Kr)
        else:
            Kr = Kc.real.astype(rt)
            yr = one_apply(xr, Kr)
            yi = one_apply(xi, Kr) if x_cx else jnp.zeros_like(yr)
        return jax.lax.complex(yr, yi).astype(dt)

    if grouped is not None:
        K = _grouped_k(params, phi0, d0, dt)
        return _run_grouped(params, xext.astype(dt), d0, n_max, K, grouped)
    K = _select_k(params, phi0, d0, dt)
    # bf16 without a grouped plan: the XLA supercycle already lowers to
    # the native single-pass bf16 MXU matmul (the v1 Pallas kernel is a
    # HIGHEST-precision f32 kernel)
    apply_ = (_supercycle_pallas if path == "pallas" and dt != jnp.bfloat16
              else _supercycle_xla)
    return apply_(xext.astype(dt), K, g * L, g * M, n_max)


# --------------------------------------------------------------------------- #
# Per-kernel implementations. Each returns (y_padded, count, new_state) where
# y_padded has a PATH-DEPENDENT static trailing length >= count (the pallas
# paths return their tile-padded grid output as-is: trimming it to
# max_outputs would cost a full extra HBM read+write pass over y — measured
# ~25% of the zc headline's wall time); entries past ``count`` are
# unspecified (callers trim or mask).
# --------------------------------------------------------------------------- #

def _norm_path(path):
    """"concat" = the Pallas concat-entry variant (grouped kernel for
    rational, v1 dense for standard/interp/decim): identical to "pallas"
    except the zero-copy plan is skipped. Exists so benchmarks can compare
    zc vs concat per-run (the auto path shadows concat when zc applies)."""
    return "pallas" if path == "concat" else path


def _standard(params: FIRStandard, state, x, path):
    dt = _out_dtype(params, x)
    n_out = x.shape[-1]
    hist_min = state.history[..., state.history.shape[-1] - params.h_min:]
    plan = _zc_plan(params, x, dt, n_out) if path == "pallas" else None
    path = _norm_path(path)
    if plan is not None:
        y = _run_zc(params, state.history.astype(x.dtype), state.phase,
                    state.deficit, x, n_out, plan)
    elif path in ("supercycle", "pallas"):
        one = jnp.asarray(1, jnp.int64)
        y = _supercycle_dispatch(params, _extend(hist_min, x), one, one,
                                 n_out, dt, path)
    elif path == "conv":
        y = _corr1d(_extend(hist_min, x), params.taps_rev.astype(dt))
    else:
        starts = jnp.arange(n_out, dtype=jnp.int64)
        W = _gather_windows(_extend(hist_min, x), starts, params.hlen)
        y = jnp.einsum("...nt,t->...n", W, params.taps_rev,
                       precision=prec.TAP).astype(dt)
    new_state = FilterState(history=_carry_history(params, state, x),
                            phase=state.phase, deficit=state.deficit)
    return y, jnp.asarray(n_out, jnp.int64), new_state


def _interpolator(params: FIRInterpolator, state, x, path):
    L, T = params.interpolation, params.taps_per_phi
    dt = _out_dtype(params, x)
    n_out = x.shape[-1] * L
    hist_min = state.history[..., state.history.shape[-1] - params.h_min:]
    plan = _zc_plan(params, x, dt, n_out) if path == "pallas" else None
    path = _norm_path(path)
    if plan is not None:
        y = _run_zc(params, state.history.astype(x.dtype), state.phase,
                    state.deficit, x, n_out, plan)
    elif path in ("supercycle", "pallas"):
        one = jnp.asarray(1, jnp.int64)
        y = _supercycle_dispatch(params, _extend(hist_min, x), one, one,
                                 n_out, dt, path)
    elif path == "conv":
        Y = _corr1d(_extend(hist_min, x), params.pfb.astype(dt))
        y = Y.reshape(*Y.shape[:-2], n_out)
    else:
        starts = jnp.arange(x.shape[-1], dtype=jnp.int64)
        W = _gather_windows(_extend(hist_min, x), starts, T)
        Y = jnp.einsum("...nt,tp->...np", W, params.pfb,
                       precision=prec.TAP).astype(dt)
        y = Y.reshape(*Y.shape[:-2], n_out)
    new_state = FilterState(history=_carry_history(params, state, x),
                            phase=state.phase, deficit=state.deficit)
    return y, jnp.asarray(n_out, jnp.int64), new_state


def _decimator(params: FIRDecimator, state, x, path):
    M, T = params.decimation, params.hlen
    xlen = x.shape[-1]
    n_max = idx.max_outputs(params, xlen)
    count, _, d0_next = idx.rational_carry(1, M, 1, state.deficit, xlen)
    dt = _out_dtype(params, x)
    hist_min = state.history[..., state.history.shape[-1] - params.h_min:]
    plan = _zc_plan(params, x, dt, n_max) if path == "pallas" else None
    path = _norm_path(path)
    if plan is not None:
        y = _run_zc(params, state.history.astype(x.dtype), state.phase,
                    state.deficit, x, n_max, plan)
    elif path in ("supercycle", "pallas"):
        one = jnp.asarray(1, jnp.int64)
        y = _supercycle_dispatch(params, _extend(hist_min, x), one,
                                 state.deficit, n_max, dt, path)
    elif path == "conv":
        xs = _shift_origin(_extend(hist_min, x), state.deficit, M + 1)
        y = _corr1d(xs, params.taps_rev.astype(dt), stride=M)[..., :n_max]
    else:
        inp, _ = idx.rational_indices(1, M, 1, state.deficit, n_max)
        W = _gather_windows(_extend(hist_min, x), inp - 1, T)
        y = jnp.einsum("...nt,t->...n", W, params.taps_rev,
                       precision=prec.TAP).astype(dt)
    new_state = FilterState(history=_carry_history(params, state, x),
                            phase=state.phase, deficit=d0_next)
    return y, count, new_state


def _rational(params: FIRRational, state, x, path):
    L, M, T = params.interpolation, params.decimation, params.taps_per_phi
    xlen = x.shape[-1]
    n_max = idx.max_outputs(params, xlen)
    count, phi_next, d0_next = idx.rational_carry(
        L, M, state.phase, state.deficit, xlen)
    dt = _out_dtype(params, x)
    # state.history may be longer than the filter math needs (the zc
    # kernel keeps ZC_S whole rows); non-zc paths use the trailing h_min
    hist_min = state.history[..., state.history.shape[-1] - params.h_min:]

    def _grouped_concat_y():
        # single fused concat [history, x, kernel tail padding]: the
        # grouped kernel's own jnp.pad then no-ops, saving a full extra
        # read+write pass over the stream
        from .pallas.rational2 import padded_need

        g = params.sc_group
        need = padded_need(g * L, g * M, n_max,
                           bf16=x.dtype == jnp.bfloat16)
        true_end = params.h_min + xlen
        pad = max(0, need - true_end)
        zshape = (*x.shape[:-1], pad)
        xext = jnp.concatenate(
            [hist_min.astype(x.dtype), x,
             jnp.zeros(zshape, x.dtype)], axis=-1)
        return _supercycle_dispatch(params, xext, state.phase,
                                    state.deficit, n_max, dt, path)

    plan = _zc_plan(params, x, dt, n_max) if path == "pallas" else None
    path = _norm_path(path)
    if plan is not None:
        y = _run_zc(params, state.history.astype(x.dtype), state.phase,
                    state.deficit, x, n_max, plan)
    elif path == "pallas" and _rational_groups(params) is not None:
        y = _grouped_concat_y()
    elif path in ("supercycle", "pallas"):
        xext = _extend(hist_min, x)
        y = _supercycle_dispatch(params, xext, state.phase, state.deficit,
                                 n_max, dt, path)
    else:
        xext = _extend(hist_min, x)
        inp, phi = idx.rational_indices(L, M, state.phase, state.deficit, n_max)
        W = _gather_windows(xext, inp - 1, T)
        taps = jnp.take(params.pfb.T, phi, axis=0, mode="clip")
        y = _row_contract(W, taps.astype(dt)).astype(dt)
    new_state = FilterState(history=_carry_history(params, state, x),
                            phase=phi_next, deficit=d0_next)
    return y, count, new_state


def _chansel_blocks(xs, run_v4, n_max):
    """Run the batched chansel kernel over arbitrary channel counts: pad
    the channel axis to the 8-sublane quantum and chunk at 128 channels
    (the kernel's VMEM block height). ``run_v4`` maps (C8, E) -> (C8,
    n_max) for any C8 that is a multiple of 8.

    Full 128-channel chunks beyond a small unroll budget run under
    ``lax.map`` (one traced body) so the jitted graph stays flat in C —
    a Python loop unrolled one kernel call per 128 channels linearly
    (VERDICT r4: C in the thousands bloated the graph)."""
    lead = xs.shape[:-1]
    C = int(np.prod(lead)) if lead else 1
    x2 = xs.reshape(C, xs.shape[-1])
    n_full = C // 128
    outs = []
    if n_full:
        xf = x2[:n_full * 128].reshape(n_full, 128, x2.shape[-1])
        if n_full <= 4:
            outs += [run_v4(xf[i]) for i in range(n_full)]
        else:
            yf = jax.lax.map(run_v4, xf)       # (n_full, 128, n_max)
            outs.append(yf.reshape(n_full * 128, n_max))
    rem = C - n_full * 128
    if rem:
        blk = x2[n_full * 128:]
        c8 = -(-rem // 8) * 8
        if c8 != rem:
            blk = jnp.concatenate(
                [blk, jnp.zeros((c8 - rem, blk.shape[-1]), blk.dtype)],
                axis=0)
        outs.append(run_v4(blk)[:rem])
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out.reshape(*lead, n_max)


def _arb_winsel(params: FIRArbitrary, xext, u0, d0, n_max, dt):
    """Fully fused arbitrary resample: closed-form (window start, phase,
    alpha) vectors feed one Pallas kernel that builds per-output taps from
    the tiny banks in VMEM and reads windows straight from x — no
    interpolated stream, no window matrix, nothing intermediate in HBM.

    Batched channels go to the chansel kernel (select4), single channels
    to the fused v3 kernel (select3); non-f32 dtypes fall back to the v1
    lane-roll kernel (select.py)."""
    from .params import PHASE_FRAC_BITS

    D = params.nphi << PHASE_FRAC_BITS
    max_step = int(params.delta_fx // D) + 1
    interp = jax.default_backend() != "tpu"
    from .pallas.select3 import v3_geometry, window_resample_v3

    if dt == jnp.float32 and v3_geometry(
            params.nphi, params.delta_fx, params.taps_per_phi,
            n_max) is not None:
        xs = lax.cond(
            d0 == 1,
            lambda: xext.astype(dt),
            lambda: _shift_origin(xext.astype(dt), d0, max_step + 2),
        )
        if xs.ndim > 1:
            # batched channels share (u0, d0): the chansel kernel emits
            # every channel from ONE matmul per output tile against a
            # shared in-VMEM banded tap matrix (pallas/select4.py) —
            # MXU-bound, vs the per-output VPU work of the v3 kernel
            from .pallas.select4 import chan_resample_v4, v4_geometry

            if v4_geometry(params.nphi, params.delta_fx,
                           params.taps_per_phi, n_max, 8) is not None:
                run = lambda blk: chan_resample_v4(  # noqa: E731
                    blk, u0, params.pfb, params.dpfb, params.nphi,
                    params.delta_fx, n_max, interpret=interp)
                return _chansel_blocks(xs, run, n_max)
        run3 = lambda xv: window_resample_v3(  # noqa: E731
            xv, u0, params.pfb, params.dpfb, params.nphi,
            params.delta_fx, n_max, interpret=interp)
        if xs.ndim == 1:
            return run3(xs)
        lead = xs.shape[:-1]
        out = jax.vmap(run3)(xs.reshape(-1, xs.shape[-1]))
        return out.reshape(*lead, n_max)

    inp, phi, frac = idx.accum_indices(
        params.nphi, params.delta_fx, u0, d0, n_max)
    starts = inp - 1
    from .pallas.select import window_select_pallas

    run = lambda xv: window_select_pallas(  # noqa: E731
        xv.astype(dt), starts, phi, frac.astype(dt),
        params.pfb.astype(dt), params.dpfb.astype(dt), max_step,
        interpret=interp)
    if xext.ndim == 1:
        return run(xext)
    lead = xext.shape[:-1]
    out = jax.vmap(run)(xext.reshape(-1, xext.shape[-1]))
    return out.reshape(*lead, n_max)


def _farrow_winsel(params: FIRFarrow, xext, u0, d0, n_max, dt):
    from .params import PHASE_FRAC_BITS

    D = params.nphi << PHASE_FRAC_BITS
    max_step = int(params.delta_fx // D) + 1
    interp = jax.default_backend() != "tpu"
    from .pallas.select3 import v3_geometry, window_resample_farrow_v3

    if dt == jnp.float32 and v3_geometry(
            params.nphi, params.delta_fx, params.taps_per_phi,
            n_max, farrow=True) is not None:
        xs = lax.cond(
            d0 == 1,
            lambda: xext.astype(dt),
            lambda: _shift_origin(xext.astype(dt), d0, max_step + 2),
        )
        if xs.ndim > 1:
            from .pallas.select4 import (chan_resample_farrow_v4,
                                         v4_geometry)

            if v4_geometry(params.nphi, params.delta_fx,
                           params.taps_per_phi, n_max, 8,
                           farrow=True) is not None:
                run = lambda blk: chan_resample_farrow_v4(  # noqa: E731
                    blk, u0, params.coeffs, params.nphi,
                    params.delta_fx, n_max, interpret=interp)
                return _chansel_blocks(xs, run, n_max)
        run3 = lambda xv: window_resample_farrow_v3(  # noqa: E731
            xv, u0, params.coeffs, params.nphi, params.delta_fx, n_max,
            interpret=interp)
        if xs.ndim == 1:
            return run3(xs)
        lead = xs.shape[:-1]
        out = jax.vmap(run3)(xs.reshape(-1, xs.shape[-1]))
        return out.reshape(*lead, n_max)

    inp, phi, frac = idx.accum_indices(
        params.nphi, params.delta_fx, u0, d0, n_max)
    starts = inp - 1
    phase_val = 1.0 + phi.astype(jnp.float64) + frac
    powers = phase_val[:, None] ** jnp.arange(params.polyorder + 1,
                                              dtype=jnp.float64)[None, :]
    from .pallas.select import window_select_farrow_pallas

    run = lambda xv: window_select_farrow_pallas(  # noqa: E731
        xv.astype(dt), starts, powers.astype(dt),
        params.coeffs.astype(dt), max_step, interpret=interp)
    if xext.ndim == 1:
        return run(xext)
    lead = xext.shape[:-1]
    out = jax.vmap(run)(xext.reshape(-1, xext.shape[-1]))
    return out.reshape(*lead, n_max)


def _hist_tail(history, x, H: int):
    """Trailing H samples of [history, x] WITHOUT materializing the 32 MB
    xext concat (the gridsel fused path never forms xext; exp32)."""
    if H == 0:
        return x[..., :0]
    if x.shape[-1] >= H:
        return x[..., x.shape[-1] - H:]
    return jnp.concatenate([history.astype(x.dtype), x], axis=-1)[..., -H:]


def _arbitrary(params: FIRArbitrary, state, x, path):
    T = params.taps_per_phi
    xlen = x.shape[-1]
    n_max = idx.max_outputs(params, xlen)
    count, u_next, d0_next = idx.accum_carry(
        params.nphi, params.delta_fx, state.phase, state.deficit, xlen)
    dt = _out_dtype(params, x)
    if path == "gridsel":
        from .gridsel import arb_gridsel_apply

        if (params.gridsel_meta is None or n_max > params.gridsel_meta.n_cap
                or dt != jnp.float32):
            raise ValueError(
                "no gridsel plan for this configuration/block size/dtype; "
                "use path='winsel' or 'windows'")
        y = arb_gridsel_apply(
            params.gridsel_meta, params.pfb, params.dpfb, params.nphi,
            params.delta_fx, state.history, x, state.phase, state.deficit,
            n_max, dt)
        new_state = FilterState(
            history=_hist_tail(state.history, x, params.history_len),
            phase=u_next, deficit=d0_next)
        return y, count, new_state
    xext = _extend(state.history, x)
    if path == "winsel":
        y = _arb_winsel(params, xext, state.phase, state.deficit, n_max, dt)
    else:
        inp, phi, frac = idx.accum_indices(
            params.nphi, params.delta_fx, state.phase, state.deficit, n_max)
        # taps = pfb[:, phi] + alpha*dpfb[:, phi]: first-order interpolation
        # via the derivative bank (Filters.jl:677-690, 730).
        taps = (jnp.take(params.pfb.T, phi, axis=0, mode="clip")
                + frac[:, None].astype(params.pfb.dtype)
                * jnp.take(params.dpfb.T, phi, axis=0, mode="clip"))
        W = _gather_windows(xext, inp - 1, T, slices=(path == "slices"))
        y = _row_contract(W, taps.astype(dt)).astype(dt)
    new_state = FilterState(history=_new_history(xext, params.history_len),
                            phase=u_next, deficit=d0_next)
    return y, count, new_state


def _farrow(params: FIRFarrow, state, x, path):
    T = params.taps_per_phi
    xlen = x.shape[-1]
    n_max = idx.max_outputs(params, xlen)
    count, u_next, d0_next = idx.accum_carry(
        params.nphi, params.delta_fx, state.phase, state.deficit, xlen)
    dt = _out_dtype(params, x)
    if path == "gridsel":
        from .gridsel import farrow_gridsel_apply

        if (params.gridsel_meta is None or n_max > params.gridsel_meta.n_cap
                or dt != jnp.float32):
            raise ValueError(
                "no gridsel plan for this configuration/block size/dtype; "
                "use path='ratgrid' or 'windows'")
        y = farrow_gridsel_apply(
            params.gridsel_meta, params.coeffs, params.nphi,
            params.delta_fx, state.history, x, state.phase, state.deficit,
            n_max, dt)
        new_state = FilterState(
            history=_hist_tail(state.history, x, params.history_len),
            phase=u_next, deficit=d0_next)
        return y, count, new_state
    xext = _extend(state.history, x)
    if path == "ratgrid":
        from .ratgrid import farrow_ratgrid_apply

        if params.ratgrid_meta is None or n_max > params.ratgrid_meta.n_cap:
            # the drift-bounded plan legitimately caps the block output
            # count (ops/ratgrid.py n_cap); degrade to the tile-adaptive
            # gridsel kernel (or winsel) rather than erroring — trace-time
            # static decision, warned once per trace
            import warnings

            alt = ("gridsel" if (params.gridsel_meta is not None
                                 and n_max <= params.gridsel_meta.n_cap
                                 and dt == jnp.float32)
                   else "winsel")
            warnings.warn(
                f"no rational-grid plan for this configuration/block size "
                f"(n_max={n_max}); degrading path='ratgrid' -> '{alt}'",
                stacklevel=2)
            return _farrow(params, state, x, alt)
        y = farrow_ratgrid_apply(
            params.ratgrid_meta, params.k_ratgrid, params.nphi,
            params.delta_fx, xext, state.phase, state.deficit, n_max, dt)
    elif path == "winsel":
        y = _farrow_winsel(params, xext, state.phase, state.deficit, n_max,
                           dt)
    else:
        inp, phi, frac = idx.accum_indices(
            params.nphi, params.delta_fx, state.phase, state.deficit, n_max)
        # Per-output taps = Vandermonde(phase) @ coeffs: the polynomial tap
        # regeneration loop (Filters.jl:789-791) as one (N, P+1) x (P+1, T)
        # matmul.
        phase_val = 1.0 + phi.astype(jnp.float64) + frac   # 1-based
        powers = phase_val[:, None] ** jnp.arange(params.polyorder + 1,
                                                  dtype=jnp.float64)[None, :]
        taps = (powers @ params.coeffs)                    # (N, T) float64
        W = _gather_windows(xext, inp - 1, T, slices=(path == "slices"))
        y = _row_contract(W, taps.astype(dt)).astype(dt)
    new_state = FilterState(history=_new_history(xext, params.history_len),
                            phase=u_next, deficit=d0_next)
    return y, count, new_state


_IMPL = {
    FIRStandard: _standard,
    FIRInterpolator: _interpolator,
    FIRDecimator: _decimator,
    FIRRational: _rational,
    FIRArbitrary: _arbitrary,
    FIRFarrow: _farrow,
}


def _auto_path(params, x):
    # Complex signals with real taps go planar through the fast paths;
    # complex TAPS split into re/im bank halves (see filt_block_raw) so
    # every family keeps its fast path.
    cx_taps = jnp.issubdtype(
        (params.taps_rev if hasattr(params, "taps_rev") else params.pfb).dtype,
        jnp.complexfloating)
    on_tpu = jax.default_backend() == "tpu"
    taps_dt = (params.taps_rev if hasattr(params, "taps_rev")
               else params.pfb).dtype
    if jnp.issubdtype(taps_dt, jnp.integer):
        # int8 quantized mode (ops/quant.py): prefer the zero-copy kernel
        # on TPU (int8 K stack, native s8 x s8 -> s32 MXU pass, S=32
        # tiles); otherwise the XLA supercycle (also the s8 MXU matmul,
        # but with the X3 materialization traffic)
        if (on_tpu and getattr(params, "k_zc_hi", None) is not None
                and params.k_zc_lo is None):
            return "pallas"
        return "supercycle"
    if taps_dt == jnp.bfloat16 and isinstance(
            params, (FIRStandard, FIRInterpolator, FIRDecimator,
                     FIRRational)):
        # quantized mode: bf16 HBM traffic doubles the roofline. On TPU
        # prefer the zero-copy kernel (single bf16 K stack, S=16 tiles, no
        # [history ++ x] concat pass); rational also has the grouped bf16
        # kernel as its in-plan fallback. Otherwise the XLA supercycle
        # (native 1-pass bf16 matmul).
        if on_tpu and params.k_zc_hi is not None and params.k_zc_lo is None:
            return "pallas"
        if (on_tpu and isinstance(params, FIRRational)
                and _rational_groups(params) is not None):
            return "pallas"
        return "supercycle"
    if isinstance(params, (FIRStandard, FIRInterpolator, FIRDecimator)):
        if cx_taps:
            # planar re/im decomposition through the supercycle MXU path
            return "pallas" if on_tpu else "supercycle"
        return "pallas" if on_tpu else "conv"
    if isinstance(params, FIRRational):
        return "pallas" if on_tpu else "supercycle"
    if isinstance(params, (FIRArbitrary, FIRFarrow)):
        n_batch = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        dt = _out_dtype(params, x)
        f32_path = (dt == jnp.float32 or dt == jnp.complex64)
        # gridsel (rational-grid tile-adaptive fused kernel) dominates for
        # few channels (measured v5e single-channel, round 4: arb 12.4 /
        # Farrow 8.8 Gsps vs winsel-v3 0.27 / ratgrid 1.6); wide batches
        # amortize the chansel kernel's shared tap matrix better.
        # Complex64 runs the same f32 paths planar-wise (filt_block_raw).
        if (on_tpu and n_batch < 8 and f32_path
                and params.gridsel_meta is not None
                and idx.max_outputs(params, x.shape[-1])
                <= params.gridsel_meta.n_cap):
            return "gridsel"
    if isinstance(params, FIRFarrow):
        # ratgrid (static banded matmul, no gathers): the few-channel
        # fallback when no gridsel plan exists (round-4 exp50: 1573 vs
        # winsel 274 Msps single-channel; 5x BEHIND gridsel wherever a
        # gridsel plan exists, so it never outranks it).
        if (params.ratgrid_meta is not None
                and n_batch < 8
                and idx.max_outputs(params, x.shape[-1])
                <= params.ratgrid_meta.n_cap
                and (on_tpu or x.shape[-1] >= 4096)):
            return "ratgrid"
    if isinstance(params, (FIRArbitrary, FIRFarrow)):
        # winsel dispatches batched channels to the chansel kernel
        # (pallas/select4) — MXU-bound, ~25-60x the per-channel kernels
        # on v5e — and single channels to the fused select3 kernel.
        return "winsel" if on_tpu else "windows"
    return "windows"


def _split_complex_taps(params):
    """(params_re, params_im): tap-bank real/imag halves of a complex-taps
    arbitrary/Farrow kernel. All index planning (nphi, delta_fx, the
    gridsel/ratgrid metas) is tap-VALUE-independent, so both halves share
    it; only the bank arrays split."""
    import dataclasses

    fields = (("pfb", "dpfb") if isinstance(params, FIRArbitrary)
              else ("pfb", "coeffs", "k_ratgrid"))
    re = {f: getattr(params, f).real for f in fields
          if getattr(params, f) is not None}
    im = {f: getattr(params, f).imag for f in fields
          if getattr(params, f) is not None}
    return (dataclasses.replace(params, **re),
            dataclasses.replace(params, **im))


def filt_block_raw(params, state: FilterState, x, path: str = "auto"):
    """Filter one block. Returns (y_padded, count, new_state).

    ``y_padded`` has a path-dependent STATIC trailing length >=
    max_outputs(params, x.shape[-1]): the windows/supercycle paths return
    exactly max_outputs, while the gridsel paths return tile-padded buffers
    (num_tiles*JT*L2, see ops/gridsel.py) — size downstream buffers from
    y.shape[-1], not from max_outputs. Only the first ``count`` samples are
    meaningful either way. The reference
    returns (buffer, samples_written) with inconsistent conventions
    (SURVEY.md section 2.2 item 8); this API is uniform.

    Complex signals against real taps (the reference's pinned mixed case,
    runtests.jl:393) route through the real fast paths planar-wise: re/im
    stack as one extra batch dim, filter once, recombine. Complex TAPS on
    the arbitrary/Farrow kernels split the banks re/im and run the real
    fast path twice (y = x*hr + i*(x*hi)); index decisions are shared.
    """
    if path == "auto":
        path = _auto_path(params, x)
    # narrow-output mode (make_kernel store_dtype): the zc Pallas kernel
    # stores narrow in-kernel (free); every other path pays one XLA cast
    # pass at the end (the astype is a no-op when dtypes already match)
    sd = getattr(params, "store_dtype", None)
    if sd is not None:
        def _cast(r):
            y, c, s = r
            return y.astype(jnp.dtype(sd)), c, s
    else:
        def _cast(r):
            return r
    if path in ("windows", "slices"):
        return _cast(_IMPL[type(params)](params, state, x, path))
    taps = params.taps_rev if hasattr(params, "taps_rev") else params.pfb
    if (jnp.issubdtype(taps.dtype, jnp.complexfloating)
            and isinstance(params, (FIRArbitrary, FIRFarrow))):
        pr, pi = _split_complex_taps(params)
        yr, count, st2 = filt_block_raw(pr, state, x, path)
        yi, _, _ = filt_block_raw(pi, state, x, path)
        return ((yr + 1j * yi).astype(_out_dtype(params, x)), count, st2)
    if (jnp.issubdtype(x.dtype, jnp.complexfloating)
            and not jnp.issubdtype(taps.dtype, jnp.complexfloating)):
        xr = jnp.stack([x.real, x.imag], axis=0)  # (2, ..., N)
        hist = state.history
        hr = jnp.stack([hist.real, hist.imag], axis=0) \
            if jnp.issubdtype(hist.dtype, jnp.complexfloating) \
            else jnp.stack([hist, jnp.zeros_like(hist)], axis=0)
        st = FilterState(history=hr, phase=state.phase,
                         deficit=state.deficit)
        y2, count, st2 = _IMPL[type(params)](params, st, xr, path)
        y = jax.lax.complex(y2[0], y2[1]).astype(
            jnp.promote_types(taps.dtype, x.dtype))
        nh = jax.lax.complex(st2.history[0], st2.history[1]).astype(
            x.dtype)
        return y, count, FilterState(history=nh, phase=st2.phase,
                                     deficit=st2.deficit)
    return _cast(_IMPL[type(params)](params, state, x, path))


def filt_block_tm_raw(params, state: FilterState, xt, path: str = "auto"):
    """TIME-MAJOR streaming block filter for batched arbitrary/Farrow
    resampling: ``xt`` is (E, C) — time on axis 0 (sublanes), channels on
    the lane axis — and y_padded comes back (n_pad, C) with the same
    static-trailing-length contract as filt_block_raw (time axis FIRST
    here). The carried FilterState keeps the channel-major history layout
    (C, H), so states interoperate with the channel-major entry points
    and the sharded paths.

    Motivation (VERDICT r4 item 2): in the channel-major chansel kernel
    each output tile's x window quantizes to the 128-LANE DMA grid (2.8x
    x re-read at rate ~0.92; placement ~3*T*UW/C per output); time-major
    windows quantize to 32 sublane ROWS. Measured bare-kernel (exp52,
    interleaved): C=64 9.5 -> 11.4 Gsps, C=128 13.3 -> 28.7, C=256
    16.6 -> 47.6. An end-to-end time-major pipeline never transposes:
    feed (E, C), get (n, C) (a transpose pass would eat the win;
    reference semantics Filters.jl:693-742, 780-836).

    f32-only fast path (the chansel-tm kernel); other dtypes/kernels or
    inapplicable geometry transparently run the channel-major path on
    xt.T and transpose back (correct, but pays the transposes).
    """
    if not isinstance(params, (FIRArbitrary, FIRFarrow)):
        raise TypeError(
            "time-major blocks support the arbitrary/Farrow kernels only; "
            "transpose to (C, E) for the uniform-rate kernels")
    if xt.ndim != 2:
        raise ValueError(f"time-major x must be 2-D (E, C); got "
                         f"{xt.shape}")
    E, C = xt.shape
    dt = _out_dtype(params, xt)
    n_max = idx.max_outputs(params, E)
    count, u_next, d0_next = idx.accum_carry(
        params.nphi, params.delta_fx, state.phase, state.deficit, E)
    H = params.history_len
    from .pallas.select4 import tm_geometry

    taps_cplx = jnp.issubdtype(
        (params.pfb if isinstance(params, FIRArbitrary)
         else params.coeffs).dtype, jnp.complexfloating)
    geo_ok = (dt == jnp.float32 and not taps_cplx
              and tm_geometry(params.nphi, params.delta_fx,
                              params.taps_per_phi, n_max, C) is not None)
    if not geo_ok or path not in ("auto", "winsel"):
        y2, cnt, st2 = filt_block_raw(params, state,
                                      jnp.swapaxes(xt, 0, 1), path)
        return jnp.swapaxes(y2, 0, 1), cnt, st2

    from .pallas.select4 import (_TM_GB, chan_resample_farrow_tm,
                                 chan_resample_tm, tm_geometry)

    interp = jax.default_backend() != "tpu"
    geo = tm_geometry(params.nphi, params.delta_fx, params.taps_per_phi,
                      n_max, C)
    # ONE materialization: [history, x, tail zeros] sized exactly to the
    # kernel's padded row count, so the kernel-side jnp.pad is a no-op
    # and the deficit shift folds into the scalar-prefetched window
    # starts (d0 -> _prep_indices_tm) — the first cut paid THREE full
    # HBM passes here (concat + shift cond + pad: measured 5.5 Gsps e2e
    # vs the 11.4 Gsps bare kernel)
    need = geo.xblocks * _TM_GB
    hist_tm = jnp.swapaxes(state.history, 0, 1).astype(jnp.float32)
    # pad-form prep (CLAUDE.md round-4 law 2: jnp.pad of [hist, x]
    # materializes in one efficient pass; an n-piece concat costs ~2.5x)
    xq = jnp.concatenate([hist_tm, xt.astype(jnp.float32)], axis=0)
    xs = jnp.pad(xq, ((0, max(0, need - H - E)), (0, 0)))[:need]

    if isinstance(params, FIRArbitrary):
        y = chan_resample_tm(xs, state.phase, params.pfb, params.dpfb,
                             params.nphi, params.delta_fx, n_max,
                             interpret=interp, d0=state.deficit)
    else:
        y = chan_resample_farrow_tm(xs, state.phase, params.coeffs,
                                    params.nphi, params.delta_fx, n_max,
                                    interpret=interp, d0=state.deficit)
    if E >= H:
        nh = jnp.swapaxes(xt[E - H:], 0, 1)
    else:
        nh = jnp.concatenate(
            [state.history[..., E - H:].astype(xt.dtype),
             jnp.swapaxes(xt, 0, 1)], axis=-1)
    return (y.astype(dt), count,
            FilterState(history=nh, phase=u_next, deficit=d0_next))
