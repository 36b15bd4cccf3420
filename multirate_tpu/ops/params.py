"""Kernel parameter pytrees and the streaming FilterState.

The reference holds mutable kernel objects (Filters.jl:15-147) plus a
``FIRFilter`` wrapper with a mutable ``history`` vector (Filters.jl:151-155).
Here every kernel is an immutable pytree of device arrays (filter banks) plus
static integers, and all cross-call streaming state lives in a tiny separate
``FilterState`` pytree that is threaded through jitted block steps:

    y, count, state' = filt_block(params, state, x_block)

Streaming phase state for the arbitrary/Farrow resamplers is carried as an
*exact int64 fixed-point* accumulator (PHASE_FRAC_BITS fractional bits) instead
of the reference's float64 accumulator (Filters.jl:663-673, 780-792): integer
adds are associative, so the closed-form per-block index math is exactly equal
to sequential accumulation: every index/phase decision is chunking-invariant
by construction and chunked output == whole-vector output up to XLA
float-reduction-order noise (~1 ulp), with never a sample slip — stronger
than the reference's float64 accumulator can promise.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import pfb as _pfb

__all__ = [
    "PHASE_FRAC_BITS", "PHASE_ONE",
    "FIRStandard", "FIRInterpolator", "FIRDecimator",
    "FIRRational", "FIRArbitrary", "FIRFarrow",
    "FilterState", "init_state", "make_kernel", "KERNEL_TYPES",
]

# Fixed-point scale for the arbitrary/Farrow phase accumulators. 32 fractional
# bits quantize the inter-phase interpolation factor alpha at 2^-32 ~ 2.3e-10,
# far inside the 1e-4 RMS accuracy budget. Range is NOT limited by int64
# products: indexing.py routes every accumulator product through exact
# base-2^16 long division (indexing._muladd_divmod), so counts/indices are
# exact for any stream length or global offset that itself fits int64. The
# only static requirement is nphi << FRAC and delta_fx < 2^44 (validated at
# kernel construction: nphi <= 2048, nphi/rate < 2^12).
PHASE_FRAC_BITS = 32
PHASE_ONE = 1 << PHASE_FRAC_BITS



def _pick_group(L: int, M: int, h_min: int = 0) -> int:
    """Supercycles per matmul row: widen degenerate ratios (small L) so the
    banded-K contraction has ~128+ output columns for the MXU, while keeping
    the row input span group*M bounded.

    Critically, prefer the smallest group with group*M a multiple of 128:
    the kernels tile the stream as (rows, group*M) and a non-128-multiple
    row width costs a relayout copy on entry plus lane-padding on every
    HBM read. Measured on the v5e 147//160 headline: group 4 (rows of 640
    lanes) runs the grouped kernel at ~97 Gsps vs ~50 Gsps for group 2
    (rows of 320 lanes).

    ``h_min`` (the zero-copy row-span requirement, in samples: history
    plus one 128-column group's band spread plus taps and slack) nudges
    the group up so group*M exceeds it — the zero-copy kernel requires a
    whole group band to fit one stream row
    (pallas/rational2.band_groups_zc)."""
    import math

    base = max(2, -(-128 // L))
    step = 128 // math.gcd(M, 128)  # smallest g with (g*M) % 128 == 0
    g = -(-base // step) * step
    while (g * M <= h_min and (g + step) * M <= 8192
           and (g + step) * L <= 1024):
        g += step
    # cap output columns too: g*L in the thousands explodes the banded-K
    # matrix and the kernels' VMEM blocks (arb's interp-geometry L=32 with
    # the M=1 step of 128 would give 4096 columns -> scoped-vmem OOM)
    if g * M <= 8192 and g * L <= 1024:
        return g
    g = base
    while g > 1 and g * M > 8192:
        g //= 2
    return g


def _zc_fields(bank2d: np.ndarray, L: int, M: int, group: int,
               n_deficit: int):
    """(k_zc_hi, k_zc_lo) compressed phase/deficit-indexed K stacks for
    the zero-copy kernel, or (None, None) when the geometry or budgets
    are inapplicable (see pallas/rational2).

    f32 banks produce a (hi, lo) bf16 pair for the three-pass split; bf16
    banks (the quantized mode) produce a SINGLE bf16 stack (k_zc_lo is
    None) — the bank values are exactly bf16 so one MXU pass is exact
    in the taps, and the stack rows are 16-padded to the bf16 sublane
    quantum. int8 banks (ops/quant.py) likewise produce a single int8
    stack (rows 32-padded) feeding the native s8 x s8 -> s32 MXU pass —
    integer tap values round-trip the f32 build exactly."""
    bf16 = bank2d.dtype == jnp.bfloat16
    int8 = bank2d.dtype == np.int8
    if bank2d.dtype != np.float32 and not (bf16 or int8):
        return None, None
    from .pallas.rational2 import build_k_zc_stack, zc_groups

    T = bank2d.shape[0]
    h_min = T - 1
    groups = zc_groups(T, L, M, group, h_min, shift_slack=n_deficit)
    if groups is None:
        return None, None
    umax = max(span for (*_, span) in groups)
    slab_b = umax * len(groups) * 128 * 4
    if slab_b > 4 << 20 or L * n_deficit * slab_b > 512 << 20:
        return None, None
    from . import precision as _prec

    stack = build_k_zc_stack(bank2d.astype(np.float32), L, M, group,
                             h_min, n_deficit, groups)
    if bf16 or int8:
        q = 32 if int8 else 16  # sublane quantum of the stack dtype
        if stack.shape[1] % q:
            pad = q - stack.shape[1] % q
            stack = np.pad(stack, ((0, 0), (0, pad), (0, 0)))
        dt = jnp.int8 if int8 else jnp.bfloat16
        # cast on host: uploading f32 then casting on device would
        # transiently double the (possibly ~100 MB) stack's footprint
        return jnp.asarray(stack.astype(dt)), None
    return _prec.split_bf16(jnp.asarray(stack))


def _zc_rows(params) -> int:
    """Zero-copy history rows a kernel's stacks can ever need: f32 stacks
    (hi/lo pair) run only at S=8; single-stack quantized modes carry their
    dtype's sublane quantum (bf16 16, int8 32). Carrying more would cost
    4x sharded halo traffic / checkpoint size for the dominant f32 mode."""
    from .pallas.rational2 import ZC_S, zc_s

    if params.k_zc_lo is not None:
        return ZC_S
    return zc_s(params.k_zc_hi.dtype)


def _k_super(pfb2d: np.ndarray, L: int, M: int, group: int) -> "jnp.ndarray":
    """Fresh-stream banded tap matrix, padded by M rows of deficit headroom
    (see compute._select_k / pallas.rational.build_k_matrix)."""
    from .pallas.rational import build_k_matrix

    k0 = build_k_matrix(pfb2d, L, M, phi0=1, origin=0, group=group)
    pad = np.zeros((M, k0.shape[1]), dtype=k0.dtype)
    return jnp.asarray(np.concatenate([k0, pad], axis=0))


def _register(cls):
    fields = dataclasses.fields(cls)
    data = [f.name for f in fields if f.metadata.get("pytree_node", False)]
    meta = [f.name for f in fields if not f.metadata.get("pytree_node", False)]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)
    return cls


def _array(**kw):
    return dataclasses.field(metadata={"pytree_node": True}, **kw)


@_register
@dataclasses.dataclass(frozen=True)
class FIRStandard:
    """Single-rate FIR kernel (reference: Filters.jl:15-24).

    ``taps_rev`` are the time-flipped taps (h reversed), so the dot with a
    forward window of ``hlen`` samples ending at the current input sample is
    the causal convolution (the reference's flipud, Filters.jl:21).
    """

    taps_rev: Any = _array()
    k_super: Any = _array(default=None)  # banded matmul form (see _k_super)
    k_zc_hi: Any = _array(default=None)  # zero-copy K stacks (see _zc_fields)
    k_zc_lo: Any = _array(default=None)
    hlen: int = 0
    sc_group: int = 1
    store_dtype: Any = None  # narrow OUTPUT store (e.g. bf16), see make_kernel

    @classmethod
    def create(cls, h) -> "FIRStandard":
        h = np.asarray(h)
        T = h.shape[0]
        g = _pick_group(1, 1, h_min=max(T - 1, 128 + T + 1 + 24 + 127))
        bank = h[::-1].reshape(-1, 1)
        kh, kl = _zc_fields(np.asarray(bank, copy=True), 1, 1, g, 1)
        return cls(taps_rev=jnp.asarray(h[::-1].copy()),
                   k_super=_k_super(bank, 1, 1, g),
                   k_zc_hi=kh, k_zc_lo=kl,
                   hlen=h.shape[0], sc_group=g)

    @property
    def taps_per_phi(self) -> int:
        return self.hlen

    @property
    def h_min(self) -> int:
        return self.hlen - 1

    @property
    def history_len(self) -> int:
        if self.k_zc_hi is not None:
            return _zc_rows(self) * self.sc_group
        return self.hlen - 1


@_register
@dataclasses.dataclass(frozen=True)
class FIRInterpolator:
    """Integer interpolator (L//1) kernel (reference: Filters.jl:28-41)."""

    pfb: Any = _array()  # (taps_per_phi, L), rows time-flipped
    k_super: Any = _array(default=None)
    k_zc_hi: Any = _array(default=None)
    k_zc_lo: Any = _array(default=None)
    interpolation: int = 1
    taps_per_phi: int = 0
    sc_group: int = 1
    store_dtype: Any = None  # narrow OUTPUT store (e.g. bf16), see make_kernel

    @classmethod
    def create(cls, h, interpolation: int) -> "FIRInterpolator":
        bank = _pfb.taps2pfb(h, interpolation)
        T = bank.shape[0]
        g = _pick_group(interpolation, 1,
                        h_min=max(T - 1,
                                  -(-128 // interpolation) + T + 25 + 127))
        kh, kl = _zc_fields(np.asarray(bank), interpolation, 1, g, 1)
        return cls(pfb=jnp.asarray(bank),
                   k_super=_k_super(bank, interpolation, 1, g),
                   k_zc_hi=kh, k_zc_lo=kl,
                   interpolation=interpolation,
                   taps_per_phi=bank.shape[0], sc_group=g)

    @property
    def nphi(self) -> int:
        return self.interpolation

    @property
    def h_min(self) -> int:
        return self.taps_per_phi - 1

    @property
    def history_len(self) -> int:
        if self.k_zc_hi is not None:
            return _zc_rows(self) * self.sc_group
        return self.taps_per_phi - 1


@_register
@dataclasses.dataclass(frozen=True)
class FIRDecimator:
    """Integer decimator (1//M) kernel (reference: Filters.jl:45-58)."""

    taps_rev: Any = _array()
    k_super: Any = _array(default=None)
    k_zc_hi: Any = _array(default=None)
    k_zc_lo: Any = _array(default=None)
    hlen: int = 0
    decimation: int = 1
    sc_group: int = 1
    store_dtype: Any = None  # narrow OUTPUT store (e.g. bf16), see make_kernel

    @classmethod
    def create(cls, h, decimation: int) -> "FIRDecimator":
        h = np.asarray(h)
        T = h.shape[0]
        g = _pick_group(1, decimation,
                        h_min=max(T - 1, 128 * decimation + T
                                  + decimation + 25 + 127))
        bank = h[::-1].reshape(-1, 1)
        # decimator deficit d0-1 ranges over [0, M): one slab each
        kh, kl = _zc_fields(np.asarray(bank, copy=True), 1, decimation, g,
                            decimation + 1)
        return cls(taps_rev=jnp.asarray(h[::-1].copy()),
                   k_super=_k_super(bank, 1, decimation, g),
                   k_zc_hi=kh, k_zc_lo=kl,
                   hlen=h.shape[0], decimation=decimation, sc_group=g)

    @property
    def taps_per_phi(self) -> int:
        return self.hlen

    @property
    def h_min(self) -> int:
        return self.hlen - 1

    @property
    def history_len(self) -> int:
        if self.k_zc_hi is not None:
            return _zc_rows(self) * self.sc_group * self.decimation
        return self.hlen - 1


@_register
@dataclasses.dataclass(frozen=True)
class FIRRational:
    """Rational (L//M) polyphase resampler kernel (reference: Filters.jl:62-80).

    The reference steps phase/input indices with a sequential recurrence
    (Filters.jl:558-568); here both are closed-form affine functions of the
    output ordinal (SURVEY.md section 3.1), so a whole block of outputs is one
    batched contraction.
    """

    pfb: Any = _array()  # (taps_per_phi, L)
    k_super: Any = _array(default=None)  # fresh-stream band matrix (_k_super)
    # zero-copy kernel K stacks: (D, U, g*L) bf16 hi/lo pairs, slab d
    # pre-rolled for deficit shift d (pallas/rational2.build_k_zc_stack);
    # None when the zc geometry is inapplicable (f64/complex taps, tiny
    # or huge g*M) — those fall back to the grouped/XLA paths.
    k_zc_hi: Any = _array(default=None)
    k_zc_lo: Any = _array(default=None)
    interpolation: int = 1  # L
    decimation: int = 1     # M
    taps_per_phi: int = 0
    sc_group: int = 1
    store_dtype: Any = None  # narrow OUTPUT store (e.g. bf16), see make_kernel

    @classmethod
    def create(cls, h, interpolation: int, decimation: int) -> "FIRRational":
        bank = _pfb.taps2pfb(h, interpolation)
        T = bank.shape[0]
        g = _pick_group(
            interpolation, decimation,
            h_min=max(T - 1, -(-128 * decimation // interpolation) + T
                      + -(-decimation // interpolation) + 25 + 127))
        slack = -(-decimation // interpolation) + 1  # = _max_deficit
        kh, kl = _zc_fields(np.asarray(bank), interpolation, decimation, g,
                            slack)
        return cls(pfb=jnp.asarray(bank),
                   k_super=_k_super(bank, interpolation, decimation, g),
                   k_zc_hi=kh, k_zc_lo=kl,
                   interpolation=interpolation,
                   decimation=decimation, taps_per_phi=bank.shape[0],
                   sc_group=g)

    @property
    def nphi(self) -> int:
        return self.interpolation

    @property
    def h_min(self) -> int:
        """Minimal history the filter math needs (the reference's
        shiftin! depth, Filters.jl:151-155)."""
        return self.taps_per_phi - 1

    @property
    def history_len(self) -> int:
        """Carried history: the zero-copy kernel keeps the last ZC_S rows
        (ZC_S * g*M samples) of the stream so a new block is read in place
        with no [history ++ x] concat (pallas/rational2). Non-zc paths
        slice the trailing h_min samples."""
        if self.k_zc_hi is not None:
            return _zc_rows(self) * self.sc_group * self.decimation
        return self.taps_per_phi - 1


def _delta_fx(nphi: int, rate: float) -> int:
    """Phase step nphi/rate in exact int64 fixed point (Filters.jl:113)."""
    from .indexing import ACCUM_OPERAND_BITS

    delta = nphi / rate
    dfx = round(delta * PHASE_ONE)
    if dfx <= 0:
        raise ValueError(f"rate {rate} too large for nphi {nphi}")
    if (nphi << PHASE_FRAC_BITS) >= (1 << ACCUM_OPERAND_BITS) or \
            dfx >= (1 << ACCUM_OPERAND_BITS):
        raise ValueError(
            f"nphi={nphi}, rate={rate} out of the exact-arithmetic range "
            f"(need nphi <= 2048 and nphi/rate < 4096)")
    return dfx


@_register
@dataclasses.dataclass(frozen=True)
class FIRArbitrary:
    """Arbitrary real-rate resampler with a derivative filter bank.

    Two banks: ``pfb`` from h and ``dpfb`` from dh = [diff(h); 0], so an
    output between phases p and p+1 is y = dot(pfb[:,p], w) +
    alpha * dot(dpfb[:,p], w) — first-order interpolation that never needs
    the (possibly nonexistent) next input sample (reference design note
    Filters.jl:84-90 and 105-117, after Harris sec. 7.6.1).
    """

    pfb: Any = _array()   # (taps_per_phi, nphi)
    dpfb: Any = _array()  # (taps_per_phi, nphi)
    nphi: int = 32
    taps_per_phi: int = 0
    rate: float = 1.0
    delta_fx: int = 0  # nphi/rate in PHASE_FRAC_BITS fixed point
    sc_group: int = 1
    gridsel_meta: tuple | None = None

    @classmethod
    def create(cls, h, rate: float, nphi: int = 32) -> "FIRArbitrary":
        if not rate > 0:
            raise ValueError("rate must be greater than 0")
        h = np.asarray(h)
        dh = np.concatenate([np.diff(h), np.zeros(1, dtype=h.dtype)])
        bank = _pfb.taps2pfb(h, nphi)
        dbank = _pfb.taps2pfb(dh, nphi)
        g = _pick_group(nphi, 1)
        dfx = _delta_fx(nphi, float(rate))
        from .gridsel import build_gridsel_plan
        gs_meta = build_gridsel_plan(nphi, dfx, bank.shape[0])
        return cls(pfb=jnp.asarray(bank), dpfb=jnp.asarray(dbank),
                   nphi=nphi, taps_per_phi=bank.shape[0], rate=float(rate),
                   delta_fx=dfx, sc_group=g, gridsel_meta=gs_meta)

    @property
    def history_len(self) -> int:
        return self.taps_per_phi - 1


@_register
@dataclasses.dataclass(frozen=True)
class FIRFarrow:
    """Farrow polynomial-interpolation resampler (reference: Filters.jl:123-147).

    Each PFB tap row is fitted with a degree-``polyorder`` polynomial across
    phases (pfb2pnfb, Filters.jl:311-321); per-output taps are then a
    (num_outputs, polyorder+1) Vandermonde matrix times the (polyorder+1,
    taps_per_phi) coefficient matrix — pure MXU work, which makes Farrow the
    most TPU-friendly of the arbitrary-rate kernels.
    """

    pfb: Any = _array()     # (taps_per_phi, nphi)
    coeffs: Any = _array()  # (polyorder+1, taps_per_phi), float64 fit
    k_ratgrid: Any = _array(default=None)  # rational-grid banded K
    nphi: int = 32
    taps_per_phi: int = 0
    rate: float = 1.0
    delta_fx: int = 0
    polyorder: int = 4
    sc_group: int = 1
    ratgrid_meta: tuple | None = None
    gridsel_meta: tuple | None = None

    @classmethod
    def create(cls, h, rate: float, nphi: int, polyorder: int) -> "FIRFarrow":
        if not rate > 0:
            raise ValueError("rate must be greater than 0")
        bank = _pfb.taps2pfb(h, nphi)
        C = _pfb.pfb2pnfb(bank, polyorder)
        # Per-power FIR bank: stream F[i*(P+1) + p] = dot(C[p, :], window_i)
        # lets the Farrow output be y_n = sum_p phase^p * F[...], turning the
        # irregular window gather into regular FIRs + a flat gather.
        P1 = polyorder + 1
        g = _pick_group(P1, 1)
        cbank = np.ascontiguousarray(C.T)  # (T, P+1) "phases" = powers
        dfx = _delta_fx(nphi, float(rate))
        from .ratgrid import build_ratgrid_plan
        rg_meta, rg_k = build_ratgrid_plan(C, nphi, dfx)
        from .gridsel import build_gridsel_plan
        gs_meta = build_gridsel_plan(nphi, dfx, bank.shape[0], farrow=True,
                                     polyorder=polyorder)
        return cls(pfb=jnp.asarray(bank), coeffs=jnp.asarray(C),
                   k_ratgrid=None if rg_k is None else jnp.asarray(rg_k),
                   nphi=nphi, taps_per_phi=bank.shape[0], rate=float(rate),
                   delta_fx=dfx, polyorder=polyorder,
                   sc_group=g, ratgrid_meta=rg_meta, gridsel_meta=gs_meta)

    @property
    def history_len(self) -> int:
        return self.taps_per_phi - 1


KERNEL_TYPES = (FIRStandard, FIRInterpolator, FIRDecimator, FIRRational,
                FIRArbitrary, FIRFarrow)


@_register
@dataclasses.dataclass(frozen=True)
class FilterState:
    """All cross-call streaming state, as a tiny pytree.

    - ``history``: the last ``history_len`` input samples (zeros initially) —
      the reference's FIRFilter.history / shiftin! mechanism
      (Filters.jl:151-155, support.jl:61-80). Shape (..., history_len) where
      leading dims are channel/batch dims.
    - ``phase``: int64 scalar. For FIRRational the 1-based phase index of the
      next output (Filters.jl:68); for FIRArbitrary/FIRFarrow the fixed-point
      accumulator u = (acc - 1) * 2^PHASE_FRAC_BITS in [0, nphi << FRAC)
      (Filters.jl:97, 131); unused (0) otherwise.
    - ``deficit``: int64 scalar, 1-based index into the *next* input block of
      the first sample that will produce an output — the reference's
      ``inputDeficit`` (Filters.jl:543-547, 602-606, 705-715).
    """

    history: Any = _array()
    phase: Any = _array()
    deficit: Any = _array()


def init_state(params, batch_shape=(), dtype=jnp.float32) -> FilterState:
    """Initial state: zero history, phase 1 (u=0), deficit 1.

    ``dtype`` should be the signal dtype (the reference's history is
    eltype(x), Filters.jl:452).
    """
    hist = jnp.zeros((*batch_shape, params.history_len), dtype=dtype)
    phase0 = 1 if isinstance(params, FIRRational) else 0
    return FilterState(
        history=hist,
        phase=jnp.asarray(phase0, dtype=jnp.int64),
        deficit=jnp.asarray(1, dtype=jnp.int64),
    )


def make_kernel(h, ratio=None, rate=None, nphi: int = 32, polyorder=None,
                store_dtype=None):
    """Build the right kernel for a resampling spec.

    Dispatch mirrors the reference's FIRFilter constructors
    (Filters.jl:158-198): a rational ``ratio`` selects
    standard/decimator/interpolator/rational by shape; a real ``rate``
    selects FIRArbitrary (or FIRFarrow when ``polyorder`` is given).

    ``store_dtype`` (rational family only): emit outputs in a NARROWER
    float dtype (e.g. jnp.bfloat16) while computing at full precision —
    the zero-copy Pallas kernel stores narrow directly, cutting output
    HBM traffic (the write-dominated interpolator's byte budget is
    4 + L*itemsize per input; measured stream ceilings in exp53). The
    outputs carry the store dtype's quantization (~4e-3 relative for
    bf16) — a quantized MODE, exempt from the f32 accuracy budget.
    """
    from fractions import Fraction

    if (ratio is None) == (rate is None):
        raise ValueError("specify exactly one of ratio= or rate=")
    if ratio is not None:
        if isinstance(ratio, tuple):
            ratio = Fraction(*ratio)
        else:
            ratio = Fraction(ratio)
        L, M = ratio.numerator, ratio.denominator
        if L == M == 1:
            p = FIRStandard.create(h)
        elif L == 1:
            p = FIRDecimator.create(h, M)
        elif M == 1:
            p = FIRInterpolator.create(h, L)
        else:
            p = FIRRational.create(h, L, M)
        if store_dtype is not None:
            import numpy as _np

            p = dataclasses.replace(p, store_dtype=_np.dtype(store_dtype))
        return p
    if store_dtype is not None:
        raise ValueError("store_dtype applies to the rational family only")
    if polyorder is None:
        return FIRArbitrary.create(h, rate, nphi)
    return FIRFarrow.create(h, rate, nphi, polyorder)
