"""Throughput / roofline instrumentation.

Reference counterpart: the examples/Arb-Farrow Speed Comparison.jl harness
(prints elapsed + input/output samples/s) and the README "Speed" section.
This module adds the TPU-side model: achieved samples/s against the HBM
roofline for the streaming FIR workload (SURVEY.md section 5 tracing entry).

Two measurement methods:

- ``measure_chained`` — the ONLY valid method on this TPU (shared with
  bench.py): R dependency-chained filter iterations inside one jitted
  lax.fori_loop, timed at two trip counts; the slope cancels every fixed
  cost (the axon relay's ~25-32 ms jittery sync RTT, dispatch, readback).
- ``measure`` — plain block_until_ready wall clock for a generic callable.
  Valid on CPU/GPU; on TPU it REFUSES by default, because
  jax.block_until_ready does not synchronize through the relay and sub-25 ms
  wall times are pure noise (CLAUDE.md "Benchmarking").
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

__all__ = ["ThroughputReport", "measure", "measure_chained",
           "chained_seconds_per_call", "chained_fn_seconds",
           "hbm_roofline_samples_per_s",
           "KNOWN_HBM_GBPS", "stream_copy_gbps", "stream_expand_gbps"]

# Peak HBM bandwidth per chip, GB/s (public figures).
KNOWN_HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "cpu": 100.0,  # placeholder for host runs
}


def hbm_roofline_samples_per_s(rate: float, itemsize: int = 4,
                               bw_gbps: float = 819.0) -> float:
    """Light-speed input samples/s for a resampler at output/input ``rate``:
    each input sample costs itemsize bytes read + rate*itemsize written
    (taps/banks are VMEM-resident and amortized to zero)."""
    bytes_per_input = itemsize * (1.0 + rate)
    return bw_gbps * 1e9 / bytes_per_input


@dataclasses.dataclass
class ThroughputReport:
    seconds: float
    in_samples: int
    out_samples: int
    in_samples_per_s: float
    out_samples_per_s: float
    roofline_fraction: float | None = None

    def __str__(self):
        s = (f"{self.seconds*1e3:.3f} ms | in {self.in_samples_per_s/1e6:.1f} "
             f"Msps | out {self.out_samples_per_s/1e6:.1f} Msps")
        if self.roofline_fraction is not None:
            s += f" | {100*self.roofline_fraction:.1f}% of HBM roofline"
        return s


def _roofline_fraction(in_sps, rate, itemsize, device):
    import jax

    device = device or jax.devices()[0]
    bw = KNOWN_HBM_GBPS.get(device.device_kind,
                            KNOWN_HBM_GBPS.get(device.platform))
    if not bw or rate is None:
        return None
    return in_sps / hbm_roofline_samples_per_s(rate, itemsize, bw)


def chained_seconds_per_call(params, state, x, path: str = "auto",
                             repeat: int = 50, iters: int = 6,
                             max_extra: int = 20000,
                             target_t1: float | None = None,
                             time_major: bool = False) -> float:
    """Per-call seconds of ``filt_block_raw(params, state, x, path)``.

    Times a serialized dependency chain at two trip counts and returns the
    slope, so fixed dispatch / relay-RTT costs cancel exactly. Iteration
    i+1 depends on iteration i two ways: the carried FilterState (the
    scalar phase/deficit chain feeds the kernels' index math — real
    streaming behavior) and a single in-place element update of x
    (xx.at[0].add, which XLA performs in place on the loop carry — no
    extra HBM pass, unlike a full xx rewrite, which would add an
    8 MB/iter read+write and cap the measurable roofline at ~50%).

    The trip count is a TRACED fori_loop bound, so every rep count shares
    one compilation (the round-3 bench paid 2-3 compiles per path; slow
    remote compiles dominated its wall time). ``target_t1`` enables
    budget-adaptive reps: a cheap probe estimates the per-call cost, then
    r1 is chosen so the base measurement takes ~``target_t1`` seconds
    (capped at ``repeat``), and iters drops to 3 for slow configs — this
    is what keeps 25-30 ms/call fallback paths from eating minutes each
    (BENCH_r03 rc=124).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.compute import filt_block_raw, filt_block_tm_raw

    if time_major:
        filt_block_raw = filt_block_tm_raw  # noqa: F811 — same signature

    # params MUST be a jit argument, not a closure constant: closed-over
    # device arrays hit the axon relay's large-constant pathology
    # (CLAUDE.md), and the zero-copy kernels carry ~100 MB K stacks
    int_in = jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)

    from functools import partial

    @partial(jax.jit, static_argnames="path_")
    def many(p, s, xx, reps, path_):
        def body(i, carry):
            s, xx, acc = carry
            y, _, s = filt_block_raw(p, s, xx, path_)
            # flat last element: cheap for BOTH layouts (a y[..., -1]
            # column slice on a time-major (n, C) output is a strided
            # gather over the whole array — it added ~0.5 ms/iter and
            # polluted the first farrow_64ch_tmajor measurements)
            last = y.ravel()[-1]
            # int8 mode: LSB perturbation (not XLA-foldable; wraparound is
            # harmless for timing); float: 1e-30 epsilon
            upd = ((last & 1).astype(xx.dtype) if int_in
                   else (last * 1e-30).astype(xx.dtype))
            xx = xx.at[(0,) * xx.ndim].add(upd)
            # cast: y's dtype may differ from x's (bf16 mode emits f32)
            return (s, xx, acc + last.astype(acc.dtype))
        acc0 = jnp.zeros((), jnp.int32 if int_in else
                         jnp.promote_types(x.dtype, jnp.float32))
        _, _, acc = lax.fori_loop(0, reps, body, (s, xx, acc0))
        return acc

    def run(reps):
        return complex(many(params, state, x, jnp.int32(reps), path))

    def tmin(reps, it):
        ts = []
        for _ in range(it):
            t0 = time.perf_counter()
            run(reps)
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    r1 = repeat
    run(max(2, repeat // 10))  # compile + warm (one compile for ALL reps)
    if target_t1 is not None:
        rp = max(2, repeat // 10)
        per0 = max(tmin(rp, 2) / rp, 1e-6)  # inflated by RTT/rp: fine
        r1 = int(np.clip(target_t1 / per0, rp, repeat))
        if per0 * r1 > 0.6:
            iters = min(iters, 3)
    t1 = tmin(r1, iters)
    per_est = max(t1 / r1, 1e-6)
    r2 = r1 + max(r1, min(int(0.5 / per_est), max_extra))
    # the relay/device pace drifts across seconds (identical programs
    # measured 1.5-2x apart minutes later); one (t1, t2) pair can straddle
    # a pace change and corrupt the slope, so take the median of three
    # independent slope measurements
    slopes = []
    for _ in range(3):
        t1 = tmin(r1, iters)
        t2 = tmin(r2, iters)
        slopes.append(max((t2 - t1) / (r2 - r1), 1e-9))
    return float(np.median(slopes))


def measure_chained(params, state, x, path: str = "auto",
                    rate: float | None = None, itemsize: int | None = None,
                    repeat: int = 50, iters: int = 6,
                    device=None) -> ThroughputReport:
    """ThroughputReport for one streaming filt_block call on ``x`` using the
    relay-safe chained-slope methodology (identical numbers to bench.py)."""
    from ..ops import indexing as idx

    sec = chained_seconds_per_call(params, state, x, path,
                                   repeat=repeat, iters=iters)
    n_in = int(np.prod(x.shape))
    n_blk = x.shape[-1]
    n_out = int(idx.outputlength(params, n_blk)) * (n_in // n_blk)
    if rate is None:
        rate = n_out / max(n_in, 1)
    itemsize = itemsize or x.dtype.itemsize
    in_sps = n_in / sec
    return ThroughputReport(
        seconds=sec, in_samples=n_in, out_samples=n_out,
        in_samples_per_s=in_sps, out_samples_per_s=n_out / sec,
        roofline_fraction=_roofline_fraction(in_sps, rate, itemsize, device))


def chained_fn_seconds(fn, x, *extra, repeat: int = 40, iters: int = 4,
                       max_extra: int = 20000,
                       target_t1: float = 0.6) -> float:
    """Per-call seconds of a bare ``fn(x, *extra) -> y`` array function
    on the relay-attached TPU: the chained_seconds_per_call methodology
    (traced fori_loop trip count -> one compile; serialized dependency
    via a single in-place element update; slope of two trip counts,
    median of 3) for kernel-level A/Bs that don't go through filt_block.
    Pass every large array operand via ``extra`` (jit ARGUMENTS) — a
    closed-over device array is baked into the compile payload and trips
    the relay's request-size limit (HTTP 413) / large-constant
    pathology."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax import lax

    @partial(jax.jit, static_argnames=())
    def many(xx, reps, *ex):
        def body(i, carry):
            xx, acc = carry
            y = fn(xx, *ex)
            last = y.ravel()[-1]
            xx = xx.at[(0,) * xx.ndim].add((last * 1e-30).astype(xx.dtype))
            return (xx, acc + last.astype(acc.dtype))
        _, acc = lax.fori_loop(0, reps, body,
                               (xx, jnp.zeros((), jnp.float32)))
        return acc

    def run(reps):
        return float(many(x, jnp.int32(reps), *extra))

    def tmin(reps, it):
        ts = []
        for _ in range(it):
            t0 = time.perf_counter()
            run(reps)
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    rp = max(2, repeat // 10)
    run(rp)
    per0 = max(tmin(rp, 2) / rp, 1e-6)
    r1 = int(np.clip(target_t1 / per0, rp, repeat))
    t1 = tmin(r1, iters)
    per_est = max(t1 / r1, 1e-6)
    r2 = r1 + max(r1, min(int(0.5 / per_est), max_extra))
    slopes = []
    for _ in range(3):
        a = tmin(r1, iters)
        b = tmin(r2, iters)
        slopes.append(max((b - a) / (r2 - r1), 1e-9))
    return float(np.median(slopes))


def measure(fn, *args, in_samples: int, out_samples: int,
            iters: int = 20, warmup: int = 3,
            rate: float | None = None, itemsize: int = 4,
            device=None, force_wallclock: bool = False) -> ThroughputReport:
    """Median block_until_ready wall time of ``fn(*args)``.

    INVALID on this TPU relay (block_until_ready does not synchronize and
    the sync RTT is ~25-32 ms of jitter): raises unless
    ``force_wallclock=True``. Use ``measure_chained`` for filter workloads
    on TPU — it agrees with bench.py by construction.
    """
    import jax

    dev = device or jax.devices()[0]
    if dev.platform == "tpu" and not force_wallclock:
        raise RuntimeError(
            "measure() times block_until_ready wall clock, which is "
            "meaningless through the TPU relay (~25-32 ms jittery RTT; "
            "block_until_ready does not synchronize). Use "
            "measure_chained(params, state, x) instead, or pass "
            "force_wallclock=True if you really want wall times.")

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    sec = float(np.median(ts))
    return ThroughputReport(
        seconds=sec, in_samples=in_samples, out_samples=out_samples,
        in_samples_per_s=in_samples / sec, out_samples_per_s=out_samples / sec,
        roofline_fraction=_roofline_fraction(in_samples / sec, rate,
                                             itemsize, dev))


def stream_copy_gbps(n_floats: int = 32_000_000, repeat: int = 8,
                     iters: int = 3, seed: int = 0,
                     dtype=None) -> float:
    """Measured Pallas tile-copy bandwidth (read+write, GB/s) at an
    HBM-RESIDENT working set: the ACHIEVABLE ceiling of this grid/DMA
    stack, as opposed to the paper HBM figure (KNOWN_HBM_GBPS).

    Round-5 revision: with NARROW-LANE (128-wide) output blocks the
    balanced copy sustains ~650 GB/s on the relay-attached v5e (79% of
    the 819 paper figure) — the rounds-3/4 "323 GB/s ceiling" was the
    probe's own wide-lane store layout (any out block > one lane
    quantum halves store rate, exp54). The default working set is
    2 x 128 MB (VMEM-resident probes measure VMEM at 1.3-35 TB/s and
    are invalid — ROADMAP round-3 finding 1; the v5e carries ~128 MB
    of VMEM).
    """
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.dtype(dtype or jnp.float32)
    isz = dt.itemsize
    JT, W = 384, 1024
    R = n_floats // W
    T = R // JT
    xr = np.random.default_rng(seed).standard_normal(T * JT * W)
    x = jnp.asarray((xr * 16).astype(dt) if dt == jnp.int8
                    else xr.astype(dt))

    # NARROW-LANE output blocks (round 5, exp54): any out block wider
    # than ONE 128-lane quantum halves store throughput (balanced copy:
    # 649 GB/s at width 128 vs 328 at 256/512/1024; reads are
    # insensitive). The original (JT, 1024)-out probe measured its own
    # store layout, not the machine — the achievable triad ceiling is
    # the narrow-store figure reported here. Same flat bytes: the
    # in-kernel reshape is a free row-major relabeling.
    def kern(xa, o_ref):
        o_ref[:, :] = xa[...].reshape(8 * JT, W // 8)

    x2d = x.reshape(T * JT, W)

    def one(xv):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T * JT * 8, W // 8), dt),
            grid=(T,),
            in_specs=[pl.BlockSpec((JT, W), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((8 * JT, W // 8), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=jax.default_backend() != "tpu",
        )(xv)

    sec = chained_fn_seconds(one, x2d, repeat=repeat * 3, iters=iters)
    return 2 * isz * (T * JT * W) / sec / 1e9


def stream_expand_gbps(ratio: int = 4, n_floats: int = 8_000_000,
                       repeat: int = 10, iters: int = 3,
                       seed: int = 0, out_dtype=None) -> float:
    """Write-heavy (1:ratio) stream bandwidth (GB/s, read+write counted):
    the pattern-matched ceiling for interpolator-shaped kernels, which
    write ``ratio`` output samples per input.

    Round-4 INTERLEAVED measurement (copy and expand alternating in one
    process, 3 rounds): expand-1:4 319 GB/s vs balanced copy 324 — ratio
    0.98. The write-heavy pattern sustains the SAME bandwidth as the
    balanced copy, so the balanced stream_copy_gbps ceiling is the right
    denominator for interp-shaped rows too. Two cautionary tales from
    getting here: an 8 MB-input first attempt measured a 2.6 TB/s VMEM
    artifact (ROADMAP round-3 finding 1 applies to write probes), and a
    non-interleaved run during a fast relay-pace window measured 724
    GB/s — the pace drifts ~2x between windows, so CROSS-PROCESS probe
    comparisons are invalid; only same-process interleaved A/Bs count.

    ``out_dtype`` (default f32): store the expanded stream narrowed to
    bf16/int8 instead — the probe for quantized-OUTPUT interp modes.
    Bytes are counted at the actual store width; whether Mosaic's
    narrowing-store relayout (docs/kernels.md, exp43) eats the byte
    saving is exactly what the number answers."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    odt = jnp.dtype(out_dtype or jnp.float32)
    osz = odt.itemsize
    W = 128
    R = (n_floats // W // 512) * 512
    x = jnp.asarray(np.random.default_rng(seed)
                    .standard_normal((R, W)).astype(np.float32))

    def kern(xa, o_ref):
        v = xa[...]
        wide = jnp.concatenate([v] * ratio, axis=1)
        if odt == jnp.int8:
            wide = jnp.clip(wide * jnp.float32(32.0), -127, 127)
        o_ref[:, :] = wide.astype(odt)

    def one(xv):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, ratio * W), odt),
            grid=(R // 512,),
            in_specs=[pl.BlockSpec((512, W), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((512, ratio * W), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=jax.default_backend() != "tpu",
        )(xv)

    @partial(jax.jit, static_argnames="reps")
    def call(xx, reps):
        def body(i, carry):
            xx, acc = carry
            y = one(xx)
            last = y[-1, -1].astype(jnp.float32)
            xx = xx.at[0, 0].add(last * 1e-30)
            return (xx, acc + last)
        _, acc = lax.fori_loop(0, reps, body, (xx, jnp.float32(0)))
        return acc

    def tmin(reps):
        float(call(x, reps))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(call(x, reps))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    t1 = tmin(repeat)
    per = max(t1 / repeat, 1e-7)
    r2 = repeat + max(repeat, min(int(0.5 / per), 20000))
    slopes = []
    for _ in range(3):
        a, b = tmin(repeat), tmin(r2)
        slopes.append(max((b - a) / (r2 - repeat), 1e-9))
    sec = float(np.median(slopes))
    return (4 + ratio * osz) * (R * W) / sec / 1e9
