"""Calibrate the ACHIEVABLE stream bandwidth floor vs the headline.

Three workloads, identical chained-slope methodology (metrics.py), one
process, interleaved — so relay pace drift hits all equally:

  copy      — pallas y[tile] = x[tile] over (JT, 1024) tiles, 8M f32:
              pure read+write stream (64 MB/iter). The machine's real
              triad ceiling through this grid/DMA stack.
  shaped    — read (JT, gM), write (JT, gL) with one add: exactly the
              headline's traffic shape (32 MB read, 29.4 MB write).
  headline  — production filt_block_raw 147//160 pallas path.

If copy lands far below 819 GB/s the published roofline is not the
right denominator for this stack; the ratio headline/shaped is the
kernel's true efficiency against its achievable ceiling.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp27_bw_floor.py
"""
import time
from fractions import Fraction
from functools import partial

import numpy as np

MODES = ("copy", "shaped", "headline")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import multirate_tpu as mr
    from multirate_tpu.ops import compute as cc
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    log("device:", jax.devices()[0].device_kind)
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    p = mr.make_kernel(h, ratio=ratio)
    rng = np.random.default_rng(0)
    N = 8_000_000
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    st = mr.init_state(p, (), jnp.float32)
    # copy/shaped probes use a 32M stream (128 MB): an 8M probe's x AND y
    # go VMEM-resident across the chained loop and measure VMEM BW (~3+
    # TB/s observed — memory note "VMEM-resident bw probes invalid");
    # the production headline's ~100 MB K stacks already force HBM.
    NB = 32_000_000
    xb = jnp.asarray(rng.standard_normal(NB).astype(np.float32))

    pfb2d, L, M, g = cc._band_geometry(p)
    gL, gM = g * L, g * M       # 588, 640

    def make_copy():
        JT, W = 384, 1024
        R = NB // W
        T = R // JT

        def kern(xa, o_ref):
            o_ref[:, :] = xa[:, :]

        def one(xv):
            x2d = xv[: T * JT * W].reshape(T * JT, W)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((T * JT, W), jnp.float32),
                grid=(T,),
                in_specs=[pl.BlockSpec((JT, W), lambda j: (j, j * 0))],
                out_specs=pl.BlockSpec((JT, W), lambda j: (j, j * 0)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(x2d)

        @partial(jax.jit, static_argnames="reps")
        def call(xx, reps):
            def body(i, carry):
                xx, acc = carry
                y = one(xx)
                last = y[-1, -1]
                xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (xx, acc + last)
            _, acc = lax.fori_loop(0, reps, body, (xx, jnp.float32(0)))
            return acc
        return lambda reps: call(xb, reps)

    def make_shaped():
        JT = 384
        R = NB // gM
        T = (R - 8) // JT

        def kern(xa, o_ref):
            # touch the input (forces its DMA), write the (JT, gL) shape
            o_ref[:, :] = (jnp.zeros((JT, gL), jnp.float32)
                           + xa[:, 0:1] + jnp.float32(1.0))

        def one(xv):
            x2d = xv[: R * gM].reshape(R, gM)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((T * JT, gL), jnp.float32),
                grid=(T,),
                in_specs=[pl.BlockSpec((JT, gM), lambda j: (j, j * 0))],
                out_specs=pl.BlockSpec((JT, gL), lambda j: (j, j * 0)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(x2d)

        @partial(jax.jit, static_argnames="reps")
        def call(xx, reps):
            def body(i, carry):
                xx, acc = carry
                y = one(xx)
                last = y[-1, -1]
                xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (xx, acc + last)
            _, acc = lax.fori_loop(0, reps, body, (xx, jnp.float32(0)))
            return acc
        return lambda reps: call(xb, reps)

    def slope_raw(call_once, repeat=8, iters=3):
        def tmin(reps):
            float(call_once(reps))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                float(call_once(reps))
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))
        t1 = tmin(repeat)
        per = max(t1 / repeat, 1e-7)
        r2 = repeat + max(repeat, min(int(0.5 / per), 20000))
        sl = []
        for _ in range(3):
            a, b = tmin(repeat), tmin(r2)
            sl.append(max((b - a) / (r2 - repeat), 1e-9))
        return float(np.median(sl))

    copy_fn, shaped_fn = make_copy(), make_shaped()

    def run(mode):
        if mode == "copy":
            sec = slope_raw(copy_fn)
            return NB / sec / 1e6, 2 * 4 * NB / sec / 1e9
        elif mode == "shaped":
            sec = slope_raw(shaped_fn)
            return NB / sec / 1e6, (4 * NB + 4 * NB * 147 / 160) / sec / 1e9
        else:
            sec = chained_seconds_per_call(p, st, x, "pallas",
                                           repeat=8, iters=3)
            gbs = (4 * N + 4 * N * 147 / 160) / sec / 1e9
        return N / sec / 1e6, gbs

    res = {m: [] for m in MODES}
    for r in range(3):
        order = MODES[r % len(MODES):] + MODES[:r % len(MODES)]
        for mode in order:
            msps, gbs = run(mode)
            res[mode].append((msps, gbs))
            log(f"round {r} {mode}: {msps:.0f} Msps, {gbs:.0f} GB/s")
    for m, v in res.items():
        log(f"MEDIAN {m}: {np.median([a for a, _ in v]):.0f} Msps, "
            f"{np.median([b for _, b in v]):.0f} GB/s")


if __name__ == "__main__":
    main()
