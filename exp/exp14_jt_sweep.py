"""Bench-semantics (chained filt_block_raw) sweep at N=8M: JT tile rows,
v3-vs-v4 geometry, plus an UNFUSABLE bandwidth probe (optimization_barrier
between loop iterations — without it XLA fuses the chained multiplies into
one memory pass and the "GB/s" scales with rep count; exp13's 5 TB/s).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp14_jt_sweep.py [rounds]
"""
import sys
import time
from fractions import Fraction
from functools import partial

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def slope_seconds(call_once, repeat=8, iters=3, target=0.6):
    def tmin(reps):
        float(call_once(reps))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(call_once(reps))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    r1 = repeat
    t1 = tmin(r1)
    per = max(t1 / r1, 1e-7)
    r2 = r1 + max(r1, min(int(target / per), 20000))
    slopes = []
    for _ in range(3):
        a, b = tmin(r1), tmin(r2)
        slopes.append(max((b - a) / (r2 - r1), 1e-9))
    return float(np.median(slopes))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import multirate_tpu as mr
    from multirate_tpu.ops.pallas import rational2
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    log("device:", jax.devices()[0].device_kind)
    N = 8_000_000
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    xbw = jnp.asarray(rng.standard_normal(16_000_000).astype(np.float32))

    p_v4 = mr.make_kernel(h, ratio=ratio)
    rational2.ZC_FORCE_ALIGN8 = True
    p_v3 = mr.make_kernel(h, ratio=ratio)
    rational2.ZC_FORCE_ALIGN8 = False
    st = mr.init_state(p_v4, (), jnp.float32)

    @partial(jax.jit, static_argnames="reps")
    def bwmany(xx, reps):
        def body(i, xx):
            xx = xx * np.float32(0.9999999) + np.float32(1e-30)
            return lax.optimization_barrier(xx)
        return lax.fori_loop(0, reps, body, xx).ravel()[0]

    def run_cfg(pp, jt, align8):
        rational2.ZC_JT_OVERRIDE = jt
        rational2.ZC_FORCE_ALIGN8 = align8
        try:
            sec = chained_seconds_per_call(pp, st, x, "pallas",
                                           repeat=8, iters=3)
        finally:
            rational2.ZC_JT_OVERRIDE = None
            rational2.ZC_FORCE_ALIGN8 = False
        return N / sec / 1e6

    variants = [
        ("v4_jt200", lambda: run_cfg(p_v4, None, False)),
        ("v4_jt400", lambda: run_cfg(p_v4, 400, False)),
        ("v4_jt512", lambda: run_cfg(p_v4, 512, False)),
        ("v3_jt200", lambda: run_cfg(p_v3, None, True)),
        ("bw", lambda: 2 * 4 * xbw.size / slope_seconds(
            lambda r: bwmany(xbw, r)) / 1e9),
    ]
    res = {k: [] for k, _ in variants}
    for r in range(rounds):
        order = variants[r % len(variants):] + variants[:r % len(variants)]
        for name, fn in order:
            v = fn()
            unit = "GB/s" if name == "bw" else "Msps"
            log(f"round {r} {name}: {v:.0f} {unit}")
            res[name].append(v)
    med = {k: float(np.median(v)) for k, v in res.items()}
    log("MEDIANS:", {k: round(v) for k, v in med.items()})
    pace_roof = med["bw"] * 1e9 / (4 * (1 + 147 / 160)) / 1e6
    for k, _ in variants[:-1]:
        log(f"{k}: {med[k]:.0f} Msps = {med[k]/1067:.1f}% phys, "
            f"{100*med[k]/pace_roof:.1f}% of pace roofline "
            f"(bw {med['bw']:.0f} GB/s)")


if __name__ == "__main__":
    main()
