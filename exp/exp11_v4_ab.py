"""Same-session A/B: zc v3 (roll-based body) vs v4 (chunked roll-free body)
on the 147//160 headline, plus an HBM bandwidth probe to normalize for the
shared-pool pace drift (identical programs measure 1.5-2.3x apart across
minutes; only same-session interleaved ratios are trustworthy).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp11_v4_ab.py [rounds]
"""
import sys
import time
from fractions import Fraction
from functools import partial

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def bw_probe_gbps(x, repeat=30, iters=3):
    """Chained-slope effective HBM GB/s of a pure streaming multiply
    (reads+writes 2*4*N bytes per iteration)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @partial(jax.jit, static_argnames="reps")
    def many(xx, reps):
        def body(i, xx):
            return xx * np.float32(0.9999999) + np.float32(1e-30)
        return lax.fori_loop(0, reps, body, xx).ravel()[0]

    def tmin(reps):
        float(many(x, reps))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(many(x, reps))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    r1 = repeat
    r2 = 3 * repeat
    slopes = []
    for _ in range(3):
        t1, t2 = tmin(r1), tmin(r2)
        slopes.append(max((t2 - t1) / (r2 - r1), 1e-9))
    sec = float(np.median(slopes))
    return 2 * 4 * x.size / sec / 1e9


def main():
    import jax
    import jax.numpy as jnp
    import multirate_tpu as mr
    from multirate_tpu.ops.pallas import rational2
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    log("device:", jax.devices()[0].device_kind)
    N = 1_000_000
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    rational2.ZC_FORCE_ALIGN8 = True
    p_v3 = mr.make_kernel(h, ratio=ratio)
    rational2.ZC_FORCE_ALIGN8 = False
    p_v4 = mr.make_kernel(h, ratio=ratio)
    st = mr.init_state(p_v3, (), jnp.float32)
    log("v3 stack:", p_v3.k_zc_hi.shape, " v4 stack:", p_v4.k_zc_hi.shape)

    res = {"v3": [], "v4": [], "bw": []}
    for r in range(rounds):
        rational2.ZC_FORCE_ALIGN8 = True
        sec = chained_seconds_per_call(p_v3, st, x, "pallas",
                                       repeat=30, iters=3)
        res["v3"].append(N / sec / 1e6)
        log(f"round {r} v3: {N/sec/1e6:.0f} Msps")
        rational2.ZC_FORCE_ALIGN8 = False
        sec = chained_seconds_per_call(p_v4, st, x, "pallas",
                                       repeat=30, iters=3)
        res["v4"].append(N / sec / 1e6)
        log(f"round {r} v4: {N/sec/1e6:.0f} Msps")
        gbps = bw_probe_gbps(x)
        res["bw"].append(gbps)
        log(f"round {r} bw probe: {gbps:.0f} GB/s")

    med = {k: float(np.median(v)) for k, v in res.items()}
    roof_phys = 819e9 / (4 * (1 + 147 / 160)) / 1e6
    roof_pace = med["bw"] * 1e9 / (4 * (1 + 147 / 160)) / 1e6
    log(f"MEDIANS: v3={med['v3']:.0f} v4={med['v4']:.0f} Msps, "
        f"bw={med['bw']:.0f} GB/s")
    log(f"v4/v3 = {med['v4']/med['v3']:.2f}x | v4 = "
        f"{100*med['v4']/roof_phys:.1f}% phys roofline, "
        f"{100*med['v4']/roof_pace:.1f}% of pace-normalized roofline")


if __name__ == "__main__":
    main()
