"""TPU experiment 4 (slimmed): rational grouped-kernel variants, 1M headline.

Order: canary; grid-g2-HIGHEST (shape already in the remote compile cache
from bench); grid-g2-3pass; grid-g4-3pass. Logs before every compile.
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("device:", jax.devices()[0].device_kind)
    log("S0 canary...")
    log("S0 ok", float(jax.jit(lambda a: (a + 1).sum())(jnp.ones(8))))

    import multirate_tpu as mr
    from multirate_tpu.ops.pallas.rational import build_k_matrix
    from multirate_tpu.ops.pallas.rational2 import (
        rational_supercycle_grouped, band_groups)

    N = 1_000_000
    L, M, T = 147, 160, 24
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    pfb = np.asarray(mr.taps2pfb(h, L), np.float32)
    x = jax.random.normal(jax.random.key(0), (N,), dtype=jnp.float32)

    ks, gps = {}, {}
    for g in (2, 4):
        k0 = build_k_matrix(pfb, L, M, phi0=1, origin=0, group=g)
        ks[g] = jnp.asarray(np.concatenate(
            [k0, np.zeros((M, k0.shape[1]), np.float32)], axis=0))
        gps[g] = band_groups(T, L, M, g)

    n_out = 919_687
    yref = None

    def run_one(name, g, three_pass, iters=4):
        nonlocal yref
        Leff, Meff = g * L, g * M
        log(f"{name}: compiling (eager first call)...")

        t0 = time.perf_counter()
        y = np.asarray(rational_supercycle_grouped(
            x, ks[g], Leff, Meff, n_out, gps[g], three_pass=three_pass))
        log(f"{name}: compile+run {time.perf_counter()-t0:.1f}s")
        if yref is None:
            yref = y
        else:
            rel = np.abs(y - yref).max() / np.abs(yref).max()
            log(f"{name}: rel err vs ref variant = {rel:.2e}")

        @partial(jax.jit, static_argnames=("reps",))
        def many(xx, reps):
            def body(i, c):
                xx, acc = c
                yy = rational_supercycle_grouped(
                    xx, ks[g], Leff, Meff, n_out, gps[g],
                    three_pass=three_pass)
                last = yy[-1]
                return (xx * (1.0 + last * 1e-30), acc + last)
            return jax.lax.fori_loop(0, reps, body,
                                     (xx, jnp.zeros((), xx.dtype)))[1]

        def tmin(reps):
            float(many(x, reps))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                float(many(x, reps))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        log(f"{name}: timing...")
        t1, t2 = tmin(50), tmin(450)
        sec = max((t2 - t1) / 400, 1e-9)
        log(f"{name}: {sec*1e3:.3f} ms -> {N/sec/1e6:.0f} Msps")

    run_one("grid g2 HIGHEST", 2, False)
    run_one("grid g2 3pass", 2, True)
    run_one("grid g4 3pass", 4, True)


if __name__ == "__main__":
    main()
