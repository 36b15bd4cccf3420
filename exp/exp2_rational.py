"""TPU experiment 2: rational kernel v2 (grouped-band) vs v1 (dense) vs XLA.

Headline config: 147//160, 3528 taps, 1M float32. Chained-slope timing.
Run ONE process at a time against the TPU.
"""

import sys
import time
from fractions import Fraction
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import multirate_tpu as mr
    import multirate_tpu.ops.compute as comp
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    log("device:", jax.devices()[0].device_kind)
    N = 1_000_000
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=Fraction(147, 160))
    x = jax.random.normal(jax.random.key(0), (N,), dtype=jnp.float32)
    state = mr.init_state(params, (), jnp.float32)

    groups_fn = comp._rational_groups
    log("groups:", groups_fn(params))

    # correctness on TPU first (v2 vs supercycle XLA)
    y2 = np.asarray(comp.filt_block_raw(params, state, x[:200_000],
                                        "pallas")[0])
    yx = np.asarray(comp.filt_block_raw(params, state, x[:200_000],
                                        "supercycle")[0])
    log("v2 vs XLA maxerr:", np.abs(y2 - yx).max(),
        " rms:", float(np.sqrt(np.mean((y2 - yx) ** 2))))

    results = {}
    for name, path in [("pallas-v2", "pallas"), ("pallas-v1", "pallas"),
                       ("supercycle", "supercycle")]:
        comp._rational_groups = (lambda p: None) if name == "pallas-v1" \
            else groups_fn
        sec = chained_seconds_per_call(params, state, x, path,
                                       repeat=50, iters=6)
        results[name] = N / sec / 1e6
        log(f"{name}: {sec*1e3:.3f} ms -> {results[name]:.0f} Msps "
            f"({100*results[name]/106710:.1f}% roofline)")
    comp._rational_groups = groups_fn

    # JT sweep for v2 (direct kernel harness)
    from multirate_tpu.ops.pallas.rational2 import (
        rational_supercycle_grouped, band_groups)

    groups = band_groups(params.taps_per_phi, 147, 160, params.sc_group)
    K = np.asarray(params.k_super, np.float32)
    n_out = 919_687
    Leff, Meff = 147 * params.sc_group, 160 * params.sc_group

    for JT in (416, 824, 1640, 3272):
        @partial(jax.jit, static_argnames=("reps",))
        def many(xx, reps, _jt=JT):
            def body(i, c):
                xx, acc = c
                y = rational_supercycle_grouped(xx, jnp.asarray(K), Leff,
                                                Meff, n_out, groups, JT=_jt)
                last = y[-1]
                return (xx * (1.0 + last * 1e-30), acc + last)
            return jax.lax.fori_loop(0, reps, body,
                                     (xx, jnp.zeros((), xx.dtype)))[1]

        def tmin(reps):
            float(many(x, reps))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(many(x, reps))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, t2 = tmin(50), tmin(450)
        sec = max((t2 - t1) / 400, 1e-9)
        log(f"v2 JT={JT}: {sec*1e3:.3f} ms -> {N/sec/1e6:.0f} Msps")


if __name__ == "__main__":
    main()
