"""JT sweep for the zc headline kernel at 8M (HBM-resident; exp14's 1M
sweep was pace-noise-bound). Times bench-semantics filt_block_raw per JT
via ZC_JT_OVERRIDE, order-rotated across rounds.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp21_jt8m.py
"""
import time
from fractions import Fraction
from functools import partial

import numpy as np

JTS = (200, 256, 320, 400, 512)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import multirate_tpu as mr
    from multirate_tpu.ops.pallas import rational2 as r2
    from multirate_tpu.ops.compute import filt_block_raw

    log("device:", jax.devices()[0].device_kind)
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    p = mr.make_kernel(h, ratio=ratio)
    rng = np.random.default_rng(0)
    N = 8_000_000
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    st = mr.init_state(p, (), jnp.float32)

    def slope(call_once, repeat=8, iters=3):
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
        r2_ = repeat + max(repeat, min(int(0.5 / per), 20000))
        sl = []
        for _ in range(3):
            a, b = tmin(repeat), tmin(r2_)
            sl.append(max((b - a) / (r2_ - repeat), 1e-9))
        return float(np.median(sl))

    def make(jt):
        @partial(jax.jit, static_argnames=("reps", "jt"))
        def call(pp, s0, xx, reps, jt):
            r2.ZC_JT_OVERRIDE = jt   # trace-time constant via static arg

            def body(i, carry):
                s, xx, acc = carry
                y, _, s = filt_block_raw(pp, s, xx, "pallas")
                last = y[-1]
                xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (s, xx, acc + last)
            _, _, acc = lax.fori_loop(0, reps, body, (s0, xx, jnp.float32(0)))
            return acc

        def run(reps):
            r2.ZC_JT_OVERRIDE = jt
            try:
                return call(p, st, x, reps, jt)
            finally:
                r2.ZC_JT_OVERRIDE = None
        return run

    res = {j: [] for j in JTS}
    for r in range(3):
        order = JTS[r % len(JTS):] + JTS[:r % len(JTS)]
        for jt in order:
            sec = slope(make(jt))
            msps = N / sec / 1e6
            res[jt].append(msps)
            log(f"round {r} JT={jt}: {msps:.0f} Msps")
    log("MEDIANS:", {j: round(float(np.median(v))) for j, v in res.items()})


if __name__ == "__main__":
    main()
