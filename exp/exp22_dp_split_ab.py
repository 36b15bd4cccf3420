"""A/B the zc headline levers at 8M: DP group boundaries (11 vs 13 chunk
passes) x in-kernel split (hardware-RTNE split_bf16_kernel vs trunc).

DP changes the K-stack layout, so each DP setting builds its own params.
Order-rotated rounds; accuracy spot-checked per variant vs scipy.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp22_dp_split_ab.py
"""
import time
from fractions import Fraction
from functools import partial

import numpy as np

VARIANTS = (("dp+fast", True, True), ("dp+trunc", True, False),
            ("fix+fast", False, True), ("fix+trunc", False, False))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import multirate_tpu as mr
    from multirate_tpu.ops.pallas import rational2 as r2
    from multirate_tpu.ops.compute import filt_block_raw
    from scipy.signal import upfirdn

    log("device:", jax.devices()[0].device_kind)
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    rng = np.random.default_rng(0)
    N = 8_000_000
    x_np = rng.standard_normal(N).astype(np.float32)
    x = jnp.asarray(x_np)

    params = {}
    for dp in (True, False):
        r2.ZC_DP_GROUPS = dp
        params[dp] = mr.make_kernel(h, ratio=ratio)
    r2.ZC_DP_GROUPS = True

    ref = upfirdn(np.asarray(h, np.float64), x_np[:200_000].astype(np.float64),
                  up=147, down=160)

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

    def make(name, dp, fast):
        p = params[dp]
        st = mr.init_state(p, (), jnp.float32)

        @partial(jax.jit, static_argnames=("reps", "dp", "fast"))
        def call(pp, s0, xx, reps, dp, fast):
            r2.ZC_DP_GROUPS, r2.ZC_FAST_SPLIT = dp, fast

            def body(i, carry):
                s, xx, acc = carry
                y, _, s = filt_block_raw(pp, s, xx, "pallas")
                last = y[-1]
                xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (s, xx, acc + last)
            _, _, acc = lax.fori_loop(0, reps, body, (s0, xx, jnp.float32(0)))
            return acc

        def run(reps):
            r2.ZC_DP_GROUPS, r2.ZC_FAST_SPLIT = dp, fast
            try:
                return call(p, st, x, reps, dp, fast)
            finally:
                r2.ZC_DP_GROUPS, r2.ZC_FAST_SPLIT = True, True
        return run

    # accuracy spot check per variant
    for name, dp, fast in VARIANTS:
        p = params[dp]
        st = mr.init_state(p, (), jnp.float32)
        r2.ZC_DP_GROUPS, r2.ZC_FAST_SPLIT = dp, fast
        y, cnt, _ = jax.jit(filt_block_raw, static_argnums=3)(
            p, st, jnp.asarray(x_np[:200_000]), "pallas")
        y = np.asarray(y, np.float64)[: int(cnt)]
        n = min(len(ref), len(y))
        rms = float(np.sqrt(np.mean((y[:n] - ref[:n]) ** 2))
                    / np.sqrt(np.mean(ref[:n] ** 2)))
        log(f"{name}: oracle rel rms {rms:.2e}")
        assert rms < 1e-4, (name, rms)
    r2.ZC_DP_GROUPS, r2.ZC_FAST_SPLIT = True, True

    res = {v[0]: [] for v in VARIANTS}
    for r in range(3):
        order = VARIANTS[r % len(VARIANTS):] + VARIANTS[:r % len(VARIANTS)]
        for (name, dp, fast) in order:
            sec = slope(make(name, dp, fast))
            msps = N / sec / 1e6
            res[name].append(msps)
            log(f"round {r} {name}: {msps:.0f} Msps")
    log("MEDIANS:", {k: round(float(np.median(v))) for k, v in res.items()})


if __name__ == "__main__":
    main()
