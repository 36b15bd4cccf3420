"""A/B the zc main-kernel tile height JT at 8M (147//160 headline).

Hypothesis: each of the 33 (JT,128)@(128,wc) passes pays a fixed MXU
weight-load cost (~K rows into the systolic array) that JT=200 leaves
unamortized; larger JT should raise throughput until VMEM blocks out.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp25_jt_ab.py
"""
import time
from fractions import Fraction
from functools import partial

import numpy as np

JTS = (104, 200, 304, 400, 504, 600)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import multirate_tpu as mr
    from multirate_tpu.ops.pallas import rational2 as r2
    from multirate_tpu.ops import compute as cc

    log("device:", jax.devices()[0].device_kind)
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    p = mr.make_kernel(h, ratio=ratio)
    rng = np.random.default_rng(0)
    N = 8_000_000
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    pfb2d, L, M, g = cc._band_geometry(p)
    gL, gM = g * L, g * M
    groups = r2.zc_groups(pfb2d.shape[0], L, M, g, p.h_min,
                          shift_slack=cc._zc_slack(p))
    kh, kl = p.k_zc_hi, p.k_zc_lo
    dsel0 = jnp.zeros((), jnp.int32)
    hist = jnp.zeros((p.history_len,), jnp.float32)
    R = N // gM

    def make(jt):
        t_ok = (R - 8) // jt
        geo = (jt, t_ok, t_ok, R)
        nm = t_ok * jt * gL

        @partial(jax.jit, static_argnames="reps")
        def call(xx, khv, klv, reps):
            def body(i, carry):
                xx, acc = carry
                y = r2.rational_supercycle_zc(
                    xx, hist, (khv, klv), dsel0, gL, gM, nm, groups, geo)
                last = y.ravel()[-1]
                xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (xx, acc + last)
            _, acc = lax.fori_loop(0, reps, body, (xx, jnp.float32(0)))
            return acc
        return lambda reps: call(x, kh, kl, reps)

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

    res = {j: [] for j in JTS}
    for r in range(3):
        order = JTS[r % len(JTS):] + JTS[:r % len(JTS)]
        for jt in order:
            try:
                sec = slope(make(jt))
            except Exception as e:  # noqa: BLE001
                log(f"round {r} JT={jt}: failed {type(e).__name__}: {e}")
                res[jt].append(float("nan"))
                continue
            msps = N / sec / 1e6
            res[jt].append(msps)
            log(f"round {r} JT={jt}: {msps:.0f} Msps")
    log("MEDIANS:", {j: round(float(np.nanmedian(v))) for j, v in res.items()})


if __name__ == "__main__":
    main()
