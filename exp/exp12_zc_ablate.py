"""Ablate the zc headline to find the real bottleneck (same-session,
interleaved, adaptive rep counts so slope deltas sit well above the relay
RTT jitter).

Variants (all chained-slope, per-call seconds on 1M f32 147//160):
  full    — filt_block_raw via the standard harness (bench.py's number)
  raw     — the bare rational_supercycle_zc call, x constant, dsel varies
            per iteration (defeats licm/CSE), no x-update copy
  rawup   — raw + the harness's xx.at[0].add update (isolates the update)
  notail  — raw on an input sized so num_tiles == T_ok (no tail call)
  bw      — pure streaming-multiply probe -> effective GB/s (pace yardstick)

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp12_zc_ablate.py [rounds]
"""
import sys
import time
from fractions import Fraction
from functools import partial

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def slope_seconds(call_once, repeat=30, iters=3):
    """Chained-slope per-call seconds of `call_once(reps)` (jitted,
    returns a scalar). Adaptive second trip count targets ~0.5 s extra."""
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
    r2 = r1 + max(r1, min(int(0.5 / per), 20000))
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
    from multirate_tpu.ops.compute import _zc_plan, _out_dtype
    from multirate_tpu.ops import indexing as idx
    from multirate_tpu.ops.pallas.rational2 import rational_supercycle_zc
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    log("device:", jax.devices()[0].device_kind)
    N = 1_000_000
    ratio = Fraction(147, 160)
    L, M = 147, 160
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    p = mr.make_kernel(h, ratio=ratio)
    g = p.sc_group
    gL, gM = g * L, g * M
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    st = mr.init_state(p, (), jnp.float32)
    n_max = int(idx.max_outputs(p, N))
    plan = _zc_plan(p, x, _out_dtype(p, x), n_max)
    groups, geo = plan
    JT, num_tiles, T_ok, R = geo
    log(f"geo JT={JT} tiles={num_tiles} T_ok={T_ok} stack={p.k_zc_hi.shape}")
    hist = jnp.zeros((p.history_len,), jnp.float32)
    kh, kl = p.k_zc_hi, p.k_zc_lo

    def make_raw(xv, geo_, n_max_, update_x):
        nm = n_max_

        @partial(jax.jit, static_argnames="reps")
        def call(khh, kll, xx, reps):
            def body(i, carry):
                xx, acc = carry
                dsel = (i % jnp.int32(3)).astype(jnp.int32)
                y = rational_supercycle_zc(xx, hist, (khh, kll), dsel,
                                           gL, gM, nm, groups, geo_,
                                           three_pass=True)
                last = y[-1]
                if update_x:
                    xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (xx, acc + last)
            _, acc = lax.fori_loop(0, reps, body, (xx, jnp.float32(0)))
            return acc
        return lambda reps: call(kh, kl, xv, reps)

    # notail geometry: num_tiles == T_ok
    from multirate_tpu.ops.pallas.rational2 import zc_geometry
    Rn = T_ok * JT + 8
    Nn = Rn * gM
    n_max_n = T_ok * JT * gL
    geo_n = zc_geometry(gL, gM, n_max_n, Nn)
    log(f"notail geo: {geo_n} (N={Nn})")
    xn = x[:Nn]

    def bw_call():
        @partial(jax.jit, static_argnames="reps")
        def many(xx, reps):
            def body(i, xx):
                return xx * np.float32(0.9999999) + np.float32(1e-30)
            return lax.fori_loop(0, reps, body, xx).ravel()[0]
        return lambda reps: many(x, reps)

    variants = {
        "full": lambda: chained_seconds_per_call(p, st, x, "pallas",
                                                 repeat=30, iters=3),
        "raw": lambda: slope_seconds(make_raw(x, geo, n_max, False)),
        "rawup": lambda: slope_seconds(make_raw(x, geo, n_max, True)),
        "notail": lambda: slope_seconds(make_raw(xn, geo_n, n_max_n, False)),
        "bw": lambda: slope_seconds(bw_call()),
    }
    res = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            sec = fn()
            if name == "bw":
                v = 2 * 4 * N / sec / 1e9
                log(f"round {r} {name}: {v:.0f} GB/s")
            else:
                n_in = Nn if name == "notail" else N
                v = n_in / sec / 1e6
                log(f"round {r} {name}: {v:.0f} Msps")
            res[name].append(v)
    log("MEDIANS:", {k: round(float(np.median(v))) for k, v in res.items()})
    bw = float(np.median(res["bw"]))
    pace_roof = bw * 1e9 / (4 * (1 + 147 / 160)) / 1e6
    for k in ("full", "raw", "rawup", "notail"):
        m = float(np.median(res[k]))
        log(f"{k}: {m:.0f} Msps = {m/1067:.1f}% phys, "
            f"{100*m/pace_roof:.1f}% of pace roofline")


if __name__ == "__main__":
    main()
