"""HBM-honest zc headline ablation: N=8M (32 MB) forces the loop carry out
of VMEM (at N=1M the 4 MB x/y live ON-CHIP across chained iterations — the
round-2/3 numbers partly measured VMEM bandwidth), variant order rotates
per round (pool pace ramps within a session), bw probe at 16M.

Variants:
  full     — chained filt_block_raw (bench.py semantics: state chain + x
             single-element update)
  fullno   — filt_block_raw chained via the state only (no x update)
  rawup    — bare rational_supercycle_zc + x update, dsel = i%3
  notail   — rawup on an input sized so the tail call disappears
  bw       — streaming multiply on 16M f32 -> effective GB/s

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp13_zc_hbm.py [rounds]
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
    from multirate_tpu.ops.compute import (_zc_plan, _out_dtype,
                                           filt_block_raw)
    from multirate_tpu.ops import indexing as idx
    from multirate_tpu.ops.pallas.rational2 import (rational_supercycle_zc,
                                                    zc_geometry)

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    log("device:", jax.devices()[0].device_kind)
    N = 8_000_000
    ratio = Fraction(147, 160)
    L, M = 147, 160
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    p = mr.make_kernel(h, ratio=ratio)
    g = p.sc_group
    gL, gM = g * L, g * M
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    xbw = jnp.asarray(rng.standard_normal(16_000_000).astype(np.float32))
    st = mr.init_state(p, (), jnp.float32)
    n_max = int(idx.max_outputs(p, N))
    plan = _zc_plan(p, x, _out_dtype(p, x), n_max)
    groups, geo = plan
    JT, num_tiles, T_ok, R = geo
    log(f"geo JT={JT} tiles={num_tiles} T_ok={T_ok} R={R}")
    hist = jnp.zeros((p.history_len,), jnp.float32)
    kh, kl = p.k_zc_hi, p.k_zc_lo

    def make_full(update_x):
        @partial(jax.jit, static_argnames=("reps", "upd"))
        def call(pp, s0, xx, reps, upd):
            def body(i, carry):
                s, xx, acc = carry
                y, _, s = filt_block_raw(pp, s, xx, "pallas")
                last = y[-1]
                if upd:
                    xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (s, xx, acc + last)
            _, _, acc = lax.fori_loop(0, reps, body,
                                      (s0, xx, jnp.float32(0)))
            return acc
        return lambda reps: call(p, st, x, reps, update_x)

    def make_raw(xv, geo_, n_max_):
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
                xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (xx, acc + last)
            _, acc = lax.fori_loop(0, reps, body, (xx, jnp.float32(0)))
            return acc
        return lambda reps: call(kh, kl, xv, reps)

    Rn = T_ok * JT + 8
    Nn = Rn * gM
    n_max_n = T_ok * JT * gL
    geo_n = zc_geometry(gL, gM, n_max_n, Nn)
    xn = x[:Nn]
    log(f"notail geo: {geo_n} (N={Nn})")

    @partial(jax.jit, static_argnames="reps")
    def bwmany(xx, reps):
        def body(i, xx):
            return xx * np.float32(0.9999999) + np.float32(1e-30)
        return lax.fori_loop(0, reps, body, xx).ravel()[0]

    variants = [
        ("full", lambda: slope_seconds(make_full(True)), N),
        ("fullno", lambda: slope_seconds(make_full(False)), N),
        ("rawup", lambda: slope_seconds(make_raw(x, geo, n_max)), N),
        ("notail", lambda: slope_seconds(make_raw(xn, geo_n, n_max_n)), Nn),
        ("bw", lambda: slope_seconds(lambda r: bwmany(xbw, r)), None),
    ]
    res = {k: [] for k, _, _ in variants}
    for r in range(rounds):
        order = variants[r % len(variants):] + variants[:r % len(variants)]
        for name, fn, n_in in order:
            sec = fn()
            if name == "bw":
                v = 2 * 4 * xbw.size / sec / 1e9
                log(f"round {r} {name}: {v:.0f} GB/s")
            else:
                v = n_in / sec / 1e6
                log(f"round {r} {name}: {v:.0f} Msps")
            res[name].append(v)
    log("MEDIANS:", {k: round(float(np.median(v))) for k, v in res.items()})
    bw = float(np.median(res["bw"]))
    pace_roof = bw * 1e9 / (4 * (1 + 147 / 160)) / 1e6
    for k in ("full", "fullno", "rawup", "notail"):
        m = float(np.median(res[k]))
        log(f"{k}: {m:.0f} Msps = {m/1067:.1f}% phys, "
            f"{100*m/pace_roof:.1f}% of pace roofline (bw {bw:.0f} GB/s)")


if __name__ == "__main__":
    main()
