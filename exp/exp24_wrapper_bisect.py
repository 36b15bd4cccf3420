"""Bisect the 78 -> 45 Gsps gap between the raw zc pallas_call (exp23)
and bench-semantics filt_block_raw. Layers, innermost out:

  raw     — pallas_call on pre-shaped (R, gM) x2d, (T_ok*JT, gL) out
  zcfn    — rational_supercycle_zc (adds 1D->2D reshape, fused tail,
            flat out reshape + [:n_out])
  runzc   — _run_zc (adds dsel scalar math, history reshape)
  fbr     — filt_block_raw path="pallas" (adds state carry, count math,
            carry_history)

All timed with the same chained-slope harness on the same 8M block.
Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp24_wrapper_bisect.py
"""
import time
from fractions import Fraction
from functools import partial

import numpy as np

LAYERS = ("notail", "notail_chunk", "fused", "septail", "fbr")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import multirate_tpu as mr
    from multirate_tpu.ops.pallas import rational2 as r2
    from multirate_tpu.ops import compute as cc
    from multirate_tpu.ops import indexing as idx

    log("device:", jax.devices()[0].device_kind)
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    p = mr.make_kernel(h, ratio=ratio)
    rng = np.random.default_rng(0)
    N = 8_000_000
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    st = mr.init_state(p, (), jnp.float32)

    pfb2d, L, M, g = cc._band_geometry(p)
    gL, gM = g * L, g * M
    n_max = int(idx.max_outputs(p, N))
    groups = r2.zc_groups(pfb2d.shape[0], L, M, g, p.h_min,
                          shift_slack=cc._zc_slack(p))
    geo = r2.zc_geometry(gL, gM, n_max, N, S=8)
    JT, num_tiles, T_ok, R = geo
    log(f"JT={JT} tiles={num_tiles} T_ok={T_ok} n_max={n_max}")
    kh, kl = p.k_zc_hi, p.k_zc_lo
    dsel0 = jnp.zeros((), jnp.int32)
    hist = jnp.zeros((p.history_len,), jnp.float32)

    nm_notail = T_ok * JT * gL
    geo_nt = (JT, T_ok, T_ok, R)

    def layer_fn(layer):
        if layer in ("notail", "notail_chunk"):
            # num_tiles == T_ok: plain main kernel, no fused tail
            long = layer == "notail"

            def f(xx, khv, klv, s, _long=long):
                old = r2.ZC_LONGDOT
                r2.ZC_LONGDOT = _long
                try:
                    y = r2.rational_supercycle_zc(
                        xx, hist, (khv, klv), dsel0, gL, gM, nm_notail,
                        groups, geo_nt)
                finally:
                    r2.ZC_LONGDOT = old
                return y, s
            return f
        if layer in ("fused", "septail"):
            fuse_max = 1 << 20 if layer == "fused" else 0

            def f(xx, khv, klv, s, _fm=fuse_max):
                old = r2.ZC_FUSE_MAX_TILES
                r2.ZC_FUSE_MAX_TILES = _fm
                try:
                    y = r2.rational_supercycle_zc(
                        xx, hist, (khv, klv), dsel0, gL, gM, n_max,
                        groups, geo)
                finally:
                    r2.ZC_FUSE_MAX_TILES = old
                return y, s
            return f

        def f(xx, khv, klv, s, pp):
            # pp enters through the jit boundary: closing over p embeds
            # its ~100MB K stacks as constants (relay rejects the request)
            y, _, s = cc.filt_block_raw(pp, s, xx, "pallas")
            return y, s
        return f

    def make(layer):
        fn = layer_fn(layer)
        takes_p = layer == "fbr"

        @partial(jax.jit, static_argnames="reps")
        def call(xx, khv, klv, s0, pp, reps):
            def body(i, carry):
                xx, s, acc = carry
                if takes_p:
                    y, s = fn(xx, khv, klv, s, pp)
                else:
                    y, s = fn(xx, khv, klv, s)
                last = y.ravel()[-1]
                xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (xx, s, acc + last)
            _, _, acc = lax.fori_loop(0, reps, body,
                                      (xx, s0, jnp.float32(0)))
            return acc
        return lambda reps: call(x, kh, kl, st, p, reps)

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

    res = {m: [] for m in LAYERS}
    for r in range(3):
        order = LAYERS[r % len(LAYERS):] + LAYERS[:r % len(LAYERS)]
        for m in order:
            sec = slope(make(m))
            msps = N / sec / 1e6
            res[m].append(msps)
            log(f"round {r} {m}: {msps:.0f} Msps")
    log("MEDIANS:", {m: round(float(np.median(v))) for m, v in res.items()})


if __name__ == "__main__":
    main()
