"""A/B the chansel tile width _NO (outputs per tile) on farrow_64ch.

Placement cost per output = 3*T*UW/(C*_NO) with UW ~= _NO*delta/D + T +
128: the fixed (T + 128-align) part amortizes with larger _NO. At rate
0.9173: _NO=128 -> UW=384 (1.9 stage-elems/out), 256 -> 512 (1.25),
384 -> 640 (1.04).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp28_chansel_no.py
"""
import time
from functools import partial

import numpy as np

NOS = (128, 256, 512)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import multirate_tpu as mr
    from multirate_tpu.ops import compute as cc
    from multirate_tpu.ops.pallas import select4 as s4

    log("device:", jax.devices()[0].device_kind)
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    p = mr.make_kernel(h, rate=0.9173, nphi=32, polyorder=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 125_000)).astype(np.float32))
    st = mr.init_state(p, (64,), jnp.float32)

    def make(no):
        @partial(jax.jit, static_argnames=("reps", "no_tag"))
        def call(pp, s0, xx, reps, no_tag):
            def body(i, carry):
                s, xx, acc = carry
                y, _, s = cc.filt_block_raw(pp, s, xx, "winsel")
                last = y[..., -1].ravel()[0]
                xx = xx.at[..., 0].add((last * 1e-30).astype(xx.dtype))
                return (s, xx, acc + last)
            _, _, acc = lax.fori_loop(0, reps, body,
                                      (s0, xx, jnp.float32(0)))
            return acc

        def run(reps):
            old = s4._NO
            s4._NO = no
            try:
                return float(call(p, st, x, reps, no))
            finally:
                s4._NO = old
        return run

    def slope(call_once, repeat=8, iters=3):
        def tmin(reps):
            call_once(reps)
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                call_once(reps)
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))
        t1 = tmin(repeat)
        per = max(t1 / repeat, 1e-7)
        r2 = repeat + max(repeat, min(int(0.5 / per), 20000))
        sl = []
        for _ in range(3):
            a, b = tmin(repeat), tmin(r2)
            sl.append(max((b - a) / (r2 - repeat), 1e-9))
        return float(np.median(sl))

    N = x.size
    res = {n: [] for n in NOS}
    for r in range(3):
        order = NOS[r % len(NOS):] + NOS[:r % len(NOS)]
        for no in order:
            try:
                sec = slope(make(no))
            except Exception as e:  # noqa: BLE001
                log(f"round {r} NO={no}: failed {type(e).__name__}: {e}")
                res[no].append(float("nan"))
                continue
            msps = N / sec / 1e6
            res[no].append(msps)
            log(f"round {r} NO={no}: {msps:.0f} Msps")
    log("MEDIANS:", {n: round(float(np.nanmedian(v)))
                     for n, v in res.items()})


if __name__ == "__main__":
    main()
