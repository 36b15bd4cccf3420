"""Pallas-based HBM pace probe + fused-kernel headline, same session.

The XLA-elementwise bw probes in exp13/14 were garbage twice over: XLA
fuses barrier-free multiply chains into one pass, and the adaptive trip
count derived from t1 (which includes the ~30 ms relay RTT) under-sizes
the second trip so the slope drowns in RTT jitter. This probe is a Pallas
copy kernel (y_tile = 2*x_tile over a 1-D grid) measured with a two-stage
adaptive slope — the same machinery as the real kernels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp15_pace_probe.py [rounds]
"""
import sys
import time
from functools import partial
from fractions import Fraction

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def slope_seconds(call_once, repeat=8, iters=3, target=0.6):
    """Two-stage adaptive chained slope: stage 1 estimates per-iter from a
    small slope (RTT cancels), stage 2 sizes the long trip from THAT."""
    def tmin(reps):
        float(call_once(reps))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(call_once(reps))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    r1 = repeat
    t1, t4 = tmin(r1), tmin(4 * r1)
    per = max((t4 - t1) / (3 * r1), 1e-7)
    r2 = r1 + max(r1, min(int(target / per), 200000))
    slopes = []
    for _ in range(3):
        a, b = tmin(r1), tmin(r2)
        slopes.append(max((b - a) / (r2 - r1), 1e-9))
    return float(np.median(slopes))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import multirate_tpu as mr
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    log("device:", jax.devices()[0].device_kind)

    # ---- pallas copy probe: 16M f32 = 64 MB in + 64 MB out ---------- #
    NP_ROWS, NP_COLS, PJT = 32768, 512, 256
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((NP_ROWS, NP_COLS))
                     .astype(np.float32))

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * np.float32(2.0)

    def copy_once(xx):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct((NP_ROWS, NP_COLS), jnp.float32),
            grid=(NP_ROWS // PJT,),
            in_specs=[pl.BlockSpec((PJT, NP_COLS), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((PJT, NP_COLS), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(xx)

    @partial(jax.jit, static_argnames="reps")
    def probe(xx, reps):
        def body(i, carry):
            xx, acc = carry
            y = copy_once(xx)
            last = y[-1, -1]
            xx = xx.at[0, 0].add((last * 1e-30).astype(xx.dtype))
            return (xx, acc + last)
        _, acc = lax.fori_loop(0, reps, body, (xp, jnp.float32(0)))
        return acc

    # ---- headline configs ------------------------------------------- #
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    p = mr.make_kernel(h, ratio=ratio)
    x1 = jnp.asarray(rng.standard_normal(1_000_000).astype(np.float32))
    x8 = jnp.asarray(rng.standard_normal(8_000_000).astype(np.float32))
    st = mr.init_state(p, (), jnp.float32)

    pbytes = 2 * 4 * NP_ROWS * NP_COLS
    variants = [
        ("probe", lambda: pbytes / slope_seconds(
            lambda r: probe(xp, r)) / 1e9),
        ("head1M", lambda: 1e6 / chained_seconds_per_call(
            p, st, x1, "pallas", repeat=20, iters=3) / 1e6),
        ("head8M", lambda: 8e6 / chained_seconds_per_call(
            p, st, x8, "pallas", repeat=8, iters=3) / 1e6),
    ]
    res = {k: [] for k, _ in variants}
    for r in range(rounds):
        order = variants[r % len(variants):] + variants[:r % len(variants)]
        for name, fn in order:
            v = fn()
            log(f"round {r} {name}: {v:.0f} "
                f"{'GB/s' if name == 'probe' else 'Msps'}")
            res[name].append(v)
    med = {k: float(np.median(v)) for k, v in res.items()}
    log("MEDIANS:", {k: round(v) for k, v in med.items()})
    pace_roof = med["probe"] * 1e9 / (4 * (1 + 147 / 160)) / 1e6
    for k in ("head1M", "head8M"):
        log(f"{k}: {med[k]:.0f} Msps = {med[k]/1067:.1f}% phys, "
            f"{100*med[k]/pace_roof:.1f}% of pace roofline "
            f"({med['probe']:.0f} GB/s achievable)")


if __name__ == "__main__":
    main()
