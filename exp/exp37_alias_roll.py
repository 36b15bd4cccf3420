"""Prereqs for the direct-x (zero-prep) fused gridsel kernel.

(a) Is ``x[:R*M2].reshape(R, M2)`` aliased into a pallas operand, or does
    XLA materialize a 32 MB copy?  Compare a trivial row-reduce kernel fed
    a pre-shaped (R, M2) array vs the slice+reshape view of a 1-D x.
(b) Do STATIC sublane + lane rolls on a (JT+24, 189) block lower in
    Mosaic, and what do they cost?

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp37_alias_roll.py
"""
import time
from functools import partial

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log("device:", jax.devices()[0].device_kind)
    M2, JT = 189, 144
    N = 8_000_000
    R = N // M2
    num_tiles = R // JT
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    x2 = jnp.asarray(np.ascontiguousarray(
        np.asarray(x1[:R * M2]).reshape(R, M2)))

    def reduce_kernel(xr, o_ref, *, JT):
        o_ref[:, :] = xr[...][:JT, :128]

    def run2d(xv):
        return pl.pallas_call(
            partial(reduce_kernel, JT=JT),
            out_shape=jax.ShapeDtypeStruct((num_tiles * JT, 128),
                                           jnp.float32),
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec((JT, M2), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((JT, 128), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xv)

    def slope(fn, args, label):
        @partial(jax.jit, static_argnames=())
        def many(a, reps):
            def body(i, carry):
                a, acc = carry
                y = fn(*a)
                last = y.ravel()[-1]
                a = (a[0].at[(0,) * a[0].ndim].add(
                    (last * 1e-30).astype(a[0].dtype)),) + a[1:]
                return (a, acc + last)
            _, acc = lax.fori_loop(0, reps, body, (a, jnp.float32(0)))
            return acc

        complex(many(args, jnp.int32(3)))
        def tmin(reps, it=4):
            ts = []
            for _ in range(it):
                t0 = time.perf_counter()
                complex(many(args, jnp.int32(reps)))
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))
        r1, r2 = 20, 120
        sl = []
        for _ in range(3):
            a, b = tmin(r1), tmin(r2)
            sl.append(max((b - a) / (r2 - r1), 1e-9))
        sec = float(np.median(sl))
        log(f"{label}: {sec*1e3:.3f} ms")
        return sec

    slope(run2d, (x2,), "pallas copy, pre-shaped (R, M2)")
    slope(lambda xv: run2d(xv[:R * M2].reshape(R, M2)), (x1,),
          "pallas copy, x[:R*M2].reshape view of 1-D x")

    # (b) static rolls inside the kernel
    def roll_kernel(xr, o_ref, *, JT):
        z = xr[...]
        zs = pltpu.roll(z, jnp.int32(JT - 7), axis=0)   # static sublane
        zl = pltpu.roll(zs, jnp.int32(33), axis=1)      # static lane, w=189
        o_ref[:, :] = zl[:JT, :128]

    def run_roll(xv):
        return pl.pallas_call(
            partial(roll_kernel, JT=JT),
            out_shape=jax.ShapeDtypeStruct((num_tiles * JT, 128),
                                           jnp.float32),
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec((JT, M2), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((JT, 128), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xv)

    try:
        slope(run_roll, (x2,), "pallas copy + static sublane+lane roll")
    except Exception as e:  # noqa: BLE001
        log(f"static roll FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
