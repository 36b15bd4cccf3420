"""Micro-benchmark: which in-kernel banded-placement formulation is fast?

One pallas kernel per variant, each building P1=5 (sp2, 128) tap matrices
per grid step from per-lane offsets q (the gridsel Farrow A-variant load)
and reducing them to keep everything live. Variants:

  where   — current: m = (iou == q+t); k += where(m, row_bcast, 0)
  fma     — m_f = (iou == q+t).astype(f32); k += m_f * row_bcast
  barrel  — W (taps at rows 0..T) barrel-shifted by per-lane q:
            8 stages of where(bit, roll(K, 2^k), K)
  none    — no placement (floor: iota+q only)

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp20_place_micro.py
"""
import time
from functools import partial

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


SP2, L2P, T, P1, STEPS = 192, 128, 10, 5, 256


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    cf = jnp.asarray(rng.standard_normal((P1 * T + 6, L2P))
                     .astype(np.float32))
    qs = jnp.asarray(rng.integers(8, SP2 - T - 8,
                                  size=(STEPS, L2P)).astype(np.int32))

    def make(variant):
        def kern(q_ref, cf_ref, o_ref):
            f32 = jnp.float32
            sub = jax.lax.rem(pl.program_id(0), jnp.int32(8))
            q = q_ref[sub, :]
            iou = jax.lax.broadcasted_iota(jnp.int32, (SP2, L2P), 0)
            z = jnp.float32(0.0)
            acc = jnp.zeros((SP2, L2P), f32)
            for p in range(P1):
                if variant == "none":
                    k = cf_ref[p:p + 1, :] * jnp.ones((SP2, L2P), f32)
                elif variant == "barrel":
                    # W: taps at rows [0, T), zeros elsewhere
                    k = jnp.concatenate(
                        [cf_ref[p * T:(p + 1) * T, :],
                         jnp.zeros((SP2 - T, L2P), f32)], axis=0)
                    for b in range(8):          # q < 256
                        sh = jnp.int32(1 << b)
                        bit = jax.lax.bitwise_and(
                            q, jnp.int32(1 << b)) != jnp.int32(0)
                        k = jnp.where(bit[None, :],
                                      pltpu.roll(k, sh, axis=0), k)
                else:
                    k = jnp.zeros((SP2, L2P), f32)
                    for t in range(T):
                        row = cf_ref[p * T + t:p * T + t + 1, :]
                        if variant == "where":
                            m = iou == (q + jnp.int32(t))[None, :]
                            k = k + jnp.where(m, row, z)
                        else:                   # fma
                            m_f = (iou == (q + jnp.int32(t))[None, :]
                                   ).astype(f32)
                            k = k + m_f * row
                acc = acc + k
            o_ref[:, :] = acc

        def one(qv):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((SP2, L2P), jnp.float32),
                grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec((8, L2P),
                                 lambda j: (jax.lax.div(j, jnp.int32(8)),
                                            j * 0)),
                    pl.BlockSpec(cf.shape, lambda j: (j * 0, j * 0)),
                ],
                out_specs=pl.BlockSpec((SP2, L2P), lambda j: (j * 0, j * 0)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(qv, cf)

        @partial(jax.jit, static_argnames="reps")
        def call(qv, reps):
            def body(i, carry):
                qv, acc = carry
                y = one(qv)
                last = y[0, 0]
                qv = qv.at[0, 0].add(
                    jax.lax.convert_element_type(last * 0.0, jnp.int32))
                return (qv, acc + last)
            _, acc = lax.fori_loop(0, reps, body, (qv, jnp.float32(0)))
            return acc
        return lambda reps: call(qs, reps)

    def slope(call_once, repeat=5, iters=3):
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
        r2 = repeat + max(repeat, min(int(0.4 / per), 5000))
        sl = []
        for _ in range(3):
            a, b = tmin(repeat), tmin(r2)
            sl.append(max((b - a) / (r2 - repeat), 1e-9))
        return float(np.median(sl))

    res = {}
    for v in ("none", "where", "fma", "barrel"):
        sec = slope(make(v))
        per_step_us = sec / STEPS * 1e6
        res[v] = per_step_us
        log(f"{v}: {per_step_us:.2f} us/step "
            f"({per_step_us * 0.94e3 / P1:.0f} cyc per placed matrix)")
    log("RESULT:", {k: round(v, 2) for k, v in res.items()})


if __name__ == "__main__":
    main()
