"""Ablation of the batched-gridsel Farrow kernel on TPU: which stage eats
the 3x gap between the vreg+MAC cost model and measured throughput?

Variants (all timed with the chained-slope harness, order-rotated):
  full     — the real kernel (accuracy-checked once vs windows)
  nopl     — placement stages removed: ks = P1 constant matrices
  nosplit  — single-pass bf16 matmuls (no hi/lo splits; wrong values)
  nohorner — single matmul per variant (P1=1 equivalent work)
  noextr   — write y rows 0..JT of the whole block (no per-channel slices)
  justmm   — matmuls only: no placement, no splits (bf16), no Horner

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp18_gsb_ablate.py
"""
import time
from functools import partial

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def slope_seconds(call_once, repeat=10, iters=3, target=0.5):
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import multirate_tpu as mr
    from multirate_tpu.ops import indexing as idx
    from multirate_tpu.ops.gridsel import (_batch_dims, _geometry, _pack,
                                           _tile_x)
    from multirate_tpu.ops.pallas import gridsel as pg
    from multirate_tpu.ops import precision as prec

    log("device:", jax.devices()[0].device_kind)
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    rng = np.random.default_rng(0)
    N, C = 8_000_000, 64
    x64 = jnp.asarray(rng.standard_normal((C, N // C)).astype(np.float32))
    p = mr.make_kernel(ha, rate=0.9173, nphi=32, polyorder=4)
    m = p.gridsel_meta
    L2, M2, eps, JT0, sp2, L2p, _, _ = m
    P1, T = p.coeffs.shape
    nphi, delta_fx = p.nphi, p.delta_fx
    n_max = int(idx.max_outputs(p, x64.shape[-1]))
    cb, jt = _batch_dims(m, C, n_k=2 * P1)
    num_tiles, tiles8 = _geometry(m, n_max, jt)
    log(f"plan L2={L2} M2={M2} sp2={sp2} JT_b={jt} CB={cb} "
        f"tiles={num_tiles} n_max={n_max}")
    dir_ = 1 if eps > 0 else -1
    deps = float(eps * 2.0 ** -32)

    u0 = jnp.asarray(1, jnp.int64)
    d0 = jnp.asarray(1, jnp.int64)
    pk, rowc, a0 = _pack(m, nphi, delta_fx, u0, d0, tiles8, farrow=True,
                         jt=jt)
    hext = jnp.zeros((C, p.history_len), jnp.float32)
    xext = jnp.concatenate([hext, x64], axis=-1)
    x3 = _tile_x(xext, m, num_tiles, jt)
    PT8 = -(-(P1 * T) // 8) * 8
    cf = jnp.zeros((PT8, L2p), jnp.float32).at[:P1 * T, :].set(
        jnp.broadcast_to(np.asarray(p.coeffs, np.float32).reshape(
            P1 * T, 1), (P1 * T, L2p)))

    def make_kernel(mode):
        def kern(pk_ref, rowc_ref, a0_ref, xa, xb, cf_ref, o_ref):
            f32 = jnp.float32
            sub = jax.lax.rem(pl.program_id(1), jnp.int32(8))
            pkv = pk_ref[sub, :]
            rowcv = rowc_ref[sub, :]
            a0v = a0_ref[sub, :]
            if mode in ("nopl", "justmm"):
                ks = [cf_ref[0:1, :] * jnp.ones((sp2, L2p), f32)
                      for _ in range(2 * P1)]
            else:
                ks = pg._build_k_farrow(pkv, cf_ref[...], T=T, P1=P1,
                                        sp2=sp2, L2p=L2p, dir_=dir_)
            JTP = jt + 8
            CBT = cb * JTP
            X0 = jnp.concatenate([xa[...], xb[...]], axis=1).reshape(
                CBT, M2)
            if mode in ("nosplit", "justmm"):
                x0 = X0.astype(jnp.bfloat16)
                v1 = pltpu.roll(X0, jnp.int32(CBT - 1), axis=0)
                x1 = v1[:, :sp2 - M2].astype(jnp.bfloat16)

                def mm(K):
                    return (jnp.dot(x0, K[:M2].astype(jnp.bfloat16),
                                    preferred_element_type=f32)
                            + jnp.dot(x1, K[M2:sp2].astype(jnp.bfloat16),
                                      preferred_element_type=f32))
            else:
                mm = pg._make_mm(X0, CBT, M2, sp2, True)
            rowf = pg._batch_rowf(cb, JTP, L2p)
            plin = a0v[None, :] + rowf * jnp.float32(deps)
            if mode in ("nohorner", "justmm"):
                y = mm(ks[0]) + mm(ks[P1])
            else:
                psiB = plin - jnp.float32(dir_ * nphi)
                accA = mm(ks[P1 - 1])
                accB = mm(ks[2 * P1 - 1])
                for q in range(P1 - 2, -1, -1):
                    accA = accA * plin + mm(ks[q])
                    accB = accB * psiB + mm(ks[P1 + q])
                mask = rowf >= rowcv[None, :]
                y = jnp.where(mask, accB, accA)
            if mode == "noextr":
                for c in range(cb):
                    o_ref[c, :, :] = y[:jt, :L2].astype(o_ref.dtype)
            else:
                for c in range(cb):
                    o_ref[c, :, :] = y[c * JTP:c * JTP + jt, :L2].astype(
                        o_ref.dtype)
        return kern

    def make_call(mode):
        kern = make_kernel(mode)
        rps = jt // 8
        p8 = lambda cbi, j: (jax.lax.div(j, jnp.int32(8)), j * 0)

        def one(xv):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((C, num_tiles * jt, L2),
                                               jnp.float32),
                grid=(C // cb, num_tiles),
                in_specs=[
                    pl.BlockSpec((8, L2p), p8),
                    pl.BlockSpec((8, L2p), p8),
                    pl.BlockSpec((8, L2p), p8),
                    pl.BlockSpec((cb, jt, M2),
                                 lambda cbi, j: (cbi, j, j * 0)),
                    pl.BlockSpec((cb, 8, M2),
                                 lambda cbi, j: (cbi, (j + 1) * rps, j * 0)),
                    pl.BlockSpec(cf.shape, lambda cbi, j: (j * 0, j * 0)),
                ],
                out_specs=pl.BlockSpec((cb, jt, L2),
                                       lambda cbi, j: (cbi, j, j * 0)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(pk, rowc, a0, xv, xv, cf)

        @partial(jax.jit, static_argnames="reps")
        def call(xv, reps):
            def body(i, carry):
                xv, acc = carry
                y = one(xv)
                last = y[0, -1, 0]
                xv = xv.at[0, 0, 0].add((last * 1e-30).astype(xv.dtype))
                return (xv, acc + last)
            _, acc = lax.fori_loop(0, reps, body, (xv, jnp.float32(0)))
            return acc
        return lambda reps: call(x3, reps)

    modes = ["full", "nopl", "nosplit", "nohorner", "noextr", "justmm"]
    res = {k: [] for k in modes}
    for r in range(3):
        order = modes[r % len(modes):] + modes[:r % len(modes)]
        for mode in order:
            sec = slope_seconds(make_call(mode))
            msps = x64.size / sec / 1e6
            res[mode].append(msps)
            log(f"round {r} {mode}: {msps:.0f} Msps")
    log("MEDIANS:", {k: round(float(np.median(v))) for k, v in res.items()})


if __name__ == "__main__":
    main()
