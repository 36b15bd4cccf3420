"""HISTORICAL (round 4): measures the pre-fused gridsel wrapper stages.
The non-fused kernels (gridsel_resample_arb/farrow) were deleted after the
fused-input kernels replaced them; run this script at git rev <= 38ddd7d.

Split gridsel time into {bare kernel} vs {wrapper data movement}.

Times, at 8M inputs on TPU:
  full    — production filt_block_raw path="gridsel" (exp30 number)
  kern    — bare pallas kernel on HOST-precomputed pk/rowc/a0/x2d
  prep    — the wrapper alone: _extend + _pack + _tile_x + output trim,
            with the pallas call replaced by a 1-op passthrough

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp32_gridsel_wrapper.py
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

    import multirate_tpu as mr
    from multirate_tpu.ops import indexing as idx
    from multirate_tpu.ops import gridsel as G
    try:
        from multirate_tpu.ops.pallas.gridsel import (
            gridsel_resample_arb, gridsel_resample_farrow)
    except ImportError:
        raise SystemExit(
            "exp32 is historical: the non-fused gridsel kernels were "
            "deleted after the fused-input kernels replaced them; "
            "check out git rev <= 38ddd7d to rerun (results summarized "
            "in the module docstring / ROADMAP).")

    log("device:", jax.devices()[0].device_kind)
    N = 8_000_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)

    def slope(fn, args, repeat=30, iters=4):
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

        def tmin(reps, it=iters):
            ts = []
            for _ in range(it):
                t0 = time.perf_counter()
                complex(many(args, jnp.int32(reps)))
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))

        complex(many(args, jnp.int32(3)))
        per0 = max(tmin(3, 2) / 3, 1e-6)
        r1 = int(np.clip(0.8 / per0, 3, repeat))
        t1 = tmin(r1)
        r2 = r1 + max(r1, min(int(0.5 / max(t1 / r1, 1e-6)), 20000))
        sl = []
        for _ in range(3):
            a, b = tmin(r1), tmin(r2)
            sl.append(max((b - a) / (r2 - r1), 1e-9))
        return float(np.median(sl))

    for name, spec in [("arb", dict(rate=0.4709, nphi=32)),
                       ("farrow", dict(rate=0.4709, nphi=32, polyorder=4))]:
        p = mr.make_kernel(ha, **spec)
        meta = p.gridsel_meta
        L2, M2, eps, JT, sp2, L2p, _, _ = meta
        n_max = idx.max_outputs(p, N)
        num_tiles, tiles8 = G._geometry(meta, n_max)
        u0 = jnp.asarray(0, jnp.int64)
        d0 = jnp.asarray(1, jnp.int64)
        packed = 2 * L2 <= L2p and eps != 0
        pk, rowc, a0 = G._pack(meta, p.nphi, p.delta_fx, u0, d0, tiles8,
                               farrow=(name == "farrow"), packed=packed)
        hist = jnp.zeros((p.history_len,), jnp.float32)
        xext = jnp.concatenate([hist, x])
        x2d = G._tile_x(xext, meta, num_tiles)
        kw = dict(M2=M2, sp2=sp2, T=p.taps_per_phi, nphi=p.nphi, L2=L2,
                  L2p=L2p, dir_=(0 if eps == 0 else (1 if eps > 0 else -1)),
                  deps=float(eps * 2.0 ** -32), num_tiles=num_tiles,
                  packed=packed, interpret=False)
        if name == "arb":
            T8 = -(-p.taps_per_phi // 8) * 8
            bp = jnp.zeros((T8, p.nphi), jnp.float32).at[
                :p.taps_per_phi].set(p.pfb.astype(jnp.float32))
            bd = jnp.zeros((T8, p.nphi), jnp.float32).at[
                :p.taps_per_phi].set(p.dpfb.astype(jnp.float32))

            def kern(xv, pkv, rcv, a0v):
                return gridsel_resample_arb(xv, pkv, rcv, a0v, bp, bd,
                                            JT=JT, **kw)
        else:
            P1, T = p.coeffs.shape
            PT8 = -(-(P1 * T) // 8) * 8
            cf = jnp.zeros((PT8, L2p), jnp.float32).at[:P1 * T, :].set(
                jnp.broadcast_to(
                    p.coeffs.astype(jnp.float32).reshape(P1 * T, 1),
                    (P1 * T, L2p)))

            def kern(xv, pkv, rcv, a0v):
                return gridsel_resample_farrow(xv, pkv, rcv, a0v, cf,
                                               JT=JT, P1=P1, **kw)

        sec_k = slope(kern, (x2d, pk, rowc, a0))
        log(f"{name}: bare kernel {sec_k*1e3:.3f} ms "
            f"({N/sec_k/1e6:.0f} Msps-equiv)   x2d {x2d.shape}")

        st = mr.init_state(p, (), jnp.float32)
        from multirate_tpu.utils.metrics import chained_seconds_per_call
        sec_f = chained_seconds_per_call(p, st, x, "gridsel",
                                         repeat=30, iters=4, target_t1=0.8)
        log(f"{name}: full path   {sec_f*1e3:.3f} ms ({N/sec_f/1e6:.0f} "
            f"Msps) -> wrapper = {1e3*(sec_f-sec_k):.3f} ms")


if __name__ == "__main__":
    main()
