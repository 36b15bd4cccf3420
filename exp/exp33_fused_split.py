"""Split the fused-gridsel path: host pad+reshape vs bare fused kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp33_fused_split.py
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
            gridsel_resample_arb_fused, gridsel_resample_farrow_fused)
    except ImportError:
        raise SystemExit(
            "exp33 is historical: the round-4 per-variant kernels were "
            "replaced by the round-5 valder kernels; check out a rev "
            "before the valder rewrite to rerun (results summarized in "
            "ROADMAP round-4 state).")

    log("device:", jax.devices()[0].device_kind)
    N = 8_000_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)

    def slope(fn, args):
        @jax.jit
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

        def tmin(reps, it=4):
            ts = []
            for _ in range(it):
                t0 = time.perf_counter()
                complex(many(args, jnp.int32(reps)))
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))

        complex(many(args, jnp.int32(3)))
        per0 = max(tmin(3, 2) / 3, 1e-6)
        r1 = int(np.clip(0.8 / per0, 3, 30))
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

        # (a) host prep alone
        prep = lambda xv: G._rows_x(hist, xv, meta, num_tiles)  # noqa: E731
        sec_p = slope(prep, (x,))
        log(f"{name}: pad+reshape {sec_p*1e3:.3f} ms")

        xr = G._rows_x(hist, x, meta, num_tiles)
        kw = dict(M2=M2, sp2=sp2, T=p.taps_per_phi, nphi=p.nphi, L2=L2,
                  L2p=L2p, dir_=(0 if eps == 0 else (1 if eps > 0 else -1)),
                  deps=float(eps * 2.0 ** -32), num_tiles=num_tiles,
                  packed=packed, interpret=False)
        if name == "arb":
            dirv = 0 if eps == 0 else (1 if eps > 0 else -1)
            taprows = G._tap_rows(p.pfb, p.dpfb, pk, p.nphi, dirv, packed)
            kern = lambda xv: gridsel_resample_arb_fused(  # noqa: E731
                xv, pk, rowc, a0, taprows, JT=JT, **kw)
        else:
            P1, T = p.coeffs.shape
            PT8 = -(-(P1 * T) // 8) * 8
            cf = jnp.zeros((PT8, L2p), jnp.float32).at[:P1 * T, :].set(
                jnp.broadcast_to(
                    p.coeffs.astype(jnp.float32).reshape(P1 * T, 1),
                    (P1 * T, L2p)))
            kern = lambda xv: gridsel_resample_farrow_fused(  # noqa: E731
                xv, pk, rowc, a0, cf, JT=JT, P1=P1, **kw)
        sec_k = slope(kern, (xr,))
        log(f"{name}: bare fused kernel {sec_k*1e3:.3f} ms "
            f"({N/sec_k/1e6:.0f} Msps-equiv)")


if __name__ == "__main__":
    main()
