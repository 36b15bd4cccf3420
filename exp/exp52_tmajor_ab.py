"""A/B the time-major chansel kernel vs channel-major v4/v5 at C=64.

Bare-kernel comparison at the farrow_64ch bench config (rate 0.9173,
NPHI=32, polyorder=4, 8M total samples across 64 channels), interleaved
rounds so relay pace drift cancels. Also C=16..256 scaling for tm.

Run (ONE TPU process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp52_tmajor_ab.py
"""
import time
from functools import partial

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import multirate_tpu as mr
    from multirate_tpu.ops import indexing as idx
    from multirate_tpu.ops.pallas import select4 as s4

    log("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    rate, nphi, po = 0.9173, 32, 4
    pf = mr.make_kernel(ha, rate=rate, nphi=nphi, polyorder=po)
    pa = mr.make_kernel(ha, rate=rate, nphi=nphi)

    from multirate_tpu.utils.metrics import chained_fn_seconds

    def slope(fn, arg):
        return chained_fn_seconds(fn, arg)

    N = 8_000_000
    for C in (64, 128, 256):
        E = N // C
        x2 = jnp.asarray(rng.standard_normal((C, E)).astype(np.float32))
        xt = jnp.asarray(np.ascontiguousarray(
            np.asarray(x2).T))                      # (E, C) time-major
        n_out = int(np.asarray(idx.accum_carry(
            nphi, pf.delta_fx,
            jnp.asarray(0, jnp.int64), jnp.asarray(1, jnp.int64), E)[0]))
        u0 = jnp.asarray(0, jnp.int64)

        # correctness cross-check (farrow): tm vs v4 outputs
        yv4 = np.asarray(s4.chan_resample_farrow_v4(
            x2[:, :40000], u0, pf.coeffs, nphi, pf.delta_fx, 30000))
        ytm = np.asarray(s4.chan_resample_farrow_tm(
            xt[:40000], u0, pf.coeffs, nphi, pf.delta_fx, 30000))
        d = np.abs(ytm.T - yv4).max() / np.abs(yv4).max()
        log(f"C={C}: tm-vs-v4 rel max diff {d:.2e}")

        kv4 = lambda x: s4.chan_resample_farrow_v4(   # noqa: E731
            x, u0, pf.coeffs, nphi, pf.delta_fx, n_out)
        ktm = lambda x: s4.chan_resample_farrow_tm(   # noqa: E731
            x, u0, pf.coeffs, nphi, pf.delta_fx, n_out)
        # interleave A/B/A/B
        for rnd in range(2):
            t_v4 = slope(kv4, x2)
            t_tm = slope(ktm, xt)
            log(f"  C={C} round {rnd}: v4 {t_v4*1e3:.3f} ms "
                f"({N/t_v4/1e6:.0f} Msps) | tm {t_tm*1e3:.3f} ms "
                f"({N/t_tm/1e6:.0f} Msps)")
        if C == 64:
            kva = lambda x: s4.chan_resample_v4(      # noqa: E731
                x, u0, pa.pfb, pa.dpfb, nphi, pa.delta_fx, n_out)
            kta = lambda x: s4.chan_resample_tm(      # noqa: E731
                x, u0, pa.pfb, pa.dpfb, nphi, pa.delta_fx, n_out)
            t_v4 = slope(kva, x2)
            t_tm = slope(kta, xt)
            log(f"  C={C} arb: v4 {t_v4*1e3:.3f} ms ({N/t_v4/1e6:.0f}) | "
                f"tm {t_tm*1e3:.3f} ms ({N/t_tm/1e6:.0f})")


if __name__ == "__main__":
    main()
