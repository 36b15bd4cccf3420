"""Measure the round-5 valder gridsel kernels on TPU at 8M (HBM-resident).

Production-path timings (filt_block path="gridsel") for:
  - arb single-channel @ rate 0.4709   (round-4 record: 12.3 Gsps)
  - farrow single-channel @ 0.4709     (round-4 record: 8.8 Gsps)
  - farrow 64-channel batched          (round-4 chansel record: 11.9 Gsps)
plus correctness guards vs the winsel oracle path at 200k.

Optional stage knobs via GRIDSEL_ABLATE (timing-only, results wrong):
  noplace,nomm,nosel,noder

Run (ONE TPU process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp50_valder_ab.py
"""
import os
import time

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import multirate_tpu as mr
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    log("device:", jax.devices()[0].device_kind,
        "ABLATE=", os.environ.get("GRIDSEL_ABLATE", ""))
    N = 8_000_000
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(N).astype(np.float32)
    x = jnp.asarray(x_np)
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)

    C = 64
    xc_np = rng.standard_normal((C, N // C)).astype(np.float32)
    xc = jnp.asarray(xc_np)

    cases = [
        ("arb", dict(rate=0.4709, nphi=32), x, x_np),
        ("farrow", dict(rate=0.4709, nphi=32, polyorder=4), x, x_np),
        ("farrow64", dict(rate=0.4709, nphi=32, polyorder=4), xc, xc_np),
    ]
    for name, spec, xv, xnp in cases:
        p = mr.make_kernel(ha, **spec)
        lead = xv.shape[:-1]
        st = mr.init_state(p, lead, jnp.float32)
        # correctness guard at 200k vs the winsel oracle path
        xs = jnp.asarray(xnp[..., :200_000])
        y_a, c_a, _ = mr.filt_block(p, mr.init_state(p, lead, jnp.float32),
                                    xs, path="gridsel")
        y_b, c_b, _ = mr.filt_block(p, mr.init_state(p, lead, jnp.float32),
                                    xs, path="winsel")
        n = int(min(c_a, c_b))
        d = (np.asarray(y_a)[..., :n].astype(np.float64)
             - np.asarray(y_b)[..., :n].astype(np.float64))
        ref = np.sqrt(np.mean(np.asarray(y_b)[..., :n].astype(np.float64)
                              ** 2))
        log(f"{name}: gridsel-vs-winsel rel-rms="
            f"{np.sqrt(np.mean(d*d))/ref:.3e}")
        sec = chained_seconds_per_call(p, st, xv, "gridsel",
                                       repeat=30, iters=4, target_t1=0.8)
        log(f"  [{name} gridsel 8M] {sec*1e3:.3f} ms -> "
            f"{xv.size/sec/1e6:.0f} Msps in")


if __name__ == "__main__":
    main()
