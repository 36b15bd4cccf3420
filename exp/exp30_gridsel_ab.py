"""A/B the gridsel placement formulation on TPU at 8M (HBM-resident).

Knobs via env:
  GRIDSEL_PLACE=where|fma   (pallas/gridsel.py placement stages)

Run (ONE TPU process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site GRIDSEL_PLACE=fma \
      python exp/exp30_gridsel_ab.py
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
        "GRIDSEL_PLACE=", os.environ.get("GRIDSEL_PLACE", "fma"))
    N = 8_000_000
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(N).astype(np.float32)
    x = jnp.asarray(x_np)
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)

    for name, spec in [("arb", dict(rate=0.4709, nphi=32)),
                       ("farrow", dict(rate=0.4709, nphi=32, polyorder=4))]:
        p = mr.make_kernel(ha, **spec)
        st = mr.init_state(p, (), jnp.float32)
        # correctness guard at 200k vs the windows oracle path
        y_a, c_a, _ = mr.filt_block(p, mr.init_state(p, (), jnp.float32),
                                    jnp.asarray(x_np[:200_000]),
                                    path="gridsel")
        y_b, c_b, _ = mr.filt_block(p, mr.init_state(p, (), jnp.float32),
                                    jnp.asarray(x_np[:200_000]),
                                    path="winsel")
        n = int(min(c_a, c_b))
        d = (np.asarray(y_a)[:n].astype(np.float64)
             - np.asarray(y_b)[:n].astype(np.float64))
        log(f"{name}: gridsel-vs-winsel rms={np.sqrt(np.mean(d*d)):.3e}")
        sec = chained_seconds_per_call(p, st, x, "gridsel",
                                       repeat=30, iters=4, target_t1=0.8)
        log(f"  [{name} gridsel 8M] {sec*1e3:.3f} ms -> "
            f"{x.size/sec/1e6:.0f} Msps in")


if __name__ == "__main__":
    main()
