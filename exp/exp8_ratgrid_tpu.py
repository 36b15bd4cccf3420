"""Measure the ratgrid Farrow path on TPU vs winsel (chained-slope).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp8_ratgrid_tpu.py
"""
import sys
import time

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import multirate_tpu as mr
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    log("device:", jax.devices()[0].device_kind)
    N = 1_000_000
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(N).astype(np.float32)
    x = jnp.asarray(x_np)
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)

    for rate, xx in ((0.4709, x),
                     (0.9173, jnp.asarray(
                         rng.standard_normal((64, N // 64))
                         .astype(np.float32)))):
        p = mr.make_kernel(ha, rate=rate, nphi=32, polyorder=4)
        st = mr.init_state(p, xx.shape[:-1], jnp.float32)
        log(f"rate={rate} shape={xx.shape} ratgrid_meta={p.ratgrid_meta}")
        # correctness first (cheap shapes)
        y_r, c_r, _ = mr.filt_block(p, mr.init_state(p, (), jnp.float32),
                                    jnp.asarray(x_np[:100_000]),
                                    path="ratgrid")
        y_w, c_w, _ = mr.filt_block(p, mr.init_state(p, (), jnp.float32),
                                    jnp.asarray(x_np[:100_000]),
                                    path="winsel")
        n = int(min(c_r, c_w))
        rms = float(np.sqrt(np.mean(
            (np.asarray(y_r)[:n].astype(np.float64)
             - np.asarray(y_w)[:n].astype(np.float64)) ** 2)))
        log(f"  ratgrid-vs-winsel rms={rms:.3e} over {n}")
        for path in ("ratgrid", "winsel"):
            try:
                sec = chained_seconds_per_call(p, st, xx, path,
                                               repeat=20, iters=4)
                log(f"  [{path}] {sec*1e3:.3f} ms -> "
                    f"{xx.size/sec/1e6:.0f} Msps in")
            except Exception as e:  # noqa: BLE001
                log(f"  [{path}] FAILED: {e}")


if __name__ == "__main__":
    main()
