"""Measure the gridsel kernel on TPU vs winsel/ratgrid (chained-slope).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp10_gridsel_tpu.py
"""
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

    cases = [
        ("arb 0.4709 1ch", dict(rate=0.4709, nphi=32), x,
         ("gridsel", "winsel")),
        ("farrow 0.4709 1ch", dict(rate=0.4709, nphi=32, polyorder=4), x,
         ("gridsel", "ratgrid")),
        ("arb 0.9173 64ch", dict(rate=0.9173, nphi=32),
         jnp.asarray(rng.standard_normal((64, N // 64)).astype(np.float32)),
         ("gridsel", "winsel")),
    ]
    for name, spec, xx, paths in cases:
        p = mr.make_kernel(ha, **spec)
        st = mr.init_state(p, xx.shape[:-1], jnp.float32)
        log(f"{name}: gridsel_meta={p.gridsel_meta}")
        # cheap correctness cross-check on-device
        y_a, c_a, _ = mr.filt_block(p, mr.init_state(p, (), jnp.float32),
                                    jnp.asarray(x_np[:100_000]),
                                    path=paths[0])
        y_b, c_b, _ = mr.filt_block(p, mr.init_state(p, (), jnp.float32),
                                    jnp.asarray(x_np[:100_000]),
                                    path="winsel")
        n = int(min(c_a, c_b))
        rms = float(np.sqrt(np.mean(
            (np.asarray(y_a)[:n].astype(np.float64)
             - np.asarray(y_b)[:n].astype(np.float64)) ** 2)))
        log(f"  {paths[0]}-vs-winsel rms={rms:.3e} over {n}")
        for path in paths:
            try:
                sec = chained_seconds_per_call(p, st, xx, path,
                                               repeat=20, iters=4)
                log(f"  [{path}] {sec*1e3:.3f} ms -> "
                    f"{xx.size/sec/1e6:.0f} Msps in")
            except Exception as e:  # noqa: BLE001
                log(f"  [{path}] FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
