"""Sharding overhead-structure benchmark on the virtual CPU mesh.

Real multi-chip hardware is unavailable here, so this does NOT measure
speedup — N virtual CPU devices share the same host cores. It measures the
OVERHEAD STRUCTURE of the sharded path: total wall time for a FIXED global
workload as the time-shard count grows. Ideal = flat (efficiency 1.0);
halo exchange, per-shard entry-state math, and ragged compaction show up
as efficiency < 1. Run as a subprocess from bench.py:

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m multirate_tpu.parallel.scaling_bench

Prints one JSON object on stdout.
"""

import json
import os
import sys
import time


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import multirate_tpu as mr
    from multirate_tpu.parallel.sharded import make_mesh, shard_filt_block

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)
    params = mr.make_kernel(h, rate=0.9173, nphi=32, polyorder=4)
    C, N = 8, 1 << 17
    x = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))

    results = {}
    for n_t in (1, 2, 4, 8):
        if n_t > n_dev:
            break
        mesh = make_mesh(1, n_t)
        state = mr.init_state(params, (C,), jnp.float32)

        def run():
            y, counts, _ = shard_filt_block(params, state, x, mesh)
            jax.block_until_ready((y, counts))

        run()  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        results[n_t] = float(np.median(ts))

    t1 = results.get(1)
    out = {
        "workload": "64ch-equiv farrow shard_filt_block, fixed global size",
        "n_devices": n_dev,
        "seconds_by_time_shards": results,
        "overhead_efficiency": {
            str(k): round(t1 / v, 3) for k, v in results.items()
        } if t1 else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
