"""Sharding overhead-structure benchmark on the virtual CPU mesh.

Real multi-chip hardware is unavailable here, so absolute speedup is not
measurable — N virtual CPU devices share the same host cores. Two
metrics for a FIXED global workload as the time-shard count grows:

- ``wall_speedup``: t1/tn wall clock on the jitted step (upper-bounds
  the clean-split parallel gain the shared cores can express).
- ``overhead_efficiency``: cpu1/cpun TOTAL process CPU time — the
  overhead-structure number. Halo exchange, per-shard entry-state math,
  and ragged compaction all add work, pushing it below 1; >= 1 means
  sharding adds no net work.

Run as a subprocess from bench.py:

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
    cpu_results = {}
    for n_t in (1, 2, 4, 8):
        if n_t > n_dev:
            break
        mesh = make_mesh(1, n_t)
        state = mr.init_state(params, (C,), jnp.float32)
        # jit the step as every real deployment does (__graft_entry__,
        # StreamingResampler): un-jitted eager dispatch would measure
        # per-call tracing, not the sharded execution overhead
        step = jax.jit(lambda s, xx, _m=mesh: shard_filt_block(
            params, s, xx, _m))

        def run():
            y, counts, _ = step(state, x)
            jax.block_until_ready((y, counts))

        run()  # compile
        ts, cs = [], []
        for _ in range(5):
            t0, c0 = time.perf_counter(), time.process_time()
            run()
            ts.append(time.perf_counter() - t0)
            cs.append(time.process_time() - c0)
        results[n_t] = float(np.median(ts))
        cpu_results[n_t] = float(np.median(cs))

    t1, c1 = results.get(1), cpu_results.get(1)
    out = {
        "workload": "64ch-equiv farrow shard_filt_block, fixed global size",
        "n_devices": n_dev,
        "seconds_by_time_shards": results,
        "cpu_seconds_by_time_shards": cpu_results,
        # wall speedup on the shared-core virtual mesh (upper-bounds real
        # parallel gain; >1 means sharding splits the work cleanly)
        "wall_speedup": {
            str(k): round(t1 / v, 3) for k, v in results.items()
        } if t1 else None,
        # total-work efficiency: cpu_1 / cpu_n across all threads — the
        # honest overhead-structure number (halo exchange, per-shard
        # entry state, ragged compaction all show up as extra work)
        "overhead_efficiency": {
            str(k): round(c1 / v, 3) for k, v in cpu_results.items()
        } if c1 else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
