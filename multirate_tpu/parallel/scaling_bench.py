"""Sharding overhead-structure benchmark on the virtual CPU mesh.

Real multi-chip hardware is unavailable here, so absolute multi-chip
speedup is NOT measurable — N virtual CPU devices share one host's cores.
What IS soundly measurable is the *overhead structure* of the sharded
step: how much extra total work the halo exchange, per-shard closed-form
entry state, and shard_map wrapping add over running the same kernel on
the same per-shard blocks unsharded. That overhead is what determines
scaling efficiency on real ICI-connected chips (the per-shard compute is
identical hardware-for-hardware; only the added work/communication eats
the ≥80% BASELINE target).

Methodology (round-3 rewrite; the round-2 version compared different
kernel code paths at different working-set sizes and reported a
physically impossible 30x "speedup" — it measured gather-matrix memory
pressure, not sharding):

- ONE kernel path for every measurement: ``supercycle`` (pure XLA, runs
  identically under shard_map and unsharded, no auto-path switching).
- Weak scaling: per-shard block B is FIXED; global size grows as n_t*B.
  ``work_overhead_ratio[n]`` = cpu_total(sharded, n shards) /
  (n * cpu_total(unsharded, one B-block)) — process CPU time sums over
  all threads, so core contention cancels and pure added work remains.
  1.0 = sharding adds no work; the BASELINE bar is <= 1.1.
- Strong scaling: global size fixed at 8*B; wall time vs n_t on the
  shared-core mesh (upper-bounds nothing about real chips; reported for
  the monotonicity sanity check only).
- Superlinear artifacts are asserted away: wall_speedup[n] <= 1.05 * n.

Run as a subprocess from bench.py:

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m multirate_tpu.parallel.scaling_bench

Prints one JSON object on stdout.
"""

import json
import time
from fractions import Fraction


def _measure(fn, repeats=9):
    """(median wall seconds, median process-CPU seconds) of fn()."""
    import numpy as np

    fn()  # compile / warm
    ws, cs = [], []
    for _ in range(repeats):
        t0, c0 = time.perf_counter(), time.process_time()
        fn()
        ws.append(time.perf_counter() - t0)
        cs.append(time.process_time() - c0)
    return float(np.median(ws)), float(np.median(cs))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import multirate_tpu as mr
    from multirate_tpu.parallel.sharded import make_mesh, shard_filt_block

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=Fraction(147, 160))
    PATH = "supercycle"  # pinned: identical kernel at every shard count
    C, B = 8, 1 << 16    # channels, per-shard block (>= h_min, mult of 160)

    # ---- unsharded reference: the same kernel on one B-block ---------- #
    x1 = jnp.asarray(rng.standard_normal((C, B)).astype(np.float32))
    st1 = mr.init_state(params, (C,), jnp.float32)
    step1 = jax.jit(lambda s, xx: mr.filt_block(params, s, xx, path=PATH))

    def run_unsharded():
        y, cnt, _ = step1(st1, x1)
        jax.block_until_ready((y, cnt))

    w_un, c_un = _measure(run_unsharded)

    shard_counts = [n for n in (1, 2, 4, 8) if n <= n_dev]

    # ---- weak scaling: fixed per-shard block ---------------------------- #
    weak_wall, weak_cpu, overhead = {}, {}, {}
    for n_t in shard_counts:
        mesh = make_mesh(1, n_t)
        x = jnp.asarray(
            rng.standard_normal((C, n_t * B)).astype(np.float32))
        state = mr.init_state(params, (C,), jnp.float32)
        step = jax.jit(lambda s, xx, _m=mesh: shard_filt_block(
            params, s, xx, _m, path=PATH))

        def run():
            y, counts, _ = step(state, x)
            jax.block_until_ready((y, counts))

        w, c = _measure(run)
        weak_wall[str(n_t)] = w
        weak_cpu[str(n_t)] = c
        # total added work per shard vs the unsharded same-size block
        overhead[str(n_t)] = round(c / (n_t * c_un), 3)

    # ---- strong scaling: fixed global size ------------------------------ #
    N_g = max(shard_counts) * B
    xg = jnp.asarray(rng.standard_normal((C, N_g)).astype(np.float32))
    strong_wall = {}
    for n_t in shard_counts:
        mesh = make_mesh(1, n_t)
        state = mr.init_state(params, (C,), jnp.float32)
        step = jax.jit(lambda s, xx, _m=mesh: shard_filt_block(
            params, s, xx, _m, path=PATH))

        def run():
            y, counts, _ = step(state, xg)
            jax.block_until_ready((y, counts))

        w, _ = _measure(run)
        strong_wall[str(n_t)] = w

    t1 = strong_wall.get("1")
    speedup = ({k: round(t1 / v, 3) for k, v in strong_wall.items()}
               if t1 else None)
    # shared-core sanity: a sound harness can never report superlinear
    # scaling on a virtual mesh
    if speedup:
        for k, s in speedup.items():
            assert s <= 1.05 * int(k), (
                f"superlinear artifact at n_t={k}: {s}x — harness unsound")

    out = {
        "workload": (f"rational 147//160, C={C}, path={PATH} pinned, "
                     f"per-shard block B={B}"),
        "n_devices": n_dev,
        "kernel_path": PATH,
        "unsharded_block_seconds": {"wall": w_un, "cpu": c_un},
        "weak_wall_seconds": weak_wall,
        "weak_cpu_seconds": weak_cpu,
        # total-work ratio, sharded/(n * unsharded same-block): halo
        # exchange + per-shard entry state + shard_map wrapping. 1.0 = no
        # added work; BASELINE's >=80% multi-host efficiency needs <= ~1.1
        # here plus an ICI-latency term this host cannot measure.
        "work_overhead_ratio": overhead,
        "work_overhead_ratio_max": max(overhead.values()),
        "strong_wall_seconds": strong_wall,
        # shared-core wall speedup: sanity/monotonicity only, NOT a
        # multi-chip scaling claim (all virtual devices share host cores)
        "strong_wall_speedup_shared_cores": speedup,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
