"""Sharding overhead-structure benchmark on the virtual CPU mesh.

Real multi-chip hardware is unavailable here, so absolute multi-chip
speedup is NOT measurable — N virtual CPU devices share one host's cores.
What IS soundly measurable is the *overhead structure* of the sharded
step: how much extra total work the halo exchange, per-shard closed-form
entry state, and shard_map wrapping add over running the same kernel on
the same per-shard blocks unsharded. That overhead is what determines
scaling efficiency on real ICI-connected chips (the per-shard compute is
identical hardware-for-hardware; only the added work/communication eats
the >=80% BASELINE target).

Round-4 root-cause of the round-3 "1.66x at n_t=2" spike (exp29):

1. The per-shard block was NOT a multiple of the input stride M, so every
   shard k>=1 entered mid-phase and paid the in-graph banded-K scatter
   (ops/compute.py::_build_k_in_graph) that the unsharded fresh-state
   baseline never pays. DESIGN RULE (now documented in parallel/sharded.py):
   pick per-shard blocks in multiples of M — the closed-form entry state
   then lands on the fresh phase and `_select_k`'s cond takes the
   precomputed-K branch on every shard. B here is 65600 = 410*160.
2. Non-interleaved measurement: sharded and unsharded medians were taken
   minutes apart on a 4-core host whose background load drifts; ratios of
   non-simultaneous medians swung +-0.2. Rounds are now interleaved
   (one unsharded + one of each shard count per round) so drift cancels.

With both fixes the shipped step measures 0.94-1.08x across n_t in
{1,2,4,8} (<= the 1.1 bar; standalone round-4 rerun: max 1.088). NOTE:
bench.py runs this OVERLAPPED with the TPU sweep to fit its wall budget
— the TPU process's host-side threads contend for the 4 cores and can
inflate the recorded max by ~0.03-0.05 (BENCH_r04 sidecar shows 1.124
in-bench vs 1.088 standalone, same commit); compare against the
artifact_floor row before reading a regression into the in-bench
figure. The decomposition (exp29_scaling_decomp)
attributes the residual: a bare shard_map "floor" with no halo and fresh
state already costs ~0.90-0.96x (8 spin-waiting XLA device threads on 4
cores inflate process CPU — a virtual-mesh artifact, also the reason
ratios can dip below 1), the halo ppermute adds ~+0.06, and the
closed-form entry-state math ~+0.05. The ``artifact_floor`` row makes
that denominator visible in the sidecar.

Methodology notes (round-3 rewrite, kept):

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


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import PartitionSpec as P

    import multirate_tpu as mr
    from multirate_tpu.ops.compute import filt_block_raw
    from multirate_tpu.ops.params import FilterState
    from multirate_tpu.parallel.sharded import make_mesh, shard_filt_block

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=Fraction(147, 160))
    PATH = "supercycle"  # pinned: identical kernel at every shard count
    # B % M == 0 (65600 = 410*160): every shard's closed-form entry state
    # is the fresh phase, so no shard pays the in-graph K scatter (the
    # round-3 1.66x spike; see module docstring + exp29)
    C, B = 8, 65600

    shard_counts = [n for n in (1, 2, 4, 8) if n <= n_dev]

    # ---- build + compile everything before any timing ----------------- #
    x1 = jnp.asarray(rng.standard_normal((C, B)).astype(np.float32))
    st = mr.init_state(params, (C,), jnp.float32)
    step1 = jax.jit(lambda s, xx: mr.filt_block(params, s, xx, path=PATH))
    jax.block_until_ready(step1(st, x1)[:2])

    def floor_fn(n_t):
        """Bare shard_map around the kernel: zero halo, fresh state — the
        minimum possible sharded cost on this mesh (artifact floor)."""
        mesh = make_mesh(1, n_t)

        def stepk(hist0, x_blk):
            s = FilterState(history=jnp.zeros_like(hist0),
                            phase=jnp.asarray(1, jnp.int64),
                            deficit=jnp.asarray(1, jnp.int64))
            y, cnt, _ = filt_block_raw(params, s, x_blk, PATH)
            return y[:, None, :], cnt.reshape(1)

        fn = jax.shard_map(stepk, mesh=mesh,
                           in_specs=(P("ch", None), P("ch", "t")),
                           out_specs=(P("ch", "t", None), P("t")))
        return jax.jit(lambda s, xx: fn(s.history, xx))

    weak_runs, floor_runs, xw = {}, {}, {}
    for n_t in shard_counts:
        mesh = make_mesh(1, n_t)
        xw[n_t] = jnp.asarray(
            rng.standard_normal((C, n_t * B)).astype(np.float32))
        f = jax.jit(lambda s, xx, _m=mesh: shard_filt_block(
            params, s, xx, _m, path=PATH))
        jax.block_until_ready(f(st, xw[n_t])[:2])
        weak_runs[n_t] = f
        g = floor_fn(n_t)
        jax.block_until_ready(g(st, xw[n_t]))
        floor_runs[n_t] = g

    def cpu_wall(fn, *a):
        t0, c0 = time.perf_counter(), time.process_time()
        jax.block_until_ready(fn(*a))
        return time.perf_counter() - t0, time.process_time() - c0

    # ---- weak scaling: interleaved rounds (drift cancels) ------------- #
    R = 12
    un_c, un_w = [], []
    wc = {n: [] for n in shard_counts}
    ww = {n: [] for n in shard_counts}
    fc = {n: [] for n in shard_counts}
    for _ in range(R):
        w, c = cpu_wall(step1, st, x1)
        un_w.append(w)
        un_c.append(c)
        for n_t in shard_counts:
            w, c = cpu_wall(weak_runs[n_t], st, xw[n_t])
            ww[n_t].append(w)
            wc[n_t].append(c)
            _, c = cpu_wall(floor_runs[n_t], st, xw[n_t])
            fc[n_t].append(c)

    c_un = float(np.median(un_c))
    w_un = float(np.median(un_w))
    overhead = {str(n): round(float(np.median(wc[n])) / (n * c_un), 3)
                for n in shard_counts}
    floor = {str(n): round(float(np.median(fc[n])) / (n * c_un), 3)
             for n in shard_counts}
    weak_wall = {str(n): float(np.median(ww[n])) for n in shard_counts}
    weak_cpu = {str(n): float(np.median(wc[n])) for n in shard_counts}

    # ---- strong scaling: fixed global size ----------------------------- #
    # Wall-clock strong scaling is UNMEASURABLE on this virtual mesh: all
    # N "devices" are one XLA CPU client sharing one intra-op thread pool
    # on the host's cores, so the n_t=1 baseline already uses every core —
    # sharding cannot make the wall move (BENCH_r04 measured {2: 0.995,
    # 4: 1.347, 8: 1.125}: noise around 1). What IS sound is the strong
    # WORK ratio: process-CPU total of the sharded fixed-size problem over
    # the unsharded same-size run. On real chips each shard's compute runs
    # on its own chip, so projected strong efficiency = 1/work_ratio minus
    # an ICI-latency term this host cannot measure (the halo payload is
    # (h_min-1)*4 bytes/boundary — microseconds on ICI).
    N_g = max(shard_counts) * B          # per-shard work at n=8 is one
    xg = jnp.asarray(                    # full weak-scaling block: compute
        rng.standard_normal((C, N_g)).astype(np.float32))  # >> dispatch
    stg = mr.init_state(params, (C,), jnp.float32)
    step_g = jax.jit(lambda s, xx: mr.filt_block(params, s, xx, path=PATH))
    jax.block_until_ready(step_g(stg, xg)[:2])
    strong_runs = {}
    for n_t in shard_counts:
        mesh = make_mesh(1, n_t)
        f = jax.jit(lambda s, xx, _m=mesh: shard_filt_block(
            params, s, xx, _m, path=PATH))
        jax.block_until_ready(f(st, xg)[:2])
        strong_runs[n_t] = f
    sw = {n: [] for n in shard_counts}
    sc = {n: [] for n in shard_counts}
    un_g_c, un_g_w = [], []
    for _ in range(9):
        w, c = cpu_wall(step_g, stg, xg)
        un_g_w.append(w)
        un_g_c.append(c)
        for n_t in shard_counts:
            w, c = cpu_wall(strong_runs[n_t], st, xg)
            sw[n_t].append(w)
            sc[n_t].append(c)
    strong_wall = {str(n): float(np.median(sw[n])) for n in shard_counts}
    c_un_g = float(np.median(un_g_c))
    strong_work = {str(n): round(float(np.median(sc[n])) / c_un_g, 3)
                   for n in shard_counts}
    # ratios dip below 1 when the virtual-mesh spin-floor biases the
    # denominator (see artifact_floor_ratio); clamp the projection — a
    # sharded run cannot beat 100% per-chip efficiency on real hardware
    strong_eff = {k: round(min(1.0, 1.0 / v), 3)
                  for k, v in strong_work.items()}

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
                     f"per-shard block B={B} (multiple of M=160: fresh "
                     f"entry phase on every shard — see module docstring)"),
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
        # bare shard_map + same kernel, no halo, fresh state: the
        # virtual-mesh artifact denominator (spin-waiting device threads).
        # (overhead - floor) is the real added work of halo + entry state.
        "artifact_floor_ratio": floor,
        "strong_wall_seconds": strong_wall,
        # shared-core wall speedup: sanity/monotonicity only, NOT a
        # multi-chip scaling claim (all virtual devices share host cores)
        "strong_wall_speedup_shared_cores": speedup,
        # fixed-global-size process-CPU ratio sharded/unsharded — the
        # sound strong-scaling figure on this host (see strong_
        # scaling_note): real-chip projected efficiency = 1/ratio.
        "strong_work_overhead_ratio": strong_work,
        "strong_projected_efficiency": strong_eff,
        "strong_scaling_note": (
            "Wall-clock strong scaling is unmeasurable on a virtual CPU "
            "mesh: all devices are one XLA CPU client sharing one "
            "intra-op thread pool, so the n=1 baseline already uses "
            "every physical core and sharding cannot move the wall "
            "(strong_wall_speedup_shared_cores is noise around 1 by "
            "construction). strong_work_overhead_ratio is the sound "
            "figure: total process-CPU of the sharded fixed-size "
            "problem over the unsharded same-size run — on real chips "
            "each shard computes on its own chip, so projected strong "
            "efficiency = 1/ratio minus ICI latency for the "
            "(h_min-1)*4-byte halo per boundary (microseconds)."),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
