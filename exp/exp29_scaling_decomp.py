"""Decompose the weak-scaling work-overhead ratio (VERDICT r3 item 4).

Measures, on the 8-device virtual CPU mesh, per-shard-count CPU-work
ratios of four variants against the same unsharded B-block:

  full    — shard_filt_block as shipped (halo ppermute + closed-form
            entry state + K-build cond)
  nohalo  — halo replaced by zeros (no ppermute)
  fresh   — halo + pinned fresh entry state (no entry math, no K build)
  floor   — bare shard_map around the kernel with zero halo and fresh
            state: the minimum any sharded run can cost on this mesh.
            Ratio(floor) is the VIRTUAL-MESH ARTIFACT (8 spin-waiting
            XLA device threads on 4 cores inflate process CPU time);
            real added work is ratio(variant) - ratio(floor).

Run:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo:/root/.axon_site python exp/exp29_scaling_decomp.py
"""

import json
import time
from fractions import Fraction
from functools import partial

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    import multirate_tpu as mr
    from multirate_tpu.ops import indexing as idx
    from multirate_tpu.ops.compute import filt_block_raw
    from multirate_tpu.ops.params import FilterState
    from multirate_tpu.parallel.sharded import (
        make_mesh, shard_filt_block, _entry_state)

    rng = np.random.default_rng(0)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=Fraction(147, 160))
    PATH = "supercycle"
    C, B = 8, 65600  # B % M == 0: every shard enters at the fresh phase

    H = params.history_len

    def variant_step(kind, n_t, nblk):
        n_max = idx.max_outputs(params, nblk)

        def step(hist0, phase0, deficit0, x_blk):
            k = lax.axis_index("t")
            if kind in ("full", "fresh"):
                tail = x_blk[:, nblk - min(H, nblk):]
                halo = lax.ppermute(tail, "t",
                                    [(i, i + 1) for i in range(n_t - 1)])
                if halo.shape[-1] < H:
                    halo = jnp.pad(halo, [(0, 0), (H - halo.shape[-1], 0)])
                hist = jnp.where(k == 0, hist0, halo)
            else:
                hist = jnp.zeros_like(hist0)
            if kind == "full":
                start = k.astype(jnp.int64) * nblk
                phi_k, d_k = _entry_state(params, phase0[0], deficit0[0],
                                          start)
            else:
                phi_k = jnp.asarray(1, jnp.int64)
                d_k = jnp.asarray(1, jnp.int64)
            st = FilterState(history=hist.astype(x_blk.dtype), phase=phi_k,
                             deficit=d_k)
            y, cnt, _ = filt_block_raw(params, st, x_blk, PATH)
            return y[:, None, :], cnt.reshape(1)
        return step

    def build(kind, n_t):
        mesh = make_mesh(1, n_t)
        nblk = B
        if kind == "ship":
            def run(state, x):
                return shard_filt_block(params, state, x, mesh, path=PATH)
            return jax.jit(run)
        step = variant_step(kind, n_t, nblk)
        fn = jax.shard_map(step, mesh=mesh,
                           in_specs=(P("ch", None), P(), P(), P("ch", "t")),
                           out_specs=(P("ch", "t", None), P("t")))

        def run(state, x):
            return fn(state.history, state.phase.reshape(1),
                      state.deficit.reshape(1), x)
        return jax.jit(run)

    VARIANTS = ("ship", "full", "fresh", "floor")
    counts = (1, 2, 4, 8)

    # build everything first (compile outside the timed region)
    st1 = mr.init_state(params, (C,), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((C, B)).astype(np.float32))
    step1 = jax.jit(lambda s, xx: mr.filt_block(params, s, xx, path=PATH))
    jax.block_until_ready(step1(st1, x1))

    runs = {}
    xs = {}
    for n_t in counts:
        xs[n_t] = jnp.asarray(
            rng.standard_normal((C, n_t * B)).astype(np.float32))
        for v in VARIANTS:
            f = build(v, n_t)
            jax.block_until_ready(f(st1, xs[n_t]))
            runs[(v, n_t)] = f

    def cpu_once(fn, *a):
        c0 = time.process_time()
        jax.block_until_ready(fn(*a))
        return time.process_time() - c0

    R = 12
    un = []
    samples = {k: [] for k in runs}
    for _ in range(R):  # interleaved rounds cancel machine drift
        un.append(cpu_once(step1, st1, x1))
        for key, f in runs.items():
            samples[key].append(cpu_once(f, st1, xs[key[1]]))

    c_un = float(np.median(un))
    out = {"unsharded_cpu": c_un, "B": B, "C": C}
    for v in VARIANTS:
        out[v] = {str(n): round(float(np.median(samples[(v, n)]))
                                / (n * c_un), 3) for n in counts}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
