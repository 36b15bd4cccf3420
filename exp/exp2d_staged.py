"""Staged hang bisection. Step 0 is a trivial jit — if IT hangs, the relay
is wedged and nothing else is meaningful. Each step flushes before running."""

import sys
import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("devices...")
    log("device:", jax.devices()[0].device_kind)

    log("S0 trivial jit...")
    v = float(jax.jit(lambda a: (a + 1).sum())(jnp.ones(8)))
    log("S0 ok", v)

    import multirate_tpu as mr
    from multirate_tpu.ops import compute as comp
    from fractions import Fraction

    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=Fraction(147, 160))
    state = mr.init_state(params, (), jnp.float32)

    log("S1 eager K cond (select_k)...")
    K = comp._select_k(params, state.phase, state.deficit, jnp.float32)
    log("S1 ok", K.shape)

    log("S2 grouped-path K cond (phi-only build)...")
    from jax import lax
    anchor = ((state.phase + state.deficit) * 0).astype(jnp.float32)
    K2 = lax.cond(
        state.phase == 1,
        lambda: params.k_super.astype(jnp.float32) + anchor,
        lambda: comp._build_k_in_graph(params, state.phase,
                                       jnp.asarray(1, jnp.int64),
                                       jnp.float32))
    log("S2 ok", K2.shape)

    x = jax.random.normal(jax.random.key(0), (200_000,), jnp.float32)

    log("S3 shift cond...")
    xs = lax.cond(state.deficit == 1, lambda: x,
                  lambda: comp._shift_origin(x, state.deficit, 162))
    log("S3 ok", xs.shape)

    log("S4 grouped kernel multi-tile eager (200k, num_tiles=2)...")
    from multirate_tpu.ops.pallas.rational2 import (
        rational_supercycle_grouped, band_groups)
    groups = band_groups(24, 147, 160, 2)
    y = rational_supercycle_grouped(x, K2, 294, 320, 183_937, groups)
    log("S4 ok", y.shape, float(y[0]))

    log("S5 full filt_block_raw pallas eager...")
    y5 = comp.filt_block_raw(params, state, x, "pallas")[0]
    log("S5 ok", float(y5[0]))

    log("S6 jit filt_block pallas...")
    y6 = mr.filt_block(params, state, x, path="pallas")[0]
    log("S6 ok", float(y6[0]))
    log("all staged probes ok")


if __name__ == "__main__":
    main()
