"""Probe: does a MULTI-TILE grid hang the compiler? (round-1 JT=408 note,
exp2 hang at num_tiles=2 while all single-tile probes passed).

Variants: tiny overlap head (JT2=8) vs full-block overlap (JT2=JT).
"""

import sys
import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from multirate_tpu.ops.pallas.rational import build_k_matrix
    from multirate_tpu.ops.pallas.rational2 import (
        rational_supercycle_grouped, band_groups)
    from multirate_tpu.ops.compute import _supercycle_xla

    log("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    L, M, T, g = 147, 160, 24, 2
    pfb = rng.standard_normal((T, L)).astype(np.float32)
    k0 = build_k_matrix(pfb, L, M, phi0=1, origin=0, group=g)
    K = jnp.asarray(np.concatenate(
        [k0, np.zeros((M, k0.shape[1]), np.float32)], axis=0))
    groups = band_groups(T, L, M, g)

    n_rows = 256                       # 4 tiles at JT=64
    x = jnp.asarray(rng.standard_normal(g * M * n_rows + T)
                    .astype(np.float32))
    n_out = n_rows * g * L
    want = np.asarray(_supercycle_xla(x, K, g * L, g * M, n_out))

    log("P6 multi-tile JT=64 (4 tiles), tiny head...")
    got = np.asarray(rational_supercycle_grouped(
        x, K, g * L, g * M, n_out, groups, JT=64))
    log("P6 ok maxerr=", np.abs(got - want).max())


if __name__ == "__main__":
    main()
