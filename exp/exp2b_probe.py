"""Bisect the v2 grouped-kernel compile hang: incremental probes, each
printed+flushed, so the hang point is identifiable. ONE TPU process."""

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

    log("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    L, M, T, g = 147, 160, 24, 2
    pfb = rng.standard_normal((T, L)).astype(np.float32)
    k0 = build_k_matrix(pfb, L, M, phi0=1, origin=0, group=g)
    K = jnp.asarray(np.concatenate(
        [k0, np.zeros((M, k0.shape[1]), np.float32)], axis=0))
    groups = band_groups(T, L, M, g)
    log("groups:", groups)

    def ref(x, n_out):
        from multirate_tpu.ops.compute import _supercycle_xla
        return np.asarray(_supercycle_xla(x, K, g * L, g * M, n_out))

    # P1: single group, b8=0 (no rolls), tiny JT
    x = jnp.asarray(rng.standard_normal(g * M * 64 + T).astype(np.float32))
    n_out = 64 * g * L
    for name, gsel, JT in [
        ("P1 no-roll g0 JT=64", groups[:1], 64),
        ("P2 lane-roll g1 JT=64", groups[1:2], 64),
        ("P3 crossing g2 JT=64", groups[2:3], 64),
        ("P4 all groups JT=64", groups, 64),
        ("P5 all groups JT=416", groups, 416),
    ]:
        got = np.asarray(rational_supercycle_grouped(
            x, K, g * L, g * M, n_out, gsel, JT=JT))
        want = ref(x, n_out)
        # partial group sets only fill their columns
        errs = []
        for (c0, c1, _, _) in gsel:
            gotc = got.reshape(-1, g * L)[:, c0:c1]
            wantc = want.reshape(-1, g * L)[:, c0:c1]
            errs.append(np.abs(gotc - wantc).max())
        log(f"{name}: maxerr={max(errs):.2e}")
    log("all probes ok")


if __name__ == "__main__":
    main()
