"""TPU experiment 1: which in-kernel select/align primitives does Mosaic
support & how fast are they?

Tests, each as a tiny Pallas kernel (compile + correctness vs numpy):
  A. jnp.take_along_axis along the lane axis (per-row dynamic lane gather)
  B. per-row dynamic lane roll via 7 masked static rolls (known-supported)
  C. one-hot row-select matmul (B, 2RQ) @ (2RQ, 128) (known-supported)
  D. take_along_axis along sublanes (per-lane dynamic row gather)

Run ONE process at a time against the TPU. Results drive the design of the
fused arbitrary/Farrow window kernel (ops/pallas/select.py v2).
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, LANES = 256, 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_kernel(name, kernel, out_shape, *args, want=None):
    try:
        run = pl.pallas_call(kernel, out_shape=out_shape)
        out = np.asarray(jax.jit(run)(*args))
        if want is not None:
            ok = np.allclose(out, want, rtol=1e-6, atol=1e-6)
            log(f"{name}: COMPILED, correct={ok}")
            if not ok:
                log("   first rows got ", out.ravel()[:6], " want ",
                    np.asarray(want).ravel()[:6])
        else:
            log(f"{name}: COMPILED")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        log(f"{name}: FAILED -> {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, LANES)).astype(np.float32)
    lane = rng.integers(0, LANES, B).astype(np.int32)

    # ---- A: take_along_axis along lanes -------------------------------- #
    idx_full = (lane[:, None] + np.arange(LANES, dtype=np.int32)[None, :]) \
        % LANES

    def k_taa(a_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(a_ref[:], i_ref[:], axis=1)

    want = np.take_along_axis(A, idx_full, axis=1)
    try_kernel("A1 take_along_axis(lane, full width)", k_taa,
               jax.ShapeDtypeStruct((B, LANES), jnp.float32),
               A, idx_full, want=want)

    # narrow gather: 8 window elements per row
    idx8 = (lane[:, None] + np.arange(8, dtype=np.int32)[None, :]) % LANES

    def k_taa8(a_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(a_ref[:], i_ref[:], axis=1)

    want8 = np.take_along_axis(A, idx8, axis=1)
    try_kernel("A2 take_along_axis(lane, width 8)", k_taa8,
               jax.ShapeDtypeStruct((B, 8), jnp.float32),
               A, idx8, want=want8)

    # ---- B: per-row roll via 7 masked static rolls --------------------- #
    def k_bitroll(a_ref, l_ref, o_ref):
        Av = a_ref[:]
        lv = l_ref[:]                      # (B, LANES) broadcasted lane idx
        for b in range(7):
            amt = 1 << b
            cond = ((lv >> b) & 1) == 1
            Av = jnp.where(cond, pltpu.roll(Av, LANES - amt, axis=1), Av)
        o_ref[:] = Av

    lane_b = np.broadcast_to(lane[:, None], (B, LANES)).copy()
    want_roll = np.stack([np.roll(A[i], -int(lane[i])) for i in range(B)])
    try_kernel("B bit-roll(7 masked rolls)", k_bitroll,
               jax.ShapeDtypeStruct((B, LANES), jnp.float32),
               A, lane_b, want=want_roll)

    # ---- C: one-hot row select ----------------------------------------- #
    RQ2 = 16
    X = rng.standard_normal((RQ2, LANES)).astype(np.float32)
    row = rng.integers(0, RQ2, B).astype(np.int32)

    def k_onehot(x_ref, r_ref, o_ref):
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, RQ2), 1)
        oh = (rows_iota == r_ref[:]).astype(x_ref.dtype)
        o_ref[:] = jnp.dot(oh, x_ref[:],
                           preferred_element_type=jnp.float32)

    want_oh = X[row]
    try_kernel("C one-hot row select", k_onehot,
               jax.ShapeDtypeStruct((B, LANES), jnp.float32),
               X, np.broadcast_to(row[:, None], (B, RQ2)).copy(),
               want=want_oh)

    # ---- D: take_along_axis along sublanes ----------------------------- #
    ridx = np.broadcast_to(row[:, None], (B, LANES)).astype(np.int32)[:1]

    def k_taa_sub(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    want_sub = np.take_along_axis(X, ridx[:1], axis=0)
    try_kernel("D take_along_axis(sublane)", k_taa_sub,
               jax.ShapeDtypeStruct((1, LANES), jnp.float32),
               X, ridx, want=want_sub)

    log("device:", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
