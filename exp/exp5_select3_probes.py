"""TPU compile probes for the select3 kernel primitives:
  A. in-kernel dynamic_slice of a VALUE at a dynamic sublane start
  B. scalar element read from a VMEM ref (idx[i, k])
  C. pltpu.bitcast int32 -> float32
  D. index_map computing (j * P) >> SH in int32
  E. pl.ds on a ref with dynamic sublane start
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_run(name, fn):
    try:
        out = fn()
        log(f"{name}: OK", np.asarray(out).ravel()[:4])
        return True
    except Exception as e:
        log(f"{name}: FAILED -> {type(e).__name__}: {str(e)[:160]}")
        return False


def main():
    log("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((64, 128)).astype(np.float32)
    RB = np.asarray([[3, 17]], np.int32)          # (1, 2) rebased rows
    RB8 = np.broadcast_to(RB, (8, 2)).copy()

    # A: dynamic_slice of a value
    def k_dynslice(x_ref, rb_ref, o_ref):
        xv = x_ref[:]                              # (64, 128) value
        rb = rb_ref[0, 0]
        xs = jax.lax.dynamic_slice(xv, (rb, jnp.int32(0)), (16, 128))
        o_ref[:] = xs

    want = X[3:19]
    try_run("A dynslice(value, dyn sublane)", lambda: pl.pallas_call(
        k_dynslice,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(X, RB8))

    # B: scalar read from VMEM ref + use as slice base via pl.ds on ref
    def k_plds(x_ref, rb_ref, o_ref):
        rb = rb_ref[0, 1]
        o_ref[:] = x_ref[pl.ds(rb, 16), :]

    try_run("E pl.ds(ref, dyn sublane)", lambda: pl.pallas_call(
        k_plds,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(X, RB8))

    # C: bitcast int32 -> f32
    fbits = np.float32(1.2345).view(np.int32)
    IB = np.full((8, 128), fbits, np.int32)

    def k_bitcast(i_ref, o_ref):
        o_ref[:] = pltpu.bitcast(i_ref[:], jnp.float32)

    try_run("C pltpu.bitcast i32->f32", lambda: pl.pallas_call(
        k_bitcast,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(IB))

    # D: affine-shift index map (j * P) >> SH
    P, SH = 1234567, 20
    X2 = rng.standard_normal((64 * 8, 128)).astype(np.float32)

    def k_copy(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def run_d():
        return pl.pallas_call(
            k_copy,
            out_shape=jax.ShapeDtypeStruct((4 * 8, 128), jnp.float32),
            grid=(4,),
            in_specs=[pl.BlockSpec(
                (8, 128),
                lambda j: (jax.lax.shift_right_logical(
                    j * jnp.int32(P), jnp.int32(SH)) + j * 0, j * 0))],
            out_specs=pl.BlockSpec((8, 128), lambda j: (j, j * 0)),
        )(X2)

    try_run("D index_map (j*P)>>SH", run_d)


if __name__ == "__main__":
    main()
