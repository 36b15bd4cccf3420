"""Bisect the interp-4//1 zc kernel's DMA-structure cost (ROADMAP r5
item 9: 'nobody' ablation showed the kernel is pure-DMA-bound at ~260
GB/s apparent vs the 618 GB/s a simple expand sustains).

Bare pallas kernels with interp-SHAPED operand streams, added one at a
time, all interleaved in one process:

  A: in (JT, 256) -> out (JT, 1024)            (the 1:4 expand core)
  B: A + second input row-block (history rows)
  C: B + constant-index K-slab operand (1, U, GC) bf16 x2
  D: C with out written as (8*JT, 128) blocks  (lane-quantum reshape)
  E: A with out (8*JT, 128)

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp54_interp_dma.py
"""
import time
from functools import partial

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from multirate_tpu.utils.metrics import chained_fn_seconds

    log("device:", jax.devices()[0].device_kind)
    JT, GM, GL = 384, 256, 1024
    N = 8_000_000
    R = N // GM            # stream rows
    T = R // JT            # tiles
    U, GC = 296, 1024      # interp-ish K slab
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, GM)).astype(np.float32))
    kh = jnp.asarray(rng.standard_normal((4, U, GC)).astype(np.float32)
                     .astype(jnp.bfloat16))

    def bytes_gbps(sec, nbytes):
        return nbytes / sec / 1e9

    def kern_a(xa, o_ref):
        v = xa[...]
        o_ref[:, :] = jnp.concatenate([v] * 4, axis=1)

    def run_a(xv):
        return pl.pallas_call(
            kern_a,
            out_shape=jax.ShapeDtypeStruct((T * JT, GL), jnp.float32),
            grid=(T,),
            in_specs=[pl.BlockSpec((JT, GM), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((JT, GL), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xv)

    def kern_b(xa, xh, o_ref):
        v = xa[...] + xh[0:1, :]
        o_ref[:, :] = jnp.concatenate([v] * 4, axis=1)

    def run_b(xv):
        return pl.pallas_call(
            kern_b,
            out_shape=jax.ShapeDtypeStruct((T * JT, GL), jnp.float32),
            grid=(T,),
            in_specs=[pl.BlockSpec((JT, GM), lambda j: (j, j * 0)),
                      pl.BlockSpec((32, GM),
                                   lambda j: (jnp.maximum(
                                       j * (JT // 32) - 1, j * 0), j * 0))],
            out_specs=pl.BlockSpec((JT, GL), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xv, xv)

    def kern_c(xa, xh, k0, k1, o_ref):
        v = xa[...] + xh[0:1, :] + k0[0, 0:1, :GM].astype(jnp.float32)
        o_ref[:, :] = jnp.concatenate([v] * 4, axis=1)

    def run_c(xv, kv):
        kspec = pl.BlockSpec((1, U, GC), lambda j: (j * 0, j * 0, j * 0))
        return pl.pallas_call(
            kern_c,
            out_shape=jax.ShapeDtypeStruct((T * JT, GL), jnp.float32),
            grid=(T,),
            in_specs=[pl.BlockSpec((JT, GM), lambda j: (j, j * 0)),
                      pl.BlockSpec((32, GM),
                                   lambda j: (jnp.maximum(
                                       j * (JT // 32) - 1, j * 0), j * 0)),
                      kspec, kspec],
            out_specs=pl.BlockSpec((JT, GL), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xv, xv, kv, kv)

    def kern_e(xa, o_ref):
        v = xa[...]
        w = jnp.concatenate([v] * 4, axis=1)
        o_ref[:, :] = w.reshape(8 * JT, GM // 2)

    def run_e(xv):
        return pl.pallas_call(
            kern_e,
            out_shape=jax.ShapeDtypeStruct((T * JT * 8, GM // 2),
                                           jnp.float32),
            grid=(T,),
            in_specs=[pl.BlockSpec((JT, GM), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((8 * JT, GM // 2), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xv)

    useful = (N + 4 * N) * 4
    for rnd in range(2):
        sa = chained_fn_seconds(run_a, x)
        log(f"A  in(384,256)->out(384,1024): {sa*1e3:.3f} ms "
            f"{bytes_gbps(sa, useful):.0f} GB/s")
        sb = chained_fn_seconds(run_b, x)
        log(f"B  + hist rows:               {sb*1e3:.3f} ms "
            f"{bytes_gbps(sb, useful):.0f} GB/s")
        sc = chained_fn_seconds(lambda xv, kv: run_c(xv, kv), x, kh)
        log(f"C  + 2x const K slab:         {sc*1e3:.3f} ms "
            f"{bytes_gbps(sc, useful):.0f} GB/s")
        se = chained_fn_seconds(run_e, x)
        log(f"E  out as (3072,128):         {se*1e3:.3f} ms "
            f"{bytes_gbps(se, useful):.0f} GB/s")


if __name__ == "__main__":
    main()


def variant_f():
    """F: out as 3D (JT, 8, 128) blocks, per-chunk [:, k, :] stores —
    the form the zc kernels' chunked group stores map onto."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from multirate_tpu.utils.metrics import chained_fn_seconds

    JT, GM, GL = 384, 256, 1024
    N = 8_000_000
    R = N // GM
    T = R // JT
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, GM)).astype(np.float32))

    def kern_f(xa, o_ref):
        v = xa[...]
        for k in range(8):
            o_ref[:, k, :] = v[:, (k % 2) * 128:(k % 2) * 128 + 128]

    def run_f(xv):
        return pl.pallas_call(
            kern_f,
            out_shape=jax.ShapeDtypeStruct((T * JT, 8, 128), jnp.float32),
            grid=(T,),
            in_specs=[pl.BlockSpec((JT, GM), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((JT, 8, 128),
                                   lambda j: (j, j * 0, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xv)

    useful = (N + 4 * N) * 4
    for rnd in range(2):
        sf = chained_fn_seconds(run_f, x)
        log(f"F  out 3D (JT,8,128) chunk stores: {sf*1e3:.3f} ms "
            f"{useful/sf/1e9:.0f} GB/s")


def variant_g():
    """G/H: read-side lane-width isolation. G: wide-lane IN (384, 1024)
    -> narrow OUT; H: narrow-lane IN (3072, 128) -> narrow OUT. Same
    flat bytes both ways (1:1 copy)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from multirate_tpu.utils.metrics import chained_fn_seconds

    # in+out must exceed the 128 MB VMEM or the probe reads TB/s
    # artifacts (round-3 finding 1; bit THIS script's first G/H run)
    N = 32_000_000
    JT = 384
    T = N // (JT * 1024)
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((T * JT, 1024)).astype(np.float32))
    xn = jnp.asarray(np.asarray(xw).reshape(T * JT * 8, 128))

    def kern_g(xa, o_ref):
        v = xa[...]                      # (JT, 1024)
        o_ref[:, :] = v.reshape(8 * JT, 128)

    def run_g(xv):
        return pl.pallas_call(
            kern_g,
            out_shape=jax.ShapeDtypeStruct((T * JT * 8, 128), jnp.float32),
            grid=(T,),
            in_specs=[pl.BlockSpec((JT, 1024), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((8 * JT, 128), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xv)

    def kern_h(xa, o_ref):
        o_ref[:, :] = xa[...]

    def run_h(xv):
        return pl.pallas_call(
            kern_h,
            out_shape=jax.ShapeDtypeStruct((T * JT * 8, 128), jnp.float32),
            grid=(T,),
            in_specs=[pl.BlockSpec((8 * JT, 128), lambda j: (j, j * 0))],
            out_specs=pl.BlockSpec((8 * JT, 128), lambda j: (j, j * 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(xv)

    nbytes = 2 * 4 * N
    for rnd in range(2):
        sg = chained_fn_seconds(run_g, xw)
        log(f"G wide-lane IN  (384,1024)->narrow out: {sg*1e3:.3f} ms "
            f"{nbytes/sg/1e9:.0f} GB/s")
        sh = chained_fn_seconds(run_h, xn)
        log(f"H narrow IN (3072,128)->narrow out:     {sh*1e3:.3f} ms "
            f"{nbytes/sh/1e9:.0f} GB/s")


def variant_w():
    """W: balanced 1:1 copy at out-block lane widths 128/256/512/1024
    (in blocks fixed wide — reads are lane-width-insensitive per G/H)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from multirate_tpu.utils.metrics import chained_fn_seconds

    N = 32_000_000
    JT = 384
    T = N // (JT * 1024)
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((T * JT, 1024)).astype(np.float32))
    nbytes = 2 * 4 * N

    def make(w):
        rows = JT * (1024 // w)

        def kern(xa, o_ref):
            o_ref[:, :] = xa[...].reshape(rows, w)

        def run(xv):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((T * rows, w), jnp.float32),
                grid=(T,),
                in_specs=[pl.BlockSpec((JT, 1024), lambda j: (j, j * 0))],
                out_specs=pl.BlockSpec((rows, w), lambda j: (j, j * 0)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(xv)
        return run

    for rnd in range(2):
        for w in (128, 256, 512, 1024):
            sw_ = chained_fn_seconds(make(w), xw)
            log(f"W out-width {w:4d}: {sw_*1e3:.3f} ms "
                f"{nbytes/sw_/1e9:.0f} GB/s")
