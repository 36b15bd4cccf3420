"""TPU experiment 7: where do the rational headline's HBM passes go?

State-chained harness (post-fix): per-iteration traffic is only what the
measured computation itself touches, so numbers map directly onto the
roofline. Stages (each logged before compile so a wedged relay still
shows progress):

  A  filt_block end-to-end, path=pallas   (fused concat + kernel)
  B  filt_block end-to-end, path=supercycle (XLA banded einsum)
  C  kernel-only: exact-need x, fresh stream (pad no-ops; reshape+kernel)
  F  bf16 quantized end-to-end (pallas)   (expect ~2x A at same pct)
  G4 kernel-only with group=4 (gM=640, 128-aligned lanes; n_out trimmed
     to a 640-divisible input length)
"""

import sys
import time
from fractions import Fraction
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


REPEAT = 30
ITERS = 4


def tmin_slope(many, r1=REPEAT):
    def tmin(reps):
        complex(many(reps))
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            complex(many(reps))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    t1 = tmin(r1)
    per = max(t1 / r1, 1e-6)
    r2 = r1 + max(r1, min(int(0.5 / per), 20000))
    t2 = tmin(r2)
    return max((t2 - t1) / (r2 - r1), 1e-9)


def main():
    log("device:", jax.devices()[0].device_kind)
    log("S0 canary...")
    log("S0 ok", float(jax.jit(lambda a: (a + 1).sum())(jnp.ones(8))))

    import multirate_tpu as mr
    from multirate_tpu.utils.metrics import chained_seconds_per_call
    from multirate_tpu.ops.pallas.rational import build_k_matrix
    from multirate_tpu.ops.pallas.rational2 import (
        rational_supercycle_grouped, band_groups, padded_need)

    N = 1_000_000
    L, M, T = 147, 160, 24
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=Fraction(147, 160))
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(N).astype(np.float32)
    x = jnp.asarray(x_np)

    def run_e2e(name, p, xx, path, st_dtype=jnp.float32):
        st = mr.init_state(p, (), st_dtype)
        log(f"{name}: compiling...")
        sec = chained_seconds_per_call(p, st, xx, path,
                                       repeat=REPEAT, iters=ITERS)
        log(f"{name}: {sec*1e3:.3f} ms -> {xx.size/sec/1e6:.0f} Msps")
        return sec

    # ---- A / B: end-to-end ------------------------------------------- #
    run_e2e("A pallas e2e", params, x, "pallas")
    run_e2e("B supercycle e2e", params, x, "supercycle")

    # ---- C: kernel-only (fresh stream, exact-need input) -------------- #
    def kernel_only(g, xlen, name):
        pfb = np.asarray(mr.taps2pfb(h, L), np.float32)
        k0 = build_k_matrix(pfb, L, M, phi0=1, origin=0, group=g)
        K = jnp.asarray(np.concatenate(
            [k0, np.zeros((M, k0.shape[1]), np.float32)], axis=0))
        gps = band_groups(T, L, M, g)
        n_out = xlen * L // M - 200
        need = padded_need(g * L, g * M, n_out)
        xi = jnp.asarray(np.resize(x_np, need))

        @partial(jax.jit, static_argnames=("reps",))
        def many(reps):
            def body(i, carry):
                s, acc = carry
                Kr = jnp.roll(K, s, axis=0)
                y = rational_supercycle_grouped(
                    xi, Kr, g * L, g * M, n_out, gps, three_pass=True)
                last = y[-1]
                s = (s + (last > 1e30).astype(jnp.int32)) % 2
                return (s, acc + last)
            return jax.lax.fori_loop(
                0, reps, body,
                (jnp.int32(0), jnp.float32(0)))[1]

        log(f"{name}: compiling...")
        sec = tmin_slope(lambda reps: many(reps))
        log(f"{name}: {sec*1e3:.3f} ms -> {xlen/sec/1e6:.0f} Msps "
            f"(n_out={n_out})")
        return sec

    kernel_only(2, N, "C kernel-only g2")

    # ---- F: bf16 quantized end-to-end -------------------------------- #
    hb = np.asarray(jnp.asarray(h, jnp.bfloat16))
    pb = mr.make_kernel(hb, ratio=Fraction(147, 160))
    xb = jnp.asarray(x_np, jnp.bfloat16)
    run_e2e("F bf16 pallas e2e", pb, xb, "pallas", st_dtype=jnp.bfloat16)

    # ---- G4: kernel-only, group=4 (640-lane rows) --------------------- #
    kernel_only(4, 998_400, "G4 kernel-only g4")

    log("done")


if __name__ == "__main__":
    main()
