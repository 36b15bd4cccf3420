"""Ablation of the v4 fused zc headline kernel at 8M: where does the
2.2x-over-roofline time actually go? Variants surgically disable one
cost class each (values wrong for all but full — timing only):

  full      — production kernel (accuracy asserted separately)
  int8corr  — hi pass bf16 + BOTH correction passes as s8xs8->s32 MXU
              matmuls (2x rate on v5e): in-kernel f32->s8 quantize of
              xh/xl with a fixed fake scale, host-cast s8 K stacks,
              s32->f32 descale-add. TIMING ONLY (scales are fake).
  nosplit   — single-pass bf16 matmuls (no hi/lo data splits)
  onepass   — 3-pass structure replaced by 1 matmul per chunk (hi@hi)
  nochunks  — each group contracts ONE 128-row chunk (first), not all
  nostrips  — f_first/f_next read the xa block (no boundary strips,
              no pid select, no sublane rolls)
  dmaonly   — body writes a constant slice of xa (grid+DMA+store floor)

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp23_zc_ablate.py \
    [L M hlen]   (default 147 160 3528)
"""
import sys
import time
from fractions import Fraction
from functools import partial

import numpy as np

MODES = ("full", "int8corr", "nosplit", "onepass", "nochunks", "nostrips",
         "dmaonly")
ARGS = ([int(a) for a in sys.argv[1:4]] if len(sys.argv) >= 4
        else [147, 160, 24 * 147])


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import multirate_tpu as mr
    from multirate_tpu.ops import precision as prec
    from multirate_tpu.ops.pallas import rational2 as r2
    from multirate_tpu.ops import compute as cc

    log("device:", jax.devices()[0].device_kind)
    Lr, Mr, hlen = ARGS
    ratio = Fraction(Lr, Mr)
    scale = max(Lr, 1)
    h = (mr.firdes(hlen, 0.5 / scale, mr.kaiser, beta=7.8562) * scale
         ).astype(np.float32)
    p = mr.make_kernel(h, ratio=ratio)
    rng = np.random.default_rng(0)
    N = 8_000_000
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    st = mr.init_state(p, (), jnp.float32)

    pfb2d, L, M, g = cc._band_geometry(p)
    gL, gM = g * L, g * M
    n_max = N * gL // gM + 8  # close enough for timing geometry
    groups = r2.zc_groups(pfb2d.shape[0], L, M, g,
                          p.h_min, shift_slack=cc._zc_slack(p))
    geo = r2.zc_geometry(gL, gM, n_max, N, S=8)
    JT, num_tiles, T_ok, R = geo
    log(f"groups={[(c1-c0, sp) for (c0, c1, _, sp) in groups]} JT={JT} "
        f"tiles={num_tiles} v4={r2._v4_ok(gM, groups)}")
    kh, kl = p.k_zc_hi, p.k_zc_lo
    D, U, GC = kh.shape
    # fake-scale s8 casts of the stacks (timing only), rows 32-padded
    U8 = -(-U // 32) * 32
    def to8(k):
        a = np.asarray(k, np.float32)
        a = np.clip(np.round(a * 40.0), -127, 127).astype(np.int8)
        return jnp.asarray(np.pad(a, ((0, 0), (0, U8 - U), (0, 0))))
    kh8, kl8 = to8(kh), to8(kl)

    f32 = jnp.float32

    def make_kernel(mode):
        S = 8
        i8 = mode == "int8corr"

        def body(f_first, f_xa, f_next, kh_ref, kl_ref, kh8_ref, kl8_ref,
                 o_ref):
            strips, chunks = {}, {}
            total = JT + 2 * S

            def strip(l0):
                if l0 not in strips:
                    strips[l0] = jnp.concatenate(
                        [f_first(l0), f_xa(l0), f_next(l0)], axis=0)
                return strips[l0]

            def chunk(u, lm):
                key = (u, lm)
                if key not in chunks:
                    if u == S or mode == "nostrips":
                        xs = f_xa(lm)
                    else:
                        xs = pltpu.roll(strip(lm), jnp.int32(total - u),
                                        axis=0)[:JT]
                    if mode in ("nosplit", "onepass"):
                        chunks[key] = (xs.astype(jnp.bfloat16),) * 2
                    elif i8:
                        xh, xl = prec.split_bf16_kernel(xs)
                        # fake fixed scales — timing only
                        xh8 = jnp.round(xs * 25.0).astype(jnp.int8)
                        xl8 = jnp.round(
                            (xs - xh.astype(f32)) * 12800.0
                        ).astype(jnp.int8)
                        chunks[key] = (xh, xh8, xl8)
                    else:
                        chunks[key] = prec.split_bf16_kernel(xs)
                return chunks[key]

            for gi, (c0, c1, b8, span) in enumerate(groups):
                k0 = (S - 1) + b8 // gM
                lane = b8 % gM
                wc = c1 - c0
                acc = None
                rng_ = ([0] if mode == "nochunks"
                        else range(0, span, 128))
                for kr0 in rng_:
                    w = min(128, span - kr0)
                    al = lane + kr0
                    cs = gi * 128
                    kh_ = kh_ref[0, kr0:kr0 + w, cs:cs + wc]
                    if i8:
                        # int8 sublane quantum is 32: round the s8 dot
                        # depth up (reads a few padded K rows — timing
                        # probe, values are fake-scaled anyway)
                        w8 = min(128, -(-w // 32) * 32)
                        xh, xh8, xl8 = chunk(k0 + al // gM, al % gM)
                        if w < 128:
                            xh = xh[:, :w]
                        if w8 < 128:
                            xh8, xl8 = xh8[:, :w8], xl8[:, :w8]
                        part = jnp.dot(xh, kh_, preferred_element_type=f32)
                        kl8_ = kl8_ref[0, kr0:kr0 + w8, cs:cs + wc]
                        kh8_ = kh8_ref[0, kr0:kr0 + w8, cs:cs + wc]
                        corr = (jnp.dot(xh8, kl8_,
                                        preferred_element_type=jnp.int32)
                                + jnp.dot(xl8, kh8_,
                                          preferred_element_type=jnp.int32))
                        part = part + corr.astype(f32) * jnp.float32(1e-7)
                        acc = part if acc is None else acc + part
                        continue
                    xh, xl = chunk(k0 + al // gM, al % gM)
                    if w < 128:
                        xh, xl = xh[:, :w], xl[:, :w]
                    part = jnp.dot(xh, kh_, preferred_element_type=f32)
                    if mode not in ("nosplit", "onepass"):
                        kl_ = kl_ref[0, kr0:kr0 + w, cs:cs + wc]
                        part = (part
                                + jnp.dot(xh, kl_, preferred_element_type=f32)
                                + jnp.dot(xl, kh_, preferred_element_type=f32))
                    acc = part if acc is None else acc + part
                o_ref[:, c0:c1] = acc.astype(f32)

        def kern(dsel_ref, hist_ref, prev_ref, xa_ref, next_ref,
                 kh_ref, kl_ref, kh8_ref, kl8_ref, o_ref):
            pid = pl.program_id(0)
            if mode == "dmaonly":
                o_ref[:, :] = jnp.zeros((JT, gL), f32) + xa_ref[0, 0]
                return

            def f_first(l0):
                if mode == "nostrips":
                    return xa_ref[:8, l0:l0 + 128]
                return jnp.where(pid == jnp.int32(0),
                                 hist_ref[:, l0:l0 + 128],
                                 prev_ref[:, l0:l0 + 128])

            body(f_first, lambda lm: xa_ref[:, lm:lm + 128],
                 lambda l0: next_ref[:8, l0:l0 + 128], kh_ref, kl_ref,
                 kh8_ref, kl8_ref, o_ref)
        return kern

    def make_call(mode):
        kern = make_kernel(mode)
        S, rps = 8, JT // 8
        rb_max = R // 8 - 1
        dsel1 = jnp.zeros((1,), jnp.int32)

        def one(xv, khv, klv):
            x2d = xv[: R * gM].reshape(R, gM)
            h2d = jnp.zeros((S, gM), f32)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((T_ok * JT, gL), f32),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(T_ok,),
                    in_specs=[
                        pl.BlockSpec((S, gM), lambda j, d: (j * 0, j * 0)),
                        pl.BlockSpec(
                            (S, gM),
                            lambda j, d: (jnp.maximum(j * rps - 1, 0),
                                          j * 0)),
                        pl.BlockSpec((JT, gM), lambda j, d: (j, j * 0)),
                        pl.BlockSpec(
                            (S, gM),
                            lambda j, d: (jnp.minimum((j + 1) * rps,
                                                      rb_max), j * 0)),
                        pl.BlockSpec((1, U, GC),
                                     lambda j, d: (d[0], j * 0, j * 0)),
                        pl.BlockSpec((1, U, GC),
                                     lambda j, d: (d[0], j * 0, j * 0)),
                        pl.BlockSpec((1, U8, GC),
                                     lambda j, d: (d[0], j * 0, j * 0)),
                        pl.BlockSpec((1, U8, GC),
                                     lambda j, d: (d[0], j * 0, j * 0)),
                    ],
                    out_specs=pl.BlockSpec((JT, gL),
                                           lambda j, d: (j, j * 0)),
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(dsel1, h2d, x2d, x2d, x2d, khv, klv, kh8, kl8)

        @partial(jax.jit, static_argnames="reps")
        def call(xx, khv, klv, reps):
            def bd(i, carry):
                xx, acc = carry
                y = one(xx, khv, klv)
                last = y[-1, 0]
                xx = xx.at[0].add((last * 1e-30).astype(xx.dtype))
                return (xx, acc + last)
            _, acc = lax.fori_loop(0, reps, bd, (xx, jnp.float32(0)))
            return acc
        return lambda reps: call(x, kh, kl, reps)

    def slope(call_once, repeat=8, iters=3):
        def tmin(reps):
            float(call_once(reps))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                float(call_once(reps))
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))
        t1 = tmin(repeat)
        per = max(t1 / repeat, 1e-7)
        r2_ = repeat + max(repeat, min(int(0.5 / per), 20000))
        sl = []
        for _ in range(3):
            a, b = tmin(repeat), tmin(r2_)
            sl.append(max((b - a) / (r2_ - repeat), 1e-9))
        return float(np.median(sl))

    res = {m: [] for m in MODES}
    for r in range(3):
        order = MODES[r % len(MODES):] + MODES[:r % len(MODES)]
        for mode in order:
            sec = slope(make_call(mode))
            msps = N / sec / 1e6
            res[mode].append(msps)
            log(f"round {r} {mode}: {msps:.0f} Msps")
    log("MEDIANS:", {m: round(float(np.median(v))) for m, v in res.items()})


if __name__ == "__main__":
    main()
