"""Naive vs polyphase resampling speed comparison.

Python analogue of the reference's examples/Comparison.jl and the README
"Speed" section: the same 147//160, 1M-sample, 3528-tap workload, timed
naive (zero-stuff + full filter + downselect) vs polyphase.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from fractions import Fraction

import numpy as np

import multirate_tpu as mr
from multirate_tpu.utils.oracle import naivefilt


def main():
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    x = np.random.default_rng(0).standard_normal(1_000_000).astype(np.float32)

    t0 = time.perf_counter()
    y_naive = naivefilt(h, x[:100_000], ratio)  # naive is ~100x slower; scale
    t_naive = (time.perf_counter() - t0) * 10   # extrapolate to 1M
    print(f"naive (extrapolated 1M): {t_naive:.2f} s")

    import jax
    y = mr.filt(h, x, ratio)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = mr.filt(h, x, ratio)
    jax.block_until_ready(y)
    t_poly = time.perf_counter() - t0
    print(f"polyphase: {t_poly*1e3:.1f} ms  "
          f"({len(x)/t_poly/1e6:.0f} Msamples/s, {t_naive/t_poly:.0f}x)")

    n = min(len(y_naive), 10_000)
    err = np.abs(np.asarray(y)[:n] - y_naive[:n]).max()
    print(f"max abs diff vs naive (first {n}): {err:.2e}")


if __name__ == "__main__":
    main()
