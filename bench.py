"""Benchmark harness: headline 147//160 rational resample, 1M float32.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the reference's derived 17.6 Msamples/s
(BASELINE.md: 1e6 samples / 0.0569 s, single-core 2014 x86).

Extra diagnostics (per-config throughputs, roofline fraction, chunked-vs-
whole RMS) go to stderr only.
"""

import json
import sys
import time
from fractions import Fraction

import numpy as np

BASELINE_MSPS = 1e6 / 0.0569 / 1e6  # reference Msamples/s (~17.57)

# v5e (TPU v5 lite): ~819 GB/s HBM. The resample reads 4 B and writes
# 4*147/160 B per input sample => light-speed input rate = BW / 7.675 B.
HBM_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    import multirate_tpu as mr

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    N = 1_000_000
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=ratio)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(N),
                    dtype=jnp.float32)
    state0 = mr.init_state(params, (), jnp.float32)

    def run(x):
        y, count, st = mr.filt_block(params, state0, x)
        return y

    t = time_fn(run, x)
    msps = N / t / 1e6
    log(f"rational 147//160 1M f32: {t*1e3:.3f} ms -> {msps:.1f} Msamples/s")

    roofline_msps = HBM_GBPS * 1e9 / (4 + 4 * 147 / 160) / 1e6
    log(f"HBM roofline ~{roofline_msps:.0f} Msamples/s; "
        f"achieved {100 * msps / roofline_msps:.1f}%")

    # chunked-vs-whole RMS (the correctness metric in BASELINE.json)
    whole = np.asarray(run(x))
    f = mr.FIRFilter(h, ratio)
    parts = [np.asarray(f.filt(x[i:i + 250_000])) for i in
             range(0, N, 250_000)]
    chunked = np.concatenate(parts)
    n = min(len(chunked), len(whole))
    rms = float(np.sqrt(np.mean((chunked[:n] - whole[:n]) ** 2)))
    log(f"chunked-vs-whole RMS: {rms:.3e} over {n} samples")

    print(json.dumps({
        "metric": "rational_147_160_1M_f32_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
        "chunked_vs_whole_rms": rms,
    }))


if __name__ == "__main__":
    main()
