"""Benchmark harness: headline 147//160 rational resample, 1M float32.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the reference's derived 17.6 Msamples/s
(BASELINE.md: 1e6 samples / 0.0569 s, single-core 2014 x86).

Timing methodology (critical on the axon TPU relay, where
jax.block_until_ready does not reliably synchronize and sync+readback has a
~25 ms RTT floor): R iterations of the filter run inside one jitted
lax.fori_loop with a REAL data dependency between iterations (a scalar of
each output is folded back into the next input), completion is forced by a
host readback, and the RTT floor is measured separately and subtracted.

Extra diagnostics (per-path throughput, roofline fraction, chunked-vs-whole
RMS) go to stderr only.
"""

import json
import os
import sys
import time
from fractions import Fraction

import numpy as np

BASELINE_MSPS = 1e6 / 0.0569 / 1e6  # reference Msamples/s (~17.57)

# v5e (TPU v5 lite): ~819 GB/s HBM. The resample reads 4 B and writes
# 4*147/160 B per input sample => light-speed input rate = BW / 7.675 B.
HBM_GBPS = 819.0
REPEAT = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_rtt(jax, jnp):
    import jax as _j

    f0 = _j.jit(lambda v: (v + 1.0).sum())
    x = jnp.ones(8, jnp.float32)
    float(f0(x))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(f0(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_chained(jax, jnp, params, state, x, path, rtt, iters=6):
    """Per-iteration seconds of dependency-chained filter runs.

    Shared implementation: utils/metrics.chained_seconds_per_call (two trip
    counts of a fully-serialized chain; the slope cancels the jittery
    ~25-32 ms relay round-trip and all other fixed dispatch costs).
    """
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    return chained_seconds_per_call(params, state, x, path,
                                    repeat=REPEAT, iters=iters)


def main():
    import jax
    import jax.numpy as jnp

    import multirate_tpu as mr

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev.device_kind} ({dev.platform})")

    N = 1_000_000
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=ratio)
    x = jax.random.normal(jax.random.key(0), (N,), dtype=jnp.float32)
    state0 = mr.init_state(params, (), jnp.float32)

    rtt = measure_rtt(jax, jnp) if on_tpu else 0.0
    log(f"sync RTT floor: {rtt*1e3:.2f} ms (subtracted)")

    results = {}
    paths = ("supercycle", "pallas") if on_tpu else ("supercycle",)
    for path in paths:
        sec = time_chained(jax, jnp, params, state0, x, path, rtt)
        results[path] = N / sec / 1e6
        log(f"rational 147//160 1M f32 [{path}]: {sec*1e3:.3f} ms "
            f"-> {results[path]:.1f} Msamples/s")

    msps = max(results.values())
    roofline_msps = HBM_GBPS * 1e9 / (4 + 4 * 147 / 160) / 1e6
    log(f"HBM roofline ~{roofline_msps:.0f} Msamples/s; "
        f"achieved {100 * msps / roofline_msps:.1f}%")

    # Optional: the full BASELINE.json config sweep (stderr only).
    if os.environ.get("BENCH_ALL"):
        h147 = np.asarray(
            mr.firdes(147, 0.2, mr.kaiser, beta=7.0), dtype=np.float32)
        ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
              ).astype(np.float32)
        sweep = [
            ("standard 147taps", mr.make_kernel(h147, ratio=Fraction(1, 1))),
            ("decim 1//4", mr.make_kernel(h147, ratio=Fraction(1, 4))),
            ("interp 4//1", mr.make_kernel(h147, ratio=Fraction(4, 1))),
            ("arbitrary r=0.4709", mr.make_kernel(ha, rate=0.4709, nphi=32)),
            ("farrow r=0.4709", mr.make_kernel(ha, rate=0.4709, nphi=32,
                                               polyorder=4)),
        ]
        for name, p in sweep:
            st = mr.init_state(p, (), jnp.float32)
            sec = time_chained(jax, jnp, p, st, x, "auto", rtt, iters=3)
            log(f"config [{name}]: {sec*1e3:.3f} ms/1M "
                f"-> {N/sec/1e6:.0f} Msamples/s in")

    # chunked-vs-whole RMS (the correctness metric in BASELINE.json)
    whole = np.asarray(mr.filt_block(params, state0, x)[0])
    f = mr.FIRFilter(h, ratio)
    xh = np.asarray(x)
    parts = [np.asarray(f.filt(xh[i:i + 250_000])) for i in
             range(0, N, 250_000)]
    chunked = np.concatenate(parts)
    n = min(len(chunked), len(whole))
    rms = float(np.sqrt(np.mean(
        (chunked[:n].astype(np.float64) - whole[:n].astype(np.float64)) ** 2)))
    log(f"chunked-vs-whole RMS: {rms:.3e} over {n} samples")

    print(json.dumps({
        "metric": "rational_147_160_1M_f32_throughput",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 1),
        "chunked_vs_whole_rms": rms,
    }))


if __name__ == "__main__":
    main()
