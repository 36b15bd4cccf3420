"""TPU experiment 3: fused arb/Farrow winsel v2 vs phaseall.

BASELINE arb config: 320 taps, nphi=32, rate 0.4709, 1M float32.
Chained-slope timing. ONE process at a time against the TPU.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import multirate_tpu as mr
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    log("device:", jax.devices()[0].device_kind)
    N = 1_000_000
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    x = jax.random.normal(jax.random.key(0), (N,), dtype=jnp.float32)

    for name, kw in [("arb", {}), ("farrow", {"polyorder": 4})]:
        params = mr.make_kernel(ha, rate=0.4709, nphi=32, **kw)
        state = mr.init_state(params, (), jnp.float32)
        # correctness on-TPU vs the windows path (exact oracle), small slice
        import multirate_tpu.ops.compute as comp
        yw = np.asarray(comp.filt_block_raw(params, state, x[:50_000],
                                            "windows")[0])
        for path in ("winsel",):
            yp = np.asarray(comp.filt_block_raw(params, state, x[:50_000],
                                                path)[0])
            log(f"{name} {path} vs windows: maxerr={np.abs(yp-yw).max():.2e}"
                f" rms={float(np.sqrt(np.mean((yp-yw)**2))):.2e}")
        for path in ("winsel",):
            sec = chained_seconds_per_call(params, state, x, path,
                                           repeat=20, iters=4)
            log(f"{name} [{path}]: {sec*1e3:.3f} ms -> {N/sec/1e6:.0f} Msps")

    # upsampling rate too (rate > 1: more outputs than inputs)
    params = mr.make_kernel(ha, rate=1.7238754, nphi=32)
    state = mr.init_state(params, (), jnp.float32)
    sec = chained_seconds_per_call(params, state, x, "winsel",
                                   repeat=20, iters=4)
    log(f"arb rate=1.72 [winsel]: {sec*1e3:.3f} ms -> {N/sec/1e6:.0f} Msps")


if __name__ == "__main__":
    main()
