"""Arbitrary vs Farrow resampler throughput harness.

Python analogue of the reference's examples/Arb-Farrow Speed Comparison.jl
(:16-19, :32-35): 10M samples, 320 taps, nphi=32, polyorder 4, rates
{1.0, 1/2.123456789}, dtypes {float32, float64, complex64, complex128};
prints elapsed plus input/output samples per second.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import multirate_tpu as mr
from multirate_tpu.utils.metrics import measure_chained


def main(n_samples: int = 1_000_000, rates=None, dtypes=None,
         repeat: int = 10, iters: int = 5):
    """``rates``/``dtypes``/``repeat``/``iters`` shrink the sweep (the test
    suite smoke-runs one config; the full matrix is the reference-parity
    default)."""
    nphi, polyorder = 32, 4
    numtaps, beta = mr.kaiserlength(0.1, samplerate=nphi)
    numtaps = min(-(-numtaps // nphi) * nphi, 320)
    h = mr.firdes(numtaps, 0.45, mr.kaiser, samplerate=nphi, beta=beta) * nphi

    import jax
    import jax.numpy as jnp

    for rate in rates or (1.0, 1 / 2.123456789):
        for dt in dtypes or (np.float32, np.float64, np.complex64,
                             np.complex128):
            x = np.random.default_rng(0).standard_normal(n_samples)
            if np.issubdtype(dt, np.complexfloating):
                x = x + 1j * np.random.default_rng(1).standard_normal(n_samples)
            x = jnp.asarray(x.astype(dt))
            hh = h.astype(np.float32 if dt in (np.float32, np.complex64)
                          else np.float64)
            for name, polyord in (("arb", None), ("farrow", polyorder)):
                params = mr.make_kernel(hh, rate=rate, nphi=nphi,
                                        polyorder=polyord)
                state = mr.init_state(params, (), x.dtype)
                # chained-slope methodology: the only valid timing through
                # the TPU relay (see utils/metrics.py)
                rep = measure_chained(params, state, x, rate=rate,
                                      repeat=10, iters=5)
                print(f"{name:7s} rate={rate:<12.6f} {np.dtype(dt).name:10s} {rep}")


if __name__ == "__main__":
    main()
