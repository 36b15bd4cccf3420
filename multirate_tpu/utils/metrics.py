"""Throughput / roofline instrumentation.

Reference counterpart: the examples/Arb-Farrow Speed Comparison.jl harness
(prints elapsed + input/output samples/s) and the README "Speed" section.
This module adds the TPU-side model: achieved samples/s against the HBM
roofline for the streaming FIR workload (SURVEY.md section 5 tracing entry).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

__all__ = ["ThroughputReport", "measure", "hbm_roofline_samples_per_s",
           "KNOWN_HBM_GBPS"]

# Peak HBM bandwidth per chip, GB/s (public figures).
KNOWN_HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "cpu": 100.0,  # placeholder for host runs
}


def hbm_roofline_samples_per_s(rate: float, itemsize: int = 4,
                               bw_gbps: float = 819.0) -> float:
    """Light-speed input samples/s for a resampler at output/input ``rate``:
    each input sample costs itemsize bytes read + rate*itemsize written
    (taps/banks are VMEM-resident and amortized to zero)."""
    bytes_per_input = itemsize * (1.0 + rate)
    return bw_gbps * 1e9 / bytes_per_input


@dataclasses.dataclass
class ThroughputReport:
    seconds: float
    in_samples: int
    out_samples: int
    in_samples_per_s: float
    out_samples_per_s: float
    roofline_fraction: float | None = None

    def __str__(self):
        s = (f"{self.seconds*1e3:.3f} ms | in {self.in_samples_per_s/1e6:.1f} "
             f"Msps | out {self.out_samples_per_s/1e6:.1f} Msps")
        if self.roofline_fraction is not None:
            s += f" | {100*self.roofline_fraction:.1f}% of HBM roofline"
        return s


def measure(fn, *args, in_samples: int, out_samples: int,
            iters: int = 20, warmup: int = 3,
            rate: float | None = None, itemsize: int = 4,
            device=None) -> ThroughputReport:
    """Median wall time of ``fn(*args)`` with block_until_ready, as a
    ThroughputReport (the jax.block_until_ready-bracketed harness from
    SURVEY.md section 5)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    sec = float(np.median(ts))
    roof = None
    if rate is not None:
        device = device or jax.devices()[0]
        bw = KNOWN_HBM_GBPS.get(device.device_kind,
                                KNOWN_HBM_GBPS.get(device.platform))
        if bw:
            roof = (in_samples / sec) / hbm_roofline_samples_per_s(
                rate, itemsize, bw)
    return ThroughputReport(
        seconds=sec, in_samples=in_samples, out_samples=out_samples,
        in_samples_per_s=in_samples / sec, out_samples_per_s=out_samples / sec,
        roofline_fraction=roof)
