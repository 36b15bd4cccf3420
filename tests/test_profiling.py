"""Tracing/profiling (SURVEY §5): jax.profiler capture wrapper.

The reference has only @time macros (runtests.jl:60); the TPU-native
equivalent is a structured profiler trace. These tests run the capture on
the CPU backend (conftest forces it) and check real trace artifacts land.
"""

import glob
import os
from fractions import Fraction

import numpy as np

import multirate_tpu as mr
from multirate_tpu.utils import annotate, trace


def test_trace_captures_profile(tmp_path, rng):
    h = rng.standard_normal(64).astype(np.float32)
    x = rng.standard_normal(8192).astype(np.float32)
    f = mr.FIRFilter(h, Fraction(3, 2))
    with trace(str(tmp_path)):
        with annotate("resample-block"):
            y = np.asarray(f.filt(x))
    assert y.size > 0
    dumped = glob.glob(os.path.join(str(tmp_path), "**", "*.xplane.pb"),
                       recursive=True)
    assert dumped, "no profiler artifacts written"


def test_annotate_is_nop_without_trace(rng):
    # zero-cost annotation outside a trace: still runs the region
    with annotate("idle-region"):
        v = float(np.sum(rng.standard_normal(4)))
    assert np.isfinite(v)
