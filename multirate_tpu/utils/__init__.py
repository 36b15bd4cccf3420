"""Utilities: naive test oracles, testing helpers, checkpointing,
metrics, profiling."""

from .oracle import naivefilt
from .testing import assert_close, first_divergence, rms
from .checkpoint import save_state, load_state, state_to_host, state_from_host
from .metrics import (ThroughputReport, measure, measure_chained,
                      hbm_roofline_samples_per_s)
from .debug import interpret_kernels, check_block, check_indices
from .profiling import trace, annotate, on_relay_backend

__all__ = [
    "naivefilt", "assert_close", "first_divergence", "rms",
    "save_state", "load_state", "state_to_host", "state_from_host",
    "ThroughputReport", "measure", "measure_chained",
    "hbm_roofline_samples_per_s",
    "interpret_kernels", "check_block", "check_indices",
    "trace", "annotate", "on_relay_backend",
]
