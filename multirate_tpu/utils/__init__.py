"""Utilities: naive test oracles, testing helpers, checkpointing, benchmarks."""

from .oracle import naivefilt
from .testing import assert_close, first_divergence

__all__ = ["naivefilt", "assert_close", "first_divergence"]
