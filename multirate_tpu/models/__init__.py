"""High-level configured resampler models.

The reference's examples/ directory is its "model zoo" (DAT-to-CD converter,
arb/Farrow demos — SURVEY.md C22); these are the equivalent first-class,
TPU-ready pipeline objects.
"""

from .resampler import Resampler, DATToCD, MultiChannelResampler

__all__ = ["Resampler", "DATToCD", "MultiChannelResampler"]
