"""Pallas TPU kernels for the hot compute paths.

These fuse the window construction into the contraction so the overlapped
window matrices never exist in HBM (the XLA supercycle path materializes
X3, costing ~2x the light-speed HBM traffic; see ops/compute.py).
"""

from .rational import rational_supercycle_pallas, build_k_matrix

__all__ = ["rational_supercycle_pallas", "build_k_matrix"]
