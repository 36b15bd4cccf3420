"""Multi-host setup helpers.

On a TPU pod slice, each host runs the same program; ``initialize()`` wires
jax.distributed so ``jax.devices()`` spans the full slice, then the regular
(channel, time) mesh from ``make_mesh`` covers all chips — the time-axis
halo (``ppermute``) rides ICI within a slice and DCN across hosts
automatically, per the sharding layout (SURVEY.md section 5, distributed
communication backend).

Comm volume per block boundary is (taps_per_phi - 1) * itemsize bytes —
tens of kilobytes — so multi-host scaling is expected to be compute-bound;
the >=80% N-host efficiency target (BASELINE.md) is about avoiding host
sync stalls, not bandwidth. This module is exercised single-host in CI (the
virtual 8-device CPU mesh); no multi-host hardware is available in this
environment — see ROADMAP.md.
"""

from __future__ import annotations

import jax

__all__ = ["initialize", "is_multihost", "local_data_slice"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op if already initialized or
    single-process). Arguments mirror jax.distributed.initialize and are
    auto-detected on TPU pod slices when omitted."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_data_slice(global_len: int, axis_size: int | None = None):
    """(start, length) of this host's contiguous time-axis slice for
    feeding per-host input shards (make_array_from_process_local_data)."""
    n = jax.process_count() if axis_size is None else axis_size
    i = jax.process_index()
    per = global_len // n
    return i * per, per if i < n - 1 else global_len - i * per
