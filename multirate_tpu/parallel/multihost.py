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

__all__ = ["initialize", "is_multihost", "local_data_slice",
           "shard_quantum", "padded_global_len"]


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


def shard_quantum(params, n_t: int) -> int:
    """Global time-axis length quantum that keeps ``shard_filt_block``
    applicable AND per-shard output counts uniform for the rational family:
    n_t equal shards, each a multiple of the input stride M."""
    M = getattr(params, "decimation", 1)
    return n_t * M


def padded_global_len(global_len: int, quantum: int) -> int:
    """Smallest multiple of ``quantum`` >= global_len (callers zero-pad the
    stream tail; trim outputs with the closed-form true output count as
    sharded.sharded_resample does)."""
    return -(-global_len // quantum) * quantum


def local_data_slice(global_len: int, axis_size: int | None = None,
                     quantum: int = 1, process_index: int | None = None):
    """(start, length, valid) of this host's time-axis slice.

    Every host receives the SAME ``length`` (the quantum-padded global
    stream divided equally) so the result composes directly with
    ``shard_filt_block``'s equal-shard requirement; ``valid`` is how many
    of those samples exist in the unpadded stream (the remainder is
    zero-fill supplied by the caller). Use with ``shard_quantum`` /
    ``padded_global_len``:

        q = shard_quantum(params, mesh.shape["t"]) * process_count
        start, length, valid = local_data_slice(global_len, quantum=q)
    """
    n = jax.process_count() if axis_size is None else axis_size
    i = jax.process_index() if process_index is None else process_index
    per = padded_global_len(global_len, n * quantum) // n
    start = i * per
    valid = min(per, max(0, global_len - start))
    return start, per, valid
