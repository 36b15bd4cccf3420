"""Sharded streaming filtering: shard_map over a (channel, time) mesh.

Key structure (SURVEY.md sections 5 and 7, step 8):

- Channels shard as pure data parallelism: zero communication.
- The time axis shards into contiguous blocks; each block needs only the
  (taps_per_phi - 1) trailing input samples of its left neighbor (the
  filter history / overlap-save halo) — one ``lax.ppermute`` hop over ICI —
  plus O(1) phase scalars that are *computable in closed form* from the
  block-start sample index, because every kernel's control recurrence is
  affine (ops/indexing.py). Blocks are therefore independent after one halo
  exchange: sequence length scales linearly with device count and the wire
  cost per boundary is (taps_per_phi - 1) * itemsize bytes.

The chunked==whole invariant across devices is the same invariant the
reference tests for single-core chunking (runtests.jl:72-96): each device's
block is one "chunk", with the closed-form entry state replacing the
sequentially-carried one.

PERF DESIGN RULE (exp29): for the rational family, pick per-shard block
lengths that are multiples of the input stride M. The closed-form entry
state then lands on the fresh phase for every shard and `_select_k`'s cond
takes the host-precomputed K branch; otherwise every shard k>=1 pays the
in-graph banded-K scatter each call (the round-3 weak-scaling "1.66x"
spike). Results are identical either way — only speed differs.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import indexing as idx
from ..ops.compute import filt_block_raw
from ..ops.params import (
    FIRStandard, FIRInterpolator, FIRDecimator, FIRRational,
    FIRArbitrary, FIRFarrow, FilterState, init_state,
)

__all__ = ["make_mesh", "shard_filt_block", "shard_filt", "sharded_resample",
           "compact"]


def make_mesh(n_ch: int = 1, n_t: int | None = None, devices=None) -> Mesh:
    """A (channel, time) mesh over the available devices.

    Channel axis = data parallel (BASELINE.json 64-channel Farrow config);
    time axis = sequence parallel over signal blocks.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_t is None:
        n_t = devices.size // n_ch
    return Mesh(devices[: n_ch * n_t].reshape(n_ch, n_t), ("ch", "t"))


def _entry_state(params, phase0, deficit0, start):
    """Closed-form streaming state at global input offset ``start``
    (0-based samples consumed), given the stream's entry state.

    This is what makes time-sharding embarrassingly parallel: the reference
    would have to filter the first ``start`` samples to know the phase here
    (Filters.jl:567-571); we evaluate the affine recurrence directly.
    """
    if isinstance(params, (FIRStandard, FIRInterpolator)):
        return phase0, deficit0
    if isinstance(params, FIRDecimator):
        # decimator phase is trivially 1 (the state's phase field is unused)
        _, _, d = idx.rational_carry(1, params.decimation, 1, deficit0, start)
        return phase0, d
    if isinstance(params, FIRRational):
        _, phi, d = idx.rational_carry(params.interpolation,
                                       params.decimation, phase0, deficit0,
                                       start)
        return phi, d
    if isinstance(params, (FIRArbitrary, FIRFarrow)):
        _, u, d = idx.accum_carry(params.nphi, params.delta_fx, phase0,
                                  deficit0, start)
        return u, d
    raise TypeError(type(params))


def _outputs_before(params, phase0, deficit0, start):
    """Number of global outputs produced by the first ``start`` inputs."""
    if isinstance(params, FIRStandard):
        return start
    if isinstance(params, FIRInterpolator):
        return start * params.interpolation
    if isinstance(params, FIRDecimator):
        return idx.rational_count(1, params.decimation, 1, deficit0, start)
    if isinstance(params, FIRRational):
        return idx.rational_count(params.interpolation, params.decimation,
                                  phase0, deficit0, start)
    return idx.accum_count(params.nphi, params.delta_fx, phase0, deficit0,
                           start)


def shard_filt_block(params, state: FilterState, x, mesh: Mesh,
                     path: str = "auto"):
    """Filter one sharded super-block. x: (C, N) sharded P('ch', 't').

    Each time-shard receives its halo from the left neighbor via ppermute;
    shard 0 uses the carried ``state.history``. Returns
    (y_blocks (C, n_t, n_pad), counts (n_t,), new_state) where n_pad is the
    path-dependent static per-shard output length (>= max_outputs(params,
    nblk); gridsel paths tile-pad — see filt_block_raw) and new_state
    carries the global stream state (history = tail of the last shard).

    Requires per-shard block length >= h_min (one-hop halo). The carried
    state history may be LONGER than h_min (the rational zero-copy kernel
    keeps ZC_S rows — params.history_len); only the trailing h_min samples
    are semantically required, so shards pad the halo with leading zeros
    when nblk < history_len. The zero-copy fast path only engages for
    blocks much longer than history_len, in which case the halo is full.
    """
    n_t = mesh.shape["t"]
    C, N = x.shape
    nblk = N // n_t
    H = params.history_len
    h_need = getattr(params, "h_min", H)
    if N % n_t:
        raise ValueError(f"time length {N} not divisible by {n_t} shards")
    if nblk < h_need:
        raise ValueError(
            f"per-shard block ({nblk}) must be >= h_min ({h_need}); "
            f"use longer blocks or fewer time shards")
    n_max = idx.max_outputs(params, nblk)
    Ht = min(H, nblk)  # halo samples actually transferable in one hop

    def step(hist0, phase0, deficit0, x_blk):
        # x_blk: (C/ch_shards, nblk); hist0: (C/ch_shards, H) replicated on t
        k = lax.axis_index("t")
        if H > 0:
            tail = x_blk[:, nblk - Ht:]
            halo = lax.ppermute(tail, "t",
                                [(i, i + 1) for i in range(n_t - 1)])
            if Ht < H:
                halo = jnp.pad(halo, [(0, 0), (H - Ht, 0)])
            hist = jnp.where(k == 0, hist0, halo)
        else:
            hist = x_blk[:, :0]
        # axis_index is int32; cast before multiplying so super-blocks past
        # 2^31 total samples reach the int64 entry-state math un-wrapped
        start = k.astype(jnp.int64) * nblk
        phi_k, d_k = _entry_state(params, phase0[0], deficit0[0], start)
        st = FilterState(history=hist.astype(x_blk.dtype), phase=phi_k,
                         deficit=d_k)
        y, cnt, _ = filt_block_raw(params, st, x_blk, path)
        return y[:, None, :], cnt.reshape(1)

    phase_r = state.phase.reshape(1)
    deficit_r = state.deficit.reshape(1)
    y, counts = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P("ch", None), P(), P(), P("ch", "t")),
        out_specs=(P("ch", "t", None), P("t")),
    )(state.history, phase_r, deficit_r, x)

    phase1, deficit1 = _entry_state(params, state.phase, state.deficit, N)
    if H == 0:
        new_hist = x[:, :0]
    elif N >= H:
        new_hist = x[:, N - H:].astype(state.history.dtype)
    else:
        new_hist = jnp.concatenate([state.history, x], axis=-1)[:, -H:]
    new_state = FilterState(history=new_hist, phase=phase1, deficit=deficit1)
    return y, counts, new_state


def compact(y_blocks, counts):
    """Host-side assembly of per-shard padded outputs into one dense array.

    y_blocks: (..., n_t, n_pad) with n_pad the shard_filt_block static
    trailing length (>= per-shard max_outputs; gridsel paths tile-pad);
    counts: (n_t,). Returns (..., sum(counts)).
    """
    y_blocks = np.asarray(y_blocks)
    counts = np.asarray(counts)
    return np.concatenate(
        [y_blocks[..., k, : int(c)] for k, c in enumerate(counts)], axis=-1)


@jax.jit
def compact_device(y_blocks, counts):
    """Device-resident ragged compaction: (dense_padded, total).

    dense_padded (..., n_t * n_max) holds each shard's first counts[k]
    samples packed back-to-back (one scatter, no host transfer); entries
    past ``total`` are zero. Callers slice with the (static-bounded) total
    at the stream boundary — one sync for a whole super-block instead of
    the per-shard device->host->device round trip of ``compact``.
    """
    *lead, n_t, n_max = y_blocks.shape
    counts = counts.astype(jnp.int64)
    offs = jnp.cumsum(counts) - counts                     # (n_t,)
    j = jnp.arange(n_max, dtype=jnp.int64)
    tgt = offs[:, None] + j[None, :]                       # (n_t, n_max)
    # out-of-range targets drop in scatter mode="drop"
    tgt = jnp.where(j[None, :] < counts[:, None], tgt, n_t * n_max)
    flat = y_blocks.reshape(*lead, n_t * n_max)
    dense = jnp.zeros_like(flat)
    dense = dense.at[..., tgt.reshape(-1)].set(flat, mode="drop")
    return dense, jnp.sum(counts)


def shard_filt(params, x, mesh: Mesh, path: str = "auto"):
    """Stateless sharded filtering of a whole (C, N) signal.

    Returns (y_blocks, counts) — use ``compact`` or, when counts are
    provably uniform (see ``sharded_resample``), a reshape.
    """
    state = init_state(params, (x.shape[0],), x.dtype)
    y, counts, _ = shard_filt_block(params, state, x, mesh, path=path)
    return y, counts


def _uniform_block(params, nblk: int) -> int | None:
    """Outputs per shard when provably equal for a fresh stream, else None.

    For the rational family this holds iff the per-shard block length is a
    multiple of the input stride M; every shard then emits exactly
    nblk*L/M outputs.
    """
    if isinstance(params, FIRStandard):
        return nblk
    if isinstance(params, FIRInterpolator):
        return nblk * params.interpolation
    if isinstance(params, (FIRDecimator, FIRRational)):
        L = getattr(params, "interpolation", 1)
        M = params.decimation
        if nblk % M == 0:
            return nblk * L // M
    return None


def sharded_resample(params, x, mesh: Mesh, path: str = "auto"):
    """High-level sharded resample: pads the time axis so every shard emits
    the same output count, runs the sharded filter, and returns a dense
    (C, out_len) array (trimmed to the unpadded stream's exact output count).

    Works for the rational family; arbitrary/Farrow rates fall back to
    padded blocks + compact (ragged per-shard counts).
    """
    C, N = x.shape
    n_t = mesh.shape["t"]
    M = params.decimation if isinstance(params, (FIRDecimator, FIRRational)) \
        else 1
    quantum = n_t * M
    N_pad = -(-N // quantum) * quantum
    n_out_true = int(_outputs_before(params, _fresh_phase(params), 1, N))
    xp = jnp.pad(x, ((0, 0), (0, N_pad - N)))
    nblk = N_pad // n_t
    per_shard = _uniform_block(params, nblk)
    y, counts = shard_filt(params, xp, mesh, path=path)
    if per_shard is not None:
        dense = y[..., :per_shard].reshape(C, -1)
        return dense[:, :n_out_true]
    # ragged counts: pack on device (no host round trip), then one static
    # slice — n_out_true is host-known closed form, not a device readback
    dense, _ = compact_device(y, counts)
    return dense[:, :n_out_true]


def _fresh_phase(params) -> int:
    return 1 if isinstance(params, FIRRational) else 0
