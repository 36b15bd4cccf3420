"""FilterState checkpoint / resume.

The reference's streaming state (history + inputDeficit + phase) fully
determines resumption — proven by its piecewise tests (SURVEY.md section 5).
Here the state is an explicit tiny pytree, so checkpointing is trivial:
``save_state``/``load_state`` round-trip it through a .npz file, and
deterministic restart from a block boundary is exact (tested in
tests/test_streaming.py::test_checkpoint_resume and test_checkpoint_file).
"""

from __future__ import annotations

import numpy as np

from ..ops.params import FilterState

__all__ = ["save_state", "load_state", "state_to_host", "state_from_host"]


def state_to_host(state: FilterState) -> dict:
    """Device -> host: plain numpy dict, safe to serialize anywhere."""
    return {
        "history": np.asarray(state.history),
        "phase": np.asarray(state.phase),
        "deficit": np.asarray(state.deficit),
    }


def state_from_host(d: dict) -> FilterState:
    import jax.numpy as jnp

    return FilterState(
        history=jnp.asarray(d["history"]),
        phase=jnp.asarray(d["phase"], dtype=jnp.int64),
        deficit=jnp.asarray(d["deficit"], dtype=jnp.int64),
    )


def save_state(path: str, state: FilterState) -> None:
    np.savez(path, **state_to_host(state))


def load_state(path: str) -> FilterState:
    with np.load(path) as z:
        return state_from_host({k: z[k] for k in z.files})
