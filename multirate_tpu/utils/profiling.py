"""Tracing / profiling (SURVEY.md §5 "Tracing / profiling").

Reference counterpart: the ``@time``/``@timed`` macros sprinkled through the
reference's tests and examples (runtests.jl:60, examples/Arb-Farrow Speed
Comparison.jl:16-32). Here the structured equivalents:

- ``trace(logdir)`` — context manager around ``jax.profiler.trace``: captures
  an XLA/TensorBoard profile (HLO timelines, Pallas kernel occupancy, HBM
  traffic counters on real TPU backends) of everything dispatched inside.
- ``annotate(name)`` — ``jax.profiler.TraceAnnotation``: names a region so
  device ops dispatched inside it are attributed to ``name`` in the trace
  viewer. Zero-cost when no trace is active.

Caveat for THIS development container: the axon TPU relay does not forward
the profiler service port, so on the relay backend ``trace`` raises a clear
error by default (``allow_relay=True`` to try anyway). On CPU (tests) and on
directly-attached TPU deployments it works as usual. Wall-clock THROUGHPUT
numbers on the relay must come from metrics.measure_chained instead — see
that module's docstring for why.
"""

from __future__ import annotations

import contextlib
import os

import jax

__all__ = ["trace", "annotate", "on_relay_backend"]


def on_relay_backend() -> bool:
    """True when the active JAX backend is the axon TPU relay (which cannot
    serve the profiler port)."""
    try:
        return bool(jax.devices()[0].platform in ("axon",) or (
            jax.default_backend() == "tpu"
            and os.environ.get("PALLAS_AXON_POOL_IPS")))
    except Exception:  # noqa: BLE001 - no backend at all
        return False


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_trace: bool = False,
          allow_relay: bool = False):
    """Capture a jax.profiler trace of the enclosed dispatches to ``logdir``
    (TensorBoard / XProf format; ``create_perfetto_trace`` adds a Perfetto
    protobuf). Raises RuntimeError on the axon relay backend unless
    ``allow_relay`` — the relay drops the profiler connection and the trace
    would silently contain only host events."""
    if not allow_relay and on_relay_backend():
        raise RuntimeError(
            "jax.profiler cannot capture device events through the axon "
            "relay (no profiler port). Run the workload on CPU for an HLO "
            "timeline, use metrics.measure_chained for throughput, or pass "
            "allow_relay=True to capture host-side events only.")
    with jax.profiler.trace(logdir,
                            create_perfetto_trace=create_perfetto_trace):
        yield logdir


def annotate(name: str):
    """Named trace region: device ops dispatched inside are attributed to
    ``name`` in the trace viewer. Usable as context manager or decorator."""
    return jax.profiler.TraceAnnotation(name)
