"""Host-side streaming driver: native ring buffer -> jitted block step.

Real streaming sources (audio, SDR, sockets) deliver arbitrary-sized chunks;
the TPU step wants static block shapes. ``RingBuffer`` wraps the C++
lock-free SPSC ring (native/mr_ring.cpp, built on first use with g++);
``StreamingResampler`` assembles fixed blocks from pushed chunks and drives
any multirate_tpu kernel through the jitted ``filt_block``, carrying the
FilterState across blocks. A flush path handles the sub-block tail.

The reference has no streaming runtime (its user loops over filt calls,
e.g. examples/Interactive Farrow Example.jl); this is the production-shaped
equivalent for a device-accelerated pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import time

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmr_ring.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "mr_ring.cpp")

_lib = None
_lib_lock = threading.Lock()


def build_native(force: bool = False) -> str:
    """Compile the native ring buffer (g++ -O3) if not already built."""
    if force or not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", _LIB_PATH, _SRC_PATH],
            check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    with _lib_lock:
        if _lib is None:
            lib = ctypes.CDLL(build_native())
            lib.mr_ring_create.restype = ctypes.c_void_p
            lib.mr_ring_create.argtypes = [ctypes.c_size_t]
            lib.mr_ring_destroy.argtypes = [ctypes.c_void_p]
            lib.mr_ring_capacity.restype = ctypes.c_size_t
            lib.mr_ring_capacity.argtypes = [ctypes.c_void_p]
            lib.mr_ring_size.restype = ctypes.c_size_t
            lib.mr_ring_size.argtypes = [ctypes.c_void_p]
            lib.mr_ring_push.restype = ctypes.c_size_t
            lib.mr_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_size_t]
            lib.mr_ring_push_i16.restype = ctypes.c_size_t
            lib.mr_ring_push_i16.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                             ctypes.c_size_t]
            lib.mr_ring_pop_block.restype = ctypes.POINTER(ctypes.c_float)
            lib.mr_ring_pop_block.argtypes = [ctypes.c_void_p,
                                              ctypes.c_size_t]
            lib.mr_ring_drain.restype = ctypes.c_size_t
            lib.mr_ring_drain.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_size_t]
            _lib = lib
    return _lib


class RingBuffer:
    """Lock-free single-producer/single-consumer f32 ring buffer (native)."""

    def __init__(self, min_capacity: int = 1 << 20):
        lib = _load()
        self._lib = lib
        self._ptr = lib.mr_ring_create(min_capacity)
        if not self._ptr:
            raise MemoryError("mr_ring_create failed")

    def __del__(self):
        ptr = getattr(self, "_ptr", None)
        if ptr:
            self._lib.mr_ring_destroy(ptr)
            self._ptr = None

    @property
    def capacity(self) -> int:
        return self._lib.mr_ring_capacity(self._ptr)

    def __len__(self) -> int:
        return self._lib.mr_ring_size(self._ptr)

    def push(self, chunk) -> int:
        """Append samples (float32 or int16 array); returns samples queued
        (0 if the ring is full)."""
        a = np.ascontiguousarray(chunk)
        if a.dtype == np.int16:
            return self._lib.mr_ring_push_i16(
                self._ptr, a.ctypes.data_as(ctypes.c_void_p), a.size)
        a = a.astype(np.float32, copy=False)
        return self._lib.mr_ring_push(
            self._ptr, a.ctypes.data_as(ctypes.c_void_p), a.size)

    def pop_block(self, block: int):
        """Pop exactly ``block`` samples as a numpy view-copy, or None."""
        p = self._lib.mr_ring_pop_block(self._ptr, block)
        if not p:
            return None
        return np.ctypeslib.as_array(p, shape=(block,)).copy()

    def drain(self, max_n: int | None = None) -> np.ndarray:
        n = len(self) if max_n is None else min(max_n, len(self))
        out = np.empty(n, np.float32)
        got = self._lib.mr_ring_drain(
            self._ptr, out.ctypes.data_as(ctypes.c_void_p), n)
        return out[:got]


class StreamingResampler:
    """Push arbitrary chunks in; pull resampled blocks out.

    Assembles fixed ``block_size`` input blocks from the ring, runs the
    jitted filt step (state carried, donated on accelerators), and returns
    outputs as they become available.

    - ``flush()`` processes the sub-block tail by zero-padding it to the
      SAME block shape (no recompile per distinct tail length) and trimming
      to the exact closed-form output count of the true tail. A flush ends
      the stream: further pushes raise until ``reset()``.
    - ``checkpoint_every=N`` saves the FilterState plus the
      consumed-sample counter to ``checkpoint_path`` after every N blocks
      (SURVEY.md section 5 failure recovery). ``resume()`` restores it and
      returns the number of input samples already consumed, so a restarted
      producer re-feeds from that offset and the concatenated output is
      identical to an uninterrupted run (tested:
      tests/test_io.py::test_streaming_kill_and_resume).
    """

    def __init__(self, params_or_filter, block_size: int = 1 << 16,
                 ring_capacity: int | None = None,
                 checkpoint_every: int | None = None,
                 checkpoint_path: str | None = None):
        from ..ops import FIRFilter

        if isinstance(params_or_filter, FIRFilter):
            self._filter = params_or_filter
        else:
            f = FIRFilter.__new__(FIRFilter)
            f.params = params_or_filter
            f.path = "auto"
            f.state = None
            self._filter = f
        self.block_size = block_size
        self.ring = RingBuffer(ring_capacity or max(4 * block_size, 1 << 16))
        self._out: list[np.ndarray] = []
        self._ended = False
        self._blocks = 0
        self._consumed = 0
        self._produced = 0
        self._block_seconds_last = None
        self._block_seconds_ema = None
        self.checkpoint_every = checkpoint_every
        self.checkpoint_path = checkpoint_path
        if checkpoint_every and not checkpoint_path:
            raise ValueError("checkpoint_every requires checkpoint_path")

    @property
    def state(self):
        return self._filter.state

    def _run_block(self, blk: np.ndarray):
        t0 = time.perf_counter()
        # y stays ON DEVICE (host transfer deferred to pull()): the block
        # loop issues pure async dispatches — no per-block device sync at
        # all (the output count is closed-form on the host, ops/api.py)
        y = self._filter.filt(blk)
        dt = time.perf_counter() - t0
        self._out.append(y)
        self._blocks += 1
        self._consumed += blk.size
        self._produced += y.shape[-1]
        self._block_seconds_last = dt
        # EMA over ~16 blocks: smooth enough to read, fresh enough to alert
        self._block_seconds_ema = dt if self._block_seconds_ema is None \
            else 0.9375 * self._block_seconds_ema + 0.0625 * dt
        if self.checkpoint_every and \
                self._blocks % self.checkpoint_every == 0:
            self.checkpoint()

    def stats(self) -> dict:
        """Structured per-block observability: counters + block timings.

        NOTE: block wall times include host<->device dispatch; on the TPU
        relay they are dominated by the ~25 ms RTT (see utils/metrics.py) —
        treat them as end-to-end pipeline latency, not kernel time.
        """
        return {
            "blocks": self._blocks,
            "consumed_samples": self._consumed,
            "produced_samples": self._produced,
            "queued_samples": len(self.ring),
            "pending_output_chunks": len(self._out),
            "block_seconds_last": self._block_seconds_last,
            "block_seconds_ema": self._block_seconds_ema,
            "ended": self._ended,
        }

    def checkpoint(self) -> None:
        """Persist (FilterState, consumed/produced counters) atomically."""
        from ..utils.checkpoint import state_to_host

        payload = state_to_host(self._filter.state)
        payload["consumed"] = np.asarray(self._consumed)
        payload["produced"] = np.asarray(self._produced)
        tmp = self.checkpoint_path + ".tmp.npz"
        np.savez(tmp, **payload)
        os.replace(tmp, self.checkpoint_path)

    def resume(self) -> int:
        """Restore the last checkpoint; returns the consumed-sample count
        (the offset from which the producer must re-feed input)."""
        from ..utils.checkpoint import state_from_host

        with np.load(self.checkpoint_path) as z:
            d = {k: z[k] for k in z.files}
        self._consumed = int(d.pop("consumed"))
        self._produced = int(d.pop("produced"))
        self._filter.state = state_from_host(d)
        self._blocks = 0
        self._ended = False
        self._out.clear()
        return self._consumed

    def push(self, chunk) -> int:
        """Queue samples; runs the filter for every complete block."""
        if self._ended:
            raise RuntimeError("stream was flushed; call reset() to reuse")
        queued = self.ring.push(chunk)
        while True:
            blk = self.ring.pop_block(self.block_size)
            if blk is None:
                break
            self._run_block(blk)
        return queued

    def pull(self) -> np.ndarray:
        """All output produced so far (concatenated); empties the queue.
        This is where the deferred device->host transfer happens."""
        if not self._out:
            return np.empty(0, np.float32)
        out = np.concatenate([np.asarray(y) for y in self._out])
        self._out.clear()
        return out

    def flush(self) -> np.ndarray:
        """Process the remaining sub-block tail exactly and return all
        output. Zero-pads the tail to ``block_size`` (reusing the one
        compiled block shape) and trims to the true tail's closed-form
        output count; the stream is then ended (state includes pad zeros)."""
        from ..ops import outputlength

        tail = self.ring.drain()
        if tail.size:
            f = self._filter
            if f._hphase is not None:
                # host index mirror (no device readback of phase/deficit)
                from ..ops.indexing import host_carry

                true_count = host_carry(f.params, f._hphase, f._hdeficit,
                                        int(tail.size))[0]
            else:
                true_count = outputlength(f.params, int(tail.size),
                                          state=f.state)
            padded = np.zeros(self.block_size, np.float32)
            padded[: tail.size] = tail
            y = self._filter.filt(padded)
            self._out.append(y[..., : true_count])
            self._consumed += tail.size
            self._produced += true_count
            self._ended = True
        return self.pull()

    def reset(self) -> "StreamingResampler":
        """Start a fresh stream (zero state, counters, queued output)."""
        self._filter.reset()
        self._out.clear()
        self._ended = False
        self._blocks = 0
        self._consumed = 0
        self._produced = 0
        return self
