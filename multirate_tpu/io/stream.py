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
    jitted filt step (state carried), and returns outputs as they become
    available. ``flush()`` processes the remaining sub-block tail exactly
    (separate jit shape, compiled once).
    """

    def __init__(self, params_or_filter, block_size: int = 1 << 16,
                 ring_capacity: int | None = None):
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

    @property
    def state(self):
        return self._filter.state

    def push(self, chunk) -> int:
        """Queue samples; runs the filter for every complete block."""
        queued = self.ring.push(chunk)
        while True:
            blk = self.ring.pop_block(self.block_size)
            if blk is None:
                break
            self._out.append(np.asarray(self._filter.filt(blk)))
        return queued

    def pull(self) -> np.ndarray:
        """All output produced so far (concatenated); empties the queue."""
        if not self._out:
            return np.empty(0, np.float32)
        out = np.concatenate(self._out)
        self._out.clear()
        return out

    def flush(self) -> np.ndarray:
        """Process the remaining sub-block tail and return all output."""
        tail = self.ring.drain()
        if tail.size:
            self._out.append(np.asarray(self._filter.filt(tail)))
        return self.pull()
