"""Native ring buffer + streaming driver tests."""

import threading
from fractions import Fraction

import numpy as np
import pytest

import multirate_tpu as mr
from multirate_tpu.io import RingBuffer, StreamingResampler
from multirate_tpu.utils.testing import assert_close


def test_ring_basic():
    r = RingBuffer(1024)
    assert r.capacity >= 1024
    assert len(r) == 0
    data = np.arange(100, dtype=np.float32)
    assert r.push(data) == 100
    blk = r.pop_block(64)
    np.testing.assert_array_equal(blk, data[:64])
    assert len(r) == 36
    assert r.pop_block(64) is None  # not enough
    np.testing.assert_array_equal(r.drain(), data[64:])


def test_ring_wraparound():
    r = RingBuffer(64)  # capacity rounds to 64
    cap = r.capacity
    for rep in range(10):  # repeatedly fill/empty to cross the wrap point
        data = np.arange(rep, rep + cap - 8, dtype=np.float32)
        assert r.push(data) == data.size
        got = r.pop_block(data.size)
        np.testing.assert_array_equal(got, data)


def test_ring_full_rejects():
    r = RingBuffer(64)
    cap = r.capacity
    assert r.push(np.zeros(cap, np.float32)) == cap
    assert r.push(np.ones(1, np.float32)) == 0  # full


def test_ring_int16_conversion():
    r = RingBuffer(256)
    pcm = np.array([-32768, -16384, 0, 16384, 32767], dtype=np.int16)
    r.push(pcm)
    got = r.drain()
    np.testing.assert_allclose(got, pcm.astype(np.float32) / 32768.0,
                               atol=1e-7)


def test_ring_threaded_producer_consumer():
    """SPSC correctness under concurrency: a producer thread streams a known
    sequence in random chunks; the consumer reassembles it exactly."""
    rng = np.random.default_rng(0)
    total = 200_000
    data = rng.standard_normal(total).astype(np.float32)
    r = RingBuffer(1 << 14)
    out = []

    def produce():
        i = 0
        while i < total:
            n = int(rng.integers(1, 4096))
            n = min(n, total - i)
            while r.push(data[i:i + n]) == 0:
                pass  # ring full: spin
            i += n

    t = threading.Thread(target=produce)
    t.start()
    got = 0
    while got < total:
        blk = r.pop_block(min(1024, total - got))
        if blk is None:
            tail = r.drain(total - got) if not t.is_alive() else None
            if tail is not None and tail.size:
                out.append(tail)
                got += tail.size
            continue
        out.append(blk)
        got += blk.size
    t.join()
    np.testing.assert_array_equal(np.concatenate(out), data)


@pytest.mark.parametrize("spec", [Fraction(147, 160), 1.2345])
def test_streaming_resampler_equals_whole(rng, spec):
    h = (mr.firdes(24 * 21, 0.5 / 21, mr.kaiser, beta=7.0) * 21
         ).astype(np.float32)
    x = rng.standard_normal(50_000).astype(np.float32)
    whole = np.asarray(mr.filt(h, x, spec))

    s = StreamingResampler(mr.FIRFilter(h, spec), block_size=8192)
    i = 0
    while i < len(x):
        n = int(rng.integers(100, 5000))
        n = min(n, len(x) - i)
        s.push(x[i:i + n])
        i += n
    got = s.flush()
    assert got.shape == whole.shape
    assert_close(got, whole, rtol=1e-5, atol=1e-6, label=f"stream {spec}")


def test_streaming_flush_exact_and_ended(rng):
    """flush() pads the tail to the one compiled block shape and trims to
    the exact closed-form output count; the stream then refuses pushes
    until reset()."""
    h = (mr.firdes(24 * 21, 0.5 / 21, mr.kaiser, beta=7.0) * 21
         ).astype(np.float32)
    x = rng.standard_normal(10_000).astype(np.float32)
    whole = np.asarray(mr.filt(h, x, Fraction(147, 160)))
    s = StreamingResampler(mr.FIRFilter(h, Fraction(147, 160)),
                           block_size=4096)
    s.push(x)
    got = s.flush()
    assert got.shape == whole.shape
    assert_close(got, whole, rtol=1e-5, atol=1e-6, label="flush exact")
    with pytest.raises(RuntimeError):
        s.push(x[:10])
    s.reset()
    s.push(x)
    got2 = s.flush()
    assert_close(got2, whole, rtol=1e-5, atol=1e-6, label="after reset")


def test_streaming_kill_and_resume(rng, tmp_path):
    """SURVEY section 5 failure recovery: checkpoint every N blocks, kill
    the driver, resume from the checkpoint, re-feed from the consumed
    offset — concatenated output reproduces the uninterrupted run."""
    ckpt = str(tmp_path / "stream.ckpt.npz")
    h = (mr.firdes(24 * 21, 0.5 / 21, mr.kaiser, beta=7.0) * 21
         ).astype(np.float32)
    x = rng.standard_normal(40_000).astype(np.float32)
    whole = np.asarray(mr.filt(h, x, 1.2345))

    s = StreamingResampler(mr.FIRFilter(h, 1.2345), block_size=4096,
                           checkpoint_every=2, checkpoint_path=ckpt)
    # feed ~60% of the stream, collecting output as we go
    part1 = []
    i = 0
    while i < 24_000:
        n = min(int(rng.integers(500, 3000)), 24_000 - i)
        s.push(x[i:i + n])
        part1.append(s.pull())
        i += n
    produced_before_kill = int(np.concatenate(part1).size) if part1 else 0
    del s  # "crash": everything in-memory is lost

    s2 = StreamingResampler(mr.FIRFilter(h, 1.2345), block_size=4096,
                            checkpoint_every=2, checkpoint_path=ckpt)
    consumed = s2.resume()
    assert 0 < consumed <= 24_000 and consumed % 4096 == 0
    s2.push(x[consumed:])
    got_tail = s2.flush()
    # outputs from the checkpoint onward must match the uninterrupted run
    ckpt_produced = s2._produced - got_tail.size
    np.testing.assert_allclose(got_tail,
                               whole[ckpt_produced:], rtol=1e-5, atol=1e-6)
    # and the pre-kill prefix up to the checkpoint matches too
    pre = np.concatenate(part1)[:ckpt_produced]
    np.testing.assert_allclose(pre, whole[:ckpt_produced],
                               rtol=1e-5, atol=1e-6)
    assert ckpt_produced + got_tail.size == whole.size


@pytest.mark.parametrize("spec", [Fraction(147, 160), 0.76543])
def test_streaming_no_device_sync_per_block(rng, spec):
    """The block loop must be pure async dispatch: the per-block output
    count comes from the closed-form host index mirror (ops/indexing
    host_carry), never from a device->host readback of the traced count
    (a ~25-32 ms RTT per block on the TPU relay). Guarded for both a bare
    FIRFilter loop and the StreamingResampler driver."""
    import jax

    h = (mr.firdes(24 * 7, 0.5 / 7, mr.kaiser, beta=7.0) * 7
         ).astype(np.float32)
    x = rng.standard_normal(3 * 4096).astype(np.float32)

    f = mr.FIRFilter(h, spec)
    outs = []
    with jax.transfer_guard_device_to_host("disallow"):
        for i in range(3):
            outs.append(f.filt(x[i * 4096:(i + 1) * 4096]))
    got = np.concatenate([np.asarray(y) for y in outs])
    whole = np.asarray(mr.filt(h, x, spec))
    assert_close(got, whole[: len(got)], rtol=1e-5, atol=1e-6,
                 label=f"guarded stream {spec}")
    assert len(got) == len(whole)

    s = StreamingResampler(mr.FIRFilter(h, spec), block_size=4096)
    with jax.transfer_guard_device_to_host("disallow"):
        s.push(x)
    got2 = s.pull()
    np.testing.assert_array_equal(got2, got)
