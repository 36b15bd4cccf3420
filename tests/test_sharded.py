"""Multi-device sharding tests on 8 virtual CPU devices: the reference's
chunked==whole invariant where chunks are time blocks on different devices
and history hand-off is a ppermute halo (SURVEY.md sections 4-5)."""

from fractions import Fraction

import jax
import numpy as np
import pytest

import multirate_tpu as mr
from multirate_tpu.parallel import (
    make_mesh, shard_filt_block, shard_filt, sharded_resample, compact,
)
from multirate_tpu.utils.testing import assert_close


def _whole_ref(h, x, spec):
    """Per-channel whole-vector reference through the single-device path."""
    rows = [np.asarray(mr.filt(h, x[c], spec)) for c in range(x.shape[0])]
    n = min(len(r) for r in rows)
    return np.stack([r[:n] for r in rows])


SPECS = [Fraction(1, 1), Fraction(4, 1), Fraction(1, 4), Fraction(7, 5),
         Fraction(147, 160)]

# Every spec runs on the general 2-D mesh; the degenerate-axis meshes
# (pure time-sharding, pure channel-sharding) exercise the same halo /
# entry-state machinery with cheaper specs — running all 5 specs on all
# 3 meshes was ~45% of the suite's wall time in shard_map compiles for
# no extra coverage.
_MESH_CASES = ([((2, 4), s) for s in SPECS]
               + [((1, 8), s) for s in (SPECS[0], SPECS[3])]
               + [((8, 1), s) for s in (SPECS[2], SPECS[3])])


@pytest.mark.parametrize("mesh_shape,spec", _MESH_CASES)
def test_sharded_matches_single_device(rng, spec, mesh_shape):
    mesh = make_mesh(*mesh_shape)
    C, N = 8, 1600
    h = rng.standard_normal(48)
    x = rng.standard_normal((C, N)).astype(np.float32)
    p = mr.make_kernel(h.astype(np.float32), ratio=spec)
    y = np.asarray(sharded_resample(p, x, mesh))
    ref = _whole_ref(h.astype(np.float32), x, spec)
    assert y.shape[-1] == ref.shape[-1]
    assert_close(y, ref, rtol=1e-5, atol=1e-5, label=f"sharded {spec}")


@pytest.mark.parametrize("rate", [0.8112, 1.618])
def test_sharded_arbitrary(rng, rate):
    mesh = make_mesh(2, 4)
    C, N = 4, 1600
    from test_arbitrary import design_taps
    h = design_taps().astype(np.float64)
    x = rng.standard_normal((C, N))
    p = mr.make_kernel(h, rate=rate)
    y = np.asarray(sharded_resample(p, x, mesh))
    ref = _whole_ref(h, x, rate)
    assert y.shape[-1] == ref.shape[-1]
    assert_close(y, ref, rtol=1e-9, atol=1e-12, label=f"sharded arb {rate}")


def test_sharded_streaming_blocks(rng):
    """Stream several sharded super-blocks; concatenated output must equal
    the single-device whole-vector result (state carried across blocks)."""
    mesh = make_mesh(1, 8)
    h = rng.standard_normal(32)
    spec = Fraction(7, 5)
    C, NBLK = 2, 800
    p = mr.make_kernel(h, ratio=spec)
    x = rng.standard_normal((C, 3 * NBLK))
    state = mr.init_state(p, (C,), x.dtype)
    outs = []
    import jax.numpy as jnp
    for b in range(3):
        blk = jnp.asarray(x[:, b * NBLK:(b + 1) * NBLK])
        y, counts, state = shard_filt_block(p, state, blk, mesh)
        outs.append(compact(y, counts))
    got = np.concatenate(outs, axis=-1)
    ref = _whole_ref(h, x, spec)
    assert got.shape == ref.shape
    assert_close(got, ref, rtol=1e-10, atol=1e-12, label="sharded streaming")


def test_sharded_farrow_64ch(rng):
    """The BASELINE.json 64-channel Farrow config, scaled to test size."""
    mesh = make_mesh(4, 2)
    from test_arbitrary import design_taps
    h = design_taps()
    x = rng.standard_normal((64, 800)).astype(np.float32)
    p = mr.make_kernel(h.astype(np.float32), rate=0.9173, nphi=32, polyorder=4)
    y = np.asarray(sharded_resample(p, x, mesh))
    # reference via per-channel farrow filt
    rows = [np.asarray(mr.filt(h.astype(np.float32), x[c], 0.9173, 32, 4))
            for c in range(64)]
    n = min(len(r) for r in rows)
    ref = np.stack([r[:n] for r in rows])
    assert y.shape[-1] == ref.shape[-1]
    assert_close(y, ref, rtol=2e-4, atol=2e-5, label="sharded farrow 64ch")


def test_block_too_short_raises(rng):
    mesh = make_mesh(1, 8)
    h = rng.standard_normal(300)  # history 299 > 1600/8
    p = mr.make_kernel(h, ratio=Fraction(1, 1))
    x = rng.standard_normal((1, 1600))
    with pytest.raises(ValueError):
        shard_filt(p, x, mesh)


def test_multichannel_resampler_model(rng):
    """models.MultiChannelResampler end to end on the CPU mesh."""
    from multirate_tpu.models import MultiChannelResampler
    m = MultiChannelResampler(Fraction(3, 2), n_ch_shards=2,
                              attenuation=50.0)
    x = rng.standard_normal((8, 1200)).astype(np.float32)
    y = np.asarray(m(x))
    assert y.shape == (8, 1800)
    ref = np.asarray(mr.filt(m.taps, x[3], Fraction(3, 2)))
    assert_close(y[3], ref[: y.shape[-1]], rtol=1e-4, atol=1e-5,
                 label="mc model")


def test_sharded_ragged_steady_state_no_host_transfers(rng):
    """The ragged (arb/Farrow) sharded pipeline must be fully
    device-resident in steady state: block step + compact_device under
    jax.transfer_guard('disallow') — the round-1 compact() host round trip
    would trip it."""
    import jax.numpy as jnp
    from test_arbitrary import design_taps
    from multirate_tpu.parallel.sharded import compact_device

    mesh = make_mesh(2, 4)
    h = design_taps().astype(np.float32)
    p = mr.make_kernel(h, rate=0.9173, nphi=32, polyorder=4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    C, N = 4, 4096
    x = jax.device_put(rng.standard_normal((C, N)).astype(np.float32),
                       NamedSharding(mesh, P("ch", "t")))
    state = mr.init_state(p, (C,), jnp.float32)

    step = jax.jit(lambda s, xx: shard_filt_block(p, s, xx, mesh))
    y, counts, state = step(state, x)          # compile outside the guard
    dense, total = compact_device(y, counts)
    with jax.transfer_guard("disallow"):
        for _ in range(3):
            y, counts, state = step(state, x)
            dense, total = compact_device(y, counts)
    got = np.asarray(dense)[..., : int(total)]
    assert got.shape[-1] > 0 and np.isfinite(got).all()


def test_sharded_quantized_modes(rng):
    """bf16 and int8 quantized modes through the (ch, t) sharded step:
    sharded assembly equals the whole-vector path — within a bf16 ulp for
    bf16, and BIT-exactly for int8 (integer accumulation + closed-form
    per-shard entry state)."""
    import jax.numpy as jnp
    from multirate_tpu.ops import quant

    h = (mr.firdes(24 * 21, 0.5 / 21, mr.kaiser, beta=7.0) * 21
         ).astype(np.float32)
    x = rng.standard_normal((4, 64_000)).astype(np.float32)
    mesh = make_mesh(2, 4)
    ratio = Fraction(147, 160)

    def assemble(y, counts, c):
        return np.concatenate([
            np.asarray(y[c, t])[: int(counts[c, t] if counts.ndim == 2
                                      else counts[t])]
            for t in range(y.shape[1])])

    hb = np.asarray(jnp.asarray(h, jnp.bfloat16))
    p = mr.make_kernel(hb, ratio=ratio)
    xb = jnp.asarray(x, jnp.bfloat16)
    y, counts, _ = shard_filt_block(p, mr.init_state(p, (4,), jnp.bfloat16),
                                    xb, mesh)
    yref, cref, _ = mr.filt_block(p, mr.init_state(p, (4,), jnp.bfloat16),
                                  xb, path="supercycle")
    for c in range(4):
        got = assemble(y, counts, c).astype(np.float64)
        want = np.asarray(yref[c])[: int(cref)].astype(np.float64)
        assert len(got) == len(want)
        assert np.abs(got - want).max() <= np.abs(want).max() * 2.0 ** -7

    hq, _ = quant.quantize_taps(h)
    xq, _ = quant.quantize_signal(x)
    p = mr.make_kernel(hq, ratio=ratio)
    y, counts, _ = shard_filt_block(p, mr.init_state(p, (4,), jnp.int8),
                                    xq, mesh)
    yref, cref, _ = mr.filt_block(p, mr.init_state(p, (4,), jnp.int8),
                                  xq, path="supercycle")
    for c in range(4):
        assert np.array_equal(assemble(y, counts, c),
                              np.asarray(yref[c])[: int(cref)])
