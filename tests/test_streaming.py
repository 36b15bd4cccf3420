"""Streaming-state semantics: chunk invariance, deficits, setphase, reset,
checkpoint/resume (reference: runtests.jl chunking tests; Filters.jl:207-260).
"""

from fractions import Fraction

import numpy as np
import pytest

import multirate_tpu as mr
from helpers import run_chunked
from multirate_tpu.utils.testing import assert_close


SPECS = [Fraction(1, 1), Fraction(4, 1), Fraction(1, 4), Fraction(7, 5),
         1.2345, (0.7, 32, 4)]


def _filter_for(spec, **kw):
    if isinstance(spec, tuple):
        return mr.FIRFilter(kw["h"], spec[0], nphi=spec[1], polyorder=spec[2])
    return mr.FIRFilter(kw["h"], spec)


def _filt_all(h, x, spec, chunks):
    if isinstance(spec, tuple):
        return run_chunked(h, spec[0], x, chunks, nphi=spec[1],
                           polyorder=spec[2])
    return run_chunked(h, spec, x, chunks)


def _whole(h, x, spec):
    if isinstance(spec, tuple):
        return np.asarray(mr.filt(h, x, spec[0], spec[1], spec[2]))
    return np.asarray(mr.filt(h, x, spec))


@pytest.mark.parametrize("spec", SPECS)
def test_random_chunking_equals_whole(rng, spec):
    h = rng.standard_normal(40)
    x = rng.standard_normal(331)
    whole = _whole(h, x, spec)
    # a handful of fixed chunk decompositions incl. degenerate ones
    for chunks in ([331], [1] * 331, [2] * 165 + [1], [50, 1, 1, 229, 50],
                   [330, 1]):
        got = _filt_all(h, x, spec, chunks)
        assert got.shape == whole.shape, f"chunks {chunks[:4]}"
        assert_close(got, whole, rtol=1e-12, atol=1e-12,
                     label=f"{spec} chunks {chunks[:4]}")


def test_chunk_shorter_than_deficit(rng):
    """A chunk shorter than the carried deficit must produce zero outputs and
    absorb into history (Filters.jl:543-547, documented README.md:53)."""
    h = rng.standard_normal(12)
    x = rng.standard_normal(61)
    f = mr.FIRFilter(h, Fraction(1, 8))
    outs = [np.asarray(f.filt(x[i:i + 1])) for i in range(len(x))]
    lens = [len(o) for o in outs]
    assert max(lens) == 1
    # exactly every 8th sample produces an output
    assert [i for i, l in enumerate(lens) if l == 1] == list(range(0, 61, 8))
    whole = np.asarray(mr.filt(h, x, Fraction(1, 8)))
    assert_close(np.concatenate(outs), whole, rtol=1e-12, label="deficit")


def test_reset(rng):
    h = rng.standard_normal(30)
    x = rng.standard_normal(100)
    f = mr.FIRFilter(h, Fraction(7, 5))
    y1 = np.asarray(f.filt(x))
    f.reset()
    y2 = np.asarray(f.filt(x))
    assert np.array_equal(y1, y2)
    # reset works for the arbitrary kernel too (reference's is broken:
    # Filters.jl:250-253, SURVEY.md 2.2 item 2)
    f = mr.FIRFilter(h, 1.618)
    y1 = np.asarray(f.filt(x))
    f.reset()
    y2 = np.asarray(f.filt(x))
    assert np.array_equal(y1, y2)


def test_setphase_arbitrary_delay(rng):
    """setphase implements fractional-sample delay: filtering a pure delay
    bank at phase phi shifts the effective sampling grid (reference usage:
    examples/FIRFarrow.jl:25-33)."""
    nphi = 32
    from test_arbitrary import design_taps
    h = design_taps(nphi)
    t = np.arange(600, dtype=np.float64)
    x = np.sin(2 * np.pi * 0.01 * t)
    # phase column p of the bank samples the underlying signal at
    # n - hlen/(2*nphi) + (p+1)/nphi, so setphase(phi) advances the sampling
    # grid by phi samples relative to phase 0.
    delay = len(h) / (2 * nphi) - 1 / nphi
    for phi in (0.0, 0.25, 0.5):
        f = mr.FIRFilter(h, 1.0, nphi=nphi)
        f.setphase(phi)
        y = np.asarray(f.filt(x))
        expect = np.sin(2 * np.pi * 0.01 * (t - delay + phi))
        assert np.abs(y[100:500] - expect[100:500]).max() < 2e-3, phi


def test_setphase_farrow(rng):
    """Farrow setphase(phi) advances the output grid by phi*(nphi-1)/nphi
    input samples (u = phi*(nphi-1)*ONE, api.setphase / Filters.jl:224-229):
    verified as an actual sub-sample delay on a sine, like the arb test."""
    from test_arbitrary import design_taps
    nphi = 32
    h = design_taps(nphi)
    t = np.arange(1000)
    x = np.sin(2 * np.pi * 0.01 * t)
    delay = len(h) / (2 * nphi) - 1 / nphi
    for phi in (0.0, 0.25, 0.5):
        f = mr.FIRFilter(h, 1.0, nphi=nphi, polyorder=4)
        f.setphase(phi)
        y = np.asarray(f.filt(x))
        expect = np.sin(
            2 * np.pi * 0.01 * (t - delay + phi * (nphi - 1) / nphi))
        # 1.2e-3 bound: ~9.9e-4 polyorder-4 fit error headroom, but tight
        # enough that the wrong phase convention (e.g. a full phi-sample
        # shift, 2e-3 at phi=0.5) fails
        assert np.abs(y[100:500] - expect[100:500]).max() < 1.2e-3, phi


def test_setphase_rational(rng):
    h = rng.standard_normal(21)
    f = mr.FIRFilter(h, Fraction(7, 5))
    f.setphase(0.999)
    y = np.asarray(f.filt(np.ones(50)))
    # starting at the last phase skips phase columns 1..6 for the first output
    p = mr.make_kernel(h, ratio=Fraction(7, 5))
    import jax.numpy as jnp
    st = mr.init_state(p, (), jnp.float64)
    st = mr.setphase(p, st, 0.999)
    assert int(st.phase) == 7


def test_checkpoint_resume(rng):
    """FilterState is a plain pytree: snapshot, restore, resume — outputs
    must continue identically (SURVEY.md section 5 checkpoint/resume)."""
    import jax
    h = rng.standard_normal(40)
    x = rng.standard_normal(300)
    f = mr.FIRFilter(h, 1.2345)
    y1 = np.asarray(f.filt(x[:150]))
    snap = jax.tree_util.tree_map(np.asarray, f.state)  # host snapshot
    y2 = np.asarray(f.filt(x[150:]))

    g = mr.FIRFilter(h, 1.2345)
    g.filt(x[:1])  # materialize state, then overwrite from snapshot
    g.state = jax.tree_util.tree_map(lambda a: a, snap)
    y2b = np.asarray(g.filt(x[150:]))
    assert np.array_equal(y2, y2b)


def test_dtype_switch_preserves_phase(rng):
    h = rng.standard_normal(16)
    f = mr.FIRFilter(h, Fraction(1, 4))
    f.filt(np.ones(3, np.float32))  # deficit now 2
    y = f.filt(np.ones(10, np.float64))  # dtype switch casts history
    assert f.state.history.dtype == np.float64


def test_checkpoint_file(rng, tmp_path):
    """save_state/load_state round-trip through .npz resumes exactly."""
    from multirate_tpu.utils import save_state, load_state
    h = rng.standard_normal(30)
    x = rng.standard_normal(200)
    f = mr.FIRFilter(h, 1.3333)
    f.filt(x[:100])
    path = str(tmp_path / "state.npz")
    save_state(path, f.state)
    y_rest = np.asarray(f.filt(x[100:]))

    g = mr.FIRFilter(h, 1.3333)
    g.state = load_state(path)
    y_rest2 = np.asarray(g.filt(x[100:]))
    assert np.array_equal(y_rest, y_rest2)


def test_models_resampler(rng):
    """models layer: self-designing resampler and DAT->CD pipeline."""
    from fractions import Fraction as F
    from multirate_tpu.models import Resampler, DATToCD
    r = Resampler(F(3, 2), attenuation=50.0)
    y = np.asarray(r(np.ones(400, np.float32)))
    assert abs(float(y[200:300].mean()) - 1.0) < 1e-2  # unity passband gain
    d = DATToCD()
    y = np.asarray(d(np.ones(3200, np.float32)))
    assert y.shape[-1] == 2940
    arb = Resampler(1.4142135, attenuation=50.0)
    y = np.asarray(arb(np.ones(400, np.float32)))
    assert abs(y.shape[-1] - int(400 * 1.4142135)) <= 2


def test_debug_check_block(rng):
    """utils.debug cross-path sanitizer validates fast paths and index math."""
    from multirate_tpu.utils import check_block, check_indices
    import jax.numpy as jnp
    h = rng.standard_normal(36)
    x = jnp.asarray(rng.standard_normal(500))
    for spec in (Fraction(7, 5), Fraction(1, 4), 1.234):
        if isinstance(spec, float):
            p = mr.make_kernel(h, rate=spec)
        else:
            p = mr.make_kernel(h, ratio=spec)
        st = mr.init_state(p, (), x.dtype)
        check_block(p, st, x, rtol=1e-8, atol=1e-9)
        check_indices(p, int(st.phase), 1, 500)


def test_multihost_helpers_compose_with_sharding(rng):
    """local_data_slice must produce EQUAL per-host slices whose
    concatenation (with tail zero-fill) is the quantum-padded stream, so it
    composes with shard_filt_block's equal-shard requirement — the round-1
    pairing silently gave the last host the remainder."""
    from multirate_tpu.parallel import is_multihost
    from multirate_tpu.parallel.multihost import (
        local_data_slice, padded_global_len, shard_quantum)

    assert not is_multihost()
    start, n, valid = local_data_slice(1000)
    assert (start, n, valid) == (0, 1000, 1000)

    h = rng.standard_normal(33)
    p = mr.make_kernel(h, ratio=(147, 160))
    n_t, n_hosts = 4, 3
    q = shard_quantum(p, n_t)
    assert q == 4 * 160
    for global_len in (1000, 12345, q * 6, q * 6 + 1):
        padded = padded_global_len(global_len, n_hosts * q)
        assert padded % (n_hosts * q) == 0 and padded >= global_len
        lengths, covered, valid_total = set(), 0, 0
        for i in range(n_hosts):
            s, ln, v = local_data_slice(global_len, axis_size=n_hosts,
                                        quantum=q, process_index=i)
            assert s == covered
            lengths.add(ln)
            covered += ln
            valid_total += v
            assert ln % q == 0          # each host's share shards cleanly
        assert len(lengths) == 1        # equal shares
        assert covered == padded
        assert valid_total == global_len
