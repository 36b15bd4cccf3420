"""TPU check for the pl.when-predicated fused zc kernel + trunc splits:
accuracy vs the XLA supercycle path (both paths, one big block + a ragged
chunked stream), then a 2-round exp13-style timing of full/rawup/notail.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp16_when_check.py
"""
import time
from fractions import Fraction

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import multirate_tpu as mr

    log("device:", jax.devices()[0].device_kind)
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    p = mr.make_kernel(h, ratio=ratio)
    rng = np.random.default_rng(0)

    for N in (1_000_000, 8_000_000):
        x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
        st = mr.init_state(p, (), jnp.float32)
        yp, cp, _ = mr.filt_block(p, st, x, path="pallas")
        ys, cs, _ = mr.filt_block(p, st, x, path="supercycle")
        n = int(cp)
        assert n == int(cs), (n, int(cs))
        d = np.asarray(yp)[:n].astype(np.float64) - np.asarray(
            ys)[:n].astype(np.float64)
        rms = float(np.sqrt(np.mean(d ** 2))
                    / np.sqrt(np.mean(np.asarray(ys)[:n].astype(
                        np.float64) ** 2)))
        log(f"N={N}: pallas vs supercycle rel RMS {rms:.2e}")
        # trunc-split 3-pass (~2^-15-grade) vs the XLA HIGH supercycle;
        # the binding contract is the 1e-4 oracle budget (bench.py)
        assert rms < 3e-5, rms

    # ragged chunked stream == whole (hits fused-tail + entry-state slabs)
    N = 777_777
    x_np = rng.standard_normal(N).astype(np.float32)
    x = jnp.asarray(x_np)
    st = mr.init_state(p, (), jnp.float32)
    whole = np.asarray(mr.filt_block(p, st, x, path="pallas")[0])
    f = mr.FIRFilter(h, ratio)
    parts = []
    i = 0
    for csz in (100_000, 37_777, 250_000, 390_000):
        parts.append(np.asarray(f.filt(x_np[i:i + csz])))
        i += csz
    chunked = np.concatenate(parts)
    n = min(len(chunked), int(mr.outputlength(p, i)))
    d = np.abs(chunked[:n].astype(np.float64)
               - whole[:n].astype(np.float64))
    log(f"chunked-vs-whole max abs {d.max():.2e}")
    assert d.max() < 1e-5, d.max()
    log("ACCURACY OK")


if __name__ == "__main__":
    main()
