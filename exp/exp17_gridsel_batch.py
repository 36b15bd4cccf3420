"""TPU probe: batched-channel gridsel vs chansel (winsel) on the 64-ch
Farrow + arb bench configs. Accuracy vs the windows path first, then
chained-slope throughput for both paths.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp17_gridsel_batch.py
"""
import time

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import multirate_tpu as mr
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    log("device:", jax.devices()[0].device_kind)
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    rng = np.random.default_rng(0)
    N = 8_000_000
    C = 64
    x64 = jnp.asarray(rng.standard_normal((C, N // C)).astype(np.float32))

    configs = [
        ("farrow64", dict(rate=0.9173, nphi=32, polyorder=4), 0.9173),
        ("arb64", dict(rate=0.9173, nphi=32), 0.9173),
    ]
    for name, kwargs, rate in configs:
        p = mr.make_kernel(ha, **kwargs)
        st = mr.init_state(p, (C,), jnp.float32)
        # accuracy on a small slice vs windows
        xs = x64[:, :20_000]
        yg, cg, _ = mr.filt_block(p, mr.init_state(p, (C,), jnp.float32),
                                  xs, path="gridsel")
        yw, cw, _ = mr.filt_block(p, mr.init_state(p, (C,), jnp.float32),
                                  xs, path="windows")
        n = int(cg)
        assert n == int(cw)
        d = (np.asarray(yg)[:, :n].astype(np.float64)
             - np.asarray(yw)[:, :n].astype(np.float64))
        rms = float(np.sqrt(np.mean(d ** 2))
                    / np.sqrt(np.mean(np.asarray(yw)[:, :n].astype(
                        np.float64) ** 2)))
        log(f"{name}: gridsel-batch vs windows rel RMS {rms:.2e}")
        assert rms < 1e-4, rms
        roof = 819e9 / (4 * (1 + rate)) / 1e6
        for path in ("gridsel", "winsel"):
            try:
                sec = chained_seconds_per_call(p, st, x64, path,
                                               repeat=20, iters=4)
            except Exception as e:  # noqa: BLE001
                log(f"  {name}/{path}: failed ({e})")
                continue
            msps = x64.size / sec / 1e6
            log(f"  {name}/{path}: {msps:.0f} Msps total "
                f"({100 * msps / roof:.1f}% roofline)")


if __name__ == "__main__":
    main()
