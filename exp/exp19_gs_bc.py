"""TPU probe after the gridsel build-and-consume restructure: the four
arb/Farrow sidecar-relevant configs, accuracy-checked, chained-slope timed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp19_gs_bc.py
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
    x1 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    x64 = jnp.asarray(rng.standard_normal((64, N // 64)).astype(np.float32))

    configs = [
        ("arb_1ch_0.4709", dict(rate=0.4709, nphi=32), 0.4709, x1,
         ("gridsel", "winsel")),
        ("farrow_1ch_0.4709", dict(rate=0.4709, nphi=32, polyorder=4),
         0.4709, x1, ("gridsel", "ratgrid")),
        ("arb_64ch_0.9173", dict(rate=0.9173, nphi=32), 0.9173, x64,
         ("gridsel", "winsel")),
        ("farrow_64ch_0.9173", dict(rate=0.9173, nphi=32, polyorder=4),
         0.9173, x64, ("gridsel", "winsel")),
    ]
    for name, kwargs, rate, xx, paths in configs:
        p = mr.make_kernel(ha, **kwargs)
        lead = xx.shape[:-1]
        xs = xx[..., :20_000]
        yg, cg, _ = mr.filt_block(p, mr.init_state(p, lead, jnp.float32),
                                  xs, path="gridsel")
        yw, cw, _ = mr.filt_block(p, mr.init_state(p, lead, jnp.float32),
                                  xs, path="windows")
        n = int(cg)
        assert n == int(cw)
        d = (np.asarray(yg)[..., :n].astype(np.float64)
             - np.asarray(yw)[..., :n].astype(np.float64))
        rms = float(np.sqrt(np.mean(d ** 2))
                    / np.sqrt(np.mean(np.asarray(yw)[..., :n].astype(
                        np.float64) ** 2)))
        log(f"{name}: gridsel vs windows rel RMS {rms:.2e}")
        assert rms < 1e-4, rms
        roof = 819e9 / (4 * (1 + rate)) / 1e6
        st = mr.init_state(p, lead, jnp.float32)
        for path in paths:
            try:
                sec = chained_seconds_per_call(p, st, xx, path,
                                               repeat=20, iters=4)
            except Exception as e:  # noqa: BLE001
                log(f"  {name}/{path}: failed ({type(e).__name__}: {e})")
                continue
            msps = xx.size / sec / 1e6
            log(f"  {name}/{path}: {msps:.0f} Msps total "
                f"({100 * msps / roof:.1f}% roofline)")


if __name__ == "__main__":
    main()
