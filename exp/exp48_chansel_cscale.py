"""chansel channel-amortization curve at the BASELINE Farrow config.

Total samples fixed at 8M; channel count C sweeps 16..256. Round-4
measurement (after the host-taps hoist):

    C= 16: 2.084 ms   3,838 Msps total
    C= 32: 1.148 ms   6,969
    C= 64: 0.675 ms  11,860   <- the BASELINE farrow_64ch config
    C=128: 0.437 ms  18,324
    C=256: 0.261 ms  30,645   (~74% of the measured copy ceiling)

Near-linear in C: the per-tile fixed costs (placement 3*T*UW ops + the
128-lane window DMA) amortize exactly as the kernel design intends; the
BASELINE's C=64 sits where fixed costs still eat ~half the tile. The
20 Gsps BASELINE target is crossed at C ~= 144 on this chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp48_chansel_cscale.py
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import multirate_tpu as mr
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    ha = (mr.firdes(320, 0.45, mr.kaiser, samplerate=32, beta=7.0) * 32
          ).astype(np.float32)
    p = mr.make_kernel(ha, rate=0.9173, nphi=32, polyorder=4)
    for C in (16, 32, 64, 128, 256):
        E = 8_000_000 // C
        x = jnp.asarray(rng.standard_normal((C, E)).astype(np.float32))
        st = mr.init_state(p, (C,), jnp.float32)
        sec = chained_seconds_per_call(p, st, x, "winsel", repeat=20,
                                       iters=3, target_t1=0.6)
        print(f"C={C:4d}: {sec*1e3:.4f} ms  {x.size/sec/1e6:.0f} Msps",
              flush=True)


if __name__ == "__main__":
    main()
