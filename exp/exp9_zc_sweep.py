"""Sweep the zero-copy rational kernel's tile rows (JT) on the TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/exp9_zc_sweep.py
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
    from multirate_tpu.ops.pallas import rational2
    from multirate_tpu.utils.metrics import chained_seconds_per_call

    log("device:", jax.devices()[0].device_kind)
    N = 1_000_000
    ratio = Fraction(147, 160)
    h = (mr.firdes(24 * 147, 0.5 / 147, mr.kaiser, beta=7.8562) * 147
         ).astype(np.float32)
    params = mr.make_kernel(h, ratio=ratio)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    st = mr.init_state(params, (), jnp.float32)
    g = params.sc_group
    log(f"sc_group={g} gL={g*147} gM={g*160} default_JT="
        f"{rational2.zc_geometry(g*147, g*160, 918750, N)}")

    import sys
    pts = ([None] if len(sys.argv) < 2
           else [None if a == "None" else int(a) for a in sys.argv[1:]])
    for jt in pts:
        rational2.ZC_JT_OVERRIDE = jt
        geo = rational2.zc_geometry(g * 147, g * 160, 918750, N)
        if geo is None:
            log(f"JT={jt}: geometry None, skip")
            continue
        try:
            sec = chained_seconds_per_call(params, st, x, "pallas",
                                           repeat=30, iters=4)
            log(f"JT={jt} geo={geo}: {sec*1e3:.3f} ms -> "
                f"{N/sec/1e6:.0f} Msps in")
        except Exception as e:  # noqa: BLE001
            log(f"JT={jt}: FAILED {type(e).__name__}: {e}")
    rational2.ZC_JT_OVERRIDE = None


if __name__ == "__main__":
    main()
